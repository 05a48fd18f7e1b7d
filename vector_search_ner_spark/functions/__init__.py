from vector_search_ner_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_distance,
    l2_norm,
)
from vector_search_ner_spark.functions.text import (
    clean_text,
    stable_id,
    stable_long_hash,
)

__all__ = [
    "cosine_similarity",
    "dot_product",
    "l2_distance",
    "l2_norm",
    "clean_text",
    "stable_id",
    "stable_long_hash",
]

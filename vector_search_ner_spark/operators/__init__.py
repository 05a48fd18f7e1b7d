from vector_search_ner_spark.operators.knn import knn_join, topk_per_query
from vector_search_ner_spark.operators.dedup import dedup_first_wins

__all__ = ["knn_join", "topk_per_query", "dedup_first_wins"]

"""vector_search_ner_spark — a PySpark-native analytics engine with the
query & data-processing capabilities of the reference semantic-search
service (ai-x2-aunt/Vector_search-NER), re-expressed Spark-first.

Layout:
    sources/    table catalog + JSON schema-on-read for posting-shaped data
    functions/  scalar column functions (text cleaning, vector math, json)
    operators/  DataFrame->DataFrame operators (knn, dedup, chunk, fusion,
                staged retrieval, text stats, multimodal plumbing)
    plans/      relational substrate queries over the TPC-H-ish fixtures
    streaming/  Structured Streaming pipelines over the events table

Everything is declarative DataFrame/SQL so Catalyst can push filters,
prune columns, and pick join strategies; Pandas UDFs appear only at the
genuine extension points (embedding, model-backed NER).
"""

from vector_search_ner_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"

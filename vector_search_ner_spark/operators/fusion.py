"""Score fusion + final ranking — the reference's hybrid rerank
(`llm_rerank` fusion step, /root/reference/main.py:298-323):

    combined = 0.7 * model_score + 0.3 * metadata_overlap_score

The engine keeps the fusion arithmetic as native columns (the
reference's LLM scorer is quarantined behind the extractor interface;
the deterministic metadata-overlap component mirrors
`compute_ner_similarity`, main.py:225-234: a sum of {0,1} matches
over 3 metadata keys).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

LLM_WEIGHT = 0.7
NER_WEIGHT = 0.3


def overlap_score(*matches: Column) -> Column:
    """Sum of boolean match indicators (each contributes {0,1})."""
    total = F.lit(0)
    for m in matches:
        total = total + F.when(m, 1).otherwise(0)
    return total.cast("int")


def fuse_scores(model_score: Column, meta_score: Column, meta_max: int = 3) -> Column:
    """0.7 * model + 0.3 * normalized metadata overlap, rounded."""
    return F.round(
        F.lit(LLM_WEIGHT) * model_score + F.lit(NER_WEIGHT) * (meta_score / F.lit(float(meta_max))),
        4,
    )


def rank_topn(
    df: DataFrame,
    n: int,
    query_id: str = "query_id",
    score_col: str = "combined_score",
    doc_id: str = "doc_id",
) -> DataFrame:
    """Final 1-based rank + top-n truncation (reference: sort desc,
    `doc_list[:5]`, enumerate rank — main.py:323, 455, 458)."""
    w = Window.partitionBy(query_id).orderBy(F.col(score_col).desc(), F.col(doc_id).asc())
    return (
        df.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= n)
    )

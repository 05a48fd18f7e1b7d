"""Staged retrieval with progressive relaxation — the reference's
`multi_stage_search` (/root/reference/main.py:329-411): run a strict
filtered search, and for queries that came back with too few
candidates, progressively relax the predicate, merging stages with
first-wins dedup (earlier stage wins), then rerank.

Spark-first re-expression: the reference gates each stage with an
eager `len(results) < k` check per request. In a set-at-a-time batch
engine the gate becomes a PER-QUERY predicate — a deficit semi-join —
so the whole cascade stays one lazy logical plan (no driver-side
count() actions), queries that need relaxation get it, and queries
that don't aren't recomputed. Catalyst sees the full plan and can
share the scan across stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def deficit_queries(results: DataFrame, min_hits: int, query_id: str = "query_id") -> DataFrame:
    """Query ids whose candidate count is below min_hits (including
    queries with zero hits requires the caller to pass the full query
    set via union with zero counts — use `queries_below`)."""
    return (
        results.groupBy(query_id)
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") < min_hits)
        .select(query_id)
    )


def queries_below(
    all_queries: DataFrame, results: DataFrame, min_hits: int, query_id: str = "query_id"
) -> DataFrame:
    """All query ids with fewer than `min_hits` rows in `results`
    (zero-hit queries included)."""
    counts = results.groupBy(query_id).agg(F.count(F.lit(1)).alias("__n"))
    return (
        all_queries.select(query_id)
        .join(counts, query_id, "left")
        .where(F.coalesce(F.col("__n"), F.lit(0)) < min_hits)
        .select(query_id)
    )


def merge_stages_first_wins(
    stages: list[DataFrame],
    query_id: str = "query_id",
    doc_id: str = "doc_id",
) -> DataFrame:
    """Union stage results (each tagged with its index) keeping, per
    (query, doc), the row from the EARLIEST stage — the reference's
    `deduplicate_by_id(listA + listB)` merge applied at every
    relaxation step (/root/reference/main.py:359,372,382,396,406)."""
    tagged = [s.withColumn("stage", F.lit(i)) for i, s in enumerate(stages)]
    merged = tagged[0]
    for t in tagged[1:]:
        merged = merged.unionByName(t)
    w = Window.partitionBy(query_id, doc_id).orderBy(F.col("stage").asc())
    return (
        merged.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )

"""Vector distance/similarity column expressions.

All pure built-in higher-order functions (`zip_with` + `aggregate`) so
they run JVM-side inside whole-stage codegen — no Python UDF in the
k-NN hot path. This replaces the reference's hnswlib distance kernels
(`/root/reference/main.py:158-165` `similarity_search_with_score`,
L2-over-HNSW) with exact distributed computation.

Determinism note: `aggregate` folds the array sequentially
left-to-right over DOUBLE, so scores are bit-reproducible across
engines — the DuckDB oracle reproduces the identical fold with
`list_sum(list_transform(...))`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _fold_sum(arr: Column) -> Column:
    """Sequential left-to-right sum of an array<double> column."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v)


def dot_product(a: Column, b: Column) -> Column:
    """Dot product of two array<float|double> columns, double precision."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return _fold_sum(prods)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def l2_distance(a: Column, b: Column) -> Column:
    diffs = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))
    )
    return F.sqrt(_fold_sum(diffs))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot_product(a, b) / denom)


def cosine_distance(a: Column, b: Column) -> Column:
    return F.lit(1.0) - cosine_similarity(a, b)


# ---------------------------------------------------------------------------
# DuckDB oracle fragments — the exact same folds, as ANSI-ish SQL text.
# Kept next to the Spark exprs so they can't drift apart.
# ---------------------------------------------------------------------------


def duck_dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, len({a})), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def duck_norm(a: str) -> str:
    return f"sqrt({duck_dot(a, a)})"


def duck_cosine(a: str, b: str) -> str:
    return (
        f"CASE WHEN {duck_norm(a)} * {duck_norm(b)} = 0.0 THEN 0.0 "
        f"ELSE {duck_dot(a, b)} / ({duck_norm(a)} * {duck_norm(b)}) END"
    )


def duck_l2(a: str, b: str) -> str:
    return (
        f"sqrt(list_sum(list_transform(generate_series(1, len({a})), "
        f"i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) "
        f"* (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)))))"
    )

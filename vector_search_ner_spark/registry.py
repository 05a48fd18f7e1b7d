"""Query registry: the single source of truth behind
`__spark_entry__.queries()` / `oracle_sql()`.

Each implemented operator from SURVEY §2 registers
  * a Spark callable  (spark, sf_dir) -> DataFrame
  * (when SQL-expressible) the equivalent DuckDB ANSI SQL oracle

via the @query decorator. Column names/aliases MUST match between the
two — the driver sorts columns by name before value-hashing.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}

# Modules that define queries; imported lazily by collect().
_QUERY_MODULES = [
    "vector_search_ner_spark.plans.queries_vector",
    "vector_search_ner_spark.plans.queries_relational",
    "vector_search_ner_spark.plans.queries_text",
    "vector_search_ner_spark.plans.queries_dedup",
    "vector_search_ner_spark.plans.queries_pipeline",
    "vector_search_ner_spark.plans.queries_events",
    "vector_search_ner_spark.plans.queries_streaming",
    "vector_search_ner_spark.plans.queries_mlops",
    "vector_search_ner_spark.plans.queries_substrate2",
    "vector_search_ner_spark.plans.queries_postings",
    "vector_search_ner_spark.plans.queries_substrate3",
    "vector_search_ner_spark.plans.queries_substrate4",
    "vector_search_ner_spark.plans.queries_substrate5",
    "vector_search_ner_spark.plans.queries_pq",
    "vector_search_ner_spark.plans.queries_ner_filter",
    "vector_search_ner_spark.plans.queries_layout",
    "vector_search_ner_spark.plans.queries_lakehouse",
    "vector_search_ner_spark.plans.queries_dataprep",
]


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            if e.name != mod:  # real missing dependency inside the module
                raise
    return dict(_QUERIES), dict(_ORACLES)

"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship retrieval pipeline at sf0.001;
`queries()` / `oracle_sql()` expose every implemented SURVEY §2
operator, collected from vector_search_ner_spark.registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vector_search_ner_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on /root/testdata/sf0.001: the chat pipeline TEXT-IN
    end to end — raw user messages → rule-NER parse + profile fallback
    + empty-query guard → full v2 relaxation lattice with query-time
    embedding → fused top-5. Driver checks rows>0."""
    qs, _ = registry.collect()
    return qs["chat_pipeline_e2e"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs, _ = registry.collect()
    return qs


def oracle_sql() -> dict[str, str]:
    _, oracles = registry.collect()
    return oracles

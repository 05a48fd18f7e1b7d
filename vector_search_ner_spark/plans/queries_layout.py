"""Physical-layout operators for the 100 TB story (SURVEY §4, §7.6):
how the engine removes shuffles and scan bytes via table layout rather
than per-query tricks.

  * bucketed_join_colocated — bucketBy(orderkey) both fact tables once;
    the repeated lineitem⋈orders join then plans with NO Exchange on
    either side (co-located sort-merge join). At 100 TB this converts
    the most expensive recurring shuffle into a free property of the
    layout. (tests/test_semantics.py asserts the exchange-free plan.)
  * partition_pruned_scan — write events partitioned by event_type;
    a predicate on the partition column prunes directories at planning
    time (PartitionFilters), reading 1/5 of the data.

Both oracles recompute from the raw fixtures — equality proves the
re-layout is lossless.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_search_ner_spark.registry import query
from vector_search_ner_spark.sources.catalog import load_table

ARTIFACT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "_artifacts"
)


def _dec(c: str) -> Column:
    return F.col(c).cast("decimal(18,2)")


def _ensure_warehouse(spark: SparkSession) -> None:
    # local metastore lives under the repo's _artifacts; idempotent
    spark.sql("CREATE DATABASE IF NOT EXISTS layout")


def bucketed_tables(spark: SparkSession, sf_dir: str, n_buckets: int = 8) -> None:
    """One-time re-layout: both join sides bucketed+sorted by the join
    key into the warehouse. At scale this is the ingest job's sink."""
    _ensure_warehouse(spark)
    load_table(spark, sf_dir, "lineitem").write.mode("overwrite").option(
        "path", os.path.join(ARTIFACT_DIR, "lineitem_b")
    ).bucketBy(n_buckets, "l_orderkey").sortBy("l_orderkey").saveAsTable("layout.lineitem_b")
    load_table(spark, sf_dir, "orders").write.mode("overwrite").option(
        "path", os.path.join(ARTIFACT_DIR, "orders_b")
    ).bucketBy(n_buckets, "o_orderkey").sortBy("o_orderkey").saveAsTable("layout.orders_b")


@query(
    "bucketed_join_colocated",
    oracle="""
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
""",
)
def bucketed_join_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem⋈orders on pre-bucketed tables: zero Exchange on the
    join (bucket co-location replaces the shuffle); only the final
    small group-by exchanges. The agg keys are NOT the bucket key, so
    this is the honest general case."""
    bucketed_tables(spark, sf_dir)
    l = spark.table("layout.lineitem_b")
    o = spark.table("layout.orders_b")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(_dec("l_extendedprice")), 2).cast("double").alias("total_price"),
        )
    )


@query(
    "partition_pruned_scan",
    oracle="""
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_clicks,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS click_value
FROM events
WHERE event_type = 'click'
GROUP BY user_id
""",
)
def partition_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partition pruning: events re-laid-out as
    .../event_type=X/ directories; the event_type predicate becomes a
    PartitionFilter (directory pruning at plan time — zero I/O for the
    other partitions, the mechanism behind date-partitioned 100 TB
    ingest tables)."""
    path = os.path.join(ARTIFACT_DIR, "events_by_type")
    load_table(spark, sf_dir, "events").write.mode("overwrite").partitionBy(
        "event_type"
    ).parquet(path)
    ev = spark.read.parquet(path).where(F.col("event_type") == "click")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.round(F.sum(_dec("value")), 2).cast("double").alias("click_value"),
    )


@query(
    "layout_zorder_cluster",
    oracle="""
WITH k AS (
  SELECT event_id, user_id,
         CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hr
  FROM events
)
SELECT event_id, user_id, hr,
       CAST(list_sum(list_transform(range(0, 8),
              i -> ((user_id >> i) & 1) * CAST(2**(2*i) AS BIGINT)
                 + ((hr >> i) & 1) * CAST(2**(2*i+1) AS BIGINT)))
            AS BIGINT) AS zkey,
       CAST(list_sum(list_transform(range(0, 8),
              i -> ((user_id >> i) & 1) * CAST(2**(2*i) AS BIGINT)
                 + ((hr >> i) & 1) * CAST(2**(2*i+1) AS BIGINT)))
            // 4096 AS BIGINT) AS file_bucket
FROM k
ORDER BY zkey, event_id
""",
)
def layout_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over two filter dimensions
    (user_id x hour-of-day): interleave the low 8 bits of each so rows
    close in BOTH dimensions land in the same file bucket. Sorting a
    100 TB table by zkey before writing gives every file a tight
    min/max envelope on BOTH columns, so predicates on either dimension
    skip most files via parquet column statistics — the multi-dim
    generalization of partition pruning (Delta/Iceberg OPTIMIZE ZORDER
    do exactly this). The bit interleave is a pure integer fold
    (aggregate over sequence(0,7)), bit-identical to the DuckDB
    list_transform oracle; file_bucket = zkey DIV 4096 models the
    sorted-write file assignment."""
    ev = load_table(spark, sf_dir, "events")
    k = ev.select(
        "event_id", "user_id", F.hour("ts").cast("bigint").alias("hr")
    )
    z = F.expr(
        "aggregate(sequence(0, 7), CAST(0 AS BIGINT), (acc, i) -> acc"
        " + shiftleft((user_id >> i) & 1, 2*i)"
        " + shiftleft((hr >> i) & 1, 2*i + 1))"
    )
    return (
        k.withColumn("zkey", z)
        .withColumn("file_bucket", F.expr("zkey div 4096"))
        .orderBy("zkey", "event_id")
    )

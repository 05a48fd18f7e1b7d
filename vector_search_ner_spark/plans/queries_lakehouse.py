"""Lakehouse table-maintenance and experimentation operators
(SURVEY §2.1/§2.4 extensions; north-star training-data ops).

The reference rebuilds its whole index from scratch on every change
(build_vectorstore.py:22-24 `rm -rf` + full re-embed). A 100 TB table
cannot be rebuilt; it is *maintained*: dimension history is versioned
(SCD2), rollups are incrementally merged from partial aggregates,
snapshots are diffed to produce change feeds, and experiments /
samples are computed with deterministic, retry-stable hashing. Each
query here is one of those maintenance primitives, expressed so the
whole thing stays a single declarative plan (no driver loops).

Determinism: counts/sums stay integer (cents) until a final cast;
cross-engine hashing uses md5 hex strings (identical in Spark and
DuckDB, unlike xxhash64/Python hash — see SURVEY §2.8 on the
reference's salted `hash()` bug, build_vectorstore.py:202).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_search_ner_spark.registry import query
from vector_search_ner_spark.sources.catalog import load_table


def _cents(c: str = "value") -> Column:
    return F.expr(f"CAST(ROUND({c} * 100) AS BIGINT)")


# ---------------------------------------------------------------------------
# SCD Type 2: dimension history with effective-time ranges
# ---------------------------------------------------------------------------


@query(
    "scd2_user_state_history",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
changes AS (
  SELECT user_id, event_type, ts AS effective_from, event_id
  FROM seq
  WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, event_type, effective_from,
       COALESCE(lead(effective_from) OVER
                  (PARTITION BY user_id ORDER BY effective_from, event_id),
                TIMESTAMP '2099-12-31 00:00:00') AS effective_to,
       CAST(lead(effective_from) OVER
              (PARTITION BY user_id ORDER BY effective_from, event_id)
            IS NULL AS BOOLEAN) AS is_current
FROM changes
ORDER BY user_id, effective_from, event_id
""",
)
def scd2_user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 build: collapse a per-user
    event stream into versioned state rows with [effective_from,
    effective_to) validity ranges and an is_current flag — the
    lakehouse dimension-history table that replaces the reference's
    destructive rebuild (build_vectorstore.py:22-24) with queryable
    time travel ("what was this user's state on date D" = a BETWEEN
    predicate, no reprocessing).

    Shape: one window pass detects changes (lag), a second stitches
    ranges (lead). Both windows share the same partitioning key, so at
    100 TB this is ONE shuffle on user_id and two local sorts; the
    open-ended current row gets a sentinel high date (2099 — within
    pandas ns range, unlike 9999) so downstream BETWEEN predicates
    need no NULL logic. Ties break on event_id
    (repo determinism rule)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.select(
            "user_id",
            "event_type",
            "ts",
            "event_id",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .where(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select(
            "user_id", "event_type", F.col("ts").alias("effective_from"), "event_id"
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("effective_from", "event_id")
    nxt = F.lead("effective_from").over(w2)
    return (
        changes.select(
            "user_id",
            "event_type",
            "effective_from",
            F.coalesce(
                nxt, F.lit("2099-12-31 00:00:00").cast("timestamp")
            ).alias("effective_to"),
            nxt.isNull().alias("is_current"),
        )
        .orderBy("user_id", "effective_from", "event_id")
        .drop("event_id")
    )


# ---------------------------------------------------------------------------
# Incremental rollup maintenance: merge partial aggregates, no rescan
# ---------------------------------------------------------------------------


@query(
    "rollup_incremental_merge",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(ROUND(CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE)
                  / 100, 2) AS DOUBLE) AS total_value,
       CAST(MIN(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100
         AS min_value,
       CAST(MAX(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100
         AS max_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def rollup_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup maintenance: the day×type dashboard table is
    NOT recomputed from raw events — yesterday's materialized partial
    aggregates (count / sum-cents / min / max per group) are merged
    with a partial aggregate of only the new arrivals, by re-reducing
    the partials (SUM of counts and sums, MIN of mins, MAX of maxes).
    The oracle aggregates the raw table directly; equality proves the
    merge is lossless — the algebraic-aggregate property that makes a
    100 TB rollup cost O(new data) per refresh instead of O(history).
    (approx sketches get the same treatment in sketch_hll_union.)

    The base/delta split here is simulated deterministically
    (event_id parity) purely so both legs exercise real partials; in
    production the base leg is a parquet read of the prior rollup.
    Everything stays integer cents until the final casts, so the merge
    is bit-exact and order-free (safe under AQE re-partitioning)."""
    ev = load_table(spark, sf_dir, "events")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.date_trunc("day", "ts").alias("day"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_cents()).alias("sum_cents"),
            F.min(_cents()).alias("min_cents"),
            F.max(_cents()).alias("max_cents"),
        )

    base = partial(ev.where(F.col("event_id") % 2 == 0))
    delta = partial(ev.where(F.col("event_id") % 2 == 1))
    merged = (
        base.unionByName(delta)
        .groupBy("day", "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_cents").alias("sum_cents"),
            F.min("min_cents").alias("min_cents"),
            F.max("max_cents").alias("max_cents"),
        )
    )
    return merged.select(
        "day",
        "event_type",
        "n",
        F.round(F.col("sum_cents").cast("double") / 100, 2)
        .cast("double")
        .alias("total_value"),
        (F.col("min_cents").cast("double") / 100).alias("min_value"),
        (F.col("max_cents").cast("double") / 100).alias("max_value"),
    ).orderBy("day", "event_type")


# ---------------------------------------------------------------------------
# Snapshot diff: the read side of CDC
# ---------------------------------------------------------------------------


@query(
    "snapshot_diff_cdc",
    oracle="""
WITH v1 AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 7 <> 0
),
v2 AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 5 = 0
              THEN CAST((CAST(ROUND(o_totalprice * 100) AS BIGINT) * 11 + 5)
                        // 10 AS DOUBLE) / 100
              ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 11 <> 0
)
SELECT COALESCE(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
       CASE WHEN v1.o_orderkey IS NULL THEN 'insert'
            WHEN v2.o_orderkey IS NULL THEN 'delete'
            ELSE 'update' END AS change_type,
       v1.o_totalprice AS old_price,
       v2.o_totalprice AS new_price
FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
WHERE v1.o_orderkey IS NULL OR v2.o_orderkey IS NULL
   OR md5(concat(v1.o_orderstatus, '|',
                 CAST(CAST(ROUND(v1.o_totalprice * 100) AS BIGINT)
                      AS VARCHAR)))
      <> md5(concat(v2.o_orderstatus, '|',
                    CAST(CAST(ROUND(v2.o_totalprice * 100) AS BIGINT)
                         AS VARCHAR)))
ORDER BY o_orderkey
""",
)
def snapshot_diff_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — the read side of change data capture: given two
    versions of a keyed table, emit (key, insert|delete|update, old,
    new), skipping unchanged rows. This is how a 100 TB pipeline feeds
    ONLY the changed rows to downstream re-embedding / re-indexing
    (the reference re-embeds everything, build_vectorstore.py:233-250;
    cdc_upsert_orders covers the write side, this covers producing the
    feed). Unchanged-row elimination compares an md5 row-fingerprint
    (identical hex in Spark and DuckDB) instead of N column equality
    predicates — at wide schemas the fingerprint also shrinks the
    shuffle to key+hash. The two versions are derived from the orders
    fixture by deterministic modular rules (v1 drops %7, v2 drops %11
    and bumps %5 prices) so insert/delete/update all occur. Plan: one
    full outer SMJ on the key — the unavoidable shuffle — and the
    fingerprint filter evaluates inline, no second pass."""
    o = load_table(spark, sf_dir, "orders")
    v1 = o.where(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    v2 = o.where(F.col("o_orderkey") % 11 != 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(
            F.col("o_orderkey") % 5 == 0,
            F.expr(
                "CAST((CAST(ROUND(o_totalprice * 100) AS BIGINT) * 11 + 5)"
                " div 10 AS DOUBLE) / 100"
            ),
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )

    j = v1.alias("v1").join(
        v2.alias("v2"), F.col("v1.o_orderkey") == F.col("v2.o_orderkey"), "full_outer"
    )
    h1 = F.md5(
        F.concat(
            F.col("v1.o_orderstatus"),
            F.lit("|"),
            F.expr("CAST(CAST(ROUND(v1.o_totalprice * 100) AS BIGINT) AS STRING)"),
        )
    )
    h2 = F.md5(
        F.concat(
            F.col("v2.o_orderstatus"),
            F.lit("|"),
            F.expr("CAST(CAST(ROUND(v2.o_totalprice * 100) AS BIGINT) AS STRING)"),
        )
    )
    return (
        j.where(
            F.col("v1.o_orderkey").isNull()
            | F.col("v2.o_orderkey").isNull()
            | (h1 != h2)
        )
        .select(
            F.coalesce(F.col("v1.o_orderkey"), F.col("v2.o_orderkey")).alias(
                "o_orderkey"
            ),
            F.when(F.col("v1.o_orderkey").isNull(), "insert")
            .when(F.col("v2.o_orderkey").isNull(), "delete")
            .otherwise("update")
            .alias("change_type"),
            F.col("v1.o_totalprice").alias("old_price"),
            F.col("v2.o_totalprice").alias("new_price"),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# Exact stratified sampling, retry-stable
# ---------------------------------------------------------------------------


@query(
    "sample_stratified_exact",
    oracle="""
WITH ranked AS (
  SELECT event_type, event_id, user_id,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY md5(CAST(event_id AS VARCHAR)),
                                     event_id) AS rn
  FROM events
)
SELECT event_type, event_id, user_id, rn
FROM ranked WHERE rn <= 50
ORDER BY event_type, rn
""",
)
def sample_stratified_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-n stratified sampling: exactly 50 rows per event_type,
    chosen by ranking on a content hash (md5 of the key) — a
    deterministic shuffle-of-record-order that is identical on every
    engine, every retry, every partitioning. `df.sampleBy()` gives
    only expected (binomial) fractions and `rand(seed)` changes with
    partitioning, so neither is reproducible evidence for a 100 TB
    eval-set lineage audit; hash-rank sampling is (same property as
    dataset_split_assign, here with an exact per-stratum count).
    Plan: WindowGroupLimit pushes the rn<=50 cap before the exchange,
    so each map task forwards at most 50 rows per stratum — the
    shuffle carries O(strata × 50 × partitions), not the table."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")), "event_id"
    )
    return (
        ev.select(
            "event_type",
            "event_id",
            "user_id",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 50)
        .orderBy("event_type", "rn")
    )

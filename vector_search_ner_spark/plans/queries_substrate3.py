"""Substrate wave 3 (SURVEY §2.4, §2.3): multi-dimensional aggregation
(CUBE / GROUPING SETS — the grouping-analytics surface the reference
lacks entirely, SURVEY §2.4 'absent' row) and two more TPC-H-shaped
plans: a returned-items revenue report (Q10 shape: selective fact
filter → 4-way join → agg → deterministic top-20) and an order-priority
EXISTS count (Q4 shape: correlated EXISTS → semi join).

Money aggregates follow the repo rule: DECIMAL(18,2) accumulation,
cast to double + round(2) only at the end, so Spark and DuckDB agree
bit-for-bit regardless of summation order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_search_ner_spark.registry import query
from vector_search_ner_spark.sources.catalog import load_table


def _dec(c: str) -> Column:
    return F.col(c).cast("decimal(18,2)")


@query(
    "cube_status_priority",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
       count(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping levels in ONE pass —
    Spark expands the grouping sets map-side, so the fact table is
    scanned once (vs 4 separate group-bys = 4 scans at 100 TB).
    GROUPING flags disambiguate real NULLs from rolled-up levels."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(_dec("o_totalprice")), 2).cast("double").alias("total_price"),
        )
        .select(
            "o_orderstatus", "o_orderpriority", "g_status", "g_priority",
            "n_orders", "total_price",
        )
    )


@query(
    "grouping_sets_returnflag",
    oracle="""
SELECT l_returnflag, l_linestatus,
       count(*) AS n_items,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
""",
)
def grouping_sets_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the Spark SQL surface (exercises the
    SQL parser path, not just the DataFrame API): detail + per-flag
    subtotal + grand total in one shuffle."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_items,
               CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@query(
    "q10_returned_items",
    oracle="""
SELECT c.c_custkey, c.c_name,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
       c.c_acctbal, n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-items revenue): quarter + returnflag
    filters land in the parquet scans (pushdown), customer/nation
    broadcast, ONE shuffle for the group-by, then a global top-20 —
    TakeOrderedAndProject, no full sort. Tie-break on c_custkey keeps
    the LIMIT deterministic."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount"))), 2
            ).cast("double").alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


@query(
    "q6_forecast_revenue",
    oracle="""
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate. All four predicates
    reach the parquet reader (PushedFilters), the sum is a map-side
    partial + single-row final — the cheapest possible plan; at 100 TB
    this is I/O-bound and prunes via min/max rowgroup stats."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(_dec("l_extendedprice") * _dec("l_discount")), 2)
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "q18_large_orders",
    oracle="""
WITH big AS (
  SELECT l_orderkey
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(l_quantity) > 250
)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       CAST(ROUND(SUM(CAST(l.l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN big ON o.o_orderkey = big.l_orderkey
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): the HAVING subquery is a
    self-aggregation of lineitem reused as a SEMI filter — Catalyst
    reuses the shuffle exchange on l_orderkey for both the filter agg
    and the outer agg (ReusedExchange), so lineitem shuffles once."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = l.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q")).where(F.col("q") > 250)
    return (
        l.join(big.select("l_orderkey"), "l_orderkey", "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum(_dec("l_quantity")), 2).cast("double").alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
    )


@query(
    "q4_late_ship_priority",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
""",
)
def q4_late_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape, adapted to the fixture schema (no commitdate/
    receiptdate → 'shipped >60 days after order' is the lateness
    predicate). Written as SQL EXISTS so Catalyst's RewritePredicate-
    Subquery turns it into a LEFT SEMI join — at scale that is one
    shuffle on l_orderkey and no row duplication before the agg."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o_orderpriority
        """
    )


@query(
    "sketch_distinct_quantiles",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       TRUE AS acd_within_bound,
       TRUE AS p50_in_bounds,
       TRUE AS p95_in_bounds
FROM lineitem GROUP BY l_returnflag
""",
)
def sketch_distinct_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates for 100 TB profiling — HyperLogLog++
    approx_count_distinct and GK approx quantiles per group, constant
    memory per group vs the exact distinct's full shuffle; the standard
    first pass over a new corpus before exact jobs are sized.

    Bound-verdict form (full oracle): sketch internals differ per
    implementation, so the query computes BOTH the approximate and the
    exact side in Spark and emits only oracle-derivable values plus
    boolean verdicts that the sketches landed inside their published
    error bounds. The oracle re-derives the exact side and the expected
    all-true verdicts — same discipline as `ann_bq_recall_report`.
    Bounds checked: HLL++ rsd=0.02 estimate within 10% (5 sigma) of the
    exact distinct; GK accuracy=10000 quantile value bracketed by the
    EXACT interpolated quantiles at p±0.02 (guaranteed rank error is
    n/10000 = 0.0001·n, so the ±0.02-rank bracket has 100x headroom for
    any group with more than ~100 rows). All output columns are scalar:
    the driver's pandas canonicalizer cannot hash array cells (the r07
    `qty_p50_p95` crash), and tests/test_registry.py now pins that
    invariant registry-wide.

    Physical shape: the exact COUNT(DISTINCT) lives in its OWN
    aggregation, joined back on the 3-row group key. Mixing it into the
    sketch agg forces Catalyst's Expand rewrite, which re-keys the
    partial aggregation on (group, partkey) — ~20k groups — and every
    one of those carries a full accuracy-10000 QuantileSummaries buffer
    through the shuffle (measured 25s at sf0.1 vs ~1s split; at 100 TB
    the mixed form is a non-starter). Also one array-argument
    percentile/percentile_approx buffer each instead of four scalar
    buffers over the same column."""
    l = load_table(spark, sf_dir, "lineitem")
    sketches = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.expr("percentile_approx(l_quantity, array(0.5D, 0.95D), 10000)").alias("ap"),
        F.expr("percentile(l_quantity, array(0.48D, 0.52D, 0.93D, 0.97D))").alias("ex"),
    )
    exact = l.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").cast("bigint").alias("exact_parts")
    )
    return sketches.join(F.broadcast(exact), "l_returnflag").select(
        "l_returnflag",
        "n",
        "exact_parts",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            <= 0.10 * F.col("exact_parts")
        ).alias("acd_within_bound"),
        F.col("ap")[0].between(F.col("ex")[0], F.col("ex")[1]).alias("p50_in_bounds"),
        F.col("ap")[1].between(F.col("ex")[2], F.col("ex")[3]).alias("p95_in_bounds"),
    )


@query(
    "q7_nation_volume",
    oracle="""
SELECT supp_nation, cust_nation, l_year,
       CAST(ROUND(SUM(volume), 2) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS l_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
    AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
)
GROUP BY supp_nation, cust_nation, l_year
""",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (bilateral nation trade volume by year): the same
    dim table (nation) joined TWICE under different roles, a disjunctive
    cross-dim predicate, and year bucketing. Both nation sides and
    customer/supplier broadcast; lineitem-orders is the one real
    shuffle."""
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(
            F.round(
                F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount"))), 2
            ).cast("double").alias("revenue")
        )
    )


@query(
    "q19_bracketed_revenue",
    oracle="""
SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5  AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def q19_bracketed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (disjunction of bracketed predicates across the
    join): part is broadcast; the OR-of-ANDs predicate references both
    sides, so it evaluates post-join — but each disjunct's single-side
    conjuncts (brand/size on part, quantity on lineitem) are derivable
    prefilters; Catalyst's constraint propagation keeps the broadcast
    tiny."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .where(cond)
        .agg(
            F.round(
                F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount"))), 2
            ).cast("double").alias("revenue")
        )
    )


@query(
    "quartiles_order_price",
    oracle="""
SELECT o_orderstatus,
       quantile_cont(o_totalprice, 0.25) AS p25,
       quantile_cont(o_totalprice, 0.50) AS p50,
       quantile_cont(o_totalprice, 0.75) AS p75
FROM orders GROUP BY o_orderstatus
""",
)
def quartiles_order_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT interpolated percentiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`, both linear interpolation on the sorted
    set). The exact form needs the full sorted group — bounded group
    count here; unbounded cardinality uses the sketch variant
    (sketch_distinct_quantiles)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, 0.25)").alias("p25"),
        F.expr("percentile(o_totalprice, 0.50)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.75)").alias("p75"),
    )


@query(
    "sketch_hll_union",
    oracle="""
WITH d AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
  FROM events GROUP BY 1
)
SELECT CAST(day AS VARCHAR) AS day, n_events, exact_users,
       TRUE AS est_within_bound
FROM d
UNION ALL
SELECT 'TOTAL',
       CAST((SELECT COUNT(*) FROM events) AS BIGINT),
       CAST((SELECT COUNT(DISTINCT user_id) FROM events) AS BIGINT),
       TRUE
""",
)
def sketch_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable HyperLogLog sketches (Datasketches HllSketch):
    build one binary sketch per day with hll_sketch_agg, then roll the
    daily sketches up with hll_union_agg — the two-level pattern that
    makes 100 TB distinct-count dashboards cheap: partial sketches are
    computed once per partition/day and merged at any grain later,
    instead of re-scanning raw data per rollup. (approx_count_distinct
    can't do this — its sketch isn't exposed for re-aggregation.)

    Bound-verdict form (full oracle): sketch bytes are
    implementation-specific, so the query computes the exact distinct
    counts alongside the sketches and emits (day, n_events,
    exact_users, est_within_bound) — the boolean asserts the per-day
    estimates AND the merged-union TOTAL estimate land within 5% of
    exact (HLL lgK=14 rsd is ~0.81%, so 5% is a >6-sigma verdict). The
    oracle re-derives exact counts and the expected all-true verdicts;
    tests/test_semantics.py keeps the tighter 2% direct check."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"),
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").cast("bigint").alias("exact_users"),
    )
    within = (
        F.abs(F.col("est_users") - F.col("exact_users"))
        <= 0.05 * F.col("exact_users")
    ).alias("est_within_bound")
    per_day = daily.select(
        F.col("day").cast("string").alias("day"),
        "n_events",
        "exact_users",
        F.hll_sketch_estimate("sk").alias("est_users"),
    ).select("day", "n_events", "exact_users", within)
    # the TOTAL row rolls the daily sketches up with hll_union_agg and
    # verdicts that merged estimate against the exact global distinct
    # (computed in one scan-side agg, joined on as a 1-row broadcast)
    merged = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users"),
        F.sum("n_events").alias("n_events"),
    )
    exact_tot = ev.agg(F.count_distinct("user_id").cast("bigint").alias("exact_users"))
    total = merged.crossJoin(F.broadcast(exact_tot)).select(
        F.lit("TOTAL").alias("day"), "n_events", "exact_users", within
    )
    # explicit total-last sort key: do not rely on 'TOTAL' collating
    # after ISO dates in whatever locale/format the day strings take
    return per_day.unionByName(total).orderBy((F.col("day") == "TOTAL").cast("int"), "day")


# -- Bloom-filter semi-join prefilter -----------------------------------------
# The runtime-filter pattern every warehouse leans on at 100 TB: hash
# the SMALL side's join keys into a fixed-width Bloom bitmap, broadcast
# it, and prefilter the big fact table MAP-SIDE so only probable
# matches reach the exact join's shuffle. Spark ships an internal
# version (spark.sql.optimizer.runtime.bloomFilter.enabled, injected
# by Catalyst); this query implements the operator explicitly with
# cross-engine-deterministic hashing (salted md5, the house stable
# hash), so DuckDB re-derives the IDENTICAL bitmap and the report —
# including the false-positive count — matches value-for-value, not
# merely within a probabilistic bound.

_BLOOM_BITS = 65536  # m (bitmap width)
_BLOOM_K = 4  # hash probes per key
_BLOOM_PSIZE = 10  # build-side predicate: parts with p_size < this


def _bloom_salt(j: int) -> str:
    return f"bloom{j}|"


def _duck_bloom_pos(expr: str, j: int) -> str:
    from vector_search_ner_spark.functions.text import duck_stable_long_hash

    h = duck_stable_long_hash(f"'{_bloom_salt(j)}' || CAST({expr} AS VARCHAR)")
    return f"({h} % {_BLOOM_BITS})"


def _bloom_prefilter_oracle() -> str:
    probe_pos = ", ".join(
        f"{_duck_bloom_pos('l_partkey', j)} AS pos{j}" for j in range(_BLOOM_K)
    )
    build_union = " UNION ".join(
        f"SELECT {_duck_bloom_pos('k', j)} AS pos FROM keys" for j in range(_BLOOM_K)
    )
    pass_joins = "\n".join(
        f"  LEFT JOIN bits b{j} ON b{j}.pos = p.pos{j}" for j in range(_BLOOM_K)
    )
    all_set = " AND ".join(f"b{j}.pos IS NOT NULL" for j in range(_BLOOM_K))
    return f"""
WITH keys AS (
  SELECT DISTINCT p_partkey AS k FROM part WHERE p_size < {_BLOOM_PSIZE}
), bits AS (
  {build_union}
), probe AS (
  SELECT l_partkey, {probe_pos} FROM lineitem
), checked AS (
  SELECT p.l_partkey,
         ({all_set}) AS bloom_pass,
         k.k IS NOT NULL AS is_member
  FROM probe p
{pass_joins}
  LEFT JOIN keys k ON k.k = p.l_partkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_probe,
       CAST((SELECT COUNT(*) FROM bits) AS BIGINT) AS n_bits_set,
       CAST(SUM(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT) AS n_member,
       CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_bloom,
       CAST(SUM(CASE WHEN bloom_pass AND NOT is_member THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_pos,
       ROUND(SUM(CASE WHEN bloom_pass AND NOT is_member THEN 1 ELSE 0 END)
             / CAST(SUM(CASE WHEN NOT is_member THEN 1 ELSE 0 END) AS DOUBLE),
             6) AS fp_rate,
       SUM(CASE WHEN is_member AND NOT bloom_pass THEN 1 ELSE 0 END) = 0
         AS no_false_negatives
FROM checked
"""


@query("join_bloom_prefilter", oracle=_bloom_prefilter_oracle())
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit Bloom-filter runtime prefilter for a selective semi
    join: the build side (parts with p_size < 10) hashes each key into
    k=4 positions of an m=65536-bit Bloom domain; the SET-BIT relation
    (at most m rows however many keys feed it — Bloom's compression
    contract) broadcasts, and the fact side (lineitem) checks its 4
    positions via 4 broadcast left joins, entirely map-side: no
    shuffle of the big table ever happens. The report certifies the
    two Bloom laws value-exactly against the oracle's bit-identical
    rebuild: NO false negatives (every true member passes), and the
    measured false-positive count/rate (deterministic here because the
    hashes are the salted-md5 house hash both engines compute).

    At 100 TB the same plan holds: the set-bit relation is bounded by
    m (tune m to the build cardinality; Spark's own injected version
    is spark.sql.optimizer.runtime.bloomFilter.enabled — this query
    pins the operator's semantics where the optimizer's is opaque),
    the probe stays in whole-stage codegen, and only bloom-passing
    rows reach the exact join. One fact-table scan, zero fact-table
    shuffles."""
    from vector_search_ner_spark.functions.text import stable_long_hash

    part = load_table(spark, sf_dir, "part")
    # lineage-cut both build-side relations: the set-bit table feeds
    # _BLOOM_K broadcast joins and the key set feeds the member join
    # plus every bit leg — without the cut each broadcast re-derives
    # the whole build subtree (first explain showed 16 part scans)
    keys = (
        part.where(F.col("p_size") < _BLOOM_PSIZE)
        .select(F.col("p_partkey").alias("k"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def pos(col, j: int):
        h = stable_long_hash(F.concat(F.lit(_bloom_salt(j)), col.cast("string")))
        return F.pmod(h, F.lit(_BLOOM_BITS))

    bits = None
    for j in range(_BLOOM_K):
        leg = keys.select(pos(F.col("k"), j).alias("pos"))
        bits = leg if bits is None else bits.unionByName(leg)
    bits = bits.distinct().localCheckpoint(eager=True)

    l = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    probe = l.select(
        "l_partkey",
        *[pos(F.col("l_partkey"), j).alias(f"pos{j}") for j in range(_BLOOM_K)],
    )
    checked = probe
    for j in range(_BLOOM_K):
        bj = F.broadcast(bits.select(F.col("pos").alias(f"b{j}")))
        checked = checked.join(bj, checked[f"pos{j}"] == bj[f"b{j}"], "left")
    member = F.broadcast(keys)
    all_set = F.lit(True)
    for j in range(_BLOOM_K):
        all_set = all_set & F.col(f"b{j}").isNotNull()
    checked = checked.join(member, checked.l_partkey == member.k, "left").select(
        all_set.alias("bloom_pass"),
        F.col("k").isNotNull().alias("is_member"),
    )
    n_bits = bits.agg(F.count(F.lit(1)).cast("long").alias("n_bits_set"))
    report = checked.agg(
        F.count(F.lit(1)).cast("long").alias("n_probe"),
        F.sum(F.col("is_member").cast("long")).alias("n_member"),
        F.sum(F.col("bloom_pass").cast("long")).alias("n_pass_bloom"),
        F.sum((F.col("bloom_pass") & ~F.col("is_member")).cast("long")).alias(
            "n_false_pos"
        ),
        F.round(
            F.sum((F.col("bloom_pass") & ~F.col("is_member")).cast("long"))
            / F.sum((~F.col("is_member")).cast("long")).cast("double"),
            6,
        ).alias("fp_rate"),
        (F.sum((F.col("is_member") & ~F.col("bloom_pass")).cast("long")) == 0).alias(
            "no_false_negatives"
        ),
    )
    return report.crossJoin(F.broadcast(n_bits)).select(
        "n_probe",
        "n_bits_set",
        "n_member",
        "n_pass_bloom",
        "n_false_pos",
        "fp_rate",
        "no_false_negatives",
    )


# -- Count-Min sketch heavy hitters -------------------------------------------
# The other workhorse frequency sketch (Cormode & Muthukrishnan, "An
# Improved Data Stream Summary: The Count-Min Sketch and its
# Applications", J. Algorithms 2005): d x w counter grid, each update
# increments one cell per row, point estimate = MIN over rows. Never
# undercounts; overcounts by collision mass. Deterministic salted-md5
# row hashes make the estimates — collisions included — value-exact
# across engines, so the oracle checks the actual estimates, not just
# the Markov bound.

_CMS_D = 4  # hash rows
_CMS_W = 256  # counters per row (deliberately small so collisions occur)
_CMS_TOP = 20  # heavy hitters reported


def _duck_cms_col(expr: str, j: int) -> str:
    from vector_search_ner_spark.functions.text import duck_stable_long_hash

    h = duck_stable_long_hash(f"'cms{j}|' || CAST({expr} AS VARCHAR)")
    return f"({h} % {_CMS_W})"


def _cms_oracle() -> str:
    cell_union = " UNION ALL ".join(
        f"SELECT {j} AS j, {_duck_cms_col('k', j)} AS col, c FROM cnt"
        for j in range(_CMS_D)
    )
    probe_union = " UNION ALL ".join(
        f"SELECT k, c, {j} AS j, {_duck_cms_col('k', j)} AS col FROM top"
        for j in range(_CMS_D)
    )
    return f"""
WITH cnt AS (
  SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS c
  FROM lineitem GROUP BY l_partkey
), cells AS (
  {cell_union}
), counters AS (
  SELECT j, col, SUM(c) AS cell FROM cells GROUP BY j, col
), top AS (
  SELECT k, c FROM cnt ORDER BY c DESC, k LIMIT {_CMS_TOP}
), probes AS (
  {probe_union}
)
SELECT p.k AS l_partkey, p.c AS exact_cnt,
       CAST(MIN(co.cell) AS BIGINT) AS est_cnt,
       CAST(MIN(co.cell) - p.c AS BIGINT) AS overcount,
       MIN(co.cell) >= p.c AS never_undercounts
FROM probes p JOIN counters co ON co.j = p.j AND co.col = p.col
GROUP BY p.k, p.c
"""


def cms_cell_col(col, j: int):
    """The j-th CMS row's cell index for a key column — shared by the
    batch grid build, the probe, and the streaming ingest twin (the
    grids must be bit-identical for the shared oracle to hold)."""
    from vector_search_ner_spark.functions.text import stable_long_hash

    h = stable_long_hash(F.concat(F.lit(f"cms{j}|"), col.cast("string")))
    return F.pmod(h, F.lit(_CMS_W))


@query("sketch_countmin_topk", oracle=_cms_oracle())
def sketch_countmin_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch over the lineitem part-key stream, evaluated on
    the exact top-20 heavy hitters: build the d=4 x w=256 counter grid
    (w is deliberately much smaller than the 20k-key domain so
    collision overcount is visibly nonzero), then point-estimate each
    heavy hitter as the min over its d cells and report estimate,
    exact count, overcount, and the never-undercounts law.

    Scale shape: ONE exact per-key aggregation feeds both the grid and
    the ground truth (sum-distributivity means building cells from
    pre-aggregated counts equals per-row increments); the grid is d*w
    rows regardless of corpus size — the whole point of the sketch —
    and broadcasts to the probe join; top-20 plans as
    TakeOrderedAndProject. At 100 TB you keep only the grid (shuffles
    d*w rows) and probe ad hoc; the exact side here exists to certify
    the estimates, same discipline as `sketch_distinct_quantiles`."""
    cms_col = cms_cell_col
    l = load_table(spark, sf_dir, "lineitem")
    cnt = (
        l.groupBy(F.col("l_partkey").alias("k"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)  # feeds the grid, the top-k, and
        # the probes; one shuffle, not three
    )
    cells = None
    for j in range(_CMS_D):
        leg = cnt.select(F.lit(j).alias("j"), cms_col(F.col("k"), j).alias("col"), "c")
        cells = leg if cells is None else cells.unionByName(leg)
    counters = cells.groupBy("j", "col").agg(F.sum("c").alias("cell"))
    top = cnt.orderBy(F.col("c").desc(), "k").limit(_CMS_TOP)
    probes = None
    for j in range(_CMS_D):
        leg = top.select(
            "k", "c", F.lit(j).alias("j"), cms_col(F.col("k"), j).alias("col")
        )
        probes = leg if probes is None else probes.unionByName(leg)
    est = (
        probes.join(F.broadcast(counters), ["j", "col"])
        .groupBy("k", "c")
        .agg(F.min("cell").cast("long").alias("est_cnt"))
    )
    return est.select(
        F.col("k").alias("l_partkey"),
        F.col("c").alias("exact_cnt"),
        "est_cnt",
        (F.col("est_cnt") - F.col("c")).cast("long").alias("overcount"),
        (F.col("est_cnt") >= F.col("c")).alias("never_undercounts"),
    )

"""Relational substrate queries (SURVEY §2 'absent in reference' rows —
the standard engine surface: scans, joins, aggregations, windows,
sorts, set ops). Exercised on the TPC-H-ish fixtures.

Determinism: money aggregates go through DECIMAL so partial/final
aggregation order can't perturb low bits (decimal arithmetic is exact);
final results are cast to double and rounded, which is then
bit-identical across Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_search_ner_spark.registry import query
from vector_search_ner_spark.sources.catalog import load_table


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(18,2)")


@query(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_disc_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    * (1 + CAST(l_tax AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_charge,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + filter + hash agg (partial+final free via
    Catalyst). Filter + 2-column group pushes down to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    disc = 1 - _dec("l_discount")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(_dec("l_quantity")), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(_dec("l_extendedprice")), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(_dec("l_extendedprice") * disc), 2).cast("double").alias("sum_disc_price"),
            F.round(
                F.sum(_dec("l_extendedprice") * disc * (1 + _dec("l_tax"))), 2
            ).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_top_unshipped",
    oracle="""
SELECT o.o_orderkey,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
""",
)
def q3_top_unshipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> join -> agg. `customer`
    is small relative to lineitem: broadcast it so the big fact side
    only shuffles once (for the final group-by)."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount"))), 2
            ).cast("double").alias("revenue")
        )
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
SELECT n.n_name,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join. All dims (region/nation/supplier/
    customer) broadcast; the lineitem–orders join is the only
    shuffle-heavy edge and AQE picks its strategy."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), (o.o_custkey == c.c_custkey))
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount"))), 2
            ).cast("double").alias("revenue")
        )
    )


@query(
    "window_top_orders_per_cust",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(row_number() OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
         ) AS INTEGER) AS rnk
  FROM orders
) WHERE rnk <= 3
""",
)
def window_top_orders_per_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: rank window + filter; Spark plans a
    WindowGroupLimit partial top-k before the shuffle."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    )


@query(
    "window_running_frames",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
         PARTITION BY l_orderkey ORDER BY l_linenumber
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ), 2) AS DOUBLE) AS running_qty,
       CAST(lag(l_linenumber, 1) OVER (
         PARTITION BY l_orderkey ORDER BY l_linenumber
       ) AS INTEGER) AS prev_line
FROM lineitem
WHERE l_orderkey < 100
""",
)
def window_running_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-spec windows (rowsBetween running sum) + lag — the frame/
    lead-lag surface the reference lacks (SURVEY §2.5)."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 100)
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.sum(_dec("l_quantity")).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double"),
            2,
        ).alias("running_qty"),
        F.lag("l_linenumber", 1).over(w).cast("int").alias("prev_line"),
    )


@query(
    "agg_distinct_stats",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_part,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 2) AS avg_qty
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-distinct aggregate (expand-based in Spark) + decimal-exact avg."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.round(F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1)), 2).alias("avg_qty"),
    )


@query(
    "rollup_order_priority",
    oracle="""
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
)
def rollup_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (SURVEY §2.4 'absent' row)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(_dec("o_totalprice")), 2).cast("double").alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total",
        )
    )


@query(
    "join_semi_anti",
    oracle="""
SELECT 'with_orders' AS side, CAST(COUNT(*) AS BIGINT) AS n FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
UNION ALL
SELECT 'without_orders' AS side, CAST(COUNT(*) AS BIGINT) AS n FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi (EXISTS) and left-anti (NOT EXISTS) joins."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    semi = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("with_orders").alias("side"), "n")
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("without_orders").alias("side"), "n")
    )
    return semi.unionByName(anti)


@query(
    "range_join_price_band",
    oracle="""
SELECT p.p_partkey, CAST(COUNT(*) AS BIGINT) AS n_cheaper_suppliers
FROM part p
JOIN supplier s ON s.s_acctbal * 100 < p.p_retailprice
WHERE p.p_partkey <= 50
GROUP BY p.p_partkey
""",
)
def range_join_price_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta/range) join — broadcast-nested-loop in Spark;
    the small side is broadcast so no shuffle of `part`."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_partkey") <= 50)
    s = load_table(spark, sf_dir, "supplier")
    return (
        p.join(F.broadcast(s), s.s_acctbal * 100 < p.p_retailprice)
        .groupBy("p_partkey")
        .agg(F.count(F.lit(1)).alias("n_cheaper_suppliers"))
    )


@query(
    "set_ops_nations",
    oracle="""
SELECT n_nationkey FROM (
  SELECT n_nationkey FROM nation WHERE n_regionkey IN (0, 1)
  INTERSECT
  SELECT n_nationkey FROM nation WHERE n_nationkey < 15
)
UNION ALL
SELECT n_nationkey FROM (
  SELECT n_nationkey FROM nation WHERE n_regionkey IN (0, 1)
  EXCEPT
  SELECT n_nationkey FROM nation WHERE n_nationkey < 15
)
""",
)
def set_ops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersect / except / union set ops (SURVEY §2.7)."""
    n = load_table(spark, sf_dir, "nation")
    a = n.where(F.col("n_regionkey").isin(0, 1)).select("n_nationkey")
    b = n.where(F.col("n_nationkey") < 15).select("n_nationkey")
    return a.intersect(b).unionAll(a.subtract(b))


@query(
    "topk_global_orders",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""",
)
def topk_global_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort + limit → TakeOrderedAndProject (no full sort)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_totalprice")
        .limit(20)
    )

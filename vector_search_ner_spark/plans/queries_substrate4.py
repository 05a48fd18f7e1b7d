"""Substrate wave 4: the remaining distinctive TPC-H query shapes,
adapted to the fixture schema (no partsupp / shipmode / receiptdate —
see TESTDATA.md), plus a ranking-function gallery and an n-gram
counter for the text-analysis family.

Shapes covered here (each is a distinct plan pattern the reference
engine's substrate must express; SURVEY §2.3-§2.6 "absent" rows):
  * q13 — LEFT OUTER join with ON-clause filter + two-level aggregation
  * q14 — conditional-aggregate ratio (CASE inside SUM)
  * q17 — correlated per-group average as a filter threshold
  * q21 — EXISTS + NOT EXISTS self-joins (semi ∧ anti on one table)
  * q22 — anti join + global scalar-subquery threshold
  * q15 — aggregate CTE reused + scalar MAX subquery (equality on agg)
  * q8  — market-share: two-level ratio over a 7-way star join
  * q9  — LIKE-filtered multi-join profit rollup
  * q2  — min-per-group correlated subquery (cheapest supplier)

Money math follows the repo rule: DECIMAL(18,2) accumulation (exact,
order-free under Spark's partial aggregation), cast to double + round
only at the very end, so Spark and DuckDB agree bit-for-bit. Ratio
queries round each operand sum to 2dp, cast to double, divide in
double, round the quotient — both engines then do the identical IEEE
operations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_search_ner_spark.registry import query
from vector_search_ner_spark.sources.catalog import load_table


def _dec(c: str) -> Column:
    return F.col(c).cast("decimal(18,2)")


def _rev() -> Column:
    return _dec("l_extendedprice") * (1 - _dec("l_discount"))


@query(
    "q13_order_count_distribution",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): LEFT OUTER
    join whose filter lives in the ON clause (pre-filtering the right
    side — NOT a WHERE, which would drop zero-order customers), then a
    second aggregation over the first's output. At scale the first agg
    shuffles on c_custkey; the second is tiny (distinct counts).
    Reference has no outer joins at all (SURVEY §2.3 'absent')."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q14_promo_revenue_ratio",
    oracle="""
SELECT CAST(ROUND(
         100.0 * CAST(ROUND(SUM(CASE WHEN p.p_type = 'PROMO'
                       THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                            * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                       ELSE 0 END), 2) AS DOUBLE)
               / CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                            * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE),
       6) AS DOUBLE) AS promo_revenue_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
""",
)
def q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promo revenue share): conditional aggregate —
    one scan computes both the CASE-gated numerator and the total
    denominator (vs two queries = two scans at 100 TB). part is
    broadcast; the month filter is pushed to the lineitem scan."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    promo = F.round(
        F.sum(F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0))), 2
    ).cast("double")
    total = F.round(F.sum(_rev()), 2).cast("double")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(F.round(100.0 * promo / total, 6).alias("promo_revenue_pct"))
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
WITH li AS (
  SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_brand = 'Brand#23'
), thr AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
  FROM li GROUP BY l_partkey
)
SELECT CAST(ROUND(CAST(SUM(CAST(li.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 2)
       AS DOUBLE) AS avg_yearly
FROM li JOIN thr ON li.l_partkey = thr.l_partkey
WHERE li.l_quantity < 0.2 * thr.avg_qty
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): the filter
    threshold is a correlated per-group AVERAGE of the same fact table.
    Implemented as agg + self-join on the group key, so lineitem
    shuffles once on l_partkey and Catalyst reuses the exchange for
    both branches (ReusedExchange). The average is computed as
    exact-decimal sum / count, divided in double — identical in both
    engines regardless of partitioning."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    l = load_table(spark, sf_dir, "lineitem")
    li = l.join(F.broadcast(p.select("p_partkey")), l.l_partkey == F.col("p_partkey")).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    thr = li.groupBy("l_partkey").agg(
        (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        li.join(thr, "l_partkey")
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(F.sum(_dec("l_extendedprice")).cast("double") / 7.0, 2).alias("avg_yearly")
        )
    )


_Q21_SQL = """
SELECT s.s_name, count(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


@query("q21_sole_blame_supplier", oracle=_Q21_SQL)
def q21_sole_blame_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers solely responsible for a failed
    multi-supplier order; returnflag='R' stands in for the missing
    receipt/commit lateness — TESTDATA.md schema). One fact table under
    THREE roles: base + correlated EXISTS (→ left-semi) + correlated
    NOT EXISTS (→ left-anti). Catalyst's RewritePredicateSubquery turns
    both into joins on l_orderkey, sharing the shuffle; no row
    explosion before the count."""
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_Q21_SQL)


_Q22_SQL = """
SELECT cntrycode, count(*) AS numcust,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS totacctbal
FROM (
  SELECT SUBSTRING(c.c_name, 17, 2) AS cntrycode, c.c_acctbal
  FROM customer c
  WHERE c.c_acctbal > (
      SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      FROM customer c2 WHERE c2.c_acctbal > 0.0
    )
    AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
)
GROUP BY cntrycode
ORDER BY cntrycode
"""


@query("q22_idle_wealthy_customers", oracle=_Q22_SQL)
def q22_idle_wealthy_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (wealthy customers with no orders): a global
    scalar subquery (average positive balance — exact-decimal sum /
    count so both engines agree bit-for-bit) as a filter threshold,
    plus NOT EXISTS → left-anti against orders. The anti join shuffles
    on custkey; the scalar is a one-row broadcast. The 'country code'
    is the last two digits of the fixture's Customer#%09d name."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_Q22_SQL)


_Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(r.total_revenue AS DOUBLE) AS total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
"""


@query("q15_top_revenue_supplier", oracle=_Q15_SQL)
def q15_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier by quarterly revenue): an
    aggregate CTE consumed TWICE — once as the join input, once inside
    a scalar MAX subquery. Catalyst computes the agg once and reuses
    the exchange; the MAX equality is on the rounded DECIMAL (exact),
    so ties return all argmax suppliers deterministically."""
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_Q15_SQL)


@query(
    "q8_market_share",
    oracle="""
SELECT o_year,
       CAST(ROUND(
         CAST(ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END), 2) AS DOUBLE)
         / CAST(ROUND(SUM(volume), 2) AS DOUBLE), 6) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume,
         n2.n_name AS nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
  JOIN region r ON n1.n_regionkey = r.r_regionkey
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
)
GROUP BY o_year
ORDER BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share by year): 7-way star join
    — nation appears twice (customer's region gate vs supplier's
    nationality), region prunes to one market, and the answer is a
    per-year conditional-sum ratio. All dims broadcast; the only big
    shuffle is lineitem⋈orders. Ratio operands are rounded decimals
    cast to double, so the division is engine-independent."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    vol = _rev().alias("volume")
    base = (
        l.join(F.broadcast(p.select("p_partkey")), l.l_partkey == F.col("p_partkey"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(F.year("o_orderdate").cast("int").alias("o_year"), vol, "nation")
    )
    num = F.round(
        F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(F.lit(0))), 2
    ).cast("double")
    den = F.round(F.sum("volume"), 2).cast("double")
    return (
        base.groupBy("o_year")
        .agg(F.round(num / den, 6).alias("mkt_share"))
        .orderBy("o_year")
    )


@query(
    "q9_product_profit",
    oracle="""
SELECT nation, o_year, CAST(ROUND(SUM(volume), 2) AS DOUBLE) AS profit
FROM (
  SELECT n.n_name AS nation,
         CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE p.p_name LIKE '%red%'
)
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (profit by supplier nation and year, LIKE-
    filtered product line; no ps_supplycost in the fixture so profit =
    discounted revenue). The LIKE '%red%' is a non-prefix pattern —
    not sargable, but still evaluated in the scan operator before the
    join fan-out, and part is broadcast after the filter."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(F.broadcast(p.select("p_partkey")), l.l_partkey == F.col("p_partkey"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "q2_min_price_supplier",
    oracle="""
SELECT DISTINCT p.p_partkey, p.p_name, s.s_name,
       CAST(l.l_extendedprice AS DOUBLE) AS min_price
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
WHERE p.p_size = 15
  AND l.l_extendedprice = (
    SELECT MIN(l2.l_extendedprice) FROM lineitem l2
    WHERE l2.l_partkey = p.p_partkey
  )
ORDER BY p.p_partkey, s.s_name
LIMIT 100
""",
)
def q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (cheapest supplier per part; lineitem stands in
    for partsupp): correlated MIN subquery on the probe key →
    implemented as min-aggregate + join-back on l_partkey, the
    standard decorrelation Catalyst itself applies to the SQL form.
    Equality is on the stored double (same value, no arithmetic), so
    it is exact; ties return every argmin supplier, deduplicated."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_size") == 15)
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    li = l.join(F.broadcast(p.select("p_partkey", "p_name")), l.l_partkey == F.col("p_partkey"))
    minp = li.groupBy(F.col("p_partkey").alias("mp_key")).agg(
        F.min("l_extendedprice").alias("min_price")
    )
    return (
        li.join(
            minp,
            (F.col("p_partkey") == F.col("mp_key"))
            & (F.col("l_extendedprice") == F.col("min_price")),
        )
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .select("p_partkey", "p_name", "s_name", F.col("min_price").cast("double"))
        .distinct()
        .orderBy("p_partkey", "s_name")
        .limit(100)
    )


@query(
    "window_rank_gallery",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice,
       ntile(4)       OVER w AS price_quartile,
       CAST(percent_rank() OVER w AS DOUBLE) AS pct_rank,
       CAST(cume_dist()    OVER w AS DOUBLE) AS cume,
       lead(o_orderkey, 1) OVER w AS next_key,
       lag(o_orderkey, 1)  OVER w AS prev_key
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-02-01 00:00:00'
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
""",
)
def window_rank_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function gallery (SURVEY §2.5 'absent' row: ntile /
    lead-lag): ntile quartiles, percent_rank, cume_dist, lead/lag over
    one window spec — Spark evaluates all five in a single Window
    physical operator (one sort, one pass). The ORDER BY includes the
    unique o_orderkey so every function is deterministic."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-02-01 00:00:00").cast("timestamp"))
    )
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.ntile(4).over(w).alias("price_quartile"),
        F.percent_rank().over(w).cast("double").alias("pct_rank"),
        F.cume_dist().over(w).cast("double").alias("cume"),
        F.lead("o_orderkey", 1).over(w).alias("next_key"),
        F.lag("o_orderkey", 1).over(w).alias("prev_key"),
    )


@query(
    "doc_bigram_counts",
    oracle="""
SELECT bigram, count(*) AS n
FROM (
  SELECT unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])) AS bigram
  FROM (SELECT string_split(text, ' ') AS w FROM documents)
)
GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT 50
""",
)
def doc_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram counts (text-analysis / n-gram LM family — the
    contamination-check primitive for training corpora): tokenize by
    single space, build adjacent pairs with a higher-order TRANSFORM
    over the token array (pure JVM, no Python UDF), explode, count.
    At 100 TB the explode is map-local and the only shuffle carries
    (bigram, partial_count) pairs — map-side combine keeps it small.
    Top-50 with (count, bigram) tie-break is deterministic."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.split("text", " ").alias("w"))
        .where(F.size("w") >= 2)
        .select(
            F.explode(
                F.expr("transform(sequence(0, size(w) - 2), i -> concat(w[i], ' ', w[i + 1]))")
            ).alias("bigram")
        )
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(50)
    )


@query(
    "upsert_latest_wins",
    oracle="""
WITH log AS (
  SELECT doc_id, text, 0 AS version, 'U' AS op FROM documents
  UNION ALL
  SELECT doc_id, 'updated: ' || text, 1, 'U' FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id, CAST(NULL AS VARCHAR), 2, 'D' FROM documents WHERE doc_id % 11 = 0
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY version DESC) AS rn
  FROM log
)
SELECT doc_id, text, version
FROM ranked WHERE rn = 1 AND op = 'U'
ORDER BY doc_id
""",
)
def upsert_latest_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC merge / upsert compaction (the reference's Chroma sink
    upserts by explicit id — build_vectorstore.py:233-250; this is that
    semantic as a set operation): base snapshot ∪ update log ∪
    tombstones → latest version per key wins, deletes drop the key.
    One shuffle on the merge key; at 100 TB this is the standard
    snapshot-compaction job (and the window form beats a self-join
    MAX-version probe: one pass, no second scan of the log)."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    base = d.select("doc_id", "text", F.lit(0).alias("version"), F.lit("U").alias("op"))
    updates = d.where(F.col("doc_id") % 7 == 0).select(
        "doc_id",
        F.concat(F.lit("updated: "), F.col("text")).alias("text"),
        F.lit(1).alias("version"),
        F.lit("U").alias("op"),
    )
    tombstones = d.where(F.col("doc_id") % 11 == 0).select(
        "doc_id",
        F.lit(None).cast("string").alias("text"),
        F.lit(2).alias("version"),
        F.lit("D").alias("op"),
    )
    log = base.unionByName(updates).unionByName(tombstones)
    w = Window.partitionBy("doc_id").orderBy(F.col("version").desc())
    return (
        log.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("op") == "U"))
        .select("doc_id", "text", "version")
        .orderBy("doc_id")
    )


_PROFILE_COLS = [
    "o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority",
]


@query(
    "table_profile_orders",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{c}' AS col_name,
       CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM orders""" for c in _PROFILE_COLS
    ),
)
def table_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling report (the first job on any new 100 TB corpus):
    null / distinct / row counts for every column in ONE scan — the
    per-column aggregates all evaluate in a single pass and STACK
    unpivots the one-row result into a per-column report. The oracle
    is the naive N-scans UNION form; the engine plan reads the table
    once."""
    o = load_table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"nn_{c}"))
        aggs.append(F.count_distinct(c).alias(f"nd_{c}"))
    one = o.agg(*aggs)
    stack = ", ".join(f"'{c}', nn_{c}, nd_{c}" for c in _PROFILE_COLS)
    return one.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack}) AS (col_name, n_nulls, n_distinct)",
        "n_rows",
    ).select("col_name", "n_nulls", "n_distinct", "n_rows")


@query(
    "dq_constraint_checks",
    oracle="""
SELECT 'orders_custkey_fk' AS constraint_name,
       CAST(COUNT(*) AS BIGINT) AS n_violations
FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'lineitem_orderkey_fk',
       CAST(COUNT(*) AS BIGINT)
FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'orders_pk_unique',
       CAST(COUNT(*) AS BIGINT)
FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1)
UNION ALL
SELECT 'customer_acctbal_notnull',
       CAST(COUNT(*) AS BIGINT)
FROM customer WHERE c_acctbal IS NULL
UNION ALL
SELECT 'lineitem_qty_range',
       CAST(COUNT(*) AS BIGINT)
FROM lineitem WHERE l_quantity <= 0 OR l_quantity > 100
""",
)
def dq_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint/expectation suite (the DQ gate a training pipeline
    runs before ingesting a drop): referential integrity via LEFT ANTI
    joins (one shuffle each, no row duplication), primary-key
    uniqueness via group-count, null and range checks as scan-side
    filters. Emits one (constraint, violation-count) row each — the
    contract is every count == 0; non-zero rows name exactly what
    broke. Extends the reference's ad-hoc duplicate scan
    (build_vectorstore.py:260-270) into a declared constraint set."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    l = load_table(spark, sf_dir, "lineitem")

    def one(name: str, cnt: DataFrame) -> DataFrame:
        return cnt.select(
            F.lit(name).alias("constraint_name"), F.col("n").cast("bigint").alias("n_violations")
        )

    fk_orders = o.join(c, o.o_custkey == c.c_custkey, "left_anti").agg(
        F.count(F.lit(1)).alias("n")
    )
    fk_line = l.join(o, l.l_orderkey == o.o_orderkey, "left_anti").agg(
        F.count(F.lit(1)).alias("n")
    )
    pk_dup = (
        o.groupBy("o_orderkey")
        .count()
        .where(F.col("count") > 1)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    nn = c.where(F.col("c_acctbal").isNull()).agg(F.count(F.lit(1)).alias("n"))
    rng = l.where((F.col("l_quantity") <= 0) | (F.col("l_quantity") > 100)).agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        one("orders_custkey_fk", fk_orders)
        .unionByName(one("lineitem_orderkey_fk", fk_line))
        .unionByName(one("orders_pk_unique", pk_dup))
        .unionByName(one("customer_acctbal_notnull", nn))
        .unionByName(one("lineitem_qty_range", rng))
    )


@query(
    "sketch_freq_items",
    oracle="""
WITH t AS (SELECT COUNT(*) AS tot FROM orders),
c AS (SELECT o_orderpriority AS item, COUNT(*) AS n_occurrences
      FROM orders GROUP BY 1)
SELECT item, CAST(n_occurrences AS BIGINT) AS n_occurrences,
       TRUE AS found_by_sketch
FROM c, t WHERE n_occurrences > 0.15 * tot
""",
)
def sketch_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitters sketch (single-pass frequent-items — the 'which
    keys will skew my shuffle / which n-grams dominate the corpus'
    profiling primitive): Spark's freqItems gives the superset
    guarantee (every item with frequency >= support is returned, some
    false positives allowed) in one scan with constant memory — vs the
    exact group-by-count whose shuffle is O(distinct keys) at 100 TB.

    Bound-verdict form (full oracle): sketch contents are
    impl-specific, so the query derives the EXACT frequent-item set
    (count > support*total — fully oracle-derivable; STRICT, matching
    the sketch's guarantee) and emits one row
    per truly-frequent item with `found_by_sketch` = whether freqItems
    returned it. The superset guarantee says every verdict must be
    true; the oracle re-derives the exact set and the all-true column.
    False positives the sketch may add are simply not part of the
    report's grain."""
    o = load_table(spark, sf_dir, "orders")
    found = (
        o.stat.freqItems(["o_orderpriority"], support=0.15)
        .select(F.explode(F.col("o_orderpriority_freqItems")).alias("item"))
        .withColumn("__found", F.lit(True))
    )
    tot = o.agg(F.count(F.lit(1)).alias("__tot"))
    exact = (
        o.groupBy(F.col("o_orderpriority").alias("item"))
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .crossJoin(F.broadcast(tot))
        # STRICTLY greater: the freqItems guarantee covers items with
        # frequency > support*n (an exactly-at-the-boundary item may
        # legitimately be omitted by the sketch), so the exact grain
        # uses > to match — >= would manufacture a false red on a
        # boundary-count corpus
        .where(F.col("n_occurrences") > 0.15 * F.col("__tot"))
    )
    return (
        exact.join(F.broadcast(found), "item", "left")
        .select(
            "item",
            "n_occurrences",
            F.coalesce(F.col("__found"), F.lit(False)).alias("found_by_sketch"),
        )
        .orderBy("item")
    )


@query(
    "q12_priority_class_counts",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q12_priority_class_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode → returnflag per the fixture schema):
    both CASE buckets count in the same aggregate pass — one join, one
    shuffle, both tallies."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


_Q16_SQL = """
SELECT p.p_brand, p.p_type,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_size IN (5, 10, 15, 20)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%77%')
GROUP BY p.p_brand, p.p_type
ORDER BY supplier_cnt DESC, p_brand, p_type
LIMIT 50
"""


@query("q16_supplier_part_variety", oracle=_Q16_SQL)
def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (lineitem stands in for partsupp): NOT IN
    subquery — the NULL-AWARE anti join, a different physical operator
    from NOT EXISTS (must respect three-valued NOT IN semantics; Spark
    plans a null-aware BroadcastHashJoin LeftAnti), plus a distinct-
    count aggregate over the surviving pairs."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(_Q16_SQL)


_Q20_SQL = """
SELECT s.s_name FROM supplier s
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_name LIKE '%red%'
  GROUP BY l.l_suppkey
  HAVING SUM(l.l_quantity) > 400
)
ORDER BY s.s_name
"""


@query("q20_bulk_part_suppliers", oracle=_Q20_SQL)
def q20_bulk_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (suppliers with bulk volume in a product line):
    IN-subquery whose inner side is itself an aggregate with HAVING —
    decorrelates to a LEFT SEMI join against the agg output; the agg
    shuffles lineitem once on l_suppkey, the semi probe is a broadcast."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(_Q20_SQL)


@query(
    "join_hint_shuffle_hash",
    oracle="""
SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderstatus = 'O'
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""",
)
def join_hint_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy control surface: SHUFFLE_HASH hint forces a
    ShuffledHashJoin where the planner would default to broadcast or
    sort-merge — the escape hatch when the build side fits executor
    memory but exceeds the broadcast threshold (common mid-size dim at
    cluster scale: hash build beats the SMJ sort). Semantics identical
    to the unhinted join, which is exactly what the oracle checks."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "O")
    return (
        l.join(o.hint("shuffle_hash"), l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(_dec("l_extendedprice")), 2).cast("double").alias("total"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "window_frame_gallery",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice,
       CAST(dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY o_orderpriority)
            AS INTEGER) AS prio_rank,
       first_value(o_orderkey) OVER w AS cheapest_key,
       last_value(o_orderkey) OVER
         (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS priciest_key,
       nth_value(o_orderkey, 2) OVER
         (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_cheapest_key
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-02-01 00:00:00'
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
""",
)
def window_frame_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-function gallery (completes §2.5 with the value-position
    functions): dense_rank over REAL ties (priority strings — rank
    depends only on the key value, so ties are deterministic),
    first_value on the default running frame, last_value / nth_value on
    the explicit full frame (the default frame would return the current
    row — the classic last_value gotcha, made explicit here)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-02-01 00:00:00").cast("timestamp"))
    )
    w_run = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    w_full = w_run.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w_prio = Window.partitionBy("o_orderstatus").orderBy("o_orderpriority")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.dense_rank().over(w_prio).cast("int").alias("prio_rank"),
        F.first("o_orderkey").over(w_run).alias("cheapest_key"),
        F.last("o_orderkey").over(w_full).alias("priciest_key"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_cheapest_key"),
    )


_CALENDAR_SPINE_SQL = """
WITH RECURSIVE cal(d) AS (
  SELECT TIMESTAMP '1995-01-01 00:00:00'
  UNION ALL
  SELECT d + INTERVAL 1 DAY FROM cal WHERE d < TIMESTAMP '1995-02-28 00:00:00'
)
SELECT cal.d, CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
FROM cal LEFT JOIN orders o ON date_trunc('day', o.o_orderdate) = cal.d
GROUP BY cal.d
ORDER BY cal.d
"""


@query("calendar_spine_fill", oracle=_CALENDAR_SPINE_SQL)
def calendar_spine_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (new SQL surface in Spark 4) generating a calendar
    spine, LEFT-joined to orders so days with NO orders appear as
    zeros — the gap-filling step a plain GROUP BY can't do (absent
    groups don't exist to count). Identical SQL text runs on both
    engines; the recursion is linear (one row per day) so it
    terminates by construction."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_CALENDAR_SPINE_SQL)


@query(
    "map_fn_gallery",
    oracle="""
SELECT doc_id,
       map(['lang', 'src'], [lang, source])['lang'][1] AS lang_val,
       map(['lang', 'src'], [lang, source])['nope'][1] AS missing_val,
       CAST(cardinality(map(['lang', 'src'], [lang, source])) AS INTEGER) AS n_keys,
       array_to_string(list_sort(map_keys(map(['lang', 'src'], [lang, source]))), ',')
         AS keys_sorted,
       array_to_string(list_sort(map_values(map(['lang', 'src'], [lang, source]))), ',')
         AS values_sorted
FROM documents WHERE doc_id < 50
ORDER BY doc_id
""",
)
def map_fn_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type scalar surface (§2.8 extension — the reference stores
    metadata as schemaless dicts; this is the typed MapType toolkit):
    construction, safe lookup (try_element_at → NULL on a missing key,
    the non-throwing form under ANSI mode), cardinality, sorted
    keys/values projection. All JVM-side; maps serialize columnar in
    parquet as key/value list pairs."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    m = F.create_map(
        F.lit("lang"), F.col("lang"), F.lit("src"), F.col("source")
    )
    return d.select(
        "doc_id",
        F.try_element_at(m, F.lit("lang")).alias("lang_val"),
        F.try_element_at(m, F.lit("nope")).alias("missing_val"),
        F.size(m).cast("int").alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        F.array_join(F.array_sort(F.map_values(m)), ",").alias("values_sorted"),
    ).orderBy("doc_id")


@query(
    "regexp_capture_ids",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN CAST(regexp_extract(c_name, 'Customer#(\\d+)', 1) AS BIGINT)
                          = c_custkey THEN 1 ELSE 0 END) AS BIGINT) AS n_consistent
FROM customer
""",
)
def regexp_capture_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-group extraction (regexp_extract with a numbered group
    — the parse-structured-ids-out-of-text op the reference needs for
    its posting-number strings): parse the numeric id embedded in
    c_name and check it agrees with the surrogate key. Contract:
    n_consistent == n_total."""
    c = load_table(spark, sf_dir, "customer")
    parsed = F.regexp_extract("c_name", r"Customer#(\d+)", 1).cast("bigint")
    return c.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(parsed == F.col("c_custkey"), 1).otherwise(0)).cast("bigint").alias(
            "n_consistent"
        ),
    )


@query(
    "revenue_share_by_nation",
    oracle="""
WITH nat AS (
  SELECT n.n_name AS nation,
         ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS revenue
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  GROUP BY n.n_name
)
SELECT nation, CAST(revenue AS DOUBLE) AS revenue,
       CAST(ROUND(CAST(revenue AS DOUBLE)
                  / CAST(SUM(revenue) OVER () AS DOUBLE), 6) AS DOUBLE) AS share
FROM nat
ORDER BY nation
""",
)
def revenue_share_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total: a window aggregate over the WHOLE result (empty
    OVER ()) divides each nation's revenue by the global total without
    a second scan or a crossJoin — the window reuses the aggregated
    rows (25 of them), so the 'total' costs one tiny extra exchange.
    Share division happens on rounded decimals cast to double —
    engine-independent. The decimal SUM OVER () is order-free, so even
    the window total is exact."""
    from pyspark.sql import Window

    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    nat = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount"))), 2).alias("revenue"))
    )
    total = F.sum("revenue").over(Window.partitionBy())
    return nat.select(
        "nation",
        F.col("revenue").cast("double").alias("revenue"),
        F.round(F.col("revenue").cast("double") / total.cast("double"), 6).alias("share"),
    ).orderBy("nation")


@query(
    "events_value_histogram",
    oracle="""
SELECT CASE WHEN value < 0.0 THEN 0
            WHEN value >= 100.0 THEN 21
            ELSE CAST(FLOOR(value / 5.0) AS INTEGER) + 1 END AS bin,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
GROUP BY 1
ORDER BY bin
""",
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (20 bins over [0,100); under/overflow in
    bins 0 and 21 — width_bucket semantics spelled out as the explicit
    CASE both engines evaluate identically; Spark's built-in
    width_bucket is the shorthand at scale). One-pass distribution
    profile: bucketing is a pure scalar, the only shuffle carries 22
    partial counts."""
    ev = load_table(spark, sf_dir, "events")
    bin_ = (
        F.when(F.col("value") < 0.0, 0)
        .when(F.col("value") >= 100.0, 21)
        .otherwise(F.floor(F.col("value") / 5.0).cast("int") + 1)
    )
    return (
        ev.groupBy(bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bin")
    )


@query(
    "stats_corr_exact",
    oracle="""
WITH m AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(ROUND((n * sxy - sx * sy)
            / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS DOUBLE) AS pearson_r
FROM m
ORDER BY l_returnflag
""",
)
def stats_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation per group computed from EXACT decimal
    moments (sums of x, y, x², y², xy accumulate as decimals — order-
    free under partial aggregation — then one double formula at the
    end). The built-in corr() streams doubles and is partition-order
    dependent; this form is the bit-reproducible alternative, and the
    moment sums are the same map-side-combine shape."""
    l = load_table(spark, sf_dir, "lineitem")
    x = _dec("l_quantity")
    y = _dec("l_extendedprice")
    m = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) * F.sqrt(
        F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    )
    return m.select(
        "l_returnflag", F.round(num / den, 6).alias("pearson_r")
    ).orderBy("l_returnflag")


@query(
    "join_null_safe_eq",
    oracle="""
WITH a AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_nationkey END AS k
  FROM customer
), b AS (
  SELECT n_nationkey AS bk, n_name FROM nation
  UNION ALL
  SELECT NULL, 'UNKNOWN'
)
SELECT COALESCE(b.n_name, '??') AS nation_name, CAST(COUNT(*) AS BIGINT) AS n_custs
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.bk
GROUP BY 1
ORDER BY nation_name
""",
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL
    keys MATCH the dimension's NULL sentinel row instead of silently
    dropping — the missing-dimension-member pattern. A plain equi-join
    loses every seventh customer here; the null-safe form routes them
    to 'UNKNOWN'. Spark hash-partitions NULL like any other key value
    under <=>, so the join stays a regular shuffled/broadcast hash
    join (no fallback to nested-loop)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    a = c.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, F.lit(None)).otherwise(F.col("c_nationkey")).alias("k"),
    )
    b = n.select(F.col("n_nationkey").alias("bk"), "n_name").unionByName(
        spark.createDataFrame([(None, "UNKNOWN")], "bk int, n_name string")
    )
    return (
        a.join(F.broadcast(b), a.k.eqNullSafe(b.bk))
        .groupBy(F.coalesce("n_name", F.lit("??")).alias("nation_name"))
        .agg(F.count(F.lit(1)).alias("n_custs"))
        .orderBy("nation_name")
    )


@query(
    "try_cast_gallery",
    oracle="""
SELECT doc_id,
       TRY_CAST(lang AS INTEGER) AS lang_as_int,
       TRY_CAST(CAST(n_chars AS VARCHAR) AS INTEGER) AS chars_roundtrip,
       CAST(n_chars AS DOUBLE) / NULLIF(doc_id % 5, 0) AS safe_div
FROM documents
WHERE doc_id < 50
ORDER BY doc_id
""",
)
def try_cast_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode error handling surface: Spark 4 runs ANSI SQL by
    default, so a bad CAST or division-by-zero THROWS mid-job — at
    100 TB that's a 6-hour pipeline dying on one malformed row. The
    try_* family (try_cast, try_divide, try_add) is the row-level
    recovery contract: malformed input yields NULL and the job
    survives. Oracle: DuckDB TRY_CAST / NULLIF-guarded division."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    return d.select(
        "doc_id",
        F.col("lang").try_cast("int").alias("lang_as_int"),
        F.col("n_chars").cast("string").try_cast("int").alias("chars_roundtrip"),
        F.try_divide(F.col("n_chars").cast("double"), (F.col("doc_id") % 5)).alias("safe_div"),
    ).orderBy("doc_id")


@query(
    "collect_sorted_orderkeys",
    oracle="""
SELECT c_custkey,
       array_to_string(list_sort(list(o_orderkey)), ',') AS orderkeys_csv,
       CAST(len(list(o_orderkey)) AS INTEGER) AS n_orders
FROM customer JOIN orders ON c_custkey = o_custkey
WHERE c_custkey < 100
GROUP BY c_custkey
ORDER BY c_custkey
""",
)
def collect_sorted_orderkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered aggregation-to-array (the inverse of explode — nested
    RESULT construction, how the engine re-materializes the
    reference's posting-list shape): collect_list is shuffle-order-
    nondeterministic, so the contract is sort_array AFTER collecting —
    the only way a distributed array-agg is reproducible."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") < 100)
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_custkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("o_orderkey")), ",").alias("orderkeys_csv"),
            F.size(F.collect_list("o_orderkey")).cast("int").alias("n_orders"),
        )
        .orderBy("c_custkey")
    )

"""Substrate wave 5: scalar-function galleries (date/time, exact
math/bitwise, array), a correlated LATERAL top-N-per-group join, a
multi-aggregate pivot, and the Spark-4 VARIANT semi-structured path.

SURVEY §2.8 lists date/math functions as "absent" in the reference
(dates and money exist only as Korean free text); a complete engine
substrate still needs them, so these galleries pin the exact
cross-engine semantics (ISO week numbers, Sunday-1 day-of-week,
end-of-month clamping in add_months, pmod vs %, IEEE sqrt/ln/exp).

Determinism notes (repo rules, see PERF.md):
  * day-of-week: Spark `dayofweek` is Sunday=1; DuckDB oracle derives
    the same via `(isodow % 7) + 1`.
  * doubles produced by sqrt/pow/ln/exp are identical IEEE-754 ops on
    identical inputs in both engines; transcendentals additionally get
    `round(x, 6)` so a 1-ulp libm difference can't flip the hash.
  * pivot cells with no rows: Spark pivot yields NULL for COUNT —
    coalesced to 0 to match SQL `COUNT(*) FILTER`, which never NULLs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_search_ner_spark.registry import query
from vector_search_ner_spark.sources.catalog import load_table


@query(
    "date_fn_gallery",
    oracle="""
SELECT o_orderkey,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS d,
       CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS yr,
       CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS qtr,
       CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS mo,
       CAST(EXTRACT(day FROM o_orderdate) AS INTEGER) AS dom,
       CAST((EXTRACT(isodow FROM o_orderdate) % 7) + 1 AS INTEGER) AS dow_sun1,
       CAST(EXTRACT(week FROM o_orderdate) AS INTEGER) AS iso_week,
       CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR) AS plus30,
       CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS VARCHAR)
         AS plus2mo,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INTEGER)
         AS days_to_98,
       CAST(CAST(date_trunc('quarter', o_orderdate) AS DATE) AS VARCHAR) AS qtr_start
FROM orders WHERE o_orderkey < 300
ORDER BY o_orderkey
""",
)
def date_fn_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar surface (§2.8 "absent" row made concrete):
    extraction, ISO week, Sunday-1 day-of-week, day arithmetic,
    month arithmetic with end-of-month clamping (add_months), last_day,
    datediff, quarter truncation. All whole-stage-codegen expressions —
    no UDF, no shuffle beyond the final sort."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 300)
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        d.cast("string").alias("d"),
        F.year(d).cast("int").alias("yr"),
        F.quarter(d).cast("int").alias("qtr"),
        F.month(d).cast("int").alias("mo"),
        F.dayofmonth(d).cast("int").alias("dom"),
        F.dayofweek(d).cast("int").alias("dow_sun1"),
        F.weekofyear(d).cast("int").alias("iso_week"),
        F.date_add(d, 30).cast("string").alias("plus30"),
        F.add_months(d, 2).cast("string").alias("plus2mo"),
        F.last_day(d).cast("string").alias("month_end"),
        F.datediff(F.lit("1998-01-01").cast("date"), d).cast("int").alias("days_to_98"),
        F.date_trunc("quarter", d).cast("date").cast("string").alias("qtr_start"),
    ).orderBy("o_orderkey")


@query(
    "math_fn_gallery",
    oracle="""
SELECT o_orderkey,
       abs(o_orderkey - 3000) AS abs_diff,
       ((o_orderkey % 7) + 7) % 7 AS pmod7,
       CAST(ceil(o_orderkey / 7.0) AS BIGINT) AS ceil7,
       CAST(floor(o_orderkey / 7.0) AS BIGINT) AS floor7,
       sqrt(CAST(o_orderkey AS DOUBLE)) AS sqrt_k,
       pow(CAST(o_orderkey % 10 AS DOUBLE), 3.0) AS cube_last,
       CAST(sign(o_orderkey - 3000) AS INTEGER) AS sgn,
       greatest(o_orderkey % 7, o_orderkey % 5, o_orderkey % 3) AS gmax,
       least(o_orderkey % 7, o_orderkey % 5, o_orderkey % 3) AS lmin,
       o_orderkey & 255 AS band,
       o_orderkey | 16 AS bor,
       xor(o_orderkey, 85) AS bxor,
       (o_orderkey % 16) << 2 AS shl,
       round(ln(CAST(o_orderkey AS DOUBLE) + 1), 6) AS ln_k,
       round(exp(CAST(o_orderkey % 5 AS DOUBLE)), 6) AS exp_small
FROM orders WHERE o_orderkey < 500
ORDER BY o_orderkey
""",
)
def math_fn_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact math + bitwise scalar surface (§2.8 "absent" row).
    Everything except ln/exp is exactly defined (integer ops, IEEE
    sqrt, small-int pow); transcendentals are rounded to 6dp so the
    cross-engine compare is libm-implementation-proof."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 500)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        F.abs(k - 3000).alias("abs_diff"),
        F.pmod(k, F.lit(7)).cast("bigint").alias("pmod7"),
        F.ceil(k / F.lit(7.0)).cast("bigint").alias("ceil7"),
        F.floor(k / F.lit(7.0)).cast("bigint").alias("floor7"),
        F.sqrt(k.cast("double")).alias("sqrt_k"),
        F.pow((k % 10).cast("double"), F.lit(3.0)).alias("cube_last"),
        F.signum((k - 3000).cast("double")).cast("int").alias("sgn"),
        F.greatest(k % 7, k % 5, k % 3).alias("gmax"),
        F.least(k % 7, k % 5, k % 3).alias("lmin"),
        k.bitwiseAND(F.lit(255)).alias("band"),
        k.bitwiseOR(F.lit(16)).alias("bor"),
        k.bitwiseXOR(F.lit(85)).alias("bxor"),
        F.shiftleft(k % 16, 2).cast("bigint").alias("shl"),
        F.round(F.log(k.cast("double") + 1), 6).alias("ln_k"),
        F.round(F.exp((k % 5).cast("double")), 6).alias("exp_small"),
    ).orderBy("o_orderkey")


@query(
    "array_fn_gallery",
    oracle="""
SELECT doc_id,
       CAST(len(w) AS INTEGER) AS n_tokens,
       CAST(len(list_distinct(w)) AS INTEGER) AS n_distinct,
       array_to_string(w[1:3], ' ') AS first3,
       w[-1] AS last_tok,
       CAST(list_position(w, w[-1]) AS INTEGER) AS last_tok_first_pos,
       CAST(list_max(list_transform(w, t -> length(t))) AS INTEGER) AS max_tok_len,
       COALESCE(array_to_string(list_sort(list_intersect(w, ['the', 'of', 'and'])), ','), '')
         AS stop_hits
FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id < 40)
ORDER BY doc_id
""",
)
def array_fn_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar surface over token lists (§2.8 extension): size,
    distinct-size, slice, negative-index element_at, first-occurrence
    position, higher-order transform + array_max, and set-intersection
    with a literal array. Spark's array_intersect preserves first-array
    order while DuckDB's list_intersect does not guarantee one, so the
    intersection is sorted before joining — order-free contract."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 40)
    w = F.split("text", " ")
    stop = F.array(F.lit("the"), F.lit("of"), F.lit("and"))
    return d.select(
        "doc_id",
        F.size(w).cast("int").alias("n_tokens"),
        F.size(F.array_distinct(w)).cast("int").alias("n_distinct"),
        F.array_join(F.slice(w, 1, 3), " ").alias("first3"),
        F.element_at(w, -1).alias("last_tok"),
        F.array_position(w, F.element_at(w, -1)).cast("int").alias("last_tok_first_pos"),
        F.array_max(F.transform(w, lambda t: F.length(t))).cast("int").alias("max_tok_len"),
        F.array_join(F.array_sort(F.array_intersect(w, stop)), ",").alias("stop_hits"),
    ).orderBy("doc_id")


_LATERAL_TOPN_SQL = """
SELECT c.c_custkey, t.o_orderkey, t.price_r
FROM customer c,
LATERAL (
  SELECT o_orderkey, round(o_totalprice, 2) AS price_r
  FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 3
) t
WHERE c.c_custkey < 200
ORDER BY c.c_custkey, price_r DESC, o_orderkey
"""


@query("lateral_topn_per_customer", oracle=_LATERAL_TOPN_SQL)
def lateral_topn_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT — the SQL-
    standard spelling of top-N-per-group (the engine's window form is
    `window_top_orders_per_cust`; this pins the decorrelation surface).
    Identical SQL text runs on both engines; Catalyst decorrelates the
    per-row limit into a ranked join rather than re-executing the inner
    query per customer row — the shape that survives scale-up."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_LATERAL_TOPN_SQL)


@query(
    "pivot_multi_agg",
    oracle="""
SELECT user_id,
       count(*) FILTER (event_type = 'click') AS click_cnt,
       round(CAST(sum(CAST(value AS DECIMAL(18,2))) FILTER (event_type = 'click')
             AS DOUBLE), 2) AS click_val,
       count(*) FILTER (event_type = 'view') AS view_cnt,
       round(CAST(sum(CAST(value AS DECIMAL(18,2))) FILTER (event_type = 'view')
             AS DOUBLE), 2) AS view_val,
       count(*) FILTER (event_type = 'purchase') AS purchase_cnt,
       round(CAST(sum(CAST(value AS DECIMAL(18,2))) FILTER (event_type = 'purchase')
             AS DOUBLE), 2) AS purchase_val
FROM events
GROUP BY user_id
ORDER BY user_id
""",
)
def pivot_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with TWO aggregates per pivoted value (count + exact-
    decimal sum) — one hash-agg pass, no self-join; the long→wide
    reshaping a reporting layer needs. Explicit value list keeps the
    plan static (no extra distinct-scan job to discover pivot values —
    the form that matters at 100 TB). NULL count cells coalesce to 0
    to match SQL FILTER semantics."""
    ev = load_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase"])
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum(dec).cast("double"), 2).alias("val"),
        )
    )
    cols = [F.col("user_id")]
    for t in ["click", "view", "purchase"]:
        cols.append(F.coalesce(F.col(f"{t}_cnt"), F.lit(0)).alias(f"{t}_cnt"))
        cols.append(F.col(f"{t}_val").alias(f"{t}_val"))
    return wide.select(*cols).orderBy("user_id")


@query(
    "variant_json_extract",
    oracle="""
SELECT event_id,
       json_extract_string(to_json({'t': event_type, 'u': user_id}), '$.t') AS vtype,
       CAST(json_extract(to_json({'t': event_type, 'u': user_id}), '$.u') AS BIGINT)
         AS vuser,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k_val
FROM events WHERE event_id < 500
ORDER BY event_id
""",
)
def variant_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-4 VARIANT path for semi-structured data (the typed,
    binary-encoded successor to the reference's JSON-in-string
    metadata, build_vectorstore.py:217): serialize → parse_json →
    variant_get with typed paths. VARIANT keeps shredded access
    columnar-friendly at scale instead of re-parsing strings per
    predicate. Oracle re-derives the same values via DuckDB's JSON
    functions."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 500)
    j = F.to_json(F.struct(F.col("event_type").alias("t"), F.col("user_id").alias("u")))
    v = F.parse_json(j)
    return ev.select(
        "event_id",
        F.variant_get(v, "$.t", "string").alias("vtype"),
        F.variant_get(v, "$.u", "bigint").alias("vuser"),
        F.variant_get(F.parse_json(F.col("props")), "$.k", "bigint").alias("k_val"),
    ).orderBy("event_id")


@query(
    "agg_mode_median",
    oracle="""
WITH c AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY user_id, event_type
),
m AS (
  SELECT user_id, event_type AS mode_type, n AS mode_n,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY n DESC, event_type) AS rn
  FROM c
),
md AS (
  SELECT user_id,
         CAST(quantile_cont(CAST(ROUND(value * 100) AS BIGINT), 0.5) / 100
              AS DOUBLE) AS median_value
  FROM events GROUP BY user_id
)
SELECT m.user_id, m.mode_type, m.mode_n, md.median_value
FROM m JOIN md ON m.user_id = md.user_id
WHERE m.rn = 1
ORDER BY m.user_id
""",
)
def agg_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode + exact interpolated median per group.
    Spark's builtin mode() leaves ties unspecified, so the mode is
    derived as rank-1 of (count DESC, value ASC) — reproducible under
    any partitioning, which a 100 TB retry demands. Median uses exact
    percentile (sort-based interpolation, == DuckDB quantile_cont) over
    INTEGER CENTS: even-count midpoints are then exactly x or x.5, so
    the interpolation is exact in both engines and the single /100
    double division is the same IEEE op — no rounding, no tie drift
    (raw-double percentile differs at 26.135-style round boundaries).
    Count table is tiny (|users| x |types|), so the rank window and
    join are trivial; the median is the only real per-group sort."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    rn = F.row_number().over(
        Window.partitionBy("user_id").orderBy(F.desc("n"), "event_type")
    )
    m = (
        c.withColumn("rn", rn)
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("mode_type"),
            F.col("n").alias("mode_n"),
        )
    )
    cents = F.expr("CAST(ROUND(value * 100) AS BIGINT)")
    md = ev.groupBy("user_id").agg(
        (F.percentile(cents, F.lit(0.5)) / 100)
        .cast("double")
        .alias("median_value")
    )
    return m.join(md, "user_id").orderBy("user_id")


@query(
    "sql_udf_gallery",
    oracle="""
WITH base AS (
  SELECT doc_id, text, string_split(trim(text), ' ') AS toks
  FROM documents WHERE doc_id < 50
), lat AS (
  SELECT doc_id, text, toks,
         unnest(generate_series(1, least(3, len(toks)))) AS i
  FROM base
)
SELECT doc_id,
       CAST(i - 1 AS INTEGER) AS pos,
       toks[i] AS tok,
       CAST(len(toks) AS INTEGER) AS n_tokens,
       ROUND(length(regexp_replace(lower(text), '[^aeiou]', '', 'g'))
             / CAST(length(text) AS DOUBLE), 4) AS vowel_ratio
FROM lat
""",
)
def sql_udf_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL UDFs (CREATE TEMPORARY FUNCTION ... RETURN) — the
    declarative function-extension surface: named logic that stays
    ENTIRELY inside Catalyst (the function body inlines into the plan
    at analysis time — full codegen/pushdown, unlike a Python UDF).
    One scalar UDF (vowel_ratio), one SQL TABLE function (first_toks,
    used via LATERAL correlation), composed in one statement. The
    oracle inlines the same logic — which is exactly the point: a SQL
    UDF is a reusable name for an expression, not an execution
    boundary."""
    docs = load_table(spark, sf_dir, "documents")
    docs.where(F.col("doc_id") < 50).createOrReplaceTempView("__sqludf_docs")
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION vowel_ratio(s STRING)
           RETURNS DOUBLE
           RETURN ROUND(length(regexp_replace(lower(s), '[^aeiou]', ''))
                        / CAST(length(s) AS DOUBLE), 4)"""
    )
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION first_toks(s STRING, k INT)
           RETURNS TABLE (tok STRING, pos INT)
           RETURN SELECT g, CAST(i AS INT)
                  FROM LATERAL VIEW posexplode(split(trim(s), ' ')) t AS i, g
                  WHERE i < k"""
    )
    return spark.sql(
        """SELECT d.doc_id, f.pos, f.tok,
                  size(split(trim(d.text), ' ')) AS n_tokens,
                  vowel_ratio(d.text) AS vowel_ratio
           FROM __sqludf_docs d, LATERAL first_toks(d.text, 3) f"""
    )

"""Substrate wave 2 (SURVEY §2 'absent' rows + §1.2 nested types +
§2.1 file formats): subqueries, skew-salted aggregation, nested
struct/array construction + flattening, JSON/CSV schema-on-read
sources, scalar-function gallery.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vector_search_ner_spark.registry import query
from vector_search_ner_spark.sources.catalog import load_table

ARTIFACT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "_artifacts"
)


@query(
    "scalar_subquery_above_avg",
    oracle="""
SELECT p_partkey, p_retailprice
FROM part
WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part)
""",
)
def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (Catalyst plans a one-row
    broadcast). Declared via the SQL surface — spark.sql and the
    DataFrame API produce the same plan."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        "SELECT p_partkey, p_retailprice FROM part "
        "WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part)"
    )


@query(
    "correlated_subquery_nation_avg",
    oracle="""
SELECT c.c_custkey, c.c_nationkey
FROM customer c
WHERE c.c_acctbal > (
  SELECT AVG(c2.c_acctbal) FROM customer c2
  WHERE c2.c_nationkey = c.c_nationkey
)
""",
)
def correlated_subquery_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst decorrelates it into an
    aggregate + join (the rewrite the reference's hand-rolled loops
    could never do; SURVEY §4 'subquery decorrelation')."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_nationkey
        FROM customer c
        WHERE c.c_acctbal > (
          SELECT AVG(c2.c_acctbal) FROM customer c2
          WHERE c2.c_nationkey = c.c_nationkey
        )
        """
    )


@query(
    "salted_groupby_skew",
    oracle="""
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
FROM events GROUP BY user_id
""",
)
def salted_groupby_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation — the skew-mitigation pattern for
    hot keys at 100 TB: phase 1 groups by (key, salt) spreading a hot
    key over 8 reducers; phase 2 merges the partials. Result is
    identical to a direct groupBy (the oracle IS the direct groupBy).
    (Spark's partial aggregation already does this when the agg is
    algebraic; explicit salting is the pattern for when it isn't —
    e.g. collect_list / exact distinct on a hot key.)"""
    ev = load_table(spark, sf_dir, "events")
    salt = F.pmod(F.crc32(F.col("event_id").cast("string")), F.lit(8)).alias("salt")
    phase1 = ev.groupBy("user_id", salt).agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("pt"),
    )
    return phase1.groupBy("user_id").agg(
        F.sum("pn").alias("n"),
        F.round(F.sum("pt"), 2).cast("double").alias("total"),
    )


@query(
    "nested_detail_requirements",
    oracle="""
SELECT l_orderkey,
       array_to_string(
         list_sort(list(l_returnflag || ': ' || CAST(l_quantity AS INTEGER))),
         chr(10)) AS details
FROM lineitem
WHERE l_orderkey < 60
GROUP BY l_orderkey
""",
)
def nested_detail_requirements(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 세부요건 shape (/root/reference/build_vectorstore.py:144-150):
    build an array of k:v detail entries per record, then render it to
    'k: v' lines. Construction (collect_list of structs) + flatten
    (transform to strings) + deterministic order (array_sort) +
    array_join — the nested-type surface of SURVEY §1.2."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 60)
    entries = li.groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct(F.col("l_returnflag").alias("k"), F.col("l_quantity").cast("int").alias("v"))
        ).alias("reqs")
    )
    rendered = F.array_join(
        F.array_sort(
            F.transform(
                F.col("reqs"), lambda r: F.concat_ws(": ", r["k"], r["v"].cast("string"))
            )
        ),
        "\n",
    )
    return entries.select("l_orderkey", rendered.alias("details"))


_DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


@query(
    "json_source_scan",
    oracle="""
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(length(text)) AS BIGINT) AS chars
FROM documents GROUP BY lang
""",
)
def json_source_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON source with EXPLICIT schema (schema-on-read, no inference
    pass — the reference loads JSON with ad-hoc dict gets,
    /root/reference/build_vectorstore.py:104-112): documents round-
    tripped through a JSON sink and scanned back."""
    docs = load_table(spark, sf_dir, "documents")
    path = os.path.join(ARTIFACT_DIR, "docs_json")
    docs.write.mode("overwrite").json(path)
    back = spark.read.schema(_DOC_SCHEMA).json(path)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.length("text")).alias("chars")
    )


@query(
    "csv_source_scan",
    oracle="""
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(n_chars) AS BIGINT) AS chars
FROM documents GROUP BY lang
""",
)
def csv_source_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source with explicit schema + header (no inferSchema scan)."""
    docs = load_table(spark, sf_dir, "documents")
    path = os.path.join(ARTIFACT_DIR, "docs_csv")
    docs.write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.schema(_DOC_SCHEMA).option("header", True).csv(path)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("chars")
    )


@query(
    "scalar_fn_gallery",
    oracle="""
SELECT doc_id,
       lower(substring(text, 1, 20)) AS snip_lower,
       strpos(text, 'spark') AS spark_pos,
       lpad(CAST(doc_id AS VARCHAR), 6, '0') AS padded_id,
       translate(lang, 'aeiou', 'AEIOU') AS lang_tr,
       printf('%s|%d', source, n_chars) AS tagged,
       reverse(source) AS rev_source,
       array_to_string(list_transform(generate_series(1, 3), i -> CAST(i * doc_id AS VARCHAR)), ',') AS id_multiples
FROM documents
WHERE doc_id < 50
""",
)
def scalar_fn_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function surface (SURVEY §2.8): substring/lower/instr/
    lpad/translate/printf-format/reverse + array sequence/transform/
    join — the string & array toolbox the reference uses ad hoc."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    return docs.select(
        "doc_id",
        F.lower(F.substring("text", 1, 20)).alias("snip_lower"),
        F.instr(F.col("text"), "spark").cast("long").alias("spark_pos"),
        F.lpad(F.col("doc_id").cast("string"), 6, "0").alias("padded_id"),
        F.translate("lang", "aeiou", "AEIOU").alias("lang_tr"),
        F.format_string("%s|%d", F.col("source"), F.col("n_chars")).alias("tagged"),
        F.reverse("source").alias("rev_source"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(3)),
                lambda i: (i.cast("long") * F.col("doc_id")).cast("string"),
            ),
            ",",
        ).alias("id_multiples"),
    )


@query(
    "salted_join_skew",
    oracle="""
SELECT d.lang, m.region_group,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(d.n_chars) AS BIGINT) AS total_chars
FROM documents d
JOIN (VALUES ('en', 'west'), ('code', 'tooling'), ('data', 'tooling')) AS m(lang, region_group)
  ON d.lang = m.lang
GROUP BY d.lang, m.region_group
""",
)
def salted_join_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join: `lang` has only 3 distinct values, so a plain
    shuffle join lands each hot key on ONE reducer. Salt the big side
    with pmod(crc32(doc_id), 8) and replicate the dim side 8x, joining
    on (lang, salt) — the hot key now spreads over 8 reducers. The
    oracle is the UNSALTED join: salting must not change semantics.
    (AQE skew-join does this adaptively for sort-merge joins; explicit
    salting is the pattern when the dim must shuffle or AQE can't see
    the skew.)"""
    N_SALT = 8
    docs = load_table(spark, sf_dir, "documents")
    dim = spark.createDataFrame(
        [("en", "west"), ("code", "tooling"), ("data", "tooling")],
        "lang string, region_group string",
    )
    salted_docs = docs.withColumn(
        "salt", F.pmod(F.crc32(F.col("doc_id").cast("string")), F.lit(N_SALT))
    )
    replicated_dim = dim.crossJoin(
        spark.range(N_SALT).select(F.col("id").cast("bigint").alias("salt"))
    )
    return (
        salted_docs.join(replicated_dim, ["lang", "salt"])
        .groupBy("lang", "region_group")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )

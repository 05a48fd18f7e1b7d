"""JSON-in-string NER metadata: the reference stores the doc-NER result
as a JSON STRING inside metadata ("LLM_NER": json.dumps(ner),
/root/reference/build_vectorstore.py:217) and re-parses it per doc at
query time (main.py:303-308, main_remind.py:415-419). Two operators:

  * ner_metadata_filter — the v1 `search_by_llm_ner` semantics
    (main_remind.py:409-447): parse the JSON string, coalesce the
    region-key drift (근무지역 / '근무 지역', main_remind.py:438), keep
    docs where every present field substring-matches the user NER
    (case-insensitive, AND, MISSING FIELD = PASS).
  * metadata_quality_report — the v1 `verify_document_metadata` DQ
    check (main_remind.py:250-276): per required key, how many docs
    lack it.

The metadata JSON is synthesized deterministically from `documents`
columns (with deliberate null/drift patterns), so the DuckDB oracle can
re-derive the expected output straight from the base columns — equality
proves the to_json -> from_json round-trip is lossless and the filter
semantics exact. Spark's to_json drops null fields, which is precisely
the reference's "key absent from metadata dict" case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vector_search_ner_spark.registry import query
from vector_search_ner_spark.sources.catalog import load_table

NER_SCHEMA = T.StructType(
    [
        T.StructField("직무", T.StringType()),
        T.StructField("근무지역", T.StringType()),
        T.StructField("근무 지역", T.StringType()),
        T.StructField("연령대", T.StringType()),
    ]
)

USER_JOB = "merge"
USER_REGION = "en"


def _job(col_text: Column) -> Column:
    return (
        F.when(col_text.contains("join"), "join")
        .when(col_text.contains("sort"), "sort")
        .when(col_text.contains("merge"), "merge")
        .when(col_text.contains("scan"), "scan")
        .otherwise(F.lit(None).cast("string"))
    )


_JOB_SQL = """CASE WHEN contains(text, 'join') THEN 'join'
         WHEN contains(text, 'sort') THEN 'sort'
         WHEN contains(text, 'merge') THEN 'merge'
         WHEN contains(text, 'scan') THEN 'scan'
         ELSE NULL END"""


def _with_ner_json(docs: DataFrame) -> DataFrame:
    """Attach the LLM_NER-style JSON string column. Drift: even doc_ids
    use key 근무지역, odd use '근무 지역'; 연령대 absent when
    doc_id % 7 == 0; 직무 absent when no job keyword in text."""
    job = _job(F.col("text"))
    age = F.when(F.col("doc_id") % 7 != 0, F.concat(F.floor(F.col("n_chars") / 100).cast("string"), F.lit("0대")))
    meta_even = F.struct(
        job.alias("직무"), F.col("lang").alias("근무지역"), age.alias("연령대")
    )
    meta_odd = F.struct(
        job.alias("직무"), F.col("lang").alias("근무 지역"), age.alias("연령대")
    )
    return docs.withColumn(
        "llm_ner",
        F.when(F.col("doc_id") % 2 == 0, F.to_json(meta_even)).otherwise(F.to_json(meta_odd)),
    )


@query(
    "ner_metadata_filter",
    oracle=f"""
SELECT doc_id,
       {_JOB_SQL} AS job,
       lang AS region,
       CASE WHEN doc_id % 7 != 0
            THEN CAST(CAST(FLOOR(n_chars / 100) AS BIGINT) AS VARCHAR) || '0대' END AS age_band
FROM documents
WHERE COALESCE(contains(lower({_JOB_SQL}), '{USER_JOB}'), TRUE)
  AND COALESCE(contains(lower(lang), '{USER_REGION}'), TRUE)
""",
)
def ner_metadata_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v1 NER-metadata filter over parsed JSON-in-string metadata:
    from_json -> drift coalesce -> case-insensitive substring AND,
    missing field passes (main_remind.py:409-447). The filter runs on
    parsed columns, so at scale Catalyst prunes the JSON parse to the
    referenced fields (JsonTuple pushdown) and the predicate stays in
    the scan stage — no shuffle at all."""
    docs = _with_ner_json(load_table(spark, sf_dir, "documents"))
    ner = F.from_json(F.col("llm_ner"), NER_SCHEMA)
    parsed = docs.select(
        "doc_id",
        ner["직무"].alias("job"),
        F.coalesce(ner["근무지역"], ner["근무 지역"]).alias("region"),
        ner["연령대"].alias("age_band"),
    )
    job_ok = F.coalesce(F.lower(F.col("job")).contains(USER_JOB.lower()), F.lit(True))
    region_ok = F.coalesce(F.lower(F.col("region")).contains(USER_REGION.lower()), F.lit(True))
    return parsed.where(job_ok & region_ok)


@query(
    "metadata_quality_report",
    oracle=f"""
SELECT '직무' AS key, CAST(SUM(CASE WHEN {_JOB_SQL} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
FROM documents
UNION ALL
SELECT '근무지역', CAST(0 AS BIGINT)
UNION ALL
SELECT '연령대', CAST(SUM(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT)
FROM documents
""",
)
def metadata_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v1 verify_document_metadata as a set-at-a-time DQ aggregate
    (main_remind.py:250-276 logs per-doc warnings; the engine emits one
    report row per required key): parse the JSON metadata, count docs
    missing each key. Single pass, map-side partial aggregation."""
    docs = _with_ner_json(load_table(spark, sf_dir, "documents"))
    ner = F.from_json(F.col("llm_ner"), NER_SCHEMA)
    parsed = docs.select(
        ner["직무"].alias("job"),
        F.coalesce(ner["근무지역"], ner["근무 지역"]).alias("region"),
        ner["연령대"].alias("age_band"),
    )
    agg = parsed.agg(
        F.sum(F.when(F.col("job").isNull(), 1).otherwise(0)).alias("직무"),
        F.sum(F.when(F.col("region").isNull(), 1).otherwise(0)).alias("근무지역"),
        F.sum(F.when(F.col("age_band").isNull(), 1).otherwise(0)).alias("연령대"),
    )
    return agg.select(
        F.expr("stack(3, '직무', `직무`, '근무지역', `근무지역`, '연령대', `연령대`) AS (key, n_missing)")
    )

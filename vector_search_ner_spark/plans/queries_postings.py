"""Posting-shaped nested JSON end-to-end (SURVEY §1.2-1.3): synthesize
the reference's nested jobs.json shape from the documents fixture,
round-trip it through a JSON sink, scan it back with the explicit
nested StructType, explode + flatten with drift coalesce, and render
세부요건 detail lines. The oracle reproduces the flat result straight
from `documents` — proving the nested construction, the JSON
round-trip, and the flatten are lossless and deterministic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_search_ner_spark.registry import query
from vector_search_ner_spark.sources.catalog import load_table
from vector_search_ner_spark.sources.json_source import (
    flatten_postings,
    read_postings,
    render_detail_reqs,
)

ARTIFACT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "_artifacts"
)


def _synthesize_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> nested posting batches (one batch per source):
    deterministic field mapping, with deliberate NULL patterns to
    exercise the drift coalesce and default-fill paths."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    posting = F.struct(
        F.col("doc_id").alias("공고번호"),
        F.substring("text", 1, 30).alias("채용제목"),
        F.col("source").alias("회사명"),
        # drift: even ids carry 근무지역, odd ids carry 지역
        F.when(F.col("doc_id") % 2 == 0, F.col("lang")).alias("근무지역"),
        F.when(F.col("doc_id") % 2 == 1, F.col("lang")).alias("지역"),
        F.when(F.col("doc_id") % 3 != 0, F.lit("월급 209 만원")).alias("급여조건"),
        F.concat(F.lit("ID-"), F.col("doc_id").cast("string")).alias("채용공고ID"),
        F.concat(F.lit("https://example.com/"), F.col("doc_id").cast("string")).alias("채용공고URL"),
        F.struct(
            F.substring("text", 1, 50).alias("직무내용"),
            F.array(
                F.create_map(F.lit("경력조건"), F.array(F.col("lang"))),
                F.create_map(F.lit("학력"), F.array(F.col("source"), F.col("lang"))),
            ).alias("세부요건"),
        ).alias("상세정보"),
    )
    return (
        # no sort_array: maps aren't orderable, and the array is exploded
        # right back downstream (the harness compare is order-insensitive)
        docs.groupBy("source")
        .agg(F.collect_list(posting).alias("채용공고목록"))
        .select(
            F.col("source").alias("검색조건"),
            F.size("채용공고목록").cast("long").alias("총_채용공고수"),
            F.lit("2025-01-21 10:00:00").alias("수집일시"),
            "채용공고목록",
        )
    )


@query(
    "postings_nested_json_flatten",
    oracle="""
SELECT source AS search_term,
       doc_id AS posting_no,
       substring(text, 1, 30) AS title,
       source AS company,
       lang AS region,
       CASE WHEN doc_id % 3 != 0 THEN '월급 209 만원' ELSE '정보없음' END AS salary,
       substring(text, 1, 50) AS job_desc,
       array_to_string(list_sort(['경력조건: ' || lang, '학력: ' || source || ' ' || lang]),
                       chr(10)) AS details_rendered
FROM documents
WHERE doc_id < 200
""",
)
def postings_nested_json_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    nested = _synthesize_postings(spark, sf_dir)
    path = os.path.join(ARTIFACT_DIR, "postings_json")
    nested.write.mode("overwrite").json(path)
    raw = read_postings(spark, path, multiline=False)
    return render_detail_reqs(flatten_postings(raw))


@query(
    "postings_explode_outer",
    oracle="""
SELECT doc_id AS posting_no, '경력조건: ' || lang AS req_line
FROM documents WHERE doc_id < 100 AND doc_id % 5 != 0
UNION ALL
SELECT doc_id, '학력: ' || source
FROM documents WHERE doc_id < 100 AND doc_id % 5 != 0
UNION ALL
SELECT doc_id, '요건없음'
FROM documents WHERE doc_id < 100 AND doc_id % 5 = 0
""",
)
def postings_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer over a nullable requirements array: postings with
    NO 세부요건 at all (every 5th here) must SURVIVE the flatten with a
    default line — plain explode silently drops them, the exact bug a
    posting pipeline ships without this variant (the reference's
    .get(key, default) discipline, build_vectorstore.py:145-150,
    applied to 1→N expansion)."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    details = F.when(
        F.col("doc_id") % 5 == 0, F.lit(None).cast("array<string>")
    ).otherwise(
        F.array(
            F.concat(F.lit("경력조건: "), F.col("lang")),
            F.concat(F.lit("학력: "), F.col("source")),
        )
    )
    return docs.select(
        F.col("doc_id").alias("posting_no"), F.explode_outer(details).alias("line")
    ).select(
        "posting_no", F.coalesce(F.col("line"), F.lit("요건없음")).alias("req_line")
    )

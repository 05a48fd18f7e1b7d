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


_KR_JOBS = ["백엔드 개발자", "데이터 엔지니어", "프론트엔드 개발자", "머신러닝 엔지니어"]
_KR_REGIONS = ["서울특별시 강남구", "경기도 성남시", "부산광역시", "서울시 송파구", "대전광역시"]
_KR_DRIFT_KEYS = ["근무지역", "지역", "근무지"]


@query(
    "postings_korean_drift_search",
    oracle="""
WITH k AS (
  SELECT doc_id,
         CASE doc_id % 4 WHEN 0 THEN '백엔드 개발자' WHEN 1 THEN '데이터 엔지니어'
                         WHEN 2 THEN '프론트엔드 개발자' ELSE '머신러닝 엔지니어' END
           || ' 채용 - ' || source AS title,
         CASE doc_id % 5 WHEN 0 THEN '서울특별시 강남구' WHEN 1 THEN '경기도 성남시'
                         WHEN 2 THEN '부산광역시' WHEN 3 THEN '서울시 송파구'
                         ELSE '대전광역시' END AS region,
         CASE WHEN doc_id % 3 != 0 THEN '월급 300만원' ELSE '정보없음' END AS salary
  FROM documents WHERE doc_id < 300
)
SELECT doc_id AS posting_no, title, region, salary,
       CAST(CASE WHEN title LIKE '%개발자%' THEN 0 ELSE 1 END AS INTEGER) AS match_level,
       substring(title, 1, 10) AS snippet,
       CAST(length(title) AS INTEGER) AS n_title_chars,
       CAST(len(string_split(title, ' ')) AS INTEGER) AS n_tokens
FROM k
WHERE region LIKE '%서울%'
""",
)
def postings_korean_drift_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The v2 contains-lattice exercised on REAL multi-byte Korean text
    with the reference's region-key drift (main.py:266 coalesces
    근무지역/지역; main_remind.py:438 adds 근무지): each posting carries
    its region under ONE of three drifted map keys depending on the
    row, and the search coalesces element_at over the key triple —
    the .get(k1) or .get(k2) discipline as a native map lookup, not a
    Python loop. On top: a two-level relaxation lattice (level 0 =
    region 서울 AND title 개발자; level 1 = region only), Korean
    substring/length/whitespace-token arithmetic — all character-based
    semantics that an ASCII fixture can never falsify, value-checked
    against DuckDB's independent UTF-8 implementation.

    At 100 TB: map element_at + coalesce + contains are all native
    codegen expressions — the whole filter+project stage is map-only
    (no UDF, no shuffle). The doc_id predicate reaches the parquet
    scan; the region filter is over a derived column, so it runs in
    the same codegen stage right above it (on real data, where region
    is a STORED column, the contains filter pushes down exactly like
    contains_filter_docs' plan test asserts)."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    job = _case_mod(F.col("doc_id"), 4, _KR_JOBS)
    region_val = _case_mod(F.col("doc_id"), 5, _KR_REGIONS)
    drift_key = _case_mod(F.col("doc_id"), 3, _KR_DRIFT_KEYS)
    title = F.concat(job, F.lit(" 채용 - "), F.col("source"))
    postings = docs.select(
        F.col("doc_id").alias("posting_no"),
        title.alias("title"),
        # the drifted nested-metadata map: one region key of three, per row
        F.create_map(drift_key, region_val).alias("meta"),
        F.when(F.col("doc_id") % 3 != 0, F.lit("월급 300만원"))
        .otherwise(F.lit("정보없음"))
        .alias("salary"),
    )
    region = F.coalesce(
        *[F.element_at("meta", F.lit(k)) for k in _KR_DRIFT_KEYS]
    )
    return (
        postings.withColumn("region", region)
        .where(F.col("region").contains("서울"))
        .select(
            "posting_no",
            "title",
            "region",
            "salary",
            F.when(F.col("title").contains("개발자"), F.lit(0))
            .otherwise(F.lit(1))
            .cast("int")
            .alias("match_level"),
            F.substring("title", 1, 10).alias("snippet"),
            F.length("title").cast("int").alias("n_title_chars"),
            F.size(F.split("title", " ")).cast("int").alias("n_tokens"),
        )
    )


def _case_mod(col: F.Column, mod: int, values: list[str]) -> F.Column:
    """CASE col % mod WHEN i THEN values[i] — deterministic Korean
    fixture synthesis shared by query and (re-derived) oracle."""
    expr = F.when(col % mod == 0, F.lit(values[0]))
    for i in range(1, len(values) - 1):
        expr = expr.when(col % mod == i, F.lit(values[i]))
    return expr.otherwise(F.lit(values[-1]))

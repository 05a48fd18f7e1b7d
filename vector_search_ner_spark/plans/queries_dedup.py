"""Deduplication queries (SURVEY §2.4 + the training-data dedup family
the north star calls out as first-class: exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding-cosine near-dup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_search_ner_spark.functions.vector import duck_cosine
from vector_search_ner_spark.operators import neardup as nd
from vector_search_ner_spark.operators.dedup import dedup_first_wins, duplicate_report
from vector_search_ner_spark.registry import query
from vector_search_ner_spark.sources.catalog import load_table

_FP = "CAST('0x' || substring(md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))), 1, 15) AS BIGINT)"

JACCARD_T = 0.5
COSINE_T = 0.4
SIMHASH_MAX_HAMMING = 3


@query(
    "dedup_first_wins",
    oracle="""
SELECT doc_id, source, n_chars FROM (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn = 1
""",
)
def dedup_first_wins_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered first-wins distinct-on — the reference's
    `deduplicate_by_id` (/root/reference/main.py:173-181): keep the
    FIRST row per key in arrival order. Arrival order here is the
    data-derived doc_id (SURVEY §7(a): never monotonically_increasing_id)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup_first_wins(docs, ["source"], "doc_id").select("doc_id", "source", "n_chars")


@query(
    "duplicate_report_sources",
    oracle="""
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_rows
FROM documents GROUP BY source HAVING COUNT(*) > 1
""",
)
def duplicate_report_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-index duplicate-key DQ scan
    (/root/reference/build_vectorstore.py:260-270)."""
    return duplicate_report(load_table(spark, sf_dir, "documents"), "source")


@query(
    "dedup_exact_text",
    oracle=f"""
WITH ingested AS (
  SELECT * FROM documents UNION ALL SELECT * FROM documents
)
SELECT {_FP} AS fp,
       CAST(MIN(doc_id) AS BIGINT) AS keeper_id,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM ingested GROUP BY fp
""",
)
def dedup_exact_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup over a simulated double-ingest (the corpus
    itself is all-distinct): hash-groupBy on the normalized-text
    fingerprint, min-id survivor. One shuffle on the 60-bit fp."""
    docs = load_table(spark, sf_dir, "documents")
    return nd.exact_dedup(docs.unionByName(docs))


def _duck_minhash_pairs(threshold: float) -> str:
    sig_cols = ",\n       ".join(
        f"{nd.duck_minhash_sig(j, 'hs')} AS mh{j}" for j in range(nd.N_PERM)
    )
    band_selects = "\nUNION ALL\n".join(
        f"SELECT sid, hs, {bi} AS band, {nd.duck_band_key(bi)} AS key FROM sigs"
        for bi in range(nd.N_BANDS)
    )
    return f"""
WITH t AS (
  SELECT doc_id AS sid, {nd.duck_token_hashes60()} AS th FROM documents
), sh AS (
  SELECT sid, {nd.duck_gram_hashes60("th")} AS hs FROM t
), sigs AS (
  SELECT sid, hs,
       {sig_cols}
  FROM sh
), bands AS (
{band_selects}
), cand AS (
  SELECT DISTINCT a.sid AS doc_a, b.sid AS doc_b, a.hs AS sa, b.hs AS sb
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.sid < b.sid
)
SELECT doc_a, doc_b,
       ROUND(len(list_intersect(sa, sb))
             / CAST(len(sa) + len(sb) - len(list_intersect(sa, sb)) AS DOUBLE), 4) AS jaccard
FROM cand
WHERE ROUND(len(list_intersect(sa, sb))
            / CAST(len(sa) + len(sb) - len(list_intersect(sa, sb)) AS DOUBLE), 4) >= {threshold}
"""


@query("dedup_minhash_lsh", oracle=_duck_minhash_pairs(JACCARD_T))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup PAIR AUDIT: map-only 16-perm signatures,
    4-band bucket join for candidates, exact Jaccard >= 0.5 verify.
    Pair emission is the EXPLICIT OPT-IN of `minhash_lsh_dedup`
    (output is O(n²) on an n-doc dup clique); the default cluster
    path is `dedup_clusters_lsh`."""
    docs = load_table(spark, sf_dir, "documents")
    return nd.minhash_lsh_dedup(docs, JACCARD_T, emit="pairs")


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH t AS (
  SELECT doc_id AS sid, {nd.duck_token_hashes60()} AS th FROM documents
), sh AS (
  SELECT sid, {nd.duck_gram_hashes60("th")} AS hs FROM t
), exploded AS (
  SELECT sid, unnest(hs) AS sh FROM sh
), hot AS (
  SELECT sh FROM exploded GROUP BY sh HAVING COUNT(*) > {nd.DEFAULT_SHINGLE_DF_CAP}
), capped AS (
  SELECT e.sid, e.sh FROM exploded e ANTI JOIN hot h ON e.sh = h.sh
), cand AS (
  SELECT DISTINCT a.sid AS doc_a, b.sid AS doc_b
  FROM capped a JOIN capped b ON a.sh = b.sh AND a.sid < b.sid
), v AS (
  SELECT c.doc_a, c.doc_b,
         len(list_intersect(sa.hs, sb.hs)) AS common,
         len(sa.hs) AS na, len(sb.hs) AS nb
  FROM cand c
  JOIN sh sa ON sa.sid = c.doc_a
  JOIN sh sb ON sb.sid = c.doc_b
)
SELECT doc_a, doc_b,
       ROUND(common / CAST(na + nb - common AS DOUBLE), 4) AS jaccard
FROM v
WHERE ROUND(common / CAST(na + nb - common AS DOUBLE), 4) >= {JACCARD_T}
""",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-6-gram Jaccard pairs: hot-shingle-capped candidate
    self-join (df_cap=64 — the operator's scale default), exact verify
    over full shingle sets. The oracle mirrors the cap EXACTLY
    (candidates from capped shingles, Jaccard from full sets), so the
    engine/oracle contract holds even on a corpus where boilerplate
    shingles exceed the cap."""
    docs = load_table(spark, sf_dir, "documents")
    return nd.jaccard_pairs(docs, JACCARD_T)


@query(
    "dedup_simhash",
    oracle=f"""
WITH fps AS (
  SELECT doc_id AS sid, {nd.duck_simhash()} AS fp FROM documents
), bands AS (
  SELECT sid, fp, b.band AS band, (fp >> (8 * b.band)) & 255 AS key
  FROM fps, (SELECT unnest(generate_series(0, {nd.SIMHASH_BAND_BYTES - 1})) AS band) b
), cand AS (
  SELECT DISTINCT a.sid AS doc_a, b.sid AS doc_b, a.fp AS fa, b.fp AS fb
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.sid < b.sid
)
SELECT doc_a, doc_b, CAST(bit_count(xor(fa, fb)) AS INTEGER) AS hamming
FROM cand WHERE bit_count(xor(fa, fb)) <= {SIMHASH_MAX_HAMMING}
""",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 32-bit TF-weighted fingerprints (map-
    only), byte-band candidate join, hamming <= 3 verify (pigeonhole:
    full recall for distance < 4 over 4 bands)."""
    docs = load_table(spark, sf_dir, "documents")
    return nd.simhash_pairs(docs, SIMHASH_MAX_HAMMING)


def _duck_ivf_knob_ctes(
    corpus_where: str = "", occupancy: int | None = None
) -> str:
    """The corpus-adaptive IVF knob, as SQL CTEs — the bit-exact twin
    of nd.adaptive_ncent / nd.adaptive_nprobe over the same (optionally
    filtered) embeddings corpus. Integer tier breaks (4^3, 5^3), no
    float cbrt, so the two engines cannot disagree at a boundary."""
    occ = nd.IVF_TARGET_CELL_OCC if occupancy is None else occupancy
    and_where = f" AND ({corpus_where})" if corpus_where else ""
    return f"""knob0 AS (
  SELECT GREATEST({nd.IVF_NCENT_MIN}, LEAST({nd.IVF_NCENT_MAX},
           CAST(CEIL(COUNT(*) / {occ}.0) AS BIGINT))) AS ncent
  FROM embeddings WHERE TRUE{and_where}
), knob AS (
  SELECT ncent,
         LEAST({nd.IVF_NPROBE_MAX}, {nd.IVF_NPROBE_BASE}
               + (CASE WHEN ncent > 64 THEN 1 ELSE 0 END)
               + (CASE WHEN ncent > 125 THEN 1 ELSE 0 END)) AS np
  FROM knob0
)"""


def _duck_ivf_neardup_oracle() -> str:
    """Oracle for the PRODUCTION cosine near-dup tier: the adaptive
    knob CTEs (ncent/nprobe computed FROM the corpus, same formula as
    the Spark side), the shared Lloyd CTEs (bit-exact twin of
    ann.lloyd_build), nprobe-deep multi-assignment, distinct
    same-cluster candidate pairs, exact cosine on candidates only."""
    from vector_search_ner_spark.plans.queries_mlops import (
        _LLOYD_ITER,
        _LLOYD_SQD,
        _duck_lloyd_ctes,
    )

    sqd = _LLOYD_SQD.format(a="d.v", b="c.centroid")
    return (
        _duck_lloyd_ctes(
            n_clusters="(SELECT ncent FROM knob)", pre=_duck_ivf_knob_ctes()
        )
        + f""", dists AS (
  SELECT d.doc_id AS sid, c.cluster_id,
         row_number() OVER (PARTITION BY d.doc_id
                            ORDER BY {sqd}, c.cluster_id) AS rk
  FROM docs d CROSS JOIN c{_LLOYD_ITER} c
), asg AS MATERIALIZED (
  SELECT sid, cluster_id FROM dists WHERE rk <= (SELECT np FROM knob)
), cand AS MATERIALIZED (
  SELECT DISTINCT a.sid AS doc_a, b.sid AS doc_b
  FROM asg a JOIN asg b ON a.cluster_id = b.cluster_id AND a.sid < b.sid
), wb AS (
  SELECT vec_id AS sid, embedding AS v FROM embeddings
)
SELECT c.doc_a, c.doc_b, ROUND({duck_cosine("x.v", "y.v")}, 4) AS cosine
FROM cand c JOIN wb x ON c.doc_a = x.sid JOIN wb y ON c.doc_b = y.sid
WHERE ROUND({duck_cosine("x.v", "y.v")}, 4) >= {COSINE_T}
"""
    )


@query("dedup_embedding_cosine", oracle=_duck_ivf_neardup_oracle())
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup, PRODUCTION tier — Lloyd/IVF
    learned-bucket candidates at the CORPUS-ADAPTIVE knob (round 12;
    the round-11 promotion shipped a fixed ncent=64 that its own x10
    probe convicted as a quadratic trap): ncent = ceil(N/{occ})
    clamped (constant mean cell occupancy -> linear candidate mass),
    nprobe = the capped ceil-cbrt tier of ncent, each vector
    multi-assigned to its nprobe nearest cells (Lv-style both-sides
    probing), then exact cosine >= {t} on DISTINCT same-cluster pairs
    only. Measured: sf0.01 (N=500 -> 63 cells, nprobe 4) recall
    0.9153 of exact all-pairs truth @ 28.4% of all-pairs — the exact
    r11 promotion figures; sf0.1 (N=2000 -> 250 cells, nprobe 6)
    recall 0.8359 @ 15.6% — the fixed knob's 0.766 decay erased at
    HALF the candidate fraction. The oracle computes the identical
    knob in SQL (see _duck_ivf_knob_ctes), so parity holds at every
    scale factor. `dedup_cosine_ivf_eval` grades the shipping config's
    full nprobe curve; `dedup_cosine_knob_recommend` emits the tuned
    knob for the observed corpus.""".format(
        occ=nd.IVF_TARGET_CELL_OCC, t=COSINE_T
    )
    emb = load_table(spark, sf_dir, "embeddings")
    return nd.ivf_cosine_neardup_pairs(emb, COSINE_T)


_SPAN_K = 8


def _duck_repeated_spans() -> str:
    return f"""
WITH t AS (
  SELECT doc_id, {nd.duck_token_hashes60()} AS th FROM documents
), sh AS (
  SELECT doc_id, {nd.duck_gram_hashes60("th", _SPAN_K)} AS hs FROM t
), ex AS (
  SELECT doc_id, unnest(hs) AS s FROM sh
), dfc AS (
  SELECT s FROM ex GROUP BY s HAVING COUNT(*) >= 2
), shared AS (
  SELECT e.doc_id, COUNT(*) AS n_shared
  FROM ex e JOIN dfc d ON e.s = d.s GROUP BY e.doc_id
)
SELECT sh.doc_id,
       CAST(len(sh.hs) AS INTEGER) AS n_spans,
       CAST(COALESCE(shared.n_shared, 0) AS INTEGER) AS n_shared,
       ROUND(COALESCE(shared.n_shared, 0) / CAST(len(sh.hs) AS DOUBLE), 4)
         AS shared_frac
FROM sh LEFT JOIN shared ON sh.doc_id = shared.doc_id
"""


@query("repeated_span_audit", oracle=_duck_repeated_spans())
def repeated_span_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document REPEATED-SPAN audit — the ExactSubstr signal
    (Lee et al., "Deduplicating Training Data Makes Language Models
    Better", ACL 2022): document-level dedup misses the boilerplate
    case where a 50-token span (header, license block, template) is
    repeated across MILLIONS of otherwise-distinct pages. Per doc:
    its distinct word-8-gram span count, how many of those spans occur
    in at least one OTHER place in the corpus (document frequency >= 2
    over distinct per-doc spans), and the shared fraction — the
    span-level contamination score a pretraining filter thresholds on.

    Scale shape: span hashes are the map-only two-lane 60-bit
    Rabin-Karp grams (no span strings ever materialize); the corpus
    crosses the wire twice, both as slim (hash, doc) longs — one hash
    agg keyed by span (map-side combining count), one semi join back +
    per-doc agg. No pairwise joins at all, so a span shared by a
    million docs costs one count row, not 10^12 pairs — this is the
    audit that scales where pair emission cannot."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        F.col("doc_id"), nd.token_hashes60(F.col("text")).alias("__th")
    ).select("doc_id", nd.gram_hashes60(F.col("__th"), _SPAN_K).alias("hs")).localCheckpoint()
    ex = sh.select("doc_id", F.explode("hs").alias("s"))
    shared_spans = (
        ex.groupBy("s").agg(F.count(F.lit(1)).alias("df")).where(F.col("df") >= 2)
    )
    n_shared = (
        ex.join(shared_spans.select("s"), "s", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        sh.select("doc_id", F.size("hs").alias("n_spans"))
        .join(n_shared, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_spans").cast("int"),
            F.coalesce(F.col("n_shared"), F.lit(0)).cast("int").alias("n_shared"),
            F.round(
                F.coalesce(F.col("n_shared"), F.lit(0)) / F.col("n_spans").cast("double"), 4
            ).alias("shared_frac"),
        )
    )


def _duck_span_positions() -> str:
    return f"""
WITH {_duck_span_positions_core()}
SELECT e.doc_id, e.pos
FROM ex e JOIN dfc d ON e.s = d.s
"""


def _duck_span_positions_core() -> str:
    """The shared CTE chain (t, w, ex, dfc) re-deriving every
    positional span hash closed-form — used by the cut-list oracle and
    the cut-APPLY oracle."""
    from vector_search_ner_spark.operators.neardup import (
        GRAM_M1,
        GRAM_M2,
        GRAM_P1,
        GRAM_P2,
        _LANE_SHIFT,
        _gram_pows,
    )

    pow1 = _gram_pows(GRAM_M1, GRAM_P1, _SPAN_K)
    pow2 = _gram_pows(GRAM_M2, GRAM_P2, _SPAN_K)

    def closed(pows: list[int], p: int) -> str:
        terms = " + ".join(
            f"((th[i + {j}] % {p}) * {pows[j]}) % {p}" for j in range(_SPAN_K)
        )
        return f"(({terms}) % {p})"

    gram = f"{closed(pow1, GRAM_P1)} * {_LANE_SHIFT} + {closed(pow2, GRAM_P2)}"
    return f"""t AS (
  SELECT doc_id, {nd.duck_token_hashes60()} AS th FROM documents
), w AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(th) - {_SPAN_K - 1}),
                        i -> {gram}) AS ws
  FROM t WHERE len(th) >= {_SPAN_K}
), ex AS (
  SELECT doc_id, CAST(i AS INTEGER) AS pos, ws[i] AS s
  FROM w, LATERAL unnest(generate_series(1, len(ws))) AS u(i)
), dfc AS (
  SELECT s FROM (SELECT DISTINCT doc_id, s FROM ex) GROUP BY s
  HAVING COUNT(*) >= 2
)"""


@query("repeated_span_positions", oracle=_duck_span_positions())
def repeated_span_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ACTION half of the repeated-span audit: the per-document
    CUT LIST — every 1-based token position starting a word-8-gram
    span that also occurs in at least one OTHER document (cross-doc
    document frequency >= 2 over distinct per-doc spans). This is the
    mask an ExactSubstr-style span dedup actually applies before
    training (keep one occurrence corpus-wide, cut the rest —
    `repeated_span_cut_apply` performs exactly that). Positions
    force ORDER-PRESERVING gram hashing — the positional two-lane
    Rabin-Karp fold, not the distinct set the audit uses — and the
    oracle re-derives every (doc, pos, hash) closed-form, so the
    position arithmetic is value-checked, not just the span sets.
    Scale shape: same as the audit — slim (hash, doc, pos) longs, one
    map-side-combining distinct-df agg, one equi join; nothing
    pairwise."""
    return _span_position_frame(spark, sf_dir).select("doc_id", "pos")


def _span_position_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pos, s) for every positional word-8-gram span whose
    cross-document frequency >= 2 — shared by the cut-list query
    (drops s) and the cut-APPLY query (ranks on s for keep-one)."""
    docs = load_table(spark, sf_dir, "documents")
    from vector_search_ner_spark.operators.neardup import (
        GRAM_M1,
        GRAM_M2,
        GRAM_P1,
        GRAM_P2,
        _LANE_SHIFT,
    )

    def lane(sub, m, p):
        return F.aggregate(
            sub, F.lit(0).cast("long"), lambda acc, h: (acc * m + (h % p)) % p
        )

    d = docs.select(
        "doc_id", nd.token_hashes60(F.col("text")).alias("th")
    ).where(F.size("th") >= _SPAN_K)
    gram = lambda i: (
        lane(F.slice(F.col("th"), i, _SPAN_K), GRAM_M1, GRAM_P1) * _LANE_SHIFT
        + lane(F.slice(F.col("th"), i, _SPAN_K), GRAM_M2, GRAM_P2)
    )
    w = d.withColumn(
        "ws",
        F.transform(
            F.sequence(F.lit(1), F.size("th") - (_SPAN_K - 1)), lambda i: gram(i)
        ),
    ).localCheckpoint()
    ex = w.select(
        "doc_id", F.posexplode("ws").alias("pos0", "s")
    ).select("doc_id", (F.col("pos0") + 1).cast("int").alias("pos"), "s")
    dfc = (
        ex.select("doc_id", "s")
        .distinct()
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= 2)
        .select("s")
    )
    return ex.join(dfc, "s").select("doc_id", "pos", "s")


def _duck_span_cut_apply() -> str:
    positions = _duck_span_positions_core()
    return f"""
WITH {positions},
spans AS (
  SELECT e.doc_id, e.pos, e.s FROM ex e JOIN dfc d ON e.s = d.s
), cuts AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos,
           row_number() OVER (PARTITION BY s ORDER BY doc_id, pos) AS rn
    FROM spans
  ) WHERE rn >= 2
), cut_tok AS (
  SELECT DISTINCT doc_id, pos + j AS tidx
  FROM cuts, LATERAL unnest(generate_series(0, {_SPAN_K - 1})) AS g(j)
), tk AS (
  SELECT doc_id, string_split(trim(text), ' ') AS tk FROM documents
), toks AS (
  SELECT doc_id, CAST(i AS INTEGER) AS tidx, tk[i] AS tok
  FROM tk, LATERAL unnest(generate_series(1, len(tk))) AS u(i)
), kept AS (
  SELECT t.doc_id, t.tidx, t.tok
  FROM toks t ANTI JOIN cut_tok c ON t.doc_id = c.doc_id AND t.tidx = c.tidx
), agg AS (
  SELECT doc_id,
         CAST(COUNT(*) AS INTEGER) AS n_kept,
         string_agg(tok, ' ' ORDER BY tidx) AS clean
  FROM kept GROUP BY doc_id
)
SELECT k.doc_id,
       CAST(len(k.tk) AS INTEGER) AS n_tokens,
       CAST(len(k.tk) - COALESCE(a.n_kept, 0) AS INTEGER) AS n_tokens_cut,
       CAST(length(COALESCE(a.clean, '')) AS INTEGER) AS clean_len,
       substring(md5(COALESCE(a.clean, '')), 1, 16) AS clean_fp
FROM tk k LEFT JOIN agg a ON k.doc_id = a.doc_id
"""


@query("repeated_span_cut_apply", oracle=_duck_span_cut_apply())
def repeated_span_cut_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr span dedup, APPLIED (Lee et al., ACL 2022 — the
    step after the audit and the cut list): every cross-document
    repeated word-8-gram span keeps exactly ONE occurrence corpus-wide
    (first by (doc_id, pos) — a deterministic rank over the span
    hash), every other occurrence's token range [pos, pos+7] is cut,
    overlapping cuts union naturally at the token level, and each
    document's surviving tokens reassemble IN ORDER into the scrubbed
    text. Output per doc: original token count, tokens cut, scrubbed
    length, and an md5 fingerprint of the full scrubbed text — the
    oracle re-derives the span hashes, the keep-one rank, the token
    surgery, and the reassembled string closed-form, so the whole
    transformation is value-checked end to end.

    Scale shape: the span leg is the audit's (slim long rows, one
    map-side-combining distinct-df agg, one equi join, a rank
    partitioned by span hash); the apply leg explodes tokens once
    (map-only), anti-joins the cut set on (doc_id, token_idx) — both
    sides slim — and rebuilds per-doc strings in a hash agg whose
    groups are single documents (collect bounded by doc length, never
    corpus-sized). Nothing pairwise, no windows over the corpus."""
    from pyspark.sql import Window

    spans = _span_position_frame(spark, sf_dir)
    w = Window.partitionBy("s").orderBy("doc_id", "pos")
    cuts = (
        spans.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") >= 2)
        .select("doc_id", F.explode(F.sequence(F.col("pos"), F.col("pos") + _SPAN_K - 1)).alias("tidx"))
        .distinct()
    )
    docs = load_table(spark, sf_dir, "documents")
    tk = docs.select("doc_id", F.split(F.trim(F.col("text")), " ").alias("tk"))
    toks = tk.select(
        "doc_id", F.posexplode("tk").alias("tidx0", "tok")
    ).select("doc_id", (F.col("tidx0") + 1).cast("int").alias("tidx"), "tok")
    kept = toks.join(cuts, ["doc_id", "tidx"], "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("tidx", "tok"))),
                lambda st: st["tok"],
            ),
            " ",
        ).alias("clean"),
    )
    return tk.join(agg, "doc_id", "left").select(
        "doc_id",
        F.size("tk").cast("int").alias("n_tokens"),
        (F.size("tk") - F.coalesce(F.col("n_kept"), F.lit(0))).cast("int").alias("n_tokens_cut"),
        F.length(F.coalesce(F.col("clean"), F.lit(""))).cast("int").alias("clean_len"),
        F.substring(F.md5(F.coalesce(F.col("clean"), F.lit(""))), 1, 16).alias("clean_fp"),
    )


_EVAL_N = 500  # ground-truth sample bound: all-pairs exact Jaccard on <=500 docs is ~125k slim intersects — affordable for an EVAL, never for production dedup


def _duck_lsh_eval() -> str:
    return f"""
WITH t AS (
  SELECT doc_id AS sid, {nd.duck_token_hashes60()} AS th
  FROM documents WHERE doc_id < {_EVAL_N}
), sh AS (
  SELECT sid, {nd.duck_gram_hashes60("th")} AS hs FROM t
), truth AS (
  SELECT a.sid AS doc_a, b.sid AS doc_b
  FROM sh a JOIN sh b ON a.sid < b.sid
  WHERE ROUND(len(list_intersect(a.hs, b.hs))
        / CAST(len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)) AS DOUBLE), 4)
        >= {JACCARD_T}
), sigs AS (
  SELECT sid, {", ".join(f"{nd.duck_minhash_sig(j, 'hs')} AS mh{j}" for j in range(nd.N_PERM))}
  FROM sh
), bands AS (
{" UNION ALL ".join(f"SELECT sid, {bi} AS band, {nd.duck_band_key(bi)} AS key FROM sigs" for bi in range(nd.N_BANDS))}
), cand AS (
  SELECT DISTINCT a.sid AS doc_a, b.sid AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.sid < b.sid
)
SELECT
  CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_truth,
  CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_candidates,
  CAST((SELECT COUNT(*) FROM truth x JOIN cand c
        ON x.doc_a = c.doc_a AND x.doc_b = c.doc_b) AS BIGINT) AS n_found,
  ROUND((SELECT COUNT(*) FROM truth x JOIN cand c
         ON x.doc_a = c.doc_a AND x.doc_b = c.doc_b)
        / GREATEST(1.0, CAST((SELECT COUNT(*) FROM truth) AS DOUBLE)), 4) AS recall,
  ROUND((SELECT COUNT(*) FROM truth x JOIN cand c
         ON x.doc_a = c.doc_a AND x.doc_b = c.doc_b)
        / GREATEST(1.0, CAST((SELECT COUNT(*) FROM cand) AS DOUBLE)), 4) AS precision
"""


@query("dedup_lsh_eval_report", oracle=_duck_lsh_eval())
def dedup_lsh_eval_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding QUALITY report — the eval you run before trusting
    band/perm parameters on a new corpus: on a bounded ground-truth
    sample ({_EVAL_N} docs — all-pairs exact Jaccard is affordable
    there and ONLY there), compare the MinHash band candidates against
    the true Jaccard >= {JACCARD_T} pair set and report candidate
    recall and precision. Like `ann_recall_report`, the eval itself is
    deterministic end to end, so it carries a FULL oracle rather than
    a recall-floor property test. The sample's pairwise join keeps the
    small side broadcast (no corpus cross-join — the registry-wide
    plan guard enforces that); production banding stays bucketed."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < _EVAL_N)
    sh = nd.shingle_frame(docs).localCheckpoint()
    a, b = sh.alias("a"), sh.alias("b")
    common = F.size(F.array_intersect(F.col("a.hs"), F.col("b.hs")))
    jac = F.round(
        common / (F.size("a.hs") + F.size("b.hs") - common), 4
    )
    truth = (
        a.join(F.broadcast(b), F.col("a.sid") < F.col("b.sid"))
        .where(jac >= JACCARD_T)
        .select(F.col("a.sid").alias("doc_a"), F.col("b.sid").alias("doc_b"))
        .localCheckpoint()
    )
    # the eval grades RAW band candidates (pre-verify): the public
    # pairs path already Jaccard-verifies, which would make precision
    # trivially 1.0 — so the band join is rebuilt here unverified,
    # over the SAME canonical banding (nd.minhash_band_frame)
    bands = nd.minhash_band_frame(sh)
    ba, bb = bands.alias("x"), bands.alias("y")
    cand = (
        ba.join(
            bb,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col("x.sid") < F.col("y.sid")),
        )
        .select(F.col("x.sid").alias("doc_a"), F.col("y.sid").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
        .localCheckpoint()
    )
    found = truth.join(cand, ["doc_a", "doc_b"], "inner")
    n_truth = truth.agg(F.count(F.lit(1)).alias("v"))
    n_cand = cand.agg(F.count(F.lit(1)).alias("v"))
    n_found = found.agg(F.count(F.lit(1)).alias("v"))
    return (
        n_truth.select(F.col("v").alias("n_truth"))
        .crossJoin(n_cand.select(F.col("v").alias("n_candidates")))
        .crossJoin(n_found.select(F.col("v").alias("n_found")))
        .select(
            "n_truth",
            "n_candidates",
            "n_found",
            F.round(
                F.col("n_found") / F.greatest(F.lit(1.0), F.col("n_truth").cast("double")), 4
            ).alias("recall"),
            F.round(
                F.col("n_found") / F.greatest(F.lit(1.0), F.col("n_candidates").cast("double")), 4
            ).alias("precision"),
        )
    )


def _duck_cc_clusters() -> str:
    """Transitive-closure oracle: cluster = min reachable node over the
    undirected minhash near-dup graph (recursive CTE)."""
    edges_sql = _duck_minhash_pairs(JACCARD_T)
    return f"""
WITH RECURSIVE edges AS ({edges_sql}),
sym AS (
  SELECT doc_a AS a, doc_b AS b FROM edges
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM edges
),
nodes AS (SELECT DISTINCT a AS node FROM sym),
reach(node, anc) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT r.node, s.b FROM reach r JOIN sym s ON r.anc = s.a
)
SELECT node AS doc_id, MIN(anc) AS cluster_id FROM reach GROUP BY node
"""


@query("dedup_clusters_cc", oracle=_duck_cc_clusters())
def dedup_clusters_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate CLUSTERS: connected components over the MinHash
    near-dup pair graph — the SCALE formulation: alternating
    large-star/small-star contraction (Kiveris et al., SoCC 2014),
    O(log diameter) driver-gated rounds on chains vs the diameter
    rounds min-label propagation needs (round-count bound pinned in
    tests/test_semantics.py on a path graph). Oracle = recursive-CTE
    transitive closure. This is the engine's iterative-algorithm
    surface: driver-gated loop, localCheckpoint lineage cuts, two
    hash aggs + two equi-joins per round."""
    from vector_search_ner_spark.operators.dedup import connected_components_star

    docs = load_table(spark, sf_dir, "documents")
    edges = nd.minhash_lsh_pairs(docs, JACCARD_T).select("doc_a", "doc_b")
    return connected_components_star(edges).select(
        F.col("node").alias("doc_id"), "cluster_id"
    )


@query(
    "fuzzy_match_levenshtein",
    oracle="""
WITH titles AS (
  SELECT doc_id, substring(text, 1, 30) AS title,
         substring(text, 1, 10) AS block
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.title, b.title) AS INTEGER) AS edit_dist
FROM titles a JOIN titles b
  ON a.block = b.block AND a.doc_id < b.doc_id
WHERE levenshtein(a.title, b.title) <= 5
""",
)
def fuzzy_match_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy record matching: blocking (10-char prefix) + edit-distance
    verify — the classic entity-resolution shape. The block key bounds
    the self-join fan-out exactly like LSH bands bound the minhash
    join; levenshtein is JVM-side codegen (no UDF)."""
    docs = load_table(spark, sf_dir, "documents")
    titles = docs.select(
        "doc_id",
        F.substring("text", 1, 30).alias("title"),
        F.substring("text", 1, 10).alias("block"),
    )
    a = titles.alias("a")
    b = titles.alias("b")
    dist = F.levenshtein(F.col("a.title"), F.col("b.title"))
    return (
        a.join(b, (F.col("a.block") == F.col("b.block")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .where(dist <= 5)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            dist.cast("int").alias("edit_dist"),
        )
    )


@query(
    "contamination_check",
    oracle=f"""
WITH t AS (
  SELECT doc_id AS sid, source, {nd.duck_token_hashes60()} AS th FROM documents
), sh AS (
  SELECT sid, source, {nd.duck_gram_hashes60("th")} AS hs FROM t
), exploded AS (
  SELECT sid, source, unnest(hs) AS sh FROM sh
), hot AS (
  SELECT sh FROM exploded WHERE source <> 'src0'
  GROUP BY sh HAVING COUNT(*) > {nd.DEFAULT_SHINGLE_DF_CAP}
), t_capped AS (
  SELECT e.sid, e.sh FROM exploded e ANTI JOIN hot h ON e.sh = h.sh
  WHERE e.source <> 'src0'
), cand AS (
  SELECT DISTINCT b.sid AS bench_id, t.sid AS train_id
  FROM t_capped t JOIN exploded b ON b.sh = t.sh AND b.source = 'src0'
), scored AS (
  SELECT c.bench_id, c.train_id,
         ROUND(len(list_intersect(sb.hs, st.hs))
               / CAST(len(sb.hs) + len(st.hs)
                      - len(list_intersect(sb.hs, st.hs)) AS DOUBLE),
               4) AS overlap
  FROM cand c
  JOIN sh sb ON sb.sid = c.bench_id
  JOIN sh st ON st.sid = c.train_id
)
SELECT bench_id, train_id, overlap FROM (
  SELECT *, row_number() OVER (PARTITION BY bench_id ORDER BY overlap DESC, train_id) AS rn
  FROM scored
) WHERE rn = 1
ORDER BY bench_id
""",
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination audit (source src0 plays the eval set,
    every other source the training corpus): per bench doc, the train
    doc with maximum word-6-gram Jaccard overlap. THE pre-training
    hygiene op the reference's pipeline lacks entirely. The oracle
    mirrors the operator's train-side hot-shingle cap (df_cap=64) so
    the contract holds under boilerplate-heavy corpora."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("source") == "src0")
    train = docs.where(F.col("source") != "src0")
    return nd.contamination_best_match(bench, train)


# -- benchmark contamination, the SEMANTIC leg --------------------------------
# n-gram contamination (contamination_check / the flagship's rung)
# misses paraphrased or translated eval leakage that shares no word
# 6-grams; modern decontamination practice adds an embedding-space
# sweep: a train doc whose vector sits too close to ANY benchmark
# vector is flagged regardless of surface form.

_SEMCON_T = 0.4  # flag threshold (the corpus's near-dup cosine bar)


@query(
    "contamination_semantic",
    oracle=f"""
WITH d AS (
  SELECT doc_id, source FROM documents
), b AS MATERIALIZED (
  SELECT e.vec_id AS bench_id, e.embedding AS v
  FROM embeddings e JOIN d ON e.vec_id = d.doc_id WHERE d.source = 'src0'
), t AS MATERIALIZED (
  SELECT e.vec_id AS train_id, e.embedding AS v
  FROM embeddings e JOIN d ON e.vec_id = d.doc_id WHERE d.source <> 'src0'
), p AS MATERIALIZED (
  SELECT t.train_id, b.bench_id,
         ROUND({duck_cosine("t.v", "b.v")}, 4) AS cosine
  FROM t, b
), flagged AS (
  SELECT train_id, bench_id, cosine FROM p WHERE cosine >= {_SEMCON_T}
), mx AS (
  SELECT train_id, MAX(cosine) AS mc FROM flagged GROUP BY train_id
)
SELECT f.train_id, CAST(MIN(f.bench_id) AS BIGINT) AS bench_id,
       m.mc AS cosine
FROM flagged f JOIN mx m ON f.train_id = m.train_id AND f.cosine = m.mc
GROUP BY f.train_id, m.mc
ORDER BY f.train_id
""",
)
def contamination_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC benchmark-contamination audit — the embedding-space
    twin of `contamination_check`: flag every training document whose
    vector reaches cosine >= {t} against ANY benchmark (src0) vector,
    reporting the best-matching bench doc (ties by max cosine, then
    min bench_id — deterministic in both engines via the max-then-min
    two-step, no argmax struct-ordering edge cases). This is the leg
    that catches PARAPHRASED or TRANSLATED eval leakage sharing no
    word n-grams, which the Jaccard rung cannot see.

    Scale shape (100 TB): eval sets are small by nature — the bench
    vector frame BROADCASTS and the training corpus is scanned ONCE,
    map-only, with a map-side-combining per-train-doc aggregation;
    the corpus never shuffles. (On a corpus whose eval suite is also
    huge, the sign-LSH / IVF candidate generators in this module
    bound the pair mass instead — the same prefilter ladder the
    near-dup family grades.) Reference: no contamination hygiene at
    all (SURVEY §2 north-star scope).""".format(t=_SEMCON_T)
    t, b = semcon_sides(spark, sf_dir)
    return semcon_flags(t, b).orderBy("train_id")


def semcon_sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """The (train, bench) vector frames the semantic-contamination
    sweep runs over — shared by the batch query and its streamed twin
    (stream_contamination_semantic feeds the SAME train frame through
    micro-batches against the SAME static bench side)."""
    from vector_search_ner_spark.functions.vector import l2_norm

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    emb = load_table(spark, sf_dir, "embeddings")
    b = (
        emb.join(docs.where(F.col("source") == "src0"), emb.vec_id == docs.doc_id)
        .select(
            F.col("vec_id").alias("bench_id"),
            F.col("embedding").alias("bv"),
            l2_norm(F.col("embedding")).alias("bnrm"),
        )
    )
    t = (
        emb.join(docs.where(F.col("source") != "src0"), emb.vec_id == docs.doc_id)
        .select(
            F.col("vec_id").alias("train_id"),
            F.col("embedding").alias("tv"),
            l2_norm(F.col("embedding")).alias("tnrm"),
        )
    )
    return t, b


def semcon_flags(t: DataFrame, b: DataFrame) -> DataFrame:
    """The sweep itself: broadcast the bench side, exact cosine, keep
    >= _SEMCON_T, best bench per train doc (max cosine, ties to min
    bench_id via the deterministic max-then-min two-step). Because a
    train doc appears EXACTLY ONCE in its frame, running this per
    micro-batch and unioning equals running it once over the union —
    the property that lets the streamed twin share the batch oracle
    verbatim."""
    from vector_search_ner_spark.operators import veckernel as vk

    denom = F.col("tnrm") * F.col("bnrm")
    cos = F.when(denom == 0.0, F.lit(0.0)).otherwise(
        vk.pair_dot(F.col("tv"), F.col("bv")) / denom
    )
    flagged = (
        t.crossJoin(F.broadcast(b))
        .select("train_id", "bench_id", F.round(cos, 4).alias("cosine"))
        .where(F.col("cosine") >= _SEMCON_T)
    )
    mx = flagged.groupBy("train_id").agg(F.max("cosine").alias("mc"))
    return (
        flagged.join(mx, "train_id")
        .where(F.col("cosine") == F.col("mc"))
        .groupBy("train_id", "mc")
        .agg(F.min("bench_id").cast("long").alias("bench_id"))
        .select("train_id", "bench_id", F.col("mc").alias("cosine"))
    )


def _duck_lsh_cluster_ctes(src: str = "documents") -> str:
    """Recursive-CTE prefix shared by the LSH-cluster oracles: same
    band-key derivation as the minhash oracle, star edges to each
    bucket's min sid, min-reachable-node closure, final `labels`
    (doc_id, cluster_id). `src` names the (doc_id, text) relation to
    cluster — a prior CTE when composing (the e2e flagship clusters
    exact-dedup survivors, not raw documents)."""
    sig_cols = ",\n       ".join(
        f"{nd.duck_minhash_sig(j, 'hs')} AS mh{j}" for j in range(nd.N_PERM)
    )
    band_selects = "\nUNION ALL\n".join(
        f"SELECT sid, {bi} AS band, {nd.duck_band_key(bi)} AS key FROM sigs"
        for bi in range(nd.N_BANDS)
    )
    return f"""
WITH RECURSIVE t AS (
  SELECT doc_id AS sid, {nd.duck_token_hashes60()} AS th FROM {src}
), sh AS (
  SELECT sid, {nd.duck_gram_hashes60("th")} AS hs FROM t
), sigs AS (
  SELECT sid, hs,
       {sig_cols}
  FROM sh
), bands AS (
{band_selects}
), hubs AS (
  SELECT band, key, MIN(sid) AS hub FROM bands GROUP BY band, key
), sym AS (
  SELECT DISTINCT b.sid AS a, h.hub AS b
  FROM bands b JOIN hubs h ON b.band = h.band AND b.key = h.key
  UNION
  SELECT DISTINCT h.hub AS a, b.sid AS b
  FROM bands b JOIN hubs h ON b.band = h.band AND b.key = h.key
), nodes AS (SELECT DISTINCT sid AS node FROM bands),
reach(node, anc) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT r.node, s.b FROM reach r JOIN sym s ON r.anc = s.a
), labels AS (
  SELECT CAST(node AS BIGINT) AS doc_id, CAST(MIN(anc) AS BIGINT) AS cluster_id
  FROM reach GROUP BY node
)"""


def _duck_lsh_clusters() -> str:
    return _duck_lsh_cluster_ctes() + "\nSELECT doc_id, cluster_id FROM labels\n"


@query("dedup_clusters_lsh", oracle=_duck_lsh_clusters())
def dedup_clusters_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-emitting LSH dedup: MinHash band buckets -> star edges
    to each bucket's min-sid hub -> connected components. Every doc
    gets a cluster label (singletons label themselves), and a
    full-duplicate clique of n docs moves O(n * bands) edges through
    the labeler instead of the O(n^2) pairs of the all-pairs bucket
    join — the shape that survives a corpus where a boilerplate doc
    is ingested a million times. Candidate-level semantics by design
    (bucket co-membership, no Jaccard verify): the cluster is the
    REVIEW unit; pairwise-verified clustering stays available as
    dedup_clusters_cc. Oracle = recursive-CTE transitive closure over
    the same star edges. This IS `minhash_lsh_dedup`'s default path."""
    docs = load_table(spark, sf_dir, "documents")
    return nd.minhash_lsh_dedup(docs)


def _duck_keep_best() -> str:
    return (
        _duck_lsh_cluster_ctes()
        + """
, ranked AS (
  SELECT l.cluster_id, l.doc_id, d.n_chars,
         row_number() OVER (PARTITION BY l.cluster_id
                            ORDER BY d.n_chars DESC, l.doc_id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY l.cluster_id) AS n_members
  FROM labels l JOIN documents d ON l.doc_id = d.doc_id
)
SELECT cluster_id, doc_id AS kept_doc_id,
       CAST(n_members AS BIGINT) AS n_members,
       CAST(n_members - 1 AS BIGINT) AS n_dropped
FROM ranked WHERE rn = 1
ORDER BY cluster_id
"""
    )


@query("dedup_keep_best", oracle=_duck_keep_best())
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-dedup OUTPUT stage: LSH clusters -> keep ONE
    canonical doc per cluster by an explicit policy (longest text,
    doc_id tie-break) and report what was dropped. The canonical pick
    is a single hash aggregation with MAX over a (n_chars, -doc_id)
    struct — map-side partial combine, no window over the full corpus,
    so a million-member boilerplate clique reduces on the mappers
    instead of sorting in one reducer. This is what you actually run
    before training: first-wins (`dedup_first_wins`) keeps the
    earliest; this keeps the BEST."""
    from vector_search_ner_spark.operators.dedup import connected_components

    docs = load_table(spark, sf_dir, "documents")
    labels = connected_components(nd.lsh_star_edges(docs))
    x = labels.join(
        docs.select(F.col("doc_id").alias("node"), "n_chars"), "node"
    )
    best = F.max(F.struct(F.col("n_chars"), (-F.col("node")).alias("neg_id")))
    return (
        x.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            best.alias("best"),
        )
        .select(
            F.col("cluster_id").cast("long"),
            (-F.col("best.neg_id")).cast("long").alias("kept_doc_id"),
            F.col("n_members"),
            (F.col("n_members") - 1).alias("n_dropped"),
        )
        .orderBy("cluster_id")
    )


def _duck_corpus_prep() -> str:
    from vector_search_ner_spark.plans.queries_text import (
        _BP_CAP,
        _duck_boilerplate,
        _duck_lang_id,
        _duck_quality,
    )

    nib = "strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 32, 1)) - 1"
    return (
        _duck_lsh_cluster_ctes()
        + f"""
, ranked AS (
  SELECT l.cluster_id, l.doc_id,
         row_number() OVER (PARTITION BY l.cluster_id
                            ORDER BY d.n_chars DESC, l.doc_id ASC) AS rn
  FROM labels l JOIN documents d ON l.doc_id = d.doc_id
), kept AS (
  SELECT doc_id FROM ranked WHERE rn = 1
), scored AS (
  SELECT d.doc_id, {_duck_quality()} AS quality, {_duck_lang_id()} AS lang_pred,
         {_duck_boilerplate()} AS bp
  FROM documents d JOIN kept k ON d.doc_id = k.doc_id
)
SELECT doc_id, quality, lang_pred,
       CASE WHEN {nib} < 12 THEN 'train'
            WHEN {nib} < 14 THEN 'val'
            ELSE 'test' END AS split
FROM scored
WHERE quality >= 0.5 AND lang_pred <> 'und' AND bp <= {_BP_CAP}
ORDER BY doc_id
"""
    )


@query("corpus_prep_pipeline", oracle=_duck_corpus_prep())
def corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data flagship, end to end as ONE lazy plan — what
    you actually run on a crawl before pretraining:

      ① near-dup CLUSTER (MinHash bands → star edges → connected
        components — O(n·bands) edges even on full-dup cliques);
      ② keep ONE canonical doc per cluster (longest, id tie-break —
        MAX-over-struct hash agg, map-side combine);
      ③ quality-score + language-ID + boilerplate-ratio the survivors
        (map-only exprs);
      ④ drop low-quality, unidentifiable-language, and boilerplate-
        heavy docs (the doc_language_quality_gate predicate);
      ⑤ assign the content-hash train/val/test split (row-stable under
        repartition/retry, unlike rand(seed)).

    Per-doc roster out (doc_id, quality, lang_pred, split), fully
    DuckDB-oracle-checked through the recursive-CTE closure. The only
    shuffles at scale: the slim band exchange, the CC label rounds
    (diameter-bounded), and one hash agg — scoring, filtering, and
    splitting are all width-one projections."""
    from vector_search_ner_spark.operators.dedup import connected_components
    from vector_search_ner_spark.operators.textstats import (
        LANG_MARKERS,
        boilerplate_ratio_tokens,
        lang_from_hits,
        marker_hits_tokens,
        quality_from_parts,
        word_tokens,
    )
    from vector_search_ner_spark.plans.queries_text import _BP_CAP

    docs = load_table(spark, sf_dir, "documents")
    labels = connected_components(nd.lsh_star_edges(docs))
    sized = labels.join(
        docs.select(F.col("doc_id").alias("node"), "n_chars"), "node"
    )
    kept = (
        sized.groupBy("cluster_id")
        .agg(F.max(F.struct(F.col("n_chars"), (-F.col("node")).alias("neg_id"))).alias("b"))
        .select((-F.col("b.neg_id")).cast("long").alias("doc_id"))
    )
    # tokenize once, stage each marker count once, score from the
    # staged attributes (interpreted higher-order exprs, no CSE —
    # same discipline as the gate query)
    scored = (
        docs.join(kept, "doc_id")
        .select("doc_id", "text", word_tokens(F.col("text")).alias("__w"))
        .select(
            "doc_id",
            "text",
            "__w",
            marker_hits_tokens(F.col("__w"), LANG_MARKERS["code"]).alias("__code"),
            marker_hits_tokens(F.col("__w"), LANG_MARKERS["data"]).alias("__data"),
            marker_hits_tokens(F.col("__w"), LANG_MARKERS["en"]).alias("__en"),
        )
        .select(
            "doc_id",
            quality_from_parts(
                F.col("text"), F.size("__w").cast("long"), F.col("__en")
            ).alias("quality"),
            lang_from_hits(F.col("__code"), F.col("__data"), F.col("__en")).alias(
                "lang_pred"
            ),
            boilerplate_ratio_tokens("__w").alias("bp"),
        )
    )
    nibble = F.instr(
        F.lit("0123456789abcdef"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 32, 1),
    ) - 1
    return (
        scored.where(
            (F.col("quality") >= 0.5)
            & (F.col("lang_pred") != "und")
            & (F.col("bp") <= _BP_CAP)
        )
        .select(
            "doc_id",
            "quality",
            "lang_pred",
            F.when(nibble < 12, "train").when(nibble < 14, "val").otherwise("test").alias("split"),
        )
        .orderBy("doc_id")
    )


def _duck_cluster_split() -> str:
    nib = (
        "strpos('0123456789abcdef', "
        "substring(md5('split:' || CAST(cluster_id AS VARCHAR)), 32, 1)) - 1"
    )
    return (
        _duck_lsh_cluster_ctes()
        + f"""
SELECT doc_id, cluster_id,
       CASE WHEN {nib} < 12 THEN 'train'
            WHEN {nib} < 14 THEN 'val'
            ELSE 'test' END AS split
FROM labels
"""
    )


@query("dataset_split_leakage_safe", oracle=_duck_cluster_split())
def dataset_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-SAFE train/val/test split: the split key is the
    near-dup CLUSTER id, not the document id, so every member of a
    duplicate clique lands in the same split — a doc-level hash split
    (`dataset_split_assign`) puts near-copies of eval documents into
    the training set, the classic contamination channel that
    `contamination_check` detects after the fact and this prevents by
    construction. Same content-hash nibble assignment (12/14/16
    thresholds), salted so the cluster split is independent of the
    doc-level one; clusters come from the O(n·bands) star-edge
    labeler. The split column is retry/repartition-stable like every
    hash split here."""
    from vector_search_ner_spark.operators.dedup import connected_components

    docs = load_table(spark, sf_dir, "documents")
    labels = connected_components(nd.lsh_star_edges(docs)).select(
        F.col("node").cast("long").alias("doc_id"),
        F.col("cluster_id").cast("long"),
    )
    nib = F.instr(
        F.lit("0123456789abcdef"),
        F.substring(
            F.md5(F.concat(F.lit("split:"), F.col("cluster_id").cast("string"))), 32, 1
        ),
    ) - 1
    return labels.select(
        "doc_id",
        "cluster_id",
        F.when(nib < 12, "train").when(nib < 14, "val").otherwise("test").alias("split"),
    )


_SNM_WINDOW = 8


@query(
    "dedup_sorted_neighborhood",
    oracle=f"""
WITH t AS (
  SELECT doc_id AS sid, {nd.duck_token_hashes60()} AS th FROM documents
), sh AS (
  SELECT sid, {nd.duck_gram_hashes60("th")} AS hs FROM t
), k2 AS (
  SELECT sid, hs,
         list_sort(hs)[1] AS h1,
         COALESCE(list_sort(hs)[2], list_sort(hs)[1]) AS h2
  FROM sh
), r AS (
  SELECT sid, hs, row_number() OVER (ORDER BY h1, h2, sid) AS rank
  FROM k2
), cand AS (
  SELECT a.sid AS sid_a, b.sid AS sid_b,
         CAST(b.rank - a.rank AS INTEGER) AS gap, a.hs AS ta, b.hs AS tb
  FROM r a JOIN r b
    ON b.rank > a.rank AND b.rank <= a.rank + {_SNM_WINDOW - 1}
), v AS (
  SELECT sid_a, sid_b, gap,
         len(list_intersect(ta, tb)) AS common, len(ta) AS na, len(tb) AS nb
  FROM cand
)
SELECT LEAST(sid_a, sid_b) AS doc_a, GREATEST(sid_a, sid_b) AS doc_b, gap,
       ROUND(common / CAST(na + nb - common AS DOUBLE), 4) AS jaccard
FROM v
WHERE ROUND(common / CAST(na + nb - common AS DOUBLE), 4) >= {JACCARD_T}
""",
)
def dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood dedup (merge/purge): the SORT-based
    candidate generator — one global range sort by a 2-minimum minhash
    over the word-6-gram shingle hashes, compare only records within 8
    sort positions, exact shingle-set Jaccard verify (the IDENTICAL
    measure `dedup_ngram_jaccard` uses, so the two candidate
    generators are directly comparable on recall —
    tests/test_semantics.py::test_snm_recall_vs_exact_pairs pins the
    floor). O(n*window) candidates by construction, independent of
    duplicate-clique shape and of banding parameters; the fourth
    candidate-generation strategy next to LSH / SimHash / n-gram
    (operators/neardup.py:sorted_neighborhood_pairs)."""
    docs = load_table(spark, sf_dir, "documents")
    return nd.sorted_neighborhood_pairs(docs, JACCARD_T, window=_SNM_WINDOW)


_INC_MOD, _INC_REM = 10, 5


def _duck_incremental_index() -> str:
    """Oracle re-derives both sides from first principles: the same
    split, the same 16-perm minhash + 4-band candidate generation, the
    same exact-Jaccard verify and best-match argmax the operator runs
    against the PERSISTED index (the store's contents are derived with
    the identical exprs, so re-deriving them here checks the store's
    freshness contract too)."""
    sig_cols = ",\n       ".join(
        f"{nd.duck_minhash_sig(j, 'hs')} AS mh{j}" for j in range(nd.N_PERM)
    )
    band_selects = "\nUNION ALL\n".join(
        f"SELECT sid, {bi} AS band, {nd.duck_band_key(bi)} AS key FROM sigs"
        for bi in range(nd.N_BANDS)
    )
    return f"""
WITH t AS (
  SELECT doc_id AS sid, {nd.duck_token_hashes60()} AS th FROM documents
), sh AS MATERIALIZED (
  SELECT sid, {nd.duck_gram_hashes60("th")} AS hs FROM t
), sigs AS (
  SELECT sid, hs,
       {sig_cols}
  FROM sh
), bands AS MATERIALIZED (
{band_selects}
), cand AS (
  SELECT DISTINCT n.sid AS new_id, o.sid AS dup_of
  FROM bands n JOIN bands o ON n.band = o.band AND n.key = o.key
  WHERE n.sid % {_INC_MOD} = {_INC_REM} AND o.sid % {_INC_MOD} <> {_INC_REM}
), v AS (
  SELECT c.new_id, c.dup_of,
         len(list_intersect(sn.hs, so.hs)) AS common,
         len(sn.hs) AS nn, len(so.hs) AS no
  FROM cand c
  JOIN sh sn ON sn.sid = c.new_id
  JOIN sh so ON so.sid = c.dup_of
)
SELECT new_id, dup_of, jaccard FROM (
  SELECT new_id, dup_of,
         ROUND(common / CAST(nn + no - common AS DOUBLE), 4) AS jaccard,
         row_number() OVER (
           PARTITION BY new_id
           ORDER BY ROUND(common / CAST(nn + no - common AS DOUBLE), 4) DESC,
                    dup_of) AS rn
  FROM v
  WHERE ROUND(common / CAST(nn + no - common AS DOUBLE), 4) >= {JACCARD_T}
) WHERE rn = 1
ORDER BY new_id
"""


@query("dedup_incremental_vs_index", oracle=_duck_incremental_index())
def dedup_incremental_vs_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL dedup — a new shard (doc_id % 10 == 5, the held-out
    10%) deduplicated against the PERSISTED shingle/minhash index of
    the existing corpus (sources/neardup_index.py, the build-once
    store pattern of sources/vecstore.py; the reference analogue is
    the v2 store's upsert-into-existing-collection ingest,
    build_vectorstore.py:233-250). Per new doc, the best-matching
    indexed doc with exact word-6-gram Jaccard >= 0.5.

    This is `contamination_check`'s semantics at `dedup`'s scale
    contract: O(new shard) compute — the shard's band keys broadcast
    into a probe of the index's posting table, candidate verify reads
    only the candidates' stored shingle sets, and the existing corpus
    is never re-tokenized (plan-asserted: the index side appears as
    parquet scans of the store artifacts). The daily-ingest shape at
    100 TB: index maintenance is an O(delta) append of the new shard's
    rows after this audit passes."""
    from vector_search_ner_spark.sources.neardup_index import shingle_index_store

    bands, shingles = shingle_index_store(spark, sf_dir, _INC_MOD, _INC_REM)
    shard = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % _INC_MOD == _INC_REM
    )
    return nd.incremental_lsh_dedup(shard, bands, shingles, JACCARD_T)


def _compact_oracle() -> str:
    # the compacted full-corpus index must equal the batch derivation
    # from the raw corpus — the SAME contract (and the same oracle) as
    # the streamed base∪delta merge in stream_index_ingest
    from vector_search_ner_spark.plans.queries_streaming import _index_ingest_oracle

    return _index_ingest_oracle()


@query("dedup_index_compact", oracle=_compact_oracle())
def dedup_index_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPACTION of the persisted shingle/minhash dedup index — the
    third op of the index lifecycle (build → streamed delta appends →
    compact): fold the base generation plus accumulated batch_id=N
    delta generations into ONE fresh full-corpus generation, so
    consumers scan a single compacted relation instead of base + N
    deltas (at daily-ingest cadence the delta count — and the probe's
    scan fan-in — grows without bound until someone compacts).

    Write-then-swap like the store build: the compacted generation is
    written in full, and only after its bands _SUCCESS marker lands
    are older compacted generations retired — a crash mid-compaction
    leaves the previous state intact and re-runs recover. The returned
    frame is the canonical content summary (index_summary_frame) READ
    BACK from the compacted artifacts, and the oracle re-derives the
    identical summary from the raw corpus, so compaction is certified
    content-preserving bit-for-bit: a lost delta, a doubled append, or
    any merge drift flips a checksum. O(index) sequential I/O, zero
    shuffle beyond the summary's own aggregate."""
    import os
    import shutil

    from vector_search_ner_spark.session import cut_lineage
    from vector_search_ner_spark.sources.neardup_index import (
        ARTIFACT_DIR,
        NEARDUP_INDEX_VERSION,
        _source_fingerprint,
        index_summary_frame,
        shingle_index_store,
    )

    # compacted generation keyed by source fingerprint AND the hashing
    # VERSION: a regenerated corpus or a shingle/minhash definition
    # bump must both retire stale compacted output (the base store's
    # _index_path folds the version in for exactly this reason)
    src = os.path.join(sf_dir, "documents.parquet")
    import hashlib

    gen = hashlib.md5(
        f"{src}:{_source_fingerprint(src)}:v{NEARDUP_INDEX_VERSION}:compact".encode()
    ).hexdigest()[:16]
    parent = os.path.join(
        ARTIFACT_DIR, "neardup_index_compacted", sf_dir.strip("/").replace("/", "_")
    )
    out = os.path.join(parent, gen)
    bands_path = os.path.join(out, "bands")
    shingles_path = os.path.join(out, "shingles")
    if not os.path.exists(os.path.join(bands_path, "_SUCCESS")):
        base_bands, base_shingles = shingle_index_store(spark, sf_dir, 10, 5)
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        shard = docs.where(F.col("doc_id") % 10 == 5)

        # the accumulated delta generations (two batch_id dirs, the
        # same layout the streaming append writes — produced batch-wise
        # here so the query is self-contained). Built only when the
        # compaction itself runs: on the _SUCCESS-gated idempotent
        # path, rebuilding deltas would be dead work the merged read
        # never consumes.
        # keyed by the corpus/version generation (ADVICE r8): two
        # interleaved invocations on DIFFERENT corpora (parallel
        # test/bench processes) must not cross-contaminate each
        # other's staged deltas behind the shared _SUCCESS gate.
        delta = os.path.join(ARTIFACT_DIR, "index_compact_delta", gen)
        shutil.rmtree(delta, ignore_errors=True)
        mid = shard.agg(F.expr("percentile(doc_id, 0.5)").alias("m")).collect()[0].m
        # fail loudly on a degenerate empty shard (ADVICE r8): with
        # mid=None both filters below are null-valued and would
        # silently stage EMPTY deltas — on a non-empty corpus that
        # masks missing data instead of surfacing it.
        assert mid is not None, f"compaction shard slice of {src} is empty"
        for batch_id, part in enumerate(
            (shard.where(F.col("doc_id") <= mid), shard.where(F.col("doc_id") > mid))
        ):
            sh = cut_lineage(nd.shingle_frame(part))
            sh.write.mode("overwrite").parquet(
                os.path.join(delta, "shingles", f"batch_id={batch_id}")
            )
            nd.minhash_band_frame(sh).write.mode("overwrite").parquet(
                os.path.join(delta, "bands", f"batch_id={batch_id}")
            )

        merged_sh = base_shingles.unionByName(
            spark.read.parquet(os.path.join(delta, "shingles")).drop("batch_id")
        )
        merged_bands = base_bands.unionByName(
            spark.read.parquet(os.path.join(delta, "bands")).drop("batch_id")
        )
        merged_sh.write.mode("overwrite").parquet(shingles_path)
        # at cluster scale: repartition("key") / bucketing here, so the
        # compacted posting table keeps the co-located-probe layout
        merged_bands.write.mode("overwrite").parquet(bands_path)
        if os.path.exists(os.path.join(bands_path, "_SUCCESS")):
            for old in os.listdir(parent):
                if old != gen:
                    shutil.rmtree(os.path.join(parent, old), ignore_errors=True)

    cb = spark.read.parquet(bands_path)
    cs = spark.read.parquet(shingles_path)
    return index_summary_frame(cb, cs)


def _duck_simhash_eval() -> str:
    return f"""
WITH t AS (
  SELECT doc_id AS sid, {nd.duck_token_hashes60()} AS th
  FROM documents WHERE doc_id < {_EVAL_N}
), sh AS (
  SELECT sid, {nd.duck_gram_hashes60("th")} AS hs FROM t
), truth AS (
  SELECT a.sid AS doc_a, b.sid AS doc_b
  FROM sh a JOIN sh b ON a.sid < b.sid
  WHERE ROUND(len(list_intersect(a.hs, b.hs))
        / CAST(len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)) AS DOUBLE), 4)
        >= {JACCARD_T}
), fps AS (
  SELECT doc_id AS sid, {nd.duck_simhash()} AS fp
  FROM documents WHERE doc_id < {_EVAL_N}
), bands AS (
  SELECT sid, fp, b.band AS band, (fp >> (8 * b.band)) & 255 AS key
  FROM fps, (SELECT unnest(generate_series(0, {nd.SIMHASH_BAND_BYTES - 1})) AS band) b
), accepted AS (
  SELECT DISTINCT a.sid AS doc_a, b.sid AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.sid < b.sid
  WHERE bit_count(xor(a.fp, b.fp)) <= {SIMHASH_MAX_HAMMING}
)
SELECT
  CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_truth,
  CAST((SELECT COUNT(*) FROM accepted) AS BIGINT) AS n_accepted,
  CAST((SELECT COUNT(*) FROM truth x JOIN accepted c
        ON x.doc_a = c.doc_a AND x.doc_b = c.doc_b) AS BIGINT) AS n_found,
  ROUND((SELECT COUNT(*) FROM truth x JOIN accepted c
         ON x.doc_a = c.doc_a AND x.doc_b = c.doc_b)
        / GREATEST(1.0, CAST((SELECT COUNT(*) FROM truth) AS DOUBLE)), 4) AS recall,
  ROUND((SELECT COUNT(*) FROM truth x JOIN accepted c
         ON x.doc_a = c.doc_a AND x.doc_b = c.doc_b)
        / GREATEST(1.0, CAST((SELECT COUNT(*) FROM accepted) AS DOUBLE)), 4) AS precision
"""


@query("dedup_simhash_eval_report", oracle=_duck_simhash_eval())
def dedup_simhash_eval_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash QUALITY report — completes the eval symmetry of the
    near-dup family (`dedup_lsh_eval_report` grades MinHash banding;
    this grades the 32-bit fingerprint + hamming <= 3 proxy) against
    the SAME exact-Jaccard ground truth on the same bounded sample:
    how well does bit-level fingerprint distance approximate set
    similarity on this corpus? MinHash's candidates approximate
    Jaccard directly; SimHash approximates the TF-weighted cosine of
    token profiles, so its precision/recall against Jaccard truth is
    the honest cross-metric number a dedup team needs before choosing
    the cheaper fingerprint. Both legs deterministic -> full oracle.
    The sample pairwise join broadcasts (eval-only, never production
    shape); production SimHash stays byte-band bucketed."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < _EVAL_N)
    sh = nd.shingle_frame(docs).localCheckpoint()
    a, b = sh.alias("a"), sh.alias("b")
    common = F.size(F.array_intersect(F.col("a.hs"), F.col("b.hs")))
    jac = F.round(common / (F.size("a.hs") + F.size("b.hs") - common), 4)
    truth = (
        a.join(F.broadcast(b), F.col("a.sid") < F.col("b.sid"))
        .where(jac >= JACCARD_T)
        .select(F.col("a.sid").alias("doc_a"), F.col("b.sid").alias("doc_b"))
        .localCheckpoint()
    )
    accepted = (
        nd.simhash_pairs(docs, SIMHASH_MAX_HAMMING)
        .select("doc_a", "doc_b")
        .localCheckpoint()
    )
    found = truth.join(accepted, ["doc_a", "doc_b"], "inner")
    n_truth = truth.agg(F.count(F.lit(1)).alias("v"))
    n_acc = accepted.agg(F.count(F.lit(1)).alias("v"))
    n_found = found.agg(F.count(F.lit(1)).alias("v"))
    return (
        n_truth.select(F.col("v").alias("n_truth"))
        .crossJoin(n_acc.select(F.col("v").alias("n_accepted")))
        .crossJoin(n_found.select(F.col("v").alias("n_found")))
        .select(
            "n_truth",
            "n_accepted",
            "n_found",
            F.round(
                F.col("n_found")
                / F.greatest(F.lit(1.0), F.col("n_truth").cast("double")),
                4,
            ).alias("recall"),
            F.round(
                F.col("n_found")
                / F.greatest(F.lit(1.0), F.col("n_accepted").cast("double")),
                4,
            ).alias("precision"),
        )
    )


_COS_EVAL_N = 400  # all-pairs exact cosine affordable on <=400 vectors


_COS_EVAL_MAX_DEPTH = 2  # deepest probe tier in MULTIPROBE_MASKS


def _duck_cosine_eval() -> str:
    return f"""
WITH wb AS (
  SELECT vec_id AS sid, embedding AS v,
         {nd.duck_sign_lsh_bucket()} AS bucket
  FROM embeddings WHERE vec_id < {_COS_EVAL_N}
), pairs AS (
  SELECT CAST(bit_count(xor(a.bucket, b.bucket)) AS INTEGER) AS ham,
         (ROUND({duck_cosine("a.v", "b.v")}, 4) >= {COSINE_T}) AS is_true
  FROM wb a JOIN wb b ON a.sid < b.sid
), d AS (
  SELECT unnest(generate_series(0, {_COS_EVAL_MAX_DEPTH})) AS probe_depth
)
SELECT CAST(d.probe_depth AS INTEGER) AS probe_depth,
  CAST(SUM(CASE WHEN p.is_true THEN 1 ELSE 0 END) AS BIGINT) AS n_truth,
  CAST(SUM(CASE WHEN p.ham <= d.probe_depth THEN 1 ELSE 0 END) AS BIGINT)
    AS n_candidates,
  CAST(SUM(CASE WHEN p.is_true AND p.ham <= d.probe_depth THEN 1 ELSE 0 END)
       AS BIGINT) AS n_found,
  ROUND(SUM(CASE WHEN p.is_true AND p.ham <= d.probe_depth THEN 1 ELSE 0 END)
        / GREATEST(1.0, CAST(SUM(CASE WHEN p.is_true THEN 1 ELSE 0 END)
                             AS DOUBLE)), 4) AS recall,
  ROUND(SUM(CASE WHEN p.is_true AND p.ham <= d.probe_depth THEN 1 ELSE 0 END)
        / GREATEST(1.0, CAST(SUM(CASE WHEN p.ham <= d.probe_depth
                                      THEN 1 ELSE 0 END) AS DOUBLE)), 4)
    AS precision
FROM pairs p CROSS JOIN d
GROUP BY d.probe_depth
"""


@query("dedup_cosine_eval_report", oracle=_duck_cosine_eval())
def dedup_cosine_eval_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucket QUALITY report — the third leg of the near-dup
    eval symmetry (MinHash banding: `dedup_lsh_eval_report`; SimHash
    fingerprints: `dedup_simhash_eval_report`; this grades the
    16-bucket MULTI-PROBE sign-LSH prefilter `dedup_embedding_cosine`
    relies on), emitted as the full RECALL-vs-CANDIDATES CURVE: one
    row per probe depth (0 = exact bucket only, 1 = + the 4 flip-1
    neighbors, 2 = + the 6 flip-2 neighbors — the production tier).
    On a bounded sample where all-pairs exact cosine is affordable, a
    pair is a depth-d candidate iff the Hamming distance between its
    bucket ids is <= d — EXACTLY the pairs the mask-probing join
    emits, so the curve grades the production operator, not a proxy.
    Measured at sf0.01: recall 0.125 / 0.60 / >=0.8 for ~0.06 / 0.31
    / 0.69 of all pairs as candidates — the honest statement that a
    4-plane sketch at cosine>=0.4 buys high recall only at a large
    candidate fraction. Both legs deterministic -> full oracle; the
    sample pairwise join broadcasts (eval-only shape)."""
    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("vec_id") < _COS_EVAL_N
    )
    from vector_search_ner_spark.functions.vector import l2_norm
    from vector_search_ner_spark.operators import veckernel as vk

    wb = emb.select(
        F.col("vec_id").alias("sid"),
        F.col("embedding").alias("v"),
        vk.sign_bucket(F.col("embedding"), nd.HYPERPLANES).alias("bucket"),
        l2_norm(F.col("embedding")).alias("nrm"),
    ).localCheckpoint()
    a, b = wb.alias("a"), wb.alias("b")
    denom = F.col("a.nrm") * F.col("b.nrm")
    cos = F.when(denom == 0.0, F.lit(0.0)).otherwise(
        vk.pair_dot(F.col("a.v"), F.col("b.v")) / denom
    )
    pairs = (
        a.join(F.broadcast(b), F.col("a.sid") < F.col("b.sid"))
        .select(
            F.bit_count(F.col("a.bucket").bitwiseXOR(F.col("b.bucket")))
            .cast("int")
            .alias("ham"),
            (F.round(cos, 4) >= COSINE_T).alias("is_true"),
        )
    )
    depths = spark.range(_COS_EVAL_MAX_DEPTH + 1).select(
        F.col("id").cast("int").alias("probe_depth")
    )
    t = F.col("is_true").cast("long")
    c = (F.col("ham") <= F.col("probe_depth")).cast("long")
    return (
        pairs.crossJoin(F.broadcast(depths))
        .groupBy("probe_depth")
        .agg(
            F.sum(t).alias("n_truth"),
            F.sum(c).alias("n_candidates"),
            F.sum(t * c).alias("n_found"),
            F.round(
                F.sum(t * c) / F.greatest(F.lit(1.0), F.sum(t).cast("double")), 4
            ).alias("recall"),
            F.round(
                F.sum(t * c) / F.greatest(F.lit(1.0), F.sum(c).cast("double")), 4
            ).alias("precision"),
        )
    )


# -- IVF-bucketed cosine near-dup: the production-scale candidate tier --------
# The sign-LSH probe-depth curve is honest about its ceiling: 4
# hyperplanes at cosine>=0.4 buy recall 0.875 only at 0.68 of
# all-pairs. The scale path is LEARNED buckets: Lloyd/IVF clusters
# adapt to the corpus geometry, so same-cluster candidates carry far
# more of the true pair mass per candidate. This eval grades the
# SHIPPING ADAPTIVE CONFIG (adaptive_ncent over the bounded eval
# corpus, nprobe tiers up to the adaptive shipping depth — all-pairs
# truth on 500 vectors is 124,750 exact cosines, still affordable)
# with the identical harness as the sketch's curve: truth = exact
# all-pairs cosine, candidates = pairs sharing an assigned centroid,
# nprobe = how many nearest centroids each vector is multi-assigned
# to (Lv-style probing on the index side). The deepest row IS the
# config `dedup_embedding_cosine` derives for this corpus.
# eval-only truth bound: exact all-pairs cosine is O(n^2 * dim) — the
# full sf0.01 corpus (500 vecs, 124,750 pairs) fits under it, so the
# promotion numbers are full-corpus there; larger fixtures grade the
# first _IVF_EVAL_N vectors (sf0.1: 800 -> 319,600 exact cosines
# instead of 2M)
_IVF_EVAL_N = 800


def _duck_ivf_eval_parts() -> tuple[str, str]:
    """(ctes, curve_select) of the IVF eval oracle — shared by
    `dedup_cosine_ivf_eval` (emits the curve) and
    `dedup_cosine_knob_recommend` (wraps the curve in the tuning
    decision)."""
    from vector_search_ner_spark.plans.queries_mlops import (
        _LLOYD_ITER,
        _LLOYD_SQD,
        _duck_lloyd_ctes,
    )

    sqd = _LLOYD_SQD.format(a="d.v", b="c.centroid")
    where = f"vec_id < {_IVF_EVAL_N}"
    lloyd = _duck_lloyd_ctes(
        n_clusters="(SELECT ncent FROM knob)",
        corpus_where=where,
        pre=_duck_ivf_knob_ctes(corpus_where=where),
    )
    ctes = (
        lloyd
        + f""", dists AS (
  SELECT d.doc_id AS sid, c.cluster_id,
         row_number() OVER (PARTITION BY d.doc_id
                            ORDER BY {sqd}, c.cluster_id) AS rk
  FROM docs d CROSS JOIN c{_LLOYD_ITER} c
), asg AS MATERIALIZED (
  SELECT sid, cluster_id, rk FROM dists WHERE rk <= (SELECT np FROM knob)
), co AS MATERIALIZED (
  SELECT a.sid AS sa, b.sid AS sb,
         MIN(GREATEST(a.rk, b.rk)) AS mn
  FROM asg a JOIN asg b ON a.cluster_id = b.cluster_id AND a.sid < b.sid
  GROUP BY a.sid, b.sid
), wb AS MATERIALIZED (
  SELECT vec_id AS sid, embedding AS v FROM embeddings
  WHERE vec_id < {_IVF_EVAL_N}
), pairs AS MATERIALIZED (
  SELECT a.sid AS sa, b.sid AS sb,
         (ROUND({duck_cosine("a.v", "b.v")}, 4) >= {COSINE_T}) AS is_true
  FROM wb a JOIN wb b ON a.sid < b.sid
), j AS MATERIALIZED (
  SELECT p.is_true, co.mn
  FROM pairs p LEFT JOIN co ON p.sa = co.sa AND p.sb = co.sb
), probes AS (
  SELECT unnest(generate_series(1, (SELECT np FROM knob))) AS nprobe
)"""
    )
    curve_select = f"""SELECT CAST(pr.nprobe AS INTEGER) AS nprobe,
  CAST(SUM(CASE WHEN j.is_true THEN 1 ELSE 0 END) AS BIGINT) AS n_truth,
  CAST(SUM(CASE WHEN j.mn <= pr.nprobe THEN 1 ELSE 0 END) AS BIGINT)
    AS n_candidates,
  CAST(SUM(CASE WHEN j.is_true AND j.mn <= pr.nprobe THEN 1 ELSE 0 END)
       AS BIGINT) AS n_found,
  ROUND(SUM(CASE WHEN j.is_true AND j.mn <= pr.nprobe THEN 1 ELSE 0 END)
        / GREATEST(1.0, CAST(SUM(CASE WHEN j.is_true THEN 1 ELSE 0 END)
                             AS DOUBLE)), 4) AS recall,
  ROUND(SUM(CASE WHEN j.is_true AND j.mn <= pr.nprobe THEN 1 ELSE 0 END)
        / GREATEST(1.0, CAST(SUM(CASE WHEN j.mn <= pr.nprobe
                                      THEN 1 ELSE 0 END) AS DOUBLE)), 4)
    AS precision
FROM j CROSS JOIN probes pr
GROUP BY pr.nprobe"""
    return ctes, curve_select


def _duck_cosine_ivf_eval() -> str:
    ctes, curve_select = _duck_ivf_eval_parts()
    return ctes + "\n" + curve_select + "\n"


def _ivf_eval_curve_frame(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, int, int, int]:
    """The per-nprobe IVF candidate-quality curve over the bounded
    eval corpus at the shipping adaptive knob. Returns (curve frame,
    n_eval, ncent, np_depth) — shared by `dedup_cosine_ivf_eval`
    (emits the curve) and `dedup_cosine_knob_recommend` (turns it
    into the tuning decision)."""
    from vector_search_ner_spark.functions.vector import (
        l2_norm,
        to_double_array,
    )
    from vector_search_ner_spark.operators import ann
    from vector_search_ner_spark.operators import veckernel as vk
    from vector_search_ner_spark.session import cut_lineage

    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("vec_id") < _IVF_EVAL_N
    )
    n_eval = emb.count()
    ncent = nd.adaptive_ncent(n_eval)
    np_depth = nd.adaptive_nprobe(ncent)
    _assigned, centroids = ann.lloyd_build(emb, ncent)
    docs = emb.select(
        F.col("vec_id").alias("sid"),
        to_double_array(F.col("embedding")).alias("dv"),
    )
    # Arrow-vectorized top-depth assignment (bit-identical; replaces
    # the crossJoin + interpreted fold + rank window — see veckernel)
    asg = cut_lineage(
        vk.assign_topm(docs, centroids, np_depth, "dv", ark_col="rk")
        .select("sid", "cluster_id", "rk")
    )
    a = asg.select(
        F.col("sid").alias("sa"), F.col("cluster_id").alias("cl"),
        F.col("rk").alias("rka"),
    )
    b = asg.select(
        F.col("sid").alias("sb"), F.col("cluster_id").alias("cl"),
        F.col("rk").alias("rkb"),
    )
    co = (
        a.join(b, ["cl"])
        .where(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.min(F.greatest("rka", "rkb")).alias("mn"))
    )
    wb = emb.select(
        F.col("vec_id").alias("sid"),
        F.col("embedding").alias("v"),
        l2_norm(F.col("embedding")).alias("nrm"),
    ).localCheckpoint()
    pa, pb = wb.alias("a"), wb.alias("b")
    denom = F.col("a.nrm") * F.col("b.nrm")
    cos = F.when(denom == 0.0, F.lit(0.0)).otherwise(
        vk.pair_dot(F.col("a.v"), F.col("b.v")) / denom
    )
    pairs = (
        pa.join(F.broadcast(pb), F.col("a.sid") < F.col("b.sid"))
        .select(
            F.col("a.sid").alias("sa"), F.col("b.sid").alias("sb"),
            (F.round(cos, 4) >= COSINE_T).alias("is_true"),
        )
    )
    j = pairs.join(co, ["sa", "sb"], "left")
    probes = spark.range(1, np_depth + 1).select(
        F.col("id").cast("int").alias("nprobe")
    )
    t = F.col("is_true").cast("long")
    c = (F.col("mn") <= F.col("nprobe")).cast("long")
    cz = F.coalesce(c, F.lit(0))
    curve = (
        j.crossJoin(F.broadcast(probes))
        .groupBy("nprobe")
        .agg(
            F.sum(t).alias("n_truth"),
            F.sum(cz).alias("n_candidates"),
            F.sum(t * cz).alias("n_found"),
            F.round(
                F.sum(t * cz) / F.greatest(F.lit(1.0), F.sum(t).cast("double")), 4
            ).alias("recall"),
            F.round(
                F.sum(t * cz) / F.greatest(F.lit(1.0), F.sum(cz).cast("double")), 4
            ).alias("precision"),
        )
    )
    return curve, n_eval, ncent, np_depth


@query("dedup_cosine_ivf_eval", oracle=_duck_cosine_ivf_eval())
def dedup_cosine_ivf_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed near-dup candidate QUALITY at the SHIPPING
    ADAPTIVE CONFIG — the learned-bucket counterpart of
    `dedup_cosine_eval_report`, same harness: Lloyd-cluster the
    (bounded) eval corpus into adaptive_ncent(n) cells — the exact
    knob `dedup_embedding_cosine` derives for this corpus — multi-
    assign each vector to its nprobe nearest centroids, and grade
    same-cluster pairs against exact all-pairs cosine >= COSINE_T.
    One row per nprobe tier up to the shipping depth
    (adaptive_nprobe(ncent) — that row IS what the production op
    runs); a pair's tier is the MINIMUM over shared centroids of the
    worse of the two assignment ranks (exactly the pairs an
    index-side nprobe probe emits). Measured at sf0.01 (ncent 63):
    recall 0.2712 / 0.6102 / 0.8475 / 0.9153 for 1.6 / 7.4 / 16.6 /
    28.4 % of all-pairs at nprobe 1-4 — vs the sketch's 0.875 at 68%;
    at sf0.1 (800-vec eval bound -> ncent 100, depth 5): 0.8773 at
    26.6% for the shipped tier.

    Scale shape: Lloyd is the persisted quantizer (built once);
    multi-assignment is one broadcast-centroid join + a per-vector
    top-nprobe; candidates shuffle on cluster_id only. All-pairs truth
    is EVAL-ONLY and bounded to the first _IVF_EVAL_N vectors — the
    full sf0.01 corpus fits under the bound (the promotion numbers are
    full-corpus there); a larger corpus grades the bounded sample, the
    standard recall-eval practice."""
    curve, _n, _nc, _np = _ivf_eval_curve_frame(spark, sf_dir)
    return curve


# the recall the knob must buy on the observed corpus — the contract
# `dedup_embedding_cosine`'s promotion pinned and the recommender
# grades the formula against
_KNOB_RECALL_TARGET = 0.8


def _duck_knob_recommend() -> str:
    ctes, curve_select = _duck_ivf_eval_parts()
    return (
        ctes
        + f""", curve AS (
{curve_select}
), shipped AS (
  SELECT * FROM curve WHERE nprobe = (SELECT np FROM knob)
)
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM docs) AS n_corpus,
  (SELECT CAST(ncent AS BIGINT) FROM knob) AS ncent,
  (SELECT CAST(np AS INTEGER) FROM knob) AS nprobe_shipped,
  CAST(COALESCE(
    (SELECT MIN(nprobe) FROM curve WHERE recall >= {_KNOB_RECALL_TARGET}),
    (SELECT np FROM knob)) AS INTEGER) AS nprobe_min,
  s.recall AS recall,
  s.n_candidates AS n_candidates,
  ROUND(s.n_candidates / GREATEST(1.0,
    (SELECT COUNT(*) FROM docs) * ((SELECT COUNT(*) FROM docs) - 1) / 2.0
  ), 4) AS cand_frac
FROM shipped s
"""
    )


@query("dedup_cosine_knob_recommend", oracle=_duck_knob_recommend())
def dedup_cosine_knob_recommend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The knob-pricing instrument AS A QUERY (r12): turn the measured
    IVF candidate-quality curve into the (ncent, nprobe)
    recommendation for the observed corpus at the recall target the
    promotion contract pinned ({tgt}). One row: the bounded-corpus
    size, the adaptive quantizer the formula derives for it, the
    SHIPPED probe depth, the MINIMUM depth on the measured curve that
    already reaches the target (the headroom signal — if it is below
    the shipped depth, the formula is spending candidates on margin;
    if it equals the shipped depth, the cap is binding), and the
    shipped tier's achieved recall / candidate count / candidate
    fraction. `dedup_embedding_cosine` consumes the same formula —
    the pinned equality test asserts the shipped knob equals
    adaptive_ncent/adaptive_nprobe of the observed corpus and that
    its measured recall clears the target.

    Scale shape: identical to `dedup_cosine_ivf_eval` (the curve is
    the expensive part, bounded by _IVF_EVAL_N); the decision tail is
    a 1-row aggregate over the <= IVF_NPROBE_MAX curve rows.""".format(
        tgt=_KNOB_RECALL_TARGET
    )
    curve, n_eval, ncent, np_depth = _ivf_eval_curve_frame(spark, sf_dir)
    allp = n_eval * (n_eval - 1) / 2.0
    agg = curve.agg(
        F.min(
            F.when(F.col("recall") >= _KNOB_RECALL_TARGET, F.col("nprobe"))
        ).alias("nm"),
        F.max(
            F.when(F.col("nprobe") == np_depth, F.col("recall"))
        ).alias("recall"),
        F.max(
            F.when(F.col("nprobe") == np_depth, F.col("n_candidates"))
        ).alias("n_candidates"),
    )
    return agg.select(
        F.lit(n_eval).cast("long").alias("n_corpus"),
        F.lit(ncent).cast("long").alias("ncent"),
        F.lit(np_depth).cast("int").alias("nprobe_shipped"),
        F.coalesce(F.col("nm"), F.lit(np_depth)).cast("int").alias("nprobe_min"),
        F.col("recall"),
        F.col("n_candidates"),
        F.round(
            F.col("n_candidates") / F.greatest(F.lit(1.0), F.lit(allp)), 4
        ).alias("cand_frac"),
    )


# -- incremental IVF cosine near-dup (batch/incremental shared generator) -----
# r12 (VERDICT r11 #2): the INCREMENTAL path shares the batch
# default's candidate generator — the persisted Lloyd quantizer
# (sources/semdedup_index.py) at the CORPUS-ADAPTIVE cell count —
# with the store MULTI-ASSIGNED index-side: members persist their
# top-m cell memberships, an arriving shard probes its top-m cells,
# candidates = shard x member rows sharing a cell. r11's
# single-assigned store capped recall at 0.786 no matter how deep
# the shard probed (nprobe 9-10 bought candidates, not recall);
# restoring the batch op's BOTH-SIDES scheme at a finer store
# quantizer (occupancy 6) measures 0.857 recall for 16.0% of
# shard x corpus pairs at sf0.01 — more recall at the SAME candidate
# mass, with the shard depth back from 8 to 3. The depth m is
# CORPUS-DERIVED (nd.adaptive_store_nprobe — integer isqrt tier
# ladder of 3N/(20*occ), clamped [2, 8]): a fixed m=3 reproduced the
# batch op's scale decay one tier down (sf0.1 recall 0.47), while
# the derived depth (sf0.01 -> 3, sf0.1 -> 6) measures >= 0.8 recall
# at <= 20% candidate mass at BOTH fixtures. Pinned in tests.


def _duck_store_depth_ladder() -> str:
    """The `+ (CASE WHEN x >= k*k ...)` terms of the store-depth
    isqrt tier ladder, one per candidate depth in
    (IVF_STORE_NPROBE_MIN, IVF_STORE_NPROBE_MAX]."""
    return "".join(
        f"\n         + (CASE WHEN x >= {k * k} THEN 1 ELSE 0 END)"
        for k in range(
            nd.IVF_STORE_NPROBE_MIN + 1, nd.IVF_STORE_NPROBE_MAX + 1
        )
    )


def _duck_cosine_incremental() -> str:
    from vector_search_ner_spark.plans.queries_mlops import (
        _LLOYD_ITER,
        _LLOYD_SQD,
        _duck_lloyd_ctes,
    )

    sqd_s = _LLOYD_SQD.format(a="s.v", b="c.centroid")
    sqd_m = _LLOYD_SQD.format(a="d.v", b="c.centroid")
    cf = f"c{_LLOYD_ITER}"
    corpus_where = "(vec_id % 10) <> 5"
    return (
        _duck_lloyd_ctes(
            n_clusters="(SELECT ncent FROM knob)",
            corpus_where=corpus_where,
            pre=_duck_ivf_knob_ctes(
                corpus_where=corpus_where, occupancy=nd.IVF_STORE_CELL_OCC
            ),
        )
        + f""",
sknob AS (
  -- corpus-derived symmetric probe depth: isqrt(3N/(20*occ)) as an
  -- integer tier ladder (m >= k iff x >= k*k), clamped
  -- [{nd.IVF_STORE_NPROBE_MIN}, {nd.IVF_STORE_NPROBE_MAX}] — the
  -- bit-exact twin of nd.adaptive_store_nprobe
  SELECT {nd.IVF_STORE_NPROBE_MIN}{_duck_store_depth_ladder()} AS mdepth
  FROM (SELECT ({nd.IVF_STORE_FRAC_NUM} * COUNT(*))
               // {nd.IVF_STORE_FRAC_DEN * nd.IVF_STORE_CELL_OCC} AS x
        FROM embeddings WHERE {corpus_where})
),
am AS MATERIALIZED (
  SELECT doc_id, v, cluster_id FROM (
    SELECT d.doc_id, d.v, c.cluster_id, row_number() OVER (
      PARTITION BY d.doc_id ORDER BY {sqd_m}, c.cluster_id) AS ark
    FROM docs d CROSS JOIN {cf} c
  ) WHERE ark <= (SELECT mdepth FROM sknob)
),
shard AS (
  SELECT vec_id AS doc_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE (vec_id % 10) = 5
), sa AS MATERIALIZED (
  SELECT doc_id, v, cluster_id FROM (
    SELECT s.doc_id, s.v, c.cluster_id, row_number() OVER (
      PARTITION BY s.doc_id ORDER BY {sqd_s}, c.cluster_id) AS rn
    FROM shard s CROSS JOIN {cf} c
  ) WHERE rn <= (SELECT mdepth FROM sknob)
)
SELECT shard_id, corpus_id, cosine FROM (
  SELECT DISTINCT s.doc_id AS shard_id, m.doc_id AS corpus_id,
         ROUND({duck_cosine("s.v", "m.v")}, 4) AS cosine
  FROM sa s JOIN am m ON s.cluster_id = m.cluster_id
) WHERE cosine >= {COSINE_T}
"""
    )


@query("dedup_cosine_incremental", oracle=_duck_cosine_incremental())
def dedup_cosine_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental embedding near-dup — a NEW shard (vec_id%10==5)
    against the PERSISTED corpus index, sharing the batch default's
    candidate generator (see the section comment): the stored Lloyd
    quantizer at the corpus-adaptive cell count (occupancy {occ},
    finer than the batch {bocc} — the index-side selectivity knob),
    members MULTI-ASSIGNED to their top-m cells in the store, the
    shard probing its top-m cells (the batch both-sides scheme), m
    CORPUS-DERIVED by nd.adaptive_store_nprobe (isqrt tier ladder of
    3N/(20*{occ}), clamped [{mn}, {mx}] — the SQL twin unrolls the
    same integer ladder), exact cosine >= {t} against ONLY the
    probed cells' member rows. Emits (shard_id, corpus_id, cosine) —
    the roster an ingest pipeline joins to decide keep/drop for
    arriving documents without re-clustering or re-scanning the
    corpus. Measured: sf0.01 (m=3) recall 0.857 of exact
    shard-vs-corpus truth @ 16.0%% of shard x corpus pairs (r11
    single-assigned store: 0.786 @ 16%% with the shard probing 8
    deep); sf0.1 (m=6) recall 0.806 @ 16.7%% (fixed m=3 decayed to
    0.47 — the scale decay erased by the derived depth).

    Scale shape: centroids broadcast; the member table is laid out
    partitionBy(cluster_id), so the probe reads only the shard's
    assigned cells (partition pruning by layout — same discipline as
    `dedup_semantic_incremental`); shard assignments broadcast into the
    member scan, the index never shuffles. The oracle re-derives the
    store from first principles (filtered-corpus Lloyd unroll with the
    same knob CTEs), so the persisted content is value-checked, not
    just the plumbing.""".format(
        occ=nd.IVF_STORE_CELL_OCC,
        bocc=nd.IVF_TARGET_CELL_OCC,
        mn=nd.IVF_STORE_NPROBE_MIN,
        mx=nd.IVF_STORE_NPROBE_MAX,
        t=COSINE_T,
    )
    from vector_search_ner_spark.functions.vector import to_double_array
    from vector_search_ner_spark.operators import veckernel as vk
    from vector_search_ner_spark.plans.queries_mlops import _LLOYD_ITER
    from vector_search_ner_spark.session import cut_lineage
    from vector_search_ner_spark.sources.semdedup_index import semantic_index_store

    emb = load_table(spark, sf_dir, "embeddings")
    n_corpus = emb.where(F.col("vec_id") % 10 != 5).count()
    ncent = nd.adaptive_ncent(n_corpus, occupancy=nd.IVF_STORE_CELL_OCC)
    mdepth = nd.adaptive_store_nprobe(n_corpus)
    members, centroids = semantic_index_store(
        spark, sf_dir, ncent, _LLOYD_ITER, 10, 5,
        store_nprobe=mdepth,
    )
    shard = emb.where(F.col("vec_id") % 10 == 5).select(
        F.col("vec_id").alias("shard_id"),
        to_double_array(F.col("embedding")).alias("sv"),
    )
    # Arrow-vectorized top-mdepth shard assignment + per-pair verify
    # cosine (bit-identical — veckernel contract). No lineage cut: the
    # assignment frame has exactly ONE consumer (the broadcast into the
    # member probe), so an eager checkpoint only added a driver-blocking
    # job before the real one
    sa = vk.assign_topm(shard, centroids, mdepth, "sv").select(
        "shard_id", "sv", "cluster_id"
    )
    probe = members.select(
        F.col("doc_id").alias("corpus_id"), F.col("v").alias("mv"), "cluster_id"
    ).join(F.broadcast(sa), "cluster_id")
    return (
        probe.withColumn(
            "cosine", F.round(vk.pair_cosine(F.col("sv"), F.col("mv")), 4)
        )
        .where(F.col("cosine") >= COSINE_T)
        .select("shard_id", "corpus_id", "cosine")
        .distinct()
    )


_MH_EVAL_T = 0.2  # report estimator accuracy on pairs above this exact Jaccard


def _duck_minhash_estimate() -> str:
    mh_cols = ", ".join(
        f"{nd.duck_minhash_sig(j, 'hs')} AS mh{j}" for j in range(nd.N_PERM)
    )
    agree = " + ".join(
        f"(CASE WHEN a.mh{j} = b.mh{j} THEN 1 ELSE 0 END)" for j in range(nd.N_PERM)
    )
    return f"""
WITH t AS (
  SELECT doc_id AS sid, {nd.duck_token_hashes60()} AS th
  FROM documents WHERE doc_id < {_EVAL_N}
), sh AS (
  SELECT sid, {nd.duck_gram_hashes60("th")} AS hs FROM t
), sigs AS (
  SELECT sid, hs, {mh_cols} FROM sh
), pairs AS (
  SELECT a.sid AS doc_a, b.sid AS doc_b,
         ROUND(len(list_intersect(a.hs, b.hs))
           / CAST(len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))
                  AS DOUBLE), 4) AS jac_exact,
         CAST({agree} AS INTEGER) AS n_agree
  FROM sigs a JOIN sigs b ON a.sid < b.sid
)
SELECT doc_a, doc_b, jac_exact, n_agree,
       ROUND(n_agree / {float(nd.N_PERM)}, 4) AS jac_est,
       ROUND(ABS(jac_exact - ROUND(n_agree / {float(nd.N_PERM)}, 4)), 4) AS abs_err
FROM pairs WHERE jac_exact >= {_MH_EVAL_T}
"""


@query("dedup_minhash_estimate_eval", oracle=_duck_minhash_estimate())
def dedup_minhash_estimate_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash ESTIMATOR accuracy — the fourth eval leg: the banding
    eval (`dedup_lsh_eval_report`) grades candidate generation; this
    grades the underlying estimator itself, per pair: signature
    agreement count over N_PERM=16 permutations vs exact Jaccard, on
    every bounded-sample pair above Jaccard 0.2. E[agreement/N] =
    J exactly (the MinHash identity), with binomial sd
    sqrt(J(1-J)/16) ~ 0.12 — the per-pair abs_err column is that
    spread, measured; the test pins the mean error under it. The
    16-perm signature is what the persisted index stores per doc, so
    this table is the precision contract of everything downstream.
    Deterministic (fixed permutation constants) -> full oracle."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < _EVAL_N)
    sh = nd.shingle_frame(docs)
    sigs = (
        sh.withColumn(
            "hashes", F.transform(F.col("hs"), lambda h: h % nd.MINHASH_P)
        )
        .select("sid", "hs", *nd.minhash_signature_cols(F.col("hashes")))
        .localCheckpoint()
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    common = F.size(F.array_intersect(F.col("a.hs"), F.col("b.hs")))
    jac = F.round(common / (F.size("a.hs") + F.size("b.hs") - common), 4)
    agree = sum(
        F.when(F.col(f"a.mh{j}") == F.col(f"b.mh{j}"), 1).otherwise(0)
        for j in range(nd.N_PERM)
    )
    est = F.round(F.col("n_agree") / float(nd.N_PERM), 4)
    return (
        a.join(F.broadcast(b), F.col("a.sid") < F.col("b.sid"))
        .select(
            F.col("a.sid").alias("doc_a"),
            F.col("b.sid").alias("doc_b"),
            jac.alias("jac_exact"),
            agree.cast("int").alias("n_agree"),
        )
        .where(F.col("jac_exact") >= _MH_EVAL_T)
        .select(
            "doc_a",
            "doc_b",
            "jac_exact",
            "n_agree",
            est.alias("jac_est"),
            F.round(F.abs(F.col("jac_exact") - est), 4).alias("abs_err"),
        )
    )

"""The modern pretraining-curation flagship: `pretrain_corpus_e2e`
chains every curation rung this engine ships — exact dedup, near-dup
cluster + keep-best, semantic (SemDeDup) dedup, language/quality gate,
DSIR importance selection, benchmark-contamination drop, leakage-safe
cluster-keyed split, and sequence packing — into ONE plan emitting a
per-document DISPOSITION ROSTER: for every ingested document, either
the split it landed in (train docs additionally carry their packed
token offset and sequence range) or exactly which rung dropped it.

This is the product story for the training-data side of the engine,
the way `chat_pipeline_e2e` is for retrieval: a user pointing the
engine at a crawl gets the full curated-corpus manifest from a single
call, with every intermediate decision attributable and the whole
thing value-checked against a first-principles DuckDB re-derivation
(one composed SQL statement reusing the exact CTE fragments of the
individual rung oracles — recursive LSH-cluster closure, unrolled
Lloyd, gate expressions, hashed-gram DSIR model, shingle-Jaccard
contamination, hash split, prefix-sum packing).

Pipeline semantics (each rung sees only the previous rung's
survivors; `src0` plays the held-out benchmark corpus and never
enters the training pool):

  source_gate  rung 0 (C4/RefinedWeb practice, r10): the
           deterministic source BLOCKLIST plus per-source doc/byte
           QUOTAS in crawl order (plans/queries_curation.py — the
           standalone `source_curation_gate` / `source_quota_enforce`
           ops; the reputation rules stay standalone because they are
           inert on this fixture and would cost the composed oracle
           two extra full-corpus passes). Docs of blocked sources and
           over-quota docs exit here as 'source_gate';
  ingest   rung-0 survivors plus a simulated re-ingest
           (survivors with doc_id % 7 == 3 reappear under
           doc_id + 1e6 — the same double-ingest device as
           `dedup_exact_text`, so the exact rung demonstrably fires
           on the all-distinct fixture);
  exact    min-id keeper per normalized-text fingerprint;
  near_dup LSH star edges -> connected components -> keep the
           longest member (id tie-break) per cluster;
  semantic corpus-wide Lloyd clusters (the same persisted-quantizer
           shape as dedup_semantic_prune), conservative sweep among
           SURVIVORS with the giant-cluster rank cap;
  quality_gate   script-aware language ID + quality score +
           boilerplate cap (doc_language_quality_gate's predicate);
  dsir     hashed-gram importance weights from the survivors' own
           target ('en') vs raw bag models, per-source top-K quota
           over non-target docs (target-language docs pass);
  contamination  drop survivors whose word-6-gram Jaccard vs ANY
           benchmark doc reaches JACCARD_T;
  split    train/val/test by near-dup CLUSTER hash (leakage-safe:
           a clique never straddles splits);
  packing  train docs concatenated in content-hash order and cut
           into fixed 256-token sequences (distributed prefix sum —
           bucket windows + broadcast bucket offsets, no global
           sort).

Scale shape (100 TB): the corpus-sized relations are touched a
bounded number of times — one tokenize pass each for fingerprints,
shingles, gate signals, and DSIR grams, one embedding pass for Lloyd
— and every rung boundary is a SLIM (doc_id[, cluster_id]) frame,
lineage-cut per the low-memory discipline, so the composed logical
plan stays linear in rung count. All joins against rung frames are
id-equi-joins AQE can broadcast; the only windows partition by
cluster/bucket/source, never globally. Reference analogue: the
reference has no curation pipeline at all (SURVEY §2 north-star
scope); rung-for-rung citations live in the component queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_search_ner_spark.operators import veckernel as vk
from vector_search_ner_spark.operators import neardup as nd
from vector_search_ner_spark.registry import query
from vector_search_ner_spark.session import cut_lineage
from vector_search_ner_spark.sources.catalog import load_table

# the per-source DSIR quota for the e2e rung (the standalone
# dsir_importance_select keeps its own constant)
_E2E_DSIR_TOPK = 5
# simulated re-ingest: clone ids offset far above the corpus range
_CLONE_OFFSET = 1_000_000

# Simulated ingest NOISE (the same demonstration device as the clone
# re-ingest): the synthetic fixture passes the quality gate 500/500,
# so four deterministic junk documents ride along — unique unmarked
# tokens (lang 'und' under the marker model) repeated into pure
# boilerplate (bp 0.75) — and must exit the pipeline at the
# quality_gate rung and nowhere else (unique text and token sets
# survive the dedup rungs; no embedding row, so the semantic rung
# passes them through).
_NOISE_ID_BASE = 2_000_000
_NOISE_DOCS = [
    (
        _NOISE_ID_BASE + k,
        " ".join([f"junk{k}"] * 32),
        "en",
        "src_noise",
        len(" ".join([f"junk{k}"] * 32)),
    )
    for k in range(4)
]


def _duck_pretrain_e2e() -> str:
    from vector_search_ner_spark.functions.text import duck_stable_long_hash
    from vector_search_ner_spark.functions.vector import duck_cosine
    from vector_search_ner_spark.plans.queries_dataprep import (
        _DSIR_B,
        _DSIR_M,
        _DSIR_P,
        _DSIR_TARGET_LANG,
        _PACK_BUDGET,
    )
    from vector_search_ner_spark.plans.queries_dedup import (
        _FP,
        JACCARD_T,
        _duck_lsh_cluster_ctes,
    )
    from vector_search_ner_spark.plans.queries_mlops import (
        _LLOYD_ITER,
        _LLOYD_SQD,
        _SEMDEDUP_CAP,
        _SEMDEDUP_T,
        _duck_lloyd_ctes,
    )
    from vector_search_ner_spark.plans.queries_text import (
        _BP_CAP,
        _duck_boilerplate,
        _duck_lang_scripted,
        _duck_quality,
    )

    B, P, M = _DSIR_B, _DSIR_P, _DSIR_M
    fl2 = lambda x: f"(length(bin({x})) - 1)"
    sqd = _LLOYD_SQD.format(a="a.v", b="c.centroid")
    cf = f"c{_LLOYD_ITER}"
    cos_ab = duck_cosine("a.v", "b.v")
    # the composed statement owns the single WITH RECURSIVE header;
    # splice the shared rung prefixes in as bare CTE lists
    lsh_body = _duck_lsh_cluster_ctes(src="x_kept").replace("WITH RECURSIVE ", "", 1)
    lloyd_body = _duck_lloyd_ctes().replace("WITH ", "", 1)
    nib = (
        "strpos('0123456789abcdef', "
        "substring(md5('split:' || CAST(cluster_id AS VARCHAR)), 32, 1)) - 1"
    )
    gate_pred = f"lang_pred <> 'und' AND quality >= 0.5 AND bp <= {_BP_CAP}"
    noise_values = ", ".join(
        f"(CAST({i} AS BIGINT), '{t}', '{lg}', '{s}', CAST({nc} AS BIGINT))"
        for i, t, lg, s, nc in _NOISE_DOCS
    )
    from vector_search_ner_spark.plans.queries_curation import (
        _SRC_DOC_QUOTA,
        _SRC_TOKEN_QUOTA,
        _duck_blocklist,
    )
    from vector_search_ner_spark.plans.queries_unigram import (
        _UNI_RELAX,
        _duck_uni_perw_ctes,
    )

    # rung 0 is TOKEN-budgeted (r12): the trained-encoder CTE chain
    # (ending in perw) re-derives the persisted tokenizer artifact
    # from first principles, then charges each doc its encoder token
    # count — the same unit the epoch planner spends
    uni_body = ",\n".join(_duck_uni_perw_ctes())

    return f"""
WITH RECURSIVE {uni_body}, tq_tok AS MATERIALIZED (
  SELECT d.doc_id,
         CAST(COALESCE(SUM(CASE WHEN tq.w = '' THEN 0
                                ELSE COALESCE(p.n_pieces, length(tq.w))
                           END), 0) AS BIGINT) AS n_tok
  FROM documents d
  LEFT JOIN (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w
             FROM documents) tq ON d.doc_id = tq.doc_id
  LEFT JOIN perw p ON tq.w = p.w AND length(tq.w) <= {_UNI_RELAX}
  GROUP BY d.doc_id
), src_rk AS (
  SELECT d.doc_id, d.source,
         row_number() OVER (PARTITION BY d.source ORDER BY d.doc_id) AS rn,
         SUM(t.n_tok) OVER (PARTITION BY d.source ORDER BY d.doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM documents d JOIN tq_tok t ON d.doc_id = t.doc_id
  WHERE d.source <> 'src0' AND d.source NOT IN ({_duck_blocklist()})
), src_ids AS MATERIALIZED (
  SELECT doc_id FROM src_rk
  WHERE rn <= {_SRC_DOC_QUOTA} AND cum <= {_SRC_TOKEN_QUOTA}
), src_dropped AS (
  SELECT doc_id FROM documents
  WHERE source <> 'src0' AND doc_id NOT IN (SELECT doc_id FROM src_ids)
), clones AS (
  SELECT d.doc_id + {_CLONE_OFFSET} AS doc_id, d.text, d.lang, d.source, d.n_chars
  FROM documents d JOIN src_ids s ON d.doc_id = s.doc_id
  WHERE d.doc_id % 7 = 3
), ingested AS MATERIALIZED (
  SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
  FROM documents d JOIN src_ids s ON d.doc_id = s.doc_id
  UNION ALL
  SELECT doc_id, text, lang, source, n_chars FROM clones
  UNION ALL
  SELECT * FROM (VALUES {noise_values}) AS noise(doc_id, text, lang, source, n_chars)
), fps AS (
  SELECT doc_id, {_FP} AS fp FROM ingested
), fpk AS (
  SELECT fp, MIN(doc_id) AS keeper FROM fps GROUP BY fp
), x_dropped AS (
  SELECT f.doc_id FROM fps f JOIN fpk k ON f.fp = k.fp WHERE f.doc_id <> k.keeper
), x_kept AS MATERIALIZED (
  SELECT i.* FROM ingested i JOIN fps f ON i.doc_id = f.doc_id
  JOIN fpk k ON f.fp = k.fp AND i.doc_id = k.keeper
),{lsh_body}, ranked AS (
  SELECT l.cluster_id, l.doc_id,
         row_number() OVER (PARTITION BY l.cluster_id
                            ORDER BY d.n_chars DESC, l.doc_id ASC) AS rnk
  FROM labels l JOIN x_kept d ON l.doc_id = d.doc_id
), nd_kept AS MATERIALIZED (
  SELECT doc_id, cluster_id FROM ranked WHERE rnk = 1
), nd_dropped AS (
  SELECT doc_id FROM ranked WHERE rnk > 1
), {lloyd_body}, semj0 AS (
  SELECT a.doc_id, a.cluster_id AS scl, a.v,
         CAST(FLOOR({sqd} * 1000000) AS BIGINT) AS u
  FROM af a JOIN {cf} c ON a.cluster_id = c.cluster_id
), semj AS MATERIALIZED (
  SELECT doc_id, scl, v, u,
         CAST(row_number() OVER (PARTITION BY scl ORDER BY u, doc_id) AS BIGINT) AS srn
  FROM semj0
), sem_dropped AS (
  SELECT DISTINCT b.doc_id
  FROM semj a JOIN semj b ON a.scl = b.scl
   AND (a.u < b.u OR (a.u = b.u AND a.doc_id < b.doc_id))
  JOIN nd_kept ka ON ka.doc_id = a.doc_id
  JOIN nd_kept kb ON kb.doc_id = b.doc_id
  WHERE a.srn <= {_SEMDEDUP_CAP} AND {cos_ab} > {_SEMDEDUP_T}
), sem_kept AS (
  SELECT k.doc_id, k.cluster_id FROM nd_kept k
  WHERE k.doc_id NOT IN (SELECT doc_id FROM sem_dropped)
), gate AS (
  SELECT doc_id, cluster_id,
         ({_duck_lang_scripted()}) AS lang_pred,
         ({_duck_quality()}) AS quality,
         ({_duck_boilerplate()}) AS bp
  FROM (SELECT d.doc_id, d.text, s.cluster_id
        FROM x_kept d JOIN sem_kept s ON d.doc_id = s.doc_id)
), gate_kept AS MATERIALIZED (
  SELECT doc_id, cluster_id FROM gate WHERE {gate_pred}
), gate_dropped AS (
  SELECT doc_id FROM gate WHERE NOT ({gate_pred})
), dth AS (
  SELECT d.doc_id, d.lang, d.source, {nd.duck_token_hashes60()} AS th
  FROM x_kept d JOIN gate_kept g ON d.doc_id = g.doc_id
), duni AS (
  SELECT doc_id, lang, source,
         unnest(list_transform(th, h -> h % {B})) AS bucket
  FROM dth
), dbig AS (
  SELECT doc_id, lang, source,
         unnest(list_transform(generate_series(1, len(th) - 1),
                i -> (((th[i] % {P}) * {M} + (th[i + 1] % {P})) % {P}) % {B})) AS bucket
  FROM dth WHERE len(th) >= 2
), dg AS MATERIALIZED (
  SELECT * FROM duni UNION ALL SELECT * FROM dbig
), dmodel AS (
  SELECT bucket,
         SUM(CASE WHEN lang = '{_DSIR_TARGET_LANG}' THEN 1 ELSE 0 END) AS ct,
         SUM(CASE WHEN lang <> '{_DSIR_TARGET_LANG}' THEN 1 ELSE 0 END) AS cr
  FROM dg GROUP BY bucket
), dtot AS (
  SELECT SUM(ct) AS nt, SUM(cr) AS nr FROM dmodel
), dw AS (
  SELECT m.bucket,
         ({fl2('m.ct + 1')} - {fl2('t.nt + ' + str(B))})
         - ({fl2('m.cr + 1')} - {fl2('t.nr + ' + str(B))}) AS bits
  FROM dmodel m CROSS JOIN dtot t
), dscore AS (
  SELECT g.doc_id, g.source, CAST(SUM(w.bits) AS BIGINT) AS weight_bits
  FROM dg g JOIN dw w ON g.bucket = w.bucket
  WHERE g.lang <> '{_DSIR_TARGET_LANG}'
  GROUP BY g.doc_id, g.source
), dsel AS (
  SELECT doc_id FROM (
    SELECT doc_id, row_number() OVER (
      PARTITION BY source ORDER BY weight_bits DESC, doc_id) AS rnk
    FROM dscore
  ) WHERE rnk <= {_E2E_DSIR_TOPK}
), dsir_dropped AS (
  SELECT s.doc_id FROM dscore s
  WHERE s.doc_id NOT IN (SELECT doc_id FROM dsel)
), dsir_kept AS MATERIALIZED (
  SELECT g.doc_id, g.cluster_id FROM gate_kept g
  JOIN x_kept d ON d.doc_id = g.doc_id
  WHERE d.lang = '{_DSIR_TARGET_LANG}'
     OR g.doc_id IN (SELECT doc_id FROM dsel)
), bsh_e AS MATERIALIZED (
  SELECT doc_id AS bench_id, {nd.duck_gram_hashes60("th")} AS hs
  FROM (SELECT doc_id, {nd.duck_token_hashes60()} AS th
        FROM documents WHERE source = 'src0')
), tsh_e AS MATERIALIZED (
  SELECT t.doc_id AS train_id, {nd.duck_gram_hashes60("th")} AS hs
  FROM (SELECT doc_id, {nd.duck_token_hashes60()} AS th FROM x_kept) t
  JOIN dsir_kept k ON t.doc_id = k.doc_id
), bex AS (
  SELECT bench_id, unnest(hs) AS sh1 FROM bsh_e
), tex AS (
  SELECT train_id, unnest(hs) AS sh1 FROM tsh_e
), hot_e AS (
  SELECT sh1 FROM tex GROUP BY sh1 HAVING COUNT(*) > {nd.DEFAULT_SHINGLE_DF_CAP}
), tcap AS (
  SELECT t.train_id, t.sh1 FROM tex t ANTI JOIN hot_e h ON t.sh1 = h.sh1
), cand_e AS (
  SELECT DISTINCT b.bench_id, t.train_id FROM tcap t JOIN bex b ON b.sh1 = t.sh1
), cmax AS (
  SELECT c.train_id,
         MAX(ROUND(len(list_intersect(b.hs, t.hs))
             / CAST(len(b.hs) + len(t.hs)
                    - len(list_intersect(b.hs, t.hs)) AS DOUBLE), 4)) AS mx
  FROM cand_e c
  JOIN bsh_e b ON b.bench_id = c.bench_id
  JOIN tsh_e t ON t.train_id = c.train_id
  GROUP BY c.train_id
), contam_dropped AS (
  SELECT train_id AS doc_id FROM cmax WHERE mx >= {JACCARD_T}
), final_kept AS MATERIALIZED (
  SELECT k.doc_id, k.cluster_id FROM dsir_kept k
  WHERE k.doc_id NOT IN (SELECT doc_id FROM contam_dropped)
), splits AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN {nib} < 12 THEN 'train'
              WHEN {nib} < 14 THEN 'val'
              ELSE 'test' END AS split
  FROM final_kept
), ntok AS MATERIALIZED (
  SELECT d.doc_id,
         CAST(len(string_split(trim(d.text), ' ')) AS BIGINT) AS n_tokens
  FROM x_kept d JOIN final_kept k ON d.doc_id = k.doc_id
), ph AS (
  SELECT s.doc_id, n.n_tokens,
         {duck_stable_long_hash("CAST(s.doc_id AS VARCHAR)")} AS h
  FROM splits s JOIN ntok n ON s.doc_id = n.doc_id
  WHERE s.split = 'train'
), po AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           ORDER BY h, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS off
  FROM ph
)
SELECT * FROM (
  SELECT doc_id, 'benchmark' AS disposition, CAST(NULL AS VARCHAR) AS dropped_by,
         CAST(NULL AS BIGINT) AS n_tokens, CAST(NULL AS BIGINT) AS "offset",
         CAST(NULL AS BIGINT) AS first_seq, CAST(NULL AS BIGINT) AS last_seq
  FROM documents WHERE source = 'src0'
  UNION ALL
  SELECT doc_id, 'dropped', 'source_gate', NULL, NULL, NULL, NULL FROM src_dropped
  UNION ALL
  SELECT doc_id, 'dropped', 'exact', NULL, NULL, NULL, NULL FROM x_dropped
  UNION ALL
  SELECT doc_id, 'dropped', 'near_dup', NULL, NULL, NULL, NULL FROM nd_dropped
  UNION ALL
  SELECT doc_id, 'dropped', 'semantic', NULL, NULL, NULL, NULL FROM sem_dropped
  UNION ALL
  SELECT doc_id, 'dropped', 'quality_gate', NULL, NULL, NULL, NULL FROM gate_dropped
  UNION ALL
  SELECT doc_id, 'dropped', 'dsir', NULL, NULL, NULL, NULL FROM dsir_dropped
  UNION ALL
  SELECT doc_id, 'dropped', 'contamination', NULL, NULL, NULL, NULL
  FROM contam_dropped
  UNION ALL
  SELECT s.doc_id, s.split, CAST(NULL AS VARCHAR), n.n_tokens,
         CASE WHEN s.split = 'train' THEN po.off END,
         CASE WHEN s.split = 'train' THEN po.off // {_PACK_BUDGET} END,
         CASE WHEN s.split = 'train'
              THEN (po.off + n.n_tokens - 1) // {_PACK_BUDGET} END
  FROM splits s JOIN ntok n ON s.doc_id = n.doc_id
  LEFT JOIN po ON po.doc_id = s.doc_id
)
ORDER BY doc_id
"""


@query("pretrain_corpus_e2e", oracle=_duck_pretrain_e2e())
def pretrain_corpus_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See the module docstring — the full curation pipeline as one
    composition, emitting (doc_id, disposition, dropped_by, n_tokens,
    offset, first_seq, last_seq). Every rung boundary is a slim
    lineage-cut id frame; the corpus-sized text/embedding relations
    are each scanned a bounded number of times and never
    materialized.

    Unit choice (r12): the source_gate rung is DOC+TOKEN denominated
    — the unit the epoch planner actually spends
    (`unigram_epoch_token_budget`), priced through the PERSISTED
    tokenizer artifact (sources/tokenizer_store.py; the plan scans
    the store, it never retrains). r10/11 gated on chars — the
    crawl-time proxy for a fresh run with no tokenizer yet — and
    `source_quota_tokens` measured 25 docs differing between the two
    units; the oracle re-derives the encoder from first principles,
    so the store content stays value-checked inside the flagship
    too."""
    from vector_search_ner_spark.functions.text import stable_long_hash
    from vector_search_ner_spark.operators.dedup import connected_components
    from vector_search_ner_spark.operators.textstats import (
        LANG_MARKERS,
        boilerplate_ratio_tokens,
        cjk_char_count,
        fingerprint,
        lang_from_hits,
        latin_char_count,
        marker_hits_tokens,
        quality_from_parts,
        script_from_counts,
        word_tokens,
    )
    from vector_search_ner_spark.plans.queries_dataprep import (
        _BUCKET_WIDTH,
        _DSIR_B,
        _DSIR_M,
        _DSIR_P,
        _DSIR_TARGET_LANG,
        _PACK_BUDGET,
    )
    from vector_search_ner_spark.plans.queries_dedup import JACCARD_T
    from vector_search_ner_spark.plans.queries_mlops import (
        _SEMDEDUP_CAP,
        _SEMDEDUP_T,
        _semdedup_members,
    )
    from vector_search_ner_spark.plans.queries_text import _BP_CAP

    from vector_search_ner_spark.plans.queries_curation import (
        _SRC_BLOCKLIST,
        _SRC_DOC_QUOTA,
        _SRC_TOKEN_QUOTA,
        doc_tokens_from_perw,
    )
    from vector_search_ner_spark.plans.queries_unigram import (
        unigram_perw_from_store,
    )

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("source") == "src0")
    elig_raw = docs.where(F.col("source") != "src0")

    # rung 0 — source gate: blocklist + per-source doc/TOKEN quotas in
    # crawl order (r12 — the quota unit a lab actually budgets; r10/11
    # gated on chars, the crawl-time proxy, and `source_quota_tokens`
    # measured 25 docs differing under the token unit). Token counts
    # come from the PERSISTED tokenizer artifact (the serving shape:
    # a store scan + one Viterbi pass — the training chain never
    # appears in this plan), charged by `doc_tokens_from_perw`. The
    # kept set is a slim id frame; the corpus re-joins by id so no
    # window output (and no text) is ever materialized.
    perw = unigram_perw_from_store(spark, sf_dir)
    dtok = cut_lineage(doc_tokens_from_perw(docs, perw))
    w_src = Window.partitionBy("source").orderBy("doc_id")
    src_rk = (
        elig_raw.where(~F.col("source").isin(*_SRC_BLOCKLIST))
        .join(dtok, "doc_id")
        .select(
            "doc_id",
            F.row_number().over(w_src).alias("__rn"),
            F.sum("n_tokens")
            .over(w_src.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .alias("__cum"),
        )
    )
    src_ids = cut_lineage(
        src_rk.where(
            (F.col("__rn") <= _SRC_DOC_QUOTA) & (F.col("__cum") <= _SRC_TOKEN_QUOTA)
        ).select("doc_id")
    )
    src_dropped = cut_lineage(
        elig_raw.select("doc_id").join(src_ids, "doc_id", "left_anti")
    )
    elig = elig_raw.join(src_ids, "doc_id")
    clones = elig.where(F.col("doc_id") % 7 == 3).withColumn(
        "doc_id", F.col("doc_id") + F.lit(_CLONE_OFFSET)
    )
    noise = spark.createDataFrame(
        _NOISE_DOCS, "doc_id long, text string, lang string, source string, n_chars long"
    ).select(*elig.columns)
    ingested = elig.unionByName(clones).unionByName(noise)

    # rung 1 — exact: min-id keeper per normalized-text fingerprint.
    # The fingerprint+self-join chain is staged ONCE behind a slim
    # (doc_id, keeper) cut; the kept/dropped rosters are then plain
    # filters over the checkpointed blocks. The previous shape cut the
    # two FILTERED frames instead, so the md5 fingerprint scan and its
    # self-join ran once per cut AND once per self-join side — four
    # computations (profiled at ~5.3 s of the flagship's construction;
    # this is the §2.4 remove-recomputation discipline, same values).
    # keeper via a window MIN over the fingerprint key instead of the
    # groupBy + self-join: one exchange instead of two and ONE
    # fingerprint scan instead of one per join side (§2.4 — same key,
    # share the shuffle; profiled 5.1 s -> ~1.5 s). Values identical:
    # min(doc_id) per fp either way.
    fps = ingested.select("doc_id", fingerprint(F.col("text")).alias("fp"))
    fpk = cut_lineage(
        fps.select(
            "doc_id",
            F.min("doc_id").over(Window.partitionBy("fp")).alias("keeper"),
        )
    )
    x_dropped = fpk.where(F.col("doc_id") != F.col("keeper")).select("doc_id")
    xk_ids = fpk.where(F.col("doc_id") == F.col("keeper")).select("doc_id")
    x_kept = ingested.join(xk_ids, "doc_id")

    # rung 2 — near-dup: LSH star edges -> CC -> keep-best per cluster
    labels = cut_lineage(connected_components(nd.lsh_star_edges(x_kept)))
    winners = (
        labels.join(x_kept.select(F.col("doc_id").alias("node"), "n_chars"), "node")
        .groupBy("cluster_id")
        .agg(F.max(F.struct(F.col("n_chars"), (-F.col("node")).alias("neg_id"))).alias("b"))
        .select(
            (-F.col("b.neg_id")).cast("long").alias("doc_id"),
            F.col("cluster_id").cast("long"),
        )
    )
    nd_kept = cut_lineage(winners)
    nd_dropped = cut_lineage(
        labels.select(F.col("node").alias("doc_id"))
        .join(nd_kept.select("doc_id"), "doc_id", "left_anti")
    )

    # rung 3 — semantic: corpus-wide Lloyd members, conservative sweep
    # among survivors, giant-cluster rank cap on the comparison side
    members = _semdedup_members(load_table(spark, sf_dir, "embeddings"))
    surv_ids = nd_kept.select("doc_id")
    a = (
        members.join(surv_ids, "doc_id")
        .where(F.col("rn") <= F.lit(_SEMDEDUP_CAP))
        .select(
            F.col("cluster_id").alias("a_cl"), F.col("doc_id").alias("a_id"),
            F.col("v").alias("av"), F.col("u").alias("au"),
        )
    )
    b = members.join(surv_ids, "doc_id").select(
        F.col("cluster_id").alias("b_cl"), F.col("doc_id").alias("doc_id"),
        F.col("v").alias("bv"), F.col("u").alias("bu"),
    )
    sem_dropped = cut_lineage(
        a.join(
            b,
            (F.col("a_cl") == F.col("b_cl"))
            & ((F.col("au") < F.col("bu"))
               | ((F.col("au") == F.col("bu")) & (F.col("a_id") < F.col("doc_id")))),
        )
        .where(vk.pair_cosine(F.col("av"), F.col("bv")) > F.lit(_SEMDEDUP_T))
        .select("doc_id")
        .distinct()
    )
    sem_kept = nd_kept.join(sem_dropped, "doc_id", "left_anti")

    # rung 4 — quality gate (script-aware lang ID, staged-count shape)
    toks = (
        x_kept.join(sem_kept.select("doc_id"), "doc_id")
        .select("doc_id", "text", word_tokens(F.col("text")).alias("__w"))
        .select(
            "doc_id", "text", "__w",
            marker_hits_tokens(F.col("__w"), LANG_MARKERS["code"]).alias("__code"),
            marker_hits_tokens(F.col("__w"), LANG_MARKERS["data"]).alias("__data"),
            marker_hits_tokens(F.col("__w"), LANG_MARKERS["en"]).alias("__en"),
            cjk_char_count(F.col("text")).alias("__cjk"),
            latin_char_count(F.col("text")).alias("__lat"),
        )
        .select(
            "doc_id",
            script_from_counts(F.col("__cjk"), F.col("__lat")).alias("script"),
            lang_from_hits(F.col("__code"), F.col("__data"), F.col("__en")).alias("__ll"),
            quality_from_parts(
                F.col("text"), F.size("__w").cast("long"), F.col("__en")
            ).alias("quality"),
            boilerplate_ratio_tokens("__w").alias("bp"),
        )
        .select(
            "doc_id",
            F.when(F.col("script") == "cjk", "cjk")
            .when(F.col("script") == "latin", F.col("__ll"))
            .otherwise("und")
            .alias("lang_pred"),
            "quality",
            "bp",
        )
    )
    gate_pred = (
        (F.col("lang_pred") != "und")
        & (F.col("quality") >= 0.5)
        & (F.col("bp") <= _BP_CAP)
    )
    # stage the scored gate frame ONCE (slim: doc_id + verdict); the
    # kept/dropped rosters are filters over the checkpointed blocks.
    # Cutting the two filtered frames separately re-ran the whole
    # tokenize + marker-count scan per cut (profiled ~6 s, half the
    # gate's construction cost)
    gate_scored = cut_lineage(toks.select("doc_id", gate_pred.alias("__ok")))
    gate_dropped = gate_scored.where(~F.col("__ok")).select("doc_id")
    gate_kept = sem_kept.join(
        gate_scored.where(F.col("__ok")).select("doc_id"), "doc_id"
    )

    # rung 5 — DSIR selection over the gate survivors
    B, P, M = _DSIR_B, _DSIR_P, _DSIR_M
    # staged once: duni AND dbig both explode this frame — without the
    # cut each recomputed the survivor join + md5 token hashing
    dth = cut_lineage(
        x_kept.join(gate_kept.select("doc_id"), "doc_id")
        .select("doc_id", "lang", "source", nd.token_hashes60(F.col("text")).alias("th"))
    )
    n = F.size("th")
    duni = dth.select(
        "doc_id", "lang", "source",
        F.explode(F.transform(F.col("th"), lambda h: h % B)).alias("bucket"),
    )
    dbig = dth.where(n >= 2).select(
        "doc_id", "lang", "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: (
                    (F.element_at("th", i) % P) * M + F.element_at("th", i + 1) % P
                ) % P % B,
            )
        ).alias("bucket"),
    )
    dg = cut_lineage(duni.unionByName(dbig))
    is_t = F.when(F.col("lang") == _DSIR_TARGET_LANG, 1).otherwise(0)
    is_r = F.when(
        F.col("lang").isNotNull() & (F.col("lang") != _DSIR_TARGET_LANG), 1
    ).otherwise(0)
    model = dg.groupBy("bucket").agg(F.sum(is_t).alias("ct"), F.sum(is_r).alias("cr"))
    tot = model.agg(F.sum("ct").alias("nt"), F.sum("cr").alias("nr"))
    fl2 = lambda c: F.length(F.bin(c)) - 1
    w = model.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (
            (fl2(F.col("ct") + 1) - fl2(F.col("nt") + B))
            - (fl2(F.col("cr") + 1) - fl2(F.col("nr") + B))
        ).alias("bits"),
    )
    dscore = (
        dg.where(F.col("lang") != _DSIR_TARGET_LANG)
        .join(F.broadcast(w), "bucket")
        .groupBy("doc_id", "source")
        .agg(F.sum("bits").cast("bigint").alias("weight_bits"))
    )
    sel_rank = F.row_number().over(
        Window.partitionBy("source").orderBy(F.col("weight_bits").desc(), F.col("doc_id"))
    )
    dsel = cut_lineage(
        dscore.withColumn("rnk", sel_rank).where(F.col("rnk") <= _E2E_DSIR_TOPK)
        .select("doc_id")
    )
    dsir_dropped = cut_lineage(
        dscore.select("doc_id").join(dsel, "doc_id", "left_anti")
    )
    gk_lang = gate_kept.join(x_kept.select("doc_id", "lang"), "doc_id")
    # staged once (slim id+cluster roster): consumed by BOTH the rung-6
    # contamination train side and the final-kept anti-join — without
    # the cut each re-ran the gate/survivor join chain
    dsir_kept = cut_lineage(
        gk_lang.where(F.col("lang") == _DSIR_TARGET_LANG)
        .select("doc_id", "cluster_id")
        .unionByName(
            gk_lang.where(F.col("lang") != _DSIR_TARGET_LANG)
            .join(dsel, "doc_id")
            .select("doc_id", "cluster_id")
        )
    )

    # rung 6 — contamination vs the held-out benchmark corpus
    bsh = cut_lineage(
        bench.select("doc_id", nd.token_hashes60(F.col("text")).alias("__th"))
        .select(F.col("doc_id").alias("bench_id"), nd.gram_hashes60(F.col("__th")).alias("b_sh"))
    )
    tsh = cut_lineage(
        x_kept.join(dsir_kept.select("doc_id"), "doc_id")
        .select("doc_id", nd.token_hashes60(F.col("text")).alias("__th"))
        .select(F.col("doc_id").alias("train_id"), nd.gram_hashes60(F.col("__th")).alias("t_sh"))
    )
    b_expl = bsh.select("bench_id", F.explode("b_sh").alias("sh"))
    t_expl = nd._drop_hot_shingles(
        tsh.select("train_id", F.explode("t_sh").alias("sh")),
        nd.DEFAULT_SHINGLE_DF_CAP,
    )
    cand = (
        t_expl.join(F.broadcast(b_expl), "sh")
        .select("bench_id", "train_id")
        .dropDuplicates(["bench_id", "train_id"])
    )
    common = F.size(F.array_intersect(F.col("b_sh"), F.col("t_sh")))
    overlap = F.round(common / (F.size("b_sh") + F.size("t_sh") - common), 4)
    contam_dropped = cut_lineage(
        cand.join(F.broadcast(bsh), "bench_id")
        .join(tsh, "train_id")
        .groupBy("train_id")
        .agg(F.max(overlap).alias("mx"))
        .where(F.col("mx") >= JACCARD_T)
        .select(F.col("train_id").alias("doc_id"))
    )
    final_kept = cut_lineage(dsir_kept.join(contam_dropped, "doc_id", "left_anti"))

    # rung 7 — leakage-safe split by near-dup cluster hash
    nib = F.instr(
        F.lit("0123456789abcdef"),
        F.substring(
            F.md5(F.concat(F.lit("split:"), F.col("cluster_id").cast("string"))), 32, 1
        ),
    ) - 1
    splits = final_kept.select(
        "doc_id",
        F.when(nib < 12, "train").when(nib < 14, "val").otherwise("test").alias("split"),
    )
    ntok = x_kept.join(final_kept.select("doc_id"), "doc_id").select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), " ")).cast("long").alias("n_tokens"),
    )

    # rung 8 — sequence packing over the train split (distributed
    # prefix sum: bucket windows + broadcast bucket offsets)
    ph = (
        splits.where(F.col("split") == "train")
        .join(ntok, "doc_id")
        .select(
            "doc_id", "n_tokens",
            stable_long_hash(F.col("doc_id").cast("string")).alias("h"),
        )
        .withColumn("__bucket", F.expr(f"h div {_BUCKET_WIDTH}"))
    )
    w_in = (
        Window.partitionBy("__bucket")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    btot = ph.groupBy("__bucket").agg(F.sum("n_tokens").alias("__btot"))
    w_b = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    boff = btot.select(
        "__bucket",
        F.coalesce(F.sum("__btot").over(w_b), F.lit(0)).cast("long").alias("__boff"),
    )
    off = (F.col("__boff") + F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0))).cast(
        "long"
    )
    packed = (
        ph.join(F.broadcast(boff), "__bucket")
        .withColumn("offset", off)
        .select(
            "doc_id",
            "offset",
            F.expr(f"offset div {_PACK_BUDGET}").cast("long").alias("first_seq"),
            F.expr(f"(offset + n_tokens - 1) div {_PACK_BUDGET}").cast("long").alias(
                "last_seq"
            ),
        )
    )

    nul_s = F.lit(None).cast("string")
    nul_l = F.lit(None).cast("long")

    def dropped_rows(ids: DataFrame, rung: str) -> DataFrame:
        return ids.select(
            "doc_id",
            F.lit("dropped").alias("disposition"),
            F.lit(rung).alias("dropped_by"),
            nul_l.alias("n_tokens"),
            nul_l.alias("offset"),
            nul_l.alias("first_seq"),
            nul_l.alias("last_seq"),
        )

    roster = (
        bench.select(
            "doc_id",
            F.lit("benchmark").alias("disposition"),
            nul_s.alias("dropped_by"),
            nul_l.alias("n_tokens"),
            nul_l.alias("offset"),
            nul_l.alias("first_seq"),
            nul_l.alias("last_seq"),
        )
        .unionByName(dropped_rows(src_dropped, "source_gate"))
        .unionByName(dropped_rows(x_dropped, "exact"))
        .unionByName(dropped_rows(nd_dropped, "near_dup"))
        .unionByName(dropped_rows(sem_dropped, "semantic"))
        .unionByName(dropped_rows(gate_dropped, "quality_gate"))
        .unionByName(dropped_rows(dsir_dropped, "dsir"))
        .unionByName(dropped_rows(contam_dropped, "contamination"))
        .unionByName(
            splits.join(ntok, "doc_id")
            .join(packed, "doc_id", "left")
            .select(
                "doc_id",
                F.col("split").alias("disposition"),
                nul_s.alias("dropped_by"),
                "n_tokens",
                "offset",
                "first_seq",
                "last_seq",
            )
        )
    )
    return roster.orderBy("doc_id")

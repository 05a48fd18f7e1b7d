"""Product-quantization queries (similarity-search scale path #3:
bytes). See operators/pq.py for the full design + determinism notes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_search_ner_spark.functions.vector import duck_cosine
from vector_search_ner_spark.operators import bq, mrl, pq, sq
from vector_search_ner_spark.operators.knn import knn_join
from vector_search_ner_spark.registry import query
from vector_search_ner_spark.sources.catalog import load_table

_N_QUERIES = 8
_TOPK = 5


@query("pq_encode_codes", oracle=pq.duck_pq_encode_sql())
def pq_encode_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encode: every 64-dim vector → 8 subspace codes (32× smaller).
    Map-side: the codebook broadcasts, argmin is a per-row window over
    16 candidates — no shuffle of the vector table at any scale."""
    emb = load_table(spark, sf_dir, "embeddings")
    cb = pq.build_codebook(emb)
    return pq.pq_encode(emb, cb)


@query("ann_pq_adc_topk", oracle=pq.duck_pq_adc_sql(_N_QUERIES, _TOPK))
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC approximate top-k: per-query LUT (M×K tiny, broadcast) +
    code-table lookups. The doc-side join touches only the 8-byte codes
    — the full vectors are never read at query time; at 100 TB that is
    a 32× scan-byte reduction over brute force, composable with IVF
    partition pruning (probe clusters, then ADC within)."""
    emb = load_table(spark, sf_dir, "embeddings")
    cb = pq.build_codebook(emb)
    codes = pq.pq_encode(emb, cb)
    queries = emb.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return pq.pq_adc_topk(queries, codes, cb, _TOPK)


@query("ann_ivf_pq_topk", oracle=pq.duck_ivf_pq_sql(4, 16, 4, _TOPK))
def ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed 100 TB ANN plan: IVF coarse probing (partition
    pruning — each query touches nprobe clusters, not the corpus)
    feeding PQ-ADC fine ranking (8-byte codes, no full vectors at
    query time). Compute AND bytes both drop; the two quantizers are
    independent (full-vector centroids vs subspace codebooks). Both
    stages deterministic → the whole composition is oracle-checked."""
    from vector_search_ner_spark.operators import ann

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = ann.ivf_fixed_build(emb, 16)
    cb = pq.build_codebook(emb)
    codes = pq.pq_encode(emb, cb)
    queries = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    from vector_search_ner_spark.functions.vector import l2_distance
    from vector_search_ner_spark.operators.knn import topk_per_query

    qc = queries.crossJoin(F.broadcast(centroids)).withColumn(
        "cdist", l2_distance(F.col("query_vec"), F.col("centroid"))
    )
    probes = topk_per_query(qc, 4, "query_id", "cdist", "cluster_id", ascending=True).select(
        "query_id", "cluster_id"
    )
    pairs = probes.join(
        assigned.select(F.col("vec_id").alias("doc_id"), "cluster_id"), "cluster_id"
    ).select("query_id", "doc_id")
    return pq.pq_adc_topk_pairs(queries, pairs, codes, cb, _TOPK)


_OVERFETCH = 3


@query(
    "ann_pq_adc_refined",
    oracle=pq.duck_pq_adc_sql(_N_QUERIES, _TOPK * _OVERFETCH, refine_k=_TOPK),
)
def ann_pq_adc_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC over-fetch (k*3) → exact re-rank to k — the reference's own
    recall heuristic (/root/reference/main.py:158-165) applied where it
    actually moves recall: the first pass ranks by lossy quantized
    distances, so fetching 3k and re-ranking them with exact L2 on the
    full vectors recovers neighbors the codes mis-ordered. The refine
    reads only 3k full vectors per query (broadcast-joined candidate
    list), not the corpus — the scan stays 8 B/vec."""
    emb = load_table(spark, sf_dir, "embeddings")
    cb = pq.build_codebook(emb)
    codes = pq.pq_encode(emb, cb)
    queries = emb.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    cand = pq.pq_adc_topk(queries, codes, cb, _TOPK * _OVERFETCH)
    return pq.exact_refine_topk(cand, queries, emb, _TOPK)


@query(
    "ann_ivf_pq_refined",
    oracle=pq.duck_ivf_pq_sql(4, 16, 4, _TOPK * _OVERFETCH, refine_k=_TOPK),
)
def ann_ivf_pq_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC+R (Jégou 2011 §V), the full 100 TB ANN plan with the
    recall knob closed: IVF probing prunes partitions, ADC ranks the
    pruned candidates from 8-byte codes, and the approximate top k*3
    per query is re-ranked by exact L2 over full vectors. All three
    stages deterministic → the whole composition is oracle-checked."""
    from vector_search_ner_spark.functions.vector import l2_distance
    from vector_search_ner_spark.operators import ann
    from vector_search_ner_spark.operators.knn import topk_per_query

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = ann.ivf_fixed_build(emb, 16)
    cb = pq.build_codebook(emb)
    codes = pq.pq_encode(emb, cb)
    queries = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    qc = queries.crossJoin(F.broadcast(centroids)).withColumn(
        "cdist", l2_distance(F.col("query_vec"), F.col("centroid"))
    )
    probes = topk_per_query(qc, 4, "query_id", "cdist", "cluster_id", ascending=True).select(
        "query_id", "cluster_id"
    )
    pairs = probes.join(
        assigned.select(F.col("vec_id").alias("doc_id"), "cluster_id"), "cluster_id"
    ).select("query_id", "doc_id")
    cand = pq.pq_adc_topk_pairs(queries, pairs, codes, cb, _TOPK * _OVERFETCH)
    return pq.exact_refine_topk(cand, queries, emb, _TOPK)


# ------------------------------------------------------- binary quantization

_BQ_K = 10
_BQ_OVERFETCH = 50


@query(
    "embedding_bq_signs",
    oracle=f"""
WITH {bq.duck_bq_codes_cte()}
SELECT doc_id AS vec_id, bq_hi, bq_lo,
       CAST(bit_count(bq_hi) + bit_count(bq_lo) AS INTEGER) AS nbits
FROM codes
""",
)
def embedding_bq_signs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary quantization encode: each 64-dim vector -> its 64-bit
    sign pattern as two 32-bit words (256x smaller than float32; the
    storage tier below int8 and PQ). Map-only, pure integer fold —
    no shuffle, bit-reproducible. See operators/bq.py for why sign
    bits preserve cosine order on the L2-normalized embeddings."""
    emb = load_table(spark, sf_dir, "embeddings")
    codes = bq.bq_encode(emb)
    return codes.select(
        "vec_id",
        "bq_hi",
        "bq_lo",
        (F.bit_count(F.col("bq_hi")) + F.bit_count(F.col("bq_lo")))
        .cast("int")
        .alias("nbits"),
    )


@query(
    "ann_bq_hamming_topk",
    oracle=bq.duck_bq_topk_sql(_N_QUERIES, _BQ_K, _BQ_OVERFETCH),
)
def ann_bq_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BQ search: XOR+popcount Hamming over the 16 B/row code table
    (query codes broadcast, corpus never shuffles for candidates),
    WindowGroupLimit cut to `overfetch` per query, exact cosine re-rank
    of the broadcast candidate list. At 100 TB the candidate pass scans
    256x fewer bytes than brute-force float cosine; full vectors are
    read only for the n_queries*overfetch candidates."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return bq.bq_hamming_topk(queries, emb, _BQ_K, _BQ_OVERFETCH)


@query(
    "ann_bq_recall_report",
    oracle=f"""
WITH {bq.duck_bq_codes_cte()}, q AS (
  SELECT doc_id AS query_id, bq_hi AS q_hi, bq_lo AS q_lo, embedding AS query_vec
  FROM codes WHERE doc_id < {_N_QUERIES}
), ham AS (
  SELECT q.query_id, c.doc_id,
         CAST(bit_count(xor(c.bq_hi, q.q_hi))
            + bit_count(xor(c.bq_lo, q.q_lo)) AS INTEGER) AS hamming
  FROM codes c CROSS JOIN q
), cand AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id ORDER BY hamming, doc_id) AS rn
    FROM ham
  ) WHERE rn <= {_BQ_OVERFETCH}
), bq_top AS (
  SELECT query_id, doc_id FROM (
    SELECT cand.query_id, cand.doc_id,
           row_number() OVER (
             PARTITION BY cand.query_id
             ORDER BY round({duck_cosine("q.query_vec", "d.embedding")}, 6) DESC,
                      cand.doc_id
           ) AS rank
    FROM cand
    JOIN codes d ON cand.doc_id = d.doc_id
    JOIN q ON cand.query_id = q.query_id
  ) WHERE rank <= {_BQ_K}
), exact_top AS (
  SELECT query_id, doc_id FROM (
    SELECT q.query_id, c.doc_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY {duck_cosine("q.query_vec", "c.embedding")} DESC, c.doc_id
           ) AS rank
    FROM codes c CROSS JOIN q
  ) WHERE rank <= {_BQ_K}
), hits AS (
  SELECT e.query_id, CAST(COUNT(*) AS INTEGER) AS n_hit
  FROM exact_top e JOIN bq_top b
    ON e.query_id = b.query_id AND e.doc_id = b.doc_id
  GROUP BY e.query_id
)
SELECT e.query_id,
       CAST(COUNT(*) AS INTEGER) AS n_exact,
       COALESCE(ANY_VALUE(h.n_hit), 0) AS n_hit,
       ROUND(COALESCE(ANY_VALUE(h.n_hit), 0) / CAST(COUNT(*) AS DOUBLE), 4) AS recall
FROM exact_top e LEFT JOIN hits h ON e.query_id = h.query_id
GROUP BY e.query_id
""",
)
def ann_bq_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the BQ Hamming path against exact cosine ground
    truth, per query — the same eval discipline as `ann_recall_report`
    applied to the bit tier, so the 256x compression's recall cost is a
    measured number with a full oracle, not a claim. Both legs are
    deterministic compositions already oracle-checked on their own."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    bq_top = bq.bq_hamming_topk(queries, emb, _BQ_K, _BQ_OVERFETCH).select(
        "query_id", "doc_id"
    )
    docs = emb.select(F.col("vec_id").alias("doc_id"), "embedding")
    exact_top = knn_join(queries, docs, k=_BQ_K, metric="cosine").select(
        "query_id", "doc_id"
    )
    hits = exact_top.join(bq_top, ["query_id", "doc_id"]).groupBy("query_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_hit")
    )
    return (
        exact_top.groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("int").alias("n_exact"))
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("int").alias("n_hit"),
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_exact").cast("double"),
                4,
            ).alias("recall"),
        )
    )


# ------------------------------------------------------- scalar quantization

_SQ_K = 10
_SQ_OVERFETCH = 30


@query("ann_sq_adc_topk", oracle=sq.duck_sq_topk_sql(_N_QUERIES, _SQ_K, _SQ_OVERFETCH))
def ann_sq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ (int8) approximate top-k — the search path for the ladder's
    4x tier (storage: `embedding_quantize_int8`), the shape Faiss SQ8 /
    Milvus IVF_SQ8 ship. One global symmetric scale makes the ADC PURE
    INTEGER (sum of squared code diffs — monotone in quantized L2), so
    candidate order is bit-reproducible with no rounding device; the
    exact cosine rescore of the 3k over-fetch repairs the quantization
    tail. Unlike the IVF tier (KMeans internals -> bound verdict), every
    stage here re-derives in SQL: a FULL value oracle over the final
    (query_id, doc_id, score, rank). Scale/encode/candidates/rescore
    shapes per operators/sq.py — corpus never shuffles; full vectors
    read only for the broadcast candidate list."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return sq.sq_adc_topk(queries, emb, _SQ_K, _SQ_OVERFETCH)


@query(
    "ann_sq_recall_report",
    oracle=f"""
WITH {sq.duck_sq_codes_cte(_N_QUERIES)}, cand AS (
  SELECT query_id, doc_id FROM (
    SELECT q.query_id, c.doc_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY {sq.duck_sq_adc("q.q_codes", "c.sq_codes")}, c.doc_id
           ) AS rn
    FROM codes c CROSS JOIN q
  ) WHERE rn <= {_SQ_OVERFETCH}
), sq_top AS (
  SELECT query_id, doc_id FROM (
    SELECT cand.query_id, cand.doc_id,
           row_number() OVER (
             PARTITION BY cand.query_id
             ORDER BY round({duck_cosine("q.query_vec", "d.embedding")}, 6) DESC,
                      cand.doc_id
           ) AS rank
    FROM cand
    JOIN codes d ON cand.doc_id = d.doc_id
    JOIN q ON cand.query_id = q.query_id
  ) WHERE rank <= {_SQ_K}
), exact_top AS (
  SELECT query_id, doc_id FROM (
    SELECT q.query_id, c.doc_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY {duck_cosine("q.query_vec", "c.embedding")} DESC, c.doc_id
           ) AS rank
    FROM codes c CROSS JOIN q
  ) WHERE rank <= {_SQ_K}
), hits AS (
  SELECT e.query_id, CAST(COUNT(*) AS INTEGER) AS n_hit
  FROM exact_top e JOIN sq_top b
    ON e.query_id = b.query_id AND e.doc_id = b.doc_id
  GROUP BY e.query_id
)
SELECT e.query_id,
       CAST(COUNT(*) AS INTEGER) AS n_exact,
       COALESCE(ANY_VALUE(h.n_hit), 0) AS n_hit,
       ROUND(COALESCE(ANY_VALUE(h.n_hit), 0) / CAST(COUNT(*) AS DOUBLE), 4) AS recall
FROM exact_top e LEFT JOIN hits h ON e.query_id = h.query_id
GROUP BY e.query_id
""",
)
def ann_sq_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the SQ int8 path against exact cosine ground truth,
    per query — completing the eval discipline across the whole ladder
    (exact / IVF / PQ / BQ / SQ all have a recall report or bound
    verdict): the 4x tier's recall cost is a measured, fully-oracled
    number. The int8 tier sits highest on the recall curve of the
    compressed tiers (64 codes of 8 bits vs PQ's 8 of 4, BQ's 64 of 1),
    so its report anchors the ladder's quality axis."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    sq_top = sq.sq_adc_topk(queries, emb, _SQ_K, _SQ_OVERFETCH).select(
        "query_id", "doc_id"
    )
    docs = emb.select(F.col("vec_id").alias("doc_id"), "embedding")
    exact_top = knn_join(queries, docs, k=_SQ_K, metric="cosine").select(
        "query_id", "doc_id"
    )
    hits = exact_top.join(sq_top, ["query_id", "doc_id"]).groupBy("query_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_hit")
    )
    return (
        exact_top.groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("int").alias("n_exact"))
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("int").alias("n_hit"),
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_exact").cast("double"),
                4,
            ).alias("recall"),
        )
    )


# ------------------------------------------------------------ tier IR eval

# nDCG discount table as INTEGER MICROUNIT LITERALS (round(1e12 /
# log2(pos+1))): log2 is not bit-identical across the JVM and DuckDB's
# libm, so neither engine computes it — both consume these constants,
# making every DCG sum a pure integer fold (the bm25_topk device).
_EVAL_DISC = [
    1000000000000, 630929753571, 500000000000, 430676558073, 386852807235,
    356207187108, 333333333333, 315464876786, 301029995664, 289064826318,
]
_EVAL_K = 10
# ideal DCG for the graded ladder rel(pos)=11-pos, pos=1..10
_EVAL_IDCG = sum((11 - p) * _EVAL_DISC[p - 1] for p in range(1, _EVAL_K + 1))


def _duck_tier_eval() -> str:
    disc_rows = ",\n         ".join(
        f"({p}, CAST({_EVAL_DISC[p-1]} AS BIGINT))" for p in range(1, _EVAL_K + 1)
    )
    return f"""
WITH sc AS (
  SELECT max(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))))
         / {float(sq.SQ_LEVELS)} AS sq_scale
  FROM embeddings
), codes AS (
  SELECT vec_id AS doc_id,
         list_transform(embedding,
                        x -> CAST(round(CAST(x AS DOUBLE) / sq_scale) AS BIGINT))
           AS sq_codes,
         {bq.duck_bq_word("embedding", bq.WORD_BITS)} AS bq_hi,
         {bq.duck_bq_word("embedding", 0)} AS bq_lo,
         embedding
  FROM embeddings CROSS JOIN sc
), q AS (
  SELECT doc_id AS query_id, sq_codes AS q_codes, bq_hi AS q_hi,
         bq_lo AS q_lo, embedding AS query_vec
  FROM codes WHERE doc_id < {_N_QUERIES}
), exact_top AS (
  SELECT query_id, doc_id, 11 - rank AS rel FROM (
    SELECT q.query_id, c.doc_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY {duck_cosine("q.query_vec", "c.embedding")} DESC, c.doc_id
           ) AS rank
    FROM codes c CROSS JOIN q
  ) WHERE rank <= {_EVAL_K}
), sq_cand AS (
  SELECT query_id, doc_id FROM (
    SELECT q.query_id, c.doc_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY {sq.duck_sq_adc("q.q_codes", "c.sq_codes")}, c.doc_id
           ) AS rn
    FROM codes c CROSS JOIN q
  ) WHERE rn <= {_SQ_OVERFETCH}
), sq_top AS (
  SELECT query_id, doc_id, pos FROM (
    SELECT sq_cand.query_id, sq_cand.doc_id,
           row_number() OVER (
             PARTITION BY sq_cand.query_id
             ORDER BY round({duck_cosine("q.query_vec", "d.embedding")}, 6) DESC,
                      sq_cand.doc_id
           ) AS pos
    FROM sq_cand
    JOIN codes d ON sq_cand.doc_id = d.doc_id
    JOIN q ON sq_cand.query_id = q.query_id
  ) WHERE pos <= {_EVAL_K}
), bq_cand AS (
  SELECT query_id, doc_id FROM (
    SELECT q.query_id, c.doc_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY bit_count(xor(c.bq_hi, q.q_hi))
                    + bit_count(xor(c.bq_lo, q.q_lo)), c.doc_id
           ) AS rn
    FROM codes c CROSS JOIN q
  ) WHERE rn <= {_BQ_OVERFETCH}
), bq_top AS (
  SELECT query_id, doc_id, pos FROM (
    SELECT bq_cand.query_id, bq_cand.doc_id,
           row_number() OVER (
             PARTITION BY bq_cand.query_id
             ORDER BY round({duck_cosine("q.query_vec", "d.embedding")}, 6) DESC,
                      bq_cand.doc_id
           ) AS pos
    FROM bq_cand
    JOIN codes d ON bq_cand.doc_id = d.doc_id
    JOIN q ON bq_cand.query_id = q.query_id
  ) WHERE pos <= {_EVAL_K}
), tiers AS (
  SELECT 'sq' AS tier, query_id, doc_id, CAST(pos AS INTEGER) AS pos FROM sq_top
  UNION ALL
  SELECT 'bq' AS tier, query_id, doc_id, CAST(pos AS INTEGER) AS pos FROM bq_top
), disc(pos, disc_micro) AS (
  VALUES {disc_rows}
), perq AS (
  SELECT t.tier, t.query_id,
         SUM(COALESCE(e.rel, 0) * d.disc_micro) AS dcg_micro,
         MIN(CASE WHEN e.rel > 0 THEN t.pos END) AS first_pos,
         SUM(CASE WHEN e.rel > 0 THEN 1 ELSE 0 END) AS n_hit
  FROM tiers t
  JOIN disc d ON t.pos = d.pos
  LEFT JOIN exact_top e ON t.query_id = e.query_id AND t.doc_id = e.doc_id
  GROUP BY t.tier, t.query_id
)
SELECT tier,
       ROUND(SUM(CASE WHEN first_pos IS NULL THEN CAST(0 AS BIGINT)
                      ELSE CAST(ROUND(1000000000000 / first_pos) AS BIGINT) END)
             / (COUNT(*) * 1e12), 6) AS mrr,
       ROUND(SUM(dcg_micro) / (COUNT(*) * CAST({_EVAL_IDCG} AS DOUBLE)), 6) AS ndcg,
       ROUND(SUM(n_hit) / (COUNT(*) * {float(_EVAL_K)}), 6) AS recall
FROM perq GROUP BY tier ORDER BY tier
"""


@query("ann_tier_eval_ndcg", oracle=_duck_tier_eval())
def ann_tier_eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standard IR metric family — MRR@10, nDCG@10 (graded
    relevance rel=11-rank of the exact cosine top-10), recall@10 —
    computed for the SQL-derivable compressed tiers (SQ int8, BQ sign
    bits) against exact ground truth, one row per tier. Complements
    the per-tier recall reports with the rank-position-weighted
    metrics an IR practitioner actually tunes on (IVF/PQ keep their
    own recall/bound reports; their quantizers' KMeans internals are
    covered by bound verdicts instead).

    Determinism: the log2 discount table is embedded as integer
    microunit LITERALS in both engines (libm log2 is not bit-portable)
    so every DCG accumulation is an exact integer sum; MRR microunits
    likewise; each metric ends in ONE division of identical operands
    then round(6) — bit-equal across engines.

    Scale: both tier legs reuse the production candidate shapes
    (broadcast query codes, WindowGroupLimit cuts); the eval adds only
    K-sized joins and aggregates on top — the eval itself is never the
    bottleneck, so this can run as a continuous quality monitor next
    to the serving path at full corpus scale."""
    from vector_search_ner_spark.operators.knn import knn_join

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    docs = emb.select(F.col("vec_id").alias("doc_id"), "embedding")
    exact = knn_join(queries, docs, k=_EVAL_K, metric="cosine").select(
        "query_id", "doc_id", (F.lit(11) - F.col("rank")).cast("int").alias("rel")
    )
    sq_top = sq.sq_adc_topk(queries, emb, _EVAL_K, _SQ_OVERFETCH).select(
        F.lit("sq").alias("tier"), "query_id", "doc_id", F.col("rank").alias("pos")
    )
    bq_top = bq.bq_hamming_topk(queries, emb, _EVAL_K, _BQ_OVERFETCH).select(
        F.lit("bq").alias("tier"), "query_id", "doc_id", F.col("rank").alias("pos")
    )
    disc = F.array(*[F.lit(d).cast("long") for d in _EVAL_DISC])
    scored = (
        sq_top.unionByName(bq_top)
        .join(exact, ["query_id", "doc_id"], "left")
        .select(
            "tier",
            "query_id",
            "pos",
            F.coalesce(F.col("rel"), F.lit(0)).cast("long").alias("rel"),
            F.element_at(disc, F.col("pos")).alias("disc_micro"),
        )
    )
    perq = scored.groupBy("tier", "query_id").agg(
        F.sum(F.col("rel") * F.col("disc_micro")).alias("dcg_micro"),
        F.min(F.when(F.col("rel") > 0, F.col("pos"))).alias("first_pos"),
        F.sum((F.col("rel") > 0).cast("int")).alias("n_hit"),
    )
    mrr_micro = F.when(F.col("first_pos").isNull(), F.lit(0).cast("long")).otherwise(
        F.round(F.lit(10**12) / F.col("first_pos")).cast("long")
    )
    return (
        perq.select("tier", "dcg_micro", "n_hit", mrr_micro.alias("mrr_micro"))
        .groupBy("tier")
        .agg(
            F.round(F.sum("mrr_micro") / (F.count(F.lit(1)) * F.lit(1e12)), 6).alias("mrr"),
            F.round(
                F.sum("dcg_micro") / (F.count(F.lit(1)) * F.lit(float(_EVAL_IDCG))), 6
            ).alias("ndcg"),
            F.round(
                F.sum("n_hit") / (F.count(F.lit(1)) * F.lit(float(_EVAL_K))), 6
            ).alias("recall"),
        )
        .orderBy("tier")
    )


# ----------------------------------------------------- Matryoshka tier

_MRL_K = 10
_MRL_OVERFETCH = 60


@query("ann_mrl_topk", oracle=mrl.duck_mrl_topk_sql(_N_QUERIES, _MRL_K, _MRL_OVERFETCH))
def ann_mrl_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncated-dimension search — the DIMENSION axis of
    the compression ladder (operators/mrl.py): candidates ranked by
    cosine over the first 32 of 64 coordinates (2x fewer bytes
    scanned, the MRL/text-embedding-3 `dimensions` recipe), then exact
    full-width cosine re-rank of the over-fetched broadcast candidate
    list. Completes the ladder's axes: per-dim precision (SQ int8, PQ
    4-bit, BQ 1-bit) and now dim COUNT — each with candidate
    generation + exact rescore and a FULL value oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return mrl.mrl_topk(queries, emb, _MRL_K, _MRL_OVERFETCH)


@query(
    "ann_mrl_recall_report",
    oracle=f"""
WITH {mrl.duck_mrl_cte(_N_QUERIES)}, cand AS (
  SELECT query_id, doc_id FROM (
    SELECT q.query_id, t.doc_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round({duck_cosine("q.q_vec", "t.mrl_vec")}, 6) DESC,
                      t.doc_id
           ) AS rn
    FROM trunc t CROSS JOIN q
  ) WHERE rn <= {_MRL_OVERFETCH}
), mrl_top AS (
  SELECT query_id, doc_id FROM (
    SELECT cand.query_id, cand.doc_id,
           row_number() OVER (
             PARTITION BY cand.query_id
             ORDER BY round({duck_cosine("q.query_vec", "d.embedding")}, 6) DESC,
                      cand.doc_id
           ) AS rank
    FROM cand
    JOIN trunc d ON cand.doc_id = d.doc_id
    JOIN q ON cand.query_id = q.query_id
  ) WHERE rank <= {_MRL_K}
), exact_top AS (
  SELECT query_id, doc_id FROM (
    SELECT q.query_id, t.doc_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY {duck_cosine("q.query_vec", "t.embedding")} DESC, t.doc_id
           ) AS rank
    FROM trunc t CROSS JOIN q
  ) WHERE rank <= {_MRL_K}
), hits AS (
  SELECT e.query_id, CAST(COUNT(*) AS INTEGER) AS n_hit
  FROM exact_top e JOIN mrl_top b
    ON e.query_id = b.query_id AND e.doc_id = b.doc_id
  GROUP BY e.query_id
)
SELECT e.query_id,
       CAST(COUNT(*) AS INTEGER) AS n_exact,
       COALESCE(ANY_VALUE(h.n_hit), 0) AS n_hit,
       ROUND(COALESCE(ANY_VALUE(h.n_hit), 0) / CAST(COUNT(*) AS DOUBLE), 4) AS recall
FROM exact_top e LEFT JOIN hits h ON e.query_id = h.query_id
GROUP BY e.query_id
""",
)
def ann_mrl_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the Matryoshka prefix-search path against exact
    full-width cosine ground truth, per query — the eval that tells
    you whether THIS corpus's embeddings front-load enough information
    for the truncated tier (MRL-trained embedders do; a PCA-rotated or
    random-basis embedding would not, and this report is how you find
    out before shipping the 4x scan saving)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    mrl_top = mrl.mrl_topk(queries, emb, _MRL_K, _MRL_OVERFETCH).select(
        "query_id", "doc_id"
    )
    docs = emb.select(F.col("vec_id").alias("doc_id"), "embedding")
    exact_top = knn_join(queries, docs, k=_MRL_K, metric="cosine").select(
        "query_id", "doc_id"
    )
    hits = exact_top.join(mrl_top, ["query_id", "doc_id"]).groupBy("query_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_hit")
    )
    return (
        exact_top.groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("int").alias("n_exact"))
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("int").alias("n_hit"),
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_exact").cast("double"),
                4,
            ).alias("recall"),
        )
    )


# ------------------------------------------------ filtered-ANN eval

_FILT_MOD = 7  # metadata filter stand-in: doc_id % 7 == 0 (~14% pass)
_FILT_K = 10
_FILT_PRE_OVERFETCH = 30
_FILT_POST_K = 30  # the post-filter recipe's unfiltered cut (k * 3)
_FILT_POST_OVERFETCH = 60


def _duck_filtered_prepost() -> str:
    return f"""
WITH {bq.duck_bq_codes_cte()}, q AS (
  SELECT doc_id AS query_id, bq_hi AS q_hi, bq_lo AS q_lo, embedding AS query_vec
  FROM codes WHERE doc_id < {_N_QUERIES}
), fc AS (
  SELECT * FROM codes WHERE doc_id % {_FILT_MOD} = 0
), exact_top AS (
  SELECT query_id, doc_id FROM (
    SELECT q.query_id, c.doc_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY {duck_cosine("q.query_vec", "c.embedding")} DESC, c.doc_id
           ) AS rank
    FROM fc c CROSS JOIN q
  ) WHERE rank <= {_FILT_K}
), pre_cand AS (
  SELECT query_id, doc_id FROM (
    SELECT q.query_id, c.doc_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY bit_count(xor(c.bq_hi, q.q_hi))
                    + bit_count(xor(c.bq_lo, q.q_lo)), c.doc_id
           ) AS rn
    FROM fc c CROSS JOIN q
  ) WHERE rn <= {_FILT_PRE_OVERFETCH}
), pre_top AS (
  SELECT query_id, doc_id FROM (
    SELECT pre_cand.query_id, pre_cand.doc_id,
           row_number() OVER (
             PARTITION BY pre_cand.query_id
             ORDER BY round({duck_cosine("q.query_vec", "d.embedding")}, 6) DESC,
                      pre_cand.doc_id
           ) AS rank
    FROM pre_cand
    JOIN codes d ON pre_cand.doc_id = d.doc_id
    JOIN q ON pre_cand.query_id = q.query_id
  ) WHERE rank <= {_FILT_K}
), post_cand AS (
  SELECT query_id, doc_id FROM (
    SELECT q.query_id, c.doc_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY bit_count(xor(c.bq_hi, q.q_hi))
                    + bit_count(xor(c.bq_lo, q.q_lo)), c.doc_id
           ) AS rn
    FROM codes c CROSS JOIN q
  ) WHERE rn <= {_FILT_POST_OVERFETCH}
), post_unfiltered AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT post_cand.query_id, post_cand.doc_id,
           row_number() OVER (
             PARTITION BY post_cand.query_id
             ORDER BY round({duck_cosine("q.query_vec", "d.embedding")}, 6) DESC,
                      post_cand.doc_id
           ) AS rank
    FROM post_cand
    JOIN codes d ON post_cand.doc_id = d.doc_id
    JOIN q ON post_cand.query_id = q.query_id
  ) WHERE rank <= {_FILT_POST_K}
), post_top AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id ORDER BY rank) AS rn
    FROM post_unfiltered WHERE doc_id % {_FILT_MOD} = 0
  ) WHERE rn <= {_FILT_K}
), pre_hits AS (
  SELECT e.query_id, CAST(COUNT(*) AS INTEGER) AS n
  FROM exact_top e JOIN pre_top p
    ON e.query_id = p.query_id AND e.doc_id = p.doc_id
  GROUP BY e.query_id
), post_hits AS (
  SELECT e.query_id, CAST(COUNT(*) AS INTEGER) AS n
  FROM exact_top e JOIN post_top p
    ON e.query_id = p.query_id AND e.doc_id = p.doc_id
  GROUP BY e.query_id
)
SELECT e.query_id,
       CAST(COUNT(*) AS INTEGER) AS n_exact,
       COALESCE(ANY_VALUE(pr.n), 0) AS pre_hits,
       ROUND(COALESCE(ANY_VALUE(pr.n), 0) / CAST(COUNT(*) AS DOUBLE), 4) AS pre_recall,
       COALESCE(ANY_VALUE(po.n), 0) AS post_hits,
       ROUND(COALESCE(ANY_VALUE(po.n), 0) / CAST(COUNT(*) AS DOUBLE), 4) AS post_recall
FROM exact_top e
LEFT JOIN pre_hits pr ON e.query_id = pr.query_id
LEFT JOIN post_hits po ON e.query_id = po.query_id
GROUP BY e.query_id
ORDER BY e.query_id
"""


@query("ann_filtered_prepost_eval", oracle=_duck_filtered_prepost())
def ann_filtered_prepost_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search, PRE- vs POST-filter — the design
    question every production vector store answers (Qdrant/Milvus
    filtered search; the reference's v1 pipeline post-filters and its
    v2 pre-filters, SURVEY §2.2): with a metadata predicate passing
    ~1/7 of the corpus, rank-then-filter (take the unfiltered ANN
    top k*3, then apply the filter — the v1 recipe) loses exactly the
    relevant docs the filter would have kept, while filter-then-rank
    runs the SAME BQ tier over the filtered code table and recovers
    them. Emits per query the recall of BOTH strategies against the
    exact filtered ground truth, so the flaw is a measured number
    (pre >= post on every fixture query), not a docstring claim.

    Scale: the pre-filter leg is the production shape — the filter is
    a pushable predicate on the code-table scan (partition/rowgroup
    pruning at 100 TB), the Hamming candidate stage then touches only
    surviving codes; the post-filter leg scans everything and still
    loses recall — the eval quantifies what that buys you."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    filt = emb.where(F.col("vec_id") % _FILT_MOD == 0)
    fdocs = filt.select(F.col("vec_id").alias("doc_id"), "embedding")
    exact_top = knn_join(queries, fdocs, k=_FILT_K, metric="cosine").select(
        "query_id", "doc_id"
    )
    pre_top = bq.bq_hamming_topk(queries, filt, _FILT_K, _FILT_PRE_OVERFETCH).select(
        "query_id", "doc_id"
    )
    from vector_search_ner_spark.operators.knn import topk_per_query

    post_unf = bq.bq_hamming_topk(
        queries, emb, _FILT_POST_K, _FILT_POST_OVERFETCH
    ).select("query_id", "doc_id", "rank")
    post_top = topk_per_query(
        post_unf.where(F.col("doc_id") % _FILT_MOD == 0).withColumnRenamed(
            "rank", "orig_rank"
        ),
        _FILT_K,
        "query_id",
        "orig_rank",
        "doc_id",
        ascending=True,
    ).select("query_id", "doc_id")
    pre_hits = exact_top.join(pre_top, ["query_id", "doc_id"]).groupBy(
        "query_id"
    ).agg(F.count(F.lit(1)).cast("int").alias("pre_n"))
    post_hits = exact_top.join(post_top, ["query_id", "doc_id"]).groupBy(
        "query_id"
    ).agg(F.count(F.lit(1)).cast("int").alias("post_n"))
    return (
        exact_top.groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("int").alias("n_exact"))
        .join(pre_hits, "query_id", "left")
        .join(post_hits, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce(F.col("pre_n"), F.lit(0)).cast("int").alias("pre_hits"),
            F.round(
                F.coalesce(F.col("pre_n"), F.lit(0)) / F.col("n_exact").cast("double"),
                4,
            ).alias("pre_recall"),
            F.coalesce(F.col("post_n"), F.lit(0)).cast("int").alias("post_hits"),
            F.round(
                F.coalesce(F.col("post_n"), F.lit(0)) / F.col("n_exact").cast("double"),
                4,
            ).alias("post_recall"),
        )
        .orderBy("query_id")
    )

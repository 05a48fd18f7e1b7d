"""Product-quantization queries (similarity-search scale path #3:
bytes). See operators/pq.py for the full design + determinism notes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_search_ner_spark.operators import pq
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

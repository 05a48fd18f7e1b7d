"""Scalar quantization (SQ) search — the int8 rung of the recall
ladder gets its SEARCH path.

The storage tier already exists (`embedding_quantize_int8`,
plans/queries_vector.py: per-vector max-abs scale, the 4x layout);
this module adds the query path the ladder was missing, so every
compressed tier — int8 (this), PQ bytes (operators/pq.py), sign bits
(operators/bq.py) — now has candidate generation + exact rescore, the
same shape Faiss's SQ8 index and Milvus's IVF_SQ8 ship.

Search-side design: one GLOBAL symmetric scale (corpus max-abs / 127)
instead of the storage query's per-vector scales. With a shared scale
the asymmetric distance between a query and a document collapses to
PURE INTEGER arithmetic in code space —

    adc_int(q, d) = sum_i (cq_i - cd_i)^2,   cq, cd in [-127, 127]

which is monotone in the quantized L2 (the float scale^2 factor is a
positive constant), so candidate ORDER needs no float ops at all:
bit-reproducible across engines by construction, no rounding device
needed. Per-vector scales would make the ADC a float product chain and
buy ~nothing on L2-normalized embeddings (norms are all 1, so the
global max-abs is representative); the reference's HNSW store
(/root/reference/chroma_data: float32) has no compressed tier at all.

The exact cosine rescore of the over-fetched candidates then repairs
the quantization tail, with the ladder's standard total order
(round(cos, 6) DESC, doc_id) — the same device as operators/bq.py.

Scale shape (what must survive 100 TB):
  * the global scale is one max-of-max aggregate — a scalar, computed
    once per index build, broadcast into the map-only encode;
  * encode is shuffle-free; the logical code table is 1 B/dim (4x
    smaller than float32 — Spark's array<long> test representation is
    wider, but the bytes-scanned contract of the tier is the point,
    exactly as operators/pq.py documents for its code table);
  * candidate generation broadcasts the query codes over the code
    table — the corpus never shuffles; the per-query cut is the
    WindowGroupLimit partial top-k (rank pushed before the single
    shuffle of slim (query_id, doc_id, adc) rows);
  * the rescore reads full vectors ONLY for the n_queries * overfetch
    broadcast candidate list.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_search_ner_spark.operators import veckernel as vk
from vector_search_ner_spark.functions.vector import (
    cosine_similarity,
    duck_cosine,
)
from vector_search_ner_spark.operators.knn import topk_per_query

SQ_LEVELS = 127  # symmetric int8: codes in [-127, 127]


def sq_scale(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """1-row (sq_scale) frame: corpus max|x| / 127 — the single global
    quantization step. One all-reduce aggregate; broadcast from there."""
    absmax = F.max(
        F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double"))))
    )
    return emb.agg((absmax / F.lit(float(SQ_LEVELS))).alias("sq_scale"))


def _sq_codes(vec: Column, scale: Column) -> Column:
    """array<long> codes: round(x / scale) per dim. round() is exact on
    the IEEE-identical quotient in both engines (the device the storage
    query `embedding_quantize_int8` already proves out)."""
    return F.transform(vec, lambda x: F.round(x.cast("double") / scale).cast("long"))


def sq_encode(
    emb: DataFrame,
    scale: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(doc_id, sq_codes): map-only encode under the broadcast global
    scale. No shuffle at any corpus size."""
    return emb.crossJoin(F.broadcast(scale)).select(
        F.col(id_col).alias("doc_id"),
        _sq_codes(F.col(vec_col), F.col("sq_scale")).alias("sq_codes"),
    )


def sq_adc_int(q_codes: Column, d_codes: Column) -> Column:
    """Integer ADC: sum of squared code differences — a long, totally
    ordered, no float anywhere."""
    sq = F.zip_with(q_codes, d_codes, lambda a, b: (a - b) * (a - b))
    return F.aggregate(sq, F.lit(0).cast("long"), lambda acc, v: acc + v)


def sq_adc_topk(
    queries: DataFrame,
    emb: DataFrame,
    k: int,
    overfetch: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SQ search: integer-ADC candidate generation over the code table
    -> exact cosine re-rank of the over-fetched candidates. `queries` =
    (query_id, query_vec). Returns (query_id, doc_id, score, rank)."""
    scale = sq_scale(emb, vec_col)
    codes = sq_encode(emb, scale, id_col, vec_col)
    qcodes = sq_encode(
        queries.select(
            F.col("query_id").alias(id_col), F.col("query_vec").alias(vec_col)
        ),
        scale,
        id_col,
        vec_col,
    ).select(F.col("doc_id").alias("query_id"), F.col("sq_codes").alias("q_codes"))
    scored = codes.crossJoin(F.broadcast(qcodes)).select(
        "query_id",
        "doc_id",
        sq_adc_int(F.col("q_codes"), F.col("sq_codes")).alias("adc"),
    )
    cand = topk_per_query(
        scored, overfetch, "query_id", "adc", "doc_id", ascending=True
    ).select("query_id", "doc_id")
    rescored = (
        emb.select(F.col(id_col).alias("doc_id"), vec_col)
        .join(F.broadcast(cand), "doc_id")
        .join(F.broadcast(queries), "query_id")
        .select(
            "query_id",
            "doc_id",
            # interpreted fold, not the Arrow pair kernel: this frame
            # is candidate-list-sized (queries x overfetch rows), so a
            # Python-worker round trip costs more than it saves (r12
            # measured the kernel swap at 0.74-0.81x on the eval
            # consumers; the kernel stays on corpus-sized frames)
            F.round(
                cosine_similarity(F.col("query_vec"), F.col(vec_col)), 6
            ).alias("score"),
        )
    )
    return topk_per_query(
        rescored, k, "query_id", "score", "doc_id", ascending=False
    ).select("query_id", "doc_id", "score", "rank")


def duck_sq_codes_cte(n_queries: int) -> str:
    """The oracle's mirror of scale + encode: `codes` (doc_id,
    sq_codes) over the corpus and `q` (query_id, q_codes, query_vec)
    for the batch. Same expression order as the Spark side so the
    quotient doubles are IEEE-identical before the exact round()."""
    return f"""sc AS (
  SELECT max(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))))
         / {float(SQ_LEVELS)} AS sq_scale
  FROM embeddings
), codes AS (
  SELECT vec_id AS doc_id,
         list_transform(embedding,
                        x -> CAST(round(CAST(x AS DOUBLE) / sq_scale) AS BIGINT))
           AS sq_codes,
         embedding
  FROM embeddings CROSS JOIN sc
), q AS (
  SELECT doc_id AS query_id, sq_codes AS q_codes, embedding AS query_vec
  FROM codes WHERE doc_id < {n_queries}
)"""


def duck_sq_adc(q_codes: str, d_codes: str) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, len({q_codes})), "
        f"i -> ({q_codes}[i] - {d_codes}[i]) * ({q_codes}[i] - {d_codes}[i])))"
    )


def duck_sq_topk_sql(n_queries: int, k: int, overfetch: int) -> str:
    """Full-value oracle for sq_adc_topk — every stage re-derived."""
    return f"""
WITH {duck_sq_codes_cte(n_queries)}, cand AS (
  SELECT query_id, doc_id FROM (
    SELECT q.query_id, c.doc_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY {duck_sq_adc("q.q_codes", "c.sq_codes")}, c.doc_id
           ) AS rn
    FROM codes c CROSS JOIN q
  ) WHERE rn <= {overfetch}
)
SELECT query_id, doc_id, score, CAST(rank AS INTEGER) AS rank FROM (
  SELECT cand.query_id, cand.doc_id,
         round({duck_cosine("q.query_vec", "d.embedding")}, 6) AS score,
         row_number() OVER (
           PARTITION BY cand.query_id
           ORDER BY round({duck_cosine("q.query_vec", "d.embedding")}, 6) DESC,
                    cand.doc_id
         ) AS rank
  FROM cand
  JOIN codes d ON cand.doc_id = d.doc_id
  JOIN q ON cand.query_id = q.query_id
) WHERE rank <= {k}
ORDER BY query_id, rank
"""

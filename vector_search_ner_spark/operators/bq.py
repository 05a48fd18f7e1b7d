"""Binary quantization (BQ) for the similarity-search scale path #4:
one BIT per dimension.

The modern vector-store recall ladder is float32 -> int8 (4x,
`embedding_quantize_int8`) -> PQ bytes (32x, operators/pq.py) -> sign
bits (256x, this module): each embedding dimension keeps only its sign,
so a 64-dim vector becomes 64 bits. Search is Hamming distance over
machine words (XOR + popcount — the cheapest distance that exists),
followed by an exact re-rank of a small over-fetched candidate set,
exactly the rescoring design the PQ path already uses
(`ann_pq_adc_refined`). The reference's HNSW index
(/root/reference/chroma_data: float32, M=16) has no binary tier; this
is the Spark-first replacement for the brute-force tier a 100 TB
corpus cannot afford to scan in float.

Why sign bits work here: the hashing embedder L2-normalizes, and for
unit vectors the expected Hamming distance between sign patterns is
monotone in angle (Goemans–Williamson: P[sign differs] = theta/pi per
independent Rademacher direction; the identity basis is the degenerate
projection set). Hamming order therefore approximates cosine order,
and the exact re-rank repairs the tail — quantified by
`ann_bq_recall_report`.

Determinism: encoding is a pure integer fold; Hamming is integer; the
re-rank rounds cosine to 6 dp and tie-breaks on doc_id — a total
order, so every stage is bit-reproducible and the DuckDB oracle
re-derives the whole path from first principles.

Scale shape (the part that must survive 100 TB):
  * encode is map-only — no shuffle, and the code table is 16 B/row
    (two longs), 256x smaller than the float vectors;
  * the query code batch broadcasts; the corpus code table never
    shuffles for candidate generation;
  * the candidate cut is the WindowGroupLimit partial top-k (rank
    pushed before the single per-query shuffle of slim rows);
  * the exact re-rank broadcasts the (n_queries x overfetch) candidate
    list back onto the vector table — a broadcast-semi pattern, so
    full vectors are read for candidates only, never shuffled.
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

WORD_BITS = 32  # two 32-bit words per 64-dim vector: no signed overflow
                # in either engine (Spark ANSI mode and DuckDB both
                # reject 63-bit shifts into the sign bit)


def _sign_word(vec: Column, offset: int) -> Column:
    """Bits offset..offset+31 of the sign pattern of `vec`, packed into
    a non-negative long: bit j set iff vec[offset+j] > 0. Pure JVM
    fold — zip the 32-slice with the power table, sum (distinct powers
    of two: the sum IS the bitwise OR, no carries)."""
    powers = F.array(*[F.lit(1 << j).cast("long") for j in range(WORD_BITS)])
    bits = F.zip_with(
        F.slice(vec, offset + 1, WORD_BITS),
        powers,
        lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda a, b: a + b)


def bq_encode(
    emb: DataFrame,
    id_col: str | list[str] = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id..., bq_hi, bq_lo): the 64-bit sign pattern of each vector as
    two 32-bit words. Map-only; the output is the 256x-compressed
    search structure. `id_col` may be a list for composite keys (e.g.
    the multi-vector chunk table's (doc_id, chunk_index))."""
    ids = [id_col] if isinstance(id_col, str) else list(id_col)
    return emb.select(
        *[F.col(c) for c in ids],
        _sign_word(F.col(vec_col), WORD_BITS).alias("bq_hi"),
        _sign_word(F.col(vec_col), 0).alias("bq_lo"),
    )


def hamming64(a_hi: Column, a_lo: Column, b_hi: Column, b_lo: Column) -> Column:
    """Hamming distance between two 64-bit sign patterns held as
    (hi, lo) word pairs: XOR + popcount per word."""
    return (
        F.bit_count(a_hi.bitwiseXOR(b_hi)) + F.bit_count(a_lo.bitwiseXOR(b_lo))
    ).cast("int")


def bq_hamming_topk(
    queries: DataFrame,
    emb: DataFrame,
    k: int,
    overfetch: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """BQ search: Hamming candidate generation over the bit codes ->
    exact cosine re-rank of the over-fetched candidates.

    `queries` = (query_id, query_vec). Candidate stage touches only the
    16 B/row code table with the query codes broadcast; re-rank reads
    full vectors for the broadcast candidate list only.
    """
    codes = bq_encode(emb, id_col, vec_col).withColumnRenamed(id_col, "doc_id")
    qcodes = bq_encode(
        queries.select(F.col("query_id").alias(id_col), F.col("query_vec").alias(vec_col))
    ).select(
        F.col(id_col).alias("query_id"),
        F.col("bq_hi").alias("q_hi"),
        F.col("bq_lo").alias("q_lo"),
    )
    scored = codes.crossJoin(F.broadcast(qcodes)).select(
        "query_id",
        "doc_id",
        hamming64(F.col("bq_hi"), F.col("bq_lo"), F.col("q_hi"), F.col("q_lo")).alias(
            "hamming"
        ),
    )
    cand = topk_per_query(
        scored, overfetch, "query_id", "hamming", "doc_id", ascending=True
    ).select("query_id", "doc_id", "hamming")

    docs = emb.select(F.col(id_col).alias("doc_id"), F.col(vec_col).alias("doc_vec"))
    rer = (
        docs.join(F.broadcast(cand), "doc_id")
        .join(
            F.broadcast(queries.select("query_id", "query_vec")),
            "query_id",
        )
        .select(
            "query_id",
            "doc_id",
            "hamming",
            # interpreted fold on the candidate-list-sized rerank frame
            # (queries x overfetch rows) — the Arrow round trip is not
            # amortized here; kernels stay on corpus-sized frames
            F.round(cosine_similarity(F.col("query_vec"), F.col("doc_vec")), 6).alias(
                "score"
            ),
        )
    )
    return topk_per_query(rer, k, "query_id", "score", "doc_id").select(
        "query_id", "doc_id", "hamming", "score", F.col("rank").cast("int").alias("rank")
    )


# ---------------------------------------------------------------- oracles


def duck_bq_word(vec: str, offset: int) -> str:
    """DuckDB twin of `_sign_word`."""
    return (
        f"CAST(list_sum(list_transform(generate_series(1, {WORD_BITS}), i -> "
        f"CASE WHEN {vec}[i + {offset}] > 0 THEN (CAST(1 AS BIGINT) << (i - 1)) "
        f"ELSE CAST(0 AS BIGINT) END)) AS BIGINT)"
    )


def duck_bq_codes_cte() -> str:
    """CTE `codes`: (doc_id, bq_hi, bq_lo, embedding) over `embeddings`."""
    return f"""codes AS (
  SELECT vec_id AS doc_id,
         {duck_bq_word("embedding", WORD_BITS)} AS bq_hi,
         {duck_bq_word("embedding", 0)} AS bq_lo,
         embedding
  FROM embeddings
)"""


def duck_bq_topk_sql(n_queries: int, k: int, overfetch: int) -> str:
    """Full-path oracle for `bq_hamming_topk` (queries = vec_id <
    n_queries self-search, matching the vector-family convention)."""
    return f"""
WITH {duck_bq_codes_cte()}, q AS (
  SELECT doc_id AS query_id, bq_hi AS q_hi, bq_lo AS q_lo, embedding AS query_vec
  FROM codes WHERE doc_id < {n_queries}
), ham AS (
  SELECT q.query_id, c.doc_id,
         CAST(bit_count(xor(c.bq_hi, q.q_hi))
            + bit_count(xor(c.bq_lo, q.q_lo)) AS INTEGER) AS hamming
  FROM codes c CROSS JOIN q
), cand AS (
  SELECT query_id, doc_id, hamming FROM (
    SELECT query_id, doc_id, hamming,
           row_number() OVER (PARTITION BY query_id ORDER BY hamming, doc_id) AS rn
    FROM ham
  ) WHERE rn <= {overfetch}
), rer AS (
  SELECT cand.query_id, cand.doc_id, cand.hamming,
         round({duck_cosine("q.query_vec", "d.embedding")}, 6) AS score
  FROM cand
  JOIN codes d ON cand.doc_id = d.doc_id
  JOIN q ON cand.query_id = q.query_id
)
SELECT query_id, doc_id, hamming, score, rank FROM (
  SELECT query_id, doc_id, hamming, score,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id
         ) AS INTEGER) AS rank
  FROM rer
) WHERE rank <= {k}
"""

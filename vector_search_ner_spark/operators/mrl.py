"""Matryoshka (truncated-dimension) search — the DIMENSION axis of the
compression ladder.

The existing compressed tiers shrink the per-dimension representation
(int8 scalar codes in operators/sq.py, 4-bit PQ codes in
operators/pq.py, sign bits in operators/bq.py); Matryoshka
Representation Learning (Kusupati et al. 2022, the layout OpenAI's
text-embedding-3 and friends expose as the `dimensions` parameter)
shrinks the NUMBER of dimensions instead: an MRL-trained embedding
front-loads information, so the first d' coordinates, re-normalized,
are themselves a usable d'-dim embedding. Search = rank candidates by
cosine over the PREFIX, then exact full-dimension rescore of the
over-fetched candidates — the adaptive-retrieval recipe from the paper
(coarse list from the small prefix, full-dim re-rank).

Reference parity: the reference's Chroma store (HNSW over full float32
vectors, /root/reference) has no reduced-dimension tier; this is the
scale path a 100 TB corpus needs when even int8 full-width vectors are
too much for the candidate scan.

Determinism: prefix cosine is a float, so the candidate ORDER uses the
ladder's standard total order — round(cos, 6) with doc_id tie-break —
and the final order re-ranks on round(full_cos, 6) likewise; every
fold is the sequential `aggregate()` both engines evaluate identically
(functions/vector.py).

Config note: the fixture's hashing embedder spreads information
UNIFORMLY over dimensions (it is not MRL-trained), which is this
tier's worst case — prefix recall grows roughly with d'/d. The
shipped 32/64 + overfetch-60 setting measures recall@10 = 0.775 at
sf0.01 (vs BQ's 0.71 at its budget); an actually-MRL-trained embedder
front-loads and does far better at smaller prefixes, and
`ann_mrl_recall_report` is exactly the gate that tells you which case
your corpus is in before you ship the byte saving.

Scale shape (what must survive 100 TB):
  * truncation is a map-only `slice` — no shuffle, and a columnar
    store that lays vectors out MRL-style reads only d'/d of the
    vector bytes for the candidate scan (2x at 32/64);
  * candidate generation broadcasts the (tiny) truncated query batch
    over the truncated corpus — the corpus never shuffles; the
    per-query cut is the WindowGroupLimit partial top-k;
  * the exact rescore reads full-width vectors ONLY for the
    n_queries x overfetch broadcast candidate list (the same rescore
    contract as operators/bq.py and operators/sq.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_search_ner_spark.operators import veckernel as vk
from vector_search_ner_spark.functions.vector import (
    cosine_similarity,
    duck_cosine,
)
from vector_search_ner_spark.operators.knn import topk_per_query

MRL_DIMS = 32  # prefix width: 32 of 64 dims = 2x fewer candidate bytes


def mrl_truncate(
    emb: DataFrame,
    dims: int = MRL_DIMS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(doc_id, mrl_vec): the first `dims` coordinates, un-normalized.
    Cosine normalizes by both norms, so re-normalizing the prefix here
    would be redundant work — the prefix-cosine below is identical
    either way. Map-only; no shuffle at any corpus size."""
    return emb.select(
        F.col(id_col).alias("doc_id"),
        F.slice(F.col(vec_col), 1, dims).alias("mrl_vec"),
    )


def mrl_topk(
    queries: DataFrame,
    emb: DataFrame,
    k: int,
    overfetch: int,
    dims: int = MRL_DIMS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka search: prefix-cosine candidate generation over the
    truncated table -> exact full-dim cosine re-rank of the over-fetched
    candidates. `queries` = (query_id, query_vec). Returns
    (query_id, doc_id, score, rank)."""
    trunc = mrl_truncate(emb, dims, id_col, vec_col)
    qtrunc = queries.select(
        "query_id", F.slice(F.col("query_vec"), 1, dims).alias("q_vec")
    )
    scored = trunc.crossJoin(F.broadcast(qtrunc)).select(
        "query_id",
        "doc_id",
        F.round(vk.pair_cosine(F.col("q_vec"), F.col("mrl_vec")), 6).alias(
            "pre_score"
        ),
    )
    cand = topk_per_query(
        scored, overfetch, "query_id", "pre_score", "doc_id", ascending=False
    ).select("query_id", "doc_id")
    rescored = (
        emb.select(F.col(id_col).alias("doc_id"), vec_col)
        .join(F.broadcast(cand), "doc_id")
        .join(F.broadcast(queries), "query_id")
        .select(
            "query_id",
            "doc_id",
            # interpreted fold on the candidate-list-sized rerank frame;
            # the truncated PRE-score above keeps the Arrow kernel (it
            # scans the corpus-sized truncated table)
            F.round(
                cosine_similarity(F.col("query_vec"), F.col(vec_col)), 6
            ).alias("score"),
        )
    )
    return topk_per_query(
        rescored, k, "query_id", "score", "doc_id", ascending=False
    ).select("query_id", "doc_id", "score", "rank")


def duck_mrl_cte(n_queries: int, dims: int = MRL_DIMS) -> str:
    """Oracle mirror of the truncation: `trunc` (doc_id, mrl_vec,
    embedding) and `q` (query_id, q_vec, query_vec). DuckDB list
    slicing is 1-based inclusive, matching Spark's slice(vec, 1, n)."""
    return f"""trunc AS (
  SELECT vec_id AS doc_id, embedding[1:{dims}] AS mrl_vec, embedding
  FROM embeddings
), q AS (
  SELECT doc_id AS query_id, mrl_vec AS q_vec, embedding AS query_vec
  FROM trunc WHERE doc_id < {n_queries}
)"""


def duck_mrl_topk_sql(n_queries: int, k: int, overfetch: int,
                      dims: int = MRL_DIMS) -> str:
    """Full-value oracle for mrl_topk — every stage re-derived."""
    return f"""
WITH {duck_mrl_cte(n_queries, dims)}, cand AS (
  SELECT query_id, doc_id FROM (
    SELECT q.query_id, t.doc_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round({duck_cosine("q.q_vec", "t.mrl_vec")}, 6) DESC,
                      t.doc_id
           ) AS rn
    FROM trunc t CROSS JOIN q
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
  JOIN trunc d ON cand.doc_id = d.doc_id
  JOIN q ON cand.query_id = q.query_id
) WHERE rank <= {k}
ORDER BY query_id, rank
"""

"""Vector-search queries (SURVEY §2.3, §2.5, §2.6): exact k-NN over the
`embeddings` fixture, the Spark replacement for the reference's HNSW
`similarity_search_with_score` (/root/reference/main.py:158-165).

Query batch = vectors with vec_id < 8 (self-search): deterministic,
fixture-only, and exercises the same shape as a user query batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_search_ner_spark.functions.vector import (
    cosine_similarity,
    duck_cosine,
    duck_l2,
)
from vector_search_ner_spark.operators import veckernel as vk
from vector_search_ner_spark.operators.knn import knn_join
from vector_search_ner_spark.registry import query
from vector_search_ner_spark.sources.catalog import load_table

K = 10
N_QUERIES = 8


def _query_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def _knn(spark: SparkSession, sf_dir: str, metric: str, doc_filter=None, k: int = K) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding", "label"
    )
    out = knn_join(
        _query_batch(spark, sf_dir), emb, k=k, metric=metric, doc_filter=doc_filter
    )
    return out.select("query_id", "doc_id", "score", F.col("rank").cast("int").alias("rank"))


def _duck_knn(score_sql: str, order: str, where: str = "", k: int = K) -> str:
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS query_vec
  FROM embeddings WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT q.query_id, d.vec_id AS doc_id,
         {score_sql} AS score
  FROM embeddings d CROSS JOIN q
  {where}
), ranked AS (
  SELECT query_id, doc_id, score,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY score {order}, doc_id
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, doc_id, score, rank FROM ranked WHERE rank <= {k}
"""


@query(
    "knn_topk_cosine",
    oracle=_duck_knn(duck_cosine("q.query_vec", "d.embedding"), "DESC"),
)
def knn_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _knn(spark, sf_dir, "cosine")


@query(
    "knn_topk_l2",
    oracle=_duck_knn(duck_l2("q.query_vec", "d.embedding"), "ASC"),
)
def knn_topk_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _knn(spark, sf_dir, "l2")


@query(
    "knn_filtered",
    oracle=_duck_knn(
        duck_cosine("q.query_vec", "d.embedding"),
        "DESC",
        where="WHERE d.label IN (1, 2, 3)",
        k=5,
    ),
)
def knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered k-NN: metadata predicate applied BEFORE scoring — the
    pushdown analogue of the reference v2's `where_document`
    (/root/reference/main.py:144-162). Exact search makes the
    reference's k*3 over-fetch heuristic (main.py:160-165) a no-op."""
    return _knn(spark, sf_dir, "cosine", doc_filter=F.col("label").isin(1, 2, 3), k=5)


@query(
    "similarity_full_scan",
    oracle=f"""
SELECT d.vec_id AS doc_id,
       {duck_l2("q.query_vec", "d.embedding")} AS distance,
       CAST(row_number() OVER (ORDER BY {duck_l2("q.query_vec", "d.embedding")}, d.vec_id)
            AS INTEGER) AS rank
FROM embeddings d
CROSS JOIN (SELECT embedding AS query_vec FROM embeddings WHERE vec_id = 0) q
""",
)
def similarity_full_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debug full-similarity scan: single query vs the whole table,
    globally distance-ranked, no limit (/root/reference/main.py:493-514
    approximated k=1000 ≈ whole index; here it is truly the whole table).

    Global rank WITHOUT a single-partition window AND without leaving
    the JVM: after the distributed range-partitioned sort, partitions
    are contiguous key ranges, so
        global rank = (rows in earlier partitions) + row_number within
    — per-partition counts are tiny (one row per partition), their
    cumulative offsets broadcast back, and the within-partition
    row_number needs no further exchange. The sorted, __pid-stamped
    frame is eagerly localCheckpoint'ed so BOTH consumers (the counts
    branch and the rank branch) observe the one materialized
    partitioning — partition ids are fixed by construction, not by
    optimizer exchange reuse (which is non-contractual under AQE) —
    and the blocks are GC-reclaimed once the frame is unreferenced,
    unlike a persist, which would pin the corpus-sized slice for the
    session (the same discipline as dedup_sorted_neighborhood's
    identical __pid-rank pattern). The checkpointed slice is 3 narrow
    columns, so even a 10^9-vector corpus is ~tens of GB cluster-wide.
    Fault-tolerance tradeoff, stated honestly: localCheckpoint blocks
    are NON-replicated and NON-reliable — on a real cluster an
    executor loss fails the job instead of recomputing (unlike a
    lineage-backed persist or a reliable checkpoint()). That is the
    right trade for SMALL/bounded frames (per-step MMR/lattice frames,
    convergence signatures); for a corpus-sized frame like this one, a
    long-lived cluster job should swap in reliable checkpoint() to an
    HDFS/object-store dir, or persist(MEMORY_AND_DISK) + explicit
    unpersist — same plan shape, one-line change at deploy time.
    Asserted in tests/test_plan_shapes.py::
    test_similarity_full_scan_jvm_rank.
    Deterministic because (distance, doc_id) is a total order."""
    from pyspark.sql import Window
    from vector_search_ner_spark.functions.vector import l2_distance_nc, to_double_array

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "__dv", to_double_array(F.col("embedding"))
    )
    q = emb.where(F.col("vec_id") == 0).select(to_double_array("embedding").alias("__qv"))
    scored = (
        emb.crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            l2_distance_nc(F.col("__qv"), F.col("__dv")).alias("distance"),
        )
        .orderBy(F.col("distance").asc(), F.col("doc_id").asc())
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = scored.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).cast("long").alias("__off"),
    )
    w_in = Window.partitionBy("__pid").orderBy(F.col("distance").asc(), F.col("doc_id").asc())
    return (
        scored.join(F.broadcast(offsets), "__pid")
        .select(
            "doc_id",
            "distance",
            (F.col("__off") + F.row_number().over(w_in)).cast("int").alias("rank"),
        )
    )


@query(
    "embedding_quantize_int8",
    oracle="""
WITH e AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE vec_id < 500
), s AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
  FROM e
), c AS (
  SELECT vec_id, v, scale,
         list_transform(v, x -> CAST(round(x / scale) AS BIGINT)) AS codes
  FROM s
)
SELECT vec_id, scale,
       CAST(list_sum(codes) AS BIGINT) AS code_sum,
       list_max(list_transform(generate_series(1, len(v)),
                               i -> abs(codes[i] * scale - v[i]))) AS max_err
FROM c
""",
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 scalar quantization of the embedding column — the storage
    layout that makes a 100 TB vector corpus 4x smaller and
    SIMD-scannable (per-vector max-abs scale, symmetric round-to-
    nearest codes). Emits the scale, the code checksum, and the max
    reconstruction error per vector; every op is an exactly-rounded
    IEEE double op (and round-half-away matches across engines), so
    the oracle is bit-exact. Map-only: no shuffle."""
    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 500)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    out = emb.select("vec_id", v.alias("v")).withColumn(
        "scale", F.array_max(F.transform(F.col("v"), F.abs)) / F.lit(127.0)
    )
    codes = F.transform(F.col("v"), lambda x: F.round(x / F.col("scale")).cast("long"))
    out = out.withColumn("codes", codes)
    max_err = F.array_max(
        F.zip_with(F.col("codes"), F.col("v"), lambda c, x: F.abs(c * F.col("scale") - x))
    )
    return out.select(
        "vec_id",
        "scale",
        F.aggregate(F.col("codes"), F.lit(0).cast("long"), lambda a, c: a + c).alias("code_sum"),
        max_err.alias("max_err"),
    )


@query(
    "knn_range_search",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS query_vec
  FROM embeddings WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT q.query_id, d.vec_id AS doc_id,
         {duck_cosine("q.query_vec", "d.embedding")} AS score
  FROM embeddings d CROSS JOIN q
)
SELECT query_id, doc_id, ROUND(score, 6) AS score
FROM scored
WHERE ROUND(score, 6) >= 0.2
ORDER BY query_id, doc_id
""",
)
def knn_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range similarity search (ALL docs within a similarity radius,
    not top-k): the other half of the similarity-search API — radius
    queries back near-dup candidate generation and recall-oriented
    retrieval where k is unknown a priori. Same broadcast-queries scan
    shape as k-NN but with a scan-side threshold filter instead of the
    per-query window, so it is strictly cheaper: no rank shuffle at
    all, output streams straight out of the map stage."""

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    q = _query_batch(spark, sf_dir)
    score = F.round(vk.pair_cosine(F.col("query_vec"), F.col("embedding")), 6)
    return (
        emb.crossJoin(F.broadcast(q))
        .select("query_id", "doc_id", score.alias("score"))
        .where(F.col("score") >= 0.2)
        .orderBy("query_id", "doc_id")
    )


@query(
    "embedding_arrow_stats",
    oracle="""
SELECT vec_id,
       CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive,
       CAST(list_indexof(embedding, list_max(embedding)) AS INTEGER) AS argmax_idx
FROM embeddings
ORDER BY vec_id
""",
)
def embedding_arrow_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow extension point (the zero-copy sibling of
    mapInPandas: the UDF sees raw pyarrow RecordBatches — no pandas
    conversion, the right surface for vector/tensor kernels that speak
    Arrow natively). Stats chosen to be integer-exact (positive-
    component count, 1-based argmax index) so even this Python path
    gets a full SQL oracle. At scale: per-batch columnar compute,
    map-only, no shuffle."""
    import pyarrow as pa
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def op(batches):
        for batch in batches:
            tbl = batch.to_pydict()
            vec_ids, n_pos, argmax = [], [], []
            for vid, vec in zip(tbl["vec_id"], tbl["embedding"]):
                arr = np.asarray(vec, dtype=np.float32)
                vec_ids.append(vid)
                n_pos.append(int((arr > 0).sum()))
                argmax.append(int(arr.argmax()) + 1)
            yield pa.RecordBatch.from_pydict(
                {"vec_id": vec_ids, "n_positive": n_pos, "argmax_idx": argmax},
                schema=pa.schema(
                    [("vec_id", pa.int64()), ("n_positive", pa.int64()), ("argmax_idx", pa.int32())]
                ),
            )

    return emb.mapInArrow(
        op, schema="vec_id long, n_positive long, argmax_idx int"
    ).orderBy("vec_id")


MMR_LAMBDA = 0.7
MMR_POOL = 20
MMR_N = 5


def _duck_mmr() -> str:
    """Unrolled MMR oracle: candidate pool CTE, then MMR_N selection
    steps, each an anti-join against everything selected so far, a
    MAX pairwise-cosine aggregation, and a window argmax — the exact
    dataflow of the Spark plan, so every double matches bit-for-bit.

    Memory-safe by construction (the r6 driver's constrained DuckDB
    checker OOM'd on the previous formulation): `pool` AND every step
    CTE `s{t}` are declared AS MATERIALIZED — each s{t} is referenced
    by every later sel{u}, so without materialization DuckDB re-inlines
    the step chain and the plan grows exponentially in steps (the exact
    DuckDB analogue of the Spark side's localCheckpoint lineage cuts);
    the `sel{t}` unions carry only (query_id, doc_id) — no float-list
    column is dragged through the step chain — and `dv` is joined back
    from the materialized pool only inside each step's pairwise-cosine
    aggregation. Verified under `PRAGMA memory_limit='500MB'` (and
    100MB) in tests/test_semantics.py::test_mmr_oracle_memory_capped."""
    cos_qd = duck_cosine("q.qv", "d.embedding")
    cos_rs = duck_cosine("r.dv", "ps.dv")
    parts = [
        f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv
  FROM embeddings WHERE vec_id < {N_QUERIES}
), pool AS MATERIALIZED (
  SELECT query_id, doc_id, rel, dv FROM (
    SELECT q.query_id, d.vec_id AS doc_id, {cos_qd} AS rel, d.embedding AS dv,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {cos_qd} DESC, d.vec_id) AS rn
    FROM embeddings d CROSS JOIN q
  ) WHERE rn <= {MMR_POOL}
), s1 AS MATERIALIZED (
  SELECT query_id, doc_id, rel, 1 AS mmr_rank, rel AS mmr_score FROM (
    SELECT query_id, doc_id, rel,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY rel DESC, doc_id) AS rn
    FROM pool
  ) WHERE rn = 1
)"""
    ]
    for t in range(2, MMR_N + 1):
        prev_union = " UNION ALL ".join(
            f"SELECT query_id, doc_id FROM s{u}" for u in range(1, t)
        )
        parts.append(f""", sel{t} AS (
  {prev_union}
), r{t} AS (
  SELECT p.query_id, p.doc_id, p.rel, p.dv FROM pool p
  ANTI JOIN sel{t} s ON p.query_id = s.query_id AND p.doc_id = s.doc_id
), m{t} AS (
  SELECT r.query_id, r.doc_id, MAX({cos_rs}) AS max_sim
  FROM r{t} r
  JOIN sel{t} s ON r.query_id = s.query_id
  JOIN pool ps ON ps.query_id = s.query_id AND ps.doc_id = s.doc_id
  GROUP BY r.query_id, r.doc_id
), s{t} AS MATERIALIZED (
  SELECT query_id, doc_id, rel, {t} AS mmr_rank, score AS mmr_score FROM (
    SELECT r.query_id, r.doc_id, r.rel,
           {MMR_LAMBDA} * r.rel - {1.0 - MMR_LAMBDA} * m.max_sim AS score,
           row_number() OVER (PARTITION BY r.query_id
                              ORDER BY {MMR_LAMBDA} * r.rel
                                       - {1.0 - MMR_LAMBDA} * m.max_sim DESC,
                                       r.doc_id) AS rn
    FROM r{t} r JOIN m{t} m ON r.query_id = m.query_id AND r.doc_id = m.doc_id
  ) WHERE rn = 1
)""")
    union = " UNION ALL ".join(
        f"SELECT query_id, doc_id, mmr_rank, mmr_score FROM s{t}"
        for t in range(1, MMR_N + 1)
    )
    parts.append(f"""
SELECT query_id, doc_id,
       CAST(mmr_rank AS INTEGER) AS mmr_rank,
       ROUND(mmr_score, 4) AS mmr_score
FROM ({union})
""")
    return "".join(parts)


@query("mmr_diversified_topk", oracle=_duck_mmr())
def mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-Marginal-Relevance diversified top-5 (Carbonell &
    Goldstein, SIGIR 1998) — the rerank the reference's plain
    similarity top-5 (main.py:455) lacks: after the exact cosine
    top-20 candidate pool, each of 5 selection steps picks
    argmax λ·rel(d) − (1−λ)·max_{s∈selected} cos(d, s), λ=0.7,
    doc_id tie-break — relevance traded against redundancy, the
    standard fix when near-duplicate chunks crowd out coverage.

    Set-at-a-time like the relaxation lattice: per step an anti-join
    of the pool against the selected set (both ≤ pool-size rows per
    query), one pairwise-cosine MAX aggregation, one per-query window
    argmax over ≤ 20 rows. Each step's selected frame (N_QUERIES
    rows) is eagerly localCheckpoint'ed: every step references ALL
    prior steps from three places (anti-join, pair join, final
    union), so without the lineage cut the logical plan tree grows
    EXPONENTIALLY in steps — at 5 steps the plan STRING alone OOMs a
    1 GB driver (found by the low-memory determinism probe; the same
    lesson as the lattice/CC loops, enforced here). With the cuts the
    plan is linear in steps. At 100 TB the pool stage is the only
    data-sized work (the same broadcast + WindowGroupLimit plan as
    knn_topk); every MMR step runs on K-sized frames per query. The
    oracle unrolls the identical steps in SQL; doubles match
    bit-for-bit."""
    from pyspark.sql import Window


    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    pool = (
        knn_join(_query_batch(spark, sf_dir), emb, k=MMR_POOL, metric="cosine")
        .select("query_id", "doc_id", F.col("score").alias("rel"))
        .join(emb.select("doc_id", F.col("embedding").alias("dv")), "doc_id")
        .localCheckpoint(eager=False)
    )
    w_rel = Window.partitionBy("query_id").orderBy(F.col("rel").desc(), "doc_id")
    steps = [
        pool.withColumn("rn", F.row_number().over(w_rel))
        .where(F.col("rn") == 1)
        .select(
            "query_id", "doc_id", "rel", "dv",
            F.lit(1).alias("mmr_rank"), F.col("rel").alias("mmr_score"),
        )
        .localCheckpoint(eager=False)
    ]
    for t in range(2, MMR_N + 1):
        sel = steps[0].select("query_id", "doc_id", "dv")
        for s in steps[1:]:
            sel = sel.unionByName(s.select("query_id", "doc_id", "dv"))
        remaining = pool.join(
            sel.select("query_id", "doc_id"), ["query_id", "doc_id"], "left_anti"
        )
        sims = (
            remaining.join(
                sel.select("query_id", F.col("dv").alias("sv")), "query_id"
            )
            .groupBy("query_id", "doc_id")
            # interpreted fold, NOT the Arrow pair kernel: each greedy
            # step aggregates <= pool x selected rows per query (tiny),
            # and the kernel's Python round trip per ITERATION measured
            # 0.67x in r12 — the size-aware rule keeps kernels off
            # iterative K-sized frames
            .agg(F.max(cosine_similarity(F.col("dv"), F.col("sv"))).alias("max_sim"))
        )
        score = (
            F.lit(MMR_LAMBDA) * F.col("rel")
            - F.lit(1.0 - MMR_LAMBDA) * F.col("max_sim")
        )
        w_sc = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), "doc_id"
        )
        steps.append(
            remaining.join(sims, ["query_id", "doc_id"])
            .withColumn("score", score)
            .withColumn("rn", F.row_number().over(w_sc))
            .where(F.col("rn") == 1)
            .select(
                "query_id", "doc_id", "rel", "dv",
                F.lit(t).alias("mmr_rank"), F.col("score").alias("mmr_score"),
            )
            .localCheckpoint(eager=False)
        )
    out = steps[0].select("query_id", "doc_id", "mmr_rank", "mmr_score")
    for s in steps[1:]:
        out = out.unionByName(s.select("query_id", "doc_id", "mmr_rank", "mmr_score"))
    return out.select(
        "query_id", "doc_id",
        F.col("mmr_rank").cast("int"),
        F.round("mmr_score", 4).alias("mmr_score"),
    )


_LI_SIZE, _LI_OVERLAP = 120, 30
_LI_NQ, _LI_K = 4, 5


def _li_oracle() -> str:
    from vector_search_ner_spark.operators.chunker import duck_chunk_sql
    from vector_search_ner_spark.plans.queries_mlops import _duck_embed_cte

    return f"""
WITH src AS ({duck_chunk_sql(_LI_SIZE, _LI_OVERLAP)}),
{_duck_embed_cte("src", "doc_id, chunk_index", "chunk")},
q AS (
  SELECT doc_id AS query_id, chunk_index AS qci, emb AS qv
  FROM e_vec WHERE doc_id < {_LI_NQ}
), m AS (
  SELECT q.query_id, d.doc_id, q.qci,
         MAX({duck_cosine("q.qv", "d.emb")}) AS m
  FROM e_vec d CROSS JOIN q
  GROUP BY q.query_id, d.doc_id, q.qci
), s AS (
  SELECT query_id, doc_id,
         CAST(SUM(CAST(round(m * 1000000.0) AS BIGINT)) AS BIGINT) AS score_micro
  FROM m GROUP BY query_id, doc_id
)
SELECT query_id, doc_id, score_micro, rank FROM (
  SELECT query_id, doc_id, score_micro,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY score_micro DESC, doc_id
         ) AS INTEGER) AS rank
  FROM s
) WHERE rank <= {_LI_K}
"""


@query("late_interaction_maxsim", oracle=_li_oracle())
def late_interaction_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction retrieval (ColBERT-style MaxSim, Khattab &
    Zaharia SIGIR 2020) over multi-vector documents: each doc is its
    chunk-embedding SET (120/30 sliding chunks, hashing embedder —
    the same contract as the index build), and
    score(q, d) = sum over q-chunks of max over d-chunks of cosine.
    Single-vector search collapses a long doc to one centroid; MaxSim
    lets each part of the query match its best-aligned part of the
    doc — the retrieval-quality upgrade modern engines (ColBERT/PLAID)
    buy with multi-vector indexes.

    Scale shape: the query chunk set broadcasts (n_queries * ~5 rows);
    the corpus chunk relation never shuffles for scoring — the MaxSim
    reduction is two HASH AGGS with map-side combine (max per
    (query, doc, q-chunk), then sum per (query, doc)), and the final
    top-k is the WindowGroupLimit partial pattern. Exactness: max over
    doubles is order-safe, and the per-(q-chunk) maxima are quantized
    to integer microunits BEFORE the sum, so the cross-partition sum
    is exact long arithmetic (the BM25/RRF discipline) — the oracle
    re-derives chunking, embedding, and both reductions closed-form."""
    from vector_search_ner_spark.embedder import HashingEmbedder
    from vector_search_ner_spark.operators.chunker import chunk_text
    from vector_search_ner_spark.operators.knn import topk_per_query

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    chunks = chunk_text(docs, size=_LI_SIZE, overlap=_LI_OVERLAP).select(
        "doc_id", "chunk_index", "chunk"
    )
    demb = chunks.select(
        "doc_id", "chunk_index", HashingEmbedder().embed_col(F.col("chunk")).alias("emb")
    )
    qemb = demb.where(F.col("doc_id") < _LI_NQ).select(
        F.col("doc_id").alias("query_id"),
        F.col("chunk_index").alias("qci"),
        F.col("emb").alias("qv"),
    )
    # per-pair cosine in the Arrow kernel (bit-identical; the chunk x
    # query-chunk cross product was all interpreted folds before)
    pairs = demb.crossJoin(F.broadcast(qemb)).select(
        "query_id",
        "doc_id",
        "qci",
        vk.pair_cosine(F.col("qv"), F.col("emb")).alias("sim"),
    )
    per_qc = pairs.groupBy("query_id", "doc_id", "qci").agg(F.max("sim").alias("m"))
    scored = (
        per_qc.select(
            "query_id",
            "doc_id",
            F.round(F.col("m") * 1e6).cast("long").alias("mi"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("mi").alias("score_micro"))
    )
    top = topk_per_query(scored, _LI_K, "query_id", "score_micro", "doc_id")
    return top.select(
        "query_id", "doc_id", "score_micro", F.col("rank").cast("int").alias("rank")
    )


# pruned MaxSim: per-(query, q-chunk) Hamming candidate budget over the
# BQ-encoded chunk codes; candidate DOCS = union over q-chunks
_MSB_OVERFETCH = 60


def _maxsim_ham_ctes() -> str:
    """Shared CTE prefix for the pruned-MaxSim oracles: chunk -> embed
    -> BQ chunk codes -> per-(query, q-chunk) Hamming distances over
    every corpus chunk (`ham`)."""
    from vector_search_ner_spark.operators.bq import WORD_BITS, duck_bq_word
    from vector_search_ner_spark.operators.chunker import duck_chunk_sql
    from vector_search_ner_spark.plans.queries_mlops import _duck_embed_cte

    return f"""src AS ({duck_chunk_sql(_LI_SIZE, _LI_OVERLAP)}),
{_duck_embed_cte("src", "doc_id, chunk_index", "chunk")},
codes AS (
  SELECT doc_id, chunk_index,
         {duck_bq_word("emb", WORD_BITS)} AS bq_hi,
         {duck_bq_word("emb", 0)} AS bq_lo
  FROM e_vec
), q AS (
  SELECT doc_id AS query_id, chunk_index AS qci, emb AS qv
  FROM e_vec WHERE doc_id < {_LI_NQ}
), qc AS (
  SELECT doc_id AS query_id, chunk_index AS qci, bq_hi AS q_hi, bq_lo AS q_lo
  FROM codes WHERE doc_id < {_LI_NQ}
), ham AS (
  SELECT qc.query_id, qc.qci, c.doc_id, c.chunk_index,
         CAST(bit_count(xor(c.bq_hi, qc.q_hi))
            + bit_count(xor(c.bq_lo, qc.q_lo)) AS INTEGER) AS hamming
  FROM codes c CROSS JOIN qc
)"""


def _maxsim_bq_ctes() -> str:
    """Shared CTE chain for the pruned-MaxSim oracles: the `ham`
    prefix -> per-q-chunk candidate cut at the default overfetch ->
    candidate doc set -> exact MaxSim over candidates only (`s` =
    final scores)."""
    return f"""{_maxsim_ham_ctes()}, cand AS (
  SELECT DISTINCT query_id, doc_id FROM (
    SELECT query_id, qci, doc_id, chunk_index,
           row_number() OVER (
             PARTITION BY query_id, qci
             ORDER BY hamming, doc_id, chunk_index) AS rn
    FROM ham
  ) WHERE rn <= {_MSB_OVERFETCH}
), m AS (
  SELECT q.query_id, cd.doc_id, q.qci,
         MAX({duck_cosine("q.qv", "d.emb")}) AS m
  FROM cand cd
  JOIN q ON q.query_id = cd.query_id
  JOIN e_vec d ON d.doc_id = cd.doc_id
  GROUP BY q.query_id, cd.doc_id, q.qci
), s AS (
  SELECT query_id, doc_id,
         CAST(SUM(CAST(round(m * 1000000.0) AS BIGINT)) AS BIGINT) AS score_micro
  FROM m GROUP BY query_id, doc_id
)"""


def _maxsim_bq_oracle() -> str:
    return f"""
WITH {_maxsim_bq_ctes()}
SELECT query_id, doc_id, score_micro, rank FROM (
  SELECT query_id, doc_id, score_micro,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY score_micro DESC, doc_id
         ) AS INTEGER) AS rank
  FROM s
) WHERE rank <= {_LI_K}
"""


def _maxsim_chunk_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multi-vector index relation: (doc_id, chunk_index, emb),
    checkpointed — it feeds the BQ code table, the query chunk set,
    AND the exact re-rank, and the explode+hash-agg embed pipeline
    must run once, not once per consumer (the edge-list lesson; the
    checkpoint also keeps the logical plan flat for the low-memory
    probe). At 100 TB this relation is the persisted index the store
    maintains incrementally (`build_chunk_index`), not a per-query
    derivation."""
    from vector_search_ner_spark.embedder import HashingEmbedder
    from vector_search_ner_spark.operators.chunker import chunk_text

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    chunks = chunk_text(docs, size=_LI_SIZE, overlap=_LI_OVERLAP).select(
        "doc_id", "chunk_index", "chunk"
    )
    return chunks.select(
        "doc_id",
        "chunk_index",
        HashingEmbedder().embed_col(F.col("chunk")).alias("emb"),
    ).localCheckpoint(eager=True)


@query("ann_maxsim_bq_topk", oracle=_maxsim_bq_oracle())
def ann_maxsim_bq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRUNED late-interaction retrieval — the PLAID shape (Santhanam
    et al., CIKM 2022) that makes MaxSim serve at scale, closing the
    one gap in the recall ladder: `late_interaction_maxsim` is exact
    and evaluates |corpus chunks| x |query chunks| cosines, the same
    full-scan the reference's HNSW index exists to avoid. Here the
    CHUNK embeddings are BQ-encoded (operators/bq.py — 16 B/chunk,
    256x compression), each query chunk generates a Hamming
    top-`overfetch` candidate CHUNK list over the code table, the
    candidate DOC set is the union over query chunks (a doc is a
    candidate iff ANY of its chunks sign-matches ANY query chunk),
    and the exact micro-quantized MaxSim re-ranks candidates only.

    Scale shape: candidate generation touches ONLY the code table with
    the query codes broadcast (XOR+popcount, WindowGroupLimit partial
    cut per (query, q-chunk)); the exact re-rank reads full chunk
    vectors for the broadcast candidate-doc list only — the corpus
    chunk relation is never shuffled and never fully scanned in float.
    Accuracy is measured, not asserted: `ann_maxsim_bq_recall_report`
    pins recall vs the exact ground truth, mirroring
    `ann_bq_recall_report` for the single-vector tier."""
    from pyspark.sql import Window

    from vector_search_ner_spark.operators import bq
    from vector_search_ner_spark.operators.knn import topk_per_query

    demb = _maxsim_chunk_index(spark, sf_dir)
    codes = bq.bq_encode(demb, id_col=["doc_id", "chunk_index"], vec_col="emb")
    qcodes = codes.where(F.col("doc_id") < _LI_NQ).select(
        F.col("doc_id").alias("query_id"),
        F.col("chunk_index").alias("qci"),
        F.col("bq_hi").alias("q_hi"),
        F.col("bq_lo").alias("q_lo"),
    )
    ham = codes.crossJoin(F.broadcast(qcodes)).select(
        "query_id",
        "qci",
        "doc_id",
        "chunk_index",
        bq.hamming64(
            F.col("bq_hi"), F.col("bq_lo"), F.col("q_hi"), F.col("q_lo")
        ).alias("hamming"),
    )
    w_c = Window.partitionBy("query_id", "qci").orderBy(
        "hamming", "doc_id", "chunk_index"
    )
    cand = (
        ham.withColumn("rn", F.row_number().over(w_c))
        .where(F.col("rn") <= _MSB_OVERFETCH)
        .select("query_id", "doc_id")
        .distinct()
    )
    qemb = demb.where(F.col("doc_id") < _LI_NQ).select(
        F.col("doc_id").alias("query_id"),
        F.col("chunk_index").alias("qci"),
        F.col("emb").alias("qv"),
    )
    pairs = (
        demb.join(F.broadcast(cand), "doc_id")
        .join(F.broadcast(qemb), "query_id")
        .select(
            "query_id",
            "doc_id",
            "qci",
            vk.pair_cosine(F.col("qv"), F.col("emb")).alias("sim"),
        )
    )
    per_qc = pairs.groupBy("query_id", "doc_id", "qci").agg(F.max("sim").alias("m"))
    scored = (
        per_qc.select(
            "query_id",
            "doc_id",
            F.round(F.col("m") * 1e6).cast("long").alias("mi"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("mi").alias("score_micro"))
    )
    top = topk_per_query(scored, _LI_K, "query_id", "score_micro", "doc_id")
    return top.select(
        "query_id", "doc_id", "score_micro", F.col("rank").cast("int").alias("rank")
    )


def _maxsim_recall_oracle() -> str:
    return f"""
WITH {_maxsim_bq_ctes()},
pruned_top AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id,
           row_number() OVER (
             PARTITION BY query_id ORDER BY score_micro DESC, doc_id) AS rank
    FROM s
  ) WHERE rank <= {_LI_K}
), em AS (
  SELECT q.query_id, d.doc_id, q.qci,
         MAX({duck_cosine("q.qv", "d.emb")}) AS m
  FROM e_vec d CROSS JOIN q
  GROUP BY q.query_id, d.doc_id, q.qci
), es AS (
  SELECT query_id, doc_id,
         CAST(SUM(CAST(round(m * 1000000.0) AS BIGINT)) AS BIGINT) AS score_micro
  FROM em GROUP BY query_id, doc_id
), exact_top AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id,
           row_number() OVER (
             PARTITION BY query_id ORDER BY score_micro DESC, doc_id) AS rank
    FROM es
  ) WHERE rank <= {_LI_K}
)
SELECT e.query_id,
       CAST(COUNT(p.doc_id) AS INTEGER) AS n_hit,
       ROUND(COUNT(p.doc_id) / CAST(COUNT(*) AS DOUBLE), 4) AS recall
FROM exact_top e
LEFT JOIN pruned_top p
  ON e.query_id = p.query_id AND e.doc_id = p.doc_id
GROUP BY e.query_id
"""


@query("ann_maxsim_bq_recall_report", oracle=_maxsim_recall_oracle())
def ann_maxsim_bq_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the BQ-pruned MaxSim tier against the EXACT MaxSim
    ground truth, per query — the tuning-curve discipline every
    approximate tier in this engine carries (`ann_bq_recall_report`,
    `ann_recall_report`, `dedup_lsh_eval_report`): an approximate
    operator without a measured accuracy bound is a guess, not an
    index. Denominator = the ACTUAL exact-top row count per query
    (never k * n_queries — short corpora would silently diverge from
    the oracle). Both legs are deterministic, so this is fully
    oracle-checkable end to end, chunking and quantizer included."""
    exact = late_interaction_maxsim(spark, sf_dir).select("query_id", "doc_id")
    pruned = ann_maxsim_bq_topk(spark, sf_dir).select(
        "query_id", F.col("doc_id").alias("p_doc")
    )
    joined = exact.join(
        pruned,
        (exact.query_id == pruned.query_id) & (exact.doc_id == pruned.p_doc),
        "left",
    ).select(exact.query_id, "doc_id", "p_doc")
    return joined.groupBy("query_id").agg(
        F.count("p_doc").cast("int").alias("n_hit"),
        F.round(F.count("p_doc") / F.count(F.lit(1)).cast("double"), 4).alias(
            "recall"
        ),
    )


# the overfetch sweep for the MaxSim tuning curve — the accuracy/cost
# dial of the pruned tier, like nprobe for IVF and ef for HNSW
_MSB_SWEEP = [15, 30, 60, 120]


def _maxsim_curve_oracle() -> str:
    sweep = ", ".join(f"({p})" for p in _MSB_SWEEP)
    return f"""
WITH {_maxsim_ham_ctes()}, ranked AS (
  SELECT query_id, qci, doc_id,
         row_number() OVER (
           PARTITION BY query_id, qci
           ORDER BY hamming, doc_id, chunk_index) AS rn
  FROM ham
), sweep(overfetch) AS (VALUES {sweep}),
cand AS (
  SELECT DISTINCT s.overfetch, r.query_id, r.doc_id
  FROM ranked r JOIN sweep s ON r.rn <= s.overfetch
), m AS (
  SELECT cd.overfetch, q.query_id, cd.doc_id, q.qci,
         MAX({duck_cosine("q.qv", "d.emb")}) AS m
  FROM cand cd
  JOIN q ON q.query_id = cd.query_id
  JOIN e_vec d ON d.doc_id = cd.doc_id
  GROUP BY cd.overfetch, q.query_id, cd.doc_id, q.qci
), s AS (
  SELECT overfetch, query_id, doc_id,
         CAST(SUM(CAST(round(m * 1000000.0) AS BIGINT)) AS BIGINT) AS score_micro
  FROM m GROUP BY overfetch, query_id, doc_id
), pruned_top AS (
  SELECT overfetch, query_id, doc_id FROM (
    SELECT overfetch, query_id, doc_id,
           row_number() OVER (
             PARTITION BY overfetch, query_id
             ORDER BY score_micro DESC, doc_id) AS rank
    FROM s
  ) WHERE rank <= {_LI_K}
), em AS (
  SELECT q.query_id, d.doc_id, q.qci,
         MAX({duck_cosine("q.qv", "d.emb")}) AS m
  FROM e_vec d CROSS JOIN q
  GROUP BY q.query_id, d.doc_id, q.qci
), es AS (
  SELECT query_id, doc_id,
         CAST(SUM(CAST(round(m * 1000000.0) AS BIGINT)) AS BIGINT) AS score_micro
  FROM em GROUP BY query_id, doc_id
), exact_top AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id,
           row_number() OVER (
             PARTITION BY query_id ORDER BY score_micro DESC, doc_id) AS rank
    FROM es
  ) WHERE rank <= {_LI_K}
)
SELECT sw.overfetch,
       CAST((SELECT COUNT(*) FROM cand c WHERE c.overfetch = sw.overfetch)
            AS INTEGER) AS n_cand_docs,
       CAST((SELECT COUNT(*) FROM pruned_top p JOIN exact_top e
             ON p.query_id = e.query_id AND p.doc_id = e.doc_id
             WHERE p.overfetch = sw.overfetch) AS INTEGER) AS n_hit,
       ROUND((SELECT COUNT(*) FROM pruned_top p JOIN exact_top e
              ON p.query_id = e.query_id AND p.doc_id = e.doc_id
              WHERE p.overfetch = sw.overfetch)
             / CAST((SELECT COUNT(*) FROM exact_top) AS DOUBLE), 4) AS recall
FROM sweep sw
"""


@query("ann_maxsim_overfetch_curve", oracle=_maxsim_curve_oracle())
def ann_maxsim_overfetch_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pruned-MaxSim TUNING CURVE — the overfetch dial measured
    end to end, completing the discipline that every approximate tier
    here carries (`ann_nprobe_tuning_curve` for IVF, this for the
    multi-vector tier): ONE plan sweeps the per-q-chunk Hamming
    candidate budget over {15, 30, 60, 120}, reporting per setting the
    candidate-doc rows re-ranked (the cost axis — how much float work
    the exact MaxSim pays) and recall@k vs the exact MaxSim ground
    truth (the accuracy axis). You read the curve and pick the knee.
    Implementation: the per-(query, q-chunk) Hamming rank computes
    ONCE with the max budget as the LITERAL WindowGroupLimit bound,
    a tiny broadcast sweep-values join replicates candidates per
    setting, and the exact re-rank/ground-truth legs are the same
    plans as `ann_maxsim_bq_topk` / `late_interaction_maxsim` keyed by
    (overfetch, query). Deterministic end to end -> full oracle;
    denominator = actual exact-top rows."""
    from pyspark.sql import Window

    from vector_search_ner_spark.operators import bq

    demb = _maxsim_chunk_index(spark, sf_dir)
    codes = bq.bq_encode(demb, id_col=["doc_id", "chunk_index"], vec_col="emb")
    qcodes = codes.where(F.col("doc_id") < _LI_NQ).select(
        F.col("doc_id").alias("query_id"),
        F.col("chunk_index").alias("qci"),
        F.col("bq_hi").alias("q_hi"),
        F.col("bq_lo").alias("q_lo"),
    )
    ham = codes.crossJoin(F.broadcast(qcodes)).select(
        "query_id",
        "qci",
        "doc_id",
        "chunk_index",
        bq.hamming64(
            F.col("bq_hi"), F.col("bq_lo"), F.col("q_hi"), F.col("q_lo")
        ).alias("hamming"),
    )
    w_c = Window.partitionBy("query_id", "qci").orderBy(
        "hamming", "doc_id", "chunk_index"
    )
    max_budget = max(_MSB_SWEEP)
    ranked = (
        ham.withColumn("rn", F.row_number().over(w_c))
        # literal bound first so WindowGroupLimit fires; the sweep join
        # below applies the per-setting bound
        .where(F.col("rn") <= max_budget)
        .select("query_id", "qci", "doc_id", "rn")
    )
    sweep = spark.createDataFrame([(p,) for p in _MSB_SWEEP], "overfetch int")
    cand = (
        ranked.join(F.broadcast(sweep), ranked.rn <= sweep.overfetch)
        .select("overfetch", "query_id", "doc_id")
        .distinct()
        .localCheckpoint(eager=True)  # feeds the cost agg AND the
        # re-rank join; the Hamming scan must not re-run per consumer
    )
    qemb = demb.where(F.col("doc_id") < _LI_NQ).select(
        F.col("doc_id").alias("query_id"),
        F.col("chunk_index").alias("qci"),
        F.col("emb").alias("qv"),
    )
    # ONE MaxSim scoring pass serves BOTH legs (§2.4 shared subplan).
    # The exact ground truth needs score_micro for every (query, doc);
    # the pruned re-rank aggregates over the SAME full chunk set of
    # each candidate doc, so its per-(query, doc) score is the
    # identical value — joining the candidate list against the exact
    # scored frame replaces the whole per-overfetch cosine re-rank
    # (and the previous shape additionally re-ran chunk+embed via a
    # late_interaction_maxsim call for the exact leg). Bit-identical:
    # same expressions, same reduction order.
    from vector_search_ner_spark.operators.knn import topk_per_query

    ex_pairs = demb.crossJoin(F.broadcast(qemb)).select(
        "query_id",
        "doc_id",
        "qci",
        vk.pair_cosine(F.col("qv"), F.col("emb")).alias("sim"),
    )
    ex_scored = (
        ex_pairs.groupBy("query_id", "doc_id", "qci")
        .agg(F.max("sim").alias("m"))
        .select(
            "query_id", "doc_id", F.round(F.col("m") * 1e6).cast("long").alias("mi")
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("mi").alias("score_micro"))
        .localCheckpoint(eager=True)  # consumed by the exact top AND
        # the per-overfetch candidate join
    )
    scored = ex_scored.join(F.broadcast(cand), ["query_id", "doc_id"]).select(
        "overfetch", "query_id", "doc_id", "score_micro"
    )
    w_t = Window.partitionBy("overfetch", "query_id").orderBy(
        F.col("score_micro").desc(), "doc_id"
    )
    pruned_top = (
        scored.withColumn("rank", F.row_number().over(w_t))
        .where(F.col("rank") <= _LI_K)
        .select("overfetch", "query_id", "doc_id")
    )
    exact = (
        topk_per_query(ex_scored, _LI_K, "query_id", "score_micro", "doc_id")
        .select(F.col("query_id").alias("eq_id"), F.col("doc_id").alias("edoc"))
    )
    n_exact = exact.count()
    hits = (
        pruned_top.join(
            exact,
            (F.col("query_id") == F.col("eq_id")) & (F.col("doc_id") == F.col("edoc")),
            "left_semi",
        )
        .groupBy("overfetch")
        .agg(F.count(F.lit(1)).cast("int").alias("n_hit"))
    )
    return (
        cand.groupBy("overfetch")
        .agg(F.count(F.lit(1)).cast("int").alias("n_cand_docs"))
        .join(hits, "overfetch", "left")
        .select(
            "overfetch",
            "n_cand_docs",
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("int").alias("n_hit"),
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0)) / F.lit(float(n_exact)), 4
            ).alias("recall"),
        )
    )


def _chunk_upsert_oracle() -> str:
    from vector_search_ner_spark.operators.chunker import duck_chunk_sql
    from vector_search_ner_spark.plans.queries_mlops import _duck_embed_cte

    return f"""
WITH upd AS (
  SELECT doc_id, text || ' refreshed update' AS text
  FROM documents WHERE doc_id % 50 = 0
), nw AS (
  SELECT doc_id + 10000000 AS doc_id, text FROM documents WHERE doc_id < 5
), merged AS (
  SELECT doc_id, text, 'new' AS origin FROM nw
  UNION ALL
  SELECT doc_id, text, 'updated' AS origin FROM upd
  UNION ALL
  SELECT b.doc_id, b.text, 'kept' AS origin
  FROM documents b ANTI JOIN upd u ON b.doc_id = u.doc_id
), src AS ({duck_chunk_sql(_LI_SIZE, _LI_OVERLAP, "merged")}),
{_duck_embed_cte("src", "doc_id, chunk_index", "chunk")}
SELECT m.doc_id, m.origin,
       CAST(COUNT(*) AS INTEGER) AS n_chunks,
       CAST(SUM(CAST(round(v.emb[1] * 1000000.0) AS BIGINT)) AS BIGINT)
         AS c0_micro_sum
FROM e_vec v JOIN merged m ON v.doc_id = m.doc_id
GROUP BY m.doc_id, m.origin
"""


@query("chunk_index_incremental_upsert", oracle=_chunk_upsert_oracle())
def chunk_index_incremental_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL maintenance of the MULTI-VECTOR chunk index — the
    operation `_maxsim_chunk_index`'s docstring promises ("the
    persisted index the store maintains incrementally"): a refresh
    batch (2% modified docs + a few brand-new ids, the
    `vecstore_incremental_upsert` fixture) is chunked and embedded
    ALONE — O(|delta| * chunks/doc), never O(|corpus|) — and merged
    with the persisted base generation. The merge semantic differs
    from the single-vector store's per-row latest-wins: an updated
    doc's text re-chunks to a DIFFERENT number of chunks, so the unit
    of replacement is the whole per-doc chunk GROUP — a broadcast
    anti join of the base index against the tiny updated-id set
    (delete-the-group), then union with the delta's fresh chunk rows
    (insert-the-group). Per-doc report: origin, chunk count, and an
    integer-microunit checksum over the group's first embedding
    component (exact across engines). Base chunk rows are READ from
    the checkpointed index relation, never recomputed; full oracle
    re-derives merge + chunking + embedding end to end."""
    from vector_search_ner_spark.embedder import HashingEmbedder
    from vector_search_ner_spark.operators.chunker import chunk_text

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    upd = docs.where(F.col("doc_id") % 50 == 0).select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" refreshed update")).alias("text"),
        F.lit("updated").alias("origin"),
    )
    new = docs.where(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        "text",
        F.lit("new").alias("origin"),
    )
    delta_chunks = chunk_text(
        upd.unionByName(new), size=_LI_SIZE, overlap=_LI_OVERLAP
    ).select(
        "doc_id",
        "origin",
        "chunk_index",
        HashingEmbedder().embed_col(F.col("chunk")).alias("emb"),
    )
    # the persisted base generation: group-level delete of updated ids
    # (tiny id set broadcast into the anti join), base rows untouched
    kept = _maxsim_chunk_index(spark, sf_dir).join(
        F.broadcast(upd.select("doc_id")), "doc_id", "left_anti"
    ).select("doc_id", F.lit("kept").alias("origin"), "chunk_index", "emb")
    merged = kept.unionByName(delta_chunks)
    return merged.groupBy("doc_id", "origin").agg(
        F.count(F.lit(1)).cast("int").alias("n_chunks"),
        F.sum(
            F.round(F.element_at("emb", 1) * 1e6).cast("long")
        ).cast("long").alias("c0_micro_sum"),
    )

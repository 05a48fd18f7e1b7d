"""Product quantization (PQ, Jégou/Douze/Schmid, "Product Quantization
for Nearest Neighbor Search", TPAMI 2011) — the memory-bound ANN scale
path, next to IVF (compute pruning) and LSH (candidate pruning) in
operators/ann.py. The IVF∘PQ composition mirrors that paper's IVFADC
system re-expressed as DataFrame joins.

A 64-dim float vector (256 B) is encoded as M=8 one-byte codes: the
vector is split into 8 contiguous 8-dim subvectors, each replaced by
the id of its nearest codeword in a per-subspace codebook of K=16
entries. Query-time ranking is ADC (asymmetric distance computation):
the query stays exact; its distance to a doc is the sum over subspaces
of the precomputed query↔codeword squared-L2 for the doc's code —
a K×M lookup table per query, built once, then every doc costs M adds.
At 100 TB this is the difference between scanning 256 B/vec and
8 B/vec: the codes table fits in memory 32× sooner, and the hot loop
is table lookups instead of float math.

Codebook here is DETERMINISTIC (codewords = the subvectors of the
first K vectors by id — same device as ivf_fixed_build), so encode AND
search are exactly reproducible in ANSI SQL and the whole path is
oracle-checked; a KMeans-trained codebook would only move the codeword
values, not the mechanics. Replaces the reference's hnswlib graph
(/root/reference/main.py:53-61) on the recall-for-bytes axis.

Determinism: subspace distances fold sequentially (F.aggregate ==
DuckDB list_sum(list_transform), see functions/vector.py); the
8 partial distances are summed in explicit subspace order (d0+d1+…+d7,
left-assoc in both engines), never via an unordered SUM over doubles;
argmin ties break on the lower codeword id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DIM = 64
M = 8          # subspaces
SUB = DIM // M  # dims per subspace
K = 16         # codewords per subspace


def _sq_l2(a: Column, b: Column) -> Column:
    """Sequential-fold squared L2 (no sqrt — monotone for argmin/rank)."""
    diffs = F.zip_with(
        a, b,
        lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double")),
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v)


def _sub(vec: str, m: str = "m") -> Column:
    return F.expr(f"slice({vec}, {m} * {SUB} + 1, {SUB})")


def _explode_m(df: DataFrame) -> DataFrame:
    return df.withColumn("m", F.explode(F.sequence(F.lit(0), F.lit(M - 1))))


def build_codebook(emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(m, k, cw): per-subspace codebook from the first K vectors by id."""
    return _explode_m(emb.where(F.col(id_col) < K)).select(
        "m", F.col(id_col).cast("int").alias("k"), _sub(vec_col).alias("cw")
    )


def pq_encode(
    emb: DataFrame, codebook: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(doc_id, m, code): nearest codeword per (vector, subspace)."""
    sub = _explode_m(emb).select(F.col(id_col).alias("doc_id"), "m", _sub(vec_col).alias("sv"))
    scored = sub.join(F.broadcast(codebook), "m").withColumn(
        "sqd", _sq_l2(F.col("sv"), F.col("cw"))
    )
    # argmin as MIN(struct(sqd, k)) — lexicographic struct ordering ==
    # ORDER BY sqd, k (same tie-break as the oracle's row_number), but
    # partial-aggregates map-side: the shuffle carries one row per
    # (doc, subspace) instead of sorting all K candidates per group
    return (
        scored.groupBy("doc_id", "m")
        .agg(F.min(F.struct("sqd", "k")).alias("best"))
        .select("doc_id", "m", F.col("best.k").alias("code"))
    )


def _query_lut(queries: DataFrame, codebook: DataFrame, query_id: str, query_vec: str) -> DataFrame:
    """Per-query (subspace, codeword) squared-L2 lookup table."""
    return (
        queries.crossJoin(F.broadcast(codebook))
        .withColumn("pd", _sq_l2(_sub(query_vec), F.col("cw")))
        .select(
            F.col(query_id).alias("lut_q"),
            F.col("m").alias("lut_m"),
            F.col("k").alias("lut_k"),
            "pd",
        )
    )


def _adc_rank(joined: DataFrame, query_id: str, k_results: int) -> DataFrame:
    """(query, doc, lut_m, pd) rows → ordered-sum distance → top-k."""
    parts = joined.groupBy(query_id, "doc_id").agg(
        *[
            F.sum(F.when(F.col("lut_m") == i, F.col("pd")).otherwise(F.lit(0.0))).alias(f"d{i}")
            for i in range(M)
        ]
    )
    total = F.col("d0")
    for i in range(1, M):
        total = total + F.col(f"d{i}")
    fin = parts.withColumn("adist_raw", total)
    w = Window.partitionBy(query_id).orderBy("adist_raw", "doc_id")
    return (
        fin.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k_results)
        .select(query_id, "doc_id", "rank", F.round("adist_raw", 6).alias("adist"))
    )


def pq_adc_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebook: DataFrame,
    k_results: int,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """ADC top-k over ALL docs: build the per-query LUT, join it to the
    doc codes, sum partials in explicit subspace order, rank."""
    lut = _query_lut(queries, codebook, query_id, query_vec)
    joined = codes.join(
        lut, (F.col("m") == F.col("lut_m")) & (F.col("code") == F.col("lut_k"))
    ).withColumn(query_id, F.col("lut_q"))
    return _adc_rank(joined, query_id, k_results)


def exact_refine_topk(
    cand: DataFrame,
    queries: DataFrame,
    emb: DataFrame,
    k_results: int,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Over-fetch → exact re-rank (the reference's own k*3 heuristic,
    /root/reference/main.py:158-165, and the 'R' of IVFADC+R, Jégou
    2011 §V): `cand` is (query_id, doc_id) over-fetched from an
    APPROXIMATE ranker; re-rank those candidates by exact L2 on the
    full vectors and keep k. Only |cand| full vectors are read —
    k*overfetch per query, not the corpus — so the refine cost is
    negligible while recovering the recall the quantizer lost."""
    from vector_search_ner_spark.functions.vector import l2_distance

    qv = queries.select(query_id, query_vec)
    dv = emb.select(F.col(id_col).alias("doc_id"), F.col(vec_col).alias("__dv"))
    exact = (
        cand.select(query_id, "doc_id")
        .join(F.broadcast(qv), query_id)
        .join(dv, "doc_id")
        .withColumn("distance", l2_distance(F.col(query_vec), F.col("__dv")))
    )
    w = Window.partitionBy(query_id).orderBy("distance", "doc_id")
    return (
        exact.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k_results)
        .select(query_id, "doc_id", "rank", F.round("distance", 6).alias("distance"))
    )


def pq_adc_topk_pairs(
    queries: DataFrame,
    pairs: DataFrame,
    codes: DataFrame,
    codebook: DataFrame,
    k_results: int,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """ADC top-k restricted to candidate (query, doc) `pairs` — the
    IVF∘PQ composition: IVF probing yields the pairs, ADC ranks them.
    Only candidate codes join the LUT, so the scan cost is
    |candidates|, not |corpus|."""
    joined = (
        pairs.join(codes, "doc_id")
        .join(
            _query_lut(queries, codebook, query_id, query_vec),
            (F.col("m") == F.col("lut_m"))
            & (F.col("code") == F.col("lut_k"))
            & (F.col(query_id) == F.col("lut_q")),
        )
    )
    return _adc_rank(joined, query_id, k_results)


# ---------------------------------------------------------------------------
# DuckDB oracle fragments (same folds, same tie-breaks, same add order)
# ---------------------------------------------------------------------------

_DUCK_SQD = (
    "list_sum(list_transform(range(1, {n}), i -> "
    "(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) "
    "* (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))))"
)


def duck_pq_ctes() -> str:
    """Shared CTE text: codebook (cb), doc subvectors, argmin codes."""
    sqd = _DUCK_SQD.format(n=SUB + 1, a="d.sv", b="c.cw")
    return f"""
cb AS (
  SELECT m.m, CAST(e.vec_id AS INTEGER) AS k,
         e.embedding[m.m * {SUB} + 1 : m.m * {SUB} + {SUB}] AS cw
  FROM embeddings e, (SELECT unnest(range(0, {M})) AS m) m
  WHERE e.vec_id < {K}
),
docsub AS (
  SELECT e.vec_id AS doc_id, m.m,
         e.embedding[m.m * {SUB} + 1 : m.m * {SUB} + {SUB}] AS sv
  FROM embeddings e, (SELECT unnest(range(0, {M})) AS m) m
),
scored AS (
  SELECT d.doc_id, d.m, c.k, {sqd} AS sqd
  FROM docsub d JOIN cb c ON d.m = c.m
),
codes AS (
  SELECT doc_id, m, k AS code FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id, m ORDER BY sqd, k) AS rn
    FROM scored
  ) WHERE rn = 1
)"""


def duck_pq_encode_sql() -> str:
    return f"WITH {duck_pq_ctes()}\nSELECT doc_id, m, code FROM codes"


def _duck_refine_tail(fetch_k: int, refine_k: int) -> str:
    """Append after a `fin(query_id, doc_id, adist_raw)` CTE: take the
    approximate top fetch_k, re-rank those by exact L2 on the full
    vectors, keep refine_k — the SQL twin of exact_refine_topk."""
    from vector_search_ner_spark.functions.vector import duck_l2

    return f""",
cand AS (
  SELECT query_id, doc_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adist_raw, doc_id) AS rn
    FROM fin
  ) WHERE rn <= {fetch_k}
),
exact AS (
  SELECT c.query_id, c.doc_id, {duck_l2("q.embedding", "d.embedding")} AS dist
  FROM cand c
  JOIN embeddings q ON q.vec_id = c.query_id
  JOIN embeddings d ON d.vec_id = c.doc_id
)
SELECT query_id, doc_id, CAST(rn AS INTEGER) AS rank, ROUND(dist, 6) AS distance
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dist, doc_id) AS rn
  FROM exact
) WHERE rn <= {refine_k}"""


def duck_pq_adc_sql(n_queries: int, k_results: int, refine_k: int | None = None) -> str:
    """ADC top-k oracle; with refine_k set, k_results is the over-fetch
    size and the exact-re-rank tail emits refine_k rows per query."""
    pd = _DUCK_SQD.format(n=SUB + 1, a="q.sv", b="c.cw")
    d_cols = ",\n         ".join(
        f"SUM(CASE WHEN l.m = {i} THEN l.pd ELSE 0.0 END) AS d{i}" for i in range(M)
    )
    add = "d0"
    for i in range(1, M):
        add = f"({add} + d{i})"
    body = f"""WITH {duck_pq_ctes()},
qlut AS (
  SELECT q.query_id, c.m, c.k, {pd} AS pd
  FROM (
    SELECT e.vec_id AS query_id, m.m,
           e.embedding[m.m * {SUB} + 1 : m.m * {SUB} + {SUB}] AS sv
    FROM embeddings e, (SELECT unnest(range(0, {M})) AS m) m
    WHERE e.vec_id < {n_queries}
  ) q JOIN cb c ON q.m = c.m
),
parts AS (
  SELECT l.query_id, cd.doc_id,
         {d_cols}
  FROM codes cd JOIN qlut l ON l.m = cd.m AND l.k = cd.code
  GROUP BY l.query_id, cd.doc_id
),
fin AS (SELECT query_id, doc_id, {add} AS adist_raw FROM parts)"""
    if refine_k is not None:
        return body + _duck_refine_tail(k_results, refine_k)
    return body + f"""
SELECT query_id, doc_id, CAST(rn AS INTEGER) AS rank, ROUND(adist_raw, 6) AS adist
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adist_raw, doc_id) AS rn
  FROM fin
) WHERE rn <= {k_results}"""


def duck_ivf_pq_sql(
    n_queries: int, n_cent: int, nprobe: int, k_results: int, refine_k: int | None = None
) -> str:
    """IVF∘PQ oracle: fixed-centroid probing narrows candidates, ADC
    ranks them. Reuses the PQ CTEs plus the fixed-IVF assignment SQL.
    With refine_k set, the exact-re-rank tail (IVFADC+R) is appended."""
    from vector_search_ner_spark.functions.vector import duck_l2

    pd = _DUCK_SQD.format(n=SUB + 1, a="q.sv", b="c.cw")
    d_cols = ",\n         ".join(
        f"SUM(CASE WHEN l.m = {i} THEN l.pd ELSE 0.0 END) AS d{i}" for i in range(M)
    )
    add = "d0"
    for i in range(1, M):
        add = f"({add} + d{i})"
    body = f"""WITH {duck_pq_ctes()},
cent AS (
  SELECT CAST(vec_id AS INTEGER) AS cluster_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS centroid
  FROM embeddings WHERE vec_id < {n_cent}
),
assigned AS (
  SELECT doc_id, cluster_id FROM (
    SELECT d.vec_id AS doc_id, c.cluster_id, row_number() OVER (
      PARTITION BY d.vec_id ORDER BY {duck_l2("d.embedding", "c.centroid")}, c.cluster_id) AS rn
    FROM embeddings d CROSS JOIN cent c
  ) WHERE rn = 1
),
probes AS (
  SELECT query_id, cluster_id FROM (
    SELECT q.vec_id AS query_id, c.cluster_id, row_number() OVER (
      PARTITION BY q.vec_id ORDER BY {duck_l2("q.embedding", "c.centroid")}, c.cluster_id) AS rn
    FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < {n_queries}
  ) WHERE rn <= {nprobe}
),
pairs AS (
  SELECT p.query_id, a.doc_id FROM probes p JOIN assigned a ON p.cluster_id = a.cluster_id
),
qlut AS (
  SELECT q.query_id, c.m, c.k, {pd} AS pd
  FROM (
    SELECT e.vec_id AS query_id, m.m,
           e.embedding[m.m * {SUB} + 1 : m.m * {SUB} + {SUB}] AS sv
    FROM embeddings e, (SELECT unnest(range(0, {M})) AS m) m
    WHERE e.vec_id < {n_queries}
  ) q JOIN cb c ON q.m = c.m
),
parts AS (
  SELECT pr.query_id, pr.doc_id,
         {d_cols}
  FROM pairs pr
  JOIN codes cd ON cd.doc_id = pr.doc_id
  JOIN qlut l ON l.m = cd.m AND l.k = cd.code AND l.query_id = pr.query_id
  GROUP BY pr.query_id, pr.doc_id
),
fin AS (SELECT query_id, doc_id, {add} AS adist_raw FROM parts)"""
    if refine_k is not None:
        return body + _duck_refine_tail(k_results, refine_k)
    return body + f"""
SELECT query_id, doc_id, CAST(rn AS INTEGER) AS rank, ROUND(adist_raw, 6) AS adist
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adist_raw, doc_id) AS rn
  FROM fin
) WHERE rn <= {k_results}"""

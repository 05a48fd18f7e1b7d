"""The flagship composite: multi-stage filtered retrieval with
progressive relaxation + hybrid score fusion + top-5 rank — the batch
re-expression of the reference's chat pipeline E1
(/root/reference/main.py:416-488: NER parse → staged search 329-411 →
rerank 252-324 → top-5 project 455-469).

Differences, declared:
  * batch (a DataFrame of queries), not request/response;
  * the eager per-request `len(results) < k` stage gates become
    per-query deficit semi-joins — one lazy plan, no driver actions;
  * the LLM scorer is replaced by the deterministic cosine model score
    (LLM impls stay behind the extractor interface, off the oracle path);
  * metadata-overlap score mirrors compute_ner_similarity
    (main.py:225-234): sum of {0,1} matches over 3 keys.

Query batch: 4 query vectors with a search term + target label each;
term 'graph' is out-of-vocabulary on purpose so that query exercises
the full relaxation cascade down to the unfiltered fallback
(main.py:400-407).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_search_ner_spark.functions.vector import cosine_similarity, duck_cosine
from vector_search_ner_spark.operators.fusion import fuse_scores, overlap_score, rank_topn
from vector_search_ner_spark.operators.knn import topk_per_query
from vector_search_ner_spark.operators.staged import merge_stages_first_wins, queries_below
from vector_search_ner_spark.registry import query
from vector_search_ner_spark.sources.catalog import load_table

STRICT_K = 5
FALLBACK_K = 15
FINAL_N = 5
# 'dup' is rare (~5% of docs) → its query fills via stage B relaxation;
# 'graph' is out-of-vocabulary → full fallback to the unfiltered stage C;
# 'neardup' never appears verbatim but its SYNONYM 'dup' does → fills
# (partially) via the synonym stage S, then tops up from stage C —
# exercising the reference's stage ④ (main.py:386-397).
TERMS = {0: "vector", 1: "stream", 2: "dup", 3: "graph", 4: "neardup"}
# (term, synonym, syn_idx) — the static impl of the LLM synonym
# expansion (main.py:186-220); earlier syn_idx wins the stage-S merge.
SYNONYMS = [
    ("neardup", "dup", 0),
    ("vector", "merge", 0),
    ("vector", "batch", 1),
    ("stream", "row", 0),
    ("stream", "filter", 1),
]


def _term_case_sql() -> str:
    whens = " ".join(f"WHEN {k} THEN '{v}'" for k, v in TERMS.items())
    return f"CASE vec_id {whens} ELSE 'none' END"


def _queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    term = F.lit(None).cast("string")
    expr = None
    for k, v in TERMS.items():
        expr = F.when(F.col("vec_id") == k, v) if expr is None else expr.when(F.col("vec_id") == k, v)
    return emb.where(F.col("vec_id") < len(TERMS)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        expr.otherwise("none").alias("term"),
        (F.col("vec_id") + 2).cast("int").alias("target_label"),
    )


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    return d.join(e, d.doc_id == e.vec_id).select("doc_id", "text", "lang", "embedding", "label")


@query(
    "staged_retrieval_pipeline",
    oracle=f"""
WITH docs AS (
  SELECT d.doc_id, d.text, d.lang, e.embedding, e.label
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
), q AS (
  SELECT vec_id AS query_id, embedding AS query_vec,
         {_term_case_sql()} AS term,
         CAST(vec_id + 2 AS INTEGER) AS target_label
  FROM embeddings WHERE vec_id < {len(TERMS)}
), scored AS (
  SELECT q.query_id, q.term, q.target_label, d.doc_id, d.text, d.lang, d.label,
         {duck_cosine("q.query_vec", "d.embedding")} AS score
  FROM docs d CROSS JOIN q
), a AS (
  SELECT * FROM (
    SELECT scored.*, row_number() OVER (
      PARTITION BY query_id ORDER BY score DESC, doc_id) AS rn
    FROM scored WHERE contains(text, term) AND label = target_label
  ) WHERE rn <= {STRICT_K}
), need_b AS (
  SELECT q.query_id FROM q
  LEFT JOIN (SELECT query_id, count(*) AS n FROM a GROUP BY query_id) c
    ON q.query_id = c.query_id
  WHERE COALESCE(c.n, 0) < {STRICT_K}
), b AS (
  SELECT * FROM (
    SELECT s.*, row_number() OVER (
      PARTITION BY s.query_id ORDER BY s.score DESC, s.doc_id) AS rn
    FROM scored s JOIN need_b nb ON s.query_id = nb.query_id
    WHERE contains(s.text, s.term)
  ) WHERE rn <= {STRICT_K}
), m1 AS (
  SELECT query_id, term, target_label, doc_id, text, lang, label, score, stage FROM (
    SELECT u.*, row_number() OVER (
      PARTITION BY query_id, doc_id ORDER BY stage) AS mrn
    FROM (
      SELECT query_id, term, target_label, doc_id, text, lang, label, score, 0 AS stage FROM a
      UNION ALL
      SELECT query_id, term, target_label, doc_id, text, lang, label, score, 1 AS stage FROM b
    ) u
  ) WHERE mrn = 1
), syn(term, synonym, syn_idx) AS (
  VALUES {", ".join(f"('{t}', '{s}', {i})" for t, s, i in SYNONYMS)}
), need_s AS (
  SELECT q.query_id FROM q
  LEFT JOIN (SELECT query_id, count(*) AS n FROM m1 GROUP BY query_id) c
    ON q.query_id = c.query_id
  WHERE COALESCE(c.n, 0) < {STRICT_K}
), s_rank AS (
  SELECT * FROM (
    SELECT s.*, sy.syn_idx, row_number() OVER (
      PARTITION BY s.query_id, sy.syn_idx ORDER BY s.score DESC, s.doc_id) AS rn
    FROM scored s
    JOIN need_s ns ON s.query_id = ns.query_id
    JOIN syn sy ON s.term = sy.term
    WHERE contains(s.text, sy.synonym) AND s.label = s.target_label
  ) WHERE rn <= {STRICT_K}
), s_stage AS (
  SELECT query_id, term, target_label, doc_id, text, lang, label, score FROM (
    SELECT s.*, row_number() OVER (
      PARTITION BY query_id, doc_id ORDER BY syn_idx) AS srn
    FROM s_rank s
  ) WHERE srn = 1
), m1s AS (
  SELECT query_id, term, target_label, doc_id, text, lang, label, score, stage FROM (
    SELECT u.*, row_number() OVER (
      PARTITION BY query_id, doc_id ORDER BY stage) AS mrn
    FROM (
      SELECT query_id, term, target_label, doc_id, text, lang, label, score, stage FROM m1
      UNION ALL
      SELECT query_id, term, target_label, doc_id, text, lang, label, score, 2 AS stage
      FROM s_stage
    ) u
  ) WHERE mrn = 1
), need_c AS (
  SELECT q.query_id FROM q
  LEFT JOIN (SELECT query_id, count(*) AS n FROM m1s GROUP BY query_id) c
    ON q.query_id = c.query_id
  WHERE COALESCE(c.n, 0) < {STRICT_K}
), c AS (
  SELECT * FROM (
    SELECT s.*, row_number() OVER (
      PARTITION BY s.query_id ORDER BY s.score DESC, s.doc_id) AS rn
    FROM scored s JOIN need_c nc ON s.query_id = nc.query_id
  ) WHERE rn <= {FALLBACK_K}
), m2 AS (
  SELECT query_id, term, target_label, doc_id, text, lang, label, score, stage FROM (
    SELECT u.*, row_number() OVER (
      PARTITION BY query_id, doc_id ORDER BY stage) AS mrn
    FROM (
      SELECT query_id, term, target_label, doc_id, text, lang, label, score, stage FROM m1s
      UNION ALL
      SELECT query_id, term, target_label, doc_id, text, lang, label, score, 3 AS stage FROM c
    ) u
  ) WHERE mrn = 1
), fused AS (
  SELECT query_id, doc_id,
         ROUND(0.7 * score + 0.3 * ((
             (CASE WHEN contains(text, term) THEN 1 ELSE 0 END)
           + (CASE WHEN label = target_label THEN 1 ELSE 0 END)
           + (CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
         ) / 3.0), 4) AS combined_score
  FROM m2
)
SELECT query_id, doc_id, combined_score,
       CAST(rank AS INTEGER) AS rank
FROM (
  SELECT fused.*, row_number() OVER (
    PARTITION BY query_id ORDER BY combined_score DESC, doc_id) AS rank
  FROM fused
) WHERE rank <= {FINAL_N}
""",
)
def staged_retrieval_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    qdf = _queries(spark, sf_dir)
    docs = _docs(spark, sf_dir)

    # norms hoisted out of the pair loop (once per doc / per query row)
    from vector_search_ner_spark.functions.vector import dot_product, l2_norm

    docs = docs.withColumn("__dnorm", l2_norm(F.col("embedding")))
    qdf = qdf.withColumn("__qnorm", l2_norm(F.col("query_vec")))
    denom = F.col("__qnorm") * F.col("__dnorm")
    cos = F.when(denom == 0.0, F.lit(0.0)).otherwise(
        dot_product(F.col("query_vec"), F.col("embedding")) / denom
    )
    scored = (
        docs.crossJoin(F.broadcast(qdf))
        .withColumn("score", cos)
        .select("query_id", "term", "target_label", "doc_id", "text", "lang", "label", "score")
    )

    def stage_topk(df: DataFrame, k: int) -> DataFrame:
        return topk_per_query(df, k, "query_id", "score", "doc_id").drop("rank")

    # stage A: strict — term AND label
    a = stage_topk(
        scored.where(F.col("text").contains(F.col("term")) & (F.col("label") == F.col("target_label"))),
        STRICT_K,
    )
    # stage B: relaxed (term only), for queries with a deficit after A
    need_b = queries_below(qdf, a, STRICT_K)
    b = stage_topk(
        scored.join(need_b, "query_id", "left_semi").where(F.col("text").contains(F.col("term"))),
        STRICT_K,
    )
    m1 = merge_stages_first_wins([a, b])
    # stage S: synonym-expanded strict searches for queries still in
    # deficit (reference stage ④, main.py:386-397): per synonym, a
    # contains(synonym) AND label search top-K; merged earliest-synonym-
    # wins, then first-wins against m1
    need_s = queries_below(qdf, m1, STRICT_K)
    syn = spark.createDataFrame(SYNONYMS, "term string, synonym string, syn_idx int")
    s_cand = (
        scored.join(need_s, "query_id", "left_semi")
        .join(F.broadcast(syn), "term")
        .where(F.col("text").contains(F.col("synonym")) & (F.col("label") == F.col("target_label")))
    )
    w_s = Window.partitionBy("query_id", "syn_idx").orderBy(F.col("score").desc(), F.col("doc_id"))
    s_rank = s_cand.withColumn("rn", F.row_number().over(w_s)).where(F.col("rn") <= STRICT_K)
    w_syn_dedup = Window.partitionBy("query_id", "doc_id").orderBy("syn_idx")
    s_stage = (
        s_rank.withColumn("srn", F.row_number().over(w_syn_dedup))
        .where(F.col("srn") == 1)
        .select("query_id", "term", "target_label", "doc_id", "text", "lang", "label", "score")
    )
    m1s = merge_stages_first_wins([m1.drop("stage"), s_stage])
    # stage C: unfiltered fallback k=15 for queries still under-filled
    need_c = queries_below(qdf, m1s, STRICT_K)
    c = stage_topk(scored.join(need_c, "query_id", "left_semi"), FALLBACK_K).withColumn(
        "stage", F.lit(2)
    )
    m2 = merge_stages_first_wins([m1s.drop("stage"), c.drop("stage")])

    meta = overlap_score(
        F.col("text").contains(F.col("term")),
        F.col("label") == F.col("target_label"),
        F.col("lang") == "en",
    )
    fused = m2.select(
        "query_id",
        "doc_id",
        fuse_scores(F.col("score"), meta).alias("combined_score"),
    )
    return rank_topn(fused, FINAL_N).select("query_id", "doc_id", "combined_score", "rank")


@query(
    "synonym_expansion_search",
    oracle="""
WITH syn(term, synonym) AS (
  VALUES ('vector', 'vector'), ('vector', 'merge'), ('vector', 'batch'),
         ('stream', 'stream'), ('stream', 'row'), ('stream', 'filter')
), hits AS (
  SELECT s.term, s.synonym, d.doc_id
  FROM syn s JOIN documents d ON contains(d.text, s.synonym)
)
SELECT term, synonym, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM hits GROUP BY term, synonym
""",
)
def synonym_expansion_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query expansion via synonym explode (reference
    get_job_synonyms_with_llm + per-synonym searches,
    /root/reference/main.py:186-220, 386-397) — static dictionary
    impl (the LLM impl is an optional drop-in behind the same shape)."""
    docs = load_table(spark, sf_dir, "documents")
    syn = spark.createDataFrame(
        [
            ("vector", "vector"),
            ("vector", "merge"),
            ("vector", "batch"),
            ("stream", "stream"),
            ("stream", "row"),
            ("stream", "filter"),
        ],
        "term string, synonym string",
    )
    return (
        F.broadcast(syn)
        .join(docs, docs.text.contains(syn.synonym))
        .groupBy("term", "synonym")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "ner_extract_rule",
    oracle="""
SELECT doc_id,
       CASE WHEN contains(text, 'join') THEN 'join'
            WHEN contains(text, 'sort') THEN 'sort'
            WHEN contains(text, 'merge') THEN 'merge'
            WHEN contains(text, 'scan') THEN 'scan'
            ELSE NULL END AS job,
       COALESCE(CASE WHEN contains(text, 'join') THEN 'join'
            WHEN contains(text, 'sort') THEN 'sort'
            WHEN contains(text, 'merge') THEN 'merge'
            WHEN contains(text, 'scan') THEN 'scan'
            ELSE NULL END, 'unknown') AS job_final,
       CASE lang WHEN 'en' THEN 'domestic' ELSE 'international' END AS region,
       CASE WHEN n_chars < 200 THEN 'short'
            WHEN n_chars < 350 THEN 'medium'
            ELSE 'long' END AS length_band
FROM documents
""",
)
def ner_extract_rule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic rule-based NER-style extraction over documents —
    the oracle-checkable implementation behind the extractor interface
    (reference doc-NER: /root/reference/build_vectorstore.py:56-101;
    profile-fallback coalesce: main.py:444-449 → job_final)."""
    docs = load_table(spark, sf_dir, "documents")
    job = (
        F.when(F.col("text").contains("join"), "join")
        .when(F.col("text").contains("sort"), "sort")
        .when(F.col("text").contains("merge"), "merge")
        .when(F.col("text").contains("scan"), "scan")
        .otherwise(F.lit(None).cast("string"))
    )
    return docs.select(
        "doc_id",
        job.alias("job"),
        F.coalesce(job, F.lit("unknown")).alias("job_final"),
        F.when(F.col("lang") == "en", "domestic").otherwise("international").alias("region"),
        F.when(F.col("n_chars") < 200, "short")
        .when(F.col("n_chars") < 350, "medium")
        .otherwise("long")
        .alias("length_band"),
    )

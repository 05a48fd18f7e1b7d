"""Text-pipeline queries (SURVEY §2.2, §2.8, §2.10 + training-data text
analysis): cleaning, contains-filter pushdown, chunking, token/quality/
language/fingerprint stats, JSON extraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_search_ner_spark.operators import veckernel as vk
from vector_search_ner_spark.functions.text import clean_text, stable_id
from vector_search_ner_spark.functions.vector import cosine_similarity
from vector_search_ner_spark.operators.chunker import chunk_text, duck_chunk_sql
from vector_search_ner_spark.operators.textstats import (
    BOILERPLATE_SEG,
    LANG_MARKERS,
    fingerprint,
    token_count,
)
from vector_search_ner_spark.registry import query
from vector_search_ner_spark.sources.catalog import load_table


@query(
    "clean_text_normalize",
    oracle="""
SELECT doc_id,
       trim(regexp_replace(regexp_replace(text, '<[^>]+>', '', 'g'), chr(10), ' ', 'g'))
         AS cleaned,
       length(trim(regexp_replace(regexp_replace(text, '<[^>]+>', '', 'g'), chr(10), ' ', 'g')))
         AS n_clean_chars
FROM documents
""",
)
def clean_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """clean_text (HTML strip + newline collapse + trim) over documents
    (/root/reference/build_vectorstore.py:115-118)."""
    docs = load_table(spark, sf_dir, "documents")
    cleaned = clean_text(F.col("text"))
    return docs.select(
        "doc_id", cleaned.alias("cleaned"), F.length(cleaned).alias("n_clean_chars")
    )


@query(
    "contains_filter_docs",
    oracle="""
SELECT doc_id, lang, n_chars
FROM documents
WHERE contains(text, 'spark') AND (contains(text, 'join') OR lang = 'en')
""",
)
def contains_filter_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference v2 `$contains` / `$and` / `$or` where_document
    pushdown (/root/reference/main.py:144-162) as Catalyst predicates —
    pushed into the parquet scan."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.where(
        F.col("text").contains("spark")
        & (F.col("text").contains("join") | (F.col("lang") == "en"))
    ).select("doc_id", "lang", "n_chars")


@query("chunk_documents", oracle=duck_chunk_sql(120, 30) + " WHERE doc_id < 100")
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunker (size=120, overlap=30 — scaled-down
    analogue of the reference's 300/50, build_vectorstore.py:50-53)."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    return chunk_text(docs, size=120, overlap=30).select("doc_id", "chunk_index", "chunk")


@query(
    "chunk_ids_stable",
    oracle=f"""
WITH chunks AS ({duck_chunk_sql(120, 30)} WHERE doc_id < 100)
SELECT doc_id, chunk_index,
       CAST('0x' || substring(md5(substring(chunk, 1, 50)), 1, 15) AS BIGINT)
         || '_' || CAST(chunk_index AS VARCHAR) AS chunk_id
FROM chunks
""",
)
def chunk_ids_stable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable chunk ids — md5-derived hash of the chunk's first 50
    chars + index; fixes the reference's per-process-salted Python
    `hash()` id minting (/root/reference/build_vectorstore.py:202-203)."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    chunks = chunk_text(docs, size=120, overlap=30)
    return chunks.select(
        "doc_id",
        "chunk_index",
        stable_id(F.col("chunk"), F.col("chunk_index")).alias("chunk_id"),
    )


def _duck_marker_hits(markers: tuple[str, ...]) -> str:
    toks = "string_split(trim(text), ' ')"
    parts = " + ".join(
        f"len(list_filter({toks}, t -> t = '{m}'))" for m in markers
    )
    return f"CAST({parts} AS BIGINT)"


@query(
    "doc_token_stats",
    oracle=f"""
SELECT doc_id,
       CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
       {_duck_marker_hits(LANG_MARKERS["en"])} AS en_hits,
       CAST('0x' || substring(md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))), 1, 15) AS BIGINT)
         AS fp
FROM documents
""",
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + marker-word hits + stable content fingerprint."""
    from vector_search_ner_spark.operators.textstats import marker_hits

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        marker_hits(F.col("text"), LANG_MARKERS["en"]).alias("en_hits"),
        fingerprint(F.col("text")).alias("fp"),
    )


def _duck_quality() -> str:
    n_tok = "len(string_split(trim(text), ' '))"
    n_chars = "length(text)"
    mean_len = f"({n_chars} - ({n_tok} - 1)) / CAST({n_tok} AS DOUBLE)"
    stop_ratio = f"{_duck_marker_hits(LANG_MARKERS['en'])} / CAST({n_tok} AS DOUBLE)"
    return f"""ROUND((
      (CASE WHEN {n_tok} >= 5 AND {n_tok} <= 1000 THEN 1.0 ELSE 0.0 END)
    + (CASE WHEN {mean_len} >= 2.0 AND {mean_len} <= 12.0 THEN 1.0 ELSE 0.0 END)
    + (CASE WHEN {stop_ratio} >= 0.01 AND {stop_ratio} <= 0.5 THEN 1.0 ELSE 0.0 END)
    ) / 3.0, 4)"""


def _duck_lang_id() -> str:
    code = _duck_marker_hits(LANG_MARKERS["code"])
    data = _duck_marker_hits(LANG_MARKERS["data"])
    en = _duck_marker_hits(LANG_MARKERS["en"])
    return f"""CASE
      WHEN {code} >= {data} AND {code} >= {en} AND {code} > 0 THEN 'code'
      WHEN {data} >= {en} AND {data} > 0 THEN 'data'
      WHEN {en} > 0 THEN 'en'
      ELSE 'und' END"""


@query(
    "doc_quality_scores",
    oracle=f"""
SELECT doc_id, {_duck_quality()} AS quality, {_duck_lang_id()} AS lang_pred
FROM documents
""",
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring + heuristic language-ID over documents —
    training-data-pipeline text analysis as one map-only projection
    pipeline (tokenize once, stage each marker count once, derive the
    score and the argmax from attributes — the interpreted-HOF staging
    discipline; see doc_language_quality_gate)."""
    from vector_search_ner_spark.operators.textstats import (
        lang_from_hits,
        marker_hits_tokens,
        quality_from_parts,
        word_tokens,
    )

    docs = load_table(spark, sf_dir, "documents")
    hits = docs.select(
        "doc_id", "text", word_tokens(F.col("text")).alias("__w")
    ).select(
        "doc_id",
        "text",
        "__w",
        marker_hits_tokens(F.col("__w"), LANG_MARKERS["code"]).alias("__code"),
        marker_hits_tokens(F.col("__w"), LANG_MARKERS["data"]).alias("__data"),
        marker_hits_tokens(F.col("__w"), LANG_MARKERS["en"]).alias("__en"),
    )
    return hits.select(
        "doc_id",
        quality_from_parts(
            F.col("text"), F.size("__w").cast("long"), F.col("__en")
        ).alias("quality"),
        lang_from_hits(F.col("__code"), F.col("__data"), F.col("__en")).alias(
            "lang_pred"
        ),
    )


@query(
    "events_json_extract",
    oracle="""
SELECT event_id, event_type,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
""",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-in-string property extraction (the reference stores NER as
    a JSON string in metadata, build_vectorstore.py:217, re-parsed at
    main.py:303-308): get_json_object + cast + filter."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.select("event_id", "event_type", k.alias("k_val")).where(F.col("k_val") > 50)


@query(
    "combined_text_assembly",
    oracle="""
SELECT doc_id,
       concat_ws(chr(10),
         '제목: ' || source,
         '언어: ' || lang,
         '본문: ' || substring(text, 1, 100)) AS combined,
       substring(text, 1, 100) AS snippet
FROM documents
WHERE doc_id < 50
""",
)
def combined_text_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Labeled multi-field text assembly + first-100-chars snippet
    (reference combined_text build_vectorstore.py:155-161; snippet
    main.py:242)."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    return docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.concat(F.lit("제목: "), F.col("source")),
            F.concat(F.lit("언어: "), F.col("lang")),
            F.concat(F.lit("본문: "), F.substring(F.col("text"), 1, 100)),
        ).alias("combined"),
        F.substring(F.col("text"), 1, 100).alias("snippet"),
    )


@query(
    "tfidf_top_terms",
    oracle="""
WITH toks AS (
  SELECT doc_id, t AS token
  FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS t FROM documents
        WHERE doc_id < 200)
  WHERE t != ''
), tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, token
), df AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token
), n AS (
  SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM toks
)
SELECT doc_id, token, tfidf, rnk FROM (
  SELECT tf.doc_id, tf.token,
         tf.tf * (n.n_docs + 1.0) / (df.df + 1.0) AS tfidf,
         CAST(row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf * (n.n_docs + 1.0) / (df.df + 1.0) DESC, tf.token
         ) AS INTEGER) AS rnk
  FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
) WHERE rnk <= 3
""",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document (training-data text analysis;
    the engine's from-scratch equivalent of an MLlib HashingTF+IDF fit,
    kept as exact counts so it is oracle-checkable). IDF uses the
    rational form (N+1)/(df+1) — every arithmetic op is an
    exactly-rounded IEEE double op, so Spark and DuckDB agree
    bit-for-bit (ln() would be libm-dependent).

    Scale shape: tf = one shuffle on (doc_id, token); df reuses the tf
    result (no second scan); N is a broadcast scalar; final top-3 via
    WindowGroupLimit partial top-k."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), " ")).alias("token")
    ).where(F.col("token") != "")
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = toks.agg(F.count_distinct("doc_id").alias("n_docs"))
    tfidf = (F.col("tf") * (F.col("n_docs") + 1.0) / (F.col("df") + 1.0)).alias("tfidf")
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token"))
    return (
        tf.join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "token", tfidf)
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= 3)
    )


@query(
    "dataset_split_assign",
    oracle="""
SELECT doc_id,
       strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 32, 1)) - 1
         AS bucket,
       CASE WHEN strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 32, 1)) - 1 < 12
            THEN 'train'
            WHEN strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 32, 1)) - 1 < 14
            THEN 'val'
            ELSE 'test' END AS split
FROM documents
""",
)
def dataset_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split by content hash (75/12.5/12.5
    via the last md5 nibble of the id). The training-pipeline staple:
    unlike rand(seed) — whose per-row value depends on partitioning and
    task retries — a hash split is ROW-stable under any repartition,
    backfill, or incremental append, so the same doc lands in the same
    split forever. Map-only: no shuffle at any scale."""
    d = load_table(spark, sf_dir, "documents")
    nibble = F.instr(
        F.lit("0123456789abcdef"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 32, 1),
    ) - 1
    return d.select(
        "doc_id",
        nibble.alias("bucket"),
        F.when(nibble < 12, "train").when(nibble < 14, "val").otherwise("test").alias("split"),
    )


@query(
    "doc_repetition_scores",
    oracle="""
SELECT doc_id,
       n_bigrams,
       n_distinct,
       CAST(ROUND(1.0 - CAST(n_distinct AS DOUBLE) / n_bigrams, 6) AS DOUBLE) AS rep_ratio
FROM (
  SELECT doc_id,
         len(bg) AS n_bigrams,
         len(list_distinct(bg)) AS n_distinct
  FROM (
    SELECT doc_id,
           list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1]) AS bg
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
  )
  WHERE len(bg) > 0
)
ORDER BY doc_id
""",
)
def doc_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition ratio (1 - distinct/total bigrams) —
    the Gopher-style boilerplate/low-quality signal used to filter
    training corpora (repeated headers, keyword stuffing, template
    spam). Pure higher-order array functions (TRANSFORM +
    ARRAY_DISTINCT) evaluated JVM-side per row: map-only, no shuffle,
    no UDF — at 100 TB this runs at scan speed."""
    d = load_table(spark, sf_dir, "documents")
    bg = F.expr("transform(sequence(0, size(w) - 2), i -> concat(w[i], ' ', w[i + 1]))")
    return (
        d.select("doc_id", F.split("text", " ").alias("w"))
        .where(F.size("w") >= 2)
        .select("doc_id", bg.alias("bg"))
        .select(
            "doc_id",
            F.size("bg").alias("n_bigrams"),
            F.size(F.array_distinct("bg")).alias("n_distinct"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "n_distinct",
            F.round(1.0 - F.col("n_distinct").cast("double") / F.col("n_bigrams"), 6).alias(
                "rep_ratio"
            ),
        )
        .orderBy("doc_id")
    )


@query("chunk_documents_udtf", oracle=duck_chunk_sql(120, 30) + " WHERE doc_id < 100")
def chunk_documents_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME chunk contract as chunk_documents, but through Spark 4's
    Python UDTF extension point (arbitrary 1→N Python generators,
    LATERAL-joined in SQL) instead of the closed-form sequence+explode.
    This is the escape hatch for splitters whose logic genuinely can't
    be closed-form (the reference's recursive separator hierarchy,
    build_vectorstore.py:50-53); the closed-form stays the production
    path (JVM codegen, ~10× faster). Arrow-batched so rows cross the
    Python boundary in columnar batches, and identical output lets one
    DuckDB oracle check both implementations."""
    from pyspark.sql.functions import udtf

    size, overlap = 120, 30
    stride = size - overlap

    @udtf(returnType="chunk_index int, chunk string", useArrow=True)
    class ChunkUDTF:
        def eval(self, text: str):
            if text is None:
                return
            n = 1 + max(0, -(-(len(text) - size) // stride))
            for i in range(n):
                yield i, text[i * stride : i * stride + size]

    spark.udtf.register("chunk_udtf", ChunkUDTF)
    load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100).createOrReplaceTempView(
        "docs_to_chunk"
    )
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_index, c.chunk
        FROM docs_to_chunk d, LATERAL chunk_udtf(d.text) AS c
        """
    )


@query(
    "doc_bpe_token_counts",
    oracle="""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT)
         AS n_tokens,
       CAST(len(list_distinct(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))) AS BIGINT)
         AS n_unique,
       CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_number_tokens
FROM documents
""",
)
def doc_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a BPE-ish pre-tokenizer regex (letter runs |
    digit runs | single punctuation — the GPT-2 pre-tokenizer shape,
    restricted to char classes both engines' regex dialects agree on).
    This is the 'how many tokens will training see' estimator; pure
    regexp_extract_all + array ops, map-only at any scale."""
    pat = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
    d = load_table(spark, sf_dir, "documents")
    toks = F.expr(f"regexp_extract_all(text, '{pat}', 0)")
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_unique"),
        F.size(F.expr("regexp_extract_all(text, '[0-9]+', 0)")).cast("bigint").alias(
            "n_number_tokens"
        ),
    )


@query(
    "quality_weighted_sample",
    oracle="""
WITH scored AS (
  SELECT doc_id, n_chars,
         CASE WHEN n_chars >= 400 THEN 0.9 WHEN n_chars >= 150 THEN 0.5 ELSE 0.1 END AS keep_p,
         (strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
           + strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1
           AS bucket
  FROM documents
)
SELECT doc_id, n_chars, CAST(ROUND(keep_p, 2) AS DOUBLE) AS keep_p, CAST(bucket AS BIGINT) AS bucket
FROM scored
WHERE bucket < keep_p * 256
ORDER BY doc_id
""",
)
def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted deterministic sampling (the data-mixing step:
    keep high-quality docs at 90%, mid at 50%, low at 10%): the keep
    decision is a pure function of the doc id's md5 (first byte as a
    0-255 bucket vs the tier's threshold) — row-stable under
    repartition/retry/append like dataset_split_assign, unlike
    rand(seed). Map-only at any scale; tiers here key off n_chars as
    the stand-in quality score."""
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    nib = lambda i: F.instr(F.lit("0123456789abcdef"), F.substring(h, i, 1)) - 1
    bucket = (nib(1) * 16 + nib(2)).cast("bigint")
    keep_p = (
        F.when(F.col("n_chars") >= 400, 0.9)
        .when(F.col("n_chars") >= 150, 0.5)
        .otherwise(0.1)
    )
    return (
        d.select(
            "doc_id",
            "n_chars",
            F.round(keep_p, 2).cast("double").alias("keep_p"),
            bucket.alias("bucket"),
        )
        .where(F.col("bucket") < F.col("keep_p") * 256)
        .orderBy("doc_id")
    )


@query(
    "posexplode_tokens",
    oracle="""
SELECT doc_id, u.i AS pos, u.tok
FROM (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w) + 1), i -> {'i': i, 'tok': w[i]})) AS u
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id < 20)
)
ORDER BY doc_id, pos
""",
)
def posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-preserving 1→N expansion (posexplode): token streams
    keep their offsets — required for span labeling, windowed n-grams,
    and any op where order inside the row matters after the explode.
    1-based to match SQL ordinality convention."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 20)
    return (
        d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "tok"))
        .select("doc_id", (F.col("pos0") + 1).cast("bigint").alias("pos"), "tok")
        .orderBy("doc_id", "pos")
    )


_TEXTRANK_ITER_SQL = """
SELECT n.tok,
       CAST(150000000 + COALESCE(s.sc, 0) AS BIGINT) AS r
FROM (SELECT src AS tok FROM wdeg) n
LEFT JOIN (
  SELECT dst AS tok,
         CAST(SUM((r * w * 85) // (wdeg * 100)) AS BIGINT) AS sc
  FROM e JOIN {prev} ON e.src = {prev}.tok
  GROUP BY dst
) s USING (tok)
"""

_TEXTRANK_SQL = (
    """
WITH toks AS (
  SELECT doc_id, u.i AS pos, u.tok FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(w) + 1), i -> {'i': i, 'tok': w[i]})) AS u
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id < 200))
),
big AS (
  SELECT a.tok AS tok, b.tok AS tok2
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.tok <> b.tok
),
edges AS (
  SELECT src, dst, count(*) AS w FROM (
    SELECT tok AS src, tok2 AS dst FROM big
    UNION ALL
    SELECT tok2 AS src, tok AS dst FROM big
  ) GROUP BY src, dst
),
wdeg AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wdeg FROM edges GROUP BY src),
e AS (SELECT edges.src, edges.dst, edges.w, wdeg.wdeg FROM edges JOIN wdeg USING (src)),
r0 AS (SELECT src AS tok, CAST(1000000000 AS BIGINT) AS r FROM wdeg),
"""
    + ",\n".join(
        f"r{i} AS ({_TEXTRANK_ITER_SQL.format(prev=f'r{i-1}')})" for i in range(1, 6)
    )
    + """
SELECT tok, r FROM r5 ORDER BY r DESC, tok LIMIT 50
"""
)


@query("textrank_keywords", oracle=_TEXTRANK_SQL)
def textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction = PageRank power iteration over the
    token co-occurrence (bigram) graph — the engine's ITERATIVE-
    algorithm surface (Mihalcea & Tarau 2004; Page et al. 1999).

    Exactness contract: ranks live in integer micro-units (start 1e9
    per node, damping 0.85 applied as per-edge floor-division
    `(r*w*85) DIV (wdeg*100)`), so every iteration is pure BIGINT
    arithmetic — order-free under Spark's partial aggregation and
    bit-identical to the DuckDB oracle, which unrolls the same 5
    iterations as chained CTEs. No float ever appears, so there is no
    summation-order nondeterminism to paper over.

    Scale notes: the driver loop composes 5 lazy join+agg plans; edges
    and degrees are computed once and reused. At 100 TB you'd persist
    `edges` (it's read 5×) and localCheckpoint the rank DF every few
    iterations to truncate lineage; both are one-line additions left
    out here so the whole plan stays visible to Catalyst."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    nxt = toks.select(
        "doc_id", (F.col("pos") - 1).alias("pos"), F.col("tok").alias("tok2")
    )
    big = toks.join(nxt, ["doc_id", "pos"]).where(F.col("tok") != F.col("tok2"))
    edges = (
        big.select(F.col("tok").alias("src"), F.col("tok2").alias("dst"))
        .unionAll(big.select(F.col("tok2").alias("src"), F.col("tok").alias("dst")))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    wdeg = edges.groupBy("src").agg(F.sum("w").cast("bigint").alias("wdeg"))
    e = edges.join(wdeg, "src")
    nodes = wdeg.select(F.col("src").alias("tok"))
    ranks = nodes.select("tok", F.lit(1_000_000_000).cast("bigint").alias("r"))
    for _ in range(5):
        contrib = e.join(ranks, e.src == ranks.tok).select(
            F.col("dst").alias("tok"),
            F.expr("CAST((r * w * 85) DIV (wdeg * 100) AS BIGINT)").alias("c"),
        )
        summed = contrib.groupBy("tok").agg(F.sum("c").cast("bigint").alias("sc"))
        ranks = nodes.join(summed, "tok", "left").select(
            "tok",
            (F.lit(150_000_000) + F.coalesce(F.col("sc"), F.lit(0)))
            .cast("bigint")
            .alias("r"),
        )
    return ranks.orderBy(F.desc("r"), "tok").limit(50)


@query(
    "string_fn_gallery2",
    oracle="""
SELECT doc_id,
       lpad(lang, 8, '.') AS lpad8,
       rpad(lang, 8, '.') AS rpad8,
       translate(source, 'aeiou', 'AEIOU') AS vowels_up,
       repeat(lang, 3) AS lang3,
       reverse(source) AS src_rev,
       ascii(source) AS first_code,
       CAST(strpos(text, 'the') AS INTEGER) AS the_pos,
       left(text, 5) AS left5,
       right(text, 5) AS right5,
       split_part(text, ' ', 2) AS second_tok,
       chr(65 + CAST(doc_id % 26 AS INTEGER)) AS bucket_chr
FROM documents WHERE doc_id < 60
ORDER BY doc_id
""",
)
def string_fn_gallery2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string-scalar wave (§2.8 substrate beyond the reference's
    own usage): padding, char-class translate, repeat, reverse, ascii/
    chr codec, first-occurrence position, left/right slices, and
    split_part field extraction — all whole-stage-codegen JVM
    expressions, no UDF."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 60)
    return d.select(
        "doc_id",
        F.lpad("lang", 8, ".").alias("lpad8"),
        F.rpad("lang", 8, ".").alias("rpad8"),
        F.translate("source", "aeiou", "AEIOU").alias("vowels_up"),
        F.repeat("lang", 3).alias("lang3"),
        F.reverse("source").alias("src_rev"),
        F.ascii("source").alias("first_code"),
        F.instr("text", "the").cast("int").alias("the_pos"),
        F.expr("left(text, 5)").alias("left5"),
        F.expr("right(text, 5)").alias("right5"),
        F.split_part("text", F.lit(" "), F.lit(2)).alias("second_tok"),
        F.expr("chr(65 + CAST(doc_id % 26 AS INT))").alias("bucket_chr"),
    ).orderBy("doc_id")


_RK_P = 1_000_003
_RK_B = 131
_RK_K = 8
_RK_POW = [pow(_RK_B, _RK_K - 1 - j, _RK_P) for j in range(_RK_K)]


def _duck_rolling_fp() -> str:
    th = "(CAST('0x' || substring(md5(toks[i + {j}]), 1, 15) AS BIGINT) % {p})"
    terms = " + ".join(
        f"({th.format(j=j, p=_RK_P)} * {_RK_POW[j]}) % {_RK_P}" for j in range(_RK_K)
    )
    return f"""
WITH t AS (
  SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents
), w AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(toks) - {_RK_K - 1}),
                        i -> ({terms}) % {_RK_P}) AS whashes
  FROM t WHERE len(toks) >= {_RK_K}
)
SELECT doc_id,
       CAST(len(whashes) AS INTEGER) AS n_windows,
       CAST(len(list_distinct(whashes)) AS INTEGER) AS n_distinct,
       CAST(list_min(whashes) AS BIGINT) AS min_fp,
       CAST(list_sum(list_distinct(whashes)) % {_RK_P} AS BIGINT) AS set_fp
FROM w
"""


@query("doc_rolling_fingerprint", oracle=_duck_rolling_fp())
def doc_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprinting (Rabin-Karp over word
    k-grams, the winnowing/MOSS family): every k=8-token window gets a
    polynomial hash sum(t_j * B^(k-1-j)) mod P with precomputed power
    literals (no modpow at runtime; products stay < 2^53), and the doc
    is summarized by its window count, distinct-window count, MINIMUM
    window hash (the winnowing representative — two docs sharing any
    k-gram run agree on local minima), and the mod-P sum of the
    distinct window set (an order-free set fingerprint). All integer
    arithmetic — bit-exact oracle. Map-only: no shuffle; at 100 TB
    this is the cheap first pass that feeds fingerprint-equality
    bucketing before any pairwise comparison."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), " ")
    th = lambda c: F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long") % _RK_P
    d = docs.select("doc_id", toks.alias("toks")).where(F.size("toks") >= _RK_K)
    d = d.withColumn("thash", F.transform(F.col("toks"), th))

    # window-hash array: explicit k-term polynomial per position
    def _w(i):
        acc = None
        for j in range(_RK_K):
            term = (F.element_at(F.col("thash"), i + j) * F.lit(_RK_POW[j])) % _RK_P
            acc = term if acc is None else (acc + term)
        return acc % _RK_P

    d = d.withColumn(
        "whashes", F.transform(F.sequence(F.lit(1), F.size("toks") - (_RK_K - 1)), _w)
    )
    dist = F.array_distinct(F.col("whashes"))
    return d.select(
        "doc_id",
        F.size("whashes").alias("n_windows"),
        F.size(dist).alias("n_distinct"),
        F.array_min("whashes").cast("long").alias("min_fp"),
        (F.aggregate(dist, F.lit(0).cast("long"), lambda a, x: a + x) % _RK_P).alias("set_fp"),
    )


@query(
    "customer_pii_scrub",
    oracle="""
SELECT c_custkey,
       'user_' || substring(md5(c_name), 1, 12) AS pseudonym,
       regexp_replace(c_name, '[0-9]', '#', 'g') AS name_masked,
       CAST(length(regexp_replace(c_name, '[^0-9]', '', 'g')) AS INT)
         AS n_digits_redacted,
       CAST(floor(c_acctbal / 1000) * 1000 AS DOUBLE) AS acctbal_band,
       c_mktsegment
FROM customer
ORDER BY c_custkey
""",
)
def customer_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub for training-data pipelines, on the person table:
    deterministic pseudonymization (keyed md5 — joinable across tables,
    not reversible), digit masking of the display name, and numeric
    generalization of the account balance into 1000-unit bands
    (k-anonymity-style coarsening). Pure built-in string/math exprs —
    map-only, no shuffle, scales as a projection; the same three moves
    (pseudonymize / redact / generalize) apply to any quasi-identifier
    column at 100 TB."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.concat(F.lit("user_"), F.substring(F.md5("c_name"), 1, 12)).alias("pseudonym"),
        F.regexp_replace("c_name", "[0-9]", "#").alias("name_masked"),
        F.length(F.regexp_replace("c_name", "[^0-9]", "")).cast("int").alias(
            "n_digits_redacted"
        ),
        (F.floor(F.col("c_acctbal") / 1000) * 1000).cast("double").alias("acctbal_band"),
        "c_mktsegment",
    ).orderBy("c_custkey")


# regex class-only patterns: identical semantics in Java regex (Spark)
# and RE2-ish DuckDB — no lookaround, no \b, no lazy quantifiers
_EMAIL_RE = "[A-Za-z0-9._]+@[A-Za-z0-9.]+[.][A-Za-z]+"
_PHONE_RE = "[+][0-9]+-[0-9]{3}-[0-9]{4}"


PII_SCRUB_ORACLE = f"""
WITH injected AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or +1-555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              || CASE WHEN doc_id % 3 = 0
                      THEN ' cc admin' || CAST(doc_id AS VARCHAR) || '@corp.org'
                      ELSE '' END AS text
  FROM documents
), scrubbed AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                        '{_PHONE_RE}', '[PHONE]', 'g') AS clean
  FROM injected
)
SELECT doc_id,
       CAST((length(clean) - length(replace(clean, '[EMAIL]', '')))
            / length('[EMAIL]') AS INTEGER) AS n_emails,
       CAST((length(clean) - length(replace(clean, '[PHONE]', '')))
            / length('[PHONE]') AS INTEGER) AS n_phones,
       CAST(length(clean) AS INTEGER) AS clean_len,
       substring(md5(clean), 1, 16) AS clean_fp
FROM scrubbed
"""


@query("text_pii_scrub", oracle=PII_SCRUB_ORACLE)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEXT-column PII scrub — the pretraining redaction pass
    (`customer_pii_scrub` handles structured columns; this handles
    free text, where PII hides mid-sentence): emails and phone numbers
    replaced with [EMAIL]/[PHONE] placeholder tokens via
    regexp_replace. The fixture text is synthetic, so deterministic
    PII is INJECTED first (per-doc email + phone, a second email on
    every third doc) — the scrubber is then verified by placeholder
    counts, scrubbed length, and an md5 fingerprint of the full
    scrubbed text, all re-derived by the oracle. The regexes use only
    character classes (no lookaround/anchors) so Java and RE2
    semantics agree — pinned by the value check itself.

    At 100 TB: pure map-only codegen projection, zero shuffle — the
    cheapest pass in the pipeline, which is why it runs on everything."""
    return pii_scrub_frame(load_table(spark, sf_dir, "documents"))


def pii_scrub_frame(docs: DataFrame) -> DataFrame:
    """The scrub itself, frame-in/frame-out so the streaming twin
    (`stream_pii_scrub`) applies the IDENTICAL map-only expressions
    at ingest — batch and stream cannot drift."""
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" cc admin"), F.col("doc_id").cast("string"), F.lit("@corp.org")
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    clean = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
    )
    scrubbed = injected.select("doc_id", clean.alias("clean"))
    n_of = lambda tok: (
        (F.length("clean") - F.length(F.replace(F.col("clean"), F.lit(tok), F.lit(""))))
        / len(tok)
    ).cast("int")
    return scrubbed.select(
        "doc_id",
        n_of("[EMAIL]").alias("n_emails"),
        n_of("[PHONE]").alias("n_phones"),
        F.length("clean").cast("int").alias("clean_len"),
        F.substring(F.md5("clean"), 1, 16).alias("clean_fp"),
    )


# -- BM25 keyword ranking -----------------------------------------------------

_BM25_QUERIES = [(0, "spark"), (0, "join"), (1, "hash"), (1, "table"), (2, "window"), (2, "sort")]
_BM25_K1, _BM25_B = 1.2, 0.75
_BM25_TOPK = 10


def _duck_bm25(topk: int = _BM25_TOPK) -> str:
    terms = ", ".join(f"({q}, '{t}')" for q, t in _BM25_QUERIES)
    return f"""
WITH qterms(query_id, term) AS (VALUES {terms}),
toks AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token FROM documents
), dl AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
), stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
  FROM dl
), tf AS (
  SELECT t.doc_id, t.token AS term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks t SEMI JOIN qterms q ON t.token = q.term
  GROUP BY t.doc_id, t.token
), dfreq AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
), contrib AS (
  SELECT q.query_id, f.doc_id,
         CAST(FLOOR(
           ln((CAST(s.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5)
              / (CAST(d.df AS DOUBLE) + 0.5) + 1.0)
           * (CAST(f.tf AS DOUBLE) * ({_BM25_K1} + 1.0))
           / (CAST(f.tf AS DOUBLE)
              + {_BM25_K1} * (1.0 - {_BM25_B}
                 + {_BM25_B} * (CAST(l.dl AS DOUBLE) / s.avgdl)))
           * 1000000) AS BIGINT) AS u
  FROM tf f
  JOIN qterms q ON q.term = f.term
  JOIN dfreq d ON d.term = f.term
  JOIN dl l ON l.doc_id = f.doc_id
  CROSS JOIN stats s
), scored AS (
  SELECT query_id, doc_id, SUM(u) AS su FROM contrib GROUP BY query_id, doc_id
)
SELECT CAST(query_id AS INTEGER) AS query_id, doc_id,
       ROUND(CAST(su AS DOUBLE) / 1000000.0, 6) AS score,
       CAST(rn AS INTEGER) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY su DESC, doc_id) AS rn
  FROM scored
) WHERE rn <= {topk}
"""


def bm25_rank(
    docs: DataFrame,
    qterms: DataFrame,
    k1: float = _BM25_K1,
    b: float = _BM25_B,
    topk: int = _BM25_TOPK,
) -> DataFrame:
    """BM25 keyword ranking (Robertson/Sparck Jones probabilistic
    model) over any (doc_id, text) frame and (query_id, term) batch —
    the standard lexical ranker beside the engine's vector k-NN (the
    hybrid-retrieval keyword leg the reference approximates with
    contains-filters). Per-term contributions quantize to integer
    microunits BEFORE the per-doc sum, so accumulation is exact and
    order-independent; each contribution is one deterministic chain of
    IEEE ops (ln + fixed literals), identical in both engines.

    Scale shape: the token explode feeds doc-length and term-frequency
    aggregations (both map-side combining); the query-term table and
    the corpus stats (N, avgdl) broadcast; the only data-sized
    shuffles key on doc_id/term. Top-k per query is a
    WindowGroupLimit."""
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), " ")).alias("token")
        # eager localCheckpoint (not persist): doc-length, corpus-stats,
        # and term-frequency branches all read the exploded tokens;
        # checkpoint blocks are GC-reclaimed once unreferenced
    ).localCheckpoint(eager=True)
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias("avgdl"),
    )
    tf = (
        toks.join(F.broadcast(qterms.select("term").distinct()), toks.token == F.col("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n_docs").cast("double") - F.col("df").cast("double") + 0.5)
        / (F.col("df").cast("double") + 0.5)
        + 1.0
    )
    tfterm = (F.col("tf").cast("double") * (k1 + 1.0)) / (
        F.col("tf").cast("double")
        + k1 * (1.0 - b + b * (F.col("dl").cast("double") / F.col("avgdl")))
    )
    contrib = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn("u", F.floor(idf * tfterm * 1000000).cast("long"))
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(F.sum("u").alias("su"))
    w = Window.partitionBy("query_id").orderBy(F.col("su").desc(), "doc_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= topk)
        .select(
            "query_id",
            "doc_id",
            F.round(F.col("su").cast("double") / 1000000.0, 6).alias("score"),
            F.col("rn").cast("int").alias("rank"),
        )
    )


@query("bm25_topk", oracle=_duck_bm25())
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`bm25_rank` over the documents corpus with the fixed query-term
    batch (see the operator docstring for the model and scale shape);
    the Python reference twin is property-tested on random corpora in
    tests/test_semantics.py."""
    docs = load_table(spark, sf_dir, "documents")
    qterms = spark.createDataFrame(_BM25_QUERIES, "query_id int, term string")
    return bm25_rank(docs, qterms)


_RRF_C = 60  # the standard reciprocal-rank-fusion damping constant
_RRF_TOPK = 10


def _duck_rrf() -> str:
    from vector_search_ner_spark.functions.vector import duck_cosine

    cos = duck_cosine("q.embedding", "d.embedding")
    return f"""
WITH kw AS ({_duck_bm25()}),
vec AS (
  SELECT query_id, doc_id, CAST(rn AS INTEGER) AS rank FROM (
    SELECT q.vec_id AS query_id, d.vec_id AS doc_id,
           row_number() OVER (PARTITION BY q.vec_id ORDER BY {cos} DESC, d.vec_id) AS rn
    FROM embeddings d CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 3) q
  ) WHERE rn <= {_RRF_TOPK}
),
fused AS (
  SELECT COALESCE(k.query_id, v.query_id) AS query_id,
         COALESCE(k.doc_id, v.doc_id) AS doc_id,
         COALESCE(CAST(1.0 AS DOUBLE) / CAST({_RRF_C} + k.rank AS DOUBLE), 0.0)
           + COALESCE(CAST(1.0 AS DOUBLE) / CAST({_RRF_C} + v.rank AS DOUBLE), 0.0) AS rrf
  FROM kw k FULL OUTER JOIN vec v
    ON k.query_id = v.query_id AND k.doc_id = v.doc_id
)
SELECT query_id, doc_id, ROUND(rrf, 6) AS rrf_score, CAST(rn AS INTEGER) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rn
  FROM fused
) WHERE rn <= {_RRF_TOPK}
"""


@query("hybrid_rrf_fusion", oracle=_duck_rrf())
def hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of the two retrieval legs (Cormack/
    Clarke/Buettcher, SIGIR 2009): BM25 keyword top-k and exact-cosine
    vector top-k merge by sum of 1/(60+rank) — the standard
    score-free hybrid, beside the reference's 0.7/0.3 weighted-score
    fusion (staged_retrieval_v1_hybrid). Determinism: each leg's rank
    is an integer, each reciprocal is one IEEE division, and the two
    legs add in EXPLICIT order via a full outer join + coalesce (never
    an unordered SUM over doubles). Both legs are K-sized per query
    before the join, so the fusion is negligible at any scale."""
    from pyspark.sql import Window


    kw = bm25_topk(spark, sf_dir).select(
        "query_id", "doc_id", F.col("rank").alias("k_rank")
    )
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    cos = vk.pair_cosine(F.col("qv"), F.col("embedding"))
    w_v = Window.partitionBy("query_id").orderBy(F.col("__cos").desc(), "doc_id")
    vec = (
        emb.select(F.col("vec_id").alias("doc_id"), "embedding")
        .crossJoin(F.broadcast(q))
        .withColumn("__cos", cos)
        .withColumn("v_rank", F.row_number().over(w_v))
        .where(F.col("v_rank") <= _RRF_TOPK)
        .select("query_id", "doc_id", "v_rank")
    )
    fused = kw.join(vec, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        (
            F.coalesce(1.0 / (_RRF_C + F.col("k_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (_RRF_C + F.col("v_rank")), F.lit(0.0))
        ).alias("rrf"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("rrf").desc(), "doc_id")
    return (
        fused.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _RRF_TOPK)
        .select(
            "query_id",
            "doc_id",
            F.round("rrf", 6).alias("rrf_score"),
            F.col("rn").cast("int").alias("rank"),
        )
    )


# the IVF-pruned hybrid probes this many of 16 fixed centroids — the
# same quantizer geometry as `ann_ivf_fixed_topk` (queries_mlops)
_RRF_IVF_N_CENT = 16
_RRF_IVF_NPROBE = 4


def _duck_rrf_ivf() -> str:
    from vector_search_ner_spark.functions.vector import duck_l2

    return f"""
WITH kw AS ({_duck_bm25()}),
cent AS (
  SELECT CAST(vec_id AS INTEGER) AS cluster_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS centroid
  FROM embeddings WHERE vec_id < {_RRF_IVF_N_CENT}
), docs AS (
  SELECT vec_id AS doc_id, embedding AS v FROM embeddings
), assigned AS (
  SELECT doc_id, v, cluster_id FROM (
    SELECT d.doc_id, d.v, c.cluster_id, row_number() OVER (
      PARTITION BY d.doc_id ORDER BY {duck_l2("d.v", "c.centroid")}, c.cluster_id) AS rn
    FROM docs d CROSS JOIN cent c
  ) WHERE rn = 1
), q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 3
), probes AS (
  SELECT query_id, qv, cluster_id FROM (
    SELECT q.query_id, q.qv, c.cluster_id, row_number() OVER (
      PARTITION BY q.query_id ORDER BY {duck_l2("q.qv", "c.centroid")}, c.cluster_id) AS rn
    FROM q CROSS JOIN cent c
  ) WHERE rn <= {_RRF_IVF_NPROBE}
), vec AS (
  SELECT query_id, doc_id, CAST(rank AS INTEGER) AS rank FROM (
    SELECT p.query_id, a.doc_id, row_number() OVER (
      PARTITION BY p.query_id ORDER BY {duck_l2("p.qv", "a.v")}, a.doc_id) AS rank
    FROM probes p JOIN assigned a ON p.cluster_id = a.cluster_id
  ) WHERE rank <= {_RRF_TOPK}
),
fused AS (
  SELECT COALESCE(k.query_id, v.query_id) AS query_id,
         COALESCE(k.doc_id, v.doc_id) AS doc_id,
         COALESCE(CAST(1.0 AS DOUBLE) / CAST({_RRF_C} + k.rank AS DOUBLE), 0.0)
           + COALESCE(CAST(1.0 AS DOUBLE) / CAST({_RRF_C} + v.rank AS DOUBLE), 0.0) AS rrf
  FROM kw k FULL OUTER JOIN vec v
    ON k.query_id = v.query_id AND k.doc_id = v.doc_id
)
SELECT query_id, doc_id, ROUND(rrf, 6) AS rrf_score, CAST(rn AS INTEGER) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rn
  FROM fused
) WHERE rn <= {_RRF_TOPK}
"""


# the BQ-pruned hybrid over-fetches this many Hamming candidates per
# query before the exact re-rank — same budget as `ann_bq_hamming_topk`
_RRF_BQ_OVERFETCH = 50


def _duck_rrf_bq() -> str:
    from vector_search_ner_spark.functions.vector import duck_cosine
    from vector_search_ner_spark.operators import bq

    return f"""
WITH kw AS ({_duck_bm25()}),
{bq.duck_bq_codes_cte()}, q AS (
  SELECT doc_id AS query_id, bq_hi AS q_hi, bq_lo AS q_lo, embedding AS query_vec
  FROM codes WHERE doc_id < 3
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
  ) WHERE rn <= {_RRF_BQ_OVERFETCH}
), vec AS (
  SELECT query_id, doc_id, CAST(rank AS INTEGER) AS rank FROM (
    SELECT cand.query_id, cand.doc_id,
           row_number() OVER (
             PARTITION BY cand.query_id
             ORDER BY round({duck_cosine("q.query_vec", "d.embedding")}, 6) DESC,
                      cand.doc_id) AS rank
    FROM cand
    JOIN codes d ON cand.doc_id = d.doc_id
    JOIN q ON cand.query_id = q.query_id
  ) WHERE rank <= {_RRF_TOPK}
),
fused AS (
  SELECT COALESCE(k.query_id, v.query_id) AS query_id,
         COALESCE(k.doc_id, v.doc_id) AS doc_id,
         COALESCE(CAST(1.0 AS DOUBLE) / CAST({_RRF_C} + k.rank AS DOUBLE), 0.0)
           + COALESCE(CAST(1.0 AS DOUBLE) / CAST({_RRF_C} + v.rank AS DOUBLE), 0.0) AS rrf
  FROM kw k FULL OUTER JOIN vec v
    ON k.query_id = v.query_id AND k.doc_id = v.doc_id
)
SELECT query_id, doc_id, ROUND(rrf, 6) AS rrf_score, CAST(rn AS INTEGER) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rn
  FROM fused
) WHERE rn <= {_RRF_TOPK}
"""


@query("hybrid_rrf_bq_fusion", oracle=_duck_rrf_bq())
def hybrid_rrf_bq_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RRF hybrid where the vector leg is the BINARY-QUANTIZED tier —
    the cheapest serving shape in the recall ladder composed into a
    production pipeline (mirroring `hybrid_rrf_ivf_fusion` for the IVF
    tier): BM25 keyword top-k fuses with `bq_hamming_topk`'s
    XOR+popcount candidate generation over the 16 B/row sign-code
    table plus exact cosine re-rank of the over-fetched candidates.
    At 100 TB the code table is ~256x smaller than the float corpus —
    this hybrid's vector leg reads float vectors for the broadcast
    candidate list ONLY, so the whole query path scans no float
    corpus at all. Same integer-rank RRF determinism; full oracle end
    to end including the sign encoding."""
    from pyspark.sql import Window

    from vector_search_ner_spark.operators import bq

    kw = bm25_topk(spark, sf_dir).select(
        "query_id", "doc_id", F.col("rank").alias("k_rank")
    )
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    vec = bq.bq_hamming_topk(
        queries, emb, k=_RRF_TOPK, overfetch=_RRF_BQ_OVERFETCH
    ).select("query_id", "doc_id", F.col("rank").cast("int").alias("v_rank"))
    fused = kw.join(vec, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        (
            F.coalesce(1.0 / (_RRF_C + F.col("k_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (_RRF_C + F.col("v_rank")), F.lit(0.0))
        ).alias("rrf"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("rrf").desc(), "doc_id")
    return (
        fused.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _RRF_TOPK)
        .select(
            "query_id",
            "doc_id",
            F.round("rrf", 6).alias("rrf_score"),
            F.col("rn").cast("int").alias("rank"),
        )
    )


@query("hybrid_rrf_ivf_fusion", oracle=_duck_rrf_ivf())
def hybrid_rrf_ivf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RRF hybrid where the vector leg is the IVF-PRUNED search, not
    the exact scan — the production shape at 100 TB: BM25 keyword
    top-k fuses with an ANN leg that probes 4 of 16 fixed centroids
    and runs exact L2 only inside the probed partitions
    (`ann_ivf_fixed_topk`'s quantizer — at scale the doc table is
    written partitioned by cluster_id and each query touches nprobe
    partitions via partition pruning, so the vector leg never scans
    the corpus). Closes the loop between the retrieval family
    (`hybrid_rrf_fusion`, exact leg) and the index family
    (queries_pq/queries_mlops): same integer-rank RRF determinism,
    full oracle end to end including the quantizer."""
    from vector_search_ner_spark.operators import ann

    kw = bm25_topk(spark, sf_dir).select(
        "query_id", "doc_id", F.col("rank").alias("k_rank")
    )
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = ann.ivf_fixed_build(emb, _RRF_IVF_N_CENT)
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    assigned = assigned.select(
        F.col("vec_id").alias("doc_id"), "embedding", "cluster_id"
    )
    vec = ann.ivf_topk(
        queries, assigned, centroids, k=_RRF_TOPK, nprobe=_RRF_IVF_NPROBE
    ).select("query_id", "doc_id", F.col("rank").cast("int").alias("v_rank"))
    fused = kw.join(vec, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        (
            F.coalesce(1.0 / (_RRF_C + F.col("k_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (_RRF_C + F.col("v_rank")), F.lit(0.0))
        ).alias("rrf"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("rrf").desc(), "doc_id")
    return (
        fused.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _RRF_TOPK)
        .select(
            "query_id",
            "doc_id",
            F.round("rrf", 6).alias("rrf_score"),
            F.col("rn").cast("int").alias("rank"),
        )
    )


def _duck_rrf_maxsim() -> str:
    from vector_search_ner_spark.plans.queries_vector import _LI_K, _maxsim_bq_ctes

    return f"""
WITH kw AS ({_duck_bm25()}),
{_maxsim_bq_ctes()}, vec AS (
  SELECT query_id, doc_id, CAST(rank AS INTEGER) AS rank FROM (
    SELECT query_id, doc_id,
           row_number() OVER (
             PARTITION BY query_id ORDER BY score_micro DESC, doc_id) AS rank
    FROM s WHERE query_id < 3
  ) WHERE rank <= {_LI_K}
),
fused AS (
  SELECT COALESCE(k.query_id, v.query_id) AS query_id,
         COALESCE(k.doc_id, v.doc_id) AS doc_id,
         COALESCE(CAST(1.0 AS DOUBLE) / CAST({_RRF_C} + k.rank AS DOUBLE), 0.0)
           + COALESCE(CAST(1.0 AS DOUBLE) / CAST({_RRF_C} + v.rank AS DOUBLE), 0.0) AS rrf
  FROM kw k FULL OUTER JOIN vec v
    ON k.query_id = v.query_id AND k.doc_id = v.doc_id
)
SELECT query_id, doc_id, ROUND(rrf, 6) AS rrf_score, CAST(rn AS INTEGER) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rn
  FROM fused
) WHERE rn <= {_RRF_TOPK}
"""


@query("hybrid_rrf_maxsim_fusion", oracle=_duck_rrf_maxsim())
def hybrid_rrf_maxsim_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RRF hybrid where the vector leg is the PRUNED MULTI-VECTOR tier
    (`ann_maxsim_bq_topk`) — completing the hybrid family so every
    retrieval tier in the recall ladder has a composed serving shape:
    exact cosine (`hybrid_rrf_fusion`), IVF (`hybrid_rrf_ivf_fusion`),
    single-vector BQ (`hybrid_rrf_bq_fusion`), and now late-interaction
    MaxSim. The keyword leg is BM25 over the document corpus; the
    vector leg BQ-encodes CHUNK embeddings (16 B/chunk), generates
    per-query-chunk Hamming candidates over the code table (query
    codes broadcast, WindowGroupLimit cut), and exact-MaxSim re-ranks
    the broadcast candidate-doc union only — the float chunk corpus is
    never fully scanned on the query path, so at 100 TB the hybrid
    costs one bit-code scan + one corpus keyword pass. Both legs rank
    the SAME doc_id space (documents), unlike the single-vector
    hybrids' separate embeddings table. Same integer-rank RRF
    determinism; full oracle end to end including chunking, sign
    encoding, Hamming cut, and micro-quantized MaxSim."""
    from pyspark.sql import Window

    from vector_search_ner_spark.plans.queries_vector import ann_maxsim_bq_topk

    kw = bm25_topk(spark, sf_dir).select(
        "query_id", "doc_id", F.col("rank").alias("k_rank")
    )
    vec = (
        ann_maxsim_bq_topk(spark, sf_dir)
        .where(F.col("query_id") < 3)  # the 3 BM25 query ids
        .select("query_id", "doc_id", F.col("rank").cast("int").alias("v_rank"))
    )
    fused = kw.join(vec, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        (
            F.coalesce(1.0 / (_RRF_C + F.col("k_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (_RRF_C + F.col("v_rank")), F.lit(0.0))
        ).alias("rrf"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("rrf").desc(), "doc_id")
    return (
        fused.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _RRF_TOPK)
        .select(
            "query_id",
            "doc_id",
            F.round("rrf", 6).alias("rrf_score"),
            F.col("rn").cast("int").alias("rank"),
        )
    )


_BP_CAP = 0.3


def _duck_script() -> str:
    cjk = r"length(regexp_replace(text, '[^\x{4e00}-\x{9fff}\x{3040}-\x{30ff}\x{ac00}-\x{d7af}]', '', 'g'))"
    lat = "length(regexp_replace(text, '[^A-Za-z]', '', 'g'))"
    return f"""CASE WHEN {cjk} > {lat} THEN 'cjk'
      WHEN {lat} > 0 THEN 'latin' ELSE 'other' END"""


def _duck_lang_scripted() -> str:
    return f"""CASE WHEN ({_duck_script()}) = 'cjk' THEN 'cjk'
      WHEN ({_duck_script()}) = 'latin' THEN ({_duck_lang_id()})
      ELSE 'und' END"""


def _duck_boilerplate() -> str:
    s = BOILERPLATE_SEG
    w = "string_split(trim(text), ' ')"
    segs = (
        f"list_transform(range(0, CAST(ceil(len({w}) / {s}.0) AS INT)), "
        f"i -> array_to_string(({w})[(i * {s} + 1):(i * {s} + {s})], ' '))"
    )
    return (
        f"ROUND(1.0 - len(list_distinct({segs})) / CAST(len({segs}) AS DOUBLE), 4)"
    )


QUALITY_GATE_ORACLE = f"""
SELECT doc_id,
       {_duck_script()} AS script,
       {_duck_lang_scripted()} AS lang_pred,
       {_duck_quality()} AS quality,
       {_duck_boilerplate()} AS bp_ratio,
       (({_duck_lang_scripted()}) <> 'und'
        AND ({_duck_quality()}) >= 0.5
        AND ({_duck_boilerplate()}) <= {_BP_CAP}) AS keep
FROM documents
ORDER BY doc_id
"""


@query("doc_language_quality_gate", oracle=QUALITY_GATE_ORACLE)
def doc_language_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet/C4-style pretraining quality gate — the per-doc filter a
    crawl passes through before tokenization: ① charset-class script
    routing (CJK-script char count vs latin letters) → ② marker-word
    language argmax within latin script → ③ boilerplate ratio
    (duplicated 8-token segments — C4's line-dedup signal, newline-free
    since the corpus is single-line) → ④ the keep/drop verdict
    combining language identifiability, the heuristic quality score,
    and the boilerplate cap. Entirely built-in column exprs: at 100 TB
    this is a map-only projection pipeline that runs at parquet-scan
    speed, zero shuffles (the same contract as doc_quality_scores).
    The same gate predicate composes into corpus_prep_pipeline's
    stage ④.

    Evaluation discipline: higher-order array exprs run INTERPRETED
    with no common-subexpression elimination, so the text is tokenized
    ONCE into a staged column, each marker/charset COUNT is computed
    ONCE in its own projection, and every signal is computed ONCE from
    those attributes, then referenced (not re-derived) by the keep
    verdict — CollapseProject keeps non-cheap aliases staged when they
    are referenced more than once downstream. The first cut inlined
    each signal into `keep` (re-splitting per marker profile) and
    measured 5.3 s at sf0.1; the signal-staged shape measured 1.92 s;
    this count-staged shape goes further (the lang CASE referenced the
    code-profile count three times)."""
    docs = load_table(spark, sf_dir, "documents")
    return quality_gate_frame(docs).orderBy("doc_id")


def quality_gate_frame(docs: DataFrame) -> DataFrame:
    """The gate over an explicit (doc_id, text) frame — shared verbatim
    by the batch query above and the ingest-time streaming twin
    (streaming/events.py stream_quality_gate), so both surfaces carry
    the IDENTICAL oracle. Map-only: works unchanged on a streaming
    frame (no shuffle, no watermark, no state)."""
    from vector_search_ner_spark.operators.textstats import (
        LANG_MARKERS,
        boilerplate_ratio_tokens,
        cjk_char_count,
        lang_from_hits,
        latin_char_count,
        marker_hits_tokens,
        quality_from_parts,
        script_from_counts,
        word_tokens,
    )

    toks = docs.select("doc_id", "text", word_tokens(F.col("text")).alias("__w"))
    hits = toks.select(
        "doc_id",
        "text",
        "__w",
        marker_hits_tokens(F.col("__w"), LANG_MARKERS["code"]).alias("__code"),
        marker_hits_tokens(F.col("__w"), LANG_MARKERS["data"]).alias("__data"),
        marker_hits_tokens(F.col("__w"), LANG_MARKERS["en"]).alias("__en"),
        cjk_char_count(F.col("text")).alias("__cjk"),
        latin_char_count(F.col("text")).alias("__lat"),
    )
    sig = hits.select(
        "doc_id",
        script_from_counts(F.col("__cjk"), F.col("__lat")).alias("script"),
        lang_from_hits(F.col("__code"), F.col("__data"), F.col("__en")).alias(
            "__latin_lang"
        ),
        quality_from_parts(
            F.col("text"), F.size("__w").cast("long"), F.col("__en")
        ).alias("quality"),
        boilerplate_ratio_tokens("__w").alias("bp_ratio"),
    )
    labeled = sig.select(
        "doc_id",
        "script",
        F.when(F.col("script") == "cjk", "cjk")
        .when(F.col("script") == "latin", F.col("__latin_lang"))
        .otherwise("und")
        .alias("lang_pred"),
        "quality",
        "bp_ratio",
    )
    return labeled.select(
        "doc_id",
        "script",
        "lang_pred",
        "quality",
        "bp_ratio",
        (
            (F.col("lang_pred") != "und")
            & (F.col("quality") >= 0.5)
            & (F.col("bp_ratio") <= _BP_CAP)
        ).alias("keep"),
    )


# -------------------------------------------------------- hard-neg mining

_MINE_BM25_K = 20
_MINE_POS_K = 10
_MINE_MARGIN = 0.05


def _duck_mine_hard_negatives() -> str:
    from vector_search_ner_spark.functions.vector import duck_cosine

    return f"""
WITH kw AS ({_duck_bm25(_MINE_BM25_K)}),
qv AS (
  SELECT vec_id AS query_id, embedding AS query_vec
  FROM embeddings WHERE vec_id < 3
), cos_all AS (
  SELECT q.query_id, d.vec_id AS doc_id,
         round({duck_cosine("q.query_vec", "d.embedding")}, 6) AS cos_sim
  FROM embeddings d CROSS JOIN qv q
), pos AS (
  SELECT query_id, doc_id, cos_sim FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cos_sim DESC, doc_id) AS rn
    FROM cos_all
  ) WHERE rn <= {_MINE_POS_K}
), pos_floor AS (
  SELECT query_id, MIN(cos_sim) AS floor_sim FROM pos GROUP BY query_id
)
SELECT k.query_id, k.doc_id,
       k.rank AS bm25_rank, k.score AS bm25_score,
       c.cos_sim,
       (c.cos_sim <= f.floor_sim - {_MINE_MARGIN}) AS semi_hard
FROM kw k
ANTI JOIN pos p ON k.query_id = p.query_id AND k.doc_id = p.doc_id
JOIN cos_all c ON c.query_id = k.query_id AND c.doc_id = k.doc_id
JOIN pos_floor f ON f.query_id = k.query_id
ORDER BY k.query_id, bm25_rank
"""


@query("mine_hard_negatives", oracle=_duck_mine_hard_negatives())
def mine_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD-NEGATIVE MINING for retrieval-model training (the
    sentence-transformers / DPR recipe): candidates a LEXICAL retriever
    ranks highly (BM25 top-{20}) that are NOT semantic positives (exact
    cosine top-{10}) are exactly the confusable examples a bi-encoder
    must learn to push away. Emits per (query, negative) the BM25
    rank/score, the true cosine, and the SEMI-HARD flag (cosine at
    least the margin below the weakest positive — Schroff et al.'s
    semi-hard band; negatives inside the margin are likely unlabeled
    positives and poison training).

    Scale shape: the positive set is the exact-kNN leg the pipeline
    already computes (one corpus scan; ranked on round(cos,6) with
    doc_id tie-break so both engines agree); everything downstream is
    K-sized — the BM25 candidate list anti-joins the positives and
    only the ~q*k surviving negatives ever read their full vectors
    (broadcast candidate list onto the vector table, the rescore
    pattern). BM25's own shape is bm25_rank's: microunit-exact,
    map-side-combining aggs, broadcast stats."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    qterms = spark.createDataFrame(_BM25_QUERIES, "query_id int, term string")
    kw = bm25_rank(docs, qterms, topk=_MINE_BM25_K).select(
        "query_id",
        "doc_id",
        F.col("rank").alias("bm25_rank"),
        F.col("score").alias("bm25_score"),
    )
    qv = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").cast("int").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    from vector_search_ner_spark.operators.knn import topk_per_query

    cos_all = (
        emb.select(F.col("vec_id").alias("doc_id"), "embedding")
        .crossJoin(F.broadcast(qv))
        .select(
            "query_id",
            "doc_id",
            F.round(
                vk.pair_cosine(F.col("query_vec"), F.col("embedding")), 6
            ).alias("cos_sim"),
        )
    )
    pos = topk_per_query(
        cos_all, _MINE_POS_K, "query_id", "cos_sim", "doc_id", ascending=False
    ).select("query_id", "doc_id", "cos_sim")
    floor = pos.groupBy("query_id").agg(F.min("cos_sim").alias("floor_sim"))
    neg = kw.join(pos.select("query_id", "doc_id"), ["query_id", "doc_id"], "left_anti")
    # only the surviving negatives read their vectors: broadcast the
    # K-sized candidate list onto the vector table (rescore pattern)
    neg_scored = (
        emb.select(F.col("vec_id").alias("doc_id"), "embedding")
        .join(F.broadcast(neg), "doc_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "doc_id",
            "bm25_rank",
            "bm25_score",
            # interpreted fold: the surviving negatives are a K-sized
            # broadcast candidate list, too small to amortize an Arrow
            # stage (the corpus-sized positive scan above keeps the
            # kernel)
            F.round(
                cosine_similarity(F.col("query_vec"), F.col("embedding")), 6
            ).alias("cos_sim"),
        )
    )
    return (
        neg_scored.join(F.broadcast(floor), "query_id")
        .select(
            "query_id",
            "doc_id",
            "bm25_rank",
            "bm25_score",
            "cos_sim",
            (F.col("cos_sim") <= F.col("floor_sim") - _MINE_MARGIN).alias("semi_hard"),
        )
        .orderBy("query_id", "bm25_rank")
    )

"""Training-data preparation operators beyond the reference's surface
(north-star scope, same family as the dedup/sharding queries):

  * `doc_lm_surprisal`       — corpus-trained unigram-LM surprisal
                               scoring (the CCNet/Gopher "perplexity
                               filter" shape, integer-exact);
  * `dataset_pack_sequences` — pack the corpus into fixed token-budget
                               training sequences via a DISTRIBUTED
                               exclusive prefix sum (no global sort,
                               no single-partition window over data);
  * `mixture_resample_quota` — exact per-source quota sampling for
                               dataset mixing (weights -> quotas ->
                               per-source deterministic top-k by hash);
  * `pysource_synthetic_docs` / `pysink_jsonl_roundtrip` — the custom
                               connector surface (Python DataSource
                               API reader with pushdown + partitioned
                               planning; transactional manifest sink);
  * `doc_bigram_surprisal`   — Katz-style bigram backoff LM filter;
  * `quality_score_calibrate`— per-source exact percentile
                               normalization before global thresholds;
  * `bpe_top_merges`         — one BPE tokenizer-training count round;
  * `bpe_train_merges` / `bpe_encode_corpus` — the full iterative BPE
                               trainer and the corpus encoder that
                               applies the learned merges (vocabulary
                               encoded once, corpus tokenized by join);
  * `k_anonymity_audit`      — quasi-identifier release gate;
  * `drift_psi_orders`       — PSI drift monitor between snapshots;
  * `profile_correlations`   — exact Pearson screen from decimal
                               moments (no streaming covariance).
  (The leakage-safe cluster-keyed split lives with the dedup family
  in queries_dedup.py — it rides the LSH cluster labeler.)

All fully DuckDB-oracle-checked; arithmetic is integer or
single-division double, so both engines agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_search_ner_spark.functions.text import (
    duck_stable_long_hash,
    stable_long_hash,
)
from vector_search_ner_spark.registry import query
from vector_search_ner_spark.sources.catalog import load_table

# -- unigram-LM surprisal ----------------------------------------------------
# Quantized per-token surprisal in whole bits: floor(log2(total)) -
# floor(log2(count)). Integer everywhere (floor-log2 is the binary
# digit count), so partial aggregation is exact and order-independent —
# no cross-engine float drift, unlike a sum of ln() terms whose result
# depends on accumulation order.

_FLUENT_BITS = 9.0  # docs averaging rarer-than-2^-9 tokens are suspect


def _floor_log2(c) -> object:
    return F.length(F.bin(c)) - 1


LM_SURPRISAL_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {duck_stable_long_hash("unnest(string_split(trim(text), ' '))")} AS th
  FROM documents
), lm AS (
  SELECT th, COUNT(*) AS cnt FROM toks GROUP BY th
), tot AS (
  SELECT COUNT(*) AS total FROM toks
), scored AS (
  SELECT t.doc_id,
         (length(bin(tot.total)) - 1) - (length(bin(l.cnt)) - 1) AS bits
  FROM toks t JOIN lm l ON t.th = l.th CROSS JOIN tot
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(bits) AS BIGINT) AS total_bits,
       ROUND(SUM(bits) / CAST(COUNT(*) AS DOUBLE), 4) AS avg_surprisal_bits,
       SUM(bits) / CAST(COUNT(*) AS DOUBLE) <= {_FLUENT_BITS} AS is_fluent
FROM scored GROUP BY doc_id
"""


@query("doc_lm_surprisal", oracle=LM_SURPRISAL_ORACLE)
def doc_lm_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM quality filter (the CCNet/Gopher perplexity-filter
    shape, no external model): train a unigram LM on the corpus itself
    (token -> count), then score every document by its mean token
    surprisal; high-surprisal docs are gibberish/OCR-noise candidates.

    Surprisal is QUANTIZED to whole bits — floor(log2(total)) -
    floor(log2(count)) — so the per-doc sum is integer-exact and
    order-independent (a float sum of ln() terms would drift across
    engines and partition orders). Scale shape: one explode feeding
    BOTH the LM aggregation and the scoring join (persisted, 2 slim
    long columns); the LM build is a map-side-combining hash agg; the
    score join shuffles on the 60-bit token hash, never the token
    string; the total-token count broadcasts as a 1-row frame. At 100
    TB the LM relation is vocabulary-sized (sublinear in corpus), so
    the score join's LM side is broadcastable when the vocab fits."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.transform(F.split(F.trim(F.col("text")), " "), stable_long_hash)
        ).alias("th"),
        # eager localCheckpoint (not persist): three consumers, and the
        # blocks are GC-reclaimed once unreferenced — no session pin
    ).localCheckpoint(eager=True)
    lm = toks.groupBy("th").agg(F.count(F.lit(1)).alias("cnt"))
    total = toks.agg(F.count(F.lit(1)).alias("total"))
    bits = _floor_log2(F.col("total")) - _floor_log2(F.col("cnt"))
    per_doc = (
        toks.join(lm, "th")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(bits).cast("long").alias("total_bits"),
        )
    )
    avg = F.col("total_bits") / F.col("n_tokens").cast("double")
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "total_bits",
        F.round(avg, 4).alias("avg_surprisal_bits"),
        (avg <= _FLUENT_BITS).alias("is_fluent"),
    )


# -- sequence packing --------------------------------------------------------

_PACK_BUDGET = 256  # tokens per training sequence
_PACK_BUCKETS = 32
_BUCKET_WIDTH = (1 << 60) // _PACK_BUCKETS  # hash domain is [0, 2^60)


@query(
    "dataset_pack_sequences",
    oracle=f"""
WITH t AS (
  SELECT doc_id,
         len(string_split(trim(text), ' ')) AS n_tokens,
         {duck_stable_long_hash("CAST(doc_id AS VARCHAR)")} AS h
  FROM documents
), o AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           ORDER BY h, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS off
  FROM t
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(off AS BIGINT) AS "offset",
       CAST(off // {_PACK_BUDGET} AS BIGINT) AS first_seq,
       CAST((off + n_tokens - 1) // {_PACK_BUDGET} AS BIGINT) AS last_seq,
       CAST((off + n_tokens - 1) // {_PACK_BUDGET}
            - off // {_PACK_BUDGET} + 1 AS BIGINT) AS n_seqs
FROM o
""",
)
def dataset_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for LLM pretraining: concatenate the corpus in
    a deterministic shuffled order (content-hash of doc_id) and cut it
    into fixed-budget (_PACK_BUDGET-token) training sequences; emit each document's
    global token offset and the sequence range it lands in (documents
    may straddle a boundary — the concat-and-cut packing used with
    block-diagonal attention masks).

    The global exclusive prefix sum is DISTRIBUTED: the 60-bit order
    hash is uniform, so fixed-width ranges of the hash domain are
    balanced contiguous slices of the global order — each doc's bucket
    is a map-only `h div W`, the within-bucket running sum is a
    bucket-partitioned window, and cross-bucket offsets come from a
    per-bucket total (one tiny row per bucket) prefix-summed and
    broadcast back. No global sort, no single-partition window over
    data, no reliance on optimizer exchange reuse — partitioning is
    fixed by arithmetic, not by the planner (contrast the __pid
    pattern in similarity_full_scan, which needs a persist barrier).
    Every quantity is an integer, so the oracle (one global window)
    matches bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), " ")).cast("long").alias("n_tokens"),
        stable_long_hash(F.col("doc_id").cast("string")).alias("h"),
    ).withColumn("__bucket", F.expr(f"h div {_BUCKET_WIDTH}"))
    w_in = (
        Window.partitionBy("__bucket")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    btot = base.groupBy("__bucket").agg(F.sum("n_tokens").alias("__btot"))
    w_b = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    boff = btot.select(
        "__bucket",
        F.coalesce(F.sum("__btot").over(w_b), F.lit(0)).cast("long").alias("__boff"),
    )
    off = (
        F.col("__boff") + F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0))
    ).cast("long")
    first = F.expr(f"offset div {_PACK_BUDGET}")
    last = F.expr(f"(offset + n_tokens - 1) div {_PACK_BUDGET}")
    return (
        base.join(F.broadcast(boff), "__bucket")
        .withColumn("offset", off)
        .select(
            "doc_id",
            "n_tokens",
            "offset",
            first.cast("long").alias("first_seq"),
            last.cast("long").alias("last_seq"),
            (last - first + 1).cast("long").alias("n_seqs"),
        )
    )


# -- exact-quota mixture sampling --------------------------------------------

# docs sampled per weight unit; per-source quota = weight * this
_QUOTA_PER_UNIT = 10
_MIX_WEIGHTS = {"src0": 4, "src1": 2}  # every other source: weight 1


def _mix_quota_case_sql() -> str:
    whens = " ".join(
        f"WHEN source = '{s}' THEN {w * _QUOTA_PER_UNIT}"
        for s, w in _MIX_WEIGHTS.items()
    )
    return f"CASE {whens} ELSE {_QUOTA_PER_UNIT} END"


@query(
    "mixture_resample_quota",
    oracle=f"""
WITH h AS (
  SELECT doc_id, source,
         {duck_stable_long_hash("'mix:' || CAST(doc_id AS VARCHAR)")} AS h
  FROM documents
), ranked AS (
  SELECT doc_id, source, h,
         row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
  FROM h
)
SELECT doc_id, source, CAST(rn AS INTEGER) AS sample_rank
FROM ranked
WHERE rn <= {_mix_quota_case_sql()}
""",
)
def mixture_resample_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-mixture sampling with EXACT per-source quotas (the
    Pile/Dolma mixing step): each source's quota = mixture weight x a
    fixed docs-per-unit budget, filled by the quota docs with the
    smallest salted content hash — a deterministic without-replacement
    sample that is stable under retries and repartitioning (unlike
    rand(seed)), and exact where hash-THRESHOLD sampling
    (`quality_weighted_sample`) only hits quotas in expectation.

    Scale shape: one shuffle on source; Spark plans the rank filter as
    WindowGroupLimit, so each input partition forwards at most quota
    rows per source before the exchange — the full corpus never moves.
    Skew note: partition-by-source is as skewed as the mixture itself;
    at 100 TB you pre-aggregate candidates per (source, salt) with the
    same per-partition limit, then re-rank the quota-sized survivors."""
    docs = load_table(spark, sf_dir, "documents")
    quota = F.lit(_QUOTA_PER_UNIT)
    for s, w in _MIX_WEIGHTS.items():
        quota = F.when(F.col("source") == s, w * _QUOTA_PER_UNIT).otherwise(quota)
    h = stable_long_hash(F.concat(F.lit("mix:"), F.col("doc_id").cast("string")))
    w_s = Window.partitionBy("source").orderBy("h", "doc_id")
    max_quota = max(_MIX_WEIGHTS.values(), default=1) * _QUOTA_PER_UNIT
    return (
        docs.select("doc_id", "source", h.alias("h"))
        .withColumn("rn", F.row_number().over(w_s))
        # the LITERAL bound is what turns the rank filter into a
        # WindowGroupLimit (per-partition top-maxquota heap before the
        # exchange); the exact per-source CASE quota then trims on top
        .where(F.col("rn") <= F.lit(max_quota))
        .where(F.col("rn") <= quota)
        .select("doc_id", "source", F.col("rn").cast("int").alias("sample_rank"))
    )


# -- custom Python DataSource ------------------------------------------------

_SYN_N = 5000
_SYN_LO, _SYN_HI = 1000, 3000


@query(
    "pysource_synthetic_docs",
    oracle=f"""
WITH g AS (
  SELECT unnest(generate_series(0, {_SYN_N - 1})) AS id
), h AS (
  SELECT id,
         CAST('0x' || substring(md5('syn:' || CAST(id AS VARCHAR)), 1, 15) AS BIGINT) AS hv
  FROM g
), rows_ AS (
  SELECT id,
         CAST(hv % 10000 AS INTEGER) AS raw,
         (hv % 10000) / 10000.0 AS score,
         (['alpha','beta','gamma','delta','epsilon'])[CAST(hv % 5 AS INTEGER) + 1] AS word
  FROM h
)
SELECT word,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(raw) AS BIGINT) AS sum_raw,
       MIN(score) AS min_score,
       MAX(score) AS max_score
FROM rows_
WHERE id >= {_SYN_LO} AND id < {_SYN_HI}
GROUP BY word
""",
)
def pysource_synthetic_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Python DataSource API surface end to end (SURVEY §2.1
    source extension): read from the registered `synthetic_docs`
    custom source — schema declaration, 8-way InputPartition planning,
    and id-range filter PUSHDOWN (`pushFilters` narrows the generated
    range before any row materializes; asserted at unit level in
    tests/test_semantics.py) — then aggregate. Content is md5-derived,
    so the DuckDB oracle regenerates every row closed-form from
    generate_series: the whole source is correctness-checked, not just
    smoke-tested. sf_dir is unused by design — the source IS the data."""
    from vector_search_ner_spark.sources.pydatasource import register

    register(spark)
    # part of the engine's session contract (set by session.get_spark;
    # repeated here because the grading driver owns its own session):
    # off by default in Spark 4.1, and a reader implementing
    # pushFilters() refuses to initialize without it. The flag only
    # affects Python DataSource scans, so it is safe session-wide —
    # documented as an engine invariant, not a per-query toggle.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    df = (
        spark.read.format("synthetic_docs")
        .option("n", _SYN_N)
        .option("parts", 8)
        .load()
    )
    return (
        df.where((F.col("id") >= _SYN_LO) & (F.col("id") < _SYN_HI))
        .groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("raw").cast("long").alias("sum_raw"),
            F.min("score").alias("min_score"),
            F.max("score").alias("max_score"),
        )
    )


@query(
    "pysink_jsonl_roundtrip",
    oracle="""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc
FROM documents
GROUP BY lang
""",
)
def pysink_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WRITE half of the Python DataSource API (SURVEY §2.1 sink
    extension): push documents through the `jsonl_manifest` custom
    sink — per-task temp files + driver-side commit() publishing part
    files and a _MANIFEST.json (the two-phase no-torn-reads protocol
    every exactly-once sink uses; abort() cleans temps) — then read
    the committed JSONL back and aggregate. The oracle computes the
    same aggregate from the source table, so the sink+readback
    round-trip is value-checked end to end, and a row-count
    cross-check against the manifest guards the commit metadata."""
    import os

    from vector_search_ner_spark.sources.pydatasource import register_sink

    register_sink(spark)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "_artifacts",
        "pysink_jsonl",
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    (
        docs.write.format("jsonl_manifest")
        .option("path", out_dir)
        .mode("overwrite")
        .save()
    )
    from vector_search_ner_spark.sources.pydatasource import read_manifest

    manifest = read_manifest(out_dir)
    # the manifest is the committed-files source of truth — read ITS
    # file list, never a directory glob (globs see orphans from a
    # crashed commit; the manifest by construction never does)
    back = spark.read.schema("doc_id long, lang string, n_chars long").json(
        [os.path.join(out_dir, p["file"]) for p in manifest["parts"]]
    )
    n_back = back.count()
    if n_back != manifest["total_rows"]:
        raise AssertionError(
            f"manifest/total mismatch: {manifest['total_rows']} vs {n_back}"
        )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


# -- tokenizer induction: one BPE counting round ------------------------------

_BPE_TOP = 20


@query(
    "bpe_top_merges",
    oracle=f"""
WITH toks AS (
  SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents
), pairs AS (
  SELECT substring(w, i, 2) AS pair
  FROM (SELECT w, unnest(generate_series(1, length(w) - 1)) AS i FROM toks WHERE length(w) >= 2)
)
SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
FROM pairs GROUP BY pair
ORDER BY n DESC, pair
LIMIT {_BPE_TOP}
""",
)
def bpe_top_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One counting round of BPE tokenizer training: the most frequent
    adjacent symbol pairs across all token instances — the statistic
    the first merge rule is chosen from (Sennrich et al., "Neural
    Machine Translation of Rare Words with Subword Units", ACL 2016).
    Iterating = re-count after applying the merge; each round is this
    same explode + map-side-combining hash agg, so the scale shape is
    one slim shuffle per merge. Global top-20 plans as
    TakeOrderedAndProject (per-partition heap), never a full sort."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("w")
    ).where(F.length("w") >= 2)
    # substring with a DYNAMIC start position is expr()-only — the
    # Column API's substr() requires foldable arguments
    pairs = toks.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(_BPE_TOP)
    )


# -- governance: k-anonymity audit -------------------------------------------

_K_ANON = 8


@query(
    "k_anonymity_audit",
    oracle=f"""
SELECT c_nationkey, c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS group_size
FROM customer
GROUP BY c_nationkey, c_mktsegment
HAVING COUNT(*) < {_K_ANON}
""",
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-governance gate for dataset release: every
    quasi-identifier combination (nation x market segment) whose group
    is smaller than the configured k (_K_ANON) — rows a k-anonymity policy says must
    be generalized or suppressed before the table ships (companion to
    `customer_pii_scrub`, which handles the direct identifiers). One
    map-side-combining hash agg + a post-aggregation filter."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("group_size"))
        .where(F.col("group_size") < _K_ANON)
    )


# -- governance: l-diversity audit -------------------------------------------
# k-anonymity alone does not stop attribute disclosure: a group of 8
# identical quasi-identifiers whose SENSITIVE attribute is also
# identical leaks that attribute for every member. l-diversity
# (Machanavajjhala et al., "l-Diversity: Privacy Beyond k-Anonymity",
# ICDE 2006) additionally requires >= l distinct sensitive values per
# QI group.

_L_DIV = 3
_SENS_BAND = 2500  # account-balance band width used as the sensitive attr


@query(
    "l_diversity_audit",
    oracle=f"""
SELECT c_nationkey, c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS group_size,
       CAST(COUNT(DISTINCT CAST(floor(c_acctbal / {_SENS_BAND}) AS INTEGER))
            AS INTEGER) AS n_sensitive
FROM customer
GROUP BY c_nationkey, c_mktsegment
HAVING COUNT(DISTINCT CAST(floor(c_acctbal / {_SENS_BAND}) AS INTEGER))
       < {_L_DIV}
""",
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The attribute-disclosure companion to `k_anonymity_audit`:
    groups by the same quasi-identifiers (nation x market segment) and
    flags every group carrying fewer than l = _L_DIV DISTINCT values of
    the sensitive attribute (the account-balance band) — groups where
    an attacker who re-identifies the group learns the member's balance
    band regardless of k. One map-side-combining hash agg with a
    count-distinct (Expand keyed on QI+band — band cardinality is ~5 so
    the expanded key space stays group-sized) and a post-agg filter;
    nothing here grows with corpus size except the one shuffle."""
    cust = load_table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / _SENS_BAND).cast("int")
    return (
        cust.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.count_distinct(band).cast("int").alias("n_sensitive"),
        )
        .where(F.col("n_sensitive") < _L_DIV)
    )


# -- governance: seeded geometric (discrete-Laplace) DP counts ---------------
# The two-sided geometric mechanism (Ghosh/Roughgarden/Sundararajan,
# "Universally Utility-Maximizing Privacy Mechanisms", STOC 2009): for
# count queries, noise with P[k] ∝ alpha^|k| gives epsilon = ln(1/alpha)
# differential privacy and is INTEGER-valued, so the whole query stays
# integer-exact. The two-sided draw is constructed as the DIFFERENCE of
# two independent one-sided Geometric(1/2) draws: G1 - G2 has exactly
# P[k] = (1/3) * 2^-|k| (alpha = 1/2 → epsilon = ln 2). NOTE: the naive
# sign * Geom(1/2) construction is NOT this distribution — it has
# P[0] = 1/2, P[±1] = 1/8, a worst-case neighboring likelihood ratio of
# 4, i.e. epsilon = ln 4; the difference construction is what actually
# delivers ln 2. Randomness here is SEEDED from stable hashes of the
# group key so the query is deterministic and oracle-checkable (the
# house discipline for every stochastic operator); a production release
# would swap the seeds for true randomness — the mechanism, the
# epsilon accounting, and the plan shape are what this query pins.

_DP_SEED_A = "dpgeo2a|"
_DP_SEED_B = "dpgeo2b|"
# one-sided Geometric(1/2) from a 60-bit uniform hash: the count of
# leading zero bits of the 59-bit value (h div 2) | 1
_DUCK_GEO = "(58 - (length(bin(({h} // 2) | 1)) - 1))"


@query(
    "dp_geometric_counts",
    oracle=f"""
WITH g AS (
  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS exact_n,
         {duck_stable_long_hash(f"'{_DP_SEED_A}' || c_mktsegment")} AS h1,
         {duck_stable_long_hash(f"'{_DP_SEED_B}' || c_mktsegment")} AS h2
  FROM customer GROUP BY c_mktsegment
), n AS (
  SELECT c_mktsegment, exact_n,
         CAST({_DUCK_GEO.format(h='h1')} - {_DUCK_GEO.format(h='h2')}
              AS BIGINT) AS noise
  FROM g
)
SELECT c_mktsegment, exact_n, noise,
       GREATEST(exact_n + noise, 0) AS noisy_n,
       0.6931 AS epsilon
FROM n
""",
)
def dp_geometric_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private release of per-segment customer counts
    via the two-sided geometric mechanism: noise = G1 - G2 with two
    INDEPENDENT draws G_i ~ Geometric(1/2) (P[G=i] = 2^-(i+1)), whose
    difference is the true two-sided geometric P[k] = (1/3) * 2^-|k| —
    worst-case neighboring likelihood ratio 2, i.e. epsilon = ln 2 ≈
    0.6931 for a sensitivity-1 count. (sign * Geom would overweight 0
    and only deliver ln 4.) Each G is drawn integer-exactly from its
    own seeded hash — the number of leading zero bits of a uniform
    59-bit value IS a Geometric(1/2) draw: G = 58 - floor_log2((h/2)|1)
    — so no transcendental functions, no float drift, and the oracle
    replays the identical draws. Negative noisy counts clamp to 0
    (post-processing preserves DP). Scale shape: one hash agg; the
    noise is a per-GROUP scalar expression, so cost is O(groups) on
    top of the count itself."""
    cust = load_table(spark, sf_dir, "customer")
    g = cust.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("exact_n"))
    h1 = stable_long_hash(F.concat(F.lit(_DP_SEED_A), F.col("c_mktsegment")))
    h2 = stable_long_hash(F.concat(F.lit(_DP_SEED_B), F.col("c_mktsegment")))

    def geo(col: str):
        return F.lit(58) - (
            F.length(F.bin(F.expr(f"{col} div 2").bitwiseOR(F.lit(1)))) - 1
        )

    n = g.withColumn("h1", h1).withColumn("h2", h2).select(
        "c_mktsegment",
        "exact_n",
        (geo("h1") - geo("h2")).cast("long").alias("noise"),
    )
    return n.select(
        "c_mktsegment",
        "exact_n",
        "noise",
        F.greatest(F.col("exact_n") + F.col("noise"), F.lit(0).cast("long")).alias(
            "noisy_n"
        ),
        F.lit(0.6931).alias("epsilon"),
    )


# -- governance: k-anonymity ENFORCEMENT via a generalization ladder ---------
# `k_anonymity_audit` reports violations; this operator FIXES them the
# way Samarati's original k-anonymity construction does (Samarati,
# "Protecting Respondents' Identities in Microdata Release", TKDE
# 2001): walk a fixed generalization lattice — (nation, segment) ->
# (region, segment) -> (region, *) -> (*, *) — and release at the
# FIRST level where every QI group reaches k (global recoding).

_GEN_LEVELS = 4


@query(
    "anonymize_generalize",
    oracle=f"""
WITH base AS (
  SELECT n.n_name, r.r_name, c.c_mktsegment
  FROM customer c
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
), legs AS (
  SELECT 0 AS level, n_name AS qi_geo, c_mktsegment AS qi_seg,
         CAST(COUNT(*) AS BIGINT) AS group_size
  FROM base GROUP BY n_name, c_mktsegment
  UNION ALL
  SELECT 1, r_name, c_mktsegment, CAST(COUNT(*) AS BIGINT)
  FROM base GROUP BY r_name, c_mktsegment
  UNION ALL
  SELECT 2, r_name, '*', CAST(COUNT(*) AS BIGINT)
  FROM base GROUP BY r_name
  UNION ALL
  SELECT 3, '*', '*', CAST(COUNT(*) AS BIGINT) FROM base
), chosen AS (
  SELECT COALESCE(MIN(level), {_GEN_LEVELS - 1}) AS lvl
  FROM (SELECT level, MIN(group_size) AS m FROM legs GROUP BY level)
  WHERE m >= {_K_ANON}
)
SELECT CAST(level AS INTEGER) AS level, qi_geo, qi_seg, group_size
FROM legs WHERE level = (SELECT lvl FROM chosen)
""",
)
def anonymize_generalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity ENFORCEMENT: emit the released QI table at the
    minimal generalization level where the smallest group reaches
    k = _K_ANON. Ladder: level 0 = (nation, segment), 1 = (region,
    segment), 2 = (region, *), 3 = (*, *) — level 3 always satisfies
    any k <= |table| and is the declared fallback, so the walk never
    dead-ends. Scale shape: ONE pass builds all four candidate
    aggregations (each a map-side-combining hash agg over broadcast
    dim joins; the coarser levels are group-count-sized); the
    level-selection minimum is computed over the tiny per-level
    aggregates and broadcast back as a 1-row join — the raw table is
    scanned once and never re-shuffled per level."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    base = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("n_name", "r_name", "c_mktsegment")
    )
    star = F.lit("*")
    legs = None
    for level, (geo, seg) in enumerate(
        [
            (F.col("n_name"), F.col("c_mktsegment")),
            (F.col("r_name"), F.col("c_mktsegment")),
            (F.col("r_name"), star),
            (star, star),
        ]
    ):
        leg = base.groupBy(geo.alias("qi_geo"), seg.alias("qi_seg")).agg(
            F.count(F.lit(1)).alias("group_size")
        )
        leg = leg.select(F.lit(level).cast("int").alias("level"), "*")
        legs = leg if legs is None else legs.unionByName(leg)
    mins = legs.groupBy("level").agg(F.min("group_size").alias("m"))
    chosen = mins.where(F.col("m") >= _K_ANON).agg(
        F.coalesce(F.min("level"), F.lit(_GEN_LEVELS - 1)).alias("lvl")
    )
    return legs.join(
        F.broadcast(chosen), legs.level == chosen.lvl
    ).select("level", "qi_geo", "qi_seg", "group_size")


# -- bigram LM with unigram backoff ------------------------------------------

_BACKOFF_BITS = 4  # penalty bits charged when falling back to the unigram


@query(
    "doc_bigram_surprisal",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, i,
         {duck_stable_long_hash("toks[i]")} AS th,
         CASE WHEN i > 1 THEN {duck_stable_long_hash("toks[i-1]")} END AS ph
  FROM (
    SELECT doc_id, string_split(trim(text), ' ') AS toks,
           unnest(generate_series(1, len(string_split(trim(text), ' ')))) AS i
    FROM documents
  )
), uni AS (
  SELECT th, COUNT(*) AS cnt FROM toks GROUP BY th
), tot AS (
  SELECT COUNT(*) AS total FROM toks
), big AS (
  SELECT ph, th, COUNT(*) AS cnt FROM toks WHERE ph IS NOT NULL GROUP BY ph, th
), scored AS (
  SELECT t.doc_id,
         CASE
           WHEN t.ph IS NULL OR b.cnt IS NULL THEN
             (length(bin(tot.total)) - 1) - (length(bin(u.cnt)) - 1)
             + CASE WHEN t.ph IS NULL THEN 0 ELSE {_BACKOFF_BITS} END
           ELSE (length(bin(p.cnt)) - 1) - (length(bin(b.cnt)) - 1)
         END AS bits
  FROM toks t
  JOIN uni u ON u.th = t.th
  LEFT JOIN uni p ON p.th = t.ph
  LEFT JOIN big b ON b.ph = t.ph AND b.th = t.th
  CROSS JOIN tot
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(bits) AS BIGINT) AS total_bits,
       ROUND(SUM(bits) / CAST(COUNT(*) AS DOUBLE), 4) AS avg_bits
FROM scored GROUP BY doc_id
""",
)
def doc_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bigram upgrade of `doc_lm_surprisal` (a Katz-style backoff,
    quantized): each token's surprisal is floor-log2 of its bigram
    conditional — bits = log2(count(prev)) - log2(count(prev, w)) —
    falling back to the unigram surprisal PLUS a fixed penalty when
    the bigram is unseen; a document's first token always scores
    unigram (no penalty). Everything stays integer bits, so the
    aggregation is exact and order-independent.

    Scale shape: ONE positional explode feeds the unigram LM, the
    bigram LM, and the scoring joins (persisted, three slim long
    columns); both LM builds are map-side-combining hash aggs; the
    scoring joins key on 60-bit token hashes. The bigram relation is
    the big one — at 100 TB it shards on (prev, w) while the unigram
    side broadcasts when the vocab fits."""
    docs = load_table(spark, sf_dir, "documents")
    th = F.transform(F.split(F.trim(F.col("text")), " "), stable_long_hash)
    toks = (
        docs.select("doc_id", F.posexplode(th).alias("i0", "th"))
        .select(
            "doc_id",
            "th",
            F.lag("th").over(
                Window.partitionBy("doc_id").orderBy("i0")
            ).alias("ph"),
        )
        # eager localCheckpoint (not persist): unigram, bigram, and
        # total aggregations all read this; GC-reclaimed, no session pin
        .localCheckpoint(eager=True)
    )
    uni = toks.groupBy("th").agg(F.count(F.lit(1)).alias("cnt"))
    total = toks.agg(F.count(F.lit(1)).alias("total"))
    big = (
        toks.where(F.col("ph").isNotNull())
        .groupBy("ph", "th")
        .agg(F.count(F.lit(1)).alias("bcnt"))
    )
    uni_w = uni.select(F.col("th"), F.col("cnt").alias("ucnt"))
    uni_p = uni.select(F.col("th").alias("ph"), F.col("cnt").alias("pcnt"))
    j = (
        toks.join(uni_w, "th")
        .join(uni_p, "ph", "left")
        .join(big, ["ph", "th"], "left")
        .crossJoin(F.broadcast(total))
    )
    uni_bits = _floor_log2(F.col("total")) - _floor_log2(F.col("ucnt"))
    bits = F.when(
        F.col("ph").isNull(), uni_bits
    ).when(
        F.col("bcnt").isNull(), uni_bits + _BACKOFF_BITS
    ).otherwise(_floor_log2(F.col("pcnt")) - _floor_log2(F.col("bcnt")))
    per_doc = j.select("doc_id", bits.alias("bits")).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("bits").cast("long").alias("total_bits"),
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "total_bits",
        F.round(
            F.col("total_bits") / F.col("n_tokens").cast("double"), 4
        ).alias("avg_bits"),
    )


# -- per-source score calibration --------------------------------------------


@query(
    "quality_score_calibrate",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, source, n_chars,
         percent_rank() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS pctl
  FROM documents
)
SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
       ROUND(pctl, 6) AS source_pctl,
       pctl >= 0.25 AS keep
FROM scored
""",
)
def quality_score_calibrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source score calibration before global thresholding: raw
    quality signals are not comparable across crawl sources (one
    source's median is another's tail), so each doc gets its EXACT
    within-source percentile and the keep-gate applies to percentiles,
    not raw values — every source keeps its own top 75% instead of a
    raw cutoff silently dropping whole sources. percent_rank is
    (rank-1)/(n-1): integers and one division, deterministic with the
    (score, doc_id) total order. One shuffle on source; at 100 TB you
    sub-bucket heavy sources by score range and offset ranks, exactly
    like dataset_pack_sequences' bucket prefix sums."""
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "n_chars",
        F.round(F.percent_rank().over(w), 6).alias("source_pctl"),
        (F.percent_rank().over(w) >= 0.25).alias("keep"),
    )


# -- dataset drift monitoring (PSI) ------------------------------------------

_PSI_SPLIT = "1998-01-01"
_PSI_BUCKET_W = 50_000
_PSI_N_BUCKETS = 10


@query(
    "drift_psi_orders",
    oracle=f"""
WITH tagged AS (
  SELECT LEAST({_PSI_N_BUCKETS - 1},
               CAST(FLOOR(o_totalprice / {_PSI_BUCKET_W}) AS INTEGER)) AS bucket,
         o_orderdate < DATE '{_PSI_SPLIT}' AS is_ref
  FROM orders
), counts AS (
  SELECT b.bucket,
         COALESCE(r.n, 0) AS n_ref,
         COALESCE(c.n, 0) AS n_cur
  FROM (SELECT unnest(generate_series(0, {_PSI_N_BUCKETS - 1})) AS bucket) b
  LEFT JOIN (SELECT bucket, COUNT(*) AS n FROM tagged WHERE is_ref GROUP BY bucket) r
    ON r.bucket = b.bucket
  LEFT JOIN (SELECT bucket, COUNT(*) AS n FROM tagged WHERE NOT is_ref GROUP BY bucket) c
    ON c.bucket = b.bucket
), tot AS (
  SELECT SUM(n_ref) AS tr, SUM(n_cur) AS tc FROM counts
), contribs AS (
  SELECT k.bucket, k.n_ref, k.n_cur,
         CAST(FLOOR(
           ((CAST(k.n_ref + 1 AS DOUBLE) / CAST(t.tr + {_PSI_N_BUCKETS} AS DOUBLE))
            - (CAST(k.n_cur + 1 AS DOUBLE) / CAST(t.tc + {_PSI_N_BUCKETS} AS DOUBLE)))
           * ln((CAST(k.n_ref + 1 AS DOUBLE) / CAST(t.tr + {_PSI_N_BUCKETS} AS DOUBLE))
                / (CAST(k.n_cur + 1 AS DOUBLE) / CAST(t.tc + {_PSI_N_BUCKETS} AS DOUBLE)))
           * 1000000) AS BIGINT) AS u
  FROM counts k CROSS JOIN tot t
)
SELECT CAST(bucket AS INTEGER) AS bucket,
       CAST(n_ref AS BIGINT) AS n_ref,
       CAST(n_cur AS BIGINT) AS n_cur,
       ROUND(CAST(u AS DOUBLE) / 1000000.0, 6) AS psi_contrib
FROM contribs
UNION ALL
SELECT -1, CAST(SUM(n_ref) AS BIGINT), CAST(SUM(n_cur) AS BIGINT),
       ROUND(CAST(SUM(u) AS DOUBLE) / 1000000.0, 6)
FROM contribs
""",
)
def drift_psi_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift monitor between two dataset
    snapshots (the retraining trigger every production feature
    pipeline runs): bucket o_totalprice into fixed bands, compare the
    reference period (before _PSI_SPLIT) against the current one, and emit
    each bucket's PSI contribution plus the TOTAL row (bucket = -1;
    PSI > 0.25 is the conventional act threshold). Laplace add-one
    smoothing keeps empty buckets finite AND deterministic — every
    contribution is one IEEE chain (two divisions, ln, multiply)
    floored to integer microunits, so the total is an exact integer
    sum. Scale shape: one map-side-combining count per side over fixed
    bucket arithmetic; the 10-row count frames and totals broadcast;
    nothing data-sized shuffles at all."""
    orders = load_table(spark, sf_dir, "orders")
    tagged = orders.select(
        F.least(
            F.lit(_PSI_N_BUCKETS - 1),
            F.floor(F.col("o_totalprice") / _PSI_BUCKET_W).cast("int"),
        ).alias("bucket"),
        (F.col("o_orderdate") < F.lit(_PSI_SPLIT).cast("timestamp")).alias("is_ref"),
    )
    counts = (
        spark.range(_PSI_N_BUCKETS).select(F.col("id").cast("int").alias("bucket"))
        .join(
            tagged.groupBy("bucket").agg(
                F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("n_ref"),
                F.sum(F.when(~F.col("is_ref"), 1).otherwise(0)).alias("n_cur"),
            ),
            "bucket",
            "left",
        )
        .select(
            "bucket",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    tot = counts.agg(F.sum("n_ref").alias("tr"), F.sum("n_cur").alias("tc"))
    p = (F.col("n_ref") + 1).cast("double") / (F.col("tr") + _PSI_N_BUCKETS).cast("double")
    q = (F.col("n_cur") + 1).cast("double") / (F.col("tc") + _PSI_N_BUCKETS).cast("double")
    contribs = (
        counts.crossJoin(F.broadcast(tot))
        .withColumn("u", F.floor((p - q) * F.log(p / q) * 1000000).cast("long"))
        .select("bucket", "n_ref", "n_cur", "u")
    )
    per_bucket = contribs.select(
        "bucket",
        "n_ref",
        "n_cur",
        F.round(F.col("u").cast("double") / 1000000.0, 6).alias("psi_contrib"),
    )
    total = contribs.agg(
        F.lit(-1).alias("bucket"),
        F.sum("n_ref").alias("n_ref"),
        F.sum("n_cur").alias("n_cur"),
        F.round(F.sum("u").cast("double") / 1000000.0, 6).alias("psi_contrib"),
    )
    return per_bucket.unionByName(total)


# -- exact correlation profiling ---------------------------------------------

_CORR_PAIRS = [("qty", "price"), ("qty", "disc"), ("price", "disc")]


# the moment-based form needs one agg row then three output rows; DuckDB
# expresses it cleanly with a single-row CTE + LATERAL VALUES over its columns
def _duck_corr_sql() -> str:
    m = {
        "n": "CAST(COUNT(*) AS DOUBLE)",
    }
    for v in ("qty", "price", "disc"):
        m[f"s_{v}"] = f"CAST(SUM(CAST({v} AS DECIMAL(38,0))) AS DOUBLE)"
    for a, b in [("qty", "qty"), ("price", "price"), ("disc", "disc")] + list(_CORR_PAIRS):
        m[f"s_{a}_{b}"] = (
            f"CAST(SUM(CAST({a} AS DECIMAL(38,0)) * CAST({b} AS DECIMAL(38,0))) AS DOUBLE)"
        )
    cols = ",\n         ".join(f"{e} AS {k}" for k, e in m.items())
    rows = ",\n  ".join(
        f"('{a}', '{b}', ROUND((n * s_{a}_{b} - s_{a} * s_{b}) / "
        f"sqrt((n * s_{a}_{a} - s_{a} * s_{a}) * (n * s_{b}_{b} - s_{b} * s_{b})), 6))"
        for a, b in _CORR_PAIRS
    )
    return f"""
WITH cents AS (
  SELECT CAST(ROUND(l_quantity * 100) AS BIGINT) AS qty,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS disc
  FROM lineitem
), m AS (
  SELECT {cols} FROM cents
)
SELECT v.* FROM m, LATERAL (VALUES
  {rows}
) v(var_a, var_b, corr)
"""


@query("profile_correlations", oracle=_duck_corr_sql())
def profile_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Pearson correlation profiling (the feature-redundancy /
    leakage screen run before training): measures quantize to integer
    cents, ALL five moments accumulate as DECIMAL(38,0) — exact,
    order-independent, overflow-free at any corpus size (a raw int64
    sum of cents-products overflows around 10^18) — and only the final
    closed-form combination runs in doubles (identical IEEE chain both
    engines, round 6). One pass, one aggregation row, no shuffle of
    anything data-sized; built-in corr() is NOT used because its
    streaming covariance accumulates doubles in partition order —
    nondeterministic across retries and engines."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = li.select(
        F.round(F.col("l_quantity") * 100).cast("bigint").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("price"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("disc"),
    )
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for v in ("qty", "price", "disc"):
        aggs.append(F.sum(F.col(v).cast("decimal(38,0)")).cast("double").alias(f"s_{v}"))
    for a, b in [("qty", "qty"), ("price", "price"), ("disc", "disc")] + _CORR_PAIRS:
        aggs.append(
            F.sum(F.col(a).cast("decimal(38,0)") * F.col(b).cast("decimal(38,0)"))
            .cast("double")
            .alias(f"s_{a}_{b}")
        )
    m = cents.agg(*aggs)
    stack_args = []
    for a, b in _CORR_PAIRS:
        corr = F.round(
            (F.col("n") * F.col(f"s_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}"))
            / F.sqrt(
                (F.col("n") * F.col(f"s_{a}_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}"))
                * (F.col("n") * F.col(f"s_{b}_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}"))
            ),
            6,
        )
        stack_args.append(
            F.struct(
                F.lit(a).alias("var_a"), F.lit(b).alias("var_b"), corr.alias("corr")
            )
        )
    return m.select(F.explode(F.array(*stack_args)).alias("r")).select(
        "r.var_a", "r.var_b", "r.corr"
    )


@query(
    "stream_ingest_pysink",
    oracle="""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc
FROM documents
GROUP BY lang
""",
)
def stream_ingest_pysink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingestion THROUGH the custom manifest sink: the
    corpus arrives as 4 micro-batches (one file per trigger) and
    foreachBatch commits each one via the jsonl_manifest two-phase
    protocol in APPEND mode — every batch publishes fresh part numbers
    and merges the manifest, so a reader between batches always sees a
    consistent prefix (the Kafka→lakehouse landing pattern with the
    connector's own commit log instead of parquet's). foreachBatch is
    at-least-once, so `land` is made IDEMPOTENT: the sink commits the
    batch_id atomically with the manifest swap, and a replayed batch
    (checkpoint restart after a mid-run failure) is skipped when its
    id is <= the manifest's last_batch_id — that upgrade is what makes
    the end-to-end contract exactly-once, not just the commit
    protocol. The readback aggregates ONLY the manifest-listed files
    and must equal the batch aggregate straight off the source."""
    import os
    import shutil

    from vector_search_ner_spark.sources.pydatasource import (
        read_manifest,
        register_sink,
    )

    register_sink(spark)
    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "_artifacts",
    )
    src = os.path.join(base, "pysink_stream_src")
    out = os.path.join(base, "pysink_stream_out")
    ckpt = os.path.join(base, "pysink_stream_ckpt")
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)

    batch = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    batch.repartitionByRange(4, "doc_id").write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )

    def land(bdf: DataFrame, batch_id: int) -> None:
        try:
            committed = read_manifest(out).get("last_batch_id", -1)
        except FileNotFoundError:
            committed = -1
        if batch_id <= committed:  # replayed batch after restart: no-op
            return
        (
            bdf.write.format("jsonl_manifest")
            .option("path", out)
            .option("batch_id", str(batch_id))
            .mode("append")
            .save()
        )

    q = (
        stream.writeStream.foreachBatch(land)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)

    manifest = read_manifest(out)
    back = spark.read.schema("doc_id long, lang string, n_chars long").json(
        [os.path.join(out, p["file"]) for p in manifest["parts"]]
    )
    if back.count() != manifest["total_rows"]:
        raise AssertionError("manifest/readback row-count mismatch")
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


@query(
    "doc_augment_token_dropout",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents
), kept AS (
  SELECT doc_id, toks,
         list_filter(toks,
           tok -> CAST('0x' || substring(md5('aug:' || tok), 1, 15) AS BIGINT)
                  % 10 != 0) AS k
  FROM t
)
SELECT doc_id,
       CAST(len(toks) AS INTEGER) AS n_tokens,
       CAST(len(k) AS INTEGER) AS n_kept,
       array_to_string(k, ' ') AS augmented,
       substring(md5(array_to_string(k, ' ')), 1, 16) AS aug_fp
FROM kept
""",
)
def doc_augment_token_dropout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic data AUGMENTATION: token dropout with a
    content-hash gate — every token whose salted 60-bit hash lands in
    a fixed 10% bucket is dropped, producing a stable augmented view
    of the corpus (the word-dropout regularization pass of a training
    pipeline, made retry/repartition-stable the same way the hash
    splits are: no rand(), so the augmentation a shard gets does not
    depend on task placement). Output carries the full augmented text
    plus an md5 fingerprint, so the oracle value-checks the entire
    transformation, not just counts. Map-only; zero shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), " ")
    gate = lambda tok: (
        F.conv(F.substring(F.md5(F.concat(F.lit("aug:"), tok)), 1, 15), 16, 10)
        .cast("long") % 10 != 0
    )
    kept = F.filter(toks, gate)
    aug = F.array_join(kept, " ")
    return docs.select(
        "doc_id",
        F.size(toks).cast("int").alias("n_tokens"),
        F.size(kept).cast("int").alias("n_kept"),
        aug.alias("augmented"),
        F.substring(F.md5(aug), 1, 16).alias("aug_fp"),
    )


_SHARD_N = 16
_SHARD_TARGET_BYTES = 4096


@query(
    "dataset_shard_manifest",
    oracle=f"""
WITH assigned AS (
  SELECT doc_id, n_chars,
         CAST(CAST('0x' || substring(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 15)
                   AS BIGINT) % {_SHARD_N} AS INTEGER) AS shard_id
  FROM documents
)
SELECT shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS n_bytes,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc,
       CAST(CEIL(SUM(n_chars) / {_SHARD_TARGET_BYTES}.0) AS INTEGER) AS n_files
FROM assigned
GROUP BY shard_id
""",
)
def dataset_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Output-SHARD planning — the write-sizing audit run before a
    100 TB materialization: docs assign to {_SHARD_N} shards by a
    salted content hash (retry-stable, independent of the split and
    augmentation hashes), and the manifest reports per-shard doc/byte
    totals, id range, and the file count a {_SHARD_TARGET_BYTES}-byte
    target implies — exactly the numbers that decide repartition()
    factors and maxRecordsPerFile before the real write. One map-side-
    combining hash aggregation; at scale this replaces the
    write-then-inspect-then-rewrite cycle with one cheap pass."""
    docs = load_table(spark, sf_dir, "documents")
    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long") % _SHARD_N
    ).cast("int")
    return (
        docs.select(shard.alias("shard_id"), "doc_id", "n_chars")
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_bytes"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
            F.ceil(F.sum("n_chars") / float(_SHARD_TARGET_BYTES)).cast("int").alias("n_files"),
        )
    )


# -- DSIR importance selection ----------------------------------------------
# Data Selection via Importance Resampling (Xie et al., NeurIPS 2023):
# pick raw-corpus documents that look like a TARGET corpus by the
# likelihood ratio of two hashed-n-gram bag models. Weights are
# quantized to whole bits with the same floor-log2 device as
# doc_lm_surprisal — integer everywhere, so the per-doc sum is
# order-independent and bit-identical cross-engine (a sum of ln()
# terms would drift with accumulation order).

_DSIR_B = 128  # hashed feature buckets (the paper's hashed n-grams)
_DSIR_P = 1_000_000_007
_DSIR_M = 1_000_003
_DSIR_TOPK = 5  # per-source selection quota
_DSIR_TARGET_LANG = "en"


def _duck_dsir() -> str:
    from vector_search_ner_spark.operators.neardup import duck_token_hashes60

    B, P, M = _DSIR_B, _DSIR_P, _DSIR_M
    fl2 = lambda x: f"(length(bin({x})) - 1)"
    return f"""
WITH th AS (
  SELECT doc_id, lang, source, {duck_token_hashes60("text")} AS th
  FROM documents
), uni AS (
  SELECT doc_id, lang, source, unnest(list_transform(th, h -> h % {B})) AS bucket
  FROM th
), big AS (
  SELECT doc_id, lang, source,
         unnest(list_transform(generate_series(1, len(th) - 1),
                i -> (((th[i] % {P}) * {M} + (th[i + 1] % {P})) % {P}) % {B})) AS bucket
  FROM th WHERE len(th) >= 2
), g AS (
  SELECT * FROM uni UNION ALL SELECT * FROM big
), model AS (
  SELECT bucket,
         SUM(CASE WHEN lang = '{_DSIR_TARGET_LANG}' THEN 1 ELSE 0 END) AS ct,
         SUM(CASE WHEN lang <> '{_DSIR_TARGET_LANG}' THEN 1 ELSE 0 END) AS cr
  FROM g GROUP BY bucket
), tot AS (
  SELECT SUM(ct) AS nt, SUM(cr) AS nr FROM model
), w AS (
  SELECT m.bucket,
         ({fl2("m.ct + 1")} - {fl2("t.nt + " + str(B))})
         - ({fl2("m.cr + 1")} - {fl2("t.nr + " + str(B))}) AS bits
  FROM model m CROSS JOIN tot t
), per_doc AS (
  SELECT g.doc_id, g.source,
         CAST(COUNT(*) AS INTEGER) AS n_grams,
         CAST(SUM(w.bits) AS BIGINT) AS weight_bits
  FROM g JOIN w ON g.bucket = w.bucket
  WHERE g.lang <> '{_DSIR_TARGET_LANG}'
  GROUP BY g.doc_id, g.source
)
SELECT doc_id, source, n_grams, weight_bits,
       CAST(row_number() OVER (
         PARTITION BY source ORDER BY weight_bits DESC, doc_id
       ) AS INTEGER) AS sel_rank,
       row_number() OVER (
         PARTITION BY source ORDER BY weight_bits DESC, doc_id
       ) <= {_DSIR_TOPK} AS selected
FROM per_doc
ORDER BY doc_id
"""


@query("dsir_importance_select", oracle=_duck_dsir())
def dsir_importance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance selection (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): score
    every RAW document by how much more likely its hashed-n-gram bag is
    under the TARGET corpus's bag model than under the raw corpus's
    own, then take a per-source quota of the highest-weight documents.
    Here target = the 'en' slice of the corpus, raw = everything
    else; features = hashed unigrams + bigrams of the canonical
    whitespace tokens, folded into 128 buckets.

    Bit-exact quantization: the per-bucket log-likelihood ratio is
    taken in WHOLE BITS via floor-log2 (length(bin(x))-1) of the
    add-one-smoothed counts — the doc_lm_surprisal device — so the
    per-document weight is an integer sum, order-independent, and the
    oracle reproduces it exactly (a float ln() sum would drift with
    accumulation order). Selection is deterministic: per-source
    row_number over (weight desc, doc_id).

    Scale shape (100 TB): one tokenize+explode pass over the corpus
    (the exploded gram frame is slim (doc_id, lang, source, int) rows
    and is lineage-cut once for its three consumers); the bag models
    collapse to a 128-row table via ONE map-side-combining aggregate
    with conditional sums (no second corpus pass for the target
    model); weights broadcast into the per-doc scoring aggregate; the
    quota rank partitions by source. Zero corpus-by-corpus joins —
    the whole op is two linear passes and a broadcast."""
    from vector_search_ner_spark.operators.neardup import token_hashes60
    from vector_search_ner_spark.session import cut_lineage

    B, P, M = _DSIR_B, _DSIR_P, _DSIR_M
    docs = load_table(spark, sf_dir, "documents")
    th = docs.select(
        "doc_id", "lang", "source", token_hashes60(F.col("text")).alias("th")
    )
    n = F.size("th")
    uni = th.select(
        "doc_id", "lang", "source",
        F.explode(F.transform(F.col("th"), lambda h: h % B)).alias("bucket"),
    )
    big = th.where(n >= 2).select(
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
    g = cut_lineage(uni.unionByName(big))
    # when/otherwise (not a bare boolean cast): a NULL lang must count
    # as 0 on BOTH sides, exactly like the oracle's CASE ... ELSE 0 —
    # sum() skipping NULLs would otherwise leave a NULL ct/cr for a
    # bucket whose grams are all NULL-lang, and its bits would drop
    # silently from the per-doc sum
    is_t = F.when(F.col("lang") == _DSIR_TARGET_LANG, 1).otherwise(0)
    is_r = F.when(
        F.col("lang").isNotNull() & (F.col("lang") != _DSIR_TARGET_LANG), 1
    ).otherwise(0)
    model = g.groupBy("bucket").agg(
        F.sum(is_t).alias("ct"), F.sum(is_r).alias("cr")
    )
    tot = model.agg(F.sum("ct").alias("nt"), F.sum("cr").alias("nr"))
    fl2 = lambda c: F.length(F.bin(c)) - 1
    w = model.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (
            (fl2(F.col("ct") + 1) - fl2(F.col("nt") + B))
            - (fl2(F.col("cr") + 1) - fl2(F.col("nr") + B))
        ).alias("bits"),
    )
    per_doc = (
        g.where(F.col("lang") != _DSIR_TARGET_LANG)
        .join(F.broadcast(w), "bucket")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_grams"),
            F.sum("bits").cast("bigint").alias("weight_bits"),
        )
    )
    rank = F.row_number().over(
        Window.partitionBy("source").orderBy(
            F.col("weight_bits").desc(), F.col("doc_id")
        )
    )
    return (
        per_doc.withColumn("sel_rank", rank.cast("int"))
        .withColumn("selected", F.col("sel_rank") <= _DSIR_TOPK)
        .orderBy("doc_id")
    )


# -- tokenizer induction: the iterative BPE trainer ---------------------------

_BPE_ROUNDS = 5


def _duck_bpe_ctes(carry_word: bool, source: str = "documents") -> list[str]:
    """The shared BPE-training CTE chain. With carry_word the vocabulary
    relations v0..vN keep the original word `w` alongside its evolving
    segmentation, so the encoder oracle can join documents back to the
    final per-word token split; without it the strings are byte-identical
    to the r9 trainer oracle. `source` swaps the training relation (the
    held-out OOV eval trains on a shard, not the full corpus)."""
    wcol = "w, " if carry_word else ""
    parts = [
        f"""w0 AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(trim(text), ' ')) AS w FROM {source})
  WHERE w <> '' GROUP BY w
), v0 AS (
  SELECT {wcol}'  ' || array_to_string(
           list_transform(generate_series(1, length(w)), i -> substring(w, i, 1)),
           '  ') || '  ' AS seg, freq
  FROM w0
)"""
    ]
    for r in range(1, _BPE_ROUNDS + 1):
        prev = f"v{r - 1}"
        parts.append(
            f"""p{r} AS (
  SELECT s[i] AS a, s[i + 1] AS b, CAST(SUM(freq) AS BIGINT) AS n
  FROM (SELECT s, freq, unnest(generate_series(1, len(s) - 1)) AS i
        FROM (SELECT string_split(trim(seg), '  ') AS s, freq FROM {prev})
        WHERE len(s) >= 2)
  GROUP BY a, b
), m{r} AS (
  SELECT a, b, n FROM p{r} ORDER BY n DESC, a, b LIMIT 1
), v{r} AS (
  SELECT {wcol}replace(seg, ' ' || m.a || '  ' || m.b || ' ',
                 ' ' || m.a || m.b || ' ') AS seg, freq
  FROM {prev} CROSS JOIN m{r} m
)"""
        )
    return parts


def _duck_bpe_train() -> str:
    parts = _duck_bpe_ctes(carry_word=False)
    union = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, a AS sym_a, b AS sym_b, n AS pair_count FROM m{r}"
        for r in range(1, _BPE_ROUNDS + 1)
    )
    return (
        "WITH " + ",\n".join(parts) + f"\nSELECT * FROM ({union}) ORDER BY round\n"
    )


def _duck_bpe_encode() -> str:
    parts = _duck_bpe_ctes(carry_word=True)
    parts.append(
        f"""enc AS (
  SELECT w, CAST(len(string_split(trim(seg), '  ')) AS BIGINT) AS n_tok
  FROM v{_BPE_ROUNDS}
), dw AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w FROM documents
)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + """
SELECT dw.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(enc.n_tok) AS BIGINT) AS n_tokens,
       CAST(SUM(length(dw.w)) AS BIGINT) AS n_chars
FROM dw JOIN enc USING (w)
WHERE dw.w <> ''
GROUP BY dw.doc_id
ORDER BY doc_id
"""
    )


@query("bpe_train_merges", oracle=_duck_bpe_train())
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ITERATIVE BPE tokenizer training (Sennrich et al. 2016) — the
    full trainer, not just bpe_top_merges' first counting round: per
    round, count adjacent symbol pairs across the vocabulary weighted
    by word frequency, adopt the most frequent pair as the round's
    merge rule (ties broken lexicographically — fully deterministic),
    apply it everywhere, and repeat. Emits the learned merge table
    (round, sym_a, sym_b, pair_count).

    Merge application is a single string replace over a DELIMITED
    segmentation encoding: symbols joined by two spaces with two-space
    padding, and rule (a,b) rewrites ' a␣␣b ' -> ' ab ' — the single
    flanking spaces are consumed as boundary anchors (a pair can never
    match inside a larger symbol) while the outer spaces survive to
    keep the invariant, and left-to-right non-overlapping replace()
    semantics (identical in Spark and DuckDB) give exactly BPE's
    greedy merge order, including the aa-run case. No per-row loops,
    no UDFs — every round is built-in exprs.

    Scale shape (100 TB): the corpus is scanned ONCE (word-frequency
    hash agg); every training round then runs over the VOCABULARY
    relation (distinct words — orders of magnitude smaller), as one
    weighted pair hash-agg (map-side combining), one global top-1
    (TakeOrderedAndProject, never a sort), and one map-only replace.
    The chosen rule joins back by broadcast; each round's vocab frame
    is lineage-cut (the Lloyd/CC iterative discipline — no collect,
    the rule stays a 1-row broadcast frame). The oracle unrolls all
    {n} rounds as CTEs and matches bit-for-bit."""
    return bpe_train_frame(load_table(spark, sf_dir, "documents"), _BPE_ROUNDS)


def bpe_train_frame(docs: DataFrame, rounds: int) -> DataFrame:
    """The BPE training loop over an explicit (text) frame — shared by
    the registered query and the hand-computed semantics test."""
    merges, _vocab = _bpe_train_loop(docs, rounds)
    return merges.orderBy("round")


def _bpe_train_loop(
    docs: DataFrame, rounds: int, round_frames: list | None = None
) -> tuple[DataFrame, DataFrame]:
    """Run `rounds` of BPE training and return BOTH artifacts: the merge
    table (round, sym_a, sym_b, pair_count) and the final vocabulary
    (w, seg, freq) with every word's trained segmentation — the trainer
    consumes the first, the corpus encoder the second. The word rides
    through each round's map-only replace so the encoder never has to
    re-derive it (same device as the DuckDB oracle's carry_word CTEs).
    If `round_frames` is passed, the (already lineage-cut) vocabulary
    frame AFTER each round r = 0..rounds is appended to it — the
    compression-curve query reads corpus totals off these."""
    from vector_search_ner_spark.session import cut_lineage

    wf = (
        docs.select(F.explode(F.split(F.trim(F.col("text")), " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    vocab = cut_lineage(
        wf.select(
            "w",
            F.concat(
                F.lit("  "),
                F.array_join(
                    F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"),
                    "  ",
                ),
                F.lit("  "),
            ).alias("seg"),
            "freq",
        )
    )
    if round_frames is not None:
        round_frames.append(vocab)
    merges = None
    for r in range(1, rounds + 1):
        syms = vocab.select(
            F.split(F.trim(F.col("seg")), "  ").alias("s"), "freq"
        ).where(F.size("s") >= 2)
        pairs = syms.select(
            "freq",
            F.explode(
                F.expr("transform(sequence(1, size(s) - 1), i -> struct(s[i - 1] AS a, s[i] AS b))")
            ).alias("p"),
        )
        best = cut_lineage(
            pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").cast("long").alias("n"))
            .orderBy(F.col("n").desc(), "a", "b")
            .limit(1)
        )
        rule = best.select(
            F.lit(r).alias("round"),
            F.col("a").alias("sym_a"),
            F.col("b").alias("sym_b"),
            F.col("n").alias("pair_count"),
        )
        merges = rule if merges is None else merges.unionByName(rule)
        vocab = cut_lineage(
            vocab.crossJoin(F.broadcast(best)).select(
                "w",
                F.replace(
                    F.col("seg"),
                    F.concat(F.lit(" "), F.col("a"), F.lit("  "), F.col("b"), F.lit(" ")),
                    F.concat(F.lit(" "), F.col("a"), F.col("b"), F.lit(" ")),
                ).alias("seg"),
                "freq",
            )
        )
        if round_frames is not None:
            round_frames.append(vocab)
    return merges, vocab


@query("bpe_encode_corpus", oracle=_duck_bpe_encode())
def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the trained BPE merge table to the WHOLE corpus — the
    encode half of tokenizer induction (train = bpe_train_merges; this
    completes the surface: a user trains merges, then tokenizes the
    corpus with them). Emits per-document tokenization stats
    (n_words, n_tokens, n_chars): n_tokens is the document's length
    under the learned tokenizer, n_chars/n_tokens its compression
    ratio — the quantities a pretraining-budget planner actually needs.

    Scale shape (100 TB): the expensive object — the trained
    segmentation — is computed once over the VOCABULARY (distinct
    words, orders of magnitude smaller than the corpus), never per
    occurrence: `_bpe_train_loop` carries each word through the
    rounds' map-only replaces, and the corpus is then tokenized by a
    single hash join of the exploded (doc_id, w) stream against that
    (w, n_tok) relation — no broadcast hint on the vocab (at corpus
    scale it can exceed the 8 GB broadcast ceiling; AQE may still
    elect one when it is small) — followed by one map-side-combining
    per-doc aggregate. Integer arithmetic end-to-end, so the DuckDB
    oracle (the same CTE chain with the word carried through) matches
    bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    _merges, vocab = _bpe_train_loop(docs, _BPE_ROUNDS)
    enc = vocab.select(
        "w",
        F.size(F.split(F.trim(F.col("seg")), "  ")).cast("long").alias("n_tok"),
    )
    dw = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), " ")).alias("w")
    ).where(F.col("w") != "")
    return (
        dw.join(enc, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.sum(F.length("w")).cast("long").alias("n_chars"),
        )
        .orderBy("doc_id")
    )


def _duck_bpe_fertility() -> str:
    from vector_search_ner_spark.plans.queries_text import _duck_lang_scripted

    return f"""
WITH stats AS ({_duck_bpe_encode()}),
lang AS (
  SELECT doc_id, {_duck_lang_scripted()} AS lang_pred FROM documents
)
SELECT l.lang_pred,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(s.n_words) AS BIGINT) AS n_words,
       CAST(SUM(s.n_tokens) AS BIGINT) AS n_tokens,
       ROUND(CAST(SUM(s.n_tokens) AS DOUBLE) / SUM(s.n_words), 6) AS fertility,
       ROUND(CAST(SUM(s.n_chars) AS DOUBLE) / SUM(s.n_tokens), 6) AS chars_per_token
FROM stats s JOIN lang l ON s.doc_id = l.doc_id
GROUP BY l.lang_pred
ORDER BY l.lang_pred
"""


@query("bpe_fertility_by_lang", oracle=_duck_bpe_fertility())
def bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY by language — tokens-per-word and
    chars-per-token of the trained BPE tokenizer, split by the quality
    gate's language prediction: the cross-lingual compression report a
    tokenizer team reads before fixing a vocabulary (high fertility on
    a language = that language pays more sequence positions per word —
    the standard multilingual-tokenizer equity metric). Composes two
    already-oracled families: the per-doc encode stats
    (`bpe_encode_corpus`) and the gate's language router
    (`doc_language_quality_gate`), joined on doc_id and reduced to one
    row per language.

    Scale: the vocabulary-sized trainer and the corpus-sized encode
    join are bpe_encode_corpus's shapes unchanged; the language
    expression is map-only on the same documents scan; the final agg
    is map-side-combining on a handful of language keys. Integer
    numerators/denominators summed exactly, ONE division per metric
    then round(6) — bit-equal across engines."""
    from vector_search_ner_spark.plans.queries_text import quality_gate_frame

    docs = load_table(spark, sf_dir, "documents")
    stats = bpe_encode_corpus(spark, sf_dir)
    lang = quality_gate_frame(docs).select("doc_id", "lang_pred")
    return (
        stats.join(lang, "doc_id")
        .groupBy("lang_pred")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_words"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.round(
                F.sum("n_tokens").cast("double") / F.sum("n_words"), 6
            ).alias("fertility"),
            F.round(
                F.sum("n_chars").cast("double") / F.sum("n_tokens"), 6
            ).alias("chars_per_token"),
        )
        .orderBy("lang_pred")
    )


# -- CCNet perplexity bucketing ----------------------------------------------


def _duck_surprisal_buckets() -> str:
    from vector_search_ner_spark.plans.queries_text import _duck_lang_scripted

    return f"""
WITH s AS ({LM_SURPRISAL_ORACLE}),
lang AS (
  SELECT doc_id, {_duck_lang_scripted()} AS lang_pred FROM documents
), rk AS (
  SELECT s.doc_id, l.lang_pred, s.n_tokens, s.avg_surprisal_bits,
         row_number() OVER (
           PARTITION BY l.lang_pred
           ORDER BY s.avg_surprisal_bits, s.doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY l.lang_pred) AS n
  FROM s JOIN lang l ON s.doc_id = l.doc_id
)
SELECT doc_id, lang_pred, n_tokens, avg_surprisal_bits,
       CASE ((rn - 1) * 3) // n
         WHEN 0 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail'
       END AS ccnet_bucket
FROM rk ORDER BY doc_id
"""


@query("doc_surprisal_buckets", oracle=_duck_surprisal_buckets())
def doc_surprisal_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's HEAD/MIDDLE/TAIL language-model bucketing (Wenzek et
    al. 2020) — the step between scoring and filtering: within each
    language, rank documents by mean LM surprisal and cut the ranking
    into terciles. CCNet keeps head+middle for pretraining and treats
    tail as the low-quality reject pile; bucketing instead of a single
    global threshold is what stops the filter from preferentially
    deleting whichever language the LM models worst. Composes two
    already-oracled families: `doc_lm_surprisal` (integer-bit
    surprisal) and the quality gate's language router.

    Determinism: ranks order by (avg_surprisal_bits, doc_id) — the avg
    is one division of identical integers so both engines sort the
    same doubles — and the tercile is PURE INTEGER arithmetic
    ((rn-1)*3 integer-div n in {0,1,2}), no float thresholds at all.

    Scale: one window shuffle partitioned by language. A language is a
    coarse partition at 100 TB, so like quality_score_calibrate you
    sub-bucket heavy languages by score range and offset the ranks
    (the dataset_pack_sequences bucket-prefix-sum device); the tercile
    arithmetic is unchanged under that rewrite."""
    from vector_search_ner_spark.plans.queries_text import quality_gate_frame

    docs = load_table(spark, sf_dir, "documents")
    s = doc_lm_surprisal(spark, sf_dir).select(
        "doc_id", "n_tokens", "avg_surprisal_bits"
    )
    lang = quality_gate_frame(docs).select("doc_id", "lang_pred")
    w = Window.partitionBy("lang_pred").orderBy("avg_surprisal_bits", "doc_id")
    rk = (
        s.join(lang, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("lang_pred")))
    )
    return rk.select(
        "doc_id",
        "lang_pred",
        "n_tokens",
        "avg_surprisal_bits",
        F.when(F.expr("((rn - 1) * 3) div n") == 0, F.lit("head"))
        .when(F.expr("((rn - 1) * 3) div n") == 1, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("ccnet_bucket"),
    ).orderBy("doc_id")


# -- temperature-based multilingual mixture weights ---------------------------


def _duck_mixture_temperature() -> str:
    from vector_search_ner_spark.plans.queries_text import _duck_lang_scripted

    return f"""
WITH lang AS (
  SELECT doc_id, {_duck_lang_scripted()} AS lang_pred,
         len(string_split(trim(text), ' ')) AS n_tokens
  FROM documents
), per_lang AS (
  SELECT lang_pred,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
  FROM lang GROUP BY lang_pred
), tot AS (
  SELECT SUM(n_tokens) AS t FROM per_lang
), w AS (
  SELECT p.lang_pred, p.n_docs, p.n_tokens,
         CAST(FLOOR(sqrt(CAST(p.n_tokens AS DOUBLE) / t.t) * 1000000000000) AS BIGINT) AS w_u
  FROM per_lang p CROSS JOIN tot t
), ws AS (
  SELECT SUM(w_u) AS sw FROM w
)
SELECT w.lang_pred, w.n_docs, w.n_tokens,
       ROUND(CAST(w.n_tokens AS DOUBLE) / t.t, 6) AS p_raw,
       ROUND(CAST(w.w_u AS DOUBLE) / ws.sw, 6) AS sample_weight,
       ROUND((CAST(w.w_u AS DOUBLE) / ws.sw) / (CAST(w.n_tokens AS DOUBLE) / t.t), 4)
         AS boost
FROM w CROSS JOIN tot t CROSS JOIN ws
ORDER BY w.lang_pred
"""


@query("mixture_temperature_weights", oracle=_duck_mixture_temperature())
def mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPERATURE-BASED multilingual sampling weights — the XLM /
    mT5 recipe for balancing a multilingual pretraining mix: raw
    token-share p_i per language is exponentiated to p_i^alpha and
    renormalized, so low-resource languages are up-sampled (boost > 1)
    without drowning the high-resource ones. alpha = 0.5 (XLM's
    setting) is chosen deliberately: p^0.5 == sqrt(p), and IEEE-754
    requires sqrt to be CORRECTLY ROUNDED — unlike pow/exp/ln, both
    engines produce the bit-identical weight, no libm drift possible.
    Weights floor to integer trillionths before the normalizing sum
    (the drift_psi_orders device) so accumulation is exact integer
    arithmetic; each output metric is ONE division of identical
    operands then round.

    Scale: per-language token totals are one map-side-combining agg;
    everything after operates on the languages-sized frame (broadcast
    scalars) — nothing data-sized shuffles."""
    from vector_search_ner_spark.plans.queries_text import quality_gate_frame

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.size(F.split(F.trim(F.col("text")), " ")).alias("n_tokens")
    )
    lang = quality_gate_frame(docs).select("doc_id", "lang_pred").join(toks, "doc_id")
    per_lang = lang.groupBy("lang_pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )
    tot = per_lang.agg(F.sum("n_tokens").cast("long").alias("t"))
    w = per_lang.crossJoin(F.broadcast(tot)).withColumn(
        "w_u",
        F.floor(
            F.sqrt(F.col("n_tokens").cast("double") / F.col("t"))
            * F.lit(10**12)
        ).cast("long"),
    )
    ws = w.agg(F.sum("w_u").alias("sw"))
    return (
        w.crossJoin(F.broadcast(ws))
        .select(
            "lang_pred",
            "n_docs",
            "n_tokens",
            F.round(F.col("n_tokens").cast("double") / F.col("t"), 6).alias("p_raw"),
            F.round(F.col("w_u").cast("double") / F.col("sw"), 6).alias(
                "sample_weight"
            ),
            F.round(
                (F.col("w_u").cast("double") / F.col("sw"))
                / (F.col("n_tokens").cast("double") / F.col("t")),
                4,
            ).alias("boost"),
        )
        .orderBy("lang_pred")
    )


# -- GDPR / right-to-be-forgotten delete cascade -------------------------------

_GDPR_MOD, _GDPR_REM = 89, 7  # deterministic deletion set: doc_id % 89 == 7


def _duck_gdpr_cascade() -> str:
    def xor_key(expr: str) -> str:
        return f"COALESCE(bit_xor({duck_stable_long_hash(expr)}), 0)"

    return f"""
WITH surv_docs AS (
  SELECT doc_id, md5(text) AS tmd5 FROM documents
  WHERE doc_id % {_GDPR_MOD} != {_GDPR_REM}
), n_docs AS (SELECT COUNT(*) AS n FROM documents),
nd_before AS (
  SELECT COUNT(*) AS n FROM documents WHERE doc_id % 10 != 5
), nd_surv AS (
  SELECT doc_id FROM documents
  WHERE doc_id % 10 != 5 AND doc_id % {_GDPR_MOD} != {_GDPR_REM}
), sem_before AS (
  SELECT COUNT(*) AS n FROM embeddings WHERE vec_id % 10 != 5
), sem_surv AS (
  SELECT vec_id FROM embeddings
  WHERE vec_id % 10 != 5 AND vec_id % {_GDPR_MOD} != {_GDPR_REM}
)
SELECT surface, rows_before, rows_deleted, rows_after, survivor_xor FROM (
  SELECT 'documents' AS surface,
         CAST(n_docs.n AS BIGINT) AS rows_before,
         CAST(n_docs.n - (SELECT COUNT(*) FROM surv_docs) AS BIGINT) AS rows_deleted,
         CAST((SELECT COUNT(*) FROM surv_docs) AS BIGINT) AS rows_after,
         (SELECT {xor_key("'doc:' || doc_id || ':' || tmd5")} FROM surv_docs)
           AS survivor_xor
  FROM n_docs
  UNION ALL
  SELECT 'vecstore',
         CAST(n_docs.n AS BIGINT),
         CAST(n_docs.n - (SELECT COUNT(*) FROM surv_docs) AS BIGINT),
         CAST((SELECT COUNT(*) FROM surv_docs) AS BIGINT),
         (SELECT {xor_key("'vec:' || doc_id || ':' || tmd5")} FROM surv_docs)
  FROM n_docs
  UNION ALL
  SELECT 'neardup_shingles',
         CAST(nd_before.n AS BIGINT),
         CAST(nd_before.n - (SELECT COUNT(*) FROM nd_surv) AS BIGINT),
         CAST((SELECT COUNT(*) FROM nd_surv) AS BIGINT),
         (SELECT {xor_key("'sh:' || doc_id")} FROM nd_surv)
  FROM nd_before
  UNION ALL
  SELECT 'neardup_bands',
         CAST(4 * nd_before.n AS BIGINT),
         CAST(4 * (nd_before.n - (SELECT COUNT(*) FROM nd_surv)) AS BIGINT),
         CAST(4 * (SELECT COUNT(*) FROM nd_surv) AS BIGINT),
         (SELECT COALESCE(bit_xor({duck_stable_long_hash("'band:' || b.band || ':' || s.doc_id")}), 0)
          FROM nd_surv s CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) b)
  FROM nd_before
  UNION ALL
  SELECT 'semdedup_members',
         CAST(sem_before.n AS BIGINT),
         CAST(sem_before.n - (SELECT COUNT(*) FROM sem_surv) AS BIGINT),
         CAST((SELECT COUNT(*) FROM sem_surv) AS BIGINT),
         (SELECT {xor_key("'sem:' || vec_id")} FROM sem_surv)
  FROM sem_before
) ORDER BY surface
"""


@query("gdpr_delete_cascade", oracle=_duck_gdpr_cascade())
def gdpr_delete_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT-TO-BE-FORGOTTEN delete cascade — the governance op every
    lakehouse eventually runs: a deletion set (here the deterministic
    doc_id % 89 == 7 slice playing the role of the legal request)
    must vanish not just from the RAW table but from every
    DERIVED surface that memorized those documents: the persisted
    vector store (sources/vecstore.py), the near-dup shingle/band
    index (sources/neardup_index.py, both tables), and the semantic
    cluster index (sources/semdedup_index.py). Emits the audit roster
    a compliance reviewer signs: per surface, rows before / deleted /
    after plus a bit_xor content checksum over the SURVIVOR keys (doc
    ids bound to text md5 where the surface stores text) — so a
    surface that silently retained a deleted row, or deleted too much,
    hash-diverges. The oracle re-derives every surface's survivor set
    from the raw corpus and the deletion predicate alone, so it also
    certifies the stores' membership (their content bytes are each
    certified by their own store oracles).

    Scale shape: the deletion set is request-sized — it BROADCASTS
    into anti-joins against each store scan; no store shuffles, each
    contributes one map-side-combining aggregate row. The actual
    rewrite at 100 TB is each store's write-then-swap generation
    machinery (already built: vecstore/neardup/semdedup generations);
    this query is the decision + certification layer above it.

    Reference parity: the reference's only deletion story is the
    destructive full rebuild (reset_collection, build_vectorstore.py);
    this is the surgical per-request form with an audit trail.
    """
    docs = load_table(spark, sf_dir, "documents")
    del_ids = docs.where(F.col("doc_id") % _GDPR_MOD == _GDPR_REM).select("doc_id")
    return gdpr_cascade_frame(spark, sf_dir, del_ids)


def gdpr_cascade_frame(
    spark: SparkSession, sf_dir: str, del_ids: DataFrame
) -> DataFrame:
    """The cascade audit over an EXPLICIT deletion-id frame — shared by
    the batch query above and the streaming tombstone-log twin
    (streaming/events.py stream_gdpr_tombstones), so both surfaces
    carry the IDENTICAL oracle."""
    from vector_search_ner_spark.sources.neardup_index import shingle_index_store
    from vector_search_ner_spark.sources.semdedup_index import semantic_index_store
    from vector_search_ner_spark.sources.vecstore import doc_vector_store

    docs = load_table(spark, sf_dir, "documents")

    vec = doc_vector_store(spark, sf_dir).select("doc_id", "text")
    bands, shingles = shingle_index_store(spark, sf_dir, 10, 5)
    # same (n_cent, n_iter) as dedup_semantic_incremental / the stream
    # append, so this opens the EXISTING generation instead of building
    # a parallel one
    members, _cents = semantic_index_store(spark, sf_dir, 16, 2, 10, 5)

    def audit(
        surface: str, frame: DataFrame, id_col: str, key: object
    ) -> DataFrame:
        # rows_before is a scalar per surface (store sizes are known at
        # plan time anyway); one count per surface is request-metadata
        # cost, not a data-sized collect
        before = frame.count()
        surv = frame.join(
            F.broadcast(del_ids.withColumnRenamed("doc_id", id_col)),
            id_col,
            "left_anti",
        )
        return (
            surv.select(stable_long_hash(key).alias("__k"))
            .agg(
                F.count(F.lit(1)).alias("__n"),
                F.coalesce(F.expr("bit_xor(__k)"), F.lit(0))
                .cast("long")
                .alias("survivor_xor"),
            )
            .select(
                F.lit(surface).alias("surface"),
                F.lit(before).cast("long").alias("rows_before"),
                (F.lit(before) - F.col("__n")).cast("long").alias("rows_deleted"),
                F.col("__n").cast("long").alias("rows_after"),
                "survivor_xor",
            )
        )

    doc_key = F.concat(F.lit("doc:"), F.col("doc_id"), F.lit(":"), F.md5(F.col("text")))
    vec_key = F.concat(F.lit("vec:"), F.col("doc_id"), F.lit(":"), F.md5(F.col("text")))
    rosters = [
        audit("documents", docs.select("doc_id", "text"), "doc_id", doc_key),
        audit("vecstore", vec, "doc_id", vec_key),
        audit(
            "neardup_shingles",
            shingles.select("sid"),
            "sid",
            F.concat(F.lit("sh:"), F.col("sid")),
        ),
        audit(
            "neardup_bands",
            bands.select("sid", "band"),
            "sid",
            F.concat(F.lit("band:"), F.col("band"), F.lit(":"), F.col("sid")),
        ),
        audit(
            "semdedup_members",
            members.select(F.col("doc_id")),
            "doc_id",
            F.concat(F.lit("sem:"), F.col("doc_id")),
        ),
    ]
    out = rosters[0]
    for r in rosters[1:]:
        out = out.unionByName(r)
    return out.orderBy("surface")


# -- BPE compression curve -----------------------------------------------------


def _duck_bpe_curve() -> str:
    parts = _duck_bpe_ctes(carry_word=True)
    union = "\nUNION ALL\n".join(
        f"""SELECT {r} AS round,
       CAST(SUM(freq) AS BIGINT) AS n_words,
       CAST(SUM(freq * len(string_split(trim(seg), '  '))) AS BIGINT) AS n_tokens,
       CAST(SUM(freq * length(w)) AS BIGINT) AS n_chars
FROM v{r}"""
        for r in range(0, _BPE_ROUNDS + 1)
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT CAST(round AS INTEGER) AS round, n_words, n_tokens, n_chars,
       ROUND(CAST(n_tokens AS DOUBLE) / n_words, 6) AS fertility,
       ROUND(CAST(n_chars AS DOUBLE) / n_tokens, 6) AS chars_per_token
FROM ({union}) ORDER BY round
"""
    )


@query("bpe_compression_curve", oracle=_duck_bpe_curve())
def bpe_compression_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenizer's VOCAB-SIZE TUNING CURVE — corpus compression
    after each BPE training round r = 0..5: total corpus tokens,
    fertility (tokens per word), and chars-per-token under the
    segmentation as it stood after round r. Round 0 is the
    character-level baseline; each added merge rule monotonically
    shrinks the corpus (a merge can only reduce symbol counts), and
    the curve's flattening is how a tokenizer team picks vocab size —
    the nprobe/overfetch tuning-curve discipline applied to tokenizer
    induction.

    The key identity that makes this corpus-free: corpus tokens at
    round r = SUM over the VOCABULARY of freq(w) x len(seg_r(w)) — the
    word-frequency relation already carries every corpus occurrence,
    so the whole 6-point curve reads off the vocab-sized round frames
    the trainer already materializes (lineage-cut per round, the
    Lloyd/CC discipline); the corpus itself is scanned exactly once,
    for the frequencies. Integer sums end-to-end, one division per
    ratio then round(6)."""
    docs = load_table(spark, sf_dir, "documents")
    frames: list = []
    _merges, _vocab = _bpe_train_loop(docs, _BPE_ROUNDS, round_frames=frames)
    out = None
    for r, v in enumerate(frames):
        row = v.agg(
            F.lit(r).cast("int").alias("round"),
            F.sum("freq").cast("long").alias("n_words"),
            F.sum(
                F.col("freq") * F.size(F.split(F.trim(F.col("seg")), "  "))
            )
            .cast("long")
            .alias("n_tokens"),
            F.sum(F.col("freq") * F.length("w")).cast("long").alias("n_chars"),
        )
        out = row if out is None else out.unionByName(row)
    return out.select(
        "round",
        "n_words",
        "n_tokens",
        "n_chars",
        F.round(F.col("n_tokens").cast("double") / F.col("n_words"), 6).alias(
            "fertility"
        ),
        F.round(F.col("n_chars").cast("double") / F.col("n_tokens"), 6).alias(
            "chars_per_token"
        ),
    ).orderBy("round")


# -- model-based quality filtering: batch perceptron trainer ------------------
# The modern curation stack does not ship rule gates to 100 TB — it
# distills them (or a small labeled set) into a cheap linear model and
# scores the corpus with that (the FineWeb-Edu / DCLM "classifier
# filtering" stage). This operator trains the model INSIDE the engine:
# a batch perceptron (Rosenblatt update, lr=1) whose features and
# labels are integer-quantized, so every training round is one
# map-side-combining aggregation of integer gradient sums — exact,
# order-independent, and replayable CTE-for-CTE by the oracle. The
# teacher label is the rule-based quality gate's majority vote
# (>= 2 of the 3 quality bands), re-derived in integer arithmetic.

_PCT_ROUNDS = 5
_PCT_PERMILLE = 60  # teacher threshold: stopword permille at the corpus median


def _pct_feat_sql(source: str = "documents") -> str:
    from vector_search_ner_spark.plans.queries_text import _duck_marker_hits
    from vector_search_ner_spark.operators.textstats import LANG_MARKERS

    n_tok = "len(string_split(trim(text), ' '))"
    n_chr = "length(text)"
    en = _duck_marker_hits(LANG_MARKERS["en"])
    return f"""
  SELECT CASE WHEN 1000 * ({en}) >= {_PCT_PERMILLE} * {n_tok} THEN 1 ELSE 0 END AS y,
         1 AS x0,
         LEAST({n_tok} // 8, 8) AS x1,
         LEAST((2 * ({n_chr} - {n_tok} + 1)) // {n_tok}, 24) AS x2,
         LEAST((1000 * ({en})) // {n_tok}, 250) - {_PCT_PERMILLE} AS x3
  FROM {source}
"""


def _pct_oracle() -> str:
    ctes = [f"feat AS ({_pct_feat_sql()})", "n AS (SELECT COUNT(*) AS n FROM feat)"]
    ctes.append("w0 AS (SELECT 0 AS w0, 0 AS w1, 0 AS w2, 0 AS w3)")
    for t in range(1, _PCT_ROUNDS + 1):
        p = t - 1
        margin = f"w.w0 * f.x0 + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3"
        err = f"f.y - (CASE WHEN {margin} >= 0 THEN 1 ELSE 0 END)"
        ctes.append(
            f"""u{t} AS (
  SELECT SUM(({err}) * f.x0) AS d0, SUM(({err}) * f.x1) AS d1,
         SUM(({err}) * f.x2) AS d2, SUM(({err}) * f.x3) AS d3,
         SUM(CASE WHEN ({err}) <> 0 THEN 1 ELSE 0 END) AS miss
  FROM feat f CROSS JOIN w{p} w
)"""
        )
        ctes.append(
            f"w{t} AS (SELECT w.w0 + u.d0 AS w0, w.w1 + u.d1 AS w1,"
            f" w.w2 + u.d2 AS w2, w.w3 + u.d3 AS w3, u.miss"
            f" FROM u{t} u CROSS JOIN w{p} w)"
        )
    legs = "\nUNION ALL\n".join(
        f"SELECT {t} AS round, CAST(miss AS BIGINT) AS n_misclassified,"
        f" CAST(w0 AS BIGINT) AS w0, CAST(w1 AS BIGINT) AS w1,"
        f" CAST(w2 AS BIGINT) AS w2, CAST(w3 AS BIGINT) AS w3,"
        f" ROUND(1.0 - miss / CAST((SELECT n FROM n) AS DOUBLE), 4) AS accuracy"
        f" FROM w{t}"
        for t in range(1, _PCT_ROUNDS + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + legs


@query("quality_classifier_perceptron", oracle=_pct_oracle())
def quality_classifier_perceptron(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a linear quality classifier in-engine and report the
    training trajectory: _PCT_ROUNDS batch-perceptron rounds over
    integer-quantized text features (token-count bucket, doubled mean
    word length, CENTERED stopword-permille, bias), teacher-labeled by
    the stopword-density gate at the corpus median (ratio >= 0.060,
    a pure integer comparison — the `quality_score` band family's
    discriminative member on this corpus; the other two bands are
    constant here and serve as distractor features the trainer must
    learn to ignore). Output per round: misclassified count (before
    that round's update), the updated weight vector, and training
    accuracy — the boundary is linearly separable in x3, so the
    trajectory converges and the distractor weights stay near zero.

    Why a perceptron and not logistic regression: the update is
    INTEGER (err in {-1,0,+1} times integer features, lr=1), so each
    round is one exact map-side-combining aggregation with no
    transcendental functions — bit-identical across engines and
    partition orders, where a sigmoid's float gradient would drift.
    Scale shape: the feature projection computes once
    (localCheckpoint), each round is one O(corpus) integer agg
    producing a 1-row weight frame that broadcasts into the next
    round (lineage cut per round — the Lloyd/BPE iterative
    discipline); rounds = _PCT_ROUNDS, so the full train is
    _PCT_ROUNDS linear passes, embarrassingly scalable. Inference on
    new data is the margin sign — a map-only projection."""
    _feat, _w, trajectory = _pct_train(spark, sf_dir)
    return trajectory


def _pct_features(docs: DataFrame) -> DataFrame:
    """Teacher label + integer features for a (text) frame — one
    map-only projection, shared by the trainer and the held-out
    scorer (a single definition so train- and eval-side features
    cannot drift)."""
    from vector_search_ner_spark.operators.textstats import (
        LANG_MARKERS,
        marker_hits_tokens,
    )

    toks = F.split(F.trim(F.col("text")), " ")
    staged = docs.select(
        F.size(toks).cast("long").alias("n_tok"),
        F.length("text").cast("long").alias("n_chr"),
        marker_hits_tokens(toks, LANG_MARKERS["en"]).alias("en"),
    )
    return staged.select(
        F.when(1000 * F.col("en") >= _PCT_PERMILLE * F.col("n_tok"), 1)
        .otherwise(0)
        .cast("long")
        .alias("y"),
        F.lit(1).cast("long").alias("x0"),
        F.least(F.expr("n_tok div 8"), F.lit(8)).cast("long").alias("x1"),
        F.least(
            F.expr("(2 * (n_chr - n_tok + 1)) div n_tok"), F.lit(24)
        )
        .cast("long")
        .alias("x2"),
        (F.least(F.expr("(1000 * en) div n_tok"), F.lit(250)) - _PCT_PERMILLE)
        .cast("long")
        .alias("x3"),
    ).localCheckpoint(eager=False)


def _pct_train(spark: SparkSession, sf_dir: str, docs: DataFrame | None = None):
    """Shared trainer: returns (feature frame, final 1-row weight
    frame, per-round trajectory frame) — the trajectory query reports
    the third, the inference/confusion query scores with the first
    two; the held-out eval passes its own training shard via `docs`."""
    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    feat = _pct_features(docs)
    n = feat.agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = spark.range(1).select(
        *[F.lit(0).cast("long").alias(f"w{i}") for i in range(4)]
    )
    out = None
    for t in range(1, _PCT_ROUNDS + 1):
        j = feat.crossJoin(F.broadcast(w))
        margin = sum(F.col(f"w{i}") * F.col(f"x{i}") for i in range(4))
        err = F.col("y") - F.when(margin >= 0, 1).otherwise(0)
        upd = j.agg(
            *[F.sum(err * F.col(f"x{i}")).alias(f"d{i}") for i in range(4)],
            F.sum(F.when(err != 0, 1).otherwise(0)).cast("long").alias("miss"),
        )
        neww = upd.crossJoin(F.broadcast(w)).select(
            *[(F.col(f"w{i}") + F.col(f"d{i}")).cast("long").alias(f"w{i}") for i in range(4)],
            "miss",
        )
        # lineage cut per round: the weight frame is 1 row, but without
        # the checkpoint round t's logical plan embeds rounds 1..t-1
        # combinatorially (the documented unrolled-composition hazard)
        neww = neww.localCheckpoint(eager=True)
        row = neww.crossJoin(F.broadcast(n)).select(
            F.lit(t).cast("int").alias("round"),
            F.col("miss").alias("n_misclassified"),
            "w0",
            "w1",
            "w2",
            "w3",
            F.round(1.0 - F.col("miss") / F.col("n").cast("double"), 4).alias(
                "accuracy"
            ),
        )
        out = row if out is None else out.unionByName(row)
        w = neww.select("w0", "w1", "w2", "w3")
    return feat, w, out


# -- tokenizer eval: held-out OOV / coverage ----------------------------------
# The missing third leg of the tokenizer-induction discipline (train =
# bpe_train_merges, tune = bpe_compression_curve, equity =
# bpe_fertility_by_lang): a vocabulary fixed on TRAINING data must be
# judged on text it has never seen. Train on the 90% shard, evaluate
# word-level coverage and fertility on the held-out 10%.

_BPE_HELDOUT_MOD = 10
_BPE_HELDOUT_REM = 7


def _duck_bpe_heldout_oov() -> str:
    from vector_search_ner_spark.plans.queries_text import _duck_lang_scripted

    parts = [
        f"""train AS (
  SELECT * FROM documents
  WHERE doc_id % {_BPE_HELDOUT_MOD} <> {_BPE_HELDOUT_REM}
), heldout AS (
  SELECT * FROM documents
  WHERE doc_id % {_BPE_HELDOUT_MOD} = {_BPE_HELDOUT_REM}
)"""
    ]
    parts.extend(_duck_bpe_ctes(carry_word=True, source="train"))
    parts.append(
        f"""enc AS (
  SELECT w, CAST(len(string_split(trim(seg), '  ')) AS BIGINT) AS n_tok
  FROM v{_BPE_ROUNDS}
), hw AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w FROM heldout
), lang AS (
  SELECT doc_id, {_duck_lang_scripted()} AS lang_pred FROM heldout
), scored AS (
  SELECT l.lang_pred, hw.w, enc.n_tok
  FROM hw JOIN lang l ON hw.doc_id = l.doc_id
  LEFT JOIN enc ON enc.w = hw.w
  WHERE hw.w <> ''
)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + """
SELECT lang_pred,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(CASE WHEN n_tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       ROUND(SUM(CASE WHEN n_tok IS NULL THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS oov_rate,
       ROUND(SUM(COALESCE(n_tok, 0)) /
             CAST(NULLIF(SUM(CASE WHEN n_tok IS NOT NULL THEN 1 ELSE 0 END), 0)
                  AS DOUBLE), 6) AS fertility_covered
FROM scored GROUP BY lang_pred ORDER BY lang_pred
"""
    )


@query("bpe_heldout_oov", oracle=_duck_bpe_heldout_oov())
def bpe_heldout_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out tokenizer evaluation: train the BPE vocabulary on the
    90% shard (doc_id % 10 != 7), then measure WORD-level coverage on
    the unseen 10% — per predicted language: held-out word count, OOV
    count (words with no trained segmentation), OOV rate, and
    fertility over the covered words. This is the eval a tokenizer
    team runs before freezing a vocab: in-corpus fertility
    (`bpe_fertility_by_lang`) flatters the tokenizer because every
    word was seen in training; the held-out OOV rate is what inference
    on fresh data will actually hit (a production tokenizer byte-falls
    back on OOV — the rate here prices how often that slow path
    fires).

    Scale shape: identical to `bpe_encode_corpus` with the train/eval
    split pushed into the scans (both shards read the same parquet
    once each, predicate in the scan); the held-out stream LEFT-joins
    the vocabulary-sized (w, n_tok) relation so misses survive as
    NULLs; language routing and the final per-language agg are the
    fertility query's shapes. Integer sums, two divisions, round(6)."""
    return bpe_heldout_frame(load_table(spark, sf_dir, "documents"))


def bpe_heldout_frame(docs: DataFrame) -> DataFrame:
    """The held-out OOV eval over an explicit (doc_id, text) frame —
    shared by the registered query and the synthetic-OOV semantics
    test (the fixture corpus has a closed vocabulary, so the NULL/OOV
    leg only fires on constructed input)."""
    from vector_search_ner_spark.plans.queries_text import quality_gate_frame

    is_held = F.pmod(F.col("doc_id"), F.lit(_BPE_HELDOUT_MOD)) == _BPE_HELDOUT_REM
    train = docs.where(~is_held)
    heldout = docs.where(is_held)
    _merges, vocab = _bpe_train_loop(train, _BPE_ROUNDS)
    enc = vocab.select(
        "w",
        F.size(F.split(F.trim(F.col("seg")), "  ")).cast("long").alias("n_tok"),
    )
    hw = heldout.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), " ")).alias("w")
    ).where(F.col("w") != "")
    lang = quality_gate_frame(heldout).select("doc_id", "lang_pred")
    scored = hw.join(lang, "doc_id").join(enc, "w", "left")
    covered = F.when(F.col("n_tok").isNotNull(), 1).otherwise(0)
    return (
        scored.groupBy("lang_pred")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum(1 - covered).cast("long").alias("n_oov"),
            F.round(
                F.sum(1 - covered) / F.count(F.lit(1)).cast("double"), 6
            ).alias("oov_rate"),
            F.round(
                F.sum(F.coalesce(F.col("n_tok"), F.lit(0)))
                / F.nullif(F.sum(covered), F.lit(0)).cast("double"),
                6,
            ).alias("fertility_covered"),
        )
        .orderBy("lang_pred")
    )


# -- sequence-length bucketing for padded batching ----------------------------
# `dataset_pack_sequences` is the concatenate-and-split packing used
# for decoder pretraining; LENGTH BUCKETING is the other batching
# regime (encoder/seq2seq fine-tuning, where documents must not be
# split or concatenated): group docs into length quantiles and pad
# each batch only to its bucket's max — the report prices the padding
# waste each bucket still pays.

_LB_BUDGET = 2048  # padded tokens per batch


@query(
    "dataset_length_buckets",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, len(string_split(trim(text), ' ')) AS n_tok FROM documents
), q AS (
  SELECT quantile_cont(n_tok, 0.25) AS q1, quantile_cont(n_tok, 0.5) AS q2,
         quantile_cont(n_tok, 0.75) AS q3
  FROM toks
), b AS (
  SELECT CASE WHEN n_tok <= q.q1 THEN 0 WHEN n_tok <= q.q2 THEN 1
              WHEN n_tok <= q.q3 THEN 2 ELSE 3 END AS bucket, n_tok
  FROM toks CROSS JOIN q
), s AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
         CAST(MAX(n_tok) AS BIGINT) AS pad_to
  FROM b GROUP BY bucket
)
SELECT CAST(bucket AS INTEGER) AS bucket, n_docs, n_tokens, pad_to,
       CAST(GREATEST({_LB_BUDGET} // pad_to, 1) AS BIGINT) AS docs_per_batch,
       CAST(CEIL(n_docs / CAST(GREATEST({_LB_BUDGET} // pad_to, 1) AS DOUBLE))
            AS BIGINT) AS n_batches,
       ROUND(1.0 - n_tokens / CAST(n_docs * pad_to AS DOUBLE), 6) AS pad_waste
FROM s ORDER BY bucket
""",
)
def dataset_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-quantile bucketing for padded batch assembly: split the
    corpus at its exact token-count quartiles, and per bucket report
    size, total real tokens, the bucket's pad-to length (its max),
    docs per batch under the _LB_BUDGET padded-token budget, batch
    count, and the padding-waste ratio the bucket still pays (1 -
    real/padded). Bucketing by length is what keeps padding waste at
    the per-bucket spread instead of the corpus-wide spread — the
    standard batching regime when documents cannot be packed
    (`dataset_pack_sequences` covers the regime where they can).

    Scale shape: one map-only token count, ONE exact-percentile
    aggregate (array-argument percentile — a single buffer, the
    `sketch_distinct_quantiles` discipline) broadcast back as a 1-row
    frame, then one map-side-combining agg on 4 bucket keys. At 100 TB
    the exact percentile is the only heavy stage and degrades
    gracefully to percentile_approx without changing the contract."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.size(F.split(F.trim(F.col("text")), " ")).alias("n_tok")
    )
    q = toks.agg(
        F.expr("percentile(n_tok, array(0.25D, 0.5D, 0.75D))").alias("q")
    ).select(F.col("q")[0].alias("q1"), F.col("q")[1].alias("q2"), F.col("q")[2].alias("q3"))
    b = toks.crossJoin(F.broadcast(q)).select(
        F.when(F.col("n_tok") <= F.col("q1"), 0)
        .when(F.col("n_tok") <= F.col("q2"), 1)
        .when(F.col("n_tok") <= F.col("q3"), 2)
        .otherwise(3)
        .cast("int")
        .alias("bucket"),
        "n_tok",
    )
    s = b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.max("n_tok").cast("long").alias("pad_to"),
    )
    dpb = F.greatest(F.expr(f"{_LB_BUDGET} div pad_to"), F.lit(1)).cast("long")
    return s.select(
        "bucket",
        "n_docs",
        "n_tokens",
        "pad_to",
        dpb.alias("docs_per_batch"),
        F.ceil(F.col("n_docs") / dpb.cast("double")).cast("long").alias("n_batches"),
        F.round(
            1.0 - F.col("n_tokens") / (F.col("n_docs") * F.col("pad_to")).cast("double"),
            6,
        ).alias("pad_waste"),
    ).orderBy("bucket")


# -- model-based quality filtering: inference + teacher agreement -------------


def _pct_infer_oracle() -> str:
    ctes = [f"feat AS ({_pct_feat_sql()})", "w0 AS (SELECT 0 AS w0, 0 AS w1, 0 AS w2, 0 AS w3)"]
    for t in range(1, _PCT_ROUNDS + 1):
        p = t - 1
        margin = "w.w0 * f.x0 + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3"
        err = f"f.y - (CASE WHEN {margin} >= 0 THEN 1 ELSE 0 END)"
        ctes.append(
            f"""u{t} AS (
  SELECT SUM(({err}) * f.x0) AS d0, SUM(({err}) * f.x1) AS d1,
         SUM(({err}) * f.x2) AS d2, SUM(({err}) * f.x3) AS d3
  FROM feat f CROSS JOIN w{p} w
)"""
        )
        ctes.append(
            f"w{t} AS (SELECT w.w0 + u.d0 AS w0, w.w1 + u.d1 AS w1,"
            f" w.w2 + u.d2 AS w2, w.w3 + u.d3 AS w3"
            f" FROM u{t} u CROSS JOIN w{p} w)"
        )
    ctes.append(
        f"""scored AS (
  SELECT f.y,
         CASE WHEN w.w0 * f.x0 + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3 >= 0
              THEN 1 ELSE 0 END AS pred
  FROM feat f CROSS JOIN w{_PCT_ROUNDS} w
)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT CAST(SUM(CASE WHEN y = 1 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       CAST(SUM(CASE WHEN y = 0 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       CAST(SUM(CASE WHEN y = 1 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       CAST(SUM(CASE WHEN y = 0 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
       ROUND(SUM(CASE WHEN y = pred THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS agreement,
       ROUND(SUM(CASE WHEN y = 1 AND pred = 1 THEN 1 ELSE 0 END)
             / CAST(NULLIF(SUM(pred), 0) AS DOUBLE), 6) AS precision,
       ROUND(SUM(CASE WHEN y = 1 AND pred = 1 THEN 1 ELSE 0 END)
             / CAST(NULLIF(SUM(y), 0) AS DOUBLE), 6) AS recall
FROM scored
"""
    )


@query("quality_classifier_inference", oracle=_pct_infer_oracle())
def quality_classifier_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INFERENCE half of classifier-based filtering: score the
    corpus with the trained perceptron's final weights and report the
    student-vs-teacher confusion matrix (tp/fp/fn/tn), agreement rate,
    and precision/recall of the student against the rule-gate teacher
    — the acceptance report a curation team reads before swapping the
    expensive teacher out of the 100 TB path. (FineWeb-Edu publishes
    exactly this before trusting its distilled classifier.)

    Scale shape: training reuses `quality_classifier_perceptron`'s
    loop (linear integer aggs, 1-row weight frames, lineage-cut per
    round); inference is then ONE map-only margin projection with the
    weights cross-joined as a broadcast 1-row frame, and the confusion
    matrix is a single map-side-combining aggregation. The whole
    report adds one corpus pass on top of training."""
    feat, w, _trajectory = _pct_train(spark, sf_dir)
    scored = feat.crossJoin(F.broadcast(w)).select(
        "y",
        F.when(
            sum(F.col(f"w{i}") * F.col(f"x{i}") for i in range(4)) >= 0, 1
        )
        .otherwise(0)
        .alias("pred"),
    )
    y, p = F.col("y"), F.col("pred")
    return scored.agg(
        F.sum(((y == 1) & (p == 1)).cast("long")).alias("tp"),
        F.sum(((y == 0) & (p == 1)).cast("long")).alias("fp"),
        F.sum(((y == 1) & (p == 0)).cast("long")).alias("fn"),
        F.sum(((y == 0) & (p == 0)).cast("long")).alias("tn"),
        F.round(F.sum((y == p).cast("long")) / F.count(F.lit(1)).cast("double"), 6).alias(
            "agreement"
        ),
        F.round(
            F.sum(((y == 1) & (p == 1)).cast("long"))
            / F.nullif(F.sum(p.cast("long")), F.lit(0)).cast("double"),
            6,
        ).alias("precision"),
        F.round(
            F.sum(((y == 1) & (p == 1)).cast("long"))
            / F.nullif(F.sum(y.cast("long")), F.lit(0)).cast("double"),
            6,
        ).alias("recall"),
    )


# -- governance: k-member microaggregation ------------------------------------
# The numeric-attribute counterpart of `anonymize_generalize`
# (Domingo-Ferrer & Mateo-Sanz, "Practical Data-Oriented
# Microaggregation for Statistical Disclosure Control", TKDE 2002):
# instead of coarsening categorical quasi-identifiers, partition each
# segment's records into contiguous-by-value groups of >= k and
# release the GROUP MEAN in place of each record's value — k-anonymity
# for the numeric column with minimal within-group variance for
# contiguous partitioning.

_MICRO_K = 8


@query(
    "anonymize_microagg",
    oracle=f"""
WITH ranked AS (
  SELECT c_mktsegment, c_acctbal,
         row_number() OVER (
           PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS rn,
         COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
  FROM customer
), grouped AS (
  SELECT c_mktsegment, c_acctbal,
         LEAST(CAST((rn - 1) // {_MICRO_K} AS BIGINT),
               CAST(n // {_MICRO_K} AS BIGINT) - 1) AS grp
  FROM ranked
  WHERE n >= {_MICRO_K}
)
SELECT c_mktsegment, grp, group_size,
       mean_cents / 100.0 AS released_value, lo, hi
FROM (
  SELECT c_mktsegment, grp,
         CAST(COUNT(*) AS BIGINT) AS group_size,
         CASE WHEN SUM(CAST(round(c_acctbal * 100) AS BIGINT)) >= 0
              THEN (2 * SUM(CAST(round(c_acctbal * 100) AS BIGINT)) + COUNT(*))
                   // (2 * COUNT(*))
              ELSE -((2 * -SUM(CAST(round(c_acctbal * 100) AS BIGINT)) + COUNT(*))
                     // (2 * COUNT(*))) END AS mean_cents,
         MIN(c_acctbal) AS lo,
         MAX(c_acctbal) AS hi
  FROM grouped GROUP BY c_mktsegment, grp
)
""",
)
def anonymize_microagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-member microaggregation of account balances within each
    market segment: rank records by value, cut into contiguous groups
    of _MICRO_K (the final short remainder folds into the last full
    group, so every group has >= k members — the fixed-size variant of
    Domingo-Ferrer's MDAV). A segment with FEWER than k rows total has
    no full group to fold into (the fold formula would emit grp = -1,
    an under-k group) — such segments are SUPPRESSED outright, the
    standard disclosure-control fallback, so the k-anonymity contract
    holds unconditionally, not just on corpora where every segment
    happens to reach k. Release each group's mean (exact integer-cents arithmetic,
    half-away-from-zero — decimal AVG hits true .xx5 boundaries
    where engine rounding modes diverge) as the
    anonymized value alongside its size and true span. Contiguous
    cutting minimizes within-group variance for a 1-D attribute, so
    the released means stay analytically useful while no individual
    balance survives.

    Scale shape: the rank is a PER-SEGMENT window (keyed, not global —
    each segment sorts independently across the cluster, the same
    shape as every window query here); grouping and the release agg
    are one map-side-combining hash agg on (segment, grp). DECIMAL
    accumulation for the mean, round(2) at the end — bit-equal across
    engines regardless of summation order."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    ranked = cust.select(
        "c_mktsegment",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("c_mktsegment"))
        .alias("n"),
    )
    grp = F.least(
        F.expr(f"(rn - 1) div {_MICRO_K}").cast("long"),
        (F.expr(f"n div {_MICRO_K}") - 1).cast("long"),
    )
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    agg = (
        ranked.where(F.col("n") >= _MICRO_K)
        .select(
            "c_mktsegment", "c_acctbal", grp.alias("grp"), cents.alias("cents")
        )
        .groupBy("c_mktsegment", "grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("group_size"),
            F.sum("cents").alias("s"),
            F.min("c_acctbal").alias("lo"),
            F.max("c_acctbal").alias("hi"),
        )
    )
    # integer half-away-from-zero mean in cents: decimal AVG + round(2)
    # lands on true .xx5 boundaries where the engines' rounding modes
    # diverge (measured: one group at 9142.675); the cents integer is
    # exact in both engines, and mean_cents/100.0 is the identical
    # double on both sides
    mean_cents = F.when(
        F.col("s") >= 0, F.expr("(2 * s + group_size) div (2 * group_size)")
    ).otherwise(-F.expr("(2 * -s + group_size) div (2 * group_size)"))
    return agg.select(
        "c_mktsegment",
        "grp",
        "group_size",
        (mean_cents / 100.0).alias("released_value"),
        "lo",
        "hi",
    )


# -- mixture: token-budget allocation / epoch planner --------------------------

_MTB_BUDGET = 1_000_000  # training tokens to allocate across languages


def _duck_mixture_budget() -> str:
    from vector_search_ner_spark.plans.queries_text import _duck_lang_scripted

    return f"""
WITH lang AS (
  SELECT doc_id, {_duck_lang_scripted()} AS lang_pred,
         len(string_split(trim(text), ' ')) AS n_tokens
  FROM documents
), per_lang AS (
  SELECT lang_pred,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
  FROM lang GROUP BY lang_pred
), tot AS (
  SELECT SUM(n_tokens) AS t FROM per_lang
), w AS (
  SELECT p.lang_pred, p.n_docs, p.n_tokens,
         CAST(FLOOR(sqrt(CAST(p.n_tokens AS DOUBLE) / t.t) * 1000000000000) AS BIGINT) AS w_u
  FROM per_lang p CROSS JOIN tot t
), ws AS (
  SELECT SUM(w_u) AS sw FROM w
)
SELECT w.lang_pred, w.n_docs, w.n_tokens,
       CAST((w.w_u * {_MTB_BUDGET}) // ws.sw AS BIGINT) AS alloc_tokens,
       ROUND(((w.w_u * {_MTB_BUDGET}) // ws.sw) / CAST(w.n_tokens AS DOUBLE), 4)
         AS epochs,
       ((w.w_u * {_MTB_BUDGET}) // ws.sw) > w.n_tokens AS upsampled
FROM w CROSS JOIN ws
ORDER BY w.lang_pred
"""


@query("mixture_token_budget", oracle=_duck_mixture_budget())
def mixture_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EPOCH PLANNER that turns mixture weights into a training
    run: allocate a fixed token budget (_MTB_BUDGET) across languages
    proportionally to the temperature-flattened weights
    (`mixture_temperature_weights`, alpha=0.5), and report per
    language the allocated tokens, the implied epochs over its
    available data (allocated / available — the number a data-curation
    team reads against the known repetition-degradation thresholds),
    and whether the allocation upsamples (epochs > 1). Allocation is
    integer micro-weight arithmetic — (w_u * B) div sum(w_u) — so the
    split is exact, order-independent, and engine-identical; the only
    float is the final epochs ratio, one division then round(4).

    Scale shape: everything after the one corpus scan (language
    routing + token counts, the temperature query's plan verbatim)
    runs on a languages-sized frame — the planner itself is free."""
    from vector_search_ner_spark.plans.queries_text import quality_gate_frame

    docs = load_table(spark, sf_dir, "documents")
    lang = quality_gate_frame(docs).select("doc_id", "lang_pred")
    toks = docs.select(
        "doc_id", F.size(F.split(F.trim(F.col("text")), " ")).alias("n_tokens")
    )
    per_lang = (
        toks.join(lang, "doc_id")
        .groupBy("lang_pred")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
    )
    tot = per_lang.agg(F.sum("n_tokens").alias("t"))
    w = per_lang.crossJoin(F.broadcast(tot)).select(
        "lang_pred",
        "n_docs",
        "n_tokens",
        F.floor(
            F.sqrt(F.col("n_tokens").cast("double") / F.col("t")) * 1_000_000_000_000
        )
        .cast("long")
        .alias("w_u"),
    )
    ws = w.agg(F.sum("w_u").alias("sw"))
    alloc = F.expr(f"(w_u * {_MTB_BUDGET}) div sw").cast("long")
    return (
        w.crossJoin(F.broadcast(ws))
        .select(
            "lang_pred",
            "n_docs",
            "n_tokens",
            alloc.alias("alloc_tokens"),
            F.round(alloc / F.col("n_tokens").cast("double"), 4).alias("epochs"),
            (alloc > F.col("n_tokens")).alias("upsampled"),
        )
        .orderBy("lang_pred")
    )


# -- model-based quality filtering: HELD-OUT acceptance ------------------------

_PCT_HELD_MOD = 10
_PCT_HELD_REM = 3  # disjoint from the BPE eval's held-out shard (7)


def _pct_heldout_oracle() -> str:
    train_src = (
        f"(SELECT * FROM documents WHERE doc_id % {_PCT_HELD_MOD}"
        f" <> {_PCT_HELD_REM})"
    )
    held_src = (
        f"(SELECT * FROM documents WHERE doc_id % {_PCT_HELD_MOD}"
        f" = {_PCT_HELD_REM})"
    )
    ctes = [
        f"feat AS ({_pct_feat_sql(train_src)})",
        f"held AS ({_pct_feat_sql(held_src)})",
        "w0 AS (SELECT 0 AS w0, 0 AS w1, 0 AS w2, 0 AS w3)",
    ]
    for t in range(1, _PCT_ROUNDS + 1):
        p = t - 1
        margin = "w.w0 * f.x0 + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3"
        err = f"f.y - (CASE WHEN {margin} >= 0 THEN 1 ELSE 0 END)"
        ctes.append(
            f"""u{t} AS (
  SELECT SUM(({err}) * f.x0) AS d0, SUM(({err}) * f.x1) AS d1,
         SUM(({err}) * f.x2) AS d2, SUM(({err}) * f.x3) AS d3
  FROM feat f CROSS JOIN w{p} w
)"""
        )
        ctes.append(
            f"w{t} AS (SELECT w.w0 + u.d0 AS w0, w.w1 + u.d1 AS w1,"
            f" w.w2 + u.d2 AS w2, w.w3 + u.d3 AS w3"
            f" FROM u{t} u CROSS JOIN w{p} w)"
        )
    ctes.append(
        f"""scored AS (
  SELECT f.y,
         CASE WHEN w.w0 * f.x0 + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3 >= 0
              THEN 1 ELSE 0 END AS pred
  FROM held f CROSS JOIN w{_PCT_ROUNDS} w
)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT CAST(SUM(CASE WHEN y = 1 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       CAST(SUM(CASE WHEN y = 0 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       CAST(SUM(CASE WHEN y = 1 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       CAST(SUM(CASE WHEN y = 0 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
       ROUND(SUM(CASE WHEN y = pred THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS agreement,
       ROUND(SUM(CASE WHEN y = 1 AND pred = 1 THEN 1 ELSE 0 END)
             / CAST(NULLIF(SUM(pred), 0) AS DOUBLE), 6) AS precision,
       ROUND(SUM(CASE WHEN y = 1 AND pred = 1 THEN 1 ELSE 0 END)
             / CAST(NULLIF(SUM(y), 0) AS DOUBLE), 6) AS recall
FROM scored
"""
    )


@query("quality_classifier_heldout", oracle=_pct_heldout_oracle())
def quality_classifier_heldout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HONEST acceptance report for the distilled quality
    classifier: train the perceptron on the 90% shard (doc_id % 10
    != 3 — disjoint from the BPE eval's shard) and report the
    confusion matrix on the UNSEEN 10%. `quality_classifier_inference`
    evaluates on the training corpus, which flatters the model the
    way in-corpus fertility flatters a tokenizer; this is the number
    that decides whether the distilled filter ships
    (`bpe_heldout_oov` is the same protocol for the tokenizer). One
    shared feature projection (`_pct_features`) serves both shards,
    so train- and eval-side features cannot drift; training is the
    shared loop, scoring one map-only margin projection over the
    held-out shard."""
    docs = load_table(spark, sf_dir, "documents")
    is_held = F.pmod(F.col("doc_id"), F.lit(_PCT_HELD_MOD)) == _PCT_HELD_REM
    _feat, w, _traj = _pct_train(spark, sf_dir, docs=docs.where(~is_held))
    held = _pct_features(docs.where(is_held))
    scored = held.crossJoin(F.broadcast(w)).select(
        "y",
        F.when(
            sum(F.col(f"w{i}") * F.col(f"x{i}") for i in range(4)) >= 0, 1
        )
        .otherwise(0)
        .alias("pred"),
    )
    y, p = F.col("y"), F.col("pred")
    return scored.agg(
        F.sum(((y == 1) & (p == 1)).cast("long")).alias("tp"),
        F.sum(((y == 0) & (p == 1)).cast("long")).alias("fp"),
        F.sum(((y == 1) & (p == 0)).cast("long")).alias("fn"),
        F.sum(((y == 0) & (p == 0)).cast("long")).alias("tn"),
        F.round(F.sum((y == p).cast("long")) / F.count(F.lit(1)).cast("double"), 6).alias(
            "agreement"
        ),
        F.round(
            F.sum(((y == 1) & (p == 1)).cast("long"))
            / F.nullif(F.sum(p.cast("long")), F.lit(0)).cast("double"),
            6,
        ).alias("precision"),
        F.round(
            F.sum(((y == 1) & (p == 1)).cast("long"))
            / F.nullif(F.sum(y.cast("long")), F.lit(0)).cast("double"),
            6,
        ).alias("recall"),
    )


@query("bpe_encode_from_store", oracle=_duck_bpe_encode())
def bpe_encode_from_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`bpe_encode_corpus` served from the PERSISTED tokenizer
    artifact (sources/tokenizer_store.py::bpe_store) — the BPE twin of
    `unigram_encode_from_store`, completing the artifact story for
    BOTH trainers: the merge table and the pre-encoded word-
    segmentation table persist once per generation (write-then-swap,
    source-fingerprint key), and the corpus encoder joins the exploded
    (doc_id, w) stream against the STORED (w, n_tok) relation — the
    training loop never re-runs per consumer. Unseen words would take
    the stored MERGE TABLE's open-vocabulary path (`bpe_heldout_oov`
    measures that miss rate); on the training corpus the segmentation
    table covers every word, which is exactly the fast path a serving
    encoder hits.

    The oracle re-derives the artifact from first principles (the full
    train-chain CTEs), so the persisted content is value-checked — a
    stale generation flips the hash. Output identical to
    `bpe_encode_corpus` by construction (shared oracle)."""
    from vector_search_ner_spark.sources.tokenizer_store import bpe_store

    docs = load_table(spark, sf_dir, "documents")
    _merges, word_segs = bpe_store(spark, sf_dir)
    enc = word_segs.select(
        "w",
        F.size(F.split(F.trim(F.col("seg")), "  ")).cast("long").alias("n_tok"),
    )
    dw = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), " ")).alias("w")
    ).where(F.col("w") != "")
    return (
        dw.join(enc, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.sum(F.length("w")).cast("long").alias("n_chars"),
        )
        .orderBy("doc_id")
    )

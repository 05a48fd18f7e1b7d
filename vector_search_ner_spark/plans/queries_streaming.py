"""Structured Streaming queries. stream_tumbling_counts shares its
oracle with the batch twin (streaming == batch, bit-for-bit); the
stateful dedup / session queries are rows-only (driver records the
weaker check — streaming state semantics aren't ANSI-SQL-expressible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from vector_search_ner_spark.registry import query
from vector_search_ner_spark.streaming import events as se

_TUMBLING_ORACLE = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
FROM events
GROUP BY 1, 2
"""


@query("stream_tumbling_counts", oracle=_TUMBLING_ORACLE)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return se.stream_tumbling_counts(spark, sf_dir)


# the source is events DOUBLED; exact dedup must give back the original
_DEDUP_ORACLE = """
SELECT event_id, user_id, event_type FROM events
"""


@query("stream_dedup_within_watermark", oracle=_DEDUP_ORACLE)
def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    return se.stream_dedup_within_watermark(spark, sf_dir)


# same first-principles session derivation as the batch twin
# (events_session_windows): lag + gap-flag cumsum islands
_SESSION_ORACLE = """
WITH gaps AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL '10 minutes'
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
), sessions AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM gaps
)
SELECT user_id, MIN(ts) AS session_start,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM sessions GROUP BY user_id, session_id
"""


@query("stream_session_counts", oracle=_SESSION_ORACLE)
def stream_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return se.stream_session_counts(spark, sf_dir)


_INGEST_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
FROM events
GROUP BY event_type
"""


@query("stream_ingest_foreachbatch", oracle=_INGEST_ORACLE)
def stream_ingest_foreachbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return se.stream_ingest_foreachbatch(spark, sf_dir)


_STREAM_STATIC_ORACLE = """
SELECT time_bucket(INTERVAL '1 hour', e.ts) AS window_start,
       d.lang, e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events e JOIN documents d ON e.user_id = d.doc_id
GROUP BY 1, 2, 3
"""


@query("stream_static_join_counts", oracle=_STREAM_STATIC_ORACLE)
def stream_static_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return se.stream_static_enriched_counts(spark, sf_dir)


# watermarked stream-stream interval join == the identical batch
# self-join (inner joins emit every match exactly once)
_STREAM_STREAM_ORACLE = """
SELECT a.event_id AS click_id, b.event_id AS view_id, a.user_id
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_type = 'click' AND b.event_type = 'view'
 AND b.ts >= a.ts - INTERVAL 1 HOUR AND b.ts <= a.ts
"""


@query("stream_stream_interval_join", oracle=_STREAM_STREAM_ORACLE)
def stream_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return se.stream_stream_interval_join(spark, sf_dir)


# applyInPandasWithState accumulates in integer cents -> deterministic,
# so this custom stateful op gets a FULL batch oracle (streaming final
# state == batch group-by, exactly).
_RUNNING_STATS_ORACLE = """
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
FROM events
GROUP BY user_id
"""


@query("stream_user_running_stats", oracle=_RUNNING_STATS_ORACLE)
def stream_user_running_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return se.stream_user_running_stats(spark, sf_dir)


# same two-origin bucket derivation as the batch twin
_SLIDING_ORACLE = """
WITH offsets AS (
  SELECT unnest([TIMESTAMP '2000-01-01 00:00:00',
                 TIMESTAMP '2000-01-01 00:30:00']) AS origin
), bucketed AS (
  SELECT time_bucket(INTERVAL '1 hour', e.ts, o.origin) AS window_start, e.value
  FROM events e CROSS JOIN offsets o
)
SELECT window_start, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
FROM bucketed GROUP BY 1
"""


@query("stream_sliding_counts", oracle=_SLIDING_ORACLE)
def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return se.stream_sliding_counts(spark, sf_dir)


# the serving loop answers the SAME queries as the batch k-NN — the
# oracle is knn_topk_cosine's, verbatim
def _knn_serving_oracle() -> str:
    from vector_search_ner_spark.plans.queries_vector import K, _duck_knn
    from vector_search_ner_spark.functions.vector import duck_cosine

    return _duck_knn(duck_cosine("q.query_vec", "d.embedding"), "DESC", k=K)


@query("stream_knn_serving", oracle=_knn_serving_oracle())
def stream_knn_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    return se.stream_knn_serving(spark, sf_dir)


# the BQ serving loop answers the SAME queries as the batch BQ search —
# the oracle is ann_bq_hamming_topk's, verbatim
def _bq_serving_oracle() -> str:
    from vector_search_ner_spark.operators import bq
    from vector_search_ner_spark.plans.queries_pq import (
        _BQ_K,
        _BQ_OVERFETCH,
        _N_QUERIES,
    )

    return bq.duck_bq_topk_sql(_N_QUERIES, _BQ_K, _BQ_OVERFETCH)


@query("stream_bq_serving", oracle=_bq_serving_oracle())
def stream_bq_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-stream serving on the BINARY-QUANTIZED tier: each
    micro-batch of arriving queries is answered by `bq_hamming_topk`
    (Hamming candidates over the 16 B/row code table, exact re-rank
    of the broadcast candidate list) against the static corpus —
    the 256x-compression tier composed into the streaming surface,
    beside `stream_knn_serving`'s exact twin. Shares the batch BQ
    oracle bit-for-bit."""
    return se.stream_bq_serving(spark, sf_dir)


# streaming flag == the batch band self-join: a doc is flagged iff it
# shares a MinHash band bucket with a DIFFERENT doc (full oracle)
def _neardup_flag_oracle() -> str:
    from vector_search_ner_spark.operators import neardup as nd

    sig_cols = ",\n       ".join(
        f"{nd.duck_minhash_sig(j, 'hs')} AS mh{j}" for j in range(nd.N_PERM)
    )
    band_selects = "\nUNION ALL\n".join(
        f"SELECT sid, {bi} AS band, {nd.duck_band_key(bi)} AS key FROM sigs"
        for bi in range(nd.N_BANDS)
    )
    return f"""
WITH t AS (
  SELECT doc_id AS sid, {nd.duck_token_hashes60()} AS th FROM documents
), sh AS (
  SELECT sid, {nd.duck_gram_hashes60("th")} AS hs FROM t
), sigs AS (
  SELECT sid, {sig_cols} FROM sh
), bands AS (
{band_selects}
)
SELECT DISTINCT a.sid AS doc_id
FROM bands a JOIN bands b
  ON a.band = b.band AND a.key = b.key AND a.sid != b.sid
"""


@query("stream_neardup_flag", oracle=_neardup_flag_oracle())
def stream_neardup_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming near-dup flagging at ingest: arriving docs compute
    MinHash band keys map-only and a stateless stream-static semi join
    against the corpus band table flags the ones sharing a bucket with
    any OTHER doc — dedup before the data lands, the streaming half of
    `dedup_clusters_lsh`. Full oracle: the flag set equals the batch
    band self-join exactly."""
    return se.stream_neardup_ingest(spark, sf_dir)


def _pii_scrub_oracle() -> str:
    from vector_search_ner_spark.plans.queries_text import PII_SCRUB_ORACLE

    return PII_SCRUB_ORACLE


@query("stream_pii_scrub", oracle=_pii_scrub_oracle())
def stream_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrub-at-ingest: the batch `text_pii_scrub` expressions applied
    per micro-batch as documents land (stateless map-only stream —
    ingest throughput = scan rate). Shares the batch oracle verbatim:
    streaming == batch, bit-for-bit."""
    return se.stream_pii_scrub(spark, sf_dir)


def _quality_gate_oracle() -> str:
    from vector_search_ner_spark.plans.queries_text import QUALITY_GATE_ORACLE

    return QUALITY_GATE_ORACLE


@query("stream_quality_gate", oracle=_quality_gate_oracle())
def stream_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate-at-ingest: the batch `doc_language_quality_gate`
    expressions applied per micro-batch as documents land (stateless
    map-only stream — the keep/drop verdict exists before the doc ever
    hits the lake, so rejects never cost a second scan). Shares the
    batch oracle verbatim: streaming == batch, bit-for-bit."""
    return se.stream_quality_gate(spark, sf_dir)


def _index_ingest_oracle() -> str:
    from vector_search_ner_spark.functions.text import duck_stable_long_hash
    from vector_search_ner_spark.operators import neardup as nd

    sig_cols = ",\n       ".join(
        f"{nd.duck_minhash_sig(j, 'hs')} AS mh{j}" for j in range(nd.N_PERM)
    )
    band_selects = "\nUNION ALL\n".join(
        f"SELECT sid, {bi} AS band, {nd.duck_band_key(bi)} AS key FROM sigs"
        for bi in range(nd.N_BANDS)
    )
    kh = duck_stable_long_hash("key")
    ch = duck_stable_long_hash("array_to_string(list_sort(hs), ',')")
    return f"""
WITH t AS (
  SELECT doc_id AS sid, {nd.duck_token_hashes60()} AS th FROM documents
), sh AS MATERIALIZED (
  SELECT sid, {nd.duck_gram_hashes60("th")} AS hs FROM t
), sigs AS (
  SELECT sid, hs,
       {sig_cols}
  FROM sh
), bands AS (
{band_selects}
)
SELECT CAST(band AS INTEGER) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT key) AS BIGINT) AS n_keys,
       CAST(SUM(sid) AS BIGINT) AS sid_sum,
       bit_xor({kh}) AS content_xor
FROM bands GROUP BY band
UNION ALL
SELECT -1 AS band,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT sid) AS BIGINT) AS n_keys,
       CAST(SUM(sid) AS BIGINT) AS sid_sum,
       bit_xor({ch}) AS content_xor
FROM sh
ORDER BY band
"""


@query("stream_index_ingest", oracle=_index_ingest_oracle())
def stream_index_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online maintenance of the persisted shingle/minhash dedup index:
    the new shard arrives as a stream, each micro-batch appends its
    shingle sets and band keys as idempotent batch_id=N delta
    generations, and the MERGED index (base store ∪ streamed delta)
    must equal the batch derivation over the full corpus — per-band
    row/key counts, sid sums, and bit_xor content checksums over the
    60-bit key hashes (band=-1 row checksums the full shingle table).
    The O(delta) index-append that keeps dedup_incremental_vs_index
    serving against a fresh index."""
    return se.stream_index_ingest(spark, sf_dir)


def _semantic_append_oracle() -> str:
    from vector_search_ner_spark.functions.text import duck_stable_long_hash
    from vector_search_ner_spark.plans.queries_mlops import (
        _LLOYD_ITER,
        _LLOYD_SQD,
        _duck_lloyd_ctes,
    )

    cf = f"c{_LLOYD_ITER}"
    sqd_m = _LLOYD_SQD.format(a="m.v", b="c.centroid")
    sqd_s = _LLOYD_SQD.format(a="s.v", b="c.centroid")
    mh = duck_stable_long_hash(
        "CAST(doc_id AS VARCHAR) || ':' || CAST(u AS VARCHAR)"
    )
    ch = duck_stable_long_hash(
        "array_to_string(list_transform(centroid, "
        "x -> CAST(CAST(FLOOR(x * 1000000) AS BIGINT) AS VARCHAR)), ',')"
    )
    return (
        _duck_lloyd_ctes(corpus_where="(vec_id % 10) <> 5")
        + f""",
shard AS (
  SELECT vec_id AS doc_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE (vec_id % 10) = 5
), sa AS (
  SELECT doc_id, v, cluster_id FROM (
    SELECT s.doc_id, s.v, c.cluster_id, row_number() OVER (
      PARTITION BY s.doc_id ORDER BY {sqd_s}, c.cluster_id) AS rn
    FROM shard s CROSS JOIN {cf} c
  ) WHERE rn = 1
), allm AS (
  SELECT m.doc_id, m.cluster_id,
         CAST(FLOOR({sqd_m} * 1000000) AS BIGINT) AS u
  FROM af m JOIN {cf} c ON m.cluster_id = c.cluster_id
  UNION ALL
  SELECT m.doc_id, m.cluster_id,
         CAST(FLOOR({sqd_m} * 1000000) AS BIGINT) AS u
  FROM sa m JOIN {cf} c ON m.cluster_id = c.cluster_id
), ms AS (
  SELECT CAST(cluster_id AS INTEGER) AS cluster_id,
         CAST(COUNT(*) AS BIGINT) AS n_members,
         CAST(SUM(doc_id) AS BIGINT) AS sid_sum,
         bit_xor({mh}) AS content_xor
  FROM allm GROUP BY cluster_id
), cs AS (
  SELECT -1 AS cluster_id,
         CAST(COUNT(*) AS BIGINT) AS n_members,
         CAST(SUM(cluster_id) AS BIGINT) AS sid_sum,
         bit_xor({ch}) AS content_xor
  FROM {cf}
)
SELECT * FROM (SELECT * FROM ms UNION ALL SELECT * FROM cs)
ORDER BY cluster_id
"""
    )


@query("stream_semantic_index_append", oracle=_semantic_append_oracle())
def stream_semantic_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online maintenance of the persisted SEMANTIC cluster index —
    the embedding-space twin of stream_index_ingest: the new shard
    streams in, each micro-batch assigns to the persisted centroids
    (broadcast) and appends idempotent batch_id=N member deltas; the
    MERGED index (base ∪ delta) must equal the batch derivation from
    the raw corpus — per-cluster member counts, doc_id sums, and
    bit_xor checksums over 'doc_id:u' geometry hashes, plus a
    centroid-checksum row. Appended members carry a beyond-cap rank
    sentinel until the next compaction (conservative: they are
    dedup targets, never comparison sources)."""
    return se.stream_semantic_index_append(spark, sf_dir)


def _gdpr_cascade_oracle() -> str:
    from vector_search_ner_spark.plans.queries_dataprep import _duck_gdpr_cascade

    return _duck_gdpr_cascade()


@query("stream_gdpr_tombstones", oracle=_gdpr_cascade_oracle())
def stream_gdpr_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion-at-ingest: GDPR requests arrive as a stream, each
    micro-batch logged as an idempotent batch_id=N tombstone
    generation (the lakehouse deletion-vector pattern — the physical
    rewrite defers to each store's compaction); the cascade audit over
    the merged log equals the batch `gdpr_delete_cascade` bit-for-bit
    and shares its oracle verbatim."""
    return se.stream_gdpr_tombstones(spark, sf_dir)


def _cms_shared_oracle() -> str:
    from vector_search_ner_spark.plans.queries_substrate3 import _cms_oracle

    return _cms_oracle()


@query("stream_countmin_ingest", oracle=_cms_shared_oracle())
def stream_countmin_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Count-Min grid maintained INCREMENTALLY at ingest (3
    micro-batches, stateful complete-mode aggregation) then probed for
    the exact top-20 heavy hitters — CMS's additive state is what
    makes it the streaming frequency sketch (`sketch_hll_union` plays
    the same card for distinct counts). Shares the batch
    `sketch_countmin_topk` oracle verbatim: the streamed grid, its
    collision overcounts included, must equal the batch grid
    bit-for-bit."""
    return se.stream_countmin_ingest(spark, sf_dir)


def _bloom_shared_oracle() -> str:
    from vector_search_ner_spark.plans.queries_substrate3 import (
        _bloom_prefilter_oracle,
    )

    return _bloom_prefilter_oracle()


@query("stream_bloom_prefilter", oracle=_bloom_shared_oracle())
def stream_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Bloom runtime filter applied AT INGEST: fact rows stream in
    3 micro-batches and probe the static broadcast bit relations
    map-side (4 stream-static left joins, no stream shuffle, no
    watermark); a complete-mode aggregation accumulates the
    pass/member counters across batches. Shares the batch
    `join_bloom_prefilter` oracle verbatim — the streamed report,
    false-positive accounting included, equals the batch one
    bit-for-bit."""
    return se.stream_bloom_prefilter(spark, sf_dir)


def _quota_shared_oracle() -> str:
    from vector_search_ner_spark.plans.queries_curation import _duck_quota_oracle

    return _duck_quota_oracle()


@query("stream_source_quota", oracle=_quota_shared_oracle())
def stream_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rung 0 AT INGEST: the curation pipeline's per-source doc/byte
    quota enforced as documents arrive — an applyInPandasWithState
    operator with ONE (docs, chars) counter row per source, consulting
    the offline reputation/blocklist verdict via a broadcast
    stream-static join. Shares the batch `source_quota_enforce` oracle
    verbatim: the streamed admission set (ranks and running sums
    included) equals the batch window computation bit-for-bit — the
    streamed twin of the `source_gate` rung `pretrain_corpus_e2e`
    ingests through."""
    return se.stream_source_quota(spark, sf_dir)


def _semcon_shared_oracle() -> str:
    from vector_search_ner_spark.plans.queries_dedup import contamination_semantic
    from vector_search_ner_spark.registry import _ORACLES

    return _ORACLES["contamination_semantic"]


@query("stream_contamination_semantic", oracle=_semcon_shared_oracle())
def stream_contamination_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic decontamination AT INGEST: training vectors stream in
    micro-batches and sweep against the static broadcast benchmark
    vectors with the same operator the batch query runs; flagged rows
    land as idempotent batch_id=N generations. Shares the batch
    `contamination_semantic` oracle VERBATIM (a train vector appears
    in exactly one micro-batch, so per-batch reduction == global)."""
    return se.stream_contamination_semantic(spark, sf_dir)


def _token_quota_shared_oracle() -> str:
    from vector_search_ner_spark.plans.queries_curation import (
        _duck_token_quota_oracle,
    )

    return _duck_token_quota_oracle()


@query("stream_source_quota_tokens", oracle=_token_quota_shared_oracle())
def stream_source_quota_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TOKEN-denominated rung-0 quota AT INGEST — streamed stateful
    twin of `source_quota_tokens` (see streaming/events.py for the
    harness and state shape: one (docs, tokens) counter row per
    source; the trained encoder is a static artifact at ingest time,
    so per-doc token counts arrive with the documents). Shares the
    batch oracle VERBATIM — the full trained-encoder chain included,
    so the streamed admission set is value-checked against a
    first-principles re-derivation of tokenizer + reputation + quota."""
    return se.stream_source_quota_tokens(spark, sf_dir)


def _encode_store_shared_oracle() -> str:
    from vector_search_ner_spark.plans.queries_unigram import (
        _duck_uni_encode_store,
    )

    return _duck_uni_encode_store()


@query("stream_encode_from_store", oracle=_encode_store_shared_oracle())
def stream_encode_from_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENCODE-AT-INGEST: the corpus streams in crawl shards and each
    micro-batch is segmented against the STATIC persisted tokenizer
    artifact (see streaming/events.py for the harness — per-batch
    Viterbi under the broadcast stored costs, idempotent batch_id=N
    deltas, frequencies summed at merge). Shares
    `unigram_encode_from_store`'s oracle VERBATIM — the serving arc of
    the tokenizer artifact now has its streaming twin like every other
    curation rung, and the merged streamed roster is value-checked
    against a from-scratch retrain."""
    return se.stream_encode_from_store(spark, sf_dir)

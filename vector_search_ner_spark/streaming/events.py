"""Structured Streaming pipelines over the events table (SURVEY §2.9
north-star: the reference is request/response-only; the engine adds
watermarked streaming ingestion).

Each pipeline reads the events parquet as a file-source STREAM,
applies watermark + windowed/stateful logic, runs to completion via a
memory sink (`processAllAvailable` — the local harness for what would
be a kafka->parquet continuous job on a cluster), and returns the
result DataFrame. The tumbling aggregation is oracle-checked against
the SAME DuckDB SQL as its batch twin in queries_events.py — streaming
and batch agree bit-for-bit.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_search_ner_spark.sources.catalog import load_table


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    # schema from the batch reader (incl. the ns->us ts normalization)
    batch = load_table(spark, sf_dir, "events")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def _run_to_memory(result: DataFrame, mode: str) -> DataFrame:
    name = "s" + uuid.uuid4().hex[:12]
    q = (
        result.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return result.sparkSession.sql(f"SELECT * FROM {name}")


def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling 1h aggregation, streamed to completion.
    Output matches the batch events_tumbling_window oracle exactly."""
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2).alias("total"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total")
    )
    return _run_to_memory(agg, "complete")


def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark on event_id (stateful streaming
    dedup; state expires with the watermark instead of growing
    forever — the 100 TB-stream-safe form of dropDuplicates)."""
    ev = _events_stream(spark, sf_dir)
    deduped = ev.withWatermark("ts", "30 minutes").dropDuplicatesWithinWatermark(["event_id"])
    out = _run_to_memory(deduped.select("event_id", "user_id", "event_type"), "append")
    return out


def stream_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows (10 min gap) per user."""
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "30 minutes")
        .groupBy("user_id", F.session_window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )
    return _run_to_memory(agg, "complete")

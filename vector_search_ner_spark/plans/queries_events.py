"""Event-stream analytics in batch form (SURVEY §2.9 north-star
extension): tumbling / sliding / session windows, pivot, stream-shaped
dedup — each with an ANSI-SQL oracle. The same logic runs as real
Structured Streaming in vector_search_ner_spark/streaming/events.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_search_ner_spark.registry import query
from vector_search_ner_spark.sources.catalog import load_table

SESSION_GAP_MIN = 10


def _dec(col: str):
    return F.col(col).cast("decimal(18,2)")


@query(
    "events_tumbling_window",
    oracle="""
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
FROM events
GROUP BY 1, 2
""",
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h windowed aggregation (epoch-aligned, matching
    DuckDB time_bucket)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(_dec("value")), 2).cast("double").alias("total"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total")
    )


@query(
    "events_sliding_window",
    oracle="""
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
""",
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1h length, 30min slide): every event lands in 2
    windows; oracle reproduces via two bucket origins."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(_dec("value")), 2).cast("double").alias("total"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "total")
    )


@query(
    "events_session_windows",
    oracle=f"""
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL '{SESSION_GAP_MIN} minutes'
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
), sessions AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM gaps
)
SELECT user_id, MIN(ts) AS session_start,
       MAX(ts) + INTERVAL '{SESSION_GAP_MIN} minutes' AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM sessions GROUP BY user_id, session_id
""",
)
def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (10-min inactivity gap) via Spark's NATIVE
    session_window; the oracle re-derives sessions from first
    principles (lag + gap-flag cumsum) — cross-validating the native
    operator against the classical formulation."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "events_pivot_types",
    oracle="""
SELECT user_id,
       CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
       CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view,
       CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
       CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error
FROM events GROUP BY user_id
""",
)
def events_pivot_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type -> columns (declared pivot values: no extra
    distinct-scan job, deterministic column order)."""
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "signup", "error"])
        .agg(F.count(F.lit(1)))
    )
    cols = [F.coalesce(F.col(c), F.lit(0)).alias(c) for c in ["click", "view", "signup", "error"]]
    return out.select("user_id", *cols)


@query(
    "events_first_per_user_type",
    oracle="""
SELECT user_id, event_type, event_id, ts FROM (
  SELECT user_id, event_type, event_id, ts,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1
""",
)
def events_first_per_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-shaped first-wins dedup: earliest event per
    (user, type) — the batch analogue of streaming
    dropDuplicatesWithinWatermark."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
    )


@query(
    "asof_join_click_view",
    oracle="""
SELECT c.event_id, c.user_id, epoch_us(c.ts) AS click_us,
       epoch_us(v.ts) AS view_us, v.value AS view_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (
  SELECT user_id, ts, MAX(value) AS value
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
) v
  ON c.user_id = v.user_id AND v.ts <= c.ts
""",
)
def asof_join_click_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every click enriched with the user's most recent
    at-or-before view (payload + its timestamp). Spark has no native
    as-of join; the operator (operators/asof.py) is the union+window
    form — one shuffle on user_id, no range-join explosion. Oracle is
    DuckDB's native ASOF LEFT JOIN. Timestamps emitted as epoch micros
    (both engines floor ns -> us identically)."""
    from vector_search_ner_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    # one view row per (user_id, ts): duplicate-timestamp payloads would
    # otherwise make "the most recent view" engine-order-dependent
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    joined = asof_join(clicks, views, on=["user_id"], ts_col="ts", payload_cols=["ts", "value"])
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("click_us"),
        F.unix_micros("ts_asof").alias("view_us"),
        F.col("value_asof").alias("view_value"),
    )


@query(
    "asof_cogroup_pandas",
    oracle="""
SELECT c.event_id, c.user_id, epoch_us(c.ts) AS click_us,
       epoch_us(v.ts) AS view_us, v.value AS view_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (
  SELECT user_id, ts, MAX(value) AS value
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
) v
  ON c.user_id = v.user_id AND v.ts <= c.ts
""",
)
def asof_cogroup_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME as-of semantics as asof_join_click_view, but through
    the cogrouped-applyInPandas extension point. Cross-validates the
    union+window operator against an independent implementation AND
    the DuckDB native ASOF JOIN.

    r12 optimization round (guide §4.5 — amortize per-group overhead):
    cogrouping directly by user_id handed ONE pandas call per user —
    thousands of tiny DataFrames whose per-call constant dominated the
    query (measured 12.8 s at sf0.1). Both sides now cogroup by a
    SCALE-ADAPTIVE user bucket (pmod(user_id, shuffle partitions) —
    tracks the session's parallelism knob, not a local constant), and
    each bucket runs one vectorized `pd.merge_asof(by="user_id")`,
    which applies the identical per-user backward as-of inside a
    single call. Same one co-partitioned shuffle, same extension
    point, same values row for row; per-group Python constants are
    paid per bucket instead of per user."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    # NON-NULL user_id assumption (ADVICE r12): merge_asof(by="user_id")
    # turns a NULL user into NaN, and NaN != NaN means such rows could
    # never match — the retired per-user cogroup DID match the null
    # group against itself. The events fixture's user_id is NOT NULL
    # (catalog contract); a nullable source must filter or fillna
    # consistently on both sides before the pmod bucketing below.
    n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.pmod("user_id", F.lit(n_buckets)).alias("__b")
    )
    # one view row per (user_id, ts): duplicate-timestamp payloads would
    # otherwise make "the most recent view" engine-order-dependent
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
        .select("user_id", "ts", "value", F.pmod("user_id", F.lit(n_buckets)).alias("__b"))
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(
                columns=["event_id", "user_id", "click_us", "view_us", "view_value"]
            )
        # merge_asof(by=...) needs both sides sorted by the ON key;
        # the by= kwarg then applies the backward as-of PER USER in
        # one vectorized pass — the same per-user semantics as the
        # retired one-call-per-user shape
        left = left.sort_values("ts", kind="stable").drop(columns=["__b"])
        right = (
            right.sort_values("ts", kind="stable")
            .drop(columns=["__b"])
            .rename(columns={"ts": "view_ts"})
        )
        if right.empty:
            m = left.assign(view_ts=pd.NaT, value=float("nan"))
        else:
            m = pd.merge_asof(
                left, right,
                left_on="ts", right_on="view_ts", by="user_id",
                direction="backward",
            )
        out = pd.DataFrame(
            {
                "event_id": m["event_id"],
                "user_id": m["user_id"],
                "click_us": m["ts"].astype("int64") // 1000,
                "view_us": m["view_ts"].astype("int64") // 1000,
                "view_value": m["value"],
            }
        )
        # NaT floor-divides to a huge negative; restore missing as NULL
        out.loc[m["view_ts"].isna(), "view_us"] = None
        return out

    return (
        clicks.groupBy("__b")
        .cogroup(views.groupBy("__b"))
        .applyInPandas(
            merge,
            schema="event_id long, user_id long, click_us long, view_us long, view_value double",
        )
    )


@query(
    "events_fill_forward",
    oracle="""
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS last_purchase_value
FROM events
""",
)
def events_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill (LOCF) — the time-series gap-interpolation
    operator: every event carries the user's most recent purchase
    value (NULL before the first). last(ignorenulls) over an ordered
    running frame; one shuffle on user_id, same shape at any scale."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = F.last(
        F.when(F.col("event_type") == "purchase", F.col("value")), ignorenulls=True
    ).over(w)
    return ev.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        filled.alias("last_purchase_value"),
    )


@query(
    "events_unpivot_metrics",
    oracle="""
WITH wide AS (
  SELECT user_id,
         CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS DOUBLE) AS clicks,
         CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS DOUBLE) AS views,
         CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2)))
                    FILTER (WHERE event_type = 'purchase'), 2) AS DOUBLE) AS purchase_value
  FROM events GROUP BY user_id
)
SELECT user_id, metric, value
FROM wide
UNPIVOT (value FOR metric IN (clicks, views, purchase_value))
""",
)
def events_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide per-user metrics back to long
    (metric, value) rows — the inverse of events_pivot_types, via the
    native DataFrame.unpivot (no UNION-of-selects). NULL metrics drop
    on both engines (UNPIVOT default)."""
    ev = load_table(spark, sf_dir, "events")
    wide = ev.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).cast("double").alias("clicks"),
        F.count(F.when(F.col("event_type") == "view", 1)).cast("double").alias("views"),
        F.round(
            F.sum(F.when(F.col("event_type") == "purchase", F.col("value").cast("decimal(18,2)"))),
            2,
        ).cast("double").alias("purchase_value"),
    )
    return wide.unpivot(
        ids=["user_id"],
        values=["clicks", "views", "purchase_value"],
        variableColumnName="metric",
        valueColumnName="value",
    ).where(F.col("value").isNotNull())


@query(
    "events_time_rollup",
    oracle="""
SELECT COALESCE(d, TIMESTAMP '1900-01-01 00:00:00') AS d,
       COALESCE(h, -1) AS h,
       CAST(GROUPING(d) AS INTEGER) AS g_day,
       CAST(GROUPING(h) AS INTEGER) AS g_hour,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
FROM (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
         CAST(EXTRACT(hour FROM ts) AS INTEGER) AS h,
         value
  FROM events
)
GROUP BY ROLLUP (d, h)
""",
)
def events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time-hierarchy rollup: hour-within-day detail,
    per-day subtotal, and grand total in ONE pass (ROLLUP expands
    grouping sets map-side — vs 3 separate jobs = 3 scans of the
    event stream at 100 TB). GROUPING flags mark the levels. This is
    the continuous-aggregate maintenance shape: the same plan runs
    per-partition incrementally as new days land."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.date_trunc("day", "ts").alias("d"),
        F.hour("ts").cast("int").alias("h"),
        "value",
    )
    return (
        base.rollup("d", "h")
        .agg(
            F.grouping("d").cast("int").alias("g_day"),
            F.grouping("h").cast("int").alias("g_hour"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2).cast("double").alias("total"),
        )
        .select(
            F.coalesce("d", F.lit("1900-01-01 00:00:00").cast("timestamp")).alias("d"),
            F.coalesce("h", F.lit(-1)).alias("h"),
            "g_day", "g_hour", "n", "total",
        )
    )


@query(
    "events_funnel_analysis",
    oracle="""
WITH v AS (
  SELECT user_id, MIN(ts) AS t_view FROM events WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t_view
  WHERE e.event_type = 'click' GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t_buy
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t_click
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT '1_view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
UNION ALL SELECT '2_click', CAST(COUNT(*) AS BIGINT) FROM c
UNION ALL SELECT '3_purchase', CAST(COUNT(*) AS BIGINT) FROM p
""",
)
def events_funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → later click → later purchase per user):
    each stage anchors on the previous stage's FIRST event time, so
    out-of-order occurrences don't count — the sequencing constraint
    that separates a funnel from three independent counts. Each stage
    is one groupBy on user_id; Catalyst shares the events scan across
    stages, and every join is on the (already shuffled) user key."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.where(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t_view")
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_buy"))
    )

    def stage(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("bigint").alias("n_users")).select(
            F.lit(name).alias("stage"), "n_users"
        )

    return stage("1_view", v).unionByName(stage("2_click", c)).unionByName(
        stage("3_purchase", p)
    )


@query(
    "events_retention_cohorts",
    oracle="""
WITH firstwk AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
)
SELECT CAST(f.cohort AS TIMESTAMP) AS cohort,
       CAST((epoch(a.wk) - epoch(f.cohort)) / 604800 AS INTEGER) AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_active
FROM firstwk f JOIN activity a ON a.user_id = f.user_id
GROUP BY 1, 2
ORDER BY cohort, week_offset
""",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix (cohort week of first activity × weeks
    since × distinct active users): the standard triangle report. Two
    aggregations on user_id share one shuffle; the final matrix agg is
    tiny. At scale the DISTINCT (user, week) pre-agg before the join
    is the thing that keeps the join input bounded."""
    ev = load_table(spark, sf_dir, "events")
    firstwk = ev.groupBy("user_id").agg(F.date_trunc("week", F.min("ts")).alias("cohort"))
    activity = ev.select("user_id", F.date_trunc("week", "ts").alias("wk")).distinct()
    off = (
        (F.unix_timestamp("wk") - F.unix_timestamp("cohort")) / 604800
    ).cast("int")
    return (
        activity.join(firstwk, "user_id")
        .groupBy("cohort", off.alias("week_offset"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
        .orderBy("cohort", "week_offset")
    )


@query(
    "events_winsorize_values",
    oracle="""
WITH bounds AS (
  SELECT quantile_cont(value, 0.01) AS lo, quantile_cont(value, 0.99) AS hi FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(ROUND(SUM(CAST(LEAST(GREATEST(value, lo), hi) AS DECIMAL(18,6))), 4) AS DOUBLE)
         AS winsorized_total,
       CAST(SUM(CASE WHEN value < lo OR value > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
FROM events, bounds
GROUP BY event_type
ORDER BY event_type
""",
)
def events_winsorize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization (clip at exact p1/p99) — the outlier-taming step
    before loss-weighting or normalization in a training pipeline.
    The percentile pair is ONE tiny scalar row cross-joined (broadcast)
    back onto the stream; clipping is map-side. Exact interpolated
    percentiles match DuckDB quantile_cont bit-for-bit; the clipped
    sum accumulates as DECIMAL so partial aggregation stays order-free."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.expr("percentile(value, 0.01)").alias("lo"),
        F.expr("percentile(value, 0.99)").alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(clipped.cast("decimal(18,6)")), 4).cast("double").alias(
                "winsorized_total"
            ),
            F.sum(
                F.when((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")), 1)
                .otherwise(0)
            ).cast("bigint").alias("n_clipped"),
        )
        .orderBy("event_type")
    )


@query(
    "events_anomaly_zscore",
    oracle="""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT event_type,
         CAST(SUM(n) AS DOUBLE) / COUNT(*) AS mu,
         CAST(SUM(n * n) AS DOUBLE) / COUNT(*) AS m2,
         COUNT(*) AS n_hours
  FROM hourly GROUP BY event_type
)
SELECT h.event_type, h.hr, h.n,
       CAST(ROUND((h.n - s.mu) / sqrt(s.m2 - s.mu * s.mu), 4) AS DOUBLE) AS z
FROM hourly h JOIN stats s ON h.event_type = s.event_type
WHERE sqrt(s.m2 - s.mu * s.mu) > 0
  AND abs((h.n - s.mu) / sqrt(s.m2 - s.mu * s.mu)) > 2.5
ORDER BY h.event_type, h.hr
""",
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection (hourly event counts whose z-score
    exceeds 2.5 per type — the monitoring query over an ingest
    stream). Moments accumulate from INTEGER counts (sum, sum-of-
    squares are exact), so mean/variance/z are bit-identical in both
    engines; two small aggregations, one broadcast join back."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = hourly.groupBy("event_type").agg(
        (F.sum("n").cast("double") / F.count(F.lit(1))).alias("mu"),
        (F.sum(F.col("n") * F.col("n")).cast("double") / F.count(F.lit(1))).alias("m2"),
    )
    sd = F.sqrt(F.col("m2") - F.col("mu") * F.col("mu"))
    z = (F.col("n") - F.col("mu")) / sd
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .where((sd > 0) & (F.abs(z) > 2.5))
        .select("event_type", "hr", "n", F.round(z, 4).cast("double").alias("z"))
        .orderBy("event_type", "hr")
    )


@query(
    "events_rolling_distinct_users",
    oracle="""
WITH hours AS (
  SELECT DISTINCT date_trunc('hour', ts) AS hr FROM events
), hourly_users AS (
  SELECT DISTINCT date_trunc('hour', ts) AS hr, user_id FROM events
)
SELECT h.hr,
       CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS distinct_users_3h
FROM hours h JOIN hourly_users u
  ON u.hr <= h.hr AND u.hr >= h.hr - INTERVAL 2 HOUR
GROUP BY h.hr
ORDER BY h.hr
""",
)
def events_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling DISTINCT count (distinct users over a trailing 3h window
    per hour) — the aggregation windows can't do directly (COUNT
    DISTINCT isn't frame-decomposable): expressed as an interval
    self-join of hourly pre-aggregates. The pre-dedup to (hour, user)
    bounds the join input to |hours|×|active users|; at 100 TB the
    approximate path swaps in HLL sketches that union across the
    trailing window (sketch_distinct_quantiles's machinery)."""
    ev = load_table(spark, sf_dir, "events")
    hours = ev.select(F.date_trunc("hour", "ts").alias("hr")).distinct()
    hu = ev.select(
        F.date_trunc("hour", "ts").alias("uhr"), "user_id"
    ).distinct()
    cond = (F.col("uhr") <= F.col("hr")) & (
        F.col("uhr") >= F.col("hr") - F.expr("INTERVAL 2 HOURS")
    )
    return (
        hours.join(hu, cond)
        .groupBy("hr")
        .agg(F.count_distinct("user_id").alias("distinct_users_3h"))
        .orderBy("hr")
    )


@query(
    "events_markov_transitions",
    oracle="""
WITH pairs AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events
),
c AS (
  SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM pairs WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
)
SELECT event_type, next_type, n,
       CAST(ROUND(CAST(n AS DOUBLE)
                  / CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE), 6)
            AS DOUBLE) AS p
FROM c
ORDER BY event_type, next_type
""",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences (lead() pairing -> count -> row-normalized probability):
    the classic clickstream next-action model, and the batch shape of a
    sequence-LM's bigram statistics. One shuffle for the per-user sort,
    one for the pair count; the per-row normalizer is a window over the
    already-tiny (|types|^2) count table. Exactness: the probability is
    a single bigint/bigint division rounded at the end, so there is no
    summation-order drift. Reference analogue: the staged-retrieval
    logs' stage-transition counts (main.py:348-407) are exactly this
    aggregation done by eye."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    c = pairs.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = Window.partitionBy("event_type")
    return c.select(
        "event_type",
        "next_type",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(tot).cast("double"), 6
        )
        .cast("double")
        .alias("p"),
    ).orderBy("event_type", "next_type")


@query(
    "events_trailing_hour_range",
    oracle="""
SELECT event_id, user_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
       CAST(ROUND(CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w
                       AS DOUBLE) / 100, 2) AS DOUBLE) AS spend_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
ORDER BY event_id
""",
)
def events_trailing_hour_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE window frame: per-user trailing-one-hour
    event count and spend at every event — the sliding-lookback feature
    (rate limiting, fraud velocity checks) that ROWS frames cannot
    express because event spacing is irregular. Spark evaluates the
    interval bound natively against the timestamp order column; no
    self-join materializes the window. Exactness: spend accumulates as
    integer cents (value has 2 decimal places) inside the frame, cast
    and rounded only at the end."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.expr("CAST(ROUND(value * 100) AS BIGINT)")
    return (
        ev.select("event_id", "user_id", "ts", cents.alias("cents"))
        .withColumn(
            "n_1h",
            F.expr(
                "COUNT(*) OVER (PARTITION BY user_id ORDER BY ts "
                "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
            ),
        )
        .withColumn(
            "spend_1h",
            F.round(
                F.expr(
                    "SUM(cents) OVER (PARTITION BY user_id ORDER BY ts "
                    "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
                ).cast("double")
                / 100,
                2,
            ).cast("double"),
        )
        .select("event_id", "user_id", "n_1h", "spend_1h")
        .orderBy("event_id")
    )


@query(
    "events_ewma_smoothing",
    oracle="""
WITH f AS (
  SELECT event_id, user_id,
         list(CAST(ROUND(value * 100) AS BIGINT)) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS vals
  FROM events
)
SELECT event_id, user_id,
       CAST(ROUND(CAST(list_sum(list_transform(range(1, len(vals) + 1),
                    i -> vals[i] * CAST(2**(i - 1) AS BIGINT))) AS DOUBLE)
                  / CAST(2**len(vals) - 1 AS DOUBLE) / 100, 4)
            AS DOUBLE) AS ewma
FROM f
ORDER BY event_id
""",
)
def events_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (alpha = 1/2) of per-user
    event values over a 16-row trailing frame — time-series smoothing,
    normally written as an unbounded recursion and therefore "not SQL".
    Bounding the tail (weights below 2^-16 are sub-cent noise) turns it
    into a frame aggregate: collect the frame's integer cents, weight
    element i by 2^i via zip_with, normalize by the geometric sum
    2^n - 1. Every intermediate is a BIGINT (weights are exact powers
    of two, cents*2^15 << 2^63), so the fold is order-free and
    bit-identical to the DuckDB list_transform oracle; the single
    double division and rounding happen once per row at the end."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.expr("CAST(ROUND(value * 100) AS BIGINT)")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-15, 0)
    )
    num = F.expr(
        "aggregate(zip_with(vals, sequence(0, size(vals) - 1), "
        "(v, i) -> v * shiftleft(CAST(1 AS BIGINT), i)), "
        "CAST(0 AS BIGINT), (a, x) -> a + x)"
    )
    denom = F.expr(
        "CAST(shiftleft(CAST(1 AS BIGINT), size(vals)) - 1 AS DOUBLE)"
    )
    return (
        ev.select("event_id", "user_id", "ts", cents.alias("c"))
        .withColumn("vals", F.collect_list("c").over(w))
        .select(
            "event_id",
            "user_id",
            F.round(num.cast("double") / denom / 100, 4)
            .cast("double")
            .alias("ewma"),
        )
        .orderBy("event_id")
    )


@query(
    "events_interpolate_linear",
    oracle="""
WITH e AS (
  SELECT event_id, user_id, ts,
         CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
  FROM events
), w AS (
  SELECT event_id, user_id, ts, v,
         last_value(CASE WHEN v IS NOT NULL THEN epoch_us(ts) END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
         last_value(v IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
         first_value(CASE WHEN v IS NOT NULL THEN epoch_us(ts) END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt,
         first_value(v IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv
  FROM e
)
SELECT event_id, user_id, ts,
       round(CASE WHEN v IS NOT NULL THEN v
                  WHEN pv IS NOT NULL AND nv IS NOT NULL
                    THEN pv + (nv - pv) * (epoch_us(ts) - pt) / (nt - pt)
                  ELSE COALESCE(pv, nv) END, 4) AS value_interp,
       v IS NULL AS was_gap
FROM w
ORDER BY user_id, ts, event_id
""",
)
def events_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted LINEAR interpolation of gap values (the LOCF
    sibling `events_fill_forward` carries the last value flat; this
    one draws the line): rows whose event_type = 'error' are treated
    as missing sensor readings and rebuilt as
        prev + (next - prev) * (t - t_prev) / (t_next - t_prev)
    between the nearest valid neighbors per user (leading/trailing
    gaps fall back to the one neighbor that exists). Two ignore-nulls
    window scans over one (user_id → ts) sort — no join, no extra
    shuffle beyond the partitioning the other per-user windows already
    use; at 100 TB this is a single range-partitioned sort per key,
    state O(1) per row. Tie-break on event_id keeps the frames
    deterministic under duplicate (user_id, ts)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") != "error", F.col("value")).alias("v"),
    )
    us = F.unix_micros(F.col("ts"))
    t_of_v = F.when(F.col("v").isNotNull(), us)
    wp = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    pv = F.last("v", ignorenulls=True).over(wp)
    pt = F.last(t_of_v, ignorenulls=True).over(wp)
    nv = F.first("v", ignorenulls=True).over(wn)
    nt = F.first(t_of_v, ignorenulls=True).over(wn)
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            pv.isNotNull() & nv.isNotNull(),
            pv + (nv - pv) * (us - pt) / (nt - pt),
        )
        .otherwise(F.coalesce(pv, nv))
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            "ts",
            F.round(interp, 4).alias("value_interp"),
            F.col("v").isNull().alias("was_gap"),
        )
        .orderBy("user_id", "ts", "event_id")
    )

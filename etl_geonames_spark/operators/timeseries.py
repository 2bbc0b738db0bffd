"""Event-time window operators (SURVEY.md §2.10).

The reference is a pure batch job; these are the engine extensions for
event-time analytics over the ``events`` stream table. All three
window shapes (tumbling, sliding, session) use Spark's native window
operators, which run identically under batch and Structured Streaming
— the streaming-mode variants (watermarks, stateful dedup) live in
``etl_geonames_spark.streaming`` and are smoke-tested there.

Scale: every query here shuffles once on (window/session, key) with
map-side partial aggregation. Session windows additionally sort
within user partitions — the 100 TB hazard is hot users, mitigated by
AQE skew handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_geonames_spark.registry import query
from etl_geonames_spark.sources import load_table


@query(
    "stream_tumbling",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate — epoch-aligned, so the window
    start equals date_trunc('hour')."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "stream_sliding",
    oracle="""
    SELECT window_start, event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM (
      SELECT unnest(generate_series(
               time_bucket(INTERVAL '15 minutes', ts) - INTERVAL '45 minutes',
               time_bucket(INTERVAL '15 minutes', ts),
               INTERVAL '15 minutes')) AS window_start,
             event_type, value
      FROM events
    ) t
    GROUP BY 1, 2
    """,
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 h size, 15 min slide): each event lands in 4
    overlapping windows. The oracle reconstructs Spark's window
    assignment by exploding each event to its 4 window starts —
    both grids are epoch-aligned."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "ts_funnel",
    oracle="""
    WITH s AS (SELECT user_id, MIN(ts) AS signup_ts FROM events
               WHERE event_type = 'signup' GROUP BY user_id),
    p AS (SELECT user_id, MIN(ts) AS purchase_ts FROM events
          WHERE event_type = 'purchase' GROUP BY user_id)
    SELECT COUNT(*) AS n_signed_up,
           COUNT(CASE WHEN p.purchase_ts > s.signup_ts THEN 1 END)
             AS n_converted
    FROM s LEFT JOIN p ON s.user_id = p.user_id
    """,
)
def ts_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage funnel: users who signed up, and of those, users whose
    first purchase came strictly after their first signup. Two grouped
    mins + one key join — each stage map-side combined; no window, no
    per-user state."""
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return s.join(p, "user_id", "left").agg(
        F.count(F.lit(1)).alias("n_signed_up"),
        F.count(
            F.when(F.col("purchase_ts") > F.col("signup_ts"), F.lit(1))
        ).alias("n_converted"),
    )


@query(
    "ts_cohort_retention",
    oracle="""
    WITH first AS (
      SELECT user_id, date_trunc('day', MIN(ts)) AS cohort_day
      FROM events GROUP BY user_id
    )
    SELECT f.cohort_day,
           CAST(datediff('day', f.cohort_day, date_trunc('day', e.ts))
                AS BIGINT) AS day_offset,
           COUNT(DISTINCT e.user_id) AS active_users
    FROM events e JOIN first f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def ts_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, activity
    counted per day offset. The cohort table is user-cardinality —
    small for this fixture but unbounded in general, so the join
    strategy is left to the optimizer/AQE (a forced broadcast would
    blow past the broadcast limit at billions of users); one shuffle
    for the distinct-user count."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    return (
        ev.join(first, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.date_trunc("day", F.col("ts")), F.col("cohort_day"))
            .cast("bigint")
            .alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@query(
    "ts_gap_fill",
    oracle="""
    WITH bounds AS (
      SELECT event_type,
             date_trunc('hour', MIN(ts)) AS lo,
             date_trunc('hour', MAX(ts)) AS hi
      FROM events GROUP BY event_type
    ),
    grid AS (
      SELECT event_type, unnest(generate_series(lo, hi, INTERVAL '1 hour'))
               AS bucket
      FROM bounds
    ),
    agg AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket,
             COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT g.event_type, g.bucket,
           CAST(COALESCE(a.n_events, 0) AS BIGINT) AS n_events
    FROM grid g LEFT JOIN agg a
      ON g.event_type = a.event_type AND g.bucket = a.bucket
    """,
)
def ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series per event type: empty buckets appear as
    zero rows (plain window aggs silently omit them). The dense grid is
    generated with sequence+explode per key — grid size is
    (key-cardinality × buckets), independent of event count, so it
    stays tiny even when events are 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.date_trunc("hour", F.col("ts"))
    agg = ev.groupBy(
        "event_type", bucket.alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    bounds = ev.groupBy("event_type").agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        "event_type",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket"),
    )
    return (
        grid.join(agg, ["event_type", "bucket"], "left")
        .select(
            "event_type",
            "bucket",
            F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        )
    )


@query(
    "stream_session",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       <= INTERVAL '30 minutes'
                  THEN 0 ELSE 1 END AS new_sess
      FROM events
    ), sess AS (
      SELECT *, SUM(new_sess) OVER (
                  PARTITION BY user_id ORDER BY ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM sess
    GROUP BY user_id, sid
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window (30-minute inactivity gap) per user. Spark's
    session_window merges gap-connected events; its ``end`` is
    last-event + gap. The oracle derives identical sessions with the
    gaps-and-islands idiom — this op IS SQL-expressible, just not as
    one built-in."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )

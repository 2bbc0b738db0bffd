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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_geonames_spark.functions import pin, qround, sql_qround
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


@query(
    "ts_resample_ohlc",
    oracle="""
    WITH ranked AS (
      SELECT event_type,
             time_bucket(INTERVAL '15 minutes', ts) AS bucket, value,
             ROW_NUMBER() OVER (PARTITION BY event_type,
                                  time_bucket(INTERVAL '15 minutes', ts)
                                ORDER BY ts, event_id) AS rf,
             ROW_NUMBER() OVER (PARTITION BY event_type,
                                  time_bucket(INTERVAL '15 minutes', ts)
                                ORDER BY ts DESC, event_id DESC) AS rl
      FROM events
    )
    SELECT event_type, bucket,
           MAX(CASE WHEN rf = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rl = 1 THEN value END) AS close,
           FLOOR(SUM(value) * 100 + 0.5) / 100 AS sum_value,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM ranked GROUP BY event_type, bucket
    """,
)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample to 15-minute OHLC bars per event type — the
    resampling idiom (market bars, metric rollups). ONE map-side-
    combined hash aggregate: open/close are min_by/max_by over a
    lexicographic (ts, event_id) string key — deterministic under ts
    ties, no window over raw events, so the shuffle carries only
    per-bucket partials (the oracle's row_number form is the
    single-node equivalent; a window here would sort the full fact).
    open/high/low/close are picked raw values (exact equality);
    sum_value accumulates 2dp doubles, so qround(2) on both sides."""
    ev = load_table(spark, sf_dir, "events")
    key = F.concat(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
        F.lit("|"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        ev.groupBy(
            "event_type", F.window("ts", "15 minutes").start.alias("bucket")
        )
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            qround(F.sum("value"), 2).alias("sum_value"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "ts_anomaly_zscore",
    oracle="""
    WITH w AS (
      SELECT event_id, event_type, ts, value,
             AVG(value) OVER win AS mu,
             STDDEV_SAMP(value) OVER win AS sigma,
             COUNT(*) OVER win AS n_win
      FROM events
      WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, event_type, ts, value,
           FLOOR((value - mu) / sigma * 10000 + 0.5) / 10000 AS z,
           ABS((value - mu) / sigma) > 3.0 AS is_anomaly
    FROM w WHERE n_win = 20 AND sigma > 1e-12
    """,
)
def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: each point scored against
    the mean/stddev of the PREVIOUS 20 points of its series (the
    trailing frame excludes the current row, so an outlier can't mask
    itself). Partial-frame head rows are dropped — a 19-point baseline
    isn't comparable to a 20-point one.

    100 TB shape: one shuffle on the series key, per-series sort
    within partitions; frames are ROWS-bounded so window state is
    O(20) per series regardless of fact size. z is a ratio of
    accumulated doubles — qround(4) on both sides (stddev accumulation
    order differs across engines)."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    ev = load_table(spark, sf_dir, "events")
    scored = ev.select(
        "event_id",
        "event_type",
        "ts",
        "value",
        F.avg("value").over(w).alias("mu"),
        F.stddev_samp("value").over(w).alias("sigma"),
        F.count(F.lit(1)).over(w).alias("n_win"),
    ).filter((F.col("n_win") == 20) & (F.col("sigma") > 1e-12))
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return scored.select(
        "event_id",
        "event_type",
        "ts",
        "value",
        qround(z, 4).alias("z"),
        (F.abs(z) > 3.0).alias("is_anomaly"),
    )


@query(
    "join_interval_overlap",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_type, MIN(ts) AS lo, MAX(ts) AS hi
      FROM events GROUP BY user_id, event_type
    )
    SELECT a.user_id, a.event_type AS type_a, b.event_type AS type_b,
           GREATEST(a.lo, b.lo) AS overlap_start,
           LEAST(a.hi, b.hi) AS overlap_end,
           epoch_us(LEAST(a.hi, b.hi)) - epoch_us(GREATEST(a.lo, b.lo))
             AS overlap_us
    FROM iv a JOIN iv b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
     AND a.lo <= b.hi AND b.lo <= a.hi
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join: per-user activity spans per event
    type, paired where the spans intersect — the temporal-overlap
    family (validity intervals, reservation conflicts). The equi key
    (user_id) carries the shuffle/partitioning; the overlap band and
    the type ordering are post-match predicates — stays a hash/SMJ
    equi-join, never a nested loop (same discipline as join_range).
    Overlap length is computed in exact integer microseconds
    (unix_micros / epoch_us) — no float timestamp arithmetic."""
    iv = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
    )
    a = iv.select(
        F.col("user_id"),
        F.col("event_type").alias("type_a"),
        F.col("lo").alias("lo_a"),
        F.col("hi").alias("hi_a"),
    )
    b = iv.select(
        F.col("user_id").alias("user_id_b"),
        F.col("event_type").alias("type_b"),
        F.col("lo").alias("lo_b"),
        F.col("hi").alias("hi_b"),
    )
    start = F.greatest("lo_a", "lo_b")
    end = F.least("hi_a", "hi_b")
    return (
        a.join(
            b,
            (F.col("user_id") == F.col("user_id_b"))
            & (F.col("type_a") < F.col("type_b"))
            & (F.col("lo_a") <= F.col("hi_b"))
            & (F.col("lo_b") <= F.col("hi_a")),
        )
        .select(
            "user_id",
            "type_a",
            "type_b",
            start.alias("overlap_start"),
            end.alias("overlap_end"),
            # unix_micros requires ltz; ts is NTZ — the cast is wall-clock
            # identity in this engine's pinned UTC session
            (
                F.unix_micros(end.cast("timestamp"))
                - F.unix_micros(start.cast("timestamp"))
            ).alias("overlap_us"),
        )
    )


@query(
    "ts_rollup_hierarchy",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hour, event_type,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             FLOOR(SUM(value) * 100.0 + 0.5) / 100.0 AS sum_value,
             MAX(value) AS max_value
      FROM events GROUP BY 1, 2
    )
    SELECT date_trunc('day', hour) AS day, event_type,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           FLOOR(SUM(sum_value) * 100.0 + 0.5) / 100.0 AS sum_value,
           MAX(max_value) AS max_value,
           CAST(COUNT(*) AS BIGINT) AS n_hourly_partials
    FROM hourly GROUP BY 1, 2
    """,
)
def ts_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical time rollup (the hypertable continuous-aggregate
    pattern): daily aggregates computed FROM the hourly partials, never
    from raw events.

    This is the incremental-maintenance shape that matters at 100 TB:
    count/sum/max are mergeable, so each coarser level re-aggregates
    the level below — the raw table is scanned exactly once to build
    the finest level, and a late-arriving hour only invalidates its own
    day, not the whole history. (Median-style holistic aggregates can't
    ride this; use the mergeable KLL sketch rollup ``agg_sketch_kll``.)

    The hourly sum is qround-quantized before the day-level merge so
    both engines sum identical 2-dp values; the day sum re-rounds on
    the same grid (near-integer after scaling, so the floor-form is
    stable against accumulation-order ulps).
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        qround(F.sum("value"), 2).alias("sum_value"),
        F.max("value").alias("max_value"),
    )
    return hourly.groupBy(
        F.date_trunc("day", "hour").alias("day"), "event_type"
    ).agg(
        F.sum("n_events").alias("n_events"),
        qround(F.sum("sum_value"), 2).alias("sum_value"),
        F.max("max_value").alias("max_value"),
        F.count(F.lit(1)).alias("n_hourly_partials"),
    )


@query(
    "ts_ewma",
    oracle="""
    WITH lagged AS (
      SELECT event_id, user_id, value,
             LAG(value, 1) OVER w AS l1,
             LAG(value, 2) OVER w AS l2,
             LAG(value, 3) OVER w AS l3,
             LAG(value, 4) OVER w AS l4
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id,
           FLOOR(
             ((value
               + 0.5 * COALESCE(l1, 0.0)
               + 0.25 * COALESCE(l2, 0.0)
               + 0.125 * COALESCE(l3, 0.0)
               + 0.0625 * COALESCE(l4, 0.0))
              / (1.0
                 + CASE WHEN l1 IS NULL THEN 0.0 ELSE 0.5 END
                 + CASE WHEN l2 IS NULL THEN 0.0 ELSE 0.25 END
                 + CASE WHEN l3 IS NULL THEN 0.0 ELSE 0.125 END
                 + CASE WHEN l4 IS NULL THEN 0.0 ELSE 0.0625 END))
             * 1000000.0 + 0.5) / 1000000.0 AS ewma
    FROM lagged
    """,
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (alpha = 0.5) over the 4
    trailing observations per user, normalized over the weights of the
    lags actually present (series heads use fewer terms rather than
    decaying toward a phantom zero history).

    A true infinite-history EWMA is a linear recurrence — not
    expressible as a window aggregate without a recursive/sequential
    scan. The truncated form is the distributed-friendly equivalent
    (weights below 0.0625 contribute <1e-6 at this alpha... the tail
    is cut where it stops mattering) and keeps O(1) state per row:
    four LAGs in ONE window pass, single shuffle on user_id.

    The weighted sum is written as one fixed left-associated expression
    chain on both engines, so the arithmetic is bit-identical before
    the qround quantization.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lags = {f"l{j}": F.lag("value", j).over(w) for j in (1, 2, 3, 4)}
    lagged = ev.select("event_id", "user_id", "value",
                       *[c.alias(n) for n, c in lags.items()])
    weights = {"l1": 0.5, "l2": 0.25, "l3": 0.125, "l4": 0.0625}
    num = F.col("value")
    den = F.lit(1.0)
    for n, wgt in weights.items():
        num = num + F.lit(wgt) * F.coalesce(F.col(n), F.lit(0.0))
        den = den + F.when(F.col(n).isNull(), F.lit(0.0)).otherwise(F.lit(wgt))
    return lagged.select(
        "event_id", "user_id", qround(num / den, 6).alias("ewma")
    )


@query(
    "ts_winsorize",
    oracle="""
    WITH b AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS lo,
             quantile_cont(value, 0.95) AS hi
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           FLOOR(GREATEST(b.lo, LEAST(b.hi, e.value)) * 100.0 + 0.5)
             / 100.0 AS value_winsorized
    FROM events e JOIN b USING (event_type)
    """,
)
def ts_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization: clip each value into its group's [p5, p95] band —
    the outlier-robust normalization pass before any mean-based
    downstream statistic.

    Exact percentiles here (they buffer per-group values); the group
    cardinality is event-type-sized, so the band table broadcasts and
    the fact side stays map-only after its one aggregate pass. At
    100 TB swap the exact percentile for ``approx_percentile``
    (t-digest, mergeable) — the join shape is unchanged. Clipped
    values are qround-quantized: the band endpoints are interpolated
    doubles, where engine ulps could otherwise differ.
    """
    ev = load_table(spark, sf_dir, "events")
    bands = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.05)).alias("lo"),
        F.percentile("value", F.lit(0.95)).alias("hi"),
    )
    return ev.join(F.broadcast(bands), "event_type").select(
        "event_id",
        "event_type",
        qround(
            F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("value"))), 2
        ).alias("value_winsorized"),
    )


@query(
    "agg_regression",
    oracle="""
    SELECT event_type,
           CAST(regr_count(value, epoch_us(ts) / 1000000.0) AS BIGINT)
             AS n,
           FLOOR(regr_slope(value, epoch_us(ts) / 1000000.0)
                 * 1000000000.0 + 0.5) / 1000000000.0 AS slope,
           FLOOR(regr_intercept(value, epoch_us(ts) / 1000000.0)
                 * 10000.0 + 0.5) / 10000.0 AS intercept,
           FLOOR(regr_r2(value, epoch_us(ts) / 1000000.0)
                 * 1000000.0 + 0.5) / 1000000.0 AS r2
    FROM events GROUP BY event_type
    """,
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in OLS aggregates (`regr_slope/intercept/r2`): the
    trend-per-series primitive (is `value` drifting over time per
    event type?) without collecting anything — the regression moments
    (Σx, Σy, Σxy, Σx²) are mergeable, so this is ONE map-side-combined
    hash aggregate at any scale, same shape as a plain sum.

    x = epoch seconds (µs/1e6 — identical arithmetic both engines).
    Slope is qround'd at 1e-9 (its natural units are value-per-second
    over a ~2-month span: tiny magnitudes), intercept/r2 at their own
    grids — moment accumulation order differs across engines, so every
    derived statistic gets the floor-form treatment."""
    ev = load_table(spark, sf_dir, "events")
    x = F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1000000.0)
    y = F.col("value")
    return ev.groupBy("event_type").agg(
        F.regr_count(y, x).cast("bigint").alias("n"),
        qround(F.regr_slope(y, x), 9).alias("slope"),
        qround(F.regr_intercept(y, x), 4).alias("intercept"),
        qround(F.regr_r2(y, x), 6).alias("r2"),
    )


@query(
    "ts_seasonal_profile",
    oracle="""
    SELECT event_type,
           CAST(EXTRACT(hour FROM ts) AS INT) AS hour_of_day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           FLOOR(AVG(value) * 10000.0 + 0.5) / 10000.0 AS avg_value
    FROM events GROUP BY 1, 2
    """,
)
def ts_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal profile per event type — the baseline
    matrix anomaly detection normalizes against (compare an
    observation to its (type, hour) cell, not the global mean).
    One hash aggregate over ≤ types×24 cells; the profile table is
    broadcast-sized forever, which is what makes seasonal
    normalization cheap downstream."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hour_of_day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        qround(F.avg("value"), 4).alias("avg_value"),
    )


@query(
    "ts_max_gap",
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             epoch_us(ts) - epoch_us(LAG(ts) OVER
               (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
      FROM events
    )
    SELECT user_id,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
           CAST(COUNT(gap_us) AS BIGINT) AS n_gaps
    FROM gaps GROUP BY user_id
    """,
)
def ts_max_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest silence per user: max inter-event gap in exact integer
    microseconds — the liveness/outage signal (a monitoring stream's
    max gap IS its worst blackout). One LAG window pass + a
    map-side-combined max; integer µs arithmetic is drift-free on
    both engines, no rounding needed."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    m = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = ev.select(
        "user_id",
        (m - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))).alias(
            "gap_us"
        ),
    )
    return gaps.groupBy("user_id").agg(
        F.max("gap_us").alias("max_gap_us"),
        F.count("gap_us").alias("n_gaps"),
    )


@query(
    "ts_weekly_active",
    oracle="""
    WITH du AS (
      SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
    ),
    contrib AS (
      SELECT day + TO_DAYS(CAST(o AS INT)) AS obs_day, user_id
      FROM du, unnest(generate_series(0, 6)) AS g(o)
    ),
    days AS (SELECT DISTINCT day AS obs_day FROM du)
    SELECT c.obs_day,
           CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS wau
    FROM contrib c JOIN days d ON c.obs_day = d.obs_day
    GROUP BY c.obs_day
    """,
)
def ts_weekly_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly-active users per day (trailing 7-day distinct count) via
    the explode-to-window pattern: each (day, user) activity
    contributes itself to the 7 observation days it keeps the user
    "active" for, then one distinct-count per observation day.

    This is THE scalable rolling-distinct shape: no per-day set
    union, no window over users — a 7× row expansion of the already-
    deduped (day, user) table (tiny vs raw events), one exchange for
    the final count-distinct. Days with no activity in the prior week
    are absent by the semi join against observed days (a calendar
    gap-fill composes via ts_gap_fill)."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).distinct()
    contrib = du.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("o"),
        "day",
        "user_id",
    ).select(
        (F.col("day") + F.make_interval(days=F.col("o"))).alias("obs_day"),
        "user_id",
    )
    days = du.select(F.col("day").alias("obs_day")).distinct()
    return (
        contrib.join(days, "obs_day")
        .groupBy("obs_day")
        .agg(F.count_distinct("user_id").alias("wau"))
    )


@query(
    "ts_funnel_windowed",
    oracle="""
    WITH paired AS (
      SELECT p.user_id, p.ts AS p_ts, c.ts AS c_ts
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id AND p.ts >= c.ts
    )
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_conversions
    FROM paired
    WHERE c_ts IS NOT NULL
      AND epoch_us(p_ts) - epoch_us(c_ts) <= 3600000000
    GROUP BY user_id
    """,
)
def ts_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed funnel: purchases that convert a click within ONE HOUR
    (attribution-window semantics — an unbounded funnel like
    `ts_funnel` credits clicks from arbitrarily long ago). Per-user
    conversion counts.

    Same single-shuffle as-of decomposition as `join_asof` (union +
    window carry-forward of the latest click time), then a pure
    arithmetic gap filter — the attribution window adds zero plan
    cost. The carried value is the click's epoch-micros, so the gap
    test is exact integer arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    m = F.unix_micros(F.col("ts").cast("timestamp"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", m.alias("c_m"),
        F.col("event_id").alias("c_id"),
        F.lit(None).cast("long").alias("p_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(None).cast("long").alias("c_m"),
        F.lit(None).cast("long").alias("c_id"),
        F.col("event_id").alias("p_id"),
    )
    tagged = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts"),
            F.col("c_id").isNull().cast("int"),
            F.col("c_id"),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    paired = tagged.withColumn(
        "last_c_m", F.last("c_m", ignorenulls=True).over(w)
    ).filter(F.col("p_id").isNotNull())
    m_p = F.unix_micros(F.col("ts").cast("timestamp"))
    converted = paired.filter(
        F.col("last_c_m").isNotNull()
        & ((m_p - F.col("last_c_m")) <= F.lit(3600000000))
    )
    return converted.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_conversions")
    )


@query(
    "ts_sli_availability",
    oracle="""
    WITH b AS (
      SELECT event_type,
             CAST(COUNT(DISTINCT date_trunc('hour', ts)) AS BIGINT)
               AS hours_active,
             (CAST(date_diff('hour', date_trunc('hour', MIN(ts)),
                             date_trunc('hour', MAX(ts))) AS BIGINT) + 1)
               AS hours_span
      FROM events GROUP BY event_type
    )
    SELECT event_type, hours_active, hours_span,
           FLOOR(hours_active / CAST(hours_span AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS availability
    FROM b
    """,
)
def ts_sli_availability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Availability SLI per series: the fraction of hours in each
    event type's observed span that saw at least one event — the
    "was it reporting" uptime measure (a silent hour IS the incident
    for a heartbeat stream).

    One aggregate computes active-hour distinct count and the span
    endpoints together — no hour-grid materialization (contrast
    ts_gap_fill, which builds the dense grid when the gaps themselves
    are the output). distinct-hours is bounded by the span, not the
    row count, so the shuffle stays calendar-sized."""
    ev = load_table(spark, sf_dir, "events")
    hr = F.date_trunc("hour", "ts")
    b = ev.groupBy("event_type").agg(
        F.count_distinct(hr).alias("hours_active"),
        (
            (
                F.unix_micros(F.date_trunc("hour", F.max("ts")).cast("timestamp"))
                - F.unix_micros(
                    F.date_trunc("hour", F.min("ts")).cast("timestamp")
                )
            )
            / F.lit(3600000000)
            + 1
        )
        .cast("bigint")
        .alias("hours_span"),
    )
    return b.select(
        "event_type",
        "hours_active",
        "hours_span",
        qround(
            F.col("hours_active") / F.col("hours_span").cast("double"), 6
        ).alias("availability"),
    )


@query(
    "ts_interval_union",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id, epoch_us(ts) AS lo,
             epoch_us(ts) + 600000000 AS hi
      FROM events
    ),
    flagged AS (
      SELECT user_id, event_id, lo, hi,
             CASE WHEN lo > MAX(hi) OVER (
                    PARTITION BY user_id ORDER BY lo, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    islands AS (
      SELECT user_id, lo, hi,
             SUM(new_island) OVER (
               PARTITION BY user_id ORDER BY lo, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island_id
      FROM flagged
    )
    SELECT user_id, CAST(island_id AS BIGINT) AS island_id,
           CAST(MIN(lo) AS BIGINT) AS start_us,
           CAST(MAX(hi) AS BIGINT) AS end_us,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(hi) - MIN(lo) AS BIGINT) AS span_us
    FROM islands GROUP BY user_id, island_id
    """,
)
def ts_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge overlapping per-user intervals (each event spans 10
    minutes) into maximal disjoint islands — the gaps-and-islands
    classic behind meeting-room coalescing, validity-interval
    compaction, and downtime merging. Distinct from ts_sessionize:
    sessions break on inactivity GAPS, islands break only when the
    running interval frontier is cleared.

    One window pass computes the island flag (lo > running max hi
    over PRECEDING rows), a running sum turns flags into island ids,
    one hash aggregate folds each island — the whole thing is a
    single user-partitioned exchange at any scale, in exact integer
    microseconds. NULL-start semantics (first row's empty frame)
    fold to island 0 identically on both engines."""
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("lo"),
        (F.unix_micros(F.col("ts").cast("timestamp")) + 600_000_000).alias(
            "hi"
        ),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("lo", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("lo", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = iv.withColumn(
        "new_island",
        F.when(F.col("lo") > F.max("hi").over(w_prev), F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    islands = flagged.withColumn(
        "island_id", F.sum("new_island").over(w_run)
    )
    return islands.groupBy("user_id", "island_id").agg(
        F.min("lo").alias("start_us"),
        F.max("hi").alias("end_us"),
        F.count(F.lit(1)).alias("n_events"),
        (F.max("hi") - F.min("lo")).alias("span_us"),
    )


@query(
    "ts_autocorr",
    oracle=f"""
    WITH l AS (
        SELECT event_type, value,
               LAG(value) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id
               ) AS prev
        FROM events
    )
    SELECT event_type, CAST(COUNT(prev) AS BIGINT) AS n_pairs,
           {sql_qround("corr(value, prev)", 6)} AS acf1
    FROM l GROUP BY event_type
    """,
)
def ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation per series (Pearson r between each value
    and its predecessor in event order) — the is-this-series-noise-or-
    momentum diagnostic that decides whether EWMA smoothing
    (ts_ewma) or plain means are appropriate, and the standard check
    before fitting any AR model.

    LAG over a (ts, event_id)-ordered per-type window — event_id
    breaks timestamp ties so the pairing is deterministic across
    engines — then one grouped corr. Pearson r is a ratio of moments,
    so the sample-vs-population scaling cancels and both engines agree
    to libm ulps; qround at 1e-6 absorbs those.

    100 TB shape: one shuffle keying the window by event_type, then a
    map-side-combined moment aggregate (Σx, Σy, Σxy, Σx², Σy² are all
    mergeable) — same cost as ts_ewma's scan. Skewed series (one type
    = half the data) would range-partition by (event_type, ts) and
    chain the boundary row per partition, the ts_gap_fill pattern."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    lagged = ev.select(
        "event_type",
        "value",
        F.lag("value").over(w).alias("prev"),
    )
    return lagged.groupBy("event_type").agg(
        F.count("prev").alias("n_pairs"),
        qround(F.corr("value", "prev"), 6).alias("acf1"),
    )


@query(
    "ts_cusum_drift",
    oracle=f"""
    WITH m AS (SELECT event_type, AVG(value) AS mu FROM events GROUP BY 1),
    c AS (
        SELECT e.event_type,
               SUM(e.value - m.mu) OVER (
                   PARTITION BY e.event_type ORDER BY e.ts, e.event_id
               ) AS cusum
        FROM events e JOIN m ON e.event_type = m.event_type
    )
    SELECT event_type,
           {sql_qround("MAX(ABS(cusum))", 4)} AS max_abs_cusum
    FROM c GROUP BY 1
    """,
)
def ts_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift magnitude per series: the maximum absolute running
    sum of deviations from the series mean, in (ts, event_id) order —
    the change-point screening statistic (Page's CUSUM): a series
    whose level shifts mid-stream accumulates a large |Σ(x-μ)| even
    when ts_anomaly_zscore sees no single outlying point.

    Two passes by necessity (μ must exist before deviations do): one
    hash aggregate for per-type means (broadcast back — the mean
    table is |types| rows), then a per-type ordered window running
    sum and a final max. Window and final agg share the event_type
    partitioning, so the plan is mean-shuffle + ONE data shuffle that
    both the window sort and the max reuse.

    Both engines accumulate the running sum in the same deterministic
    (ts, event_id) order, so the only cross-engine drift is μ's
    summation-order ulps (amplified ≤ n×): qround at 1e-4 sits
    orders of magnitude above it."""
    ev = load_table(spark, sf_dir, "events")
    m = ev.groupBy("event_type").agg(F.avg("value").alias("mu"))
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    c = ev.join(F.broadcast(m), "event_type").select(
        "event_type",
        F.sum(F.col("value") - F.col("mu")).over(w).alias("cusum"),
    )
    return c.groupBy("event_type").agg(
        qround(F.max(F.abs("cusum")), 4).alias("max_abs_cusum")
    )


@query(
    "ts_event_regex",
    oracle="""
    WITH seq AS (
        SELECT user_id,
               string_agg(substr(event_type, 1, 1), ''
                          ORDER BY ts, event_id) AS s
        FROM events GROUP BY user_id
    )
    SELECT user_id, CAST(len(s) AS INT) AS seq_len,
           CAST(len(regexp_extract_all(s, 'v+c')) AS INT) AS n_conversions
    FROM seq
    """,
)
def ts_event_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex-over-event-sequences — the poor man's MATCH_RECOGNIZE
    (SQL:2016 row-pattern matching, which Spark lacks): per user, the
    time-ordered event stream becomes a string of event initials and
    a pattern counts non-overlapping occurrences ('v+c' = one-or-more
    views ending in a click, the browse-then-convert run). Arbitrary
    CEP patterns (alternation, bounded gaps via {m,n}) ride the same
    two operators with no new infrastructure.

    Ordering is the deterministic (ts, event_id) sort encoded as
    array_sort over structs — collect_list order alone is
    partition-arrival order, never comparable across engines.

    100 TB shape: one shuffle keyed on user_id, then map-side regexp
    per group; per-user sequences are session-sized (the
    agg_string_concat memory caveat applies — fact-sized groups keep
    the array and window instead)."""
    ev = load_table(spark, sf_dir, "events")
    seq = (
        ev.select(
            "user_id",
            F.struct(
                F.col("ts"), F.col("event_id"),
                F.substring("event_type", 1, 1).alias("c"),
            ).alias("e"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("e")), lambda s: s["c"]
                ),
                "",
            ).alias("s")
        )
    )
    return seq.select(
        "user_id",
        F.length("s").cast("int").alias("seq_len"),
        F.size(F.regexp_extract_all("s", F.lit("v+c"), F.lit(0)))
        .cast("int")
        .alias("n_conversions"),
    )


@query(
    "ts_calendar_dim",
    oracle="""
    WITH b AS (SELECT MIN(CAST(ts AS DATE)) AS lo,
                      MAX(CAST(ts AS DATE)) AS hi FROM events),
    days AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE
                    AS day FROM b),
    daily AS (SELECT CAST(ts AS DATE) AS day,
                     CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1)
    SELECT CAST(d.day AS VARCHAR) AS day,
           CAST(EXTRACT(month FROM d.day) AS INT) AS month,
           CAST(EXTRACT(quarter FROM d.day) AS INT) AS quarter,
           CAST(EXTRACT(dow FROM d.day) AS INT) AS dow,
           EXTRACT(dow FROM d.day) IN (0, 6) AS is_weekend,
           COALESCE(dy.n, 0) AS n_events
    FROM days d LEFT JOIN daily dy ON d.day = dy.day
    """,
)
def ts_calendar_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated calendar dimension spanning the fact table's date
    range — the warehouse utility every BI layer needs (no-event days
    MUST exist as rows, or weekly averages silently skip them; same
    hole ts_gap_fill plugs per-series, done here for the date spine
    itself). sequence(min, max) + explode generates the spine
    in-engine; daily counts left-join onto it so gaps surface as 0.

    Cross-engine convention trap pinned here: Spark's dayofweek() is
    1=Sunday..7, DuckDB's EXTRACT(dow) is 0=Sunday..6 — the engine
    side subtracts 1 rather than hoping the conventions agree.

    100 TB shape: the spine is O(days) from a 2-row aggregate —
    broadcast-sized forever; daily counts are one map-side-combined
    aggregate. The join is broadcast, never a shuffle of the fact."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(
        F.min(F.to_date("ts")).alias("lo"),
        F.max(F.to_date("ts")).alias("hi"),
    )
    days = b.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day")
    )
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    dow = F.dayofweek("day") - 1
    return (
        days.join(daily, "day", "left")
        .select(
            F.col("day").cast("string").alias("day"),
            F.month("day").cast("int").alias("month"),
            F.quarter("day").cast("int").alias("quarter"),
            dow.cast("int").alias("dow"),
            dow.isin(0, 6).alias("is_weekend"),
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events"),
        )
    )


@query(
    "ts_backtest_snaive",
    oracle=f"""
    WITH b AS (SELECT MIN(CAST(ts AS DATE)) AS d0 FROM events),
    lab AS (
        SELECT e.event_type, EXTRACT(hour FROM e.ts) AS h, e.value,
               CAST(e.ts AS DATE) - b.d0 AS day
        FROM events e CROSS JOIN b
    ),
    train AS (
        SELECT event_type, h, AVG(value) AS fc
        FROM lab WHERE day < 14 GROUP BY 1, 2
    ),
    test AS (SELECT * FROM lab WHERE day >= 14)
    SELECT t.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           {sql_qround("AVG(ABS(t.value - tr.fc))", 4)} AS mae
    FROM test t JOIN train tr
      ON t.event_type = tr.event_type AND t.h = tr.h
    GROUP BY t.event_type
    """,
)
def ts_backtest_snaive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: fit the (type, hour-of-day)
    mean on the first 14 days, score it on everything after, report
    per-series MAE — the baseline every real forecasting model must
    beat, and the time-split evaluation pattern (train strictly
    before test, split on event time, never random) that
    split_train_test's hash split is NOT valid for with temporal
    data.

    The train/test boundary derives from the data's own min date
    (1-row broadcast, the sanctioned normalizer crossJoin); the
    fitted profile is |types|×24 rows, broadcast onto the test scan —
    so the whole backtest is two aggregates and a broadcast join, no
    fact-side shuffle beyond the profile fit.

    100 TB shape: identical — the model is metadata-sized by
    construction (that is what makes seasonal-naive the cheap
    baseline); rolling-origin evaluation = re-run with a different
    day cut, same plan."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(F.min(F.to_date("ts")).alias("d0"))
    lab = ev.crossJoin(F.broadcast(b)).select(
        "event_type",
        F.hour("ts").alias("h"),
        "value",
        F.datediff(F.to_date("ts"), F.col("d0")).alias("day"),
    )
    train = (
        lab.where(F.col("day") < 14)
        .groupBy("event_type", "h")
        .agg(F.avg("value").alias("fc"))
    )
    test = lab.where(F.col("day") >= 14)
    return (
        test.join(F.broadcast(train), ["event_type", "h"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            qround(F.avg(F.abs(F.col("value") - F.col("fc"))), 4).alias(
                "mae"
            ),
        )
    )


@query(
    "ts_fano_burstiness",
    oracle=f"""
    WITH m AS (
        SELECT event_type, date_trunc('hour', ts) AS hr,
               CAST(COUNT(*) AS DOUBLE) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_buckets,
           {sql_qround("var_samp(n) / AVG(n)", 6)} AS fano
    FROM m GROUP BY event_type
    """,
)
def ts_fano_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (index of dispersion, variance/mean of per-hour
    counts) per series — the burstiness diagnostic: a Poisson
    arrival process sits at 1.0, clustered/bursty traffic above,
    regular (rate-limited) traffic below. The one-number answer to
    "can I provision for the mean, or do bursts dominate?".

    OCCUPIED hours only (both engines aggregate the same grouped
    buckets; a fully-gap-filled variant composes with ts_gap_fill's
    spine when zero-hours must count). Two stacked mergeable
    aggregates — hourly counts, then (var, mean) of those — so the
    shuffle rows are bounded by types×hours, never events.

    100 TB shape: the first aggregate map-side combines per
    (type, hour); the second runs over a bucket table that is tiny
    forever."""
    ev = load_table(spark, sf_dir, "events")
    m = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    return m.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        qround(F.var_samp("n") / F.avg("n"), 6).alias("fano"),
    )


@query(
    "ts_gaps_islands",
    oracle="""
    WITH h AS (
        SELECT DISTINCT user_id,
               CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr
        FROM events
    ),
    r AS (
        SELECT user_id, hr,
               hr - ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY hr) AS grp
        FROM h
    ),
    isl AS (
        SELECT user_id, grp,
               CAST(COUNT(*) AS BIGINT) AS run_hours
        FROM r GROUP BY user_id, grp
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(MAX(run_hours) AS BIGINT) AS longest_run_hours,
           CAST(SUM(run_hours) AS BIGINT) AS active_hours
    FROM isl GROUP BY user_id
    """,
)
def ts_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of CONSECUTIVE active hours per
    user (the classic streak/uptime-segment shape — login streaks,
    sensor uptime, contiguous coverage windows). The standard
    rank-difference trick: within a user, hour_index − row_number()
    is constant exactly along a consecutive run, so one grouped count
    per (user, that difference) materializes every island without any
    self-join or iteration.

    Per-user summary output (n_islands / longest run / total active
    hours) keeps the result deterministic and small.

    100 TB shape: one distinct on (user, hour) — map-side combinable
    — then a user-partitioned window and two grouped aggregates, all
    sharing the user_id shuffle key, so the whole query is a single
    exchange; no global window anywhere (the rank is per-user).
    Extends the reference's relation building (geonames.js:150-170
    builds liesIn edges pairwise) with the run-length idiom it lacks.
    """
    ev = load_table(spark, sf_dir, "events")
    h = ev.select(
        "user_id",
        F.floor(F.unix_timestamp(F.col("ts").cast("timestamp")) / 3600)
        .cast("long")
        .alias("hr"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("hr")
    r = h.withColumn("grp", F.col("hr") - F.row_number().over(w))
    isl = r.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("run_hours")
    )
    return isl.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.max("run_hours").cast("long").alias("longest_run_hours"),
        F.sum("run_hours").cast("long").alias("active_hours"),
    )


_LTTB_BUCKET_SECONDS = 129_600  # 36 h — ~20 buckets over the 30-day span
_LTTB_EPOCH_BASE = 1_704_067_200  # 2024-01-01 00:00:00 UTC


@query(
    "ts_lttb_downsample",
    oracle=f"""
    WITH pts AS (
        SELECT user_id, event_id,
               CAST(floor(epoch(ts)) AS BIGINT) - {_LTTB_EPOCH_BASE} AS x,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
        FROM events
    ),
    pb AS (
        SELECT *, x // {_LTTB_BUCKET_SECONDS} AS bkt FROM pts
    ),
    agg AS (
        SELECT user_id, bkt,
               SUM(x) AS sx, SUM(y) AS sy,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM pb GROUP BY user_id, bkt
    ),
    scored AS (
        SELECT p.user_id, p.bkt, p.event_id,
               abs((pr.sx * nx.n - nx.sx * pr.n) * (p.y * pr.n - pr.sy)
                   - (pr.sx - p.x * pr.n) * (nx.sy * pr.n - pr.sy * nx.n))
                   AS score
        FROM pb p
        JOIN agg pr ON p.user_id = pr.user_id AND pr.bkt = p.bkt - 1
        JOIN agg nx ON p.user_id = nx.user_id AND nx.bkt = p.bkt + 1
    ),
    ranked AS (
        SELECT user_id, bkt, event_id, score,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, bkt
                   ORDER BY score DESC, event_id DESC) AS rk
        FROM scored
    )
    SELECT user_id, CAST(bkt AS BIGINT) AS bkt, event_id,
           CAST(score AS BIGINT) AS score
    FROM ranked WHERE rk = 1
    """,
)
def ts_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013)
    — the visually-faithful time-series reducer every dashboard layer
    runs: per 36-hour bucket keep the ONE point forming the largest
    triangle with the neighboring buckets' centroids, preserving
    spikes and shape where naive avg/first sampling flattens them.
    This is the parallel bucket-mean variant (neighbors are bucket
    centroids, not the previously-selected point), which drops the
    sequential dependency that makes textbook LTTB undistributable —
    each bucket selects independently.

    EXACT INTEGER arithmetic throughout: x rebased to epoch-seconds
    from 2024-01-01, y in half-up cents, and the triangle area
    cross-multiplied by n_prev²·n_next to clear both centroid
    divisions — so the argmax ranks on a BIGINT and the differential
    hash cannot be flipped by float accumulation order (the repo working notes'
    prefer-all-integer rule; magnitudes stay < 2^63 by the rebase).
    Interior buckets only (both neighbors must exist) — endpoint
    buckets are kept wholesale by real renderers anyway.

    100 TB shape: one (user, bucket) aggregate, two self-joins
    against the tiny per-bucket table on the SAME user key (no new
    shuffle partitioning), one per-bucket window. Bucket widths tune
    output density; everything map-side-combines."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        "event_id",
        (
            F.floor(F.unix_timestamp(F.col("ts").cast("timestamp")))
            .cast("long")
            - _LTTB_EPOCH_BASE
        ).alias("x"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("y"),
    )
    pb = pts.withColumn(
        "bkt", F.floor(F.col("x") / _LTTB_BUCKET_SECONDS).cast("long")
    )
    agg = pb.groupBy("user_id", "bkt").agg(
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    pr = agg.select(
        F.col("user_id").alias("p_uid"),
        (F.col("bkt") + 1).alias("p_bkt"),
        F.col("sx").alias("p_sx"),
        F.col("sy").alias("p_sy"),
        F.col("n").alias("p_n"),
    )
    nx = agg.select(
        F.col("user_id").alias("n_uid"),
        (F.col("bkt") - 1).alias("n_bkt"),
        F.col("sx").alias("n_sx"),
        F.col("sy").alias("n_sy"),
        F.col("n").alias("n_n"),
    )
    scored = (
        pb.join(
            pr,
            (F.col("user_id") == F.col("p_uid"))
            & (F.col("bkt") == F.col("p_bkt")),
        )
        .join(
            nx,
            (F.col("user_id") == F.col("n_uid"))
            & (F.col("bkt") == F.col("n_bkt")),
        )
        .select(
            "user_id",
            "bkt",
            "event_id",
            F.abs(
                (F.col("p_sx") * F.col("n_n") - F.col("n_sx") * F.col("p_n"))
                * (F.col("y") * F.col("p_n") - F.col("p_sy"))
                - (F.col("p_sx") - F.col("x") * F.col("p_n"))
                * (F.col("n_sy") * F.col("p_n") - F.col("p_sy") * F.col("n_n"))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("user_id", "bkt").orderBy(
        F.col("score").desc(), F.col("event_id").desc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("bkt").cast("long").alias("bkt"),
            "event_id",
            F.col("score").cast("long").alias("score"),
        )
    )


# ---------------------------------------------------------------------------
# series diagnostics: autocorrelation, changepoint, robust trend
# ---------------------------------------------------------------------------

_ACF_LAGS = (1, 2, 3)


# Shared acf CTE block (ts_acf / ts_pacf): hourly counts indexed by
# observed order, per-lag exact-int64 pair moments, global moments,
# and the guarded acf ratio per lag.
_ACF_SQL_CTES = """
    hc AS (
      SELECT epoch_us(ts) // 3600000000 AS h,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    idx AS (
      SELECT c, CAST(ROW_NUMBER() OVER (ORDER BY h) AS BIGINT) AS t
      FROM hc
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS BIGINT) AS sv,
             CAST(SUM(c * c) AS BIGINT) AS svv
      FROM idx
    ),
    lagged AS (
      SELECT l.lag,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(a.c * b.c) AS BIGINT) AS sxy,
             CAST(SUM(a.c) AS BIGINT) AS sa,
             CAST(SUM(b.c) AS BIGINT) AS sb
      FROM (SELECT unnest([1, 2, 3]) AS lag) l
      JOIN idx a ON TRUE
      JOIN idx b ON b.t = a.t + l.lag
      GROUP BY l.lag
    ),
    acf_rows AS (
      SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
             CASE WHEN CAST(n AS DOUBLE)
                       * (CAST(n AS DOUBLE) * CAST(svv AS DOUBLE)
                          - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)) <> 0
                  THEN (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                          * CAST(sxy AS DOUBLE)
                        - CAST(n AS DOUBLE) * CAST(sv AS DOUBLE)
                          * (CAST(sa AS DOUBLE) + CAST(sb AS DOUBLE))
                        + CAST(n_pairs AS DOUBLE) * CAST(sv AS DOUBLE)
                          * CAST(sv AS DOUBLE))
                       / (CAST(n AS DOUBLE)
                          * (CAST(n AS DOUBLE) * CAST(svv AS DOUBLE)
                             - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)))
             END AS acf
      FROM lagged, s
    )
"""


def _acf_tables(spark: SparkSession, sf_dir: str):
    """Shared ts_acf/ts_pacf core: returns (lagged, s) — the per-lag
    exact-int64 pair moments and the global moments of the hourly
    event-count series, indexed by observed order (see ts_acf)."""
    from etl_geonames_spark.operators.relational import distributed_rank

    ev = load_table(spark, sf_dir, "events")
    hc = (
        ev.select(
            F.expr("unix_micros(cast(ts as timestamp)) div 3600000000").alias("h")
        )
        .groupBy("h")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        # |hours| rows; pinned because THREE branches (moment table +
        # both sides of the lag join) would otherwise re-run the
        # events scan + aggregate each
        .transform(pin)
    )
    idx = (
        distributed_rank(hc, ["h"])
        .select("c", F.col("_grn").cast("long").alias("t"))
        # |hours| rows, used by THREE branches (global moments + both
        # sides of the lag join): without this pin each branch re-runs
        # the whole distributed_rank subplan (range exchange + offsets
        # broadcast), tripling the per-query shuffle bill — the r4
        # census showed 19 plan-shuffles in each of ts_acf / ts_pacf /
        # stat_ljung_box from exactly this re-execution
        .transform(pin)
    )
    s = idx.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("sv"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("svv"),
    )
    lags = spark.range(1, len(_ACF_LAGS) + 1).select(
        F.col("id").cast("long").alias("lag")
    )
    a = idx.alias("a")
    b = idx.alias("b")
    lagged = (
        F.broadcast(lags)
        .join(a)
        .join(b, F.col("b.t") == F.col("a.t") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("a.c") * F.col("b.c")).cast("long").alias("sxy"),
            F.sum(F.col("a.c")).cast("long").alias("sa"),
            F.sum(F.col("b.c")).cast("long").alias("sb"),
        )
    )
    return lagged, s


def _acf_expr():
    """The guarded acf ratio (doubles cast BEFORE the big multiplies —
    overflow note in ts_acf; den ≠ 0 guard for constant series, where
    ANSI would otherwise throw DIVIDE_BY_ZERO)."""
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    num = (
        d("n") * d("n") * d("sxy")
        - d("n") * d("sv") * (d("sa") + d("sb"))
        + d("n_pairs") * d("sv") * d("sv")
    )
    den = d("n") * (d("n") * d("svv") - d("sv") * d("sv"))
    return F.when(den != 0, num / den)


@query(
    "ts_acf",
    oracle=f"""
    WITH {_ACF_SQL_CTES}
    SELECT lag, n_pairs, acf FROM acf_rows ORDER BY lag
    """,
)
def ts_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of the hourly event-count series at lags
    1–3 — the seasonality/momentum diagnostic a forecasting pipeline
    reads before model choice. Hours index by OBSERVED order (rank via
    ``distributed_rank``, so calendar gaps don't create phantom
    zeros), the lag alignment is an equi-join on t = t+L (never a
    window over the whole series), and every aggregate is an exact
    int64 sum: the textbook r_L re-arranged as
    [n²·Σxy − n·S·(Sa+Sb) + (n−L)·S²] / [n·(n·Σx² − S²)] so floats
    appear only in the final fixed-shape expression (deterministic
    IEEE, no rounding grid). Casts to double happen *before* the big
    multiplies — n²·Σxy would overflow int64 on a years-long
    high-rate series, and ANSI mode would make that a job-killer.

    The series table is |hours| rows — metadata-sized against the
    corpus; the only fact-scale exchange is the hourly count
    aggregate itself.

    Sibling: ts_autocorr is the lag-1, per-series (per event type)
    form over a LAG window; this one profiles the GLOBAL aggregate
    series at multiple lags, where a per-series window doesn't apply.
    ts_pacf feeds these same moments through Durbin–Levinson for the
    AR-order diagnostic. A constant series has zero variance → acf is
    NULL (guarded; ANSI would otherwise throw DIVIDE_BY_ZERO).
    """
    lagged, s = _acf_tables(spark, sf_dir)
    return (
        lagged.crossJoin(F.broadcast(s))
        .select("lag", "n_pairs", _acf_expr().alias("acf"))
        .orderBy("lag")
    )


@query(
    "ts_pacf",
    oracle=f"""
    WITH {_ACF_SQL_CTES},
    wide AS (
      SELECT MAX(CASE WHEN lag = 1 THEN acf END) AS r1,
             MAX(CASE WHEN lag = 2 THEN acf END) AS r2,
             MAX(CASE WHEN lag = 3 THEN acf END) AS r3
      FROM acf_rows
    ),
    l2 AS (
      SELECT r1, r2, r3,
             CASE WHEN 1 - r1 * r1 <> 0
                  THEN (r2 - r1 * r1) / (1 - r1 * r1) END AS p2
      FROM wide
    ),
    l3 AS (SELECT r1, r2, r3, p2, r1 * (1 - p2) AS phi21 FROM l2)
    SELECT {sql_qround('r1', 6)} AS acf1,
           {sql_qround('r2', 6)} AS acf2,
           {sql_qround('r3', 6)} AS acf3,
           {sql_qround('r1', 6)} AS pacf1,
           {sql_qround('p2', 6)} AS pacf2,
           {sql_qround(
               'CASE WHEN 1 - phi21 * r1 - p2 * r2 <> 0'
               ' THEN (r3 - phi21 * r2 - p2 * r1)'
               ' / (1 - phi21 * r1 - p2 * r2) END', 6
           )} AS pacf3
    FROM l3
    """,
)
def ts_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation at lags 1–3 via Durbin–Levinson — the
    AR-order diagnostic (Box–Jenkins model identification: pacf cuts
    off after lag p for an AR(p) process, where raw acf only decays).
    Built on ts_acf's exact-int64 moment tables (shared helper, one
    plan): φ₁₁ = r₁; φ₂₂ = (r₂−r₁²)/(1−r₁²); φ₃₃ closes the
    recursion with φ₂₁ = r₁(1−φ₂₂). Emits both the acf and pacf
    triplets so the two diagnostics read side by side.

    Every Durbin–Levinson step is a fixed-shape double expression
    over the (deterministic, guard-NULLed) acf values — identical
    IEEE ops both engines, qround(6) only at emit. Each division is
    CASE-guarded (|r₁| = 1 or a degenerate level-3 denominator →
    NULL, never an ANSI DIVIDE_BY_ZERO; NULLs from a constant series
    propagate through). The moment tables are |hours|-sized — the
    only fact-scale exchange is the hourly count aggregate.
    """
    lagged, s = _acf_tables(spark, sf_dir)
    rk = lagged.crossJoin(F.broadcast(s)).select(
        "lag", _acf_expr().alias("acf")
    )
    wide = rk.agg(
        F.max(F.when(F.col("lag") == 1, F.col("acf"))).alias("r1"),
        F.max(F.when(F.col("lag") == 2, F.col("acf"))).alias("r2"),
        F.max(F.when(F.col("lag") == 3, F.col("acf"))).alias("r3"),
    )
    r1, r2, r3 = F.col("r1"), F.col("r2"), F.col("r3")
    l2 = wide.select(
        "r1",
        "r2",
        "r3",
        F.when(
            F.lit(1) - r1 * r1 != 0, (r2 - r1 * r1) / (F.lit(1) - r1 * r1)
        ).alias("p2"),
    )
    p2 = F.col("p2")
    l3 = l2.select(
        "r1", "r2", "r3", "p2", (r1 * (F.lit(1) - p2)).alias("phi21")
    )
    phi21 = F.col("phi21")
    den3 = F.lit(1) - phi21 * r1 - p2 * r2
    return l3.select(
        qround(r1, 6).alias("acf1"),
        qround(r2, 6).alias("acf2"),
        qround(r3, 6).alias("acf3"),
        qround(r1, 6).alias("pacf1"),
        qround(p2, 6).alias("pacf2"),
        qround(
            F.when(den3 != 0, (r3 - phi21 * r2 - p2 * r1) / den3), 6
        ).alias("pacf3"),
    )


@query(
    "ts_cusum_changepoint",
    oracle="""
    WITH hc AS (
      SELECT epoch_us(ts) // 3600000000 AS h,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    cum AS (
      SELECT h,
             CAST(ROW_NUMBER() OVER (ORDER BY h) AS BIGINT) AS t,
             CAST(SUM(c) OVER (ORDER BY h) AS BIGINT) AS st,
             CAST(COUNT(*) OVER () AS BIGINT) AS n,
             CAST(SUM(c) OVER () AS BIGINT) AS sn
      FROM hc
    ),
    dev AS (
      SELECT h, t, n, sn, ABS(n * st - t * sn) AS d FROM cum
    ),
    mx AS (SELECT MAX(d) AS d_max FROM dev)
    SELECT dev.n, dev.sn,
           CAST(mx.d_max AS BIGINT) AS d_num,
           CAST(MIN(dev.h) AS BIGINT) AS change_hour,
           CAST(mx.d_max AS DOUBLE)
             / (CAST(dev.n AS DOUBLE) * CAST(dev.sn AS DOUBLE)) AS cusum_stat
    FROM dev, mx WHERE dev.d = mx.d_max
    GROUP BY dev.n, dev.sn, mx.d_max
    """,
)
def ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on the hourly event-count series:
    the hour where the cumulative sum deviates most from the uniform
    trend line — the classic level-shift locator (Page 1954). The
    deviation S_t − (t/n)·S_n is cross-multiplied to the exact int64
    |n·S_t − t·S_n| so the argmax is an integer comparison; the
    normalized statistic divides once at the end.

    Index AND running sum come fused from
    ``distributed_rank_cumsum`` — ONE range exchange produces both,
    and the grand totals ride the same per-partition totals table, so
    the events scan and the hourly aggregate execute exactly once
    (the separate rank + cumsum + totals branches re-executed that
    subplan three times; the exchange census flagged it at 36
    plan-shuffles). The argmax-with-min-hour-tie-break is one
    ``max(struct(d, -h))`` aggregate — no self-join back onto the
    deviations.

    Sibling: ts_cusum_drift reports the drift MAGNITUDE per series
    (max |Σ(x−μ)| over per-type windows); this one localizes the
    change — WHERE the global series breaks, with the exact-integer
    cross-multiplied argmax.
    """
    from etl_geonames_spark.operators.relational import (
        distributed_rank_cumsum,
    )

    ev = load_table(spark, sf_dir, "events")
    hc = (
        ev.select(F.expr("unix_micros(cast(ts as timestamp)) div 3600000000").alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    rc = distributed_rank_cumsum(hc.transform(pin), ["h"], "c")
    # deviation table checkpointed (the kendall_w/wilcoxon r10
    # precedent): hour-grid-sized, so the rank_cumsum bookkeeping
    # executes once and the censused plan is scan + one argmax
    dev = rc.select(
        "h",
        F.col("_total_n").cast("long").alias("n"),
        F.col("_total_s").cast("long").alias("sn"),
        F.abs(
            F.col("_total_n") * F.col("_gcs")
            - F.col("_grn") * F.col("_total_s")
        ).alias("d"),
    ).transform(pin)
    best = dev.agg(
        F.max("n").alias("n"),
        F.max("sn").alias("sn"),
        F.max(F.struct(F.col("d"), (-F.col("h")).alias("nh"))).alias("mx"),
    )
    return best.select(
        "n",
        "sn",
        F.col("mx.d").cast("long").alias("d_num"),
        (-F.col("mx.nh")).cast("long").alias("change_hour"),
        (
            F.col("mx.d").cast("double")
            / (F.col("n").cast("double") * F.col("sn").cast("double"))
        ).alias("cusum_stat"),
    )


@query(
    "ts_theil_sen_daily",
    oracle="""
    WITH hc AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(hour(ts) AS BIGINT) AS h,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    slopes AS (
      SELECT a.day,
             CAST(b.c - a.c AS DOUBLE) / CAST(b.h - a.h AS DOUBLE) AS slope
      FROM hc a JOIN hc b ON a.day = b.day AND b.h > a.h
    )
    SELECT day, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           percentile_disc(0.5) WITHIN GROUP (ORDER BY slope)
             AS theil_sen_slope
    FROM slopes GROUP BY day
    """,
)
def ts_theil_sen_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day Theil-Sen trend of hourly event counts: the median of
    all pairwise slopes — the robust "is traffic ramping today"
    estimator that one outlier hour can't drag (unlike the per-day
    OLS in agg_regression). Pairs explode WITHIN a day only (≤ 24
    points → ≤ 276 slopes per group, bounded by the clock, not the
    data), so the self-join on day is an equi-join whose output is
    24× the day table — never corpus-quadratic.

    Each slope is one exact-int division (deterministic double); the
    median is percentile_disc semantics — the element at position
    ⌈n/2⌉ of the sorted slopes, materialized per-group via
    sort_array + element_at over the bounded slope list, so both
    engines pick the SAME actual element and the hash compares a
    value that exists in the data (no interpolation float).
    """
    ev = load_table(spark, sf_dir, "events")
    hc = (
        ev.select(
            F.date_trunc("day", "ts").alias("day"),
            F.hour("ts").cast("long").alias("h"),
        )
        .groupBy("day", "h")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    a, b = hc.alias("a"), hc.alias("b")
    slopes = a.join(
        b, (F.col("a.day") == F.col("b.day")) & (F.col("b.h") > F.col("a.h"))
    ).select(
        F.col("a.day").alias("day"),
        (
            (F.col("b.c") - F.col("a.c")).cast("double")
            / (F.col("b.h") - F.col("a.h")).cast("double")
        ).alias("slope"),
    )
    return (
        slopes.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sort_array(F.collect_list("slope")).alias("ss"),
        )
        .select(
            "day",
            "n_pairs",
            F.element_at(
                F.col("ss"),
                F.ceil(F.col("n_pairs").cast("double") / 2).cast("int"),
            ).alias("theil_sen_slope"),
        )
    )


@query(
    "win_rolling_median",
    oracle="""
    WITH dc AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    fr AS (
      SELECT event_type, day, c,
             list(c) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS win
      FROM dc
    )
    SELECT event_type, day, c,
           CAST(len(win) AS BIGINT) AS n_win,
           CAST(list_sort(win)[CAST(ceil(len(win) / 2.0) AS INT)]
                AS BIGINT) AS rolling_median
    FROM fr
    """,
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centered 7-day rolling MEDIAN of daily event counts per type —
    the robust smoother monitoring dashboards overlay (a single spike
    day can't move it, unlike win_running_sum's mean family). Median
    is a holistic aggregate with no built-in windowed form on either
    engine, so both materialize the bounded frame explicitly:
    collect_list over a ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
    frame (≤ 7 elements — per-row state bounded by the frame, not the
    data), sort, take the percentile_disc element at ⌈n/2⌉. The
    window partitions by event_type — parallel across keys, the
    allowed shape; counts are ints, so the median is exact.
    """
    ev = load_table(spark, sf_dir, "events")
    dc = (
        ev.select("event_type", F.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    fr = dc.withColumn("win", F.collect_list("c").over(w))
    return fr.select(
        "event_type",
        "day",
        "c",
        F.size("win").cast("long").alias("n_win"),
        F.element_at(
            F.sort_array("win"),
            F.ceil(F.size("win").cast("double") / 2).cast("int"),
        )
        .cast("long")
        .alias("rolling_median"),
    )


@query(
    "ts_m4_downsample",
    oracle="""
    WITH pts AS (
      SELECT event_type,
             epoch_us(ts) // 21600000000 AS bkt,
             value, ts, event_id
      FROM events
    ),
    rn AS (
      SELECT event_type, bkt, value,
             ROW_NUMBER() OVER (
               PARTITION BY event_type, bkt ORDER BY ts, event_id) AS ra,
             ROW_NUMBER() OVER (
               PARTITION BY event_type, bkt
               ORDER BY ts DESC, event_id DESC) AS rd
      FROM pts
    )
    SELECT event_type, CAST(bkt AS BIGINT) AS bkt,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(value) AS vmin,
           MAX(value) AS vmax,
           MAX(CASE WHEN ra = 1 THEN value END) AS vfirst,
           MAX(CASE WHEN rd = 1 THEN value END) AS vlast
    FROM rn GROUP BY event_type, bkt
    """,
)
def ts_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 downsampling (Jugel et al., VLDB 2014): per series and
    6-hour pixel bucket keep exactly min, max, first and last — the
    four values that make a line chart at that pixel width
    pixel-perfect, and the standard dashboard-backend aggregation
    (LTTB's ts_lttb_downsample trades exactness for shape; M4 is the
    lossless-at-resolution one). min/max are plain aggregates;
    first/last take a (ts, event_id)-ordered row_number per bucket
    (both directions) so ties resolve identically in both engines —
    the windows partition by (series, bucket), bounded and parallel.
    One exchange on the bucket key; output is 4 doubles per pixel
    regardless of input rate.
    """
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp)) div 21600000000").alias(
            "bkt"
        ),
        "value",
        "ts",
        "event_id",
    )
    wa = Window.partitionBy("event_type", "bkt").orderBy("ts", "event_id")
    wd = Window.partitionBy("event_type", "bkt").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    rn = pts.select(
        "event_type",
        "bkt",
        "value",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wd).alias("rd"),
    )
    return rn.groupBy("event_type", "bkt").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        F.max(F.when(F.col("ra") == 1, F.col("value"))).alias("vfirst"),
        F.max(F.when(F.col("rd") == 1, F.col("value"))).alias("vlast"),
    )


@query(
    "ts_sax_symbols",
    oracle="""
    WITH dc AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS BIGINT) AS s,
             CAST(SUM(c * c) AS BIGINT) AS q
      FROM dc GROUP BY event_type
    ),
    seg AS (
      SELECT dc.event_type,
             (CAST(dc.day AS DATE) - DATE '1970-01-01') // 4 AS seg,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             SUM(dc.c) AS segsum,
             CAST(COUNT(*) AS BIGINT) AS segn
      FROM dc GROUP BY 1, 2
    ),
    z AS (
      SELECT seg.event_type, seg.seg, seg.n_days,
             CAST(seg.segsum AS DOUBLE) / seg.segn AS paa,
             CASE WHEN stats.n * stats.q - stats.s * stats.s > 0
                  THEN (CAST(seg.segsum AS DOUBLE) / seg.segn
                        - CAST(stats.s AS DOUBLE) / stats.n)
                       / sqrt((CAST(stats.n AS DOUBLE) * stats.q
                               - CAST(stats.s AS DOUBLE) * stats.s)
                              / (CAST(stats.n AS DOUBLE) * stats.n))
                  ELSE 0.0 END AS zz
      FROM seg JOIN stats USING (event_type)
    )
    SELECT event_type, CAST(seg AS BIGINT) AS seg, n_days,
           FLOOR(paa * 1000000.0 + 0.5) / 1000000.0 AS paa,
           CASE WHEN zz < -0.6745 THEN 'a'
                WHEN zz < 0.0 THEN 'b'
                WHEN zz < 0.6745 THEN 'c'
                ELSE 'd' END AS sax
    FROM z
    """,
)
def ts_sax_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolic discretization (Lin et al. 2003): the daily count
    series per event type reduces to 4-day PAA segment means, z-scored
    against the series' own mean/std and binned into a 4-letter
    alphabet at the N(0,1) quartile breakpoints (±0.6745, 0) — the
    representation motif-mining and whole-series indexing run on,
    turning numeric series into strings llm-style n-gram machinery
    (winnowing, PMI, novelty — same module family) can then process.

    Determinism across engines: z is a fixed-shape double expression
    over exact int64 moments (counts, sums, sum-of-squares — never a
    float variance aggregate), so the breakpoint CASE sees identical
    bits on both sides and the letter can't flip; paa is qround'd only
    at emit. Two hash aggregates (daily, then segment) + a broadcast
    per-series stats join — segments are calendar-aligned (epoch-day
    div 4), so no per-series min-date pass is needed.
    """
    ev = load_table(spark, sf_dir, "events")
    dc = (
        ev.select("event_type", F.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    stats = dc.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("q"),
    )
    seg = dc.groupBy(
        "event_type",
        F.expr("datediff(day, DATE '1970-01-01') div 4").alias("seg"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("c").alias("segsum"),
        F.count(F.lit(1)).cast("long").alias("segn"),
    )
    paa = F.col("segsum").cast("double") / F.col("segn")
    mean = F.col("s").cast("double") / F.col("n")
    std = F.sqrt(
        (F.col("n").cast("double") * F.col("q")
         - F.col("s").cast("double") * F.col("s"))
        / (F.col("n").cast("double") * F.col("n"))
    )
    # zero-variance guard (exact int64 predicate, CASE short-circuits
    # under ANSI): a constant daily-count series has every PAA mean
    # equal to the series mean, so z := 0 — letter 'c' — instead of
    # 0/0 throwing DIVIDE_BY_ZERO; mirrored in the oracle
    zz = F.when(
        F.col("n") * F.col("q") - F.col("s") * F.col("s") > 0,
        (paa - mean) / std,
    ).otherwise(F.lit(0.0))
    sax = (
        F.when(zz < -0.6745, F.lit("a"))
        .when(zz < 0.0, F.lit("b"))
        .when(zz < 0.6745, F.lit("c"))
        .otherwise(F.lit("d"))
    )
    return (
        seg.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            F.col("seg").cast("long").alias("seg"),
            "n_days",
            qround(paa, 6).alias("paa"),
            sax.alias("sax"),
        )
    )


@query(
    "ts_decayed_score",
    oracle=f"""
    WITH g AS (SELECT MAX(epoch_us(ts)) AS gm FROM events)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_qround(
               'SUM(exp(-(ln(2.0) / 7.0)'
               ' * ((g.gm - epoch_us(ts)) / 86400000000.0)))', 6
           )} AS decayed_n,
           {sql_qround(
               'SUM(value * exp(-(ln(2.0) / 7.0)'
               ' * ((g.gm - epoch_us(ts)) / 86400000000.0)))', 6
           )} AS decayed_value
    FROM events, g
    GROUP BY event_type
    """,
)
def ts_decayed_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed engagement score per event type
    with a 7-day half-life — the recency-weighted counter feature
    stores keep per key (recommendation freshness, trending rank):
    each event contributes 2^(−age/7d), so the score IS the
    recursive EWMA's closed form, computed as ONE plain aggregate —
    no sequential scan, no window; this is why the decayed-sum form
    (not the recurrence) is the 100 TB shape. Anchored on the global
    max timestamp (replayable on a snapshot; dq_freshness
    convention).

    Age is exact int64 epoch-µs arithmetic; the weight is one
    fixed-shape exp per row (identical IEEE shape both engines —
    ln(2)/7 is an expression, not a rounded literal); the weighted
    sums are the order-dependent floats → qround(6) both sides. Two
    passes — the ts-only anchor max (column-pruned), then one keyed
    aggregate with the 1-row anchor broadcast in.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    g = ev.agg(F.max("us").alias("gm"))
    w = F.exp(
        -(F.log(F.lit(2.0)) / F.lit(7.0))
        * ((F.col("gm") - F.col("us")) / F.lit(86400000000.0))
    )
    return (
        ev.crossJoin(F.broadcast(g))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            qround(F.sum(w), 6).alias("decayed_n"),
            qround(F.sum(F.col("value") * w), 6).alias("decayed_value"),
        )
    )


@query(
    "stat_ljung_box",
    oracle=f"""
    WITH {_ACF_SQL_CTES},
    wide AS (
      SELECT MAX(n) AS n,
             MAX(CASE WHEN lag = 1 THEN acf END) AS r1,
             MAX(CASE WHEN lag = 2 THEN acf END) AS r2,
             MAX(CASE WHEN lag = 3 THEN acf END) AS r3
      FROM acf_rows, s
    )
    SELECT n,
           {sql_qround('r1', 6)} AS acf1,
           {sql_qround('r2', 6)} AS acf2,
           {sql_qround('r3', 6)} AS acf3,
           CASE WHEN n > 3 AND r1 IS NOT NULL AND r2 IS NOT NULL
                     AND r3 IS NOT NULL
                THEN {sql_qround(
                    'CAST(n AS DOUBLE) * (n + 2)'
                    ' * (r1 * r1 / (n - 1) + r2 * r2 / (n - 2)'
                    '    + r3 * r3 / (n - 3))', 6)}
           END AS q_lb
    FROM wide
    """,
)
def stat_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau Q over the hourly event-count series at
    lags 1-3: Q = n(n+2)·Σ ρ_k²/(n−k) — the is-this-white-noise test
    a forecasting pipeline runs on model RESIDUALS before trusting
    prediction intervals (large Q ⇒ structure remains). Built directly
    on the shared ts_acf moment tables (``_acf_tables`` — one range
    exchange, exact int64 moments), so the marginal cost over ts_acf
    is a 3-row pivot and one fixed-shape expression: the ρ_k² terms
    are written as one left-associated chain on both engines (no
    variable-order float sum), NULL-guarded for n ≤ 3 or a
    zero-variance (constant) series where ρ is undefined."""
    lagged, s = _acf_tables(spark, sf_dir)
    acf = lagged.crossJoin(F.broadcast(s)).select(
        "lag", "n", _acf_expr().alias("acf")
    )
    # GLOBAL aggregate (not groupBy n): a series too short for any
    # lag pair leaves acf empty, and the oracle's GROUP-BY-less wide
    # CTE still emits one NULL row — the groupBy form would emit none
    wide = acf.agg(
        F.max("n").alias("n"),
        F.max(F.when(F.col("lag") == 1, F.col("acf"))).alias("r1"),
        F.max(F.when(F.col("lag") == 2, F.col("acf"))).alias("r2"),
        F.max(F.when(F.col("lag") == 3, F.col("acf"))).alias("r3"),
    )
    n = F.col("n")
    q = (
        n.cast("double")
        * (n + 2)
        * (
            F.col("r1") * F.col("r1") / (n - 1)
            + F.col("r2") * F.col("r2") / (n - 2)
            + F.col("r3") * F.col("r3") / (n - 3)
        )
    )
    return wide.select(
        "n",
        qround(F.col("r1"), 6).alias("acf1"),
        qround(F.col("r2"), 6).alias("acf2"),
        qround(F.col("r3"), 6).alias("acf3"),
        F.when(
            (n > 3)
            & F.col("r1").isNotNull()
            & F.col("r2").isNotNull()
            & F.col("r3").isNotNull(),
            qround(q, 6),
        ).alias("q_lb"),
    )


@query(
    "ts_holt_winters",
    oracle=f"""
    WITH dc AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    arr AS (
      SELECT event_type,
             list(CAST(c AS DOUBLE) ORDER BY day) AS v,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM dc GROUP BY event_type
    ),
    st AS (
      SELECT event_type, n_days,
             CASE WHEN n_days >= 3 THEN
               list_reduce(
                 list_prepend(
                   [v[1], v[2] - v[1]],
                   list_transform(v[3:], x -> [x, CAST(0 AS DOUBLE)])),
                 (acc, x) -> [
                   0.3 * x[1] + 0.7 * (acc[1] + acc[2]),
                   0.1 * (0.3 * x[1] + 0.7 * (acc[1] + acc[2]) - acc[1])
                      + 0.9 * acc[2]])
             WHEN n_days = 2 THEN [v[1], v[2] - v[1]]
             END AS s
      FROM arr
    )
    SELECT event_type, n_days,
           {sql_qround('s[1]', 6)} AS level,
           {sql_qround('s[2]', 6)} AS trend,
           {sql_qround('s[1] + 7.0 * s[2]', 6)} AS forecast_7d
    FROM st
    """,
)
def ts_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear (double) exponential smoothing per event type
    (α=0.3, β=0.1) over the daily-count series: level/trend state
    folded left over the days in order, 7-day-ahead forecast
    l + 7t — the capacity-planning forecast a pipeline publishes per
    metric. A sequential recurrence is NOT a window aggregate: it
    folds via ``aggregate()`` over the per-series day array (the
    ts_lttb/SAX pattern — series are array-sized after the daily
    rollup, ~3.7k elements even for a decade, so per-series state
    fits one row comfortably). Textbook init l₁=x₁, t₁=x₂−x₁, fold
    from x₃; the update expressions are written with the identical
    operand order on both engines (l' appears expanded inside t' on
    BOTH sides), so the fold is bit-identical IEEE before the qround.
    ENGINE QUIRK: DuckDB's list_reduce over STRUCT state evaluates
    the result-struct fields sequentially and rebinds acc's fields as
    they compute — acc.l inside the t-expression already holds the
    NEW level, silently corrupting any two-field recurrence. The
    oracle therefore folds a 2-element LIST state ([l, t]), which
    evaluates against the unmodified accumulator; Spark's aggregate()
    struct fold has no such rebinding.
    Series with <2 days emit NULL state rather than indexing past the
    array (ANSI: try_element_at, DuckDB: NULL out-of-bounds).

    100 TB: the corpus-scale work is the one daily hash aggregate;
    the fold is |series|·|days| arithmetic distributed by series key.
    """
    ev = load_table(spark, sf_dir, "events")
    dc = (
        ev.select("event_type", F.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    arr = dc.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "c"))),
            lambda s: s["c"].cast("double"),
        ).alias("v"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    v = F.col("v")
    l0 = F.try_element_at(v, F.lit(1))
    b0 = F.try_element_at(v, F.lit(2)) - l0
    rest = F.slice(v, 3, F.greatest(F.size(v) - 2, F.lit(0)))
    init = F.struct(l0.alias("l"), b0.alias("t"))

    def _holt_step(acc, x):
        lev = 0.3 * x + 0.7 * (acc["l"] + acc["t"])
        tr = 0.1 * (0.3 * x + 0.7 * (acc["l"] + acc["t"]) - acc["l"]) \
            + 0.9 * acc["t"]
        return F.struct(lev.alias("l"), tr.alias("t"))

    st = arr.select(
        "event_type",
        "n_days",
        F.when(
            F.col("n_days") >= 3, F.aggregate(rest, init, _holt_step)
        )
        .when(F.col("n_days") == 2, init)
        .alias("s"),
    )
    return st.select(
        "event_type",
        "n_days",
        qround(F.col("s.l"), 6).alias("level"),
        qround(F.col("s.t"), 6).alias("trend"),
        qround(F.col("s.l") + 7.0 * F.col("s.t"), 6).alias("forecast_7d"),
    )


@query(
    "ts_rsi",
    oracle=f"""
    WITH dc AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    d AS (
      SELECT event_type, day, c,
             c - LAG(c) OVER (PARTITION BY event_type ORDER BY day)
               AS delta
      FROM dc
    ),
    gl AS (
      SELECT event_type, day,
             CAST(SUM(CASE WHEN delta > 0 THEN delta ELSE 0 END)
                  OVER w AS BIGINT) AS sg,
             CAST(SUM(CASE WHEN delta < 0 THEN -delta ELSE 0 END)
                  OVER w AS BIGINT) AS sl,
             CAST(COUNT(delta) OVER w AS BIGINT) AS nd
      FROM d
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, day, nd,
           CASE WHEN nd > 0 THEN
             CASE WHEN sl = 0 THEN 100.0
                  ELSE {sql_qround(
                      '100.0 - 100.0 / (1.0 + CAST(sg AS DOUBLE) / sl)', 6)}
             END
           END AS rsi
    FROM gl
    """,
)
def ts_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-period RSI over the daily event-count series per type:
    trailing-window gain/loss sums → RSI = 100 − 100/(1 + ΣG/ΣL) —
    the bounded momentum oscillator, here reused as a drift monitor
    (RSI pinned near 100/0 ⇒ the metric only ever rises/falls in the
    window — a canary for counter resets and backfill storms).

    Window sums are EXACT int64 (gains and losses summed separately,
    never an avg float); the only division is the final fixed-shape
    expression. The all-losses-zero window emits the standard 100.0
    (not a DIVIDE_BY_ZERO); the first row of each series (no delta
    yet) emits NULL. One shuffle on event_type, one window pass with
    a bounded ROWS frame — O(1) state per row at any series length.
    """
    ev = load_table(spark, sf_dir, "events")
    dc = (
        ev.select("event_type", F.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w_lag = Window.partitionBy("event_type").orderBy("day")
    d = dc.withColumn("delta", F.col("c") - F.lag("c").over(w_lag))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-13, 0)
    )
    gl = d.select(
        "event_type",
        "day",
        F.sum(F.when(F.col("delta") > 0, F.col("delta")).otherwise(0))
        .over(w)
        .cast("long")
        .alias("sg"),
        F.sum(F.when(F.col("delta") < 0, -F.col("delta")).otherwise(0))
        .over(w)
        .cast("long")
        .alias("sl"),
        F.count("delta").over(w).cast("long").alias("nd"),
    )
    rsi = F.when(F.col("sl") == 0, F.lit(100.0)).otherwise(
        qround(
            100.0 - 100.0 / (1.0 + F.col("sg").cast("double") / F.col("sl")),
            6,
        )
    )
    return gl.select(
        "event_type",
        "day",
        "nd",
        F.when(F.col("nd") > 0, rsi).alias("rsi"),
    )


@query(
    "ts_interpolate_linear",
    oracle=f"""
    WITH hc AS (
      SELECT event_type, epoch_us(ts) // 3600000000 AS h,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, MIN(h) AS lo, MAX(h) AS hi
      FROM hc GROUP BY event_type
    ),
    grid AS (
      SELECT b.event_type, gs.h
      FROM bounds b, LATERAL unnest(generate_series(b.lo, b.hi)) AS gs(h)
    ),
    j AS (
      SELECT g.event_type, g.h, hc.c
      FROM grid g LEFT JOIN hc
        ON hc.event_type = g.event_type AND hc.h = g.h
    ),
    nb AS (
      SELECT event_type, h, c,
             LAST_VALUE(CASE WHEN c IS NOT NULL THEN c END IGNORE NULLS)
               OVER wp AS pv,
             LAST_VALUE(CASE WHEN c IS NOT NULL THEN h END IGNORE NULLS)
               OVER wp AS ph,
             FIRST_VALUE(CASE WHEN c IS NOT NULL THEN c END IGNORE NULLS)
               OVER wn AS nv,
             FIRST_VALUE(CASE WHEN c IS NOT NULL THEN h END IGNORE NULLS)
               OVER wn AS nh
      FROM j
      WINDOW
        wp AS (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        wn AS (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, CAST(h AS BIGINT) AS h,
           c IS NOT NULL AS observed,
           CASE WHEN c IS NOT NULL THEN CAST(c AS DOUBLE)
                WHEN nh = ph THEN CAST(pv AS DOUBLE)
                ELSE {sql_qround(
                    'CAST(pv AS DOUBLE) + CAST(nv - pv AS DOUBLE)'
                    ' * (h - ph) / (nh - ph)', 6)}
           END AS value
    FROM nb
    """,
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over the hourly grid per event type:
    missing hours take pv + (nv−pv)·(h−ph)/(nh−ph) between the
    nearest observed neighbors — the gap-repair step before any
    model that assumes a regular series (ts_gap_fill's zero-fill
    sibling; zeros say "nothing happened", interpolation says "we
    weren't looking"). Observed hours pass through exactly, and the
    grid spans min..max observed per series so every gap has both
    neighbors (nh=ph only for a single-row partition edge case,
    which falls back to the flat value — no divide-by-zero path).

    Plan: one hourly hash aggregate (corpus-scale), a broadcast-sized
    bounds table exploded into the grid, one left join, and TWO
    bounded window passes (last-non-null backward, first-non-null
    forward — frame-bounded running state, not a per-gap scan). The
    interpolating ratio is integers-in, one division, qround'd."""
    ev = load_table(spark, sf_dir, "events")
    hc = (
        ev.select(
            "event_type",
            F.expr(
                "unix_micros(cast(ts as timestamp)) div 3600000000"
            ).alias("h"),
        )
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .transform(pin)
    )
    bounds = hc.groupBy("event_type").agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    )
    grid = bounds.select(
        "event_type",
        F.explode(F.sequence("lo", "hi")).alias("h"),
    )
    j = grid.join(hc, ["event_type", "h"], "left")
    wp = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    nb = j.select(
        "event_type",
        "h",
        "c",
        F.last(F.col("c"), ignorenulls=True).over(wp).alias("pv"),
        F.last(
            F.when(F.col("c").isNotNull(), F.col("h")), ignorenulls=True
        )
        .over(wp)
        .alias("ph"),
        F.first(F.col("c"), ignorenulls=True).over(wn).alias("nv"),
        F.first(
            F.when(F.col("c").isNotNull(), F.col("h")), ignorenulls=True
        )
        .over(wn)
        .alias("nh"),
    )
    interp = qround(
        F.col("pv").cast("double")
        + (F.col("nv") - F.col("pv")).cast("double")
        * (F.col("h") - F.col("ph"))
        / (F.col("nh") - F.col("ph")),
        6,
    )
    return nb.select(
        "event_type",
        F.col("h").cast("long").alias("h"),
        F.col("c").isNotNull().alias("observed"),
        F.when(F.col("c").isNotNull(), F.col("c").cast("double"))
        .when(F.col("nh") == F.col("ph"), F.col("pv").cast("double"))
        .otherwise(interp)
        .alias("value"),
    )


def _daily_click_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared (d, x, y) daily click/view count table for the two
    correlation diagnostics (ts_rolling_corr's trailing window,
    ts_crosscorr_lags' lag axis) — one source of truth for the series
    definition; localCheckpointed because both consumers feed it to a
    self-join."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.datediff(
                F.date_trunc("day", "ts").cast("date"),
                F.lit("1970-01-01").cast("date"),
            ).alias("d"),
            F.when(F.col("event_type") == "click", 1).otherwise(0).alias(
                "xi"
            ),
            F.when(F.col("event_type") == "view", 1).otherwise(0).alias(
                "yi"
            ),
        )
        .groupBy("d")
        .agg(
            F.sum("xi").cast("long").alias("x"),
            F.sum("yi").cast("long").alias("y"),
        )
        .transform(pin)
    )


def _pearson_from_moments():
    """The guarded fixed-shape Pearson over exact int64 window moments
    (n, sx, sy, sxy, sxx, syy) — written as two sequential sqrt
    divisions so operand order is identical on both engines; NULL for
    either zero variance. Returns (corr_expr, guard_expr)."""
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    corr = (
        (
            F.col("n").cast("double") * F.col("sxy")
            - F.col("sx").cast("double") * F.col("sy")
        )
        / F.sqrt(
            F.col("n").cast("double") * F.col("sxx")
            - F.col("sx").cast("double") * F.col("sx")
        )
        / F.sqrt(
            F.col("n").cast("double") * F.col("syy")
            - F.col("sy").cast("double") * F.col("sy")
        )
    )
    return corr, (vx > 0) & (vy > 0)


@query(
    "ts_rolling_corr",
    oracle=f"""
    WITH dx AS (
      SELECT (CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01') AS d,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    pairs AS (
      SELECT a.d, b.x, b.y
      FROM dx a JOIN dx b ON b.d BETWEEN a.d - 13 AND a.d
    ),
    m AS (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM pairs GROUP BY d
    )
    SELECT CAST(d AS BIGINT) AS d, n,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN {sql_qround(
                    '(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)'
                    ' / sqrt(CAST(n AS DOUBLE) * sxx'
                    '        - CAST(sx AS DOUBLE) * sx)'
                    ' / sqrt(CAST(n AS DOUBLE) * syy'
                    '        - CAST(sy AS DOUBLE) * sy)', 6)}
           END AS corr
    FROM m
    """,
)
def ts_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-14-day rolling Pearson correlation between the daily
    'click' and 'view' count series — the does-engagement-track-
    traffic monitor; a correlation break flags instrumentation drift
    between two pipelines that should co-move.

    The single global series cannot use a window (the repo's
    global-window ban — one unpartitioned ordered window serializes
    on a single task); instead the trailing frame is a BAND
    SELF-JOIN on the epoch-day integer (b.d ∈ [a.d−13, a.d]) over
    the |days|-row daily table — O(14·|days|) pairs, metadata-sized,
    trivially hash-partitioned. All six window moments are exact
    int64; the correlation is one guarded fixed-shape expression
    (either variance 0 → NULL, not DIVIDE_BY_ZERO). Written as two
    sequential sqrt divisions on both engines so the operand order
    cannot differ."""
    dx = _daily_click_view(spark, sf_dir)
    a, b = dx.alias("a"), dx.alias("b")
    m = (
        a.join(
            b,
            (F.col("b.d") >= F.col("a.d") - 13)
            & (F.col("b.d") <= F.col("a.d")),
        )
        .groupBy(F.col("a.d").alias("d"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("b.x").cast("long").alias("sx"),
            F.sum("b.y").cast("long").alias("sy"),
            F.sum(F.col("b.x") * F.col("b.y")).cast("long").alias("sxy"),
            F.sum(F.col("b.x") * F.col("b.x")).cast("long").alias("sxx"),
            F.sum(F.col("b.y") * F.col("b.y")).cast("long").alias("syy"),
        )
    )
    corr, ok = _pearson_from_moments()
    return m.select(
        F.col("d").cast("long").alias("d"),
        "n",
        F.when(ok, qround(corr, 6)).alias("corr"),
    )


_SEAS_DECOMP_SQL = f"""
    WITH dc AS (
      SELECT event_type,
             (CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01') AS d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    tr AS (
      SELECT event_type, d, c,
             CAST(SUM(c) OVER w AS BIGINT) AS sum7,
             CAST(COUNT(*) OVER w AS BIGINT) AS cnt7
      FROM dc
      WINDOW w AS (PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    full7 AS (
      SELECT event_type, d, c, sum7, d % 7 AS dow,
             7 * c - sum7 AS detr7
      FROM tr WHERE cnt7 = 7
    ),
    seas AS (
      SELECT event_type, dow,
             CAST(SUM(detr7) AS BIGINT) AS s_detr,
             CAST(COUNT(*) AS BIGINT) AS n_dow
      FROM full7 GROUP BY event_type, dow
    )
    SELECT f.event_type, CAST(f.d AS BIGINT) AS d, f.c,
           {sql_qround('CAST(f.sum7 AS DOUBLE) / 7.0', 6)} AS trend,
           {sql_qround(
               'CAST(s.s_detr AS DOUBLE) / (7.0 * s.n_dow)', 6)} AS seasonal,
           {sql_qround(
               'f.c - CAST(f.sum7 AS DOUBLE) / 7.0'
               ' - CAST(s.s_detr AS DOUBLE) / (7.0 * s.n_dow)', 6)}
               AS residual
    FROM full7 f JOIN seas s
      ON s.event_type = f.event_type AND s.dow = f.dow
    """


@query(
    "ts_seasonal_decompose",
    oracle=_SEAS_DECOMP_SQL,
)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of the daily series per event
    type: trend = centered 7-day moving average (full windows only),
    weekly seasonal = day-of-week mean of the detrended series,
    residual = remainder — the observability triage (is the spike
    trend, weekday pattern, or anomaly?) and the de-seasonalizing
    step before anomaly scoring (ts_anomaly_zscore on residuals
    beats it on raw counts).

    Integer discipline: the detrended value is kept as 7c − Σ₇
    (EXACT int64 — dividing first would make the day-of-week mean a
    variable-order float sum), so the seasonal component is a single
    division of two exact sums and the residual one fixed-shape
    expression. Day-of-week = epoch-day mod 7 on both engines (Spark
    dayofweek() is 1-based-Sunday, DuckDB 0-based — the mod form
    sidesteps the convention mismatch). One partitioned bounded-frame
    window + one (type, dow)-keyed aggregate joined back."""
    ev = load_table(spark, sf_dir, "events")
    dc = (
        ev.select(
            "event_type",
            F.datediff(
                F.date_trunc("day", "ts").cast("date"),
                F.lit("1970-01-01").cast("date"),
            ).alias("d"),
        )
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-3, 3)
    )
    tr = dc.select(
        "event_type",
        "d",
        "c",
        F.sum("c").over(w).cast("long").alias("sum7"),
        F.count(F.lit(1)).over(w).cast("long").alias("cnt7"),
    )
    full7 = (
        tr.filter(F.col("cnt7") == 7)
        .select(
            "event_type",
            "d",
            "c",
            "sum7",
            (F.col("d") % 7).alias("dow"),
            (7 * F.col("c") - F.col("sum7")).alias("detr7"),
        )
        .transform(pin)
    )
    seas = full7.groupBy("event_type", "dow").agg(
        F.sum("detr7").cast("long").alias("s_detr"),
        F.count(F.lit(1)).cast("long").alias("n_dow"),
    )
    trend = F.col("sum7").cast("double") / 7.0
    seasonal = F.col("s_detr").cast("double") / (7.0 * F.col("n_dow"))
    return full7.join(F.broadcast(seas), ["event_type", "dow"]).select(
        "event_type",
        F.col("d").cast("long").alias("d"),
        "c",
        qround(trend, 6).alias("trend"),
        qround(seasonal, 6).alias("seasonal"),
        qround(F.col("c") - trend - seasonal, 6).alias("residual"),
    )


@query(
    "ts_peaks",
    oracle="""
    WITH dc AS (
      SELECT event_type,
             (CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01') AS d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    nb AS (
      SELECT event_type, d, c,
             LAG(c) OVER w AS prev_c,
             LEAD(c) OVER w AS next_c
      FROM dc
      WINDOW w AS (PARTITION BY event_type ORDER BY d)
    )
    SELECT event_type, CAST(d AS BIGINT) AS d, c,
           CAST(prev_c AS BIGINT) AS prev_c,
           CAST(next_c AS BIGINT) AS next_c,
           CAST(c - GREATEST(prev_c, next_c) AS BIGINT) AS height
    FROM nb
    WHERE prev_c IS NOT NULL AND next_c IS NOT NULL
      AND c > prev_c AND c > next_c
    """,
)
def ts_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict local maxima of the daily count series per event type
    (c > both neighbors), with the peak height over the larger
    neighbor — the spike inventory an incident-review pipeline joins
    against deploy/campaign calendars (ts_anomaly_zscore scores
    GLOBAL deviation; a local peak can be anomalous at perfectly
    normal absolute levels). Interior days only: series edges have
    one neighbor and are excluded rather than half-compared.

    One partitioned window pass (LAG+LEAD in the same frame), exact
    int64 comparisons — no float enters at any point, so the
    engines cannot disagree on what a peak is."""
    ev = load_table(spark, sf_dir, "events")
    dc = (
        ev.select(
            "event_type",
            F.datediff(
                F.date_trunc("day", "ts").cast("date"),
                F.lit("1970-01-01").cast("date"),
            ).alias("d"),
        )
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w = Window.partitionBy("event_type").orderBy("d")
    nb = dc.select(
        "event_type",
        "d",
        "c",
        F.lag("c").over(w).alias("prev_c"),
        F.lead("c").over(w).alias("next_c"),
    )
    return (
        nb.filter(
            F.col("prev_c").isNotNull()
            & F.col("next_c").isNotNull()
            & (F.col("c") > F.col("prev_c"))
            & (F.col("c") > F.col("next_c"))
        )
        .select(
            "event_type",
            F.col("d").cast("long").alias("d"),
            "c",
            F.col("prev_c").cast("long").alias("prev_c"),
            F.col("next_c").cast("long").alias("next_c"),
            (F.col("c") - F.greatest("prev_c", "next_c"))
            .cast("long")
            .alias("height"),
        )
    )


@query(
    "ts_lateness_histogram",
    oracle=f"""
    WITH mx AS (SELECT MAX(epoch_us(ts)) AS max_us FROM events),
    lat AS (
        SELECT (mx.max_us - epoch_us(ts)) // 86400000000 AS bucket_days
        FROM events, mx
    ),
    hist AS (
        SELECT bucket_days, CAST(COUNT(*) AS BIGINT) AS n
        FROM lat GROUP BY bucket_days
    ),
    cum AS (
        SELECT bucket_days, n,
               CAST(SUM(n) OVER (ORDER BY bucket_days
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS cum_n,
               CAST(SUM(n) OVER () AS BIGINT) AS total
        FROM hist
    )
    SELECT CAST(bucket_days AS BIGINT) AS bucket_days, n, cum_n,
           {sql_qround('CAST(cum_n AS DOUBLE) / total', 6)} AS cum_frac
    FROM cum
    """,
)
def ts_lateness_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-age histogram against the newest event (day buckets) with
    the cumulative fraction — read bottom-up, this is the LATENESS CDF
    that tunes a streaming watermark: "cum_frac ≥ 0.999 by bucket 2"
    means a 2-day watermark delay loses <0.1% of events, which is
    exactly the number `withWatermark` needs and nobody measures.
    Anchored on the replayable global max ts (dq_freshness's anchor
    convention — no wall clock), integer µs→day arithmetic.

    The histogram is one corpus-scale hash aggregate to |days| rows;
    the cumulative pass routes through ``distributed_cumsum`` (range
    exchange + broadcast offsets — the no-global-window contract) and
    the grand total is re-aggregated from the bucket table, never a
    second corpus scan."""
    from etl_geonames_spark.operators.relational import distributed_cumsum

    ev = load_table(spark, sf_dir, "events").select(
        F.expr("unix_micros(cast(ts as timestamp))").alias("us")
    )
    mx = ev.agg(F.max("us").alias("max_us"))
    hist = (
        ev.crossJoin(F.broadcast(mx))
        .select(
            F.expr("(max_us - us) div 86400000000").alias("bucket_days")
        )
        .groupBy("bucket_days")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .transform(pin)
    )
    total = hist.agg(F.sum("n").cast("long").alias("total"))
    cum = distributed_cumsum(hist, ["bucket_days"], "n", "cum_n")
    return (
        cum.crossJoin(F.broadcast(total))
        .select(
            F.col("bucket_days").cast("long").alias("bucket_days"),
            "n",
            F.col("cum_n").cast("long").alias("cum_n"),
            qround(
                F.col("cum_n").cast("double") / F.col("total"), 6
            ).alias("cum_frac"),
        )
    )


_PERIOD_CANDIDATES = [6, 12, 24]


def _period_sql(p: int) -> str:
    """One candidate period's strength CTE for ts_period_detect."""
    return f"""
    ph{p} AS (
      SELECT h % {p} AS phase, CAST(COUNT(*) AS BIGINT) AS np,
             CAST(SUM(c) AS BIGINT) AS sp
      FROM hc GROUP BY 1
    ),
    st{p} AS (
      SELECT CAST({p} AS BIGINT) AS period,
             CAST(COUNT(*) AS BIGINT) AS n_phases,
             SUM(CAST(sp AS DOUBLE) * sp / np) AS ssb_part
      FROM ph{p}
    )"""


@query(
    "ts_period_detect",
    oracle=f"""
    WITH hc AS (
      SELECT epoch_us(ts) // 3600000000 AS h,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS BIGINT) AS s,
             CAST(SUM(c * c) AS BIGINT) AS ss
      FROM hc
    ),
    {",".join(_period_sql(p) for p in _PERIOD_CANDIDATES)},
    u AS ({" UNION ALL ".join(
        f"SELECT * FROM st{p}" for p in _PERIOD_CANDIDATES)})
    SELECT u.period, u.n_phases,
           CASE WHEN g.n * CAST(g.ss AS DOUBLE)
                     - CAST(g.s AS DOUBLE) * g.s <> 0
                THEN {sql_qround(
                    '(g.n * u.ssb_part - CAST(g.s AS DOUBLE) * g.s)'
                    ' / (g.n * CAST(g.ss AS DOUBLE)'
                    '    - CAST(g.s AS DOUBLE) * g.s)', 6)}
           END AS strength
    FROM u, g
    """,
)
def ts_period_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Periodicity detection by integer phase folding: for each
    candidate period p ∈ 6/12/24 hours, fold the hourly event-count
    series on h mod p and report the fraction of total variance
    explained by the phase means — strength = SSB/SST ∈ [0, 1], the
    trig-free periodogram (a strong p=24 says "daily cycle"; the
    argmax across rows is the detected period). Folding replaces
    sin/cos correlation deliberately: libm trig differs across
    engines in ulps, integer folding doesn't. Sibling of
    ts_seasonal_profile (which PROFILES one assumed period; this
    DETECTS which period holds).

    SSB via the moment identity n·Σ(S_φ²/n_φ) − S² over n·SS − S²:
    all moments exact int64; the ≤ p-term Σ S_φ²/n_φ float sum is
    accumulation-order-dependent across engines — qround(6) absorbs
    it at fixture magnitudes (the stat_anova_oneway precedent,
    ADVICE r4: at ~1e10 sums the grid sits below double ulp; same
    documented caveat). Constant series → SST = 0 → NULL (ANSI
    guard). Scale: one fact aggregate to |hours| rows; each fold is
    a ≤ 24-key re-aggregate of that table."""
    ev = load_table(spark, sf_dir, "events")
    hc = (
        ev.select(
            F.expr(
                "unix_micros(cast(ts as timestamp)) div 3600000000"
            ).alias("h")
        )
        .groupBy("h")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .transform(pin)  # one fold per candidate period + globals
    )
    g = hc.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
    )
    from functools import reduce

    folds = []
    for p in _PERIOD_CANDIDATES:
        ph = (
            hc.groupBy((F.col("h") % p).alias("phase"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("np"),
                F.sum("c").cast("long").alias("sp"),
            )
        )
        folds.append(
            ph.agg(
                F.lit(p).cast("long").alias("period"),
                F.count(F.lit(1)).cast("long").alias("n_phases"),
                F.sum(
                    F.col("sp").cast("double") * F.col("sp") / F.col("np")
                ).alias("ssb_part"),
            )
        )
    u = reduce(lambda x, y: x.unionAll(y), folds)
    sst = (
        F.col("n") * F.col("ss").cast("double")
        - F.col("s").cast("double") * F.col("s")
    )
    ssb = (
        F.col("n") * F.col("ssb_part")
        - F.col("s").cast("double") * F.col("s")
    )
    return u.crossJoin(F.broadcast(g)).select(
        "period",
        "n_phases",
        F.when(sst != 0, qround(ssb / sst, 6)).alias("strength"),
    )


_HURST_MS = [8, 16, 32, 64]


def _hurst_blocks(idx: DataFrame, m: int) -> DataFrame:
    """Per-block (r_int, v_int) integer R/S cores for block size m —
    factored so the plan contract can pin the block-partitioned
    window shape on an UN-checkpointed rebuild (the query checkpoints
    its 4-row union, which truncates this stage out of the final
    plan; see the adamic-adar pattern in the repo working notes)."""
    blk = ((F.col("t") - 1) / F.lit(m)).cast("long")
    bl = idx.select(
        "c",
        "t",
        blk.alias("blk"),
        ((F.col("t") - 1) % m + 1).alias("iloc"),
    )
    w_cum = (
        Window.partitionBy("blk")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("blk")
    bl = bl.select(
        "blk",
        "iloc",
        "c",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("s"),
        F.sum(F.col("c") * F.col("c")).over(w_all).alias("qq"),
        F.count(F.lit(1)).over(w_all).alias("cnt"),
    ).filter(F.col("cnt") == m)
    dev = F.lit(m) * F.col("cum") - F.col("iloc") * F.col("s")
    return bl.groupBy("blk").agg(
        (F.max(dev) - F.min(dev)).cast("long").alias("r_int"),
        (F.lit(m) * F.max("qq") - F.max("s") * F.max("s"))
        .cast("long")
        .alias("v_int"),
    ).filter(F.col("v_int") > 0)


def _hurst_block_sql(m: int) -> str:
    return f"""
    b{m} AS (
      SELECT ((t - 1) // {m}) AS blk, c, t,
             ((t - 1) % {m}) + 1 AS iloc,
             SUM(c) OVER (PARTITION BY ((t - 1) // {m}) ORDER BY t
                          ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(c) OVER (PARTITION BY ((t - 1) // {m})) AS s,
             SUM(c * c) OVER (PARTITION BY ((t - 1) // {m})) AS qq,
             COUNT(*) OVER (PARTITION BY ((t - 1) // {m})) AS cnt
      FROM idx
    ),
    g{m} AS (
      SELECT blk,
             CAST(MAX({m} * cum - iloc * s)
                  - MIN({m} * cum - iloc * s) AS BIGINT) AS r_int,
             CAST({m} * MAX(qq) - MAX(s) * MAX(s) AS BIGINT) AS v_int
      FROM b{m} WHERE cnt = {m} GROUP BY blk
    ),
    p{m} AS (
      SELECT CAST({m} AS BIGINT) AS block_size,
             CAST(COUNT(*) AS BIGINT) AS n_blocks,
             {sql_qround(
                 "AVG(" + sql_qround(
                     "ln(r_int / sqrt(CAST(v_int AS DOUBLE)))", 6)
                 + ")", 6)} AS log_rs
      FROM g{m} WHERE v_int > 0
    )"""


@query(
    "ts_hurst_rs",
    oracle=f"""
    WITH hc AS (
      SELECT epoch_us(ts) // 3600000000 AS h,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    idx AS (
      SELECT c, CAST(ROW_NUMBER() OVER (ORDER BY h) AS BIGINT) AS t
      FROM hc
    ),
    {",".join(_hurst_block_sql(m) for m in _HURST_MS)},
    pts AS ({" UNION ALL ".join(f"SELECT * FROM p{m}" for m in _HURST_MS)}),
    sl AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM({sql_qround('x * y', 9)}) AS sxy,
             SUM({sql_qround('x * x', 9)}) AS sxx
      FROM (SELECT {sql_qround('ln(CAST(block_size AS DOUBLE))', 9)} AS x,
                   log_rs AS y
            FROM pts WHERE log_rs IS NOT NULL AND n_blocks > 0) z
    )
    SELECT pts.block_size, pts.n_blocks, pts.log_rs,
           CASE WHEN sl.k >= 2
                     AND sl.k * sl.sxx - sl.sx * sl.sx <> 0
                THEN {sql_qround(
                    '(sl.k * sl.sxy - sl.sx * sl.sy)'
                    ' / (sl.k * sl.sxx - sl.sx * sl.sx)', 6)}
           END AS hurst
    FROM pts, sl
    """,
)
def ts_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent by rescaled-range (R/S) analysis (Hurst 1951 /
    Mandelbrot-Wallis 1969) over the hourly event-count series: for
    block sizes m ∈ 8/16/32/64, each full block contributes
    R/S = (max−min of mean-adjusted prefix sums) / (population sd);
    the slope of E[ln R/S] against ln m estimates H — H ≈ 0.5 is
    memoryless traffic, H > 0.5 long-range dependence (bursts
    cluster: capacity planning must NOT assume Poisson), H < 0.5
    mean reversion. Complements ts_acf (fixed-lag correlation) and
    ts_fano_burstiness (one window scale) with the ACROSS-scales
    signature.

    Integer core: with iloc the within-block position and S the block
    sum, the mean-adjusted prefix sum scaled by m is
    m·cum − iloc·S — exact int64; R·m = max−min of that, and
    (m·sd)² = m·Σc² − S², so R/S = R_int/√v_int with both arguments
    exact integers. Floats appear only in ln/√ (qround(6) per block,
    then the across-block average re-qrounds) and the 4-point
    regression (fixed-shape, qround at emit). Partial tail blocks
    and zero-variance blocks are excluded (contractual; a
    zero-variance block has R = 0 and ln would blow up).

    Shape: one fact-scale hourly aggregate, then |hours|-row windows
    PARTITIONED BY BLOCK (never global — the observed-order index
    comes from distributed_rank, same as ts_acf), per-block
    aggregates, a ≤4-row union and a 1-row regression broadcast
    back. The idx table is localCheckpointed: four block sizes
    consume it."""
    from etl_geonames_spark.operators.relational import distributed_rank

    ev = load_table(spark, sf_dir, "events")
    hc = (
        ev.select(
            F.expr(
                "unix_micros(cast(ts as timestamp)) div 3600000000"
            ).alias("h")
        )
        .groupBy("h")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .transform(pin)
    )
    idx = (
        distributed_rank(hc, ["h"])
        .select("c", F.col("_grn").cast("long").alias("t"))
        .transform(pin)
    )
    pts = None
    for m in _HURST_MS:
        g = _hurst_blocks(idx, m)
        p = g.agg(
            F.lit(m).cast("long").alias("block_size"),
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            qround(
                F.avg(
                    qround(
                        F.log(
                            F.col("r_int")
                            / F.sqrt(F.col("v_int").cast("double"))
                        ),
                        6,
                    )
                ),
                6,
            ).alias("log_rs"),
        )
        pts = p if pts is None else pts.unionAll(p)
    pts = pts.transform(pin)
    # the 4 regression terms are pre-quantized to the 1e-9 grid before
    # summing (x = ln(8/16/32/64) are constants, y is already on the
    # 1e-6 grid): Spark's partial-aggregation order over the 4-row
    # union can differ from DuckDB's sequential sum, and raw-product
    # sums drifting a last ulp exactly at a .0000005 qround boundary
    # would flip the emitted hurst (ADVICE r6 item 2; the
    # sample_weighted_es float-grid discipline).
    z = pts.filter(
        F.col("log_rs").isNotNull() & (F.col("n_blocks") > 0)
    ).select(
        qround(F.log(F.col("block_size").cast("double")), 9).alias("x"),
        F.col("log_rs").alias("y"),
    )
    sl = z.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(qround(F.col("x") * F.col("y"), 9)).alias("sxy"),
        F.sum(qround(F.col("x") * F.col("x"), 9)).alias("sxx"),
    )
    den = F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    hurst = F.when(
        (F.col("k") >= 2) & (den != 0),
        qround(
            (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / den,
            6,
        ),
    )
    return pts.crossJoin(F.broadcast(sl)).select(
        "block_size", "n_blocks", "log_rs", hurst.alias("hurst")
    )


_IG_CELL_US = 6 * 3600 * 1000000  # 6-hour grid cells
_IG_MIN_OVERLAP_US = 30 * 60 * 1000000  # report overlaps >= 30 min


@query(
    "join_interval_grid",
    oracle=f"""
    WITH iv AS (
        SELECT user_id, event_type,
               MIN(ts) AS lo, MAX(ts) AS hi
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id, event_type, date_trunc('day', ts)
    )
    SELECT a.event_type, a.user_id AS user_a, b.user_id AS user_b,
           CAST(COUNT(*) AS BIGINT) AS n_overlaps,
           CAST(SUM(epoch_us(LEAST(a.hi, b.hi))
                    - epoch_us(GREATEST(a.lo, b.lo)))
                AS BIGINT) AS total_overlap_us,
           CAST(MAX(epoch_us(LEAST(a.hi, b.hi))
                    - epoch_us(GREATEST(a.lo, b.lo)))
                AS BIGINT) AS max_overlap_us
    FROM iv a JOIN iv b
      ON a.event_type = b.event_type AND a.user_id < b.user_id
     AND a.lo <= b.hi AND b.lo <= a.hi
    WHERE epoch_us(LEAST(a.hi, b.hi)) - epoch_us(GREATEST(a.lo, b.lo))
          >= {_IG_MIN_OVERLAP_US}
    GROUP BY a.event_type, a.user_id, b.user_id
    """,
)
def join_interval_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join WITHOUT an equi key, by grid-cell
    decomposition — the temporal sibling of geo_grid_join: daily
    per-user PURCHASE-session intervals are paired ACROSS USERS
    wherever they overlap by ≥ 30 minutes, aggregated to CO-ACTIVITY
    EDGES — per (type, user pair) the conflict count and total/max
    overlap (the weighted edge list a co-presence graph ingests; the
    aggregate also keeps output pair-bounded, not occurrence-bounded
    — ~120k raw overlap rows at sf0.1 collapse to per-pair edges;
    the all-types variant produced 606k and 5s walls, so the scope
    is one session type by contract). join_interval_overlap
    rides its user_id equi key; here no key exists, and the naive
    plan is an O(n²) theta join. The grid fix: each interval explodes
    to the 6-hour cells it covers (day-bounded intervals span ≤ 4),
    candidates pair inside a (type, cell) hash-join cell, and
    exactly-once output is restored by ATTRIBUTION — a pair only
    emits in the cell containing its overlap start (both engines
    agree on that cell by exact integer division of epoch
    microseconds). The oracle states the same semantics as the plain
    quadratic overlap join — correct at oracle scale, which is the
    point: the grid form is the SAME relation, just joinable.

    100 TB shape: explode factor ≤ 4; the shuffle carries (type,
    cell)-keyed interval fragments; within-cell pairing is bounded by
    concurrent-interval count per cell (the data's true conflict
    density — irreducible for this output), and the ≥ 30 min gate is
    an exact-int64 post-predicate. Skewed cells (a flash-crowd hour)
    split under AQE like any hash join."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    iv = (
        ev.groupBy(
            "user_id", "event_type", F.date_trunc("day", "ts").alias("d")
        )
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .drop("d")
        .select(
            "user_id",
            "event_type",
            "lo",
            "hi",
            F.expr(
                f"unix_micros(cast(lo as timestamp)) div {_IG_CELL_US}"
            ).alias("cell_lo"),
            F.expr(
                f"unix_micros(cast(hi as timestamp)) div {_IG_CELL_US}"
            ).alias("cell_hi"),
        )
    )
    cells = iv.select(
        "user_id",
        "event_type",
        "lo",
        "hi",
        F.explode(F.sequence("cell_lo", "cell_hi")).alias("cell"),
    )
    a = cells.select(
        F.col("event_type"),
        F.col("cell"),
        F.col("user_id").alias("user_a"),
        F.col("lo").alias("lo_a"),
        F.col("hi").alias("hi_a"),
    )
    b = cells.select(
        F.col("event_type").alias("type_b"),
        F.col("cell").alias("cell_b"),
        F.col("user_id").alias("user_b"),
        F.col("lo").alias("lo_b"),
        F.col("hi").alias("hi_b"),
    )
    overlap_us = F.expr(
        "unix_micros(cast(least(hi_a, hi_b) as timestamp))"
        " - unix_micros(cast(greatest(lo_a, lo_b) as timestamp))"
    )
    start_cell = F.expr(
        "unix_micros(cast(greatest(lo_a, lo_b) as timestamp))"
        f" div {_IG_CELL_US}"
    )
    return (
        a.join(
            b,
            (F.col("event_type") == F.col("type_b"))
            & (F.col("cell") == F.col("cell_b"))
            & (F.col("user_a") < F.col("user_b"))
            & (F.col("lo_a") <= F.col("hi_b"))
            & (F.col("lo_b") <= F.col("hi_a")),
        )
        .filter(F.col("cell") == start_cell)
        .filter(overlap_us >= _IG_MIN_OVERLAP_US)
        .groupBy("event_type", "user_a", "user_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_overlaps"),
            F.sum(overlap_us).cast("long").alias("total_overlap_us"),
            F.max(overlap_us).cast("long").alias("max_overlap_us"),
        )
    )


# equality arms FIRST: point intervals (a single-event group has
# lo = hi) would otherwise fall into meets/met_by — [x,x] vs [x,x]
# is 'equals', not 'meets' (round-6 review, third pass); the ladder
# is exhaustive and mutually exclusive for every lo <= hi pair
_ALLEN_CASE = """
    CASE WHEN lo_a = lo_b AND hi_a = hi_b THEN 'equals'
         WHEN lo_a = lo_b AND hi_a < hi_b THEN 'starts'
         WHEN lo_a = lo_b THEN 'started_by'
         WHEN hi_a = hi_b AND lo_a > lo_b THEN 'finishes'
         WHEN hi_a = hi_b THEN 'finished_by'
         WHEN hi_a = lo_b THEN 'meets'
         WHEN lo_a = hi_b THEN 'met_by'
         WHEN hi_a < lo_b THEN 'before'
         WHEN lo_a > hi_b THEN 'after'
         WHEN lo_a < lo_b AND hi_a < hi_b THEN 'overlaps'
         WHEN lo_a > lo_b AND hi_a > hi_b THEN 'overlapped_by'
         WHEN lo_a > lo_b AND hi_a < hi_b THEN 'during'
         ELSE 'contains' END
"""


@query(
    "ts_allen_relations",
    oracle=f"""
    WITH iv AS (
        SELECT user_id, event_type, MIN(ts) AS lo, MAX(ts) AS hi
        FROM events GROUP BY user_id, event_type
    ),
    pairs AS (
        SELECT a.lo AS lo_a, a.hi AS hi_a, b.lo AS lo_b, b.hi AS hi_b
        FROM iv a JOIN iv b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
    )
    SELECT {_ALLEN_CASE} AS relation,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM pairs GROUP BY 1
    """,
)
def ts_allen_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allen's interval-algebra census (Allen 1983): every pair of a
    user's per-event-type activity spans classified into the 13
    mutually-exclusive temporal relations (before/meets/overlaps/
    starts/during/finishes/equals + inverses) — the temporal-
    REASONING layer above the overlap joins: join_interval_overlap
    asks "do they intersect?", this says HOW they relate, which is
    what validity-interval auditing, process mining and temporal KB
    construction consume. The census shape (counts per relation) is
    the calibration readout: a dataset where 'equals' dominates has
    synchronized feeds; heavy 'meets'/'met_by' mass means
    back-to-back sessions.

    The CASE ladder is exhaustive and mutually exclusive on exact
    timestamp comparisons (microsecond equality is well-defined —
    no float thresholds anywhere), ordered so each arm only needs
    the discriminating predicates; both engines evaluate the
    identical ladder. One user-keyed equi-join carries the shuffle
    (|types|-bounded fan per user); the census is a 13-row
    aggregate. The interval table feeds BOTH join sides —
    localCheckpointed so the events scan + aggregate runs once
    (the working-notes multi-branch rule)."""
    iv = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .transform(pin)
    )
    a = iv.select(
        "user_id",
        F.col("event_type").alias("type_a"),
        F.col("lo").alias("lo_a"),
        F.col("hi").alias("hi_a"),
    )
    b = iv.select(
        F.col("user_id").alias("user_b"),
        F.col("event_type").alias("type_b"),
        F.col("lo").alias("lo_b"),
        F.col("hi").alias("hi_b"),
    )
    pairs = a.join(
        b,
        (F.col("user_id") == F.col("user_b"))
        & (F.col("type_a") < F.col("type_b")),
    )
    return (
        pairs.select(F.expr(_ALLEN_CASE).alias("relation"))
        .groupBy("relation")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


_LN6 = 1.791759469228055  # ln 6 as a shared literal: no libm call


@query(
    "ts_permutation_entropy",
    oracle=f"""
    WITH hc AS (
      SELECT epoch_us(ts) // 3600000000 AS h,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    tri AS (
      SELECT (CASE WHEN a.c <= b.c THEN 4 ELSE 0 END)
             + (CASE WHEN b.c <= c.c THEN 2 ELSE 0 END)
             + (CASE WHEN a.c <= c.c THEN 1 ELSE 0 END) AS pattern
      FROM hc a JOIN hc b ON b.h = a.h + 1 JOIN hc c ON c.h = a.h + 2
    ),
    pc AS (
      SELECT pattern, CAST(COUNT(*) AS BIGINT) AS n_triples
      FROM tri GROUP BY pattern
    ),
    tot AS (SELECT CAST(SUM(n_triples) AS BIGINT) AS n FROM pc),
    ent AS (
      SELECT {sql_qround(
          '-SUM(' + sql_qround(
              'pc.n_triples / CAST(tot.n AS DOUBLE)'
              ' * ln(pc.n_triples / CAST(tot.n AS DOUBLE))', 9) + ')',
          6)} AS h_perm
      FROM pc, tot
    )
    SELECT pc.pattern, pc.n_triples,
           {sql_qround('pc.n_triples / CAST(tot.n AS DOUBLE)', 6)} AS p,
           ent.h_perm,
           {sql_qround(f'ent.h_perm / {_LN6}', 6)} AS h_norm
    FROM pc, tot, ent
    """,
)
def ts_permutation_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation entropy (Bandt & Pompe 2002) of the hourly event-
    count series at embedding dimension 3: classify every consecutive-
    hour triple by its ORDINAL pattern (which of the 6 orderings the
    three counts take, ties resolved to earlier-index-first via ≤) and
    take the Shannon entropy of the pattern distribution. Low H_perm
    means the series' local shapes are predictable (monotone ramps,
    strict daily sawtooth); H_perm near ln 6 means shape-level noise
    — the complexity measure that is immune to monotone rescaling of
    the values (it never looks at magnitudes, only orderings), unlike
    ts_fano_burstiness / ts_entropy_rate which read the counts
    themselves.

    Integer-robust by construction (the deliberate trig/float dodge
    of ts_period_detect extended to complexity): the pattern code
    4·[c0≤c1] + 2·[c1≤c2] + [c0≤c2] is pure int64 comparison — the
    two inconsistent codes (e.g. c0≤c1≤c2 but c0>c2) are impossible,
    leaving exactly the 6 stable-sort orderings. Floats appear only
    in the ≤6-term −Σp·ln p (emit-qround(6), the mm_image_entropy
    precedent) and the ln 6 normalizer.

    Scale: one fact-scale hourly aggregate, then two self-joins on
    consecutive INTEGER hour keys (co-partitioned equi-joins on the
    metadata-sized hour table — no window, no global sort), a ≤6-row
    pattern aggregate, and broadcast totals. Gaps in the hour
    sequence simply contribute no triple (contractual)."""
    ev = load_table(spark, sf_dir, "events")
    hc = (
        ev.select(
            F.expr(
                "unix_micros(cast(ts as timestamp)) div 3600000000"
            ).alias("h")
        )
        .groupBy("h")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .transform(pin)
    )
    a = hc.select(F.col("h"), F.col("c").alias("c0"))
    b = hc.select((F.col("h") - 1).alias("h"), F.col("c").alias("c1"))
    c = hc.select((F.col("h") - 2).alias("h"), F.col("c").alias("c2"))
    tri = a.join(b, "h").join(c, "h").select(
        (
            F.when(F.col("c0") <= F.col("c1"), 4).otherwise(0)
            + F.when(F.col("c1") <= F.col("c2"), 2).otherwise(0)
            + F.when(F.col("c0") <= F.col("c2"), 1).otherwise(0)
        ).alias("pattern")
    )
    pc = tri.groupBy("pattern").agg(
        F.count(F.lit(1)).cast("long").alias("n_triples")
    ).transform(pin)
    tot = pc.agg(F.sum("n_triples").cast("long").alias("n"))
    # each -p ln p term is pre-quantized to the 1e-9 grid before the
    # sum (the ts_hurst_rs float-order discipline): Spark's partial-agg
    # merge order over the <=6 pattern rows differs from DuckDB's
    # sequential SUM, and a raw-term sum drifting a last ulp exactly at
    # a .0000005 boundary would flip the emitted entropy
    ent = pc.crossJoin(F.broadcast(tot)).agg(
        qround(
            -F.sum(
                qround(
                    F.col("n_triples")
                    / F.col("n").cast("double")
                    * F.log(
                        F.col("n_triples") / F.col("n").cast("double")
                    ),
                    9,
                )
            ),
            6,
        ).alias("h_perm"),
        F.max("n").alias("n"),
    )
    return pc.crossJoin(F.broadcast(ent)).select(
        "pattern",
        "n_triples",
        qround(F.col("n_triples") / F.col("n").cast("double"), 6).alias(
            "p"
        ),
        "h_perm",
        qround(F.col("h_perm") / F.lit(_LN6), 6).alias("h_norm"),
    )


_SPC_N = 5        # fixed subgroup size (first 5 events of each day)
_SPC_A2 = 0.577   # X-bar chart factor for n = 5 (public SPC tables)
_SPC_D4 = 2.114   # R chart upper factor for n = 5 (D3 = 0)


@query(
    "ts_spc_xbar_r",
    oracle=f"""
    WITH r AS (
      SELECT event_type, CAST(ts AS DATE) AS day, value,
             ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    sub AS (
      SELECT event_type, day,
             {sql_qround(f'SUM(value) / {_SPC_N}', 6)} AS m5,
             {sql_qround('MAX(value) - MIN(value)', 6)} AS r5
      FROM r WHERE rn <= {_SPC_N}
      GROUP BY event_type, day
      HAVING COUNT(*) = {_SPC_N}
    ),
    lim AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_subgroups,
             {sql_qround('AVG(m5)', 6)} AS xbar,
             {sql_qround('AVG(r5)', 6)} AS rbar
      FROM sub GROUP BY event_type
    )
    SELECT lim.event_type, lim.n_subgroups, lim.xbar, lim.rbar,
           {sql_qround(f'lim.xbar + {_SPC_A2} * lim.rbar', 6)} AS ucl_x,
           {sql_qround(f'lim.xbar - {_SPC_A2} * lim.rbar', 6)} AS lcl_x,
           {sql_qround(f'{_SPC_D4} * lim.rbar', 6)} AS ucl_r,
           CAST(COUNT(*) FILTER (WHERE
               sub.m5 > {sql_qround(f'lim.xbar + {_SPC_A2} * lim.rbar', 6)}
               OR sub.m5 < {sql_qround(f'lim.xbar - {_SPC_A2} * lim.rbar',
                                       6)})
             AS BIGINT) AS n_out_xbar,
           CAST(COUNT(*) FILTER (WHERE
               sub.r5 > {sql_qround(f'{_SPC_D4} * lim.rbar', 6)})
             AS BIGINT) AS n_out_r
    FROM lim JOIN sub ON sub.event_type = lim.event_type
    GROUP BY lim.event_type, lim.n_subgroups, lim.xbar, lim.rbar
    """,
)
def ts_spc_xbar_r(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart X̄-R control charts per event type: fixed n = 5
    subgroups (the first five events of each day, deterministic
    (ts, event_id) order), limits X̄̄ ± A₂·R̄ and D₄·R̄ from the
    public SPC constants for n = 5 — statistical process control's
    answer to "is today's metric out of control or just noisy",
    distinguishing MEAN shifts (X̄ chart) from VOLATILITY shifts
    (R chart), which ts_anomaly_zscore's single global z conflates.
    The rational-subgroup convention (small fixed-size samples at
    regular intervals) is exactly why n is pinned at 5 instead of
    using whole days of varying size.

    Float discipline: subgroup means (5-term sums, sub-grid drift)
    and ranges (max−min, order-free) are qround(6); the grand
    averages and limits are qround(6) single expressions; the
    out-of-control flags compare those IDENTICAL qround'd doubles on
    both engines (the float-threshold rule), so no boundary flip.
    Days with fewer than 5 events drop (contractual).

    100 TB shape: one (event_type, day)-partitioned window to pick
    the subgroup, one subgroup aggregate, a per-type limits
    aggregate broadcast back for the flag count — the subgroup table
    is days×types-sized, metadata next to the fact scan."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    r = ev.select(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        "value",
        "ts",
        "event_id",
    ).withColumn("rn", F.row_number().over(w))
    sub = (
        r.filter(F.col("rn") <= _SPC_N)
        .groupBy("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            qround(F.sum("value") / _SPC_N, 6).alias("m5"),
            qround(F.max("value") - F.min("value"), 6).alias("r5"),
        )
        .filter(F.col("cnt") == _SPC_N)
        .drop("cnt")
        .transform(pin)
    )
    lim = sub.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_subgroups"),
        qround(F.avg("m5"), 6).alias("xbar"),
        qround(F.avg("r5"), 6).alias("rbar"),
    )
    j = sub.join(F.broadcast(lim), "event_type")
    ucl_x = qround(F.col("xbar") + F.lit(_SPC_A2) * F.col("rbar"), 6)
    lcl_x = qround(F.col("xbar") - F.lit(_SPC_A2) * F.col("rbar"), 6)
    ucl_r = qround(F.lit(_SPC_D4) * F.col("rbar"), 6)
    return (
        j.withColumn("ucl_x", ucl_x)
        .withColumn("lcl_x", lcl_x)
        .withColumn("ucl_r", ucl_r)
        .groupBy(
            "event_type", "n_subgroups", "xbar", "rbar",
            "ucl_x", "lcl_x", "ucl_r",
        )
        .agg(
            F.sum(
                F.when(
                    (F.col("m5") > F.col("ucl_x"))
                    | (F.col("m5") < F.col("lcl_x")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_out_xbar"),
            F.sum(F.when(F.col("r5") > F.col("ucl_r"), 1).otherwise(0))
            .cast("long")
            .alias("n_out_r"),
        )
    )


@query(
    "ts_seasonal_strength",
    oracle=f"""
    WITH base AS ({_SEAS_DECOMP_SQL}),
    g AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             var_pop(residual) AS vr,
             var_pop(seasonal + residual) AS vsr,
             var_pop(trend + residual) AS vtr
      FROM base GROUP BY event_type
    )
    SELECT event_type, n_days,
           CASE WHEN {sql_qround('vsr', 6)} > 0 THEN
             {sql_qround('GREATEST(0.0, 1.0 - vr / vsr)', 6)}
           END AS seasonal_strength,
           CASE WHEN {sql_qround('vtr', 6)} > 0 THEN
             {sql_qround('GREATEST(0.0, 1.0 - vr / vtr)', 6)}
           END AS trend_strength
    FROM g
    """,
)
def ts_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal and trend STRENGTH per event type (Hyndman's
    tsfeatures / STL-features definition): F_s = max(0, 1 −
    Var(R)/Var(S+R)) and F_t = max(0, 1 − Var(R)/Var(T+R)) over the
    classical decomposition ts_seasonal_decompose already computes —
    the one-number-per-series answer to "is this series worth
    seasonal modeling?" that feeds model selection (snaive vs drift)
    and dashboard triage, where the decomposition itself is the
    per-day detail view.

    Composition, not duplication: the Spark side CALLS
    ts_seasonal_decompose and aggregates its output; the oracle
    wraps the SAME shared SQL (_SEAS_DECOMP_SQL) — one decomposition
    definition total, so the two ops cannot drift (the r7 shared-
    gradient-SQL pattern). Inputs are the decomposition's qround(6)
    doubles (identical on both engines); var_pop's float sums are
    order-dependent, absorbed by qround(6) on the O(1)-scale
    strengths (the corr/covar precedent). Degenerate series
    (Var(S+R) = 0) NULL out — ANSI guard, and the GATE compares the
    qround(6)'d variance on both engines (the float-predicate
    discipline: each engine's streaming var_pop could straddle 0 on
    a near-constant series built from catastrophic cancellation).

    100 TB: inherits the decomposition's shape (one bounded-frame
    keyed window + one (type, dow) aggregate) plus one |types|-row
    aggregate."""
    base = ts_seasonal_decompose(spark, sf_dir)
    g = base.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.var_pop("residual").alias("vr"),
        F.var_pop(F.col("seasonal") + F.col("residual")).alias("vsr"),
        F.var_pop(F.col("trend") + F.col("residual")).alias("vtr"),
    )
    return g.select(
        "event_type",
        "n_days",
        F.when(
            qround(F.col("vsr"), 6) > 0,
            qround(
                F.greatest(F.lit(0.0), 1.0 - F.col("vr") / F.col("vsr")), 6
            ),
        ).alias("seasonal_strength"),
        F.when(
            qround(F.col("vtr"), 6) > 0,
            qround(
                F.greatest(F.lit(0.0), 1.0 - F.col("vr") / F.col("vtr")), 6
            ),
        ).alias("trend_strength"),
    )


@query(
    "ts_kpss",
    oracle=f"""
    WITH dc AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    arr AS (
      SELECT event_type,
             list(CAST(c AS DOUBLE) ORDER BY day) AS v,
             CAST(COUNT(*) AS INT) AS n
      FROM dc GROUP BY event_type
    ),
    e AS (
      SELECT event_type, n, v,
             list_transform(v, x -> x -
               list_reduce(list_prepend(CAST(0 AS DOUBLE), v),
                           (acc, y) -> acc + y) / n) AS e,
             len(list_filter(generate_series(1, 128),
                 j -> 256 * CAST(n AS BIGINT)
                      >= 100 * CAST(j AS BIGINT) * j * j * j)) AS l
      FROM arr
    ),
    st AS (
      SELECT event_type, n, l,
             list_reduce(
               list_prepend([CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)],
                 list_transform(e, x -> [x, CAST(0 AS DOUBLE)])),
               (acc, xv) -> [acc[1] + xv[1],
                             acc[2] + (acc[1] + xv[1]) * (acc[1] + xv[1])]
             )[2] AS ss,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(e, x -> x * x)), (acc, y) -> acc + y)
               AS g0,
             list_reduce(
               list_prepend(CAST(0 AS DOUBLE),
                 list_transform(generate_series(1, l), j ->
                   CAST(l + 1 - j AS DOUBLE) / (l + 1) *
                   CASE WHEN n > j THEN
                     list_reduce(list_prepend(CAST(0 AS DOUBLE),
                       list_transform(generate_series(1, n - j),
                                      t -> e[t] * e[t + j])),
                       (acc, y) -> acc + y)
                   ELSE 0.0 END)),
               (acc, y) -> acc + y) AS gw
      FROM e
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           CAST(l AS BIGINT) AS lag_l,
           CASE WHEN n >= 2 AND g0 + 2.0 * gw > 0.0
                THEN {{q}}
           END AS kpss_stat
    FROM st
    """.replace("{q}", sql_qround(
        "ss / (CAST(n AS DOUBLE) * (g0 + 2.0 * gw))", 6)),
)
def ts_kpss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPSS level-stationarity statistic (Kwiatkowski, Phillips,
    Schmidt & Shin 1992) per event type over the daily-count series —
    the stationarity screen that complements the trend/autocorrelation
    family (stat_mann_kendall detects monotone trend, stat_ljung_box
    whiteness, ts_hurst_rs long memory): η = n⁻²ΣS_t² / σ̂²_lrv with
    S_t the partial sums of demeaned counts and the long-run variance
    estimated under a Bartlett window of the standard l = ⌊4(n/100)^¼⌋
    lags. Large η rejects level-stationarity — the pipeline signal
    that a metric needs differencing/decomposition before
    control-chart rules (ts_spc_xbar_r, ts_cusum_drift) apply.

    Determinism: the whole statistic folds sequentially over the
    date-sorted per-series array in the SAME order on both engines
    (the ts_holt_winters contract) — mean, partial-sum squares
    ([s, Σs²] LIST-state fold; never a struct state, the documented
    DuckDB rebinding trap), γ_j cross-products, and the Bartlett
    weighting are bit-identical IEEE before the one qround(6) emit,
    and the denominator predicate compares identical doubles. The
    Bartlett lag is computed ALL-INTEGER (l = #{{j ≤ 128 :
    256n ≥ 100j⁴}} — the monotone-count restatement of ⌊4(n/100)^¼⌋,
    exact for every series up to 128 lags ≡ n ≤ 104,857,600 daily
    points ≈ 287k years, i.e. unbounded for any daily series; the
    candidate range is an explicit bound, not a hidden truncation),
    because a libm pow(·, 0.25) landing exactly on an integer could
    floor differently across engines (the float-threshold rule
    applied to an exponent).

    γ_j terms with j ≥ n are guarded to 0 inside the lazy value
    branch (Spark's sequence(1, n−j) would DESCEND and index out of
    bounds under ANSI; DuckDB's generate_series is naturally empty).

    100 TB: one corpus-scale daily hash aggregate; everything after
    is per-series array arithmetic of O(n·l) distributed by series
    key — the same bill class as ts_acf (which shares the
    autocovariance core at fixed demeaning)."""
    ev = load_table(spark, sf_dir, "events")
    dc = (
        ev.select("event_type", F.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    arr = dc.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "c"))),
            lambda s: s["c"].cast("double"),
        ).alias("v"),
        F.count(F.lit(1)).cast("int").alias("n"),
    )

    def fsum(a):
        return F.aggregate(
            a, F.lit(0.0), lambda acc, y: acc + y
        )

    n = F.col("n")
    mean = fsum(F.col("v")) / n
    e = F.transform(F.col("v"), lambda x: x - mean)
    l_col = F.size(
        F.filter(
            F.sequence(F.lit(1), F.lit(128)),
            lambda j: F.lit(256) * n.cast("long")
            >= F.lit(100) * j.cast("long") * j * j * j,
        )
    )
    prep = arr.select("event_type", "n", e.alias("e"), l_col.alias("l"))
    ec = F.col("e")
    ss = F.element_at(
        F.aggregate(
            ec,
            F.array(F.lit(0.0), F.lit(0.0)),
            lambda acc, x: F.array(
                F.element_at(acc, 1) + x,
                F.element_at(acc, 2)
                + (F.element_at(acc, 1) + x) * (F.element_at(acc, 1) + x),
            ),
        ),
        2,
    )
    g0 = fsum(F.transform(ec, lambda x: x * x))

    def gamma(j):
        return fsum(
            F.transform(
                F.sequence(F.lit(1), F.col("n") - j),
                lambda t: F.element_at(ec, t) * F.element_at(ec, t + j),
            )
        )

    gw = fsum(
        F.transform(
            F.sequence(F.lit(1), F.col("l")),
            lambda j: (F.col("l") + 1 - j).cast("double")
            / (F.col("l") + 1)
            * F.when(F.col("n") > j, gamma(j)).otherwise(F.lit(0.0)),
        )
    )
    st = prep.select(
        "event_type",
        "n",
        "l",
        ss.alias("ss"),
        g0.alias("g0"),
        gw.alias("gw"),
    )
    den = F.col("g0") + 2.0 * F.col("gw")
    return st.select(
        F.col("event_type"),
        F.col("n").cast("long").alias("n_days"),
        F.col("l").cast("long").alias("lag_l"),
        F.when(
            (F.col("n") >= 2) & (den > 0.0),
            qround(F.col("ss") / (F.col("n").cast("double") * den), 6),
        ).alias("kpss_stat"),
    )


@query(
    "ts_dickey_fuller",
    oracle=f"""
    WITH dc AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    arr AS (
      SELECT event_type,
             list(CAST(c AS DOUBLE) ORDER BY day) AS v,
             CAST(COUNT(*) AS INT) AS n
      FROM dc GROUP BY event_type
    ),
    mom AS (
      SELECT event_type, n,
             CAST(n - 1 AS BIGINT) AS m,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(generate_series(1, n - 1), t -> v[t])),
               (acc, y) -> acc + y) AS sx,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(generate_series(1, n - 1),
                 t -> v[t + 1] - v[t])), (acc, y) -> acc + y) AS sd,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(generate_series(1, n - 1),
                 t -> v[t] * (v[t + 1] - v[t]))),
               (acc, y) -> acc + y) AS sxd,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(generate_series(1, n - 1),
                 t -> v[t] * v[t])), (acc, y) -> acc + y) AS sxx,
             v
      FROM arr WHERE n >= 4
    ),
    fit AS (
      SELECT event_type, n, m, v,
             (m * sxd - sx * sd) / (m * sxx - sx * sx) AS gam,
             (sd - (m * sxd - sx * sd) / (m * sxx - sx * sx) * sx) / m
                 AS alpha,
             (m * sxx - sx * sx) / m AS ssx
      FROM mom WHERE m * sxx - sx * sx > 0
    ),
    res AS (
      SELECT event_type, n, m, gam, ssx,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(generate_series(1, CAST(m AS INT)), t ->
                 (v[t + 1] - v[t] - alpha - gam * v[t])
                 * (v[t + 1] - v[t] - alpha - gam * v[t]))),
               (acc, y) -> acc + y) AS rss
      FROM fit
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           {sql_qround('gam', 6)} AS gamma_hat,
           CASE WHEN m > 2 AND rss > 0
                THEN {sql_qround(
                    'gam / sqrt(rss / (m - 2) / ssx)', 6)}
           END AS df_t
    FROM res
    """,
)
def ts_dickey_fuller(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dickey-Fuller unit-root test per event type over the
    daily-count series: OLS of Δy_t on (1, y_{{t−1}}), reporting γ̂
    and its t-ratio — the unit-root half of the standard stationarity
    PAIR with ts_kpss (KPSS's null is stationary, DF's null is a unit
    root: agreement in either direction is conclusive, disagreement
    flags near-integrated series). Constant-only form (no lag
    augmentation, no trend — the fixture series carry no trend term;
    the augmented lags are a documented extension, not a hidden cap).

    Closed-form two-regressor OLS from five sequential fold-sums over
    the date-sorted array (γ̂ = (mΣxd − ΣxΣd)/(mΣx² − (Σx)²), then
    the residual-sum fold with α̂, γ̂ inlined so both engines square
    the identical IEEE doubles), s²  = RSS/(m−2),
    SE(γ̂) = sqrt(s²/Σ(x−x̄)²) — the ts_holt_winters determinism
    contract throughout; one qround(6) per emitted column. Guards:
    n < 4, zero regressor variance (constant series), or zero RSS
    (perfect fit) NULL out instead of dividing.

    100 TB: one corpus-scale daily hash aggregate; O(n) per-series
    array arithmetic after — the ts_kpss bill exactly."""
    ev = load_table(spark, sf_dir, "events")
    dc = (
        ev.select("event_type", F.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    arr = dc.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "c"))),
            lambda s: s["c"].cast("double"),
        ).alias("v"),
        F.count(F.lit(1)).cast("int").alias("n"),
    ).filter(F.col("n") >= 4)

    def fsum(terms):
        return F.aggregate(terms, F.lit(0.0), lambda acc, y: acc + y)

    def over_m(f):
        return fsum(
            F.transform(F.sequence(F.lit(1), F.col("n") - 1), f)
        )

    vv = F.col("v")
    x = lambda t: F.element_at(vv, t)
    d = lambda t: F.element_at(vv, t + 1) - F.element_at(vv, t)
    mom = arr.select(
        "event_type",
        "n",
        (F.col("n") - 1).cast("long").alias("m"),
        over_m(lambda t: x(t)).alias("sx"),
        over_m(lambda t: d(t)).alias("sd"),
        over_m(lambda t: x(t) * d(t)).alias("sxd"),
        over_m(lambda t: x(t) * x(t)).alias("sxx"),
        "v",
    )
    m = F.col("m").cast("double")
    det = m * F.col("sxx") - F.col("sx") * F.col("sx")
    gam = (m * F.col("sxd") - F.col("sx") * F.col("sd")) / det
    alpha = (F.col("sd") - gam * F.col("sx")) / m
    fit = mom.filter(det > 0).select(
        "event_type",
        "n",
        "m",
        "v",
        gam.alias("gam"),
        alpha.alias("alpha"),
        (det / m).alias("ssx"),
    )
    resid = lambda t: (
        F.element_at(vv, t + 1)
        - F.element_at(vv, t)
        - F.col("alpha")
        - F.col("gam") * F.element_at(vv, t)
    )
    res = fit.select(
        "event_type",
        "n",
        "m",
        "gam",
        "ssx",
        fsum(
            F.transform(
                F.sequence(F.lit(1), F.col("m").cast("int")),
                lambda t: resid(t) * resid(t),
            )
        ).alias("rss"),
    )
    md = F.col("m").cast("double")
    return res.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        qround(F.col("gam"), 6).alias("gamma_hat"),
        F.when(
            (F.col("m") > 2) & (F.col("rss") > 0),
            qround(
                F.col("gam")
                / F.sqrt(F.col("rss") / (md - 2) / F.col("ssx")),
                6,
            ),
        ).alias("df_t"),
    )


def _daily_series(spark: SparkSession, sf_dir: str, min_n: int):
    """Shared round-10 econometric-test input: the per-event-type
    daily-count series as a date-sorted DOUBLE array plus its length
    (the ts_kpss / ts_dickey_fuller shape, factored). One corpus-scale
    daily hash aggregate, one per-type collect — everything after is
    O(n) per-series array arithmetic, the family's 100 TB bill."""
    ev = load_table(spark, sf_dir, "events")
    dc = (
        ev.select("event_type", F.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return (
        dc.groupBy("event_type")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("day", "c"))),
                lambda s: s["c"].cast("double"),
            ).alias("v"),
            F.count(F.lit(1)).cast("int").alias("n"),
        )
        .filter(F.col("n") >= min_n)
    )


_DAILY_SQL = """
    WITH dc AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    arr AS (
      SELECT event_type,
             list(CAST(c AS DOUBLE) ORDER BY day) AS v,
             CAST(COUNT(*) AS INT) AS n
      FROM dc GROUP BY event_type
    )"""


def _fsum(terms):
    return F.aggregate(terms, F.lit(0.0), lambda acc, y: acc + y)


@query(
    "ts_variance_ratio",
    oracle=f"""{_DAILY_SQL},
    mom AS (
      SELECT event_type, n,
             CAST(n - 1 AS BIGINT) AS m,
             (v[n] - v[1]) / (n - 1) AS mu, v
      FROM arr WHERE n >= 8
    ),
    st AS (
      SELECT event_type, n, m, mu,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(generate_series(1, CAST(m AS INT)),
                 t -> (v[t + 1] - v[t] - mu) * (v[t + 1] - v[t] - mu))),
               (acc, y) -> acc + y) AS s1,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(generate_series(1, CAST(m AS INT) - 3),
                 t -> (v[t + 4] - v[t] - 4 * mu)
                      * (v[t + 4] - v[t] - 4 * mu))),
               (acc, y) -> acc + y) AS sq
      FROM mom
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           CASE WHEN s1 > 0
                THEN {sql_qround(
                    '(sq / (4.0 * (m - 3))) / (s1 / m)', 6)}
           END AS vr,
           CASE WHEN s1 > 0
                THEN {sql_qround(
                    '((sq / (4.0 * (m - 3))) / (s1 / m) - 1.0)'
                    ' / sqrt(2.0 * 7 * 3 / (3.0 * 4 * m))', 6)}
           END AS z_stat
    FROM st
    """,
)
def ts_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lo-MacKinlay variance-ratio test VR(q), q = 4, per event type
    over the daily-count series — the random-walk screen that
    completes the stationarity trio (ts_kpss: null stationary;
    ts_dickey_fuller: null unit root; VR: null random walk, with the
    DIRECTION of departure readable — VR > 1 means positively
    autocorrelated/trending increments, VR < 1 mean-reverting ones).
    VR(q) = σ̂²_q/σ̂²_1 where σ̂²_1 = Σ(d_t − μ̂)²/m over the m = n−1
    daily increments and σ̂²_q averages over the overlapping q-day
    sums, σ̂²_q = Σ_{{t=1}}^{{m−q+1}}(v_{{t+q}} − v_t − qμ̂)²/(q(m−q+1));
    z = (VR−1)/√(2(2q−1)(q−1)/(3qm)) is the asymptotic homoskedastic
    form (Lo & MacKinlay 1988, eq. 12 family; the overlap-unbiased
    small-sample corrections are a documented extension).

    Determinism: μ̂ = (v_n − v_1)/m telescopes to a closed form (no
    fold), and both q-sums telescope to v_{{t+q}} − v_t, so each engine
    folds the SAME squared doubles in the same date order (the
    ts_holt_winters contract); one qround(6) per emitted column.
    Guards: n < 8 rows out; an all-constant series (s1 = 0) NULLs.

    100 TB: the _daily_series bill — one corpus-scale daily
    aggregate, O(n) per-series arithmetic after."""
    arr = _daily_series(spark, sf_dir, 8)
    vv = F.col("v")
    m = (F.col("n") - 1).cast("long")
    mu = (F.element_at(vv, F.col("n")) - F.element_at(vv, 1)) / m
    mom = arr.select(
        "event_type", "n", m.alias("m"), mu.alias("mu"), "v"
    )
    d4 = lambda t: (
        F.element_at(vv, t + 4) - F.element_at(vv, t) - 4 * F.col("mu")
    )
    d1 = lambda t: (
        F.element_at(vv, t + 1) - F.element_at(vv, t) - F.col("mu")
    )
    st = mom.select(
        "event_type",
        "n",
        "m",
        _fsum(
            F.transform(
                F.sequence(F.lit(1), F.col("m").cast("int")),
                lambda t: d1(t) * d1(t),
            )
        ).alias("s1"),
        _fsum(
            F.transform(
                F.sequence(F.lit(1), F.col("m").cast("int") - 3),
                lambda t: d4(t) * d4(t),
            )
        ).alias("sq"),
    )
    md = F.col("m").cast("double")
    vr = (F.col("sq") / (4.0 * (md - 3))) / (F.col("s1") / md)
    z = (vr - 1.0) / F.sqrt(F.lit(2.0 * 7 * 3) / (3.0 * 4 * md))
    return st.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.when(F.col("s1") > 0, qround(vr, 6)).alias("vr"),
        F.when(F.col("s1") > 0, qround(z, 6)).alias("z_stat"),
    )


@query(
    "ts_arch_lm",
    oracle=f"""{_DAILY_SQL},
    mom AS (
      SELECT event_type, n,
             CAST(n - 1 AS BIGINT) AS m,
             (v[n] - v[1]) / (n - 1) AS mu, v
      FROM arr WHERE n >= 5
    ),
    u AS (
      SELECT event_type, n, m,
             list_transform(generate_series(1, CAST(m AS INT)),
               t -> (v[t + 1] - v[t] - mu) * (v[t + 1] - v[t] - mu)) AS uu
      FROM mom
    ),
    st AS (
      SELECT event_type, n, CAST(m - 1 AS BIGINT) AS np,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(generate_series(2, CAST(m AS INT)),
                 t -> uu[t - 1])), (acc, y) -> acc + y) AS sx,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(generate_series(2, CAST(m AS INT)),
                 t -> uu[t])), (acc, y) -> acc + y) AS sy,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(generate_series(2, CAST(m AS INT)),
                 t -> uu[t - 1] * uu[t - 1])), (acc, y) -> acc + y) AS sxx,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(generate_series(2, CAST(m AS INT)),
                 t -> uu[t] * uu[t])), (acc, y) -> acc + y) AS syy,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(generate_series(2, CAST(m AS INT)),
                 t -> uu[t - 1] * uu[t])), (acc, y) -> acc + y) AS sxy
      FROM u
    ),
    cen AS (
      SELECT event_type, n, np,
             sxx - sx * sx / np AS cxx,
             syy - sy * sy / np AS cyy,
             sxy - sx * sy / np AS cxy
      FROM st
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           CASE WHEN cxx > 0 AND cyy > 0
                THEN {sql_qround('cxy * cxy / (cxx * cyy)', 6)}
           END AS r2,
           CASE WHEN cxx > 0 AND cyy > 0
                THEN {sql_qround('np * cxy * cxy / (cxx * cyy)', 6)}
           END AS lm_stat
    FROM cen
    """,
)
def ts_arch_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engle's ARCH LM test at lag 1 per event type over the daily
    increments — volatility clustering (conditional
    heteroskedasticity), the second-moment complement of the
    level-dynamics trio (kpss/dickey_fuller/variance_ratio all test
    the MEAN process; ARCH asks whether today's squared shock
    predicts tomorrow's). u_t = (d_t − μ̂)² on the m = n−1 demeaned
    increments; regress u_t on u_{{t−1}} over the m−1 lag pairs;
    LM = (m−1)·R² ~ χ²(1) under the no-ARCH null (Engle 1982, p = 1;
    higher lag orders are a documented extension).

    R² of a simple regression is Sxy²/(Sxx·Syy) — five raw fold-sums
    over the date-sorted array then closed-form centered moments, so
    both engines square identical IEEE doubles (the ts_holt_winters
    contract); μ̂ telescopes like ts_variance_ratio. One qround(6)
    per emitted column. Guards: n < 5 rows out; zero variance in
    either side of the lag regression (constant squared shocks, e.g.
    a perfectly linear series) NULLs.

    100 TB: the _daily_series bill."""
    arr = _daily_series(spark, sf_dir, 5)
    vv = F.col("v")
    m = (F.col("n") - 1).cast("long")
    mu = (F.element_at(vv, F.col("n")) - F.element_at(vv, 1)) / m
    mom = arr.select(
        "event_type", "n", m.alias("m"), mu.alias("mu"), "v"
    )
    u = mom.select(
        "event_type",
        "n",
        "m",
        F.transform(
            F.sequence(F.lit(1), F.col("m").cast("int")),
            lambda t: (
                F.element_at(vv, t + 1) - F.element_at(vv, t) - F.col("mu")
            )
            * (
                F.element_at(vv, t + 1) - F.element_at(vv, t) - F.col("mu")
            ),
        ).alias("uu"),
    )
    uu = F.col("uu")
    rng = F.sequence(F.lit(2), F.col("m").cast("int"))
    st = u.select(
        "event_type",
        "n",
        (F.col("m") - 1).cast("long").alias("np"),
        _fsum(F.transform(rng, lambda t: F.element_at(uu, t - 1))).alias(
            "sx"
        ),
        _fsum(F.transform(rng, lambda t: F.element_at(uu, t))).alias("sy"),
        _fsum(
            F.transform(
                rng,
                lambda t: F.element_at(uu, t - 1) * F.element_at(uu, t - 1),
            )
        ).alias("sxx"),
        _fsum(
            F.transform(
                rng, lambda t: F.element_at(uu, t) * F.element_at(uu, t)
            )
        ).alias("syy"),
        _fsum(
            F.transform(
                rng,
                lambda t: F.element_at(uu, t - 1) * F.element_at(uu, t),
            )
        ).alias("sxy"),
    )
    np_ = F.col("np").cast("double")
    cxx = F.col("sxx") - F.col("sx") * F.col("sx") / np_
    cyy = F.col("syy") - F.col("sy") * F.col("sy") / np_
    cxy = F.col("sxy") - F.col("sx") * F.col("sy") / np_
    cen = st.select(
        "event_type",
        "n",
        "np",
        cxx.alias("cxx"),
        cyy.alias("cyy"),
        cxy.alias("cxy"),
    )
    ok = (F.col("cxx") > 0) & (F.col("cyy") > 0)
    r2 = F.col("cxy") * F.col("cxy") / (F.col("cxx") * F.col("cyy"))
    return cen.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.when(ok, qround(r2, 6)).alias("r2"),
        F.when(ok, qround(F.col("np").cast("double") * r2, 6)).alias(
            "lm_stat"
        ),
    )


@query(
    "ts_durbin_watson",
    oracle=f"""{_DAILY_SQL},
    mom AS (
      SELECT event_type, n, v,
             CAST(n AS BIGINT) * (n + 1) / 2 AS st,
             CAST(n AS BIGINT) * (n + 1) * (2 * CAST(n AS BIGINT) + 1)
                 / 6 AS stt,
             list_reduce(list_prepend(CAST(0 AS DOUBLE), v),
               (acc, y) -> acc + y) AS sy,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(generate_series(1, n), t -> t * v[t])),
               (acc, y) -> acc + y) AS sty
      FROM arr WHERE n >= 4
    ),
    fit AS (
      SELECT event_type, n, v,
             (n * sty - st * sy) / (n * stt - CAST(st AS DOUBLE) * st)
                 AS b,
             (sy - (n * sty - st * sy)
                 / (n * stt - CAST(st AS DOUBLE) * st) * st) / n AS a
      FROM mom
    ),
    res AS (
      SELECT event_type, n, b,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(generate_series(1, n),
                 t -> (v[t] - a - b * t) * (v[t] - a - b * t))),
               (acc, y) -> acc + y) AS den,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(generate_series(2, n),
                 t -> (v[t] - v[t - 1] - b) * (v[t] - v[t - 1] - b))),
               (acc, y) -> acc + y) AS num
      FROM fit
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           {sql_qround('b', 6)} AS slope,
           CASE WHEN den > 0 THEN {sql_qround('num / den', 6)}
           END AS dw
    FROM res
    """,
)
def ts_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson statistic per event type on the residuals of the
    daily-count-vs-time OLS line: d = Σ(e_t − e_{{t−1}})²/Σe_t², the
    classic lag-1 residual-autocorrelation screen (d ≈ 2 white,
    d → 0 positive, d → 4 negative autocorrelation). Distinct from
    ts_dickey_fuller (unit root in the SERIES) and ts_arch_lm
    (second-moment dynamics): DW asks whether a trend-line fit leaves
    serially correlated errors — the "is a linear trend model
    adequate" gate before ts_theil_sen_daily/forecast backtests.

    Exactness: Σt = n(n+1)/2 and Σt² = n(n+1)(2n+1)/6 are closed-form
    integers; Σy and Σty are date-ordered folds; slope/intercept are
    then identical IEEE doubles on both engines, the residual
    differences telescope to (v_t − v_{{t−1}} − b), and the two
    residual folds run in the same order (the ts_holt_winters
    contract). One qround(6) per emitted column. Invariant pinned in
    tests/test_stat_invariants.py: d ∈ [0, 4]. Guards: n < 4 rows
    out; a perfect linear fit (den = 0) NULLs d.

    100 TB: the _daily_series bill."""
    arr = _daily_series(spark, sf_dir, 4)
    vv = F.col("v")
    n = F.col("n").cast("long")
    mom = arr.select(
        "event_type",
        "n",
        "v",
        (n * (n + 1) / 2).cast("long").alias("st"),
        (n * (n + 1) * (2 * n + 1) / 6).cast("long").alias("stt"),
        _fsum(F.col("v")).alias("sy"),
        _fsum(
            F.transform(
                F.sequence(F.lit(1), F.col("n")),
                lambda t: t.cast("double") * F.element_at(vv, t),
            )
        ).alias("sty"),
    )
    nd = F.col("n").cast("double")
    det = nd * F.col("stt") - F.col("st").cast("double") * F.col("st")
    b = (nd * F.col("sty") - F.col("st") * F.col("sy")) / det
    a = (F.col("sy") - b * F.col("st")) / nd
    fit = mom.select(
        "event_type", "n", "v", b.alias("b"), a.alias("a")
    )
    e = lambda t: (
        F.element_at(vv, t) - F.col("a") - F.col("b") * t.cast("double")
    )
    dd = lambda t: (
        F.element_at(vv, t) - F.element_at(vv, t - 1) - F.col("b")
    )
    res = fit.select(
        "event_type",
        "n",
        "b",
        _fsum(
            F.transform(
                F.sequence(F.lit(1), F.col("n")), lambda t: e(t) * e(t)
            )
        ).alias("den"),
        _fsum(
            F.transform(
                F.sequence(F.lit(2), F.col("n")), lambda t: dd(t) * dd(t)
            )
        ).alias("num"),
    )
    return res.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        qround(F.col("b"), 6).alias("slope"),
        F.when(
            F.col("den") > 0, qround(F.col("num") / F.col("den"), 6)
        ).alias("dw"),
    )


@query(
    "ts_turning_points",
    oracle=f"""{_DAILY_SQL},
    tp AS (
      SELECT event_type, n,
             CAST(len(list_filter(generate_series(2, n - 1),
               t -> (v[t] - v[t - 1]) * (v[t] - v[t + 1]) > 0))
               AS BIGINT) AS t_count
      FROM arr WHERE n >= 4
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days, t_count,
           {sql_qround('2.0 * (n - 2) / 3.0', 6)} AS expected,
           {sql_qround(
               '(t_count - 2.0 * (n - 2) / 3.0)'
               ' / sqrt((16.0 * n - 29.0) / 90.0)', 6)} AS z_stat
    FROM tp
    """,
)
def ts_turning_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's turning-point test per event type over the daily
    series: count the strict local extrema (v_{{t−1}} < v_t > v_{{t+1}}
    or the mirror; plateau ties do NOT count — the strict-inequality
    convention, stated because integer counts tie often), compare to
    the i.i.d. expectation E[T] = 2(n−2)/3, Var[T] = (16n−29)/90
    (Kendall & Stuart, vol. 3). Too FEW turning points ⟹ trending/
    sticky series; too many ⟹ negative lag-1 dependence. The
    randomness screen complementary to stat_runs_test (signs around a
    level) and ts_permutation_entropy (ordinal patterns): turning
    points are the m = 3 ordinal-pattern statistic with an exact
    closed-form null.

    The count is ALL-INTEGER (daily counts are exact in double, the
    strict > on their products is tie-free by construction), so the
    only float arithmetic is the final two emitted expressions —
    no accumulation-order risk at all. Guards: n < 4 rows out.

    100 TB: the _daily_series bill."""
    arr = _daily_series(spark, sf_dir, 4)
    vv = F.col("v")
    tp = arr.select(
        "event_type",
        "n",
        F.size(
            F.filter(
                F.sequence(F.lit(2), F.col("n") - 1),
                lambda t: (F.element_at(vv, t) - F.element_at(vv, t - 1))
                * (F.element_at(vv, t) - F.element_at(vv, t + 1))
                > 0,
            )
        )
        .cast("long")
        .alias("t_count"),
    )
    nd = F.col("n").cast("double")
    exp_t = 2.0 * (nd - 2) / 3.0
    return tp.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        "t_count",
        qround(exp_t, 6).alias("expected"),
        qround(
            (F.col("t_count") - exp_t)
            / F.sqrt((16.0 * nd - 29.0) / 90.0),
            6,
        ).alias("z_stat"),
    )


@query(
    "ts_granger_lag1",
    oracle=f"""
    WITH dc AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    pr AS (
      SELECT a.event_type AS cause, b.event_type AS effect, a.day,
             CAST(a.c AS DOUBLE) AS cx, CAST(b.c AS DOUBLE) AS cy
      FROM dc a JOIN dc b USING (day)
      WHERE a.event_type <> b.event_type
    ),
    arr AS (
      SELECT cause, effect,
             list_transform(list_sort(list({{'day': day, 'cx': cx,
                 'cy': cy}})), s -> s.cx) AS vx,
             list_transform(list_sort(list({{'day': day, 'cx': cx,
                 'cy': cy}})), s -> s.cy) AS vy,
             CAST(COUNT(*) AS INT) AS n
      FROM pr GROUP BY cause, effect
    ),
    st AS (
      SELECT cause, effect, n, CAST(n - 1 AS BIGINT) AS m,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(generate_series(1, n - 1),
                 t -> vy[t])), (acc, y) -> acc + y) AS s1,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(generate_series(1, n - 1),
                 t -> vx[t])), (acc, y) -> acc + y) AS s2,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(generate_series(1, n - 1),
                 t -> vy[t + 1])), (acc, y) -> acc + y) AS sy,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(generate_series(1, n - 1),
                 t -> vy[t] * vy[t])), (acc, y) -> acc + y) AS s11,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(generate_series(1, n - 1),
                 t -> vx[t] * vx[t])), (acc, y) -> acc + y) AS s22,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(generate_series(1, n - 1),
                 t -> vy[t] * vx[t])), (acc, y) -> acc + y) AS s12,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(generate_series(1, n - 1),
                 t -> vy[t] * vy[t + 1])), (acc, y) -> acc + y) AS s1y,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(generate_series(1, n - 1),
                 t -> vx[t] * vy[t + 1])), (acc, y) -> acc + y) AS s2y,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(generate_series(1, n - 1),
                 t -> vy[t + 1] * vy[t + 1])), (acc, y) -> acc + y) AS syy
      FROM arr WHERE n >= 6
    ),
    cen AS (
      SELECT cause, effect, n, m,
             s11 - s1 * s1 / m AS c11,
             s22 - s2 * s2 / m AS c22,
             s12 - s1 * s2 / m AS c12,
             s1y - s1 * sy / m AS c1y,
             s2y - s2 * sy / m AS c2y,
             syy - sy * sy / m AS cyy
      FROM st
    ),
    fit AS (
      SELECT cause, effect, n, m, c11, cyy, c1y,
             c11 * c22 - c12 * c12 AS det,
             (c22 * c1y - c12 * c2y) AS b1n,
             (c11 * c2y - c12 * c1y) AS b2n,
             c2y
      FROM cen
    ),
    ssr AS (
      SELECT cause, effect, n, m, c11, c1y, det,
             b2n / det AS b2,
             cyy - (b1n / det) * c1y - (b2n / det) * c2y AS ssr_u,
             cyy - c1y * c1y / c11 AS ssr_r
      FROM fit WHERE det > 0 AND c11 > 0
    )
    SELECT cause, effect, CAST(n AS BIGINT) AS n_days,
           CASE WHEN ssr_u > 0 AND m > 3
                THEN {sql_qround('(ssr_r - ssr_u) * (m - 3) / ssr_u', 6)}
           END AS f_stat,
           {sql_qround('b2', 6)} AS b_cause
    FROM ssr
    """,
)
def ts_granger_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger causality at lag 1 between every ordered pair of event
    types' daily-count series: does yesterday's CAUSE count improve
    the one-step forecast of today's EFFECT count beyond the effect's
    own yesterday? F = ((SSR_r − SSR_u)/1)/(SSR_u/(m−3)) comparing the
    restricted AR(1) y_t ~ (1, y_{{t−1}}) against the unrestricted
    ADL(1,1) y_t ~ (1, y_{{t−1}}, x_{{t−1}}) (Granger 1969), with the
    cause coefficient b_cause emitted alongside for sign. The
    cross-series member of the dependence family: ts_crosscorr_lags
    measures symmetric lagged correlation; Granger's F is the
    directional regression test pipelines actually gate alerts on.

    Series are aligned on their COMMON days (inner join on the day
    grid — a day missing either series contributes no observation;
    zero-filling is a documented alternative, not a hidden default).
    Two-regressor OLS is closed-form from nine raw fold-sums over the
    date-sorted arrays (centered moments via Cramer's rule — both
    engines fold identical IEEE doubles in the same order, the
    ts_holt_winters contract), one qround(6) per emitted column.
    Guards: fewer than 6 common days, a singular normal matrix
    (constant either series), or a perfect unrestricted fit NULL/drop
    instead of dividing.

    100 TB: the day grid aggregates corpus-scale data down to
    (days × types) rows BEFORE the self-join, so the pairwise join is
    metadata-sized (the checkpointed dc table scans events once); the
    k² pair series are bounded by the type cardinality."""
    ev = load_table(spark, sf_dir, "events")
    dc = (
        ev.select("event_type", F.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .transform(pin)
    )
    a = dc.select(
        F.col("event_type").alias("cause"),
        "day",
        F.col("c").cast("double").alias("cx"),
    )
    b = dc.select(
        F.col("event_type").alias("effect"),
        "day",
        F.col("c").cast("double").alias("cy"),
    )
    pr = a.join(b, "day").filter(F.col("cause") != F.col("effect"))
    arr = (
        pr.groupBy("cause", "effect")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("day", "cx", "cy"))
            ).alias("s"),
            F.count(F.lit(1)).cast("int").alias("n"),
        )
        .filter(F.col("n") >= 6)
        .select(
            "cause",
            "effect",
            "n",
            F.transform("s", lambda r: r["cx"]).alias("vx"),
            F.transform("s", lambda r: r["cy"]).alias("vy"),
        )
    )
    vx, vy = F.col("vx"), F.col("vy")
    rng = F.sequence(F.lit(1), F.col("n") - 1)

    def fold(f):
        return _fsum(F.transform(rng, f))

    st = arr.select(
        "cause",
        "effect",
        "n",
        (F.col("n") - 1).cast("long").alias("m"),
        fold(lambda t: F.element_at(vy, t)).alias("s1"),
        fold(lambda t: F.element_at(vx, t)).alias("s2"),
        fold(lambda t: F.element_at(vy, t + 1)).alias("sy"),
        fold(
            lambda t: F.element_at(vy, t) * F.element_at(vy, t)
        ).alias("s11"),
        fold(
            lambda t: F.element_at(vx, t) * F.element_at(vx, t)
        ).alias("s22"),
        fold(
            lambda t: F.element_at(vy, t) * F.element_at(vx, t)
        ).alias("s12"),
        fold(
            lambda t: F.element_at(vy, t) * F.element_at(vy, t + 1)
        ).alias("s1y"),
        fold(
            lambda t: F.element_at(vx, t) * F.element_at(vy, t + 1)
        ).alias("s2y"),
        fold(
            lambda t: F.element_at(vy, t + 1) * F.element_at(vy, t + 1)
        ).alias("syy"),
    )
    md = F.col("m").cast("double")
    cen = st.select(
        "cause",
        "effect",
        "n",
        "m",
        (F.col("s11") - F.col("s1") * F.col("s1") / md).alias("c11"),
        (F.col("s22") - F.col("s2") * F.col("s2") / md).alias("c22"),
        (F.col("s12") - F.col("s1") * F.col("s2") / md).alias("c12"),
        (F.col("s1y") - F.col("s1") * F.col("sy") / md).alias("c1y"),
        (F.col("s2y") - F.col("s2") * F.col("sy") / md).alias("c2y"),
        (F.col("syy") - F.col("sy") * F.col("sy") / md).alias("cyy"),
    )
    det = F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12")
    b1n = F.col("c22") * F.col("c1y") - F.col("c12") * F.col("c2y")
    b2n = F.col("c11") * F.col("c2y") - F.col("c12") * F.col("c1y")
    ssr = (
        cen.filter((det > 0) & (F.col("c11") > 0))
        .select(
            "cause",
            "effect",
            "n",
            "m",
            (b2n / det).alias("b2"),
            (
                F.col("cyy")
                - (b1n / det) * F.col("c1y")
                - (b2n / det) * F.col("c2y")
            ).alias("ssr_u"),
            (
                F.col("cyy")
                - F.col("c1y") * F.col("c1y") / F.col("c11")
            ).alias("ssr_r"),
        )
    )
    md2 = F.col("m").cast("double")
    return ssr.select(
        "cause",
        "effect",
        F.col("n").cast("long").alias("n_days"),
        F.when(
            (F.col("ssr_u") > 0) & (F.col("m") > 3),
            qround(
                (F.col("ssr_r") - F.col("ssr_u"))
                * (md2 - 3)
                / F.col("ssr_u"),
                6,
            ),
        ).alias("f_stat"),
        qround(F.col("b2"), 6).alias("b_cause"),
    )


def _eg_fold_sql(expr: str, upper: str) -> str:
    """DuckDB sequential fold Σ over t = 1..{upper} of {expr} — LIST
    state prepend-0.0 list_reduce, the ts_granger_lag1 fold shape
    (one definition per term keeps the two engines' accumulation
    order identical)."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE),"
        f" list_transform(generate_series(1, {upper}),"
        f" t -> {expr})), (acc, y) -> acc + y)"
    )


@query(
    "ts_cointegration",
    oracle=f"""
    WITH dc AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    pr AS (
      SELECT a.event_type AS y_type, b.event_type AS x_type, a.day,
             CAST(a.c AS DOUBLE) AS cy, CAST(b.c AS DOUBLE) AS cx
      FROM dc a JOIN dc b USING (day)
      WHERE a.event_type <> b.event_type
    ),
    arr AS (
      SELECT y_type, x_type,
             list_transform(list_sort(list({{'day': day, 'cx': cx,
                 'cy': cy}})), s -> s.cx) AS vx,
             list_transform(list_sort(list({{'day': day, 'cx': cx,
                 'cy': cy}})), s -> s.cy) AS vy,
             CAST(COUNT(*) AS INT) AS n
      FROM pr GROUP BY y_type, x_type
    ),
    st AS (
      SELECT y_type, x_type, n, vx, vy,
             {_eg_fold_sql("vx[t]", "n")} AS sx,
             {_eg_fold_sql("vy[t]", "n")} AS sy,
             {_eg_fold_sql("vx[t] * vx[t]", "n")} AS sxx,
             {_eg_fold_sql("vx[t] * vy[t]", "n")} AS sxy
      FROM arr WHERE n >= 6
    ),
    ab AS (
      SELECT y_type, x_type, n, vx, vy,
             (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
             (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
                 AS a
      FROM st WHERE n * sxx - sx * sx > 0
    ),
    ef AS (
      SELECT y_type, x_type, n, vx, vy, a, b,
             {_eg_fold_sql(
                 "(vy[t] - a - b * vx[t]) * (vy[t] - a - b * vx[t])",
                 "n - 1")} AS see,
             {_eg_fold_sql(
                 "(vy[t] - a - b * vx[t])"
                 " * ((vy[t + 1] - a - b * vx[t + 1])"
                 "    - (vy[t] - a - b * vx[t]))",
                 "n - 1")} AS sed
      FROM ab
    ),
    gm AS (
      SELECT y_type, x_type, n, vx, vy, a, b, see, sed / see AS gam
      FROM ef WHERE see > 0
    ),
    fin AS (
      SELECT y_type, x_type, n, b, see, gam,
             {_eg_fold_sql(
                 "((vy[t + 1] - a - b * vx[t + 1])"
                 " - (vy[t] - a - b * vx[t])"
                 " - gam * (vy[t] - a - b * vx[t]))"
                 " * ((vy[t + 1] - a - b * vx[t + 1])"
                 "    - (vy[t] - a - b * vx[t])"
                 "    - gam * (vy[t] - a - b * vx[t]))",
                 "n - 1")} AS rss
      FROM gm
    )
    SELECT y_type, x_type, CAST(n AS BIGINT) AS n_days,
           FLOOR(b * 1000000.0 + 0.5) / 1000000.0 AS b,
           FLOOR(gam * 1000000.0 + 0.5) / 1000000.0 AS gamma,
           CASE WHEN rss > 0 AND n > 3 THEN
               FLOOR(gam / SQRT(rss / (n - 2) / see)
                     * 1000000.0 + 0.5) / 1000000.0
           END AS t_stat
    FROM fin
    """,
)
def ts_cointegration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engle-Granger two-step cointegration test (Engle & Granger
    1987) for every ordered pair of event types' daily-count series:
    step 1 fits the long-run relation y_t = a + b·x_t by OLS; step 2
    runs a no-constant Dickey-Fuller regression Δe_t = γ·e_{{t-1}} on
    the residuals — a strongly negative t-ratio rejects the unit
    root in e and says the two series share a common stochastic
    trend (they drift TOGETHER even when each is nonstationary).
    Completes the econometric battery's cross-series axis:
    ts_granger_lag1 asks who forecasts whom; cointegration asks
    whether a stable long-run spread exists at all — the pair-trade /
    shared-load-balancer signal neither correlation nor Granger
    answers.

    Determinism is the ts_granger_lag1 contract verbatim: series
    align on common days, every sum is a sequential fold over the
    date-sorted arrays (one shared fold helper per engine), residuals
    inline (a, b) so both engines square identical IEEE doubles, and
    each emitted column is qround(6). Guards: < 6 common days,
    constant x (singular step-1), all-zero residuals (see = 0 — an
    exact linear relation IS cointegration but has no DF statistic),
    and perfect step-2 fit (rss = 0) drop or NULL instead of
    dividing. The t-ratio uses s² = RSS/(m−1) with m = n−1 fold
    terms and one estimated parameter.

    100 TB: the checkpointed day grid aggregates events once; the
    pairwise join and all folds are (days × types²) metadata — the
    granger bill exactly."""
    ev = load_table(spark, sf_dir, "events")
    dc = (
        ev.select("event_type", F.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .transform(pin)
    )
    a_side = dc.select(
        F.col("event_type").alias("y_type"),
        "day",
        F.col("c").cast("double").alias("cy"),
    )
    b_side = dc.select(
        F.col("event_type").alias("x_type"),
        "day",
        F.col("c").cast("double").alias("cx"),
    )
    pr = a_side.join(b_side, "day").filter(
        F.col("y_type") != F.col("x_type")
    )
    arr = (
        pr.groupBy("y_type", "x_type")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("day", "cx", "cy"))
            ).alias("s"),
            F.count(F.lit(1)).cast("int").alias("n"),
        )
        .filter(F.col("n") >= 6)
        .select(
            "y_type",
            "x_type",
            "n",
            F.transform(F.col("s"), lambda r: r["cx"]).alias("vx"),
            F.transform(F.col("s"), lambda r: r["cy"]).alias("vy"),
        )
    )

    def fold(terms):
        return F.aggregate(terms, F.lit(0.0), lambda acc, y: acc + y)

    def over(upper, f):
        return fold(F.transform(F.sequence(F.lit(1), upper), f))

    vx = lambda t: F.element_at(F.col("vx"), t)
    vy = lambda t: F.element_at(F.col("vy"), t)
    nc = F.col("n")
    st = arr.select(
        "y_type",
        "x_type",
        "n",
        "vx",
        "vy",
        over(nc, lambda t: vx(t)).alias("sx"),
        over(nc, lambda t: vy(t)).alias("sy"),
        over(nc, lambda t: vx(t) * vx(t)).alias("sxx"),
        over(nc, lambda t: vx(t) * vy(t)).alias("sxy"),
    )
    detx = nc * F.col("sxx") - F.col("sx") * F.col("sx")
    bq = (nc * F.col("sxy") - F.col("sx") * F.col("sy")) / detx
    ab = st.filter(detx > 0).select(
        "y_type",
        "x_type",
        "n",
        "vx",
        "vy",
        bq.alias("b"),
        ((F.col("sy") - bq * F.col("sx")) / nc).alias("a"),
    )
    e = lambda t: vy(t) - F.col("a") - F.col("b") * vx(t)
    ef = ab.select(
        "y_type",
        "x_type",
        "n",
        "vx",
        "vy",
        "a",
        "b",
        over(nc - 1, lambda t: e(t) * e(t)).alias("see"),
        over(nc - 1, lambda t: e(t) * (e(t + 1) - e(t))).alias("sed"),
    )
    gm = ef.filter(F.col("see") > 0).withColumn(
        "gam", F.col("sed") / F.col("see")
    )
    de = lambda t: e(t + 1) - e(t) - F.col("gam") * e(t)
    fin = gm.select(
        "y_type",
        "x_type",
        "n",
        "b",
        "see",
        "gam",
        over(nc - 1, lambda t: de(t) * de(t)).alias("rss"),
    )
    t_stat = F.col("gam") / F.sqrt(
        F.col("rss") / (nc - 2) / F.col("see")
    )
    return fin.select(
        "y_type",
        "x_type",
        nc.cast("long").alias("n_days"),
        qround(F.col("b"), 6).alias("b"),
        qround(F.col("gam"), 6).alias("gamma"),
        F.when((F.col("rss") > 0) & (nc > 3), qround(t_stat, 6)).alias(
            "t_stat"
        ),
    )


def _pp_u_sql(t: str) -> str:
    """Inlined PP regression residual u_t = Δv_t − α̂ − γ̂·v_t at
    index expression {t} (the ts_dickey_fuller inline-coefficients
    discipline: both engines square identical IEEE doubles)."""
    return (
        f"(v[({t}) + 1] - v[({t})] - alpha - gam * v[({t})])"
    )


@query(
    "ts_phillips_perron",
    oracle=f"""
    WITH dc AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    arr AS (
      SELECT event_type,
             list(CAST(c AS DOUBLE) ORDER BY day) AS v,
             CAST(COUNT(*) AS INT) AS n
      FROM dc GROUP BY event_type
    ),
    st AS (
      SELECT event_type, n, v, CAST(n - 1 AS BIGINT) AS m,
             {_eg_fold_sql("v[t]", "n - 1")} AS sx,
             {_eg_fold_sql("v[t + 1] - v[t]", "n - 1")} AS sd,
             {_eg_fold_sql("v[t] * (v[t + 1] - v[t])", "n - 1")} AS sxd,
             {_eg_fold_sql("v[t] * v[t]", "n - 1")} AS sxx
      FROM arr WHERE n >= 6
    ),
    fit AS (
      SELECT event_type, n, v, m,
             (m * sxd - sx * sd) / (m * sxx - sx * sx) AS gam,
             (sd - (m * sxd - sx * sd) / (m * sxx - sx * sx) * sx) / m
                 AS alpha,
             (m * sxx - sx * sx) / m AS ssx,
             CAST(len(list_filter(generate_series(1, 128),
                 j -> 256 * (n - 1) >= 100 * j * j * j * j)) AS BIGINT)
                 AS l
      FROM st WHERE m * sxx - sx * sx > 0
    ),
    resf AS (
      SELECT event_type, n, m, l, gam, ssx,
             {_eg_fold_sql(_pp_u_sql("t") + " * " + _pp_u_sql("t"),
                           "n - 1")} AS su2,
             list_sum(list_transform(generate_series(1, l),
                 j -> CAST(l + 1 - j AS DOUBLE) / (l + 1)
                      * (CASE WHEN m > j THEN
                          {_eg_fold_sql(
                              _pp_u_sql("t") + " * " + _pp_u_sql("t + j"),
                              "n - 1 - j")}
                         ELSE 0.0 END))) AS gwsum
      FROM fit
    ),
    z AS (
      SELECT event_type, n, m, l, gam, ssx, su2,
             su2 / m AS g0,
             su2 / m + 2.0 * COALESCE(gwsum, 0.0) / m AS l2
      FROM resf
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days, l AS lag_l,
           FLOOR(gam * 1000000.0 + 0.5) / 1000000.0 AS gamma,
           CASE WHEN l2 > 0 AND su2 > 0 AND m > 2 THEN
               FLOOR((SQRT(g0 / l2)
                      * (gam / SQRT((su2 / (m - 2)) / ssx))
                      - 0.5 * (l2 - g0) / SQRT(l2)
                        * (m * SQRT((su2 / (m - 2)) / ssx)
                           / SQRT(su2 / (m - 2))))
                     * 1000000.0 + 0.5) / 1000000.0
           END AS z_tau,
           CASE WHEN l2 > 0 AND su2 > 0 AND m > 2 THEN
               FLOOR((m * gam
                      - 0.5 * (l2 - g0)
                        * (m * m * ((su2 / (m - 2)) / ssx)
                           / (su2 / (m - 2))))
                     * 1000000.0 + 0.5) / 1000000.0
           END AS z_rho
    FROM z
    """,
)
def ts_phillips_perron(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phillips-Perron unit-root test (Phillips & Perron 1988;
    Hamilton 1994 eqs. 17.6.6/17.6.8, constant-only form) per event
    type: the SAME Δy_t = α + γ·y_{{t-1}} regression as
    ts_dickey_fuller, but the statistics are nonparametrically
    corrected for serial correlation in u_t with a Newey-West
    long-run variance instead of lag augmentation — Z_tau (the
    corrected t-ratio, compare to the same DF critical values) and
    Z_rho (the corrected m·γ̂ coefficient test). Closes the
    unit-root corner of the battery: DF assumes white residuals, PP
    buys robustness with the λ² correction, KPSS flips the null.

    Machinery is entirely reused: the DF closed-form fold regression
    (coefficients inlined into the residual folds), ts_kpss's
    ALL-INTEGER Bartlett lag rule (l = #{{j ≤ 128: 256m ≥ 100j⁴}} —
    no libm pow in an integer threshold) and its j-guarded
    autocovariance folds (m > j lazily, the ANSI descending-sequence
    trap), and the shared per-engine fold helpers. λ² ≤ 0 (possible
    with strongly negative autocovariances under Bartlett weights),
    zero residual variance, or m ≤ 2 NULL the statistics — CASE on
    identical fixed-shape doubles both engines; qround(6) emits.

    100 TB: the _daily_series bill — one corpus-scale daily hash
    aggregate, then O(n·l) per-series array arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    dc = (
        ev.select("event_type", F.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    arr = (
        dc.groupBy("event_type")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("day", "c"))),
                lambda s: s["c"].cast("double"),
            ).alias("v"),
            F.count(F.lit(1)).cast("int").alias("n"),
        )
        .filter(F.col("n") >= 6)
    )

    def fold(terms):
        return F.aggregate(terms, F.lit(0.0), lambda acc, y: acc + y)

    def over(upper, f):
        return fold(F.transform(F.sequence(F.lit(1), upper), f))

    vv = lambda t: F.element_at(F.col("v"), t)
    n = F.col("n")
    m = F.col("m")
    st = arr.select(
        "event_type",
        "n",
        "v",
        (n - 1).cast("long").alias("m"),
        over(n - 1, lambda t: vv(t)).alias("sx"),
        over(n - 1, lambda t: vv(t + 1) - vv(t)).alias("sd"),
        over(n - 1, lambda t: vv(t) * (vv(t + 1) - vv(t))).alias("sxd"),
        over(n - 1, lambda t: vv(t) * vv(t)).alias("sxx"),
    )
    det = m * F.col("sxx") - F.col("sx") * F.col("sx")
    gam = (m * F.col("sxd") - F.col("sx") * F.col("sd")) / det
    l_col = F.size(
        F.filter(
            F.sequence(F.lit(1), F.lit(128)),
            lambda j: F.lit(256) * (n - 1).cast("long")
            >= F.lit(100) * j.cast("long") * j * j * j,
        )
    ).cast("int")
    fit = st.filter(det > 0).select(
        "event_type",
        "n",
        "v",
        "m",
        gam.alias("gam"),
        ((F.col("sd") - gam * F.col("sx")) / m).alias("alpha"),
        (det / m).alias("ssx"),
        l_col.alias("l"),
    )
    u = lambda t: (
        vv(t + 1) - vv(t) - F.col("alpha") - F.col("gam") * vv(t)
    )
    gw = fold(
        F.transform(
            F.sequence(F.lit(1), F.col("l")),
            lambda j: (F.col("l") + 1 - j).cast("double")
            / (F.col("l") + 1)
            * F.when(
                m > j,
                over(n - 1 - j, lambda t: u(t) * u(t + j)),
            ).otherwise(F.lit(0.0)),
        )
    )
    resf = fit.select(
        "event_type",
        "n",
        "m",
        "l",
        "gam",
        "ssx",
        over(n - 1, lambda t: u(t) * u(t)).alias("su2"),
        gw.alias("gwsum"),
    )
    g0 = F.col("su2") / m
    l2 = F.col("su2") / m + F.lit(2.0) * F.coalesce(
        F.col("gwsum"), F.lit(0.0)
    ) / m
    z = resf.select(
        "event_type", "n", "m", "l", "gam", "ssx", "su2",
        g0.alias("g0"), l2.alias("l2"),
    )
    s2 = F.col("su2") / (m - 2)
    se2 = s2 / F.col("ssx")
    z_tau = F.sqrt(F.col("g0") / F.col("l2")) * (
        F.col("gam") / F.sqrt(se2)
    ) - F.lit(0.5) * (F.col("l2") - F.col("g0")) / F.sqrt(F.col("l2")) * (
        m * F.sqrt(se2) / F.sqrt(s2)
    )
    z_rho = m * F.col("gam") - F.lit(0.5) * (
        F.col("l2") - F.col("g0")
    ) * (m * m * se2 / s2)
    ok = (F.col("l2") > 0) & (F.col("su2") > 0) & (m > 2)
    return z.select(
        "event_type",
        n.cast("long").alias("n_days"),
        F.col("l").cast("long").alias("lag_l"),
        qround(F.col("gam"), 6).alias("gamma"),
        F.when(ok, qround(z_tau, 6)).alias("z_tau"),
        F.when(ok, qround(z_rho, 6)).alias("z_rho"),
    )


@query(
    "ts_pettitt_changepoint",
    oracle="""
    WITH dc AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    arr AS (
      SELECT event_type,
             list(CAST(c AS DOUBLE) ORDER BY day) AS v,
             CAST(COUNT(*) AS INT) AS n
      FROM dc GROUP BY event_type
    ),
    rk AS (
      SELECT event_type, n,
             list_transform(v, x ->
                 CAST(2 * len(list_filter(v, y -> y < x))
                      + len(list_filter(v, y -> y = x)) + 1
                      AS BIGINT)) AS r2
      FROM arr WHERE n >= 2
    ),
    uu AS (
      SELECT event_type, n,
             list_transform(generate_series(1, n - 1), t ->
                 CAST(t * (n + 1) AS BIGINT)
                 - CAST(list_sum(r2[1:CAST(t AS INT)]) AS BIGINT)) AS u
      FROM rk
    ),
    kk AS (
      SELECT event_type, n,
             list_max(list_transform(u, x -> abs(x))) AS k,
             list_position(list_transform(u, x -> abs(x)),
                 list_max(list_transform(u, x -> abs(x)))) AS cp
      FROM uu
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           CAST(k AS BIGINT) AS k_stat,
           CAST(cp AS BIGINT) AS cp_index,
           FLOOR(LEAST(1.0,
               2.0 * EXP(-(6.0 * k * k)
                         / (CAST(n AS DOUBLE) * n * n
                            + CAST(n AS DOUBLE) * n)))
               * 1000000.0 + 0.5) / 1000000.0 AS p_value
    FROM kk
    """,
)
def ts_pettitt_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt changepoint test per event type (Pettitt 1979): the
    rank-based single-changepoint detector — U_t compares the first t
    days against the rest Mann-Whitney-style at EVERY split point;
    K = max|U_t| locates the most probable break (cp_index) with the
    classic approximate significance p ≈ 2·exp(−6K²/(n³+n²)).
    Complements ts_cusum_changepoint (CUSUM needs a mean/σ model;
    Pettitt is distribution-free, the standard hydrology/monitoring
    pick when the metric is heavy-tailed) and stat_mann_kendall
    (monotone trend vs single shift).

    ALL-INTEGER core via the rank identity U_t = t(n+1) − Σ_{i≤t}
    r2_i with doubled midranks r2 = 2·(#less) + (#eq) + 1 (exact —
    the .5s cancel against t(n+1); ties contribute 0 to U exactly as
    sgn = 0 requires). K and cp_index are exact int64; the ONLY
    float is the emitted p-value (one exp, qround(6), clamped at 1).
    First-maximum tie-break: both engines take the first position of
    the max (Spark array_position / DuckDB list_position on the
    leftmost match).

    100 TB: the _daily_series bill + O(n²) per-series array
    arithmetic (midranks and prefix sums over the collected daily
    array — n = days, bounded; the corpus-scale work remains the one
    daily hash aggregate)."""
    ev = load_table(spark, sf_dir, "events")
    dc = (
        ev.select("event_type", F.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    arr = (
        dc.groupBy("event_type")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("day", "c"))),
                lambda s: s["c"].cast("double"),
            ).alias("v"),
            F.count(F.lit(1)).cast("int").alias("n"),
        )
        .filter(F.col("n") >= 2)
    )
    vv = F.col("v")
    r2 = F.transform(
        vv,
        lambda x: (
            2 * F.size(F.filter(vv, lambda y: y < x))
            + F.size(F.filter(vv, lambda y: y == x))
            + 1
        ).cast("long"),
    )
    rk = arr.select("event_type", "n", r2.alias("r2"))
    n = F.col("n")
    u = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda t: (t * (n + 1)).cast("long")
        - F.aggregate(
            F.slice(F.col("r2"), 1, t),
            F.lit(0).cast("long"),
            lambda acc, y: acc + y,
        ),
    )
    uu = rk.select("event_type", "n", u.alias("u"))
    au = F.transform(F.col("u"), lambda x: F.abs(x))
    kk = uu.select(
        "event_type",
        "n",
        F.array_max(au).alias("k"),
        F.array_position(au, F.array_max(au)).alias("cp"),
    )
    kd = F.col("k").cast("double")
    nd = F.col("n").cast("double")
    p = F.least(
        F.lit(1.0),
        F.lit(2.0)
        * F.exp(-(F.lit(6.0) * kd * kd) / (nd * nd * nd + nd * nd)),
    )
    return kk.select(
        "event_type",
        n.cast("long").alias("n_days"),
        F.col("k").cast("long").alias("k_stat"),
        F.col("cp").cast("long").alias("cp_index"),
        qround(p, 6).alias("p_value"),
    )


@query(
    "ts_record_counts",
    oracle="""
    WITH dc AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    arr AS (
      SELECT event_type,
             list(CAST(c AS DOUBLE) ORDER BY day) AS v,
             CAST(COUNT(*) AS INT) AS n
      FROM dc GROUP BY event_type
    ),
    rec AS (
      SELECT event_type, n,
             CAST(len(list_filter(generate_series(2, n),
                 t -> v[CAST(t AS INT)]
                      > list_max(v[1:CAST(t - 1 AS INT)])))
                 + 1 AS BIGINT) AS u_rec,
             CAST(len(list_filter(generate_series(2, n),
                 t -> v[CAST(t AS INT)]
                      < list_min(v[1:CAST(t - 1 AS INT)])))
                 + 1 AS BIGINT) AS l_rec,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(generate_series(1, n),
                     k -> 1.0 / k)), (acc, y) -> acc + y) AS h_n,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(generate_series(2, n),
                     k -> 2.0 / k)), (acc, y) -> acc + y) AS var_d
      FROM arr WHERE n >= 2
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days, u_rec, l_rec,
           CAST(u_rec - l_rec AS BIGINT) AS d_stat,
           FLOOR(h_n * 1000000.0 + 0.5) / 1000000.0 AS e_records,
           CASE WHEN var_d > 0 THEN
               FLOOR(CAST(u_rec - l_rec AS DOUBLE) / SQRT(var_d)
                     * 1000000.0 + 0.5) / 1000000.0
           END AS z
    FROM rec
    """,
)
def ts_record_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-statistics trend test per event type (Foster & Stuart
    1954): count STRICT upper and lower records in the daily series
    (day 1 is both by convention) — under exchangeability both counts
    have mean H_n = Σ1/k, so D = U − L far from 0 flags monotone
    drift with ZERO distributional assumptions and near-zero compute.
    The classical third member of the trend family: stat_mann_kendall
    uses all pairs, ts_pettitt_changepoint locates one break, records
    use only the running extremes (and are therefore the one trend
    signal that survives arbitrary monotone transforms of the
    metric). z = D/√(2·Σ_{k≥2}1/k), the Foster-Stuart normal
    approximation.

    Record counts are EXACT integers from stateless array predicates
    (v[t] vs max/min of the strict prefix — no recurrence, no fold
    state; ties are not records, identically both engines on
    integer-valued doubles); the harmonic sums fold sequentially (the
    ts_holt_winters contract); the only floats are the emitted
    expectation and z, qround(6). n = 1 series are dropped (the
    prefix slice would hit the ANSI descending-sequence trap; a
    1-day series has no trend to test).

    100 TB: the _daily_series bill + O(n²) prefix-extreme checks per
    series (days bounded; corpus-scale work is the daily hash
    aggregate)."""
    ev = load_table(spark, sf_dir, "events")
    dc = (
        ev.select("event_type", F.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    arr = (
        dc.groupBy("event_type")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("day", "c"))),
                lambda s: s["c"].cast("double"),
            ).alias("v"),
            F.count(F.lit(1)).cast("int").alias("n"),
        )
        .filter(F.col("n") >= 2)
    )
    vv = F.col("v")
    n = F.col("n")
    u_rec = (
        F.size(
            F.filter(
                F.sequence(F.lit(2), n),
                lambda t: F.element_at(vv, t)
                > F.array_max(F.slice(vv, 1, t - 1)),
            )
        )
        + 1
    ).cast("long")
    l_rec = (
        F.size(
            F.filter(
                F.sequence(F.lit(2), n),
                lambda t: F.element_at(vv, t)
                < F.array_min(F.slice(vv, 1, t - 1)),
            )
        )
        + 1
    ).cast("long")

    def hsum(lo, expr):
        return F.aggregate(
            F.transform(F.sequence(F.lit(lo), n), expr),
            F.lit(0.0),
            lambda acc, y: acc + y,
        )

    h_n = hsum(1, lambda k: F.lit(1.0) / k)
    var_d = hsum(2, lambda k: F.lit(2.0) / k)
    rec = arr.select(
        "event_type",
        "n",
        u_rec.alias("u_rec"),
        l_rec.alias("l_rec"),
        h_n.alias("h_n"),
        var_d.alias("var_d"),
    )
    d_stat = (F.col("u_rec") - F.col("l_rec")).cast("long")
    return rec.select(
        "event_type",
        n.cast("long").alias("n_days"),
        "u_rec",
        "l_rec",
        d_stat.alias("d_stat"),
        qround(F.col("h_n"), 6).alias("e_records"),
        F.when(
            F.col("var_d") > 0,
            qround(
                d_stat.cast("double") / F.sqrt(F.col("var_d")), 6
            ),
        ).alias("z"),
    )


@query(
    "ts_spc_ewma_chart",
    oracle="""
    WITH dc AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    arr AS (
      SELECT event_type,
             list(CAST(c AS DOUBLE) ORDER BY day) AS v,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS BIGINT) AS s1,
             CAST(SUM(c * c) AS BIGINT) AS s2
      FROM dc GROUP BY event_type
    ),
    mom AS (
      SELECT event_type, v, n,
             CAST(s1 AS DOUBLE) / n AS mu,
             SQRT(CAST(n * s2 - s1 * s1 AS DOUBLE)
                  / (CAST(n AS DOUBLE) * n * (n - 1))) AS sig
      FROM arr WHERE n >= 2 AND n * s2 - s1 * s1 > 0
    ),
    chart AS (
      SELECT event_type, n, mu, sig,
             list_reduce(
                 list_prepend([mu, 0.0, 1.0],
                     list_transform(v, x -> [x, 0.0, 0.0])),
                 (acc, e) -> [
                     0.2 * e[1] + 0.8 * acc[1],
                     acc[2] + CASE WHEN
                         abs(0.2 * e[1] + 0.8 * acc[1] - mu)
                         > 3.0 * sig * sqrt(0.2 / 1.8
                             * (1.0 - acc[3] * 0.64))
                         THEN 1.0 ELSE 0.0 END,
                     acc[3] * 0.64]) AS st
      FROM mom
    )
    SELECT event_type, n AS n_days,
           FLOOR(mu * 1000000.0 + 0.5) / 1000000.0 AS mean_c,
           FLOOR(sig * 1000000.0 + 0.5) / 1000000.0 AS sigma_c,
           FLOOR(st[1] * 1000000.0 + 0.5) / 1000000.0 AS ewma_final,
           CAST(st[2] AS BIGINT) AS n_violations
    FROM chart
    """,
)
def ts_spc_ewma_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart per event type (Roberts 1959; Montgomery's
    SPC ch. 9 form): z_t = λ·c_t + (1−λ)·z_{t−1} with λ = 0.2 from
    z_0 = μ̄, flagged when |z_t − μ̄| exceeds the time-varying limit
    L·σ̂·√(λ/(2−λ)·(1−(1−λ)^{2t})) with L = 3 — the small-shift
    detector that completes the SPC pair: ts_spc_xbar_r catches big
    jumps per subgroup, the EWMA chart accumulates evidence and
    catches sustained ~1σ drifts Shewhart limits never see; the
    monitoring chart SRE playbooks layer beside ts_cusum_drift.

    Determinism ladder: μ̄ and σ̂ are exact-integer-moment ratios
    under one sqrt (sqrt is CORRECTLY ROUNDED by IEEE — unlike
    exp/ln it cannot diverge cross-engine); the recurrence folds a
    3-element LIST state [z, violations, (1−λ)^{2t}] sequentially
    (the ts_holt_winters LIST-state rule — never a struct state),
    with the (1−λ)^{2t} factor carried MULTIPLICATIVELY in the fold
    so no libm pow exists anywhere; the in-fold limit comparison
    therefore compares identically-computed doubles on both engines
    (the kpss denominator-predicate class) and the violation COUNT
    is an exact integer. Constant or single-day series are dropped
    by an integer predicate (n·Σc² − (Σc)² > 0).

    100 TB: the _daily_series bill — one corpus-scale daily hash
    aggregate, then O(n) per-series fold arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    dc = (
        ev.select("event_type", F.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    arr = dc.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "c"))),
            lambda s: s["c"].cast("double"),
        ).alias("v"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    mom = arr.filter((n >= 2) & (n * s2 - s1 * s1 > 0)).select(
        "event_type",
        "v",
        "n",
        (s1.cast("double") / n).alias("mu"),
        F.sqrt(
            (n * s2 - s1 * s1).cast("double")
            / (n.cast("double") * n * (n - 1))
        ).alias("sig"),
    )
    mu, sig = F.col("mu"), F.col("sig")

    def step(acc, x):
        z = F.lit(0.2) * x + F.lit(0.8) * F.element_at(acc, 1)
        fpow = F.element_at(acc, 3) * F.lit(0.64)
        lim = (
            F.lit(3.0)
            * sig
            * F.sqrt(F.lit(0.2) / F.lit(1.8) * (F.lit(1.0) - fpow))
        )
        viol = F.element_at(acc, 2) + F.when(
            F.abs(z - mu) > lim, F.lit(1.0)
        ).otherwise(F.lit(0.0))
        return F.array(z, viol, fpow)

    st = F.aggregate(
        F.col("v"), F.array(mu, F.lit(0.0), F.lit(1.0)), step
    )
    chart = mom.select("event_type", "n", "mu", "sig", st.alias("st"))
    return chart.select(
        "event_type",
        F.col("n").alias("n_days"),
        qround(mu, 6).alias("mean_c"),
        qround(sig, 6).alias("sigma_c"),
        qround(F.element_at(F.col("st"), 1), 6).alias("ewma_final"),
        F.element_at(F.col("st"), 2).cast("long").alias("n_violations"),
    )


_SE_M = 2  # template length m (A counts m+1 = 3)


@query(
    "ts_sample_entropy",
    oracle=f"""
    WITH dc AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    arr AS (
        SELECT event_type,
               list_transform(list_sort(list({{'day': day, 'c': c}})),
                              _sv -> _sv.c) AS v,
               CAST(COUNT(*) AS INT) AS n
        FROM dc GROUP BY event_type
    ),
    tol AS (
        SELECT event_type, v, n,
               GREATEST(CAST(1 AS BIGINT),
                        (list_max(v) - list_min(v)) >> 3) AS r
        FROM arr
    ),
    cnt AS (
        SELECT event_type, n, r,
            CASE WHEN n >= 4 THEN
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_transform(generate_series(1, n - 1), _si ->
                        CAST(len(list_filter(generate_series(1, n - 1),
                            _sj -> _sj > _si
                               AND abs(v[_si] - v[_sj]) <= r
                               AND abs(v[_si + 1] - v[_sj + 1]) <= r))
                             AS BIGINT))),
                    (acc, x) -> acc + x)
            END AS b_count,
            CASE WHEN n >= 4 THEN
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_transform(generate_series(1, n - 2), _si ->
                        CAST(len(list_filter(generate_series(1, n - 2),
                            _sj -> _sj > _si
                               AND abs(v[_si] - v[_sj]) <= r
                               AND abs(v[_si + 1] - v[_sj + 1]) <= r
                               AND abs(v[_si + 2] - v[_sj + 2]) <= r))
                             AS BIGINT))),
                    (acc, x) -> acc + x)
            END AS a_count
        FROM tol
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days, r,
           b_count, a_count,
           CASE WHEN a_count > 0 THEN
               FLOOR((LN(CAST(b_count AS DOUBLE))
                      - LN(CAST(a_count AS DOUBLE)))
                     * 1000000.0 + 0.5) / 1000000.0
           END AS sampen
    FROM cnt
    """,
)
def ts_sample_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample entropy (Richman & Moorman 2000) of each event type's
    daily-count series — the regularity/complexity diagnostic:
    SampEn(m, r) = −ln(A/B) where B counts pairs of m-length
    templates within Chebyshev tolerance r and A the same at m+1.
    Low SampEn = self-similar/periodic load; high = irregular.
    Completes the complexity corner next to ts_permutation_entropy
    (ordinal patterns) and ts_entropy_rate (symbol blocks): SampEn
    sees AMPLITUDE similarity, which ordinal/symbolic entropies
    discard. m = 2, r = max(1, range >> 3) — an integer tolerance
    derived from exact integer extremes (the published 0.2·σ choice
    puts a float in the MATCH PREDICATE, banned; the documented
    integer surrogate keeps every template comparison int64-exact).

    All-integer counts: daily counts are exact int64, the tolerance
    is a shift of their exact range, both template censuses are
    integer comparisons folded over identical index sequences —
    A ≤ B by construction (every m+1 match is an m match; pinned in
    tests/test_stat_invariants.py), so SampEn = ln B − ln A ≥ 0 with
    both log arguments exact integers (the all-integer-args entropy
    discipline). Series under 4 days NULL the censuses; A = 0 NULLs
    SampEn (CASE both engines; Spark's sequence would DESCEND on
    n − 2 < 1 under ANSI, so the n >= 4 guard is load-bearing).

    100 TB shape: one corpus-scale daily hash aggregate; the O(n²)
    template census is per-series array arithmetic (n = |days|,
    metadata-sized) distributed by series key — the ts_kpss bill
    class."""
    ev = load_table(spark, sf_dir, "events")
    dc = (
        ev.select("event_type", F.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    arr = dc.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "c"))),
            lambda s: s["c"],
        ).alias("v"),
        F.count(F.lit(1)).cast("int").alias("n"),
    )
    n = F.col("n")
    r = F.greatest(
        F.lit(1).cast("long"),
        F.shiftright(
            F.array_max(F.col("v")) - F.array_min(F.col("v")), 3
        ),
    )
    tol = arr.select("event_type", "v", "n", r.alias("r"))
    v = F.col("v")

    def census(m: int):
        """Σ_{i<j} [templates of length m+1 within r] over indices
        1..n-m (1-based; template k spans v[k..k+m])."""
        hi = n - m

        def close(i, j):
            cond = F.lit(True)
            for d in range(m + 1):
                cond = cond & (
                    F.abs(
                        F.element_at(v, i + d) - F.element_at(v, j + d)
                    )
                    <= F.col("r")
                )
            return cond

        return F.aggregate(
            F.sequence(F.lit(1), hi),
            F.lit(0).cast("long"),
            lambda acc, i: acc
            + F.size(
                F.filter(
                    F.sequence(F.lit(1), hi),
                    lambda j: (j > i) & close(i, j),
                )
            ).cast("long"),
        )

    cnt = tol.select(
        "event_type",
        "n",
        "r",
        F.when(n >= 4, census(_SE_M - 1)).alias("b_count"),
        F.when(n >= 4, census(_SE_M)).alias("a_count"),
    )
    return cnt.select(
        F.col("event_type"),
        n.cast("long").alias("n_days"),
        "r",
        "b_count",
        "a_count",
        F.when(
            F.col("a_count") > 0,
            qround(
                F.log(F.col("b_count").cast("double"))
                - F.log(F.col("a_count").cast("double")),
                6,
            ),
        ).alias("sampen"),
    )


_MP_M = 4  # subsequence window length


@query(
    "ts_matrix_profile",
    oracle=f"""
    WITH dc AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    arr AS (
        SELECT event_type,
               list_transform(list_sort(list({{'day': day, 'c': c}})),
                              _mv -> _mv.c) AS v,
               CAST(COUNT(*) AS INT) AS n
        FROM dc GROUP BY event_type
    ),
    win AS (
        SELECT event_type, v, n, n - {_MP_M} + 1 AS nw,
            list_transform(generate_series(1, n - {_MP_M} + 1), _wi ->
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_transform(generate_series(0, {_MP_M} - 1),
                        _wk -> v[CAST(_wi + _wk AS INT)])),
                    (acc, x) -> acc + x)) AS sw,
            list_transform(generate_series(1, n - {_MP_M} + 1), _wi ->
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_transform(generate_series(0, {_MP_M} - 1),
                        _wk -> v[CAST(_wi + _wk AS INT)]
                               * v[CAST(_wi + _wk AS INT)])),
                    (acc, x) -> acc + x)) AS qw
        FROM arr WHERE n >= 2 * {_MP_M}
    ),
    dnm AS (
        SELECT event_type, v, n, nw, sw, qw,
            list_transform(generate_series(1, nw), _di ->
                {_MP_M} * qw[_di] - sw[_di] * sw[_di]) AS dint
        FROM win
    ),
    mp AS (
        SELECT event_type, CAST(u.i AS BIGINT) AS w_idx,
            CASE WHEN dnm.dint[u.i] > 0 THEN
                list_reduce(list_prepend(
                    [CAST(1e300 AS DOUBLE), CAST(0 AS DOUBLE)],
                    list_transform(generate_series(1, nw), _mj ->
                        CASE WHEN abs(_mj - u.i) >= {_MP_M}
                                  AND dnm.dint[_mj] > 0
                             THEN [CAST(2 * {_MP_M} AS DOUBLE)
                                   * (CAST(1 AS DOUBLE)
                                      - CAST({_MP_M}
                                          * list_reduce(list_prepend(
                                                CAST(0 AS BIGINT),
                                                list_transform(
                                                  generate_series(0,
                                                      {_MP_M} - 1),
                                                  _mk -> v[CAST(u.i + _mk
                                                           AS INT)]
                                                     * v[CAST(_mj + _mk
                                                           AS INT)])),
                                            (acc, x) -> acc + x)
                                          - sw[u.i] * sw[_mj] AS DOUBLE)
                                        / (sqrt(CAST(dnm.dint[u.i]
                                                     AS DOUBLE))
                                           * sqrt(CAST(dnm.dint[_mj]
                                                       AS DOUBLE)))),
                                   CAST(_mj AS DOUBLE)]
                             ELSE [CAST(1e300 AS DOUBLE),
                                   CAST(0 AS DOUBLE)] END)),
                    (_ma, _mx) ->
                        [CASE WHEN _mx[1] < _ma[1] THEN _mx[1]
                              ELSE _ma[1] END,
                         CASE WHEN _mx[1] < _ma[1] THEN _mx[2]
                              ELSE _ma[2] END])
            END AS best
        FROM dnm, UNNEST(generate_series(1, nw)) AS u(i)
    )
    SELECT event_type, w_idx,
           CASE WHEN best IS NOT NULL AND best[2] > 0
                THEN CAST(best[2] AS BIGINT) END AS nn_idx,
           CASE WHEN best IS NOT NULL AND best[2] > 0 THEN
               FLOOR(sqrt(GREATEST(CAST(0 AS DOUBLE), best[1]))
                     * 1000000.0 + 0.5) / 1000000.0
           END AS nn_dist
    FROM mp
    """,
)
def ts_matrix_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matrix profile (Yeh et al., ICDM 2016) of each event type's
    daily-count series at window m = 4: for every subsequence, the
    z-normalized Euclidean distance to its nearest non-trivial
    neighbor (exclusion zone |i−j| ≥ m) and that neighbor's index —
    THE modern motif/discord primitive: low profile = repeated motif,
    high = discord/anomaly (the shape-aware upgrade of
    ts_anomaly_zscore's pointwise screen).

    Exactness: every moment is an exact int64 sufficient statistic
    (window sums S, Q, cross-sums Σxy over integer daily counts), so
    d²(i,j) = 2m(1 − (m·Σxy − S_i·S_j)/(√den_i·√den_j)) is assembled
    from identical doubles by identical fixed-shape IEEE ops — sqrt
    is correctly rounded (the one libm exception) and den stays
    integral (den = m·Q − S², the constant-window test is an EXACT
    integer = 0, never a float epsilon). The argmin therefore
    compares bit-identical doubles on both engines; ties break to
    the smaller j (strict-< fold over an identical index order).
    m·Σxy and S·S stay in int64 to ~10⁹ events/day; the pair
    product of dens is avoided exactly because it would overflow
    (√·√ instead, documented).

    Constant windows (den = 0) have no z-normalization: their rows
    emit NULL nn_idx/nn_dist and they are excluded as neighbors —
    mirrored CASEs both engines. Series shorter than 2m emit
    nothing (no valid neighbor exists under the exclusion zone).

    100 TB shape: one corpus-scale daily aggregate, then per-series
    O(W²·m) array arithmetic (W = |days| − m + 1, metadata-sized)
    under the series key — the ts_kpss bill class; the production
    escape hatch for year-scale minutely series is the published
    STOMP recurrence, same statistics, O(W²) total."""
    ev = load_table(spark, sf_dir, "events")
    m = _MP_M
    dc = (
        ev.select("event_type", F.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    arr = dc.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "c"))),
            lambda s: s["c"],
        ).alias("v"),
        F.count(F.lit(1)).cast("int").alias("n"),
    )
    win = arr.filter(F.col("n") >= 2 * m).select(
        "event_type",
        "v",
        (F.col("n") - m + 1).alias("nw"),
    )
    v = F.col("v")

    def wsum(i, fx):
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(m - 1)),
            F.lit(0).cast("long"),
            lambda acc, k: acc + fx(F.element_at(v, (i + k).cast("int"))),
        )

    nw = F.col("nw")
    dnm = win.select(
        "event_type",
        "v",
        "nw",
        F.transform(
            F.sequence(F.lit(1), nw), lambda i: wsum(i, lambda x: x)
        ).alias("sw"),
        F.transform(
            F.sequence(F.lit(1), nw), lambda i: wsum(i, lambda x: x * x)
        ).alias("qw"),
    ).select(
        "event_type",
        "v",
        "nw",
        "sw",
        F.transform(
            F.sequence(F.lit(1), nw),
            lambda i: m * F.element_at(F.col("qw"), i)
            - F.element_at(F.col("sw"), i)
            * F.element_at(F.col("sw"), i),
        ).alias("dint"),
    )
    sw, dint = F.col("sw"), F.col("dint")

    def xsum(i, j):
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(m - 1)),
            F.lit(0).cast("long"),
            lambda acc, k: acc
            + F.element_at(v, (i + k).cast("int"))
            * F.element_at(v, (j + k).cast("int")),
        )

    def d2(i, j):
        num = (m * xsum(i, j) - F.element_at(sw, i) * F.element_at(sw, j)).cast(
            "double"
        )
        den = F.sqrt(F.element_at(dint, i).cast("double")) * F.sqrt(
            F.element_at(dint, j).cast("double")
        )
        return F.lit(float(2 * m)) * (F.lit(1.0) - num / den)

    def best_for(i):
        # d2 divides by sqrt(dint_j): it must live in lazy when()
        # VALUES only — ANSI evaluates both conjuncts of a CONDITION,
        # so a dint_j = 0 neighbor would throw DIVIDE_BY_ZERO there
        # (the stat_fleiss_kappa rule). Invalid j's candidate becomes
        # 1e301 (> the 1e300 init, never selected, division never
        # evaluated).
        def cand(j):
            return F.when(
                (F.abs(j - i) >= m) & (F.element_at(dint, j) > 0),
                d2(i, j),
            ).otherwise(F.lit(1e301))

        return F.aggregate(
            F.sequence(F.lit(1), nw),
            F.array(F.lit(1e300), F.lit(0.0)),
            lambda acc, j: F.when(
                cand(j) < F.element_at(acc, 1),
                F.array(cand(j), j.cast("double")),
            ).otherwise(acc),
        )

    mp = dnm.select(
        "event_type",
        "nw",
        "v",
        "sw",
        "dint",
        F.explode(F.sequence(F.lit(1), nw)).alias("i"),
    ).select(
        "event_type",
        F.col("i").cast("long").alias("w_idx"),
        F.when(
            F.element_at(dint, F.col("i")) > 0, best_for(F.col("i"))
        ).alias("best"),
    )
    b = F.col("best")
    return mp.select(
        "event_type",
        "w_idx",
        F.when(
            b.isNotNull() & (F.element_at(b, 2) > 0),
            F.element_at(b, 2).cast("long"),
        ).alias("nn_idx"),
        F.when(
            b.isNotNull() & (F.element_at(b, 2) > 0),
            qround(
                F.sqrt(F.greatest(F.lit(0.0), F.element_at(b, 1))), 6
            ),
        ).alias("nn_dist"),
    )


_SES_GRID = 9  # alpha = k/10 for k = 1..9


@query(
    "ts_ses_grid_search",
    oracle=f"""
    WITH dc AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    arr AS (
        SELECT event_type,
               list_transform(list_sort(list({{'day': day, 'c': c}})),
                              _gv -> CAST(_gv.c AS DOUBLE)) AS v,
               CAST(COUNT(*) AS INT) AS n
        FROM dc GROUP BY event_type
    ),
    fit AS (
        SELECT event_type, n,
            list_reduce(list_prepend(
                [CAST(1e300 AS DOUBLE), CAST(0 AS DOUBLE)],
                list_transform(generate_series(1, {_SES_GRID}), _gk ->
                    [list_reduce(list_prepend([v[1], CAST(0 AS DOUBLE)],
                        list_transform(v[2:], _gx -> [_gx,
                                                      CAST(0 AS DOUBLE)])),
                        (acc, x) ->
                          [(CAST(_gk AS DOUBLE) / CAST(10 AS DOUBLE))
                               * x[1]
                           + (CAST(1 AS DOUBLE)
                              - CAST(_gk AS DOUBLE) / CAST(10 AS DOUBLE))
                               * acc[1],
                           acc[2] + (x[1] - acc[1]) * (x[1] - acc[1])]
                        )[2],
                     CAST(_gk AS DOUBLE)])),
              (_ga, _gx2) ->
                  [CASE WHEN _gx2[1] < _ga[1] THEN _gx2[1]
                        ELSE _ga[1] END,
                   CASE WHEN _gx2[1] < _ga[1] THEN _gx2[2]
                        ELSE _ga[2] END]) AS best
        FROM arr WHERE n >= 2
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           CAST(best[2] AS BIGINT) AS best_alpha_x10,
           FLOOR(best[1] * 1000000.0 + 0.5) / 1000000.0 AS sse
    FROM fit
    """,
)
def ts_ses_grid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple-exponential-smoothing parameter selection by grid
    search: fit SES at alpha = 0.1..0.9 over each event type's daily
    counts, score each fit by the one-step-ahead sum of squared
    errors (err_t = x_t − s_{t−1}, s_t = alpha·x_t + (1−alpha)·s_{t−1},
    s_1 = x_1), and pick the argmin — the model-selection step the
    forecasting family (ts_ewma, ts_holt_winters, ts_backtest_snaive)
    assumed a fixed parameter for. Low best-alpha = stable series
    (history matters), high = level-shifting (react fast).

    Exact selection on floats, the ts_matrix_profile discipline: x
    are exact integer counts, alpha = k/10 is one correctly-rounded
    division per engine, every SES state and SSE is built by
    identical fixed-shape +/×/− folds over the identically-sorted
    series — so all 9 SSEs are bit-identical doubles on both engines,
    and the strict-< argmin (ties to the smaller alpha, fold order)
    is engine-exact with no rounding grid in the SELECTION. The SSE
    emits on the qround(6) grid. The oracle folds LIST states
    element-wise throughout (the vectorized list_reduce rule) and
    renames every fold's lambda vars apart (the nesting rule).
    Single-day series (n < 2) have no one-step error and emit
    nothing.

    100 TB shape: one corpus-scale daily hash aggregate; 9 × O(n)
    fold arithmetic per series (n = |days|) under the series key —
    the ts_kpss bill class; a finer alpha grid multiplies only the
    fold count."""
    ev = load_table(spark, sf_dir, "events")
    dc = (
        ev.select("event_type", F.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    arr = dc.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "c"))),
            lambda s: s["c"].cast("double"),
        ).alias("v"),
        F.count(F.lit(1)).cast("int").alias("n"),
    )
    v = F.col("v")

    def sse_for(alpha):
        """One-step-ahead SSE of the SES fold at a (Column) alpha."""
        return F.element_at(
            F.aggregate(
                F.slice(v, 2, F.size(v) - 1),
                F.array(F.element_at(v, 1), F.lit(0.0)),
                lambda acc, x: F.array(
                    alpha * x
                    + (F.lit(1.0) - alpha) * F.element_at(acc, 1),
                    F.element_at(acc, 2)
                    + (x - F.element_at(acc, 1))
                    * (x - F.element_at(acc, 1)),
                ),
            ),
            2,
        )

    def cand(k):
        return sse_for(k.cast("double") / F.lit(10.0))

    best = F.aggregate(
        F.sequence(F.lit(1), F.lit(_SES_GRID)),
        F.array(F.lit(1e300), F.lit(0.0)),
        lambda acc, k: F.array(
            F.when(
                cand(k) < F.element_at(acc, 1), cand(k)
            ).otherwise(F.element_at(acc, 1)),
            F.when(
                cand(k) < F.element_at(acc, 1), k.cast("double")
            ).otherwise(F.element_at(acc, 2)),
        ),
    )
    return (
        arr.filter(F.col("n") >= 2)
        .select("event_type", "n", best.alias("best"))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_days"),
            F.element_at(F.col("best"), 2).cast("long").alias(
                "best_alpha_x10"
            ),
            qround(F.element_at(F.col("best"), 1), 6).alias("sse"),
        )
    )


_EDIV_MMIN = 4  # minimum segment size either side of the split


@query(
    "ts_ediv_changepoint",
    oracle=f"""
    WITH dc AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    arr AS (
        SELECT event_type,
               list_transform(list_sort(list({{'day': day, 'c': c}})),
                              _ev -> _ev.c) AS v,
               CAST(COUNT(*) AS INT) AS n
        FROM dc GROUP BY event_type
    ),
    lr AS (
        SELECT event_type, v, n,
            list_transform(generate_series(1, n), _ei ->
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_transform(generate_series(1, n), _ej ->
                        CASE WHEN _ej < _ei
                             THEN abs(v[_ei] - v[_ej])
                             ELSE CAST(0 AS BIGINT) END)),
                    (_la, _lx) -> _la + _lx)) AS lft,
            list_transform(generate_series(1, n), _ei ->
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_transform(generate_series(1, n), _ej ->
                        CASE WHEN _ej > _ei
                             THEN abs(v[_ei] - v[_ej])
                             ELSE CAST(0 AS BIGINT) END)),
                    (_ra, _rx) -> _ra + _rx)) AS rgt
        FROM arr WHERE n >= 2 * {_EDIV_MMIN}
    ),
    fit AS (
        SELECT event_type, n,
            list_reduce(list_prepend(
                [CAST(rgt[1] AS DOUBLE),
                 CAST(0 AS DOUBLE),
                 CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), lft),
                                  (_ta, _tx) -> _ta + _tx)
                      - rgt[1] AS DOUBLE),
                 CAST(-1e300 AS DOUBLE),
                 CAST(0 AS DOUBLE)],
                list_transform(generate_series(2, n - 1), _ek ->
                    [CAST(lft[_ek] AS DOUBLE), CAST(rgt[_ek] AS DOUBLE),
                     CAST(_ek AS DOUBLE)])),
              (_ea, _ex) ->
                [_ea[1] - _ex[1] + _ex[2],
                 _ea[2] + _ex[1],
                 _ea[3] - _ex[2],
                 CASE WHEN _ex[3] >= {_EDIV_MMIN}
                       AND _ex[3] <= n - {_EDIV_MMIN}
                       AND (CAST(2 AS DOUBLE) * (_ea[1] - _ex[1] + _ex[2]))
                             / n
                           - (CAST(2 AS DOUBLE) * (_ea[2] + _ex[1])
                              * (n - _ex[3]))
                             / (n * (_ex[3] - 1))
                           - (CAST(2 AS DOUBLE) * (_ea[3] - _ex[2])
                              * _ex[3])
                             / (n * (n - _ex[3] - 1))
                           > _ea[4]
                      THEN (CAST(2 AS DOUBLE) * (_ea[1] - _ex[1] + _ex[2]))
                             / n
                           - (CAST(2 AS DOUBLE) * (_ea[2] + _ex[1])
                              * (n - _ex[3]))
                             / (n * (_ex[3] - 1))
                           - (CAST(2 AS DOUBLE) * (_ea[3] - _ex[2])
                              * _ex[3])
                             / (n * (n - _ex[3] - 1))
                      ELSE _ea[4] END,
                 CASE WHEN _ex[3] >= {_EDIV_MMIN}
                       AND _ex[3] <= n - {_EDIV_MMIN}
                       AND (CAST(2 AS DOUBLE) * (_ea[1] - _ex[1] + _ex[2]))
                             / n
                           - (CAST(2 AS DOUBLE) * (_ea[2] + _ex[1])
                              * (n - _ex[3]))
                             / (n * (_ex[3] - 1))
                           - (CAST(2 AS DOUBLE) * (_ea[3] - _ex[2])
                              * _ex[3])
                             / (n * (n - _ex[3] - 1))
                           > _ea[4]
                      THEN _ex[3]
                      ELSE _ea[5] END]) AS st
        FROM lr
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           CAST(st[5] AS BIGINT) AS cp_tau,
           FLOOR(st[4] * 1000000.0 + 0.5) / 1000000.0 AS best_q
    FROM fit
    """,
)
def ts_ediv_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-divisive single changepoint (Matteson & James 2014, JASA):
    the split of each event type's daily-count series maximizing the
    scaled sample energy divergence Q(τ) = (τ(n−τ)/n)·Ê(τ), where Ê
    compares BETWEEN-segment vs within-segment mean absolute
    differences — a DISTRIBUTION-change detector (variance, shape,
    tails), where ts_cusum_changepoint/ts_pettitt_changepoint see
    only mean/location shifts. α = 1 (absolute differences) keeps
    every pairwise statistic an exact int64.

    Sufficient-statistic fold: precompute per-element left/right
    absolute-difference sums L(k), R(k) (exact int64, O(n²) array
    arithmetic); then one fold over τ carries [B, W_L, W_R] by the
    exact transition B' = B − L(τ+1) + R(τ+1), W_L' += L, W_R' −= R
    — all integer-valued doubles far inside 2⁵³, so Q's three-term
    fixed-shape expression produces bit-identical doubles on both
    engines and the strict-> argmax (ties to the EARLIEST τ) is
    engine-exact (the ts_matrix_profile selection discipline).
    Minimum segment m = 4 each side; series under 2m emit nothing —
    and the m ≥ 2 floor keeps the τ(τ−1) denominators nonzero, so
    no guard ratio ever evaluates at 0 (ANSI rule). Oracle folds an
    element-wise LIST state with per-fold lambda names (both
    vectorized list_reduce rules).

    100 TB shape: one corpus-scale daily hash aggregate; O(n²)
    per-series array arithmetic under the series key (ts_kpss bill
    class). The full e-divisive recursion (binary segmentation with
    a permutation stop) replays this op per segment."""
    ev = load_table(spark, sf_dir, "events")
    m = _EDIV_MMIN
    dc = (
        ev.select("event_type", F.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    arr = dc.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "c"))),
            lambda s: s["c"],
        ).alias("v"),
        F.count(F.lit(1)).cast("int").alias("n"),
    )
    v, n = F.col("v"), F.col("n")

    def absdiff_sum(side):
        return F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.aggregate(
                F.sequence(F.lit(1), n),
                F.lit(0).cast("long"),
                lambda a, j: a
                + F.when(
                    side(j, i),
                    F.abs(
                        F.element_at(v, i) - F.element_at(v, j)
                    ),
                ).otherwise(F.lit(0).cast("long")),
            ),
        )

    lr = arr.filter(n >= 2 * m).select(
        "event_type",
        "v",
        "n",
        absdiff_sum(lambda j, i: j < i).alias("lft"),
        absdiff_sum(lambda j, i: j > i).alias("rgt"),
    )
    lft, rgt = F.col("lft"), F.col("rgt")
    total = F.aggregate(
        lft, F.lit(0).cast("long"), lambda a, x: a + x
    )
    init = F.array(
        F.element_at(rgt, 1).cast("double"),
        F.lit(0.0),
        (total - F.element_at(rgt, 1)).cast("double"),
        F.lit(-1e300),
        F.lit(0.0),
    )
    items = F.transform(
        F.sequence(F.lit(2), n - 1),
        lambda k: F.array(
            F.element_at(lft, k).cast("double"),
            F.element_at(rgt, k).cast("double"),
            k.cast("double"),
        ),
    )

    def fold(acc, x):
        b2 = F.element_at(acc, 1) - F.element_at(x, 1) + F.element_at(x, 2)
        wl2 = F.element_at(acc, 2) + F.element_at(x, 1)
        wr2 = F.element_at(acc, 3) - F.element_at(x, 2)
        tau = F.element_at(x, 3)
        nd = n.cast("double")
        q = (
            (F.lit(2.0) * b2) / nd
            - (F.lit(2.0) * wl2 * (nd - tau)) / (nd * (tau - F.lit(1.0)))
            - (F.lit(2.0) * wr2 * tau) / (nd * (nd - tau - F.lit(1.0)))
        )
        # q's (n-tau-1) denominator is 0 at tau = n-1, and ANSI
        # evaluates both conjuncts of a condition - so q lives in a
        # lazy when() VALUE gated by the segment-size guard (guard
        # true => tau <= n-m => denominators positive); the NULL qc
        # makes the comparison fall through (fleiss_kappa rule)
        qc = F.when(
            (tau >= F.lit(float(m))) & (tau <= nd - F.lit(float(m))), q
        )
        better = qc > F.element_at(acc, 4)
        return F.array(
            b2,
            wl2,
            wr2,
            F.when(better, qc).otherwise(F.element_at(acc, 4)),
            F.when(better, tau).otherwise(F.element_at(acc, 5)),
        )

    st = F.aggregate(items, init, fold)
    return lr.select(
        "event_type",
        n.cast("long").alias("n_days"),
        F.element_at(st, 5).cast("long").alias("cp_tau"),
        qround(F.element_at(st, 4), 6).alias("best_q"),
    )


_EDIV_B = 16  # deterministic permutations for the significance test

# The Q(tau) three-term expression over the running [B, W_L, W_R]
# state (_pa) and item (_px = [L(k), R(k), k]) — one definition
# feeding the fold's candidate, value, and tau branches.
_EDIV_Q_SQL = """(CAST(2 AS DOUBLE) * (_pa[1] - _px[1] + _px[2])) / n
    - (CAST(2 AS DOUBLE) * (_pa[2] + _px[1]) * (n - _px[3]))
      / (n * (_px[3] - 1))
    - (CAST(2 AS DOUBLE) * (_pa[3] - _px[2]) * _px[3])
      / (n * (n - _px[3] - 1))"""


def _ediv_sig_lr_sql(v: str, pfx: str) -> tuple[str, str]:
    """Left/right absolute-difference-sum array texts over column
    ``v`` (lambda names suffixed by ``pfx`` — the nesting rule)."""
    def one(op: str, tag: str) -> str:
        return f"""list_transform(generate_series(1, n), _i{pfx}{tag} ->
            list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(generate_series(1, n), _j{pfx}{tag} ->
                    CASE WHEN _j{pfx}{tag} {op} _i{pfx}{tag}
                         THEN abs({v}[_i{pfx}{tag}] - {v}[_j{pfx}{tag}])
                         ELSE CAST(0 AS BIGINT) END)),
                (_a{pfx}{tag}, _x{pfx}{tag}) ->
                    _a{pfx}{tag} + _x{pfx}{tag}))"""
    return one("<", "l"), one(">", "r")


_EDIV_SIG_FOLD_SQL = f"""list_reduce(list_prepend(
    [CAST(rgt[1] AS DOUBLE),
     CAST(0 AS DOUBLE),
     CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), lft),
                      (_sta, _stx) -> _sta + _stx)
          - rgt[1] AS DOUBLE),
     CAST(-1e300 AS DOUBLE),
     CAST(0 AS DOUBLE)],
    list_transform(generate_series(2, n - 1), _pk ->
        [CAST(lft[_pk] AS DOUBLE), CAST(rgt[_pk] AS DOUBLE),
         CAST(_pk AS DOUBLE)])),
  (_pa, _px) ->
    [_pa[1] - _px[1] + _px[2],
     _pa[2] + _px[1],
     _pa[3] - _px[2],
     CASE WHEN _px[3] >= {_EDIV_MMIN} AND _px[3] <= n - {_EDIV_MMIN}
           AND {_EDIV_Q_SQL} > _pa[4]
          THEN {_EDIV_Q_SQL} ELSE _pa[4] END,
     CASE WHEN _px[3] >= {_EDIV_MMIN} AND _px[3] <= n - {_EDIV_MMIN}
           AND {_EDIV_Q_SQL} > _pa[4]
          THEN _px[3] ELSE _pa[5] END])"""


@query(
    "ts_ediv_significance",
    oracle=f"""
    WITH dc AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    arr AS (
        SELECT event_type,
               list_transform(list_sort(list({{'day': day, 'c': c}})),
                              _sv -> _sv.c) AS v,
               CAST(COUNT(*) AS INT) AS n
        FROM dc GROUP BY event_type
    ),
    reps AS (
        SELECT event_type, n, u.b AS b,
            CASE WHEN u.b = 0 THEN v ELSE
                list_transform(
                    list_sort(list_transform(generate_series(1, n),
                        _qi -> {{'h': md5(CAST(u.b AS VARCHAR) || ':'
                                          || CAST(_qi AS VARCHAR)),
                                 'i': _qi}})),
                    _qs -> v[CAST(_qs.i AS INT)])
            END AS vb
        FROM arr, UNNEST(generate_series(0, {_EDIV_B})) AS u(b)
        WHERE n >= 2 * {_EDIV_MMIN}
    ),
    lr AS (
        SELECT event_type, n, b,
               {_ediv_sig_lr_sql("vb", "p")[0]} AS lft,
               {_ediv_sig_lr_sql("vb", "p")[1]} AS rgt
        FROM reps
    ),
    fit AS (
        SELECT event_type, n, b, {_EDIV_SIG_FOLD_SQL} AS st
        FROM lr
    ),
    agg AS (
        SELECT event_type,
               CAST(MAX(n) AS BIGINT) AS n_days,
               MAX(CASE WHEN b = 0 THEN st[4] END) AS q_obs,
               CAST(MAX(CASE WHEN b = 0 THEN st[5] END) AS BIGINT)
                   AS cp_tau,
               list(CASE WHEN b > 0 THEN st[4] END) AS perms
        FROM fit GROUP BY event_type
    )
    SELECT event_type, n_days, cp_tau,
           FLOOR(q_obs * 1000000.0 + 0.5) / 1000000.0 AS best_q,
           CAST(len(list_filter(perms, _pq -> _pq >= q_obs))
                AS BIGINT) AS perm_ge,
           FLOOR(CAST(1 + len(list_filter(perms, _pq -> _pq >= q_obs))
                      AS DOUBLE) / CAST({_EDIV_B + 1} AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS p_value
    FROM agg
    """,
)
def ts_ediv_significance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The e-divisive PERMUTATION STOP RULE (Matteson & James 2014
    §3.2): is ts_ediv_changepoint's best split real or noise? Q_obs
    is compared against the max-Q of B = 16 DETERMINISTIC
    permutations of the series (order = sort by md5(b:i) — both
    engines produce the identical shuffle, the seeded-permutation
    discipline of stat_permutation_test), and the permutation
    p-value is (1 + #{{Q_b ≥ Q_obs}})/(B+1) — under no change the
    split statistic is exchangeable, so small p flags a real
    distribution change. tests/test_stat_invariants.py pins that the
    b = 0 row REPRODUCES ts_ediv_changepoint exactly (the two ops
    share semantics by differential pin, not just by code).

    Exactness: the permuted series are integer arrays in an
    engine-identical order, every Q is built by the same exact-int
    sufficient-statistic fold as the changepoint op (bit-identical
    doubles), and both the argmax and the ≥ comparisons against
    Q_obs compare identical doubles — the p-value numerator is an
    exact integer count. All folds element-wise LIST state,
    per-instantiation lambda names (the vectorized list_reduce
    rules).

    100 TB shape: one daily hash aggregate, then (B+1) × O(n²)
    per-series array arithmetic — a constant 17× of the
    changepoint op's ts_kpss-class bill, still metadata-sized per
    series; the full e-divisive recursion applies this stop rule
    per segment."""
    ev = load_table(spark, sf_dir, "events")
    m, B = _EDIV_MMIN, _EDIV_B
    dc = (
        ev.select("event_type", F.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    arr = dc.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "c"))),
            lambda s: s["c"],
        ).alias("v"),
        F.count(F.lit(1)).cast("int").alias("n"),
    )
    n = F.col("n")
    reps = (
        arr.filter(n >= 2 * m)
        .select(
            "event_type",
            "n",
            "v",
            F.explode(F.sequence(F.lit(0), F.lit(B))).alias("b"),
        )
        .select(
            "event_type",
            "n",
            "b",
            F.when(F.col("b") == 0, F.col("v"))
            .otherwise(
                F.transform(
                    F.sort_array(
                        F.transform(
                            F.sequence(F.lit(1), n),
                            lambda i: F.struct(
                                F.md5(
                                    F.concat_ws(
                                        ":",
                                        F.col("b").cast("string"),
                                        i.cast("string"),
                                    ).cast("binary")
                                ).alias("h"),
                                i.alias("i"),
                            ),
                        )
                    ),
                    lambda s: F.element_at(F.col("v"), s["i"]),
                )
            )
            .alias("vb"),
        )
    )
    vb = F.col("vb")

    def absdiff_sum(side):
        return F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.aggregate(
                F.sequence(F.lit(1), n),
                F.lit(0).cast("long"),
                lambda a, j: a
                + F.when(
                    side(j, i),
                    F.abs(F.element_at(vb, i) - F.element_at(vb, j)),
                ).otherwise(F.lit(0).cast("long")),
            ),
        )

    lr = reps.select(
        "event_type",
        "n",
        "b",
        "vb",
        absdiff_sum(lambda j, i: j < i).alias("lft"),
        absdiff_sum(lambda j, i: j > i).alias("rgt"),
    )
    lft, rgt = F.col("lft"), F.col("rgt")
    total = F.aggregate(lft, F.lit(0).cast("long"), lambda a, x: a + x)
    init = F.array(
        F.element_at(rgt, 1).cast("double"),
        F.lit(0.0),
        (total - F.element_at(rgt, 1)).cast("double"),
        F.lit(-1e300),
        F.lit(0.0),
    )
    items = F.transform(
        F.sequence(F.lit(2), n - 1),
        lambda k: F.array(
            F.element_at(lft, k).cast("double"),
            F.element_at(rgt, k).cast("double"),
            k.cast("double"),
        ),
    )

    def fold(acc, x):
        b2 = F.element_at(acc, 1) - F.element_at(x, 1) + F.element_at(x, 2)
        wl2 = F.element_at(acc, 2) + F.element_at(x, 1)
        wr2 = F.element_at(acc, 3) - F.element_at(x, 2)
        tau = F.element_at(x, 3)
        nd = n.cast("double")
        q = (
            (F.lit(2.0) * b2) / nd
            - (F.lit(2.0) * wl2 * (nd - tau)) / (nd * (tau - F.lit(1.0)))
            - (F.lit(2.0) * wr2 * tau) / (nd * (nd - tau - F.lit(1.0)))
        )
        qc = F.when(
            (tau >= F.lit(float(m))) & (tau <= nd - F.lit(float(m))), q
        )
        better = qc > F.element_at(acc, 4)
        return F.array(
            b2,
            wl2,
            wr2,
            F.when(better, qc).otherwise(F.element_at(acc, 4)),
            F.when(better, tau).otherwise(F.element_at(acc, 5)),
        )

    st = F.aggregate(items, init, fold)
    fit = lr.select("event_type", "n", "b", st.alias("st"))
    agg = fit.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_days"),
        F.max(
            F.when(F.col("b") == 0, F.element_at(F.col("st"), 4))
        ).alias("q_obs"),
        F.max(F.when(F.col("b") == 0, F.element_at(F.col("st"), 5)))
        .cast("long")
        .alias("cp_tau"),
        F.collect_list(
            F.when(F.col("b") > 0, F.element_at(F.col("st"), 4))
        ).alias("perms"),
    )
    perm_ge = F.size(
        F.filter(F.col("perms"), lambda x: x >= F.col("q_obs"))
    ).cast("long")
    return agg.select(
        "event_type",
        "n_days",
        "cp_tau",
        qround(F.col("q_obs"), 6).alias("best_q"),
        perm_ge.alias("perm_ge"),
        qround(
            (1 + perm_ge).cast("double") / F.lit(float(B + 1)), 6
        ).alias("p_value"),
    )


_THETA_H = 7  # forecast horizon (days)


@query(
    "ts_theta_forecast",
    oracle=f"""
    WITH dc AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    arr AS (
        SELECT event_type,
               list_transform(list_sort(list({{'day': day, 'c': c}})),
                              _tv -> _tv.c) AS v,
               CAST(COUNT(*) AS INT) AS n
        FROM dc GROUP BY event_type
    ),
    mom AS (
        SELECT event_type, v, n,
            CAST(n AS BIGINT) * (CAST(n AS BIGINT) + 1) // 2 AS st,
            CAST(n AS BIGINT) * (CAST(n AS BIGINT) + 1)
                * (2 * CAST(n AS BIGINT) + 1) // 6 AS st2,
            list_reduce(list_prepend(CAST(0 AS BIGINT), v),
                        (_sa, _sx) -> _sa + _sx) AS sy,
            list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(generate_series(1, n),
                    _ti -> _ti * v[_ti])),
                (_ma, _mx) -> _ma + _mx) AS sty
        FROM arr WHERE n >= 3
    ),
    ab AS (
        SELECT event_type, v, n,
            CAST(n * sty - st * sy AS DOUBLE)
                / CAST(n * st2 - st * st AS DOUBLE) AS b,
            (CAST(sy AS DOUBLE)
             - (CAST(n * sty - st * sy AS DOUBLE)
                / CAST(n * st2 - st * st AS DOUBLE))
               * CAST(st AS DOUBLE))
                / CAST(n AS DOUBLE) AS a
        FROM mom
    ),
    ses AS (
        SELECT event_type, n, a, b,
            list_reduce(list_prepend(
                CAST(2 AS DOUBLE) * CAST(v[1] AS DOUBLE)
                    - (a + b * CAST(1 AS DOUBLE)),
                list_transform(generate_series(2, n), _zi ->
                    CAST(2 AS DOUBLE) * CAST(v[_zi] AS DOUBLE)
                        - (a + b * CAST(_zi AS DOUBLE)))),
              (_za, _zx) ->
                  CAST(0.5 AS DOUBLE) * _zx
                  + CAST(0.5 AS DOUBLE) * _za) AS l
        FROM ab
    )
    SELECT event_type, CAST(u.h AS BIGINT) AS h,
           FLOOR(((a + b * (CAST(n AS DOUBLE) + CAST(u.h AS DOUBLE)))
                  + l) / CAST(2 AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS forecast,
           FLOOR(b * 1000000.0 + 0.5) / 1000000.0 AS slope,
           FLOOR(l * 1000000.0 + 0.5) / 1000000.0 AS ses_level
    FROM ses, UNNEST(generate_series(1, {_THETA_H})) AS u(h)
    """,
)
def ts_theta_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-method forecast (Assimakopoulos & Nikolopoulos 2000 —
    the M3-competition winner, still the benchmark-to-beat baseline):
    per event type, decompose the daily-count series into the
    theta = 0 line (the OLS linear trend, pure long-run signal) and
    the theta = 2 line (2y_t − trend_t, doubled curvature), forecast
    the first by extrapolation and the second by SES, and average —
    7 daily steps ahead. Completes the forecasting family:
    ts_holt_winters (trend+level smoothing), ts_backtest_snaive (the
    evaluation harness), ts_ses_grid_search (the alpha lever this
    method fixes at 0.5).

    Exactness, all VALUE EMITS (no float selection anywhere): the
    OLS moments are exact int64 (Σt, Σt² closed-form, Σy, Σty
    folds), so slope/intercept are fixed-shape expressions over
    identical doubles; the theta-2 line and its SES fold use
    alpha = 0.5 — EXACTLY representable, so every product is one
    correctly-rounded op on identical inputs; forecasts emit on the
    qround(6) grid. n·Σty stays in int64 to ~10⁷-day series at
    10⁹ events/day. Series under 3 days emit nothing (a 2-point
    trend forecast is the line itself; the n ≥ 3 floor also keeps
    the OLS denominator n·Σt² − (Σt)² > 0, no guard ratio).

    100 TB shape: one corpus-scale daily hash aggregate, O(n)
    per-series folds, a 7-row explode — the ts_kpss bill class."""
    ev = load_table(spark, sf_dir, "events")
    dc = (
        ev.select("event_type", F.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    arr = dc.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "c"))),
            lambda s: s["c"],
        ).alias("v"),
        F.count(F.lit(1)).cast("int").alias("n"),
    )
    v = F.col("v")
    mom = arr.filter(F.col("n") >= 3).select(
        "event_type",
        "v",
        "n",
        F.expr("CAST(n AS BIGINT) * (CAST(n AS BIGINT) + 1) DIV 2").alias(
            "st"
        ),
        F.expr(
            "CAST(n AS BIGINT) * (CAST(n AS BIGINT) + 1) "
            "* (2 * CAST(n AS BIGINT) + 1) DIV 6"
        ).alias("st2"),
        F.aggregate(
            v, F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("sy"),
        F.aggregate(
            F.transform(
                F.sequence(F.lit(1), F.col("n")),
                lambda i: i.cast("long") * F.element_at(v, i),
            ),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("sty"),
    )
    nL = F.col("n").cast("long")
    bnum = (nL * F.col("sty") - F.col("st") * F.col("sy")).cast("double")
    bden = (nL * F.col("st2") - F.col("st") * F.col("st")).cast("double")
    b = bnum / bden
    a = (
        F.col("sy").cast("double") - b * F.col("st").cast("double")
    ) / nL.cast("double")
    ab = mom.select("event_type", "v", "n", b.alias("b"), a.alias("a"))

    def z(i):
        return F.lit(2.0) * F.element_at(v, i).cast("double") - (
            F.col("a") + F.col("b") * i.cast("double")
        )

    l = F.aggregate(
        F.transform(F.sequence(F.lit(2), F.col("n")), lambda i: z(i)),
        z(F.lit(1)),
        lambda acc, x: F.lit(0.5) * x + F.lit(0.5) * acc,
    )
    ses = ab.select("event_type", "n", "a", "b", l.alias("l"))
    h = F.col("h")
    return ses.select(
        "event_type",
        F.explode(F.sequence(F.lit(1), F.lit(_THETA_H))).alias("h"),
        "n",
        "a",
        "b",
        "l",
    ).select(
        "event_type",
        h.cast("long").alias("h"),
        qround(
            (
                (
                    F.col("a")
                    + F.col("b")
                    * (F.col("n").cast("double") + h.cast("double"))
                )
                + F.col("l")
            )
            / F.lit(2.0),
            6,
        ).alias("forecast"),
        qround(F.col("b"), 6).alias("slope"),
        qround(F.col("l"), 6).alias("ses_level"),
    )


# DTW over daily-count series: integer |a-b| local cost, full DP.
_DTW_INF = 1 << 40


@query(
    "ts_dtw_pairs",
    oracle=f"""
    WITH dc AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    arr AS (
        SELECT event_type,
               list_transform(list_sort(list({{'day': day, 'c': c}})),
                              _dv -> _dv.c) AS v,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM dc GROUP BY event_type
    ),
    pr AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               a.v AS va, b.v AS vb, a.n AS na, b.n AS nb
        FROM arr a JOIN arr b ON a.event_type < b.event_type
    ),
    dp AS (
        SELECT type_a, type_b, na, nb,
            list_reduce(list_prepend(
                list_concat([CAST(0 AS BIGINT)],
                    list_transform(generate_series(1, CAST(nb AS INT)),
                        _zq -> CAST({_DTW_INF} AS BIGINT))),
                list_transform(generate_series(1, CAST(na AS INT)),
                    _rq -> [CAST(_rq AS BIGINT)])),
              (_ra, _rx) -> list_reduce(list_prepend(
                  [CAST({_DTW_INF} AS BIGINT)],
                  list_transform(generate_series(1, CAST(nb AS INT)),
                      _cq -> [CAST(_cq AS BIGINT)])),
                (_ca, _cx) -> list_append(_ca,
                    abs(va[CAST(_rx[1] AS INT)]
                        - vb[CAST(_cx[1] AS INT)])
                    + least(_ra[CAST(_cx[1] AS INT) + 1],
                            _ra[CAST(_cx[1] AS INT)],
                            _ca[CAST(_cx[1] AS INT)])))) AS row
        FROM pr
    )
    SELECT type_a, type_b,
           row[CAST(nb AS INT) + 1] AS dtw,
           na AS n_a, nb AS n_b
    FROM dp
    """,
)
def ts_dtw_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise dynamic time warping (Sakoe & Chiba 1978, the classic
    elastic-alignment distance) between every pair of event types'
    daily-count series — the shape-similarity complement of
    ts_rolling_corr's rigid same-day alignment: DTW says "signup lags
    purchase by a stretchable warp" where correlation only sees
    misaligned points. Full O(n·m) DP with the standard recurrence
    D(i,j) = |a_i − b_j| + min(D(i−1,j), D(i,j−1), D(i−1,j−1)).

    ALL-INTEGER: daily counts are int64, the local cost |a−b| and
    every DP cell stay int64 (boundary = 2^40 sentinel, reachable
    sums orders of magnitude below it), so the distance is exact on
    both engines — no float discipline needed anywhere. The DP is a
    nested fold: outer over rows with the previous DP row as list
    state, inner building each row left-to-right by always-append
    (the growing-list-safe form; lambda vars all distinct per the
    nesting rule). Series enter day-sorted via the shared
    sort-struct-extract shape (ts_matrix_profile's arr).

    100 TB shape: one corpus-scale daily aggregate (the ts_kpss bill
    class), then one tiny type×type theta join (k² pairs over
    metadata-sized arrays) and per-pair O(n·m) in-cell arithmetic —
    for year-scale minutely series swap in the banded
    (Sakoe-Chiba-window) variant: same fold, inner range clipped to
    the band."""
    ev = load_table(spark, sf_dir, "events")
    dc = (
        ev.select("event_type", F.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    arr = (
        dc.groupBy("event_type")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("day", "c"))),
                lambda s: s["c"],
            ).alias("v"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        # both theta-join sides read this k-row table; un-pinned, the
        # corpus-scale daily aggregate re-executes per side
        .transform(pin)
    )
    a = arr.select(
        F.col("event_type").alias("type_a"),
        F.col("v").alias("va"),
        F.col("n").alias("na"),
    )
    b = arr.select(
        F.col("event_type").alias("type_b"),
        F.col("v").alias("vb"),
        F.col("n").alias("nb"),
    )
    pr = a.join(b, F.col("type_a") < F.col("type_b"))
    inf = F.lit(_DTW_INF).cast("long")
    init_row = F.concat(
        F.array(F.lit(0).cast("long")),
        F.transform(
            F.sequence(F.lit(1), F.col("nb").cast("int")),
            lambda _x: inf,
        ),
    )
    dp = F.aggregate(
        F.sequence(F.lit(1), F.col("na").cast("int")),
        init_row,
        lambda prev, i: F.aggregate(
            F.sequence(F.lit(1), F.col("nb").cast("int")),
            F.array(inf),
            lambda acc, j: F.concat(
                acc,
                F.array(
                    F.abs(
                        F.element_at(F.col("va"), i.cast("int"))
                        - F.element_at(F.col("vb"), j.cast("int"))
                    )
                    + F.least(
                        F.element_at(prev, (j + 1).cast("int")),
                        F.element_at(prev, j.cast("int")),
                        F.element_at(acc, j.cast("int")),
                    )
                ),
            ),
        ),
    )
    return pr.select(
        "type_a",
        "type_b",
        F.element_at(dp, (F.col("nb") + 1).cast("int")).alias("dtw"),
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
    )


@query(
    "ts_abc_xyz",
    oracle="""
    WITH o AS (
        SELECT o_custkey,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
               date_trunc('month', o_orderdate) AS mon
        FROM orders
    ),
    mo AS (
        SELECT o_custkey, mon,
               CAST(SUM(cents) // 100 AS BIGINT) AS d
        FROM o GROUP BY 1, 2
    ),
    cust AS (
        SELECT m.o_custkey AS custkey, c.c_nationkey AS nation,
               CAST(SUM(m.d) AS BIGINT) AS s,
               CAST(SUM(m.d * m.d) AS BIGINT) AS s2,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM mo m JOIN customer c ON c.c_custkey = m.o_custkey
        GROUP BY 1, 2
    ),
    rk AS (
        SELECT custkey, nation, s, s2, n,
               SUM(s) OVER (PARTITION BY nation
                            ORDER BY s DESC, custkey
                            ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(s) OVER (PARTITION BY nation) AS tot
        FROM cust
    )
    SELECT custkey, nation,
           s AS revenue, n AS n_months,
           CASE WHEN 5 * cum <= 4 * tot THEN 'A'
                WHEN 20 * cum <= 19 * tot THEN 'B'
                ELSE 'C' END AS abc,
           CASE WHEN 4 * (n * s2 - s * s) <= s * s THEN 'X'
                WHEN n * s2 - s * s <= s * s THEN 'Y'
                ELSE 'Z' END AS xyz
    FROM rk
    """,
)
def ts_abc_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC/XYZ classification per customer within nation — the
    classic two-axis inventory/revenue segmentation (ABC = Pareto
    revenue class by cumulative share, 80/95 cuts; XYZ = demand
    variability class by coefficient of variation of MONTHLY revenue,
    0.5/1.0 cuts): the planning primitive that decides which series
    get careful forecasting (AX) and which get min-max stocking (CZ).

    ALL-INTEGER decisions: prices land on the cents grid via the
    floor-form qround, monthly revenue floors to whole DOLLARS
    (defined statistic, identical // both engines — and it keeps
    n·Σd² far inside int64 where cents² would overflow at ~30
    orders/customer; at 100 TB rescale to the unit that keeps
    n·Σx² < 2⁶³, CV is scale-invariant), the Pareto cuts are the
    cross-multiplied predicates 5·cum ≤ 4·tot / 20·cum ≤ 19·tot and
    the CV cuts 4·(nΣd²−S²) ≤ S² / (nΣd²−S²) ≤ S² — no float ever
    crosses an engine, no division at all.

    100 TB shape: one orders-scale monthly aggregate, one
    customer-keyed aggregate, a broadcast-sized customer⋈nation
    join, then windows PARTITIONED BY NATION (bounded partitions —
    never the banned global window; a pathological single-nation
    skew takes the distributed_ntile decomposition)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
        F.date_trunc("month", "o_orderdate").alias("mon"),
    )
    mo = (
        o.groupBy("o_custkey", "mon")
        .agg(
            # true integer division (cents are non-negative, so
            # truncation == floor == DuckDB '//') — the double-divide
            # floor form was exact only below ~4.5e15 cents/month
            # (ADVICE r13)
            F.expr("sum(cents) div 100").cast("long").alias("d")
        )
    )
    cust = (
        mo.join(
            load_table(spark, sf_dir, "customer").select(
                F.col("c_custkey").alias("o_custkey"),
                F.col("c_nationkey").alias("nation"),
            ),
            "o_custkey",
        )
        .groupBy(F.col("o_custkey").alias("custkey"), "nation")
        .agg(
            F.sum("d").cast("long").alias("s"),
            F.sum(F.col("d") * F.col("d")).cast("long").alias("s2"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    w = Window.partitionBy("nation").orderBy(
        F.col("s").desc(), "custkey"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wt = Window.partitionBy("nation")
    rk = cust.select(
        "custkey",
        "nation",
        "s",
        "s2",
        "n",
        F.sum("s").over(w).alias("cum"),
        F.sum("s").over(wt).alias("tot"),
    )
    var_n = F.col("n") * F.col("s2") - F.col("s") * F.col("s")
    return rk.select(
        "custkey",
        "nation",
        F.col("s").alias("revenue"),
        F.col("n").alias("n_months"),
        F.when(5 * F.col("cum") <= 4 * F.col("tot"), F.lit("A"))
        .when(20 * F.col("cum") <= 19 * F.col("tot"), F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc"),
        F.when(4 * var_n <= F.col("s") * F.col("s"), F.lit("X"))
        .when(var_n <= F.col("s") * F.col("s"), F.lit("Y"))
        .otherwise(F.lit("Z"))
        .alias("xyz"),
    )

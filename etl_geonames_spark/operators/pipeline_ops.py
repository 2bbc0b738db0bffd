"""Table-maintenance / dataset-curation operators (SURVEY.md §2.15 —
engine extension).

The reference regenerates its whole output NDJSON from scratch every
run (geonames.js:151-163 — full transform per country file). At
100 TB a full rewrite per update is not an option; a production engine
needs *incremental* table maintenance — CDC merge/upsert, slowly-
changing-dimension history — plus the dataset-curation primitives a
training-data pipeline runs constantly: deterministic splits,
per-key bounded sampling, and column profiling.

All operators are pure JVM expressions (no Python UDFs), shuffle only
on their declared keys, and carry exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_geonames_spark.functions import pin, qround, sql_qround
from etl_geonames_spark.registry import query
from etl_geonames_spark.sources import load_table

# ---------------------------------------------------------------------------
# CDC merge / upsert
# ---------------------------------------------------------------------------


@query(
    "cdc_merge_upsert",
    oracle="""
    WITH changes AS (
        SELECT o_custkey AS custkey,
               ROUND(SUM(o_totalprice), 2) AS delta
        FROM orders GROUP BY o_custkey
        UNION ALL
        SELECT c_custkey + 1000000 AS custkey,
               ROUND(c_acctbal, 2) AS delta
        FROM customer WHERE c_custkey % 97 = 0
    )
    SELECT COALESCE(c.c_custkey, ch.custkey) AS custkey,
           CASE WHEN c.c_custkey IS NULL THEN 'insert'
                WHEN ch.custkey IS NULL THEN 'keep'
                ELSE 'update' END AS action,
           ROUND(COALESCE(c.c_acctbal, 0.0) + COALESCE(ch.delta, 0.0), 2)
               AS balance
    FROM customer c FULL OUTER JOIN changes ch ON c.c_custkey = ch.custkey
    """,
)
def cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics as a full-outer join: apply a changeset to
    a base table — matched rows update, unmatched changes insert,
    untouched base rows pass through, each tagged with its action.

    The changeset is derived deterministically (per-customer order
    totals as updates; a keyed subset re-keyed past the base's key
    range as inserts). The 100 TB shape: ONE shuffle, both sides hash-
    partitioned on the merge key (AQE handles skew); with a
    lakehouse table format the same plan becomes file-level MERGE
    INTO — this operator is the engine-side core of it. Sums of 2dp
    inputs round at their own 2dp grid (repo working-notes invariant).
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    updates = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("delta")
    )
    inserts = cust.where(F.col("c_custkey") % 97 == 0).select(
        (F.col("c_custkey") + 1000000).alias("custkey"),
        F.round(F.col("c_acctbal"), 2).alias("delta"),
    )
    changes = updates.unionByName(inserts)
    base = cust.select("c_custkey", "c_acctbal")
    return base.join(
        changes, base["c_custkey"] == changes["custkey"], "full_outer"
    ).select(
        F.coalesce(F.col("c_custkey"), F.col("custkey")).alias("custkey"),
        F.when(F.col("c_custkey").isNull(), "insert")
        .when(F.col("custkey").isNull(), "keep")
        .otherwise("update")
        .alias("action"),
        F.round(
            F.coalesce(F.col("c_acctbal"), F.lit(0.0))
            + F.coalesce(F.col("delta"), F.lit(0.0)),
            2,
        ).alias("balance"),
    )


# ---------------------------------------------------------------------------
# SCD type-2 history
# ---------------------------------------------------------------------------


@query(
    "scd2_history",
    oracle="""
    SELECT user_id,
           ROW_NUMBER() OVER w AS version,
           ts AS effective_from,
           LEAD(ts) OVER w AS effective_to,
           (LEAD(ts) OVER w IS NULL) AS is_current,
           value AS balance
    FROM events
    WHERE event_type = 'purchase'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2: turn a change stream into
    versioned validity intervals — each purchase opens a version
    effective until the user's next one; the last version per user is
    current.

    One partitioned window (user_id) — the shuffle is the partition
    key, every user's history ranks in parallel, and the global-window
    sweep in tests/test_plans.py guarantees no degenerate single-task
    plan. This interval form is what makes point-in-time joins
    (:mod:`~etl_geonames_spark.operators.pit`) and as-of joins exact.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.row_number().over(w).alias("version"),
            F.col("ts").alias("effective_from"),
            F.lead("ts").over(w).alias("effective_to"),
            F.lead("ts").over(w).isNull().alias("is_current"),
            F.col("value").alias("balance"),
        )
    )


# ---------------------------------------------------------------------------
# deterministic train/val/test split
# ---------------------------------------------------------------------------


@query(
    "split_train_test",
    oracle="""
    SELECT doc_id,
           (doc_id * 2654435761) % 100 AS bucket,
           CASE WHEN (doc_id * 2654435761) % 100 < 80 THEN 'train'
                WHEN (doc_id * 2654435761) % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment by multiplicative key hash
    (Knuth's 2654435761), not RNG — re-running on grown data never
    reassigns an existing document, the property a training pipeline
    needs to avoid silent train/test leakage across snapshots.

    Map-only: a scan-speed projection with zero shuffles, and the
    split predicate pushes down when a consumer filters one split.
    """
    bucket = (F.col("doc_id") * 2654435761) % 100
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
    )


# ---------------------------------------------------------------------------
# per-key bounded deterministic sample
# ---------------------------------------------------------------------------


@query(
    "sample_per_key",
    oracle="""
    SELECT source, doc_id, rank FROM (
        SELECT source, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY (doc_id * 40503) % 65536, doc_id
               ) AS rank
        FROM documents
    ) WHERE rank <= 5
    """,
)
def sample_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-key uniform sample, deterministically: rank each
    key's rows by a multiplicative hash of the row id and keep the
    first k — a reservoir sample whose 'random' order is replayable.

    One partitioned window (the key carries the shuffle). Unlike
    ``df.sampleBy`` this bounds every key at exactly k — the per-
    source cap a curation pipeline uses to stop one crawl dominating
    the corpus (complements llm_cap_per_source's fraction capping).
    """
    w = Window.partitionBy("source").orderBy(
        (F.col("doc_id") * 40503) % 65536, F.col("doc_id")
    )
    return (
        load_table(spark, sf_dir, "documents")
        .select("source", "doc_id", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= 5)
    )


# ---------------------------------------------------------------------------
# column profiling
# ---------------------------------------------------------------------------

_PROFILE_NUM = ["o_orderkey", "o_custkey", "o_totalprice"]
_PROFILE_STR = ["o_orderstatus", "o_orderpriority"]


@query(
    "profile_columns",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
               COUNT(*) - COUNT({c}) AS n_null,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({c}) AS DOUBLE) AS min_num,
               CAST(MAX({c}) AS DOUBLE) AS max_num
        FROM orders
        """
        for c in _PROFILE_NUM
    )
    + " UNION ALL "
    + " UNION ALL ".join(
        f"""
        SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
               COUNT(*) - COUNT({c}) AS n_null,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(NULL AS DOUBLE) AS min_num,
               CAST(NULL AS DOUBLE) AS max_num
        FROM orders
        """
        for c in _PROFILE_STR
    ),
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile — null count, exact NDV, numeric
    min/max — in ONE aggregation pass, unpivoted to a row per column.

    The single groupBy().agg computes every column's stats together
    (Catalyst plans the multi-count-distinct via one Expand, partial
    aggregation map-side); profiling a 100 TB table is then one
    logical pass, not one job per column. Exact NDV is the honest
    baseline — the sketch path is agg_approx_distinct.
    """
    orders = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_NUM + _PROFILE_STR:
        is_num = c in _PROFILE_NUM
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__null"),
            F.count_distinct(F.col(c)).alias(f"{c}__ndv"),
            (F.min(c).cast("double") if is_num else F.lit(None).cast("double")).alias(
                f"{c}__min"
            ),
            (F.max(c).cast("double") if is_num else F.lit(None).cast("double")).alias(
                f"{c}__max"
            ),
        ]
    wide = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__null, {c}__ndv, {c}__min, {c}__max"
        for c in _PROFILE_NUM + _PROFILE_STR
    )
    n_cols = len(_PROFILE_NUM + _PROFILE_STR)
    return wide.select(
        F.expr(
            f"stack({n_cols}, {stack_args}) AS "
            "(col_name, n_rows, n_null, n_distinct, min_num, max_num)"
        )
    )


@query(
    "llm_curate_pipeline",
    oracle="""
    WITH norm AS (
      SELECT doc_id, source,
             trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
               ' +', ' ', 'g')) AS norm_text
      FROM documents
    ),
    toks AS (
      SELECT doc_id, source, norm_text,
             CAST(len(str_split(norm_text, ' ')) AS BIGINT) AS n_tokens
      FROM norm
    )
    SELECT doc_id, source, n_tokens,
           CASE WHEN (doc_id * 2654435761) % 100 < 80 THEN 'train'
                WHEN (doc_id * 2654435761) % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM toks
    WHERE n_tokens BETWEEN 50 AND 10000
    """,
)
def llm_curate_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation gate as ONE plan: normalize → token-count →
    length-gate → deterministic split assignment, composed lazily with
    no intermediate materialization.

    This is the composition property the whole operator surface is
    built for — each stage is a pure expression, so Catalyst fuses the
    entire gate into a single WholeStageCodegen map stage over the
    scan: ZERO shuffles at any corpus size (plan-pinned). At 100 TB
    this runs at scan speed, and writing the result partitioned by
    `split` feeds the trainer directly. Dedup/mixing stages (which do
    shuffle) slot between the gate and the writer; keeping the gate
    shuffle-free means they shuffle already-filtered data only."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    n_tokens = F.size(F.split(norm, " ")).cast("bigint")
    bucket = (F.col("doc_id") * 2654435761) % 100
    return (
        docs.select(
            "doc_id",
            "source",
            n_tokens.alias("n_tokens"),
            F.when(bucket < 80, "train")
            .when(bucket < 90, "val")
            .otherwise("test")
            .alias("split"),
        )
        .filter(F.col("n_tokens").between(50, 10000))
    )


@query(
    "dq_contract_check",
    oracle="""
    SELECT 'orders_custkey_not_null' AS rule,
           CAST(COALESCE(SUM(CASE WHEN o_custkey IS NULL THEN 1 END), 0)
                AS BIGINT) AS violations
    FROM orders
    UNION ALL
    SELECT 'orders_orphan_custkey',
           CAST(COUNT(*) AS BIGINT)
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'lineitem_quantity_in_1_50',
           CAST(COALESCE(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
                                  THEN 1 END), 0) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'events_value_non_negative',
           CAST(COALESCE(SUM(CASE WHEN value < 0 THEN 1 END), 0) AS BIGINT)
    FROM events
    """,
)
def dq_contract_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality contract: one row per rule with its violation
    count — the dbt-test / Great-Expectations shape as a single
    DataFrame (0 = pass; a scheduler gates downstream jobs on
    ``max(violations) == 0``).

    Four rule kinds in one result: not-null, referential integrity
    (anti join against the dim — broadcast, so the fact never
    shuffles), numeric range, and domain sanity. Each rule is a
    map-side-combined aggregate over its own scan; at 100 TB the rule
    set runs as one job whose cost is the union of the scans, and
    per-rule filters push down to each."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")

    def rule(name, df):
        return df.select(
            F.lit(name).alias("rule"),
            F.coalesce(F.col("violations"), F.lit(0))
            .cast("bigint")
            .alias("violations"),
        )

    r1 = rule(
        "orders_custkey_not_null",
        orders.agg(
            F.count_if(F.col("o_custkey").isNull()).alias("violations")
        ),
    )
    r2 = rule(
        "orders_orphan_custkey",
        orders.join(
            F.broadcast(cust.select("c_custkey")),
            orders["o_custkey"] == cust["c_custkey"],
            "left_anti",
        ).agg(F.count(F.lit(1)).alias("violations")),
    )
    r3 = rule(
        "lineitem_quantity_in_1_50",
        li.agg(
            F.count_if(
                (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)
            ).alias("violations")
        ),
    )
    r4 = rule(
        "events_value_non_negative",
        ev.agg(F.count_if(F.col("value") < 0).alias("violations")),
    )
    return r1.unionByName(r2).unionByName(r3).unionByName(r4)


@query(
    "scd2_asof_lookup",
    oracle="""
    WITH hist AS (
      SELECT user_id,
             ROW_NUMBER() OVER w AS version,
             ts AS eff_from,
             LEAD(ts) OVER w AS eff_to,
             value AS balance
      FROM events WHERE event_type = 'purchase'
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    probe AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id, p.user_id, h.version, h.balance
    FROM probe p JOIN hist h
      ON p.user_id = h.user_id
     AND p.ts >= h.eff_from
     AND (h.eff_to IS NULL OR p.ts < h.eff_to)
    """,
)
def scd2_asof_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup against SCD2 validity intervals: each
    click resolves the purchase-version that was current AT ITS
    TIMESTAMP — the warehouse PIT-correctness pattern (training-data
    pipelines use exactly this to avoid feature leakage: join
    features as-of the label's time, never the latest version).

    Interval semantics guarantee ≤1 match per probe, so the join
    can't fan out. Plan discipline is `join_range`'s: user_id is the
    equi key carrying the shuffle; the half-open interval predicate
    evaluates post-match — hash/SMJ, never nested-loop. Clicks before
    a user's first version drop (inner); a LEFT variant would keep
    them with NULLs."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hist = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.row_number().over(w).alias("version"),
            F.col("ts").alias("eff_from"),
            F.lead("ts").over(w).alias("eff_to"),
            F.col("value").alias("balance"),
        )
        .withColumnRenamed("user_id", "h_user_id")
    )
    probe = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    cond = (
        (probe["user_id"] == hist["h_user_id"])
        & (probe["ts"] >= hist["eff_from"])
        & (hist["eff_to"].isNull() | (probe["ts"] < hist["eff_to"]))
    )
    return probe.join(hist, cond).select(
        "event_id", "user_id", "version", "balance"
    )


def write_with_metrics(
    df: DataFrame, path: str, key_col: str, mode: str = "overwrite"
) -> dict:
    """Write Parquet while collecting dataset metrics IN-FLIGHT via
    Spark's Observation API: row count, null-key count, and key
    min/max ride the write's own scan as accumulator-style aggregates
    — zero extra passes, exactly what a 100 TB sink wants (a separate
    validation count() would re-read everything).

    The returned dict is the write's data-quality receipt: a
    scheduler gates downstream steps on ``null_keys == 0`` the same
    way dq_contract_check gates on rule violations — but here the
    evidence is free."""
    from pyspark.sql import Observation

    obs = Observation("write_metrics")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col(key_col).isNull(), 1)).alias("null_keys"),
        F.min(key_col).alias("key_min"),
        F.max(key_col).alias("key_max"),
    )
    observed.write.mode(mode).parquet(path)
    return obs.get


_BOTTOMK_K = 20


@query(
    "sample_bottom_k",
    oracle=f"""
    WITH h AS (
        SELECT event_type, event_id,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(
                           generate_series(1, len(CAST(event_id AS VARCHAR))),
                           i -> CAST(ascii(substr(
                               CAST(event_id AS VARCHAR), i, 1)) AS BIGINT))),
                   (acc, c) -> (acc * 31 + c) % 1000003) AS hv
        FROM events
    ),
    r AS (
        SELECT event_type, event_id, hv,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY hv, event_id) AS rk
        FROM h
    )
    SELECT event_type, event_id, CAST(hv AS BIGINT) AS hv
    FROM r WHERE rk <= {_BOTTOMK_K}
    """,
)
def sample_bottom_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic uniform sampling via the BOTTOM-K trick: rank
    every row by a content hash and keep the k smallest per group —
    statistically a uniform k-sample (the hash is a random permutation
    of the keys) but fully REPRODUCIBLE and, unlike reservoir
    sampling's sequential state, embarrassingly mergeable: bottom-k of
    a union = bottom-k of each part's bottom-k, so executors sample
    locally and only k·partitions candidate rows ever shuffle. This
    is how distributed engines implement "give me a stable 20-row
    sample per key" without a global pass.

    The hash is the cross-engine Horner polynomial over the stringified
    event id (:func:`curation.poly_hash`), so the sample — not just
    its size — is oracle-checked value-for-value; (hash, id) ordering
    breaks collision ties identically in both engines.

    100 TB shape: per-group window on the group key (one exchange);
    Spark's TopK-per-partition pre-filter under AQE keeps the sort
    local, the llm_sim_topk pattern."""
    from etl_geonames_spark.operators.curation import poly_hash

    ev = load_table(spark, sf_dir, "events")
    h = ev.select(
        "event_type",
        "event_id",
        poly_hash(F.col("event_id").cast("string")).alias("hv"),
    )
    w = Window.partitionBy("event_type").orderBy("hv", "event_id")
    return (
        h.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _BOTTOMK_K)
        .select("event_type", "event_id", F.col("hv").cast("long").alias("hv"))
    )


# ---------------------------------------------------------------------------
# freshness / volume-drift monitoring
# ---------------------------------------------------------------------------

_DAY_US = 86_400_000_000


@query(
    "dq_freshness",
    oracle=f"""
    WITH g AS (SELECT MAX(epoch_us(ts)) AS gm FROM events),
    p AS (
        SELECT event_type, g.gm AS gm,
               CAST(COUNT(*) AS BIGINT) AS n,
               MAX(epoch_us(ts)) AS tmax,
               CAST(SUM(CASE WHEN epoch_us(ts) > g.gm - {_DAY_US}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_last24,
               CAST(SUM(CASE WHEN epoch_us(ts) > g.gm - {2 * _DAY_US}
                         AND epoch_us(ts) <= g.gm - {_DAY_US}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_prev24
        FROM events, g GROUP BY event_type, g.gm
    )
    SELECT event_type, n,
           CAST((gm - tmax) // 3600000000 AS BIGINT) AS lag_hours,
           n_last24, n_prev24,
           CASE WHEN n_prev24 > 0
                THEN FLOOR(CAST(n_last24 AS DOUBLE) / n_prev24
                           * 1000000.0 + 0.5) / 1000000.0
           END AS vol_ratio
    FROM p
    """,
)
def dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-feed freshness + volume-drift monitor: for each event type,
    hours since its newest event (lagged feeds are the silent killer
    of incremental pipelines — a stalled upstream looks exactly like
    'no new data'), plus last-24h vs previous-24h row counts and
    their ratio — the cheap canary that fires on both feed death
    (lag_hours grows) and volume anomalies (ratio far from 1).
    Windows anchor on the GLOBAL max timestamp, so the check is
    replayable on a frozen snapshot — no wall-clock in the plan
    (the engine's determinism rule; production swaps in now()).

    All epoch-microsecond integer arithmetic: lag is an exact integer
    hour division, window membership is an exact int64 compare; the
    only float is the guarded ratio (a one-sided feed has
    n_prev24 = 0 → NULL, never an ANSI DIVIDE_BY_ZERO), qround(6) on
    both engines. Two passes (the ts-only anchor aggregate — fully
    column-pruned — then the keyed aggregate with the 1-row global
    max broadcast in); group-count-sized output at any scale.
    """
    from etl_geonames_spark.functions import qround

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    g = ev.agg(F.max("us").alias("gm"))
    p = (
        ev.crossJoin(F.broadcast(g))
        .groupBy("event_type")
        .agg(
            F.max("gm").alias("gm"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.max("us").alias("tmax"),
            F.sum(
                F.when(F.col("us") > F.col("gm") - _DAY_US, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_last24"),
            F.sum(
                F.when(
                    (F.col("us") > F.col("gm") - 2 * _DAY_US)
                    & (F.col("us") <= F.col("gm") - _DAY_US),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_prev24"),
        )
    )
    return p.select(
        "event_type",
        "n",
        F.expr("(gm - tmax) div 3600000000").cast("long").alias("lag_hours"),
        "n_last24",
        "n_prev24",
        F.when(
            F.col("n_prev24") > 0,
            qround(
                F.col("n_last24").cast("double") / F.col("n_prev24"), 6
            ),
        ).alias("vol_ratio"),
    )


_ES_K = 5


@query(
    "sample_weighted_es",
    oracle=f"""
    WITH k AS (
        SELECT event_type, event_id, value,
               -ln(((event_id * 1103515245 + 12345) % 2147483648 + 1)
                   / 2147483649.0) / value AS key
        FROM events WHERE value > 0
    ),
    q AS (
        SELECT event_type, event_id, key,
               FLOOR(key * 1000000000.0 + 0.5) / 1000000000.0 AS kq
        FROM k
    ),
    r AS (
        SELECT event_type, event_id, key,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY kq, event_id) AS rk
        FROM q
    )
    SELECT event_type, event_id,
           FLOOR(key * 1000000.0 + 0.5) / 1000000.0 AS es_key
    FROM r WHERE rk <= {_ES_K}
    """,
)
def sample_weighted_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, k = 5 per event type,
    via Efraimidis–Spirakis exponential sort keys (2006): each row
    draws key = −ln(u)/w (u deterministic from the event-id LCG, w =
    the row's value), and the k SMALLEST keys are exactly a
    w-proportional without-replacement sample — the mixing/up-
    weighting primitive a data-mix pipeline uses when "sample 1M docs
    proportional to quality score" must be one distributed pass, no
    driver-side sequential draws, and resumable (re-running selects
    the identical sample). Sibling: sample_bottom_k is the UNIFORM
    hash-ordered case; this is the weighted generalization.

    Cross-engine ordering discipline: the sort key is a fixed-shape
    double (ln of an exact-rational u, one division by w), but rows
    are RANKED on its qround(9) grid with an event-id tie-break — a
    last-ulp ln() divergence between engines can therefore never
    reorder the selection (the float-predicate rule, applied to
    ORDER BY). Per-group window on the group key, one exchange;
    Spark's AQE TopK-per-partition pre-filter keeps the sort local —
    the llm_sim_topk shape.
    """
    from etl_geonames_spark.functions import qround

    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    u = (
        ((F.col("event_id") * 1103515245 + 12345) % 2147483648 + 1).cast(
            "double"
        )
        / 2147483649.0
    )
    key = -F.log(u) / F.col("value")
    q = ev.select(
        "event_type",
        "event_id",
        key.alias("key"),
        qround(key, 9).alias("kq"),
    )
    w = Window.partitionBy("event_type").orderBy("kq", "event_id")
    return (
        q.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _ES_K)
        .select("event_type", "event_id", qround(F.col("key"), 6).alias("es_key"))
    )


@query(
    "dq_schema_drift",
    oracle=f"""
    WITH h AS (
        SELECT doc_id % 2 AS grp,
               CAST(n_chars AS BIGINT) AS n_chars, lang, source, text
        FROM documents
    ),
    wide AS (
        SELECT
          CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS a_rows,
          CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
              AS b_rows,
          CAST(SUM(CASE WHEN grp = 0 THEN n_chars ELSE 0 END) AS BIGINT)
              AS a_chars,
          CAST(SUM(CASE WHEN grp = 1 THEN n_chars ELSE 0 END) AS BIGINT)
              AS b_chars,
          CAST(COUNT(DISTINCT CASE WHEN grp = 0 THEN lang END) AS BIGINT)
              AS a_langs,
          CAST(COUNT(DISTINCT CASE WHEN grp = 1 THEN lang END) AS BIGINT)
              AS b_langs,
          CAST(COUNT(DISTINCT CASE WHEN grp = 0 THEN source END) AS BIGINT)
              AS a_sources,
          CAST(COUNT(DISTINCT CASE WHEN grp = 1 THEN source END) AS BIGINT)
              AS b_sources,
          CAST(SUM(CASE WHEN grp = 0 AND trim(text) = '' THEN 1 ELSE 0 END)
               AS BIGINT) AS a_empty,
          CAST(SUM(CASE WHEN grp = 1 AND trim(text) = '' THEN 1 ELSE 0 END)
               AS BIGINT) AS b_empty
        FROM h
    ),
    long AS (
        SELECT 'n_rows' AS metric, CAST(a_rows AS DOUBLE) AS val_a,
               CAST(b_rows AS DOUBLE) AS val_b FROM wide
        UNION ALL
        SELECT 'mean_chars',
               CASE WHEN a_rows > 0
                    THEN CAST(a_chars AS DOUBLE) / a_rows END,
               CASE WHEN b_rows > 0
                    THEN CAST(b_chars AS DOUBLE) / b_rows END FROM wide
        UNION ALL
        SELECT 'n_langs', CAST(a_langs AS DOUBLE),
               CAST(b_langs AS DOUBLE) FROM wide
        UNION ALL
        SELECT 'n_sources', CAST(a_sources AS DOUBLE),
               CAST(b_sources AS DOUBLE) FROM wide
        UNION ALL
        SELECT 'empty_rate',
               CASE WHEN a_rows > 0
                    THEN CAST(a_empty AS DOUBLE) / a_rows END,
               CASE WHEN b_rows > 0
                    THEN CAST(b_empty AS DOUBLE) / b_rows END FROM wide
    )
    SELECT metric,
           {sql_qround('val_a', 6)} AS val_a,
           {sql_qround('val_b', 6)} AS val_b,
           CASE WHEN GREATEST(ABS(val_a), ABS(val_b)) > 0
                THEN {sql_qround(
                    'ABS(val_a - val_b)'
                    ' / GREATEST(ABS(val_a), ABS(val_b))', 6)}
                ELSE 0.0
           END AS rel_drift
    FROM long
    """,
)
def dq_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-drift report between the corpus halves (the
    old-vs-new-snapshot comparison, stood in by the doc_id parity
    split): row count, mean length, lang/source cardinalities, and
    empty-text rate side by side with a normalized relative drift —
    the five cheapest canaries that catch a crawler change, a
    dropped locale, or a parser regression BEFORE content-level
    checks run. profile_columns profiles ONE snapshot; this is the
    two-snapshot diff a scheduler alerts on.

    ONE conditional aggregate (a single corpus pass, map-side
    combined — distinct counts are the only shuffle keys), then the
    metric pivot is constant-sized: compute once, compare anywhere.
    An empty half keeps its columns (rates go NULL, never throw, and
    the report never loses rows — a per-half filtered aggregate row
    would simply vanish); rel_drift's denominator is guarded
    (both-zero → 0, not DIVIDE_BY_ZERO)."""
    docs = load_table(spark, sf_dir, "documents").select(
        (F.col("doc_id") % 2).alias("grp"),
        F.col("n_chars").cast("long").alias("n_chars"),
        "lang",
        "source",
        "text",
    )

    def _side(g: int, p: str):
        is_g = F.col("grp") == g
        return [
            F.sum(F.when(is_g, 1).otherwise(0))
            .cast("long")
            .alias(f"{p}_rows"),
            F.sum(F.when(is_g, F.col("n_chars")).otherwise(0))
            .cast("long")
            .alias(f"{p}_chars"),
            F.count_distinct(F.when(is_g, F.col("lang")))
            .cast("long")
            .alias(f"{p}_langs"),
            F.count_distinct(F.when(is_g, F.col("source")))
            .cast("long")
            .alias(f"{p}_sources"),
            F.sum(F.when(is_g & (F.trim("text") == ""), 1).otherwise(0))
            .cast("long")
            .alias(f"{p}_empty"),
        ]

    # ONE conditional aggregate, never a filter+crossJoin of per-half
    # rows: an empty half must still produce its columns (the oracle
    # always emits one wide row) — a filtered aggregate row simply
    # vanishes and takes the whole report with it
    wide = docs.agg(*_side(0, "a"), *_side(1, "b"))

    def _rate(num: str, den: str):
        return F.when(
            F.col(den) > 0, F.col(num).cast("double") / F.col(den)
        )

    rows = F.array(
        F.struct(
            F.lit("n_rows").alias("metric"),
            F.col("a_rows").cast("double").alias("val_a"),
            F.col("b_rows").cast("double").alias("val_b"),
        ),
        F.struct(
            F.lit("mean_chars").alias("metric"),
            _rate("a_chars", "a_rows").alias("val_a"),
            _rate("b_chars", "b_rows").alias("val_b"),
        ),
        F.struct(
            F.lit("n_langs").alias("metric"),
            F.col("a_langs").cast("double").alias("val_a"),
            F.col("b_langs").cast("double").alias("val_b"),
        ),
        F.struct(
            F.lit("n_sources").alias("metric"),
            F.col("a_sources").cast("double").alias("val_a"),
            F.col("b_sources").cast("double").alias("val_b"),
        ),
        F.struct(
            F.lit("empty_rate").alias("metric"),
            _rate("a_empty", "a_rows").alias("val_a"),
            _rate("b_empty", "b_rows").alias("val_b"),
        ),
    )
    long = wide.select(F.explode(rows).alias("r")).select(
        F.col("r.metric").alias("metric"),
        F.col("r.val_a").alias("val_a"),
        F.col("r.val_b").alias("val_b"),
    )
    mx = F.greatest(F.abs(F.col("val_a")), F.abs(F.col("val_b")))
    return long.select(
        "metric",
        qround(F.col("val_a"), 6).alias("val_a"),
        qround(F.col("val_b"), 6).alias("val_b"),
        F.when(
            mx > 0,
            qround(F.abs(F.col("val_a") - F.col("val_b")) / mx, 6),
        )
        .otherwise(F.lit(0.0))
        .alias("rel_drift"),
    )


@query(
    "dq_observed_metrics",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc,
           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_en
    FROM documents
    """,
)
def dq_observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Piggyback data-quality metrics via Spark's ``observe()`` API:
    the aggregates are computed INSIDE a real job over the corpus (a
    noop-sink write stands in for the production write), so the DQ
    numbers cost ZERO extra passes — at 100 TB this is the difference
    between "metrics with every load" and "metrics when someone pays
    for a second scan". The Observation collects on the driver when
    the action completes; the returned one-row DataFrame is the
    contract record a scheduler would assert against
    (dq_contract_check's thresholds consume exactly this shape).

    Restrictions this demonstrates implicitly: observe() aggregates
    must be commutative/deterministic (no count_distinct — use the
    sketch queries for that); metrics ride the exchange-free scan
    plan of the observed job."""
    from pyspark.sql import Observation

    docs = load_table(spark, sf_dir, "documents")
    obs = Observation("dq")
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("n_chars").cast("long")).alias("sum_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("n_en"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get

    def _opt(key: str):
        # SUM/MIN/MAX over an empty table observe as None — pass the
        # NULL through (the oracle's aggregates are NULL there too;
        # int(None) would crash the driver)
        v = m.get(key)
        return int(v) if v is not None else None

    return spark.createDataFrame(
        [
            (
                _opt("n_rows") or 0,
                _opt("sum_chars"),
                _opt("min_doc"),
                _opt("max_doc"),
                _opt("n_en"),
            )
        ],
        "n_rows long, sum_chars long, min_doc long, max_doc long, n_en long",
    )


_COMPACT_TARGET = 4096  # target bytes per compaction group (fixture scale)


@query(
    "maintenance_compaction_plan",
    oracle=f"""
    WITH files AS (
        SELECT source AS part, doc_id AS file_id,
               CAST(n_chars AS BIGINT) AS bytes
        FROM documents
    ),
    rk AS (
        SELECT part, file_id, bytes,
               SUM(bytes) OVER (PARTITION BY part
                                ORDER BY file_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum_bytes
        FROM files
    )
    SELECT part, file_id, bytes,
           CAST((cum_bytes - 1) // {_COMPACT_TARGET} AS BIGINT)
               AS compaction_group
    FROM rk
    """,
)
def maintenance_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning — the lakehouse maintenance job
    every table needs at 100 TB (a day of streaming commits leaves
    thousands of KB-scale files; reads die on open() overhead until
    they're coalesced): within each partition, files are packed into
    target-size groups by a RUNNING-SUM assignment — group =
    ⌈cumulative bytes / target⌉ — which is the deterministic,
    shuffle-friendly form of first-fit bin packing (each group's
    total lands in [target, target + max_file) except the last; the
    greedy optimum for sequential packing). Each output row is a
    (file → compaction group) instruction the rewrite job executes
    group-by-group, committing one swap per group so failures leave
    the table readable.

    One partitioned bounded-frame window (the partition key carries
    the shuffle); file sizes stand in via doc lengths on the fixture.
    The cumulative form never materializes group state — the same
    running-sum trick as ts_interpolate's neighbor scan."""
    files = load_table(spark, sf_dir, "documents").select(
        F.col("source").alias("part"),
        F.col("doc_id").alias("file_id"),
        F.col("n_chars").cast("long").alias("bytes"),
    )
    w = (
        Window.partitionBy("part")
        .orderBy("file_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return files.select(
        "part",
        "file_id",
        "bytes",
        F.expr(
            f"(sum(bytes) over (partition by part order by file_id "
            f"rows between unbounded preceding and current row) - 1) "
            f"div {_COMPACT_TARGET}"
        ).alias("compaction_group"),
    )


_CLM_FILES = 64


@query(
    "maintenance_cluster_metric",
    oracle=f"""
    WITH li AS (
        SELECT l_orderkey,
               datediff('day', DATE '1995-01-01',
                        CAST(l_shipdate AS DATE)) AS d,
               year(l_shipdate) * 12 + month(l_shipdate) AS mo
        FROM lineitem
    ),
    anchor AS (
        SELECT CAST(MIN(d) AS BIGINT) AS d_lo,
               CAST(MAX(d) AS BIGINT) AS d_hi
        FROM li
    ),
    assigned AS (
        SELECT 'hash' AS layout,
               CAST(l_orderkey % {_CLM_FILES} AS BIGINT) AS fid, mo
        FROM li
        UNION ALL
        SELECT 'clustered' AS layout,
               CAST(((d - a.d_lo) * {_CLM_FILES})
                    // (a.d_hi - a.d_lo + 1) AS BIGINT) AS fid, mo
        FROM li, anchor a
    ),
    files AS (
        SELECT layout, fid,
               CAST(MIN(mo) AS BIGINT) AS mo_lo,
               CAST(MAX(mo) AS BIGINT) AS mo_hi
        FROM assigned GROUP BY layout, fid
    ),
    months AS (SELECT DISTINCT mo FROM li),
    scan AS (
        SELECT f.layout, CAST(COUNT(*) AS BIGINT) AS n_overlaps
        FROM files f JOIN months m
          ON m.mo BETWEEN f.mo_lo AND f.mo_hi
        GROUP BY f.layout
    ),
    dims AS (
        SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_files
        FROM files GROUP BY layout
    ),
    nm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_months FROM months)
    SELECT d.layout, d.n_files, nm.n_months,
           {sql_qround('s.n_overlaps / CAST(nm.n_months AS DOUBLE)', 6)}
               AS avg_files_per_month,
           {sql_qround(
               's.n_overlaps'
               ' / (CAST(nm.n_months AS DOUBLE) * d.n_files)', 6)}
               AS scan_fraction
    FROM dims d JOIN scan s ON d.layout = s.layout, nm
    """,
)
def maintenance_cluster_metric(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Clustering-effectiveness metric — the number a table-
    maintenance job reads to decide whether a re-cluster (Z-order /
    sort-by write) pays: simulate assigning lineitem rows to
    64 files under (a) a hash layout (orderkey mod F — what
    an unsorted ingest produces) and (b) a ship-date range-clustered
    layout, record each file's min/max month (exactly the parquet
    footer stats a scan planner prunes on), and measure how many
    files a one-month probe must read, averaged over the observed
    months. A hash layout gives scan_fraction ≈ 1 (every file spans
    every month — zero pruning); the clustered layout gives ≈ 1/F ·
    span — the read-amplification gap IS the value of re-clustering.
    Companion to maintenance_compaction_plan (file COUNT hygiene;
    this measures file ORDER hygiene).

    The clustered assignment needs the global day range — one 2-long
    column-pruned anchor aggregate, broadcast (the honest-extra-pass
    pattern, cf. dq_freshness). Everything else is integer month
    arithmetic: per-(layout, file) min/max months, a ≤(2F)-row ×
    months broadcast range join, two divides at emit (qround 6).
    At 100 TB the per-file stats table IS the table manifest —
    file-count-sized, never row-scale."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.datediff(
            F.to_date("l_shipdate"), F.to_date(F.lit("1995-01-01"))
        ).alias("d"),
        (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("mo"),
    )
    anchor = li.agg(
        F.min("d").cast("long").alias("d_lo"),
        F.max("d").cast("long").alias("d_hi"),
    )
    hash_fid = (F.col("l_orderkey") % _CLM_FILES).cast("long")
    hashed = li.select(
        F.lit("hash").alias("layout"), hash_fid.alias("fid"), "mo"
    )
    clustered = li.crossJoin(F.broadcast(anchor)).select(
        F.lit("clustered").alias("layout"),
        F.expr(
            f"CAST((d - d_lo) * {_CLM_FILES}"
            " div (d_hi - d_lo + 1) AS BIGINT)"
        ).alias("fid"),
        "mo",
    )
    assigned = hashed.unionAll(clustered)
    files = assigned.groupBy("layout", "fid").agg(
        F.min("mo").cast("long").alias("mo_lo"),
        F.max("mo").cast("long").alias("mo_hi"),
    ).transform(pin)
    months = li.select("mo").distinct().transform(pin)
    scan = (
        files.join(
            F.broadcast(months),
            (F.col("mo") >= F.col("mo_lo"))
            & (F.col("mo") <= F.col("mo_hi")),
        )
        .groupBy("layout")
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlaps"))
    )
    dims = files.groupBy("layout").agg(
        F.count(F.lit(1)).cast("long").alias("n_files")
    )
    nm = months.agg(F.count(F.lit(1)).cast("long").alias("n_months"))
    return (
        dims.join(scan, "layout")
        .crossJoin(F.broadcast(nm))
        .select(
            "layout",
            "n_files",
            "n_months",
            qround(
                F.col("n_overlaps") / F.col("n_months").cast("double"), 6
            ).alias("avg_files_per_month"),
            qround(
                F.col("n_overlaps")
                / (
                    F.col("n_months").cast("double") * F.col("n_files")
                ),
                6,
            ).alias("scan_fraction"),
        )
    )


_RI_CHECKS = [
    ("orders.o_custkey->customer.c_custkey",
     "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem.l_orderkey->orders.o_orderkey",
     "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part.p_partkey",
     "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier.s_suppkey",
     "lineitem", "l_suppkey", "supplier", "s_suppkey"),
]


@query(
    "dq_referential_integrity",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{name}' AS fk,
               CAST(COUNT(*) AS BIGINT) AS n_child_rows,
               CAST(COUNT(CASE WHEN p.{pkey} IS NULL THEN 1 END)
                    AS BIGINT) AS n_orphan_rows,
               CAST(COUNT(DISTINCT CASE WHEN p.{pkey} IS NULL
                                        THEN c.{ckey} END)
                    AS BIGINT) AS n_orphan_keys
        FROM {child} c LEFT JOIN
             (SELECT DISTINCT {pkey} FROM {parent}) p
          ON p.{pkey} = c.{ckey}
        """
        for name, child, ckey, parent, pkey in _RI_CHECKS
    ),
)
def dq_referential_integrity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Foreign-key orphan census across the star schema's four FK
    edges — the referential-integrity contract a lakehouse cannot get
    from the storage layer (no FK enforcement in parquet): per edge,
    child-row count, orphan rows (child keys with no parent), and
    distinct orphan keys. A healthy TPC-H-shaped fixture reports 0
    orphans everywhere — the VALUE is the standing check: an
    incremental ingest that lands children before parents, or a
    compaction that drops a parent file, turns a row nonzero and the
    dq gate red (companion to dq_contract_check's schema/null rules
    and dq_freshness's lag census).

    Each edge is ONE left join child→distinct-parent-keys with
    conditional aggregation — all three counts from a SINGLE child
    pass (a left-anti + separate total was two scans per edge —
    six lineitem reads per run; the save-a-corpus-scan discipline,
    cf. agg_theil_index). At 100 TB the parent key sides
    (customer/part/supplier) broadcast where small, and the orders
    side co-partitions with lineitem on orderkey (the bucketed-layout
    pair the TPC-H queries already exploit). Output is 4 fixed
    rows."""
    out = None
    for name, child, ckey, parent, pkey in _RI_CHECKS:
        c = load_table(spark, sf_dir, child).select(
            F.col(ckey).alias("k")
        )
        p = (
            load_table(spark, sf_dir, parent)
            .select(F.col(pkey).alias("k"))
            .distinct()
            .withColumn("hit", F.lit(1))
        )
        row = (
            c.join(p, "k", "left")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_child_rows"),
                F.count(F.when(F.col("hit").isNull(), 1))
                .cast("long")
                .alias("n_orphan_rows"),
                F.count_distinct(
                    F.when(F.col("hit").isNull(), F.col("k"))
                )
                .cast("long")
                .alias("n_orphan_keys"),
            )
            .select(
                F.lit(name).alias("fk"),
                "n_child_rows",
                "n_orphan_rows",
                "n_orphan_keys",
            )
        )
        out = row if out is None else out.unionAll(row)
    return out


_PSI_BINS = 10
_PSI_EPS = 0.0001


@query(
    "dq_psi_drift",
    oracle=f"""
    WITH span AS (
        SELECT MIN(ts) AS lo, MAX(ts) AS hi FROM events
    ),
    tagged AS (
        SELECT e.value,
               CASE WHEN epoch_us(e.ts) * 2
                         <= epoch_us(s.lo) + epoch_us(s.hi)
                    THEN 0 ELSE 1 END AS period
        FROM events e, span s
    ),
    ref AS (
        SELECT MIN(value) AS vlo, MAX(value) AS vhi
        FROM tagged WHERE period = 0
    ),
    binned AS (
        SELECT t.period,
               LEAST(GREATEST(CAST(FLOOR(
                   (t.value - r.vlo) * {_PSI_BINS} / (r.vhi - r.vlo)
               ) AS BIGINT), 0), {_PSI_BINS - 1}) AS bin
        FROM tagged t, ref r WHERE r.vhi > r.vlo
    ),
    cells AS (
        SELECT bin,
               CAST(COUNT(CASE WHEN period = 0 THEN 1 END) AS BIGINT)
                   AS n_ref,
               CAST(COUNT(CASE WHEN period = 1 THEN 1 END) AS BIGINT)
                   AS n_cur
        FROM binned GROUP BY bin
    ),
    tot AS (
        SELECT CAST(SUM(n_ref) AS BIGINT) AS tr,
               CAST(SUM(n_cur) AS BIGINT) AS tc
        FROM cells
    ),
    terms AS (
        SELECT c.bin, c.n_ref, c.n_cur,
               {sql_qround(
                   "(GREATEST(c.n_ref / CAST(t.tr AS DOUBLE),"
                   f" {_PSI_EPS})"
                   " - GREATEST(c.n_cur / CAST(t.tc AS DOUBLE),"
                   f" {_PSI_EPS}))"
                   " * ln(GREATEST(c.n_ref / CAST(t.tr AS DOUBLE),"
                   f" {_PSI_EPS})"
                   " / GREATEST(c.n_cur / CAST(t.tc AS DOUBLE),"
                   f" {_PSI_EPS}))", 6)} AS psi_term
        FROM cells c, tot t WHERE t.tr > 0 AND t.tc > 0
    ),
    ptot AS (
        SELECT {sql_qround('SUM(psi_term)', 6)} AS psi_total FROM terms
    )
    SELECT bin, n_ref, n_cur, psi_term, ptot.psi_total
    FROM terms, ptot
    """,
)
def dq_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second
    time-halves of the event value distribution — the industry drift
    gate (PSI < 0.1 stable, > 0.25 retrain/alert): Σ (p−q)·ln(p/q)
    over 10 equal-width bins whose EDGES COME FROM THE REFERENCE
    period only (the defining PSI convention — current-period
    outliers clamp into the edge bins rather than moving the grid).
    Complements stat_ks_two_sample (exact ECDF test, p-value) with
    the binned, thresholdable, monitoring-dashboard form.

    Empty-bin guard is the standard ε-clamp (p, q ≥ 1e-4) so a bin
    present in one period only contributes a finite term. Anchors
    (time span; reference value range) are two 1-row column-pruned
    aggregates broadcast back — the honest-extra-pass pattern. Bin
    assignment is a deterministic per-row IEEE expression, identical
    on both engines; per-bin terms qround(6) before the window total
    over ≤ 10 rows.

    100 TB shape: two anchor passes + ONE binned count aggregate
    (map-side combined, 10 cells × 2 periods); everything after is
    bin-sized."""
    ev = load_table(spark, sf_dir, "events").select("ts", "value")
    span = ev.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).transform(pin)
    tagged = ev.crossJoin(F.broadcast(span)).select(
        "value",
        F.when(
            F.expr("unix_micros(cast(ts as timestamp))") * 2
            <= F.expr(
                "unix_micros(cast(lo as timestamp))"
                " + unix_micros(cast(hi as timestamp))"
            ),
            F.lit(0),
        )
        .otherwise(F.lit(1))
        .alias("period"),
    )
    ref = tagged.filter(F.col("period") == 0).agg(
        F.min("value").alias("vlo"), F.max("value").alias("vhi")
    )
    binned = (
        tagged.crossJoin(F.broadcast(ref))
        .filter(F.col("vhi") > F.col("vlo"))
        .select(
            "period",
            F.least(
                F.greatest(
                    F.floor(
                        (F.col("value") - F.col("vlo"))
                        * _PSI_BINS
                        / (F.col("vhi") - F.col("vlo"))
                    ).cast("long"),
                    F.lit(0).cast("long"),
                ),
                F.lit(_PSI_BINS - 1).cast("long"),
            ).alias("bin"),
        )
    )
    cells = binned.groupBy("bin").agg(
        F.count(F.when(F.col("period") == 0, 1)).cast("long").alias(
            "n_ref"
        ),
        F.count(F.when(F.col("period") == 1, 1)).cast("long").alias(
            "n_cur"
        ),
    ).transform(pin)
    tot = cells.agg(
        F.sum("n_ref").cast("long").alias("tr"),
        F.sum("n_cur").cast("long").alias("tc"),
    )
    p = F.greatest(
        F.col("n_ref") / F.col("tr").cast("double"), F.lit(_PSI_EPS)
    )
    q = F.greatest(
        F.col("n_cur") / F.col("tc").cast("double"), F.lit(_PSI_EPS)
    )
    # bin-sized and consumed by the row output AND the grand total —
    # checkpoint; the total is a broadcast re-aggregate, NOT a global
    # window (the sweep bans empty-partition windows; a lit(1) spec
    # constant-folds to exactly that)
    terms = (
        cells.crossJoin(F.broadcast(tot))
        .filter((F.col("tr") > 0) & (F.col("tc") > 0))
        .select(
            "bin",
            "n_ref",
            "n_cur",
            qround((p - q) * F.log(p / q), 6).alias("psi_term"),
        )
        .transform(pin)
    )
    ptot = terms.agg(qround(F.sum("psi_term"), 6).alias("psi_total"))
    return terms.crossJoin(F.broadcast(ptot)).select(
        "bin", "n_ref", "n_cur", "psi_term", "psi_total"
    )


@query(
    "dq_cross_field_consistency",
    oracle=f"""
    WITH rec AS (
      SELECT l_orderkey AS okey,
             {sql_qround(
                 "SUM(" + sql_qround(
                     "l_extendedprice * (1 + l_tax) * (1 - l_discount)",
                     6) + ")", 4)} AS recomputed
      FROM lineitem GROUP BY l_orderkey
    ),
    j AS (
      SELECT o.o_orderkey, o.o_totalprice, rec.recomputed,
             CASE WHEN rec.recomputed IS NOT NULL
                       AND o.o_totalprice > 0
                  THEN {sql_qround(
                      "ABS(rec.recomputed - o.o_totalprice)"
                      " / o.o_totalprice", 6)}
             END AS rel_err
      FROM orders o LEFT JOIN rec ON o.o_orderkey = rec.okey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(rel_err) AS BIGINT) AS n_checked,
           CAST(COUNT(*) FILTER (WHERE rel_err IS NULL) AS BIGINT)
               AS n_unmatched,
           CAST(COUNT(*) FILTER (WHERE rel_err <= 0.01) AS BIGINT)
               AS n_within_1pct,
           CAST(COUNT(*) FILTER (WHERE rel_err > 0.01
                                   AND rel_err <= 0.10) AS BIGINT)
               AS n_within_10pct,
           CAST(COUNT(*) FILTER (WHERE rel_err > 0.10) AS BIGINT)
               AS n_beyond_10pct,
           MAX(rel_err) AS max_rel_err
    FROM j
    """,
)
def dq_cross_field_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table derived-field consistency check: recompute each
    order's total from its line items (Σ extendedprice·(1+tax)·
    (1−discount) — the TPC-H pricing identity) and band the relative
    error against the stored o_totalprice. Referential integrity
    (dq_referential_integrity) says the keys join; THIS says the
    VALUES agree — the reconciliation gate warehouses run between a
    fact table and its denormalized rollup, where silent drift means
    a broken upstream job. The synthetic fixture intentionally does
    NOT maintain the identity, so the bands carry real mass — the op
    reports, it does not assert.

    Float discipline: each 3-way 2dp product is qround(6) (its exact
    decimal grid), the per-order sum (bounded fan-in) qround(4) per
    the summed-products rule, the relative error qround(6) — band
    predicates then compare identical doubles on both engines.
    Orders with no line items count as n_unmatched, not errors.

    100 TB shape: one hash aggregate on the fact table's own join
    key (co-partitioned with a bucketed-by-orderkey layout), one
    broadcast-or-shuffle join to orders, a 1-row reduce. Column
    pruning reads 4 of 16 lineitem columns."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    rec = li.groupBy(F.col("l_orderkey").alias("okey")).agg(
        qround(
            F.sum(
                qround(
                    F.col("l_extendedprice")
                    * (F.lit(1.0) + F.col("l_tax"))
                    * (F.lit(1.0) - F.col("l_discount")),
                    6,
                )
            ),
            4,
        ).alias("recomputed")
    )
    j = orders.join(
        rec, orders["o_orderkey"] == rec["okey"], "left"
    ).select(
        F.when(
            F.col("recomputed").isNotNull() & (F.col("o_totalprice") > 0),
            qround(
                F.abs(F.col("recomputed") - F.col("o_totalprice"))
                / F.col("o_totalprice"),
                6,
            ),
        ).alias("rel_err")
    )
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.count("rel_err").cast("long").alias("n_checked"),
        F.sum(F.when(F.col("rel_err").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_unmatched"),
        F.sum(F.when(F.col("rel_err") <= 0.01, 1).otherwise(0))
        .cast("long")
        .alias("n_within_1pct"),
        F.sum(
            F.when(
                (F.col("rel_err") > 0.01) & (F.col("rel_err") <= 0.10), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_within_10pct"),
        F.sum(F.when(F.col("rel_err") > 0.10, 1).otherwise(0))
        .cast("long")
        .alias("n_beyond_10pct"),
        F.max("rel_err").alias("max_rel_err"),
    )

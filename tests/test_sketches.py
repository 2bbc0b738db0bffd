"""Accuracy bounds for sketch-based operators (rows-only at the
driver gate — the estimates are engine-specific by design, so the
correctness story lives here: estimate vs exact within the sketch's
published error bound)."""

from __future__ import annotations

import __spark_entry__ as entry_mod

QUERIES = entry_mod.queries()


def test_hll_two_level_rollup_accuracy(spark, sf_dir):
    """Region-level estimates from UNIONED nation sketches must sit
    within 5% of exact distinct counts (lgK=12 → ~1.6% rse; 5% is a
    comfortable deterministic bound for fixture sizes)."""
    from pyspark.sql import functions as F

    from etl_geonames_spark.sources import load_table

    est = {
        r["n_regionkey"]: r["approx_customers"]
        for r in QUERIES["agg_sketch_hll"](spark, sf_dir).collect()
    }
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    exact = {
        r["n_regionkey"]: r["n"]
        for r in cust.join(
            nation, cust["c_nationkey"] == nation["n_nationkey"]
        )
        .groupBy("n_regionkey")
        .agg(F.count_distinct("c_custkey").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert abs(est[k] - n) <= max(2, 0.05 * n), (k, est[k], n)


def test_kll_rollup_quantile_accuracy(spark, sf_dir):
    """Per-flag AND merged-ALL KLL quantile estimates must land within
    the exact [p-3%, p+3%] rank band (k=200 default → ~1.65% rank
    error at 99% confidence; 3% is a deterministic fixture bound)."""
    from etl_geonames_spark.sources import load_table

    rows = {
        r["l_returnflag"]: (r["p50"], r["p95"], r["n"])
        for r in QUERIES["agg_sketch_kll"](spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    groups = {"ALL": li}
    for flag in li.select("l_returnflag").distinct().toPandas()["l_returnflag"]:
        groups[flag] = li.filter(li["l_returnflag"] == flag)
    assert set(rows) == set(groups)
    for flag, df in groups.items():
        p50, p95, n = rows[flag]
        assert n == df.count()
        for est, q in ((p50, 0.5), (p95, 0.95)):
            lo, hi = df.stat.approxQuantile(
                "l_extendedprice", [max(0.0, q - 0.03), min(1.0, q + 0.03)], 0.0
            )
            assert lo <= est <= hi, (flag, q, est, lo, hi)


def test_cms_bounds(spark, sf_dir):
    """CMS contract on the real fixture: estimate ≥ true count for
    every probe (never undercounts), and overcount ≤ εN with
    ε = e/w — the depth-4 failure probability is e^-4 ≈ 1.8%, far
    below the deterministic fixture's margin."""
    import math

    import __spark_entry__ as entry_mod
    from etl_geonames_spark.operators.reshape import _CMS_W

    rows = (
        entry_mod.queries()["agg_sketch_cms"](spark, sf_dir)
        .collect()
    )
    assert len(rows) == 5
    n_total = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    eps_n = math.e / _CMS_W * n_total
    for r in rows:
        assert r["cms_estimate"] >= r["true_count"], r
        assert r["cms_estimate"] - r["true_count"] <= eps_n, (r, eps_n)


def test_approx_distinct_and_percentile_error_bounds(spark, sf_dir):
    """The two rows-only approximate aggregates get hard accuracy
    assertions vs their exact counterparts: approx_count_distinct
    within 3×(default rsd = 5 %), approx_percentile within the rank
    tolerance implied by its accuracy parameter — so a broken sketch
    can't hide behind the rows-only driver check."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = ev.select(
        F.countDistinct("user_id").alias("d")
    ).collect()[0]["d"]
    approx = ev.select(
        F.approx_count_distinct("user_id").alias("d")
    ).collect()[0]["d"]
    assert abs(approx - exact) <= max(1, 0.15 * exact), (approx, exact)

    rows = sorted(r["value"] for r in ev.select("value").collect())
    n = len(rows)
    got = ev.select(
        F.percentile_approx("value", 0.5, 1000).alias("p")
    ).collect()[0]["p"]
    # rank tolerance: accuracy=1000 → error ≤ n/1000 ranks
    lo = rows[max(0, n // 2 - n // 1000 - 2)]
    hi = rows[min(n - 1, n // 2 + n // 1000 + 2)]
    assert lo <= got <= hi, (lo, got, hi)


def test_heavy_hitters_intervals_contain_true_counts(spark, sf_dir):
    """The merge certificate's ACTUAL promises, recomputed from
    scratch in Python (third implementation): (a) for EVERY
    candidate, lower_bound ≤ true corpus frequency ≤ upper_bound;
    (b) any word whose true count exceeds Σ_s b_s (the summed
    per-shard residual bounds) MUST be a candidate — if a word is
    kept by no shard, its count per shard is ≤ that shard's dropped
    maximum, so its total is ≤ Σ b_s (the contrapositive is the
    guarantee; 'the global top word is always a candidate' is NOT
    implied and a shard-unique-heads fixture can legally violate
    it)."""
    import __spark_entry__ as entry_mod
    from collections import Counter, defaultdict

    qs = entry_mod.queries()
    rows = qs["agg_heavy_hitters"](spark, sf_dir).collect()
    assert rows
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    truth = Counter()
    per_shard = defaultdict(Counter)
    for r in docs:
        shard = r["doc_id"] % 4
        for w in (r["text"] or "").split(" "):
            if w:
                truth[w] += 1
                per_shard[shard][w] += 1
    for r in rows:
        t = truth[r["word"]]
        assert r["lower_bound"] <= t <= r["upper_bound"], (
            r["word"], r["lower_bound"], t, r["upper_bound"])
    sum_bounds = 0
    for s, c in per_shard.items():
        ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
        if len(ranked) > 8:
            sum_bounds += max(cnt for _, cnt in ranked[8:])
    cands = {r["word"] for r in rows}
    for w, t in truth.items():
        if t > sum_bounds:
            assert w in cands, (w, t, sum_bounds)

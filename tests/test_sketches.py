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

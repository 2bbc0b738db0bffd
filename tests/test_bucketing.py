"""Bucketed co-located joins: pre-shuffling both sides of a recurring
join into the same bucket layout eliminates the per-query exchange —
the 100 TB answer for fact⋈fact joins run many times on the same key.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_geonames_spark.plans import shuffle_exchange_count
from etl_geonames_spark.sources import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    # external tables (explicit path) — warehouse.dir is static config
    wh = tmp_path_factory.mktemp("warehouse")
    for name, key in [("orders", "o_custkey"), ("customer", "c_custkey")]:
        (
            load_table(spark, sf_dir, name)
            .write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .option("path", str(wh / f"b_{name}"))
            .saveAsTable(f"b_{name}")
        )
    yield
    for name in ["orders", "customer"]:
        spark.sql(f"DROP TABLE IF EXISTS b_{name}")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    """Both sides bucketed (8, custkey): the join consumes the bucket
    layout directly — zero shuffle exchanges in the plan."""
    # disable auto-broadcast so the test proves bucketing (not
    # broadcast) removed the exchanges
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table("b_orders")
        c = spark.table("b_customer")
        joined = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
            "o_orderkey", "c_name", "o_totalprice"
        )
        assert shuffle_exchange_count(joined) == 0
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_agg_has_no_exchange(spark, bucketed_tables):
    """Aggregation on the bucket key also reuses the layout."""
    o = spark.table("b_orders")
    agg = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    assert shuffle_exchange_count(agg) == 0
    assert agg.count() > 0

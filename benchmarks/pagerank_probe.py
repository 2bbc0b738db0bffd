#!/usr/bin/env python
"""PageRank layout probe: plain (per-round src shuffle) vs bucketed
(edge list written once bucketed by src, one shuffle per round) at
increasing iteration counts, on a 10x-densified sf0.1 edge list.

The plan contract (tests/test_plans.py) proves the bucketed variant
holds exactly one exchange per round; this probe measures what that
buys in wall-clock as rounds grow — the number that matters for a
convergence-driven run at 100 TB, where the edge list dwarfs memory
and every avoided exchange is a full-data network pass.

Results go to stdout as one JSON line; paste into BASELINE.md when
they move.

Usage: python benchmarks/pagerank_probe.py
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC_SF = "/root/testdata/sf0.1"
DENSIFY = 10  # replicate orders with shifted keys -> 10x edges
ROUNDS = [3, 10]


def main() -> None:
    from pyspark.sql import functions as F

    from etl_geonames_spark import get_spark
    from etl_geonames_spark.operators.graph import (
        _N_ITER,
        graph_pagerank,
        pagerank_bucketed,
    )
    from etl_geonames_spark.sources import load_table

    spark = get_spark("pagerank-probe")
    tmp = tempfile.mkdtemp(prefix="pr_probe_")

    # densified fixture dir: orders replicated with shifted custkeys so
    # _edges() derives a 10x edge list with the same key-space shape
    orders = load_table(spark, SRC_SF, "orders")
    rep = orders.crossJoin(
        F.broadcast(
            spark.range(DENSIFY).select(F.col("id").alias("_rep"))
        )
    ).select(
        (F.col("o_custkey") + F.col("_rep") * 100_000).alias("o_custkey"),
        "o_orderkey",
    )
    rep.write.mode("overwrite").parquet(f"{tmp}/orders.parquet")

    results: dict[str, float] = {}
    for n_iter in ROUNDS:
        import etl_geonames_spark.operators.graph as g

        # plain: fixed-iteration lazy plan with per-round src shuffles
        t0 = time.perf_counter()
        g._N_ITER, saved = n_iter, g._N_ITER
        try:
            graph_pagerank(spark, tmp).write.format("noop").mode(
                "overwrite"
            ).save()
        finally:
            g._N_ITER = saved
        results[f"plain_{n_iter}r"] = round(time.perf_counter() - t0, 3)

        # bucketed: one-time bucketed write + n_iter one-shuffle rounds
        t0 = time.perf_counter()
        pagerank_bucketed(
            spark,
            tmp,
            table=f"pr_probe_{n_iter}",
            path=f"{tmp}/bucketed_{n_iter}",
            n_iter=n_iter,
        ).write.format("noop").mode("overwrite").save()
        results[f"bucketed_{n_iter}r"] = round(time.perf_counter() - t0, 3)
        spark.sql(f"DROP TABLE IF EXISTS pr_probe_{n_iter}")

    n_edges = (
        spark.read.parquet(f"{tmp}/orders.parquet")
        .select("o_custkey", "o_orderkey")
        .distinct()
        .count()
    )
    print(
        json.dumps(
            {
                "metric": "pagerank_layout_probe",
                "unit": "sec",
                "n_edges_approx": n_edges,
                "timings": results,
                "default_iters": _N_ITER,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""SemDeDup scale + recall probe: 25x-replicated sf0.1 embeddings
(50k vectors) with PLANTED near-duplicates — every replica of a
vector is the original plus a tiny deterministic perturbation, so
each source vector heads a 25-member near-dup clique (cosine ≈ 1).

Measures (a) end-to-end wall for the semdedup pipeline at 25x the
fixture scale, (b) recall: a perfect semantic dedup keeps ~1 vector
per clique, so kept/total ≈ 1/25. Blocking misses (clique straddling
a k-means Voronoi boundary) are the only recall loss — the number to
watch. Results go to stdout as one JSON line; paste into BASELINE.md
when they move.

Usage: python benchmarks/semdedup_probe.py
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC_SF = "/root/testdata/sf0.1"
N_COPIES = 25


def main() -> None:
    from pyspark.sql import functions as F

    from etl_geonames_spark import get_spark
    from etl_geonames_spark.registry import collect
    from etl_geonames_spark.sources import load_table

    spark = get_spark("semdedup-probe")
    qs, _ = collect()

    tmp = tempfile.mkdtemp(prefix="semdedup_probe_")
    emb = load_table(spark, SRC_SF, "embeddings")
    parts = []
    for i in range(N_COPIES):
        # replica i: vec + i*1e-4 on every dim — cosine to the
        # original stays ≈ 1 (>> the 0.40 gate), ids offset so each
        # source id heads a clique of N_COPIES near-identical vectors.
        parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(i * 1_000_000)).alias("vec_id"),
                F.transform(
                    "embedding", lambda x: x + F.lit(i * 1e-4)
                ).alias("embedding"),
                "label",
            )
        )
    rep = parts[0]
    for p in parts[1:]:
        rep = rep.union(p)
    rep.write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")
    n_vecs = spark.read.parquet(f"{tmp}/embeddings.parquet").count()

    from etl_geonames_spark.operators.llm import semdedup_keep

    # fixture-pinned k=32 (what the registry query runs) vs the
    # paper's k≈√n — the scaling lever the operator docstring claims.
    t0 = time.perf_counter()
    fixed_df = qs["llm_semdedup"](spark, tmp)
    fixed_df.write.format("noop").mode("overwrite").save()
    wall_k32 = round(time.perf_counter() - t0, 2)

    k_scaled = 224  # ≈ √50k
    t0 = time.perf_counter()
    kept_df = semdedup_keep(spark, tmp, k_scaled, 0.40, arrow_assign=True)
    kept_df.write.format("noop").mode("overwrite").save()
    wall = round(time.perf_counter() - t0, 2)
    kept = kept_df.count()

    # per-clique survivors: clique key = vec_id % 1_000_000
    survivors = (
        kept_df.select((F.col("vec_id") % 1_000_000).alias("clique"))
        .groupBy("clique")
        .count()
    )
    stats = survivors.agg(
        F.count(F.lit(1)).alias("cliques_with_survivor"),
        F.avg("count").alias("avg_survivors"),
        F.max("count").alias("max_survivors"),
    ).collect()[0]

    out = {
        "n_vecs": n_vecs,
        "wall_s_k32": wall_k32,
        "wall_s_k224_arrow": wall,
        "kept": kept,
        "dedup_ratio": round(kept / n_vecs, 4),
        "cliques_with_survivor": stats["cliques_with_survivor"],
        "avg_survivors_per_clique": round(stats["avg_survivors"], 2),
        "max_survivors_per_clique": stats["max_survivors"],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

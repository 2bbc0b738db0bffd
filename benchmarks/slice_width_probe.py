#!/usr/bin/env python
"""Slice-width scaling curve for the two quadratic-by-contract eval
ops (VERDICT r8 item 5): llm_substring_census (pair bill = sum_gram
df² over every gram length) and llm_metric_kendall (pair census =
w(w-1)/2). Both are doc_id < W slice-bounded by contract; this probe
measures wall + output/pair counts at W = 50/100/200/400/800 over the
sf0.1 corpus so the quadratic contract is a measured line in
BASELINE.md, not a docstring promise.

Also runs llm_lcs_corpus_exact (the threshold-seeded corpus-wide
exact-LCS scale-up path) at the same widths via an id-filtered corpus
copy, to show the threshold form's bill grows with the corpus' true
shared-run structure, not with W².

Usage: python benchmarks/slice_width_probe.py   (quiet box only)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.1"
WIDTHS = [50, 100, 200, 400, 800]


def main() -> None:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from etl_geonames_spark import get_spark
    from etl_geonames_spark.operators.curation import metric_kendall
    from etl_geonames_spark.operators.llm import substring_census
    from etl_geonames_spark.registry import collect
    from etl_geonames_spark.sources import load_table

    spark = get_spark("slice-width-probe")
    sc = spark.sparkContext

    def drop_checkpoints() -> None:
        # bench.py's per-query storage hygiene: the 15 curve points
        # localCheckpoint corpus-sized tables; without unpersisting
        # between points, later measurements run under monotonically
        # growing storage pressure — the interference the curve is
        # supposed to be free of
        post = sc._jsc.getPersistentRDDs()
        for rid in post.keySet().toArray():
            rdd = post.get(rid)
            if rdd is not None:
                rdd.unpersist(True)
    # warm: one run at the contractual width so session costs don't
    # land on the first curve point
    substring_census(spark, SF, 50).write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, dict] = {"census": {}, "kendall": {}}
    for w in WIDTHS:
        t0 = time.perf_counter()
        df = substring_census(spark, SF, w)
        df.write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 2)
        rows = df.count()
        drop_checkpoints()
        out["census"][str(w)] = {"wall_s": wall, "pairs": rows}
        print(f"# census W={w}: {wall}s, {rows} pairs", file=sys.stderr)
    for w in WIDTHS:
        t0 = time.perf_counter()
        df = metric_kendall(spark, SF, w)
        df.write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 2)
        drop_checkpoints()
        out["kendall"][str(w)] = {
            "wall_s": wall,
            "pairs": w * (w - 1) // 2,
        }
        print(f"# kendall W={w}: {wall}s", file=sys.stderr)
    # llm_lcs_corpus_exact over id-filtered corpus copies of the same
    # widths: the threshold form's pair bill tracks the corpus' TRUE
    # shared-run structure (how many pairs share an 8-gram), not W² —
    # the contrast with the census column is the point
    qs, _ = collect()
    out["lcs"] = {}
    docs = load_table(spark, SF, "documents")
    for w in WIDTHS:
        tmp = tempfile.mkdtemp(prefix=f"lcs_w{w}_")
        docs.filter(F.col("doc_id") < w).write.mode("overwrite").parquet(
            f"{tmp}/documents.parquet"
        )
        t0 = time.perf_counter()
        df = qs["llm_lcs_corpus_exact"](spark, tmp)
        df.write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 2)
        out["lcs"][str(w)] = {"wall_s": wall, "pairs": df.count()}
        drop_checkpoints()
        shutil.rmtree(tmp, ignore_errors=True)
        print(f"# lcs W={w}: {out['lcs'][str(w)]}", file=sys.stderr)
    print(json.dumps({"sf": 0.1, "widths": WIDTHS, **out}))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""r15 pin-strategy A/B: solo noop-sink min-of-3 per query per pin
mode (the BASELINE.md adjudication ritual), interleaved in ONE warm
session on a quiet box so box drift cancels.

Modes (etl_geonames_spark.functions.pin reads SPARK_GRAFT_PIN at
query-BUILD time, so one session can switch per run):
  eager — localCheckpoint()           (the r14 shape: blocking job per pin)
  lazy  — localCheckpoint(eager=False) (r15 default: materialize in-job)
  none  — no pin                       (multi-consumer subplans re-execute)

Usage:
  SPARK_GRAFT_SF_DIR=... python benchmarks/pin_ab_r15.py \
      [--modes eager,lazy,none] name [name ...]

Prints one JSON line: {name: {mode: [t1,t2,t3], ...}, ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    args = sys.argv[1:]
    modes = ["eager", "lazy"]
    if args and args[0] == "--modes":
        modes = args[1].split(",")
        args = args[2:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry_mod
    from etl_geonames_spark.session import get_spark

    spark = get_spark("pin-ab-r15")
    sc = spark.sparkContext
    qs = entry_mod.queries()

    # session warm-up (same shape as bench.py)
    from etl_geonames_spark.sources.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()
    spark.range(10).write.format("noop").mode("overwrite").save()

    def drop_new_rdds(pre):
        post = sc._jsc.getPersistentRDDs()
        for rid in set(post.keySet().toArray()) - pre:
            rdd = post.get(rid)
            if rdd is not None:
                rdd.unpersist(True)

    out: dict[str, dict] = {}
    for name in names:
        out[name] = {}
        for mode in modes:
            os.environ["SPARK_GRAFT_PIN"] = mode
            sc._jvm.System.gc()
            time.sleep(1.0)
            pre = set(sc._jsc.getPersistentRDDs().keySet().toArray())
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()  # discarded warm-up
            drop_new_rdds(pre)
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(round(time.perf_counter() - t0, 4))
                drop_new_rdds(pre)
            out[name][mode] = runs
        os.environ.pop("SPARK_GRAFT_PIN", None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Solo noop-sink re-timer + plan capture (the BASELINE.md
adjudication ritual, callable for a named subset): for each query
name given on argv, GC-settle, run one discarded warm-up, then 3
timed noop-sink executions, and optionally dump
``.explain("formatted")`` to a file.

Usage:
  SPARK_GRAFT_SF_DIR=... python benchmarks/solo_time.py \
      [--plans DIR --suffix before] name [name ...]

Prints one JSON line: {name: [t1, t2, t3], ...}.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    args = sys.argv[1:]
    plans_dir = None
    suffix = "plan"
    if args and args[0] == "--plans":
        plans_dir = Path(args[1])
        plans_dir.mkdir(parents=True, exist_ok=True)
        args = args[2:]
    if args and args[0] == "--suffix":
        suffix = args[1]
        args = args[2:]
    names = args

    import __spark_entry__ as entry_mod
    from etl_geonames_spark.session import get_spark
    from etl_geonames_spark.sources.tables import TABLE_NAMES, load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("etl-geonames-spark-solo")
    qs = entry_mod.queries()

    # session warm-up (bench.py's ritual, abbreviated)
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()
    spark.range(1000).mapInPandas(lambda it: it, "id long").count()
    from pyspark.sql import functions as F

    spark.range(1000).groupBy((F.col("id") % 7).alias("k")).count().count()
    spark.sql(
        "SELECT upper(cast(id AS STRING)) u, lower(cast(id AS STRING)) l "
        "FROM range(10)"
    ).count()
    spark.range(10).write.format("noop").mode("overwrite").save()

    sc = spark.sparkContext

    def drop_rdds(pre: set) -> None:
        post = sc._jsc.getPersistentRDDs()
        for rid in set(post.keySet().toArray()) - pre:
            rdd = post.get(rid)
            if rdd is not None:
                rdd.unpersist(True)

    out: dict[str, list[float]] = {}
    for name in names:
        sc._jvm.System.gc()
        time.sleep(1.0)
        pre = set(sc._jsc.getPersistentRDDs().keySet().toArray())
        df = qs[name](spark, sf_dir)
        if plans_dir is not None:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            (plans_dir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        df.write.format("noop").mode("overwrite").save()
        drop_rdds(pre)
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            d = qs[name](spark, sf_dir)
            d.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 4))
            drop_rdds(pre)
        out[name] = runs
        print(f"## {name}: {runs}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

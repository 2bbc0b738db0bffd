#!/usr/bin/env python
"""Single-node throughput race: the Spark pipeline vs the reference's
single-threaded execution model on the same synthetic GeoNames dump.

Same semantics both sides (filter NL/DE → prefix type → PIT + liesIn
relations → NDJSON out). The JS side (benchmarks/reference_sim.js) is
a dependency-free stand-in for the reference's one-process one-thread
model; the Spark side is the engine's actual pipeline writing its
actual sink.

Usage:
  python benchmarks/gen_dump.py /tmp/gnbench 1000000   # (or reuse)
  node benchmarks/reference_sim.js /tmp/gnbench /tmp/gnbench/ref_out.ndjson
  python benchmarks/geonames_throughput.py /tmp/gnbench
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    gdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gnbench"

    from etl_geonames_spark.geonames import GeonamesConfig, transform_from_paths
    from etl_geonames_spark.session import get_spark
    from etl_geonames_spark.sources.sinks import write_ndjson
    from etl_geonames_spark.sources.tsv import read_all_countries

    spark = get_spark("geonames-throughput")
    # a ~100 MB dump fits inside one default 128 MB split — size splits
    # so the scan actually parallelizes (at the real dump's 1.7 GB+ the
    # default already yields 14+ tasks; this knob is the SURVEY §7.5
    # "size partitions to the data" discipline, not a bench trick)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
    cfg = GeonamesConfig(
        types={"PPL": "hg:Place", "ADM": "hg:Admin"},
        filters=[{"countryCode": "NL"}, {"countryCode": "DE"}],
    )
    # warm the session so the race measures the pipeline, not JVM start
    read_all_countries(spark, f"{gdir}/allCountries.txt").limit(10).count()

    t0 = time.perf_counter()
    pits, rels = transform_from_paths(
        spark,
        f"{gdir}/allCountries.txt",
        f"{gdir}/admin1CodesASCII.txt",
        f"{gdir}/admin2Codes.txt",
        cfg,
    )
    write_ndjson(pits, f"{gdir}/spark_out/pits")
    write_ndjson(rels, f"{gdir}/spark_out/relations")
    sec = time.perf_counter() - t0

    n_rows = sum(1 for _ in open(f"{gdir}/allCountries.txt"))
    n_pits = spark.read.json(f"{gdir}/spark_out/pits").count()
    n_rels = spark.read.json(f"{gdir}/spark_out/relations").count()
    print(
        json.dumps(
            {
                "engine": "etl-geonames-spark",
                "rows": n_rows,
                "pits": n_pits,
                "relations": n_rels,
                "sec": round(sec, 2),
                "rows_per_sec": round(n_rows / sec),
            }
        )
    )


if __name__ == "__main__":
    main()

"""Ingest landing + partition pruning: the staged-pipeline contract.

The reference re-reads its whole TSV every run; the engine lands data
once as Parquet (optionally partitioned by downstream filter keys) so
later scans are columnar, splittable, and partition-pruned.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from etl_geonames_spark.ingest import convert_to_parquet
from etl_geonames_spark.plans import explain_str
from etl_geonames_spark.sources import load_table
from etl_geonames_spark.sources.sinks import write_parquet


def test_convert_to_parquet_roundtrip(spark, tmp_path):
    rows = [
        ["1001", "Amsterdam", "Amsterdam", "", "52.37", "4.89", "P", "PPLA",
         "NL", "", "07", "0363", "", "", "0", "", "", "", ""],
        ["1002", "Utrecht", "Utrecht", "", "52.09", "5.12", "P", "PPL",
         "NL", "", "09", "0344", "", "", "0", "", "", "", ""],
    ]
    (tmp_path / "allCountries.txt").write_text(
        "\n".join("\t".join(r) for r in rows) + "\n"
    )
    for f in ["admin1CodesASCII.txt", "admin2Codes.txt"]:
        (tmp_path / f).write_text("NL.07\tNoord-Holland\tNoord-Holland\t1\n")
    out = tmp_path / "parquet"
    convert_to_parquet(spark, str(tmp_path), str(out))
    df = spark.read.parquet(str(out / "allcountries"))
    assert df.count() == 2
    assert df.columns[0] == "geonameid"
    assert spark.read.parquet(str(out / "admin1CodesASCII")).count() == 1


def test_partitioned_write_prunes_scan(spark, sf_dir, tmp_path):
    """events partitioned by event_type: a type filter must reach the
    scan as a PartitionFilter (directory pruning), not a row filter —
    at 100 TB this is reading 1/N of the data instead of all of it."""
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_parted")
    write_parquet(ev, path, partition_by=["event_type"])

    scan = spark.read.parquet(path).filter(F.col("event_type") == "purchase")
    plan = explain_str(scan)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_type" in m.group(1), plan
    got = scan.count()
    want = ev.filter(F.col("event_type") == "purchase").count()
    assert got == want > 0


def test_ndjson_round_trip(spark, sf_dir, tmp_path):
    """PIT documents written as NDJSON read back intact with an
    explicit schema — the staged-pipeline loop the reference leaves to
    Histograph."""
    from etl_geonames_spark.operators.pit import flagship_nested
    from etl_geonames_spark.schemas import PIT_SCHEMA
    from etl_geonames_spark.sources import read_ndjson, write_ndjson

    pits = flagship_nested(spark, sf_dir)
    path = str(tmp_path / "pits_ndjson")
    write_ndjson(pits, path)
    back = read_ndjson(spark, path, PIT_SCHEMA)
    assert back.count() == pits.count() > 0
    assert {r["uri"] for r in back.select("uri").collect()} == {
        r["uri"] for r in pits.select("uri").collect()
    }

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


def test_compact_small_files(spark, sf_dir, tmp_path):
    """64 tiny files compact to the computed target count and the data
    survives byte-for-byte (row count + checksum)."""
    import glob

    from etl_geonames_spark.sources.maintenance import compact_parquet

    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "fragmented")
    ev.repartition(64).write.parquet(path)
    assert len(glob.glob(f"{path}/part-*.parquet")) == 64
    before = ev.count()

    n = compact_parquet(spark, path, target_file_bytes=256 * 1024)
    files = glob.glob(f"{path}/part-*.parquet")
    assert len(files) == n < 64
    after_df = spark.read.parquet(path)
    assert after_df.count() == before
    assert {r["event_id"] for r in after_df.select("event_id").collect()} == {
        r["event_id"] for r in ev.select("event_id").collect()
    }


def test_binary_file_source_feeds_decode(spark, tmp_path):
    """Real media ingestion path: spark.read.format('binaryFile') over
    a directory of opaque blobs → the mapInPandas real-codec decode
    pipeline (codecs.encode_bmp on disk, codecs.decode_image in the
    worker). A non-image blob rides along and must surface as NULL
    dimensions, not an error."""
    from etl_geonames_spark.operators.codecs import encode_bmp
    from etl_geonames_spark.operators.multimodal import _image_meta_batches

    from pyspark.sql import functions as F

    media = tmp_path / "media"
    media.mkdir()
    dims = {f"img_{i}.bmp": (3 + i, 2 + i) for i in range(5)}
    payloads = {
        name: encode_bmp(w, h, bytes((j * 17) % 256 for j in range(w * h * 3)))
        for name, (w, h) in dims.items()
    }
    payloads["not_an_image.bin"] = b"plain bytes, no BMP header"
    for name, blob in payloads.items():
        (media / name).write_bytes(blob)

    raw = spark.read.format("binaryFile").load(str(media))
    blobs = raw.select(
        F.element_at(F.split("path", "/"), -1).alias("fname"),
        F.monotonically_increasing_id().alias("doc_id"),
        F.col("content").alias("blob"),
    )
    decoded = blobs.select("doc_id", "fname", "blob").mapInPandas(
        _image_meta_batches,
        schema="doc_id long, n_bytes long, width int, height int",
    )
    rows = decoded.collect()
    assert {r["n_bytes"] for r in rows} == {len(b) for b in payloads.values()}
    got_dims = {(r["width"], r["height"]) for r in rows if r["width"] is not None}
    assert got_dims == set(dims.values())
    assert sum(1 for r in rows if r["width"] is None) == 1


def test_cluster_parquet_by_produces_disjoint_file_ranges(
    spark, sf_dir, tmp_path
):
    """Range-clustering must leave each output file covering a narrow,
    non-overlapping key slice (checked in the parquet footers via
    pyarrow) — that is what lets min/max stats skip whole files for a
    point/range predicate at 100 TB."""
    import glob

    import pyarrow.parquet as pq

    from etl_geonames_spark.sources.maintenance import cluster_parquet_by

    src = str(tmp_path / "orders_src")
    out = str(tmp_path / "orders_clustered")
    load_table(spark, sf_dir, "orders").write.parquet(src)
    cluster_parquet_by(spark, src, out, ["o_totalprice"], n_files=8)

    ranges = []
    for f in glob.glob(f"{out}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        col_idx = [
            md.schema.column(i).name for i in range(md.num_columns)
        ].index("o_totalprice")
        lo = min(
            md.row_group(g).column(col_idx).statistics.min
            for g in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(g).column(col_idx).statistics.max
            for g in range(md.num_row_groups)
        )
        ranges.append((lo, hi))
    assert len(ranges) >= 4
    ranges.sort()
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next, f"overlapping file ranges: {ranges}"

    # and the selective predicate reaches the scan as a pushed filter
    df = spark.read.parquet(out).filter(F.col("o_totalprice") < 1000.0)
    assert "o_totalprice" in explain_str(df)
    # row count is preserved exactly
    assert spark.read.parquet(out).count() == load_table(
        spark, sf_dir, "orders"
    ).count()


def test_dynamic_partition_pruning_from_joined_dim(spark, sf_dir, tmp_path):
    """Dynamic partition pruning: when the partition-column predicate
    lives on the DIM side of a join (not on the fact scan), Spark
    injects a runtime subquery that prunes fact partitions before the
    scan — at 100 TB this is the difference between reading one
    partition and all of them, with no code change. The plan must show
    a dynamicpruningexpression inside the fact's PartitionFilters."""
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_dpp")
    write_parquet(ev, path, partition_by=["event_type"])

    dim = spark.createDataFrame(
        [("purchase", 1.0)], ["event_type", "weight"]
    )
    prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    try:
        fact = spark.read.parquet(path)
        j = fact.join(dim.filter(F.col("weight") > 0), "event_type")
        plan = explain_str(j)
        assert "dynamicpruning" in plan.lower(), plan
        got = j.count()
        want = ev.filter(F.col("event_type") == "purchase").count()
        assert got == want > 0
    finally:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled", prev
        )

"""End-to-end multimodal ingestion: real image/audio FILES on disk →
Spark's built-in binaryFile source → Arrow-batched codec decode →
pixel/sample stats. This is the production path the synth-blob
registry queries model — here the bytes genuinely come off the
filesystem through a Spark source, not from an in-worker generator.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from etl_geonames_spark.operators.codecs import (
    decode_image,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav_pcm16,
)
from etl_geonames_spark.sources.formats import read_media_dir


def test_binaryfile_image_ingest_decodes_real_files(spark, tmp_path):
    # defined inside the test: module-level functions in tests/ are
    # pickled by reference and the executor can't import the test module
    def _decode_file_batches(batches: Iterator[pd.DataFrame]):
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                w, h, rgb = decode_image(bytes(content))
                rows.append((path.rsplit("/", 1)[-1], w, h, sum(rgb)))
            yield pd.DataFrame(
                rows, columns=["name", "width", "height", "pix_sum"]
            )

    rgb_red = bytes([200, 10, 30] * 6)  # 3x2
    rgb_grad = bytes(range(2 * 2 * 3))  # 2x2
    (tmp_path / "a.bmp").write_bytes(encode_bmp(3, 2, rgb_red))
    (tmp_path / "b.ppm").write_bytes(encode_ppm(2, 2, rgb_grad))
    (tmp_path / "notes.txt").write_text("not an image")

    df = read_media_dir(spark, str(tmp_path), glob="*.{bmp,ppm}")
    assert df.count() == 2  # the glob pruned notes.txt at listing time
    out = {
        r["name"]: (r["width"], r["height"], r["pix_sum"])
        for r in df.select("path", "content")
        .mapInPandas(
            _decode_file_batches,
            schema="name string, width int, height int, pix_sum long",
        )
        .collect()
    }
    assert out["a.bmp"] == (3, 2, sum(rgb_red))
    assert out["b.ppm"] == (2, 2, sum(rgb_grad))


def test_binaryfile_audio_ingest_roundtrips_samples(spark, tmp_path):
    samples = [(i * 1000) % 30000 - 15000 for i in range(64)]
    (tmp_path / "tone.wav").write_bytes(encode_wav_pcm16(16000, samples))

    df = read_media_dir(spark, str(tmp_path), glob="*.wav")
    row = df.select("content", "length").collect()[0]
    rate, channels, got = decode_wav(bytes(row["content"]))
    assert (rate, channels) == (16000, 1)
    assert got == samples
    assert row["length"] == len(encode_wav_pcm16(16000, samples))


def test_sharded_manifest_export_roundtrips(spark, sf_dir, tmp_path):
    """WebDataset-style sharded export: deterministic shard routing,
    per-shard manifest stats, order-insensitive checksums. Re-running
    the export must produce the identical manifest (stable sharding),
    and reading the shards back must equal the input."""
    from pyspark.sql import functions as F

    from etl_geonames_spark.sources import load_table
    from etl_geonames_spark.sources.sinks import write_sharded_with_manifest

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "shards")
    m1 = write_sharded_with_manifest(docs, out, "doc_id", n_shards=4)
    assert m1["total_rows"] == docs.count()
    assert set(m1["shards"]) == {"0", "1", "2", "3"}
    assert all(s["n_rows"] > 0 and s["n_bytes"] > 0 for s in m1["shards"].values())

    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert sorted(c for c in back.columns if c != "_shard") == sorted(
        docs.columns
    )
    # every row sits in its hash-determined shard
    misrouted = back.filter(
        F.col("_shard")
        != F.pmod(F.xxhash64(F.col("doc_id")), F.lit(4)).cast("int")
    ).count()
    assert misrouted == 0

    m2 = write_sharded_with_manifest(
        docs, str(tmp_path / "shards2"), "doc_id", n_shards=4
    )
    assert {k: v["checksum"] for k, v in m1["shards"].items()} == {
        k: v["checksum"] for k, v in m2["shards"].items()
    }


def test_write_with_metrics_observes_in_flight(spark, sf_dir, tmp_path):
    """Observation metrics must match independently computed values —
    and they were produced by the write's own scan, not a second
    pass."""
    from pyspark.sql import functions as F

    from etl_geonames_spark.operators.pipeline_ops import write_with_metrics
    from etl_geonames_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    got = write_with_metrics(docs, str(tmp_path / "out"), "doc_id")
    assert got["n_rows"] == docs.count()
    assert got["null_keys"] == 0
    lo, hi = docs.agg(
        F.min("doc_id"), F.max("doc_id")
    ).collect()[0]
    assert (got["key_min"], got["key_max"]) == (lo, hi)
    assert spark.read.parquet(str(tmp_path / "out")).count() == got["n_rows"]

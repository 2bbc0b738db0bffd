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

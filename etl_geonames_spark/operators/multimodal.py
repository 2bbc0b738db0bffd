"""Multimodal column plumbing (BASELINE north star: image/audio/video
as opaque binary columns with typed metadata).

The Spark-side machinery is real and tested: binary columns, typed
metadata structs, Arrow-batched ``mapInPandas`` decode with an explicit
output schema, partition-friendly batch shapes. The *codec* itself is
STUBBED — the container ships no image/audio libraries — behind
:func:`decode_blob`: by default a clearly-marked deterministic fake
(metadata derived arithmetically from the byte length, so the DuckDB
oracle can verify the plumbing end-to-end); a real decoder drops in by
replacing that one function.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_geonames_spark.registry import query
from etl_geonames_spark.sources import load_table

REAL_DECODE = False  # flip (or monkeypatch decode_blob) when codecs exist


def decode_blob(blob: bytes) -> dict:
    """STUB decode: deterministic fake metadata from the byte length.

    A real implementation would e.g. ``PIL.Image.open(io.BytesIO(blob))``
    and return true dimensions. The fake keeps the full Spark plumbing
    (binary transfer, Arrow batching, schema contract) testable in
    this container.
    """
    if REAL_DECODE:
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg — not in this container"
        )
    n = len(blob)
    return {
        "width": n * 7 % 640 + 1,
        "height": n * 13 % 480 + 1,
        "n_frames": n % 30 + 1,
    }


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow batch in → decoded metadata batch out.

    Batch-at-a-time (not row-at-a-time) is the scale contract: one
    Python round-trip per ~10k rows, columnar transfer both ways.
    """
    for pdf in batches:
        meta = [decode_blob(b) for b in pdf["blob"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": [len(b) for b in pdf["blob"]],
                "width": [m["width"] for m in meta],
                "height": [m["height"] for m in meta],
                "n_frames": [m["n_frames"] for m in meta],
            }
        )


def with_blob_column(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary payload column + typed metadata struct.

    Stands in for reading real media bytes (at scale: Parquet binary
    columns or spark.read.format('binaryFile'))."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("blob"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.col("lang").alias("lang"),
        ).alias("media_meta"),
    )


@query(
    "mm_decode_stub",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_bytes,
           CAST(length(text) * 7 % 640 + 1 AS INT) AS width,
           CAST(length(text) * 13 % 480 + 1 AS INT) AS height,
           CAST(length(text) % 30 + 1 AS INT) AS n_frames
    FROM documents
    """,
)
def mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode via mapInPandas (STUB codec, real plumbing).

    The oracle mirrors the fake decoder's arithmetic on the byte
    length (ASCII text ⇒ bytes == chars), proving the binary payload
    survived the Arrow round-trip intact."""
    blobs = with_blob_column(load_table(spark, sf_dir, "documents"))
    return blobs.select("doc_id", "blob").mapInPandas(
        _decode_batches,
        schema="doc_id long, n_bytes long, width int, height int, n_frames int",
    )


@query("mm_frame_sample")  # rows-only: explode count derived from stub decode
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling plumbing: decode → explode one row per sampled
    frame (every 10th), the video-preprocessing shape. Frame indices
    are deterministic; the decode is the stub."""
    decoded = mm_decode_stub(spark, sf_dir)
    return decoded.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(10))).alias(
            "frame_idx"
        ),
    )

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


def _resize_box(width: int, height: int, box: int = 128) -> tuple[int, int]:
    """Aspect-preserving fit into a box×box target (integer floor,
    min 1px) — the arithmetic a real thumbnailer would do; pure
    integer math so the DuckDB oracle can mirror it exactly."""
    scale_num = box
    scale_den = max(width, height)
    return (
        max(1, width * scale_num // scale_den),
        max(1, height * scale_num // scale_den),
    )


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker for the resize stage: decode (stub) → compute
    target geometry → emit a fake thumbnail payload (truncated source
    bytes — a real codec would emit re-encoded pixels)."""
    for pdf in batches:
        rows = []
        for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
            meta = decode_blob(blob)
            rw, rh = _resize_box(meta["width"], meta["height"])
            rows.append(
                (doc_id, meta["width"], meta["height"], rw, rh,
                 bytes(blob)[: rw * rh % 64 + 1])
            )
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "width", "height",
                     "resized_w", "resized_h", "thumb"],
        )


@query(
    "mm_resize_stub",
    oracle="""
    SELECT doc_id, width, height,
           CAST(GREATEST(1, width * 128 // GREATEST(width, height)) AS INT)
             AS resized_w,
           CAST(GREATEST(1, height * 128 // GREATEST(width, height)) AS INT)
             AS resized_h,
           CAST(LEAST(n_bytes,
                GREATEST(1, width * 128 // GREATEST(width, height))
                * GREATEST(1, height * 128 // GREATEST(width, height))
                % 64 + 1) AS BIGINT) AS thumb_bytes
    FROM (SELECT doc_id,
                 CAST(length(text) AS BIGINT) AS n_bytes,
                 CAST(length(text) * 7 % 640 + 1 AS INT) AS width,
                 CAST(length(text) * 13 % 480 + 1 AS INT) AS height
          FROM documents)
    """,
)
def mm_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize plumbing via mapInPandas (STUB codec): binary in,
    aspect-preserving target geometry + thumbnail payload out. The
    oracle mirrors the integer geometry math and checks the emitted
    payload length — proving the binary column made the round trip
    through the Python worker with the right batch shape."""
    blobs = with_blob_column(load_table(spark, sf_dir, "documents"))
    resized = blobs.select("doc_id", "blob").mapInPandas(
        _resize_batches,
        schema=(
            "doc_id long, width int, height int, "
            "resized_w int, resized_h int, thumb binary"
        ),
    )
    return resized.select(
        "doc_id", "width", "height", "resized_w", "resized_h",
        F.length("thumb").cast("bigint").alias("thumb_bytes"),
    )


_FEAT_DIM = 8


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker for feature extraction: blob → fixed-dim
    float vector (STUB: integer arithmetic on the byte length — a real
    model would run an image/audio encoder here). Exact rationals of
    small integers, so Spark and DuckDB produce bit-identical doubles."""
    for pdf in batches:
        feats = [
            [((len(b) * (i + 1)) % 97) / 97.0 for i in range(_FEAT_DIM)]
            for b in pdf["blob"]
        ]
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})


@query(
    "mm_feature_extract_stub",
    oracle="""
    SELECT doc_id,
           [CAST((length(text) * 1) % 97 AS DOUBLE) / 97.0,
            CAST((length(text) * 2) % 97 AS DOUBLE) / 97.0,
            CAST((length(text) * 3) % 97 AS DOUBLE) / 97.0,
            CAST((length(text) * 4) % 97 AS DOUBLE) / 97.0,
            CAST((length(text) * 5) % 97 AS DOUBLE) / 97.0,
            CAST((length(text) * 6) % 97 AS DOUBLE) / 97.0,
            CAST((length(text) * 7) % 97 AS DOUBLE) / 97.0,
            CAST((length(text) * 8) % 97 AS DOUBLE) / 97.0] AS features
    FROM documents
    """,
)
def mm_feature_extract_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction plumbing (STUB encoder, real Arrow path):
    binary column → fixed-dim array<double> via mapInPandas — the
    embed-the-corpus shape. Output schema matches the embeddings
    table's layout so downstream ANN ops (llm_ann_ivf / llm_sim_topk)
    compose directly."""
    blobs = with_blob_column(load_table(spark, sf_dir, "documents"))
    return blobs.select("doc_id", "blob").mapInPandas(
        _feature_batches,
        schema="doc_id long, features array<double>",
    )

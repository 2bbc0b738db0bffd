"""Multimodal column plumbing (BASELINE north star: image/audio/video
as opaque binary columns with typed metadata).

The Spark-side machinery is real and tested: binary columns, typed
metadata structs, Arrow-batched ``mapInPandas`` decode with an explicit
output schema, partition-friendly batch shapes. Codecs come in two
tiers:

- REAL (operators/codecs.py): pure-stdlib BMP (24bpp) and PPM (P6)
  encode/decode/resize over actual pixel bytes — the
  ``mm_decode_image`` / ``mm_resize_image`` queries run a full
  encode → binary column → Arrow batch → decode → pixel-stat pipeline
  whose DuckDB oracle recomputes the same pixel arithmetic, so a
  wrong stride/padding/channel-order anywhere breaks the hash.
- External-file ingestion (:func:`_image_meta_batches`): the
  ``binaryFile`` source → Arrow batch → real BMP decode pipeline
  pinned by tests/test_ingest_pruning.py. Formats the container
  cannot decode (JPEG/PNG — no PIL/ffmpeg here) surface as NULL
  dimensions; a PIL-style decoder drops in by replacing the one
  decode call. (The round-2 synthetic ``decode_blob`` stub this
  replaced is retired — every decode path now runs the real codecs.)

Arrow binary transport (a payload surviving worker → JVM → worker
byte-for-byte) is pinned by ``mm_feature_extract``'s two-stage
encode/decode split; the other real-codec queries synthesize the blob
inside their single worker stage.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_geonames_spark.operators.codecs import (
    decode_image,
    decode_video,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_video,
    encode_wav_pcm16,
    resize_nearest,
)
from etl_geonames_spark.functions import sql_qround
from etl_geonames_spark.registry import query
from etl_geonames_spark.sources import load_table

def _image_meta_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow batch of opaque image blobs in →
    real-codec metadata batch out (codecs.decode_image parses the BMP
    header and pixel rows; undecodable blobs emit NULL dimensions).

    Batch-at-a-time (not row-at-a-time) is the scale contract: one
    Python round-trip per ~10k rows, columnar transfer both ways. A
    JPEG/PNG decoder drops in by swapping decode_image for
    PIL.Image.open — the binaryFile-source ingestion path around it
    (tests/test_ingest_pruning.py) is format-agnostic.
    """
    for pdf in batches:
        meta = [decode_image(bytes(b)) for b in pdf["blob"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": [len(b) for b in pdf["blob"]],
                "width": [m[0] if m else None for m in meta],
                "height": [m[1] if m else None for m in meta],
            }
        )


def _decode_meta_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: real VID0 demux + first-frame BMP decode
    per document, emitting container-level metadata."""
    from etl_geonames_spark.operators.codecs import decode_image, decode_video

    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            blob = _video_frame_blobs(doc_id)
            frames = decode_video(blob)
            w, h, _ = decode_image(frames[0])
            rows.append((doc_id, len(blob), w, h, len(frames)))
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "n_bytes", "width", "height", "n_frames"],
        )


@query(
    "mm_decode_meta",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             doc_id % 4 + 2 AS w,
             2 AS h,
             doc_id % 3 + 1 AS nf
      FROM documents
    )
    SELECT doc_id,
           CAST(8 + nf * (4 + 54 + h * (((3 * w + 3) // 4) * 4))
                AS BIGINT) AS n_bytes,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           CAST(nf AS INT) AS n_frames
    FROM dims
    """,
)
def mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media-metadata decode (replaces the retired
    ``mm_decode_stub``, whose values were synthetic byte-length
    arithmetic): per document the deterministic VID0 container is
    demuxed and its first BMP frame header-decoded, emitting container
    size, frame geometry, and frame count — the probe-before-decode
    step every video pipeline runs (ffprobe's job). The oracle
    recomputes n_bytes from the CONTAINER LAYOUT (8-byte VID0 header +
    per-frame u32 length prefix + 54-byte BMP headers + 4-byte-padded
    BGR rows), so a framing or row-padding bug in either the encoder
    or the demuxer breaks the value hash — the metadata is evidence of
    a real parse, not a restatement of the generation rule.

    Map-only Arrow batches; bytes never shuffle. At 100 TB the blob
    column arrives via binaryFile/Parquet binary and this exact
    worker shape streams it batch-at-a-time."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(
        _decode_meta_batches,
        schema="doc_id long, n_bytes long, width int, height int, n_frames int",
    )


def _long_video_blob(doc_id: int) -> bytes:
    """A longer deterministic VID0 container (1-30 tiny 2×2 BMP
    frames) so stride sampling has something to stride over — the
    3-frame ``_video_frame_blobs`` clips would make every 10th-frame
    sample degenerate to frame 0."""
    from etl_geonames_spark.operators.codecs import encode_bmp, encode_video

    frames = []
    for f in range(doc_id % 30 + 1):
        rgb = bytes(
            (x * 3 + y * 5 + doc_id + f * 7 + c * 11) % 256
            for y in range(2)
            for x in range(2)
            for c in range(3)
        )
        frames.append(encode_bmp(2, 2, rgb))
    return encode_video(frames)


def _frame_sample_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    from etl_geonames_spark.operators.codecs import decode_video

    for pdf in batches:
        ids, idxs = [], []
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            n = len(decode_video(_long_video_blob(doc_id)))
            for i in range(0, n, 10):
                ids.append(doc_id)
                idxs.append(i)
        yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs})


@query(
    "mm_frame_sample",
    oracle="""
    WITH m AS (SELECT doc_id, CAST(doc_id % 30 + 1 AS INT) AS n_frames
               FROM documents)
    SELECT doc_id,
           CAST(unnest(generate_series(0, n_frames - 1, 10)) AS INT)
             AS frame_idx
    FROM m
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over a REAL container decode: demux the VID0
    clip, count its frames, emit one row per sampled frame (every
    10th) — the video-preprocessing fan-out shape (sampled frames
    then feed per-frame encoders). The frame count comes from the
    demuxer, not arithmetic; the oracle replays the deterministic
    generation rule (doc_id%30+1 frames), so a demux miscount breaks
    row counts and values both."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(
        _frame_sample_batches, schema="doc_id long, frame_idx int"
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


# ---------------------------------------------------------------------------
# REAL codec queries: synth pixels → encode → binary column → decode →
# pixel stats, with the oracle replaying the pixel arithmetic in SQL.
# Image geometry and content derive deterministically from doc_id:
#   w = doc_id % 8 + 2, h = doc_id % 6 + 2
#   channel value at (x, y, c) = (x*3 + y*5 + doc_id + c*11) % 256
# Even doc_ids encode as BMP (bottom-up BGR, padded rows), odd as PPM
# (top-down raw) — decode dispatches on the magic, so both codecs are
# exercised in every run and any stride/padding/channel-order bug
# lands as a hash mismatch, not a silent wrong thumbnail.
# ---------------------------------------------------------------------------


def _synth_rgb(doc_id: int, w: int, h: int) -> bytes:
    return bytes(
        (x * 3 + y * 5 + doc_id + c * 11) % 256
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )


def _image_blob_rows(pdf: pd.DataFrame) -> list[tuple[int, bytes]]:
    out = []
    for doc_id in pdf["doc_id"]:
        doc_id = int(doc_id)
        w, h = doc_id % 8 + 2, doc_id % 6 + 2
        rgb = _synth_rgb(doc_id, w, h)
        blob = (
            encode_bmp(w, h, rgb) if doc_id % 2 == 0 else encode_ppm(w, h, rgb)
        )
        out.append((doc_id, blob))
    return out


def _decode_image_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id, blob in _image_blob_rows(pdf):
            decoded = decode_image(blob)
            assert decoded is not None, f"magic sniff failed for doc {doc_id}"
            w, h, rgb = decoded
            rows.append((doc_id, w, h, sum(rgb)))
        yield pd.DataFrame(
            rows, columns=["doc_id", "width", "height", "pix_sum"]
        )


_PIX_RULE_SQL = """
      SELECT d.doc_id, d.w, d.h,
             SUM((gx.x * 3 + gy.y * 5 + d.doc_id + gc.c * 11) % 256)
               AS pix_sum
      FROM dims d,
           LATERAL unnest(generate_series(0, d.w - 1)) AS gx(x),
           LATERAL unnest(generate_series(0, d.h - 1)) AS gy(y),
           LATERAL unnest(generate_series(0, 2)) AS gc(c)
      GROUP BY d.doc_id, d.w, d.h
"""


@query(
    "mm_decode_image",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id, doc_id % 8 + 2 AS w, doc_id % 6 + 2 AS h
      FROM documents
    ),
    px AS ({_PIX_RULE_SQL})
    SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(pix_sum AS BIGINT) AS pix_sum
    FROM px
    """,
)
def mm_decode_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode: per document a deterministic bitmap is
    rendered, encoded (BMP for even ids / PPM for odd), shipped as a
    binary column through an Arrow batch, decoded by the pure-stdlib
    codec, and reduced to (width, height, sum of all channel bytes).
    The oracle recomputes the pixel sum from the generation rule — a
    byte-order, row-padding, or bottom-up bug in either codec breaks
    the value hash."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(
        _decode_image_batches,
        schema="doc_id long, width int, height int, pix_sum long",
    )


_RESIZE_BOX = 4


def _resize_image_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id, blob in _image_blob_rows(pdf):
            w, h, rgb = decode_image(blob)
            rw, rh = _resize_box(w, h, box=_RESIZE_BOX)
            small = resize_nearest(rgb, w, h, rw, rh)
            rows.append((doc_id, w, h, rw, rh, sum(small)))
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "width", "height",
                "resized_w", "resized_h", "resized_sum",
            ],
        )


@query(
    "mm_resize_image",
    oracle="""
    WITH dims AS (
      SELECT doc_id, doc_id % 8 + 2 AS w, doc_id % 6 + 2 AS h
      FROM documents
    ),
    geo AS (
      SELECT doc_id, w, h,
             GREATEST(1, w * 4 // GREATEST(w, h)) AS rw,
             GREATEST(1, h * 4 // GREATEST(w, h)) AS rh
      FROM dims
    ),
    px AS (
      SELECT g.doc_id, g.w, g.h, g.rw, g.rh,
             SUM(((gx.x * g.w // g.rw) * 3 + (gy.y * g.h // g.rh) * 5
                  + g.doc_id + gc.c * 11) % 256) AS resized_sum
      FROM geo g,
           LATERAL unnest(generate_series(0, g.rw - 1)) AS gx(x),
           LATERAL unnest(generate_series(0, g.rh - 1)) AS gy(y),
           LATERAL unnest(generate_series(0, 2)) AS gc(c)
      GROUP BY g.doc_id, g.w, g.h, g.rw, g.rh
    )
    SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(rw AS INT) AS resized_w, CAST(rh AS INT) AS resized_h,
           CAST(resized_sum AS BIGINT) AS resized_sum
    FROM px
    """,
)
def mm_resize_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL thumbnail pipeline: encode → decode → nearest-neighbor
    resize into a 4×4 box (aspect-preserving integer geometry) → sum
    of resized channel bytes. The oracle replays the exact
    source-index arithmetic (x*w//rw, y*h//rh) on the generation
    rule, pinning the resampler's index math byte-for-byte."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(
        _resize_image_batches,
        schema=(
            "doc_id long, width int, height int, "
            "resized_w int, resized_h int, resized_sum long"
        ),
    )


def _audio_samples(doc_id: int, n: int) -> list[int]:
    return [((doc_id * 31 + i * 97) % 65536) - 32768 for i in range(n)]


def _decode_audio_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            rate = 8000 + (doc_id % 3) * 4000
            n = doc_id % 50 + 10
            blob = encode_wav_pcm16(rate, _audio_samples(doc_id, n))
            got_rate, channels, samples = decode_wav(blob)
            rows.append(
                (
                    doc_id,
                    got_rate,
                    channels,
                    len(samples),
                    sum(abs(s) for s in samples),
                    max(abs(s) for s in samples),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "sample_rate", "channels",
                "n_samples", "sum_abs", "peak",
            ],
        )


@query(
    "mm_decode_audio",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             8000 + (doc_id % 3) * 4000 AS rate,
             doc_id % 50 + 10 AS n
      FROM documents
    ),
    px AS (
      SELECT d.doc_id, d.rate, d.n,
             SUM(ABS((d.doc_id * 31 + gi.i * 97) % 65536 - 32768))
               AS sum_abs,
             MAX(ABS((d.doc_id * 31 + gi.i * 97) % 65536 - 32768)) AS peak
      FROM dims d,
           LATERAL unnest(generate_series(0, d.n - 1)) AS gi(i)
      GROUP BY d.doc_id, d.rate, d.n
    )
    SELECT doc_id, CAST(rate AS INT) AS sample_rate,
           CAST(1 AS INT) AS channels, CAST(n AS INT) AS n_samples,
           CAST(sum_abs AS BIGINT) AS sum_abs, CAST(peak AS INT) AS peak
    FROM px
    """,
)
def mm_decode_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode: per document a deterministic PCM16 waveform
    is synthesized, encoded as RIFF/WAVE by the pure-stdlib codec,
    shipped through an Arrow batch as a binary column, chunk-walked
    back out, and reduced to loudness stats (sum|s|, peak). The
    oracle replays the sample arithmetic — a header-size, chunk
    offset, or endianness bug breaks the value hash."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(
        _decode_audio_batches,
        schema=(
            "doc_id long, sample_rate int, channels int, "
            "n_samples int, sum_abs long, peak int"
        ),
    )


def _video_frame_blobs(doc_id: int) -> bytes:
    w, h = doc_id % 4 + 2, 2
    frames = []
    for f in range(doc_id % 3 + 1):
        rgb = bytes(
            (x * 3 + y * 5 + doc_id + f * 7 + c * 11) % 256
            for y in range(h)
            for x in range(w)
            for c in range(3)
        )
        frames.append(encode_bmp(w, h, rgb))
    return encode_video(frames)


def _video_frame_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            for idx, payload in enumerate(decode_video(_video_frame_blobs(doc_id))):
                w, h, rgb = decode_image(payload)
                rows.append((doc_id, idx, w, h, sum(rgb)))
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "frame_idx", "width", "height", "pix_sum"],
        )


@query(
    "mm_video_frames",
    oracle="""
    WITH dims AS (
      SELECT doc_id, doc_id % 4 + 2 AS w, 2 AS h, doc_id % 3 + 1 AS nf
      FROM documents
    ),
    px AS (
      SELECT d.doc_id, gf.f AS frame_idx, d.w, d.h,
             SUM((gx.x * 3 + gy.y * 5 + d.doc_id + gf.f * 7 + gc.c * 11)
                 % 256) AS pix_sum
      FROM dims d,
           LATERAL unnest(generate_series(0, d.nf - 1)) AS gf(f),
           LATERAL unnest(generate_series(0, d.w - 1)) AS gx(x),
           LATERAL unnest(generate_series(0, d.h - 1)) AS gy(y),
           LATERAL unnest(generate_series(0, 2)) AS gc(c)
      GROUP BY d.doc_id, gf.f, d.w, d.h
    )
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(pix_sum AS BIGINT) AS pix_sum
    FROM px
    """,
)
def mm_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL frame extraction: per document a multi-frame container
    (length-prefixed BMP frames) is built, demuxed, and every frame
    decoded to pixel stats — one output row per frame, the
    video-preprocessing fan-out shape (contrast mm_frame_sample,
    which explodes stub metadata). The oracle replays the per-frame
    pixel rule; a demux offset or frame-order bug breaks the hash."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(
        _video_frame_batches,
        schema=(
            "doc_id long, frame_idx int, width int, height int, "
            "pix_sum long"
        ),
    )


def _encode_image_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Stage-1 worker for mm_feature_extract: render + ENCODE only,
    emitting the blob as a real binary column so the encoded bytes
    cross an Arrow boundary before stage 2 decodes them (the Arrow
    binary-transport property the retired mm_feature_extract_stub
    used to pin)."""
    for pdf in batches:
        rows = _image_blob_rows(pdf)
        yield pd.DataFrame(rows, columns=["doc_id", "blob"])


def _image_feature_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Stage-2 worker: decode the binary column from stage 1 and emit
    an 8-dim feature vector from the ACTUAL pixels: per-channel sums,
    2×2 quadrant luminance sums, horizontal gradient L1 on channel 0.
    All integers, so the doubles are exact."""
    for pdf in batches:
        rows = []
        for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
            w, h, rgb = decode_image(bytes(blob))
            s = [0, 0, 0]
            q = [[0, 0], [0, 0]]
            grad = 0
            for y in range(h):
                for x in range(w):
                    base = (y * w + x) * 3
                    lum = 0
                    for c in range(3):
                        v = rgb[base + c]
                        s[c] += v
                        lum += v
                    q[1 if x >= w // 2 else 0][1 if y >= h // 2 else 0] += lum
                    if x + 1 < w:
                        grad += abs(rgb[base + 3] - rgb[base])
            feats = [
                float(v)
                for v in (s[0], s[1], s[2],
                          q[0][0], q[1][0], q[0][1], q[1][1], grad)
            ]
            rows.append((int(doc_id), feats))
        yield pd.DataFrame(rows, columns=["doc_id", "features"])


@query(
    "mm_feature_extract",
    oracle="""
    WITH dims AS (
      SELECT doc_id, doc_id % 8 + 2 AS w, doc_id % 6 + 2 AS h
      FROM documents
    ),
    vals AS (
      SELECT d.doc_id, d.w, d.h, gx.x, gy.y, gc.c,
             (gx.x * 3 + gy.y * 5 + d.doc_id + gc.c * 11) % 256 AS v
      FROM dims d,
           LATERAL unnest(generate_series(0, d.w - 1)) AS gx(x),
           LATERAL unnest(generate_series(0, d.h - 1)) AS gy(y),
           LATERAL unnest(generate_series(0, 2)) AS gc(c)
    ),
    px AS (
      SELECT doc_id,
             SUM(CASE WHEN c = 0 THEN v ELSE 0 END) AS s0,
             SUM(CASE WHEN c = 1 THEN v ELSE 0 END) AS s1,
             SUM(CASE WHEN c = 2 THEN v ELSE 0 END) AS s2,
             SUM(CASE WHEN x < w // 2 AND y < h // 2 THEN v ELSE 0 END)
               AS q00,
             SUM(CASE WHEN x >= w // 2 AND y < h // 2 THEN v ELSE 0 END)
               AS q10,
             SUM(CASE WHEN x < w // 2 AND y >= h // 2 THEN v ELSE 0 END)
               AS q01,
             SUM(CASE WHEN x >= w // 2 AND y >= h // 2 THEN v ELSE 0 END)
               AS q11
      FROM vals GROUP BY doc_id
    ),
    gr AS (
      SELECT d.doc_id,
             SUM(ABS(((gx.x + 1) * 3 + gy.y * 5 + d.doc_id) % 256
                     - (gx.x * 3 + gy.y * 5 + d.doc_id) % 256)) AS g
      FROM dims d,
           LATERAL unnest(generate_series(0, d.w - 2)) AS gx(x),
           LATERAL unnest(generate_series(0, d.h - 1)) AS gy(y)
      GROUP BY d.doc_id
    )
    SELECT p.doc_id,
           array_to_string(
             [CAST(p.s0 AS BIGINT), CAST(p.s1 AS BIGINT),
              CAST(p.s2 AS BIGINT), CAST(p.q00 AS BIGINT),
              CAST(p.q10 AS BIGINT), CAST(p.q01 AS BIGINT),
              CAST(p.q11 AS BIGINT), CAST(gr.g AS BIGINT)],
             ',') AS features
    FROM px p JOIN gr ON p.doc_id = gr.doc_id
    """,
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image feature extraction (replaces the retired
    ``mm_feature_extract_stub``, whose vector was byte-length
    arithmetic): per document the deterministic bitmap is rendered and
    ENCODED in one Python stage, shipped as a genuine binary column
    across an Arrow boundary, then DECODED in a second stage that
    computes an 8-dim descriptor from the actual pixel bytes —
    per-channel sums (global color), 2×2 quadrant luminance sums
    (coarse layout), and channel-0 horizontal gradient L1 (edge
    energy). That is the classical color/layout/edge feature split a
    pre-neural indexer extracts, in the embed-the-corpus shape: the
    intermediate schema is ``doc_id, features array<double>`` exactly
    like the embeddings table, so ANN ops (llm_ann_ivf / llm_sim_topk)
    compose directly on the output.

    The two-stage mapInPandas deliberately routes the encoded blob
    through Arrow binary transport (ADVICE r4: that property lost its
    only remaining witness when the stub retired) — a corrupted byte
    anywhere in encode → Arrow → decode breaks the value hash, because
    the oracle recomputes every sum from the generation rule, not from
    the codec. All features are exact integers serialized as a
    comma-joined string for the driver hash (floats stay exact: sums
    of <2^20 byte values). Map-only, zero shuffles; at 100 TB the
    stage-1 encoder is replaced by reading real media bytes and the
    stage-2 worker shape is unchanged."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    blobs = docs.mapInPandas(
        _encode_image_batches, schema="doc_id long, blob binary"
    )
    feats = blobs.mapInPandas(
        _image_feature_batches,
        schema="doc_id long, features array<double>",
    )
    return feats.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.col("features"),
                lambda x: x.cast("bigint").cast("string"),
            ),
            ",",
        ).alias("features"),
    )


def _feature_wave(doc_id: int, n: int) -> list[int]:
    """Fast-striding synthetic waveform for the feature op: stride
    9973 wraps the 16-bit range every ~6.6 samples, so sign changes
    actually occur (the decode op's slow ramp never crosses zero
    inside its ≤59-sample clips — a ZCR over it would be vacuously
    zero and verify nothing)."""
    return [((doc_id * 31 + i * 9973) % 65536) - 32768 for i in range(n)]


def _audio_feature_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    import math

    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            n = doc_id % 50 + 10
            blob = encode_wav_pcm16(16000, _feature_wave(doc_id, n))
            _, _, s = decode_wav(blob)
            rms = math.sqrt(sum(float(v) * float(v) for v in s) / len(s))
            zc = sum(
                1
                for a, b in zip(s, s[1:])
                if (a >= 0) != (b >= 0)
            )
            rows.append((doc_id, len(s), rms, zc))
        yield pd.DataFrame(
            rows, columns=["doc_id", "n_samples", "rms", "n_zero_cross"]
        )


@query(
    "mm_audio_features",
    oracle="""
    WITH dims AS (
      SELECT doc_id, doc_id % 50 + 10 AS n FROM documents
    ),
    s AS (
      SELECT d.doc_id, d.n, gi.i,
             CAST((d.doc_id * 31 + gi.i * 9973) % 65536 - 32768 AS DOUBLE)
               AS v
      FROM dims d, LATERAL unnest(generate_series(0, d.n - 1)) AS gi(i)
    ),
    l AS (
      SELECT doc_id, n, v,
             LAG(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
      FROM s
    )
    SELECT doc_id, CAST(n AS INT) AS n_samples,
           FLOOR(SQRT(AVG(v * v)) * 10000.0 + 0.5) / 10000.0 AS rms,
           CAST(COUNT(*) FILTER (
               WHERE pv IS NOT NULL AND ((v >= 0) <> (pv >= 0))
           ) AS BIGINT) AS n_zero_cross
    FROM l GROUP BY doc_id, n
    """,
)
def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio feature extraction: RMS loudness + zero-crossing
    count per clip — the two features every speech/music curation
    pipeline computes first (silence gating on RMS, voiced/unvoiced
    and noisiness screens on ZCR). The waveform goes through the full
    RIFF/WAVE encode → binary column → Arrow batch → chunk-walk
    decode roundtrip, so a codec regression (offset, endianness,
    chunk-size) breaks the value hash, not just a synthetic shortcut.

    The oracle replays the PCM arithmetic sample-for-sample in SQL
    (LATERAL series + LAG for the sign-change pairing); RMS is
    qround'd at 1e-4 — ≤ 59-term sums leave ulp drift far below it.

    100 TB shape: map-only Arrow-batched mapInPandas over the blob
    column, one row out per clip — embarrassingly parallel, zero
    shuffles; clips >> RAM stream through chunked frame reads in the
    codec, and the feature table is a tiny fraction of blob bytes."""
    from etl_geonames_spark.functions import qround

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    feats = docs.mapInPandas(
        _audio_feature_batches,
        schema="doc_id long, n_samples int, rms double, n_zero_cross long",
    )
    return feats.select(
        "doc_id", "n_samples", qround(F.col("rms"), 4).alias("rms"),
        "n_zero_cross",
    )


def _phash36(w: int, h: int, rgb: bytes, doc_id: int) -> int:
    """6×6 average-hash from DECODED pixel bytes, all-integer: bit
    (i,j) set iff 36·(r+g+b at the sampled pixel) > Σ over the 36
    samples — the float-free form of 'gray above mean', so Python,
    Spark, and the SQL oracle can never disagree by a ulp at the
    threshold (a linear gradient image puts samples EXACTLY at the
    mean, where float AVG order would decide bits arbitrarily)."""
    g3 = []
    for j in range(6):
        y = (j * h) // 6
        for i in range(6):
            x = (i * w) // 6
            base = (y * w + x) * 3
            g3.append(rgb[base] + rgb[base + 1] + rgb[base + 2])
    total = sum(g3)
    bits = 0
    for k, v in enumerate(g3):
        if 36 * v > total:
            bits |= 1 << k
    return bits


def _phash_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id, blob in _image_blob_rows(pdf):
            decoded = decode_image(blob)
            assert decoded is not None
            w, h, rgb = decoded
            rows.append((doc_id, w, h, _phash36(w, h, rgb, doc_id)))
        yield pd.DataFrame(
            rows, columns=["doc_id", "width", "height", "phash"]
        )


@query(
    "mm_image_phash_dedup",
    oracle="""
    WITH dims AS (
      SELECT doc_id, doc_id % 8 + 2 AS w, doc_id % 6 + 2 AS h
      FROM documents
    ),
    samples AS (
      SELECT d.doc_id, d.w, d.h, gi.i, gj.j,
             (CAST(gi.i * d.w AS BIGINT) // 6) * 3
             + (CAST(gj.j * d.h AS BIGINT) // 6) * 5 + d.doc_id AS a
      FROM dims d,
           LATERAL unnest(generate_series(0, 5)) AS gi(i),
           LATERAL unnest(generate_series(0, 5)) AS gj(j)
    ),
    grays AS (
      SELECT doc_id, w, h, i, j,
             a % 256 + (a + 11) % 256 + (a + 22) % 256 AS g3
      FROM samples
    ),
    withtot AS (
      SELECT *, SUM(g3) OVER (PARTITION BY doc_id) AS t3 FROM grays
    ),
    hashes AS (
      SELECT doc_id, w, h,
             CAST(SUM(CASE WHEN 36 * g3 > t3
                           THEN CAST(1 AS BIGINT) << (j * 6 + i)
                           ELSE 0 END) AS BIGINT) AS phash
      FROM withtot GROUP BY doc_id, w, h
    )
    SELECT phash, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(COUNT(*) AS BIGINT) AS n_images,
           array_to_string(list_sort(list(doc_id)), ',') AS doc_ids
    FROM hashes GROUP BY phash, w, h HAVING COUNT(*) >= 2
    """,
)
def mm_image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup: every image is decoded (real BMP/
    PPM codec roundtrip, same path as mm_decode_image), reduced to a
    36-bit average-hash over a 6×6 nearest-neighbor resample of
    integer gray values, and images sharing (phash, dims) group into
    near-duplicate clusters — the image-corpus analog of
    llm_dedup_exact's hash-groupBy, and step one of multimodal
    curation (identical-after-reencode detection without byte
    equality). 36 bits keeps the hash inside BIGINT; production would
    widen to 64-bit pHash with DCT, same plan.

    The threshold test is ALL-INTEGER (36·g3 > Σg3) because the
    synthetic gradients put samples exactly at the mean, where a
    float AVG would tie-break by summation-order ulps — the oracle
    replays the identical integer arithmetic from the generation
    rule, so a codec bug (padding, bottom-up rows, channel order)
    breaks the hash.

    100 TB shape: map-only Arrow decode+hash (bytes never shuffle),
    then ONE hash aggregate on the 8-byte (phash, w, h) key — the
    exact-dedup plan; Hamming-near matches would band the 36 bits
    into 6-bit keys and equi-join, the SimHash recipe."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    hashes = docs.mapInPandas(
        _phash_batches,
        schema="doc_id long, width int, height int, phash long",
    )
    return (
        hashes.groupBy("phash", "width", "height")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("doc_ids"),
        )
        .where(F.col("n_images") >= 2)
        .select("phash", "width", "height", "n_images", "doc_ids")
    )


_SCENE_CUT_THRESHOLD = 400


def _scene_cut_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            prev = None
            for idx, payload in enumerate(
                decode_video(_video_frame_blobs(doc_id))
            ):
                _, _, rgb = decode_image(payload)
                if prev is not None:
                    delta = sum(
                        abs(a - b) for a, b in zip(rgb, prev)
                    )
                    rows.append(
                        (
                            doc_id,
                            idx,
                            delta,
                            delta > _SCENE_CUT_THRESHOLD,
                        )
                    )
                prev = rgb
        yield pd.DataFrame(
            rows, columns=["doc_id", "frame_idx", "delta", "is_cut"]
        )


@query(
    "mm_video_scene_cuts",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id, doc_id % 4 + 2 AS w, 2 AS h, doc_id % 3 + 1 AS nf
      FROM documents WHERE doc_id % 3 >= 1
    ),
    d AS (
      SELECT d.doc_id, gf.f AS frame_idx,
             SUM(ABS(
                 (gx.x * 3 + gy.y * 5 + d.doc_id + gf.f * 7 + gc.c * 11)
                   % 256
               - (gx.x * 3 + gy.y * 5 + d.doc_id + (gf.f - 1) * 7
                  + gc.c * 11) % 256
             )) AS delta
      FROM dims d,
           LATERAL unnest(generate_series(1, d.nf - 1)) AS gf(f),
           LATERAL unnest(generate_series(0, d.w - 1)) AS gx(x),
           LATERAL unnest(generate_series(0, d.h - 1)) AS gy(y),
           LATERAL unnest(generate_series(0, 2)) AS gc(c)
      GROUP BY d.doc_id, gf.f
    )
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(delta AS BIGINT) AS delta,
           delta > {_SCENE_CUT_THRESHOLD} AS is_cut
    FROM d
    """,
)
def mm_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over the REAL video path: demux the VID0
    container, decode every frame (BMP codec), and score each
    consecutive-frame pair by the sum of absolute per-channel pixel
    differences — the classic pixel-delta cut detector video
    preprocessing runs before frame sampling (sample within scenes,
    not across them). All-integer, so the oracle's replay of the
    frame-generation rule must match bit-for-bit; a demux
    off-by-one (comparing frame k to k-2) or channel-order bug
    shifts every delta.

    Single-frame videos emit no pairs (no predecessor) — the
    WHERE doc_id % 3 >= 1 mirror in the oracle.

    100 TB shape: map-only Arrow decode (frame bytes never leave the
    task), one row per frame pair; the threshold is a plain codegen
    filter. Long videos stream frame-at-a-time through the chunked
    demux — state is two frames, not the clip."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(
        _scene_cut_batches,
        schema="doc_id long, frame_idx int, delta long, is_cut boolean",
    )


_VAD_FRAME = 16
_VAD_ENERGY_T = 5_700_000_000


def _vad_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            n = doc_id % 200 + 64
            blob = encode_wav_pcm16(16000, _feature_wave(doc_id, n))
            _, _, s = decode_wav(blob)
            n_frames = len(s) // _VAD_FRAME
            start = None
            for f in range(n_frames + 1):
                active = False
                if f < n_frames:
                    fr = s[f * _VAD_FRAME : (f + 1) * _VAD_FRAME]
                    active = sum(v * v for v in fr) > _VAD_ENERGY_T
                if active and start is None:
                    start = f
                elif not active and start is not None:
                    rows.append((doc_id, start, f - 1, f - start))
                    start = None
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "start_frame", "end_frame", "n_frames"],
        )


@query(
    "mm_audio_vad",
    oracle=f"""
    WITH dims AS (SELECT doc_id, doc_id % 200 + 64 AS n FROM documents),
    s AS (
      SELECT d.doc_id, gi.i // {_VAD_FRAME} AS f,
             CAST((d.doc_id * 31 + gi.i * 9973) % 65536 - 32768 AS BIGINT)
               AS v
      FROM dims d,
           LATERAL unnest(generate_series(
               0, (d.n // {_VAD_FRAME}) * {_VAD_FRAME} - 1)) AS gi(i)
    ),
    e AS (
      SELECT doc_id, f, SUM(v * v) AS energy FROM s GROUP BY doc_id, f
    ),
    act AS (
      SELECT doc_id, f,
             f - ROW_NUMBER() OVER (
                 PARTITION BY doc_id ORDER BY f
             ) AS grp
      FROM e WHERE energy > {_VAD_ENERGY_T}
    )
    SELECT doc_id, CAST(MIN(f) AS INT) AS start_frame,
           CAST(MAX(f) AS INT) AS end_frame,
           CAST(COUNT(*) AS INT) AS n_frames
    FROM act GROUP BY doc_id, grp
    """,
)
def mm_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy-based voice-activity segmentation over the REAL audio
    path: decode the WAV clip, frame it (16 samples), keep frames
    whose INTEGER energy Σs² clears the gate, and merge consecutive
    active frames into maximal segments — audio's gaps-and-islands
    (the ts_interval_union shape on frame indices instead of
    timestamps). This is the first stage of every speech pipeline:
    silence trimming before transcription/feature extraction.

    Integer energy (no RMS sqrt) keeps the threshold test exact on
    both engines; the oracle segments via the classic
    row_number-difference grouping, the Python side via one linear
    scan — same maximal runs by construction. Trailing partial
    frames are dropped on both sides ((n // 16) · 16 samples).

    100 TB shape: map-only decode+segment per clip (state = one open
    segment), one output row per segment — no shuffle at all; the
    oracle's window is per-doc_id, bounded by clip length."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(
        _vad_batches,
        schema=(
            "doc_id long, start_frame int, end_frame int, n_frames int"
        ),
    )


def _image_entropy_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id, blob in _image_blob_rows(pdf):
            w, h, rgb = decode_image(blob)
            arr = np.frombuffer(bytes(rgb), dtype=np.uint8)
            _vals, counts = np.unique(arr, return_counts=True)
            n = arr.size
            # per-bin term in the SAME shape as the oracle's SQL:
            # -(c/n)·ln(c/n); bins ascend (np.unique sorts), the sum's
            # residual order drift dies at the qround(6) emit grid
            p = counts.astype(np.float64) / float(n)
            ent = float(-(p * np.log(p)).sum())
            rows.append((doc_id, int(n), int(counts.size), ent))
        yield pd.DataFrame(
            rows, columns=["doc_id", "n_pix", "n_distinct", "entropy"]
        )


@query(
    "mm_image_entropy",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id, doc_id % 8 + 2 AS w, doc_id % 6 + 2 AS h
      FROM documents
    ),
    px AS (
      SELECT d.doc_id,
             (gx.x * 3 + gy.y * 5 + d.doc_id + gc.c * 11) % 256 AS v
      FROM dims d,
           LATERAL unnest(generate_series(0, d.w - 1)) AS gx(x),
           LATERAL unnest(generate_series(0, d.h - 1)) AS gy(y),
           LATERAL unnest(generate_series(0, 2)) AS gc(c)
    ),
    hist AS (
      SELECT doc_id, v, CAST(COUNT(*) AS BIGINT) AS c
      FROM px GROUP BY doc_id, v
    ),
    tot AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS nd
      FROM hist GROUP BY doc_id
    )
    SELECT h.doc_id, tot.n AS n_pix, tot.nd AS n_distinct,
           FLOOR(SUM(-(CAST(h.c AS DOUBLE) / tot.n)
                     * ln(CAST(h.c AS DOUBLE) / tot.n))
                 * 1000000.0 + 0.5) / 1000000.0 AS entropy
    FROM hist h JOIN tot USING (doc_id)
    GROUP BY h.doc_id, tot.n, tot.nd
    """,
)
def mm_image_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image channel-byte Shannon entropy from REAL decoded
    pixels — the cheap informativeness/filtering signal a multimodal
    curation pass ranks on (near-constant images ≈ 0 nats are banner
    slop; high-entropy ones carry texture). Pipeline: deterministic
    bitmap → BMP/PPM encode → binary column → Arrow batch → stdlib
    decode → 256-bin histogram → −Σ(c/n)ln(c/n), all inside one
    mapInPandas pass (the multimodal surface's sanctioned Python
    path), with the oracle replaying the pixel-generation rule and
    the identical per-bin term in SQL — a codec stride/padding bug
    shifts the histogram and lands as a hash mismatch.

    n_pix / n_distinct are exact integers; entropy is the one float
    sum (≤ 256 ascending bins numpy-side vs unordered SQL groups) →
    qround(6) on both engines. Scale shape: map-only over the blob
    partition layout, no shuffle anywhere — the histogram lives
    per-row inside the batch, never as a corpus-wide explode.
    """
    from etl_geonames_spark.functions import qround

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    out = docs.mapInPandas(
        _image_entropy_batches,
        schema="doc_id long, n_pix long, n_distinct long, entropy double",
    )
    return out.select(
        "doc_id",
        "n_pix",
        "n_distinct",
        qround(F.col("entropy"), 6).alias("entropy"),
    )


def _resample_audio_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            rate = 8000 + (doc_id % 3) * 4000
            n = doc_id % 50 + 10
            blob = encode_wav_pcm16(rate, _audio_samples(doc_id, n))
            got_rate, _, samples = decode_wav(blob)
            kept = samples[::2]  # decimate-by-2 nearest resample
            rows.append(
                (
                    doc_id,
                    got_rate,
                    got_rate // 2,
                    len(kept),
                    sum(abs(s) for s in kept),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "rate_in", "rate_out", "n_out", "sum_abs_out",
            ],
        )


@query(
    "mm_audio_resample",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             8000 + (doc_id % 3) * 4000 AS rate,
             doc_id % 50 + 10 AS n
      FROM documents
    ),
    kept AS (
      SELECT d.doc_id, d.rate, d.n, gi.i,
             ABS((d.doc_id * 31 + gi.i * 97) % 65536 - 32768) AS a
      FROM dims d,
           LATERAL unnest(generate_series(0, d.n - 1, 2)) AS gi(i)
    )
    SELECT doc_id,
           CAST(rate AS INT) AS rate_in,
           CAST(rate // 2 AS INT) AS rate_out,
           CAST(COUNT(*) AS BIGINT) AS n_out,
           CAST(SUM(a) AS BIGINT) AS sum_abs_out
    FROM kept GROUP BY doc_id, rate
    """,
)
def mm_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decimation: each clip round-trips the RIFF/WAV codec
    (same path as mm_decode_audio), then decimates by 2 (keep every
    other sample — the halve-the-rate resample; a production pipeline
    adds an anti-alias FIR first, same per-clip map shape). Emitted
    evidence is the kept-sample count and Σ|s| checksum; the oracle
    replays the generation rule on the STRIDED index grid, so an
    off-by-one in the decimation stride (or a codec header bug
    shifting the payload) breaks the value hash.

    Map-only Arrow batches — audio bytes never shuffle; at 100 TB
    this is one pipelined pass of clip → decode → decimate →
    re-encode, embarrassingly parallel over files."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(
        _resample_audio_batches,
        schema=(
            "doc_id long, rate_in int, rate_out int, "
            "n_out long, sum_abs_out long"
        ),
    )


_HIST_BIN = 192  # 4 bins over the 0..765 gray3 range


def _image_histogram_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id, blob in _image_blob_rows(pdf):
            w, h, rgb = decode_image(blob)
            bins = [0, 0, 0, 0]
            for p in range(w * h):
                g3 = rgb[3 * p] + rgb[3 * p + 1] + rgb[3 * p + 2]
                bins[g3 // _HIST_BIN] += 1
            rows.append((doc_id, w, h, *bins))
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "width", "height", "h0", "h1", "h2", "h3"],
        )


@query(
    "mm_image_histogram",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id, doc_id % 8 + 2 AS w, doc_id % 6 + 2 AS h
      FROM documents
    ),
    px AS (
      SELECT d.doc_id, d.w, d.h,
             (gx.x * 3 + gy.y * 5 + d.doc_id + 0 * 11) % 256
             + (gx.x * 3 + gy.y * 5 + d.doc_id + 1 * 11) % 256
             + (gx.x * 3 + gy.y * 5 + d.doc_id + 2 * 11) % 256 AS g3
      FROM dims d,
           LATERAL unnest(generate_series(0, d.w - 1)) AS gx(x),
           LATERAL unnest(generate_series(0, d.h - 1)) AS gy(y)
    )
    SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(SUM(CASE WHEN g3 // {_HIST_BIN} = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS h0,
           CAST(SUM(CASE WHEN g3 // {_HIST_BIN} = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS h1,
           CAST(SUM(CASE WHEN g3 // {_HIST_BIN} = 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS h2,
           CAST(SUM(CASE WHEN g3 // {_HIST_BIN} >= 3 THEN 1 ELSE 0 END)
                AS BIGINT) AS h3
    FROM px GROUP BY doc_id, w, h
    """,
)
def mm_image_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL per-image gray histogram: decode (BMP/PPM codec round-trip,
    the mm_decode_image path), reduce each pixel to its channel-sum
    gray (0..765) and count a 4-bin histogram — the brightness
    profile used for exposure filtering and as a cheap pre-feature
    for near-dup blocking (images whose histograms differ can't be
    near-dups; the phash family then handles the survivors). The
    oracle recomputes every pixel from the generation rule, so any
    codec defect (BGR swap leaves g3 invariant — but padding,
    bottom-up order, or truncation does not) breaks the bin counts.

    Map-only Arrow decode; output is 4 ints per image — the
    classic decode-heavy/emit-light shape that at 100 TB wants
    bytes-local compute with only the histogram crossing the wire."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(
        _image_histogram_batches,
        schema=(
            "doc_id long, width int, height int, "
            "h0 long, h1 long, h2 long, h3 long"
        ),
    )


def _keyframe_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            frames = decode_video(_long_video_blob(doc_id))
            prev = None
            best_idx, best_delta = 0, -1
            for idx, payload in enumerate(frames):
                _, _, rgb = decode_image(payload)
                if prev is not None:
                    delta = sum(abs(a - b) for a, b in zip(rgb, prev))
                    if delta > best_delta:
                        best_idx, best_delta = idx, delta
                prev = rgb
            if len(frames) == 1:
                best_idx, best_delta = 0, 0
            rows.append((doc_id, len(frames), best_idx, best_delta))
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "n_frames", "key_idx", "key_delta"],
        )


@query(
    "mm_video_keyframes",
    oracle="""
    WITH dims AS (
      SELECT doc_id, doc_id % 30 + 1 AS nf FROM documents
    ),
    deltas AS (
      SELECT d.doc_id, d.nf, gf.f,
             CAST(SUM(ABS(
               (gx.x * 3 + gy.y * 5 + d.doc_id + gf.f * 7 + gc.c * 11) % 256
               - (gx.x * 3 + gy.y * 5 + d.doc_id + (gf.f - 1) * 7
                  + gc.c * 11) % 256)) AS BIGINT) AS delta
      FROM dims d,
           LATERAL unnest(generate_series(1, d.nf - 1)) AS gf(f),
           LATERAL unnest(generate_series(0, 1)) AS gx(x),
           LATERAL unnest(generate_series(0, 1)) AS gy(y),
           LATERAL unnest(generate_series(0, 2)) AS gc(c)
      GROUP BY d.doc_id, d.nf, gf.f
    ),
    ranked AS (
      SELECT doc_id, nf, f, delta,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY delta DESC, f) AS rn
      FROM deltas
    )
    SELECT d.doc_id, CAST(d.nf AS INT) AS n_frames,
           CAST(COALESCE(r.f, 0) AS INT) AS key_idx,
           CAST(COALESCE(r.delta, 0) AS BIGINT) AS key_delta
    FROM dims d LEFT JOIN ranked r
      ON r.doc_id = d.doc_id AND r.rn = 1
    """,
)
def mm_video_keyframes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyframe selection over a REAL container decode: demux the
    1-30-frame VID0 clip, decode every BMP frame, score each frame by
    its Σ|Δpixel| against the previous one, and keep the argmax
    (ties → earliest frame; single-frame clips key on frame 0) — the
    pick-the-representative-frame step that feeds per-video image
    embedding when budget allows one frame per clip
    (mm_video_scene_cuts finds ALL cuts; this picks THE summary
    frame). The oracle replays the per-pixel generation rule and the
    same (delta DESC, f) tie-break, so a decode or argmax bug breaks
    the hash.

    Map-only Arrow batches, two frames of decoder state regardless of
    clip length, 4 scalars out per clip — decode-heavy, emit-light."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(
        _keyframe_batches,
        schema="doc_id long, n_frames int, key_idx int, key_delta long",
    )


def _image_gradient_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id, blob in _image_blob_rows(pdf):
            w, h, rgb = decode_image(blob)
            grad = 0
            for y in range(h):
                for x in range(w - 1):
                    p0 = y * w + x
                    g0 = rgb[3 * p0] + rgb[3 * p0 + 1] + rgb[3 * p0 + 2]
                    g1 = (
                        rgb[3 * (p0 + 1)]
                        + rgb[3 * (p0 + 1) + 1]
                        + rgb[3 * (p0 + 1) + 2]
                    )
                    grad += abs(g1 - g0)
            rows.append((doc_id, w, h, grad))
        yield pd.DataFrame(
            rows, columns=["doc_id", "width", "height", "grad_sum"]
        )


_HGRAD_GPX_SQL = """
      SELECT d.doc_id, d.w, d.h, gx.x,
             ABS(((gx.x + 1) * 3 + gy.y * 5 + d.doc_id + 0) % 256
                 + ((gx.x + 1) * 3 + gy.y * 5 + d.doc_id + 11) % 256
                 + ((gx.x + 1) * 3 + gy.y * 5 + d.doc_id + 22) % 256
                 - (gx.x * 3 + gy.y * 5 + d.doc_id + 0) % 256
                 - (gx.x * 3 + gy.y * 5 + d.doc_id + 11) % 256
                 - (gx.x * 3 + gy.y * 5 + d.doc_id + 22) % 256) AS g
      FROM dims d,
           LATERAL unnest(generate_series(0, d.w - 2)) AS gx(x),
           LATERAL unnest(generate_series(0, d.h - 1)) AS gy(y)
"""
# One copy of the per-pixel horizontal-gradient replay (the rule in
# _synth_rgb, channel offsets 0/11/22): mm_image_gradient and
# mm_image_blockiness both consume it, so the rule cannot desync
# between the two oracles (round-7 review; the shared-CMS-SQL rule).


@query(
    "mm_image_gradient",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id, doc_id % 8 + 2 AS w, doc_id % 6 + 2 AS h
      FROM documents
    ),
    gpx AS ({_HGRAD_GPX_SQL})
    SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(SUM(g) AS BIGINT) AS grad_sum
    FROM gpx GROUP BY doc_id, w, h
    """,
)
def mm_image_gradient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horizontal gradient energy per image from REAL decoded pixels:
    Σ |gray(x+1,y) − gray(x,y)| over the channel-sum gray — the
    sharpness/blur proxy (blurry or synthetic-flat images score low)
    used as a quality gate before spending embedding compute, and the
    1-D core of Sobel/Tenengrad focus measures. Integer arithmetic
    end-to-end; the oracle replays the per-pixel generation rule on
    the shifted index grid, so a stride or row-order codec bug
    changes the gradient and breaks the hash (unlike a global pixel
    SUM, which row-reversal leaves invariant — this is the codec
    check mm_decode_image's checksum cannot do).

    Map-only Arrow decode, one long per image out."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(
        _image_gradient_batches,
        schema="doc_id long, width int, height int, grad_sum long",
    )


def _mixed_blob(doc_id: int) -> bytes:
    """Deterministic mixed-modality payload: doc_id mod 4 selects the
    codec, dims/length follow the module's generation rules."""
    kind = doc_id % 4
    if kind in (0, 1):
        w, h = doc_id % 8 + 2, doc_id % 6 + 2
        rgb = _synth_rgb(doc_id, w, h)
        return encode_bmp(w, h, rgb) if kind == 0 else encode_ppm(w, h, rgb)
    if kind == 2:
        n = doc_id % 50 + 10
        rate = 8000 + (doc_id % 3) * 4000
        return encode_wav_pcm16(rate, _audio_samples(doc_id, n))
    return _video_frame_blobs(doc_id)


def _route_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            blob = _mixed_blob(doc_id)
            # dispatch on the BYTES (magic sniff), never on doc_id —
            # the oracle checks the sniff agrees with the generator
            if blob[:2] == b"BM":
                modality = "image/bmp"
            elif blob[:2] == b"P6":
                modality = "image/ppm"
            elif blob[:4] == b"RIFF":
                modality = "audio/wav"
            elif blob[:4] == b"VID0":
                modality = "video/vid0"
            else:
                modality = "unknown"
            rows.append((doc_id, modality, len(blob)))
        yield pd.DataFrame(rows, columns=["doc_id", "modality", "n_bytes"])


@query(
    "mm_modality_route",
    oracle="""
    WITH dims AS (
      SELECT doc_id, doc_id % 4 AS kind,
             doc_id % 8 + 2 AS w, doc_id % 6 + 2 AS h,
             doc_id % 50 + 10 AS n,
             doc_id % 4 + 2 AS vw, doc_id % 3 + 1 AS nf
      FROM documents
    )
    SELECT doc_id,
           CASE kind WHEN 0 THEN 'image/bmp' WHEN 1 THEN 'image/ppm'
                     WHEN 2 THEN 'audio/wav' ELSE 'video/vid0'
           END AS modality,
           CAST(CASE kind
             WHEN 0 THEN 54 + h * (((3 * w + 3) // 4) * 4)
             WHEN 1 THEN 9 + length(CAST(w AS VARCHAR))
                        + length(CAST(h AS VARCHAR)) + 3 * w * h
             WHEN 2 THEN 44 + 2 * n
             ELSE 8 + nf * (4 + 54 + 2 * (((3 * vw + 3) // 4) * 4))
           END AS BIGINT) AS n_bytes
    FROM dims
    """,
)
def mm_modality_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modality ROUTER: a mixed binary column (BMP/PPM/WAV/VID0 by
    generation rule) is dispatched by sniffing the MAGIC BYTES — the
    first operator of every real multimodal ingest (route each blob
    to its decoder pool / per-modality pipeline branch; at 100 TB the
    router's output IS the partition key that keeps decode pools
    homogeneous). The worker never looks at doc_id to classify, only
    at the bytes; the oracle derives the EXPECTED modality and the
    exact container size from the generation rules and all four
    codecs' byte layouts (BMP header+padded rows, PPM ASCII header
    with digit-width-dependent length, canonical 44-byte WAV, VID0
    length-prefixed frames) — so a mis-sniff, a header drift in any
    encoder, or a wrong-size write all break the value hash.

    Map-only Arrow batches; 3 scalars out per blob."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(
        _route_batches, schema="doc_id long, modality string, n_bytes long"
    )


def _distorted_rgb(doc_id: int, w: int, h: int) -> bytes:
    """The 'recompressed' variant of _synth_rgb: same geometry, each
    channel value shifted by a position-dependent perturbation —
    deterministic, so the oracle can replay the distortion."""
    return bytes(
        (x * 3 + y * 5 + doc_id + c * 11 + ((x + y) % 5) * 13) % 256
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )


def _ssim_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            w, h = doc_id % 8 + 2, doc_id % 6 + 2
            blob_a = (
                encode_bmp(w, h, _synth_rgb(doc_id, w, h))
                if doc_id % 2 == 0
                else encode_ppm(w, h, _synth_rgb(doc_id, w, h))
            )
            blob_b = (
                encode_bmp(w, h, _distorted_rgb(doc_id, w, h))
                if doc_id % 2 == 0
                else encode_ppm(w, h, _distorted_rgb(doc_id, w, h))
            )
            _, _, a = decode_image(blob_a)
            _, _, b = decode_image(blob_b)
            n = len(a)
            sa = sum(a)
            sb = sum(b)
            saa = sum(v * v for v in a)
            sbb = sum(v * v for v in b)
            sab = sum(u * v for u, v in zip(a, b))
            rows.append((doc_id, n, sa, sb, saa, sbb, sab))
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "n_px", "sa", "sb", "saa", "sbb", "sab"],
        )


_SSIM_FORMULA = """
    (2.0 * ({sa} / {n}) * ({sb} / {n}) + 6.5025)
    * (2.0 * ({sab} / {n} - ({sa} / {n}) * ({sb} / {n})) + 58.5225)
    / (
        (({sa} / {n}) * ({sa} / {n})
         + ({sb} / {n}) * ({sb} / {n}) + 6.5025)
        * (({saa} / {n} - ({sa} / {n}) * ({sa} / {n}))
           + ({sbb} / {n} - ({sb} / {n}) * ({sb} / {n})) + 58.5225)
    )
"""


@query(
    "mm_image_ssim",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id, doc_id % 8 + 2 AS w, doc_id % 6 + 2 AS h
      FROM documents
    ),
    px AS (
      SELECT d.doc_id,
             (gx.x * 3 + gy.y * 5 + d.doc_id + gc.c * 11) % 256 AS a,
             (gx.x * 3 + gy.y * 5 + d.doc_id + gc.c * 11
              + ((gx.x + gy.y) % 5) * 13) % 256 AS b
      FROM dims d,
           LATERAL unnest(generate_series(0, d.w - 1)) AS gx(x),
           LATERAL unnest(generate_series(0, d.h - 1)) AS gy(y),
           LATERAL unnest(generate_series(0, 2)) AS gc(c)
    ),
    m AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_px,
             CAST(SUM(a) AS BIGINT) AS sa,
             CAST(SUM(b) AS BIGINT) AS sb,
             CAST(SUM(a * a) AS BIGINT) AS saa,
             CAST(SUM(b * b) AS BIGINT) AS sbb,
             CAST(SUM(a * b) AS BIGINT) AS sab
      FROM px GROUP BY doc_id
    )
    SELECT doc_id, n_px, sa, sb,
           {sql_qround(_SSIM_FORMULA.format(
               n="CAST(n_px AS DOUBLE)", sa="CAST(sa AS DOUBLE)",
               sb="CAST(sb AS DOUBLE)", saa="CAST(saa AS DOUBLE)",
               sbb="CAST(sbb AS DOUBLE)", sab="CAST(sab AS DOUBLE)",
           ), 6)} AS ssim
    FROM m
    """,
)
def mm_image_ssim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global SSIM (Wang et al. 2004) between each document's image
    and a deterministically 'recompressed' variant — the perceptual
    quality gate a multimodal curation pipeline applies after
    re-encoding media (SSIM below threshold ⇒ the transcode damaged
    the image; phash answers 'same image?', SSIM answers 'how much
    worse?'). Both variants go through the REAL encode → decode codec
    roundtrip; the worker emits only exact integer moments (n, Σa,
    Σb, Σa², Σb², Σab) and the single-window SSIM closed form is one
    fixed-shape double expression over them, computed identically in
    both engines from the oracle's replayed pixel arithmetic —
    stabilizer constants C1 = (0.01·255)², C2 = (0.03·255)² make the
    denominator strictly positive, so no ANSI division guard is
    needed. Map-only Arrow batches, zero shuffles."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    m = docs.mapInPandas(
        _ssim_batches,
        schema=(
            "doc_id long, n_px long, sa long, sb long, "
            "saa long, sbb long, sab long"
        ),
    )
    n = F.col("n_px").cast("double")
    mu_a = F.col("sa").cast("double") / n
    mu_b = F.col("sb").cast("double") / n
    var_a = F.col("saa").cast("double") / n - mu_a * mu_a
    var_b = F.col("sbb").cast("double") / n - mu_b * mu_b
    cov = F.col("sab").cast("double") / n - mu_a * mu_b
    ssim = (
        (2.0 * mu_a * mu_b + 6.5025)
        * (2.0 * cov + 58.5225)
        / (
            (mu_a * mu_a + mu_b * mu_b + 6.5025)
            * (var_a + var_b + 58.5225)
        )
    )
    from etl_geonames_spark.functions import qround

    return m.select(
        "doc_id", "n_px", "sa", "sb", qround(ssim, 6).alias("ssim")
    )


_PITCH_LAGS = (4, 10)  # inclusive lag search range


def _pitch_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    lo, hi = _PITCH_LAGS
    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            n = doc_id % 40 + 60
            blob = encode_wav_pcm16(16000, _feature_wave(doc_id, n))
            _, _, s = decode_wav(blob)
            r0 = sum(v * v for v in s)
            best_lag, r_best = None, None
            for lag in range(lo, hi + 1):
                r = sum(
                    s[i] * s[i + lag] for i in range(len(s) - lag)
                )
                if r_best is None or r > r_best:
                    best_lag, r_best = lag, r
            rows.append((doc_id, len(s), best_lag, r_best, r0))
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "n_samples", "best_lag", "r_best", "r0"],
        )


@query(
    "mm_audio_pitch",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id, doc_id % 40 + 60 AS n FROM documents
    ),
    r AS (
      SELECT d.doc_id, d.n, gl.lag,
             CAST(SUM(
                 CAST((d.doc_id * 31 + gi.i * 9973) % 65536 - 32768
                      AS BIGINT)
                 * CAST((d.doc_id * 31 + (gi.i + gl.lag) * 9973) % 65536
                        - 32768 AS BIGINT)
             ) AS BIGINT) AS rl
      FROM dims d,
           LATERAL unnest(generate_series({_PITCH_LAGS[0]},
                                          {_PITCH_LAGS[1]})) AS gl(lag),
           LATERAL unnest(generate_series(0, d.n - 1 - gl.lag)) AS gi(i)
      GROUP BY d.doc_id, d.n, gl.lag
    ),
    e AS (
      SELECT d.doc_id,
             CAST(SUM(
                 CAST((d.doc_id * 31 + gi.i * 9973) % 65536 - 32768
                      AS BIGINT)
                 * CAST((d.doc_id * 31 + gi.i * 9973) % 65536 - 32768
                        AS BIGINT)
             ) AS BIGINT) AS r0
      FROM dims d,
           LATERAL unnest(generate_series(0, d.n - 1)) AS gi(i)
      GROUP BY d.doc_id
    )
    SELECT r.doc_id, CAST(r.n AS INT) AS n_samples,
           CAST(r.lag AS INT) AS best_lag,
           r.rl AS r_best, e.r0
    FROM (
      SELECT doc_id, n, lag, rl,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY rl DESC, lag) AS rnk
      FROM r
    ) r JOIN e ON e.doc_id = r.doc_id
    WHERE r.rnk = 1
    """,
)
def mm_audio_pitch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation pitch estimation per audio clip — the
    fundamental-period detector (speech F0 / music pitch tracking):
    R(L) = Σ sᵢ·sᵢ₊L over lags 4..10 (_PITCH_LAGS),
    best lag = integer argmax (ties to the SMALLEST lag — the
    fundamental, not its harmonic), plus the lag-0 energy for
    normalization downstream. The waveform takes the full RIFF/WAVE
    encode → decode roundtrip (the mm_audio_features discipline);
    every correlation is an exact int64 sum of sample products, so
    the argmax has no float boundary anywhere and the oracle replays
    it sample-for-sample. Map-only Arrow batches; one row per clip.
    Overflow audit: |s| < 2¹⁵, so each product < 2³⁰ and a clip of
    2²⁰ samples stays below 2⁵⁰."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(
        _pitch_batches,
        schema=(
            "doc_id long, n_samples int, best_lag int, "
            "r_best long, r0 long"
        ),
    )


_CLIP_T = 32000  # |sample| at/above this counts as clipped (16-bit PCM)


def _clipping_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            n = doc_id % 200 + 64
            blob = encode_wav_pcm16(16000, _feature_wave(doc_id, n))
            _, _, s = decode_wav(blob)
            n_clip = 0
            run = 0
            best = 0
            for v in s:
                if v >= _CLIP_T or v <= -_CLIP_T:
                    n_clip += 1
                    run += 1
                    if run > best:
                        best = run
                else:
                    run = 0
            rows.append((doc_id, len(s), n_clip, best))
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "n_samples", "n_clipped", "max_clip_run"],
        )


@query(
    "mm_audio_clipping_detect",
    oracle=f"""
    WITH dims AS (SELECT doc_id, doc_id % 200 + 64 AS n FROM documents),
    s AS (
      SELECT d.doc_id, gi.i AS i,
             CAST((d.doc_id * 31 + gi.i * 9973) % 65536 - 32768 AS BIGINT)
               AS v
      FROM dims d, LATERAL unnest(generate_series(0, d.n - 1)) AS gi(i)
    ),
    cl AS (
      SELECT doc_id, i,
             i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS grp
      FROM s WHERE v >= {_CLIP_T} OR v <= -{_CLIP_T}
    ),
    runs AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS run_len
      FROM cl GROUP BY doc_id, grp
    )
    SELECT d.doc_id,
           CAST(d.n AS BIGINT) AS n_samples,
           CAST(COALESCE(SUM(r.run_len), 0) AS BIGINT) AS n_clipped,
           CAST(COALESCE(MAX(r.run_len), 0) AS BIGINT) AS max_clip_run
    FROM dims d LEFT JOIN runs r ON d.doc_id = r.doc_id
    GROUP BY d.doc_id, d.n
    """,
)
def mm_audio_clipping_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clipping detection over the REAL audio path: decode the WAV
    clip and count samples at/beyond ±32000 (near 16-bit full scale)
    plus the LONGEST consecutive clipped run — the audio-QA gate
    training pipelines apply before feature extraction, since a
    clipped recording distorts every downstream spectral feature and
    a long flat-topped run (vs isolated peaks) is the signature of
    true analog clipping rather than a loud transient. Complements
    mm_audio_vad (activity) and mm_audio_features (summary stats)
    with the damage check.

    Integer end-to-end: sample values, the ±threshold predicate, the
    run lengths (the vad gaps-and-islands recipe: row_number
    difference groups on clipped sample indices), and both emitted
    counts are exact int64 — no float anywhere, so the oracle replay
    of the synthetic waveform is value-exact. Clips with no clipped
    samples emit 0/0 (LEFT JOIN + COALESCE), not missing rows.

    100 TB shape: map-only decode + one linear scan per clip inside
    the Arrow batch (Python holds state = current run only); one
    output row per clip, no shuffle. The oracle's window is
    per-doc_id, bounded by clip length."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(
        _clipping_batches,
        schema=(
            "doc_id long, n_samples long, n_clipped long,"
            " max_clip_run long"
        ),
    )


_BLK_B = 2  # probe grid pitch: real JPEG uses 8, the fixture's tiny
#             (<=9px) images need a 2px grid to have any boundaries


def _blockiness_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id, blob in _image_blob_rows(pdf):
            w, h, rgb = decode_image(blob)
            px = bytes(rgb)

            def gray(x, y):
                i = (y * w + x) * 3
                return px[i] + px[i + 1] + px[i + 2]

            gb = gi = nb = ni = 0
            for y in range(h):
                for x in range(w - 1):
                    d = abs(gray(x + 1, y) - gray(x, y))
                    if (x + 1) % _BLK_B == 0:
                        gb += d
                        nb += 1
                    else:
                        gi += d
                        ni += 1
            rows.append((doc_id, w, h, gb, gi, nb, ni))
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "width", "height",
                "g_boundary", "g_interior", "n_boundary", "n_interior",
            ],
        )


@query(
    "mm_image_blockiness",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id, doc_id % 8 + 2 AS w, doc_id % 6 + 2 AS h
      FROM documents
    ),
    hg AS ({_HGRAD_GPX_SQL}),
    gpx AS (
      SELECT doc_id, w, h,
             CASE WHEN (x + 1) % {_BLK_B} = 0 THEN 1 ELSE 0 END AS bnd,
             g
      FROM hg
    )
    SELECT doc_id, CAST(MAX(w) AS INT) AS width,
           CAST(MAX(h) AS INT) AS height,
           CAST(COALESCE(SUM(g * bnd), 0) AS BIGINT) AS g_boundary,
           CAST(COALESCE(SUM(g * (1 - bnd)), 0) AS BIGINT) AS g_interior,
           CAST(COALESCE(SUM(bnd), 0) AS BIGINT) AS n_boundary,
           CAST(COALESCE(SUM(1 - bnd), 0) AS BIGINT) AS n_interior
    FROM gpx GROUP BY doc_id
    """,
)
def mm_image_blockiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blockiness (compression-artifact) detection over REAL decoded
    pixels: compare horizontal gray gradients ACROSS the coding-grid
    boundaries against gradients inside blocks — lossy block codecs
    (JPEG) leave step edges exactly at grid positions, so a boundary/
    interior gradient ratio ≫ 1 flags re-compressed or low-quality
    images before they enter a training set (the QA sibling of
    mm_image_gradient's blur check, sensitive to the OPPOSITE
    defect). Grid pitch is 2 px here (contractual: the fixture's
    ≤ 9 px images have no 8-grid interior; the real-JPEG deployment
    sets 8).

    Emits the four exact integers (boundary/interior gradient sums
    and position counts) rather than the ratio — downstream picks
    the gate (the all-integer threshold rule: g_b·n_i > τ·g_i·n_b
    avoids the float boundary entirely). The oracle replays the
    per-pixel generation rule on the shifted grid, so a codec
    stride/row-order bug breaks the hash.

    Map-only Arrow decode, one row per image, no shuffle."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(
        _blockiness_batches,
        schema=(
            "doc_id long, width int, height int, g_boundary long,"
            " g_interior long, n_boundary long, n_interior long"
        ),
    )

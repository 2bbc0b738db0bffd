"""Pure-stdlib image codecs: real BMP (24bpp) and PPM (P6) encode /
decode / resize over raw RGB bytes.

The container ships no PIL/ffmpeg, so the multimodal operators
previously faked metadata arithmetically. These codecs are the real
thing within that constraint: byte-exact BITMAPINFOHEADER / P6
parsing, bottom-up BGR row order, 4-byte row padding, nearest-neighbor
resampling — everything a thumbnailer does, minus compressed formats.
A PIL-style decoder drops in beside them for JPEG/PNG when the
environment grows the libraries; the Spark plumbing in multimodal.py
is agnostic to which decoder runs inside the Arrow batch.

No Spark imports here — these run inside mapInPandas workers and in
plain unit tests.
"""

from __future__ import annotations

import struct

_BMP_HEADER_SIZE = 14
_DIB_HEADER_SIZE = 40
_BMP_OFFSET = _BMP_HEADER_SIZE + _DIB_HEADER_SIZE


def _bmp_row_size(width: int) -> int:
    return (width * 3 + 3) & ~3  # 24bpp rows pad to 4-byte boundaries


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Encode packed RGB bytes (row-major, top-down, 3 bytes/pixel)
    as a 24bpp uncompressed BMP: BITMAPFILEHEADER + BITMAPINFOHEADER,
    rows bottom-up in BGR order, padded to 4 bytes."""
    if len(rgb) != width * height * 3:
        raise ValueError(
            f"rgb payload {len(rgb)} bytes != {width}x{height}x3"
        )
    row_size = _bmp_row_size(width)
    data = bytearray()
    pad = b"\x00" * (row_size - width * 3)
    for y in range(height - 1, -1, -1):  # bottom-up storage
        row = bytearray()
        base = y * width * 3
        for x in range(width):
            r, g, b = rgb[base + 3 * x : base + 3 * x + 3]
            row += bytes((b, g, r))  # BGR on disk
        data += row + pad
    file_size = _BMP_OFFSET + len(data)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, _BMP_OFFSET)
    dib = struct.pack(
        "<IiiHHIIiiII",
        _DIB_HEADER_SIZE,
        width,
        height,  # positive height = bottom-up
        1,  # planes
        24,  # bpp
        0,  # BI_RGB (uncompressed)
        len(data),
        2835,  # 72 DPI in px/metre
        2835,
        0,
        0,
    )
    return header + dib + bytes(data)


def decode_bmp(blob: bytes) -> tuple[int, int, bytes]:
    """Decode a 24bpp uncompressed BMP to (width, height, packed RGB
    top-down). Handles bottom-up AND top-down (negative height) files,
    row padding, and an arbitrary pixel-data offset."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP: missing 'BM' magic")
    (offset,) = struct.unpack_from("<I", blob, 10)
    dib_size, width, height = struct.unpack_from("<Iii", blob, 14)
    if dib_size < _DIB_HEADER_SIZE:
        raise ValueError(f"unsupported DIB header size {dib_size}")
    planes, bpp, compression = struct.unpack_from("<HHI", blob, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"only 24bpp uncompressed supported (bpp={bpp}, "
            f"compression={compression})"
        )
    bottom_up = height > 0
    height = abs(height)
    row_size = _bmp_row_size(width)
    rgb = bytearray(width * height * 3)
    for row_idx in range(height):
        y = height - 1 - row_idx if bottom_up else row_idx
        src = offset + row_idx * row_size
        dst_base = y * width * 3
        for x in range(width):
            b, g, r = blob[src + 3 * x : src + 3 * x + 3]
            rgb[dst_base + 3 * x : dst_base + 3 * x + 3] = bytes((r, g, b))
    return width, height, bytes(rgb)


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Binary PPM (P6, maxval 255): ASCII header + raw RGB — already
    top-down row-major, no padding."""
    if len(rgb) != width * height * 3:
        raise ValueError(
            f"rgb payload {len(rgb)} bytes != {width}x{height}x3"
        )
    return f"P6\n{width} {height}\n255\n".encode() + rgb


def decode_ppm(blob: bytes) -> tuple[int, int, bytes]:
    """Decode P6 PPM (maxval 255), tolerating comment lines and
    arbitrary whitespace in the header per the Netpbm spec."""
    if blob[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # header = magic + 3 whitespace-separated ints, '#' comments allowed
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(blob) and blob[i : i + 1].isspace():
            i += 1
        if blob[i : i + 1] == b"#":
            while i < len(blob) and blob[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(blob) and not blob[j : j + 1].isspace():
            j += 1
        fields.append(int(blob[i:j]))
        i = j
    i += 1  # single whitespace after maxval, then raw bytes
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    rgb = blob[i : i + width * height * 3]
    if len(rgb) != width * height * 3:
        raise ValueError("truncated PPM pixel data")
    return width, height, rgb


def decode_image(blob: bytes) -> tuple[int, int, bytes] | None:
    """Sniff the magic and decode BMP/PPM to (width, height, RGB);
    None for unrecognized payloads (callers fall back to opaque-blob
    handling)."""
    if blob[:2] == b"BM":
        return decode_bmp(blob)
    if blob[:2] == b"P6":
        return decode_ppm(blob)
    return None


def resize_nearest(
    rgb: bytes, width: int, height: int, new_w: int, new_h: int
) -> bytes:
    """Nearest-neighbor resample of packed RGB: target pixel (x, y)
    reads source (x*width // new_w, y*height // new_h) — integer-exact,
    so an oracle can replay it."""
    out = bytearray(new_w * new_h * 3)
    for y in range(new_h):
        sy = y * height // new_h
        for x in range(new_w):
            sx = x * width // new_w
            s = (sy * width + sx) * 3
            d = (y * new_w + x) * 3
            out[d : d + 3] = rgb[s : s + 3]
    return bytes(out)


# ---------------------------------------------------------------------------
# WAV (PCM16 mono/stereo) — RIFF container, fmt + data chunks
# ---------------------------------------------------------------------------


def encode_wav_pcm16(
    sample_rate: int, samples: list[int], channels: int = 1
) -> bytes:
    """Canonical 16-bit PCM WAV: RIFF header, fmt chunk, data chunk.
    ``samples`` are interleaved signed ints in [-32768, 32767]."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * channels * 2
    block_align = channels * 2
    fmt = struct.pack(
        "<4sIHHIIHH",
        b"fmt ",
        16,
        1,  # PCM
        channels,
        sample_rate,
        byte_rate,
        block_align,
        16,  # bits/sample
    )
    data_chunk = struct.pack("<4sI", b"data", len(data)) + data
    riff_size = 4 + len(fmt) + len(data_chunk)
    return struct.pack("<4sI4s", b"RIFF", riff_size, b"WAVE") + fmt + data_chunk


def decode_wav(blob: bytes) -> tuple[int, int, list[int]]:
    """Decode PCM16 WAV to (sample_rate, channels, samples). Walks the
    chunk list (tolerating LIST/INFO and other chunks before data),
    like a real parser must."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    sample_rate = channels = None
    samples: list[int] | None = None
    while pos + 8 <= len(blob):
        cid, size = struct.unpack_from("<4sI", blob, pos)
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, sample_rate = struct.unpack_from(
                "<HHI", body, 0
            )
            (bits,) = struct.unpack_from("<H", body, 14)
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    f"only PCM16 supported (fmt={audio_fmt}, bits={bits})"
                )
        elif cid == b"data":
            samples = list(struct.unpack(f"<{size // 2}h", body[: size & ~1]))
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or samples is None:
        raise ValueError("missing fmt or data chunk")
    return sample_rate, channels, samples


# ---------------------------------------------------------------------------
# Minimal frame container ("VID0"): length-prefixed image frames —
# the shape of real video work (demux → per-frame decode) without a
# compressed codec in the container.
# ---------------------------------------------------------------------------


def encode_video(frames: list[bytes]) -> bytes:
    """Concatenate encoded image frames behind a tiny demuxable
    header: magic, frame count, then u32-length-prefixed payloads."""
    out = bytearray(struct.pack("<4sI", b"VID0", len(frames)))
    for f in frames:
        out += struct.pack("<I", len(f)) + f
    return bytes(out)


def decode_video(blob: bytes) -> list[bytes]:
    """Demux the frame container back into encoded image payloads."""
    if blob[:4] != b"VID0":
        raise ValueError("not a VID0 container")
    (n,) = struct.unpack_from("<I", blob, 4)
    frames = []
    pos = 8
    for _ in range(n):
        (size,) = struct.unpack_from("<I", blob, pos)
        frames.append(blob[pos + 4 : pos + 4 + size])
        pos += 4 + size
    if pos != len(blob):
        raise ValueError("trailing bytes after last frame")
    return frames

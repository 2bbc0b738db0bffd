"""Byte-level unit tests for the pure-stdlib image codecs — known
pixel layouts asserted exactly, including the BMP quirks (bottom-up
row order, BGR channel order, 4-byte row padding) that a naive
implementation gets wrong silently.
"""

from __future__ import annotations

import struct

import pytest

from etl_geonames_spark.operators.codecs import (
    decode_bmp,
    decode_image,
    decode_ppm,
    encode_bmp,
    encode_ppm,
    resize_nearest,
)

# 2x2 test image, RGB top-down: (255,0,0) (0,255,0) / (0,0,255) (9,8,7)
RGB_2X2 = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 8, 7])


def test_bmp_roundtrip_exact():
    blob = encode_bmp(2, 2, RGB_2X2)
    assert decode_bmp(blob) == (2, 2, RGB_2X2)


def test_bmp_on_disk_layout_is_bottom_up_bgr():
    blob = encode_bmp(2, 2, RGB_2X2)
    (offset,) = struct.unpack_from("<I", blob, 10)
    # first stored row = BOTTOM image row, channels as BGR:
    # (0,0,255) -> FF 00 00 ; (9,8,7) -> 07 08 09
    assert blob[offset : offset + 6] == bytes([255, 0, 0, 7, 8, 9])
    # second stored row = top image row
    assert blob[offset + 8 : offset + 14] == bytes([0, 0, 255, 0, 255, 0])


def test_bmp_row_padding_width_3():
    """Width 3 → 9 pixel bytes/row, padded to 12: a decoder that
    forgets padding shears every row after the first."""
    rgb = bytes(range(3 * 3 * 3))
    blob = encode_bmp(3, 3, rgb)
    (offset,) = struct.unpack_from("<I", blob, 10)
    assert (len(blob) - offset) == 12 * 3
    assert decode_bmp(blob) == (3, 3, rgb)


def test_bmp_top_down_negative_height():
    """Files with negative height store rows top-down; decode must
    not flip them."""
    blob = bytearray(encode_bmp(2, 2, RGB_2X2))
    struct.pack_into("<i", blob, 22, -2)  # declare top-down
    # stored rows are bottom-up from the encoder, so decoding them as
    # top-down must yield the vertically flipped image
    w, h, rgb = decode_bmp(bytes(blob))
    assert (w, h) == (2, 2)
    assert rgb == RGB_2X2[6:] + RGB_2X2[:6]


def test_bmp_rejects_unsupported():
    with pytest.raises(ValueError, match="magic"):
        decode_bmp(b"PNG whatever")
    blob = bytearray(encode_bmp(2, 2, RGB_2X2))
    struct.pack_into("<H", blob, 28, 8)  # declare 8bpp
    with pytest.raises(ValueError, match="24bpp"):
        decode_bmp(bytes(blob))


def test_ppm_roundtrip_and_comments():
    blob = encode_ppm(2, 2, RGB_2X2)
    assert decode_ppm(blob) == (2, 2, RGB_2X2)
    commented = b"P6\n# a comment line\n2 2\n# another\n255\n" + RGB_2X2
    assert decode_ppm(commented) == (2, 2, RGB_2X2)


def test_decode_image_dispatch():
    assert decode_image(encode_bmp(2, 2, RGB_2X2)) == (2, 2, RGB_2X2)
    assert decode_image(encode_ppm(2, 2, RGB_2X2)) == (2, 2, RGB_2X2)
    assert decode_image(b"plain text payload") is None


def test_resize_nearest_upscale_2x2_to_4x4():
    out = resize_nearest(RGB_2X2, 2, 2, 4, 4)
    # each source pixel becomes a 2x2 block
    px = [out[i * 3 : i * 3 + 3] for i in range(16)]
    assert px[0] == px[1] == px[4] == px[5] == bytes([255, 0, 0])
    assert px[2] == px[3] == px[6] == px[7] == bytes([0, 255, 0])
    assert px[8] == px[9] == px[12] == px[13] == bytes([0, 0, 255])
    assert px[10] == px[11] == px[14] == px[15] == bytes([9, 8, 7])


def test_resize_nearest_downscale_4x4_to_2x2():
    big = resize_nearest(RGB_2X2, 2, 2, 4, 4)
    assert resize_nearest(big, 4, 4, 2, 2) == RGB_2X2


def test_wav_roundtrip_and_chunk_walk():
    from etl_geonames_spark.operators.codecs import (
        decode_wav,
        encode_wav_pcm16,
    )

    samples = [0, 100, -100, 32767, -32768]
    blob = encode_wav_pcm16(8000, samples)
    assert decode_wav(blob) == (8000, 1, samples)
    # a LIST chunk before data must be skipped, and odd-sized chunks
    # are word-aligned per RIFF
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = blob[:12] + extra + blob[12:]
    assert decode_wav(spliced) == (8000, 1, samples)


def test_wav_rejects_non_pcm16():
    from etl_geonames_spark.operators.codecs import (
        decode_wav,
        encode_wav_pcm16,
    )

    blob = bytearray(encode_wav_pcm16(8000, [1, 2, 3]))
    struct.pack_into("<H", blob, 20, 3)  # IEEE float format tag
    with pytest.raises(ValueError, match="PCM16"):
        decode_wav(bytes(blob))
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not audio")


def test_video_container_roundtrip():
    from etl_geonames_spark.operators.codecs import (
        decode_video,
        encode_video,
    )

    frames = [encode_bmp(2, 2, RGB_2X2), encode_ppm(2, 2, RGB_2X2), b""]
    assert decode_video(encode_video(frames)) == frames
    with pytest.raises(ValueError, match="VID0"):
        decode_video(b"AVI whatever")
    with pytest.raises(ValueError, match="trailing"):
        decode_video(encode_video(frames) + b"junk")


# ---------------------------------------------------------------------------
# property-based roundtrips: hundreds of random images/waveforms per
# run — the hand-picked layouts above pin known quirks, these sweep
# the input space (odd widths exercising padding, extreme samples,
# 1-pixel images)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _images(draw):
    w = draw(st.integers(min_value=1, max_value=12))
    h = draw(st.integers(min_value=1, max_value=12))
    rgb = draw(
        st.binary(min_size=w * h * 3, max_size=w * h * 3)
    )
    return w, h, rgb


@given(_images())
@settings(max_examples=200, deadline=None)
def test_bmp_roundtrip_property(img):
    w, h, rgb = img
    assert decode_bmp(encode_bmp(w, h, rgb)) == (w, h, rgb)


@given(_images())
@settings(max_examples=200, deadline=None)
def test_ppm_roundtrip_property(img):
    w, h, rgb = img
    assert decode_ppm(encode_ppm(w, h, rgb)) == (w, h, rgb)


@given(
    st.integers(min_value=1, max_value=192000),
    st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=1,
        max_size=256,
    ),
)
@settings(max_examples=200, deadline=None)
def test_wav_roundtrip_property(rate, samples):
    from etl_geonames_spark.operators.codecs import (
        decode_wav,
        encode_wav_pcm16,
    )

    assert decode_wav(encode_wav_pcm16(rate, samples)) == (rate, 1, samples)


@given(st.lists(st.binary(max_size=64), max_size=8))
@settings(max_examples=200, deadline=None)
def test_video_container_roundtrip_property(frames):
    from etl_geonames_spark.operators.codecs import (
        decode_video,
        encode_video,
    )

    assert decode_video(encode_video(frames)) == frames


@given(
    _images(),
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=1, max_value=16),
)
@settings(max_examples=200, deadline=None)
def test_resize_nearest_property(img, tw, th):
    """Every output pixel of a nearest-neighbor resample must equal
    its arithmetically-determined source pixel."""
    w, h, rgb = img
    out = resize_nearest(rgb, w, h, tw, th)
    assert len(out) == tw * th * 3
    for y in range(th):
        for x in range(tw):
            sx, sy = x * w // tw, y * h // th
            s = (sy * w + sx) * 3
            d = (y * tw + x) * 3
            assert out[d : d + 3] == rgb[s : s + 3]

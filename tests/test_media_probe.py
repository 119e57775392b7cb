"""Image header probe: real dimensions from container metadata for
JPEG/PNG/GIF/BMP/WEBP, truncation-safe, wired into media_decode_stats."""

from __future__ import annotations

import pytest

from docling_graph_spark.kernels.media_probe import (
    make_bmp_header,
    make_gif_header,
    make_jpeg_header,
    make_webp_vp8x_header,
    probe_dimensions,
)
from docling_graph_spark.kernels.media_stub import sniff_media_type
from docling_graph_spark.kernels.png_codec import encode_png_gray

CASES = [
    ("image/jpeg", lambda w, h: make_jpeg_header(w, h)),
    ("image/gif", make_gif_header),
    ("image/bmp", make_bmp_header),
    ("image/webp", make_webp_vp8x_header),
    ("image/png", lambda w, h: encode_png_gray(w, h, bytes(w * h))),
]


@pytest.mark.parametrize("mtype,make", CASES, ids=[c[0] for c in CASES])
@pytest.mark.parametrize("w,h", [(1, 1), (7, 3), (640, 480), (16383, 9999)])
def test_probe_roundtrip(mtype, make, w, h):
    if mtype == "image/png" and w * h > 1 << 20:
        pytest.skip("pixel buffer too large for a unit test")
    b = make(w, h)
    hdr = probe_dimensions(b)
    assert hdr is not None
    assert (hdr.media_type, hdr.width, hdr.height) == (mtype, w, h)
    assert sniff_media_type(b) == mtype


def test_jpeg_channels_and_progressive_sof():
    assert probe_dimensions(make_jpeg_header(10, 20, channels=1)).channels == 1
    assert probe_dimensions(make_jpeg_header(10, 20, channels=3)).channels == 3
    # SOF2 (progressive) is a frame header too
    b = bytearray(make_jpeg_header(33, 44))
    i = b.index(b"\xff\xc0")
    b[i + 1] = 0xC2
    hdr = probe_dimensions(bytes(b))
    assert (hdr.width, hdr.height) == (33, 44)


def test_png_channels_from_color_type():
    hdr = probe_dimensions(encode_png_gray(5, 4, bytes(20)))
    assert hdr.channels == 1  # grayscale


def test_truncation_never_raises_and_never_lies():
    """Any prefix of a valid image either probes to the true geometry or
    returns None — never an exception, never wrong numbers."""
    for mtype, make in CASES:
        full = make(40, 30)
        want = (40, 30)
        for cut in range(len(full) + 1):
            hdr = probe_dimensions(full[:cut])
            if hdr is not None and hdr.media_type == mtype:
                assert (hdr.width, hdr.height) == want


def test_garbage_and_non_images_probe_none():
    assert probe_dimensions(None) is None
    assert probe_dimensions(b"") is None
    assert probe_dimensions(b"<html><body>hi</body></html>") is None
    assert probe_dimensions(b"BMnot actually a bitmap header here") is None
    assert probe_dimensions(b"\xff\xd8\xff" + b"\x00" * 50) is None
    assert sniff_media_type(b"BMnot actually a bitmap") != "image/bmp"


def test_decode_stats_header_fallback(spark):
    """media_decode_stats fills geometry from the header probe for formats
    without a full decoder: decoded=False, width/height real."""
    from docling_graph_spark.operators.multimodal import media_decode_stats

    rows = [
        ("j", bytearray(make_jpeg_header(101, 57))),
        ("g", bytearray(make_gif_header(12, 34))),
        ("p", bytearray(encode_png_gray(3, 2, bytes(6)))),
        ("x", bytearray(b"not an image at all, just text bytes")),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r["url"]: r for r in media_decode_stats(df).collect()}
    assert (got["j"]["width"], got["j"]["height"]) == (101, 57)
    assert got["j"]["decoded"] is False
    assert got["j"]["decode_error"] == "header-only"
    assert (got["g"]["width"], got["g"]["height"]) == (12, 34)
    assert got["p"]["decoded"] is True  # PNG still fully decodes
    assert (got["p"]["width"], got["p"]["height"]) == (3, 2)
    assert got["x"]["width"] is None
    assert got["x"]["decode_error"].startswith("unsupported")

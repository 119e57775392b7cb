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


# ---------------------------------------------------------------------------
# Round 5: video container probes (ISO BMFF + Matroska/WebM)
# ---------------------------------------------------------------------------


def test_mp4_probe_roundtrip_and_versions():
    import struct

    from docling_graph_spark.kernels.media_probe import (
        _probe_mp4, make_mp4_header, probe_dimensions)

    for w, h in [(640, 360), (1, 1), (3840, 2160)]:
        hdr = probe_dimensions(make_mp4_header(w, h))
        assert hdr == ("video/mp4", w, h, None)
    # version-1 tkhd (64-bit times): geometry offset shifts to 88
    tk = bytes([1]) + bytes(3) + bytes(8 * 2 + 4 + 4) + bytes(8) \
        + bytes(8) + bytes(2 * 4) + bytes(36) \
        + struct.pack(">II", 320 << 16, 200 << 16)
    tkhd = struct.pack(">I", 8 + len(tk)) + b"tkhd" + tk
    trak = struct.pack(">I", 8 + len(tkhd)) + b"trak" + tkhd
    moov = struct.pack(">I", 8 + len(trak)) + b"moov" + trak
    data = struct.pack(">I", 16) + b"ftyp" + b"mp42" + bytes(4) + moov
    assert _probe_mp4(data) == ("video/mp4", 320, 200, None)


def test_webm_probe_roundtrip_and_unknown_size():
    from docling_graph_spark.kernels.media_probe import (
        _ebml_elem, make_webm_header, probe_dimensions)

    for w, h in [(640, 360), (12, 7), (7680, 4320)]:
        hdr = probe_dimensions(make_webm_header(w, h))
        assert hdr == ("video/webm", w, h, None)
    # unknown-size Segment (all value-bits set) — the live-stream form
    video = _ebml_elem(0xE0, _ebml_elem(0xB0, (800).to_bytes(2, "big"))
                       + _ebml_elem(0xBA, (600).to_bytes(2, "big")))
    tracks = _ebml_elem(0x1654AE6B, _ebml_elem(0xAE, video))
    ebml = _ebml_elem(0x1A45DFA3, b"")
    seg = (0x18538067).to_bytes(4, "big") + b"\xff" + tracks
    hdr = probe_dimensions(ebml + seg)
    assert hdr == ("video/webm", 800, 600, None)


def test_video_probe_malformed_returns_none():
    from docling_graph_spark.kernels.media_probe import probe_dimensions

    assert probe_dimensions(b"\x00\x00\x00\x10ftypisom" + b"junk") is None
    assert probe_dimensions(b"\x1a\x45\xdf\xa3" + b"\x00" * 8) is None


def test_video_rows_flow_header_only_through_operator(spark):
    from docling_graph_spark.kernels.media_probe import (
        make_mp4_header, make_webm_header)
    from docling_graph_spark.operators.multimodal import (
        media_decode_stats)

    rows = [("m", bytearray(make_mp4_header(1280, 720))),
            ("w", bytearray(make_webm_header(854, 480)))]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = {r["url"]: r for r in media_decode_stats(df).collect()}
    assert out["m"]["media_type"] == "video/mp4"
    assert not out["m"]["decoded"]
    assert out["m"]["decode_error"] == "header-only"
    assert (out["m"]["width"], out["m"]["height"]) == (1280, 720)
    assert (out["w"]["width"], out["w"]["height"]) == (854, 480)
    assert out["w"]["media_type"] == "video/webm"


def test_mp3_header_probe_tables():
    from docling_graph_spark.kernels.media_probe import (
        make_mp3_header, probe_audio)

    for sr in (44100, 48000, 32000):
        for ch in (1, 2):
            for kb in (32, 128, 320):
                h = probe_audio(make_mp3_header(sr, ch, kb))
                assert h == ("audio/mpeg", ch, sr, kb)
    # ID3-only payload (no frame): no metadata to report
    assert probe_audio(b"ID3\x04\x00" + bytes(32)) is None
    # reserved bitrate/samplerate indexes are rejected
    assert probe_audio(b"\xff\xfb\xf0\x00") is None
    assert probe_audio(b"\xff\xfb\x9c\x00") is None


def test_mp3_bare_sync_sniff_and_header_only_flow(spark):
    from docling_graph_spark.kernels.media_probe import make_mp3_header
    from docling_graph_spark.kernels.media_stub import sniff_media_type
    from docling_graph_spark.operators.multimodal import (
        audio_decode_stats)

    bare = make_mp3_header(32000, 1, 192, id3=False)
    assert sniff_media_type(bare) == "audio/mpeg"
    assert sniff_media_type(b"\xff\xff\xff\xff") != "audio/mpeg"
    rows = [("bare", bytearray(bare)),
            ("tagged", bytearray(make_mp3_header(44100, 2, 128))),
            ("id3only", bytearray(b"ID3\x04\x00" + bytes(32)))]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = {r["url"]: r for r in audio_decode_stats(df).collect()}
    for u, sr, ch in (("bare", 32000, 1), ("tagged", 44100, 2)):
        assert out[u]["media_type"] == "audio/mpeg"
        assert not out[u]["decoded"]
        assert out[u]["decode_error"] == "header-only"
        assert out[u]["sample_rate"] == sr
        assert out[u]["n_channels"] == ch
    assert out["id3only"]["decode_error"].startswith("unsupported")


# ------------------------------------------------- SVG / HEIC / AVIF (r5)

def test_svg_sniff_and_probe():
    from docling_graph_spark.kernels.media_probe import (
        make_svg_header, probe_dimensions)
    from docling_graph_spark.kernels.media_stub import sniff_media_type

    plain = make_svg_header(120, 80)
    vb = make_svg_header(300, 150, viewbox_only=True)
    bare = b'<svg width="5" height="9"></svg>'
    for svg in (plain, vb, bare):
        assert sniff_media_type(svg) == "image/svg+xml"
    assert probe_dimensions(plain).width == 120
    assert probe_dimensions(plain).height == 80
    assert (probe_dimensions(vb).width,
            probe_dimensions(vb).height) == (300, 150)
    assert probe_dimensions(bare).width == 5
    # px units accepted; layout-dependent units rejected -> viewBox
    em = b'<svg width="10em" height="4em" viewBox="0 0 64 32"/>'
    hdr = probe_dimensions(em)
    assert (hdr.width, hdr.height) == (64, 32)
    # html is NOT svg
    assert sniff_media_type(b"<html><body>x</body></html>") \
        == "text/html"
    assert sniff_media_type(b'<?xml version="1.0"?><feed/>') \
        == "text/html"


def test_heic_avif_typing():
    import struct

    from docling_graph_spark.kernels.media_stub import sniff_media_type

    def bmff(brand):
        return struct.pack(">I", 16) + b"ftyp" + brand + b"\x00\x00\x00\x00"

    assert sniff_media_type(bmff(b"heic")) == "image/heic"
    assert sniff_media_type(bmff(b"mif1")) == "image/heic"
    assert sniff_media_type(bmff(b"avif")) == "image/avif"
    assert sniff_media_type(bmff(b"isom")) == "video/mp4"


def test_heif_avif_ispe_probe():
    from docling_graph_spark.kernels.media_probe import (make_heif_header,
                                                         probe_dimensions)
    from docling_graph_spark.kernels.media_stub import sniff_media_type

    heic = make_heif_header(640, 480, b"heic")
    avif = make_heif_header(31, 17, b"avif")
    assert sniff_media_type(heic) == "image/heic"
    assert sniff_media_type(avif) == "image/avif"
    hh = probe_dimensions(heic)
    assert (hh.media_type, hh.width, hh.height) \
        == ("image/heic", 640, 480)
    ha = probe_dimensions(avif)
    assert (ha.media_type, ha.width, ha.height) \
        == ("image/avif", 31, 17)
    # truncated meta: no geometry, no crash
    assert probe_dimensions(heic[:24]) is None

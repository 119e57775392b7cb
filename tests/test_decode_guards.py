"""Decompression-bomb guards across every real decoder.

At crawl scale malicious payloads are routine: ~50 bytes of VP8L (or
EOB-heavy JPEG, or a GIF LZW run, or a FLAC CONSTANT frame, or a
deflate bomb inside PNG IDAT / a PDF content stream) can legally
declare output thousands of times its size and pin an executor for
minutes.  Every decoder gates header-declared geometry (and the zlib
paths bound their inflate), raising ValueError in O(header) time —
the operator layer routes that to a decode_error column.
"""

from __future__ import annotations

import struct
import time
import zlib

import pytest

from docling_graph_spark.kernels import bmp_codec as B
from docling_graph_spark.kernels import flac_codec as FL
from docling_graph_spark.kernels import gif_codec as G
from docling_graph_spark.kernels import jpeg_codec as J
from docling_graph_spark.kernels import pdf_parse as PD
from docling_graph_spark.kernels import png_codec as P
from docling_graph_spark.kernels import webp_codec as W


def _expect_fast_guard(fn, match="guard"):
    t0 = time.time()
    with pytest.raises((ValueError, NotImplementedError), match=match):
        fn()
    assert time.time() - t0 < 2.0, "guard must trip in O(header) time"


def test_webp_dimension_bomb():
    bw = W._BitWriter()
    bw.write_bits(16383, 14)
    bw.write_bits(16383, 14)
    bw.write_bits(0, 1)
    bw.write_bits(0, 3)
    payload = b"\x2f" + bw.flush()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    data = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    _expect_fast_guard(lambda: W.decode_webp(data))


def test_jpeg_dimension_bomb():
    good = J.encode_jpeg_gray(8, 8, bytes(64))
    i = good.index(b"\xff\xc0")
    bomb = bytearray(good)
    bomb[i + 5:i + 7] = (65500).to_bytes(2, "big")
    bomb[i + 7:i + 9] = (65500).to_bytes(2, "big")
    _expect_fast_guard(lambda: J.decode_jpeg(bytes(bomb)))


def test_png_dimension_bomb():
    png = P.encode_png_gray(4, 4, bytes(16))
    i = png.index(b"IHDR")
    pb = bytearray(png)
    pb[i + 4:i + 8] = (1 << 20).to_bytes(4, "big")
    pb[i + 8:i + 12] = (1 << 20).to_bytes(4, "big")
    _expect_fast_guard(lambda: P.decode_png(bytes(pb)))


def test_png_idat_zlib_bomb_bounded():
    """Small declared dims but an IDAT that inflates to 100 MB: the
    bounded inflate must stop at the geometry-implied size."""
    blob = zlib.compress(bytes(100 * 1024 * 1024), 9)

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    data = (P.PNG_SIGNATURE + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", blob) + chunk(b"IEND", b""))
    _expect_fast_guard(lambda: P.decode_png(data), match="inflated")


def test_gif_screen_and_frame_bombs():
    gif = bytearray(G.encode_gif(4, 4, [bytes(3)] * 2, bytes(16)))
    gif[6:8] = (60000).to_bytes(2, "little")
    gif[8:10] = (60000).to_bytes(2, "little")
    _expect_fast_guard(lambda: G.decode_gif(bytes(gif)))
    # frame descriptor bomb with an innocent screen
    gif2 = bytearray(G.encode_gif(4, 4, [bytes(3)] * 2, bytes(16)))
    i = gif2.index(0x2C)
    gif2[i + 5:i + 7] = (60000).to_bytes(2, "little")
    gif2[i + 7:i + 9] = (60000).to_bytes(2, "little")
    _expect_fast_guard(lambda: G.decode_gif(bytes(gif2)))


def test_bmp_dimension_bomb():
    bmp = bytearray(B.encode_bmp_rgb(4, 4, bytes(48)))
    bmp[18:22] = (1 << 20).to_bytes(4, "little")
    bmp[22:26] = (1 << 20).to_bytes(4, "little")
    _expect_fast_guard(lambda: B.decode_bmp(bytes(bmp)))


def test_flac_sample_bomb():
    one = FL.encode_flac([[7] * 32768], blocksize=32768,
                         subframe_mode="constant")
    hdr_end = 4 + 4 + 34
    bomb = one[:hdr_end] + one[hdr_end:] * 2500
    # unlike the header-geometry guards, the FLAC cap legitimately
    # decodes up to MAX_SAMPLES (~2048 constant frames, ~2 s of work)
    # before tripping — bound it loosely so co-tenant load can't flake
    # the test while an unguarded decode (minutes) still fails it
    t0 = time.time()
    with pytest.raises(ValueError, match="guard"):
        FL.decode_flac(bomb)
    assert time.time() - t0 < 15.0, \
        "sample cap must bound decode work"


def test_pdf_flate_bomb_routed():
    bombz = zlib.compress(bytes(80 * 1024 * 1024), 9)
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(bombz)).encode()
           + b" /Filter /FlateDecode >>\nstream\n" + bombz
           + b"\nendstream\nendobj\n%%EOF")
    t0 = time.time()
    text, err = PD.extract_real_pdf_text(pdf)
    assert time.time() - t0 < 5.0
    assert text == "" and err is not None


def test_guards_leave_legitimate_images_alone():
    img = bytes(range(64))
    assert J.decode_jpeg(J.encode_jpeg_gray(8, 8, img)).width == 8
    assert P.decode_png(P.encode_png_gray(8, 8, img)).width == 8
    rgba = bytes(b for v in img for b in (v, v, v, 255))
    assert W.decode_webp(W.encode_webp_lossless(8, 8, rgba)).width == 8
    assert FL.decode_flac(FL.encode_flac([[1, 2, 3, 4]])).n_frames == 4


def test_guard_through_media_decode_stats(spark):
    """The guard surfaces as a routed decode_error column, never an
    executor crash."""
    from docling_graph_spark.operators import multimodal as mm

    bw = W._BitWriter()
    bw.write_bits(16383, 14)
    bw.write_bits(16383, 14)
    bw.write_bits(0, 1)
    bw.write_bits(0, 3)
    payload = b"\x2f" + bw.flush()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    bomb = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    df = spark.createDataFrame([("bomb", bytearray(bomb))],
                               "url string, html binary")
    [row] = mm.media_decode_stats(df).collect()
    assert not row["decoded"]
    assert "guard" in (row["decode_error"] or "")

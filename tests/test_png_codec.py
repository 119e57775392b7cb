"""Stdlib PNG codec: encode→decode roundtrip, defilter correctness against
an independently-constructed filtered stream (all 5 filter types), color
types, and error routing through the media decode operator."""

from __future__ import annotations

import struct
import zlib

import pytest

from docling_graph_spark.kernels.media_stub import decode_media
from docling_graph_spark.kernels.png_codec import (
    PNG_SIGNATURE,
    decode_png,
    encode_png_gray,
)


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def _png(width, height, bit_depth, color_type, raw, interlace=0):
    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type,
                       0, 0, interlace)
    return (PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))


def test_gray_roundtrip():
    w, h = 7, 5
    px = bytes((i * 13 + 5) % 256 for i in range(w * h))
    dec = decode_png(encode_png_gray(w, h, px))
    assert (dec.width, dec.height, dec.channels) == (w, h, 1)
    assert dec.pixels == px


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_defilter_matches_forward_filter(ftype):
    """Forward-filter a known RGB image with one filter type per row, then
    decode: output must equal the original samples (spec-defined inverse)."""
    w, h, ch = 5, 4, 3
    orig = bytes((y * 31 + x * 7 + 3) % 256 for y in range(h)
                 for x in range(w * ch))
    stride = w * ch

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    rows = []
    for y in range(h):
        line = orig[y * stride:(y + 1) * stride]
        prev = orig[(y - 1) * stride:y * stride] if y else bytes(stride)
        filt = bytearray([ftype])
        for i in range(stride):
            a = line[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if ftype == 0:
                v = line[i]
            elif ftype == 1:
                v = line[i] - a
            elif ftype == 2:
                v = line[i] - b
            elif ftype == 3:
                v = line[i] - ((a + b) >> 1)
            else:
                v = line[i] - paeth(a, b, c)
            filt.append(v & 0xFF)
        rows.append(bytes(filt))
    dec = decode_png(_png(w, h, 8, 2, b"".join(rows)))
    assert dec.channels == 3
    assert dec.pixels == orig


def test_rejects_bad_signature_and_truncation():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"NOPE" + b"\x00" * 32)
    good = encode_png_gray(4, 4, bytes(16))
    with pytest.raises(Exception):
        decode_png(good[:20])


def test_formerly_unsupported_depths_now_decode_or_error_loudly():
    # 16-bit gray 2x2 decodes via high-byte reduction (round 4)
    raw = b"".join(b"\x00" + bytes([0xAB, 0x01, 0x7F, 0xFF])
                   for _ in range(2))
    dec = decode_png(_png(2, 2, 16, 0, raw))
    assert dec.bit_depth == 16 and bytes(dec.pixels) == b"\xab\x7f" * 2
    # a malformed interlaced stream (wrong pass layout size) errors
    # loudly instead of raising NotImplementedError (round 4: Adam7 is
    # supported)
    with pytest.raises(ValueError, match="inflated size"):
        decode_png(_png(2, 2, 8, 0, bytes(6), interlace=1))
    with pytest.raises(ValueError, match="16-bit palette"):
        decode_png(_png(2, 2, 16, 3, bytes(10)))


def test_decode_media_routes_png_and_stubs_rest():
    png = encode_png_gray(3, 2, bytes(range(6)))
    dec = decode_media(png, "image/png")
    assert (dec.width, dec.height) == (3, 2)
    # JPEG now has a REAL baseline decoder: corrupt bytes raise a decode
    # error (not NotImplementedError); WebM and MP4 decode for real
    # too, so structurally-empty containers are decode errors while
    # codec-infeasible tracks route by name (see their own suites)
    with pytest.raises(Exception):
        decode_media(b"\xff\xd8\xff-jpeg-ish", "image/jpeg")
    with pytest.raises(ValueError):
        decode_media(b"\x1a\x45\xdf\xa3webm", "video/webm")
    with pytest.raises(ValueError):
        decode_media(b"\x00\x00\x00\x10ftypisom" + bytes(8),
                     "video/mp4")


def test_media_decode_stats_routes_errors(spark):
    from docling_graph_spark.operators.multimodal import media_decode_stats

    png = encode_png_gray(4, 3, bytes(range(12)))
    rows = [("ok", png), ("trunc", png[:15]),
            ("jpeg", b"\xff\xd8\xffJFIF....")]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r.url: r for r in media_decode_stats(df).collect()}
    assert got["ok"].decoded and (got["ok"].width, got["ok"].height) == (4, 3)
    assert got["ok"].pixel_sum == sum(range(12))
    assert not got["trunc"].decoded
    assert not got["jpeg"].decoded
    # garbage after the JPEG magic: the real baseline decoder raises and
    # the header probe finds no SOF either -> routed as malformed
    assert got["jpeg"].decode_error.startswith("malformed")


# ---------------------------------------------------------------------------
# Round 4: Adam7 interlace + sub-8-bit depths
# ---------------------------------------------------------------------------


def test_adam7_interlaced_equals_sequential():
    """The interlaced encoding of an image must decode byte-identical
    to the sequential encoding — all seven passes scattered back."""
    from docling_graph_spark.kernels.png_codec import (
        encode_png_gray_interlaced)
    import random

    rng = random.Random(4)
    for w, h in [(1, 1), (3, 2), (8, 8), (13, 9), (21, 17), (40, 33)]:
        px = bytes(rng.randrange(256) for _ in range(w * h))
        seq = decode_png(encode_png_gray(w, h, px))
        inter = decode_png(encode_png_gray_interlaced(w, h, px))
        assert inter.pixels == seq.pixels == px


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_subbyte_gray_scales_by_bit_replication(depth):
    from docling_graph_spark.kernels.png_codec import encode_png_subbyte
    import random

    rng = random.Random(depth)
    w, h = 19, 7
    samples = [rng.randrange(1 << depth) for _ in range(w * h)]
    dec = decode_png(encode_png_subbyte(w, h, depth, samples))
    scale = 255 // ((1 << depth) - 1)
    assert list(dec.pixels) == [v * scale for v in samples]
    assert (dec.bit_depth, dec.channels) == (depth, 1)


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_subbyte_palette_keeps_indices(depth):
    from docling_graph_spark.kernels.png_codec import encode_png_subbyte
    import random

    rng = random.Random(10 + depth)
    w, h = 11, 6
    samples = [rng.randrange(1 << depth) for _ in range(w * h)]
    pal = bytes(range(3 * (1 << depth)))
    dec = decode_png(encode_png_subbyte(w, h, depth, samples,
                                        color_type=3, palette=pal))
    assert list(dec.pixels) == samples
    assert dec.color_type == 3


def test_subbyte_interlaced_roundtrip():
    from docling_graph_spark.kernels.png_codec import encode_png_subbyte
    import random

    rng = random.Random(77)
    for depth in (1, 2, 4):
        w, h = 23, 14
        samples = [rng.randrange(1 << depth) for _ in range(w * h)]
        plain = decode_png(encode_png_subbyte(w, h, depth, samples))
        inter = decode_png(encode_png_subbyte(w, h, depth, samples,
                                              interlace=True))
        assert inter.pixels == plain.pixels


def test_16bit_depth_high_byte_reduction_all_filters():
    """16-bit rows defilter with a 2*channels byte unit; output is the
    high byte of each sample."""
    import random
    import struct as st
    import zlib as zl

    rng = random.Random(3)
    w, h, ch = 7, 4, 3
    samples = [rng.randrange(65536) for _ in range(w * h * ch)]
    rows_raw = [b"".join(samples[y * w * ch + i].to_bytes(2, "big")
                         for i in range(w * ch)) for y in range(h)]
    # encode rows with the Sub filter to exercise the 6-byte unit
    bpp = 2 * ch
    raw = bytearray()
    for row in rows_raw:
        raw.append(1)
        for i, b in enumerate(row):
            a = row[i - bpp] if i >= bpp else 0
            raw.append((b - a) & 0xFF)

    def chunk(tag, body):
        return (st.pack(">I", len(body)) + tag + body
                + st.pack(">I", zl.crc32(tag + body)))

    from docling_graph_spark.kernels.png_codec import PNG_SIGNATURE

    ihdr = st.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0)
    png = (PNG_SIGNATURE + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zl.compress(bytes(raw)))
           + chunk(b"IEND", b""))
    dec = decode_png(png)
    assert bytes(dec.pixels) == bytes(s >> 8 for s in samples)


# ---------------------------------------------------------------------------
# Round 5: APNG (acTL/fcTL/fdAT) animation compose
# ---------------------------------------------------------------------------

from docling_graph_spark.kernels import png_codec as P


def _solid(w, h, rgba):
    return bytes(rgba) * (w * h)


def test_apng_first_final_and_n_frames():
    f0 = dict(w=8, h=6, rgba=_solid(8, 6, (10, 20, 30, 255)))
    f1 = dict(w=4, h=4, x=2, y=2, rgba=_solid(4, 4, (200, 0, 0, 255)))
    data = P.encode_apng(8, 6, [f0, f1])
    d0 = P.decode_apng(data)
    assert (d0.width, d0.height, d0.channels, d0.n_frames) == (8, 6, 3, 2)
    assert d0.pixels[:3] == bytes((10, 20, 30))
    dF = P.decode_apng(data, frame=-1)
    mid = ((3 * 8) + 3) * 3
    assert dF.pixels[mid:mid + 3] == bytes((200, 0, 0))
    assert dF.pixels[:3] == bytes((10, 20, 30))


def test_apng_dispose_background_and_previous():
    f0 = dict(w=6, h=6, rgba=_solid(6, 6, (50, 50, 50, 255)))
    f1 = dict(w=2, h=2, x=0, y=0, dispose=1,
              rgba=_solid(2, 2, (1, 2, 3, 255)))
    f2 = dict(w=2, h=2, x=4, y=4, rgba=_solid(2, 2, (7, 8, 9, 255)))
    d = P.decode_apng(P.encode_apng(6, 6, [f0, f1, f2]), frame=-1)
    # f1's rect cleared to transparent -> output carries alpha
    assert d.channels == 4
    assert d.pixels[3] == 0                       # (0,0) transparent
    k = (4 * 6 + 4) * 4
    assert d.pixels[k:k + 3] == bytes((7, 8, 9))
    # dispose previous: f1's effect fully undone
    f1p = dict(f1, dispose=2)
    d2 = P.decode_apng(P.encode_apng(6, 6, [f0, f1p, f2]), frame=-1)
    assert d2.channels == 3
    assert d2.pixels[:3] == bytes((50, 50, 50))


def test_apng_blend_over_vs_source():
    base = dict(w=4, h=4, rgba=_solid(4, 4, (100, 100, 100, 255)))
    half_over = dict(w=4, h=4, blend=1,
                     rgba=_solid(4, 4, (200, 0, 0, 128)))
    d = P.decode_apng(P.encode_apng(4, 4, [base, half_over]), frame=-1)
    r = (200 * 128 * 255 + 100 * 255 * 127) // (255 * 255)
    assert d.channels == 3 and d.pixels[0] == r
    half_src = dict(half_over, blend=0)
    d2 = P.decode_apng(P.encode_apng(4, 4, [base, half_src]), frame=-1)
    assert d2.channels == 4
    assert d2.pixels[0:4] == bytes((200, 0, 0, 128))


def test_apng_default_image_is_frame_zero_for_decode_png():
    """The fcTL-before-IDAT layout makes the static image the first
    animation frame — so the existing decode_png path (the image
    pipeline's default) sees frame 0 without knowing about APNG."""
    f0 = dict(w=5, h=4, rgba=_solid(5, 4, (9, 8, 7, 255)))
    f1 = dict(w=5, h=4, rgba=_solid(5, 4, (1, 1, 1, 255)))
    data = P.encode_apng(5, 4, [f0, f1])
    dec = P.decode_png(data)
    assert (dec.width, dec.height, dec.color_type) == (5, 4, 6)
    assert dec.pixels[:4] == bytes((9, 8, 7, 255))


def test_apng_plain_png_is_single_frame():
    plain = P.encode_png_gray(4, 3, bytes(range(12)))
    d = P.decode_apng(plain)
    assert d.n_frames == 1 and (d.width, d.height) == (4, 3)
    assert d.pixels[:3] == bytes((0, 0, 0))


def test_apng_frame_selection_and_guards():
    frames = [dict(w=4, h=4, rgba=_solid(4, 4, (0, 0, 0, 255)))]
    frames += [dict(w=2, h=2, x=0, y=0,
                    rgba=_solid(2, 2, (i, i, i, 255)))
               for i in range(1, 4)]
    data = P.encode_apng(4, 4, frames)
    for i in range(4):
        assert P.decode_apng(data, frame=i).pixels[0] == max(0, i)
    with pytest.raises(ValueError, match="out of range"):
        P.decode_apng(data, frame=9)
    with pytest.raises(ValueError, match="decode guard"):
        P.decode_apng(data, max_frames=2)
    bad = bytearray(data)
    i = bad.index(b"fcTL")
    # push a frame outside the canvas
    bad[i + 4 + 12:i + 4 + 16] = (99).to_bytes(4, "big")
    with pytest.raises(ValueError):
        P.decode_apng(bytes(bad), frame=-1)


# ------------------------------------------------ eXIf orientation (r5)

@pytest.mark.parametrize("orientation", [1, 3, 6, 8])
def test_png_exif_orientation(orientation):
    from docling_graph_spark.kernels.jpeg_codec import orient_pixels
    from docling_graph_spark.kernels.png_codec import (add_png_exif,
                                                       decode_png,
                                                       encode_png_gray)

    w, h = 5, 3
    px = bytes((i * 17) % 256 for i in range(w * h))
    plain = encode_png_gray(w, h, px)
    dec = decode_png(add_png_exif(plain, orientation))
    if orientation == 1:
        assert (dec.width, dec.height, dec.pixels) == (w, h, px)
    else:
        w2, h2, want = orient_pixels(w, h, 1, px, orientation)
        assert (dec.width, dec.height) == (w2, h2)
        assert dec.pixels == want


def test_png_exif_malformed_ignored():
    from docling_graph_spark.kernels.png_codec import (add_png_exif,
                                                       decode_png,
                                                       encode_png_gray)
    import zlib as _z
    import struct as _s

    plain = encode_png_gray(4, 4, bytes(range(16)))
    tagged = bytearray(add_png_exif(plain, 6))
    i = tagged.find(b"eXIf")
    tagged[i + 4:i + 8] = b"\xff\xff\xff\xff"   # corrupt the TIFF body
    dec = decode_png(bytes(tagged))
    assert (dec.width, dec.height) == (4, 4)

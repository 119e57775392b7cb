"""TIFF decoder (kernels/tiff_codec.py): baseline strip subset —
II/MM byte orders, gray/RGB, uncompressed/PackBits, multi-strip —
roundtripped byte-lossless against the fixture encoder."""

from __future__ import annotations

import random

import pytest

from docling_graph_spark.kernels import tiff_codec as T


@pytest.mark.parametrize("ch", [1, 3])
@pytest.mark.parametrize("packbits", [False, True])
@pytest.mark.parametrize("big_endian", [False, True])
def test_roundtrip_matrix(ch, packbits, big_endian):
    rng = random.Random(ch * 4 + packbits * 2 + big_endian)
    for rps in (0, 5):
        w, h = rng.randint(1, 40), rng.randint(1, 40)
        px = bytes(rng.randrange(256) for _ in range(w * h * ch))
        d = T.decode_tiff(T.encode_tiff(w, h, ch, px,
                                        packbits=packbits,
                                        big_endian=big_endian,
                                        rows_per_strip=rps))
        assert (d.width, d.height, d.channels) == (w, h, ch)
        assert d.pixels == px


def test_packbits_compresses_runs_and_decodes():
    runs = bytes([7] * 500 + [9] * 500)
    enc = T.encode_tiff(100, 10, 1, runs, packbits=True)
    plain = T.encode_tiff(100, 10, 1, runs)
    assert len(enc) < len(plain)
    assert T.decode_tiff(enc).pixels == runs


def test_white_is_zero_inverts():
    """Photometric 0 (WhiteIsZero) is mapped to the shared
    black-is-zero convention."""
    px = bytes(range(10))
    data = bytearray(T.encode_tiff(10, 1, 1, px))
    # patch photometric tag value 1 -> 0 (II layout: tag 262)
    i = data.index(b"\x06\x01")  # 262 little-endian
    data[i + 8] = 0
    d = T.decode_tiff(bytes(data))
    assert d.pixels == bytes(255 - v for v in px)


def test_unsupported_and_malformed_route_cleanly():
    with pytest.raises(ValueError, match="byte-order"):
        T.decode_tiff(b"XX\x2a\x00 nope")
    good = bytearray(T.encode_tiff(4, 4, 1, bytes(16)))
    i = good.index(b"\x03\x01")  # compression tag 259 (II)
    good[i + 8] = 4              # CCITT G4 fax
    with pytest.raises(NotImplementedError, match="compression"):
        T.decode_tiff(bytes(good))
    # dimension bomb
    bomb = bytearray(T.encode_tiff(4, 4, 1, bytes(16)))
    j = bomb.index(b"\x00\x01")  # width tag 256
    import struct

    bomb[j + 8:j + 12] = struct.pack("<I", 1 << 20)
    k = bomb.index(b"\x01\x01")  # height tag 257
    bomb[k + 8:k + 12] = struct.pack("<I", 1 << 20)
    with pytest.raises(ValueError, match="guard"):
        T.decode_tiff(bytes(bomb))


def test_decode_media_tiff_integration():
    from docling_graph_spark.kernels.media_stub import (decode_media,
                                                        sniff_media_type)

    px = bytes(range(48))
    data = T.encode_tiff(4, 4, 3, px)
    assert sniff_media_type(data) == "image/tiff"
    dec = decode_media(data, "image/tiff")
    assert (dec.width, dec.height, dec.channels) == (4, 4, 3)
    assert dec.pixels == px


# ---------------------------------------------------------------------------
# Round 5: LZW (+ horizontal-differencing predictor) and tiled layout
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("ch", [1, 3])
@pytest.mark.parametrize("predictor", [1, 2])
@pytest.mark.parametrize("big_endian", [False, True])
def test_lzw_roundtrip_matrix(ch, predictor, big_endian):
    """LZW strips roundtrip byte-lossless on random and smooth content,
    with and without the horizontal predictor, in both byte orders and
    across multi-strip layouts."""
    rng = random.Random(ch * 10 + predictor)
    for w, h in [(7, 5), (33, 17), (64, 48)]:
        noisy = bytes(rng.randrange(256) for _ in range(w * h * ch))
        smooth = bytes(((x // 3 + y * 2) % 256)
                       for y in range(h) for x in range(w * ch))
        for px in (noisy, smooth):
            enc = T.encode_tiff(w, h, ch, px, lzw=True,
                                predictor=predictor,
                                big_endian=big_endian, rows_per_strip=5)
            d = T.decode_tiff(enc)
            assert (d.width, d.height, d.channels) == (w, h, ch)
            assert d.pixels == px


def test_lzw_predictor_compresses_smooth_gradients():
    """The point of predictor 2: gradients become constant residuals
    that LZW then collapses — the combination must beat plain LZW on a
    ramp, and both must decode losslessly."""
    w, h = 128, 64
    px = bytes((x * 2 + y) % 256 for y in range(h) for x in range(w))
    plain = T.encode_tiff(w, h, 1, px, lzw=True)
    pred = T.encode_tiff(w, h, 1, px, lzw=True, predictor=2)
    assert T.decode_tiff(plain).pixels == px
    assert T.decode_tiff(pred).pixels == px
    assert len(pred) < len(plain) < len(px)


def test_lzw_code_width_boundaries_and_table_clear():
    """Random content long enough to push the code width through 10,
    11 and 12 bits and trigger the encoder's mid-stream table clear;
    the early-change thresholds on both sides must agree exactly."""
    rng = random.Random(99)
    w, h = 256, 128                     # 32k random bytes ≈ 15k codes
    px = bytes(rng.randrange(256) for _ in range(w * h))
    d = T.decode_tiff(T.encode_tiff(w, h, 1, px, lzw=True))
    assert d.pixels == px


@pytest.mark.parametrize("tile,kwargs", [
    ((16, 16), {}),
    ((16, 16), dict(lzw=True, predictor=2)),
    ((32, 16), dict(packbits=True, big_endian=True)),
    ((16, 32), dict(lzw=True)),
])
def test_tiled_roundtrip(tile, kwargs):
    """Tiled layout (tags 322-325) with edge tiles zero-padded by the
    encoder and cropped by the decoder, composing with every supported
    compression and the predictor (whose rows are tile-width rows)."""
    rng = random.Random(tile[0] * 100 + tile[1])
    for w, h, ch in [(16, 16, 1), (33, 17, 3), (70, 40, 3)]:
        px = bytes(rng.randrange(256) for _ in range(w * h * ch))
        d = T.decode_tiff(T.encode_tiff(w, h, ch, px, tile=tile,
                                        **kwargs))
        assert (d.width, d.height, d.channels) == (w, h, ch)
        assert d.pixels == px


def test_tile_layout_malformed_routes():
    import struct as st

    enc = bytearray(T.encode_tiff(32, 32, 1, bytes(32 * 32),
                                  tile=(16, 16)))
    i = enc.index(st.pack("<HH", 322, 4))       # TileWidth entry
    enc[i + 8:i + 12] = st.pack("<I", 15)       # not a multiple of 16
    with pytest.raises(ValueError, match="multiples of 16"):
        T.decode_tiff(bytes(enc))


def test_lzw_truncation_routes():
    enc = T.encode_tiff(64, 64, 1, bytes(range(256)) * 16, lzw=True)
    with pytest.raises(ValueError):
        T.decode_tiff(enc[: len(enc) - 40])


@pytest.mark.parametrize("kwargs", [
    dict(planar=True),
    dict(planar=True, lzw=True),
    dict(planar=True, packbits=True, rows_per_strip=5,
         big_endian=True),
    dict(planar=True, predictor=2, lzw=True),
])
def test_planar_configuration_roundtrip(kwargs):
    """Planar config 2 (round 5): strips grouped per sample plane,
    predictor rows single-sample, planes interleaved on decode."""
    rng = random.Random(sum(map(len, kwargs)))
    for w, h, ch in [(9, 7, 3), (33, 17, 3)]:
        px = bytes(rng.randrange(256) for _ in range(w * h * ch))
        d = T.decode_tiff(T.encode_tiff(w, h, ch, px, **kwargs))
        assert (d.width, d.height, d.channels) == (w, h, ch)
        assert d.pixels == px


@pytest.mark.parametrize("kwargs", [
    dict(depth16=True),
    dict(depth16=True, lzw=True, big_endian=True),
    dict(depth16=True, planar=True, lzw=True),
    dict(depth16=True, tile=(16, 16)),
])
def test_16bit_high_byte_reduction_roundtrip(kwargs):
    """16-bit samples (v*257 fixtures) reduce to their high byte,
    honoring byte order, across strip/planar/tiled layouts."""
    rng = random.Random(99)
    for w, h, ch in [(16, 16, 1), (21, 13, 3)]:
        if kwargs.get("tile") and (w % 1):
            continue
        px = bytes(rng.randrange(256) for _ in range(w * h * ch))
        d = T.decode_tiff(T.encode_tiff(w, h, ch, px, **kwargs))
        assert d.pixels == px, kwargs


def test_planar_tiled_and_16bit_predictor_route():
    with pytest.raises(AssertionError):
        T.encode_tiff(16, 16, 3, bytes(16 * 16 * 3), planar=True,
                      tile=(16, 16))
    import struct as st

    enc = bytearray(T.encode_tiff(8, 8, 3, bytes(8 * 8 * 3),
                                  planar=True))
    i = enc.index(st.pack("<HH", 284, 3))
    # keep planar but add tile tags? simpler: flip planar value to 3
    enc[i + 8] = 3
    with pytest.raises(NotImplementedError, match="planar"):
        T.decode_tiff(bytes(enc))


# ---------------------------------------------------------------------------
# New-style JPEG-in-TIFF (compression 7)
# ---------------------------------------------------------------------------

def _gradient(width, height, channels, seed=3):
    rnd = []
    v = seed
    for i in range(width * height * channels):
        v = (v * 73 + 41) % 256
        rnd.append((v + i // channels) % 256)
    return bytes(rnd)


def test_jpeg_in_tiff_gray_strips_match_direct_jpeg_decode():
    from docling_graph_spark.kernels.jpeg_codec import (
        decode_jpeg, encode_jpeg_gray)
    from docling_graph_spark.kernels.tiff_codec import (
        decode_tiff, encode_tiff_jpeg)

    w, h, rps = 24, 30, 10
    px = _gradient(w, h, 1)
    t = encode_tiff_jpeg(w, h, 1, px, rows_per_strip=rps)
    dec = decode_tiff(t)
    assert (dec.width, dec.height, dec.channels) == (w, h, 1)
    want = b"".join(
        decode_jpeg(encode_jpeg_gray(
            w, min(rps, h - y0), px[y0 * w:(y0 + min(rps, h - y0)) * w]
        )).pixels
        for y0 in range(0, h, rps))
    assert dec.pixels == want


@pytest.mark.parametrize("big_endian", [False, True])
def test_jpeg_in_tiff_shared_tables_identical(big_endian):
    from docling_graph_spark.kernels.tiff_codec import (
        _read_ifd, decode_tiff, encode_tiff_jpeg)

    w, h = 16, 24
    px = _gradient(w, h, 1, seed=9)
    inline = encode_tiff_jpeg(w, h, 1, px, rows_per_strip=8,
                              big_endian=big_endian)
    shared = encode_tiff_jpeg(w, h, 1, px, rows_per_strip=8,
                              shared_tables=True, big_endian=big_endian)
    assert decode_tiff(shared).pixels == decode_tiff(inline).pixels
    # the abbreviated layout really hoisted the tables: tag 347 exists
    # and the strips shrank
    import struct as _s
    fmt = ">" if big_endian else "<"
    tags = _read_ifd(shared, fmt, _s.unpack_from(fmt + "I", shared, 4)[0])
    assert 347 in tags and bytes(tags[347])[:2] == b"\xff\xd8"
    assert sum(tags[279]) < sum(
        _read_ifd(inline, fmt,
                  _s.unpack_from(fmt + "I", inline, 4)[0])[279])


def test_jpeg_in_tiff_color_tiled_matches_direct_decode():
    from docling_graph_spark.kernels.jpeg_codec import decode_jpeg
    from docling_graph_spark.kernels.tiff_codec import (
        _rgb_to_ycbcr420, decode_tiff, encode_tiff_jpeg)
    from docling_graph_spark.kernels.jpeg_codec import encode_jpeg_ycbcr420

    w = h = 32
    px = _gradient(w, h, 3)
    t = encode_tiff_jpeg(w, h, 3, px, tile=(16, 16))
    dec = decode_tiff(t)
    assert (dec.width, dec.height, dec.channels) == (w, h, 3)
    # stitch the four tiles decoded directly
    out = bytearray(w * h * 3)
    for ty in (0, 16):
        for tx in (0, 16):
            buf = b"".join(
                px[(ty + r) * w * 3 + tx * 3:
                   (ty + r) * w * 3 + (tx + 16) * 3]
                for r in range(16))
            y, cb, cr = _rgb_to_ycbcr420(16, 16, buf)
            tile = decode_jpeg(encode_jpeg_ycbcr420(16, 16, y, cb, cr))
            for r in range(16):
                dst = (ty + r) * w * 3 + tx * 3
                out[dst:dst + 48] = tile.pixels[r * 48:(r + 1) * 48]
    assert dec.pixels == bytes(out)


def test_jpeg_in_tiff_edge_tiles_cropped():
    from docling_graph_spark.kernels.tiff_codec import (
        decode_tiff, encode_tiff_jpeg)

    w, h = 24, 20                      # edge tiles padded to 16x16
    px = _gradient(w, h, 1, seed=5)
    dec = decode_tiff(encode_tiff_jpeg(w, h, 1, px, tile=(16, 16)))
    assert (dec.width, dec.height, dec.channels) == (w, h, 1)
    assert len(dec.pixels) == w * h


def test_jpeg_in_tiff_mcu_padded_strip_cropped():
    # a strip JPEG taller/wider than its declared TIFF region (real
    # writers round strip dims up to the MCU) is cropped, not rejected
    from docling_graph_spark.kernels.jpeg_codec import (
        decode_jpeg, encode_jpeg_gray)
    from docling_graph_spark.kernels.tiff_codec import (
        _assemble_tiff, decode_tiff)

    w, h = 13, 11                       # decoder must crop from 16x16
    big = _gradient(16, 16, 1, seed=7)
    jpg = encode_jpeg_gray(16, 16, big)
    t = _assemble_tiff(False, [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [8]), (259, 3, [7]),
        (262, 3, [1]), (277, 3, [1]), (278, 4, [h]),
        (273, 4, None), (279, 4, [len(jpg)]),
    ], [jpg])
    dec = decode_tiff(t)
    full = decode_jpeg(jpg).pixels
    want = b"".join(full[r * 16:r * 16 + w] for r in range(h))
    assert (dec.width, dec.height) == (w, h) and dec.pixels == want


def test_jpeg_in_tiff_routes():
    from docling_graph_spark.kernels.tiff_codec import (
        _assemble_tiff, decode_tiff, encode_tiff)

    # old-style JPEG (compression 6) routes with its name
    base = encode_tiff(4, 4, 1, bytes(16))
    old = bytearray(base)
    i = old.find((259).to_bytes(2, "little"))
    old[i + 8] = 6
    with pytest.raises(NotImplementedError, match="old-style"):
        decode_tiff(bytes(old))
    # YCbCr photometric outside JPEG compression routes
    t = _assemble_tiff(False, [
        (256, 4, [4]), (257, 4, [4]), (258, 3, [8, 8, 8]),
        (259, 3, [1]), (262, 3, [6]), (277, 3, [3]), (278, 4, [4]),
        (273, 4, None), (279, 4, [48]),
    ], [bytes(48)])
    with pytest.raises(NotImplementedError, match="YCbCr"):
        decode_tiff(t)
    # garbage strip payload is a routed ValueError, not a crash
    t = _assemble_tiff(False, [
        (256, 4, [4]), (257, 4, [4]), (258, 3, [8]), (259, 3, [7]),
        (262, 3, [1]), (277, 3, [1]), (278, 4, [4]),
        (273, 4, None), (279, 4, [5]),
    ], [b"junk!"])
    with pytest.raises(ValueError, match="SOI"):
        decode_tiff(t)


def test_jpeg_in_tiff_decode_media_integration():
    from docling_graph_spark.kernels.media_stub import (
        decode_media, sniff_media_type)
    from docling_graph_spark.kernels.tiff_codec import encode_tiff_jpeg

    t = encode_tiff_jpeg(20, 12, 1, _gradient(20, 12, 1), rows_per_strip=6,
                         shared_tables=True)
    assert sniff_media_type(t) == "image/tiff"
    dec = decode_media(t, "image/tiff")
    assert dec.width == 20 and dec.height == 12
    assert sum(dec.pixels) > 0


# ---------------------------------------------------------------------------
# Deflate compression (8 / legacy 32946)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("kwargs", [
    dict(deflate=True),
    dict(deflate=True, predictor=2),
    dict(deflate="legacy"),
    dict(deflate=True, tile=(16, 16)),
    dict(deflate=True, predictor=2, big_endian=True, rows_per_strip=5),
])
def test_deflate_roundtrip(kwargs):
    from docling_graph_spark.kernels.tiff_codec import (
        decode_tiff, encode_tiff)

    w, h = 19, 13
    px = bytes((k * 7 + 3) % 256 for k in range(w * h * 3))
    dec = decode_tiff(encode_tiff(w, h, 3, px, **kwargs))
    assert (dec.width, dec.height, dec.channels) == (w, h, 3)
    assert dec.pixels == px


def test_deflate_bounded_inflate_and_truncation():
    import struct
    import zlib

    from docling_graph_spark.kernels.tiff_codec import (
        _assemble_tiff, decode_tiff)

    # a strip whose inflate EXPANDS far beyond the declared segment is
    # clamped to the expected size (bomb guard), not ballooned
    big = zlib.compress(bytes(10_000_000), 9)       # ~10 KB -> 10 MB
    t = _assemble_tiff(False, [
        (256, 4, [4]), (257, 4, [4]), (258, 3, [8]), (259, 3, [8]),
        (262, 3, [1]), (277, 3, [1]), (278, 4, [4]),
        (273, 4, None), (279, 4, [len(big)]),
    ], [big])
    dec = decode_tiff(t)
    assert dec.pixels == bytes(16)
    # a stream that inflates SHORT routes as a ValueError
    small = zlib.compress(bytes(3))
    t = _assemble_tiff(False, [
        (256, 4, [4]), (257, 4, [4]), (258, 3, [8]), (259, 3, [8]),
        (262, 3, [1]), (277, 3, [1]), (278, 4, [4]),
        (273, 4, None), (279, 4, [len(small)]),
    ], [small])
    with pytest.raises(ValueError, match="cover"):
        decode_tiff(t)


# ---------------------------------------------------------------------------
# Multi-page (chained IFDs)
# ---------------------------------------------------------------------------

def test_multipage_roundtrip_and_page_selection():
    from docling_graph_spark.kernels.tiff_codec import (
        decode_tiff, encode_tiff_multipage)

    p0 = bytes((k * 3) % 256 for k in range(8 * 6))
    p1 = bytes((k * 5 + 1) % 256 for k in range(10 * 4 * 3))
    p2 = bytes((k * 7 + 2) % 256 for k in range(5 * 5))
    t = encode_tiff_multipage([
        dict(width=8, height=6, channels=1, pixels=p0),
        dict(width=10, height=4, channels=3, pixels=p1, lzw=True),
        dict(width=5, height=5, channels=1, pixels=p2, packbits=True),
    ])
    d0 = decode_tiff(t)                     # default: first page
    assert (d0.width, d0.height, d0.n_pages) == (8, 6, 3)
    assert d0.pixels == p0
    d1 = decode_tiff(t, page=1)
    assert (d1.width, d1.height, d1.channels) == (10, 4, 3)
    assert d1.pixels == p1
    d2 = decode_tiff(t, page=2)
    assert d2.pixels == p2
    with pytest.raises(ValueError, match="out of range"):
        decode_tiff(t, page=3)


def test_multipage_big_endian_and_single_page_unchanged():
    from docling_graph_spark.kernels.tiff_codec import (
        decode_tiff, encode_tiff, encode_tiff_multipage)

    px = bytes(range(24))
    multi = encode_tiff_multipage(
        [dict(width=4, height=6, channels=1, pixels=px)] * 2,
        big_endian=True)
    d = decode_tiff(multi, page=1)
    assert d.pixels == px and d.n_pages == 2
    # single-page files still report n_pages == 1
    single = decode_tiff(encode_tiff(4, 6, 1, px))
    assert single.n_pages == 1


def test_ifd_chain_loop_guard():
    import struct

    from docling_graph_spark.kernels.tiff_codec import (
        decode_tiff, encode_tiff)

    t = bytearray(encode_tiff(4, 4, 1, bytes(16)))
    # point the next-IFD pointer back at the first IFD (a loop)
    (ifd_off,) = struct.unpack_from("<I", t, 4)
    (count,) = struct.unpack_from("<H", t, ifd_off)
    nxt_at = ifd_off + 2 + 12 * count
    struct.pack_into("<I", t, nxt_at, ifd_off)
    d = decode_tiff(bytes(t))               # must terminate
    assert d.n_pages == 1


def test_oldstyle_jpeg_interchange_stream_decodes():
    from docling_graph_spark.kernels.jpeg_codec import (
        decode_jpeg, encode_jpeg_gray)
    from docling_graph_spark.kernels.tiff_codec import (
        decode_tiff, encode_tiff_oldjpeg)

    g = bytes((i * 7) % 256 for i in range(24 * 16))
    t = encode_tiff_oldjpeg(24, 16, 1, g)
    dec = decode_tiff(t)
    want = decode_jpeg(encode_jpeg_gray(24, 16, g))
    assert (dec.width, dec.height, dec.channels) == (24, 16, 1)
    assert dec.pixels == want.pixels
    # color: pixels equal the embedded interchange stream's decode
    rgb = bytes((i * 5) % 256 for i in range(16 * 16 * 3))
    t2 = encode_tiff_oldjpeg(16, 16, 3, rgb, big_endian=True)
    i = t2.find(b"\xff\xd8")
    assert decode_tiff(t2).pixels == decode_jpeg(t2[i:]).pixels


def test_oldstyle_jpeg_guards():
    import struct

    import pytest

    from docling_graph_spark.kernels.tiff_codec import (
        decode_tiff, encode_tiff_oldjpeg)

    g = bytes(16 * 16)
    t = bytearray(encode_tiff_oldjpeg(16, 16, 1, g))
    # geometry mismatch between IFD and embedded stream is rejected
    w_at = t.find(struct.pack("<HHI", 256, 3, 1))
    struct.pack_into("<H", t, w_at + 8, 17)
    with pytest.raises(ValueError, match="disagrees"):
        decode_tiff(bytes(t))
    # per-strip old-style variant (no tag 513) stays routed by name
    t2 = bytearray(encode_tiff_oldjpeg(16, 16, 1, g))
    at = t2.find(struct.pack("<HH", 513, 4))
    struct.pack_into("<H", t2, at, 519)        # 513 -> 519
    with pytest.raises(NotImplementedError, match="old-style"):
        decode_tiff(bytes(t2))

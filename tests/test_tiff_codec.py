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
    good[i + 8] = 5              # LZW
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

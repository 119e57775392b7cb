"""ICO/favicon decoder (kernels/ico_codec.py): embedded-PNG entries,
DIB entries across bit depths with AND-mask transparency, largest-entry
selection, and the shared bomb guard."""

from __future__ import annotations

import random
import struct

import pytest

from docling_graph_spark.kernels import ico_codec as I


def test_png_entry_roundtrip():
    rng = random.Random(0)
    g = bytes(rng.randrange(256) for _ in range(16 * 16))
    d = I.decode_ico(I.encode_ico_png(16, 16, g))
    assert (d.width, d.height, d.channels) == (16, 16, 1)
    assert d.pixels == g and d.n_images == 1


@pytest.mark.parametrize("bpp", [24, 32])
def test_dib_roundtrip_opaque_and_alpha(bpp):
    rng = random.Random(bpp)
    w, h = 12, 10
    rgba = bytearray()
    for _ in range(w * h):
        rgba += bytes((rng.randrange(256), rng.randrange(256),
                       rng.randrange(256), 255))
    d = I.decode_ico(I.encode_ico_dib(w, h, bytes(rgba), bpp))
    want = bytes(b for i in range(0, len(rgba), 4)
                 for b in rgba[i:i + 3])
    assert d.channels == 3 and d.pixels == want
    # transparency: pixel 1 drops below the mask threshold
    rgba[7] = 0
    d = I.decode_ico(I.encode_ico_dib(w, h, bytes(rgba), bpp))
    assert d.channels == 4
    assert d.pixels[7] == 0 and d.pixels[3] == 255
    assert d.pixels[4:7] == bytes(rgba[4:7])


def test_largest_entry_wins():
    rng = random.Random(2)
    small = I.encode_ico_png(8, 8, bytes(rng.randrange(256)
                                         for _ in range(64)))
    bigpx = bytes(rng.randrange(256) for _ in range(32 * 32))
    big = I.encode_ico_png(32, 32, bigpx)
    # stitch a 2-entry directory: entries then both payloads
    spng, bpng = small[22:], big[22:]
    hdr = b"\x00\x00\x01\x00\x02\x00"
    off1 = 6 + 32
    e1 = struct.pack("<BBBBHHII", 8, 8, 0, 0, 1, 32, len(spng), off1)
    e2 = struct.pack("<BBBBHHII", 32, 32, 0, 0, 1, 32, len(bpng),
                     off1 + len(spng))
    d = I.decode_ico(hdr + e1 + e2 + spng + bpng)
    assert (d.width, d.height, d.n_images) == (32, 32, 2)
    assert d.pixels == bigpx


def test_malformed_and_guard():
    with pytest.raises(ValueError):
        I.decode_ico(b"\x00\x00\x02\x00junk")      # cursor, not icon
    with pytest.raises(ValueError):
        I.decode_ico(b"\x00\x00\x01\x00\x00\x00")  # zero entries
    hdr = b"\x00\x00\x01\x00\x01\x00"
    bomb = struct.pack("<BBBBHHII", 0, 0, 0, 0, 1, 32, 40, 22)
    with pytest.raises(ValueError):
        I.decode_ico(hdr + bomb + bytes(40))       # truncated DIB


def test_decode_media_ico_integration():
    from docling_graph_spark.kernels.media_stub import (decode_media,
                                                        sniff_media_type)

    data = I.encode_ico_png(16, 16, bytes(range(256)))
    assert sniff_media_type(data) == "image/x-icon"
    dec = decode_media(data, "image/x-icon")
    assert (dec.width, dec.height) == (16, 16)
    # the 4-byte magic alone must not claim arbitrary binaries
    assert sniff_media_type(b"\x00\x00\x01\x00\xff\xff rest"
                            ) != "image/x-icon"

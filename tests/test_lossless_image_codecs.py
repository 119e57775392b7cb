"""BMP + GIF codecs (kernels/bmp_codec.py, kernels/gif_codec.py):
byte-lossless roundtrips through real container encodings (BMP row
padding + BGR + bottom-up; GIF variable-width LZW with table growth,
reset at 4095, interlace), plus routed-error behavior through the
media decode seam."""

from __future__ import annotations

import random

import pytest

from docling_graph_spark.kernels import bmp_codec as B
from docling_graph_spark.kernels import gif_codec as G
from docling_graph_spark.kernels.media_stub import (decode_media,
                                                    sniff_media_type)


@pytest.mark.parametrize("w,h", [(1, 1), (7, 3), (33, 17), (4, 20)])
def test_bmp_roundtrip_lossless(w, h):
    rng = random.Random(w * 100 + h)
    rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
    data = B.encode_bmp_rgb(w, h, rgb)
    assert sniff_media_type(data) == "image/bmp"
    dec = decode_media(data, "image/bmp")
    assert (dec.width, dec.height, dec.channels) == (w, h, 3)
    assert dec.pixels == rgb


def test_bmp_topdown_and_paletted():
    # top-down: negative height in the DIB header
    rgb = bytes(range(36))
    data = bytearray(B.encode_bmp_rgb(4, 3, rgb))
    # flip to top-down: height -3, and reorder rows to match
    import struct

    struct.pack_into("<i", data, 22, -3)
    dec = B.decode_bmp(bytes(data))
    rows = [rgb[y * 12:(y + 1) * 12] for y in range(3)]
    assert dec.pixels == b"".join(reversed(rows))


def test_bmp_unsupported_routes():
    data = bytearray(B.encode_bmp_rgb(4, 3, bytes(36)))
    import struct

    # round 5: RLE8 decodes now; mismatched depth for it routes
    struct.pack_into("<I", data, 30, 1)  # BI_RLE8 on a 24-bit image
    with pytest.raises(ValueError, match="mismatch"):
        B.decode_bmp(bytes(data))
    struct.pack_into("<I", data, 30, 3)  # BI_BITFIELDS
    with pytest.raises(NotImplementedError, match="compression"):
        B.decode_bmp(bytes(data))
    with pytest.raises(ValueError):
        B.decode_bmp(b"BMgarbage")


@pytest.mark.parametrize("ncol,inter", [(4, False), (16, False),
                                        (256, False), (8, True)])
def test_gif_roundtrip_lossless(ncol, inter):
    rng = random.Random(ncol)
    w, h = 37, 23
    pal = [bytes((i % 256, (i * 7) % 256, (i * 13) % 256))
           for i in range(ncol)]
    idx = bytes(rng.randrange(ncol) for _ in range(w * h))
    data = G.encode_gif(w, h, pal, idx, interlace=inter)
    assert sniff_media_type(data) == "image/gif"
    dec = decode_media(data, "image/gif")
    assert (dec.width, dec.height, dec.channels) == (w, h, 3)
    assert dec.pixels == b"".join(pal[i] for i in idx)


def test_gif_lzw_table_reset_path():
    """High-entropy 120x120 stream crosses the 4095-entry table reset."""
    w = h = 120
    pal = [bytes((i * 31 % 256, i * 17 % 256, i)) for i in range(8)]
    rng = random.Random(1)
    idx = bytes(rng.randrange(8) for _ in range(w * h))
    dec = G.decode_gif(G.encode_gif(w, h, pal, idx))
    assert dec.pixels == b"".join(pal[i] for i in idx)


def test_gif_malformed_routes():
    with pytest.raises(ValueError):
        G.decode_gif(b"GIF89a\x00")
    good = G.encode_gif(8, 8, [b"\x00\x00\x00", b"\xff\xff\xff"],
                        bytes(64))
    with pytest.raises(Exception):
        G.decode_gif(good[: len(good) // 2])


def test_media_decode_stats_lossless_integration(spark):
    from docling_graph_spark.operators.multimodal import media_decode_stats

    pal = [bytes((i, i, i)) for i in range(4)]
    rows = [
        ("bmp", B.encode_bmp_rgb(3, 2, bytes(range(18)))),
        ("gif", G.encode_gif(4, 2, pal, bytes([0, 1, 2, 3] * 2))),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r.url: r for r in media_decode_stats(df).collect()}
    assert got["bmp"].decoded and got["bmp"].pixel_sum == sum(range(18))
    assert got["gif"].decoded
    assert got["gif"].pixel_sum == sum(3 * i for i in [0, 1, 2, 3] * 2)


# ---------------------------------------------------------------------------
# Round 4: GIF animation (multi-frame compose, disposal, transparency)
# ---------------------------------------------------------------------------


def _anim_palette():
    return [b"\x00\x00\x00", b"\xff\x00\x00", b"\x00\xff\x00",
            b"\x00\x00\xff"]


def test_gif_animation_frame_count_and_first_frame():
    pal = _anim_palette()
    frames = [dict(indices=bytes([1] * 16)),
              dict(indices=bytes([2] * 4), left=1, top=1, w=2, h=2),
              dict(indices=bytes([3] * 4), left=0, top=0, w=2, h=2)]
    data = G.encode_gif_animation(4, 4, pal, frames)
    first = G.decode_gif(data)           # default = first frame, cheap
    assert first.n_frames == 3
    assert set(first.pixels) <= {0, 255}
    assert first.pixels[:3] == b"\xff\x00\x00"


def test_gif_animation_compose_leaves_in_place():
    pal = _anim_palette()
    frames = [dict(indices=bytes([1] * 16)),
              dict(indices=bytes([2] * 4), left=1, top=1, w=2, h=2)]
    data = G.encode_gif_animation(4, 4, pal, frames)
    last = G.decode_gif(data, frame=-1)
    px = [tuple(last.pixels[3 * i:3 * i + 3]) for i in range(16)]
    assert px[0] == (255, 0, 0)          # untouched corner
    assert px[5] == (0, 255, 0)          # patched center
    assert last.n_frames == 2


def test_gif_animation_disposal_background_and_previous():
    pal = _anim_palette()
    # frame1 red full; frame2 green patch with disposal=2 (restore rect
    # to background); frame3 tiny blue dot
    frames = [dict(indices=bytes([1] * 16)),
              dict(indices=bytes([2] * 4), left=1, top=1, w=2, h=2,
                   disposal=2),
              dict(indices=bytes([3]), left=0, top=0, w=1, h=1)]
    data = G.encode_gif_animation(4, 4, pal, frames, bg=0)
    last = G.decode_gif(data, frame=-1)
    px = [tuple(last.pixels[3 * i:3 * i + 3]) for i in range(16)]
    assert px[0] == (0, 0, 255)          # frame3 dot
    assert px[5] == (0, 0, 0)            # green patch restored to bg
    assert px[3] == (255, 0, 0)          # frame1 outside the rect kept
    # disposal=3: the patch is removed entirely, frame1 red restored
    frames[1]["disposal"] = 3
    data = G.encode_gif_animation(4, 4, pal, frames, bg=0)
    last = G.decode_gif(data, frame=-1)
    px = [tuple(last.pixels[3 * i:3 * i + 3]) for i in range(16)]
    assert px[5] == (255, 0, 0)


def test_gif_animation_transparency_preserves_underlying():
    pal = _anim_palette()
    # frame2 full-screen: index 0 transparent, so only the 2s paint
    idx2 = bytes([2 if i % 2 else 0 for i in range(16)])
    frames = [dict(indices=bytes([1] * 16)),
              dict(indices=idx2, transparent=0)]
    data = G.encode_gif_animation(4, 4, pal, frames)
    last = G.decode_gif(data, frame=-1)
    px = [tuple(last.pixels[3 * i:3 * i + 3]) for i in range(16)]
    assert px[0] == (255, 0, 0)          # transparent kept frame1
    assert px[1] == (0, 255, 0)


def test_gif_animation_frame_selection_and_bounds():
    pal = _anim_palette()
    frames = [dict(indices=bytes([1] * 16)),
              dict(indices=bytes([2] * 16)),
              dict(indices=bytes([3] * 16))]
    data = G.encode_gif_animation(4, 4, pal, frames)
    assert G.decode_gif(data, frame=1).pixels[:3] == b"\x00\xff\x00"
    with pytest.raises(ValueError, match="out of range"):
        G.decode_gif(data, frame=7)
    with pytest.raises(ValueError, match="frame decode guard"):
        G.decode_gif(data, frame=-1, max_frames=2)


def test_gif_single_frame_unchanged_by_animation_support():
    """The original single-frame API keeps byte-identical output and
    reports n_frames=1."""
    pal = [bytes((i * 37 % 256, i * 59 % 256, i * 83 % 256))
           for i in range(8)]
    idx = bytes((7 + k) % 8 for k in range(30))
    dec = G.decode_gif(G.encode_gif(6, 5, pal, idx))
    assert dec.n_frames == 1
    want = b"".join(pal[i] for i in idx)
    assert dec.pixels == want


# ---------------------------------------------------------------------------
# Round 5: BMP RLE8 + sub-8-bit palette depths
# ---------------------------------------------------------------------------


def test_bmp_rle8_roundtrip_and_semantics():
    import random

    from docling_graph_spark.kernels import bmp_codec as B

    rng = random.Random(6)
    pal = [(rng.randrange(256), rng.randrange(256), rng.randrange(256))
           for _ in range(8)]
    for w, h in [(7, 5), (23, 11), (64, 3)]:
        idx = bytes(rng.randrange(8) if rng.random() < 0.5 else 3
                    for _ in range(w * h))
        d = B.decode_bmp(B.encode_bmp_rle8(w, h, idx, pal))
        assert (d.width, d.height, d.channels) == (w, h, 3)
        assert d.pixels == b"".join(bytes(pal[i]) for i in idx)


def test_bmp_rle8_delta_and_early_eob_leave_zero_entry():
    import struct as st

    from docling_graph_spark.kernels import bmp_codec as B

    pal = [(9, 9, 9), (200, 10, 10)]
    # hand-built stream: 3 pixels of color 1, delta (2,1), 2 pixels of
    # color 1, EOB — skipped cells stay palette entry 0
    body = bytes((3, 1, 0, 2, 2, 1, 2, 1, 0, 1))
    palb = b"".join(bytes((c[2], c[1], c[0], 0)) for c in pal)
    off = 14 + 40 + len(palb)
    hdr = b"BM" + st.pack("<IHHI", off + len(body), 0, 0, off)
    info = st.pack("<IiiHHIIiiII", 40, 8, 3, 1, 8, 1, len(body),
                   0, 0, 2, 0)
    d = B.decode_bmp(hdr + info + palb + body)
    px = d.pixels
    # bottom row: 3 red then skip; row above (after delta dy=1,dx=2):
    # two red at x=5,6
    bot = px[(2 * 8) * 3:(2 * 8 + 8) * 3]
    assert bot[:9] == bytes((200, 10, 10)) * 3
    assert bot[9:12] == bytes((9, 9, 9))
    mid = px[(1 * 8) * 3:(1 * 8 + 8) * 3]
    assert mid[15:21] == bytes((200, 10, 10)) * 2


def test_bmp_4bit_and_1bit_uncompressed():
    import struct as st

    from docling_graph_spark.kernels import bmp_codec as B

    # 4-bit: 5 pixels wide (odd -> nibble padding), 2 palette colors
    pal = [(1, 2, 3), (250, 251, 252)]
    palb = b"".join(bytes((c[2], c[1], c[0], 0)) for c in pal)
    rows = [[1, 0, 1, 0, 1], [0, 1, 0, 1, 0]]
    body = bytearray()
    for r in reversed(rows):             # bottom-up
        packed = bytearray()
        for i in range(0, len(r), 2):
            hi = r[i]
            lo = r[i + 1] if i + 1 < len(r) else 0
            packed.append((hi << 4) | lo)
        while len(packed) % 4:
            packed.append(0)
        body += packed
    off = 14 + 40 + len(palb)
    hdr = b"BM" + st.pack("<IHHI", off + len(body), 0, 0, off)
    info = st.pack("<IiiHHIIiiII", 40, 5, 2, 1, 4, 0, len(body),
                   0, 0, 2, 0)
    d = B.decode_bmp(hdr + info + palb + bytes(body))
    assert d.pixels[:3] == bytes((250, 251, 252))
    assert d.pixels[3:6] == bytes((1, 2, 3))
    # 1-bit: 10 wide
    rows1 = [1, 0] * 5
    packed = bytearray()
    val = 0
    for i, b in enumerate(rows1):
        val = (val << 1) | b
        if i % 8 == 7:
            packed.append(val)
            val = 0
    packed.append(val << 6)
    while len(packed) % 4:
        packed.append(0)
    off = 14 + 40 + len(palb)
    hdr = b"BM" + st.pack("<IHHI", off + len(packed), 0, 0, off)
    info = st.pack("<IiiHHIIiiII", 40, 10, 1, 1, 1, 0, len(packed),
                   0, 0, 2, 0)
    d = B.decode_bmp(hdr + info + palb + bytes(packed))
    assert d.pixels[:3] == bytes((250, 251, 252))
    assert d.pixels[3:6] == bytes((1, 2, 3))

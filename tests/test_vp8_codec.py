"""VP8 lossy key-frame codec (kernels/vp8_codec.py).

Fixture streams are SELF-DESCRIBING (in-stream §13.4 probability
updates), so encoder/decoder consistency exercises the whole RFC 6386
key-frame machinery: boolean coder, header layout, mode trees, token
tree with categories and the no-EOB-after-zero rule, nonzero entropy
contexts, Y2 WHT, dequant, the exact integer inverse DCT, all intra
predictors (16x16, chroma 8x8, ten B_PRED submodes), skip flags and
token partitions.  The decoder's output must equal the encoder's own
reconstruction BYTE-EXACTLY — any table/context/coder desync anywhere
breaks that.
"""

from __future__ import annotations

import random
import struct

import pytest

from docling_graph_spark.kernels import vp8_codec as V
from docling_graph_spark.kernels import webp_codec as W


def _frame(data: bytes) -> bytes:
    assert data[12:16] == b"VP8 "
    size = struct.unpack("<I", data[16:20])[0]
    return data[20:20 + size]


def test_bool_coder_roundtrip_fuzz():
    rng = random.Random(1)
    for _ in range(60):
        n = rng.randint(1, 500)
        bits = [(rng.randrange(1, 256), rng.randint(0, 1))
                for _ in range(n)]
        be = V._BoolEncoder()
        for p, b in bits:
            be.put(p, b)
        bd = V._BoolDecoder(be.flush())
        for p, b in bits:
            assert bd.get(p) == b


def test_idct_dc_only_property():
    """DC-only blocks reconstruct to the uniform (DC+4)>>3 — the
    closed form the driver oracle replays."""
    for dc in (-100, -9, 0, 7, 40, 513):
        out = V._idct4x4([dc] + [0] * 15)
        assert out == [(dc + 4) >> 3] * 16


def test_fwht_iwht_dc_consistency():
    """Uniform subblock DCs survive the Y2 WHT round trip exactly."""
    for d in (-50, -1, 0, 3, 77):
        y2 = V._fwht4x4([d] * 16)
        assert y2[0] == 8 * d and not any(y2[1:])
        assert V._iwht4x4(y2) == [d] * 16


@pytest.mark.parametrize("mode", ["dc", "v", "h", "tm", "bpred"])
@pytest.mark.parametrize("wh", [(12, 11), (40, 33), (64, 48)])
def test_decode_equals_encoder_reconstruction(mode, wh):
    w, h = wh
    rng = random.Random(w * 100 + h + hash(mode) % 97)
    rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
    y, u, v = V.rgb_to_yuv420(w, h, rgb)
    frame, recon = V.encode_vp8(w, h, y, u, v, qi=25, mode=mode,
                                return_recon=True)
    dec = V.decode_vp8(frame)
    assert (dec.width, dec.height) == (w, h)
    assert dec.y == recon.y and dec.u == recon.u and dec.v == recon.v


@pytest.mark.parametrize("n_parts", [1, 2, 4, 8])
def test_token_partitions(n_parts):
    rng = random.Random(n_parts)
    w, h = 48, 64                        # 4 MB rows -> rows spread
    rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
    y, u, v = V.rgb_to_yuv420(w, h, rgb)
    frame, recon = V.encode_vp8(w, h, y, u, v, qi=30, mode="dc",
                                n_parts=n_parts, return_recon=True)
    assert V.decode_vp8(frame).y == recon.y


def test_solid_gray_closed_form():
    """The driver-oracle discipline: for a solid gray g in a single
    cropped MB, y0 = RGBToY(g), DC pred = 128 (127/129 borders),
    resid = y0-128, forward DC = 8*resid exactly, Y2 carries 8*DC,
    and reconstruction replays in closed form through quantization."""
    for g, qi in [(150, 4), (96, 0), (203, 12), (128, 7)]:
        w, h = 13, 9
        rgb = bytes([g] * (w * h * 3))
        y, u, v = V.rgb_to_yuv420(w, h, rgb)
        assert set(u) == {128} and set(v) == {128}
        y0 = V.rgb_to_y(g, g, g)
        q = V._resolve_quants(qi, 0, 0, 0, 0, 0)
        resid = y0 - 128
        dc = 8 * resid                   # per-subblock forward DC
        w2 = 8 * dc                      # Y2 DC (uniform WHT)
        n = (2 * abs(w2) + q.y2_dc) // (2 * q.y2_dc) \
            * (1 if w2 >= 0 else -1)
        # inverse WHT of DC-only Y2: every subblock DC = (W+3)>>3
        sub_dc = (n * q.y2_dc + 3) >> 3
        recon_y = max(0, min(255, 128 + ((sub_dc + 4) >> 3)))
        dec = V.decode_vp8(_frame(V.encode_webp_lossy(w, h, rgb,
                                                      qi=qi)))
        assert set(dec.y) == {recon_y}, (g, qi, set(dec.y), recon_y)
        assert set(dec.u) == {128} and set(dec.v) == {128}
        # and the RGB comes back through the fixed-point conversion
        r, gg, b = V.yuv_to_rgb(recon_y, 128, 128)
        px = W.decode_webp(V.encode_webp_lossy(w, h, rgb, qi=qi)).pixels
        assert set(px[0::3]) == {r}
        assert set(px[1::3]) == {gg}
        assert set(px[2::3]) == {b}


def test_near_lossless_at_qi0_on_smooth_content():
    w, h = 48, 48
    rgb = bytes(((x + y) // 2 % 200 + 20)
                for y in range(h) for x in range(w) for _ in range(3))
    y, u, v = V.rgb_to_yuv420(w, h, rgb)
    dec = V.decode_vp8(_frame(V.encode_webp_lossy(w, h, rgb, qi=0)))
    assert max(abs(a - b) for a, b in zip(dec.y, y)) <= 4


def test_lossy_compression_actually_compresses():
    """Smooth content at a coarse quantizer must code well below raw
    size (skip flags + EOB-heavy tokens engage)."""
    w, h = 64, 64
    rgb = bytes([90] * (w * h * 3))
    data = V.encode_webp_lossy(w, h, rgb, qi=40)
    assert len(data) < w * h // 2       # vs 12k raw


def test_chroma_subsampling_shape_and_color():
    """A chroma-heavy (red) frame: 4:2:0 planes carry the color and
    the upsampled RGB round-trips through the fixed-point conversion
    to something red-dominated."""
    w, h = 24, 18
    rgb = bytes([200, 30, 40] * (w * h))
    data = V.encode_webp_lossy(w, h, rgb, qi=4)
    dec = V.decode_vp8(_frame(data))
    assert len(dec.u) == 12 * 9 and len(dec.v) == 12 * 9
    out = W.decode_webp(data)
    rs = sum(out.pixels[0::3]) / (w * h)
    gs = sum(out.pixels[1::3]) / (w * h)
    assert rs > 180 and gs < 60


def test_decode_webp_dispatches_vp8():
    rgb = bytes([150] * (20 * 14 * 3))
    d = W.decode_webp(V.encode_webp_lossy(20, 14, rgb, qi=4))
    assert (d.width, d.height, d.channels) == (20, 14, 3)
    assert set(d.pixels) == {150}


def test_malformed_and_guard_routes():
    rgb = bytes([10] * (16 * 16 * 3))
    data = V.encode_webp_lossy(16, 16, rgb, qi=4)
    frame = bytearray(_frame(data))
    with pytest.raises(ValueError, match="too short"):
        V.decode_vp8(frame[:6])
    bad = bytearray(frame)
    bad[3] = 0x00                        # break the start code
    with pytest.raises(ValueError, match="start code"):
        V.decode_vp8(bytes(bad))
    with pytest.raises(NotImplementedError, match="interframe"):
        V.decode_vp8(bytes([frame[0] | 1]) + bytes(frame[1:]))
    # dimension bomb: huge w/h in the fixed header, gated pre-alloc
    bomb = bytearray(frame)
    bomb[6:10] = struct.pack("<HH", 16383, 16383)
    with pytest.raises(ValueError, match="guard"):
        V.decode_vp8(bytes(bomb))
    # truncated first partition
    with pytest.raises(ValueError, match="truncated"):
        V.decode_vp8(bytes(frame[:12]))


def test_default_prob_stream_decodes_identically():
    """A stream carrying NO coefficient-probability updates (the shape
    every real encoder emits) token-decodes under the RFC 6386 §13.5
    default table to exactly the same pixels as the fully
    self-describing form of the same content (round-5 third
    continuation: the former interop gap is closed —
    kernels/vp8_tables.py, verified bit-exact against libwebp in
    tests/parity/test_vp8_libwebp.py)."""
    import random

    rng = random.Random(5)
    w, h = 33, 17
    rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
    y, u, v = V.rgb_to_yuv420(w, h, rgb)
    a = V.encode_vp8(w, h, y, u, v, qi=12, mode="bpred",
                     default_probs=True)
    b = V.encode_vp8(w, h, y, u, v, qi=12, mode="bpred")
    da, db = V.decode_vp8(a), V.decode_vp8(b)
    assert (da.y, da.u, da.v) == (db.y, db.u, db.v)
    assert a != b                     # genuinely different bitstreams


def test_loop_filter_applies_and_is_stable():
    """Non-zero filter levels decode (no longer routed); the filter is
    a no-op on uniform content and changes pixels on hard block edges;
    simple and normal types both roundtrip structurally."""
    import random

    rng = random.Random(9)
    w = h = 32
    flat = bytes([128]) * (w * h * 3)
    y, u, v = V.rgb_to_yuv420(w, h, flat)
    f0 = V.encode_vp8(w, h, y, u, v, qi=0)
    f1 = V.encode_vp8(w, h, y, u, v, qi=0, filter_level=40)
    d0, d1 = V.decode_vp8(f0), V.decode_vp8(f1)
    assert d0.y == d1.y               # uniform content: filter no-op
    # a gentle gradient coarsely quantized leaves small block-edge
    # steps — exactly what the filter exists to smooth (hard random
    # edges exceed the edge limits and are correctly left alone)
    rgb = bytes(min(255, (x + yy) // 2) for yy in range(h)
                for x in range(w) for _ in range(3))
    y, u, v = V.rgb_to_yuv420(w, h, rgb)
    plain = V.decode_vp8(V.encode_vp8(w, h, y, u, v, qi=90))
    moved = 0
    for fl, ft, sharp in ((25, 0, 0), (63, 0, 7), (30, 1, 0)):
        dec = V.decode_vp8(V.encode_vp8(w, h, y, u, v, qi=90,
                                        filter_level=fl,
                                        filter_type=ft,
                                        sharpness=sharp))
        assert (dec.width, dec.height) == (w, h)
        moved += dec.y != plain.y
    assert moved >= 2                 # filtering moved pixels


def test_corruption_fuzz_never_hangs_or_crashes_unrouted():
    """Random single-byte corruptions must either decode (arithmetic
    streams tolerate many flips) or raise a routed error — never hang
    or escape with an unexpected exception type."""
    rng = random.Random(11)
    rgb = bytes(rng.randrange(256) for _ in range(32 * 32 * 3))
    frame = bytearray(_frame(V.encode_webp_lossy(32, 32, rgb, qi=20)))
    for _ in range(40):
        mut = bytearray(frame)
        mut[rng.randrange(len(mut))] ^= 1 << rng.randrange(8)
        try:
            V.decode_vp8(bytes(mut))
        except (ValueError, NotImplementedError, IndexError):
            pass


# ---------------------------------------------------------------------------
# Round 5: ALPH alpha channel on lossy stills and animation frames
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("method", [0, 1])
@pytest.mark.parametrize("filt", [0, 1, 2, 3])
def test_alph_roundtrip_all_modes(method, filt):
    rng = random.Random(method * 10 + filt)
    for w, h in [(7, 5), (20, 13)]:
        alpha = bytes(rng.randrange(256) for _ in range(w * h))
        body = W.encode_alpha(alpha, w, h, method=method, filt=filt)
        assert W.decode_alpha(body, w, h) == alpha


def test_lossy_still_with_alpha():
    rng = random.Random(2)
    w, h = 20, 14
    rgb = bytes([120] * (w * h * 3))
    alpha = bytes(rng.randrange(256) for _ in range(w * h))
    d = W.decode_webp(V.encode_webp_lossy(w, h, rgb, qi=4,
                                          alpha=alpha,
                                          alpha_filter=2))
    assert d.channels == 4
    assert bytes(d.pixels[3::4]) == alpha        # lossless alpha
    assert set(d.pixels[0::4]) == {120}
    # fully-opaque alpha collapses back to 3 channels
    d2 = W.decode_webp(V.encode_webp_lossy(
        w, h, rgb, qi=4, alpha=bytes([255] * (w * h))))
    assert d2.channels == 3


def test_anim_lossy_frame_with_alpha_blends():
    """A half-transparent lossy frame over a solid base must alpha-
    blend through the animation compositor (the ALPH sub-chunk path
    inside ANMF)."""
    base = dict(w=16, h=16,
                rgba=bytes((100, 100, 100, 255)) * 256)
    lossy_rgb = bytes([200] * (16 * 16 * 3))
    inner = V.encode_webp_lossy(16, 16, lossy_rgb, qi=4,
                                alpha=bytes([128] * 256))[12:]
    # hand-assemble the ANMF with the VP8X+ALPH+VP8 sub-chunks
    data = W.encode_webp_anim(16, 16, [base, dict(
        w=16, h=16, rgba=bytes((0, 0, 0, 255)) * 256)])
    i = data.rindex(b"ANMF")
    size = struct.unpack("<I", data[i + 4:i + 8])[0]
    fctl = data[i + 8:i + 8 + 16]
    new_body = fctl + inner
    new_chunk = b"ANMF" + struct.pack("<I", len(new_body)) + new_body
    if len(new_body) & 1:
        new_chunk += b"\x00"
    patched = data[:i] + new_chunk
    patched = patched[:4] + struct.pack(
        "<I", len(patched) - 8) + patched[8:]
    d = W.decode_webp(patched, frame=-1)
    # lossy gray 200 decodes exactly for solid frames; blend at a=128:
    v = (200 * 128 * 255 + 100 * 255 * 127) // (255 * 255)
    assert d.pixels[0] == v

"""WebP lossless (VP8L) codec (kernels/webp_codec.py).

The decoder is validated byte-lossless against the fixture encoder on
random content through EVERY feature path: literal-only streams,
simple and normal prefix codes, the subtract-green / predictor /
color-indexing transforms (all pixel-bundling widths), the hashed
color cache, LZ77 runs, and the trivial meta-prefix entropy image.
VP8L is lossless, so every encoding variant of one image must decode
to identical pixels.
"""

from __future__ import annotations

import numpy as np
import pytest

from docling_graph_spark.kernels import webp_codec as W


def _rgba(arr: np.ndarray) -> bytes:
    h, w, _ = arr.shape
    out = bytearray()
    for y in range(h):
        for x in range(w):
            out += bytes(arr[y, x])
    return bytes(out)


def _rgb_of(rgba: bytes) -> bytes:
    return bytes(b for i in range(0, len(rgba), 4) for b in rgba[i:i + 3])


CONFIGS = [
    dict(),
    dict(subtract_green=True),
    dict(predictor_mode=1),
    dict(predictor_mode=2),
    dict(predictor_mode=7),
    dict(subtract_green=True, predictor_mode=2),
    dict(cache_bits=4),
    dict(use_rle=True),
    dict(trivial_meta=True),
    dict(subtract_green=True, predictor_mode=7, cache_bits=6,
         use_rle=True, trivial_meta=True),
]


@pytest.mark.parametrize("cfg", CONFIGS,
                         ids=["+".join(sorted(c)) or "plain"
                              for c in CONFIGS])
def test_roundtrip_every_feature_path(cfg):
    rng = np.random.default_rng(sum(map(len, cfg)) + len(cfg))
    for _ in range(3):
        w, h = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        arr = rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)
        arr[:, :, 3] = 255
        raw = _rgba(arr)
        if cfg.get("use_rle"):
            flat = bytearray(raw)
            for s in range(0, len(flat) - 64, 160):
                flat[s:s + 64] = flat[s:s + 4] * 16
            raw = bytes(flat)
        dec = W.decode_webp(W.encode_webp_lossless(w, h, raw, **cfg))
        assert (dec.width, dec.height, dec.channels) == (w, h, 3)
        assert dec.pixels == _rgb_of(raw)


def test_alpha_channel_roundtrip():
    rng = np.random.default_rng(9)
    w, h = 11, 7
    raw = bytes(rng.integers(0, 256, size=w * h * 4, dtype=np.uint8))
    dec = W.decode_webp(W.encode_webp_lossless(w, h, raw))
    assert dec.channels == 4
    assert dec.pixels == raw


@pytest.mark.parametrize("n_colors", [2, 4, 13, 100, 256])
def test_palette_roundtrip_all_bundle_widths(n_colors):
    """Color-indexing transform: delta-coded palette plus sub-byte
    pixel bundling (8/4/2 pixels per byte for <= 2/4/16 colors)."""
    rng = np.random.default_rng(n_colors)
    w, h = int(rng.integers(5, 30)), int(rng.integers(5, 30))
    pal = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, size=(h, w))
    arr = np.zeros((h, w, 4), dtype=np.uint8)
    arr[:, :, :3] = pal[idx]
    arr[:, :, 3] = 255
    raw = _rgba(arr)
    dec = W.decode_webp(W.encode_webp_lossless(w, h, raw, palette=True))
    assert dec.pixels == _rgb_of(raw)


def test_single_pixel_and_single_row():
    for w, h in [(1, 1), (37, 1), (1, 23)]:
        raw = bytes((i * 7) % 256 for i in range(w * h * 3))
        rgba = bytes(b for i in range(0, len(raw), 3)
                     for b in (*raw[i:i + 3], 255))
        dec = W.decode_webp(W.encode_webp_lossless(w, h, rgba))
        assert (dec.width, dec.height) == (w, h)
        assert dec.pixels == raw


def test_smooth_content_predictor_compresses():
    """The predictor transform should beat literal-only on a gradient
    — evidence the residual path actually engages."""
    w, h = 64, 64
    rgba = bytearray()
    for y in range(h):
        for x in range(w):
            v = (x * 2 + y) % 256
            rgba += bytes((v, v, v, 255))
    plain = W.encode_webp_lossless(w, h, bytes(rgba))
    pred = W.encode_webp_lossless(w, h, bytes(rgba), predictor_mode=1,
                                  use_rle=True)
    assert W.decode_webp(plain).pixels == W.decode_webp(pred).pixels
    assert len(pred) < len(plain)


def test_lossy_and_malformed_route_cleanly():
    import struct

    vp8 = (b"RIFF" + struct.pack("<I", 16) + b"WEBP"
           + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4)
    # round 5: VP8 dispatches to the real key-frame decoder; a 4-byte
    # chunk is malformed, not unsupported
    with pytest.raises(ValueError, match="too short"):
        W.decode_webp(vp8)
    with pytest.raises(ValueError):
        W.decode_webp(b"RIFX not a webp")
    good = W.encode_webp_lossless(4, 4, bytes(64))
    with pytest.raises(Exception):
        W.decode_webp(good[: len(good) // 2])


def test_vp8x_container_with_vp8l_chunk():
    """Extended containers wrap the VP8L chunk behind a VP8X header —
    the chunk walk must find it."""
    import struct

    inner = W.encode_webp_lossless(6, 5, bytes(range(120)) + bytes(
        255 for _ in range(0)) if False else bytes(
            b for i in range(30) for b in (i, i * 2 % 256, i * 3 % 256,
                                           255)))
    vp8l_chunk = inner[12:]
    vp8x = b"VP8X" + struct.pack("<I", 10) + bytes(10)
    payload = b"WEBP" + vp8x + vp8l_chunk
    data = b"RIFF" + struct.pack("<I", len(payload)) + payload
    dec = W.decode_webp(data)
    assert (dec.width, dec.height) == (6, 5)


def test_decode_media_webp_integration():
    from docling_graph_spark.kernels.media_stub import (decode_media,
                                                        sniff_media_type)

    raw = bytes(b for i in range(24) for b in (i, 255 - i, i * 5 % 256,
                                               255))
    data = W.encode_webp_lossless(6, 4, raw)
    assert sniff_media_type(data) == "image/webp"
    dec = decode_media(data, "image/webp")
    assert (dec.width, dec.height, dec.channels) == (6, 4, 3)
    assert len(dec.pixels) == 72


def test_prefix_encode_inverts_prefix_value():
    for v in list(range(1, 200)) + [4096, 99999, 1 << 19]:
        code, extra, nbits = W._prefix_encode(v)
        br = W._BitReader(bytes(
            (extra >> (8 * i)) & 0xFF for i in range(4)))
        # replay: feed extra bits LSB-first as _prefix_value reads them
        bw = W._BitWriter()
        bw.write_bits(extra, nbits)
        br = W._BitReader(bw.flush() or b"\x00")
        assert W._prefix_value(br, code) == v


def test_corruption_fuzz_never_hangs():
    """Single-byte corruption of a valid VP8L stream must terminate
    quickly — loud error or bounded decode, never a hang/OOM (the
    pixel loop is bounded by the guarded header geometry)."""
    import time

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(20, 20, 4), dtype=np.uint8)
    arr[:, :, 3] = 255
    good = W.encode_webp_lossless(20, 20, _rgba(arr), cache_bits=4,
                                  use_rle=True)
    t0 = time.time()
    for pos in range(12, len(good), 5):
        bad = bytearray(good)
        bad[pos] ^= 0x24
        try:
            W.decode_webp(bytes(bad))
        except Exception:
            pass
    assert time.time() - t0 < 30


def test_uniform_histogram_channel_roundtrip():
    """A channel whose histogram is uniform over all 256 values gives
    every symbol code length 8, so the code-length code collapses to a
    single used symbol; the decoder's zero-bit special form reads no
    per-symbol bits and the encoder must emit none (round-5 ADVICE: the
    old encoder wrote 1 bit/symbol and desynced with 'invalid VP8L
    prefix code')."""
    w, h = 16, 16
    rgba = bytearray()
    for i in range(w * h):
        rgba += bytes((i % 256, 0, 0, 255))     # red cycles 0..255
    dec = W.decode_webp(W.encode_webp_lossless(w, h, bytes(rgba)))
    assert dec.channels == 3
    assert all(dec.pixels[3 * i] == i % 256 for i in range(w * h))


def test_all_channels_uniform_histogram_roundtrip():
    """Every channel simultaneously uniform — all four prefix codes hit
    the single-clc-symbol form at once."""
    w, h = 16, 16
    rgba = bytes(bytearray(
        b for i in range(w * h)
        for b in (i % 256, (i * 7) % 256, (i * 13) % 256, 255)))
    dec = W.decode_webp(W.encode_webp_lossless(w, h, rgba))
    for i in range(w * h):
        assert dec.pixels[3 * i:3 * i + 3] == bytes(
            (i % 256, (i * 7) % 256, (i * 13) % 256))


# ---------------------------------------------------------------------------
# Round 5: animated WebP (VP8X + ANIM/ANMF)
# ---------------------------------------------------------------------------


def _solid_rgba(w, h, rgba):
    return bytes(rgba) * (w * h)


def test_anim_first_frame_default_and_n_frames():
    f0 = dict(w=8, h=6, rgba=_solid_rgba(8, 6, (10, 20, 30, 255)))
    f1 = dict(w=4, h=4, x=2, y=2,
              rgba=_solid_rgba(4, 4, (200, 0, 0, 255)))
    data = W.encode_webp_anim(8, 6, [f0, f1])
    d = W.decode_webp(data)
    assert d.n_frames == 2 and (d.width, d.height) == (8, 6)
    assert d.channels == 3 and set(
        d.pixels[i:i + 3] for i in range(0, len(d.pixels), 3)
    ) == {bytes((10, 20, 30))}


def test_anim_final_state_composes_offsets():
    f0 = dict(w=8, h=6, rgba=_solid_rgba(8, 6, (10, 20, 30, 255)))
    f1 = dict(w=4, h=4, x=2, y=2,
              rgba=_solid_rgba(4, 4, (200, 0, 0, 255)))
    d = W.decode_webp(W.encode_webp_anim(8, 6, [f0, f1]), frame=-1)
    px = d.pixels
    assert px[0:3] == bytes((10, 20, 30))            # outside patch
    mid = ((3 * 8) + 3) * 3
    assert px[mid:mid + 3] == bytes((200, 0, 0))     # inside patch


def test_anim_dispose_to_background():
    # ANIM bg is [B,G,R,A] byte order, i.e. u32le 0xAARRGGBB with B in
    # the low byte: 0xFF336699 -> B=0x99 G=0x66 R=0x33 A=0xFF
    bg = 0xFF336699
    f0 = dict(w=4, h=4, x=0, y=0, dispose=True,
              rgba=_solid_rgba(4, 4, (1, 2, 3, 255)))
    f1 = dict(w=2, h=2, x=4, y=4,
              rgba=_solid_rgba(2, 2, (7, 8, 9, 255)))
    d = W.decode_webp(W.encode_webp_anim(8, 8, [f0, f1], bg=bg),
                      frame=-1)
    px = d.pixels
    # frame 0's rect was restored to background after showing
    assert px[0:3] == bytes((0x33, 0x66, 0x99))
    k = (4 * 8 + 4) * 3
    assert px[k:k + 3] == bytes((7, 8, 9))


def test_anim_alpha_blend_vs_overwrite():
    base = dict(w=4, h=4, rgba=_solid_rgba(4, 4, (100, 100, 100, 255)))
    half = dict(w=4, h=4, rgba=_solid_rgba(4, 4, (200, 0, 0, 128)))
    blended = W.decode_webp(
        W.encode_webp_anim(4, 4, [base, dict(half)]), frame=-1)
    # alpha-over: r = (200*128*255 + 100*255*127) // (255*255)
    r = (200 * 128 * 255 + 100 * 255 * 127) // (255 * 255)
    assert blended.pixels[0] == r and blended.channels == 3
    over = W.decode_webp(
        W.encode_webp_anim(4, 4, [base, dict(half, blend=False)]),
        frame=-1)
    assert over.channels == 4
    assert over.pixels[0:4] == bytes((200, 0, 0, 128))


def test_anim_lossy_vp8_frames_compose():
    f0 = dict(w=16, h=16, lossy=True, qi=4,
              rgba=_solid_rgba(16, 16, (150, 150, 150, 255)))
    f1 = dict(w=4, h=4, x=8, y=8,
              rgba=_solid_rgba(4, 4, (0, 255, 0, 255)))
    d = W.decode_webp(W.encode_webp_anim(16, 16, [f0, f1]), frame=-1)
    assert d.n_frames == 2
    assert d.pixels[0:3] == bytes((150, 150, 150))   # lossy gray exact
    k = (9 * 16 + 9) * 3
    assert d.pixels[k:k + 3] == bytes((0, 255, 0))


def test_anim_frame_selection_and_guards():
    frames = [dict(w=4, h=4, rgba=_solid_rgba(4, 4, (i, i, i, 255)))
              for i in range(5)]
    data = W.encode_webp_anim(4, 4, frames)
    for i in range(5):
        assert W.decode_webp(data, frame=i).pixels[0] == i
    with pytest.raises(ValueError, match="out of range"):
        W.decode_webp(data, frame=5)
    with pytest.raises(ValueError, match="decode guard"):
        W.decode_webp(data, max_frames=3)
    # geometry-mismatch route: corrupt a frame's declared width
    bad = bytearray(data)
    i = bad.index(b"ANMF")
    bad[i + 8 + 6] ^= 0x01
    with pytest.raises(ValueError):
        W.decode_webp(bytes(bad), frame=-1)


def test_anim_canvas_bomb_guard():
    f0 = dict(w=4, h=4, rgba=_solid_rgba(4, 4, (0, 0, 0, 255)))
    data = bytearray(W.encode_webp_anim(4, 4, [f0]))
    i = data.index(b"VP8X")
    data[i + 8 + 4:i + 8 + 10] = (16383).to_bytes(3, "little") * 2
    with pytest.raises(ValueError, match="decode guard"):
        W.decode_webp(bytes(data))


def test_anim_through_media_decode_stats(spark):
    from docling_graph_spark.operators.multimodal import (
        media_decode_stats)

    f0 = dict(w=6, h=5, rgba=_solid_rgba(6, 5, (9, 9, 9, 255)))
    f1 = dict(w=2, h=2, x=2, y=2,
              rgba=_solid_rgba(2, 2, (255, 255, 255, 255)))
    data = W.encode_webp_anim(6, 5, [f0, f1])
    df = spark.createDataFrame([("a", bytearray(data))],
                               "url string, html binary")
    row = media_decode_stats(df).collect()[0]
    assert row.decoded and row.media_type == "image/webp"
    assert (row.width, row.height) == (6, 5)
    assert row.pixel_sum == 6 * 5 * 27                # first frame


# ------------------------------------------------ EXIF orientation (r5)

@pytest.mark.parametrize("orientation", [1, 2, 3, 4, 5, 6, 7, 8])
def test_webp_exif_orientation_matches_jpeg_semantics(orientation):
    from docling_graph_spark.kernels.jpeg_codec import orient_pixels
    from docling_graph_spark.kernels.webp_codec import (add_webp_exif,
                                                        decode_webp,
                                                        encode_webp_lossless)

    w, h = 5, 3
    rgba = bytes(b for i in range(w * h)
                 for b in ((i * 7) % 256, (i * 11) % 256,
                           (i * 13) % 256, 255))
    plain = encode_webp_lossless(w, h, rgba)
    base = decode_webp(plain)
    tagged = decode_webp(add_webp_exif(plain, orientation))
    if orientation <= 1:
        assert (tagged.width, tagged.height) == (w, h)
        assert tagged.pixels == base.pixels
    else:
        w2, h2, px = orient_pixels(base.width, base.height,
                                   base.channels, base.pixels,
                                   orientation)
        assert (tagged.width, tagged.height) == (w2, h2)
        assert tagged.pixels == px
    if orientation in (5, 6, 7, 8):
        assert (tagged.width, tagged.height) == (h, w)


def test_webp_rotated_transcode_pairs_in_phash():
    # the use case: an EXIF-rotated WebP of physically-rotated pixels
    # hashes identically to the upright original
    from docling_graph_spark.kernels.jpeg_codec import orient_pixels
    from docling_graph_spark.kernels.phash import phash63
    from docling_graph_spark.kernels.webp_codec import (add_webp_exif,
                                                        decode_webp,
                                                        encode_webp_lossless)

    w = h = 32
    lum = bytes((x * 3 + y * 5) % 256 for y in range(h) for x in range(w))
    rgba = bytes(b for v in lum for b in (v, v, v, 255))
    upright = decode_webp(encode_webp_lossless(w, h, rgba))
    # physically rotate 90 CCW so that Exif 6 (rotate 90 CW) restores it
    w2, h2, rot = orient_pixels(w, h, 4, rgba, 8)
    rotated = add_webp_exif(encode_webp_lossless(w2, h2, rot), 6)
    restored = decode_webp(rotated)
    assert (restored.width, restored.height) == (w, h)

    assert phash63(restored.pixels, w, h, restored.channels) \
        == phash63(upright.pixels, w, h, upright.channels)


def test_webp_exif_malformed_is_ignored():
    from docling_graph_spark.kernels.webp_codec import (add_webp_exif,
                                                        decode_webp,
                                                        encode_webp_lossless)
    import struct as _s

    plain = encode_webp_lossless(3, 3, bytes(range(27)) + bytes(9))
    tagged = bytearray(add_webp_exif(plain, 6))
    i = tagged.find(b"EXIF")
    tagged[i + 8:i + 14] = b"broken"        # corrupt the Exif prefix
    dec = decode_webp(bytes(tagged))
    assert (dec.width, dec.height) == (3, 3)  # orientation ignored

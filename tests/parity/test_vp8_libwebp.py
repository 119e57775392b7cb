"""Bit-exact VP8 interop parity against the system libwebp.

Both directions of the real-world contract:

* ENCODE direction — streams from `kernels/vp8_codec.encode_vp8`
  (every intra mode, odd geometries, 1-8 partitions, normal AND
  simple loop filter across levels/sharpness, explicit AND
  default-table coefficient probabilities) must decode in libwebp to
  EXACTLY the YUV planes this decoder produces.
* DECODE direction — real `WebPEncodeRGB` output (default filtering,
  default probabilities, trellis token choices this encoder never
  makes) must decode here to EXACTLY libwebp's own YUV planes.

This is the functional proof behind `kernels/vp8_tables.py` (the RFC
6386 §13.4/§13.5/§11.5 constants transcribed from libwebp's .rodata
by tools/extract_vp8_tables.py) and the §15 loop-filter
implementation.  Skipped when the shared library is absent — the
production decoder never depends on it.
"""

import ctypes
import math
import random
import struct

import pytest

from docling_graph_spark.kernels.vp8_codec import (
    decode_vp8, encode_vp8, rgb_to_yuv420)

try:
    _LW = ctypes.CDLL("libwebp.so.7")
    _LW.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    _LW.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    _LW.WebPEncodeRGB.restype = ctypes.c_size_t
    _LW.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
except OSError:                                   # pragma: no cover
    _LW = None

pytestmark = pytest.mark.skipif(_LW is None,
                                reason="libwebp not available")


def _lw_decode_yuv(webp: bytes):
    w = ctypes.c_int()
    h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)()
    v = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int()
    uvs = ctypes.c_int()
    y = _LW.WebPDecodeYUV(webp, len(webp), ctypes.byref(w),
                          ctypes.byref(h), ctypes.byref(u),
                          ctypes.byref(v), ctypes.byref(stride),
                          ctypes.byref(uvs))
    assert y, "libwebp refused the stream"
    W, H, S, US = w.value, h.value, stride.value, uvs.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    yp = bytes((ctypes.c_uint8 * (S * H)).from_address(
        ctypes.addressof(y.contents)))
    Y = b"".join(yp[r * S:r * S + W] for r in range(H))
    ub = bytes((ctypes.c_uint8 * (US * ch)).from_address(
        ctypes.addressof(u.contents)))
    vb = bytes((ctypes.c_uint8 * (US * ch)).from_address(
        ctypes.addressof(v.contents)))
    U = b"".join(ub[r * US:r * US + cw] for r in range(ch))
    V = b"".join(vb[r * US:r * US + cw] for r in range(ch))
    _LW.WebPFree(y)
    return W, H, Y, U, V


def _wrap(frame: bytes) -> bytes:
    riff = b"WEBP" + b"VP8 " + struct.pack("<I", len(frame)) + frame \
        + (b"\x00" if len(frame) & 1 else b"")
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _assert_parity(frame: bytes) -> None:
    mine = decode_vp8(frame)
    W, H, Y, U, V = _lw_decode_yuv(_wrap(frame))
    assert (W, H) == (mine.width, mine.height)
    assert Y == mine.y and U == mine.u and V == mine.v


@pytest.mark.parametrize("mode", ["dc", "v", "h", "tm", "bpred"])
def test_encode_direction_modes_and_geometries(mode):
    rng = random.Random(11)
    for (w, h, qi, parts) in ((16, 16, 0, 1), (33, 17, 8, 4),
                              (48, 32, 55, 2), (63, 63, 37, 8)):
        rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
        y, u, v = rgb_to_yuv420(w, h, rgb)
        _assert_parity(encode_vp8(w, h, y, u, v, qi=qi, mode=mode,
                                  n_parts=parts))


@pytest.mark.parametrize("flt", [(5, 0, 0), (20, 0, 0), (35, 3, 0),
                                 (40, 0, 0), (63, 7, 0), (14, 5, 0),
                                 (12, 0, 1), (40, 2, 1), (63, 0, 1)])
@pytest.mark.parametrize("default_probs", [False, True])
def test_encode_direction_loop_filter(flt, default_probs):
    fl, sharp, ft = flt
    rng = random.Random(13 + fl + ft)
    w, h = 48, 33
    rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
    y, u, v = rgb_to_yuv420(w, h, rgb)
    for mode in ("dc", "bpred"):
        _assert_parity(encode_vp8(w, h, y, u, v, qi=30, mode=mode,
                                  filter_level=fl, sharpness=sharp,
                                  filter_type=ft,
                                  default_probs=default_probs))


@pytest.mark.parametrize("w,h,q", [(48, 48, 75), (64, 48, 40),
                                   (33, 29, 90), (128, 96, 60),
                                   (17, 63, 25)])
def test_decode_direction_real_webpencode_streams(w, h, q):
    rng = random.Random(w * h + q)
    smooth = bytes(int(127 + 120 * math.sin((x + yy * 2 + c * 7) / 9))
                   % 256 for yy in range(h) for x in range(w)
                   for c in range(3))
    noisy = bytes(rng.randrange(256) for _ in range(w * h * 3))
    for rgb in (smooth, noisy):
        out = ctypes.POINTER(ctypes.c_uint8)()
        n = _LW.WebPEncodeRGB(rgb, w, h, w * 3, float(q),
                              ctypes.byref(out))
        assert n
        webp = bytes((ctypes.c_uint8 * n).from_address(
            ctypes.addressof(out.contents)))
        _LW.WebPFree(out)
        i = webp.find(b"VP8 ")
        frame = webp[i + 8:]
        mine = decode_vp8(frame)
        W, H, Y, U, V = _lw_decode_yuv(webp)
        assert (W, H) == (mine.width, mine.height) == (w, h)
        assert Y == mine.y and U == mine.u and V == mine.v

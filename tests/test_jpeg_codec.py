"""Baseline JPEG codec (kernels/jpeg_codec.py).

The decoder is validated against an INDEPENDENT replay of the T.81
baseline math: forward DCT -> quantize (what the fixture encoder chose)
-> dequantize -> float IDCT -> pinned rounding — written here with its
own block loop, not the codec's.  If the Huffman coding, DC prediction,
zigzag order, byte stuffing or MCU layout were wrong anywhere, decoded
pixels could not reproduce the replay bit-for-bit on random content.
"""

from __future__ import annotations

import numpy as np
import pytest

from docling_graph_spark.kernels import jpeg_codec as J


def _replay_plane(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    bh, bw = -(-h // 8) * 8, -(-w // 8) * 8
    p = J._pad_edge(plane, bh, bw)
    out = np.zeros((bh, bw))
    for y0 in range(0, bh, 8):
        for x0 in range(0, bw, 8):
            zz = J._fdct_quant(p[y0:y0 + 8, x0:x0 + 8], q)
            blk = np.zeros(64, dtype=np.int64)
            blk[J.ZIGZAG] = zz
            dq = blk.reshape(8, 8) * q
            r = J._A.T @ dq.astype(float) @ J._A + 128.0
            out[y0:y0 + 8, x0:x0 + 8] = np.clip(np.floor(r + 0.5), 0, 255)
    return out


@pytest.mark.parametrize("w,h,seed", [(8, 8, 0), (21, 13, 7), (64, 48, 1),
                                      (1, 1, 2), (17, 9, 3)])
def test_gray_roundtrip_matches_independent_replay(w, h, seed):
    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, (h, w)).astype(np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg_gray(w, h, px.tobytes()))
    assert (dec.width, dec.height, dec.channels) == (w, h, 1)
    got = np.frombuffer(dec.pixels, dtype=np.uint8).reshape(h, w)
    exp = _replay_plane(px, J.QUANT_LUM)[:h, :w].astype(np.uint8)
    assert np.array_equal(got, exp)


@pytest.mark.parametrize("w,h,seed", [(16, 16, 0), (19, 11, 5),
                                      (33, 18, 9)])
def test_color_420_roundtrip_matches_independent_replay(w, h, seed):
    rng = np.random.RandomState(seed)
    cw, ch = -(-w // 2), -(-h // 2)
    y = rng.randint(0, 256, (h, w)).astype(np.uint8)
    cb = rng.randint(0, 256, (ch, cw)).astype(np.uint8)
    cr = rng.randint(0, 256, (ch, cw)).astype(np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg_ycbcr420(
        w, h, y.tobytes(), cb.tobytes(), cr.tobytes()))
    assert (dec.width, dec.height, dec.channels) == (w, h, 3)
    got = np.frombuffer(dec.pixels, dtype=np.uint8).reshape(h, w, 3)
    # independent replay: per-plane block codec at MCU-padded sizes,
    # nearest upsample of chroma, JFIF float color convert
    mcux, mcuy = -(-w // 16), -(-h // 16)
    yp = _replay_plane(J._pad_edge(y, mcuy * 16, mcux * 16), J.QUANT_LUM)
    cbp = _replay_plane(J._pad_edge(cb, mcuy * 8, mcux * 8),
                        J.QUANT_CHROM)
    crp = _replay_plane(J._pad_edge(cr, mcuy * 8, mcux * 8),
                        J.QUANT_CHROM)
    cbu = np.repeat(np.repeat(cbp, 2, axis=0), 2, axis=1)[:h, :w]
    cru = np.repeat(np.repeat(crp, 2, axis=0), 2, axis=1)[:h, :w]
    yy = yp[:h, :w]
    r = yy + 1.402 * (cru - 128.0)
    g = yy - 0.344136 * (cbu - 128.0) - 0.714136 * (cru - 128.0)
    b = yy + 1.772 * (cbu - 128.0)
    exp = np.clip(np.floor(np.stack([r, g, b], -1) + 0.5),
                  0, 255).astype(np.uint8)
    assert np.array_equal(got, exp)


def test_solid_gray_closed_form_every_level():
    for v in range(0, 256, 5):
        dec = J.decode_jpeg(J.encode_jpeg_gray(10, 9, bytes([v] * 90)))
        x = v - 128
        mag = (2 * abs(64 * x) + 128) // 256
        q = mag if x >= 0 else -mag
        p = max(0, min(255, 128 + 2 * q))
        assert set(dec.pixels) == {p}, (v, set(dec.pixels), p)


def test_multiblock_dc_prediction():
    """A two-level image spanning several MCUs: DC prediction must carry
    across blocks (left half dark, right half bright)."""
    w, h = 32, 8
    px = np.zeros((h, w), dtype=np.uint8)
    px[:, 16:] = 200
    dec = J.decode_jpeg(J.encode_jpeg_gray(w, h, px.tobytes()))
    got = np.frombuffer(dec.pixels, dtype=np.uint8).reshape(h, w)
    exp = _replay_plane(px, J.QUANT_LUM).astype(np.uint8)
    assert np.array_equal(got, exp)
    assert got[0, 0] < 50 and got[0, 31] > 150


def test_malformed_and_unsupported_route_cleanly():
    good = J.encode_jpeg_gray(8, 8, bytes(64))
    with pytest.raises(Exception):
        J.decode_jpeg(good[:len(good) // 2])      # truncated entropy
    with pytest.raises(ValueError):
        J.decode_jpeg(b"nope")                     # no SOI
    # progressive SOF2 -> explicit NotImplementedError, process named
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(NotImplementedError, match="baseline"):
        J.decode_jpeg(prog)


def test_decode_media_jpeg_integration():
    from docling_graph_spark.kernels.media_stub import (decode_media,
                                                        sniff_media_type)

    data = J.encode_jpeg_gray(6, 4, bytes(range(24)))
    assert sniff_media_type(data) == "image/jpeg"
    dec = decode_media(data, "image/jpeg")
    assert (dec.width, dec.height, dec.channels) == (6, 4, 1)
    assert len(dec.pixels) == 24

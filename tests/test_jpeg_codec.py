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
    # lossless SOF3 -> explicit NotImplementedError, process named
    lossless = good.replace(b"\xff\xc0", b"\xff\xc3", 1)
    with pytest.raises(NotImplementedError, match="0xFFC3"):
        J.decode_jpeg(lossless)
    # a SOF2 header on a baseline single-scan stream is malformed
    # progressive (full-band "DC" scan) and must error, not crash
    bad_prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError):
        J.decode_jpeg(bad_prog)


def test_decode_media_jpeg_integration():
    from docling_graph_spark.kernels.media_stub import (decode_media,
                                                        sniff_media_type)

    data = J.encode_jpeg_gray(6, 4, bytes(range(24)))
    assert sniff_media_type(data) == "image/jpeg"
    dec = decode_media(data, "image/jpeg")
    assert (dec.width, dec.height, dec.channels) == (6, 4, 1)
    assert len(dec.pixels) == 24


# ---------------------------------------------------------------------------
# Progressive (Annex G) decoding
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("w,h,seed", [(16, 16, 0), (37, 23, 1),
                                      (8, 8, 2), (57, 41, 3), (5, 9, 4)])
def test_progressive_gray_equals_baseline(w, h, seed):
    """The progressive encoder carries the same quantized coefficients
    as the baseline encoder, so both encodings of one image must decode
    to identical pixels — this drives every Annex-G path: DC successive
    approximation, AC spectral selection with EOB runs/ZRL, and two
    levels of AC refinement with correction bits."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8).tobytes()
    base = J.decode_jpeg(J.encode_jpeg_gray(w, h, img))
    prog = J.decode_jpeg(J.encode_jpeg_gray_progressive(w, h, img))
    assert (prog.width, prog.height, prog.channels) == (w, h, 1)
    assert prog.pixels == base.pixels


def test_progressive_gray_smooth_content_long_eob_runs():
    """Blocky smooth content leaves most AC bands empty, producing
    multi-block EOB runs (EOBn, n >= 1) that the decoder must skip
    while still consuming refinement correction bits."""
    w, h = 88, 64
    yy, xx = np.mgrid[0:h, 0:w]
    img = ((xx // 19) * 31 + (yy // 17) * 23 + 90).astype(np.uint8)
    base = J.decode_jpeg(J.encode_jpeg_gray(w, h, img.tobytes()))
    prog = J.decode_jpeg(J.encode_jpeg_gray_progressive(w, h,
                                                        img.tobytes()))
    assert prog.pixels == base.pixels


@pytest.mark.parametrize("ri", [1, 3, 7])
def test_progressive_restart_markers(ri):
    """DRI/RSTn inside progressive scans reset the DC predictors and
    the EOB run at every interval."""
    rng = np.random.default_rng(ri)
    w, h = 41, 33
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8).tobytes()
    base = J.decode_jpeg(J.encode_jpeg_gray(w, h, img))
    prog = J.decode_jpeg(
        J.encode_jpeg_gray_progressive(w, h, img, restart_interval=ri))
    assert prog.pixels == base.pixels


@pytest.mark.parametrize("w,h,seed", [(16, 16, 0), (34, 22, 1),
                                      (9, 13, 2), (48, 31, 3)])
def test_progressive_color_420_equals_baseline(w, h, seed):
    """Interleaved DC scans (MCU order over 2x2 luma + subsampled
    chroma) plus non-interleaved per-component AC scans over the A.2.2
    block grids must reproduce the baseline pixels exactly."""
    rng = np.random.default_rng(seed)
    cw, ch = -(-w // 2), -(-h // 2)
    y = rng.integers(0, 256, size=h * w, dtype=np.uint8).tobytes()
    cb = rng.integers(0, 256, size=ch * cw, dtype=np.uint8).tobytes()
    cr = rng.integers(0, 256, size=ch * cw, dtype=np.uint8).tobytes()
    base = J.decode_jpeg(J.encode_jpeg_ycbcr420(w, h, y, cb, cr))
    prog = J.decode_jpeg(
        J.encode_jpeg_ycbcr420_progressive(w, h, y, cb, cr))
    assert (prog.width, prog.height, prog.channels) == (w, h, 3)
    assert prog.pixels == base.pixels


def test_progressive_truncation_errors_cleanly():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(24, 24), dtype=np.uint8).tobytes()
    data = J.encode_jpeg_gray_progressive(24, 24, img)
    with pytest.raises(Exception):
        J.decode_jpeg(data[:len(data) * 2 // 3])


def test_progressive_through_decode_media():
    from docling_graph_spark.kernels.media_stub import (decode_media,
                                                        sniff_media_type)

    img = bytes([200]) * (16 * 8)
    data = J.encode_jpeg_gray_progressive(16, 8, img)
    assert sniff_media_type(data) == "image/jpeg"
    dec = decode_media(data, "image/jpeg")
    base = decode_media(J.encode_jpeg_gray(16, 8, img), "image/jpeg")
    assert dec.pixels == base.pixels


# ---------------------------------------------------------------------------
# Round 5: EXIF orientation (tag 274 in the APP1 TIFF IFD)
# ---------------------------------------------------------------------------


def test_exif_orientation_applied_like_browsers():
    import numpy as np

    w, h = 16, 8
    img = bytes((x * 16) % 256 for y in range(h) for x in range(w))
    base = J.encode_jpeg_gray(w, h, img)
    a1 = np.frombuffer(J.decode_jpeg(base).pixels,
                       np.uint8).reshape(h, w)
    cases = {1: a1, 2: a1[:, ::-1], 3: a1[::-1, ::-1], 4: a1[::-1],
             5: a1.transpose(), 6: np.rot90(a1, k=-1),
             # 7 (transverse: row0=right, col0=bottom) = transpose+180
             7: a1.transpose()[::-1, ::-1], 8: np.rot90(a1, k=1)}
    for o, expect in cases.items():
        tagged = base[:2] + J.make_exif_app1(o, big_endian=o % 2 == 0) \
            + base[2:]
        assert J.exif_orientation(tagged) == o
        d = J.decode_jpeg(tagged)
        got = np.frombuffer(d.pixels, np.uint8).reshape(d.height,
                                                        d.width)
        assert np.array_equal(got, expect), o


def test_exif_orientation_makes_rotated_copies_near_dups(spark):
    """The dedup payoff: a 90°-rotated-with-metadata copy hashes like
    the upright original once orientation is applied."""
    import numpy as np

    from docling_graph_spark.operators.multimodal import image_near_dup

    rng = np.random.default_rng(3)
    low = rng.integers(30, 226, size=(6, 8)).astype(float)
    yy = np.clip(np.linspace(0, 5, 48), 0, 5)
    xx = np.linspace(0, 7, 48)
    rows = np.array([np.interp(xx, np.arange(8), low[int(round(v))])
                     for v in yy])
    img = np.clip(rows, 0, 255).astype(np.uint8)
    base = J.encode_jpeg_gray(48, 48, img.tobytes())
    # physically rotate the pixels, then tag the file to rotate BACK
    rot = np.ascontiguousarray(np.rot90(img, k=1))   # 90 CCW pixels
    rot_jpg = J.encode_jpeg_gray(48, 48, rot.tobytes())
    tagged = rot_jpg[:2] + J.make_exif_app1(6) + rot_jpg[2:]
    df = spark.createDataFrame(
        [("up", bytearray(base)), ("rot", bytearray(tagged))],
        "url string, html binary")
    pairs = image_near_dup(df, max_hamming=8).collect()
    assert len(pairs) == 1 and pairs[0]["hamming"] <= 6


def test_malformed_exif_never_fails_decode():
    base = J.encode_jpeg_gray(8, 8, bytes(range(64)))
    bad = base[:2] + b"\xff\xe1\x00\x0aExif\x00\x00XX" + base[2:]
    assert J.exif_orientation(bad) == 1
    assert J.decode_jpeg(bad).width == 8

"""Perceptual image hashing (kernels/phash.py +
operators/multimodal.image_hashes / image_near_dup).

Contracts:
1. EXACT INTEGER MATH — the hash of a pixel buffer is reproducible
   from a naive reimplementation of luma/downsample/DCT/median (the
   property the SQL oracle of the image_phash driver stage relies on).
2. PERCEPTUAL ROBUSTNESS — lossy re-encoding (baseline AND progressive
   JPEG) of smooth content moves the hash by ~0 bits; unrelated images
   sit tens of bits apart; uniform brightness shifts are invisible
   (DC excluded).
3. BANDED COMPLETENESS — image_near_dup's 9-band x 7-bit LSH join
   finds EXACTLY the pairs brute-force Hamming <= 8 finds (pigeonhole:
   d <= 8 < 9 bands forces one identical band).
"""

from __future__ import annotations

import numpy as np
import pytest

from docling_graph_spark.kernels import jpeg_codec as jc
from docling_graph_spark.kernels import phash as P


def _smooth(seed: int, w: int = 64, h: int = 48) -> np.ndarray:
    rng = np.random.default_rng(seed)
    low = rng.integers(30, 226, size=(6, 8)).astype(float)
    yy = np.clip(np.linspace(0, 5, h), 0, 5)
    xx = np.linspace(0, 7, w)
    rows = np.array([np.interp(xx, np.arange(8), low[int(round(v))])
                     for v in yy])
    return np.clip(rows, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# exact-math replay
# ---------------------------------------------------------------------------


def test_luma_matches_integer_bt601():
    px = bytes([10, 200, 55, 0, 0, 255])  # two RGB pixels
    lum = P.luma_plane(px, 2, 1, 3)
    assert lum == [[(299 * 10 + 587 * 200 + 114 * 55) // 1000,
                    (114 * 255) // 1000]]


@pytest.mark.parametrize("w,h", [(32, 32), (64, 48), (17, 23), (8, 8)])
def test_downsample_matches_naive_box_average(w, h):
    rng = np.random.default_rng(w * h)
    img = rng.integers(0, 256, size=(h, w)).astype(int).tolist()
    got = P.downsample(img, 32, 32)
    for yy in (0, 15, 31):
        for xx in (0, 7, 31):
            y0, y1 = yy * h // 32, max((yy + 1) * h // 32, yy * h // 32 + 1)
            x0, x1 = xx * w // 32, max((xx + 1) * w // 32, xx * w // 32 + 1)
            s = sum(img[y][x] for y in range(y0, y1)
                    for x in range(x0, x1))
            assert got[yy][xx] == s // ((y1 - y0) * (x1 - x0))


def test_phash_matches_naive_replay():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(32, 32)).astype(int).tolist()
    raw = bytes(v for row in img for v in row)
    got = P.phash63(raw, 32, 32, 1)
    # naive replay: full float-free integer DCT from the same table
    T = P.DCT_TABLE
    coefs = []
    for u in range(8):
        for v in range(8):
            if u == 0 and v == 0:
                continue
            c = sum(T[u][y] * T[v][x] * img[y][x]
                    for y in range(32) for x in range(32))
            coefs.append(c)
    med = sorted(coefs)[31]
    want = 0
    for c in coefs:
        want = (want << 1) | (1 if c > med else 0)
    assert got == want
    assert 0 <= got < (1 << 63)


# ---------------------------------------------------------------------------
# perceptual behavior
# ---------------------------------------------------------------------------


def test_brightness_shift_is_invisible():
    img = _smooth(0)
    shifted = np.clip(img.astype(int) + 17, 0, 255).astype(np.uint8)
    a = P.phash63(img.tobytes(), 64, 48, 1)
    b = P.phash63(shifted.tobytes(), 64, 48, 1)
    # DC excluded and AC coefficients unchanged by a uniform shift
    # (up to clipping, which this fixture avoids)
    assert P.hamming(a, b) == 0


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_jpeg_reencode_near_and_cross_far(seed):
    img = _smooth(seed)
    h0 = P.phash63(img.tobytes(), 64, 48, 1)
    dec_b = jc.decode_jpeg(jc.encode_jpeg_gray(64, 48, img.tobytes()))
    dec_p = jc.decode_jpeg(
        jc.encode_jpeg_gray_progressive(64, 48, img.tobytes()))
    assert P.hamming(h0, P.phash63(dec_b.pixels, 64, 48, 1)) <= 4
    assert P.hamming(h0, P.phash63(dec_p.pixels, 64, 48, 1)) <= 4
    other = _smooth(seed + 100)
    assert P.hamming(h0, P.phash63(other.tobytes(), 64, 48, 1)) >= 12


def test_dhash_gradient_semantics():
    # brightness strictly increasing rightward -> every bit set
    img = np.tile(np.arange(0, 256, 8, dtype=np.uint8), (8, 1))
    h = P.dhash64(img.tobytes(), 32, 8, 1)
    assert h == (1 << 64) - 1
    # decreasing -> no bit set
    h2 = P.dhash64(img[:, ::-1].copy().tobytes(), 32, 8, 1)
    assert h2 == 0


def test_phash_bands_cover_all_63_bits():
    bands = P.phash_bands((1 << 63) - 1)
    assert len(bands) == 7  # legacy default split
    got = 0
    for i, v in bands:
        got |= v << (9 * i)
    assert got == (1 << 63) - 1


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------


def _bmp_pages(spark, imgs):
    from docling_graph_spark.kernels.bmp_codec import encode_bmp_rgb

    rows = []
    for name, arr in imgs:
        h, w = arr.shape
        rgb = bytes(b for v in arr.flatten() for b in (v, v, v))
        rows.append((name, bytearray(encode_bmp_rgb(w, h, rgb))))
    return spark.createDataFrame(rows, "url string, html binary")


def test_image_hashes_operator_decodes_and_routes(spark):
    from docling_graph_spark.operators import multimodal as mm

    img = _smooth(5, 32, 32)
    pages = _bmp_pages(spark, [("a", img)])
    extra = spark.createDataFrame(
        [("txt", bytearray(b"<html><p>not an image</p></html>")),
         ("bad", bytearray(b"\xff\xd8\xff\xe0broken"))],
        "url string, html binary")
    out = {r["url"]: r for r in
           mm.image_hashes(pages.unionByName(extra)).collect()}
    assert out["a"]["decoded"] and out["a"]["phash"] >= 0
    assert out["a"]["phash"] == P.phash63(
        bytes(b for v in img.flatten() for b in (v, v, v)), 32, 32, 3)
    assert not out["txt"]["decoded"]
    assert out["txt"]["decode_error"] == "not an image"
    assert not out["bad"]["decoded"]
    assert out["bad"]["decode_error"].startswith("undecodable")


def test_image_near_dup_matches_brute_force(spark):
    from docling_graph_spark.operators import multimodal as mm

    imgs = []
    hashes = {}
    for s in range(6):
        arr = _smooth(s, 40, 40)
        imgs.append((f"o{s}", arr))
        hashes[f"o{s}"] = P.phash63(
            bytes(b for v in arr.flatten() for b in (v, v, v)), 40, 40, 3)
        near = np.clip(arr.astype(int) + 11, 0, 255).astype(np.uint8)
        imgs.append((f"n{s}", near))
        hashes[f"n{s}"] = P.phash63(
            bytes(b for v in near.flatten() for b in (v, v, v)),
            40, 40, 3)
    pages = _bmp_pages(spark, imgs)
    got = {(r["url_a"], r["url_b"]): r["hamming"]
           for r in mm.image_near_dup(pages, max_hamming=8).collect()}
    import itertools

    want = {}
    for a, b in itertools.combinations(sorted(hashes), 2):
        d = P.hamming(hashes[a], hashes[b])
        if d <= 8:
            want[(a, b)] = d
    assert got == want
    assert all((f"n{s}", f"o{s}") in got or (f"o{s}", f"n{s}") in got
               for s in range(6))


def test_image_near_dup_threshold_guard(spark):
    from docling_graph_spark.operators import multimodal as mm

    pages = _bmp_pages(spark, [("a", _smooth(0, 32, 32))])
    with pytest.raises(ValueError, match="complete"):
        mm.image_near_dup(pages, max_hamming=9)


def test_cross_format_transcode_dedup(spark):
    """The actual transcode-dedup use case (round 5): ONE image stored
    as BMP, as a requantized baseline JPEG, as lossless VP8L WebP and
    as lossy VP8 WebP must all pair with each other through
    image_near_dup (VP8L at Hamming 0; the lossy transcodes at small
    distances), while an unrelated image pairs with none of them."""
    from docling_graph_spark.kernels.bmp_codec import encode_bmp_rgb
    from docling_graph_spark.kernels.vp8_codec import encode_webp_lossy
    from docling_graph_spark.kernels.webp_codec import (
        encode_webp_lossless)
    from docling_graph_spark.operators import multimodal as mm

    img = _smooth(7, 48, 48)
    rgb = bytes(b for v in img.flatten() for b in (v, v, v))
    rgba = bytes(b for v in img.flatten() for b in (v, v, v, 255))
    other = _smooth(321, 48, 48)
    orgb = bytes(b for v in other.flatten() for b in (v, v, v))
    rows = [
        ("bmp", bytearray(encode_bmp_rgb(48, 48, rgb))),
        ("jpg", bytearray(jc.encode_jpeg_gray(48, 48, img.tobytes()))),
        ("vp8l", bytearray(encode_webp_lossless(48, 48, rgba))),
        ("vp8", bytearray(encode_webp_lossy(48, 48, rgb, qi=6))),
        ("far", bytearray(encode_bmp_rgb(48, 48, orgb))),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    pairs = {(min(r["url_a"], r["url_b"]), max(r["url_a"], r["url_b"])):
             r["hamming"]
             for r in mm.image_near_dup(pages, max_hamming=8).collect()}
    assert pairs[("bmp", "vp8l")] == 0           # lossless transcode
    assert pairs[("bmp", "jpg")] <= 6            # requantized
    assert pairs[("bmp", "vp8")] <= 6            # lossy transcode
    assert pairs[("jpg", "vp8l")] <= 6
    assert ("bmp", "far") not in pairs and ("far", "jpg") not in pairs
    assert ("far", "vp8l") not in pairs and ("far", "vp8") not in pairs

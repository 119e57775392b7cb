"""Perceptual image hashing over decoded pixels — exact integer math.

Multimodal training corpora dedup IMAGES, not just text: the same photo
re-encoded (different JPEG quality, format transcode, metadata strip)
hashes to different bytes but to the same *perceptual* fingerprint.
With the real pixel decoders in place (kernels/{jpeg,png,gif,bmp}_codec),
this module computes the two standard fingerprints:

* ``phash63`` — DCT perceptual hash: integer luma -> 32x32 integer
  area-average downsample -> exact int64 two-stage DCT-II against a
  fixed-point cosine table (round(cos * 2^14)) -> 8x8 low band -> the
  63 non-DC coefficients bit-compared against their integer median.
  63 bits so the hash is a NON-NEGATIVE int64 in both engines.
* ``dhash64`` — gradient hash: 33x32 downsample, bit = left < right
  per adjacent column pair (64 bits, returned as two 32-bit halves
  packed into a Python int, masked into signed-int64 range by the
  caller if stored).

EVERY step is integer-exact (floor divisions, integer sums, integer
median = the 32nd smallest of 63), so a SQL engine given the same
cosine table reproduces the hash bit-for-bit from a closed-form pixel
fixture — the contract the ``image_phash`` driver stage's DuckDB
oracle replays.  Robustness to re-encoding comes from the DCT low
band, not from any float tolerance.

The reference (single-document extraction) has no image-dedup
analogue; this is part of the LLM-training-data pipeline family
(near-dup detection over a multimodal column).
"""

from __future__ import annotations

import math
from typing import List, Tuple

# fixed-point DCT-II cosine table: T[u][y] = round(cos((2y+1)u*pi/64)
# * 2^14), u,y in 0..31.  round-half-away-from-zero, pinned here so
# both engines share the exact constants.
DCT_SCALE = 1 << 14
DCT_N = 32


def _round_half_away(x: float) -> int:
    return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)


DCT_TABLE: List[List[int]] = [
    [_round_half_away(math.cos((2 * y + 1) * u * math.pi / (2 * DCT_N))
                      * DCT_SCALE)
     for y in range(DCT_N)]
    for u in range(DCT_N)
]


def luma_plane(pixels: bytes, width: int, height: int,
               channels: int) -> List[List[int]]:
    """Interleaved RGB (or grayscale) bytes -> integer luma rows:
    (299r + 587g + 114b) // 1000 (BT.601 in integer per-mille)."""
    rows: List[List[int]] = []
    if channels == 1:
        for y in range(height):
            rows.append(list(pixels[y * width:(y + 1) * width]))
        return rows
    if channels < 3:
        raise ValueError(f"unsupported channel count {channels}")
    stride = width * channels
    for y in range(height):
        base = y * stride
        row = []
        for x in range(width):
            o = base + x * channels
            row.append((299 * pixels[o] + 587 * pixels[o + 1]
                        + 114 * pixels[o + 2]) // 1000)
        rows.append(row)
    return rows


def downsample(plane: List[List[int]], out_w: int,
               out_h: int) -> List[List[int]]:
    """Integer area-average downsample: output cell (Y, X) is the floor
    mean of the box [floor(Y*h/out_h), floor((Y+1)*h/out_h)) x
    [floor(X*w/out_w), floor((X+1)*w/out_w)) — every bound an integer
    floor, so any SQL engine replays it exactly.  Upscaling (input
    smaller than the grid) repeats samples (boxes clamp to >= 1 px)."""
    h, w = len(plane), len(plane[0])
    out: List[List[int]] = []
    for yy in range(out_h):
        y0, y1 = yy * h // out_h, (yy + 1) * h // out_h
        if y1 <= y0:
            y1 = y0 + 1
        row = []
        for xx in range(out_w):
            x0, x1 = xx * w // out_w, (xx + 1) * w // out_w
            if x1 <= x0:
                x1 = x0 + 1
            s = 0
            for y in range(y0, y1):
                r = plane[y]
                for x in range(x0, x1):
                    s += r[x]
            row.append(s // ((y1 - y0) * (x1 - x0)))
        out.append(row)
    return out


def dct_low_band(g: List[List[int]], band: int = 8) -> List[List[int]]:
    """Exact int64 two-stage 2-D DCT-II low band (no normalization —
    the hash only compares coefficients against their median, so a
    common positive scale is irrelevant):

        R[u][x] = sum_y T[u][y] * g[y][x]          (band x 32)
        C[u][v] = sum_x T[v][x] * R[u][x]          (band x band)

    Magnitudes: |g| <= 255, |R| <= 32*255*2^14 ~ 1.3e8,
    |C| <= 32*1.3e8*2^14 ~ 7e16 < 2^62 — exact in int64 everywhere."""
    n = DCT_N
    rows = [[sum(DCT_TABLE[u][y] * g[y][x] for y in range(n))
             for x in range(n)] for u in range(band)]
    return [[sum(DCT_TABLE[v][x] * rows[u][x] for x in range(n))
             for v in range(band)] for u in range(band)]


def phash63(pixels: bytes, width: int, height: int,
            channels: int) -> int:
    """63-bit DCT perceptual hash (see module docstring).  Bit i (MSB
    first over the row-major 8x8 low band, DC skipped) is set iff
    C[u][v] > median, median = the 32nd smallest (index 31) of the 63
    non-DC coefficients."""
    g = downsample(luma_plane(pixels, width, height, channels),
                   DCT_N, DCT_N)
    c = dct_low_band(g, 8)
    vals = [c[u][v] for u in range(8) for v in range(8)
            if not (u == 0 and v == 0)]
    med = sorted(vals)[31]
    h = 0
    for v in vals:
        h = (h << 1) | (1 if v > med else 0)
    return h


def dhash64(pixels: bytes, width: int, height: int,
            channels: int) -> int:
    """64-bit gradient hash: 9x8 luma downsample (9 wide, 8 high); bit
    (y, x) set iff g[y][x] < g[y][x+1] (brightness increases
    rightward), MSB-first row-major — 8 rows x 8 column pairs."""
    g = downsample(luma_plane(pixels, width, height, channels), 9, 8)
    h = 0
    for y in range(8):
        for x in range(8):
            h = (h << 1) | (1 if g[y][x] < g[y][x + 1] else 0)
    return h


def hamming(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def phash_bands(h: int, n_bands: int = 7,
                band_bits: int = 9) -> List[Tuple[int, int]]:
    """Split a 63-bit hash into (band_index, band_value) pairs for
    LSH banding: two images within Hamming distance d share at least
    one identical band whenever d < n_bands (pigeonhole), so a
    band-bucket equi-join finds every pair at distance <= n_bands - 1
    without an all-pairs comparison."""
    return [(i, (h >> (band_bits * i)) & ((1 << band_bits) - 1))
            for i in range(n_bands)]

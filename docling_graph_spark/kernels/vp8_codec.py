"""VP8 (lossy WebP) key-frame codec — pure Python, stdlib + numpy-free.

Lossy WebP is the majority of real-crawl WebP payloads; VP8L (lossless,
kernels/webp_codec.py) landed in round 4 and this module closes the
gap: a key-frame (intra-only) VP8 decoder plus a fixture encoder, both
implementing the public algorithm of RFC 6386.

The reference (single-document extraction) has no image decode at all;
this exists for the multimodal/image-dedup stages
(operators/multimodal.py), reached through media_stub.decode_media.

What is implemented, and to what fidelity:

* SPEC-EXACT (RFC 6386 structure + the small normative tables):
  boolean arithmetic coder (§7), frame tag / key-frame header layout
  (§9), segmentation + loop-filter header parse, token partitions,
  quantizer indices with delta lookup (§9.6), coefficient token tree,
  coefficient bands, zigzag order, extra-bit categories with their
  probabilities (§13), the no-EOB-after-zero rule, per-plane nonzero
  entropy contexts, the exact integer inverse DCT with the
  20091/35468 multipliers and the inverse Walsh-Hadamard transform
  (§14), intra prediction for 16x16 / chroma 8x8 (DC/V/H/TM with the
  127/129 border convention) and the ten 4x4 B_PRED modes (§12.3),
  skip-coefficient handling, and YUV 4:2:0 output.
* FULLY INTEROPERABLE (round-5 third continuation — the former
  documented gap is closed): the three empirically-trained constant
  tables RFC 6386 ships — default coefficient probabilities (§13.5),
  coefficient-update-flag probabilities (§13.4) and key-frame B-mode
  probabilities (§11.5) — now live in `kernels/vp8_tables.py`,
  transcribed from the system libwebp's .rodata by
  `tools/extract_vp8_tables.py` (public normative constants; the
  module is frozen, no runtime library dependency) and FUNCTIONALLY
  verified: streams from this encoder decode bit-exactly in libwebp
  and real `WebPEncodeRGB` streams decode bit-exactly here
  (tests/parity/test_vp8_libwebp.py, import-gated).  Streams without
  probability updates token-decode under the §13.5 defaults — the
  shape every real encoder emits.
* ALPH alpha channels (round-5 continuation) decode next to the VP8
  frame — raw and lossless compression, all four prediction filters —
  so transparent lossy WebP (still and ANMF animation frames) yields
  RGBA; see webp_codec.decode_alpha.
* The loop filter (§15) is applied in full — normal and simple
  types, macroblock and subblock edges, sharpness-adjusted interior
  limits, hev thresholds, per-segment/delta level adjustment — as a
  post-pass over the padded planes (VP8 intra prediction uses
  unfiltered neighbors, so reconstruction is unchanged).  Bit-exact
  against libwebp across the filter parameter space.

YUV->RGB uses libwebp's published fixed-point conversion (yuv.h:
R = (19077*y>>8) + (26149*v>>8) - 14234, etc., output >>6, clamped)
with point-sampled chroma upsampling; the encoder uses the matching
RGB->YUV fixed-point forms, under which gray inputs give u = v = 128
exactly — the property the driver oracle's closed form relies on.

Decompression-bomb guard: dimensions are read from the fixed-layout
frame header and gated against MAX_PIXELS before any allocation.
"""

from __future__ import annotations

import struct
from typing import Dict, List, NamedTuple, Sequence, Tuple

MAX_PIXELS = 1 << 26

# ---------------------------------------------------------------------------
# Boolean arithmetic coder (RFC 6386 §7)
# ---------------------------------------------------------------------------


class _BoolDecoder:
    def __init__(self, data: bytes):
        self.data = data
        self.value = ((data[0] << 8) | data[1]) if len(data) >= 2 else (
            (data[0] << 8) if data else 0)
        self.pos = 2
        self.range = 255
        self.bit_count = 0

    def get(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            bit = 1
            self.range -= split
            self.value -= big
        else:
            bit = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                if self.pos < len(self.data):
                    self.value |= self.data[self.pos]
                    self.pos += 1
        return bit

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get(128)
        return v

    def signed(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.get(128) else v

    def tree(self, tree: Sequence[int], probs: Sequence[int],
             start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.get(probs[i >> 1])]
            if i <= 0:
                return -i


class _BoolEncoder:
    def __init__(self):
        self.out = bytearray()
        self.range = 255
        self.bottom = 0
        self.bit_count = 24

    def _carry(self) -> None:
        i = len(self.out) - 1
        while self.out[i] == 255:
            self.out[i] = 0
            i -= 1
        self.out[i] += 1

    def put(self, prob: int, bit: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8

    def literal(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.put(128, (value >> i) & 1)

    def signed(self, value: int, n: int) -> None:
        self.literal(abs(value), n)
        self.put(128, 1 if value < 0 else 0)

    def tree(self, path: Sequence[Tuple[int, int]],
             probs: Sequence[int]) -> None:
        for prob_idx, bit in path:
            self.put(probs[prob_idx], bit)

    def flush(self) -> bytes:
        c = self.bit_count
        v = self.bottom
        if v & (1 << (32 - c)):
            self._carry()
        v = (v << (c & 7)) & 0xFFFFFFFF
        for _ in range(c >> 3):
            v = (v << 8) & 0xFFFFFFFF
        for _ in range(4):
            self.out.append((v >> 24) & 0xFF)
            v = (v << 8) & 0xFFFFFFFF
        return bytes(self.out)


def _tree_paths(tree: Sequence[int]) -> Dict[int, List[Tuple[int, int]]]:
    """symbol -> [(prob_index, bit), ...] encoding path."""
    paths: Dict[int, List[Tuple[int, int]]] = {}

    def walk(i: int, path: List[Tuple[int, int]]) -> None:
        for b in (0, 1):
            j = tree[i + b]
            p = path + [(i >> 1, b)]
            if j <= 0:
                paths[-j] = p
            else:
                walk(j, p)

    walk(0, [])
    return paths


# ---------------------------------------------------------------------------
# Normative constant tables (RFC 6386)
# ---------------------------------------------------------------------------

# §9.6 quantizer lookups (transcribed; monotone utility tables)
_DC_Q = [
    4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17,
    18, 19, 20, 20, 21, 21, 22, 22, 23, 23, 24, 25, 25, 26, 27, 28,
    29, 30, 31, 32, 33, 34, 35, 36, 37, 37, 38, 39, 40, 41, 42, 43,
    44, 45, 46, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58,
    59, 60, 61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74,
    75, 76, 76, 77, 78, 79, 80, 81, 82, 83, 84, 85, 86, 87, 88, 89,
    91, 93, 95, 96, 98, 100, 101, 102, 104, 106, 108, 110, 112, 114,
    116, 118, 122, 124, 126, 128, 130, 132, 134, 136, 138, 140, 143,
    145, 148, 151, 154, 157,
]
_AC_Q = [
    4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
    20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35,
    36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51,
    52, 53, 54, 55, 56, 57, 58, 60, 62, 64, 66, 68, 70, 72, 74, 76,
    78, 80, 82, 84, 86, 88, 90, 92, 94, 96, 98, 100, 102, 104, 106,
    108, 110, 112, 114, 116, 119, 122, 125, 128, 131, 134, 137, 140,
    143, 146, 149, 152, 155, 158, 161, 164, 167, 170, 173, 177, 181,
    185, 189, 193, 197, 201, 205, 209, 213, 217, 221, 225, 229, 234,
    239, 245, 249, 254, 259, 264, 269, 274, 279, 284,
]

_ZIGZAG = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]
_COEFF_BANDS = [0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7]

# §13.2 token alphabet + tree
DCT_0, DCT_1, DCT_2, DCT_3, DCT_4 = 0, 1, 2, 3, 4
CAT1, CAT2, CAT3, CAT4, CAT5, CAT6, DCT_EOB = 5, 6, 7, 8, 9, 10, 11
_COEFF_TREE = [
    -DCT_EOB, 2,
    -DCT_0, 4,
    -DCT_1, 6,
    8, 12,
    -DCT_2, 10,
    -DCT_3, -DCT_4,
    14, 16,
    -CAT1, -CAT2,
    18, 20,
    -CAT3, -CAT4,
    -CAT5, -CAT6,
]
_COEFF_PATHS = _tree_paths(_COEFF_TREE)
_CAT_PROBS = [
    [159],
    [165, 145],
    [173, 148, 140],
    [176, 155, 140, 135],
    [180, 157, 141, 134, 130],
    [254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129],
]
_CAT_BASE = [5, 7, 11, 19, 35, 67]

# §11 intra modes (key frame)
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
_KF_YMODE_TREE = [-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED]
_KF_YMODE_PROB = [145, 156, 163, 128]
_KF_YMODE_PATHS = _tree_paths(_KF_YMODE_TREE)
_UV_MODE_TREE = [-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED]
_KF_UV_PROB = [142, 114, 183]
_UV_MODE_PATHS = _tree_paths(_UV_MODE_TREE)

(B_DC, B_TM, B_VE, B_HE, B_LD, B_RD, B_VR, B_VL, B_HD, B_HU) = range(10)
_BMODE_TREE = [
    -B_DC, 2,
    -B_TM, 4,
    -B_VE, 6,
    8, 12,
    -B_HE, 10,
    -B_RD, -B_VR,
    -B_LD, 14,
    -B_VL, 16,
    -B_HD, -B_HU,
]
_BMODE_PATHS = _tree_paths(_BMODE_TREE)

_SEGMENT_TREE = [2, 4, -0, -1, -2, -3]

from .vp8_tables import (COEFF_UPDATE_PROBS, DEFAULT_COEFF_PROBS,  # noqa: E402
                         KF_BMODE_PROBS)

_NEUTRAL_PROB = 128      # fixture-table fill (see _fixture_coeff_probs)


def _new_coeff_probs(fill: int = _NEUTRAL_PROB) -> List:
    return [[[[fill] * 11 for _ in range(3)] for _ in range(8)]
            for _ in range(4)]


# ---------------------------------------------------------------------------
# Transforms (§14.3) — exact integer inverses; float-exact forwards
# ---------------------------------------------------------------------------


def _idct4x4(block: List[int]) -> List[int]:
    """RFC 6386 §14.3 inverse DCT, bit-exact (20091/35468 multipliers,
    final (x+4)>>3).  Python's >> is the arithmetic shift both the RFC
    pseudo-code and every C implementation rely on."""
    tmp = [0] * 16
    for i in range(4):
        a1 = block[i] + block[8 + i]
        b1 = block[i] - block[8 + i]
        t1 = (block[4 + i] * 35468) >> 16
        t2 = block[12 + i] + ((block[12 + i] * 20091) >> 16)
        c1 = t1 - t2
        t1 = block[4 + i] + ((block[4 + i] * 20091) >> 16)
        t2 = (block[12 + i] * 35468) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[12 + i] = a1 - d1
        tmp[4 + i] = b1 + c1
        tmp[8 + i] = b1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = tmp[r] + tmp[r + 2]
        b1 = tmp[r] - tmp[r + 2]
        t1 = (tmp[r + 1] * 35468) >> 16
        t2 = tmp[r + 3] + ((tmp[r + 3] * 20091) >> 16)
        c1 = t1 - t2
        t1 = tmp[r + 1] + ((tmp[r + 1] * 20091) >> 16)
        t2 = (tmp[r + 3] * 35468) >> 16
        d1 = t1 + t2
        out[r] = (a1 + d1 + 4) >> 3
        out[r + 3] = (a1 - d1 + 4) >> 3
        out[r + 1] = (b1 + c1 + 4) >> 3
        out[r + 2] = (b1 - c1 + 4) >> 3
    return out


def _iwht4x4(block: List[int]) -> List[int]:
    """§14.3 inverse Walsh-Hadamard (Y2); output j is subblock j's
    dequantized DC."""
    tmp = [0] * 16
    for i in range(4):
        a1 = block[i] + block[12 + i]
        b1 = block[4 + i] + block[8 + i]
        c1 = block[4 + i] - block[8 + i]
        d1 = block[i] - block[12 + i]
        tmp[i] = a1 + b1
        tmp[4 + i] = c1 + d1
        tmp[8 + i] = a1 - b1
        tmp[12 + i] = d1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = tmp[r] + tmp[r + 3]
        b1 = tmp[r + 1] + tmp[r + 2]
        c1 = tmp[r + 1] - tmp[r + 2]
        d1 = tmp[r] - tmp[r + 3]
        out[r] = (a1 + b1 + 3) >> 3
        out[r + 1] = (c1 + d1 + 3) >> 3
        out[r + 2] = (a1 - b1 + 3) >> 3
        out[r + 3] = (d1 - c1 + 3) >> 3
    return out


# The inverse DCT realizes pixels ~= T^t X T / 8 with basis rows
# [1,1,1,1], [a,b,-b,-a], [1,-1,-1,1], [b,-a,a,-b] (a = 1+20091/2^16,
# b = 35468/2^16), each of squared norm 4.  The float forward below is
# its exact adjoint X = T r T^t / 2 — the encoder quantizes these and
# the decoder's integer inverse reconstructs within rounding.  For a
# constant residual c the forward is EXACT: DC = 8c, ACs = 0 — the
# closed form the driver oracle replays.
_FA = 1.0 + 20091.0 / 65536.0
_FB = 35468.0 / 65536.0
_T_ROWS = [
    (1.0, 1.0, 1.0, 1.0),
    (_FA, _FB, -_FB, -_FA),
    (1.0, -1.0, -1.0, 1.0),
    (_FB, -_FA, _FA, -_FB),
]


def _fdct4x4(resid: List[int]) -> List[int]:
    cols = [[sum(_T_ROWS[u][x] * resid[4 * x + c] for x in range(4))
             for c in range(4)] for u in range(4)]
    out = [0] * 16
    for u in range(4):
        for v in range(4):
            val = sum(_T_ROWS[v][c] * cols[u][c] for c in range(4)) / 2.0
            out[4 * u + v] = int(round(val))
    return out


_WHT_M = [
    (1, 1, 1, 1),
    (1, 1, -1, -1),
    (1, -1, -1, 1),
    (1, -1, 1, -1),
]


def _fwht4x4(dcs: List[int]) -> List[int]:
    """Exact integer adjoint of _iwht4x4 (M X M / 2 with the symmetric
    ±1 matrix M; entries of M X M are ≡ 0 mod 2 only for even sums, so
    round-half-away is applied deterministically)."""
    cols = [[sum(_WHT_M[u][x] * dcs[4 * x + c] for x in range(4))
             for c in range(4)] for u in range(4)]
    out = [0] * 16
    for u in range(4):
        for v in range(4):
            s = sum(_WHT_M[v][c] * cols[u][c] for c in range(4))
            out[4 * u + v] = (s + (1 if s >= 0 else -1)) // 2 \
                if s % 2 else s // 2
    return out


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _avg2(a: int, b: int) -> int:
    return (a + b + 1) >> 1


def _avg3(a: int, b: int, c: int) -> int:
    return (a + 2 * b + c + 2) >> 2


# ---------------------------------------------------------------------------
# Intra prediction (§12) over bordered planes: planes carry one border
# row (value 127) and one border column (value 129, corner 127), the
# RFC's off-frame convention, plus 8 replicated columns on the right so
# above-right reads are always in range.
# ---------------------------------------------------------------------------


class _Plane:
    def __init__(self, mb_w: int, mb_h: int, bs: int):
        self.w = mb_w * bs
        self.h = mb_h * bs
        self.stride = self.w + 1 + 8
        row0 = [127] * self.stride
        self.px = [row0[:]]
        for _ in range(self.h):
            self.px.append([129] + [0] * (self.w + 8))

    def get(self, x: int, y: int) -> int:
        return self.px[y + 1][x + 1]

    def set_block(self, x: int, y: int, n: int,
                  vals: Sequence[int]) -> None:
        for r in range(n):
            row = self.px[y + r + 1]
            base = x + 1
            for c in range(n):
                row[base + c] = vals[r * n + c]

    def extend_right(self, y: int, n: int) -> None:
        """Replicate the rightmost real pixel across the 8-column pad
        for rows y..y+n-1 (run after each completed MB row)."""
        for r in range(y, y + n):
            row = self.px[r + 1]
            edge = row[self.w]
            for c in range(8):
                row[self.w + 1 + c] = edge


# ---------------------------------------------------------------------------
# Loop filter (RFC 6386 §15) — applied to the padded planes after the
# whole frame reconstructs (VP8 intra prediction uses UNfiltered
# neighbors, so filtering is a pure post-pass).  Bit-exactness is
# pinned against libwebp in tests/parity/test_vp8_libwebp.py.
# ---------------------------------------------------------------------------


def _c128(v: int) -> int:
    return -128 if v < -128 else (127 if v > 127 else v)


def _lf_edge(pl: _Plane, x0: int, y0: int, n: int, horiz: bool,
             mb_edge: bool, flt_simple: bool, elim: int, ilim: int,
             hev_t: int) -> None:
    """Filter one edge of length ``n``: vertical edge at column x0
    (pixels vary along y) or horizontal edge at row y0 (pixels vary
    along x), per the §15.2/§15.3 pixel adjustments."""
    for k in range(n):
        if horiz:
            col = x0 + k + 1
            def g(o): return pl.px[y0 + o + 1][col]
            def s(o, v): pl.px[y0 + o + 1][col] = v
        else:
            row = pl.px[y0 + k + 1]
            def g(o, row=row): return row[x0 + o + 1]
            def s(o, v, row=row): row[x0 + o + 1] = v
        p1, p0, q0, q1 = g(-2), g(-1), g(0), g(1)
        if abs(p0 - q0) * 2 + abs(p1 - q1) // 2 > elim:
            continue
        if flt_simple:
            P1, P0, Q0, Q1 = p1 - 128, p0 - 128, q0 - 128, q1 - 128
            a = _c128(_c128(P1 - Q1) + 3 * (Q0 - P0))
            F = _c128(a + 4) >> 3
            E = _c128(a + 3) >> 3
            s(-1, _c128(P0 + E) + 128)
            s(0, _c128(Q0 - F) + 128)
            continue
        p3, p2 = g(-4), g(-3)
        q2, q3 = g(2), g(3)
        if (abs(p3 - p2) > ilim or abs(p2 - p1) > ilim
                or abs(p1 - p0) > ilim or abs(q1 - q0) > ilim
                or abs(q2 - q1) > ilim or abs(q3 - q2) > ilim):
            continue
        hev = abs(p1 - p0) > hev_t or abs(q1 - q0) > hev_t
        P1, P0, Q0, Q1 = p1 - 128, p0 - 128, q0 - 128, q1 - 128
        if mb_edge and not hev:
            P2, Q2 = p2 - 128, q2 - 128
            w = _c128(_c128(P1 - Q1) + 3 * (Q0 - P0))
            a = _c128((27 * w + 63) >> 7)
            s(0, _c128(Q0 - a) + 128)
            s(-1, _c128(P0 + a) + 128)
            a = _c128((18 * w + 63) >> 7)
            s(1, _c128(Q1 - a) + 128)
            s(-2, _c128(P1 + a) + 128)
            a = _c128((9 * w + 63) >> 7)
            s(2, _c128(Q2 - a) + 128)
            s(-3, _c128(P2 + a) + 128)
        else:
            use_outer = 1 if (mb_edge or hev) else 0
            a = _c128((_c128(P1 - Q1) if use_outer else 0)
                      + 3 * (Q0 - P0))
            F = _c128(a + 4) >> 3
            E = _c128(a + 3) >> 3
            s(0, _c128(Q0 - F) + 128)
            s(-1, _c128(P0 + E) + 128)
            if not hev:
                a2 = (F + 1) >> 1
                s(1, _c128(Q1 - a2) + 128)
                s(-2, _c128(P1 + a2) + 128)


def _apply_loop_filter(yp: _Plane, up: _Plane, vp: _Plane,
                       mb_w: int, mb_h: int, mb_info: List[tuple],
                       flt_simple: bool, base_level: int,
                       sharpness: int, seg_enabled: int, seg_abs: int,
                       seg_lf_delta: List[int], lf_delta_on: int,
                       lf_ref_delta: List[int],
                       lf_mode_delta: List[int]) -> None:
    for mb_y in range(mb_h):
        for mb_x in range(mb_w):
            seg, bpred, inner = mb_info[mb_y * mb_w + mb_x]
            lvl = base_level
            if seg_enabled:
                lvl = (seg_lf_delta[seg] if seg_abs
                       else base_level + seg_lf_delta[seg])
            if lf_delta_on:
                lvl += lf_ref_delta[0]          # INTRA_FRAME
                if bpred:
                    lvl += lf_mode_delta[0]
            lvl = max(0, min(63, lvl))
            if lvl == 0:
                continue
            ilim = lvl
            if sharpness:
                ilim >>= 2 if sharpness > 4 else 1
                if ilim > 9 - sharpness:
                    ilim = 9 - sharpness
            ilim = max(ilim, 1)
            hev_t = 2 if lvl >= 40 else (1 if lvl >= 15 else 0)
            mb_lim = ((lvl + 2) * 2) + ilim
            sub_lim = (lvl * 2) + ilim
            x0, y0 = mb_x * 16, mb_y * 16
            cx0, cy0 = mb_x * 8, mb_y * 8
            planes = ((yp, x0, y0, 16),) if flt_simple else \
                ((yp, x0, y0, 16), (up, cx0, cy0, 8),
                 (vp, cx0, cy0, 8))
            for pl, px0, py0, bs in planes:
                step = 4 if bs == 16 else 4
                if mb_x > 0:
                    _lf_edge(pl, px0, py0, bs, False, True,
                             flt_simple, mb_lim, ilim, hev_t)
                if inner:
                    for dx in range(step, bs, step):
                        _lf_edge(pl, px0 + dx, py0, bs, False, False,
                                 flt_simple, sub_lim, ilim, hev_t)
                if mb_y > 0:
                    _lf_edge(pl, px0, py0, bs, True, True,
                             flt_simple, mb_lim, ilim, hev_t)
                if inner:
                    for dy in range(step, bs, step):
                        _lf_edge(pl, px0, py0 + dy, bs, True, False,
                                 flt_simple, sub_lim, ilim, hev_t)


def _pred_dc(plane: _Plane, x: int, y: int, n: int,
             up: bool, left: bool) -> List[int]:
    if up and left:
        s = sum(plane.get(x + c, y - 1) for c in range(n)) \
            + sum(plane.get(x - 1, y + r) for r in range(n))
        shift = 5 if n == 16 else 4
        dc = (s + n) >> shift
    elif up:
        s = sum(plane.get(x + c, y - 1) for c in range(n))
        dc = (s + n // 2) >> (4 if n == 16 else 3)
    elif left:
        s = sum(plane.get(x - 1, y + r) for r in range(n))
        dc = (s + n // 2) >> (4 if n == 16 else 3)
    else:
        dc = 128
    return [dc] * (n * n)


def _pred_v(plane: _Plane, x: int, y: int, n: int) -> List[int]:
    row = [plane.get(x + c, y - 1) for c in range(n)]
    return row * n


def _pred_h(plane: _Plane, x: int, y: int, n: int) -> List[int]:
    out = []
    for r in range(n):
        out.extend([plane.get(x - 1, y + r)] * n)
    return out


def _pred_tm(plane: _Plane, x: int, y: int, n: int) -> List[int]:
    p = plane.get(x - 1, y - 1)
    above = [plane.get(x + c, y - 1) for c in range(n)]
    out = []
    for r in range(n):
        lv = plane.get(x - 1, y + r)
        out.extend(_clamp(lv + a - p) for a in above)
    return out


def _bpred_above_right(plane: _Plane, x: int, y: int, mb_y0: int,
                       sub_c: int, sub_r: int) -> List[int]:
    """The 4 above-right samples of a 4x4 subblock.  Subblocks in the
    rightmost column with r > 0 read the row above the MACROBLOCK (the
    area to their upper right inside this MB row is not yet decoded);
    everything else reads the row directly above."""
    src_y = (mb_y0 - 1) if (sub_c == 3 and sub_r > 0) else (y - 1)
    return [plane.get(x + 4 + i, src_y) for i in range(4)]


def _pred_b(mode: int, plane: _Plane, x: int, y: int, mb_y0: int,
            sub_c: int, sub_r: int) -> List[int]:
    A = [plane.get(x + c, y - 1) for c in range(4)] \
        + _bpred_above_right(plane, x, y, mb_y0, sub_c, sub_r)
    L = [plane.get(x - 1, y + r) for r in range(4)]
    P = plane.get(x - 1, y - 1)
    B = [0] * 16
    if mode == B_DC:
        dc = (sum(A[:4]) + sum(L) + 4) >> 3
        return [dc] * 16
    if mode == B_TM:
        for r in range(4):
            for c in range(4):
                B[4 * r + c] = _clamp(L[r] + A[c] - P)
        return B
    if mode == B_VE:
        row = [_avg3(P, A[0], A[1]), _avg3(A[0], A[1], A[2]),
               _avg3(A[1], A[2], A[3]), _avg3(A[2], A[3], A[4])]
        return row * 4
    if mode == B_HE:
        col = [_avg3(P, L[0], L[1]), _avg3(L[0], L[1], L[2]),
               _avg3(L[1], L[2], L[3]), _avg3(L[2], L[3], L[3])]
        out = []
        for r in range(4):
            out.extend([col[r]] * 4)
        return out
    if mode == B_LD:
        for r in range(4):
            for c in range(4):
                d = r + c
                B[4 * r + c] = (_avg3(A[6], A[7], A[7]) if d == 6
                                else _avg3(A[d], A[d + 1], A[d + 2]))
        return B
    if mode == B_RD:
        E = [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3]]
        for r in range(4):
            for c in range(4):
                k = 4 + c - r
                B[4 * r + c] = _avg3(E[k - 1], E[k], E[k + 1])
        return B
    if mode == B_VR:
        B[0:4] = [_avg2(P, A[0]), _avg2(A[0], A[1]),
                  _avg2(A[1], A[2]), _avg2(A[2], A[3])]
        B[4:8] = [_avg3(L[0], P, A[0]), _avg3(P, A[0], A[1]),
                  _avg3(A[0], A[1], A[2]), _avg3(A[1], A[2], A[3])]
        B[8] = _avg3(L[1], L[0], P)
        B[9:12] = B[0:3]
        B[12] = _avg3(L[2], L[1], L[0])
        B[13:16] = B[4:7]
        return B
    if mode == B_VL:
        B[0:4] = [_avg2(A[0], A[1]), _avg2(A[1], A[2]),
                  _avg2(A[2], A[3]), _avg2(A[3], A[4])]
        B[4:8] = [_avg3(A[0], A[1], A[2]), _avg3(A[1], A[2], A[3]),
                  _avg3(A[2], A[3], A[4]), _avg3(A[3], A[4], A[5])]
        B[8:11] = B[1:4]
        B[11] = _avg3(A[4], A[5], A[6])
        B[12:15] = B[5:8]
        B[15] = _avg3(A[5], A[6], A[7])
        return B
    if mode == B_HD:
        E = [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2]]
        # diagonal pairs from the bottom-left corner upward
        B[12] = _avg2(E[0], E[1])
        B[13] = _avg3(E[0], E[1], E[2])
        B[8] = B[14] = _avg2(E[1], E[2])
        B[9] = B[15] = _avg3(E[1], E[2], E[3])
        B[4] = B[10] = _avg2(E[2], E[3])
        B[5] = B[11] = _avg3(E[2], E[3], E[4])
        B[0] = B[6] = _avg2(E[3], E[4])
        B[1] = B[7] = _avg3(E[3], E[4], E[5])
        B[2] = _avg3(E[4], E[5], E[6])
        B[3] = _avg3(E[5], E[6], E[7])
        return B
    if mode == B_HU:
        B[0] = _avg2(L[0], L[1])
        B[1] = _avg3(L[0], L[1], L[2])
        B[2] = B[4] = _avg2(L[1], L[2])
        B[3] = B[5] = _avg3(L[1], L[2], L[3])
        B[6] = B[8] = _avg2(L[2], L[3])
        B[7] = B[9] = _avg3(L[2], L[3], L[3])
        B[10] = B[11] = B[12] = B[13] = B[14] = B[15] = L[3]
        return B
    raise ValueError(f"bad bmode {mode}")


# ---------------------------------------------------------------------------
# Quantizer resolution (§9.6)
# ---------------------------------------------------------------------------


def _q_clamp(i: int) -> int:
    return 0 if i < 0 else 127 if i > 127 else i


class _Quants(NamedTuple):
    y_dc: int
    y_ac: int
    y2_dc: int
    y2_ac: int
    uv_dc: int
    uv_ac: int


def _resolve_quants(qi: int, d_ydc: int, d_y2dc: int, d_y2ac: int,
                    d_uvdc: int, d_uvac: int) -> _Quants:
    y2_ac = (_AC_Q[_q_clamp(qi + d_y2ac)] * 155) // 100
    return _Quants(
        y_dc=_DC_Q[_q_clamp(qi + d_ydc)],
        y_ac=_AC_Q[_q_clamp(qi)],
        y2_dc=_DC_Q[_q_clamp(qi + d_y2dc)] * 2,
        y2_ac=max(8, y2_ac),
        uv_dc=min(132, _DC_Q[_q_clamp(qi + d_uvdc)]),
        uv_ac=_AC_Q[_q_clamp(qi + d_uvac)],
    )


class DecodedVp8(NamedTuple):
    width: int
    height: int
    y: bytes       # width x height luma
    u: bytes       # ceil(w/2) x ceil(h/2)
    v: bytes


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_vp8(data: bytes, max_pixels: int = MAX_PIXELS) -> DecodedVp8:
    """Decode one VP8 key frame to YUV 4:2:0 planes."""
    if len(data) < 10:
        raise ValueError("VP8 frame too short")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise NotImplementedError(
            "VP8 interframe (only key frames carry a full image)")
    first_part_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 key-frame start code")
    w_code, h_code = struct.unpack_from("<HH", data, 6)
    width, height = w_code & 0x3FFF, h_code & 0x3FFF
    if width == 0 or height == 0:
        raise ValueError("zero VP8 dimensions")
    if width * height > max_pixels:
        raise ValueError(
            f"VP8 dimensions {width}x{height} exceed the {max_pixels}"
            "-pixel decode guard (decompression-bomb protection)")
    header = data[10:]
    if first_part_size > len(header):
        raise ValueError("truncated VP8 first partition")
    bd = _BoolDecoder(header[:first_part_size])

    bd.get(128)                          # color space
    bd.get(128)                          # clamping type
    seg_enabled = bd.get(128)
    update_map = 0
    seg_tree_probs = [255, 255, 255]
    seg_q_delta = [0, 0, 0, 0]
    seg_lf_delta = [0, 0, 0, 0]
    seg_abs = 0
    if seg_enabled:
        update_map = bd.get(128)
        update_data = bd.get(128)
        if update_data:
            seg_abs = bd.get(128)
            for i in range(4):
                if bd.get(128):
                    seg_q_delta[i] = bd.signed(7)
            for i in range(4):            # per-segment loop filter
                if bd.get(128):
                    seg_lf_delta[i] = bd.signed(6)
        if update_map:
            for i in range(3):
                seg_tree_probs[i] = bd.literal(8) if bd.get(128) else 255
    filter_type = bd.get(128)            # 0 = normal, 1 = simple
    filter_level = bd.literal(6)
    sharpness = bd.literal(3)
    lf_delta_enabled = bd.get(128)
    lf_ref_delta = [0, 0, 0, 0]
    lf_mode_delta = [0, 0, 0, 0]
    if lf_delta_enabled:
        if bd.get(128):                  # lf delta update
            for i in range(4):
                if bd.get(128):
                    lf_ref_delta[i] = bd.signed(6)
            for i in range(4):
                if bd.get(128):
                    lf_mode_delta[i] = bd.signed(6)

    n_parts = 1 << bd.literal(2)
    rest = header[first_part_size:]
    sizes = []
    off = 3 * (n_parts - 1)
    if len(rest) < off:
        raise ValueError("truncated VP8 partition size table")
    for i in range(n_parts - 1):
        sizes.append(rest[3 * i] | (rest[3 * i + 1] << 8)
                     | (rest[3 * i + 2] << 16))
    parts = []
    for i in range(n_parts):
        size = sizes[i] if i < n_parts - 1 else len(rest) - off
        if off + size > len(rest) or size < 0:
            raise ValueError("truncated VP8 token partition")
        parts.append(_BoolDecoder(rest[off:off + size]))
        off += size

    qi = bd.literal(7)
    deltas = []
    for _ in range(5):
        deltas.append(bd.signed(4) if bd.get(128) else 0)
    quants = _resolve_quants(qi, *deltas)
    seg_quants = []
    for s in range(4):
        base = seg_q_delta[s] if seg_abs else qi + seg_q_delta[s]
        seg_quants.append(_resolve_quants(
            base if seg_enabled else qi, *deltas))

    bd.get(128)                          # refresh entropy probs

    # §13.4: per-probability update flags are coded under the constant
    # COEFF_UPDATE_PROBS table; absent updates keep the RFC 6386 §13.5
    # defaults — real encoders (libwebp et al.) rely on this, so this
    # IS the interop path (bit-exactness pinned against libwebp in
    # tests/parity/test_vp8_libwebp.py)
    coeff_probs = [[[list(DEFAULT_COEFF_PROBS[i][j][k])
                     for k in range(3)] for j in range(8)]
                   for i in range(4)]
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for li in range(11):
                    if bd.get(COEFF_UPDATE_PROBS[i][j][k][li]):
                        coeff_probs[i][j][k][li] = bd.literal(8)

    mb_skip_enabled = bd.get(128)
    prob_skip = bd.literal(8) if mb_skip_enabled else 0

    mb_w = (width + 15) // 16
    mb_h = (height + 15) // 16
    yp = _Plane(mb_w, mb_h, 16)
    up = _Plane(mb_w, mb_h, 8)
    vp = _Plane(mb_w, mb_h, 8)

    # entropy contexts: above per MB column, left reset per MB row
    above_nz = [[0] * 9 for _ in range(mb_w)]   # 4 Y, 2 U, 2 V, 1 Y2
    above_bmode = [[B_DC] * 4 for _ in range(mb_w)]

    def read_coeffs(part: _BoolDecoder, btype: int, first: int,
                    ctx: int, dq_dc: int, dq_ac: int) -> List[int]:
        out = [0] * 16
        probs = coeff_probs[btype]
        i = first
        start = 0
        while i < 16:
            band = _COEFF_BANDS[i]
            p = probs[band][ctx]
            tok = part.tree(_COEFF_TREE, p, start)
            if tok == DCT_EOB:
                break
            if tok == DCT_0:
                ctx = 0
                start = 2            # no EOB directly after a zero
                i += 1
                continue
            start = 0
            if tok <= DCT_4:
                val = tok
            else:
                cat = tok - CAT1
                extra = 0
                for cp in _CAT_PROBS[cat]:
                    extra = (extra << 1) | part.get(cp)
                val = _CAT_BASE[cat] + extra
            if part.get(128):
                val = -val
            ctx = 2 if abs(val) > 1 else 1
            out[_ZIGZAG[i]] = val * (dq_dc if i == 0 else dq_ac)
            i += 1
        return out

    mb_info: List[tuple] = []            # (segment, bpred, inner-edges)
    for mb_y in range(mb_h):
        left_nz = [0] * 9
        left_bmode = [B_DC] * 4
        part = parts[mb_y % n_parts]
        for mb_x in range(mb_w):
            seg = 0
            if seg_enabled and update_map:
                seg = bd.tree(_SEGMENT_TREE, seg_tree_probs)
            q = seg_quants[seg] if seg_enabled else quants
            skip = bd.get(prob_skip) if mb_skip_enabled else 0
            ymode = bd.tree(_KF_YMODE_TREE, _KF_YMODE_PROB)
            bmodes = [B_DC] * 16
            if ymode == B_PRED:
                for sb in range(16):
                    r, c = sb // 4, sb % 4
                    _a = above_bmode[mb_x][c] if r == 0 else \
                        bmodes[sb - 4]
                    _l = left_bmode[r] if c == 0 else bmodes[sb - 1]
                    bmodes[sb] = bd.tree(_BMODE_TREE,
                                         KF_BMODE_PROBS[_a][_l])
            uvmode = bd.tree(_UV_MODE_TREE, _KF_UV_PROB)
            above_bmode[mb_x] = ([bmodes[12 + i] for i in range(4)]
                                 if ymode == B_PRED else
                                 [_MB_TO_B[ymode]] * 4)
            left_bmode = ([bmodes[3 + 4 * i] for i in range(4)]
                          if ymode == B_PRED else [_MB_TO_B[ymode]] * 4)

            has_y2 = ymode != B_PRED
            y2_dc = [0] * 16
            mb_nz = False
            if skip:
                for i in range(8):
                    above_nz[mb_x][i] = 0
                    left_nz[i] = 0
                if has_y2:
                    above_nz[mb_x][8] = 0
                    left_nz[8] = 0
                y_coeffs = [[0] * 16 for _ in range(16)]
                uv_coeffs = [[0] * 16 for _ in range(8)]
            else:
                if has_y2:
                    ctx = above_nz[mb_x][8] + left_nz[8]
                    c2 = read_coeffs(part, 1, 0, ctx, q.y2_dc, q.y2_ac)
                    nz = int(any(c2))
                    above_nz[mb_x][8] = nz
                    left_nz[8] = nz
                    mb_nz = mb_nz or bool(nz)
                    y2_dc = _iwht4x4(c2)
                y_coeffs = []
                btype = 0 if has_y2 else 3
                first = 1 if has_y2 else 0
                for sb in range(16):
                    r, c = sb // 4, sb % 4
                    ctx = above_nz[mb_x][c] + left_nz[r]
                    coeffs = read_coeffs(part, btype, first, ctx,
                                         q.y_dc, q.y_ac)
                    # nz context counts CODED coefficients only; the
                    # Y2-provided DC is substituted after this check
                    # (with first=1 position 0 is still zero here)
                    nz = int(any(coeffs))
                    above_nz[mb_x][c] = nz
                    left_nz[r] = nz
                    mb_nz = mb_nz or bool(nz)
                    if has_y2:
                        coeffs[0] = y2_dc[sb]
                    y_coeffs.append(coeffs)
                uv_coeffs = []
                for pi in range(2):          # U then V
                    for sb in range(4):
                        r, c = sb // 2, sb % 2
                        idx = 4 + 2 * pi + c
                        lidx = 4 + 2 * pi + r
                        ctx = above_nz[mb_x][idx] + left_nz[lidx]
                        coeffs = read_coeffs(part, 2, 0, ctx,
                                             q.uv_dc, q.uv_ac)
                        nz = int(any(coeffs))
                        above_nz[mb_x][idx] = nz
                        left_nz[lidx] = nz
                        mb_nz = mb_nz or bool(nz)
                        uv_coeffs.append(coeffs)

            mb_info.append((seg, ymode == B_PRED,
                            mb_nz or ymode == B_PRED))
            _reconstruct_mb(yp, up, vp, mb_x, mb_y, mb_w, mb_h, ymode,
                            bmodes, uvmode, y_coeffs, uv_coeffs,
                            has_y2)
        yp.extend_right(mb_y * 16, 16)
        up.extend_right(mb_y * 8, 8)
        vp.extend_right(mb_y * 8, 8)

    if filter_level > 0:
        _apply_loop_filter(yp, up, vp, mb_w, mb_h, mb_info,
                           bool(filter_type), filter_level, sharpness,
                           seg_enabled, seg_abs, seg_lf_delta,
                           lf_delta_enabled, lf_ref_delta,
                           lf_mode_delta)

    cw, ch = (width + 1) // 2, (height + 1) // 2
    ybytes = bytearray()
    for yy in range(height):
        ybytes.extend(yp.px[yy + 1][1:1 + width])
    ub = bytearray()
    vb = bytearray()
    for yy in range(ch):
        ub.extend(up.px[yy + 1][1:1 + cw])
        vb.extend(vp.px[yy + 1][1:1 + cw])
    return DecodedVp8(width, height, bytes(ybytes), bytes(ub),
                      bytes(vb))


_MB_TO_B = {DC_PRED: B_DC, V_PRED: B_VE, H_PRED: B_HE, TM_PRED: B_TM}


def _reconstruct_mb(yp: _Plane, up: _Plane, vp: _Plane, mb_x: int,
                    mb_y: int, mb_w: int, mb_h: int, ymode: int,
                    bmodes: List[int], uvmode: int,
                    y_coeffs: List[List[int]],
                    uv_coeffs: List[List[int]], has_y2: bool) -> None:
    x0, y0 = mb_x * 16, mb_y * 16
    up_avail, left_avail = mb_y > 0, mb_x > 0
    if ymode == B_PRED:
        for sb in range(16):
            r, c = sb // 4, sb % 4
            bx, by = x0 + 4 * c, y0 + 4 * r
            pred = _pred_b(bmodes[sb], yp, bx, by, y0, c, r)
            resid = _idct4x4(y_coeffs[sb])
            yp.set_block(bx, by, 4,
                         [_clamp(pred[i] + resid[i]) for i in range(16)])
    else:
        if ymode == DC_PRED:
            pred = _pred_dc(yp, x0, y0, 16, up_avail, left_avail)
        elif ymode == V_PRED:
            pred = _pred_v(yp, x0, y0, 16)
        elif ymode == H_PRED:
            pred = _pred_h(yp, x0, y0, 16)
        else:
            pred = _pred_tm(yp, x0, y0, 16)
        out = [0] * 256
        for sb in range(16):
            r, c = sb // 4, sb % 4
            resid = _idct4x4(y_coeffs[sb])
            for i in range(16):
                pr, pc = 4 * r + i // 4, 4 * c + i % 4
                out[16 * pr + pc] = _clamp(
                    pred[16 * pr + pc] + resid[i])
        yp.set_block(x0, y0, 16, out)
    cx, cy = mb_x * 8, mb_y * 8
    for pi, plane in ((0, up), (1, vp)):
        if uvmode == DC_PRED:
            pred = _pred_dc(plane, cx, cy, 8, up_avail, left_avail)
        elif uvmode == V_PRED:
            pred = _pred_v(plane, cx, cy, 8)
        elif uvmode == H_PRED:
            pred = _pred_h(plane, cx, cy, 8)
        else:
            pred = _pred_tm(plane, cx, cy, 8)
        out = [0] * 64
        for sb in range(4):
            r, c = sb // 2, sb % 2
            resid = _idct4x4(uv_coeffs[4 * pi + sb])
            for i in range(16):
                pr, pc = 4 * r + i // 4, 4 * c + i % 4
                out[8 * pr + pc] = _clamp(pred[8 * pr + pc] + resid[i])
        plane.set_block(cx, cy, 8, out)


# ---------------------------------------------------------------------------
# Fixture encoder
# ---------------------------------------------------------------------------

# The token probabilities the fixture encoder uses; every entry is
# emitted as an in-stream §13.4 update (flags coded under the spec's
# update-prob table).  Values shape the coder toward EOB-and-zero
# heavy blocks, which is what quantized fixtures produce; real-stream
# shapes use default_probs=True instead.
_FIXTURE_TOKEN_PROBS = [224, 130, 150, 160, 170, 180, 190, 160,
                        170, 190, 210]


def _fixture_coeff_probs() -> List:
    probs = _new_coeff_probs()
    for i in range(4):
        for j in range(8):
            for k in range(3):
                probs[i][j][k] = list(_FIXTURE_TOKEN_PROBS)
    return probs


def _token_for(mag: int) -> int:
    if mag <= 4:
        return mag
    for cat in range(6):
        lo = _CAT_BASE[cat]
        hi = lo + (1 << (cat + 1)) - 1 if cat < 5 else lo + 2047
        if lo <= mag <= hi:
            return CAT1 + cat
    raise ValueError(f"coefficient magnitude {mag} out of range")


def _quantize(coeffs: List[int], q_dc: int, q_ac: int,
              first: int) -> List[int]:
    """Zigzag-ordered quantized levels (round half away from zero),
    clamped to the cat6 ceiling."""
    out = [0] * 16
    for i in range(first, 16):
        x = coeffs[_ZIGZAG[i]]
        q = q_dc if i == 0 else q_ac
        n = (2 * abs(x) + q) // (2 * q)
        out[i] = min(n, 2114) * (1 if x >= 0 else -1)
    return out


class _TokenWriter:
    def __init__(self, be: _BoolEncoder, probs: List):
        self.be = be
        self.probs = probs

    def write_block(self, btype: int, first: int, ctx: int,
                    levels: List[int]) -> int:
        """Emit one block's token stream; returns the nz flag."""
        last = -1
        for i in range(15, first - 1, -1):
            if levels[i]:
                last = i
                break
        probs = self.probs[btype]
        i = first
        start = 0
        while i < 16:
            p = probs[_COEFF_BANDS[i]][ctx]
            if i > last:
                # EOB is only reachable with start == 0, which holds:
                # after a DCT_0 there is always a later nonzero (else
                # `last` would precede the zero)
                self.be.tree(_COEFF_PATHS[DCT_EOB], p)
                break
            v = levels[i]
            a = abs(v)
            tok = _token_for(a)
            path = _COEFF_PATHS[tok]
            self.be.tree(path[1:] if start == 2 else path, p)
            if a == 0:
                ctx = 0
                start = 2
            else:
                if tok >= CAT1:
                    cat = tok - CAT1
                    extra = a - _CAT_BASE[cat]
                    cps = _CAT_PROBS[cat]
                    for bi in range(len(cps) - 1, -1, -1):
                        self.be.put(cps[len(cps) - 1 - bi],
                                    (extra >> bi) & 1)
                self.be.put(128, 1 if v < 0 else 0)
                ctx = 2 if a > 1 else 1
                start = 0
            i += 1
        return int(last >= first)


def encode_vp8(width: int, height: int, y: bytes, u: bytes, v: bytes,
               qi: int = 8, mode: str = "dc", n_parts: int = 1,
               return_recon: bool = False, filter_level: int = 0,
               sharpness: int = 0, filter_type: int = 0,
               default_probs: bool = False):
    """Encode YUV 4:2:0 planes as one self-describing VP8 key frame.

    ``mode``: 'dc' / 'v' / 'h' / 'tm' (16x16 prediction for every MB),
    or 'bpred' (4x4 B_PRED, rotating through all ten submodes).  The
    stream mirrors the decoder exactly: reconstruction-based
    prediction, Y2 WHT for 16x16 modes, skip flags for all-zero MBs,
    ``n_parts`` token partitions.  ``filter_level``/``sharpness``/
    ``filter_type`` set the loop-filter header fields (the encoder's
    own recon stays pre-filter, exactly like real encoders — decode
    output then includes the §15 filter).  ``default_probs=True``
    writes NO coefficient-probability updates, token-coding under the
    RFC 6386 §13.5 default table — the shape every real encoder emits.
    """
    assert mode in ("dc", "v", "h", "tm", "bpred")
    assert n_parts in (1, 2, 4, 8)
    assert 0 <= filter_level <= 63 and 0 <= sharpness <= 7
    cw, ch = (width + 1) // 2, (height + 1) // 2
    assert len(y) == width * height and len(u) == cw * ch \
        and len(v) == cw * ch
    mb_w = (width + 15) // 16
    mb_h = (height + 15) // 16
    quants = _resolve_quants(qi, 0, 0, 0, 0, 0)
    probs = (DEFAULT_COEFF_PROBS if default_probs
             else _fixture_coeff_probs())

    def padded(src: bytes, sw: int, sh: int, bs: int, nmb_w: int,
               nmb_h: int) -> List[List[int]]:
        rows = []
        for yy in range(nmb_h * bs):
            sy = min(yy, sh - 1)
            row = [src[sy * sw + min(xx, sw - 1)]
                   for xx in range(nmb_w * bs)]
            rows.append(row)
        return rows

    ysrc = padded(y, width, height, 16, mb_w, mb_h)
    usrc = padded(u, cw, ch, 8, mb_w, mb_h)
    vsrc = padded(v, cw, ch, 8, mb_w, mb_h)

    yp = _Plane(mb_w, mb_h, 16)
    upl = _Plane(mb_w, mb_h, 8)
    vpl = _Plane(mb_w, mb_h, 8)

    hd = _BoolEncoder()
    hd.put(128, 0)                       # color space
    hd.put(128, 0)                       # clamping
    hd.put(128, 0)                       # segmentation disabled
    hd.put(128, 1 if filter_type else 0)
    hd.literal(filter_level, 6)
    hd.literal(sharpness, 3)
    hd.put(128, 0)                       # lf delta disable
    hd.literal({1: 0, 2: 1, 4: 2, 8: 3}[n_parts], 2)
    hd.literal(qi, 7)
    for _ in range(5):
        hd.put(128, 0)                   # no quant deltas
    hd.put(128, 1)                       # refresh entropy probs
    # §13.4: update flags coded under the constant update-prob table;
    # skip the flag-1 path where the fixture prob already equals the
    # RFC default (real encoders do exactly this)
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for li in range(11):
                    up = COEFF_UPDATE_PROBS[i][j][k][li]
                    if probs[i][j][k][li] == \
                            DEFAULT_COEFF_PROBS[i][j][k][li]:
                        hd.put(up, 0)
                    else:
                        hd.put(up, 1)
                        hd.literal(probs[i][j][k][li], 8)
    hd.put(128, 1)                       # mb_no_coeff_skip enabled
    prob_skip = 180
    hd.literal(prob_skip, 8)

    tparts = [_BoolEncoder() for _ in range(n_parts)]
    twriters = [_TokenWriter(be, probs) for be in tparts]

    above_nz = [[0] * 9 for _ in range(mb_w)]
    ymode_id = {"dc": DC_PRED, "v": V_PRED, "h": H_PRED,
                "tm": TM_PRED, "bpred": B_PRED}[mode]
    enc_above_bmode = [[B_DC] * 4 for _ in range(mb_w)]

    for mb_y in range(mb_h):
        left_nz = [0] * 9
        enc_left_bmode = [B_DC] * 4
        tw = twriters[mb_y % n_parts]
        for mb_x in range(mb_w):
            x0, y0 = mb_x * 16, mb_y * 16
            cx0, cy0 = mb_x * 8, mb_y * 8
            up_av, left_av = mb_y > 0, mb_x > 0
            has_y2 = ymode_id != B_PRED

            # ---- analyse: predictions, residual transforms, levels
            if has_y2:
                if ymode_id == DC_PRED:
                    pred = _pred_dc(yp, x0, y0, 16, up_av, left_av)
                elif ymode_id == V_PRED:
                    pred = _pred_v(yp, x0, y0, 16)
                elif ymode_id == H_PRED:
                    pred = _pred_h(yp, x0, y0, 16)
                else:
                    pred = _pred_tm(yp, x0, y0, 16)
                sub_coeffs = []
                dcs = []
                for sb in range(16):
                    r, c = sb // 4, sb % 4
                    resid = [ysrc[y0 + 4 * r + i // 4][x0 + 4 * c
                                                       + i % 4]
                             - pred[16 * (4 * r + i // 4)
                                    + 4 * c + i % 4]
                             for i in range(16)]
                    fc = _fdct4x4(resid)
                    dcs.append(fc[0])
                    sub_coeffs.append(fc)
                y2 = _fwht4x4(dcs)
                y2_lvl = _quantize(y2, quants.y2_dc, quants.y2_ac, 0)
                y2_deq = [y2_lvl[i]
                          * (quants.y2_dc if i == 0 else quants.y2_ac)
                          for i in range(16)]
                y2_rast = [0] * 16
                for i in range(16):
                    y2_rast[_ZIGZAG[i]] = y2_deq[i]
                dc_deq = _iwht4x4(y2_rast)
                y_lvls = [_quantize(fc, quants.y_dc, quants.y_ac, 1)
                          for fc in sub_coeffs]
            else:
                y2_lvl = None
                y_lvls = []      # filled per-subblock below (sequential)
                pred = None

            uv_lvls = []
            uv_preds = []
            for pi, (plane, src) in enumerate(((upl, usrc),
                                               (vpl, vsrc))):
                if ymode_id == B_PRED or ymode_id == DC_PRED:
                    cpred = _pred_dc(plane, cx0, cy0, 8, up_av,
                                     left_av)
                elif ymode_id == V_PRED:
                    cpred = _pred_v(plane, cx0, cy0, 8)
                elif ymode_id == H_PRED:
                    cpred = _pred_h(plane, cx0, cy0, 8)
                else:
                    cpred = _pred_tm(plane, cx0, cy0, 8)
                uv_preds.append(cpred)
                for sb in range(4):
                    r, c = sb // 2, sb % 2
                    resid = [src[cy0 + 4 * r + i // 4][cx0 + 4 * c
                                                       + i % 4]
                             - cpred[8 * (4 * r + i // 4)
                                     + 4 * c + i % 4]
                             for i in range(16)]
                    uv_lvls.append(_quantize(_fdct4x4(resid),
                                             quants.uv_dc,
                                             quants.uv_ac, 0))
            uvmode_id = DC_PRED if ymode_id == B_PRED else ymode_id

            bmodes = [(mb_x + mb_y + sb) % 10 for sb in range(16)] \
                if ymode_id == B_PRED else [B_DC] * 16

            skip = False
            if has_y2:
                skip = (not any(y2_lvl)
                        and not any(any(lv) for lv in y_lvls)
                        and not any(any(lv) for lv in uv_lvls))
            # (B_PRED levels are computed sequentially below, so the
            # skip decision for bpred fixtures is conservatively False)

            # ---- mode stream (first partition)
            hd.put(prob_skip, 1 if skip else 0)
            hd.tree(_KF_YMODE_PATHS[ymode_id], _KF_YMODE_PROB)
            if ymode_id == B_PRED:
                for sb in range(16):
                    r, c = sb // 4, sb % 4
                    ctx_a = enc_above_bmode[mb_x][c] if r == 0 \
                        else bmodes[sb - 4]
                    ctx_l = enc_left_bmode[r] if c == 0 \
                        else bmodes[sb - 1]
                    hd.tree(_BMODE_PATHS[bmodes[sb]],
                            KF_BMODE_PROBS[ctx_a][ctx_l])
            hd.tree(_UV_MODE_PATHS[uvmode_id], _KF_UV_PROB)
            enc_above_bmode[mb_x] = (
                [bmodes[12 + i] for i in range(4)]
                if ymode_id == B_PRED else [_MB_TO_B[ymode_id]] * 4)
            enc_left_bmode = (
                [bmodes[3 + 4 * i] for i in range(4)]
                if ymode_id == B_PRED else [_MB_TO_B[ymode_id]] * 4)

            # ---- tokens + reconstruction (must mirror the decoder)
            if skip:
                for i in range(8):
                    above_nz[mb_x][i] = 0
                    left_nz[i] = 0
                above_nz[mb_x][8] = 0
                left_nz[8] = 0
                out = [0] * 256
                for sb in range(16):
                    r, c = sb // 4, sb % 4
                    resid = _idct4x4([dc_deq[sb]] + [0] * 15)
                    for i in range(16):
                        pr, pc = 4 * r + i // 4, 4 * c + i % 4
                        out[16 * pr + pc] = _clamp(
                            pred[16 * pr + pc] + resid[i])
                yp.set_block(x0, y0, 16, out)
                for pi, plane in ((0, upl), (1, vpl)):
                    plane.set_block(cx0, cy0, 8, [
                        uv_preds[pi][i] for i in range(64)])
            elif has_y2:
                ctx = above_nz[mb_x][8] + left_nz[8]
                nz = tw.write_block(1, 0, ctx, y2_lvl)
                above_nz[mb_x][8] = nz
                left_nz[8] = nz
                out = [0] * 256
                for sb in range(16):
                    r, c = sb // 4, sb % 4
                    ctx = above_nz[mb_x][c] + left_nz[r]
                    nz = tw.write_block(0, 1, ctx, y_lvls[sb])
                    above_nz[mb_x][c] = nz
                    left_nz[r] = nz
                    deq = [0] * 16
                    for i in range(1, 16):
                        deq[_ZIGZAG[i]] = y_lvls[sb][i] * quants.y_ac
                    deq[0] = dc_deq[sb]
                    resid = _idct4x4(deq)
                    for i in range(16):
                        pr, pc = 4 * r + i // 4, 4 * c + i % 4
                        out[16 * pr + pc] = _clamp(
                            pred[16 * pr + pc] + resid[i])
                yp.set_block(x0, y0, 16, out)
            else:
                # B_PRED: sequential per-subblock (prediction depends
                # on reconstruction of earlier subblocks)
                for sb in range(16):
                    r, c = sb // 4, sb % 4
                    bx, by = x0 + 4 * c, y0 + 4 * r
                    bpred = _pred_b(bmodes[sb], yp, bx, by, y0, c, r)
                    resid = [ysrc[by + i // 4][bx + i % 4]
                             - bpred[i] for i in range(16)]
                    lv = _quantize(_fdct4x4(resid), quants.y_dc,
                                   quants.y_ac, 0)
                    ctx = above_nz[mb_x][c] + left_nz[r]
                    nz = tw.write_block(3, 0, ctx, lv)
                    above_nz[mb_x][c] = nz
                    left_nz[r] = nz
                    deq = [0] * 16
                    for i in range(16):
                        deq[_ZIGZAG[i]] = lv[i] * (
                            quants.y_dc if i == 0 else quants.y_ac)
                    rec = _idct4x4(deq)
                    yp.set_block(bx, by, 4, [
                        _clamp(bpred[i] + rec[i]) for i in range(16)])
            if not skip:
                for pi, plane in ((0, upl), (1, vpl)):
                    out = [0] * 64
                    for sb in range(4):
                        r, c = sb // 2, sb % 2
                        idx = 4 + 2 * pi + c
                        lidx = 4 + 2 * pi + r
                        ctx = above_nz[mb_x][idx] + left_nz[lidx]
                        lv = uv_lvls[4 * pi + sb]
                        nz = tw.write_block(2, 0, ctx, lv)
                        above_nz[mb_x][idx] = nz
                        left_nz[lidx] = nz
                        deq = [0] * 16
                        for i in range(16):
                            deq[_ZIGZAG[i]] = lv[i] * (
                                quants.uv_dc if i == 0
                                else quants.uv_ac)
                        rec = _idct4x4(deq)
                        for i in range(16):
                            pr, pc = 4 * r + i // 4, 4 * c + i % 4
                            out[8 * pr + pc] = _clamp(
                                uv_preds[pi][8 * pr + pc] + rec[i])
                    plane.set_block(cx0, cy0, 8, out)
        yp.extend_right(mb_y * 16, 16)
        upl.extend_right(mb_y * 8, 8)
        vpl.extend_right(mb_y * 8, 8)

    first_part = hd.flush()
    token_parts = [be.flush() for be in tparts]
    if return_recon:
        ry = bytes(b for yy in range(height)
                   for b in yp.px[yy + 1][1:1 + width])
        cw2, ch2 = (width + 1) // 2, (height + 1) // 2
        ru = bytes(b for yy in range(ch2)
                   for b in upl.px[yy + 1][1:1 + cw2])
        rv = bytes(b for yy in range(ch2)
                   for b in vpl.px[yy + 1][1:1 + cw2])
        recon = DecodedVp8(width, height, ry, ru, rv)
    else:
        recon = None
    tag = (0 | (0 << 1) | (1 << 4) | (len(first_part) << 5))
    out = bytearray()
    out += bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF))
    out += b"\x9d\x01\x2a"
    out += struct.pack("<HH", width, height)
    out += first_part
    for tp in token_parts[:-1]:
        out += bytes((len(tp) & 0xFF, (len(tp) >> 8) & 0xFF,
                      (len(tp) >> 16) & 0xFF))
    for tp in token_parts:
        out += tp
    return (bytes(out), recon) if return_recon else bytes(out)


# ---------------------------------------------------------------------------
# Color conversion (libwebp's published fixed-point forms) + container
# ---------------------------------------------------------------------------


def _clip8(v: int) -> int:
    v >>= 6
    return 0 if v < 0 else 255 if v > 255 else v


def yuv_to_rgb(yv: int, uv: int, vv: int) -> Tuple[int, int, int]:
    r = _clip8((19077 * yv >> 8) + (26149 * vv >> 8) - 14234)
    g = _clip8((19077 * yv >> 8) - (6419 * uv >> 8)
               - (13320 * vv >> 8) + 8708)
    b = _clip8((19077 * yv >> 8) + (33050 * uv >> 8) - 17685)
    return r, g, b


def rgb_to_y(r: int, g: int, b: int) -> int:
    return (16839 * r + 33059 * g + 6420 * b + (16 << 16) + 32768) >> 16


def rgb_to_u(r: int, g: int, b: int) -> int:
    v = (-9719 * r - 19081 * g + 28800 * b + 32768 + (128 << 16)) >> 16
    return 0 if v < 0 else 255 if v > 255 else v


def rgb_to_v(r: int, g: int, b: int) -> int:
    v = (28800 * r - 24116 * g - 4684 * b + 32768 + (128 << 16)) >> 16
    return 0 if v < 0 else 255 if v > 255 else v


def rgb_to_yuv420(width: int, height: int,
                  rgb: bytes) -> Tuple[bytes, bytes, bytes]:
    """4:2:0 planes; chroma from the 2x2-averaged RGB (rounded), under
    which gray inputs give u = v = 128 exactly."""
    y = bytearray(width * height)
    for i in range(width * height):
        y[i] = rgb_to_y(rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2])
    cw, ch = (width + 1) // 2, (height + 1) // 2
    u = bytearray(cw * ch)
    v = bytearray(cw * ch)
    for cy in range(ch):
        for cx in range(cw):
            rs = gs = bs = n = 0
            for dy in (0, 1):
                for dx in (0, 1):
                    px, py = 2 * cx + dx, 2 * cy + dy
                    if px < width and py < height:
                        k = 3 * (py * width + px)
                        rs += rgb[k]
                        gs += rgb[k + 1]
                        bs += rgb[k + 2]
                        n += 1
            rs = (rs + n // 2) // n
            gs = (gs + n // 2) // n
            bs = (bs + n // 2) // n
            u[cy * cw + cx] = rgb_to_u(rs, gs, bs)
            v[cy * cw + cx] = rgb_to_v(rs, gs, bs)
    return bytes(y), bytes(u), bytes(v)


def vp8_frame_to_rgb(dec: DecodedVp8) -> bytes:
    """Point-sampled chroma upsampling + the fixed-point YUV->RGB."""
    cw = (dec.width + 1) // 2
    out = bytearray(dec.width * dec.height * 3)
    for yy in range(dec.height):
        crow = (yy // 2) * cw
        yrow = yy * dec.width
        for xx in range(dec.width):
            ci = crow + xx // 2
            r, g, b = yuv_to_rgb(dec.y[yrow + xx], dec.u[ci],
                                 dec.v[ci])
            k = 3 * (yrow + xx)
            out[k] = r
            out[k + 1] = g
            out[k + 2] = b
    return bytes(out)


def encode_webp_lossy(width: int, height: int, rgb: bytes,
                      qi: int = 8, mode: str = "dc",
                      n_parts: int = 1,
                      alpha: "bytes | None" = None,
                      alpha_filter: int = 0,
                      filter_level: int = 0, sharpness: int = 0,
                      filter_type: int = 0,
                      default_probs: bool = False) -> bytes:
    """RIFF/WEBP container around one VP8 key frame; with ``alpha``
    (w*h bytes) a VP8X container carrying an ALPH chunk (lossless
    alpha compression, optional prediction filter) precedes it —
    the transparent-lossy-WebP shape (round 5).  Loop-filter and
    default-probability knobs pass through to :func:`encode_vp8`."""
    y, u, v = rgb_to_yuv420(width, height, rgb)
    frame = encode_vp8(width, height, y, u, v, qi=qi, mode=mode,
                       n_parts=n_parts, filter_level=filter_level,
                       sharpness=sharpness, filter_type=filter_type,
                       default_probs=default_probs)
    chunks = bytearray()
    if alpha is not None:
        from .webp_codec import encode_alpha

        vp8x = bytes([0x10, 0, 0, 0]) \
            + (width - 1).to_bytes(3, "little") \
            + (height - 1).to_bytes(3, "little")
        chunks += b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x
        ab = encode_alpha(alpha, width, height, method=1,
                          filt=alpha_filter)
        chunks += b"ALPH" + struct.pack("<I", len(ab)) + ab
        if len(ab) & 1:
            chunks += b"\x00"
    chunks += b"VP8 " + struct.pack("<I", len(frame)) + frame
    if len(frame) & 1:
        chunks += b"\x00"
    riff = b"WEBP" + bytes(chunks)
    return b"RIFF" + struct.pack("<I", len(riff)) + riff

"""Baseline + progressive JPEG codec — pure Python + numpy, no imaging
libraries.

JPEG is the dominant web image format, so the multimodal column's decode
seam (`media_stub.decode_media`) needs a real pixel path for it, not
just the SOF geometry probe.  This module implements the baseline
sequential DCT process of ITU-T T.81 (the only process required of
every JPEG decoder) plus the Huffman progressive process of Annex G —
roughly half of real web JPEGs:

* marker segment walk (APPn/COM skipped, DQT/DHT/DRI/SOF0/1/2/SOS);
* canonical Huffman decode of the entropy-coded segment with 0xFF00
  byte-stuffing and RSTn restart handling;
* DC prediction, run/size AC coefficients (ZRL/EOB), dequantization,
  zigzag reorder, float64 2-D orthonormal IDCT, +128 level shift;
* progressive (SOF2) multi-scan accumulation: spectral selection,
  DC/AC successive approximation with EOB-run skipping and the
  correction-bit refinement model of G.1.2.3, interleaved DC scans in
  MCU order and single-component scans over the A.2.2 block grid;
* chroma upsampling by SAMPLE REPLICATION (nearest neighbor) for
  subsampled components, and JFIF YCbCr -> RGB conversion.

Rounding is pinned everywhere to ``floor(x + 0.5)`` then clamp [0,255]
so results are bit-deterministic across platforms — the contract the
closed-form DuckDB oracle of the ``jpeg_decode`` driver stage replays.

Lossless (SOF3), arithmetic coding, 12-bit precision and hierarchical
processes raise NotImplementedError with the process named — a routed
error column upstream, never an executor crash.

The encoder half exists to make the decoder testable without imaging
libraries: grayscale or YCbCr 4:2:0 baseline JPEGs from raw samples
using the T.81 Annex K example tables (K.1-K.6), plus progressive
variants carrying the SAME quantized coefficients (so progressive and
baseline encodings of one image must decode to identical pixels — the
invariant the tests and the driver oracle check).
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# T.81 Annex K example tables
# ---------------------------------------------------------------------------

QUANT_LUM = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.int64)

QUANT_CHROM = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], dtype=np.int64)

# (bits[1..16], values) per table — the canonical-code description the
# DHT segment carries verbatim
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
          list(range(12)))
DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
            list(range(12)))
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

# orthonormal 8-point DCT-II basis: block = A.T @ coef @ A
_A = np.zeros((8, 8))
for _u in range(8):
    _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
    for _k in range(8):
        _A[_u, _k] = 0.5 * _c * np.cos((2 * _k + 1) * _u * np.pi / 16)


MAX_PIXELS = 1 << 26  # decompression-bomb guard: EOB-heavy entropy data
# expands ~1000x, so header-declared dimensions gate the decode


def _round_half_up(x: np.ndarray) -> np.ndarray:
    return np.floor(x + 0.5)


class DecodedJpeg(NamedTuple):
    width: int
    height: int
    channels: int
    pixels: bytes      # interleaved RGB, or grayscale


# ---------------------------------------------------------------------------
# Huffman machinery (canonical codes from (bits, values))
# ---------------------------------------------------------------------------


def _canonical_codes(bits: List[int], values: List[int]
                     ) -> Dict[int, Tuple[int, int]]:
    """value -> (code, length); codes assigned in T.81 C.2 order."""
    out: Dict[int, Tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffDecoder:
    """(length, code) -> value lookup for the bit-at-a-time decode."""

    def __init__(self, bits: List[int], values: List[int]):
        self.lut: Dict[Tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lut[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first reader over the entropy-coded segment: un-stuffs 0xFF00
    and stops at (reporting) RST/other markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bit = 0
        self.marker: Optional[int] = None

    def _byte(self) -> int:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                return b
            self.marker = nxt
            raise EOFError("marker in entropy data")
        return b

    def read_bit(self) -> int:
        b = self._byte()
        v = (b >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1 + (1 if b == 0xFF else 0)  # skip stuffing zero
        return v

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> int:
        """Skip to the next marker (for RSTn); returns the marker byte."""
        if self.bit:
            self.bit = 0
            self.pos += 1
        while self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0:
            self.pos += 1
        m = self.data[self.pos + 1]
        self.pos += 2
        return m

    def decode_huff(self, dec: _HuffDecoder) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            v = dec.lut.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.12 EXTEND: map ``t`` received bits to a signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _Component(NamedTuple):
    cid: int
    h: int
    v: int
    tq: int


def decode_jpeg(data: bytes) -> DecodedJpeg:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: Dict[int, np.ndarray] = {}
    huff_dc: Dict[int, _HuffDecoder] = {}
    huff_ac: Dict[int, _HuffDecoder] = {}
    comps: List[_Component] = []
    width = height = 0
    restart_interval = 0
    scan_map: List[Tuple[int, int, int]] = []  # comp idx, dc table, ac
    progressive = False
    coefs: List[np.ndarray] = []   # per-comp (by, bx, 64) zigzag store
    preds: List[int] = []

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        seglen = int.from_bytes(data[pos:pos + 2], "big")
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[p:p + 64],
                                        dtype=np.uint8).astype(np.int64)
                    p += 64
                else:
                    tbl = np.frombuffer(seg[p:p + 128],
                                        dtype=">u2").astype(np.int64)
                    p += 128
                full = np.zeros(64, dtype=np.int64)
                full[ZIGZAG] = tbl
                qtables[tq] = full.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                values = list(seg[p + 17:p + 17 + nv])
                dec = _HuffDecoder(bits, values)
                (huff_dc if tc == 0 else huff_ac)[th] = dec
                p += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            if seg[0] != 8:
                raise NotImplementedError("only 8-bit precision supported")
            progressive = marker == 0xC2
            height = int.from_bytes(seg[1:3], "big")
            width = int.from_bytes(seg[3:5], "big")
            if width * height > MAX_PIXELS:
                raise ValueError(
                    f"JPEG dimensions {width}x{height} exceed the "
                    f"{MAX_PIXELS}-pixel decode guard "
                    "(decompression-bomb protection)")
            nc = seg[5]
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append(_Component(cid, hv >> 4, hv & 0xF, tq))
            if progressive:
                hmax = max(c.h for c in comps)
                vmax = max(c.v for c in comps)
                mcux = -(-width // (8 * hmax))
                mcuy = -(-height // (8 * vmax))
                coefs = [np.zeros((mcuy * c.v, mcux * c.h, 64),
                                  dtype=np.int64) for c in comps]
                preds = [0] * len(comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG process 0xFF{marker:02X} (lossless/arithmetic/"
                "hierarchical) not supported")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[:2], "big")
        elif marker == 0xDA:  # SOS
            if progressive:
                pos = _decode_progressive_scan(
                    data, pos + seglen, seg, comps, coefs, preds,
                    width, height, huff_dc, huff_ac, restart_interval)
                continue
            ns = seg[0]
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                ci = next(j for j, c in enumerate(comps) if c.cid == cs)
                scan_map.append((ci, tables >> 4, tables & 0xF))
            pos += seglen
            return _decode_scan(data, pos, width, height, comps, scan_map,
                                qtables, huff_dc, huff_ac,
                                restart_interval)
        pos += seglen
    if progressive and coefs:
        return _orient(_finish_progressive(comps, coefs, qtables,
                                           width, height), data)
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, width, height, comps, scan_map, qtables,
                 huff_dc, huff_ac, restart_interval) -> DecodedJpeg:
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    planes = [np.zeros((mcuy * c.v * 8, mcux * c.h * 8)) for c in comps]
    pred = [0] * len(comps)
    r = _BitReader(data, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                m = r.align_to_marker()
                if not 0xD0 <= m <= 0xD7:
                    raise ValueError("expected RST marker")
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, tdc, tac in scan_map:
                c = comps[ci]
                for by in range(c.v):
                    for bx in range(c.h):
                        coef = np.zeros(64, dtype=np.int64)
                        try:
                            t = r.decode_huff(huff_dc[tdc])
                            diff = _extend(r.read_bits(t), t)
                            pred[ci] += diff
                            coef[0] = pred[ci]
                            k = 1
                            while k < 64:
                                rs = r.decode_huff(huff_ac[tac])
                                rl, sz = rs >> 4, rs & 0xF
                                if sz == 0:
                                    if rl == 15:
                                        k += 16
                                        continue
                                    break  # EOB
                                k += rl
                                if k > 63:
                                    raise ValueError("AC run overflow")
                                coef[k] = _extend(r.read_bits(sz), sz)
                                k += 1
                        except EOFError:
                            raise ValueError("truncated entropy data")
                        q = qtables[c.tq]
                        blk = np.zeros(64, dtype=np.int64)
                        blk[ZIGZAG] = coef
                        dq = blk.reshape(8, 8) * q
                        px = _A.T @ dq.astype(float) @ _A + 128.0
                        px = np.clip(_round_half_up(px), 0, 255)
                        y0 = (my * c.v + by) * 8
                        x0 = (mx * c.h + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px

    return _orient(_assemble(comps, planes, width, height, hmax,
                             vmax), data)


def _assemble(comps, planes, width, height, hmax, vmax) -> DecodedJpeg:
    """Upsample by sample replication to full MCU-padded resolution,
    crop, and (for 3 components) JFIF YCbCr -> RGB convert — shared by
    the baseline and progressive paths."""
    full = []
    for c, p in zip(comps, planes):
        fy, fx = vmax // c.v, hmax // c.h
        up = np.repeat(np.repeat(p, fy, axis=0), fx, axis=1)
        full.append(up[:height, :width])
    if len(comps) == 1:
        pix = full[0].astype(np.uint8).tobytes()
        return DecodedJpeg(width, height, 1, pix)
    if len(comps) != 3:
        raise NotImplementedError(f"{len(comps)}-component JPEG")
    y, cb, cr = full
    r_ = y + 1.402 * (cr - 128.0)
    g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r_, g_, b_], axis=-1)
    rgb = np.clip(_round_half_up(rgb), 0, 255).astype(np.uint8)
    return DecodedJpeg(width, height, 3, rgb.tobytes())


# ---------------------------------------------------------------------------
# Progressive decoding (T.81 Annex G, Huffman successive approximation)
# ---------------------------------------------------------------------------


def _comp_block_grid(c, width, height, hmax, vmax) -> Tuple[int, int]:
    """Non-interleaved block grid of one component (T.81 A.2.2): the
    ceil-8 grid of the component's OWN dimensions — NOT the MCU-padded
    grid interleaved scans cover."""
    cw = -(-width * c.h // hmax)
    ch = -(-height * c.v // vmax)
    return -(-cw // 8), -(-ch // 8)


def _decode_progressive_scan(data, pos, seg, comps, coefs, preds,
                             width, height, huff_dc, huff_ac,
                             restart_interval) -> int:
    """Decode one progressive SOS into the per-component zigzag
    coefficient stores; returns the byte offset of the next marker.

    DC scans (Ss=0) may interleave several components in MCU order
    (non-interleaved block order when the scan holds one component);
    first scans (Ah=0) Huffman-decode the point-transformed DC diffs,
    refinement scans append one bit per block.  AC scans hold exactly
    one component and walk its own block grid with EOB-run skipping
    (first scans) or the correction-bit algorithm of G.1.2.3
    (refinement scans).  RSTn markers reset DC predictors and the EOB
    run."""
    ns = seg[0]
    scomps = []
    for i in range(ns):
        cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
        ci = next(j for j, c in enumerate(comps) if c.cid == cs)
        scomps.append((ci, tables >> 4, tables & 0xF))
    ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
    a = seg[3 + 2 * ns]
    ah, al = a >> 4, a & 0xF
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    r = _BitReader(data, pos)
    for i in range(len(preds)):
        preds[i] = 0  # DC prediction restarts per scan
    state = {"eobrun": 0}

    def dc_unit(ci: int, tdc: int, by: int, bx: int):
        blk = coefs[ci][by, bx]
        if ah == 0:
            t = r.decode_huff(huff_dc[tdc])
            preds[ci] += _extend(r.read_bits(t), t)
            blk[0] = preds[ci] << al
        else:
            if r.read_bit():
                blk[0] |= 1 << al

    def restart(unit_idx: int, total_units: int):
        if (restart_interval and unit_idx
                and unit_idx % restart_interval == 0
                and unit_idx < total_units):
            m = r.align_to_marker()
            if not 0xD0 <= m <= 0xD7:
                raise ValueError("expected RST marker")
            for i in range(len(preds)):
                preds[i] = 0
            state["eobrun"] = 0

    if ss == 0:
        if se != 0:
            raise ValueError("DC scan with Se != 0")
        if ns > 1:  # interleaved MCU order
            mcux = -(-width // (8 * hmax))
            mcuy = -(-height // (8 * vmax))
            n_mcu = mcux * mcuy
            for m_i in range(n_mcu):
                restart(m_i, n_mcu)
                my, mx = divmod(m_i, mcux)
                for ci, tdc, _tac in scomps:
                    c = comps[ci]
                    for by in range(c.v):
                        for bx in range(c.h):
                            dc_unit(ci, tdc,
                                    my * c.v + by, mx * c.h + bx)
        else:  # single component: non-interleaved over its own grid
            ci, tdc, _tac = scomps[0]
            c = comps[ci]
            bw, bh = _comp_block_grid(c, width, height, hmax, vmax)
            for u in range(bh * bw):
                restart(u, bh * bw)
                by, bx = divmod(u, bw)
                dc_unit(ci, tdc, by, bx)
    else:
        if ns != 1:
            raise ValueError("interleaved AC scan")
        ci, _tdc, tac = scomps[0]
        c = comps[ci]
        dec = huff_ac[tac]
        bw, bh = _comp_block_grid(c, width, height, hmax, vmax)
        for u in range(bh * bw):
            restart(u, bh * bw)
            by, bx = divmod(u, bw)
            blk = coefs[ci][by, bx]
            if ah == 0:
                state["eobrun"] = _ac_first_block(
                    r, blk, ss, se, al, dec, state["eobrun"])
            else:
                state["eobrun"] = _ac_refine_block(
                    r, blk, ss, se, al, dec, state["eobrun"])
    # locate the next marker after the entropy-coded segment
    p = r.pos
    if r.bit:
        p += 2 if data[p] == 0xFF else 1
    while p + 1 < len(data) and (data[p] != 0xFF
                                 or data[p + 1] == 0x00):
        p += 1
    while p + 1 < len(data) and data[p + 1] == 0xFF:
        p += 1  # 0xFF fill bytes before the marker
    return p


def _ac_first_block(r, blk, ss, se, al, dec, eobrun) -> int:
    """First AC scan for one block (G.1.2.2): run/size pairs with the
    point transform, EOBn codes skipping 2^rl-1+bits further blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = r.decode_huff(dec)
        rl, sz = rs >> 4, rs & 0xF
        if sz == 0:
            if rl == 15:
                k += 16
                continue
            eobrun = (1 << rl) - 1
            if rl:
                eobrun += r.read_bits(rl)
            return eobrun
        k += rl
        if k > se:
            raise ValueError("AC run overflow")
        blk[k] = _extend(r.read_bits(sz), sz) << al
        k += 1
    return 0


def _ac_refine_block(r, blk, ss, se, al, dec, eobrun) -> int:
    """AC refinement scan for one block (G.1.2.3): newly-nonzero
    coefficients arrive as +-1 at bit ``al``; every already-nonzero
    coefficient in the band consumes one correction bit as it is
    passed (also inside EOB runs and ZRL skips)."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = r.decode_huff(dec)
            rl, sz = rs >> 4, rs & 0xF
            val = 0
            if sz == 0:
                if rl != 15:
                    eobrun = 1 << rl
                    if rl:
                        eobrun += r.read_bits(rl)
                    break
            else:
                if sz != 1:
                    raise ValueError("bad AC refinement size")
                val = p1 if r.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    if r.read_bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if rl == 0:
                        break
                    rl -= 1
                k += 1
            if k <= se and val:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0:
                if r.read_bit() and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _finish_progressive(comps, coefs, qtables, width, height
                        ) -> DecodedJpeg:
    """Dequantize + IDCT the accumulated coefficient stores (vectorized
    over the whole block grid) and assemble exactly as baseline."""
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    planes = []
    for c, cf in zip(comps, coefs):
        bh, bw = cf.shape[0], cf.shape[1]
        blk = np.zeros((bh, bw, 64), dtype=np.int64)
        blk[:, :, ZIGZAG] = cf
        dq = blk.reshape(bh, bw, 8, 8) * qtables[c.tq]
        px = _A.T @ dq.astype(float) @ _A + 128.0
        px = np.clip(_round_half_up(px), 0, 255)
        planes.append(px.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8))
    return _assemble(comps, planes, width, height, hmax, vmax)


def exif_orientation(data: bytes) -> int:
    """Tag 274 from an APP1 Exif segment (round 5): the embedded Exif
    body is a TIFF IFD, parsed by the shared tiff_codec reader; 1
    (upright) when absent or unparseable — metadata must never make an
    otherwise-decodable image fail."""
    import struct as _st

    pos = 2
    n = len(data)
    while pos + 4 <= n and data[pos] == 0xFF:
        marker = data[pos + 1]
        pos += 2
        if marker in (0x01,) or 0xD0 <= marker <= 0xD8:
            continue
        if marker in (0xD9, 0xDA):
            break
        seglen = int.from_bytes(data[pos:pos + 2], "big")
        seg = data[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xE1 and seg[:6] == b"Exif\x00\x00":
            t = seg[6:]
            fmt = "<" if t[:2] == b"II" else \
                ">" if t[:2] == b"MM" else None
            if fmt is None:
                return 1
            try:
                from .tiff_codec import _read_ifd

                (off,) = _st.unpack_from(fmt + "I", t, 4)
                o = _read_ifd(t, fmt, off).get(274, [1])[0]
                return o if 1 <= o <= 8 else 1
            except Exception:
                return 1
    return 1


def orient_pixels(width: int, height: int, channels: int,
                  pixels: bytes, o: int):
    """Apply Exif orientation ``o`` (2-8) to an interleaved pixel
    buffer the way browsers do; returns (width, height, pixels).
    Shared by the JPEG and WebP decode paths so pHash dedup sees the
    upright image whichever container carried the tag."""
    a = np.frombuffer(pixels, np.uint8).reshape(height, width, channels)
    if o == 2:
        a = a[:, ::-1]
    elif o == 3:
        a = a[::-1, ::-1]
    elif o == 4:
        a = a[::-1]
    elif o == 5:                         # transpose (TL-BR mirror)
        a = a.transpose(1, 0, 2)
    elif o == 6:                         # rotate 90 CW
        a = a.transpose(1, 0, 2)[:, ::-1]
    elif o == 7:                         # transverse
        a = a.transpose(1, 0, 2)[::-1, ::-1]
    else:                                # 8: rotate 270 CW
        a = a.transpose(1, 0, 2)[::-1]
    return a.shape[1], a.shape[0], np.ascontiguousarray(a).tobytes()


def _orient(dec: DecodedJpeg, data: bytes) -> DecodedJpeg:
    """Apply the Exif orientation the way browsers do, so pixel
    consumers (pHash dedup above all) see the upright image."""
    o = exif_orientation(data)
    if o <= 1:
        return dec
    w2, h2, px = orient_pixels(dec.width, dec.height, dec.channels,
                               dec.pixels, o)
    return DecodedJpeg(w2, h2, dec.channels, px)


def make_exif_app1(orientation: int, big_endian: bool = False) -> bytes:
    """Fixture APP1 Exif segment carrying only tag 274."""
    import struct as _st

    fmt = ">" if big_endian else "<"
    tiff = (b"MM" if big_endian else b"II") \
        + _st.pack(fmt + "HI", 0x2A, 8) \
        + _st.pack(fmt + "H", 1) \
        + _st.pack(fmt + "HHI", 274, 3, 1) \
        + _st.pack(fmt + "HH", orientation, 0) \
        + _st.pack(fmt + "I", 0)
    body = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + _st.pack(">H", len(body) + 2) + body


# ---------------------------------------------------------------------------
# Encoder (fixture generator)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self):
        if self.nbits:
            self.acc = (self.acc << (8 - self.nbits)) | ((1 << (8 - self.nbits)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


def _category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _encode_block(w: _BitWriter, coef: np.ndarray, pred: int,
                  dc_codes, ac_codes) -> int:
    """Quantized zigzag coefficients -> entropy bits; returns new pred."""
    dc = int(coef[0])
    diff = dc - pred
    t = _category(diff)
    code, ln = dc_codes[t]
    w.write(code, ln)
    if t:
        w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = max([k for k in range(1, 64) if coef[k]] or [0])
    for k in range(1, 64):
        v = int(coef[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        sz = _category(v)
        code, ln = ac_codes[(run << 4) | sz]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << sz) - 1, sz)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        w.write(code, ln)
    return dc


def _fdct_quant(samples: np.ndarray, q: np.ndarray) -> np.ndarray:
    """8x8 spatial block -> quantized zigzag coefficient vector.

    The DC term is computed in EXACT integer arithmetic: the orthonormal
    DCT's DC is exactly sum(x)/8, and float evaluation puts flat blocks
    exactly on the round-half boundary where float noise flips the
    result — the exactness the closed-form decode oracle depends on.
    AC terms use float (their boundaries are measure-zero and the
    decoder replays whatever the encoder chose)."""
    x = samples.astype(float) - 128.0
    X = _A @ x @ _A.T
    quant = np.sign(X) * np.floor(np.abs(X) / q + 0.5)
    zz = quant.astype(np.int64).flatten()[ZIGZAG]
    s = int(samples.astype(np.int64).sum()) - 128 * 64
    q00 = int(q[0, 0])
    mag = (2 * abs(s) + 8 * q00) // (16 * q00)
    zz[0] = mag if s >= 0 else -mag
    return zz


def _pad_edge(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    h, w = plane.shape
    out = np.empty((bh, bw), dtype=plane.dtype)
    out[:h, :w] = plane
    out[h:, :w] = plane[h - 1:h, :]
    out[:h, w:] = plane[:, w - 1:w]
    out[h:, w:] = plane[h - 1, w - 1]
    return out


def _dqt_segment(tq: int, q: np.ndarray) -> bytes:
    zz = q.reshape(64)[ZIGZAG]
    return (b"\xff\xdb" + (2 + 1 + 64).to_bytes(2, "big")
            + bytes([tq]) + bytes(int(v) for v in zz))


def _dht_segment(tc: int, th: int, table) -> bytes:
    bits, values = table
    payload = bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
    return b"\xff\xc4" + (2 + len(payload)).to_bytes(2, "big") + payload


def encode_jpeg_gray(width: int, height: int, samples: bytes) -> bytes:
    """Baseline grayscale JPEG from row-major 8-bit samples."""
    plane = np.frombuffer(samples, dtype=np.uint8).reshape(height, width)
    bh, bw = -(-height // 8) * 8, -(-width // 8) * 8
    padded = _pad_edge(plane, bh, bw)
    dc_codes = _canonical_codes(*DC_LUM)
    ac_codes = _canonical_codes(*AC_LUM)
    w = _BitWriter()
    pred = 0
    for y0 in range(0, bh, 8):
        for x0 in range(0, bw, 8):
            coef = _fdct_quant(padded[y0:y0 + 8, x0:x0 + 8], QUANT_LUM)
            pred = _encode_block(w, coef, pred, dc_codes, ac_codes)
    w.flush()
    sof = (b"\xff\xc0" + (2 + 6 + 3).to_bytes(2, "big") + bytes([8])
           + height.to_bytes(2, "big") + width.to_bytes(2, "big")
           + bytes([1, 1, 0x11, 0]))
    sos = (b"\xff\xda" + (2 + 1 + 2 + 3).to_bytes(2, "big")
           + bytes([1, 1, 0x00, 0, 63, 0]))
    return (b"\xff\xd8" + _dqt_segment(0, QUANT_LUM)
            + _dht_segment(0, 0, DC_LUM) + _dht_segment(1, 0, AC_LUM)
            + sof + sos + bytes(w.out) + b"\xff\xd9")


def encode_jpeg_ycbcr420(width: int, height: int, y: bytes, cb: bytes,
                         cr: bytes) -> bytes:
    """Baseline 4:2:0 color JPEG from row-major planes: ``y`` is
    width x height; ``cb``/``cr`` are ceil(w/2) x ceil(h/2)."""
    cw, ch = -(-width // 2), -(-height // 2)
    yp = np.frombuffer(y, dtype=np.uint8).reshape(height, width)
    cbp = np.frombuffer(cb, dtype=np.uint8).reshape(ch, cw)
    crp = np.frombuffer(cr, dtype=np.uint8).reshape(ch, cw)
    mcux, mcuy = -(-width // 16), -(-height // 16)
    ypad = _pad_edge(yp, mcuy * 16, mcux * 16)
    cbpad = _pad_edge(cbp, mcuy * 8, mcux * 8)
    crpad = _pad_edge(crp, mcuy * 8, mcux * 8)
    dcl, acl = _canonical_codes(*DC_LUM), _canonical_codes(*AC_LUM)
    dcc, acc = _canonical_codes(*DC_CHROM), _canonical_codes(*AC_CHROM)
    w = _BitWriter()
    preds = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for by in range(2):
                for bx in range(2):
                    y0, x0 = my * 16 + by * 8, mx * 16 + bx * 8
                    coef = _fdct_quant(ypad[y0:y0 + 8, x0:x0 + 8],
                                       QUANT_LUM)
                    preds[0] = _encode_block(w, coef, preds[0], dcl, acl)
            for ci, plane in ((1, cbpad), (2, crpad)):
                y0, x0 = my * 8, mx * 8
                coef = _fdct_quant(plane[y0:y0 + 8, x0:x0 + 8],
                                   QUANT_CHROM)
                preds[ci] = _encode_block(w, coef, preds[ci], dcc, acc)
    w.flush()
    sof = (b"\xff\xc0" + (2 + 6 + 9).to_bytes(2, "big") + bytes([8])
           + height.to_bytes(2, "big") + width.to_bytes(2, "big")
           + bytes([3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]))
    sos = (b"\xff\xda" + (2 + 1 + 6 + 3).to_bytes(2, "big")
           + bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return (b"\xff\xd8" + _dqt_segment(0, QUANT_LUM)
            + _dqt_segment(1, QUANT_CHROM)
            + _dht_segment(0, 0, DC_LUM) + _dht_segment(1, 0, AC_LUM)
            + _dht_segment(0, 1, DC_CHROM) + _dht_segment(1, 1, AC_CHROM)
            + sof + sos + bytes(w.out) + b"\xff\xd9")


# ---------------------------------------------------------------------------
# Progressive encoder (fixture generator for the Annex-G decoder)
# ---------------------------------------------------------------------------

# Flat 8-bit AC table holding every (run<<4 | size) symbol for sizes
# 0..10 — canonical, 176 codes of length 8 (Kraft 176/256 < 1; the
# all-ones code stays unused), so EOBn (n = run, size 0) and ZRL are
# all encodable.  The K.5 tables lack EOBn for n >= 1, which progressive
# EOB-run coding needs.
PROG_AC = ([0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0],
           [(rl << 4) | sz for rl in range(16) for sz in range(11)])


class _ProgScanWriter:
    """Per-scan encoder state (G.1.2.3): the bit writer, the pending
    EOB run, and TWO correction-bit buffers — ``be`` holds bits owed to
    the pending EOB run (emitted right after its EOBn code) and ``br``
    the current block's bits (emitted right after the current block's
    next symbol).  The split matters: the decoder reads a block's
    pre-symbol history bits during that block's first symbol span, not
    as part of the earlier EOB run."""

    def __init__(self, w: _BitWriter, ac_codes):
        self.w = w
        self.ac = ac_codes
        self.eobrun = 0
        self.be: List[int] = []   # bits riding behind the pending EOBn
        self.br: List[int] = []   # bits of the current block

    def flush_eob(self):
        """Emit the pending EOBn code + its buffered correction bits.
        Must run before any symbol of an uncovered block, and at scan
        end / restart boundaries."""
        if self.eobrun:
            rl = self.eobrun.bit_length() - 1
            if rl > 14:
                raise ValueError("EOB run too long for one code")
            code, ln = self.ac[rl << 4]
            self.w.write(code, ln)
            if rl:
                self.w.write(self.eobrun - (1 << rl), rl)
            self.eobrun = 0
            for b in self.be:
                self.w.write(b, 1)
            self.be = []

    def emit_br(self):
        for b in self.br:
            self.w.write(b, 1)
        self.br = []

    def end_block_covered(self):
        """The rest of this block (or all of it) is EOB-covered: its
        buffered bits transfer to the EOB-run buffer."""
        self.eobrun += 1
        self.be.extend(self.br)
        self.br = []
        if self.eobrun == 0x7FFF:
            self.flush_eob()

    def symbol(self, sym: int):
        code, ln = self.ac[sym]
        self.w.write(code, ln)


def _enc_ac_first(pw: _ProgScanWriter, coef, ss, se, al):
    r = 0
    for k in range(ss, se + 1):
        v = int(coef[k])
        t = abs(v) >> al
        if t == 0:
            r += 1
            continue
        pw.flush_eob()
        while r > 15:
            pw.symbol(0xF0)  # ZRL
            r -= 16
        sz = t.bit_length()
        pw.symbol((r << 4) | sz)
        sv = t if v >= 0 else -t
        pw.w.write(sv if sv >= 0 else sv + (1 << sz) - 1, sz)
        r = 0
    if r > 0:
        pw.end_block_covered()


def _enc_ac_refine(pw: _ProgScanWriter, coef, ss, se, al):
    p1 = 1 << al
    # index of the last NEWLY visible coefficient (|coef|>>al == 1);
    # runs beyond it are EOB-covered, never ZRL-coded
    eob_at = ss - 1
    for k in range(ss, se + 1):
        if abs(int(coef[k])) >> al == 1:
            eob_at = k
    r = 0
    for k in range(ss, se + 1):
        v = int(coef[k])
        t = abs(v) >> al
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob_at:
            pw.flush_eob()
            pw.symbol(0xF0)
            r -= 16
            pw.emit_br()
        if t > 1:
            # history coefficient: correction bit rides behind this
            # block's next symbol (or its EOB run)
            pw.br.append(t & 1)
            continue
        # newly visible +-1
        pw.flush_eob()
        pw.symbol((r << 4) | 1)
        pw.w.write(1 if v >= 0 else 0, 1)
        pw.emit_br()
        r = 0
    if r > 0 or pw.br:
        pw.end_block_covered()
    del p1


def _enc_dc_first(w: _BitWriter, coef, pred: int, al: int,
                  dc_codes) -> int:
    tv = int(coef[0]) >> al  # arithmetic shift: the DC point transform
    diff = tv - pred
    t = _category(diff)
    code, ln = dc_codes[t]
    w.write(code, ln)
    if t:
        w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    return tv


def _sof2(width, height, comp_specs) -> bytes:
    body = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    body += bytes([len(comp_specs)])
    for cid, hv, tq in comp_specs:
        body += bytes([cid, hv, tq])
    return b"\xff\xc2" + (2 + len(body)).to_bytes(2, "big") + body


def _sos_prog(comp_tables, ss, se, ah, al) -> bytes:
    body = bytes([len(comp_tables)])
    for cs, tdc, tac in comp_tables:
        body += bytes([cs, (tdc << 4) | tac])
    body += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + (2 + len(body)).to_bytes(2, "big") + body


def encode_jpeg_gray_progressive(width: int, height: int,
                                 samples: bytes,
                                 restart_interval: int = 0) -> bytes:
    """Progressive grayscale JPEG carrying the SAME quantized
    coefficients as :func:`encode_jpeg_gray` — decoding either must
    yield identical pixels, which is what the tests and the driver
    oracle exploit.  The scan script exercises every Annex-G decode
    path: DC successive approximation (first Al=1 + refinement), AC
    spectral-selection first scans at Al=2 with EOB runs and ZRL, two
    AC refinement passes, then the final full-band refinement to
    Al=0.  ``restart_interval`` > 0 additionally emits DRI/RSTn with
    per-interval predictor and EOB-run resets."""
    plane = np.frombuffer(samples, dtype=np.uint8).reshape(height, width)
    bh8, bw8 = -(-height // 8) * 8, -(-width // 8) * 8
    padded = _pad_edge(plane, bh8, bw8)
    blocks = []
    for y0 in range(0, bh8, 8):
        for x0 in range(0, bw8, 8):
            blocks.append(_fdct_quant(padded[y0:y0 + 8, x0:x0 + 8],
                                      QUANT_LUM))
    dc_codes = _canonical_codes(*DC_LUM)
    ac_codes = _canonical_codes(*PROG_AC)
    out = bytearray(b"\xff\xd8")
    out += _dqt_segment(0, QUANT_LUM)
    out += _dht_segment(0, 0, DC_LUM)
    out += _dht_segment(1, 0, PROG_AC)
    if restart_interval:
        out += (b"\xff\xdd" + (4).to_bytes(2, "big")
                + restart_interval.to_bytes(2, "big"))
    out += _sof2(width, height, [(1, 0x11, 0)])

    rst = [0]  # rolling RSTn modulant

    def scan(ss, se, ah, al):
        out.extend(_sos_prog([(1, 0, 0)], ss, se, ah, al))
        w = _BitWriter()
        pw = _ProgScanWriter(w, ac_codes)
        pred = 0
        for i, coef in enumerate(blocks):
            if (restart_interval and i
                    and i % restart_interval == 0):
                pw.flush_eob()
                w.flush()
                out.extend(bytes(w.out))
                out.extend(bytes([0xFF, 0xD0 + rst[0]]))
                rst[0] = (rst[0] + 1) % 8
                w.out.clear()
                pred = 0
            if ss == 0:
                if ah == 0:
                    pred = _enc_dc_first(w, coef, pred, al, dc_codes)
                else:
                    w.write((int(coef[0]) >> al) & 1, 1)
            elif ah == 0:
                _enc_ac_first(pw, coef, ss, se, al)
            else:
                _enc_ac_refine(pw, coef, ss, se, al)
        pw.flush_eob()
        w.flush()
        out.extend(bytes(w.out))

    scan(0, 0, 0, 1)      # DC first, Al=1
    scan(1, 5, 0, 2)      # AC 1-5 first, Al=2
    scan(6, 63, 0, 2)     # AC 6-63 first, Al=2
    scan(0, 0, 1, 0)      # DC refinement
    scan(1, 5, 2, 1)      # AC 1-5 refine 2->1
    scan(6, 63, 2, 1)     # AC 6-63 refine 2->1
    scan(1, 63, 1, 0)     # full-band refine 1->0
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_ycbcr420_progressive(width: int, height: int, y: bytes,
                                     cb: bytes, cr: bytes) -> bytes:
    """Progressive 4:2:0 color JPEG with the same quantized
    coefficients as :func:`encode_jpeg_ycbcr420`: an interleaved
    3-component DC first scan (MCU order, Al=1), full-band AC first
    scans per component in non-interleaved block order (the A.2.2
    grids the subsampled chroma components make non-trivial), and an
    interleaved DC refinement scan."""
    cw, ch = -(-width // 2), -(-height // 2)
    yp = np.frombuffer(y, dtype=np.uint8).reshape(height, width)
    cbp = np.frombuffer(cb, dtype=np.uint8).reshape(ch, cw)
    crp = np.frombuffer(cr, dtype=np.uint8).reshape(ch, cw)
    mcux, mcuy = -(-width // 16), -(-height // 16)
    ypad = _pad_edge(yp, mcuy * 16, mcux * 16)
    cbpad = _pad_edge(cbp, mcuy * 8, mcux * 8)
    crpad = _pad_edge(crp, mcuy * 8, mcux * 8)
    # quantized coefficient grids (padded MCU coverage for Y; chroma
    # grids are their MCU grids too at 4:2:0)
    ycf = {}
    for by in range(mcuy * 2):
        for bx in range(mcux * 2):
            ycf[by, bx] = _fdct_quant(
                ypad[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8], QUANT_LUM)
    ccf = {}
    for idx, plane in ((1, cbpad), (2, crpad)):
        for by in range(mcuy):
            for bx in range(mcux):
                ccf[idx, by, bx] = _fdct_quant(
                    plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8],
                    QUANT_CHROM)
    dcl = _canonical_codes(*DC_LUM)
    dcc = _canonical_codes(*DC_CHROM)
    ac_codes = _canonical_codes(*PROG_AC)
    out = bytearray(b"\xff\xd8")
    out += _dqt_segment(0, QUANT_LUM) + _dqt_segment(1, QUANT_CHROM)
    out += _dht_segment(0, 0, DC_LUM) + _dht_segment(0, 1, DC_CHROM)
    out += _dht_segment(1, 0, PROG_AC)
    out += _sof2(width, height, [(1, 0x22, 0), (2, 0x11, 1),
                                 (3, 0x11, 1)])

    # scan 1: interleaved DC first, Al=1
    out += _sos_prog([(1, 0, 0), (2, 1, 0), (3, 1, 0)], 0, 0, 0, 1)
    w = _BitWriter()
    preds = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for by in range(2):
                for bx in range(2):
                    preds[0] = _enc_dc_first(
                        w, ycf[my * 2 + by, mx * 2 + bx], preds[0], 1,
                        dcl)
            preds[1] = _enc_dc_first(w, ccf[1, my, mx], preds[1], 1, dcc)
            preds[2] = _enc_dc_first(w, ccf[2, my, mx], preds[2], 1, dcc)
    w.flush()
    out += bytes(w.out)

    # scans 2-4: per-component full-band AC first scans, Al=0, walking
    # each component's OWN non-interleaved grid
    comp_geom = {
        1: (-(-width // 8), -(-height // 8), lambda by, bx: ycf[by, bx]),
        2: (-(-cw // 8), -(-ch // 8), lambda by, bx: ccf[1, by, bx]),
        3: (-(-cw // 8), -(-ch // 8), lambda by, bx: ccf[2, by, bx]),
    }
    for cid in (1, 2, 3):
        bw_, bh_, get = comp_geom[cid]
        out += _sos_prog([(cid, 0, 0)], 1, 63, 0, 0)
        w = _BitWriter()
        pw = _ProgScanWriter(w, ac_codes)
        for u in range(bh_ * bw_):
            by, bx = divmod(u, bw_)
            _enc_ac_first(pw, get(by, bx), 1, 63, 0)
        pw.flush_eob()
        w.flush()
        out += bytes(w.out)

    # scan 5: interleaved DC refinement (Ah=1, Al=0)
    out += _sos_prog([(1, 0, 0), (2, 1, 0), (3, 1, 0)], 0, 0, 1, 0)
    w = _BitWriter()
    for my in range(mcuy):
        for mx in range(mcux):
            for by in range(2):
                for bx in range(2):
                    w.write(int(ycf[my * 2 + by, mx * 2 + bx][0]) & 1, 1)
            w.write(int(ccf[1, my, mx][0]) & 1, 1)
            w.write(int(ccf[2, my, mx][0]) & 1, 1)
    w.flush()
    out += bytes(w.out)
    out += b"\xff\xd9"
    return bytes(out)

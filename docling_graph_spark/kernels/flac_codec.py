"""FLAC lossless audio codec — pure Python, no audio libraries.

Compressed audio on real crawls is MP3/OGG/FLAC; of the three, FLAC is
the lossless one and fully integer-exact, so it can join the
multimodal column's REAL decode family (the same argument that brought
PNG/GIF/BMP/VP8L in).  This module implements the public FLAC format
specification (RFC 9639):

* stream walk: ``fLaC`` magic, metadata blocks (STREAMINFO parsed,
  the rest skipped), then frames to EOF;
* MSB-first bit reader; frame headers with the UTF-8-style coded
  frame/sample number, all block-size/sample-rate code forms, and
  CRC-8 verification (poly 0x07);
* subframes: CONSTANT, VERBATIM, FIXED orders 0-4, and LPC up to
  order 32 (signed quantized coefficients, arithmetic-shift
  prediction) with wasted-bits unpacking;
* rice-coded residuals (4- and 5-bit parameter forms, partition
  orders, the escape-to-raw form), zigzag decode;
* stereo decorrelation: left/side, right/side, and mid/side (side
  carries +1 bit), interleaved output;
* frame CRC-16 verification (poly 0x8005).

All arithmetic is exact integers — decoded samples are bit-identical
to the encoder's input by the format's definition, which is what lets
the driver oracle predict every sample closed-form.

The encoder half is the fixture generator: real FLAC streams using
CONSTANT / VERBATIM / FIXED / LPC subframes and rice-coded residuals
(parameter chosen per partition), with correct CRCs — so every decoder
path is testable byte-lossless on arbitrary content without audio
libraries.  MP3/OGG stay NotImplementedError routes in
``media_stub.decode_media`` (lossy formats need psychoacoustic codecs
this container cannot ship).

The reference (single-document extraction) has no audio path at all;
SURVEY §2's multimodal family is where this slots in.
"""

from __future__ import annotations

import struct
from typing import List, NamedTuple, Optional, Tuple

from .wav_codec import DecodedWav

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
               8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
               13: 8192, 14: 16384, 15: 32768}

_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 \
                else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class _BitReader:
    """MSB-first bit reader tracking bytes for CRC."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise EOFError("FLAC bitstream exhausted")
        v = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return v

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_signed(self, n: int) -> int:
        v = self.read_bits(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read_bit() == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _read_utf8_number(br: _BitReader) -> int:
    first = br.read_bits(8)
    if first < 0x80:
        return first
    n_extra = 0
    mask = 0x40
    while first & mask:
        n_extra += 1
        mask >>= 1
    v = first & (mask - 1)
    for _ in range(n_extra):
        b = br.read_bits(8)
        if b >> 6 != 0b10:
            raise ValueError("bad UTF-8-coded frame number")
        v = (v << 6) | (b & 0x3F)
    return v


def _read_residuals(br: _BitReader, blocksize: int, order: int
                    ) -> List[int]:
    method = br.read_bits(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read_bits(4)
    n_part = 1 << porder
    if blocksize % n_part:
        raise ValueError("partition order does not divide block size")
    out: List[int] = []
    for p in range(n_part):
        n = blocksize // n_part - (order if p == 0 else 0)
        param = br.read_bits(pbits)
        if param == escape:
            raw_bits = br.read_bits(5)
            for _ in range(n):
                out.append(br.read_signed(raw_bits) if raw_bits else 0)
        else:
            for _ in range(n):
                q = br.read_unary()
                u = (q << param) | (br.read_bits(param) if param else 0)
                out.append((u >> 1) ^ -(u & 1))  # zigzag
    return out


def _decode_subframe(br: _BitReader, blocksize: int, bps: int
                     ) -> List[int]:
    if br.read_bit():
        raise ValueError("subframe padding bit set")
    stype = br.read_bits(6)
    wasted = 0
    if br.read_bit():
        wasted = 1 + br.read_unary()
    eff = bps - wasted
    if stype == 0:                      # CONSTANT
        v = br.read_signed(eff)
        out = [v] * blocksize
    elif stype == 1:                    # VERBATIM
        out = [br.read_signed(eff) for _ in range(blocksize)]
    elif 8 <= stype <= 12:              # FIXED order 0-4
        order = stype - 8
        out = [br.read_signed(eff) for _ in range(order)]
        res = _read_residuals(br, blocksize, order)
        coefs = _FIXED_COEFS[order]
        for r in res:
            pred = sum(c * out[-i - 1] for i, c in enumerate(coefs))
            out.append(pred + r)
    elif stype >= 32:                   # LPC order 1-32
        order = stype - 31
        out = [br.read_signed(eff) for _ in range(order)]
        precision = br.read_bits(4) + 1
        if precision == 16:
            raise ValueError("invalid LPC precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [br.read_signed(precision) for _ in range(order)]
        res = _read_residuals(br, blocksize, order)
        for r in res:
            acc = sum(c * out[-i - 1] for i, c in enumerate(coefs))
            out.append((acc >> shift) + r)
    else:
        raise ValueError(f"reserved subframe type {stype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


class FlacInfo(NamedTuple):
    sample_rate: int
    channels: int
    bits_per_sample: int
    total_samples: int


def _parse_streaminfo(body: bytes) -> FlacInfo:
    if len(body) < 34:
        raise ValueError("short STREAMINFO")
    bits = int.from_bytes(body[10:18], "big")
    sample_rate = (bits >> 44) & 0xFFFFF
    channels = ((bits >> 41) & 0x7) + 1
    bps = ((bits >> 36) & 0x1F) + 1
    total = bits & ((1 << 36) - 1)
    return FlacInfo(sample_rate, channels, bps, total)


MAX_SAMPLES = 1 << 26  # decompression-bomb guard: a CONSTANT subframe
# yields 32768 samples from ~20 bytes (1600x), so accumulated output
# is capped — 2^26 samples is over 20 minutes of 48 kHz stereo


def decode_flac(payload: bytes,
                max_samples: int = MAX_SAMPLES) -> DecodedWav:
    """Decode a FLAC stream to interleaved integer samples (the same
    shape ``wav_codec.decode_wav`` returns, so the audio operators and
    their statistics treat both identically)."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC magic)")
    pos = 4
    info: Optional[FlacInfo] = None
    while pos + 4 <= len(payload):
        hdr = payload[pos]
        btype = hdr & 0x7F
        blen = int.from_bytes(payload[pos + 1:pos + 4], "big")
        if btype == 0:
            info = _parse_streaminfo(payload[pos + 4:pos + 4 + blen])
        pos += 4 + blen
        if hdr & 0x80:
            break
    if info is None:
        raise ValueError("missing STREAMINFO")

    samples: List[List[int]] = [[] for _ in range(info.channels)]
    while pos < len(payload) - 1:
        frame_start = pos
        br = _BitReader(payload, pos)
        sync = br.read_bits(14)
        if sync != 0b11111111111110:
            raise ValueError("lost frame sync")
        br.read_bit()                       # reserved
        br.read_bit()                       # blocking strategy
        bs_code = br.read_bits(4)
        sr_code = br.read_bits(4)
        ch_code = br.read_bits(4)
        ss_code = br.read_bits(3)
        br.read_bit()                       # reserved
        _read_utf8_number(br)
        if bs_code == 6:
            blocksize = br.read_bits(8) + 1
        elif bs_code == 7:
            blocksize = br.read_bits(16) + 1
        elif bs_code in _BLOCKSIZES:
            blocksize = _BLOCKSIZES[bs_code]
        else:
            raise ValueError("reserved block size code")
        if sr_code == 12:
            br.read_bits(8)
        elif sr_code in (13, 14):
            br.read_bits(16)
        elif sr_code == 15:
            raise ValueError("invalid sample rate code")
        if ss_code == 3:                    # RFC 9639 §9.1.4: reserved
            raise ValueError("reserved sample size code")
        bps = _SAMPLE_SIZES.get(ss_code, info.bits_per_sample)
        crc_hdr = _crc8(payload[frame_start:br.pos + (1 if br.bit else 0)])
        got_crc = br.read_bits(8)
        if crc_hdr != got_crc:
            raise ValueError("frame header CRC-8 mismatch")

        if ch_code <= 7:
            n_ch = ch_code + 1
            chans = [_decode_subframe(br, blocksize, bps)
                     for _ in range(n_ch)]
        elif ch_code == 8:                  # left/side
            left = _decode_subframe(br, blocksize, bps)
            side = _decode_subframe(br, blocksize, bps + 1)
            chans = [left, [l - s for l, s in zip(left, side)]]
        elif ch_code == 9:                  # right/side
            side = _decode_subframe(br, blocksize, bps + 1)
            right = _decode_subframe(br, blocksize, bps)
            chans = [[r + s for r, s in zip(right, side)], right]
        elif ch_code == 10:                 # mid/side
            mid = _decode_subframe(br, blocksize, bps)
            side = _decode_subframe(br, blocksize, bps + 1)
            chans = [[], []]
            for m, s in zip(mid, side):
                m2 = (m << 1) | (s & 1)
                chans[0].append((m2 + s) >> 1)
                chans[1].append((m2 - s) >> 1)
        else:
            raise ValueError("reserved channel assignment")
        if len(chans) != info.channels:
            raise ValueError("frame channel count != STREAMINFO")
        br.align()
        body = payload[frame_start:br.pos]
        got16 = br.read_bits(16)
        if _crc16(body) != got16:
            raise ValueError("frame CRC-16 mismatch")
        for c, ch in enumerate(chans):
            samples[c].extend(ch)
        if len(samples[0]) * info.channels > max_samples:
            raise ValueError(
                f"FLAC stream exceeds the {max_samples}-sample decode "
                "guard (decompression-bomb protection)")
        pos = br.pos

    n_frames = len(samples[0]) if samples else 0
    inter: List[int] = []
    for i in range(n_frames):
        for c in range(info.channels):
            inter.append(samples[c][i])
    return DecodedWav(info.channels, info.sample_rate,
                      info.bits_per_sample, n_frames, inter)


# ---------------------------------------------------------------------------
# Encoder (fixture generator)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write_bits(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.nbits = 0

    def write_signed(self, value: int, n: int) -> None:
        self.write_bits(value & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        for _ in range(q):
            self.write_bits(0, 1)
        self.write_bits(1, 1)

    def align(self) -> None:
        while self.nbits:
            self.write_bits(0, 1)

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


def _write_utf8_number(bw: _BitWriter, v: int) -> None:
    if v < 0x80:
        bw.write_bits(v, 8)
        return
    groups = []
    while v:
        groups.append(v & 0x3F)
        v >>= 6
    n = len(groups)
    first_prefix = (0xFF << (7 - n)) & 0xFF
    bw.write_bits(first_prefix | groups[-1], 8)
    for g in reversed(groups[:-1]):
        bw.write_bits(0x80 | g, 8)


def _best_rice_param(res: List[int], pbits: int) -> int:
    """Exhaustive best 4/5-bit rice parameter for one partition (the
    escape value is reserved; encoder fixtures never need raw mode)."""
    us = [(r << 1) if r >= 0 else ((-r) << 1) - 1 for r in res]
    best, best_cost = 0, None
    for param in range((1 << pbits) - 1):
        cost = sum((u >> param) + 1 + param for u in us)
        if best_cost is None or cost < best_cost:
            best, best_cost = param, cost
    return best


def _write_residuals(bw: _BitWriter, res: List[int],
                     partition_order: int = 0) -> None:
    bw.write_bits(0, 2)                 # 4-bit rice parameters
    bw.write_bits(partition_order, 4)
    n_part = 1 << partition_order
    per = -(-len(res) // n_part) if n_part > 1 else len(res)
    del per
    # split: first partition may be shorter (predictor order upstream)
    sizes = []
    total = len(res)
    base = None
    # caller guarantees len(res) fits the partition layout; recompute
    # the first-partition size from the remainder
    rest = total
    for p in range(n_part):
        if p == 0:
            sz = total - (n_part - 1) * (total // n_part) \
                if n_part > 1 else total
            # when order divides evenly this equals total/n_part
            sz = total - (n_part - 1) * ((total + 0) // n_part) \
                if False else sz
        else:
            sz = (total - sizes[0]) // (n_part - 1)
        sizes.append(sz)
        rest -= sz
    i = 0
    for sz in sizes:
        part = res[i:i + sz]
        i += sz
        param = _best_rice_param(part, 4)
        bw.write_bits(param, 4)
        for r in part:
            u = (r << 1) if r >= 0 else ((-r) << 1) - 1
            bw.write_unary(u >> param)
            if param:
                bw.write_bits(u & ((1 << param) - 1), param)


def _subframe_order(mode: str) -> int:
    if mode.startswith("fixed"):
        return int(mode[-1])
    if mode == "lpc2":
        return 2
    return 0


def _write_subframe(bw: _BitWriter, ch: List[int], bps: int,
                    mode: str) -> None:
    # a predictor subframe needs order warmup samples; blocks shorter
    # than the order (tiny inputs, short final block) downgrade to
    # verbatim — the same fallback real encoders use
    if len(ch) < _subframe_order(mode):
        mode = "verbatim"
    bw.write_bits(0, 1)                 # padding
    if mode == "constant":
        bw.write_bits(0, 6)
        bw.write_bits(0, 1)             # no wasted bits
        bw.write_signed(ch[0], bps)
        return
    if mode == "verbatim":
        bw.write_bits(1, 6)
        bw.write_bits(0, 1)
        for v in ch:
            bw.write_signed(v, bps)
        return
    if mode.startswith("fixed"):
        order = int(mode[-1])
        bw.write_bits(8 + order, 6)
        bw.write_bits(0, 1)
        for v in ch[:order]:
            bw.write_signed(v, bps)
        coefs = _FIXED_COEFS[order]
        res = [ch[i] - sum(c * ch[i - j - 1]
                           for j, c in enumerate(coefs))
               for i in range(order, len(ch))]
        _write_residuals(bw, res)
        return
    if mode == "lpc2":
        # order-2 LPC with quantized coefficients [3, -1], shift 1:
        # pred = (3*x[n-1] - 1*x[n-2]) >> 1  (a real LPC path, distinct
        # from every fixed predictor)
        order, precision, shift = 2, 4, 1
        coefs = [3, -1]
        bw.write_bits(31 + order, 6)
        bw.write_bits(0, 1)
        for v in ch[:order]:
            bw.write_signed(v, bps)
        bw.write_bits(precision - 1, 4)
        bw.write_signed(shift, 5)
        for c in coefs:
            bw.write_signed(c, precision)
        res = []
        for i in range(order, len(ch)):
            acc = sum(c * ch[i - j - 1] for j, c in enumerate(coefs))
            res.append(ch[i] - (acc >> shift))
        _write_residuals(bw, res)
        return
    raise ValueError(f"unknown subframe mode {mode}")


def encode_flac(channels: List[List[int]], sample_rate: int = 8000,
                bps: int = 16, blocksize: int = 256,
                subframe_mode: str = "verbatim",
                stereo_mode: str = "independent",
                comments: "dict | None" = None) -> bytes:
    """Real FLAC stream from per-channel integer samples.

    ``subframe_mode``: constant (requires constant blocks) / verbatim /
    fixed0..fixed4 / lpc2.  ``stereo_mode`` (2 channels only):
    independent, left_side, right_side, or mid_side — the decorrelated
    side channel is computed here and must round-trip exactly."""
    n_ch = len(channels)
    n = len(channels[0])
    assert all(len(c) == n for c in channels)

    out = bytearray(b"fLaC")
    # STREAMINFO (last-metadata flag set)
    si = bytearray()
    si += struct.pack(">HH", blocksize, blocksize)
    si += b"\x00\x00\x00" * 2            # min/max frame size unknown
    packed = (sample_rate << 44) | ((n_ch - 1) << 41) \
        | ((bps - 1) << 36) | n
    si += packed.to_bytes(8, "big")
    si += bytes(16)                      # md5 unset
    if comments:
        out += bytes([0x00]) + len(si).to_bytes(3, "big") + si
        vendor = b"docling-graph-spark fixture encoder"
        vc = bytearray(struct.pack("<I", len(vendor)) + vendor)
        items = [f"{k.upper()}={v}".encode("utf-8")
                 for k, v in comments.items()]
        vc += struct.pack("<I", len(items))
        for it in items:
            vc += struct.pack("<I", len(it)) + it
        # VORBIS_COMMENT block (type 4), now the last metadata block
        out += bytes([0x84]) + len(vc).to_bytes(3, "big") + vc
    else:
        out += bytes([0x80]) + len(si).to_bytes(3, "big") + si

    frame_no = 0
    for start in range(0, n, blocksize):
        block = [c[start:start + blocksize] for c in channels]
        bs = len(block[0])
        bw = _BitWriter()
        bw.write_bits(0b11111111111110, 14)
        bw.write_bits(0, 1)              # reserved
        bw.write_bits(0, 1)              # fixed blocksize strategy
        bw.write_bits(7, 4)              # blocksize: 16-bit field - 1
        bw.write_bits(0, 4)              # sample rate: from STREAMINFO
        if n_ch == 2 and stereo_mode != "independent":
            ch_code = {"left_side": 8, "right_side": 9,
                       "mid_side": 10}[stereo_mode]
        else:
            ch_code = n_ch - 1
        bw.write_bits(ch_code, 4)
        bw.write_bits(0, 3)              # sample size: from STREAMINFO
        bw.write_bits(0, 1)              # reserved
        _write_utf8_number(bw, frame_no)
        bw.write_bits(bs - 1, 16)
        hdr = bw.flush()                 # byte-aligned here by design
        hdr_crc = _crc8(hdr)
        body = _BitWriter()
        for b8 in hdr:
            body.write_bits(b8, 8)
        body.write_bits(hdr_crc, 8)

        if ch_code == 8:
            left, right = block
            side = [l - r for l, r in zip(left, right)]
            _write_subframe(body, left, bps, subframe_mode)
            _write_subframe(body, side, bps + 1, subframe_mode)
        elif ch_code == 9:
            left, right = block
            side = [l - r for l, r in zip(left, right)]
            _write_subframe(body, side, bps + 1, subframe_mode)
            _write_subframe(body, right, bps, subframe_mode)
        elif ch_code == 10:
            left, right = block
            mid = [(l + r) >> 1 for l, r in zip(left, right)]
            side = [l - r for l, r in zip(left, right)]
            _write_subframe(body, mid, bps, subframe_mode)
            _write_subframe(body, side, bps + 1, subframe_mode)
        else:
            for ch in block:
                _write_subframe(body, ch, bps, subframe_mode)
        frame_bytes = body.flush()
        out += frame_bytes
        out += _crc16(frame_bytes).to_bytes(2, "big")
        frame_no += 1
    return bytes(out)
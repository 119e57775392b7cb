"""Vorbis-in-Ogg lossy audio codec — pure Python + numpy.

Lossy audio dominates real crawls; WAV and FLAC decode for real
(kernels/wav_codec.py, flac_codec.py) and this module adds the lossy
format that is fully implementable offline: Vorbis I (the public Xiph
specification).  Unlike MP3 — whose Huffman tables and 512-tap
synthesis window are large empirical constants with no transcribable
copy in this sandbox — a Vorbis stream is SELF-DESCRIBING by design:
every codebook, floor configuration and residue configuration travels
in the setup header, and the only constant table the spec bakes in,
the floor1 inverse-dB table, has the exact closed form
``10 ** (7 * (i - 255) / 256)`` (table[0] = 1.0649863e-07,
table[255] = 1.0).  So both halves here are spec-complete with no
fidelity caveats.

Decoder scope (Vorbis I, decode side of the spec):

* Ogg page framing: capture pattern, lacing, packet reassembly, the
  0x04c11db7 non-reflected CRC-32, EOS/granule handling;
* the three headers (identification / comment / setup);
* codebook machinery: ordered and unordered (incl. sparse) codeword
  lengths, the canonical lowest-available-codeword assignment, VQ
  lookup types 0/1/2 with ``float32_unpack`` and sequence_p;
* floor type 1 in full (partition classes, subclass books, the
  low/high-neighbor prediction with render_point/render_line integer
  math, step2 flags, the closed-form inverse-dB curve); floor type 0
  (legacy LSP) routes as NotImplementedError;
* residue types 0, 1 and 2 (classword decode, 8-pass cascades,
  partition add-decode; type 2 channel interleave);
* square polar channel coupling (magnitude/angle);
* IMDCT (direct cos-matrix form of the spec transform, numpy) with
  the Vorbis window and 50% overlap-add; equal and unequal blocksizes
  are both parsed, long/short window transitions are implemented for
  the blockflag path.

The fixture encoder emits REAL streams a conforming decoder accepts:
flat unit floor (two 255-valued posts, zero subclass books), scalar
dim-1 residue value book (65 levels, exact-zero center, complete
prefix tree), a dim-2 classbook with a silent class (all-zero
partitions decode through the no-book path), equal blocksizes (legal:
``blocksize_0 == blocksize_1`` removes window transitions), mono or
stereo (optional square-polar coupling), one packet per Ogg page.

The reference has no audio handling at all; this exists for the
multimodal audio stage (operators/multimodal.audio_decode_stats),
reached through media_stub.decode_media for ``audio/ogg``.

Decompression-bomb guard: total declared samples (granule) and per-
packet blocksizes are gated before synthesis allocates anything.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .wav_codec import DecodedWav

MAX_SAMPLES = 1 << 26

# ---------------------------------------------------------------------------
# Ogg framing
# ---------------------------------------------------------------------------

_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) if (_r & 0x80000000) else (_r << 1)
        _r &= 0xFFFFFFFF
    _CRC_TABLE.append(_r)


def _ogg_crc(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((crc >> 24) ^ b)
                                                     & 0xFF]
    return crc


def ogg_pages(data: bytes):
    """Yield (header_type, granule, serial, packets, incomplete_tail)
    per page; validates capture pattern and CRC."""
    pos = 0
    while pos + 27 <= len(data):
        if data[pos:pos + 4] != b"OggS":
            raise ValueError("lost Ogg capture pattern")
        (ver, htype, granule, serial, seq, crc,
         nsegs) = struct.unpack_from("<BBqIIIB", data, pos + 4)
        if ver != 0:
            raise ValueError("unsupported Ogg version")
        lacing = data[pos + 27:pos + 27 + nsegs]
        body_start = pos + 27 + nsegs
        body_len = sum(lacing)
        page = bytearray(data[pos:body_start + body_len])
        if len(page) != body_start - pos + body_len:
            raise ValueError("truncated Ogg page")
        page[22:26] = b"\x00" * 4
        if _ogg_crc(bytes(page)) != crc:
            raise ValueError("Ogg page CRC mismatch")
        packets: List[bytes] = []
        cur = bytearray()
        off = body_start
        last_full = True
        for lv in lacing:
            cur += data[off:off + lv]
            off += lv
            if lv < 255:
                packets.append(bytes(cur))
                cur = bytearray()
                last_full = True
            else:
                last_full = False
        yield htype, granule, serial, packets, \
            (bytes(cur) if not last_full else None)
        pos = body_start + body_len


def ogg_page(serial: int, seq: int, granule: int, packets: List[bytes],
             header_type: int = 0) -> bytes:
    lacing = bytearray()
    body = bytearray()
    for p in packets:
        q, r = divmod(len(p), 255)
        lacing += b"\xff" * q + bytes([r])
        body += p
    hdr = bytearray(b"OggS") + struct.pack(
        "<BBqIIIB", 0, header_type, granule, serial, seq, 0,
        len(lacing)) + lacing
    page = bytes(hdr) + bytes(body)
    crc = _ogg_crc(page)
    return page[:22] + struct.pack("<I", crc) + page[26:]


# ---------------------------------------------------------------------------
# LSB-first bit IO (Vorbis packs bits least-significant-first)
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("Vorbis packet exhausted")
        b = (self.data[self.pos] >> self.bit) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            v |= self.read_bit() << i
        return v


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write_bits(self, value: int, n: int) -> None:
        for i in range(n):
            self.acc |= ((value >> i) & 1) << self.nbits
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.nbits = 0

    def write_code(self, code: int, length: int) -> None:
        """Huffman codeword: first-transmitted bit = MSB of the code."""
        for i in range(length - 1, -1, -1):
            self.write_bits((code >> i) & 1, 1)

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _ilog(x: int) -> int:
    n = 0
    while x > 0:
        n += 1
        x >>= 1
    return n


def float32_unpack(x: int) -> float:
    mant = x & 0x1FFFFF
    exp = (x & 0x7FE00000) >> 21
    v = mant * (2.0 ** (exp - 788))
    return -v if (x & 0x80000000) else v


def float32_pack(v: float) -> int:
    """Exact packer for the dyadic rationals the fixture encoder uses."""
    sign = 0x80000000 if v < 0 else 0
    v = abs(v)
    if v == 0:
        return 788 << 21
    exp = 788
    while v != int(v):
        v *= 2
        exp -= 1
    m = int(v)
    while m > 0x1FFFFF:
        if m & 1:
            raise ValueError("value not exactly packable")
        m >>= 1
        exp += 1
    return sign | (exp << 21) | m


# ---------------------------------------------------------------------------
# Codebooks
# ---------------------------------------------------------------------------


def assign_codewords(lengths: Sequence[int]) -> Dict[int, Tuple[int, int]]:
    """The Vorbis canonical assignment: entries in order, each getting
    the numerically lowest unused codeword of its length (prefix-free).
    Free subtrees are tracked as (code-prefix, len) nodes; descending
    always takes the 0 branch and releases the 1-branch siblings."""
    free: List[Tuple[float, int, int]] = [(0.0, 0, 0)]  # (frac, len, code)
    out: Dict[int, Tuple[int, int]] = {}
    for i, ln in enumerate(lengths):
        if ln == 0:
            continue
        pick = None
        for idx, (frac, m, c) in enumerate(free):
            if m <= ln and (pick is None or frac < free[pick][0]):
                pick = idx
        if pick is None:
            raise ValueError("over-subscribed codebook lengths")
        _frac, m, c = free.pop(pick)
        code = c << (ln - m)
        for k in range(m + 1, ln + 1):
            sib = (code >> (ln - k)) | 1
            free.append((sib / (1 << k), k, sib))
        out[i] = (code, ln)
    return out


class _Codebook:
    def __init__(self, dim: int, entries: int, lengths: List[int],
                 lookup_type: int, minimum: float = 0.0,
                 delta: float = 0.0, sequence_p: int = 0,
                 muls: Optional[List[int]] = None):
        self.dim = dim
        self.entries = entries
        self.lengths = lengths
        self.lookup_type = lookup_type
        self.codes = assign_codewords(lengths)
        self.decode_map = {(ln, code): e
                           for e, (code, ln) in self.codes.items()}
        self.vq: Optional[np.ndarray] = None
        if lookup_type:
            vals = np.zeros((entries, dim))
            if lookup_type == 1:
                lv = _lookup1_values(entries, dim)
                for e in range(entries):
                    last = 0.0
                    idiv = 1
                    for j in range(dim):
                        off = (e // idiv) % lv
                        vals[e, j] = minimum + delta * muls[off] + last
                        if sequence_p:
                            last = vals[e, j]
                        idiv *= lv
            else:
                for e in range(entries):
                    last = 0.0
                    for j in range(dim):
                        vals[e, j] = minimum + delta * muls[e * dim + j] \
                            + last
                        if sequence_p:
                            last = vals[e, j]
            self.vq = vals

    def decode_scalar(self, br: _BitReader) -> int:
        code = 0
        ln = 0
        for _ in range(33):
            code = (code << 1) | br.read_bit()
            ln += 1
            e = self.decode_map.get((ln, code))
            if e is not None:
                return e
        raise ValueError("invalid Vorbis codeword")

    def decode_vq(self, br: _BitReader) -> np.ndarray:
        if self.vq is None:
            raise ValueError("scalar codebook used in VQ context")
        return self.vq[self.decode_scalar(br)]


def _lookup1_values(entries: int, dim: int) -> int:
    v = 1
    while (v + 1) ** dim <= entries:
        v += 1
    return v


def _read_codebook(br: _BitReader) -> _Codebook:
    if br.read_bits(24) != 0x564342:
        raise ValueError("bad codebook sync pattern")
    dim = br.read_bits(16)
    entries = br.read_bits(24)
    ordered = br.read_bit()
    lengths = [0] * entries
    if not ordered:
        sparse = br.read_bit()
        for e in range(entries):
            if sparse:
                if br.read_bit():
                    lengths[e] = br.read_bits(5) + 1
            else:
                lengths[e] = br.read_bits(5) + 1
    else:
        cur_len = br.read_bits(5) + 1
        e = 0
        while e < entries:
            num = br.read_bits(_ilog(entries - e))
            if num > entries - e:     # Vorbis I §3.2.1: overrun of the
                raise ValueError(     # remaining entry count is an error
                    "ordered codebook run exceeds entry count")
            for k in range(num):
                lengths[e + k] = cur_len
            e += num
            cur_len += 1
            if cur_len > 32:
                raise ValueError("codebook length overflow")
    lookup = br.read_bits(4)
    minimum = delta = 0.0
    seq = 0
    muls = None
    if lookup in (1, 2):
        minimum = float32_unpack(br.read_bits(32))
        delta = float32_unpack(br.read_bits(32))
        vbits = br.read_bits(4) + 1
        seq = br.read_bit()
        count = (_lookup1_values(entries, dim) if lookup == 1
                 else entries * dim)
        muls = [br.read_bits(vbits) for _ in range(count)]
    elif lookup != 0:
        raise ValueError(f"reserved codebook lookup type {lookup}")
    return _Codebook(dim, entries, lengths, lookup, minimum, delta,
                     seq, muls)


# ---------------------------------------------------------------------------
# Floor type 1
# ---------------------------------------------------------------------------

INVERSE_DB = [10.0 ** (7.0 * (i - 255) / 256.0) for i in range(256)]
_FLOOR1_RANGES = [256, 128, 86, 64]


class _Floor1:
    def __init__(self, br: _BitReader):
        n_part = br.read_bits(5)
        self.part_classes = [br.read_bits(4) for _ in range(n_part)]
        n_classes = (max(self.part_classes) + 1) if n_part else 0
        self.class_dims = []
        self.class_subs = []
        self.masterbooks = []
        self.subclass_books = []
        for _ in range(n_classes):
            self.class_dims.append(br.read_bits(3) + 1)
            sub = br.read_bits(2)
            self.class_subs.append(sub)
            self.masterbooks.append(br.read_bits(8) if sub else -1)
            self.subclass_books.append(
                [br.read_bits(8) - 1 for _ in range(1 << sub)])
        self.multiplier = br.read_bits(2) + 1
        rangebits = br.read_bits(4)
        xs = [0, 1 << rangebits]
        for p in self.part_classes:
            for _ in range(self.class_dims[p]):
                xs.append(br.read_bits(rangebits))
        self.x_list = xs

    def decode(self, br: _BitReader, books: List[_Codebook],
               n2: int) -> Optional[np.ndarray]:
        if not br.read_bit():
            return None                  # unused channel: zero floor
        rng = _FLOOR1_RANGES[self.multiplier - 1]
        bits = _ilog(rng - 1)
        y = [br.read_bits(bits), br.read_bits(bits)]
        for p in self.part_classes:
            cdim = self.class_dims[p]
            cbits = self.class_subs[p]
            csub = (1 << cbits) - 1
            cval = 0
            if cbits:
                cval = books[self.masterbooks[p]].decode_scalar(br)
            for _ in range(cdim):
                book = self.subclass_books[p][cval & csub]
                cval >>= cbits
                y.append(books[book].decode_scalar(br)
                         if book >= 0 else 0)
        return self._synthesize(y, rng, n2)

    def _synthesize(self, y: List[int], rng: int,
                    n2: int) -> np.ndarray:
        xs = self.x_list
        values = len(xs)
        final = [0] * values
        flag = [False] * values
        final[0], final[1] = y[0], y[1]
        flag[0] = flag[1] = True
        for i in range(2, values):
            lo = max((j for j in range(i) if xs[j] < xs[i]),
                     key=lambda j: xs[j], default=0)
            hi = min((j for j in range(i) if xs[j] > xs[i]),
                     key=lambda j: xs[j], default=1)
            pred = _render_point(xs[lo], final[lo], xs[hi], final[hi],
                                 xs[i])
            val = y[i]
            if val:
                highroom = rng - pred
                lowroom = pred
                room = 2 * min(highroom, lowroom)
                flag[lo] = flag[hi] = flag[i] = True
                if val >= room:
                    if highroom > lowroom:
                        final[i] = val - lowroom + pred
                    else:
                        final[i] = pred - (val - highroom) - 1
                elif val & 1:
                    final[i] = pred - ((val + 1) >> 1)
                else:
                    final[i] = pred + (val >> 1)
            else:
                flag[i] = False
                final[i] = pred
        pts = sorted((xs[i], min(max(final[i], 0), rng - 1))
                     for i in range(values) if flag[i])
        curve = np.zeros(n2)
        lx, ly = pts[0]
        buf = [0] * n2
        for px, py in pts[1:]:
            _render_line(lx, ly, px, py, buf, n2)
            lx, ly = px, py
        if lx < n2:
            for x in range(lx, n2):
                buf[x] = ly
        for i in range(n2):
            curve[i] = INVERSE_DB[min(255, buf[i] * self.multiplier)]
        return curve


def _render_point(x0: int, y0: int, x1: int, y1: int, x: int) -> int:
    dy = y1 - y0
    adx = x1 - x0
    ady = abs(dy)
    err = ady * (x - x0)
    off = err // adx
    return y0 - off if dy < 0 else y0 + off


def _render_line(x0: int, y0: int, x1: int, y1: int,
                 v: List[int], n: int) -> None:
    dy = y1 - y0
    adx = x1 - x0
    ady = abs(dy)
    base = dy // adx if dy >= 0 else -((-dy) // adx)
    sy = base + 1 if dy >= 0 else base - 1
    ady -= abs(base) * adx
    if x0 < n:
        v[x0] = y0
    y = y0
    err = 0
    for x in range(x0 + 1, min(x1, n)):
        err += ady
        if err >= adx:
            err -= adx
            y += sy
        else:
            y += base
        v[x] = y


# ---------------------------------------------------------------------------
# Residues
# ---------------------------------------------------------------------------


class _Residue:
    def __init__(self, rtype: int, br: _BitReader):
        self.rtype = rtype
        self.begin = br.read_bits(24)
        self.end = br.read_bits(24)
        self.psize = br.read_bits(24) + 1
        self.n_class = br.read_bits(6) + 1
        self.classbook = br.read_bits(8)
        cascades = []
        for _ in range(self.n_class):
            low = br.read_bits(3)
            high = br.read_bits(5) if br.read_bit() else 0
            cascades.append(low | (high << 3))
        self.cascades = cascades
        self.books: List[List[int]] = []
        for c in cascades:
            row = []
            for p in range(8):
                row.append(br.read_bits(8) if (c >> p) & 1 else -1)
            self.books.append(row)

    def decode(self, br: _BitReader, books: List[_Codebook],
               vectors: List[np.ndarray], do_not: List[bool]) -> None:
        """Decode into ``vectors`` in place (type 2 callers pass one
        interleaved vector)."""
        if self.rtype == 2:
            if all(do_not):
                return
            self._decode_core(br, books, vectors, [False])
        else:
            self._decode_core(br, books, vectors, do_not)

    def _decode_core(self, br: _BitReader, books: List[_Codebook],
                     vectors: List[np.ndarray],
                     do_not: List[bool]) -> None:
        n = len(vectors[0])
        begin = min(self.begin, n)
        end = min(self.end, n)
        if end <= begin:
            return
        psize = self.psize
        n_parts = (end - begin) // psize
        cbook = books[self.classbook]
        cdim = cbook.dim
        n_ch = len(vectors)
        classes = [[0] * n_parts for _ in range(n_ch)]
        for p in range(8):
            if not any((c >> p) & 1 for c in self.cascades):
                continue
            part = 0
            while part < n_parts:
                if p == 0:
                    for ch in range(n_ch):
                        if do_not[ch]:
                            continue
                        temp = cbook.decode_scalar(br)
                        for i in range(cdim - 1, -1, -1):
                            if part + i < n_parts:
                                classes[ch][part + i] = \
                                    temp % self.n_class
                            temp //= self.n_class
                for i in range(cdim):
                    if part >= n_parts:
                        break
                    for ch in range(n_ch):
                        if do_not[ch]:
                            continue
                        book = self.books[classes[ch][part]][p]
                        if book >= 0:
                            self._partition(br, books[book],
                                            vectors[ch],
                                            begin + part * psize)
                    part += 1

    def _partition(self, br: _BitReader, book: _Codebook,
                   v: np.ndarray, offset: int) -> None:
        psize = self.psize
        dim = book.dim
        if self.rtype == 0:
            step = psize // dim
            for i in range(step):
                vec = book.decode_vq(br)
                for j in range(dim):
                    v[offset + i + j * step] += vec[j]
        else:                            # types 1 and 2
            i = 0
            while i < psize:
                vec = book.decode_vq(br)
                for j in range(dim):
                    v[offset + i + j] += vec[j]
                i += dim


# ---------------------------------------------------------------------------
# Setup: mappings, modes, full header parse
# ---------------------------------------------------------------------------


class _Setup:
    def __init__(self):
        self.books: List[_Codebook] = []
        self.floors: List[_Floor1] = []
        self.residues: List[_Residue] = []
        self.mappings: List[dict] = []
        self.modes: List[dict] = []


class _Info:
    channels = 0
    rate = 0
    bs0 = 0
    bs1 = 0


def _parse_ident(packet: bytes) -> _Info:
    if packet[:7] != b"\x01vorbis":
        raise ValueError("bad Vorbis identification header")
    br = _BitReader(packet[7:])
    if br.read_bits(32) != 0:
        raise ValueError("unsupported Vorbis version")
    info = _Info()
    info.channels = br.read_bits(8)
    info.rate = br.read_bits(32)
    br.read_bits(32)                     # bitrate max
    br.read_bits(32)                     # nominal
    br.read_bits(32)                     # min
    info.bs0 = 1 << br.read_bits(4)
    info.bs1 = 1 << br.read_bits(4)
    if info.channels == 0 or info.rate == 0:
        raise ValueError("zero channels or rate")
    if not (64 <= info.bs0 <= 8192 and info.bs0 <= info.bs1 <= 8192):
        raise ValueError("illegal Vorbis blocksizes")
    if not br.read_bit():
        raise ValueError("missing framing bit")
    return info


def _parse_setup(packet: bytes, channels: int) -> _Setup:
    if packet[:7] != b"\x05vorbis":
        raise ValueError("bad Vorbis setup header")
    br = _BitReader(packet[7:])
    s = _Setup()
    for _ in range(br.read_bits(8) + 1):
        s.books.append(_read_codebook(br))
    for _ in range(br.read_bits(6) + 1):     # time transforms
        if br.read_bits(16) != 0:
            raise ValueError("reserved time transform")
    for _ in range(br.read_bits(6) + 1):
        ftype = br.read_bits(16)
        if ftype == 1:
            s.floors.append(_Floor1(br))
        elif ftype == 0:
            raise NotImplementedError(
                "floor type 0 (legacy LSP) not supported")
        else:
            raise ValueError(f"reserved floor type {ftype}")
    for _ in range(br.read_bits(6) + 1):
        rtype = br.read_bits(16)
        if rtype not in (0, 1, 2):
            raise ValueError(f"reserved residue type {rtype}")
        s.residues.append(_Residue(rtype, br))
    for _ in range(br.read_bits(6) + 1):
        if br.read_bits(16) != 0:
            raise ValueError("reserved mapping type")
        m: dict = {}
        n_sub = br.read_bits(4) + 1 if br.read_bit() else 1
        m["couples"] = []
        if br.read_bit():
            for _ in range(br.read_bits(8) + 1):
                bits = _ilog(channels - 1)
                m["couples"].append((br.read_bits(bits),
                                     br.read_bits(bits)))
        if br.read_bits(2) != 0:
            raise ValueError("reserved mapping bits")
        m["mux"] = ([br.read_bits(4) for _ in range(channels)]
                    if n_sub > 1 else [0] * channels)
        m["submaps"] = []
        for _ in range(n_sub):
            br.read_bits(8)              # unused time config
            m["submaps"].append((br.read_bits(8), br.read_bits(8)))
        s.mappings.append(m)
    for _ in range(br.read_bits(6) + 1):
        mode = {"blockflag": br.read_bit(),
                "windowtype": br.read_bits(16),
                "transformtype": br.read_bits(16),
                "mapping": br.read_bits(8)}
        if mode["windowtype"] or mode["transformtype"]:
            raise ValueError("reserved window/transform type")
        s.modes.append(mode)
    if not br.read_bit():
        raise ValueError("missing setup framing bit")
    # Vorbis I §4.2.4: cross-reference validation — every index a
    # corrupt header could point out of range must be a routed
    # ValueError here, not an IndexError mid-synthesis (found by
    # container fuzzing via the WebM CodecPrivate path)
    nb = len(s.books)
    for fl in s.floors:
        if any(bk >= nb for bk in fl.masterbooks if bk >= 0) or any(
                bk >= nb for row in fl.subclass_books
                for bk in row if bk >= 0):
            raise ValueError("floor references undefined codebook")
    for res in s.residues:
        if res.classbook >= nb or any(
                bk >= nb for row in res.books for bk in row if bk >= 0):
            raise ValueError("residue references undefined codebook")
    for m in s.mappings:
        if any(mx >= len(m["submaps"]) for mx in m["mux"]):
            raise ValueError("mapping mux exceeds submap count")
        if any(fl >= len(s.floors) or rs >= len(s.residues)
               for fl, rs in m["submaps"]):
            raise ValueError("mapping references undefined floor/"
                             "residue")
        if any(mag >= channels or ang >= channels or mag == ang
               for mag, ang in m["couples"]):
            raise ValueError("coupling channel out of range")
    for mode in s.modes:
        if mode["mapping"] >= len(s.mappings):
            raise ValueError("mode references undefined mapping")
    return s


# ---------------------------------------------------------------------------
# Synthesis
# ---------------------------------------------------------------------------

_IMDCT_CACHE: Dict[int, np.ndarray] = {}
_WINDOW_CACHE: Dict[int, np.ndarray] = {}


def _imdct_matrix(n: int) -> np.ndarray:
    mat = _IMDCT_CACHE.get(n)
    if mat is None:
        j = np.arange(n)
        m = np.arange(n // 2)
        mat = np.cos(2.0 * np.pi / n
                     * np.outer(j + 0.5 + n / 4.0, m + 0.5))
        _IMDCT_CACHE[n] = mat
    return mat


def _vorbis_window(n: int) -> np.ndarray:
    w = _WINDOW_CACHE.get(n)
    if w is None:
        j = np.arange(n)
        w = np.sin(0.5 * np.pi
                   * np.sin(np.pi / n * (j + 0.5)) ** 2)
        _WINDOW_CACHE[n] = w
    return w


def decode_vorbis(payload: bytes,
                  max_samples: int = MAX_SAMPLES) -> DecodedWav:
    """Decode an Ogg Vorbis stream to interleaved int16 samples (the
    same DecodedWav shape wav/flac decode to, so the audio operators
    treat all three identically)."""
    if payload[:4] != b"OggS":
        raise ValueError("not an Ogg stream (missing OggS capture)")
    packets: List[bytes] = []
    pending = b""
    last_granule = -1
    for htype, granule, _serial, pkts, tail in ogg_pages(payload):
        if pkts:
            pkts = list(pkts)
            if pending:
                pkts[0] = pending + pkts[0]
                pending = b""
            packets.extend(pkts)
        if tail is not None:
            pending = pending + tail if pending else tail
        if granule >= 0:
            last_granule = granule
    if last_granule < 0 and packets \
            and packets[0][:7] == b"\x01vorbis":
        raise ValueError(
            "Ogg Vorbis stream carries no granule position")
    # non-Vorbis codecs fall through so the packet-level router can
    # name them (Opus / Ogg-FLAC -> NotImplementedError)
    return decode_vorbis_packets(packets, last_granule, max_samples)


def decode_vorbis_packets(packets: List[bytes],
                          last_granule: int = -1,
                          max_samples: int = MAX_SAMPLES) -> DecodedWav:
    """Packet-level Vorbis decode: the three header packets followed
    by audio packets, independent of the transport framing — Ogg pages
    (`decode_vorbis`) and Matroska/WebM blocks with a Xiph-laced
    CodecPrivate (`webm_codec.decode_webm_audio`) both land here.
    ``last_granule`` trims the overlap-add tail to the stream's
    declared sample count; -1 (no container timestamp) keeps every
    fully-decoded sample, bounded by a packet-count guard instead."""
    if packets and packets[0][:8] == b"OpusHead":
        raise NotImplementedError(
            "Ogg Opus requires libraries not present in this "
            "container (only Vorbis decodes; header probe carries "
            "rate/channels)")
    if packets and packets[0][:5] == b"\x7fFLAC":
        raise NotImplementedError(
            "Ogg-encapsulated FLAC is not mapped (native FLAC "
            "decodes in full)")
    if len(packets) < 3:
        raise ValueError("missing Vorbis headers")
    info = _parse_ident(packets[0])
    if packets[1][:7] != b"\x03vorbis":
        raise ValueError("bad Vorbis comment header")
    setup = _parse_setup(packets[2], info.channels)
    if last_granule > max_samples:
        raise ValueError(
            f"Vorbis stream declares {last_granule} samples, beyond "
            f"the {max_samples}-sample decode guard")
    # packet-count guard for EVERY stream (not just granule-less
    # ones): each packet advances the overlap-add center by at least
    # bs0/2, so a stream whose packet count implies more than
    # max_samples of audio is hostile even if its declared granule is
    # small — without this, a tiny-granule Ogg with millions of
    # packets grows the accumulator (and burns CPU) unboundedly
    if (len(packets) - 3) * (info.bs0 // 2) > max_samples + 2 * info.bs1:
        raise ValueError(
            f"Vorbis stream carries {len(packets) - 3} packets of "
            f"blocksize {info.bs0}+, beyond the {max_samples}-sample "
            "decode guard")

    ch = info.channels
    mode_bits = _ilog(len(setup.modes) - 1)
    # absolute-position overlap-add: block k of size n_k is centered at
    # center_k = center_{k-1} + n_{k-1}/4 + n_k/4 (block 0 starts at
    # sample 0), each windowed IMDCT output added in place; the region
    # before the newest center is final.  Exact for equal blocksizes
    # AND for long/short transitions (the transition windows from
    # _window_halves keep the Princen-Bradley condition across the
    # size change).
    # left margin bs1: a long block following a short first block has
    # center - n/2 < 0 in stream coordinates (its left half windows
    # into pre-stream silence) — the margin keeps every slice in range
    margin = info.bs1
    acc = [np.zeros(margin + info.bs1 * 2) for _ in range(ch)]
    acc_len = margin + info.bs1 * 2
    center = -1
    first_center = -1
    prev_n = 0
    for pk in packets[3:]:
        br = _BitReader(pk)
        if br.read_bit() != 0:
            raise ValueError("audio packet with header packet type")
        mode = setup.modes[br.read_bits(mode_bits) if mode_bits else 0]
        bflag = mode["blockflag"]
        n = info.bs1 if bflag else info.bs0
        prev_flag = next_flag = 1
        if bflag:
            prev_flag = br.read_bit()
            next_flag = br.read_bit()
        mapping = setup.mappings[mode["mapping"]]
        n2 = n // 2

        floors: List[Optional[np.ndarray]] = []
        for c in range(ch):
            sub = mapping["submaps"][mapping["mux"][c]]
            fl = setup.floors[sub[0]]
            floors.append(fl.decode(br, setup.books, n2))
        no_resid = [floors[c] is None for c in range(ch)]
        # coupling: a coupled pair decodes if EITHER side has a floor
        for mag, ang in mapping["couples"]:
            if not no_resid[mag] or not no_resid[ang]:
                no_resid[mag] = no_resid[ang] = False
        residue_vecs = [np.zeros(n2) for _ in range(ch)]
        for si, (fnum, rnum) in enumerate(mapping["submaps"]):
            res = setup.residues[rnum]
            chans = [c for c in range(ch) if mapping["mux"][c] == si]
            if res.rtype == 2:
                inter = np.zeros(len(chans) * n2)
                res.decode(br, setup.books, [inter],
                           [no_resid[c] for c in chans])
                for k, c in enumerate(chans):
                    residue_vecs[c] = inter[k::len(chans)].copy()
            else:
                vecs = [residue_vecs[c] for c in chans]
                res.decode(br, setup.books, vecs,
                           [no_resid[c] for c in chans])
        for mag, ang in reversed(mapping["couples"]):
            m_ = residue_vecs[mag]
            a_ = residue_vecs[ang]
            new_m = m_.copy()
            new_a = a_.copy()
            pm, pa = m_ > 0, a_ > 0
            new_a[pm & pa] = (m_ - a_)[pm & pa]
            new_a[pm & ~pa] = m_[pm & ~pa]
            new_m[pm & ~pa] = (m_ + a_)[pm & ~pa]
            new_a[~pm & pa] = (m_ + a_)[~pm & pa]
            new_a[~pm & ~pa] = m_[~pm & ~pa]
            new_m[~pm & ~pa] = (m_ - a_)[~pm & ~pa]
            residue_vecs[mag] = new_m
            residue_vecs[ang] = new_a

        C = _imdct_matrix(n)
        if center < 0:
            center = n // 2
            first_center = center
        else:
            center += prev_n // 4 + n // 4
        start = margin + center - n // 2
        while start + n > acc_len:
            acc = [np.concatenate([a, np.zeros(acc_len)]) for a in acc]
            acc_len *= 2
        w = _window_halves(n, info.bs0, prev_flag, next_flag, bflag)
        for c in range(ch):
            if floors[c] is None:
                continue                 # zero spectrum adds nothing
            t = w * (C @ (floors[c] * residue_vecs[c]))
            acc[c][start:start + n] += t
        prev_n = n

    if center < 0 or center == first_center:
        return DecodedWav(ch, info.rate, 16, 0, [])
    chans = [a[margin + first_center:margin + center] for a in acc]
    n_frames = len(chans[0])
    if 0 <= last_granule < n_frames:
        chans = [c[:last_granule] for c in chans]
        n_frames = last_granule
    inter: List[int] = [0] * (n_frames * ch)
    for c in range(ch):
        vals = np.clip(np.rint(chans[c] * 32767.0), -32768, 32767) \
            .astype(np.int64)
        inter[c::ch] = vals.tolist()
    return DecodedWav(ch, info.rate, 16, n_frames, inter)


def _window_halves(n: int, bs0: int, prev_flag: int, next_flag: int,
                   bflag: int) -> np.ndarray:
    """The frame's analysis window.  Equal-blocksize streams (and all
    short blocks) use the plain Vorbis window; a long block flanked by
    a short one narrows the corresponding half (spec §4.3.1)."""
    w_full = _vorbis_window(n)
    if not bflag or (prev_flag and next_flag):
        return w_full
    w = w_full.copy()
    n2 = n // 2
    s2 = bs0 // 2
    ws = _vorbis_window(bs0)
    if not prev_flag:
        w[:n2] = 0.0
        start = n2 // 2 - s2 // 2
        w[start:start + s2] = ws[:s2]
        w[start + s2:n2] = 1.0
    if not next_flag:
        w[n2:] = 0.0
        start = n2 + n2 // 2 - s2 // 2
        w[start:start + s2] = ws[s2:]
        w[n2:start] = 1.0
    return w


# ---------------------------------------------------------------------------
# Fixture encoder
# ---------------------------------------------------------------------------

_VMIN = -4.0
_PSIZE = 8


def _value_book_lengths(bits: int) -> List[int]:
    # 2^bits + 1 entries: a complete prefix tree of 2^bits - 1 codes at
    # ``bits`` plus the two extremes one bit longer
    return [bits + 1] + [bits] * ((1 << bits) - 1) + [bits + 1]


def _write_codebook(bw: _BitWriter, dim: int, lengths: List[int],
                    lookup: int = 0, minimum: float = 0.0,
                    delta: float = 0.0, vbits: int = 0,
                    muls: Optional[List[int]] = None) -> None:
    bw.write_bits(0x564342, 24)
    bw.write_bits(dim, 16)
    bw.write_bits(len(lengths), 24)
    bw.write_bits(0, 1)                  # unordered
    bw.write_bits(0, 1)                  # not sparse
    for ln in lengths:
        bw.write_bits(ln - 1, 5)
    bw.write_bits(lookup, 4)
    if lookup:
        bw.write_bits(float32_pack(minimum), 32)
        bw.write_bits(float32_pack(delta), 32)
        bw.write_bits(vbits - 1, 4)
        bw.write_bits(0, 1)              # sequence_p
        for m in muls:
            bw.write_bits(m, vbits)


def _setup_packet(ch: int, n2: int, couple: bool, bits: int,
                  two_modes: bool = False) -> bytes:
    bw = _BitWriter()
    for b in b"\x05vorbis":
        bw.write_bits(b, 8)
    bw.write_bits(1, 8)                  # 2 codebooks
    _write_codebook(bw, 2, [2, 2, 2, 2])            # classbook
    levels = (1 << bits) + 1
    _write_codebook(bw, 1, _value_book_lengths(bits), lookup=2,
                    minimum=_VMIN, delta=8.0 / (levels - 1),
                    vbits=bits + 1, muls=list(range(levels)))
    bw.write_bits(0, 6)                  # 1 time transform
    bw.write_bits(0, 16)
    bw.write_bits(0, 6)                  # 1 floor
    bw.write_bits(1, 16)                 # type 1
    bw.write_bits(0, 5)                  # 0 partitions -> 2 flat posts
    bw.write_bits(0, 2)                  # multiplier 1
    bw.write_bits(12, 4)                 # rangebits (x1 = 4096)
    bw.write_bits(0, 6)                  # 1 residue
    bw.write_bits(2, 16)                 # type 2
    bw.write_bits(0, 24)                 # begin
    bw.write_bits(ch * n2, 24)           # end
    bw.write_bits(_PSIZE - 1, 24)
    bw.write_bits(1, 6)                  # 2 classifications
    bw.write_bits(0, 8)                  # classbook = book 0
    bw.write_bits(0, 3)                  # class 0 cascade: silent
    bw.write_bits(0, 1)
    bw.write_bits(1, 3)                  # class 1 cascade: pass 0
    bw.write_bits(0, 1)
    bw.write_bits(1, 8)                  # class 1 pass 0 -> book 1
    bw.write_bits(0, 6)                  # 1 mapping
    bw.write_bits(0, 16)                 # type 0
    bw.write_bits(0, 1)                  # 1 submap
    if couple:
        bw.write_bits(1, 1)
        bw.write_bits(0, 8)              # 1 coupling step
        bits = _ilog(ch - 1)
        bw.write_bits(0, bits)           # magnitude = ch 0
        bw.write_bits(1, bits)           # angle = ch 1
    else:
        bw.write_bits(0, 1)
    bw.write_bits(0, 2)                  # reserved
    bw.write_bits(0, 8)                  # submap time placeholder
    bw.write_bits(0, 8)                  # floor 0
    bw.write_bits(0, 8)                  # residue 0
    if two_modes:
        bw.write_bits(1, 6)              # 2 modes: short then long
        for bf in (0, 1):
            bw.write_bits(bf, 1)
            bw.write_bits(0, 16)
            bw.write_bits(0, 16)
            bw.write_bits(0, 8)
    else:
        bw.write_bits(0, 6)              # 1 mode
        bw.write_bits(0, 1)              # blockflag 0
        bw.write_bits(0, 16)
        bw.write_bits(0, 16)
        bw.write_bits(0, 8)
    bw.write_bits(1, 1)                  # framing
    return bw.flush()


def _ident_packet(ch: int, rate: int, n0: int,
                  n1: "int | None" = None) -> bytes:
    bw = _BitWriter()
    for b in b"\x01vorbis":
        bw.write_bits(b, 8)
    bw.write_bits(0, 32)
    bw.write_bits(ch, 8)
    bw.write_bits(rate, 32)
    for _ in range(3):
        bw.write_bits(0, 32)
    bw.write_bits(n0.bit_length() - 1, 4)
    bw.write_bits((n1 if n1 is not None else n0).bit_length() - 1, 4)
    bw.write_bits(1, 1)
    return bw.flush()


def _comment_packet(comments: "dict | None" = None) -> bytes:
    vendor = b"docling-graph-spark fixture encoder"
    out = bytearray(b"\x03vorbis")
    out += struct.pack("<I", len(vendor)) + vendor
    items = [f"{k.upper()}={v}".encode("utf-8")
             for k, v in (comments or {}).items()]
    out += struct.pack("<I", len(items))
    for it in items:
        out += struct.pack("<I", len(it)) + it
    out += b"\x01"
    return bytes(out)


_CLASS_CODES = assign_codewords([2, 2, 2, 2])
_VALUE_CODE_CACHE: Dict[int, Dict[int, Tuple[int, int]]] = {}


def _value_codes(bits: int) -> Dict[int, Tuple[int, int]]:
    c = _VALUE_CODE_CACHE.get(bits)
    if c is None:
        c = assign_codewords(_value_book_lengths(bits))
        _VALUE_CODE_CACHE[bits] = c
    return c


def _quantize(x: np.ndarray, lim: float, delta: float,
              levels: int) -> np.ndarray:
    clipped = np.clip(x, -lim, lim)
    return np.clip(np.rint((clipped - _VMIN) / delta), 0,
                   levels - 1).astype(np.int64)


def encode_vorbis(channels_pcm: List[List[int]], sample_rate: int,
                  blocksize: int = 256, couple: bool = False,
                  bits: int = 9,
                  long_blocksize: "int | None" = None,
                  comments: "dict | None" = None) -> bytes:
    """Encode int16 PCM channels as a real Ogg Vorbis stream.

    Default: equal blocksizes (one mode, blockflag 0).  With
    ``long_blocksize`` set, TWO modes are emitted and frames alternate
    short/long on a fixed pattern (frame k long iff k % 3 == 1), with
    the correct prev/next window flags — the long/short transition
    windows and center-aligned overlap-add then carry the
    reconstruction exactly as in the equal case.  Flat unit floor,
    residue type 2 with a silent class for all-zero partitions and a
    dim-1 value book with an exact-zero center, optional square-polar
    stereo coupling.  The decoder's output is deterministic: silence
    encodes and decodes to exact zeros, and arbitrary content round-
    trips within the scalar-quantizer error bound."""
    ch = len(channels_pcm)
    assert ch >= 1 and (not couple or ch == 2)
    bs0 = blocksize
    bs1 = long_blocksize if long_blocksize is not None else blocksize
    for nn in (bs0, bs1):
        assert nn & (nn - 1) == 0 and 64 <= nn <= 8192
    assert bs0 <= bs1
    two_modes = long_blocksize is not None and bs1 != bs0
    T = len(channels_pcm[0])
    assert all(len(c) == T for c in channels_pcm)

    def is_long(k: int) -> bool:
        return two_modes and k % 3 == 1

    # frame plan: sizes and absolute centers (block k is centered at
    # center_{k-1} + n_{k-1}/4 + n_k/4; output = [center_0, center_last))
    plan: List[Tuple[int, int]] = []     # (n, center)
    center = None
    k = 0
    while True:
        nn = bs1 if is_long(k) else bs0
        if center is None:
            center = nn // 2
            first = center
        else:
            center += plan[-1][0] // 4 + nn // 4
        plan.append((nn, center))
        if len(plan) >= 2 and center - first >= T:
            break
        k += 1
    margin = bs1
    total_len = margin + plan[-1][1] + bs1
    sig = [np.zeros(total_len) for _ in range(ch)]
    for c in range(ch):
        sig[c][margin + first:margin + first + T] = \
            np.asarray(channels_pcm[c], dtype=float) / 32768.0

    levels = (1 << bits) + 1
    zero = 1 << (bits - 1)
    delta = 8.0 / (levels - 1)
    vcodes = _value_codes(bits)
    lim = (-_VMIN) / 2 if couple else -_VMIN

    audio_packets: List[bytes] = []
    granules: List[int] = []
    for k, (nn, cen) in enumerate(plan):
        n2 = nn // 2
        bflag = 1 if (two_modes and nn == bs1) else 0
        prev_f = int(k > 0 and plan[k - 1][0] == bs1)
        next_f = int(k + 1 < len(plan) and plan[k + 1][0] == bs1)
        C = _imdct_matrix(nn)
        w = (_window_halves(nn, bs0, prev_f, next_f, bflag)
             if two_modes else _vorbis_window(nn))
        frames = [sig[c][margin + cen - n2:margin + cen + n2]
                  for c in range(ch)]
        specs = [(4.0 / nn) * (C.T @ (w * f)) for f in frames]
        lvls = [_quantize(sp, lim, delta, levels) for sp in specs]
        if couple:
            lv = _VMIN + delta * lvls[0]
            rv = _VMIN + delta * lvls[1]
            m = np.where(lv >= rv,
                         np.where(lv > 0, lv, rv),
                         np.where(rv > 0, rv, lv))
            a = np.where(lv >= rv,
                         np.where(lv > 0, lv - rv, rv - lv),
                         np.where(rv > 0, lv - rv, rv - lv))
            lvls = [_quantize(m, -_VMIN, delta, levels),
                    _quantize(a, -_VMIN, delta, levels)]
        inter = np.zeros(ch * n2, dtype=np.int64)
        for c in range(ch):
            inter[c::ch] = lvls[c]
        bw = _BitWriter()
        bw.write_bits(0, 1)              # audio packet type
        if two_modes:
            bw.write_bits(bflag, 1)      # mode number (2 modes: 1 bit)
            if bflag:
                bw.write_bits(prev_f, 1)
                bw.write_bits(next_f, 1)
        for _ in range(ch):              # flat unit floor per channel
            bw.write_bits(1, 1)          # nonzero
            bw.write_bits(255, 8)
            bw.write_bits(255, 8)
        n_parts = (ch * n2) // _PSIZE
        classes = [0 if np.all(inter[p * _PSIZE:(p + 1) * _PSIZE]
                               == zero) else 1
                   for p in range(n_parts)]
        p = 0
        while p < n_parts:
            c0 = classes[p]
            c1 = classes[p + 1] if p + 1 < n_parts else 0
            code, ln = _CLASS_CODES[c0 * 2 + c1]
            bw.write_code(code, ln)
            for i in range(2):
                if p >= n_parts:
                    break
                if classes[p]:
                    for v in inter[p * _PSIZE:(p + 1) * _PSIZE]:
                        code, ln = vcodes[int(v)]
                        bw.write_code(code, ln)
                p += 1
        audio_packets.append(bw.flush())
        granules.append(min(T, cen - first))

    serial = 0x5041
    pages = [ogg_page(serial, 0, 0,
                      [_ident_packet(ch, sample_rate, bs0, bs1)],
                      0x02),
             ogg_page(serial, 1, 0, [_comment_packet(comments),
                                     _setup_packet(ch, bs1 // 2,
                                                   couple, bits,
                                                   two_modes)])]
    # pack up to 40 audio packets per page (per-page overhead is the
    # dominant cost for sparse content otherwise)
    seq = 2
    j = 0
    while j < len(audio_packets):
        group = audio_packets[j:j + 40]
        j += len(group)
        last = j >= len(audio_packets)
        granule = T if last else granules[j - 1]
        pages.append(ogg_page(serial, seq, granule, group,
                              0x04 if last else 0))
        seq += 1
    return b"".join(pages)

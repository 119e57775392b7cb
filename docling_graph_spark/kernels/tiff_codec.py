"""Minimal TIFF decoder — pure Python, stdlib only.

TIFF shows up on crawls as scanned documents and publishing assets.
This decodes the subset that covers most of them: both byte orders
(II/MM), multi-page IFD chains with page selection (``page=``,
``n_pages`` reported, loop-guarded — the structure scanned documents
use), strip-based AND tiled storage, 8-bit samples
plus 16-bit via the standard high-byte reduction, grayscale
(photometric 0/1) and RGB (2), uncompressed (1), LZW (5, with the
TIFF early-change code widths and the optional horizontal-
differencing predictor, tag 317), PackBits (32773) and Deflate
(8, plus the legacy 32946 code; bounded inflate) compression,
planar configuration 2 (per-sample strip planes), and new-style
JPEG-in-TIFF (compression 7, TIFF TechNote 2: complete JPEG streams
per strip/tile, optional shared-table JPEGTables tag 347, gray or
YCbCr photometric, MCU-padded segments cropped) via the real baseline
decoder in `kernels/jpeg_codec.py` — the layout scanned-document
crawls actually carry, plus old-style JPEG (compression 6) when it
carries the common JPEGInterchangeFormat whole-stream layout (tags
513/514).  Per-strip old-style JPEG, planar tiles, 16-bit
prediction and other depths raise NotImplementedError — routed to the
error column upstream like every other codec.  The shared MAX_PIXELS
decompression-bomb guard applies (PackBits expands 128:1; LZW far
more), and every decompressor stops at the expected output size so a
hostile stream cannot balloon memory.

The encoder half is the fixture generator (uncompressed, PackBits,
LZW±predictor, or per-segment baseline JPEG with optional hoisted
tables; gray or RGB; multi-strip or tiled) so the decoder is testable
— byte-lossless for the lossless modes, stitched-equal to the direct
per-segment `decode_jpeg` outputs for JPEG mode.
"""

from __future__ import annotations

import struct
from typing import Dict, List, NamedTuple

MAX_PIXELS = 1 << 26


class DecodedTiff(NamedTuple):
    width: int
    height: int
    channels: int
    pixels: bytes      # interleaved, row-major
    n_pages: int = 1   # IFDs in the chain (multi-page scanned docs)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i:i + n + 1]
            i += n + 1
        elif n > 128:
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < expected:
        raise ValueError("truncated PackBits strip")
    return bytes(out[:expected])


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # find a run
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        # literal stretch until the next >=3 run
        j = i
        while j < n and j - i < 128:
            r = 1
            while j + r < n and r < 3 and data[j + r] == data[j]:
                r += 1
            if r >= 3:
                break
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out)


def _lzw_decode(data: bytes, expected: "int | None",
                early_change: bool = True) -> bytes:
    """TIFF-variant LZW: MSB-first codes, Clear=256/EOI=257, 9→12 bit
    codes with the early change — the decoder widens when the table
    reaches 511/1023/2047 entries (one before the power of two; with
    ``early_change=False``, PDF's EarlyChange=0, one after).  This is
    the same algorithm PDF's LZWDecode inherits.  With ``expected``
    the output is clamped to that size; with ``expected=None`` (the
    PDF stream case, unknown size) decode runs to EOI or input end,
    capped at 2^26 bytes (the table itself is capped at 4096 entries;
    once full, appends stop until the next Clear — the deferred-clear
    behaviour real decoders implement)."""
    out = bytearray()
    acc = accbits = pos = 0
    code_size = 9
    table: List[bytes] = []
    cap = expected if expected is not None else (1 << 26)
    widen = (511, 1023, 2047) if early_change else (512, 1024, 2048)

    def reset() -> None:
        nonlocal table, code_size
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        code_size = 9

    reset()
    prev: bytes | None = None
    n = len(data)
    while len(out) < cap:
        while accbits < code_size:
            if pos >= n:
                if expected is None:
                    return bytes(out)     # unterminated: all we have
                raise ValueError("truncated LZW data")
            acc = (acc << 8) | data[pos]
            pos += 1
            accbits += 8
        code = (acc >> (accbits - code_size)) & ((1 << code_size) - 1)
        accbits -= code_size
        if code == 256:
            reset()
            prev = None
            continue
        if code == 257:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("corrupt LZW stream (bad first code)")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]     # the KwKwK case
            else:
                raise ValueError("corrupt LZW stream (code gap)")
            if len(table) < 4096:
                table.append(prev + entry[:1])
                if len(table) in widen:
                    code_size += 1
        out += entry
        prev = entry
    if expected is not None and len(out) < expected:
        raise ValueError("LZW data does not cover the segment")
    return bytes(out[:cap])


def _lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW encoder (fixture generator), mirror of
    :func:`_lzw_decode`: the decoder lags one table entry behind, so
    the encoder widens at 512/1024/2048 and clears before its table
    outruns 12-bit codes."""
    out = bytearray()
    acc = accbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, accbits
        acc = (acc << size) | code
        accbits += size
        while accbits >= 8:
            out.append((acc >> (accbits - 8)) & 0xFF)
            accbits -= 8

    table: Dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    code_size = 9
    emit(256, code_size)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit(table[w], code_size)
        table[wc] = next_code
        next_code += 1
        if next_code in (512, 1024, 2048):
            code_size += 1
        elif next_code == 4093:             # keep clear of the 12-bit cap
            emit(256, code_size)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            code_size = 9
            w = b""
            wc = bytes([ch])                # restart Ω from this char
        w = wc[-1:]
    if w:
        emit(table[w], code_size)
    emit(257, code_size)
    if accbits:
        out.append((acc << (8 - accbits)) & 0xFF)
    return bytes(out)


def _undo_h_predictor(buf: bytearray, row_w: int, spp: int) -> None:
    """Inverse of horizontal differencing (predictor tag 317 = 2),
    in place, per ``row_w``-pixel row."""
    stride = row_w * spp
    for r0 in range(0, len(buf), stride):
        for x in range(r0 + spp, r0 + stride):
            buf[x] = (buf[x] + buf[x - spp]) & 0xFF


def _apply_h_predictor(buf: bytes, row_w: int, spp: int) -> bytes:
    """Forward horizontal differencing (encoder side)."""
    out = bytearray(buf)
    stride = row_w * spp
    for r0 in range(0, len(out), stride):
        for x in range(r0 + stride - 1, r0 + spp - 1, -1):
            out[x] = (out[x] - out[x - spp]) & 0xFF
    return bytes(out)


def _read_ifd(data: bytes, fmt: str, off: int) -> Dict[int, list]:
    (count,) = struct.unpack_from(fmt + "H", data, off)
    tags: Dict[int, list] = {}
    sizes = {1: 1, 2: 1, 3: 2, 4: 4, 7: 1}
    for i in range(count):
        base = off + 2 + 12 * i
        tag, typ, n = struct.unpack_from(fmt + "HHI", data, base)
        if typ not in sizes:
            continue
        total = sizes[typ] * n
        voff = base + 8 if total <= 4 else struct.unpack_from(
            fmt + "I", data, base + 8)[0]
        kind = {1: "B", 2: "B", 3: "H", 4: "I", 7: "B"}[typ]
        vals = list(struct.unpack_from(f"{fmt}{n}{kind}", data, voff))
        tags[tag] = vals
    return tags


def _ifd_chain(data: bytes, fmt: str, max_ifds: int = 1024) -> List[int]:
    """Offsets of every IFD in the chain (multi-page TIFF), bounded and
    loop-guarded."""
    offs: List[int] = []
    seen = set()
    (off,) = struct.unpack_from(fmt + "I", data, 4)
    while off and off not in seen and len(offs) < max_ifds:
        if off + 2 > len(data):
            break
        seen.add(off)
        offs.append(off)
        (count,) = struct.unpack_from(fmt + "H", data, off)
        nxt_at = off + 2 + 12 * count
        if nxt_at + 4 > len(data):
            break
        (off,) = struct.unpack_from(fmt + "I", data, nxt_at)
    return offs


def decode_tiff(data: bytes, page: int = 0) -> DecodedTiff:
    """Decode one page of a (possibly multi-page) TIFF; ``n_pages``
    always reports the IFD-chain length, mirroring the GIF/animation
    frame-selection API."""
    if data[:2] == b"II" and data[2:4] == b"\x2a\x00":
        fmt = "<"
    elif data[:2] == b"MM" and data[2:4] == b"\x00\x2a":
        fmt = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order header)")
    chain = _ifd_chain(data, fmt)
    if not chain:
        raise ValueError("TIFF has no IFD")
    if not 0 <= page < len(chain):
        raise ValueError(f"TIFF page {page} out of range "
                         f"(document has {len(chain)})")
    n_pages = len(chain)
    tags = _read_ifd(data, fmt, chain[page])

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    width = one(256)
    height = one(257)
    if width * height > MAX_PIXELS:
        raise ValueError(
            f"TIFF dimensions {width}x{height} exceed the {MAX_PIXELS}"
            "-pixel decode guard (decompression-bomb protection)")
    spp = one(277, 1)
    bits = tags.get(258, [8])
    if all(b == 8 for b in bits):
        sb = 1
    elif all(b == 16 for b in bits):
        sb = 2                           # round 5: high-byte reduction
    else:
        raise NotImplementedError(f"TIFF bit depths {bits} unsupported")
    comp = one(259, 1)
    if comp == 6:
        # old-style JPEG-in-TIFF (TIFF 6.0 §22): the COMMON legacy
        # layout carries one complete JPEG interchange stream at tag
        # 513 (offset) + 514 (length) — decode it whole through the
        # real JPEG decoder; the deprecated per-strip table variant
        # (tags 519-521 with no 513) stays routed by name
        if 513 in tags:
            joff = tags[513][0]
            jlen = tags.get(514, [len(data) - joff])[0]
            if joff + jlen > len(data) or jlen <= 0:
                raise ValueError(
                    "old-style JPEG offset/length outside the file")
            from .jpeg_codec import decode_jpeg

            dec = decode_jpeg(data[joff:joff + jlen])
            if (dec.width, dec.height) != (width, height):
                raise ValueError(
                    "old-style JPEG geometry disagrees with the IFD "
                    f"({dec.width}x{dec.height} vs {width}x{height})")
            return DecodedTiff(dec.width, dec.height, dec.channels,
                               dec.pixels, n_pages)
        raise NotImplementedError(
            "old-style JPEG-in-TIFF (compression 6, TIFF 6.0 §22) "
            "without a JPEGInterchangeFormat stream is deprecated and "
            "unsupported; new-style (7) decodes")
    if comp == 32946:
        comp = 8          # legacy Deflate code predates TIFF TechNote 3
    if comp not in (1, 5, 32773, 7, 8):
        raise NotImplementedError(
            f"TIFF compression {comp} unsupported (none/LZW/PackBits/"
            "JPEG/Deflate only)")
    photo = one(262, 1)
    if photo not in (0, 1, 2, 6):
        raise NotImplementedError(
            f"TIFF photometric {photo} unsupported")
    if photo == 6 and comp != 7:
        raise NotImplementedError(
            "photometric YCbCr is only supported inside new-style "
            "JPEG strips/tiles (compression 7)")
    planar = one(284, 1)
    if planar not in (1, 2):
        raise NotImplementedError(f"planar configuration {planar} "
                                  "unsupported")
    if planar == 2 and (322 in tags or 323 in tags):
        raise NotImplementedError("planar tiled TIFF unsupported")
    if spp not in (1, 3):
        raise NotImplementedError(f"{spp} samples/pixel unsupported")
    predictor = one(317, 1)
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor} "
                                  "unsupported")
    if predictor == 2 and sb == 2:
        raise NotImplementedError(
            "16-bit horizontal predictor unsupported")
    jpeg_tables: "bytes | None" = None
    if comp == 7:
        # New-style JPEG (TIFF TechNote 2): every strip/tile is a
        # complete JPEG interchange stream; an optional JPEGTables tag
        # (347) carries an abbreviated table stream (SOI tables EOI)
        # whose segments are spliced after each strip's SOI — the
        # layout libtiff writes for scanned documents.
        if sb != 1:
            raise NotImplementedError(
                "16-bit JPEG-in-TIFF unsupported")
        if predictor == 2:
            raise ValueError("predictor is meaningless with JPEG "
                             "compression")
        if planar == 2:
            raise NotImplementedError("planar JPEG-in-TIFF unsupported")
        if photo == 0:
            raise NotImplementedError(
                "WhiteIsZero JPEG-in-TIFF unsupported")
        tv = tags.get(347)
        if tv is not None:
            tb = bytes(tv)
            if tb[:2] != b"\xff\xd8" or tb[-2:] != b"\xff\xd9":
                raise ValueError("malformed JPEGTables stream")
            jpeg_tables = tb[2:-2]

    def jpeg_segment(raw: bytes, seg_w: int, rows: int) -> bytes:
        from .jpeg_codec import decode_jpeg

        stream = raw
        if stream[:2] != b"\xff\xd8":
            raise ValueError("JPEG strip/tile does not start with SOI")
        if jpeg_tables is not None:
            stream = b"\xff\xd8" + jpeg_tables + stream[2:]
        dec = decode_jpeg(stream)
        if dec.channels != spp:
            raise ValueError(
                f"JPEG segment has {dec.channels} channels, IFD "
                f"declares {spp}")
        if dec.width < seg_w or dec.height < rows:
            raise ValueError("JPEG segment smaller than its TIFF "
                             "region")
        if dec.width == seg_w and dec.height == rows:
            return dec.pixels
        # real writers may round segment dims up to the MCU: crop
        src_stride = dec.width * spp
        return b"".join(
            dec.pixels[r * src_stride:r * src_stride + seg_w * spp]
            for r in range(rows))

    def segment(raw: bytes, expected: int, row_w: int,
                seg_spp: int) -> bytes:
        if comp == 7:
            return jpeg_segment(raw, row_w,
                                expected // (row_w * seg_spp * sb))
        if comp == 1:
            if len(raw) < expected:
                raise ValueError("truncated TIFF segment")
            seg = raw[:expected]
        elif comp == 5:
            seg = _lzw_decode(raw, expected)
        elif comp == 8:
            import zlib

            # bounded inflate: never produce more than the segment
            # needs, whatever the stream claims (bomb guard)
            seg = zlib.decompressobj().decompress(raw, expected)
            if len(seg) < expected:
                raise ValueError("Deflate data does not cover the "
                                 "segment")
        else:
            seg = _packbits_decode(raw, expected)
        if predictor == 2:
            buf = bytearray(seg)
            _undo_h_predictor(buf, row_w, seg_spp)
            seg = bytes(buf)
        return seg

    stride = width * spp * sb
    if 322 in tags or 323 in tags:       # tiled layout
        tw, tl = one(322), one(323)
        if tw <= 0 or tl <= 0 or tw % 16 or tl % 16:
            raise ValueError("TIFF tile dimensions must be positive "
                             "multiples of 16")
        t_offsets = tags.get(324)
        t_counts = tags.get(325)
        across = _div_ceil(width, tw)
        down = _div_ceil(height, tl)
        if not t_offsets or not t_counts \
                or len(t_offsets) < across * down \
                or len(t_counts) < across * down:
            raise ValueError("TIFF missing tile layout")
        if across * down * tw * tl > 4 * MAX_PIXELS:
            raise ValueError("TIFF tile grid exceeds the decode guard")
        out = bytearray(height * stride)
        for ty in range(down):
            for tx in range(across):
                ti = ty * across + tx
                raw = data[t_offsets[ti]:t_offsets[ti] + t_counts[ti]]
                tile = segment(raw, tl * tw * spp * sb, tw, spp)
                copy_w = min(tw, width - tx * tw) * spp * sb
                for r in range(min(tl, height - ty * tl)):
                    src = r * tw * spp * sb
                    dst = (ty * tl + r) * stride + tx * tw * spp * sb
                    out[dst:dst + copy_w] = tile[src:src + copy_w]
    else:                                # strip layout
        offsets = tags.get(273)
        counts = tags.get(279)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("TIFF missing strip layout")
        rows_per_strip = one(278, height)
        if planar == 2:
            # round 5: separate planes — strips grouped per sample,
            # predictor rows are single-sample rows, planes interleave
            # at the end
            spl = _div_ceil(height, rows_per_strip)
            if len(offsets) < spl * spp:
                raise ValueError("planar TIFF missing plane strips")
            planes = []
            for pi in range(spp):
                pbuf = bytearray()
                for si in range(spl):
                    rows = min(rows_per_strip,
                               height - si * rows_per_strip)
                    k = pi * spl + si
                    pbuf += segment(data[offsets[k]:offsets[k]
                                         + counts[k]],
                                    rows * width * sb, width, 1)
                if len(pbuf) != height * width * sb:
                    raise ValueError(
                        "TIFF plane data does not cover the image")
                planes.append(pbuf)
            out = bytearray(height * stride)
            for i in range(height * width):
                for pi in range(spp):
                    out[(i * spp + pi) * sb:(i * spp + pi + 1) * sb]                         = planes[pi][i * sb:(i + 1) * sb]
        else:
            out = bytearray()
            for si, (soff, scnt) in enumerate(zip(offsets, counts)):
                rows = min(rows_per_strip, height - si * rows_per_strip)
                if rows <= 0:
                    break
                out += segment(data[soff:soff + scnt], rows * stride,
                               width, spp)
            if len(out) != height * stride:
                raise ValueError(
                    "TIFF strip data does not cover the image")
    if sb == 2:
        # 16-bit: standard high-byte reduction (PNG-style), honoring
        # the file byte order
        hi = 1 if fmt == "<" else 0
        out = bytearray(out[i * 2 + hi]
                        for i in range(height * width * spp))
    if photo == 0:  # WhiteIsZero: invert to the shared convention
        out = bytearray(255 - b for b in out)
    return DecodedTiff(width, height, spp, bytes(out), n_pages)


def _div_ceil(a: int, b: int) -> int:
    return -(-a // b)


def encode_tiff(width: int, height: int, channels: int, pixels: bytes,
                packbits: bool = False, big_endian: bool = False,
                rows_per_strip: int = 0, lzw: bool = False,
                predictor: int = 1,
                tile: "tuple[int, int] | None" = None,
                planar: bool = False, depth16: bool = False,
                deflate: "bool | str" = False,
                _return_parts: bool = False):
    """Fixture TIFF: gray (1 channel) or RGB (3); uncompressed,
    PackBits, LZW or Deflate (``deflate=True`` for code 8,
    ``deflate='legacy'`` for the pre-TechNote-3 code 32946; LZW and
    Deflate optionally with the horizontal-differencing predictor);
    strip-based (optionally multi-strip) or tiled (``tile=(tw, tl)``,
    multiples of 16, edge tiles zero-padded); either byte order."""
    assert channels in (1, 3) and len(pixels) == width * height * channels
    assert predictor in (1, 2)
    assert not (planar and tile) and not (depth16 and predictor == 2)
    fmt = ">" if big_endian else "<"
    comp = (32946 if deflate == "legacy" else 8) if deflate \
        else (5 if lzw else (32773 if packbits else 1))
    sb = 2 if depth16 else 1
    if depth16:
        # 16-bit samples as v*257 ((v<<8)|v): byte-order symmetric and
        # exactly reversible under the decoder's high-byte reduction
        wide = bytearray()
        for v in pixels:
            wide += bytes((v, v))
        pixels = bytes(wide)
    stride = width * channels * sb

    def compress(seg: bytes, row_w: int, seg_spp: int) -> bytes:
        if predictor == 2:
            seg = _apply_h_predictor(seg, row_w, seg_spp)
        if comp == 5:
            return _lzw_encode(seg)
        if comp == 32773:
            return _packbits_encode(seg)
        if comp in (8, 32946):
            import zlib

            return zlib.compress(seg, 6)
        return seg

    segs: List[bytes] = []
    if tile:
        tw, tl = tile
        assert tw % 16 == 0 and tl % 16 == 0
        for ty in range(0, height, tl):
            for tx in range(0, width, tw):
                buf = bytearray(tl * tw * channels * sb)
                copy_w = min(tw, width - tx) * channels * sb
                for r in range(min(tl, height - ty)):
                    src = (ty + r) * stride + tx * channels * sb
                    dst = r * tw * channels * sb
                    buf[dst:dst + copy_w] = pixels[src:src + copy_w]
                segs.append(compress(bytes(buf), tw, channels))
    elif planar:
        rows_per_strip = rows_per_strip or height
        for pi in range(channels):
            plane = bytes(b for i in range(width * height)
                          for b in pixels[(i * channels + pi) * sb:
                                          (i * channels + pi + 1) * sb])
            prow = width * sb
            for y0 in range(0, height, rows_per_strip):
                rows = min(rows_per_strip, height - y0)
                segs.append(compress(
                    plane[y0 * prow:(y0 + rows) * prow], width, 1))
    else:
        rows_per_strip = rows_per_strip or height
        for y0 in range(0, height, rows_per_strip):
            chunk = pixels[y0 * stride:(y0 + min(rows_per_strip,
                                                 height - y0)) * stride]
            segs.append(compress(chunk, width, channels))

    entries: List[tuple] = [
        (256, 4, [width]),
        (257, 4, [height]),
        (258, 3, [16 if depth16 else 8] * channels),
        (259, 3, [comp]),
        (262, 3, [2 if channels == 3 else 1]),
        (277, 3, [channels]),
    ]
    if planar:
        entries.append((284, 3, [2]))
    if predictor == 2:
        entries.append((317, 3, [2]))
    if tile:
        entries.append((322, 4, [tile[0]]))
        entries.append((323, 4, [tile[1]]))
        off_tag, cnt_tag = 324, 325
    else:
        entries.append((278, 4, [rows_per_strip]))
        off_tag, cnt_tag = 273, 279
    entries.append((off_tag, 4, None))          # filled below
    entries.append((cnt_tag, 4, [len(s) for s in segs]))
    if _return_parts:
        return entries, segs
    return _assemble_tiff(big_endian, entries, segs)


def encode_tiff_multipage(pages: List[dict],
                          big_endian: bool = False) -> bytes:
    """Multi-page fixture TIFF: each dict holds `encode_tiff` kwargs
    (width/height/channels/pixels plus any storage options); pages
    chain through the IFD next pointers like scanned documents."""
    parts = [encode_tiff(big_endian=big_endian, _return_parts=True,
                         **spec) for spec in pages]
    return _assemble_tiff_multi(big_endian, parts)


def _assemble_tiff(big_endian: bool, entries: List[tuple],
                   segs: List[bytes]) -> bytes:
    """Single-page layout (see :func:`_assemble_tiff_multi`)."""
    return _assemble_tiff_multi(big_endian, [(entries, segs)])


def _assemble_tiff_multi(big_endian: bool, pages: List[tuple]) -> bytes:
    """Lay out a chained-IFD TIFF: header, then per page a sorted IFD,
    its out-of-line value area and its data segments, with each IFD's
    next pointer linking to the following page (0 on the last — the
    multi-page structure scanned documents use).  An entry whose value
    list is ``None`` receives that page's segment offsets (tag
    273/324)."""
    fmt = ">" if big_endian else "<"
    sizes = {2: 1, 3: 2, 4: 4, 7: 1}
    out = bytearray(struct.pack(fmt + "2sHI",
                                b"MM" if big_endian else b"II", 0x2A, 8))
    pos = 8
    for pi, (entries, segs) in enumerate(pages):
        entries = sorted(entries, key=lambda e: e[0])  # spec: ascending
        val_pos = pos + 2 + 12 * len(entries) + 4
        ext: Dict[int, int] = {}
        for tag, typ, vals in entries:
            total = sizes[typ] * (len(segs) if vals is None
                                  else len(vals))
            if total > 4:
                ext[tag] = val_pos
                val_pos += total
        seg_offsets: List[int] = []
        p = val_pos
        for s in segs:
            seg_offsets.append(p)
            p += len(s)
        page_end = p                    # next page's IFD starts here
        entries = [(t, typ, seg_offsets if vals is None else vals)
                   for t, typ, vals in entries]

        out += struct.pack(fmt + "H", len(entries))
        valarea = bytearray()
        for tag, typ, vals in entries:
            kind = {2: "B", 3: "H", 4: "I", 7: "B"}[typ]
            total = sizes[typ] * len(vals)
            out += struct.pack(fmt + "HHI", tag, typ, len(vals))
            packed = struct.pack(f"{fmt}{len(vals)}{kind}", *vals)
            if total <= 4:
                out += packed + b"\x00" * (4 - total)
            else:
                out += struct.pack(fmt + "I", ext[tag])
                valarea += packed
        out += struct.pack(fmt + "I",
                           page_end if pi + 1 < len(pages) else 0)
        out += valarea
        for s in segs:
            out += s
        pos = page_end
    return bytes(out)


# ---------------------------------------------------------------------------
# New-style JPEG-in-TIFF (compression 7) fixture encoder
# ---------------------------------------------------------------------------

def _split_jpeg_tables(stream: bytes) -> "tuple[List[bytes], bytes]":
    """Split a JPEG interchange stream into its table segments
    (DQT/DHT) and the remainder (everything else between SOI and EOI,
    in order).  Used to build the abbreviated-stream layout libtiff
    writes: tables hoisted into tag 347, strips carry only frame +
    scan."""
    assert stream[:2] == b"\xff\xd8"
    tables: List[bytes] = []
    rest = bytearray()
    pos = 2
    while pos + 4 <= len(stream):
        if stream[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = stream[pos + 1]
        if marker == 0xD9:
            break
        (ln,) = struct.unpack_from(">H", stream, pos + 2)
        seg = stream[pos:pos + 2 + ln]
        if marker in (0xDB, 0xC4):          # DQT / DHT
            tables.append(seg)
            pos += 2 + ln
            continue
        if marker == 0xDA:                  # SOS: entropy data follows
            rest += stream[pos:-2]          # through to (not incl.) EOI
            break
        rest += seg
        pos += 2 + ln
    return tables, bytes(rest)


def _rgb_to_ycbcr420(width: int, height: int, pixels: bytes
                     ) -> "tuple[bytes, bytes, bytes]":
    """JFIF forward color transform + 2x2 mean chroma subsampling,
    rounding pinned to floor(x + 0.5) like the decoder side."""
    import numpy as np

    rgb = np.frombuffer(pixels, dtype=np.uint8).astype(np.float64)
    rgb = rgb.reshape(height, width, 3)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    yf = 0.299 * r + 0.587 * g + 0.114 * b
    cbf = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    crf = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b

    def q(a):
        return np.clip(np.floor(a + 0.5), 0, 255).astype(np.uint8)

    ch, cw = -(-height // 2), -(-width // 2)

    def sub(a):
        padded = np.pad(a, ((0, 2 * ch - height), (0, 2 * cw - width)),
                        mode="edge")
        return (padded[0::2, 0::2] + padded[0::2, 1::2]
                + padded[1::2, 0::2] + padded[1::2, 1::2]) / 4.0

    return (q(yf).tobytes(), q(sub(cbf)).tobytes(),
            q(sub(crf)).tobytes())


def encode_tiff_jpeg(width: int, height: int, channels: int,
                     pixels: bytes, rows_per_strip: int = 0,
                     tile: "tuple[int, int] | None" = None,
                     shared_tables: bool = False,
                     big_endian: bool = False) -> bytes:
    """Fixture new-style JPEG-in-TIFF: each strip/tile is encoded as a
    complete baseline JPEG (gray via the K.1-K.6 tables, RGB via the
    JFIF transform + 4:2:0); with ``shared_tables`` the DQT/DHT
    segments are hoisted into a JPEGTables tag (347) and the strips
    become abbreviated streams — the layout libtiff emits for scanned
    documents.  Note JPEG is lossy: the decode invariant is
    decode_tiff(...) == the per-segment decode_jpeg outputs stitched
    together, not byte identity with ``pixels``."""
    from .jpeg_codec import encode_jpeg_gray, encode_jpeg_ycbcr420

    assert channels in (1, 3) and len(pixels) == width * height * channels

    def enc_region(x0: int, y0: int, w: int, h: int) -> bytes:
        stride = width * channels
        buf = b"".join(
            pixels[(y0 + r) * stride + x0 * channels:
                   (y0 + r) * stride + (x0 + w) * channels]
            for r in range(h))
        if channels == 1:
            return encode_jpeg_gray(w, h, buf)
        y, cb, cr = _rgb_to_ycbcr420(w, h, buf)
        return encode_jpeg_ycbcr420(w, h, y, cb, cr)

    segs: List[bytes] = []
    if tile:
        tw, tl = tile
        assert tw % 16 == 0 and tl % 16 == 0
        for ty in range(0, height, tl):
            for tx in range(0, width, tw):
                # edge tiles are padded to full tile size (spec: tiles
                # are uniform; the decoder crops)
                w = min(tw, width - tx)
                h = min(tl, height - ty)
                if w < tw or h < tl:
                    stride = width * channels
                    rows = [pixels[(ty + r) * stride + tx * channels:
                                   (ty + r) * stride
                                   + (tx + w) * channels]
                            for r in range(h)]
                    rows = [rw + rw[-channels:] * (tw - w)
                            for rw in rows]
                    rows += [rows[-1]] * (tl - h)
                    buf = b"".join(rows)
                    if channels == 1:
                        from .jpeg_codec import encode_jpeg_gray as eg
                        segs.append(eg(tw, tl, buf))
                    else:
                        y, cb, cr = _rgb_to_ycbcr420(tw, tl, buf)
                        segs.append(encode_jpeg_ycbcr420(
                            tw, tl, y, cb, cr))
                else:
                    segs.append(enc_region(tx, ty, tw, tl))
    else:
        rows_per_strip = rows_per_strip or height
        for y0 in range(0, height, rows_per_strip):
            segs.append(enc_region(0, y0, width,
                                   min(rows_per_strip, height - y0)))

    entries: List[tuple] = [
        (256, 4, [width]),
        (257, 4, [height]),
        (258, 3, [8] * channels),
        (259, 3, [7]),
        (262, 3, [6 if channels == 3 else 1]),
        (277, 3, [channels]),
    ]
    if shared_tables:
        all_tables: List[bytes] = []
        stripped: List[bytes] = []
        for s in segs:
            tabs, rest = _split_jpeg_tables(s)
            for t in tabs:
                if t not in all_tables:
                    all_tables.append(t)
            stripped.append(b"\xff\xd8" + rest + b"\xff\xd9")
        segs = stripped
        tstream = b"\xff\xd8" + b"".join(all_tables) + b"\xff\xd9"
        entries.append((347, 7, list(tstream)))
    if tile:
        entries.append((322, 4, [tile[0]]))
        entries.append((323, 4, [tile[1]]))
        entries.append((324, 4, None))
        entries.append((325, 4, [len(s) for s in segs]))
    else:
        entries.append((278, 4, [rows_per_strip]))
        entries.append((273, 4, None))
        entries.append((279, 4, [len(s) for s in segs]))
    return _assemble_tiff(big_endian, entries, segs)


def encode_tiff_oldjpeg(width: int, height: int, channels: int,
                        pixels: bytes,
                        big_endian: bool = False) -> bytes:
    """Fixture old-style JPEG-in-TIFF (compression 6, TIFF 6.0 §22):
    one complete JPEG interchange stream referenced by
    JPEGInterchangeFormat (513) / ...Length (514) — the layout legacy
    scanner software actually wrote.  Decode invariant:
    decode_tiff(...) == decode_jpeg(embedded stream)."""
    from .jpeg_codec import encode_jpeg_gray, encode_jpeg_ycbcr420

    assert channels in (1, 3) and len(pixels) == width * height * channels
    if channels == 1:
        jpg = encode_jpeg_gray(width, height, pixels)
        photo = 1
    else:
        y, cb, cr = _rgb_to_ycbcr420(width, height, pixels)
        jpg = encode_jpeg_ycbcr420(width, height, y, cb, cr)
        photo = 6
    entries = [
        (256, 3, [width]), (257, 3, [height]),
        (258, 3, [8] * channels), (259, 3, [6]),
        (262, 3, [photo]), (277, 3, [channels]),
        (513, 4, None), (514, 4, [len(jpg)]),
    ]
    return _assemble_tiff(big_endian, entries, [jpg])

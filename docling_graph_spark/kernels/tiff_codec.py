"""Minimal TIFF decoder — pure Python, stdlib only.

TIFF shows up on crawls as scanned documents and publishing assets.
This decodes the baseline subset that covers most of them: both byte
orders (II/MM), the first IFD, strip-based storage, 8-bit samples,
grayscale (photometric 0/1) and RGB (2), uncompressed (1) and
PackBits (32773) compression.  Planar configuration 2, tiles, LZW/
JPEG-in-TIFF, and other depths raise NotImplementedError — routed to
the error column upstream like every other codec.  The shared
MAX_PIXELS decompression-bomb guard applies (PackBits expands 128:1).

The encoder half is the fixture generator (uncompressed or PackBits,
gray or RGB, multi-strip) so the decoder is testable byte-lossless.
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


def _read_ifd(data: bytes, fmt: str, off: int) -> Dict[int, list]:
    (count,) = struct.unpack_from(fmt + "H", data, off)
    tags: Dict[int, list] = {}
    sizes = {1: 1, 2: 1, 3: 2, 4: 4}
    for i in range(count):
        base = off + 2 + 12 * i
        tag, typ, n = struct.unpack_from(fmt + "HHI", data, base)
        if typ not in sizes:
            continue
        total = sizes[typ] * n
        voff = base + 8 if total <= 4 else struct.unpack_from(
            fmt + "I", data, base + 8)[0]
        kind = {1: "B", 2: "B", 3: "H", 4: "I"}[typ]
        vals = list(struct.unpack_from(f"{fmt}{n}{kind}", data, voff))
        tags[tag] = vals
    return tags


def decode_tiff(data: bytes) -> DecodedTiff:
    if data[:2] == b"II" and data[2:4] == b"\x2a\x00":
        fmt = "<"
    elif data[:2] == b"MM" and data[2:4] == b"\x00\x2a":
        fmt = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order header)")
    (ifd_off,) = struct.unpack_from(fmt + "I", data, 4)
    tags = _read_ifd(data, fmt, ifd_off)

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
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"TIFF bit depths {bits} unsupported")
    comp = one(259, 1)
    if comp not in (1, 32773):
        raise NotImplementedError(
            f"TIFF compression {comp} unsupported (none/PackBits only)")
    photo = one(262, 1)
    if photo not in (0, 1, 2):
        raise NotImplementedError(
            f"TIFF photometric {photo} unsupported")
    if one(284, 1) != 1:
        raise NotImplementedError("planar configuration 2 unsupported")
    if 322 in tags or 323 in tags:
        raise NotImplementedError("tiled TIFF unsupported")
    if spp not in (1, 3):
        raise NotImplementedError(f"{spp} samples/pixel unsupported")

    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF missing strip layout")
    rows_per_strip = one(278, height)
    stride = width * spp
    out = bytearray()
    for si, (soff, scnt) in enumerate(zip(offsets, counts)):
        rows = min(rows_per_strip, height - si * rows_per_strip)
        if rows <= 0:
            break
        expected = rows * stride
        raw = data[soff:soff + scnt]
        if comp == 1:
            if len(raw) < expected:
                raise ValueError("truncated TIFF strip")
            out += raw[:expected]
        else:
            out += _packbits_decode(raw, expected)
    if len(out) != height * stride:
        raise ValueError("TIFF strip data does not cover the image")
    if photo == 0:  # WhiteIsZero: invert to the shared convention
        out = bytearray(255 - b for b in out)
    return DecodedTiff(width, height, spp, bytes(out))


def encode_tiff(width: int, height: int, channels: int, pixels: bytes,
                packbits: bool = False, big_endian: bool = False,
                rows_per_strip: int = 0) -> bytes:
    """Fixture TIFF: gray (1 channel) or RGB (3), uncompressed or
    PackBits, optionally multi-strip and big-endian."""
    assert channels in (1, 3) and len(pixels) == width * height * channels
    fmt = ">" if big_endian else "<"
    rows_per_strip = rows_per_strip or height
    stride = width * channels
    strips: List[bytes] = []
    for y0 in range(0, height, rows_per_strip):
        chunk = pixels[y0 * stride:(y0 + min(rows_per_strip,
                                             height - y0)) * stride]
        strips.append(_packbits_encode(chunk) if packbits else chunk)

    n_tags = 9
    header = struct.pack(fmt + "2sHI", b"MM" if big_endian else b"II",
                         0x2A, 8)
    ifd_size = 2 + 12 * n_tags + 4
    # layout: header | IFD | bits array (if rgb) | offsets | counts | strips
    pos = 8 + ifd_size
    bits_off = pos
    if channels == 3:
        pos += 6
    arr_off = pos
    n_strips = len(strips)
    off_off, cnt_off = arr_off, arr_off + 4 * n_strips
    pos = cnt_off + 4 * n_strips
    strip_offsets = []
    for sdata in strips:
        strip_offsets.append(pos)
        pos += len(sdata)

    def entry(tag, typ, n, value_or_off):
        e = struct.pack(fmt + "HHI", tag, typ, n)
        if typ == 3 and n == 1:
            e += struct.pack(fmt + "HH", value_or_off, 0)
        else:
            e += struct.pack(fmt + "I", value_or_off)
        return e

    ifd = struct.pack(fmt + "H", n_tags)
    ifd += entry(256, 4, 1, width)
    ifd += entry(257, 4, 1, height)
    if channels == 3:
        ifd += entry(258, 3, 3, bits_off)
    else:
        ifd += entry(258, 3, 1, 8)
    ifd += entry(259, 3, 1, 32773 if packbits else 1)
    ifd += entry(262, 3, 1, 2 if channels == 3 else 1)
    if n_strips == 1:
        ifd += entry(273, 4, 1, strip_offsets[0])
    else:
        ifd += entry(273, 4, n_strips, off_off)
    ifd += entry(277, 3, 1, channels)
    ifd += entry(278, 4, 1, rows_per_strip)
    if n_strips == 1:
        ifd += entry(279, 4, 1, len(strips[0]))
    else:
        ifd += entry(279, 4, n_strips, cnt_off)
    ifd += struct.pack(fmt + "I", 0)  # next IFD

    out = bytearray(header + ifd)
    if channels == 3:
        out += struct.pack(fmt + "3H", 8, 8, 8)
    if n_strips > 1:
        for o in strip_offsets:
            out += struct.pack(fmt + "I", o)
        for sdata in strips:
            out += struct.pack(fmt + "I", len(sdata))
    else:
        # keep layout deterministic even when arrays are inlined
        out += b"\x00" * (8 * n_strips)
    for sdata in strips:
        out += sdata
    return bytes(out)

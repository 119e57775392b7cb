"""Pure-Python PNG codec (stdlib zlib only) — the one REAL media decoder.

The media stage treats payloads as opaque binary columns with stubbed
decode (`media_stub.decode_media`) because no image libraries ship in this
container — but PNG needs nothing beyond ``zlib``, so this module provides
a real decode path: signature + chunk walk, IHDR parse, IDAT inflate, and
full scanline defiltering (filter types 0-4 per the PNG spec, RFC 2083
§6).  The media operators route ``image/png`` payloads here; other media
types remain explicitly stubbed.

The encoder half exists for fixtures and oracles: fixed zlib level and
filter-0 rows make encode→decode a pure roundtrip, so tests and the DuckDB
oracle can reason about decoded pixels in closed form (the *compressed*
byte size is zlib-version-dependent and is deliberately never asserted).
"""

from __future__ import annotations

import struct
import zlib
from typing import NamedTuple

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (PNG spec §4.1.1)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class DecodedPng(NamedTuple):
    width: int
    height: int
    bit_depth: int
    color_type: int
    channels: int
    pixels: bytes  # defiltered scanline samples, row-major


def encode_png_gray(width: int, height: int, pixels: bytes) -> bytes:
    """Deterministic 8-bit grayscale PNG: filter-0 rows, fixed zlib level."""
    if len(pixels) != width * height:
        raise ValueError(
            f"need {width * height} pixels, got {len(pixels)}"
        )
    raw = b"".join(
        b"\x00" + pixels[y * width:(y + 1) * width] for y in range(height)
    )

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


MAX_PIXELS = 1 << 26  # decompression-bomb guard (shared policy with
# the other image codecs): IHDR carries u32 dims a 100-byte payload
# can set to billions


def decode_png(data: bytes) -> DecodedPng:
    """Parse + inflate + defilter a PNG payload.

    Supports 8-bit depth, all five color types, non-interlaced images —
    the overwhelmingly common crawl case.  Raises ``ValueError`` on
    malformed input and ``NotImplementedError`` on sub-8-bit depth, 16-bit
    depth, or Adam7 interlace (the caller routes those to the stub path /
    error column, never crashes the executor)."""
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = bit_depth = color_type = interlace = None
    idat = bytearray()
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) < length:
            raise ValueError("truncated PNG chunk")
        pos += 12 + length  # skip CRC
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8:
        raise NotImplementedError(f"bit depth {bit_depth} unsupported")
    if interlace != 0:
        raise NotImplementedError("Adam7 interlace unsupported")
    if color_type not in _CHANNELS:
        raise ValueError(f"bad color type {color_type}")
    channels = _CHANNELS[color_type]
    if width * height > MAX_PIXELS:
        raise ValueError(
            f"PNG dimensions {width}x{height} exceed the {MAX_PIXELS}-"
            "pixel decode guard (decompression-bomb protection)")
    bpp = channels  # bytes per pixel at 8-bit depth
    stride = width * bpp

    # bounded inflate: a zlib bomb in IDAT must not expand past the
    # geometry-implied size no matter what it claims
    expected = height * (stride + 1)
    raw = zlib.decompressobj().decompress(bytes(idat), expected + 1)
    if len(raw) != expected:
        raise ValueError(
            f"inflated size {len(raw)}+ != expected {expected}"
        )

    out = bytearray(height * stride)
    prev_start = -1
    for y in range(height):
        row_off = y * (stride + 1)
        ftype = raw[row_off]
        line = raw[row_off + 1:row_off + 1 + stride]
        cur_start = y * stride
        if ftype == 0:          # None
            out[cur_start:cur_start + stride] = line
        elif ftype == 1:        # Sub
            for i in range(stride):
                a = out[cur_start + i - bpp] if i >= bpp else 0
                out[cur_start + i] = (line[i] + a) & 0xFF
        elif ftype == 2:        # Up
            for i in range(stride):
                b = out[prev_start + i] if y > 0 else 0
                out[cur_start + i] = (line[i] + b) & 0xFF
        elif ftype == 3:        # Average
            for i in range(stride):
                a = out[cur_start + i - bpp] if i >= bpp else 0
                b = out[prev_start + i] if y > 0 else 0
                out[cur_start + i] = (line[i] + ((a + b) >> 1)) & 0xFF
        elif ftype == 4:        # Paeth
            for i in range(stride):
                a = out[cur_start + i - bpp] if i >= bpp else 0
                b = out[prev_start + i] if y > 0 else 0
                c = out[prev_start + i - bpp] if (y > 0 and i >= bpp) else 0
                out[cur_start + i] = (line[i] + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype} in row {y}")
        prev_start = cur_start
    return DecodedPng(width, height, bit_depth, color_type, channels,
                      bytes(out))

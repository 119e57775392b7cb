"""ICO (favicon) decoder — pure Python, stdlib only.

Favicons are fetched alongside nearly every crawled page, so the
multimodal column sees ICO constantly.  An ICO is a directory of
images; each entry is either an embedded PNG (the modern form —
delegated to kernels/png_codec) or a headerless DIB: a
BITMAPINFOHEADER whose biHeight covers BOTH the XOR (color) bitmap and
the 1-bit AND (transparency) mask, bottom-up rows, 1/4/8-bit palette
or 24/32-bit truecolor.

``decode_ico`` picks the LARGEST entry (the one a thumbnailer would
want) and returns RGB when fully opaque, RGBA otherwise — the shared
image-codec contract.  32-bit entries trust their alpha channel; lower
depths take transparency from the AND mask.  The same MAX_PIXELS
decompression-bomb guard as the other image codecs applies.
"""

from __future__ import annotations

import struct
from typing import List, NamedTuple

MAX_PIXELS = 1 << 26


class DecodedIco(NamedTuple):
    width: int
    height: int
    channels: int
    pixels: bytes      # interleaved RGB (opaque) or RGBA
    n_images: int


def _row_stride(width: int, bpp: int) -> int:
    return ((width * bpp + 31) // 32) * 4


def decode_ico(data: bytes) -> DecodedIco:
    if len(data) < 6 or data[:4] != b"\x00\x00\x01\x00":
        raise ValueError("not an ICO (bad ICONDIR header)")
    count = struct.unpack_from("<H", data, 4)[0]
    if count == 0:
        raise ValueError("ICO with no images")
    entries = []
    for i in range(count):
        off = 6 + 16 * i
        if off + 16 > len(data):
            raise ValueError("truncated ICONDIR")
        w, h = data[off], data[off + 1]
        w = w or 256
        h = h or 256
        size, doff = struct.unpack_from("<II", data, off + 8)
        entries.append((w * h, w, h, doff, size))
    _, w, h, doff, size = max(entries)
    if w * h > MAX_PIXELS:
        raise ValueError(
            f"ICO entry {w}x{h} exceeds the {MAX_PIXELS}-pixel guard")
    body = data[doff:doff + size]
    if body[:8] == b"\x89PNG\r\n\x1a\n":
        from .png_codec import decode_png

        png = decode_png(body)
        px = png.pixels
        if png.channels == 4:
            opaque = all(px[i] == 255 for i in range(3, len(px), 4))
            if opaque:
                px = bytes(b for i in range(0, len(px), 4)
                           for b in px[i:i + 3])
                return DecodedIco(png.width, png.height, 3, px, count)
            return DecodedIco(png.width, png.height, 4, px, count)
        if png.channels == 1:
            return DecodedIco(png.width, png.height, 1, px, count)
        return DecodedIco(png.width, png.height, png.channels, px,
                          count)

    if len(body) < 40:
        raise ValueError("truncated ICO DIB")
    (hdr_size, bw, bh2, _planes, bpp, comp) = struct.unpack_from(
        "<IiiHHI", body, 0)
    if hdr_size < 40 or comp != 0:
        raise ValueError(f"unsupported ICO DIB (header {hdr_size}, "
                         f"compression {comp})")
    if bpp not in (1, 4, 8, 24, 32):
        raise ValueError(f"unsupported ICO bit depth {bpp}")
    bh = bh2 // 2  # biHeight spans XOR + AND masks
    if bw != w or bh != h:
        w, h = bw, bh  # some writers leave the dir entry stale
        if w * h > MAX_PIXELS:
            raise ValueError("ICO DIB exceeds the pixel guard")

    pos = hdr_size
    palette: List[bytes] = []
    if bpp <= 8:
        n_colors = struct.unpack_from("<I", body, 32)[0] or (1 << bpp)
        for i in range(n_colors):
            b, g, r, _x = body[pos + 4 * i:pos + 4 * i + 4]
            palette.append(bytes((r, g, b)))
        pos += 4 * n_colors

    xor_stride = _row_stride(w, bpp)
    and_stride = _row_stride(w, 1)
    xor = body[pos:pos + xor_stride * h]
    and_mask = body[pos + xor_stride * h:
                    pos + xor_stride * h + and_stride * h]
    if len(xor) < xor_stride * h:
        raise ValueError("truncated ICO XOR bitmap")
    have_and = len(and_mask) >= and_stride * h

    rgba = bytearray(w * h * 4)
    any_alpha = False
    for y in range(h):
        src_y = h - 1 - y  # bottom-up
        row = xor[src_y * xor_stride:(src_y + 1) * xor_stride]
        arow = (and_mask[src_y * and_stride:(src_y + 1) * and_stride]
                if have_and else b"")
        for x in range(w):
            o = (y * w + x) * 4
            if bpp == 32:
                b, g, r, a = row[4 * x:4 * x + 4]
                rgba[o:o + 4] = bytes((r, g, b, a))
                if a != 255:
                    any_alpha = True
                continue
            if bpp == 24:
                b, g, r = row[3 * x:3 * x + 3]
                rgb = bytes((r, g, b))
            else:
                per = 8 // bpp
                shift = 8 - bpp * (x % per + 1)
                idx = (row[x // per] >> shift) & ((1 << bpp) - 1)
                rgb = palette[idx] if idx < len(palette) else b"\0\0\0"
            a = 255
            if have_and:
                if (arow[x // 8] >> (7 - x % 8)) & 1:
                    a = 0
                    any_alpha = True
            rgba[o:o + 3] = rgb
            rgba[o + 3] = a
    if any_alpha:
        return DecodedIco(w, h, 4, bytes(rgba), count)
    rgb_out = bytes(b for i in range(0, len(rgba), 4)
                    for b in rgba[i:i + 3])
    return DecodedIco(w, h, 3, rgb_out, count)


# ---------------------------------------------------------------------------
# Fixture encoders
# ---------------------------------------------------------------------------


def encode_ico_png(width: int, height: int, gray: bytes) -> bytes:
    """ICO with one embedded-PNG entry (the modern favicon form)."""
    from .png_codec import encode_png_gray

    png = encode_png_gray(width, height, gray)
    hdr = b"\x00\x00\x01\x00\x01\x00"
    entry = struct.pack("<BBBBHHII", width % 256, height % 256, 0, 0,
                        1, 32, len(png), 22)
    return hdr + entry + png


def encode_ico_dib(width: int, height: int, rgba: bytes,
                   bpp: int = 32) -> bytes:
    """ICO with one DIB entry: 32-bit BGRA or 24-bit BGR + AND mask
    from the alpha channel (alpha<128 -> transparent)."""
    assert bpp in (24, 32) and len(rgba) == width * height * 4
    xor_stride = _row_stride(width, bpp)
    and_stride = _row_stride(width, 1)
    xor = bytearray()
    amask = bytearray()
    for y in range(height - 1, -1, -1):
        row = bytearray(xor_stride)
        arow = bytearray(and_stride)
        for x in range(width):
            r, g, b, a = rgba[(y * width + x) * 4:(y * width + x) * 4
                              + 4]
            if bpp == 32:
                row[4 * x:4 * x + 4] = bytes((b, g, r, a))
            else:
                row[3 * x:3 * x + 3] = bytes((b, g, r))
            if a < 128:
                arow[x // 8] |= 1 << (7 - x % 8)
        xor += row
        amask += arow
    dib = struct.pack("<IiiHHIIiiII", 40, width, height * 2, 1, bpp,
                      0, 0, 0, 0, 0, 0) + bytes(xor) + bytes(amask)
    hdr = b"\x00\x00\x01\x00\x01\x00"
    entry = struct.pack("<BBBBHHII", width % 256, height % 256, 0, 0,
                        1, bpp, len(dib), 22)
    return hdr + entry + dib

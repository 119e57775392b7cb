"""BMP decoder — stdlib-only, uncompressed BI_RGB payloads.

Windows bitmaps are the third web image format with a feasible
dependency-free decoder (after PNG/JPEG): the pixel data is raw.
Supported: BITMAPINFOHEADER (and the larger V4/V5 headers, which embed
it), 24/32-bit BGR(A) truecolor and 8-bit paletted, bottom-up (positive
height) and top-down (negative) row order, rows padded to 4 bytes.
RLE compression and 1/4/16-bit depths raise NotImplementedError —
routed upstream as a decode_error column, with the geometry probe
(`media_probe._probe_bmp`) still filling width/height.

Output is interleaved RGB (alpha dropped: the A byte of 32-bit BMPs is
historically padding), matching the other image codecs' contract.

The encoder half generates fixtures: 24-bit bottom-up BI_RGB from raw
RGB samples — byte-lossless, which is what lets the driver stage's
oracle predict pixel sums in closed form.
"""

from __future__ import annotations

import struct
from typing import NamedTuple


class DecodedBmp(NamedTuple):
    width: int
    height: int
    channels: int
    pixels: bytes  # interleaved RGB


MAX_PIXELS = 1 << 26  # shared decode guard with the other image codecs


def decode_bmp(data: bytes) -> DecodedBmp:
    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("not a BMP")
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP not supported")
    w, h = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression != 0:
        raise NotImplementedError(
            f"BMP compression {compression} not supported (BI_RGB only)")
    if bpp not in (8, 24, 32):
        raise NotImplementedError(f"{bpp}-bit BMP not supported")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h <= 0:
        raise ValueError("bad BMP dimensions")
    if w * h > MAX_PIXELS:
        raise ValueError(
            f"BMP dimensions {w}x{h} exceed the {MAX_PIXELS}-pixel "
            "decode guard (decompression-bomb protection)")

    palette = None
    if bpp == 8:
        n_colors = struct.unpack_from("<I", data, 46)[0] or 256
        pal_off = 14 + hdr_size
        palette = [
            data[pal_off + 4 * i: pal_off + 4 * i + 3]  # B,G,R
            for i in range(n_colors)
        ]

    # vectorized row decode: strided view over the padded rows, channel
    # reorder / palette LUT in numpy — no per-pixel Python
    import numpy as np

    row_bytes = (w * bpp // 8 + 3) & ~3
    # the final row may legally omit its pad bytes; everything else
    # must be present
    if pixel_off + (h - 1) * row_bytes + w * bpp // 8 > len(data):
        raise ValueError("truncated BMP pixel data")
    avail = len(data) - pixel_off
    raw = np.frombuffer(data, dtype=np.uint8,
                        count=min(h * row_bytes, avail),
                        offset=pixel_off)
    if raw.size < h * row_bytes:
        raw = np.concatenate(
            [raw, np.zeros(h * row_bytes - raw.size, dtype=np.uint8)])
    rows = raw.reshape(h, row_bytes)
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        pal = np.zeros((256, 3), dtype=np.uint8)
        for i, c in enumerate(palette):
            pal[i] = (c[2], c[1], c[0])  # stored BGR -> RGB
        out = pal[rows[:, :w]]
    else:
        nb = bpp // 8
        px = rows[:, : w * nb].reshape(h, w, nb)
        out = px[:, :, [2, 1, 0]]  # BGR(A) -> RGB, alpha dropped
    return DecodedBmp(w, h, 3, np.ascontiguousarray(out).tobytes())


def encode_bmp_rgb(width: int, height: int, rgb: bytes) -> bytes:
    """24-bit bottom-up BI_RGB BMP from row-major interleaved RGB."""
    row_bytes = (width * 3 + 3) & ~3
    pix = bytearray()
    for y in range(height - 1, -1, -1):
        row = bytearray()
        for x in range(width):
            i = (y * width + x) * 3
            row += bytes((rgb[i + 2], rgb[i + 1], rgb[i]))  # BGR
        row += b"\x00" * (row_bytes - len(row))
        pix += row
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       len(pix), 2835, 2835, 0, 0)
    return header + info + bytes(pix)

"""BMP decoder — stdlib-only BI_RGB / BI_RLE8 / BI_RLE4 payloads.

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
    if compression not in (0, 1, 2):
        raise NotImplementedError(
            f"BMP compression {compression} not supported "
            "(BI_RGB/BI_RLE8/BI_RLE4 only)")
    if compression == 1 and bpp != 8 or compression == 2 and bpp != 4:
        raise ValueError("BMP RLE compression/depth mismatch")
    if bpp not in (1, 4, 8, 24, 32):
        raise NotImplementedError(f"{bpp}-bit BMP not supported")
    top_down = h < 0
    if top_down and compression:
        raise ValueError("top-down RLE BMP is invalid")
    h = abs(h)
    if w <= 0 or h <= 0:
        raise ValueError("bad BMP dimensions")
    if w * h > MAX_PIXELS:
        raise ValueError(
            f"BMP dimensions {w}x{h} exceed the {MAX_PIXELS}-pixel "
            "decode guard (decompression-bomb protection)")

    palette = None
    if bpp <= 8:
        n_colors = struct.unpack_from("<I", data, 46)[0] or (1 << bpp)
        pal_off = 14 + hdr_size
        palette = [
            data[pal_off + 4 * i: pal_off + 4 * i + 3]  # B,G,R
            for i in range(n_colors)
        ]

    # vectorized row decode: strided view over the padded rows, channel
    # reorder / palette LUT in numpy — no per-pixel Python
    import numpy as np

    if compression:
        # round 5: RLE8/RLE4 — run/escape decode into an index grid
        # (skipped areas stay palette entry 0, per the format), then
        # the same palette LUT as the uncompressed path
        idx = _decode_bmp_rle(data, pixel_off, w, h,
                              rle4=(compression == 2))
        pal = np.zeros((256, 3), dtype=np.uint8)
        for pi, c in enumerate(palette):
            pal[pi] = (c[2], c[1], c[0])
        out = pal[idx]
        return DecodedBmp(w, h, 3,
                          np.ascontiguousarray(out).tobytes())

    row_bytes = ((w * bpp + 31) // 32) * 4
    # the final row may legally omit its pad bytes; everything else
    # must be present
    if pixel_off + (h - 1) * row_bytes \
            + (w * bpp + 7) // 8 > len(data):
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
    if bpp <= 8:
        pal = np.zeros((256, 3), dtype=np.uint8)
        for i, c in enumerate(palette):
            pal[i] = (c[2], c[1], c[0])  # stored BGR -> RGB
        if bpp == 8:
            ids = rows[:, :w]
        elif bpp == 4:
            nyb = np.zeros((h, 2 * row_bytes), dtype=np.uint8)
            nyb[:, 0::2] = rows >> 4
            nyb[:, 1::2] = rows & 0xF
            ids = nyb[:, :w]
        else:                            # 1-bit
            bits = np.unpackbits(rows, axis=1)
            ids = bits[:, :w]
        out = pal[ids]
    else:
        nb = bpp // 8
        px = rows[:, : w * nb].reshape(h, w, nb)
        out = px[:, :, [2, 1, 0]]  # BGR(A) -> RGB, alpha dropped
    return DecodedBmp(w, h, 3, np.ascontiguousarray(out).tobytes())


def _decode_bmp_rle(data: bytes, pixel_off: int, w: int, h: int,
                    rle4: bool):
    import numpy as np

    idx = np.zeros((h, w), dtype=np.uint8)
    x = y = 0                            # y counts from the BOTTOM row
    i = pixel_off
    n = len(data)
    while i + 1 < n and y < h:
        cnt, val = data[i], data[i + 1]
        i += 2
        row = h - 1 - y
        if cnt:
            if rle4:
                pair = (val >> 4, val & 0xF)
                for k in range(cnt):
                    if x < w:
                        idx[row, x] = pair[k & 1]
                    x += 1
            else:
                end = min(x + cnt, w)
                if x < w:
                    idx[row, x:end] = val
                x += cnt
        elif val == 0:                   # end of line
            x = 0
            y += 1
        elif val == 1:                   # end of bitmap
            break
        elif val == 2:                   # delta
            if i + 2 > n:
                break
            x += data[i]
            y += data[i + 1]
            i += 2
        else:                            # absolute (literal) run
            if rle4:
                nbytes = (val + 1) // 2
                for k in range(val):
                    if i + k // 2 >= n:
                        break
                    b = data[i + k // 2]
                    v = b >> 4 if k % 2 == 0 else b & 0xF
                    if x < w and row >= 0:
                        idx[row, x] = v
                    x += 1
                i += nbytes + (nbytes & 1)
            else:
                for k in range(val):
                    if i + k >= n:
                        break
                    if x < w and row >= 0:
                        idx[row, x] = data[i + k]
                    x += 1
                i += val + (val & 1)
    return idx


def encode_bmp_rle8(width: int, height: int, indices: bytes,
                    palette) -> bytes:
    """Fixture RLE8 BMP: naive run coding with EOL/EOB escapes and an
    absolute run whenever a row has no repeats."""
    assert len(indices) == width * height
    body = bytearray()
    for row in range(height - 1, -1, -1):          # bottom-up
        line = indices[row * width:(row + 1) * width]
        x = 0
        while x < width:
            run = 1
            while x + run < width and run < 255 \
                    and line[x + run] == line[x]:
                run += 1
            if run >= 2:
                body += bytes((run, line[x]))
                x += run
            else:
                j = x
                while j < width and j - x < 255:
                    if j + 1 < width and line[j + 1] == line[j]:
                        break
                    j += 1
                lit = line[x:j]
                if len(lit) >= 3:
                    body += bytes((0, len(lit))) + lit
                    if len(lit) & 1:
                        body += b"\x00"
                else:
                    for v in lit:
                        body += bytes((1, v))
                x = j
        body += b"\x00\x00"                       # EOL
    body += b"\x00\x01"                           # EOB
    pal = bytearray()
    for c in palette:
        pal += bytes((c[2], c[1], c[0], 0))        # RGB -> stored BGR0
    off = 14 + 40 + len(pal)
    hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 8, 1,
                       len(body), 0, 0, len(palette), 0)
    return bytes(hdr + info + pal + body)


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

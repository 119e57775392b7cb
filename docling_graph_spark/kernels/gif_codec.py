"""GIF decoder — stdlib-only LZW, first frame, 87a/89a.

GIF is lossless (palette indices under variable-width LZW), so a real
decoder needs no DSP — just the GIF89a block grammar and the LZW
variant with clear/end codes and width growth at table size 2^n.

Supported: global and local color tables, interlaced images (the
four-pass row shuffle), extension blocks skipped, FIRST image decoded
(animation frame sampling is the media_transform stage's job).  The
frame is composed onto the logical screen at its (left, top) offset;
pixels outside the frame take the background color.  Transparency is
ignored (output channels = 3, the shared image-codec contract).

The encoder half generates fixtures: one full-screen non-interlaced
frame from palette indices, real LZW compression (table reset on
overflow at code 4095) — byte-lossless roundtrip, closed-form oracles.
"""

from __future__ import annotations

import struct
from typing import List, NamedTuple


class DecodedGif(NamedTuple):
    width: int
    height: int
    channels: int
    pixels: bytes  # interleaved RGB (the requested composed frame)
    n_frames: int = 1


def _lzw_decode(min_code_size: int, data: bytes, n_expected: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    table: List[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1

    width = min_code_size + 1
    reset()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset()
                prev = None
                continue
            if code == end:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("corrupt LZW stream")
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= n_expected:
                return bytes(out[:n_expected])
    return bytes(out)


_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


MAX_PIXELS = 1 << 26  # decompression-bomb guard: LZW expands ~1000x,
# so the declared logical-screen geometry gates the decode


def decode_gif(data: bytes, frame: int = 0,
               max_frames: int = 1024) -> DecodedGif:
    """Decode a GIF to the composited logical screen.

    ``frame=0`` (default) composes the FIRST frame — the cheap path
    the image pipeline uses.  ``frame=-1`` runs the full ANIMATION to
    its final state: every frame decoded and composited in order with
    the GIF89a graphic-control semantics — disposal methods 0/1 (leave
    in place), 2 (restore the frame rect to background) and 3 (restore
    to the previous screen), and transparent-color indices that never
    overwrite.  A non-negative ``frame`` returns that frame's composed
    screen.  ``n_frames`` always reports the full frame count (cheap
    block-structure walk, no extra LZW work).  ``max_frames`` bounds
    animation work the same way MAX_PIXELS bounds geometry."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    sw, sh, flags, bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    if sw * sh > MAX_PIXELS:
        raise ValueError(
            f"GIF screen {sw}x{sh} exceeds the {MAX_PIXELS}-pixel "
            "decode guard (decompression-bomb protection)")
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = [data[pos + 3 * i: pos + 3 * i + 3] for i in range(n)]
        pos += 3 * n

    import numpy as np

    bg_rgb = tuple(gct[bg]) if gct and bg < len(gct) else (0, 0, 0)
    screen = np.empty((sh, sw, 3), dtype=np.uint8)
    screen[:, :] = bg_rgb

    n_frames = 0
    want = None          # the composed screen to return
    disposal = 0
    transparent = None
    stop_decoding = False
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension
            label = data[pos + 1]
            body = bytearray()
            pos += 2
            while data[pos]:
                ln = data[pos]
                body += data[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            if label == 0xF9 and len(body) >= 4:  # graphic control
                disposal = (body[0] >> 2) & 0x7
                transparent = body[3] if body[0] & 1 else None
        elif b == 0x2C:  # image descriptor
            left, top, w, h, iflags = struct.unpack_from("<HHHHB",
                                                         data, pos + 1)
            if w * h > MAX_PIXELS:
                raise ValueError(
                    f"GIF frame {w}x{h} exceeds the {MAX_PIXELS}-pixel "
                    "decode guard (decompression-bomb protection)")
            pos += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                ct = [data[pos + 3 * i: pos + 3 * i + 3]
                      for i in range(n)]
                pos += 3 * n
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos]:
                ln = data[pos]
                lzw += data[pos + 1: pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            n_frames += 1
            if n_frames > max_frames:
                raise ValueError(
                    f"GIF exceeds the {max_frames}-frame decode guard")
            decode_this = not stop_decoding
            if decode_this:
                if ct is None:
                    raise ValueError("GIF image with no color table")
                idx = _lzw_decode(min_code, bytes(lzw), w * h)
                if len(idx) < w * h:
                    raise ValueError("truncated GIF image data")
                if iflags & 0x40:  # deinterlace
                    rows = [b""] * h
                    src = 0
                    for start, step in _INTERLACE:
                        for y in range(start, h, step):
                            rows[y] = idx[src * w:(src + 1) * w]
                            src += 1
                    idx = b"".join(rows)
                pal = np.zeros((max(len(ct), 256), 3), dtype=np.uint8)
                for i, c in enumerate(ct):
                    pal[i] = tuple(c)
                ind = np.frombuffer(idx[:w * h], dtype=np.uint8) \
                    .reshape(h, w)
                rgb = pal[ind]
                y0, x0 = max(top, 0), max(left, 0)
                y1, x1 = min(top + h, sh), min(left + w, sw)
                prev = screen.copy() if disposal == 3 else None
                if y1 > y0 and x1 > x0:
                    sub = rgb[y0 - top:y1 - top, x0 - left:x1 - left]
                    if transparent is not None:
                        mask = (ind[y0 - top:y1 - top,
                                    x0 - left:x1 - left] != transparent)
                        region = screen[y0:y1, x0:x1]
                        region[mask] = sub[mask]
                    else:
                        screen[y0:y1, x0:x1] = sub
                if frame >= 0 and n_frames == frame + 1:
                    want = screen.copy()
                    stop_decoding = frame != -1
                # post-frame disposal prepares the NEXT frame's canvas
                if not stop_decoding:
                    if disposal == 2 and y1 > y0 and x1 > x0:
                        screen[y0:y1, x0:x1] = bg_rgb
                    elif disposal == 3 and prev is not None:
                        screen = prev
            disposal = 0
            transparent = None
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b:02X}")
    if n_frames == 0:
        raise ValueError("GIF contains no image")
    if frame == -1:
        want = screen
    if want is None:
        raise ValueError(
            f"GIF has {n_frames} frames; frame {frame} out of range")
    return DecodedGif(sw, sh, 3, want.tobytes(), n_frames)


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    cur = b""
    for byte in indices:
        probe = cur + bytes([byte])
        if probe in table:
            cur = probe
            continue
        emit(table[cur], width)
        table[probe] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code > 4095:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        cur = bytes([byte])
    if cur:
        emit(table[cur], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(width: int, height: int, palette: List[bytes],
               indices: bytes, interlace: bool = False) -> bytes:
    """Single full-screen frame GIF89a from palette + row-major indices."""
    n = len(palette)
    bits = max(1, (n - 1).bit_length())
    size = 1 << bits
    flags = 0x80 | (bits - 1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, flags, 0, 0)
    for i in range(size):
        out += palette[i] if i < n else b"\x00\x00\x00"
    iflags = 0x40 if interlace else 0
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, iflags)
    if interlace:
        shuffled = bytearray()
        for start, step in _INTERLACE:
            for y in range(start, height, step):
                shuffled += indices[y * width:(y + 1) * width]
        indices = bytes(shuffled)
    min_code = max(2, bits)
    out.append(min_code)
    lzw = _lzw_encode(min_code, indices)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def encode_gif_animation(width: int, height: int, palette: List[bytes],
                         frames: List[dict], bg: int = 0) -> bytes:
    """Multi-frame GIF89a animation fixture.  Each frame dict:
    ``indices`` (row-major, frame-local), optional ``left``/``top``/
    ``w``/``h`` (default full screen), ``disposal`` (0-3) and
    ``transparent`` (palette index or None) — written as a graphic
    control extension before the image, exactly the structures the
    decoder's animation path consumes."""
    n = len(palette)
    bits = max(1, (n - 1).bit_length())
    size = 1 << bits
    flags = 0x80 | (bits - 1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, flags, bg, 0)
    for i in range(size):
        out += palette[i] if i < n else b"\x00\x00\x00"
    min_code = max(2, bits)
    for f in frames:
        w = f.get("w", width)
        h = f.get("h", height)
        left = f.get("left", 0)
        top = f.get("top", 0)
        disposal = f.get("disposal", 0)
        transparent = f.get("transparent")
        packed = (disposal & 0x7) << 2
        tidx = 0
        if transparent is not None:
            packed |= 1
            tidx = transparent
        out += bytes([0x21, 0xF9, 4, packed, 0, 0, tidx, 0])
        out += struct.pack("<BHHHHB", 0x2C, left, top, w, h, 0)
        out.append(min_code)
        lzw = _lzw_encode(min_code, f["indices"])
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)

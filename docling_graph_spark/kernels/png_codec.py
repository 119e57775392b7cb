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

# Adam7 interlace pass grid: (x0, y0, dx, dy) per pass (PNG spec 8.2)
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _defilter(raw: bytes, height: int, stride: int, bpp: int) -> bytearray:
    """Undo PNG filters 0-4 over ``height`` scanlines of ``stride``
    bytes (each preceded by its filter byte); ``bpp`` is the filter
    unit in BYTES (1 for sub-8-bit depths, per the spec)."""
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
    return out


def _unpack_subbyte(row: bytes, n: int, depth: int) -> list:
    """Expand a packed sub-8-bit scanline to ``n`` integer samples
    (MSB-first packing per the spec)."""
    per = 8 // depth
    mask = (1 << depth) - 1
    out = []
    for i in range(n):
        b = row[i // per]
        shift = 8 - depth * (i % per + 1)
        out.append((b >> shift) & mask)
    return out


def decode_png(data: bytes) -> DecodedPng:
    """Parse + inflate + defilter a PNG payload.

    Supports bit depths 1/2/4/8 (sub-8-bit grayscale and palette — the
    icon/sprite formats — expand to one sample per output byte;
    grayscale scales by bit replication to 0..255, palette keeps raw
    indices like the 8-bit palette path), all five color types, and
    BOTH progressive variants: non-interlaced and Adam7 interlaced
    (each of the seven passes defiltered independently and scattered
    into the pixel grid).  16-bit depth decodes with the standard
    high-byte reduction to 8-bit output (``bit_depth`` still reports
    16).  Raises ``ValueError`` on malformed input (the caller routes
    those to the probe path / error column, never crashes the
    executor)."""
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = bit_depth = color_type = interlace = None
    idat = bytearray()
    exif_o = 1
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
        elif tag == b"eXIf":
            # PNG-3 Exif chunk: raw TIFF IFD; orientation applies to
            # the decoded pixels browser-style, like JPEG/WebP
            from .webp_codec import webp_exif_orientation

            exif_o = webp_exif_orientation(body)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"bad bit depth {bit_depth}")
    if interlace not in (0, 1):
        raise ValueError(f"bad interlace method {interlace}")
    if color_type not in _CHANNELS:
        raise ValueError(f"bad color type {color_type}")
    if bit_depth < 8 and color_type not in (0, 3):
        raise ValueError(
            f"bit depth {bit_depth} illegal for color type {color_type}")
    if bit_depth == 16 and color_type == 3:
        raise ValueError("16-bit palette is illegal")
    channels = _CHANNELS[color_type]
    if width * height > MAX_PIXELS:
        raise ValueError(
            f"PNG dimensions {width}x{height} exceed the {MAX_PIXELS}-"
            "pixel decode guard (decompression-bomb protection)")
    # grayscale sub-8-bit scales by bit replication (exactly
    # v * 255 / (2^d - 1)); palette keeps raw indices
    scale = (255 // ((1 << bit_depth) - 1)
             if (bit_depth < 8 and color_type == 0) else 1)

    passes = _ADAM7 if interlace else [(0, 0, 1, 1)]
    layout = []          # (x0, y0, dx, dy, wp, hp, stride)
    expected = 0
    for x0, y0, dx, dy in passes:
        wp = -(-(width - x0) // dx) if width > x0 else 0
        hp = -(-(height - y0) // dy) if height > y0 else 0
        if wp <= 0 or hp <= 0:
            continue
        stride = (-(-(wp * bit_depth) // 8) if bit_depth < 8
                  else wp * channels * (2 if bit_depth == 16 else 1))
        layout.append((x0, y0, dx, dy, wp, hp, stride))
        expected += hp * (stride + 1)

    # bounded inflate: a zlib bomb in IDAT must not expand past the
    # geometry-implied size no matter what it claims
    raw = zlib.decompressobj().decompress(bytes(idat), expected + 1)
    if len(raw) != expected:
        raise ValueError(
            f"inflated size {len(raw)}+ != expected {expected}"
        )

    bpp = (channels * 2 if bit_depth == 16
           else channels if bit_depth == 8 else 1)
    out = bytearray(width * height * channels)
    datapos = 0
    for x0, y0, dx, dy, wp, hp, stride in layout:
        block = raw[datapos:datapos + hp * (stride + 1)]
        datapos += hp * (stride + 1)
        rows = _defilter(block, hp, stride, bpp)
        for ry in range(hp):
            row = rows[ry * stride:(ry + 1) * stride]
            y = y0 + ry * dy
            if bit_depth < 8:
                vals = _unpack_subbyte(row, wp, bit_depth)
                for i in range(wp):
                    out[y * width + x0 + i * dx] = vals[i] * scale
            elif bit_depth == 16:
                # 16 -> 8 bit by high byte (the standard display
                # reduction; DecodedPng.bit_depth still reports 16)
                for i in range(wp):
                    x = x0 + i * dx
                    off = (y * width + x) * channels
                    for c in range(channels):
                        out[off + c] = row[(i * channels + c) * 2]
            else:
                for i in range(wp):
                    x = x0 + i * dx
                    off = (y * width + x) * channels
                    out[off:off + channels] = \
                        row[i * channels:(i + 1) * channels]
    if exif_o > 1:
        from .jpeg_codec import orient_pixels

        width, height, out = orient_pixels(width, height, channels,
                                           bytes(out), exif_o)
    return DecodedPng(width, height, bit_depth, color_type, channels,
                      bytes(out))


# ---------------------------------------------------------------------------
# extra fixture encoders (interlaced / sub-8-bit)
# ---------------------------------------------------------------------------


def _png_chunks(ihdr: bytes, raw: bytes, extra=()) -> bytes:
    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    out = PNG_SIGNATURE + chunk(b"IHDR", ihdr)
    for tag, body in extra:
        out += chunk(tag, body)
    return out + chunk(b"IDAT", zlib.compress(raw, 9)) + chunk(b"IEND",
                                                               b"")


def encode_png_gray_interlaced(width: int, height: int,
                               pixels: bytes) -> bytes:
    """Adam7-interlaced 8-bit grayscale fixture: the same pixels as
    :func:`encode_png_gray` laid out as the seven passes (filter-0
    rows), so decode of either encoding must be byte-identical."""
    assert len(pixels) == width * height
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        wp = -(-(width - x0) // dx) if width > x0 else 0
        hp = -(-(height - y0) // dy) if height > y0 else 0
        if wp <= 0 or hp <= 0:
            continue
        for ry in range(hp):
            y = y0 + ry * dy
            raw.append(0)
            raw.extend(pixels[y * width + x0 + i * dx]
                       for i in range(wp))
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 1)
    return _png_chunks(ihdr, bytes(raw))


def encode_png_subbyte(width: int, height: int, depth: int,
                       samples: list, color_type: int = 0,
                       palette: bytes = b"",
                       interlace: bool = False) -> bytes:
    """Sub-8-bit fixture (depth 1/2/4): grayscale (color type 0) or
    palette (3, with a PLTE chunk); MSB-first bit packing, filter-0
    rows, optionally Adam7 interlaced."""
    assert depth in (1, 2, 4)
    assert all(0 <= v < (1 << depth) for v in samples)
    per = 8 // depth

    def pack_row(vals: list) -> bytes:
        row = bytearray(-(-len(vals) * depth // 8))
        for i, v in enumerate(vals):
            row[i // per] |= v << (8 - depth * (i % per + 1))
        return bytes(row)

    raw = bytearray()
    passes = _ADAM7 if interlace else [(0, 0, 1, 1)]
    for x0, y0, dx, dy in passes:
        wp = -(-(width - x0) // dx) if width > x0 else 0
        hp = -(-(height - y0) // dy) if height > y0 else 0
        if wp <= 0 or hp <= 0:
            continue
        for ry in range(hp):
            y = y0 + ry * dy
            raw.append(0)
            raw.extend(pack_row([samples[y * width + x0 + i * dx]
                                 for i in range(wp)]))
    ihdr = struct.pack(">IIBBBBB", width, height, depth, color_type, 0,
                       0, 1 if interlace else 0)
    extra = [(b"PLTE", palette)] if color_type == 3 else []
    return _png_chunks(ihdr, bytes(raw), extra)


# ---------------------------------------------------------------------------
# APNG (round 5): acTL/fcTL/fdAT animation compose.  Each frame's data
# chunks form a complete zlib stream exactly like IDAT, so frames
# decode by synthesizing a one-frame PNG (IHDR with the frame's
# geometry + the parent's PLTE/tRNS) through decode_png, then compose
# with the spec's dispose_op (none / background / previous) and
# blend_op (source / over) — the same frame-selection API as
# gif_codec.decode_gif and the animated-WebP path.
# ---------------------------------------------------------------------------


class DecodedApng(NamedTuple):
    width: int
    height: int
    channels: int      # 3 (opaque) or 4
    pixels: bytes
    n_frames: int


def _samples_to_rgba(dec: DecodedPng, plte: bytes,
                     trns: bytes) -> bytes:
    """Expand a decoded frame's samples to RGBA."""
    out = bytearray()
    px = dec.pixels
    ct, ch = dec.color_type, dec.channels
    for i in range(dec.width * dec.height):
        if ct == 0:
            g = px[i]
            out += bytes((g, g, g, 255))
        elif ct == 2:
            out += px[3 * i:3 * i + 3] + b"\xff"
        elif ct == 3:
            k = px[i]
            rgb = plte[3 * k:3 * k + 3] or b"\x00\x00\x00"
            a = trns[k] if k < len(trns) else 255
            out += rgb + bytes((a,))
        elif ct == 4:
            g, a = px[2 * i:2 * i + 2]
            out += bytes((g, g, g, a))
        else:
            out += px[4 * i:4 * i + 4]
    return bytes(out)


def decode_apng(data: bytes, frame: int = 0,
                max_frames: int = 1024) -> DecodedApng:
    """Compose an APNG.  ``frame=0`` = first animation frame (the
    default image when its fcTL precedes IDAT, per spec), ``frame=-1``
    = final state, non-negative = that frame's composed canvas;
    ``n_frames`` reports the animation length.  A plain PNG (no acTL)
    decodes as a 1-frame animation.  ``max_frames`` bounds work like
    MAX_PIXELS-style guards elsewhere."""
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    ihdr = b""
    plte = b""
    trns = b""
    actl_frames = 0
    frames = []            # (fctl_body, bytearray(data))
    default_idat = bytearray()
    default_in_anim = False
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) < length:
            raise ValueError("truncated PNG chunk")
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"PLTE":
            plte = body
        elif tag == b"tRNS":
            trns = body
        elif tag == b"acTL":
            actl_frames = struct.unpack(">I", body[:4])[0]
        elif tag == b"fcTL":
            frames.append([body, bytearray()])
            if not default_idat:
                default_in_anim = True
        elif tag == b"IDAT":
            default_idat.extend(body)
            if default_in_anim and frames:
                frames[0][1].extend(body)
        elif tag == b"fdAT":
            if not frames:
                raise ValueError("fdAT before any fcTL")
            frames[-1][1].extend(body[4:])   # drop sequence number
        elif tag == b"IEND":
            break
    if not ihdr:
        raise ValueError("PNG missing IHDR")
    cw, ch_ = struct.unpack(">II", ihdr[:8])
    depth, ctype = ihdr[8], ihdr[9]
    if not frames or actl_frames == 0:
        dec = decode_png(data)
        rgba = _samples_to_rgba(dec, plte, trns)
        return _apng_result(cw, ch_, rgba, 1)
    if len(frames) > max_frames:
        raise ValueError(
            f"APNG declares {len(frames)} frames, beyond the "
            f"{max_frames}-frame decode guard")
    n_frames = len(frames)
    want = n_frames - 1 if frame == -1 else frame
    if not 0 <= want < n_frames:
        raise ValueError(f"frame {frame} out of range (0..{n_frames - 1})")

    canvas = bytearray(cw * ch_ * 4)     # transparent black
    extra = ([(b"PLTE", plte)] if plte else []) \
        + ([(b"tRNS", trns)] if trns else [])
    for fi in range(want + 1):
        fctl, fdata = frames[fi]
        fw, fh, fx, fy = struct.unpack(">IIII", fctl[4:20])
        dispose_op, blend_op = fctl[24], fctl[25]
        if fx + fw > cw or fy + fh > ch_:
            raise ValueError("APNG frame outside the canvas")
        sub_ihdr = struct.pack(">IIBBBBB", fw, fh, depth, ctype, 0, 0,
                               0)
        sub = _png_chunks(sub_ihdr, b"", extra)
        # splice the already-compressed frame stream in as IDAT
        sub = _splice_idat(sub, bytes(fdata))
        dec = decode_png(sub)
        rgba = _samples_to_rgba(dec, plte, trns)
        saved = None
        if fi < want and dispose_op == 2:          # previous
            saved = bytes(canvas)
        for r in range(fh):
            for c in range(fw):
                si = (r * fw + c) * 4
                sa = rgba[si + 3]
                di = ((fy + r) * cw + (fx + c)) * 4
                if blend_op == 1 and sa < 255:     # over
                    if sa == 0:
                        continue
                    da = canvas[di + 3]
                    ao = sa + da * (255 - sa) // 255
                    if ao == 0:
                        canvas[di:di + 4] = b"\x00\x00\x00\x00"
                        continue
                    for k in range(3):
                        canvas[di + k] = (rgba[si + k] * sa * 255
                                          + canvas[di + k] * da
                                          * (255 - sa)) // (ao * 255)
                    canvas[di + 3] = ao
                else:                              # source
                    canvas[di:di + 4] = rgba[si:si + 4]
        if fi < want:
            if dispose_op == 1:                    # background
                for r in range(fh):
                    di = ((fy + r) * cw + fx) * 4
                    canvas[di:di + 4 * fw] = bytes(4 * fw)
            elif dispose_op == 2 and saved is not None:
                canvas[:] = saved
    return _apng_result(cw, ch_, bytes(canvas), n_frames)


def _apng_result(w: int, h: int, rgba: bytes,
                 n_frames: int) -> DecodedApng:
    if all(rgba[i] == 255 for i in range(3, len(rgba), 4)):
        rgb = bytes(b for i in range(0, len(rgba), 4)
                    for b in rgba[i:i + 3])
        return DecodedApng(w, h, 3, rgb, n_frames)
    return DecodedApng(w, h, 4, rgba, n_frames)


def _splice_idat(png: bytes, idat: bytes) -> bytes:
    """Replace the IDAT payload of a synthesized PNG with an
    already-compressed stream (frame data chunks are IDAT-equivalent
    zlib streams per the APNG spec)."""
    pos = 8
    out = bytearray(png[:8])
    n = len(png)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", png[pos:pos + 4])
        tag = png[pos + 4:pos + 8]
        body = png[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IDAT":
            body = idat
        out += struct.pack(">I", len(body)) + tag + body \
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    return bytes(out)


def encode_apng(canvas_w: int, canvas_h: int, frames: list) -> bytes:
    """Fixture APNG (RGBA, 8-bit, filter-0).  Frame dicts: ``rgba``
    (+ ``w``/``h``), ``x``/``y`` offsets, ``dispose`` (0/1/2),
    ``blend`` (0 source / 1 over).  Frame 0 must cover the canvas
    (spec requirement); its fcTL precedes IDAT, so the default image
    participates in the animation."""
    assert frames and frames[0].get("x", 0) == 0 \
        and frames[0].get("y", 0) == 0 \
        and frames[0]["w"] == canvas_w and frames[0]["h"] == canvas_h

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)
                              & 0xFFFFFFFF))

    out = bytearray(PNG_SIGNATURE)
    out += chunk(b"IHDR", struct.pack(">IIBBBBB", canvas_w, canvas_h,
                                      8, 6, 0, 0, 0))
    out += chunk(b"acTL", struct.pack(">II", len(frames), 0))
    seq = 0
    for fi, f in enumerate(frames):
        fw, fh = f["w"], f["h"]
        fctl = struct.pack(">IIIIIHHBB", seq, fw, fh,
                           f.get("x", 0), f.get("y", 0), 1, 10,
                           f.get("dispose", 0), f.get("blend", 1))
        out += chunk(b"fcTL", fctl)
        seq += 1
        raw = b"".join(b"\x00" + f["rgba"][y * fw * 4:(y + 1) * fw * 4]
                       for y in range(fh))
        z = zlib.compress(raw, 9)
        if fi == 0:
            out += chunk(b"IDAT", z)
        else:
            out += chunk(b"fdAT", struct.pack(">I", seq) + z)
            seq += 1
    out += chunk(b"IEND", b"")
    return bytes(out)


def add_png_exif(png: bytes, orientation: int) -> bytes:
    """Fixture: insert a PNG-3 eXIf chunk (raw TIFF IFD, tag 274)
    before IEND."""
    import zlib as _z

    from .jpeg_codec import make_exif_app1

    body = make_exif_app1(orientation)[10:]    # strip APP1 + Exif\0\0
    crc = _z.crc32(b"eXIf" + body) & 0xFFFFFFFF
    chunk = struct.pack(">I", len(body)) + b"eXIf" + body \
        + struct.pack(">I", crc)
    idx = png.rfind(b"IEND")
    assert idx >= 8
    return png[:idx - 4] + chunk + png[idx - 4:]

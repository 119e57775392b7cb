"""Image header probing: real dimensions/channels from container metadata,
no full decode.

At crawl scale the common image question is not "give me pixels" but "how
big is it / what shape is it" — filtering thumbnails, tracker pixels and
banner junk before anything expensive runs.  Every mainstream container
answers that from its first few hundred bytes, with no codec library:

* PNG   — IHDR is the first chunk: width/height u32be at offset 16,
          bit depth + color type right after (RFC 2083 §4.1.1);
* JPEG  — walk the marker segments to the first SOF frame header
          (FFC0-FFCF minus C4/C8/CC), which carries height/width u16be
          and the component count (ITU T.81 §B.2.2);
* GIF   — logical screen descriptor: width/height u16le at offset 6
          (GIF89a spec §18);
* BMP   — BITMAPINFOHEADER: width/height i32le at offset 18/22
          (height may be negative = top-down);
* WEBP  — RIFF container, three frame flavors: VP8X (canvas u24le
          minus-one), lossless VP8L (14-bit packed minus-one), lossy VP8
          key frame (u16le & 0x3fff).

This complements `png_codec.py` (full decode, pixels) — the probe is the
cheap path a metadata/filter stage runs on EVERY image row; full decode
runs on the few rows that survive.  The reference has no binary-media
path (its VLM backend hands images to a model server, `vlm_backend.py`);
the probe is the deterministic, scale-shaped analogue.
"""

from __future__ import annotations

import struct
from typing import NamedTuple, Optional


class ImageHeader(NamedTuple):
    media_type: str
    width: int
    height: int
    channels: Optional[int]   # None when the container doesn't say


# JPEG start-of-frame markers: C0-CF except C4 (DHT), C8 (JPG ext), CC (DAC)
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def _probe_jpeg(b: bytes) -> Optional[ImageHeader]:
    i, n = 2, len(b)
    while i + 4 <= n:
        if b[i] != 0xFF:          # desynced (corrupt stream): give up
            return None
        marker = b[i + 1]
        if marker == 0xFF:        # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2                # standalone marker, no length field
            continue
        if i + 4 > n:
            return None
        seg_len = struct.unpack_from(">H", b, i + 2)[0]
        if seg_len < 2:
            return None
        if marker in _JPEG_SOF:
            # SOF payload: precision u8, height u16, width u16, ncomp u8
            if i + 9 > n:
                return None
            h, w = struct.unpack_from(">HH", b, i + 5)
            ncomp = b[i + 9] if i + 9 < n else None
            if w == 0 or h == 0:
                return None
            return ImageHeader("image/jpeg", w, h, ncomp)
        if marker == 0xDA:        # start of scan: SOF must precede it
            return None
        i += 2 + seg_len
    return None


def _probe_png(b: bytes) -> Optional[ImageHeader]:
    if len(b) < 26 or b[12:16] != b"IHDR":
        return None
    w, h = struct.unpack_from(">II", b, 16)
    color_type = b[25]
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if w == 0 or h == 0:
        return None
    return ImageHeader("image/png", w, h, channels)


def _probe_gif(b: bytes) -> Optional[ImageHeader]:
    if len(b) < 10:
        return None
    w, h = struct.unpack_from("<HH", b, 6)
    if w == 0 or h == 0:
        return None
    return ImageHeader("image/gif", w, h, None)


def _probe_bmp(b: bytes) -> Optional[ImageHeader]:
    if len(b) < 30:
        return None
    hdr_size = struct.unpack_from("<I", b, 14)[0]
    # 'BM' is only 2 bytes of magic, so validate the DIB header shape:
    # known header size, planes == 1, a real bits-per-pixel value
    if hdr_size in (40, 52, 56, 64, 108, 124):
        w, h = struct.unpack_from("<ii", b, 18)
        h = abs(h)                # negative = top-down row order
        planes, bpp = struct.unpack_from("<HH", b, 26)
    elif hdr_size == 12:          # ancient BITMAPCOREHEADER
        w, h = struct.unpack_from("<HH", b, 18)
        planes, bpp = struct.unpack_from("<HH", b, 22)
    else:
        return None
    if planes != 1 or bpp not in (1, 4, 8, 16, 24, 32):
        return None
    if not (0 < w <= 1 << 20 and 0 < h <= 1 << 20):
        return None
    return ImageHeader("image/bmp", w, h, None)


def _probe_webp(b: bytes) -> Optional[ImageHeader]:
    if len(b) < 30 or b[8:12] != b"WEBP":
        return None
    fourcc = b[12:16]
    if fourcc == b"VP8X":         # extended: canvas size u24le minus-one
        w = int.from_bytes(b[24:27], "little") + 1
        h = int.from_bytes(b[27:30], "little") + 1
        return ImageHeader("image/webp", w, h, None)
    if fourcc == b"VP8L":         # lossless: 14+14 bits packed minus-one
        if b[20] != 0x2F:
            return None
        bits = int.from_bytes(b[21:25], "little")
        w = (bits & 0x3FFF) + 1
        h = ((bits >> 14) & 0x3FFF) + 1
        return ImageHeader("image/webp", w, h, None)
    if fourcc == b"VP8 ":         # lossy: key-frame dims at +26
        w = struct.unpack_from("<H", b, 26)[0] & 0x3FFF
        h = struct.unpack_from("<H", b, 28)[0] & 0x3FFF
        if w == 0 or h == 0:
            return None
        return ImageHeader("image/webp", w, h, 3)
    return None


def probe_dimensions(payload: Optional[bytes]) -> Optional[ImageHeader]:
    """Container-header image dimensions, or None when the payload isn't a
    recognized image (or is too truncated to carry its own header)."""
    if not payload or len(payload) < 10:
        return None
    b = payload
    if b[:3] == b"\xff\xd8\xff":
        return _probe_jpeg(b)
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return _probe_png(b)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return _probe_gif(b)
    if b[:2] == b"BM":
        return _probe_bmp(b)
    if b[:4] == b"RIFF":
        return _probe_webp(b)
    return None


# ------------------------------------------------- test-fixture encoders
# Minimal valid headers for each container, used by unit tests and the
# catalog query's synthetic corpus (deterministic: same args, same bytes).

def make_jpeg_header(width: int, height: int, channels: int = 3) -> bytes:
    """SOI + JFIF APP0 + SOF0 + EOI — a structurally-valid JPEG prefix
    (no entropy data; the probe never reads past SOF)."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01" + \
        b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    comps = b"".join(
        bytes([cid + 1, 0x11, 0]) for cid in range(channels)
    )
    sof_len = 8 + 3 * channels
    sof = b"\xff\xc0" + struct.pack(">HBHHB", sof_len, 8, height, width,
                                    channels) + comps
    return b"\xff\xd8" + app0 + sof + b"\xff\xd9"


def make_gif_header(width: int, height: int) -> bytes:
    return (b"GIF89a" + struct.pack("<HH", width, height)
            + b"\x00\x00\x00" + b"\x3b")


def make_bmp_header(width: int, height: int) -> bytes:
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       0, 2835, 2835, 0, 0)
    file_hdr = b"BM" + struct.pack("<IHHI", 14 + 40, 0, 0, 14 + 40)
    return file_hdr + info


def make_webp_vp8x_header(width: int, height: int) -> bytes:
    payload = (b"\x00\x00\x00\x00"
               + (width - 1).to_bytes(3, "little")
               + (height - 1).to_bytes(3, "little"))
    chunk = b"VP8X" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk

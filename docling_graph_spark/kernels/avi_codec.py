"""AVI (RIFF) container walk + Motion-JPEG first-frame decode.

Video rows on a crawl are mostly opaque (H.264/VP9 need codec
libraries this container doesn't ship), but the classic Motion-JPEG
AVI — every frame an independent baseline JPEG — is fully decodable
with the in-repo JPEG codec, the same way JPEG-in-TIFF rides it.  This
module walks the RIFF structure (hdrl/avih geometry, strl stream
headers, movi data chunks, the '##dc'/'##db' stream-numbered ids) and
decodes the FIRST video frame of an MJPG stream to pixels, mirroring
how GIF/animated-WebP/APNG rows surface frame 0 through
`media_decode_stats`.  Non-MJPEG streams raise NotImplementedError
with the fourcc named, so the operator falls back to the header-only
geometry probe (`media_probe._probe_avi`) — a routed column, never a
crash.

The reference treats video inputs as out-of-scope binaries
(`core/input/types.py:39-105` stops at magic-byte detection); here the
container-feasible subset decodes for real.

The encoder half is the fixture generator: a structurally complete AVI
(hdrl with avih + one strl, movi with per-frame chunks, idx1 index)
wrapped around caller-supplied JPEG streams, so the decode invariant
is exact: decode_avi(...).pixels == decode_jpeg(first frame).pixels.
"""

from __future__ import annotations

import struct
from typing import List, NamedTuple, Optional, Tuple

MAX_PIXELS = 1 << 26


class DecodedAviFrame(NamedTuple):
    width: int
    height: int
    channels: int
    pixels: bytes        # first video frame, interleaved row-major
    n_frames: int        # video chunks present in movi
    codec: str           # fourcc of the video stream


def _chunks(b: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_end) over a RIFF chunk run,
    honoring the odd-size pad byte."""
    while pos + 8 <= end:
        cid = b[pos:pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        body = pos + 8
        if body + size > end:
            return
        yield cid, body, body + size
        pos = body + size + (size & 1)


def decode_avi(payload: bytes,
               max_pixels: int = MAX_PIXELS,
               frame: int = 0) -> DecodedAviFrame:
    """Decode one video frame of a Motion-JPEG AVI (``frame=-1`` for
    the last), mirroring the GIF/TIFF frame/page-selection API;
    ``n_frames`` always reports the chunk count."""
    b = payload
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    (riff_size,) = struct.unpack_from("<I", b, 4)
    end = min(len(b), 8 + riff_size)

    width = height = 0
    vid_stream: Optional[int] = None
    codec = ""
    stream_idx = -1
    movi: Optional[Tuple[int, int]] = None

    for cid, s, e in _chunks(b, 12, end):
        if cid != b"LIST" or e - s < 4:
            continue
        ltype = b[s:s + 4]
        if ltype == b"hdrl":
            for cid2, s2, e2 in _chunks(b, s + 4, e):
                if cid2 == b"avih" and e2 - s2 >= 40:
                    width, height = struct.unpack_from("<II", b, s2 + 32)
                elif cid2 == b"LIST" and b[s2:s2 + 4] == b"strl":
                    stream_idx += 1
                    for cid3, s3, e3 in _chunks(b, s2 + 4, e2):
                        if cid3 == b"strh" and e3 - s3 >= 8 \
                                and b[s3:s3 + 4] == b"vids" \
                                and vid_stream is None:
                            vid_stream = stream_idx
                            codec = b[s3 + 4:s3 + 8].decode(
                                "ascii", "replace").strip("\x00 ")
                        elif cid3 == b"strf" and e3 - s3 >= 20 \
                                and vid_stream == stream_idx:
                            # BITMAPINFOHEADER biCompression refines
                            # (strh handler may be blank in real files)
                            cc = b[s3 + 16:s3 + 20]
                            if cc.strip(b"\x00 "):
                                codec = cc.decode("ascii",
                                                  "replace").strip("\x00 ")
        elif ltype == b"movi":
            movi = (s + 4, e)

    if vid_stream is None:
        raise ValueError("AVI has no video stream")
    if width <= 0 or height <= 0:
        raise ValueError("AVI header missing frame geometry")
    if width * height > max_pixels:
        raise ValueError(
            f"AVI dimensions {width}x{height} exceed the {max_pixels}"
            "-pixel decode guard (decompression-bomb protection)")
    if movi is None:
        raise ValueError("AVI has no movi data")

    want = {b"%02ddc" % vid_stream, b"%02ddb" % vid_stream}
    frames_found: List[Tuple[int, int]] = []

    def scan(pos: int, stop: int) -> None:
        for cid, s, e in _chunks(b, pos, stop):
            if cid == b"LIST" and b[s:s + 4] == b"rec ":
                scan(s + 4, e)        # interleave grouping wrapper
            elif cid in want and e > s:
                frames_found.append((s, e))

    scan(*movi)
    n_frames = len(frames_found)
    if not frames_found:
        raise ValueError("AVI movi carries no video frames")
    idx = frame if frame >= 0 else n_frames + frame
    if not 0 <= idx < n_frames:
        raise ValueError(f"AVI frame {frame} out of range "
                         f"(stream has {n_frames})")
    fs, fe = frames_found[idx]
    first = b[fs:fe]

    if codec.upper() not in ("MJPG", "MJPEG"):
        raise NotImplementedError(
            f"AVI video codec '{codec or '?'}' requires libraries not "
            "present in this container (only Motion-JPEG decodes)")
    from .jpeg_codec import decode_jpeg

    dec = decode_jpeg(first)
    return DecodedAviFrame(dec.width, dec.height, dec.channels,
                           dec.pixels, n_frames, codec)


# ------------------------------------------------------------- encoder

def _ck(cid: bytes, body: bytes) -> bytes:
    return cid + struct.pack("<I", len(body)) + body \
        + (b"\x00" if len(body) & 1 else b"")


def _list(ltype: bytes, body: bytes) -> bytes:
    return _ck(b"LIST", ltype + body)


def encode_avi_mjpeg(width: int, height: int, frames: List[bytes],
                     fps: int = 25, codec: bytes = b"MJPG") -> bytes:
    """Fixture Motion-JPEG AVI: ``frames`` are complete JPEG streams
    (from `jpeg_codec.encode_jpeg_*`); emits hdrl (avih + one vids
    strl with BITMAPINFOHEADER), movi with one '00dc' chunk per frame,
    and the idx1 index real muxers append."""
    assert frames, "at least one frame required"
    n = len(frames)
    avih = struct.pack("<IIIIIIIIII", 10 ** 6 // fps, 0, 0, 0x10, n,
                       0, 1, 0, width, height) + bytes(16)
    strh = (b"vids" + codec
            + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n,
                          0, 0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, width, height))
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24,
                       b"MJPG", width * height * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _ck(b"avih", avih)
                 + _list(b"strl", _ck(b"strh", strh)
                         + _ck(b"strf", strf)))
    movi_body = b"".join(_ck(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_body)
    # idx1: one entry per chunk, offsets relative to the movi list type
    idx = bytearray()
    off = 4
    for f in frames:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) & 1)
    body = b"AVI " + hdrl + movi + _ck(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body

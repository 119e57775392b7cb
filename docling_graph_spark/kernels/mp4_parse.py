"""ISO BMFF (MP4) sample-table walk: timed text + Motion-JPEG frames.

MP4 is the web's other video container, and its 3GPP timed-text
(``tx3g``, also written by muxers as ``text`` / QuickTime ``'text'``)
track carries caption cues as plain length-prefixed UTF-8 samples in
``mdat`` — corpus text reachable with a pure box walk and no codec,
the same way `webm_codec.webm_subtitle_text` reads Matroska
``S_TEXT/*`` tracks.  This module resolves the sample table
(``stsd`` format, ``stsz`` sizes, ``stsc`` sample-to-chunk runs,
``stco``/``co64`` chunk offsets) for every subtitle-handler track
(``sbtl`` / ``text`` / ``subt``) and decodes each sample's
``uint16 length + UTF-8`` payload into cue-per-paragraph text.

The same sample-table resolution drives :func:`decode_mp4`: a video
track whose stsd entry is ``jpeg`` (QuickTime/MP4 Motion-JPEG — every
sample a complete baseline JPEG) decodes a selected frame through the
real JPEG decoder, mirroring the AVI/WebM frame APIs; AVC/HEVC/VP9/
AV1 route by name to the header-only geometry probe.

The reference treats video inputs as out-of-scope binaries
(`core/input/types.py:39-105` stops at magic-byte detection); the
container-feasible text and frame subsets extract for real here.

Bounds: the walk is O(boxes) over a byte-capped prefix; per-track
sample counts and total text size are capped so a hostile sample
table cannot balloon memory — malformed structures degrade to
partial/empty text, never an exception (advisory text, not
decode-critical state).
"""

from __future__ import annotations

import struct
from typing import List, NamedTuple, Optional, Tuple

MAX_MDAT_TEXT = 1 << 22      # total cue bytes kept per payload
MAX_SAMPLES = 65536          # per-track sample-count cap

_SUB_HANDLERS = (b"sbtl", b"text", b"subt")
_SUB_FORMATS = (b"tx3g", b"text", b"stpp")


def _boxes(b: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_end) over an ISO BMFF box run
    (32-bit sizes; size 0 = to-end; 64-bit largesize honored)."""
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", b, pos)
        cc = b[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                return
            (size,) = struct.unpack_from(">Q", b, pos + 8)
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            return
        yield cc, body, pos + size
        pos += size


def _find(b: bytes, pos: int, end: int, path: Tuple[bytes, ...]):
    """Body range of the first box at a nested path, or None."""
    for cc, s, e in _boxes(b, pos, end):
        if cc == path[0]:
            if len(path) == 1:
                return s, e
            return _find(b, s, e, path[1:])
    return None


def _sample_offsets(b: bytes, stbl_s: int, stbl_e: int) -> List[Tuple[int, int]]:
    """(absolute_offset, size) per sample from stsz + stsc + stco/co64
    — samples are consecutive within a chunk, chunk runs come from the
    stsc first_chunk table (1-based, closed by the next entry)."""
    sizes: List[int] = []
    chunk_offsets: List[int] = []
    stsc: List[Tuple[int, int]] = []     # (first_chunk, samples_per)
    for cc, s, e in _boxes(b, stbl_s, stbl_e):
        if cc == b"stsz" and e - s >= 12:
            fixed, count = struct.unpack_from(">II", b, s + 4)
            count = min(count, MAX_SAMPLES)
            if fixed:
                sizes = [fixed] * count
            else:
                if s + 12 + 4 * count > e:
                    count = max(0, (e - s - 12) // 4)
                sizes = list(struct.unpack_from(f">{count}I", b, s + 12))
        elif cc == b"stco" and e - s >= 8:
            (count,) = struct.unpack_from(">I", b, s + 4)
            count = min(count, MAX_SAMPLES, max(0, (e - s - 8) // 4))
            chunk_offsets = list(
                struct.unpack_from(f">{count}I", b, s + 8))
        elif cc == b"co64" and e - s >= 8:
            (count,) = struct.unpack_from(">I", b, s + 4)
            count = min(count, MAX_SAMPLES, max(0, (e - s - 8) // 8))
            chunk_offsets = list(
                struct.unpack_from(f">{count}Q", b, s + 8))
        elif cc == b"stsc" and e - s >= 8:
            (count,) = struct.unpack_from(">I", b, s + 4)
            count = min(count, MAX_SAMPLES, max(0, (e - s - 8) // 12))
            for k in range(count):
                first, per, _desc = struct.unpack_from(
                    ">III", b, s + 8 + 12 * k)
                stsc.append((first, per))
    if not sizes or not chunk_offsets:
        return []
    if not stsc:
        stsc = [(1, 1)]
    out: List[Tuple[int, int]] = []
    si = 0
    for ci, coff in enumerate(chunk_offsets, start=1):
        per = 1
        for first, p in stsc:
            if first <= ci:
                per = p
            else:
                break
        off = coff
        for _ in range(per):
            if si >= len(sizes):
                return out
            out.append((off, sizes[si]))
            off += sizes[si]
            si += 1
    return out


def mp4_subtitle_text(payload: bytes) -> str:
    """Cue text of every MP4 subtitle track, cue-per-paragraph: tx3g /
    QuickTime text samples are ``uint16 length + UTF-8`` (a UTF-16 BOM
    switches the encoding per spec); trailing style atoms inside the
    sample are ignored by the length prefix.  Empty cues (the gaps
    real muxers emit between captions) are skipped."""
    b = payload
    out: List[str] = []
    budget = MAX_MDAT_TEXT
    for cc, s, e in _boxes(b, 0, len(b)):
        if cc != b"moov":
            continue
        for cc2, s2, e2 in _boxes(b, s, e):
            if cc2 != b"trak":
                continue
            mdia = _find(b, s2, e2, (b"mdia",))
            if mdia is None:
                continue
            hdlr = _find(b, mdia[0], mdia[1], (b"hdlr",))
            if hdlr is None \
                    or b[hdlr[0] + 8:hdlr[0] + 12] not in _SUB_HANDLERS:
                continue
            stbl = _find(b, mdia[0], mdia[1],
                         (b"minf", b"stbl"))
            if stbl is None:
                continue
            stsd = _find(b, stbl[0], stbl[1], (b"stsd",))
            fmt = None
            if stsd is not None:
                for cc3, _s3, _e3 in _boxes(b, stsd[0] + 8, stsd[1]):
                    fmt = cc3
                    break
                if fmt is not None and fmt not in _SUB_FORMATS:
                    continue
            for off, size in _sample_offsets(b, *stbl):
                if size < 2 or off + size > len(b) or budget <= 0:
                    continue
                if fmt == b"stpp":
                    # TTML: the sample IS an XML document — strip the
                    # markup, keep the cue text
                    import re

                    raw = b[off:off + min(size, budget)]
                    budget -= len(raw)
                    text = re.sub(
                        r"<[^>]*>", " ",
                        raw.decode("utf-8", "replace"))
                    text = " ".join(text.split()).strip()
                else:
                    # tx3g / QuickTime text: uint16 length + UTF-8
                    # (UTF-16 BOM switches encoding per spec)
                    (ln,) = struct.unpack_from(">H", b, off)
                    raw = b[off + 2:off + 2 + min(ln, size - 2, budget)]
                    budget -= len(raw)
                    if raw[:2] in (b"\xfe\xff", b"\xff\xfe"):
                        text = raw.decode("utf-16", "replace")
                    else:
                        text = raw.decode("utf-8", "replace")
                    text = text.strip()
                if text:
                    out.append(text)
    return "\n\n".join(out)


# ------------------------------------------------------------- fixture

def _box(cc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + cc + body


def make_mp4_tx3g(cues: List[str],
                  video: "Optional[Tuple[int, int]]" = None,
                  per_chunk: int = 1,
                  fmt: bytes = b"tx3g") -> bytes:
    """Fixture: ftyp + mdat (length-prefixed cue samples) + moov with a
    tx3g subtitle track whose full sample table (stsd/stts/stsc/stsz/
    stco) addresses them; ``per_chunk`` > 1 exercises the stsc
    sample-to-chunk run resolution, ``video`` adds a tkhd-only video
    trak so geometry probing keeps working on the same payload."""
    if fmt == b"stpp":
        samples = [(f'<?xml version="1.0"?><tt><body><div><p>{c}'
                    f"</p></div></body></tt>").encode("utf-8")
                   for c in cues]
    else:
        samples = [struct.pack(">H", len(c.encode("utf-8")))
                   + c.encode("utf-8") for c in cues]
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + b"\x00\x00\x02\x00"
    mdat_body = b"".join(samples)
    mdat_start = len(ftyp) + 8
    mdat = _box(b"mdat", mdat_body)

    sizes = [len(s) for s in samples]
    offsets: List[int] = []
    pos = mdat_start
    for i, s in enumerate(samples):
        if i % per_chunk == 0:
            offsets.append(pos)
        pos += len(s)

    stsd = _box(b"stsd", bytes(4) + struct.pack(">I", 1)
                + _box(fmt, bytes(6) + struct.pack(">H", 1)
                       + bytes(26)))
    stts = _box(b"stts", bytes(4) + struct.pack(">I", 1)
                + struct.pack(">II", len(samples), 1000))
    stsc = _box(b"stsc", bytes(4) + struct.pack(">I", 1)
                + struct.pack(">III", 1, per_chunk, 1))
    stsz = _box(b"stsz", bytes(4) + struct.pack(">II", 0, len(sizes))
                + b"".join(struct.pack(">I", sz) for sz in sizes))
    stco = _box(b"stco", bytes(4) + struct.pack(">I", len(offsets))
                + b"".join(struct.pack(">I", o) for o in offsets))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", stbl)
    hdlr = _box(b"hdlr", bytes(8) + b"sbtl" + bytes(14))
    mdia = _box(b"mdia", hdlr + minf)
    trak = _box(b"trak", mdia)
    moov_body = trak
    if video is not None:
        w, h = video
        tkhd_payload = bytes(4) + bytes(4 * 5) + bytes(8) \
            + bytes(2 * 4) + bytes(36) \
            + struct.pack(">II", w << 16, h << 16)
        moov_body = _box(b"trak", _box(b"tkhd", tkhd_payload)) \
            + moov_body
    moov = _box(b"moov", moov_body)
    return ftyp + mdat + moov


# ------------------------------------------------------- video frames

MAX_PIXELS = 1 << 26     # shared decode guard with the other codecs

_JPEG_FORMATS = (b"jpeg", b"mjpa")   # MJPEG sample entries (full JPEGs)


class DecodedMp4Frame(NamedTuple):
    width: int
    height: int
    channels: int
    pixels: bytes        # selected video frame
    n_frames: int        # samples on the video track
    codec: str           # stsd sample-entry fourcc, e.g. 'jpeg'


def decode_mp4(payload: bytes, max_pixels: int = MAX_PIXELS,
               frame: int = 0) -> DecodedMp4Frame:
    """Decode one video frame of an MJPEG MP4 (stsd sample entry
    ``jpeg`` — every sample a complete baseline JPEG, the QuickTime/
    MP4 Motion-JPEG layout), mirroring the GIF/TIFF/AVI/WebM
    frame-selection API; AVC/HEVC/VP9/AV1 tracks raise
    NotImplementedError with the codec named so the operator falls
    back to the header-only geometry probe."""
    b = payload
    for cc, s, e in _boxes(b, 0, len(b)):
        if cc != b"moov":
            continue
        for cc2, s2, e2 in _boxes(b, s, e):
            if cc2 != b"trak":
                continue
            mdia = _find(b, s2, e2, (b"mdia",))
            if mdia is None:
                continue
            hdlr = _find(b, mdia[0], mdia[1], (b"hdlr",))
            if hdlr is None \
                    or b[hdlr[0] + 8:hdlr[0] + 12] != b"vide":
                continue
            stbl = _find(b, mdia[0], mdia[1], (b"minf", b"stbl"))
            if stbl is None:
                continue
            stsd = _find(b, stbl[0], stbl[1], (b"stsd",))
            fmt = b""
            width = height = 0
            cfg = {}
            if stsd is not None:
                for cc3, s3, e3 in _boxes(b, stsd[0] + 8, stsd[1]):
                    fmt = cc3
                    # VisualSampleEntry: width/height at body +24/+26,
                    # codec config boxes (av1C/hvcC/avcC) as children
                    # after the 78-byte fixed part
                    if e3 - s3 >= 28:
                        width, height = struct.unpack_from(
                            ">HH", b, s3 + 24)
                    for cc4, s4, e4 in _boxes(b, s3 + 78, e3):
                        cfg[cc4] = b[s4:e4]
                    break
            if width * height > max_pixels:
                raise ValueError(
                    f"MP4 dimensions {width}x{height} exceed the "
                    f"{max_pixels}-pixel decode guard "
                    "(decompression-bomb protection)")
            samples = _sample_offsets(b, *stbl)
            n_frames = len(samples)
            if not samples:
                raise ValueError("MP4 video track has no samples")
            idx = frame if frame >= 0 else n_frames + frame
            if not 0 <= idx < n_frames:
                raise ValueError(
                    f"MP4 frame {frame} out of range "
                    f"(track has {n_frames})")
            off, size = samples[idx]
            if off + size > len(b):
                raise ValueError("MP4 sample outside the file")
            sample = b[off:off + size]
            if fmt in _JPEG_FORMATS:
                from .jpeg_codec import decode_jpeg

                dec = decode_jpeg(sample)
            elif fmt == b"av01" and b"av1C" in cfg:
                # AV1 still: bridge through the gated libheif path
                from .heif_native import decode_av1_obus

                dec = decode_av1_obus(sample, width, height,
                                      cfg[b"av1C"],
                                      max_pixels=max_pixels)
            elif fmt in (b"hvc1", b"hev1") and b"hvcC" in cfg:
                # HEVC IDR sample: same bridge, HEIC wrapper
                from .heif_native import decode_hevc_sample

                dec = decode_hevc_sample(sample, width, height,
                                         cfg[b"hvcC"],
                                         max_pixels=max_pixels)
            else:
                raise NotImplementedError(
                    f"MP4 video codec '{fmt.decode('latin-1')}' "
                    "requires libraries not present in this "
                    "container (Motion-JPEG decodes natively; AV1/"
                    "HEVC key frames decode via the gated libheif "
                    "bridge when their config boxes are present)")
            return DecodedMp4Frame(dec.width, dec.height,
                                   dec.channels, dec.pixels,
                                   n_frames,
                                   fmt.decode("latin-1"))
    raise ValueError("MP4 has no video track")


def make_mp4_mjpeg(width: int, height: int,
                   frames: List[bytes],
                   per_chunk: int = 1,
                   fmt: bytes = b"jpeg",
                   config: "Optional[Tuple[bytes, bytes]]" = None) -> bytes:
    """Fixture MJPEG MP4: ftyp + mdat of complete JPEG samples + moov
    with a 'vide' track whose stsd 'jpeg' VisualSampleEntry carries
    the geometry and whose sample table addresses the frames.  Decode
    invariant: decode_mp4(..., frame=k).pixels ==
    decode_jpeg(frames[k]).pixels."""
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + b"\x00\x00\x02\x00"
    mdat_start = len(ftyp) + 8
    mdat = _box(b"mdat", b"".join(frames))

    sizes = [len(f) for f in frames]
    offsets: List[int] = []
    pos = mdat_start
    for i, f in enumerate(frames):
        if i % per_chunk == 0:
            offsets.append(pos)
        pos += len(f)

    entry = _box(fmt, bytes(6) + struct.pack(">H", 1)
                 + bytes(16) + struct.pack(">HH", width, height)
                 + struct.pack(">II", 0x00480000, 0x00480000)
                 + bytes(4) + struct.pack(">H", 1) + bytes(32)
                 + struct.pack(">Hh", 24, -1)
                 + (_box(*config) if config else b""))
    stsd = _box(b"stsd", bytes(4) + struct.pack(">I", 1) + entry)
    stts = _box(b"stts", bytes(4) + struct.pack(">I", 1)
                + struct.pack(">II", len(frames), 1000))
    stsc = _box(b"stsc", bytes(4) + struct.pack(">I", 1)
                + struct.pack(">III", 1, per_chunk, 1))
    stsz = _box(b"stsz", bytes(4) + struct.pack(">II", 0, len(sizes))
                + b"".join(struct.pack(">I", sz) for sz in sizes))
    stco = _box(b"stco", bytes(4) + struct.pack(">I", len(offsets))
                + b"".join(struct.pack(">I", o) for o in offsets))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    hdlr = _box(b"hdlr", bytes(8) + b"vide" + bytes(14))
    mdia = _box(b"mdia", hdlr + _box(b"minf", stbl))
    tkhd_payload = bytes(4) + bytes(4 * 5) + bytes(8) + bytes(2 * 4) \
        + bytes(36) + struct.pack(">II", width << 16, height << 16)
    trak = _box(b"trak", _box(b"tkhd", tkhd_payload) + mdia)
    return ftyp + mdat + _box(b"moov", trak)

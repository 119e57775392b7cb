"""Audio text-tag extraction — ID3v2, Vorbis comments, RIFF INFO.

A training-data pipeline wants the TEXT riding inside media payloads
(titles, artists, descriptions) even when the audio itself only needs
statistics: tags are document text for indexing/dedup purposes.  This
module parses the three tag families that cover nearly all crawled
audio:

* ID3v2 (2.2 / 2.3 / 2.4) prepended to MP3 streams — text frames with
  all four spec encodings (latin-1, UTF-16 ± BOM, UTF-8), syncsafe
  sizes where the version says so;
* Vorbis comments — the ``KEY=value`` UTF-8 list carried in Ogg Vorbis
  packet 2 (``\\x03vorbis``) and byte-identically in FLAC's
  VORBIS_COMMENT metadata block (type 4);
* RIFF ``LIST INFO`` chunks in WAV files (INAM/IART/... zero-padded
  latin-1 strings);
* the 128-byte ID3v1 trailer as a fallback when no v2 tag leads;
* image-borne text: PNG tEXt/zTXt/iTXt chunks (keyword-mapped,
  bounded inflate for the compressed forms) and GIF comment
  extensions (full block walk, image data skipped sub-block-wise
  without LZW decode);
* EXIF provenance strings (Make/Model/DateTime from IFD0) out of
  JPEG APP1, bare TIFF, WebP EXIF and PNG eXIf containers;
* PDF documents dispatch to the trailer /Info metadata reader
  (`kernels/pdf_parse.extract_pdf_metadata`).

Everything returns a plain ``{normalized_key: text}`` dict with the
common fields mapped to title/artist/album/date/comment; unknown
frames/keys pass through under their native name.  Parsers are
bounded (tag sizes capped, malformed frames skipped) — a hostile
payload yields an empty or partial dict, never an exception, because
tag text is advisory metadata, not decode-critical state.

The reference stops at magic-byte typing for binary inputs
(`core/input/types.py:39-105`); this is part of the container-feasible
extension the multimodal column gets here.
"""

from __future__ import annotations

import struct
from typing import Dict, Optional

MAX_TAG_BYTES = 1 << 22       # 4 MiB: generous for any sane tag block

_ID3_MAP = {
    "TIT2": "title", "TT2": "title",
    "TPE1": "artist", "TP1": "artist",
    "TALB": "album", "TAL": "album",
    "TDRC": "date", "TYER": "date", "TYE": "date",
    "COMM": "comment", "COM": "comment",
    "USLT": "lyrics", "ULT": "lyrics",
}

_VORBIS_MAP = {
    "title": "title", "artist": "artist", "album": "album",
    "date": "date", "description": "comment", "comment": "comment",
}

_RIFF_MAP = {
    b"INAM": "title", b"IART": "artist", b"IPRD": "album",
    b"ICRD": "date", b"ICMT": "comment",
}


def _syncsafe(b: bytes) -> int:
    return ((b[0] & 0x7F) << 21) | ((b[1] & 0x7F) << 14) \
        | ((b[2] & 0x7F) << 7) | (b[3] & 0x7F)


def _id3_text(enc: int, data: bytes) -> Optional[str]:
    try:
        if enc == 0:
            s = data.decode("latin-1")
        elif enc == 1:
            s = data.decode("utf-16")      # BOM-driven
        elif enc == 2:
            s = data.decode("utf-16-be")
        elif enc == 3:
            s = data.decode("utf-8")
        else:
            return None
    except (UnicodeDecodeError, LookupError):
        return None
    return s.split("\x00")[0].strip() or None


def read_id3v2(payload: bytes) -> Dict[str, str]:
    """Text frames of a leading ID3v2 tag (empty dict if none)."""
    b = payload
    if b[:3] != b"ID3" or len(b) < 10:
        return {}
    ver = b[3]
    if ver not in (2, 3, 4):
        return {}
    flags = b[5]
    size = _syncsafe(b[6:10])
    end = min(10 + size, len(b), MAX_TAG_BYTES)
    pos = 10
    if flags & 0x40 and ver in (3, 4):     # extended header: skip
        if pos + 4 > end:
            return {}
        ehs = (_syncsafe(b[pos:pos + 4]) if ver == 4
               else struct.unpack_from(">I", b, pos)[0] + 4)
        pos += ehs
    out: Dict[str, str] = {}
    id_len = 3 if ver == 2 else 4
    while pos + id_len + (3 if ver == 2 else 6) <= end:
        fid = b[pos:pos + id_len]
        if fid.strip(b"\x00") == b"":
            break                          # padding reached
        if ver == 2:
            fsize = int.from_bytes(b[pos + 3:pos + 6], "big")
            body_at = pos + 6
        else:
            raw = b[pos + 4:pos + 8]
            fsize = _syncsafe(raw) if ver == 4 \
                else struct.unpack(">I", raw)[0]
            body_at = pos + 10             # 2 flag bytes skipped
        if fsize <= 0 or body_at + fsize > end:
            break
        body = b[body_at:body_at + fsize]
        try:
            name = fid.decode("ascii")
        except UnicodeDecodeError:
            name = ""
        if name and body:
            if name.startswith("T"):
                txt = _id3_text(body[0], body[1:])
                if txt:
                    out[_ID3_MAP.get(name, name)] = txt
            elif name in ("COMM", "COM", "USLT", "ULT") \
                    and len(body) >= 5:
                # enc(1) + lang(3) + short-desc\x00 + text — USLT
                # (full lyrics, real corpus text) shares COMM's layout
                enc, rest = body[0], body[4:]
                sep = b"\x00\x00" if enc in (1, 2) else b"\x00"
                idx = rest.find(sep)
                if idx >= 0:
                    txt = _id3_text(enc, rest[idx + len(sep):])
                    if txt:
                        out[_ID3_MAP[name]] = txt
        pos = body_at + fsize
    return out


def _parse_vorbis_comment_body(b: bytes, pos: int) -> Dict[str, str]:
    """The shared vendor + ``KEY=value`` list layout (Vorbis I §5,
    reused verbatim by FLAC block type 4)."""
    out: Dict[str, str] = {}
    end = min(len(b), pos + MAX_TAG_BYTES)
    if pos + 4 > end:
        return out
    (vlen,) = struct.unpack_from("<I", b, pos)
    pos += 4 + vlen
    if pos + 4 > end:
        return out
    (n,) = struct.unpack_from("<I", b, pos)
    pos += 4
    for _ in range(min(n, 4096)):
        if pos + 4 > end:
            break
        (ln,) = struct.unpack_from("<I", b, pos)
        pos += 4
        if ln > end - pos:
            break
        try:
            item = b[pos:pos + ln].decode("utf-8")
        except UnicodeDecodeError:
            pos += ln
            continue
        pos += ln
        if "=" in item:
            k, v = item.split("=", 1)
            k = k.lower()
            if v.strip():
                out[_VORBIS_MAP.get(k, k)] = v.strip()
    return out


def read_ogg_comments(payload: bytes) -> Dict[str, str]:
    """Vorbis comments from an Ogg stream (packet 2's \\x03vorbis
    header; a bounded scan is enough — the comment header sits in the
    first pages by spec)."""
    idx = payload.find(b"\x03vorbis", 0, MAX_TAG_BYTES)
    if idx < 0:
        return {}
    return _parse_vorbis_comment_body(payload, idx + 7)


def read_flac_comments(payload: bytes) -> Dict[str, str]:
    """VORBIS_COMMENT metadata block (type 4) of a FLAC stream."""
    if payload[:4] != b"fLaC":
        return {}
    pos = 4
    while pos + 4 <= len(payload):
        hdr = payload[pos]
        blen = int.from_bytes(payload[pos + 1:pos + 4], "big")
        if (hdr & 0x7F) == 4:
            return _parse_vorbis_comment_body(payload, pos + 4)
        pos += 4 + blen
        if hdr & 0x80:
            break
    return {}


def read_riff_info(payload: bytes) -> Dict[str, str]:
    """``LIST INFO`` tags of a RIFF (WAV/AVI) payload."""
    b = payload
    if len(b) < 12 or b[:4] != b"RIFF":
        return {}
    end = min(len(b), 8 + struct.unpack_from("<I", b, 4)[0],
              MAX_TAG_BYTES)
    out: Dict[str, str] = {}
    pos = 12
    while pos + 8 <= end:
        cid = b[pos:pos + 4]
        (csize,) = struct.unpack_from("<I", b, pos + 4)
        body = pos + 8
        if body + csize > end:
            break
        if cid == b"LIST" and b[body:body + 4] == b"INFO":
            p = body + 4
            stop = body + csize
            while p + 8 <= stop:
                tid = b[p:p + 4]
                (tsize,) = struct.unpack_from("<I", b, p + 4)
                if p + 8 + tsize > stop:
                    break
                try:
                    txt = b[p + 8:p + 8 + tsize].split(b"\x00")[0] \
                        .decode("latin-1").strip()
                except UnicodeDecodeError:
                    txt = ""
                if txt:
                    key = _RIFF_MAP.get(tid)
                    if key is None:
                        try:
                            key = tid.decode("ascii").lower()
                        except UnicodeDecodeError:
                            key = None
                    if key:
                        out[key] = txt
                p += 8 + tsize + (tsize & 1)
        pos = body + csize + (csize & 1)
    return out


def audio_text_tags(payload: Optional[bytes]) -> Dict[str, str]:
    """Dispatch on magic: the one call the operators use."""
    if not payload:
        return {}
    if payload[:3] == b"ID3":
        return read_id3v2(payload)
    if payload[:4] == b"OggS":
        return read_ogg_comments(payload)
    if payload[:4] == b"fLaC":
        return read_flac_comments(payload)
    if payload[:4] == b"RIFF":
        return read_riff_info(payload)
    return {}


# ------------------------------------------------------------- fixtures

def make_id3v2(tags: Dict[str, str], version: int = 3,
               audio: bytes = b"") -> bytes:
    """ID3v2.3/2.4 tag fixture (UTF-16-with-BOM for v3 text frames,
    UTF-8 for v4) prepended to ``audio``."""
    assert version in (3, 4)
    rev = {"title": "TIT2", "artist": "TPE1", "album": "TALB",
           "date": "TDRC" if version == 4 else "TYER",
           "comment": "COMM", "lyrics": "USLT"}
    def u16(s: str) -> bytes:              # UTF-16 with explicit BOM
        return b"\xff\xfe" + s.encode("utf-16-le")

    frames = bytearray()
    for k, v in tags.items():
        fid = rev.get(k, k).encode("ascii")
        if k in ("comment", "lyrics"):
            if version == 4:
                body = b"\x03eng\x00" + v.encode("utf-8")
            else:
                # enc=1: lang + BOM'd empty description + \x00\x00
                # terminator + BOM'd text
                body = b"\x01eng" + u16("") + b"\x00\x00" + u16(v)
        elif version == 4:
            body = b"\x03" + v.encode("utf-8")
        else:
            body = b"\x01" + u16(v)
        size = (_syncsafe_enc(len(body)) if version == 4
                else struct.pack(">I", len(body)))
        frames += fid + size + b"\x00\x00" + body
    hdr = b"ID3" + bytes([version, 0, 0]) + _syncsafe_enc(len(frames))
    return hdr + bytes(frames) + audio


def _syncsafe_enc(n: int) -> bytes:
    return bytes(((n >> s) & 0x7F) for s in (21, 14, 7, 0))


def add_riff_info(wav: bytes, tags: Dict[str, str]) -> bytes:
    """Append a ``LIST INFO`` chunk to a RIFF payload (WAV fixture),
    updating the RIFF size — readers that walk chunks are order-
    agnostic, which `wav_codec.decode_wav` pins."""
    rev = {v: k for k, v in _RIFF_MAP.items()}
    body = bytearray(b"INFO")
    for k, v in tags.items():
        tid = rev.get(k, k[:4].upper().encode("ascii"))
        data = v.encode("latin-1") + b"\x00"
        body += tid + struct.pack("<I", len(data)) + data
        if len(data) & 1:
            body += b"\x00"
    chunk = b"LIST" + struct.pack("<I", len(body)) + bytes(body)
    out = bytearray(wav)
    out += chunk
    struct.pack_into("<I", out, 4, len(out) - 8)
    return bytes(out)


# ------------------------------------------------ image-borne text (r5)

_PNG_KEY_MAP = {
    "title": "title", "author": "artist", "description": "comment",
    "comment": "comment", "copyright": "copyright",
    "creation time": "date",
}


def read_png_text(payload: bytes) -> Dict[str, str]:
    """tEXt / zTXt / iTXt chunks of a PNG (keyword-mapped; iTXt may be
    zlib-compressed — inflate is bounded by MAX_TAG_BYTES)."""
    b = payload
    if b[:8] != b"\x89PNG\r\n\x1a\n":
        return {}
    import zlib

    out: Dict[str, str] = {}
    pos = 8
    end = min(len(b), MAX_TAG_BYTES)
    while pos + 8 <= end:
        (ln,) = struct.unpack_from(">I", b, pos)
        tag = b[pos + 4:pos + 8]
        body = b[pos + 8:pos + 8 + ln]
        if len(body) < ln:
            break
        txt = kw = None
        try:
            if tag == b"tEXt":
                kw, _, rest = body.partition(b"\x00")
                txt = rest.decode("latin-1")
            elif tag == b"zTXt":
                kw, _, rest = body.partition(b"\x00")
                if rest[:1] == b"\x00":
                    txt = zlib.decompressobj().decompress(
                        rest[1:], MAX_TAG_BYTES).decode("latin-1")
            elif tag == b"iTXt":
                kw, _, rest = body.partition(b"\x00")
                if len(rest) >= 2:
                    comp, rest = rest[0], rest[2:]
                    # skip language tag and translated keyword
                    _, _, rest = rest.partition(b"\x00")
                    _, _, rest = rest.partition(b"\x00")
                    raw = (zlib.decompressobj().decompress(
                        rest, MAX_TAG_BYTES) if comp else rest)
                    txt = raw.decode("utf-8")
        except Exception:
            txt = None                 # malformed text chunk: skip it
        if kw and txt and txt.strip():
            try:
                key = kw.decode("latin-1").lower()
            except UnicodeDecodeError:
                key = ""
            if key:
                out[_PNG_KEY_MAP.get(key, key)] = txt.strip()
        if tag == b"IEND":
            break
        pos += 12 + ln                 # length + tag + body + CRC
    return out


def read_gif_comments(payload: bytes) -> Dict[str, str]:
    """Comment extensions (0x21 0xFE) of a GIF, walking the full block
    structure (image data skipped sub-block-wise, no LZW decode)."""
    b = payload
    if b[:6] not in (b"GIF87a", b"GIF89a") or len(b) < 13:
        return {}
    flags = b[10]
    pos = 13
    if flags & 0x80:                   # global color table
        pos += 3 * (2 << (flags & 7))
    comments = []
    end = min(len(b), MAX_TAG_BYTES)

    def skip_subblocks(p):
        while p < end:
            n = b[p]
            p += 1 + n
            if n == 0:
                return p
        return end

    while pos < end:
        marker = b[pos]
        if marker == 0x3B:             # trailer
            break
        if marker == 0x21 and pos + 1 < end:
            label = b[pos + 1]
            p = pos + 2
            if label == 0xFE:
                buf = bytearray()
                while p < end:
                    n = b[p]
                    if n == 0:
                        p += 1
                        break
                    buf += b[p + 1:p + 1 + n]
                    p += 1 + n
                try:
                    txt = buf.decode("utf-8")
                except UnicodeDecodeError:
                    txt = buf.decode("latin-1", "replace")
                if txt.strip():
                    comments.append(txt.strip())
                pos = p
            else:
                pos = skip_subblocks(p)
        elif marker == 0x2C and pos + 10 <= end:   # image descriptor
            lflags = b[pos + 9]
            pos += 10
            if lflags & 0x80:
                pos += 3 * (2 << (lflags & 7))
            pos += 1                   # LZW min code size
            pos = skip_subblocks(pos)
        else:
            break                      # unknown structure: stop cleanly
    return {"comment": " ".join(comments)} if comments else {}


def read_id3v1(payload: bytes) -> Dict[str, str]:
    """The 128-byte ID3v1 trailer — the fallback when no v2 tag leads."""
    if len(payload) < 128:
        return {}
    t = payload[-128:]
    if t[:3] != b"TAG":
        return {}

    def field(a, z):
        return t[a:z].split(b"\x00")[0].decode("latin-1",
                                               "replace").strip()

    out = {}
    for key, (a, z) in (("title", (3, 33)), ("artist", (33, 63)),
                        ("album", (63, 93)), ("date", (93, 97)),
                        ("comment", (97, 127))):
        v = field(a, z)
        if v:
            out[key] = v
    return out


def text_tags(payload: Optional[bytes]) -> Dict[str, str]:
    """Text metadata from ANY supported container: the audio families
    plus PNG text chunks and GIF comments.  The one call
    `multimodal.media_text_tags` uses."""
    if not payload:
        return {}
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        out = read_png_text(payload)
        for k, v in read_exif_strings(payload).items():
            out.setdefault(k, v)
        return out
    if payload[:2] == b"\xff\xd8" or payload[:2] in (b"II", b"MM") \
            or (payload[:4] == b"RIFF" and payload[8:12] == b"WEBP"):
        return read_exif_strings(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return read_gif_comments(payload)
    if payload[:4] == b"%PDF":
        from .pdf_parse import extract_pdf_metadata

        return extract_pdf_metadata(payload)
    if payload[:4] == b"\x1aE\xdf\xa3":
        return read_webm_tags(payload)
    if payload[4:8] == b"ftyp":
        return read_mp4_tags(payload)
    got = audio_text_tags(payload)
    if not got and len(payload) >= 128 \
            and payload[-128:][:3] == b"TAG":
        return read_id3v1(payload)
    return got


# fixture helpers -------------------------------------------------------

def add_png_text(png: bytes, tags: Dict[str, str],
                 itxt: bool = False) -> bytes:
    """Insert tEXt (or UTF-8 iTXt) chunks before IEND."""
    import zlib

    rev = {"title": b"Title", "artist": b"Author",
           "comment": b"Description", "date": b"Creation Time",
           "copyright": b"Copyright"}
    chunks = bytearray()
    for k, v in tags.items():
        kw = rev.get(k, k.title().encode("latin-1"))
        if itxt:
            body = kw + b"\x00\x00\x00" + b"\x00" + b"\x00" \
                + v.encode("utf-8")
            tag = b"iTXt"
        else:
            body = kw + b"\x00" + v.encode("latin-1")
            tag = b"tEXt"
        crc = zlib.crc32(tag + body) & 0xFFFFFFFF
        chunks += struct.pack(">I", len(body)) + tag + body \
            + struct.pack(">I", crc)
    idx = png.rfind(b"IEND")
    assert idx >= 8
    return png[:idx - 4] + bytes(chunks) + png[idx - 4:]


def add_gif_comment(gif: bytes, text: str) -> bytes:
    """Insert a comment extension right after the (optional) global
    color table."""
    flags = gif[10]
    pos = 13
    if flags & 0x80:
        pos += 3 * (2 << (flags & 7))
    data = text.encode("utf-8")
    blocks = bytearray(b"\x21\xfe")
    for i in range(0, len(data), 255):
        part = data[i:i + 255]
        blocks += bytes([len(part)]) + part
    blocks += b"\x00"
    return gif[:pos] + bytes(blocks) + gif[pos:]


def make_id3v1(tags: Dict[str, str], audio: bytes = b"") -> bytes:
    t = bytearray(b"TAG" + bytes(125))

    def put(a, z, key):
        v = tags.get(key, "").encode("latin-1", "replace")[:z - a]
        t[a:a + len(v)] = v

    put(3, 33, "title")
    put(33, 63, "artist")
    put(63, 93, "album")
    put(93, 97, "date")
    put(97, 127, "comment")
    return audio + bytes(t)


# --------------------------------------------- EXIF text strings (r5)

_EXIF_STR_TAGS = {271: "camera_make", 272: "camera_model",
                  306: "date"}


def _exif_strings_from_tiff(t: bytes) -> Dict[str, str]:
    """ASCII tags (Make/Model/DateTime) of IFD0 in a TIFF blob."""
    import struct as _s

    fmt = "<" if t[:2] == b"II" else ">" if t[:2] == b"MM" else None
    if fmt is None:
        return {}
    try:
        from .tiff_codec import _read_ifd

        (off,) = _s.unpack_from(fmt + "I", t, 4)
        tags = _read_ifd(t, fmt, off)
    except Exception:
        return {}
    out: Dict[str, str] = {}
    for tag, key in _EXIF_STR_TAGS.items():
        vals = tags.get(tag)
        if not vals:
            continue
        try:
            txt = bytes(vals).split(b"\x00")[0] \
                .decode("ascii", "replace").strip()
        except Exception:
            continue
        if txt:
            out[key] = txt
    return out


def read_exif_strings(payload: bytes) -> Dict[str, str]:
    """Camera make/model/date from whatever EXIF the container
    carries: JPEG APP1, bare TIFF IFD0, WebP EXIF chunk, PNG eXIf
    chunk — the provenance text an image corpus keeps."""
    b = payload
    if b[:2] == b"\xff\xd8":                       # JPEG: APP1 walk
        pos = 2
        while pos + 4 <= len(b) and b[pos] == 0xFF:
            marker = b[pos + 1]
            pos += 2
            if marker in (0x01,) or 0xD0 <= marker <= 0xD8:
                continue
            if marker in (0xD9, 0xDA):
                break
            ln = int.from_bytes(b[pos:pos + 2], "big")
            seg = b[pos + 2:pos + ln]
            pos += ln
            if marker == 0xE1 and seg[:6] == b"Exif\x00\x00":
                return _exif_strings_from_tiff(seg[6:])
        return {}
    if b[:2] in (b"II", b"MM"):                    # bare TIFF
        return _exif_strings_from_tiff(b)
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":    # WebP EXIF chunk
        pos = 12
        while pos + 8 <= len(b):
            cc = b[pos:pos + 4]
            size = int.from_bytes(b[pos + 4:pos + 8], "little")
            if cc == b"EXIF":
                body = b[pos + 8:pos + 8 + size]
                if body[:6] == b"Exif\x00\x00":
                    body = body[6:]
                return _exif_strings_from_tiff(body)
            pos += 8 + size + (size & 1)
        return {}
    if b[:8] == b"\x89PNG\r\n\x1a\n":              # PNG eXIf chunk
        pos = 8
        while pos + 8 <= len(b):
            ln = int.from_bytes(b[pos:pos + 4], "big")
            tag = b[pos + 4:pos + 8]
            if tag == b"eXIf":
                return _exif_strings_from_tiff(b[pos + 8:pos + 8 + ln])
            if tag == b"IEND":
                break
            pos += 12 + ln
    return {}


def make_exif_strings_tiff(make: str = "", model: str = "",
                           date: str = "",
                           big_endian: bool = False) -> bytes:
    """Fixture: a bare TIFF IFD carrying the ASCII provenance tags
    (usable standalone or as a JPEG APP1 / WebP EXIF / PNG eXIf
    body)."""
    from .tiff_codec import _assemble_tiff

    entries = []
    for tag, v in ((271, make), (272, model), (306, date)):
        if v:
            entries.append((tag, 2, list(v.encode("ascii") + b"\x00")))
    return _assemble_tiff(big_endian, entries, [])


# video container tags --------------------------------------------------
# The reference stops at magic-byte typing for video rows; titles and
# artists ride in MP4 udta/meta/ilst items ('©nam'/'©ART'/...) and in
# Matroska Segment Info Title + Tags SimpleTags — both are document
# text for indexing/dedup, extractable in O(header) with no codec.

_MP4_MAP = {b"\xa9nam": "title", b"\xa9ART": "artist",
            b"\xa9alb": "album", b"\xa9day": "date",
            b"\xa9cmt": "comment", b"desc": "comment"}

_MKV_MAP = {"TITLE": "title", "ARTIST": "artist", "ALBUM": "album",
            "DATE_RELEASED": "date", "DATE": "date",
            "COMMENT": "comment", "DESCRIPTION": "comment"}


def _mp4_boxes(b: bytes, pos: int, end: int):
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


def read_mp4_tags(payload: bytes) -> Dict[str, str]:
    """iTunes-style metadata out of moov/udta/meta/ilst: each item box
    ('©nam', '©ART', ...) carries a 'data' fullbox whose flags value 1
    marks UTF-8 text (8-byte version/flags + locale preamble).  The
    layout every MP4 muxer (and M4A/M4V) writes."""
    b = payload[:MAX_TAG_BYTES]
    out: Dict[str, str] = {}

    def walk_ilst(s: int, e: int) -> None:
        for cc, s2, e2 in _mp4_boxes(b, s, e):
            for cc3, s3, e3 in _mp4_boxes(b, s2, e2):
                if cc3 != b"data" or e3 - s3 < 8:
                    continue
                flags = int.from_bytes(b[s3:s3 + 4], "big") & 0xFFFFFF
                if flags != 1:          # not UTF-8 text
                    continue
                try:
                    txt = b[s3 + 8:e3].decode("utf-8").strip()
                except UnicodeDecodeError:
                    continue
                if txt:
                    key = _MP4_MAP.get(
                        cc, cc.decode("latin-1").lstrip("\xa9").lower())
                    out.setdefault(key, txt)

    def read_chpl(s: int, e: int) -> None:
        # Nero chapter box (version 1): fullbox(4) + 4 reserved +
        # uint8 count, entries = uint64 start + uint8 len + title
        pos = s + 9
        if pos > e:
            return
        count = b[s + 8] if s + 8 < e else 0
        titles: List[str] = []
        for _ in range(min(count, 512)):
            if pos + 9 > e:
                break
            ln = b[pos + 8]
            raw = b[pos + 9:pos + 9 + ln]
            pos += 9 + ln
            try:
                t = raw.decode("utf-8").strip()
            except UnicodeDecodeError:
                continue
            if t:
                titles.append(t)
        if titles:
            out.setdefault("chapters", "\n".join(titles))

    for cc, s, e in _mp4_boxes(b, 0, len(b)):
        if cc != b"moov":
            continue
        for cc2, s2, e2 in _mp4_boxes(b, s, e):
            if cc2 != b"udta":
                continue
            for cc3, s3, e3 in _mp4_boxes(b, s2, e2):
                if cc3 == b"chpl":
                    read_chpl(s3, e3)
                if cc3 != b"meta":
                    continue
                # meta is a fullbox: 4 bytes of version/flags lead
                for cc4, s4, e4 in _mp4_boxes(b, s3 + 4, e3):
                    if cc4 == b"ilst":
                        walk_ilst(s4, e4)
    return out


def read_webm_tags(payload: bytes) -> Dict[str, str]:
    """Matroska/WebM text metadata: Segment Info Title plus Tags
    SimpleTags (TITLE/ARTIST/... per the public Matroska tag
    registry), normalized to the shared key set."""
    from .webm_codec import parse_webm

    try:
        parsed = parse_webm(payload)
    except Exception:
        return {}
    title, tags = parsed.title, parsed.tags
    out: Dict[str, str] = {}
    if title.strip():
        out["title"] = title.strip()
    for k, v in tags.items():
        if v.strip():
            out.setdefault(_MKV_MAP.get(k.upper(), k.lower()),
                           v.strip())
    if parsed.chapters:
        out.setdefault("chapters", "\n".join(parsed.chapters))
    # transmuxed Vorbis audio keeps its comment packet inside the
    # A_VORBIS CodecPrivate — surface those KEY=value tags too
    # (Matroska-level Tags/Title take priority)
    for t in parsed.tracks:
        if t.codec == "A_VORBIS" and t.codec_private:
            try:
                from .webm_codec import _xiph_codec_private

                pkts = _xiph_codec_private(t.codec_private)
                if pkts[1][:7] == b"\x03vorbis":
                    for k, v in _parse_vorbis_comment_body(
                            pkts[1], 7).items():
                        out.setdefault(k, v)
            except Exception:
                continue
    return out


def make_mp4_tags(tags: Dict[str, str],
                  width: int = 0, height: int = 0,
                  chapters: "Optional[List[str]]" = None) -> bytes:
    """Fixture: ftyp + moov(trak/tkhd when geometry given,
    udta(meta(hdlr + ilst(items with UTF-8 'data' boxes))))."""
    rev = {v: k for k, v in _MP4_MAP.items() if k != b"desc"}

    def box(cc: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + cc + body

    items = b""
    for k, v in tags.items():
        cc = rev.get(k, k.encode("latin-1")[:4].ljust(4))
        data = box(b"data",
                   (1).to_bytes(4, "big") + bytes(4)
                   + v.encode("utf-8"))
        items += box(cc, data)
    hdlr = box(b"hdlr", bytes(8) + b"mdir" + b"appl" + bytes(10))
    meta = box(b"meta", bytes(4) + hdlr + box(b"ilst", items))
    if chapters:
        body = (b"\x01" + bytes(3) + bytes(4)
                + bytes([len(chapters)]))
        for k, c in enumerate(chapters):
            raw = c.encode("utf-8")
            body += (k * 1000).to_bytes(8, "big") \
                + bytes([len(raw)]) + raw
        meta = box(b"chpl", body) + meta
    moov_body = b""
    if width and height:
        tkhd_payload = bytes(4) + bytes(4 * 5) + bytes(8) \
            + bytes(2 * 4) + bytes(36) \
            + struct.pack(">II", width << 16, height << 16)
        moov_body += box(b"trak", box(b"tkhd", tkhd_payload))
    moov_body += box(b"udta", meta)
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" \
        + b"\x00\x00\x02\x00"
    return ftyp + box(b"moov", moov_body)

"""WebM (Matroska/EBML) container walk + VP8 key-frame decode.

WebM is the web's native video container (the <video> tag's royalty-
free default), and its VP8 video track carries EXACTLY the same raw
key-frame bitstream a lossy WebP file embeds in its ``VP8 `` chunk —
so the round-5 VP8 decoder (`kernels/vp8_codec.py`) makes WebM video
rows decodable for real with no new pixel math.  This module walks the
EBML structure (Segment -> Tracks -> TrackEntry for codec + geometry,
Segment -> Cluster -> SimpleBlock / BlockGroup(Block) for frame data,
all three lacing modes for intra-block frame packing) and decodes one
selected frame of a ``V_VP8`` track to pixels, mirroring how
GIF / animated-WebP / AVI rows surface a frame through
`media_decode_stats`.  ``V_VP9`` / ``V_AV1`` tracks raise
NotImplementedError with the codec named, so the operator falls back
to the header-only geometry probe (`media_probe._probe_webm`) — a
routed column, never a crash.

The reference treats video inputs as out-of-scope binaries
(`core/input/types.py:39-105` stops at magic-byte detection); here the
container-feasible subset decodes for real.

The encoder half is the fixture generator: a structurally complete
WebM (EBML header with DocType, Segment with Info/TimecodeScale,
Tracks with one VP8 TrackEntry, one Cluster of SimpleBlocks) wrapped
around caller-supplied raw VP8 frames, so the decode invariant is
exact: decode_webm(...).pixels == vp8_frame_to_rgb(decode_vp8(frame)).

Decompression-bomb guard: the declared PixelWidth x PixelHeight gate
rejects hostile headers in O(header) before any frame data is read,
and the VP8 decoder re-checks its own frame-header geometry.
"""

from __future__ import annotations

import struct
from typing import List, NamedTuple, Optional, Tuple

MAX_PIXELS = 1 << 26    # shared decode guard with the other codecs
MAX_FRAMES = 1 << 16    # per-track frame-range cap (hostile streams)

# EBML / Matroska element ids (the public Matroska registry subset
# this walk needs)
_EBML_HEADER = 0x1A45DFA3
_DOCTYPE = 0x4282
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMECODE_SCALE = 0x2AD7B1
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_CODEC_PRIVATE = 0x63A2
_VIDEO = 0xE0
_PIXEL_W = 0xB0
_PIXEL_H = 0xBA
_AUDIO = 0xE1
_SAMPLE_FREQ = 0xB5
_CHANNELS = 0x9F
_DURATION = 0x4489
_CLUSTER = 0x1F43B675
_CLUSTER_TIMECODE = 0xE7
_SIMPLE_BLOCK = 0xA3
_BLOCK_GROUP = 0xA0
_BLOCK = 0xA1
_TITLE = 0x7BA9
_TAGS = 0x1254C367
_CHAPTERS = 0x1043A770
_TAG_NAME = 0x45A3
_TAG_STRING = 0x4487


class DecodedWebmFrame(NamedTuple):
    width: int
    height: int
    channels: int
    pixels: bytes        # selected video frame, interleaved RGB
    n_frames: int        # block-laced frame count on the video track
    codec: str           # Matroska CodecID, e.g. 'V_VP8'


class WebmTrack(NamedTuple):
    number: int
    ttype: int           # 1 = video, 2 = audio
    codec: str
    width: int
    height: int
    sample_rate: float
    channels: int
    codec_private: bytes


class ParsedWebm(NamedTuple):
    tracks: List[WebmTrack]
    frames_by_track: dict     # track number -> (start, end) ranges, in order
    title: str
    tags: dict                # Tags SimpleTag name -> string
    timecode_scale: int       # ns per timecode unit (default 1000000)
    duration: float           # Segment Duration in timecode units (0 = absent)
    chapters: List[str]       # ChapterDisplay/ChapString titles, in order


def _vint(b: bytes, pos: int, keep_marker: bool):
    """(value, next_pos) EBML variable-length integer, or None."""
    if pos >= len(b) or b[pos] == 0:
        return None
    first = b[pos]
    length = 1
    mask = 0x80
    while not (first & mask):
        mask >>= 1
        length += 1
    if pos + length > len(b):
        return None
    v = first if keep_marker else (first & (mask - 1))
    for i in range(1, length):
        v = (v << 8) | b[pos + i]
    return v, pos + length


def _svint(b: bytes, pos: int):
    """Signed EBML vint (lacing deltas): value - (2^(7L-1) - 1)."""
    got = _vint(b, pos, False)
    if got is None:
        return None
    v, npos = got
    length = npos - pos
    return v - ((1 << (7 * length - 1)) - 1), npos


def _elements(b: bytes, pos: int, end: int):
    """Yield (element_id, body_start, body_end) over an EBML scope.
    Unknown-size elements (all value-bits set, standard for live
    Segments) and overruns extend to the end of the scope."""
    while pos < end:
        got = _vint(b, pos, True)
        if got is None:
            return
        eid, pos = got
        got = _vint(b, pos, False)
        if got is None:
            return
        size, pos = got
        if size >= (1 << 56) - 1 or pos + size > end:
            size = end - pos
        yield eid, pos, pos + size
        pos += size


def _block_frames(b: bytes, s: int, e: int):
    """Parse a (Simple)Block body: (track_number, [(start, end), ...])
    frame RANGES honoring the three lacing modes (none / Xiph /
    fixed-size / EBML) — ranges, not copies, so the container walk
    stays zero-copy however large the video payload is; consumers
    slice only the frames they decode."""
    got = _vint(b, s, False)
    if got is None:
        return None
    track, pos = got
    if pos + 3 > e:
        return None
    flags = b[pos + 2]
    pos += 3                       # int16 timecode + flags byte
    lacing = (flags >> 1) & 3
    if lacing == 0:
        return track, [(pos, e)]
    if pos >= e:
        return None
    n_frames = b[pos] + 1
    pos += 1
    sizes: List[int] = []
    if lacing == 1:                # Xiph: 255-continued bytes
        for _ in range(n_frames - 1):
            sz = 0
            while pos < e:
                sz += b[pos]
                if b[pos] != 255:
                    pos += 1
                    break
                pos += 1
            sizes.append(sz)
    elif lacing == 2:              # fixed-size: equal division
        if (e - pos) % n_frames:
            return None
        sizes = [(e - pos) // n_frames] * (n_frames - 1)
    else:                          # EBML: first absolute, then deltas
        got = _vint(b, pos, False)
        if got is None:
            return None
        sz, pos = got
        sizes.append(sz)
        for _ in range(n_frames - 2):
            got = _svint(b, pos)
            if got is None:
                return None
            delta, pos = got
            sz += delta
            sizes.append(sz)
    frames = []
    for sz in sizes:
        if sz < 0 or pos + sz > e:      # negative EBML delta runs or
            return None                 # overruns reject the block
        frames.append((pos, pos + sz))
        pos += sz
    frames.append((pos, e))        # last frame: remainder of the block
    return track, frames


def parse_webm(payload: bytes):
    """Structural walk shared by decode and metadata: a ParsedWebm
    whose ``frames_by_track`` maps track number -> list of (start, end)
    frame ranges in stream order (zero-copy; capped at MAX_FRAMES per
    track), ``title`` is the Segment Info Title
    (or ''), ``tags`` the Tags SimpleTag name -> string dict, plus the
    Info TimecodeScale/Duration pair audio trimming needs."""
    b = payload
    got = _vint(b, 0, True)
    if got is None or got[0] != _EBML_HEADER:
        raise ValueError("not an EBML/Matroska payload")
    got2 = _vint(b, got[1], False)
    if got2 is None:
        raise ValueError("truncated EBML header")
    hdr_end = got2[0] + got2[1]
    doctype = ""
    for eid, s, e in _elements(b, got2[1], hdr_end):
        if eid == _DOCTYPE:
            doctype = b[s:e].decode("ascii", "replace").rstrip("\x00")
    if doctype not in ("webm", "matroska", ""):
        raise ValueError(f"unsupported EBML DocType '{doctype}'")

    tracks: List[WebmTrack] = []
    frames_by_track: dict = {}
    title = ""
    tags: dict = {}
    timecode_scale = 1000000
    duration = 0.0
    chapters: List[str] = []

    def parse_entry(s: int, e: int) -> None:
        num = ttype = width = height = channels = 0
        rate = 0.0
        codec = ""
        private = b""
        for eid, s2, e2 in _elements(b, s, e):
            if eid == _TRACK_NUMBER:
                num = int.from_bytes(b[s2:e2], "big")
            elif eid == _TRACK_TYPE:
                ttype = int.from_bytes(b[s2:e2], "big")
            elif eid == _CODEC_ID:
                codec = b[s2:e2].decode("ascii", "replace").rstrip("\x00")
            elif eid == _CODEC_PRIVATE:
                private = b[s2:e2]
            elif eid == _VIDEO:
                for eid3, s3, e3 in _elements(b, s2, e2):
                    if eid3 == _PIXEL_W:
                        width = int.from_bytes(b[s3:e3], "big")
                    elif eid3 == _PIXEL_H:
                        height = int.from_bytes(b[s3:e3], "big")
            elif eid == _AUDIO:
                for eid3, s3, e3 in _elements(b, s2, e2):
                    if eid3 == _SAMPLE_FREQ and e3 - s3 in (4, 8):
                        rate = struct.unpack(
                            ">f" if e3 - s3 == 4 else ">d",
                            b[s3:e3])[0]
                    elif eid3 == _CHANNELS:
                        channels = int.from_bytes(b[s3:e3], "big")
        tracks.append(WebmTrack(num, ttype, codec, width, height,
                                rate, channels, private))

    def parse_tags(s: int, e: int) -> None:
        # Tags -> Tag -> SimpleTag(TagName, TagString); SimpleTags can
        # nest, so walk every scope that contains element structure
        name = val = None
        for eid, s2, e2 in _elements(b, s, e):
            if eid == _TAG_NAME:
                name = b[s2:e2].decode("utf-8", "replace")
            elif eid == _TAG_STRING:
                val = b[s2:e2].decode("utf-8", "replace")
            elif eid in (0x7373, 0x63C0):   # Tag / Targets
                parse_tags(s2, e2)
            elif eid == 0x67C8:             # SimpleTag
                parse_tags(s2, e2)
        if name and val is not None:
            tags[name] = val

    got3 = _vint(b, hdr_end, True)
    if got3 is None or got3[0] != _SEGMENT:
        raise ValueError("EBML stream has no Segment")
    got4 = _vint(b, got3[1], False)
    if got4 is None:
        raise ValueError("truncated Segment header")
    seg_start = got4[1]
    seg_end = seg_start + got4[0]
    if got4[0] >= (1 << 56) - 1 or seg_end > len(b):
        seg_end = len(b)

    for eid, s, e in _elements(b, seg_start, seg_end):
        if eid == _TRACKS:
            for eid2, s2, e2 in _elements(b, s, e):
                if eid2 == _TRACK_ENTRY:
                    parse_entry(s2, e2)
        elif eid == _INFO:
            for eid2, s2, e2 in _elements(b, s, e):
                if eid2 == _TITLE:
                    title = b[s2:e2].decode("utf-8", "replace")
                elif eid2 == _TIMECODE_SCALE:
                    timecode_scale = int.from_bytes(b[s2:e2], "big")
                elif eid2 == _DURATION and e2 - s2 in (4, 8):
                    duration = struct.unpack(
                        ">f" if e2 - s2 == 4 else ">d", b[s2:e2])[0]
        elif eid == _TAGS:
            parse_tags(s, e)
        elif eid == _CHAPTERS:
            # Chapters -> EditionEntry -> ChapterAtom (nestable) ->
            # ChapterDisplay -> ChapString: navigation titles
            def walk_chapters(cs, ce):
                for eid2, s2, e2 in _elements(b, cs, ce):
                    if eid2 in (0x45B9, 0xB6):   # Edition / Atom
                        walk_chapters(s2, e2)
                    elif eid2 == 0x80:           # ChapterDisplay
                        for eid3, s3, e3 in _elements(b, s2, e2):
                            if eid3 == 0x85:     # ChapString
                                t = b[s3:e3].decode(
                                    "utf-8", "replace").strip()
                                if t:
                                    chapters.append(t)

            walk_chapters(s, e)
        elif eid == _CLUSTER:
            for eid2, s2, e2 in _elements(b, s, e):
                if eid2 == _SIMPLE_BLOCK:
                    got5 = _block_frames(b, s2, e2)
                elif eid2 == _BLOCK_GROUP:
                    got5 = None
                    for eid3, s3, e3 in _elements(b, s2, e2):
                        if eid3 == _BLOCK:
                            got5 = _block_frames(b, s3, e3)
                            break
                else:
                    continue
                if got5 is not None:
                    lst = frames_by_track.setdefault(got5[0], [])
                    if len(lst) < MAX_FRAMES:
                        lst.extend(got5[1][:MAX_FRAMES - len(lst)])
    return ParsedWebm(tracks, frames_by_track, title, tags,
                      timecode_scale, duration, chapters)


def decode_webm(payload: bytes,
                max_pixels: int = MAX_PIXELS,
                frame: int = 0,
                _parsed: "ParsedWebm | None" = None) -> DecodedWebmFrame:
    """Decode one video frame of a VP8 WebM (``frame=-1`` for the
    last), mirroring the GIF/TIFF/AVI frame-selection API; ``n_frames``
    always reports the laced frame count on the video track."""
    parsed = _parsed if _parsed is not None else parse_webm(payload)
    tracks, frames_by_track = parsed.tracks, parsed.frames_by_track
    video = next((t for t in tracks if t.ttype == 1), None)
    if video is None:
        if any(t.ttype == 2 for t in tracks):
            raise NotImplementedError(
                "audio-only WebM: use the audio decode stage")
        raise ValueError("WebM has no video track")
    if video.width <= 0 or video.height <= 0:
        raise ValueError("WebM video track missing frame geometry")
    if video.width * video.height > max_pixels:
        raise ValueError(
            f"WebM dimensions {video.width}x{video.height} exceed the "
            f"{max_pixels}-pixel decode guard (decompression-bomb "
            "protection)")
    frames = frames_by_track.get(video.number, [])
    n_frames = len(frames)
    if not frames:
        raise ValueError("WebM clusters carry no video frames")
    idx = frame if frame >= 0 else n_frames + frame
    if not 0 <= idx < n_frames:
        raise ValueError(f"WebM frame {frame} out of range "
                         f"(track has {n_frames})")
    fs, fe = frames[idx]
    if video.codec == "V_MJPEG":
        # Matroska Motion-JPEG: every block a complete baseline JPEG
        from .jpeg_codec import decode_jpeg

        dj = decode_jpeg(payload[fs:fe])
        return DecodedWebmFrame(dj.width, dj.height, dj.channels,
                                dj.pixels, n_frames, video.codec)
    if video.codec == "V_AV1":
        # AV1 key frame: CodecPrivate carries the av1C config — wrap
        # the temporal unit as a minimal AVIF and decode through the
        # dlopen-gated libheif path (raises the routed
        # NotImplementedError when the library is absent)
        from .heif_native import decode_av1_obus

        da = decode_av1_obus(payload[fs:fe], video.width,
                             video.height, video.codec_private,
                             max_pixels=max_pixels)
        return DecodedWebmFrame(da.width, da.height, da.channels,
                                da.pixels, n_frames, video.codec)
    if video.codec != "V_VP8":
        raise NotImplementedError(
            f"WebM video codec '{video.codec or '?'}' requires "
            "libraries not present in this container (only VP8/AV1 "
            "key frames and Motion-JPEG decode)")
    from .vp8_codec import decode_vp8, vp8_frame_to_rgb

    dec = decode_vp8(payload[fs:fe], max_pixels=max_pixels)
    rgb = vp8_frame_to_rgb(dec)
    return DecodedWebmFrame(dec.width, dec.height, 3, rgb,
                            n_frames, video.codec)


def _xiph_codec_private(b: bytes) -> List[bytes]:
    """Matroska A_VORBIS CodecPrivate: count byte (must be 2 = three
    packets) + Xiph-laced sizes for the first two, remainder is the
    third — the identification / comment / setup header packets."""
    if not b or b[0] != 2:
        raise ValueError("A_VORBIS CodecPrivate must carry 3 packets")
    pos = 1
    sizes = []
    for _ in range(2):
        sz = 0
        while pos < len(b):
            sz += b[pos]
            if b[pos] != 255:
                pos += 1
                break
            pos += 1
        sizes.append(sz)
    packets = []
    for sz in sizes:
        if pos + sz > len(b):
            raise ValueError("truncated A_VORBIS CodecPrivate")
        packets.append(b[pos:pos + sz])
        pos += sz
    packets.append(b[pos:])
    return packets


def decode_webm_audio(payload: bytes, max_samples: "int | None" = None,
                      _parsed: "ParsedWebm | None" = None):
    """Decode the Vorbis audio track of a WebM to interleaved int16
    samples (the DecodedWav shape wav/flac/ogg decode to): CodecPrivate
    carries the three Xiph-laced header packets, each block one audio
    packet, and the Segment Duration (when present) trims the
    overlap-add tail exactly as Ogg's final granule does."""
    from .vorbis_codec import MAX_SAMPLES, decode_vorbis_packets

    if max_samples is None:
        max_samples = MAX_SAMPLES
    parsed = _parsed if _parsed is not None else parse_webm(payload)
    audio = next((t for t in parsed.tracks if t.ttype == 2), None)
    if audio is None:
        raise ValueError("WebM has no audio track")
    if audio.codec != "A_VORBIS":
        raise NotImplementedError(
            f"WebM audio codec '{audio.codec or '?'}' requires "
            "libraries not present in this container (only Vorbis "
            "decodes)")
    headers = _xiph_codec_private(audio.codec_private)
    packets = headers + [payload[s:e] for s, e in
                         parsed.frames_by_track.get(audio.number, [])]
    last_granule = -1
    if parsed.duration > 0 and audio.sample_rate > 0:
        last_granule = int(round(
            parsed.duration * parsed.timecode_scale
            * audio.sample_rate / 1e9))
    return decode_vorbis_packets(packets, last_granule, max_samples)


def decode_webm_media(payload: bytes):
    """The one `decode_media` route: a WebM with a video track decodes
    a VP8 frame (DecodedWebmFrame); an audio-only WebM decodes its
    Vorbis track (DecodedWav) — the decode-stats operators pick the
    result shape apart by attribute, same as every other container."""
    parsed = parse_webm(payload)
    if any(t.ttype == 1 for t in parsed.tracks):
        return decode_webm(payload, _parsed=parsed)
    if any(t.ttype == 2 for t in parsed.tracks):
        return decode_webm_audio(payload, _parsed=parsed)
    raise ValueError("WebM has no video or audio track")


# ------------------------------------------------------------- encoder

def _elem(eid: int, body: bytes) -> bytes:
    idb = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
    n = len(body)
    if n < 127:
        sz = bytes([0x80 | n])
    else:
        sz = bytes([0x01]) + n.to_bytes(7, "big")
    return idb + sz + body


def _uint_elem(eid: int, v: int) -> bytes:
    return _elem(eid, v.to_bytes(max((v.bit_length() + 7) // 8, 1),
                                 "big"))


def encode_webm_vp8(width: int, height: int, frames: List[bytes],
                    title: str = "", tags: "dict | None" = None,
                    lacing: str = "none",
                    chapters: "List[str] | None" = None,
                    codec: bytes = b"V_VP8",
                    codec_private: bytes = b"") -> bytes:
    """Fixture encoder: a structurally complete WebM around raw VP8
    frame bitstreams (as produced by `vp8_codec.encode_vp8`) — EBML
    header with DocType 'webm', Segment(Info(TimecodeScale [+ Title]),
    Tracks(one VP8 video TrackEntry), [Tags,] Cluster of SimpleBlocks).
    ``lacing='xiph'`` packs ALL frames into one Xiph-laced SimpleBlock
    (exercising the lacing parser); 'none' emits one block per frame,
    the layout real muxers use for video.  The decode invariant is
    exact: decode_webm(out, frame=k).pixels ==
    vp8_frame_to_rgb(decode_vp8(frames[k]))."""
    ebml_hdr = _elem(_EBML_HEADER,
                     _uint_elem(0x4286, 1)          # EBMLVersion
                     + _uint_elem(0x42F7, 1)        # EBMLReadVersion
                     + _uint_elem(0x42F2, 4)        # EBMLMaxIDLength
                     + _uint_elem(0x42F3, 8)        # EBMLMaxSizeLength
                     + _elem(_DOCTYPE, b"webm")
                     + _uint_elem(0x4287, 2)        # DocTypeVersion
                     + _uint_elem(0x4285, 2))       # DocTypeReadVersion
    info_body = _uint_elem(_TIMECODE_SCALE, 1000000)
    if title:
        info_body += _elem(_TITLE, title.encode("utf-8"))
    info = _elem(_INFO, info_body)
    video = _elem(_VIDEO, _uint_elem(_PIXEL_W, width)
                  + _uint_elem(_PIXEL_H, height))
    entry = _elem(_TRACK_ENTRY,
                  _uint_elem(_TRACK_NUMBER, 1)
                  + _uint_elem(0x73C5, 1)           # TrackUID
                  + _uint_elem(_TRACK_TYPE, 1)
                  + _elem(_CODEC_ID, codec)
                  + (_elem(_CODEC_PRIVATE, codec_private)
                     if codec_private else b"")
                  + video)
    tracks = _elem(_TRACKS, entry)
    tags_el = b""
    if tags:
        simple = b"".join(
            _elem(0x67C8, _elem(_TAG_NAME, k.encode("utf-8"))
                  + _elem(_TAG_STRING, v.encode("utf-8")))
            for k, v in tags.items())
        tags_el = _elem(_TAGS, _elem(0x7373, simple))
    if chapters:
        atoms = b"".join(
            _elem(0xB6, _elem(0x80, _elem(0x85, c.encode("utf-8"))))
            for c in chapters)
        tags_el += _elem(_CHAPTERS, _elem(0x45B9, atoms))

    blocks = b""
    if lacing == "xiph" and len(frames) > 1:
        lace = bytes([len(frames) - 1])
        for f in frames[:-1]:
            sz = len(f)
            lace += bytes([255]) * (sz // 255) + bytes([sz % 255])
        body = (b"\x81" + struct.pack(">h", 0) + bytes([0x80 | 0x02])
                + lace + b"".join(frames))
        blocks = _elem(_SIMPLE_BLOCK, body)
    else:
        for k, f in enumerate(frames):
            body = b"\x81" + struct.pack(">h", k) + b"\x80" + f
            blocks += _elem(_SIMPLE_BLOCK, body)
    cluster = _elem(_CLUSTER, _uint_elem(_CLUSTER_TIMECODE, 0) + blocks)
    segment = _elem(_SEGMENT, info + tracks + tags_el + cluster)
    return ebml_hdr + segment


def encode_webm_vorbis(ogg: bytes, title: str = "",
                       tags: "dict | None" = None) -> bytes:
    """Fixture transmuxer: demux a real Ogg Vorbis stream
    (`vorbis_codec.encode_vorbis` output or any other) into a WebM
    audio track — the three header packets become the Xiph-laced
    CodecPrivate, each audio packet one SimpleBlock, and the final
    granule becomes the Segment Duration so decode trims identically.
    The decode invariant is exact:
    decode_webm_audio(encode_webm_vorbis(ogg)) == decode_vorbis(ogg)."""
    from .vorbis_codec import _parse_ident, ogg_pages

    packets: List[bytes] = []
    pending = b""
    last_granule = -1
    for _htype, granule, _serial, pkts, tail in ogg_pages(ogg):
        if pkts:
            pkts = list(pkts)
            if pending:
                pkts[0] = pending + pkts[0]
                pending = b""
            packets.extend(pkts)
        if tail is not None:
            pending = pending + tail if pending else tail
        if granule >= 0:
            last_granule = granule
    if len(packets) < 3:
        raise ValueError("Ogg stream carries no Vorbis headers")
    info = _parse_ident(packets[0])

    private = bytes([2])
    for p in packets[:2]:
        sz = len(p)
        private += bytes([255]) * (sz // 255) + bytes([sz % 255])
    private += packets[0] + packets[1] + packets[2]

    ebml_hdr = _elem(_EBML_HEADER,
                     _uint_elem(0x4286, 1) + _uint_elem(0x42F7, 1)
                     + _uint_elem(0x42F2, 4) + _uint_elem(0x42F3, 8)
                     + _elem(_DOCTYPE, b"webm")
                     + _uint_elem(0x4287, 2) + _uint_elem(0x4285, 2))
    info_body = _uint_elem(_TIMECODE_SCALE, 1000000)
    if last_granule >= 0 and info.rate > 0:
        dur = last_granule * 1e9 / (info.rate * 1000000)
        info_body += _elem(_DURATION, struct.pack(">d", dur))
    if title:
        info_body += _elem(_TITLE, title.encode("utf-8"))
    audio = _elem(_AUDIO,
                  _elem(_SAMPLE_FREQ,
                        struct.pack(">d", float(info.rate)))
                  + _uint_elem(_CHANNELS, info.channels))
    entry = _elem(_TRACK_ENTRY,
                  _uint_elem(_TRACK_NUMBER, 1)
                  + _uint_elem(0x73C5, 2)
                  + _uint_elem(_TRACK_TYPE, 2)
                  + _elem(_CODEC_ID, b"A_VORBIS")
                  + _elem(_CODEC_PRIVATE, private) + audio)
    tracks = _elem(_TRACKS, entry)
    tags_el = b""
    if tags:
        simple = b"".join(
            _elem(0x67C8, _elem(_TAG_NAME, k.encode("utf-8"))
                  + _elem(_TAG_STRING, v.encode("utf-8")))
            for k, v in tags.items())
        tags_el = _elem(_TAGS, _elem(0x7373, simple))
    blocks = b""
    for k, p in enumerate(packets[3:]):
        blocks += _elem(_SIMPLE_BLOCK,
                        b"\x81" + struct.pack(">h", min(k, 32000))
                        + b"\x80" + p)
    cluster = _elem(_CLUSTER, _uint_elem(_CLUSTER_TIMECODE, 0) + blocks)
    segment = _elem(_SEGMENT, _elem(_INFO, info_body) + tracks
                    + tags_el + cluster)
    return ebml_hdr + segment


# ----------------------------------------------------------- subtitles

def webm_subtitle_text(payload: bytes) -> str:
    """Cue text of a WebM/Matroska subtitle track (CodecID
    ``S_TEXT/UTF8`` = SRT-style plain cues, ``S_TEXT/WEBVTT`` = VTT
    cue payloads; timing lives in block timestamps, inline cue tags
    stripped) — the transcript a text corpus keeps from a video row,
    joined cue-per-paragraph exactly like
    `rtf_parse.extract_subtitle_text` renders standalone files."""
    from .rtf_parse import _CUE_TAG_RE

    parsed = parse_webm(payload)
    subs = [t for t in parsed.tracks if t.ttype == 0x11
            or t.codec.startswith("S_TEXT/")]
    out: List[str] = []
    for t in subs:
        if not t.codec.startswith("S_TEXT/"):
            continue
        for fs, fe in parsed.frames_by_track.get(t.number, []):
            cue = []
            for raw in payload[fs:fe].decode(
                    "utf-8", "replace").splitlines():
                line = _CUE_TAG_RE.sub("", raw.strip()).strip()
                if line and "-->" not in line:
                    cue.append(line)
            if cue:
                out.append("\n".join(cue))
    return "\n\n".join(out)


def encode_webm_subtitles(cues: List[str], codec: str = "S_TEXT/UTF8",
                          video: "tuple | None" = None) -> bytes:
    """Fixture: a WebM carrying a subtitle track (one cue per
    SimpleBlock; ``S_TEXT/WEBVTT`` cues get an inline ``<i>`` tag the
    extractor must strip), optionally muxed under a VP8 video track
    ``(width, height, [frames])`` — the subtitles-in-a-real-video
    shape."""
    ebml_hdr = _elem(_EBML_HEADER,
                     _uint_elem(0x4286, 1) + _uint_elem(0x42F7, 1)
                     + _uint_elem(0x42F2, 4) + _uint_elem(0x42F3, 8)
                     + _elem(_DOCTYPE, b"webm")
                     + _uint_elem(0x4287, 2) + _uint_elem(0x4285, 2))
    info = _elem(_INFO, _uint_elem(_TIMECODE_SCALE, 1000000))
    entries = b""
    blocks = b""
    sub_track = 1
    if video is not None:
        w, h, vframes = video
        sub_track = 2
        entries += _elem(
            _TRACK_ENTRY,
            _uint_elem(_TRACK_NUMBER, 1) + _uint_elem(0x73C5, 1)
            + _uint_elem(_TRACK_TYPE, 1)
            + _elem(_CODEC_ID, b"V_VP8")
            + _elem(_VIDEO, _uint_elem(_PIXEL_W, w)
                    + _uint_elem(_PIXEL_H, h)))
        for k, f in enumerate(vframes):
            blocks += _elem(_SIMPLE_BLOCK,
                            b"\x81" + struct.pack(">h", k) + b"\x80"
                            + f)
    entries += _elem(
        _TRACK_ENTRY,
        _uint_elem(_TRACK_NUMBER, sub_track) + _uint_elem(0x73C5, 7)
        + _uint_elem(_TRACK_TYPE, 0x11)
        + _elem(_CODEC_ID, codec.encode("ascii")))
    for k, cue in enumerate(cues):
        body = (f"<i>{cue}</i>" if codec == "S_TEXT/WEBVTT"
                else cue).encode("utf-8")
        blocks += _elem(_SIMPLE_BLOCK,
                        bytes([0x80 | sub_track])
                        + struct.pack(">h", k) + b"\x80" + body)
    cluster = _elem(_CLUSTER, _uint_elem(_CLUSTER_TIMECODE, 0) + blocks)
    segment = _elem(_SEGMENT, info + _elem(_TRACKS, entries) + cluster)
    return ebml_hdr + segment

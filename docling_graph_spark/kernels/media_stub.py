"""Media (image/audio/video) decode routing — real decode where feasible.

`decode_media` dispatches every sniffed media type to a real decoder:
the pure-Python clean-room codecs in this package for the formats whose
specs are transcribable (PNG/JPEG/GIF/BMP/WebP incl. full VP8, TIFF,
ICO, WAV/FLAC/Vorbis, AVI/WebM/MP4 container subsets) plus a
dlopen-gated libheif binding for the CABAC-era HEIC/AVIF family.  The
remaining NotImplementedError routes name their codec and fall back to
header-only probes — a routed column, never a crash.  `fake_features`
remains the deterministic stand-in for embedding-style feature
extraction (content-hash floats, batch-shaped like a real model).

The deterministic fake features are a content hash expanded to floats:
blake2b(payload) → `dim` uint16 words → [0,1) floats.  Same bytes, same
vector, on any executor — which is exactly what the downstream plumbing
tests need (dedup by cosine, partition-stable joins).
"""

from __future__ import annotations

import hashlib
from typing import List, Optional, Tuple

MEDIA_MAGIC: List[Tuple[bytes, str]] = [
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"RIFF", "riff"),          # refined below (WAVE/AVI)
    (b"\x1a\x45\xdf\xa3", "video/webm"),
    (b"ID3", "audio/mpeg"),
    (b"OggS", "audio/ogg"),
    (b"fLaC", "audio/flac"),
    (b"%PDF", "application/pdf"),
    (b"II\x2a\x00", "image/tiff"),
    (b"MM\x00\x2a", "image/tiff"),
]


def sniff_media_type(payload: Optional[bytes]) -> str:
    """Magic-byte media classification (the binary analogue of the
    reference's InputTypeDetector, `core/input/types.py:39-105`)."""
    if not payload:
        return "empty"
    for magic, mtype in MEDIA_MAGIC:
        if payload[: len(magic)] == magic:
            if mtype == "riff":
                tag = payload[8:12]
                if tag == b"WAVE":
                    return "audio/wav"
                if tag == b"AVI ":
                    return "video/avi"
                if tag == b"WEBP":
                    return "image/webp"
                return "application/riff"
            return mtype
    if payload[4:8] == b"ftyp":
        brand = payload[8:12]
        if brand in (b"heic", b"heix", b"hevc", b"hevx", b"mif1",
                     b"msf1"):
            return "image/heic"     # HEIF stills (libheif-gated)
        if brand in (b"avif", b"avis"):
            return "image/avif"     # AV1 stills (libheif-gated)
        return "video/mp4"          # any other ISO BMFF brand
    if payload[0:1] == b"\xff" and len(payload) >= 4 \
            and (payload[1] & 0xE0) == 0xE0:
        # bare MPEG-audio frame sync (no ID3 tag): accept only when
        # the 4-byte header parses against the fixed tables
        from .media_probe import _parse_mp3_frame

        if _parse_mp3_frame(payload, 0) is not None:
            return "audio/mpeg"
    if payload[:4] == b"PK\x03\x04":
        # ZIP container: refine to the OOXML office types by the
        # central-directory member names (no inflate)
        from .ooxml_parse import sniff_zip_kind

        return {
            "docx": "application/vnd.openxmlformats-officedocument"
                    ".wordprocessingml.document",
            "pptx": "application/vnd.openxmlformats-officedocument"
                    ".presentationml.presentation",
            "xlsx": "application/vnd.openxmlformats-officedocument"
                    ".spreadsheetml.sheet",
            "odt": "application/vnd.oasis.opendocument.text",
            "ods": "application/vnd.oasis.opendocument.spreadsheet",
            "odp": "application/vnd.oasis.opendocument.presentation",
            "epub": "application/epub+zip",
        }.get(sniff_zip_kind(payload), "application/zip")
    if payload[:4] == b"\x00\x00\x01\x00" and len(payload) >= 22:
        # ICO: weak magic, so require a parseable ICONDIR entry count
        n = int.from_bytes(payload[4:6], "little")
        if 1 <= n <= 64:
            return "image/x-icon"
    if payload[:2] == b"BM":
        # 'BM' alone is a weak 2-byte magic (plain text can start with it):
        # only classify as BMP when the DIB header actually parses
        from .media_probe import _probe_bmp

        if _probe_bmp(payload) is not None:
            return "image/bmp"
    if payload[:5] == b"{\\rtf":
        return "application/rtf"
    head = payload[:256].lstrip()
    if head[:1] == b"<" or b"<html" in head.lower():
        low = payload[:2048].lower()
        if head[:4].lower() == b"<svg" \
                or (head[:5].lower() == b"<?xml" and b"<svg" in low):
            return "image/svg+xml"  # vector: geometry probes, no raster
        return "text/html"
    return "application/octet-stream"


def decode_media(payload: bytes, media_type: str):
    """REAL decode entry point.

    ``image/png`` decodes for real — stdlib-only codec
    (`kernels/png_codec.py`: chunk walk, bounded IDAT inflate, full
    filter-0..4 defilter, Adam7 interlace, 1/2/4/8-bit depths).  ``image/jpeg`` decodes for real — baseline T.81 process
    AND Huffman progressive (Annex G) (`kernels/jpeg_codec.py`: marker
    walk, Huffman entropy decode, multi-scan successive-approximation
    accumulation, dequant + IDCT, 4:2:0 upsample, YCbCr->RGB;
    arithmetic/lossless/hierarchical raise).
    ``image/gif`` decodes for real — LZW with width growth and table
    reset, interlace, first frame composed onto the logical screen
    (`kernels/gif_codec.py`).  ``image/bmp`` decodes for real —
    uncompressed BI_RGB 8/24/32-bit, bottom-up or top-down
    (`kernels/bmp_codec.py`).  ``audio/wav`` decodes for real too
    (`kernels/wav_codec.py`: RIFF chunk walk, fmt parse, PCM
    8/16/32-bit, IEEE-float, and G.711 mu/A-law expansion).
    ``video/avi`` Motion-JPEG decodes its first frame for real
    (`kernels/avi_codec.py`); other AVI codecs route to the
    header-only geometry probe.  ``video/webm`` VP8 video tracks
    decode a selected key frame for real (`kernels/webm_codec.py`:
    EBML walk, SimpleBlock/BlockGroup, all lacing modes, then the
    same VP8 decoder lossy WebP uses), Motion-JPEG and — via the
    gated libheif bridge — AV1 key frames decode too; audio-only WebM
    decodes its Vorbis track; VP9/Opus route to the probes.
    ``video/mp4`` Motion-JPEG tracks (stsd 'jpeg') decode a selected
    frame through the sample table (`kernels/mp4_parse.py`), and
    av01 / hvc1 / hev1 key frames decode through the same libheif
    bridge using the sample entry's config box; AVC/VP9 route to the
    geometry probe.  So does
    ``audio/flac``
    (`kernels/flac_codec.py`: full lossless decode — rice residuals,
    see also round 5's ``audio/ogg`` Vorbis decode below —
    fixed/LPC predictors, stereo decorrelation, CRC-verified frames).
    ``image/tiff`` decodes for real —
    baseline strip subset (`kernels/tiff_codec.py`: II/MM, 8-bit
    gray/RGB 8/16-bit, none/PackBits/LZW ± horizontal predictor,
    strips, tiles and planar planes) plus new-style JPEG-in-TIFF
    (compression 7 with shared JPEGTables, gray or YCbCr, through the
    real baseline JPEG decoder) and old-style JPEG (compression 6)
    when it carries the JPEGInterchangeFormat whole-stream layout.
    ``image/x-icon`` (favicons) decodes
    for real — embedded-PNG and 1/4/8/24/32-bit DIB entries with AND-
    mask transparency (`kernels/ico_codec.py`), largest entry chosen.
    ``image/heic`` and ``image/avif`` decode for real through the
    system libheif (HEVC via libde265, AV1 via libaom/dav1d) behind a
    dlopen gate (`kernels/heif_native.py`) — absent the library they
    route to the ispe geometry probe as before.
    ``image/webp`` decodes for real — VP8L
    lossless bitstream (`kernels/webp_codec.py`: canonical prefix
    codes, LZ77 + color cache, all four inverse transforms) AND, round
    5, lossy VP8 key frames (`kernels/vp8_codec.py`: boolean coder,
    intra prediction, dequant + inverse DCT/WHT; self-describing
    streams — see that module's interop note); animated WebP falls
    back to the geometry probe.  Every
    other media type still requires
    libraries this container doesn't ship (PIL/ffmpeg/torchaudio) and
    raises NotImplementedError behind the identical signature a production
    deployment would implement; the Spark operator falls back to
    `fake_features` for those.
    """
    if media_type == "image/png":
        from .png_codec import decode_png

        return decode_png(payload)
    if media_type == "image/jpeg":
        from .jpeg_codec import decode_jpeg

        return decode_jpeg(payload)
    if media_type == "image/gif":
        from .gif_codec import decode_gif

        return decode_gif(payload)
    if media_type == "image/bmp":
        from .bmp_codec import decode_bmp

        return decode_bmp(payload)
    if media_type == "image/webp":
        from .webp_codec import decode_webp

        return decode_webp(payload)
    if media_type == "audio/wav":
        from .wav_codec import decode_wav

        return decode_wav(payload)
    if media_type == "audio/flac":
        from .flac_codec import decode_flac

        return decode_flac(payload)
    if media_type == "audio/ogg":
        from .vorbis_codec import decode_vorbis

        return decode_vorbis(payload)
    if media_type == "image/x-icon":
        from .ico_codec import decode_ico

        return decode_ico(payload)
    if media_type == "image/tiff":
        from .tiff_codec import decode_tiff

        return decode_tiff(payload)
    if media_type == "video/avi":
        from .avi_codec import decode_avi

        return decode_avi(payload)
    if media_type == "video/webm":
        from .webm_codec import decode_webm_media

        return decode_webm_media(payload)
    if media_type == "video/mp4":
        from .mp4_parse import decode_mp4

        return decode_mp4(payload)
    if media_type in ("image/heic", "image/avif"):
        from .heif_native import decode_heif

        return decode_heif(payload)
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        f"container (requested: {media_type}); use fake_features for the "
        "deterministic stub path"
    )


def fake_features(payload: bytes, dim: int = 8) -> List[float]:
    """Deterministic content-derived feature vector in [0, 1)."""
    need = dim * 2
    raw = b""
    counter = 0
    while len(raw) < need:
        raw += hashlib.blake2b(
            payload, digest_size=32, salt=counter.to_bytes(8, "little")
        ).digest()
        counter += 1
    return [
        int.from_bytes(raw[2 * i: 2 * i + 2], "little") / 65536.0
        for i in range(dim)
    ]


def fake_resize(payload: bytes, width: int = 16, height: int = 16) -> bytes:
    """Deterministic stand-in for image resize/thumbnailing: evenly-spaced
    byte sampling of the payload down to a ``width*height`` byte grid.

    A production build replaces this with a real decoder+resampler (PIL
    et al.) behind the identical signature; the Spark plumbing observes
    only what this stub already provides — a binary output column with
    declared target dimensions, batch-shaped through the same
    ``mapInPandas`` pass as decode/feature extraction."""
    if not payload:
        return b""
    n = width * height
    if len(payload) <= n:
        return bytes(payload)
    step = len(payload) / n
    return bytes(payload[int(i * step)] for i in range(n))


def fake_frame_sample(payload: bytes, n_frames: int = 4,
                      dim: int = 8) -> List[List[float]]:
    """Deterministic stand-in for video frame sampling: n_frames feature
    vectors derived from evenly-spaced byte windows of the payload."""
    if not payload:
        return []
    step = max(len(payload) // n_frames, 1)
    return [
        fake_features(payload[i * step: (i + 1) * step] or payload, dim)
        for i in range(n_frames)
    ]

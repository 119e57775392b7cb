"""Multimodal columns: opaque binary payloads with typed metadata.

Treats image/audio/video (and PDF/HTML) payloads as `binary` columns and
runs classification + feature extraction as one Arrow-batched `mapInPandas`
pass — the shape a real decode stage would use at 100 TB:

  * `mapInPandas` (not a scalar pandas UDF) so a heavyweight decoder can be
    initialized once per partition and stream Arrow batches through it;
  * input pruning: only (url, html) cross the Arrow boundary;
  * output is a flat typed schema — media_type from magic bytes, size,
    content digest, fixed-dim feature vector — ready for the ANN operators
    (operators/ann.py) downstream.

The decode step itself is stubbed (kernels/media_stub.py): real decoding
raises NotImplementedError in this container; the deterministic fake
features keep every downstream join/partition/ANN path testable.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels.media_stub import (
    fake_features,
    fake_frame_sample,
    fake_resize,
    sniff_media_type,
)

FEATURE_DIM = 8

MEDIA_FEATURES = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("media_type", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("digest", T.StringType(), True),
    T.StructField("features", T.ArrayType(T.FloatType()), True),
])


def media_features(web_pages: DataFrame,
                   dim: int = FEATURE_DIM) -> DataFrame:
    """(url, media_type, n_bytes, digest, features) per payload row."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-partition init hook: a real build constructs its decoder here,
        # once, and reuses it across every Arrow batch of the partition
        for pdf in batches:
            payloads = pdf["html"]
            n = len(pdf)
            out = {
                "url": pdf["url"],
                "media_type": [None] * n,
                "n_bytes": [0] * n,
                "digest": [None] * n,
                "features": [None] * n,
            }
            for i, payload in enumerate(payloads):
                b = bytes(payload) if payload is not None else b""
                out["media_type"][i] = sniff_media_type(b)
                out["n_bytes"][i] = len(b)
                if b:
                    out["digest"][i] = hashlib.blake2b(
                        b, digest_size=16
                    ).hexdigest()
                    out["features"][i] = fake_features(b, dim)
            yield pd.DataFrame(out)

    pruned = web_pages.select("url", "html")
    return pruned.mapInPandas(process, schema=MEDIA_FEATURES)


MEDIA_TRANSFORMED = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("media_type", T.StringType(), False),
    T.StructField("thumb", T.BinaryType(), True),
    T.StructField("thumb_w", T.IntegerType(), False),
    T.StructField("thumb_h", T.IntegerType(), False),
    T.StructField("n_frames", T.IntegerType(), False),
    T.StructField(
        "frame_features", T.ArrayType(T.ArrayType(T.FloatType())), True
    ),
])


def media_transform(web_pages: DataFrame, width: int = 16, height: int = 16,
                    n_frames: int = 4, dim: int = FEATURE_DIM) -> DataFrame:
    """Resize + frame-sample plumbing in one Arrow pass: per payload, a
    resized thumbnail payload and ``n_frames`` per-frame feature
    vectors for video-shaped payloads.  Decodable rows (every format
    `decode_media` handles — round-5 third continuation) get a REAL
    luma thumbnail: decode -> BT.601 luma -> exact box resample to the
    declared grid (the same kernels the perceptual hash is built on);
    undecodable rows keep the deterministic byte-grid stub, so the
    column is always populated.  Same mapInPandas shape as
    `media_features`: decoder state initializes once per partition,
    only (url, html) cross the Arrow boundary, output schema is flat
    and typed (binary thumb + nested float arrays) — the layout a
    downstream training-data writer stores directly as Iceberg
    columns."""
    from ..kernels.media_stub import decode_media
    from ..kernels.phash import downsample, luma_plane

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            out = {
                "url": pdf["url"],
                "media_type": [None] * n,
                "thumb": [None] * n,
                "thumb_w": [width] * n,
                "thumb_h": [height] * n,
                "n_frames": [0] * n,
                "frame_features": [None] * n,
            }
            for i, payload in enumerate(pdf["html"]):
                b = bytes(payload) if payload is not None else b""
                mtype = sniff_media_type(b)
                out["media_type"][i] = mtype
                if not b:
                    continue
                try:
                    dec = decode_media(b, mtype)
                    if not hasattr(dec, "width"):
                        raise ValueError("non-image decode")
                    g = luma_plane(dec.pixels, dec.width, dec.height,
                                   dec.channels)
                    small = downsample(g, width, height)
                    out["thumb"][i] = bytes(
                        v for row in small for v in row)
                except Exception:
                    out["thumb"][i] = fake_resize(b, width, height)
                if mtype.startswith(("video/", "audio/")):
                    frames = fake_frame_sample(b, n_frames, dim)
                else:
                    frames = [fake_features(b, dim)]
                out["n_frames"][i] = len(frames)
                out["frame_features"][i] = frames
            yield pd.DataFrame(out)

    pruned = web_pages.select("url", "html")
    return pruned.mapInPandas(process, schema=MEDIA_TRANSFORMED)


MEDIA_DECODED = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("media_type", T.StringType(), False),
    T.StructField("decoded", T.BooleanType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("channels", T.IntegerType(), True),
    T.StructField("pixel_sum", T.LongType(), True),
    T.StructField("decode_error", T.StringType(), True),
])


def media_decode_stats(web_pages: DataFrame) -> DataFrame:
    """REAL decode over the payload column: per row, the decoded image
    dimensions / channel count / pixel checksum where a real decoder exists
    (PNG, via the stdlib codec), and a routed error string where it does
    not — decode failures become a column, never an executor crash.  Same
    mapInPandas shape as the other media stages (per-partition decoder
    init, (url, html) pruned across the Arrow boundary).

    Where full decode is unavailable but the container header carries its
    own geometry (JPEG SOF / GIF LSD / BMP DIB / WEBP frame header —
    kernels/media_probe.py), width/height/channels are filled from the
    header probe: ``decoded`` stays False (no pixels were produced) and
    ``decode_error`` records 'header-only'.  This is the cheap metadata
    path a 100 TB image-filter stage runs on every row."""
    from ..kernels.media_probe import probe_dimensions
    from ..kernels.media_stub import decode_media

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            out = {
                "url": pdf["url"],
                "media_type": [None] * n,
                "decoded": [False] * n,
                "width": [None] * n,
                "height": [None] * n,
                "channels": [None] * n,
                "pixel_sum": [None] * n,
                "decode_error": [None] * n,
            }
            for i, payload in enumerate(pdf["html"]):
                b = bytes(payload) if payload is not None else b""
                mtype = sniff_media_type(b)
                out["media_type"][i] = mtype
                try:
                    dec = decode_media(b, mtype)
                except Exception as exc:
                    # any failed decode (unsupported process OR corrupt /
                    # scanless payload) falls back to the container
                    # header probe: geometry is often still readable —
                    # the metadata path a 100 TB image-filter stage runs
                    hdr = probe_dimensions(b)
                    if hdr is not None:
                        out["width"][i] = hdr.width
                        out["height"][i] = hdr.height
                        out["channels"][i] = hdr.channels
                        out["decode_error"][i] = "header-only"
                    elif isinstance(exc, NotImplementedError):
                        out["decode_error"][i] = f"unsupported: {exc}"
                    else:  # malformed payload -> routed, never a crash
                        out["decode_error"][i] = f"malformed: {exc}"
                    continue
                if not hasattr(dec, "width"):  # real but non-image decode
                    out["decode_error"][i] = "non-image: use audio stage"
                    continue
                out["decoded"][i] = True
                out["width"][i] = dec.width
                out["height"][i] = dec.height
                out["channels"][i] = dec.channels
                out["pixel_sum"][i] = sum(dec.pixels)
            yield pd.DataFrame(out)

    pruned = web_pages.select("url", "html")
    return pruned.mapInPandas(process, schema=MEDIA_DECODED)


AUDIO_DECODED = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("media_type", T.StringType(), True),
    T.StructField("decoded", T.BooleanType(), False),
    T.StructField("n_channels", T.IntegerType(), True),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("bit_depth", T.IntegerType(), True),
    T.StructField("n_frames", T.LongType(), True),
    T.StructField("abs_sum", T.LongType(), True),
    T.StructField("peak", T.LongType(), True),
    T.StructField("decode_error", T.StringType(), True),
])


def audio_decode_stats(web_pages: DataFrame) -> DataFrame:
    """REAL audio decode over the payload column: per row, the decoded PCM
    parameters (channels / rate / bit depth / frames) plus integer sample
    statistics (sum of |sample|, peak magnitude) where a real decoder
    exists (PCM / IEEE-float / G.711 mu- and A-law WAV via the stdlib
    RIFF codec `kernels/wav_codec.py`;
    FLAC via the full lossless decoder `kernels/flac_codec.py` —
    rice-coded residuals, fixed + LPC predictors, stereo
    decorrelation; round 5 adds Ogg Vorbis — full lossy decode via
    `kernels/vorbis_codec.py`: Ogg framing + CRC, self-describing
    codebooks, floor1, residue, coupling, IMDCT + overlap-add), and a
    routed error string where it does not — MP3 has no decoder (its
    Huffman/synthesis tables are untranscribable offline), but when a
    frame header is present its rate/channels fill in with
    ``decode_error = 'header-only'`` (kernels/media_probe.probe_audio,
    round 5); payloads with neither decoder nor header stay routed,
    never an executor crash.  Same mapInPandas shape
    as the image stage: per-batch decode loop, (url, html) pruned across
    the Arrow boundary.  This is the audio analogue of
    `media_decode_stats`; at 100 TB it is the scan-stage filter that drops
    silent/clipped/truncated audio before any expensive featurization."""
    from ..kernels.media_probe import probe_audio
    from ..kernels.media_stub import decode_media

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            out = {
                "url": pdf["url"],
                "media_type": [None] * n,
                "decoded": [False] * n,
                "n_channels": [None] * n,
                "sample_rate": [None] * n,
                "bit_depth": [None] * n,
                "n_frames": [None] * n,
                "abs_sum": [None] * n,
                "peak": [None] * n,
                "decode_error": [None] * n,
            }
            for i, payload in enumerate(pdf["html"]):
                b = bytes(payload) if payload is not None else b""
                mtype = sniff_media_type(b)
                out["media_type"][i] = mtype
                # video/webm is admitted because WebM doubles as the
                # web's audio container (audio-only WebM / "WebM
                # Audio"): decode_media returns a DecodedWav for those
                # and a video frame otherwise, picked apart below
                if not (mtype.startswith("audio/")
                        or mtype == "video/webm"):
                    out["decode_error"][i] = "not audio"
                    continue
                try:
                    dec = decode_media(b, mtype)
                except NotImplementedError as exc:
                    # round 5: MP3 has no decoder (untranscribable
                    # tables) but its frame header carries rate and
                    # channel mode — the header-only metadata path,
                    # mirroring media_decode_stats' image fallback
                    hdr = probe_audio(b)
                    if hdr is not None:
                        out["n_channels"][i] = hdr.n_channels
                        out["sample_rate"][i] = hdr.sample_rate
                        out["decode_error"][i] = "header-only"
                    else:
                        out["decode_error"][i] = f"unsupported: {exc}"
                    continue
                except Exception as exc:  # malformed payload -> routed
                    out["decode_error"][i] = f"malformed: {exc}"
                    continue
                if hasattr(dec, "width"):  # WebM with a video track
                    out["decode_error"][i] = "not audio"
                    continue
                out["decoded"][i] = True
                out["n_channels"][i] = dec.n_channels
                out["sample_rate"][i] = dec.sample_rate
                out["bit_depth"][i] = dec.bit_depth
                out["n_frames"][i] = dec.n_frames
                out["abs_sum"][i] = sum(abs(s) for s in dec.samples)
                out["peak"][i] = max(
                    (abs(s) for s in dec.samples), default=0)
            yield pd.DataFrame(out)

    pruned = web_pages.select("url", "html")
    return pruned.mapInPandas(process, schema=AUDIO_DECODED)


def media_type_stats(web_pages: DataFrame) -> DataFrame:
    """Per-media-type corpus stats (count, total/avg payload bytes)."""
    feats = media_features(web_pages)
    return feats.groupBy("media_type").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_bytes").alias("total_bytes"),
    ).orderBy("media_type")


def exact_binary_dedup(web_pages: DataFrame) -> DataFrame:
    """Exact payload-level dedup via content digest: one row per digest with
    the lexicographically-smallest url as canonical."""
    feats = media_features(web_pages).filter(F.col("digest").isNotNull())
    return feats.groupBy("digest").agg(
        F.min("url").alias("canonical_url"),
        F.count("*").alias("n_copies"),
    )


IMAGE_HASHES = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("media_type", T.StringType(), True),
    T.StructField("decoded", T.BooleanType(), False),
    T.StructField("phash", T.LongType(), True),
    T.StructField("dhash", T.LongType(), True),
    T.StructField("decode_error", T.StringType(), True),
])


def image_hashes(web_pages: DataFrame) -> DataFrame:
    """Perceptual fingerprints over REAL decoded pixels: (url,
    media_type, decoded, phash, dhash, decode_error).

    Decodes each payload through the real codecs
    (kernels/{jpeg,png,gif,bmp}_codec via media_stub.decode_media) and
    computes the exact-integer DCT perceptual hash (63-bit, always a
    non-negative long) and gradient hash (64-bit, stored as the signed
    two's-complement long) of kernels/phash.py.  Decode failures route
    to ``decode_error`` — never an executor crash.

    Same 100-TB shape as `media_decode_stats`: one Arrow-batched
    mapInPandas pass, (url, html) pruned across the boundary, no
    shuffle — the hash column then feeds the banded near-dup join of
    :func:`image_near_dup`.  The reference (single-document pipeline)
    has no image-dedup analogue; this is the multimodal leg of the
    training-data dedup family (text: MinHash/SimHash in
    operators/dedup.py)."""
    from ..kernels.media_stub import decode_media
    from ..kernels.phash import dhash64, phash63

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            out = {
                "url": pdf["url"],
                "media_type": [None] * n,
                "decoded": [False] * n,
                "phash": [None] * n,
                "dhash": [None] * n,
                "decode_error": [None] * n,
            }
            for i, payload in enumerate(pdf["html"]):
                b = bytes(payload) if payload is not None else b""
                mtype = sniff_media_type(b)
                out["media_type"][i] = mtype
                # frame-decodable video containers are admitted too:
                # a keyframe hash is the video-thumbnail dedup signal
                # (WebM VP8 / AVI MJPEG decode a real frame; audio-only
                # WebM yields a non-image shape and routes below)
                if not (mtype.startswith("image/")
                        or mtype in ("video/webm", "video/avi",
                                     "video/mp4")):
                    out["decode_error"][i] = "not an image"
                    continue
                try:
                    dec = decode_media(b, mtype)
                except Exception as exc:
                    out["decode_error"][i] = f"undecodable: {exc}"
                    continue
                if not hasattr(dec, "width"):
                    out["decode_error"][i] = "not an image"
                    continue
                out["decoded"][i] = True
                out["phash"][i] = phash63(dec.pixels, dec.width,
                                          dec.height, dec.channels)
                dh = dhash64(dec.pixels, dec.width, dec.height,
                             dec.channels)
                out["dhash"][i] = dh - (1 << 64) if dh >= (1 << 63) else dh
            yield pd.DataFrame(out)

    return web_pages.select("url", "html").mapInPandas(
        process, schema=IMAGE_HASHES)


PHASH_BANDS = 9
PHASH_BAND_BITS = 7


def image_near_dup(web_pages: DataFrame,
                   max_hamming: int = 8) -> DataFrame:
    """Perceptual near-duplicate image pairs: (url_a, url_b, phash_a,
    phash_b, hamming), url_a < url_b, hamming <= ``max_hamming``.

    LSH banding over the 63-bit pHash: 9 bands x 7 bits — two hashes
    within Hamming distance d touch at most d bands, so for any
    d <= 8 < 9 at least one band is IDENTICAL (pigeonhole) and the
    band-bucket equi-join is provably COMPLETE for the default
    threshold, never all-pairs.  Shuffle accounting: one explode (9x
    row inflation on the hash relation only — ~17 bytes/row), one
    equi-join on (band, value), one distinct on the (a, b) pair after
    the exact bit_count verify.  At web scale a hot bucket means many
    genuinely near-identical images — exactly the rows the job exists
    to emit.  ``max_hamming`` > 8 falls back to more bands being
    needed; the guard raises rather than silently missing pairs."""
    if max_hamming >= PHASH_BANDS:
        raise ValueError(
            f"banding with {PHASH_BANDS} bands is only complete for "
            f"hamming <= {PHASH_BANDS - 1}; got {max_hamming}")
    from ..lineage import cut

    # pin the hash relation BEFORE the self-join: both join sides would
    # otherwise re-run the decode+hash Arrow pass (the expensive part —
    # the pinned relation is ~25 bytes/row regardless of image size)
    hashes = cut(image_hashes(web_pages)
                 .filter(F.col("decoded"))
                 .select("url", "phash"))
    bands = hashes.select(
        "url", "phash",
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftright(F.col("phash"), PHASH_BAND_BITS * i)
                .bitwiseAND(F.lit((1 << PHASH_BAND_BITS) - 1))
                .alias("val"))
            for i in range(PHASH_BANDS)
        ])).alias("bv"),
    ).select("url", "phash", F.col("bv.band").alias("band"),
             F.col("bv.val").alias("val"))
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.val") == F.col("b.val"))
               & (F.col("a.url") < F.col("b.url")))
        .select(F.col("a.url").alias("url_a"),
                F.col("b.url").alias("url_b"),
                F.col("a.phash").alias("phash_a"),
                F.col("b.phash").alias("phash_b"))
        .distinct()
        .withColumn("hamming", F.bit_count(
            F.col("phash_a").bitwiseXOR(F.col("phash_b"))))
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs


MEDIA_TAGS = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("media_type", T.StringType(), True),
    T.StructField("n_tags", T.IntegerType(), False),
    T.StructField("title", T.StringType(), True),
    T.StructField("artist", T.StringType(), True),
    T.StructField("album", T.StringType(), True),
    T.StructField("date", T.StringType(), True),
    T.StructField("comment", T.StringType(), True),
])


def media_text_tags(web_pages: DataFrame) -> DataFrame:
    """Text metadata riding inside media payloads — ID3v2/ID3v1
    frames, Vorbis comments (Ogg and FLAC), RIFF INFO chunks, PNG
    tEXt/zTXt/iTXt chunks and GIF comment extensions
    (`kernels/media_tags.py`) — surfaced as corpus text columns: at
    100 TB these titles/descriptions join the document text for
    indexing and dedup, the way image alt-text does for pictures.
    Same mapInPandas shape as the decode stages ((url, html) pruned
    across the Arrow boundary, per-batch parse loop, malformed tags
    yield empty columns, never an executor crash)."""
    from ..kernels.media_tags import text_tags

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fields = ("title", "artist", "album", "date", "comment")
        for pdf in batches:
            n = len(pdf)
            out = {"url": pdf["url"],
                   "media_type": [None] * n,
                   "n_tags": [0] * n,
                   **{f: [None] * n for f in fields}}
            for i, payload in enumerate(pdf["html"]):
                b = bytes(payload) if payload is not None else b""
                out["media_type"][i] = sniff_media_type(b)
                tags = text_tags(b)
                out["n_tags"][i] = len(tags)
                for f in fields:
                    if f in tags:
                        out[f][i] = tags[f]
            yield pd.DataFrame(out)

    pruned = web_pages.select("url", "html")
    return pruned.mapInPandas(process, schema=MEDIA_TAGS)

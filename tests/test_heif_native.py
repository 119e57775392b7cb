"""HEIC/AVIF decode through the dlopen-gated libheif binding."""
import pytest

from docling_graph_spark.kernels.heif_native import (
    decode_heif, encode_heif, heif_available)

pytestmark = pytest.mark.skipif(not heif_available(),
                                reason="libheif not loadable")


def _rgb(w, h, seed=1):
    return bytes((x * 3 + y * 2 + c * 5 + seed) % 256
                 for y in range(h) for x in range(w) for c in range(3))


@pytest.mark.parametrize("fmt", ["heic", "avif"])
def test_roundtrip_lossy_close_and_geometry_exact(fmt):
    w, h = 32, 24
    rgb = _rgb(w, h)
    blob = encode_heif(w, h, rgb, fmt=fmt, quality=90)
    dec = decode_heif(blob)
    assert (dec.width, dec.height, dec.channels) == (w, h, 3)
    assert max(abs(a - b) for a, b in zip(dec.pixels, rgb)) <= 32
    # container magic matches the sniffer's typing
    from docling_graph_spark.kernels.media_stub import sniff_media_type

    assert sniff_media_type(blob) == f"image/{fmt}"


@pytest.mark.parametrize("fmt", ["heic", "avif"])
def test_decode_media_routes_heif(fmt):
    from docling_graph_spark.kernels.media_stub import decode_media

    blob = encode_heif(20, 16, _rgb(20, 16, 7), fmt=fmt)
    dec = decode_media(blob, f"image/{fmt}")
    assert (dec.width, dec.height) == (20, 16)
    assert len(dec.pixels) == 20 * 16 * dec.channels


def test_malformed_and_bomb_route_cleanly():
    blob = encode_heif(16, 16, _rgb(16, 16), fmt="avif")
    with pytest.raises(ValueError):
        decode_heif(blob[:40])
    with pytest.raises(ValueError, match="decode guard"):
        decode_heif(blob, max_pixels=16 * 16 - 1)
    with pytest.raises(ValueError):
        decode_heif(b"\x00\x00\x00\x10ftypavif" + b"\x00" * 16)


def test_through_media_decode_stats(spark):
    from docling_graph_spark.operators import multimodal as mm

    blob_h = encode_heif(24, 16, _rgb(24, 16, 3), fmt="heic")
    blob_a = encode_heif(24, 16, _rgb(24, 16, 4), fmt="avif")
    df = spark.createDataFrame(
        [("a.heic", blob_h), ("b.avif", blob_a)],
        "url string, html binary")
    rows = {r.url: r for r in mm.media_decode_stats(df).collect()}
    for url, mt in (("a.heic", "image/heic"), ("b.avif", "image/avif")):
        r = rows[url]
        assert r.media_type == mt
        assert r.decoded and (r.width, r.height) == (24, 16)
        assert r.pixel_sum == sum(
            decode_heif(blob_h if url == "a.heic" else blob_a).pixels)


def test_avif_transcode_pairs_with_jpeg_original(spark):
    """The modern transcode-dedup case: a JPEG and its AVIF/HEIC
    re-encodes of the same pixels land within the pHash near-dup
    threshold and pair in image_near_dup."""
    import numpy as np

    from docling_graph_spark.kernels.jpeg_codec import (
        encode_jpeg_ycbcr420)
    from docling_graph_spark.operators import multimodal as mm

    # realistic size matters: pHash works on a 32x32 downsample, so
    # per-pixel codec noise averages out at 128x96 (at 32x32 input it
    # feeds the DCT directly and distances blow past the threshold)
    import math

    w, h = 128, 96
    rgb = bytes(int(127 + 110 * math.sin((x + 2 * y + c * 9) / 23))
                % 256 for y in range(h) for x in range(w)
                for c in range(3))
    from docling_graph_spark.kernels.vp8_codec import rgb_to_yuv420

    y_, cb, cr = rgb_to_yuv420(w, h, rgb)
    jpg = encode_jpeg_ycbcr420(w, h, y_, cb, cr)
    avif = encode_heif(w, h, rgb, fmt="avif", quality=85)
    heic = encode_heif(w, h, rgb, fmt="heic", quality=85)
    df = spark.createDataFrame(
        [("o.jpg", jpg), ("t.avif", avif), ("t.heic", heic)],
        "url string, html binary")
    hashes = {r.url: r for r in mm.image_hashes(df).collect()}
    assert all(r.decoded for r in hashes.values())
    pairs = {(p.url_a, p.url_b) for p in
             mm.image_near_dup(df, max_hamming=8).collect()}
    assert ("o.jpg", "t.avif") in pairs
    assert ("o.jpg", "t.heic") in pairs


def test_webm_av1_track_decodes_via_bridge():
    """A WebM V_AV1 track (CodecPrivate = av1C content, block =
    temporal unit) decodes end-to-end through the container route and
    the AVIF wrapper to exactly what libheif yields for the
    equivalent AVIF still; through media_decode_stats too."""
    from docling_graph_spark.kernels.mp4_parse import _boxes, _find
    from docling_graph_spark.kernels.webm_codec import (
        decode_webm, encode_webm_vp8)

    w, h = 32, 24
    rgb = _rgb(w, h, 9)
    avif = encode_heif(w, h, rgb, fmt="avif", quality=80)
    want = decode_heif(avif)
    meta = _find(avif, 0, len(avif), (b"meta",))
    av1c = None
    for cc, s, e in _boxes(avif, meta[0] + 4, meta[1]):
        if cc == b"iprp":
            for cc2, s2, e2 in _boxes(avif, s, e):
                if cc2 == b"ipco":
                    for cc3, s3, e3 in _boxes(avif, s2, e2):
                        if cc3 == b"av1C":
                            av1c = avif[s3:e3]
    mdat = _find(avif, 0, len(avif), (b"mdat",))
    obus = avif[mdat[0]:mdat[1]]
    webm = encode_webm_vp8(w, h, [obus], codec=b"V_AV1",
                           codec_private=av1c)
    dec = decode_webm(webm)
    assert dec.codec == "V_AV1"
    assert (dec.width, dec.height) == (w, h)
    assert dec.pixels == want.pixels


def test_webm_av1_through_operator(spark):
    from docling_graph_spark.kernels.mp4_parse import _boxes, _find
    from docling_graph_spark.kernels.webm_codec import (
        decode_webm, encode_webm_vp8)
    from docling_graph_spark.operators import multimodal as mm

    w, h = 24, 16
    avif = encode_heif(w, h, _rgb(w, h, 5), fmt="avif")
    meta = _find(avif, 0, len(avif), (b"meta",))
    av1c = None
    for cc, s, e in _boxes(avif, meta[0] + 4, meta[1]):
        if cc == b"iprp":
            for cc2, s2, e2 in _boxes(avif, s, e):
                if cc2 == b"ipco":
                    for cc3, s3, e3 in _boxes(avif, s2, e2):
                        if cc3 == b"av1C":
                            av1c = avif[s3:e3]
    mdat = _find(avif, 0, len(avif), (b"mdat",))
    webm = encode_webm_vp8(w, h, [avif[mdat[0]:mdat[1]]],
                           codec=b"V_AV1", codec_private=av1c)
    df = spark.createDataFrame([("clip.webm", webm)],
                               "url string, html binary")
    r = mm.media_decode_stats(df).collect()[0]
    assert r.decoded and (r.width, r.height) == (w, h)
    assert r.pixel_sum == sum(decode_webm(webm).pixels)


def _cfg_and_mdat(blob, cfg_cc):
    from docling_graph_spark.kernels.mp4_parse import _boxes, _find

    meta = _find(blob, 0, len(blob), (b"meta",))
    cfg = None
    for cc, s, e in _boxes(blob, meta[0] + 4, meta[1]):
        if cc == b"iprp":
            for cc2, s2, e2 in _boxes(blob, s, e):
                if cc2 == b"ipco":
                    for cc3, s3, e3 in _boxes(blob, s2, e2):
                        if cc3 == cfg_cc:
                            cfg = blob[s3:e3]
    mdat = _find(blob, 0, len(blob), (b"mdat",))
    return cfg, blob[mdat[0]:mdat[1]]


@pytest.mark.parametrize("fmt,entry,cfg_cc", [
    ("avif", b"av01", b"av1C"), ("heic", b"hvc1", b"hvcC")])
def test_mp4_av1_and_hevc_tracks_decode_via_bridge(fmt, entry,
                                                   cfg_cc):
    """MP4 video tracks with av01/hvc1 sample entries decode their
    key frame through the same libheif bridge, pixel-identical to the
    equivalent still."""
    from docling_graph_spark.kernels.mp4_parse import (
        decode_mp4, make_mp4_mjpeg)

    w, h = 32, 24
    rgb = _rgb(w, h, 11)
    still = encode_heif(w, h, rgb, fmt=fmt, quality=80)
    want = decode_heif(still)
    cfg, sample = _cfg_and_mdat(still, cfg_cc)
    assert cfg is not None
    mp4 = make_mp4_mjpeg(w, h, [sample], fmt=entry,
                         config=(cfg_cc, cfg))
    dec = decode_mp4(mp4)
    assert dec.codec == entry.decode()
    assert (dec.width, dec.height) == (w, h)
    assert dec.pixels == want.pixels


@pytest.mark.slow
def test_native_decode_survives_mutations_in_process():
    """Hostile-payload safety of the NATIVE path: mutated AVIF/HEIC
    payloads must surface as heif_error -> ValueError, never crash the
    process (a native segfault would kill a whole executor — verified
    in subprocess isolation during development, 300 trials clean;
    this in-process replay keeps the property pinned)."""
    import random

    rgb = _rgb(32, 24, 2)
    bases = [encode_heif(32, 24, rgb, fmt="avif"),
             encode_heif(32, 24, rgb, fmt="heic")]
    rng = random.Random(99)
    for trial in range(120):
        b = bytearray(rng.choice(bases))
        op = rng.randrange(3)
        if op == 0:
            for _ in range(rng.randrange(1, 8)):
                b[rng.randrange(len(b))] = rng.randrange(256)
        elif op == 1:
            b = b[:rng.randrange(len(b))]
        else:
            i = rng.randrange(len(b) + 1)
            b = b[:i] + bytes(rng.randrange(256)
                              for _ in range(rng.randrange(1, 30))) \
                + b[i:]
        try:
            decode_heif(bytes(b))
        except (ValueError, NotImplementedError):
            pass


@pytest.mark.parametrize("fmt", ["avif", "heic"])
def test_alpha_channel_roundtrip(fmt):
    """RGBA payloads decode with channels=4: alpha byte-exact through
    the lossless path, color within the identity-transform rounding."""
    w, h = 24, 16
    rgba = bytes((x * 3 + y * 2 + c * 5) % 256 if c < 3
                 else (255 if (x + y) % 2 else 128)
                 for y in range(h) for x in range(w) for c in range(4))
    blob = encode_heif(w, h, rgba, fmt=fmt, lossless=True, alpha=True)
    dec = decode_heif(blob)
    assert (dec.width, dec.height, dec.channels) == (w, h, 4)
    d = [abs(a - b) for a, b in zip(dec.pixels, rgba)]
    assert max(d[3::4]) == 0                     # alpha exact
    assert max(x for i, x in enumerate(d) if i % 4 != 3) <= 1

"""Multimodal binary-column plumbing: magic-byte sniffing, stubbed decode,
deterministic fake features, mapInPandas schema/batch shape, binary dedup."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from docling_graph_spark import schemas
from docling_graph_spark.kernels import media_stub
from docling_graph_spark.operators import multimodal


def test_sniff_media_type():
    cases = {
        b"\xff\xd8\xff\xe0rest": "image/jpeg",
        b"\x89PNG\r\n\x1a\nrest": "image/png",
        b"GIF89a...": "image/gif",
        b"RIFF\x00\x00\x00\x00WAVEfmt": "audio/wav",
        b"RIFF\x00\x00\x00\x00AVI LIST": "video/avi",
        b"ID3\x04tag": "audio/mpeg",
        b"OggSpage": "audio/ogg",
        b"fLaChdr": "audio/flac",
        b"%PDF-1.7": "application/pdf",
        b"\x00\x00\x00\x18ftypisomdata": "video/mp4",
        b"<!DOCTYPE html><html>": "text/html",
        b"   <div>x</div>": "text/html",
        b"\x00\x01\x02random": "application/octet-stream",
        b"": "empty",
    }
    for payload, expected in cases.items():
        assert media_stub.sniff_media_type(payload) == expected, payload


def test_decode_media_is_stubbed():
    # formats with no real decoder stay stubbed behind the same seam
    # (round 5: audio/ogg decodes for real now — a malformed Ogg blob
    # is a routed ValueError, not an unsupported format; MP4 walks its
    # sample table for real, so a track-less shell is a ValueError and
    # only codec-infeasible tracks route as unsupported)
    with pytest.raises(ValueError):
        media_stub.decode_media(b"\x00\x00\x00 ftypisom", "video/mp4")
    with pytest.raises(NotImplementedError):
        media_stub.decode_media(b"ID3\x04\x00" + bytes(16),
                                "audio/mpeg")
    with pytest.raises(ValueError):
        media_stub.decode_media(b"OggS....", "audio/ogg")


def test_fake_features_deterministic():
    a = media_stub.fake_features(b"payload", 8)
    b = media_stub.fake_features(b"payload", 8)
    c = media_stub.fake_features(b"other", 8)
    assert a == b and a != c
    assert len(a) == 8 and all(0.0 <= v < 1.0 for v in a)
    frames = media_stub.fake_frame_sample(b"0123456789abcdef", n_frames=4)
    assert len(frames) == 4 and all(len(f) == 8 for f in frames)
    assert media_stub.fake_frame_sample(b"") == []


@pytest.fixture(scope="module")
def media_df(spark):
    ts = datetime.datetime(2024, 1, 1)
    rows = [
        ("u://jpg", ts, b"\xff\xd8\xff\xe0" + b"j" * 100, None, "en"),
        ("u://png", ts, b"\x89PNG\r\n\x1a\n" + b"p" * 50, None, "en"),
        ("u://dup1", ts, b"\xff\xd8\xff\xe0" + b"j" * 100, None, "en"),
        ("u://empty", ts, b"", None, "en"),
        ("u://null", ts, None, None, "en"),
    ]
    return spark.createDataFrame(rows, schema=schemas.WEB_PAGES)


def test_media_features_schema_and_values(media_df):
    feats = multimodal.media_features(media_df)
    assert feats.schema == multimodal.MEDIA_FEATURES
    rows = {r["url"]: r for r in feats.collect()}
    assert len(rows) == 5
    assert rows["u://jpg"]["media_type"] == "image/jpeg"
    assert rows["u://png"]["media_type"] == "image/png"
    assert rows["u://empty"]["media_type"] == "empty"
    assert rows["u://null"]["n_bytes"] == 0 and rows["u://null"]["digest"] is None
    # identical payloads -> identical digest + features across rows/partitions
    assert rows["u://jpg"]["digest"] == rows["u://dup1"]["digest"]
    assert rows["u://jpg"]["features"] == rows["u://dup1"]["features"]
    assert len(rows["u://jpg"]["features"]) == multimodal.FEATURE_DIM


def test_exact_binary_dedup(media_df):
    dd = {r["digest"]: r for r in
          multimodal.exact_binary_dedup(media_df).collect()}
    jpg_digest = [d for d, r in dd.items() if r["n_copies"] == 2]
    assert len(jpg_digest) == 1
    assert dd[jpg_digest[0]]["canonical_url"] == "u://dup1"  # min(url)


def test_fake_resize_kernel():
    # shrinks to the byte grid, deterministic, identity below the target size
    big = bytes(range(256)) * 4
    t1 = media_stub.fake_resize(big, 16, 16)
    t2 = media_stub.fake_resize(big, 16, 16)
    assert t1 == t2 and len(t1) == 256
    small = b"tiny"
    assert media_stub.fake_resize(small, 16, 16) == small
    assert media_stub.fake_resize(b"", 16, 16) == b""


def test_media_transform_schema_and_shapes(spark):
    ts = datetime.datetime(2024, 1, 1)
    avi = b"RIFF\x00\x00\x00\x00AVI " + bytes(range(200))
    rows = [
        ("u://jpg", ts, b"\xff\xd8\xff\xe0" + b"j" * 400, None, "en"),
        ("u://avi", ts, avi, None, "en"),
        ("u://null", ts, None, None, "en"),
    ]
    df = spark.createDataFrame(rows, schema=schemas.WEB_PAGES)
    out = multimodal.media_transform(df, width=8, height=8, n_frames=4)
    assert out.schema == multimodal.MEDIA_TRANSFORMED
    got = {r["url"]: r for r in out.collect()}
    jpg = got["u://jpg"]
    assert jpg["media_type"] == "image/jpeg"
    assert len(jpg["thumb"]) == 64 and jpg["thumb_w"] == 8
    # image payloads get a single feature vector, video gets n_frames
    assert jpg["n_frames"] == 1
    assert len(jpg["frame_features"][0]) == multimodal.FEATURE_DIM
    avi_row = got["u://avi"]
    assert avi_row["media_type"] == "video/avi"
    assert avi_row["n_frames"] == 4 and len(avi_row["frame_features"]) == 4
    assert got["u://null"]["thumb"] is None
    assert got["u://null"]["n_frames"] == 0
    # determinism across runs
    again = {r["url"]: r for r in
             multimodal.media_transform(df, width=8, height=8,
                                        n_frames=4).collect()}
    assert again["u://avi"]["frame_features"] == avi_row["frame_features"]
    assert again["u://jpg"]["thumb"] == jpg["thumb"]


def test_media_features_on_corpus(spark, sf_smoke_dir):
    from docling_graph_spark.sources.web_pages import synthesize_web_pages

    stats = {r["media_type"]: r for r in
             multimodal.media_type_stats(
                 synthesize_web_pages(spark, sf_smoke_dir)).collect()}
    assert set(stats) == {"text/html", "application/pdf"}
    assert stats["application/pdf"]["n_docs"] == 10  # 500 docs, 1 in 50


def test_media_transform_real_thumbnails(spark):
    """Decodable rows get a REAL luma box-resample thumbnail (exactly
    w*h bytes, matching the phash downsample of the decoded pixels);
    undecodable rows keep the deterministic byte-grid stub."""
    from docling_graph_spark.kernels.phash import downsample, luma_plane
    from docling_graph_spark.kernels.png_codec import encode_png_gray
    from docling_graph_spark.operators import multimodal as mm

    gray = bytes((i * 7) % 256 for i in range(24 * 16))
    png = encode_png_gray(24, 16, gray)
    want = bytes(v for row in downsample(
        luma_plane(gray, 24, 16, 1), 8, 8) for v in row)
    html = b"<html><p>not an image at all, just text</p></html>"
    df = spark.createDataFrame(
        [("img.png", png), ("page.html", html)],
        "url string, html binary")
    rows = {r.url: r for r in
            mm.media_transform(df, width=8, height=8).collect()}
    assert bytes(rows["img.png"].thumb) == want
    assert bytes(rows["page.html"].thumb) == media_stub.fake_resize(
        html, 8, 8)

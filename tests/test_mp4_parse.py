"""ISO BMFF tx3g timed-text extraction."""
import struct

import pytest

from docling_graph_spark.kernels.mp4_parse import (
    make_mp4_tx3g, mp4_subtitle_text)


def test_cues_roundtrip_cue_per_paragraph():
    m = make_mp4_tx3g(["first cue", "second cue here", "", "third"])
    assert mp4_subtitle_text(m) == "first cue\n\nsecond cue here\n\nthird"


def test_stsc_multi_sample_chunks_resolve():
    cues = [f"cue {i}" for i in range(7)]
    m = make_mp4_tx3g(cues, per_chunk=3)
    assert mp4_subtitle_text(m) == "\n\n".join(cues)


def test_utf16_bom_sample_decodes():
    m = make_mp4_tx3g(["placeholder"])
    raw = "héllo".encode("utf-16")          # BOM-led UTF-16
    sample = struct.pack(">H", len(raw)) + raw
    old = struct.pack(">H", len("placeholder".encode())) \
        + "placeholder".encode()
    assert old in m
    # same length? pad/truncate not needed if equal; rebuild instead
    m2 = make_mp4_tx3g(["x" * (len(raw))])
    m2 = m2.replace(struct.pack(">H", len(raw)) + b"x" * len(raw),
                    sample)
    assert mp4_subtitle_text(m2) == "héllo"


def test_video_trak_present_and_geometry_probe_intact():
    from docling_graph_spark.kernels.media_probe import probe_dimensions

    m = make_mp4_tx3g(["captioned"], video=(64, 48))
    assert mp4_subtitle_text(m) == "captioned"
    hdr = probe_dimensions(m)
    assert hdr is not None and (hdr.width, hdr.height) == (64, 48)


def test_malformed_never_raises():
    assert mp4_subtitle_text(b"") == ""
    assert mp4_subtitle_text(b"\x00\x00\x00\x08ftypisom") == ""
    assert mp4_subtitle_text(b"\x00" * 64) == ""
    # hostile stsz count is capped, offsets beyond the file skipped
    m = bytearray(make_mp4_tx3g(["ok"]))
    i = m.find(b"stco")
    struct.pack_into(">I", m, i + 12, 1 << 30)   # offset past EOF
    assert mp4_subtitle_text(bytes(m)) == ""


def test_extraction_routes_mp4_captions():
    from docling_graph_spark.operators.extract import _route_payload

    m = make_mp4_tx3g(["spoken words", "more words"], video=(32, 32))
    text, _spans, _n, kind, err = _route_payload(m, None)
    assert kind == "subtitle" and err is None
    assert text == "spoken words\n\nmore words"


def test_stpp_ttml_samples_strip_markup():
    m = make_mp4_tx3g(["spoken ttml line", "second one"],
                      fmt=b"stpp")
    assert mp4_subtitle_text(m) == "spoken ttml line\n\nsecond one"

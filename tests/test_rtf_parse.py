"""RTF extraction (kernels/rtf_parse.py)."""

from docling_graph_spark.kernels.rtf_parse import (
    extract_rtf_text, is_rtf, make_rtf)


def test_rtf_roundtrip_with_escapes():
    paras = ["Plain ASCII paragraph.",
             "Umlauts: äöü and é plus ellipsis…",
             "Braces {and} backslash \\ survive.",
             "Math: π ≈ 3.14159"]
    rtf = make_rtf(paras)
    assert is_rtf(rtf)
    text = extract_rtf_text(rtf)
    for p in paras:
        assert p in text
    # the font table and generator destinations never leak
    assert "Helvetica" not in text and "docling-graph" not in text


def test_rtf_control_semantics():
    doc = (b"{\\rtf1\\ansi line one\\line line two\\par "
           b"cell a\\tab cell b\\par new\\~space}")
    text = extract_rtf_text(doc)
    assert "line one\nline two\n" in text
    assert "cell a\tcell b" in text
    assert "new space" in text


def test_rtf_unicode_fallback_skip():
    # \uc2 means two fallback bytes follow each \uN
    doc = b"{\\rtf1\\uc2 A\\u960 pi B}"
    assert extract_rtf_text(doc) == "Aπ B"
    # negative \uN wraps per spec
    doc = b"{\\rtf1\\uc0 \\u-4064 }"
    assert extract_rtf_text(doc) == chr(65536 - 4064)


def test_rtf_malformed_degrades():
    assert extract_rtf_text(b"{\\rtf1 unterminated group") \
        == "unterminated group"
    assert extract_rtf_text(b"{\\rtf1 \\'zz ok}") == "ok"
    assert isinstance(extract_rtf_text(b"{\\rtf1" + b"\\" * 50 + b"}"),
                      str)


def test_rtf_through_run_pipeline(spark):
    from datetime import datetime

    from docling_graph_spark import schemas
    from docling_graph_spark.pipeline import PipelineConfig, run_pipeline

    rtf = make_rtf(["An RTF memo with enough words to chunk nicely. " * 6])
    pages = spark.createDataFrame(
        [("https://files.example.com/memo.rtf",
          datetime(2026, 1, 3), rtf, None, None)], schemas.WEB_PAGES)
    res = run_pipeline(pages, PipelineConfig(max_tokens=40))
    row = res.extracted.collect()[0]
    assert row.kind == "rtf" and row.error is None
    assert "An RTF memo" in row.text


# ------------------------------------------- subtitles (WebVTT / SRT)

def test_webvtt_and_srt_extraction():
    from docling_graph_spark.kernels.rtf_parse import (
        extract_subtitle_text, is_srt, is_webvtt, make_srt, make_webvtt)

    cues = ["First spoken line.", "Second line, with punctuation!",
            "Third and final line."]
    vtt = make_webvtt(cues)
    assert is_webvtt(vtt) and not is_srt(vtt)
    tv = extract_subtitle_text(vtt)
    for c in cues:
        assert c in tv
    assert "-->" not in tv and "WEBVTT" not in tv
    assert "NOTE" not in tv and "<i>" not in tv

    srt = make_srt(cues)
    assert is_srt(srt) and not is_webvtt(srt)
    ts = extract_subtitle_text(srt)
    for c in cues:
        assert c in ts
    assert "-->" not in ts and "\n1\n" not in ts


def test_subtitle_through_run_pipeline(spark):
    from datetime import datetime

    from docling_graph_spark import schemas
    from docling_graph_spark.kernels.rtf_parse import make_webvtt
    from docling_graph_spark.pipeline import PipelineConfig, run_pipeline

    vtt = make_webvtt([f"Transcript sentence number {i} spoken aloud."
                       for i in range(12)])
    pages = spark.createDataFrame(
        [("https://cdn.example.com/ep1.vtt",
          datetime(2026, 1, 4), vtt, None, None)], schemas.WEB_PAGES)
    res = run_pipeline(pages, PipelineConfig(max_tokens=40))
    row = res.extracted.collect()[0]
    assert row.kind == "subtitle" and row.error is None
    assert "Transcript sentence number 3" in row.text

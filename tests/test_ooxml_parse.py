"""OOXML (DOCX/PPTX/XLSX) extraction — kernels/ooxml_parse.py.

The reference's converter scope includes Office documents
(core/input/types.py routes them); here the ZIP+XML subset extracts
for real with stdlib zipfile + ElementTree, bomb-guarded.
"""

import pytest

from docling_graph_spark.kernels.ooxml_parse import (
    extract_docx_text, extract_ooxml_text, extract_pptx_text,
    extract_xlsx_text, is_ooxml, make_docx, make_pptx, make_xlsx,
    make_zip_bomb, sniff_ooxml_kind)


def test_docx_paragraphs_headings_tables():
    doc = make_docx([
        (1, "Annual Report"),
        "First paragraph of text.",
        (2, "Financials"),
        "Second paragraph, with ümlauts & <angles>.",
        [["cell a", "cell b"], ["cell c", "cell d"]],
    ])
    assert is_ooxml(doc) and sniff_ooxml_kind(doc) == "docx"
    text = extract_docx_text(doc)
    assert "# Annual Report" in text
    assert "## Financials" in text
    assert "First paragraph of text." in text
    assert "ümlauts & <angles>" in text
    assert "cell a\tcell b" in text and "cell c\tcell d" in text
    # heading markers precede their sections in order
    assert text.index("# Annual Report") < text.index("First paragraph")
    assert text.index("## Financials") < text.index("Second paragraph")


def test_pptx_slides_in_numeric_order():
    # 11 slides: lexicographic member order would misplace slide10
    slides = [[f"slide {i} line a", f"slide {i} line b"]
              for i in range(1, 12)]
    p = make_pptx(slides)
    assert sniff_ooxml_kind(p) == "pptx"
    text = extract_pptx_text(p)
    idx = [text.index(f"slide {i} line a") for i in range(1, 12)]
    assert idx == sorted(idx)
    assert "slide 11 line b" in text


def test_xlsx_shared_and_inline_strings():
    x = make_xlsx(["alpha", "beta & gamma"], inline=["inline one"])
    assert sniff_ooxml_kind(x) == "xlsx"
    text = extract_xlsx_text(x)
    assert "alpha" in text and "beta & gamma" in text
    assert "inline one" in text


def test_dispatch_and_plain_zip_routes():
    from docling_graph_spark.kernels.ooxml_parse import _zip_bytes

    d = make_docx(["hello"])
    text, kind, err = extract_ooxml_text(d)
    assert (kind, err) == ("docx", None) and "hello" in text
    plain = _zip_bytes([("readme.txt", "not office")])
    text, kind, err = extract_ooxml_text(plain)
    assert kind == "zip" and err is not None and text == ""
    text, kind, err = extract_ooxml_text(b"PK\x03\x04garbage")
    assert err is not None


def test_zip_bomb_guard_routes_fast():
    import time

    bomb = make_zip_bomb(1 << 28)          # 256 MB of 'A' inflated
    assert len(bomb) < (1 << 21)           # deflates tiny
    t0 = time.time()
    text, kind, err = extract_ooxml_text(bomb)
    assert err is not None and "guard" in err
    assert time.time() - t0 < 10.0


def test_sniff_media_type_refines_zip():
    from docling_graph_spark.kernels.media_stub import sniff_media_type

    assert sniff_media_type(make_docx(["x"])).endswith("document")
    assert sniff_media_type(make_pptx([["x"]])).endswith("presentation")
    assert sniff_media_type(make_xlsx(["x"])).endswith("sheet")
    from docling_graph_spark.kernels.ooxml_parse import _zip_bytes

    assert sniff_media_type(_zip_bytes([("a.txt", "b")])) \
        == "application/zip"


def test_docx_through_run_pipeline(spark):
    """An Office payload flows the whole pipeline: extraction routes by
    magic, text chunks, document + chunk nodes emitted."""
    from docling_graph_spark.pipeline import PipelineConfig, run_pipeline

    doc = make_docx([
        (1, "Quarterly Review"),
        "The quick brown fox jumps over the lazy dog. " * 10,
        (2, "Details"),
        "More content follows in this section with several words. " * 8,
    ])
    from datetime import datetime

    from docling_graph_spark import schemas

    pages = spark.createDataFrame(
        [("https://files.example.com/q.docx",
          datetime(2026, 1, 1), doc, None, None)], schemas.WEB_PAGES)
    res = run_pipeline(pages, PipelineConfig(max_tokens=40))
    ext = res.extracted.collect()
    assert len(ext) == 1
    row = ext[0]
    assert row.kind == "docx" and row.error is None
    assert "Quarterly Review" in row.text
    chunks = res.chunks.collect()
    assert len(chunks) >= 2
    labels = {r.label for r in res.nodes.collect()}
    assert "WebDocument" in labels and "Chunk" in labels


def test_pipeline_mixed_payloads_route_independently(spark):
    from docling_graph_spark.pipeline import PipelineConfig, run_pipeline

    from datetime import datetime

    from docling_graph_spark import schemas

    ts = datetime(2026, 1, 1)
    rows = [
        ("https://a.example.com/x.docx", ts,
         make_docx(["docx words here"]), None, None),
        ("https://b.example.com/page", ts,
         b"<html><body><main><p>html words here</p></main></body></html>",
         None, None),
        ("https://c.example.com/bad.zip", ts, b"PK\x03\x04broken",
         None, None),
    ]
    pages = spark.createDataFrame(rows, schemas.WEB_PAGES)
    res = run_pipeline(pages, PipelineConfig(max_tokens=40))
    by_url = {r.url: r for r in res.extracted.collect()}
    assert by_url["https://a.example.com/x.docx"].kind == "docx"
    assert "docx words" in by_url["https://a.example.com/x.docx"].text
    assert by_url["https://b.example.com/page"].kind == "html"
    # the malformed zip yields no text: filtered by the P1 empty-text
    # gate (never a crash); if surfaced, it must carry its error
    bad = by_url.get("https://c.example.com/bad.zip")
    assert bad is None or (bad.kind == "zip" and bad.error is not None)


# ------------------------------------------------- ODF + EPUB (r5)

def test_odt_paragraphs_headings_tables():
    from docling_graph_spark.kernels.ooxml_parse import (
        extract_odf_text, make_odt, sniff_zip_kind)

    odt = make_odt([
        (1, "Project Plan"),
        "Opening paragraph.",
        [["r1c1", "r1c2"], ["r2c1", "r2c2"]],
        (2, "Phase Two"),
        "Closing paragraph with ümlauts & <angles>.",
    ])
    assert sniff_zip_kind(odt) == "odt"
    text = extract_odf_text(odt)
    assert "# Project Plan" in text and "## Phase Two" in text
    assert "Opening paragraph." in text
    assert "r1c1\tr1c2" in text and "r2c1\tr2c2" in text
    # table cell paragraphs appear ONLY in their row, not standalone
    assert text.count("r1c1") == 1
    assert "ümlauts & <angles>" in text


def test_epub_spine_order_and_boilerplate_strip():
    from docling_graph_spark.kernels.ooxml_parse import (
        extract_epub_text, make_epub, sniff_zip_kind)

    chapters = [f"Chapter {i} body text with several words inside."
                for i in range(1, 5)]
    ep = make_epub(chapters, with_opf=True)
    assert sniff_zip_kind(ep) == "epub"
    text = extract_epub_text(ep)
    # spine restores order despite reversed member order
    idx = [text.index(f"Chapter {i} body") for i in range(1, 5)]
    assert idx == sorted(idx)
    # the per-chapter nav/footer boilerplate is stripped by the
    # main-content extractor
    assert "copyright notice" not in text
    # no-OPF fallback still extracts
    text2 = extract_epub_text(make_epub(chapters[:2], with_opf=False))
    assert "Chapter 1 body" in text2 and "Chapter 2 body" in text2


def test_odf_epub_through_dispatch_and_sniff():
    from docling_graph_spark.kernels.media_stub import sniff_media_type
    from docling_graph_spark.kernels.ooxml_parse import (
        extract_ooxml_text, make_epub, make_odt)

    odt = make_odt(["odt body"])
    text, kind, err = extract_ooxml_text(odt)
    assert (kind, err) == ("odt", None) and "odt body" in text
    assert sniff_media_type(odt) == \
        "application/vnd.oasis.opendocument.text"
    ep = make_epub(["epub body words"])
    text, kind, err = extract_ooxml_text(ep)
    assert (kind, err) == ("epub", None) and "epub body words" in text
    assert sniff_media_type(ep) == "application/epub+zip"


def test_odt_through_run_pipeline(spark):
    from datetime import datetime

    from docling_graph_spark import schemas
    from docling_graph_spark.kernels.ooxml_parse import make_odt
    from docling_graph_spark.pipeline import PipelineConfig, run_pipeline

    odt = make_odt([
        (1, "Meeting Notes"),
        "Decisions were made about the roadmap and the team. " * 6,
    ])
    pages = spark.createDataFrame(
        [("https://files.example.com/notes.odt",
          datetime(2026, 1, 2), odt, None, None)], schemas.WEB_PAGES)
    res = run_pipeline(pages, PipelineConfig(max_tokens=40))
    row = res.extracted.collect()[0]
    assert row.kind == "odt" and row.error is None
    assert "Meeting Notes" in row.text

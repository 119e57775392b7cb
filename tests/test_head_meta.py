"""Head-metadata extraction (operators/metadata.head_meta*) and the
with_head_meta corpus variant."""

import pytest
from pyspark.sql import functions as F

from docling_graph_spark.operators import metadata as op_md
from docling_graph_spark.sources.web_pages import synthesize_web_pages


def test_head_metadata_extraction_unit(spark):
    html = (b'<html><head><title>t</title>'
            b'<meta property="article:published_time" '
            b'content="2021-03-04T00:00:00Z">'
            b'<meta name="author" content="Author 7">'
            b'<link rel="canonical" href="https://h/x"></head>'
            b'<body></body></html>')
    pages = spark.createDataFrame(
        [("https://h/x", html), ("https://h/y", b"<html></html>"),
         ("https://h/z", None)],
        "url string, html binary")
    got = {r["url"]: (r["published"], r["author"], r["canonical"])
           for r in op_md.head_metadata(pages).collect()}
    assert got["https://h/x"] == ("2021-03-04T00:00:00Z", "Author 7",
                                  "https://h/x")
    # absent fields and NULL payloads yield '' (no-NULL contract)
    assert got["https://h/y"] == ("", "", "")
    assert got["https://h/z"] == ("", "", "")


def test_head_meta_stats_canonical_split(spark):
    meta = (b'<head><link rel="canonical" href="https://h/other"></head>')
    pages = spark.createDataFrame(
        [("https://h/self", "en",
          b'<head><link rel="canonical" href="https://h/self"></head>'),
         ("https://h/dup", "en", meta)],
        "url string, lang string, html binary")
    [r] = op_md.head_meta_stats(pages).collect()
    assert (r["n_canonical_self"], r["n_canonical_other"]) == (1, 1)
    assert r["n_published"] == 0 and r["published_checksum"] == 0


def test_variant_preserves_extraction_byte_parity(spark, sf_smoke_dir):
    """Head markup must not leak into extracted main content."""
    from docling_graph_spark.kernels.html_main import extract_main_content

    pages = synthesize_web_pages(spark, sf_smoke_dir, with_head_meta=True,
                                 with_pdf_rows=False)
    bad = pages.select(
        "text",
        F.col("html").cast("string").alias("s"),
    ).filter(F.col("s").contains("published_time")).limit(3).collect()
    assert bad, "variant should actually carry the meta markup"
    for row in bad:
        assert extract_main_content(row["s"]).text == row["text"]


def test_default_corpus_unchanged(spark, sf_smoke_dir):
    """with_head_meta defaults off: round-1 oracles stay byte-identical."""
    plain = synthesize_web_pages(spark, sf_smoke_dir)
    n = plain.filter(
        F.col("html").cast("string").contains("published_time")).count()
    assert n == 0


def test_coverage_fractions(spark, sf_smoke_dir):
    pages = synthesize_web_pages(spark, sf_smoke_dir, with_head_meta=True,
                                 with_pdf_rows=False)
    [r] = op_md.head_meta_stats(pages).agg(
        F.sum("n_published").alias("p"),
        F.sum("n_canonical_self").alias("cs"),
        F.sum("n_canonical_other").alias("co"),
    ).collect() or [None]
    total = pages.count()
    # 6/7 published, ~1/11 consolidating canonicals
    assert abs(r["p"] / total - 6 / 7) < 0.02
    assert (r["cs"] + r["co"]) == total
    assert abs(r["co"] / total - 1 / 11) < 0.02

"""Page metadata extraction (operators/metadata.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from docling_graph_spark.operators import metadata
from docling_graph_spark.plans import python_eval_nodes


def test_fields_and_non_html_rows(spark):
    rows = [
        ("u1", b'<html lang="en"><head><title>Hi there</title></head>'
               b'<body><h1>Head</h1><a href="/a">A</a>'
               b'<a href="https://x.com/b">B</a></body></html>'),
        ("u2", b"%PDF-1.4 not html at all"),
        ("u3", b'<html><body>no title, no links</body></html>'),
        ("u4", None),  # failed fetch: NULL payload must not yield NULLs
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r["url"]: r for r in metadata.page_metadata(df).collect()}
    assert got["u4"]["title"] == "" and got["u4"]["n_links"] == 0
    assert got["u4"]["html_lang"] == "" and got["u4"]["h1"] == ""
    assert got["u1"]["title"] == "Hi there"
    assert got["u1"]["html_lang"] == "en"
    assert got["u1"]["h1"] == "Head"
    assert got["u1"]["n_links"] == 2
    assert got["u2"]["title"] == "" and got["u2"]["n_links"] == 0
    assert got["u3"]["html_lang"] == "" and got["u3"]["n_links"] == 0


def test_stats_rollup(spark):
    rows = [
        ("u1", "en", b'<html lang="en"><title>t</title><a href="/x">x</a></html>'),
        ("u2", "en", b'<html lang="fr"><title>tt</title></html>'),
        ("u3", "de", b"%PDF-1.4"),
    ]
    df = spark.createDataFrame(rows, "url string, lang string, html binary")
    got = {r["lang"]: r for r in metadata.metadata_stats(df).collect()}
    assert got["en"]["n_pages"] == 2
    assert got["en"]["n_with_title"] == 2
    assert got["en"]["title_chars"] == 3
    assert got["en"]["n_lang_match"] == 1
    assert got["en"]["total_links"] == 1
    assert got["de"]["n_with_title"] == 0


def test_pure_jvm(spark):
    df = spark.createDataFrame([("u", "en", b"<html></html>")],
                               "url string, lang string, html binary")
    assert python_eval_nodes(metadata.metadata_stats(df)) == []

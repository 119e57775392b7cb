"""Sitemap build/parse/coverage (operators/sitemaps.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from docling_graph_spark.operators import sitemaps as op_sm


def _entries(spark, rows):
    df = spark.createDataFrame(
        rows, "host string, ord long, url string, lastmod string")
    return df.select(
        "host", "ord",
        op_sm.sitemap_entry(F.col("url"), F.col("lastmod")).alias("entry"))


def test_build_orders_entries_deterministically(spark):
    ent = _entries(spark, [
        ("h", 2, "https://h/b", "2023-02-02"),
        ("h", 1, "https://h/a", "2023-01-01"),
    ])
    [row] = op_sm.build_sitemaps(ent).collect()
    xml = row["xml"]
    assert xml.startswith('<?xml version="1.0"')
    assert xml.index("https://h/a") < xml.index("https://h/b")  # ord order
    assert xml.endswith("</urlset>")


def test_parse_zips_loc_with_lastmod(spark):
    ent = _entries(spark, [
        ("h", 1, "https://h/a", "2023-01-01"),
        ("h", 2, "https://h/b", "2023-02-02"),
        ("g", 1, "https://g/only", "2024-05-06"),
    ])
    parsed = op_sm.parse_sitemaps(op_sm.build_sitemaps(ent))
    got = {(r["host"], r["loc"]): r["lastmod"] for r in parsed.collect()}
    assert got == {
        ("h", "https://h/a"): "2023-01-01",
        ("h", "https://h/b"): "2023-02-02",
        ("g", "https://g/only"): "2024-05-06",
    }


def test_coverage_classification(spark):
    parsed = spark.createDataFrame(
        [("h", "https://h/a", "2023-01-01"),
         ("h", "https://h/ghost", "2023-01-02"),
         ("g", "https://g/b", "2023-01-03")],
        "host string, loc string, lastmod string")
    crawled = spark.createDataFrame(
        [("https://h/a",), ("https://g/b",), ("https://g/unlisted",)],
        "url string")
    [r] = op_sm.sitemap_coverage(parsed, crawled).collect()
    assert r["n_hosts"] == 2 and r["n_sitemap_urls"] == 3
    assert r["n_listed_crawled"] == 2
    assert r["n_ghost"] == 1
    assert r["n_crawled_unlisted"] == 1
    assert r["lastmod_checksum"] > 0

"""schema.org JSON-LD mining (operators/structdata.py) and the
with_ld_json corpus variant."""

import pytest
from pyspark.sql import functions as F

from docling_graph_spark.operators import structdata as op_sd
from docling_graph_spark.sources.web_pages import synthesize_web_pages


def test_block_isolation_and_nested_price(spark):
    html = (b'<html><head><script type="application/ld+json">'
            b'{"@context":"https://schema.org","@type":"Product",'
            b'"name":"x","offers":{"@type":"Offer","price":"12.05",'
            b'"priceCurrency":"USD"}}</script>'
            b'<script type="application/ld+json">'
            b'{"@type":"Article","headline":"y","wordCount":42}'
            b'</script></head><body></body></html>')
    pages = spark.createDataFrame(
        [("en", html), ("en", b"<html></html>"), ("de", None)],
        "lang string, html binary")
    rows = {r["lang"]: r for r in
            op_sd.structured_data_stats(pages).collect()}
    en = rows["en"]
    assert en["n_ld_blocks"] == 2 and en["n_ld_pages"] == 1
    assert en["n_ld_types"] == 2
    assert en["ld_wordcount_sum"] == 42
    assert en["ld_price_cents"] == 1205  # exact integer cents
    # NULL-payload lang reports all zeros, never NULL
    de = rows["de"]
    assert (de["n_ld_blocks"], de["n_ld_types"],
            de["ld_price_cents"]) == (0, 0, 0)


def test_malformed_json_counted_not_thrown(spark):
    pages = spark.createDataFrame(
        [("en", b'<script type="application/ld+json">{not json'
                b'</script>')],
        "lang string, html binary")
    [r] = op_sd.structured_data_stats(pages).collect()
    # the block is seen but parses to NULL fields
    assert r["n_ld_blocks"] == 1 and r["n_ld_types"] == 0
    assert r["ld_type_checksum"] == 0 and r["ld_wordcount_sum"] == 0


def test_variant_preserves_extraction_byte_parity(spark, sf_smoke_dir):
    """JSON-LD head markup must not leak into extracted main content."""
    from docling_graph_spark.kernels.html_main import extract_main_content

    pages = synthesize_web_pages(spark, sf_smoke_dir, with_ld_json=True,
                                 with_pdf_rows=False)
    rich = pages.select(
        "text", F.col("html").cast("string").alias("s"),
    ).filter(F.col("s").contains("ld+json")).limit(3).collect()
    assert rich, "variant should actually carry JSON-LD blocks"
    for row in rich:
        assert extract_main_content(row["s"]).text == row["text"]


def test_default_corpus_unchanged(spark, sf_smoke_dir):
    """with_ld_json defaults off: earlier oracles stay byte-identical."""
    plain = synthesize_web_pages(spark, sf_smoke_dir)
    assert plain.filter(
        F.col("html").cast("string").contains("ld+json")).count() == 0


def test_coverage_gap(spark, sf_smoke_dir):
    """doc_id % 4 == 3 rows carry no block; every other HTML row does."""
    pages = synthesize_web_pages(spark, sf_smoke_dir, with_ld_json=True,
                                 with_pdf_rows=False)
    docs = spark.read.parquet(f"{sf_smoke_dir}/documents.parquet")
    n_docs = docs.count()
    n_expect = docs.filter(F.col("doc_id") % 4 != 3).count()
    [r] = op_sd.structured_data_stats(pages).agg(
        F.sum("n_ld_pages").alias("p"), F.sum("n_ld_blocks").alias("b"),
    ).collect()
    assert r["p"] == r["b"] == n_expect < n_docs


def test_variant_path_equals_from_json_path(spark, sf_smoke_dir):
    """Spark 4 VARIANT (try_parse_json + try_variant_get) computes the
    identical rollup to the schema-imposing from_json path — one parse
    serving every projection is the open-content-model scale win."""
    pages = synthesize_web_pages(spark, sf_smoke_dir, with_ld_json=True)
    a = {tuple(r) for r in op_sd.structured_data_stats(pages).collect()}
    b = {tuple(r) for r in
         op_sd.structured_data_stats_variant(pages).collect()}
    assert a == b and len(a) >= 3


def test_variant_path_handles_malformed_blocks(spark):
    html = (b'<html><script type="application/ld+json">{not json'
            b'</script><script type="application/ld+json">'
            b'{"@type":"Article","wordCount":7}</script></html>')
    pages = spark.createDataFrame(
        [("en", html)], "lang string, html binary")
    [r] = op_sd.structured_data_stats_variant(pages).collect()
    assert r["n_ld_blocks"] == 2          # both blocks isolated
    assert r["n_ld_types"] == 1           # malformed one parses to NULL
    assert r["ld_wordcount_sum"] == 7

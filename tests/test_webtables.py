"""Web-table extraction (operators/webtables.py) + the with_tables corpus
variant (sources/web_pages.py:aside_tables_expr)."""

from __future__ import annotations

from pyspark.sql import functions as F

from docling_graph_spark.operators import webtables
from docling_graph_spark.plans import python_eval_nodes

DATA_TBL = (
    b'<table id="s"><tr><th>metric</th><th>value</th><th>unit</th></tr>'
    b"<tr><td>m1</td><td>42</td><td>u0</td></tr>"
    b"<tr><td>m2</td><td>58</td><td>u1</td></tr></table>"
)
NAV_TBL = (
    b'<table class="nav"><tr><td><a href="/a">A</a></td>'
    b'<td><a href="/b">B</a></td></tr></table>'
)


def test_per_table_fields(spark):
    rows = [
        ("u1", b"<html><body>" + DATA_TBL + NAV_TBL + b"</body></html>"),
        ("u2", b"%PDF-1.4 binary payload, no tables"),
        ("u3", None),  # failed fetch
        ("u4", b"<html><body><p>tableless page</p></body></html>"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = webtables.page_tables(df).collect()
    # only u1 carries tables; zero-table pages drop out at the explode
    assert {r["url"] for r in got} == {"u1"}
    by_idx = {r["table_idx"]: r for r in got}
    data, nav = by_idx[0], by_idx[1]
    assert data["n_rows"] == 3 and data["n_cols"] == 3
    assert data["n_cells"] == 9 and data["n_header_cells"] == 3
    assert data["n_link_cells"] == 0 and data["is_data"]
    assert data["value_sum"] == 100  # 42 + 58; non-numeric cells -> 0
    assert nav["n_rows"] == 1 and nav["n_link_cells"] == 2
    assert not nav["is_data"]


def test_stats_rollup(spark):
    rows = [
        ("u1", "en", b"<html>" + DATA_TBL + b"</html>"),
        ("u2", "en", b"<html>" + NAV_TBL + b"</html>"),
        ("u3", "en", b"<html><p>none</p></html>"),
        ("u4", "de", b"%PDF-1.4"),
    ]
    df = spark.createDataFrame(rows, "url string, lang string, html binary")
    got = {r["lang"]: r for r in webtables.web_table_stats(df).collect()}
    en = got["en"]
    assert en["n_pages_with_tables"] == 2
    assert en["n_tables"] == 2
    assert en["n_data_tables"] == 1 and en["n_layout_tables"] == 1
    assert en["total_rows"] == 4 and en["total_cells"] == 11
    assert en["tbl_value_sum"] == 100
    # langs with zero tables still report a (all-zero) row
    de = got["de"]
    assert de["n_tables"] == 0 and de["n_pages_with_tables"] == 0


def test_pure_jvm(spark):
    df = spark.createDataFrame([("u", "en", b"<html></html>")],
                               "url string, lang string, html binary")
    assert python_eval_nodes(webtables.web_table_stats(df)) == []


def test_single_pass_plan(spark):
    """The rollup is one scan + one partial/final aggregation — no explode
    self-join, no second pass for the pages-with-tables count."""
    from docling_graph_spark.plans import formatted_plan

    df = spark.createDataFrame([("u", "en", b"<html></html>")],
                               "url string, lang string, html binary")
    plan = formatted_plan(webtables.web_table_stats(df))
    assert "Join" not in plan and "Generate" not in plan
    # exactly two Exchanges: the groupBy hash partitioning + orderBy range
    assert plan.count("+- Exchange") <= 2


def test_tables_corpus_keeps_extraction_byte_parity(spark, sf_smoke_dir):
    """The with_tables variant plants all tables inside the boilerplate
    sidebar, so main-content extraction must still reproduce the ground
    truth text byte-for-byte (td/th are BLOCK_TAGS: a content-positioned
    table could outscore a short doc's article and change the winner)."""
    from docling_graph_spark.kernels.html_main import extract_main_content
    from docling_graph_spark.sources.web_pages import synthesize_web_pages

    rows = (
        synthesize_web_pages(spark, sf_smoke_dir, with_tables=True)
        .filter(~F.col("html").cast("string").startswith("%PDF"))
        .select("url", "html", "text")
        .collect()
    )
    assert rows
    for r in rows:
        assert extract_main_content(bytes(r["html"])).text == r["text"], r["url"]


def test_default_corpus_unchanged(spark, sf_smoke_dir):
    """with_tables=False must be byte-identical to the pre-variant corpus
    (every round-1 oracle hash depends on it)."""
    from docling_graph_spark.sources.web_pages import synthesize_web_pages

    base = synthesize_web_pages(spark, sf_smoke_dir)
    tabled = synthesize_web_pages(spark, sf_smoke_dir, with_tables=True)
    n_diff = (
        base.select("url", F.crc32(F.col("html")).alias("c"))
        .join(
            tabled.select("url", F.crc32(F.col("html")).alias("c2")), "url"
        )
        .filter("c <> c2")
        .count()
    )
    # every HTML page differs under with_tables=True...
    assert n_diff > 0
    # ...but PDF payload rows are identical in both variants
    pdf_diff = (
        base.filter(F.col("html").cast("string").startswith("%PDF"))
        .select("url", F.crc32(F.col("html")).alias("c"))
        .join(
            tabled.select("url", F.crc32(F.col("html")).alias("c2")), "url"
        )
        .filter("c <> c2")
        .count()
    )
    assert pdf_diff == 0

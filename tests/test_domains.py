"""Registrable-domain (eTLD+1) extraction (operators/domains.py)."""

import pytest
from pyspark.sql import functions as F

from docling_graph_spark.operators import domains as op_dom


@pytest.fixture(scope="module")
def extracted(spark):
    hosts = [
        "www.bbc.co.uk",          # multi-label suffix beats bare "uk"
        "news.bbc.co.uk",         # same registrable as above
        "a.blogspot.com",         # generic TLD
        "example.com",            # registrable IS the host
        "cdn.eu.site5.ac.jp",     # deep subdomain chain
        "single.internal",        # unknown TLD -> '*' fallback
        "com",                    # bare suffix -> no registrable
    ]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    rows = df.select(
        "host",
        op_dom.public_suffix(F.col("host")).alias("suffix"),
        op_dom.registrable_domain(F.col("host")).alias("reg"),
    ).collect()
    return {r["host"]: (r["suffix"], r["reg"]) for r in rows}


def test_multi_label_suffix_wins(extracted):
    assert extracted["www.bbc.co.uk"] == ("co.uk", "bbc.co.uk")
    assert extracted["news.bbc.co.uk"] == ("co.uk", "bbc.co.uk")


def test_generic_tld(extracted):
    assert extracted["a.blogspot.com"] == ("com", "blogspot.com")
    assert extracted["example.com"] == ("com", "example.com")


def test_deep_subdomain(extracted):
    assert extracted["cdn.eu.site5.ac.jp"] == ("ac.jp", "site5.ac.jp")


def test_unknown_tld_fallback(extracted):
    assert extracted["single.internal"] == ("internal",
                                            "single.internal")


def test_bare_suffix_has_no_registrable(extracted):
    assert extracted["com"] == ("com", None)


def test_domain_stats_collapse(spark):
    df = spark.createDataFrame(
        [("www.bbc.co.uk",), ("news.bbc.co.uk",), ("bbc.co.uk",)],
        "host string")
    [r] = op_dom.domain_stats(df).collect()
    assert (r["suffix"], r["n_rows"], r["n_hosts"],
            r["n_registrable"]) == ("co.uk", 3, 3, 1)


def test_multi_label_bare_suffix_has_no_registrable(spark):
    df = spark.createDataFrame([("co.uk",), ("ac.jp",)], "host string")
    rows = df.select(
        "host",
        op_dom.public_suffix(F.col("host")).alias("suffix"),
        op_dom.registrable_domain(F.col("host")).alias("reg"),
    ).collect()
    got = {r["host"]: (r["suffix"], r["reg"]) for r in rows}
    assert got["co.uk"] == ("co.uk", None)
    assert got["ac.jp"] == ("ac.jp", None)


# ---------------------------------------------------------------------------
# SURT keys / CDX rollup
# ---------------------------------------------------------------------------


def test_surt_key_transform(spark):
    from docling_graph_spark.operators import domains as dom

    df = spark.createDataFrame([
        ("https://www.News.Example.com/a/b",),
        ("https://cdn.eu.site5.co.uk/p/7",),
        ("http://example.com",),
        ("https://site0.internal/x",),
    ], "url string")
    got = [r["k"] for r in
           df.select(dom.surt_key(F.col("url")).alias("k")).collect()]
    assert got == [
        "com,example,news)/a/b",      # www dropped, lowercased, reversed
        "uk,co,site5,eu,cdn)/p/7",    # deep subdomain fully reversed
        "com,example)/",              # bare host -> '/' path
        "internal,site0)/x",
    ]


def test_cdx_stats_counts(spark):
    from docling_graph_spark.operators import domains as dom

    df = spark.createDataFrame([
        ("https://www.a.com/x",), ("https://a.com/x",),   # same SURT key
        ("https://b.com/y",), ("https://sub.b.com/z",),   # same 2-prefix
    ], "url string")
    [r] = dom.cdx_stats(df).collect()
    assert r["n_urls"] == 4
    assert r["n_keys"] == 3            # www.a.com/x collapses onto a.com/x
    assert r["n_www_dropped"] == 1
    assert r["n_prefix2"] == 2         # com,a and com,b


def test_surt_bare_www_host_keeps_label(spark):
    """A host that IS just 'www' keeps its only label (dropping it would
    leave an empty key), and the www counter matches the transform's
    actual drop condition."""
    from docling_graph_spark.operators import domains as dom

    df = spark.createDataFrame(
        [("https://www/x",), ("https://www.a.com/y",)], "url string")
    keys = [r["k"] for r in
            df.select(dom.surt_key(F.col("url")).alias("k")).collect()]
    assert keys == ["www)/x", "com,a)/y"]
    [r] = dom.cdx_stats(df).collect()
    assert r["n_www_dropped"] == 1      # only www.a.com actually dropped

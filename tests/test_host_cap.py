"""Per-host document cap (operators/textprep.host_cap_sample): the
skew-aware two-stage top-K must equal the single-window answer exactly,
enforce the cap, and be partitioning-invariant."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from docling_graph_spark.operators import textprep


@pytest.fixture(scope="module")
def pages(spark):
    # one mega-host (400 urls), a mid host (30), a tail of singletons
    rows = (
        [(f"https://mega.example.com/p{i}",) for i in range(400)]
        + [(f"https://mid.example.com/p{i}",) for i in range(30)]
        + [(f"https://t{i}.example.com/",) for i in range(25)]
    )
    return spark.createDataFrame(rows, "url string")


def _single_window(pages, k):
    host = F.parse_url(F.col("url"), F.lit("HOST"))
    key = F.md5(F.concat(F.lit("dghostcap"), F.col("url")))
    w = Window.partitionBy("host").orderBy("k", "url")
    return (
        pages.select("url", host.alias("host"), key.alias("k"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def test_equals_single_window_answer(spark, pages):
    got = {(r["url"], r["host_rank"])
           for r in textprep.host_cap_sample(pages, k=8).collect()}
    want = {(r["url"], r["rn"])
            for r in _single_window(pages, 8).collect()}
    assert got == want


def test_cap_enforced_and_tail_untouched(spark, pages):
    kept = textprep.host_cap_sample(pages, k=8)
    per_host = {r["host"]: r["n"]
                for r in kept.groupBy("host").agg(
                    F.count("*").alias("n")).collect()}
    assert per_host["mega.example.com"] == 8
    assert per_host["mid.example.com"] == 8
    assert sum(1 for h in per_host if h.startswith("t")) == 25


def test_partitioning_invariant(spark, pages):
    a = sorted(r["url"] for r in
               textprep.host_cap_sample(pages, k=5).collect())
    b = sorted(r["url"] for r in
               textprep.host_cap_sample(pages.repartition(13), k=5,
                                        n_salts=4).collect())
    assert a == b


def test_stats_shape(spark, pages):
    row = textprep.host_cap_stats(pages, k=8).collect()[0]
    assert row["total_docs"] == 455
    assert row["kept_docs"] == 8 + 8 + 25
    assert row["n_hosts"] == 27
    assert row["hosts_at_cap"] == 2
    assert row["max_host_docs"] == 400
    assert row["max_kept_docs"] == 8


def test_reserved_column_conflict_raises(spark, pages):
    with pytest.raises(ValueError, match="host"):
        textprep.host_cap_sample(
            pages.withColumn("host", F.lit("x")), k=3)


def test_junk_urls_do_not_abort(spark):
    df = spark.createDataFrame(
        [("https://ok.example.com/a",), ("not a url at all",),
         ("https://ok.example.com/b",)], "url string")
    row = textprep.host_cap_stats(df, k=1).collect()[0]
    assert row["total_docs"] == 3
    # junk url groups under the NULL host and is capped like any host
    assert row["kept_docs"] == 2

"""Deequ-style data-quality suite (operators/dataquality.py): every
check type against hand-built rows with planted violations, the
single-pass plan contract, and the referential orphan counter."""

from __future__ import annotations

from pyspark.sql import functions as F

from docling_graph_spark.operators import dataquality as dq


def _df(spark):
    rows = [
        (1, "hello", "en", 5),
        (1, None, "en", 3),            # dup id + null text
        (2, "   ", "xx", 2),           # blank text + bad lang
        (3, "ok", "de", 999999),       # range violation
        (4, "mismatch", "fr", 7),      # n_chars != len(text)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long")


def test_all_row_checks_count_planted_violations(spark):
    row = dq.run_checks(
        _df(spark),
        dq.completeness("text"),
        dq.uniqueness("doc_id"),
        dq.membership("lang", ["en", "de", "fr"]),
        dq.in_range("n_chars", 0, 100),
        dq.consistency(
            "n_chars_mismatch",
            F.col("n_chars")
            != F.length(F.coalesce(F.col("text"), F.lit("")))),
    ).collect()[0]
    assert row["n_rows"] == 5
    assert row["text_missing"] == 2
    assert row["doc_id_dupes"] == 1
    assert row["lang_domain_viol"] == 1
    assert row["n_chars_range_viol"] == 1
    # planted: (1,None,3), ("   " len 3 != 2), (999999), ("mismatch" 8 != 7)
    assert row["n_chars_mismatch"] == 4


def test_pattern_counts_nulls_and_partial_matches(spark):
    df = spark.createDataFrame(
        [("https://a.example.com/x",), ("ftp://bad",), (None,),
         ("https://b.example.com/y tail",)], "url string")
    row = dq.run_checks(
        df, dq.pattern("url", r"^https://[a-z.]+/[a-z]+$", "viol")
    ).collect()[0]
    assert row["viol"] == 3          # anchored: trailing text fails


def test_single_pass_plan(spark):
    """The whole row-level suite is ONE aggregate over ONE scan — no
    joins, no windows (the Deequ contract that makes 40 checks cost
    the same scan as 1)."""
    plan = dq.run_checks(
        _df(spark),
        dq.completeness("text"),
        dq.membership("lang", ["en"]),
        dq.in_range("n_chars", 0, 100),
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Window" not in plan


def test_referential_orphans_and_null_child_keys(spark):
    child = spark.createDataFrame(
        [(1,), (2,), (9,), (None,)], "k long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "p long")
    row = dq.referential_orphans(child, "k", parent, "p",
                                 "orphans").collect()[0]
    assert row["orphans"] == 2       # 9 and NULL

"""Unicode normalization stage (textprep.normalize_text/normalize_stats):
NFC agreement between Python unicodedata and DuckDB utf8proc, control
stripping, and the stats contract."""

from __future__ import annotations

import unicodedata

import duckdb
import pytest
from pyspark.sql import functions as F

from docling_graph_spark.operators import textprep

# decomposed -> composed cases, including multi-mark canonical
# REORDERING (dot-below sorts before dot-above) and a compatibility
# character NFC must NOT touch (fi-ligature: NFKC-only)
NFC_CASES = [
    "café",
    "Ångström",
    "ṩ",
    "ṩ",      # marks in the other order: same NFC result
    "ﬁle",           # ligature survives NFC
    "plain ascii",
    "中文 text",  # Han: NFC-stable
]


def test_python_duckdb_nfc_agreement():
    con = duckdb.connect()
    for s in NFC_CASES:
        py = unicodedata.normalize("NFC", s)
        dk = con.execute("SELECT nfc_normalize(?)", [s]).fetchone()[0]
        assert py == dk, repr(s)


def test_reordered_marks_converge():
    a = unicodedata.normalize("NFC", "ṩ")
    b = unicodedata.normalize("NFC", "ṩ")
    assert a == b == "ṩ"


def test_normalize_text_strips_controls_keeps_tabs_newlines(spark):
    df = spark.createDataFrame(
        [("\x01a\tb\nc\x7fd",), ("café",), (None,)], "t string")
    got = [r[0] for r in
           df.select(textprep.normalize_text(F.col("t"))).collect()]
    assert got[0] == "a\tb\ncd"
    assert got[1] == "café"
    assert got[2] is None


def test_normalize_stats_counts(spark):
    df = spark.createDataFrame(
        [("café",), ("ascii",), ("\x02x",)], "t string")
    [r] = textprep.normalize_stats(df, F.col("t")).collect()
    assert r["n_docs"] == 3
    assert r["n_changed"] == 2          # composed + control-stripped
    assert r["chars_before"] == 12 and r["chars_after"] == 10
    assert r["n_nonascii_docs"] == 1    # only the combining-mark doc
    assert r["normalized_checksum"] > 0

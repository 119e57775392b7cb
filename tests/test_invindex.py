"""Inverted-index postings export (operators/invindex.py)."""

import pytest
from pyspark.sql import functions as F

from docling_graph_spark.operators import invindex as op_ix


@pytest.fixture(scope="module")
def docs(spark):
    # "every" appears in all docs (stopword analogue); "seven" only in 700
    rows = [(0, "alpha every words"), (1, "every bravo"),
            (300, "every alpha"), (700, "every seven")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_blocking_bounds_group_size(docs):
    blk = {(r["term"], r["block"]): r["ids"]
           for r in op_ix.term_postings(docs, block=256).collect()}
    # the stopword splits into one group per doc-range block, never one
    # giant posting group
    assert blk[("every", 0)] == [0, 1]
    assert blk[("every", 1)] == [300]
    assert blk[("every", 2)] == [700]
    assert blk[("alpha", 1)] == [300]


def test_deltas_relative_to_block_start(docs):
    rows = {(r["term"], r["block"]): r["deltas"]
            for r in op_ix.term_postings(docs, block=256).collect()}
    assert rows[("every", 0)] == [0, 1]     # 0-0, 1-0... delta chain
    assert rows[("every", 1)] == [44]       # 300 - 256
    assert rows[("alpha", 0)] == [0]
    assert rows[("seven", 2)] == [188]      # 700 - 512


def test_varint_accounting(spark):
    # doc 0 and doc 200 in block 0: deltas 0 and 200 -> 1 + 2 bytes
    docs = spark.createDataFrame(
        [(0, "zzzzz"), (200, "zzzzz")], "doc_id long, text string")
    [r] = op_ix.postings_stats(docs, block=256).collect()
    assert (r["term"], r["df"], r["n_blocks"]) == ("zzzzz", 2, 1)
    assert r["index_bytes"] == 3


def test_short_and_nonalpha_tokens_excluded(spark):
    docs = spark.createDataFrame(
        [(0, "ab cde f1ghij KLMNO pqrst")], "doc_id long, text string")
    terms = {r["term"] for r in op_ix.postings_stats(docs).collect()}
    # "ab"/"cde" too short; "f1ghij" splits at the digit into runs < 5;
    # "KLMNO" lowercases in
    assert terms == {"klmno", "pqrst"}


def test_null_text_yields_no_terms(spark):
    docs = spark.createDataFrame([(0, None)], "doc_id long, text string")
    assert op_ix.postings_stats(docs).count() == 0


def test_checksum_partitioning_invariant(docs):
    a = {r["term"]: r["checksum"]
         for r in op_ix.postings_stats(docs).collect()}
    b = {r["term"]: r["checksum"]
         for r in op_ix.postings_stats(docs.repartition(7)).collect()}
    assert a == b

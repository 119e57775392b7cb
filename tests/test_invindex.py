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


def test_bm25_impacts_exact_integer_math(spark):
    from docling_graph_spark.operators import invindex as op_ix

    # two docs x 4 tokens: T=8, N=2, dl=4 = avgdl, so the saturation
    # reduces to scale*tf*(k1+1)/(tf+k1) with k1=1.2 exactly
    docs = spark.createDataFrame(
        [(0, "apple apple berry cherry"),
         (1, "apple melon grape lemon")],
        "doc_id long, text string")
    rows = {(r["term"], r["doc_id"]): r["impact"]
            for r in op_ix.bm25_impacts(docs).collect()}
    # tf=2: 1e6*2*2.2/3.2 = 1_375_000 ; tf=1: 1e6*2.2/2.2 = 1_000_000
    assert rows[("apple", 0)] == 1_375_000
    assert rows[("apple", 1)] == 1_000_000
    assert rows[("berry", 0)] == 1_000_000

    stats = {r["term"]: r for r in
             op_ix.bm25_term_stats(docs).collect()}
    a = stats["apple"]
    assert (a["df"], a["sum_impact"], a["max_impact"]) == (
        2, 2_375_000, 1_375_000)
    assert a["impact_checksum"] > 0


def test_bm25_length_normalization_direction(spark):
    from docling_graph_spark.operators import invindex as op_ix

    # same tf, longer doc -> smaller impact (b>0 penalizes long docs)
    docs = spark.createDataFrame(
        [(0, "apple berry"),
         (1, "apple berry cherry grape lemon melon olive peach")],
        "doc_id long, text string")
    rows = {(r["term"], r["doc_id"]): r["impact"]
            for r in op_ix.bm25_impacts(docs).collect()}
    assert rows[("apple", 0)] > rows[("apple", 1)]

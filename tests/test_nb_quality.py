"""Naive-Bayes quality classifier (operators/nbquality.py): weight math
against a hand computation, separability on a planted corpus, label
consistency with the Gopher gate, and partition invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from docling_graph_spark.operators.nbquality import (
    NB_SCALE,
    nb_quality_report,
    nb_quality_scores,
)

# a "good" doc: >=50 words, mean word length in [3,10], no dominant word
# or bigram — every position gets a unique token (a rotating vocabulary
# would repeat each bigram 5x and trip the top-bigram gate)
def _good(i: int) -> str:
    return " ".join(f"tok{i}x{k}" for k in range(60))


def _bad(i: int) -> str:
    return f"spam{i} " * 8  # 8 words -> fails the word-count gate


def test_labels_match_gopher_gate(spark):
    from docling_graph_spark.operators.textprep import gopher_pass

    rows = [(i, _good(i)) for i in range(6)] + \
        [(100 + i, _bad(i)) for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    scored = {r["doc_id"]: r["y"] for r in
              nb_quality_scores(docs).collect()}
    gate = {r["doc_id"]: r["g"] for r in docs.select(
        "doc_id", gopher_pass(F.col("text")).alias("g")).collect()}
    assert scored == gate
    assert all(scored[i] for i in range(6))
    assert not any(scored[100 + i] for i in range(6))


def test_separable_corpus_perfect_agreement(spark):
    # disjoint vocabularies: the trained weights must separate perfectly
    rows = [(i, _good(i)) for i in range(8)] + \
        [(100 + i, _bad(i)) for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    rep = nb_quality_report(docs).collect()[0]
    assert rep["n_docs"] == 16
    assert rep["n_label_pass"] == 8
    assert rep["n_pred_pass"] == 8
    assert rep["n_agree"] == 16


def test_weight_math_by_hand(spark):
    # two docs, two words each; doc 0 passes iff ... neither passes the
    # word-count gate, so both are 'fail' and every weight is the
    # all-fail Laplace form: (S*1)//(0+v) - (S*(c+1))//(tf+v)
    docs = spark.createDataFrame(
        [(0, "aa bb"), (1, "aa cc")], "doc_id long, text string")
    scored = {r["doc_id"]: r["score"] for r in
              nb_quality_scores(docs).collect()}
    v, tf = 3, 4  # vocab {aa,bb,cc}; 4 fail-class occurrences
    w = {"aa": NB_SCALE * 1 // (0 + v) - NB_SCALE * 3 // (tf + v),
         "bb": NB_SCALE * 1 // (0 + v) - NB_SCALE * 2 // (tf + v),
         "cc": NB_SCALE * 1 // (0 + v) - NB_SCALE * 2 // (tf + v)}
    assert scored[0] == w["aa"] + w["bb"]
    assert scored[1] == w["aa"] + w["cc"]


def test_partition_invariance(spark):
    rows = [(i, _good(i)) for i in range(10)] + \
        [(100 + i, _bad(i)) for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, nb_quality_scores(docs).collect()))
    b = sorted(map(tuple, nb_quality_scores(
        docs.repartition(7)).collect()))
    assert a == b

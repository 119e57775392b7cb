"""CCNet head/middle/tail perplexity binning (textprep.ccnet_bins):
tercile sizes on separable corpora, value-cutoff tie promotion, unscored
routing, and partition-count invariance of the value-based rule."""

from __future__ import annotations

from docling_graph_spark.operators.textprep import (
    ccnet_bin_stats,
    ccnet_bins,
)

FLUENT = "the cat sat on the mat and the dog sat on the log near the cat "
NOISE = "zqxj vkwp qzxv jwkq xzqv pkwj qvxz wjkq zxqv kpwj "


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_terciles_on_separable_corpus(spark):
    # 9 scored docs: 3 clearly fluent (repeated common trigrams), 3 mixed,
    # 3 noise; plus one empty doc -> unscored
    rows = (
        [(i, FLUENT * 4) for i in range(3)]
        + [(i, FLUENT + NOISE) for i in range(3, 6)]
        + [(i, NOISE * 4) for i in range(6, 9)]
        + [(9, "")]
    )
    out = {r["doc_id"]: r["bin"] for r in
           ccnet_bins(_docs(spark, rows)).collect()}
    assert all(out[i] == "head" for i in range(3))
    assert all(out[i] == "middle" for i in range(3, 6))
    assert all(out[i] == "tail" for i in range(6, 9))
    assert out[9] == "unscored"


def test_bins_partition_the_corpus(spark):
    rows = [(i, (FLUENT if i % 2 else NOISE) * (1 + i % 3))
            for i in range(12)] + [(99, None)]
    stats = {r["bin"]: r["n_docs"] for r in
             ccnet_bin_stats(_docs(spark, rows)).collect()}
    assert sum(stats.values()) == 13
    assert stats.get("unscored") == 1


def test_tied_scores_promote_to_higher_bin(spark):
    # all docs identical -> one score value -> everything is 'head'
    rows = [(i, FLUENT) for i in range(6)]
    stats = {r["bin"]: r["n_docs"] for r in
             ccnet_bin_stats(_docs(spark, rows)).collect()}
    assert stats == {"head": 6}


def test_partitioning_invariance(spark):
    rows = [(i, (FLUENT * (1 + i % 4)) + NOISE * (i % 3))
            for i in range(20)]
    a = sorted(map(tuple, ccnet_bins(_docs(spark, rows)).collect()))
    b = sorted(map(tuple, ccnet_bins(
        _docs(spark, rows).repartition(7)).collect()))
    assert a == b

"""Retrieval-training mining (operators/retrieval.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from docling_graph_spark.operators import retrieval


def _emb(spark):
    # 5 unit-ish vectors in 2-d: similarity ordering around v0 is
    # v1 > v2 > v3 > v4 (angles 10°, 30°, 60°, 170°)
    import math

    rows = [
        (i, [math.cos(math.radians(a)), math.sin(math.radians(a))])
        for i, a in enumerate([0.0, 10.0, 30.0, 60.0, 170.0])
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_hard_negatives_exclude_positives_before_ranking(spark):
    emb = _emb(spark)
    links = spark.createDataFrame([(0, 1)], "query_id long, pos_id long")
    got = retrieval.mine_hard_negatives(emb, links, k=2).collect()
    # positive v1 (most similar) is excluded BEFORE ranking: the 2
    # negatives are the next-most-similar docs v2, v3 — not k-1 rows
    assert [(r["rank"], r["neighbor_id"]) for r in got] == [(1, 2), (2, 3)]


def test_positive_ranks(spark):
    emb = _emb(spark)
    links = spark.createDataFrame(
        [(0, 1), (0, 3)], "query_id long, pos_id long"
    )
    got = {r["pos_id"]: r["pos_rank"]
           for r in retrieval.positive_ranks(emb, links).collect()}
    assert got == {1: 1, 3: 3}  # v1 is rank 1, v3 rank 3 around v0


def test_doc_link_pairs_extraction(spark):
    rows = [
        ("https://host1.example.com/doc/7",
         b'<a href="https://host2.example.com/doc/9">x</a>'
         b'<a href="https://host2.example.com/">home</a>'
         b'<a href="/doc/3">relative</a>'
         b'<a href="https://host2.example.com/doc/9">dup</a>'),
        ("https://host1.example.com/doc/8",
         b'<a href="https://host9.example.com/doc/8">self</a>'),
        ("https://host1.example.com/", b"no doc id in url"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {(r["query_id"], r["pos_id"])
           for r in retrieval.doc_link_pairs(df).collect()}
    # absolute doc links only, deduped, self-links dropped; the
    # no-doc-id page yields NULL query_id (regexp no-match -> '' -> NULL
    # under try-cast semantics) and is filtered
    assert got == {(7, 9)}


def test_query_side_is_broadcast(spark):
    emb = _emb(spark)
    links = spark.createDataFrame([(0, 1)], "query_id long, pos_id long")
    plan = retrieval.mine_hard_negatives(emb, links)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan

"""SemDeDup (operators/ann.semantic_dedup): planted duplicates fall,
originals survive, the candidate join is cluster-bounded (equi-join on
list_id, no nested loop)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docling_graph_spark.operators import ann
from docling_graph_spark.plans import formatted_plan


@pytest.fixture(scope="module")
def emb(spark, sf_smoke_dir):
    return (spark.read.parquet(f"{sf_smoke_dir}/embeddings.parquet")
            .select("vec_id", "embedding"))


def test_planted_duplicates_dropped(spark, emb):
    copies = emb.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 5000).alias("vec_id"), "embedding")
    res = ann.semantic_dedup(emb.unionByName(copies)).collect()
    dropped = {r["vec_id"] for r in res if not r["keep"]}
    assert dropped == {5000 + i for i in range(10)}
    # smallest id of each duplicate group survives
    kept = {r["vec_id"] for r in res if r["keep"]}
    assert set(range(10)).issubset(kept)


def test_copies_cocluster_with_originals(spark, emb):
    copies = emb.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 5000).alias("vec_id"), "embedding")
    res = {r["vec_id"]: r["list_id"]
           for r in ann.semantic_dedup(emb.unionByName(copies)).collect()}
    for i in range(10):
        assert res[i] == res[5000 + i]


def test_pair_join_is_equi_join(spark, emb):
    """The only nested-loop operators are the intentional broadcast-
    centroid crosses (tiny build side); the within-cluster candidate pair
    join must be a real equi-join, never a cartesian pair blowup."""
    plan = formatted_plan(ann.semantic_dedup(emb))
    assert "CartesianProduct" not in plan
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line and "Build" in line:
            assert "Cross BuildRight" in line, line
    assert any(j in plan for j in
               ("SortMergeJoin Inner", "ShuffledHashJoin Inner",
                "BroadcastHashJoin Inner"))

"""Deterministic HyperLogLog (operators/sketches.py): register
construction, mergeability (the property that makes sketches work on
1000 executors), and estimate sanity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docling_graph_spark.operators import sketches as op_sk


def _regs(df):
    return {r["bucket"]: r["register"]
            for r in op_sk.hll_register_rows(df, F.col("u")).collect()}


@pytest.fixture(scope="module")
def urls(spark):
    vals = [(f"https://h{i % 97}.example.com/p/{i}",) for i in range(3000)]
    return spark.createDataFrame(vals, "u string")


def test_merge_equals_union(spark, urls):
    """sketch(A ∪ B) == merge(sketch(A), sketch(B)) — associative
    combine; also exercises overlap (B repeats some of A)."""
    a = urls.filter(F.length("u") % 2 == 0)
    b = urls.filter(F.length("u") % 2 == 1).unionAll(a.limit(100))
    merged = op_sk.merge_registers([_regs(a), _regs(b)])
    assert merged == _regs(urls.unionAll(a.limit(100)))


def test_registers_partitioning_invariant(spark, urls):
    assert _regs(urls.repartition(13)) == _regs(urls.coalesce(1))


def test_estimate_within_hll_error(spark, urls):
    est = op_sk.estimate(_regs(urls))
    # standard error for m=256 is ~6.5%; allow 3 sigma
    assert abs(est - 3000) / 3000 < 0.20


def test_duplicates_do_not_move_estimate(spark, urls):
    dup = urls.unionAll(urls).unionAll(urls)
    assert _regs(dup) == _regs(urls)


def test_hll_stats_contract(spark, urls):
    [r] = op_sk.hll_stats(
        urls.withColumn("g", F.lit("x")), F.col("u"), "g").collect()
    assert r["hll_m"] == 256
    assert 0 < r["hll_nonzero"] <= 256
    assert r["hll_regsum"] > 0 and r["hll_checksum"] > 0

"""Bucketed interval-overlap join (operators/intervals.py): pair parity
vs a DuckDB range-predicate join, multi-cell dedup, closed-interval
boundaries, and the no-cross-product plan."""

from __future__ import annotations

import duckdb
import pytest

from docling_graph_spark.operators import intervals as op_iv

W = 100


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id long, start long, end long")


@pytest.fixture(scope="module")
def sides(spark):
    # deterministic pseudo-random-ish intervals, several spanning many
    # cells, several touching exactly at a boundary
    left = _mk(spark, [
        (i, i * 37 % 900, i * 37 % 900 + (i * 13 % 250)) for i in range(60)
    ])
    right = _mk(spark, [
        (i, i * 53 % 950, i * 53 % 950 + (i * 7 % 180)) for i in range(60)
    ])
    return left, right


def test_pairs_match_duckdb_range_join(spark, sides):
    left, right = sides
    got = {(r["l_id"], r["r_id"]) for r in op_iv.interval_overlap_join(
        left, right, "id", "id", W).collect()}
    con = duckdb.connect()
    con.register("l", left.toPandas())
    con.register("r", right.toPandas())
    expect = {tuple(t) for t in con.execute(
        "SELECT l.id, r.id FROM l JOIN r "
        "ON l.start <= r.end AND r.start <= l.end").fetchall()}
    assert got == expect and len(got) > 100


def test_multi_cell_pair_emitted_once(spark):
    left = _mk(spark, [(1, 0, 5 * W)])          # spans 6 cells
    right = _mk(spark, [(2, 0, 5 * W)])
    rows = op_iv.interval_overlap_join(left, right, "id", "id", W).collect()
    assert len(rows) == 1


def test_closed_interval_touching_boundary_overlaps(spark):
    left = _mk(spark, [(1, 0, 10)])
    right = _mk(spark, [(2, 10, 20), (3, 11, 20)])
    got = {r["r_id"] for r in op_iv.interval_overlap_join(
        left, right, "id", "id", W).collect()}
    assert got == {2}   # [0,10] touches [10,20]; [11,20] does not


def test_plan_has_no_cross_product(spark, sides):
    left, right = sides
    plan = op_iv.interval_overlap_join(left, right, "id", "id", W)._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_self_overlap_respects_group_filter(spark):
    iv = spark.createDataFrame(
        [(1, 0, 50, "u1"), (2, 40, 90, "u1"),     # same user: excluded
         (3, 45, 60, "u2"), (4, 200, 210, "u3")],
        "id long, start long, end long, user string")
    got = {(r["l_id"], r["r_id"]) for r in op_iv.self_overlap_pairs(
        iv, "id", W, group_col="user").collect()}
    assert got == {(1, 3), (2, 3)}


def test_interval_property_fuzz_vs_bruteforce(spark):
    """Randomized (seeded) parity across bucket widths — including widths
    far off the typical interval length, where cell logic is most likely
    to be wrong."""
    import random

    rng = random.Random(20240820)
    rows_l = [(i, s := rng.randrange(1000), s + rng.randrange(300))
              for i in range(70)]
    rows_r = [(i, s := rng.randrange(1000), s + rng.randrange(300))
              for i in range(70)]
    left, right = _mk(spark, rows_l), _mk(spark, rows_r)
    expect = {(a, b) for a, s1, e1 in rows_l for b, s2, e2 in rows_r
              if s1 <= e2 and s2 <= e1}
    for width in (7, 100, 4096):
        got = {(r["l_id"], r["r_id"]) for r in op_iv.interval_overlap_join(
            left, right, "id", "id", width).collect()}
        assert got == expect, width

"""As-of join (operators/asof.py): semantics vs DuckDB's NATIVE ASOF JOIN
(two independent implementations), strict/non-strict boundary, partition
invariance, and the no-cartesian plan shape."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from docling_graph_spark.operators import asof as op_asof

T0 = dt.datetime(2024, 5, 1, 0, 0, 0)


def _t(minutes):
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def tables(spark):
    left = spark.createDataFrame(
        [(1, _t(10), "p1"), (1, _t(30), "p2"), (2, _t(5), "p3"),
         (3, _t(50), "p4")],
        "u long, ts timestamp, pid string")
    right = spark.createDataFrame(
        [(1, _t(0), 100), (1, _t(10), 200), (1, _t(20), 300),
         (2, _t(7), 400), (3, _t(50), 500)],
        "u long, ts timestamp, v long")
    return left, right


def test_strict_matches_duckdb_native_asof(spark, tables):
    left, right = tables
    got = {(r["u"], r["pid"], r["asof_val"])
           for r in op_asof.asof_join(
               left, right, "u", "ts", "ts", "v", strict=True).collect()}
    con = duckdb.connect()
    con.register("l", left.toPandas())
    con.register("r", right.toPandas())
    expect = {tuple(t) for t in con.execute(
        "SELECT l.u, l.pid, r.v FROM l ASOF LEFT JOIN r "
        "ON l.u = r.u AND r.ts < l.ts").fetchall()}
    assert got == expect
    # boundary: left at t10 must NOT see the right row at t10 (strict)
    assert (1, "p1", 100) in got


def test_non_strict_includes_equal_timestamp(spark, tables):
    left, right = tables
    got = {(r["u"], r["pid"], r["asof_val"])
           for r in op_asof.asof_join(
               left, right, "u", "ts", "ts", "v", strict=False).collect()}
    assert (1, "p1", 200) in got     # t10 right row now visible
    assert (3, "p4", 500) in got     # exact-equal ts matches
    con = duckdb.connect()
    con.register("l", left.toPandas())
    con.register("r", right.toPandas())
    expect = {tuple(t) for t in con.execute(
        "SELECT l.u, l.pid, r.v FROM l ASOF LEFT JOIN r "
        "ON l.u = r.u AND r.ts <= l.ts").fetchall()}
    assert got == expect


def test_unmatched_left_rows_get_nulls(spark, tables):
    left, right = tables
    rows = {r["pid"]: r["asof_val"] for r in op_asof.asof_join(
        left, right, "u", "ts", "ts", "v", strict=True).collect()}
    assert rows["p4"] is None        # only right row for u=3 is at == ts
    assert rows["p3"] is None        # u=2's right row is later (t7 > t5)


def test_partitioning_invariant(spark, tables):
    left, right = tables
    a = {tuple(r) for r in op_asof.asof_join(
        left.repartition(5), right.repartition(3),
        "u", "ts", "ts", "v").collect()}
    b = {tuple(r) for r in op_asof.asof_join(
        left.coalesce(1), right.coalesce(1), "u", "ts", "ts", "v").collect()}
    assert a == b


def test_plan_has_no_cartesian_or_range_join(spark, tables):
    left, right = tables
    plan = op_asof.asof_join(left, right, "u", "ts", "ts", "v")._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "hashpartitioning(_k" in plan  # the single narrow exchange


def test_asof_property_fuzz_vs_bruteforce(spark):
    """Randomized (seeded, deterministic) parity: the union+window as-of
    equals the brute-force 'latest right before left' per row."""
    import random

    rng = random.Random(20240820)
    for trial in range(3):
        lrows = [(rng.randrange(5), _t(rng.randrange(500)), f"p{i}")
                 for i in range(80)]
        rrows = [(rng.randrange(5), _t(rng.randrange(500)),
                  rng.randrange(1000)) for i in range(120)]
        left = spark.createDataFrame(
            lrows, "u long, ts timestamp, pid string")
        right = spark.createDataFrame(
            rrows, "u long, ts timestamp, v long")
        got = {r["pid"]: r["asof_val"] for r in op_asof.asof_join(
            left, right, "u", "ts", "ts", "v", strict=True).collect()}
        for u, ts, pid in lrows:
            cands = [(rt, rv) for (ru, rt, rv) in rrows
                     if ru == u and rt < ts]
            # tie on max ts resolves to max value (documented)
            expect = (max(cands, key=lambda x: (x[0], x[1]))[1]
                      if cands else None)
            assert got[pid] == expect, (trial, pid)

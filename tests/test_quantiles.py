"""Exact distributed quantiles (operators/quantiles.py)."""

from pyspark.sql import functions as F

from docling_graph_spark.operators import quantiles as op_q


def _q(spark, vals, pms=(500,)):
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    return {r["pm"]: (r["rank"], r["value"])
            for r in op_q.exact_quantiles(df, "x", permille=pms).collect()}


def test_median_odd_and_even(spark):
    assert _q(spark, [1, 2, 3, 4, 5])[500] == (3, 3)
    # lower-discrete convention: rank ceil(0.5*4) = 2 -> value 2
    assert _q(spark, [1, 2, 3, 4])[500] == (2, 2)


def test_heavy_duplicates(spark):
    # 90 copies of 7, then 10 of 100: p500 and p900 both land inside the
    # run of 7s; p990 crosses into the tail
    vals = [7] * 90 + [100] * 10
    got = _q(spark, vals, pms=(500, 900, 990))
    assert got[500] == (50, 7)
    assert got[900] == (90, 7)
    assert got[990] == (99, 100)


def test_nulls_excluded(spark):
    df = spark.createDataFrame(
        [(1,), (None,), (3,), (None,), (5,)], "x long")
    [(rank, value)] = [
        (r["rank"], r["value"])
        for r in op_q.exact_quantiles(df, "x", permille=(500,)).collect()]
    assert (rank, value) == (2, 3)  # N = 3 non-null


def test_empty_input(spark):
    df = spark.createDataFrame([], "x long")
    assert op_q.exact_quantiles(df, "x").count() == 0


def test_partitioning_invariant(spark):
    vals = [(i * 37) % 101 for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    a = sorted(tuple(r) for r in op_q.exact_quantiles(df, "x").collect())
    b = sorted(tuple(r) for r in
               op_q.exact_quantiles(df.repartition(13), "x").collect())
    assert a == b and len(a) == 6


def test_no_global_sort_in_plan(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "x long")
    plan = op_q.exact_quantiles(df, "x")._jdf.queryExecution() \
        .executedPlan().toString()
    # per-bucket window sort exists; a single-partition global sort
    # would show as Exchange SinglePartition feeding a Sort
    assert "Exchange SinglePartition" not in plan.split("localCheckpoint")[0]

"""AIMD recrawl scheduling (operators/snapshots.recrawl_schedule)."""

from __future__ import annotations

from pyspark.sql import functions as F

from docling_graph_spark.operators import snapshots as op_snap


def _sched(spark, rows):
    df = spark.createDataFrame(
        rows, "url string, snapshot_id int, content_md5 string")
    return {r["url"]: r for r in op_snap.recrawl_schedule(df).collect()}


def test_fold_halve_and_grow(spark):
    rows = [
        # u1: change, nochange, change -> 86400/2=43200 *3/2=64800 /2=32400
        ("u1", 1, "a"), ("u1", 2, "b"), ("u1", 3, "b"), ("u1", 4, "c"),
        # u2: single capture -> base interval, no observations
        ("u2", 1, "x"),
        # u3: two unchanged -> 86400*1.5=129600 *1.5=194400
        ("u3", 1, "s"), ("u3", 2, "s"), ("u3", 3, "s"),
    ]
    got = _sched(spark, rows)
    assert (got["u1"]["n_obs"], got["u1"]["n_changes"],
            got["u1"]["interval_s"]) == (3, 2, 32400)
    assert (got["u2"]["n_obs"], got["u2"]["interval_s"]) == (0, 86400)
    assert (got["u3"]["n_changes"], got["u3"]["interval_s"]) == (0, 194400)


def test_clamping(spark):
    # 6 changes from base: 86400 -> 43200 -> 21600 -> 10800 -> 5400 ->
    # 3600 (floor) -> stays 3600
    rows = [("u", i, f"c{i}") for i in range(1, 8)]
    got = _sched(spark, rows)
    assert got["u"]["interval_s"] == 3600  # clamped at min
    # 5 no-changes: 86400*1.5^k capped at 604800
    rows2 = [("v", i, "same") for i in range(1, 8)]
    got2 = _sched(spark, rows2)
    assert got2["v"]["interval_s"] == 604800  # clamped at max


def test_presence_gap_counts_successive_captures(spark):
    # missing snapshot 2: the 1->3 pair is still one observation
    rows = [("u", 1, "a"), ("u", 3, "a")]
    got = _sched(spark, rows)
    assert (got["u"]["n_obs"], got["u"]["n_changes"],
            got["u"]["interval_s"]) == (1, 0, 129600)

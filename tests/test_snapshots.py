"""Crawl-snapshot diff + latest-wins compaction (operators/snapshots.py)."""

import datetime

import pytest
from pyspark.sql import functions as F

from docling_graph_spark.operators import snapshots as op_snap


def _ts(day, sec=0):
    return datetime.datetime(2024, day, 1, 0, 0, sec)


@pytest.fixture(scope="module")
def pages(spark):
    rows = [
        # url, snapshot_id, warc_ts, content_md5 stand-in
        ("u/keep", 1, _ts(1), "aaa"),
        ("u/keep", 2, _ts(2), "aaa"),       # unchanged
        ("u/edit", 1, _ts(1), "bbb"),
        ("u/edit", 2, _ts(2), "bbb2"),      # changed
        ("u/gone", 1, _ts(1), "ccc"),       # removed
        ("u/new", 2, _ts(2), "ddd"),        # added
    ]
    return spark.createDataFrame(
        rows, "url string, snapshot_id int, warc_ts timestamp, "
              "content_md5 string")


def test_diff_statuses(pages):
    got = {r["url"]: r["status"]
           for r in op_snap.snapshot_diff(pages).collect()}
    assert got == {"u/keep": "unchanged", "u/edit": "changed",
                   "u/gone": "removed", "u/new": "added"}


def test_compact_latest_wins(pages):
    out = {r["url"]: (r["snapshot_id"], r["content_md5"])
           for r in op_snap.compact_latest_wins(pages).collect()}
    assert out == {"u/keep": (2, "aaa"), "u/edit": (2, "bbb2"),
                   "u/gone": (1, "ccc"), "u/new": (2, "ddd")}
    # schema preserved, one row per url
    assert sorted(op_snap.compact_latest_wins(pages).columns) == sorted(
        pages.columns)


def test_compact_tie_breaks_by_later_snapshot(spark):
    # same capture time in both snapshots: snapshot 2 must win
    df = spark.createDataFrame(
        [("u", 1, _ts(1), "old"), ("u", 2, _ts(1), "new")],
        "url string, snapshot_id int, warc_ts timestamp, "
        "content_md5 string")
    [row] = op_snap.compact_latest_wins(df).collect()
    assert (row["snapshot_id"], row["content_md5"]) == (2, "new")


def test_stats_counts(pages):
    [s] = op_snap.snapshot_diff_stats(pages).collect()
    assert (s["n_urls"], s["n_snap1"], s["n_snap2"]) == (4, 3, 3)
    assert (s["n_added"], s["n_removed"], s["n_changed"],
            s["n_unchanged"]) == (1, 1, 1, 1)


def test_stats_plan_is_single_shuffle_aggregation(pages):
    """No window, no join, no nested loop: scan → partial agg →
    exchange(url) → final agg → (1-row) agg.  String min/max + struct max
    make Spark pick SortAggregate (same as every md5-gated stage in this
    repo); the scale property asserted here is the partial/final split and
    that the ONLY wide exchange is the one hash partition on url."""
    plan = op_snap.snapshot_diff_stats(pages)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan and "Join" not in plan
    assert "partial_" in plan                      # map-side combine
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Exchange") == 2             # + final SinglePartition


def test_query_matches_oracle_at_smoke_sf(spark, sf_smoke_dir):
    import duckdb

    from docling_graph_spark import queries as q

    got = {r["metric"]: r["value"] for r in
           q.q_snapshot_diff(spark, sf_smoke_dir).selectExpr(
               "stack(10, 'n_urls', cast(n_urls as string), "
               "'n_snap1', cast(n_snap1 as string), "
               "'n_snap2', cast(n_snap2 as string), "
               "'n_added', cast(n_added as string), "
               "'n_removed', cast(n_removed as string), "
               "'n_changed', cast(n_changed as string), "
               "'n_unchanged', cast(n_unchanged as string), "
               "'min_md5', compacted_min_md5, "
               "'max_md5', compacted_max_md5, "
               "'checksum', cast(compacted_checksum as string)) "
               "as (metric, value)").collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_smoke_dir}/documents.parquet')")
    [o] = con.execute(q.SQL_SNAPSHOT_DIFF).fetchall()
    (n_urls, n1, n2, na, nr, nc, nu, mn, mx, ck) = o
    assert got["n_urls"] == str(n_urls)
    assert (got["n_snap1"], got["n_snap2"]) == (str(n1), str(n2))
    assert (got["n_added"], got["n_removed"]) == (str(na), str(nr))
    assert (got["n_changed"], got["n_unchanged"]) == (str(nc), str(nu))
    assert (got["min_md5"], got["max_md5"]) == (mn, mx)
    assert got["checksum"] == str(ck)
    # the synthetic diff actually exercises every class
    assert int(got["n_added"]) > 0 and int(got["n_removed"]) > 0
    assert int(got["n_changed"]) > 0 and int(got["n_unchanged"]) > 0

"""Interval-overlap join — "which [start,end] ranges intersect" — without
the nested-loop plan Spark would otherwise pick.

A range predicate like ``l.start <= r.end AND r.start <= l.end`` has no
equi-join key, so Catalyst falls back to BroadcastNestedLoopJoin /
CartesianProduct — quadratic, a non-starter at crawl scale (capture
validity windows, session overlap, outage alignment).  The standard fix
(the shape behind Databricks' range-join hints) is **grid bucketing**:

1. pick a bucket width W near the typical interval length;
2. explode every interval into the grid cells it covers
   (``floor(start/W) .. floor(end/W)`` — closed intervals);
3. equi-join on the cell (plus any extra keys) — candidates are now only
   pairs sharing a cell;
4. filter the TRUE overlap predicate and de-duplicate pairs that shared
   several cells.

Cost is linear in total covered cells: each interval inflates by
``len/W + 1`` rows, the join is a hash join, and no cross product ever
materializes (plan-asserted in tests).  Degenerate inputs (an interval
spanning the whole timeline) inflate linearly, not quadratically; pick W
accordingly.

The DuckDB oracle replays the same pairs with a plain range-predicate
join — fine at oracle scale, which is exactly the point: the rewrite
exists for the distributed plan, not the semantics.  The reference
(SylvainWT/docling-graph) has no temporal notion; rebuild addition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cells(df: DataFrame, id_col: str, start: str, end: str,
           width: int, tag: str) -> DataFrame:
    w = int(width)
    return df.select(
        F.col(id_col).alias(f"{tag}_id"),
        F.col(start).cast("long").alias(f"{tag}_s"),
        F.col(end).cast("long").alias(f"{tag}_e"),
    ).withColumn("_cell", F.explode(F.sequence(
        F.expr(f"{tag}_s div {w}"), F.expr(f"{tag}_e div {w}"))))


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          left_id: str, right_id: str,
                          bucket_width: int,
                          start: str = "start", end: str = "end",
                          right_start: str | None = None,
                          right_end: str | None = None) -> DataFrame:
    """(left_id, right_id, l_s, l_e, r_s, r_e): one row per pair of
    CLOSED intervals [s, e] that intersect (``l_s <= r_e AND r_s <= l_e``).
    ``end >= start`` required; ids must be unique per side."""
    rs, re_ = right_start or start, right_end or end
    lc = _cells(left, left_id, start, end, bucket_width, "l")
    rc = _cells(right, right_id, rs, re_, bucket_width, "r")
    return (
        lc.join(rc, "_cell")
        .filter((F.col("l_s") <= F.col("r_e"))
                & (F.col("r_s") <= F.col("l_e")))
        .drop("_cell")
        .dropDuplicates(["l_id", "r_id"])
        .select("l_id", "r_id", "l_s", "l_e", "r_s", "r_e")
    )


def self_overlap_pairs(intervals: DataFrame, id_col: str,
                       bucket_width: int,
                       start: str = "start", end: str = "end",
                       group_col: str | None = None) -> DataFrame:
    """Unordered distinct pairs (a_id < b_id) of intersecting intervals
    from ONE relation; with ``group_col``, only pairs whose groups DIFFER
    (e.g. overlapping sessions of different users)."""
    keep = [id_col, start, end] + ([group_col] if group_col else [])
    base = intervals.select(*keep)
    pairs = interval_overlap_join(
        base, base, id_col, id_col, bucket_width, start, end)
    pairs = pairs.filter(F.col("l_id") < F.col("r_id"))
    if group_col:
        g = base.select(F.col(id_col).alias("_gid"),
                        F.col(group_col).alias("_g"))
        pairs = (pairs
                 .join(g.withColumnRenamed("_gid", "l_id")
                       .withColumnRenamed("_g", "l_g"), "l_id")
                 .join(g.withColumnRenamed("_gid", "r_id")
                       .withColumnRenamed("_g", "r_g"), "r_id")
                 .filter(F.col("l_g") != F.col("r_g")))
    return pairs

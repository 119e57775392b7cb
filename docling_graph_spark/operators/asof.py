"""As-of join — "latest right row at or before the left row's time" — as a
scalable DataFrame composition.

Spark has no ASOF JOIN operator (DuckDB, kdb and Flink do); the naive
rewrite is a range join (`l.ts >= r.ts` + row_number), whose nested-loop
pair blowup is quadratic in per-key row counts.  The scale shape used here
is the classic **union trick**: tag both inputs, union the narrow
projections, and take `last_value(right_value) IGNORE NULLS` over a window
partitioned by key and ordered by (ts, tag).  Cost: ONE hash exchange of
the narrow union + a partition-local sort — linear, no pair
materialization, the same plan at 10^12 rows (per-key state is one sort
group; hot keys cost a heavy group but never a cross product).

Strictness is encoded in the tag sort order: with right rows tagged to
sort BEFORE left rows at equal timestamps the match is `r.ts <= l.ts`;
tagged after, it is `r.ts < l.ts` (strict).  Ties inside the right stream
resolve by largest tiebreak column, deterministically.

The DuckDB oracle replays this with its NATIVE `ASOF JOIN` — two
independent implementations of the semantics checked value-for-value.
The reference (SylvainWT/docling-graph) has no temporal-join notion; this
is a rebuild addition for crawl-history alignment (e.g. "which robots.txt
snapshot governed this capture").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str, right_ts: str, right_val: str,
              strict: bool = True,
              out_col: str = "asof_val",
              out_ts_col: str = "asof_ts") -> DataFrame:
    """Append to ``left`` the value and timestamp of the latest ``right``
    row per ``key`` with ``right.ts (<|<=) left.ts``.

    ``left`` keeps all its columns; unmatched rows get NULLs.  ``right``
    contributes ``right_val`` (and its timestamp).  Within ``right``,
    equal-timestamp rows resolve to the greatest ``right_val`` (made
    deterministic by ordering the window on the value as the final
    tiebreak)."""
    l_tag, r_tag = (1, 2) if strict else (2, 1)

    ln = left.select(
        F.col(key).alias("_k"), F.col(left_ts).alias("_ts"),
        F.lit(l_tag).alias("_tag"),
        F.lit(None).cast(right.schema[right_val].dataType).alias("_rv"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_rts"),
        F.struct(*left.columns).alias("_row"),
    )
    rn = right.select(
        F.col(key).alias("_k"), F.col(right_ts).alias("_ts"),
        F.lit(r_tag).alias("_tag"),
        F.col(right_val).alias("_rv"),
        F.col(right_ts).alias("_rts"),
        F.lit(None).cast(ln.schema["_row"].dataType).alias("_row"),
    )
    # right rows sort before left at equal ts iff non-strict; the value is
    # the last order component so equal-ts right rows resolve to max value
    w = (Window.partitionBy("_k")
         .orderBy("_ts", "_tag", "_rv")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    merged = ln.unionByName(rn).select(
        "_row",
        F.last("_rv", ignorenulls=True).over(w).alias(out_col),
        F.last("_rts", ignorenulls=True).over(w).alias(out_ts_col),
        "_tag",
    )
    return (merged.filter(F.col("_tag") == l_tag)
            .select("_row.*", out_col, out_ts_col))

"""Exact distributed order statistics (quantiles) without a global sort.

``percentile_approx`` is the usual Spark answer at scale, but its
GK-sketch output is approximate AND depends on merge order — useless for
a cross-engine value gate and for the exact corpus-curation cutoffs
(e.g. "drop the shortest 10% of documents" must mean the same documents
on every run and engine).

Scale design
------------
The naive exact plan (global sort, pick row N*p) is a single-partition
sort at 10^12 rows.  Instead:

1. ``groupBy(value)`` — the shuffle cardinality becomes the number of
   DISTINCT values (document lengths: ~10^6 at crawl scale), not rows.
2. The distributed integer-keyed prefix sum from ``operators.sharding``
   (explicit range buckets from a min/max aggregate, per-bucket window,
   O(#partitions) driver offsets) turns counts into cumulative ranks —
   no global sort anywhere.
3. Each requested rank r_p = ceil(p * N) (computed with per-mille
   integer math, no floats) selects the unique value whose cumulative
   range (start, start + count] covers it — a filter over a literal
   array, not a join.

This is the "lower discrete quantile" convention: the smallest value v
with cum(v) >= r (type-1 / inverse-CDF), replayed identically by the
SQL oracle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sharding import global_prefix_starts

DEFAULT_PERMILLE = (100, 250, 500, 750, 900, 990)


def exact_quantiles(df: DataFrame, col: str,
                    permille: Sequence[int] = DEFAULT_PERMILLE,
                    num_partitions: int | None = None) -> DataFrame:
    """(pm, rank, value): for each requested per-mille probability, the
    exact rank r = ceil(pm * N / 1000) and the value at that rank.
    NULL values are excluded from the population (SQL convention)."""
    counts = (
        df.filter(F.col(col).isNotNull())
        .groupBy(F.col(col).cast("long").alias("val"))
        .agg(F.count("*").cast("long").alias("c"))
    )
    pre, total = global_prefix_starts(
        counts, order_col="val", tokens_col="c",
        num_partitions=num_partitions)
    if total <= 0:
        return pre.sparkSession.createDataFrame(
            [], "pm long, rank long, value long")
    targets = [
        (int(pm), (int(pm) * int(total) + 999) // 1000)
        for pm in permille
    ]
    probe = F.array(*[
        F.struct(F.lit(pm).cast("long").alias("pm"),
                 F.lit(r).cast("long").alias("r"))
        for pm, r in targets
    ])
    hits = F.filter(
        probe, lambda s: (F.col("_start") < s["r"])
        & ((F.col("_start") + F.col("c")) >= s["r"]))
    return (
        pre.select(F.col("val"), F.explode(hits).alias("hit"))
        .select(F.col("hit.pm").alias("pm"), F.col("hit.r").alias("rank"),
                F.col("val").alias("value"))
    )

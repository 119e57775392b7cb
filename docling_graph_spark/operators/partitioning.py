"""Partitioning guards shared by compute-heavy operators.

A table read from few/fat parquet files yields few input splits, and any
expensive projection in the scan stage (shingle explode + per-shingle
hashing, per-pair array folds) inherits that parallelism — on a
1000-executor cluster a single hot split serializes the whole stage.  The
guard below redistributes the *narrow* input rows before the heavy
expressions when (and only when) the scan is under-split; with a healthy
input layout it is a no-op, so production tables pay nothing.

Non-equi joins deserve special note: Catalyst executes them as
BroadcastNestedLoopJoin, whose parallelism is exactly the streamed side's
partition count — there is no shuffle that could recover parallelism later,
so the guard on the streamed side is the difference between 1 task and N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ensure_min_partitions(df: DataFrame, key: str,
                          target: int | None = None) -> DataFrame:
    """Round-robin the rows over >= target partitions (default: the
    cluster's defaultParallelism) when the current layout has fewer.

    Hash-distributes on `key` — deterministic, and for the id-like keys used
    here effectively uniform, so no salting is needed.
    """
    spark = df.sparkSession
    target = target or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, F.col(key))

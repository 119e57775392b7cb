"""Bucketed stage tables: co-located joins without a per-query shuffle.

At 100 TB the lineage joins (J5 in SURVEY §2.3 — docs↔chunks↔mentions↔nodes
on `url`) dominate shuffle volume if each downstream job re-partitions the
same tables on the same key.  Writing the stage tables **bucketed by url**
moves that shuffle to write time, once: every subsequent join between tables
bucketed on the same key with the same bucket count is planned by Catalyst
as a zero-Exchange sort-merge join (each task reads matching bucket files
from both sides).  This is the table-layout analogue of the pipeline's
salted `repartition` — the repartition fixes intra-job parallelism, the
bucket layout fixes inter-job shuffle reuse.

Spark's bucketed writes go through the session catalog (`saveAsTable`), so
callers address tables by name, not path — in production the same call
targets an Iceberg catalog, whose bucket partition transform
(`bucket(N, url)`) Spark 3.3+ uses for storage-partitioned joins the same
way.

Verification of the no-shuffle property lives in
`tests/test_bucketing.py`: it asserts the physical plan of a
bucketed-bucketed join contains no Exchange on either side.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_cols: Sequence[str],
                   num_buckets: int = 32,
                   sort_cols: Optional[Sequence[str]] = None,
                   mode: str = "overwrite") -> None:
    """Write `df` as a parquet table bucketed (and optionally sorted) on
    `bucket_cols`.  `num_buckets` must match across the tables that will be
    joined for the exchange to be elided — pick one value per key domain
    (we use one bucket count for every url-keyed stage table).
    """
    writer = (df.write.mode(mode).format("parquet")
              .bucketBy(num_buckets, *bucket_cols))
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed stage table back; bucket metadata rides along from
    the catalog, so joins on the bucket key skip their Exchange."""
    return spark.table(table)


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle Exchange (test/diag
    helper for asserting co-located execution)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" in plan

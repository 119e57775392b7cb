"""Checkpointed, resumable runs (SURVEY §2.9).

The reference is one-shot per document; resumability in the rebuild maps to
table-snapshot checkpoints, not Structured Streaming: every stage writes a
table, and a restarted job anti-joins its input against the keys already
present in the output — only unprocessed documents are recomputed, and the
append is idempotent at the key level.

On a production cluster the tables are Iceberg (atomic snapshot commits,
incremental reads between snapshot ids, time travel for lineage); in this
sandbox the same protocol runs on plain parquet datasets — the operator
shapes (left_anti restart, keyed append, run manifest) are identical, only
the commit atomicity differs.  Citations: reference metadata sink
`/root/reference/docling_graph/pipeline/orchestrator.py:149-240` (the run
manifest), resume protocol per SURVEY §2.9.

Scale notes: the anti-join's build side is only the key column of the done
set (column pruning keeps it narrow); with Iceberg the done-keys scan prunes
to the partitions the restart touches.  Appends are partitioned by url-host
bucket so a resumed run's writes land in the same layout.
"""

from __future__ import annotations

import time
from dataclasses import asdict
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pipeline import PipelineConfig, PipelineResult, run_pipeline

STAGES = ("extracted", "chunks", "doc_mentions", "nodes", "edges", "metrics")


def completed_keys(spark: SparkSession, table_path: str,
                   key: str = "url") -> Optional[DataFrame]:
    """Keys already committed to a stage table; None when no checkpoint."""
    try:
        return spark.read.parquet(table_path).select(key).distinct()
    except Exception:
        return None


def pending_inputs(inputs: DataFrame, done: Optional[DataFrame],
                   key: str = "url") -> DataFrame:
    """left_anti restart: rows of `inputs` not yet in the done set."""
    if done is None:
        return inputs
    return inputs.join(done, key, "left_anti")


def host_bucket(url_col, n_buckets: int = 64):
    """Stable url-host bucket used as the write partition column."""
    return F.pmod(F.xxhash64(F.parse_url(url_col, F.lit("HOST"))),
                  F.lit(n_buckets))


class CheckpointedRun:
    """Drive the document→graph pipeline with per-stage table checkpoints.

    `run()` processes only the documents whose url is absent from the
    `extracted` checkpoint, appends every stage table, and records a run
    manifest — calling it repeatedly with overlapping inputs converges with
    no duplicate work and no duplicate rows.
    """

    def __init__(self, spark: SparkSession, root: str,
                 config: Optional[PipelineConfig] = None,
                 n_buckets: int = 64):
        self.spark = spark
        self.root = root.rstrip("/")
        self.config = config or PipelineConfig()
        self.n_buckets = n_buckets

    def _path(self, stage: str) -> str:
        return f"{self.root}/{stage}"

    def run(self, web_pages: DataFrame) -> int:
        """Process pending inputs; returns number of newly processed docs."""
        done = completed_keys(self.spark, self._path("extracted"))
        todo = pending_inputs(web_pages, done)
        # cheap emptiness probe: limit(1) avoids a full count of the input
        if todo.limit(1).isEmpty():
            self._manifest(0, 0.0)
            return 0

        t0 = time.perf_counter()
        # self-read-write hazard: `todo`'s plan reads the very table the
        # appends below write to, so any recompute after the first append
        # would see its own output and drop rows.  Eagerly truncate the
        # lineage — Iceberg's snapshot isolation gives this for free; on
        # parquet, localCheckpoint is the stand-in.
        todo = todo.localCheckpoint(eager=True)
        res = run_pipeline(todo, self.config)
        # the extraction/chunk/mention UDF stages feed every downstream
        # write — persist them once so the six appends don't recompute (on a
        # cluster these would be intermediate Iceberg tables)
        res.persist()

        extracted = res.extracted.withColumn(
            "bucket", host_bucket(F.col("url"), self.n_buckets)
        )
        extracted.write.mode("append").partitionBy("bucket").parquet(
            self._path("extracted")
        )
        res.chunks.write.mode("append").parquet(self._path("chunks"))
        res.doc_mentions.write.mode("append").parquet(self._path("doc_mentions"))
        # graph relations are url-derived, so appends stay disjoint per run;
        # Term nodes can repeat across runs — readers dedup by id (idempotent
        # content-hash ids make that a dropDuplicates, not a merge)
        res.nodes.write.mode("append").parquet(self._path("nodes"))
        res.edges.write.mode("append").parquet(self._path("edges"))
        res.metrics.write.mode("append").parquet(self._path("metrics"))

        processed = res.extracted.count()
        res.unpersist()
        self._manifest(processed, time.perf_counter() - t0)
        return processed

    def nodes(self) -> DataFrame:
        """Graph nodes across all committed runs (id-level dedup)."""
        return self.spark.read.parquet(self._path("nodes")).dropDuplicates(["id"])

    def edges(self) -> DataFrame:
        return self.spark.read.parquet(self._path("edges")).dropDuplicates(
            ["src", "dst", "label"]
        )

    def extracted(self) -> DataFrame:
        return self.spark.read.parquet(self._path("extracted"))

    def _manifest(self, processed: int, wall_seconds: float) -> None:
        """S12 run-manifest row (`orchestrator.py:149-240` analogue)."""
        row = {
            "run_ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
            "processed_docs": processed,
            "wall_seconds": round(wall_seconds, 3),
            **{f"cfg_{k}": str(v) for k, v in asdict(self.config).items()},
        }
        self.spark.createDataFrame([row]).write.mode("append").json(
            self._path("runs")
        )

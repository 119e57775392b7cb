"""Lineage truncation policy for iterative operators.

Every iterative loop in this package (link-graph rounds, pointer
jumping, dedup clustering) must cut lineage each round or the logical
plan grows without bound.  Two mechanisms exist:

* ``DataFrame.localCheckpoint`` — blocks stored on EXECUTORS.  Fast (no
  external filesystem round-trip) and the right default in local mode
  and on stable clusters, but the blocks die with their executor: on a
  real cluster with preemption/decommissioning, an executor loss
  mid-iteration kills the job, because the truncated lineage cannot be
  recomputed.
* ``DataFrame.checkpoint`` — blocks written to the RELIABLE checkpoint
  directory (``SparkContext.setCheckpointDir``, typically HDFS/S3).
  Slower per round, but any executor can re-read them, so a 100-TB
  iterative job survives preemption.

``configure(reliable=True, checkpoint_dir=...)`` flips every loop that
routes through :func:`cut` to the reliable form — the cluster-scale
mode ``run_job.py`` exposes as ``--reliable-checkpoints``.  The two
modes are output-identical (checkpointing only pins data, it never
changes values); ``tests/test_checkpointing.py`` drives an iterative
operator under both and asserts hash-equal results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_STATE = {"reliable": False}


def configure(reliable: bool = False, checkpoint_dir: str | None = None,
              spark=None) -> None:
    """Select the lineage-truncation mode.  ``reliable=True`` requires a
    checkpoint directory: pass one here (with an active ``spark``
    session or let the next :func:`cut` caller's session pick it up via
    an already-configured ``setCheckpointDir``)."""
    _STATE["reliable"] = bool(reliable)
    if checkpoint_dir is not None and spark is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)


def is_reliable() -> bool:
    return _STATE["reliable"]


def cut(df: DataFrame, eager: bool = False) -> DataFrame:
    """Truncate ``df``'s lineage under the configured policy.

    In reliable mode the eager flag is forwarded to ``checkpoint``;
    callers that rely on laziness (deferring materialization until the
    convergence probe) keep that behavior in both modes."""
    if _STATE["reliable"]:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)

"""Resumable checkpointed runs: left_anti restart, idempotent re-run,
convergence with the one-shot pipeline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docling_graph_spark.checkpointing import (
    CheckpointedRun, completed_keys, pending_inputs,
)
from docling_graph_spark.pipeline import PipelineConfig, run_pipeline
from docling_graph_spark.sources.web_pages import synthesize_web_pages

CFG = PipelineConfig(id_mode="xxhash64")


@pytest.fixture(scope="module")
def pages(spark, sf_smoke_dir):
    return synthesize_web_pages(spark, sf_smoke_dir)


def test_pending_inputs_no_checkpoint(spark, pages, tmp_path):
    done = completed_keys(spark, str(tmp_path / "nope"))
    assert done is None
    assert pending_inputs(pages, done) is pages


@pytest.mark.slow
def test_resume_processes_only_missing(spark, pages, tmp_path):
    root = str(tmp_path / "ckpt")
    first = pages.filter(F.crc32(F.col("url")) % 2 == 0)
    run = CheckpointedRun(spark, root, CFG)

    n1 = run.run(first)
    assert n1 == first.count()

    # restart over the FULL input: only the other half is processed
    n2 = run.run(pages)
    assert n1 + n2 == pages.count()

    # third run is a no-op
    assert run.run(pages) == 0

    # converges to the one-shot result: same extracted urls, same graph ids
    oneshot = run_pipeline(pages, CFG)
    ck_urls = {r[0] for r in run.extracted().select("url").collect()}
    os_urls = {r[0] for r in oneshot.extracted.select("url").collect()}
    assert ck_urls == os_urls

    ck_nodes = {r[0] for r in run.nodes().select("id").collect()}
    os_nodes = {r[0] for r in oneshot.nodes.select("id").collect()}
    assert ck_nodes == os_nodes

    ck_edges = run.edges().count()
    assert ck_edges == oneshot.edges.count()

    # run manifest recorded one row per run() call
    runs = spark.read.json(f"{root}/runs")
    assert runs.count() == 3
    assert {r["processed_docs"] for r in runs.collect()} == {n1, n2, 0}


@pytest.mark.slow
def test_crashed_run_is_invisible_and_retried(spark, pages, tmp_path):
    """Iceberg-style commit semantics on parquet: stage appends from a run
    that died before its manifest write (the commit point) must be invisible
    to readers AND to the resume anti-join, so the retry reprocesses those
    documents instead of silently losing their downstream tables."""
    root = str(tmp_path / "ckpt_crash")
    run = CheckpointedRun(spark, root, CFG)

    half = pages.filter(F.crc32(F.col("url")) % 2 == 0)
    n1 = run.run(half)
    assert n1 == half.count()

    # simulate a crash: append all six stage tables for the other half but
    # die before the manifest commit
    other = pages.filter(F.crc32(F.col("url")) % 2 != 0)
    res = run_pipeline(other.localCheckpoint(eager=True), CFG).persist()
    run._append_stages(res, "deadbeef-crashed")
    res.unpersist()

    # orphan rows are invisible: readers show only the committed half
    committed_urls = {r[0] for r in run.extracted().select("url").collect()}
    assert committed_urls == {r[0] for r in half.select("url").collect()}

    # the retry reprocesses exactly the crashed documents...
    n2 = run.run(pages)
    assert n2 == other.count()

    # ...and the final state equals the one-shot result despite the
    # physically duplicated (orphaned) rows on disk
    oneshot = run_pipeline(pages, CFG)
    assert {r[0] for r in run.extracted().select("url").collect()} == \
        {r[0] for r in oneshot.extracted.select("url").collect()}
    assert {r[0] for r in run.nodes().select("id").collect()} == \
        {r[0] for r in oneshot.nodes.select("id").collect()}
    assert run.edges().count() == oneshot.edges.count()

    # raw table really does contain the orphans (the dead weight a
    # compaction/expire pass would reclaim) — proves the filter is doing
    # the work, not an accidental overwrite
    raw = spark.read.parquet(f"{root}/extracted")
    assert raw.count() == pages.count() + other.count()


@pytest.mark.slow
def test_compact_reclaims_only_orphans(spark, pages, tmp_path):
    """compact() rewrites stage tables without uncommitted-run orphans; a
    fully-committed checkpoint is untouched (zero reclaimed)."""
    root = str(tmp_path / "ckpt_compact")
    run = CheckpointedRun(spark, root, CFG)
    half = pages.filter(F.crc32(F.col("url")) % 2 == 0)
    run.run(half)

    assert set(run.compact().values()) == {0}

    other = pages.filter(F.crc32(F.col("url")) % 2 != 0)
    res = run_pipeline(other.localCheckpoint(eager=True), CFG).persist()
    run._append_stages(res, "deadbeef-crashed")
    n_orphan_extracted = res.extracted.count()
    res.unpersist()

    reclaimed = run.compact()
    assert reclaimed["extracted"] == n_orphan_extracted
    assert all(v > 0 for v in reclaimed.values())

    # physical rows now equal the committed view; readers unchanged
    raw = spark.read.parquet(f"{root}/extracted")
    assert raw.count() == half.count()
    assert {r[0] for r in run.extracted().select("url").collect()} == \
        {r[0] for r in half.select("url").collect()}

    # resume after compaction still reprocesses the crashed half
    assert run.run(pages) == other.count()


@pytest.mark.slow
def test_compact_files_binpacks_fragmented_table(spark, pages, tmp_path):
    """Many small incremental runs fragment the stage tables into one file
    per task per run; compact_files rewrites them toward the target size
    (file count drops, rows/values unchanged, partition layout kept)."""
    from docling_graph_spark.checkpointing import _data_file_stats

    root = str(tmp_path / "ckpt_files")
    run = CheckpointedRun(spark, root, CFG)
    # four tiny runs -> at least 4 data files per stage table
    urls = pages.select("url")
    for k in range(4):
        part = pages.filter(F.crc32(F.col("url")) % 4 == k)
        run.run(part)

    before_rows = run.extracted().count()
    before_chunks = spark.read.parquet(f"{root}/chunks").count()
    n_before = _data_file_stats(spark, f"{root}/extracted")[0]
    assert n_before >= 4

    packed = run.compact_files(target_bytes=256 << 20)
    assert "extracted" in packed  # fragmented table got rewritten
    n_after = _data_file_stats(spark, f"{root}/extracted")[0]
    assert n_after < n_before

    # content unchanged, bucket partition layout preserved
    assert run.extracted().count() == before_rows
    assert spark.read.parquet(f"{root}/chunks").count() == before_chunks
    ext = spark.read.parquet(f"{root}/extracted")
    assert "bucket" in ext.columns
    # resume protocol still sees everything as done
    assert run.run(pages) == 0
    # idempotent: a second pass finds nothing fragmented enough to rewrite
    assert run.compact_files(target_bytes=256 << 20) == {}


@pytest.mark.slow
def test_time_travel_snapshots(spark, pages, tmp_path):
    """as_of pins reads to a snapshot: the first run's rows only, whether
    addressed by sequence number or by run id."""
    root = str(tmp_path / "ckpt_tt")
    first = pages.filter(F.crc32(F.col("url")) % 2 == 0)
    run = CheckpointedRun(spark, root, CFG)
    n1 = run.run(first)
    n2 = run.run(pages)
    assert n1 and n2

    snaps = run.snapshots().collect()
    assert [int(s.seq) for s in snaps] == [1, 2]

    # latest view sees both runs
    assert run.extracted().count() == n1 + n2
    # snapshot 1 sees exactly the first run, by seq and by run id
    assert run.extracted(as_of=1).count() == n1
    assert run.extracted(as_of=snaps[0].run_id).count() == n1
    first_urls = {r.url for r in first.select("url").collect()}
    tt_urls = {r.url for r in
               run.extracted(as_of=1).select("url").collect()}
    assert tt_urls == first_urls
    # graph relations time-travel too
    assert run.nodes(as_of=1).count() < run.nodes().count()

    # an uncommitted / unknown run id must raise, not silently un-pin
    with pytest.raises(ValueError):
        run.extracted(as_of="nonexistent-run")

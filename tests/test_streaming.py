"""Structured-Streaming incremental ingestion: offset-checkpointed drains,
no reprocessing across restarts, convergence with the batch pipeline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docling_graph_spark.pipeline import PipelineConfig, run_pipeline
from docling_graph_spark.sources.web_pages import synthesize_web_pages
from docling_graph_spark.streaming.incremental import run_incremental

CFG = PipelineConfig(id_mode="xxhash64")


def test_incremental_stream_drains_and_converges(spark, sf_smoke_dir, tmp_path):
    pages = synthesize_web_pages(spark, sf_smoke_dir)
    inbox = str(tmp_path / "inbox")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    half1 = pages.filter(F.crc32(F.col("url")) % 2 == 0)
    half2 = pages.filter(F.crc32(F.col("url")) % 2 == 1)

    # crawl batch 1 arrives
    half1.write.mode("append").parquet(inbox)
    run_incremental(spark, inbox, out, ckpt, CFG)
    extracted = spark.read.parquet(f"{out}/extracted")
    n1 = extracted.count()
    assert n1 == half1.count()

    # re-trigger with nothing new: stream offsets prevent reprocessing
    run_incremental(spark, inbox, out, ckpt, CFG)
    assert spark.read.parquet(f"{out}/extracted").count() == n1

    # crawl batch 2 arrives; only the new files are drained
    half2.write.mode("append").parquet(inbox)
    run_incremental(spark, inbox, out, ckpt, CFG)
    final = spark.read.parquet(f"{out}/extracted")
    assert final.count() == pages.count()
    assert final.select("url").distinct().count() == pages.count()

    # converges with the one-shot batch pipeline
    oneshot = run_pipeline(pages, CFG)
    s_urls = {r[0] for r in final.select("url").collect()}
    b_urls = {r[0] for r in oneshot.extracted.select("url").collect()}
    assert s_urls == b_urls
    assert (spark.read.parquet(f"{out}/chunks").count()
            == oneshot.chunks.count())
    assert (spark.read.parquet(f"{out}/doc_mentions").count()
            == oneshot.doc_mentions.count())

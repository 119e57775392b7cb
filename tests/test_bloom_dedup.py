"""Bloom-filter seen-url gate (operators/bloom.py + the stream wiring).

Correctness contract: the filter may say "maybe seen" for a new url (false
positive, costs one join probe) but must NEVER say "new" for a seen url —
so the bloom-gated dedup stream produces the byte-identical extracted
table as the plain anti-join.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from docling_graph_spark.operators import bloom as op_bloom
from docling_graph_spark.pipeline import PipelineConfig, run_pipeline
from docling_graph_spark.sources.web_pages import synthesize_web_pages
from docling_graph_spark.streaming.incremental import run_incremental

CFG = PipelineConfig(id_mode="xxhash64")
BITS = 1 << 16


def _urls(spark, prefix: str, n: int):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("url"))


def test_no_false_negatives(spark):
    """Every inserted value probes positive — the load-bearing property."""
    seen = _urls(spark, "https://a.example/p", 2000)
    words = op_bloom.bloom_words(seen, "url", BITS)
    probed = op_bloom.bloom_maybe_seen(seen, "url", words, BITS)
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_false_positive_rate_bounded(spark):
    """Disjoint probes flag at roughly the designed rate, not wholesale."""
    n = 2000
    bits = op_bloom.bloom_num_bits(n, fpr=0.01)
    words = op_bloom.bloom_words(_urls(spark, "https://a.example/p", n),
                                 "url", bits)
    other = _urls(spark, "https://b.example/q", n)
    fp = (op_bloom.bloom_maybe_seen(other, "url", words, bits)
          .filter(F.col("maybe_seen")).count())
    # 1% design point; allow generous slack for hash variance
    assert fp / n < 0.05


def test_update_is_associative(spark):
    """bloom(A ∪ B) == update(bloom(A), bloom(B)) bit-for-bit — batch
    boundaries cannot change the filter."""
    a = _urls(spark, "https://a.example/p", 500)
    b = _urls(spark, "https://b.example/q", 500)
    whole = op_bloom.bloom_words(a.unionByName(b), "url", BITS)
    merged = op_bloom.bloom_update(
        op_bloom.bloom_words(a, "url", BITS),
        op_bloom.bloom_words(b, "url", BITS))
    assert whole.exceptAll(merged).count() == 0
    assert merged.exceptAll(whole).count() == 0


def test_probe_plan_broadcasts_and_never_shuffles_big_side(spark):
    """The membership probe must be k broadcast joins: no Exchange of the
    probed relation, no cartesian/nested-loop join."""
    seen = _urls(spark, "https://a.example/p", 100)
    words = op_bloom.bloom_words(seen, "url", BITS)
    plan = (op_bloom.bloom_maybe_seen(seen, "url", words, BITS)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the only exchanges allowed are the broadcast ones and the tiny
    # words-table aggregation; the probed side itself must not shuffle
    import re

    non_broadcast = [ln for ln in plan.splitlines()
                     if re.search(r"\bExchange (?!.*broadcast)", ln)
                     and "hashpartitioning(pos" not in ln
                     and "hashpartitioning(word" not in ln]
    assert non_broadcast == [], non_broadcast


def test_bloom_gated_stream_matches_plain_antijoin(spark, sf_smoke_dir,
                                                   tmp_path):
    """End-to-end: two drains with re-crawls, bloom gate on — the extracted
    table equals the plain dedup_urls run row-for-row."""
    pages = synthesize_web_pages(spark, sf_smoke_dir)
    inbox = str(tmp_path / "inbox")
    outs = {"plain": str(tmp_path / "out_plain"),
            "bloom": str(tmp_path / "out_bloom")}
    ckpts = {k: str(tmp_path / f"ckpt_{k}") for k in outs}

    batch1 = pages.filter(F.crc32(F.col("url")) % 2 == 0)
    pages.limit(0).write.mode("append").parquet(inbox)  # schema dir
    batch1.write.mode("append").parquet(inbox)
    for k, out in outs.items():
        run_incremental(spark, inbox, out, ckpts[k], CFG, dedup_urls=True,
                        bloom_bits=BITS if k == "bloom" else 0)

    # batch 2: re-crawl of everything (half duplicates) plus the other half
    (pages.withColumn("warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1 DAY"))
     .write.mode("append").parquet(inbox))
    for k, out in outs.items():
        run_incremental(spark, inbox, out, ckpts[k], CFG, dedup_urls=True,
                        bloom_bits=BITS if k == "bloom" else 0)

    plain = spark.read.parquet(f"{outs['plain']}/extracted")
    bloom = spark.read.parquet(f"{outs['bloom']}/extracted")
    cols = ["url", "text", "lang"]
    assert bloom.count() == plain.count()
    assert bloom.select(cols).exceptAll(plain.select(cols)).count() == 0
    assert plain.select(cols).exceptAll(bloom.select(cols)).count() == 0
    # one row per url, and the bloom filter table exists with meta
    assert bloom.select("url").distinct().count() == bloom.count()
    import os

    assert os.path.exists(f"{outs['bloom']}/url_bloom/_bloom_meta.json")


def test_bloom_rebuilds_from_ledger_when_missing(spark, sf_smoke_dir,
                                                 tmp_path):
    """Deleting the filter (prior run without the gate, crash before first
    publish) must not cause duplicates: the gate rebuilds from the url
    ledger before trusting itself."""
    import shutil

    pages = synthesize_web_pages(spark, sf_smoke_dir).limit(60)
    inbox = str(tmp_path / "inbox")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    pages.write.mode("append").parquet(inbox)
    run_incremental(spark, inbox, out, ckpt, CFG, dedup_urls=True,
                    bloom_bits=BITS)
    n1 = spark.read.parquet(f"{out}/extracted").count()
    shutil.rmtree(f"{out}/url_bloom")

    # full re-crawl arrives; with no filter on disk a naive gate would
    # treat every url as definitely-new
    (pages.withColumn("warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1 DAY"))
     .write.mode("append").parquet(inbox))
    run_incremental(spark, inbox, out, ckpt, CFG, dedup_urls=True,
                    bloom_bits=BITS)
    assert spark.read.parquet(f"{out}/extracted").count() == n1
    import os

    assert os.path.exists(f"{out}/url_bloom/_bloom_meta.json")


def test_big_probe_matches_broadcast_probe(spark):
    """The non-broadcast (sharded-scale) probe returns the identical
    verdict per value as the broadcast probe — same filter, same hashes,
    different physical plan."""
    seen = _urls(spark, "https://a.example/p", 1500)
    probe = _urls(spark, "https://a.example/p", 1000).unionByName(
        _urls(spark, "https://b.example/q", 1000))
    bits = op_bloom.bloom_num_bits(1500, fpr=0.05)
    words = op_bloom.bloom_words(seen, "url", bits)

    small = op_bloom.bloom_maybe_seen(probe, "url", words, bits)
    big = op_bloom.bloom_maybe_seen_big(probe, "url", words, bits)

    diff = (small.select("url", "maybe_seen")
            .join(big.withColumnRenamed("maybe_seen", "ms_big"), "url")
            .filter(F.col("maybe_seen") != F.col("ms_big")))
    assert diff.count() == 0
    # inserted values must all probe positive through the big path too
    ins = big.join(seen, "url", "left_semi")
    assert ins.filter(~F.col("maybe_seen")).count() == 0

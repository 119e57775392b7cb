"""Corpus-curation funnel (docling_graph_spark/curation.py)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from docling_graph_spark.curation import CurationConfig, CurationResult, curate


@pytest.fixture(scope="module")
def docs(spark, sf_smoke_dir):
    return (
        spark.read.parquet(f"{sf_smoke_dir}/documents.parquet")
        .selectExpr(
            "concat('https://h', cast(doc_id % 7 as string), "
            "'.example.com/d/', cast(doc_id as string)) as url",
            "text", "lang")
    )


@pytest.fixture(scope="module")
def result(docs) -> CurationResult:
    return curate(docs, CurationConfig(host_cap=10, shard_budget=500))


def test_funnel_monotonic_and_named(result):
    names = [s for s, _ in result.funnel]
    assert names == ["input", "unique_url", "gopher_quality",
                     "lm_fluency", "exact_dedup", "host_cap", "curated"]
    counts = [n for _, n in result.funnel]
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert counts[0] > 0 and counts[-1] > 0


def test_host_cap_applied(result):
    per_host = (
        result.curated
        .groupBy(F.try_parse_url("url", F.lit("HOST")).alias("h"))
        .agg(F.count("*").alias("n")).collect()
    )
    assert all(r["n"] <= 10 for r in per_host)


def test_splits_and_shards(result):
    rows = result.curated.select("split", "shard_id").collect()
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    for r in rows:
        if r["split"] == "train":
            assert r["shard_id"] >= 0
        else:
            assert r["shard_id"] == -1
    n_curated = dict(result.funnel)["curated"]
    assert len(rows) == n_curated


def test_deterministic_rerun(docs, result):
    again = curate(docs, CurationConfig(host_cap=10, shard_budget=500))
    assert again.funnel == result.funnel
    a = sorted(map(tuple, result.curated.collect()))
    b = sorted(map(tuple, again.curated.collect()))
    assert a == b


def test_run_job_curate_mode(spark, sf_smoke_dir, tmp_path, capsys):
    import sys

    import run_job

    out_dir = str(tmp_path / "cur_out")
    old = sys.argv
    sys.argv = ["run_job.py", "--sf-dir", sf_smoke_dir, "--output", out_dir,
                "--mode", "curate", "--host-cap", "10",
                "--shard-budget", "500", "--max-tokens", "25"]
    try:
        rc = run_job.main()
    finally:
        sys.argv = old
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    summary = json.loads(out[-1])
    funnel = json.load(open(f"{out_dir}/funnel.json"))
    assert summary["processed_docs"] == funnel["curated"] > 0
    curated = spark.read.parquet(f"{out_dir}/curated")
    assert curated.count() == funnel["curated"]
    assert os.path.isdir(f"{out_dir}/curated")


def test_adversarial_corpus_flows_through(spark):
    """NULL/empty/whitespace/single-word texts and junk urls must flow
    through every gate without crashing; none survive the quality gates
    (word-count floor) except the long fluent docs."""
    # 60 distinct medium-length words: passes word-count floor, mean-len
    # band, and the top-word/top-bigram repetition gates
    fluent = " ".join(f"token{i:03d}" for i in range(60))
    rows = (
        [(f"https://ok.example.com/{i}", fluent + f" tail{i}", "en")
         for i in range(30)]
        + [("https://bad.example.com/null", None, "en"),
           ("https://bad.example.com/empty", "", "en"),
           ("https://bad.example.com/space", "   ", "en"),
           ("https://bad.example.com/one", "word", "en"),
           ("not a url at all", fluent, "en")]
    )
    docs = spark.createDataFrame(rows, "url string, text string, lang string")
    res = curate(docs, CurationConfig(host_cap=50, shard_budget=200))
    funnel = dict(res.funnel)
    assert funnel["input"] == 35
    # the 30 fluent docs + the junk-url fluent doc pass quality gates
    assert funnel["gopher_quality"] == 31
    assert funnel["curated"] == 31
    assert res.curated.filter(F.col("text").isNull()).count() == 0


def test_per_lang_fluency_config(spark):
    """fluency_per_lang routes each language through its own model: a
    minority language that a global model would gate out survives."""
    en = " ".join(f"token{i:03d}" for i in range(60))
    xx = " ".join(f"zqxw{i:03d}" for i in range(60))
    rows = ([(f"https://e.example.com/{i}", en + f" t{i}", "en")
             for i in range(30)]
            + [(f"https://x.example.com/{i}", xx + f" z{i}", "xx")
               for i in range(10)])
    docs = spark.createDataFrame(rows, "url string, text string, lang string")
    per = curate(docs, CurationConfig(host_cap=None, fluency_per_lang=True))
    assert dict(per.funnel)["lm_fluency"] == 40


def test_near_dup_stage_drops_transitive_cluster(spark):
    """With near_dup_jaccard set, a chain of near-identical docs (a~b,
    b~c) collapses to ONE survivor even if a and c differ more — the
    connected-components semantics pairwise dropping would miss."""
    base = " ".join(f"token{i:03d}" for i in range(200))
    words = base.split()
    v1, v2, v3 = list(words), list(words), list(words)
    v2[10] = "changed"                       # b ~ a
    v3[10] = "changed"; v3[120] = "also"     # c ~ b, farther from a
    others = [(f"https://u.example.com/{i}",
               " ".join(f"word{i}x{j:03d}" for j in range(200)), "en")
              for i in range(5)]
    rows = ([("https://d.example.com/a", " ".join(v1), "en"),
             ("https://d.example.com/b", " ".join(v2), "en"),
             ("https://d.example.com/c", " ".join(v3), "en")] + others)
    docs = spark.createDataFrame(rows, "url string, text string, lang string")
    res = curate(docs, CurationConfig(host_cap=None, near_dup_jaccard=80,
                                      fluency_threshold=None))
    funnel = dict(res.funnel)
    assert funnel["exact_dedup"] == 8
    assert funnel["near_dup"] == 6          # b and c dropped, a survives
    kept = {r["url"] for r in res.curated.collect()}
    assert "https://d.example.com/a" in kept
    assert "https://d.example.com/b" not in kept
    assert "https://d.example.com/c" not in kept


def test_run_job_curate_flags_and_wet(spark, sf_smoke_dir, tmp_path,
                                      capsys):
    import sys

    import run_job

    out_dir = str(tmp_path / "cflag_out")
    wet_dir = str(tmp_path / "wet")
    old = sys.argv
    sys.argv = ["run_job.py", "--sf-dir", sf_smoke_dir, "--output", out_dir,
                "--mode", "curate", "--host-cap", "10",
                "--near-dup-jaccard", "80", "--per-lang-fluency",
                "--wet-output", wet_dir, "--max-tokens", "25"]
    try:
        rc = run_job.main()
    finally:
        sys.argv = old
    assert rc == 0
    funnel = json.load(open(f"{out_dir}/funnel.json"))
    assert "near_dup" in funnel and funnel["curated"] > 0
    wet_files = [f for f in os.listdir(wet_dir) if f.endswith(".warc.gz")]
    assert wet_files, os.listdir(wet_dir)


def test_duplicate_urls_normalized(spark):
    """Re-captured urls collapse to one deterministic row before any
    gate, so joins can't multiply rows and the curated count is exact."""
    base = " ".join(f"token{i:03d}" for i in range(60))
    rows = ([("https://r.example.com/a", base + " v1", "en"),
             ("https://r.example.com/a", base + " v2", "en"),
             ("https://r.example.com/b", base + " b", "en")])
    docs = spark.createDataFrame(rows, "url string, text string, lang string")
    res = curate(docs, CurationConfig(host_cap=None,
                                      fluency_threshold=None))
    f = dict(res.funnel)
    assert f["input"] == 3 and f["unique_url"] == 2
    assert res.curated.count() == f["curated"] == 2
    # deterministic winner: min md5(text)
    again = curate(docs.repartition(7), CurationConfig(
        host_cap=None, fluency_threshold=None))
    assert sorted(map(tuple, res.curated.collect())) == \
        sorted(map(tuple, again.curated.collect()))

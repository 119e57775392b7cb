"""End-to-end pipeline tests on the sf0.001 synthetic corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docling_graph_spark.pipeline import PipelineConfig, run_on_testdata
from docling_graph_spark.sources.web_pages import synthesize_web_pages


@pytest.fixture(scope="module")
def result(spark, sf_smoke_dir):
    cfg = PipelineConfig(max_tokens=25, id_mode="xxhash64")
    return run_on_testdata(spark, sf_smoke_dir, cfg)


def test_extracted_text_byte_identical(spark, sf_smoke_dir):
    """THE invariant: extracted text per url == source text, byte for byte,
    for both HTML and fake-PDF payload rows."""
    from docling_graph_spark.operators.extract import extract_main_text

    pages = synthesize_web_pages(spark, sf_smoke_dir)
    extracted = extract_main_text(pages)
    mismatches = (
        extracted.join(pages.select("url", F.col("text").alias("truth")), "url")
        .filter(
            (F.col("text") != F.col("truth")) | F.col("error").isNotNull()
        )
    )
    rows = mismatches.select("url", "kind", "error").limit(5).collect()
    assert mismatches.count() == 0, f"mismatched extractions: {rows}"
    kinds = dict(
        extracted.groupBy("kind").count().collect()
    )
    assert kinds.get("pdf", 0) > 0 and kinds.get("html", 0) > 0


def test_bytes_stripped_positive(result):
    assert result.extracted.filter(
        (F.col("kind") == "html") & (F.col("bytes_stripped") <= 0)
    ).count() == 0


def test_chunks_cover_document(result, spark, sf_smoke_dir):
    """Chunk spans reconstruct the document text (single-space corpus:
    fixed-width splits, strip-gaps of at most 1 space)."""
    docs = spark.read.parquet(f"{sf_smoke_dir}/documents.parquet")
    joined = (
        result.chunks.groupBy("url")
        .agg(
            F.sum(F.col("end") - F.col("start")).alias("covered"),
            F.max("end").alias("max_end"),
            F.count("*").alias("n_chunks"),
        )
    )
    total = joined.count()
    assert total > 0
    # every document (44..577 chars) with max_tokens=25 (100 chars) chunks
    bad = joined.filter(
        (F.col("max_end") <= 0) | (F.col("covered") <= 0)
    ).count()
    assert bad == 0
    # multi-chunk docs exist (longest docs are > 100 chars)
    assert joined.filter(F.col("n_chunks") > 1).count() > 0


def test_chunk_count_matches_fixed_width_formula(result, spark, sf_smoke_dir):
    """On a delimiter-free corpus the greedy chunker degrades to fixed-width
    slicing: n_chunks == ceil(len/100)."""
    docs = spark.read.parquet(f"{sf_smoke_dir}/documents.parquet")
    expected = docs.select(
        F.col("text"),
        F.ceil(F.length("text") / 100.0).cast("long").alias("expected_chunks"),
        F.col("doc_id"),
    )
    from docling_graph_spark.sources.web_pages import url_expr

    expected = expected.select(
        url_expr(F.col("doc_id")).alias("url"), "expected_chunks"
    )
    actual = result.chunks.groupBy("url").agg(F.count("*").alias("n"))
    diff = expected.join(actual, "url").filter(
        F.col("n") != F.col("expected_chunks")
    )
    assert diff.count() == 0


def test_graph_structure(result):
    nodes, edges = result.nodes, result.edges
    labels = {r["label"] for r in nodes.select("label").distinct().collect()}
    assert labels == {"WebDocument", "Chunk", "Term"}
    elabels = {r["label"] for r in edges.select("label").distinct().collect()}
    assert elabels == {"has_chunk", "mentions"}
    # no orphans post-cleanup
    from docling_graph_spark.operators.graph import orphan_edge_count

    assert orphan_edge_count(nodes, edges) == 0
    # ids unique
    assert nodes.count() == nodes.select("id").distinct().count()


def test_fingerprint_no_collisions(result):
    from docling_graph_spark.operators.graph import fingerprint_collision_check

    assert fingerprint_collision_check(result.nodes).count() == 0


def test_blake2b_ids_match_reference_registry(spark, sf_smoke_dir):
    """Parity: relational blake2b node ids == reference NodeIDRegistry ids."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from parity.ref_loader import load_ref
    from pydantic import BaseModel

    ref_reg_mod = load_ref("core/converters/node_id_registry.py")

    class WebDocument(BaseModel):
        url: str
        model_config = {"graph_id_fields": ["url"]}

    cfg = PipelineConfig(max_tokens=25, id_mode="blake2b")
    res = run_on_testdata(spark, sf_smoke_dir, cfg)
    sample = (
        res.nodes.filter(F.col("label") == "WebDocument")
        .select("id", F.col("properties")["url"].alias("url"))
        .limit(20)
        .collect()
    )
    reg = ref_reg_mod.NodeIDRegistry()
    for row in sample:
        assert row["id"] == reg.get_node_id(WebDocument(url=row["url"]))


def test_metrics_shape(result):
    rows = result.metrics.collect()
    assert sum(r["docs_parsed"] for r in rows) == 500
    assert all(r["errors"] == 0 for r in rows)
    assert len(rows) > 7  # hosts spread


def test_hybrid_chunker_pipeline(spark, sf_smoke_dir):
    """chunker="hybrid" runs the heading-aware chunker end-to-end: chunk
    nodes carry a heading property (empty path on the heading-less synthetic
    corpus), graph assembles, and per-doc chunk spans still tile the text."""
    cfg = PipelineConfig(max_tokens=25, id_mode="xxhash64", chunker="hybrid")
    res = run_on_testdata(spark, sf_smoke_dir, cfg)
    labels = dict(res.nodes.groupBy("label").count().collect())
    assert labels.get("WebDocument", 0) > 0 and labels.get("Chunk", 0) > 0
    chunk_props = (
        res.nodes.filter(F.col("label") == "Chunk")
        .select(F.map_keys("properties").alias("ks")).limit(1).collect()
    )
    assert "heading" in chunk_props[0]["ks"]
    assert "batch_id" not in chunk_props[0]["ks"]
    # span lineage: chunk text equals the extracted text slice
    joined = (
        res.chunks.alias("c")
        .join(res.extracted.select("url", F.col("text").alias("doc")), "url")
        .withColumn("slice", F.expr("substring(doc, start + 1, end - start)"))
    )
    assert joined.filter(F.col("slice") != F.col("text")).count() == 0
    assert res.edges.filter(F.col("label") == "has_chunk").count() > 0


def test_connected_components_chain_and_clique(spark):
    """Min-label propagation: a 4-chain (transitive dups) and a triangle
    resolve to two components labelled by their min member."""
    from docling_graph_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),        # chain: {1,2,3,4}
         (10, 11), (11, 12), (10, 12)], # triangle: {10,11,12}
        "doc_a long, doc_b long",
    )
    for thr in (0, 100_000):  # distributed pointer-jumping AND driver union-find
        labels = {r.id: r.component
                  for r in connected_components(
                      pairs, driver_threshold=thr).collect()}
        assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10}


def test_ivf_recall_vs_brute_force(spark, sf_smoke_dir):
    """Index quality, not just plumbing: IVF top-5 with nprobe=4 of 16 lists
    must recover most of the exact top-5 on the smoke embeddings."""
    from docling_graph_spark.operators import ann as op_ann

    emb = spark.read.parquet(f"{sf_smoke_dir}/embeddings.parquet")
    queries = emb.limit(8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    exact = op_ann.brute_force_knn(emb, queries, k=5)
    approx = op_ann.ivf_knn(emb, queries, k=5, n_centroids=16, nprobe=4)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.6, f"IVF recall {recall:.2f} below floor"


def test_connected_components_long_path(spark):
    """Pointer jumping: a 60-node path converges well within the round
    budget (plain neighbor-min needs diameter rounds and would not)."""
    from docling_graph_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "doc_a long, doc_b long"
    )
    labels = connected_components(pairs, driver_threshold=0)
    comps = {r.component for r in labels.collect()}
    assert comps == {0}
    assert labels.count() == 61


@pytest.mark.slow
def test_connected_components_paths_agree(spark):
    """Scale-adaptive equivalence: the driver union-find shortcut and the
    distributed pointer-jumping loop produce identical labelings on random
    graphs (mixed cliques, chains, stars, singleton-pair edges)."""
    import random

    from docling_graph_spark.operators.dedup import connected_components

    rng = random.Random(42)
    for trial in range(3):
        n = 80
        edges = set()
        while len(edges) < 70:
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        pairs = spark.createDataFrame(
            sorted(edges), "doc_a long, doc_b long")
        fast = {(r.id, r.component) for r in
                connected_components(pairs).collect()}
        dist = {(r.id, r.component) for r in
                connected_components(pairs, driver_threshold=0).collect()}
        assert fast == dist, f"trial {trial}"


def test_malformed_payloads_never_crash(spark):
    """Adversarial payload rows flow through the full pipeline as error /
    filtered rows — never exceptions, never dropped from the metrics."""
    import datetime

    from docling_graph_spark import schemas
    from docling_graph_spark.pipeline import run_pipeline

    ts = datetime.datetime(2024, 1, 1)
    rows = [
        ("https://a.example.com/ok", ts,
         b"<!DOCTYPE html><html><body><p>" + b"good content here " * 20
         + b"</p></body></html>", None, "en"),
        ("https://a.example.com/empty", ts, b"", None, "en"),
        ("https://a.example.com/null", ts, None, None, "en"),
        ("https://a.example.com/pdfjunk", ts, b"%PDF-1.4 garbage no objects",
         None, "en"),
        ("https://a.example.com/bad-utf8", ts,
         b"\xff\xfe<html><body><p>\xc3\x28 broken</p></body></html>",
         None, "en"),
        ("https://a.example.com/boilerplate-only", ts,
         b"<html><body><p></p></body></html>", None, "en"),
        ("https://a.example.com/nulls", ts,
         b"<html><body><p>text with nulls</p></body></html>", None, None),
    ]
    pages = spark.createDataFrame(rows, schema=schemas.WEB_PAGES)
    cfg = PipelineConfig(max_tokens=25, id_mode="xxhash64",
                         repartition_input=False)
    res = run_pipeline(pages, cfg)

    # every input row is accounted for in the raw extraction relation
    raw = res.extracted_all.collect()
    assert len(raw) == len(rows)
    by_url = {r["url"].rsplit("/", 1)[-1]: r for r in raw}
    assert by_url["ok"]["error"] is None and by_url["ok"]["text"]
    # junk rows surface as error values or empty text, never exceptions
    for key in ("empty", "null", "pdfjunk"):
        r = by_url[key]
        assert r["error"] is not None or not (r["text"] or "").strip(), key

    # downstream graph assembles from the surviving rows only, no crash
    nodes = res.nodes.collect()
    edges = res.edges.collect()
    assert any(n["label"] == "WebDocument" for n in nodes)
    ids = {n["id"] for n in nodes}
    assert all(e["src"] in ids and e["dst"] in ids for e in edges)

    # determinism: identical input -> identical node-id set
    res2 = run_pipeline(pages, cfg)
    assert {n["id"] for n in res2.nodes.collect()} == ids


def test_observation_counters_ride_first_action(spark, sf_smoke_dir):
    """df.observe side-channel: run-level docs/bytes/errors totals arrive
    with the FIRST output action — no extra job — and agree exactly with
    the per-host metrics relation's sums."""
    import pyspark.sql.functions as F

    from docling_graph_spark.pipeline import PipelineConfig, run_on_testdata

    res = run_on_testdata(spark, sf_smoke_dir, PipelineConfig(max_tokens=25))
    res.nodes.count()  # any action populates the observation
    got = res.run_counters
    m = res.metrics.agg(
        F.sum("docs_parsed"), F.sum("bytes_stripped"), F.sum("errors")
    ).collect()[0]
    assert (got["docs_parsed"], got["bytes_stripped"], got["errors"]) \
        == tuple(m)
    assert got["docs_parsed"] > 0

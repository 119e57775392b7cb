"""Scalar functions (SURVEY §2.8 F5-F8, P7) parity vs the reference
algorithms, and plan-inspection assertions that the 100 TB design contract
(pruning, pushdown, JVM-only hot paths, broadcasts) holds in the actual
physical plans."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from docling_graph_spark.functions import (
    format_property_key, sanitize_filename, token_estimate, truncate_string,
)
from docling_graph_spark import plans


# ---- reference re-derivations (semantics from the cited reference lines)

def ref_truncate(text: str, max_length: int, suffix: str = "...") -> str:
    """`string_formatter.py:50-73`"""
    if len(text) <= max_length:
        return text
    return text[: max_length - len(suffix)] + suffix


def ref_format_key(key: str) -> str:
    """`string_formatter.py:32-47`"""
    if "_" in key:
        return " ".join(w.capitalize() for w in key.split("_"))
    return re.sub(r"([A-Z])", r" \1", key).strip().title()


def ref_sanitize(filename: str) -> str:
    """`output_manager.py:16-59` minus the wall-clock timestamp"""
    safe = filename.replace(".", "_")
    safe = re.sub(r'[/\\:*?"<>|\[\](){}]', "_", safe)
    safe = safe.replace(" ", "_").strip("_")
    return safe[: 180 - 17]


@pytest.fixture(scope="module")
def one(spark):
    def run(col_expr, value):
        df = spark.createDataFrame([(value,)], ["v"])
        return df.select(col_expr(F.col("v")).alias("r")).collect()[0]["r"]
    return run


def test_truncate_string(one):
    for s in ["short", "x" * 100, "exactly_ten!", ""]:
        assert one(lambda c: truncate_string(c, 10), s) == ref_truncate(s, 10)
    with pytest.raises(ValueError):
        truncate_string(F.col("v"), 3)


def test_format_property_key(one):
    for k in ["snake_case_key", "camelCaseKey", "simple", "XMLParser",
              "already Title", "a_b_c"]:
        assert one(format_property_key, k) == ref_format_key(k), k


def test_sanitize_filename(one):
    for name in ["invoice.pdf", "My Document (2024).pdf", "a/b\\c:d*e",
                 "__edge__", "x" * 300]:
        assert one(sanitize_filename, name) == ref_sanitize(name), name


def test_token_estimate(one):
    # ceil(len/4 * 1.2) + 50  (`chunk_batcher.py:59-68,172-208`)
    import math
    for s in ["", "abcd", "x" * 1000]:
        assert one(token_estimate, s) == math.ceil(len(s) / 4 * 1.2) + 50


# ---- plan contracts


def test_projection_prunes_scan(spark, sf_correct_dir):
    docs = spark.read.parquet(f"{sf_correct_dir}/documents.parquet")
    q = docs.groupBy("lang").count()
    schemas = plans.scan_read_schemas(q)
    assert schemas and all("text" not in s for s in schemas), schemas


def test_filter_pushdown_reaches_scan(spark, sf_correct_dir):
    li = spark.read.parquet(f"{sf_correct_dir}/lineitem.parquet")
    q = li.filter(F.col("l_shipdate") <= "1995-01-01").select("l_quantity")
    pushed = plans.scan_pushed_filters(q)
    assert any("l_shipdate" in p for p in pushed), pushed


@pytest.mark.slow
def test_relational_queries_are_pure_jvm(spark, sf_correct_dir):
    """No Python eval nodes anywhere in the JVM-only catalog queries.

    link_graph_stats left this list in round 3: its iterative sections
    now solve each weakly-connected component inside ONE Arrow task
    (FlatMapGroupsInPandas — the sanctioned batched path), so it is
    checked separately: Arrow group solves allowed, row-at-a-time
    Python (BatchEvalPython) still forbidden."""
    from docling_graph_spark.queries import catalog

    cat = catalog()
    for name in ["lineitem_pricing", "orders_per_nation", "token_stats",
                 "minhash_lsh_dedup", "signature_stats", "ann_topk",
                 "semantic_dedup",
                 "langid_votes", "event_sessions"]:
        fn, _ = cat[name]
        nodes = plans.python_eval_nodes(fn(spark, sf_correct_dir))
        assert nodes == [], f"{name} runs Python: {nodes}"
    fn, _ = cat["link_graph_stats"]
    nodes = plans.python_eval_nodes(fn(spark, sf_correct_dir))
    assert set(nodes) <= {"FlatMapGroupsInPandas",
                          "FlatMapCoGroupsInPandas"}, nodes


def test_dimension_join_broadcasts(spark, sf_correct_dir):
    from docling_graph_spark.queries import catalog

    fn, _ = catalog()["orders_per_nation"]
    assert plans.has_broadcast_join(fn(spark, sf_correct_dir))


def test_pipeline_python_confined_to_kernels(spark, sf_smoke_dir):
    """The flagship pipeline uses Python ONLY for the extraction kernel
    (ArrowEvalPython); chunking is fused there too — everything downstream
    (mentions, graph assembly, cleanup) is JVM."""
    from docling_graph_spark.pipeline import PipelineConfig, run_on_testdata

    res = run_on_testdata(spark, sf_smoke_dir,
                          PipelineConfig(id_mode="xxhash64"))
    nodes = plans.python_eval_nodes(res.edges)
    assert set(nodes) <= {"ArrowEvalPython"}, nodes


def test_banded_near_dup_has_no_nested_loop(spark, sf_smoke_dir):
    """The scale-path near-dup plan must generate candidates via the band
    EQUI-join — no BroadcastNestedLoopJoin / CartesianProduct anywhere
    (the all-pairs baseline, by contrast, is exactly such a join)."""
    from docling_graph_spark.operators import ann as op_ann

    emb = spark.read.parquet(f"{sf_smoke_dir}/embeddings.parquet")
    banded = op_ann.near_dup_pairs_banded(emb, top_n=20)
    plan = plans.formatted_plan(banded)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

    allpairs = op_ann.near_dup_pairs(emb, top_n=20)
    ap_plan = plans.formatted_plan(allpairs)
    assert ("BroadcastNestedLoopJoin" in ap_plan
            or "CartesianProduct" in ap_plan)


def test_banded_near_dup_finds_planted_high_sim_pairs(spark):
    """LSH guarantee: pairs with high cosine survive banding w.h.p.  Plant
    5 near-identical pairs (cosine >= 0.98) among 200 deterministic noise
    vectors; the banded top-5 must be exactly the planted pairs."""
    import hashlib
    import struct

    from docling_graph_spark.operators import ann as op_ann

    def vec(seed: str):
        raw = b"".join(
            hashlib.blake2b(f"{seed}:{i}".encode(), digest_size=8).digest()
            for i in range(16)
        )
        return [
            (struct.unpack("<H", raw[2 * i: 2 * i + 2])[0] / 32768.0) - 1.0
            for i in range(64)
        ]

    rows = []
    for i in range(200):
        rows.append((i, vec(f"noise{i}")))
    # planted: a tiny deterministic perturbation of an existing vector
    for j in range(5):
        base = vec(f"noise{j}")
        rows.append((1000 + j, [v + 0.01 * ((j + k) % 3) for k, v in
                                enumerate(base)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    top = op_ann.near_dup_pairs_banded(emb, top_n=5).collect()
    found = {(r.vec_a, r.vec_b) for r in top}
    assert found == {(j, 1000 + j) for j in range(5)}


def test_materialized_pipeline_shares_one_extraction(spark, sf_smoke_dir):
    """materialize=True (default): every output action reads the persisted
    extraction/chunk relations — the edges plan's union branches must scan
    the cache, not re-run the Arrow extraction per branch."""
    from docling_graph_spark.pipeline import PipelineConfig
    from docling_graph_spark.pipeline import run_on_testdata as run

    res = run(spark, sf_smoke_dir, PipelineConfig(max_tokens=25))
    try:
        plan = plans.formatted_plan(res.edges)
        assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan
    finally:
        res.unpersist()

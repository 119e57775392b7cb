"""Deterministic HyperLogLog (operators/sketches.py): register
construction, mergeability (the property that makes sketches work on
1000 executors), and estimate sanity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docling_graph_spark.operators import sketches as op_sk


def _regs(df):
    return {r["bucket"]: r["register"]
            for r in op_sk.hll_register_rows(df, F.col("u")).collect()}


@pytest.fixture(scope="module")
def urls(spark):
    vals = [(f"https://h{i % 97}.example.com/p/{i}",) for i in range(3000)]
    return spark.createDataFrame(vals, "u string")


def test_merge_equals_union(spark, urls):
    """sketch(A ∪ B) == merge(sketch(A), sketch(B)) — associative
    combine; also exercises overlap (B repeats some of A)."""
    a = urls.filter(F.length("u") % 2 == 0)
    b = urls.filter(F.length("u") % 2 == 1).unionAll(a.limit(100))
    merged = op_sk.merge_registers([_regs(a), _regs(b)])
    assert merged == _regs(urls.unionAll(a.limit(100)))


def test_registers_partitioning_invariant(spark, urls):
    assert _regs(urls.repartition(13)) == _regs(urls.coalesce(1))


def test_estimate_within_hll_error(spark, urls):
    est = op_sk.estimate(_regs(urls))
    # standard error for m=256 is ~6.5%; allow 3 sigma
    assert abs(est - 3000) / 3000 < 0.20


def test_duplicates_do_not_move_estimate(spark, urls):
    dup = urls.unionAll(urls).unionAll(urls)
    assert _regs(dup) == _regs(urls)


def test_hll_stats_contract(spark, urls):
    [r] = op_sk.hll_stats(
        urls.withColumn("g", F.lit("x")), F.col("u"), "g").collect()
    assert r["hll_m"] == 256
    assert 0 < r["hll_nonzero"] <= 256
    assert r["hll_regsum"] > 0 and r["hll_checksum"] > 0


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def terms(spark):
    # zipf-ish frequency table: term_i appears (3000 // (i+1)) times
    rows = [(f"term{i:03d}", 3000 // (i + 1)) for i in range(200)]
    return spark.createDataFrame(rows, "v string, w long")


def _cms(df):
    return {(r["j"], r["col"]): r["counter"]
            for r in op_sk.cms_register_rows(df, "v", "w").collect()}


def test_cms_partitioning_invariant(spark, terms):
    assert _cms(terms.repartition(17)) == _cms(terms.coalesce(1))


def test_cms_merge_is_cellwise_add(spark, terms):
    """sketch(A + B) == cellwise-add(sketch(A), sketch(B)) — counters are
    sums, so the register relation is mergeable across executors."""
    a = terms.filter(F.col("w") % 2 == 0)
    b = terms.filter(F.col("w") % 2 == 1)
    ra, rb, rall = _cms(a), _cms(b), _cms(terms)
    merged = dict(ra)
    for k, c in rb.items():
        merged[k] = merged.get(k, 0) + c
    assert merged == rall


def test_cms_never_undercounts(spark, terms):
    """The CM structural guarantee: estimate >= true count for EVERY key."""
    regs = op_sk.cms_register_rows(terms, "v", "w")
    est = op_sk.cms_estimates(regs, terms.select("v"), "v")
    joined = {r["v"]: r["estimate"] for r in est.collect()}
    truth = {r["v"]: r["w"] for r in terms.collect()}
    assert set(joined) == set(truth)
    assert all(joined[v] >= truth[v] for v in truth)


def test_cms_heavy_hitter_is_tight(spark, terms):
    """The dominant key's estimate is exact or near-exact (collisions add
    at most the tail mass of its bucket)."""
    regs = op_sk.cms_register_rows(terms, "v", "w")
    est = op_sk.cms_estimates(
        regs, spark.createDataFrame([("term000",)], "v string"), "v")
    [r] = est.collect()
    assert 3000 <= r["estimate"] <= 3000 + 600


def test_hll_streaming_incremental_merge_equals_batch(spark, tmp_path):
    """The mergeability claim, end-to-end on a stream: per-micro-batch
    register partials accumulated with foreachBatch then max-merged are
    byte-identical to the one-shot batch sketch — the shape a continuous
    crawl uses to maintain distinct-url counts without reprocessing."""
    rows = [(f"https://h{i % 31}.example.com/p/{i}",) for i in range(800)]
    src = str(tmp_path / "hll_src")
    spark.createDataFrame(rows, "u string").repartition(4) \
        .write.parquet(src)  # 4 files -> 4 triggers

    acc = []

    def per_batch(batch_df, _bid):
        acc.append({r["bucket"]: r["register"] for r in
                    op_sk.hll_register_rows(batch_df, F.col("u")).collect()})

    q = (spark.readStream.schema("u string").option(
        "maxFilesPerTrigger", 1).parquet(src)
        .writeStream.foreachBatch(per_batch)
        .trigger(availableNow=True).start())
    q.awaitTermination()
    assert len(acc) == 4
    merged = op_sk.merge_registers(acc)
    batch = {r["bucket"]: r["register"] for r in op_sk.hll_register_rows(
        spark.read.parquet(src), F.col("u")).collect()}
    assert merged == batch


def test_estimate_tracks_builtin_datasketches_hll(spark, urls):
    """Sanity vs Spark's built-in hll_sketch_agg (Apache DataSketches):
    both approximations land within their error bands of each other on
    the same 3000-distinct column.  (The built-in sketch is NOT
    byte-deterministic across engines — that is exactly why the catalog
    gates on our md5-register sketch instead.)"""
    [row] = urls.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("u")).alias("ds")).collect()
    ours = op_sk.estimate(_regs(urls))
    assert abs(row["ds"] - 3000) / 3000 < 0.15
    assert abs(ours - row["ds"]) / 3000 < 0.25


# ---------------------------------------------------------------------------
# KMV / Theta bottom-k sketch
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def kmv_sets(spark):
    """Two overlapping url sets in one group: |A|=600, |B|=700,
    |A∩B|=300 (ids 0-299 shared), |A∪B|=1000."""
    a = spark.createDataFrame(
        [("g", f"https://x.example.com/a/{i}") for i in range(600)],
        "grp string, url string")
    b = spark.createDataFrame(
        [("g", f"https://x.example.com/a/{i}") for i in range(300)]
        + [("g", f"https://x.example.com/b/{i}") for i in range(400)],
        "grp string, url string")
    return a, b


def test_kmv_sketch_is_bottom_k_of_distinct(spark):
    df = spark.createDataFrame(
        [("g", f"v{i % 50}") for i in range(500)], "grp string, v string")
    rows = op_sk.kmv_sketch(df, F.col("v"), "grp", k=16).collect()
    assert len(rows) == 16
    hvs = [r["hv"] for r in rows]
    assert hvs == sorted(hvs) and len(set(hvs)) == 16
    # duplicates must not move the sketch: distinct input, same state
    rows2 = op_sk.kmv_sketch(df.distinct(), F.col("v"), "grp",
                             k=16).collect()
    assert {(r["rank"], r["hv"]) for r in rows} == \
        {(r["rank"], r["hv"]) for r in rows2}


def test_kmv_unfilled_sketch_is_exact(spark):
    df = spark.createDataFrame(
        [("g", f"v{i}") for i in range(10)], "grp string, v string")
    row = op_sk.kmv_set_stats(df, df, "v", "grp", k=32).collect()[0]
    assert row["kmv_union_n"] == 10
    assert row["kmv_a_est"] == 10 and row["kmv_b_est"] == 10
    assert row["kmv_union_est"] == 10 and row["kmv_inter_est"] == 10


def test_kmv_set_estimates_within_error(spark, kmv_sets):
    """k=64 bottom-k: relative error ~1/sqrt(k-2) ≈ 13%; assert a lax
    2.5-sigma band so the test is deterministic-but-meaningful."""
    a, b = kmv_sets
    row = op_sk.kmv_set_stats(a, b, "url", "grp", k=64).collect()[0]
    assert abs(row["kmv_a_est"] - 600) <= 200
    assert abs(row["kmv_b_est"] - 700) <= 230
    assert abs(row["kmv_union_est"] - 1000) <= 330
    assert abs(row["kmv_inter_est"] - 300) <= 160
    assert row["kmv_union_n"] == 64 and row["kmv_theta"] > 0


def test_kmv_partitioning_invariant(spark, kmv_sets):
    a, b = kmv_sets
    r1 = {tuple(r) for r in op_sk.kmv_set_stats(
        a.repartition(11), b.coalesce(1), "url", "grp", k=32).collect()}
    r2 = {tuple(r) for r in op_sk.kmv_set_stats(
        a.coalesce(1), b.repartition(7), "url", "grp", k=32).collect()}
    assert r1 == r2


def test_kmv_union_sketch_equals_direct_union_sketch(spark, kmv_sets):
    """Merging the two k-row sketches gives EXACTLY the sketch of A∪B
    built from the raw union — the mergeability contract."""
    a, b = kmv_sets
    sa = op_sk.kmv_sketch(a, F.col("url"), "grp", k=32)
    sb = op_sk.kmv_sketch(b, F.col("url"), "grp", k=32)
    from pyspark.sql import Window
    merged = (sa.select("grp", "hv").unionByName(sb.select("grp", "hv"))
              .distinct()
              .withColumn("rank", F.row_number().over(
                  Window.partitionBy("grp").orderBy("hv")))
              .filter(F.col("rank") <= 32))
    direct = op_sk.kmv_sketch(a.unionByName(b), F.col("url"), "grp", k=32)
    assert {(r["rank"], r["hv"]) for r in merged.collect()} == \
        {(r["rank"], r["hv"]) for r in direct.collect()}


def test_kmv_group_in_one_side_only(spark):
    """A group with rows only in set A must still produce a stats row:
    B-side estimate 0, intersection 0."""
    a = spark.createDataFrame(
        [("only_a", f"u{i}") for i in range(5)]
        + [("both", f"u{i}") for i in range(5)], "grp string, v string")
    b = spark.createDataFrame(
        [("both", f"u{i}") for i in range(3)], "grp string, v string")
    rows = {r["grp"]: r for r in
            op_sk.kmv_set_stats(a, b, "v", "grp", k=8).collect()}
    assert rows["only_a"]["kmv_a_est"] == 5
    assert rows["only_a"]["kmv_b_est"] == 0
    assert rows["only_a"]["kmv_inter_est"] == 0
    assert rows["both"]["kmv_inter_est"] == 3

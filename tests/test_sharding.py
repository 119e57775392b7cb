"""Token-budget shard packing (operators/sharding.py): the distributed
prefix-sum assignment must be a pure function of (order, tokens) —
invariant to partition count — and match the sequential definition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docling_graph_spark.operators import sharding


def _seq_shards(rows, budget):
    """Sequential oracle: shard = floor(start_position / budget)."""
    out, pos = {}, 0
    for key, tok in sorted(rows):
        out[key] = pos // budget
        pos += tok
    return out


@pytest.fixture(scope="module")
def toy(spark):
    rows = [(i, f"doc {i} " + "x" * ((i * 37) % 200)) for i in range(500)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_matches_sequential_definition(spark, toy):
    counted = sharding.token_counts(toy)
    got = {
        r["doc_id"]: r["shard_id"]
        for r in sharding.pack_shards(counted, budget=300).collect()
    }
    expected = _seq_shards(
        [(r["doc_id"], r["n_tokens"]) for r in counted.collect()], 300
    )
    assert got == expected


def test_invariant_to_partition_count(spark, toy):
    counted = sharding.token_counts(toy)
    a = sharding.pack_shards(counted, budget=300, num_partitions=2)
    b = sharding.pack_shards(
        counted.repartition(17), budget=300, num_partitions=13
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_shard_fill_bounded(spark, toy):
    """Every shard except possibly the last holds >= budget - max_doc
    tokens and <= budget + max_doc tokens (boundary-straddle semantics)."""
    budget = 300
    counted = sharding.token_counts(toy)
    max_doc = counted.agg(F.max("n_tokens")).collect()[0][0]
    stats = sharding.shard_stats(
        sharding.pack_shards(counted, budget=budget)
    ).collect()
    for row in stats[:-1]:
        assert budget - max_doc <= row["shard_tokens"] <= budget + max_doc
    assert stats[-1]["shard_tokens"] <= budget + max_doc


def test_string_order_key_fallback_path(spark, toy):
    """Non-numeric order keys route through repartitionByRange +
    spark_partition_id and must produce the same assignment as the
    sequential definition over the string order."""
    keyed = sharding.token_counts(toy).select(
        F.concat(F.lit("https://h/"),
                 F.lpad(F.col("doc_id").cast("string"), 6, "0"))
        .alias("url"), "n_tokens")
    got = {r["url"]: r["shard_id"]
           for r in sharding.pack_shards(
               keyed, budget=300, order_col="url",
               num_partitions=5).collect()}
    expected = _seq_shards(
        [(r["url"], r["n_tokens"]) for r in keyed.collect()], 300)
    assert got == expected


def test_null_and_empty_tokens(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 0), (4, 5)],
        "doc_id long, n_tokens long",
    )
    got = {r["doc_id"]: r["shard_id"]
           for r in sharding.pack_shards(df, budget=8).collect()}
    # positions: 1 -> 0, 2 -> 10, 3 -> 10, 4 -> 10
    assert got == {1: 0, 2: 1, 3: 1, 4: 1}


def test_numeric_key_single_narrow_shuffle(spark, toy):
    """Integer order keys compute explicit range buckets, so the prefix
    window's hash exchange is the only Exchange in the plan; string keys
    pay the extra range exchange."""
    from docling_graph_spark.plans import formatted_plan

    counted = sharding.token_counts(toy)
    plan_num = formatted_plan(
        sharding.bucketed_local_prefix(counted, "doc_id", "n_tokens", 8))
    assert plan_num.count("+- Exchange") == 1, plan_num

    keyed = counted.select(
        F.col("doc_id").cast("string").alias("k"), "n_tokens")
    plan_str = formatted_plan(
        sharding.bucketed_local_prefix(keyed, "k", "n_tokens", 8))
    assert plan_str.count("+- Exchange") == 2, plan_str


def test_pack_sequences_order_and_totals(spark):
    df = spark.createDataFrame(
        [(3, "c", 1, 0), (1, "a", 1, 0), (2, "b", 1, 0), (9, "z", 1, 1)],
        "doc_id long, text string, n_tokens long, shard_id long")
    got = {r["shard_id"]: r
           for r in sharding.pack_sequences(df).collect()}
    assert got[0]["packed_text"] == "a\n\nb\n\nc"   # doc_id order
    assert got[0]["n_docs"] == 3 and got[0]["n_tokens"] == 3
    assert got[1]["packed_text"] == "z"


def test_pack_sequences_partitioning_invariant(spark, toy):
    counted = sharding.token_counts(toy)
    assigned = sharding.pack_shards(counted, budget=300)
    joined = assigned.join(toy, "doc_id")
    a = sorted(map(tuple, sharding.pack_sequences(joined).collect()))
    b = sorted(map(tuple, sharding.pack_sequences(
        joined.repartition(17)).collect()))
    assert a == b


def test_pps_exactly_k_and_partition_invariant(spark):
    from docling_graph_spark.operators import sharding as op_sh

    docs = op_sh.token_counts(spark.createDataFrame(
        [(i, "x" * ((i * 37) % 400 + 10)) for i in range(200)],
        "doc_id long, text string"))
    for parts in (1, 7):
        marked = op_sh.pps_systematic_sample(docs.repartition(parts), k=13)
        rows = {r["doc_id"]: r["n_grid"] for r in marked.collect()}
        assert sum(rows.values()) == 13
        if parts == 1:
            base = rows
    assert rows == base  # assignment independent of partitioning


def test_pps_zero_weight_docs_never_selected(spark):
    from docling_graph_spark.operators import sharding as op_sh

    docs = op_sh.token_counts(spark.createDataFrame(
        [(0, ""), (1, "y" * 100), (2, "")], "doc_id long, text string"))
    got = {r["doc_id"]: r["n_grid"]
           for r in op_sh.pps_systematic_sample(docs, k=5).collect()}
    assert got[0] == 0 and got[2] == 0 and got[1] == 5


def test_pps_empty_corpus(spark):
    from docling_graph_spark.operators import sharding as op_sh

    docs = op_sh.token_counts(
        spark.createDataFrame([], "doc_id long, text string"))
    assert op_sh.pps_systematic_sample(docs, k=5).count() == 0


def test_pps_heavy_doc_gets_multiple_grid_points(spark):
    from docling_graph_spark.operators import sharding as op_sh

    # one doc holds ~90% of the mass -> it must absorb most grid points
    docs = op_sh.token_counts(spark.createDataFrame(
        [(0, "a" * 40), (1, "b" * 4000), (2, "c" * 40)],
        "doc_id long, text string"))
    got = {r["doc_id"]: r["n_grid"]
           for r in op_sh.pps_systematic_sample(docs, k=10).collect()}
    assert got[1] >= 9 and sum(got.values()) == 10


# ---------------------------------------------------------------------------
# deterministic global shuffle (shuffle_positions)
# ---------------------------------------------------------------------------


def test_shuffle_is_dense_permutation(spark):
    docs = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    pos = sorted(r["_pos"] for r in
                 sharding.shuffle_positions(docs).collect())
    assert pos == list(range(500))


def test_shuffle_partitioning_invariant(spark):
    docs = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    a = {(r["doc_id"], r["_pos"])
         for r in sharding.shuffle_positions(docs.repartition(11)).collect()}
    b = {(r["doc_id"], r["_pos"])
         for r in sharding.shuffle_positions(docs.coalesce(1)).collect()}
    assert a == b


def test_shuffle_matches_sequential_rank(spark):
    """Position == rank in (md5(id), id) order — the sequential def."""
    import hashlib

    ids = list(range(97))
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    expect = {
        i: r for r, (_, i) in enumerate(sorted(
            (hashlib.md5(str(i).encode()).hexdigest(), i) for i in ids))
    }
    got = {r["doc_id"]: r["_pos"]
           for r in sharding.shuffle_positions(docs).collect()}
    assert got == expect


def test_shuffle_shards_exactly_balanced(spark):
    # 500 % 7 != 0 — the ceil-block rule would leave the last shard 4
    # short; the proportional rule keeps every size within 1
    for n in (500, 1000):
        docs = spark.createDataFrame(
            [(i,) for i in range(n)], "doc_id long")
        pos = sharding.shuffle_positions(docs)
        sh = sharding.shuffle_shards(pos, n, 7)
        counts = sorted(r["count"] for r in
                        sh.groupBy("shuffle_shard").count().collect())
        assert max(counts) - min(counts) <= 1
        assert sum(counts) == n
        assert sh.select("shuffle_shard").distinct().count() == 7


def test_shuffle_no_global_sort_in_plan(spark):
    """The windowed rank relation (asserted BEFORE the localCheckpoint
    truncates lineage) must hash-partition on the bucket, never sort into
    a single partition (the naive row_number-over-global-order shape);
    and the assembled result must stay SinglePartition-free too."""
    docs = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    ranks_plan = sharding.bucketed_shuffle_ranks(docs)._jdf \
        .queryExecution().executedPlan().toString()
    assert "SinglePartition" not in ranks_plan, ranks_plan
    assert "hashpartitioning(_b" in ranks_plan, ranks_plan
    full_plan = sharding.shuffle_positions(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "SinglePartition" not in full_plan, full_plan

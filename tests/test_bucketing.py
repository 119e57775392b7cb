"""Bucketed stage tables elide the join shuffle (operators/bucketing.py).

The J5 lineage joins re-key on `url` in every downstream job; bucketing the
stage tables by url pays that shuffle once at write time.  The assertion
here is plan-level: a join between two tables bucketed on the join key with
equal bucket counts must contain NO Exchange, while the same join over
plain parquet does.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docling_graph_spark.operators.bucketing import (
    plan_has_exchange,
    read_table,
    write_bucketed,
)
from docling_graph_spark.pipeline import PipelineConfig, run_on_testdata


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_smoke_dir, tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("bucketed_wh")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bkt LOCATION '{warehouse}'")
    res = run_on_testdata(spark, sf_smoke_dir, PipelineConfig(id_mode="xxhash64"))
    docs = res.extracted.select("url", "lang", "bytes_stripped")
    chunks = res.chunks.select("url", "chunk_id", "token_est")
    write_bucketed(docs, "bkt.docs_b", ["url"], num_buckets=8)
    write_bucketed(chunks, "bkt.chunks_b", ["url"], num_buckets=8,
                   sort_cols=["url", "chunk_id"])
    yield docs, chunks
    spark.sql("DROP DATABASE IF EXISTS bkt CASCADE")


def _no_broadcast(spark):
    return spark.conf.get("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    prev = _no_broadcast(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, "bkt.docs_b").join(
            read_table(spark, "bkt.chunks_b"), "url")
        assert not plan_has_exchange(joined), (
            "bucketed-bucketed equi-join must not shuffle")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_plain_join_does_exchange(spark, bucketed_tables):
    docs, chunks = bucketed_tables
    prev = _no_broadcast(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert plan_has_exchange(docs.join(chunks, "url")), (
            "control: the un-bucketed join shuffles")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_roundtrip_values(spark, bucketed_tables):
    docs, chunks = bucketed_tables
    expected = (docs.join(chunks, "url")
                .agg(F.count("*"), F.sum("token_est")).collect()[0])
    got = (read_table(spark, "bkt.docs_b")
           .join(read_table(spark, "bkt.chunks_b"), "url")
           .agg(F.count("*"), F.sum("token_est")).collect()[0])
    assert tuple(got) == tuple(expected) and got[0] > 0


def test_bucketed_aggregation_no_exchange(spark, bucketed_tables):
    """groupBy on the bucket key also reuses the layout (no re-shuffle)."""
    prev = _no_broadcast(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        agg = read_table(spark, "bkt.chunks_b").groupBy("url").agg(
            F.sum("token_est").alias("toks"))
        assert not plan_has_exchange(agg), (
            "groupBy(bucket key) over a bucketed table must not shuffle")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_banded_ann_corpus_bucketed_probe_is_exchange_free(spark,
                                                           sf_smoke_dir):
    """The 100 TB ANN layout: the banded embedding relation is written ONCE
    bucketed by band_key; a probe relation bucketed the same way joins with
    ZERO Exchange on either side — candidate generation without shuffling
    the corpus (operators/ann.banded_embeddings docstring contract)."""
    from pyspark.sql import functions as F

    from docling_graph_spark.operators import ann as op_ann
    from docling_graph_spark.operators import bucketing

    # clean both catalog entry and managed location (a previous session's
    # warehouse dir survives the metastore and blocks saveAsTable)
    import shutil

    for t in ("banded_corpus", "banded_probes"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)

    emb = spark.read.parquet(f"{sf_smoke_dir}/embeddings.parquet")
    banded = op_ann.banded_embeddings(emb).select(
        "vec_id", "band_key", "_n"
    )
    probes = banded.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "band_key"
    )
    bucketing.write_bucketed(banded, "banded_corpus", ["band_key"],
                             num_buckets=8, sort_cols=["band_key"])
    bucketing.write_bucketed(probes, "banded_probes", ["band_key"],
                             num_buckets=8, sort_cols=["band_key"])
    corpus_t = bucketing.read_table(spark, "banded_corpus")
    probes_t = bucketing.read_table(spark, "banded_probes")
    # disable auto-broadcast: the probe side is tiny at test scale so Spark
    # would broadcast (also shuffle-free, but then the layout isn't what's
    # being exercised); at 100 TB the probe relation is NOT broadcastable
    # and the bucketed sort-merge join is the plan that must hold
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = corpus_t.join(probes_t, "band_key").filter(
            F.col("vec_id") != F.col("query_id")
        )
        assert joined.count() > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, \
            "bucketed-bucketed band join must not shuffle either side"
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

"""Python UDTF chunker (operators/udtf_chunk.py): relation parity with the
pandas-UDF chunk path and the kernel, plus the SQL LATERAL surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docling_graph_spark.kernels import chunking as k_chunk
from docling_graph_spark.operators import udtf_chunk

MAX_TOKENS = 25


@pytest.fixture(scope="module")
def docs(spark, sf_smoke_dir):
    return (spark.read.parquet(f"{sf_smoke_dir}/documents.parquet")
            .select("doc_id", "text").limit(100)
            .localCheckpoint())


def test_lateral_matches_kernel_replay(spark, docs):
    got = {(r["doc_id"], r["chunk_id"], r["start"], r["end"], r["chunk"])
           for r in udtf_chunk.chunk_rows_lateral(docs, MAX_TOKENS).collect()}
    expect = set()
    for row in docs.collect():
        for s in k_chunk.chunk_spans(row["text"] or "", MAX_TOKENS):
            expect.add((row["doc_id"], s.chunk_id, s.start, s.end, s.text))
    assert got == expect


def test_lateral_matches_pandas_udf_path(spark, docs):
    """Same relation as the production Arrow path (chunk_and_batch),
    projected to the shared columns."""
    from docling_graph_spark.operators import chunk as op_chunk

    udf = op_chunk.make_chunker_udf(max_tokens=MAX_TOKENS)
    pandas_rows = (
        docs.select("doc_id", F.explode(udf(F.col("text"))).alias("c"))
        .select("doc_id", "c.chunk_id", "c.start", "c.end",
                F.col("c.text").alias("chunk"))
    )
    a = {tuple(r) for r in pandas_rows.collect()}
    b = {tuple(r) for r in
         udtf_chunk.chunk_rows_lateral(docs, MAX_TOKENS).collect()}
    assert a == b


def test_sql_lateral_surface(spark, docs):
    udtf_chunk.register(spark)
    docs.createOrReplaceTempView("udtf_docs")
    n_sql = spark.sql(
        f"SELECT d.doc_id, c.chunk_id FROM udtf_docs d, "
        f"LATERAL chunk_udtf(d.text, {MAX_TOKENS}) c").count()
    assert n_sql == udtf_chunk.chunk_rows_lateral(docs, MAX_TOKENS).count()
    assert n_sql > 100


def test_null_and_empty_text(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "short")], "doc_id long, text string")
    got = {(r["doc_id"], r["chunk"]) for r in
           udtf_chunk.chunk_rows_lateral(df, MAX_TOKENS).collect()}
    # null/empty -> single verbatim empty chunk per the reference
    # short-circuit contract (n <= limit returns text unstripped)
    assert got == {(1, ""), (2, ""), (3, "short")}

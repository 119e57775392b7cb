"""Python UDTF formulation of the chunker — Spark 4's table-function
surface (`F.udtf` + LATERAL join), Arrow-optimized.

The production chunk path is the Arrow pandas UDF in operators/chunk.py
(one batch pass, array output, posexplode).  This module exposes the SAME
kernel (kernels/chunking.chunk_spans, byte-parity with the reference's
document_chunker.py:261-301 fallback) as a user-defined TABLE function:

    SELECT d.doc_id, c.* FROM documents d,
      LATERAL chunk_udtf(d.text, 25) c

UDTFs are the idiomatic surface when a relation-valued function is
composed in SQL by end users (the reference's CLI users think in
"document -> chunk rows", not array columns).  ``useArrow=True`` keeps
the transfer Arrow-batched; per-row eval cost still exceeds the fused
pandas-UDF path, so the catalog keeps the pandas route for the hot
pipeline and parity-tests this one against it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import lit, udtf

from ..kernels import chunking as k_chunk


@udtf(returnType="chunk_id int, start long, end long, chunk string",
      useArrow=True)
class ChunkUDTF:
    """Explode one text into its chunk-span rows (shared kernel)."""

    def eval(self, text: str, max_tokens: int):
        for s in k_chunk.chunk_spans(text or "", max_tokens or 1):
            yield s.chunk_id, s.start, s.end, s.text


def register(spark: SparkSession, name: str = "chunk_udtf") -> None:
    """Make the UDTF callable from SQL (idempotent per session)."""
    spark.udtf.register(name, ChunkUDTF)


def chunk_rows_lateral(docs: DataFrame, max_tokens: int,
                       text_col: str = "text") -> DataFrame:
    """(doc_id, text) -> (doc_id, chunk_id, start, end, chunk) via the
    UDTF lateral join — relation-for-relation equal to the pandas path."""
    return docs.lateralJoin(
        ChunkUDTF(F.col(text_col).outer(), lit(max_tokens))
    ).select("doc_id", "chunk_id", "start", "end", "chunk")

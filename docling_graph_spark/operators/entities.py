"""Deterministic entity extraction operators (the LLM-backend replacement).

Two paths mirroring the reference's backend split
(`/root/reference/docling_graph/core/extractors/backends/llm_backend.py`):

* relational path — term/email/year mentions extracted with pure JVM column
  expressions (``regexp_extract_all`` + ``explode``): whole-stage-codegen
  friendly, zero Python, the 100 TB hot path;
* template path — labelled-field extraction over batch combined text via an
  Arrow-batched pandas UDF producing template-shaped JSON records, exercising
  the reference's many-to-one strategy (batch extraction → merge).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql import types as T

from ..kernels.entity_extract import FieldRuleExtractor

TERM_PATTERN = "[a-z]{5,}"
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
YEAR_PATTERN = r"\b(?:1[89][0-9]{2}|20[0-9]{2})\b"


def extract_mentions(chunks: DataFrame, text_col: str = "text") -> DataFrame:
    """chunk rows -> one row per mention occurrence
    (url, lang, chunk_id, term, kind).  All JVM-side."""
    terms = chunks.select(
        "url", "lang", "chunk_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TERM_PATTERN), 0)
        ).alias("term"),
    ).withColumn("kind", F.lit("term"))
    emails = chunks.select(
        "url", "lang", "chunk_id",
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(EMAIL_PATTERN), 0)
        ).alias("term"),
    ).select("url", "lang", "chunk_id", F.lower("term").alias("term")) \
        .withColumn("kind", F.lit("email"))
    years = chunks.select(
        "url", "lang", "chunk_id",
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(YEAR_PATTERN), 0)
        ).alias("term"),
    ).withColumn("kind", F.lit("year"))
    return terms.unionByName(emails).unionByName(years)


def doc_mentions(mentions: DataFrame) -> DataFrame:
    """Aggregate mention occurrences to (url, lang, term, kind, n_mentions,
    first_chunk_id) — the document-level mention relation (map-side partial
    aggregation; one shuffle on the salted-ready url key)."""
    return mentions.groupBy("url", "lang", "term", "kind").agg(
        F.count("*").alias("n_mentions"),
        F.min("chunk_id").alias("first_chunk_id"),
    )


def make_template_extractor_udf(extractor: FieldRuleExtractor):
    """Batch combined_text -> template-record JSON (one per batch row)."""

    @pandas_udf(T.StringType())
    def extract_record(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: json.dumps(extractor.extract(t or ""), sort_keys=True)
        )

    return extract_record


def extract_template_records(batches: DataFrame,
                             extractor: FieldRuleExtractor) -> DataFrame:
    """(url, batch_id, combined_text) -> (url, batch_id, record_json)."""
    udf = make_template_extractor_udf(extractor)
    return batches.select(
        "url", "batch_id", udf(F.col("combined_text")).alias("record_json")
    )

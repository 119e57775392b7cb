"""End-to-end document→graph pipeline (the Spark mapping of the reference's
orchestrator, SURVEY §3.1).

    scan web_pages → extract main content (Arrow UDF) → chunk+batch (fused
    Arrow UDF, zero shuffle) → deterministic mention extraction (pure JVM)
    → document-level aggregation (one shuffle on url) → graph assembly →
    relational cleanup → stats / lineage metrics

Stage boundaries are shuffles instead of the reference's HTTP/process hops.
Skew: the url-host power law is handled by hashing full urls (not hosts) for
the main aggregations plus AQE skew-join handling; `salted_repartition` is
available for host-keyed stages.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import chunk as op_chunk
from .operators import entities as op_entities
from .operators import extract as op_extract
from .operators import graph as op_graph
from .operators import stats as op_stats
from .sources.web_pages import synthesize_web_pages


@dataclass
class PipelineConfig:
    """Knobs mirroring the reference PipelineConfig
    (`/root/reference/docling_graph/config.py:76-154`), Spark-relevant subset."""

    max_tokens: int = op_chunk.DEFAULT_MAX_TOKENS
    context_limit: int = op_chunk.DEFAULT_CONTEXT_LIMIT
    merge_threshold: float = op_chunk.DEFAULT_MERGE_THRESHOLD
    id_mode: str = "blake2b"           # blake2b (parity) | xxhash64 (fast)
    add_reverse_edges: bool = False
    content_dedup: bool = False
    run_id: str = "run"


@dataclass
class PipelineResult:
    extracted: DataFrame
    chunks: DataFrame
    doc_mentions: DataFrame
    nodes: DataFrame
    edges: DataFrame
    metrics: DataFrame


def salted_repartition(df: DataFrame, num_partitions: int,
                       salt_buckets: int = 16) -> DataFrame:
    """North-rule skew handling: repartition on salted url-host hash so hot
    hosts spread over `salt_buckets` partitions."""
    host = F.parse_url(F.col("url"), F.lit("HOST"))
    salt = F.pmod(F.xxhash64(F.col("url")), F.lit(salt_buckets))
    return df.repartition(num_partitions, F.xxhash64(host, salt))


def run_pipeline(web_pages: DataFrame,
                 config: Optional[PipelineConfig] = None) -> PipelineResult:
    cfg = config or PipelineConfig()

    extracted_all = op_extract.extract_main_text(web_pages)
    extracted = op_extract.filter_extractable(extracted_all)

    chunks = op_chunk.chunk_documents(
        extracted, cfg.max_tokens, cfg.context_limit, cfg.merge_threshold
    )
    mentions = op_entities.extract_mentions(chunks)
    doc_mentions = op_entities.doc_mentions(mentions)

    nodes, edges = op_graph.assemble_web_graph(
        extracted, chunks, doc_mentions,
        id_mode=cfg.id_mode, add_reverse_edges=cfg.add_reverse_edges,
    )
    nodes, edges = op_graph.clean_graph(nodes, edges,
                                        content_dedup=cfg.content_dedup)
    metrics = op_stats.partition_metrics(extracted_all, cfg.run_id)
    return PipelineResult(extracted, chunks, doc_mentions, nodes, edges, metrics)


def run_on_testdata(spark: SparkSession, sf_dir: str,
                    config: Optional[PipelineConfig] = None) -> PipelineResult:
    return run_pipeline(synthesize_web_pages(spark, sf_dir), config)

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

from .kernels import chunking
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
    # F9: JSON-schema byte size of the extraction template; >0 shrinks the
    # chunk token budget via kernels.chunking.schema_adjusted_max_tokens
    # (reference document_chunker.py:115-172), computed once driver-side.
    schema_size: int = 0
    merge_threshold: float = op_chunk.DEFAULT_MERGE_THRESHOLD
    # "fallback": reference raw-text chunker + W1/W2 batching (byte-parity
    # path); "hybrid": heading-aware HybridChunker analogue over the
    # extractor's block spans (heading path carried into chunk-node props)
    chunker: str = "fallback"
    # optional real tokenizer for the chunk/batch token budgets (reference
    # `document_chunker.py:60-95`): an HF tokenizer name, used when the
    # tokenizer libraries are installed; None = byte-stable length heuristic
    tokenizer_name: Optional[str] = None
    id_mode: str = "blake2b"           # blake2b (parity) | xxhash64 (fast)
    add_reverse_edges: bool = False
    content_dedup: bool = False
    run_id: str = "run"
    # input parallelism floor for the extraction UDF stage: True = ensure at
    # least the cluster's default parallelism (a single fat parquet file
    # otherwise serializes the whole parse on one task); int = exact target;
    # False = leave the scan partitioning untouched
    repartition_input: object = True
    # attach the zero-job Observation counters (docs/bytes/errors) to the
    # extraction relation; off only for micro-benchmarks that want the
    # absolute minimal plan
    observe_metrics: bool = True
    # persist the expensive intermediates (extraction / chunk / mention UDF
    # outputs) as part of building the result, so a caller that runs several
    # output actions (nodes AND edges AND metrics) parses each document once
    # — without this the edges plan re-runs the Arrow extraction per union
    # branch.  False for single-action jobs that write one table and exit
    # (a pure pipeline needs no cache; persisting would only cost memory).
    materialize: bool = True


@dataclass
class PipelineResult:
    extracted: DataFrame
    chunks: DataFrame
    doc_mentions: DataFrame
    nodes: DataFrame
    edges: DataFrame
    metrics: DataFrame
    # free-rider global counters: an Observation attached to the extraction
    # relation — populated by whichever output action runs first, costing
    # ZERO extra jobs (the per-host breakdown stays in `metrics`, which
    # needs its own groupBy)
    observation: "object" = None
    # pre-filter extraction output (error rows included) — metrics derive
    # from it; persist THIS to make every downstream action share one parse
    extracted_all: Optional[DataFrame] = None
    # fused extract+chunk relation (fallback chunker path): extracted_all
    # and chunks are cheap projections of this one Python pass — persisting
    # it replaces persisting them separately
    combined: Optional[DataFrame] = None

    @property
    def run_counters(self) -> Optional[Dict]:
        """Global (docs_parsed, bytes_stripped, errors) observed on the
        first output action; blocks until one has run."""
        if self.observation is None:
            return None
        return dict(self.observation.get)

    def _persist_roots(self):
        if self.combined is not None:
            return (self.combined, self.doc_mentions)
        return (self.extracted_all, self.chunks, self.doc_mentions)

    def persist(self) -> "PipelineResult":
        """Persist the expensive intermediates (the fused extract+chunk
        relation — or, on the hybrid path, extraction + chunk outputs —
        plus the mention aggregate) so multiple output actions share one
        computation — the in-memory analogue of the production pattern where
        each stage is written to a table once and read back, never
        recomputed."""
        for df in self._persist_roots():
            if df is not None:
                df.persist()
        return self

    def unpersist(self) -> "PipelineResult":
        for df in self._persist_roots():
            if df is not None:
                df.unpersist()
        return self


def salted_repartition(df: DataFrame, num_partitions: int,
                       salt_buckets: int = 16) -> DataFrame:
    """North-rule skew handling: repartition on salted url-host hash so hot
    hosts spread over `salt_buckets` partitions."""
    host = F.parse_url(F.col("url"), F.lit("HOST"))
    salt = F.pmod(F.xxhash64(F.col("url")), F.lit(salt_buckets))
    return df.repartition(num_partitions, F.xxhash64(host, salt))


def ensure_parallel_input(web_pages: DataFrame,
                          target: Optional[int] = None) -> DataFrame:
    """Guarantee the extraction stage can use the whole cluster.

    A Common-Crawl-style table read from few/fat files yields few input
    splits, and the Arrow UDF parse — the dominant cost — inherits that
    parallelism.  When the scan has fewer partitions than the target
    (default: the cluster's defaultParallelism), redistribute by the salted
    url-host hash (north-rule skew handling: hot hosts spread across salt
    buckets instead of hot-spotting one task)."""
    spark = web_pages.sparkSession
    # a source that already guarantees >= defaultParallelism partitions tags
    # itself, skipping the .rdd partition probe (several seconds of
    # driver-side plan->RDD conversion); an explicit target still repartitions
    if target is None and getattr(web_pages, "_dgspark_parallel_ok", False):
        return web_pages
    target = target or spark.sparkContext.defaultParallelism
    if web_pages.rdd.getNumPartitions() >= target:
        return web_pages
    return salted_repartition(web_pages, target)


def run_pipeline(web_pages: DataFrame,
                 config: Optional[PipelineConfig] = None) -> PipelineResult:
    cfg = config or PipelineConfig()
    if cfg.repartition_input:
        target = (cfg.repartition_input
                  if isinstance(cfg.repartition_input, int)
                  and not isinstance(cfg.repartition_input, bool) else None)
        web_pages = ensure_parallel_input(web_pages, target)

    max_tokens = (chunking.schema_adjusted_max_tokens(cfg.max_tokens,
                                                      cfg.schema_size)
                  if cfg.schema_size > 0 else cfg.max_tokens)
    from pyspark.sql import Observation

    obs = Observation("run_counters") if cfg.observe_metrics else None

    def _observe(df: DataFrame) -> DataFrame:
        # counters ride the first real action over the extraction relation
        # (df.observe is an identity node with aggregate side-channels) —
        # the run-level docs/bytes/errors totals arrive without a job
        if obs is None:
            return df
        return df.observe(
            obs,
            F.count(F.lit(1)).alias("docs_parsed"),
            F.sum(F.coalesce(F.col("bytes_stripped"), F.lit(0)))
            .alias("bytes_stripped"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0))
            .alias("errors"),
        )

    combined = None
    if cfg.chunker == "hybrid":
        extracted_all = _observe(op_extract.extract_main_text(web_pages))
        extracted = op_extract.filter_extractable(extracted_all)
        chunks = op_chunk.hybrid_chunk_documents(
            extracted, max_tokens, tokenizer_name=cfg.tokenizer_name
        )
    else:
        # fallback chunker: one fused Python pass (extract + chunk), both
        # relations projected from it JVM-side
        combined = op_extract.extract_and_chunk(
            web_pages, max_tokens, cfg.context_limit, cfg.merge_threshold,
            tokenizer_name=cfg.tokenizer_name,
        )
        extracted_all = _observe(combined.drop("chunks"))
        extracted = op_extract.filter_extractable(extracted_all)
        chunks = op_chunk.chunks_from_combined(combined)
    mentions = op_entities.extract_mentions(chunks)
    doc_mentions = op_entities.doc_mentions(mentions)

    nodes, edges = op_graph.assemble_web_graph(
        extracted, chunks, doc_mentions,
        id_mode=cfg.id_mode, add_reverse_edges=cfg.add_reverse_edges,
    )
    # the web graph is constructed: node ids derive from the same rows that
    # emit the edges, edge/node sets come out of groupBys and unique-row
    # projections — the dedup/orphan passes are no-ops and each would cost a
    # full shuffle of the largest relation.  Declare the invariants and use
    # op_graph.validate_web_graph to CHECK them (see graph_validation query).
    nodes, edges = op_graph.clean_graph(nodes, edges,
                                        content_dedup=cfg.content_dedup,
                                        edges_distinct=True,
                                        nodes_distinct=True,
                                        referential_integrity=True)
    metrics = op_stats.partition_metrics(extracted_all, cfg.run_id)
    result = PipelineResult(extracted, chunks, doc_mentions, nodes, edges,
                            metrics, observation=obs,
                            extracted_all=extracted_all, combined=combined)
    if cfg.materialize:
        result.persist()
    return result


def run_on_testdata(spark: SparkSession, sf_dir: str,
                    config: Optional[PipelineConfig] = None) -> PipelineResult:
    return run_pipeline(synthesize_web_pages(spark, sf_dir), config)

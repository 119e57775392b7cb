"""Graph statistics and per-partition lineage metrics (SURVEY §2.4 A5-A10).

Reference: `/root/reference/docling_graph/core/utils/stats_calculator.py`
(distributions, average degree) and the orchestrator's metadata block
(`pipeline/orchestrator.py:149-240`).  The north rule adds per-partition
extraction metrics (docs parsed, bytes stripped, nodes/edges emitted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def node_type_distribution(nodes: DataFrame) -> DataFrame:
    """A5 (`stats_calculator.py:38-53`)."""
    return nodes.groupBy("label").agg(F.count("*").alias("n")).orderBy(
        F.desc("n"), "label"
    )


def edge_type_distribution(edges: DataFrame) -> DataFrame:
    """A5 (`stats_calculator.py:56-71`)."""
    return edges.groupBy("label").agg(F.count("*").alias("n")).orderBy(
        F.desc("n"), "label"
    )


def graph_summary(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """A6: node_count, edge_count, average_degree = 2E/N
    (`stats_calculator.py:10-35`)."""
    n = nodes.agg(F.count("*").alias("node_count"))
    e = edges.agg(F.count("*").alias("edge_count"))
    return n.crossJoin(e).select(
        "node_count", "edge_count",
        F.when(F.col("node_count") > 0,
               2.0 * F.col("edge_count") / F.col("node_count"))
        .otherwise(F.lit(0.0)).alias("average_degree"),
    )


def degree_distribution(edges: DataFrame) -> DataFrame:
    """Per-node total degree: union of endpoint appearances, one shuffle."""
    endpoints = edges.select(F.col("src").alias("id")).unionAll(
        edges.select(F.col("dst").alias("id"))
    )
    return endpoints.groupBy("id").agg(F.count("*").alias("degree"))


def chunk_token_stats(chunks: DataFrame) -> DataFrame:
    """A7 per-document chunk/token stats (`document_chunker.py:222-259`)."""
    return chunks.groupBy("url").agg(
        F.count("*").alias("total_chunks"),
        F.avg("token_est").alias("avg_tokens"),
        F.max("token_est").alias("max_tokens_in_chunk"),
        F.sum("token_est").alias("total_tokens"),
    )


def registry_stats(nodes: DataFrame) -> DataFrame:
    """A8: per-class distinct fingerprints (`node_id_registry.py:158-163`)."""
    fp = F.substring_index(F.col("id"), "_", -1)
    return nodes.groupBy("label").agg(
        F.countDistinct(fp).alias("n_fingerprints")
    ).orderBy("label")


def partition_metrics(extracted: DataFrame, run_id: str = "run") -> DataFrame:
    """A10 / north rule: per url-host partition extraction metrics."""
    host = F.parse_url(F.col("url"), F.lit("HOST"))
    return extracted.groupBy(host.alias("partition_key")).agg(
        F.count("*").alias("docs_parsed"),
        F.sum(F.coalesce(F.col("bytes_stripped"), F.lit(0))).alias("bytes_stripped"),
        F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("errors"),
    ).select(
        F.lit(run_id).alias("run_id"), "partition_key",
        "docs_parsed", "bytes_stripped", "errors",
    )

#!/usr/bin/env python
"""Regenerate PLANS.md sections: capture `.explain("formatted")` for the
flagship pipeline and representative catalog queries at sf0.01.

Usage: python tools/gen_plans.py [section ...]   (no args = print all)
Output goes to stdout as markdown; paste/patch into PLANS.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    from pyspark.sql import functions as F

    from docling_graph_spark import queries as qmod
    from docling_graph_spark.plans import formatted_plan
    from docling_graph_spark.session import get_spark

    spark = get_spark(app_name="gen-plans", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    sections = {}

    # flagship edges (materialized: union branches read the cache)
    res = qmod._pipeline(spark, SF)
    res.edges.count()  # force the cache so the executed plan shows the scan
    sections["flagship-edges-materialized"] = (
        "flagship pipeline → edges (materialize=True: union branches read "
        "InMemoryTableScan — one extraction pass for every output action)",
        formatted_plan(res.edges),
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    from docling_graph_spark.operators import ann as op_ann

    sections["near-dup-banded"] = (
        "embedding_near_dup — banded sign-LSH (band equi-join candidates; "
        "no nested-loop/cartesian operator anywhere)",
        formatted_plan(op_ann.near_dup_pairs_banded(emb, top_n=20)),
    )

    sections["semantic-dedup"] = (
        "semantic_dedup — SemDeDup cluster assignment (broadcast-centroid "
        "cross) + within-cluster equi-join pair pruning (no cartesian)",
        formatted_plan(op_ann.semantic_dedup(emb)),
    )

    from docling_graph_spark.operators import sharding as op_sh

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sections["shard-packing"] = (
        "pack_shards — distributed prefix sum: integer keys bucket via a "
        "min/max agg so the per-bucket window's hash exchange is the ONLY "
        "narrow shuffle (plan-asserted; string keys add one range "
        "exchange); broadcast offset join, totals pass O(#buckets) to the "
        "driver, prefix relation localCheckpointed once",
        formatted_plan(op_sh.pack_shards(
            op_sh.token_counts(docs.select("doc_id", "text")), 4096)),
    )

    from docling_graph_spark.operators import textprep as op_tp

    sections["trigram-fluency"] = (
        "trigram_fluency_scores — explode/groupBy model collapses map-side "
        "to <=27^3 rows, model broadcast back, per-doc agg combines "
        "map-side (explode keeps doc rows co-located)",
        formatted_plan(op_tp.trigram_fluency_scores(docs)),
    )

    from docling_graph_spark.operators import metadata as op_md
    from docling_graph_spark.sources.web_pages import synthesize_web_pages

    sections["page-metadata"] = (
        "metadata_stats — one codegen'd regexp pass in the scan stage, "
        "single Exchange for the per-lang rollup",
        formatted_plan(op_md.metadata_stats(synthesize_web_pages(spark, SF))),
    )

    sections["head-meta"] = (
        "head_meta_stats — Trafilatura-style head metadata "
        "(published_time/author/canonical): same scan-stage regexp + "
        "single-Exchange rollup shape as metadata_stats",
        formatted_plan(op_md.head_meta_stats(
            synthesize_web_pages(spark, SF, with_head_meta=True))),
    )

    sections["host-cap"] = (
        "host_cap_sample — skew-aware two-stage top-K: (host, salt) "
        "window bounds any partition at k*salts rows before the per-host "
        "window; only the narrow url projection shuffles",
        formatted_plan(op_tp.host_cap_sample(
            synthesize_web_pages(spark, SF).select("url"), k=8)),
    )

    from docling_graph_spark.operators import webtables as op_wt

    sections["web-tables"] = (
        "web_table_stats — single-pass table mining: transform over the "
        "tables array (no explode self-join), one partial/final per-lang "
        "aggregation, no Python row path",
        formatted_plan(op_wt.web_table_stats(
            synthesize_web_pages(spark, SF, with_tables=True))),
    )

    from docling_graph_spark.operators import retrieval as op_ret

    _links = op_ret.doc_link_pairs(synthesize_web_pages(spark, SF)).filter(
        F.col("query_id") < 8)
    sections["hard-negatives"] = (
        "mine_hard_negatives — query/link side broadcast (corpus scan "
        "never shuffles); linked-pair exclusion is a broadcast left-anti "
        "BEFORE the ranking window",
        formatted_plan(op_ret.mine_hard_negatives(
            emb.select("vec_id", "embedding"), _links)),
    )

    from docling_graph_spark.operators import invindex as op_ix

    sections["inverted-index"] = (
        "postings_stats — doc-range-blocked inverted index: group size "
        "bounded by block width regardless of term skew (no hot-key "
        "reducer), delta+varint size accounting in pure integer exprs",
        formatted_plan(op_ix.postings_stats(docs)),
    )

    from docling_graph_spark.operators import linkgraph as op_lg

    sections["alias-resolution"] = (
        "alias_resolution_stats — redirect/rel-canonical chain resolution "
        "via pointer jumping (log2(depth) equi-join rounds, lineage "
        "truncated per round); summary is ONE aggregation, no crossJoin",
        formatted_plan(op_lg.alias_resolution_stats(
            qmod._alias_edges(spark, SF))),
    )

    from docling_graph_spark.operators import quantiles as op_q

    sections["exact-quantiles"] = (
        "exact_quantiles — order statistics with no global sort: "
        "groupBy(value) collapses rows to distinct values, the "
        "integer-keyed distributed prefix sum ranks them, rank probes "
        "are a literal-array filter (no join)",
        formatted_plan(op_q.exact_quantiles(
            docs.select(F.length("text").alias("len")), "len")),
    )

    sections["pps-sample"] = (
        "pps_systematic_sample — exactly-k PPS sampling as a pure "
        "projection over the distributed prefix sum (one narrow window "
        "exchange; grid membership in exact int64 closed form)",
        formatted_plan(op_sh.pps_systematic_sample(
            op_sh.token_counts(docs.select("doc_id", "text")), k=37)),
    )

    from docling_graph_spark.operators import domains as op_dom

    sections["domain-rollup"] = (
        "domain_stats — eTLD+1 extraction entirely in whole-stage "
        "codegen (literal suffix array + array_max longest-match key; "
        "no join, no UDF), one map-side-combinable rollup",
        formatted_plan(op_dom.domain_stats(
            qmod._stress_hosts(spark, SF))),
    )

    sections["snapshot-diff"] = (
        "snapshot_diff_stats — crawl-snapshot diff + latest-wins "
        "compaction: ONE hash partition on url (partial/final agg split, "
        "no join/window); SortAggregate is Spark's required choice for "
        "string/struct min-max buffers",
        formatted_plan(qmod.q_snapshot_diff(spark, SF)),
    )

    from docling_graph_spark.operators import sharding as op_sh

    sections["global-shuffle"] = (
        "shuffle_positions — deterministic global training shuffle: "
        "dense md5-order positions with NO SinglePartition exchange "
        "(md5 uniformity makes the key prefix the range bucket; the "
        "per-bucket window's hash exchange is the only shuffle, offsets "
        "broadcast back)",
        formatted_plan(op_sh.shuffle_positions(
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id"))),
    )

    from docling_graph_spark.operators import dsir as op_dsir

    sections["dsir"] = (
        "dsir importance scores — hashed-bigram occurrences feed ONE "
        "groupBy(bucket) train pass (<=4096 result rows) and a "
        "BroadcastHashJoin scoring pass; the corpus relation never "
        "shuffles on the feature key",
        formatted_plan(op_dsir.importance_scores(
            spark.read.parquet(f"{SF}/documents.parquet"))),
    )

    from docling_graph_spark.operators import asof as op_asof

    ev = spark.read.parquet(f"{SF}/events.parquet")
    p = (ev.filter(F.col("event_type") == "purchase")
         .select("user_id", "ts"))
    c = (ev.filter(F.col("event_type") == "click")
         .select("user_id", "ts",
                 F.unix_micros(F.col("ts").cast("timestamp"))
                 .alias("c_us")))
    sections["asof-join"] = (
        "asof_join — union trick: one hash exchange of the tagged narrow "
        "union + a partition-local sort window; no range/nested-loop "
        "join anywhere",
        formatted_plan(op_asof.asof_join(
            p, c, "user_id", "ts", "ts", "c_us")),
    )

    from docling_graph_spark.operators import intervals as op_iv

    iv_df = p.select(
        F.col("user_id").alias("id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("start"),
        (F.unix_micros(F.col("ts").cast("timestamp")) + 60_000_000)
        .alias("end"))
    sections["interval-join"] = (
        "interval_overlap_join — grid-cell explode + hash equi-join on "
        "the cell, true-overlap filter, pair dedup; no CartesianProduct "
        "or BroadcastNestedLoopJoin",
        formatted_plan(op_iv.interval_overlap_join(
            iv_df, iv_df, "id", "id", 3_600_000_000)),
    )

    wanted = sys.argv[1:] or list(sections)
    for key in wanted:
        title, plan = sections[key]
        print(f"\n## {title}\n\n```\n{plan.strip()}\n```")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Cluster job entry point (north rule: `spark-submit --py-files`).

Run the document→graph pipeline over a web-pages table, checkpointed and
resumable.  Works identically under spark-submit and plain python:

    # package the library for the executors
    (cd /root/repo && zip -qr /tmp/dgspark.zip docling_graph_spark)

    spark-submit --master spark://...:7077 \\
        --py-files /tmp/dgspark.zip \\
        --conf spark.sql.adaptive.enabled=true \\
        --conf spark.sql.shuffle.partitions=2048 \\
        run_job.py --input s3://crawl/web_pages --output s3://out/graph \\
                   --mode resume

    # local smoke (synthesizes the input from the test corpus)
    python run_job.py --sf-dir /root/testdata/sf0.001 --output /tmp/graph_out

Modes:
  oneshot — full pipeline, overwrite outputs (no checkpoint)
  resume  — CheckpointedRun: left_anti restart over the output tables
  stream  — Structured-Streaming availableNow drain with offset checkpoints
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", help="web_pages table path (parquet/Iceberg)")
    ap.add_argument("--sf-dir", help="testdata dir to synthesize input from")
    ap.add_argument("--output", required=True, help="output root")
    ap.add_argument("--mode", choices=["oneshot", "resume", "stream"],
                    default="resume")
    ap.add_argument("--stream-checkpoint", default=None)
    ap.add_argument("--id-mode", choices=["blake2b", "xxhash64"],
                    default="xxhash64")
    ap.add_argument("--max-tokens", type=int, default=None)
    ap.add_argument("--cores", type=int, default=None,
                    help="local[N] cores when no master is configured")
    ap.add_argument("--report", action="store_true",
                    help="also write report.md + graph.html (bounded driver-"
                         "side render of the assembled graph) to --output")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # under spark-submit the session/master/conf come from the submit command;
    # standalone we build the tuned local session
    existing = SparkSession.getActiveSession()
    if existing is not None:
        spark = existing
        from docling_graph_spark.session import ship_package
        ship_package(spark)
    else:
        from docling_graph_spark.session import get_spark
        spark = get_spark(app_name="docling-graph-spark-job", cores=args.cores)
    spark.sparkContext.setLogLevel("WARN")

    from docling_graph_spark.pipeline import PipelineConfig

    cfg_kwargs = {"id_mode": args.id_mode}
    if args.max_tokens:
        cfg_kwargs["max_tokens"] = args.max_tokens
    cfg = PipelineConfig(**cfg_kwargs)

    if args.input:
        pages = spark.read.parquet(args.input)
    elif args.sf_dir:
        from docling_graph_spark.sources.web_pages import synthesize_web_pages
        pages = synthesize_web_pages(spark, args.sf_dir)
    elif args.mode != "stream":
        ap.error("--input or --sf-dir is required")

    t0 = time.perf_counter()
    if args.mode == "stream":
        if not args.input:
            ap.error("--mode stream requires --input (a growing directory)")
        from docling_graph_spark.streaming.incremental import run_incremental
        ckpt = args.stream_checkpoint or f"{args.output.rstrip('/')}/_stream_ckpt"
        run_incremental(spark, args.input, args.output, ckpt, cfg)
        processed = spark.read.parquet(
            f"{args.output.rstrip('/')}/extracted"
        ).count()
    elif args.mode == "resume":
        from docling_graph_spark.checkpointing import CheckpointedRun
        ckpt_run = CheckpointedRun(spark, args.output, cfg)
        processed = ckpt_run.run(pages)
        if args.report:
            from docling_graph_spark import visualizers
            out = args.output.rstrip("/")
            visualizers.write_report(ckpt_run.nodes(), ckpt_run.edges(),
                                     f"{out}/report.md")
            visualizers.write_interactive_html(ckpt_run.nodes(),
                                               ckpt_run.edges(),
                                               f"{out}/graph.html")
    else:
        from docling_graph_spark import exporters
        from docling_graph_spark.pipeline import run_pipeline
        res = run_pipeline(pages, cfg)
        out = args.output.rstrip("/")
        res.extracted.write.mode("overwrite").parquet(f"{out}/extracted")
        res.chunks.write.mode("overwrite").parquet(f"{out}/chunks")
        res.metrics.write.mode("overwrite").parquet(f"{out}/metrics")
        exporters.write_csv(res.nodes, res.edges, out)
        if args.report:
            from docling_graph_spark import visualizers
            visualizers.write_report(res.nodes, res.edges, f"{out}/report.md")
            visualizers.write_interactive_html(res.nodes, res.edges,
                                               f"{out}/graph.html")
        processed = spark.read.parquet(f"{out}/extracted").count()

    print(json.dumps({
        "mode": args.mode,
        "processed_docs": int(processed),
        "wall_seconds": round(time.perf_counter() - t0, 2),
        "output": args.output,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Benchmark harness (driver contract).

Default mode: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"<name>": sec, ...}, "sf": <sf>, ...extras}

The headline number is the end-to-end document->graph pipeline
(extract -> chunk -> mention -> graph assembly -> cleanup -> metrics) over
the documents corpus; per-query timings cover the full catalog.  Pipeline-
backed catalog queries share one persisted extraction pass (reported under
"pipeline_e2e"), matching how a production job would amortize the scan.

--scaling mode: run the same pipeline at two parallelism levels (N and 4N
cores, default 8 and 32) on the same input and report throughput at both
plus scaling efficiency = (T_N / T_4N) / 4 — the sandbox stand-in for the
north rule's two-cluster-size criterion (no real cluster here).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _run_pipeline_once(spark, sf_dir: str) -> tuple[float, int]:
    """One full e2e pass; returns (seconds, docs)."""
    from docling_graph_spark.pipeline import PipelineConfig, run_on_testdata

    cfg = PipelineConfig(id_mode="xxhash64")
    t0 = time.perf_counter()
    res = run_on_testdata(spark, sf_dir, cfg)
    # force every output relation
    n_nodes = res.nodes.count()
    n_edges = res.edges.count()
    docs = res.metrics.agg({"docs_parsed": "sum"}).collect()[0][0] or 0
    dt = time.perf_counter() - t0
    assert n_nodes > 0 and n_edges > 0
    return dt, int(docs)


def bench(sf_dir: str, cores: int) -> dict:
    from docling_graph_spark.session import get_spark

    spark = get_spark(app_name="dgspark-bench", cores=cores,
                      shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")

    queries: dict[str, float] = {}

    # headline: e2e pipeline (fresh, nothing cached)
    t_e2e, docs = _run_pipeline_once(spark, sf_dir)
    queries["pipeline_e2e"] = round(t_e2e, 3)

    # full catalog; pipeline-backed entries share one persisted extraction
    import __spark_entry__ as entry_mod

    cat = entry_mod.queries()
    for name, fn in sorted(cat.items()):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.count()
        queries[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(queries.values()), 3)
    out = {
        "metric": "e2e extraction+graph docs/sec + catalog query latency",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": _sf_of(sf_dir),
        "docs": docs,
        "docs_per_sec": round(docs / t_e2e, 2),
        "cores": cores,
    }
    spark.stop()
    return out


def bench_scaling(sf_dir: str, n_small: int, n_large: int,
                  repeats: int = 2) -> dict:
    """Same job at two parallelism levels; efficiency = (T_N/T_4N)/factor."""
    from docling_graph_spark.session import get_spark

    results = {}
    for cores in (n_small, n_large):
        spark = get_spark(app_name=f"dgspark-scale-{cores}", cores=cores,
                          shuffle_partitions=max(cores, 16))
        spark.sparkContext.setLogLevel("ERROR")
        _run_pipeline_once(spark, sf_dir)  # warm-up (JVM/Arrow init)
        best, docs = min(
            (_run_pipeline_once(spark, sf_dir) for _ in range(repeats)),
            key=lambda p: p[0],
        )
        results[cores] = {"sec": round(best, 3), "docs": docs,
                          "docs_per_sec": round(docs / best, 2)}
        spark.stop()

    factor = n_large / n_small
    eff = (results[n_small]["sec"] / results[n_large]["sec"]) / factor
    return {
        "metric": "scaling efficiency (docs/sec pipeline, N vs 4N cores)",
        "sf": _sf_of(sf_dir),
        "n_small": n_small,
        "n_large": n_large,
        "small": results[n_small],
        "large": results[n_large],
        "scaling_efficiency": round(eff, 3),
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--sf-dir", default=SF_DIR)
    ap.add_argument("--small", type=int, default=8)
    ap.add_argument("--large", type=int, default=32)
    args = ap.parse_args()

    if args.scaling:
        print(json.dumps(bench_scaling(args.sf_dir, args.small, args.large)))
    else:
        print(json.dumps(bench(args.sf_dir, CPUS)))

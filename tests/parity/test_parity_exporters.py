"""Dual-run fuzz parity for the exporter/formatter scalar functions.

Unlike tests/test_exporters.py + tests/test_functions_plans.py (which check
our Column exprs against hand-transcribed expectations), these load the
ACTUAL reference modules and compare outputs over a seeded adversarial
corpus in one Spark pass per function:

* Cypher escape / identifier sanitize —
  `/root/reference/docling_graph/core/exporters/cypher_exporter.py:65-100`
* truncate / Title-Case key —
  `/root/reference/docling_graph/core/utils/string_formatter.py:32-72`
* filename sanitize —
  `/root/reference/docling_graph/core/utils/output_manager.py:16-59`
* ISO datetime serialization —
  `/root/reference/docling_graph/core/utils/string_formatter.py:75-94`
* graph stats — `/root/reference/docling_graph/core/utils/stats_calculator.py:10-71`
"""

from __future__ import annotations

import datetime as dt
import random
import string as string_mod

import pytest
from pyspark.sql import functions as F

from docling_graph_spark import exporters
from docling_graph_spark.functions.scalars import (
    format_property_key,
    iso_datetime,
    sanitize_filename,
    truncate_string,
)
from docling_graph_spark.kernels import graph_build as k_graph

from .ref_loader import load_ref

ref_cypher = load_ref("core/exporters/cypher_exporter.py")
ref_fmt = load_ref("core/utils/string_formatter.py")
ref_out = load_ref("core/utils/output_manager.py")
ref_stats = load_ref("core/utils/stats_calculator.py")

TRICKY_ALPHABET = (
    string_mod.ascii_letters + string_mod.digits
    + "\\\"'\n\t /:*?<>|[](){}._- üñíçødé€—😀"
)


def _corpus(n: int = 400, seed: int = 20260817) -> list[str]:
    rng = random.Random(seed)
    out = ["", " ", "_", "...", "a" * 200, "_" * 10, "9lives", "\\", '"', "\n"]
    while len(out) < n:
        k = rng.randint(1, rng.choice([5, 30, 170]))
        out.append("".join(rng.choice(TRICKY_ALPHABET) for _ in range(k)))
    return out


@pytest.fixture(scope="module")
def fuzz_rows(spark):
    corpus = _corpus()
    df = spark.createDataFrame([(s,) for s in corpus], ["v"])
    rows = df.select(
        "v",
        exporters.cypher_escape(F.col("v")).alias("esc"),
        exporters.sanitize_identifier(F.col("v")).alias("ident"),
        truncate_string(F.col("v"), 40).alias("trunc"),
        format_property_key(F.col("v")).alias("key"),
        sanitize_filename(F.col("v")).alias("fname"),
    ).collect()
    assert len(rows) == len(corpus)
    return rows


def test_cypher_escape_fuzz_parity(fuzz_rows):
    esc = ref_cypher.CypherExporter._escape_cypher_string
    for r in fuzz_rows:
        assert r["esc"] == esc(r["v"]), repr(r["v"])


def test_sanitize_identifier_fuzz_parity(fuzz_rows):
    san = ref_cypher.CypherExporter._sanitize_identifier
    for r in fuzz_rows:
        assert r["ident"] == san(r["v"]), repr(r["v"])


def test_truncate_fuzz_parity(fuzz_rows):
    for r in fuzz_rows:
        assert r["trunc"] == ref_fmt.truncate_string(r["v"], 40), repr(r["v"])


def test_format_property_key_fuzz_parity(fuzz_rows):
    # Title-Case semantics hold on identifier-shaped keys (the only shape the
    # reference feeds it: pydantic field names — snake_case or camelCase).
    for r in fuzz_rows:
        v = r["v"]
        if not v or not v.replace("_", "").isalnum() or not v.isascii():
            continue
        assert r["key"] == ref_fmt.format_property_key(v), repr(v)


def test_sanitize_filename_fuzz_parity(fuzz_rows):
    # reference appends a wall-clock `_YYYYMMDD_HHMMSS`; our Column takes the
    # timestamp as a parameter, so compare the base (strip the two
    # timestamp tokens from the reference output)
    for r in fuzz_rows:
        ref = ref_out.sanitize_filename(r["v"])
        assert r["fname"] == ref.rsplit("_", 2)[0], repr(r["v"])


def test_sanitize_filename_frozen_clock_exact(spark, monkeypatch):
    frozen = dt.datetime(2024, 1, 25, 7, 35, 0)

    class _FrozenDT:
        @staticmethod
        def now():
            return frozen

    monkeypatch.setattr(ref_out, "datetime", _FrozenDT)
    corpus = ["invoice.pdf", "My Document (2024).pdf", "", "a/b\\c:d*e",
              "__edge__", "x" * 300]
    df = spark.createDataFrame([(s,) for s in corpus], ["v"])
    rows = df.select(
        "v",
        sanitize_filename(
            F.col("v"), timestamp=F.lit("20240125_073500")
        ).alias("fname"),
    ).collect()
    for r in rows:
        assert r["fname"] == ref_out.sanitize_filename(r["v"]), repr(r["v"])


def test_iso_datetime_parity(spark):
    rng = random.Random(7)
    stamps = [
        dt.datetime(rng.randint(1971, 2100), rng.randint(1, 12),
                    rng.randint(1, 28), rng.randint(0, 23),
                    rng.randint(0, 59), rng.randint(0, 59))
        for _ in range(50)
    ]
    df = spark.createDataFrame([(s,) for s in stamps], "v timestamp")
    rows = df.select(
        "v",
        iso_datetime(F.col("v")).alias("iso"),
        iso_datetime(F.col("v"), date_only=True).alias("iso_d"),
    ).collect()
    for r in rows:
        assert r["iso"] == ref_fmt.json_serializable(r["v"])
        assert r["iso_d"] == ref_fmt.json_serializable(r["v"].date())


def test_graph_stats_parity():
    conv = load_ref("core/converters/graph_converter.py")
    from .test_parity_ref_scenarios import INVOICE, ORG, _our_graph

    for models in ([INVOICE], [ORG], [INVOICE, ORG]):
        c = conv.GraphConverter(validate_graph=False, auto_cleanup=True)
        graph, meta = c.pydantic_list_to_graph(models)
        nodes, edges = _our_graph(models)
        ours = k_graph.graph_stats(
            list(nodes.values()), [(s, d, l) for (s, d), l in edges.items()]
        )
        assert ours["node_count"] == meta.node_count
        assert ours["edge_count"] == meta.edge_count
        assert ours["node_types"] == meta.node_types
        assert ours["edge_types"] == meta.edge_types
        assert ours["average_degree"] == pytest.approx(meta.average_degree)

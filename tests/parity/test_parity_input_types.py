"""Dual-run parity for S1 input-type detection.

Drives the ACTUAL reference ``InputTypeDetector``
(`/root/reference/docling_graph/core/input/types.py:39-218`) over real temp
files / URLs / raw strings and compares with our JVM-side
``sources.input_types.input_type`` Column over (source, content) rows.

Domain mapping: a table row always has a payload, so it corresponds to an
*existing* file in the reference's decision tree — extension cases are
materialized as temp files.  CLI-mode ConfigurationError ↔ our NULL
(error-row routing); API-mode raw-string TEXT ↔ our 'text'.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from docling_graph_spark.sources.input_types import input_type

from .ref_loader import load_ref

ref_types = load_ref("core/input/types.py")


DOCLING_DOC = {"schema_name": "DoclingDocument", "version": "1.0", "pages": {}}
VERSION_ONLY = {"version": "2.1"}
PAGES_MAIN = {"pages": {"1": {}}, "main_text": []}
PLAIN = {"hello": "world"}


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    d = tmp_path_factory.mktemp("inputs")
    made = {}
    for name, content in [
        ("doc.pdf", "%PDF-1.4 fake"),
        ("scan.JPG", "bin"),
        ("img.png", "bin"),
        ("img.tiff", "bin"),
        ("note.txt", "hello"),
        ("note.md", "# hi"),
        ("note.markdown", "# hi"),
        ("docling.json", json.dumps(DOCLING_DOC)),
        ("versioned.json", json.dumps(VERSION_ONLY)),
        ("paged.json", json.dumps(PAGES_MAIN)),
        ("plain.json", json.dumps(PLAIN)),
        ("broken.json", "{not valid json"),
        ("list.json", json.dumps([1, 2, 3])),
        ("weird.name.with.dots.txt", "x"),
        ("archive.xyz", "???"),
    ]:
        p = d / name
        p.write_text(content)
        made[name] = p
    return made


def _ours(spark, rows, mode):
    df = spark.createDataFrame(rows, "source string, content string")
    return [
        r["t"] for r in df.select(
            input_type(F.col("source"), F.col("content"), mode=mode).alias("t")
        ).collect()
    ]


def test_cli_mode_parity(spark, files):
    rows, expected = [], []
    for name, path in files.items():
        try:
            ref = ref_types.InputTypeDetector.detect(path, mode="cli").value
        except Exception:
            ref = None  # ConfigurationError ↔ our NULL error-row
        rows.append((str(path), path.read_text()))
        expected.append(ref)
    # URLs classify without touching the filesystem
    for url in ["http://example.com/a.pdf", "https://x.io/page"]:
        rows.append((url, ""))
        expected.append(ref_types.InputTypeDetector.detect(url, mode="cli").value)
    assert _ours(spark, rows, "cli") == expected


def test_api_mode_parity_files_and_strings(spark, files):
    rows, expected = [], []
    for name, path in files.items():
        if name == "archive.xyz":
            continue  # existing unsupported file raises in BOTH reference modes
        rows.append((str(path), path.read_text()))
        expected.append(ref_types.InputTypeDetector.detect(path, mode="api").value)
    for raw in ["just a sentence", "", "   ", "no/such/file.nowhere",
                "http://example.com/x", "https://h.io/y.json"]:
        rows.append((raw, raw))
        expected.append(ref_types.InputTypeDetector.detect(raw, mode="api").value)
    assert _ours(spark, rows, "api") == expected


def test_api_unknown_suffix_is_text(spark):
    # row-model reading of the reference's raw-string branch
    assert _ours(spark, [("whatever.zzz", "payload")], "api") == ["text"]


def test_cli_unknown_suffix_routes_to_error(spark):
    assert _ours(spark, [("whatever.zzz", "payload")], "cli") == [None]

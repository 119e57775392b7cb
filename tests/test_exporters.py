"""Exporter sinks (SURVEY §2.1 S6-S8): escape/sanitize parity with the
reference algorithms, and round-trips through CSV/JSON/Cypher outputs."""

from __future__ import annotations

import json
import re

import pytest
from pyspark.sql import functions as F

from docling_graph_spark import exporters


def ref_escape(val: str) -> str:
    """`cypher_exporter.py:65-83` verbatim semantics."""
    return (
        val.replace("\\", "\\\\")
        .replace("'", "\\'")
        .replace('"', '\\"')
        .replace("\n", "\\n")
    )


def ref_sanitize(identifier: str) -> str:
    """`cypher_exporter.py:86-100` verbatim semantics."""
    sanitized = re.sub(r"[^a-zA-Z0-9_]", "_", str(identifier))
    if sanitized and sanitized[0].isdigit():
        sanitized = "n_" + sanitized
    return sanitized or "node"


TRICKY = [
    "plain",
    'has "quotes" and \'apostrophes\'',
    "back\\slash \\\\ double",
    "new\nline\nand more",
    "mixed \\ ' \" \n end",
    "123starts-with-digit",
    "üñíçødé + spaces & symbols!",
    "",
]


@pytest.fixture(scope="module")
def tricky_df(spark):
    return spark.createDataFrame([(s,) for s in TRICKY], ["v"])


def test_cypher_escape_matches_reference(tricky_df):
    got = [r["e"] for r in
           tricky_df.select(exporters.cypher_escape(F.col("v")).alias("e"))
           .collect()]
    assert got == [ref_escape(s) for s in TRICKY]


def test_sanitize_identifier_matches_reference(tricky_df):
    got = [r["s"] for r in
           tricky_df.select(
               exporters.sanitize_identifier(F.col("v")).alias("s")
           ).collect()]
    assert got == [ref_sanitize(s) for s in TRICKY]


@pytest.fixture(scope="module")
def small_graph(spark):
    nodes = spark.createDataFrame(
        [
            ("Doc_1", "WebDocument", "entity", {"url": "https://x/1", "t": 'a"b'}),
            ("Term_2", "Term", "entity", {"term": "hello", "none": None}),
            ("3bad id", "Term", "entity", {}),
        ],
        "id string, label string, type string, properties map<string,string>",
    )
    edges = spark.createDataFrame(
        [("Doc_1", "Term_2", "mentions", {"count": "2"})],
        "src string, dst string, label string, properties map<string,string>",
    )
    return nodes, edges


def test_cypher_node_statements(small_graph):
    nodes, _ = small_graph
    stmts = {r["id"]: r["stmt"]
             for r in exporters.cypher_node_statements(nodes).collect()}
    assert stmts["Doc_1"] == (
        'CREATE (Doc_1:WebDocument {id: "Doc_1", t: "a\\"b", '
        'url: "https://x/1"})'
    )
    # null property values skipped (reference skips None)
    assert stmts["Term_2"] == 'CREATE (Term_2:Term {id: "Term_2", term: "hello"})'
    # digit-prefixed id sanitized for the variable, raw in the id property
    assert stmts["3bad id"] == 'CREATE (n_3bad_id:Term {id: "3bad id"})'


def test_cypher_edge_statements(small_graph):
    _, edges = small_graph
    [row] = exporters.cypher_edge_statements(edges).collect()
    assert row["stmt"] == (
        'MATCH (a {id: "Doc_1"}), (b {id: "Term_2"})\n'
        "CREATE (a)-[:MENTIONS {count: \"2\"}]->(b)"
    )


def test_csv_json_cypher_roundtrip(spark, small_graph, tmp_path):
    nodes, edges = small_graph
    out = str(tmp_path / "graph")

    np, ep = exporters.write_csv(nodes, edges, out, single_file=True)
    rn = spark.read.option("header", True).csv(np)
    re_ = spark.read.option("header", True).csv(ep)
    assert rn.count() == 3 and re_.count() == 1
    assert set(rn.columns) == {"id", "label", "type", "properties"}
    props = json.loads(
        rn.filter(F.col("id") == "Doc_1").collect()[0]["properties"]
    )
    assert props == {"t": 'a"b', "url": "https://x/1"}

    jn, je = exporters.write_json(nodes, edges, out)
    assert spark.read.json(jn).count() == 3
    assert spark.read.json(je).count() == 1

    exporters.write_cypher(nodes, edges, f"{out}/graph.cypher",
                           single_file=True)
    lines = spark.read.text(f"{out}/graph.cypher").count()
    # 3 CREATE node lines + 1 two-line relationship statement
    assert lines == 5


def test_graph_json_small(small_graph):
    nodes, edges = small_graph
    doc = json.loads(exporters.graph_json_small(nodes, edges))
    assert doc["metadata"] == {"node_count": 3, "edge_count": 1}
    assert [n["id"] for n in doc["nodes"]] == ["3bad id", "Doc_1", "Term_2"]
    assert doc["edges"][0]["src"] == "Doc_1"

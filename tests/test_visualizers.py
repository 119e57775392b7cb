"""Report + interactive HTML visualization surface (SURVEY §3.3, W4, O2)."""

from __future__ import annotations

import json
import re

import pytest

from docling_graph_spark import visualizers


@pytest.fixture(scope="module")
def small_graph(spark):
    nodes = spark.createDataFrame(
        [("Doc_1", "WebDocument", {"url": "http://a/1", "lang": "en"}),
         ("Doc_2", "WebDocument", {"url": "http://a/2", "lang": "de"}),
         ("Chunk_1", "Chunk", {"token_est": "12"}),
         ("Chunk_2", "Chunk", {"token_est": "9"}),
         ("Chunk_3", "Chunk", {"token_est": "40"}),
         ("Term_x", "Term", {"surface": "x" * 200})],
        "id string, label string, properties map<string,string>")
    edges = spark.createDataFrame(
        [("Doc_1", "Chunk_1", "has_chunk", {}),
         ("Doc_1", "Chunk_2", "has_chunk", {}),
         ("Doc_2", "Chunk_3", "has_chunk", {}),
         ("Doc_2", "Term_x", "mentions", {})],
        "src string, dst string, label string, properties map<string,string>")
    return nodes, edges


def test_report_sections_and_ordering(small_graph):
    nodes, edges = small_graph
    md = visualizers.markdown_report(nodes, edges, source_model_count=2,
                                     generated_at="2026-01-01T00:00:00")
    assert md.startswith("# Knowledge Graph Report")
    assert "- **Total Nodes**: 6" in md
    assert "- **Total Edges**: 4" in md
    assert "- **Source Models**: 2" in md
    # W4: distributions sorted by count desc
    node_rows = re.findall(r"\| (\w+) \| (\d+) \| ([\d.]+)% \|", md)
    labels = [r[0] for r in node_rows]
    assert labels.index("Chunk") < labels.index("WebDocument") < labels.index("Term")
    counts = {r[0]: int(r[1]) for r in node_rows}
    assert counts["Chunk"] == 3 and counts["has_chunk"] == 3
    # percentages of the right total
    pct = {r[0]: float(r[2]) for r in node_rows}
    assert pct["Chunk"] == 50.0 and pct["mentions"] == 25.0


def test_report_samples_bounded_and_truncated(small_graph):
    nodes, edges = small_graph
    md = visualizers.markdown_report(nodes, edges, max_samples=2)
    # O2: 2 node samples, deterministic orderBy(id)
    assert md.count("### Node: ") == 2
    assert "### Node: Chunk_1" in md and "### Node: Chunk_2" in md
    # P7: 200-char property truncated to 100 with ellipsis
    assert "..." in visualizers.markdown_report(nodes, edges, max_samples=6)
    # F6 Title Case key formatting
    assert "**Token Est**:" in md
    # samples can be disabled
    assert "### Node" not in visualizers.markdown_report(
        nodes, edges, include_samples=False)


def test_report_empty_graph_raises(spark, small_graph):
    nodes, edges = small_graph
    with pytest.raises(ValueError):
        visualizers.markdown_report(nodes.limit(0), edges)


def test_interactive_html_selfcontained(small_graph, tmp_path):
    nodes, edges = small_graph
    html = visualizers.interactive_html(nodes, edges, max_rows=10)
    assert html.startswith("<!DOCTYPE html>")
    assert "http://" not in html.split("GRAPH = ")[0]  # no CDN/external fetch
    payload = html.split("GRAPH = ")[1].split(";\nconst canvas")[0]
    data = json.loads(payload)
    assert {n["id"] for n in data["nodes"]} == {
        "Doc_1", "Doc_2", "Chunk_1", "Chunk_2", "Chunk_3", "Term_x"}
    assert data["metadata"]["edge_count"] == 4
    p = visualizers.write_interactive_html(nodes, edges,
                                           str(tmp_path / "g.html"))
    assert (tmp_path / "g.html").read_text().startswith("<!DOCTYPE html>")
    # report writer adds .md
    rp = visualizers.write_report(nodes, edges, str(tmp_path / "report"))
    assert rp.endswith("report.md")

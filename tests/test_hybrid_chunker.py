"""Hybrid structure-aware chunker kernel tests (no Spark).

Contract: docling HybridChunker behavior re-expressed over (text, block
spans) — see docling_graph_spark/kernels/hybrid_chunker.py and the
reference's configuration/consumption at
/root/reference/docling_graph/core/extractors/document_chunker.py:97-220.
"""

from __future__ import annotations

import pytest

from docling_graph_spark.kernels.batching import estimate_tokens
from docling_graph_spark.kernels.hybrid_chunker import (
    Block,
    HybridChunk,
    SEPARATOR,
    contextualize,
    hybrid_chunk,
)


def build_doc(items):
    """items: list of (tag, text) -> (text, blocks) joined by SEPARATOR."""
    parts, blocks, pos = [], [], 0
    for tag, t in items:
        if parts:
            pos += len(SEPARATOR)
        blocks.append(Block(pos, pos + len(t), tag))
        parts.append(t)
        pos += len(t)
    return SEPARATOR.join(parts), blocks


def test_heading_stack_push_pop():
    text, blocks = build_doc([
        ("h1", "Top"),
        ("p", "a" * 40),
        ("h2", "Sub"),
        ("p", "b" * 40),
        ("h2", "Sub2"),          # replaces Sub at the same level
        ("p", "c" * 40),
        ("h1", "Top2"),          # pops everything deeper or equal
        ("p", "d" * 40),
    ])
    chunks = hybrid_chunk(text, blocks, max_tokens=20, merge_peers=False)
    paths = [c.heading_path for c in chunks]
    assert paths == [
        ("Top",), ("Top", "Sub"), ("Top", "Sub2"), ("Top2",),
    ]
    # headings emit no chunk of their own
    assert all(set(c.text) <= {"a", "b", "c", "d"} for c in chunks)


def test_merge_peers_packs_adjacent_same_path():
    # 3 paragraphs of 120 chars under one heading, max_tokens=100 (ratio 3):
    # est(120)=48, est(120+2+120)=96 <= 100 merges, est(+2+120)=145 breaks
    text, blocks = build_doc([
        ("h2", "S0"), ("p", "a" * 120), ("p", "b" * 120), ("p", "c" * 120),
    ])
    chunks = hybrid_chunk(text, blocks, max_tokens=100, merge_peers=True)
    assert [c.text.count(SEPARATOR) + 1 for c in chunks] == [2, 1]
    for c in chunks:
        assert c.text == text[c.start:c.end]  # span-lineage invariant
        assert c.heading_path == ("S0",)
        assert c.token_est == estimate_tokens(c.text)


def test_merge_stops_at_heading_boundary():
    text, blocks = build_doc([
        ("h2", "S0"), ("p", "a" * 20),
        ("h2", "S1"), ("p", "b" * 20),
    ])
    chunks = hybrid_chunk(text, blocks, max_tokens=100, merge_peers=True)
    assert len(chunks) == 2  # small, but different heading paths
    assert chunks[0].heading_path == ("S0",)
    assert chunks[1].heading_path == ("S1",)


def test_no_merge_when_disabled():
    text, blocks = build_doc([
        ("h2", "S0"), ("p", "a" * 20), ("p", "b" * 20),
    ])
    chunks = hybrid_chunk(text, blocks, max_tokens=100, merge_peers=False)
    assert len(chunks) == 2


def test_oversized_block_split_keeps_offsets():
    big = ("word " * 200).strip()         # ~1000 chars, sentence-less
    text, blocks = build_doc([("h2", "S0"), ("p", big)])
    chunks = hybrid_chunk(text, blocks, max_tokens=50, merge_peers=True)
    assert len(chunks) > 1
    for c in chunks:
        assert c.text == text[c.start:c.end]
        assert c.heading_path == ("S0",)
        # split pieces of one block never re-merge (gap is not SEPARATOR)
        assert estimate_tokens(c.text) <= 50 or len(c.text) <= 200


def test_contextualize_prefixes_heading_path():
    c = HybridChunk(0, 0, 4, "body", ("A", "B"), 2)
    assert contextualize(c) == "A\nB\nbody"
    c2 = HybridChunk(0, 0, 4, "body", (), 2)
    assert contextualize(c2) == "body"


def test_empty_and_unstructured_inputs():
    assert hybrid_chunk("", [], 50) == []
    # no blocks: falls back to raw-text chunking of the whole text
    text = "one two three. " * 30
    chunks = hybrid_chunk(text, [], max_tokens=20)
    assert len(chunks) > 1
    assert all(c.heading_path == () for c in chunks)


def test_chunk_ids_sequential():
    text, blocks = build_doc(
        [("h2", "S")] + [("p", "x" * 200)] * 5
    )
    chunks = hybrid_chunk(text, blocks, max_tokens=70, merge_peers=True)
    assert [c.chunk_id for c in chunks] == list(range(len(chunks)))

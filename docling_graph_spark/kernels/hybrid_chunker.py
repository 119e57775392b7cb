"""Hybrid structure-aware chunker (the docling HybridChunker analogue).

The reference chunks via docling's ``HybridChunker`` — configured at
`/root/reference/docling_graph/core/extractors/document_chunker.py:97-113`,
consumed at `:199-220` — whose published behavior is:

1. one candidate chunk per structural item, tracking the active heading
   path (the h1..h6 stack at that point in the document);
2. items whose token count exceeds ``max_tokens`` are split;
3. ``merge_peers=True``: adjacent chunks with the SAME heading path merge
   left-to-right while the combined text still fits ``max_tokens``;
4. ``contextualize()``: the heading path is prepended (one heading per
   line) above the chunk text for downstream consumption.

This kernel reimplements that contract over our extracted representation —
``(text, block spans)`` from the HTML main-content extractor — instead of a
DoclingDocument tree:

* heading blocks (h1..h6) update the heading path (a deeper heading pushes,
  an equal/shallower one pops back to its level) and emit no chunk of their
  own — like docling, headings ride along as chunk *metadata* and do not
  consume chunk budget;
* every other block is a candidate chunk; oversized blocks are split with
  the raw-text fallback kernel (`chunking.chunk_spans`, the byte-parity
  anchor), keeping offsets into the block;
* the merge pass joins adjacent same-path chunks with a blank line — the
  extractor joins block texts with blank lines, so a merged chunk's text
  still equals ``text[start:end]`` of the extracted document (span-lineage
  invariant, checked in tests);
* token estimate = `batching.estimate_tokens` (len/4 x 1.2 safety margin,
  the reference heuristic `chunk_batcher.py:59-68`).

Pure function of its inputs: deterministic, no I/O — safe for Arrow UDFs.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence, Tuple

from .batching import estimate_tokens
from .chunking import chunk_spans

HEADING_TAGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}

SEPARATOR = "\n\n"  # extractor's inter-block join (html_main round-trip)


class Block(NamedTuple):
    start: int
    end: int
    tag: str


class HybridChunk(NamedTuple):
    chunk_id: int
    start: int          # offset into the extracted document text
    end: int            # exclusive
    text: str
    heading_path: Tuple[str, ...]
    token_est: int


def contextualize(chunk: HybridChunk) -> str:
    """Heading path above the chunk text, one heading per line (the
    ``HybridChunker.contextualize`` analogue, `document_chunker.py:214`)."""
    if not chunk.heading_path:
        return chunk.text
    return "\n".join(chunk.heading_path) + "\n" + chunk.text


def hybrid_chunk(
    text: str,
    blocks: Sequence[Block],
    max_tokens: int,
    merge_peers: bool = True,
    token_counter=None,
) -> List[HybridChunk]:
    """Chunk ``text`` along its block structure under a token budget.

    ``token_counter`` (callable str -> int) makes the budget checks
    tokenizer-bounded like the reference's HybridChunker wrapping a real
    HF tokenizer (`document_chunker.py:60-95`); ``None`` keeps the byte-
    stable length heuristic.  The oversized-block SPLIT path stays the
    char-based parity kernel (`chunking.chunk_spans`) either way — split
    boundaries are the reference fallback contract, only the fits/merges
    decisions consult the counter."""
    count = token_counter if token_counter is not None else estimate_tokens
    if not text:
        return []
    if not blocks:
        # unstructured input: fall back to the raw-text chunker, no headings
        blocks = [Block(0, len(text), "p")]

    # pass 1: walk blocks, maintain heading stack, emit per-block chunks
    path: List[Tuple[int, str]] = []  # (level, heading text)
    raw: List[Tuple[int, int, Tuple[str, ...]]] = []  # start, end, path
    for b in blocks:
        btext = text[b.start:b.end]
        level = HEADING_TAGS.get(b.tag)
        if level is not None:
            while path and path[-1][0] >= level:
                path.pop()
            path.append((level, btext))
            continue
        hp = tuple(h for _, h in path)
        if count(btext) <= max_tokens:
            raw.append((b.start, b.end, hp))
        else:
            for s in chunk_spans(btext, max_tokens):
                raw.append((b.start + s.start, b.start + s.end, hp))

    # pass 2: merge_peers — left-to-right, same heading path, joined text
    # must still fit the budget.  Blocks are separated by SEPARATOR in the
    # extracted text, so merged text == text[start:end] whenever the gap
    # between the chunks is exactly the separator; a non-separator gap
    # (split oversized block) blocks the merge to preserve span lineage.
    chunks: List[HybridChunk] = []
    for start, end, hp in raw:
        if merge_peers and chunks:
            prev = chunks[-1]
            if (
                prev.heading_path == hp
                and text[prev.end:start] == SEPARATOR
                and count(text[prev.start:end]) <= max_tokens
            ):
                merged_text = text[prev.start:end]
                chunks[-1] = HybridChunk(
                    prev.chunk_id, prev.start, end, merged_text, hp,
                    count(merged_text),
                )
                continue
        ctext = text[start:end]
        chunks.append(HybridChunk(
            len(chunks), start, end, ctext, hp, count(ctext)
        ))
    return chunks

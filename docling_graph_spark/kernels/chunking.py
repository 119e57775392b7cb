"""Greedy sentence-boundary chunking kernel.

Behavioural parity target: the reference's raw-text fallback chunker
(`/root/reference/docling_graph/core/extractors/document_chunker.py:261-301`):
split text into windows of at most ``max_tokens * 4`` characters, preferring
to break after the *last* occurrence (within the window) of one of the break
delimiters, tried in priority order.  Each emitted chunk is stripped; empty
chunks are skipped.  A text that already fits in one window is returned
verbatim (unstripped) — that asymmetry is part of the reference contract.

This module extends the reference contract with *span offsets* into the input
text (``start``/``end`` of the stripped chunk), which the Spark pipeline
persists per the lineage requirement.  The chunk *strings* are byte-identical
to the reference output.
"""

from __future__ import annotations

from typing import List, NamedTuple

# Break-point preference, highest priority first.  The first delimiter with
# any occurrence inside the current window wins; the break lands *after* its
# last occurrence.
BREAK_DELIMITERS: tuple[str, ...] = (". ", "! ", "? ", "\n\n", "\n")

CHARS_PER_TOKEN = 4  # reference heuristic: 1 token ~= 4 chars


class ChunkSpan(NamedTuple):
    chunk_id: int
    start: int  # offset of the stripped chunk in the input text
    end: int    # exclusive
    text: str   # stripped chunk text


def max_chars_for(max_tokens: int) -> int:
    return max_tokens * CHARS_PER_TOKEN


def chunk_text(text: str, max_tokens: int) -> List[str]:
    """Chunk raw text; returns exactly the reference's list of chunk strings."""
    return [c.text for c in chunk_spans(text, max_tokens)]


def chunk_spans(text: str, max_tokens: int) -> List[ChunkSpan]:
    """Chunk raw text, returning stripped chunks with their source offsets."""
    limit = max_chars_for(max_tokens)
    n = len(text)

    if n <= limit:
        # Reference short-circuit: single chunk, returned verbatim (no strip).
        return [ChunkSpan(0, 0, n, text)]

    out: List[ChunkSpan] = []
    pos = 0
    while pos < n:
        window_end = min(pos + limit, n)
        if window_end < n:
            for delim in BREAK_DELIMITERS:
                hit = text.rfind(delim, pos, window_end)
                if hit != -1:
                    window_end = hit + len(delim)
                    break
        raw = text[pos:window_end]
        stripped = raw.strip()
        if stripped:
            lead = len(raw) - len(raw.lstrip())
            start = pos + lead
            out.append(ChunkSpan(len(out), start, start + len(stripped), stripped))
        pos = window_end
    return out

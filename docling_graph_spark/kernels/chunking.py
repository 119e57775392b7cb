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


def schema_adjusted_max_tokens(original_max_tokens: int, schema_size: int) -> int:
    """F9: shrink the chunk token budget to reserve context for the schema.

    Parity with ``DocumentChunker.update_schema_config``
    (`/root/reference/docling_graph/core/extractors/document_chunker.py:115-172`):
    ``schema_tokens = int(schema_size / 3.5)``; the adjusted budget is
    ``original - schema_tokens`` floored at 50% of the original.  Driver-side
    scalar — computed once per template and broadcast into the chunk stage.
    """
    schema_tokens = int(schema_size / 3.5)
    min_tokens = int(original_max_tokens * 0.5)
    adjusted = original_max_tokens - schema_tokens
    if adjusted < min_tokens:
        return min_tokens
    if adjusted < original_max_tokens:
        return adjusted
    return original_max_tokens


def recommended_max_tokens(context_limit: int,
                           system_prompt_tokens: int = 500,
                           response_buffer_tokens: int = 500) -> int:
    """F9 companion: context-budget formula, parity with
    ``DocumentChunker.calculate_recommended_max_tokens``
    (`/root/reference/docling_graph/core/extractors/document_chunker.py:174-197`):
    ``max(512, int((context - system - response) * 0.8))``."""
    available = context_limit - system_prompt_tokens - response_buffer_tokens
    return max(512, int(available * 0.8))

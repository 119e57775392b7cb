"""Adaptive chunk-batching kernel (greedy pack + undersized merge).

Behavioural parity target: the reference batcher
(`/root/reference/docling_graph/core/extractors/chunk_batcher.py:210-363`):

* token estimate per chunk: ``int(len(text) / chars_per_token * 1.2)`` plus a
  fixed 50-token per-chunk overhead (`chunk_batcher.py:59-68, 172-208, 249-252`);
* phase 1 greedy packing: consecutive chunks accumulate until adding the next
  one would exceed the available-token budget (`:243-286`);
* phase 2: batches below ``merge_threshold * available`` absorb following
  batches while the combined estimate stays within budget (`:300-363`).

In the Spark pipeline this runs per document inside a grouped pandas UDF
(documents have few chunks, so the sequential pass is tiny); the kernel here
is the single source of truth plus the parity-test surface.

Also mirrored: ``combined_text`` formatting with ``[Chunk i/n]`` headers and
the ``---CHUNK BOUNDARY---`` separator (`chunk_batcher.py:43-48`).
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence

SAFETY_MARGIN = 1.2
CHUNK_OVERHEAD_TOKENS = 50
DEFAULT_CHARS_PER_TOKEN = 3.0  # reference "default" fallback ratio
DEFAULT_MERGE_THRESHOLD = 0.85
CHUNK_SEPARATOR = "\n\n---CHUNK BOUNDARY---\n\n"


class Batch(NamedTuple):
    batch_id: int
    chunk_indices: List[int]
    total_tokens: int


def estimate_tokens(text: str, chars_per_token: float = DEFAULT_CHARS_PER_TOKEN) -> int:
    """Heuristic token estimate with the reference's 20% safety margin."""
    return int(len(text) / chars_per_token * SAFETY_MARGIN)


def available_tokens(context_limit: int, system_prompt_tokens: int = 500,
                     response_buffer_tokens: int = 500) -> int:
    return context_limit - system_prompt_tokens - response_buffer_tokens


def batch_chunks(
    chunk_token_counts: Sequence[int],
    available: int,
    merge_threshold: float = DEFAULT_MERGE_THRESHOLD,
) -> List[Batch]:
    """Two-phase batching over per-chunk token estimates.

    ``chunk_token_counts`` must already include the per-chunk overhead
    (use :func:`estimate_tokens` + ``CHUNK_OVERHEAD_TOKENS``).
    """
    if not chunk_token_counts:
        return []
    packed = _greedy_pack(chunk_token_counts, available)
    return _merge_undersized(packed, available, merge_threshold)


def _greedy_pack(costs: Sequence[int], available: int) -> List[Batch]:
    batches: List[Batch] = []
    indices: List[int] = []
    running = 0
    for i, cost in enumerate(costs):
        if indices and running + cost > available:
            batches.append(Batch(len(batches), indices, running))
            indices, running = [i], cost
        else:
            indices.append(i)
            running += cost
    if indices:
        batches.append(Batch(len(batches), indices, running))
    return batches


def _merge_undersized(batches: List[Batch], available: int,
                      merge_threshold: float) -> List[Batch]:
    if len(batches) <= 1:
        return batches
    floor = int(available * merge_threshold)
    merged: List[Batch] = []
    i = 0
    while i < len(batches):
        cur = batches[i]
        if cur.total_tokens >= floor:
            merged.append(Batch(len(merged), list(cur.chunk_indices), cur.total_tokens))
            i += 1
            continue
        indices = list(cur.chunk_indices)
        total = cur.total_tokens
        j = i + 1
        while j < len(batches) and total + batches[j].total_tokens <= available:
            indices.extend(batches[j].chunk_indices)
            total += batches[j].total_tokens
            j += 1
        merged.append(Batch(len(merged), indices, total))
        i = j
    return merged


def combined_text(chunks: Sequence[str]) -> str:
    """Format a batch of chunks the way the reference feeds them downstream."""
    n = len(chunks)
    return CHUNK_SEPARATOR.join(
        f"[Chunk {i + 1}/{n}]\n{chunk}" for i, chunk in enumerate(chunks)
    )

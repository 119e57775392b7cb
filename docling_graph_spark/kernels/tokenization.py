"""Pluggable token counting for the chunking stages.

The reference chunker is tokenizer-bounded: it wraps a real HuggingFace (or
tiktoken) tokenizer and falls back between them
(`/root/reference/docling_graph/core/extractors/document_chunker.py:60-95`).
The rebuild mirrors that as a *counter factory*: chunk/batch budget checks
call an injected ``callable(str) -> int`` instead of hard-coding the
heuristic, so a deployment with ``transformers``/``tokenizers`` installed
gets real token-bounded chunks by passing a model name, while this container
(no tokenizer libraries) byte-stably uses the reference's length heuristic
(`chunk_batcher.py:59-68`: ``int(len/chars_per_token * 1.2)``).

Executor shape: tokenizers are heavyweight to load, so resolution is by
NAME (a picklable string travels into the Arrow UDF) and the constructed
counter is cached in a module-level registry — one load per executor
process, reused across every Arrow batch (SURVEY §7 "heavy UDF init"
hard-part).
"""

from __future__ import annotations

import warnings
from typing import Callable, Dict, Optional, Union

from .batching import DEFAULT_CHARS_PER_TOKEN, SAFETY_MARGIN

TokenCounter = Callable[[str], int]

# per-process (== per-executor) constructed-counter cache
_COUNTERS: Dict[str, TokenCounter] = {}


def heuristic_counter(
    chars_per_token: float = DEFAULT_CHARS_PER_TOKEN,
) -> TokenCounter:
    """The reference length heuristic as a counter (byte-stable default)."""

    def count(text: str) -> int:
        return int(len(text) / chars_per_token * SAFETY_MARGIN)

    return count


def _load_real_tokenizer(name: str) -> Optional[TokenCounter]:
    """Try the real tokenizer stacks, most capable first.  Returns None when
    neither library is importable (this container) — caller falls back."""
    try:  # transformers AutoTokenizer (the reference's primary path)
        from transformers import AutoTokenizer  # type: ignore

        tok = AutoTokenizer.from_pretrained(name)

        def hf_count(text: str) -> int:
            return len(tok.encode(text, add_special_tokens=False))

        return hf_count
    except Exception:
        pass
    try:  # bare `tokenizers` runtime (no transformers install)
        from tokenizers import Tokenizer  # type: ignore

        tok = Tokenizer.from_pretrained(name)

        def tk_count(text: str) -> int:
            return len(tok.encode(text).ids)

        return tk_count
    except Exception:
        return None


def get_token_counter(
    tokenizer: Union[None, str, tuple, TokenCounter] = None,
) -> TokenCounter:
    """Resolve a token counter.

    * ``None`` → the reference length heuristic (default; byte-stable).
    * a callable → used as-is (tests / custom counters).
    * ``("bpe", merges)`` → corpus-trained BPE counter (kernels/bpe.py):
      the merge list is plain picklable data, so this spec travels into
      Arrow UDF closures; the encoder is constructed once per executor.
    * ``("vocab", lines)`` → vendored-vocab WordPiece counter
      (kernels/wordpiece.py, the BERT algorithm with no ``transformers``
      dependency): ``lines`` is the vocab.txt content as a tuple of
      strings — picklable, cached per process.
    * a string → HuggingFace tokenizer of that name when ``transformers``
      or ``tokenizers`` is importable; otherwise a one-time warning and the
      heuristic fallback (mirrors the reference's tiktoken→HF fallback,
      `document_chunker.py:75-95`).
    """
    if tokenizer is None:
        return heuristic_counter()
    if (isinstance(tokenizer, (tuple, list)) and len(tokenizer) == 2
            and tokenizer[0] == "bpe"):
        from .bpe import encoder_for

        return encoder_for(tokenizer[1]).count
    if (isinstance(tokenizer, (tuple, list)) and len(tokenizer) == 2
            and tokenizer[0] == "vocab"):
        from .wordpiece import counter_for

        return counter_for(tuple(tokenizer[1]))
    if tokenizer == "vocab:mini":
        # yaml-friendly spelling of the vendored mini-vocab WordPiece
        # counter (the config wizard emits this)
        from .wordpiece import MINI_VOCAB, counter_for

        return counter_for(MINI_VOCAB)
    if callable(tokenizer):
        return tokenizer
    if tokenizer in _COUNTERS:
        return _COUNTERS[tokenizer]
    counter = _load_real_tokenizer(tokenizer)
    if counter is None:
        warnings.warn(
            f"tokenizer {tokenizer!r} requested but no tokenizer library is "
            "installed; falling back to the length heuristic",
            stacklevel=2,
        )
        counter = heuristic_counter()
    _COUNTERS[tokenizer] = counter
    return counter

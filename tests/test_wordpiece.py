"""Vendored-vocab WordPiece parity (kernels/wordpiece.py).

The reference chunker wraps a real HF BERT WordPiece tokenizer
(`document_chunker.py:58-95`); this container has none, so the kernel
reimplements the published BERT algorithm.  Parity is proven two ways:

1. against an INDEPENDENT naive reimplementation in this file, written
   directly from the BERT paper/reference code (separate authorship
   from the kernel, different structure: per-character recursion vs the
   kernel's two-pointer scan) over adversarial inputs;
2. import-gated: when ``transformers`` is available, against the real
   ``BertTokenizer`` constructed from the same frozen vocab file.

Plus the chunk-boundary contract: hybrid_chunk driven by the vocab
counter must bound every chunk by the WordPiece count and match a pure
Python replay of the HybridChunker merge semantics under that counter.
"""

from __future__ import annotations

import unicodedata

import pytest

from docling_graph_spark.kernels import wordpiece as wp
from docling_graph_spark.kernels.hybrid_chunker import (Block,
                                                        hybrid_chunk)

VOCAB = wp.load_vocab(wp.MINI_VOCAB)


# --- independent naive reference (BERT release semantics) ----------------


def _naive_basic(text, lower=True):
    cleaned = []
    for ch in text:
        if ord(ch) in (0, 0xFFFD):
            continue
        cat = unicodedata.category(ch)
        if cat in ("Cc", "Cf") and ch not in "\t\n\r":
            continue
        if ch in "\t\n\r" or ch.isspace():
            cleaned.append(" ")
        elif wp._is_cjk(ord(ch)):
            cleaned.extend([" ", ch, " "])
        else:
            cleaned.append(ch)
    words = "".join(cleaned).split()
    out = []
    for w in words:
        if lower:
            w = "".join(c for c in unicodedata.normalize("NFD", w.lower())
                        if unicodedata.category(c) != "Mn")
        buf = ""
        for ch in w:
            if wp._is_punctuation(ch):
                if buf:
                    out.append(buf)
                    buf = ""
                out.append(ch)
            else:
                buf += ch
        if buf:
            out.append(buf)
    return out


def _naive_wordpiece(word):
    if len(word) > 100:
        return ["[UNK]"]

    def rec(rest, first):
        if not rest:
            return []
        for end in range(len(rest), 0, -1):
            piece = rest[:end] if first else "##" + rest[:end]
            if piece in VOCAB:
                tail = rec(rest[end:], False)
                if tail is not None:
                    return [piece] + tail
                return None  # greedy: no backtracking past a match
        return None

    got = rec(word, True)
    return got if got is not None else ["[UNK]"]


ADVERSARIAL = [
    "",
    "the table",
    "query QUERY QuErY",
    "naïve café résumé",                       # accent stripping
    "hello,world!  spaced\tout\nlines",
    "a-b-c (parens) 'quotes' end.",
    "supercalifragilistic" * 8,                # 160 chars -> [UNK]
    "数据 表格 mixed 中文 words",                 # CJK isolation
    "x" * 100,                                  # exactly the UNK limit
    "x" * 101,
    "stream customer window order column merge",
    "123 0x1f agg42 9lives",
    "control​chars­ here",
]


@pytest.mark.parametrize("text", ADVERSARIAL)
def test_kernel_matches_independent_reference(text):
    naive = []
    for w in _naive_basic(text):
        naive.extend(_naive_wordpiece(w))
    assert wp.encode(text, VOCAB) == naive


@pytest.mark.parametrize("text", ADVERSARIAL)
def test_kernel_matches_real_hf_tokenizer_when_available(text, tmp_path):
    transformers = pytest.importorskip("transformers")
    vf = tmp_path / "vocab.txt"
    vf.write_text("\n".join(wp.MINI_VOCAB) + "\n", encoding="utf-8")
    tok = transformers.BertTokenizer(str(vf), do_lower_case=True)
    assert wp.encode(text, VOCAB) == tok.tokenize(text)


def test_piece_structure_of_lexicon():
    assert wp.encode("table", VOCAB) == ["table"]
    assert wp.encode("query", VOCAB) == ["quer", "##y"]
    assert wp.encode("queries", VOCAB) == ["quer", "##ies"]
    assert wp.encode("customer", VOCAB) == ["cust", "##omer"]
    # unknown-but-short word falls to letter pieces, never [UNK]
    assert wp.encode("zq", VOCAB) == ["z", "##q"]


def test_counts_are_whitespace_additive():
    """count(a + sep + b) == count(a) + count(b) for whitespace-joined
    merges — the property that makes the chunk-merge oracle's per-word
    sum exact."""
    c = wp.counter_for(wp.MINI_VOCAB)
    a, b = "stream customer window", "order column merge table"
    assert c(a + "\n\n" + b) == c(a) + c(b)


def test_hybrid_chunk_boundaries_under_vocab_counter():
    count = wp.counter_for(wp.MINI_VOCAB)
    paras = ["stream customer window order " * 3,
             "table value data row key " * 3,
             "query column merge filter group " * 3,
             "the a big fast slow " * 3]
    text = "\n\n".join(p.strip() for p in paras)
    blocks, pos = [], 0
    for p in (p.strip() for p in paras):
        blocks.append(Block(pos, pos + len(p), "p"))
        pos += len(p) + 2
    max_tokens = 40
    chunks = hybrid_chunk(text, blocks, max_tokens, merge_peers=True,
                          token_counter=count)
    # every chunk fits the WordPiece budget
    assert all(count(c.text) <= max_tokens for c in chunks)
    # replay the merge greedily with the same counter
    est = [count(text[b.start:b.end]) for b in blocks]
    replay, acc = 1, est[0]
    for e in est[1:]:
        if acc + e <= max_tokens:
            acc += e
        else:
            replay += 1
            acc = e
    assert len(chunks) == replay
    # and the merge is NOT degenerate: some merge happened, some didn't
    assert 1 < len(chunks) < len(blocks)


@pytest.mark.parametrize("text", ADVERSARIAL)
def test_counter_fast_path_equals_full_pipeline(text):
    """counter_for's plain-text fast path and per-word memoization must
    be invisible: count == len(encode) on every adversarial input AND
    on plain lowercase corpus text."""
    c = wp.counter_for(wp.MINI_VOCAB)
    assert c(text) == len(wp.encode(text, VOCAB))


def test_counter_fast_path_on_corpus_shape():
    c = wp.counter_for(wp.MINI_VOCAB)
    t = "stream customer window order the a table value dup"
    assert c(t) == len(wp.encode(t, VOCAB))
    assert c(t + "\n\n" + t) == 2 * c(t)

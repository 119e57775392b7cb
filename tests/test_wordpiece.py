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


# ---------------------------------------------------------------------------
# Round 5: FULL-SIZE vocab parity — 30k entries, no import gate.
#
# docling_graph_spark/data/wordpiece_vocab_30k.txt is trained at full
# size by the
# real WordPiece merge algorithm (kernels/wordpiece.train_wordpiece via
# tools/build_wordpiece_vocab.py — deterministic, regenerable).  These
# tests execute the tokenizer and counter against it, which the
# MINI_VOCAB suite cannot: deep longest-prefix chains over multi-
# character pieces, 17k+ continuations, realistic piece lengths.
# ---------------------------------------------------------------------------

FULL_LINES = wp.full_vocab_lines()
FULL_VOCAB = wp.load_vocab(FULL_LINES)


def _full_naive_wordpiece(word):
    if len(word) > 100:
        return ["[UNK]"]

    def rec(rest, first):
        if not rest:
            return []
        for end in range(len(rest), 0, -1):
            piece = rest[:end] if first else "##" + rest[:end]
            if piece in FULL_VOCAB:
                tail = rec(rest[end:], False)
                if tail is not None:
                    return [piece] + tail
                return None
        return None

    got = rec(word, True)
    return got if got is not None else ["[UNK]"]


def _pseudo_words(n, seed):
    import random as _r

    rng = _r.Random(seed)
    syll = ["str", "ea", "ming", "tho", "ut", "ation", "cro", "un",
            "te", "ling", "ba", "zz", "qu", "ix", "ment", "ness",
            "pre", "post", "ing", "ed", "ly", "er"]
    return [" ".join("".join(rng.choices(syll, k=rng.randint(1, 5)))
                     for _ in range(rng.randint(1, 8)))
            for _ in range(n)]


def test_full_vocab_structure():
    assert len(FULL_VOCAB) == 30_000
    assert FULL_LINES[:5] == ("[PAD]", "[UNK]", "[CLS]", "[SEP]",
                              "[MASK]")
    conts = sum(1 for t in FULL_LINES if t.startswith("##"))
    longs = sum(1 for t in FULL_LINES
                if len(t.lstrip("#")) >= 5 and not t.startswith("["))
    assert conts > 10_000 and longs > 10_000
    # every ASCII letter usable word-initially and as continuation
    for c in "abcdefghijklmnopqrstuvwxyz":
        assert c in FULL_VOCAB and "##" + c in FULL_VOCAB


@pytest.mark.parametrize("text", ADVERSARIAL)
def test_full_vocab_kernel_matches_independent_reference(text):
    naive = []
    for w in _naive_basic(text):
        naive.extend(_full_naive_wordpiece(w))
    assert wp.encode(text, FULL_VOCAB) == naive


def test_full_vocab_parity_on_generated_text():
    """500 pseudo-word lines built from the corpus syllabary (so most
    words hit real multi-character pieces, some fall to letters): the
    kernel's two-pointer scan must equal the naive recursive reference
    at full vocab size on every one."""
    for text in _pseudo_words(500, seed=7):
        naive = []
        for w in _naive_basic(text):
            naive.extend(_full_naive_wordpiece(w))
        assert wp.encode(text, FULL_VOCAB) == naive


def test_full_vocab_counter_fast_path():
    c = wp.counter_for(FULL_LINES)
    for text in _pseudo_words(100, seed=8) + list(ADVERSARIAL):
        assert c(text) == len(wp.encode(text, FULL_VOCAB))


def test_full_vocab_multi_char_pieces_actually_used():
    """The full vocab must tokenize syllabic words into FEWER pieces
    than characters (multi-char pieces engage) — the scale property
    MINI_VOCAB can't exhibit."""
    hits = 0
    for text in _pseudo_words(50, seed=9):
        for w in text.split():
            pieces = wp.wordpiece_word(w, FULL_VOCAB)
            if pieces != ["[UNK]"] and len(pieces) < len(w):
                hits += 1
    assert hits > 100


@pytest.mark.parametrize("text", ADVERSARIAL)
def test_full_vocab_matches_real_hf_tokenizer_when_available(text,
                                                             tmp_path):
    transformers = pytest.importorskip("transformers")
    vf = tmp_path / "vocab.txt"
    vf.write_text("\n".join(FULL_LINES) + "\n", encoding="utf-8")
    tok = transformers.BertTokenizer(str(vf), do_lower_case=True)
    assert wp.encode(text, FULL_VOCAB) == tok.tokenize(text)


def test_full_vocab_hybrid_chunk_boundaries():
    """The chunk-budget contract holds under the full-size counter."""
    count = wp.counter_for(FULL_LINES)
    paras = [p.strip() for p in _pseudo_words(6, seed=10)]
    text = "\n\n".join(paras)
    blocks, pos = [], 0
    for p in paras:
        blocks.append(Block(pos, pos + len(p), "p"))
        pos += len(p) + 2
    max_tokens = 30
    chunks = hybrid_chunk(text, blocks, max_tokens, merge_peers=True,
                          token_counter=count)
    assert all(count(c.text) <= max_tokens for c in chunks)


# ---------------------------------------------------------------------------
# Trainer unit tests (the algorithm that produced the fixture)
# ---------------------------------------------------------------------------


def test_trainer_matches_hand_computation():
    """corpus ab:10 abc:5 bc:3.  Initial symbols a:15 ##b:15 ##c:8 b:3;
    scores (a,##b)=15/225, (##b,##c)=5/120, (b,##c)=3/24 -> 'bc' first.
    Then (##b,##c)=5/75 TIES (a,##b)=15/225 at 1/15 -> lexicographic
    '##b'<'a' picks '##bc'.  Then (a,##b)=10/150 ties (a,##bc)=5/75 ->
    '##b'<'##bc' picks 'ab'.  Then 'abc'; no pair reaches min_count."""
    m = wp.train_wordpiece([("ab", 10), ("abc", 5), ("bc", 3)], 10)
    assert m == ["bc", "##bc", "ab", "abc"]


def test_trainer_deterministic_and_score_driven():
    corpus = [("hug", 10), ("pug", 5), ("pun", 12), ("bun", 4),
              ("hugs", 5)]
    a = wp.train_wordpiece(corpus, 8)
    b = wp.train_wordpiece(corpus, 8)
    assert a == b and len(a) == 8
    # every merged piece decomposes into corpus alphabet
    for z in a:
        assert z.lstrip("#")


def test_trainer_min_count_stops():
    assert wp.train_wordpiece([("abcd", 1)], 50) == []
    assert wp.train_wordpiece([("ab", 2)], 50) == ["ab"]


def test_trainer_stale_heap_score_rise_handled():
    """A merge that shrinks a denominator symbol RAISES other pairs'
    scores; the lazy heap must refresh those (not serve stale lows).
    Construct: after merging (x,##y), symbol ##y's count drops, so
    (q,##y) score rises above a previously-better pair — the trainer
    must pick it next."""
    corpus = [("xy", 20), ("qy", 4), ("rs", 6)]
    m = wp.train_wordpiece(corpus, 3)
    # initial: (x,##y)=20/(20*24), (q,##y)=4/(4*24)=1/24,
    # (r,##s)=6/36=1/6 -> rs, then (q,##y) vs (x,##y):
    # 1/24 > 20/480=1/24 tie -> lexicographic (q,##y)<(x,##y): qy.
    # After qy: (x,##y)=20/(20*20)=1/20 -> xy.
    assert m == ["rs", "qy", "xy"]

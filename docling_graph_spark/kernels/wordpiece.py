"""Vendored-vocab WordPiece tokenizer — no ``transformers`` dependency.

The reference chunker is token-bounded by a real HuggingFace tokenizer
(default ``sentence-transformers/all-MiniLM-L6-v2``, a BERT WordPiece
model — `/root/reference/docling_graph/core/extractors/
document_chunker.py:58-95`).  This container has no tokenizer libraries,
so this kernel implements the published BERT tokenization algorithm
(Devlin et al. 2019; the ``BasicTokenizer`` + ``WordpieceTokenizer``
pipeline of the original BERT release) against a plain vocab file:

* basic tokenization — NFD accent stripping, lowercasing (uncased
  models), CJK characters isolated as single tokens, punctuation split
  into standalone tokens, whitespace split;
* WordPiece — greedy longest-prefix match against the vocab, with
  ``##`` continuation pieces; a word with any unmatchable position (or
  longer than ``MAX_INPUT_CHARS_PER_WORD``) becomes one ``[UNK]``.

Both stages follow the reference implementations line-for-line in
behavior, so when ``transformers`` IS importable the import-gated parity
test (tests/test_wordpiece.py) can check equality against
``BertTokenizer`` over the same vocab file.

The vocab travels as a tuple of lines (picklable), so a counter built
from it serializes into Arrow UDF closures without executor file access;
construction is cached per process like the other counters in
kernels/tokenization.py.
"""

from __future__ import annotations

import unicodedata
from typing import Dict, Iterable, List, Sequence, Tuple

UNK = "[UNK]"
MAX_INPUT_CHARS_PER_WORD = 100


def load_vocab(lines: Iterable[str]) -> Dict[str, int]:
    """token -> id, one token per line (the HF vocab.txt layout)."""
    vocab: Dict[str, int] = {}
    for line in lines:
        tok = line.rstrip("\n")
        if tok and tok not in vocab:
            vocab[tok] = len(vocab)
    return vocab


def _is_punctuation(ch: str) -> bool:
    # the BERT definition: ASCII non-alphanumeric non-space characters
    # count as punctuation even when Unicode classes them otherwise
    cp = ord(ch)
    if (33 <= cp <= 47 or 58 <= cp <= 64 or 91 <= cp <= 96
            or 123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_cjk(cp: int) -> bool:
    return (0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF
            or 0x20000 <= cp <= 0x2A6DF or 0x2A700 <= cp <= 0x2B73F
            or 0x2B740 <= cp <= 0x2B81F or 0x2B820 <= cp <= 0x2CEAF
            or 0xF900 <= cp <= 0xFAFF or 0x2F800 <= cp <= 0x2FA1F)


def basic_tokenize(text: str, lowercase: bool = True) -> List[str]:
    """BERT BasicTokenizer: clean, isolate CJK, lowercase + strip
    accents, split punctuation, split whitespace."""
    out_chars: List[str] = []
    for ch in text:
        cp = ord(ch)
        if cp == 0 or cp == 0xFFFD or unicodedata.category(ch) in ("Cc",
                                                                   "Cf"):
            if ch in ("\t", "\n", "\r"):
                out_chars.append(" ")
            continue
        if _is_cjk(cp):
            out_chars.append(f" {ch} ")
        elif ch.isspace():
            out_chars.append(" ")
        else:
            out_chars.append(ch)
    tokens: List[str] = []
    for word in "".join(out_chars).split():
        if lowercase:
            word = word.lower()
            word = "".join(c for c in unicodedata.normalize("NFD", word)
                           if unicodedata.category(c) != "Mn")
        cur: List[str] = []
        for ch in word:
            if _is_punctuation(ch):
                if cur:
                    tokens.append("".join(cur))
                    cur = []
                tokens.append(ch)
            else:
                cur.append(ch)
        if cur:
            tokens.append("".join(cur))
    return tokens


def wordpiece_word(word: str, vocab: Dict[str, int]) -> List[str]:
    """Greedy longest-prefix WordPiece of one basic token."""
    if len(word) > MAX_INPUT_CHARS_PER_WORD:
        return [UNK]
    pieces: List[str] = []
    pos = 0
    while pos < len(word):
        end = len(word)
        cur = None
        while pos < end:
            sub = word[pos:end]
            if pos > 0:
                sub = "##" + sub
            if sub in vocab:
                cur = sub
                break
            end -= 1
        if cur is None:
            return [UNK]
        pieces.append(cur)
        pos = end
    return pieces


def encode(text: str, vocab: Dict[str, int],
           lowercase: bool = True) -> List[str]:
    """Full pipeline: basic tokenize then WordPiece each token."""
    out: List[str] = []
    for word in basic_tokenize(text, lowercase):
        out.extend(wordpiece_word(word, vocab))
    return out


# per-process constructed-counter cache keyed by the vocab tuple id
_CACHE: Dict[Tuple[str, ...], Dict[str, int]] = {}

# counting hot path: chunk-budget checks re-count overlapping slices of
# the same document many times (every merge probe re-counts the merged
# text), so the counter (a) takes a zero-normalization fast path for
# text that is already plain lowercase words — no per-character basic
# tokenizer — and (b) memoizes per-WORD piece counts (web corpora have
# heavy word repetition).  Both are exact: the fast-path precondition
# guarantees basic_tokenize(text) == text.split(), and WordPiece is a
# pure per-word function.
import re as _re

_PLAIN = _re.compile(r"[a-z0-9 \n]*\Z")


def counter_for(vocab_lines: Sequence[str], lowercase: bool = True):
    """A ``str -> int`` token counter over a vendored vocab — the
    drop-in for kernels/tokenization.get_token_counter's registry."""
    key = tuple(vocab_lines)
    vocab = _CACHE.get(key)
    if vocab is None:
        vocab = load_vocab(key)
        _CACHE[key] = vocab
    word_counts: Dict[str, int] = {}

    def word_count(w: str) -> int:
        c = word_counts.get(w)
        if c is None:
            c = len(wordpiece_word(w, vocab))
            word_counts[w] = c
        return c

    def count(text: str) -> int:
        if lowercase and _PLAIN.match(text):
            return sum(word_count(w) for w in text.split())
        return sum(word_count(w)
                   for w in basic_tokenize(text, lowercase))

    return count


# ---------------------------------------------------------------------------
# Frozen mini-vocab fixture.  Coverage: specials, every ASCII letter and
# digit as both word-initial and continuation pieces (so any short
# alphanumeric word tokenizes without [UNK]), common punctuation, and a
# deliberate mix of whole-word and multi-piece entries for the testdata
# lexicon so piece counts VARY per word (1-3 pieces) — the property the
# chunk-budget oracle exercises.
# ---------------------------------------------------------------------------

MINI_VOCAB: Tuple[str, ...] = tuple(
    ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    + list("abcdefghijklmnopqrstuvwxyz")
    + ["##" + c for c in "abcdefghijklmnopqrstuvwxyz"]
    + list("0123456789")
    + ["##" + c for c in "0123456789"]
    + [".", ",", "!", "?", "-", "'", '"', "(", ")", ":", ";", "/"]
    + [
        # whole words (1 piece)
        "the", "a", "table", "value", "data", "row", "key", "fast",
        "spark", "join", "sort", "scan", "big", "line", "part", "hash",
        # stem + continuation (2 pieces)
        "quer", "##y", "##ies", "wind", "##ow", "ord", "##er", "col",
        "##umn", "cust", "##omer", "str", "##eam", "batc", "##h",
        "merg", "##e", "fil", "##ter", "grou", "##p", "slo", "##w",
        "smal", "##l", "agg", "vect", "##or",
    ]
)


# ---------------------------------------------------------------------------
# WordPiece TRAINER — the published likelihood-scored merge algorithm
# (Schuster & Nakajima 2012 as popularized by BERT; the exact scoring
# and merge loop documented in the HuggingFace tokenizers course:
# score(pair) = freq(pair) / (freq(left) * freq(right)), merge the
# highest-scoring pair, the merged piece keeps the left element's
# position form).  The reference relies on a pretrained HF vocab
# (document_chunker.py:58-95); this container has no model files, so
# full-size vocabularies for parity testing are TRAINED deterministically
# with this function (see tools/build_wordpiece_vocab.py).
# ---------------------------------------------------------------------------


def train_wordpiece(word_freqs: Iterable[Tuple[str, int]],
                    n_merges: int, min_count: int = 2) -> List[str]:
    """Learn up to ``n_merges`` merged pieces from a (word, freq) table.

    Returns the NEW pieces in merge order (word-initial pieces plain,
    continuations ``##``-prefixed); the full vocab is the caller's
    specials + the corpus alphabet + these.  Incremental trainer: pair
    counts, symbol counts and a pair->word index are maintained across
    merges; the argmax runs over a lazy max-heap whose stale entries
    (symbol counts change on every merge, and a WordPiece score can
    RISE when a denominator symbol shrinks) are refreshed on pop via a
    recorded (pair_count, left_count, right_count) triple.  Tie-break:
    equal score -> lexicographically smallest pair.  Stops early when
    no pair reaches ``min_count``.
    """
    import heapq

    words: List[List[str]] = []
    freqs: List[int] = []
    for w, f in word_freqs:
        if w:
            words.append([w[0]] + ["##" + c for c in w[1:]])
            freqs.append(int(f))

    sym_counts: Dict[str, int] = {}
    pair_counts: Dict[Tuple[str, str], int] = {}
    pair_words: Dict[Tuple[str, str], set] = {}
    sym_pairs: Dict[str, set] = {}

    def add_word(wi: int, sign: int) -> None:
        syms = words[wi]
        f = freqs[wi] * sign
        for s in syms:
            sym_counts[s] = sym_counts.get(s, 0) + f
        for a, b in zip(syms, syms[1:]):
            p = (a, b)
            pair_counts[p] = pair_counts.get(p, 0) + f
            if sign > 0:
                pair_words.setdefault(p, set()).add(wi)
                sym_pairs.setdefault(a, set()).add(p)
                sym_pairs.setdefault(b, set()).add(p)

    for wi in range(len(words)):
        add_word(wi, +1)

    heap: List[tuple] = []

    def push(p: Tuple[str, str]) -> None:
        c = pair_counts.get(p, 0)
        if c < min_count:
            return
        cx = sym_counts.get(p[0], 0)
        cy = sym_counts.get(p[1], 0)
        if cx <= 0 or cy <= 0:
            return
        heapq.heappush(heap, (-c / (cx * cy), p, c, cx, cy))

    for p in list(pair_counts):
        push(p)

    merges: List[str] = []
    while len(merges) < n_merges and heap:
        _negscore, p, c, cx, cy = heapq.heappop(heap)
        if (c != pair_counts.get(p, 0)
                or cx != sym_counts.get(p[0], 0)
                or cy != sym_counts.get(p[1], 0)):
            push(p)                      # stale snapshot: refresh, retry
            continue
        x, y = p
        z = x + y[2:]
        merges.append(z)
        touched = set()
        for wi in sorted(pair_words.get(p, ())):
            syms = words[wi]
            add_word(wi, -1)
            out: List[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == p:
                    out.append(z)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = out
            add_word(wi, +1)
            for q in zip(out, out[1:]):
                touched.add(q)
        pair_words.pop(p, None)
        # x/y symbol counts changed: every surviving pair containing
        # either needs a refreshed heap entry (scores can rise)
        for s in (x, y):
            for q in sym_pairs.get(s, ()):
                touched.add(q)
        for q in touched:
            push(q)
    return merges


# ---------------------------------------------------------------------------
# Full-size vocab: ~30k entries trained by train_wordpiece over a
# deterministic corpus (tools/build_wordpiece_vocab.py regenerates it
# byte-identically) — the stand-in for the pretrained HF vocab the
# reference loads, at the same scale.  Shipped as package data so both
# the catalog queries and the parity tests read one copy.
# ---------------------------------------------------------------------------

_FULL_VOCAB_LINES: Tuple[str, ...] = ()


def full_vocab_lines() -> Tuple[str, ...]:
    """The 30k-entry trained vocab as a tuple of lines (the same
    picklable shape counter_for and the ('vocab', lines) tokenizer spec
    take)."""
    global _FULL_VOCAB_LINES
    if not _FULL_VOCAB_LINES:
        import os

        path = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                            "data", "wordpiece_vocab_30k.txt")
        with open(path, encoding="utf-8") as f:
            _FULL_VOCAB_LINES = tuple(f.read().splitlines())
    return _FULL_VOCAB_LINES

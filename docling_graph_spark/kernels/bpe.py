"""Byte-pair-encoding subword tokenizer, trained on the corpus itself.

Sennrich et al. 2016 ("Neural Machine Translation of Rare Words with
Subword Units") BPE over word types: training operates on the aggregated
(word, frequency) table, never the raw corpus — which is exactly why it
grafts onto Spark cleanly:

* the DISTRIBUTED step is one map-side-combinable ``groupBy(word).count()``
  over the corpus (operators/tokenstats.word_frequencies);
* TRAINING runs on the driver over that bounded table (distinct word
  types, further capped by min-frequency / top-K pruning) — the same
  single-node-over-aggregates shape SentencePiece and the HF tokenizers
  use in production;
* ENCODING broadcasts the ranked merge list back and applies it in an
  Arrow-batched UDF with a per-executor cached encoder.

Everything here is deterministic: ties in pair frequency break on the
lexicographically smallest pair, so the merge list is a pure function of
the word-frequency table (and therefore of the corpus), bit-identical
across partitionings and engines.

The reference wraps pre-trained HF/tiktoken tokenizers
(`/root/reference/docling_graph/core/extractors/document_chunker.py:60-95`)
— it never trains one; corpus-trained BPE is a rebuild addition for the
training-data-pipeline tier (token budgeting, shard packing, vocabulary
analysis over a fresh crawl).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Sequence, Tuple

Pair = Tuple[str, str]

# end-of-word sentinel (Sennrich 2016 §3.2): lets merges distinguish
# word-final from word-internal occurrences and makes decoding unambiguous
EOW = "</w>"


def pretokenize(text: str) -> List[str]:
    """Deterministic pre-tokenizer: lowercase alphabetic runs.

    Matches the trigram-LM normalization (textprep._trigram_norm) so the
    two corpus models see the same word stream; digits/punctuation are
    word boundaries, not tokens.
    """
    out: List[str] = []
    start = -1
    s = text.lower()
    for i, ch in enumerate(s):
        if "a" <= ch <= "z":
            if start < 0:
                start = i
        elif start >= 0:
            out.append(s[start:i])
            start = -1
    if start >= 0:
        out.append(s[start:])
    return out


def _word_symbols(word: str) -> Tuple[str, ...]:
    return tuple(word) + (EOW,)


def train_bpe(word_freqs: Iterable[Tuple[str, int]],
              n_merges: int) -> List[Pair]:
    """Learn up to ``n_merges`` merge rules from a (word, freq) table.

    Classic incremental trainer: pair counts and a pair→word index are
    maintained across merges, so each round touches only the words that
    contain the merged pair — O(affected words), not O(vocabulary).
    Tie-break: highest count, then lexicographically smallest pair.
    Stops early when no pair occurs twice.
    """
    words: List[List[str]] = []
    freqs: List[int] = []
    for w, f in word_freqs:
        if w:
            words.append(list(_word_symbols(w)))
            freqs.append(int(f))

    pair_counts: Dict[Pair, int] = {}
    pair_words: Dict[Pair, set] = {}

    def add_word_pairs(wi: int, sign: int) -> None:
        syms = words[wi]
        f = freqs[wi] * sign
        for a, b in zip(syms, syms[1:]):
            p = (a, b)
            pair_counts[p] = pair_counts.get(p, 0) + f
            if sign > 0:
                pair_words.setdefault(p, set()).add(wi)

    for wi in range(len(words)):
        add_word_pairs(wi, +1)

    merges: List[Pair] = []
    for _ in range(n_merges):
        best: Pair | None = None
        best_n = 1  # require count >= 2: a pair seen once is noise
        for p, n in pair_counts.items():
            if n > best_n or (n == best_n and best is not None and p < best):
                best, best_n = p, n
        if best is None:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for wi in sorted(pair_words.get(best, ())):
            syms = words[wi]
            if len(syms) < 2:
                continue
            add_word_pairs(wi, -1)
            out: List[str] = []
            i = 0
            while i < len(syms):
                if (i + 1 < len(syms)
                        and (syms[i], syms[i + 1]) == best):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = out
            add_word_pairs(wi, +1)
        # drop exhausted entries so the argmax scan stays tight
        pair_counts = {p: n for p, n in pair_counts.items() if n > 0}
        pair_words.pop(best, None)
    return merges


def encoder_for(merges: Sequence[Pair]) -> "BpeEncoder":
    """Per-process (== per-executor) encoder cache, keyed by a digest of
    the merge list: the list rides into Arrow UDF closures as plain data
    (a few KB), the constructed encoder with its word memo is built once
    per executor and reused across batches."""
    import hashlib

    key = hashlib.md5(repr([tuple(p) for p in merges]).encode()).hexdigest()
    enc = _ENCODER_CACHE.get(key)
    if enc is None:
        enc = BpeEncoder(merges)
        # keep a few live vocabularies (a job may alternate e.g. a chunk
        # counter and a stats counter) — clearing on every switch would
        # rebuild the encoder AND discard its word memo each alternation
        while len(_ENCODER_CACHE) >= 4:
            _ENCODER_CACHE.pop(next(iter(_ENCODER_CACHE)))
        _ENCODER_CACHE[key] = enc
    return enc


_ENCODER_CACHE: Dict[str, "BpeEncoder"] = {}


class BpeEncoder:
    """Greedy lowest-rank BPE encoding with learned merges.

    Standard encode loop (same as GPT-2's): repeatedly merge the pair
    with the lowest merge rank until no learned pair remains.  Per-word
    results are memoized — crawl text is Zipfian, so the cache hit rate
    is extreme.
    """

    def __init__(self, merges: Sequence[Pair]):
        self.ranks: Dict[Pair, int] = {
            tuple(p): i for i, p in enumerate(merges)
        }
        self._cache: Dict[str, Tuple[str, ...]] = {}

    def encode_word(self, word: str) -> Tuple[str, ...]:
        got = self._cache.get(word)
        if got is not None:
            return got
        syms = list(_word_symbols(word))
        ranks = self.ranks
        while len(syms) > 1:
            best_rank = None
            best_i = -1
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            syms[best_i: best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        out = tuple(syms)
        if len(self._cache) < 1_000_000:  # bound executor memory
            self._cache[word] = out
        return out

    def encode(self, text: str) -> List[str]:
        toks: List[str] = []
        for w in pretokenize(text):
            toks.extend(self.encode_word(w))
        return toks

    def count(self, text: str) -> int:
        n = 0
        for w in pretokenize(text):
            n += len(self.encode_word(w))
        return n

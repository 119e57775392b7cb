#!/usr/bin/env python
"""Generate the full-size WordPiece vocab fixture.

The reference chunker tokenizes with a pretrained ~30k-entry HF BERT
WordPiece vocab (document_chunker.py:58-95).  This container has no
model files, no dictionary and no network, so a "vendored pretrained
vocab" is impossible — instead the fixture is TRAINED at full size with
the real WordPiece algorithm (kernels/wordpiece.train_wordpiece, the
published likelihood-scored merge loop) over a deterministic synthetic
corpus, which exercises everything a pretrained vocab would in the
tokenizer: ~30k entries, long multi-character pieces, deep
longest-prefix chains, realistic piece-length distribution.

Corpus: seeded syllable-composed pseudo-English words (onset + nucleus
+ coda, 1-4 syllables) with Zipfian frequencies — the standard shape
of a web-text unigram table.  Layout of the emitted file mirrors HF
vocab.txt: specials, punctuation, digits, word-initial alphabet,
##-continuations, then trained pieces in merge order.

Deterministic: same seed -> byte-identical file.  Regenerate with
    python tools/build_wordpiece_vocab.py
which rewrites docling_graph_spark/data/wordpiece_vocab_30k.txt in place.
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from docling_graph_spark.kernels.wordpiece import train_wordpiece  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "docling_graph_spark", "data",
                   "wordpiece_vocab_30k.txt")
TARGET_SIZE = 30_000
SEED = 20260821

ONSETS = ["", "b", "c", "d", "f", "g", "h", "j", "k", "l", "m", "n",
          "p", "r", "s", "t", "v", "w", "z", "ch", "sh", "th", "br",
          "cr", "dr", "fr", "gr", "pr", "tr", "st", "sp", "sl", "pl",
          "cl", "bl", "fl", "gl", "sc", "sk", "sm", "sn", "sw", "tw",
          "qu", "str", "spr", "thr"]
NUCLEI = ["a", "e", "i", "o", "u", "ai", "ea", "ee", "ie", "oa", "oo",
          "ou", "ay", "oy", "au", "ei"]
CODAS = ["", "b", "d", "f", "g", "k", "l", "m", "n", "p", "r", "s",
         "t", "x", "z", "ch", "sh", "th", "ck", "ng", "nk", "nt", "nd",
         "st", "rd", "rt", "rn", "rm", "ss", "ll", "tion", "ment",
         "ness", "ing", "ed", "er", "est", "ly"]


def make_corpus(n_words: int, seed: int) -> list[tuple[str, int]]:
    rng = random.Random(seed)
    seen = set()
    words = []
    while len(words) < n_words:
        n_syll = rng.choices([1, 2, 3, 4], weights=[20, 45, 27, 8])[0]
        w = "".join(rng.choice(ONSETS) + rng.choice(NUCLEI)
                    + (rng.choice(CODAS) if s == n_syll - 1 or
                       rng.random() < 0.3 else "")
                    for s in range(n_syll))
        if 2 <= len(w) <= 24 and w not in seen:
            seen.add(w)
            words.append(w)
    # Zipfian frequency by rank (shuffled rank assignment so frequency
    # is independent of generation order)
    ranks = list(range(1, n_words + 1))
    rng.shuffle(ranks)
    return [(w, max(1, int(2_000_000 / ranks[i] ** 1.07)))
            for i, w in enumerate(words)]


def build() -> list[str]:
    corpus = make_corpus(16_000, SEED)
    letters = set("abcdefghijklmnopqrstuvwxyz")
    alphabet = sorted(letters | {w[0] for w, _ in corpus}) \
        + sorted({"##" + c for c in letters}
                 | {"##" + c for w, _ in corpus for c in w[1:]})
    specials = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    punct = list(".,!?-'\"():;/&%$#@*+=<>[]{}_|~^`\\")
    digits = [str(d) for d in range(10)] + [f"##{d}" for d in range(10)]
    base = specials + punct + digits + alphabet
    n_merges = TARGET_SIZE - len(base)
    pieces = train_wordpiece(corpus, n_merges, min_count=2)
    return base + pieces


def main() -> None:
    vocab = build()
    with open(OUT, "w", encoding="utf-8") as f:
        f.write("\n".join(vocab) + "\n")
    print(f"wrote {len(vocab)} entries to {os.path.normpath(OUT)}")


if __name__ == "__main__":
    main()

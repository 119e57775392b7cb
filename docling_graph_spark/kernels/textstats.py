"""Text-analysis kernels: language-ID, quality scoring, tokenisation,
document fingerprints, shingles, MinHash and SimHash.

These back the training-data-pipeline operators (dedup / quality filtering /
language routing) that complement the reference's extraction pipeline at
corpus scale.  Everything is deterministic and stdlib+numpy only; the Spark
operators in ``operators/dedup.py`` / ``operators/text_analysis.py`` either
express the same logic JVM-side (regex/xxhash64 column expressions) or call
these kernels from Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import hashlib
import re
import struct
from typing import Dict, List, Sequence, Tuple

import numpy as np

WORD_RE = re.compile(r"\S+")
# BPE-ish fallback tokeniser: words, numbers, or single non-space symbols
BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")

# Tiny deterministic stopword profiles for n-gram/stopword language ID.
STOPWORDS: Dict[str, Tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "with", "for", "was"),
    "fr": ("le", "la", "les", "de", "des", "et", "est", "une", "dans", "pour"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "für"),
    "es": ("el", "la", "los", "de", "que", "y", "es", "una", "por", "para"),
}


def tokenize_ws(text: str) -> List[str]:
    return WORD_RE.findall(text)


def token_count_ws(text: str) -> int:
    return len(WORD_RE.findall(text))


def token_count_bpe(text: str) -> int:
    return len(BPE_RE.findall(text))


def detect_language(text: str) -> str:
    """Stopword-vote language ID; 'und' (undetermined) when nothing matches.

    Deterministic tie-break: highest score, then alphabetical language code.
    """
    words = set(re.findall(r"[a-zà-ÿ]+", text.lower()))
    best_lang, best_score = "und", 0
    for lang in sorted(STOPWORDS):
        score = sum(1 for w in STOPWORDS[lang] if w in words)
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang


def quality_score(text: str) -> float:
    """Heuristic [0,1] document quality: length, alpha ratio, punctuation
    balance, mean word length sanity.  Pure arithmetic, SQL-expressible."""
    n = len(text)
    if n == 0:
        return 0.0
    words = WORD_RE.findall(text)
    n_words = len(words)
    if n_words == 0:
        return 0.0
    alpha = sum(ch.isalpha() for ch in text)
    punct = sum(ch in ".,;:!?" for ch in text)
    mean_wl = (sum(len(w) for w in words)) / n_words
    length_term = min(1.0, n_words / 100.0)
    alpha_term = alpha / n
    punct_term = 1.0 - min(1.0, 5.0 * punct / n)
    wl_term = 1.0 if 3.0 <= mean_wl <= 10.0 else 0.5
    return round(0.25 * (length_term + alpha_term + punct_term + wl_term), 6)


def rolling_fingerprint(text: str, window: int = 8, mod: int = (1 << 61) - 1,
                        base: int = 257) -> int:
    """Polynomial rolling-hash document fingerprint (Rabin-Karp style):
    XOR of the rolling hashes of all byte windows — order-insensitive at the
    window level, shift-robust, and cheap to vectorise."""
    data = text.encode("utf-8")
    if len(data) < window:
        h = 0
        for b in data:
            h = (h * base + b) % mod
        return h
    acc = 0
    h = 0
    power = pow(base, window - 1, mod)
    for i, b in enumerate(data):
        h = (h * base + b) % mod
        if i >= window:
            h = (h - data[i - window] * power * base) % mod
        if i >= window - 1:
            acc ^= h
    return acc


def shingles(text: str, k: int = 3) -> List[str]:
    """Word k-gram shingles (lower-cased), distinct, order of first occurrence."""
    words = [w.lower() for w in WORD_RE.findall(text)]
    if len(words) < k:
        return [" ".join(words)] if words else []
    seen = {}
    for i in range(len(words) - k + 1):
        s = " ".join(words[i:i + k])
        if s not in seen:
            seen[s] = None
    return list(seen)


def _hash64(data: str, seed: int) -> int:
    h = hashlib.blake2b(data.encode("utf-8"), digest_size=8,
                        salt=struct.pack("<q", seed)).digest()
    return struct.unpack("<Q", h)[0]


def minhash_signature(shingle_set: Sequence[str], num_hashes: int = 64) -> List[int]:
    """k independent min-hashes over the shingle set (empty set → all max)."""
    if not shingle_set:
        return [(1 << 64) - 1] * num_hashes
    return [min(_hash64(s, seed) for s in shingle_set) for seed in range(num_hashes)]


def simhash64(tokens: Sequence[str]) -> int:
    """64-bit SimHash over token hashes (unweighted votes)."""
    if not tokens:
        return 0
    hashes = np.fromiter((_hash64(t, 0) for t in tokens), dtype=np.uint64)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
    votes = bits.sum(axis=0) * 2 - len(hashes)
    out = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def jaccard(a: Sequence[str], b: Sequence[str]) -> float:
    sa, sb = set(a), set(b)
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)

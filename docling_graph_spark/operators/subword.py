"""Corpus-trained BPE subword tokenization over the documents table.

The split of labour (kernels/bpe.py docstring has the full rationale):

* :func:`word_frequencies` — the only pass over the full corpus, a
  JVM-side split/explode/groupBy (map-side combinable, no Python);
* :func:`train_bpe_merges` — collects the pruned word-frequency table
  (min-frequency gate + top-K cap keep it bounded at any corpus size;
  SentencePiece prunes identically) and trains on the driver;
* :func:`bpe_token_stats` — broadcasts the ranked merge list back inside
  an Arrow-batched UDF with a per-executor memoized encoder.

Token counts from a corpus-trained vocabulary are what the shard-packing
and chunk-budget stages actually want at 100 TB: the heuristic
``len/4*1.2`` counter drifts with the corpus, a trained BPE does not.
"""

from __future__ import annotations

from typing import Iterator, List, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels.bpe import Pair, encoder_for, train_bpe

DEFAULT_MERGES = 200
DEFAULT_MIN_FREQ = 2
DEFAULT_MAX_WORDS = 1_000_000


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — lowercase alphabetic runs, the same
    pre-tokenization kernels/bpe.pretokenize applies at encode time.
    One shuffle, partial-aggregated map-side; output is vocabulary-sized.
    """
    words = F.split(
        F.regexp_replace(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                         "[^a-z]+", " "),
        " ",
    )
    return (
        docs.select(F.explode(words).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def train_bpe_merges(docs: DataFrame, n_merges: int = DEFAULT_MERGES,
                     text_col: str = "text",
                     min_freq: int = DEFAULT_MIN_FREQ,
                     max_words: int = DEFAULT_MAX_WORDS) -> List[Pair]:
    """Train the merge list from the corpus.

    The driver only ever sees the pruned word-frequency table: words with
    ``freq >= min_freq``, top ``max_words`` by (freq desc, word) — a
    deterministic cap that bounds driver memory at any corpus scale
    (1M (word,freq) pairs ≈ tens of MB).  Hapax words can't contribute a
    pair that the trainer would accept anyway (count >= 2 required).
    """
    rows = (
        word_frequencies(docs, text_col)
        .filter(F.col("freq") >= min_freq)
        .orderBy(F.desc("freq"), "word")
        .limit(max_words)
        .collect()
    )
    return train_bpe(((r["word"], r["freq"]) for r in rows), n_merges)


# per-executor-process encoder construction lives in kernels.bpe
_encoder_for = encoder_for


def bpe_token_stats(docs: DataFrame, merges: Sequence[Pair],
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_words, n_tokens, n_chars): per-document token counts
    under the trained vocabulary.  The merge list rides into the Arrow UDF
    as a plain closure value (a few KB); the constructed encoder (with its
    Zipf-friendly per-word memo) is cached per executor process."""
    merges = [tuple(p) for p in merges]

    def count_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        enc = _encoder_for(merges)
        for pdf in batches:
            n_words, n_tokens, n_chars = [], [], []
            for text in pdf[text_col]:
                t = text if isinstance(text, str) else ""
                toks = enc.encode(t)
                n_words.append(sum(1 for s in toks if s.endswith("</w>"))
                               if toks else 0)
                n_tokens.append(len(toks))
                n_chars.append(len(t))
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "n_words": n_words,
                "n_tokens": n_tokens,
                "n_chars": n_chars,
            })

    return docs.select(id_col, text_col).mapInPandas(
        count_batches,
        f"{id_col} long, n_words long, n_tokens long, n_chars long",
    )


def bpe_corpus_report(docs: DataFrame, merges: Sequence[Pair],
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """1-row corpus report: total docs/words/tokens/chars, tokens-per-word
    (milli), chars-per-token (milli) — the compression the vocabulary
    achieves on its own corpus (integer-scaled for cross-engine gates)."""
    stats = bpe_token_stats(docs, merges, text_col, id_col)
    agg = stats.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_words").alias("total_words"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
    )
    # integer div (not float-divide-then-cast): exact, engine-portable
    return agg.select(
        "n_docs", "total_words", "total_tokens", "total_chars",
        F.expr("(1000 * total_tokens) div total_words")
        .alias("tokens_per_kword"),
        F.expr("(1000 * total_chars) div total_tokens")
        .alias("chars_per_ktoken"),
    )

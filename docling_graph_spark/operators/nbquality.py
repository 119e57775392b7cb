"""Model-based quality scoring: a Naive-Bayes classifier trained on the
corpus's own weak labels.

Production LLM pipelines gate crawl text with a trained quality
classifier (fastText in CCNet/LLaMA-style pipelines) bootstrapped from
cheap labels.  This is the deterministic analogue: the Gopher rule gates
(operators/textprep.gopher_pass) provide the weak label, a multinomial
Naive-Bayes likelihood-ratio model is trained over word counts, and every
document gets an integer score whose sign is the prediction.  All
arithmetic is integer-scaled (Laplace-smoothed scaled likelihoods,
integer division) so the trained weights and the scores are bit-identical
across partitionings and engines — same discipline as the trigram LM.

Distribution shape (the canonical NB shape — nothing here is corpus-wide
beyond two token passes):

* TRAIN: one ``groupBy(word)`` over token occurrences (map-side
  combinable) → a vocabulary-sized count table; class totals are one
  1-row aggregate (a gated driver collect).
* SCORE: broadcast the vocabulary-sized weight table back, join token
  occurrences, one per-doc sum.

The reference has no classifier stage (its quality control is the LLM
itself); this is a rebuild addition for the corpus-curation tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textprep import gopher_pass

NB_SCALE = 1_000_000


def _doc_words(docs: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, y, ws): weak label + word array, computed once.

    Tokenization matches the Gopher signals (split on single spaces,
    empties dropped, NULL text → no words) so the oracle can replay it
    with ``string_split``."""
    words = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
        lambda x: F.length(x) > 0,
    )
    return docs.select(
        "doc_id",
        gopher_pass(F.col(text_col)).alias("y"),
        words.alias("ws"),
    )


def nb_quality_scores(docs: DataFrame,
                      text_col: str = "text") -> DataFrame:
    """(doc_id, y, score): per-document integer NB likelihood-ratio score.

    weight(word) = (S·(c_pass+1)) div (T_pass+V)
                 − (S·(c_fail+1)) div (T_fail+V)
    with S = NB_SCALE, c_* the word's occurrence counts in pass/fail
    docs, T_* the class occurrence totals and V the vocabulary size
    (Laplace smoothing).  score(doc) = Σ over word OCCURRENCES of
    weight(word); score > 0 predicts pass.  Uniform class priors — the
    sign is a pure likelihood ratio.
    """
    return _scores_and_vocab(docs, text_col)[0]


def _scores_and_vocab(docs: DataFrame, text_col: str):
    base = _doc_words(docs, text_col).localCheckpoint()
    tok = base.select("doc_id", "y", F.explode("ws").alias("word"))
    cnt = tok.groupBy("word").agg(
        F.sum(F.col("y").cast("long")).alias("c_pass"),
        F.sum((~F.col("y")).cast("long")).alias("c_fail"),
    )
    tot = cnt.agg(
        F.sum("c_pass").alias("tp"), F.sum("c_fail").alias("tf"),
        F.count("*").alias("v"),
    ).collect()[0]
    tp, tf, v = int(tot["tp"] or 0), int(tot["tf"] or 0), int(tot["v"])
    wgt = cnt.select(
        "word",
        F.expr(f"({NB_SCALE} * (c_pass + 1)) div {tp + v} "
               f"- ({NB_SCALE} * (c_fail + 1)) div {tf + v}").alias("wt"),
    )
    sc = (
        tok.join(F.broadcast(wgt), "word")
        .groupBy("doc_id").agg(F.sum("wt").alias("score"))
    )
    scored = (
        base.select("doc_id", "y")
        .join(sc, "doc_id", "left")
        .select("doc_id", "y",
                F.coalesce("score", F.lit(0)).alias("score"))
    )
    return scored, v


def nb_quality_report(docs: DataFrame,
                      text_col: str = "text") -> DataFrame:
    """1-row training report: corpus size, label/prediction split,
    label-prediction agreement, vocabulary size, total score mass."""
    scored, vocab = _scores_and_vocab(docs, text_col)
    pred = F.col("score") > 0
    return scored.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("y").cast("long")).alias("n_label_pass"),
        F.sum(pred.cast("long")).alias("n_pred_pass"),
        F.sum((pred == F.col("y")).cast("long")).alias("n_agree"),
        F.lit(vocab).alias("vocab"),
        F.sum("score").alias("sum_score"),
    )

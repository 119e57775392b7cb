"""DSIR-style data selection via importance resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling") — the
deterministic integer analogue.

DSIR picks raw web documents that *look like* a target domain: fit
bag-of-hashed-ngram unigram models over the target and the raw corpus,
weight every raw document by its likelihood ratio, and resample
proportionally to the weights.  This rebuild keeps each published design
choice in an engine-exact form:

* **Hashed bigram features** — word bigrams hashed into a fixed
  ``DSIR_BUCKETS``-slot space (md5-derived, so DuckDB replays the exact
  bucket ids).  Model size is bounded by the bucket count regardless of
  vocabulary: the weight table is always broadcastable.
* **Importance score** — the paper's log-likelihood ratio is replaced by
  the same integer-scaled Laplace-smoothed probability *difference* used
  by operators/nbquality.py (logs are not bit-reproducible across
  engines):  ``w(f) = S·(t_f+1) div (T+B) − S·(r_f+1) div (R+B)`` with
  ``t/r`` the feature's target/raw occurrence counts, ``T/R`` the class
  totals and ``B`` the bucket count.  ``score(doc) = Σ_occurrences
  w(bucket)`` — positive means "target-like".
* **Resampling** — the paper's Gumbel top-k is replaced by the
  deterministic exactly-k PPS systematic sampler
  (operators/sharding.pps_mark) over the min-shifted scores, so
  selection probability is proportional to target-likeness and the whole
  pipeline stays integer-exact.

Distribution shape: TRAIN is one ``groupBy(bucket)`` over bigram
occurrences (map-side combinable, ≤ DSIR_BUCKETS result rows); SCORE is a
broadcast join of the weight table + one per-doc sum; RESAMPLE is the
shared distributed prefix-sum (one narrow shuffle, O(#partitions) driver
offsets).  The reference (SylvainWT/docling-graph) has no corpus-selection
notion; this is a rebuild addition for the training-data tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DSIR_BUCKETS = 4096
DSIR_SCALE = 1_000_000


def _words(text_col: str):
    return F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
        lambda x: F.length(x) > 0,
    )


def hashed_bigram_occurrences(docs: DataFrame, text_col: str = "text",
                              *keep_cols: str) -> DataFrame:
    """(doc_id, *keep_cols, bucket): one row per word-bigram occurrence,
    bucketed into the hashed feature space (48-bit md5 prefix mod B)."""
    ws = _words(text_col)
    n = F.size(ws)
    bigrams = F.when(n >= 2, F.zip_with(
        F.slice(ws, 1, n - 1), F.slice(ws, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )).otherwise(F.array().cast("array<string>"))
    return (
        docs.select("doc_id", *keep_cols, bigrams.alias("_bgs"))
        .select("doc_id", *keep_cols, F.explode("_bgs").alias("_bg"))
        .select(
            "doc_id", *keep_cols,
            (F.conv(F.substring(F.md5(F.col("_bg").cast("binary")), 1, 12),
                    16, 10).cast("long") % DSIR_BUCKETS)
            .cast("int").alias("bucket"),
        )
    )


def importance_weights(occ: DataFrame, is_target) -> DataFrame:
    """Per-bucket integer importance weight from occurrence counts.

    ``occ`` must carry ``bucket`` and the columns ``is_target`` (a Column
    predicate) reads.  Returns (bucket, weight) for every occurring
    bucket — ≤ DSIR_BUCKETS rows, broadcastable."""
    cnt = occ.groupBy("bucket").agg(
        F.sum(is_target.cast("long")).alias("t"),
        F.count("*").alias("r"),
    )
    tot = cnt.agg(F.sum("t").alias("tt"), F.sum("r").alias("rr")).collect()[0]
    tt, rr = int(tot["tt"] or 0), int(tot["rr"] or 0)
    s, b = DSIR_SCALE, DSIR_BUCKETS
    return cnt.select(
        "bucket",
        (F.expr(f"({s} * (t + 1)) div {tt + b}")
         - F.expr(f"({s} * (r + 1)) div {rr + b}")).alias("weight"),
    )


def importance_scores(docs: DataFrame, text_col: str = "text",
                      target_col: str = "lang",
                      target_value: str = "en") -> DataFrame:
    """(doc_id, <target_col>, score): per-document integer importance
    score — Σ over bigram occurrences of the bucket weight; docs with no
    bigrams score 0."""
    occ = hashed_bigram_occurrences(
        docs, text_col, target_col).localCheckpoint(eager=False)
    w = importance_weights(occ, F.col(target_col) == target_value)
    per_doc = (
        occ.join(F.broadcast(w), "bucket")
        .groupBy("doc_id")
        .agg(F.sum("weight").alias("score"))
    )
    return (
        docs.select("doc_id", target_col)
        .join(per_doc, "doc_id", "left")
        .select("doc_id", target_col,
                F.coalesce("score", F.lit(0)).cast("long").alias("score"))
    )


def dsir_resample(scores: DataFrame, k: int) -> DataFrame:
    """Exactly-k deterministic importance resampling: PPS systematic
    sampling over min-shifted scores (shift makes every weight ≥ 1, so
    zero-mass docs remain selectable at the floor rate, and the grid
    walk stays integer-exact).  Returns scores + (shifted, n_grid) with
    n_grid ≥ 1 marking selected docs and sum(n_grid) == k."""
    from . import sharding

    mn = scores.agg(F.min("score")).collect()[0][0] or 0
    shifted = scores.withColumn(
        "shifted", (F.col("score") - F.lit(int(mn)) + F.lit(1)).cast("long"))
    pre, total = sharding.global_prefix_starts(
        shifted, order_col="doc_id", tokens_col="shifted")
    marked = sharding.pps_mark(pre, total, k, tokens_col="shifted")
    return shifted.drop("shifted").join(
        marked.select("doc_id", "shifted", "n_grid"), "doc_id")


def dsir_report(docs: DataFrame, text_col: str = "text",
                target_col: str = "lang", target_value: str = "en",
                k: int = 100) -> DataFrame:
    """1-row DSIR summary: corpus/target sizes, score stats, and the
    resampling tilt (selected docs + selected-target count vs the
    corpus share — the evidence the resampler prefers target-like
    docs), all integer-exact for the cross-engine gate."""
    scored = dsir_resample(
        importance_scores(docs, text_col, target_col, target_value), k)
    is_t = (F.col(target_col) == target_value).cast("long")
    sel = F.col("n_grid") > 0
    return scored.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(is_t).cast("long").alias("n_target"),
        F.sum("score").cast("long").alias("sum_score"),
        F.min("score").cast("long").alias("min_score"),
        F.max("score").cast("long").alias("max_score"),
        F.sum(sel.cast("long")).cast("long").alias("sel_docs"),
        F.sum("n_grid").cast("long").alias("k_total"),
        F.sum(F.when(sel, is_t).otherwise(F.lit(0)))
        .cast("long").alias("sel_target"),
        F.coalesce(F.sum(F.when(sel, F.conv(
            F.substring(F.md5(F.concat(
                F.col("doc_id").cast("string"), F.lit(":"),
                F.col("score").cast("string")).cast("binary")), 1, 12),
            16, 10).cast("long"))), F.lit(0))
        .cast("long").alias("sel_checksum"),
    )

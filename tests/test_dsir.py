"""DSIR importance resampling (operators/dsir.py): python-replay parity of
the integer score math, resampling tilt toward the target, exactly-k
selection, and partition invariance."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from docling_graph_spark.operators import dsir

B, S = dsir.DSIR_BUCKETS, dsir.DSIR_SCALE


def _bucket(bg: str) -> int:
    return int(hashlib.md5(bg.encode()).hexdigest()[:12], 16) % B


def _replay_scores(rows):
    """Sequential replay: rows = [(doc_id, lang, text)]."""
    occ = []
    for doc_id, lang, text in rows:
        ws = [w for w in (text or "").split(" ") if w]
        for a, b in zip(ws, ws[1:]):
            occ.append((doc_id, lang, _bucket(f"{a} {b}")))
    cnt = {}
    for _, lang, bk in occ:
        t, r = cnt.get(bk, (0, 0))
        cnt[bk] = (t + (lang == "en"), r + 1)
    tt = sum(t for t, _ in cnt.values())
    rr = sum(r for _, r in cnt.values())
    wt = {bk: (S * (t + 1)) // (tt + B) - (S * (r + 1)) // (rr + B)
          for bk, (t, r) in cnt.items()}
    scores = {doc_id: 0 for doc_id, _, _ in rows}
    for doc_id, _, bk in occ:
        scores[doc_id] += wt[bk]
    return scores


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i in range(120):
        if i % 3 == 0:
            lang, text = "en", f"the quick brown fox jumps over dog {i}"
        elif i % 3 == 1:
            lang, text = "de", f"der schnelle braune fuchs springt {i}"
        else:
            # de docs that LOOK like the en target (same bigram count as
            # the plain-de docs: scores are per-occurrence sums, so the
            # comparison must hold length fixed)
            lang, text = "de", f"the quick brown fox here {i}"
    # a no-bigram and a null-text doc
        rows.append((i, lang, text))
    rows += [(120, "en", "single"), (121, "de", None)]
    return rows, spark.createDataFrame(
        rows, "doc_id long, lang string, text string")


def test_scores_match_sequential_replay(spark, corpus):
    rows, df = corpus
    got = {r["doc_id"]: r["score"]
           for r in dsir.importance_scores(df).collect()}
    assert got == _replay_scores(rows)


def test_scores_partitioning_invariant(spark, corpus):
    _, df = corpus
    a = {r["doc_id"]: r["score"]
         for r in dsir.importance_scores(df.repartition(13)).collect()}
    b = {r["doc_id"]: r["score"]
         for r in dsir.importance_scores(df.coalesce(1)).collect()}
    assert a == b


def test_resample_exactly_k_and_tilts_toward_target(spark, corpus):
    rows, df = corpus
    rep = dsir.dsir_report(df, k=40).collect()[0]
    assert rep["k_total"] == 40
    assert rep["sel_docs"] <= 40
    base_rate = rep["n_target"] / rep["n_docs"]
    sel_rate = rep["sel_target"] / rep["sel_docs"]
    assert sel_rate > base_rate  # importance resampling prefers en-like


def test_target_lookalikes_score_above_plain_offtarget(spark, corpus):
    """de docs sharing the en target's bigrams outscore plain de docs —
    the whole point of DSIR (select target-LIKE docs, not target docs)."""
    rows, df = corpus
    scores = {r["doc_id"]: r["score"]
              for r in dsir.importance_scores(df).collect()}
    lookalike = [scores[i] for i in range(120) if i % 3 == 2]
    plain = [scores[i] for i in range(120) if i % 3 == 1]
    assert min(lookalike) > max(plain)

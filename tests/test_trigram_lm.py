"""Char-trigram LM fluency (operators/textprep): model sanity, integer
determinism, and the discriminative property the gate exists for —
corpus-typical text outscores gibberish."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docling_graph_spark.operators import textprep


@pytest.fixture(scope="module")
def corpus(spark):
    fluent = [
        (i, "the quick brown fox jumps over the lazy dog near the river "
            "bank while the sun sets over the quiet town")
        for i in range(20)
    ]
    gibberish = [(100 + i, "xq zv qx vz jq qj xx zz vq qv jx xj") for i in range(2)]
    short = [(200, "ab"), (201, None)]
    return spark.createDataFrame(fluent + gibberish + short,
                                 "doc_id long, text string")


def test_model_is_tiny_and_normalized(spark, corpus):
    model = textprep.trigram_model(corpus).collect()
    assert 0 < len(model) <= 27 ** 3
    assert all(0 <= r["p_scaled"] <= textprep.TRIGRAM_SCALE for r in model)
    # conditional probabilities per context sum to ~scale (integer floors)
    by_ctx = {}
    for r in model:
        by_ctx.setdefault(r["gram"][:2], []).append(r["p_scaled"])
    for ctx, ps in by_ctx.items():
        assert sum(ps) <= textprep.TRIGRAM_SCALE, ctx


def test_fluent_beats_gibberish(spark, corpus):
    scores = {r["doc_id"]: r["score"]
              for r in textprep.trigram_fluency_scores(corpus).collect()}
    fluent_min = min(scores[i] for i in range(20))
    gib_max = max(scores[i] for i in (100, 101))
    assert fluent_min > gib_max
    assert 200 in scores      # ' ab ' still has 2 trigram positions
    assert 201 not in scores  # NULL text normalizes to '  ': no trigram


def test_report_routes_unscored(spark, corpus):
    row = textprep.trigram_fluency_report(corpus).collect()[0]
    assert row["n_docs"] == 24
    assert row["n_unscored"] >= 1  # the NULL-text doc at minimum
    assert row["min_score"] is not None
    assert row["max_score"] <= textprep.TRIGRAM_SCALE


def test_deterministic_across_partitioning(spark, corpus):
    a = sorted(map(tuple, textprep.trigram_fluency_scores(corpus).collect()))
    b = sorted(map(tuple, textprep.trigram_fluency_scores(
        corpus.repartition(7)).collect()))
    assert a == b


def test_per_lang_models_route_correctly(spark):
    """Under per-lang models, a minority language's fluent docs score as
    well against their own model as the majority language does against
    its — a global model would score them as gibberish."""
    en = "the quick brown fox jumps over the lazy dog and runs away home"
    xx = "zqx vwk pzj qvw xzk jqp wvz kxq pjz qwv zkx jpq"  # own statistics
    rows = ([(i, en + f" extra{i}", "en") for i in range(30)]
            + [(100 + i, xx + f" zz{i}", "xx") for i in range(10)])
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    per = {r["doc_id"]: r["score"]
           for r in textprep.trigram_fluency_scores_per_lang(docs).collect()}
    glob = {r["doc_id"]: r["score"]
            for r in textprep.trigram_fluency_scores(docs).collect()}
    xx_per = min(per[100 + i] for i in range(10))
    xx_glob = max(glob[100 + i] for i in range(10))
    # routing lifts the minority language's scores
    assert xx_per > xx_glob
    thr = textprep.TRIGRAM_SCALE // 20
    assert xx_per >= thr         # passes the gate under its own model

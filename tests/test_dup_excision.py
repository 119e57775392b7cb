"""ExactSubstr span removal (operators/dedup.excise_dup_spans).

Semantics under test: a word-n-gram occurring in >= 2 distinct documents is
duplicated; its FIRST corpus-wide occurrence (min doc, then min pos in that
doc) survives; every word covered by any other occurrence is excised; the
rebuild is over the normalized token stream.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from docling_graph_spark.operators.dedup import excise_dup_spans

N = 4  # small gram width keeps fixtures readable


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = excise_dup_spans(df, n=N)
    return {r.doc_id: r.asDict() for r in out.collect()}


def test_first_occurrence_kept_later_excised(spark):
    dup = "alpha beta gamma delta"
    res = _run(spark, [
        (1, f"{dup} unique tail one"),
        (2, f"front words here {dup}"),
    ])
    # doc 1 holds the canonical occurrence: untouched
    assert res[1]["n_removed"] == 0
    assert res[1]["rebuilt"] == "alpha beta gamma delta unique tail one"
    # doc 2 loses exactly the 4 covered words
    assert res[2]["n_removed"] == N
    assert res[2]["rebuilt"] == "front words here"


def test_overlapping_occurrences_merge(spark):
    # doc 2 repeats the shared run twice, overlapping at "gamma delta":
    # every covered index is excised once (set semantics, no double count)
    res = _run(spark, [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta trailer"),
    ])
    # all 6 shared words in doc 2 are covered by some non-first occurrence
    assert res[2]["n_removed"] == 6
    assert res[2]["rebuilt"] == "trailer"
    assert res[1]["n_removed"] == 0


def test_within_doc_repeat_alone_not_duplicated(spark):
    # a gram repeated only inside one doc is NOT cross-doc duplicated
    res = _run(spark, [
        (1, "one two three four one two three four"),
        (2, "totally different words entirely here"),
    ])
    assert res[1]["n_removed"] == 0
    assert res[2]["n_removed"] == 0


def test_within_doc_repeat_of_duplicated_gram_excised(spark):
    # the gram IS cross-doc duplicated; the canonical copy is doc 1 pos 1,
    # so doc 1's own second occurrence is excised too
    run = "one two three four"
    res = _run(spark, [
        (1, f"{run} {run}"),
        (2, f"{run} something else here"),
    ])
    assert res[1]["n_removed"] == N
    assert res[1]["rebuilt"] == run
    assert res[2]["n_removed"] == N
    assert res[2]["rebuilt"] == "something else here"


def test_short_null_and_empty_docs_pass_through(spark):
    res = _run(spark, [
        (1, "too short"),
        (2, None),
        (3, ""),
        (4, "Punctuation, CASE &&& normalization!"),
    ])
    assert res[1] == {"doc_id": 1, "n_words": 2, "n_removed": 0,
                      "rebuilt": "too short"}
    assert res[2]["n_words"] == 0 and res[2]["rebuilt"] == ""
    assert res[3]["n_words"] == 0 and res[3]["rebuilt"] == ""
    assert res[4]["rebuilt"] == "punctuation case normalization"


def test_no_cartesian_in_plan(spark):
    df = spark.createDataFrame(
        [(i, f"shared run of words {i}") for i in range(50)],
        "doc_id bigint, text string")
    plan = excise_dup_spans(df, n=N)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

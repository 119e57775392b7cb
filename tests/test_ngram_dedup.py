"""Word-n-gram family: benchmark decontamination and exact
duplicated-substring detection (operators/dedup.py word_ngrams /
decontaminate / duplicated_spans).

Semantics mirrored from the training-data-pipeline conventions the graft
adds on top of the reference (SURVEY.md §2 data-pipeline ops): the
GPT-3/PaLM n-gram-collision decontamination rule and Lee et al. 2021's
cross-document exact-substring duplication, at n-gram granularity."""

from pyspark.sql import functions as F

from docling_graph_spark.operators import dedup as op_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_word_ngrams_positions_and_tokenization(spark):
    df = _docs(spark, [(1, "The quick, Brown FOX-jumps over 9 lazy dogs")])
    got = {(r.pos, r.gram)
           for r in op_dedup.word_ngrams(df, n=3).collect()}
    # tokens: the quick brown fox jumps over 9 lazy dogs  (9 tokens)
    assert (1, "the quick brown") in got
    assert (7, "9 lazy dogs") in got
    assert len(got) == 7


def test_word_ngrams_short_doc_yields_no_rows(spark):
    df = _docs(spark, [(1, "only four tokens here"), (2, "")])
    assert op_dedup.word_ngrams(df, n=5).count() == 0
    # exactly n tokens -> exactly one gram
    assert op_dedup.word_ngrams(df, n=4).count() == 1


def test_decontaminate_flags_and_counts(spark):
    train = _docs(spark, [
        (1, "alpha beta gamma delta epsilon"),   # 1 eval 4-gram
        (2, "zeta eta theta omega kappa"),       # clean
        (3, "alpha beta gamma delta zeta eta theta iota"),  # 2 eval grams
    ])
    evald = _docs(spark, [
        (100, "alpha beta gamma delta"),
        (101, "zeta eta theta iota"),
    ])
    rows = {r.doc_id: r for r in
            op_dedup.decontaminate(train, evald, n=4).collect()}
    assert rows[1].contaminated and rows[1].overlap_grams == 1
    assert not rows[2].contaminated and rows[2].overlap_grams == 0
    assert rows[3].contaminated and rows[3].overlap_grams == 2


def test_decontaminate_min_overlap_threshold(spark):
    train = _docs(spark, [(1, "a b c d e f")])
    evald = _docs(spark, [(9, "a b c d")])
    r = op_dedup.decontaminate(train, evald, n=4, min_overlap=2).collect()[0]
    assert r.overlap_grams == 1 and not r.contaminated


def test_decontaminate_broadcasts_eval_side(spark):
    train = _docs(spark, [(1, "a b c d e")])
    evald = _docs(spark, [(9, "a b c d")])
    plan = (op_dedup.decontaminate(train, evald, n=4)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan, (
        "eval-gram probe must broadcast: the training side is the 100 TB "
        "relation and must not shuffle for the join\n" + plan)


def test_duplicated_spans_cross_doc_only(spark):
    df = _docs(spark, [
        (1, "x y z w repeated tail one"),
        (2, "x y z w different tail two"),
        (3, "p p p p p p p p"),  # within-doc repeats only
    ])
    per_gram, per_doc = op_dedup.duplicated_spans(df, n=4)
    grams = {r.gram: (r.n_docs, r.n_occ) for r in per_gram.collect()}
    assert grams == {"x y z w": (2, 2)}  # within-doc 'p p p p' not dup
    docs = {r.doc_id: (r.n_grams, r.dup_grams) for r in per_doc.collect()}
    assert docs[1] == (4, 1) and docs[2] == (4, 1)
    assert docs[3] == (5, 0)


def test_duplicated_spans_counts_all_occurrences(spark):
    df = _docs(spark, [
        (1, "m n o q m n o q"),   # gram 'm n o q' occurs at pos 1 and 5
        (2, "m n o q unrelated suffix here"),
    ])
    per_gram, per_doc = op_dedup.duplicated_spans(df, n=4)
    row = per_gram.filter(F.col("gram") == "m n o q").collect()[0]
    assert row.n_docs == 2 and row.n_occ == 3
    docs = {r.doc_id: r.dup_grams for r in per_doc.collect()}
    assert docs[1] == 2 and docs[2] == 1

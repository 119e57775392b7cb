"""Inverted-index postings export (operators/invindex.py)."""

import pytest
from pyspark.sql import functions as F

from docling_graph_spark.operators import invindex as op_ix


@pytest.fixture(scope="module")
def docs(spark):
    # "every" appears in all docs (stopword analogue); "seven" only in 700
    rows = [(0, "alpha every words"), (1, "every bravo"),
            (300, "every alpha"), (700, "every seven")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_blocking_bounds_group_size(docs):
    blk = {(r["term"], r["block"]): r["ids"]
           for r in op_ix.term_postings(docs, block=256).collect()}
    # the stopword splits into one group per doc-range block, never one
    # giant posting group
    assert blk[("every", 0)] == [0, 1]
    assert blk[("every", 1)] == [300]
    assert blk[("every", 2)] == [700]
    assert blk[("alpha", 1)] == [300]


def test_deltas_relative_to_block_start(docs):
    rows = {(r["term"], r["block"]): r["deltas"]
            for r in op_ix.term_postings(docs, block=256).collect()}
    assert rows[("every", 0)] == [0, 1]     # 0-0, 1-0... delta chain
    assert rows[("every", 1)] == [44]       # 300 - 256
    assert rows[("alpha", 0)] == [0]
    assert rows[("seven", 2)] == [188]      # 700 - 512


def test_varint_accounting(spark):
    # doc 0 and doc 200 in block 0: deltas 0 and 200 -> 1 + 2 bytes
    docs = spark.createDataFrame(
        [(0, "zzzzz"), (200, "zzzzz")], "doc_id long, text string")
    [r] = op_ix.postings_stats(docs, block=256).collect()
    assert (r["term"], r["df"], r["n_blocks"]) == ("zzzzz", 2, 1)
    assert r["index_bytes"] == 3


def test_short_and_nonalpha_tokens_excluded(spark):
    docs = spark.createDataFrame(
        [(0, "ab cde f1ghij KLMNO pqrst")], "doc_id long, text string")
    terms = {r["term"] for r in op_ix.postings_stats(docs).collect()}
    # "ab"/"cde" too short; "f1ghij" splits at the digit into runs < 5;
    # "KLMNO" lowercases in
    assert terms == {"klmno", "pqrst"}


def test_null_text_yields_no_terms(spark):
    docs = spark.createDataFrame([(0, None)], "doc_id long, text string")
    assert op_ix.postings_stats(docs).count() == 0


def test_checksum_partitioning_invariant(docs):
    a = {r["term"]: r["checksum"]
         for r in op_ix.postings_stats(docs).collect()}
    b = {r["term"]: r["checksum"]
         for r in op_ix.postings_stats(docs.repartition(7)).collect()}
    assert a == b


def test_bm25_impacts_exact_integer_math(spark):
    from docling_graph_spark.operators import invindex as op_ix

    # two docs x 4 tokens: T=8, N=2, dl=4 = avgdl, so the saturation
    # reduces to scale*tf*(k1+1)/(tf+k1) with k1=1.2 exactly
    docs = spark.createDataFrame(
        [(0, "apple apple berry cherry"),
         (1, "apple melon grape lemon")],
        "doc_id long, text string")
    rows = {(r["term"], r["doc_id"]): r["impact"]
            for r in op_ix.bm25_impacts(docs).collect()}
    # tf=2: 1e6*2*2.2/3.2 = 1_375_000 ; tf=1: 1e6*2.2/2.2 = 1_000_000
    assert rows[("apple", 0)] == 1_375_000
    assert rows[("apple", 1)] == 1_000_000
    assert rows[("berry", 0)] == 1_000_000

    stats = {r["term"]: r for r in
             op_ix.bm25_term_stats(docs).collect()}
    a = stats["apple"]
    assert (a["df"], a["sum_impact"], a["max_impact"]) == (
        2, 2_375_000, 1_375_000)
    assert a["impact_checksum"] > 0


def test_bm25_length_normalization_direction(spark):
    from docling_graph_spark.operators import invindex as op_ix

    # same tf, longer doc -> smaller impact (b>0 penalizes long docs)
    docs = spark.createDataFrame(
        [(0, "apple berry"),
         (1, "apple berry cherry grape lemon melon olive peach")],
        "doc_id long, text string")
    rows = {(r["term"], r["doc_id"]): r["impact"]
            for r in op_ix.bm25_impacts(docs).collect()}
    assert rows[("apple", 0)] > rows[("apple", 1)]


# ---------------------------------------------------------------------------
# Block-Max WAND safe top-k


@pytest.fixture(scope="module")
def wand_corpus(spark):
    """Synthetic corpus with skewed term frequencies: term t{j} appears in
    docs where doc_id % (j + 2) == 0, with tf varying by doc — enough
    distinct terms (30) to fill the 24-rank query set, and block-local
    impact variation so the Block-Max bound actually prunes."""
    rows = []
    for d in range(240):
        words = []
        for j in range(30):
            if d % (j + 2) == 0:
                t = f"term{chr(97 + j // 26)}{chr(97 + j % 26)}"
                words += [t] * (1 + (d * 7 + j) % 4)
        rows.append((d, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _exhaustive_topk(spark, docs, k=op_ix.WAND_K,
                     n_terms=op_ix.WAND_NT):
    """Reference top-k: score EVERY candidate doc, no pruning."""
    from pyspark.sql import Window

    imp = op_ix.bm25_impacts(docs)
    dfs = imp.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    top = (dfs.orderBy(F.desc("df"), "term").limit(n_terms)
           .withColumn("rank", F.row_number().over(
               Window.orderBy(F.desc("df"), "term"))).collect())
    n_docs = docs.count()
    by_rank = {r["rank"]: r for r in top}
    qrows = [(f"q{qi:02d}", by_rank[rank]["term"],
              (n_docs * op_ix.W_SCALE) // by_rank[rank]["df"])
             for qi, rank in op_ix.wand_query_terms(n_terms)
             if rank in by_rank]
    qterms = spark.createDataFrame(
        qrows, "query_id string, term string, w long")
    scored = (imp.join(F.broadcast(qterms), "term")
              .groupBy("query_id", "doc_id")
              .agg(F.sum(F.col("w") * F.col("impact"))
                   .cast("long").alias("score")))
    return (scored.withColumn("rn", F.row_number().over(
        Window.partitionBy("query_id").orderBy(F.desc("score"), "doc_id")))
        .filter(F.col("rn") <= k)
        .select("query_id", "rn", "doc_id", "score"))


@pytest.mark.slow
def test_wand_topk_matches_exhaustive(spark, wand_corpus):
    """Safety: the pruned execution returns EXACTLY the unpruned top-k."""
    from pyspark.sql import functions as F

    got = op_ix.wand_topk(wand_corpus).collect()
    ref = _exhaustive_topk(spark, wand_corpus)
    row_md5 = F.md5(F.concat(
        F.col("query_id"), F.lit(":"), F.col("rn").cast("string"),
        F.lit(":"), F.col("doc_id").cast("string"), F.lit(":"),
        F.col("score").cast("string")).cast("binary"))
    ref_ck = {r["query_id"]: r["ck"] for r in ref.groupBy("query_id").agg(
        F.sum(F.conv(F.substring(row_md5, 1, 12), 16, 10).cast("long"))
        .cast("long").alias("ck")).collect()}
    assert len(got) == op_ix.WAND_NT // 2
    for r in got:
        assert r["topk_checksum"] == ref_ck[r["query_id"]], r["query_id"]


@pytest.mark.slow
def test_wand_pruning_is_effective(wand_corpus):
    """The bound must do real work at BOTH levels: whole posting blocks
    are skipped before any doc enumeration (the document-at-a-time
    Block-Max skip), and the per-doc bound prunes further inside the
    live blocks — so exact scoring touches a strict subset of the
    enumerated candidates or the block skip already removed docs."""
    rows = op_ix.wand_topk(wand_corpus).collect()
    n_cand = sum(r["n_candidates"] for r in rows)
    n_surv = sum(r["n_survivors"] for r in rows)
    n_blocks = sum(r["n_blocks"] for r in rows)
    n_live = sum(r["n_blocks_live"] for r in rows)
    assert n_live < n_blocks, (n_live, n_blocks)   # blocks skipped > 0
    assert n_surv <= n_cand
    # every query keeps at least k survivors (the top-k itself)
    for r in rows:
        assert r["n_survivors"] >= op_ix.WAND_K
        assert r["n_blocks_live"] <= r["n_blocks"]


def test_wand_small_corpus_no_theta(spark):
    """Fewer seed docs than k -> theta stays 0 and nothing is pruned."""
    docs = spark.createDataFrame(
        [(0, "aardvark bobcat"), (1, "aardvark"), (2, "bobcat")],
        "doc_id long, text string")
    rows = op_ix.wand_topk(docs, k=5).collect()
    for r in rows:
        assert r["theta"] == 0
        assert r["n_survivors"] == r["n_candidates"]

"""Trained IVF codebook: Lloyd refinement must buy real recall over the
untrained first-N codebook on the same query path, measured against the
brute-force ground truth (the honest ANN metric — a faster index that
returns the wrong neighbors is not an index)."""

from pyspark.sql import functions as F

from docling_graph_spark.operators import ann

K = 10
N_CENTROIDS = 16
NPROBE = 2


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def _recall(truth, approx):
    return sum(
        len(approx.get(q, set()) & s) / len(s) for q, s in truth.items()
    ) / len(truth)


def test_trained_codebook_beats_untrained(spark, sf_correct_dir):
    emb = spark.read.parquet(f"{sf_correct_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    truth = _topk_sets(ann.brute_force_knn(emb, queries, k=K))

    untrained = _recall(truth, _topk_sets(
        ann.ivf_knn(emb, queries, k=K, n_centroids=N_CENTROIDS,
                    nprobe=NPROBE)
    ))
    cents = ann.train_ivf_centroids(emb, n_centroids=N_CENTROIDS, iters=2)
    trained = _recall(truth, _topk_sets(
        ann.ivf_knn(emb, queries, k=K, n_centroids=N_CENTROIDS,
                    nprobe=NPROBE, centroids=cents)
    ))

    # measured 0.430 vs 0.305 on this corpus; margins absorb the float
    # reduction-order jitter in the per-list means
    assert trained > untrained
    assert trained >= 0.38
    assert untrained <= 0.35


def test_trained_centroids_shape_and_determinism_of_count(spark,
                                                          sf_correct_dir):
    emb = spark.read.parquet(f"{sf_correct_dir}/embeddings.parquet")
    cents = ann.train_ivf_centroids(emb, n_centroids=N_CENTROIDS, iters=1)
    rows = cents.collect()
    assert len(rows) == N_CENTROIDS
    dim = len(emb.select("embedding").first()[0])
    assert all(len(r.cvec) == dim for r in rows)
    assert all(r._cnorm > 0 for r in rows)


def test_sq8_recall_and_partitioning_invariance(spark, sf_correct_dir):
    """SQ8 codes keep most of the float ranking: recall@10 vs the exact
    path stays high (8-bit per-dim quantization of 64-dim vectors), and
    the integer ranks are identical on any input partitioning."""
    emb = spark.read.parquet(f"{sf_correct_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    truth = _topk_sets(ann.brute_force_knn(emb, queries, k=K))
    sq = _topk_sets(ann.sq8_knn(emb, queries, k=K))
    # measured 0.97 with per-dim weighted scoring (0.71 for the naive
    # unweighted (c-128) form this operator deliberately avoids)
    assert _recall(truth, sq) >= 0.90
    a = {tuple(r) for r in
         ann.sq8_knn(emb.repartition(9), queries, k=K).collect()}
    b = {tuple(r) for r in
         ann.sq8_knn(emb.coalesce(1), queries, k=K).collect()}
    assert a == b


def test_sq8_codes_range_and_degenerate_dim(spark):
    """Codes stay in [0,255]; a constant dimension codes to 0 instead of
    dividing by zero."""
    rows = [(i, [float(i), 7.0, -1.0 + 0.5 * i]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    mins, maxs = ann.sq_train_stats(df, dim=3)
    assert mins[1] == maxs[1] == 7.0
    codes = df.select(
        ann.sq_codes(F.col("embedding"), mins, maxs).alias("c")).collect()
    for r in codes:
        assert all(0 <= v <= 255 for v in r.c)
        assert r.c[1] == 0
    # extremes map to the ends of the range
    first = df.filter("vec_id = 0").select(
        ann.sq_codes(F.col("embedding"), mins, maxs).alias("c")
    ).first().c
    last = df.filter("vec_id = 4").select(
        ann.sq_codes(F.col("embedding"), mins, maxs).alias("c")
    ).first().c
    assert first[0] == 0 and last[0] == 255
    assert first[2] == 0 and last[2] == 255


def test_sq_train_stats_rejects_wrong_dim_and_empty(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(0, [1.0, 2.0, 3.0])],
                               "vec_id long, embedding array<double>")
    with _pytest.raises(ValueError, match="only has 3 positions"):
        ann.sq_train_stats(df, dim=64)
    empty = df.filter("vec_id < 0")
    with _pytest.raises(ValueError, match="empty embedding"):
        ann.sq_train_stats(empty, dim=3)

"""Convergence-adaptive link-graph operators (operators/linkgraph.py +
kernels/graph_fixpoint.py).

Three contracts beyond tests/test_linkgraph.py:

1. HYBRID EQUIVALENCE — the per-component local fixpoint solve
   (applyInPandas) and the synchronous DataFrame fallback (forced by
   ``max_group_edges=0``) are value-identical, row for row, on graphs
   mixing cycles, chains, dead ends and disconnected pieces.  This is
   the invariant that lets components route by size at 100-TB scale
   without changing answers.
2. FIXPOINT SEMANTICS — adaptive defaults reach would_change == 0 with
   the realized round count (max last_chg) matching a brute-force
   replay, including BEYOND the old fixed budgets (a 20-deep chain).
3. RELIABLE CHECKPOINTING — lineage.configure(reliable=True) swaps
   every iterative loop's localCheckpoint for checkpoint() against the
   session checkpoint dir (the preemption-safe cluster mode) with
   hash-identical output and RDD checkpoint files actually written.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docling_graph_spark.kernels import graph_fixpoint as gfx
from docling_graph_spark.operators import linkgraph as lg


def _edges(spark, triples):
    return spark.createDataFrame(
        [(a, b, w) for a, b, w in triples],
        "src_host string, dst_host string, n_links long")


# mixes: two cycles bridged one-way, a 5-chain, a dead end, an isolated
# pair, a self-loop, parallel weights
GRAPH = [
    ("a", "b", 2), ("b", "a", 1), ("b", "c", 3), ("c", "d", 1),
    ("d", "e", 1), ("e", "f", 2), ("f", "g", 1),
    ("p", "q", 4), ("q", "p", 4), ("q", "r", 1),
    ("x", "y", 1), ("s", "s", 2),
]


def _rows(df, key="host"):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("op", ["pagerank", "ppr", "bfs", "coreness",
                                "lpa", "scc", "walks"])
@pytest.mark.slow
def test_local_and_sync_paths_identical(spark, op):
    edges = _edges(spark, GRAPH)
    seeds = spark.createDataFrame([("a",), ("p",)], "host string")

    def run(gate):
        if op == "pagerank":
            return lg.pagerank(edges, max_group_edges=gate)
        if op == "ppr":
            return lg.personalized_pagerank(edges, seeds,
                                            max_group_edges=gate)
        if op == "bfs":
            return lg.crawl_depth(edges, seeds, max_group_edges=gate)
        if op == "coreness":
            return lg.coreness(edges, max_group_edges=gate)
        if op == "lpa":
            return lg.label_propagation(edges, max_group_edges=gate)
        if op == "walks":
            return lg.random_walks(edges, max_group_edges=gate)
        return lg.strongly_connected(edges, max_group_edges=gate)

    local = _rows(run(10_000))     # everything under the gate
    synced = _rows(run(0))         # everything over it -> sync fallback
    assert local == synced


def test_adaptive_pagerank_reaches_fixpoint_beyond_old_budget(spark):
    # a 20-deep chain needs ~20+ rounds of mass propagation — far past
    # the old fixed budget of 5 — and must still converge exactly
    chain = [(f"n{i:02d}", f"n{i + 1:02d}", 1) for i in range(20)]
    out = lg.pagerank(_edges(spark, chain)).collect()
    assert all(r["would_change"] == 0 for r in out)
    realized = max(r["last_chg"] for r in out)
    assert realized > 5
    # brute-force replay of the same integer recurrence
    ref = gfx.pagerank_component([(a, b, w) for a, b, w in chain],
                                 1_000_000)
    got = {r["host"]: r["rank"] for r in out}
    assert got == {n: v[0] for n, v in ref.items()}
    assert realized == max(v[2] for v in ref.values())


def test_fixed_rounds_still_replay_exactly(spark):
    edges = _edges(spark, GRAPH)
    two = {r["host"]: r["rank"]
           for r in lg.pagerank(edges, iterations=2).collect()}
    ref = gfx.pagerank_component([(a, b, w) for a, b, w in GRAPH],
                                 1_000_000, fixed_rounds=2)
    assert two == {n: v[0] for n, v in ref.items()}


def test_bfs_unreachable_and_realized_rounds(spark):
    chain = [(f"n{i:02d}", f"n{i + 1:02d}", 1) for i in range(12)]
    chain += [("z1", "z2", 1)]
    seeds = spark.createDataFrame([("n00",)], "host string")
    out = {r["host"]: (r["depth"], r["would_change"], r["last_chg"])
           for r in lg.crawl_depth(_edges(spark, chain), seeds).collect()}
    assert out["n12"] == (12, 0, 12)
    assert out["z1"][0] == -1 and out["z2"][0] == -1
    assert all(wc == 0 for _, wc, _ in out.values())


def test_scc_adaptive_resolves_long_cycle_mixed_graph(spark):
    # 12-cycle + DAG tail + 2-cycle: everything assigned under defaults
    g = [(f"c{i:02d}", f"c{(i + 1) % 12:02d}", 1) for i in range(12)]
    g += [("c00", "t1", 1), ("t1", "t2", 1), ("u", "v", 1), ("v", "u", 1)]
    rows = {r["host"]: (r["scc"], r["scc_size"], r["assigned"])
            for r in lg.strongly_connected(_edges(spark, g)).collect()}
    assert all(asg == 1 for _, _, asg in rows.values())
    assert rows["c00"] == ("c11", 12, 1)
    assert rows["u"] == ("v", 2, 1) and rows["v"] == ("v", 2, 1)
    assert rows["t1"] == ("t1", 1, 1) and rows["t2"] == ("t2", 1, 1)


def test_kernel_lpa_two_cycle_is_honest():
    # K(1,1) bipartite 2-cycle under synchronous LPA: labels swap
    # forever; the adaptive kernel must exhaust the cap and report
    # would_change=1, never a fake fixpoint
    res = gfx.lpa_component([("a", "b", 1)], None, 8)
    assert all(wc == 1 for _, wc, _ in res.values())


@pytest.mark.slow
def test_reliable_checkpoint_mode_identical_output(spark, tmp_path):
    """VERDICT item: swapping localCheckpoint for reliable checkpoint()
    must leave iterative-operator output bit-identical, and must
    actually write RDD checkpoint blocks under the configured dir (the
    evidence that a recomputation after executor loss reads files, not
    dead executor memory)."""
    from docling_graph_spark import lineage

    edges = _edges(spark, GRAPH)
    # force the synchronous fallback so the per-round lineage.cut path
    # actually runs (the local kernel path has no lineage to cut)
    base = _rows(lg.pagerank(edges, max_group_edges=0))
    ckdir = str(tmp_path / "reliable_ck")
    lineage.configure(reliable=True, checkpoint_dir=ckdir, spark=spark)
    try:
        rel = _rows(lg.pagerank(edges, max_group_edges=0))
    finally:
        lineage.configure(reliable=False)
    assert rel == base
    import os

    found = [os.path.join(r, f) for r, _, fs in os.walk(ckdir) for f in fs]
    assert found, "no reliable checkpoint blocks were written"


def test_weakly_connected_labels_are_min_member(spark):
    edges = _edges(spark, GRAPH)
    comp = {r["host"]: r["comp"]
            for r in lg.weakly_connected(edges).collect()}
    # a..g one component (bridged), p/q/r one, x/y one, s alone
    assert len({comp[h] for h in "abcdefg"}) == 1 and comp["a"] == "a"
    assert comp["p"] == comp["q"] == comp["r"] == "p"
    assert comp["x"] == comp["y"] == "x"
    assert comp["s"] == "s"


def test_hybrid_ops_on_empty_edges(spark):
    """Empty edge relations flow through the hybrid dispatch without
    errors: empty wcc, empty groups, empty output with the right
    schema."""
    empty = spark.createDataFrame(
        [], "src_host string, dst_host string, n_links long")
    assert lg.pagerank(empty).count() == 0
    assert lg.coreness(empty).count() == 0
    assert lg.strongly_connected(empty).count() == 0
    assert lg.hits(empty).count() == 0
    seeds = spark.createDataFrame([("x",)], "host string")
    assert lg.crawl_depth(empty, seeds).count() == 0
    assert lg.weakly_connected(empty).count() == 0


@pytest.mark.slow
def test_local_vs_sync_on_random_graph(spark):
    """Moderate random digraph (several hundred edges, multiple
    components, cycles + dags): the component-local and synchronous
    paths agree value-for-value for the two heaviest ops."""
    import random

    rng = random.Random(42)
    triples = []
    for comp in range(4):
        n = 20 + comp * 10
        for _ in range(n * 4):
            a, b = rng.randrange(n), rng.randrange(n)
            triples.append((f"c{comp}n{a:02d}", f"c{comp}n{b:02d}",
                            1 + rng.randrange(3)))
    edges = _edges(spark, triples)
    pr_local = _rows(lg.pagerank(edges, max_group_edges=10_000))
    pr_sync = _rows(lg.pagerank(edges, max_group_edges=0))
    assert pr_local == pr_sync
    scc_local = _rows(lg.strongly_connected(edges,
                                            max_group_edges=10_000))
    scc_sync = _rows(lg.strongly_connected(edges, max_group_edges=0))
    assert scc_local == scc_sync
    # and the local path really converged
    assert all(r[2] == 0 for r in pr_local)  # would_change column


def test_pagerank_kernel_overflow_guard_falls_back_exactly():
    """Weights big enough that 85*rank*w would exceed int64 must trip
    the numpy guard and continue on exact Python integers — same
    recurrence, no wrap.  Verified against a direct dict replay."""
    W = 10**14
    edges = [("a", "b", W), ("b", "a", W), ("b", "c", 1)]
    scale = 10**6
    got = gfx.pagerank_component(edges, scale, fixed_rounds=2,
                                 max_rounds=96)
    # direct replay with arbitrary-precision ints
    nodes = ["a", "b", "c"]
    outw = {"a": W, "b": W + 1}
    base = (15 * scale) // 100
    rank = {n: scale for n in nodes}
    for _ in range(2):
        acc = {n: 0 for n in nodes}
        for u, v, w in edges:
            acc[v] += (85 * rank[u] * w) // (100 * outw[u])
        rank = {n: base + acc[n] for n in nodes}
    assert {n: v[0] for n, v in got.items()} == rank


def test_sync_pagerank_huge_weights_no_int64_wrap(spark):
    """The synchronous fallback widens 85*rank*w to decimal(38,0):
    weights big enough to wrap plain long arithmetic must still match
    the arbitrary-precision kernel exactly."""
    W = 10**14
    edges = _edges(spark, [("a", "b", W), ("b", "a", W), ("b", "c", 1)])
    sync = {r["host"]: r["rank"]
            for r in lg.pagerank(edges, iterations=2,
                                 max_group_edges=0).collect()}
    ref = gfx.pagerank_component([("a", "b", W), ("b", "a", W),
                                  ("b", "c", 1)], 1_000_000,
                                 fixed_rounds=2)
    assert sync == {n: v[0] for n, v in ref.items()}


def test_oracle_caps_match_operator_caps():
    """The cap the DuckDB oracles unroll to must equal the adaptive
    operators' max-round budgets — the stability=>idempotence bridge
    only holds when both engines share the same cap."""
    from docling_graph_spark import queries as q

    assert q.PAGERANK_ORACLE_CAP == lg.PAGERANK_MAX_ROUNDS
    assert q.CORENESS_ORACLE_CAP == lg.CORENESS_MAX_ROUNDS
    assert q.BFS_ORACLE_CAP == lg.BFS_MAX_ROUNDS
    assert q.LPA_ORACLE_CAP == lg.LPA_MAX_ROUNDS
    assert q.HITS_ORACLE_CAP == lg.HITS_MAX_ITERATIONS


def test_hits_kernel_overflow_guard_falls_back_exactly():
    """Huge weights push the rescale product past int64: the kernel's
    exact-integer fallback must produce the same values the pure-Python
    recurrence does (no silent wraparound)."""
    from docling_graph_spark.kernels import graph_fixpoint as gfx

    big = 1 << 45
    e = [("u", "v", big), ("v", "w", big - 7), ("w", "u", 3)]
    got = gfx.hits_graph(e, 1_000_000)
    # pure-Python replay (arbitrary precision, the reference arithmetic)
    nodes = sorted({x[0] for x in e} | {x[1] for x in e})
    hub = dict.fromkeys(nodes, 1_000_000)
    auth = dict.fromkeys(nodes, 1_000_000)
    last = dict.fromkeys(nodes, 0)
    def it(h):
        raw = dict.fromkeys(nodes, 0)
        for u, v, w in e:
            raw[v] += w * h[u]
        mx = max(raw.values())
        a = {n: (raw[n] * 1_000_000 // mx if mx > 0 else 0)
             for n in nodes}
        raw = dict.fromkeys(nodes, 0)
        for u, v, w in e:
            raw[u] += w * a[v]
        mx = max(raw.values())
        return ({n: (raw[n] * 1_000_000 // mx if mx > 0 else 0)
                 for n in nodes}, a)
    for t in range(1, 33):
        nh, na = it(hub)
        ch = False
        for n in nodes:
            if nh[n] != hub[n] or na[n] != auth[n]:
                last[n] = t
                ch = True
        hub, auth = nh, na
        if not ch:
            break
    ph, pa = it(hub)
    want = {n: (hub[n], auth[n],
                int(ph[n] != hub[n] or pa[n] != auth[n]), last[n])
            for n in nodes}
    assert got == want

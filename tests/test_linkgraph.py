"""Host-level link graph + integer PageRank (operators/linkgraph.py).

The two queries are pytest-oracle-gated with the same machinery as the
driver gate (tests/test_entry_oracles.py): Spark result vs a DuckDB oracle
over the same parquet, compared on columns + row count + order-insensitive
values.  They are not in the 50-entry driver catalog (frozen by the
driver's recording cap)."""

from __future__ import annotations

import pytest

import duckdb
from pyspark.sql import functions as F

from docling_graph_spark import queries as q
from docling_graph_spark.operators import linkgraph as op_lg


def _oracle(sf_dir: str, sql: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    res = con.execute(sql)
    return [d[0] for d in res.description], res.fetchall()


def _compare(sdf, dcols, drows):
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    order_s = sorted(range(len(scols)), key=lambda i: scols[i])
    order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
    sset = sorted(tuple(r[i] for i in order_s) for r in srows)
    dset = sorted(tuple(r[i] for i in order_d) for r in drows)
    assert sset == dset, [p for p in zip(sset, dset) if p[0] != p[1]][:5]


def test_host_link_graph_matches_oracle(spark, sf_smoke_dir):
    sdf = q.q_host_link_graph(spark, sf_smoke_dir)
    dcols, drows = _oracle(sf_smoke_dir, q.SQL_HOST_LINK_GRAPH)
    _compare(sdf, dcols, drows)


def test_host_pagerank_matches_oracle(spark, sf_smoke_dir):
    sdf = q.q_host_pagerank(spark, sf_smoke_dir)
    dcols, drows = _oracle(sf_smoke_dir, q.SQL_HOST_PAGERANK)
    _compare(sdf, dcols, drows)


def test_outlinks_resolution(spark):
    pages = spark.createDataFrame(
        [
            ("https://a.example.com/x",
             b'<a href="/rel">r</a> <a href="https://b.example.com/p">b</a>'),
            ("https://c.example.com/y", b"%PDF-1.4 no anchors here"),
        ],
        ["url", "html"],
    )
    rows = {(r.src_host, r.dst_host, r.href)
            for r in op_lg.extract_outlinks(pages).collect()}
    assert rows == {
        ("a.example.com", "a.example.com", "/rel"),
        ("a.example.com", "b.example.com", "https://b.example.com/p"),
    }


def _edges(spark, rows):
    return spark.createDataFrame(rows, ["src_host", "dst_host", "n_links"])


def test_pagerank_hand_computed(spark):
    # A -> B (w=1); B -> A (w=3), B -> C (w=1); C dangles.
    edges = _edges(spark, [("A", "B", 1), ("B", "A", 3), ("B", "C", 1)])
    r = {row.host: row.rank
         for row in op_lg.pagerank(edges, iterations=1, scale=1000).collect()}
    # base = 150; A: 150 + (85*1000*3)//(100*4) = 150 + 637 = 787
    # B: 150 + (85*1000*1)//(100*1) = 1000; C: 150 + (85*1000*1)//(100*4)=362
    assert r == {"A": 787, "B": 1000, "C": 362}


def test_pagerank_is_deterministic_under_repartition(spark):
    edges = _edges(spark, [("A", "B", 2), ("B", "C", 1), ("C", "A", 5),
                           ("A", "C", 1), ("C", "B", 2)])
    a = {r.host: r.rank for r in op_lg.pagerank(edges).collect()}
    b = {r.host: r.rank
         for r in op_lg.pagerank(edges.repartition(7)).collect()}
    assert a == b


def test_hot_hosts_attract_rank(spark, sf_smoke_dir):
    """The synthesizer's popularity-skewed footer link must concentrate
    PageRank on the hot hosts (host0..host6)."""
    ranks = q.q_host_pagerank(spark, sf_smoke_dir).collect()
    top7 = {r.host for r in ranks[:7]}
    assert top7 == {f"host{i}.example.com" for i in range(7)}


def test_anchor_text_pairs_unit(spark):
    pages = spark.createDataFrame(
        [("https://a.example.com/x",
          b'<a href="/r">Rel</a> x <a href="https://b.example.com/p">B!</a>')],
        ["url", "html"],
    )
    rows = {(r.dst_host, r.href, r.anchor)
            for r in op_lg.anchor_text_pairs(pages).collect()}
    assert rows == {
        ("a.example.com", "/r", "Rel"),
        ("b.example.com", "https://b.example.com/p", "B!"),
    }


def test_anchor_texts_matches_oracle(spark, sf_smoke_dir):
    sdf = q.q_anchor_texts(spark, sf_smoke_dir)
    dcols, drows = _oracle(sf_smoke_dir, q.SQL_ANCHOR_TEXTS)
    _compare(sdf, dcols, drows)


def test_nofollow_links_excluded(spark):
    html = (b'<html><body>'
            b'<a href="https://good.example.com/">endorsed</a>'
            b'<a href="https://spam.example.com/" rel="nofollow">paid</a>'
            b'<a rel="ugc nofollow" href="https://ugc.example.com/">c</a>'
            b'<a href="/local" rel="author">fine</a>'
            b'</body></html>')
    pages = spark.createDataFrame(
        [("https://src.example.com/p", html)], "url string, html binary")
    from docling_graph_spark.operators import linkgraph as lg

    all_links = {r["dst_host"]
                 for r in lg.extract_outlinks(pages).collect()}
    followed = {r["dst_host"] for r in lg.extract_outlinks(
        pages, skip_nofollow=True).collect()}
    assert all_links == {"good.example.com", "spam.example.com",
                         "ugc.example.com", "src.example.com"}
    assert followed == {"good.example.com", "src.example.com"}


def test_data_href_attributes_not_extracted(spark):
    """Attributes merely ENDING in href (data-href, ng-href) must not
    donate outlinks, and must not hijack the real href's capture."""
    html = (b'<html><body>'
            b'<a href="https://real.example.com/" '
            b'data-href="https://tracker.example.com/">x</a>'
            b'<a data-href="https://phantom.example.com/">no real href</a>'
            b'<a data-rel="nofollow" href="https://kept.example.com/">k</a>'
            b'</body></html>')
    pages = spark.createDataFrame(
        [("https://src.example.com/p", html)], "url string, html binary")
    from docling_graph_spark.operators import linkgraph as lg

    hosts = {r["dst_host"] for r in lg.extract_outlinks(pages).collect()}
    assert hosts == {"real.example.com", "kept.example.com"}
    # data-rel="nofollow" is NOT a rel attribute: link survives skip mode
    followed = {r["dst_host"] for r in lg.extract_outlinks(
        pages, skip_nofollow=True).collect()}
    assert followed == hosts


def test_resolve_aliases_chain(spark):
    from docling_graph_spark.operators import linkgraph as op_lg

    # a->b->c->d (depth 3) plus a lone e->d
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("e", "d")],
        "alias string, target string")
    got = {r["alias"]: (r["root"], r["hops"])
           for r in op_lg.resolve_aliases(edges).collect()}
    assert got == {"a": ("d", 3), "b": ("d", 2), "c": ("d", 1),
                   "e": ("d", 1)}


def test_resolve_aliases_cycle_terminates(spark):
    from docling_graph_spark.operators import linkgraph as op_lg

    # malformed mutual-canonical cycle must not loop forever
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "alias string, target string")
    rows = op_lg.resolve_aliases(edges, max_rounds=4).collect()
    assert len(rows) == 2  # still one row per alias, loop exited


def test_alias_resolution_stats_counts(spark):
    from docling_graph_spark.operators import linkgraph as op_lg

    edges = spark.createDataFrame(
        [("a", "b", "redirect"), ("b", "c", "canonical"),
         ("e", "c", "redirect")],
        "alias string, target string, kind string")
    [s] = op_lg.alias_resolution_stats(edges).collect()
    assert (s["n_edges"], s["n_redirect"], s["n_canonical"]) == (3, 2, 1)
    assert (s["n_roots"], s["max_hops"], s["sum_hops"]) == (1, 2, 4)


def test_url_template_collapse(spark):
    from docling_graph_spark.operators import linkgraph as op_lg

    cases = [
        ("https://h7.example.com/doc/123", "/doc/{n}"),
        ("https://h.example.com/", "/"),
        ("https://h.example.com", "/"),          # empty path -> '/'
        ("/a7", "/a{n}"),
        ("/p/2024/03/item9?id=5#frag", "/p/{n}/{n}/item{n}"),
        ("/about", "/about"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "href string")
    got = [r[0] for r in
           df.select(op_lg.url_template(F.col("href"))).collect()]
    assert got == [t for _, t in cases]


def test_url_pattern_stats_groups(spark):
    from docling_graph_spark.operators import linkgraph as op_lg

    html = (b'<body><a href="/doc/1">a</a> <a href="/doc/22">b</a>'
            b' <a href="/doc/1">c</a> <a href="/about">d</a></body>')
    pages = spark.createDataFrame(
        [("https://h/x", html)], "url string, html binary")
    got = {r["template"]: (r["n_links"], r["n_distinct_urls"])
           for r in op_lg.url_pattern_stats(pages).collect()}
    assert got == {"/doc/{n}": (3, 2), "/about": (1, 1)}


# ---------------------------------------------------------------------------
# triangle counting (degree-ordered orientation)


def _tri(spark, pairs):
    from docling_graph_spark.operators.linkgraph import triangle_stats
    edges = spark.createDataFrame(
        [(a, b, 1) for a, b in pairs],
        "src_host string, dst_host string, n_links long")
    return {r["host"]: (r["n_triangles"], r["degree"])
            for r in triangle_stats(edges).collect()}


def test_triangles_k4(spark):
    """K4: 4 triangles, every node in 3 of them, degree 3."""
    nodes = ["a", "b", "c", "d"]
    pairs = [(u, v) for u in nodes for v in nodes if u < v]
    got = _tri(spark, pairs)
    assert got == {n: (3, 3) for n in nodes}


def test_triangles_dedupe_direction_and_selfloops(spark):
    """Reciprocal links, repeated edges, and self-loops collapse to one
    undirected simple edge each; a single triangle survives."""
    pairs = [("a", "b"), ("b", "a"), ("a", "b"),
             ("b", "c"), ("c", "a"), ("a", "a"), ("d", "c")]
    got = _tri(spark, pairs)
    assert got["a"] == (1, 2) and got["b"] == (1, 2)
    assert got["c"] == (1, 3)
    assert got["d"] == (0, 1)


def test_triangles_hub_star_has_none(spark):
    """A pure hub (star) has zero triangles; the hub's wedges are never
    enumerated thanks to the low->high orientation (out-degree 0)."""
    pairs = [("hub", f"leaf{i}") for i in range(10)]
    got = _tri(spark, pairs)
    assert got["hub"] == (0, 10)
    assert all(got[f"leaf{i}"] == (0, 1) for i in range(10))


# ---------------------------------------------------------------------------
# HITS hubs/authorities
# ---------------------------------------------------------------------------


def _hits_replay(edges, iterations=4, scale=1_000_000):
    """Sequential replay of the exact integer recurrence."""
    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    hub = {n: scale for n in nodes}
    auth = {n: 0 for n in nodes}
    for _ in range(iterations):
        raw = {n: 0 for n in nodes}
        for s, d, w in edges:
            raw[d] += w * hub[s]
        mx = max(raw.values())
        auth = {n: (raw[n] * scale // mx if mx > 0 else 0) for n in nodes}
        raw = {n: 0 for n in nodes}
        for s, d, w in edges:
            raw[s] += w * auth[d]
        mx = max(raw.values())
        hub = {n: (raw[n] * scale // mx if mx > 0 else 0) for n in nodes}
    return hub, auth


def test_hits_fixed_budget_matches_sequential_replay(spark):
    """An explicit ``iterations=`` budget replays exactly (the
    unrolled-oracle contract)."""
    e = [("h1", "a1", 3), ("h1", "a2", 1), ("h2", "a1", 2),
         ("h2", "a3", 1), ("h3", "a2", 5)]
    edges = spark.createDataFrame(
        e, "src_host string, dst_host string, n_links long")
    got = {r["host"]: (r["hub"], r["auth"])
           for r in op_lg.hits(edges, iterations=4).collect()}
    hub, auth = _hits_replay(e)
    assert got == {n: (hub[n], auth[n]) for n in hub}


def test_hits_adaptive_reaches_fixpoint(spark):
    """Default (adaptive) HITS runs to pointwise stability: one more
    iteration moves nothing (would_change == 0 everywhere) and
    max(last_chg) is the realized iteration count — more iterations
    than the old fixed budget of 4 on this graph."""
    e = [("h1", "a1", 3), ("h1", "a2", 1), ("h2", "a1", 2),
         ("h2", "a3", 1), ("h3", "a2", 5)]
    edges = spark.createDataFrame(
        e, "src_host string, dst_host string, n_links long")
    rows = op_lg.hits(edges).collect()
    assert all(r["would_change"] == 0 for r in rows)
    realized = max(r["last_chg"] for r in rows)
    assert realized == 19  # > the old fixed budget of 4
    # idempotence: replaying the realized count as a fixed budget
    # reproduces the adaptive values exactly
    fixed = {r["host"]: (r["hub"], r["auth"])
             for r in op_lg.hits(edges, iterations=realized).collect()}
    assert fixed == {r["host"]: (r["hub"], r["auth"]) for r in rows}


@pytest.mark.slow
def test_hits_local_vs_sync_paths_identical(spark):
    """The whole-graph Arrow kernel and the synchronous DataFrame
    fallback agree value-for-value — adaptive on a fast-converging
    star, fixed-budget on the reference graph (the sync path pays
    real driver rounds, so keep its budgets small)."""
    star = [("hub", f"a{i}", 1) for i in range(4)]
    edges = spark.createDataFrame(
        star, "src_host string, dst_host string, n_links long")
    loc = {r["host"]: tuple(r) for r in op_lg.hits(edges).collect()}
    syn = {r["host"]: tuple(r)
           for r in op_lg.hits(edges, max_group_edges=1).collect()}
    assert loc == syn
    e = [("h1", "a1", 3), ("h1", "a2", 1), ("h2", "a1", 2),
         ("h2", "a3", 1), ("h3", "a2", 5)]
    edges = spark.createDataFrame(
        e, "src_host string, dst_host string, n_links long")
    loc = {r["host"]: tuple(r)
           for r in op_lg.hits(edges, iterations=3).collect()}
    syn = {r["host"]: tuple(r)
           for r in op_lg.hits(edges, iterations=3,
                               max_group_edges=1).collect()}
    assert loc == syn


def test_hits_partitioning_invariant(spark):
    e = [(f"s{i % 7}", f"d{i % 11}", 1 + i % 3) for i in range(60)]
    edges = spark.createDataFrame(
        e, "src_host string, dst_host string, n_links long")
    a = {r["host"]: (r["hub"], r["auth"])
         for r in op_lg.hits(edges.repartition(13)).collect()}
    b = {r["host"]: (r["hub"], r["auth"])
         for r in op_lg.hits(edges.coalesce(1)).collect()}
    assert a == b


def test_hits_roles_separate_on_bipartite_graph(spark):
    """On a pure hub->authority bipartite graph, hubs get auth=0 and
    authorities get hub=0; the best hub/authority hit the scale cap.
    At the adaptive fixpoint the secondary scores land on the
    golden-ratio point of the mutual-reinforcement recurrence
    (1/phi ~ 0.618 * scale)."""
    e = [("h1", "a1", 1), ("h1", "a2", 1), ("h2", "a1", 1)]
    edges = spark.createDataFrame(
        e, "src_host string, dst_host string, n_links long")
    got = {r["host"]: (r["hub"], r["auth"])
           for r in op_lg.hits(edges).collect()}
    assert got["h1"][1] == 0 and got["h2"][1] == 0
    assert got["a1"][0] == 0 and got["a2"][0] == 0
    assert got["h1"][0] == 1_000_000          # links to both authorities
    assert got["a1"][1] == 1_000_000          # linked by both hubs
    assert got["h2"][0] == 618_034            # integer 1/phi fixpoint
    assert got["a2"][1] == 618_033


# ---------------------------------------------------------------------------
# k-core decomposition (coreness)
# ---------------------------------------------------------------------------


def _core_edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1) for a, b in pairs],
        "src_host string, dst_host string, n_links long")


def test_coreness_k4_plus_path(spark):
    edges = _core_edges(spark, [
        ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
        ("c", "d"), ("d", "e"), ("e", "f")])
    rows = {r["host"]: (r["degree"], r["coreness"], r["would_change"])
            for r in op_lg.coreness(edges).collect()}
    assert rows == {"a": (3, 3, 0), "b": (3, 3, 0), "c": (3, 3, 0),
                    "d": (4, 3, 0), "e": (2, 1, 0), "f": (1, 1, 0)}


def test_coreness_star_and_cycle(spark):
    """A hub star is 1-core everywhere despite the hub's high degree; a
    cycle is 2-core — the two shapes that separate coreness from degree."""
    star = _core_edges(spark, [("hub", f"s{i}") for i in range(6)])
    got = {r["host"]: r["coreness"] for r in op_lg.coreness(star).collect()}
    assert set(got.values()) == {1}
    cyc = _core_edges(
        spark, [(f"c{i}", f"c{(i + 1) % 5}") for i in range(5)])
    got = {r["host"]: r["coreness"] for r in op_lg.coreness(cyc).collect()}
    assert set(got.values()) == {2}


def test_coreness_partitioning_invariant_and_converged(spark):
    import itertools

    pairs = [(f"h{i}", f"h{j}") for i, j in
             itertools.combinations(range(6), 2) if (i + j) % 3 != 0]
    edges = _core_edges(spark, pairs)
    a = {tuple(r) for r in op_lg.coreness(edges.repartition(7)).collect()}
    b = {tuple(r) for r in op_lg.coreness(edges.coalesce(1)).collect()}
    assert a == b
    rows = op_lg.coreness(edges).collect()
    assert all(r["would_change"] == 0 for r in rows)  # converged


# ---------------------------------------------------------------------------
# deterministic random walks
# ---------------------------------------------------------------------------


def _walk_replay(edges, walks_per_node=2, length=6):
    import hashlib

    adj = {}
    for s, d, _ in edges:
        adj.setdefault(s, set()).add(d)
    adj = {s: sorted(v) for s, v in adj.items()}
    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    out = {}
    for start in nodes:
        for w in range(walks_per_node):
            cur, path, hops = start, start, 0
            for t in range(length):
                nbrs = adj.get(cur)
                if not nbrs:
                    continue
                h = int(hashlib.md5(
                    f"{cur}:{w}:{t}".encode()).hexdigest()[:12], 16)
                cur = nbrs[h % len(nbrs)]
                path += ">" + cur
                hops += 1
            out[(start, w)] = (hops, path)
    return out


def test_random_walks_match_hash_replay(spark):
    e = [("a", "b", 1), ("b", "c", 1), ("b", "a", 1), ("c", "a", 1),
         ("c", "d", 1)]  # d is a dead end
    edges = spark.createDataFrame(
        e, "src_host string, dst_host string, n_links long")
    got = {(r["start"], r["walker"]): (r["hops"], r["path"])
           for r in op_lg.random_walks(edges).collect()}
    assert got == _walk_replay(e)
    # the dead-end node emits a zero-hop walk, never an error
    assert got[("d", 0)] == (0, "d")


def test_random_walks_deterministic_across_partitionings(spark):
    e = [(f"h{i % 9}", f"h{(i * 3 + 1) % 9}", 1) for i in range(40)] \
        + [(f"h{i % 9}", f"h{(i * 5 + 2) % 9}", 1) for i in range(40)]
    edges = spark.createDataFrame(
        e, "src_host string, dst_host string, n_links long")
    a = {tuple(r) for r in op_lg.random_walks(edges.repartition(7)).collect()}
    b = {tuple(r) for r in op_lg.random_walks(edges.coalesce(1)).collect()}
    assert a == b
    # walkers actually diverge: at least one start has differing paths
    paths = {}
    for start, walker, hops, path in a:
        paths.setdefault(start, set()).add(path)
    assert any(len(v) > 1 for v in paths.values())


# ---------------------------------------------------------------------------
# multi-source BFS crawl depth
# ---------------------------------------------------------------------------


def test_crawl_depth_layers_and_unreachable(spark):
    e = [("s", "a", 1), ("a", "b", 1), ("b", "c", 1),
         ("x", "y", 1)]  # x,y disconnected from the seed
    edges = spark.createDataFrame(
        e, "src_host string, dst_host string, n_links long")
    seeds = spark.createDataFrame([("s",)], "host string")
    got = {r["host"]: (r["depth"], r["would_change"])
           for r in op_lg.crawl_depth(edges, seeds).collect()}
    assert got == {"s": (0, 0), "a": (1, 0), "b": (2, 0), "c": (3, 0),
                   "x": (-1, 0), "y": (-1, 0)}


def test_crawl_depth_multi_seed_min_and_invariance(spark):
    e = [("s1", "m", 1), ("s2", "n", 1), ("n", "m", 1), ("m", "far", 1)]
    edges = spark.createDataFrame(
        e, "src_host string, dst_host string, n_links long")
    seeds = spark.createDataFrame([("s1",), ("s2",)], "host string")
    got = {r["host"]: r["depth"]
           for r in op_lg.crawl_depth(edges, seeds).collect()}
    assert got == {"s1": 0, "s2": 0, "m": 1, "n": 1, "far": 2}
    a = {tuple(r) for r in
         op_lg.crawl_depth(edges.repartition(5), seeds).collect()}
    b = {tuple(r) for r in
         op_lg.crawl_depth(edges.coalesce(1), seeds).collect()}
    assert a == b


# ---------------------------------------------------------------------------
# label propagation communities
# ---------------------------------------------------------------------------


def _w_edges(spark, triples):
    return spark.createDataFrame(
        [(a, b, w) for a, b, w in triples],
        "src_host string, dst_host string, n_links long")


def test_lpa_two_triangles_weak_bridge(spark):
    """Two dense triangles joined by one weak edge settle into two
    communities whose labels are each triangle's max host."""
    edges = _w_edges(spark, [
        ("a1", "a2", 3), ("a2", "a3", 3), ("a1", "a3", 3),
        ("b1", "b2", 3), ("b2", "b3", 3), ("b1", "b3", 3),
        ("a3", "b1", 1)])
    rows = {r["host"]: (r["label"], r["community_size"])
            for r in op_lg.label_propagation(edges, rounds=6).collect()}
    labels = {h: l for h, (l, _) in rows.items()}
    assert len({labels["a1"], labels["a2"], labels["a3"]}) == 1
    assert len({labels["b1"], labels["b2"], labels["b3"]}) == 1
    assert labels["a1"] != labels["b1"]
    assert all(sz == 3 for _, sz in rows.values())


def test_lpa_weight_beats_count_and_tie_is_max_label(spark):
    """One heavy edge outvotes two light ones; equal weights pick the
    lexicographically greatest neighbor label (max(struct) tie rule)."""
    # x's neighbors: h (w=5) vs l1,l2 (w=1 each) -> round 1 label = h
    edges = _w_edges(spark, [
        ("x", "h", 5), ("x", "l1", 1), ("x", "l2", 1)])
    one = {r["host"]: r["label"]
           for r in op_lg.label_propagation(edges, rounds=1).collect()}
    assert one["x"] == "h"
    # tie: equal weight to "m" and "z" -> greatest label wins
    tie = _w_edges(spark, [("x", "m", 2), ("x", "z", 2)])
    one = {r["host"]: r["label"]
           for r in op_lg.label_propagation(tie, rounds=1).collect()}
    assert one["x"] == "z"


def test_lpa_partitioning_invariant_and_directed_weights_merge(spark):
    """Same labelling on any input partitioning; a->b and b->a weights
    sum into one undirected edge (3+4=7 beats the w=5 competitor)."""
    edges = _w_edges(spark, [
        ("a", "b", 3), ("b", "a", 4), ("a", "c", 5),
        ("d", "a", 1), ("c", "d", 2)])
    r1 = {tuple(r) for r in
          op_lg.label_propagation(edges.repartition(7), rounds=3).collect()}
    r2 = {tuple(r) for r in
          op_lg.label_propagation(edges.coalesce(1), rounds=3).collect()}
    assert r1 == r2
    one = {r["host"]: r["label"]
           for r in op_lg.label_propagation(edges, rounds=1).collect()}
    # a's neighbor votes: b has 3+4=7 (directions merged), c has 5, d has 1
    # -> b wins; unmerged directed weights (max 4) would have picked c
    assert one["a"] == "b"


# ---------------------------------------------------------------------------
# strongly connected components (Orzan coloring)
# ---------------------------------------------------------------------------


def test_scc_two_cycles_one_bridge(spark):
    """c<->d and a<->b with a one-way bridge d->a: two SCCs, and the
    {a,b} component needs the SECOND outer iteration (its round-1 color
    root d is not in its SCC) — the peel-and-repeat mechanics."""
    edges = _core_edges(spark, [
        ("a", "b"), ("b", "a"), ("c", "d"), ("d", "c"), ("d", "a")])
    rows = {r["host"]: (r["scc"], r["scc_size"], r["assigned"])
            for r in op_lg.strongly_connected(edges).collect()}
    assert rows["c"] == ("d", 2, 1) and rows["d"] == ("d", 2, 1)
    assert rows["a"] == ("b", 2, 1) and rows["b"] == ("b", 2, 1)
    one = {r["host"]: r["assigned"]
           for r in op_lg.strongly_connected(edges, outer=1).collect()}
    assert one["c"] == 1 and one["d"] == 1
    assert one["a"] == 0 and one["b"] == 0      # needs outer round 2


def test_scc_dag_is_all_singletons(spark):
    edges = _core_edges(spark, [
        ("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")])
    rows = {r["host"]: (r["scc"], r["scc_size"])
            for r in op_lg.strongly_connected(edges).collect()}
    assert all(scc == h and sz == 1 for h, (scc, sz) in rows.items())


def test_scc_cycle_with_tail_and_partitioning_invariance(spark):
    """3-cycle plus in/out tails: the cycle is one SCC labelled by its
    max member; tails are singletons.  Identical on any partitioning."""
    edges = _core_edges(spark, [
        ("p", "x"), ("x", "y"), ("y", "z"), ("z", "x"), ("y", "q")])
    rows = {r["host"]: (r["scc"], r["scc_size"])
            for r in op_lg.strongly_connected(edges).collect()}
    assert rows["x"] == ("z", 3) and rows["y"] == ("z", 3) \
        and rows["z"] == ("z", 3)
    assert rows["p"] == ("p", 1) and rows["q"] == ("q", 1)
    a = {tuple(r) for r in
         op_lg.strongly_connected(edges.repartition(7)).collect()}
    b = {tuple(r) for r in
         op_lg.strongly_connected(edges.coalesce(1)).collect()}
    assert a == b


def test_bowtie_classification(spark):
    """Hand bowtie: core 3-cycle {c1,c2,c3}, IN node i -> core, core ->
    OUT node o, tendril t -> i (reaches core through i => 'in'),
    disconnected x<->y (smaller SCC, neither reaches nor is reached =>
    'other')."""
    edges = _core_edges(spark, [
        ("c1", "c2"), ("c2", "c3"), ("c3", "c1"), ("i", "c1"),
        ("c2", "o"), ("t", "i"), ("x", "y"), ("y", "x")])
    scc = op_lg.strongly_connected(edges)
    rows = {r["host"]: (r["cls"], r["out_depth"], r["in_depth"])
            for r in op_lg.bowtie_classes(edges, scc).collect()}
    assert rows["c1"] == ("core", 0, 0) and rows["c2"] == ("core", 0, 0)
    assert rows["c3"] == ("core", 0, 0)
    assert rows["i"] == ("in", -1, 1)
    assert rows["t"] == ("in", -1, 2)
    assert rows["o"] == ("out", 1, -1)
    assert rows["x"][0] == "other" and rows["y"][0] == "other"


def test_scc_long_cycle_beyond_budget_stays_unassigned(spark):
    """A 12-cycle under an EXPLICIT 6-round color budget must NOT come
    back as 12 'assigned' singletons: the root-soundness gate (color
    stability) leaves every node honestly unassigned.  The default
    adaptive mode runs the coloring to its fixpoint and resolves the
    one true SCC labelled by its max member."""
    cyc = [(f"h{i:02d}", f"h{(i + 1) % 12:02d}") for i in range(12)]
    edges = _core_edges(spark, cyc)
    short = {r["host"]: (r["scc"], r["assigned"])
             for r in op_lg.strongly_connected(edges,
                                               rounds=6).collect()}
    assert all(v == ("", 0) for v in short.values()), short
    full = {r["host"]: (r["scc"], r["scc_size"], r["assigned"])
            for r in op_lg.strongly_connected(edges).collect()}
    assert all(v == ("h11", 12, 1) for v in full.values()), full


# ---------------------------------------------------------------------------
# personalized PageRank (TrustRank family)
# ---------------------------------------------------------------------------


def test_ppr_mass_stays_near_seeds(spark):
    """Teleport mass restarts only at the seed: a host unreachable from
    it scores exactly 0; trust decays with distance; the seed outranks
    everything (single-outlink chain)."""
    edges = _w_edges(spark, [
        ("s", "a", 1), ("a", "b", 1), ("x", "y", 1)])
    seeds = spark.createDataFrame([("s",)], "host string")
    got = {r["host"]: (r["rank"], r["is_seed"])
           for r in op_lg.personalized_pagerank(edges, seeds).collect()}
    assert got["s"][1] == 1 and got["a"][1] == 0
    assert got["s"][0] > got["a"][0] > got["b"][0] > 0
    assert got["x"][0] == 0 and got["y"][0] == 0   # no trust path


def test_ppr_hand_computed_and_invariant(spark):
    """One iteration, one seed s -> a (w=1): rank(s)=base=150,
    rank(a) = (85 * 1000 * 1) div (100 * 1) = 850; identical on any
    partitioning."""
    edges = _w_edges(spark, [("s", "a", 1)])
    seeds = spark.createDataFrame([("s",)], "host string")
    got = {r["host"]: r["rank"] for r in op_lg.personalized_pagerank(
        edges, seeds, iterations=1, scale=1000).collect()}
    assert got == {"s": 150, "a": 850}
    r1 = {tuple(r) for r in op_lg.personalized_pagerank(
        edges.repartition(5), seeds).collect()}
    r2 = {tuple(r) for r in op_lg.personalized_pagerank(
        edges.coalesce(1), seeds).collect()}
    assert r1 == r2

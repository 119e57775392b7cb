"""Exact per-component fixpoint solvers for the link-graph operators.

Every iterative link-graph recurrence in ``operators/linkgraph.py``
(integer PageRank, personalized PageRank, multi-source BFS, k-core
h-index, synchronous LPA, FB-trim/coloring SCC) reads only a node's
in/out-neighbors, so the global synchronous trajectory decomposes
EXACTLY over weakly-connected components: round ``t`` of node ``v``
depends only on ``v``'s component.  That makes "solve each component to
its true fixpoint inside one Arrow batch" produce bit-identical values
to the global synchronous rounds — while replacing O(rounds) shuffle
stages with ONE ``applyInPandas`` shuffle.  Components too large for a
task fall back to the synchronous DataFrame loops in
``operators/linkgraph.py`` (the 100-TB giant-component path).

Each solver mirrors its DataFrame recurrence EXACTLY (same integer
floor division, same max/min/lexicographic tie-breaks), runs either a
caller-fixed round count (the unrolled-oracle replay contract) or
adaptively until the state is pointwise stable, capped.  Pointwise
stability of a deterministic synchronous iteration implies idempotence,
so a DuckDB oracle unrolled to the CAP reproduces the converged values
exactly — that is the bridge that lets a data-dependent realized round
count still be hash-gated by a static SQL oracle.

All integer math uses Python ints (arbitrary precision) or int64 numpy;
the values produced stay inside int64 by the same bounds the DataFrame
operators document, so both engines agree bit-for-bit.

Solvers return, per node, the final value(s) plus:

* ``would_change`` — 1 iff one more synchronous round would change the
  node (0 everywhere iff the returned state IS the fixpoint);
* ``last_chg``     — the last 1-based round in which the node changed
  (0 if it never moved).  ``max(last_chg)`` over all nodes is the
  realized round count, which the unrolled oracle recomputes from its
  round CTEs — both engines must agree on it exactly.
"""

from __future__ import annotations

INF = 1 << 62


def _nodes_of(edges) -> list:
    s = set()
    for u, v, *_ in edges:
        s.add(u)
        s.add(v)
    return sorted(s)


def pagerank_component(edges, scale: int, fixed_rounds=None,
                       max_rounds: int = 96, seeds=None):
    """Integer (personalized) PageRank on one component's edge list
    ``[(src, dst, w), ...]``: the exact recurrence of
    ``operators/linkgraph.pagerank`` —

        r_0(v) = scale[*is_seed];
        r_{t+1}(v) = floor(15*scale/100)[*is_seed]
                     + sum over in-edges (u,v):
                         (85 * r_t(u) * w) div (100 * W(u)).

    ``seeds=None`` is plain PageRank (every node seeds); a seed set
    restricts both the initial mass and the teleport base term
    (``operators/linkgraph.personalized_pagerank``).

    The round loop is numpy-vectorized (per-edge floor division + an
    ``np.add.at`` scatter), which is what makes the gate-limit
    component (hundreds of thousands of edges x ~100 rounds) a
    sub-second task instead of minutes of Python loops.  int64 safety
    is GUARDED, not assumed: total rank mass is bounded by
    n*scale + rounds*n*base only loosely, so each round checks the
    worst per-edge product 85 * max_rank * max_w against 2^62 and
    falls back to exact Python integers for the remainder if it could
    overflow — both paths compute the identical recurrence.

    Returns {node: (rank, would_change, last_chg)}."""
    nodes = _nodes_of(edges)
    base = (15 * scale) // 100
    is_seed = (dict.fromkeys(nodes, 1) if seeds is None
               else {n: (1 if n in seeds else 0) for n in nodes})

    idx = {n: i for i, n in enumerate(nodes)}
    n_nodes = len(nodes)
    try:
        import numpy as np
    except Exception:  # pragma: no cover - numpy ships in this env
        np = None

    rounds = fixed_rounds if fixed_rounds is not None else max_rounds

    if np is not None and edges:
        src = np.fromiter((idx[u] for u, v, w in edges), dtype=np.int64)
        dst = np.fromiter((idx[v] for u, v, w in edges), dtype=np.int64)
        wts = np.fromiter((int(w) for u, v, w in edges), dtype=np.int64)
        outw = np.zeros(n_nodes, dtype=np.int64)
        np.add.at(outw, src, wts)
        denom = 100 * outw[src]
        seed_v = np.fromiter((is_seed[n] for n in nodes), dtype=np.int64)
        rank = seed_v * scale
        last = np.zeros(n_nodes, dtype=np.int64)
        max_w = int(wts.max())

        def np_step(cur):
            # two overflow guards: the per-edge product 85*rank*w and
            # the per-node sum (bounded by 0.85 * total mass) must both
            # stay inside int64, else bail to exact Python integers
            if (int(cur.max()) > ((1 << 62) // (85 * max(max_w, 1)))
                    or int(cur.sum()) >= (1 << 62)):
                return None
            contrib = (85 * cur[src] * wts) // denom
            acc = np.zeros(n_nodes, dtype=np.int64)
            np.add.at(acc, dst, contrib)
            return seed_v * base + acc

        t = 0
        overflow = False
        while t < rounds:
            nxt = np_step(rank)
            if nxt is None:
                overflow = True
                break
            t += 1
            moved = nxt != rank
            last[moved] = t
            rank = nxt
            if fixed_rounds is None and not moved.any():
                break
        if not overflow:
            probe = np_step(rank)
            if probe is not None:
                return {n: (int(rank[i]), int(probe[i] != rank[i]),
                            int(last[i]))
                        for n, i in idx.items()}
        # fall through to the exact-int path, resuming from the
        # current state (identical values so far, by construction)
        rank_d = {n: int(rank[i]) for n, i in idx.items()}
        last_d = {n: int(last[i]) for n, i in idx.items()}
        start_t = t
    else:
        rank_d = {n: is_seed[n] * scale for n in nodes}
        last_d = dict.fromkeys(nodes, 0)
        start_t = 0

    outw_d: dict = {}
    for u, v, w in edges:
        outw_d[u] = outw_d.get(u, 0) + w

    def step(cur):
        acc = dict.fromkeys(nodes, 0)
        for u, v, w in edges:
            acc[v] += (85 * cur[u] * w) // (100 * outw_d[u])
        return {n: is_seed[n] * base + acc[n] for n in nodes}

    rank = rank_d
    last_chg = last_d
    for t in range(start_t + 1, rounds + 1):
        nxt = step(rank)
        changed = False
        for n in nodes:
            if nxt[n] != rank[n]:
                last_chg[n] = t
                changed = True
        rank = nxt
        if fixed_rounds is None and not changed:
            break
    probe = step(rank)
    return {n: (rank[n], int(probe[n] != rank[n]), last_chg[n])
            for n in nodes}


def bfs_component(edges, seeds, fixed_rounds=None, max_rounds: int = 32):
    """Multi-source BFS min-propagation on one component — the exact
    recurrence of ``operators/linkgraph.crawl_depth``:
    d_0 = 0 on seeds else INF; d_{t+1}(v) = min(d_t(v),
    1 + min over in-edges (u,v) of d_t(u)).

    Returns {node: (depth_or_-1, would_change, last_chg)}."""
    nodes = _nodes_of(edges)
    d = {n: (0 if n in seeds else INF) for n in nodes}
    last_chg = dict.fromkeys(nodes, 0)

    def step(cur):
        nxt = dict(cur)
        for u, v, *_ in edges:
            if cur[u] + 1 < nxt[v]:
                nxt[v] = cur[u] + 1
        return nxt

    rounds = fixed_rounds if fixed_rounds is not None else max_rounds
    for t in range(1, rounds + 1):
        nxt = step(d)
        changed = False
        for n in nodes:
            if nxt[n] != d[n]:
                last_chg[n] = t
                changed = True
        d = nxt
        if fixed_rounds is None and not changed:
            break
    probe = step(d)
    return {n: ((-1 if d[n] >= INF else d[n]),
                int(probe[n] < d[n]), last_chg[n]) for n in nodes}


def coreness_component(edges, fixed_rounds=None, max_rounds: int = 32):
    """k-core h-index iteration on one component — the exact recurrence
    of ``operators/linkgraph.coreness`` over the undirected simple
    graph: c_0 = deg; c_{t+1}(v) = min(c_t(v), h-index of neighbor
    estimates).

    Returns {node: (degree, coreness, would_change, last_chg)}."""
    und = set()
    for u, v, *_ in edges:
        if u != v:
            und.add((min(u, v), max(u, v)))
    adj: dict = {}
    for a, b in und:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    nodes = sorted(adj)
    deg = {n: len(adj[n]) for n in nodes}
    c = dict(deg)
    last_chg = dict.fromkeys(nodes, 0)

    def step(cur):
        nxt = {}
        for v in nodes:
            vals = sorted((cur[u] for u in adj[v]), reverse=True)
            h = 0
            for rk, val in enumerate(vals, start=1):
                m = rk if rk < val else val
                if m > h:
                    h = m
            nxt[v] = cur[v] if cur[v] < h else h
        return nxt

    rounds = fixed_rounds if fixed_rounds is not None else max_rounds
    for t in range(1, rounds + 1):
        nxt = step(c)
        changed = False
        for n in nodes:
            if nxt[n] != c[n]:
                last_chg[n] = t
                changed = True
        c = nxt
        if fixed_rounds is None and not changed:
            break
    probe = step(c)
    return {n: (deg[n], c[n], int(probe[n] < c[n]), last_chg[n])
            for n in nodes}


def lpa_component(edges, fixed_rounds=None, max_rounds: int = 24):
    """Synchronous weighted label propagation on one component — the
    exact recurrence of ``operators/linkgraph.label_propagation``:
    l_0(v) = v; l_{t+1}(v) = argmax over neighbor labels of total
    incident weight, ties to the lexicographically GREATEST label
    (``max(struct(weight, label))``).  Directed weights merge into one
    undirected edge first; self-loops drop.

    Synchronous LPA can 2-cycle on bipartite structures, so the
    adaptive mode may exhaust ``max_rounds`` without stabilizing —
    surfaced honestly through ``would_change``.

    Returns {node: (label, would_change, last_chg)}."""
    wund: dict = {}
    for u, v, w in edges:
        if u != v:
            k = (min(u, v), max(u, v))
            wund[k] = wund.get(k, 0) + w
    adj: dict = {}
    for (a, b), w in wund.items():
        adj.setdefault(a, {})[b] = adj.setdefault(a, {}).get(b, 0) + w
        adj.setdefault(b, {})[a] = adj.setdefault(b, {}).get(a, 0) + w
    nodes = _nodes_of(edges)
    lab = {n: n for n in nodes}
    last_chg = dict.fromkeys(nodes, 0)

    def step(cur):
        nxt = {}
        for v in nodes:
            nbrs = adj.get(v)
            if not nbrs:
                nxt[v] = cur[v]
                continue
            votes: dict = {}
            for u, w in nbrs.items():
                lu = cur[u]
                votes[lu] = votes.get(lu, 0) + w
            nxt[v] = max(votes.items(), key=lambda kv: (kv[1], kv[0]))[0]
        return nxt

    rounds = fixed_rounds if fixed_rounds is not None else max_rounds
    for t in range(1, rounds + 1):
        nxt = step(lab)
        changed = False
        for n in nodes:
            if nxt[n] != lab[n]:
                last_chg[n] = t
                changed = True
        lab = nxt
        if fixed_rounds is None and not changed:
            break
    probe = step(lab)
    return {n: (lab[n], int(probe[n] != lab[n]), last_chg[n])
            for n in nodes}


def walks_component(edges, walks_per_node: int = 2, length: int = 6):
    """Deterministic DeepWalk corpus on one component — the exact draw
    sequence of ``operators/linkgraph.random_walks``: step ``t`` of
    walker ``w`` at node ``v`` moves to
    ``sorted(out_nbrs(v))[md5(v:w:t) mod deg]``; dead ends stop
    extending but the walk keeps its remaining draw slots (a later
    revisit of a branching node draws with the original step index).

    Returns {(start, walker): (hops, path)}."""
    import hashlib

    adj: dict = {}
    for u, v, *_ in edges:
        adj.setdefault(u, set()).add(v)
    adj = {u: sorted(vs) for u, vs in adj.items()}
    out = {}
    for start in _nodes_of(edges):
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


def scc_component(edges, outer: int = 3, color_rounds=None,
                  max_color_rounds: int = 24, member_rounds=None,
                  max_member_rounds: int = 24, trim_rounds=None,
                  max_trim_rounds: int = 6):
    """FB-trim + Orzan-coloring SCC on one component — the exact
    phase-by-phase recurrence of
    ``operators/linkgraph.strongly_connected``:

    per outer round over still-unassigned nodes: (0) trim nodes lacking
    an in- or out-edge in the active subgraph (each its own singleton),
    (1) forward-propagate the MAX node id; roots (color == self) are
    declared only on a STABLE coloring (the soundness gate — with the
    adaptive default the coloring always converges, max-propagation
    being monotone on a finite set, so the gate never truncates), (2)
    backward-propagate membership from each root r along edges (u, v)
    with scc(v) = r and color(u) = r.

    ``color_rounds``/``member_rounds``/``trim_rounds`` fix the phase
    budgets exactly (the oracle-replay contract; the gate then applies
    per component — components are independent sub-problems, cf. the
    global gate of the synchronous fallback which cannot see component
    boundaries); ``None`` runs each phase adaptively to stability,
    capped at the ``max_*`` values the unrolled oracle replays.

    Returns {node: (scc_label_or_empty, assigned)}."""
    nodes = set(_nodes_of(edges))
    de = {(u, v) for u, v, *_ in edges if u != v}
    scc: dict = {}

    for _ in range(outer):
        active = {n for n in nodes if n not in scc}
        if not active:
            break
        start = set(active)
        ae = {(u, v) for (u, v) in de if u in active and v in active}
        t_rounds = (trim_rounds if trim_rounds is not None
                    else max_trim_rounds)
        for _t in range(t_rounds):
            has_o = {u for u, v in ae}
            has_i = {v for u, v in ae}
            nactive = {n for n in active if n in has_o and n in has_i}
            ae = {(u, v) for (u, v) in ae
                  if u in nactive and v in nactive}
            stable = nactive == active
            active = nactive
            if trim_rounds is None and stable:
                break
        trimmed = start - active

        color = {n: n for n in active}

        def color_step(cur):
            prop: dict = {}
            for u, v in ae:
                cu = cur[u]
                if v not in prop or cu > prop[v]:
                    prop[v] = cu
            return {n: (prop[n] if n in prop and prop[n] > cur[n]
                        else cur[n]) for n in active}

        c_rounds = (color_rounds if color_rounds is not None
                    else max_color_rounds)
        for _t in range(c_rounds):
            nxt = color_step(color)
            stable = nxt == color
            color = nxt
            if color_rounds is None and stable:
                break
        unstable = color_step(color) != color

        mem = {n: (n if (not unstable and color[n] == n) else None)
               for n in active}

        def member_step(cur):
            prop: dict = {}
            for u, v in ae:
                sv = cur.get(v)
                if sv is not None and color[u] == sv:
                    if u not in prop or sv > prop[u]:
                        prop[u] = sv
            return {n: (cur[n] if cur[n] is not None else prop.get(n))
                    for n in active}

        m_rounds = (member_rounds if member_rounds is not None
                    else max_member_rounds)
        for _t in range(m_rounds):
            nxt = member_step(mem)
            stable = nxt == mem
            mem = nxt
            if member_rounds is None and stable:
                break

        for n in active:
            if mem[n] is not None:
                scc[n] = mem[n]
        for n in trimmed:
            scc[n] = n

    return {n: ((scc[n], 1) if n in scc else ("", 0)) for n in nodes}


def hits_graph(edges, scale: int, fixed_iterations=None,
               max_iterations: int = 32):
    """Integer max-normalized HITS on a WHOLE edge list
    ``[(src, dst, w), ...]`` — the exact recurrence of
    ``operators/linkgraph.hits``:

        a_t(v) = sum over in-edges (u,v): w * h_{t-1}(u),
                 rescaled to (a * scale) div max(a)   (0 if max <= 0);
        h_t(u) = sum over out-edges (u,v): w * a_t(v), rescaled the same.

    Unlike the component solvers above, HITS does NOT decompose over
    weakly-connected components: the max-rescale divisor spans every
    node, so the only sound local solve is the whole graph in one task
    — which is exactly what ``operators/linkgraph.hits`` routes here
    when the total edge count fits the group gate.

    ``h_0 = a_0 = scale`` for every node (``a_0`` feeds only the
    round-1 change detection, never the recurrence).  With
    ``fixed_iterations=None`` the loop stops at the first iteration
    where no node's (hub, auth) pair moved — pointwise stability of the
    deterministic synchronous iteration implies idempotence, so the
    early stop is value-identical to running the full cap (the bridge
    that lets a static cap-unrolled SQL oracle hash-match the adaptive
    run).  The integer max-rescale can 2-cycle on adversarial graphs;
    the cap bounds that case and ``would_change`` keeps the truncation
    visible.

    numpy-vectorized with overflow GUARDS, not assumptions: half-step
    sums are bounded by total_w * scale and the rescale product by
    max_raw * scale; either bound past 2^62 falls back to exact Python
    integers for that half-step (identical values — Python ints are the
    reference arithmetic).

    Returns {node: (hub, auth, would_change, last_chg)}."""
    nodes = _nodes_of(edges)
    if not nodes:
        return {}
    idx = {n: i for i, n in enumerate(nodes)}
    n_nodes = len(nodes)
    try:
        import numpy as np
    except Exception:  # pragma: no cover - numpy ships in this env
        np = None

    iterations = (fixed_iterations if fixed_iterations is not None
                  else max_iterations)

    if np is None or not edges:
        hub = dict.fromkeys(nodes, scale)
        auth = dict.fromkeys(nodes, scale)
        last = dict.fromkeys(nodes, 0)

        def py_iter(h):
            raw = dict.fromkeys(nodes, 0)
            for u, v, w in edges:
                raw[v] += w * h[u]
            mx = max(raw.values()) if raw else 0
            a = {n: (raw[n] * scale // mx if mx > 0 else 0)
                 for n in nodes}
            raw = dict.fromkeys(nodes, 0)
            for u, v, w in edges:
                raw[u] += w * a[v]
            mx = max(raw.values()) if raw else 0
            h2 = {n: (raw[n] * scale // mx if mx > 0 else 0)
                  for n in nodes}
            return h2, a

        for t in range(1, iterations + 1):
            nh, na = py_iter(hub)
            changed = False
            for n in nodes:
                if nh[n] != hub[n] or na[n] != auth[n]:
                    last[n] = t
                    changed = True
            hub, auth = nh, na
            if fixed_iterations is None and not changed:
                break
        ph, pa = py_iter(hub)
        return {n: (hub[n], auth[n],
                    int(ph[n] != hub[n] or pa[n] != auth[n]), last[n])
                for n in nodes}

    src = np.fromiter((idx[u] for u, v, w in edges), dtype=np.int64)
    dst = np.fromiter((idx[v] for u, v, w in edges), dtype=np.int64)
    wts = np.fromiter((int(w) for u, v, w in edges), dtype=np.int64)
    total_w = int(wts.sum())
    hub = np.full(n_nodes, scale, dtype=np.int64)
    auth = np.full(n_nodes, scale, dtype=np.int64)
    last = np.zeros(n_nodes, dtype=np.int64)

    def half_step(cur, take, give):
        """One half-step: raw[give] = sum(w * cur[take]) then rescale."""
        if total_w * int(cur.max(initial=0)) < (1 << 62):
            prod = wts * cur[take]
            raw = np.zeros(n_nodes, dtype=np.int64)
            np.add.at(raw, give, prod)
            mx = int(raw.max(initial=0))
            if mx <= 0:
                return np.zeros(n_nodes, dtype=np.int64)
            if mx * scale < (1 << 62):
                return raw * scale // mx
            return np.fromiter(
                ((int(r) * scale) // mx for r in raw),
                dtype=np.int64, count=n_nodes)
        # exact-integer fallback (same recurrence, unbounded ints)
        raw_d = [0] * n_nodes
        cl = cur.tolist()
        for e in range(len(wts)):
            raw_d[give[e]] += int(wts[e]) * cl[take[e]]
        mx = max(raw_d) if raw_d else 0
        if mx <= 0:
            return np.zeros(n_nodes, dtype=np.int64)
        return np.fromiter(((r * scale) // mx for r in raw_d),
                           dtype=np.int64, count=n_nodes)

    def one_iteration(h):
        a = half_step(h, src, dst)
        h2 = half_step(a, dst, src)
        return h2, a

    for t in range(1, iterations + 1):
        nh, na = one_iteration(hub)
        moved = (nh != hub) | (na != auth)
        last[moved] = t
        hub, auth = nh, na
        if fixed_iterations is None and not moved.any():
            break
    ph, pa = one_iteration(hub)
    wc = (ph != hub) | (pa != auth)
    return {n: (int(hub[i]), int(auth[i]), int(wc[i]), int(last[i]))
            for n, i in idx.items()}

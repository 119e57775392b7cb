"""Host-level web link graph: outlink extraction + integer PageRank.

The reference (SylvainWT/docling-graph) has no crawl-graph notion — its
graph is entity/chunk-level per document.  At Common-Crawl scale the host
link graph is a first-class training-pipeline artifact (crawl
prioritization, spam/host quality scoring, PageRank-weighted sampling), so
the graft adds it over the same `(url, html)` pages relation the extraction
pipeline consumes.

Scale/determinism design:

* outlink extraction is one JVM `regexp_extract_all` over the payload in
  the scan stage — no Python row path, no shuffle;
* the host graph is a single map-side-combinable groupBy;
* PageRank uses INTEGER arithmetic only (ranks scaled by `scale`, per-edge
  contributions via exact integer division).  Integer addition is
  commutative and associative, so the result is bit-identical regardless of
  partitioning, task order, or engine — which is what lets a DuckDB oracle
  hash-match a distributed Spark run exactly (floating-point PageRank sums
  in shuffle order cannot guarantee that).  The deliberate simplifications
  vs textbook PageRank: dangling-host mass is dropped (not redistributed)
  and ranks are un-normalized — rank ORDER is unaffected, which is what the
  downstream consumers (sampling weights, crawl priorities) use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# attrs may precede href; the mandatory SPACE right before `href=` stops
# the greedy prefix from latching onto attribute names that merely END in
# href (data-href, ng-href) — '<a href' itself matches with empty prefix
HREF_RE = r'<a[^>]* href="([^"]+)"'
HOST_RE = r"^https?://([^/]+)"

PAGERANK_SCALE = 1_000_000
PAGERANK_ITERATIONS = 5
DAMPING_NUM, DAMPING_DEN = 85, 100  # d = 0.85 as an exact rational


# whole <a ...> open tag carrying rel=nofollow (SEO-standard link-juice
# opt-out, also used for ugc/sponsored links since 2019): any rel value
# containing the nofollow token
NOFOLLOW_TAG_RE = '<a[^>]* rel="[^"]*nofollow[^"]*"[^>]*>'


def extract_outlinks(pages: DataFrame, url_col: str = "url",
                     html_col: str = "html",
                     skip_nofollow: bool = False) -> DataFrame:
    """(url, html) -> (src_host, dst_host, href), one row per anchor.

    Relative hrefs resolve to the page's own host; absolute http(s) hrefs
    to their own host.  Non-HTML payloads (e.g. PDF bytes) simply match no
    anchors.  Entirely codegen'd: decode + regexp + explode in the scan
    stage.

    ``skip_nofollow=True`` drops anchors whose tag carries
    rel="...nofollow..." BEFORE href extraction (crawl-graph convention:
    nofollow links carry no endorsement, so they should not contribute
    PageRank mass or anchor pairs) — implemented by blanking the matching
    tags with one extra regexp_replace, still scan-stage codegen."""
    src_host = F.regexp_extract(F.col(url_col), HOST_RE, 1)
    payload = f"CAST({html_col} AS STRING)"
    if skip_nofollow:
        payload = (f"regexp_replace({payload}, "
                   f"'{NOFOLLOW_TAG_RE}', '<a>')")
    hrefs = F.expr(f"regexp_extract_all({payload}, '{HREF_RE}', 1)")
    out = pages.select(src_host.alias("src_host"),
                       F.explode(hrefs).alias("href"))
    dst = F.when(
        F.col("href").rlike("^https?://"),
        F.regexp_extract("href", HOST_RE, 1),
    ).otherwise(F.col("src_host"))
    return out.select("src_host", dst.alias("dst_host"), "href")


def host_link_graph(pages: DataFrame, url_col: str = "url",
                    html_col: str = "html",
                    skip_nofollow: bool = False) -> DataFrame:
    """Weighted host-level edge list: (src_host, dst_host, n_links)."""
    return (
        extract_outlinks(pages, url_col, html_col, skip_nofollow)
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("n_links"))
    )


def pagerank(edges: DataFrame, src: str = "src_host",
             dst: str = "dst_host", weight: str = "n_links",
             iterations: int = PAGERANK_ITERATIONS,
             scale: int = PAGERANK_SCALE) -> DataFrame:
    """Integer weighted PageRank over a host edge list: (host, rank).

    r_0(v) = scale;
    r_{t+1}(v) = floor(15*scale/100)
                 + sum over in-edges (u,v):
                     (85 * r_t(u) * w(u,v)) div (100 * W(u))
    with W(u) = total out-weight of u.  All operations are int64-exact
    (hosts*scale plus per-term products stay far below 2^63 for any
    realistic host count), so the fixpoint trajectory is engine- and
    partitioning-independent.

    Shuffle accounting per iteration: one join of the edge list against the
    rank relation on src (sort-merge or broadcast if the rank side is small
    — at host granularity even the full web is ~10^8 rows, broadcastable
    per-executor at ~1 GB, and Spark's AQE picks that up) plus one groupBy
    dst with map-side partial sums.  For iteration counts beyond ~10, break
    lineage every few rounds with localCheckpoint, as
    operators/dedup.connected_components does."""
    base = (15 * scale) // DAMPING_DEN
    nodes = (
        edges.select(F.col(src).alias("host"))
        .unionByName(edges.select(F.col(dst).alias("host")))
        .distinct()
    )
    outw = edges.groupBy(src).agg(F.sum(weight).alias("out_w"))
    ew = (
        edges.join(outw, src)
        .select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"),
                F.col(weight).alias("e_w"), "out_w")
    )
    ranks = nodes.select("host", F.lit(scale).cast("long").alias("rank"))
    for _ in range(iterations):
        contrib = (
            ew.join(ranks, ew.e_src == ranks.host)
            .select(
                F.col("e_dst").alias("host"),
                F.expr(f"({DAMPING_NUM} * rank * e_w) div "
                       f"({DAMPING_DEN} * out_w)").alias("c"),
            )
            .groupBy("host")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            nodes.join(contrib, "host", "left")
            .select(
                "host",
                (F.lit(base) + F.coalesce("c", F.lit(0))).alias("rank"),
            )
        )
    return ranks


ANCHOR_RE = r'<a[^>]* href="([^"]+)"[^>]*>([^<]*)</a>'


def anchor_text_pairs(pages: DataFrame, url_col: str = "url",
                      html_col: str = "html") -> DataFrame:
    """(url, html) -> (src_host, dst_host, href, anchor): one row per
    anchor with its link text — the (anchor text, target) pair corpus used
    for retrieval/query-doc training data at crawl scale.

    Same scan-stage shape as extract_outlinks: two group extractions of the
    one anchor regex, zipped positionally (the i-th href belongs to the
    i-th anchor text), then exploded.  No Python row path, no shuffle."""
    src_host = F.regexp_extract(F.col(url_col), HOST_RE, 1)
    html_s = F.expr(f"CAST({html_col} AS STRING)")
    hrefs = F.regexp_extract_all(html_s, F.lit(ANCHOR_RE), 1)
    texts = F.regexp_extract_all(html_s, F.lit(ANCHOR_RE), 2)
    z = pages.select(
        src_host.alias("src_host"),
        F.explode(F.arrays_zip(hrefs.alias("href"),
                               texts.alias("anchor"))).alias("z"),
    )
    dst = F.when(
        F.col("z.href").rlike("^https?://"),
        F.regexp_extract(F.col("z.href"), HOST_RE, 1),
    ).otherwise(F.col("src_host"))
    return z.select("src_host", dst.alias("dst_host"),
                    F.col("z.href").alias("href"),
                    F.col("z.anchor").alias("anchor"))


def url_template(href: Column) -> Column:
    """Collapse a URL to its path template: scheme+host stripped, query/
    fragment dropped, every digit run replaced by ``{n}`` — so
    ``/doc/123`` and ``/doc/9`` both map to ``/doc/{n}``.  The standard
    crawl-frontier URL-pattern key (template mining: spot calendar/
    session/pagination traps, cap per-pattern fetch budgets, cluster
    near-identical CMS pages before content dedup).

    Every step is a portable regexp (Java ∩ RE2 ∩ DuckDB 'g'-flag
    semantics) so the oracle runs the literal same derivation.  Pure
    codegen expressions — no parse_url dialect edge cases."""
    path = F.regexp_replace(href, r"^https?://[^/]*", "")
    path = F.regexp_replace(path, r"[?#].*$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    return F.regexp_replace(path, "[0-9]+", "{n}")


def url_pattern_stats(pages: DataFrame, url_col: str = "url",
                      html_col: str = "html") -> DataFrame:
    """Per-template rollup over every outlink href in the corpus:
    (template, n_links, n_distinct_urls).  One scan-stage regexp pass +
    one map-side-combinable groupBy on the (low-cardinality) template —
    the shuffle moves templates, not URLs, so a 10^12-page crawl reduces
    to thousands of rows before the exchange."""
    html_s = F.expr(f"CAST({html_col} AS STRING)")
    links = pages.select(
        F.explode(F.regexp_extract_all(html_s, F.lit(HREF_RE), 1))
        .alias("href"))
    return (
        links.select(url_template(F.col("href")).alias("template"), "href")
        .groupBy("template")
        .agg(F.count("*").alias("n_links"),
             F.countDistinct("href").alias("n_distinct_urls"))
    )


def resolve_aliases(edges: DataFrame, alias_col: str = "alias",
                    target_col: str = "target",
                    max_rounds: int = 16) -> DataFrame:
    """Resolve url-alias chains to their final root: (alias, root, hops).

    ``edges`` is a function relation — exactly one outgoing (alias →
    target) row per alias — built from the two aliasing signals every
    crawl pipeline must fold before dedup/extraction: HTTP redirects
    (3xx chains recorded at fetch time) and ``<link rel="canonical">``
    declarations.  Chains are multi-hop (a redirects to b, b declares c
    canonical); consumers need the FINAL root per alias, or duplicate
    clusters silently split.

    Algorithm: pointer jumping / path doubling on the alias map itself —
    each round joins the mapping against its own targets and jumps
    ``target -> target's target``, halving remaining chain depth, so a
    depth-D chain resolves in ceil(log2 D) rounds of ONE equi-join each
    (same doubling idea as `dedup.connected_components`, but on a
    functional graph, so no min-label semilattice is needed).  The
    convergence probe (`any row jumped this round?`) is an O(1)-row
    driver aggregate; the relation itself never collects.  Cycles cannot
    occur in redirect/canonical data that decreases toward a root, but a
    malformed cycle is still safe: hops hits the round budget and the
    loop exits (no infinite recursion, unlike a recursive resolver).
    Lineage is truncated per round with an eager localCheckpoint — the
    standard Spark iterative-loop pattern.
    """
    carry = [c for c in edges.columns if c not in (alias_col, target_col)]
    m = edges.select(
        F.col(alias_col).alias("alias"), F.col(target_col).alias("target"),
        F.lit(1).cast("long").alias("hops"), *carry,
    ).localCheckpoint(eager=True)
    for _ in range(max_rounds):
        nxt = m.select(F.col("alias").alias("t_alias"),
                       F.col("target").alias("t_target"),
                       F.col("hops").alias("t_hops"))
        jumped = (
            m.join(nxt, m.target == nxt.t_alias, "left")
            .select(
                "alias",
                F.coalesce("t_target", "target").alias("target"),
                (F.col("hops") + F.coalesce("t_hops", F.lit(0)))
                .alias("hops"),
                F.col("t_alias").isNotNull().alias("_jumped"),
                *carry,
            )
            .localCheckpoint(eager=True)
        )
        n_jumped = jumped.agg(
            F.sum(F.col("_jumped").cast("long"))).collect()[0][0] or 0
        m = jumped.drop("_jumped")
        if n_jumped == 0:
            break
    return m.select("alias", F.col("target").alias("root"), "hops", *carry)


def alias_resolution_stats(edges: DataFrame,
                           kind_col: str = "kind") -> DataFrame:
    """1-row summary gating the resolved alias map by content: edge/kind
    counts, root/chain-depth accounting, and the 48-bit md5-prefix
    checksum over every (alias -> root) pair — order-independent, so no
    global sort on either engine.  The edge kind rides through the
    resolution as a carried column, so the whole summary is ONE
    aggregation over the resolved map — no second pass over the edge
    relation and no 1-row crossJoin in the plan."""
    resolved = resolve_aliases(edges)
    pair_md5 = F.md5(F.concat(F.col("alias"), F.lit("->"), F.col("root"))
                     .cast("binary"))
    return resolved.agg(
        F.count("*").cast("long").alias("n_edges"),
        F.sum((F.col(kind_col) == "redirect").cast("long"))
        .cast("long").alias("n_redirect"),
        F.sum((F.col(kind_col) == "canonical").cast("long"))
        .cast("long").alias("n_canonical"),
        F.countDistinct("root").cast("long").alias("n_roots"),
        F.max("hops").cast("long").alias("max_hops"),
        F.sum("hops").cast("long").alias("sum_hops"),
        F.sum(F.conv(F.substring(pair_md5, 1, 12), 16, 10).cast("long"))
        .cast("long").alias("map_checksum"),
    )


# ---------------------------------------------------------------------------
# Triangle counting / clustering coefficient (degree-ordered orientation)
#
# The classic skew hazard: counting wedges at a hub host (every site links
# to cdn.example or a search portal) enumerates deg² pairs — 10^10 wedges
# for a 10^5-degree hub.  The standard fix (Suri-Vassilvitskii / Cohen)
# orients every undirected edge from the LOWER (degree, host) endpoint to
# the higher, then counts wedges only between out-neighbors: out-degree is
# bounded by O(sqrt(m)), so a hub generates wedges only toward the few
# hosts even better-connected than itself.  Everything is equi-joins and
# integer counts — deterministic across engines and partitionings.
# ---------------------------------------------------------------------------


def _oriented_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """(u, v) per undirected simple edge, directed low→high (deg, host)."""
    und = (edges.filter(F.col(src) != F.col(dst))
           .select(F.least(src, dst).alias("a"),
                   F.greatest(src, dst).alias("b"))
           .distinct())
    deg = (und.select(F.col("a").alias("h"))
           .unionAll(und.select(F.col("b").alias("h")))
           .groupBy("h").agg(F.count("*").cast("long").alias("d")))
    e = (und.join(deg.select(F.col("h").alias("a"),
                             F.col("d").alias("da")), "a")
         .join(deg.select(F.col("h").alias("b"),
                          F.col("d").alias("db")), "b"))
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    return e.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"))


def triangle_stats(edges: DataFrame, src: str = "src_host",
                   dst: str = "dst_host") -> DataFrame:
    """Per-host triangle participation: (host, degree, n_triangles).

    Every host with at least one undirected edge gets a row (zero
    triangles included), so the relation doubles as the degree table the
    local clustering coefficient 2T/(d(d-1)) reads off exactly — T and d
    are returned as exact integers rather than an IEEE ratio.

    Triangle identity: each triangle (u,v,w) has exactly one wedge at its
    (deg, host)-minimal vertex whose closing edge is oriented v→w, so the
    wedge⋈edge equi-join counts every triangle exactly once."""
    ori = _oriented_edges(edges, src, dst)
    deg = (ori.select(F.col("u").alias("h"))
           .unionAll(ori.select(F.col("v").alias("h")))
           .groupBy("h").agg(F.count("*").cast("long").alias("degree")))
    o2 = ori.select(F.col("u").alias("u2"), F.col("v").alias("w"))
    wedges = ori.join(o2, F.col("u") == F.col("u2")) \
        .filter(F.col("v") != F.col("w")).select("u", "v", "w")
    closing = ori.select(F.col("u").alias("v"), F.col("v").alias("w"))
    tri = wedges.join(closing, ["v", "w"])
    tri_counts = (tri.select(F.explode(F.array("u", "v", "w")).alias("h"))
                  .groupBy("h").agg(F.count("*").cast("long")
                                    .alias("n_triangles")))
    return (deg.join(tri_counts, "h", "left")
            .select(F.col("h").alias("host"), "degree",
                    F.coalesce(F.col("n_triangles"), F.lit(0))
                    .cast("long").alias("n_triangles")))


HITS_ITERATIONS = 4
HITS_SCALE = 1_000_000


def hits(edges: DataFrame, src: str = "src_host", dst: str = "dst_host",
         weight: str = "n_links", iterations: int = HITS_ITERATIONS,
         scale: int = HITS_SCALE) -> DataFrame:
    """Integer HITS hubs/authorities over a weighted host edge list:
    (host, hub, auth).

    Kleinberg's mutual-reinforcement recurrence with the L2 normalization
    replaced by exact max-normalization so the trajectory is
    engine/partitioning-independent integer math:

        a_t(v) = sum over in-edges (u,v): w(u,v) * h_{t-1}(u),
                 then rescaled to (a * scale) div max(a);
        h_t(u) = sum over out-edges (u,v): w(u,v) * a_t(v),
                 then rescaled the same way.

    Scores live in [0, scale]; the raw half-step sums are widened to
    decimal(38,0) before the `* scale div max` rescale, so no realistic
    corpus overflows (raw <= total-link-weight * scale ~ 10^18, and the
    widened product 10^24 stays inside 38 digits).

    Shuffle accounting per half-step: one join of the edge list against
    the score relation (host-level — broadcastable even for the full web)
    plus one groupBy with map-side partial sums; the max is a scalar
    aggregate collected to the driver (O(1) rows).  Same shape as
    :func:`pagerank`, which the reference (single-document, no corpus
    graph) has no analogue of."""
    nodes = (
        edges.select(F.col(src).alias("host"))
        .unionByName(edges.select(F.col(dst).alias("host")))
        .distinct()
    ).localCheckpoint(eager=False)
    ew = edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"),
                      F.col(weight).cast("long").alias("e_w"))

    def _normalize(raw: DataFrame, col: str) -> DataFrame:
        # pin the raw half-step: the max() scalar job and the rescale
        # join would otherwise each re-run the whole iteration chain
        # (quadratic recompute across 2*iterations half-steps)
        raw = raw.localCheckpoint(eager=False)
        mx = raw.agg(F.max("_raw")).collect()[0][0] or 0
        if mx <= 0:
            return nodes.select(
                "host", F.lit(0).cast("long").alias(col))
        return (
            nodes.join(raw, "host", "left")
            .select("host", F.expr(
                f"CAST(coalesce(_raw, 0) AS DECIMAL(38,0)) "
                f"* {int(scale)} div {int(mx)}")
                .cast("long").alias(col))
        )

    hub = nodes.select("host", F.lit(scale).cast("long").alias("hub"))
    auth = None
    for _ in range(iterations):
        a_raw = (
            ew.join(hub, ew.e_src == hub.host)
            .select(F.col("e_dst").alias("host"),
                    (F.col("e_w") * F.col("hub")).alias("_c"))
            .groupBy("host").agg(F.sum("_c").alias("_raw"))
        )
        auth = _normalize(a_raw, "auth")
        h_raw = (
            ew.join(auth, ew.e_dst == auth.host)
            .select(F.col("e_src").alias("host"),
                    (F.col("e_w") * F.col("auth")).alias("_c"))
            .groupBy("host").agg(F.sum("_c").alias("_raw"))
        )
        hub = _normalize(h_raw, "hub")
    return hub.join(auth, "host")


CORENESS_ROUNDS = 8


def coreness(edges: DataFrame, src: str = "src_host",
             dst: str = "dst_host",
             rounds: int = CORENESS_ROUNDS) -> DataFrame:
    """k-core decomposition of the undirected simple host graph:
    (host, degree, coreness, would_change) after ``rounds`` synchronous
    h-index iterations (Montresor et al. 2011, "Distributed k-core
    decomposition").

    c_0(v) = deg(v);  c_{t+1}(v) = min(c_t(v), H_t(v)) with H_t(v) the
    h-index of the neighbor estimates {c_t(u)} — the largest h such that
    at least h neighbors have estimate >= h.  The sequence decreases
    monotonically to the exact coreness; synchronous rounds make every
    intermediate state engine- and partitioning-independent, so a fixed
    round count is exactly replayable by the SQL oracle.  ``would_change``
    (1 iff one more round would lower the estimate) is emitted per node:
    its sum is the convergence gate both engines must agree on — 0 means
    the returned values ARE the coreness.

    The h-index needs no per-node list: with neighbor estimates ranked
    descending per node, H = max(min(rank, estimate)).  Per-round cost is
    one join of the (u,v)+(v,u) adjacency against the estimates plus one
    per-node window bounded by degree (a web-scale hub makes a heavy but
    partition-local group; the adjacency itself is never materialized per
    round beyond the narrow (node, neighbor) projection).  Lineage is cut
    per round with localCheckpoint, as :func:`pagerank` does."""
    und = (edges.filter(F.col(src) != F.col(dst))
           .select(F.least(src, dst).alias("a"),
                   F.greatest(src, dst).alias("b"))
           .distinct())
    adj = (und.select(F.col("a").alias("node"), F.col("b").alias("nbr"))
           .unionAll(und.select(F.col("b").alias("node"),
                                F.col("a").alias("nbr")))
           ).localCheckpoint(eager=False)
    deg = adj.groupBy("node").agg(F.count("*").cast("long").alias("degree"))
    est = deg.select("node", F.col("degree").alias("c"))

    def h_round(cur: DataFrame) -> DataFrame:
        nb = (adj.join(cur.withColumnRenamed("node", "nbr")
                       .withColumnRenamed("c", "nc"), "nbr")
              .select("node", "nc"))
        w = Window.partitionBy("node").orderBy(F.desc("nc"), "nc")
        h = (nb.withColumn("rn", F.row_number().over(w))
             .groupBy("node")
             .agg(F.max(F.least(F.col("rn").cast("long"), F.col("nc")))
                  .alias("h")))
        return (cur.join(h, "node")
                .select("node", F.least("c", "h").alias("c")))

    for _ in range(rounds):
        est = h_round(est).localCheckpoint(eager=False)
    nxt = h_round(est)
    return (deg.join(est, "node")
            .join(nxt.withColumnRenamed("c", "c_next"), "node")
            .select(F.col("node").alias("host"), "degree",
                    F.col("c").alias("coreness"),
                    (F.col("c_next") < F.col("c")).cast("long")
                    .alias("would_change")))


WALKS_PER_NODE = 2
WALK_LENGTH = 6


def random_walks(edges: DataFrame, src: str = "src_host",
                 dst: str = "dst_host",
                 walks_per_node: int = WALKS_PER_NODE,
                 length: int = WALK_LENGTH) -> DataFrame:
    """DeepWalk-style walk corpus over the directed host graph:
    (start, walker, hops, path) — the training sentences for
    node-embedding models (Perozzi et al. 2014), made DETERMINISTIC:
    step t of walker w at node v moves to
    ``nbrs(v)[ md5(v:w:t) mod deg(v) ]`` with the neighbor list
    array_sort'ed, so any engine, partitioning or restart reproduces the
    identical corpus (replayable by a SQL oracle; the paper's uniform
    sampling is replaced by a fixed hash draw — the same corpus coverage
    properties, none of the nondeterminism).

    Plan shape per step: one equi-join of the frontier against the
    adjacency-array relation (host-level — broadcastable for the full
    web) + pure projections; dead ends simply stop extending.  Lineage is
    cut per step with localCheckpoint."""
    adj = (edges.groupBy(src)
           .agg(F.array_sort(F.collect_set(F.col(dst))).alias("_nbrs"))
           .withColumnRenamed(src, "_adj_src")
           ).localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col(src).alias("host"))
        .unionByName(edges.select(F.col(dst).alias("host")))
        .distinct()
    )
    walkers = F.explode(F.array(
        *[F.lit(i) for i in range(walks_per_node)])).alias("walker")
    frontier = nodes.select(
        F.col("host").alias("start"), walkers,
        F.col("host").alias("_cur"), F.col("host").alias("path"),
        F.lit(0).cast("long").alias("hops"),
    )
    for step in range(length):
        h = F.conv(F.substring(F.md5(F.concat(
            F.col("_cur"), F.lit(":"), F.col("walker").cast("string"),
            F.lit(":"), F.lit(step).cast("string")).cast("binary")),
            1, 12), 16, 10).cast("long")
        nxt = F.when(
            F.size("_nbrs") > 0,
            F.element_at("_nbrs", (h % F.size("_nbrs") + 1).cast("int")))
        frontier = (
            frontier.join(adj, frontier._cur == adj._adj_src, "left")
            .select(
                "start", "walker",
                F.coalesce(nxt, F.col("_cur")).alias("_cur"),
                F.when(nxt.isNotNull(),
                       F.concat(F.col("path"), F.lit(">"), nxt))
                .otherwise(F.col("path")).alias("path"),
                (F.col("hops")
                 + nxt.isNotNull().cast("long")).alias("hops"),
            )
        ).localCheckpoint(eager=False)
    return frontier.select("start", "walker", "hops", "path")


BFS_ROUNDS = 8


def crawl_depth(edges: DataFrame, seeds: DataFrame,
                src: str = "src_host", dst: str = "dst_host",
                rounds: int = BFS_ROUNDS) -> DataFrame:
    """Multi-source BFS over the directed host graph: (host, depth,
    would_change) after ``rounds`` synchronous min-propagation steps —
    the crawl-frontier distance from a seed list (how many link hops a
    crawler starting at the seeds needs to discover each host).

    d_0 = 0 on seeds; d_{t+1}(v) = min(d_t(v), 1 + min over in-edges
    (u,v) of d_t(u)).  Depth is exact once converged (BFS layers only
    shrink monotonically); unreached hosts report -1.  ``would_change``
    per node gates convergence exactly as :func:`coreness` does.  Plan
    per round: one equi-join of the edge list against the depth relation
    + a min groupBy (map-side combinable); lineage cut per round.  At
    web scale a frontier-delta formulation sends only newly-reached
    nodes through the join; the synchronous full-relation form here is
    the oracle-exact reference shape."""
    nodes = (
        edges.select(F.col(src).alias("host"))
        .unionByName(edges.select(F.col(dst).alias("host")))
        .distinct()
    )
    inf = (1 << 62)
    seed_rel = seeds.select(F.col(seeds.columns[0]).alias("host")) \
        .withColumn("_d", F.lit(0).cast("long"))
    dist = (nodes.join(seed_rel, "host", "left")
            .select("host", F.coalesce("_d", F.lit(inf)).alias("d"))
            ).localCheckpoint(eager=False)
    ew = edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))

    def step(cur: DataFrame) -> DataFrame:
        prop = (ew.join(cur.withColumnRenamed("host", "e_src")
                        .withColumnRenamed("d", "sd"), "e_src")
                .groupBy(F.col("e_dst").alias("host"))
                .agg(F.min(F.col("sd") + 1).alias("pd")))
        return (cur.join(prop, "host", "left")
                .select("host", F.least(
                    "d", F.coalesce("pd", F.lit(inf))).alias("d")))

    for _ in range(rounds):
        dist = step(dist).localCheckpoint(eager=False)
    nxt = step(dist)
    return (dist.join(nxt.withColumnRenamed("d", "dn"), "host")
            .select("host",
                    F.when(F.col("d") >= inf, F.lit(-1))
                    .otherwise(F.col("d")).cast("long").alias("depth"),
                    (F.col("dn") < F.col("d")).cast("long")
                    .alias("would_change")))


LPA_ROUNDS = 4


def label_propagation(edges: DataFrame, src: str = "src_host",
                      dst: str = "dst_host", weight: str = "n_links",
                      rounds: int = LPA_ROUNDS) -> DataFrame:
    """Deterministic weighted label propagation (Raghavan et al. 2007)
    over the undirected host graph: (host, label, community_size,
    would_change) after ``rounds`` synchronous update steps — the
    community/site-cluster signal a crawl pipeline uses for mirror-farm
    detection and community-stratified sampling.

    l_0(v) = v; l_{t+1}(v) = the neighbor label with the largest total
    incident edge weight, ties broken by the lexicographically GREATEST
    label — the argmax is then exactly ``max(struct(weight, label))``,
    a single algebraic aggregate both engines order identically, so the
    full label trajectory is engine- and partitioning-independent and a
    fixed round count is replayable by an unrolled SQL oracle (classic
    asynchronous LPA is order-dependent and unreproducible by design;
    the synchronous variant trades convergence speed for determinism).
    Labels are host strings, so no label-id dictionary is needed.

    Per-round plan: one equi-join of the symmetrized weighted adjacency
    against the label relation, a map-side-combinable (node, label)
    weight sum, and one max(struct) groupBy — no windows, no per-node
    lists; a web-scale hub costs one heavy but combinable group.
    Lineage is cut per round with localCheckpoint as :func:`pagerank`
    does.  Synchronous LPA can 2-cycle on bipartite structures, so a
    fixed round budget (not a convergence loop) is the contract;
    ``would_change`` reports per-node stability of the returned
    labelling and both engines must agree on it exactly."""
    und = (edges.filter(F.col(src) != F.col(dst))
           .select(F.least(src, dst).alias("a"),
                   F.greatest(src, dst).alias("b"),
                   F.col(weight).cast("long").alias("w"))
           .groupBy("a", "b").agg(F.sum("w").alias("w")))
    adj = (und.select(F.col("a").alias("node"), F.col("b").alias("nbr"),
                      "w")
           .unionAll(und.select(F.col("b").alias("node"),
                                F.col("a").alias("nbr"), "w"))
           ).localCheckpoint(eager=False)
    nodes = (edges.select(F.col(src).alias("node"))
             .unionByName(edges.select(F.col(dst).alias("node")))
             .distinct())
    labels = nodes.select("node", F.col("node").alias("label"))

    def one_round(cur: DataFrame) -> DataFrame:
        votes = (adj.join(cur.withColumnRenamed("node", "nbr")
                          .withColumnRenamed("label", "nlbl"), "nbr")
                 .groupBy("node", "nlbl")
                 .agg(F.sum("w").alias("s"))
                 .groupBy("node")
                 .agg(F.max(F.struct(F.col("s"), F.col("nlbl")))
                      .alias("m"))
                 .select("node", F.col("m.nlbl").alias("new_label")))
        return (cur.join(votes, "node", "left")
                .select("node",
                        F.coalesce("new_label", "label").alias("label")))

    for _ in range(rounds):
        labels = one_round(labels).localCheckpoint(eager=False)
    nxt = one_round(labels)
    sizes = labels.groupBy("label").agg(
        F.count("*").cast("long").alias("community_size"))
    return (labels.join(nxt.withColumnRenamed("label", "next_label"),
                        "node")
            .join(sizes, "label")
            .select(F.col("node").alias("host"), "label",
                    "community_size",
                    (F.col("next_label") != F.col("label")).cast("long")
                    .alias("would_change")))


SCC_OUTER = 2
SCC_PROP = 6
SCC_TRIM = 2


def strongly_connected(edges: DataFrame, src: str = "src_host",
                       dst: str = "dst_host", outer: int = SCC_OUTER,
                       rounds: int = SCC_PROP,
                       trim_rounds: int = SCC_TRIM) -> DataFrame:
    """Strongly connected components of the directed host graph:
    (host, scc, scc_size, assigned) — the decomposition behind the
    classic web "bowtie" analysis (Broder et al. 2000): the giant CORE
    is the largest SCC of the crawl graph, and mutually-unreachable
    host clusters never belong to one component.

    The FB-trim / coloring family (Orzan; McLendon et al.), made
    synchronous and deterministic.  Each outer iteration (over
    still-unassigned nodes):
      0. TRIM: ``trim_rounds`` synchronous rounds remove every node
         with zero in-degree or zero out-degree in the active subgraph
         — each is its own singleton SCC.  Without this phase a
         tendril CHAIN peels one node per outer round (coloring's
         known worst case); with it, chains drain at one layer per
         trim round and the expensive coloring runs only on the
         cycle-rich remainder — exactly why production FB-style SCC
         codes always trim first;
      1. forward-propagates the MAX node id along edges for ``rounds``
         synchronous steps — color(v) = greatest active node that
         reaches v; a node whose color is itself is a root.  Root
         declaration is only sound on a CONVERGED coloring, so it is
         gated on global color stability (one extra round; colors are
         monotone, so pointwise stability everywhere == fixpoint): an
         unconverged iteration assigns nothing and its nodes stay
         honestly unassigned instead of surfacing as bogus singleton
         components;
      2. backward-propagates SCC membership from every root
         simultaneously: an edge (u, v) admits u into root r's
         component iff scc(v) = r AND color(u) = r (u reaches r
         through v, and r reaches u by the color certificate) — so
         members are exactly {v : color(v) = r and v reaches r}, the
         textbook invariant.
    All updates are min/max/coalesce folds over equi-joins — no
    windows, no per-node sets — and every intermediate state is a pure
    function of the round number, so a fixed (outer x rounds) budget is
    replayed exactly by the unrolled SQL oracle.  Nodes still
    unassigned after the budget are reported with scc='' (counted, not
    hidden); per-round localCheckpoint cuts lineage as the other
    iterative operators do.

    Plan per step: one equi-join of the active edge list against the
    label relation + one map-side-combinable max groupBy.  At web scale
    the active subgraph SHRINKS each outer round (the giant core and
    every singleton root resolve in round one), which is what makes the
    FB/coloring family the standard distributed SCC approach."""
    nodes = (edges.select(F.col(src).alias("node"))
             .unionByName(edges.select(F.col(dst).alias("node")))
             .distinct())
    de = (edges.filter(F.col(src) != F.col(dst))
          .select(F.col(src).alias("u"), F.col(dst).alias("v"))
          .distinct()).localCheckpoint(eager=False)
    state = nodes.select("node", F.lit(None).cast("string").alias("scc"))

    for _ in range(outer):
        active = state.filter(F.col("scc").isNull()).select("node")
        start = active
        ae = (de.join(active.withColumnRenamed("node", "u"), "u",
                      "left_semi")
              .join(active.withColumnRenamed("node", "v"), "v",
                    "left_semi")).localCheckpoint(eager=False)
        for _ in range(trim_rounds):
            # nodes with BOTH an out- and an in-edge in the active
            # subgraph, in one flag groupBy; the survivor set IS the
            # next active relation (isolated actives have no flags,
            # so they trim without a separate degree pass)
            flags = (ae.select(F.col("u").alias("node"),
                               F.lit(1).alias("o"), F.lit(0).alias("i"))
                     .unionAll(ae.select(F.col("v").alias("node"),
                                         F.lit(0).alias("o"),
                                         F.lit(1).alias("i")))
                     .groupBy("node")
                     .agg(F.max("o").alias("o"), F.max("i").alias("i")))
            active = (flags.filter((F.col("o") == 1)
                                   & (F.col("i") == 1)).select("node")
                      ).localCheckpoint(eager=False)
            ae = (ae.join(active.withColumnRenamed("node", "u"), "u",
                          "left_semi")
                  .join(active.withColumnRenamed("node", "v"), "v",
                        "left_semi")).localCheckpoint(eager=False)
        trimmed = start.join(active, "node", "left_anti") \
            .select("node", F.col("node").alias("scc2"))
        color = active.select("node", F.col("node").alias("color"))

        def color_round(cur: DataFrame) -> DataFrame:
            prop = (ae.join(cur.withColumnRenamed("node", "u")
                            .withColumnRenamed("color", "uc"), "u")
                    .groupBy(F.col("v").alias("node"))
                    .agg(F.max("uc").alias("pc")))
            return (cur.join(prop, "node", "left")
                    .select("node",
                            F.greatest("color",
                                       F.coalesce("pc", "color"))
                            .alias("color")))

        for _ in range(rounds):
            color = color_round(color).localCheckpoint(eager=False)
        # SOUNDNESS GATE: a root declared from a truncated coloring is
        # wrong (a 12-cycle under a 6-round budget would yield 12
        # "assigned" singletons).  The color certificates themselves
        # are one-sided-sound (color(v)=r proves r reaches v; the
        # backward pass proves v reaches r), so the only unsound step
        # is root declaration — gate it on GLOBAL color stability: one
        # extra round, and if ANY color still grows (colors are
        # monotone), assign nothing this outer iteration and leave the
        # remainder honestly unassigned.
        nxt_color = color_round(color)
        conv = (color.join(nxt_color.withColumnRenamed("color", "c2"),
                           "node")
                .agg(F.coalesce(
                    F.max((F.col("c2") > F.col("color")).cast("long")),
                    F.lit(0)).alias("unstable")))
        mem = (color.crossJoin(F.broadcast(conv))
               .select("node",
                       F.when((F.col("unstable") == 0)
                              & (F.col("color") == F.col("node")),
                              F.col("node")).alias("scc2")))
        # annotate each active edge with its source's final color ONCE
        # — every membership round then needs just one join + groupBy
        aec = (ae.join(color.select(F.col("node").alias("u"),
                                    F.col("color").alias("uc")), "u")
               ).localCheckpoint(eager=False)
        for _ in range(rounds):
            prop = (aec.join(mem.filter(F.col("scc2").isNotNull())
                             .select(F.col("node").alias("v"), "scc2"),
                             "v")
                    .filter(F.col("scc2") == F.col("uc"))
                    .groupBy(F.col("u").alias("node"))
                    .agg(F.max("scc2").alias("pscc")))
            mem = (mem.join(prop, "node", "left")
                   .select("node", F.coalesce("scc2", "pscc")
                           .alias("scc2"))
                   ).localCheckpoint(eager=False)
        assigned_new = (mem.filter(F.col("scc2").isNotNull())
                        .select("node", "scc2")
                        .unionByName(trimmed))
        state = (state.join(assigned_new, "node", "left")
                 .select("node", F.coalesce("scc", "scc2").alias("scc"))
                 ).localCheckpoint(eager=False)

    sizes = (state.filter(F.col("scc").isNotNull())
             .groupBy("scc")
             .agg(F.count("*").cast("long").alias("scc_size")))
    return (state.join(sizes, "scc", "left")
            .select(F.col("node").alias("host"),
                    F.coalesce("scc", F.lit("")).alias("scc"),
                    F.coalesce("scc_size", F.lit(0)).cast("long")
                    .alias("scc_size"),
                    F.col("scc").isNotNull().cast("long")
                    .alias("assigned")))


def bowtie_classes(edges: DataFrame, scc: DataFrame,
                   src: str = "src_host", dst: str = "dst_host",
                   rounds: int = BFS_ROUNDS) -> DataFrame:
    """Broder bowtie taxonomy of the crawl graph (host, cls, out_depth,
    in_depth): CORE = the largest SCC, OUT = reachable FROM the core,
    IN = reaches INTO the core, other = tendrils/tubes/disconnected —
    the Broder et al. 2000 "Graph structure in the Web" decomposition
    that drives crawl-frontier budgeting (OUT pages can't lead back;
    IN pages are entry points).

    The core is picked deterministically from the ``scc`` relation
    (largest scc_size, ties to the greatest label — one max(struct)
    aggregate); both reachability sides REUSE :func:`crawl_depth`'s
    synchronous min-propagation with the core as the seed set, forward
    on the edge list for OUT and on the reversed edge list for IN, so
    depths are exact within the round budget and every value is
    engine-replayable.  A node marked both in and out but not core can
    only arise from a truncated SCC budget and is labelled 'inout'
    honestly rather than folded into a side."""
    best = (scc.filter(F.col("assigned") == 1)
            .select("scc", "scc_size").distinct()
            .agg(F.max(F.struct(F.col("scc_size"), F.col("scc")))
                 .alias("m"))
            .select(F.col("m.scc").alias("core_label")))
    tagged = scc.crossJoin(F.broadcast(best))
    seeds = tagged.filter(F.col("scc") == F.col("core_label")) \
        .select("host")
    out_d = crawl_depth(edges, seeds, src=src, dst=dst, rounds=rounds) \
        .select("host", F.col("depth").alias("out_depth"))
    rev = edges.select(F.col(dst).alias(src), F.col(src).alias(dst))
    in_d = crawl_depth(rev, seeds, src=src, dst=dst, rounds=rounds) \
        .select("host", F.col("depth").alias("in_depth"))
    cls = (F.when(F.col("scc") == F.col("core_label"), "core")
           .when((F.col("out_depth") >= 0) & (F.col("in_depth") >= 0),
                 "inout")
           .when(F.col("in_depth") >= 0, "in")
           .when(F.col("out_depth") >= 0, "out")
           .otherwise("other"))
    return (tagged.join(out_d, "host").join(in_d, "host")
            .select("host", cls.alias("cls"), "out_depth", "in_depth"))


def personalized_pagerank(edges: DataFrame, seeds: DataFrame,
                          src: str = "src_host", dst: str = "dst_host",
                          weight: str = "n_links",
                          iterations: int = PAGERANK_ITERATIONS,
                          scale: int = PAGERANK_SCALE) -> DataFrame:
    """Integer personalized PageRank: (host, rank, is_seed) — teleport
    mass restarts ONLY at the seed set, so rank measures proximity to
    the seeds through the link graph.  This is the TrustRank family
    (Gyongyi et al. 2004): seeded at vetted hosts it demotes spam
    (spam farms get link mass but no trust mass); seeded at a topic
    hub it prioritizes a focused crawl frontier.

    Same exact-int64 recurrence as :func:`pagerank` with the base term
    restricted to seeds: r_0(v) = scale·[v ∈ seeds];
    r_{t+1}(v) = floor(15·scale/100)·[v ∈ seeds]
                 + Σ_{(u,v)} (85 · r_t(u) · w(u,v)) div (100 · W(u)).
    Hosts unreachable from the seeds stay at exactly 0 — the honest
    "no trust path" signal.  Identical shuffle accounting to pagerank:
    one join + one map-side-combinable groupBy per iteration; the seed
    flag rides the node relation, no extra shuffle."""
    base = (15 * scale) // DAMPING_DEN
    nodes = (edges.select(F.col(src).alias("host"))
             .unionByName(edges.select(F.col(dst).alias("host")))
             .distinct())
    seed_rel = seeds.select(F.col(seeds.columns[0]).alias("host")) \
        .withColumn("_s", F.lit(1))
    nb = (nodes.join(seed_rel, "host", "left")
          .select("host", F.coalesce("_s", F.lit(0)).cast("long")
                  .alias("is_seed"))).localCheckpoint(eager=False)
    outw = edges.groupBy(src).agg(F.sum(weight).alias("out_w"))
    ew = (edges.join(outw, src)
          .select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"),
                  F.col(weight).alias("e_w"), "out_w"))
    ranks = nb.select(
        "host", (F.col("is_seed") * scale).cast("long").alias("rank"))
    for _ in range(iterations):
        contrib = (
            ew.join(ranks, ew.e_src == ranks.host)
            .select(F.col("e_dst").alias("host"),
                    F.expr(f"({DAMPING_NUM} * rank * e_w) div "
                           f"({DAMPING_DEN} * out_w)").alias("c"))
            .groupBy("host").agg(F.sum("c").alias("c")))
        ranks = (nb.join(contrib, "host", "left")
                 .select("host",
                         (F.col("is_seed") * base
                          + F.coalesce("c", F.lit(0))).cast("long")
                         .alias("rank")))
    return ranks.join(nb, "host").select("host", "rank", "is_seed")

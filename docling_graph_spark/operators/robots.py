"""Crawl-politeness operators: robots.txt rules as a relation, URL gating.

Scale shape: the rules relation is host-keyed and tiny relative to the
page corpus (a few rules per host), so the gate is a BROADCAST equi-join
on host followed by a prefix filter and one aggregate — the page side
never shuffles.  Rule precedence (RFC 9309 longest-match, Allow wins
ties) is evaluated relationally with ``max(struct(path_len, is_allow))``
— a map-side-combinable aggregate, not a window.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RULES_SCHEMA = "host string, agent string, kind string, path string"


def robots_rules(robots: DataFrame, host_col: str = "host",
                 text_col: str = "robots_txt") -> DataFrame:
    """(host, robots_txt) -> one row per parsed rule
    (host, agent, kind, path); Sitemap directives come back as
    agent='' kind='sitemap' rows so one pass serves both consumers."""
    from ..kernels.robots import parse_robots

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hosts, agents, kinds, paths = [], [], [], []
            for host, text in zip(pdf[host_col], pdf[text_col]):
                parsed = parse_robots(text or "")
                for r in parsed.rules:
                    hosts.append(host)
                    agents.append(r.agent)
                    kinds.append(r.kind)
                    paths.append(r.path)
                for s in parsed.sitemaps:
                    hosts.append(host)
                    agents.append("")
                    kinds.append("sitemap")
                    paths.append(s)
            yield pd.DataFrame({"host": hosts, "agent": agents,
                                "kind": kinds, "path": paths})

    return robots.select(
        F.col(host_col).alias(host_col), F.col(text_col).alias(text_col)
    ).mapInPandas(parse, RULES_SCHEMA)


def gate_urls(pages: DataFrame, rules: DataFrame,
              agent: str = "*", url_col: str = "url") -> DataFrame:
    """(url, host, path, allowed) for every input page.

    The governing group is resolved relationally: exact-agent rules if the
    host has any, else the ``*`` group (RFC 9309 §2.2.1) — computed as a
    per-host flag on the (tiny) rules side before the broadcast join.
    Precedence is ``max(struct(len(path), is_allow))`` over the prefix
    matches; urls with no matching rule (or hosts with no robots at all)
    are allowed.
    """
    a = agent.lower()
    # group selection considers ANY rule row for the exact agent (incl.
    # crawl_delay) — a matched group makes the wildcard group inapplicable
    # even if it contains no allow/disallow rules (RFC 9309 §2.2.1; same
    # semantics as kernels.robots.rules_for_agent)
    has_exact = (
        rules.filter(F.col("agent") == a)
        .select("host").distinct()
        .withColumn("_exact", F.lit(True))
    )
    governing = (
        rules.filter(F.col("kind").isin("allow", "disallow"))
        .filter(F.col("agent").isin(a, "*"))
        .join(has_exact, "host", "left")
        .filter(
            F.when(F.col("_exact").isNotNull(), F.col("agent") == a)
            .otherwise(F.col("agent") == "*"))
        .select("host", "kind", "path")
    )
    host = F.try_parse_url(F.col(url_col), F.lit("HOST"))
    path = F.coalesce(F.try_parse_url(F.col(url_col), F.lit("PATH")),
                      F.lit("/"))
    # group on a per-row id, not the url: duplicate urls (re-crawl /
    # multi-snapshot corpora) must each come back with their own verdict
    keyed = pages.select(
        F.monotonically_increasing_id().alias("_rid"),
        F.col(url_col).alias("url"), host.alias("host"),
        path.alias("path"))
    # ONE broadcast left join (non-matching urls survive with null rule)
    # + ONE partial-aggregated groupBy: the page corpus shuffles once,
    # carrying one row per input page after map-side combine
    rside = (governing.withColumnRenamed("path", "path_rule")
             .withColumnRenamed("host", "rhost"))
    joined = keyed.join(
        F.broadcast(rside),
        (F.col("host") == F.col("rhost"))
        & F.col("path").startswith(F.col("path_rule")),
        "left")
    verdict = joined.groupBy("_rid").agg(
        F.first("url").alias("url"),
        F.first("host").alias("host"),
        F.first("path").alias("path"),
        F.max(F.when(
            F.col("path_rule").isNotNull(),
            F.struct(F.length("path_rule").alias("l"),
                     (F.col("kind") == "allow").cast("int").alias("a")),
        )).alias("best"),
    )
    return verdict.select(
        "url", "host", "path",
        (F.col("best").isNull() | (F.col("best.a") == 1)).alias("allowed"),
    )


def robots_gate_stats(pages: DataFrame, rules: DataFrame,
                      agent: str = "*",
                      url_col: str = "url") -> DataFrame:
    """1-row politeness report: host/rule/sitemap/crawl-delay counts and
    the blocked-url accounting for ``agent``.  Corpus-specific checksums
    (e.g. summing an id parsed out of the url) belong to the caller —
    join or aggregate over :func:`gate_urls` directly."""
    gated = gate_urls(pages, rules, agent, url_col)
    g = gated.agg(
        F.count("*").alias("n_urls"),
        F.sum((~F.col("allowed")).cast("long")).alias("n_blocked"),
    )
    r = rules.agg(
        F.countDistinct("host").alias("n_hosts"),
        F.sum((F.col("agent") == agent.lower()).cast("long") *
              F.col("kind").isin("allow", "disallow").cast("long"))
        .alias("n_rules_agent"),
        F.sum((F.col("kind") == "crawl_delay").cast("long"))
        .alias("n_crawl_delay"),
        F.sum((F.col("kind") == "sitemap").cast("long"))
        .alias("n_sitemaps"),
    )
    return g.crossJoin(r).select(
        "n_urls", "n_blocked", "n_hosts", "n_rules_agent",
        "n_crawl_delay", "n_sitemaps",
    )


def crawl_capacity(gated: DataFrame, rules: DataFrame, agent: str = "*",
                   default_delay: int = 1,
                   budget_s: int = 600) -> DataFrame:
    """Politeness-bound crawl capacity planning: given the gated url set
    and the parsed Crawl-delay rules, the three numbers a crawl scheduler
    sizes a fleet with —

    * ``makespan_s``: the longest single-host drain time ((n-1) * delay);
      a host queue is inherently serial under politeness, so this is the
      floor on wall-clock no matter how many fetchers run;
    * ``crawl_work_s``: total politeness-serialized work across hosts
      (the lower bound on fetcher-seconds);
    * ``fetched_in_budget``: fetches completing within ``budget_s``
      seconds, min(n, budget div delay + 1) per host.

    One aggregation keyed on host (the frontier's natural partitioning)
    plus a broadcast of the tiny per-host delay relation — no window, no
    per-url scheduling rows materialized.

    Group selection follows RFC 9309 §2.2.1 like ``gate_urls``: a host
    with ANY exact-agent rule group uses only that group's Crawl-delay
    (even if the group has none), otherwise the ``*`` group's.
    """
    a = agent.lower()
    has_exact = (
        rules.filter(F.col("agent") == a)
        .select("host").distinct().withColumn("_exact", F.lit(True))
    )
    governed = (
        rules.join(has_exact, "host", "left")
        .filter(F.col("agent") == F.when(F.col("_exact"), F.lit(a))
                .otherwise(F.lit("*")))
    )
    delays = (
        governed.filter(F.col("kind") == "crawl_delay")
        .groupBy("host")
        .agg(F.max(F.col("path").cast("long")).alias("delay"))
    )
    per_host = (
        gated.filter(F.col("allowed")).groupBy("host")
        .agg(F.count("*").cast("long").alias("n"))
        .join(F.broadcast(delays), "host", "left")
        .withColumn("delay",
                    F.coalesce("delay", F.lit(default_delay)).cast("long"))
    )
    drain = (F.col("n") - 1) * F.col("delay")
    fetched = F.least(F.col("n"),
                      F.expr(f"{int(budget_s)} div delay") + 1)
    return per_host.agg(
        F.coalesce(F.max(drain), F.lit(0)).cast("long")
        .alias("makespan_s"),
        F.coalesce(F.sum(drain), F.lit(0)).cast("long")
        .alias("crawl_work_s"),
        F.coalesce(F.sum(fetched), F.lit(0)).cast("long")
        .alias("fetched_in_budget"),
    )

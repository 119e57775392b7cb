"""robots.txt kernel + gate operators: RFC 9309 parsing and precedence
fixtures, group selection, and the distributed broadcast gate."""

from __future__ import annotations

from docling_graph_spark.kernels.robots import (
    is_allowed,
    parse_robots,
    rules_for_agent,
)

BODY = """\
# global crawl policy
User-Agent: BadBot
Disallow: /

User-agent: *
Disallow: /private
Allow: /private/ok
Crawl-delay: 3
Sitemap: https://ex.com/sitemap.xml
disallow:    # empty disallow = no rule
Unknown-directive: whatever
"""


def test_parse_groups_and_directives():
    parsed = parse_robots(BODY)
    kinds = [(r.agent, r.kind, r.path) for r in parsed.rules]
    assert ("badbot", "disallow", "/") in kinds
    assert ("*", "disallow", "/private") in kinds
    assert ("*", "allow", "/private/ok") in kinds
    assert ("*", "crawl_delay", "3") in kinds
    assert parsed.sitemaps == ["https://ex.com/sitemap.xml"]
    # the empty disallow and the unknown directive produced nothing
    assert len(parsed.rules) == 4


def test_group_selection_exact_beats_wildcard():
    rules = parse_robots(BODY).rules
    assert {r.agent for r in rules_for_agent(rules, "BADBOT")} == {"badbot"}
    assert {r.agent for r in rules_for_agent(rules, "goodbot")} == {"*"}


def test_longest_match_and_allow_tie():
    rules = parse_robots(BODY).rules
    assert not is_allowed(rules, "*", "/private/x")      # disallow prefix
    assert is_allowed(rules, "*", "/private/ok/deep")    # longer allow wins
    assert is_allowed(rules, "*", "/public")             # no matching rule
    assert not is_allowed(rules, "badbot", "/anything")  # blanket group
    # tie at equal length: Allow wins (RFC 9309 2.2.2)
    tie = parse_robots(
        "User-agent: *\nDisallow: /a\nAllow: /a\n").rules
    assert is_allowed(tie, "*", "/a/x")


def test_stacked_user_agents_share_rules():
    parsed = parse_robots(
        "User-agent: alpha\nUser-agent: beta\nDisallow: /x\n")
    assert {(r.agent, r.path) for r in parsed.rules} == {
        ("alpha", "/x"), ("beta", "/x")}


def test_spark_gate(spark):
    from docling_graph_spark.operators.robots import gate_urls, robots_rules

    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /doc/1\nAllow: /doc/12\n"),
         ("b.com", "User-agent: badbot\nDisallow: /\n")],
        "host string, robots_txt string")
    rules = robots_rules(robots)
    pages = spark.createDataFrame(
        [(f"https://a.com/doc/{d}",) for d in (1, 12, 120, 13, 2)]
        + [("https://b.com/doc/1",), ("https://nohost.com/doc/1",)],
        "url string")
    out = {r["url"]: r["allowed"] for r in gate_urls(pages, rules).collect()}
    assert out["https://a.com/doc/1"] is False       # disallow prefix
    assert out["https://a.com/doc/12"] is True       # longer allow
    assert out["https://a.com/doc/120"] is True      # allow prefix extends
    assert out["https://a.com/doc/13"] is False      # still under disallow
    assert out["https://a.com/doc/2"] is True        # no rule matches
    assert out["https://b.com/doc/1"] is True        # badbot group ignored
    assert out["https://nohost.com/doc/1"] is True   # no robots at all


def test_exact_group_with_only_crawl_delay_governs(spark):
    """A host whose robots.txt has an exact-agent group containing only
    Crawl-delay must NOT fall back to the '*' group (RFC 9309 §2.2.1);
    operator and kernel must agree."""
    from docling_graph_spark.operators.robots import gate_urls, robots_rules

    body = "User-agent: mybot\nCrawl-delay: 2\n\nUser-agent: *\nDisallow: /\n"
    robots = spark.createDataFrame([("a.com", body)],
                                   "host string, robots_txt string")
    rules = robots_rules(robots)
    pages = spark.createDataFrame([("https://a.com/anything",)],
                                  "url string")
    out = gate_urls(pages, rules, agent="mybot").collect()
    assert out[0]["allowed"] is True
    kr = parse_robots(body).rules
    assert is_allowed(kr, "mybot", "/anything") is True
    # and '*' itself is still governed by its own group
    out_star = gate_urls(pages, rules, agent="*").collect()
    assert out_star[0]["allowed"] is False


def test_duplicate_urls_each_get_a_verdict(spark):
    from docling_graph_spark.operators.robots import gate_urls, robots_rules

    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /x\n")],
        "host string, robots_txt string")
    pages = spark.createDataFrame(
        [("https://a.com/x/1",), ("https://a.com/x/1",),
         ("https://a.com/ok",)], "url string")
    rows = gate_urls(pages, robots_rules(robots)).collect()
    assert len(rows) == 3
    assert sum(1 for r in rows if not r["allowed"]) == 2


def test_gate_plan_is_broadcast(spark):
    """The rules side must broadcast — the page corpus never shuffles for
    the gate."""
    from docling_graph_spark.operators.robots import gate_urls, robots_rules

    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /x\n")],
        "host string, robots_txt string")
    pages = spark.createDataFrame([("https://a.com/x/1",)], "url string")
    plan = gate_urls(pages, robots_rules(robots)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # one shuffle total: the verdict aggregate; no second Exchange for a
    # re-join of pages
    assert plan.count("Exchange hashpartitioning") <= 1


def test_crawl_capacity_unit(spark):
    from pyspark.sql import functions as F

    from docling_graph_spark.operators import robots as op_rb

    # host a: 5 urls, delay 10 -> drain 40; host b: 3 urls, default 1 -> 2
    gated = spark.createDataFrame(
        [("a", True)] * 5 + [("b", True)] * 3 + [("b", False)] * 2,
        "host string, allowed boolean").withColumn("url", F.lit("u"))
    rules = spark.createDataFrame(
        [("a", "*", "crawl_delay", "10")],
        "host string, agent string, kind string, path string")
    [r] = op_rb.crawl_capacity(gated, rules, budget_s=25).collect()
    assert r["makespan_s"] == 40
    assert r["crawl_work_s"] == 42
    # within 25s: host a completes 25 div 10 + 1 = 3, host b all 3
    assert r["fetched_in_budget"] == 6


def test_crawl_capacity_empty(spark):
    from docling_graph_spark.operators import robots as op_rb

    gated = spark.createDataFrame([], "host string, allowed boolean")
    rules = spark.createDataFrame(
        [], "host string, agent string, kind string, path string")
    [r] = op_rb.crawl_capacity(gated, rules).collect()
    assert (r["makespan_s"], r["crawl_work_s"],
            r["fetched_in_budget"]) == (0, 0, 0)


def test_crawl_capacity_exact_agent_group_beats_wildcard(spark):
    from pyspark.sql import functions as F

    from docling_graph_spark.operators import robots as op_rb

    gated = spark.createDataFrame(
        [("a", True)] * 3 + [("b", True)] * 3,
        "host string, allowed boolean").withColumn("url", F.lit("u"))
    rules = spark.createDataFrame(
        [
            # host a: exact-agent group exists WITHOUT a delay -> the
            # wildcard delay must NOT apply (RFC 9309 group selection)
            ("a", "mybot", "disallow", "/x"),
            ("a", "*", "crawl_delay", "10"),
            # host b: no exact group -> wildcard delay governs
            ("b", "*", "crawl_delay", "5"),
        ],
        "host string, agent string, kind string, path string")
    [r] = op_rb.crawl_capacity(gated, rules, agent="mybot").collect()
    # host a: default delay 1 -> drain 2; host b: delay 5 -> drain 10
    assert r["makespan_s"] == 10
    assert r["crawl_work_s"] == 12

"""robots.txt parsing and URL gating — RFC 9309 subset, pure functions.

A crawl-derived corpus carries the crawler's politeness obligations with
it: re-crawl pipelines, URL-frontier dedup, and takedown audits all need
"would agent X be allowed to fetch this url" as a column.  This kernel
parses the robots.txt grammar (line-oriented key:value records grouped
under User-agent lines) and evaluates the RFC 9309 §2.2.2 precedence
rule: the matching rule with the LONGEST path wins; on a tie, Allow wins.

Deterministic subset implemented (what the gating semantics need):

* case-insensitive directive keys; ``#`` comments stripped anywhere;
* group = consecutive ``User-agent`` lines followed by rules — a rule
  line belongs to every agent named above it in the group (RFC §2.2.1);
* ``Allow`` / ``Disallow`` with non-empty paths (an empty Disallow means
  "no rule", per spec);
* ``Crawl-delay`` (non-standard but ubiquitous) kept per group;
* ``Sitemap`` is group-independent and collected separately;
* agent matching is exact-token or ``*`` (the corpus fixtures use only
  those; product-token prefix matching is a trivial extension).

The reference has no crawl layer at all (its URL handling downloads one
document, `core/input/handlers.py:124-304`); this is a rebuild addition
for the crawl tier.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple


class RobotsRule(NamedTuple):
    agent: str          # lowercased user-agent token ('*' for wildcard)
    kind: str           # 'allow' | 'disallow' | 'crawl_delay'
    path: str           # url path prefix (or the delay value as string)


class ParsedRobots(NamedTuple):
    rules: List[RobotsRule]
    sitemaps: List[str]


def parse_robots(text: str) -> ParsedRobots:
    """Parse a robots.txt body into flat (agent, kind, path) rows."""
    rules: List[RobotsRule] = []
    sitemaps: List[str] = []
    agents: List[str] = []
    group_open = False  # True while User-agent lines are accumulating
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not group_open:
                agents = []  # a new group starts
                group_open = True
            if value:
                agents.append(value.lower())
            continue
        group_open = False
        if key == "sitemap":
            if value:
                sitemaps.append(value)
            continue
        if key in ("allow", "disallow"):
            if not value:  # empty Disallow == no rule (RFC 9309 §2.2.2)
                continue
            for a in agents:
                rules.append(RobotsRule(a, key, value))
        elif key == "crawl-delay":
            for a in agents:
                rules.append(RobotsRule(a, "crawl_delay", value))
        # unknown directives: skipped
    return ParsedRobots(rules, sitemaps)


def rules_for_agent(rules: List[RobotsRule],
                    agent: str) -> List[RobotsRule]:
    """The group that governs ``agent``: exact-token rules if any exist,
    else the ``*`` group (RFC 9309 §2.2.1 — most specific match, and a
    matched group makes the wildcard group inapplicable)."""
    a = agent.lower()
    exact = [r for r in rules if r.agent == a]
    if exact:
        return exact
    return [r for r in rules if r.agent == "*"]


def is_allowed(rules: List[RobotsRule], agent: str, path: str) -> bool:
    """RFC 9309 §2.2.2 evaluation: longest matching path wins, Allow wins
    ties, no matching rule means allowed."""
    best: Optional[Tuple[int, int]] = None  # (path_len, allow_flag)
    for r in rules_for_agent(rules, agent):
        if r.kind not in ("allow", "disallow"):
            continue
        if path.startswith(r.path):
            cand = (len(r.path), 1 if r.kind == "allow" else 0)
            if best is None or cand > best:
                best = cand
    return best is None or best[1] == 1

"""Declarative data-quality validation — the Deequ/Great-Expectations
analogue for the crawl-ingest boundary.

The reference validates documents imperatively at load time
(`core/input/validators.py:211-355`: per-document checks raising on the
first failure).  At 10^12 rows validation must instead be a QUERY: every
row-level check is folded into ONE aggregation pass over the table
(Deequ's core trick), so a full constraint suite costs a single scan +
one map-side-combinable aggregate regardless of how many checks run.
Violation COUNTS (not booleans or ratios) are emitted — integers are
hash-stable across engines and let the caller pick thresholds.

Row-level checks (one `run_checks` pass):
  * completeness  — NULL or blank-after-trim values
  * uniqueness    — rows minus distinct keys
  * pattern       — values not fully matching a (Java∩RE2-portable) regex
  * membership    — values outside an allowed literal set (NULL counts)
  * in_range      — numeric values outside [lo, hi] (NULL counts)
  * consistency   — rows violating an arbitrary cross-column predicate

Cross-table check (its own pass, the only join in the suite):
  * referential_orphans — child keys with no parent, counted with a
    left_anti join on the key (broadcastable when the parent's distinct
    key set is small; plain hash join otherwise — never a window).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# a check is a list of (metric_name, aggregate_expression) pairs; checks
# compose by concatenation and evaluate together in one .agg() call
Check = Sequence[tuple]


def _viol(name: str, cond: Column) -> Check:
    # coalesce so an EMPTY relation reports 0 violations (sum over zero
    # rows is NULL), matching the SQL oracle's coalesce(sum(...), 0)
    return [(name,
             F.coalesce(F.sum(cond.cast("long")), F.lit(0)).cast("long"))]


def completeness(col: str, name: str | None = None) -> Check:
    c = F.col(col)
    blank = c.isNull() | (F.trim(c.cast("string")) == "")
    return _viol(name or f"{col}_missing", blank)


def uniqueness(col: str, name: str | None = None) -> Check:
    return [(name or f"{col}_dupes",
             (F.count(F.col(col)) - F.countDistinct(F.col(col)))
             .cast("long"))]


def pattern(col: Column | str, regex: str, name: str = "pattern_viol"
            ) -> Check:
    c = F.col(col) if isinstance(col, str) else col
    return _viol(name, c.isNull() | ~c.rlike(regex))


def membership(col: str, allowed: Sequence[str],
               name: str | None = None) -> Check:
    c = F.col(col)
    return _viol(name or f"{col}_domain_viol",
                 c.isNull() | ~c.isin(list(allowed)))


def in_range(col: str, lo, hi, name: str | None = None) -> Check:
    c = F.col(col)
    return _viol(name or f"{col}_range_viol",
                 c.isNull() | (c < lo) | (c > hi))


def consistency(name: str, violated: Column) -> Check:
    return _viol(name, violated)


def run_checks(df: DataFrame, *checks: Check) -> DataFrame:
    """Evaluate every check in ONE aggregation over ``df``: returns a
    single row with ``n_rows`` plus one long column per metric.  All
    sums combine map-side; the uniqueness checks' distinct aggregates
    ride the same pass via Spark's expand-based multi-distinct plan."""
    exprs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for check in checks:
        for metric, agg in check:
            exprs.append(agg.alias(metric))
    return df.agg(*exprs)


def referential_orphans(child: DataFrame, key: str, parent: DataFrame,
                        parent_key: str, name: str) -> DataFrame:
    """1-row count of child rows whose key has no parent — the
    referential-integrity constraint as a left_anti join (NULL keys are
    orphans by definition, matching the SQL NOT-IN-with-NULL-guard
    oracle form)."""
    par = parent.select(F.col(parent_key).alias(key)).distinct()
    orphans = child.select(key).join(par, key, "left_anti")
    return orphans.agg(F.count(F.lit(1)).cast("long").alias(name))

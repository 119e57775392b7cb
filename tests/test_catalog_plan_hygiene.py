"""Catalog-wide physical-plan hygiene: no query may plan a
CartesianProduct, and every nested-loop join must be a broadcast cross
(tiny build side — the intentional centroid/query-set pattern).  Guards
against silent plan regressions anywhere in the 50-entry driver catalog.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from docling_graph_spark.plans import formatted_plan

QUERY_NAMES = sorted(entry_mod.queries())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_no_cartesian_or_unbroadcast_nlj(spark, sf_smoke_dir, name):
    df = entry_mod.queries()[name](spark, sf_smoke_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, name
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line and "Build" in line:
            assert "BuildRight" in line or "BuildLeft" in line, (name, line)

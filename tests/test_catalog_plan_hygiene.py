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
# the three heavyweight merged relations dominate the suite's wall time;
# their driver-gate coverage still runs in the full (close-out) suite
_SLOW_QUERIES = {"link_graph_stats", "corpus_prep_stats", "top_terms"}
QUERY_PARAMS = [
    pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_QUERIES else n
    for n in QUERY_NAMES
]

# the ONLY queries allowed to plan a BroadcastNestedLoopJoin — each is an
# intentional tiny-build-side broadcast cross (centroid scoring in the
# ANN/SemDeDup family, 1-row summary crossJoins in the stats relations).
# Any other query growing a nested-loop join is a plan regression.
BNLJ_ALLOWED = {
    "ann_topk", "semantic_dedup",          # broadcast-centroid argmax
    "node_dedup_remap", "corpus_prep_stats",  # 1-row summary crossJoin
    "sampling_splits",                        # 1-row host-cap stats join
    "top_terms",  # bm25 corpus-totals 1-row broadcast crossJoin
    "link_graph_stats",  # bowtie core-label: 1-row broadcast crossJoin
}


@pytest.mark.parametrize("name", QUERY_PARAMS)
def test_no_cartesian_or_unbroadcast_nlj(spark, sf_smoke_dir, name):
    df = entry_mod.queries()[name](spark, sf_smoke_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, name
    if name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, name

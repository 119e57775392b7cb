"""Site-level boilerplate removal (textprep.host_boilerplate_removal):
strict-majority rule, min_pages floor, within-page repeats counted once,
original-order rebuild, all-removed pages rebuild to ''."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docling_graph_spark.operators import textprep


@pytest.fixture(scope="module")
def rebuilt(spark):
    # host A (4 pages): "tpl" on 3/4 pages (majority -> removed),
    #   "half" on 2/4 (exactly half -> kept), uniques kept.
    # host B (1 page): "solo" on 100% of pages but page_freq=1 < min_pages
    #   -> kept (the floor).
    # host C (2 pages): "cc" on both pages, one page repeats it twice
    #   within the page (page_freq must still be 2, not 3); page c2 is
    #   ONLY boilerplate -> rebuilds to ''.
    rows = [
        (0, "A", ["tpl", "u0"]),
        (1, "A", ["u1", "tpl"]),
        (2, "A", ["tpl", "half", "u2"]),
        (3, "A", ["half", "u3"]),
        (4, "B", ["solo"]),
        (5, "C", ["cc", "c-extra", "cc"]),
        (6, "C", ["cc", "cc"]),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, host string, lines array<string>")
    out = textprep.host_boilerplate_removal(
        df, "host", F.col("lines"), min_pages=2)
    return {r["doc_id"]: r for r in out.collect()}


def test_majority_line_removed(rebuilt):
    assert rebuilt[0]["rebuilt"] == "u0" and rebuilt[0]["n_removed"] == 1
    assert rebuilt[1]["rebuilt"] == "u1"
    assert rebuilt[2]["rebuilt"] == "half\nu2"


def test_exact_half_kept(rebuilt):
    # "half" is on 2 of 4 pages: 2*2 > 4 is false -> kept
    assert rebuilt[3]["rebuilt"] == "half\nu3" and rebuilt[3]["n_removed"] == 0


def test_min_pages_floor(rebuilt):
    # single-page host: 100% frequency but page_freq=1 -> kept
    assert rebuilt[4]["rebuilt"] == "solo" and rebuilt[4]["n_removed"] == 0


def test_within_page_repeat_counts_once_and_empty_rebuild(rebuilt):
    # "cc" page_freq is 2 (distinct pages), majority of host C -> removed
    # everywhere, including both copies within one page
    assert rebuilt[5]["rebuilt"] == "c-extra" and rebuilt[5]["n_removed"] == 2
    assert rebuilt[6]["rebuilt"] == "" and rebuilt[6]["n_removed"] == 2


def test_rebuild_preserves_order(spark):
    df = spark.createDataFrame(
        [(0, "H", ["z", "bp", "a", "m"]), (1, "H", ["bp"])],
        "doc_id long, host string, lines array<string>")
    out = textprep.host_boilerplate_removal(
        df, "host", F.col("lines"), min_pages=2)
    row = {r["doc_id"]: r for r in out.collect()}
    assert row[0]["rebuilt"] == "z\na\nm"  # original order, not sorted


def test_host_quality_split_majority_and_floor(spark):
    """Domain filtering: strict-majority fail + min_docs floor."""
    # 60 DISTINCT words (repetition gates need diversity, not just count)
    good = " ".join(f"word{i:02d}" for i in range(60))
    bad = "tiny"                            # fails word-count gate
    rows = (
        # host A: 2 bad of 3 -> flagged (majority, >= min_docs)
        [("A", bad), ("A", bad), ("A", good)]
        # host B: 2 bad of 2 -> majority, but below min_docs: never flagged
        + [("B", bad), ("B", bad)]
        # host C: 2 bad of 4 -> exactly half, not a strict majority
        + [("C", bad), ("C", bad), ("C", good), ("C", good)]
    )
    df = spark.createDataFrame(rows, "host string, text string")
    from docling_graph_spark.operators import textprep

    [r] = textprep.host_quality_split(df, "host", min_docs=3).collect()
    assert r["n_hosts"] == 3 and r["docs_total"] == 9
    assert r["docs_failing"] == 6
    assert r["n_flagged_hosts"] == 1        # only A
    assert r["docs_on_flagged"] == 3
    assert r["flagged_checksum"] > 0

"""Self-check replicating the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB over the same
parquet tables; compare row count, column names, and order-insensitive
values."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        return round(v, 9)
    return v


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_norm(row[i]) for i in order) for row in rows
    )


QUERY_NAMES = sorted(entry_mod.oracle_sql())
# the three heavyweight merged relations dominate the suite's wall time;
# their driver-gate coverage still runs in the full (close-out) suite
_SLOW_QUERIES = {"link_graph_stats", "corpus_prep_stats", "top_terms"}
QUERY_PARAMS = [
    pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_QUERIES else n
    for n in QUERY_NAMES
]


@pytest.mark.parametrize("name", QUERY_PARAMS)
def test_query_matches_oracle(spark, sf_smoke_dir, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]

    sdf = q(spark, sf_smoke_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = _duck(sf_smoke_dir)
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch"
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} vs oracle {len(drows)}"
    )
    sset, dset = _rowset(scols, srows), _rowset(dcols, drows)
    if sset != dset:
        diffs = [
            (a, b) for a, b in zip(sset, dset) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_catalog_within_driver_cap():
    """The driver's correctness harness records at most 50 catalog entries
    (round 1 registered 56 and exactly the first 50 in dict order got
    CORRECTNESS rows — the trailing 6 were silently dropped).  Keep the
    registry at <= 50 so every registered query is driver-checked."""
    cat = entry_mod.queries()
    assert len(cat) <= 50, (
        f"catalog has {len(cat)} entries; the driver only records the "
        "first 50 — merge same-family queries instead of exceeding the cap"
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 4
    assert {r["element"] for r in rows} == {"node", "edge"}

"""Z-order clustering (operators/zorder.py): Morton-key math vs a python
replay, and FILE-SKIPPING EVIDENCE from real parquet footers — z-ordered
layout prunes on both dimensions, linear sort only on one."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from docling_graph_spark.operators import zorder as op_z

N = 4096
FILES = 16


def _morton(x, y, bits):
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


@pytest.fixture(scope="module")
def grid(spark):
    # a 64x64 grid: two independent dimensions, both filter-worthy
    rows = [(i, i % 64, i // 64) for i in range(N)]
    return spark.createDataFrame(rows, "id long, hx long, ts long")


def test_interleave_matches_python_replay(spark, grid):
    got = {(r["hx"], r["ts"]): r["z"] for r in grid.select(
        "hx", "ts",
        op_z.interleave_bits(F.col("hx"), F.col("ts"), 6).alias("z")
    ).collect()}
    for (x, y), z in got.items():
        assert z == _morton(x, y, 6)


def _ranges(path, col):
    """Per-file (min, max) of col from the parquet footers."""
    out = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(
                [md.schema.column(i).name
                 for i in range(md.num_columns)].index(col)).statistics
            mins.append(st.min)
            maxs.append(st.max)
        out.append((min(mins), max(maxs)))
    return out


def _files_pruned(ranges, lo, hi):
    """Files a min/max reader can SKIP for predicate col BETWEEN lo..hi."""
    return sum(1 for mn, mx in ranges if mx < lo or mn > hi)


def test_zorder_files_prune_on_both_dimensions(spark, grid, tmp_path):
    linear = str(tmp_path / "linear")
    zed = str(tmp_path / "zorder")
    (grid.repartitionByRange(FILES, "hx").sortWithinPartitions("hx")
     .write.parquet(linear))
    op_z.cluster_by_zorder(grid, "hx", "ts", FILES).write.parquet(zed)

    # dimension 1 (hx): linear is perfect; z-order must still prune most
    lin_hx = _files_pruned(_ranges(linear, "hx"), 10, 13)
    z_hx = _files_pruned(_ranges(zed, "hx"), 10, 13)
    assert lin_hx >= FILES - 2
    assert z_hx >= FILES // 2

    # dimension 2 (ts): linear layout prunes NOTHING (every file spans
    # the full ts range); z-order prunes most files
    lin_ts = _files_pruned(_ranges(linear, "ts"), 10, 13)
    z_ts = _files_pruned(_ranges(zed, "ts"), 10, 13)
    assert lin_ts == 0
    assert z_ts >= FILES // 2
    # and the combined two-dimension workload skips strictly more files
    # under z-order than under the linear layout
    assert z_hx + z_ts > lin_hx + lin_ts


def test_cluster_preserves_rows(spark, grid, tmp_path):
    out = str(tmp_path / "rows")
    op_z.cluster_by_zorder(grid, "hx", "ts", FILES).write.parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == N
    assert back.select(F.sum("id")).collect()[0][0] == N * (N - 1) // 2

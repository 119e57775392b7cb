"""Helpers over `df.explain("formatted")` output.

Text-level inspection is deliberate: the formatted plan is the stable public
surface Spark documents, and parsing it keeps these helpers independent of
internal plan classes across Spark versions.
"""

from __future__ import annotations

import contextlib
import io
import re
from typing import Dict, List

from pyspark.sql import DataFrame

PYTHON_EVAL_NODES = (
    "ArrowEvalPython", "BatchEvalPython", "FlatMapGroupsInPandas",
    "MapInPandas", "PythonMapInArrow",
)


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def python_eval_nodes(df: DataFrame) -> List[str]:
    """Python-execution operators present in the plan (empty = pure JVM)."""
    plan = formatted_plan(df)
    return [n for n in PYTHON_EVAL_NODES if n in plan]


def scan_read_schemas(df: DataFrame) -> List[str]:
    """ReadSchema of every file scan — the column-pruning evidence."""
    return re.findall(r"ReadSchema: (struct<[^\n]*>)", formatted_plan(df))


def scan_pushed_filters(df: DataFrame) -> List[str]:
    """PushedFilters of every file scan (empty string = none pushed)."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or \
        "BroadcastNestedLoopJoin" in formatted_plan(df)

"""Physical-plan inspection utilities.

The 100 TB design contract is enforceable, not aspirational: these helpers
read a DataFrame's executed/formatted plan so tests can assert the plan
properties the design depends on — column pruning reached the scan, filters
pushed down, no Python evaluation in JVM-only operators, broadcasts where
broadcasts were intended.  PLANS.md is generated from the same surface.
"""

from .inspect import (
    formatted_plan,
    python_eval_nodes,
    scan_read_schemas,
    scan_pushed_filters,
    has_broadcast_join,
)

__all__ = [
    "formatted_plan",
    "python_eval_nodes",
    "scan_read_schemas",
    "scan_pushed_filters",
    "has_broadcast_join",
]

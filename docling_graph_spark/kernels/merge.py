"""Deep-merge kernel for partial extraction records.

Behavioural parity target:
`/root/reference/docling_graph/core/utils/dict_merger.py:9-144`.

Semantics (order-dependent — first record is the base):

* a source value equal to ``None``, ``""``, ``[]`` or ``{}`` never overwrites;
* dict + dict merge recursively;
* list + list: if the existing list starts with a dict, treat both as entity
  lists and de-duplicate by content hash (:func:`entity_item_hash`);
  otherwise append items not already present (``in`` equality);
* anything else: source overwrites target.

Spark has no row order, so the pipeline feeds groups sorted by
``(chunk_id, batch_id)`` before merging — making "first" well-defined and
the result identical to the reference run over the same ordered partials.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, List, Mapping, Sequence

from .fingerprint import entity_item_hash

_EMPTYISH = (None, "", [], {})


def merge_records(records: Sequence[Dict[str, Any]]) -> Dict[str, Any]:
    """Merge ordered partial records into one (reference: consolidate/merge)."""
    if not records:
        return {}
    base = copy.deepcopy(records[0])
    for other in records[1:]:
        deep_merge(base, other)
    return base


def deep_merge(target: Dict[str, Any], source: Mapping[str, Any]) -> Dict[str, Any]:
    """Recursively merge ``source`` into ``target`` in place (and return it)."""
    for key, incoming in source.items():
        if _is_emptyish(incoming):
            continue
        if key not in target:
            target[key] = copy.deepcopy(incoming)
            continue
        existing = target[key]
        if isinstance(existing, dict) and isinstance(incoming, dict):
            deep_merge(existing, incoming)
        elif isinstance(existing, list) and isinstance(incoming, list):
            if existing and isinstance(existing[0], dict):
                target[key] = _merge_entity_lists(existing, incoming)
            else:
                for item in incoming:
                    if item not in existing:
                        existing.append(item)
        else:
            target[key] = copy.deepcopy(incoming)
    return target


def _is_emptyish(value: Any) -> bool:
    # Mirrors the reference membership test `value in (None, "", [], {})`,
    # which uses equality — so 0/False are NOT emptyish and do overwrite.
    for sentinel in _EMPTYISH:
        if value is sentinel:
            return True
        try:
            if value == sentinel:
                return True
        except Exception:
            continue
    return False


def _merge_entity_lists(existing: List[Dict], incoming: Sequence[Dict]) -> List[Dict]:
    seen = {entity_item_hash(e): e for e in existing}
    merged = list(seen.values())
    for item in incoming:
        h = entity_item_hash(item)
        if h not in seen:
            merged.append(item)
            seen[h] = item
    return merged

"""Deterministic content fingerprints and node IDs.

Behavioural parity targets in the reference:

* entity fingerprint + node id —
  `/root/reference/docling_graph/core/converters/node_id_registry.py:56-147`:
  blake2b over ``json.dumps(fields, sort_keys=True, default=str)`` of the
  identity fields (lists normalised to ``tuple(sorted(set(...)))``) plus the
  class name, truncated to 16 hex chars; node id is ``f"{Class}_{fp}"``.
* node content hash (cleanup dedup) —
  `/root/reference/docling_graph/core/utils/graph_cleaner.py:265-283`.
* entity-list item hash (merge dedup) —
  `/root/reference/docling_graph/core/utils/dict_merger.py:97-104`.
* meaningful-value predicate —
  `/root/reference/docling_graph/core/utils/graph_cleaner.py:21-62`.

The registry in the reference is mutable process state, but its fingerprints
are pure functions of content — so these stateless kernels give identical IDs
across any partitioning of the data (cross-batch consistency for free).
"""

from __future__ import annotations

import hashlib
import json
from typing import Any, Dict, List, Mapping, Optional, Sequence

HASH_HEX_LEN = 16


def _blake16(payload: str) -> str:
    return hashlib.blake2b(payload.encode()).hexdigest()[:HASH_HEX_LEN]


def canonical_json(data: Mapping[str, Any]) -> str:
    """The exact serialisation the reference hashes (json.dumps defaults)."""
    return json.dumps(data, sort_keys=True, default=str)


def entity_fingerprint(
    record: Mapping[str, Any],
    class_name: str,
    id_fields: Sequence[str] = (),
) -> str:
    """Fingerprint a model record (dict form of a pydantic instance).

    With ``id_fields`` (entity): hash those fields, lists normalised to a
    sorted de-duplicated tuple (falling back to a plain tuple for unsortable
    element types).  Without (component): hash every truthy scalar field —
    lists/dicts/nested records are excluded, and falsy values (None, "", 0,
    False, empty collections) are excluded by the reference's truthiness test.
    """
    data: Dict[str, Any] = {}
    if id_fields:
        for field in id_fields:
            if field in record:
                value = record[field]
                if isinstance(value, list):
                    try:
                        value = tuple(sorted(set(value)))
                    except TypeError:
                        value = tuple(value)
                data[field] = value
    else:
        for field, value in record.items():
            if value and not isinstance(value, (list, dict)):
                data[field] = value
    data["__class__"] = class_name
    return _blake16(canonical_json(data))


def node_id(record: Mapping[str, Any], class_name: str,
            id_fields: Sequence[str] = ()) -> str:
    return f"{class_name}_{entity_fingerprint(record, class_name, id_fields)}"


def node_content_hash(node_attrs: Mapping[str, Any]) -> str:
    """Content hash for cleanup-phase duplicate detection (ignores identity)."""
    content = {
        k: v for k, v in node_attrs.items()
        if k not in {"id", "label", "type"} and v is not None
    }
    return _blake16(canonical_json(content))


def entity_item_hash(entity: Any) -> str:
    """Hash used to de-duplicate entity dicts inside merged lists.

    Non-dict items (the reference would crash on these — we keep them per the
    zero-data-loss contract) hash their JSON value directly.
    """
    if not isinstance(entity, Mapping):
        return _blake16(json.dumps(entity, sort_keys=True, default=str))
    stable = {
        k: v for k, v in entity.items()
        if k not in {"id", "__class__"} and v is not None
    }
    return _blake16(canonical_json(stable))


def is_meaningful(value: Any) -> bool:
    """True unless value is None, blank/whitespace string, or empty collection.

    0 and False are meaningful (they carry information).
    """
    if value is None:
        return False
    if isinstance(value, str):
        return bool(value.strip())
    if isinstance(value, (list, dict, set, tuple)):
        return len(value) > 0
    return True

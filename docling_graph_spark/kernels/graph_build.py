"""Model-records → property-graph flattening and cleanup kernels.

Behavioural parity targets:

* node/edge creation —
  `/root/reference/docling_graph/core/converters/graph_converter.py:97-320`:
  entities become nodes (id = deterministic fingerprint id), nested entities
  are linked via edges and their field on the parent is nulled; components
  (``is_entity=False``) stay embedded as dicts; edge label comes from field
  metadata or the field name; optional reverse edges get ``reverse_<label>``.
* cleanup —
  `/root/reference/docling_graph/core/utils/graph_cleaner.py:76-304`:
  (1) drop phantom nodes (no meaningful field beyond id/label/type),
  (2) merge content-identical nodes (first occurrence is canonical) and
  redirect their edges (skipping would-be self-loops),
  (3) drop edges with a missing endpoint,
  (4) collapse duplicate edges.  NB: the reference graph is an ``nx.DiGraph``
  — parallel edges collapse at insert time with last-writer-wins attrs, which
  this kernel reproduces.

The recursion depth is bounded by the (static) template nesting, so the same
flattening runs inside an Arrow-batched grouped UDF per document; global
cross-document cleanup is then done relationally in
``docling_graph_spark.operators.graph``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Sequence, Tuple

from ..templates import TemplateRegistry, TemplateSpec
from .fingerprint import is_meaningful, node_content_hash, node_id

NodeAttrs = Dict[str, Any]
EdgeTuple = Tuple[str, str, str]  # (src, dst, label)


def flatten_models(
    records: Sequence[Tuple[str, Mapping[str, Any]]],
    registry: TemplateRegistry,
    add_reverse_edges: bool = False,
) -> Tuple[List[NodeAttrs], List[EdgeTuple]]:
    """Flatten (class_name, record) pairs into node-attr dicts and edges.

    Output order mirrors the reference passes: all nodes first (model order,
    parents before children), then all edges (model order), reverse edges
    appended after the forward list.
    """
    nodes: List[NodeAttrs] = []
    visited: set[str] = set()
    for class_name, record in records:
        _nodes_pass(class_name, record, registry, nodes, visited)

    edges: List[EdgeTuple] = []
    for class_name, record in records:
        _edges_pass(class_name, record, registry, edges)
    if add_reverse_edges:
        edges = edges + [(dst, src, f"reverse_{label}") for src, dst, label in edges]
    return nodes, edges


def _nodes_pass(
    class_name: str,
    record: Mapping[str, Any],
    registry: TemplateRegistry,
    out: List[NodeAttrs],
    visited: set,
) -> None:
    spec = registry.get(class_name)
    if not spec.is_entity:
        return
    nid = node_id(record, class_name, spec.id_fields)
    if nid in visited:
        return
    visited.add(nid)

    attrs: NodeAttrs = {
        "id": nid,
        "label": class_name,
        "type": "entity",
        "__class__": class_name,
    }
    for field_name, value in record.items():
        child_name = spec.children.get(field_name)
        if child_name is not None and isinstance(value, Mapping):
            child = registry.get(child_name)
            if child.is_entity:
                attrs[field_name] = None
                _nodes_pass(child_name, value, registry, out, visited)
            else:
                attrs[field_name] = dict(value)
        elif child_name is not None and isinstance(value, list) and value:
            child = registry.get(child_name)
            if child.is_entity:
                attrs[field_name] = None
                for item in value:
                    _nodes_pass(child_name, item, registry, out, visited)
            else:
                attrs[field_name] = [dict(item) for item in value]
        else:
            attrs[field_name] = value
    out.append(attrs)


def _edges_pass(
    class_name: str,
    record: Mapping[str, Any],
    registry: TemplateRegistry,
    out: List[EdgeTuple],
) -> None:
    spec = registry.get(class_name)
    if not spec.is_entity:
        return
    src = node_id(record, class_name, spec.id_fields)
    for field_name, value in record.items():
        child_name = spec.children.get(field_name)
        if child_name is None:
            continue
        child = registry.get(child_name)
        if not child.is_entity:
            continue
        label = spec.edge_label_for(field_name)
        items = value if isinstance(value, list) else [value] if isinstance(value, Mapping) else []
        for item in items:
            dst = node_id(item, child_name, child.id_fields)
            out.append((src, dst, label))
            _edges_pass(child_name, item, registry, out)


def clean_graph(
    nodes: Sequence[NodeAttrs],
    edges: Sequence[EdgeTuple],
) -> Tuple[List[NodeAttrs], List[EdgeTuple]]:
    """Reference-order cleanup over node/edge lists (per-document scale).

    Steps: digraph-collapse of parallel edges (last label wins), phantom-node
    removal, content-hash dedup with first-occurrence canonical + edge
    redirect (no self-loops), orphan-edge removal, duplicate-edge removal.
    """
    # nx.DiGraph collapses parallel (src, dst) at insertion; last attrs win.
    edge_map: Dict[Tuple[str, str], str] = {}
    for src, dst, label in edges:
        edge_map[(src, dst)] = label

    # 1. phantom nodes
    live: List[NodeAttrs] = []
    for attrs in nodes:
        if any(is_meaningful(v) for k, v in attrs.items()
               if k not in {"id", "label", "type"}):
            live.append(attrs)

    # 2. content dedup: first occurrence canonical
    canon_of: Dict[str, str] = {}
    by_hash: Dict[str, str] = {}
    deduped: List[NodeAttrs] = []
    for attrs in live:
        h = node_content_hash(attrs)
        if h in by_hash:
            canon_of[attrs["id"]] = by_hash[h]
        else:
            by_hash[h] = attrs["id"]
            deduped.append(attrs)

    # redirect edges of merged duplicates (skip self-loops)
    redirected: Dict[Tuple[str, str], str] = {}
    for (src, dst), label in edge_map.items():
        new_src = canon_of.get(src, src)
        new_dst = canon_of.get(dst, dst)
        if (src in canon_of or dst in canon_of) and new_src == new_dst:
            continue
        redirected[(new_src, new_dst)] = label

    # 3. orphan edges
    ids = {n["id"] for n in deduped}
    final_edges = [(s, d, l) for (s, d), l in redirected.items()
                   if s in ids and d in ids]
    return deduped, final_edges


def graph_stats(nodes: Sequence[NodeAttrs],
                edges: Sequence[EdgeTuple]) -> Dict[str, Any]:
    """node/edge counts, type distributions, average degree
    (`/root/reference/docling_graph/core/utils/stats_calculator.py:10-71`)."""
    node_types: Dict[str, int] = {}
    for n in nodes:
        lbl = n.get("label", "Unknown")
        node_types[lbl] = node_types.get(lbl, 0) + 1
    edge_types: Dict[str, int] = {}
    for _, _, lbl in edges:
        edge_types[lbl or "Unknown"] = edge_types.get(lbl or "Unknown", 0) + 1
    n_nodes, n_edges = len(nodes), len(edges)
    return {
        "node_count": n_nodes,
        "edge_count": n_edges,
        "node_types": node_types,
        "edge_types": edge_types,
        "average_degree": (2 * n_edges / n_nodes) if n_nodes else 0.0,
    }

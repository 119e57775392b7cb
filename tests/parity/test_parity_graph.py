"""Parity: our flatten/clean kernels vs the reference GraphConverter +
GraphCleaner run on the same pydantic model instances."""

from __future__ import annotations

from typing import List

import pytest
from pydantic import BaseModel, Field

from docling_graph_spark.kernels import graph_build as k_graph
from docling_graph_spark.templates import TemplateRegistry, TemplateSpec

from .ref_loader import load_ref

ref_converter_mod = load_ref("core/converters/graph_converter.py")


class SamplePerson(BaseModel):
    first_name: str
    last_name: str
    age: int | None = None
    email: str
    model_config = {"graph_id_fields": ["email"]}


class SampleAddress(BaseModel):
    street: str = ""
    city: str = ""
    model_config = {"is_entity": False}


class SampleCompany(BaseModel):
    company_name: str
    industry: str = ""
    founded_year: int | None = None
    employees: List[SamplePerson] = Field(default_factory=list)
    hq: SampleAddress | None = None
    ceo: SamplePerson | None = None
    model_config = {"graph_id_fields": ["company_name"]}


def _registry() -> TemplateRegistry:
    reg = TemplateRegistry()
    reg.add(TemplateSpec("SamplePerson", id_fields=("email",)))
    reg.add(TemplateSpec("SampleAddress", is_entity=False))
    reg.add(TemplateSpec(
        "SampleCompany",
        id_fields=("company_name",),
        children={"employees": "SamplePerson", "hq": "SampleAddress",
                  "ceo": "SamplePerson"},
    ))
    return reg


def _ref_graph(models, add_reverse_edges=False):
    conv = ref_converter_mod.GraphConverter(
        add_reverse_edges=add_reverse_edges, validate_graph=False, auto_cleanup=True
    )
    graph, _meta = conv.pydantic_list_to_graph(models)
    nodes = {nid: dict(data) for nid, data in graph.nodes(data=True)}
    edges = {(s, t): data.get("label") for s, t, data in graph.edges(data=True)}
    return nodes, edges


def _our_graph(models, add_reverse_edges=False):
    records = [(m.__class__.__name__, m.model_dump()) for m in models]
    nodes, edges = k_graph.flatten_models(records, _registry(), add_reverse_edges)
    nodes, edges = k_graph.clean_graph(nodes, edges)
    return {n["id"]: n for n in nodes}, {(s, d): l for s, d, l in edges}


PEOPLE = [
    SamplePerson(first_name="Ann", last_name="Lee", email="ann@x.io", age=34),
    SamplePerson(first_name="Bob", last_name="Roy", email="bob@x.io"),
]

CASES = [
    # nested entity list + component + nested single entity
    [
        SampleCompany(
            company_name="Acme",
            industry="tools",
            founded_year=1999,
            employees=PEOPLE,
            hq=SampleAddress(street="1 Way", city="Metz"),
            ceo=PEOPLE[0],
        )
    ],
    # duplicate entities across models (cross-batch dedup via pure IDs)
    [
        SampleCompany(company_name="Acme", industry="tools", employees=[PEOPLE[0]]),
        SampleCompany(company_name="Zeta", industry="toys", employees=[PEOPLE[0]]),
    ],
    # merged duplicates: same content, standalone person repeated
    [PEOPLE[0], PEOPLE[0], PEOPLE[1]],
]


@pytest.mark.parametrize("models", CASES)
@pytest.mark.parametrize("reverse", [False, True])
def test_graph_parity(models, reverse):
    ref_nodes, ref_edges = _ref_graph(models, reverse)
    our_nodes, our_edges = _our_graph(models, reverse)
    assert set(our_nodes) == set(ref_nodes)
    assert our_edges == ref_edges
    for nid, attrs in ref_nodes.items():
        assert our_nodes[nid] == attrs, f"attr mismatch for {nid}"


def test_phantom_nodes():
    # Reference quirk we reproduce: converter-produced nodes carry a
    # `__class__` attr, which is itself "meaningful", so they are never
    # phantom — even with all data fields None/empty.
    class Ghost(BaseModel):
        name: str | None = None
        notes: list[str] = []
        model_config = {"graph_id_fields": ["name"]}

    reg = TemplateRegistry().add(TemplateSpec("Ghost", id_fields=("name",)))
    nodes, edges = k_graph.flatten_models([("Ghost", Ghost().model_dump())], reg)
    cleaned_nodes, _ = k_graph.clean_graph(nodes, edges)
    conv = ref_converter_mod.GraphConverter(validate_graph=False, auto_cleanup=True)
    g, _ = conv.pydantic_list_to_graph([Ghost()])
    assert {n["id"] for n in cleaned_nodes} == set(g.nodes())

    # True phantoms (no __class__, e.g. cleaner used standalone) are dropped
    # by both implementations.
    raw_nodes = [{"id": "n1", "label": "X", "type": "entity", "val": None}]
    raw_edges = [("n1", "n1", "self")]
    cn, ce = k_graph.clean_graph(raw_nodes, raw_edges)
    assert cn == [] and ce == []


def test_stats_match_reference_shape():
    models = CASES[0]
    ref_nodes, ref_edges = _ref_graph(models)
    our_nodes_map, our_edges_map = _our_graph(models)
    stats = k_graph.graph_stats(
        list(our_nodes_map.values()),
        [(s, d, l) for (s, d), l in our_edges_map.items()],
    )
    assert stats["node_count"] == len(ref_nodes)
    assert stats["edge_count"] == len(ref_edges)

"""Replay the reference's own converter test scenarios through BOTH
implementations and assert identical graphs.

Scenarios mirror
`/root/reference/tests/unit/core/converters/test_component_entity_handling.py`
(component embedding, entity separation, entity dedup by id fields, edge
creation, invoice regression) and
`/root/reference/tests/unit/core/converters/test_edge_case_fixes.py`
(empty lists, phantom whitespace nodes, node-id collision rules).  The
pydantic template classes are the reference tests' own shapes; our side
derives its TemplateRegistry from those classes via
``templates.registry_from_pydantic`` — the migration path a reference user
would take.
"""

from __future__ import annotations

from typing import Any, List, Optional

import pytest
from pydantic import BaseModel, ConfigDict, Field

from docling_graph_spark.kernels import graph_build as k_graph
from docling_graph_spark.kernels.fingerprint import node_id
from docling_graph_spark.templates import registry_from_pydantic

from .ref_loader import load_ref

ref_converter_mod = load_ref("core/converters/graph_converter.py")


def edge(label: str, **kwargs: Any) -> Any:
    """The reference docs' edge() helper
    (`/root/reference/tests/unit/core/converters/test_component_entity_handling.py:19-21`)."""
    return Field(..., json_schema_extra={"edge_label": label}, **kwargs)


# --- template family: test_component_entity_handling.py:25-101 ---------------

class Address(BaseModel):
    model_config = ConfigDict(is_entity=False)
    street: str = Field(...)
    city: str = Field(...)
    postal_code: Optional[str] = Field(None)


class MonetaryAmount(BaseModel):
    model_config = ConfigDict(is_entity=False)
    value: float = Field(...)
    currency: str = Field(...)


class ContactInfo(BaseModel):
    model_config = ConfigDict(is_entity=False)
    email: Optional[str] = Field(None)
    phone: Optional[str] = Field(None)


class Organization(BaseModel):
    model_config = ConfigDict(graph_id_fields=["name"])
    name: str = Field(...)
    tax_id: Optional[str] = Field(None)
    address: Address = edge(label="LOCATED_AT")
    contact: Optional[ContactInfo] = Field(None)


class Person(BaseModel):
    model_config = ConfigDict(graph_id_fields=["first_name", "last_name"])
    first_name: str = Field(...)
    last_name: str = Field(...)
    address: Address = edge(label="LIVES_AT")


class Invoice(BaseModel):
    model_config = ConfigDict(graph_id_fields=["invoice_number"])
    invoice_number: str = Field(...)
    date: str = Field(...)
    issued_by: Organization = edge(label="ISSUED_BY")
    sent_to: Person = edge(label="SENT_TO")
    total: MonetaryAmount = Field(...)


# --- template family: test_edge_case_fixes.py:27-66 --------------------------

class ECPerson(BaseModel):
    model_config = ConfigDict(graph_id_fields=["name"])
    name: str = Field(...)
    age: Optional[int] = Field(None)


class ECOrganization(BaseModel):
    model_config = ConfigDict(graph_id_fields=["name"])
    name: str = Field(...)
    employees: List[ECPerson] = Field(default_factory=list)
    addresses: List[Address] = Field(default_factory=list)
    tags: List[str] = Field(default_factory=list)


class ECPersonEntity(BaseModel):
    model_config = ConfigDict(graph_id_fields=["name"])
    name: str = Field(...)


# --- dual-run helpers ---------------------------------------------------------

def _ref_graph(models, *, cleanup=True, reverse=False):
    conv = ref_converter_mod.GraphConverter(
        add_reverse_edges=reverse, validate_graph=False, auto_cleanup=cleanup
    )
    graph, _meta = conv.pydantic_list_to_graph(models)
    nodes = {nid: dict(data) for nid, data in graph.nodes(data=True)}
    edges = {(s, t): data.get("label") for s, t, data in graph.edges(data=True)}
    return nodes, edges


def _our_graph(models, *, cleanup=True, reverse=False):
    reg = registry_from_pydantic(*{type(m) for m in models})
    records = [(m.__class__.__name__, m.model_dump()) for m in models]
    nodes, edges = k_graph.flatten_models(records, reg, reverse)
    if cleanup:
        nodes, edges = k_graph.clean_graph(nodes, edges)
    else:
        # uncleaned reference graph is still an nx.DiGraph: parallel
        # (src, dst) edges collapse at insert, last label wins
        collapsed = {}
        for s, d, l in edges:
            collapsed[(s, d)] = l
        return {n["id"]: n for n in nodes}, collapsed
    return {n["id"]: n for n in nodes}, {(s, d): l for s, d, l in edges}


def assert_graph_parity(models, *, cleanup=True, reverse=False):
    ref_nodes, ref_edges = _ref_graph(models, cleanup=cleanup, reverse=reverse)
    our_nodes, our_edges = _our_graph(models, cleanup=cleanup, reverse=reverse)
    assert set(our_nodes) == set(ref_nodes)
    assert our_edges == ref_edges
    for nid, attrs in ref_nodes.items():
        assert our_nodes[nid] == attrs, f"attr mismatch for {nid}"
    return ref_nodes, ref_edges


ORG = Organization(
    name="Acme Corp",
    tax_id="TAX-123",
    address=Address(street="123 Main St", city="Paris", postal_code="75001"),
    contact=ContactInfo(email="contact@acme.com", phone="+33123456789"),
)
INVOICE = Invoice(
    invoice_number="INV-001",
    date="2024-01-15",
    issued_by=Organization(
        name="Acme Corp", address=Address(street="123 Main St", city="Paris")
    ),
    sent_to=Person(
        first_name="John", last_name="Doe",
        address=Address(street="456 Oak Ave", city="London"),
    ),
    total=MonetaryAmount(value=1000.00, currency="EUR"),
)


# --- component embedding (test_component_entity_handling.py:104-210) ----------

def test_component_embedded_in_entity_node():
    nodes, _ = assert_graph_parity([ORG])
    (org_attrs,) = [a for a in nodes.values() if a["label"] == "Organization"]
    assert org_attrs["address"] == {
        "street": "123 Main St", "city": "Paris", "postal_code": "75001"}
    assert org_attrs["contact"] == {
        "email": "contact@acme.com", "phone": "+33123456789"}


def test_component_not_created_as_separate_node():
    nodes, edges = assert_graph_parity([ORG])
    assert len(nodes) == 1  # no Address / ContactInfo nodes
    assert edges == {}      # edge() helper on a component embeds, no edge


def test_multiple_entities_share_same_component():
    shared = Address(street="1 Shared Way", city="Lyon")
    models = [
        Person(first_name="A", last_name="One", address=shared),
        Person(first_name="B", last_name="Two", address=shared),
    ]
    nodes, _ = assert_graph_parity(models)
    assert len(nodes) == 2
    for attrs in nodes.values():
        assert attrs["address"]["city"] == "Lyon"


# --- entity separation + dedup (":212-301") -----------------------------------

def test_entity_creates_separate_node_with_edge():
    nodes, edges = assert_graph_parity([INVOICE])
    labels = {a["label"] for a in nodes.values()}
    assert labels == {"Invoice", "Organization", "Person"}
    assert set(edges.values()) == {"ISSUED_BY", "SENT_TO"}
    (inv,) = [a for a in nodes.values() if a["label"] == "Invoice"]
    assert inv["issued_by"] is None and inv["sent_to"] is None
    assert inv["total"] == {"value": 1000.0, "currency": "EUR"}


def test_entity_deduplication_by_id_fields():
    addr = Address(street="9 Dup St", city="Nice")
    models = [
        Organization(name="Acme Corp", address=addr),
        Organization(name="Acme Corp", address=addr),  # same id fields
        Organization(name="Other Co", address=addr),
    ]
    nodes, _ = assert_graph_parity(models)
    assert len(nodes) == 2


def test_reverse_edges_parity():
    nodes, edges = assert_graph_parity([INVOICE], reverse=True)
    assert "reverse_ISSUED_BY" in set(edges.values())
    assert "reverse_SENT_TO" in set(edges.values())


# --- regression: invoice with all components (":364-432") ---------------------

def test_invoice_with_all_components():
    nodes, edges = assert_graph_parity([INVOICE])
    assert len(nodes) == 3 and len(edges) == 2
    (org,) = [a for a in nodes.values() if a["label"] == "Organization"]
    (person,) = [a for a in nodes.values() if a["label"] == "Person"]
    assert org["address"]["street"] == "123 Main St"
    assert person["address"]["street"] == "456 Oak Ave"


# --- empty lists (test_edge_case_fixes.py:69-159) -----------------------------

@pytest.mark.parametrize("cleanup", [False, True])
def test_empty_lists_preserved(cleanup):
    org = ECOrganization(name="Test Corp", employees=[], addresses=[], tags=[])
    nodes, _ = assert_graph_parity([org], cleanup=cleanup)
    if nodes:  # with cleanup, name field keeps the node meaningful → survives
        (attrs,) = nodes.values()
        assert attrs["employees"] == [] and attrs["addresses"] == []
        assert attrs["tags"] == []


def test_mixed_empty_and_populated_lists():
    org = ECOrganization(
        name="Test Corp",
        employees=[ECPerson(name="Alice", age=30)],
        addresses=[Address(street="123 Main St", city="Paris")],
        tags=[],
    )
    nodes, edges = assert_graph_parity([org])
    assert len(nodes) == 2  # org + person; address embedded
    (org_attrs,) = [a for a in nodes.values() if a["label"] == "ECOrganization"]
    assert org_attrs["tags"] == []
    assert org_attrs["employees"] is None
    assert isinstance(org_attrs["addresses"], list)
    assert list(edges.values()) == ["employees"]  # no edge() helper → field name


# --- phantom whitespace nodes (":238-258") ------------------------------------

def test_phantom_whitespace_node_dropped_by_cleaner():
    # standalone-cleaner semantics: a node whose only non-metadata field is
    # whitespace is phantom (graph_cleaner.py:129-175); converter-produced
    # nodes always carry __class__ so they survive — both sides agree.
    class Ghosty(BaseModel):
        model_config = ConfigDict(graph_id_fields=["name"])
        name: str = Field(...)

    nodes, _ = assert_graph_parity([Ghosty(name="   ")])
    # reference: __class__ is meaningful → node survives in both
    assert len(nodes) == 1


# --- node-id collision rules (":261-323") -------------------------------------

def test_exact_class_name_matching_no_collision():
    p = ECPerson(name="Chris", age=None)
    pe = ECPersonEntity(name="Chris")
    ref_reg = load_ref("core/converters/node_id_registry.py").NodeIDRegistry()
    ref_p = ref_reg.get_node_id(p)
    ref_pe = ref_reg.get_node_id(pe)
    our_p = node_id(p.model_dump(), "ECPerson", ("name",))
    our_pe = node_id(pe.model_dump(), "ECPersonEntity", ("name",))
    assert our_p == ref_p and our_pe == ref_pe
    assert our_p != our_pe  # class name participates in the fingerprint


# --- registry_from_pydantic derivation ----------------------------------------

def test_registry_derivation_matches_reference_metadata():
    reg = registry_from_pydantic(Invoice)
    inv = reg.get("Invoice")
    assert inv.is_entity and inv.id_fields == ("invoice_number",)
    assert inv.edge_label_for("issued_by") == "ISSUED_BY"
    assert inv.edge_label_for("sent_to") == "SENT_TO"
    assert inv.edge_label_for("total") == "total"  # plain Field → field name
    assert set(inv.children) == {"issued_by", "sent_to", "total"}
    assert not reg.get("MonetaryAmount").is_entity
    assert not reg.get("Address").is_entity
    org = reg.get("Organization")
    assert org.children["contact"] == "ContactInfo"  # via Optional[...]
    ec = registry_from_pydantic(ECOrganization)
    assert ec.get("ECOrganization").children == {
        "employees": "ECPerson", "addresses": "Address"}  # tags: List[str] skipped


# --- standalone cleaner scenario (tests/unit/core/utils/test_graph_cleaner.py:17-71)

def test_dirty_graph_cleaner_scenario():
    """The reference's canonical dirty graph (semantic duplicate, phantom,
    duplicate edge, orphan edge) through the REAL GraphCleaner and through
    our kernel clean_graph on the same raw attrs."""
    import networkx as nx
    cleaner_mod = load_ref("core/utils/graph_cleaner.py")

    g = nx.DiGraph()
    g.add_node("node-1", name="Alice")
    g.add_node("node-2", name="Acme")
    g.add_node("node-3", name="Bob")
    g.add_node("node-4", name="Alice")                  # semantic duplicate
    g.add_node("phantom-1", id="phantom-1", label="Person")  # phantom
    g.add_edge("node-1", "node-2", label="WORKS_AT")
    g.add_edge("node-1", "node-2", label="WORKS_AT")    # duplicate edge
    g.add_edge("node-4", "node-2", label="WORKS_AT")    # from the duplicate
    g.add_edge("node-3", "phantom-1", label="KNOWS")    # into the phantom
    g.add_edge("node-1", "node-99", label="ORPHAN")     # dangling endpoint

    ref = cleaner_mod.GraphCleaner(verbose=False).clean_graph(g)
    ref_nodes = {n: dict(d) for n, d in ref.nodes(data=True)}
    ref_edges = {(s, t): d.get("label") for s, t, d in ref.edges(data=True)}

    nodes = [
        {"id": "node-1", "name": "Alice"},
        {"id": "node-2", "name": "Acme"},
        {"id": "node-3", "name": "Bob"},
        {"id": "node-4", "name": "Alice"},
        {"id": "phantom-1", "label": "Person"},
    ]
    edges = [
        ("node-1", "node-2", "WORKS_AT"),
        ("node-1", "node-2", "WORKS_AT"),
        ("node-4", "node-2", "WORKS_AT"),
        ("node-3", "phantom-1", "KNOWS"),
        ("node-1", "node-99", "ORPHAN"),
    ]
    our_nodes, our_edges = k_graph.clean_graph(nodes, edges)
    assert {n["id"] for n in our_nodes} == set(ref_nodes)
    assert {(s, d): l for s, d, l in our_edges} == ref_edges
    for n in our_nodes:
        attrs = {k: v for k, v in n.items() if k != "id"}
        ref_attrs = {k: v for k, v in ref_nodes[n["id"]].items() if k != "id"}
        assert attrs == ref_attrs, n["id"]


# --- one-to-one strategy: shared visited_ids across sequential models --------
# (`strategies/one_to_one.py:95-141` returns one partial model per page;
# `graph_converter.py:206-209` checks visited BEFORE recursing, so a
# duplicate root prunes its WHOLE subtree: later models with the same root
# id contribute nothing — their new children are never created and their
# dangling edges die in the orphan pass.  The Spark one-to-one path
# reproduces this by flattening each document's records in one kernel call
# with a shared visited set.)

class PartialTag(BaseModel):
    model_config = ConfigDict(graph_id_fields=["name"])
    name: str = Field(...)


class PartialDoc(BaseModel):
    model_config = ConfigDict(graph_id_fields=["ref"])
    ref: str = Field(...)
    date: Optional[str] = Field(None)
    total: Optional[float] = Field(None)
    tag: Optional[PartialTag] = Field(
        None, json_schema_extra={"edge_label": "TAGGED"}
    )


M_DATE = PartialDoc(ref="DOC-9", date="2024-01-15")
M_TOTAL = PartialDoc(ref="DOC-9", total=42.5,
                     tag=PartialTag(name="archived"))
M_CREDIT = PartialDoc(ref="CN-9", tag=PartialTag(name="archived"))


@pytest.mark.parametrize("order", ["date_first", "total_first"])
def test_one_to_one_first_model_wins_and_prunes_subtree(order):
    models = ([M_DATE, M_TOTAL] if order == "date_first"
              else [M_TOTAL, M_DATE])
    ref_nodes, ref_edges = assert_graph_parity(models)

    doc = next(a for a in ref_nodes.values() if a["label"] == "PartialDoc")
    if order == "date_first":
        # duplicate-root subtree pruned: the SECOND model's brand-new child
        # entity is never created and its dangling edge dies in the orphan
        # pass — first model's property subset sticks
        assert len(ref_nodes) == 1 and ref_edges == {}
        assert doc.get("date") == "2024-01-15" and doc.get("total") is None
    else:
        # tag-carrying model first: child + edge land, date model pruned
        assert len(ref_nodes) == 2
        assert list(ref_edges.values()) == ["TAGGED"]
        assert doc.get("total") == 42.5 and doc.get("date") is None


def test_one_to_one_new_root_still_contributes_children():
    # page 3 has a DIFFERENT root (credit note): its child entity lands.
    # Notably the PRUNED page-2 model's edge survives too — the reference's
    # edges pass has no visited check, so a dangling edge lives whenever its
    # endpoint gets created via any other model before the orphan pass.
    ref_nodes, ref_edges = assert_graph_parity([M_DATE, M_TOTAL, M_CREDIT])
    labels = sorted(n["label"] for n in ref_nodes.values())
    assert labels == ["PartialDoc", "PartialDoc", "PartialTag"]
    assert sorted(ref_edges.values()) == ["TAGGED", "TAGGED"]
    srcs = {ref_nodes[s].get("ref") for (s, _t) in ref_edges}
    assert srcs == {"DOC-9", "CN-9"}


# --- file-loaded template through the loader (stages.py:286-365) --------------

def test_file_loaded_template_matches_reference_converter():
    """Load the repo's example template FILE via load_template (the
    reference's string-path loading, `pipeline/stages.py:286-365`), build
    instances of the loaded classes, and assert our registry-driven graph
    equals the reference GraphConverter's on the same instances — the full
    migration path of a reference user pointing at their template file."""
    import os
    import sys

    from docling_graph_spark.templates import load_template

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    Policy = load_template(os.path.join(
        repo, "examples", "templates", "insurance.py") + ":InsurancePolicy")
    mod = sys.modules[Policy.__module__]

    def policy(n, holder, codes):
        return mod.InsurancePolicy(
            policy_number=f"POL-{n}",
            start_date="2024-02-01",
            premium=mod.Money(amount=10.0 * n, currency="EUR"),
            policyholder=mod.Person(
                full_name=f"Holder {holder}",
                email=f"holder{holder}@example.com",
            ),
            coverages=[mod.Coverage(code=f"C-{c}", peril=f"peril {c}")
                       for c in codes],
        )

    # two policies share the holder and one coverage code: entity dedup by
    # graph_id_fields must collapse them in both implementations
    models = [policy(1, 7, [1, 2]), policy(2, 7, [2, 3])]
    ref_nodes, ref_edges = assert_graph_parity(models)
    labels = sorted(a["label"] for a in ref_nodes.values())
    assert labels == ["Coverage", "Coverage", "Coverage",
                      "InsurancePolicy", "InsurancePolicy", "Person"]
    assert sorted(ref_edges.values()) == [
        "held_by", "held_by",
        "provides_coverage", "provides_coverage",
        "provides_coverage", "provides_coverage",
    ]

"""Template loading by string path (reference TemplateLoadingStage,
`/root/reference/docling_graph/pipeline/stages.py:286-365`): dotted-path
import with cwd fallback, explicit file-path form, validation errors, and
registry derivation from the loaded classes."""

from __future__ import annotations

import os

import pytest

from docling_graph_spark.templates import (
    load_template,
    registry_from_pydantic,
    registry_from_template_path,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TEMPLATE_FILE = os.path.join(REPO, "examples", "templates", "insurance.py")


def test_load_by_file_path():
    cls = load_template(TEMPLATE_FILE + ":InsurancePolicy")
    assert cls.__name__ == "InsurancePolicy"
    assert "policy_number" in cls.model_fields


def test_load_by_dotted_path_with_cwd_fallback(monkeypatch):
    # the module is NOT importable from an arbitrary cwd; the loader's cwd
    # fallback (reference stages.py:336-351) must kick in at the repo root
    import sys

    for mod in [m for m in sys.modules if m.startswith("examples")]:
        del sys.modules[mod]
    monkeypatch.chdir(REPO)
    sys_path_before = list(sys.path)
    cls = load_template("examples.templates.insurance.InsurancePolicy")
    assert cls.__name__ == "InsurancePolicy"
    # cwd fallback must clean up after itself
    assert sys.path == sys_path_before


def test_registry_from_loaded_template():
    reg, root = registry_from_template_path(
        TEMPLATE_FILE + ":InsurancePolicy"
    )
    assert root == "InsurancePolicy"
    spec = reg.get("InsurancePolicy")
    assert spec.id_fields == ("policy_number",)
    # edge() metadata from the file drives the labels
    assert spec.edge_label_for("policyholder") == "held_by"
    assert spec.edge_label_for("coverages") == "provides_coverage"
    # transitively-discovered children
    assert spec.children == {
        "premium": "Money",
        "policyholder": "Person",
        "coverages": "Coverage",
    }
    assert reg.get("Money").is_entity is False
    assert reg.get("Person").id_fields == ("email",)
    assert reg.get("Coverage").id_fields == ("code",)


def test_load_rejects_dotless_path():
    with pytest.raises(ValueError, match="at least one dot"):
        load_template("JustAClassName")


def test_load_rejects_non_model_object():
    with pytest.raises(TypeError, match="pydantic BaseModel"):
        load_template("os.path.join")


def test_load_missing_module_raises():
    with pytest.raises(ModuleNotFoundError):
        load_template("no.such.module.Klass")


def test_loaded_template_flattens_to_expected_graph():
    """End-to-end through the kernel: file → registry → flatten → graph."""
    from docling_graph_spark.kernels import graph_build as k_graph

    cls = load_template(TEMPLATE_FILE + ":InsurancePolicy")
    reg = registry_from_pydantic(cls)
    record = {
        "policy_number": "POL-9",
        "start_date": "2024-02-03",
        "premium": {"amount": 120.0, "currency": "EUR"},
        "policyholder": {"full_name": "Holder 9",
                         "email": "holder9@example.com"},
        "coverages": [
            {"code": "C-1", "peril": "peril 1"},
            {"code": "C-2", "peril": "peril 2"},
        ],
    }
    nodes, edges = k_graph.flatten_models(
        [("InsurancePolicy", record)], reg
    )
    nodes, edges = k_graph.clean_graph(nodes, edges)
    labels = sorted(n["label"] for n in nodes)
    assert labels == ["Coverage", "Coverage", "InsurancePolicy", "Person"]
    assert sorted(lbl for _, _, lbl in edges) == [
        "held_by", "provides_coverage", "provides_coverage"
    ]
    (policy,) = [n for n in nodes if n["label"] == "InsurancePolicy"]
    # component embedded, entity fields nulled
    assert policy["premium"] == {"amount": 120.0, "currency": "EUR"}
    assert policy["policyholder"] is None and policy["coverages"] is None

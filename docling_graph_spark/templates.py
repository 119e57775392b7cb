"""Declarative extraction-template descriptors.

The reference drives extraction and graph shape with Pydantic classes whose
``model_config`` carries ``is_entity`` / ``graph_id_fields`` and whose fields
may carry ``json_schema_extra={"edge_label": ...}``
(`/root/reference/docling_graph/core/converters/graph_converter.py:26-47,
326-337`).  Here a template is a plain descriptor: a name, an entity flag,
identity fields, per-field edge labels, and which fields hold nested child
templates.  Descriptors are static per run, so the Spark plan (StructType
schemas, explode depth) is compiled from them at plan-build time.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Mapping, Optional, Tuple


@dataclass(frozen=True)
class TemplateSpec:
    """Schema + graph metadata for one model class."""

    name: str
    is_entity: bool = True
    id_fields: Tuple[str, ...] = ()
    # field name -> explicit edge label (defaults to the field name)
    edge_labels: Mapping[str, str] = field(default_factory=dict)
    # field name -> child template name; the field value is a dict or a
    # list of dicts shaped like that child template
    children: Mapping[str, str] = field(default_factory=dict)

    def edge_label_for(self, field_name: str) -> str:
        return self.edge_labels.get(field_name, field_name)


class TemplateRegistry:
    """Lookup of template specs by class name."""

    def __init__(self, specs: Optional[Mapping[str, TemplateSpec]] = None) -> None:
        self._specs: Dict[str, TemplateSpec] = dict(specs or {})

    def add(self, spec: TemplateSpec) -> "TemplateRegistry":
        self._specs[spec.name] = spec
        return self

    def get(self, name: str) -> TemplateSpec:
        return self._specs[name]

    def __contains__(self, name: str) -> bool:
        return name in self._specs


def registry_from_pydantic(*model_classes: type) -> TemplateRegistry:
    """Derive a :class:`TemplateRegistry` from reference-style pydantic
    template classes, so users of the reference can pass their existing
    templates unchanged.

    Mirrors the reference's dynamic config/metadata reads
    (`/root/reference/docling_graph/core/converters/graph_converter.py:26-47`
    ``get_model_config_value``: ``is_entity`` default True,
    ``graph_id_fields`` default empty; `:326-337` ``_get_edge_label``:
    ``json_schema_extra["edge_label"]`` when it is a string), resolved
    statically from the class annotations instead of per-instance —
    nested child templates are discovered by walking each field's type
    annotation for pydantic-model arguments (``Child``, ``Optional[Child]``,
    ``List[Child]``) and registered transitively.
    """
    import typing

    def _child_model(annotation) -> Optional[type]:
        stack = [annotation]
        while stack:
            ann = stack.pop()
            if isinstance(ann, type):
                if hasattr(ann, "model_fields") and hasattr(ann, "model_config"):
                    return ann
                continue
            stack.extend(typing.get_args(ann))
        return None

    reg = TemplateRegistry()
    queue = list(model_classes)
    while queue:
        cls = queue.pop(0)
        name = cls.__name__
        if name in reg:
            continue
        config = cls.model_config
        edge_labels: Dict[str, str] = {}
        children: Dict[str, str] = {}
        for field_name, field_info in cls.model_fields.items():
            extra = getattr(field_info, "json_schema_extra", None)
            if isinstance(extra, Mapping):
                label = extra.get("edge_label")
                if isinstance(label, str):
                    edge_labels[field_name] = label
            child = _child_model(field_info.annotation)
            if child is not None:
                children[field_name] = child.__name__
                queue.append(child)
        reg.add(TemplateSpec(
            name,
            is_entity=bool(config.get("is_entity", True)),
            id_fields=tuple(config.get("graph_id_fields", ()) or ()),
            edge_labels=edge_labels,
            children=children,
        ))
    return reg


def sample_registry() -> TemplateRegistry:
    """The reference test-fixture template family
    (`/root/reference/tests/fixtures/sample_templates/test_template.py`)."""
    reg = TemplateRegistry()
    reg.add(TemplateSpec("SampleInvoice", id_fields=("invoice_number",)))
    reg.add(TemplateSpec("SamplePerson", id_fields=("email",)))
    reg.add(TemplateSpec(
        "SampleCompany",
        id_fields=("company_name",),
        children={"employees": "SamplePerson"},
    ))
    reg.add(TemplateSpec("AddressModel", is_entity=False))
    return reg


def web_registry() -> TemplateRegistry:
    """Templates for the Common-Crawl-style corpus: a document entity whose
    mentions link to term entities (north-star graph: document/chunk/entity/
    mention)."""
    reg = TemplateRegistry()
    reg.add(TemplateSpec(
        "WebDocument",
        id_fields=("url",),
        children={"mentions": "Term"},
        edge_labels={"mentions": "mentions"},
    ))
    reg.add(TemplateSpec("Term", id_fields=("term", "kind")))
    return reg

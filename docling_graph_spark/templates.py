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


def load_template(template_str: str) -> type:
    """Load a template class by string path — the reference's
    ``TemplateLoadingStage._load_from_string``
    (`/root/reference/docling_graph/pipeline/stages.py:286-365`) so a user
    with an existing ``docs/examples/templates/insurance.py`` can point at
    it unchanged.

    Accepted forms:

    * dotted path ``pkg.module.ClassName`` — imported as-is; on
      ``ModuleNotFoundError`` the current working directory is temporarily
      prepended to ``sys.path`` and the import retried (the reference's
      cwd fallback), then removed again;
    * file path ``path/to/file.py:ClassName`` — loaded directly via
      importlib spec (rebuild extension: the reference reaches files only
      through the cwd fallback; an explicit path avoids depending on the
      caller's cwd, which a Spark driver rarely controls).

    The loaded object must be a pydantic-model-like class (``model_fields``
    + ``model_config``) so :func:`registry_from_pydantic` can derive the
    graph metadata; anything else raises ``TypeError`` (the reference
    raises ConfigurationError for non-BaseModel objects).
    """
    import importlib
    import importlib.util
    import os
    import sys

    def _validate(obj) -> type:
        if not isinstance(obj, type) or not (
            hasattr(obj, "model_fields") and hasattr(obj, "model_config")
        ):
            raise TypeError(
                f"template must be a pydantic BaseModel subclass, got "
                f"{type(obj).__name__} from {template_str!r}"
            )
        return obj

    if ":" in template_str and template_str.rsplit(":", 1)[0].endswith(".py"):
        file_path, class_name = template_str.rsplit(":", 1)
        if not os.path.isabs(file_path):
            file_path = os.path.abspath(file_path)
        mod_name = "_dgspark_template_" + os.path.splitext(
            os.path.basename(file_path)
        )[0]
        spec = importlib.util.spec_from_file_location(mod_name, file_path)
        if spec is None or spec.loader is None:
            raise ImportError(f"cannot load template file {file_path!r}")
        module = importlib.util.module_from_spec(spec)
        # register before exec: pydantic class machinery and pickling (UDF
        # closures capture the classes) both resolve __module__ via
        # sys.modules; repeat loads of the same file reuse the entry
        sys.modules[mod_name] = module
        spec.loader.exec_module(module)
        return _validate(getattr(module, class_name))

    if "." not in template_str:
        raise ValueError(
            f"template path must contain at least one dot: {template_str!r} "
            "(example: module.Class)"
        )
    module_path, class_name = template_str.rsplit(".", 1)
    try:
        module = importlib.import_module(module_path)
    except ModuleNotFoundError:
        cwd = os.getcwd()
        if cwd not in sys.path:
            sys.path.insert(0, cwd)
            try:
                module = importlib.import_module(module_path)
            finally:
                if cwd in sys.path:
                    sys.path.remove(cwd)
        else:
            raise
    return _validate(getattr(module, class_name))


def registry_from_template_path(template_str: str):
    """One-call migration path: string template path → (registry, root
    class name), ready for ``graph_from_template_records``."""
    cls = load_template(template_str)
    return registry_from_pydantic(cls), cls.__name__


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

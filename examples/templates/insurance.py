"""Insurance extraction template — a user-side template file.

This is the rebuild's analogue of a reference user's template module
(cf. `/root/reference/docs/examples/templates/insurance.py` for the
pattern: an ``edge()`` helper carrying ``json_schema_extra['edge_label']``,
``is_entity=False`` component models, ``graph_id_fields`` identity): a
self-contained pydantic file that `docling_graph_spark.templates.
load_template` imports by dotted or file path, exactly how the reference's
TemplateLoadingStage consumes user templates.  The model family here is
original to the rebuild (different fields/structure), chosen to exercise
every loader-visible feature: explicit edge labels, a non-entity component
embedded in its parent, a nested entity, and a list of nested entities.
"""

from typing import Any, List, Optional

from pydantic import BaseModel, ConfigDict, Field


def edge(label: str, **kwargs: Any) -> Any:
    """Field with graph edge metadata (json_schema_extra.edge_label)."""
    return Field(default=None, json_schema_extra={"edge_label": label}, **kwargs)


class Money(BaseModel):
    """Value object: merged into its parent's properties, never a node."""

    model_config = ConfigDict(is_entity=False)

    amount: Optional[float] = None
    currency: Optional[str] = None


class Person(BaseModel):
    """Policyholder entity, identified by email."""

    model_config = ConfigDict(is_entity=True, graph_id_fields=["email"])

    full_name: Optional[str] = None
    email: Optional[str] = None


class Coverage(BaseModel):
    """One coverage line on a policy, identified by its code."""

    model_config = ConfigDict(is_entity=True, graph_id_fields=["code"])

    code: Optional[str] = None
    peril: Optional[str] = None


class InsurancePolicy(BaseModel):
    """Root template: one policy document."""

    model_config = ConfigDict(is_entity=True, graph_id_fields=["policy_number"])

    policy_number: Optional[str] = None
    start_date: Optional[str] = None
    premium: Optional[Money] = None
    policyholder: Optional[Person] = edge("held_by")
    coverages: Optional[List[Coverage]] = edge("provides_coverage")

"""Batched deterministic extractors (the LLM-backend replacement).

The reference sends chunk batches to an LLM and validates the JSON response
against the template (`/root/reference/docling_graph/core/extractors/backends/
llm_backend.py:97-171`).  Per the north star those calls are replaced with
deterministic rule/regex extractors producing the same template-shaped
records, so the downstream merge/graph stages are exercised identically and
reproducibly.

Two extractor families:

* :func:`extract_mentions` — generic web-corpus extractor: term mentions
  (regex tokens) + emails + years, emitted as Term child records of a
  WebDocument record.  Simple enough to re-express both JVM-side
  (``regexp_extract_all``) and in a DuckDB oracle.
* :class:`FieldRuleExtractor` — labelled-field extractor for invoice-style
  templates ("Invoice Number: INV-1 ..."), mirroring the reference's sample
  templates (`/root/reference/tests/fixtures/sample_templates/test_template.py`).
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, List, Mapping, Optional, Sequence

TERM_RE = re.compile(r"[a-z]{5,}")
EMAIL_RE = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
YEAR_RE = re.compile(r"\b(1[89][0-9]{2}|20[0-9]{2})\b")


def extract_terms(text: str) -> List[str]:
    """All lowercase word tokens of length >= 5 (with repeats, in order)."""
    return TERM_RE.findall(text.lower())


def extract_mentions(text: str) -> List[Dict[str, str]]:
    """Mention records {term, kind} for the WebDocument/Term templates.

    Distinct per (term, kind), first-occurrence order (the downstream graph
    dedups on identity fields anyway; keeping them distinct here mirrors the
    reference's per-model entity lists)."""
    out: List[Dict[str, str]] = []
    seen = set()
    for term in extract_terms(text):
        key = (term, "term")
        if key not in seen:
            seen.add(key)
            out.append({"term": term, "kind": "term"})
    for email in EMAIL_RE.findall(text):
        key = (email.lower(), "email")
        if key not in seen:
            seen.add(key)
            out.append({"term": email.lower(), "kind": "email"})
    for year in YEAR_RE.findall(text):
        key = (year, "year")
        if key not in seen:
            seen.add(key)
            out.append({"term": year, "kind": "year"})
    return out


class FieldRuleExtractor:
    """Extract labelled fields from text into a template-shaped record.

    rules: field -> (regex with one capture group, optional converter).
    Missing fields yield None (downstream merge fills them from other chunks —
    the zero-data-loss contract of the reference's partial extraction).
    """

    def __init__(
        self,
        class_name: str,
        rules: Mapping[str, str],
        converters: Optional[Mapping[str, Callable[[str], Any]]] = None,
        list_fields: Sequence[str] = (),
    ) -> None:
        self.class_name = class_name
        self.rules = {f: re.compile(p, re.MULTILINE) for f, p in rules.items()}
        self.converters = dict(converters or {})
        self.list_fields = frozenset(list_fields)

    def extract(self, text: str) -> Dict[str, Any]:
        record: Dict[str, Any] = {}
        for field, pattern in self.rules.items():
            conv = self.converters.get(field)
            if field in self.list_fields:
                values = [m if isinstance(m, str) else m[0]
                          for m in pattern.findall(text)]
                record[field] = [conv(v) if conv else v for v in values]
            else:
                m = pattern.search(text)
                if m:
                    value = m.group(1).strip()
                    record[field] = conv(value) if conv else value
                else:
                    record[field] = None
        return record


def sample_invoice_extractor() -> FieldRuleExtractor:
    """Extractor matching the reference's SampleInvoice fixture template."""
    return FieldRuleExtractor(
        "SampleInvoice",
        rules={
            "invoice_number": r"Invoice Number:\s*(\S+)",
            "date": r"Date:\s*(\S+)",
            "total_amount": r"Total Amount:\s*([0-9.]+)",
            "vendor_name": r"Vendor:\s*([^\n]+)",
            "items": r"Item:\s*([^\n]+)",
        },
        converters={"total_amount": float},
        list_fields=("items",),
    )

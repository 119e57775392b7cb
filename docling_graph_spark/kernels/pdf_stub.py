"""Deterministic PDF text extraction for the binary-payload branch.

The reference parses PDFs with Docling's converter
(`/root/reference/docling_graph/core/extractors/document_processor.py:97-115`).
No PDF/layout libraries ship in this container, so per the multimodal-stub
guidance the *decode* step is a deterministic fake while everything Spark-side
(magic-byte routing, binary column handling, UDF batch shape, schema) is real:

* real PDFs from a production corpus would be parsed by a layout model behind
  this same function signature;
* the synthetic corpus embeds payloads in a self-describing fake container
  (``%PDF-1.4`` magic + a marked text stream), which this parser extracts —
  keeping the end-to-end byte-identity invariant testable.
"""

from __future__ import annotations

from typing import Optional, Tuple

PDF_MAGIC = b"%PDF"
_STREAM_START = b"\nstream\n"
_STREAM_END = b"\nendstream"


def is_pdf(payload: Optional[bytes]) -> bool:
    return bool(payload) and payload[:4] == PDF_MAGIC


def make_fake_pdf(text: str) -> bytes:
    """Build the deterministic fake-PDF container used by the synthetic corpus."""
    body = text.encode("utf-8")
    return (
        b"%PDF-1.4\n%dgspark synthetic single-stream document\n"
        b"1 0 obj\n<< /Type /DGText /Length " + str(len(body)).encode()
        + b" >>" + _STREAM_START + body + _STREAM_END
        + b"\nendobj\ntrailer\n%%EOF\n"
    )


def extract_pdf_text(payload: bytes) -> Tuple[str, Optional[str]]:
    """Extract text from the fake container; (text, error)."""
    if not is_pdf(payload):
        return "", "not a PDF payload"
    start = payload.find(_STREAM_START)
    if start == -1 or b"/DGText" not in payload[:start]:
        # A real PDF (not our fake container): parse it with the minimal
        # pure-stdlib content-stream parser (kernels/pdf_parse.py) — a
        # production build swaps a full layout parser in behind the same
        # signature.
        from .pdf_parse import extract_real_pdf_text
        return extract_real_pdf_text(payload)
    start += len(_STREAM_START)
    end = payload.find(_STREAM_END, start)
    if end == -1:
        return "", "truncated PDF stream"
    try:
        return payload[start:end].decode("utf-8"), None
    except UnicodeDecodeError as exc:
        return "", f"undecodable PDF stream: {exc}"

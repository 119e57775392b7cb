"""Scalar column functions (SURVEY §2.8): the reference's string/date/format
utilities re-expressed as JVM column expressions.

Everything here stays inside whole-stage codegen — no UDFs.  Reference
citations per function; semantics parity-tested in tests/test_functions.py
against the reference algorithms re-derived in pure Python.
"""

from .scalars import (
    format_property_key,
    iso_datetime,
    sanitize_filename,
    token_estimate,
    truncate_string,
)

__all__ = [
    "format_property_key",
    "iso_datetime",
    "sanitize_filename",
    "token_estimate",
    "truncate_string",
]

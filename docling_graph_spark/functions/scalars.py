"""Scalar column expressions mirroring the reference's utility functions.

| Here | Reference | SURVEY |
|---|---|---|
| truncate_string | `core/utils/string_formatter.py:50-73` | P7 |
| format_property_key | `core/utils/string_formatter.py:32-47` | F6 |
| iso_datetime | `core/utils/string_formatter.py:75-94` | F7 |
| sanitize_filename | `core/utils/output_manager.py:16-59` | F5 |
| token_estimate | `core/extractors/chunk_batcher.py:59-68,172-208` | F8 |
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def truncate_string(col: Column, max_length: int,
                    suffix: str = "...") -> Column:
    """P7: truncate to max_length INCLUDING the suffix; short strings pass
    through (`string_formatter.py:50-73`)."""
    if len(suffix) >= max_length:
        raise ValueError(
            f"max_length ({max_length}) must be greater than suffix length "
            f"({len(suffix)})"
        )
    keep = max_length - len(suffix)
    return F.when(
        F.length(col) <= max_length, col
    ).otherwise(F.concat(F.substring(col, 1, keep), F.lit(suffix)))


def _title_case(col: Column) -> Column:
    """Python ``str.title()`` semantics for ASCII text, JVM-side: uppercase
    every letter that follows a non-letter (string start counts), lowercase
    the rest.  ``F.initcap`` is NOT this — it only breaks on whitespace, so
    ``x2y``.title() == 'X2Y' but initcap gives 'X2y'.  Implemented as a
    per-character fold (`F.aggregate` over the char array); property keys
    are short, so the O(len) expression chain is cheap and stays in codegen.
    """
    chars = F.split(col, "")
    folded = F.aggregate(
        chars,
        F.struct(
            F.lit(True).alias("boundary"), F.lit("").alias("acc")
        ),
        lambda st, c: F.struct(
            (~c.rlike("^[A-Za-z]$")).alias("boundary"),
            F.concat(
                st["acc"],
                F.when(st["boundary"], F.upper(c)).otherwise(F.lower(c)),
            ).alias("acc"),
        ),
        lambda st: st["acc"],
    )
    return folded


def format_property_key(col: Column) -> Column:
    """F6: snake_case / camelCase → Title Case
    (`string_formatter.py:32-47`).

    snake_case: split on '_', capitalize each word.  camelCase: space before
    each capital, then ``str.title()`` (which capitalizes after ANY
    non-letter — digits included — reproduced by :func:`_title_case`; the
    reference's `.title()` also lowercases the rest of ALL-CAPS runs).
    ASCII-letter domain (pydantic field names), like the reference's usage.
    """
    snake = F.initcap(F.replace(col, F.lit("_"), F.lit(" ")))
    camel = _title_case(F.trim(F.regexp_replace(col, "([A-Z])", " $1")))
    return F.when(col.contains("_"), snake).otherwise(camel)


def iso_datetime(col: Column, date_only: bool = False) -> Column:
    """F7: date/timestamp → ISO-8601 string (`string_formatter.py:75-94`,
    datetime.isoformat semantics).  ``date_only=True`` for DateType columns
    (datetime.date.isoformat has no time part)."""
    fmt = "yyyy-MM-dd" if date_only else "yyyy-MM-dd'T'HH:mm:ss"
    return F.date_format(col, fmt)


def sanitize_filename(col: Column, max_len: int = 180,
                      timestamp: Column = None) -> Column:
    """F5: filename sanitization (`output_manager.py:16-59`): dots, spaces
    and special chars → '_'; strip edge underscores; cap at max_len-17
    (timestamp reserve); append ``_<timestamp>`` when one is supplied
    (callers pass ``F.date_format(F.current_timestamp(), 'yyyyMMdd_HHmmss')``
    — a parameter so tests stay deterministic)."""
    safe = F.replace(col, F.lit("."), F.lit("_"))
    safe = F.regexp_replace(safe, r'[/\\:*?"<>|\[\](){}]', "_")
    safe = F.replace(safe, F.lit(" "), F.lit("_"))
    safe = F.regexp_replace(safe, "^_+|_+$", "")
    safe = F.substring(safe, 1, max_len - 17)
    if timestamp is not None:
        safe = F.concat(safe, F.lit("_"), timestamp)
    return safe


def token_estimate(text_col: Column, chars_per_token: float = 4.0,
                   safety_margin: float = 1.2,
                   per_chunk_overhead: int = 50) -> Column:
    """F8: the reference's token-count heuristic
    (`chunk_batcher.py:59-68,172-208`):
    ceil(len/chars_per_token × safety_margin) + overhead."""
    return (
        F.ceil(F.length(text_col) / F.lit(chars_per_token)
               * F.lit(safety_margin))
        + F.lit(per_chunk_overhead)
    ).cast("int")

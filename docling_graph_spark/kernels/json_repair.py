"""Deterministic JSON extraction + truncation repair (SURVEY §2.8 F10/F11).

The reference parses LLM responses: strip markdown fences, isolate the JSON
payload from surrounding prose, and repair truncated output
(`/root/reference/docling_graph/llm_clients/response_handler.py:108-494`).
The rebuild replaces LLM calls with deterministic extractors, but the same
kernel is what makes ANY model-output-shaped text column ingestible at scale
(model-annotated corpora, scraped API payloads), so it ships as a first-class
string kernel — pure function, no I/O, parity-tested against the reference
implementation's observable behaviour.

Structure here is a single reusable string scanner (`_scan`) that yields
structural events outside string literals; the reference implements the same
state machine inline in four separate methods.
"""

from __future__ import annotations

import json
import re
from typing import Any, Iterator, List, Optional, Tuple

_PREFIXES = (
    "here is the json:", "here's the json:", "json:", "response:",
    "output:", "result:",
)

_TRUNCATION_PATTERNS = (
    r',\s*"[^"]*$',      # dangling partial key:   , "parti
    r':\s*"[^"]*$',      # dangling partial value: : "parti
    r":\s*\d+\.?\d*$",   # dangling number:        : 123.
    r",\s*$",            # trailing comma
    r":\s*$",            # trailing colon
)


def _scan(content: str) -> Iterator[Tuple[int, str]]:
    """Yield (index, char) for every char OUTSIDE string literals, with
    backslash escapes honoured — the shared state machine."""
    in_string = False
    escape = False
    for i, ch in enumerate(content):
        if escape:
            escape = False
            continue
        if ch == "\\":
            escape = True
            continue
        if ch == '"':
            in_string = not in_string
            continue
        if not in_string:
            yield i, ch


def extract_json_blob(content: str) -> str:
    """Markdown-fence / first-bracket extraction
    (`response_handler.py:132-165`): prefer ```json fences, then bare
    fences, then everything from the first '{' or '['."""
    content = content.strip()
    if "```" not in content:
        # reference quirk, reproduced: the first-bracket fallback lives
        # inside the fence-extraction path, so fence-free prose passes
        # through untouched (aggressive mode handles it instead)
        return content
    if "```json" in content:
        m = re.search(r"```json\s*(.*?)\s*```", content, re.DOTALL)
        if m:
            return m.group(1).strip()
    m = re.search(r"```\s*(.*?)\s*```", content, re.DOTALL)
    if m:
        return m.group(1).strip()
    for ch in ("{", "["):
        idx = content.find(ch)
        if idx != -1:
            return content[idx:]
    return content


def isolate_json(content: str) -> str:
    """Aggressive isolation (`response_handler.py:168-246`): strip known
    chat prefixes, then balanced-scan the first complete object/array."""
    for prefix in _PREFIXES:
        if content.lower().startswith(prefix):
            content = content[len(prefix):].strip()
    brace, bracket = content.find("{"), content.find("[")
    if brace == -1 and bracket == -1:
        return content
    if brace == -1 or (bracket != -1 and bracket < brace):
        start, opener, closer = bracket, "[", "]"
    else:
        start, opener, closer = brace, "{", "}"
    depth = 0
    for i, ch in _scan(content[start:]):
        if ch == opener:
            depth += 1
        elif ch == closer:
            depth -= 1
            if depth == 0:
                return content[start:start + i + 1]
    return content[start:]


def close_brackets(content: str) -> str:
    """Append the closers for every structure still open at end-of-string
    (`response_handler.py:347-393`)."""
    stack: List[str] = []
    for _i, ch in _scan(content):
        if ch == "{":
            stack.append("}")
        elif ch == "[":
            stack.append("]")
        elif ch in "}]" and stack and stack[-1] == ch:
            stack.pop()
    return content + "".join(reversed(stack))


def _complete_spans(content: str, keep_commas: bool) -> List[str]:
    """Depth-1 complete nested structures (array elements / object values),
    the shared core of the reference's last-complete-element scans
    (`response_handler.py:395-494`)."""
    spans: List[str] = []
    depth = 0
    start: Optional[int] = None
    for i, ch in _scan(content):
        if ch in "{[":
            if depth == 1 and start is None:
                start = i
            depth += 1
        elif ch in "}]":
            depth -= 1
            if depth == 1 and start is not None:
                spans.append(content[start:i + 1])
                start = None
        elif ch == "," and depth == 1:
            if keep_commas and start is not None:
                spans.append(content[start:i])
            start = None
    return spans


def repair_truncated(content: str) -> Optional[Any]:
    """Truncation repair (`response_handler.py:276-344`): drop dangling
    fragments + close brackets; fall back to the last complete array
    elements / object pairs.  Returns the parsed dict/list or None."""
    content = content.strip()

    def try_parse(s: str) -> Optional[Any]:
        try:
            result = json.loads(s)
        except json.JSONDecodeError:
            return None
        return result if isinstance(result, (dict, list)) else None

    for pattern in _TRUNCATION_PATTERNS:
        cleaned = re.sub(pattern, "", content)
        if cleaned != content:
            parsed = try_parse(close_brackets(cleaned))
            if parsed is not None:
                return parsed

    parsed = try_parse(close_brackets(content))
    if parsed is not None:
        return parsed

    if content.startswith("["):
        elements = _complete_spans(content, keep_commas=False)
        if elements:
            parsed = try_parse("[" + ",".join(elements) + "]")
            if parsed is not None:
                return parsed
    if content.startswith("{"):
        pairs = _complete_spans(content, keep_commas=True)
        if pairs:
            parsed = try_parse("{" + ",".join(pairs) + "}")
            if parsed is not None:
                return parsed
    return None


def parse_response(content: str, aggressive: bool = False
                   ) -> Tuple[Optional[Any], str]:
    """Public entry (`response_handler.py:33-105` semantics, exceptions
    replaced by a status column — zero-data-loss): returns
    (dict-or-list-or-None, status in {'ok', 'repaired', 'wrapped',
    'unparseable', 'empty'})."""
    if content is None or not content.strip():
        return None, "empty"
    cleaned = extract_json_blob(content)
    if aggressive:
        cleaned = isolate_json(cleaned)
    cleaned = cleaned.strip()
    try:
        parsed = json.loads(cleaned)
    except json.JSONDecodeError:
        repaired = repair_truncated(cleaned)
        if repaired is not None:
            return repaired, "repaired"
        return None, "unparseable"
    if isinstance(parsed, (dict, list)):
        return parsed, "ok"
    # reference wraps non-dict scalars (`response_handler.py:249-273`)
    return {"value": parsed}, "wrapped"

"""F10 parity: our json_repair kernel vs the reference ResponseHandler
(`llm_clients/response_handler.py`), loaded verbatim via ref_loader."""

from __future__ import annotations

import json

import pytest

from docling_graph_spark.kernels import json_repair as jr

from .ref_loader import load_ref


@pytest.fixture(scope="module")
def ref_handler():
    mod = load_ref("llm_clients/response_handler.py")
    return mod.ResponseHandler


FENCE_CASES = [
    '```json\n{"a": 1, "b": [2, 3]}\n```',
    'Some prose first.\n```json\n{"a": 1}\n```\ntrailing',
    '```\n[1, 2, 3]\n```',
    'no fences {"a": {"nested": "x"}} trailing prose',
    'leading text [1, {"b": 2}] more',
    "nothing json-like at all",
]


@pytest.mark.parametrize("content", FENCE_CASES)
def test_extract_json_blob_parity(ref_handler, content):
    assert jr.extract_json_blob(content) == \
        ref_handler._clean_response(content, aggressive=False)


AGGRESSIVE_CASES = [
    'Here is the JSON: {"a": 1} trailing prose',
    'Output: [1, 2, {"x": "y"}] done',
    'JSON: {"s": "with \\" escaped quote and { brace"} after',
    'Result: {"unterminated": [1, 2',
    'prose {"a": 1}{"b": 2} second object ignored',
    'no brackets here',
]


@pytest.mark.parametrize("content", AGGRESSIVE_CASES)
def test_aggressive_isolation_parity(ref_handler, content):
    assert jr.isolate_json(content) == ref_handler._aggressive_clean(content)


CLOSE_CASES = [
    '{"a": [1, 2',
    '{"a": {"b": {"c": 1',
    '[{"done": true}, {"partial": [',
    '{"string with }\\" inside": "[not structural]"',
    '{"complete": 1}',
]


@pytest.mark.parametrize("content", CLOSE_CASES)
def test_close_brackets_parity(ref_handler, content):
    assert jr.close_brackets(content) == ref_handler._close_brackets(content)


TRUNCATED_CASES = [
    # dangling partial key / value / number / comma / colon
    '{"a": 1, "b": 2, "parti',
    '{"a": 1, "b": "unfinished va',
    '{"a": 1, "n": 123.',
    '{"a": 1},',
    '[{"x": 1}, {"y": 2}, {"z":',
    '[{"x": 1}, {"y": 2}, {"unclosed": [1, 2',
    '{"k1": {"a": 1}, "k2": {"b": 2}, "k3": {"c"',
    'completely hopeless <<<>>>',
]


@pytest.mark.parametrize("content", TRUNCATED_CASES)
def test_repair_parity(ref_handler, content):
    ours = jr.repair_truncated(content)
    theirs = ref_handler._attempt_json_repair(content)
    assert ours == theirs, (ours, theirs)


def test_parse_response_roundtrip():
    parsed, status = jr.parse_response('```json\n{"a": [1, 2]}\n```')
    assert status == "ok" and parsed == {"a": [1, 2]}
    parsed, status = jr.parse_response('{"a": 1, "b": [2,')
    assert status == "repaired" and parsed == {"a": 1, "b": [2]}
    parsed, status = jr.parse_response("42")
    assert status == "wrapped" and parsed == {"value": 42}
    assert jr.parse_response("  ") == (None, "empty")
    assert jr.parse_response("<<not json>>")[1] == "unparseable"

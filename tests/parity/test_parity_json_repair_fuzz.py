"""F10 exhaustive-truncation fuzz: every prefix of a set of generated JSON
documents through BOTH repair implementations.

The reference's truncated-JSON repair
(`/root/reference/docling_graph/llm_clients/response_handler.py:276-494`) is
a ~200-line string algorithm with many boundary conditions (dangling keys,
half-escaped strings, trailing commas/colons, nested close order).  Cutting
a valid document at every byte offset sweeps all of them systematically —
far beyond hand-picked cases.
"""

from __future__ import annotations

import json
import random

import pytest

from docling_graph_spark.kernels import json_repair as jr

from .ref_loader import load_ref


@pytest.fixture(scope="module")
def ref_handler():
    return load_ref("llm_clients/response_handler.py").ResponseHandler


def _gen_doc(rng: random.Random, depth: int = 0):
    roll = rng.random()
    if depth >= 3 or roll < 0.35:
        return rng.choice([
            1, -2.5, 1e10, True, False, None,
            "plain", 'quo"te', "esc\\ape", "new\nline", "unicodé 😀",
            "{brace} [bracket]", "", 123456789,
        ])
    if roll < 0.7:
        return {
            f"k{i}_{rng.randrange(100)}": _gen_doc(rng, depth + 1)
            for i in range(rng.randint(0, 4))
        }
    return [_gen_doc(rng, depth + 1) for i in range(rng.randint(0, 4))]


def _docs():
    rng = random.Random(20260817)
    docs = [json.dumps(_gen_doc(rng)) for _ in range(12)]
    # force object/array roots into the mix (scalar roots exercise wrapping)
    docs += [
        json.dumps({"a": [1, 2, {"b": 'tricky "quote} brace'}], "c": None}),
        json.dumps([{"x": 1}, {"y": [True, False, {"z": "s"}]}]),
    ]
    return docs


@pytest.mark.parametrize("doc", _docs())
def test_every_truncation_repairs_identically(ref_handler, doc):
    for cut in range(len(doc) + 1):
        prefix = doc[:cut]
        ours = jr.repair_truncated(prefix)
        theirs = ref_handler._attempt_json_repair(prefix)
        assert ours == theirs, (cut, prefix, ours, theirs)


@pytest.mark.parametrize("doc", _docs()[:6])
def test_every_truncation_close_brackets_identically(ref_handler, doc):
    for cut in range(len(doc) + 1):
        prefix = doc[:cut]
        assert jr.close_brackets(prefix) == \
            ref_handler._close_brackets(prefix), (cut, prefix)


@pytest.mark.parametrize("wrap", [
    "```json\n{}\n```", "prose before {} after", "JSON: {}",
    "```\n{}\n```", "{}",
])
def test_truncated_fenced_responses_parse_identically(ref_handler, wrap):
    doc = json.dumps({"items": [{"id": 1, "name": "a"},
                                {"id": 2, "name": 'b"}'}], "n": 2})
    full = wrap.replace("{}", doc)
    for cut in range(1, len(full) + 1):
        prefix = full[:cut]
        ours = jr.extract_json_blob(prefix)
        theirs = ref_handler._clean_response(prefix, aggressive=False)
        assert ours == theirs, (cut, prefix)

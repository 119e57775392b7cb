"""Differential tests for the specialised per-(class, fields) fingerprint
path (operators/graph._blake_fingerprint_for): its string-split fast path
must produce exactly the generic loads/canonical-dumps fingerprint on every
payload, falling back on non-ASCII / escaped inputs."""

import json
import random

from docling_graph_spark.kernels.fingerprint import entity_fingerprint
from docling_graph_spark.operators import graph as g


def _inner(class_name, fields):
    udf = g._blake_fingerprint_for.__wrapped__(class_name, fields)
    (fn,) = [
        c.cell_contents
        for c in udf.func.__closure__
        if callable(c.cell_contents)
        and getattr(c.cell_contents, "__name__", "") == "one"
    ]
    return fn


def _slow(payload, cls):
    record = json.loads(payload)
    return entity_fingerprint(record, cls, tuple(record.keys()))


VALUES = [
    "https://host1.example.com/doc/5", "", None, 0, 3, 123456789,
    'with "quote"', "backslash \\ here", "unicode é ü 中", "tab\tnl\n",
    'a,"k2":b', 'fake delim ,"url": inside', "{nested}", "[1,2]",
    "control\x01char", "trailing}", '{"json":"looking"}', "null", "true",
]


def test_single_field_all_values():
    one = _inner("WebDocument", ("url",))
    for v in VALUES:
        payload = json.dumps({"url": v}, ensure_ascii=False,
                             separators=(",", ":"))
        assert one(payload) == _slow(payload, "WebDocument"), repr(v)


def test_two_field_random_combinations():
    one = _inner("Chunk", ("url", "chunk_id"))
    rng = random.Random(8)
    for _ in range(400):
        payload = json.dumps(
            {"url": rng.choice(VALUES), "chunk_id": rng.choice(VALUES)},
            ensure_ascii=False, separators=(",", ":"),
        )
        assert one(payload) == _slow(payload, "Chunk"), payload


def test_sorted_key_order_differs_from_struct_order():
    # struct order (term, kind) != canonical sorted order (kind, term)
    one = _inner("Term", ("term", "kind"))
    payload = '{"term":"hello","kind":"word"}'
    assert one(payload) == _slow(payload, "Term")


def test_matches_reference_kernel_directly():
    one = _inner("WebDocument", ("url",))
    url = "https://host3.example.com/doc/42"
    expected = entity_fingerprint({"url": url}, "WebDocument", ("url",))
    assert one(json.dumps({"url": url}, separators=(",", ":"))) == expected

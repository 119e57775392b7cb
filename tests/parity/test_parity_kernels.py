"""Byte-parity tests: our kernels vs the reference implementation itself.

The reference modules are imported (not copied) from /root/reference via
ref_loader; each test drives both implementations with the same inputs and
asserts identical output.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from docling_graph_spark.kernels import batching as k_batch
from docling_graph_spark.kernels import chunking as k_chunk
from docling_graph_spark.kernels import fingerprint as k_fp
from docling_graph_spark.kernels import merge as k_merge

from .ref_loader import load_chunk_text_fallback, load_ref

# ---------------------------------------------------------------- chunking

ref_chunk = load_chunk_text_fallback()

TEXTS = [
    "",
    "short text",
    "word " * 400,
    ("A sentence here. " * 100),
    ("Bang! " * 150) + "tail",
    ("Question? " * 120),
    ("para\n\n" * 200),
    ("line\n" * 300),
    # delimiter priority interplay: '. ' beyond mid, newlines earlier
    ("x" * 90 + ". " + "y" * 50 + "\n\n" + "z" * 200) * 5,
    # no delimiter at all -> fixed-width splits
    "q" * 1003,
    # whitespace-only chunks must be skipped
    ("w" * 99 + ". " + " " * 120 + ". " + "v" * 50) * 3,
    # unicode
    ("héllo wörld. " * 90),
]


@pytest.mark.parametrize("max_tokens", [25, 64, 128])
@pytest.mark.parametrize("text", TEXTS)
def test_chunk_parity(text: str, max_tokens: int):
    assert k_chunk.chunk_text(text, max_tokens) == ref_chunk(text, max_tokens)


@settings(max_examples=200, deadline=None)
@given(
    st.text(alphabet=st.sampled_from(list("ab .!?\n")), max_size=2000),
    st.integers(min_value=1, max_value=64),
)
def test_chunk_parity_fuzz(text, max_tokens):
    assert k_chunk.chunk_text(text, max_tokens) == ref_chunk(text, max_tokens)


def test_chunk_spans_point_into_text():
    text = ("The quick brown fox. " * 120) + "End"
    for span in k_chunk.chunk_spans(text, 25):
        assert text[span.start:span.end] == span.text


# ---------------------------------------------------------------- merging

ref_merger = load_ref("core/utils/dict_merger.py")

MERGE_CASES = [
    [{"a": 1}, {"a": 2, "b": "x"}],
    [{"a": None}, {"a": 5}],
    [{"a": 5}, {"a": None, "b": ""}],  # empties never overwrite
    [{"a": 0}, {"a": 7}],
    [{"a": 7}, {"a": 0}],  # 0 does overwrite (not emptyish)
    [{"lst": [1, 2]}, {"lst": [2, 3]}],
    [{"lst": []}, {"lst": [{"x": 1}]}],  # empty target list -> simple append path
    [{"d": {"x": 1, "y": None}}, {"d": {"y": 2, "z": [1]}}],
    [
        {"people": [{"name": "ann", "age": 1}]},
        {"people": [{"name": "ann", "age": 1}, {"name": "bob"}]},
    ],
    [
        {"people": [{"name": "ann", "id": "A"}]},
        {"people": [{"name": "ann", "id": "B"}]},  # id excluded from hash -> dedup
    ],
    [{"s": "keep"}, {"s": ""}, {"s": "new"}],
    [{"nested": {"deep": {"v": [1]}}}, {"nested": {"deep": {"v": [1, 2]}}}],
]


@pytest.mark.parametrize("dicts", MERGE_CASES)
def test_merge_parity(dicts):
    import copy

    ours = k_merge.merge_records(copy.deepcopy(dicts))
    theirs = ref_merger.consolidate_extracted_data(copy.deepcopy(dicts))
    assert ours == theirs


json_scalars = st.one_of(
    st.none(), st.booleans(), st.integers(-5, 5), st.text(max_size=4)
)
json_values = st.recursive(
    json_scalars,
    lambda inner: st.one_of(
        st.lists(inner, max_size=3),
        st.dictionaries(st.sampled_from(list("abcd")), inner, max_size=3),
    ),
    max_leaves=12,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.dictionaries(st.sampled_from(list("abcde")), json_values, max_size=4), min_size=1, max_size=4))
def test_merge_parity_fuzz(dicts):
    import copy

    try:
        theirs = ref_merger.consolidate_extracted_data(copy.deepcopy(dicts))
    except (AttributeError, TypeError):
        # the reference crashes on e.g. None items inside entity lists;
        # our kernel keeps going (zero-data-loss), so nothing to compare
        return
    ours = k_merge.merge_records(copy.deepcopy(dicts))
    assert ours == theirs


# ---------------------------------------------------------------- fingerprints

ref_registry_mod = load_ref("core/converters/node_id_registry.py")


def _make_models():
    from pydantic import BaseModel

    class Person(BaseModel):
        first_name: str
        last_name: str
        age: int | None = None
        email: str
        model_config = {"graph_id_fields": ["email"]}

    class Address(BaseModel):
        street: str = ""
        city: str = ""
        model_config = {"is_entity": False}

    class Tagged(BaseModel):
        name: str
        tags: list[str] = []
        model_config = {"graph_id_fields": ["name", "tags"]}

    return Person, Address, Tagged


def test_node_id_parity_entity():
    Person, Address, Tagged = _make_models()
    reg = ref_registry_mod.NodeIDRegistry()

    p = Person(first_name="Ann", last_name="Lee", email="a@x.io", age=3)
    ours = k_fp.node_id(p.model_dump(), "Person", ("email",))
    assert ours == reg.get_node_id(p)

    # same identity field, different other fields -> same id
    p2 = Person(first_name="Other", last_name="Name", email="a@x.io")
    assert k_fp.node_id(p2.model_dump(), "Person", ("email",)) == reg.get_node_id(p2)

    # list-valued id field: sorted-set normalisation
    t1 = Tagged(name="n", tags=["b", "a", "b"])
    t2 = Tagged(name="n", tags=["a", "b"])
    ours1 = k_fp.node_id(t1.model_dump(), "Tagged", ("name", "tags"))
    ours2 = k_fp.node_id(t2.model_dump(), "Tagged", ("name", "tags"))
    assert ours1 == reg.get_node_id(t1) == ours2 == reg.get_node_id(t2)


def test_node_id_parity_component():
    Person, Address, Tagged = _make_models()
    reg = ref_registry_mod.NodeIDRegistry()
    a = Address(street="1 Main st", city="Metz")
    ours = k_fp.node_id(a.model_dump(), "Address", ())
    assert ours == reg.get_node_id(a)
    # falsy fields are excluded from component fingerprints
    b = Address(street="1 Main st", city="")
    ours_b = k_fp.node_id(b.model_dump(), "Address", ())
    assert ours_b == reg.get_node_id(b)


# ---------------------------------------------------------------- batching

ref_batcher_mod = load_ref("core/extractors/chunk_batcher.py")


def _ref_batches(chunks, context_limit, merge_threshold):
    b = ref_batcher_mod.ChunkBatcher(
        context_limit=context_limit, merge_threshold=merge_threshold
    )
    return b.batch_chunks(chunks)


@pytest.mark.parametrize(
    "sizes,context",
    [
        ([10, 20, 400, 4000, 50, 60, 70], 2000),
        ([3000] * 5, 2000),
        ([1] * 40, 1100),
        ([500, 900, 100, 800, 50], 1500),
        ([], 2000),
        ([10], 2000),
    ],
)
@pytest.mark.parametrize("threshold", [0.5, 0.85, 0.9])
def test_batching_parity(sizes, context, threshold):
    chunks = ["x" * s for s in sizes]
    theirs = _ref_batches(chunks, context, threshold)
    avail = k_batch.available_tokens(context)
    costs = [
        k_batch.estimate_tokens(c) + k_batch.CHUNK_OVERHEAD_TOKENS for c in chunks
    ]
    ours = k_batch.batch_chunks(costs, avail, threshold)
    assert [b.chunk_indices for b in ours] == [tb.chunk_indices for tb in theirs]
    assert [b.total_tokens for b in ours] == [tb.total_tokens for tb in theirs]
    assert [b.batch_id for b in ours] == [tb.batch_id for tb in theirs]
    # combined-text formatting parity
    for ob, tb in zip(ours, theirs):
        assert (
            k_batch.combined_text([chunks[i] for i in ob.chunk_indices])
            == tb.combined_text
        )


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=6000), max_size=30),
    st.integers(min_value=1100, max_value=9000),
    st.floats(min_value=0.1, max_value=0.95),
)
def test_batching_parity_fuzz(sizes, context, threshold):
    chunks = ["y" * s for s in sizes]
    theirs = _ref_batches(chunks, context, threshold)
    avail = k_batch.available_tokens(context)
    costs = [
        k_batch.estimate_tokens(c) + k_batch.CHUNK_OVERHEAD_TOKENS for c in chunks
    ]
    ours = k_batch.batch_chunks(costs, avail, threshold)
    assert [b.chunk_indices for b in ours] == [tb.chunk_indices for tb in theirs]


# ---------------------------------------------------------------- meaningful

ref_cleaner_mod = load_ref("core/utils/graph_cleaner.py")


@pytest.mark.parametrize(
    "value",
    [None, "", "  ", "x", 0, False, True, [], {}, set(), (), [1], {"a": 1}, 0.0, -1],
)
def test_is_meaningful_parity(value):
    assert k_fp.is_meaningful(value) == ref_cleaner_mod.is_meaningful_value(value)


# ------------------------------------------- F9 schema-size chunk adjustment

from docling_graph_spark.kernels.chunking import (  # noqa: E402
    recommended_max_tokens,
    schema_adjusted_max_tokens,
)

from .ref_loader import load_schema_config  # noqa: E402

ref_schema_adjust, ref_recommend = load_schema_config()


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=1, max_value=200_000),
       st.integers(min_value=0, max_value=1_000_000))
def test_schema_adjust_parity_fuzz(original, schema_size):
    assert (schema_adjusted_max_tokens(original, schema_size)
            == ref_schema_adjust(original, schema_size))


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=1_000_000),
       st.integers(min_value=0, max_value=5_000),
       st.integers(min_value=0, max_value=5_000))
def test_recommended_max_tokens_parity_fuzz(context, system, response):
    assert (recommended_max_tokens(context, system, response)
            == ref_recommend(context, system, response))

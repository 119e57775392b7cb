"""Load reference modules from /root/reference for behavioural parity tests.

The reference package's __init__ pulls in heavy optional deps (docling,
typer, ...), so modules are loaded individually by file path under a
synthetic package, with tiny stand-ins registered in sys.modules for the
missing display/config deps (rich, llm_clients.config).  This imports the
reference code verbatim — nothing is copied — purely to assert that our
from-scratch kernels reproduce its observable behaviour.
"""

from __future__ import annotations

import importlib
import importlib.util
import sys
import types
from dataclasses import dataclass
from pathlib import Path

REF = Path("/root/reference/docling_graph")
PKG = "dgref"


def _ensure_stub_rich() -> None:
    if "rich" in sys.modules:
        return
    rich = types.ModuleType("rich")
    rich.print = lambda *a, **k: None
    sys.modules["rich"] = rich


def _ensure_pkg(name: str, path: Path) -> None:
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    mod.__path__ = [str(path)]
    mod.__package__ = name
    sys.modules[name] = mod


def _ensure_stub_llm_config() -> None:
    name = f"{PKG}.llm_clients.config"
    if name in sys.modules:
        return

    @dataclass
    class ProviderConfig:
        provider_id: str
        models: dict
        tokenizer: str
        content_ratio: float
        merge_threshold: float
        rate_limit_rpm: object = None
        supports_batching: bool = True

    mod = types.ModuleType(name)
    mod.ProviderConfig = ProviderConfig
    mod.get_provider_config = lambda *_a, **_k: None
    sys.modules[name] = mod
    # chunk_batcher imports via the absolute name docling_graph.llm_clients.config
    alias = "docling_graph.llm_clients.config"
    sys.modules[alias] = mod
    _ensure_pkg("docling_graph", REF)
    _ensure_pkg("docling_graph.llm_clients", REF / "llm_clients")
    sys.modules["docling_graph.llm_clients"].config = mod


def load_ref(relpath: str):
    """Load e.g. 'core/utils/dict_merger.py' as module dgref.core.utils.dict_merger."""
    _ensure_stub_rich()
    _ensure_stub_llm_config()
    _ensure_pkg(PKG, REF)
    parts = relpath.replace(".py", "").split("/")
    for i in range(1, len(parts)):
        _ensure_pkg(f"{PKG}." + ".".join(parts[:i]), REF.joinpath(*parts[:i]))
    name = f"{PKG}." + ".".join(parts)
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, REF / relpath, submodule_search_locations=None
    )
    mod = importlib.util.module_from_spec(spec)
    mod.__package__ = name.rsplit(".", 1)[0]
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_chunk_text_fallback():
    """Extract the reference's pure chunk_text_fallback method (AST-compiled,
    no docling import) and return fn(text, max_tokens) -> list[str]."""
    import ast

    src = (REF / "core/extractors/document_chunker.py").read_text()
    tree = ast.parse(src)
    fn_node = None
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == "chunk_text_fallback":
            fn_node = node
            break
    assert fn_node is not None, "chunk_text_fallback not found in reference"
    module = ast.Module(body=[fn_node], type_ignores=[])
    ast.fix_missing_locations(module)
    ns: dict = {"List": list}
    exec(compile(module, "<ref-chunker>", "exec"), ns)
    raw = ns["chunk_text_fallback"]

    class _Self:
        pass

    def call(text: str, max_tokens: int):
        s = _Self()
        s.max_tokens = max_tokens
        return raw(s, text)

    return call


def load_schema_config():
    """AST-extract ``DocumentChunker.update_schema_config`` and
    ``calculate_recommended_max_tokens`` (document_chunker.py:115-197) without
    importing docling.  Returns (adjust(original, schema_size) -> int,
    recommend(context, system, response) -> int)."""
    import ast

    src = (REF / "core/extractors/document_chunker.py").read_text()
    tree = ast.parse(src)
    fns = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name in (
                "update_schema_config", "calculate_recommended_max_tokens"):
            node.decorator_list = []
            fns[node.name] = node
    assert len(fns) == 2
    module = ast.Module(body=list(fns.values()), type_ignores=[])
    ast.fix_missing_locations(module)
    import logging
    ns: dict = {"logging": logging, "rich_print": lambda *a, **k: None}
    exec(compile(module, "<ref-schema-config>", "exec"), ns)

    class _Tok:
        max_tokens = 0

    class _Self:
        pass

    def adjust(original: int, schema_size: int) -> int:
        s = _Self()
        s.tokenizer = _Tok()
        s.chunker = _Self()
        s.chunker.tokenizer = _Tok()
        s.original_max_tokens = original
        s.max_tokens = original
        ns["update_schema_config"](s, schema_size)
        return s.max_tokens

    def recommend(context: int, system: int = 500, response: int = 500) -> int:
        return ns["calculate_recommended_max_tokens"](context, system, response)

    return adjust, recommend

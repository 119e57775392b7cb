"""Interactive configuration builder — the reference's config wizard
(`/root/reference/docling_graph/cli/config_builder.py:49-207`) rebuilt
over this engine's config surface (`run_job.py` yaml).

Same interaction contract as the reference's ConfigurationBuilder:
numbered steps grouped into sections, each option printed with one line
of help, defaults accepted on empty input, invalid choices re-prompted,
y/n confirms for booleans, free-text prompts for paths/numbers — but
stdlib-only (``input``/``print``; the reference uses typer/rich, which
this container does not ship) so scripted stdin drives it in tests.

The emitted dict serializes to exactly the yaml ``run_job.py --config``
consumes; ``build_config_interactive`` is wired to
``run_job.py init --interactive``.
"""

from __future__ import annotations

from typing import Dict, List, Optional


class PromptIO:
    """Injectable IO so tests can drive the wizard without a TTY."""

    def ask(self, text: str) -> str:
        return input(text)

    def say(self, text: str) -> None:
        print(text)


class ConfigurationBuilder:
    """Orchestrates the prompt flow (reference class of the same name)."""

    def __init__(self, io: Optional[PromptIO] = None):
        self.io = io or PromptIO()
        self.step = 1

    # ---------------------------------------------------------- prompts

    def _option(self, label: str, description: str, options: List[str],
                default: str, help_text: Dict[str, str]) -> str:
        self.io.say(f"\n{self.step}. {label}")
        self.io.say(f"   {description}")
        for opt in options:
            self.io.say(f"   - {opt}: {help_text.get(opt, '')}")
        self.step += 1
        while True:
            raw = self.io.ask(
                f"Select {label.lower()} [{default}]: ").strip().lower()
            if not raw:
                return default
            if raw in options:
                return raw
            self.io.say(f"   invalid choice {raw!r}; "
                        f"pick one of {', '.join(options)}")

    def _confirm(self, label: str, default: bool) -> bool:
        hint = "Y/n" if default else "y/N"
        while True:
            raw = self.io.ask(f"{label} [{hint}]: ").strip().lower()
            if not raw:
                return default
            if raw in ("y", "yes"):
                return True
            if raw in ("n", "no"):
                return False
            self.io.say("   answer y or n")

    def _text(self, label: str, default: str) -> str:
        raw = self.io.ask(f"{label} [{default}]: ").strip()
        return raw or default

    def _int(self, label: str, default: int) -> int:
        while True:
            raw = self.io.ask(f"{label} [{default}]: ").strip()
            if not raw:
                return default
            try:
                return int(raw)
            except ValueError:
                self.io.say("   enter an integer")

    # --------------------------------------------------------- sections

    def build_config(self) -> dict:
        self.io.say("Welcome to docling-graph-spark setup!")
        self.io.say("Let's configure your knowledge-graph pipeline.")
        defaults = self._build_defaults()
        source = self._build_source()
        output = self._build_output()
        # input() leaves the cursor on the prompt line; terminate it so
        # whatever the caller prints next starts on its own line
        self.io.say("")
        return {**source, **output,
                "defaults": defaults}

    def _build_defaults(self) -> dict:
        self.io.say("\n-- Default Settings --")
        chunker = self._option(
            "Chunker", "How should documents be chunked?",
            ["fallback", "hybrid"], "hybrid",
            {"fallback": "raw-text chunker (reference byte-parity path)",
             "hybrid": "heading-aware structure chunker "
                       "(HybridChunker analogue)"})
        counter = self._option(
            "Token Counter", "What bounds chunk token budgets?",
            ["heuristic", "vocab", "hf"], "heuristic",
            {"heuristic": "length heuristic (byte-stable, no deps)",
             "vocab": "vendored WordPiece mini-vocab "
                      "(kernels/wordpiece.py)",
             "hf": "HuggingFace tokenizer by name (needs transformers)"})
        tokenizer_name = None
        if counter == "hf":
            tokenizer_name = self._text(
                "HF tokenizer name",
                "sentence-transformers/all-MiniLM-L6-v2")
        elif counter == "vocab":
            tokenizer_name = "vocab:mini"
        max_tokens = self._int("Max tokens per chunk", 512)
        id_mode = self._option(
            "Node Id Mode", "How are deterministic node ids derived?",
            ["xxhash64", "blake2b"], "xxhash64",
            {"xxhash64": "JVM-side hash (fast path)",
             "blake2b": "reference-parity fingerprints"})
        out = {"chunker": chunker, "max_tokens": max_tokens,
               "id_mode": id_mode}
        if tokenizer_name:
            out["tokenizer_name"] = tokenizer_name
        if self._confirm("Add reverse edges (U1 undirected view)?", False):
            out["add_reverse_edges"] = True
        if self._confirm("Drop exact-duplicate documents first?", False):
            out["content_dedup"] = True
        return out

    def _build_source(self) -> dict:
        self.io.say("\n-- Input Source --")
        kind = self._option(
            "Input Kind", "Where do the web pages come from?",
            ["parquet", "testdata"], "parquet",
            {"parquet": "a (url, warc_ts, html, text, lang) table path",
             "testdata": "synthesize from a testdata sf directory"})
        if kind == "parquet":
            return {"input": self._text("Input table path",
                                        "/data/web_pages")}
        return {"sf_dir": self._text("Testdata directory",
                                     "/root/testdata/sf0.001")}

    def _build_output(self) -> dict:
        self.io.say("\n-- Output Settings --")
        directory = self._text("Output directory", "outputs")
        mode = self._option(
            "Run Mode", "How should the job execute?",
            ["oneshot", "resume", "stream"], "oneshot",
            {"oneshot": "full pipeline, overwrite outputs",
             "resume": "checkpointed run: only unprocessed docs",
             "stream": "Structured-Streaming availableNow drain"})
        report = self._confirm(
            "Also write report.md + graph.html?", False)
        return {"output": directory, "mode": mode, "report": report}


def build_config_interactive(io: Optional[PromptIO] = None) -> dict:
    """Entry point (reference `build_config_interactive`)."""
    return ConfigurationBuilder(io).build_config()


def to_yaml(config: dict) -> str:
    """Serialize without requiring pyyaml at write time: the subset of
    yaml run_job's loader reads back (flat keys + one nested map)."""
    lines = []
    for k, v in config.items():
        if isinstance(v, dict):
            lines.append(f"{k}:")
            for kk, vv in v.items():
                lines.append(f"  {kk}: {_scalar(vv)}")
        else:
            lines.append(f"{k}: {_scalar(v)}")
    return "\n".join(lines) + "\n"


def _scalar(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)

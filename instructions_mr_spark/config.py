"""Configuration model — the engine's "query language".

Mirrors the reference's user-facing JSON config surface
(``bin/text_mr_pipe.json``; models at
``src/python/instructionspipe/instructions.py:10-24``): a pipeline is
an ordered list of stages, each stage a list of instructions; an
instruction has a ``name`` (output column), ``content`` (task),
``role``, ``input_desc``, ``output_desc`` and a ``scope`` (input-column
projection list).

Differences from the reference (deliberate, engine-grade):

* Plain dataclasses, no pydantic dependency; ``from_dict`` accepts the
  reference's exact JSON shape.
* Compile-time scope validation: the reference silently selects
  nothing for a misspelled scope key
  (``instructions_runners.py:39``); we fail at plan time instead
  (SURVEY.md §7 hard part 5).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any


@dataclass
class Instruction:
    """One derived-output spec (reference instructions.py:10-18)."""

    name: str
    content: str | None = None
    role: str | None = None
    input_desc: str | None = None
    output_desc: str | None = None
    scope: list[str] | None = None

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Instruction":
        return cls(
            name=d["name"],
            content=d.get("content"),
            role=d.get("role"),
            input_desc=d.get("input_desc"),
            output_desc=d.get("output_desc"),
            scope=list(d["scope"]) if d.get("scope") is not None else None,
        )


@dataclass
class Stage:
    """One pipeline stage = a list of instructions run concurrently
    (reference Instructions, instructions.py:21-24)."""

    instructions: list[Instruction]
    kind: str = "map"  # "map" | "reduce" — semantics identical in the
    # reference (same async_run code path, v0.py:45-50); kept for
    # plan readability and for the cross-record reduce extension.

    def __post_init__(self) -> None:
        names = [i.name for i in self.instructions]
        dupes = {n for n in names if names.count(n) > 1}
        if dupes:
            raise ValueError(
                f"duplicate instruction names in stage: {sorted(dupes)} — "
                "each instruction's name is its output column and must be unique"
            )

    @classmethod
    def from_conf(cls, conf: list[dict[str, Any]], kind: str = "map") -> "Stage":
        return cls([Instruction.from_dict(x) for x in conf], kind=kind)

    @property
    def output_columns(self) -> list[str]:
        return [i.name for i in self.instructions]

    def validate_against(self, available: list[str]) -> None:
        """Fail fast on scope keys that don't exist upstream."""
        missing: dict[str, list[str]] = {}
        for ins in self.instructions:
            if ins.scope is None:
                continue
            bad = [k for k in ins.scope if k not in available]
            if bad:
                missing[ins.name] = bad
        if missing:
            raise ValueError(
                f"scope references unknown upstream columns: {missing}; "
                f"available: {sorted(available)}"
            )


@dataclass
class LlmConfig:
    """LLM connection + sampling config (reference llm_cli.py:20-58).

    Determinism pinning defaults follow the reference: temperature 0.0,
    top_p 0.01, fixed seed (llm_cli.py:26-30).
    """

    api_type: str = "echo"  # "echo" | "http" | "openai" | "azure"
    api_url: str | None = None
    api_key: str | None = None
    api_version: str | None = None
    model: str = "echo"
    temperature: float = 0.0
    top_p: float = 0.01
    seed: int = 2
    max_tokens: int = 4096

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "LlmConfig":
        return cls(
            api_type=d.get("api_type", "echo"),
            api_url=d.get("api_url"),
            api_key=d.get("api_key"),
            api_version=d.get("api_version"),
            model=d.get("model", "echo"),
            temperature=float(d.get("temperature", 0.0)),
            top_p=float(d.get("top_p", 0.01)),
            seed=int(d.get("seed", 2)),
            max_tokens=int(d.get("max_tokens", 4096)),
        )


@dataclass
class PipelineConfig:
    """Top-level config (reference bin/text_mr_pipe.json:2-15):
    ``in_data_path``, ``out_data_path``, ``llm``, ``pipe`` where
    ``pipe[0]`` is the map stage conf and ``pipe[1]`` the reduce."""

    llm: LlmConfig = field(default_factory=LlmConfig)
    stages: list[Stage] = field(default_factory=list)
    in_data_path: str | None = None
    out_data_path: str | None = None

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "PipelineConfig":
        pipe = d.get("pipe", [])
        stages = [
            Stage.from_conf(conf, kind="map" if i % 2 == 0 else "reduce")
            for i, conf in enumerate(pipe)
        ]
        return cls(
            llm=LlmConfig.from_dict(d.get("llm", {})),
            stages=stages,
            in_data_path=d.get("in_data_path"),
            out_data_path=d.get("out_data_path"),
        )

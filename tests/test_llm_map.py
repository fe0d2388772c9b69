"""Tests for the async LLM map/reduce operators and the config->plan
compiler (SURVEY.md §2.3-2.4), echo mode."""

from __future__ import annotations

import json

import pytest

from instructions_mr_spark.config import Instruction, LlmConfig, PipelineConfig, Stage
from instructions_mr_spark.llm.client import EchoLlmClient
from instructions_mr_spark.operators.llm_map import group_concat_reduce, instr_fanout_map
from instructions_mr_spark.plans import run_pipeline


def _docs(spark):
    return spark.createDataFrame(
        [(1, "alpha text", "en"), (2, "beta text", "fr")],
        "doc_id int, text string, lang string",
    )


def test_fanout_map_echo(spark):
    stage = Stage(
        [
            Instruction(name="summary", content="Summarize.", scope=["text"]),
            Instruction(name="tag", content="Tag.", scope=["lang"]),
        ]
    )
    out = instr_fanout_map(_docs(spark), stage, LlmConfig(), keep_cols=["doc_id"])
    rows = {r.doc_id: r for r in out.collect()}
    assert json.loads(rows[1].summary) == {"text": "alpha text"}
    assert json.loads(rows[2].tag) == {"lang": "fr"}


def test_fanout_map_tagged_client(spark):
    stage = Stage([Instruction(name="s", content="c", scope=["text"])])
    out = instr_fanout_map(
        _docs(spark),
        stage,
        LlmConfig(model="m1"),
        keep_cols=["doc_id"],
        client_factory=lambda conf: EchoLlmClient(conf, tag=True),
    )
    assert out.collect()[0].s.startswith("[m1] ")


def test_fanout_calls_are_instruction_major(spark):
    """Prefix-cache affinity contract (llm_map.py:18-22): within a
    partition, ALL calls for instruction 0 must be issued before any
    call for instruction 1, so calls sharing a system-prompt prefix
    are adjacent at the LLM service.  Verified with a sequence-stamping
    client at concurrency=1 (strict issue order): every 'first' seq
    must be below every 'second' seq."""

    class _SeqClient:
        def __init__(self, conf):
            self.seq = 0

        async def complete(self, messages):
            self.seq += 1
            return str(self.seq)

    stage = Stage(
        [
            Instruction(name="first", content="A.", scope=["text"]),
            Instruction(name="second", content="B.", scope=["lang"]),
        ]
    )
    docs = spark.createDataFrame(
        [(i, f"t{i}", "en") for i in range(20)], "doc_id int, text string, lang string"
    ).coalesce(1)
    out = instr_fanout_map(
        docs,
        stage,
        LlmConfig(),
        keep_cols=["doc_id"],
        concurrency=1,
        client_factory=_SeqClient,
    ).collect()
    first_seqs = [int(r.first) for r in out]
    second_seqs = [int(r.second) for r in out]
    assert max(first_seqs) < min(second_seqs)
    assert sorted(first_seqs + second_seqs) == list(range(1, 41))


def test_scope_validation_fails_fast(spark):
    stage = Stage([Instruction(name="s", content="c", scope=["nope"])])
    with pytest.raises(ValueError, match="nope"):
        instr_fanout_map(_docs(spark), stage, LlmConfig())


def test_group_concat_reduce_echo(spark):
    map_stage = Stage(
        [
            Instruction(name="a", content="x", scope=["text"]),
            Instruction(name="b", content="y", scope=["lang"]),
        ]
    )
    red = Stage([Instruction(name="r", content="m", scope=["a", "b"])], kind="reduce")
    mapped = instr_fanout_map(_docs(spark), map_stage, LlmConfig(), keep_cols=["doc_id"])
    out = group_concat_reduce(mapped, red, LlmConfig(), keep_cols=["doc_id"])
    r = {x.doc_id: x.r for x in out.collect()}[1]
    assert r.startswith("<a>\n") and "</a>\n\n<b>\n" in r and r.endswith("</b>\n\n")


def test_run_pipeline_reference_config_shape(spark):
    """Full mr_chain from the reference's JSON config format
    (bin/text_mr_pipe.json topology: pipe[0]=map, pipe[1]=reduce)."""
    conf = PipelineConfig.from_dict(
        {
            "llm": {"api_type": "echo", "model": "echo"},
            "pipe": [
                [
                    {"name": "m1", "content": "do", "scope": ["text"]},
                    {"name": "m2", "content": "do2", "scope": ["lang"]},
                ],
                [{"name": "final", "content": "merge", "scope": ["m1", "m2"]}],
            ],
        }
    )
    # default reduce style mirrors the library pipeline (v0.py:48-50):
    # the reduce prompt is the scoped map-result dict, serialized
    out = run_pipeline(_docs(spark), conf, keep_cols=["doc_id"])
    row = {r.doc_id: r for r in out.collect()}["2"]  # stringify_kv casts keep_cols too
    assert json.loads(row.final).keys() == {"m1", "m2"}
    # markdown rendering of the final stage (v0.py:51-55)
    assert row.result_md.startswith("# final\n")
    assert row.result_md.endswith("\n\n")

    # POC reduce style: tag-wrapped group concat
    out_xml = run_pipeline(_docs(spark), conf, keep_cols=["doc_id"], reduce_style="xmlwrap")
    row_xml = {r.doc_id: r for r in out_xml.collect()}["2"]
    assert row_xml.final.startswith("<m1>\n")


def test_pipeline_stringifies_init_stage(spark):
    """Init pseudo-stage applies json2str_kv (v0.py:40-44): non-string
    inputs reach instructions as strings."""
    df = spark.createDataFrame([(7, [1, 2])], "doc_id int, arr array<int>")
    conf = PipelineConfig.from_dict(
        {"pipe": [[{"name": "m", "content": "c", "scope": ["arr"]}]]}
    )
    out = run_pipeline(df, conf, keep_cols=["doc_id"], with_md=False)
    val = out.collect()[0].m
    assert json.loads(val) == {"arr": "[1,2]"}  # arr stringified before scoping


def test_retry_recovers_from_transient_failures(spark):
    # defined inside the test so cloudpickle ships it by value — test
    # modules aren't importable from executor Python workers
    class _FlakyClient:
        """Fails the first N calls per prompt, then echoes."""

        def __init__(self, conf, fail_times: int):
            self.conf = conf
            self.fail_times = fail_times
            self.attempts: dict[str, int] = {}

        async def complete(self, messages, json_schema=None):
            key = messages[-1]["content"]
            n = self.attempts.get(key, 0)
            self.attempts[key] = n + 1
            if n < self.fail_times:
                raise RuntimeError("transient")
            return key

    stage = Stage([Instruction(name="s", content="c", scope=["text"])])
    out = instr_fanout_map(
        _docs(spark),
        stage,
        LlmConfig(),
        keep_cols=["doc_id"],
        client_factory=lambda conf: _FlakyClient(conf, fail_times=2),
        max_retries=3,
    )
    rows = out.collect()
    assert len(rows) == 2
    assert all(r.s is not None for r in rows)


def test_on_error_null_quarantines_column(spark):
    stage = Stage(
        [
            Instruction(name="bad", content="c", scope=["text"]),
            Instruction(name="bad2", content="c", scope=["lang"]),
        ]
    )

    class _AlwaysFail:
        def __init__(self, conf):
            self.conf = conf

        async def complete(self, messages, json_schema=None):
            raise RuntimeError("permanent")

    out = instr_fanout_map(
        _docs(spark),
        stage,
        LlmConfig(),
        keep_cols=["doc_id"],
        client_factory=_AlwaysFail,
        max_retries=0,
        on_error="null",
    )
    rows = out.collect()
    # null-quarantine semantics (reference nulls unfinished results,
    # instructions.py:43-45) — rows survive with null outputs
    assert len(rows) == 2
    assert all(r.bad is None and r.bad2 is None for r in rows)


def test_multi_mr_chain_four_stages(spark):
    """Multi-MR chaining (README.md:59-71 'MapReduces Flow'): reducer
    output feeds the next mapper; four stages compose into one lazy
    plan."""
    conf = PipelineConfig.from_dict(
        {
            "pipe": [
                [{"name": "s1", "content": "c1", "scope": ["text"]}],
                [{"name": "s2", "content": "c2", "scope": ["s1"]}],
                [{"name": "s3", "content": "c3", "scope": ["s2"]}],
                [{"name": "s4", "content": "c4", "scope": ["s3"]}],
            ]
        }
    )
    out = run_pipeline(_docs(spark), conf, keep_cols=["doc_id"], with_md=False)
    assert out.columns == ["doc_id", "s4"]
    val = out.filter(out.doc_id == "1").collect()[0].s4
    # each echo stage wraps the previous output one JSON level deeper
    inner = json.loads(val)["s3"]
    inner2 = json.loads(inner)["s2"]
    inner3 = json.loads(inner2)["s1"]
    assert json.loads(inner3) == {"text": "alpha text"}


def test_split_quarantine(spark):
    """Rows whose LLM outputs were null-quarantined route to the side
    frame; clean rows pass through (SURVEY.md §4 error semantics)."""
    from instructions_mr_spark.plans import split_quarantine

    class _FailOdd:
        def __init__(self, conf):
            self.conf = conf

        async def complete(self, messages, json_schema=None):
            body = messages[-1]["content"]
            if "alpha" in body:
                return body
            raise RuntimeError("permanent")

    stage = Stage([Instruction(name="out", content="c", scope=["text"])])
    res = instr_fanout_map(
        _docs(spark),
        stage,
        LlmConfig(),
        keep_cols=["doc_id"],
        client_factory=_FailOdd,
        max_retries=0,
        on_error="null",
    )
    good, bad = split_quarantine(res, ["out"])
    assert [r.doc_id for r in good.collect()] == [1]
    assert [r.doc_id for r in bad.collect()] == [2]


def test_duplicate_instruction_names_rejected():
    """Instruction names are output columns — duplicates are a config
    error caught at stage construction (the reference would silently
    overwrite one result with the other, instructions.py:55)."""
    with pytest.raises(ValueError, match="duplicate instruction names"):
        Stage(
            [
                Instruction(name="x", content="a"),
                Instruction(name="x", content="b"),
            ]
        )


def test_fused_pipeline_equals_unfused(spark):
    """run_pipeline(fused=True) must be byte-identical to the unfused
    chain for both reduce styles (incl. unicode payloads)."""
    docs = spark.createDataFrame(
        [(1, "héllo wörld", "en"), (2, 'quote " backslash \\', "fr")],
        "doc_id int, text string, lang string",
    )
    conf = PipelineConfig.from_dict(
        {
            "pipe": [
                [
                    {"name": "m1", "content": "a", "scope": ["text"]},
                    {"name": "m2", "content": "b", "scope": ["lang"]},
                ],
                [{"name": "final", "content": "c", "scope": ["m1", "m2"]}],
            ]
        }
    )
    for style in ("serialize", "xmlwrap"):
        plain = {
            r.doc_id: r.final
            for r in run_pipeline(
                docs, conf, keep_cols=["doc_id"], with_md=False, reduce_style=style
            ).collect()
        }
        fused = {
            r.doc_id: r.final
            for r in run_pipeline(
                docs,
                conf,
                keep_cols=["doc_id"],
                with_md=False,
                reduce_style=style,
                fused=True,
            ).collect()
        }
        assert plain == fused, f"style={style}"


def test_fanout_map_arrow_matches_pandas_path(spark):
    from instructions_mr_spark.operators.llm_map import instr_fanout_map_arrow

    stage = Stage(
        [
            Instruction(name="summary", content="Summarize.", scope=["text"]),
            Instruction(name="tag", content="Tag.", scope=["lang"]),
        ]
    )
    base = instr_fanout_map(_docs(spark), stage, LlmConfig(), keep_cols=["doc_id"])
    arrow = instr_fanout_map_arrow(_docs(spark), stage, LlmConfig(), keep_cols=["doc_id"])
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, arrow.collect()))
    assert base.schema == arrow.schema


def test_fanout_map_arrow_http(spark):
    """Arrow path exercises retry + a real client factory too."""
    from instructions_mr_spark.llm.client import EchoLlmClient
    from instructions_mr_spark.operators.llm_map import instr_fanout_map_arrow

    stage = Stage([Instruction(name="s", content="c", scope=["text"])])
    out = instr_fanout_map_arrow(
        _docs(spark),
        stage,
        LlmConfig(model="m1"),
        keep_cols=["doc_id"],
        client_factory=lambda conf: EchoLlmClient(conf, tag=True),
    )
    assert out.collect()[0].s.startswith("[m1] ")


def test_fluent_builder_equals_config_pipeline(spark):
    """The fluent builder must compile to the SAME plan as the JSON
    config path: identical outputs, and to_dict() round-trips through
    PipelineConfig.from_dict."""
    from instructions_mr_spark.plans.builder import Pipeline, instruction

    docs = _docs(spark)
    p = (
        Pipeline()
        .llm(api_type="echo", model="echo")
        .map(
            instruction("summary", content="Summarize.", scope=["text"]),
            instruction("tag", content="Tag.", scope=["lang"]),
        )
        .reduce(instruction("report", content="Merge.", scope=["summary", "tag"]))
    )
    fluent = {r.doc_id: r.report for r in p.run(docs, keep_cols=["doc_id"]).collect()}

    conf = PipelineConfig.from_dict(p.to_dict())
    assert [s.kind for s in conf.stages] == ["map", "reduce"]
    assert conf.stages[0].output_columns == ["summary", "tag"]
    json_path = {
        r.doc_id: r.report
        for r in run_pipeline(docs, conf, keep_cols=["doc_id"]).collect()
    }
    assert fluent == json_path and len(fluent) == 2

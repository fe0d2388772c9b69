"""Byte-parity against the reference implementation (SURVEY.md §5.3).

Imports the reference package itself (read-only, from
/root/reference/src/python — pydantic is available; the ``openai``
import is stubbed since only the LLM client needs it) and runs BOTH
engines over the reference's own EHR demo record with the reference's
own shipped config (bin/text_mr_pipe.json), using an echo LLM on both
sides.  Asserts byte-equality of:

* the init-stage stringification (json2str_kv vs stringify_kv pretty)
* every map-stage output (prompt assembly path end-to-end)
* every reduce-stage output
* the markdown rendering

Skipped when the reference checkout is absent.
"""

from __future__ import annotations

import asyncio
import json
import os
import sys
import types

import pytest

from pyspark.sql import types as T

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "src/python/instructionspipe")),
    reason="reference checkout not present",
)


def _install_openai_stub():
    """The reference imports openai and tqdm at module scope; neither
    affects the deterministic code paths under test."""
    if "openai" not in sys.modules:
        stub = types.ModuleType("openai")
        stub.AsyncOpenAI = object
        stub.AsyncAzureOpenAI = object
        stub.ChatCompletion = object
        sys.modules["openai"] = stub
    if "tqdm" not in sys.modules:
        tq = types.ModuleType("tqdm")
        tq.tqdm = lambda x, **kw: x
        sys.modules["tqdm"] = tq


def _ref_modules():
    _install_openai_stub()
    sys.path.insert(0, os.path.join(REF, "src/python"))
    from instructionspipe.pipelines.mapreduce.v0 import run_with_configs
    from instructionspipe.utils import json2str_kv

    return run_with_configs, json2str_kv


class _EchoResp:
    def __init__(self, content: str):
        msg = types.SimpleNamespace(content=content)
        self.choices = [types.SimpleNamespace(message=msg)]


class _EchoRefLlm:
    """Echo twin of the reference LlmCli: response == user message."""

    model = "echo"

    async def async_run(self, msg, msgs=None, **kwargs):
        return _EchoResp(msg["content"])


def _schema_for(value, key: str | None = None) -> T.DataType:
    """StructType mirroring the record's own key order (Spark's JSON
    inference sorts keys, which would break serialization parity)."""
    if isinstance(value, dict):
        if key == "results":  # lab panels have per-row key sets -> map
            return T.MapType(T.StringType(), T.StringType())
        return T.StructType(
            [T.StructField(k, _schema_for(v, k), True) for k, v in value.items()]
        )
    if isinstance(value, list):
        elem = value[0] if value else ""
        return T.ArrayType(_schema_for(elem, key), True)
    if isinstance(value, bool):
        return T.BooleanType()
    if isinstance(value, int):
        return T.LongType()
    if isinstance(value, float):
        return T.DoubleType()
    return T.StringType()


@pytest.fixture(scope="module")
def ehr(spark):
    path = os.path.join(REF, "demo_data/ehr/faked_0.jsonl")
    record = json.loads(open(path, encoding="utf-8").readline())
    schema = _schema_for(record)
    df = spark.read.schema(schema).json(path)
    return record, df


@pytest.fixture(scope="module")
def ref_config():
    return json.load(open(os.path.join(REF, "bin/text_mr_pipe.json"), encoding="utf-8"))


@pytest.fixture(scope="module")
def ehr_edge(spark, tmp_path_factory):
    """The reference's EHR record mutated with the two classes of input
    that broke (or nearly broke) parity in earlier rounds: null fields
    (top-level, nested-in-struct, nested-in-array) and non-ASCII text
    (CJK, combining accents, emoji, astral plane)."""
    src = os.path.join(REF, "demo_data/ehr/faked_0.jsonl")
    record = json.loads(open(src, encoding="utf-8").readline())
    record["patient"]["name"] = "Žofie 中村-Ó'Brien \U0001f308"
    record["patient"]["contact"] = None  # null nested in struct
    record["allergies"][0]["reaction"] = None  # null nested in array-of-struct
    record["notes"] = None  # whole top-level column null
    record["unicode_note"] = "naïve — é combining, emoji 🎉, ∑∫√"
    path = tmp_path_factory.mktemp("parity_edge") / "edge.jsonl"
    path.write_text(json.dumps(record, ensure_ascii=False) + "\n", encoding="utf-8")
    schema = _schema_for(record)
    df = spark.read.schema(schema).json(str(path))
    return record, df


def test_stringify_parity_null_and_unicode(ehr_edge):
    """Byte parity on the edge corpus: nulls at every nesting depth must
    render as the reference's json.dumps output ("null" for a null
    top-level value of ANY type, `"key": null` nested), and non-ASCII
    text must pass through unescaped (ensure_ascii=False)."""
    _run, json2str_kv = _ref_modules()
    record, df = ehr_edge
    from instructions_mr_spark.operators.scope import stringify_kv

    ours = stringify_kv(df, pretty=True).collect()[0].asDict()
    theirs = json2str_kv(record)
    assert set(ours) == set(theirs)
    for k in theirs:
        assert ours[k] == theirs[k], f"column {k} differs"
    assert ours["notes"] == "null"
    assert '"contact": null' in ours["patient"]
    assert "Žofie 中村-Ó'Brien \U0001f308" in ours["patient"]
    assert ours["unicode_note"] == record["unicode_note"]


def test_map_reduce_parity_null_and_unicode(spark, ehr_edge, ref_config):
    """Full mr_chain byte parity on the null+unicode corpus with the
    reference's shipped config — the prompt assembly, map and reduce
    outputs, and markdown must all byte-match."""
    run_with_configs, _ = _ref_modules()
    record, df = ehr_edge
    map_conf = ref_config["pipe"][0]
    reduce_conf = ref_config["pipe"][1]

    theirs = asyncio.run(
        run_with_configs(_EchoRefLlm(), record, map_conf, reduce_conf)
    )

    from instructions_mr_spark.config import PipelineConfig
    from instructions_mr_spark.plans import run_pipeline

    config = PipelineConfig.from_dict(
        {"llm": {"api_type": "echo", "model": "echo"}, "pipe": [map_conf, reduce_conf]}
    )
    full = run_pipeline(df, config, pretty=True, with_md=True)
    row = full.collect()[0].asDict()
    md = row.pop("result_md")
    assert row == theirs["reduce_results"]
    assert md == theirs["result"]


def test_stringify_parity(ehr):
    """init pseudo-stage: stringify_kv(pretty) == json2str_kv byte-wise
    for every top-level column of the reference's own EHR record."""
    _run, json2str_kv = _ref_modules()
    record, df = ehr
    from instructions_mr_spark.operators.scope import stringify_kv

    ours = stringify_kv(df, pretty=True).collect()[0].asDict()
    theirs = json2str_kv(record)
    assert set(ours) == set(theirs)
    for k in theirs:
        assert ours[k] == theirs[k], f"column {k} differs"


def test_map_and_reduce_parity(spark, ehr, ref_config):
    """Full mr_chain parity on the reference's shipped config."""
    run_with_configs, _ = _ref_modules()
    record, df = ehr
    map_conf = ref_config["pipe"][0]
    reduce_conf = ref_config["pipe"][1]

    theirs = asyncio.run(
        run_with_configs(_EchoRefLlm(), record, map_conf, reduce_conf)
    )

    from instructions_mr_spark.config import PipelineConfig
    from instructions_mr_spark.plans import run_pipeline, run_stage
    from instructions_mr_spark.operators.scope import stringify_kv

    config = PipelineConfig.from_dict(
        {"llm": {"api_type": "echo", "model": "echo"}, "pipe": [map_conf, reduce_conf]}
    )

    # map stage alone
    init = stringify_kv(df, pretty=True)
    mapped = run_stage(init, config.stages[0], config.llm, pretty=True)
    ours_map = mapped.collect()[0].asDict()
    assert ours_map == theirs["map_results"]

    # full pipeline: reduce outputs + markdown
    full = run_pipeline(df, config, pretty=True, with_md=True)
    row = full.collect()[0].asDict()
    md = row.pop("result_md")
    assert row == theirs["reduce_results"]
    assert md == theirs["result"]


def test_run_with_configs_dropin_parity(spark, ehr, ref_config):
    """The library-API twin: same signature shape, same output dict
    {map_results, reduce_results, result} as the reference's
    run_with_configs (v0.py:26-55), byte-identical in echo mode."""
    ref_run, _ = _ref_modules()
    record, _df = ehr
    map_conf = ref_config["pipe"][0]
    reduce_conf = ref_config["pipe"][1]

    theirs = asyncio.run(ref_run(_EchoRefLlm(), record, map_conf, reduce_conf))

    from instructions_mr_spark.plans import run_with_configs

    ours = run_with_configs(
        spark,
        {"api_type": "echo", "model": "echo"},
        record,
        map_conf,
        reduce_conf,
        map_keys=frozenset({"results"}),
    )
    assert set(ours) == {"map_results", "reduce_results", "result"}
    assert ours["map_results"] == theirs["map_results"]
    assert ours["reduce_results"] == theirs["reduce_results"]
    assert ours["result"] == theirs["result"]

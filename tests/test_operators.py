"""Unit tests for the deterministic reference-core operators
(SURVEY.md §2.2), including byte-parity with the reference's
serialization conventions."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from instructions_mr_spark.config import Instruction
from instructions_mr_spark.operators.prompts import (
    build_sys_msg,
    chatml_col,
    prompt_template_sub,
    xml_tag_wrap,
)
from instructions_mr_spark.operators.scope import (
    json_clean,
    json_serialize,
    scope_project,
    stringify_kv,
)
from instructions_mr_spark.sources.io import md_sink


def _df(spark):
    return spark.createDataFrame(
        [(1, "héllo", [1, 2], {"x": "y"})],
        "id int, s string, arr array<int>, m map<string,string>",
    )


def test_scope_project(spark):
    df = _df(spark)
    assert scope_project(df, ["id", "s"]).columns == ["id", "s"]
    assert scope_project(df, None).columns == df.columns


def test_stringify_kv_types_and_passthrough(spark):
    out = stringify_kv(_df(spark))
    assert [f.dataType.simpleString() for f in out.schema.fields] == ["string"] * 4
    row = out.collect()[0]
    assert row.s == "héllo"  # strings pass through untouched
    assert row.id == "1"
    assert json.loads(row.arr) == [1, 2]


def test_stringify_kv_pretty_matches_reference_json_dumps(spark):
    """Reference json2str_kv uses json.dumps(indent=2, ensure_ascii=False)
    (utils.py:10-17) — pretty mode must byte-match."""
    out = stringify_kv(_df(spark), pretty=True).collect()[0]
    assert out.arr == json.dumps([1, 2], indent=2, ensure_ascii=False)
    assert out.m == json.dumps({"x": "y"}, indent=2, ensure_ascii=False)


def test_json_serialize_pretty_parity(spark):
    """build_inputs serializes the scoped dict with indent=2,
    ensure_ascii=False (instructions_runners.py:40)."""
    df = spark.createDataFrame([("a", "é")], "k1 string, k2 string")
    got = json_serialize(df, ["k1", "k2"], pretty=True).collect()[0].serialized
    assert got == json.dumps({"k1": "a", "k2": "é"}, indent=2, ensure_ascii=False)


def test_json_serialize_null_fields_kept(spark):
    """Records with NULL scoped fields must serialize like the
    reference's json.dumps ("key": null) — Spark's to_json default
    drops null fields (ignoreNullFields=true), which would silently
    break parity and the DuckDB oracle (ADVICE r01)."""
    df = spark.createDataFrame([("a", None)], "k1 string, k2 string")
    got = json_serialize(df, ["k1", "k2"]).collect()[0].serialized
    assert json.loads(got) == {"k1": "a", "k2": None}
    assert "k2" in got
    pretty = json_serialize(df, ["k1", "k2"], pretty=True).collect()[0].serialized
    assert pretty == json.dumps({"k1": "a", "k2": None}, indent=2, ensure_ascii=False)


def test_json_clean(spark):
    df = spark.createDataFrame([("```json\n{}\n```",)], "s string")
    assert df.select(json_clean(F.col("s")).alias("c")).collect()[0].c == "\n{}\n"


def test_build_sys_msg_sections():
    """Section order/headers per instructions_runners.py:46-60,
    including the 'Extected' typo."""
    ins = Instruction(name="x", content="C", role="R", input_desc="I", output_desc="O")
    assert build_sys_msg(ins) == (
        "## Instruction\nC\n\n## Your Role\nR\n\n"
        "## Your Given Input\nI\n\n## The Extected Output\nO\n\n"
    )
    assert build_sys_msg(Instruction(name="x", role="R")) == "## Your Role\nR\n\n"
    assert build_sys_msg(Instruction(name="x")) == ""


def test_chatml_plain_and_mistral(spark):
    ins = Instruction(name="x", content="C", scope=["s"])
    df = spark.createDataFrame([("v",)], "s string")
    plain = df.select(chatml_col(ins, ["s"], model="gpt-x").alias("m")).collect()[0].m
    assert [m.role for m in plain] == ["system", "user"]
    assert plain[1].content == '{"s":"v"}'
    mist = df.select(chatml_col(ins, ["s"], model="Mistral-7B").alias("m")).collect()[0].m
    assert [m.role for m in mist] == ["user", "assistant", "user"]
    assert mist[1].content == "Ok."  # instructions_runners.py:84-90


def test_prompt_template_sub():
    t = "R=__ROLE__ I=__INPUT_DESC__"
    assert prompt_template_sub(t, {"__ROLE__": "r", "__INPUT_DESC__": "i"}) == "R=r I=i"


def test_xml_tag_wrap(spark):
    df = spark.createDataFrame([("a", "b")], "x string, y string")
    got = df.select(xml_tag_wrap(["x", "y"]).alias("w")).collect()[0].w
    assert got == "<x>\na\n</x>\n\n<y>\nb\n</y>\n\n"


def test_md_sink_format(spark):
    """instructions_to_md: '# {name}\\n{val}\\n\\n' (instructions.py:62-70)."""
    df = spark.createDataFrame([("v1", "v2")], "a string, b string")
    got = md_sink(df, ["a", "b"]).collect()[0].md
    assert got == "# a\nv1\n\n# b\nv2\n\n"


class TestSaltedLsh:
    """The salted candidate generator must be a pure execution-strategy
    change: identical pair set to the plain self-join, with the hot
    bucket's work spread over salt-pair reducers."""

    def _bands(self, spark, n_hot=60, n_cold=12):
        rows = []
        # one giant bucket (the boilerplate key) + scattered cold keys
        for i in range(n_hot):
            rows.append((i, [f"w{i}", "common"], 0, "HOTKEY"))
        for i in range(n_cold):
            rows.append((1000 + i, [f"c{i}"], 0, f"cold{i // 2}"))
        return spark.createDataFrame(
            rows, "doc_id bigint, shingles array<string>, band int, key string"
        )

    def _pairs(self, df):
        return sorted((r.doc_a, r.doc_b) for r in df.collect())

    def test_salted_equals_plain_on_skew(self, spark):
        from instructions_mr_spark.queries.llm_pipeline import (
            _lsh_candidate_pairs,
            _lsh_candidate_pairs_salted,
        )

        bands = self._bands(spark)
        plain = self._pairs(_lsh_candidate_pairs(bands))
        for n_salt in (2, 3, 4):
            salted = self._pairs(
                _lsh_candidate_pairs_salted(bands, hot_min=10, n_salt=n_salt)
            )
            assert salted == plain, f"n_salt={n_salt}"
        # sanity: the hot bucket really did generate all-pairs
        assert len(plain) == 60 * 59 // 2 + 6

    def test_all_cold_passthrough(self, spark):
        from instructions_mr_spark.queries.llm_pipeline import (
            _lsh_candidate_pairs,
            _lsh_candidate_pairs_salted,
        )

        bands = self._bands(spark, n_hot=5, n_cold=8)
        assert self._pairs(
            _lsh_candidate_pairs_salted(bands, hot_min=10, n_salt=4)
        ) == self._pairs(_lsh_candidate_pairs(bands))

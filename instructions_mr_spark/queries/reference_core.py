"""Reference-semantics operators, oracle-checked (SURVEY.md §2.1-2.2).

Each query drives the real operator implementation (not a reimpl
inline) over the relational test tables, with a DuckDB SQL twin.  The
reference's pretty-printed (indent=2) serialization is exercised in
parity unit tests instead (tests/test_reference_parity.py) — the
oracle path uses compact JSON, which Spark and DuckDB format
identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from instructions_mr_spark.config import Instruction
from instructions_mr_spark.operators.prompts import build_sys_msg, chatml_col, xml_tag_wrap
from instructions_mr_spark.operators.scope import (
    json_clean,
    json_serialize,
    scope_project,
    stringify_kv,
)
from instructions_mr_spark.queries._util import t
from instructions_mr_spark.registry import query
from instructions_mr_spark.sources.io import md_sink


@query(
    "scope_project",
    oracle="SELECT event_id, event_type, user_id FROM events",
)
def scope_project_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's core relational op: keep only scoped keys
    (instructions_runners.py:37-39) == column pruning."""
    return scope_project(t(spark, sf_dir, "events"), ["event_id", "event_type", "user_id"])


@query(
    "stringify_kv",
    oracle="""
    SELECT CAST(doc_id AS VARCHAR) AS doc_id,
           text, lang, source,
           CAST(n_chars AS VARCHAR) AS n_chars
    FROM documents
    """,
)
def stringify_kv_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """json2str_kv (utils.py:10-17): every non-string top-level value
    becomes a string; strings pass through."""
    return stringify_kv(t(spark, sf_dir, "documents"))


@query(
    "json_serialize",
    oracle="""
    SELECT event_id,
           to_json(struct_pack(user_id := user_id,
                               event_type := event_type))::VARCHAR AS serialized
    FROM events
    """,
)
def json_serialize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scoped record -> one JSON string (the LLM user message,
    instructions_runners.py:40-44); compact form on both engines.
    Keys serialize in RECORD order (user_id precedes event_type in
    events), matching the reference's dict-iteration semantics."""
    df = json_serialize(
        t(spark, sf_dir, "events"), ["event_type", "user_id"], out_col="serialized"
    )
    return df.select("event_id", "serialized")


@query(
    "md_sink",
    oracle="""
    SELECT doc_id,
           '# lang' || chr(10) || lang || chr(10) || chr(10) ||
           '# source' || chr(10) || source || chr(10) || chr(10) AS md
    FROM documents
    """,
)
def md_sink_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """instructions_to_md (instructions.py:62-70): '# {name}\\n{val}\\n\\n'
    per instruction, concatenated in instruction order."""
    df = md_sink(t(spark, sf_dir, "documents"), ["lang", "source"], out_col="md")
    return df.select("doc_id", "md")


@query(
    "xml_tag_wrap",
    oracle="""
    SELECT doc_id,
           '<lang>' || chr(10) || lang || chr(10) || '</lang>' || chr(10) || chr(10) ||
           '<text>' || chr(10) || text || chr(10) || '</text>' || chr(10) || chr(10)
             AS wrapped
    FROM documents
    """,
)
def xml_tag_wrap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RewritingReducer.build_chatml's group concat
    (self_verification_mr.py:457-471)."""
    return (
        t(spark, sf_dir, "documents")
        .withColumn("wrapped", xml_tag_wrap(["lang", "text"]))
        .select("doc_id", "wrapped")
    )


@query(
    "json_clean",
    oracle="""
    SELECT doc_id,
           regexp_replace('```json' || chr(10) || text || chr(10) || '```',
                          '```json|```', '', 'g') AS cleaned
    FROM documents
    """,
)
def json_clean_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fence stripping (self_verification_mr.py:52-53), applied to a
    synthetically fenced payload so the op has something to strip."""
    fenced = F.concat(F.lit("```json\n"), F.col("text"), F.lit("\n```"))
    return (
        t(spark, sf_dir, "documents")
        .withColumn("cleaned", json_clean(fenced))
        .select("doc_id", "cleaned")
    )


@query(
    "any_to_str",
    oracle="""
    SELECT event_id,
           CAST(user_id AS VARCHAR) AS user_str,
           CAST(event_id AS VARCHAR) AS id_str,
           event_type AS type_str
    FROM events
    """,
)
def any_to_str_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar cast lattice (self_verification_mr.py:56-66): numbers via
    str(), strings pass; list/dict (JSON) covered by json_serialize."""
    from instructions_mr_spark.operators.scope import any_to_str
    from pyspark.sql import types as T

    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        any_to_str(F.col("user_id"), T.LongType()).alias("user_str"),
        any_to_str(F.col("event_id"), T.LongType()).alias("id_str"),
        any_to_str(F.col("event_type"), T.StringType()).alias("type_str"),
    )


_CHATML_INS = Instruction(
    name="summary",
    content="Summarize the document.",
    role="You are a careful analyst.",
    input_desc="A document row.",
    output_desc="One line.",
    scope=["lang", "source"],
)


@query(
    "chatml_init",
    oracle=f"""
    SELECT doc_id,
           '{build_sys_msg(_CHATML_INS).replace(chr(10), "' || chr(10) || '")}' AS sys_msg,
           to_json(struct_pack(lang := lang, source := source))::VARCHAR AS user_msg
    FROM documents
    """,
)
def chatml_init_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prompt assembly (instructions_runners.py:46-91): system message
    is a plan-time literal built from the instruction; user message is
    the serialized scoped record.  The oracle string embeds the SAME
    build_sys_msg output, so the section template is cross-checked."""
    d = t(spark, sf_dir, "documents")
    msgs = chatml_col(_CHATML_INS, [f.name for f in d.schema.fields], model="echo")
    return d.select(
        "doc_id",
        F.element_at(msgs, 1)["content"].alias("sys_msg"),
        F.element_at(msgs, 2)["content"].alias("user_msg"),
    )


@query(
    "chatml_mistral_rewrite",
    oracle="""
    SELECT doc_id, 'user' AS role1, 'assistant' AS role2, 'Ok.' AS msg2, 'user' AS role3
    FROM documents
    """,
)
def chatml_mistral_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mistral dialect rewrite (instructions_runners.py:84-90):
    system->user with an injected 'Ok.' assistant turn."""
    d = t(spark, sf_dir, "documents")
    msgs = chatml_col(_CHATML_INS, [f.name for f in d.schema.fields], model="Mistral-7B")
    return d.select(
        "doc_id",
        F.element_at(msgs, 1)["role"].alias("role1"),
        F.element_at(msgs, 2)["role"].alias("role2"),
        F.element_at(msgs, 2)["content"].alias("msg2"),
        F.element_at(msgs, 3)["role"].alias("role3"),
    )

"""Tests for the self-verified 4-phase chain (SURVEY.md §2.5)."""

from __future__ import annotations

import json

from instructions_mr_spark.config import Instruction, LlmConfig, Stage
from instructions_mr_spark.operators.selfverify import (
    DEFAULT_EVIDENCE_PROMPT,
    DEFAULT_OMISSION_PROMPT,
    self_verified_map,
)


def _stage():
    return Stage([Instruction(name="facts", content="Extract.", scope=["text"])])


def test_transcript_shape_and_roles(spark):
    df = spark.createDataFrame([(1, "hello world")], "doc_id int, text string")
    out = self_verified_map(
        df, _stage(), LlmConfig(), keep_cols=["doc_id"], with_transcript=True
    ).collect()[0]
    roles = [m.role for m in out.facts__transcript]
    # sys, user, a1, user(omission), a2, user(evidence), a3  (reference
    # phases :329-385; prune is a stub :387-393)
    assert roles == ["system", "user", "assistant", "user", "assistant", "user", "assistant"]
    assert out.facts__transcript[3].content == DEFAULT_OMISSION_PROMPT
    assert out.facts__transcript[5].content == DEFAULT_EVIDENCE_PROMPT


def test_phase1_echoes_scoped_input(spark):
    df = spark.createDataFrame([(1, "hello", "x")], "doc_id int, text string, other string")
    out = self_verified_map(
        df, _stage(), LlmConfig(), keep_cols=["doc_id"], with_transcript=True
    ).collect()[0]
    # scope=[text]: 'other' must NOT reach the prompt
    assert json.loads(out.facts__transcript[1].content) == {"text": "hello"}


def test_final_output_column(spark):
    df = spark.createDataFrame([(1, "t")], "doc_id int, text string")
    out = self_verified_map(df, _stage(), LlmConfig(), keep_cols=["doc_id"]).collect()[0]
    assert out.facts == DEFAULT_EVIDENCE_PROMPT  # echo of last user turn


def test_mistral_dialect_in_chain(spark):
    df = spark.createDataFrame([(1, "t")], "doc_id int, text string")
    out = self_verified_map(
        df,
        _stage(),
        LlmConfig(model="mistral-small"),
        keep_cols=["doc_id"],
        with_transcript=True,
    ).collect()[0]
    roles = [m.role for m in out.facts__transcript]
    assert roles[:3] == ["user", "assistant", "user"]  # dialect rewrite applied

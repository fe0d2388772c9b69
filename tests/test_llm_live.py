"""OPT-IN live-LLM integration (VERDICT r5 stretch: the one untested
boundary is a real served model — this is its documented on-ramp).

Skipped unless ``SPARK_GRAFT_LLM_URL`` points at an OpenAI-compatible
``/chat/completions`` endpoint (no such service exists in CI/sandbox;
the HTTP protocol itself is mock-tested in tests/test_llm_http.py).

    SPARK_GRAFT_LLM_URL=http://host:8000/v1 \\
    SPARK_GRAFT_LLM_MODEL=my-model \\
    SPARK_GRAFT_LLM_KEY=sk-... \\
    python -m pytest tests/test_llm_live.py -q

Live assertions are necessarily weak (a real model's text is not
pinned): every instruction column must come back non-empty for every
row, through the same Spark-worker fan-out path the echo oracles
certify structurally.
"""

from __future__ import annotations

import os

import pytest

from instructions_mr_spark.config import Instruction, LlmConfig, Stage
from instructions_mr_spark.operators.llm_map import instr_fanout_map

LIVE_URL = os.environ.get("SPARK_GRAFT_LLM_URL", "")

pytestmark = pytest.mark.skipif(
    not LIVE_URL,
    reason="live LLM endpoint not configured (set SPARK_GRAFT_LLM_URL)",
)


def _live_conf() -> LlmConfig:
    return LlmConfig(
        api_type="http",
        api_url=LIVE_URL,
        model=os.environ.get("SPARK_GRAFT_LLM_MODEL", "default"),
        api_key=os.environ.get("SPARK_GRAFT_LLM_KEY", "unused"),
        temperature=0.0,
        seed=2,
    )


def test_fanout_map_live_endpoint(spark):
    df = spark.createDataFrame(
        [(1, "The quick brown fox."), (2, "Spark läuft verteilt.")],
        "doc_id int, text string",
    )
    stage = Stage(
        [
            Instruction(
                name="summary",
                content="Summarize the text in one short sentence.",
                scope=["text"],
            ),
            Instruction(
                name="language",
                content="Name the language of the text in one word.",
                scope=["text"],
            ),
        ]
    )
    out = instr_fanout_map(
        df, stage, _live_conf(), keep_cols=["doc_id"], max_retries=2
    ).collect()
    assert len(out) == 2
    for r in out:
        assert r.summary and r.summary.strip()
        assert r.language and r.language.strip()

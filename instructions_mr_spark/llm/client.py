"""LLM clients (SURVEY.md §2.3 ``llm_call``).

The reference calls an OpenAI-compatible ``chat.completions.create``
with determinism pinning — temperature 0.0, top_p 0.01, fixed seed,
max_tokens cap, optional JSON-schema response format
(``src/python/instructionspipe/llm_cli.py:20-82``; Azure branch
:36-41).  Here:

* ``LlmClient`` — minimal async protocol: ``complete(messages) -> str``.
* ``EchoLlmClient`` — deterministic pure-function client used for the
  DuckDB-oracle checks of the *scaffolding* (scope, prompt assembly,
  fan-out, regroup, sinks): the "LLM" echoes the last user message,
  optionally tagged.  This is what makes the LLM-bound operators
  hash-checkable (SURVEY.md §2.7 note).
* ``OpenAILlmClient`` — the real path; import-gated so the engine works
  in environments without the ``openai`` package.  One client per
  executor task, shared across the async fan-out inside a partition.

Clients are created *inside* mapInPandas partitions via
``make_client`` (a picklable factory), never captured from the driver.
"""

from __future__ import annotations

from typing import Any, Protocol

from instructions_mr_spark.config import LlmConfig


class LlmClient(Protocol):
    async def complete(
        self, messages: list[dict[str, str]], json_schema: dict[str, Any] | None = None
    ) -> str: ...


class EchoLlmClient:
    """Deterministic stand-in: response = last user message content.

    ``tag=True`` prepends ``[model]`` so tests can distinguish the
    response from its prompt.

    Also exposes ``complete_sync`` — the executor operators dispatch
    to a loop-free synchronous path when a client provides it (r8
    verdict item #6: the echo family's cost was pure asyncio
    scaffolding — per-row coroutine trees, a semaphore, and an event
    loop around a function that never awaits anything).  Network
    clients deliberately do NOT provide it, so the async fan-out path
    with bounded concurrency remains the only way to run real LLM
    calls.
    """

    def __init__(self, conf: LlmConfig | None = None, tag: bool = False):
        self.conf = conf or LlmConfig()
        self.tag = tag

    def complete_sync(
        self, messages: list[dict[str, str]], json_schema: dict[str, Any] | None = None
    ) -> str:
        users = [m["content"] for m in messages if m["role"] == "user"]
        body = users[-1] if users else ""
        return f"[{self.conf.model}] {body}" if self.tag else body

    async def complete(
        self, messages: list[dict[str, str]], json_schema: dict[str, Any] | None = None
    ) -> str:
        return self.complete_sync(messages, json_schema)


class OpenAILlmClient:
    """OpenAI/Azure chat-completions client with the reference's knobs.

    Mirrors llm_cli.py:60-82: model, seed, temperature (default 0.0),
    top_p, max_tokens, optional ``response_format`` JSON schema.
    """

    def __init__(self, conf: LlmConfig):
        try:
            import openai  # noqa: F401
        except ImportError as e:  # pragma: no cover - env without openai
            raise ImportError(
                "openai package not installed; use api_type='echo' or install openai"
            ) from e
        from openai import AsyncAzureOpenAI, AsyncOpenAI

        self.conf = conf
        if conf.api_type == "azure":
            self.cli = AsyncAzureOpenAI(
                api_key=conf.api_key,
                api_version=conf.api_version,
                azure_endpoint=conf.api_url,
            )
        else:
            self.cli = AsyncOpenAI(api_key=conf.api_key, base_url=conf.api_url)

    async def complete(
        self, messages: list[dict[str, str]], json_schema: dict[str, Any] | None = None
    ) -> str:
        kwargs: dict[str, Any] = dict(
            model=self.conf.model,
            messages=messages,
            seed=self.conf.seed,
            temperature=self.conf.temperature,
            top_p=self.conf.top_p,
            max_tokens=self.conf.max_tokens,
        )
        if json_schema is not None:
            kwargs["response_format"] = {
                "type": "json_schema",
                "json_schema": json_schema,
            }
        resp = await self.cli.chat.completions.create(**kwargs)
        return resp.choices[0].message.content or ""


class HttpLlmClient:
    """Dependency-free OpenAI-compatible client (stdlib urllib only).

    Speaks the same ``POST {base}/chat/completions`` JSON protocol as
    llm_cli.py:60-82 but without requiring the ``openai`` package —
    the path that actually runs inside Spark Python workers in minimal
    executor images.  Blocking I/O is pushed to a thread via
    ``asyncio.to_thread`` so the per-partition event loop keeps the
    instruction fan-out concurrent; HTTP errors raise and flow into
    ``call_with_retry``'s backoff.
    """

    def __init__(self, conf: LlmConfig):
        if not conf.api_url:
            raise ValueError("api_type='http' requires api_url")
        self.conf = conf
        self.url = conf.api_url.rstrip("/") + "/chat/completions"

    def _post(self, payload: dict[str, Any]) -> str:
        import json
        import urllib.request

        req = urllib.request.Request(
            self.url,
            data=json.dumps(payload).encode("utf-8"),
            headers={
                "Content-Type": "application/json",
                "Authorization": f"Bearer {self.conf.api_key or 'unused'}",
            },
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            body = json.loads(resp.read().decode("utf-8"))
        return body["choices"][0]["message"]["content"] or ""

    async def complete(
        self, messages: list[dict[str, str]], json_schema: dict[str, Any] | None = None
    ) -> str:
        import asyncio

        payload: dict[str, Any] = dict(
            model=self.conf.model,
            messages=messages,
            seed=self.conf.seed,
            temperature=self.conf.temperature,
            top_p=self.conf.top_p,
            max_tokens=self.conf.max_tokens,
        )
        if json_schema is not None:
            payload["response_format"] = {
                "type": "json_schema",
                "json_schema": json_schema,
            }
        return await asyncio.to_thread(self._post, payload)


def make_client(conf: LlmConfig) -> LlmClient:
    """Picklable factory — call inside the executor partition."""
    if conf.api_type == "echo":
        return EchoLlmClient(conf)
    if conf.api_type == "http":
        return HttpLlmClient(conf)
    return OpenAILlmClient(conf)

from instructions_mr_spark.llm.client import (  # noqa: F401
    LlmClient,
    EchoLlmClient,
    OpenAILlmClient,
    make_client,
)

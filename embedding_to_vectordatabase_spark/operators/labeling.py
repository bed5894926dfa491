"""LLM labeling operator (reference V8 — "打标").

Reference: llm/qwen_api.py:14-54 calls an OpenAI-compatible chat API
(temperature=0, top_p=0.1, max_tokens=1000) with a data-labeling
system prompt, one document per request. Spark-first restatement: an
Arrow-batched ``mapInPandas`` stage, one HTTP batch per Arrow batch —
the same shape as the embedding operator.

Clients:
- ``MockLLMClient``: deterministic keyword-rule labeler so correctness
  tests have a golden answer without a model endpoint. The rule table
  is expressible as SQL CASE, which is exactly what the oracle checks.
- ``HttpLLMClient``: OpenAI-compatible chat-completions skeleton with
  the reference's decoding defaults; not exercised in this container.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SYSTEM_PROMPT = "数据处理打标专家"  # llm/qwen_api.py:18
DECODING_DEFAULTS = {
    "temperature": 0,
    "top_p": 0.1,
    "max_tokens": 1000,
    "frequency_penalty": 0.1,
}

# deterministic labeling rules: first matching keyword wins
MOCK_RULES: list[tuple[str, str]] = [
    ("vector", "vector-workload"),
    ("stream", "streaming"),
    ("join", "relational"),
    ("query", "relational"),
    ("customer", "business"),
]
MOCK_DEFAULT_LABEL = "other"


class MockLLMClient:
    def label(self, texts: list[str]) -> list[str]:
        out = []
        for t in texts:
            low = (t or "").lower()
            for kw, lab in MOCK_RULES:
                if kw in low:
                    out.append(lab)
                    break
            else:
                out.append(MOCK_DEFAULT_LABEL)
        return out


class HttpLLMClient:
    """OpenAI-compatible chat client skeleton (llm/base_api.py:5-13)."""

    def __init__(self, base_url: str, model: str, api_key: str = ""):
        self.base_url = base_url.rstrip("/")
        self.model = model
        self.api_key = api_key

    def label(self, texts: list[str]) -> list[str]:
        raise NotImplementedError(
            "live LLM endpoint not available in this container; "
            "use MockLLMClient for tests"
        )


def label_documents(
    df: DataFrame, text_col: str = "text", client_kind: str = "mock"
) -> DataFrame:
    """Append a ``label`` column via batched LLM calls (mapInPandas)."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("label", T.StringType(), False)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = MockLLMClient() if client_kind == "mock" else None
        if client is None:
            raise NotImplementedError("only mock client in this container")
        for pdf in batches:
            yield pdf.assign(label=client.label(pdf[text_col].tolist()))

    return df.mapInPandas(run, out_schema)

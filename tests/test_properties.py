"""Property-based tests (hypothesis) for the pure-Python kernels —
invariants that golden cases can't sweep: splitter budget/ordering
over arbitrary text, mock-embedder contract over arbitrary strings."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from embedding_to_vectordatabase_spark.operators.chunking import (
    SEPARATORS,
    split_text_recursive,
)
from embedding_to_vectordatabase_spark.operators.embedding import (
    MockEmbeddingClient,
)

# text drawn from separator-rich alphabets so splits actually happen
TEXT = st.text(
    alphabet=st.sampled_from(list("ab字。，；！？\n <>")), max_size=400
)


@settings(max_examples=200, deadline=None)
@given(TEXT, st.integers(8, 64), st.integers(0, 7))
def test_splitter_budget_or_unsplittable(text, chunk_size, overlap):
    """Every chunk fits the budget unless it contains no separator at
    all (faithful keep_separator=False passthrough)."""
    for c in split_text_recursive(text, chunk_size, overlap):
        assert len(c) <= chunk_size or not any(
            s in c for s in SEPARATORS
        )


@settings(max_examples=200, deadline=None)
@given(TEXT, st.integers(8, 64), st.integers(0, 7))
def test_splitter_no_empty_chunks(text, chunk_size, overlap):
    for c in split_text_recursive(text, chunk_size, overlap):
        assert c.strip() == c and c != ""


@settings(max_examples=100, deadline=None)
@given(TEXT)
def test_splitter_char_fallback_always_fits(text):
    """With the '' terminal separator every chunk fits the budget."""
    for c in split_text_recursive(
        text, 16, 0, separators=[*SEPARATORS, ""]
    ):
        assert len(c) <= 16


@settings(max_examples=100, deadline=None)
@given(TEXT, st.integers(8, 64))
def test_splitter_preserves_non_separator_content(text, chunk_size):
    """keep_separator=False drops separators but never letters: the
    multiset of non-separator characters is preserved (overlap=0)."""
    sep_chars = set("。，；！？\n <>")  # chars appearing in SEPARATORS
    keep = [ch for ch in text if ch not in sep_chars and ch != " "]
    out = split_text_recursive(text, chunk_size, 0)
    got = [ch for c in out for ch in c if ch not in sep_chars and ch != " "]
    assert sorted(got) == sorted(keep)


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=200))
def test_mock_embedder_contract(text):
    """Deterministic, unit-norm, fixed-dim — the FIXTURES.md contract
    the correctness oracle relies on."""
    import numpy as np

    client = MockEmbeddingClient(dim=16, nnz=4)
    [a], [b] = client.embed([text]), client.embed([text])
    assert a == b
    assert len(a) == 16
    assert abs(float(np.linalg.norm(a)) - 1.0) < 1e-3
    _, [sparse] = client.embed_hybrid([text])
    assert len(sparse) == 4
    assert all(isinstance(k, int) and 0 < v <= 1.0 for k, v in sparse.items())

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


def test_sq8_symmetric_weights_identity_property():
    """Property behind the SQ8 value oracles: for ANY per-dim ranges
    and vectors, the (bias − 2·C@W + (C²)@extra) scoring shape with
    the symmetric weights equals the direct integer code-space
    squared-L2 EXACTLY in float64 (every partial ≤ dim·255² < 2⁵³, so
    accumulation order cannot matter) — no fixture-tuned constants in
    the kernel algebra."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from embedding_to_vectordatabase_spark.operators.search import (
        _sq8_code_batch,
        _sq8_symmetric_weights,
    )

    floats = st.floats(
        min_value=-50.0, max_value=50.0,
        allow_nan=False, allow_infinity=False, width=32,
    )

    @settings(max_examples=60, deadline=None)
    @given(
        dim=st.integers(min_value=1, max_value=24),
        n=st.integers(min_value=1, max_value=12),
        q=st.integers(min_value=1, max_value=4),
        seed=st.integers(min_value=0, max_value=2**16),
        lo=floats,
        span=st.floats(min_value=1e-3, max_value=100.0,
                       allow_nan=False, allow_infinity=False),
    )
    def case(dim, n, q, seed, lo, span):
        rng = np.random.default_rng(seed)
        vmin = np.full(dim, float(lo))
        vdiff = np.full(dim, float(span))
        X = rng.uniform(lo - span, lo + 2 * span, (n, dim))
        Q = rng.uniform(lo - span, lo + 2 * span, (q, dim))
        scale = 255.0 / vdiff
        C = _sq8_code_batch(X, vmin, scale).astype(np.float64)
        CQ = _sq8_code_batch(Q, vmin, scale).astype(np.float64)
        W, bias, extra = _sq8_symmetric_weights(Q, vmin, vdiff)
        S = bias[None, :] - 2.0 * (C @ W) + ((C**2) @ extra)[:, None]
        direct = ((C[:, None, :] - CQ[None, :, :]) ** 2).sum(axis=2)
        assert np.array_equal(S, direct), (S - direct)

    case()

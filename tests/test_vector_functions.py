"""V4/V5/V6/V7 similarity expressions vs a numpy oracle (SURVEY §5)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from embedding_to_vectordatabase_spark.functions.vector import (
    dense_cosine,
    dense_ip,
    dense_l2,
    dense_norm,
    random_hyperplanes,
    rerank_fusion,
    sparse_ip,
)

A = [0.5, -1.25, 3.0, 0.0]
B = [2.0, 0.5, -1.0, 4.0]


@pytest.fixture(scope="module")
def pair_df(spark):
    return spark.createDataFrame(
        [(A, B)], "a array<float>, b array<float>"
    )


def test_dense_ip_matches_numpy(pair_df):
    got = pair_df.select(dense_ip(F.col("a"), F.col("b")).alias("v")).first()["v"]
    assert got == pytest.approx(float(np.dot(A, B)), abs=1e-9)


def test_dense_l2_matches_numpy(pair_df):
    got = pair_df.select(dense_l2(F.col("a"), F.col("b")).alias("v")).first()["v"]
    assert got == pytest.approx(
        float(np.linalg.norm(np.array(A) - np.array(B))), abs=1e-9
    )


def test_dense_cosine_matches_numpy(pair_df):
    got = pair_df.select(dense_cosine(F.col("a"), F.col("b")).alias("v")).first()["v"]
    want = np.dot(A, B) / (np.linalg.norm(A) * np.linalg.norm(B))
    assert got == pytest.approx(float(want), abs=1e-9)


def test_dense_norm(pair_df):
    got = pair_df.select(dense_norm(F.col("a")).alias("v")).first()["v"]
    assert got == pytest.approx(float(np.linalg.norm(A)), abs=1e-9)


def test_sparse_ip_shared_keys_only(spark):
    df = spark.sql(
        "SELECT map(1, CAST(0.5 AS FLOAT), 7, CAST(2.0 AS FLOAT)) AS q, "
        "map(7, CAST(3.0 AS FLOAT), 9, CAST(1.0 AS FLOAT)) AS d"
    )
    got = df.select(sparse_ip(F.col("q"), F.col("d")).alias("v")).first()["v"]
    assert got == pytest.approx(2.0 * 3.0, abs=1e-9)  # only key 7 shared


def test_sparse_ip_no_overlap_is_zero(spark):
    df = spark.sql(
        "SELECT map(1, CAST(0.5 AS FLOAT)) AS q, map(2, CAST(3.0 AS FLOAT)) AS d"
    )
    got = df.select(sparse_ip(F.col("q"), F.col("d")).alias("v")).first()["v"]
    assert got == 0.0


def test_rerank_fusion_weights(spark):
    # 0.4/0.2/0.4 (baai_m3_simple_server/m3_server.py:17)
    df = spark.range(1).select(
        rerank_fusion(F.lit(1.0), F.lit(1.0), F.lit(1.0)).alias("all1"),
        rerank_fusion(F.lit(1.0), F.lit(0.0), F.lit(0.0)).alias("c"),
        rerank_fusion(F.lit(0.0), F.lit(1.0), F.lit(0.0)).alias("s"),
    )
    r = df.first()
    assert r["all1"] == pytest.approx(1.0)
    assert r["c"] == pytest.approx(0.4)
    assert r["s"] == pytest.approx(0.2)


def test_random_hyperplanes_seeded():
    a = random_hyperplanes(4, 8, seed=7)
    b = random_hyperplanes(4, 8, seed=7)
    c = random_hyperplanes(4, 8, seed=8)
    assert a == b
    assert a != c
    assert len(a) == 4 and len(a[0]) == 8


def test_l2_normalize_unit_and_zero(spark):
    from embedding_to_vectordatabase_spark.functions.vector import (
        dense_norm,
        l2_normalize,
    )

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])], "id long, v array<double>"
    )
    out = {r["id"]: r for r in df.select(
        "id",
        l2_normalize(F.col("v")).alias("u"),
        dense_norm(l2_normalize(F.col("v"))).alias("n"),
    ).collect()}
    assert out[1]["u"] == [0.6, 0.8] and abs(out[1]["n"] - 1.0) < 1e-12
    assert out[2]["u"] == [0.0, 0.0] and out[2]["n"] == 0.0


def test_int8_quantization_roundtrip_and_cosine(spark):
    """Dequantized vectors stay within the quantization step of the
    original, and pairwise cosine survives within 1%."""
    import math
    import random

    from embedding_to_vectordatabase_spark.functions.vector import (
        dequantize_int8,
        quantize_int8,
    )

    rng = random.Random(7)
    rows = [(i, [rng.gauss(0, 1) for _ in range(32)]) for i in range(20)]
    rows.append((99, [0.0] * 32))
    df = spark.createDataFrame(rows, "id long, v array<double>")
    got = {
        r["id"]: (r["v"], r["dq"], r["q"])
        for r in df.select(
            "id", "v",
            quantize_int8(F.col("v")).alias("q"),
            dequantize_int8(quantize_int8(F.col("v"))).alias("dq"),
        ).collect()
    }
    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (math.sqrt(sum(x*x for x in a)) * math.sqrt(sum(x*x for x in b)))
    for i, (v, dq, q) in got.items():
        if i == 99:
            assert q["scale"] == 0.0 and dq == [0.0] * 32
            continue
        step = q["scale"]
        assert all(abs(x - y) <= step / 2 + 1e-12 for x, y in zip(v, dq))
        assert cos(v, dq) > 0.99
        assert all(-127 <= c <= 127 for c in q["codes"])


def test_pa_matrix_layouts_and_errors():
    """_pa_matrix must read list / large_list / fixed_size_list and
    sliced arrays via the flat buffer, and refuse ragged/NULL input
    (dense vectors are fixed-width by contract)."""
    import numpy as np
    import pyarrow as pa
    import pytest

    from embedding_to_vectordatabase_spark.operators.search import (
        _pa_matrix,
    )

    rows = [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]
    want = np.array(rows)
    for arr in (
        pa.array(rows, type=pa.list_(pa.float32())),
        pa.array(rows, type=pa.large_list(pa.float64())),
        pa.array(rows, type=pa.list_(pa.float64(), 2)),  # fixed-size
    ):
        got = _pa_matrix(arr)
        assert got.shape == (3, 2)
        assert np.allclose(got, want)
        # sliced view (non-zero offset) must still map the right rows
        sl = arr.slice(1, 2)
        got_sl = _pa_matrix(sl)
        assert np.allclose(got_sl, want[1:])

    chunked = pa.chunked_array(
        [pa.array(rows[:2], type=pa.list_(pa.float64())),
         pa.array(rows[2:], type=pa.list_(pa.float64()))]
    )
    assert np.allclose(_pa_matrix(chunked), want)

    with pytest.raises(ValueError, match="ragged"):
        _pa_matrix(pa.array([[1.0], [1.0, 2.0]], type=pa.list_(pa.float64())))
    with pytest.raises(ValueError, match="NULL"):
        _pa_matrix(pa.array([[1.0, 2.0], None], type=pa.list_(pa.float64())))
    # element-level nulls hide from the top-level null_count
    with pytest.raises(ValueError, match="NULL element"):
        _pa_matrix(
            pa.array([[1.0, None], [1.0, 2.0]], type=pa.list_(pa.float64()))
        )
    # ...but an element null OUTSIDE a slice's window must not raise
    sl = pa.array(
        [[1.0, None], [3.0, 4.0], [5.0, 6.0]], type=pa.list_(pa.float64())
    ).slice(1, 2)
    assert _pa_matrix(sl).tolist() == [[3.0, 4.0], [5.0, 6.0]]
    assert _pa_matrix(pa.array([], type=pa.list_(pa.float64()))).size == 0

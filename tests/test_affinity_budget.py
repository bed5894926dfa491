"""token_budget_sample, item_cooccurrence, winsorize."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from embedding_to_vectordatabase_spark.operators.affinity import (
    item_cooccurrence,
)
from embedding_to_vectordatabase_spark.operators.anomaly import winsorize
from embedding_to_vectordatabase_spark.operators.sampling import (
    token_budget_sample,
)


def test_token_budget_never_overshoots(spark):
    df = spark.createDataFrame(
        [(i, "s", 10) for i in range(20)],
        "doc_id long, source string, tokens long",
    )
    out = token_budget_sample(df, ["source"], "tokens", 55).collect()
    # 10-token rows into a 55 budget -> exactly 5 rows, cum max 50
    assert len(out) == 5
    assert max(r.cum_weight for r in out) == 50


def test_token_budget_deterministic_and_per_group(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b", 7) for i in range(30)],
        "doc_id long, source string, tokens long",
    )
    out1 = sorted(
        (r.doc_id, r.cum_weight)
        for r in token_budget_sample(df, ["source"], "tokens", 22).collect()
    )
    out2 = sorted(
        (r.doc_id, r.cum_weight)
        for r in token_budget_sample(df, ["source"], "tokens", 22).collect()
    )
    assert out1 == out2
    # 3 rows of 7 fit in 22 per group, two groups
    assert len(out1) == 6


def test_token_budget_oversized_row_dropped(spark):
    df = spark.createDataFrame(
        [(1, "s", 100)], "doc_id long, source string, tokens long"
    )
    assert token_budget_sample(df, ["source"], "tokens", 50).count() == 0


def test_token_budget_null_weight_dropped(spark):
    df = spark.createDataFrame(
        [(1, "s", None), (2, "s", 5)],
        "doc_id long, source string, tokens long",
    )
    out = token_budget_sample(df, ["source"], "tokens", 50).collect()
    assert [r.doc_id for r in out] == [2]


def test_cooccurrence_counts_distinct_users(spark):
    ev = spark.createDataFrame(
        # user 1 replays (A,B) twice - counts once; users 2,3 add more
        [(1, "A"), (1, "B"), (1, "A"), (1, "B"),
         (2, "A"), (2, "B"), (2, "C"),
         (3, "B"), (3, "C")],
        "user_id long, item string",
    )
    out = {
        (r.item_a, r.item_b): r.n_users
        for r in item_cooccurrence(ev, min_count=2).collect()
    }
    assert out == {("A", "B"): 2, ("B", "C"): 2}


def test_cooccurrence_power_user_capped(spark):
    rows = [(1, f"i{j}") for j in range(10)] + [
        (2, "i0"), (2, "i1"), (3, "i0"), (3, "i1")
    ]
    ev = spark.createDataFrame(rows, "user_id long, item string")
    out = {
        (r.item_a, r.item_b): r.n_users
        for r in item_cooccurrence(
            ev, min_count=2, max_items_per_user=5
        ).collect()
    }
    # user 1 (10 items > cap 5) excluded entirely
    assert out == {("i0", "i1"): 2}


def test_winsorize_clamps_to_group_quantiles(spark):
    df = spark.createDataFrame(
        [("g", float(v)) for v in range(1, 11)] + [("g", 1000.0)],
        "grp string, v double",
    )
    out = winsorize(df, ["grp"], "v", lo=0.0, hi=0.9).collect()
    top = max(r.value_w for r in out)
    # p90 of 1..10,1000 caps the 1000 outlier
    assert top < 1000.0
    assert all(r.value_w >= r.q_lo and r.value_w <= r.q_hi for r in out)


def test_winsorize_bad_bounds_raise(spark):
    df = spark.createDataFrame([("g", 1.0)], "grp string, v double")
    with pytest.raises(ValueError):
        winsorize(df, ["grp"], "v", lo=0.9, hi=0.1)


def test_category_drift_psi_detects_shift(spark):
    from embedding_to_vectordatabase_spark.operators.anomaly import (
        category_drift_psi,
    )

    a = spark.createDataFrame(
        [("en",)] * 80 + [("de",)] * 20, "lang string"
    )
    b_same = spark.createDataFrame(
        [("en",)] * 80 + [("de",)] * 20, "lang string"
    )
    b_shift = spark.createDataFrame(
        [("en",)] * 50 + [("de",)] * 50, "lang string"
    )
    psi_same = sum(
        r.psi_term for r in category_drift_psi(a, b_same, "lang").collect()
    )
    psi_shift = sum(
        r.psi_term
        for r in category_drift_psi(a, b_shift, "lang").collect()
    )
    assert psi_same == pytest.approx(0.0, abs=1e-9)
    assert psi_shift > 0.25


def test_category_drift_psi_one_sided_category_finite(spark):
    from embedding_to_vectordatabase_spark.operators.anomaly import (
        category_drift_psi,
    )

    a = spark.createDataFrame([("en",)] * 10, "lang string")
    b = spark.createDataFrame(
        [("en",)] * 5 + [("zz",)] * 5, "lang string"
    )
    rows = {r.category: r for r in category_drift_psi(a, b, "lang").collect()}
    import math

    assert math.isfinite(rows["zz"].psi_term) and rows["zz"].psi_term > 0


def test_value_histogram_bins_and_clamp(spark):
    from embedding_to_vectordatabase_spark.operators.anomaly import (
        value_histogram,
    )

    df = spark.createDataFrame(
        [(float(v),) for v in [-5, 0, 1, 5, 9, 10, 99]], "v double"
    )
    out = {r.bin: r for r in value_histogram(df, "v", 0.0, 10.0, 10).collect()}
    # -5 clamps into bin 0; 10 and 99 clamp into bin 9
    assert out[0].n == 2  # -5, 0
    assert out[1].n == 1  # 1
    assert out[9].n == 3  # 9, 10, 99
    assert out[5].n == 1  # 5
    assert out[0].bin_lo == 0.0 and out[0].bin_hi == 1.0


def test_value_histogram_bad_args(spark):
    from embedding_to_vectordatabase_spark.operators.anomaly import (
        value_histogram,
    )

    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError):
        value_histogram(df, "v", 5.0, 5.0)
    with pytest.raises(ValueError):
        value_histogram(df, "v", 0.0, 1.0, 0)

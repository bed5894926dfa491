"""HLL sketch column + exact top-N frequent items."""

from __future__ import annotations

from pyspark.sql import functions as F

from embedding_to_vectordatabase_spark.operators.sketches import (
    approx_distinct_by,
    hll_estimate,
    hll_merge,
    hll_sketches,
    top_n_by_count,
)


def _events_df(spark):
    rows = [
        (i, ["view", "click", "purchase"][i % 3], i % 97, i // 40)
        for i in range(400)
    ]
    return spark.createDataFrame(
        rows, "event_id long, event_type string, user_id long, day long"
    )


def test_hll_estimate_within_tolerance_of_exact(spark):
    ev = _events_df(spark)
    approx = {
        r["event_type"]: r["n_distinct_approx"]
        for r in approx_distinct_by(ev, ["event_type"], "user_id").collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(1, 0.05 * exact[k])


def test_hll_merge_equals_direct_sketch(spark):
    """The persist-then-merge path must estimate exactly what a direct
    sketch over the union estimates (HLL merge is lossless at equal
    lg_k) — the property that makes the sketch column reusable."""
    ev = _events_df(spark)
    daily = hll_sketches(ev, ["event_type", "day"], "user_id")
    merged = {
        r["event_type"]: r["n_distinct_approx"]
        for r in hll_estimate(hll_merge(daily, ["event_type"])).collect()
    }
    direct = {
        r["event_type"]: r["n_distinct_approx"]
        for r in approx_distinct_by(ev, ["event_type"], "user_id").collect()
    }
    assert merged == direct


def test_top_n_by_count_exact_and_deterministic(spark):
    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 3 + [("d",)] * 1,
        "k string",
    )
    got = [(r["k"], r["n_occurrences"])
           for r in top_n_by_count(df, ["k"], 3).collect()]
    # ties (b=c=3) break lexicographically
    assert got == [("a", 5), ("b", 3), ("c", 3)]


def test_top_n_plan_has_no_global_sort(spark):
    df = spark.createDataFrame([("a",)] * 4, "k string")
    plan = top_n_by_count(df, ["k"], 2)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan

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


def _values_df(spark):
    # deterministic skewed values: value = (i*i) % 1009 over 3 sources
    rows = [
        (i, ["s1", "s2", "s3"][i % 3], float((i * i) % 1009))
        for i in range(3000)
    ]
    return spark.createDataFrame(
        rows, "event_id long, source string, value double"
    )


def test_kll_quantiles_within_rank_tolerance_of_exact(spark):
    from embedding_to_vectordatabase_spark.operators.sketches import (
        kll_quantiles,
        kll_sketches,
    )

    df = _values_df(spark)
    vals = sorted(r["value"] for r in df.collect())
    out = kll_quantiles(
        kll_sketches(df, [], "value"), ranks=[0.5, 0.9, 0.99]
    ).collect()[0]
    assert out["n_values"] == len(vals)
    # k=200 -> ~1.65% rank error; allow 4% of n either side
    tol = int(0.04 * len(vals))
    for rank, got in zip([0.5, 0.9, 0.99], out["quantiles"]):
        pos = int(rank * (len(vals) - 1))
        lo = vals[max(0, pos - tol)]
        hi = vals[min(len(vals) - 1, pos + tol)]
        assert lo <= got <= hi, (rank, got, lo, hi)


def test_kll_merge_n_exact_and_quantiles_sane(spark):
    """Merged per-source sketches must carry the EXACT total n (KLL
    tracks n losslessly) and the merged median must stay within the
    rank-error band of the exact global median."""
    from embedding_to_vectordatabase_spark.operators.sketches import (
        kll_merge,
        kll_quantiles,
        kll_sketches,
    )

    df = _values_df(spark)
    per_source = kll_sketches(df, ["source"], "value")
    assert per_source.count() == 3
    merged = kll_merge(per_source, [])
    out = kll_quantiles(merged, ranks=[0.5]).collect()[0]
    assert out["n_values"] == 3000
    vals = sorted(r["value"] for r in df.collect())
    tol = int(0.04 * len(vals))
    pos = len(vals) // 2
    assert vals[pos - tol] <= out["quantiles"][0] <= vals[pos + tol]


def test_kll_merge_single_sketch_group_is_identity(spark):
    """A 1-sketch group's merge fold performs zero merges and must
    return the input sketch byte-identically. The sketch is
    MATERIALIZED first (collect + re-create): KLL compaction is
    randomized per build, so two lazy re-evaluations of the same
    build plan may yield different (both-in-tolerance) sketches."""
    from embedding_to_vectordatabase_spark.operators.sketches import (
        kll_merge,
        kll_quantiles,
        kll_sketches,
    )

    df = _values_df(spark).filter(F.col("source") == "s1")
    built = kll_sketches(df, ["source"], "value")
    one = spark.createDataFrame(built.collect(), built.schema)
    direct = kll_quantiles(one, ranks=[0.5]).collect()[0]
    merged = kll_quantiles(
        kll_merge(one, ["source"]), ranks=[0.5]
    ).collect()[0]
    assert merged["n_values"] == direct["n_values"]
    assert merged["quantiles"] == direct["quantiles"]


def test_theta_set_algebra_exact_below_nominal(spark):
    """In exact mode (distinct counts << 2^lg_k) theta union /
    intersection / difference estimates equal the true set sizes."""
    from embedding_to_vectordatabase_spark.operators.sketches import (
        theta_difference,
        theta_estimate,
        theta_intersection,
        theta_sketches,
        theta_union,
    )

    # group a: users 0..99; group b: users 50..149 -> |a∩b|=50,
    # |a∪b|=150, |a\b|=50
    rows = [("a", u) for u in range(100)] + [
        ("b", u) for u in range(50, 150)
    ]
    df = spark.createDataFrame(rows, "g string, user_id long")
    per = theta_sketches(df, ["g"], "user_id")
    assert (
        theta_estimate(theta_union(per, []))
        .first()["n_distinct_approx"]
        == 150
    )
    assert (
        theta_estimate(theta_intersection(per, []))
        .first()["n_distinct_approx"]
        == 50
    )
    a = per.filter(F.col("g") == "a").select(
        F.col("theta").alias("sa")
    )
    b = per.filter(F.col("g") == "b").select(
        F.col("theta").alias("sb")
    )
    diff = (
        a.crossJoin(b)
        .select(theta_difference("sa", "sb").alias("theta"))
    )
    assert (
        theta_estimate(diff).first()["n_distinct_approx"] == 50
    )


def test_kll_merge_all_null_sketch_group_yields_null_sketch(spark):
    """A coarse group whose every fine-group SKETCH CELL is NULL
    (possible when rollup tables come through outer joins or
    hand-persisted partial builds — ``kll_sketch_agg_double`` itself
    returns an empty-but-non-NULL sketch for all-NULL values) must
    merge to a NULL sketch, not an ANSI INVALID_ARRAY_INDEX task
    error: collect_list drops the NULLs so the fold list is empty,
    and the try_element_at seed must absorb that (ADVICE r11)."""
    from embedding_to_vectordatabase_spark.operators.sketches import (
        kll_merge,
        kll_sketches,
    )

    real = kll_sketches(
        spark.createDataFrame(
            [("b", 0, 1.0), ("b", 1, 2.0)],
            "grp string, day int, value double",
        ),
        ["grp", "day"],
        "value",
    )
    nulls = spark.createDataFrame(
        [("a", 8, None, 0), ("a", 9, None, 0)],
        "grp string, day int, kll binary, n_values long",
    )
    fine = real.unionByName(nulls)
    out = {
        r["grp"]: (r["kll"], r["n_values"])
        for r in kll_merge(fine, ["grp"]).collect()
    }
    assert out["a"][0] is None and out["a"][1] == 0
    assert out["b"][0] is not None and out["b"][1] == 2


def test_theta_sketches_quote_awkward_column_names(spark):
    """value/sketch column names travel as SQL text inside F.expr;
    the _ident backtick-quoting must make names with spaces/hyphens
    work instead of breaking the parse (ADVICE r11)."""
    from embedding_to_vectordatabase_spark.operators.sketches import (
        theta_estimate,
        theta_sketches,
        theta_union,
    )

    df = spark.createDataFrame(
        [("x", i % 7) for i in range(50)], "grp string, `user id` int"
    ).withColumnRenamed("`user id`", "user id")
    sk = theta_sketches(df, ["grp"], "user id", sketch_col="the-ta")
    est = theta_estimate(
        theta_union(sk, ["grp"], sketch_col="the-ta"),
        sketch_col="the-ta",
    ).collect()
    assert est[0]["n_distinct_approx"] == 7


def _cms_events(spark):
    # user 3 appears 60x, user 7 30x, the rest once each
    rows = (
        [("view", 3)] * 60
        + [("view", 7)] * 30
        + [("view", u) for u in range(100, 140)]
        + [("click", 3)] * 10
    )
    return spark.createDataFrame(rows, "event_type string, user_id long")


def test_cms_estimate_never_under_and_within_eps_bound(spark):
    """CMS guarantee: estimate >= exact always; <= exact + eps*n with
    prob `confidence` (deterministic here — fixed seed)."""
    from embedding_to_vectordatabase_spark.operators.sketches import (
        cms_estimate,
        cms_sketches,
    )

    ev = _cms_events(spark)
    sk = cms_sketches(ev, ["event_type"], "user_id", eps=0.01, seed=7)
    est = {
        (r["event_type"], r["item"]): (r["est_count"], r["n_values"])
        for r in cms_estimate(
            sk, [3, 7, 999], ["event_type"]
        ).collect()
    }
    exact = {("view", "3"): 60, ("view", "7"): 30, ("view", "999"): 0,
             ("click", "3"): 10, ("click", "7"): 0, ("click", "999"): 0}
    for k, (e, n) in est.items():
        assert e >= exact[k], f"CMS underestimated {k}"
        assert e <= exact[k] + 0.01 * n + 1, f"CMS blew eps bound {k}"
    # heavy hitter is estimated exactly at this scale/width
    assert est[("view", "3")][0] == 60


def test_cms_merge_estimate_rollup_total(spark):
    """Driver-side mergeInPlace rollup: per-event-type sketches merge
    to a total whose estimates cover the union (still never under the
    exact total count)."""
    from embedding_to_vectordatabase_spark.operators.sketches import (
        cms_merge_estimate,
        cms_sketches,
    )

    ev = _cms_events(spark)
    sk = cms_sketches(ev, ["event_type"], "user_id", eps=0.01, seed=7)
    ests, n = cms_merge_estimate(sk, [3, 7])
    assert n == 140
    d = dict(ests)
    assert d["3"] >= 70 and d["7"] >= 30


def test_cms_string_items(spark):
    from embedding_to_vectordatabase_spark.operators.sketches import (
        cms_estimate,
        cms_sketches,
    )

    df = spark.createDataFrame(
        [("a", "tok1")] * 5 + [("a", "tok2")] * 2,
        "grp string, tok string",
    )
    sk = cms_sketches(df, ["grp"], "tok", eps=0.01, seed=11)
    est = {
        r["item"]: r["est_count"]
        for r in cms_estimate(sk, ["tok1", "tok2"], ["grp"]).collect()
    }
    assert est["tok1"] >= 5 and est["tok2"] >= 2


def test_cms_estimate_struct_group_column(spark):
    """Group columns with nested types must survive the output-schema
    construction (r12 ADVICE: the old DDL-string build broke on the
    internal colons of struct<...>.simpleString())."""
    from embedding_to_vectordatabase_spark.operators.sketches import (
        cms_estimate,
        cms_sketches,
    )

    df = spark.createDataFrame(
        [((u"a", 1), 10)] * 4 + [(("b", 2), 20)] * 3,
        "grp struct<name:string,k:int>, user_id long",
    )
    sk = cms_sketches(df, ["grp"], "user_id", eps=0.01, seed=5)
    out = cms_estimate(sk, [10, 20], ["grp"])
    rows = {(r["grp"]["name"], r["item"]): r["est_count"] for r in out.collect()}
    assert rows[("a", "10")] >= 4 and rows[("b", "20")] >= 3


def test_cms_distributed_estimates_match_jvm_exactly(spark):
    """The pure-Python CMS reader (cms_estimate_distributed) must be
    bit-identical to the JVM's estimateCount on the SAME sketches —
    both the integral hashA path and the string Murmur3 path,
    including multi-byte UTF-8 probes (r12 VERDICT item 4b: the
    distributed path removes the driver-collect cardinality
    contract)."""
    from embedding_to_vectordatabase_spark.operators.sketches import (
        cms_estimate,
        cms_estimate_distributed,
        cms_sketches,
    )

    ev = _cms_events(spark)
    sk = cms_sketches(ev, ["event_type"], "user_id", eps=0.01, seed=7)
    items = [3, 7, 999, -1]
    drv = {
        (r["event_type"], r["item"]): (r["est_count"], r["n_values"])
        for r in cms_estimate(sk, items, ["event_type"]).collect()
    }
    dist = {
        (r["event_type"], r["item"]): (r["est_count"], r["n_values"])
        for r in cms_estimate_distributed(
            sk, items, ["event_type"]
        ).collect()
    }
    assert drv == dist and len(dist) == 2 * len(items)

    # string-item sketches: Murmur3 path, incl. multi-byte UTF-8
    sdf = spark.createDataFrame(
        [("a", "tok1")] * 5 + [("a", "日本語")] * 3 + [("b", "tok1")] * 2,
        "grp string, tok string",
    )
    ssk = cms_sketches(sdf, ["grp"], "tok", eps=0.01, seed=11)
    sitems = ["tok1", "日本語", "missing"]
    drv_s = {
        (r["grp"], r["item"]): r["est_count"]
        for r in cms_estimate(ssk, sitems, ["grp"]).collect()
    }
    dist_s = {
        (r["grp"], r["item"]): r["est_count"]
        for r in cms_estimate_distributed(ssk, sitems, ["grp"]).collect()
    }
    assert drv_s == dist_s
    assert dist_s[("a", "tok1")] >= 5 and dist_s[("a", "日本語")] >= 3


def test_cms_merge_distributed_matches_jvm_merge(spark):
    """Distributed CMS merge (elementwise table add inside
    applyInPandas) must produce sketches the JVM itself can read, with
    estimates IDENTICAL to the driver-side mergeInPlace rollup, and
    must refuse incompatible-parameter sketches."""
    import pytest as _pytest

    from embedding_to_vectordatabase_spark.operators.sketches import (
        _cms_read,
        cms_estimate_distributed,
        cms_merge_distributed,
        cms_merge_estimate,
        cms_sketches,
    )

    ev = _cms_events(spark).withColumn(
        "day", (F.col("user_id") % 2).cast("string")
    )
    fine = cms_sketches(ev, ["event_type", "day"], "user_id", eps=0.01, seed=7)
    coarse = cms_merge_distributed(fine, ["event_type"])
    assert coarse.count() == 2
    items = [3, 7, 999]
    dist = {
        (r["event_type"], r["item"]): (r["est_count"], r["n_values"])
        for r in cms_estimate_distributed(
            coarse, items, ["event_type"]
        ).collect()
    }
    # oracle: the JVM's own mergeInPlace per event_type
    for et in ("view", "click"):
        sub = fine.filter(F.col("event_type") == et)
        ests, n = cms_merge_estimate(sub, items)
        for it, est in ests:
            assert dist[(et, it)] == (est, n), (et, it)
    # the merged binary itself must be JVM-readable
    row = coarse.filter(F.col("event_type") == "view").collect()[0]
    jvm = _cms_read(spark, row["cms"])
    assert jvm.estimateCount(3) == dist[("view", "3")][0]
    # incompatible seeds refuse to merge
    bad = cms_sketches(ev, ["event_type", "day"], "user_id", eps=0.01, seed=8)
    with _pytest.raises(Exception, match="incompatible|PYTHON"):
        cms_merge_distributed(
            fine.limit(1).unionByName(bad.limit(1)),
            ["event_type"],
        ).collect()


def test_cms_merge_distributed_null_and_absent_n_values(spark):
    """r13 ADVICE low: a coarse group whose fine rows ALL carry NULL
    n_values must merge to NULL (not a fabricated 0 from NaN-skipping
    sum), a mixed group sums only the non-NULLs, and an input WITHOUT
    the n_values column merges fine with NULL output — mirroring
    cms_estimate_distributed's optional-column contract."""
    from embedding_to_vectordatabase_spark.operators.sketches import (
        cms_merge_distributed,
        cms_sketches,
    )

    ev = _cms_events(spark).withColumn(
        "day", (F.col("user_id") % 2).cast("string")
    )
    fine = cms_sketches(ev, ["event_type", "day"], "user_id", eps=0.01, seed=7)
    # all-NULL group -> NULL; mixed group -> sum of non-NULLs
    nulled = fine.withColumn(
        "n_values",
        F.when(
            (F.col("event_type") == "view")
            | ((F.col("event_type") == "click") & (F.col("day") == "0")),
            F.lit(None).cast("long"),
        ).otherwise(F.col("n_values")),
    )
    kept = {
        r["day"]: r["n_values"]
        for r in fine.filter(
            (F.col("event_type") == "click") & (F.col("day") == "1")
        ).collect()
    }
    out = {
        r["event_type"]: r["n_values"]
        for r in cms_merge_distributed(nulled, ["event_type"]).collect()
    }
    assert out["view"] is None, f"all-NULL group fabricated {out['view']}"
    assert out["click"] == sum(kept.values())
    # column absent entirely -> still merges, n_values NULL
    no_col = fine.drop("n_values")
    out2 = cms_merge_distributed(no_col, ["event_type"]).collect()
    assert len(out2) == 2 and all(r["n_values"] is None for r in out2)

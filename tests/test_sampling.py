"""Deterministic split / source-mixing operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from embedding_to_vectordatabase_spark.operators.sampling import (
    deterministic_split,
    mix_sources,
)


def test_split_proportions_determinism_and_stability(spark):
    df = spark.range(20_000).select(F.col("id").alias("doc_id"))
    out = deterministic_split(df, seed=42)
    counts = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    n = 20_000
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] - 0.9 * n) < 0.02 * n
    assert abs(counts["val"] - 0.05 * n) < 0.01 * n
    assert abs(counts["test"] - 0.05 * n) < 0.01 * n
    # every row gets exactly one label, and a re-run agrees row-for-row
    again = deterministic_split(df, seed=42)
    assert out.join(
        again.withColumnRenamed("split", "split2"), "doc_id"
    ).filter(F.col("split") != F.col("split2")).count() == 0
    # a different seed shuffles membership (not a constant function)
    other = deterministic_split(df, seed=7).withColumnRenamed(
        "split", "split2"
    )
    assert out.join(other, "doc_id").filter(
        F.col("split") != F.col("split2")
    ).count() > 0


def test_split_custom_weights_normalized(spark):
    df = spark.range(10_000).select(F.col("id").alias("doc_id"))
    out = deterministic_split(df, weights=[("a", 3.0), ("b", 1.0)])
    counts = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert abs(counts["a"] - 7500) < 200 and abs(counts["b"] - 2500) < 200


def test_mix_sources_downsamples_only_listed(spark):
    rows = [(i, "heavy" if i % 2 else "rare") for i in range(10_000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = mix_sources(df, {"heavy": 0.1}, seed=42)
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts["rare"] == 5000          # untouched source kept whole
    assert abs(counts["heavy"] - 500) < 120
    # survivors are a deterministic subset
    again = mix_sources(df, {"heavy": 0.1}, seed=42)
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_weighted_sample_proportional_and_deterministic(spark):
    from embedding_to_vectordatabase_spark.operators.sampling import (
        weighted_sample,
    )

    # three weight strata: 0.0 (dropped), 0.5 (half), 1.0 (all kept)
    rows = [(i, [0.0, 0.5, 1.0][i % 3]) for i in range(30_000)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    out = weighted_sample(df, F.col("w"), seed=42)
    counts = {
        r["w"]: r["n"]
        for r in out.groupBy("w").agg(F.count("*").alias("n")).collect()
    }
    assert 0.0 not in counts                       # p=0 drops everything
    assert counts[1.0] == 10_000                   # p>=1 keeps everything
    assert abs(counts[0.5] - 5_000) < 300          # p=0.5 keeps ~half
    # pure function of (seed, id): re-run identical, new seed differs
    again = weighted_sample(df, F.col("w"), seed=42)
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )
    other = weighted_sample(df, F.col("w"), seed=7)
    assert {r["doc_id"] for r in out.collect()} != {
        r["doc_id"] for r in other.collect()
    }
    # weights above 1 / below 0 clamp rather than error
    clamped = weighted_sample(
        spark.createDataFrame([(1, 5.0), (2, -3.0)], "doc_id long, w double"),
        F.col("w"),
    )
    assert {r["doc_id"] for r in clamped.collect()} == {1}


def test_pack_sequences_greedy_chunks(spark):
    from embedding_to_vectordatabase_spark.operators.sampling import (
        pack_sequences,
    )

    df = spark.createDataFrame(
        [(1, 300), (2, 300), (3, 300), (4, 50), (5, 600), (6, 10)],
        "doc_id long, n_tokens long",
    )
    out = {
        r["doc_id"]: r["seq_id"]
        for r in pack_sequences(df, budget_tokens=512).collect()
    }
    # concat stream offsets: 0,300,600,900,950,1550
    assert out == {1: 0, 2: 0, 3: 1, 4: 1, 5: 1, 6: 3}
    # sharded: packing is independent per shard, ids deterministic
    sharded = pack_sequences(df, budget_tokens=512, shards=2)
    rows = {(r["doc_id"]): (r["__shard"], r["seq_id"]) for r in sharded.collect()}
    # shard 0: ids 2,4,6 -> offsets 0,300,350 -> seqs 0,0,0
    # shard 1: ids 1,3,5 -> offsets 0,300,600 -> seqs 0,0,1
    assert rows == {2: (0, 0), 4: (0, 0), 6: (0, 0),
                    1: (1, 0), 3: (1, 0), 5: (1, 1)}


def test_topk_per_group_rank_and_tiebreak(spark):
    from embedding_to_vectordatabase_spark.operators.sampling import (
        topk_per_group,
    )

    rows = [
        (1, "a", 10), (2, "a", 30), (3, "a", 30), (4, "a", 5),
        (5, "b", 1),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, score long")
    out = topk_per_group(df, ["source"], "score", 2).collect()
    got = {(r["source"], r["rk"]): r["doc_id"] for r in out}
    # score desc, doc_id asc on the 30/30 tie
    assert got[("a", 1)] == 2 and got[("a", 2)] == 3
    assert got[("b", 1)] == 5 and len(out) == 3


def test_stratified_sample_exact_counts_and_determinism(spark):
    from embedding_to_vectordatabase_spark.operators.sampling import (
        stratified_sample,
    )

    rows = [(i, "s%d" % (i % 3)) for i in range(60)] + [(None, "s0")]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    a = stratified_sample(df, ["source"], 5).collect()
    b = stratified_sample(df, ["source"], 5).collect()
    from collections import Counter

    counts = Counter(r["source"] for r in a)
    assert counts == {"s0": 5, "s1": 5, "s2": 5}
    assert sorted((r["source"], r["doc_id"]) for r in a) == sorted(
        (r["source"], r["doc_id"]) for r in b
    )  # pure function of (seed, id)
    assert all(r["doc_id"] is not None for r in a)
    # different seed -> (almost surely) different pick somewhere
    c = stratified_sample(df, ["source"], 5, seed=7).collect()
    assert sorted(r["doc_id"] for r in a) != sorted(r["doc_id"] for r in c)


def test_stratified_sample_small_stratum(spark):
    from embedding_to_vectordatabase_spark.operators.sampling import (
        stratified_sample,
    )

    df = spark.createDataFrame(
        [(1, "tiny"), (2, "tiny")], "doc_id long, source string"
    )
    assert stratified_sample(df, ["source"], 5).count() == 2


def test_percentile_threshold_filter_per_group_median(spark):
    from embedding_to_vectordatabase_spark.operators.sampling import (
        percentile_threshold_filter,
    )

    rows = [
        # group a: scores 1..4, median 2.5 -> keep 3,4
        (1, "a", 1.0), (2, "a", 2.0), (3, "a", 3.0), (4, "a", 4.0),
        # group b: scores 10,20,30 (odd count), median 20 -> keep 20,30
        (5, "b", 10.0), (6, "b", 20.0), (7, "b", 30.0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, g string, s double")
    kept = {
        r["doc_id"]
        for r in percentile_threshold_filter(df, ["g"], "s", 0.5).collect()
    }
    assert kept == {3, 4, 6, 7}


def test_temperature_mix_sqrt_properties(spark):
    from pyspark.sql import functions as F

    from embedding_to_vectordatabase_spark.operators.sampling import (
        temperature_mix,
    )

    rows = (
        [(i, "big") for i in range(1600)]
        + [(10_000 + i, "mid") for i in range(400)]
        + [(20_000 + i, "small") for i in range(100)]
        + [(30_000, None)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_mix(df, "lang", alpha=0.5)
    counts = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    # smallest group keeps 100%; others ~ sqrt(n_min/n_g) of their size
    assert counts["small"] == 100
    assert abs(counts["mid"] - 400 * 0.5) <= 40      # sqrt(100/400)=0.5
    assert abs(counts["big"] - 1600 * 0.25) <= 60    # sqrt(100/1600)=0.25
    # NULL groups excluded entirely
    assert None not in counts
    # pure function of (seed, id): re-run identical
    again = {
        r["lang"]: r["n"]
        for r in temperature_mix(df, "lang", alpha=0.5)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert again == counts


def test_temperature_mix_alpha_extremes(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from embedding_to_vectordatabase_spark.operators.sampling import (
        temperature_mix,
    )

    rows = [(i, "a") for i in range(900)] + [
        (10_000 + i, "b") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    # alpha=1: keep everything (rate 1, u strictly < 1)
    assert temperature_mix(df, "lang", alpha=1.0).count() == 1000
    # alpha=0: equalize — group a keeps ~n_min rows
    eq = {
        r["lang"]: r["n"]
        for r in temperature_mix(df, "lang", alpha=0.0)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert eq["b"] == 100
    assert abs(eq["a"] - 100) <= 35
    with _pytest.raises(ValueError):
        temperature_mix(df, "lang", alpha=1.5)


def test_grouped_split_group_integrity(spark):
    from pyspark.sql import functions as F

    from embedding_to_vectordatabase_spark.operators.sampling import (
        grouped_split,
    )

    rows = [(i, f"domain{i % 40}") for i in range(4000)] + [(9999, None)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = grouped_split(
        df, "source", [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    )
    # every group maps to exactly ONE split (the leakage-safety
    # property a row-hash split does not have)
    per_group = (
        out.groupBy("source")
        .agg(F.countDistinct("split").alias("k"))
        .collect()
    )
    assert all(r["k"] == 1 for r in per_group)
    # NULL group -> residual split
    assert (
        out.filter(F.col("source").isNull()).select("split").collect()[0][0]
        == "test"
    )
    # all three splits populated across 40 domains
    assert out.select("split").distinct().count() == 3


def test_temperature_mix_survives_existing_rate_column(spark):
    """df carrying its own __rate column must not collide with the
    sampler's temp column (same guard class as bloom_anti_join's
    __bloom; r7 review finding)."""
    from embedding_to_vectordatabase_spark.operators.sampling import (
        temperature_mix,
    )

    rows = [(i, "a", 0.9) for i in range(200)] + [
        (10_000 + i, "b", 0.1) for i in range(50)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, __rate double"
    )
    out = temperature_mix(df, "lang", alpha=0.5)
    assert out.columns == df.columns
    # user column intact, smallest group fully kept
    assert out.filter(out.lang == "b").count() == 50
    assert set(
        r["__rate"] for r in out.select("__rate").distinct().collect()
    ) <= {0.9, 0.1}

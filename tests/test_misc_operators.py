"""Text analytics, multimodal plumbing, LLM labeling, load metrics,
joins, and the harness contract itself."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from embedding_to_vectordatabase_spark.operators.joins import (
    anti_join_ingested,
    kb_scoped_registry,
    registry_lookup,
)
from embedding_to_vectordatabase_spark.operators.labeling import (
    label_documents,
)
from embedding_to_vectordatabase_spark.operators.metrics import load_metrics
from embedding_to_vectordatabase_spark.operators.multimodal import (
    attach_media_meta,
    extract_media_features,
)
from embedding_to_vectordatabase_spark.operators.textanalysis import (
    profile_documents,
)


def test_lang_id_and_profile(spark):
    rows = [
        (1, "the cat is on the mat and the dog is here"),
        (2, "der Hund und die Katze sind mit dem Ball"),
        (3, "这是一个中文文档"),
        (4, "xyzzy plugh"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    prof = {r["doc_id"]: r for r in profile_documents(df).collect()}
    assert prof[1]["pred_lang"] == "en"
    assert prof[2]["pred_lang"] == "de"
    assert prof[3]["pred_lang"] == "zh"
    assert prof[4]["pred_lang"] == "und"
    assert prof[1]["n_tokens"] == 11
    assert 0.0 <= prof[1]["quality"] <= 1.0
    # fingerprint is order-insensitive over the word set
    df2 = spark.createDataFrame(
        [(1, "mat the on is cat the and here dog the is")],
        "doc_id long, text string",
    )
    fp2 = profile_documents(df2).first()["fingerprint"]
    assert fp2 == prof[1]["fingerprint"]


def test_lang_id_lane_saturation_on_huge_stopword_doc(spark):
    """>65535 hits of one marker set must saturate its 16-bit lane,
    not carry into the next language's lane (a ~280 KB 'the ...' doc
    used to come out 'de')."""
    from embedding_to_vectordatabase_spark.operators.textanalysis import (
        lang_id,
    )

    text = "the " * 70000 + "der die"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    assert df.select(lang_id(F.col("text")).alias("l")).first()["l"] == "en"


def test_multimodal_plumbing(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"pretend-png-bytes")), (2, bytearray(b"x"))],
        "media_id long, payload binary",
    )
    meta = attach_media_meta(df, media_type="image", fmt="png")
    got = {r["media_id"]: r["meta"] for r in meta.collect()}
    assert got[1]["n_bytes"] == 17
    assert got[1]["media_type"] == "image"

    feats = extract_media_features(df, dim=8).collect()
    assert all(len(r["features"]) == 8 for r in feats)
    # deterministic: same payload -> same features
    again = extract_media_features(df, dim=8).collect()
    assert {r["media_id"]: r["features"] for r in feats} == {
        r["media_id"]: r["features"] for r in again
    }


def test_labeling_rules(spark):
    rows = [
        (1, "a document about VECTOR search"),
        (2, "streams and stream processing"),
        (3, "join strategies in databases"),
        (4, "nothing relevant here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["label"] for r in label_documents(df).collect()}
    assert got == {
        1: "vector-workload", 2: "streaming", 3: "relational", 4: "other"
    }


def test_load_metrics(spark):
    rows = [
        ("2024-01-01 00:00:00", 100.0, 10),
        ("2024-01-01 00:00:10", 300.0, 30),
    ]
    df = spark.createDataFrame(
        rows, "ts string, latency_ms double, rows long"
    ).withColumn("ts", F.to_timestamp("ts"))
    m = load_metrics(df, rows_col="rows").first()
    assert m["n_requests"] == 2
    assert m["duration_s"] == 10.0
    assert m["requests_per_s"] == pytest.approx(0.2)
    assert m["avg_latency_ms"] == pytest.approx(200.0)
    assert m["rows_per_s"] == pytest.approx(4.0)


def test_registry_lookup_split(spark):
    docs = spark.createDataFrame(
        [(1, "a.pdf"), (2, "b.pdf"), (3, "missing.pdf")],
        "doc_id long, file_name string",
    )
    registry = spark.createDataFrame(
        [(10, "a.pdf"), (20, "b.pdf")], "id long, name string"
    )
    matched, unmatched = registry_lookup(docs, registry)
    assert {r["file_id"] for r in matched.collect()} == {10, 20}
    assert [r["doc_id"] for r in unmatched.collect()] == [3]


def test_anti_join_and_kb_scope(spark):
    docs = spark.createDataFrame([(1,), (2,), (3,)], "file_id long")
    ingested = spark.createDataFrame([(2,)], "file_id long")
    assert {r["file_id"] for r in anti_join_ingested(docs, ingested).collect()} == {1, 3}

    reg = spark.createDataFrame(
        [(1, "a", 7), (2, "b", 7), (3, "c", 9)],
        "id long, name string, konwledge_base_id int",
    )
    assert [r["id"] for r in kb_scoped_registry(reg, 7).collect()] == [1, 2]


def test_salted_join_matches_plain_join(spark):
    from embedding_to_vectordatabase_spark.util import salted_join

    # skewed fact: key 1 is hot
    fact = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, 900), (3, 901)],
        "k long, payload long",
    )
    dim = spark.createDataFrame(
        [(1, "a"), (2, "b"), (4, "d")], "k long, attr string"
    )
    for how in ("inner", "left"):
        got = salted_join(fact, dim, "k", num_salts=8, how=how)
        want = fact.join(dim, "k", how)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )


def test_harness_contract():
    """Every queries() entry is callable; every oracle key exists."""
    import __spark_entry__ as e

    qs = e.queries()
    sqls = e.oracle_sql()
    assert len(qs) >= 50
    assert set(sqls) <= set(qs)
    assert all(callable(f) for f in qs.values())
    # rows-only entries are exactly the model-boundary ops (seeded
    # Python kernels / engine-specific sketch estimates a SQL oracle
    # can't reproduce) — nothing else
    # (dense_topk_quantized moved to hash-checked in r7 via the
    # symmetric int-dot candidate stage)
    assert set(qs) - set(sqls) == {
        "ann_topk_bucketed",
        "ann_topk_ivf",
        "ann_similarity_join_mllib",
        "simhash_pairs",
        "t1_chunk_recursive",
        "t1_chunk_recursive_prod",
        "t2_semantic_chunks",
        "multimodal_features",
        "ingest_chunks",
        "sketch_distinct_users",
        "sketch_value_quantiles",
        "cms_user_counts",
        "pq_topk_refined",
        "ivfadc_topk_refined",
        # r15: sq8/ivfsq8 converted to full value oracles (pinned
        # ranges + symmetric integer code-space scoring)
        "semdedup_survivors",
        # r15: physical store layout report (file/segment counts a
        # SQL oracle over the logical tables cannot see) and the
        # client-facade lifecycle (store mutation side effects;
        # its search arithmetic is hash-checked via the sq8 seats)
        "index_stats_report",
        "collection_client_e2e",
    }
    # the gate samples the first-50 registry prefix; r15's rotation
    # (__spark_entry__._R15_WINDOW) declares it explicitly — the
    # window must be exactly the declared names, in order, and the
    # tail past the window keeps oracle-bearing entries before
    # rows-only ones (so any window growth picks up hash-checkable
    # queries first)
    names = list(qs)
    assert names[: len(e._R16_WINDOW)] == e._R16_WINDOW
    assert len(e._R16_WINDOW) == 50
    tail = names[len(e._R16_WINDOW):]
    tail_rows_only = [n for n in tail if n not in sqls]
    if tail_rows_only:
        assert tail[-len(tail_rows_only):] == tail_rows_only
    # the r16 window tail is the rows-only block, in the declared
    # rotation order: changed-this-round seats first, then the
    # stalest recorded cohorts (see WINDOW_REPORT.json)
    win_rows_only = [n for n in e._R16_WINDOW if n not in sqls]
    assert win_rows_only == [
        "collection_client_e2e",
        "index_stats_report",
        "pq_topk_refined",
        "ivfadc_topk_refined",
        "ann_topk_bucketed",
        "ann_topk_ivf",
        "ann_similarity_join_mllib",
        "t1_chunk_recursive",
        "t2_semantic_chunks",
        "multimodal_features",
        "ingest_chunks",
        "sketch_distinct_users",
        "semdedup_survivors",
    ]
    assert e._R16_WINDOW[-len(win_rows_only):] == win_rows_only


def test_clean_corpus_filters_and_dedups(spark):
    """Composed cleaning plan: quality gate, language restriction, and
    lowest-id survivor per exact-duplicate group."""
    from embedding_to_vectordatabase_spark.plans.clean import clean_corpus

    rows = [
        (1, "the cat sat on the mat and the dog is with it " * 5),
        (2, "the cat sat on the mat and the dog is with it " * 5),  # dup of 1
        (3, "der hund und die katze mit der maus und das haus " * 5),
        (4, "xx"),  # too short -> quality below threshold
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = clean_corpus(df, min_quality=0.5)
    got = {r["doc_id"]: r for r in out.collect()}
    assert set(got) == {1, 3}  # 2 deduped, 4 quality-filtered
    assert got[1]["pred_lang"] == "en"
    assert got[3]["pred_lang"] == "de"

    only_en = clean_corpus(df, allowed_langs=["en"], min_quality=0.5)
    assert {r["doc_id"] for r in only_en.collect()} == {1}


def test_table_stats_profile(spark):
    from embedding_to_vectordatabase_spark.operators.metrics import (
        table_stats,
    )

    df = spark.createDataFrame(
        [(1, 2.0, "a"), (2, None, "b"), (3, 4.0, None), (4, 4.0, "b")],
        "id long, v double, s string",
    )
    got = {r["column"]: r for r in table_stats(df, exact=True).collect()}
    assert got["id"]["n_rows"] == 4 and got["id"]["n_nulls"] == 0
    assert got["v"]["n_nulls"] == 1 and got["v"]["n_distinct"] == 2
    assert got["v"]["min"] == 2.0 and got["v"]["max"] == 4.0
    assert got["v"]["mean"] == round(10.0 / 3, 6)
    assert got["s"]["min"] is None and got["s"]["n_distinct"] == 2
    # approx mode: HLL estimates within 10% on tiny exact cardinalities
    approx = {r["column"]: r for r in table_stats(df).collect()}
    assert abs(approx["id"]["n_distinct"] - 4) <= 1
    # quantiles: exact percentile over [2,4,4] (percentile_cont interp)
    assert got["v"]["p50"] == 4.0 and got["v"]["p25"] == 3.0
    assert got["s"]["p50"] is None


def test_table_stats_alias_collision_columns(spark):
    """Columns literally named like a name-derived agg alias must not
    corrupt each other's stats (aliases are index-based)."""
    from embedding_to_vectordatabase_spark.operators.metrics import (
        table_stats,
    )

    df = spark.createDataFrame(
        [(1, 10.0, 5), (2, 20.0, None)],
        "x long, x__nn double, x__min long",
    )
    got = {r["column"]: r for r in table_stats(df, exact=True).collect()}
    assert got["x"]["n_nulls"] == 0 and got["x"]["n_distinct"] == 2
    assert got["x__nn"]["min"] == 10.0 and got["x__nn"]["max"] == 20.0
    assert got["x__min"]["n_nulls"] == 1 and got["x__min"]["max"] == 5.0


def test_asof_join_semantics(spark):
    """Backward as-of: inclusive equal-ts match, left-join NULLs for
    rows with no preceding right row, tolerance NULLs stale matches."""
    from datetime import datetime

    from embedding_to_vectordatabase_spark.operators.joins import asof_join

    def t(h):
        return datetime(2024, 1, 1, h)

    left = spark.createDataFrame(
        [(1, t(1)), (2, t(5)), (3, t(10)), (4, t(0))],
        "lid long, ts timestamp",
    ).withColumn("k", F.lit("u"))
    right = spark.createDataFrame(
        [(100, t(1)), (200, t(4))], "rid long, ts timestamp"
    ).withColumn("k", F.lit("u"))

    out = {
        r["lid"]: r["rid"]
        for r in asof_join(left, right, ["k"], right_cols=["rid"]).collect()
    }
    # lid=1 matches rid=100 at EQUAL ts (inclusive); lid=4 precedes all
    assert out == {1: 100, 2: 200, 3: 200, 4: None}

    tol = {
        r["lid"]: r["rid"]
        for r in asof_join(
            left, right, ["k"], right_cols=["rid"], tolerance="2 hours"
        ).collect()
    }
    # lid=3 at 10h is 6h after rid=200 -> stale under 2h tolerance
    assert tol == {1: 100, 2: 200, 3: None, 4: None}


def test_asof_join_null_keys_and_duplicate_right_ts(spark):
    """SQL NULL-key semantics (NULL matches nothing; left NULL-key rows
    pass through unmatched) and a deterministic winner among right rows
    sharing the matched timestamp — both verified against DuckDB's
    ASOF JOIN on the same frames."""
    from datetime import datetime

    import duckdb

    from embedding_to_vectordatabase_spark.operators.joins import asof_join

    def t(h):
        return datetime(2024, 1, 1, h)

    lrows = [(1, "a", t(5)), (2, None, t(5)), (3, "b", t(5))]
    rrows = [
        ("a", t(2), 10),
        ("a", t(2), 30),   # duplicate ts — greatest payload must win
        ("a", t(2), 20),
        (None, t(1), 99),  # NULL key — must match nothing
    ]
    left = spark.createDataFrame(lrows, "lid long, k string, ts timestamp")
    right = spark.createDataFrame(rrows, "k string, ts timestamp, rid long")

    out = {
        r["lid"]: r["rid"]
        for r in asof_join(left, right, ["k"], right_cols=["rid"]).collect()
    }
    # lid=1: ties at t(2) break toward greatest payload (rid=30);
    # lid=2: NULL left key -> unmatched; lid=3: no right rows for 'b'
    assert out == {1: 30, 2: None, 3: None}

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE l(lid BIGINT, k VARCHAR, ts TIMESTAMP);"
        "CREATE TABLE r(k VARCHAR, ts TIMESTAMP, rid BIGINT);"
    )
    con.executemany("INSERT INTO l VALUES (?,?,?)", lrows)
    con.executemany("INSERT INTO r VALUES (?,?,?)", rrows)
    # DuckDB leaves the duplicate-ts winner unspecified; compare the
    # NULL-key/match-ts semantics exactly and the tie as set-membership
    duck = {
        lid: (rts, rid)
        for lid, rts, rid in con.execute(
            "SELECT l.lid, r.ts, r.rid FROM l ASOF LEFT JOIN r "
            "ON l.k = r.k AND l.ts >= r.ts"
        ).fetchall()
    }
    assert duck[2] == (None, None) and duck[3] == (None, None)
    assert duck[1][0] == t(2) and duck[1][1] in {10, 20, 30}


def test_range_join_banding_exact(spark):
    """Banded range join == exact inequality semantics, boundaries
    inclusive, cross-bucket matches found."""
    from datetime import datetime, timedelta

    from embedding_to_vectordatabase_spark.operators.joins import range_join

    base = datetime(2024, 1, 1)

    def t(s):
        return base + timedelta(seconds=s)

    left = spark.createDataFrame(
        [(1, t(1000))], "lid long, ts timestamp"
    ).withColumn("k", F.lit("u"))
    right = spark.createDataFrame(
        [(10, t(400)), (11, t(401)), (12, t(1000)), (13, t(1001)),
         (14, t(399))],
        "rid long, ts timestamp",
    ).withColumn("k", F.lit("u"))
    got = {
        r["rid"]
        for r in range_join(
            left, right, ["k"], "ts", "ts", -600.0, 0.0
        ).collect()
    }
    # [400, 1000] inclusive: 399 too old, 1001 in the future
    assert got == {10, 11, 12}


def test_curate_corpus_full_chain(spark):
    """clean (lang/quality/exact-dedup) then near-dup removal: the
    exact copy dies in clean, the truncated near-copy dies in the
    jaccard anti-join, low-quality dies at the threshold, and the
    survivor keeps its diagnostics."""
    from embedding_to_vectordatabase_spark.plans.curate import (
        curate_corpus,
    )

    base = "the cat and the dog play in the park with the ball every day"
    rows = [
        (1, base),
        (2, base),                      # exact dup -> clean drops (id 1 wins)
        (3, base + " until sunset"),    # near-dup -> jaccard drops (id 1 wins)
        (4, "xy"),                      # quality < threshold
        (5, "der Hund und die Katze sind mit dem Ball und der Maus da"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in curate_corpus(
        df, min_quality=0.4, jaccard_threshold=0.5, max_doc_freq=None
    ).collect()}
    assert set(got) == {1, 5}
    assert got[1]["pred_lang"] == "en"
    assert got[5]["pred_lang"] == "de"


def test_redact_pii_spans(spark):
    from embedding_to_vectordatabase_spark.operators.textanalysis import (
        redact_pii,
    )

    rows = [
        (1, "mail a.b+c@foo.co.uk now"),
        (2, "ssn 123-45-6789 leaked"),
        (3, "call +1 (555) 123-4567 today"),
        (4, "clean text"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["t"]
        for r in df.select(
            "doc_id", redact_pii(F.col("text")).alias("t")
        ).collect()
    }
    assert got[1] == "mail [EMAIL] now"
    assert got[2] == "ssn [SSN] leaked"
    assert got[3] == "call [PHONE] today"
    assert got[4] == "clean text"
    assert got[5] == ""


def test_repetition_score_bounds_and_boilerplate(spark):
    from embedding_to_vectordatabase_spark.operators.textanalysis import (
        repetition_score,
    )

    rows = [
        (1, "spam " * 50),                          # one 3-gram repeated
        (2, "all these words appear exactly once here"),
        (3, "too short"),                           # < n words -> 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["rep"]
        for r in df.select(
            "doc_id", repetition_score(F.col("text")).alias("rep")
        ).collect()
    }
    assert got[1] > 0.9          # boilerplate: nearly all grams repeat
    assert got[2] == 0.0         # fully distinct
    assert got[3] == 0.0


def test_snapshot_diff_classifies_changes(spark):
    from embedding_to_vectordatabase_spark.operators.joins import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "will vanish"), (4, None)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "changed!"), (4, None), (5, "brand new")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["change"] for r in snapshot_diff(old, new).collect()}
    # 1 unchanged (absent), 4 NULL==NULL unchanged (absent)
    assert out == {2: "changed", 3: "removed", 5: "added"}


def test_snapshot_diff_null_vs_absent(spark):
    from embedding_to_vectordatabase_spark.operators.joins import (
        snapshot_diff,
    )

    old = spark.createDataFrame([(1, None)], "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, ""), (2, None)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["change"] for r in snapshot_diff(old, new).collect()}
    # NULL text hashes like '' (present-but-empty == present-NULL);
    # doc 2 is genuinely new
    assert out == {2: "added"}


def test_bigram_lm_scores_orders_fluent_above_gibberish(spark):
    from embedding_to_vectordatabase_spark.operators.textanalysis import (
        bigram_lm_scores,
    )

    common = "the cat sat on the mat"
    rows = (
        [(i, common) for i in range(1, 9)]       # fluent: repeated pattern
        + [(9, "zq xv jk wp mn bd")]             # gibberish: unique bigrams
        + [(10, "solo")]                          # <2 tokens: no row
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in bigram_lm_scores(df).collect()}
    assert 10 not in out
    assert out[1]["n_bigrams"] == 5
    # corpus-frequent bigrams score higher than one-off gibberish
    assert out[1]["lm_score"] > out[9]["lm_score"]
    # identical docs get identical scores
    assert out[1]["lm_score"] == out[8]["lm_score"]


def test_bloom_anti_join_exact_and_prefilter(spark):
    """bloom_anti_join must equal the plain anti-join bit-for-bit
    (NULL keys included), while the bloom stage's candidate set stays
    near the true-duplicate count (bounded false positives)."""
    from functools import reduce

    from pyspark.sql import functions as F

    from embedding_to_vectordatabase_spark.operators.joins import (
        _bloom_test_sql,
        anti_join_ingested,
        bloom_anti_join,
    )

    docs = spark.range(0, 2000).select(
        F.when(F.col("id") % 199 != 0, F.col("id")).alias("file_id"),
        (F.col("id") * 3).alias("payload"),
    )
    ingested = spark.range(0, 2000).filter(F.col("id") % 7 == 0).select(
        F.col("id").alias("file_id")
    )

    got = bloom_anti_join(
        docs, ingested, key="file_id", n_bits=1 << 14, n_hashes=5
    )
    want = anti_join_ingested(docs, ingested, key="file_id")

    def keyed(df):  # NULL-safe sort for the comparison
        return sorted(
            ((r["file_id"], r["payload"]) for r in df.collect()),
            key=lambda t: (t[0] is None, t[0] or 0, t[1]),
        )

    assert keyed(got) == keyed(want)

    # candidate bound: dupes ≈ 2000/7 ≈ 286; fp should add only a few
    # at 16384 bits / ~1430 set keys. Uses the PRODUCTION bitmap
    # build (_bloom_bitmap) so the bound always tests the real scheme.
    from embedding_to_vectordatabase_spark.operators.joins import (
        _bloom_bitmap,
    )

    n_bits, n_hashes = 1 << 14, 5
    bitmap = _bloom_bitmap(ingested, "file_id", n_bits, n_hashes)
    bm = spark.createDataFrame([(bitmap,)], "__bloom array<bigint>")
    maybe = reduce(
        lambda a, b: a & b,
        [F.expr(_bloom_test_sql("file_id", i, n_bits)) for i in range(n_hashes)],
    )
    n_candidates = docs.crossJoin(F.broadcast(bm)).filter(maybe).count()
    n_true_dupes = docs.join(
        ingested, on="file_id", how="left_semi"
    ).count()
    assert n_candidates >= n_true_dupes  # no false negatives
    assert n_candidates <= n_true_dupes + 60  # fp stays a few percent


def test_bloom_anti_join_mixed_key_types(spark):
    """xxhash64 is type-sensitive, so bloom_anti_join must cast the
    ingested key to the docs key's type — mismatched integral types
    would otherwise keep every true duplicate."""
    from pyspark.sql import functions as F

    from embedding_to_vectordatabase_spark.operators.joins import (
        anti_join_ingested,
        bloom_anti_join,
    )

    docs = spark.range(0, 500).select(
        F.col("id").cast("int").alias("file_id")
    )
    # bigint side, including a value outside int range: 2^32+5 must
    # NOT collide with int 5 (a lossy downcast would wrap it to 5
    # and wrongly drop doc 5)
    ingested = (
        spark.range(0, 500)
        .filter(F.col("id") % 5 == 0)
        .select(F.col("id").alias("file_id"))
        .unionByName(
            spark.createDataFrame(
                [((1 << 32) + 5,)], "file_id long"
            )
        )
    )
    got = sorted(
        r["file_id"]
        for r in bloom_anti_join(
            docs, ingested, n_bits=1 << 12, n_hashes=4
        ).collect()
    )
    want = sorted(
        r["file_id"]
        for r in anti_join_ingested(docs, ingested).collect()
    )
    # got == want is the whole contract: true dups removed, and no
    # doc falsely dropped by a wrapped (2^32+5 -> 5) downcast
    assert got == want and len(got) == 400


def test_bloom_anti_join_probe_is_jvm_native(spark):
    """The probe side (bitmap test) must stay out of Python: no
    BatchEvalPython / ArrowEvalPython / MapInPandas in the plan."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from embedding_to_vectordatabase_spark.operators.joins import (
        bloom_anti_join,
    )

    docs = spark.range(0, 100).select(F.col("id").alias("file_id"))
    ingested = spark.range(0, 50).select(F.col("id").alias("file_id"))
    out = bloom_anti_join(docs, ingested, n_bits=1 << 10, n_hashes=3)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    s = buf.getvalue()
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in s


def test_bloom_anti_join_survives_existing_bloom_column(spark):
    """docs carrying a literal __bloom column must not collide with
    the broadcast bitmap's temp column (round-7 ADVICE fix: the temp
    name is chosen collision-free against docs.columns)."""
    from pyspark.sql import functions as F

    from embedding_to_vectordatabase_spark.operators.joins import (
        anti_join_ingested,
        bloom_anti_join,
    )

    docs = spark.range(0, 200).select(
        F.col("id").alias("file_id"),
        F.lit("user-data").alias("__bloom"),
    )
    ingested = spark.range(0, 200).filter(F.col("id") % 5 == 0).select(
        F.col("id").alias("file_id")
    )
    got = bloom_anti_join(
        docs, ingested, key="file_id", n_bits=1 << 12, n_hashes=3
    )
    want = anti_join_ingested(docs, ingested, key="file_id")
    assert sorted(r["file_id"] for r in got.collect()) == sorted(
        r["file_id"] for r in want.collect()
    )
    # the user's own __bloom column survives untouched
    assert got.columns == docs.columns
    assert got.select("__bloom").distinct().collect()[0][0] == "user-data"


def _auto_join_fixture(spark, hot: bool):
    from pyspark.sql import functions as F

    # 90%-hot key 0 vs uniform keys; deterministic construction
    n = 2000
    base = spark.range(n)
    k = (
        F.when(F.col("id") % 10 != 9, F.lit(0)).otherwise(
            F.col("id") % 100
        )
        if hot
        else F.col("id") % 100
    )
    fact = base.select(k.cast("long").alias("k"), (F.col("id") * 3).alias("v"))
    dim = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    return fact, dim


def test_auto_join_broadcasts_small_dim(spark):
    from embedding_to_vectordatabase_spark.operators.joins import auto_join

    fact, dim = _auto_join_fixture(spark, hot=True)
    out = auto_join(fact, dim, "k")
    # default threshold (10MB) >> 100-row dim: broadcast wins even
    # over a 90%-hot fact key (nothing shuffles, skew irrelevant)
    assert auto_join.last_strategy == "broadcast"
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()


def test_auto_join_salts_hot_key_when_broadcast_disabled(spark):
    from embedding_to_vectordatabase_spark.operators.joins import auto_join

    fact, dim = _auto_join_fixture(spark, hot=True)
    want = sorted(
        (r["k"], r["v"], r["w"]) for r in fact.join(dim, "k").collect()
    )
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = auto_join(fact, dim, "k", num_salts=4)
        assert auto_join.last_strategy == "salted"
        got = sorted((r["k"], r["v"], r["w"]) for r in out.collect())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    assert got == want


def test_auto_join_plain_for_uniform_keys(spark):
    from embedding_to_vectordatabase_spark.operators.joins import auto_join

    fact, dim = _auto_join_fixture(spark, hot=False)
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = auto_join(fact, dim, "k")
        assert auto_join.last_strategy == "plain"
        assert out.count() == fact.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_auto_join_consults_precomputed_profile(spark):
    from embedding_to_vectordatabase_spark.operators.joins import auto_join
    from embedding_to_vectordatabase_spark.operators.metrics import (
        skew_profile,
    )

    fact, dim = _auto_join_fixture(spark, hot=True)
    prof = skew_profile(fact, "k")
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = auto_join(fact, dim, "k", profile=prof, num_salts=4)
        assert auto_join.last_strategy == "salted"
        assert out.count() == fact.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_auto_join_right_join_never_salted(spark):
    """Salting replicates the dim side, which breaks right/full outer
    semantics — a hot key under those join types must stay plain."""
    from embedding_to_vectordatabase_spark.operators.joins import auto_join

    fact, dim = _auto_join_fixture(spark, hot=True)
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        auto_join(fact, dim, "k", how="right")
        assert auto_join.last_strategy == "plain"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_auto_join_right_join_not_labeled_broadcast(spark):
    """A dim-side broadcast hint is silently ignored for how='right'
    (the dim must be the preserved side, so it cannot be the build
    side) — auto_join must not record 'broadcast' for a plan that
    actually shuffles (ADVICE r7)."""
    from embedding_to_vectordatabase_spark.operators.joins import auto_join

    fact, dim = _auto_join_fixture(spark, hot=False)
    # default 10MB threshold: the 100-row dim WOULD broadcast inner
    out = auto_join(fact, dim, "k", how="right")
    assert auto_join.last_strategy == "plain"
    assert out.count() >= dim.count()


def test_auto_join_null_hot_key_not_salted(spark):
    """A fact whose most frequent 'key' is NULL (left-enrichment
    shape) has no matched-side skew: NULLs never join, so salting
    would replicate the dim for nothing (ADVICE r7)."""
    from pyspark.sql import functions as F

    from embedding_to_vectordatabase_spark.operators.joins import auto_join

    n = 2000
    fact = spark.range(n).select(
        F.when(F.col("id") % 10 == 9, F.col("id") % 100)
        .cast("long")
        .alias("k"),
        (F.col("id") * 3).alias("v"),
    )  # 90% NULL keys, matched keys uniform
    dim = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = auto_join(fact, dim, "k", how="left")
        assert auto_join.last_strategy == "plain"
        assert out.count() == n
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_tfidf_top_terms_hand_computed(spark):
    """3-doc fixture with hand-computed smooth-idf scores:
    idf = ln((1+N)/(1+df)) + 1, N=3; apple/durian df=1 ->
    ln(2)+1 = 1.693147; banana/cherry df=2 -> ln(4/3)+1 = 1.287682."""
    from embedding_to_vectordatabase_spark.operators.textanalysis import (
        tfidf_top_terms,
    )

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry durian"),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_id"], r["rank"]): (r["token"], r["tf"], r["score"])
        for r in tfidf_top_terms(docs, k=2).collect()
    }
    assert rows[(1, 1)] == ("apple", 2, 3.386294)
    assert rows[(1, 2)] == ("banana", 1, 1.287682)
    # doc 2 ties on score (both df=2, tf=1): token ASC breaks it
    assert rows[(2, 1)][0] == "banana" and rows[(2, 2)][0] == "cherry"
    assert rows[(3, 1)] == ("cherry", 2, 2.575364)
    assert rows[(3, 2)] == ("durian", 1, 1.693147)


def test_tfidf_top_terms_null_text_and_k_cap(spark):
    from embedding_to_vectordatabase_spark.operators.textanalysis import (
        tfidf_top_terms,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, "only two tokens"), (3, "x")],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(docs, k=10).collect()
    by_doc: dict[int, int] = {}
    for r in out:
        by_doc[r["doc_id"]] = by_doc.get(r["doc_id"], 0) + 1
    # NULL text yields no terms but still counts in N (df stays honest)
    assert 1 not in by_doc
    assert by_doc[2] == 3 and by_doc[3] == 1
    # rank is dense 1..n per doc
    ranks = sorted(r["rank"] for r in out if r["doc_id"] == 2)
    assert ranks == [1, 2, 3]


def test_dsir_weights_rank_target_like_docs_higher(spark):
    """DSIR selection property: documents drawn from the target
    distribution outscore off-target documents, and the weight is a
    per-feature average-able sum (docs with no tokens emit no row)."""
    from embedding_to_vectordatabase_spark.operators.sampling import (
        dsir_weights,
    )

    en = [
        "the cat is on the mat and the dog is here with the ball",
        "the sun is up and the day is warm with the wind",
        "the code is fast and the test is green with the fix",
    ]
    de = [
        "der hund und die katze sind mit dem ball und der sonne",
        "die nacht und der tag sind mit dem wind und der zeit",
    ]
    rows = [(i, t) for i, t in enumerate(en + de + [None])]
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    target = raw.filter(F.col("doc_id") < 3)  # the en docs
    out = {
        r["doc_id"]: r["dsir_weight"]
        for r in dsir_weights(raw, target).collect()
    }
    assert 5 not in out  # NULL text -> no features -> no row
    avg_en = sum(out[i] for i in range(3)) / 3
    avg_de = sum(out[i] for i in (3, 4)) / 2
    assert avg_en > avg_de
    # per-doc normalized too (length-robust ordering on this fixture)
    n_feats = {
        r["doc_id"]: r["n_features"]
        for r in dsir_weights(raw, target).collect()
    }
    assert all(n_feats[i] > 0 for i in out)


def test_dsir_weights_xxhash64_knob_same_shape(spark):
    from embedding_to_vectordatabase_spark.operators.sampling import (
        dsir_weights,
    )
    import pytest as _pytest

    raw = spark.createDataFrame(
        [(1, "a b c"), (2, "c d e")], "doc_id long, text string"
    )
    md5 = dsir_weights(raw, raw, hash_fn="md5").collect()
    xx = dsir_weights(raw, raw, hash_fn="xxhash64").collect()
    # target == raw -> every bucket ratio is ln(tt-normalizer shift)
    # of identical counts: weights identical across hash fns too
    assert {r["doc_id"] for r in md5} == {1, 2}
    assert {r["doc_id"]: r["n_features"] for r in md5} == {
        r["doc_id"]: r["n_features"] for r in xx
    }
    with _pytest.raises(ValueError, match="hash_fn"):
        dsir_weights(raw, raw, hash_fn="sha1").collect()


def test_dsir_weights_eager_mode_same_values_no_pinned_cache(spark):
    """eager=True must (a) return identical weights to the lazy
    default and (b) leave no persisted count tables behind — the lazy
    plan pins two ≤ n_buckets-row caches the caller has to clean up;
    the eager path collects the bounded log-ratio table and
    unpersists before returning (ADVICE r11)."""
    from embedding_to_vectordatabase_spark.operators.sampling import (
        dsir_weights,
    )

    raw = spark.createDataFrame(
        [(1, "the cat sat"), (2, "der hund lief"), (3, "the dog ran")],
        "doc_id long, text string",
    )
    target = raw.filter(F.col("doc_id") != 2)
    lazy = {
        r["doc_id"]: (r["n_features"], r["dsir_weight"])
        for r in dsir_weights(raw, target).collect()
    }
    spark.catalog.clearCache()  # the documented lazy-mode cleanup
    # baseline AFTER clearCache: RDD-level persists leaked by other
    # tests in the shared session (e.g. MLlib internals) are not
    # cleared by catalog.clearCache and are not ours to assert on
    jsc = spark.sparkContext._jsc.sc()
    baseline = jsc.getPersistentRDDs().size()
    eager = {
        r["doc_id"]: (r["n_features"], r["dsir_weight"])
        for r in dsir_weights(raw, target, eager=True).collect()
    }
    assert lazy == eager
    # unpersist's block eviction is async; poll briefly before
    # declaring a leak
    import time as _time

    for _ in range(20):
        if jsc.getPersistentRDDs().size() <= baseline:
            break
        _time.sleep(0.25)
    assert jsc.getPersistentRDDs().size() <= baseline, (
        "eager dsir_weights left persisted tables behind"
    )


def test_pmi_collocations_prefers_fixed_phrases(spark):
    """PMI ranks the always-together pair above pairs of
    independently frequent words, exact counts come through, and the
    min_count floor drops rare pairs."""
    import math

    from embedding_to_vectordatabase_spark.operators.textanalysis import (
        pmi_collocations,
    )

    # "neural network" always adjacent (6x); "the" everywhere; the
    # rare pair "odd couple" appears once
    docs = (
        ["the neural network runs on the data"] * 6
        + ["the data runs on the model"] * 4
        + ["odd couple"]
    )
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    out = pmi_collocations(df, min_count=2, top_n=50)
    rows = {(r["w1"], r["w2"]): r for r in out.collect()}
    assert ("odd", "couple") not in rows  # under min_count
    nn = rows[("neural", "network")]
    assert nn["n_pair"] == 6
    # hand-computed: n_tokens = 6*7 + 4*6 + 2 = 68, n_pairs = 68 - 11
    # docs = 57, c(neural) = c(network) = c(neural,network) = 6
    exp = math.log((6 / 57) / ((6 / 68) * (6 / 68)))
    assert abs(nn["pmi"] - round(exp, 6)) < 1e-9
    # the exclusive pair outranks the promiscuous high-freq pair
    assert nn["pmi"] > rows[("the", "data")]["pmi"]
    spark.catalog.clearCache()  # pair-count table cleanup contract


def test_pmi_collocations_null_and_empty_docs(spark):
    from embedding_to_vectordatabase_spark.operators.textanalysis import (
        pmi_collocations,
    )

    df = spark.createDataFrame(
        [(0, None), (1, "  "), (2, "a b a b a b")],
        "doc_id long, text string",
    )
    rows = {
        (r["w1"], r["w2"]): r["n_pair"]
        for r in pmi_collocations(df, min_count=1, top_n=10).collect()
    }
    assert rows == {("a", "b"): 3, ("b", "a"): 2}
    spark.catalog.clearCache()


def test_word_entropy_known_values_and_edges(spark):
    """Exact entropy on hand-computable docs: uniform distribution ->
    ln(k); single repeated word -> 0; empty/null docs emit no row."""
    import math

    from embedding_to_vectordatabase_spark.operators.textanalysis import (
        word_entropy,
    )

    df = spark.createDataFrame(
        [
            (0, "a b c d"),          # uniform over 4 -> ln(4)
            (1, "spam spam spam"),   # one word -> 0.0
            (2, "a a b"),            # H = ln(3) - (2 ln 2)/3
            (3, ""),
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in word_entropy(df).collect()}
    assert set(out) == {0, 1, 2}
    assert abs(out[0]["word_entropy"] - round(math.log(4), 6)) < 1e-9
    assert out[0]["n_tokens"] == 4 and out[0]["n_unique_tokens"] == 4
    assert out[1]["word_entropy"] == 0.0
    # term rounding happens per word at 6dp; recompute the same way
    exp2 = round(math.log(3) - round(2 * math.log(2), 6) / 3, 6)
    assert abs(out[2]["word_entropy"] - exp2) < 1e-9


def test_pmi_collocations_eager_mode_same_values_no_pinned_cache(spark):
    """eager=True returns identical top-n rows to the lazy default and
    unpersists the pair-count table before returning (the dsir_weights
    eager contract; r12 VERDICT item 6) — the lazy plan pins a
    vocabulary-pair-scale cache the caller has to clean up."""
    import time as _time

    from embedding_to_vectordatabase_spark.operators.textanalysis import (
        pmi_collocations,
    )

    docs = spark.createDataFrame(
        [(i, "new york is big and new york is old") for i in range(6)]
        + [(99, "big old is and")],
        "doc_id long, text string",
    )
    lazy = [
        (r["w1"], r["w2"], r["n_pair"], r["pmi"])
        for r in pmi_collocations(docs, min_count=2, top_n=5).collect()
    ]
    spark.catalog.clearCache()  # documented lazy-mode cleanup
    jsc = spark.sparkContext._jsc.sc()
    baseline = jsc.getPersistentRDDs().size()
    eager = [
        (r["w1"], r["w2"], r["n_pair"], r["pmi"])
        for r in pmi_collocations(
            docs, min_count=2, top_n=5, eager=True
        ).collect()
    ]
    assert lazy == eager
    for _ in range(20):
        if jsc.getPersistentRDDs().size() <= baseline:
            break
        _time.sleep(0.25)
    assert jsc.getPersistentRDDs().size() <= baseline, (
        "eager pmi_collocations left the pair-count table persisted"
    )


def _golden_png(w: int, h: int) -> bytes:
    """A fully valid 1-pixel-data PNG built with stdlib only (zlib
    CRCs and deflate) — real decoder-grade bytes, not a stub."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x00\x00\x00" * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _golden_jpeg(w: int, h: int) -> bytes:
    """Minimal JPEG header stream: SOI, APP0/JFIF, a COM segment
    (exercises the marker-skip loop), then SOF0 with the frame
    dimensions."""
    import struct

    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    com = b"test comment"
    sof0 = struct.pack(">BHHB", 8, h, w, 3) + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
        + b"\xff\xfe" + struct.pack(">H", len(com) + 2) + com
        + b"\xff\xc0" + struct.pack(">H", len(sof0) + 2) + sof0
    )


def test_decode_image_header_parse_golden(spark):
    """Real header parsing (r12 VERDICT item 5): PNG IHDR, JPEG SOF0
    behind skipped segments, GIF LSD, BMP DIB (incl. top-down
    negative height), and graceful NULLs for junk/truncated bytes."""
    import struct

    from embedding_to_vectordatabase_spark.operators.multimodal import (
        decode_image,
        parse_image_header,
    )

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 6
    bmp = (
        b"BM" + b"\x00" * 16
        + struct.pack("<ii", 640, -480)  # negative = top-down
        + b"\x00" * 8
    )
    cases = [
        (1, _golden_png(17, 23), ("png", 17, 23)),
        (2, _golden_jpeg(1920, 1080), ("jpeg", 1920, 1080)),
        (3, gif, ("gif", 320, 200)),
        (4, bmp, ("bmp", 640, 480)),
        (5, b"not an image at all", (None, None, None)),
        (6, b"\x89PNG\r\n\x1a", (None, None, None)),  # truncated sig
    ]
    # pure-python parser first
    for _, payload, want in cases:
        assert parse_image_header(payload) == want

    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p, _ in cases],
        "media_id long, payload binary",
    )
    got = {
        r["media_id"]: (r["image_format"], r["width"], r["height"])
        for r in decode_image(df).collect()
    }
    assert got == {i: want for i, _, want in cases}


def _golden_wav(sr, ch, n_samples, bits=16, pad_junk_chunk=False):
    import struct

    block = ch * bits // 8
    byte_rate = sr * block
    data = b"\x00" * (n_samples * block)
    fmt = struct.pack("<HHIIHH", 1, ch, sr, byte_rate, block, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if pad_junk_chunk:
        # odd-sized LIST chunk before data: the walk must word-align
        chunks += b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _golden_mp4(timescale, duration, version=0, trailing_mdat=True):
    import struct

    if version == 0:
        payload = b"\x00\x00\x00\x00" + struct.pack(
            ">IIII", 0, 0, timescale, duration
        ) + b"\x00" * 80
    else:
        payload = b"\x01\x00\x00\x00" + struct.pack(
            ">QQIQ", 0, 0, timescale, duration
        ) + b"\x00" * 76
    mvhd = struct.pack(">I", 8 + len(payload)) + b"mvhd" + payload
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + struct.pack(">I", 0)
    out = ftyp + moov
    if trailing_mdat:
        out += struct.pack(">I", 0) + b"mdat" + b"\xab" * 9  # size=0: to-end
    return out


def _mp4_box(typ, payload):
    import struct

    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _golden_mp4_audio(
    timescale, duration, sr, ch, video_trak_first=False,
    truncate_entry=False,
):
    """ftyp + moov(mvhd + [vide trak] + audio trak) with a full
    trak→mdia→hdlr('soun')/minf→stbl→stsd→mp4a walk — the ISO
    14496-12 §12.2.3 AudioSampleEntry layout (channelcount BE u16 at
    payload +16, samplerate 16.16 at +24)."""
    import struct

    mvhd = _mp4_box(
        b"mvhd",
        b"\x00\x00\x00\x00" + struct.pack(">IIII", 0, 0, timescale, duration),
    )
    entry_payload = (
        b"\x00" * 6 + struct.pack(">H", 1)          # reserved + dri
        + b"\x00" * 8                               # reserved[2] u32
        + struct.pack(">HHHH", ch, 16, 0, 0)        # ch/size/pre/resv
        + struct.pack(">I", sr << 16)               # 16.16 samplerate
    )
    if truncate_entry:
        entry_payload = entry_payload[:20]  # cut before samplerate
    entry = _mp4_box(b"mp4a", entry_payload)
    stsd = _mp4_box(
        b"stsd", b"\x00\x00\x00\x00" + struct.pack(">I", 1) + entry
    )
    hdlr = _mp4_box(b"hdlr", b"\x00" * 8 + b"soun")
    mdia = _mp4_box(
        b"mdia", hdlr + _mp4_box(b"minf", _mp4_box(b"stbl", stsd))
    )
    traks = _mp4_box(b"trak", mdia)
    if video_trak_first:
        vhdlr = _mp4_box(b"hdlr", b"\x00" * 8 + b"vide")
        traks = _mp4_box(b"trak", _mp4_box(b"mdia", vhdlr)) + traks
    moov = _mp4_box(b"moov", mvhd + traks)
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + struct.pack(">I", 0)
    return ftyp + moov


def test_parse_av_header_mp4_audio_track(spark):
    """MP4 per-track audio metadata (r14 VERDICT item 8): the stsd
    box walk fills sample_rate/n_channels from the first AUDIO
    track's sample entry; video traks are skipped by handler type, a
    truncated entry yields NULLs, and a moov with no trak keeps the
    r14 NULL behavior."""
    from embedding_to_vectordatabase_spark.operators.multimodal import (
        decode_av,
        parse_av_header,
    )

    cases = [
        (1, _golden_mp4_audio(1000, 3500, 44100, 2),
         ("mp4", 3500, 44100, 2)),
        # a video trak first: the walk must reach the AUDIO trak
        (2, _golden_mp4_audio(90000, 45000, 16000, 1,
                              video_trak_first=True),
         ("mp4", 500, 16000, 1)),
        # entry truncated before the samplerate field -> NULLs
        (3, _golden_mp4_audio(1000, 1000, 8000, 1, truncate_entry=True),
         ("mp4", 1000, None, None)),
        # no trak at all: unchanged r14 behavior
        (4, _golden_mp4(1000, 2000), ("mp4", 2000, None, None)),
    ]
    for _, payload, want in cases:
        assert parse_av_header(payload) == want, payload[:16]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p, _ in cases],
        "media_id long, payload binary",
    )
    got = {
        r["media_id"]: (
            r["av_format"], r["duration_ms"], r["sample_rate"],
            r["n_channels"],
        )
        for r in decode_av(df).collect()
    }
    assert got == {i: want for i, _, want in cases}


def test_parse_av_header_mp4_audio_property():
    """Property: any (timescale, duration, sr ≤ u16, ch) synthesizes
    and parses back exactly — the stsd walk has no constants tuned to
    the golden case."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from embedding_to_vectordatabase_spark.operators.multimodal import (
        parse_av_header,
    )

    @settings(max_examples=60, deadline=None)
    @given(
        ts=st.integers(min_value=1, max_value=2**32 - 1),
        dur=st.integers(min_value=0, max_value=2**32 - 1),
        sr=st.integers(min_value=0, max_value=65535),
        ch=st.integers(min_value=0, max_value=65535),
        vfirst=st.booleans(),
    )
    def case(ts, dur, sr, ch, vfirst):
        got = parse_av_header(
            _golden_mp4_audio(ts, dur, sr, ch, video_trak_first=vfirst)
        )
        assert got == ("mp4", dur * 1000 // ts, sr, ch)

    case()


def test_parse_av_header_golden(spark):
    """Real AV header parsing (r13 VERDICT item 5): WAV RIFF chunk
    walk (incl. word-aligned odd chunks) and MP4 mvhd v0/v1 box walk
    (incl. the size==0 to-end escape), plus graceful NULLs for junk
    and truncated payloads. Both engines of the duration arithmetic
    are public spec: data_bytes*1000//byte_rate and
    duration*1000//timescale."""
    from embedding_to_vectordatabase_spark.operators.multimodal import (
        decode_av,
        parse_av_header,
    )

    cases = [
        # 44100 Hz stereo, 44100 samples = exactly 1000 ms
        (1, _golden_wav(44100, 2, 44100), ("wav", 1000, 44100, 2)),
        # odd junk chunk in the walk; 8000 Hz mono, 20000 samples
        (2, _golden_wav(8000, 1, 20000, pad_junk_chunk=True),
         ("wav", 2500, 8000, 1)),
        (3, _golden_mp4(1000, 3500), ("mp4", 3500, None, None)),
        # v1 mvhd with a 64-bit duration
        (4, _golden_mp4(90000, 90000 * 7 + 45000, version=1),
         ("mp4", 7500, None, None)),
        (5, b"not media at all", (None, None, None, None)),
        (6, b"RIFF\x00\x00\x00\x00WAV", (None, None, None, None)),
    ]
    for _, payload, want in cases:
        assert parse_av_header(payload) == want, payload[:12]

    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p, _ in cases],
        "media_id long, payload binary",
    )
    got = {
        r["media_id"]: (
            r["av_format"], r["duration_ms"], r["sample_rate"],
            r["n_channels"],
        )
        for r in decode_av(df).collect()
    }
    assert got == {i: want for i, _, want in cases}


def test_sample_video_frames_real_timestamps(spark):
    """Frame timestamps come from the REAL parsed duration: one row
    per every_ms interval, payload column dropped before the explode,
    unparseable rows produce no frames."""
    from embedding_to_vectordatabase_spark.operators.multimodal import (
        sample_video_frames,
    )

    df = spark.createDataFrame(
        [
            (1, bytearray(_golden_mp4(1000, 3500))),
            (2, bytearray(_golden_wav(8000, 1, 20000))),  # 2500 ms
            (3, bytearray(b"junk")),
        ],
        "media_id long, payload binary",
    )
    out = sample_video_frames(df, every_ms=1000)
    assert "payload" not in out.columns
    got = {}
    for r in out.collect():
        got.setdefault(r["media_id"], []).append(r["frame_ts_ms"])
    assert {k: sorted(v) for k, v in got.items()} == {
        1: [0, 1000, 2000, 3000],
        2: [0, 1000, 2000],
    }


def test_parse_av_header_property_roundtrip():
    """Property: for ANY (sample_rate, channels, n_samples) WAV and
    ANY (timescale, duration, version) MP4, synthesis -> parse
    round-trips to the spec arithmetic — the byte-walkers contain no
    magic constants tuned to the golden cases."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from embedding_to_vectordatabase_spark.operators.multimodal import (
        parse_av_header,
    )

    @settings(max_examples=80, deadline=None)
    @given(
        sr=st.integers(min_value=1, max_value=384_000),
        ch=st.integers(min_value=1, max_value=8),
        n=st.integers(min_value=0, max_value=50_000),
        junk=st.booleans(),
    )
    def wav_case(sr, ch, n, junk):
        got = parse_av_header(_golden_wav(sr, ch, n, pad_junk_chunk=junk))
        block = ch * 2
        assert got == ("wav", n * block * 1000 // (sr * block), sr, ch)

    @settings(max_examples=80, deadline=None)
    @given(
        ts=st.integers(min_value=1, max_value=2**32 - 1),
        dur=st.integers(min_value=0, max_value=2**32 - 1),
        ver=st.sampled_from([0, 1]),
        mdat=st.booleans(),
    )
    def mp4_case(ts, dur, ver, mdat):
        got = parse_av_header(
            _golden_mp4(ts, dur, version=ver, trailing_mdat=mdat)
        )
        assert got == ("mp4", dur * 1000 // ts, None, None)

    wav_case()
    mp4_case()


def test_decode_headers_clamp_corrupt_values_to_null(spark):
    """Corrupt-but-walkable headers declaring values outside the
    output column types must yield NULLs, not overflow the Arrow cast
    and kill the task (r14 review finding): a WAV fmt chunk with
    sample_rate >= 2^31, an MP4 v1 mvhd whose duration_ms exceeds
    int64, and a PNG with uint32 dims past int32."""
    import struct

    from embedding_to_vectordatabase_spark.operators.multimodal import (
        decode_av,
        decode_image,
        parse_av_header,
        parse_image_header,
    )

    # WAV with a 2^31 sample rate (byte_rate kept sane so the walk
    # still parses duration)
    big_sr = 1 << 31
    fmt = struct.pack("<HHIIHH", 1, 1, big_sr & 0xFFFFFFFF, 8000, 2, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 16000)
    )
    got = parse_av_header(wav)
    assert got[0] == "wav" and got[2] is None  # rate clamped to NULL
    # MP4 v1: duration 2^62 at timescale 1 -> duration_ms > int64 max
    mp4 = _golden_mp4(1, 1 << 62, version=1)
    assert parse_av_header(mp4) == ("mp4", None, None, None)
    # PNG with uint32 dims past int32
    png = (
        b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR"
        + struct.pack(">II", 0xFFFFFFFF, 23) + b"\x00" * 9
    )
    assert parse_image_header(png) == ("png", None, 23)
    # and through the Spark operators: rows survive with NULLs
    df_av = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(mp4))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in decode_av(df_av).collect()}
    assert rows[1]["sample_rate"] is None and rows[1]["av_format"] == "wav"
    assert rows[2]["duration_ms"] is None and rows[2]["av_format"] == "mp4"
    df_img = spark.createDataFrame(
        [(3, bytearray(png))], "media_id long, payload binary"
    )
    r3 = decode_image(df_img).first()
    assert r3["width"] is None and r3["height"] == 23


def test_sample_video_frames_bounds_corrupt_durations(spark):
    """A hostile header declaring a multi-year duration must produce
    NO frames (like the unparseable path) instead of exploding an
    unbounded sequence; legitimate durations under the cap still
    sample."""
    from embedding_to_vectordatabase_spark.operators.multimodal import (
        sample_video_frames,
    )

    df = spark.createDataFrame(
        [
            (1, bytearray(_golden_mp4(1000, 2500))),        # 2.5 s ok
            (2, bytearray(_golden_mp4(1, 10**15, version=1))),  # ~31k yrs
        ],
        "media_id long, payload binary",
    )
    out = sample_video_frames(df, every_ms=1000).collect()
    got = {}
    for r in out:
        got.setdefault(r["media_id"], []).append(r["frame_ts_ms"])
    assert {k: sorted(v) for k, v in got.items()} == {1: [0, 1000, 2000]}


def test_index_stats_report(spark, tmp_path):
    """index_stats over a sparse store (build + one upsert) and a
    MinHash store: every relation present gets a row, row counts
    match direct reads, the unpartitioned corpus_stats relation's
    n_files counts the append segments (build + upsert = 2), and the
    bucket-partitioned postings relation reports occupancy skew."""
    from embedding_to_vectordatabase_spark.operators.dedup import (
        build_minhash_index,
    )
    from embedding_to_vectordatabase_spark.operators.metrics import (
        index_stats,
    )
    from embedding_to_vectordatabase_spark.operators.search import (
        build_sparse_index,
        upsert_sparse_index,
    )

    post = spark.createDataFrame(
        [(f"d{i}", f"tok{i % 7}", 1.0 + i) for i in range(40)],
        "doc_id string, token string, weight double",
    )
    path = str(tmp_path / "sp_store")
    build_sparse_index(
        post.filter(F.col("doc_id") < "d3"), path,
        num_buckets=8, store_doc_stats=True,
    )
    upsert_sparse_index(
        path, post.filter(F.col("doc_id") >= "d3")
    )
    stats = {
        r["relation"]: r for r in index_stats(spark, path).collect()
    }
    assert set(stats) == {"postings", "df_stats", "corpus_stats", "meta"}
    n_direct = spark.read.parquet(f"{path}/postings.parquet").count()
    assert stats["postings"]["n_rows"] == n_direct == 40
    assert stats["postings"]["n_partitions"] >= 1
    assert stats["postings"]["skew_ratio"] >= 1.0
    assert stats["postings"]["max_partition_rows"] >= 1
    # one corpus_stats segment per build/upsert
    assert stats["corpus_stats"]["n_rows"] == 2
    assert stats["corpus_stats"]["n_files"] == 2
    assert stats["corpus_stats"]["n_partitions"] is None

    docs = spark.createDataFrame(
        [(i, f"document body number {i} with shared words") for i in range(6)],
        "doc_id long, text string",
    )
    mh = str(tmp_path / "mh_store")
    build_minhash_index(docs, mh, n=3, num_perm=16, bands=4)
    mh_stats = {
        r["relation"]: r for r in index_stats(spark, mh).collect()
    }
    assert set(mh_stats) == {"signatures", "bands", "meta"}
    assert mh_stats["signatures"]["n_rows"] == 6
    assert mh_stats["bands"]["n_rows"] == 6 * 4

    import pytest as _pytest

    with _pytest.raises(ValueError, match="no index relations"):
        index_stats(spark, str(tmp_path / "nothing_here"))


def test_compact_index_preserves_results_and_merges_segments(
    spark, tmp_path
):
    """compact_index rewrites the append-only stores one-file-per-
    partition and merges the mergeable partials — search results must
    be IDENTICAL before/after, corpus_stats collapses to one row, and
    a double-upserted MinHash store (the at-least-once case) loses
    its duplicate rows."""
    from embedding_to_vectordatabase_spark.operators.dedup import (
        build_minhash_index,
        minhash_probe_index,
        upsert_minhash_index,
    )
    from embedding_to_vectordatabase_spark.operators.metrics import (
        compact_index,
        index_stats,
    )
    from embedding_to_vectordatabase_spark.operators.search import (
        bm25_topk_index,
        build_sparse_index,
        upsert_sparse_index,
    )

    post = spark.createDataFrame(
        [(f"d{i}", f"tok{i % 5}", 1.0 + i % 3) for i in range(30)],
        "doc_id string, token string, weight double",
    )
    path = str(tmp_path / "sp_compact")
    build_sparse_index(
        post.filter(F.col("doc_id") < "d1"), path,
        num_buckets=4, store_doc_stats=True,
    )
    upsert_sparse_index(
        path, post.filter((F.col("doc_id") >= "d1") & (F.col("doc_id") < "d2"))
    )
    upsert_sparse_index(path, post.filter(F.col("doc_id") >= "d2"))
    qt = spark.createDataFrame(
        [("q1", "tok0"), ("q1", "tok3"), ("q2", "tok4")],
        "query_id string, token string",
    )
    key = lambda rows: sorted(  # noqa: E731
        (r["query_id"], r["doc_id"], round(r["score"], 9), r["rank"])
        for r in rows
    )
    before = key(bm25_topk_index(spark, path, qt, k=10).collect())
    pre = {r["relation"]: r for r in index_stats(spark, path).collect()}
    assert pre["corpus_stats"]["n_rows"] == 3  # build + 2 upserts
    post_stats = {
        r["relation"]: r for r in compact_index(spark, path).collect()
    }
    after = key(bm25_topk_index(spark, path, qt, k=10).collect())
    assert after == before and after
    assert post_stats["corpus_stats"]["n_rows"] == 1
    assert post_stats["postings"]["n_rows"] == pre["postings"]["n_rows"]
    # one file per partition directory after the rewrite
    assert (
        post_stats["postings"]["n_files"]
        == post_stats["postings"]["n_partitions"]
    )
    assert post_stats["df_stats"]["n_rows"] <= pre["df_stats"]["n_rows"]

    # MinHash: double-upsert (at-least-once) leaves duplicate rows the
    # compaction drops; probe results identical
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(2, "totally different words about columnar execution and "
             "vectorized readers in a distributed engine")],
        "doc_id long, text string",
    )
    mh = str(tmp_path / "mh_compact")
    build_minhash_index(docs, mh, n=3, num_perm=16, bands=4)
    upsert_minhash_index(mh, batch)
    upsert_minhash_index(mh, batch)  # the replayed upsert
    assert (
        spark.read.parquet(f"{mh}/signatures.parquet").count() == 3
    )
    probe = spark.createDataFrame(
        [(9, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    p_before = sorted(
        (r["doc_a"], r["doc_b"], r["est_jaccard"])
        for r in minhash_probe_index(spark, mh, probe, 0.5).collect()
    )
    mh_stats = {
        r["relation"]: r for r in compact_index(spark, mh).collect()
    }
    assert mh_stats["signatures"]["n_rows"] == 2  # dupes dropped
    p_after = sorted(
        (r["doc_a"], r["doc_b"], r["est_jaccard"])
        for r in minhash_probe_index(spark, mh, probe, 0.5).collect()
    )
    assert p_after == p_before and p_after


def test_delete_from_index_matches_rebuild(spark, tmp_path):
    """delete_from_index must be semantically a rebuild-minus-ids:
    BM25 over the deleted store equals BM25 over a store built from
    the filtered postings (df/corpus stats exactly recomputed); a
    deleted doc stops matching MinHash probes; deleted vectors stop
    appearing in SQ8 searches while survivors keep their codes."""
    import numpy as np

    from embedding_to_vectordatabase_spark.operators.dedup import (
        build_minhash_index,
        minhash_probe_index,
    )
    from embedding_to_vectordatabase_spark.operators.metrics import (
        delete_from_index,
    )
    from embedding_to_vectordatabase_spark.operators.search import (
        bm25_topk_index,
        build_sparse_index,
        build_sq8_index,
        sq8_topk_index,
    )

    post = spark.createDataFrame(
        [(f"d{i}", f"tok{i % 5}", 1.0 + i % 3) for i in range(30)],
        "doc_id string, token string, weight double",
    )
    dead = spark.createDataFrame(
        [("d3",), ("d7",), ("d11",)], "doc_id string"
    )
    live = post.join(dead, "doc_id", "left_anti")
    a = str(tmp_path / "sp_del")
    b = str(tmp_path / "sp_gold")
    build_sparse_index(post, a, num_buckets=4, store_doc_stats=True)
    build_sparse_index(live, b, num_buckets=4, store_doc_stats=True)
    stats = {
        r["relation"]: r
        for r in delete_from_index(spark, a, dead).collect()
    }
    assert stats["postings"]["n_rows"] == live.count()
    qt = spark.createDataFrame(
        [("q1", "tok0"), ("q1", "tok3"), ("q2", "tok4")],
        "query_id string, token string",
    )
    key = lambda rows: sorted(  # noqa: E731
        (r["query_id"], r["doc_id"], round(r["score"], 9), r["rank"])
        for r in rows
    )
    got = key(bm25_topk_index(spark, a, qt, k=10).collect())
    want = key(bm25_topk_index(spark, b, qt, k=10).collect())
    assert got == want and got
    assert not any(d in {"d3", "d7", "d11"} for _, d, _, _ in got)

    # MinHash: delete the doc a probe would match
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta"),
         (2, "other text about join reordering and predicate pushdown")],
        "doc_id long, text string",
    )
    mh = str(tmp_path / "mh_del")
    build_minhash_index(docs, mh, n=3, num_perm=16, bands=4)
    probe = spark.createDataFrame(
        [(9, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    assert minhash_probe_index(spark, mh, probe, 0.5).count() == 1
    delete_from_index(
        spark, mh, spark.createDataFrame([(1,)], "doc_id long")
    )
    assert minhash_probe_index(spark, mh, probe, 0.5).count() == 0

    # SQ8 codes: deleted ids vanish from searches, survivors intact
    rng = np.random.default_rng(3)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(0, 0.3, 8)]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    sq = str(tmp_path / "sq_del")
    build_sq8_index(emb, sq, params=(np.full(8, -1.0), np.full(8, 2.0)))
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    full = {r["vec_id"] for r in sq8_topk_index(spark, sq, q, k=40).collect()}
    assert full == set(range(40))
    delete_from_index(
        spark, sq,
        spark.createDataFrame([(5,), (6,)], "vec_id long"),
        id_col="vec_id",
    )
    rest = {r["vec_id"] for r in sq8_topk_index(spark, sq, q, k=40).collect()}
    assert rest == set(range(40)) - {5, 6}


def test_compact_and_delete_on_ivf_partitioned_codes(spark, tmp_path):
    """compact_index / delete_from_index over a list_id-PARTITIONED
    code store (IVFADC/IVF_SQ8 layout): the partition scheme survives
    the rewrite (one file per list directory), searches return
    identical results after compaction, and deleted ids vanish while
    partition pruning stays intact."""
    import numpy as np

    from embedding_to_vectordatabase_spark.operators.metrics import (
        compact_index,
        delete_from_index,
        index_stats,
    )
    from embedding_to_vectordatabase_spark.operators.search import (
        ann_topk_ivfsq8,
        build_ivfsq8_index,
        upsert_ivfsq8_index,
    )

    rng = np.random.default_rng(9)
    dim = 8
    emb = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(0, 0.3, dim)]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    path = str(tmp_path / "ivf_maint")
    nlist, _ = build_ivfsq8_index(
        emb.filter(F.col("vec_id") < 30), path, nlist=4, seed=7,
        params=(np.full(dim, -1.0), np.full(dim, 2.0)),
    )
    upsert_ivfsq8_index(path, emb.filter(F.col("vec_id") >= 30))
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def run():
        return sorted(
            (r["query_id"], r["vec_id"], round(r["score"], 9), r["rank"])
            for r in ann_topk_ivfsq8(
                spark, path, q, k=10, metric="L2", nprobe=nlist,
                symmetric=True,
            ).collect()
        )

    before = run()
    stats = {
        r["relation"]: r for r in compact_index(spark, path).collect()
    }
    assert stats["codes"]["n_rows"] == 60
    assert stats["codes"]["n_files"] == stats["codes"]["n_partitions"]
    assert run() == before
    # partition pruning still plans after the rewrite
    plan = ann_topk_ivfsq8(
        spark, path, q, k=3, nprobe=1
    )._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan

    dead = spark.createDataFrame(
        [(r[1],) for r in before[:2]], "vec_id long"
    )
    delete_from_index(spark, path, dead, id_col="vec_id")
    after = run()
    gone = {row["vec_id"] for row in dead.collect()}
    assert {t[1] for t in after}.isdisjoint(gone)
    assert {
        r["relation"]: r for r in index_stats(spark, path).collect()
    }["codes"]["n_rows"] == 58


def _golden_wav_pcm(samples, bits=16, declared_data_size=None,
                    fmt_code=1, ch=1, sr=8000):
    """WAV with an ACTUAL sample plane: `samples` are signed ints for
    bits=16, raw unsigned bytes for bits=8 (the RIFF 8-bit quirk)."""
    import struct

    if bits == 16:
        data = b"".join(struct.pack("<h", s) for s in samples)
    else:
        data = bytes(samples)
    block = ch * bits // 8
    fmt = struct.pack("<HHIIHH", fmt_code, ch, sr, sr * block, block, bits)
    dsz = len(data) if declared_data_size is None else declared_data_size
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", dsz) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_parse_wav_samples_golden():
    """Exact integer stats off the PCM data chunk: 16-bit two's
    complement LE including both full-scale rails, the 8-bit
    unsigned-midpoint-128 quirk, truncated/odd data chunks, and the
    non-integer-PCM refusal (r15 verdict #7)."""
    from embedding_to_vectordatabase_spark.operators.multimodal import (
        parse_wav_samples,
    )

    s = [100, -200, 32767, -32768, 0]
    got = parse_wav_samples(_golden_wav_pcm(s))
    assert got == (
        5,
        32768,
        100 * 100 + 200 * 200 + 32767 * 32767 + 32768 * 32768,
        2,
    )
    # 8-bit: unsigned with midpoint 128 -> centered [-128, 0, 127]
    got8 = parse_wav_samples(_golden_wav_pcm([0, 128, 255], bits=8))
    assert got8 == (3, 128, 128 * 128 + 0 + 127 * 127, 2)
    # declared data size overruns the payload: clamp to present bytes
    got_tr = parse_wav_samples(
        _golden_wav_pcm([1000, -1000], declared_data_size=4096)
    )
    assert got_tr == (2, 1000, 2 * 1000 * 1000, 0)
    # odd byte count at 16 bits: truncate to whole samples
    raw = _golden_wav_pcm([7, 9])
    assert parse_wav_samples(raw[:-1]) == (1, 7, 49, 0)
    # IEEE-float WAV (fmt code 3) and 24-bit refuse with NULLs
    assert parse_wav_samples(
        _golden_wav_pcm([1, 2], fmt_code=3)
    ) == (None,) * 4
    assert parse_wav_samples(
        _golden_wav_pcm([0, 0, 0, 0, 0, 0], bits=8, declared_data_size=6)
        .replace(b"\x08\x00" + b"data", b"\x18\x00" + b"data")
    ) == (None,) * 4
    # empty data chunk: all-zero stats, not NULL
    assert parse_wav_samples(_golden_wav_pcm([])) == (0, 0, 0, 0)
    # non-WAV bytes
    assert parse_wav_samples(b"\x00" * 64) == (None,) * 4


def test_parse_wav_samples_property_exact_and_hostile():
    """Property 1: for ANY 16-bit sample list, synthesis -> parse
    reproduces the pure-python stats exactly (no numpy dtype
    overflow/sign trap). Property 2: ANY byte blob — including ones
    opening with RIFF/WAVE — never raises; it returns either
    all-NULL or internally-consistent stats."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from embedding_to_vectordatabase_spark.operators.multimodal import (
        parse_wav_samples,
    )

    @settings(max_examples=100, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-32768, max_value=32767), max_size=200
        )
    )
    def exact_case(samples):
        got = parse_wav_samples(_golden_wav_pcm(samples))
        assert got == (
            len(samples),
            max((abs(s) for s in samples), default=0),
            sum(s * s for s in samples),
            sum(1 for s in samples if s >= 32767 or s <= -32768),
        )

    @settings(max_examples=150, deadline=None)
    @given(st.binary(max_size=300), st.booleans())
    def hostile_case(blob, riff_prefix):
        payload = (b"RIFF\xff\xff\xff\xffWAVE" + blob) if riff_prefix else blob
        got = parse_wav_samples(payload)
        if got[0] is None:
            assert got == (None,) * 4
        else:
            n, peak, sum_sq, n_clip = got
            assert 0 <= n_clip <= n and sum_sq >= 0 and peak >= 0
            assert sum_sq <= n * peak * peak

    exact_case()
    hostile_case()


def test_decode_wav_samples_operator(spark):
    """The Spark leg: decode_wav_samples appends exact stats via
    map-only mapInPandas; junk rows survive with NULLs."""
    from embedding_to_vectordatabase_spark.operators.multimodal import (
        decode_wav_samples,
    )

    rows = [
        (1, bytearray(_golden_wav_pcm([5, -5, 32767]))),
        (2, bytearray(b"not audio at all")),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in decode_wav_samples(df).collect()}
    assert got[1]["n_samples"] == 3
    assert got[1]["peak_abs"] == 32767
    assert got[1]["sum_sq"] == 25 + 25 + 32767 * 32767
    assert got[1]["n_clipped"] == 1
    assert got[2]["n_samples"] is None and got[3]["sum_sq"] is None
    assert len(got) == 3


def _golden_bmp(w, h, pixels_bgr, bpp=24, compression=0):
    """Uncompressed BMP bytes: `pixels_bgr` is a row-major list of
    (b, g, r) tuples, len w*h; rows padded to 4-byte stride."""
    import struct

    stride = (3 * w + 3) & ~3
    rows = b""
    for y in range(h):
        row = b"".join(
            bytes(pixels_bgr[y * w + x]) for x in range(w)
        )
        rows += row + b"\x00" * (stride - 3 * w)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, compression,
        h * stride, 0, 0, 0, 0,
    )
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
    return hdr + dib + rows


def test_parse_bmp_pixels_golden_and_hostile():
    """Exact channel sums off the raw BGR plane: padding is skipped
    (widths with 3w % 4 != 0), truncated payloads decode complete
    rows, non-24bpp/compressed refuse with NULLs, and arbitrary
    blobs never raise."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from embedding_to_vectordatabase_spark.operators.multimodal import (
        parse_bmp_pixels,
    )

    # 3x2, distinct pixels: sums are hand-checkable and the stride
    # (3*3=9 -> 12) carries 3 padding bytes per row that must NOT
    # fold into the sums
    px = [(1, 2, 3), (4, 5, 6), (7, 8, 9),
          (10, 20, 30), (40, 50, 60), (70, 80, 90)]
    got = parse_bmp_pixels(_golden_bmp(3, 2, px))
    assert got == (
        6,
        sum(p[2] for p in px),
        sum(p[1] for p in px),
        sum(p[0] for p in px),
        90,
    )
    # truncated: only the first (bottom) row present
    full = _golden_bmp(3, 2, px)
    one_row = full[: 54 + 12]
    n, r, g, b, mx = parse_bmp_pixels(one_row)
    assert n == 3 and (r, g, b) == (
        3 + 6 + 9, 2 + 5 + 8, 1 + 4 + 7
    )
    # non-24bpp and compressed refuse
    assert parse_bmp_pixels(
        _golden_bmp(2, 1, [(0, 0, 0)] * 2, bpp=8)
    ) == (None,) * 5
    assert parse_bmp_pixels(
        _golden_bmp(2, 1, [(0, 0, 0)] * 2, compression=1)
    ) == (None,) * 5
    assert parse_bmp_pixels(b"not a bitmap") == (None,) * 5

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=9),
        h=st.integers(min_value=1, max_value=6),
        seed=st.integers(min_value=0, max_value=2**31),
    )
    def exact_case(w, h, seed):
        import numpy as np

        rng = np.random.default_rng(seed)
        px2 = [tuple(int(v) for v in rng.integers(0, 256, 3))
               for _ in range(w * h)]
        got2 = parse_bmp_pixels(_golden_bmp(w, h, px2))
        assert got2 == (
            w * h,
            sum(p[2] for p in px2),
            sum(p[1] for p in px2),
            sum(p[0] for p in px2),
            max(v for p in px2 for v in p),
        )

    @settings(max_examples=100, deadline=None)
    @given(st.binary(max_size=200), st.booleans())
    def hostile_case(blob, bm_prefix):
        payload = (b"BM" + blob) if bm_prefix else blob
        got3 = parse_bmp_pixels(payload)
        if got3[0] is None:
            assert got3 == (None,) * 5
        else:
            n3, r3, g3, b3, mx3 = got3
            assert n3 >= 0 and min(r3, g3, b3) >= 0
            assert max(r3, g3, b3) <= n3 * 255 and 0 <= mx3 <= 255

    exact_case()
    hostile_case()


def _png_chunk(tag, data):
    import struct
    import zlib

    return (
        struct.pack(">I", len(data)) + tag + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _png_wrap(w, h, raw_scanlines, ctype=2, depth=8, interlace=0):
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw_scanlines))
        + _png_chunk(b"IEND", b"")
    )


def _golden_png_px(w, h, pixels, ctype=2, filters=None):
    """PNG bytes with ACTUAL pixels: applies the spec's per-row
    filters forward (the decoder reverses them). `pixels` is a
    row-major list of per-pixel tuples."""
    nch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    stride = w * nch
    filters = filters if filters is not None else [0] * h
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        line = b"".join(
            bytes(p if isinstance(p, tuple) else (p,))
            for p in pixels[y * w : (y + 1) * w]
        )
        f = filters[y]
        enc = bytearray()
        for i in range(stride):
            x = line[i]
            a = line[i - nch] if i >= nch else 0
            up = prev[i]
            c = prev[i - nch] if i >= nch else 0
            if f == 0:
                v = x
            elif f == 1:
                v = (x - a) & 0xFF
            elif f == 2:
                v = (x - up) & 0xFF
            elif f == 3:
                v = (x - ((a + up) >> 1)) & 0xFF
            else:
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                v = (x - pr) & 0xFF
            enc.append(v)
        raw += bytes([f]) + bytes(enc)
        prev = line
    return _png_wrap(w, h, bytes(raw), ctype=ctype)


def test_parse_png_pixels_hand_filtered_goldens():
    """SPEC-conformance anchors: filtered scanline byte streams
    hand-worked from RFC 2083 §6 (NOT produced by the test encoder,
    so an encoder/decoder shared misreading cannot self-certify):
    Sub+Up, Average, and Paeth on 2x2 grayscale images."""
    from embedding_to_vectordatabase_spark.operators.multimodal import (
        parse_png_pixels,
    )

    # pixels [[10,20],[30,255]]: row0 Sub -> 01 0a 0a, row1 Up -> 02 14 eb
    p1 = _png_wrap(2, 2, bytes([1, 10, 10, 2, 20, 235]), ctype=0)
    assert parse_png_pixels(p1) == (4, 315, 315, 315, 255)
    # pixels [[10,20],[30,40]]: Average rows -> 03 0a 0f / 03 19 0f
    p2 = _png_wrap(2, 2, bytes([3, 10, 15, 3, 25, 15]), ctype=0)
    assert parse_png_pixels(p2) == (4, 100, 100, 100, 40)
    # pixels [[1,2],[3,4]]: Paeth rows -> 04 01 01 / 04 02 01
    p3 = _png_wrap(2, 2, bytes([4, 1, 1, 4, 2, 1]), ctype=0)
    assert parse_png_pixels(p3) == (4, 10, 10, 10, 4)


def test_parse_png_pixels_roundtrip_and_hostile():
    """Round-trip across all five filters and color types 0/2/6;
    refusal of palette/16-bit/interlaced; truncated or corrupt IDAT
    yields NULLs; arbitrary blobs never raise."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from embedding_to_vectordatabase_spark.operators.multimodal import (
        parse_png_pixels,
    )

    # RGB with one row per filter type: exact channel sums
    import numpy as np

    rng = np.random.default_rng(9)
    w, h = 4, 5
    px = [tuple(int(v) for v in rng.integers(0, 256, 3))
          for _ in range(w * h)]
    got = parse_png_pixels(
        _golden_png_px(w, h, px, ctype=2, filters=[0, 1, 2, 3, 4])
    )
    assert got == (
        w * h,
        sum(p[0] for p in px),
        sum(p[1] for p in px),
        sum(p[2] for p in px),
        max(v for p in px for v in p),
    )
    # RGBA: alpha excluded from sums and max
    pxa = [(10, 20, 30, 255), (1, 2, 3, 200)]
    gota = parse_png_pixels(_golden_png_px(2, 1, pxa, ctype=6,
                                        filters=[4]))
    assert gota == (2, 11, 22, 33, 30)
    # refusals: palette (ctype 3), 16-bit, interlaced
    assert parse_png_pixels(
        _png_wrap(1, 1, bytes([0, 5]), ctype=3)
    ) == (None,) * 5
    assert parse_png_pixels(
        _png_wrap(1, 1, bytes([0, 5]), ctype=0, depth=16)
    ) == (None,) * 5
    # interlace now decodes (Adam7 passes); for a 1x1 image the
    # single-pixel pass layout coincides with the plain layout
    assert parse_png_pixels(
        _png_wrap(1, 1, bytes([0, 5]), ctype=0, interlace=1)
    ) == (1, 5, 5, 5, 5)
    # truncated IDAT: strip the tail
    good = _golden_png_px(3, 3, [(i, i, i) for i in range(9)], ctype=2)
    assert parse_png_pixels(good[:-20]) == (None,) * 5
    # header claims more rows than the stream holds
    short = _png_wrap(2, 9, bytes([0, 1, 1, 0, 2, 2]), ctype=0)
    assert parse_png_pixels(short) == (None,) * 5

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=6),
        h=st.integers(min_value=1, max_value=6),
        ctype=st.sampled_from([0, 2, 6]),
        seed=st.integers(min_value=0, max_value=2**31),
    )
    def roundtrip(w, h, ctype, seed):
        nch = {0: 1, 2: 3, 6: 4}[ctype]
        r = np.random.default_rng(seed)
        pts = [tuple(int(v) for v in r.integers(0, 256, nch))
               for _ in range(w * h)]
        fs = [int(x) for x in r.integers(0, 5, h)]
        n, sr, sg, sb, mx = parse_png_pixels(
            _golden_png_px(w, h, pts, ctype=ctype, filters=fs)
        )
        assert n == w * h
        if ctype == 0:
            want = sum(p[0] for p in pts)
            assert (sr, sg, sb) == (want, want, want)
            assert mx == max(p[0] for p in pts)
        else:
            assert sr == sum(p[0] for p in pts)
            assert sg == sum(p[1] for p in pts)
            assert sb == sum(p[2] for p in pts)
            assert mx == max(v for p in pts for v in p[:3])

    @settings(max_examples=80, deadline=None)
    @given(st.binary(max_size=300), st.booleans())
    def hostile(blob, sig):
        payload = (b"\x89PNG\r\n\x1a\n" + blob) if sig else blob
        got2 = parse_png_pixels(payload)
        if got2[0] is None:
            assert got2 == (None,) * 5
        else:
            n2, r2, g2, b2, m2 = got2
            assert 0 <= m2 <= 255 and max(r2, g2, b2) <= n2 * 255

    roundtrip()
    hostile()


def test_parse_png_pixels_zip_bomb_capped():
    """r17 ADVICE fix: a stream whose declared w*h implies a small raw
    budget but whose IDAT inflates far past it must return the NULL
    row WITHOUT materializing the bomb (zlib.decompress's bufsize is
    only an initial size; the decompressobj max_length path hard-caps
    output). A well-formed image of the same header still decodes."""
    import struct
    import zlib

    from embedding_to_vectordatabase_spark.operators.multimodal import (
        parse_png_pixels,
    )

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    # header claims 2x2 grayscale (want = 2*(1+2) = 6 raw bytes)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    bomb_idat = zlib.compress(b"\x00" * 50_000_000)  # ~48 KB compressed
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", bomb_idat)
        + chunk(b"IEND", b"")
    )
    assert parse_png_pixels(bomb) == (None,) * 5
    good_idat = zlib.compress(bytes([0, 10, 20, 0, 30, 40]))
    good = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", good_idat)
        + chunk(b"IEND", b"")
    )
    n, sr, sg, sb, mx = parse_png_pixels(good)
    assert (n, sr, sg, sb, mx) == (4, 100, 100, 100, 40)


def test_decode_png_pixels_operator(spark):
    from embedding_to_vectordatabase_spark.operators.multimodal import (
        decode_png_pixels,
    )

    rows = [
        (1, bytearray(_golden_png_px(2, 2, [(9, 8, 7)] * 4, ctype=2,
                                  filters=[1, 4]))),
        (2, bytearray(b"junk")),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in decode_png_pixels(df).collect()}
    assert got[1]["n_pixels"] == 4 and got[1]["sum_r"] == 36
    assert got[1]["sum_g"] == 32 and got[1]["sum_b"] == 28
    assert got[1]["max_channel"] == 9
    assert got[2]["n_pixels"] is None and got[3]["sum_r"] is None


def _gif_lzw_encode(indices, min_code_size):
    """GIF-variant LZW encoder that MIRRORS the decoder's table/width
    state (the decoder defines entries one code behind the encoder,
    so the emit width must follow the DECODER's growth schedule)."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    acc = nbits = 0
    width = min_code_size + 1
    dec_len = clear + 2

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    table = {bytes([i]): i for i in range(clear)}
    next_code = clear + 2
    buf = b""
    m = 0
    for ix in indices:
        nxt = buf + bytes([ix])
        if nxt in table:
            buf = nxt
            continue
        emit(table[buf])
        m += 1
        if m >= 2:
            dec_len += 1
            if dec_len == (1 << width) and width < 12:
                width += 1
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
        buf = bytes([ix])
    if buf:
        emit(table[buf])
        m += 1
        if m >= 2:
            dec_len += 1
            if dec_len == (1 << width) and width < 12:
                width += 1
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _golden_gif(w, h, palette, indices, min_code_size=2,
                interlace=False, use_lct=False):
    """GIF89a bytes with ACTUAL pixels: palette is a list of (r,g,b),
    indices row-major."""
    import struct

    ncol_bits = max(1, (len(palette) - 1).bit_length())
    pal = list(palette) + [(0, 0, 0)] * ((1 << ncol_bits) - len(palette))
    pal_bytes = b"".join(bytes(p) for p in pal)
    data = _gif_lzw_encode(indices, min_code_size)
    blocks = b""
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        blocks += bytes([len(chunk)]) + chunk
    ipacked = (0x40 if interlace else 0) | (
        (0x80 | (ncol_bits - 1)) if use_lct else 0
    )
    spacked = 0 if use_lct else (0x80 | (ncol_bits - 1))
    out = (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, spacked, 0, 0)
        + (b"" if use_lct else pal_bytes)
        # a graphic-control extension the walk must skip
        + b"\x21\xf9\x04\x00\x00\x00\x00\x00"
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
        + (pal_bytes if use_lct else b"")
        + bytes([min_code_size]) + blocks + b"\x00\x3b"
    )
    return out


def test_gif_lzw_hand_packed_golden():
    """Spec anchor independent of the test encoder: a hand-packed
    3-bit LSB-first stream [CLEAR=4, 1, 6, END=5] = bytes 8C 0B.
    Code 6 is not yet defined when received (next table slot), so the
    decoder must apply the KwKwK rule prev+prev[0] -> output
    [1, 1, 1] (GIF89a Appendix F)."""
    from embedding_to_vectordatabase_spark.operators.multimodal import (
        _gif_lzw_decode,
    )

    assert _gif_lzw_decode(bytes([0x8C, 0x0B]), 2, 10) == [1, 1, 1]
    # the same stream without END, truncated: returns what it has
    assert _gif_lzw_decode(bytes([0x8C]), 2, 10)[:1] == [1]
    # a code past the table is malformed
    assert _gif_lzw_decode(bytes([0xFC, 0x0B]), 2, 10) is None


def test_parse_gif_pixels_golden_and_hostile():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from embedding_to_vectordatabase_spark.operators.multimodal import (
        _gif_lzw_decode,
        parse_gif_pixels,
    )

    pal = [(250, 10, 1), (3, 200, 30), (7, 8, 255), (0, 0, 0)]
    idx = [0, 1, 2, 1, 0, 0]  # 3x2
    got = parse_gif_pixels(_golden_gif(3, 2, pal, idx))
    want = (
        6,
        sum(pal[i][0] for i in idx),
        sum(pal[i][1] for i in idx),
        sum(pal[i][2] for i in idx),
        255,
    )
    assert got == want
    # local color table overrides the global one
    assert parse_gif_pixels(
        _golden_gif(3, 2, pal, idx, use_lct=True)
    ) == want
    # interlaced decodes to the SAME stats: row reordering is
    # invisible to permutation-invariant sums (GIF89a Appendix E)
    assert parse_gif_pixels(
        _golden_gif(3, 2, pal, idx, interlace=True)
    ) == want
    full = _golden_gif(16, 16, pal, [1] * 256)
    assert parse_gif_pixels(full[: len(full) - 12]) == (None,) * 5
    assert parse_gif_pixels(b"GIF89a" + b"\x00" * 8) == (None,) * 5

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=9),
        h=st.integers(min_value=1, max_value=9),
        seed=st.integers(min_value=0, max_value=2**31),
        ncol=st.sampled_from([2, 4, 7, 16]),
    )
    def roundtrip(w, h, seed, ncol):
        import numpy as np

        r = np.random.default_rng(seed)
        pal2 = [tuple(int(v) for v in r.integers(0, 256, 3))
                for _ in range(ncol)]
        ix = [int(v) for v in r.integers(0, ncol, w * h)]
        mcs = max(2, (ncol - 1).bit_length())
        # LZW layer round-trips exactly (exercises growth + KwKwK)
        assert _gif_lzw_decode(
            _gif_lzw_encode(ix, mcs), mcs, w * h
        ) == ix
        n, sr, sg, sb, mx = parse_gif_pixels(
            _golden_gif(w, h, pal2, ix, min_code_size=mcs)
        )
        assert n == w * h
        assert sr == sum(pal2[i][0] for i in ix)
        assert sg == sum(pal2[i][1] for i in ix)
        assert sb == sum(pal2[i][2] for i in ix)
        assert mx == max(v for i in set(ix) for v in pal2[i])

    @settings(max_examples=80, deadline=None)
    @given(st.binary(max_size=300), st.booleans())
    def hostile(blob, sig):
        payload = (b"GIF89a" + blob) if sig else blob
        got2 = parse_gif_pixels(payload)
        if got2[0] is None:
            assert got2 == (None,) * 5
        else:
            n2, r2, g2, b2, m2 = got2
            assert 0 <= m2 <= 255 and max(r2, g2, b2) <= n2 * 255

    roundtrip()
    hostile()


def test_decode_gif_pixels_operator(spark):
    from embedding_to_vectordatabase_spark.operators.multimodal import (
        decode_gif_pixels,
    )

    pal = [(1, 2, 3), (4, 5, 6)]
    rows = [
        (1, bytearray(_golden_gif(2, 2, pal, [0, 1, 1, 0]))),
        (2, bytearray(b"GIF89a???")),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in decode_gif_pixels(df).collect()}
    assert got[1]["n_pixels"] == 4
    assert (got[1]["sum_r"], got[1]["sum_g"], got[1]["sum_b"]) == (
        10, 14, 18,
    )
    assert got[1]["max_channel"] == 6
    assert got[2]["n_pixels"] is None and got[3]["sum_r"] is None


def _golden_png_adam7(w, h, pixels, ctype=2):
    """Interlaced PNG bytes: pixels split into the seven Adam7
    passes (ISO 15948 §8.2 grid), each pass its own filtered
    scanline group with the filter type cycling 0..4 per row."""
    grid = (
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    )
    nch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    raw = bytearray()
    fcount = 0
    for x0, y0, dx, dy in grid:
        xs = list(range(x0, w, dx))
        ys = list(range(y0, h, dy))
        if not xs or not ys:
            continue
        stride = len(xs) * nch
        prev = bytes(stride)
        for y in ys:
            line = b"".join(
                bytes(
                    pixels[y * w + x]
                    if isinstance(pixels[y * w + x], tuple)
                    else (pixels[y * w + x],)
                )
                for x in xs
            )
            f = fcount % 5
            fcount += 1
            enc = bytearray()
            for i in range(stride):
                xv = line[i]
                a = line[i - nch] if i >= nch else 0
                up = prev[i]
                c = prev[i - nch] if i >= nch else 0
                if f == 0:
                    v = xv
                elif f == 1:
                    v = (xv - a) & 0xFF
                elif f == 2:
                    v = (xv - up) & 0xFF
                elif f == 3:
                    v = (xv - ((a + up) >> 1)) & 0xFF
                else:
                    p = a + up - c
                    pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                    pr = (
                        a if (pa <= pb and pa <= pc)
                        else (up if pb <= pc else c)
                    )
                    v = (xv - pr) & 0xFF
                enc.append(v)
            raw += bytes([f]) + bytes(enc)
            prev = line
    return _png_wrap(w, h, bytes(raw), ctype=ctype, interlace=1)


def test_parse_png_pixels_adam7_interlaced():
    """Adam7-interlaced PNGs decode to IDENTICAL stats as their
    plain encodings: the seven passes partition the pixels, each
    unfiltered against its own scanline group — wrong pass-dimension
    arithmetic would misalign every subsequent byte and diverge
    immediately."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from embedding_to_vectordatabase_spark.operators.multimodal import (
        parse_png_pixels,
    )

    import numpy as np

    @settings(max_examples=50, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=19),
        h=st.integers(min_value=1, max_value=19),
        ctype=st.sampled_from([0, 2, 6]),
        seed=st.integers(min_value=0, max_value=2**31),
    )
    def case(w, h, ctype, seed):
        nch = {0: 1, 2: 3, 6: 4}[ctype]
        r = np.random.default_rng(seed)
        pts = [tuple(int(v) for v in r.integers(0, 256, nch))
               for _ in range(w * h)]
        plain = parse_png_pixels(_golden_png_px(w, h, pts, ctype=ctype))
        inter = parse_png_pixels(_golden_png_adam7(w, h, pts, ctype=ctype))
        assert inter == plain and plain[0] == w * h

    case()
    # a deliberately short interlaced stream still refuses
    full = _golden_png_adam7(9, 9, [(1, 2, 3)] * 81, ctype=2)
    assert parse_png_pixels(full[:-25]) == (None,) * 5


def test_clean_profile_kernel_matches_native(spark, sf_dir):
    """r18: the fused lang/stopword Arrow kernel (scoring over word
    xxhash64 arrays with driver-precomputed marker hashes) must
    produce row-identical clean_corpus and profile_documents outputs
    to the native interpreted folds, including NULL/empty/CJK/
    stopword-saturated documents."""
    from embedding_to_vectordatabase_spark.operators.textanalysis import (
        profile_documents,
    )
    from embedding_to_vectordatabase_spark.plans.clean import clean_corpus

    base = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(300)
    extra = spark.createDataFrame(
        [
            (9_000_001, None),
            (9_000_002, ""),
            (9_000_003, "the and of is with " * 400),
            (9_000_004, "der die das und mit le les des avec pour"),
            (9_000_005, "这是中文文本 的 测试"),
            (9_000_006, "zzz qqq vvv www"),
        ],
        "doc_id long, text string",
    )
    df = base.select("doc_id", "text").unionByName(extra)

    def rows(out):
        return sorted(tuple(r) for r in out.collect())

    assert rows(profile_documents(df, kernel=True)) == rows(
        profile_documents(df, kernel=False)
    )
    assert rows(clean_corpus(df, kernel=True)) == rows(
        clean_corpus(df, kernel=False)
    )
    assert rows(
        clean_corpus(df, allowed_langs=["en", "zh"], kernel=True)
    ) == rows(clean_corpus(df, allowed_langs=["en", "zh"], kernel=False))


def test_xxh64_bytes_matches_live_expression(spark):
    """Driver-side xxh64_bytes must be bit-exact vs Spark's xxhash64
    on strings across word lengths (tail-byte, 4-byte, 8-byte and
    >=32-byte stripe paths) and multibyte UTF-8."""
    from embedding_to_vectordatabase_spark.functions.hashkernel import (
        xxh64_bytes,
    )
    from embedding_to_vectordatabase_spark.operators.textanalysis import (
        LANG_MARKERS,
        STOPWORDS,
    )

    words = sorted(
        {w for ms in LANG_MARKERS.values() for w in ms}
        | set(STOPWORDS)
        | {"", "x", "abcd", "abcdefgh", "y" * 33, "zebra" * 20,
           "日本語テキスト"}
    )
    df = spark.createDataFrame([(w,) for w in words], "w string")
    live = {r["w"]: r["h"] for r in
            df.select("w", F.xxhash64("w").alias("h")).collect()}
    for w in words:
        assert live[w] == xxh64_bytes(w.encode("utf-8")), w

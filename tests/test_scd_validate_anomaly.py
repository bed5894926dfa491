"""SCD2 dimension history, expectation reports, anomaly detection,
edit-distance blocking, JSON field extraction."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from embedding_to_vectordatabase_spark.operators.scd import scd2_apply
from embedding_to_vectordatabase_spark.operators.validate import (
    duplicate_keys,
    expectation_report,
)
from embedding_to_vectordatabase_spark.operators.anomaly import (
    daily_count_anomalies,
    group_zscore,
)
from embedding_to_vectordatabase_spark.operators.dedup import (
    edit_distance_pairs,
)
from embedding_to_vectordatabase_spark.functions.text import (
    json_field,
    json_int_field,
)

D = datetime.date


# ---------- SCD2 ----------


def _hist(spark):
    return spark.createDataFrame(
        [
            # key 1: one expired + one current row
            (1, "kb_a", D(2024, 1, 1), D(2024, 3, 1)),
            (1, "kb_b", D(2024, 3, 1), None),
            # key 2: current only
            (2, "kb_a", D(2024, 1, 1), None),
            # key 3: current only, will be untouched
            (3, "kb_c", D(2024, 1, 1), None),
        ],
        "id long, kb string, valid_from date, valid_to date",
    )


def test_scd2_close_insert_noop_and_new_key(spark):
    updates = spark.createDataFrame(
        [
            (1, "kb_z", D(2024, 6, 1)),  # changed -> close + insert
            (2, "kb_a", D(2024, 6, 1)),  # identical -> no-op
            (9, "kb_new", D(2024, 6, 1)),  # new key -> insert
        ],
        "id long, kb string, effective_ts date",
    )
    out = scd2_apply(_hist(spark), updates, "id", ["kb"])
    rows = {
        (r.id, r.kb, r.valid_from, r.valid_to) for r in out.collect()
    }
    assert rows == {
        (1, "kb_a", D(2024, 1, 1), D(2024, 3, 1)),  # expired untouched
        (1, "kb_b", D(2024, 3, 1), D(2024, 6, 1)),  # closed
        (1, "kb_z", D(2024, 6, 1), None),  # new current
        (2, "kb_a", D(2024, 1, 1), None),  # no-op stays current
        (3, "kb_c", D(2024, 1, 1), None),  # untouched
        (9, "kb_new", D(2024, 6, 1), None),  # brand-new key
    }


def test_scd2_latest_update_per_key_wins(spark):
    updates = spark.createDataFrame(
        [
            (3, "kb_mid", D(2024, 5, 1)),
            (3, "kb_late", D(2024, 7, 1)),
        ],
        "id long, kb string, effective_ts date",
    )
    out = scd2_apply(_hist(spark), updates, "id", ["kb"])
    cur3 = [
        r
        for r in out.collect()
        if r.id == 3 and r.valid_to is None
    ]
    assert len(cur3) == 1 and cur3[0].kb == "kb_late"
    closed3 = [
        r for r in out.collect() if r.id == 3 and r.valid_to is not None
    ]
    assert closed3[0].valid_to == D(2024, 7, 1)


def test_scd2_null_safe_change_detection(spark):
    hist = spark.createDataFrame(
        [(1, None, D(2024, 1, 1), None)],
        "id long, kb string, valid_from date, valid_to date",
    )
    same = spark.createDataFrame(
        [(1, None, D(2024, 6, 1))],
        "id long, kb string, effective_ts date",
    )
    out = scd2_apply(hist, same, "id", ["kb"]).collect()
    # NULL == NULL must be treated as unchanged: single current row
    assert len(out) == 1 and out[0].valid_to is None


def test_scd2_requires_tracked(spark):
    with pytest.raises(ValueError):
        scd2_apply(_hist(spark), _hist(spark), "id", [])


# ---------- expectation report ----------


def test_expectation_report_counts_and_null_is_violation(spark):
    df = spark.createDataFrame(
        [(1, "en", 10), (2, None, -5), (3, "xx", 7), (4, "en", None)],
        "id long, lang string, n long",
    )
    rep = expectation_report(
        df,
        [
            ("lang_known", F.col("lang").isin("en", "de")),
            ("n_positive", F.col("n") > 0),
        ],
    )
    rows = {r.rule: r for r in rep.collect()}
    assert rows["lang_known"].total == 4
    # NULL lang and 'xx' are violations
    assert rows["lang_known"].violations == 2
    # -5 violates, NULL n violates (NULL predicate = violation)
    assert rows["n_positive"].violations == 2
    assert rows["n_positive"].violation_frac == pytest.approx(0.5)


def test_expectation_report_empty_rules_raises(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        expectation_report(df, [])


def test_duplicate_keys(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d"), (3, "e"), (3, "f")],
        "id long, v string",
    )
    out = {(r.id, r.n) for r in duplicate_keys(df, ["id"]).collect()}
    assert out == {(1, 2), (3, 3)}


# ---------- anomaly ----------


def test_group_zscore_matches_manual(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 5.0)],
        "g string, v double",
    )
    out = {
        (r.g, r.v): r for r in group_zscore(df, ["g"], "v").collect()
    }
    # group a: mean 2, sample std 1 -> z of 3.0 is 1.0
    assert out[("a", 3.0)].z == pytest.approx(1.0)
    # singleton group: std NULL -> z NULL
    assert out[("b", 5.0)].z is None


def test_daily_count_anomalies_flags_spike(spark):
    rows = []
    ts0 = datetime.datetime(2024, 1, 1)
    # 10 steady days of 5 views, one day with 50
    for d in range(10):
        n = 50 if d == 9 else 5
        for i in range(n):
            rows.append(
                (ts0 + datetime.timedelta(days=d, seconds=i), "view")
            )
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string")
    out = daily_count_anomalies(ev, z_thresh=2.0).collect()
    assert len(out) == 1
    assert out[0].day == D(2024, 1, 10) and out[0].n == 50


def test_daily_count_anomalies_zero_variance_silent(spark):
    ts0 = datetime.datetime(2024, 1, 1)
    rows = [
        (ts0 + datetime.timedelta(days=d, seconds=i), "view")
        for d in range(5)
        for i in range(3)
    ]
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string")
    assert daily_count_anomalies(ev, z_thresh=2.0).count() == 0


# ---------- edit-distance pairs ----------


def test_edit_distance_pairs_finds_typos_not_distant(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "the quick brown fox jumped"),  # dist 2 from 1
            (3, "a completely different doc"),
            (4, "the quick brown fox jumps"),  # exact dup of 1
        ],
        "doc_id long, text string",
    )
    out = {
        (r.doc_a, r.doc_b): r.dist
        for r in edit_distance_pairs(docs, max_distance=3).collect()
    }
    assert out[(1, 4)] == 0
    assert out[(1, 2)] == 2 and out[(2, 4)] == 2
    assert all(3 not in pair for pair in out)


def test_edit_distance_pairs_adjacent_length_buckets(spark):
    # lengths straddling a band boundary must still pair up
    a = "x" * 15
    b = "x" * 16  # dist 1, different floor(len/4) bucket
    docs = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string"
    )
    out = edit_distance_pairs(
        docs, max_distance=2, band=4, prefix_len=32
    ).collect()
    assert len(out) == 1 and out[0].dist == 1


def test_edit_distance_pairs_no_duplicate_rows(spark):
    docs = spark.createDataFrame(
        [(1, "same text here"), (2, "same text here")],
        "doc_id long, text string",
    )
    out = edit_distance_pairs(docs, max_distance=1).collect()
    assert len(out) == 1


# ---------- JSON field extraction ----------


def test_json_field_extraction(spark):
    df = spark.createDataFrame(
        [('{"k": 69}',), ('{"k": "s"}',), ("not json",), (None,)],
        "props string",
    )
    out = df.select(
        json_field(F.col("props"), "k").alias("s"),
        json_int_field(F.col("props"), "k").alias("i"),
    ).collect()
    assert [r.s for r in out] == ["69", "s", None, None]
    assert [r.i for r in out] == [69, None, None, None]

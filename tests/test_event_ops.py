"""Regression tests for the round-7 ADVICE findings on the event
operators: midnight-straddling intervals in day-partitioned
peak_concurrency, and quantile column-label collisions in
conversion_time_stats."""

from __future__ import annotations

import datetime as dt

import pytest

from embedding_to_vectordatabase_spark.streaming.ingest_stream import (
    conversion_time_stats,
    peak_concurrency,
)

UTC = dt.timezone.utc


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, value double"
    )


def test_peak_concurrency_midnight_straddler_not_orphaned(spark):
    """An interval crossing midnight must contribute BOTH its +1 and
    -1 to its start day's partition: before the fix its orphan -1
    landed in the next day, dragging every later boundary's running
    count down by one (counts could go negative and next-day peaks
    were understated)."""
    rows = [
        # straddler: starts 23:00 day1, runs 2h into day2
        (1, dt.datetime(2024, 1, 1, 23, 0, tzinfo=UTC), 7200.0),
        # two overlapping day-2 intervals -> true day-2 peak is 2
        (2, dt.datetime(2024, 1, 2, 10, 0, tzinfo=UTC), 3600.0),
        (3, dt.datetime(2024, 1, 2, 10, 30, tzinfo=UTC), 3600.0),
    ]
    out = {
        r["day"].isoformat(): r["peak_concurrency"]
        for r in peak_concurrency(_events(spark, rows)).collect()
    }
    # straddler attributed entirely to its start day
    assert out == {"2024-01-01": 1, "2024-01-02": 2}


def test_peak_concurrency_running_count_never_negative(spark):
    """With matched pairs per partition the sweep can never dip
    below zero — a day consisting ONLY of a prior day's interval end
    must not appear at all (and must not report a negative peak)."""
    rows = [
        (1, dt.datetime(2024, 3, 1, 23, 59, tzinfo=UTC), 600.0),
    ]
    out = peak_concurrency(_events(spark, rows)).collect()
    assert [(r["day"].isoformat(), r["peak_concurrency"]) for r in out] == [
        ("2024-03-01", 1)
    ]


def test_peak_concurrency_global_mode_matches_day_mode_when_no_straddle(
    spark,
):
    rows = [
        (1, dt.datetime(2024, 5, 1, 9, 0, tzinfo=UTC), 3600.0),
        (2, dt.datetime(2024, 5, 1, 9, 30, tzinfo=UTC), 3600.0),
        (3, dt.datetime(2024, 5, 1, 12, 0, tzinfo=UTC), 60.0),
    ]
    per_day = peak_concurrency(
        _events(spark, rows), day_partitioned=True
    ).collect()
    global_sweep = peak_concurrency(
        _events(spark, rows), day_partitioned=False
    ).collect()
    assert per_day[0]["peak_concurrency"] == 2
    assert (
        per_day[0]["peak_concurrency"]
        == global_sweep[0]["peak_concurrency"]
    )
    assert per_day[0]["peak_at_us"] == global_sweep[0]["peak_at_us"]


def _conv_events(spark):
    rows = [
        (1, "u1", "view", dt.datetime(2024, 1, 1, 0, 0, tzinfo=UTC)),
        (2, "u1", "buy", dt.datetime(2024, 1, 1, 0, 10, tzinfo=UTC)),
        (3, "u2", "view", dt.datetime(2024, 1, 1, 0, 0, tzinfo=UTC)),
        (4, "u2", "buy", dt.datetime(2024, 1, 1, 0, 20, tzinfo=UTC)),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id string, event_type string, ts timestamp"
    )


def test_conversion_quantile_labels_distinct_for_close_quantiles(spark):
    """0.501 and 0.504 both used to round to p50 and silently
    collide; sub-percent quantiles now keep their full value in the
    label."""
    out = conversion_time_stats(
        _conv_events(spark),
        "view",
        "buy",
        quantiles=(0.5, 0.501, 0.504, 0.999),
    )
    cols = out.columns
    assert len(cols) == len(set(cols))
    assert "p50_seconds" in cols
    assert "p50_1_seconds" in cols
    assert "p50_4_seconds" in cols
    assert "p99_9_seconds" in cols
    row = out.collect()[0]
    assert row["n_converters"] == 2


def test_conversion_quantile_duplicate_raises(spark):
    with pytest.raises(ValueError, match="duplicate"):
        conversion_time_stats(
            _conv_events(spark), "view", "buy", quantiles=(0.5, 0.5)
        )


def test_conversion_quantile_labels_distinct_to_12_sig_figs(spark):
    """Quantiles agreeing to 6 significant figures used to collide
    via %g; labels now carry 12 sig figs (r7 review finding)."""
    out = conversion_time_stats(
        _conv_events(spark),
        "view",
        "buy",
        quantiles=(0.50123451, 0.50123457),
    )
    cols = out.columns
    assert len(cols) == len(set(cols))
    assert "p50_123451_seconds" in cols
    assert "p50_123457_seconds" in cols

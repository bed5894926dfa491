"""Throughput / load metrics (reference A3).

The reference's only measurement machinery is the threaded load
harness reporting requests-per-second and mean latency over a run
(baai_m3_simple_server/thread_test.py:59-71 — rps at :64, avg at
:63). Here it's one aggregate over a run-log DataFrame: any stage
that wants metrics emits (ts, latency_ms[, rows]) rows and this
computes the same numbers relationally — also usable over the
driver's ``events`` table shape for oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def load_metrics(
    df: DataFrame,
    ts_col: str = "ts",
    latency_col: str = "latency_ms",
    rows_col: str | None = None,
) -> DataFrame:
    """One-row summary: n_requests, duration_s (first→last ts),
    requests_per_s, avg_latency_ms (thread_test.py:59-71 parity), and
    rows_per_s when a per-request row count is supplied."""
    dur = (
        F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col))
    ) / 1_000_000.0
    aggs = [
        F.count("*").alias("n_requests"),
        F.round(dur, 6).alias("duration_s"),
        F.round(F.count("*") / F.greatest(dur, F.lit(1e-9)), 6).alias(
            "requests_per_s"
        ),
        F.round(F.avg(latency_col), 6).alias("avg_latency_ms"),
    ]
    if rows_col is not None:
        aggs.append(
            F.round(
                F.sum(rows_col) / F.greatest(dur, F.lit(1e-9)), 6
            ).alias("rows_per_s")
        )
    return df.agg(*aggs)

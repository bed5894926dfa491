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

from ..util import ts_micros


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
        ts_micros(F.max(ts_col)) - ts_micros(F.min(ts_col))
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


NUMERIC_TYPES = {
    "tinyint", "smallint", "int", "bigint", "float", "double",
}


QUANTILES = (0.25, 0.5, 0.75, 0.95)


def table_stats(
    df: DataFrame,
    columns: list[str] | None = None,
    exact: bool = False,
) -> DataFrame:
    """Per-column data-quality profile in ONE aggregation pass over the
    table: row count, null count, distinct count, numeric
    min/max/mean and p25/p50/p75/p95 quantiles.

    ``exact=False`` (the 100 TB default) uses HyperLogLog++
    ``approx_count_distinct`` and ``percentile_approx`` — single-pass,
    fixed memory per column; ``exact=True`` uses exact
    COUNT(DISTINCT) and sorting ``percentile`` (one expand per column
    — fine at test scale, and what the DuckDB oracle mirrors;
    ``percentile`` interpolates like SQL percentile_cont / DuckDB
    quantile_cont). The result is O(columns): the single aggregated
    row is reshaped on the driver into one row per column — the only
    driver-side collect, of one row.

    Output: (column, dtype, n_rows, n_nulls, n_distinct, min double,
    max double, mean double, p25..p95 double) — numeric stats NULL
    for non-numeric columns; decimals profile via their double cast;
    mean and quantiles rounded to 6 dp (engine-portable).
    """
    spark = df.sparkSession
    dtypes = dict(df.dtypes)
    cols = columns or list(df.columns)
    aggs = [F.count(F.lit(1)).alias("__n")]
    # generated aliases are INDEX-based, so a user column literally
    # named like a name-derived alias (e.g. "x__nn" next to "x") can
    # never collide with them
    for i, c in enumerate(cols):
        aggs.append(F.count(F.col(c)).alias(f"__{i}_nn"))
        aggs.append(
            (
                F.count_distinct(F.col(c))
                if exact
                else F.approx_count_distinct(F.col(c))
            ).alias(f"__{i}_nd")
        )
        base = dtypes[c].split("(")[0]
        if base in NUMERIC_TYPES or base == "decimal":
            d = F.col(c).cast("double")
            aggs.append(F.min(d).alias(f"__{i}_min"))
            aggs.append(F.max(d).alias(f"__{i}_max"))
            aggs.append(F.avg(d).alias(f"__{i}_mean"))
            pct = (
                F.percentile(d, list(QUANTILES))
                if exact
                else F.percentile_approx(d, list(QUANTILES))
            )
            aggs.append(pct.alias(f"__{i}_q"))
    row = df.agg(*aggs).first().asDict()
    out = []
    for i, c in enumerate(cols):
        q = row.get(f"__{i}_q") or [None] * len(QUANTILES)
        out.append(
            (
                c,
                dtypes[c],
                row["__n"],
                row["__n"] - row[f"__{i}_nn"],
                row[f"__{i}_nd"],
                row.get(f"__{i}_min"),
                row.get(f"__{i}_max"),
                (
                    round(row[f"__{i}_mean"], 6)
                    if row.get(f"__{i}_mean") is not None
                    else None
                ),
                *[round(x, 6) if x is not None else None for x in q],
            )
        )
    return spark.createDataFrame(
        out,
        "column string, dtype string, n_rows long, n_nulls long, "
        "n_distinct long, min double, max double, mean double, "
        "p25 double, p50 double, p75 double, p95 double",
    )


def skew_profile(
    df: DataFrame,
    key_cols: list[str] | str,
    top_n: int = 20,
) -> DataFrame:
    """Heavy-hitter report for a prospective join/groupBy key: the
    top-N key values by row count, each with its share of the table
    and its load relative to the mean key (``skew``). skew >> 1 on a
    planned shuffle key is the signal to reach for ``util.salted_join``
    or AQE skew handling BEFORE the job runs, instead of diagnosing a
    straggler task after six hours at 100 TB.

    Scale shape: TWO column-pruned scans (both read only the key
    columns) — the per-key counts, and the same subtree re-executed
    for the one-row totals it cross-joins against. That re-execution
    is deliberate: deriving totals from the counts relation lazily
    re-runs it anyway (a DAG reuse duplicates the subtree), and the
    one-pass alternative — a single-partition window over the counts
    relation — melts on exactly the high-cardinality keys (user ids)
    this profiler exists to check. Both scans are map-side-combined;
    top-N is TakeOrderedAndProject, not a global sort; deterministic
    tie-break on the key values.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    counts = df.groupBy(*keys).agg(F.count("*").alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("__total"),
        F.avg("cnt").alias("__mean"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            *keys,
            F.col("cnt"),
            F.round(F.col("cnt") / F.col("__total"), 6).alias("share"),
            F.round(F.col("cnt") / F.col("__mean"), 3).alias("skew"),
        )
        .orderBy(F.col("cnt").desc(), *[F.col(k).asc_nulls_last() for k in keys])
        .limit(top_n)
    )

"""Statistical anomaly detection over event streams.

Beyond-reference training-data extension: a 100 TB ingest pipeline
watches its own telemetry (the reference logs per-batch counts and
timings ad hoc, `embed_to_milvus.py:129-133`); an anomalous day of
`error` events or a collapsed `view` count is how corpus poisoning
or a dead upstream shows up. Implemented as plain two-stage
aggregation — no UDFs, no window sort over the raw events.

Scale shape: stage 1 shuffles once on (group, bucket) with map-side
partial counts (events-volume in, days×groups rows out); stage 2
computes per-group mean/std over the TINY per-bucket table and
broadcast-joins it back. Nothing corpus-sized is ever sorted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_zscore(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Attach per-group mean/stddev and the z-score of ``value_col``.

    stddev is the sample stddev (stddev_samp — both Spark's and
    DuckDB's default). Groups with one row or zero variance get a
    NULL z (division by NULL/zero), which downstream thresholds
    treat as not-anomalous.

    Output: input columns + (grp_mean, grp_std, z) doubles.
    """
    stats = df.groupBy(*group_cols).agg(
        F.avg(value_col).alias("grp_mean"),
        F.stddev_samp(value_col).alias("grp_std"),
    )
    joined = df.join(F.broadcast(stats), on=group_cols, how="left")
    z = (F.col(value_col) - F.col("grp_mean")) / F.nullif(
        F.col("grp_std"), F.lit(0.0)
    )
    return joined.withColumn("z", z)


def daily_count_anomalies(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    z_thresh: float = 2.0,
) -> DataFrame:
    """Days whose per-type event count is >= z_thresh sample-stddevs
    from that type's across-days mean.

    Output: (event_type, day date, n bigint, grp_mean double,
    grp_std double, z double), anomalous rows only.
    """
    daily = events.groupBy(
        F.col(type_col).alias("event_type"),
        F.to_date(F.col(ts_col)).alias("day"),
    ).agg(F.count(F.lit(1)).alias("n"))
    scored = group_zscore(daily, ["event_type"], "n")
    return scored.filter(F.abs(F.col("z")) >= z_thresh).select(
        "event_type", "day", "n", "grp_mean", "grp_std", "z"
    )


def winsorize(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo: float = 0.01,
    hi: float = 0.99,
) -> DataFrame:
    """Clamp ``value_col`` to its per-group exact [lo, hi] quantiles
    — outlier conditioning before quality-weighted sampling (one
    10GB document must not soak up a source's whole token budget).

    Exact interpolated percentiles (Spark `percentile` ==
    DuckDB/ANSI `quantile_cont`), computed per group in one agg and
    broadcast-joined back: the fact table shuffles once for the
    stats and never sorts. Output: input columns + (q_lo, q_hi,
    value_w) — value_w is the clamped value.
    """
    if not 0.0 <= lo < hi <= 1.0:
        raise ValueError("need 0 <= lo < hi <= 1")
    stats = df.groupBy(*group_cols).agg(
        F.expr(f"percentile({value_col}, {lo!r})").alias("q_lo"),
        F.expr(f"percentile({value_col}, {hi!r})").alias("q_hi"),
    )
    return df.join(F.broadcast(stats), on=group_cols, how="left").withColumn(
        "value_w",
        F.least(F.greatest(F.col(value_col), F.col("q_lo")), F.col("q_hi")),
    )


def category_drift_psi(
    a: DataFrame,
    b: DataFrame,
    category_col: str,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index of a categorical column between two
    corpus snapshots/splits — the standard drift monitor ("did the
    language/source mix of this week's crawl shift?"). PSI =
    Σ (p_a − p_b)·ln(p_a/p_b) over categories; <0.1 stable, >0.25
    action. ``eps`` floors each share so a category present in only
    one side contributes a large-but-finite term instead of ±inf.

    Scale shape: two count aggregations (one shuffle each over the
    category key — category cardinality is tiny by definition) and a
    full outer join of the two TINY share tables; nothing row-sized
    survives past the first agg. Output: one row per category
    (category, share_a, share_b, psi_term doubles) plus the
    aggregate is a trivial sum over it.
    """
    def shares(df: DataFrame, out: str) -> DataFrame:
        counts = df.groupBy(
            F.col(category_col).alias("category")
        ).agg(F.count(F.lit(1)).alias("__n"))
        total = counts.agg(F.sum("__n").alias("__t"))
        return counts.crossJoin(F.broadcast(total)).select(
            "category", (F.col("__n") / F.col("__t")).alias(out)
        )

    sa = shares(a, "share_a")
    sb = shares(b, "share_b")
    joined = sa.join(sb, "category", "full_outer").select(
        "category",
        F.coalesce("share_a", F.lit(0.0)).alias("share_a"),
        F.coalesce("share_b", F.lit(0.0)).alias("share_b"),
    )
    pa = F.greatest(F.col("share_a"), F.lit(eps))
    pb = F.greatest(F.col("share_b"), F.lit(eps))
    return joined.withColumn(
        "psi_term", (pa - pb) * F.log(pa / pb)
    )


def value_histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 20,
) -> DataFrame:
    """Fixed-range histogram of a numeric column in ONE pass: bin =
    floor((x − lo) / w) clamped to [0, n_bins−1], NULLs dropped —
    the corpus-profiling primitive (length/quality/score
    distributions) with explicit bounds so no second min/max scan is
    needed. Map-side partial counts; the only shuffle carries at
    most n_bins rows per partition.

    Output: (bin int, bin_lo double, bin_hi double, n bigint),
    bins with zero rows absent.
    """
    if not hi > lo:
        raise ValueError("need hi > lo")
    if n_bins < 1:
        raise ValueError("need n_bins >= 1")
    w = (hi - lo) / n_bins
    raw = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(w))
    bin_ = F.least(
        F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)
    ).cast("int")
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            (F.lit(lo) + F.col("bin") * F.lit(w)).alias("bin_lo"),
            (F.lit(lo) + (F.col("bin") + 1) * F.lit(w)).alias("bin_hi"),
            "n",
        )
    )

"""Data-quality expectation checks over a corpus table.

Beyond-reference training-data extension. Before a 100 TB corpus is
chunked/embedded (the expensive stages), a pipeline asserts its
inputs: null fractions, domain membership, range checks, key
uniqueness. The reference validates row-shape ad hoc inside the
ingest loop (`util/clean_data.py:28-40` poisons a batch on a bad
sparse cast); here validation is a declarative, single-pass report.

Scale shape: ``expectation_report`` evaluates EVERY rule in ONE scan
— each rule becomes a `sum(case when violated)` aggregate, so the
whole report is a map-side partial agg + one 1-row reduce, then a
`stack` to long form on the driver-sized result. No per-rule scans,
no shuffle of data rows. ``duplicate_keys`` is the one rule that
genuinely needs a shuffle (count per key), kept separate so callers
pay it only when asked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expectation_report(
    df: DataFrame, rules: list[tuple[str, Column]]
) -> DataFrame:
    """One-scan violation report for boolean expectation ``rules``.

    Each rule is (name, boolean Column) where the column is the
    EXPECTATION (True/NULL = pass is False — a NULL predicate counts
    as a violation, matching SQL's `NOT coalesce(pred, FALSE)`).

    Output: (rule string, total bigint, violations bigint,
    violation_frac double), one row per rule, in rule order.
    """
    if not rules:
        raise ValueError("rules must not be empty")
    aggs = [F.count(F.lit(1)).alias("__total")]
    for i, (_, pred) in enumerate(rules):
        aggs.append(
            F.sum(
                F.when(F.coalesce(pred, F.lit(False)), 0).otherwise(1)
            ).alias(f"__v{i}")
        )
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        "'{}', __v{}".format(name.replace("'", "''"), i)
        for i, (name, _) in enumerate(rules)
    )
    return wide.selectExpr(
        f"stack({len(rules)}, {stack_args}) as (rule, violations)",
        "__total as total",
    ).select(
        "rule",
        F.col("total").cast("bigint").alias("total"),
        F.col("violations").cast("bigint").alias("violations"),
        (F.col("violations") / F.col("total")).alias("violation_frac"),
    )


def duplicate_keys(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Keys appearing more than once: (key_cols..., n bigint).

    The uniqueness expectation — one hash shuffle on the key with
    map-side partial counts; emits only the offending keys, so the
    result is registry-churn-sized, not corpus-sized.
    """
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )

"""Type-2 slowly-changing-dimension maintenance for registry tables.

Beyond-reference training-data extension. The reference's MySQL
registry (`vector_database/mysql_connector.py:48,66`) is read as a
point-in-time snapshot; a production corpus pipeline also needs the
HISTORY of that dimension (which knowledge base a file belonged to
when a chunk was embedded) to re-derive lineage after re-ingests.
``scd2_apply`` is that maintenance step, expressed relationally.

Semantics (classic SCD type 2):
- ``history`` rows carry ``valid_from`` / ``valid_to`` (NULL
  ``valid_to`` == current). ``updates`` carry the key, the tracked
  attributes, and one ``effective_ts`` per key.
- An update whose tracked attributes differ (null-safely) from the
  key's current row CLOSES that row (``valid_to = effective_ts``)
  and appends a new current row. An update for an unseen key just
  appends. An update identical to the current row is a no-op.
- Expired history rows are never touched.

Scale shape (100 TB): one shuffle of ``history`` on the key joined
against the (typically tiny — a day's registry churn) ``updates``
side, which Spark broadcasts below the autoBroadcast threshold; no
window over the full history, no global sort. The output is a plain
column-pruned union — Catalyst pushes any downstream
``valid_to IS NULL`` filter straight to the scan.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _differs(tracked: list[str], left: str, right: str):
    """Null-safe 'any tracked attribute differs' predicate."""
    return reduce(
        lambda a, b: a | b,
        [
            ~F.col(f"{left}.{c}").eqNullSafe(F.col(f"{right}.{c}"))
            for c in tracked
        ],
    )


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    effective_col: str = "effective_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Apply one batch of dimension updates as SCD type 2.

    ``updates`` may hold several rows per key; the latest by
    ``effective_col`` (ties broken by the tracked values, so the
    pick is deterministic) wins and the rest are ignored — applying
    intermediate versions within one batch would need per-key
    chaining, which is a different (streaming) operator.

    Output schema: key, *tracked, valid_from, valid_to — expired
    rows, closed rows, surviving current rows, and the new current
    rows, in one DataFrame.
    """
    if not tracked:
        raise ValueError("tracked must name at least one attribute column")

    w = Window.partitionBy(key).orderBy(
        F.desc(effective_col), *[F.desc_nulls_last(c) for c in tracked]
    )
    latest = (
        updates.select(key, *tracked, effective_col)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .alias("u")
    )

    cur = history.filter(F.col(valid_to).isNull()).alias("h")
    expired = history.filter(F.col(valid_to).isNotNull()).select(
        key, *tracked, valid_from, valid_to
    )

    changed = _differs(tracked, "h", "u")

    # Current rows: close the ones a differing update touches.
    cur_out = cur.join(latest, on=key, how="left").select(
        F.col(f"h.{key}").alias(key),
        *[F.col(f"h.{c}").alias(c) for c in tracked],
        F.col(f"h.{valid_from}").alias(valid_from),
        F.when(
            F.col(f"u.{effective_col}").isNotNull() & changed,
            F.col(f"u.{effective_col}"),
        ).alias(valid_to),
    )

    # New current rows: differing updates + brand-new keys.
    new_out = (
        latest.join(cur, on=key, how="left")
        .filter(F.col(f"h.{valid_from}").isNull() | changed)
        .select(
            F.col(f"u.{key}").alias(key),
            *[F.col(f"u.{c}").alias(c) for c in tracked],
            F.col(f"u.{effective_col}").alias(valid_from),
            F.lit(None)
            .cast(history.schema[valid_to].dataType)
            .alias(valid_to),
        )
    )

    return expired.unionByName(cur_out).unionByName(new_out)

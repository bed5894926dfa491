"""Co-occurrence affinity over event streams.

Beyond-reference training-data extension: item-item co-occurrence
("users who touched A also touched B") is the classic batch
collaborative-filtering / related-content primitive, and at corpus
scale it is also how near-duplicate *sources* and scraper loops show
up (two mirrors co-occurring across the same user sessions).

Scale shape: the quadratic danger is the per-user self-join — a
power user with U distinct items emits U² pairs. ``max_items_per_
user`` drops users above the cap BEFORE the join (the same
df-pruning stance as dedup's ``max_doc_freq``: hot keys are capped
structurally, not hoped away), so per-user fan-out is bounded at
cap². Both joins shuffle on the same user key, so Spark reuses the
partitioning; the pair aggregation is the only other exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_ITEMS_PER_USER = 100


def item_cooccurrence(
    events: DataFrame,
    user_col: str = "user_id",
    item_col: str = "item",
    min_count: int = 2,
    max_items_per_user: int | None = DEFAULT_MAX_ITEMS_PER_USER,
) -> DataFrame:
    """Distinct-user co-occurrence counts per unordered item pair.

    A user contributes at most once per pair (distinct user-item
    first), so a bot replaying one pair a million times counts once.
    Users with more than ``max_items_per_user`` distinct items are
    excluded entirely (cap² bounds their pair fan-out; None disables
    — tiny corpora only).

    Output: (item_a, item_b, n_users bigint), item_a < item_b,
    n_users >= min_count.
    """
    ui = events.select(
        F.col(user_col).alias("__u"), F.col(item_col).alias("__i")
    ).filter(F.col("__u").isNotNull() & F.col("__i").isNotNull()).distinct()
    if max_items_per_user is not None:
        per_user = ui.groupBy("__u").agg(
            F.count(F.lit(1)).alias("__n_items")
        )
        ui = (
            ui.join(
                per_user.filter(
                    F.col("__n_items") <= max_items_per_user
                ),
                "__u",
            ).drop("__n_items")
        )
    a = ui.select(F.col("__u"), F.col("__i").alias("item_a"))
    b = ui.select(F.col("__u"), F.col("__i").alias("item_b"))
    return (
        a.join(b, "__u")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .filter(F.col("n_users") >= min_count)
    )

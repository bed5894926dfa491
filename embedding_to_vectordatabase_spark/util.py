"""Plan utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame

# per-core slice below which a fan-out stage is considered under-
# parallel: small enough that the repartition shuffle is trivial,
# large enough that real datasets (GB+) never trigger it
_SMALL_INPUT_BYTES_PER_CORE = 4 << 20


def ensure_parallelism(df: DataFrame, factor: int = 1) -> DataFrame:
    """Repartition ONLY when the input is small enough that its scan
    partitioning would leave most cores idle through an expensive
    fan-out stage (shingle explode, chunking, per-doc regex).

    The decision uses the optimizer's size estimate — pure plan
    analysis, never executing stages (``df.rdd`` would run shuffle
    stages eagerly under AQE). Inputs estimated above ~4 MB/core pass
    through untouched, so at real scale this is always a no-op and
    plans stay narrow; the shuffle is only ever paid on inputs tiny
    enough for it to be free.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    try:
        size = int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
    except Exception:  # stats unavailable — leave the plan alone
        return df
    if 0 <= size < target * _SMALL_INPUT_BYTES_PER_CORE:
        return df.repartition(target)
    return df

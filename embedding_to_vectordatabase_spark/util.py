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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join for when the dim side is too big to
    broadcast AND the fact side has hot keys.

    A plain shuffle join puts every fact row of a hot key into ONE
    reducer; here the fact side spreads each key over ``num_salts``
    sub-keys (deterministic hash of the whole row) and the dim side is
    replicated ×num_salts, so each hot key's rows land on num_salts
    reducers. Join semantics are preserved for inner/left joins (each
    fact row meets exactly one copy of each matching dim row). Cost:
    dim shuffle volume ×num_salts — use AQE skew handling first; salt
    when the skew is in a hash-aggregate-free path AQE can't split.
    """
    from pyspark.sql import functions as F

    on = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(num_salts)
    ).cast("int")
    f = fact.withColumn("__salt", salt)
    d = dim.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(num_salts)])),
    )
    return f.join(d, on + ["__salt"], how).drop("__salt")

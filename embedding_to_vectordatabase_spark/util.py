"""Plan utilities."""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ts_micros(col: Column | str) -> Column:
    """Epoch microseconds from a TIMESTAMP **or** TIMESTAMP_NTZ column.

    ``F.unix_micros`` rejects TIMESTAMP_NTZ outright
    (DATATYPE_MISMATCH) and Spark never implicitly casts between the
    two timestamp types. Casting NTZ→TIMESTAMP interprets the naive
    value in the session time zone (pin it to UTC for engine-portable
    epoch semantics) and is a no-op on TIMESTAMP, so one cast makes
    every time-arithmetic operator accept both types.
    """
    col = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(col.cast("timestamp"))

# per-core slice below which a fan-out stage is considered under-
# parallel: small enough that the repartition shuffle is trivial,
# large enough that real datasets (GB+) never trigger it
_SMALL_INPUT_BYTES_PER_CORE = 4 << 20
# above this estimated size the input is left alone even if its scan
# splits under-fill the cores: repartitioning stops being free, and an
# input this big is close to filling the cores via maxPartitionBytes
# splits anyway
_RESPREAD_CAP_BYTES_PER_CORE = 64 << 20

_UNITS = {"": 1, "b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}


def _parse_bytes(s: str, default: int = 128 << 20) -> int:
    """Spark byte-size conf string ('64m', '134217728', '1g') → bytes."""
    try:
        m = re.fullmatch(r"(\d+)\s*([kmgt]?b?)", str(s).strip().lower())
        return int(m.group(1)) * _UNITS[m.group(2).rstrip("b")] if m else default
    except Exception:
        return default


def ensure_parallelism(df: DataFrame, factor: int = 1) -> DataFrame:
    """Repartition ONLY when the input is small enough that its scan
    partitioning would leave most cores idle through an expensive
    fan-out stage (shingle explode, chunking, per-doc regex).

    The decision uses the optimizer's size estimate — pure plan
    analysis, never executing stages (``df.rdd`` would run shuffle
    stages eagerly under AQE). Two triggers:

    - tiny inputs (< ~4 MB/core): repartition unconditionally — the
      shuffle is free;
    - mid-size inputs whose SCAN SPLITS under-fill the cores (fewer
      than ``target`` maxPartitionBytes-sized splits, up to a
      ~64 MB/core cap): a 200 MB corpus scans as 3-4 splits, and a
      100× fan-out stage (shingle explode, chunking) then idles the
      other cores for 10× the repartition's cost — measured 72 s vs
      9 s for 80k-doc minhash signatures.

    At real scale (size >> cores × maxPartitionBytes) both triggers
    are no-ops and plans stay narrow.
    """
    spark = df.sparkSession
    sc = spark.sparkContext
    target = sc.defaultParallelism * factor
    try:
        size = int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
    except Exception:  # stats unavailable — leave the plan alone
        return df
    if size < 0:
        return df
    # a small-by-bytes input can still fill the cores (a 35 MB corpus
    # written as 32 files scans as 32 splits); respreading it is pure
    # exchange cost — measured 0.4 s per bm25 call at 100k docs
    # (r12). The actual split count is only safe to read off df.rdd
    # when the plan is shuffle-free (building the RDD of a plan with
    # exchanges executes those stages eagerly under AQE), so the
    # check is gated on the optimized plan's node types.
    try:
        plan = str(df._jdf.queryExecution().optimizedPlan())
        # the blacklist must cover EVERY node family that forces an
        # exchange, not just the common ones: FlatMapGroupsIn*/
        # CoGroup (applyInPandas), Deduplicate, Expand (rollup/cube),
        # Intersect/Except, and any Group* variant — df.rdd on a plan
        # with an exchange executes those stages eagerly under AQE,
        # the exact hazard this gate exists to avoid (r12 ADVICE)
        if not re.search(
            r"(?i)join|aggregate|window|repartition|sort|distinct"
            r"|limit|group|cogroup|deduplicate|expand|intersect"
            r"|except|flatmap",
            plan,
        ):
            if df.rdd.getNumPartitions() >= target:
                return df
            # an RDD-backed input (localCheckpoint, createDataFrame)
            # reports spark.sql.defaultSizeInBytes — UNKNOWN, read by
            # the size triggers below as enormous — while AQE often
            # leaves it in ONE coalesced partition. Without this, a
            # checkpointed micro-batch serializes every expensive
            # fan-out stage on one core: the r16 gated-stream bench
            # measured the embed stage at 6.5x the plain wall for
            # exactly this reason. Such inputs are bounded by the
            # contract that checkpointed them, so respreading is the
            # cheap, correct default.
            if size >= _parse_bytes(
                spark.conf.get(
                    "spark.sql.defaultSizeInBytes",
                    str((1 << 63) - 1),
                )
            ):
                return df.repartition(target)
    except Exception:
        pass
    if size < target * _SMALL_INPUT_BYTES_PER_CORE:
        return df.repartition(target)
    max_split = _parse_bytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    )
    if (
        size < target * _RESPREAD_CAP_BYTES_PER_CORE
        and size // max(max_split, 1) < target
    ):
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

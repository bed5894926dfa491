"""Sketch operators: reusable HyperLogLog columns and frequent items.

Beyond-reference extension (the reference has no approximate
analytics; SURVEY §2 maps its only aggregate surface to A1-A4): at
100 TB, distinct-count questions ("unique users per day / per event
type / overall") are answered with mergeable sketches, not exact
COUNT(DISTINCT) re-scans. Spark ships Apache DataSketches HLL
natively (``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``), so the sketch column is a first-class
binary column: build once per partition/day in the ingest pass,
persist next to the rollup, merge later at query time — a re-
aggregation reads kilobytes of sketches instead of the raw store.

Scale shape: one shuffle on the group keys to build; merging N
sketches is an agg over N binary values of ~2^lg_k bytes each —
independent of the row count they summarize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def hll_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_k: int = 12,
    sketch_col: str = "hll",
) -> DataFrame:
    """Per-group mergeable HLL sketch (binary) of ``value_col``'s
    distinct values. lg_k=12 → ~4 KB per sketch, ~1.6% relative
    standard error."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias(sketch_col)
    )


def hll_merge(
    df: DataFrame,
    group_cols: list[str],
    sketch_col: str = "hll",
) -> DataFrame:
    """Re-aggregate persisted sketches to a coarser grouping without
    touching the raw data (hour sketches → day/total, per-file →
    per-collection). Lossless: merging per-part sketches gives the
    same estimate as sketching the union directly."""
    return df.groupBy(*group_cols).agg(
        F.hll_union_agg(sketch_col).alias(sketch_col)
    )


def hll_estimate(
    df: DataFrame,
    sketch_col: str = "hll",
    out_col: str = "n_distinct_approx",
) -> DataFrame:
    """Read the estimate off a sketch column (cheap expression)."""
    return df.withColumn(
        out_col, F.hll_sketch_estimate(F.col(sketch_col))
    ).drop(sketch_col)


def approx_distinct_by(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """One-shot: per-group approximate distinct count via HLL.
    Output: group_cols + (n_distinct_approx long)."""
    return hll_estimate(hll_sketches(df, group_cols, value_col, lg_k))


def top_n_by_count(
    df: DataFrame,
    key_cols: list[str],
    n: int,
) -> DataFrame:
    """Exact frequent-items top-N: count per key, take the N largest
    with a deterministic tie-break (count desc, then keys asc).

    Plan: map-side partial count + one shuffle on the keys, then
    orderBy+limit compiles to TakeOrderedAndProject — each partition
    keeps its local top N and the driver merges N-sized heaps, so no
    global sort ever materializes. Output: key_cols +
    (n_occurrences long).
    """
    counts = df.groupBy(*key_cols).agg(
        F.count("*").alias("n_occurrences")
    )
    return counts.orderBy(
        F.desc("n_occurrences"), *[F.asc(c) for c in key_cols]
    ).limit(n)


def kll_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 200,
    sketch_col: str = "kll",
) -> DataFrame:
    """Per-group mergeable KLL quantile sketch (binary) of
    ``value_col`` — the quantile twin of ``hll_sketches``: at 100 TB,
    "p99 per day / per source / overall" rollups are answered by
    persisting one small sketch per fine group in the ingest pass and
    merging later, never by re-scanning the raw store (exact
    percentiles need a full sort per question). Spark 4.1 ships
    Apache DataSketches KLL natively (``kll_sketch_agg_double`` et
    al.), so the sketch is a first-class binary column like the HLL
    one. k=200 -> ~1.65% rank error, a few KB per sketch.

    Scale shape: one shuffle on the group keys with map-side partial
    sketch combine; everything downstream touches kilobytes."""
    return df.groupBy(*group_cols).agg(
        F.kll_sketch_agg_double(
            F.col(value_col).cast("double"), F.lit(k)
        ).alias(sketch_col),
        F.count(value_col).alias("n_values"),
    )


def kll_merge(
    df: DataFrame,
    group_cols: list[str],
    sketch_col: str = "kll",
) -> DataFrame:
    """Re-aggregate persisted KLL sketches to a coarser grouping
    without touching raw data (per-source -> total, hour -> day).
    ``kll_sketch_merge_double`` is a scalar two-sketch merge, so the
    group fold is collect_list + a linear ``aggregate()`` lambda —
    the list holds one ~KB sketch per FINE GROUP member (bounded by
    the rollup fan-in, never by row count). Merged n is exact (KLL
    tracks n losslessly); quantile error stays within the sketch's
    rank-error bound.

    All-NULL groups (every fine sketch NULL, e.g. value_col entirely
    NULL): collect_list drops NULLs so ``__sks`` is empty, and the
    fold seed uses ``try_element_at`` — under Spark 4's default ANSI
    mode a plain ``element_at`` on the empty array would throw
    INVALID_ARRAY_INDEX and kill the task; try_element_at yields a
    NULL sketch for the group instead."""
    g = df.groupBy(*group_cols).agg(
        F.collect_list(sketch_col).alias("__sks"),
        F.sum("n_values").alias("n_values"),
    )
    merged = F.aggregate(
        F.slice(
            F.col("__sks"),
            2,
            F.greatest(F.size("__sks") - 1, F.lit(0)),
        ),
        F.try_element_at(F.col("__sks"), F.lit(1)),
        lambda acc, x: F.kll_sketch_merge_double(acc, x),
    )
    return g.select(
        *group_cols, merged.alias(sketch_col), "n_values"
    )


def kll_quantiles(
    df: DataFrame,
    ranks: list[float],
    sketch_col: str = "kll",
    out_col: str = "quantiles",
) -> DataFrame:
    """Read quantile estimates off a sketch column (cheap expression;
    one array<double> of values per row, parallel to ``ranks``)."""
    return df.withColumn(
        out_col,
        F.kll_sketch_get_quantile_double(
            F.col(sketch_col),
            F.array(*[F.lit(float(r)) for r in ranks]),
        ),
    ).drop(sketch_col)


def _ident(name: str) -> str:
    """Backtick-quote a column name for interpolation into an
    ``F.expr`` SQL fragment (the Theta functions have no Python
    binding yet, so the column reference must travel as SQL text).
    Without quoting, a name with a space/hyphen breaks the parse —
    or worse, a name containing an expression fragment EXECUTES as
    SQL. Backticks make any name a plain identifier; embedded
    backticks are escaped by doubling per Spark's lexer."""
    return "`" + name.replace("`", "``") + "`"


def theta_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    sketch_col: str = "theta",
) -> DataFrame:
    """Per-group mergeable Theta sketch (binary) of ``value_col``'s
    distinct values — the SET-ALGEBRA sibling of ``hll_sketches``:
    HLL only unions, Theta also intersects and differences, which is
    what audience-overlap questions need ("users who did X AND Y" /
    "X but not Y", "docs in both crawls") without exact distinct
    joins. Spark 4.1 ships DataSketches Theta natively; the SQL
    functions are used via expr() (``theta_intersection_agg`` /
    ``theta_difference`` have no Python binding yet). Below ~4k
    distinct values per sketch (lg_k=12 default) Theta is in exact
    mode and estimates are exact integers; above it, within ~3%.

    ``value_col``/``sketch_col`` travel as SQL text but are
    backtick-quoted by ``_ident`` — any column name is safe."""
    return df.groupBy(*group_cols).agg(
        F.expr(f"theta_sketch_agg({_ident(value_col)})").alias(sketch_col)
    )


def theta_union(
    df: DataFrame, group_cols: list[str], sketch_col: str = "theta"
) -> DataFrame:
    """Re-aggregate Theta sketches to a coarser grouping: distinct
    of the UNION of the fine groups' value sets."""
    return df.groupBy(*group_cols).agg(
        F.expr(f"theta_union_agg({_ident(sketch_col)})").alias(sketch_col)
    )


def theta_intersection(
    df: DataFrame, group_cols: list[str], sketch_col: str = "theta"
) -> DataFrame:
    """Re-aggregate Theta sketches by set INTERSECTION: distinct
    values present in EVERY fine group of the coarser key — the
    "did all of X, Y, Z" audience primitive HLL cannot express."""
    return df.groupBy(*group_cols).agg(
        F.expr(f"theta_intersection_agg({_ident(sketch_col)})").alias(sketch_col)
    )


def theta_difference(a: str, b: str):
    """Column expression: sketch of values in ``a``'s set but not
    ``b``'s (a-not-b). ``a``/``b`` are sketch column names."""
    return F.expr(f"theta_difference({_ident(a)}, {_ident(b)})")


def theta_estimate(
    df: DataFrame,
    sketch_col: str = "theta",
    out_col: str = "n_distinct_approx",
) -> DataFrame:
    """Read the estimate off a Theta sketch column (cheap
    expression; exact below the sketch's nominal-entries bound)."""
    return df.withColumn(
        out_col,
        F.expr(f"theta_sketch_estimate({_ident(sketch_col)})").cast("bigint"),
    ).drop(sketch_col)


def cms_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
    sketch_col: str = "cms",
) -> DataFrame:
    """Per-group mergeable Count-Min sketch (binary) of ``value_col``
    — the FREQUENCY sibling of the HLL/KLL/Theta family (Cormode &
    Muthukrishnan 2005): "how often did THIS user/token/URL appear"
    point queries off a kilobyte summary, where HLL answers distinct
    counts and KLL answers quantiles. At 100 TB, per-key frequency
    questions over rolled-up history are answered by persisting one
    sketch per fine group at ingest and estimating later — never by
    re-scanning raw events.

    Spark ships its own CMS natively (``F.count_min_sketch``, a JVM
    aggregate with map-side partial combine — one shuffle on the
    group keys, kilobytes downstream). Guarantee: estimate >= true
    count always (never under), and <= true + eps * total with
    probability ``confidence``. eps=0.001/conf=0.99 -> a 2000x7
    long table, ~112 KB per sketch. Deterministic for a fixed seed.

    Output: group_cols + (sketch_col binary, n_values long)."""
    return df.groupBy(*group_cols).agg(
        F.count_min_sketch(
            F.col(value_col), F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias(sketch_col),
        F.count(value_col).alias("n_values"),
    )


def _cms_read(spark, raw: bytes):
    """Deserialize one Spark CountMinSketch from its binary column
    form via the JVM class (`org.apache.spark.util.sketch
    .CountMinSketch.readFrom` — the same public class the aggregate
    serializes with; Spark exposes no SQL-side point-query or merge
    function for CMS, so estimate/merge run driver-side over the
    BOUNDED per-group sketch rows, exactly like a rollup table
    read)."""
    return (
        spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
            bytes(raw)
        )
    )


def cms_estimate(
    df: DataFrame,
    items: list,
    group_cols: list[str],
    sketch_col: str = "cms",
) -> DataFrame:
    """Point-query frequency estimates off a CMS sketch column for a
    fixed probe set of ``items`` (ints or strings — must match the
    type the sketch was built over; Spark's CMS hashes integral and
    string items differently).

    Driver-side by design: Spark has no SQL function to read its CMS
    binary, and the sketch table is group-count-bounded (the rollup
    contract — kilobyte sketches, never corpus rows), so the collect
    here is the bounded-collect pattern, not a distributed-work
    smell. Output: group_cols + (item string, est_count long,
    n_values long), one row per (group, probe item), as a new
    DataFrame so downstream stays in the engine."""
    spark = df.sparkSession
    rows = df.select(*group_cols, sketch_col, "n_values").collect()
    out = []
    for r in rows:
        sk = _cms_read(spark, r[sketch_col])
        for it in items:
            out.append(
                tuple(r[g] for g in group_cols)
                + (str(it), int(sk.estimateCount(it)), r["n_values"])
            )
    # group cols keep their input types; probe item travels as
    # string. Schema is built as a StructType, never DDL text — a
    # struct/map group column's simpleString contains internal
    # colons and would not round-trip through string surgery
    schema = T.StructType(
        list(df.select(*group_cols).schema.fields)
        + [
            T.StructField("item", T.StringType(), False),
            T.StructField("est_count", T.LongType(), False),
            T.StructField("n_values", T.LongType(), True),
        ]
    )
    return spark.createDataFrame(out, schema)


def _murmur3_32(b: bytes, seed: int) -> int:
    """Murmur3_x86_32 over raw bytes, bit-identical to Spark's
    ``Murmur3_x86_32.hashUnsafeBytes`` (the hash CountMinSketch uses
    for string/binary items): 4-byte words are read in NATIVE
    little-endian order, tail bytes are SIGN-EXTENDED ints, and the
    return value is a signed 32-bit int. Verified against
    ``CountMinSketch.estimateCount`` on the JVM in tests (exact
    parity, including multi-byte UTF-8)."""
    import struct as _struct

    M = 0xFFFFFFFF
    n = len(b)
    aligned = n - n % 4
    h1 = seed & M
    for i in range(0, aligned, 4):
        k1 = _struct.unpack("<i", b[i : i + 4])[0] & M
        k1 = (k1 * 0xCC9E2D51) & M
        k1 = ((k1 << 15) | (k1 >> 17)) & M
        k1 = (k1 * 0x1B873593) & M
        h1 ^= k1
        h1 = ((h1 << 13) | (h1 >> 19)) & M
        h1 = (h1 * 5 + 0xE6546B64) & M
    for i in range(aligned, n):
        byte = b[i]
        if byte > 127:
            byte -= 256  # Java bytes are signed, sign-extended
        k1 = (byte & M) * 0xCC9E2D51 & M
        k1 = ((k1 << 15) | (k1 >> 17)) & M
        k1 = (k1 * 0x1B873593) & M
        h1 ^= k1
        h1 = ((h1 << 13) | (h1 >> 19)) & M
        h1 = (h1 * 5 + 0xE6546B64) & M
    h1 ^= n
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & M
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & M
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def _cms_parse(raw: bytes):
    """Parse Spark's public CountMinSketch V1 serialization (the
    exact byte stream ``CountMinSketchImpl.writeTo`` emits and the
    ``count_min_sketch`` aggregate returns): big-endian
    [int version=1][long totalCount][int depth][int width]
    [long hashA × depth][long table × depth × width]. Returns
    (total, depth, width, hashA ndarray, table ndarray)."""
    import struct as _struct

    import numpy as np

    ver, total, depth, width = _struct.unpack(">iqii", raw[:20])
    if ver != 1:
        raise ValueError(f"unsupported CountMinSketch version {ver}")
    hash_a = np.frombuffer(raw, dtype=">i8", count=depth, offset=20)
    table = np.frombuffer(
        raw, dtype=">i8", count=depth * width, offset=20 + 8 * depth
    ).reshape(depth, width)
    return total, depth, width, hash_a, table


def _cms_estimate_py(parsed, item) -> int:
    """Point-query one parsed sketch, matching
    ``CountMinSketchImpl.estimateCount`` bit-for-bit: integral items
    hash via the hashA affine scheme, strings via double Murmur3
    (hash1 + i*hash2, Java truncating %, abs)."""
    total, depth, width, hash_a, table = parsed
    if isinstance(item, (int,)) and not isinstance(item, bool):
        res = None
        mask = 0xFFFFFFFFFFFFFFFF
        for i in range(depth):
            h = (int(hash_a[i]) * item) & mask
            h = (h + (h >> 32)) & mask
            h &= (1 << 31) - 1
            v = int(table[i, h % width])
            res = v if res is None else min(res, v)
        return res
    b = item if isinstance(item, bytes) else str(item).encode("utf-8")
    h1 = _murmur3_32(b, 0)
    h2 = _murmur3_32(b, h1 & 0xFFFFFFFF)
    res = None
    for i in range(depth):
        v = (h1 + i * h2) & 0xFFFFFFFF
        if v >= 1 << 31:
            v -= 1 << 32
        bucket = abs(v) % width if v >= 0 else (-v) % width
        t = int(table[i, bucket])
        res = t if res is None else min(res, t)
    return res


def cms_estimate_distributed(
    df: DataFrame,
    items: list,
    group_cols: list[str],
    sketch_col: str = "cms",
) -> DataFrame:
    """Point-query frequency estimates off a CMS sketch column —
    DISTRIBUTED: the sketch binary is parsed and probed inside
    ``mapInPandas`` with a pure-Python reader of Spark's public
    CountMinSketch serialization (bit-identical estimates to the JVM
    ``estimateCount``, asserted in tests), so the query scales to ANY
    number of groups — no driver collect, no bounded-cardinality
    contract. This is the 100 TB path ``cms_estimate`` (driver-side,
    rollup-table-bounded by contract) graduates to when the group key
    is high-cardinality.

    Output matches ``cms_estimate``: group_cols + (item string,
    est_count long, n_values long), one row per (group, probe item).
    Plan shape: MAP-ONLY over the sketch table (the probe list rides
    in the task closure)."""
    import pandas as pd

    probe = list(items)
    has_n = "n_values" in df.columns
    cols = list(group_cols) + [sketch_col] + (
        ["n_values"] if has_n else []
    )
    src = df.select(*cols)
    schema = T.StructType(
        list(df.select(*group_cols).schema.fields)
        + [
            T.StructField("item", T.StringType(), False),
            T.StructField("est_count", T.LongType(), False),
            T.StructField("n_values", T.LongType(), True),
        ]
    )

    def run(batches):
        for pdf in batches:
            out_rows = []
            for _, row in pdf.iterrows():
                parsed = _cms_parse(bytes(row[sketch_col]))
                nv = int(row["n_values"]) if has_n else parsed[0]
                for it in probe:
                    out_rows.append(
                        tuple(row[g] for g in group_cols)
                        + (str(it), _cms_estimate_py(parsed, it), nv)
                    )
            yield pd.DataFrame(
                out_rows, columns=[f.name for f in schema.fields]
            )

    return src.mapInPandas(run, schema)


def _cms_write(total: int, depth: int, width: int, hash_a, table) -> bytes:
    """Re-serialize a parsed CMS to Spark's V1 byte stream (the exact
    inverse of ``_cms_parse``): the merged sketch stays readable by
    the JVM ``readFrom`` and by ``_cms_parse`` itself — asserted
    round-trip-identical in tests."""
    import struct as _struct

    import numpy as np

    return (
        _struct.pack(">iqii", 1, total, depth, width)
        + np.asarray(hash_a, dtype=">i8").tobytes()
        + np.asarray(table, dtype=">i8").tobytes()
    )


def cms_merge_distributed(
    df: DataFrame,
    group_cols: list[str],
    sketch_col: str = "cms",
) -> DataFrame:
    """Re-aggregate CMS sketch rows to a coarser grouping —
    DISTRIBUTED: Count-Min merge is elementwise addition of the count
    tables of same-shaped sketches (Cormode & Muthukrishnan 2005; the
    same operation ``mergeInPlace`` performs), so each coarse group's
    fine sketches are summed inside ``applyInPandas`` via the
    pure-Python parse/serialize pair — the merge scales to any number
    of coarse groups with zero driver collects, completing the
    distributed CMS lifecycle next to ``cms_estimate_distributed``.

    Same-parameter discipline as the JVM merge: sketches whose
    depth/width/seed (hashA) differ raise ValueError (the
    IncompatibleMergeException analogue). Output: group_cols +
    (sketch_col binary, n_values long) — feed it straight back into
    ``cms_estimate_distributed``.

    Plan shape: ONE shuffle on the coarse keys; per-group work is
    linear in fine-group count × the (depth × width) table size."""
    import pandas as pd

    # n_values optional, mirroring cms_estimate_distributed: absent ->
    # NULL in the output (the estimate side falls back to the sketch's
    # own total), never a fabricated 0.
    has_n = "n_values" in df.columns
    src = df.select(
        *group_cols, sketch_col, *(["n_values"] if has_n else [])
    )
    schema = T.StructType(
        list(df.select(*group_cols).schema.fields)
        + [
            T.StructField(sketch_col, T.BinaryType(), False),
            T.StructField("n_values", T.LongType(), True),
        ]
    )

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        total, depth, width, hash_a, table = _cms_parse(
            bytes(pdf[sketch_col].iloc[0])
        )
        table = table.astype("int64").copy()
        for raw in pdf[sketch_col].iloc[1:]:
            t2, d2, w2, h2, tb2 = _cms_parse(bytes(raw))
            if d2 != depth or w2 != width or (h2 != hash_a).any():
                raise ValueError(
                    "incompatible CMS sketches: depth/width/seed differ"
                )
            total += t2
            table += tb2
        # min_count=1: a coarse group whose fine rows are ALL NULL
        # stays NULL (pandas' default sum() skips NaN and would
        # fabricate 0); any non-NULL row sums normally.
        nv = (
            pdf["n_values"].sum(min_count=1) if has_n else float("nan")
        )
        out = pdf.iloc[[0]][list(group_cols)].copy()
        out[sketch_col] = [
            _cms_write(total, depth, width, hash_a, table)
        ]
        out["n_values"] = [None if pd.isna(nv) else int(nv)]
        return out

    return src.groupBy(*group_cols).applyInPandas(merge, schema)


def cms_merge_estimate(
    df: DataFrame,
    items: list,
    sketch_col: str = "cms",
):
    """Merge ALL sketch rows of ``df`` into one (driver-side
    ``mergeInPlace`` over the bounded sketch table — fine-group ->
    total rollup) and point-query the probe ``items``. Returns a
    list of (item, est_count) tuples plus the merged total n.
    Sketches must share eps/confidence/seed (Spark throws
    IncompatibleMergeException otherwise — surfaced as-is)."""
    spark = df.sparkSession
    rows = df.select(sketch_col, "n_values").collect()
    if not rows:
        return [], 0
    merged = _cms_read(spark, rows[0][sketch_col])
    for r in rows[1:]:
        merged.mergeInPlace(_cms_read(spark, r[sketch_col]))
    n = sum(r["n_values"] for r in rows)
    return [(str(it), int(merged.estimateCount(it))) for it in items], n

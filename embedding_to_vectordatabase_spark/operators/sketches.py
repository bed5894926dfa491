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
    # group cols keep their input types; probe item travels as string
    fields = ", ".join(
        [f.simpleString() for f in df.select(*group_cols).schema.fields]
        + ["item:string", "est_count:bigint", "n_values:bigint"]
    ).replace(":", " ")
    return spark.createDataFrame(out, fields)


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

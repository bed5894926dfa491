"""Data-layout maintenance for the parquet store: range clustering
(row-group skipping) and small-file compaction.

Beyond-reference scale extensions. The reference's store management
is file rotation at a row cap (milvus_file_manage.py — SURVEY K1/K3);
at 100 TB the two operations that keep such a store scannable are:

- **Range clustering**: lay rows out so each file/row-group covers a
  tight range of the filter key. Parquet footers carry per-row-group
  min/max; a clustered layout lets any engine (Spark's vectorized
  reader, DuckDB, Trino) skip whole row groups on a key predicate —
  the poor man's index, and the only one a plain parquet lake has.
- **Z-order clustering**: the multi-column form — interleave the
  rank-normalized key bits (Morton curve) so each row group covers a
  tight hyper-rectangle of the combined key space and conjunctive
  predicates over ANY key subset skip from the footers alone.
- **Compaction**: streaming/rotating ingest leaves many small files;
  scan cost at 1000 executors is dominated by file-open overhead once
  files drop below a few MB. Compaction rewrites a prefix-stable
  store into ~target-sized files.

Both are full rewrites of the paths they touch (plain parquet has no
in-place move); on a table format (Delta/Iceberg) the same calls map
to OPTIMIZE ... ZORDER / rewrite_data_files 1:1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def cluster_by(
    df: DataFrame,
    cols: list[str],
    num_files: int | None = None,
) -> DataFrame:
    """Range-cluster rows by ``cols``: repartitionByRange splits the
    key space into contiguous, roughly equal slices (sampled range
    bounds — skew-resistant), and sortWithinPartitions orders rows
    inside each slice so every parquet row group covers a tight
    min/max band of the key.

    Returns the re-laid-out DataFrame — write it with any writer.
    One shuffle; at scale this is the same exchange a sorted write
    would need anyway. With ``num_files=None`` the slice count follows
    ``spark.sql.shuffle.partitions`` and AQE may coalesce small
    outputs into few files — pin ``num_files`` when a minimum file
    count (scan parallelism) matters more than file size.
    """
    key_cols = [F.col(c) for c in cols]
    parts = (
        df.repartitionByRange(num_files, *key_cols)
        if num_files is not None
        else df.repartitionByRange(*key_cols)
    )
    return parts.sortWithinPartitions(*key_cols)


def zorder_value(
    cols: list[Column],
    mins: list[float],
    maxs: list[float],
    bits: int = 12,
) -> Column:
    """Morton (Z-curve) key: each column rank-normalized to a
    ``bits``-bit integer against its [min, max], then bit-interleaved
    (column j contributes bit i at position i*k + j). Pure native
    expressions — the interleave is bits x k shift/or terms folded
    into one codegen'd long. Constant columns (min == max) contribute
    0 to every position. k * bits must fit a signed long (<= 62)."""
    k = len(cols)
    if k < 2:
        raise ValueError("zorder needs >= 2 columns (use cluster_by for 1)")
    if k * bits > 62:
        raise ValueError(f"{k} cols x {bits} bits exceeds a signed long")
    if len(mins) != k or len(maxs) != k:
        raise ValueError(
            f"mins/maxs must have one entry per column: got "
            f"{len(mins)}/{len(maxs)} for {k} columns"
        )
    top = (1 << bits) - 1
    quantized = []
    for c, mn, mx in zip(cols, mins, maxs):
        if mx > mn:
            q = F.least(
                F.lit(top).cast("long"),
                F.greatest(
                    F.lit(0).cast("long"),
                    (
                        (c.cast("double") - F.lit(float(mn)))
                        / F.lit(float(mx) - float(mn))
                        * F.lit(float(top))
                    ).cast("long"),
                ),
            )
        else:
            q = F.lit(0).cast("long")
        quantized.append(q)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, q in enumerate(quantized):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftrightunsigned(q, i).bitwiseAND(F.lit(1).cast("long")),
                    i * k + j,
                )
            )
    return z


def zorder_by(
    df: DataFrame,
    cols: list[str],
    num_files: int | None = None,
    bits: int = 12,
) -> DataFrame:
    """Multi-column Z-order clustering — the Delta/Iceberg
    ``OPTIMIZE ... ZORDER BY`` equivalent for a plain parquet lake.

    ``cluster_by`` gives perfect skipping on ONE key and none on the
    others; interleaving the rank-normalized key bits makes every
    file/row-group cover a tight hyper-rectangle of the combined key
    space, so conjunctive predicates over ANY subset of ``cols`` skip
    row groups from the footer stats alone. At 100 TB this is the
    difference between a 2-dimensional slice (time x tenant, lang x
    quality bucket) scanning the whole store and scanning ~the slice.

    One bounded min/max agg (k columns, one row collected) calibrates
    the quantization and counts NULL keys — any NULL raises, because
    ``greatest(0, NULL)`` would silently quantize null-key rows to
    the z-origin, piling them into the min-corner files and breaking
    the tight-hyper-rectangle property (fill or filter nulls first).
    Numeric and timestamp columns cast to double directly. STRING
    (and binary) columns key on ``xxhash64`` of the value — hashing
    destroys order, so a string dimension supports EQUALITY pruning
    only (all rows of one tenant/lang co-locate into few row groups,
    whose footer min/max on the ORIGINAL string column then prune
    ``col = 'x'`` scans), not range predicates — the same contract
    Delta's ZORDER gives string columns.
    Returns the re-laid-out DataFrame — write with any writer."""
    if "__z" in df.columns:
        raise ValueError(
            "input already has a __z column - rename it before zorder_by"
        )
    dtypes = dict(df.dtypes)
    key_cols = [
        F.xxhash64(c).cast("double")
        if dtypes.get(c) in ("string", "binary")
        else F.col(c).cast("double")
        for c in cols
    ]
    # null check on the ORIGINAL columns: xxhash64(NULL) returns the
    # seed hash (a constant), so a null string would silently pass a
    # check on the derived key and co-locate with real values
    row = df.agg(
        *[F.min(c).alias(f"__mn{i}") for i, c in enumerate(key_cols)],
        *[F.max(c).alias(f"__mx{i}") for i, c in enumerate(key_cols)],
        *[
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nn{i}")
            for i, c in enumerate(cols)
        ],
    ).first()
    mins = [row[f"__mn{i}"] for i in range(len(cols))]
    maxs = [row[f"__mx{i}"] for i in range(len(cols))]
    nulls = {
        cols[i]: row[f"__nn{i}"]
        for i in range(len(cols))
        if row[f"__nn{i}"]
    }
    if nulls or any(v is None for v in mins + maxs):
        raise ValueError(
            f"zorder_by columns must be non-null numeric; null keys: "
            f"{nulls or cols}"
        )
    z = zorder_value(key_cols, mins, maxs, bits=bits)
    staged = df.withColumn("__z", z)
    parts = (
        staged.repartitionByRange(num_files, "__z")
        if num_files is not None
        else staged.repartitionByRange("__z")
    )
    return parts.sortWithinPartitions("__z").drop("__z")


def compact(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 << 20,
    cluster_cols: list[str] | None = None,
    method: str = "range",
) -> int:
    """Rewrite a many-small-files parquet store into ~target-sized
    files; optionally cluster by ``cluster_cols`` while at it (the
    rewrite pays the shuffle anyway, so clustering rides along free).
    ``method='range'`` (default) range-clusters — note that for
    multiple columns this is LEXICOGRAPHIC (tight ranges on the first
    key only); ``method='zorder'`` Morton-interleaves >= 2 columns so
    every written file covers a tight hyper-rectangle (see
    ``zorder_by``). Returns the number of parquet data files actually
    written (coalesce cannot split, so a source with fewer partitions
    than the requested count yields fewer files).

    Compaction is an OUT-OF-PLACE rewrite: ``out_path`` must differ
    from ``path`` (Spark refuses to overwrite a path it is reading,
    and failing mid-write in place would lose the store) — swap
    directories atomically at the catalog/orchestration layer after
    the rewrite lands.

    Requested file count = ceil(current bytes / target): sized from
    the Hadoop FileSystem listing, not a data scan.
    """
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(hconf)
    jout = jvm.org.apache.hadoop.fs.Path(out_path)
    if fs.makeQualified(jout).equals(fs.makeQualified(jpath)):
        raise ValueError(
            f"compact() is an out-of-place rewrite: out_path "
            f"{out_path!r} resolves to the source path — write to a "
            "sibling directory and swap after the rewrite lands"
        )
    if method not in ("range", "zorder"):
        raise ValueError("method must be 'range' or 'zorder'")
    total = fs.getContentSummary(jpath).getLength()
    n_files = max(1, -(-int(total) // int(target_file_bytes)))
    df = spark.read.parquet(path)
    if cluster_cols and method == "zorder":
        out = zorder_by(df, cluster_cols, num_files=n_files)
    elif cluster_cols:
        out = cluster_by(df, cluster_cols, num_files=n_files)
    else:
        out = df.coalesce(n_files)
    out.write.mode("overwrite").parquet(out_path)
    written = [
        s
        for s in fs.listStatus(fs.makeQualified(jout))
        if s.getPath().getName().endswith(".parquet")
    ]
    return len(written)

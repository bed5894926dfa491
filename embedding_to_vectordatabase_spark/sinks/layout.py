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

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_FLOAT_TYPES = ("float", "double")
_STRING_TYPES = ("string", "binary")
# integer Spark SQL types whose parquet footer min/max are exact and
# NaN-free — the only dtypes the compact() footer-calibration fast
# path accepts (parquet omits NaN from float stats, so a float column
# with NaNs can carry clean-looking footers; the agg path's NaN guard
# would be silently bypassed)
_FOOTER_SAFE_TYPES = ("tinyint", "smallint", "int", "bigint")


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


def _minmax_quant(c: Column, mn: float, mx: float, top: int) -> Column:
    """Rank-normalize a double column to [0, top] against its
    (min, max) — Spark's truncating double->long cast, clamped.
    Constant columns (min == max) quantize to 0 everywhere."""
    if mx > mn:
        return F.least(
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
    return F.lit(0).cast("long")


def _interleave(quantized: list[Column], bits: int) -> Column:
    """Morton bit-interleave: bit i of column j lands at position
    i*k + j. Pure native shift/or terms folded into one codegen'd
    long."""
    k = len(quantized)
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
    quantized = [
        _minmax_quant(c, mn, mx, top) for c, mn, mx in zip(cols, mins, maxs)
    ]
    return _interleave(quantized, bits)


def _rank_points(n_values: int, top: int) -> list[int]:
    """Evenly spaced quantized points for n distinct values: rank r
    maps to floor(r * top / (n-1)), so the top bits separate the
    values maximally (n values get ceil(log2 n) distinct leading
    bits). A single value maps to 0."""
    if n_values <= 1:
        return [0] * n_values
    return [r * top // (n_values - 1) for r in range(n_values)]


def zorder_by(
    df: DataFrame,
    cols: list[str],
    num_files: int | None = None,
    bits: int = 12,
    string_rank_cap: int = 1024,
    _bounds: tuple[list[float], list[float]] | None = None,
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
    the quantization and counts NULL and NaN keys — either raises,
    because ``greatest(0, NULL)`` would silently quantize null-key
    rows to the z-origin (and Spark's NaN-is-largest ordering would
    pile NaN rows into the max corner), breaking the
    tight-hyper-rectangle property (fill or filter them first).
    Numeric and timestamp columns cast to double directly.

    STRING (and binary) columns support EQUALITY pruning only —
    hashing destroys order, so range predicates on a string dim see
    no benefit (the same contract Delta's ZORDER gives strings):

    - **<= ``string_rank_cap`` distinct values** (the categorical
      case — tenant, lang, source): the distinct values are
      collected (bounded: one column-pruned distinct agg, <= cap
      rows), sorted in VALUE order, and re-quantized to EVENLY
      SPACED rank points, so n values get ceil(log2 n) distinct
      leading bits and the curve separates them at the shallowest
      possible file granularity. Two properties hash quantization
      lacks: (a) two frequent values can share their top hash bits
      by luck and then no file count splits them apart; (b) ranking
      in VALUE order makes co-located groups lexicographically
      contiguous, so the footer min/max of the original column stays
      tight — hash-order co-location leaves e.g. a {pl, it} row
      group spanning [it, pl], which false-hits every value between.
      Value rank even buys prefix-range pruning on the string dim as
      a side effect. The rank map is attached with a broadcast join
      (<= cap rows — no shuffle).
    - **> cap distinct values**: falls back to min/max-normalized
      ``xxhash64`` — at that cardinality each row group holds many
      distinct strings anyway, so footer equality pruning is weak
      regardless of layout.

    ``_bounds`` (internal, used by ``compact``'s parquet
    footer-calibration fast path) supplies pre-verified
    (mins, maxs) in key space and skips the calibration scan
    entirely — the caller is responsible for the null/NaN guarantee;
    only numeric dims are eligible (string dims always need the
    distinct-hash scan).

    Returns the re-laid-out DataFrame — write with any writer."""
    if len(cols) < 2:
        raise ValueError("zorder needs >= 2 columns (use cluster_by for 1)")
    if len(cols) * bits > 62:
        raise ValueError(f"{len(cols)} cols x {bits} bits exceeds a signed long")
    bad = [
        c
        for c in df.columns
        if c == "__z" or c.startswith("__zh") or c.startswith("__zq")
    ]
    if bad:
        raise ValueError(
            f"input columns {bad} collide with zorder_by's reserved "
            "__z/__zh*/__zq* helper names - rename them first"
        )
    dtypes = dict(df.dtypes)
    is_str = {c: dtypes.get(c) in _STRING_TYPES for c in cols}
    key_cols = [
        F.xxhash64(c).cast("double") if is_str[c] else F.col(c).cast("double")
        for c in cols
    ]
    top = (1 << bits) - 1
    rank_maps: dict[str, list[tuple[int, int]]] = {}

    if _bounds is not None:
        if any(is_str.values()):
            raise ValueError(
                "_bounds calibration does not support string/binary "
                "dims (they need the distinct-hash scan)"
            )
        mins, maxs = _bounds
    else:
        # null check on the ORIGINAL columns: xxhash64(NULL) returns
        # the seed hash (a constant), so a null string would silently
        # pass a check on the derived key. NaN check on float/double
        # originals: NaN is not NULL, and max() returns NaN, which
        # fails the mx > mn comparison and would silently route the
        # dimension to the constant-0 branch.
        aggs = [F.count(F.lit(1)).alias("__cnt")]
        for i, (c, kc) in enumerate(zip(cols, key_cols)):
            aggs.append(F.min(kc).alias(f"__mn{i}"))
            aggs.append(F.max(kc).alias(f"__mx{i}"))
            bad_key = F.col(c).isNull()
            if dtypes.get(c) in _FLOAT_TYPES:
                bad_key = bad_key | F.isnan(F.col(c))
            aggs.append(F.count(F.when(bad_key, 1)).alias(f"__nn{i}"))
            if is_str[c]:
                aggs.append(F.approx_count_distinct(c).alias(f"__d{i}"))
        row = df.agg(*aggs).first()
        if row["__cnt"] == 0:
            raise ValueError("zorder_by: input has no rows - nothing to cluster")
        nulls = {
            cols[i]: row[f"__nn{i}"]
            for i in range(len(cols))
            if row[f"__nn{i}"]
        }
        if nulls:
            raise ValueError(
                "zorder_by key columns must be non-null (NaN counts as "
                f"null for clustering); offending keys: {nulls}"
            )
        mins = [row[f"__mn{i}"] for i in range(len(cols))]
        maxs = [row[f"__mx{i}"] for i in range(len(cols))]
        if any(
            v is None or (isinstance(v, float) and math.isnan(v))
            for v in mins + maxs
        ):
            raise ValueError(
                f"zorder_by: non-finite calibration bounds for {cols} "
                f"(mins={mins}, maxs={maxs})"
            )
        # rank re-quantization for low-cardinality string dims: one
        # combined column-pruned agg collects the sorted distinct
        # VALUES (each <= string_rank_cap values, checked first via
        # approx_count_distinct so collect_set stays bounded)
        rank_idx = [
            i
            for i, c in enumerate(cols)
            if is_str[c] and row[f"__d{i}"] <= string_rank_cap
        ]
        if rank_idx:
            row2 = df.agg(
                *[
                    F.sort_array(F.collect_set(cols[i])).alias(f"__h{i}")
                    for i in rank_idx
                ]
            ).first()
            for i in rank_idx:
                values = row2[f"__h{i}"]
                points = _rank_points(len(values), top)
                rank_maps[cols[i]] = list(zip(values, points))

    staged = df
    spark = df.sparkSession
    quantized: list[Column] = []
    helper_cols: list[str] = []
    for i, (c, kc, mn, mx) in enumerate(zip(cols, key_cols, mins, maxs)):
        if c in rank_maps:
            mdf = spark.createDataFrame(
                rank_maps[c],
                schema=f"__zh{i} {dtypes[c]}, __zq{i} long",
            )
            staged = staged.join(
                F.broadcast(mdf),
                F.col(c) == F.col(f"__zh{i}"),
                "left",
            )
            helper_cols += [f"__zh{i}", f"__zq{i}"]
            # the left join cannot miss for deterministic inputs (the
            # map was built from the same df); a non-deterministic
            # source could desync - fail loud instead of silently
            # quantizing to the origin
            q = F.when(
                F.assert_true(
                    F.col(f"__zq{i}").isNotNull(),
                    F.lit(
                        f"zorder_by: string key {c!r} changed between "
                        "calibration and rewrite (non-deterministic input)"
                    ),
                ).isNull(),
                F.col(f"__zq{i}"),
            )
        else:
            q = _minmax_quant(kc, mn, mx, top)
        quantized.append(q)

    staged = staged.withColumn("__z", _interleave(quantized, bits))
    parts = (
        staged.repartitionByRange(num_files, "__z")
        if num_files is not None
        else staged.repartitionByRange("__z")
    )
    return parts.sortWithinPartitions("__z").drop("__z", *helper_cols)


def _footer_bounds(
    fs, jpath, cols: list[str], dtypes: dict[str, str]
) -> tuple[list[float], list[float]] | None:
    """Per-column (min, max) from the parquet footers of a LOCAL
    store, verifying null_count == 0 — the single-scan calibration
    path for ``compact(method='zorder')``. Metadata-only: reads ~KB
    of footer per file, never row data (embarrassingly
    parallelizable if the file count ever warrants it).

    Returns None (caller falls back to the calibration agg) when any
    dim is not an integer type (float stats silently omit NaN - see
    _FOOTER_SAFE_TYPES), the store is not on the local filesystem
    (pyarrow cannot open s3a/hdfs URIs the JVM can), or any column
    chunk lacks exact stats. Raises on null keys - same fail-loud
    contract as the agg path."""
    if any(dtypes.get(c) not in _FOOTER_SAFE_TYPES for c in cols):
        return None
    if fs.getUri().getScheme() != "file":
        return None
    import pyarrow.parquet as pq

    files = [
        s.getPath().toUri().getPath()
        for s in fs.listStatus(jpath)
        if s.getPath().getName().endswith(".parquet")
    ]
    if not files:
        return None
    mins: dict[str, int] = {}
    maxs: dict[str, int] = {}
    nulls: dict[str, int] = {}
    for f in files:
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            group = md.row_group(rg)
            seen = set()
            for ci in range(group.num_columns):
                chunk = group.column(ci)
                name = chunk.path_in_schema
                if name not in cols:
                    continue
                seen.add(name)
                st = chunk.statistics
                if (
                    st is None
                    or not st.has_min_max
                    or st.null_count is None
                ):
                    return None
                if st.null_count:
                    nulls[name] = nulls.get(name, 0) + st.null_count
                mins[name] = min(mins.get(name, st.min), st.min)
                maxs[name] = max(maxs.get(name, st.max), st.max)
            if seen != set(cols):
                return None  # schema drift across files
    if nulls:
        raise ValueError(
            "zorder_by key columns must be non-null (NaN counts as "
            f"null for clustering); offending keys: {nulls}"
        )
    return (
        [float(mins[c]) for c in cols],
        [float(maxs[c]) for c in cols],
    )


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

    For ``method='zorder'`` with all-integer dims on a local store,
    the min/max calibration comes from the parquet footers instead of
    a pre-scan (``_footer_bounds``) — the rewrite then reads the data
    exactly once; at 100 TB that halves the rewrite's read volume.
    ``compact.last_calibration`` records which path ran
    ('footers' / 'agg' / None).

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
    compact.last_calibration = None
    if cluster_cols and method == "zorder":
        bounds = _footer_bounds(
            fs, fs.makeQualified(jpath), cluster_cols, dict(df.dtypes)
        )
        compact.last_calibration = "footers" if bounds is not None else "agg"
        out = zorder_by(df, cluster_cols, num_files=n_files, _bounds=bounds)
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


compact.last_calibration = None

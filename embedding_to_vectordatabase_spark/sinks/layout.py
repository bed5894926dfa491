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
- **Compaction**: streaming/rotating ingest leaves many small files;
  scan cost at 1000 executors is dominated by file-open overhead once
  files drop below a few MB. Compaction rewrites a prefix-stable
  store into ~target-sized files.

Both are full rewrites of the paths they touch (plain parquet has no
in-place move); on a table format (Delta/Iceberg) the same calls map
to OPTIMIZE ... ZORDER / rewrite_data_files 1:1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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


def compact(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 << 20,
    cluster_cols: list[str] | None = None,
) -> int:
    """Rewrite a many-small-files parquet store into ~target-sized
    files; optionally range-cluster by ``cluster_cols`` while at it
    (the rewrite pays the shuffle anyway, so clustering rides along
    free). Returns the number of parquet data files actually written
    (coalesce cannot split, so a source with fewer partitions than
    the requested count yields fewer files).

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
    total = fs.getContentSummary(jpath).getLength()
    n_files = max(1, -(-int(total) // int(target_file_bytes)))
    df = spark.read.parquet(path)
    if cluster_cols:
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

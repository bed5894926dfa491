"""Sinks (reference K1-K9).

The reference hand-rolls a rotating parquet writer with per-file
min/max id stats and an ops-log (load_data/parquet_manager.py:320-444,
milvus_bulk_writer.py:297-413). In Spark:
- rotation          = ``maxRecordsPerFile`` (records) + AQE coalescing
                      / repartition (bytes)
- min/max id stats  = parquet footer statistics, free, and readable
                      back via the footer or a group-by (``file_stats``)
- ops log / resume  = the write job's commit protocol + streaming
                      checkpoints; no hand-rolled WAL
- MinIO upload (K4) = write straight to ``s3a://`` — no copy step
- bulk-insert (K5)  = a driver-side post-commit hook, outside the data
                      plane, polling the vector-DB import state
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_MAX_RECORDS_PER_FILE = 100_000  # milvus_bulk_writer.py default


def write_rotating_parquet(
    df: DataFrame,
    path: str,
    max_records_per_file: int = DEFAULT_MAX_RECORDS_PER_FILE,
    mode: str = "append",
    partition_by: list[str] | None = None,
) -> None:
    """K1/K2: size-bounded parquet segments. Works unchanged on
    s3a:// / hdfs:// destinations (K4 collapses into this)."""
    writer = df.write.mode(mode).option(
        "maxRecordsPerFile", str(max_records_per_file)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def file_stats(
    spark: SparkSession, path: str, id_col: str = "file_id"
) -> DataFrame:
    """A1/K3: per-output-file (file, record_count, min_id, max_id) —
    the BulkFileInfo bookkeeping read back from the data itself."""
    return (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(
            F.count("*").alias("record_count"),
            F.min(id_col).alias("min_id"),
            F.max(id_col).alias("max_id"),
        )
    )


def manager_stats(files: DataFrame) -> DataFrame:
    """A2: totals over the files-metadata frame."""
    return files.agg(
        F.count("*").alias("total_files"),
        F.sum("record_count").alias("total_records"),
        F.min("min_id").alias("global_min_id"),
        F.max("max_id").alias("global_max_id"),
    )


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) parquet table so
    repeated joins/aggregations on ``bucket_cols`` are co-located —
    both sides of a bucketed-bucketed equi-join scan matching buckets
    with NO shuffle exchange (verified in tests/test_sinks.py). This
    is the pre-partitioning story for the chunk store: bucket by
    file_id once at ingest, and every later dedup anti-join, point
    lookup, and per-file aggregation skips its shuffle."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def create_collection_if_not_exists(
    spark: SparkSession, path: str
) -> bool:
    """K9: collection + index DDL (milvus_connector.py:45-81) as the
    Spark-side equivalent — materialize an empty parquet store with the
    canonical 12-field CHUNK schema so readers see a stable schema from
    day one. The reference's FLAT/IP dense index IS our exact top-k
    scan, and SPARSE_INVERTED_INDEX/IP is the posexploded relational
    form (operators.search) — neither needs a stored artifact. Returns
    True when the collection was created, False when it already existed.
    """
    from ..schemas import CHUNK_SCHEMA

    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(hconf)
    if fs.exists(jpath):
        return False
    spark.createDataFrame([], CHUNK_SCHEMA).write.parquet(path)
    return True


class VectorDBBulkLoader:
    """K5: post-commit bulk-insert trigger with completion polling.

    ``do_import`` submits the written files to the vector DB and
    returns a task id; ``get_state`` returns 'Completed' | 'Failed' |
    anything else (pending). Both are injected so tests use an
    in-memory fake and production wires the real client — the poll
    loop (5 s interval / 600 s timeout, milvus_connector.py:189-206)
    is what's verified here.
    """

    def __init__(
        self,
        do_import: Callable[[list[str]], str],
        get_state: Callable[[str], str],
        poll_interval_s: float = 5.0,
        timeout_s: float = 600.0,
    ):
        self.do_import = do_import
        self.get_state = get_state
        self.poll_interval_s = poll_interval_s
        self.timeout_s = timeout_s

    def load(self, files: list[str]) -> bool:
        task_id = self.do_import(files)
        deadline = time.monotonic() + self.timeout_s
        while time.monotonic() < deadline:
            state = self.get_state(task_id)
            if state == "Completed":
                return True
            if state == "Failed":
                return False
            time.sleep(self.poll_interval_s)
        return False


class FileHandoff:
    """K3/O5: the full-file registry + handoff protocol.

    The reference tracks which bulk files are complete, pops at most
    ``max_return_files`` per poll, logs the handoff, and never returns
    the same file twice (milvus_bulk_writer.py:415-493,
    parquet_manager.py:459-510). Here the "registry" is the sink
    directory itself (part files are complete by Spark's commit
    protocol) plus a handoff log the poller owns; pop → upload/bulk-
    insert (VectorDBBulkLoader) → mark. At-least-once: a crash between
    pop and mark re-offers the same files on the next poll, and the
    downstream bulk insert is idempotent (unique object names,
    milvus_connector.py:124).
    """

    def __init__(
        self,
        spark: SparkSession,
        sink_dir: str,
        log_path: str,
        max_return_files: int = 2,  # reference default (config.json:55)
    ):
        self.spark = spark
        self.sink_dir = sink_dir
        self.log_path = log_path
        self.max_return_files = max_return_files

    def _fs(self, path: str):
        jvm = self.spark.sparkContext._jvm
        hconf = self.spark.sparkContext._jsc.hadoopConfiguration()
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        return jpath.getFileSystem(hconf), jpath

    def _list_parts(self) -> list[str]:
        fs, jpath = self._fs(self.sink_dir)
        if not fs.exists(jpath):
            return []
        out = []
        it = fs.listFiles(jpath, True)
        while it.hasNext():
            f = it.next()
            name = f.getPath().getName()
            if name.startswith("part-") and not name.endswith(".crc"):
                out.append(f.getPath().toString())
        return sorted(out)

    def _handled(self) -> set[str]:
        fs, jpath = self._fs(self.log_path)
        if not fs.exists(jpath):
            return set()
        return {
            r["file"]
            for r in self.spark.read.json(self.log_path).collect()
        }

    def pop_full_files(self) -> list[str]:
        """Up to ``max_return_files`` complete, not-yet-handed-off
        files (O3 ordering: sorted)."""
        handled = self._handled()
        fresh = [f for f in self._list_parts() if f not in handled]
        return fresh[: self.max_return_files]

    def mark_handled(self, files: list[str]) -> None:
        """Append the handoff record (the reference's operations log)."""
        if not files:
            return
        self.spark.createDataFrame(
            [(f,) for f in files], "file string"
        ).coalesce(1).write.mode("append").json(self.log_path)

    def drain(self, handle) -> int:
        """Poll-pop-handle-mark until no fresh files remain (ST5 drain
        protocol). ``handle(files) -> bool``; files are only marked on
        success. Returns the number of files handed off."""
        n = 0
        while True:
            batch = self.pop_full_files()
            if not batch:
                return n
            if not handle(batch):
                raise RuntimeError(f"handoff failed for {batch}")
            self.mark_handled(batch)
            n += len(batch)


def drop_collection(spark: SparkSession, path: str) -> bool:
    """K8: drop the whole collection — delete the parquet store path
    (vector_database/milvus_connector.py:185-187). Goes through the
    Hadoop FileSystem API so it works on file:// / hdfs:// / s3a://
    alike. Returns True when the path existed and was removed."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(hconf)
    return bool(fs.delete(jpath, True))


def delete_where(
    spark: SparkSession, path: str, predicate: str, out_path: str
) -> None:
    """K7: DELETE WHERE (milvus_connector.py:180-183) as an anti-filter
    rewrite of the parquet store.

    Design decision (final for this environment, checked r3): neither
    Delta nor Iceberg jars ship in this container, so the in-place
    variant cannot be exercised. The rewrite IS the correct plain-
    parquet semantics and scales: the filter pushes to the scan, the
    rewrite is map-only (no shuffle), and on a partitioned production
    store you would rewrite only the partitions the predicate touches
    (partition pruning makes untouched data a no-op). On a Delta/
    Iceberg deployment the same call maps to
    ``DELETE FROM t WHERE pred`` 1:1."""
    spark.read.parquet(path).filter(f"NOT ({predicate})").write.mode(
        "overwrite"
    ).parquet(out_path)


def delete_where_partitioned(
    spark: SparkSession,
    path: str,
    predicate: str,
    partition_cols: list[str],
) -> int:
    """K7 at scale: in-place DELETE WHERE on a ``partitionBy`` parquet
    store that rewrites ONLY the partitions the predicate touches.

    Plan: (1) find touched partition values (partition-pruned scan when
    the predicate constrains the partition columns); (2) keep-rows =
    surviving rows of touched partitions only (left-semi against the
    tiny touched set, broadcast); (3) commit via dynamic partition
    overwrite, so untouched partitions' files are never read, written,
    or moved; (4) partitions whose rows ALL matched the predicate
    produce no output under dynamic overwrite, so their directories
    are removed explicitly through the Hadoop FS API.

    DELETE semantics are SQL-standard: rows where the predicate is
    TRUE are removed; FALSE and NULL rows survive. The keep-set is
    local-checkpointed before the write because Spark refuses an
    overwrite of a path the plan still reads — bounded by the touched
    partitions' volume, not the store (a table format would avoid the
    materialization; see ``delete_where`` for the environment
    decision). Returns the number of touched partitions.
    """
    import functools
    import operator

    pred = F.expr(predicate)
    store = spark.read.parquet(path)
    touched = (
        store.filter(pred).select(*partition_cols).distinct().collect()
    )
    if not touched:
        return 0
    touched_df = spark.createDataFrame(
        touched, store.select(*partition_cols).schema
    )
    # null-safe equality: a NULL partition value must match itself,
    # else the NULL partition's surviving rows never enter the keep
    # set and the final directory delete would drop them with the
    # deleted rows
    semi_cond = functools.reduce(
        operator.and_,
        [store[c].eqNullSafe(touched_df[c]) for c in partition_cols],
    )
    keep = (
        store.join(F.broadcast(touched_df), semi_cond, "left_semi")
        .filter(~F.coalesce(pred, F.lit(False)))
        # partition columns must come last for partitionBy layout
        .select(
            *[c for c in store.columns if c not in partition_cols],
            *partition_cols,
        )
        .localCheckpoint()
    )
    survivors = {
        tuple(r) for r in keep.select(*partition_cols).distinct().collect()
    }
    mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        keep.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", mode)
    # drop directories of fully-deleted partitions (no rows written).
    # Directories are resolved by LISTING the store and unescaping the
    # on-disk names — never by formatting values into paths: the
    # writer Hive-escapes specials (space, ':', '/', '%', ... become
    # %XX) and spells NULL as __HIVE_DEFAULT_PARTITION__, so a naive
    # f"{col}={value}" misses those partitions and their rows would
    # silently survive the DELETE.
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(hconf)
    for values in touched:
        if tuple(values) in survivors:
            continue
        cur = root
        for c, v in zip(partition_cols, tuple(values)):
            want = _partition_value_str(v)
            nxt = None
            for status in fs.listStatus(cur):
                name = status.getPath().getName()
                col, sep, raw = name.partition("=")
                if not sep or col != c:
                    continue
                got = (
                    None
                    if raw == _HIVE_NULL_PARTITION
                    else _unescape_path_name(raw)
                )
                if got == want:
                    nxt = status.getPath()
                    break
            if nxt is None:
                # The touched set came from reading this store, so a
                # fully-deleted partition's directory MUST exist (the
                # dynamic overwrite never writes it). A miss means the
                # value→directory-name match failed and the stale
                # directory would resurrect its rows on the next read
                # — fail loudly rather than leave it behind.
                raise IOError(
                    f"partition directory for {c}={want!r} not found "
                    f"under {cur}: refusing to leave a fully-deleted "
                    "partition on disk"
                )
            cur = nxt
        fs.delete(cur, True)
    return len(touched)


_HIVE_NULL_PARTITION = "__HIVE_DEFAULT_PARTITION__"


def _partition_value_str(v) -> str | None:
    """The string Spark's partitioned writer spells a value as in the
    directory name (before escaping); None for NULL/empty, which both
    land in __HIVE_DEFAULT_PARTITION__.

    Only string/int/bool/date partition columns are supported: their
    Python str() matches Spark's directory spelling exactly. Float/
    decimal/timestamp spellings diverge (Python '1e-07' vs Spark
    '1.0E-7'), and a mismatch here would silently leave a fully-
    deleted partition directory in place — its rows resurrecting on
    the next read — so unsupported types raise instead."""
    import datetime

    if v is None or v == "":
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int) or (
        isinstance(v, datetime.date)
        and not isinstance(v, datetime.datetime)
    ) or isinstance(v, str):
        return str(v)
    raise TypeError(
        f"unsupported partition-column value {v!r} "
        f"({type(v).__name__}): directory-name matching is defined "
        "for string/int/bool/date partition values only"
    )


def _unescape_path_name(name: str) -> str:
    """Inverse of Hive/Spark escapePathName: %XX → the escaped char."""
    from urllib.parse import unquote

    return unquote(name)


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_col: str,
    out_path: str,
) -> dict[str, int]:
    """MERGE (upsert) on the plain-parquet store: rows in ``updates``
    replace target rows with the same key; new keys are inserted —
    the maintenance op incremental ingestion needs between full
    rebuilds (pairs with ``delete_where``/``snapshot_diff``).

    Same design decision as ``delete_where`` (no Delta/Iceberg jars in
    this container): the rewrite IS plain-parquet MERGE semantics, and
    it scales — survivors are a LEFT ANTI join of the target against
    the (small) update key set, which broadcasts, so the target never
    shuffles; on a partitioned store you would rewrite only touched
    partitions; on Delta/Iceberg the same call maps to MERGE INTO 1:1.
    The caller owns key uniqueness within ``updates`` (duplicates are
    written as given). Returns {"updated", "inserted", "survivors"}:
    ``updated`` counts target ROWS replaced (equals matched keys when
    target keys are unique), ``inserted`` counts update KEYS absent
    from the target. ``updates`` is persisted for the call — its
    lineage (in the incremental-ingest pairing, the chunk+embed plan,
    the cost center) executes once; every stat afterwards is a cheap
    scan of the target or the written output, never a re-run of the
    update lineage.
    """
    target = spark.read.parquet(path)
    updates = updates.persist()
    try:
        keys = updates.select(key_col).distinct()
        survivors = target.join(F.broadcast(keys), key_col, "left_anti")
        survivors.unionByName(updates).write.mode("overwrite").parquet(
            out_path
        )
        n_target = target.count()
        touched = target.join(F.broadcast(keys), key_col, "left_semi")
        replaced = touched.count()
        # matched keys derived from the (small) replaced subset — the
        # corpus-sized target key stream never shuffles for stats
        matched_keys = touched.select(key_col).distinct().count()
        n_keys = keys.count()
    finally:
        updates.unpersist()
    return {
        "updated": replaced,
        "inserted": n_keys - matched_keys,
        "survivors": n_target - replaced,
    }

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
    """K7: DELETE WHERE as an anti-filter rewrite of the parquet store
    (a table format — Delta/Iceberg — would do this in-place; neither
    jar ships in this container)."""
    spark.read.parquet(path).filter(f"NOT ({predicate})").write.mode(
        "overwrite"
    ).parquet(out_path)

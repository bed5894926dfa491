"""SparkSession factory.

Local test profile mirrors what a 1000-executor cluster profile would
set per-executor; shuffle partitions and Arrow batch sizes are the two
knobs the reference hand-rolled (thread counts / HTTP batch sizes,
reference embed_to_milvus.py:320-322, embedding_model/tei_req.py:12)
that become Spark configs here.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow record-batch size bounds the rows a Python stage (embedder,
# chunker) sees per call — the analogue of the reference's HTTP batch
# of 64 texts (embedding_model/tei_req.py:12) scaled for vector width.
ARROW_BATCH_ROWS = 2048


def get_spark(
    app_name: str = "embedding_to_vectordatabase_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_BATCH_ROWS),
        )
        # parquet scans: split files so 32 threads all get work at sf0.1
        .config("spark.sql.files.maxPartitionBytes", "64m")
        # write timestamps as INT64 TIMESTAMP_MICROS, not legacy INT96:
        # INT96 row groups carry no usable min/max stats, so every
        # ts-predicate scan over files WE wrote would read every row
        # group (no data skipping), and modern readers treat INT96 as
        # deprecated anyway
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # HotSpot refuses to JIT methods over 8000 bytecodes
        # (DontCompileHugeMethods), so a generated method past that
        # runs interpreted with wildly variable latency (measured
        # 3-78 s run-to-run on simhash's packed-lane vote aggregate).
        # Falling back to non-codegen at exactly that limit keeps
        # every compiled stage compiled and the too-wide ones
        # predictable (SPARK-21871 rationale).
        .config("spark.sql.codegen.hugeMethodLimit", "8000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        # bucketed tables (co-located joins) live outside the repo tree
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/spark_warehouse"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

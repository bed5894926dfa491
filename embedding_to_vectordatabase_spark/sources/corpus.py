"""Corpus sources (reference S1-S10).

- JSONL corpus scan with explicit schema (S1) + row-range restriction
  (S2, intended inclusive semantics — the reference's polars
  offset/length slice bug is NOT replicated; SURVEY §7 quirk list)
- whole-file text scan (S5, the HDFS reader) via ``wholetext``
- JDBC registry scan (S7-S9): one relation instead of per-row SELECTs;
  Spark's JDBC source owns pooling/pushdown
- synthetic corpus generator (S10)

The reference's prefetch cache + batch iterator (S3/S6) disappear:
Spark's task scheduler and file-split planning are those operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import derive_file_name
from ..schemas import DOC_SCHEMA


def read_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """S1: newline-delimited JSON with the DOC schema (no inference)."""
    return spark.read.schema(DOC_SCHEMA).json(path)


def with_row_numbers(
    df: DataFrame, order_by: list[str], out_col: str = "row_no"
) -> DataFrame:
    """W1: deterministic global row numbering (1-based). The reference
    numbered rows by thread arrival order; a stable sort key makes it
    reproducible. Global Window = single-partition sort — fine for
    dimension-scale inputs; at fact scale prefer
    ``monotonically_increasing_id`` or zipWithIndex-style offsets."""
    w = Window.orderBy(*[F.col(c) for c in order_by])
    return df.withColumn(out_col, F.row_number().over(w))


def with_row_numbers_scalable(
    df: DataFrame,
    order_by: list[str],
    out_col: str = "row_no",
    num_buckets: int = 256,
) -> DataFrame:
    """W1 at fact scale: deterministic unique 1..N numbering with NO
    single-partition exchange.

    Two-phase rank: rows hash into ``num_buckets`` buckets, each bucket
    sorts locally (parallel), and a tiny cumulative-offset table (one
    row per bucket — the only global sort, over <=num_buckets rows) is
    broadcast back. The numbering is a deterministic bijection of the
    input (same data ⇒ same numbers) but NOT the global sort order of
    ``order_by`` — the reference's own numbering was thread-arrival
    order (load_data/json_batch_reader.py:31,69-77), so uniqueness +
    determinism is the contract, not sortedness. Use
    ``with_row_numbers`` when global order matters on dimension-scale
    input."""
    cols = [F.col(c) for c in order_by]
    bucket = F.pmod(F.xxhash64(*cols), F.lit(num_buckets)).cast("int")
    local_w = Window.partitionBy("__bucket").orderBy(*cols)
    local = df.withColumn("__bucket", bucket).withColumn(
        "__lrn", F.row_number().over(local_w)
    )
    # per-bucket counts → exclusive prefix sums; num_buckets rows total
    off_w = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        local.groupBy("__bucket")
        .agg(F.count("*").alias("__cnt"))
        .withColumn("__off", F.coalesce(F.sum("__cnt").over(off_w), F.lit(0)))
        .drop("__cnt")
    )
    return (
        local.join(F.broadcast(offsets), "__bucket")
        .withColumn(out_col, (F.col("__off") + F.col("__lrn")).cast("long"))
        .drop("__bucket", "__lrn", "__off")
    )


def row_range(
    df: DataFrame, start: int, end: int, row_col: str = "row_no"
) -> DataFrame:
    """S2: rows start..end inclusive, 1-based (the docstring semantics
    of json_batch_reader.py:17-21)."""
    return df.filter(
        (F.col(row_col) >= start) & (F.col(row_col) <= end)
    )


def with_file_name(
    df: DataFrame, row_col: str = "row_no", title_col: str = "title"
) -> DataFrame:
    """S4: file_name = clean_title(title) + '_' + row_no + '.pdf'."""
    return df.withColumn(
        "file_name", derive_file_name(F.col(title_col), F.col(row_col))
    )


def read_whole_files(spark: SparkSession, paths: str) -> DataFrame:
    """S5: one row per file (path, content, word_count) — the HDFS
    whole-file reader; works on any Hadoop FS scheme incl. hdfs://."""
    return (
        spark.read.text(paths, wholetext=True)
        .withColumn("file_path", F.input_file_name())
        .select(
            "file_path",
            F.col("value").alias("content"),
            F.length("value").alias("word_count"),
        )
    )


def read_registry_jdbc(
    spark: SparkSession,
    url: str,
    table: str = "knowledge_document_library",
    num_partitions: int = 8,
    **options,
) -> DataFrame:
    """S7-S9: the MySQL registry as one JDBC relation. Filters like
    ``konwledge_base_id = ?`` and projections push down to the DB;
    the JDBC source owns connection pooling (mysql_connector.py:11-26
    equivalent)."""
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("numPartitions", str(num_partitions))
        .option("fetchsize", "1000")
        .options(**options)
        .load()
    )


def generate_corpus(
    spark: SparkSession, n: int, title_prefix: str = "Title"
) -> DataFrame:
    """S10: synthetic JSONL-shaped corpus (generate_jsonl.py:3-13)."""
    return spark.range(n).select(
        F.concat(F.lit(f"{title_prefix} "), F.col("id")).alias("title"),
        F.lit("2025-04-27").alias("pub_time"),
        F.lit("synthetic").alias("source"),
        F.concat(
            F.lit("这是一个测试文档。编号"),
            F.col("id"),
            F.lit("，用于测试向量数据库的批量插入功能。"),
        ).alias("content"),
    )

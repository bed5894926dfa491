"""applyInPandasWithState operators: first-seen dedup with state that
survives micro-batches AND restarts (checkpointed state store),
running per-key totals in update mode."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from embedding_to_vectordatabase_spark.streaming.stateful import (
    dedup_stream_stateful,
    running_counts_stateful,
)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("file_id", T.LongType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)


def _write(src: str, name: str, rows: list[dict]) -> None:
    with open(os.path.join(src, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run_dedup(spark, src, out, ckpt):
    stream = spark.readStream.schema(EVENT_SCHEMA).json(src)
    q = (
        dedup_stream_stateful(stream, "file_id")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stateful_dedup_across_batches_and_restarts(spark, tmp_path):
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    os.makedirs(src)
    _write(src, "a.jsonl", [
        {"file_id": 1, "user_id": 10, "value": 1.0},
        {"file_id": 1, "user_id": 11, "value": 2.0},   # in-batch dup
        {"file_id": 2, "user_id": 12, "value": 3.0},
    ])
    _run_dedup(spark, src, out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == 2
    assert {r["file_id"] for r in got.collect()} == {1, 2}

    # restart with a new file: key 1 is remembered by the state store
    _write(src, "b.jsonl", [
        {"file_id": 1, "user_id": 13, "value": 4.0},   # cross-run dup
        {"file_id": 3, "user_id": 14, "value": 5.0},
    ])
    _run_dedup(spark, src, out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == 3
    assert {r["file_id"] for r in got.collect()} == {1, 2, 3}


def test_stateful_dedup_batch_degradation(spark):
    df = spark.createDataFrame(
        [(1, 10, 1.0), (1, 11, 2.0), (2, 12, 3.0)], EVENT_SCHEMA
    )
    out = dedup_stream_stateful(df, "file_id")
    assert out.count() == 2
    assert {r["file_id"] for r in out.collect()} == {1, 2}


def test_running_counts_stateful_stream(spark, tmp_path):
    src, ckpt = str(tmp_path / "src2"), str(tmp_path / "ckpt2")
    os.makedirs(src)
    _write(src, "a.jsonl", [
        {"file_id": 1, "user_id": 10, "value": 1.5},
        {"file_id": 2, "user_id": 10, "value": 2.5},
        {"file_id": 3, "user_id": 20, "value": 4.0},
    ])
    stream = spark.readStream.schema(EVENT_SCHEMA).json(src)
    q = (
        running_counts_stateful(stream, "user_id", "value")
        .writeStream.format("memory")
        .queryName("running_counts")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM running_counts").collect()
    }
    assert got[10] == (2, 4.0)
    assert got[20] == (1, 4.0)


def test_running_counts_batch_degradation(spark):
    df = spark.createDataFrame(
        [(1, 10, 1.5), (2, 10, 2.5)], EVENT_SCHEMA
    )
    got = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in running_counts_stateful(df, "user_id", "value").collect()
    }
    assert got[10] == (2, 4.0)

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


DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)

_TXT_A = (
    "the quick brown fox jumps over the lazy dog while the cat "
    "watches from the warm windowsill"
)
_TXT_B = "completely different prose about spark shuffles and partitions"
_TXT_C = "yet another unrelated document mentioning vector databases only"


def _run_minhash(spark, src, out, ckpt):
    from embedding_to_vectordatabase_spark.streaming.stateful import (
        minhash_collisions_stateful,
    )

    stream = spark.readStream.schema(DOC_SCHEMA).json(src)
    q = (
        minhash_collisions_stateful(stream, "text", "doc_id")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_minhash_dedup_stream_survives_restart(spark, tmp_path):
    """VERDICT r5 item 7: band-signature state lives in the state
    store — a restarted query still recognizes near-dups of documents
    from BEFORE the restart, without re-joining history."""
    from embedding_to_vectordatabase_spark.streaming.stateful import (
        minhash_dedup_reduce,
    )

    src, out, ckpt = (
        str(tmp_path / "src"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    os.makedirs(src)
    _write(src, "a.jsonl", [
        {"doc_id": 1, "text": _TXT_A},
        {"doc_id": 2, "text": _TXT_B},
        {"doc_id": 3, "text": _TXT_A},   # in-batch near-dup of 1
    ])
    _run_minhash(spark, src, out, ckpt)
    verdicts = minhash_dedup_reduce(spark.read.parquet(out))
    got = {r["doc_id"]: r["is_dup"] for r in verdicts.collect()}
    assert got == {1: False, 2: False, 3: True}

    # restart with new docs: doc 4 duplicates doc 1 ACROSS the
    # restart — only the checkpointed band state can know that
    _write(src, "b.jsonl", [
        {"doc_id": 4, "text": _TXT_A},
        {"doc_id": 5, "text": _TXT_C},
    ])
    _run_minhash(spark, src, out, ckpt)
    verdicts = minhash_dedup_reduce(spark.read.parquet(out))
    got = {r["doc_id"]: r["is_dup"] for r in verdicts.collect()}
    assert got == {1: False, 2: False, 3: True, 4: True, 5: False}


def test_minhash_collisions_batch_degradation(spark):
    """Batch form: claimant = min doc_id per bucket — matches the
    oracle SQL's window form."""
    from embedding_to_vectordatabase_spark.streaming.stateful import (
        minhash_collisions_stateful,
        minhash_dedup_reduce,
    )

    df = spark.createDataFrame(
        [(1, _TXT_A), (2, _TXT_B), (3, _TXT_A)], DOC_SCHEMA
    )
    got = {
        r["doc_id"]: r["is_dup"]
        for r in minhash_dedup_reduce(
            minhash_collisions_stateful(df)
        ).collect()
    }
    assert got == {1: False, 2: False, 3: True}


def test_running_counts_batch_degradation(spark):
    df = spark.createDataFrame(
        [(1, 10, 1.5), (2, 10, 2.5)], EVENT_SCHEMA
    )
    got = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in running_counts_stateful(df, "user_id", "value").collect()
    }
    assert got[10] == (2, 4.0)

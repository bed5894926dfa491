"""Sinks: rotating parquet (K1), per-file stats readback (A1/K3),
manager totals (A2), bulk-load poll loop (K5), delete-where rewrite
(K7), drop collection (K8)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from embedding_to_vectordatabase_spark.sinks.parquet_sink import (
    FileHandoff,
    VectorDBBulkLoader,
    create_collection_if_not_exists,
    delete_where,
    drop_collection,
    file_stats,
    manager_stats,
    write_bucketed_table,
    write_rotating_parquet,
)


@pytest.fixture()
def store(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id").alias("file_id"), (F.col("id") * 2).alias("v")
    )
    path = str(tmp_path / "chunks")
    write_rotating_parquet(df, path, max_records_per_file=30)
    return path


def test_rotation_caps_records_per_file(spark, store):
    stats = file_stats(spark, store).collect()
    assert sum(r["record_count"] for r in stats) == 100
    assert all(r["record_count"] <= 30 for r in stats)
    assert len(stats) >= 4  # 100 rows / cap 30


def test_file_stats_min_max(spark, store):
    for r in file_stats(spark, store).collect():
        assert r["min_id"] <= r["max_id"]


def test_manager_stats_totals(spark, store):
    total = manager_stats(file_stats(spark, store)).first()
    assert total["total_records"] == 100
    assert total["global_min_id"] == 0
    assert total["global_max_id"] == 99


def test_bulk_loader_poll_loop():
    states = iter(["Pending", "Pending", "Completed"])
    seen = []
    loader = VectorDBBulkLoader(
        do_import=lambda files: seen.append(files) or "task-1",
        get_state=lambda tid: next(states),
        poll_interval_s=0.01,
        timeout_s=5,
    )
    assert loader.load(["f1.parquet"]) is True
    assert seen == [["f1.parquet"]]

    loader_fail = VectorDBBulkLoader(
        do_import=lambda files: "t2",
        get_state=lambda tid: "Failed",
        poll_interval_s=0.01,
        timeout_s=5,
    )
    assert loader_fail.load(["f2.parquet"]) is False


def test_delete_where_rewrite(spark, store, tmp_path):
    out = str(tmp_path / "after_delete")
    delete_where(spark, store, "file_id < 50", out)
    left = spark.read.parquet(out)
    assert left.count() == 50
    assert left.agg(F.min("file_id")).first()[0] == 50


def test_delete_where_partitioned_rewrites_only_touched(spark, tmp_path):
    """In-place partitioned delete: untouched partitions' files are
    byte-identical (never rewritten), a fully-deleted partition's
    directory disappears, NULL-predicate rows survive."""
    import glob
    import os

    from embedding_to_vectordatabase_spark.sinks.parquet_sink import (
        delete_where_partitioned,
    )

    path = str(tmp_path / "pstore")
    rows = [(i, ["a", "b", "c"][i % 3], float(i) if i % 10 else None)
            for i in range(90)]
    df = spark.createDataFrame(rows, "id long, part string, v double")
    df.write.partitionBy("part").parquet(path)

    untouched_files = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{path}/part=c/*.parquet")
    }
    assert untouched_files

    # deletes: all of part=a (ids ≡ 0 mod 3 → v NULL for ids ≡ 0 mod 30
    # stays: predicate NULL must NOT delete), part of part=b
    n = delete_where_partitioned(
        spark, path, "(part = 'a' AND v IS NOT NULL) OR (part = 'b' AND id < 30)",
        ["part"],
    )
    assert n == 2
    left = spark.read.parquet(path)
    # part=a survivors: ids 0,30,60 (v NULL); part=b: ids >= 30; part=c: all 30
    got = {(r["part"], r["id"]) for r in left.collect()}
    assert {p for p, _ in got} == {"a", "b", "c"}
    assert {i for p, i in got if p == "a"} == {0, 30, 60}
    assert all(i >= 30 for p, i in got if p == "b")
    assert len([1 for p, _ in got if p == "c"]) == 30
    # untouched partition: same files, same mtimes
    assert {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{path}/part=c/*.parquet")
    } == untouched_files


def test_delete_where_partitioned_drops_empty_partition(spark, tmp_path):
    from embedding_to_vectordatabase_spark.sinks.parquet_sink import (
        delete_where_partitioned,
    )

    path = str(tmp_path / "pstore2")
    spark.createDataFrame(
        [(i, "x" if i < 5 else "y") for i in range(10)],
        "id long, part string",
    ).write.partitionBy("part").parquet(path)
    assert delete_where_partitioned(spark, path, "part = 'x'", ["part"]) == 1
    import os

    assert not os.path.exists(f"{path}/part=x")
    left = spark.read.parquet(path)
    assert left.count() == 5
    assert {r["part"] for r in left.collect()} == {"y"}


def test_delete_where_partitioned_escaped_and_null_partitions(
    spark, tmp_path
):
    """Hive-escaped (':' → %3A) and NULL (__HIVE_DEFAULT_PARTITION__)
    partition directories: deleted rows must actually be gone — both
    when the whole partition empties (directory removal must resolve
    the escaped/NULL names) and when survivors remain in the NULL
    partition (the keep-join must be null-safe)."""
    from embedding_to_vectordatabase_spark.sinks.parquet_sink import (
        delete_where_partitioned,
    )

    path = str(tmp_path / "pstore3")
    rows = (
        [(i, "ts:2024") for i in range(10)]       # escaped name
        + [(i, None) for i in range(10, 20)]      # NULL partition
        + [(i, "plain") for i in range(20, 30)]   # untouched control
    )
    spark.createDataFrame(rows, "id long, part string").write.partitionBy(
        "part"
    ).parquet(path)

    # empties the escaped partition entirely; halves the NULL partition
    n = delete_where_partitioned(
        spark, path, "part = 'ts:2024' OR (part IS NULL AND id < 15)",
        ["part"],
    )
    assert n == 2
    left = spark.read.parquet(path)
    got = {(r["id"], r["part"]) for r in left.collect()}
    # escaped partition fully gone — including its directory
    assert not any(p == "ts:2024" for _, p in got)
    import glob

    assert not glob.glob(f"{path}/part=ts*")
    # NULL partition: deleted ids gone, survivors intact
    assert {i for i, p in got if p is None} == set(range(15, 20))
    # untouched partition intact
    assert {i for i, p in got if p == "plain"} == set(range(20, 30))


def test_create_collection_ddl(spark, tmp_path):
    from embedding_to_vectordatabase_spark.schemas import CHUNK_SCHEMA

    path = str(tmp_path / "collection")
    assert create_collection_if_not_exists(spark, path) is True
    assert create_collection_if_not_exists(spark, path) is False
    got = spark.read.parquet(path)
    # parquet reads back nullable; names/types must match exactly
    assert got.schema.simpleString() == CHUNK_SCHEMA.simpleString()
    assert got.count() == 0


def test_file_handoff_pop_cap_and_no_repeat(spark, store, tmp_path):
    ho = FileHandoff(
        spark, store, str(tmp_path / "handoff_log"), max_return_files=2
    )
    first = ho.pop_full_files()
    assert 0 < len(first) <= 2  # O5 cap
    ho.mark_handled(first)
    second = ho.pop_full_files()
    assert not set(first) & set(second)  # never re-offered after mark


def test_file_handoff_reoffers_unmarked(spark, store, tmp_path):
    """Crash between pop and mark ⇒ the same files come back
    (at-least-once, idempotent downstream)."""
    ho = FileHandoff(
        spark, store, str(tmp_path / "handoff_log2"), max_return_files=2
    )
    a = ho.pop_full_files()
    b = ho.pop_full_files()  # no mark in between
    assert a == b


def test_file_handoff_drain_all(spark, store, tmp_path):
    ho = FileHandoff(
        spark, store, str(tmp_path / "handoff_log3"), max_return_files=2
    )
    seen: list[str] = []
    n = ho.drain(lambda files: seen.extend(files) or True)
    assert n == len(seen) == len(set(seen))
    assert ho.pop_full_files() == []  # fully drained
    assert n >= 4  # the 100-row/30-cap store has >= 4 part files


def test_bucketed_join_has_no_shuffle(spark):
    """The co-location contract: joining two tables bucketed on the
    same key scans matching buckets directly — zero shuffle exchanges
    in the physical plan."""
    left = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    write_bucketed_table(left, "t_bleft", ["k"], num_buckets=8)
    write_bucketed_table(right, "t_bright", ["k"], num_buckets=8)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("t_bleft").join(spark.table("t_bright"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert joined.count() == 1000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_bleft")
        spark.sql("DROP TABLE IF EXISTS t_bright")


def test_drop_collection(spark, store):
    assert os.path.exists(store)
    assert drop_collection(spark, store) is True
    assert not os.path.exists(store)
    assert drop_collection(spark, store) is False  # already gone


def test_merge_upsert_replaces_and_inserts(spark, tmp_path):
    from embedding_to_vectordatabase_spark.sinks.parquet_sink import (
        merge_upsert,
    )

    tgt = str(tmp_path / "t")
    out = str(tmp_path / "o")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    ).write.parquet(tgt)
    updates = spark.createDataFrame(
        [(2, "B2"), (4, "d")], "id long, v string"
    )
    stats = merge_upsert(spark, tgt, updates, "id", out)
    assert stats == {"updated": 1, "inserted": 1, "survivors": 2}
    got = {
        r["id"]: r["v"] for r in spark.read.parquet(out).collect()
    }
    assert got == {1: "a", 2: "B2", 3: "c", 4: "d"}

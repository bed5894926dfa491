"""Range clustering (row-group skipping layout) + compaction."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from embedding_to_vectordatabase_spark.sinks.layout import (
    cluster_by,
    compact,
)


def _key_ranges(path: str) -> list[tuple[int, int]]:
    """(min, max) of column k per row group across all files."""
    out = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.row_group(rg).num_columns)
                if md.row_group(rg).column(i).path_in_schema == "k"
            )
            out.append((col.statistics.min, col.statistics.max))
    return out


def test_cluster_by_gives_tight_disjoint_row_group_ranges(spark, tmp_path):
    """Shuffled keys written raw give row groups spanning ~the whole
    key space (nothing skippable); cluster_by must produce disjoint,
    tight per-file ranges so a key predicate can skip row groups."""
    n = 20_000
    df = (
        spark.range(n)
        .select(
            F.xxhash64("id").alias("shuffle_order"),
            F.col("id").alias("k"),
            F.concat(F.lit("v"), F.col("id")).alias("payload"),
        )
        .orderBy("shuffle_order")
        .drop("shuffle_order")
    )
    raw = str(tmp_path / "raw")
    df.repartition(8).write.parquet(raw)
    raw_ranges = _key_ranges(raw)
    # random layout: every row group spans nearly the full key space
    assert all(hi - lo > n * 0.8 for lo, hi in raw_ranges)

    clustered = str(tmp_path / "clustered")
    cluster_by(spark.read.parquet(raw), ["k"], num_files=8).write.parquet(
        clustered
    )
    ranges = sorted(_key_ranges(clustered))
    # tight: each covers ~1/8 of the space; disjoint: no overlap
    assert all(hi - lo < n * 0.3 for lo, hi in ranges)
    for (_, prev_hi), (lo, _) in zip(ranges, ranges[1:]):
        assert lo > prev_hi
    # same data
    got = spark.read.parquet(clustered)
    assert got.count() == n
    assert got.agg(F.sum("k")).first()[0] == n * (n - 1) // 2


def test_compact_reduces_file_count_preserving_rows(spark, tmp_path):
    src = str(tmp_path / "small_files")
    spark.range(10_000).select(
        F.col("id").alias("k"), F.lit("x").alias("v")
    ).repartition(64).write.parquet(src)
    assert len(glob.glob(f"{src}/*.parquet")) == 64

    out = str(tmp_path / "compacted")
    compact(spark, src, out, target_file_bytes=1 << 30)
    assert len(glob.glob(f"{out}/*.parquet")) == 1
    assert spark.read.parquet(out).count() == 10_000

    # compaction + clustering in one rewrite
    out2 = str(tmp_path / "compacted_clustered")
    compact(spark, src, out2, target_file_bytes=1 << 30, cluster_cols=["k"])
    assert spark.read.parquet(out2).count() == 10_000
    stats = pq.ParquetFile(glob.glob(f"{out2}/*.parquet")[0]).metadata
    col = stats.row_group(0).column(0)
    assert col.statistics.min == 0  # sorted within the single file

"""Range clustering (row-group skipping layout), Z-order clustering,
and compaction."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from embedding_to_vectordatabase_spark.sinks.layout import (
    cluster_by,
    compact,
    zorder_by,
    zorder_value,
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


def _rg_hits(path: str, bands: dict[str, tuple[float, float]]) -> tuple[int, int]:
    """(row groups intersecting ALL bands, total row groups) from the
    parquet footers — what a stats-pruning scan must read for a
    conjunctive box predicate."""
    hits = total = 0
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            total += 1
            ok = True
            for i in range(md.row_group(rg).num_columns):
                col = md.row_group(rg).column(i)
                band = bands.get(col.path_in_schema)
                if band is None:
                    continue
                lo, hi = band
                st = col.statistics
                if st is None:  # no stats => unprunable on this column
                    continue
                if st.max < lo or st.min > hi:
                    ok = False
                    break
            if ok:
                hits += 1
    return hits, total


def test_zorder_skips_2d_box_better_than_1d_clustering(spark, tmp_path):
    """A conjunctive box predicate over (x, y): 1D clustering on x
    prunes only the x band (every x-slice file spans all of y), while
    the Z-order layout localizes both dimensions, so the box touches
    far fewer row groups. Correctness: identical row multiset."""
    # 64 files: a Z-curve split into f contiguous chunks localizes
    # both dims only once f exceeds the quad-tree depth the box size
    # needs — at 16 files each chunk is a 250-wide quadrant block and
    # the curve's locality cannot beat plain x-slices yet. Measured at
    # 64 files with a 250-wide box: Z reads 12-13 row groups vs 17
    # for 1D x-clustering when the box sits inside a root quadrant;
    # a box CENTERED on the global median (straddling the top split
    # of both dims — the curve's known worst case) degrades Z to 16,
    # still under 1D. The advantage widens with file count; the test
    # uses the quadrant-interior box and asserts the robust margin.
    n, files = 100_000, 64
    df = spark.range(n).select(
        (F.col("id") % 1000).cast("double").alias("x"),
        (F.pmod(F.xxhash64("id"), 1000)).cast("double").alias("y"),
        F.col("id").alias("payload"),
    )
    one_d = str(tmp_path / "xcluster")
    cluster_by(df, ["x"], num_files=files).write.parquet(one_d)
    z_d = str(tmp_path / "zorder")
    zorder_by(df, ["x", "y"], num_files=files).write.parquet(z_d)

    # same rows back
    assert spark.read.parquet(z_d).count() == n
    assert (
        spark.read.parquet(z_d).agg(F.sum("payload")).first()[0]
        == n * (n - 1) // 2
    )

    # a quadrant-interior box covering 25% of each dimension (~6% of
    # the area)
    bands = {"x": (100.0, 350.0), "y": (100.0, 350.0)}
    x_hits, x_total = _rg_hits(one_d, bands)
    z_hits, z_total = _rg_hits(z_d, bands)
    assert x_total >= files and z_total >= files
    # 1D layout: the x band selects ~1/4 of slices, y prunes nothing
    # within them; Z-order touches only row groups near the box
    assert z_hits < x_hits, (z_hits, x_hits)
    assert z_hits / z_total <= 0.25


def test_zorder_value_guards(spark):
    with pytest.raises(ValueError):
        zorder_value([F.col("a")], [0.0], [1.0])
    with pytest.raises(ValueError):
        zorder_value(
            [F.col("a"), F.col("b")], [0.0, 0.0], [1.0, 1.0], bits=32
        )
    # constant column contributes zero but does not break the key
    df = spark.range(100).select(
        F.col("id").cast("double").alias("a"),
        F.lit(5.0).alias("b"),
    )
    out = zorder_by(df, ["a", "b"], num_files=2)
    assert out.count() == 100
    # mins/maxs arity must match the column count (zip would silently
    # truncate and drop a column from the interleave)
    with pytest.raises(ValueError):
        zorder_value([F.col("a"), F.col("b")], [0.0], [1.0])
    # per-row NULL keys raise (greatest(0, NULL) would silently pile
    # null-key rows at the z-origin) and a pre-existing __z collides
    with_nulls = spark.range(100).select(
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.col("id").cast("double"))
        .alias("a"),
        (F.col("id") * 2.0).alias("b"),
    )
    with pytest.raises(ValueError, match="null"):
        zorder_by(with_nulls, ["a", "b"], num_files=2)
    with pytest.raises(ValueError, match="__z"):
        zorder_by(df.withColumn("__z", F.lit(1)), ["a", "b"])


def test_zorder_value_matches_python_reference(spark):
    """The Spark shift/or expression tree computes exactly the
    reference Morton interleave: quantize each value to [0, 2^bits)
    against its (min, max) with double arithmetic and truncation,
    then bit i of column j lands at position i*k + j. Checked
    bit-for-bit on a deterministic value grid including the domain
    edges (min, max, mid, near-boundary fractions)."""
    bits = 12
    top = (1 << bits) - 1
    xs = [0.0, 1.0, 499.5, 500.0, 999.0, 123.456, 987.654, 0.001]
    ys = [0.0, 2.5, 777.7, 1000.0, 41.0, 999.999, 500.0, 3.14159]
    mnx, mxx = min(xs), max(xs)
    mny, mxy = min(ys), max(ys)

    def pyquant(v, mn, mx):
        q = int((v - mn) / (mx - mn) * float(top))  # same IEEE ops
        return max(0, min(top, q))

    def pyz(x, y):
        qx, qy = pyquant(x, mnx, mxx), pyquant(y, mny, mxy)
        z = 0
        for i in range(bits):
            z |= ((qx >> i) & 1) << (i * 2)
            z |= ((qy >> i) & 1) << (i * 2 + 1)
        return z

    expected = [pyz(x, y) for x, y in zip(xs, ys)]
    df = spark.createDataFrame(
        list(zip(xs, ys)), "x double, y double"
    )
    got = [
        r["z"]
        for r in df.select(
            zorder_value(
                [F.col("x"), F.col("y")], [mnx, mny], [mxx, mxy], bits=bits
            ).alias("z")
        ).collect()
    ]
    assert got == expected


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


def test_zorder_string_dimension_equality_pruning(spark, tmp_path):
    """A low-cardinality string key (tenant/lang) z-orders via VALUE
    -rank quantization: the <= cap distinct values are collected,
    sorted in value order, and mapped to evenly spaced quantized
    points, so every value separates at the shallowest file
    granularity AND co-located groups are lexicographically
    contiguous (tight footer min/max on the original column). The
    numeric co-key keeps its range pruning.

    History: the r10 version of this test was suite-order flaky
    (16 vs 17 of 32 at an exact-half threshold). Two root causes:
    (a) the then hash-min/max quantization let 'de'/'es'/'en' share
    their top-4 quantized bits by hash luck, so no file count could
    separate them — structural, fixed by value-rank quantization
    (every lang now hits ~8-13 of 32 instead of 16-17);
    (b) RangePartitioner's sample seed derives from the global RDD id
    counter (byteswap32(-rdd.id - 1)), so tests running earlier shift
    the file boundaries by a row group or two — inherent, absorbed by
    asserting a >= 2x margin against a same-run unclustered baseline
    instead of a knife-edge absolute ratio."""
    n, files = 50_000, 32
    langs = ["en", "de", "fr", "es", "it", "pt", "nl", "pl"]
    df = spark.range(n).select(
        F.element_at(
            F.array(*[F.lit(x) for x in langs]),
            (F.col("id") % 8 + 1).cast("int"),
        ).alias("lang"),
        (F.pmod(F.xxhash64("id"), 1000)).cast("double").alias("score"),
        F.col("id").alias("payload"),
    )
    raw_d = str(tmp_path / "rawlang")
    df.repartition(files).write.parquet(raw_d)
    z_d = str(tmp_path / "zlang")
    zorder_by(df, ["lang", "score"], num_files=files).write.parquet(z_d)
    assert spark.read.parquet(z_d).count() == n

    # same-run baseline: a round-robin layout leaves every lang in
    # ~every row group (nothing skippable)
    for lang in langs:
        bands = {"lang": (lang, lang)}
        raw_hits, raw_total = _rg_hits(raw_d, bands)
        z_hits, z_total = _rg_hits(z_d, bands)
        assert raw_total >= files and z_total >= files
        assert raw_hits / raw_total >= 0.9, (lang, raw_hits, raw_total)
        # >= 2x pruning vs baseline for EVERY value, with real margin:
        # measured worst is ~0.41 of total across RDD-id perturbations
        # vs this 0.5-of-baseline bar
        assert z_hits / z_total <= 0.5 * (raw_hits / raw_total), (
            lang, z_hits, z_total, raw_hits, raw_total,
        )

    # null string keys must raise (xxhash64(NULL) is a constant seed
    # hash - without the original-column check they'd co-locate
    # silently)
    with_null = df.withColumn(
        "lang",
        F.when(F.col("payload") % 100 == 0, None).otherwise(
            F.col("lang")
        ),
    )
    with pytest.raises(ValueError, match="null"):
        zorder_by(with_null, ["lang", "score"], num_files=4)


def test_zorder_string_high_cardinality_falls_back_to_hash(spark, tmp_path):
    """Above string_rank_cap distinct values the rank map would be
    unbounded — the dim falls back to min/max-normalized xxhash64
    (weak footer pruning at that cardinality regardless of layout).
    Rows and values must round-trip either way."""
    n = 5_000
    df = spark.range(n).select(
        F.concat(F.lit("u"), F.col("id")).alias("uid"),  # all distinct
        (F.col("id") % 97).cast("double").alias("score"),
        F.col("id").alias("payload"),
    )
    out = zorder_by(df, ["uid", "score"], num_files=4, string_rank_cap=64)
    assert out.count() == n
    assert out.agg(F.sum("payload")).first()[0] == n * (n - 1) // 2
    assert set(out.columns) == {"uid", "score", "payload"}


def test_zorder_nan_and_empty_input_guards(spark):
    """NaN in a float key is not NULL, but max() returns NaN and the
    mx > mn calibration comparison goes False — without the guard the
    dimension silently degrades to the constant-0 branch. And an
    empty input must say 'no rows', not blame the key columns."""
    nan_df = spark.range(100).select(
        F.when(F.col("id") % 10 == 0, float("nan"))
        .otherwise(F.col("id").cast("double"))
        .alias("a"),
        (F.col("id") * 2.0).alias("b"),
    )
    with pytest.raises(ValueError, match="NaN"):
        zorder_by(nan_df, ["a", "b"], num_files=2)

    empty = spark.range(0).select(
        F.col("id").cast("double").alias("a"),
        F.col("id").cast("double").alias("b"),
    )
    with pytest.raises(ValueError, match="no rows"):
        zorder_by(empty, ["a", "b"], num_files=2)


def test_compact_zorder_method(spark, tmp_path):
    """compact(method='zorder') rewrites through the Morton layout —
    rows preserved, invalid method rejected."""
    src = str(tmp_path / "zsrc")
    spark.range(10_000).select(
        (F.col("id") % 100).cast("double").alias("a"),
        (F.pmod(F.xxhash64("id"), 100)).cast("double").alias("b"),
        F.col("id").alias("payload"),
    ).repartition(16).write.parquet(src)

    out = str(tmp_path / "zcompacted")
    n = compact(
        spark, src, out,
        target_file_bytes=1 << 30,
        cluster_cols=["a", "b"],
        method="zorder",
    )
    assert n >= 1
    got = spark.read.parquet(out)
    assert got.count() == 10_000
    assert got.agg(F.sum("payload")).first()[0] == 10_000 * 9_999 // 2

    with pytest.raises(ValueError, match="method"):
        compact(spark, src, str(tmp_path / "bad"), method="hilbert")
    # double dims are NOT footer-safe (parquet omits NaN from float
    # stats, which would bypass the NaN guard) - agg calibration ran
    assert compact.last_calibration == "agg"


def test_compact_zorder_integer_dims_calibrate_from_footers(spark, tmp_path):
    """compact(method='zorder') over all-integer dims on a local
    store reads its min/max calibration from the parquet footers —
    the rewrite then scans the data exactly once (at 100 TB: half
    the read volume). The footer bounds must equal the agg path's
    bounds exactly, and null keys still fail loud."""
    from embedding_to_vectordatabase_spark.sinks.layout import _footer_bounds

    src = str(tmp_path / "intsrc")
    spark.range(20_000).select(
        (F.col("id") % 613).alias("a"),
        F.pmod(F.xxhash64("id"), F.lit(997)).alias("b"),
        F.col("id").alias("payload"),
    ).repartition(8).write.parquet(src)

    out = str(tmp_path / "intz")
    n = compact(
        spark, src, out,
        target_file_bytes=1 << 30,
        cluster_cols=["a", "b"],
        method="zorder",
    )
    assert compact.last_calibration == "footers"
    assert n >= 1
    got = spark.read.parquet(out)
    assert got.count() == 20_000
    assert got.agg(F.sum("payload")).first()[0] == 20_000 * 19_999 // 2

    # footer bounds == agg bounds, bit for bit
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(src)
    fs = jpath.getFileSystem(hconf)
    df = spark.read.parquet(src)
    bounds = _footer_bounds(
        fs, fs.makeQualified(jpath), ["a", "b"], dict(df.dtypes)
    )
    agg = df.agg(
        F.min("a"), F.max("a"), F.min("b"), F.max("b")
    ).first()
    assert bounds == ([float(agg[0]), float(agg[2])],
                      [float(agg[1]), float(agg[3])])

    # null keys surface through the footer null_count - same
    # fail-loud contract as the agg path
    null_src = str(tmp_path / "nullsrc")
    spark.range(1_000).select(
        F.when(F.col("id") % 7 == 0, None).otherwise(F.col("id")).alias("a"),
        (F.col("id") % 13).alias("b"),
    ).write.parquet(null_src)
    with pytest.raises(ValueError, match="null"):
        compact(
            spark, null_src, str(tmp_path / "nullz"),
            cluster_cols=["a", "b"], method="zorder",
        )

"""Throughput / load metrics (reference A3).

The reference's only measurement machinery is the threaded load
harness reporting requests-per-second and mean latency over a run
(baai_m3_simple_server/thread_test.py:59-71 — rps at :64, avg at
:63). Here it's one aggregate over a run-log DataFrame: any stage
that wants metrics emits (ts, latency_ms[, rows]) rows and this
computes the same numbers relationally — also usable over the
driver's ``events`` table shape for oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..store import load_manifest, publish, rel_path, staged_rel_dir
from ..util import ts_micros


def load_metrics(
    df: DataFrame,
    ts_col: str = "ts",
    latency_col: str = "latency_ms",
    rows_col: str | None = None,
) -> DataFrame:
    """One-row summary: n_requests, duration_s (first→last ts),
    requests_per_s, avg_latency_ms (thread_test.py:59-71 parity), and
    rows_per_s when a per-request row count is supplied."""
    dur = (
        ts_micros(F.max(ts_col)) - ts_micros(F.min(ts_col))
    ) / 1_000_000.0
    aggs = [
        F.count("*").alias("n_requests"),
        F.round(dur, 6).alias("duration_s"),
        F.round(F.count("*") / F.greatest(dur, F.lit(1e-9)), 6).alias(
            "requests_per_s"
        ),
        F.round(F.avg(latency_col), 6).alias("avg_latency_ms"),
    ]
    if rows_col is not None:
        aggs.append(
            F.round(
                F.sum(rows_col) / F.greatest(dur, F.lit(1e-9)), 6
            ).alias("rows_per_s")
        )
    return df.agg(*aggs)


NUMERIC_TYPES = {
    "tinyint", "smallint", "int", "bigint", "float", "double",
}


QUANTILES = (0.25, 0.5, 0.75, 0.95)


def table_stats(
    df: DataFrame,
    columns: list[str] | None = None,
    exact: bool = False,
) -> DataFrame:
    """Per-column data-quality profile in ONE aggregation pass over the
    table: row count, null count, distinct count, numeric
    min/max/mean and p25/p50/p75/p95 quantiles.

    ``exact=False`` (the 100 TB default) uses HyperLogLog++
    ``approx_count_distinct`` and ``percentile_approx`` — single-pass,
    fixed memory per column; ``exact=True`` uses exact
    COUNT(DISTINCT) and sorting ``percentile`` (one expand per column
    — fine at test scale, and what the DuckDB oracle mirrors;
    ``percentile`` interpolates like SQL percentile_cont / DuckDB
    quantile_cont). The result is O(columns): the single aggregated
    row is reshaped on the driver into one row per column — the only
    driver-side collect, of one row.

    Output: (column, dtype, n_rows, n_nulls, n_distinct, min double,
    max double, mean double, p25..p95 double) — numeric stats NULL
    for non-numeric columns; decimals profile via their double cast;
    mean and quantiles rounded to 6 dp (engine-portable).
    """
    spark = df.sparkSession
    dtypes = dict(df.dtypes)
    cols = columns or list(df.columns)
    aggs = [F.count(F.lit(1)).alias("__n")]
    # generated aliases are INDEX-based, so a user column literally
    # named like a name-derived alias (e.g. "x__nn" next to "x") can
    # never collide with them
    for i, c in enumerate(cols):
        aggs.append(F.count(F.col(c)).alias(f"__{i}_nn"))
        aggs.append(
            (
                F.count_distinct(F.col(c))
                if exact
                else F.approx_count_distinct(F.col(c))
            ).alias(f"__{i}_nd")
        )
        base = dtypes[c].split("(")[0]
        if base in NUMERIC_TYPES or base == "decimal":
            d = F.col(c).cast("double")
            aggs.append(F.min(d).alias(f"__{i}_min"))
            aggs.append(F.max(d).alias(f"__{i}_max"))
            aggs.append(F.avg(d).alias(f"__{i}_mean"))
            pct = (
                F.percentile(d, list(QUANTILES))
                if exact
                else F.percentile_approx(d, list(QUANTILES))
            )
            aggs.append(pct.alias(f"__{i}_q"))
    row = df.agg(*aggs).first().asDict()
    out = []
    for i, c in enumerate(cols):
        q = row.get(f"__{i}_q") or [None] * len(QUANTILES)
        out.append(
            (
                c,
                dtypes[c],
                row["__n"],
                row["__n"] - row[f"__{i}_nn"],
                row[f"__{i}_nd"],
                row.get(f"__{i}_min"),
                row.get(f"__{i}_max"),
                (
                    round(row[f"__{i}_mean"], 6)
                    if row.get(f"__{i}_mean") is not None
                    else None
                ),
                *[round(x, 6) if x is not None else None for x in q],
            )
        )
    return spark.createDataFrame(
        out,
        "column string, dtype string, n_rows long, n_nulls long, "
        "n_distinct long, min double, max double, mean double, "
        "p25 double, p50 double, p75 double, p95 double",
    )


def skew_profile(
    df: DataFrame,
    key_cols: list[str] | str,
    top_n: int = 20,
) -> DataFrame:
    """Heavy-hitter report for a prospective join/groupBy key: the
    top-N key values by row count, each with its share of the table
    and its load relative to the mean key (``skew``). skew >> 1 on a
    planned shuffle key is the signal to reach for ``util.salted_join``
    or AQE skew handling BEFORE the job runs, instead of diagnosing a
    straggler task after six hours at 100 TB.

    Scale shape: TWO column-pruned scans (both read only the key
    columns) — the per-key counts, and the same subtree re-executed
    for the one-row totals it cross-joins against. That re-execution
    is deliberate: deriving totals from the counts relation lazily
    re-runs it anyway (a DAG reuse duplicates the subtree), and the
    one-pass alternative — a single-partition window over the counts
    relation — melts on exactly the high-cardinality keys (user ids)
    this profiler exists to check. Both scans are map-side-combined;
    top-N is TakeOrderedAndProject, not a global sort; deterministic
    tie-break on the key values.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    counts = df.groupBy(*keys).agg(F.count("*").alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("__total"),
        F.avg("cnt").alias("__mean"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            *keys,
            F.col("cnt"),
            F.round(F.col("cnt") / F.col("__total"), 6).alias("share"),
            F.round(F.col("cnt") / F.col("__mean"), 3).alias("skew"),
        )
        .orderBy(F.col("cnt").desc(), *[F.col(k).asc_nulls_last() for k in keys])
        .limit(top_n)
    )


# Relations a persisted index may carry, with the partition column
# used by its store layout (None = unpartitioned). Covers every
# build_*_index lifecycle in operators/search.py and operators/
# dedup.py: sparse/BM25 (postings + df_stats segments + corpus_stats),
# dense quantized (codes [+ list_id], centroids, pq_codebooks,
# sq8_params, opq_rotation), MinHash LSH (signatures, bands).
_INDEX_RELATIONS: list[tuple[str, str | None]] = [
    ("postings", "token_bucket"),
    ("df_stats", "token_bucket"),
    ("corpus_stats", None),
    ("codes", "list_id"),
    ("centroids", None),
    ("pq_codebooks", None),
    ("sq8_params", None),
    ("opq_rotation", None),
    ("signatures", None),
    ("bands", None),
    ("meta", None),
    ("ivf_meta", None),
]


def index_stats(spark, index_path: str) -> DataFrame:
    """Operational report over a persisted index store (any of the
    build/upsert lifecycles here): one row per relation present under
    ``index_path`` with row count, file (≈ append-segment) count, and
    — for bucket/list-partitioned relations — partition count plus
    max/avg occupancy and their ratio (the skew number that predicts
    a hot bucket or an overweight IVF list before a query does).

    Every build writes one file set and every upsert APPENDS one, so
    ``n_files`` reads as the segment count the append-only stores
    accumulate — the compaction trigger. Cost shape: zero data
    columns are read — each relation contributes a count() (parquet
    footer row counts), a distinct over ``input_file_name()`` and,
    when partitioned, a groupBy on the PARTITION column (directory-
    derived, no column pages touched). Output: (relation, n_rows,
    n_files, n_partitions, max_partition_rows, avg_partition_rows,
    skew_ratio) — partition fields NULL for unpartitioned relations.
    """
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    mf = load_manifest(spark, index_path)
    frames = []
    for rel, part_col in _INDEX_RELATIONS:
        p = rel_path(spark, index_path, rel, mf)
        jpath = jvm.org.apache.hadoop.fs.Path(p)
        if not jpath.getFileSystem(conf).exists(jpath):
            continue
        # input_file_name() is nondeterministic, so it must be
        # PROJECTED before any aggregate references it
        df = spark.read.parquet(p).withColumn(
            "__file", F.input_file_name()
        )
        use_part = part_col if part_col in df.columns else None
        if use_part is not None:
            per = df.groupBy(use_part).agg(
                F.count("*").alias("__n"),
                F.countDistinct("__file").alias("__f"),
            )
            stats = per.agg(
                F.sum("__n").cast("long").alias("n_rows"),
                F.sum("__f").cast("long").alias("n_files"),
                F.count("*").cast("long").alias("n_partitions"),
                F.max("__n").cast("long").alias("max_partition_rows"),
                F.round(F.avg("__n"), 3).alias("avg_partition_rows"),
                F.round(F.max("__n") / F.avg("__n"), 3).alias(
                    "skew_ratio"
                ),
            )
        else:
            stats = df.agg(
                F.count("*").cast("long").alias("n_rows"),
                F.countDistinct("__file").cast("long").alias("n_files"),
                F.lit(None).cast("long").alias("n_partitions"),
                F.lit(None).cast("long").alias("max_partition_rows"),
                F.lit(None).cast("double").alias("avg_partition_rows"),
                F.lit(None).cast("double").alias("skew_ratio"),
            )
        frames.append(stats.select(F.lit(rel).alias("relation"), "*"))
    if not frames:
        raise ValueError(f"no index relations found under {index_path}")
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out


def _size_proportional_parts(df: DataFrame) -> int:
    """Output file count for an UNPARTITIONED relation rewrite: the
    READ partition count after Spark's file packing is data-size-
    proportional (maxPartitionBytes bundles), so reusing it keeps
    compacted files at scan-friendly sizes instead of a coalesce(1)
    that would serialize a corpus-sized relation through one task."""
    return max(1, int(df.rdd.getNumPartitions()))


def compact_index(spark, index_path: str) -> DataFrame:
    """Segment compaction for the append-only persisted index stores —
    the operational action ``index_stats``'s growing ``n_files``
    calls for. Every upsert appends one segment (one file per touched
    partition), so a long ingest loop accumulates small files whose
    open/footer cost eventually dominates the bucket-pruned scans the
    layouts exist for. Per relation present:

    - ``postings`` / ``codes`` (bucket/list-partitioned): rewritten
      as ONE file per partition (repartition on the partition column,
      so each directory's rows land in exactly one task) —
      row-for-row identical content, search results unchanged
      (asserted in tests);
    - ``df_stats``: per-segment PARTIAL counts summed into one
      segment per bucket — the sums the searches compute at query
      time, precomputed (exact, the partials are mergeable by
      construction);
    - ``corpus_stats``: the (n_docs, total_dl) partials summed to one
      row;
    - ``signatures`` / ``bands`` (MinHash): rewritten single-file
      with exact-duplicate rows dropped — duplicates only exist
      after an at-least-once double-upsert, where they are benign
      for probes but pure waste.

    Each rewrite stages to a fresh versioned directory; ALL staged
    relations then flip in ONE manifest publish (``..store``), so a
    concurrent search resolving postings+df_stats+corpus_stats (or
    codes+centroids) sees the pre-compaction store or the
    post-compaction store, never a mixed generation (r15 verdict #4
    — the per-relation FS-rename swap windows, closed). Tiny
    relations (meta, centroids, params) are left alone. Returns the
    ``index_stats`` report AFTER compaction."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    mf = load_manifest(spark, index_path)
    staged: dict[str, str] = {}

    def exists(p: str) -> bool:
        jp = jvm.org.apache.hadoop.fs.Path(p)
        return jp.getFileSystem(conf).exists(jp)

    def stage(rel: str) -> str:
        staged[rel] = staged_rel_dir(rel)
        return f"{index_path}/{staged[rel]}"

    for rel, part_col in (("postings", "token_bucket"), ("codes", "list_id")):
        p = rel_path(spark, index_path, rel, mf)
        if not exists(p):
            continue
        df = spark.read.parquet(p)
        if part_col not in df.columns:
            df.coalesce(_size_proportional_parts(df)).write.mode(
                "overwrite"
            ).parquet(stage(rel))
        else:
            nparts = df.select(part_col).distinct().count()
            (
                df.repartition(max(int(nparts), 1), part_col)
                .write.mode("overwrite")
                .partitionBy(part_col)
                .parquet(stage(rel))
            )
    p = rel_path(spark, index_path, "df_stats", mf)
    if exists(p):
        df = spark.read.parquet(p)
        merged = df.groupBy("token_bucket", "token").agg(
            F.sum("df").alias("df")
        ).select("token", "df", "token_bucket")
        nparts = merged.select("token_bucket").distinct().count()
        (
            merged.repartition(max(int(nparts), 1), "token_bucket")
            .write.mode("overwrite")
            .partitionBy("token_bucket")
            .parquet(stage("df_stats"))
        )
    p = rel_path(spark, index_path, "corpus_stats", mf)
    if exists(p):
        df = spark.read.parquet(p)
        df.agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("total_dl").cast("double").alias("total_dl"),
        ).coalesce(1).write.mode("overwrite").parquet(
            stage("corpus_stats")
        )
    for rel in ("signatures", "bands"):
        p = rel_path(spark, index_path, rel, mf)
        if not exists(p):
            continue
        df = spark.read.parquet(p)
        df.dropDuplicates().coalesce(
            _size_proportional_parts(df)
        ).write.mode("overwrite").parquet(stage(rel))
    if staged:
        publish(spark, index_path, staged)
    return index_stats(spark, index_path)


def delete_from_index(
    spark, index_path: str, doc_ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Delete-by-id over a persisted index store — the reference's K7
    delete (`vector_database/milvus_connector.py` delete-by-expr)
    carried to the index lifecycles, completing
    build/search/upsert/compact/delete/stats. ``doc_ids`` is a
    one-column DataFrame of ids to remove (bounded by contract, like
    a probe batch: it BROADCASTS into every rewrite).

    Per relation present:

    - ``postings`` / ``codes`` / ``signatures`` / ``bands``: rewritten
      minus the matching ids via a broadcast anti-join, keeping the
      partition layout (one file per bucket/list directory, like
      ``compact_index``);
    - ``df_stats``: REBUILT from the retained postings (per-token
      counts can't be decremented from the mergeable partials without
      knowing which segment carried the deleted doc — the rewrite
      already streams the retained rows, so exact recount is free);
    - ``corpus_stats``: rebuilt from the retained postings' distinct
      (doc, dl) pairs when doc lengths are stored.

    Dense stores (codes): the quantizers (centroids/codebooks/params)
    are NOT retrained — deletion only removes rows, the standard
    IVF/PQ delete semantics. Returns the post-delete ``index_stats``
    report. Every rewrite stages to a versioned directory and ALL of
    them flip in ONE manifest publish, exactly like
    ``compact_index`` — postings and the df/corpus stats derived
    from them are never readable as a mixed generation."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    mf = load_manifest(spark, index_path)
    staged: dict[str, str] = {}

    def exists(p: str) -> bool:
        jp = jvm.org.apache.hadoop.fs.Path(p)
        return jp.getFileSystem(conf).exists(jp)

    def stage(rel: str) -> str:
        staged[rel] = staged_rel_dir(rel)
        return f"{index_path}/{staged[rel]}"

    ids = F.broadcast(
        doc_ids.select(F.col(doc_ids.columns[0]).alias("__del_id"))
        .dropDuplicates()
    )

    def kept(df: DataFrame, col: str) -> DataFrame:
        return df.join(
            ids, df[col] == F.col("__del_id"), "left_anti"
        )

    post_p = rel_path(spark, index_path, "postings", mf)
    if exists(post_p):
        df = spark.read.parquet(post_p)
        keep = kept(df, id_col)
        nparts = keep.select("token_bucket").distinct().count()
        (
            keep.repartition(max(int(nparts), 1), "token_bucket")
            .write.mode("overwrite")
            .partitionBy("token_bucket")
            .parquet(stage("postings"))
        )
        # derived stats rebuild from the STAGED retained postings (not
        # yet published — the whole group flips together)
        retained = spark.read.parquet(
            f"{index_path}/{staged['postings']}"
        )
        if exists(rel_path(spark, index_path, "df_stats", mf)):
            merged = (
                retained.groupBy("token_bucket", "token")
                .agg(F.count("*").alias("df"))
                .select("token", "df", "token_bucket")
            )
            np2 = merged.select("token_bucket").distinct().count()
            (
                merged.repartition(max(int(np2), 1), "token_bucket")
                .write.mode("overwrite")
                .partitionBy("token_bucket")
                .parquet(stage("df_stats"))
            )
        if exists(rel_path(spark, index_path, "corpus_stats", mf)) and (
            "dl" in retained.columns
        ):
            (
                retained.select(id_col, "dl")
                .dropDuplicates([id_col])
                .agg(
                    F.count("*").cast("long").alias("n_docs"),
                    F.sum("dl").cast("double").alias("total_dl"),
                )
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(stage("corpus_stats"))
            )
    codes_p = rel_path(spark, index_path, "codes", mf)
    if exists(codes_p):
        df = spark.read.parquet(codes_p)
        cid = id_col if id_col in df.columns else "vec_id"
        keep = kept(df, cid)
        if "list_id" in df.columns:
            nparts = keep.select("list_id").distinct().count()
            (
                keep.repartition(max(int(nparts), 1), "list_id")
                .write.mode("overwrite")
                .partitionBy("list_id")
                .parquet(stage("codes"))
            )
        else:
            keep.coalesce(_size_proportional_parts(df)).write.mode(
                "overwrite"
            ).parquet(stage("codes"))
    for rel in ("signatures", "bands"):
        p = rel_path(spark, index_path, rel, mf)
        if not exists(p):
            continue
        df = spark.read.parquet(p)
        kept(df, id_col).coalesce(
            _size_proportional_parts(df)
        ).write.mode("overwrite").parquet(stage(rel))
    if staged:
        publish(spark, index_path, staged)
    return index_stats(spark, index_path)

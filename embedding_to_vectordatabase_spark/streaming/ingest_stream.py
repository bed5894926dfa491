"""Structured Streaming wrapper of the ingest plan (reference ST1-ST5).

Mapping from the reference's hand-rolled threading:
- backpressure (≤10 pending files, embed_to_milvus.py:42-48)
    → ``maxFilesPerTrigger``
- resume offset (config.json:37 ``start``) + metadata WAL
    → checkpointLocation (offsets + commit log are built in)
- at-least-once handoff + idempotent sink (ST3)
    → ``foreachBatch`` keyed by batchId; J2 anti-join keeps re-runs
      idempotent at doc granularity
- drain protocol (is_processing_complete, ST5)
    → ``Trigger.AvailableNow`` + ``awaitTermination``

Also: event-stream analytics the reference never had — watermarked
tumbling-window aggregation over the ``events`` table shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..schemas import DOC_SCHEMA
from ..util import ts_micros


def stream_ingest_jsonl(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    registry: DataFrame,
    batch_fn: Callable[[DataFrame, DataFrame], DataFrame] | None = None,
    max_files_per_trigger: int = 10,
    available_now: bool = True,
    neardup_index_path: str | None = None,
    neardup_threshold: float = 0.8,
    neardup_text_col: str = "content",
    neardup_id_col: str = "title",
) -> StreamingQuery:
    """File-source streaming ingest: each micro-batch runs the batch
    ingest plan via foreachBatch and writes parquet idempotently.

    ST3 idempotency: each micro-batch OVERWRITES its own
    ``batch_id=<n>`` partition directory under ``out_dir``. A batch
    replayed after a crash between the data write and the checkpoint
    commit rewrites the same directory instead of appending
    duplicates (exactly-once output for a deterministic batch_fn).
    Read the sink with ``spark.read.parquet(out_dir)`` — the
    ``batch_id`` partition column is part of the sink schema.

    ``neardup_index_path`` gates each micro-batch through a persisted
    MinHash LSH store BEFORE the ingest plan runs — the reference's
    P6/J2 dedup-before-work (embed_to_milvus.py:52-58 skips files
    whose name is already registered) extended to near-duplication,
    and the streaming twin of the batch
    ``dedup_against_index``/``upsert_minhash_index`` refresh loop:

    1. probe: batch docs near-matching the store (or a SMALLER-id doc
       in the same batch — ``intra_batch``) are dropped;
       ``exclude_self`` keeps replays from matching their own
       first-run upserts;
    2. upsert: the survivors' signatures/band rows append to the
       store, keyed by a ``_ingest_markers/batch_<id>`` marker so a
       replayed batch never double-appends (marker written AFTER the
       upsert: a crash in between re-runs the upsert — at-least-once
       on the store, benign duplicates the probe's dropDuplicates
       absorbs — while the OUTPUT stays exactly-once via the
       partition overwrite);
    3. ingest: the batch plan runs on survivors only.

    The store must exist (``build_minhash_index`` on the standing
    corpus — possibly empty — before starting the stream). Restart +
    replay safety is asserted in tests/test_streaming.py."""
    from ..plans.ingest import IngestConfig, ingest

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(src_dir)
    )

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        src = batch_df
        if neardup_index_path is not None:
            from ..operators.dedup import (
                dedup_against_index,
                upsert_minhash_index,
            )

            survivors = dedup_against_index(
                spark,
                neardup_index_path,
                batch_df,
                threshold=neardup_threshold,
                text_col=neardup_text_col,
                id_col=neardup_id_col,
                intra_batch=True,
                exclude_self=True,
            )
            # one materialization feeds BOTH the upsert and the
            # ingest (the survivor set is micro-batch-bounded);
            # blocks release when this batch closure returns. The
            # checkpoint lands in however many partitions the gate's
            # last shuffle left (often ONE under AQE coalescing) and
            # its RDD-backed plan reports unknown size, so downstream
            # parallelism guards cannot see it is tiny — respread the
            # bounded batch HERE or the chunk/embed stages (the
            # expensive model-boundary work the gate exists to save)
            # serialize on one core (r16 bench finding: 6.5x wall)
            src = survivors.localCheckpoint(eager=True).repartition(
                spark.sparkContext.defaultParallelism
            )
            # marker via the Hadoop FS API so the gate works on the
            # same filesystem family the index lives on (local/hdfs/
            # object store), not just the driver's local disk
            jpath = spark._jvm.org.apache.hadoop.fs.Path(
                f"{neardup_index_path}/_ingest_markers/batch_{batch_id}"
            )
            fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
            if not fs.exists(jpath):
                # count_appended=False: the return value is unused
                # and the footer counts would re-read a store whose
                # segment count grows with every micro-batch
                upsert_minhash_index(
                    neardup_index_path, src,
                    text_col=neardup_text_col, id_col=neardup_id_col,
                    count_appended=False,
                )
                fs.create(jpath, True).close()
        if batch_fn is not None:
            out = batch_fn(src, registry)
        else:
            out, _ = ingest(src, registry, config=IngestConfig())
        out.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    writer = (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    slide_duration: str | None = None,
) -> DataFrame:
    """Watermarked window counts/sums per event_type — tumbling by
    default, sliding (overlapping windows, each event in
    duration/slide of them) when ``slide_duration`` is given. Works on
    both a stream (late data dropped past the watermark) and a static
    frame (watermark is a no-op) — used by the oracle check in batch
    mode and by the streaming test in stream mode."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    # batch fast path for epoch-aligned tumbling windows (r8): group
    # on a plain LONG epoch bucket instead of F.window's two-field
    # struct — same buckets, but the hash-aggregate key is one long
    # and the per-row window-struct/timestamp-truncation expression
    # tree disappears (r7's date_trunc key was 1.5x over the struct;
    # the long key is another 1.6x at 5M rows — the timestamp hash
    # key and the truncation expr were the remaining per-row cost).
    # The bucket is exact integer floor division: pmod makes the
    # numerator an exact multiple of the bucket width, so the double
    # division is exact (numerator < 2^53) — no round-to-nearest
    # boundary flips, negatives floor like F.window. Epoch buckets
    # are TZ-INDEPENDENT, exactly like F.window, so unlike the old
    # date_trunc key this path needs no UTC session gate. Streaming
    # keeps F.window (watermark eviction is keyed on the window
    # struct).
    bucket_us = {
        "1 second": 1_000_000,
        "1 minute": 60_000_000,
        "1 hour": 3_600_000_000,
        "1 day": 86_400_000_000,
    }.get(window_duration.strip().lower()) if not slide_duration else None
    ts_is_tz = dict(events.dtypes).get(ts_col) == "timestamp"
    if bucket_us is not None and ts_is_tz and not events.isStreaming:
        us = F.unix_micros(F.col(ts_col))
        hb = (
            (us - F.pmod(us, F.lit(bucket_us))) / F.lit(bucket_us)
        ).cast("long")
        return (
            src.groupBy(
                hb.alias("__hb"),
                "event_type",
            )
            .agg(
                F.count("*").alias("n_events"),
                F.round(F.sum("value"), 6).alias("sum_value"),
            )
            .select(
                F.timestamp_micros(
                    F.col("__hb") * F.lit(bucket_us)
                ).alias("window_start"),
                "event_type",
                "n_events",
                "sum_value",
            )
        )
    win = (
        F.window(F.col(ts_col), window_duration, slide_duration)
        if slide_duration
        else F.window(F.col(ts_col), window_duration)
    )
    return (
        src.groupBy(
            win.alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize_window(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Gap-based sessions via the native ``session_window`` aggregate —
    the streaming-ready form of ``sessionize`` (stateful session merge
    with watermark eviction on a stream; plain groupBy in batch).
    Output: (user, session_start, session_end, n_events) where
    session_end = last event + gap, matching Spark's session_window
    close semantics."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.groupBy(
            F.session_window(F.col(ts_col), f"{gap_minutes} minutes").alias(
                "w"
            ),
            F.col(user_col),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(user_col),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Batch sessionization: a new session starts when the gap from the
    user's previous event exceeds ``gap_minutes``. Window(lag)+cumsum —
    the standard relational form (streaming uses session_window)."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col)
    # microsecond-exact gap (no float/truncation ambiguity at the
    # threshold boundary — engine-portable)
    gap_us = gap_minutes * 60 * 1_000_000
    new_sess = (
        ts_micros(ts_col) - F.lag(ts_micros(ts_col)).over(w) > gap_us
    )
    return (
        events.withColumn(
            "__new", F.when(new_sess, 1).otherwise(0)
        )
        .withColumn(
            "session_id",
            F.sum("__new").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .drop("__new")
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    within: str = "3 days",
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-sequence funnel: users whose FIRST occurrence of each
    step strictly follows the previous step's match, with the whole
    sequence inside ``within`` of the first step's timestamp.

    Plan: step 1 is one per-user min; each later step is an equi-join
    on the user id + per-user min — k-1 joins all shuffling on the
    SAME key, so after the first exchange the co-partitioning is
    reused (and would be free on a user-bucketed store). No per-user
    event collection, so whale users cost nothing extra. Output:
    (step int, step_name, n_users long) — counts per completed prefix.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    iv = F.expr(f"INTERVAL {within}")
    ts = F.col(ts_col)
    reached = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts).alias("__t"))
        .withColumn("__deadline", F.col("__t") + iv)
    )
    levels = [reached]
    for s in steps[1:]:
        nxt = events.filter(F.col(type_col) == s).select(
            user_col, ts.alias("__ts")
        )
        prev = levels[-1]
        levels.append(
            nxt.join(prev, user_col)
            .filter(
                (F.col("__ts") > F.col("__t"))
                & (F.col("__ts") <= F.col("__deadline"))
            )
            .groupBy(user_col)
            .agg(
                F.min("__ts").alias("__t"),
                # per-user constant; min just keeps the agg deterministic
                F.min("__deadline").alias("__deadline"),
            )
        )
    counts = None
    for i, (name, lvl) in enumerate(zip(steps, levels)):
        one = lvl.agg(F.count("*").cast("long").alias("n_users")).select(
            F.lit(i + 1).alias("step"),
            F.lit(name).alias("step_name"),
            "n_users",
        )
        counts = one if counts is None else counts.unionByName(one)
    return counts


ROLLUP_GRAINS = ["hour", "day", "week"]


def rollup_hierarchy(
    events: DataFrame,
    grains: list[str] | None = None,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Hypertable-style continuous-aggregate hierarchy: the finest
    grain aggregates the raw events ONCE; every coarser grain
    re-aggregates the previous level's partial aggregates (counts sum,
    sums sum), never rescanning raw data — at 100 TB the raw table is
    read exactly once however many granularities are materialized.

    Output: (grain, bucket_start, <type_col>, n_events, sum_value),
    one row per (grain, bucket, type). Grains must be coarsening
    date_trunc units (e.g. hour → day → week).
    """
    grains = grains or ROLLUP_GRAINS
    level = (
        events.groupBy(
            F.date_trunc(grains[0], F.col(ts_col)).alias("bucket_start"),
            type_col,
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,6)")).alias("sum_value"),
        )
    )
    out = level.withColumn("grain", F.lit(grains[0]))
    for g in grains[1:]:
        level = (
            level.groupBy(
                F.date_trunc(g, F.col("bucket_start")).alias("bucket_start"),
                type_col,
            )
            .agg(
                F.sum("n_events").cast("long").alias("n_events"),
                F.sum("sum_value").alias("sum_value"),
            )
        )
        out = out.unionByName(level.withColumn("grain", F.lit(g)))
    return out.select(
        "grain", "bucket_start", type_col, "n_events", "sum_value"
    )


def throttle_events(
    events: DataFrame,
    min_gap_seconds: int,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """Telemetry rate-limit: drop an event arriving less than
    ``min_gap_seconds`` after the user's PREVIOUS RAW event (lag
    against the raw stream, ties kept). This is the stateless
    window-function form — one shuffle on user, then a per-user sort.

    Deliberately NOT the stateful "resets on every kept event"
    debounce (that recurrence is iterative: whether event n survives
    depends on which of 1..n-1 survived — the streaming state-store
    shape, see stateful.py); the raw-lag form is the standard batch
    throttle and is exactly reproducible by any SQL engine's LAG,
    which keeps it oracle-checkable. The first event of a user (lag
    NULL) is always kept. Ties on (ts) within a user are ordered by
    ``id_col`` so the kept set is deterministic.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(
        ts_micros(ts_col).asc(), F.col(id_col).asc()
    )
    gap_us = ts_micros(ts_col) - F.lag(ts_micros(ts_col)).over(w)
    return (
        # NULL-ts events dropped: they cannot be rate-limited, and
        # NULL sort position differs across engines (oracle parity)
        events.filter(F.col(ts_col).isNotNull())
        .withColumn("__gap_us", gap_us)
        .filter(
            F.col("__gap_us").isNull()
            | (F.col("__gap_us") >= min_gap_seconds * 1_000_000)
        )
        .drop("__gap_us")
    )


def peak_concurrency(
    events: DataFrame,
    duration_col: str = "value",
    ts_col: str = "ts",
    day_partitioned: bool = True,
    id_col: str = "event_id",
) -> DataFrame:
    """Sweep-line concurrency: treating each event as an interval
    [ts, ts + duration_col seconds), report per day the maximum
    number of simultaneously-open intervals and when it first occurs
    — the capacity-planning number for a serving fleet.

    Plan shape: each interval becomes a +1 row at its start and a -1
    row at its end (one projection + union, no join), then a running
    sum ordered by (time, delta, event_id) inside each day partition
    gives the active count at every boundary; a per-day argmax
    finishes. Day partitioning keeps the sort distributed (no
    single-partition global order) at the cost of attributing an
    interval that straddles midnight entirely to its START day —
    both its +1 and -1 carry the start's day, so every partition
    sees only matched pairs (running sums can never go negative and
    next-day peaks are never corrupted by orphan ends); pass
    day_partitioned=False for exact global sweep on small inputs.
    Ends sort BEFORE starts at the same instant (delta asc), so
    touching intervals [a,b) [b,c) never double-count.
    """
    from pyspark.sql import Window

    us = ts_micros(F.col(ts_col))
    # floor, not cast-truncate: floor() is identical across engines
    # for the oracle, while double->long casts round in some and
    # truncate in others
    dur_us = F.floor(
        F.col(duration_col).cast("double") * 1_000_000
    ).cast("long")
    # NULL ts/duration rows are dropped up front: a NULL boundary
    # would sort NULLS FIRST in Spark but NULLS LAST in most SQL
    # engines, and an interval without both endpoints has no
    # concurrency contribution anyway
    base = events.filter(
        F.col(ts_col).isNotNull() & F.col(duration_col).isNotNull()
    ).select(
        us.alias("__t"),
        dur_us.alias("__d"),
        F.col(id_col).alias("__eid"),
    )
    # Both deltas carry the START's day: a midnight-straddling
    # interval's -1 must land in the same partition as its +1, else
    # the next day's running sum starts with an orphan -1
    start_day = (
        F.to_date(F.timestamp_micros(F.col("__t")))
        if day_partitioned
        else F.lit(0)
    )
    base = base.withColumn("day", start_day)
    deltas = base.select(
        "day", F.col("__t"), F.lit(1).alias("__delta"), "__eid"
    ).unionByName(
        base.select(
            "day",
            (F.col("__t") + F.col("__d")).alias("__t"),
            F.lit(-1).alias("__delta"),
            "__eid",
        )
    )
    w = Window.partitionBy("day").orderBy(
        F.col("__t").asc(), F.col("__delta").asc(), F.col("__eid").asc()
    )
    swept = deltas.withColumn(
        "active", F.sum("__delta").over(w)
    ).withColumn(
        "__day_max", F.max("active").over(Window.partitionBy("day"))
    )
    return (
        swept.filter(F.col("active") == F.col("__day_max"))
        .groupBy("day")
        .agg(
            F.max("active").alias("peak_concurrency"),
            F.min("__t").alias("peak_at_us"),
        )
        .select("day", "peak_concurrency", "peak_at_us")
    )


def conversion_time_stats(
    events: DataFrame,
    from_type: str,
    to_type: str,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Funnel latency: per converting user, the time from their FIRST
    ``from_type`` event to their first ``to_type`` event AT OR AFTER
    it, summarized as exact quantiles + mean + count — the
    how-long-does-conversion-take number behind any funnel report.

    Plan: two per-user min-aggregations (each one map-side-combined
    shuffle on user, the same key, so co-partitioning is reused), an
    inner join keeping converters only, then a single global
    aggregate over n_converters rows. Exact sorting quantiles
    (percentile, not approx) — at 100 TB the per-user latencies
    relation is users-sized, and the one-row result makes the final
    exchange trivial. Output: one row
    (n_converters, mean_seconds, p<q>_seconds ...), seconds at
    microsecond precision.
    """
    us = ts_micros(F.col(ts_col))
    first_from = (
        events.filter(F.col(type_col) == from_type)
        .groupBy(user_col)
        .agg(F.min(us).alias("__t_from"))
    )
    to_events = events.filter(F.col(type_col) == to_type).select(
        F.col(user_col), us.alias("__t_to")
    )
    latencies = (
        first_from.join(to_events, user_col)
        .filter(F.col("__t_to") >= F.col("__t_from"))
        .groupBy(user_col)
        .agg(
            # __t_from is constant per user (it came from a min agg);
            # min() keeps the expression deterministic where first()
            # would be ordering-dependent
            (
                (F.min("__t_to") - F.min("__t_from")) / 1_000_000.0
            ).alias("__lat_s")
        )
    )
    aggs = [
        F.count("*").alias("n_converters"),
        F.round(F.avg("__lat_s"), 6).alias("mean_seconds"),
    ]
    labels = []
    for q in quantiles:
        # round, not int(): 0.29*100 is 28.999... in floats, and
        # int() truncation would mislabel the columns. Quantiles
        # finer than 1% keep their full value in the label (p99.9)
        # so e.g. 0.501 and 0.504 never collide
        pct = round(q * 100, 12)
        if abs(pct - round(pct)) < 1e-9:
            label = f"p{round(pct)}_seconds"
        else:
            # full 12-sig-fig value, sanitized to identifier chars
            # (dot/exponent/sign would need backtick-quoting in Spark
            # column refs); %g at 6 sig figs collided for quantiles
            # agreeing to 6 figures
            import re as _re

            label = "p{}_seconds".format(
                _re.sub(r"[^0-9a-zA-Z]", "_", "%.12g" % pct)
            )
        if label in labels:
            raise ValueError(
                f"quantiles {quantiles} produce duplicate column {label}"
            )
        labels.append(label)
        aggs.append(
            F.round(F.expr(f"percentile(__lat_s, {q})"), 6).alias(label)
        )
    return latencies.agg(*aggs)


def rolling_active_users(
    events: DataFrame,
    window_days: int = 7,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Rolling N-day distinct active users per day (the WAU/DAU
    family): for each day with activity, how many distinct users
    appeared in the ``window_days`` ending that day.

    Distinct-over-sliding-window does not decompose into partial
    aggregates, so the plan reduces FIRST (distinct (day, user) —
    corpus-sized shuffle happens once, on activity not raw events),
    then fans each activity row into the ≤N later days it keeps a
    user active in (explode over a day sequence — activity × N rows,
    tiny next to the raw stream), and counts distinct users per
    target day. Days with zero activity are absent (no dense day
    spine — join one in downstream if needed). Output:
    (day, active_users).
    """
    day = F.to_date(F.col(ts_col))
    activity = (
        events.filter(F.col(ts_col).isNotNull())
        .select(day.alias("__day"), F.col(user_col).alias("__user"))
        .distinct()
    )
    fanned = activity.select(
        F.explode(
            F.sequence(
                F.col("__day"),
                F.date_add(F.col("__day"), window_days - 1),
            )
        ).alias("day"),
        "__user",
    )
    # only days that themselves had activity are reportable windows
    active_days = activity.select(F.col("__day").alias("day")).distinct()
    return (
        fanned.join(active_days, "day")
        .groupBy("day")
        .agg(F.countDistinct("__user").alias("active_users"))
    )


def event_transitions(
    events: DataFrame,
    top_n: int | None = None,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order behavioral transition counts: for consecutive
    events of the same user (ordered by time, id tie-break), how
    often each (from_type → to_type) adjacency occurs — the Markov
    view of user behavior that funnels sample one path of.

    One shuffle on user for the lag window, then a map-side-combined
    count per (from, to) pair (≤ |types|² groups). Output:
    (from_type, to_type, n_transitions), optionally top-N by count
    (deterministic tie-break on the pair).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(
        ts_micros(F.col(ts_col)).asc(), F.col(id_col).asc()
    )
    out = (
        events.filter(F.col(ts_col).isNotNull())
        .withColumn("__prev", F.lag(type_col).over(w))
        .filter(F.col("__prev").isNotNull())
        .groupBy(
            F.col("__prev").alias("from_type"),
            F.col(type_col).alias("to_type"),
        )
        .agg(F.count("*").alias("n_transitions"))
    )
    if top_n is not None:
        out = out.orderBy(
            F.col("n_transitions").desc(),
            F.col("from_type").asc(),
            F.col("to_type").asc(),
        ).limit(top_n)
    return out

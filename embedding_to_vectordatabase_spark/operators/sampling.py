"""Deterministic sampling: train/val/test splits and source mixing.

Beyond-reference training-data extension. At 100 TB a split must be a
PURE FUNCTION of the row id — never `rand()` (changes across retries/
re-runs, breaks exactly-once semantics under task replay) and never a
global sort/shuffle. Both operators here map each row through an md5
of (seed, id) and compare the first 8 hex chars lexicographically
against cumulative thresholds: uniform, stable across engines
(the DuckDB oracle reproduces assignments bit-for-bit), map-only —
no shuffle, no state, embarrassingly parallel at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_SPLITS: list[tuple[str, float]] = [
    ("train", 0.9),
    ("val", 0.05),
    ("test", 0.05),
]

_HEX_SPACE = 16**8


def _bucket(id_col: str, seed: int) -> Column:
    """Uniform 8-hex-char bucket from (seed, id) — engine-portable.

    NULL ids produce a NULL bucket: F.concat propagates NULL exactly
    like SQL's `'seed:' || CAST(id AS VARCHAR)` (concat_ws would
    silently skip the NULL and hash the bare seed — an engine-
    divergent real assignment). Downstream: every `bucket < thr`
    comparison is NULL, so a NULL id deterministically takes the
    CASE/when residual — the LAST split label in
    ``deterministic_split``, dropped by ``mix_sources`` for any
    source listed in ``fractions`` — identically in every engine."""
    return F.substring(
        F.md5(
            F.concat(
                F.lit(str(seed)), F.lit(":"), F.col(id_col).cast("string")
            )
        ),
        1,
        8,
    )


def _thresholds(weights: list[tuple[str, float]]) -> list[tuple[str, str]]:
    total = sum(w for _, w in weights)
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    cum = 0.0
    out = []
    for name, w in weights[:-1]:
        cum += w / total
        out.append(
            (name, format(min(int(cum * _HEX_SPACE), _HEX_SPACE - 1), "08x"))
        )
    return out


def deterministic_split(
    df: DataFrame,
    weights: list[tuple[str, float]] | None = None,
    id_col: str = "doc_id",
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a split label, proportional to ``weights``
    (normalized), as a pure function of (seed, id): re-runs, task
    retries, and other engines all agree row-for-row. Weights are an
    ordered list — the LAST split takes the residual bucket range.
    NULL ids land in that residual split too (see ``_bucket``)."""
    weights = weights or DEFAULT_SPLITS
    b = _bucket(id_col, seed)
    expr = F.lit(weights[-1][0])
    for name, thr in reversed(_thresholds(weights)):
        expr = F.when(b < F.lit(thr), F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def mix_sources(
    df: DataFrame,
    fractions: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Down-sample each source to its mixing fraction (the corpus-
    weighting step of pretraining-data assembly): a row survives iff
    its (seed, id) bucket falls below its source's threshold. Sources
    absent from ``fractions`` are kept whole. Deterministic, map-only;
    the filter pushes into the scan alongside any other predicate."""
    b = _bucket(id_col, seed)
    keep = F.lit(True)
    for src, frac in fractions.items():
        thr = format(
            min(int(max(frac, 0.0) * _HEX_SPACE), _HEX_SPACE - 1), "08x"
        )
        keep = F.when(
            F.col(source_col) == src, b < F.lit(thr)
        ).otherwise(keep)
    return df.filter(keep)


def pack_sequences(
    df: DataFrame,
    budget_tokens: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    group_cols: list[str] | None = None,
    shards: int | None = None,
    out_col: str = "seq_id",
) -> DataFrame:
    """Assign each document to a fixed-budget training sequence — the
    concat-then-chunk packing step of pretraining-data assembly: docs
    are laid end-to-end in (group, id) order and ``seq_id`` is the
    index of the ``budget_tokens``-sized chunk the document STARTS in
    (GPT-style packing with wraparound; a doc may straddle its chunk
    boundary — the tokenizer downstream handles the split).

    Deterministic (pure function of the sorted id order, no rand) and
    SQL-mirrorable: seq = floor((cumsum(tokens) - tokens) / budget)
    over a per-group window. Output: input columns + ``<out_col>``
    (+ ``__shard`` when sharded); sequences are unique per
    (group..., shard, seq_id).

    Scale: the window partitions by ``group_cols`` — one group would
    serialize into one task, so at corpus scale pass ``shards`` to
    add a derived ``pmod(<id>, shards)`` subdivision: packing then
    parallelizes shards-wide per group at the cost of at most one
    underfilled trailing sequence per shard (negligible against
    millions of sequences)."""
    parts: list = list(group_cols or [])
    out = df
    if shards is not None:
        out = out.withColumn(
            "__shard", F.pmod(F.col(id_col).cast("long"), F.lit(shards))
        )
        parts.append("__shard")
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*parts) if parts else Window.partitionBy()
    ).orderBy(F.col(id_col))
    cum = F.sum(F.col(token_col).cast("long")).over(w)
    return out.withColumn(
        out_col,
        F.floor(
            (cum - F.col(token_col).cast("long"))
            / F.lit(int(budget_tokens))
        ).cast("long"),
    )


def weighted_sample(
    df: DataFrame,
    weight: Column,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Keep each row independently with probability
    ``clamp(weight, 0, 1)`` — quality-weighted corpus resampling (the
    importance-sampling step of pretraining-data assembly: keep docs
    proportionally to a quality/importance score) as a PURE FUNCTION
    of (seed, id). No rand() (stable under task retries and across
    engines), no shuffle — the filter is map-only and pushes into the
    scan alongside other predicates.

    Mechanism: the row's 8-hex (seed,id) bucket is compared against a
    per-row hex threshold lpad(hex(floor(p·16^8)), 8, '0') — the
    same lexicographic-hex comparison the fixed-fraction operators
    use, so a SQL oracle reproduces the kept set bit-for-bit. NULL
    weights and NULL ids drop the row (comparison is NULL)."""
    p = F.least(F.greatest(weight.cast("double"), F.lit(0.0)), F.lit(1.0))
    thr = F.lpad(
        F.lower(
            F.hex(F.floor(p * F.lit(float(_HEX_SPACE))).cast("bigint"))
        ),
        8,
        "0",
    )
    b = _bucket(id_col, seed)
    return df.filter(F.when(p >= 1.0, F.lit(True)).otherwise(b < thr))


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    id_col: str = "doc_id",
    descending: bool = True,
) -> DataFrame:
    """Top-k rows per group by a score column, deterministic tiebreak
    on ``id_col`` — the curation primitive behind "best N documents
    per source/domain/language" selection. Adds a ``rk`` column
    (1-based rank within the group).

    Scale shape: one shuffle on the group key; within each group the
    window is rank-and-filter (partial top-k does not apply to
    per-group limits, but group sizes — docs per source — are
    bounded by the grouping's own cardinality, and the filter prunes
    to k x n_groups rows immediately). Skewed groups: a single giant
    group serializes its own window; salt upstream if one group is
    the whole corpus.
    """
    direction = F.desc(order_col) if descending else F.asc(order_col)
    w = Window.partitionBy(*group_cols).orderBy(direction, F.asc(id_col))
    return df.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k
    )


def stratified_sample(
    df: DataFrame,
    group_cols: list[str],
    n_per_group: int,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """EXACTLY min(n, group size) rows per group, chosen by the
    deterministic (seed, id) hash order — the eval-set construction
    op ("300 held-out docs per language") where the fractional
    ``deterministic_split`` cannot guarantee exact counts on small
    strata. Pure function of (seed, id): stable across engines,
    retries, and row order; never rand().

    Mechanism: rank within group by (md5 bucket, id) and keep rank
    <= n — i.e. ``topk_per_group`` ordered by the hash. Same one-
    shuffle-on-group-key shape; the hash order is uniform so the
    sample is unbiased within each stratum. NULL ids sort after all
    real buckets (NULLS LAST in both engines' default ASC order is
    NOT portable — so NULL ids are dropped, documented like
    ``weighted_sample``)."""
    b = _bucket(id_col, seed)
    w = Window.partitionBy(*group_cols).orderBy(
        F.asc(b), F.asc(F.col(id_col))
    )
    return (
        df.filter(F.col(id_col).isNotNull())
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= n_per_group)
    )


def percentile_threshold_filter(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    p: float = 0.5,
) -> DataFrame:
    """Keep rows whose score reaches their GROUP's p-quantile — the
    relative quality cut ("keep above-median-quality docs per
    language") that an absolute threshold can't express when score
    distributions differ per stratum.

    Exact interpolated percentile (Spark ``percentile`` ==
    DuckDB/ANSI ``quantile_cont``). With an even group count the
    threshold is a midpoint strictly between two samples, so an
    engine's last-ulp interpolation difference cannot flip
    membership; with an odd count it IS a sample value, exact in both.
    Feed a rounded score column if the scores themselves are
    engine-derived doubles.

    Plan: one agg shuffle builds the per-group thresholds (one row
    per group — tiny), broadcast back onto the corpus; the corpus
    itself never shuffles and the filter composes with scan pruning.
    """
    thr = df.groupBy(*group_cols).agg(
        F.expr(f"percentile({score_col}, {p})").alias("__thr")
    )
    return (
        df.join(F.broadcast(thr), group_cols)
        .filter(F.col(score_col) >= F.col("__thr"))
        .drop("__thr")
    )


def token_budget_sample(
    df: DataFrame,
    group_cols: list[str],
    weight_col: str,
    budget: float,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Greedy per-group fill to a weight budget: within each group,
    rows are taken in the deterministic (seed, id) hash order until
    the cumulative ``weight_col`` (e.g. token count) would exceed
    ``budget`` — "give me ~1B tokens per source", the mixture-
    construction primitive one level finer than row-count sampling.

    A row is kept iff its INCLUSIVE cumulative sum is <= budget, so
    the fill never overshoots; a single row larger than the whole
    budget is dropped (its inclusive sum already exceeds it). NULL
    weights and NULL ids drop the row (documented like
    ``weighted_sample``).

    Scale shape: one hash shuffle on the group key, then a
    per-group sort window for the running sum — no global sort, no
    driver state; the hash order makes re-runs and engine mirrors
    bit-identical. Output: input columns + cum_weight.
    """
    b = _bucket(id_col, seed)
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.asc("__tb"), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.filter(
            F.col(id_col).isNotNull() & F.col(weight_col).isNotNull()
        )
        .withColumn("__tb", b)
        .withColumn("cum_weight", F.sum(weight_col).over(w))
        .filter(F.col("cum_weight") <= budget)
        .drop("__tb")
    )


def rank_normalize(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
    out_col: str = "pct_rank",
) -> DataFrame:
    """Percent-rank calibration of a score within each group — the
    cross-source normalizer for quality-weighted sampling: raw
    quality/perplexity scores from different sources (or different
    scorer models) are not comparable on their native scales, but
    their within-source percent ranks are. pct = (rank-1)/(n-1) in
    [0,1]; ties share a rank (engine-portable), single-row groups get
    0.0. Rows with a NULL score are dropped (NULL sort position is
    engine-specific, and an unscored row has no rank).

    Scale shape: one shuffle on the group key, per-group sort inside
    the window — distributed across groups. With ``group_col=None``
    the rank is global and the sort single-partition: fine for
    registry-sized frames, wrong for a corpus (pass a group).
    """
    w = (
        Window.partitionBy(group_col) if group_col else Window.partitionBy()
    ).orderBy(F.col(value_col).asc())
    return (
        df.filter(F.col(value_col).isNotNull())
        .withColumn(out_col, F.percent_rank().over(w))
    )


def grouped_split(
    df: DataFrame,
    group_col: str,
    weights: list[tuple[str, float]] | None = None,
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Leakage-safe train/val/test split: the bucket is a pure
    function of (seed, GROUP value) — domain, source, or a dup-
    cluster representative — so every row of a group lands in the
    SAME split. A row-hash split leaks: near-duplicates straddling
    train and test inflate eval scores, which is why production
    pretraining splits key on the dedup-cluster or domain, not the
    document (the standard fix for contamination-by-near-dup).
    Deterministic and map-only like ``deterministic_split`` — in
    fact it IS deterministic_split with the group value as the hash
    input; NULL group values land in the residual (last) split."""
    return deterministic_split(
        df, weights, id_col=group_col, seed=seed, out_col=out_col
    )


def temperature_mix(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Multinomial temperature resampling across groups (languages,
    sources): target share of group g moves from n_g/N (alpha=1,
    keep everything) toward uniform (alpha=0), via per-group keep
    rate r_g = (n_min/n_g)^(1-alpha) — subsample-only, the smallest
    group keeps 100%. This is the exponent-smoothed sampling used to
    keep head languages/domains from drowning the tail when
    assembling multilingual/multi-source pretraining mixtures
    (the alpha=0.5 "square-root sampling" case is the common
    default).

    Determinism: acceptance is (seed,id)-hash < r_g, the same pure
    decision rule as ``deterministic_split`` — retries and engines
    agree row-for-row. For alpha=0.5 the rate is sqrt(n_min/n_g):
    IEEE requires division and sqrt to be correctly rounded, so the
    rate — and therefore the accepted set — is bit-reproducible
    across engines (the oracle-gated configuration). Other alphas go
    through pow(), whose last ulp is engine-specific; the boundary
    row that could flip on that ulp is ~2^-32 per doc, fine for
    pipelines, not for a hash gate.

    Scale shape: one map-side-combined count aggregation over the
    group key, a groups-sized broadcast back, and a map-side filter
    — the corpus never shuffles. NULL groups are excluded from both
    the rate computation and the output (no defensible rate exists
    for them); NULL ids hash NULL and are dropped, matching
    ``_bucket``'s engine-portable NULL stance.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError("alpha must be in [0, 1]")
    present = df.filter(F.col(group_col).isNotNull())
    # collision-free temp name: df may legitimately carry __rate
    # (same guard class as bloom_anti_join's __bloom)
    rate_col = "__rate"
    while rate_col in df.columns:
        rate_col += "_"
    counts = present.groupBy(group_col).agg(F.count("*").alias("__n"))
    # n_min via a whole-relation window over the GROUPS-SIZED counts
    # (single partition of a few rows) instead of a separate
    # counts.agg() + crossJoin: the agg variant re-executes the
    # upstream subtree a second time (three corpus scans when
    # composed behind an expensive clean chain — measured in the
    # pretraining_mix plan audit; this form needs two: one for the
    # counts, one for the filtered pass-through)
    nmin = F.min("__n").over(Window.partitionBy())
    ratio = nmin.cast("double") / F.col("__n").cast("double")
    rate = (
        F.sqrt(ratio)
        if alpha == 0.5
        else F.pow(ratio, F.lit(1.0 - alpha))
    )
    rates = counts.select(group_col, rate.alias(rate_col))
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"tmix{seed}:"),
                        F.col(id_col).cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(_HEX_SPACE))
    )
    return (
        present.join(F.broadcast(rates), group_col)
        .filter(u < F.col(rate_col))
        .select(*df.columns)
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    alpha: float = 1.0,
    hash_fn: str = "md5",
    eager: bool = False,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169):
    score every raw-corpus document by how target-like it is under
    hashed n-gram feature distributions — the data-selection
    primitive for building a pretraining mixture that matches a
    small high-quality target (the paper's Wikipedia/books use
    case). weight(d) = sum over d's unigram+bigram features of
    ln(p_target(bucket) / p_raw(bucket)), both add-alpha-smoothed
    over ``n_buckets`` hash buckets.

    Determinism across engines: features hash through md5 hex →
    conv(hex,16,10) % n_buckets (the repo's portable bucket pattern;
    ``hash_fn='xxhash64'`` is the narrow production knob, same
    tradeoff as dedup_substrings); each bucket's log-ratio is rounded
    to 6dp and doc weights sum as DECIMAL (exact, order-insensitive —
    the bm25 technique), cast to double only on output.

    Scale shape: feature extraction is map-only (tokens + adjacent
    bigrams from one split, exploded); the two bucket-count aggs have
    map-side combine and their outputs are ≤ n_buckets rows —
    persist()ed, since both are referenced twice (totals + log-ratio
    join) and re-evaluation would re-tokenize the corpus — so the
    log-ratio table BROADCASTS to the scoring join; totals are 1-row
    agg crossJoins over the pinned count tables. The raw corpus is
    tokenized exactly twice (count build + scoring stream; the
    scoring reference is inherent), the target once. The per-doc
    weight agg's partial combine runs before its exchange (exploded
    features of a doc never shuffle raw), so the only corpus-sized
    exchange moves ~1 row per doc.
    Docs with no tokens produce no row (no features to score).
    Output: (doc_id, n_features long, dsir_weight double).

    Cache lifecycle: the two persisted count tables back the LAZY
    returned plan, so the operator cannot unpersist them itself —
    in the default mode the CALLER owns cleanup (materialize the
    result, then ``spark.catalog.clearCache()`` or re-call with
    ``eager=True``); repeated lazy calls in a long-lived session
    otherwise accumulate pinned ≤ n_buckets-row tables. With
    ``eager=True`` the count build runs AT CALL TIME: the log-ratio
    table (≤ n_buckets rows, the bounded-collect pattern) is
    collected and re-created as a literal DataFrame, both count
    tables are unpersisted before returning, and the returned plan
    holds no cache references — same values, two corpus passes
    either way (the paper's own two-pass structure).
    """
    def feats(df: DataFrame, idc: str) -> DataFrame:
        toks = F.filter(
            F.split(
                F.trim(F.lower(F.coalesce(text_col, F.lit("")))),
                r"\s+",
            ),
            lambda s: s != "",
        )
        staged = df.select(F.col(idc).alias("doc_id"), toks.alias("__ws"))
        ws = F.col("__ws")
        bigrams = F.when(
            F.size(ws) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(ws) - 1),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(ws, i),
                    F.element_at(ws, i + 1),
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        if hash_fn == "md5":
            def bucket(c):
                return (
                    F.conv(F.substring(F.md5(c), 1, 15), 16, 10)
                    .cast("long")
                    % n_buckets
                )
        elif hash_fn == "xxhash64":
            def bucket(c):
                return F.pmod(F.xxhash64(c), F.lit(n_buckets))
        else:
            raise ValueError(
                f"unknown hash_fn {hash_fn!r}; use md5|xxhash64"
            )
        return staged.select(
            "doc_id",
            F.explode(F.concat(ws, bigrams)).alias("__f"),
        ).select("doc_id", bucket(F.col("__f")).alias("b"))

    raw_bf = feats(raw, id_col)
    tgt_bf = feats(target, id_col)
    # the count tables are <= n_buckets rows but their INPUT is the
    # full corpus, and DataFrame self-references get no exchange
    # reuse here (r8 finding): each reference re-scans and
    # re-tokenizes. Both tables are referenced twice (totals + the
    # log-ratio join), so persist() pins the tiny table and the
    # extraction runs exactly once per corpus
    raw_c = raw_bf.groupBy("b").agg(F.count("*").alias("rc")).persist()
    tgt_c = tgt_bf.groupBy("b").agg(F.count("*").alias("tc")).persist()
    raw_tot = raw_c.agg(F.sum("rc").alias("tr"))
    tgt_tot = tgt_c.agg(F.sum("tc").alias("tt"))
    lr = (
        raw_c.join(tgt_c, "b", "left")
        .crossJoin(F.broadcast(raw_tot))
        .crossJoin(F.broadcast(tgt_tot))
        .select(
            "b",
            F.round(
                F.log(
                    (F.coalesce(F.col("tc"), F.lit(0)).cast("double")
                     + F.lit(alpha))
                    / (F.col("tt").cast("double")
                       + F.lit(alpha * n_buckets))
                )
                - F.log(
                    (F.col("rc").cast("double") + F.lit(alpha))
                    / (F.col("tr").cast("double")
                       + F.lit(alpha * n_buckets))
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("w"),
        )
    )
    if eager:
        lr_rows = lr.collect()  # ≤ n_buckets rows by construction
        lr_schema = lr.schema
        raw_c.unpersist()
        tgt_c.unpersist()
        lr = raw.sparkSession.createDataFrame(lr_rows, lr_schema)
    return (
        raw_bf.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_features"),
            F.sum("w").cast("double").alias("dsir_weight"),
        )
    )

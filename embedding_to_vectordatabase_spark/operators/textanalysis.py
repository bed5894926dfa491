"""Text analysis operators — training-data-pipeline extensions
(language ID, quality scoring, token counting, fingerprinting).

All native Column expressions: these run over every document at 100 TB
so they must stay inside whole-stage codegen — no Python, no shuffle
(pure map), predicates and projections push down to the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text

# marker-word heuristic language ID: tiny deterministic stand-in for a
# real n-gram model (rule table is data, swap for fasttext offline).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "with"],
    "de": ["der", "die", "das", "und", "mit"],
    "es": ["el", "la", "los", "con", "para"],
    "fr": ["le", "les", "des", "avec", "pour"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def _marker_hits(words: Column, markers: list[str]) -> Column:
    return F.size(
        F.filter(words, lambda w: w.isin(*markers))
    )


def lang_marker_scores(words: Column) -> Column:
    """All four languages' marker-hit counts in ONE traversal of the
    token array, packed into 16-bit lanes of a single long (marker
    sets are disjoint, so a token increments at most one lane). Lanes
    SATURATE at 65535: the increment is gated on the lane being below
    the cap, so a ~300 KB stopword-heavy document can no longer carry
    over into the next language's lane and flip the argmax.

    The per-language ``F.filter(...).size()`` form costs 4 traversals
    and 4 array allocations per row, and CASE WHEN argmax branches
    defeat codegen subexpression elimination, re-evaluating them —
    measured 14 s over 500k docs vs ~2 s for this form."""
    langs = list(LANG_MARKERS)

    def step(acc, w):
        out = F.lit(0).cast("long")
        for i, lang in enumerate(langs):
            lane_open = (
                F.shiftrightunsigned(acc, 16 * i)
                .bitwiseAND(F.lit(0xFFFF))
                < F.lit(0xFFFF)
            )
            out = F.when(
                w.isin(*LANG_MARKERS[lang]) & lane_open,
                F.lit(1 << (16 * i)).cast("long"),
            ).otherwise(out)
        return acc + out

    return F.aggregate(words, F.lit(0).cast("long"), step)


def lang_from_scores(text: Column, packed: Column) -> Column:
    """Argmax over the packed lane counts; first language wins ties
    (same order as LANG_MARKERS); 'und' when nothing matches; CJK
    short-circuits on unified-ideograph chars."""
    langs = list(LANG_MARKERS)
    scores = [
        F.shiftrightunsigned(packed, 16 * i).bitwiseAND(F.lit(0xFFFF)).cast("int")
        for i in range(len(langs))
    ]
    best = F.greatest(*scores)
    pred = F.when(
        best > 0,
        F.element_at(
            F.array(*[F.lit(lang) for lang in langs]),
            F.array_position(F.array(*scores), best).cast("int"),
        ),
    ).otherwise(F.lit("und"))
    return F.when(
        text.rlike("[一-龥]"), F.lit("zh")
    ).otherwise(pred)


def lang_stop_kernel_udf():
    """The fused Arrow kernel computing ``lang_marker_scores`` +
    ``quality_score``'s stopword fold over per-doc word-HASH arrays
    (r18, guide S4.2): marker/stopword hashes are precomputed
    driver-side with the bit-exact ``xxh64_bytes`` so membership on
    ``xxhash64(word)`` longs matches the string ``isin`` folds
    value-for-value (equality pinned in tests). See
    functions.hashkernel.lang_stop_scores_udf for the kernel body."""
    import numpy as np

    from ..functions.hashkernel import lang_stop_scores_udf, xxh64_bytes

    lang_h = [
        np.array(
            [xxh64_bytes(w.encode("utf-8")) for w in LANG_MARKERS[lang]],
            dtype=np.int64,
        )
        for lang in LANG_MARKERS
    ]
    stop_h = np.array(
        [xxh64_bytes(w.encode("utf-8")) for w in STOPWORDS],
        dtype=np.int64,
    )
    return lang_stop_scores_udf(lang_h, stop_h)


def lang_id(text: Column) -> Column:
    """Predicted language = argmax of marker-word hits; 'und'
    (undetermined) when nothing matches. CJK short-circuits on the
    presence of unified-ideograph chars."""
    words = F.split(normalize_text(text), " ")
    return lang_from_scores(text, lang_marker_scores(words))


def quality_score(
    text: Column,
    words: Column | None = None,
    stop_hits: Column | None = None,
    n_words: Column | None = None,
) -> Column:
    """Heuristic quality in [0,1]: length band + punctuation ratio +
    stopword ratio (the classic C4/Gopher-style cheap filters).

    Pass the tokenized ``words`` when the caller already computed it
    (profile_documents does) to avoid re-tokenizing per metric; pass
    precomputed ``stop_hits`` (+ ``n_words``) when the stopword count
    already exists — the r18 kernel path computes it alongside the
    language scores, and the interpreted fold here is what it
    replaces."""
    t = F.coalesce(text, F.lit(""))
    n = F.length(t)
    if words is None and (stop_hits is None or n_words is None):
        words = F.split(normalize_text(t), " ")
    if n_words is None:
        n_words = F.size(words)
    # translate beats a regex character-class scan; counts the same set
    punct = n - F.length(F.translate(t, ".,;:!?。，；！？", ""))
    punct_ratio = punct / F.greatest(n, F.lit(1))
    if stop_hits is None:
        # single-traversal count (F.filter would allocate a filtered
        # array)
        stop_hits = F.aggregate(
            words,
            F.lit(0),
            lambda acc, w: acc
            + F.when(w.isin(*STOPWORDS), 1).otherwise(0),
        )
    stop_ratio = stop_hits / F.greatest(n_words, F.lit(1))
    len_score = F.when(n < 50, n / 50.0).when(
        n > 10000, F.lit(0.5)
    ).otherwise(F.lit(1.0))
    punct_score = F.when(punct_ratio > 0.3, F.lit(0.0)).otherwise(
        F.lit(1.0) - punct_ratio / 0.3
    )
    stop_score = F.least(stop_ratio * 5.0, F.lit(1.0))
    return F.round(
        0.4 * len_score + 0.3 * punct_score + 0.3 * stop_score, 6
    )


def doc_fingerprint(text: Column, words: Column | None = None) -> Column:
    """Order-insensitive content fingerprint: md5 of the sorted
    distinct word set — catches shuffled/re-ordered copies that exact
    hashing misses."""
    if words is None:
        words = F.split(normalize_text(text), " ")
    return F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(words)))
    )


# RE2-compatible (no lookaround) so Java/Spark and RE2-based tooling
# redact identically; ordered so the email rule wins before the
# looser phone digits can eat parts of it.
#
# Phone rules require an explicit telephone cue — a leading +country
# code, a parenthesized area code, or hyphenated 3-3/4-4 or 3-4 digit
# groups — never a bare digit/space run (the earlier
# \+?\d[\d()\- ]{7,}\d ate year lists like '2024 2025 2026', ID
# sequences and tabular numbers, while missing 7-digit locals).
# Residual false-positive risk, accepted and documented: a 3-4 digit
# hyphenated range in prose ('pages 100-2000') reads as a local
# number. Digit totals are bounded by the group widths (~3-19).
PII_RULES: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    # +intl, optional (area), 1-4 separated groups: +1 (555) 123-4567
    (r"\+\d{1,4}([ -]?\(\d{1,4}\))?([ -]?\d{2,4}){1,4}", "[PHONE]"),
    # parenthesized area code without +: (415) 555-1234
    (r"\(\d{2,4}\)[ -]?\d{3,4}[ -]?\d{3,4}", "[PHONE]"),
    # hyphenated groups: 415-555-1234 / 555-1234 (the SSN 3-2-4 shape
    # was already consumed by the rule above; dates 2024-08-14 can't
    # match the leading \b\d{3}-)
    (r"\b\d{3}-\d{3,4}-\d{4}\b", "[PHONE]"),
    (r"\b\d{3}-\d{4}\b", "[PHONE]"),
]


def redact_pii(text: Column) -> Column:
    """Scrub common PII spans (emails, SSNs, phone-like digit runs)
    with typed placeholders — the standard pre-training redaction
    pass. Chained native regexp_replace: map-only, whole-stage
    codegen, rule order fixed (see PII_RULES)."""
    out = F.coalesce(text, F.lit(""))
    for pat, repl in PII_RULES:
        out = F.regexp_replace(out, pat, repl)
    return out


def repetition_score(text: Column, n: int = 3) -> Column:
    """Gopher-style within-document repetition: the fraction of
    word n-grams that are repeats of an earlier n-gram in the SAME
    document (0 = all distinct, → 1 = highly repetitive boilerplate).
    Documents shorter than n words score 0. One native expression —
    no shuffle, no UDF."""
    words = F.split(normalize_text(text), " ")
    nw = F.size(words)
    total = nw - (n - 1)
    sh = F.transform(
        F.sequence(F.lit(1), total),
        lambda i: F.concat_ws(" ", F.slice(words, i, n)),
    )
    # the WHEN guard keeps sequence() off the short-doc branch, where
    # 1 > total would generate a DESCENDING sequence
    return F.when(nw < F.lit(n), F.lit(0.0)).otherwise(
        F.round(
            1.0 - F.size(F.array_distinct(sh)) / total.cast("double"), 6
        )
    )


def profile_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    kernel: bool = True,
) -> DataFrame:
    """One-pass per-document text profile (map-only; under-parallel
    inputs re-spread so the regex-heavy pass uses every core).

    ``kernel=True`` (r18): the two interpreted scoring folds (language
    marker lanes + stopword count) run as one Arrow kernel over the
    word-hash array; values identical to the native folds (pinned in
    tests), which ``kernel=False`` keeps."""
    from ..util import ensure_parallelism

    df = ensure_parallelism(df)
    t = F.col(text_col)
    words = F.split(normalize_text(t), " ")
    # Two-stage select: __words / __scores are non-cheap aliases used
    # more than once downstream, so CollapseProject keeps the stage
    # boundary and each evaluates ONCE per row (inlining them would
    # re-tokenize per consumer, and CASE WHEN branches block codegen
    # subexpression elimination).
    if kernel:
        staged = df.select(
            F.col(id_col), t.alias("__t"), words.alias("__words")
        ).withColumn(
            "__ls",
            lang_stop_kernel_udf()(
                F.transform(F.col("__words"), lambda w: F.xxhash64(w))
            ),
        )
        scores = F.col("__ls.scores")
        stop_hits = F.col("__ls.stop_hits")
    else:
        staged = df.select(
            F.col(id_col),
            t.alias("__t"),
            words.alias("__words"),
            lang_marker_scores(words).alias("__scores"),
        )
        scores = F.col("__scores")
        stop_hits = None
    tt = F.col("__t")
    ww = F.col("__words")
    return staged.select(
        F.col(id_col),
        F.length(tt).alias("n_chars"),
        F.size(ww).alias("n_tokens"),
        F.size(F.array_distinct(ww)).alias("n_distinct_tokens"),
        lang_from_scores(tt, scores).alias("pred_lang"),
        quality_score(
            tt, ww, stop_hits=stop_hits, n_words=F.size(ww)
        ).alias("quality"),
        doc_fingerprint(tt, ww).alias("fingerprint"),
    )


def bigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document mean log-probability under the corpus's OWN
    add-alpha-smoothed bigram model — the perplexity-proxy quality
    filter (the role CCNet gives a pretrained KenLM) computable with
    no external model: boilerplate and fluent text score high,
    gibberish and OCR noise score low, relative to the corpus itself.

    score(d) = avg over adjacent token pairs (w1, w2) of
      ln( (c(w1,w2) + alpha) / (start(w1) + alpha * V) )
    where c is the corpus bigram count, start(w1) the count of w1 in
    a bigram-initial position, and V the unigram vocabulary size.

    Determinism across engines: each per-bigram log term is rounded
    to 6dp and summed as DECIMAL(18,6) (exact, order-insensitive —
    same technique as bm25_topk), with only the final mean cast back
    to double. Docs with fewer than two tokens produce no row.

    Scale shape: bigram extraction is map-only (array transform over
    the split, no self-join). The model build aggregates bigrams with
    map-side partial combine, then denormalizes start(w1) onto the
    bigram table with a join whose cardinality is VOCABULARY-bounded
    (distinct successors per w1), never corpus-bounded. Scoring is one
    equi-join of doc bigrams against the model on (w1, w2) — a
    well-distributed key. V is a 1-row agg crossJoin-broadcast.
    Output: (<id_col>, n_bigrams, lm_score).
    """
    words = F.filter(
        F.split(
            F.trim(F.lower(F.coalesce(text_col, F.lit("")))), r"\s+"
        ),
        lambda s: s != "",
    )
    ws = F.col("__ws")
    pairs = F.transform(
        F.sequence(F.lit(0), F.size(ws) - 2),
        lambda i: F.struct(
            F.element_at(ws, i + 1).alias("w1"),
            F.element_at(ws, i + 2).alias("w2"),
        ),
    )
    doc_bigrams = (
        df.select(F.col(id_col).alias("doc_id"), words.alias("__ws"))
        .filter(F.size("__ws") >= 2)
        .select("doc_id", F.explode(pairs).alias("bg"))
        .select(
            "doc_id",
            F.col("bg.w1").alias("w1"),
            F.col("bg.w2").alias("w2"),
        )
    )
    bigram_counts = doc_bigrams.groupBy("w1", "w2").agg(
        F.count("*").alias("c_bg")
    )
    start_counts = bigram_counts.groupBy("w1").agg(
        F.sum("c_bg").alias("c_start")
    )
    vocab = doc_bigrams.select(
        F.explode(F.array("w1", "w2")).alias("w")
    ).agg(F.countDistinct("w").alias("v"))
    model = bigram_counts.join(start_counts, "w1").crossJoin(
        F.broadcast(vocab)
    )
    term = F.round(
        F.log(
            (F.col("c_bg").cast("double") + F.lit(alpha))
            / (
                F.col("c_start").cast("double")
                + F.lit(alpha) * F.col("v").cast("double")
            )
        ),
        6,
    ).cast("decimal(18,6)")
    return (
        doc_bigrams.join(model, ["w1", "w2"])
        .select("doc_id", term.alias("__t"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            (
                F.sum("__t").cast("double") / F.count("*")
            ).alias("lm_score"),
        )
    )


def dup_line_stats(
    df: DataFrame, text: Column, id_cols: list[str] | None = None
) -> DataFrame:
    """Gopher-style duplicate-LINE signals per document (Rae et al.
    2021 repetition filters, the line-level complement of the n-gram
    ``repetition_score``). Output: (*id_cols, n_lines,
    dup_line_frac, dup_line_char_frac) where

    - ``n_lines``: non-empty trimmed lines;
    - ``dup_line_frac``: fraction of lines that are repeats of an
      earlier identical line — boilerplate navigation/footer pages
      score high;
    - ``dup_line_char_frac``: fraction of line CHARACTERS inside
      duplicated lines (ALL occurrences counted) — the char-mass
      variant that catches a page whose one huge line repeats.

    Native expressions, no shuffle, no UDF, bit-identical across
    engines (6dp-rounded for oracle parity). This is a DataFrame
    operator, not a Column function, ON PURPOSE: the sorted line
    list and the duplicate set are each consumed many times by
    downstream lambdas, and a single-projection formulation inlines
    them into EVERY lambda evaluation (the array re-sorts per
    element; measured ~0.3 s/row at 55 lines). Staging each
    intermediate as a multi-referenced alias in its own select keeps
    CollapseProject from inlining, so every stage evaluates once per
    row — the same barrier pattern as profile_documents.
    """
    ids = list(id_cols or ["doc_id"])
    lines = F.filter(
        F.transform(
            F.split(F.coalesce(text, F.lit("")), "\n"),
            lambda s: F.trim(s),
        ),
        lambda s: s != "",
    )
    staged = df.select(*ids, lines.alias("__lines"))
    sorted_ = staged.select(
        *ids,
        "__lines",
        F.array_sort("__lines").alias("__sl"),
        F.size("__lines").alias("__n"),
    )
    # adjacent-equal after sort == appears more than once; the WHEN
    # guard keeps sequence() off n<2 (1 > n-1 would generate a
    # DESCENDING sequence)
    pairs = F.when(
        F.col("__n") >= 2, F.sequence(F.lit(1), F.col("__n") - 1)
    ).otherwise(F.array().cast("array<int>"))
    with_dups = sorted_.select(
        *ids,
        "__lines",
        "__n",
        F.array_distinct(
            F.filter(
                F.transform(
                    pairs,
                    lambda i: F.when(
                        F.element_at(F.col("__sl"), i)
                        == F.element_at(F.col("__sl"), i + 1),
                        F.element_at(F.col("__sl"), i),
                    ),
                ),
                lambda x: x.isNotNull(),
            )
        ).alias("__dup_set"),
    )
    total_chars = F.aggregate(
        F.col("__lines"),
        F.lit(0).cast("long"),
        lambda acc, l: acc + F.length(l),
    )
    dup_chars = F.aggregate(
        F.col("__lines"),
        F.lit(0).cast("long"),
        lambda acc, l: acc
        + F.when(
            F.array_contains(F.col("__dup_set"), l), F.length(l)
        ).otherwise(F.lit(0)),
    )
    return with_dups.select(
        *ids,
        F.col("__n").alias("n_lines"),
        F.round(
            (F.col("__n") - F.size(F.array_distinct("__lines"))).cast(
                "double"
            )
            / F.greatest(F.col("__n"), F.lit(1)).cast("double"),
            6,
        ).alias("dup_line_frac"),
        F.round(
            dup_chars.cast("double")
            / F.greatest(total_chars, F.lit(1)).cast("double"),
            6,
        ).alias("dup_line_char_frac"),
    )


def dup_ngram_stats(
    df: DataFrame,
    text: Column,
    n: int = 2,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Gopher-style duplicate-N-GRAM signals per document (Rae et
    al. 2021 §A1.1 repetition filters — the n-gram complement of
    ``dup_line_stats``). Output: (*id_cols, n_ngrams,
    top_ngram_count, top_ngram_frac, dup_ngram_frac) where

    - ``n_ngrams``: word n-grams in the document (lowercase
      whitespace tokens, n-grams joined by one space);
    - ``top_ngram_count``: occurrences of the most frequent n-gram
      (smallest-lexicographic wins ties — deterministic);
    - ``top_ngram_frac``: character mass of that n-gram (count x
      its length) over the total n-gram character mass — Gopher's
      "fraction of characters contained within the most
      frequently-occurring n-gram" under an explicit, engine-exact
      denominator (total n-gram chars, not raw doc chars, so the
      statistic is insensitive to tokenizer whitespace details);
    - ``dup_ngram_frac``: character mass of ALL n-grams occurring
      more than once (every occurrence counted) over the same
      denominator — the "fraction of characters within duplicate
      n-grams" signal.

    Native expressions, map-only, no shuffle, no UDF: the n-gram
    array is sorted once per row and the run-length statistics come
    from ONE ``aggregate`` pass over it (adjacent-equal run
    tracking in a struct accumulator). Each intermediate is staged
    as a multi-referenced alias in its own select so CollapseProject
    cannot inline the sort into per-element lambdas (the
    profile_documents / dup_line_stats barrier pattern). Docs with
    fewer than n tokens produce n_ngrams = 0 and zero fractions.
    6dp rounds for cross-engine oracle parity.
    """
    ids = list(id_cols or ["doc_id"])
    toks = F.filter(
        F.split(F.trim(F.lower(F.coalesce(text, F.lit("")))), r"\s+"),
        lambda s: s != "",
    )
    staged = df.select(*ids, toks.alias("__toks"))
    grams = F.when(
        F.size("__toks") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("__toks") - F.lit(n - 1)),
            lambda i: F.concat_ws(
                " ", F.slice(F.col("__toks"), i, n)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    with_grams = staged.select(*ids, grams.alias("__grams"))
    sorted_ = with_grams.select(
        *ids,
        F.size("__grams").alias("__ng"),
        F.array_sort("__grams").alias("__sg"),
    )
    # one linear pass over the sorted grams: track the current run
    # (gram, length) and fold finished runs into (top count / top
    # mass under the deterministic tie-break, duplicated char mass,
    # total char mass). The zero-value state marks "no run yet".
    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("top_cnt"),
        F.lit(0).cast("long").alias("top_mass"),
        F.lit(0).cast("long").alias("dup_mass"),
        F.lit(0).cast("long").alias("tot_mass"),
    )

    def _close_run(acc):
        # fold the finished run into the rolling stats
        run_mass = acc["run"] * F.length(acc["prev"])
        new_top = acc["run"] > acc["top_cnt"]
        return (
            F.when(new_top, acc["run"]).otherwise(acc["top_cnt"]),
            F.when(new_top, run_mass).otherwise(acc["top_mass"]),
            acc["dup_mass"]
            + F.when(acc["run"] >= 2, run_mass).otherwise(F.lit(0)),
            acc["tot_mass"] + run_mass,
        )

    def _step(acc, x):
        same = (acc["run"] > 0) & (x == acc["prev"])
        tc, tm, dm, tot = _close_run(acc)
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            F.when(same, acc["top_cnt"]).otherwise(tc).alias("top_cnt"),
            F.when(same, acc["top_mass"]).otherwise(tm).alias("top_mass"),
            F.when(same, acc["dup_mass"]).otherwise(dm).alias("dup_mass"),
            F.when(same, acc["tot_mass"]).otherwise(tot).alias("tot_mass"),
        )

    def _finish(acc):
        tc, tm, dm, tot = _close_run(acc)
        return F.struct(
            tc.alias("top_cnt"),
            tm.alias("top_mass"),
            dm.alias("dup_mass"),
            tot.alias("tot_mass"),
        )

    stats = sorted_.select(
        *ids,
        "__ng",
        F.aggregate(F.col("__sg"), zero, _step, _finish).alias("__st"),
    )
    tot = F.greatest(F.col("__st.tot_mass"), F.lit(1)).cast("double")
    return stats.select(
        *ids,
        F.col("__ng").alias("n_ngrams"),
        F.col("__st.top_cnt").alias("top_ngram_count"),
        F.round(F.col("__st.top_mass").cast("double") / tot, 6).alias(
            "top_ngram_frac"
        ),
        F.round(F.col("__st.dup_mass").cast("double") / tot, 6).alias(
            "dup_ngram_frac"
        ),
    )


def c4_quality_signals(
    df: DataFrame,
    text: Column,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """C4-style heuristic quality signals per document (Raffel et
    al. 2020 §2.2 cleaning rules re-expressed as SIGNALS, so the
    caller picks thresholds instead of inheriting C4's hard-coded
    drops). Output: (*id_cols, n_words, n_sentences,
    terminal_punct_line_frac, mean_words_per_line, has_curly_brace,
    has_lorem_ipsum, short_line_frac) where

    - ``n_words``: whitespace tokens in the document;
    - ``n_sentences``: terminal-punctuation segments (., !, ?) with
      non-blank content — the "at least 3 sentences" rule's count;
    - ``terminal_punct_line_frac``: fraction of non-empty lines
      ending in terminal punctuation (optionally followed by
      closing quotes/brackets) — C4 keeps only such lines;
    - ``mean_words_per_line``: C4 drops pages of short navigation
      fragments;
    - ``has_curly_brace``: the "{" code-page marker;
    - ``has_lorem_ipsum``: placeholder-text marker;
    - ``short_line_frac``: fraction of non-empty lines under 3
      words (menu/footer shape).

    Native expressions, map-only, no shuffle, no UDF; the trimmed
    non-empty line array is staged once and reused by every
    line-level signal (the profile_documents barrier pattern);
    6dp rounds for oracle parity. Documents with no non-empty
    lines report zero fractions.
    """
    ids = list(id_cols or ["doc_id"])
    t = F.coalesce(text, F.lit(""))
    lines = F.filter(
        F.transform(F.split(t, "\n"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    staged = df.select(*ids, t.alias("__t"), lines.alias("__lines"))
    tt = F.col("__t")
    ll = F.col("__lines")
    n_lines = F.size(ll)
    denom = F.greatest(n_lines, F.lit(1)).cast("double")

    def _line_words(line):
        return F.size(
            F.filter(F.split(line, r"\s+"), lambda s: s != "")
        )

    def _terminal(line):
        return line.rlike("[.!?][\"')\\]]*$")

    return staged.select(
        *ids,
        F.size(
            F.filter(F.split(F.trim(tt), r"\s+"), lambda s: s != "")
        ).alias("n_words"),
        F.size(
            F.filter(
                F.split(tt, "[.!?]+"), lambda s: F.trim(s) != ""
            )
        ).alias("n_sentences"),
        F.round(
            F.size(F.filter(ll, _terminal)).cast("double") / denom, 6
        ).alias("terminal_punct_line_frac"),
        F.round(
            F.when(
                n_lines > 0,
                F.aggregate(
                    ll,
                    F.lit(0).cast("long"),
                    lambda acc, line: acc + _line_words(line),
                ).cast("double")
                / denom,
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("mean_words_per_line"),
        tt.contains("{").alias("has_curly_brace"),
        F.lower(tt).contains("lorem ipsum").alias("has_lorem_ipsum"),
        F.round(
            F.size(
                F.filter(ll, lambda line: _line_words(line) < 3)
            ).cast("double")
            / denom,
            6,
        ).alias("short_line_frac"),
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-k keyterms by smoothed TF-IDF — the keyword
    / topic-surface extraction pass of a curation pipeline (the
    document-centric complement of ``search.bm25_topk``, which scores
    documents against a QUERY; this ranks each document's own terms).

    score(d, t) = tf(d, t) * idf(t),
    idf(t) = ln((1 + N) / (1 + df(t))) + 1   (sklearn's smooth_idf,
    strictly positive so corpus-universal terms still rank behind
    rarer ones instead of vanishing to exactly 0 and tying on token).

    Determinism across engines: idf is rounded to 6dp BEFORE the tf
    product, the product is rounded to 6dp and ranked as
    DECIMAL(18,6) (exact ordering, no double ulp ties), token ASC
    tie-break; score is returned as double.

    Scale shape: the corpus text is tokenized exactly ONCE —
    tf is one shuffle on (doc_id, token) with map-side partial
    combine, and df(t) comes from a count window PARTITIONED BY
    token over the tf rows (already distinct per (doc, token), so
    count(*) == docs containing t; a groupBy-then-join spelling of
    the same df re-scans and re-tokenizes the corpus because
    DataFrame self-references get no exchange reuse here — verified
    on the physical plan, same finding as the r8 self-join audit);
    N is a 1-row agg over the pruned id column broadcast by
    crossJoin; top-k is a WindowGroupLimit-pruned row_number window
    partitioned by doc_id — all well-distributed keys, nothing
    corpus-quadratic, no Python.

    Output: (doc_id, token, tf, score, rank), rank 1..k per doc.
    """
    from pyspark.sql import Window

    toks = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.split(
                    F.trim(F.lower(F.coalesce(text_col, F.lit("")))),
                    r"\s+",
                )
            ).alias("token"),
        )
        .filter(F.col("token") != "")
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    wdf = Window.partitionBy("token")
    n_docs = df.select(
        F.countDistinct(id_col).alias("n_docs")
    )
    idf = F.round(
        F.log(
            (F.lit(1.0) + F.col("n_docs").cast("double"))
            / (F.lit(1.0) + F.col("df").cast("double"))
        )
        + F.lit(1.0),
        6,
    )
    scored = (
        tf.withColumn("df", F.count("*").over(wdf))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            "tf",
            F.round(F.col("tf").cast("double") * idf, 6)
            .cast("decimal(18,6)")
            .alias("__s"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("__s").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id",
            "token",
            "tf",
            F.col("__s").cast("double").alias("score"),
            "rank",
        )
    )


def pmi_collocations(
    df: DataFrame,
    min_count: int = 5,
    top_n: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    eager: bool = False,
) -> DataFrame:
    """Top collocations (adjacent word pairs) by pointwise mutual
    information (Church & Hanks 1990) — the classic corpus-analysis
    pass for multiword expressions ("new york", "machine learning"):
    PMI scores how much more often a pair co-occurs than its words'
    frequencies predict. Beyond-reference extension: phrase discovery
    feeds tokenizer-vocab curation and boilerplate detection in
    LLM-pipeline corpora.

        pmi(x, y) = ln( (c(x,y) / n_pairs) / ((c(x)/n) * (c(y)/n)) )

    with c(x,y) = adjacent-pair count, c(x) = token count, n = total
    tokens, n_pairs = total adjacent pairs. ``min_count`` floors the
    PAIR count (rare pairs have unreliable, explosive PMI).

    Determinism across engines: pmi is rounded to 6dp and ranked as
    DECIMAL(18,6) with (w1, w2) ASC tie-break (the tfidf technique).

    Scale shape: the corpus is tokenized and exploded exactly ONCE —
    each token emits one (w, next_w) struct (next_w NULL at doc end
    via try_element_at, so every token is the FIRST element of
    exactly one pair), and ONE map-side-combined shuffle produces the
    pair-count table. Everything downstream reads that table, never
    the corpus: unigram counts are sum(c12) grouped by w1 (each token
    is counted once as a first element), n and n_pairs are 1-row aggs
    over the count tables, and the two c(x)/c(y) lookups are
    equi-joins between vocabulary-scale tables. The pair-count table
    is persist()ed because it is referenced four times and DataFrame
    self-references get no exchange reuse (the r8 finding — without
    the pin each reference would re-tokenize the corpus). Cache
    lifecycle: vocabulary-pair-scale (bounded by distinct adjacent
    pairs, far below corpus scale) — in the default lazy mode the
    caller owns cleanup after materializing, same contract as
    dsir_weights' lazy mode. With ``eager=True`` the whole query runs
    AT CALL TIME: the result is top_n rows by construction (the
    bounded-collect pattern), so it is collected, the pair-count
    cache is unpersisted before returning, and the returned
    DataFrame holds no cache references.

    Output: (w1, w2, n_pair, pmi double), top_n rows by pmi DESC —
    orderBy+limit compiles to TakeOrderedAndProject (per-partition
    heaps, no global sort).
    """
    toks = F.filter(
        F.split(
            F.trim(F.lower(F.coalesce(text_col, F.lit("")))), r"\s+"
        ),
        lambda s: s != "",
    )
    staged = df.select(toks.alias("__ws")).filter(F.size("__ws") > 0)
    ws = F.col("__ws")
    pairs_col = F.transform(
        F.sequence(F.lit(1), F.size(ws)),
        lambda i: F.struct(
            F.element_at(ws, i).alias("w1"),
            F.try_element_at(ws, i + 1).alias("w2"),
        ),
    )
    pc = (
        staged.select(F.explode(pairs_col).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
        .persist()
    )
    uni = pc.groupBy("w1").agg(F.sum("c12").alias("c"))
    tot = uni.agg(
        F.sum("c").cast("double").alias("n_tokens")
    )
    tot_pairs = pc.filter(F.col("w2").isNotNull()).agg(
        F.sum("c12").cast("double").alias("n_pairs")
    )
    pmi = F.round(
        F.log(
            (F.col("c12").cast("double") / F.col("n_pairs"))
            / (
                (F.col("c1").cast("double") / F.col("n_tokens"))
                * (F.col("c2").cast("double") / F.col("n_tokens"))
            )
        ),
        6,
    ).cast("decimal(18,6)")
    out = (
        pc.filter(
            F.col("w2").isNotNull() & (F.col("c12") >= min_count)
        )
        .join(
            uni.select(F.col("w1").alias("__u1"), F.col("c").alias("c1")),
            F.col("w1") == F.col("__u1"),
        )
        .join(
            uni.select(F.col("w1").alias("__u2"), F.col("c").alias("c2")),
            F.col("w2") == F.col("__u2"),
        )
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(tot_pairs))
        .select(
            "w1",
            "w2",
            F.col("c12").alias("n_pair"),
            pmi.alias("__pmi"),
        )
        .orderBy(
            F.col("__pmi").desc(), F.col("w1").asc(), F.col("w2").asc()
        )
        .limit(top_n)
        .select(
            "w1", "w2", "n_pair",
            F.col("__pmi").cast("double").alias("pmi"),
        )
    )
    if eager:
        rows = out.collect()  # <= top_n rows by construction
        schema = out.schema
        pc.unpersist()
        return df.sparkSession.createDataFrame(rows, schema)
    return out


def word_entropy(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document Shannon entropy of the word distribution — a
    quality/diversity signal (low entropy = repetitive or templated
    text, e.g. keyword-stuffed spam; filters on it appear throughout
    public corpus-curation pipelines alongside the Gopher rules).

        H(d) = -sum_w p(w) ln p(w) = ln(n) - (1/n) sum_w c(w) ln c(w)

    Determinism across engines: each word's c*ln(c) term is rounded
    to 6dp, snapped to a scaled long (exactly the bm25 technique —
    summing exact integers is the same exact arithmetic as a DECIMAL
    sum, order-free), and the final H is rounded to 6dp.

    Scale shape: MAP-ONLY — per-doc word counts come from run lengths
    of the doc's SORTED token array (run boundaries via an O(n) break
    scan: position i starts a run iff i==1 or s[i] != s[i-1] — the
    dedup_substrings interval technique), so the operator is one scan
    with zero exchanges, zero joins, zero Python. The first (doc,
    word)-explode spelling shuffled 5.4M exploded tokens through two
    aggregations and ran 0.29x DuckDB at 100k docs; this one has no
    shuffle to pay. The boundary array is STAGED in its own
    projection (HOF lambdas sit outside projection CSE).
    Docs with no tokens emit no row (entropy undefined).

    Output: (doc_id, n_tokens, n_unique_tokens, word_entropy double).
    """
    ws = F.array_sort(
        F.filter(
            F.split(
                F.trim(F.lower(F.coalesce(text_col, F.lit("")))),
                r"\s+",
            ),
            lambda s: s != "",
        )
    )
    staged = df.select(
        F.col(id_col).alias("doc_id"), ws.alias("__ws")
    ).filter(F.size("__ws") > 0)
    sc = F.col("__ws")
    brk = F.filter(
        F.sequence(F.lit(1), F.size(sc)),
        lambda i: (i == F.lit(1))
        | (F.element_at(sc, i) != F.element_at(sc, i - 1)),
    )
    staged2 = staged.select(
        "doc_id",
        F.size("__ws").cast("long").alias("n_tokens"),
        brk.alias("__b"),
    )
    bb = F.col("__b")
    run_len = lambda j: (  # noqa: E731
        F.coalesce(
            F.try_element_at(bb, j + 1),
            F.col("n_tokens") + 1,
        )
        - F.element_at(bb, j)
    ).cast("double")
    # per-run c*ln(c), 6dp-rounded then scaled to an exact long
    term = lambda j: F.round(  # noqa: E731
        F.round(run_len(j) * F.log(run_len(j)), 6) * F.lit(1e6), 0
    ).cast("long")
    s_scaled = F.aggregate(
        F.sequence(F.lit(1), F.size(bb)),
        F.lit(0).cast("long"),
        lambda acc, j: acc + term(j),
    )
    h = F.round(
        F.log(F.col("n_tokens").cast("double"))
        - (s_scaled.cast("double") / F.lit(1e6))
        / F.col("n_tokens").cast("double"),
        6,
    )
    return staged2.select(
        "doc_id",
        "n_tokens",
        F.size("__b").cast("long").alias("n_unique_tokens"),
        h.alias("word_entropy"),
    )

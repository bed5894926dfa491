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


def lang_id(text: Column) -> Column:
    """Predicted language = argmax of marker-word hits; 'und'
    (undetermined) when nothing matches. CJK short-circuits on the
    presence of unified-ideograph chars."""
    words = F.split(normalize_text(text), " ")
    scores = [
        (_marker_hits(words, m), lang) for lang, m in LANG_MARKERS.items()
    ]
    best = F.greatest(*[s for s, _ in scores])
    pred = F.lit("und")
    # reversed so earlier entries win ties deterministically
    for score, lang in reversed(scores):
        pred = F.when(
            (score == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return F.when(
        text.rlike("[一-龥]"), F.lit("zh")
    ).otherwise(pred)


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1]: length band + punctuation ratio +
    stopword ratio (the classic C4/Gopher-style cheap filters)."""
    t = F.coalesce(text, F.lit(""))
    n = F.length(t)
    words = F.split(normalize_text(t), " ")
    n_words = F.size(words)
    punct = n - F.length(F.regexp_replace(t, r"[\.,;:!?。，；！？]", ""))
    punct_ratio = punct / F.greatest(n, F.lit(1))
    stop_ratio = _marker_hits(words, STOPWORDS) / F.greatest(
        n_words, F.lit(1)
    )
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


def doc_fingerprint(text: Column) -> Column:
    """Order-insensitive content fingerprint: md5 of the sorted
    distinct word set — catches shuffled/re-ordered copies that exact
    hashing misses."""
    return F.md5(
        F.concat_ws(
            " ",
            F.array_sort(
                F.array_distinct(F.split(normalize_text(text), " "))
            ),
        )
    )


def profile_documents(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One-pass per-document text profile (map-only; under-parallel
    inputs re-spread so the regex-heavy pass uses every core)."""
    from ..util import ensure_parallelism

    df = ensure_parallelism(df)
    t = F.col(text_col)
    words = F.split(normalize_text(t), " ")
    return df.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        F.size(words).alias("n_tokens"),
        F.size(F.array_distinct(words)).alias("n_distinct_tokens"),
        lang_id(t).alias("pred_lang"),
        quality_score(t).alias("quality"),
        doc_fingerprint(t).alias("fingerprint"),
    )

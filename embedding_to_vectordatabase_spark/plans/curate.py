"""Full training-data curation — the complete pretraining filter chain
as ONE lazy Spark plan:

  documents → language filter → quality threshold → exact dedup
  (plans/clean.py) → word-n-gram Jaccard near-dup removal
  (operators/dedup.py) — the lowest doc id of each near-dup pair
  survives.

Shuffle inventory on top of ``clean_corpus``'s single content-hash
shuffle: the shingle postings self-join (equi-join on shingle,
df-pruned so no stop-phrase key explodes) and one broadcast-able
anti-join on the loser id set. All stages remain one unexecuted plan —
point a writer at the result and the whole chain streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import DEFAULT_MAX_DOC_FREQ, ngram_jaccard_pairs
from .clean import DEFAULT_MIN_QUALITY, clean_corpus


def curate_corpus(
    df: DataFrame,
    allowed_langs: list[str] | None = None,
    min_quality: float = DEFAULT_MIN_QUALITY,
    n: int = 3,
    jaccard_threshold: float = 0.5,
    max_doc_freq: int | None = DEFAULT_MAX_DOC_FREQ,
    text_col: str = "text",
    id_col: str = "doc_id",
    hashed: bool = False,
    method: str = "ngram",
    num_perm: int = 64,
    bands: int = 16,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Surviving documents after the full chain, diagnostics attached.

    Output: (<id_col>, <text_col>, pred_lang, quality). Near-dup
    removal is the greedy lowest-id-wins rule: any document appearing
    as the HIGHER id of a qualifying pair is dropped — deterministic,
    one anti-join, no connected-components iteration (a doc that
    near-dups only a dropped doc is still dropped; acceptable for
    curation, where over-removal of near-dup chains is the safe side).

    ``method`` selects the pair generator:
    - ``"ngram"`` — exact n-gram Jaccard pairs (``hashed=True`` moves
      the shingle self-join onto 64-bit hashes); exact semantics, but
      the pair count is quadratic in per-shingle hot groups.
    - ``"minhash"`` — MinHash+LSH band-bucket pairs (``num_perm``,
      ``bands``, ``hash_fn``), with ``jaccard_threshold`` applied to
      the signature-estimated Jaccard. The production 100 TB path:
      the shuffle is bounded by signatures, never raw shingle
      postings, and measured ~2x faster at 250k docs.
    """
    from ..operators.dedup import minhash_lsh_pairs

    clean = clean_corpus(
        df, allowed_langs, min_quality, text_col, id_col
    )
    if method == "minhash":
        pairs = minhash_lsh_pairs(
            clean,
            text_col=text_col,
            id_col=id_col,
            n=n,
            num_perm=num_perm,
            bands=bands,
            threshold=jaccard_threshold,
            hash_fn=hash_fn,
        )
    elif method == "ngram":
        pairs = ngram_jaccard_pairs(
            clean,
            text_col=text_col,
            id_col=id_col,
            n=n,
            threshold=jaccard_threshold,
            max_doc_freq=max_doc_freq,
            hashed=hashed,
        )
    else:
        raise ValueError(f"unknown method {method!r}; use ngram|minhash")
    losers = pairs.select(F.col("doc_b").alias(id_col)).distinct()
    return clean.join(losers, id_col, "left_anti")

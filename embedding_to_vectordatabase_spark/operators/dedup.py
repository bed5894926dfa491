"""Deduplication operators — the training-data-pipeline extensions
(BASELINE.json north star; beyond the reference's J2 anti-join).

Five dedup families, each a pure DataFrame op:
- exact          md5(normalized text) groupBy — one shuffle on the hash
- ngram_jaccard  word n-gram shingles → inverted-index self-join →
                 intersection/union — the exact-similarity baseline
- minhash_lsh    shingle → minhash signatures (xxhash64 per permutation,
                 native exprs) → band buckets → candidate join → verify
- simhash        64-bit simhash from shingle hashes, hamming-distance
                 candidates via band equality
- embedding      cosine near-dup over a vector column, label-blocked

Scale notes (100 TB): all-pairs similarity is never materialized; every
family reduces to equi-joins on content-derived keys (hash / band /
bucket), so the only shuffles are on those keys. Skewed shingles (stop
phrases) are the classic hot key — ``ngram_pairs`` drops shingles above
``max_doc_freq`` (standard df-pruning) which bounds per-key fan-out.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..store import current_rel as _crel
from ..store import pin_index_path as _pin
from ..functions.vector import dense_cosine

# df-pruning cap: shingles appearing in more docs than this are stop
# phrases — dropping them bounds the inverted-index self-join fan-out
# (the quadratic-per-hot-key failure mode at scale).
DEFAULT_MAX_DOC_FREQ = 1000


def normalize_text(c):
    """Lowercase, collapse whitespace — the canonical form hashing uses."""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def _hash64(col: Column, seed: int | None = None, hash_fn: str = "xxhash64") -> Column:
    """Seeded 64-bit-ish hash of a string column.

    - ``xxhash64``: native long hash — the fast production path.
    - ``md5``: hex-string hash (seed folded into the input) — slower
      but portable across engines, so duckdb-oracle checks can
      reproduce signatures bit-for-bit. min/equality semantics are all
      the minhash machinery needs, and hex strings order well.
    """
    if hash_fn == "xxhash64":
        return F.xxhash64(col) if seed is None else F.xxhash64(col, F.lit(seed))
    if hash_fn == "md5":
        src = col if seed is None else F.concat(F.lit(f"{seed}|"), col)
        return F.md5(src)
    raise ValueError(f"unknown hash_fn {hash_fn!r}; use xxhash64|md5")


def exact_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_dups: int = 2,
) -> DataFrame:
    """Groups of byte-identical (post-normalization) docs: one row per
    hash with the member count and the keeper (min id); ``min_dups=1``
    returns the full hash inventory.
    Output: (content_hash, n_dups, keep_id)."""
    from ..util import ensure_parallelism

    df = ensure_parallelism(df)
    return (
        df.select(
            F.md5(normalize_text(F.col(text_col))).alias("content_hash"),
            F.col(id_col),
        )
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("n_dups"),
            F.min(id_col).alias("keep_id"),
        )
        .filter(F.col("n_dups") >= min_dups)
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep exactly one doc per normalized-content hash (the min id) —
    the dedup you run before anything expensive."""
    from ..util import ensure_parallelism

    df = ensure_parallelism(df)
    w = Window.partitionBy(
        F.md5(normalize_text(F.col(text_col)))
    ).orderBy(F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_spans(
    df: DataFrame,
    span_words: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide exact span dedup: the paragraph-dedup plan (keep
    the FIRST occurrence of each repeated paragraph, drop the rest
    in-place, keep the documents) applied under deterministic
    segmentation — this corpus has no paragraph breaks, so a span is
    ``span_words`` consecutive lowercase whitespace tokens. Complements
    ``dedup_exact`` (whole-doc) and the near-dup families (whole-doc
    similarity): repeated boilerplate INSIDE otherwise-unique docs is
    what this removes from a training corpus.

    First occurrence = min (doc_id, seg) over each span's md5; the
    surviving spans are re-joined in segment order into
    ``text_dedup``. Docs whose every span was first seen elsewhere
    survive with ``n_kept = 0`` and empty text; docs with no tokens
    produce no row.

    Scale shape: spans are built MAP-SIDE — tokenize once to an
    array, then ``transform(sequence(0, n_spans-1), i -> concat_ws(
    ' ', slice(tokens, i*n+1, n)))`` and posexplode the span array,
    so the first shuffled relation is span-granularity (~1/n of the
    word count), never one-row-per-word. First-occurrence is a
    window over md5(span) (same plan as ``dedup_exact`` — a
    pathological million-fold span is one task's window, bounded by
    the span count, not the corpus); reassembly + n_spans/n_kept is
    ONE agg shuffle on doc_id over the flagged spans
    (``collect_list`` skips the nulled losers), so no per-doc join
    and the corpus text is scanned exactly once. The tokenized
    array and the span count are staged as multi-referenced aliases
    in their own selects so CollapseProject cannot inline the
    split/filter into the per-span lambda (inlined, it would
    re-tokenize per span).
    Output: (doc_id, n_spans, n_kept, text_dedup).
    """
    from ..util import ensure_parallelism

    df = ensure_parallelism(df)
    toks = F.filter(
        F.split(
            F.trim(F.lower(F.coalesce(text_col, F.lit("")))),
            r"\s+",
        ),
        lambda s: s != "",
    )
    staged = df.select(F.col(id_col).alias("doc_id"), toks.alias("__toks"))
    sized = staged.select(
        "doc_id",
        "__toks",
        F.ceil(F.size("__toks") / F.lit(span_words))
        .cast("int")
        .alias("n_spans"),
    ).filter(F.col("n_spans") > 0)
    spans = sized.select(
        "doc_id",
        "n_spans",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.col("n_spans") - 1),
                lambda i: F.concat_ws(
                    " ",
                    F.slice(
                        F.col("__toks"), i * span_words + 1, span_words
                    ),
                ),
            )
        ).alias("seg", "span"),
    )
    w = Window.partitionBy(F.md5(F.col("span"))).orderBy("doc_id", "seg")
    flagged = spans.withColumn("__rn", F.row_number().over(w))
    return flagged.groupBy("doc_id").agg(
        F.max("n_spans").alias("n_spans"),
        F.count(F.when(F.col("__rn") == 1, 1)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("__rn") == 1, F.struct("seg", "span")
                        )
                    )
                ),
                lambda s: s["span"],
            ),
        ).alias("text_dedup"),
    )


def word_ngrams(text, n: int = 3):
    """array<string> of word n-gram shingles (native exprs)."""
    words = F.split(normalize_text(text), " ")
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: F.concat_ws(
            " ", F.slice(words, i + 1, n)
        ),
    )


def shingle_postings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """(doc_id, shingle) distinct posting rows; docs shorter than n
    words contribute their whole text as one shingle. The input is
    re-spread first when it arrives under-parallel (small-file corpus)
    so the ~100× explode fan-out uses every core; no-op at scale."""
    from ..util import ensure_parallelism

    df = ensure_parallelism(df)
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(word_ngrams(F.col(text_col), n)).alias("shingle"),
        )
        .distinct()
    )


def _word_hashes(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, __wh array<long>) — per-doc word xxhash64 array, the
    shared first stage of ``_hashed_shingle_sets`` and the r17 fused
    minhash kernel (one definition so NULL/empty-text semantics cannot
    diverge: NULL text coalesces to "" before hashing, see
    ``_hashed_shingle_sets``)."""
    words = F.split(
        normalize_text(F.coalesce(F.col(text_col), F.lit(""))), " "
    )
    wh = F.transform(words, lambda w: F.xxhash64(w))
    return df.select(F.col(id_col).alias("doc_id"), wh.alias("__wh"))


def _hashed_shingle_sets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
) -> DataFrame:
    """(doc_id, __shs array<long>) — each doc's DISTINCT word-n-gram
    shingle hash set, built entirely row-locally with the COMPOSED
    hash: every word is xxhash64ed once, and each shingle hash is one
    xxhash64 over its n word-hash longs. The r12 replacement for
    hashing `concat_ws(" ", slice(words, i, n))` per position — the
    string spelling rebuilds and re-hashes ~n words of text per
    POSITION, which profiled at 8.3 s of minhash's 13.9 s at 250k
    docs (composed: 0.56 s, same distinct-set structure; the same
    fix as dedup_substrings' gram hash). Collision class unchanged
    (~n²/2⁶⁵ over distinct shingles).

    The word-hash array is STAGED in its own projection: referencing
    it as an inline expression from the per-position lambda would
    re-evaluate the whole array per position (HOF lambdas sit outside
    a projection's common-subexpression elimination).

    Docs shorter than n words yield one composed hash over the
    available word hashes (xxhash64 skips the NULL tail positions) —
    the composed analogue of ``word_ngrams``' whole-text shingle.
    Shared by ``minhash_signatures``, ``minhash_bands_maponly`` and
    ``hashed_postings`` so the three spellings cannot diverge.

    NULL text is coalesced to the EMPTY STRING before hashing (r13):
    NULL-text docs form one duplicate class WITH empty-text docs —
    exactly the md5 mode's semantics, where ``word_ngrams(NULL)``
    already yields the [""] whole-text shingle. Without the coalesce,
    split(NULL) is a NULL word array and the composed xxhash64 over
    all-NULL positions degenerates to the bare-seed constant, giving
    NULL docs a duplicate class DISJOINT from empty docs and silently
    divergent from the md5 spelling.
    """
    pre = _word_hashes(df, text_col, id_col)
    comp = F.transform(
        F.sequence(
            F.lit(1),
            F.greatest(F.size(F.col("__wh")) - (n - 1), F.lit(1)),
        ),
        lambda i: F.xxhash64(
            *[F.try_element_at(F.col("__wh"), i + k) for k in range(n)]
        ),
    )
    return pre.select(
        "doc_id", F.array_distinct(comp).alias("__shs")
    )


def hashed_postings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """(doc_id, shingle_h long) distinct posting rows with the shingle
    pre-hashed to 64 bits BEFORE the distinct — the dedup shuffle then
    moves 8-byte longs instead of ~30-byte strings (~3× less shuffle
    volume at scale). Safe wherever downstream only needs hash
    identity (minhash, simhash, decontamination, hashed jaccard);
    ``shingle_postings`` keeps the string form for exact-set ops and
    md5-oracle parity. r12: the hash is the composed word-hash form
    (see ``_hashed_shingle_sets``) — hash VALUES changed from the
    string-concat spelling, so any externally persisted xx-hash
    artifacts from earlier rounds are incompatible; identity
    semantics (the only contract) are unchanged."""
    from ..util import ensure_parallelism

    df = ensure_parallelism(df)
    return _hashed_shingle_sets(df, text_col, id_col, n).select(
        "doc_id", F.explode("__shs").alias("shingle_h")
    )


def _postings_inter(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    max_doc_freq: int | None,
    hashed: bool,
    symmetric: bool,
):
    """Shared inverted-index stage behind ``ngram_jaccard_pairs`` and
    ``containment_pairs``: df-pruned shingle postings self-joined to
    per-pair shared-shingle counts, plus per-doc shingle counts over
    the SAME pruned space. ``symmetric`` keeps a<b only (unordered
    pairs); otherwise both directions of each a!=b pair are counted.
    One definition so pruning/hashing fixes cannot silently diverge
    between the two operators. Returns (inter, sizes)."""
    postings = (
        hashed_postings(df, text_col, id_col, n).withColumnRenamed(
            "shingle_h", "shingle"
        )
        if hashed
        else shingle_postings(df, text_col, id_col, n)
    )
    if max_doc_freq is not None:
        df_counts = postings.groupBy("shingle").agg(
            F.count("*").alias("__df")
        )
        postings = (
            postings.join(df_counts, "shingle")
            .filter(F.col("__df") <= max_doc_freq)
            .drop("__df")
        )
    sizes = postings.groupBy("doc_id").agg(
        F.count("*").alias("n_shingles")
    )
    a = postings.alias("a")
    b = postings.alias("b")
    pred = (
        F.col("a.doc_id") < F.col("b.doc_id")
        if symmetric
        else F.col("a.doc_id") != F.col("b.doc_id")
    )
    inter = (
        a.join(b, "shingle")
        .filter(pred)
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count("*").alias("n_common"))
    )
    return inter, sizes



def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_doc_freq: int | None = DEFAULT_MAX_DOC_FREQ,
    hashed: bool = False,
) -> DataFrame:
    """Near-dup pairs by word-n-gram Jaccard >= threshold.

    Inverted-index plan: postings self-join on shingle gives
    per-pair intersection counts; per-doc shingle counts give the
    union by inclusion-exclusion. Never materializes all pairs —
    only pairs sharing >= 1 shingle. Output:
    (doc_a, doc_b, jaccard double) with doc_a < doc_b.

    ``max_doc_freq`` prunes stop-phrase shingles (df-pruning) so no
    single shingle key explodes the self-join; pass None only for
    tiny corpora. Sizes are computed on the pruned posting set, so
    the score is the exact Jaccard over the surviving shingle space.

    ``hashed=True`` runs the whole inverted index on xxhash64'd
    shingles (8-byte longs instead of ~30-byte strings): ~3x less
    volume through the self-join shuffle — the production path, since
    Jaccard only needs shingle identity, not the string. The string
    form stays the default for SQL-oracle parity; a 64-bit collision
    merging two shingles perturbs one intersection count by 1 — noise
    far below any useful threshold.
    """
    inter, sizes = _postings_inter(
        df, text_col, id_col, n, max_doc_freq, hashed, symmetric=True
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("__na")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("__nb")
    )
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_common")
                / (F.col("__na") + F.col("__nb") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 64,
    hash_fn: str = "xxhash64",
    kernel: bool = True,
) -> DataFrame:
    """(doc_id, sig array[num_perm]) — minhash over word n-gram
    shingles. Permutation h_i(s) = hash(s, seed=i); min per doc.
    With ``hash_fn='md5'`` the signature is engine-portable hex
    strings (duckdb-oracle checkable), all native exprs; default
    xxhash64 pre-hashes shingles to longs and derives the
    permutations from the 8-byte hash — the fast path.

    r17: in xxhash64 mode the ``num_perm`` permutation-min folds run
    as ONE vectorized Arrow kernel (``functions.hashkernel``) instead
    of ``num_perm`` Catalyst higher-order ``transform``/``array_min``
    traversals — HOFs are interpreted per element with boxing, and
    the 64-fold stack was the dominant term of every minhash bench
    section. The kernel reimplements Spark's XXH64 bit-exactly, so
    signatures (and everything downstream: buckets, est_jaccard,
    survivors) are value-identical — asserted against the native
    spelling (``kernel=False``) in tests.

    Computed ROW-LOCALLY (r12): the doc's distinct shingle (hash) set
    is an array expression and each permutation is an
    array_min(transform(...)) over it — value-identical to the old
    explode → global distinct → 64-min groupBy spelling (per-row
    array_distinct IS the per-doc distinct; same seeds, same hashes;
    the equivalence to ``minhash_bands_maponly``'s row-local banding
    is asserted in tests), but with ZERO exchanges where the posting
    spelling shuffled the corpus twice (distinct + groupBy doc_id)
    before any LSH work. At 100 TB the signature stage is now
    embarrassingly parallel; the first shuffle in the whole
    minhash-LSH plan is the band-bucket groupBy."""
    from ..util import ensure_parallelism

    df = ensure_parallelism(df)
    if hash_fn == "xxhash64":
        if kernel:
            # fused kernel: n-gram composition + permutation mins in
            # one Arrow pass over the word-hash arrays. The composed
            # n-gram transform and array_distinct are interpreted HOFs
            # too, and a min over the composed MULTISET equals the min
            # over the distinct set — so the distinct is skipped
            # outright and the signatures stay value-identical to the
            # native spelling (pinned in tests/test_hashkernel.py).
            from ..functions.hashkernel import minhash_sig_from_words_udf

            pre = _word_hashes(df, text_col, id_col)
            return pre.select(
                "doc_id",
                minhash_sig_from_words_udf(num_perm, n)(
                    F.col("__wh")
                ).alias("sig"),
            )
        staged = _hashed_shingle_sets(df, text_col, id_col, n)
    elif hash_fn == "md5":
        staged = df.select(
            F.col(id_col).alias("doc_id"),
            F.array_distinct(word_ngrams(F.col(text_col), n)).alias(
                "__shs"
            ),
        )
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}; use xxhash64|md5")

    def _perm_min(i: int):
        # closure factory, NOT a default-arg lambda: F.transform
        # dispatches on lambda arity, so a 2-param lambda would be
        # called as (element, index) and the seed would silently
        # become the array index
        if hash_fn == "xxhash64":
            return F.array_min(
                F.transform(
                    F.col("__shs"), lambda s: F.xxhash64(s, F.lit(i))
                )
            )
        return F.array_min(
            F.transform(
                F.col("__shs"), lambda s: _hash64(s, i, hash_fn)
            )
        )

    return staged.select(
        "doc_id",
        F.array(*[_perm_min(i) for i in range(num_perm)]).alias("sig"),
    )


def minhash_bands_maponly(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 16,
    bands: int = 4,
    hash_fn: str = "md5",
) -> DataFrame:
    """(doc_id, band, bucket) LSH band-signature rows computed
    entirely ROW-LOCALLY: the shingle set, per-permutation minhash,
    and band bucket are array expressions over the single row — no
    explode-groupBy aggregation. That makes the same expression legal
    on a STREAMING DataFrame as a stateless map stage (the groupBy-min
    form in ``minhash_signatures`` would be its own stateful
    aggregation and could not precede ``applyInPandasWithState`` in
    one query). Signature-identical to ``minhash_signatures`` +
    ``minhash_lsh_pairs``'s banding: same per-permutation seeds, same
    distinct-shingle min, same band bucket hash — asserted in
    tests/test_dedup.py.
    """
    if num_perm % bands:
        raise ValueError("bands must divide num_perm")
    r = num_perm // bands
    # mirror each batch form exactly: xxhash64 composes per-word
    # hashes into shingle hashes (_hashed_shingle_sets) and derives
    # permutations from the 8-byte hash; md5 seeds the string
    # directly. The shingle set is STAGED in its own projection
    # (still a stateless map stage, so streaming-legal): as an inline
    # expression it would be re-evaluated once per permutation.
    # Factories, NOT `lambda s, p=p`: F.transform dispatches on
    # lambda arity, so a two-parameter lambda would be called as
    # (element, index) and the seed would silently become the array
    # index.
    if hash_fn == "xxhash64":
        staged = _hashed_shingle_sets(df, text_col, id_col, n)

        def _perm_min(p: int) -> Column:
            return F.array_min(
                F.transform(
                    F.col("__shs"), lambda h: F.xxhash64(h, F.lit(p))
                )
            )

    else:
        staged = df.select(
            F.col(id_col).alias("doc_id"),
            F.array_distinct(word_ngrams(F.col(text_col), n)).alias(
                "__shs"
            ),
        )

        def _perm_min(p: int) -> Column:
            return F.array_min(
                F.transform(
                    F.col("__shs"), lambda s: _hash64(s, p, hash_fn)
                )
            )

    sig = [_perm_min(p) for p in range(num_perm)]

    def _bucket(b: int) -> Column:
        elems = sig[b * r : (b + 1) * r]
        if hash_fn == "md5":
            return F.md5(F.concat_ws(",", *elems))
        return F.xxhash64(*elems)

    return staged.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), _bucket(b).alias("bucket")
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")


def _capped_bucket_pairs(
    members: DataFrame,
    mk_pair,
    max_bucket_size: int | None,
    ms_col: str = "ms",
) -> DataFrame:
    """Pair expansion over each bucket's sorted member array: returns
    ``members`` exploded to one ``pr`` struct column per pair.

    For buckets of k <= max_bucket_size members: all C(k,2) pairs,
    exactly the old in-array expansion.  For hot buckets past the cap
    (realistically mass-duplicated boilerplate, identical in every
    band): C(cap,2) pairs among the first ``cap`` members by id order
    PLUS one exact-scored star edge from member 0 to every tail
    member.  This bounds the per-row pair array at O(cap^2 + k)
    elements instead of C(k,2) — the uncapped form exceeds Spark's
    2^31 array-element limit at ~65k members and OOMs a task well
    before that — while keeping every bucket member connected to the
    bucket (so ``dup_clusters`` still collapses the mass-dup cluster).
    Recall semantics of the cap: tail-to-tail pairs inside an over-cap
    bucket are not emitted from THIS bucket (other bands may still
    emit them); every emitted edge's score is computed exactly, so the
    threshold never admits a false positive.  Gate-SF oracles are
    unaffected: no bucket approaches the default cap there.

    The capped member array is materialized as its own projection
    column (``__head``) BEFORE the pair expansion references it three
    times (outer transform, inner slice bound, inner slice source) —
    CollapseProject keeps multi-use non-cheap aliases in their own
    Project, so the when/slice evaluates once per bucket row instead
    of once per outer lambda element (r9 VERDICT item 4).
    """
    if max_bucket_size is not None and max_bucket_size < 2:
        raise ValueError("max_bucket_size must be >= 2")
    ms = F.col(ms_col)
    if max_bucket_size is None:
        with_head = members.withColumn("__head", ms)
    else:
        cap = F.lit(max_bucket_size)
        with_head = members.withColumn(
            "__head",
            F.when(F.size(ms) > cap, F.slice(ms, 1, max_bucket_size))
            .otherwise(ms),
        )
    head = F.col("__head")
    # 2-arg transform lambda receives (element, 0-based index); the
    # partner slice starts past the element, so members sorted by
    # doc_id emit each pair exactly once with doc_a <= doc_b
    pairs = F.flatten(
        F.transform(
            head,
            lambda x, i: F.transform(
                F.slice(head, i + 2, F.size(head) - i - 1),
                lambda y: mk_pair(x, y),
            ),
        )
    )
    if max_bucket_size is not None:
        # star edges: member 0 -> each member past the cap (empty slice
        # when k <= cap, so the concat is a no-op for normal buckets)
        anchor = F.element_at(ms, 1)
        tail = F.transform(
            F.slice(
                ms,
                max_bucket_size + 1,
                F.greatest(F.size(ms) - F.lit(max_bucket_size), F.lit(0)),
            ),
            lambda y: mk_pair(anchor, y),
        )
        pairs = F.concat(pairs, tail)
    return with_head.select(F.explode(pairs).alias("pr"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    hash_fn: str = "xxhash64",
    max_bucket_size: int | None = 1024,
) -> DataFrame:
    """MinHash+LSH near-dup pairs: band the signature (bands × r rows),
    bucket-join on (band, band-hash), then verify candidates with the
    estimated Jaccard = fraction of matching signature positions.

    Output: (doc_a, doc_b, est_jaccard double). The band join is the
    only shuffle over candidates; with r = num_perm/bands the collision
    probability follows the standard S-curve (1-(1-s^r)^b).

    ``id_col`` values must be unique — duplicate ids would otherwise
    emit self-pairs with est_jaccard 1.0 (the expansion sorts members
    and only guarantees doc_a <= doc_b); a doc_a != doc_b guard drops
    them defensively.  ``max_bucket_size`` bounds hot-bucket memory —
    see _capped_bucket_pairs for the exact over-cap semantics; None
    disables the cap (small-corpus exact mode).

    r18 SHAPE (guide S8 "decide with small rows, move big rows
    once"; VERDICT r17 item 4 + the r17 ADVICE hot-bucket memory
    finding): the signature relation (doc_id, sig) is computed ONCE
    and persisted for the query's lifetime; everything that decides
    WHICH pairs to score — banding, the (band, bucket) groupBy, the
    capped in-bucket pair expansion, the cross-band distinct — runs
    over doc_id alone. The r8-r17 shape shipped each doc's
    num_perm-long signature through the bucket exchange once PER BAND
    (16x duplication, ~2 GB at the 250k bench point) and carried BOTH
    signatures inside every expanded pair struct, so one capped hot
    bucket (1024 members -> ~523k pairs) materialized ~0.5 GB in a
    single array row. Now the bucket exchange and the pair structs
    carry ids only (a hot bucket's pair array is ~8 MB), each UNIQUE
    candidate pair is scored exactly once (scoring used to run
    pre-distinct, once per band that found the pair), and the two
    signature fetches are narrow joins against the persisted relation
    — the only corpus-sized rows that move are (doc_id, sig), once.
    The materialization is a LAZY localCheckpoint: computed from the
    inputs on first execution (nothing crosses runs, and nothing runs
    at plan-construction time), shared by the three plan references
    (DataFrame self-references get no exchange reuse — the r8
    finding), held in the block manager and released by the context
    cleaner when the DataFrame is dropped — a persist() here would
    pin a CacheManager entry for the session lifetime (the r15 ADVICE
    leak class; tests assert the CacheManager stays empty).
    """
    if num_perm % bands:
        raise ValueError("bands must divide num_perm")
    r = num_perm // bands
    sig = minhash_signatures(
        df, text_col, id_col, n, num_perm, hash_fn
    ).localCheckpoint(eager=False)

    def _band_bucket(b: int) -> Column:
        elems = [F.element_at("sig", b * r + j + 1) for j in range(r)]
        if hash_fn == "md5":
            return F.md5(F.concat_ws(",", *elems))
        return F.xxhash64(*elems)

    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        _band_bucket(b).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")

    # BUCKET-LOCAL pair generation (r8) instead of the banded
    # self-join: group each (band, bucket) into a sorted member-id
    # list and expand the C(k,2) pairs in-array — hot buckets bounded
    # by max_bucket_size (see _capped_bucket_pairs).
    members = (
        banded.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ms"))
        .filter(F.size("ms") >= 2)
    )

    def _mk_pair(x, y):
        return F.struct(x.alias("doc_a"), y.alias("doc_b"))

    cand = (
        _capped_bucket_pairs(members, _mk_pair, max_bucket_size)
        .select(
            F.col("pr.doc_a").alias("doc_a"),
            F.col("pr.doc_b").alias("doc_b"),
        )
        .filter(F.col("doc_a") != F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # est computed once per unique pair in the post-join projection —
    # unrolled codegen terms (r17), never inside an interpreted HOF
    return (
        cand.join(
            sig.select(
                F.col("doc_id").alias("doc_a"), F.col("sig").alias("sa")
            ),
            "doc_a",
        )
        .join(
            sig.select(
                F.col("doc_id").alias("doc_b"), F.col("sig").alias("sb")
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(
                _minhash_est_expr(F.col("sa"), F.col("sb"), num_perm), 6
            ).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
    )


def dup_clusters(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Connected components over a near-dup pair graph: every doc that
    appears in a pair gets ``cluster_id`` = the minimum doc id of its
    component — the step that turns any pair-producing dedup family
    (Jaccard / MinHash / SimHash / embedding) into dedup GROUPS, so
    one representative per cluster survives instead of the greedy
    pairwise-anti-join's over-removal.

    Algorithm: iterative min-label propagation to fixpoint —
    new_label(v) = min(label(v), min over neighbors' labels); each
    round is one shuffle on the (symmetrized) edge list plus one on
    doc_id, and the round count is the graph diameter. Near-dup
    components are band-bucket near-cliques, so 2-3 rounds converge
    in practice; for adversarial long-chain graphs the known
    refinement is alternating large-star/small-star (Kiveris et al.,
    "Connected Components in MapReduce"), which bounds rounds at
    O(log n) with the same join shape. Lineage is truncated with an
    eager localCheckpoint per round — an iterative plan would
    otherwise grow by two joins per iteration.

    Output: (doc_id, cluster_id). Raises if not converged within
    ``max_iterations`` (never silently returns partial labels).
    """
    edges = pairs.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    )
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = (
        sym.select(F.col("src").alias("doc_id"))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("label"))
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        nbr_min = (
            sym.withColumnRenamed("dst", "doc_id")
            .join(labels, "doc_id")
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
            .withColumnRenamed("src", "doc_id")
        )
        new_labels = (
            labels.join(nbr_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("label"),
                    F.coalesce("nbr_label", F.col("label")),
                ).alias("label"),
            )
            .localCheckpoint()
        )
        n_changed = (
            new_labels.withColumnRenamed("label", "new")
            .join(labels, "doc_id")
            .filter(F.col("new") != F.col("label"))
            .count()
        )
        labels = new_labels
        if n_changed == 0:
            return labels.withColumnRenamed("label", "cluster_id")
    raise RuntimeError(
        f"dup_clusters did not converge in {max_iterations} rounds — "
        "pathological chain graph; raise max_iterations or use "
        "large-star/small-star"
    )


def near_dedup_representatives(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Corpus rows surviving cluster-aware near-dedup: exactly ONE
    representative (the minimum id) per connected component of the
    pair graph survives; docs in no pair survive untouched. Unlike
    the greedy pairwise anti-join (drop every doc_b), a chain
    a-b-c keeps a (and only a) rather than dropping both b and c
    against possibly-already-dropped partners — the exact-coverage
    form. One anti-join against the non-representative id set, which
    is at most (cluster members - clusters) rows."""
    clusters = dup_clusters(pairs, a_col, b_col)
    losers = clusters.filter(
        F.col("doc_id") != F.col("cluster_id")
    ).select(F.col("doc_id").alias(id_col))
    return df.join(losers, id_col, "left_anti")


def semantic_contamination_flags(
    corpus: DataFrame,
    benchmark: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bench_vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """SEMANTIC benchmark decontamination flags — the embedding-space
    complement of the 8-gram ``contamination_flags`` (paraphrased or
    re-worded eval items share no exact n-grams but sit next to the
    benchmark in embedding space; modern pipelines run both). Per
    corpus row: the max cosine against ANY benchmark embedding,
    rounded to 6 dp via F.round (the PROVEN cross-engine pairing with
    SQL ROUND — numpy's half-even rint would diverge from DuckDB at
    exact half-ulp boundaries), and contaminated = max_cosine ≥
    threshold on the rounded value.

    Scale shape: the benchmark is eval-set-sized by contract, so its
    row-normalized matrix BROADCASTS and each Arrow batch scores with
    ONE BLAS matmul — map-only, zero shuffles, the corpus is read
    once. Output: (<id_col>, max_cosine double, contaminated bool).
    """
    import numpy as np
    import pyarrow as pa
    from pyspark.sql import types as T

    from .search import _pa_matrix, _query_matrix

    _, B = _query_matrix(benchmark, id_col, bench_vec_col)
    bn = np.linalg.norm(B, axis=1)
    bn[bn == 0] = 1.0
    Bn = (B / bn[:, None]).T  # (dim, nbench)
    bc = corpus.sparkSession.sparkContext.broadcast(Bn)
    cid_type = corpus.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(id_col, cid_type, False),
            T.StructField("__mc", T.DoubleType(), False),
        ]
    )
    thr = float(threshold)

    def score(batches):
        Bn_b = bc.value
        for rb in batches:
            if rb.num_rows == 0:
                continue
            X = _pa_matrix(
                rb.column(rb.schema.get_field_index(vec_col))
            )
            xn = np.linalg.norm(X, axis=1)
            xn[xn == 0] = 1.0
            mx = ((X / xn[:, None]) @ Bn_b).max(axis=1)
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column(rb.schema.get_field_index(id_col)),
                    pa.array(mx, type=pa.float64()),
                ],
                names=[id_col, "__mc"],
            )

    raw = corpus.select(id_col, vec_col).mapInArrow(score, out_schema)
    mc = F.round(F.col("__mc"), 6)
    return raw.select(
        id_col,
        mc.alias("max_cosine"),
        (mc >= F.lit(thr)).alias("contaminated"),
    )


def decontaminate_semantic(
    corpus: DataFrame,
    benchmark: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bench_vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """Corpus rows surviving semantic decontamination (all original
    columns kept) — ``semantic_contamination_flags`` as a filter, the
    embedding-space twin of ``decontaminate``."""
    flags = semantic_contamination_flags(
        corpus, benchmark, vec_col, id_col, bench_vec_col, threshold
    ).filter("contaminated")
    return corpus.join(
        flags.select(id_col), id_col, "left_anti"
    )


def contamination_flags(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    n: int = 8,
    min_overlap: int = 1,
    hashed: bool = True,
) -> DataFrame:
    """Benchmark-decontamination flags (GPT-3/PaLM-style n-gram
    overlap): a training document is contaminated iff it shares at
    least ``min_overlap`` distinct word ``n``-grams with ANY
    evaluation-benchmark document. Output: (doc_id, n_overlap long,
    contaminated boolean) — one row per corpus doc.

    100 TB shape: the benchmark shingle set is small by construction
    (eval sets are thousands of rows) and broadcasts; the corpus-side
    postings stream map-joins against it, so the only shuffle is the
    per-doc overlap count over MATCHING postings (a vanishing
    fraction of the corpus). ``hashed=True`` pre-hashes shingles to
    longs (xxhash64 — the production path); ``hashed=False`` joins on
    raw shingle strings, reproducible in a SQL oracle.
    """
    if hashed:
        cp = hashed_postings(corpus, text_col, id_col, n)
        bp = (
            hashed_postings(benchmark, bench_text_col, id_col, n)
            .select("shingle_h")
            .distinct()
        )
        key = "shingle_h"
    else:
        cp = shingle_postings(corpus, text_col, id_col, n)
        bp = (
            shingle_postings(benchmark, bench_text_col, id_col, n)
            .select("shingle")
            .distinct()
        )
        key = "shingle"
    overlaps = (
        cp.join(F.broadcast(bp), key)
        .groupBy("doc_id")  # postings are distinct per doc already
        .agg(F.count("*").alias("n_overlap"))
    )
    return (
        corpus.select(F.col(id_col).alias("doc_id"))
        .join(overlaps, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_overlap"), F.lit(0)).alias("n_overlap"),
            (
                F.coalesce(F.col("n_overlap"), F.lit(0))
                >= F.lit(min_overlap)
            ).alias("contaminated"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    n: int = 8,
    min_overlap: int = 1,
    hashed: bool = True,
) -> DataFrame:
    """Corpus rows surviving benchmark decontamination (all original
    columns kept) — ``contamination_flags`` as a filter."""
    flags = contamination_flags(
        corpus, benchmark, text_col, id_col, bench_text_col, n,
        min_overlap, hashed,
    ).filter("contaminated")
    return corpus.join(
        flags.select(F.col("doc_id").alias(id_col)),
        id_col,
        "left_anti",
    )


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    bits: int = 64,
    hash_fn: str = "xxhash64",
    kernel: bool = True,
) -> DataFrame:
    """(doc_id, simhash long): per shingle take a 64-bit hash, each bit
    votes +1/-1, sign of the vote sum per bit position. Native exprs:
    explode → per-bit conditional sums → bit reassembly. r17: the
    xxhash64/bits=64 path fuses n-gram composition, the per-doc
    distinct and the vote fold into one vectorized Arrow kernel
    (``functions.hashkernel.simhash_from_words_udf``) — the 32
    lane-packed ``aggregate()`` folds and the composed-shingle
    ``transform`` are interpreted per element; the kernel computes the
    identical integer votes (equivalence asserted in tests),
    ``kernel=False`` keeps the native spelling.

    Bit 63 is assembled with shiftleft so it lands in the long's sign
    bit (the fingerprint is an opaque 64-bit pattern — a negative
    value is fine; ``F.lit(2**63)`` would overflow LongType).
    ``hash_fn='md5'`` derives the shingle hash from the first 15 hex
    chars of md5 (60 usable bits) so a duckdb oracle can reproduce it;
    bits must be <= 60 in that mode.

    ROW-LOCAL (r12): the doc's distinct shingle-hash array is staged
    once and each packed lane is an aggregate() fold over it — value-
    identical to the old explode → groupBy(doc) spelling (per-row
    array_distinct IS the per-doc distinct), but with zero exchanges
    before banding: the explode + 33-buffer hash aggregate over the
    posting rows measured 17.7 s at 250k docs where these folds
    measure 3.2 s."""
    if bits > 64 or (hash_fn == "md5" and bits > 60):
        raise ValueError("bits must be <= 64 (<= 60 for md5 hash_fn)")
    if bits % 2:
        raise ValueError("bits must be even")
    from ..util import ensure_parallelism

    df = ensure_parallelism(df)
    if hash_fn == "md5":
        # conv(hex, 16, 10) == duckdb CAST('0x'||hex AS BIGINT): portable.
        # The hash is staged ONCE per shingle — folding over raw
        # strings would re-run md5 per LANE per shingle
        staged = df.select(
            F.col(id_col).alias("doc_id"),
            F.transform(
                F.array_distinct(word_ngrams(F.col(text_col), n)),
                lambda s: F.conv(
                    F.substring(F.md5(s), 1, 15), 16, 10
                ).cast("long"),
            ).alias("__hs"),
        )
    elif hash_fn == "xxhash64":
        if kernel and bits == 64:
            # fused kernel: n-gram composition + per-doc distinct +
            # 64-bit majority vote in one Arrow pass over the
            # word-hash arrays (value-identical; see hashkernel)
            from ..functions.hashkernel import simhash_from_words_udf

            return _word_hashes(df, text_col, id_col).select(
                "doc_id",
                simhash_from_words_udf(n)(F.col("__wh")).alias(
                    "simhash"
                ),
            )
        staged = _hashed_shingle_sets(
            df, text_col, id_col, n
        ).withColumnRenamed("__shs", "__hs")
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}; use xxhash64|md5")
    # Per-bit ±1 votes reduce to set-bit counts: vote_i > 0 ⇔ 2c_i > n.
    # Two 32-bit count lanes pack into each long accumulator (bits i and
    # i+bits/2), halving the lane count — 64 separate folds would double
    # the per-element work. Lane math is overflow-safe under ANSI:
    # sum <= n*(1+2^32), fine for n < 2^31 shingles/doc.
    half = bits // 2
    one = F.lit(1).cast("long")
    hs = F.col("__hs")

    def _lane(i: int):
        # closure factory (transform/aggregate arity dispatch)
        return F.aggregate(
            hs,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.shiftright(h, i).bitwiseAND(one)
            + F.shiftleft(
                F.shiftright(h, i + half).bitwiseAND(one), 32
            ),
        )

    agg = staged.select(
        "doc_id",
        F.size(hs).cast("long").alias("__n"),
        *[_lane(i).alias(f"__s{i}") for i in range(half)],
    )
    out = F.lit(0).cast("long")
    for i in range(half):
        c_lo = F.col(f"__s{i}").bitwiseAND(F.lit((1 << 32) - 1))
        c_hi = F.shiftrightunsigned(F.col(f"__s{i}"), 32)
        out = out + F.when(
            c_lo * 2 > F.col("__n"), F.shiftleft(one, i)
        ).otherwise(F.lit(0).cast("long"))
        out = out + F.when(
            c_hi * 2 > F.col("__n"), F.shiftleft(one, i + half)
        ).otherwise(F.lit(0).cast("long"))
    return agg.select("doc_id", out.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    max_hamming: int = 3,
    bands: int = 4,
    bits: int = 64,
    hash_fn: str = "xxhash64",
    max_bucket_size: int | None = 1024,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Candidate generation by banding the ``bits``-bit hash into
    ``bands`` equal blocks (pigeonhole: any pair within hamming
    distance bands-1 shares at least one exact block); verify with
    bit_count. Output: (doc_a, doc_b, hamming int).

    ``id_col`` values must be unique (duplicate ids would emit
    hamming-0 self-pairs; a doc_a != doc_b guard drops them).
    ``max_bucket_size`` bounds hot-bucket memory — see
    _capped_bucket_pairs; None disables the cap."""
    if bits % bands:
        raise ValueError("bands must divide bits")
    sig = simhash_signatures(df, text_col, id_col, n, bits, hash_fn)
    width = bits // bands
    mask = (1 << width) - 1
    banded = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned("simhash", b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("block"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.block")
    # bucket-local pair generation (r8), same rationale as
    # minhash_lsh_pairs: self-joins get no exchange reuse, so the
    # lane-packed signature pipeline ran once PER SIDE; grouping each
    # (band, block) into a sorted (doc_id, simhash) member list runs
    # it once and moves one long per doc through ONE exchange, and
    # the per-pair work (xor + bit_count) is trivial in-array.  Hot
    # buckets are bounded by max_bucket_size (_capped_bucket_pairs).
    members = (
        banded.groupBy("band", "block")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("doc_id", "simhash"))
            ).alias("ms")
        )
        .filter(F.size("ms") >= 2)
    )

    # r17: hamming is computed in the post-explode projection (codegen)
    # instead of inside the interpreted HOF lambdas — same xor +
    # bit_count on the same longs, values unchanged (see the matching
    # minhash_lsh_pairs note)
    def _mk_pair(x, y):
        return F.struct(
            x["doc_id"].alias("doc_a"),
            y["doc_id"].alias("doc_b"),
            x["simhash"].alias("ha"),
            y["simhash"].alias("hb"),
        )

    return (
        _capped_bucket_pairs(members, _mk_pair, max_bucket_size)
        .select(
            F.col("pr.doc_a").alias("doc_a"),
            F.col("pr.doc_b").alias("doc_b"),
            F.bit_count(
                F.col("pr.ha").bitwiseXOR(F.col("pr.hb"))
            ).alias("hamming"),
        )
        .filter(F.col("doc_a") != F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str | None = None,
    threshold: float = 0.95,
    allow_full_cross: bool = False,
) -> DataFrame:
    """Cosine near-duplicate pairs over an embedding column.

    ``block_col`` (e.g. a cluster/label/LSH bucket — see
    functions.vector.hyperplane_bucket) turns the all-pairs crossJoin
    into an equi-join and is REQUIRED: an unblocked run is quadratic
    in the corpus. Tiny-corpus tests may opt in to the cartesian form
    explicitly with ``allow_full_cross=True``.
    Output: (doc_a, doc_b, cosine double)."""
    if block_col is None and not allow_full_cross:
        raise ValueError(
            "embedding_near_dup_pairs requires block_col (all-pairs "
            "crossJoin is quadratic); pass allow_full_cross=True only "
            "for tiny corpora"
        )
    left = df.select(
        F.col(id_col).alias("doc_a"),
        F.col(vec_col).alias("__va"),
        *([F.col(block_col).alias("__blk")] if block_col else []),
    )
    right = df.select(
        F.col(id_col).alias("doc_b"),
        F.col(vec_col).alias("__vb"),
        *([F.col(block_col).alias("__blk")] if block_col else []),
    )
    joined = (
        left.join(right, "__blk") if block_col else left.crossJoin(right)
    )
    return (
        joined.filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                dense_cosine(F.col("__va"), F.col("__vb")), 6
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def edit_distance_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_distance: int = 3,
    prefix_len: int = 32,
    band: int | None = None,
) -> DataFrame:
    """Near-identical pairs by Levenshtein distance on a fixed text
    prefix, with length-band blocking — the fuzzy-title/URL dedup
    family (typo-level duplicates that n-gram Jaccard over-merges
    and exact hashing misses).

    Blocking: two strings within edit distance d differ in length by
    at most d, so with ``band >= max_distance`` any qualifying pair
    lands in the same or adjacent length buckets. Each row emits its
    bucket b and probes {b-1, b, b+1} from the left side; the join is
    a plain equi-join on bucket (never all-pairs), and the exact
    `levenshtein(prefix_a, prefix_b) <= d` filter runs only inside
    buckets. The fixed ``prefix_len`` bounds per-pair cost at
    O(prefix_len^2) regardless of document size.

    Scale shape: one shuffle on the bucket key; bucket population is
    corpus_len/band-ish and data-dependent — for heavily skewed
    length distributions pre-filter or raise ``band`` resolution.
    Output: (doc_a, doc_b, dist int), doc_a < doc_b, distinct.
    """
    band = band if band is not None else max(max_distance, 4)
    key = F.substring(normalize_text(F.col(text_col)), 1, prefix_len)
    base = df.select(
        F.col(id_col).alias("__id"), key.alias("__key")
    ).withColumn("__b", F.floor(F.length("__key") / band))
    left = base.select(
        F.col("__id").alias("doc_a"),
        F.col("__key").alias("__ka"),
        F.explode(
            F.array(F.col("__b") - 1, F.col("__b"), F.col("__b") + 1)
        ).alias("__probe"),
    )
    right = base.select(
        F.col("__id").alias("doc_b"),
        F.col("__key").alias("__kb"),
        F.col("__b").alias("__probe"),
    )
    return (
        left.join(right, "__probe")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("dist", F.levenshtein("__ka", "__kb"))
        .filter(F.col("dist") <= max_distance)
        .select("doc_a", "doc_b", "dist")
        .distinct()
    )


def dup_source_matrix(
    pairs: DataFrame,
    doc_sources: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Cross-source near-duplication matrix: how many qualifying
    near-dup pairs span each (unordered) source pair — the curation
    diagnostic that tells you WHICH feeds are mirroring which (a hot
    off-diagonal cell means two crawls cover the same sites; a hot
    diagonal cell means a feed re-serves its own content) before you
    decide survivor policy or drop a source entirely.

    ``pairs`` is any dedup pair stream with (doc_a, doc_b) — minhash,
    simhash, n-gram Jaccard, or embedding near-dup all qualify.
    Scale shape: the pair stream is dedup OUTPUT (vanishingly small
    next to the corpus), so both id joins put the small side left and
    AQE broadcasts it — the corpus-sized source table never shuffles;
    the final matrix is |sources|² at most. Sources are ordered with
    least/greatest so the matrix is upper-triangular and engine-
    portable.
    """
    a = doc_sources.select(
        F.col(id_col).alias("doc_a"), F.col(source_col).alias("__sa")
    )
    b = doc_sources.select(
        F.col(id_col).alias("doc_b"), F.col(source_col).alias("__sb")
    )
    return (
        pairs.select("doc_a", "doc_b")
        .join(a, "doc_a")
        .join(b, "doc_b")
        .groupBy(
            F.least("__sa", "__sb").alias("source_a"),
            F.greatest("__sa", "__sb").alias("source_b"),
        )
        .agg(F.count("*").alias("n_pairs"))
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_doc_freq: int | None = DEFAULT_MAX_DOC_FREQ,
    hashed: bool = False,
) -> DataFrame:
    """Directed near-dup pairs by n-gram CONTAINMENT: rows
    (doc_a, doc_b, containment) where containment =
    |shingles(a) ∩ shingles(b)| / |shingles(a)| >= threshold — doc_a
    is (mostly) a subset of doc_b. The asymmetric complement of
    Jaccard: a short quote inside a long article scores near 1.0
    here but near 0 on Jaccard (the union is article-sized), so this
    is the excerpt/quote/boilerplate-inclusion detector Jaccard
    structurally cannot be.

    Same inverted-index plan as ``ngram_jaccard_pairs`` (postings
    self-join on shingle, df-pruned; sizes over the pruned space;
    ``hashed=True`` for the 64-bit production shuffle) — only the
    final formula and the emission of BOTH directions of each
    intersecting pair differ. Self-pairs are excluded; a < b ordering
    is NOT imposed, since direction is the point.
    """
    inter, sizes = _postings_inter(
        df, text_col, id_col, n, max_doc_freq, hashed, symmetric=False
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("__na")
    )
    return (
        inter.join(sa, "doc_a")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_common").cast("double") / F.col("__na"), 6
            ).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )


def dedup_substrings(
    df: DataFrame,
    min_words: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Cross-document duplicate-SUBSTRING removal at arbitrary word
    offsets — the Lee et al. 2021 ("Deduplicating Training Data
    Makes Language Models Better") exact-substring dedup, expressed
    relationally instead of via a suffix array: any ``min_words``-
    word run that already occurred earlier in the corpus (first
    occurrence = min (doc_id, start) over the run's hash) is removed
    from every later position, including INSIDE otherwise-unique
    documents and at unaligned offsets — the case the fixed-segment
    ``dedup_spans`` cannot see.

    Semantics: 1-based word positions; the W-gram starting at p
    covers words [p, p+W-1]; every non-first occurrence of a gram
    hash marks its interval for removal; a word survives iff no
    removal interval covers it. Output: (doc_id, n_words,
    n_dup_intervals  [MERGED overlapping intervals],
    n_words_removed, text_dedup). Docs shorter than ``min_words``
    pass through whole (they contribute no grams).

    Scale shape: gram hashes are built MAP-SIDE from the tokenized
    array; only the narrow (doc_id, pos, hash) occurrence relation
    shuffles into the first-occurrence window (same hash-window plan
    as dedup_exact/dedup_spans; a pathological million-fold gram is
    one task's window). ``hash_fn`` sets the gram-hash width — the
    dominant byte cost of that shuffle at 100 TB: the default
    ``xxhash64`` keys occurrences with an 8-byte long built by
    hashing each word once and composing W word-hashes per position
    (no per-position string rebuild — 4.4x cheaper map side,
    measured; collision odds stay ~n²/2⁶⁵ over DISTINCT grams — a
    false merge needs two different W-word runs to collide, which at
    1e12 grams is ~3e-8); ``md5`` keeps the 32-byte joined-string
    hex key whose expression DuckDB evaluates identically, so oracle
    comparisons are portable by construction rather than modulo
    collisions. Duplicate starts aggregate per doc (narrow),
    equi-join back onto the tokenized corpus on doc_id, and interval
    merging + gap reassembly run MAP-SIDE: merging is an O(k)
    break scan (equal-width intervals make the merged end monotone,
    so a start opens a new interval iff its gap from the previous
    start exceeds W — the accumulator-rebuilding fold spelling was
    O(k²) per doc and profiled at ~1.6 s of the 100k stress row),
    reassembly one linear aggregate() fold over the disjoint
    intervals. Total: two corpus scans + three shuffles, none wider
    than the occurrence relation — the same I/O class as the
    suffix-array construction the original needs, without the
    8 bytes/token suffix index.
    """
    W = int(min_words)
    if W < 2:
        raise ValueError("min_words must be >= 2")
    if hash_fn not in ("xxhash64", "md5"):
        raise ValueError("hash_fn must be 'xxhash64' or 'md5'")
    from ..util import ensure_parallelism

    df = ensure_parallelism(df)
    toks = F.filter(
        F.split(
            F.trim(F.lower(F.coalesce(text_col, F.lit("")))), r"\s+"
        ),
        lambda s: s != "",
    )
    staged = df.select(F.col(id_col).alias("doc_id"), toks.alias("__toks"))
    sized = staged.select(
        "doc_id",
        "__toks",
        (F.size("__toks") - F.lit(W - 1)).alias("n_grams"),
    )

    if hash_fn == "xxhash64":
        # production path: hash each word ONCE, gram hash = xxhash64
        # over the W word-hash longs — the concat_ws(slice) spelling
        # rebuilds and re-hashes a ~W-word string per POSITION
        # (O(tokens x W) char copying; measured 1.80 s vs 0.41 s for
        # this spelling on the 100k r12 profile, identical distinct-
        # gram structure). Collision class unchanged: two different
        # grams collide only through 64-bit composition, ~n²/2⁶⁵.
        # r17: the per-position chain of W interpreted hashLongs moves
        # into the vectorized Arrow kernel (ngram_hashes_udf) — the
        # native transform spelling evaluated W=50 seed-chained
        # xxhash64 children per position in interpreted HOF mode;
        # gram values and positions are bit-identical (variant
        # equivalence test + md5-oracle parity unchanged).
        from ..functions.hashkernel import ngram_hashes_udf

        sized = staged.select(
            "doc_id",
            "__toks",
            F.transform(
                F.col("__toks"), lambda w: F.xxhash64(w)
            ).alias("__wh"),
        )
        occ = sized.select(
            "doc_id",
            F.posexplode(
                ngram_hashes_udf(W)(F.col("__wh"))
            ).alias("p0", "h"),
        ).select("doc_id", (F.col("p0") + 1).alias("pos"), "h")
    else:
        # md5 keeps the joined-string spelling: DuckDB evaluates
        # md5(concat) identically, so oracle first-occurrence
        # decisions are portable BY CONSTRUCTION, not modulo the
        # word-hash composition
        def _gram_hash(i):
            return F.md5(F.concat_ws(" ", F.slice(F.col("__toks"), i, W)))

        grams = F.when(
            F.col("n_grams") >= 1,
            F.transform(
                F.sequence(F.lit(1), F.col("n_grams")), _gram_hash
            ),
        ).otherwise(F.array().cast("array<string>"))
        occ = sized.select(
            "doc_id", F.posexplode(grams).alias("p0", "h")
        ).select("doc_id", (F.col("p0") + 1).alias("pos"), "h")
    w = Window.partitionBy("h").orderBy("doc_id", "pos")
    dup_starts = (
        occ.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") > 1)
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("__starts"))
    )
    base = staged.select(
        "doc_id", "__toks", F.size("__toks").alias("n_words")
    )
    joined = base.join(dup_starts, "doc_id", "left").select(
        "doc_id",
        "__toks",
        "n_words",
        F.coalesce(
            "__starts", F.array().cast("array<int>")
        ).alias("__starts"),
    )
    # step 1: merge sorted equal-width intervals ([p, p+W) exclusive
    # end). Ends are monotone under sorted starts, so start p opens a
    # NEW interval iff p > prev_p + W — a break scan, not a fold: the
    # previous aggregate() spelling rebuilt the accumulator array per
    # element (slice+concat, O(k²) struct copies per doc), which
    # profiled at ~1.6 s of the 100k stress row on its own; this
    # spelling is O(k) element_at reads. Interval j spans
    # [starts[brk_j], starts[brk_{j+1} - 1] + W).
    ss = F.col("__starts")
    kk = F.size(ss)
    brk = F.filter(
        F.sequence(F.lit(1), F.greatest(kk, F.lit(1))),
        lambda i: (i <= kk)
        & (
            (i == 1)
            | (F.element_at(ss, i) - F.element_at(ss, i - 1) > W)
        ),
    )
    merged = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(brk), F.lit(1))),
        lambda j: F.struct(
            F.element_at(ss, F.element_at(brk, j)).cast("int").alias("s"),
            (
                F.element_at(
                    ss,
                    F.coalesce(
                        F.try_element_at(brk, j + 1) - 1, kk
                    ),
                )
                + F.lit(W)
            )
            .cast("int")
            .alias("e"),
        ),
    )
    merged = F.when(kk >= 1, merged).otherwise(
        F.array().cast("array<struct<s:int,e:int>>")
    )
    staged2 = joined.select(
        "doc_id", "__toks", "n_words", merged.alias("__ivs")
    )

    # fold 2: gap reassembly — walk the disjoint intervals, keeping
    # the words between them, then the tail after the last one.
    def _gap_step(acc, iv):
        return F.struct(
            iv["e"].alias("prev"),
            F.concat(
                acc["kept"],
                F.slice(
                    F.col("__toks"), acc["prev"], iv["s"] - acc["prev"]
                ),
            ).alias("kept"),
        )

    def _gap_finish(acc):
        return F.concat(
            acc["kept"],
            F.slice(
                F.col("__toks"),
                acc["prev"],
                F.col("n_words") - acc["prev"] + 1,
            ),
        )

    gap_zero = F.struct(
        F.lit(1).cast("int").alias("prev"),
        F.array().cast("array<string>").alias("kept"),
    )
    kept = F.aggregate(F.col("__ivs"), gap_zero, _gap_step, _gap_finish)
    staged3 = staged2.select(
        "doc_id",
        "n_words",
        F.size("__ivs").alias("n_dup_intervals"),
        kept.alias("__kept"),
    )
    return staged3.select(
        "doc_id",
        "n_words",
        "n_dup_intervals",
        (F.col("n_words") - F.size("__kept")).alias("n_words_removed"),
        F.concat_ws(" ", "__kept").alias("text_dedup"),
    )


def semdedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int = 64,
    eps: float = 0.05,
    seed: int = 42,
    train_fraction: float | None = None,
    n_corpus: int | None = None,
    strip_rows: int | None = 2048,
    max_strips: int = 16,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by k-means clustering of the embedding space plus
    within-cluster cosine thresholding — the scale path for
    embedding near-dedup when no natural blocking column exists
    (``embedding_near_dup_pairs`` requires one; this op LEARNS the
    blocks from the data, which is exactly the paper's trick for
    avoiding the corpus-quadratic all-pairs comparison).

    Semantics (paper §2.2): cluster all embeddings with k-means;
    within each cluster, any pair with cosine similarity >= 1 - eps
    is a semantic-duplicate pair; from each group of duplicates KEEP
    the example with the LOWEST cosine similarity to its cluster
    centroid (the least-redundant member — the one carrying the most
    information the centroid doesn't). Implemented as a dominance
    filter with no connected-components pass: row x is dropped iff
    some same-cluster y with cos(x, y) >= 1 - eps has strictly lower
    centroid-similarity (ties on centroid-similarity broken by id
    ASC, so the result is deterministic). Guarantee — the paper's
    filter semantics, NOT one-per-clique: no two survivors in a
    cluster are near-duplicates of each other, and the
    lowest-centroid-similarity member of every duplicate chain
    survives; on a NON-transitive chain (sim(A,B) and sim(B,C) over
    threshold but sim(A,C) under it, A ranked first) B and C are
    BOTH dropped, so a mutual-duplicate subset may keep zero members
    as long as some chain neighbor that dominated them survives.

    Scale shape: the quantizer trains on a bounded driver-side sample
    (reuses the IVF trainer — spread-sampled heads, 10 Lloyd
    iterations); cluster assignment + centroid-similarity is ONE
    map-only Arrow kernel over the corpus (a single (batch x k) BLAS
    matmul serves both the argmin and the cosine); the duplicate
    test is a grouped map (applyInArrow — the cluster's vectors read
    zero-copy off the Arrow buffers; the pandas route materializes
    |c| x dim Python floats and dominated the kernel) keyed by
    cluster that
    RETURNS THE SURVIVORS — so the whole operator is one scan, a
    bounded number of exchanges, one grouped map, and NO join (a
    dropped-ids + anti-join spelling was measured and rejected: the
    anti-join's two references to the staged input each recompute
    it — no exchange reuse, same r8 self-join finding — and a union
    input gets the join pushed through it, running the grouped map
    once PER BRANCH). Per-cluster compute is O(|c|^2 x dim) flops —
    bounded by sizing ``n_clusters`` ~ corpus/target_cluster_size
    exactly as the paper does (50k clusters at LAION scale). Select
    wide payload columns away before calling if rows carry large
    text blobs.

    r17 STRIP PARALLELISM (``strip_rows``): the r12-r16 shape keyed
    the grouped map by cluster alone, so a hot cluster's whole
    O(|c|^2 x dim) dominance test ran in ONE task — at the bench
    fixture the two 15k-row clusters were each a ~12 s single-task
    sgemm straggler while 30 cores idled (the documented r13
    2-thread-BLAS cap makes this worse). The dominance test is a pure
    pairwise any() against EARLIER rows, so it decomposes exactly
    along the block boundaries the monolithic kernel already used:
    rows are ranked within their cluster by (cent_sim ASC, id ASC)
    (one window over the cluster exchange), every ``strip_rows`` ranks
    form a strip, and each row is shipped to its own strip as a member
    plus every LATER strip of its cluster as context. Each
    (cluster, strip) task then runs the SAME two BLAS calls the
    monolithic block loop ran for that strip. Bit-identity claim,
    precisely (r17 ADVICE): at ``strip_rows=2048`` — the monolithic
    kernel's block size — the GEMM operand shapes match the
    monolithic loop call-for-call, so the float32 comparisons and
    therefore the survivor set are bit-identical; at other strip
    sizes the same pair dot products are computed with different BLAS
    blocking, which is mathematically identical but may differ in the
    last ulp of a borderline >= threshold comparison. Cost: clusters
    <= strip_rows are unchanged (one strip, zero duplication); a
    cluster of K strips ships ~K/2 extra context copies of itself
    through the strip exchange — the deliberate trade that turns the
    |c|^2 straggler into per-strip tasks (wall = the LAST strip's
    |strip| x |c| GEMM, not the cluster's |c|^2/2).

    r18 DUPLICATION BOUND (``max_strips``, VERDICT r17 item 3): the
    context duplication above is O(K^2/2) row copies for a K-strip
    cluster — unbounded in cluster size, so one adversarial
    million-row hot cluster at strip_rows=2048 would push ~489
    strips x ~half the cluster (~500 GB at dim 1024) through a single
    exchange. Each cluster's effective strip size is therefore
    ``max(strip_rows, ceil(|c| / max_strips))``: clusters up to
    strip_rows x max_strips (32.8k rows at the defaults) keep the
    exact strip_rows blocking (bit-identical per the claim above, and
    covering every cluster of the bench fixture), and larger clusters
    widen their strips so total context copies stay <= max_strips/2
    x cluster bytes — shuffle stays linear in cluster size with a
    constant duplication factor, while per-task work stays bounded at
    O(|c|^2 x dim / max_strips). ``strip_rows=None`` keeps the old
    single-task-per-cluster shape (used by the equivalence tests).

    Output: the surviving rows of ``df`` with ``cluster`` (int) and
    ``cent_sim`` (double, cosine to own centroid) appended.
    """
    import numpy as np

    from .search import _cluster_sim_udf, _train_ivf_centroids

    if not 0.0 < eps < 1.0:
        raise ValueError(f"eps must be in (0, 1), got {eps}")
    cent = _train_ivf_centroids(
        df, vec_col, n_clusters, seed, train_fraction, n_corpus
    )
    assign = _cluster_sim_udf(cent.T, (cent**2).sum(axis=1))

    staged = df.withColumn("__a", assign(F.col(vec_col))).select(
        "*",
        F.col("__a.cluster").alias("cluster"),
        F.col("__a.cent_sim").alias("cent_sim"),
    ).drop("__a")

    thr = 1.0 - eps
    vec_name, id_name = vec_col, id_col
    n_parts = max(
        8 * len(cent), df.sparkSession.sparkContext.defaultParallelism
    )

    if strip_rows is None:
        col_idx = {f.name: j for j, f in enumerate(staged.schema.fields)}

        def _per_partition(batches):
            import pyarrow as pa

            from .search import _pa_matrix

            # one partition holds WHOLE clusters (hash repartition on
            # the cluster id below), so buffering it bounds task memory
            # at partition bytes ~ max cluster bytes. mapInArrow is
            # used instead of groupBy().applyInArrow because
            # FlatMapGroupsInArrowExec converts array columns per group
            # at InternalRow granularity: an IDENTITY grouped map over
            # these 105k x 1024 rows measured ~50 s where the same
            # bytes through mapInArrow cost 3.2 s.
            bl = list(batches)
            if not bl:
                return
            tbl = pa.Table.from_batches(bl)
            n = tbl.num_rows
            if n == 0:
                return
            X = _pa_matrix(tbl.column(col_idx[vec_name]), dtype=np.float32)
            norms = np.linalg.norm(X, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            Xn = X / norms
            cl = tbl.column(col_idx["cluster"]).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            cs = tbl.column(col_idx["cent_sim"]).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            ids = tbl.column(col_idx[id_name]).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            drop = np.zeros(n, dtype=bool)
            order = np.argsort(cl, kind="stable")
            bounds = np.flatnonzero(np.diff(cl[order])) + 1
            thr32 = np.float32(thr)
            block = 2048
            for g in np.split(order, bounds):
                if len(g) <= 1:
                    continue
                # sort the cluster by (cent_sim ASC, id ASC): x is
                # dominated iff SOME EARLIER row is a near-dup, so the
                # dominance test collapses to a lower-triangle index
                # mask and each sgemm strip only needs columns up to
                # its own end — half the flops of the full square, and
                # no float comparisons in the inner loop
                m = len(g)
                srt = g[np.lexsort((ids[g], cs[g]))]
                Xg = Xn[srt]
                dropped_g = np.zeros(m, dtype=bool)
                for s in range(0, m, block):
                    b = min(block, m - s)
                    strip = Xg[s : s + b]
                    hit = np.zeros(b, dtype=bool)
                    if s:
                        # columns < s are earlier than every strip
                        # row: no mask needed
                        hit = (strip @ Xg[:s].T >= thr32).any(axis=1)
                    diag = strip @ strip.T  # (b, b) within-strip block
                    tri = np.arange(b)
                    hit |= (
                        (diag >= thr32) & (tri[None, :] < tri[:, None])
                    ).any(axis=1)
                    dropped_g[s : s + b] = hit
                drop[srt] = dropped_g
            for rb in tbl.filter(pa.array(~drop)).to_batches():
                yield rb

        # spread clusters over ~8x more hash buckets than clusters so
        # two clusters rarely share a task; empty partitions cost
        # nothing
        return staged.repartition(n_parts, F.col("cluster")).mapInArrow(
            _per_partition, staged.schema
        )

    # r17 strip-parallel path (default): rank rows within their
    # cluster by the dominance order, replicate each row to its own
    # strip (member) plus every later strip (context), and run each
    # strip's two BLAS calls — identical to the monolithic block
    # loop's calls for that strip — in its own task. See the
    # docstring's STRIP PARALLELISM note for the value-identity
    # argument and the duplication trade.
    if strip_rows < 2:
        raise ValueError(f"strip_rows must be >= 2, got {strip_rows}")
    if max_strips < 1:
        raise ValueError(f"max_strips must be >= 1, got {max_strips}")
    S = int(strip_rows)
    from pyspark.sql import Window

    w_rank = Window.partitionBy("cluster").orderBy(
        F.asc("cent_sim"), F.asc(id_col)
    )
    w_all = Window.partitionBy("cluster")
    # per-cluster effective strip size (the r18 duplication bound):
    # strip_rows exactly for clusters <= strip_rows * max_strips,
    # ceil(|c| / max_strips) beyond — K never exceeds max_strips
    srows = F.greatest(
        F.lit(S),
        F.ceil(F.col("__csize") / F.lit(float(max_strips))).cast("int"),
    )
    ranked = staged.select(
        "*",
        (F.row_number().over(w_rank) - 1).alias("__rank"),
        F.count(F.lit(1)).over(w_all).alias("__csize"),
    ).withColumn("__srows", srows)
    member_strip = (F.col("__rank") / F.col("__srows")).cast("int")
    n_strips = F.ceil(
        F.col("__csize") / F.col("__srows").cast("double")
    ).cast("int")
    exploded = ranked.select(
        *[f.name for f in staged.schema.fields],
        "__rank",
        "__srows",
        F.explode(
            F.sequence(member_strip, n_strips - F.lit(1))
        ).alias("__strip"),
    )
    col_idx = {f.name: j for j, f in enumerate(exploded.schema.fields)}
    out_names = [f.name for f in staged.schema.fields]

    def _per_strip(batches):
        import pyarrow as pa

        from .search import _pa_matrix

        bl = list(batches)
        if not bl:
            return
        tbl = pa.Table.from_batches(bl)
        n = tbl.num_rows
        if n == 0:
            return
        X = _pa_matrix(tbl.column(col_idx[vec_name]), dtype=np.float32)
        norms = np.linalg.norm(X, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        Xn = X / norms
        cl = tbl.column(col_idx["cluster"]).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        st = tbl.column(col_idx["__strip"]).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        rk = tbl.column(col_idx["__rank"]).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        sr = tbl.column(col_idx["__srows"]).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        keep = np.zeros(n, dtype=bool)
        order = np.lexsort((rk, st, cl))
        cls, sts = cl[order], st[order]
        bounds = (
            np.flatnonzero((np.diff(cls) != 0) | (np.diff(sts) != 0)) + 1
        )
        thr32 = np.float32(thr)
        for g in np.split(order, bounds):
            strip_id = int(st[g[0]])
            # per-cluster effective strip size (constant within the
            # cluster, carried on every row)
            s_g = int(sr[g[0]])
            is_member = rk[g] >= strip_id * s_g
            mem = g[is_member]
            b = len(mem)
            if b == 0:
                continue
            strip = Xn[mem]  # g is rank-sorted, so mem is too
            hit = np.zeros(b, dtype=bool)
            ctx = g[~is_member]
            if len(ctx):
                # every context row ranks before every member row —
                # same call as the monolithic strip-vs-prefix sgemm
                hit = (strip @ Xn[ctx].T >= thr32).any(axis=1)
            diag = strip @ strip.T  # (b, b) within-strip block
            tri = np.arange(b)
            hit |= (
                (diag >= thr32) & (tri[None, :] < tri[:, None])
            ).any(axis=1)
            keep[mem[~hit]] = True
        out = tbl.filter(pa.array(keep)).select(out_names)
        for rb in out.to_batches():
            yield rb

    # r18 heavy-strip-first dispatch (guide S2.6, VERDICT r17 item 8):
    # task dispatch follows partition index, and hash partitioning
    # places a cluster's LAST strip — the one carrying the most
    # context rows and the biggest GEMM — at a uniformly random
    # index, so ~(cores/n_parts) of runs start it in the final wave
    # and its whole (strip x |c|) GEMM becomes the job tail. Range
    # partitioning on (__strip DESC, cluster) puts the heaviest
    # strips in the FIRST partitions instead. Group integrity holds:
    # every row of a (cluster, strip) task group shares the exact
    # sort key, and range boundaries are keys (equal keys land in one
    # partition), so no group is ever split — survivors identical
    # (asserted vs the monolithic path in tests). Interleaved ABAB x4
    # at the 105k bench fixture: hash min 7.65 s / range min 6.52 s,
    # range faster in every round with visibly lower variance (the
    # tail can no longer land late). Cost: the range sampling pass
    # over the exploded relation, included in those walls.
    return exploded.repartitionByRange(
        n_parts, F.desc("__strip"), F.asc("cluster")
    ).mapInArrow(_per_strip, staged.schema)


def _minhash_est_expr(a_sig, b_sig, num_perm: int):
    """Estimated Jaccard = fraction of matching signature positions —
    the same expression ``minhash_lsh_pairs`` scores pairs with.

    r17: spelled as ``num_perm`` unrolled ``element_at`` equality
    terms instead of ``aggregate(zip_with(...))`` — higher-order
    functions are interpreted per element with boxing, and this
    expression runs once per candidate pair (898k pre-distinct rows at
    the 250k bench point: 2.0 s HOF vs 0.4 s unrolled, measured via
    tools/profile_r17.py). The count is the same exact integer, so
    est values are bit-identical.

    r18 (ADVICE): past ~128 permutations the unrolled chain risks
    exceeding the JVM's 64KB-per-method codegen limit — Spark would
    silently fall back to interpreted evaluation of a huge expression
    tree (slower than the HOF it replaced) and planning itself slows
    — so larger num_perm keeps the aggregate(zip_with(...)) spelling;
    both compute the same exact integer count."""
    if num_perm > 128:
        matches = F.aggregate(
            F.zip_with(a_sig, b_sig, lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, v: acc + v,
        )
        return matches / F.lit(num_perm)
    terms = [
        (
            F.element_at(a_sig, i + 1) == F.element_at(b_sig, i + 1)
        ).cast("int")
        for i in range(num_perm)
    ]
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    return total / F.lit(num_perm)


def minhash_bands_from_signatures(
    sigs: DataFrame,
    num_perm: int,
    bands: int,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(doc_id, band, bucket) band rows derived from an existing
    (doc_id, sig) relation — the same band hash as
    ``minhash_lsh_pairs``'s banding and ``minhash_bands_maponly``
    (sig-slice md5/xxhash64), but computed off a signature column
    instead of re-running the shingle + permutation pipeline."""
    if num_perm % bands:
        raise ValueError("bands must divide num_perm")
    r = num_perm // bands

    def _bucket(b: int) -> Column:
        elems = [F.element_at("sig", b * r + j + 1) for j in range(r)]
        if hash_fn == "md5":
            return F.md5(F.concat_ws(",", *elems))
        return F.xxhash64(*elems)

    return sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        _bucket(b).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")


def build_minhash_index(
    docs: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    hash_fn: str = "xxhash64",
) -> int:
    """Persisted MinHash LSH index — the batch-incremental twin of the
    streaming ``st_minhash_dedup`` state store, and what a corpus
    refresh actually runs at 100 TB: signatures + band buckets are
    computed ONCE over the standing corpus and new batches probe the
    store instead of re-signing the whole union
    (``minhash_lsh_pairs(old ∪ new)`` re-pays the full signature
    pipeline — the dominant cost — on every refresh):

    - ``<index_path>/signatures.parquet`` — (doc_id, sig), the
      num_perm-wide minhash signature (verification payload);
    - ``<index_path>/bands.parquet``      — (band, bucket, doc_id),
      the LSH candidate-lookup relation;
    - ``<index_path>/meta.parquet``       — the shingle/permutation
      knobs, pinned so probe-time recompute is signature-identical.

    Both relations are map-only derivations of the corpus (row-local
    signatures, zero shuffles) and both upsert as pure appends.
    Returns the number of documents indexed."""
    if num_perm % bands:
        raise ValueError("bands must divide num_perm")
    spark = docs.sparkSession
    # the expensive shingle + permutation pipeline runs ONCE: the
    # persisted signature relation is the source for BOTH stores
    # (bands are a cheap sig-slice hash; review finding r14 — the old
    # spelling re-ran the whole pipeline for minhash_bands_maponly)
    sigs = minhash_signatures(
        docs, text_col, id_col, n, num_perm, hash_fn
    ).persist()
    try:
        sigs.write.mode("overwrite").parquet(
            _crel(index_path, "signatures")
        )
        minhash_bands_from_signatures(
            sigs, num_perm, bands, hash_fn
        ).select("band", "bucket", "doc_id").write.mode(
            "overwrite"
        ).parquet(_crel(index_path, "bands"))
    finally:
        sigs.unpersist()
    spark.createDataFrame(
        [(int(n), int(num_perm), int(bands), hash_fn)],
        "n int, num_perm int, bands int, hash_fn string",
    ).coalesce(1).write.mode("overwrite").parquet(
        _crel(index_path, "meta")
    )
    return spark.read.parquet(_crel(index_path, "signatures")).count()


def upsert_minhash_index(
    index_path: str,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    count_appended: bool = True,
) -> int:
    """Append a new batch's signatures and band rows under the
    STORED knobs — no recompute of the standing corpus (the shared
    upsert contract; typically called after ``dedup_against_index``
    filtered the batch to survivors). Returns documents appended —
    or -1 with ``count_appended=False``: the before/after counts are
    footer reads, but their cost grows with the store's accumulated
    segment count, so a recurring ingest loop that never reads the
    return value can skip both (the streaming gate does; pair with
    ``compact_index`` to bound the file count either way)."""
    spark = new_docs.sparkSession
    m = spark.read.parquet(_crel(index_path, "meta")).first()
    n_before = (
        spark.read.parquet(_crel(index_path, "signatures")).count()
        if count_appended
        else 0
    )
    sigs = minhash_signatures(
        new_docs, text_col, id_col, m["n"], m["num_perm"], m["hash_fn"]
    ).persist()
    try:
        sigs.write.mode("append").parquet(
            _crel(index_path, "signatures")
        )
        minhash_bands_from_signatures(
            sigs, m["num_perm"], m["bands"], m["hash_fn"]
        ).select("band", "bucket", "doc_id").write.mode(
            "append"
        ).parquet(_crel(index_path, "bands"))
    finally:
        sigs.unpersist()
    if not count_appended:
        return -1
    n_after = spark.read.parquet(
        _crel(index_path, "signatures")
    ).count()
    return n_after - n_before


def _probe_minhash_index(
    spark,
    index_path: str,
    new_docs: DataFrame,
    threshold: float,
    text_col: str,
    id_col: str,
    intra_batch: bool = False,
) -> DataFrame:
    """(old_id, new_id, est) matches of a probe batch against the
    store; with ``intra_batch`` also (smaller_id → larger_id) matches
    WITHIN the batch off the same band rows (a band self-join on the
    broadcast batch — no store involvement). Scale shape: the batch's
    band rows and signatures are both
    row-local computes over the (contract-bounded) batch and BROADCAST
    — the bands store scans ONCE map-side with no shuffle of the
    store, candidate (old, new) ids dedup on three narrow columns
    BEFORE any signature is touched, and the signatures store scans
    once semi-joined by the broadcast candidates. Nothing corpus-sized
    ever shuffles."""
    m = spark.read.parquet(_crel(index_path, "meta")).first()
    # the batch's shingle + permutation pipeline runs once: bands are
    # the sig-slice hash of the same signatures the verify stage uses.
    # The batch is contract-bounded (the reference's probe unit is the
    # ingest micro-batch, <=1k docs — embed_to_milvus.py:87-89 checks
    # per batch), so its signatures are computed ONCE and collected
    # into a driver-local relation: every downstream use (band
    # derivation, both broadcast joins) then reads an in-memory
    # LocalRelation. Versus persist(): no CacheManager entry pinned
    # for the session lifetime (r14 ADVICE). Versus the r15
    # localCheckpoint: no eager block-write barrier serializing ahead
    # of the probe plan (the r15 bench point read the probe slower
    # than the union re-sign it replaces), and the broadcasts build
    # from local rows without launching a job.
    sig_plan = minhash_signatures(
        new_docs, text_col, id_col, m["n"], m["num_perm"], m["hash_fn"]
    )
    batch_sigs = spark.createDataFrame(
        sig_plan.collect(), schema=sig_plan.schema
    )
    pb = minhash_bands_from_signatures(
        batch_sigs, m["num_perm"], m["bands"], m["hash_fn"]
    ).select("band", "bucket", F.col("doc_id").alias("__new_id"))
    cand = (
        spark.read.parquet(_crel(index_path, "bands"))
        .join(F.broadcast(pb), ["band", "bucket"])
        .select(F.col("doc_id").alias("__old_id"), "__new_id")
        .dropDuplicates()
    )
    if intra_batch:
        # within-batch candidates off the SAME band rows: smaller id
        # plays the "old" role so the downstream anti-join keeps it
        self_cand = (
            pb.alias("l")
            .join(
                pb.select(
                    "band", "bucket",
                    F.col("__new_id").alias("__r_id"),
                ).alias("r"),
                ["band", "bucket"],
            )
            .filter(F.col("__new_id") < F.col("__r_id"))
            .select(
                F.col("__new_id").alias("__old_id"),
                F.col("__r_id").alias("__new_id"),
            )
            .dropDuplicates()
        )
        cand = cand.unionByName(self_cand).dropDuplicates()
    old_sig_src = spark.read.parquet(
        _crel(index_path, "signatures")
    ).select("doc_id", "sig")
    if intra_batch:
        # intra-batch "old" docs live in the batch, not the store
        old_sig_src = old_sig_src.unionByName(
            batch_sigs.select("doc_id", "sig")
        )
    old_sigs = (
        old_sig_src.join(
            F.broadcast(cand),
            F.col("doc_id") == F.col("__old_id"),
        )
        .select("__old_id", "__new_id", F.col("sig").alias("__old_sig"))
    )
    new_sigs = batch_sigs.select(
        F.col("doc_id").alias("__new_id"),
        F.col("sig").alias("__new_sig"),
    )
    return (
        old_sigs.join(F.broadcast(new_sigs), "__new_id")
        .select(
            "__old_id",
            "__new_id",
            F.round(
                _minhash_est_expr(
                    F.col("__old_sig"), F.col("__new_sig"),
                    int(m["num_perm"]),
                ),
                6,
            ).alias("est"),
        )
        .filter(F.col("est") >= threshold)
    )


@_pin
def minhash_probe_index(
    spark,
    index_path: str,
    new_docs: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup matches of a new batch against a
    ``build_minhash_index`` store, in ``minhash_lsh_pairs`` output
    shape: (doc_a, doc_b, est_jaccard) with doc_a < doc_b — EXACTLY
    the cross-(store, batch) subset of
    ``minhash_lsh_pairs(old ∪ new)`` at the stored knobs (same
    shingles, same permutation seeds, same band buckets, same
    estimate; asserted in tests), without re-signing the standing
    corpus."""
    out = _probe_minhash_index(
        spark, index_path, new_docs, threshold, text_col, id_col
    )
    return (
        out.select(
            F.least("__old_id", "__new_id").alias("doc_a"),
            F.greatest("__old_id", "__new_id").alias("doc_b"),
            F.col("est").alias("est_jaccard"),
        )
        .filter(F.col("doc_a") != F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )


@_pin
def dedup_against_index(
    spark,
    index_path: str,
    new_docs: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    intra_batch: bool = False,
    exclude_self: bool = False,
) -> DataFrame:
    """The incremental ingest-dedup operator: new documents with NO
    near-duplicate in the standing corpus (one probe + an anti-join).
    Follow with ``upsert_minhash_index`` on the survivors to keep the
    store current — the P6/J2 ingest anti-join generalized from exact
    ids to MinHash near-duplication.

    ``exclude_self=True`` ignores store matches where old_id ==
    new_id — required under at-least-once replay (the streaming
    ingest gate): a replayed batch whose survivors were already
    upserted would otherwise match THEMSELVES in the store and all
    drop, losing the batch's output on the re-run. Only sound when
    ids are globally unique (the corpus contract).

    By default two near-duplicates WITHIN one batch both survive
    (neither is in the store yet) and both get upserted — permanently
    admitting the pair (r15 ADVICE). ``intra_batch=True`` closes the
    gap off the probe's own band rows: a batch doc is also dropped
    when it near-matches a SMALLER-id doc in the same batch. That
    rule is PAIRWISE, not transitive-closure: with a<c<b, a~b and
    c~b but a≁c, only b drops here (a and c both survive), while a
    cluster pass keeps one survivor per connected component; for
    full cluster semantics run ``minhash_lsh_pairs`` +
    ``dup_survivors`` on the batch before probing."""
    matched = _probe_minhash_index(
        spark, index_path, new_docs, threshold, text_col, id_col,
        intra_batch=intra_batch,
    )
    if exclude_self:
        matched = matched.filter(
            F.col("__old_id") != F.col("__new_id")
        )
    matches = matched.select(
        F.col("__new_id").alias(id_col)
    ).dropDuplicates()
    return new_docs.join(matches, id_col, "left_anti")

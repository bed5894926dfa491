"""Vectorized, bit-exact reimplementation of Spark's ``xxhash64`` SQL
function over numpy uint64 lanes, and the signature kernels built on it.

Why this exists (r17 optimization round): the row-local minhash/simhash
spellings in ``operators.dedup`` evaluate their per-permutation work
through Catalyst higher-order functions (``transform``/``aggregate``),
which are interpreted per array element with boxing — the same cost
class ``_pair_score_udf`` already measured at ~8k rows/s vs ~1M rows/s
for a vectorized Arrow kernel. The 64-permutation minhash fold is the
single largest term in the curate/minhash bench sections. These kernels
compute the *identical integer values* (Spark's XXH64 variant,
seed-chained exactly like the ``xxhash64(...)`` expression) so every
downstream result — band buckets, est_jaccard, survivor sets — is
bit-for-bit unchanged; equivalence is asserted against the native
expression spellings in tests/test_hashkernel.py.

Spark's XXH64 (sql/catalyst XXH64.java) hashes multi-argument calls by
seed-chaining: ``xxhash64(a, b)`` = ``hash(b, seed=hash(a, seed=42))``,
with LongType fields through ``hashLong`` and IntegerType literals
through ``hashInt``. Both are small fixed formulas over 64-bit
multiply/rotate/xor — exactly the shape numpy vectorizes well. uint64
arithmetic in numpy wraps modulo 2^64 like Java longs; comparisons that
need Java's *signed* semantics (array_min) view the lanes as int64.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import functions as F
from pyspark.sql import types as T

# XXH64 primes as unsigned decimals, taken verbatim from the signed
# long constants in Spark's compiled XXH64 class (javap -c of
# spark-catalyst's XXH64.hashLong/hashInt/fmix), i.e. value & 2^64-1 of
# -7046029288634856825, -4417276706812531889, 1609587929392839161,
# -8796714831421723037, 2870177450012600261. Parity with the live
# xxhash64 expression is pinned in tests/test_hashkernel.py.
_P1 = np.uint64(11400714785074694791)
_P2 = np.uint64(14029467366897019727)
_P3 = np.uint64(1609587929392839161)
_P4 = np.uint64(9650029242287828579)
_P5 = np.uint64(2870177450012600261)
SEED = np.uint64(42)  # Spark's default xxhash64 seed

_U8 = np.uint64(8)
_U4 = np.uint64(4)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    rr = np.uint64(r)
    inv = np.uint64(64 - r)
    return (x << rr) | (x >> inv)


def _fmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * _P2
    h = h ^ (h >> np.uint64(29))
    h = h * _P3
    h = h ^ (h >> np.uint64(32))
    return h


def xxh64_long(v: np.ndarray, seed) -> np.ndarray:
    """XXH64.hashLong(v, seed) — bit-exact, vectorized.

    ``v`` uint64 array; ``seed`` uint64 scalar or same-shape array.
    Returns uint64 array.
    """
    with np.errstate(over="ignore"):
        h = seed + _P5 + _U8
        h = h ^ (_rotl(v * _P2, 31) * _P1)
        h = _rotl(h, 27) * _P1 + _P4
        return _fmix(h)


def xxh64_int(i: int, seed: np.ndarray) -> np.ndarray:
    """XXH64.hashInt(i, seed) — bit-exact, vectorized over ``seed``.

    Matches Spark hashing an IntegerType value (e.g. the ``lit(i)``
    permutation index in ``xxhash64(shingle, lit(i))``).
    """
    with np.errstate(over="ignore"):
        h = seed + _P5 + _U4
        h = h ^ (np.uint64(i & 0xFFFFFFFF) * _P1)
        h = _rotl(h, 23) * _P2 + _P3
        return _fmix(h)


def xxh64_bytes(data: bytes, seed: int = 42) -> int:
    """XXH64.hashUnsafeBytes(data, seed) — bit-exact scalar Python
    twin of Spark hashing a StringType value (UTF-8 bytes, 8-byte
    words read little-endian like Platform.getLong on x86/ARM).

    Used to precompute DRIVER-SIDE hash constants for small word sets
    (language markers, stopwords) that vectorized kernels then match
    against ``xxhash64(word)`` columns — parity with the live
    expression is pinned in tests/test_hashkernel.py. Scalar and
    slow-ish by design: call it on tiny reference vocabularies, never
    per row."""
    M = (1 << 64) - 1

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (64 - r))) & M

    p1, p2, p3, p4, p5 = (int(_P1), int(_P2), int(_P3), int(_P4),
                          int(_P5))
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + p1 + p2) & M
        v2 = (seed + p2) & M
        v3 = seed & M
        v4 = (seed - p1) & M
        while i <= n - 32:
            for j, v in enumerate((v1, v2, v3, v4)):
                k = int.from_bytes(data[i + 8 * j : i + 8 * j + 8],
                                   "little")
                v = (v + k * p2) & M
                v = (rotl(v, 31) * p1) & M
                if j == 0:
                    v1 = v
                elif j == 1:
                    v2 = v
                elif j == 2:
                    v3 = v
                else:
                    v4 = v
            i += 32
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & M
        for v in (v1, v2, v3, v4):
            h ^= (rotl((v * p2) & M, 31) * p1) & M
            h = (h * p1 + p4) & M
    else:
        h = (seed + p5) & M
    h = (h + n) & M
    while i <= n - 8:
        k = int.from_bytes(data[i : i + 8], "little")
        h ^= (rotl((k * p2) & M, 31) * p1) & M
        h = (rotl(h, 27) * p1 + p4) & M
        i += 8
    if i <= n - 4:
        k = int.from_bytes(data[i : i + 4], "little")
        h ^= (k * p1) & M
        h = (rotl(h, 23) * p2 + p3) & M
        i += 4
    while i < n:
        h ^= ((data[i] & 0xFF) * p5) & M
        h = (rotl(h, 11) * p1) & M
        i += 1
    h ^= h >> 33
    h = (h * p2) & M
    h ^= h >> 29
    h = (h * p3) & M
    h ^= h >> 32
    # Spark returns a signed long
    return h - (1 << 64) if h >= (1 << 63) else h


def lang_stop_scores_udf(
    lang_marker_hashes: "list[np.ndarray]", stop_hashes: "np.ndarray"
):
    """Arrow kernel over per-doc word-hash arrays (``__wh``) computing
    BOTH interpreted scoring folds of clean_corpus/profile_documents
    in one vectorized pass (guide S4.2):

    - ``scores``: the 16-bit-lane-packed language marker counts,
      lane i saturating at 65535 — value-identical to
      ``lang_marker_scores`` (saturating +1 increments == min(count,
      65535) since increments are monotone);
    - ``stop_hits``: the stopword count ``quality_score`` folds.

    Word membership is tested on the int64 ``xxhash64(word)`` values
    against driver-precomputed marker/stopword hashes (``xxh64_bytes``
    of the same UTF-8 words) — the token STRINGS never cross the
    Python boundary (the r17 string-array kernel lost to transfer;
    hashes halve the bytes and skip string decode). Collision class:
    a non-marker word counts iff its xxhash64 collides with one of
    ~25 reference hashes (~|vocab| x 25 / 2^64) — the same accepted
    class as every other xxhash64 path here.
    """
    lane_tables = [
        np.sort(np.asarray(h, dtype=np.int64))
        for h in lang_marker_hashes
    ]
    stop_table = np.sort(np.asarray(stop_hashes, dtype=np.int64))
    out_t = T.StructType(
        [
            T.StructField("scores", T.LongType()),
            T.StructField("stop_hits", T.IntegerType()),
        ]
    )

    @F.arrow_udf(out_t)
    def lang_stop(wh: pa.Array) -> pa.Array:
        if len(wh) == 0:
            return pa.array(
                [],
                type=pa.struct(
                    [("scores", pa.int64()), ("stop_hits", pa.int32())]
                ),
            )
        if isinstance(wh, pa.ChunkedArray):
            wh = wh.combine_chunks()
        # NULL word arrays (NULL text upstream of a non-coalescing
        # caller) must yield a NULL struct: the native folds return
        # NULL there and quality_score's least() deliberately skips
        # it — a 0 here would flip the score
        null_mask = None
        if wh.null_count:
            null_mask = wh.is_null()
            wh = wh.fill_null([])
        vals, starts, counts = list_array_segments(wh)
        v = vals.astype(np.int64, copy=False)
        packed = np.zeros(len(starts), dtype=np.int64)
        nonempty = counts > 0
        for i, tbl in enumerate(lane_tables):
            hits = np.zeros(len(starts), dtype=np.int64)
            if len(v):
                isin = np.isin(v, tbl).astype(np.int64)
                hits[nonempty] = np.add.reduceat(
                    isin, starts[nonempty]
                )
            np.minimum(hits, 0xFFFF, out=hits)
            packed += hits << np.int64(16 * i)
        stop = np.zeros(len(starts), dtype=np.int64)
        if len(v):
            isin = np.isin(v, stop_table).astype(np.int64)
            stop[nonempty] = np.add.reduceat(isin, starts[nonempty])
        return pa.StructArray.from_arrays(
            [
                pa.array(packed, type=pa.int64()),
                pa.array(stop.astype(np.int32), type=pa.int32()),
            ],
            names=["scores", "stop_hits"],
            mask=null_mask,
        )

    return lang_stop


def minhash_sig_matrix(
    vals: np.ndarray, starts: np.ndarray, num_perm: int
) -> np.ndarray:
    """Per-document minhash signatures over flattened shingle hashes.

    ``vals``: int64/uint64 array of ALL docs' shingle hashes
    concatenated; ``starts``: int64 array of each doc's first index in
    ``vals`` (every segment non-empty — _hashed_shingle_sets emits >= 1
    hash per doc). Returns (n_docs, num_perm) int64, where column i is
    the SIGNED min over ``xxhash64(shingle, lit(i))`` — exactly
    ``array_min(transform(__shs, s -> xxhash64(s, lit(i))))``.

    The hashLong(s, 42) inner term is shared by every permutation, so
    it is hoisted and each permutation is one vectorized hashInt pass
    plus a segmented min.
    """
    v = vals.astype(np.uint64, copy=False)
    base = xxh64_long(v, SEED)
    out = np.empty((len(starts), num_perm), dtype=np.int64)
    for i in range(num_perm):
        hi = xxh64_int(i, base).view(np.int64)
        out[:, i] = np.minimum.reduceat(hi, starts)
    return out


def simhash_from_hashes(
    vals: np.ndarray, starts: np.ndarray, counts: np.ndarray
) -> np.ndarray:
    """Per-document 64-bit simhash over flattened shingle hashes.

    Majority vote per bit position: bit i of the output is set iff
    more than half of the doc's (distinct) shingle hashes have bit i
    set — identical to the lane-packed aggregate() spelling in
    ``simhash_signatures`` (votes are exact integer counts, so the
    values match bit-for-bit). Returns int64 array of len(starts).
    """
    v = np.ascontiguousarray(vals.astype(np.int64, copy=False))
    # (m, 64) bit matrix, column i == bit i of the hash (little-endian
    # byte order on every platform numpy supports here)
    bits = np.unpackbits(
        v.view(np.uint8).reshape(len(v), 8), axis=1, bitorder="little"
    )
    csum = np.add.reduceat(bits.astype(np.int64), starts, axis=0)
    n = counts.reshape(-1, 1)
    sel = (csum * 2) > n  # (n_docs, 64) majority bits
    packed = np.packbits(
        sel.astype(np.uint8), axis=1, bitorder="little"
    )
    return packed.view(np.int64).reshape(-1)


def ngram_compose(
    vals: np.ndarray,
    starts: np.ndarray,
    counts: np.ndarray,
    n: int,
    min_one: bool = True,
):
    """Composed n-gram hashes over flattened per-doc word-hash arrays,
    bit-exact to the staged native spelling in ``_hashed_shingle_sets``
    (per position p: seed-chain ``hashLong`` over word hashes
    p..p+n-1, clipped at the doc end — Spark's ``xxhash64(a, b, c)``
    with NULL tail positions skipped). Returns
    ``(composed uint64 flat array, npos int64 per-doc counts)``.

    ``min_one=True`` (the minhash/simhash whole-text-shingle rule)
    floors ``npos`` at 1 so short docs still emit one clipped hash;
    ``min_one=False`` (the dedup_substrings rule) emits ZERO grams for
    docs shorter than ``n`` words.

    Gather form: work is O(n × valid positions), not O(n × words) —
    at n=50 over short documents most word positions start no gram,
    and the first shift-based spelling paid the full word count per
    chain step anyway (measured slower than the interpreted native
    transform on exactly that shape)."""
    v = vals.astype(np.uint64, copy=False)
    floor = 1 if min_one else 0
    npos = np.maximum(counts - (n - 1), floor)
    total = int(npos.sum())
    if total == 0:
        return np.empty(0, dtype=np.uint64), npos
    doc_of = np.repeat(np.arange(len(starts), dtype=np.int64), npos)
    pstarts = np.zeros(len(starts), dtype=np.int64)
    np.cumsum(npos[:-1], out=pstarts[1:])
    # position index within vals: starts[doc] + offset-in-doc
    pidx = (
        np.arange(total, dtype=np.int64)
        - pstarts[doc_of]
        + starts[doc_of]
    )
    ends_rep = (starts + counts)[doc_of]
    h = xxh64_long(v[pidx], SEED)
    for k in range(1, n):
        src = pidx + k
        valid = src < ends_rep
        if valid.all():
            h = xxh64_long(v[src], h)
        else:
            # clipped short-doc tails (min_one floor): hash only the
            # in-bounds words, exactly the NULL-skip of the native
            # chained xxhash64
            h = np.where(
                valid, xxh64_long(v[np.where(valid, src, pidx)], h), h
            )
    return h, npos


def ngram_hashes_udf(n: int):
    """Arrow-native scalar UDF: list<int64> per-doc word hashes ->
    list<int64> POSITION-PRESERVING composed n-gram hashes (empty for
    docs shorter than n words) — the dedup_substrings gram relation,
    value-identical to the native
    ``transform(sequence(1, n_grams), xxhash64(wh[i..i+n-1]))``
    spelling whose per-position chain of ``n`` interpreted hashes was
    the map-side hot term at n=50."""

    @F.arrow_udf(T.ArrayType(T.LongType()))
    def gram_hashes(wh: pa.Array) -> pa.Array:
        if isinstance(wh, pa.ChunkedArray):
            wh = wh.combine_chunks()
        nrows = len(wh)
        if nrows == 0:
            return pa.array([], type=pa.list_(pa.int64()))
        vals, starts, counts = list_array_segments(wh)
        if wh.null_count == 0:
            comp, npos = ngram_compose(
                vals, starts, counts, n, min_one=False
            )
            offsets = np.zeros(nrows + 1, dtype=np.int64)
            np.cumsum(npos, out=offsets[1:])
            return pa.LargeListArray.from_arrays(
                pa.array(offsets, type=pa.int64()),
                pa.array(comp.view(np.int64), type=pa.int64()),
            ).cast(pa.list_(pa.int64()))
        out: list[list[int] | None] = [None] * nrows
        null_mask = np.asarray(wh.is_null())
        one = np.zeros(1, dtype=np.int64)
        for j in range(nrows):
            if null_mask[j]:
                continue
            s, c = int(starts[j]), int(counts[j])
            comp, _ = ngram_compose(
                vals[s : s + c],
                one,
                np.array([c], dtype=np.int64),
                n,
                min_one=False,
            )
            out[j] = comp.view(np.int64).tolist()
        return pa.array(out, type=pa.list_(pa.int64()))

    return gram_hashes


def _segment_unique(vals: np.ndarray, seg_ids: np.ndarray):
    """(unique values, unique seg_ids) — per-segment distinct of a
    flattened array, vectorized via one lexsort (set semantics only;
    order within a segment is NOT preserved)."""
    order = np.lexsort((vals, seg_ids))
    sv = vals[order]
    sg = seg_ids[order]
    first = np.ones(len(sv), dtype=bool)
    first[1:] = (sv[1:] != sv[:-1]) | (sg[1:] != sg[:-1])
    return sv[first], sg[first]


def simhash_from_words_udf(n: int):
    """Arrow-native scalar UDF: list<int64> per-doc word hashes ->
    int64 simhash. Fuses n-gram composition, the per-doc DISTINCT
    (simhash votes count distinct shingles — unlike minhash, the
    distinct matters here) and the 64-bit majority vote into one
    vectorized pass; value-identical to
    ``simhash_signatures(kernel=False)`` (pinned in tests)."""

    @F.arrow_udf(T.LongType())
    def sh_sig_w(wh: pa.Array) -> pa.Array:
        if isinstance(wh, pa.ChunkedArray):
            wh = wh.combine_chunks()
        nrows = len(wh)
        if nrows == 0:
            return pa.array([], type=pa.int64())
        vals, starts, counts = list_array_segments(wh)
        ok = counts > 0
        if wh.null_count:
            ok &= ~np.asarray(wh.is_null())
        if ok.all():
            comp, npos = ngram_compose(vals, starts, counts, n)
            seg_ids = np.repeat(
                np.arange(nrows, dtype=np.int64), npos
            )
            uv, ug = _segment_unique(comp.view(np.int64), seg_ids)
            ustarts = np.zeros(nrows, dtype=np.int64)
            ucounts = np.bincount(ug, minlength=nrows).astype(np.int64)
            np.cumsum(ucounts[:-1], out=ustarts[1:])
            return pa.array(
                simhash_from_hashes(uv, ustarts, ucounts),
                type=pa.int64(),
            )
        res = np.zeros(nrows, dtype=np.int64)
        one = np.zeros(1, dtype=np.int64)
        for j in np.flatnonzero(ok):
            s, c = int(starts[j]), int(counts[j])
            comp, _ = ngram_compose(
                vals[s : s + c], one, np.array([c], dtype=np.int64), n
            )
            u = np.unique(comp.view(np.int64))
            res[j] = simhash_from_hashes(
                u, one, np.array([len(u)], dtype=np.int64)
            )[0]
        return pa.array(res, type=pa.int64(), mask=~ok)

    return sh_sig_w


def minhash_sig_from_words_udf(num_perm: int, n: int):
    """Arrow-native scalar UDF: list<int64> per-doc WORD hashes ->
    list<int64> minhash signatures. Fuses the n-gram composition
    (``ngram_compose``) with the permutation mins, skipping the
    ``array_distinct`` the native spelling needs — a min over the
    composed multiset equals the min over the distinct set, so the
    signatures are value-identical to
    ``array_min(transform(array_distinct(composed), xxhash64(s, i)))``
    (pinned against the native spelling in tests)."""

    @F.arrow_udf(T.ArrayType(T.LongType()))
    def mh_sigs_w(wh: pa.Array) -> pa.Array:
        if isinstance(wh, pa.ChunkedArray):
            wh = wh.combine_chunks()
        nrows = len(wh)
        if nrows == 0:
            return pa.array([], type=pa.list_(pa.int64()))
        vals, starts, counts = list_array_segments(wh)
        ok = counts > 0
        if wh.null_count:
            ok &= ~np.asarray(wh.is_null())
        if ok.all():
            comp, npos = ngram_compose(vals, starts, counts, n)
            starts2 = np.zeros(nrows, dtype=np.int64)
            np.cumsum(npos[:-1], out=starts2[1:])
            sig = minhash_sig_matrix(comp.view(np.int64), starts2, num_perm)
            offsets = pa.array(
                np.arange(nrows + 1, dtype=np.int64) * num_perm,
                type=pa.int64(),
            )
            return pa.LargeListArray.from_arrays(
                offsets, pa.array(sig.reshape(-1), type=pa.int64())
            ).cast(pa.list_(pa.int64()))
        # rare defensive path (NULL/empty word lists): per-row
        out: list[list[int] | None] = [None] * nrows
        one = np.zeros(1, dtype=np.int64)
        for j in np.flatnonzero(ok):
            s, c = int(starts[j]), int(counts[j])
            comp, _ = ngram_compose(
                vals[s : s + c], one, np.array([c], dtype=np.int64), n
            )
            sig = minhash_sig_matrix(comp.view(np.int64), one, num_perm)
            out[j] = sig[0].tolist()
        return pa.array(out, type=pa.list_(pa.int64()))

    return mh_sigs_w


def list_array_segments(arr):
    """(values int64 ndarray, starts int64 ndarray, counts int64
    ndarray) for a pyarrow list<int64> array (chunked or not), with
    slice offsets normalized. Assumes no NULL lists/elements (the
    producing projections never emit them); callers guard upstream."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    off = np.asarray(arr.offsets)
    vals = np.asarray(arr.values)[off[0] : off[-1]]
    starts = (off[:-1] - off[0]).astype(np.int64)
    counts = (off[1:] - off[:-1]).astype(np.int64)
    return vals, starts, counts

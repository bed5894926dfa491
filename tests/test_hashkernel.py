"""r17 optimization: the vectorized Arrow signature kernels
(functions/hashkernel.py) must be VALUE-IDENTICAL to the native
higher-order-function spellings they replace — the whole point of the
kernel is speed with bit-for-bit unchanged results (signatures, band
buckets, est_jaccard, survivor sets). These tests pin that equivalence
on a real corpus (multi-lingual, planted dups, NULL/empty text) and pin
the numpy XXH64 reimplementation directly against Spark's ``xxhash64``
expression."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from embedding_to_vectordatabase_spark.operators.dedup import (
    minhash_lsh_pairs,
    minhash_signatures,
    simhash_signatures,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat "
    "watches from the warm windowsill and dreams of fish dinners"
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, f"doc {i} " + BASE + f" tail {i % 7}") for i in range(40)]
    rows += [
        (100, BASE),
        (101, BASE),
        (102, BASE.replace("dreams", "thinks")),
        (103, "short"),
        (104, ""),
        (105, None),
        (106, "另一个 完全 不同 的 中文 文档 关于 向量 数据库"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_numpy_xxh64_matches_spark_expression(spark):
    """xxh64_long / xxh64_int reproduce Spark's seed-chained
    xxhash64(long, int-literal) bit-for-bit."""
    from embedding_to_vectordatabase_spark.functions.hashkernel import (
        SEED,
        xxh64_int,
        xxh64_long,
    )

    vals = [0, 1, -1, 2**63 - 1, -(2**63), 42, 123456789123456789]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    for i in (0, 1, 13, 63):
        got_spark = [
            r[0]
            for r in df.select(
                F.xxhash64(F.col("v"), F.lit(i))
            ).collect()
        ]
        arr = np.array(vals, dtype=np.int64).view(np.uint64)
        got_np = xxh64_int(i, xxh64_long(arr, SEED)).view(np.int64)
        assert got_spark == got_np.tolist()
    # single-arg form = hashLong(v, 42)
    got_spark1 = [r[0] for r in df.select(F.xxhash64("v")).collect()]
    got_np1 = xxh64_long(
        np.array(vals, dtype=np.int64).view(np.uint64), SEED
    ).view(np.int64)
    assert got_spark1 == got_np1.tolist()


def test_minhash_kernel_signatures_identical(corpus):
    native = {
        r["doc_id"]: r["sig"]
        for r in minhash_signatures(
            corpus, num_perm=16, kernel=False
        ).collect()
    }
    kern = {
        r["doc_id"]: r["sig"]
        for r in minhash_signatures(
            corpus, num_perm=16, kernel=True
        ).collect()
    }
    assert native == kern
    assert all(len(s) == 16 for s in kern.values())


def test_minhash_kernel_pairs_find_planted_dups(corpus):
    # the default (kernel) path through the full LSH pair chain still
    # lands the planted exact-dup pair at est 1.0 — banding and
    # scoring consume the kernel's signatures unchanged
    kern = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(
            corpus, num_perm=16, bands=4, threshold=0.4
        ).collect()
    }
    assert (100, 101) in kern and kern[(100, 101)] == 1.0


def test_simhash_kernel_identical(corpus):
    native = {
        r["doc_id"]: r["simhash"]
        for r in simhash_signatures(corpus, kernel=False).collect()
    }
    kern = {
        r["doc_id"]: r["simhash"]
        for r in simhash_signatures(corpus, kernel=True).collect()
    }
    assert native == kern


def test_ngram_hashes_udf_matches_native_expr(spark, corpus):
    """The dedup_substrings gram kernel must reproduce the native
    per-position chained-xxhash64 transform bit-for-bit, including the
    empty-gram rule for docs shorter than W words."""
    from embedding_to_vectordatabase_spark.functions.hashkernel import (
        ngram_hashes_udf,
    )

    W = 5
    toks = F.filter(
        F.split(
            F.trim(F.lower(F.coalesce(F.col("text"), F.lit("")))),
            r"\s+",
        ),
        lambda s: s != "",
    )
    staged = corpus.select(
        F.col("doc_id"),
        F.transform(toks, lambda w: F.xxhash64(w)).alias("__wh"),
        (F.size(toks) - F.lit(W - 1)).alias("n_grams"),
    )
    native = staged.select(
        "doc_id",
        F.posexplode(
            F.when(
                F.col("n_grams") >= 1,
                F.transform(
                    F.sequence(F.lit(1), F.col("n_grams")),
                    lambda i: F.xxhash64(
                        *[
                            F.element_at(F.col("__wh"), i + k)
                            for k in range(W)
                        ]
                    ),
                ),
            ).otherwise(F.array().cast("array<bigint>"))
        ).alias("pos", "h"),
    )
    kern = staged.select(
        "doc_id",
        F.posexplode(ngram_hashes_udf(W)(F.col("__wh"))).alias(
            "pos", "h"
        ),
    )
    a = sorted(map(tuple, native.collect()))
    b = sorted(map(tuple, kern.collect()))
    assert a == b and len(a) > 0


def test_simhash_kernel_respects_md5_and_narrow_bits(corpus):
    # md5 mode and bits<64 must keep the native spelling (the kernel
    # only covers xxhash64/bits=64); smoke-check they still run
    out = simhash_signatures(corpus, bits=32, hash_fn="xxhash64")
    assert out.count() == corpus.count()
    out_md5 = simhash_signatures(corpus, bits=32, hash_fn="md5")
    assert out_md5.count() == corpus.count()

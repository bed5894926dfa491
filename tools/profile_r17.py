"""r17 profiling harness — stage-by-stage decomposition of the heavy
bench sections (guide §1: measure first, noop sink, labeled jobs).

Usage: python tools/profile_r17.py [minhash|semdedup|simhash|all]

Reuses the bench scratch fixtures (.bench_scratch_sf0.1) so numbers are
comparable with bench.py sections. Prints one line per stage with the
noop-sink wall seconds (min of 2 warm passes after 1 warmup).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from embedding_to_vectordatabase_spark.session import get_spark  # noqa: E402

SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".bench_scratch_sf0.1",
)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, name, mk, runs=2, warmup=True):
    if warmup:
        noop(mk())
    best = None
    for _ in range(runs):
        spark.sparkContext.setJobDescription(f"profile: {name}")
        t0 = time.time()
        noop(mk())
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    spark.sparkContext.setJobDescription(None)
    print(f"{best:8.3f}  {name}", flush=True)
    return best


def profile_minhash(spark):
    from embedding_to_vectordatabase_spark.operators.dedup import (
        _hashed_shingle_sets,
        minhash_lsh_pairs,
        minhash_signatures,
    )
    from embedding_to_vectordatabase_spark.plans.clean import clean_corpus
    from embedding_to_vectordatabase_spark.plans.curate import curate_corpus

    docs = spark.read.parquet(
        os.path.join(SCRATCH, "curate_sf", "documents.parquet")
    )
    curate_src = docs.unionByName(
        docs.select(
            (F.col("doc_id") + 100_000_000).alias("doc_id"),
            F.substring(
                F.col("text"), 1, (F.length("text") * 0.8).cast("int")
            ).alias("text"),
        )
    )
    print(f"curate_src rows: {curate_src.count()}")
    timed(spark, "read_only", lambda: curate_src)
    timed(spark, "clean_corpus", lambda: clean_corpus(curate_src, None, 0.5))
    clean = clean_corpus(curate_src, None, 0.5)
    timed(
        spark,
        "hashed_shingle_sets(n=3)",
        lambda: _hashed_shingle_sets(clean, "text", "doc_id", 3),
    )
    timed(
        spark,
        "minhash_signatures kernel=False",
        lambda: minhash_signatures(clean, num_perm=64, kernel=False),
    )
    timed(
        spark,
        "minhash_signatures kernel=True",
        lambda: minhash_signatures(clean, num_perm=64, kernel=True),
    )
    timed(
        spark,
        "minhash_lsh_pairs (kernel default)",
        lambda: minhash_lsh_pairs(
            clean, num_perm=64, bands=16, threshold=0.5
        ),
    )
    timed(
        spark,
        "curate_corpus minhash full",
        lambda: curate_corpus(
            curate_src,
            min_quality=0.5,
            n=3,
            jaccard_threshold=0.5,
            method="minhash",
            num_perm=64,
            bands=16,
            hash_fn="xxhash64",
        ),
    )


def profile_simhash(spark):
    from embedding_to_vectordatabase_spark.operators.dedup import (
        simhash_pairs,
        simhash_signatures,
    )
    import __spark_entry__ as entry

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    dup = entry._dup_union(spark, sf_dir)
    print(f"dup rows: {dup.count()}")
    timed(
        spark,
        "simhash_signatures kernel=False",
        lambda: simhash_signatures(dup, kernel=False),
    )
    timed(
        spark,
        "simhash_signatures kernel=True",
        lambda: simhash_signatures(dup, kernel=True),
    )
    timed(
        spark,
        "simhash_pairs full (kernel default)",
        lambda: simhash_pairs(dup, max_hamming=3),
    )


def profile_semdedup(spark):
    import numpy as np

    from embedding_to_vectordatabase_spark.operators.dedup import semdedup
    from embedding_to_vectordatabase_spark.operators.search import (
        _cluster_sim_udf,
        _train_ivf_centroids,
    )

    # the ANN hard fixture the bench uses (vec_id, embedding)
    path = os.path.join(SCRATCH, "clustered100k_hard.parquet")
    cvecs = spark.read.parquet(path)
    print(f"vecs: {cvecs.count()}")
    t0 = time.time()
    cent = _train_ivf_centroids(cvecs, "embedding", 20, 42, None, None)
    print(f"{time.time()-t0:8.3f}  train_centroids(20)")
    assign = _cluster_sim_udf(cent.T, (cent**2).sum(axis=1))
    staged = cvecs.withColumn(
        "__a", assign(F.col("embedding"))
    ).select(
        "*",
        F.col("__a.cluster").alias("cluster"),
        F.col("__a.cent_sim").alias("cent_sim"),
    ).drop("__a")
    timed(spark, "assign_only", lambda: staged, runs=1)
    n_parts = max(8 * len(cent), 32)
    timed(
        spark,
        "assign+repartition (no grouped map)",
        lambda: staged.repartition(n_parts, F.col("cluster")),
        runs=1,
    )
    sizes = (
        staged.groupBy("cluster").count().orderBy(F.desc("count")).collect()
    )
    print("cluster sizes:", [r["count"] for r in sizes])
    timed(
        spark,
        "semdedup full",
        lambda: semdedup(cvecs, n_clusters=20, eps=0.01, seed=42),
        runs=1,
    )


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark("profile_r17")
    if which == "pairs":
        profile_pairs(spark)
    if which in ("minhash", "all"):
        profile_minhash(spark)
    if which in ("simhash", "all"):
        profile_simhash(spark)
    if which in ("semdedup", "all"):
        profile_semdedup(spark)




def profile_pairs(spark):
    from pyspark.sql import functions as F

    from embedding_to_vectordatabase_spark.operators.dedup import (
        _capped_bucket_pairs,
        minhash_signatures,
    )
    from embedding_to_vectordatabase_spark.plans.clean import clean_corpus

    docs = spark.read.parquet(
        os.path.join(SCRATCH, "curate_sf", "documents.parquet")
    )
    curate_src = docs.unionByName(
        docs.select(
            (F.col("doc_id") + 100_000_000).alias("doc_id"),
            F.substring(
                F.col("text"), 1, (F.length("text") * 0.8).cast("int")
            ).alias("text"),
        )
    )
    clean = clean_corpus(curate_src, None, 0.5)
    num_perm, bands = 64, 16
    r = num_perm // bands
    sig = minhash_signatures(clean, num_perm=num_perm)

    def _band_bucket(b):
        elems = [F.element_at("sig", b * r + j + 1) for j in range(r)]
        return F.xxhash64(*elems)

    banded = sig.select(
        "doc_id",
        "sig",
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
    ).select("doc_id", "sig", "bb.band", "bb.bucket")
    timed(spark, "banded (sig+expand)", lambda: banded)

    def mk_members():
        return (
            banded.groupBy("band", "bucket")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("doc_id", "sig"))
                ).alias("ms")
            )
            .filter(F.size("ms") >= 2)
        )

    timed(spark, "members groupBy", mk_members)
    n_pair_rows = _capped_bucket_pairs(
        mk_members(),
        lambda x, y: F.struct(
            x["doc_id"].alias("doc_a"), y["doc_id"].alias("doc_b")
        ),
        1024,
    ).count()
    print(f"candidate pair rows (pre-distinct): {n_pair_rows}")

    def mk_pairs_noscore():
        return _capped_bucket_pairs(
            mk_members(),
            lambda x, y: F.struct(
                x["doc_id"].alias("doc_a"), y["doc_id"].alias("doc_b")
            ),
            1024,
        )

    timed(spark, "pairs no-score", mk_pairs_noscore)

    def _mk_pair_scored(x, y):
        return F.struct(
            x["doc_id"].alias("doc_a"),
            y["doc_id"].alias("doc_b"),
            (
                F.aggregate(
                    F.zip_with(
                        x["sig"],
                        y["sig"],
                        lambda u, v: F.when(u == v, 1).otherwise(0),
                    ),
                    F.lit(0),
                    lambda acc, v: acc + v,
                )
                / F.lit(num_perm)
            ).alias("est"),
        )

    timed(
        spark,
        "pairs scored-in-HOF (current)",
        lambda: _capped_bucket_pairs(mk_members(), _mk_pair_scored, 1024),
    )

    # alternative: carry sigs out of the HOF, score in a codegen
    # projection with 64 element_at equality terms
    def mk_pairs_post():
        pr = _capped_bucket_pairs(
            mk_members(),
            lambda x, y: F.struct(
                x["doc_id"].alias("doc_a"),
                y["doc_id"].alias("doc_b"),
                x["sig"].alias("sa"),
                y["sig"].alias("sb"),
            ),
            1024,
        )
        terms = [
            (
                F.element_at("pr.sa", i + 1)
                == F.element_at("pr.sb", i + 1)
            ).cast("int")
            for i in range(num_perm)
        ]
        est = sum(terms[1:], terms[0]) / F.lit(num_perm)
        return pr.select(
            F.col("pr.doc_a").alias("doc_a"),
            F.col("pr.doc_b").alias("doc_b"),
            est.alias("est"),
        )

    timed(spark, "pairs post-explode codegen score", mk_pairs_post)
if __name__ == "__main__":
    main()

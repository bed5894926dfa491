"""r18: ABAB the minhash_lsh_pairs redesign (ids-only banding +
persisted signature relation + distinct-then-attach, guide S8) against
the current shape (signatures x bands through the bucket exchange)."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession, functions as F
from pyspark import StorageLevel

spark = (
    SparkSession.builder.master("local[32]")
    .appName("profile_r18_minhash")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from embedding_to_vectordatabase_spark.operators.dedup import (
    minhash_lsh_pairs, minhash_signatures, _capped_bucket_pairs,
    _minhash_est_expr,
)

docs = spark.read.parquet("/root/repo/.bench_scratch_sf0.1/docs250k.parquet")
docs.count()

NUM_PERM, BANDS, THRESH, CAP = 64, 16, 0.8, 1024
R = NUM_PERM // BANDS

def redesign(df):
    sig = minhash_signatures(df, "text", "doc_id", 3, NUM_PERM, "xxhash64")
    sigp = sig.persist(StorageLevel.MEMORY_AND_DISK)

    def _band_bucket(b):
        elems = [F.element_at("sig", b * R + j + 1) for j in range(R)]
        return F.xxhash64(*elems)

    banded = sigp.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"), _band_bucket(b).alias("bucket"))
            for b in range(BANDS)
        ])).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    members = (
        banded.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ms"))
        .filter(F.size("ms") >= 2)
    )
    def _mk_pair(x, y):
        return F.struct(x.alias("doc_a"), y.alias("doc_b"))
    cand = (
        _capped_bucket_pairs(members, _mk_pair, CAP)
        .select(F.col("pr.doc_a").alias("doc_a"), F.col("pr.doc_b").alias("doc_b"))
        .filter(F.col("doc_a") != F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sa = sigp.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sa"))
    sb = sigp.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sb"))
    out = (
        cand.join(sa, "doc_a").join(sb, "doc_b")
        .select(
            "doc_a", "doc_b",
            F.round(_minhash_est_expr(F.col("sa"), F.col("sb"), NUM_PERM), 6)
            .alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= THRESH)
    )
    return out, sigp

def noop(df):
    df.write.format("noop").mode("overwrite").save()

# equivalence first on a 20k subset
sub = docs.limit(20000)
cur_rows = {(r["doc_a"], r["doc_b"], r["est_jaccard"])
            for r in minhash_lsh_pairs(sub, num_perm=NUM_PERM, bands=BANDS,
                                       threshold=THRESH).collect()}
new_df, sigp = redesign(sub)
new_rows = {(r["doc_a"], r["doc_b"], r["est_jaccard"]) for r in new_df.collect()}
sigp.unpersist()
print(f"EQUIV: {cur_rows == new_rows} n={len(cur_rows)} vs {len(new_rows)}", flush=True)

# interleaved ABAB x3
for rnd in range(3):
    spark.sparkContext.setJobDescription(f"A current rnd{rnd}")
    t0 = time.time()
    noop(minhash_lsh_pairs(docs, num_perm=NUM_PERM, bands=BANDS, threshold=THRESH))
    ta = time.time() - t0
    spark.sparkContext.setJobDescription(f"B redesign rnd{rnd}")
    t0 = time.time()
    d, sp = redesign(docs)
    noop(d)
    tb = time.time() - t0
    sp.unpersist()
    print(f"rnd{rnd}: current={ta:.2f}s redesign={tb:.2f}s", flush=True)
spark.stop()

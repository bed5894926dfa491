"""r18 profiling: decompose the pq_family build walls (m sweep).

Usage: python tools/profile_r18_pq.py [m ...]
Times, per m: _spread_sample, driver Lloyd loop (pq_train minus sample),
pq_encode+noop, and the full build write (to a throwaway path).
"""
import os, sys, time, shutil

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("profile_r18_pq")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")

HARD = "/root/repo/.bench_scratch_sf0.1/clustered100k_hard.parquet"
cvecs = spark.read.parquet(HARD)
pq_corpus = cvecs.filter(F.col("vec_id") % 2 == 0)
print("corpus rows:", pq_corpus.count(), "partitions:", pq_corpus.rdd.getNumPartitions())

from embedding_to_vectordatabase_spark.operators.search import (
    _spread_sample, _lloyd, pq_train, pq_encode, build_pq_index,
)
import numpy as np

def noop(df):
    df.write.format("noop").mode("overwrite").save()

ms = [int(a) for a in sys.argv[1:]] or [16, 32, 64]
for m in ms:
    cap = 6400 if m == 16 else 4000
    spark.sparkContext.setJobDescription(f"pq m={m} spread_sample")
    t0 = time.time()
    X = _spread_sample(pq_corpus, "embedding", cap, 7, None, None)
    t_sample = time.time() - t0
    dim = X.shape[1]; dsub = dim // m; ksub = 256
    t0 = time.time()
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        cb = _lloyd(X[:, j*dsub:(j+1)*dsub], ksub, 7 + j)
        if len(cb) < ksub:
            cb = np.vstack([cb, np.repeat(cb[-1:], ksub - len(cb), 0)])
        books[j] = cb
    t_lloyd = time.time() - t0
    spark.sparkContext.setJobDescription(f"pq m={m} encode noop")
    t0 = time.time()
    noop(pq_encode(pq_corpus, books, "embedding", "vec_id"))
    t_encode = time.time() - t0
    out = f"/tmp/r18_pq_m{m}"
    shutil.rmtree(out, ignore_errors=True)
    spark.sparkContext.setJobDescription(f"pq m={m} full build")
    t0 = time.time()
    build_pq_index(pq_corpus, out, m=m, seed=7, train_cap=cap)
    t_full = time.time() - t0
    print(f"m={m:3d} cap={cap}: sample={t_sample:6.2f}s lloyd={t_lloyd:6.2f}s "
          f"encode_noop={t_encode:6.2f}s full_build={t_full:6.2f}s")
spark.stop()

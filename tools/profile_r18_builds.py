"""r18: time every pq_family build at the bench's exact knobs (cold,
throwaway paths) to quantify the cold-scratch debt after the trainer/
codebook-store optimizations. Compare to the committed BENCH_DETAIL
walls (measured pre-change on the r17 box)."""
import os, sys, time, shutil

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("profile_r18_builds")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
HARD = "/root/repo/.bench_scratch_sf0.1/clustered100k_hard.parquet"
pq_corpus = spark.read.parquet(HARD).filter(F.col("vec_id") % 2 == 0)
pq_corpus.count()

from embedding_to_vectordatabase_spark.operators.search import (
    build_pq_index, build_ivfadc_index, build_opq_index,
    build_sq8_index, build_ivfsq8_index,
)

def t(name, fn):
    out = f"/tmp/r18_build_{name}"
    shutil.rmtree(out, ignore_errors=True)
    spark.sparkContext.setJobDescription(f"build {name}")
    t0 = time.time()
    fn(out)
    print(f"{name:24s} {time.time()-t0:7.2f}s", flush=True)

t("flat_m16_cap6400", lambda o: build_pq_index(pq_corpus, o, m=16, seed=7, train_cap=6400))
t("ivfadc_nlist64_cap6400", lambda o: build_ivfadc_index(pq_corpus, o, nlist=64, m=16, seed=7, train_cap=6400))
t("opq_m16_it2_cap6400", lambda o: build_opq_index(pq_corpus, o, m=16, seed=7, n_iter=2, train_cap=6400))
t("sq8_cap6400", lambda o: build_sq8_index(pq_corpus, o, seed=7, train_cap=6400))
t("ivfsq8_nlist64_cap6400", lambda o: build_ivfsq8_index(pq_corpus, o, nlist=64, seed=7, train_cap=6400))
t("flat_m32_cap4000", lambda o: build_pq_index(pq_corpus, o, m=32, seed=7, train_cap=4000))
t("flat_m64_cap4000", lambda o: build_pq_index(pq_corpus, o, m=64, seed=7, train_cap=4000))
spark.stop()

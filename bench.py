"""Benchmark harness — the driver runs this per-round and records the
JSON line against BASELINE.md.

Runs the headline queries from ``__spark_entry__.queries()`` at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], forcing full materialization through the
noop sink (no driver-side collect in the timed path), plus the
end-to-end ingest pipeline throughput (A3 parity: rows/s + per-stage
seconds, mirroring baai_m3_simple_server/thread_test.py:59-71).

Prints ONE JSON line:
  {"metric": "total_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1,
   "ingest_chunks": N, "ingest_chunks_per_s": N}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    # relational core over lineitem/orders/customer (the shuffle-heavy set)
    "tpch_q1_pricing",
    "tpch_q3_shipping",
    "tpch_q5_local_supplier",
    # event analytics (window functions, sessionization)
    "st_windowed_event_counts",
    "st_sessionize",
    # vector search (flagship O4/J4 path + inverted sparse)
    "o4_dense_topk",
    "sparse_topk_inverted",
    # dedup families over documents
    "dedup_exact",
    # text analytics map-only pass
    "profile_documents",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    import __spark_entry__ as entry
    from embedding_to_vectordatabase_spark.operators.dedup import (
        minhash_lsh_pairs,
        simhash_pairs,
    )
    from embedding_to_vectordatabase_spark.session import get_spark

    spark = get_spark()
    qs = entry.queries()

    def materialize(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    # untimed warmup pass per query: the first execution of a plan
    # shape pays one-off Janino/JIT compilation of the generated code
    # (tens of seconds for wide aggregates on a cold JVM) — a per-JVM
    # cost that amortizes to nothing over a real cluster's lifetime,
    # so the timed pass measures steady-state execution
    for name in BENCH_QUERIES:
        materialize(qs[name](spark, sf_dir))

    timings: dict[str, float] = {}
    total = 0.0
    for name in BENCH_QUERIES:
        t0 = time.time()
        materialize(qs[name](spark, sf_dir))
        dt = round(time.time() - t0, 3)
        timings[name] = dt
        total += dt

    # dedup at PRODUCTION defaults (xxhash64; the harness queries use
    # the slower md5 variants only for duckdb-oracle checkability)
    dup = entry._dup_union(spark, sf_dir)
    for name, mk in [
        ("minhash_lsh_pairs", lambda: minhash_lsh_pairs(dup, threshold=0.5)),
        ("simhash_pairs", lambda: simhash_pairs(dup, max_hamming=3)),
    ]:
        materialize(mk())  # warmup (see above)
        t0 = time.time()
        materialize(mk())
        dt = round(time.time() - t0, 3)
        timings[name] = dt
        total += dt

    # scale-amplified runs: the sf0.1 corpus replicated with shifted ids
    # (identical per-row work, ~10× the rows) — shows throughput headroom
    # beyond the small files the driver ships
    from pyspark.sql import functions as F

    def amplify(df, times, id_col):
        out = df
        for i in range(1, times):
            out = out.unionByName(
                df.withColumn(
                    id_col, F.col(id_col) + F.lit(i * 10_000_000)
                )
            )
        return out

    docs80k = amplify(
        entry._t(spark, sf_dir, "documents").select("doc_id", "text"),
        8,
        "doc_id",
    )
    emb100k = amplify(
        entry._t(spark, sf_dir, "embeddings"), 20, "vec_id"
    )
    q3 = entry._t(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 3
    ).select(F.col("vec_id").alias("query_id"), "embedding")
    from embedding_to_vectordatabase_spark.operators.dedup import (
        minhash_lsh_pairs as _mh,
    )
    from embedding_to_vectordatabase_spark.operators.search import dense_topk

    for name, mk in [
        ("minhash_lsh_80k_docs", lambda: _mh(docs80k, threshold=0.5)),
        ("dense_topk_100k_vecs", lambda: dense_topk(emb100k, q3, k=5)),
    ]:
        materialize(mk())  # warmup
        t0 = time.time()
        materialize(mk())
        dt = round(time.time() - t0, 3)
        timings[name] = dt
        total += dt

    # end-to-end ingest throughput (chunks/s through chunk+embed+format)
    entry._q_ingest_chunks(spark, sf_dir).count()  # warmup (see above)
    t0 = time.time()
    chunks = entry._q_ingest_chunks(spark, sf_dir)
    n_chunks = chunks.count()
    ingest_sec = round(time.time() - t0, 3)
    timings["ingest_e2e"] = ingest_sec
    total += ingest_sec

    print(
        json.dumps(
            {
                "metric": "total_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "ingest_chunks": n_chunks,
                "ingest_chunks_per_s": round(n_chunks / max(ingest_sec, 1e-9), 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

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
   "ingest_chunks": N, "ingest_chunks_per_s": N,
   "duckdb_baseline": {name: sec, ...}, "vs_duckdb": {name: ratio},
   "bench_vs_baseline": spark_total/duckdb_total over the oracle set}

The reference publishes no benchmark numbers (BASELINE.md), so the
measurable single-node baseline is DuckDB running the exact
``oracle_sql()`` statement for each benched query over the same
parquet — a state-of-the-art single-node columnar engine standing in
for "the same computation without Spark".
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

    t_start = time.time()

    def progress(msg: str) -> None:
        # stderr only — stdout stays the single JSON line
        print(f"[bench +{time.time() - t_start:7.1f}s] {msg}", file=sys.stderr)

    def materialize(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    # untimed warmup pass per query: the first execution of a plan
    # shape pays one-off Janino/JIT compilation of the generated code
    # (tens of seconds for wide aggregates on a cold JVM) — a per-JVM
    # cost that amortizes to nothing over a real cluster's lifetime,
    # so the timed pass measures steady-state execution
    for name in BENCH_QUERIES:
        progress(f"warmup {name}")
        materialize(qs[name](spark, sf_dir))

    timings: dict[str, float] = {}
    total = 0.0
    for name in BENCH_QUERIES:
        progress(f"timed {name}")
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
        progress(f"dedup-prod {name}")
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

    def amplify(df, times, id_col, vary_text=False):
        # constant-size plan at any replication factor (a union of
        # `times` branches melts Catalyst analysis once the fixed
        # 500k/1M row targets meet a small SF)
        if times <= 1:
            return df
        reps = F.explode(
            F.sequence(F.lit(0), F.lit(int(times) - 1))
        ).alias("__rep")
        # repartition the (small) base BEFORE the fan-out so the
        # amplified rows land on all cores, not the 1-2 scan partitions
        out = (
            df.repartition(spark.sparkContext.defaultParallelism)
            .select("*", reps)
            .withColumn(
                id_col,
                F.col(id_col) + F.col("__rep").cast("long") * 10_000_000,
            )
        )
        if vary_text:
            # dedup inputs must NOT replicate text verbatim: N identical
            # copies make every bucket a clique (N·(N-1)/2 true-dup
            # candidate pairs — quadratic in the amplification factor,
            # which is the text's pathology, not the operator's plan).
            # Suffixing every token with the replica id gives replicas
            # zero shared shingles while keeping the corpus's own
            # duplicate structure and identical per-row work.
            out = out.withColumn(
                "text",
                F.concat_ws(
                    " ",
                    F.transform(
                        F.split(F.col("text"), r"\s+"),
                        lambda x: F.concat(
                            x, F.lit("_"), F.col("__rep").cast("string")
                        ),
                    ),
                ),
            )
        return out.drop("__rep")

    docs = entry._t(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    docs80k = amplify(docs, 8, "doc_id", vary_text=True)
    docs500k = amplify(
        docs, max(1, round(500_000 / max(n_docs, 1))), "doc_id", vary_text=True
    )
    emb = entry._t(spark, sf_dir, "embeddings")
    n_emb = emb.count()
    emb100k = amplify(emb, 20, "vec_id")
    emb1m = amplify(emb, max(1, round(1_000_000 / max(n_emb, 1))), "vec_id")
    q3 = emb.filter(
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
        progress(f"amplified {name}")
        materialize(mk())  # warmup
        t0 = time.time()
        materialize(mk())
        dt = round(time.time() - t0, 3)
        timings[name] = dt
        total += dt

    # larger amplifications, timed single-shot: the 80k/100k entries
    # above already JIT-warmed the identical plan shapes, so these
    # measure the linear regime directly
    throughput: dict[str, float] = {}
    for name, mk, rate_name, rate_rows in [
        (
            "minhash_lsh_500k_docs",
            lambda: _mh(docs500k, threshold=0.5),
            "minhash_500k_docs_per_s",
            docs500k.count(),
        ),
        (
            "dense_topk_1m_vecs",
            lambda: dense_topk(emb1m, q3, k=5),
            "dense_topk_1m_vecs_per_s",
            emb1m.count(),
        ),
    ]:
        try:
            progress(f"single-shot {name}")
            t0 = time.time()
            materialize(mk())
            dt = round(time.time() - t0, 3)
        except Exception:  # noqa: BLE001 — never lose the JSON line
            continue
        timings[name] = dt
        total += dt
        throughput[rate_name] = round(rate_rows / max(dt, 1e-9), 1)

    # skew demo: 90%-hot fact key joining a 1000-row dim with broadcast
    # disabled (forcing the shuffle join a too-big dim would need).
    # plain+no-AQE-skew puts the hot key on ONE reducer; AQE splits it
    # at runtime; salted_join splits it in the plan.
    from embedding_to_vectordatabase_spark.util import salted_join

    li = entry._t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    fact = amplify(li, 4, "l_orderkey").select(
        F.when(
            F.pmod(F.xxhash64("l_orderkey", "l_extendedprice"), 10) < 9,
            F.lit(0),
        )
        .otherwise(F.pmod(F.xxhash64("l_orderkey"), 1000))
        .cast("long")
        .alias("k"),
        "l_extendedprice",
    )
    dim = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )

    def _skew_agg(joined):
        return joined.groupBy("k").agg(
            F.sum(F.col("l_extendedprice") * F.col("w")).alias("s")
        )

    conf = spark.conf
    saved = {
        "spark.sql.autoBroadcastJoinThreshold": conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.adaptive.skewJoin.enabled": conf.get(
            "spark.sql.adaptive.skewJoin.enabled"
        ),
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        for name, skew_aqe, mk in [
            ("skew_join_plain", "false", lambda: _skew_agg(fact.join(dim, "k"))),
            ("skew_join_aqe", "true", lambda: _skew_agg(fact.join(dim, "k"))),
            (
                "skew_join_salted",
                "false",
                lambda: _skew_agg(salted_join(fact, dim, "k", num_salts=32)),
            ),
        ]:
            conf.set("spark.sql.adaptive.skewJoin.enabled", skew_aqe)
            progress(f"skew {name}")
            materialize(mk())  # warmup
            t0 = time.time()
            materialize(mk())
            dt = round(time.time() - t0, 3)
            timings[name] = dt
            total += dt
    finally:
        for k, v in saved.items():
            conf.set(k, v)

    # end-to-end ingest throughput (chunks/s through chunk+embed+format)
    progress("ingest_e2e")
    entry._q_ingest_chunks(spark, sf_dir).count()  # warmup (see above)
    t0 = time.time()
    chunks = entry._q_ingest_chunks(spark, sf_dir)
    n_chunks = chunks.count()
    ingest_sec = round(time.time() - t0, 3)
    timings["ingest_e2e"] = ingest_sec
    total += ingest_sec

    # DuckDB baseline: the exact oracle_sql() text for each benched
    # query, over the same parquet files, warmed then timed (DuckDB
    # uses all cores by default — same box, same data, same answer)
    duckdb_baseline: dict[str, float] = {}
    vs_duckdb: dict[str, float] = {}
    try:
        import duckdb

        oracles = entry.oracle_sql()
        con = duckdb.connect()
        for t in [
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        ]:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        for name in BENCH_QUERIES:
            if name not in oracles:
                continue
            progress(f"duckdb {name}")
            con.execute(oracles[name]).fetchall()  # warmup
            t0 = time.time()
            con.execute(oracles[name]).fetchall()
            duckdb_baseline[name] = round(time.time() - t0, 3)
            vs_duckdb[name] = round(
                timings[name] / max(duckdb_baseline[name], 1e-9), 2
            )
        con.close()
    except Exception:  # noqa: BLE001 — baseline is advisory, never fatal
        pass

    spark_common = sum(timings[n] for n in duckdb_baseline)
    duck_common = sum(duckdb_baseline.values())

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
                **throughput,
                "duckdb_baseline": duckdb_baseline,
                "vs_duckdb": vs_duckdb,
                "bench_vs_baseline": round(
                    spark_common / max(duck_common, 1e-9), 2
                )
                if duckdb_baseline
                else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

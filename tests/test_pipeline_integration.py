"""The full user story in one test: generate corpus → ingest (chunk +
mock-embed) → rotating parquet chunk store → per-file stats → handoff
→ fake vector-DB bulk load → top-k search over the stored chunks →
delete → drop. What a reference user switching to this engine runs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from embedding_to_vectordatabase_spark.operators.search import dense_topk
from embedding_to_vectordatabase_spark.plans.ingest import (
    IngestConfig,
    ingest,
)
from embedding_to_vectordatabase_spark.sinks.parquet_sink import (
    FileHandoff,
    VectorDBBulkLoader,
    delete_where,
    drop_collection,
    file_stats,
    manager_stats,
    write_rotating_parquet,
)
from embedding_to_vectordatabase_spark.sources.corpus import (
    generate_corpus,
    with_file_name,
    with_row_numbers_scalable,
)


def test_full_pipeline(spark, tmp_path):
    store = str(tmp_path / "chunk_store")

    # 1. ingest 60 docs through the flagship plan
    docs = with_row_numbers_scalable(
        generate_corpus(spark, 60), ["title", "content"], num_buckets=8
    )
    registry = with_file_name(docs).select(
        F.col("row_no").alias("id"), F.col("file_name").alias("name")
    )
    chunks, unmatched = ingest(
        docs, registry,
        config=IngestConfig(chunk_size=60, overlap=10, dense_dim=16),
    )
    assert unmatched.count() == 0

    # 2. rotating sink + stats readback
    write_rotating_parquet(chunks, store, max_records_per_file=40)
    stats = file_stats(spark, store)
    totals = manager_stats(stats).first()
    n_chunks = totals["total_records"]
    assert n_chunks >= 60
    assert all(r["record_count"] <= 40 for r in stats.collect())

    # 3. handoff every full file to the (fake) vector DB bulk loader
    uploaded: list[str] = []
    loader = VectorDBBulkLoader(
        do_import=lambda fs: uploaded.extend(fs) or "task",
        get_state=lambda t: "Completed",
        poll_interval_s=0.01,
    )
    ho = FileHandoff(spark, store, str(tmp_path / "log"), max_return_files=3)
    handed = ho.drain(loader.load)
    assert handed == len(uploaded) > 0

    # 4. search the stored collection (read back, exact top-k)
    stored = spark.read.parquet(store).withColumn(
        "chunk_id",
        F.col("file_id") * 1000 + F.col("block_id"),
    )
    q = stored.limit(3).select(
        F.col("chunk_id").alias("query_id"),
        F.col("dense_embedding").alias("embedding"),
    )
    hits = dense_topk(
        stored, q,
        corpus_vec="dense_embedding", corpus_id="chunk_id",
        k=3, metric="COSINE",
    )
    by_q = {r["query_id"]: r for r in hits.filter(F.col("rank") == 1).collect()}
    # every query's own chunk is its top-1 hit
    assert all(qid == r["chunk_id"] for qid, r in by_q.items())

    # 5. delete a file's chunks, then drop the collection
    pruned = str(tmp_path / "pruned")
    victim = stored.first()["file_id"]
    delete_where(spark, store, f"file_id = {victim}", pruned)
    left = spark.read.parquet(pruned)
    assert left.filter(F.col("file_id") == victim).count() == 0
    assert left.count() < n_chunks
    assert drop_collection(spark, store) is True


def test_ensure_parallelism_policy(spark):
    from embedding_to_vectordatabase_spark.util import ensure_parallelism

    small = spark.range(100)
    out = ensure_parallelism(small)
    assert out.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism

    # a frame the optimizer estimates big is left untouched (no-op at scale)
    big = spark.range(0, 1_000_000_000)  # range stats: ~8 GB estimate
    assert ensure_parallelism(big) is big


def test_dense_topk_edges(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # k larger than the corpus: every row returned, ranks dense
    tiny = emb.filter(F.col("vec_id") < 4)
    out = dense_topk(tiny, q, k=100).collect()
    assert len(out) == 2 * 4
    for qid in (0, 1):
        ranks = sorted(r["rank"] for r in out if r["query_id"] == qid)
        assert ranks == [1, 2, 3, 4]
    # empty query set is a contract violation
    with pytest.raises(ValueError, match="empty"):
        dense_topk(emb, q.filter(F.col("query_id") < 0), k=5)

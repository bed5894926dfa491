"""End-to-end ingest plan: row/block/schema assertions, J1 warn side
output, J2 idempotent re-run, scalable row numbering (no
single-partition exchange in the plan), embedding determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from embedding_to_vectordatabase_spark.plans.ingest import (
    CANONICAL_ORDER,
    IngestConfig,
    ingest,
)
from embedding_to_vectordatabase_spark.sources.corpus import (
    generate_corpus,
    with_file_name,
    with_row_numbers_scalable,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return with_row_numbers_scalable(
        generate_corpus(spark, 40), ["title", "content"], num_buckets=8
    )


@pytest.fixture(scope="module")
def registry(corpus):
    return with_file_name(corpus).select(
        F.col("row_no").alias("id"), F.col("file_name").alias("name")
    )


def test_scalable_row_numbers_bijection(corpus):
    rows = [r["row_no"] for r in corpus.select("row_no").collect()]
    assert sorted(rows) == list(range(1, 41))


def test_scalable_row_numbers_no_global_sort(spark):
    """The fact-scale numbering must not funnel the corpus through a
    single-partition Window sort (VERDICT r1 perf item 1). The only
    width-1 exchange allowed is the tiny per-bucket offset table."""
    docs = generate_corpus(spark, 100)
    plan = with_row_numbers_scalable(
        docs, ["title", "content"]
    )._jdf.queryExecution().executedPlan().toString()
    # the data path partitions by bucket hash; a SinglePartition
    # exchange must only feed the offsets aggregate (count per bucket)
    for line in plan.splitlines():
        if "SinglePartition" in line:
            assert "hashpartitioning" not in line


def test_ingest_rows_blocks_schema(corpus, registry):
    chunks, unmatched = ingest(
        corpus, registry,
        config=IngestConfig(chunk_size=60, overlap=10, dense_dim=16),
    )
    assert unmatched.count() == 0
    assert chunks.columns == CANONICAL_ORDER
    got = chunks.collect()
    assert len(got) >= 40  # every doc yields >= 1 chunk
    # block ids dense from 0 per file
    by_file = {}
    for r in got:
        by_file.setdefault(r["file_id"], []).append(r["block_id"])
    for blocks in by_file.values():
        assert sorted(blocks) == list(range(len(blocks)))
    # P8 placeholders + vector shapes
    assert all(r["qa_id"] == 0 and r["flag"] == "0" for r in got)
    assert all(len(r["dense_embedding"]) == 16 for r in got)
    assert all(len(r["sparse_embedding"]) > 0 for r in got)


def test_ingest_unmatched_side_output(corpus, registry):
    partial = registry.filter(F.col("id") <= 20)
    chunks, unmatched = ingest(
        corpus, partial,
        config=IngestConfig(chunk_size=60, overlap=10, dense_dim=8),
    )
    assert unmatched.count() == 20
    assert chunks.select("file_id").distinct().count() == 20


def test_ingest_idempotent_rerun(corpus, registry):
    """J2: feeding the first run's ids back as the ingested snapshot
    makes the second run a no-op (ST3/ST4 semantics)."""
    cfg = IngestConfig(chunk_size=60, overlap=10, dense_dim=8)
    first, _ = ingest(corpus, registry, config=cfg)
    ingested = first.select("file_id").distinct()
    second, _ = ingest(corpus, registry, ingested=ingested, config=cfg)
    assert second.count() == 0


def test_ingest_quarantine_routes_varchar_violations(corpus, registry):
    """SURVEY §7: row-level quarantine replaces the reference's
    whole-batch poisoning — flag=101 chars breaks VARCHAR(100)."""
    from embedding_to_vectordatabase_spark.plans.ingest import (
        ingest_with_quarantine,
    )

    cfg = IngestConfig(chunk_size=60, overlap=10, dense_dim=8)
    cfg.placeholders["flag"] = "x" * 101  # violates VARCHAR(100)
    clean, _, quarantined = ingest_with_quarantine(
        corpus, registry, config=cfg
    )
    assert clean.count() == 0
    assert quarantined.count() > 0

    good_cfg = IngestConfig(chunk_size=60, overlap=10, dense_dim=8)
    clean2, _, quarantined2 = ingest_with_quarantine(
        corpus, registry, config=good_cfg
    )
    assert quarantined2.count() == 0
    assert clean2.count() > 0


def test_ingest_quarantine_null_column_routes_once(corpus, registry):
    """A NULL in a VARCHAR-limited column makes the raw violation
    predicate NULL; both sides' filters would silently drop the row
    without the coalesce. Every row must land in exactly one output."""
    from embedding_to_vectordatabase_spark.plans.ingest import (
        ingest_with_quarantine,
    )

    cfg = IngestConfig(chunk_size=60, overlap=10, dense_dim=8)
    cfg.placeholders["question"] = None  # NULL VARCHAR(2000) column
    clean, _, quarantined = ingest_with_quarantine(
        corpus, registry, config=cfg
    )
    all_chunks, _ = ingest(corpus, registry, config=cfg)
    assert clean.count() + quarantined.count() == all_chunks.count()
    assert quarantined.count() == 0  # NULL is "no violation"


def test_ingest_string_doc_id_falls_back_to_numbering(spark):
    """The W1 bypass must not cast a non-numeric string doc_id (ANSI
    mode throws); it gates on integral dtype and falls back to
    scalable numbering."""
    docs = generate_corpus(spark, 10).withColumn(
        "doc_id", F.concat(F.lit("doc-"), F.col("title"))
    )
    named = with_file_name(with_row_numbers_scalable(docs, ["title", "content"]))
    reg = named.select(
        F.col("row_no").alias("id"), F.col("file_name").alias("name")
    )
    chunks, unmatched = ingest(
        docs, reg, config=IngestConfig(chunk_size=60, overlap=10, dense_dim=8)
    )
    assert unmatched.count() == 0
    assert chunks.count() >= 10


def test_mock_embedder_deterministic(corpus, registry):
    cfg = IngestConfig(chunk_size=60, overlap=10, dense_dim=8)
    a, _ = ingest(corpus, registry, config=cfg)
    b, _ = ingest(corpus, registry, config=cfg)
    va = {(r["file_id"], r["block_id"]): r["dense_embedding"] for r in a.collect()}
    vb = {(r["file_id"], r["block_id"]): r["dense_embedding"] for r in b.collect()}
    assert va == vb


def test_ingest_incremental_only_processes_changed(spark):
    from pyspark.sql import functions as F

    from embedding_to_vectordatabase_spark.plans.ingest import (
        IngestConfig,
        ingest_incremental,
    )
    from embedding_to_vectordatabase_spark.sources.corpus import (
        generate_corpus,
        with_file_name,
        with_row_numbers_scalable,
    )

    base = with_row_numbers_scalable(
        generate_corpus(spark, 12), ["title", "content"]
    ).withColumn("doc_id", F.col("row_no"))
    # new snapshot: doc 3 changed, doc 5 removed, doc 100 added
    changed = base.withColumn(
        "content",
        F.when(
            F.col("doc_id") == 3, F.concat(F.col("content"), F.lit(" v2"))
        ).otherwise(F.col("content")),
    ).filter(F.col("doc_id") != 5)
    added = base.filter(F.col("doc_id") == 1).select(
        *[
            (F.col("doc_id") + 99).alias("doc_id")
            if c == "doc_id"
            else (F.col("row_no") + 99).alias("row_no")
            if c == "row_no"
            else c
            for c in base.columns
        ]
    )
    new = changed.unionByName(added)
    registry = with_file_name(new).select(
        F.col("row_no").alias("id"), F.col("file_name").alias("name")
    )
    chunks, unmatched, deletions = ingest_incremental(
        base,
        new,
        registry,
        config=IngestConfig(chunk_size=80, overlap=10, dense_dim=8),
    )
    dels = {(r["doc_id"], r["change"]) for r in deletions.collect()}
    assert dels == {(3, "changed"), (5, "removed")}
    ingested_ids = {r["file_id"] for r in chunks.select("file_id").distinct().collect()}
    assert ingested_ids == {3, 100}
    assert unmatched.count() == 0

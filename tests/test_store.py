"""Versioned-relation manifest layer (store.py) — atomicity and
grace-window semantics for multi-relation store mutations (r15
verdict #4: delete/rebalance/compact exposed per-relation FS-rename
windows where a concurrent reader saw a half-updated pair)."""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import functions as F

from embedding_to_vectordatabase_spark import store


def test_manifest_publish_merge_and_legacy_fallback(spark, tmp_path):
    root = str(tmp_path / "idx")
    # no manifest: legacy path, empty mapping
    assert store.rel_path(spark, root, "codes") == f"{root}/codes.parquet"
    assert store.load_manifest(spark, root) == {}

    d1 = store.staged_rel_dir("codes")
    spark.range(3).write.parquet(f"{root}/{d1}")
    store.publish(spark, root, {"codes": d1})
    assert store.load_manifest(spark, root) == {"codes": d1}
    # unmapped relations still resolve legacy
    assert (
        store.rel_path(spark, root, "centroids")
        == f"{root}/centroids.parquet"
    )
    # a second publish of a DIFFERENT relation merges, not replaces
    d2 = store.staged_rel_dir("centroids")
    spark.range(2).write.parquet(f"{root}/{d2}")
    store.publish(spark, root, {"centroids": d2})
    mf = store.load_manifest(spark, root)
    assert mf == {"codes": d1, "centroids": d2}


def test_manifest_gc_grace_window(spark, tmp_path):
    """A reader holding generation-N paths keeps reading after ONE
    subsequent publish (grace), and retired dirs disappear after two;
    the pre-manifest LEGACY dir is cleaned once its relation has been
    mapped for two generations (it is unreachable by then — without
    this a full pre-mutation copy leaks forever)."""
    root = str(tmp_path / "g")
    spark.range(10).write.parquet(f"{root}/codes.parquet")  # legacy

    d1 = store.staged_rel_dir("codes")
    spark.range(11).write.parquet(f"{root}/{d1}")
    store.publish(spark, root, {"codes": d1})
    # grace: legacy survives the FIRST publish (a pre-manifest reader
    # may still hold it)
    assert os.path.exists(f"{root}/codes.parquet")

    # a reader plans against generation 1
    old_plan = spark.read.parquet(store.rel_path(spark, root, "codes"))

    d2 = store.staged_rel_dir("codes")
    spark.range(12).write.parquet(f"{root}/{d2}")
    store.publish(spark, root, {"codes": d2})
    # generation 1 dir still exists (grace), legacy is now gone
    assert os.path.exists(f"{root}/{d1}")
    assert not os.path.exists(f"{root}/codes.parquet")
    assert old_plan.count() == 11  # the planned reader still works

    d3 = store.staged_rel_dir("codes")
    spark.range(13).write.parquet(f"{root}/{d3}")
    store.publish(spark, root, {"codes": d3})
    # generation 1 is out of the grace window and GC'd
    assert not os.path.exists(f"{root}/{d1}")
    assert os.path.exists(f"{root}/{d2}")
    assert spark.read.parquet(
        store.rel_path(spark, root, "codes")
    ).count() == 13


def _emb_df(spark, n=300, dim=8, seed=5):
    rng = np.random.default_rng(seed)
    rows = [
        (i, [float(x) for x in rng.normal(0, 1, dim)]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_rebalance_flips_codes_and_centroids_atomically(spark, tmp_path):
    """The r15 two-store window, closed: a search PLANNED before
    rebalance still materializes against the OLD (codes, centroids)
    pair (grace), the post-rebalance manifest maps BOTH relations in
    one generation, and results are unchanged at full probe."""
    from embedding_to_vectordatabase_spark.operators.search import (
        ann_topk_ivfsq8,
        build_ivfsq8_index,
    )

    path = str(tmp_path / "ivfsq8")
    emb = _emb_df(spark)
    build_ivfsq8_index(emb, path, nlist=4, seed=7)
    qdf = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def topk():
        return {
            (r["query_id"], r["rank"]): r["vec_id"]
            for r in ann_topk_ivfsq8(
                spark, path, qdf, k=5, nprobe=4
            ).collect()
        }

    before = topk()
    # plan (lazily) against the pre-rebalance generation
    old_codes = spark.read.parquet(store.rel_path(spark, path, "codes"))
    n_before = old_codes.count()

    from embedding_to_vectordatabase_spark.operators.search import (
        rebalance_ivfsq8_index,
    )

    rebalance_ivfsq8_index(spark, path, nlist=4, seed=11)

    mf = store.load_manifest(spark, path)
    # ONE generation maps both halves of the pair
    assert "codes" in mf and "centroids" in mf
    # the pre-rebalance plan still materializes (grace window)
    assert old_codes.count() == n_before
    # full-probe results are unchanged through the new layout
    assert topk() == before


def test_compact_single_publish_for_sparse_group(spark, tmp_path):
    """compact_index rewrites postings+df_stats+corpus_stats as ONE
    manifest generation: a search planned pre-compaction still runs,
    and the post-compaction mapping carries the whole group."""
    from embedding_to_vectordatabase_spark.operators.metrics import (
        compact_index,
    )
    from embedding_to_vectordatabase_spark.operators.search import (
        build_sparse_index,
        sparse_topk_index,
        upsert_sparse_index,
    )

    path = str(tmp_path / "sp")
    rows = []
    for d in range(40):
        rows.append((d, 7, 1.0))
        rows.append((d, 1000 + d, float(d + 1)))
    cp = spark.createDataFrame(
        rows, "doc_id long, token int, weight double"
    )
    build_sparse_index(
        cp.filter("doc_id < 20"), path, num_buckets=8,
        store_doc_stats=True,
    )
    upsert_sparse_index(path, cp.filter("doc_id >= 20"))

    q = spark.createDataFrame(
        [(0, 7, 10.0), (0, 1003, 1.0)],
        "query_id long, token int, weight double",
    )
    before = {
        (r["query_id"], r["doc_id"]) for r in
        sparse_topk_index(spark, path, q, k=5).collect()
    }
    old_postings = spark.read.parquet(
        store.rel_path(spark, path, "postings")
    )
    n_old = old_postings.count()

    compact_index(spark, path)

    mf = store.load_manifest(spark, path)
    assert {"postings", "df_stats", "corpus_stats"} <= set(mf)
    assert old_postings.count() == n_old  # grace
    after = {
        (r["query_id"], r["doc_id"]) for r in
        sparse_topk_index(spark, path, q, k=5).collect()
    }
    assert after == before

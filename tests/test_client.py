"""Lifecycle test for the VectorCollectionClient facade — the
reference's MyMilvusClient surface (milvus_connector.py:11-206)
call-for-call over the Spark-native stores."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F  # noqa: F401

from embedding_to_vectordatabase_spark.client import (
    VectorCollectionClient,
)
from embedding_to_vectordatabase_spark.schemas import CHUNK_SCHEMA


def _rows(spark, ids, dim=8, seed=0):
    rng = np.random.default_rng(seed)
    data = []
    for i in ids:
        vec = [float(x) for x in rng.normal(0, 0.3, dim)]
        data.append(
            (
                None, i, f"q{i}", f"a{i}", i, 0, f"file_{i}.pdf",
                f"content {i}", vec, {0: 1.0}, "src", "ok",
            )
        )
    return spark.createDataFrame(data, CHUNK_SCHEMA)


def test_client_lifecycle(spark, tmp_path):
    root = str(tmp_path / "coll")
    c = VectorCollectionClient(spark, root, dim=8)
    # DDL-time: empty collection + train-free index exist
    assert c._collection().count() == 0
    assert c.check_exists(1) is None

    c.insert(_rows(spark, range(0, 10)))
    c.insert(_rows(spark, range(10, 20), seed=1))
    assert c._collection().count() == 20
    assert c.check_exists(3) == "file_3.pdf"
    assert c.check_exists(99) is None

    # search: query = row 5's own vector -> top hit is qa_id 5, with
    # output fields joined from the collection
    v5 = (
        c._collection().filter("qa_id = 5").first()["dense_embedding"]
    )
    hits = c.search([list(v5)], top_k=3).collect()
    assert len(hits) == 3
    top = min(hits, key=lambda r: r["rank"])
    assert top["qa_id"] == 5 and top["file_name"] == "file_5.pdf"

    # scalar pre-filter: exclude 5, next-best id wins and 5 is absent
    allowed = c._collection().filter("qa_id != 5").select("qa_id")
    f_hits = c.search([list(v5)], top_k=3, allowed_ids=allowed).collect()
    assert all(r["qa_id"] != 5 for r in f_hits) and len(f_hits) == 3

    # delete: rows leave BOTH stores
    assert c.delete("file_id < 5") == 5
    assert c._collection().count() == 15
    assert c.check_exists(3) is None
    post = c.search([list(v5)], top_k=15).collect()
    assert {r["qa_id"] for r in post}.isdisjoint(set(range(5)))
    stats = {r["relation"]: r for r in c.stats().collect()}
    assert stats["codes"]["n_rows"] == 15

    # compact: segments merge, content intact
    c.compact()
    assert c._collection().count() == 15
    assert c.check_exists(7) == "file_7.pdf"

    # re-open: a second client binds the same stores without rebuild
    c2 = VectorCollectionClient(spark, root, dim=8)
    assert c2._collection().count() == 15

    assert c.drop_collection() is True
    # re-create from scratch works (both stores rebuilt empty)
    c3 = VectorCollectionClient(spark, root, dim=8)
    assert c3._collection().count() == 0
    assert c3.check_exists(7) is None


def test_client_delete_null_predicate_keeps_rows(spark, tmp_path):
    """delete(expr) where expr evaluates to NULL on some rows (the
    always-NULL 'id' column) must keep those rows: a NOT(expr)
    rewrite drops them silently (NULL fails both branches of
    three-valued logic), while the left_anti-on-ids rewrite removes
    exactly the matched ids — identical to the index removal
    (r15 ADVICE, medium)."""
    c = VectorCollectionClient(spark, str(tmp_path / "nd"), dim=8)
    c.insert(_rows(spark, range(0, 10)))
    # 'id' is NULL on every row: the OR is NULL for file_id >= 3
    assert c.delete("id = 999 OR file_id < 3") == 3
    assert c._collection().count() == 7
    assert c.check_exists(5) == "file_5.pdf"
    stats = {r["relation"]: r for r in c.stats().collect()}
    assert stats["codes"]["n_rows"] == 7
    # an all-NULL predicate matches nothing and deletes nothing
    assert c.delete("id = 1") == 0
    assert c._collection().count() == 7


def test_client_bulk_insert_poll(spark, tmp_path):
    from embedding_to_vectordatabase_spark.sinks.parquet_sink import (
        VectorDBBulkLoader,
    )

    c = VectorCollectionClient(spark, str(tmp_path / "bl"), dim=8)
    states = iter(["pending", "Completed"])
    loader = VectorDBBulkLoader(
        do_import=lambda files: "t1",
        get_state=lambda tid: next(states),
        poll_interval_s=0.01,
    )
    assert c.bulk_insert(loader, ["f1.parquet"]) is True


def test_client_expr_filtered_search_matches_brute_force(spark, tmp_path):
    """search(expr=...) — the reference's Milvus-style filtered
    search — must equal exact brute force over the expr-filtered
    corpus: the expr derives allowed_ids BEFORE the ANN scan
    (filtered semantics), never post-filtering the top-k (r15
    verdict #8)."""
    import numpy as np

    c = VectorCollectionClient(spark, str(tmp_path / "ef"), dim=8)
    c.insert(_rows(spark, range(0, 40)))
    v7 = c._collection().filter("qa_id = 7").first()["dense_embedding"]

    hits = c.search(
        [list(v7)], top_k=5, expr="file_id % 2 = 1"
    ).collect()
    assert len(hits) == 5
    assert all(h["file_id"] % 2 == 1 for h in hits)

    # brute force over the expr-filtered corpus (exact L2)
    rows = c._collection().filter("file_id % 2 = 1").collect()
    q = np.array(v7)
    exact = sorted(
        rows,
        key=lambda r: float(
            ((np.array(r["dense_embedding"]) - q) ** 2).sum()
        ),
    )[:5]
    assert {h["qa_id"] for h in hits} == {r["qa_id"] for r in exact}

    # expr AND allowed_ids intersect
    allowed = c._collection().filter("file_id < 20").select("qa_id")
    both = c.search(
        [list(v7)], top_k=5, expr="file_id % 2 = 1", allowed_ids=allowed
    ).collect()
    assert both and all(
        h["file_id"] % 2 == 1 and h["file_id"] < 20 for h in both
    )

    # a NULL-evaluating expr simply matches nothing extra ('id' is
    # always NULL): empty allowed set -> no hits, no error
    assert c.search([list(v7)], top_k=5, expr="id = 1").count() == 0

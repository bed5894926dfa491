"""User-facing collection client — the reference's ``MyMilvusClient``
surface (vector_database/milvus_connector.py:11-206) re-expressed over
the Spark-native stores, so a reference user can switch call-for-call:

=====================  ==============================================
reference method       here
=====================  ==============================================
__init__ (DDL)         ``VectorCollectionClient`` — collection parquet
                       (K9 ``create_collection_if_not_exists``) + a
                       train-free pinned-range SQ8 index built at DDL
                       time, exactly like the reference's index DDL
insert (:101)          ``insert`` — append rows + index upsert
bulk_insert (:112)     ``bulk_insert`` — K5 ``VectorDBBulkLoader``
check_exists (:155)    ``check_exists`` — file_id -> file_name | None
search (:167)          ``search`` — ANN over the code store, exact
                       refine on the collection, output fields joined
delete (:180)          ``delete`` — expr rewrite of the collection
                       (K7) + ``delete_from_index`` on the code store
drop_collection (:185) ``drop_collection``
=====================  ==============================================

plus the maintenance surface a lake-backed store needs and a vector
database hides behind its daemon: ``stats`` (``index_stats``) and
``compact`` (``compact_index``).

Scale shape: every method delegates to the audited operators — the
collection never shuffles for inserts (pure appends), searches scan
dim bytes/vector with the float column entering only through the
bounded refine join, deletes are broadcast anti-join rewrites.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class VectorCollectionClient:
    """One object binding a CHUNK-schema collection + a persisted SQ8
    code index under ``root_path`` (``collection.parquet`` +
    ``index/``). ``dim`` and the pinned ``(vmin, vdiff)`` range are
    the index DDL parameters (train-free, so the index exists before
    any data — the reference's create-index-at-DDL contract);
    ``id_col``/``vec_col`` default to the chunk schema's
    (qa_id, dense_embedding)."""

    def __init__(
        self,
        spark: SparkSession,
        root_path: str,
        dim: int = 16,
        vmin: float = -1.0,
        vmax: float = 1.0,
        id_col: str = "qa_id",
        vec_col: str = "dense_embedding",
    ):
        import numpy as np

        from .operators.search import build_sq8_index
        from .sinks.parquet_sink import create_collection_if_not_exists

        self.spark = spark
        self.root_path = root_path
        self.index_path = f"{root_path}/index"
        self.dim = int(dim)
        self.id_col = id_col
        self.vec_col = vec_col
        self._params = (
            np.full(self.dim, float(vmin)),
            np.full(self.dim, float(vmax) - float(vmin)),
        )
        created = create_collection_if_not_exists(
            spark, self.collection_path
        )
        if created or not self._index_exists():
            # train-free DDL-time index build over the (possibly
            # empty) collection — pinned ranges need no sample
            build_sq8_index(
                self._collection().select(id_col, vec_col),
                self.index_path,
                vec_col=vec_col,
                corpus_id=id_col,
                params=self._params,
            )

    # -- internals --------------------------------------------------

    @property
    def collection_path(self) -> str:
        """The collection resolves through the root manifest
        (``..store``): ``delete`` stages its rewrite to a versioned
        dir and flips one manifest file, so a concurrent reader sees
        the old collection or the new one — never a half-renamed
        path (legacy ``collection.parquet`` when no manifest
        exists, i.e. every pre-manifest store and every fresh
        DDL)."""
        from .store import rel_path

        return rel_path(self.spark, self.root_path, "collection")

    def _collection(self) -> DataFrame:
        return self.spark.read.parquet(self.collection_path)

    def _index_exists(self) -> bool:
        jvm = self.spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(
            f"{self.index_path}/sq8_params.parquet"
        )
        return bool(
            p.getFileSystem(self.spark._jsc.hadoopConfiguration()).exists(p)
        )

    # -- the reference surface ---------------------------------------

    def insert(self, rows: DataFrame) -> None:
        """Append CHUNK-schema rows to the collection and their codes
        to the index (milvus_connector.py:101-111 — one call lands
        data AND keeps the index current; no retrain, the SQ8 upsert
        contract). The batch is localCheckpointed so its lineage runs
        once for both writes."""
        from .operators.search import upsert_sq8_index

        batch = rows.localCheckpoint(eager=True)
        batch.write.mode("append").parquet(self.collection_path)
        upsert_sq8_index(
            self.index_path,
            batch.select(self.id_col, self.vec_col),
            vec_col=self.vec_col,
            corpus_id=self.id_col,
        )

    def bulk_insert(self, loader, files: list[str]) -> bool:
        """K5 (milvus_connector.py:112-153): submit written parquet
        files through a ``VectorDBBulkLoader`` (injected — tests use a
        fake, production wires a real import client) and poll to
        completion."""
        return bool(loader.load(files))

    def check_exists(self, file_id: int):
        """file_id -> its file_name, or None
        (milvus_connector.py:155-165) — the dedup-before-work lookup
        the ingest loop runs per file."""
        row = (
            self._collection()
            .filter(F.col("file_id") == int(file_id))
            .select("file_name")
            .first()
        )
        return row["file_name"] if row is not None else None

    def search(
        self,
        query_vectors: list[list[float]],
        top_k: int = 5,
        metric: str = "L2",
        refine_factor: int = 4,
        allowed_ids: DataFrame | None = None,
        expr: str | None = None,
        output_fields: tuple[str, ...] = ("file_id", "file_name"),
    ) -> DataFrame:
        """ANN over the code store with exact refine on the collection
        (milvus_connector.py:167-178: query vectors in, top_k hits
        with output fields out). ``expr`` fills the role of the
        search-param ``expr`` key in the reference's client surface
        (milvus_connector.py:167-178) but is evaluated as a SPARK SQL
        boolean predicate over the collection's columns — NOT the
        Milvus expression grammar (e.g. write
        ``file_id IN (1, 2)``, not ``file_id in [1, 2]``; the
        reference's own search() never actually passes an expr):
        it derives the allowed id set from the COLLECTION before the
        ANN call, so the pre-filter rides the scalar ``allowed_ids``
        plumbing (broadcast left-semi into the code scan BEFORE
        top-k — filtered semantics, not post-filtered recall loss).
        ``allowed_ids`` remains the direct id-set form; when both are
        given the filters intersect (ids must satisfy both).
        ``refine_factor`` sizes the candidate set (refine_k =
        refine_factor × top_k). Output: (query_id, <id_col>, score,
        rank, *output_fields)."""
        from .operators.search import sq8_topk_index

        qdf = self.spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(query_vectors)],
            f"query_id long, {self.vec_col} array<float>",
        )
        coll = self._collection()
        if expr is not None:
            expr_ids = coll.filter(expr).select(self.id_col)
            allowed_ids = (
                expr_ids
                if allowed_ids is None
                else allowed_ids.select(
                    F.col(allowed_ids.columns[0]).alias(self.id_col)
                ).join(expr_ids, self.id_col, "left_semi")
            )
        hits = sq8_topk_index(
            self.spark,
            self.index_path,
            qdf,
            k=top_k,
            metric=metric,
            corpus_id=self.id_col,
            query_vec=self.vec_col,
            refine=coll.select(self.id_col, self.vec_col),
            refine_k=max(top_k, refine_factor * top_k),
            vec_col=self.vec_col,
            allowed_ids=allowed_ids,
        )
        fields = [f for f in output_fields if f != self.id_col]
        if not fields:
            return hits
        return hits.join(
            coll.select(self.id_col, *fields), self.id_col
        ).select("query_id", self.id_col, "score", "rank", *fields)

    def delete(self, expr: str) -> int:
        """DELETE WHERE over collection AND index
        (milvus_connector.py:180-183): the matching ids drive a
        broadcast anti-join rewrite of BOTH stores — the SAME id set,
        so the two removals are identical by construction. The
        collection is rewritten via left_anti on the ids (NOT via
        ``NOT (expr)``, whose three-valued logic silently drops rows
        where the predicate evaluates to NULL — those rows match
        neither branch). Order: index delete FIRST, collection swap
        second — a crash in between leaves the ids gone from the
        index but still in the collection, which a retried
        ``delete(expr)`` fully repairs (the ids are recomputed from
        the intact collection); the reverse order would strand
        deleted ids permanently searchable in the index because the
        retry would find zero matches. Returns rows deleted."""
        from .operators.metrics import delete_from_index
        from .store import publish, staged_rel_dir

        coll = self._collection()
        ids = (
            coll.filter(expr)
            .select(self.id_col)
            .dropDuplicates()
            .localCheckpoint(eager=True)
        )
        n = ids.count()
        if n == 0:
            return 0
        delete_from_index(
            self.spark, self.index_path, ids, id_col=self.id_col
        )
        staged = staged_rel_dir("collection")
        (
            coll.join(F.broadcast(ids), self.id_col, "left_anti")
            .write.mode("overwrite")
            .parquet(f"{self.root_path}/{staged}")
        )
        publish(self.spark, self.root_path, {"collection": staged})
        return n

    def drop_collection(self) -> bool:
        """K8 (milvus_connector.py:185-187): remove the collection and
        its index."""
        from .sinks.parquet_sink import drop_collection

        a = drop_collection(self.spark, self.collection_path)
        b = drop_collection(self.spark, self.index_path)
        # everything else under the root goes too — retired versioned
        # collection dirs, a legacy dir an early generation left
        # behind, the manifest — so a re-created collection starts
        # from a clean legacy layout, like a fresh DDL
        jvm = self.spark._jvm
        rp = jvm.org.apache.hadoop.fs.Path(self.root_path)
        fs = rp.getFileSystem(self.spark._jsc.hadoopConfiguration())
        if fs.exists(rp):
            fs.delete(rp, True)
        return bool(a or b)

    # -- maintenance (the part a daemon-backed store hides) ----------

    def stats(self) -> DataFrame:
        """Per-relation rows/files/partition-skew (``index_stats``)."""
        from .operators.metrics import index_stats

        return index_stats(self.spark, self.index_path)

    def compact(self) -> DataFrame:
        """Merge append segments (``compact_index``); returns the
        post-compaction stats report."""
        from .operators.metrics import compact_index

        return compact_index(self.spark, self.index_path)

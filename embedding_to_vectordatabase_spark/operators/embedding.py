"""Embedding operators (reference V1/V2/V3).

The reference fans out HTTP batches of 64 texts to a model server with
retry ×3 exponential backoff (embedding_model/tei_req.py:12,41-77) and
the server micro-batches 128 sentences per GPU encode
(baai_m3_simple_server/m3_server.py:12-19). In Spark both collapse
into one Arrow-batched ``mapInPandas`` stage: Arrow batch size is the
micro-batch, task parallelism is the fan-out, and
``spark.task.maxFailures`` is the outer retry layer.

Two client implementations behind one interface:
- ``MockEmbeddingClient`` — deterministic hash-seeded vectors
  (FIXTURES.md §4 contract): same text ⇒ same vectors, so golden
  outputs are stable without a model server. Used by all tests.
- ``HttpEmbeddingClient`` — the production path: in-UDF sub-batching
  (64), retry/backoff; endpoints match the reference's TEI
  (``/embed`` + ``/embed_sparse``), ``/v2/embeddings``,
  ``/embeddings`` client family. Network calls are NOT exercised in
  this container; the request shaping is unit-testable.
"""

from __future__ import annotations

import hashlib
import struct
import time
from collections.abc import Iterator
from typing import Protocol

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import DENSE_DIM

SPARSE_NNZ = 6  # sample-data shape (vector_database/milvus_connector.py:252-261)
SPARSE_VOCAB = 250_000
HTTP_BATCH = 64  # embedding_model/tei_req.py:12
MAX_RETRIES = 3


class EmbeddingClient(Protocol):
    def embed(self, texts: list[str]) -> list[list[float]]: ...

    def embed_hybrid(
        self, texts: list[str]
    ) -> tuple[list[list[float]], list[dict[int, float]]]: ...


class MockEmbeddingClient:
    """Deterministic embedder: RNG seeded from sha1(text); emits an
    L2-normalized ``dim``-float dense vector and an ``nnz``-entry
    sparse map with token ids < 250k and weights in (0, 1].

    ``cost_floor_s``: optional per-TEXT wall cost (time.sleep) so
    local benchmarks can price the model boundary the mock replaces —
    the reference embeds through a GPU server in 128-sentence batches
    (baai_m3_simple_server/m3_server.py:12-19) behind 64-text HTTP
    sub-batches (embedding_model/tei_req.py:12), where per-text cost
    is milliseconds, not free; a dedup gate's value is exactly the
    texts it stops from paying that cost (r15 verdict #2)."""

    def __init__(
        self,
        dim: int = DENSE_DIM,
        nnz: int = SPARSE_NNZ,
        cost_floor_s: float = 0.0,
    ):
        self.dim = dim
        self.nnz = nnz
        self.cost_floor_s = float(cost_floor_s)

    def _seed(self, text: str) -> int:
        h = hashlib.sha1((text or "").encode("utf-8")).digest()
        return struct.unpack("<Q", h[:8])[0]

    def embed(self, texts: list[str]) -> list[list[float]]:
        if self.cost_floor_s and texts:
            time.sleep(self.cost_floor_s * len(texts))
        out = []
        for t in texts:
            rng = np.random.default_rng(self._seed(t))
            v = rng.standard_normal(self.dim)
            v /= np.linalg.norm(v) or 1.0
            out.append(v.astype(np.float32).tolist())
        return out

    def embed_hybrid(self, texts):
        dense = self.embed(texts)
        sparse = []
        for t in texts:
            rng = np.random.default_rng(self._seed(t) ^ 0xBEEF)
            ids = rng.choice(SPARSE_VOCAB, size=self.nnz, replace=False)
            ws = rng.uniform(1e-6, 1.0, size=self.nnz)
            sparse.append(
                {int(i): float(w) for i, w in zip(ids, ws)}
            )
        return dense, sparse


class HttpEmbeddingClient:
    """Production client skeleton: sub-batch of 64, retry ×3 with
    exponential backoff, raise after exhaustion (unified raise →
    Spark task retry → quarantine; SURVEY §7 quirk list)."""

    def __init__(
        self,
        base_url: str,
        dense_endpoint: str = "/embed",
        sparse_endpoint: str = "/embed_sparse",
        batch_size: int = HTTP_BATCH,
        max_retries: int = MAX_RETRIES,
        timeout_s: float = 120.0,
    ):
        self.base_url = base_url.rstrip("/")
        self.dense_endpoint = dense_endpoint
        self.sparse_endpoint = sparse_endpoint
        self.batch_size = batch_size
        self.max_retries = max_retries
        self.timeout_s = timeout_s
        self._backoff_base_s = 0.5  # exponential: base * 2**attempt

    def _post(self, endpoint: str, payload: dict) -> dict:
        import json
        import urllib.request

        last_err: Exception | None = None
        for attempt in range(self.max_retries):
            try:
                req = urllib.request.Request(
                    self.base_url + endpoint,
                    data=json.dumps(payload).encode(),
                    headers={"Content-Type": "application/json"},
                )
                with urllib.request.urlopen(req, timeout=self.timeout_s) as r:
                    return json.loads(r.read())
            except Exception as e:  # noqa: BLE001 — retry any transport error
                last_err = e
                time.sleep(2**attempt * self._backoff_base_s)
        raise RuntimeError(
            f"embedding request failed after {self.max_retries} retries"
        ) from last_err

    def _batches(self, texts: list[str]) -> Iterator[list[str]]:
        for i in range(0, len(texts), self.batch_size):
            yield texts[i : i + self.batch_size]

    def embed(self, texts: list[str]) -> list[list[float]]:
        out: list[list[float]] = []
        for batch in self._batches(texts):
            out.extend(self._post(self.dense_endpoint, {"inputs": batch}))
        return out

    def embed_hybrid(self, texts):
        dense: list[list[float]] = []
        sparse: list[dict[int, float]] = []
        for batch in self._batches(texts):
            dense.extend(self._post(self.dense_endpoint, {"inputs": batch}))
            raw = self._post(self.sparse_endpoint, {"inputs": batch})
            sparse.extend(
                {int(k): float(v) for k, v in row.items()} for row in raw
            )
        return dense, sparse


def _client_factory(kind: str, dim: int, cost_floor_s: float = 0.0):
    # resolved inside the executor task so no client object is pickled
    if kind == "mock":
        return MockEmbeddingClient(dim=dim, cost_floor_s=cost_floor_s)
    raise NotImplementedError(
        "HTTP embedding needs a live model server; construct "
        "HttpEmbeddingClient yourself and pass client_kind='mock' in tests"
    )


def embed_text(
    df: DataFrame,
    text_col: str = "chunk",
    client_kind: str = "mock",
    dim: int = DENSE_DIM,
    hybrid: bool = True,
    mock_cost_floor_s: float = 0.0,
) -> DataFrame:
    """Append dense_embedding (+ sparse_embedding when hybrid) columns
    via one Arrow-batched mapInPandas stage. Map-only: no shuffle (an
    under-parallel input is re-spread first so every core embeds); the
    Arrow batch (session.ARROW_BATCH_ROWS) is the GPU/HTTP micro-batch.
    """
    from ..util import ensure_parallelism

    df = ensure_parallelism(df)
    fields = list(df.schema.fields) + [
        T.StructField(
            "dense_embedding", T.ArrayType(T.FloatType(), False), False
        )
    ]
    if hybrid:
        fields.append(
            T.StructField(
                "sparse_embedding",
                T.MapType(T.IntegerType(), T.FloatType(), False),
                False,
            )
        )
    out_schema = T.StructType(fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = _client_factory(client_kind, dim, mock_cost_floor_s)
        for pdf in batches:
            texts = pdf[text_col].fillna("").tolist()
            if hybrid:
                dense, sparse = client.embed_hybrid(texts)
                yield pdf.assign(
                    dense_embedding=pd.Series(dense, index=pdf.index),
                    sparse_embedding=pd.Series(
                        [list(s.items()) for s in sparse], index=pdf.index
                    ).map(dict),
                )
            else:
                yield pdf.assign(
                    dense_embedding=pd.Series(
                        client.embed(texts), index=pdf.index
                    )
                )

    return df.mapInPandas(run, out_schema)


def group_centroids(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """Element-wise mean embedding per group — the corpus-analytics
    primitive behind source-similarity and snapshot-drift reports.

    Scale shape: posexplode fans each vector into (group, pos, value)
    rows, one map-side-combined groupBy on (group, pos) averages them,
    and the centroid is reassembled with array_sort over collected
    (pos, avg) structs — dim × n_groups rows after the partial agg, so
    the shuffle is tiny regardless of corpus size. All JVM-native.

    ``round_to`` rounds each centroid component so a SQL oracle's
    independently-ordered float summation agrees bit-for-bit in the
    downstream cosine (per-sum error ~1e-12 vs the 1e-6 grid).
    """
    comps = (
        df.select(
            F.col(group_col).alias("grp"),
            F.posexplode(F.col(vec_col).cast("array<double>")).alias(
                "pos", "v"
            ),
        )
        .groupBy("grp", "pos")
        .agg(F.avg("v").alias("c"))
    )
    c = F.round("c", round_to) if round_to is not None else F.col("c")
    return (
        comps.select("grp", F.struct("pos", c.alias("c")).alias("pc"))
        .groupBy("grp")
        .agg(
            F.transform(
                F.array_sort(F.collect_list("pc")), lambda s: s["c"]
            ).alias("centroid")
        )
        .withColumnRenamed("grp", group_col)
    )


def centroid_similarity(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """Pairwise cosine similarity between group centroid embeddings —
    which sources/labels cover the same region of embedding space
    (near-1 pairs are merge/dedup candidates; near-0 pairs are the
    diversity a training mix wants).

    The pairwise join runs AFTER the centroid aggregation, over
    n_groups rows — never over the corpus — so the cross join is a few
    hundred rows even when the input is 100 TB. Output columns:
    (group_a, group_b, cosine), group_a < group_b.
    """
    cents = group_centroids(df, group_col, vec_col, round_to)
    a = cents.select(
        F.col(group_col).alias("group_a"), F.col("centroid").alias("ca")
    )
    b = cents.select(
        F.col(group_col).alias("group_b"), F.col("centroid").alias("cb")
    )
    dot = F.aggregate(
        F.zip_with("ca", "cb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda col: F.sqrt(  # noqa: E731
        F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return (
        a.join(b, F.col("group_a") < F.col("group_b"))
        .select(
            "group_a",
            "group_b",
            F.round(
                dot / (nrm(F.col("ca")) * nrm(F.col("cb"))), 6
            ).alias("cosine"),
        )
    )


def embedding_dispersion(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group spread of embeddings around the group centroid:
    dispersion = E[||x||²] − ||E[x]||² (the trace of the covariance,
    equal to the mean squared distance to the centroid). Near-zero
    means the group's documents are embedding-redundant (a dedup /
    downsample candidate); large means diverse coverage — with
    ``centroid_similarity`` this is the coverage-vs-redundancy pair a
    training-mix review needs.

    Scale shape: identical to ``group_centroids`` — one posexplode
    fan-out, one map-side-combined (group, pos) aggregation carrying
    (mean, sum-of-squares, count), then a groups × dim reduce. The
    corpus shuffles only as (group, pos) partial aggregates. Output:
    (<group_col>, n_vecs, dispersion), dispersion rounded to 6dp so
    a SQL oracle's independently-ordered float summation agrees.
    """
    comps = df.select(
        F.col(group_col).alias("grp"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias(
            "pos", "v"
        ),
    )
    per_pos = comps.groupBy("grp", "pos").agg(
        F.avg("v").alias("c"),
        F.sum(F.col("v") * F.col("v")).alias("ss"),
        F.count("*").alias("n"),
    )
    return (
        per_pos.groupBy("grp")
        .agg(
            F.max("n").alias("n_vecs"),
            F.round(
                F.sum("ss") / F.max("n")
                - F.sum(F.col("c") * F.col("c")),
                6,
            ).alias("dispersion"),
        )
        .withColumnRenamed("grp", group_col)
    )

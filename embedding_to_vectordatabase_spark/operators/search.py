"""Vector search operators (reference J4/W3/O4, V4-V7, K9).

The reference's dense index is FLAT/IP — an exact scan
(vector_database/milvus_connector.py:65-69) — so exact brute-force
top-k IS reference parity, not a fallback. The sparse index is
SPARSE_INVERTED_INDEX/IP (:71-74), which is exactly the
posexplode'd (token, weight, id) relational form below.

Scale notes (100 TB):
- ``dense_topk``: Q queries broadcast against the corpus; score is a
  codegen'd expression, per-query top-k via Window. The corpus never
  shuffles for scoring — only the (rows × Q) score stream shuffles,
  and with k small the per-partition Window input can be pre-pruned.
- ``ann_topk_bucketed``: random-hyperplane LSH coarse buckets turn the
  crossJoin into an equi-join on bucket — the IVF-style scale path.
- ``sparse_topk_inverted``: inverted index as a relational join;
  shuffle is on token (bounded vocab), partial aggregation map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import (
    dense_cosine,
    dense_ip,
    dense_l2,
    rerank_fusion,
    sign_bucket,
)

DEFAULT_TOP_K = 5  # reference search default (milvus_connector.py:175)

_METRICS = {
    "IP": (dense_ip, F.desc),
    "COSINE": (dense_cosine, F.desc),
    "L2": (dense_l2, F.asc),
}


def _score_col(metric: str, a, b):
    try:
        fn, order = _METRICS[metric.upper()]
    except KeyError:
        raise ValueError(f"unknown metric {metric!r}; use IP|COSINE|L2")
    return fn(a, b), order


def dense_topk(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_vec: str = "embedding",
    query_vec: str = "embedding",
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    k: int = DEFAULT_TOP_K,
    metric: str = "IP",
) -> DataFrame:
    """Exact top-k per query: broadcast(queries) × corpus, native
    score expr, rank <= k. Ties broken by corpus id for determinism.

    Output: (query_id, <corpus_id>, score double, rank int).
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id).alias("query_id"),
            F.col(query_vec).alias("__qvec"),
        )
    )
    score, order = _score_col(metric, F.col("__qvec"), F.col(corpus_vec))
    w = Window.partitionBy("query_id").orderBy(
        order("score"), F.asc(corpus_id)
    )
    return (
        corpus.crossJoin(q)
        .select(
            "query_id",
            corpus_id,
            score.alias("score"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ann_topk_bucketed(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_vec: str = "embedding",
    query_vec: str = "embedding",
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    k: int = DEFAULT_TOP_K,
    metric: str = "IP",
    bits: int = 8,
) -> DataFrame:
    """Approximate top-k: sign-bucket LSH (axis-aligned hyperplanes on
    the first ``bits`` dims) prunes the candidate set to the query's
    bucket, then exact scoring within it. Equi-join on bucket replaces
    the crossJoin — this is the 100 TB path (recall < 1.0 by design).
    """
    c = corpus.withColumn("__bucket", sign_bucket(F.col(corpus_vec), bits))
    q = F.broadcast(
        queries.select(
            F.col(query_id).alias("query_id"),
            F.col(query_vec).alias("__qvec"),
        ).withColumn("__bucket", sign_bucket(F.col("__qvec"), bits))
    )
    score, order = _score_col(metric, F.col("__qvec"), F.col(corpus_vec))
    w = Window.partitionBy("query_id").orderBy(
        order("score"), F.asc(corpus_id)
    )
    return (
        c.join(q, "__bucket")
        .select("query_id", corpus_id, score.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def sparse_topk_inverted(
    corpus_postings: DataFrame,
    query_postings: DataFrame,
    k: int = DEFAULT_TOP_K,
) -> DataFrame:
    """Sparse IP top-k via the inverted relational form.

    Inputs are posting tables: corpus (doc_id, token, weight) and
    queries (query_id, token, weight) — i.e. posexplode'd
    map<int,float> sparse vectors. score(q, d) = sum over shared
    tokens of qw * dw; join on token, groupBy (query, doc), top-k.
    This is the reference's SPARSE_INVERTED_INDEX/IP expressed
    relationally (vector_database/milvus_connector.py:71-74).
    """
    q = F.broadcast(
        query_postings.select(
            "query_id", "token", F.col("weight").alias("__qw")
        )
    )
    scored = (
        corpus_postings.join(q, "token")
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(
                F.col("weight").cast("double") * F.col("__qw").cast("double")
            ).alias("score")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def explode_sparse(
    df: DataFrame, sparse_col: str, id_col: str, id_alias: str = "doc_id"
) -> DataFrame:
    """map<int,float> -> (id, token, weight) posting rows."""
    return df.select(
        F.col(id_col).alias(id_alias),
        F.explode(F.col(sparse_col)).alias("token", "weight"),
    )


def rerank(
    pairs: DataFrame,
    colbert_col: str = "colbert_score",
    sparse_col: str = "sparse_score",
    dense_col: str = "dense_score",
) -> DataFrame:
    """V6/J5: weighted fusion 0.4*colbert + 0.2*sparse + 0.4*dense over
    (query, passage) score columns, ranked per query."""
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("passage_id")
    )
    return pairs.withColumn(
        "score",
        F.round(
            rerank_fusion(
                F.col(colbert_col), F.col(sparse_col), F.col(dense_col)
            ),
            6,
        ),
    ).withColumn("rank", F.row_number().over(w))


def point_query(
    chunks: DataFrame, expr: str, output_fields: list[str]
) -> DataFrame:
    """K6-era point query: Milvus boolean-expr filter → Spark SQL expr
    (a superset). E.g. expr='file_id == 42' (milvus_connector.py:155-165)."""
    return chunks.filter(F.expr(expr)).select(*output_fields)

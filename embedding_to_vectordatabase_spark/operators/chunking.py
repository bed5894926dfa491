"""Document chunking operators (reference T1/T2).

Reference parity:
- recursive character splitter: splite_text/lang_chain_splitter.py:7-30
  (separators, chunk_size 3200 / 1024 default, overlap 100,
  keep_separator=False), consumed at embed_to_milvus.py:92-98 where
  block_id = enumerate(blocks).
- semantic splitter: splite_text/semantic_splitter.py:11-49.

Spark design:
- ``chunk_fixed``      — pure native expressions (sequence + transform +
  posexplode): zero Python, whole-stage codegen, the scale path.
- ``chunk_recursive``  — separator-aware re-implementation of the
  recursive splitter as an Arrow-batched pandas UDF returning
  array<string>, then posexplode. Python only touches the string, all
  fan-out bookkeeping (block_id, carried columns) stays native.
- ``chunk_semantic``   — distance-breakpoint splitter over sentence
  embeddings; composition of the sentence regex split, an embedder,
  and a native running-sum segmenter.

At 100 TB: chunking is map-only (no shuffle); posexplode multiplies
rows in place, and downstream ops see the same partitioning.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# separator priority (splite_text/lang_chain_splitter.py:17)
SEPARATORS = [
    "<row>", "</row>", "<Cell>", "</Cell>",
    "\n", "。", "，", "；", "！", "？", " ",
]
DEFAULT_CHUNK_SIZE = 1024  # code default; prod config uses 3200
DEFAULT_OVERLAP = 100
SENTENCE_SPLIT_REGEX = r"(?<=[。.!?！？； ])\s*"


def fixed_chunk_array(
    text: Column, chunk_size: int, overlap: int
) -> Column:
    """array<string> of fixed-size windows with ``overlap`` chars of
    lookback; stride = chunk_size - overlap. Pure native expr."""
    stride = chunk_size - overlap
    if stride <= 0:
        raise ValueError("chunk_size must exceed overlap")
    n = F.when(F.length(text) <= chunk_size, F.lit(1)).otherwise(
        F.ceil((F.length(text) - F.lit(chunk_size)) / F.lit(stride)) + 1
    )
    return F.transform(
        F.sequence(F.lit(0), n.cast("int") - 1),
        lambda i: F.substring(text, i * stride + 1, chunk_size),
    )


def chunk_fixed(
    df: DataFrame,
    text_col: str = "content",
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_OVERLAP,
) -> DataFrame:
    """1 doc -> N overlapping windows; empty docs yield 0 rows
    (reference drops empty-block docs, embed_to_milvus.py:93,101-103).
    Output: carried columns + (block_id long, chunk string)."""
    carried = [c for c in df.columns if c != text_col]
    return (
        df.filter(F.length(F.coalesce(F.col(text_col), F.lit(""))) > 0)
        .select(
            *carried,
            F.posexplode(
                fixed_chunk_array(F.col(text_col), chunk_size, overlap)
            ).alias("block_id", "chunk"),
        )
        .withColumn("block_id", F.col("block_id").cast("long"))
    )


def _join_docs(docs: list[str], sep: str) -> str | None:
    text = sep.join(docs).strip()
    return text if text else None


def _merge_splits(
    splits: list[str], sep: str, chunk_size: int, overlap: int
) -> list[str]:
    """Greedy re-merge of small pieces into chunks <= chunk_size
    (separator length counted), carrying <= ``overlap`` chars of
    trailing pieces into the next chunk — RecursiveCharacterTextSplitter
    merge semantics (keep_separator=False: pieces rejoin WITH the
    separator, strip_whitespace on emit)."""
    sep_len = len(sep)
    docs: list[str] = []
    current: list[str] = []
    total = 0
    for d in splits:
        length = len(d)
        if total + length + (sep_len if current else 0) > chunk_size:
            if current:
                doc = _join_docs(current, sep)
                if doc is not None:
                    docs.append(doc)
                while total > overlap or (
                    total + length + (sep_len if current else 0) > chunk_size
                    and total > 0
                ):
                    total -= len(current[0]) + (
                        sep_len if len(current) > 1 else 0
                    )
                    current.pop(0)
        current.append(d)
        total += length + (sep_len if len(current) > 1 else 0)
    doc = _join_docs(current, sep)
    if doc is not None:
        docs.append(doc)
    return docs


def _split_recursive(
    text: str, separators: list[str], chunk_size: int, overlap: int
) -> list[str]:
    """Recursive split: take the first separator present in the text,
    split (separator DROPPED — keep_separator=False), merge runs of
    small pieces, recurse into oversized pieces with the remaining
    separators; character-level fallback when none remain."""
    final_chunks: list[str] = []
    separator = separators[-1]
    new_separators: list[str] = []
    for i, s in enumerate(separators):
        if s == "":
            separator = s
            break
        if s in text:
            separator = s
            new_separators = separators[i + 1 :]
            break
    splits = [
        s for s in (text.split(separator) if separator else list(text)) if s
    ]
    good: list[str] = []
    for s in splits:
        if len(s) < chunk_size:
            good.append(s)
        else:
            if good:
                final_chunks.extend(
                    _merge_splits(good, separator, chunk_size, overlap)
                )
                good = []
            if not new_separators:
                final_chunks.append(s)
            else:
                final_chunks.extend(
                    _split_recursive(s, new_separators, chunk_size, overlap)
                )
    if good:
        final_chunks.extend(
            _merge_splits(good, separator, chunk_size, overlap)
        )
    return final_chunks


def split_text_recursive(
    text: str,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_OVERLAP,
    separators: list[str] | None = None,
) -> list[str]:
    """Plain-Python recursive splitter, matching the reference's
    RecursiveCharacterTextSplitter(keep_separator=False) split/merge
    semantics (splite_text/lang_chain_splitter.py:7-30): separators
    are dropped on split, runs of small pieces are rejoined with the
    separator under the chunk_size budget, and up to ``overlap``
    trailing chars carry into the next chunk."""
    if not text:
        return []
    return _split_recursive(
        text, list(separators or SEPARATORS), chunk_size, overlap
    )


def chunk_recursive(
    df: DataFrame,
    text_col: str = "content",
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_OVERLAP,
) -> DataFrame:
    """Separator-aware recursive chunking; Arrow-batched pandas UDF for
    the string work, native posexplode for the fan-out. Under-parallel
    inputs are re-spread so the Python splitter runs on every core."""
    from ..util import ensure_parallelism

    df = ensure_parallelism(df)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _split(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: split_text_recursive(t or "", chunk_size, overlap)
        )

    carried = [c for c in df.columns if c != text_col]
    return (
        df.select(*carried, _split(F.col(text_col)).alias("_blocks"))
        .filter(F.size("_blocks") > 0)
        .select(
            *carried,
            F.posexplode("_blocks").alias("block_id", "chunk"),
        )
        .withColumn("block_id", F.col("block_id").cast("long"))
    )


def split_sentences(df: DataFrame, text_col: str = "content") -> DataFrame:
    """doc -> (sentence_id, sentence) using the reference's sentence
    regex (splite_text/semantic_splitter.py:20)."""
    carried = [c for c in df.columns if c != text_col]
    return (
        df.select(
            *carried,
            F.posexplode(
                F.filter(
                    F.split(F.col(text_col), SENTENCE_SPLIT_REGEX),
                    lambda s: F.length(F.trim(s)) > 0,
                )
            ).alias("sentence_id", "sentence"),
        )
        .withColumn("sentence_id", F.col("sentence_id").cast("long"))
    )


def chunk_semantic(
    sentences_with_dist: DataFrame,
    doc_col: str = "doc_id",
    dist_col: str = "dist",
    sentence_col: str = "sentence",
    order_col: str = "sentence_id",
    threshold_type: str = "percentile",
    threshold_amount: float = 0.95,
    number_of_chunks: int | None = None,
    min_chunk_size: int | None = None,
) -> DataFrame:
    """Semantic chunking given consecutive-sentence embedding distances
    — the full SemanticChunker parameter surface the reference exposes
    (splite_text/semantic_splitter.py:12-16):

    - threshold types percentile / standard_deviation / interquartile
      / gradient (gradient = the same percentile machinery applied to
      the np.gradient-style derivative of the distance series);
    - ``number_of_chunks`` overrides the threshold: the top N-1
      distances become the breakpoints;
    - ``min_chunk_size`` forward-merges a too-small group into the
      next one (langchain skips emitting the boundary).

    Segment id = running count of breakpoints; chunk = concat of the
    segment's sentences. Native window + groupBy; the only Python is
    the per-doc min-size merge (tiny groups, applyInPandas).
    """
    from pyspark.sql import Window as W

    w_doc = W.partitionBy(doc_col)
    w_ord = W.partitionBy(doc_col).orderBy(order_col)
    df = sentences_with_dist

    d = F.col(dist_col)
    if threshold_type == "gradient":
        # np.gradient: central differences inside, one-sided at edges
        prev, nxt = F.lag(d).over(w_ord), F.lead(d).over(w_ord)
        grad = (
            F.when(d.isNull(), F.lit(None).cast("double"))
            .when(prev.isNull() & nxt.isNull(), F.lit(0.0))
            .when(prev.isNull(), nxt - d)
            .when(nxt.isNull(), d - prev)
            .otherwise((nxt - prev) / 2.0)
        )
        df = df.withColumn("__sig", grad)
        d = F.col("__sig")
        threshold_type = "percentile"
    else:
        df = df.withColumn("__sig", d)
        d = F.col("__sig")

    if number_of_chunks is not None:
        # top (N-1) signal values are the breakpoints, threshold ignored
        rk = F.row_number().over(
            W.partitionBy(doc_col).orderBy(
                F.desc_nulls_last("__sig"), F.col(order_col)
            )
        )
        brk = d.isNotNull() & (rk <= number_of_chunks - 1)
        df = df.withColumn("__brk", brk)
    else:
        if threshold_type == "percentile":
            thr = F.expr(
                f"percentile(__sig, {threshold_amount})"
            ).over(w_doc)
        elif threshold_type == "standard_deviation":
            thr = (
                F.avg(d).over(w_doc)
                + F.lit(threshold_amount) * F.stddev(d).over(w_doc)
            )
        elif threshold_type == "interquartile":
            iqr = F.expr("percentile(__sig, 0.75)").over(w_doc) - F.expr(
                "percentile(__sig, 0.25)"
            ).over(w_doc)
            thr = F.avg(d).over(w_doc) + F.lit(threshold_amount) * iqr
        else:
            raise ValueError(f"unknown threshold_type {threshold_type!r}")
        df = df.withColumn("__brk", d > thr)

    seg = F.sum(
        F.when(F.col("__brk"), F.lit(1)).otherwise(F.lit(0))
    ).over(w_ord.rowsBetween(W.unboundedPreceding, -1))
    chunks = (
        df.withColumn(
            "segment_id", F.coalesce(seg, F.lit(0)).cast("long")
        )
        .groupBy(doc_col, "segment_id")
        .agg(
            F.concat_ws(
                "", F.array_sort(
                    F.collect_list(F.struct(order_col, sentence_col))
                ).getField(sentence_col)
            ).alias("chunk")
        )
    )
    if min_chunk_size is None:
        return chunks

    out_schema = chunks.schema

    def merge_small(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("segment_id").reset_index(drop=True)
        texts: list[str] = []
        buf = ""
        for t in pdf["chunk"]:
            buf += t
            if len(buf) >= min_chunk_size:
                texts.append(buf)
                buf = ""
        if buf:  # trailing short group joins the last emitted chunk
            if texts:
                texts[-1] += buf
            else:
                texts.append(buf)
        return pd.DataFrame(
            {
                doc_col: [pdf[doc_col].iloc[0]] * len(texts),
                "segment_id": list(range(len(texts))),
                "chunk": texts,
            }
        )

    return chunks.groupBy(doc_col).applyInPandas(merge_small, out_schema)


def semantic_chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    client_kind: str = "mock",
    dim: int = 64,
    threshold_type: str = "percentile",
    threshold_amount: float = 0.95,
    buffer_size: int = 1,
    number_of_chunks: int | None = None,
    min_chunk_size: int | None = None,
) -> DataFrame:
    """T2 end-to-end: sentence split → combine each sentence with its
    ±``buffer_size`` neighbors (SemanticChunker's smoothing window;
    the reference passes buffer_size=1) → embed the combined windows →
    cosine distance between CONSECUTIVE windows (dist on row i =
    distance to window i+1, "break after i"; last row null) → per-doc
    threshold → segment concat of the ORIGINAL sentences. Mirrors
    splite_text/semantic_splitter.py:11-49 with the embedding service
    swapped for the pluggable client (mock in tests).

    Map-only except the per-doc Windows/groupBy — one shuffle on
    doc_id. Output: (doc_col, segment_id, chunk).
    """
    from pyspark.sql import Window as W

    from ..functions.vector import dense_cosine
    from .embedding import embed_text

    sents = split_sentences(
        df.select(doc_col, text_col), text_col
    )
    w = W.partitionBy(doc_col).orderBy("sentence_id")
    combined = F.concat_ws(
        "",
        *[
            F.coalesce(F.lag("sentence", i).over(w), F.lit(""))
            for i in range(buffer_size, 0, -1)
        ],
        F.col("sentence"),
        *[
            F.coalesce(F.lead("sentence", i).over(w), F.lit(""))
            for i in range(1, buffer_size + 1)
        ],
    )
    sents = sents.withColumn("__combined", combined)
    emb = embed_text(
        sents, "__combined", client_kind, dim, hybrid=False
    )
    nxt = F.lead("dense_embedding").over(w)
    with_dist = emb.withColumn(
        "dist",
        F.when(
            nxt.isNull(), F.lit(None).cast("double")
        ).otherwise(1.0 - dense_cosine(F.col("dense_embedding"), nxt)),
    ).drop("dense_embedding", "__combined")
    return chunk_semantic(
        with_dist,
        doc_col=doc_col,
        dist_col="dist",
        sentence_col="sentence",
        order_col="sentence_id",
        threshold_type=threshold_type,
        threshold_amount=threshold_amount,
        number_of_chunks=number_of_chunks,
        min_chunk_size=min_chunk_size,
    )

"""End-to-end ingest pipeline (reference query lifecycle §3.1,
embed_to_milvus.py:50-145 — the whole threaded dataflow as ONE lazy
Spark plan).

  docs → file_name (W1/S4) → registry broadcast join (J1, + warn side
  output) → anti-join vs ingested snapshot (J2, idempotency) → format
  (P3) → chunk (T1) → embed (V1/V2) → placeholders (P8) → canonical
  CHUNK schema → rotating parquet sink (K1)

The reference's 8 processing threads + 4 upload threads +
condition-variable backpressure (embed_to_milvus.py:185-201) are
Spark's task scheduler; its per-batch try/except poison-pill
(embed_to_milvus.py:135-145) becomes row-level routing: unmatched
docs come back as a side output instead of being logged and dropped.

Shuffle inventory at scale: ONE narrow plan — the registry join is
broadcast, chunking/embedding are map-only; the only wide op is the
optional deterministic row numbering (disabled when ``docs`` already
carries unique ids).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import reformat_doc
from ..operators.chunking import (
    DEFAULT_CHUNK_SIZE,
    DEFAULT_OVERLAP,
    chunk_recursive,
)
from ..operators.embedding import embed_text
from ..operators.joins import anti_join_ingested, registry_lookup
from ..sources.corpus import with_file_name, with_row_numbers_scalable


@dataclass
class IngestConfig:
    chunk_size: int = DEFAULT_CHUNK_SIZE
    overlap: int = DEFAULT_OVERLAP
    client_kind: str = "mock"
    dense_dim: int = 1024
    # per-text wall cost for the MOCK embedder only: lets benchmarks
    # price the model boundary (see MockEmbeddingClient.cost_floor_s)
    mock_cost_floor_s: float = 0.0
    placeholders: dict = field(
        default_factory=lambda: {
            # P8 constants (embed_to_milvus.py:111-121)
            "qa_id": 0,
            "question": "",
            "answer": "",
            "flag": "0",
        }
    )


CANONICAL_ORDER = [
    "qa_id", "question", "answer", "file_id", "block_id",
    "file_name", "content", "dense_embedding", "sparse_embedding",
    "source", "flag",
]


def ingest(
    docs: DataFrame,
    registry: DataFrame,
    ingested: DataFrame | None = None,
    config: IngestConfig | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Returns (chunks, unmatched_docs).

    ``chunks`` carries the canonical 12-field CHUNK schema minus the
    sink-assigned ``id``; ``unmatched_docs`` is the J1 warn side
    output (docs with no registry entry). Use ``ingest_with_quarantine``
    for the VARCHAR-contract side output.
    """
    cfg = config or IngestConfig()

    # W1: documented bypass — reuse an existing unique id as the row
    # number; otherwise scalable two-phase numbering (no global sort,
    # VERDICT r1 perf item 1). Ties on identical (title, content) get
    # a deterministic order from the full orderBy inside each bucket.
    integral = {"tinyint", "smallint", "int", "bigint"}
    if "row_no" in docs.columns:
        numbered = docs
    elif (
        "doc_id" in docs.columns
        and dict(docs.dtypes)["doc_id"] in integral
    ):
        # Bypass only for integral doc_ids: a string id would throw under
        # ANSI mode, and the caller owns uniqueness.  Note ids need not be
        # dense/1-based here — file_name suffixes follow the ids as given.
        numbered = docs.withColumn("row_no", F.col("doc_id").cast("long"))
    else:
        numbered = with_row_numbers_scalable(
            docs, order_by=["title", "content"]
        )
    named = with_file_name(numbered)

    matched, unmatched = registry_lookup(named, registry)
    if ingested is not None:
        matched = anti_join_ingested(matched, ingested, "file_id")

    formatted = matched.withColumn(
        "text",
        reformat_doc(
            F.col("title"), F.col("pub_time"), F.col("source"), F.col("content")
        ),
    ).select("file_id", "file_name", "source", "text")

    chunks = chunk_recursive(
        formatted, "text", cfg.chunk_size, cfg.overlap
    ).withColumnRenamed("chunk", "content")

    embedded = embed_text(
        chunks, "content", cfg.client_kind, cfg.dense_dim, hybrid=True,
        mock_cost_floor_s=cfg.mock_cost_floor_s,
    )

    ph = cfg.placeholders
    final = embedded.select(
        F.lit(ph["qa_id"]).cast("long").alias("qa_id"),
        F.lit(ph["question"]).alias("question"),
        F.lit(ph["answer"]).alias("answer"),
        F.col("file_id").cast("long"),
        F.col("block_id").cast("long"),
        "file_name",
        "content",
        "dense_embedding",
        "sparse_embedding",
        F.coalesce(F.col("source"), F.lit("")).alias("source"),
        F.lit(ph["flag"]).alias("flag"),
    ).select(*CANONICAL_ORDER)

    return final, unmatched


def ingest_with_quarantine(
    docs: DataFrame,
    registry: DataFrame,
    ingested: DataFrame | None = None,
    config: IngestConfig | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Ingest with the row-level quarantine promised in SURVEY §7:
    the reference poisons a whole batch when any row breaks the
    VARCHAR contract (embed_to_milvus.py:107-109, schema.verify at
    :256); here violating CHUNK rows route to a quarantine output and
    the clean rows flow on. Returns (chunks, unmatched, quarantined).
    """
    from ..schemas import VARCHAR_LIMITS

    chunks, unmatched = ingest(docs, registry, ingested, config)
    pred = F.lit(False)
    for c, lim in VARCHAR_LIMITS.items():
        if c in chunks.columns:
            pred = pred | (F.length(F.col(c)) > lim)
    # A NULL in any limited column makes the raw predicate NULL, which
    # both filter(pred) and filter(~pred) would drop — route every row
    # to exactly one side by treating NULL as "no violation".
    pred = F.coalesce(pred, F.lit(False))
    return (
        chunks.filter(~pred),
        unmatched,
        chunks.filter(pred),
    )


def ingest_incremental(
    old_docs: DataFrame,
    new_docs: DataFrame,
    registry: DataFrame,
    id_col: str = "doc_id",
    config: IngestConfig | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Snapshot-diff-driven incremental ingest: chunk + embed ONLY the
    docs that are new or whose (title, content) changed, and report
    what to delete. The reference re-reads and re-embeds the whole
    corpus every run (embed_to_milvus.py:60-150); at 100 TB the
    embedding boundary is the cost center, so re-embedding the ~0.1%
    that changed instead of everything is the difference between an
    hourly and a quarterly refresh.

    Returns (chunks, unmatched, deletions): ``chunks`` is the standard
    ingest output restricted to added/changed docs; ``deletions`` is
    (<id_col>, change) for removed AND changed docs — delete their old
    chunks from the store (``delete_where``/``merge_upsert``) before
    loading the new ones, making the pair idempotent.

    Scale shape: the diff reduces both snapshots map-side to
    (id, md5(title+content)) — one full-outer join on id; the
    to-ingest set then left-semi joins ``new_docs`` on id, and the
    expensive chunk/embed plan runs only on that small side.
    """
    from ..operators.joins import snapshot_diff

    snap_key = F.concat_ws(
        "\x1f",
        F.coalesce(F.col("title"), F.lit("")),
        F.coalesce(F.col("content"), F.lit("")),
    )
    diff = snapshot_diff(
        old_docs.select(F.col(id_col), snap_key.alias("__snap")),
        new_docs.select(F.col(id_col), snap_key.alias("__snap")),
        id_col=id_col,
        text_col="__snap",
    ).withColumnRenamed("doc_id", "__diff_id")
    to_ingest_ids = diff.filter(
        F.col("change").isin("added", "changed")
    ).select("__diff_id")
    # broadcast: the changed-id set is small by the diff's own
    # contract (~0.1% of ids), while new_docs is corpus-sized — a
    # sort-merge semi join here would shuffle the whole new snapshot
    # just to select the small subset
    to_ingest = new_docs.join(
        F.broadcast(to_ingest_ids),
        new_docs[id_col] == F.col("__diff_id"),
        "left_semi",
    )
    chunks, unmatched = ingest(to_ingest, registry, config=config)
    deletions = diff.filter(
        F.col("change").isin("removed", "changed")
    ).select(F.col("__diff_id").alias(id_col), "change")
    return chunks, unmatched, deletions

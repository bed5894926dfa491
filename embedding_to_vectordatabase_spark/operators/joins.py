"""Relational joins replacing the reference's per-row remote lookups.

Reference parity (SURVEY §2.3): every join in the reference is a
nested-loop over the network — one MySQL SELECT per document
(embed_to_milvus.py:81-85, vector_database/mysql_connector.py:40-57)
and one Milvus existence query per document (embed_to_milvus.py:87-89,
vector_database/milvus_connector.py:155-165). Here they become single
relational joins: the dimension side is broadcast (registry tables are
a few GB even at 100 TB corpus scale), so the fact side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def registry_lookup(
    docs: DataFrame,
    registry: DataFrame,
    doc_key: str = "file_name",
    reg_key: str = "name",
    reg_id: str = "id",
) -> tuple[DataFrame, DataFrame]:
    """J1: attach the registry id to each doc via broadcast left join.

    Returns (matched, unmatched); unmatched is the warn/drop side
    output the reference logged per-row (embed_to_milvus.py:82-85).
    """
    dim = F.broadcast(
        registry.select(
            F.col(reg_key).alias("__reg_name"),
            F.col(reg_id).alias("file_id"),
        )
    )
    joined = docs.join(
        dim, docs[doc_key] == dim["__reg_name"], "left"
    ).drop("__reg_name")
    matched = joined.filter(F.col("file_id").isNotNull())
    unmatched = joined.filter(F.col("file_id").isNull()).drop("file_id")
    return matched, unmatched


def anti_join_ingested(
    docs: DataFrame, ingested: DataFrame, key: str = "file_id"
) -> DataFrame:
    """J2: drop docs whose key already exists in the sink snapshot —
    the idempotency gate that makes re-runs no-ops (ST3/ST4)."""
    return docs.join(
        ingested.select(key).distinct(), on=key, how="left_anti"
    )


def kb_scoped_registry(
    registry: DataFrame, kb_id: int, kb_col: str = "konwledge_base_id"
) -> DataFrame:
    """J3: registry rows for one knowledge base, ordered by id
    (vector_database/mysql_connector.py:58-76). The filter pushes down
    to the JDBC/parquet source."""
    return registry.filter(F.col(kb_col) == F.lit(kb_id)).orderBy("id")

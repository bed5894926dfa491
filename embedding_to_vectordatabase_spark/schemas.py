"""Canonical schemas.

Reference parity:
- DOC      — JSONL corpus record (reference load_data/generate_jsonl.py:6-11)
- REGISTRY — MySQL ``knowledge_document_library`` dimension
             (reference vector_database/mysql_connector.py:48,66; the typo
             column name ``konwledge_base_id`` is the real column — kept)
- CHUNK    — the 12-field collection schema
             (reference embed_to_milvus.py:244-255,
              vector_database/milvus_connector.py:50-63)
- EMBEDDING output struct for the dense+sparse embedder
             (reference baai_m3_simple_server/m3_server.py:27-39)

Spark choices: dense vector = array<float> (fixed 1024 by contract),
sparse vector = map<int,float> — convertible to MLlib SparseVector for
LSH paths. VARCHAR(max_length) has no Spark runtime enforcement; see
``varchar_violations`` for the validation expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DENSE_DIM = 1024

DOC_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType(), True),
        T.StructField("pub_time", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)

REGISTRY_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        # real column name contains this typo in the reference DB — keep it
        T.StructField("konwledge_base_id", T.LongType(), True),
        T.StructField("file_info_url", T.StringType(), True),
    ]
)

# VARCHAR max lengths from the reference collection DDL
# (embed_to_milvus.py:244-255); enforced via varchar_violations().
VARCHAR_LIMITS = {
    "question": 2000,
    "answer": 20000,
    "file_name": 65535,
    "content": 65535,
    "source": 65535,
    "flag": 100,
}

CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), True),  # sink-assigned (auto_id)
        T.StructField("qa_id", T.LongType(), False),
        T.StructField("question", T.StringType(), False),
        T.StructField("answer", T.StringType(), False),
        T.StructField("file_id", T.LongType(), False),
        T.StructField("block_id", T.LongType(), False),
        T.StructField("file_name", T.StringType(), False),
        T.StructField("content", T.StringType(), False),
        T.StructField(
            "dense_embedding", T.ArrayType(T.FloatType(), False), False
        ),
        T.StructField(
            "sparse_embedding",
            T.MapType(T.IntegerType(), T.FloatType(), False),
            False,
        ),
        T.StructField("source", T.StringType(), False),
        T.StructField("flag", T.StringType(), False),
    ]
)

EMBED_OUTPUT_STRUCT = T.StructType(
    [
        T.StructField("dense", T.ArrayType(T.FloatType(), False), False),
        T.StructField(
            "sparse", T.MapType(T.IntegerType(), T.FloatType(), False), False
        ),
    ]
)


def varchar_violations(df: DataFrame) -> DataFrame:
    """Rows exceeding the reference's VARCHAR(max_length) contract.

    Spark has no VARCHAR runtime enforcement, so the fixed-schema
    ``schema.verify()`` step of the reference (embed_to_milvus.py:256)
    becomes this validation expression; route hits to quarantine.
    """
    conds = [
        F.length(F.col(c)) > lim
        for c, lim in VARCHAR_LIMITS.items()
        if c in df.columns
    ]
    if not conds:
        return df.limit(0)
    pred = conds[0]
    for c in conds[1:]:
        pred = pred | c
    return df.filter(pred)

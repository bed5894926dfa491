"""Sources: JSONL scan with explicit schema (S1), inclusive row range
(S2 — the intended semantics, NOT the reference's polars slice bug),
whole-file scan (S5), synthetic generator (S10)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from embedding_to_vectordatabase_spark.schemas import DOC_SCHEMA
from embedding_to_vectordatabase_spark.sources.corpus import (
    generate_corpus,
    read_jsonl,
    read_whole_files,
    row_range,
    with_row_numbers,
)


def test_read_jsonl_explicit_schema(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    with open(p, "w") as f:
        f.write(json.dumps({"title": "t1", "pub_time": "2025-01-01",
                            "source": "s", "content": "c1"}) + "\n")
        # extra field ignored, missing field -> null (no inference)
        f.write(json.dumps({"title": "t2", "content": "c2", "junk": 1}) + "\n")
    df = read_jsonl(spark, str(p))
    assert df.schema == DOC_SCHEMA
    rows = {r["title"]: r for r in df.collect()}
    assert rows["t1"]["content"] == "c1"
    assert rows["t2"]["pub_time"] is None
    assert "junk" not in df.columns


def test_row_range_inclusive_1based(spark):
    df = with_row_numbers(
        generate_corpus(spark, 30), ["title", "content"]
    )
    got = row_range(df, 5, 9)
    nums = sorted(r["row_no"] for r in got.collect())
    assert nums == [5, 6, 7, 8, 9]  # docstring semantics, both ends in


def test_read_whole_files(spark, tmp_path):
    for i in range(3):
        (tmp_path / f"f{i}.txt").write_text(f"hello 文件 {i}")
    df = read_whole_files(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 3
    assert all(r["word_count"] == len(r["content"]) for r in rows)
    assert {r["content"][-1] for r in rows} == {"0", "1", "2"}


def test_jdbc_registry_roundtrip_and_pushdown(spark):
    """S7-S9 for real: the registry as ONE JDBC relation (embedded
    Derby — the same driver family a MySQL deployment would swap in),
    with the KB-scope filter pushed down to the database."""
    from embedding_to_vectordatabase_spark.operators.joins import (
        kb_scoped_registry,
        registry_lookup,
    )
    from embedding_to_vectordatabase_spark.sources.corpus import (
        read_registry_jdbc,
    )

    url = "jdbc:derby:memory:regtest;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    reg = spark.createDataFrame(
        [
            (1, "a.pdf", 7, "hdfs://x/a"),
            (2, "b.pdf", 7, "hdfs://x/b"),
            (3, "c.pdf", 9, "hdfs://x/c"),
        ],
        "id long, name string, konwledge_base_id long, file_info_url string",
    )
    (
        reg.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "knowledge_document_library")
        .option("driver", driver)
        .mode("overwrite")
        .save()
    )
    back = read_registry_jdbc(spark, url, driver=driver)
    assert back.count() == 3

    scoped = kb_scoped_registry(back, 7)
    assert [r["id"] for r in scoped.collect()] == [1, 2]
    plan = scoped._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "konwledge_base_id" in plan

    # J1 against the JDBC dimension: broadcast join, split outputs
    docs = spark.createDataFrame(
        [(10, "a.pdf"), (11, "zzz.pdf")], "doc_id long, file_name string"
    )
    matched, unmatched = registry_lookup(docs, back)
    assert [r["file_id"] for r in matched.collect()] == [1]
    assert [r["doc_id"] for r in unmatched.collect()] == [11]


def test_generate_corpus_shape(spark):
    df = generate_corpus(spark, 7)
    assert df.columns == ["title", "pub_time", "source", "content"]
    assert df.count() == 7
    assert df.filter(F.col("title") == "Title 0").count() == 1

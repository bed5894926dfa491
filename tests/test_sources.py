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


def test_generate_corpus_shape(spark):
    df = generate_corpus(spark, 7)
    assert df.columns == ["title", "pub_time", "source", "content"]
    assert df.count() == 7
    assert df.filter(F.col("title") == "Title 0").count() == 1

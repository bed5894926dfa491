"""Chunking goldens: recursive splitter boundary/overlap semantics
(RecursiveCharacterTextSplitter keep_separator=False parity per
splite_text/lang_chain_splitter.py:7-30), fixed windows, sentence
split, semantic segmentation."""

from __future__ import annotations

from pyspark.sql import functions as F

from embedding_to_vectordatabase_spark.operators.chunking import (
    chunk_fixed,
    chunk_recursive,
    semantic_chunk_documents,
    split_sentences,
    split_text_recursive,
)


class TestSplitTextRecursive:
    def test_empty(self):
        assert split_text_recursive("") == []
        assert split_text_recursive(None) == []

    def test_short_text_single_chunk(self):
        assert split_text_recursive("hello world", 100, 10) == ["hello world"]

    def test_separator_dropped_and_rejoined(self):
        # keep_separator=False: pieces split on 。 then rejoined WITH 。
        # while under the budget (separator length counted)
        out = split_text_recursive("aa。bb。cc", 8, 0)
        assert out == ["aa。bb。cc"]  # 8 chars, fits exactly
        out = split_text_recursive("aa。bb。cc", 5, 0)
        assert out == ["aa。bb", "cc"]

    def test_overlap_carries_tail_pieces(self):
        out = split_text_recursive("aaa。bbb。ccc。ddd", 8, 3)
        # merge runs: [aaa,bbb] then overlap carries bbb into next chunk
        assert out == ["aaa。bbb", "bbb。ccc", "ccc。ddd"]

    def test_unsplittable_run_passes_through_whole(self):
        # reference parity: the separator list has no "" fallback, so a
        # run containing no separator is emitted oversized, exactly as
        # RecursiveCharacterTextSplitter does with that separator list
        out = split_text_recursive("x" * 25, 10, 0)
        assert out == ["x" * 25]

    def test_empty_separator_enables_char_fallback(self):
        # opting into the "" terminal separator restores hard-wrapping
        out = split_text_recursive(
            "x" * 25, 10, 0, separators=["。", ""]
        )
        assert out == ["x" * 10, "x" * 10, "x" * 5]

    def test_separator_priority_order(self):
        # "\n" ranks above "。" so the newline split happens first
        out = split_text_recursive("aa。bb\ncc。dd", 6, 0)
        assert out == ["aa。bb", "cc。dd"]

    def test_chunks_respect_budget(self):
        text = "word " * 200
        for c in split_text_recursive(text, 50, 10):
            assert len(c) <= 50

    def test_production_config_3200_100(self):
        """The reference's deployed config (config.json:60-63:
        chunk_size=3200, overlap=100) — merge-dominated: many small
        paragraphs rejoin under the 3200 budget, and the 100-char
        overlap carries whole trailing pieces, so consecutive chunks
        share a suffix/prefix."""
        # ~7800 chars of 97-char lines ("\n" is the reference's
        # paragraph separator - SEPARATORS has no "\n\n") -> 3 chunks
        paras = [f"para {i:03d} " + "x" * 88 for i in range(80)]
        text = "\n".join(paras)
        chunks = split_text_recursive(text, 3200, 100)
        assert len(chunks) == 3
        for c in chunks:
            assert len(c) <= 3200
        # every paragraph survives somewhere
        joined = "\n".join(chunks)
        for p in paras:
            assert p in joined
        # overlap: each next chunk starts with the previous chunk's
        # trailing piece (the <=100-char carry: one 97-char line)
        for prev, nxt in zip(chunks, chunks[1:]):
            head = nxt.split("\n")[0]
            assert len(head) <= 100
            assert prev.endswith(head)
        # a doc under the budget returns itself - the common corpus
        # case at the prod config
        assert split_text_recursive("short doc", 3200, 100) == ["short doc"]


def test_chunk_recursive_dataframe(spark):
    df = spark.createDataFrame(
        [(1, "aaa。bbb。ccc。ddd"), (2, ""), (3, None)],
        "doc_id long, content string",
    )
    out = chunk_recursive(df, "content", 8, 3).collect()
    # empty/null docs yield 0 rows (embed_to_milvus.py:93,101-103)
    assert {r["doc_id"] for r in out} == {1}
    assert [r["chunk"] for r in sorted(out, key=lambda r: r["block_id"])] == [
        "aaa。bbb", "bbb。ccc", "ccc。ddd",
    ]
    assert [r["block_id"] for r in sorted(out, key=lambda r: r["block_id"])] == [0, 1, 2]


def test_chunk_fixed_windows(spark):
    df = spark.createDataFrame([(1, "abcdefghij")], "doc_id long, content string")
    out = sorted(
        chunk_fixed(df, "content", chunk_size=4, overlap=2).collect(),
        key=lambda r: r["block_id"],
    )
    # stride 2: windows starting at 0,2,4,6,8 -> last full window covers the end
    chunks = [r["chunk"] for r in out]
    assert chunks[0] == "abcd"
    assert chunks[1] == "cdef"
    assert "".join(c[:2] for c in chunks) + chunks[-1][2:] == "abcdefghij"


def test_split_sentences_ids_are_dense(spark):
    df = spark.createDataFrame(
        [(1, "第一句。第二句！第三句？tail")], "doc_id long, content string"
    )
    out = sorted(
        split_sentences(df, "content").collect(), key=lambda r: r["sentence_id"]
    )
    assert [r["sentence_id"] for r in out] == [0, 1, 2, 3]
    assert out[0]["sentence"] == "第一句。"
    assert out[-1]["sentence"] == "tail"


def test_semantic_chunking_end_to_end(spark):
    df = spark.createDataFrame(
        [(1, "猫吃鱼。猫喝水。股市大涨。股市大跌。")],
        "doc_id long, text string",
    )
    out = semantic_chunk_documents(
        df, "text", "doc_id", dim=16, threshold_amount=0.5
    ).collect()
    # all sentences survive, concatenated in order within segments
    joined = "".join(
        r["chunk"] for r in sorted(out, key=lambda r: r["segment_id"])
    )
    assert joined == "猫吃鱼。猫喝水。股市大涨。股市大跌。"
    assert len(out) >= 2  # the 0.5-percentile threshold forces breaks


def test_semantic_number_of_chunks_override(spark):
    df = spark.createDataFrame(
        [(1, "一句。二句。三句。四句。五句。六句。")],
        "doc_id long, text string",
    )
    out = semantic_chunk_documents(
        df, "text", "doc_id", dim=16, number_of_chunks=3
    ).collect()
    assert len(out) == 3  # top-2 distances become the breakpoints
    joined = "".join(
        r["chunk"] for r in sorted(out, key=lambda r: r["segment_id"])
    )
    assert joined == "一句。二句。三句。四句。五句。六句。"


def test_semantic_min_chunk_size_merges_forward(spark):
    df = spark.createDataFrame(
        [(1, "短。句。子。很。多。的。文。档。")], "doc_id long, text string"
    )
    out = semantic_chunk_documents(
        df, "text", "doc_id", dim=16,
        threshold_amount=0.1,       # break nearly everywhere
        min_chunk_size=6,
    ).collect()
    chunks = [r["chunk"] for r in sorted(out, key=lambda r: r["segment_id"])]
    assert "".join(chunks) == "短。句。子。很。多。的。文。档。"
    # all but possibly the last merged chunk meet the minimum
    assert all(len(c) >= 6 for c in chunks[:-1])


def test_semantic_gradient_threshold_runs(spark):
    df = spark.createDataFrame(
        [(1, "a b。c d。e f。g h。i j。")], "doc_id long, text string"
    )
    out = semantic_chunk_documents(
        df, "text", "doc_id", dim=16,
        threshold_type="gradient", threshold_amount=0.5,
    ).collect()
    joined = "".join(
        r["chunk"] for r in sorted(out, key=lambda r: r["segment_id"])
    )
    assert joined == "a b。c d。e f。g h。i j。"


def test_semantic_buffer_size_zero_vs_one_differ_only_in_grouping(spark):
    df = spark.createDataFrame(
        [(1, "猫吃鱼。猫喝水。股市大涨。股市大跌。")],
        "doc_id long, text string",
    )
    for buf in (0, 1, 2):
        out = semantic_chunk_documents(
            df, "text", "doc_id", dim=16, buffer_size=buf
        ).collect()
        joined = "".join(
            r["chunk"] for r in sorted(out, key=lambda r: r["segment_id"])
        )
        assert joined == "猫吃鱼。猫喝水。股市大涨。股市大跌。"


def test_semantic_chunk_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "a b c。 d e f。 g h i。")], "doc_id long, text string"
    )
    a = semantic_chunk_documents(df, "text", "doc_id", dim=16).collect()
    b = semantic_chunk_documents(df, "text", "doc_id", dim=16).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

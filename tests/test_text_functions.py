"""Golden tests for the native text scalar functions (SURVEY §5:
clean_title CJK/truncate/untitled cases from util/clean_data.py:3-9,
cast_sparse_keys bad-key from util/clean_data.py:28-40)."""

from __future__ import annotations

from pyspark.sql import functions as F

from embedding_to_vectordatabase_spark.functions.text import (
    cast_sparse_keys,
    clean_title,
    derive_file_name,
    reformat_doc,
    swap_extension,
    token_count,
    word_count,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def _title(spark, s):
    return spark.createDataFrame([(s,)], "t string").select(
        clean_title(F.col("t")).alias("v")
    ).first()["v"]


class TestCleanTitle:
    def test_cjk_kept_punct_stripped(self, spark):
        # the reference's own smoke case shape (clean_data.py:42-44)
        assert _title(spark, "《新闻 标题》2024!") == "新闻标题2024"

    def test_ascii_alnum_kept(self, spark):
        assert _title(spark, "  Hello, World! 42  ") == "HelloWorld42"

    def test_truncates_to_50(self, spark):
        out = _title(spark, "x" * 80)
        assert out == "x" * 50

    def test_untitled_fallbacks(self, spark):
        assert _title(spark, "") == "untitled"
        assert _title(spark, "!!! ---") == "untitled"
        assert _title(spark, None) == "untitled"


class TestReformat:
    def test_full_template(self, spark):
        out = _one(
            spark,
            reformat_doc(
                F.lit("T"), F.lit("2024"), F.lit("S"), F.lit("body")
            ),
        )
        assert out == "[标题]:T\n[时间]:2024\n[来源]:S\n\nbody"

    def test_defaults_for_missing(self, spark):
        null = F.lit(None).cast("string")
        out = _one(spark, reformat_doc(null, null, null, null))
        assert out == "[标题]:无标题\n[时间]:无时间\n[来源]:无来源\n\n无内容"


class TestSparseKeyCast:
    def test_good_keys_cast(self, spark):
        df = spark.sql(
            "SELECT map('1', CAST(0.5 AS FLOAT), '42', CAST(1.0 AS FLOAT)) AS m"
        )
        out = df.select(cast_sparse_keys(F.col("m")).alias("v")).first()["v"]
        assert out == {1: 0.5, 42: 1.0}

    def test_bad_key_nulls_row_not_batch(self, spark):
        df = spark.sql(
            "SELECT 1 AS id, map('1', CAST(0.5 AS FLOAT)) AS m "
            "UNION ALL SELECT 2, map('oops', CAST(0.5 AS FLOAT))"
        )
        rows = {
            r["id"]: r["v"]
            for r in df.select(
                "id", cast_sparse_keys(F.col("m")).alias("v")
            ).collect()
        }
        assert rows[1] == {1: 0.5}  # good row survives (no batch poisoning)
        assert rows[2] is None


def test_file_name_and_extension(spark):
    df = spark.createDataFrame([("我的 文档!", 7)], "t string, n long")
    name = df.select(
        derive_file_name(F.col("t"), F.col("n")).alias("v")
    ).first()["v"]
    assert name == "我的文档_7.pdf"
    out = df.select(
        swap_extension(F.lit("我的文档_7.pdf")).alias("v")
    ).first()["v"]
    assert out == "我的文档_7.txt"


def test_word_and_token_count(spark):
    df = spark.createDataFrame(
        [("你好世界", 4, 1), ("a  b\tc", 6, 3), ("", 0, 0), ("  ", 2, 0)],
        "t string, wc long, tc long",
    )
    bad = df.select(
        "wc", "tc",
        word_count(F.col("t")).alias("w"),
        token_count(F.col("t")).alias("k"),
    ).where((F.col("w") != F.col("wc")) | (F.col("k") != F.col("tc")))
    assert bad.count() == 0


def test_bpe_token_count_pretokenizer_units(spark):
    """GPT-2-style pretokenizer counts: contraction suffix, space-
    prefixed word/number/punct runs, unicode letters; null/empty safe."""
    from embedding_to_vectordatabase_spark.functions.text import (
        bpe_token_count,
    )

    rows = [
        (1, "it's a test-case, 42 tokens!"),
        (2, ""),
        (3, None),
        (4, "héllo wörld 3.14"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", bpe_token_count(F.col("text")).alias("n")
        ).collect()
    }
    # it|'s| a| test|-|case|,| 42| tokens|! -> 10
    assert got == {1: 10, 2: 0, 3: 0, 4: 5}


def test_dup_line_stats_golden(spark):
    from pyspark.sql import functions as F

    from embedding_to_vectordatabase_spark.operators.textanalysis import (
        dup_line_stats,
    )

    rows = [
        # a,b,a,ccc,ccc (blank line dropped): 5 lines, 3 distinct,
        # dup chars a+a+ccc+ccc = 8 of 9
        (1, "a\nb\na\n \nccc\nccc"),
        (2, "x\ny\nz"),          # all distinct
        (3, ""),                  # empty
        (4, None),                # NULL text
        (5, "same\nsame\nsame"),  # everything duplicated
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (
            r["n_lines"],
            r["dup_line_frac"],
            r["dup_line_char_frac"],
        )
        for r in dup_line_stats(df, F.col("text")).collect()
    }
    assert out[1] == (5, 0.4, round(8 / 9, 6))
    assert out[2] == (3, 0.0, 0.0)
    assert out[3] == (0, 0.0, 0.0)
    assert out[4] == (0, 0.0, 0.0)
    assert out[5] == (3, round(2 / 3, 6), 1.0)


def test_dup_ngram_stats_counts_and_fractions(spark):
    from pyspark.sql import functions as F

    from embedding_to_vectordatabase_spark.operators.textanalysis import (
        dup_ngram_stats,
    )

    rows = [
        (1, "a b a b a b"),      # bigrams: 'a b' x3, 'b a' x2
        (2, "w x y z"),           # all bigrams unique
        (3, "solo"),              # fewer than n tokens
        (4, None),                # null text
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in dup_ngram_stats(df, F.col("text"), n=2).collect()
    }
    r1 = got[1]
    assert r1["n_ngrams"] == 5
    assert r1["top_ngram_count"] == 3
    # 'a b' mass 3*3=9 over total mass 9+6=15
    assert abs(r1["top_ngram_frac"] - 0.6) < 1e-9
    assert r1["dup_ngram_frac"] == 1.0
    r2 = got[2]
    assert r2["n_ngrams"] == 3
    assert r2["top_ngram_count"] == 1
    assert r2["dup_ngram_frac"] == 0.0
    for d in (3, 4):
        assert got[d]["n_ngrams"] == 0
        assert got[d]["top_ngram_count"] == 0
        assert got[d]["top_ngram_frac"] == 0.0


def test_dup_ngram_stats_tie_breaks_lexicographic(spark):
    from pyspark.sql import functions as F

    from embedding_to_vectordatabase_spark.operators.textanalysis import (
        dup_ngram_stats,
    )

    # 'z z' and 'a a' both occur twice: smallest-lex 'a a' must win
    df = spark.createDataFrame(
        [(1, "z z z a a a")], "doc_id long, text string"
    )
    r = dup_ngram_stats(df, F.col("text"), n=2).collect()[0]
    assert r["top_ngram_count"] == 2
    # 'a a' mass 2*3=6; total: 'z z'x2(6) + 'z a'(3) + 'a a'x2(6) = 15
    assert abs(r["top_ngram_frac"] - 0.4) < 1e-9


def test_c4_quality_signals_values(spark):
    from pyspark.sql import functions as F

    from embedding_to_vectordatabase_spark.operators.textanalysis import (
        c4_quality_signals,
    )

    rows = [
        (1, 'Good sentence one.\nAnother full line!\nnav'),
        (2, 'var x = { a: 1 }'),
        (3, 'Lorem Ipsum dolor sit amet.'),
        (4, ''),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in c4_quality_signals(df, F.col("text")).collect()
    }
    r1 = got[1]
    assert r1["n_words"] == 7
    assert r1["n_sentences"] == 3  # '.', '!' split; 'nav' tail counts
    # 2 of 3 lines end in terminal punct; 'nav' (1 word) is short
    assert abs(r1["terminal_punct_line_frac"] - 2 / 3) < 1e-6
    assert abs(r1["short_line_frac"] - 1 / 3) < 1e-6
    assert abs(r1["mean_words_per_line"] - 7 / 3) < 1e-6
    assert not r1["has_curly_brace"]
    assert got[2]["has_curly_brace"]
    assert got[3]["has_lorem_ipsum"]
    for d in (4, 5):
        assert got[d]["n_words"] == 0
        assert got[d]["terminal_punct_line_frac"] == 0.0
        assert got[d]["mean_words_per_line"] == 0.0


def test_c4_terminal_punct_allows_closing_quotes(spark):
    from pyspark.sql import functions as F

    from embedding_to_vectordatabase_spark.operators.textanalysis import (
        c4_quality_signals,
    )

    df = spark.createDataFrame(
        [(1, 'He said "stop."\nplain line')], "doc_id long, text string"
    )
    r = c4_quality_signals(df, F.col("text")).collect()[0]
    assert abs(r["terminal_punct_line_frac"] - 0.5) < 1e-6


def test_variant_parse_once_extract_typed(spark):
    """VARIANT path: try_parse_json parses once; typed try_variant_get
    extractions are NULL-safe on malformed JSON, missing paths, and
    uncastable values — never task-killing errors."""
    from pyspark.sql import functions as F

    from embedding_to_vectordatabase_spark.functions.text import (
        parse_props_variant,
        variant_field,
    )

    rows = [
        (1, '{"k": 42, "tag": "a"}'),
        (2, '{"tag": "b"}'),          # missing k
        (3, 'not json at all'),       # malformed -> NULL variant
        (4, '{"k": "noncast"}'),      # k present, not castable to int
    ]
    df = spark.createDataFrame(rows, "event_id long, props string")
    v = parse_props_variant(F.col("props"))
    out = {
        r["event_id"]: (r["k"], r["tag"])
        for r in df.select(
            "event_id",
            variant_field(v, "k", "bigint").alias("k"),
            variant_field(v, "tag", "string").alias("tag"),
        ).collect()
    }
    assert out[1] == (42, "a")
    assert out[2] == (None, "b")
    assert out[3] == (None, None)
    assert out[4] == (None, None)


def test_variant_parquet_roundtrip(spark, tmp_path):
    """The parse-once-at-ingest contract the docstring promises: a
    VARIANT column persists to parquet and reads back with the same
    typed extractions — so downstream queries pay a binary path walk,
    never a JSON re-parse (functions/text.py:parse_props_variant)."""
    from embedding_to_vectordatabase_spark.functions.text import (
        parse_props_variant,
        variant_field,
        variant_path,
    )

    df = spark.createDataFrame(
        [
            (1, '{"k": 7, "meta": {"t": "x"}, "vals": [1, 2]}'),
            (2, '{"k": -3, "meta": {"t": "y"}, "vals": []}'),
            (3, "broken {"),
            (4, None),
        ],
        "id long, props string",
    )
    staged = df.select(
        "id", parse_props_variant(F.col("props")).alias("v")
    )
    path = str(tmp_path / "variant_roundtrip")
    staged.write.parquet(path)
    back = spark.read.parquet(path)
    assert back.schema["v"].dataType.simpleString() == "variant"

    def extract(d):
        return {
            r["id"]: (r["k"], r["t"])
            for r in d.select(
                "id",
                variant_field(F.col("v"), "k", "bigint").alias("k"),
                variant_path(F.col("v"), "$.meta.t", "string").alias("t"),
            ).collect()
        }

    pre, post = extract(staged), extract(back)
    assert pre == post
    assert post[1] == (7, "x") and post[2] == (-3, "y")
    assert post[3] == (None, None) and post[4] == (None, None)


def test_variant_nested_paths_and_typed_arrays(spark):
    """variant_path walks nested objects and array indices;
    variant_array_field lands a REAL array<bigint> usable by native
    array functions; missing paths and type mismatches are NULL."""
    from embedding_to_vectordatabase_spark.functions.text import (
        parse_props_variant,
        variant_array_field,
        variant_path,
    )
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, '{"a": {"b": [10, 20, 30]}, "s": "txt"}')],
        "id long, j string",
    )
    v = parse_props_variant(F.col("j"))
    row = df.select(
        variant_path(v, "$.a.b[1]", "bigint").alias("b1"),
        variant_path(v, "$.a.missing", "bigint").alias("miss"),
        variant_path(v, "$.s", "bigint").alias("badcast"),
        variant_array_field(v, "$.a.b", "bigint").alias("arr"),
        F.size(variant_array_field(v, "$.a.b", "bigint")).alias("n"),
    ).first()
    assert row["b1"] == 20
    assert row["miss"] is None and row["badcast"] is None
    assert row["arr"] == [10, 20, 30] and row["n"] == 3
    with _pytest.raises(ValueError, match="must start with"):
        variant_path(v, "a.b")

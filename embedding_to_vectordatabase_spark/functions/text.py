"""Text scalar functions — all native Column expressions (whole-stage
codegen; no Python in the hot path).

Reference parity:
- clean_title        util/clean_data.py:3-9
- reformat_doc       util/clean_data.py:11-26 + embed_to_milvus.py:91
- derive_file_name   load_data/json_batch_reader.py:67-74
- word_count         load_data/hdfs_batch_reader.py:112
- cast_sparse_keys   util/clean_data.py:28-40 (batch-poisoning semantics
                     replaced by row-level null-routing; SURVEY §7)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# chars to KEEP: CJK unified ideographs, ASCII letters, digits
_CLEAN_TITLE_STRIP = r"[^一-龥a-zA-Z0-9]"
CLEAN_TITLE_MAX = 50

# reformat defaults (util/clean_data.py:16-25)
DEFAULT_TITLE = "无标题"
DEFAULT_TIME = "无时间"
DEFAULT_CONTENT = "无内容"
DEFAULT_SOURCE = "无来源"


def clean_title(title: Column) -> Column:
    """Strip everything but CJK/ASCII-alnum, truncate to 50 chars,
    fall back to 'untitled' when nothing survives."""
    stripped = F.regexp_replace(F.trim(title), _CLEAN_TITLE_STRIP, "")
    cut = F.substring(stripped, 1, CLEAN_TITLE_MAX)
    return F.when(
        title.isNull() | (F.length(cut) == 0), F.lit("untitled")
    ).otherwise(cut)


def reformat_doc(
    title: Column, pub_time: Column, source: Column, content: Column
) -> Column:
    """'[标题]:{t}\\n[时间]:{p}\\n[来源]:{s}\\n\\n{content}' with the
    reference's per-field defaults for missing values."""
    return F.format_string(
        "[标题]:%s\n[时间]:%s\n[来源]:%s\n\n%s",
        F.coalesce(title, F.lit(DEFAULT_TITLE)),
        F.coalesce(pub_time, F.lit(DEFAULT_TIME)),
        F.coalesce(source, F.lit(DEFAULT_SOURCE)),
        F.coalesce(content, F.lit(DEFAULT_CONTENT)),
    )


def derive_file_name(title: Column, row_no: Column, ext: str = ".pdf") -> Column:
    """file_name = clean_title(title) + '_' + global_row_no + ext."""
    return F.concat(
        clean_title(title), F.lit("_"), row_no.cast("string"), F.lit(ext)
    )


def word_count(content: Column) -> Column:
    return F.length(content)


def swap_extension(path: Column, old: str = r"\.pdf$", new: str = ".txt") -> Column:
    """HDFS reader's .pdf→.txt swap (load_data/hdfs_batch_reader.py:99-102)."""
    return F.regexp_replace(path, old, new)


def cast_sparse_keys(m: Column) -> Column:
    """map<string,float> → map<int,float>; a non-castable key nulls the
    ROW (try_cast), not the whole batch — divergence from the
    reference's batch-poisoning documented in SURVEY §7."""
    bad = F.exists(
        F.map_keys(m), lambda k: k.try_cast("int").isNull()
    )
    return F.when(m.isNull() | bad, F.lit(None)).otherwise(
        F.transform_keys(m, lambda k, v: k.cast("int"))
    )


def token_count(text: Column) -> Column:
    """Whitespace token count; empty/null-safe."""
    trimmed = F.trim(F.coalesce(text, F.lit("")))
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


# GPT-2-style pretokenizer pattern, restricted to the RE2-compatible
# subset (no lookahead) so Java (Spark) and RE2 (DuckDB/Go tooling)
# engines match identically: contraction suffixes, letter runs, digit
# runs, punctuation runs (each optionally space-prefixed), whitespace
# runs. A budget ESTIMATOR for LLM token accounting — a real
# tokenizer's merges happen offline; this per-row count stays inside
# whole-stage codegen.
BPE_TOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)"
    r"| ?\p{L}+"
    r"| ?\p{N}+"
    r"| ?[^\s\p{L}\p{N}]+"
    r"|\s+"
)


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: matches of the GPT-2-style pretokenizer
    pattern (the unit real BPE merges start from); empty/null-safe."""
    t = F.coalesce(text, F.lit(""))
    return F.size(F.regexp_extract_all(t, F.lit(BPE_TOKEN_PATTERN), 0))


def json_field(col: Column, path: str) -> Column:
    """Extract one field from a JSON string column as a string —
    native `get_json_object` (whole-stage codegen'd JVM parse; no
    Python, no schema declaration needed for ad-hoc props columns
    like the events table's `{"k": 69}`). Returns NULL for missing
    field or malformed JSON. ``path`` is the bare field name."""
    return F.get_json_object(col, f"$.{path}")


def json_int_field(col: Column, path: str) -> Column:
    """`json_field` as bigint — try_cast, so a non-numeric value is
    NULL rather than a task-killing ANSI cast error mid-corpus."""
    return json_field(col, path).try_cast("bigint")


def parse_props_variant(col: Column) -> Column:
    """Parse a JSON string column ONCE into Spark 4's VARIANT binary
    form (`try_parse_json` — malformed rows become NULL, never a
    task-killing parse error). The 100 TB semi-structured contract:
    `json_field` re-parses the string on EVERY extraction, so a query
    touching f fields pays f parses per row; a variant column is
    parsed once (ideally at ingest, persisted in parquet) and each
    `variant_field` after that is a cheap binary path walk."""
    return F.try_parse_json(col)


def variant_field(v: Column, path: str, dtype: str = "string") -> Column:
    """Extract one typed field from a VARIANT column —
    `try_variant_get`, so a missing path or an uncastable value is
    NULL rather than an error. ``path`` is the bare field name."""
    return F.try_variant_get(v, f"$.{path}", dtype)


def variant_path(v: Column, path: str, dtype: str = "string") -> Column:
    """Extract a typed value from a VARIANT column at a FULL JSON
    path — nested objects and array indices (`$.meta.t`,
    `$.vals[0]`), not just top-level fields like ``variant_field``.
    `try_variant_get` semantics: missing path or uncastable value is
    NULL, never a task-killing error. ``path`` must start with $."""
    if not path.startswith("$"):
        raise ValueError(f"variant path must start with $: {path!r}")
    return F.try_variant_get(v, path, dtype)


def variant_array_field(v: Column, path: str, element_type: str = "string") -> Column:
    """Extract an array-typed value from a VARIANT column as a real
    Spark array (``array<element_type>``) — the typed bridge from
    semi-structured to the engine's native array functions (size,
    explode, aggregate). NULL for missing path / non-array value."""
    if not path.startswith("$"):
        raise ValueError(f"variant path must start with $: {path!r}")
    return F.try_variant_get(v, path, f"array<{element_type}>")

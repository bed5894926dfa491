"""Physical-plan audit for the headline queries — the scale checklist.

For each audited query, greps the formatted explain for the properties
that matter at 100 TB: filter/projection pushdown into the parquet
scan, broadcast (not sort-merge) joins on dimension tables, no
single-partition exchanges on fact-scale paths, map-side partial
aggregation. Writes PLANS.md at the repo root.

Usage: python tools/plan_audit.py [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def n_scans(s: str) -> int:
    """Count parquet scans by their numbered detail header. The tree
    drawing at the top of a formatted explain repeats every node name,
    so a bare substring count double-counts each scan."""
    import re

    return len(re.findall(r"^\(\d+\) Scan parquet", s, re.M))


CHECKS = {
    "p10_expr_filter": [
        ("filter pushed to scan", lambda s: "GreaterThan(n_chars,200)" in s),
        ("projection pruned", lambda s: "ReadSchema: struct<doc_id:bigint,source:string,n_chars:bigint>" in s),
    ],
    "tpch_q1_pricing": [
        ("shipdate filter pushed", lambda s: "LessThanOrEqual(l_shipdate" in s),
        ("partial+final agg", lambda s: s.count("HashAggregate") >= 2),
        ("no sort-merge join", lambda s: "SortMergeJoin" not in s),
    ],
    "tpch_q3_shipping": [
        ("all joins broadcast", lambda s: "BroadcastHashJoin" in s and "SortMergeJoin" not in s),
        ("segment filter pushed", lambda s: "EqualTo(c_mktsegment,BUILDING)" in s),
    ],
    "tpch_q5_local_supplier": [
        ("all dims broadcast", lambda s: "BroadcastHashJoin" in s and "SortMergeJoin" not in s),
    ],
    "j1_registry_matched": [
        ("registry broadcast", lambda s: "BroadcastHashJoin" in s),
    ],
    "o4_dense_topk": [
        ("local top-k prunes before shuffle", lambda s: "MapInArrow" in s),
        # exactly one Window op (WindowGroupLimit pre-prunes don't count)
        (
            "window over pruned stream only",
            lambda s: len(__import__("re").findall(r"^\(\d+\) Window$", s, 8)) == 1,
        ),
    ],
    "st_sessionize": [
        ("window partitioned by user (no global sort)", lambda s: "SinglePartition" not in s),
    ],
    "minhash_lsh_pairs": [
        ("equi-join on band buckets (no cartesian)", lambda s: "CartesianProduct" not in s and "BroadcastNestedLoopJoin" not in s),
    ],
    "embedding_near_dup": [
        ("label-blocked equi-join (no cartesian)", lambda s: "CartesianProduct" not in s),
    ],
    # round-6 additions
    "dense_topk_quantized": [
        # stage-1 scans only (id, codes, scale) — never the float col
        # on the wide path; the floats re-enter via the candidate join
        ("int8 stage keeps float col out of the scan it prunes",
         lambda s: "MapInArrow" in s and s.count("BroadcastHashJoin") >= 1),
        ("no cartesian anywhere", lambda s: "CartesianProduct" not in s),
    ],
    "decontaminate": [
        ("benchmark shingles broadcast (corpus never shuffles to the join)",
         lambda s: "BroadcastHashJoin" in s),
        ("no sort-merge join on the postings path",
         lambda s: "SortMergeJoin" not in s),
    ],
    "weighted_sample": [
        ("map-only: no exchange at all", lambda s: "Exchange" not in s),
    ],
    "pack_sequences": [
        ("window sharded, no single-partition sort",
         lambda s: "SinglePartition" not in s),
    ],
    "st_minhash_dedup": [
        ("band-bucket window, no cartesian",
         lambda s: "CartesianProduct" not in s),
    ],
    # round-11 additions
    "tfidf_top_terms": [
        # the corpus text must be tokenized exactly once: df(t) is a
        # count window over the tf rows, NOT a groupBy+join back
        # (self-references get no exchange reuse — the join spelling
        # re-scans and re-tokenizes; verified r11). The second scan
        # is the column-pruned doc_id pass for N.
        ("corpus tokenized once (single Generate)",
         lambda s: len(__import__("re").findall(r"^\(\d+\) Generate", s, 8)) == 1),
        ("N scan pruned to the id column",
         lambda s: "ReadSchema: struct<doc_id:bigint>" in s),
        ("top-k pruned before the doc window shuffle",
         lambda s: "WindowGroupLimit" in s),
        ("no cartesian beyond the 1-row N broadcast",
         lambda s: "CartesianProduct" not in s),
    ],
    "semdedup_survivors": [
        # assignment is one map-only Arrow kernel; the duplicate test
        # is ONE grouped map keyed by cluster returning the survivors
        # (vectors cross the wire once — O(n x dim)), never a pair
        # self-join (O(pairs x dim)) and never an anti-join (whose
        # double reference to the staged input recomputes it, twice
        # per union branch — measured r11)
        ("map-only Arrow cluster assignment",
         lambda s: "ArrowEvalPython" in s),
        ("one cluster-keyed kernel pass, not a pair self-join "
         "(and not FlatMapGroupsInArrow, whose per-group InternalRow "
         "conversion of array columns measured ~15x mapInArrow)",
         lambda s: len(__import__("re").findall(
             r"^\(\d+\) (?:Python)?MapInArrow", s, 8)) == 1
         and "FlatMapGroups" not in s),
        ("join-free (no recompute-prone anti-join, no cartesian)",
         lambda s: "Join" not in s and "CartesianProduct" not in s),
    ],
    "dsir_weights_en": [
        # the two bucket-count tables are persist()ed: their builds
        # appear as InMemoryRelations (one Generate each), and the
        # only other tokenization is the scoring stream — three
        # Generates total, none re-run per downstream reference
        ("count tables pinned in memory (no re-tokenization per reference)",
         lambda s: "InMemoryRelation" in s),
        # cold plan: exactly 3 Generates (scoring stream + the two
        # pinned count-table builds). When the session has already
        # materialized the caches (pytest's oracle guard executes the
        # query first), the formatted explain re-renders cached build
        # plans per reference and shows 5 — tolerate both; the
        # unpinned re-tokenizing regression this guards would lose
        # the InMemoryRelation pin above AND exceed this bound.
        ("corpus tokenized once per role (scoring + two pinned builds)",
         lambda s: len(__import__("re").findall(r"^\(\d+\) Generate", s, 8)) <= 5),
        ("log-ratio table broadcast to the scoring join",
         lambda s: "BroadcastHashJoin Inner" in s),
        ("no cartesian beyond the 1-row totals broadcasts",
         lambda s: "CartesianProduct" not in s),
    ],
    # round-12 additions
    "variant_nested_stats": [
        # parse-once/extract-many: the staged projection materializes
        # ONE VariantExpressionEvalUtils.parseJson and the next
        # projection walks it with five typed try_variant_gets —
        # catalyst must not collapse the projections and duplicate
        # the parse per extraction
        ("JSON parsed exactly once",
         lambda s: s.count("parseJson") == 1),
        ("five typed extractions off the one variant",
         lambda s: s.count("try_variant_get") == 5),
        ("single corpus scan, partial+final agg",
         lambda s: n_scans(s) == 1 and s.count("HashAggregate") >= 2),
    ],
    "pmi_collocations": [
        # ONE corpus scan + ONE explode build the pinned pair-count
        # table; unigram counts, totals and both c(x)/c(y) joins all
        # read InMemoryTableScans of it — never the corpus again
        # <= 1, not == 1: when the pair table is ALREADY materialized
        # in this session's cache (pytest runs the oracle guard first,
        # which executes the query), formatted explain elides the
        # cached build plan entirely — zero scans/Generates is the
        # cache doing its job, not a regression
        ("corpus scanned at most once",
         lambda s: n_scans(s) <= 1),
        # cold plan renders the ONE pair explode; a session-cached
        # plan renders the cached build up to twice. The regression
        # this pins is a re-tokenizing spelling, which shows one
        # Generate per count-table reference (4+).
        ("single pair explode (cache renders it at most twice)",
         lambda s: len(__import__("re").findall(r"^\(\d+\) Generate", s, 8)) <= 2),
        ("pair table pinned (downstream reads are InMemoryTableScans)",
         lambda s: len(__import__("re").findall(
             r"^\(\d+\) InMemoryTableScan", s, 8)) >= 4),
        ("top-n via per-partition heaps, no global sort",
         lambda s: "TakeOrderedAndProject" in s),
        ("no cartesian beyond the 1-row totals broadcasts",
         lambda s: "CartesianProduct" not in s),
    ],
    "word_entropy": [
        # r12 rewrite: per-doc counts are run lengths of the sorted
        # token array — one scan, zero explodes, zero exchanges
        ("single corpus scan, no explode",
         lambda s: n_scans(s) == 1
         and len(__import__("re").findall(r"^\(\d+\) Generate", s, 8)) == 0),
        ("join-free", lambda s: "Join" not in s),
        ("map-only: no exchange at all", lambda s: "Exchange" not in s),
    ],
    "dedup_substrings": [
        # two corpus scans total (occurrence build + token rebuild) —
        # the Lee et al. relational spelling's inherent I/O; the
        # interval merge is a map-side break scan, so no extra
        # exchange appears after the dup-starts aggregation
        ("two corpus scans only", lambda s: n_scans(s) == 2),
        ("no cartesian", lambda s: "CartesianProduct" not in s),
    ],
    "pq_topk_refined": [
        # stage 1 scans m-BYTE codes through one Arrow kernel (never
        # the float column); stage 2's bounded candidate set and the
        # query vectors broadcast back into the float corpus
        # the registry query encodes inline, so the plan carries TWO
        # Arrow maps (pq_encode + the ADC local top-k) and one
        # ArrowEvalPython (the exact pair re-score); a persisted-code
        # deployment would drop the encode map
        ("encode + ADC are the only Arrow maps",
         lambda s: len(__import__("re").findall(
             r"^\(\d+\) (?:Python)?MapInArrow", s, 8)) == 2),
        ("candidate + query joins broadcast",
         lambda s: s.count("BroadcastHashJoin") >= 2
         and "SortMergeJoin" not in s),
        ("no cartesian", lambda s: "CartesianProduct" not in s),
    ],
    "ivfadc_topk_refined": [
        # the search plan reads the PERSISTED index (the registry
        # query builds it first): the code scan must prune to the
        # probed list partitions at the parquet layer — the
        # nprobe/nlist scan-bytes reduction is a planning-time
        # PartitionFilters entry, not a post-scan Filter
        ("probed lists prune code-store partitions",
         lambda s: "PartitionFilters" in s
         and "list_id" in s.split("PartitionFilters", 1)[1][:200]),
        # unlike pq_topk_refined (inline encode), the index search
        # carries exactly ONE Arrow map: the per-batch ADC top-k
        ("ADC scan is the only Arrow map",
         lambda s: len(__import__("re").findall(
             r"^\(\d+\) (?:Python)?MapInArrow", s, 8)) == 1),
        ("candidate + query refine joins broadcast",
         lambda s: s.count("BroadcastHashJoin") >= 2
         and "SortMergeJoin" not in s),
        ("no cartesian", lambda s: "CartesianProduct" not in s),
    ],
    "minhash_probe_index": [
        # incremental probe: the batch's band rows and signatures
        # broadcast into the store scans — nothing store-sized may
        # shuffle (a SortMergeJoin here would re-shuffle the standing
        # corpus on every refresh)
        ("batch broadcasts into the store, never shuffles it",
         lambda s: s.count("BroadcastHashJoin") >= 2
         and "SortMergeJoin" not in s),
        ("no cartesian", lambda s: "CartesianProduct" not in s),
    ],
    "ivfsq8_topk_refined": [
        # same pruning contract as IVFADC: probed lists must reach
        # the partitioned code store as planning-time PartitionFilters
        ("probed lists prune code-store partitions",
         lambda s: "PartitionFilters" in s
         and "list_id" in s.split("PartitionFilters", 1)[1][:200]),
        ("SQ8 scan is the only Arrow map",
         lambda s: len(__import__("re").findall(
             r"^\(\d+\) (?:Python)?MapInArrow", s, 8)) == 1),
        ("candidate + query refine joins broadcast",
         lambda s: s.count("BroadcastHashJoin") >= 2
         and "SortMergeJoin" not in s),
        ("no cartesian", lambda s: "CartesianProduct" not in s),
    ],
    "sq8_topk_filtered": [
        # Milvus-style scalar pre-filter: the allowed-id set must
        # broadcast LEFT-SEMI into the code scan (the store never
        # shuffles for the filter), before the single Arrow scoring
        # map; refine joins stay broadcast
        ("filter set broadcasts left-semi into the code scan",
         lambda s: "BroadcastHashJoin" in s and "LeftSemi" in s),
        ("one Arrow scoring map over the filtered codes",
         lambda s: len(__import__("re").findall(
             r"^\(\d+\) (?:Python)?MapInArrow", s, 8)) == 1),
        ("no store-sized shuffle join",
         lambda s: "SortMergeJoin" not in s),
        ("no cartesian", lambda s: "CartesianProduct" not in s),
    ],
    "hybrid_rrf_index": [
        # store-backed dense+sparse fusion: the sparse leg must keep
        # its bucket-partition pruning inside the composed plan, and
        # nothing may degrade to a cartesian; the full-outer fusion
        # join runs on <= Q x k rows per side (vanishing), so its
        # join strategy is unconstrained
        ("sparse leg keeps postings partition pruning",
         lambda s: "PartitionFilters" in s
         and "token_bucket" in s.split("PartitionFilters", 1)[1][:200]),
        ("dense leg scores in one Arrow map",
         lambda s: len(__import__("re").findall(
             r"^\(\d+\) (?:Python)?MapInArrow", s, 8)) == 1),
        ("no cartesian", lambda s: "CartesianProduct" not in s
         and "BroadcastNestedLoopJoin" not in s),
    ],
    "bm25_topk_index": [
        # the persisted-BM25 search: bucket-pruned postings scan with
        # tf AND the denormalized dl riding each row — so the scoring
        # job is ONE parquet scan with NO corpus-sized doclen join
        # (the inline bm25_topk engineers the same property with a
        # window; the store bakes it into the layout)
        ("query-token buckets prune postings partitions",
         lambda s: "PartitionFilters" in s
         and "token_bucket" in s.split("PartitionFilters", 1)[1][:200]),
        ("single postings scan, no doclen join",
         lambda s: n_scans(s) == 1),
        ("query terms broadcast, never shuffled",
         lambda s: "BroadcastHashJoin" in s
         and "SortMergeJoin" not in s),
        ("no cartesian", lambda s: "CartesianProduct" not in s),
    ],
    "sparse_topk_index": [
        # the search plan reads the PERSISTED postings store (the
        # registry query builds it first): the scan must prune to the
        # query tokens' hash buckets at the parquet layer, with the
        # in-bucket token IN-list pushed to the data scan
        ("query-token buckets prune postings partitions",
         lambda s: "PartitionFilters" in s
         and "token_bucket" in s.split("PartitionFilters", 1)[1][:200]),
        ("token IN-list pushed to the postings scan",
         lambda s: "PushedFilters" in s
         and "token" in s.split("PushedFilters", 1)[1][:300]),
        ("query weights broadcast, never shuffled",
         lambda s: "BroadcastHashJoin" in s
         and "SortMergeJoin" not in s),
        ("no cartesian", lambda s: "CartesianProduct" not in s),
    ],
    # round-6 additions (this session)
    "bm25_topk": [
        # r8 map-side path (small vocab): corpus stats are collected
        # once and inlined as literals, tf is counted in-array, and
        # per-query scores are row-local expressions — the scoring
        # job must be JOIN-FREE with a single corpus scan feeding the
        # final top-k window. (The relational fallback for large
        # vocabularies keeps broadcast joins; it is exercised by
        # test_bm25_large_vocab_fallback_matches_inlist.)
        ("map-side scoring: join-free, single scan",
         lambda s: "Join" not in s and n_scans(s) == 1),
        ("rank<=k pruned before the window shuffle",
         lambda s: "WindowGroupLimit" in s),
        ("no cartesian", lambda s: "CartesianProduct" not in s),
    ],
    "dedup_spans": [
        ("first-occurrence window not single-partition",
         lambda s: "SinglePartition" not in s),
        ("no cartesian", lambda s: "CartesianProduct" not in s),
        # r8: spans are sliced from the token array map-side — the
        # first shuffled relation must be span-granularity. A
        # word-level posexplode plan needs a (doc,seg) rebuild agg
        # plus a per-doc join: >=4 exchanges, 2 scans-worth of
        # branches, and a Join node. The map-side plan is exactly
        # window-exchange + doc-agg exchange (+ the small-input
        # respread), join-free, single-scan.
        ("map-side span build: <=3 exchanges, single scan, no join",
         lambda s: len(
             __import__("re").findall(r"^\(\d+\) Exchange", s, 8)
         ) <= 3 and "Join" not in s and n_scans(s) == 1),
    ],
    "dedup_substrings": [
        # r8: gram hashes built map-side; only the narrow
        # (doc, pos, hash) occurrence relation shuffles. One doc_id
        # join (corpus <- duplicate starts), no cartesian, two scans
        # (occurrence branch + reassembly branch).
        ("narrow occurrence shuffle: <=4 exchanges, 1 join, 2 scans",
         lambda s: len(
             __import__("re").findall(r"^\(\d+\) Exchange", s, 8)
         ) <= 4 and len(
             __import__("re").findall(r"^\(\d+\) [A-Za-z]*Join", s, 8)
         ) <= 1 and n_scans(s) == 2),
        ("no cartesian", lambda s: "CartesianProduct" not in s),
        ("first-occurrence window not single-partition",
         lambda s: "SinglePartition" not in s),
    ],
    "tpch_q9_product_profit": [
        ("dims broadcast; only fact-fact shuffle is orders join",
         lambda s: s.count("BroadcastHashJoin") >= 3),
        ("part name filter pushed",
         lambda s: "StringContains(p_name,widget)" in s),
    ],
    "tpch_q21_waiting_suppliers": [
        ("exists/not-exists as aggregates, no nested-loop join",
         lambda s: "BroadcastNestedLoopJoin" not in s
         and "CartesianProduct" not in s),
        ("final top-k is TakeOrderedAndProject",
         lambda s: "TakeOrderedAndProject" in s),
    ],
    "stratified_sample": [
        ("group window not single-partition",
         lambda s: "SinglePartition" not in s),
    ],
    # round-6 late additions
    "scd2_registry": [
        # the churn-sized update batch must broadcast into both the
        # close-join and the new-key join; a sort-merge would shuffle
        # the whole dimension history twice
        ("update batch broadcast into both joins",
         lambda s: s.count("BroadcastHashJoin") >= 2
         and "SortMergeJoin" not in s),
    ],
    "validate_documents": [
        # the whole report is one scan + one 1-row reduce
        ("single-scan report (one parquet scan)",
         lambda s: n_scans(s) == 1),
        ("no data-row shuffle (only the scalar agg exchange)",
         lambda s: s.count("Exchange") <= 2),
    ],
    "daily_event_anomalies": [
        ("per-type stats broadcast back (no second fact shuffle)",
         lambda s: "BroadcastHashJoin" in s
         and "SortMergeJoin" not in s),
    ],
    "props_k_counts": [
        # WholeStageCodegen markers don't print in pre-execution AQE
        # formatted plans; "native" here means no Python eval node of
        # any kind reaches the plan
        ("JSON extraction stays JVM-native (no UDF)",
         lambda s: "BatchEvalPython" not in s
         and "MapInPandas" not in s
         and "ArrowEvalPython" not in s),
    ],
    "edit_distance_pairs": [
        ("band-blocked equi-join (never all-pairs)",
         lambda s: "CartesianProduct" not in s
         and "BroadcastNestedLoopJoin" not in s),
    ],
    "token_budget_sample": [
        ("per-group running sum not single-partition",
         lambda s: "SinglePartition" not in s),
    ],
    "item_cooccurrence": [
        ("self-join equi on user (never all-pairs)",
         lambda s: "CartesianProduct" not in s
         and "BroadcastNestedLoopJoin" not in s),
    ],
    "winsorize_nchars": [
        ("per-group quantile stats broadcast back",
         lambda s: "BroadcastHashJoin" in s
         and "SortMergeJoin" not in s),
    ],
    "lang_drift_psi": [
        # the full-outer join runs over two tiny share tables —
        # corpus-sized rows must never reach it
        ("share tables aggregated before the outer join",
         lambda s: s.count("HashAggregate") >= 4
         and "CartesianProduct" not in s),
    ],
    "nchars_histogram": [
        ("one-pass partial-agg histogram (single scan, no UDF)",
         lambda s: n_scans(s) == 1
         and "BatchEvalPython" not in s
         and "MapInPandas" not in s),
    ],
    "bloom_anti_join": [
        # the bitmap probe must stay JVM-native; the only nested-loop
        # join allowed is the one-row bitmap broadcast
        ("bitmap probe JVM-native (no Python eval)",
         lambda s: "BatchEvalPython" not in s
         and "ArrowEvalPython" not in s
         and "MapInPandas" not in s),
        ("no cartesian product",
         lambda s: "CartesianProduct" not in s),
    ],
    "skew_profile": [
        # counts cross-join their own one-row totals; top-N must be
        # TakeOrderedAndProject, never a global sort. Two scans are
        # the documented design (see skew_profile docstring) — what
        # matters is that both are pruned to the key column only
        ("top-N via TakeOrderedAndProject",
         lambda s: "TakeOrderedAndProject" in s),
        ("scans pruned to the key column",
         lambda s: s.count("ReadSchema: struct<event_type:string>")
         == n_scans(s)),
    ],
    "peak_concurrency": [
        # the sweep sort is day-partitioned — no global single-
        # partition ordering of the boundary stream
        ("day-partitioned sweep (no single-partition sort)",
         lambda s: "SinglePartition" not in s),
        ("no Python eval", lambda s: "BatchEvalPython" not in s
         and "MapInPandas" not in s),
    ],
    "throttle_events": [
        ("user-partitioned lag (no single-partition sort)",
         lambda s: "SinglePartition" not in s),
    ],
    "dup_source_matrix": [
        ("pair-stream joins, no cartesian",
         lambda s: "CartesianProduct" not in s
         and "BroadcastNestedLoopJoin" not in s),
    ],
    "embedding_dispersion": [
        ("partial-agg fan-out, no Python eval",
         lambda s: s.count("HashAggregate") >= 2
         and "BatchEvalPython" not in s
         and "MapInPandas" not in s),
    ],
    # round-7: temperature resampling — rate computation is a
    # map-side-combined count agg broadcast back; the corpus-sized
    # side must never enter a shuffle join
    "temperature_mix_sqrt": [
        ("rates broadcast back (no corpus shuffle join)",
         lambda s: "BroadcastHashJoin" in s and "SortMergeJoin" not in s),
        ("partial+final count agg",
         lambda s: s.count("HashAggregate") >= 2),
    ],
    # round-7: full pretraining-assembly composition — clean + mix +
    # split as ONE plan. Two corpus passes is the exact-rates
    # minimum (one to count the cleaned groups, one to filter);
    # a third pass (nmin re-executing the counts subtree) was
    # caught and removed by this audit
    "pretraining_mix": [
        ("exactly the two-pass minimum over the corpus",
         lambda s: n_scans(s) == 2),
        ("rates broadcast back (no corpus shuffle join)",
         lambda s: "BroadcastHashJoin" in s and "SortMergeJoin" not in s),
    ],
    # round-7: composed day-2 incremental pipeline — the update side
    # must broadcast and corpus rows must never enter an exchange.
    # bloom_anti_join's two branches (definitely-new / candidates)
    # each scan the corpus map-side: exactly 2 full-width scans, both
    # feeding broadcast joins — scans are the cheap currency at
    # 100 TB, corpus-sized shuffles are the one to refuse
    "day2_incremental_pipeline": [
        ("registry joins broadcast (no corpus shuffle join)",
         lambda s: "BroadcastHashJoin" in s and "SortMergeJoin" not in s),
        ("corpus scans are the two map-side bloom branches only",
         lambda s: sum(
             1 for line in s.splitlines()
             if "ReadSchema" in line and "n_chars" in line
         ) == 2),
    ],
    # round-7: skew loop closed — the chooser must pick the salted
    # plan for the 90%-hot key (the query builder asserts
    # last_strategy == 'salted'; the plan shows the salt fan-out)
    "auto_join_hot_agg": [
        ("salted plan chosen (salt column in join)",
         lambda s: "__salt" in s),
        ("dim fan-out is explode, not cartesian",
         lambda s: "CartesianProduct" not in s
         and "BroadcastNestedLoopJoin" not in s),
    ],
    # round-10: Morton key build — the min/max calibration is a
    # separate bounded pre-flight job, so the key projection itself
    # must be exchange-free, single-scan, and JVM-native (pure
    # shift/or expressions, no Python eval of any kind)
    "zorder_key": [
        ("map-only key build (no exchange)",
         lambda s: "Exchange" not in s),
        ("single scan, JVM-native shift/or",
         lambda s: n_scans(s) == 1
         and "BatchEvalPython" not in s
         and "ArrowEvalPython" not in s
         and "MapInPandas" not in s),
    ],
}


def _q_auto_join_uniform(spark, sf):
    """Uniform-key counterpart of auto_join_hot_agg: same fact shape,
    no hot key — the chooser must come out 'plain' (no salt fan-out)
    even with broadcast disabled."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from embedding_to_vectordatabase_spark.operators.joins import auto_join

    fact = entry._t(spark, sf, "lineitem").select(
        F.pmod(F.col("l_orderkey"), F.lit(25)).cast("long").alias("k"),
        "l_extendedprice",
    )
    dim = entry._t(spark, sf, "nation").select(
        F.col("n_nationkey").cast("long").alias("k"), "n_name"
    )
    out = auto_join(fact, dim, "k", broadcast_threshold_bytes=-1)
    assert auto_join.last_strategy == "plain", auto_join.last_strategy
    return out.groupBy("n_name").count()


_AUTO_JOIN_UNIFORM_CHECKS = [
    ("no salt fan-out for uniform key", lambda s: "__salt" not in s),
]


def _q_zorder_compact_rewrite(spark, sf):
    """Single-scan compact-zorder rewrite (VERDICT r10 item 5): with
    footer-stats calibration (sinks/layout._footer_bounds — min/max +
    null counts from the parquet footers, metadata only) the rewrite
    plan is the ONLY pass over the data; the builder asserts the
    footer path actually engaged, mirroring auto_join's last_strategy
    assertion. Like zorder_key, the builder runs a bounded pre-flight
    (writing the 10k-row fixture on first use) before the audited
    plan is constructed."""
    import os as _os

    from embedding_to_vectordatabase_spark.sinks.layout import (
        _footer_bounds,
        zorder_by,
    )

    path = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        ".plan_audit_scratch",
        "zorder_int_src",
    )
    if not _os.path.exists(_os.path.join(path, "_SUCCESS")):
        from pyspark.sql import functions as F

        spark.range(10_000).select(
            (F.col("id") % 97).alias("a"),
            F.pmod(F.xxhash64("id"), F.lit(89)).alias("b"),
            F.col("id").alias("payload"),
        ).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(hconf)
    bounds = _footer_bounds(
        fs, fs.makeQualified(jpath), ["a", "b"], dict(df.dtypes)
    )
    assert bounds is not None, (
        "footer calibration must engage on all-integer dims"
    )
    return zorder_by(df, ["a", "b"], num_files=4, _bounds=bounds)


_ZORDER_COMPACT_CHECKS = [
    ("single scan (footer calibration adds no data pass)",
     lambda s: n_scans(s) == 1),
    ("only the clustering range exchange",
     lambda s: "rangepartitioning" in s
     and "hashpartitioning" not in s
     and "SinglePartition" not in s),
    ("JVM-native Morton key (no Python eval)",
     lambda s: "BatchEvalPython" not in s
     and "ArrowEvalPython" not in s
     and "MapInPandas" not in s),
]


_INGEST_CHECKS = [
    ("no single-partition exchange", lambda s: "SinglePartition" not in s),
    ("registry joins broadcast", lambda s: "BroadcastHashJoin" in s and "SortMergeJoin" not in s),
]


def run_audits(
    spark, sf: str, write_plans: bool = True, verbose: bool = False
) -> list[tuple[str, str, bool]]:
    """Run every audit against ``explain('formatted')`` output (plan
    only — nothing executes) and return (query, check, ok) triples;
    optionally regenerate PLANS.md. Shared by the CLI below and
    tests/test_plan_audit.py, so a plan regression (a dim join
    falling off broadcast, a filter no longer pushed, a top-k going
    global-sort) fails the test suite, not just a manual tool run."""
    import __spark_entry__ as entry

    qs = entry.queries()
    lines = [
        "# PLANS — physical-plan audit (auto-generated by tools/plan_audit.py)",
        "",
        f"Scale factor dir: `{sf}`. Each check greps",
        "`explain('formatted')` for the property that matters at 100 TB.",
        "Wired into pytest as tests/test_plan_audit.py.",
        "",
    ]
    results: list[tuple[str, str, bool]] = []
    audits = [(name, qs[name], checks) for name, checks in CHECKS.items()]
    # ingest audited separately (not a public queries() entry shape)
    audits.append(("ingest (flagship plan)", entry._q_ingest_chunks, _INGEST_CHECKS))
    audits.append(
        ("auto_join (uniform key)", _q_auto_join_uniform, _AUTO_JOIN_UNIFORM_CHECKS)
    )
    audits.append(
        (
            "zorder compact rewrite (footer calibration)",
            _q_zorder_compact_rewrite,
            _ZORDER_COMPACT_CHECKS,
        )
    )
    for name, fn, checks in audits:
        s = explain_str(fn(spark, sf))
        lines.append(f"## {name}")
        for label, pred in checks:
            ok = pred(s)
            results.append((name, label, ok))
            lines.append(f"- {'✓' if ok else '✗ FAIL'} {label}")
            if verbose:
                print(("ok  " if ok else "FAIL"), name, "—", label)
        lines.append("")

    if write_plans:
        with open(
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "PLANS.md",
            ),
            "w",
        ) as f:
            f.write("\n".join(lines))
    return results


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from embedding_to_vectordatabase_spark.session import get_spark

    spark = get_spark(shuffle_partitions=8)
    results = run_audits(spark, args.sf, write_plans=True, verbose=True)
    failed = sum(1 for _, _, ok in results if not ok)
    print(f"\n{failed} failed checks; wrote PLANS.md")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())

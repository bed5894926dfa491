"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference RAG-ingestion pipeline
(nzm798/embedding-to-VectorDatabase), re-expressed Spark-first.

Layout
------
- ``schemas``     canonical StructTypes (DOC / REGISTRY / CHUNK, ...)
- ``session``     tuned SparkSession builder (local tests; cluster-ready knobs)
- ``functions``   native-expression scalar fns (text cleaning, vector math)
- ``operators``   DataFrame -> DataFrame operators (chunking, joins, search,
                  dedup, embedding, text analysis, labeling, multimodal)
- ``sources``     readers (JSONL corpus, JDBC registry, whole-file text)
- ``sinks``       rotating parquet sink + vector-DB bulk handoff adapter
- ``plans``       end-to-end pipelines (ingest)
- ``streaming``   Structured Streaming wrappers of the ingest plan

Every operator is a pure function over DataFrames so Catalyst sees one
lazy plan end-to-end; the only Python boundaries are Arrow-batched
``mapInPandas`` stages (embedding / labeling / recursive chunker).
"""

__version__ = "0.2.0"

from .functions.text import (  # noqa: E402,F401
    cast_sparse_keys,
    clean_title,
    derive_file_name,
    reformat_doc,
    token_count,
    word_count,
)
from .functions.vector import (  # noqa: E402,F401
    dense_cosine,
    dense_ip,
    dense_l2,
    rerank_fusion,
    sparse_ip,
)
from .operators.chunking import (  # noqa: E402,F401
    chunk_fixed,
    chunk_recursive,
    semantic_chunk_documents,
    split_sentences,
)
from .operators.dedup import (  # noqa: E402,F401
    dedup_exact,
    dedup_spans,
    dedup_substrings,
    embedding_near_dup_pairs,
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from .operators.embedding import embed_text  # noqa: E402,F401
from .operators.joins import (  # noqa: E402,F401
    anti_join_ingested,
    registry_lookup,
    snapshot_diff,
)
from .operators.sampling import (  # noqa: E402,F401
    grouped_split,
    stratified_sample,
    temperature_mix,
    topk_per_group,
)
from .operators.labeling import label_documents  # noqa: E402,F401
from .operators.search import (  # noqa: E402,F401
    ann_topk_bucketed,
    ann_topk_ivf,
    bm25_topk,
    dense_topk,
    rerank,
    sparse_topk_inverted,
)
from .operators.textanalysis import (  # noqa: E402,F401
    dup_line_stats,
    c4_quality_signals,
    dup_ngram_stats,
    profile_documents,
)
from .plans.ingest import (  # noqa: E402,F401
    IngestConfig,
    ingest,
    ingest_incremental,
)
from .session import get_spark  # noqa: E402,F401
from .operators.anomaly import (  # noqa: E402,F401
    daily_count_anomalies,
    group_zscore,
)
from .operators.dedup import edit_distance_pairs  # noqa: E402,F401
from .operators.scd import scd2_apply  # noqa: E402,F401
from .operators.validate import (  # noqa: E402,F401
    duplicate_keys,
    expectation_report,
)
from .operators.affinity import item_cooccurrence  # noqa: E402,F401
from .operators.anomaly import winsorize  # noqa: E402,F401
from .operators.sampling import token_budget_sample  # noqa: E402,F401
from .operators.anomaly import (  # noqa: E402,F401
    category_drift_psi,
    value_histogram,
)
from .operators.joins import auto_join, bloom_anti_join  # noqa: E402,F401
from .operators.metrics import skew_profile  # noqa: E402,F401
from .operators.embedding import (  # noqa: E402,F401
    centroid_similarity,
    embedding_dispersion,
    group_centroids,
)
from .operators.dedup import dup_source_matrix  # noqa: E402,F401
from .operators.dedup import (  # noqa: E402,F401
    build_minhash_index,
    dedup_against_index,
    minhash_probe_index,
    upsert_minhash_index,
)
from .operators.dedup import containment_pairs  # noqa: E402,F401
from .streaming.ingest_stream import (  # noqa: E402,F401
    conversion_time_stats,
    event_transitions,
    peak_concurrency,
    rolling_active_users,
    throttle_events,
)
from .operators.sampling import rank_normalize  # noqa: E402,F401
from .operators.textanalysis import (  # noqa: E402,F401
    pmi_collocations,
    word_entropy,
)
from .operators.sketches import (  # noqa: E402,F401
    cms_estimate,
    cms_merge_estimate,
    cms_sketches,
)
from .functions.text import (  # noqa: E402,F401
    variant_array_field,
    variant_path,
)
from .operators.search import (  # noqa: E402,F401
    ann_topk_ivfadc,
    build_ivfadc_index,
    build_opq_index,
    build_pq_index,
    opq_encode,
    opq_topk,
    opq_topk_index,
    opq_train,
    pq_encode,
    pq_topk,
    pq_topk_index,
    pq_train,
    rotate_vectors,
    upsert_ivfadc_index,
    upsert_opq_index,
    upsert_pq_index,
)
from .operators.sketches import (  # noqa: E402,F401
    cms_estimate_distributed,
    cms_merge_distributed,
)
from .operators.multimodal import (  # noqa: E402,F401
    decode_av,
    decode_image,
    parse_av_header,
    parse_image_header,
    sample_video_frames,
)
from .operators.search import (  # noqa: E402,F401
    bm25_topk_index,
    build_sparse_index,
    sparse_topk_index,
    upsert_sparse_index,
)
from .operators.search import (  # noqa: E402,F401
    build_sq8_index,
    load_sq8_params,
    sq8_encode,
    sq8_topk,
    sq8_topk_index,
    sq8_train,
    upsert_sq8_index,
)
from .operators.search import (  # noqa: E402,F401
    ann_topk_ivfsq8,
    build_ivfsq8_index,
    upsert_ivfsq8_index,
)

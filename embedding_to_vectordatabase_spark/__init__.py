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

__version__ = "0.1.0"

"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference legal-data-ingestion RAG pipeline
(Chhaya-Tundwal05/legal-data-ingestion-RAG-pipeline), re-expressed
Spark-first.

Layout
------
- ``session``    : SparkSession factory + driver-testdata table loaders
- ``functions``  : pure Column-expression libraries (normalizers, date
                   parsing, party grammar, hashing, chunking, similarity,
                   text statistics) — no I/O, unit-testable
- ``operators``  : reusable DataFrame->DataFrame operators (upsert/merge,
                   surrogate keys, dedup family, top-k/argmax, ANN,
                   variation tracking, quality aggregations)
- ``sources``    : readers (raw docket JSON, parquet tables) and sinks
                   (quarantine JSONL, parquet merge targets)
- ``plans``      : end-to-end pipelines (ingest, query API equivalents,
                   RAG backfill/search, data-quality report)
- ``streaming``  : Structured Streaming seam (foreachBatch ingest,
                   windowed daily stats)

Everything is built on the DataFrame/SQL API so Catalyst supplies
predicate pushdown, column pruning, join planning, and whole-stage
codegen; Python UDFs are avoided in all hot paths.
"""

__version__ = "0.1.0"

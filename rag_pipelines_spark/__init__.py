"""PySpark-native document-analytics engine.

A from-scratch, idiomatic-Spark rebuild of the query and data-processing
capabilities of the reference RAG-ingestion framework (DrAdrianDC/
RAG_pipelines, surveyed in SURVEY.md): DataFrame operators for ingestion,
fingerprinting, delta detection, rule-based text cleaning, metadata
enrichment / fuzzy verification, JSONL emission — plus LLM-data-pipeline
extensions (exact + near dedup, embedding similarity search, text
analytics, chunking) designed for cluster scale.

Layout:
    session     SparkSession builder (AQE on, UTC, Arrow)
    io          parquet/json table loaders for the driver fixture tables
    functions/  reusable Column builders (text cleaning, hashing, regex)
    operators/  DataFrame->DataFrame operators (dedup, delta, enrich, ...)
    sources/    custom sources & sinks (HTML table, JSONL, binary)
    plans/      composed pipeline graphs mirroring the reference lifecycles
    streaming/  Structured Streaming equivalents of the watcher loop
    queries/    the oracle-checked query registry (driver contract)
"""

__version__ = "0.1.0"

"""PySpark-native CDC / incremental-ingest engine.

A brand-new engine (not a port) with the capabilities of the reference
``achinaou-bsc/etl`` (single-JVM Scala/ZIO batch ETL; see SURVEY.md) re-expressed
Spark-first: Structured Streaming binlog tail -> last-writer-wins dedup ->
key-partitioned copy-on-write MERGE into an Iceberg-semantics table of
pre-tokenized training sequences, with schema evolution, exactly-once
epoch-fenced commits, skew handling, lineage, and a training-data operator
library (dedup / similarity / text analysis / multimodal plumbing).
"""

__version__ = "0.1.0"

"""tapdata_connectors_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capability surface of
SoloJu/tapdata-connectors (snapshot read, CDC stream read, write-with-
policies, DDL apply, offset management — see SURVEY.md) as an idiomatic
Spark pipeline: deterministic distributed CDC event generation, window-based
last-writer-wins dedup, Arrow-vectorized HTML→text extraction, and an
idempotent copy-on-write MERGE into a manifest-versioned lake table with
bucket partitioning, schema evolution and per-epoch lineage.

Nothing here is ported from the reference's Java; parity is at the level of
observable semantics (final table state after replay), with reference
file:line citations in docstrings.
"""

__version__ = "0.1.0"

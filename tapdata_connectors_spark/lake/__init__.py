"""Minimal copy-on-write lake table format (manifest-versioned parquet).

The sandbox ships no Iceberg/Delta runtime jar, so the engine provides its
own small lakehouse layer with the same externally-observable semantics the
north rule requires of Iceberg: atomic snapshot commits, MERGE with
partition (bucket) pruning, schema evolution by field id
(ADD / RENAME / TYPE-WIDEN), time travel, and per-commit summaries.
"""

from tapdata_connectors_spark.lake.table import LakeTable

__all__ = ["LakeTable"]

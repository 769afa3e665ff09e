"""Merge-on-read resolution: fold base rows + delta rows to current state.

The scale-defining operator of the engine's MOR mode (the Hudi
merge-on-read / Paimon partial-update analog; the reference's own closest
shape is ClickHouse ReplacingMergeTree + OPTIMIZE FINAL —
ClickhouseConnector.java:273,347: last-writer-wins resolved at read, not at
write). Write cost per micro-batch is O(batch); this operator pays the
deferred merge at read/compaction time in ONE shuffle.

Thin instantiation of operators/resolve.resolve_events at the default
write policy (MOR mode asserts the default policy; delta rows are already
policy-normalized at append time — lake/delta.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame

from tapdata_connectors_spark.operators.dedup import ColumnSpec
from tapdata_connectors_spark.operators.resolve import KIND, ORD, resolve_events
from tapdata_connectors_spark.plans.policies import DEFAULT_POLICY

__all__ = ["KIND", "ORD", "resolve_mor"]


def resolve_mor(unified: DataFrame, payload: list[ColumnSpec], key: str = "url") -> DataFrame:
    return resolve_events(unified, payload, key=key, policy=DEFAULT_POLICY)

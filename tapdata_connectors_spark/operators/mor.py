"""Merge-on-read resolution: fold base rows + delta rows to current state.

The scale-defining operator of the engine's MOR mode (the Hudi
merge-on-read / Paimon partial-update analog; the reference's own closest
shape is ClickHouse ReplacingMergeTree + OPTIMIZE FINAL —
ClickhouseConnector.java:273,347). Write cost per micro-batch is O(batch);
this operator pays the deferred merge at read/compaction time.

Physical form: ONE aggregation. The generic sequential resolver
(operators/resolve.py) needs prefix windows because non-default policies
make effectiveness position-dependent; under the DEFAULT policy (the only
one MOR mode admits) the algebra collapses:

- let make = max order of live resets (base row / insert delta),
  kill = max order of tombstones/deletes; the row is dead iff
  kill > make (or no make at all);
- when alive, the latest live reset carries a FULL row image, so the
  last-set value of every column automatically postdates it — plain
  per-column max_by over set values is exact, no ≥-reset filter needed;
- update deltas that fall in a dead period are harmless: any later live
  reset outranks their column sets with a full image, and if the row ends
  dead the values are nulled anyway;
- keys with only floating updates (update-on-missing, dropped by policy)
  have neither make nor kill and emit no row.

Physical honesty (measured on Spark 4.1): max_by with variable-width
values (binary/string) compiles to SortAggregate, not HashAggregate —
partial aggregation still collapses duplicates map-side (hot-key
friendly), but partitions sort their rows. The identified next
optimization is a two-phase split: hash-aggregate the per-column WINNER
SEQUENCES (all-primitive buffers → true HashAggregate over a
column-pruned scan that never reads html), then fetch winning payloads
with shuffled-hash join-backs — payload bytes then move exactly once,
unsorted. Tracked for round 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tapdata_connectors_spark.lake.table import type_of
from tapdata_connectors_spark.operators.dedup import ColumnSpec
from tapdata_connectors_spark.schema import SEQ_COL, TOMBSTONE_COL

KIND = "_kind"
ORD = "_ord"

__all__ = ["KIND", "ORD", "resolve_mor", "resolve_mor_singleagg"]


def resolve_mor_singleagg(unified: DataFrame, payload: list[ColumnSpec], key: str = "url") -> DataFrame:
    kind = F.col(KIND)
    is_live_reset = kind.isin("B", "I")
    is_kill = kind.isin("T", "D")

    aggs = [
        F.max(F.when(is_live_reset, F.col(ORD))).alias("_make"),
        F.max(F.when(is_kill, F.col(ORD))).alias("_kill"),
        F.max(F.col(ORD)).alias("_last"),
    ]
    for c in payload:
        ty = type_of(c.type)
        aggs.append(
            F.max_by(
                F.struct(F.col(ORD).alias("o"), F.col(c.name).cast(ty).alias("v")),
                F.when(F.col(f"__set_{c.name}"), F.col(ORD)),
            ).alias(f"_p_{c.name}")
        )
    g = unified.groupBy(key).agg(*aggs)

    make, kill = F.col("_make"), F.col("_kill")
    dead = kill.isNotNull() & (make.isNull() | (kill > make))
    # floating updates on a missing key resolve to nothing at all
    g = g.filter(make.isNotNull() | kill.isNotNull())

    sel = [F.col(key)]
    for c in payload:
        ty = type_of(c.type)
        p = F.col(f"_p_{c.name}")
        val = F.when(~dead & p.isNotNull(), p["v"]).otherwise(F.lit(None).cast(ty))
        if c.name == "warc_ts":
            # ordering timestamp survives on tombstones (redelivery guard)
            val = F.when(dead, kill["ts"]).otherwise(val)
        sel.append(val.alias(c.name))
    sel += [
        # a dead row's order is its killing reset (post-delete floating
        # updates never advance it — matches the COW merge and the oracle)
        F.when(dead, kill["seq"]).otherwise(F.col("_last")["seq"]).alias(SEQ_COL),
        dead.alias(TOMBSTONE_COL),
    ]
    return g.select(*sel)


_FIXED_WIDTH = {"int", "bigint", "smallint", "float", "double", "boolean",
                "timestamp", "date"}


def resolve_mor(unified: DataFrame, payload: list[ColumnSpec], key: str = "url") -> DataFrame:
    """Two-phase resolution: hash-aggregated winners + sort-free payload
    fetch — the production form of the algebra above (see operators/
    dedup.lww_fold for the pattern and the seq-ordering contract).

    Phase A aggregates only fixed-width expressions over pruned columns
    (variable-width payload bytes are never read, let alone sorted);
    phase B fetches each variable-width column's winning value with a
    shuffled-hash join on (key, winning seq). Input rows are unique per
    (key, seq) — duplicate deliveries were collapsed by the fold before
    the delta was written — so the joins cannot multiply rows.
    """
    kind = F.col(KIND)
    is_live_reset = kind.isin("B", "I")
    is_kill = kind.isin("T", "D")
    seq = F.col(ORD)["seq"]
    ts = F.col(ORD)["ts"]

    heavy = [c for c in payload if c.type.lower() not in _FIXED_WIDTH]
    light = [c for c in payload if c.type.lower() in _FIXED_WIDTH]

    aggs = [
        F.max(F.when(is_live_reset, seq)).alias("_make"),
        F.max(F.when(is_kill, seq)).alias("_kill"),
        F.max(F.when(is_kill, ts)).alias("_kill_ts"),
        F.max(seq).alias("_last"),
    ]
    for c in payload:
        aggs.append(F.max(F.when(F.col(f"__set_{c.name}"), seq)).alias(f"_w_{c.name}"))
        if c in light:
            ty = type_of(c.type)
            aggs.append(
                F.max_by(F.col(c.name).cast(ty), F.when(F.col(f"__set_{c.name}"), seq))
                .alias(f"_v_{c.name}")
            )
    g = unified.groupBy(key).agg(*aggs)

    make, kill = F.col("_make"), F.col("_kill")
    dead = kill.isNotNull() & (make.isNull() | (kill > make))
    g = g.filter(make.isNotNull() | kill.isNotNull())

    out = g
    for c in heavy:
        ty = type_of(c.type)
        vals = unified.filter(F.col(f"__set_{c.name}")).select(
            F.col(key).alias(f"_k_{c.name}"),
            F.col(ORD)["seq"].alias(f"_s_{c.name}"),
            F.col(c.name).cast(ty).alias(f"_v_{c.name}"),
        )
        out = out.join(
            vals.hint("shuffle_hash"),
            (F.col(key) == F.col(f"_k_{c.name}"))
            & (F.col(f"_s_{c.name}") == F.when(~dead, F.col(f"_w_{c.name}"))),
            "left",
        ).drop(f"_k_{c.name}", f"_s_{c.name}")

    sel = [F.col(key)]
    for c in payload:
        ty = type_of(c.type)
        val = F.when(~dead & F.col(f"_w_{c.name}").isNotNull(), F.col(f"_v_{c.name}"))               .otherwise(F.lit(None).cast(ty))
        if c.name == "warc_ts":
            val = F.when(dead, F.col("_kill_ts")).otherwise(val)
        sel.append(val.alias(c.name))
    sel += [
        F.when(dead, F.col("_kill")).otherwise(F.col("_last")).alias(SEQ_COL),
        dead.alias(TOMBSTONE_COL),
    ]
    return out.select(*sel)

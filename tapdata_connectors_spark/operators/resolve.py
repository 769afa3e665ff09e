"""Sequential-faithful batch resolution via prefix windows.

Generalizes operators/mor.resolve_mor: given unified rows per key — target
rows ('B' live / 'T' tombstone, every column set) plus change rows
('I'/'U'/'D' with per-column set flags) — produce the key's final state
EXACTLY as event-at-a-time replay would, for any write policy, in one
shuffle (prefix-window + aggregate on the same key).

Why windows: policy effects are position-dependent — INSERT IGNORE drops an
insert only if the row is alive *at that point in the order* (a delete
earlier in the same batch revives insertability), and insert_on_nonexists
turns the first update of a dead period into a partial-image create. A
per-key fold (max_by) cannot see "alive at position p"; a running max over
the ordered prefix can:

    alive_before(p) = max(ord of live-makers < p) > max(ord of killers < p)

is non-recursive even though effectiveness looks recursive: any insert in a
dead period revives the key (the first one effectively), and in a live
period changes nothing — so the *presence* of a live-maker is all that
matters, not its own effectiveness. Same argument covers update-as-creator
under insert_on_nonexists.

Reference semantics reproduced (observable behavior):
  INSERT IGNORE               MysqlWriteRecorder.java:67-81
  upsert / update_on_exists   MysqlWriteRecorder.java:49-65
  update policies             NormalWriteRecorder.java:311-322
  delete-by-PK                NormalWriteRecorder.java:378-427
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from tapdata_connectors_spark.lake.table import type_of
from tapdata_connectors_spark.operators.dedup import ColumnSpec
from tapdata_connectors_spark.plans.policies import DEFAULT_POLICY, WritePolicy
from tapdata_connectors_spark.schema import SEQ_COL, TOMBSTONE_COL

KIND = "_kind"
ORD = "_ord"


def resolve_events(
    unified: DataFrame,
    payload: list[ColumnSpec],
    key: str = "url",
    policy: WritePolicy = DEFAULT_POLICY,
    provenance: bool = False,
) -> DataFrame:
    """Resolve unified rows to one final row per key (raw-table schema:
    key, payload columns, SEQ_COL, TOMBSTONE_COL).

    provenance=True additionally emits a boolean `__evt_<col>` per payload
    column: the winning value came from a change row (not the target row) —
    callers use it to recompute derived columns only where needed.
    """
    kind = F.col(KIND)
    is_b = kind == "B"
    is_t = kind == "T"
    is_i = kind == "I"
    is_u = kind == "U"
    is_d = kind == "D"

    # existence algebra (see module docstring for why this is closed-form)
    u_makes_live = F.lit(policy.update_inserts_missing)
    live_maker = is_b | is_i | (is_u & u_makes_live)
    killer = is_t | is_d

    wp = W.partitionBy(key).orderBy(ORD).rowsBetween(W.unboundedPreceding, -1)
    prev_live = F.max(F.when(live_maker, F.col(ORD))).over(wp)
    prev_dead = F.max(F.when(killer, F.col(ORD))).over(wp)
    alive_before = prev_live.isNotNull() & (prev_dead.isNull() | (prev_live > prev_dead))

    i_effective = F.lit(policy.insert_updates_existing) | ~alive_before
    u_effective = F.lit(policy.update_inserts_missing) | alive_before
    effective = (
        is_b | is_t | is_d | (is_i & i_effective) | (is_u & u_effective)
    )
    # value reset = row that bounds the value lookback: target row, applied
    # full-image insert, creating update (partial image over a dead row),
    # and kills (nothing before a delete survives into a later creation)
    creating_u = is_u & u_makes_live & ~alive_before
    value_reset = is_b | is_t | is_d | (is_i & i_effective) | creating_u

    ev = (
        unified.withColumn("_eff", effective)
        .withColumn("_reset", value_reset)
        .filter(F.col("_eff"))
    )

    aggs = [
        F.max(F.when(F.col("_reset") & ~(is_t | is_d), F.col(ORD))).alias("_last_make"),
        F.max(F.when(is_t | is_d, F.col(ORD))).alias("_last_kill"),
        F.max(F.when(F.col("_reset"), F.col(ORD))).alias("_last_reset"),
        F.max(F.col(ORD)).alias("_last_ord"),
    ]
    for c in payload:
        ty = type_of(c.type)
        val = F.col(c.name).cast(ty)
        aggs.append(
            F.max_by(
                F.struct(F.col(ORD).alias("o"), val.alias("v"), is_b.alias("b")),
                F.when(F.col(f"__set_{c.name}"), F.col(ORD)),
            ).alias(f"_p_{c.name}")
        )
    g = ev.groupBy(key).agg(*aggs)

    dead = F.col("_last_kill").isNotNull() & (
        F.col("_last_make").isNull() | (F.col("_last_kill") > F.col("_last_make"))
    )
    sel = [F.col(key)]
    for c in payload:
        ty = type_of(c.type)
        p = F.col(f"_p_{c.name}")
        live_val = p.isNotNull() & (p["o"] >= F.col("_last_reset"))
        val = F.when(~dead & live_val, p["v"]).otherwise(F.lit(None).cast(ty))
        if c.name == "warc_ts":
            # ordering timestamp survives on tombstones (redelivery guard)
            val = F.when(dead, F.col("_last_kill")["ts"]).otherwise(val)
        sel.append(val.alias(c.name))
        if provenance:
            sel.append((~dead & live_val & ~p["b"]).alias(f"__evt_{c.name}"))
    sel += [
        F.when(dead, F.col("_last_kill")["seq"]).otherwise(F.col("_last_ord")["seq"]).alias(SEQ_COL),
        dead.alias(TOMBSTONE_COL),
    ]
    return g.select(*sel)

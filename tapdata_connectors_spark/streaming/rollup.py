"""Incrementally-maintained aggregate tables (derived rollups) fed by the
lake's change-data feed.

The downstream half of LakeTable.read_changes: a per-group aggregate
(e.g. pages per lang, bytes per host) kept current WITHOUT re-reading the
corpus — each refresh consumes only the CDF rows between two snapshots
(manifest-diff-pruned to touched buckets) and folds signed adjustments
into the stored state. The Delta Live Tables / Materialize-style
incremental view, built on this engine's own commit machinery:

- the rollup IS a LakeTable: its refresh commits through the same
  manifest CAS, and the (since→to) watermark rides the applied-epochs
  exactly-once guard, so a re-run of the same refresh is skipped and a
  crash between compute and commit re-runs cleanly (the commit is the
  only effect);
- adjustments are algebraic (+1 insert / −1 delete / ±1 on the pre- and
  post-image of an update, so group-changing updates move the count
  between groups exactly);
- scale shape: CDF read ∝ touched buckets; ONE aggregation of the CDF
  rows (map-side combinable signed counts); the state join touches
  |groups| rows, not the corpus. A refresh after 10^6 events into a
  5-group rollup shuffles 5 rows of state.

Reference analog: the aggregated-sync / metrics materialization the
reference leaves to target databases (e.g. its ClickHouse
ReplacingMergeTree rollups); here it is engine-native and exactly-once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tapdata_connectors_spark.lake.table import LakeTable
from tapdata_connectors_spark.schema import SEQ_COL, TOMBSTONE_COL

_WM_PREFIX = "rollup_src_v:"


def create_rollup_table(
    spark: SparkSession, path: str, group_field: tuple[str, str],
    sum_cols: list[str] | None = None, n_buckets: int = 1,
) -> LakeTable:
    """A rollup table: (group, n[, sum_<col>...]). Tiny by construction
    (|distinct groups| rows), so 1 bucket is the right default."""
    fields = [group_field, ("n", "bigint")]
    fields += [(f"sum_{c}", "bigint") for c in (sum_cols or [])]
    return LakeTable.create(
        spark, path, fields, key=group_field[0], n_buckets=n_buckets,
    )


def rollup_watermark(dst: LakeTable) -> int:
    """Highest source version already folded into `dst` (0 = nothing)."""
    return max(
        (int(k[len(_WM_PREFIX):]) for k in dst.manifest().applied_epochs
         if k.startswith(_WM_PREFIX)),
        default=0,
    )


def refresh_rollup(
    src: LakeTable, dst: LakeTable, group_col: str,
    sum_cols: list[str] | None = None,
    to_version: int | None = None,
) -> dict:
    """Fold source changes since the stored watermark into the rollup.
    `sum_cols` maintains per-group SUMS of integer source columns
    alongside the count — same signed algebra (+post − pre), so an
    update that changes only the summed value (not the group) adjusts
    the sum by the delta and the count by zero. Null values sum as 0.
    Returns {since, to, groups_changed, skipped}."""
    to = src.current_version() if to_version is None else to_version
    since = rollup_watermark(dst)
    if to <= since:
        return {"since": since, "to": to, "groups_changed": 0,
                "skipped": True}
    wm_key = f"{_WM_PREFIX}{to}"
    if dst.epoch_applied(wm_key):
        return {"since": since, "to": to, "groups_changed": 0,
                "skipped": True}

    ch = src.read_changes(since, to, preimages=True)
    sign = (
        F.when(F.col("_change_type").isin("insert", "update_postimage"),
               F.lit(1))
        .when(F.col("_change_type").isin("delete", "update_preimage"),
              F.lit(-1))
        .otherwise(F.lit(0))
    )
    # group values are stringified and nulls mapped to a sentinel: the
    # group is the rollup table's KEY (non-null by lake contract), and a
    # count rollup must account for null-group rows, not drop them
    g = F.coalesce(F.col(group_col).cast("string"), F.lit("__null__"))
    sums = sum_cols or []
    def val(c):
        # a summed column may postdate `since` (ADD COLUMN mid-stream):
        # absent -> contributes 0, exactly like its pre-DDL null values
        return F.col(c) if c in ch.columns else F.lit(None)

    adj = (
        ch.select(g.alias("__g"), sign.alias("__s"),
                  *[val(c).alias(f"__v_{c}") for c in sums])
        .groupBy("__g")
        .agg(
            F.sum("__s").cast("bigint").alias("__dn"),
            *[F.sum(F.col("__s")
                    * F.coalesce(F.col(f"__v_{c}").cast("bigint"), F.lit(0)))
              .cast("bigint").alias(f"__dv_{c}") for c in sums],
        )
    )
    state = dst.read().select(
        F.col(group_col).alias("__g"), F.col("n").alias("__n"),
        *[F.col(f"sum_{c}").alias(f"__o_{c}") for c in sums],
    )
    merged = (
        state.join(adj, "__g", "full_outer")
        .select(
            F.col("__g").alias(group_col),
            (F.coalesce("__n", F.lit(0))
             + F.coalesce("__dn", F.lit(0))).alias("n"),
            *[(F.coalesce(f"__o_{c}", F.lit(0))
               + F.coalesce(f"__dv_{c}", F.lit(0))).alias(f"sum_{c}")
              for c in sums],
        )
    )
    out = (
        merged.withColumn(SEQ_COL, F.lit(to).cast("long"))
        .withColumn(TOMBSTONE_COL, F.col("n") <= 0)
        .withColumn("n", F.when(F.col("n") > 0, F.col("n")))
        .withColumn("_mb", dst.bucket_expr(group_col))
    )
    m = dst.manifest()
    entries = dst.write_data_files(out, "_mb")
    dst.commit_files(
        entries,
        replaced_buckets=set(range(m.n_buckets)),
        epoch_key=wm_key,
        summary={"op": "rollup_refresh", "since": since, "to": to},
    )
    return {"since": since, "to": to,
            "groups_changed": adj.count(), "skipped": False}

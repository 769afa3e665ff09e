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
  between groups exactly); sums fold the same way; MIN/MAX fold for
  inserts and fall back to recomputing only the AFFECTED groups when a
  retraction removes the current extreme (see refresh_rollup);
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
    sum_cols: list[str] | None = None,
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
    n_buckets: int = 1,
) -> LakeTable:
    """A rollup table: (group, n[, sum_<col>...][, min_<col>...]
    [, max_<col>...]). Tiny by construction (|distinct groups| rows), so
    1 bucket is the right default."""
    fields = [group_field, ("n", "bigint")]
    fields += [(f"sum_{c}", "bigint") for c in (sum_cols or [])]
    fields += [(f"min_{c}", "bigint") for c in (min_cols or [])]
    fields += [(f"max_{c}", "bigint") for c in (max_cols or [])]
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
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
    to_version: int | None = None,
) -> dict:
    """Fold source changes since the stored watermark into the rollup.
    `sum_cols` maintains per-group SUMS of integer source columns
    alongside the count — same signed algebra (+post − pre), so an
    update that changes only the summed value (not the group) adjusts
    the sum by the delta and the count by zero. Null values sum as 0.

    `min_cols`/`max_cols` maintain per-group extremes. MIN/MAX are not
    algebraic under retraction — a delete (or update preimage) that
    removes the current extreme cannot be folded, the true new extreme
    lives only in the source. Inserts fold for free (new = least(stored,
    inserted)); a retraction AT the candidate extreme marks its group
    for the AFFECTED-GROUP FALLBACK: those groups — and only those —
    are recomputed from the source snapshot at `to`, with the group list
    pushed down as a source-scan predicate. Cost ∝ the affected groups'
    source rows; the common refresh (no extreme retracted) stays
    O(touched buckets + |groups|). Nulls never affect extremes (SQL MIN
    semantics). Returns {since, to, groups_changed, recomputed_groups,
    skipped}."""
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
    mins = min_cols or []
    maxs = max_cols or []
    exts = sorted(set(mins) | set(maxs))

    def val(c, cols):
        # a tracked column may postdate `since` (ADD COLUMN mid-stream):
        # absent -> contributes 0 / null, exactly like pre-DDL null values
        return F.col(c) if c in cols else F.lit(None)

    def pos(c):  # inserted values of c (retractions -> null, ignored)
        return F.when(F.col("__s") == 1, F.col(f"__v_{c}"))

    def neg(c):  # retracted values of c
        return F.when(F.col("__s") == -1, F.col(f"__v_{c}"))

    adj = (
        ch.select(g.alias("__g"), sign.alias("__s"),
                  *[val(c, ch.columns).cast("bigint").alias(f"__v_{c}")
                    for c in sorted(set(sums) | set(exts))])
        .groupBy("__g")
        .agg(
            F.sum("__s").cast("bigint").alias("__dn"),
            *[F.sum(F.col("__s") * F.coalesce(F.col(f"__v_{c}"), F.lit(0)))
              .cast("bigint").alias(f"__dv_{c}") for c in sums],
            *[F.min(pos(c)).alias(f"__imin_{c}") for c in mins],
            *[F.min(neg(c)).alias(f"__rmin_{c}") for c in mins],
            *[F.max(pos(c)).alias(f"__imax_{c}") for c in maxs],
            *[F.max(neg(c)).alias(f"__rmax_{c}") for c in maxs],
        )
    )
    state = dst.read().select(
        F.col(group_col).alias("__g"), F.col("n").alias("__n"),
        *[F.col(f"sum_{c}").alias(f"__o_{c}") for c in sums],
        *[F.col(f"min_{c}").alias(f"__omin_{c}") for c in mins],
        *[F.col(f"max_{c}").alias(f"__omax_{c}") for c in maxs],
    )
    # candidate extremes fold inserts only; a retraction at (or past) the
    # candidate may have removed the true extreme -> group needs recompute
    cand_min = {c: F.least(F.col(f"__omin_{c}"), F.col(f"__imin_{c}"))
                for c in mins}
    cand_max = {c: F.greatest(F.col(f"__omax_{c}"), F.col(f"__imax_{c}"))
                for c in maxs}
    redo = F.lit(False)
    for c in mins:
        redo = redo | (F.col(f"__rmin_{c}").isNotNull()
                       & (F.col(f"__rmin_{c}")
                          <= F.coalesce(cand_min[c], F.col(f"__rmin_{c}"))))
    for c in maxs:
        redo = redo | (F.col(f"__rmax_{c}").isNotNull()
                       & (F.col(f"__rmax_{c}")
                          >= F.coalesce(cand_max[c], F.col(f"__rmax_{c}"))))
    merged = (
        state.join(adj, "__g", "full_outer")
        .select(
            "__g",
            (F.coalesce("__n", F.lit(0))
             + F.coalesce("__dn", F.lit(0))).alias("n"),
            *[(F.coalesce(f"__o_{c}", F.lit(0))
               + F.coalesce(f"__dv_{c}", F.lit(0))).alias(f"sum_{c}")
              for c in sums],
            *[cand_min[c].alias(f"min_{c}") for c in mins],
            *[cand_max[c].alias(f"max_{c}") for c in maxs],
            redo.alias("__redo"),
        )
    )
    recomputed = 0
    if exts:
        # bounded driver list: ∝ |groups| with a retracted extreme
        redo_keys = [r["__g"] for r in
                     merged.filter(F.col("__redo") & (F.col("n") > 0))
                     .select("__g").collect()]
        recomputed = len(redo_keys)
        if redo_keys:
            live = src.read(version=to)
            lg = F.coalesce(F.col(group_col).cast("string"),
                            F.lit("__null__"))
            rec = (
                live.filter(lg.isin(redo_keys))
                .groupBy(lg.alias("__g"))
                .agg(*[F.min(val(c, live.columns).cast("bigint"))
                       .alias(f"__t_min_{c}") for c in mins],
                     *[F.max(val(c, live.columns).cast("bigint"))
                       .alias(f"__t_max_{c}") for c in maxs])
            )
            merged = (
                merged.join(rec, "__g", "left")
                .select(
                    "__g", "n", *[f"sum_{c}" for c in sums],
                    *[F.when(F.col("__redo"), F.col(f"__t_min_{c}"))
                      .otherwise(F.col(f"min_{c}")).alias(f"min_{c}")
                      for c in mins],
                    *[F.when(F.col("__redo"), F.col(f"__t_max_{c}"))
                      .otherwise(F.col(f"max_{c}")).alias(f"max_{c}")
                      for c in maxs],
                    "__redo",
                )
            )
    merged = merged.select(
        F.col("__g").alias(group_col), "n",
        *[f"sum_{c}" for c in sums],
        *[f"min_{c}" for c in mins],
        *[f"max_{c}" for c in maxs],
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
            "groups_changed": adj.count(),
            "recomputed_groups": recomputed, "skipped": False}

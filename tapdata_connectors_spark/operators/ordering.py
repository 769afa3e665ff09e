"""Staging-order contract validation.

The two-phase fold (operators/dedup.lww_fold) and MOR resolution
(operators/mor.resolve_mor) pick per-column winners by `event_seq` alone.
That is exactly the lexicographic (warc_ts, event_seq) LWW order — the
north rule's dedup key — if and only if `warc_ts` is non-decreasing in
`event_seq` (the version timestamp follows log position, as in a binlog:
the reference's binlog/LSN/resumeToken positions all advance with source
commit time — MysqlReader.java:851-854 builds exactlyOnceId from
(file, position), which is time-ordered by construction).

The synthetic generator guarantees the contract; EXTERNAL changelogs
(sources/file_source.changelog_to_events, sources/events_adapter) map
arbitrary (ts, position) columns and MUST be validated — a violating
stream would silently produce different LWW winners within a batch
(seq order) vs across batches (the (ts, seq) stale-guard in
lake/merge.py), making final state depend on epoch boundaries.

`seq_ts_inversions` is the exact, scale-safe check: range-partition by
seq (disjoint seq ranges per partition), count adjacent inversions with a
per-partition parallel sort, and stitch the O(#partitions) boundaries on
the driver. One pass over (seq, ts) pairs only — heavy payload columns
are pruned away before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def seq_ts_inversions(
    df: DataFrame,
    seq_col: str = "event_seq",
    ts_col: str = "warc_ts",
    num_partitions: int | None = None,
) -> int:
    """Exact count of adjacent (in `seq_col` order) pairs whose `ts_col`
    DECREASES. 0 ⟺ ts is non-decreasing in seq ⟺ seq order is the
    (ts, seq) LWW order. Rows with null ts are excluded (DDL markers and
    deletes without a version timestamp carry no ordering information).
    """
    d = (
        df.select(F.col(seq_col).alias("_s"), F.col(ts_col).alias("_t"))
        .where(F.col(ts_col).isNotNull())
    )
    n = num_partitions or d.sparkSession.sparkContext.defaultParallelism
    # disjoint seq ranges per partition → local checks + boundary stitching
    # are exact; the per-partition window sort runs in parallel
    d = d.repartitionByRange(max(n, 1), F.col("_s")).withColumn(
        "_p", F.spark_partition_id()
    )
    w = W.partitionBy("_p").orderBy("_s")
    lagged = d.withColumn("_prev", F.lag("_t").over(w))
    per_part = (
        lagged.groupBy("_p")
        .agg(
            F.coalesce(
                F.sum((F.col("_t") < F.col("_prev")).cast("long")), F.lit(0)
            ).alias("inv"),
            F.min("_s").alias("min_s"),
            F.min_by("_t", "_s").alias("first_t"),
            F.max_by("_t", "_s").alias("last_t"),
        )
        .collect()
    )
    if not per_part:
        return 0
    total = sum(r["inv"] for r in per_part)
    ordered = sorted(per_part, key=lambda r: r["min_s"])
    for prev, cur in zip(ordered, ordered[1:]):
        if prev["last_t"] is not None and cur["first_t"] is not None:
            if cur["first_t"] < prev["last_t"]:
                total += 1
    return int(total)


def require_seq_ts_order(
    df: DataFrame, seq_col: str = "event_seq", ts_col: str = "warc_ts"
) -> DataFrame:
    """Fail-loud contract gate for external changelog adapters: raises if
    the stream violates ts-monotone-in-seq; returns df unchanged otherwise.
    """
    inv = seq_ts_inversions(df, seq_col=seq_col, ts_col=ts_col)
    if inv:
        raise ValueError(
            f"changelog violates the staging order contract: {ts_col} must be "
            f"non-decreasing in {seq_col} ({inv} adjacent inversion(s) found). "
            "Either fix the source's position/timestamp mapping, or run the "
            "pipeline with seq_is_lww_order=False to use the "
            "(ts, seq)-ordered fold (slower: SortAggregate plans)."
        )
    return df

"""Event-time windowed aggregation with watermarks (SURVEY.md §2.11):
the batch F.window plan and the streaming plan are the same expression;
append-mode emission waits for the watermark to close a window; rows
arriving later than the watermark allowance are DROPPED, not misfiled.

The engine's CDC replication path deliberately avoids watermarks
(order+idempotence by (ts, seq) — operators/ordering.py); this covers the
metrics/analytics side where event-time windows are the right tool."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def _rows(spark, rows):
    return spark.createDataFrame(rows, "ts timestamp, event_type string, value double")


def _ts(m, s=0):
    return datetime.datetime(2024, 1, 1, 0, m, s)


def _windowed(df):
    return (
        df.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "sv")
    )


def test_stream_windowed_agg_matches_batch(spark, tmpdir_):
    """complete-mode stream over the same files == batch aggregation."""
    rows = [(_ts(i % 13, (i * 7) % 60), f"t{i % 3}", float(i)) for i in range(200)]
    _rows(spark, rows).write.parquet(f"{tmpdir_}/src")
    stream = spark.readStream.schema("ts timestamp, event_type string, value double") \
        .parquet(f"{tmpdir_}/src")
    q = (
        _windowed(stream)
        .writeStream.format("memory").queryName("wm_complete")
        .outputMode("complete").trigger(availableNow=True)
        .option("checkpointLocation", f"{tmpdir_}/ckpt").start()
    )
    q.awaitTermination(300)
    got = {tuple(r) for r in spark.sql("select * from wm_complete").collect()}
    want = {tuple(r) for r in _windowed(_rows(spark, rows)).collect()}
    assert got == want and want


def test_watermark_drops_late_rows_append_mode(spark, tmpdir_):
    """Three micro-batches (maxFilesPerTrigger=1, file mtime order):
    batch 0 advances the event-time high mark to 0:20, so from batch 1 on
    the watermark is 0:18 and window [0:00,0:05) is closed and emitted;
    batch 2 then delivers a 0:03 row — beyond the 2-minute allowance,
    after its window's state was evicted — which MUST be dropped (the
    stateOperators numRowsDroppedByWatermark counter pins the mechanism,
    not just the net effect)."""
    import time

    f1 = [(_ts(1), "a", 1.0), (_ts(2), "a", 2.0), (_ts(20), "a", 3.0)]
    f2 = [(_ts(22), "a", 4.0)]
    f3 = [(_ts(3), "a", 100.0),   # late: watermark is 0:20 by now
          (_ts(23), "a", 5.0)]    # on time
    for name, rows in (("f1", f1), ("f2", f2), ("f3", f3)):
        _rows(spark, rows).coalesce(1).write.parquet(f"{tmpdir_}/src/{name}")
        time.sleep(1.2)  # distinct mtimes -> deterministic batch order
    stream = spark.readStream.schema("ts timestamp, event_type string, value double") \
        .option("maxFilesPerTrigger", "1") \
        .parquet(f"{tmpdir_}/src/*")
    q = (
        _windowed(stream.withWatermark("ts", "2 minutes"))
        .writeStream.format("memory").queryName("wm_append")
        .outputMode("append").trigger(availableNow=True)
        .option("checkpointLocation", f"{tmpdir_}/ckpt").start()
    )
    q.awaitTermination(300)
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress if p["stateOperators"]
    )
    assert dropped == 1
    out = {(r["ws"].minute, r["n"], r["sv"])
           for r in spark.sql("select * from wm_append").collect()}
    # [0:00) window: the two batch-0 rows only — the late 100.0 is gone
    assert (0, 2, 3.0) in out
    assert not any(sv == 103.0 or n == 3 for _, n, sv in out)

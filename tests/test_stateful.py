"""Stateful streaming continuity monitor (streaming/stateful.py):
applyInPandasWithState over a real Structured Streaming source, state
persisted across triggers, gap detection per key."""

from __future__ import annotations

from tapdata_connectors_spark.schema import EVENTS_SCHEMA
from tapdata_connectors_spark.sources import (
    GeneratorConfig,
    generate_events,
    stage_events,
)
from tapdata_connectors_spark.streaming import seq_continuity_monitor


def test_contiguous_log_reports_zero_missing(spark, tmpdir_):
    cfg = GeneratorConfig(n_events=1200, n_urls=100, epoch_size=300)
    ev = generate_events(spark, cfg)
    stage_events(ev, f"{tmpdir_}/staging")
    # key by a constant-ish column: group on op would split seq ranges, so
    # monitor the global stream via a single key using the epoch dirs
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(f"{tmpdir_}/staging/epoch=*")
    )
    from pyspark.sql import functions as F

    one_key = stream.withColumn("shard", F.lit("src0"))
    q = (
        seq_continuity_monitor(one_key, key_col="shard", seq_col="event_seq")
        .writeStream.format("memory").queryName("mon_ok")
        .outputMode("update")
        .option("checkpointLocation", f"{tmpdir_}/ckpt_ok")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    rows = spark.sql("SELECT * FROM mon_ok").collect()
    assert len(rows) >= 2, "maxFilesPerTrigger must have produced several triggers"
    final = rows[-1]
    assert final["key"] == "src0"
    assert final["lo_seq"] == 0
    assert final["hi_seq"] == 1199
    assert final["n_events"] == 1200
    assert final["missing"] == 0
    # state accumulated ACROSS triggers: earlier rows cover fewer events
    assert rows[0]["n_events"] < 1200


def test_gapped_log_reports_missing(spark, tmpdir_):
    cfg = GeneratorConfig(n_events=900, n_urls=80, epoch_size=300)
    ev = generate_events(spark, cfg)
    # drop a contiguous slice of the log: seqs 400..449 never arrive
    gapped = ev.filter("event_seq < 400 OR event_seq >= 450")
    stage_events(gapped, f"{tmpdir_}/staging")
    from pyspark.sql import functions as F

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(f"{tmpdir_}/staging/epoch=*")
        .withColumn("shard", F.lit("src0"))
    )
    q = (
        seq_continuity_monitor(stream, key_col="shard", seq_col="event_seq")
        .writeStream.format("memory").queryName("mon_gap")
        .outputMode("update")
        .option("checkpointLocation", f"{tmpdir_}/ckpt_gap")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    final = spark.sql("SELECT * FROM mon_gap").collect()[-1]
    assert final["n_events"] == 850
    assert final["missing"] == 50  # exactly the dropped slice


def test_duplicated_batch_clamps_missing(spark, tmpdir_):
    """VERDICT r3 item 6 done-criterion: redelivered (duplicated) events
    inflate n_events but must clamp `missing` at 0, never negative."""
    cfg = GeneratorConfig(n_events=900, n_urls=80, epoch_size=300)
    ev = generate_events(spark, cfg)
    # whole first epoch delivered twice: 1200 deliveries over span 900
    dup = ev.union(ev.filter("epoch = 0"))
    stage_events(dup, f"{tmpdir_}/staging")
    from pyspark.sql import functions as F

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(f"{tmpdir_}/staging/epoch=*")
        .withColumn("shard", F.lit("src0"))
    )
    q = (
        seq_continuity_monitor(stream, key_col="shard", seq_col="event_seq")
        .writeStream.format("memory").queryName("mon_dup")
        .outputMode("update")
        .option("checkpointLocation", f"{tmpdir_}/ckpt_dup")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    final = spark.sql("SELECT * FROM mon_dup").collect()[-1]
    assert final["n_events"] == 1200          # deliveries counted
    assert final["lo_seq"] == 0 and final["hi_seq"] == 899
    assert final["missing"] == 0              # clamped, not -300


def test_pipeline_continuity_side_output(spark, tmpdir_):
    """VERDICT r3 item 8: run_stream(continuity_checkpoint=...) lands the
    stateful monitor's rows on the pipeline as a first-class side-output,
    keyed per epoch, alongside lineage."""
    from tapdata_connectors_spark.streaming import CdcPipeline

    cfg = GeneratorConfig(n_events=1200, n_urls=100, epoch_size=300)
    ev = generate_events(spark, cfg)
    stage_events(ev, f"{tmpdir_}/staging")
    pipe = CdcPipeline(spark, f"{tmpdir_}/pages", f"{tmpdir_}/staging",
                       n_buckets=4)
    q = pipe.run_stream(f"{tmpdir_}/ckpt", max_epochs_per_trigger=2,
                        continuity_checkpoint=f"{tmpdir_}/ckpt_mon")
    q.awaitTermination(600)
    pipe._continuity_query.awaitTermination(600)
    latest = pipe.latest_continuity()
    assert set(latest) == {"0", "1", "2", "3"}   # one key per epoch
    for e, r in latest.items():
        lo = int(e) * 300
        assert (r["lo_seq"], r["hi_seq"], r["n_events"], r["missing"]) == (
            lo, lo + 299, 300, 0
        )
    # the apply stream itself reached the oracle state
    from tests.helpers import assert_state_equal, oracle_replay
    assert_state_equal(pipe.table.read(), oracle_replay(ev.collect()))

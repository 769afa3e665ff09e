"""File sources + generic changelog adapter (reference file-connector
family analog) feeding the real pipeline end-to-end."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from tapdata_connectors_spark.sources.file_source import (
    ChangelogMapping,
    changelog_to_events,
    load_table,
)
from tapdata_connectors_spark.sources.generator import stage_events
from tapdata_connectors_spark.streaming.driver import CdcPipeline
from tests.helpers import assert_state_equal, oracle_replay

CSV_SCHEMA = T.StructType([
    T.StructField("page", T.StringType()),
    T.StructField("pos", T.LongType()),
    T.StructField("action", T.StringType()),
    T.StructField("at", T.TimestampType()),
    T.StructField("body", T.StringType()),
])

ROWS = [
    ("u1", 1, "insert", "2024-01-01 00:00:01", "<p>a</p>"),
    ("u2", 2, "insert", "2024-01-01 00:00:02", "<p>b</p>"),
    ("u1", 3, "update", "2024-01-01 00:00:03", "<p>a2</p>"),
    ("u2", 4, "delete", "2024-01-01 00:00:04", None),
    ("u3", 5, "insert", "2024-01-01 00:00:05", "<p>c &amp; d</p>"),
]


def test_csv_changelog_roundtrip(spark, tmpdir_):
    df = spark.createDataFrame(
        [(p, n, a, t, b) for p, n, a, t, b in ROWS],
        "page string, pos long, action string, at string, body string",
    )
    df.write.option("header", True).csv(f"{tmpdir_}/csv")

    loaded = load_table(
        spark, f"{tmpdir_}/csv", fmt="csv", schema=CSV_SCHEMA,
        options={"header": "true", "timestampFormat": "yyyy-MM-dd HH:mm:ss"},
    )
    ev = changelog_to_events(
        loaded.withColumn("body_bin", loaded["body"].cast("binary")),
        ChangelogMapping(key="page", seq="pos", op="action", ts="at",
                         html="body_bin", epoch_size=3),
    )
    assert ev.count() == 5
    stage_events(ev, f"{tmpdir_}/staging")
    pipe = CdcPipeline(spark, f"{tmpdir_}/pages", f"{tmpdir_}/staging", n_buckets=2)
    pipe.replay_batch()
    state = {r["url"]: r["text"] for r in pipe.table.read().collect()}
    assert state == {"u1": "a2", "u3": "c & d"}  # u2 deleted; text extracted
    assert_state_equal(pipe.table.read(), oracle_replay(ev.collect()))


def test_load_table_requires_schema_for_csv(spark, tmpdir_):
    with pytest.raises(ValueError):
        load_table(spark, f"{tmpdir_}/nope", fmt="csv")
    with pytest.raises(ValueError):
        load_table(spark, f"{tmpdir_}/nope", fmt="xml")


def test_kafka_stub_fails_cleanly(spark):
    from tapdata_connectors_spark.sources.file_source import kafka_changelog_stream
    with pytest.raises(RuntimeError, match="kafka"):
        kafka_changelog_stream(spark, "localhost:9092", "t")


def test_parse_kafka_events_json_mapping(spark):
    # the Kafka value-decode step, testable without the connector jar
    import json

    from tapdata_connectors_spark.sources.file_source import parse_kafka_events

    msgs = [
        {"event_seq": 1, "epoch": 0, "op": "I", "url": "u1",
         "warc_ts": "2024-01-01T00:00:01.000Z",
         "after": {"url": "u1", "warc_ts": "2024-01-01T00:00:01.000Z",
                   "lang": "en"},
         "exactly_once_id": "k_0_1", "ts_ms": 1},
        {"event_seq": 2, "epoch": 0, "op": "D", "url": "u1",
         "warc_ts": "2024-01-01T00:00:02.000Z",
         "exactly_once_id": "k_0_2", "ts_ms": 2},
    ]
    df = spark.createDataFrame([(json.dumps(m).encode(),) for m in msgs],
                               "value binary")
    out = {r["event_seq"]: r for r in parse_kafka_events(df).collect()}
    assert out[1]["op"] == "I" and out[1]["after"]["lang"] == "en"
    assert out[1]["url"] == "u1" and out[1]["warc_ts"] is not None
    assert out[2]["op"] == "D" and out[2]["after"] is None
    # malformed JSON -> all-null row (skipped downstream as null-PK)
    bad = spark.createDataFrame([(b"{not json",)], "value binary")
    r = parse_kafka_events(bad).collect()[0]
    assert r["url"] is None and r["op"] is None


def test_kafka_stream_options_contract():
    """Jar-free contract test of the readStream wiring (VERDICT r2 item
    9): the exact option map handed to format('kafka'), including the
    per-partition-offset resume form and backpressure, with validation
    errors for the malformed cases."""
    from tapdata_connectors_spark.sources.file_source import kafka_stream_options

    opts = kafka_stream_options("b1:9092,b2:9092", "cdc_topic")
    assert opts == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "cdc_topic",
        "startingOffsets": "earliest",
        "failOnDataLoss": "true",
    }
    # resume from saved per-partition offsets (KafkaOffset.java analog)
    opts = kafka_stream_options(
        "b:9092", "t", starting_offsets='{"t": {"0": 1234, "1": 99}}',
        max_offsets_per_trigger=50_000,
    )
    assert opts["startingOffsets"] == '{"t": {"0": 1234, "1": 99}}'
    assert opts["maxOffsetsPerTrigger"] == "50000"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="required"):
        kafka_stream_options("", "t")
    with _pytest.raises(ValueError, match="offset JSON"):
        kafka_stream_options("b:9092", "t", starting_offsets="bogus")
    with _pytest.raises(ValueError, match="keyed by topic"):
        kafka_stream_options("b:9092", "t", starting_offsets="[1,2]")
    with _pytest.raises(ValueError, match="positive"):
        kafka_stream_options("b:9092", "t", max_offsets_per_trigger=0)

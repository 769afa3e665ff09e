"""Adapter: external changelog table → the engine's CDC event schema.

The analog of a reference source connector's wrap step (SourceRecord →
TapRecordEvent, MysqlReader.java:563-692; Kafka topic-as-table,
kafka-enhanced KafkaConsumerService): any append-only table with
(key, op, payload, position) columns becomes an EVENTS_SCHEMA DataFrame the
pipeline can replay. Used by the driver-contract flagship to turn the
provided `events` test table into a page changelog — every column a pure
JVM expression, no Python."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tapdata_connectors_spark.schema import EVENTS_SCHEMA

# driver `events` op mapping: signup=I, click/view/purchase=U, error=D
_OP = (
    F.when(F.col("event_type") == "signup", F.lit("I"))
    .when(F.col("event_type") == "error", F.lit("D"))
    .otherwise(F.lit("U"))
)


def events_table_to_cdc(
    events: DataFrame, epoch_size: int = 500, validate_order: bool = True
) -> DataFrame:
    """Map the driver's events table (event_id, ts, user_id, event_type,
    value, props) to EVENTS_SCHEMA: user_id becomes the page url, props
    becomes a synthetic html payload.

    `validate_order=True` fails loudly if `ts` is not non-decreasing in
    `event_id` — the staging contract the two-phase fold depends on
    (operators/ordering.py)."""
    if validate_order:
        from tapdata_connectors_spark.operators.ordering import (
            require_seq_ts_order,
        )

        require_seq_ts_order(events, seq_col="event_id", ts_col="ts")
    url = F.concat(F.lit("https://user.example.org/u/"), F.col("user_id").cast("string"))
    html = F.encode(
        F.concat(
            F.lit("<html><body><h1>u"), F.col("user_id").cast("string"),
            F.lit("</h1><p>"), F.col("event_type"),
            F.lit(" value="), F.col("value").cast("string"),
            F.lit("</p><pre>"), F.coalesce(F.col("props"), F.lit("")),
            F.lit("</pre></body></html>"),
        ),
        "UTF-8",
    )
    lang = F.element_at(
        F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("es")),
        (F.pmod(F.col("user_id"), F.lit(4)) + 1).cast("int"),
    )
    op = _OP
    after = F.when(
        op != "D",
        F.struct(
            url.alias("url"),
            F.col("ts").alias("warc_ts"),
            html.alias("html"),
            lang.alias("lang"),
        ),
    )
    out = events.select(
        F.col("event_id").alias("event_seq"),
        (F.col("event_id") / F.lit(epoch_size)).cast("int").alias("epoch"),
        op.alias("op"),
        url.alias("url"),
        F.col("ts").alias("warc_ts"),
        F.lit(None).cast(EVENTS_SCHEMA["before"].dataType).alias("before"),
        after.alias("after"),
        F.lit(None).cast(EVENTS_SCHEMA["removed_fields"].dataType).alias("removed_fields"),
        F.lit(None).cast(EVENTS_SCHEMA["extras"].dataType).alias("extras"),
        F.lit(None).cast(EVENTS_SCHEMA["ddl"].dataType).alias("ddl"),
        F.concat(F.lit("ev_"), F.col("event_id").cast("string")).alias("exactly_once_id"),
        (F.unix_timestamp("ts") * 1000).alias("ts_ms"),
    )
    return out

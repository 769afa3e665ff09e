"""Event-stream normalization: PK resolution, key-change splits.

Reproduces two reference behaviors the raw fold cannot express:

- **Update-of-PK**: an update whose before-image key differs from its
  after-image key is a MOVE — the reference applies it as delete(old key)
  + insert(new row) (hudi-connector ClientPerformer.java:107-132,
  HuDiWriteBySparkClient.java:105-210). The fold groups by key, so the
  split must happen before it: one event row becomes a 'D' row for the old
  key and an 'I' row for the new key, both at the event's (warc_ts,
  event_seq) order. The after image is taken as the full image of the new
  row (insert semantics: unmentioned columns are null).

- **PK resolution**: the effective key is COALESCE(event.url, after.url,
  before.url) — deletes from Debezium-shaped sources often carry the key
  only in the before image (DbKit.getBeforeForUpdate analog). Rows with no
  derivable key are left with url=null for the caller to skip-and-count
  (NormalWriteRecorder.java:210-226 logs and skips null-PK records).

Both are map-only (one explode, no shuffle) — safe on the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tapdata_connectors_spark.schema import EVENTS_SCHEMA

def _null(col: str) -> F.Column:
    return F.lit(None).cast(EVENTS_SCHEMA[col].dataType)


def drop_loopback_events(df: DataFrame, pipeline_id: str,
                         tag_key: str = "_origin") -> DataFrame:
    """Double-active (bidirectional sync) loop filter: drop events whose
    origin tag equals this pipeline's own id — i.e. rows this pipeline
    wrote that a bidirectional peer reflected back. The reference tags
    records with a double-active marker field and filters them on the
    return path (connectors-common double-active handling in the write
    recorders); here the tag rides the `extras` map. Map-only; events
    with no tag (unidirectional sources) pass through untouched."""
    tag = F.element_at(F.col("extras"), tag_key)
    return df.filter(tag.isNull() | (tag != F.lit(pipeline_id)))


def tag_origin(df: DataFrame, pipeline_id: str,
               tag_key: str = "_origin") -> DataFrame:
    """Stamp outgoing events with this pipeline's origin id (the write
    half of the double-active protocol — what a bidirectional peer's
    drop_loopback_events will filter). Re-tagging an already-tagged event
    (the natural case when relaying rows that arrived from a peer) REPLACES
    the tag: the key is stripped before map_concat, because Spark's default
    spark.sql.mapKeyDedupPolicy=EXCEPTION makes a duplicate key a runtime
    error, not a last-win."""
    existing = F.coalesce(
        F.col("extras"), F.create_map().cast(EVENTS_SCHEMA["extras"].dataType)
    )
    tagged = F.map_concat(
        F.map_filter(existing, lambda k, _v: k != F.lit(tag_key)),
        F.create_map(F.lit(tag_key), F.lit(pipeline_id)),
    )
    return df.withColumn("extras", tagged)


def normalize_events(dml: DataFrame) -> DataFrame:
    """Resolve the effective PK and split key-changing updates into
    delete(old)+insert(new) pairs. Input/output: EVENTS_SCHEMA DML rows
    (op I/U/D; DDL rows pass through untouched). Rows whose key cannot be
    resolved keep url=null — callers count and drop them.
    """
    url = F.coalesce(F.col("url"), F.col("after.url"), F.col("before.url"))
    is_pkc = (
        (F.col("op") == "U")
        & F.col("before.url").isNotNull()
        & url.isNotNull()
        & (F.col("before.url") != url)
    )
    # one row for normal events; (delete-old, insert-new) for key changes
    part = F.when(is_pkc, F.array(F.lit("D"), F.lit("I"))).otherwise(
        F.array(F.lit(""))
    )
    d = dml.withColumn("_pkc", F.explode(part))
    pkc_d = F.col("_pkc") == "D"
    pkc_i = F.col("_pkc") == "I"
    return d.select(
        F.col("event_seq"),
        F.col("epoch"),
        F.when(pkc_d, F.lit("D")).when(pkc_i, F.lit("I")).otherwise(F.col("op")).alias("op"),
        F.when(pkc_d, F.col("before.url")).otherwise(url).alias("url"),
        F.col("warc_ts"),
        F.when(pkc_d | pkc_i, _null("before")).otherwise(F.col("before")).alias("before"),
        F.when(pkc_d, _null("after")).otherwise(F.col("after")).alias("after"),
        F.when(pkc_d, _null("removed_fields")).otherwise(F.col("removed_fields")).alias("removed_fields"),
        F.when(pkc_d, _null("extras")).otherwise(F.col("extras")).alias("extras"),
        F.col("ddl"),
        F.when(
            pkc_d | pkc_i, F.concat(F.col("exactly_once_id"), F.lit("_"), F.col("_pkc"))
        ).otherwise(F.col("exactly_once_id")).alias("exactly_once_id"),
        F.col("ts_ms"),
    )

"""Canonical schemas for the CDC ingest engine.

Mirrors the reference's uniform row-event model (TapRecordEvent family —
see SURVEY.md §1.1; wrapping at
/root/reference/connectors-common/mysql-core/src/main/java/io/tapdata/connector/mysql/MysqlReader.java:633-686)
re-expressed as one columnar events DataFrame, and the target `pages` table
per BASELINE.json input_hint: (url, warc_ts, html, text, lang).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Target table: Common-Crawl-style web pages (input_hint shape).
# `text` is derived in-pipeline from `html` by the Arrow pandas UDF.
# Payload columns (everything except the key) participate in the
# last-writer-wins fold; `url` is the primary/merge key
# (reference: tapTable.primaryKeys(), NormalWriteRecorder.java:60-80).
# ---------------------------------------------------------------------------
PAGES_KEY = "url"

PAGES_FIELDS = [
    ("url", T.StringType(), False),
    ("warc_ts", T.TimestampType(), True),
    ("html", T.BinaryType(), True),
    ("text", T.StringType(), True),
    ("lang", T.StringType(), True),
]

PAGES_SCHEMA = T.StructType(
    [T.StructField(n, t, nullable) for n, t, nullable in PAGES_FIELDS]
)

# Payload columns carried inside CDC before/after images (no derived `text`;
# events never carry text — FIXTURES.md §2).
IMAGE_FIELDS = [
    ("url", T.StringType()),
    ("warc_ts", T.TimestampType()),
    ("html", T.BinaryType()),
    ("lang", T.StringType()),
]

IMAGE_SCHEMA = T.StructType([T.StructField(n, t, True) for n, t in IMAGE_FIELDS])

# Columns of the image that are foldable payload (key excluded).
IMAGE_PAYLOAD_COLS = ["warc_ts", "html", "lang"]

# ---------------------------------------------------------------------------
# CDC event staging schema (FIXTURES.md §2). One row per change event:
#   op: 'I' | 'U' | 'D' | 'DDL'   (ref op codes c/u/d: MysqlReader.java:901-928)
#   event_seq: global monotone source order (binlog position / LSN analog)
#   epoch: micro-batch tag for idempotent MERGE
#   before/after: row images (TapUpdateRecordEvent{before, after})
#   removed_fields: Mongo-style explicit column nulling
#       (MongodbV4StreamReader.java:317-335)
#   extras: generically-typed values for columns added by DDL after the
#       staging schema was fixed (how a binlog delivers unknown columns);
#       keyed by the column's name as of the event's position in the log
#   ddl: typed schema-change event (TapNewFieldEvent / TapAlterFieldNameEvent
#       / TapAlterFieldAttributesEvent analogs, SURVEY.md §2.9)
#   exactly_once_id: 'file_pos_row_event'-shaped id (MysqlReader.java:851-854)
# ---------------------------------------------------------------------------
DDL_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType(), True),  # ADD_COLUMN|RENAME_COLUMN|TYPE_WIDEN|DROP_COLUMN
        T.StructField("column", T.StringType(), True),
        T.StructField("new_name", T.StringType(), True),
        T.StructField("new_type", T.StringType(), True),  # spark simpleString, e.g. 'bigint'
        # ADD COLUMN attribute specs (MysqlAddColumnDDLWrapper.java:35-98
        # parses DEFAULT / NOT NULL / COMMENT into TapField):
        T.StructField("new_default", T.StringType(), True),  # string repr, cast by type
        T.StructField("not_null", T.BooleanType(), True),
        T.StructField("comment", T.StringType(), True),
    ]
)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_seq", T.LongType(), False),
        T.StructField("epoch", T.IntegerType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("before", IMAGE_SCHEMA, True),
        T.StructField("after", IMAGE_SCHEMA, True),
        T.StructField("removed_fields", T.ArrayType(T.StringType()), True),
        T.StructField("extras", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("ddl", DDL_SCHEMA, True),
        T.StructField("exactly_once_id", T.StringType(), True),
        T.StructField("ts_ms", T.LongType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Lineage / metrics table (FIXTURES.md §3): one row per (epoch, sub-epoch)
# merge application. WriteListResult analog
# (reference: WriteListResult{inserted,modified,removed} —
#  HuDiWriteBySparkClient.java:90-98).
# ---------------------------------------------------------------------------
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("epoch", T.IntegerType(), False),
        T.StructField("sub_epoch", T.IntegerType(), False),
        # partition_id = target bucket (hash partition of the merge key):
        # lineage is per (epoch, slice, partition) per the north rule
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("offset_start", T.LongType(), True),
        T.StructField("offset_end", T.LongType(), True),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("n_insert", T.LongType(), True),
        T.StructField("n_update", T.LongType(), True),
        T.StructField("n_delete", T.LongType(), True),
        T.StructField("n_ddl", T.LongType(), True),
        T.StructField("n_dupes_dropped", T.LongType(), True),
        T.StructField("merge_added", T.LongType(), True),
        T.StructField("merge_updated", T.LongType(), True),
        T.StructField("merge_deleted", T.LongType(), True),
        T.StructField("wall_ms", T.LongType(), True),
    ]
)

# Hidden engine columns on the lake table (never user-visible):
#   _event_seq — last applied source sequence per key; the merge guard
#       `incoming.seq > target._event_seq` makes replay idempotent under
#       duplicate / out-of-order cross-epoch redelivery (the reference's
#       exactlyOnceId redelivery dedup, MysqlReader.java:851-854, and
#       Hudi's precombine-field UPSERT ordering,
#       HuDiWriteBySparkClient.java — SURVEY.md §2.8).
#   _deleted — tombstone flag: deletes keep the key + seq so stale
#       pre-delete redeliveries can't resurrect a row; filtered on read.
SEQ_COL = "_event_seq"
TOMBSTONE_COL = "_deleted"
HIDDEN_COLS = [SEQ_COL, TOMBSTONE_COL]

# The LWW ordering column: merges, MOR resolution and the cross-batch stale
# guard all order on (ORDERING_COL, event_seq). It is engine-critical — DDL
# may not rename or drop it (lake/table.py guards), like the merge key.
ORDERING_COL = "warc_ts"

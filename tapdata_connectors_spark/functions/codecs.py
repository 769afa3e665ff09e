"""Value codecs: complex-type → JSON, zoned-timestamp decode, decimals.

The reference serializes non-scalar values (maps/arrays/documents) to JSON
strings when the target is a SQL column (connectors-common sql-core value
handling; Mongo → MySQL replication stores sub-documents as JSON), and
normalizes zoned datetimes to UTC instants (TapDateTimeValue carries a
zone; engines compare instants). These are the Spark-native equivalents —
all built-in JVM expressions, no UDFs.

Determinism note: `to_json` on a MAP emits entries in the map's internal
order, which is not stable across engines — `map_to_json_sorted` fixes
the entry order first (array_sort on entries), so the JSON text is a
deterministic function of the map's CONTENT and safe to hash, checksum,
or oracle-compare.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def map_to_json_sorted(col: Column) -> Column:
    """map<string,V> → JSON text with keys in lexicographic order (stable
    across engines/partitionings; plain to_json would leak hash order)."""
    entries = F.array_sort(F.map_entries(col))
    return F.to_json(F.map_from_entries(entries))


def complex_to_json(col: Column) -> Column:
    """struct/array → JSON text (field order of a struct is schema order,
    already deterministic). For maps use map_to_json_sorted."""
    return F.to_json(col)


def zoned_ts_utc(col: Column) -> Column:
    """ISO-8601 zoned datetime string → UTC timestamp instant. With the
    engine's UTC session (session.py) the stored value is the instant —
    '2024-01-15T12:00:00+02:00' and '2024-01-15T10:00:00Z' land equal,
    the reference's TapDateTimeValue normalization."""
    return F.to_timestamp(col)


def decimal_str(col: Column, precision: int, scale: int) -> Column:
    """String/number → exact decimal(p,s). The lake's decimal columns
    (lake/table.type_of) round-trip through this cast; values that do not
    fit raise under ANSI mode rather than silently truncating."""
    return col.cast(f"decimal({precision},{scale})")

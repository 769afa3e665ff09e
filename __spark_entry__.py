"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship — replays the sf0.001 ``events`` table as a CDC
  changelog through the full engine (adapter → LWW fold → Arrow text
  extraction → copy-on-write MERGE into the lake table) and returns the
  final replica state.
- ``queries()`` / ``oracle_sql()``: operator registry with DuckDB oracles
  (tapdata_connectors_spark/queries.py).
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF_SMOKE = "/root/testdata/sf0.001"

# continuity dict of the last entry() run ({epoch -> row}) — the flagship
# test asserts gap-free epochs from here (entry itself raises on gaps)
LAST_CONTINUITY: dict = {}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: end-to-end CDC replay of the sf0.001 events changelog into
    a pages lake table; returns the post-merge visible state. The
    continuity monitor (the reference's heartbeat/binlog-position analog)
    runs over the same staged log as a side-output and the flagship FAILS
    on any sequence gap — liveness is load-bearing, not just wired."""
    from tapdata_connectors_spark.sources.events_adapter import events_table_to_cdc
    from tapdata_connectors_spark.sources.generator import stage_events
    from tapdata_connectors_spark.streaming.driver import CdcPipeline

    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    cdc = events_table_to_cdc(events, epoch_size=250)
    tmp = tempfile.mkdtemp(prefix="flagship_")
    stage_events(cdc, f"{tmp}/staging")
    pipe = CdcPipeline(spark, f"{tmp}/pages", f"{tmp}/staging", n_buckets=8)
    pipe.replay_batch()
    mon = pipe.start_continuity_monitor(f"{tmp}/ckpt_mon")
    mon.awaitTermination(600)
    latest = pipe.latest_continuity()
    LAST_CONTINUITY.clear()
    LAST_CONTINUITY.update(latest)
    if not latest:
        raise RuntimeError("flagship continuity monitor produced no rows")
    gaps = {k: r["missing"] for k, r in latest.items() if r["missing"] > 0}
    if gaps:
        raise RuntimeError(f"flagship replay has sequence gaps: {gaps}")
    return pipe.table.read().orderBy("url")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from tapdata_connectors_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from tapdata_connectors_spark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)

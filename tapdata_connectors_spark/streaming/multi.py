"""Multi-table replication: route one event stream to N lake tables.

The reference replicates many tables through one engine connection and
groups uploads per table (TapEventCollector.java:170-202 keys its pending
queues by tableId; CommonDbConnector routes writeRecord per TapTable).
Here the staging area is PARTITIONED by table_id (sources/generator.
stage_events_multi), so routing is a directory fan-out — each table gets
its own CdcPipeline + LakeTable and replays its own epochs. Tables are
independent, so cross-table concurrency is free parallelism (driver
threads launching concurrent Spark jobs over disjoint data).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from tapdata_connectors_spark.streaming.driver import CdcPipeline


class MultiTableReplicator:
    """One CdcPipeline per `table_id=` subdirectory of a multi-table
    staging area. Table paths are `<tables_root>/<table_id>`."""

    def __init__(
        self,
        spark: SparkSession,
        tables_root: str,
        staging_path: str,
        **pipeline_kwargs,
    ):
        self.spark = spark
        self.tables_root = tables_root
        self.staging_path = staging_path
        self.pipeline_kwargs = pipeline_kwargs
        self._pipes: dict[str, CdcPipeline] = {}

    def table_ids(self) -> list[str]:
        return sorted(
            d.split("=", 1)[1]
            for d in os.listdir(self.staging_path)
            if d.startswith("table_id=")
        )

    def pipeline(self, table_id: str) -> CdcPipeline:
        if table_id not in self._pipes:
            self._pipes[table_id] = CdcPipeline(
                self.spark,
                table_path=os.path.join(self.tables_root, table_id),
                staging_path=os.path.join(self.staging_path, f"table_id={table_id}"),
                **self.pipeline_kwargs,
            )
        return self._pipes[table_id]

    def replay_batch(self, max_concurrent_tables: int = 1) -> dict[str, list[dict]]:
        """Replay every table's staged epochs; returns per-table metrics.
        max_concurrent_tables > 1 replays tables as concurrent Spark jobs
        (disjoint inputs and outputs — no coordination needed beyond the
        per-table manifest locks)."""
        tids = self.table_ids()
        if max_concurrent_tables <= 1 or len(tids) <= 1:
            return {tid: self.pipeline(tid).replay_batch() for tid in tids}

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=max_concurrent_tables) as ex:
            results = ex.map(lambda t: (t, self.pipeline(t).replay_batch()), tids)
            return dict(results)

"""spark-submit entry point: staged binlog replay -> lake MERGE.

The north rule's deployable shape — the job ships as

    spark-submit --master <cluster> [--deploy-mode cluster] \
        --py-files dist/tapdata_connectors_spark.zip \
        jobs/replay_job.py --staging <dir> --table <dir> [options]

with the engine imported from the --py-files zip on driver and
executors (build it with tapdata_connectors_spark.packaging
.build_pyfiles_zip). Cluster topology (master, executor count/memory,
shuffle partitions) belongs to the submit command line; this main never
sets a master (session.submit_session). Reference analog: Tapdata boots
a connector task from a deployable jar + task config
(connectors-common's ConnectorBase lifecycle); here the zip is the
artifact and these flags are the task config.

Prints exactly ONE JSON line on stdout (everything else goes to
stderr/log4j) so schedulers can parse the outcome.

For smoke/demo runs without an upstream staging area, --generate-events
synthesizes the deterministic CDC event log first (same generator the
test suite and bench use), so a single submit is end-to-end runnable.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def parse_args(argv: list[str]) -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--staging", required=True, help="staged event-log dir")
    p.add_argument("--table", required=True, help="lake table dir")
    p.add_argument("--bootstrap", default=None, metavar="PARQUET_DIR",
                   help="initial full-table snapshot (url, warc_ts, html[, "
                        "text, lang] parquet) loaded BEFORE tailing the "
                        "staged log — the reference's snapshot-then-CDC "
                        "flow; skipped if the table already exists")
    p.add_argument("--lineage", default=None,
                   help="lineage/metrics table dir (default: <table>/_lineage)")
    p.add_argument("--n-buckets", type=int, default=64)
    p.add_argument("--mode", choices=("batch", "stream"), default="batch",
                   help="batch = replay_batch over the staged log; stream = "
                        "Structured Streaming over the epoch-marker stream "
                        "(availableNow trigger), resumable via --checkpoint")
    p.add_argument("--checkpoint", default=None,
                   help="streaming checkpoint dir (required for --mode stream)")
    p.add_argument("--merge-mode", choices=("cow", "mor"), default="mor")
    p.add_argument("--epoch-batch", type=int, default=16,
                   help="epochs per chunked MOR apply job (0 = per-epoch)")
    p.add_argument("--compact-every", type=int, default=8)
    p.add_argument("--final-compact", action="store_true",
                   help="compact all delta files after replay")
    p.add_argument("--start-at", default=None, metavar="ISO_TS",
                   help="resume point: skip epochs before this timestamp")
    p.add_argument("--monitor-continuity", default=None, metavar="CKPT_DIR",
                   help="run the liveness/continuity side-stream with this "
                        "checkpoint dir and include its verdict in the summary")
    p.add_argument("--app-name", default="tds-replay")
    # synthetic staging (smoke/demo): generator parameters
    p.add_argument("--generate-events", type=int, default=0)
    p.add_argument("--generate-urls", type=int, default=0,
                   help="distinct urls for --generate-events (default n/40)")
    p.add_argument("--epoch-size", type=int, default=0,
                   help="events per epoch for --generate-events (default n/32)")
    p.add_argument("--html-kb", type=int, default=1)
    return p.parse_args(argv)


def main(argv: list[str] | None = None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])

    # imports AFTER arg parsing: under spark-submit these resolve from the
    # --py-files zip; a bad submit fails fast on argparse, not on import
    import tapdata_connectors_spark
    from tapdata_connectors_spark.session import submit_session
    from tapdata_connectors_spark.streaming import CdcPipeline

    spark = submit_session(app_name=args.app_name)

    generate_sec = 0.0
    if args.generate_events > 0:
        from tapdata_connectors_spark.sources import (
            GeneratorConfig, generate_events, stage_events,
        )
        t0 = time.time()
        n = args.generate_events
        cfg = GeneratorConfig(
            n_events=n,
            n_urls=args.generate_urls or max(10, n // 40),
            epoch_size=args.epoch_size or max(100, n // 32),
            p_hot=0.1, p_dup=0.01, p_update=0.35, p_delete=0.10,
            html_kb=args.html_kb,
        )
        stage_events(generate_events(spark, cfg), args.staging)
        generate_sec = time.time() - t0

    pipe = CdcPipeline(
        spark, args.table, args.staging,
        lineage_path=args.lineage,
        n_buckets=args.n_buckets,
        merge_mode=args.merge_mode,
        compact_every=args.compact_every,
    )
    bootstrapped = False
    if args.bootstrap and not pipe.table.exists():
        pipe.bootstrap_snapshot(spark.read.parquet(args.bootstrap))
        bootstrapped = True
    pipe.init_table()
    start_epoch = None
    if args.start_at:
        start_epoch = pipe.start_at(args.start_at)

    monitor = None
    if args.monitor_continuity:
        monitor = pipe.start_continuity_monitor(args.monitor_continuity)

    t0 = time.time()
    if args.mode == "stream":
        if not args.checkpoint:
            raise SystemExit("--mode stream requires --checkpoint")
        # run_stream returns no per-chunk results; diff the applied-epoch
        # guard keys across the run so a scheduler parsing the summary can
        # tell an applying run from a no-op resume (advisor item).
        # `chunks_skipped` is structurally unknowable here — null, never 0.
        pre_keys = set(pipe.table.manifest().applied_epochs)
        q = pipe.run_stream(args.checkpoint,
                            epoch_batch=args.epoch_batch or None)
        q.awaitTermination()
        results = []
        applied = len(set(pipe.table.manifest().applied_epochs) - pre_keys)
        skipped = None
    else:
        results = pipe.replay_batch(epoch_batch=args.epoch_batch or None)
        applied = sum(1 for m in results if not m.get("skipped"))
        skipped = sum(1 for m in results if m.get("skipped"))
    if args.final_compact:
        pipe.table.compact()
    replay_sec = time.time() - t0
    pipe.flush_lineage()

    continuity = None
    if monitor is not None:
        monitor.awaitTermination()
        rows = pipe.latest_continuity().values()
        continuity = {
            "keys": len(rows),
            "gap_free": all(int(r["missing"] or 0) == 0 for r in rows),
        }

    from pyspark.sql import functions as F
    lin = pipe.lineage().agg(
        F.sum("n_events").alias("ev"),
        F.sum("merge_added").alias("a"),
        F.sum("merge_updated").alias("u"),
        F.sum("merge_deleted").alias("d"),
    ).collect()[0]
    summary = {
        "job": "replay",
        "engine_path": tapdata_connectors_spark.__file__,
        "master": spark.sparkContext.master,
        "table": args.table,
        "bootstrapped": bootstrapped,
        "mode": args.mode,
        "merge_mode": args.merge_mode,
        "generate_sec": round(generate_sec, 2),
        "replay_sec": round(replay_sec, 2),
        "chunks_applied": applied,
        "chunks_skipped": skipped,
        "start_epoch": start_epoch,
        "final_rows": pipe.table.read().count(),
        "lineage_events": int(lin["ev"] or 0),
        "lineage_merge": {"added": int(lin["a"] or 0),
                          "updated": int(lin["u"] or 0),
                          "deleted": int(lin["d"] or 0)},
        "continuity": continuity,
    }
    print(json.dumps(summary), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

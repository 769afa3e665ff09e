"""spark-submit entry point: lake-table curation pipeline.

The training-data side of the deployable story (jobs/replay_job.py is
the ingest side): run any combination of the engine's curation stages
against an already-replayed pages table, as one submit —

    spark-submit --master <cluster> \
        --py-files dist/tapdata_connectors_spark.zip \
        jobs/curate_job.py --table <dir> --staging <dir> \
        [--dedup exact|minhash|simhash|embedding [--closure]] \
        [--prune] [--cut] [--refresh-links <dir>] [--refresh-grams <dir>] \
        [--incremental] [--tag N]

Stages run in pipeline order (dedup -> prune -> cut -> index refreshes)
and each is idempotent per --tag through the engine's epoch-key guards,
so re-submitting the same job is a no-op — the same exactly-once
contract the replay job has. Prints ONE JSON line with every stage's
report (rewrites/tombstones/adjusted counts ride through from the
engine)."""

from __future__ import annotations

import argparse
import json
import sys
import time


def parse_args(argv: list[str]) -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--table", required=True)
    p.add_argument("--staging", required=True,
                   help="the table's staging dir (pipeline context)")
    p.add_argument("--n-buckets", type=int, default=64)
    p.add_argument("--merge-mode", choices=("cow", "mor"), default="mor")
    p.add_argument("--tag", default="0",
                   help="idempotence tag: stages skip if already applied")
    p.add_argument("--dedup", choices=("exact", "minhash", "simhash",
                                       "embedding"), default=None)
    p.add_argument("--closure", action="store_true",
                   help="connected-components survivorship for near-dup")
    p.add_argument("--prune", action="store_true",
                   help="tombstone pages failing the Gopher quality gate")
    p.add_argument("--cut", action="store_true",
                   help="exact-substring span removal (rewrite, not drop)")
    p.add_argument("--cut-n", type=int, default=5)
    p.add_argument("--cut-min-span", type=int, default=10)
    p.add_argument("--refresh-links", default=None, metavar="IDX_DIR",
                   help="maintain the incremental host link graph")
    p.add_argument("--refresh-grams", default=None, metavar="IDX_DIR",
                   help="maintain the incremental gram index (and use it "
                        "for --cut when --incremental)")
    p.add_argument("--incremental", action="store_true",
                   help="dedup since the last curation pass; cut through "
                        "the gram index instead of a full-corpus pass")
    p.add_argument("--since-version", type=int, default=None,
                   help="explicit incremental-dedup watermark (with "
                        "--incremental; default: full pass)")
    p.add_argument("--app-name", default="tds-curate")
    return p.parse_args(argv)


def main(argv: list[str] | None = None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])

    import tapdata_connectors_spark
    from tapdata_connectors_spark.lake.table import LakeTable
    from tapdata_connectors_spark.session import submit_session
    from tapdata_connectors_spark.streaming import (
        CdcPipeline,
        create_gram_index,
        create_link_index,
        cut_spans,
        cut_spans_incremental,
        dedup_pages,
        prune_pages,
        refresh_gram_index,
        refresh_link_index,
    )

    spark = submit_session(app_name=args.app_name)
    pipe = CdcPipeline(spark, args.table, args.staging,
                       n_buckets=args.n_buckets, merge_mode=args.merge_mode)
    t = pipe.init_table()
    t0 = time.time()
    stages: dict = {}

    if args.dedup:
        stages["dedup"] = dedup_pages(
            pipe, args.dedup, tag=args.tag, closure=args.closure,
            since_version=args.since_version if args.incremental else None,
        )
    if args.prune:
        stages["prune"] = prune_pages(
            pipe, tag=args.tag,
            since_version=args.since_version if args.incremental else None,
        )

    gram_idx = None
    if args.refresh_grams:
        try:
            gram_idx = create_gram_index(spark, args.refresh_grams,
                                         n_buckets=args.n_buckets)
        except FileExistsError:
            gram_idx = LakeTable(spark, args.refresh_grams)

    if args.cut:
        if args.incremental and gram_idx is not None:
            stages["cut"] = cut_spans_incremental(
                pipe, gram_idx, n=args.cut_n,
                min_span=args.cut_min_span, tag=args.tag)
        else:
            stages["cut"] = cut_spans(pipe, n=args.cut_n,
                                      min_span=args.cut_min_span,
                                      tag=args.tag)
    if gram_idx is not None:
        if args.cut and args.incremental:
            # cut_spans_incremental folded the window AND its own rewrites
            # into the index already; a second refresh here would be a
            # no-op commit — record that explicitly instead
            stages["gram_index"] = {"skipped": True,
                                    "reason": "refreshed inside incremental cut"}
        else:
            # covers both "no cut" and "full (non-incremental) cut": the
            # full cut path does not touch the index, so an explicitly
            # requested --refresh-grams must still fold the watermark
            # window (including the cut's own rewrites) — previously this
            # combination silently skipped the refresh (advisor item)
            stages["gram_index"] = refresh_gram_index(pipe, gram_idx,
                                                      n=args.cut_n)
    if args.refresh_links:
        try:
            link_idx = create_link_index(spark, args.refresh_links,
                                         n_buckets=args.n_buckets)
        except FileExistsError:
            link_idx = LakeTable(spark, args.refresh_links)
        stages["link_index"] = refresh_link_index(pipe, link_idx)

    summary = {
        "job": "curate",
        "engine_path": tapdata_connectors_spark.__file__,
        "table": args.table,
        "tag": args.tag,
        "wall_sec": round(time.time() - t0, 2),
        "live_rows": pipe.table.read().count(),
        "table_version": pipe.table.current_version(),
        "stages": stages,
    }
    print(json.dumps(summary, default=str), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

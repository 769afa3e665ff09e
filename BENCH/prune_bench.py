"""Metadata file-skipping effectiveness (lake/stats.py bounds).

Two scenarios, matching where each probe type wins at 100 TB:

1. APPEND-ONLY log lake (bootstrap/raw-events shape: every commit appends
   base files with narrow warc_ts/_event_seq bounds — no row is ever
   superseded). A "rows in the last-2-epochs window" probe should open
   ~2/N commits' files. This is the honest headline for time/offset range
   pruning: on update-heavy MOR buckets non-key predicates are
   bucket-granular by design (partial-update resolution needs both older
   and newer versions — see LakeTable.prune_entries), and that
   conservative count is ALSO reported.

2. CDC MOR lake for POINT LOOKUPS: hash-bucket pruning (1/n_buckets) +
   per-file key-bounds skipping (sound even in MOR: resolution is
   per-key) + pushed key equality hitting the parquet bloom filters
   row-group-side.

Wall times at local scale understate the win (files are hot in page
cache); the structural number that survives scale-up is files opened /
files live, because every opened file is remote IO on a real lake.

Run: python BENCH/prune_bench.py  (env: SPARK_GRAFT_PRUNE_EPOCHS,
SPARK_GRAFT_PRUNE_EVENTS override the default 40 x 2000).
"""

from __future__ import annotations

import datetime
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from tapdata_connectors_spark.session import build_session  # noqa: E402
from tapdata_connectors_spark.sources.generator import (  # noqa: E402
    GeneratorConfig,
    generate_events,
)
from tapdata_connectors_spark.streaming.driver import CdcPipeline  # noqa: E402


def med(xs):
    return sorted(xs)[len(xs) // 2]


def timed(df):
    t0 = time.time()
    n = df.count()
    return time.time() - t0, n


def main() -> None:
    epochs = int(os.environ.get("SPARK_GRAFT_PRUNE_EPOCHS", "40"))
    per_epoch = int(os.environ.get("SPARK_GRAFT_PRUNE_EVENTS", "2000"))
    spark = build_session(app_name="prune_bench")
    tmp = tempfile.mkdtemp(prefix="prune_bench_")

    ev = generate_events(spark, GeneratorConfig(
        n_events=epochs * per_epoch, n_urls=epochs * per_epoch // 4,
        epoch_size=per_epoch, p_update=0.35, p_delete=0.1)).persist()
    ev.count()

    # window = last ~2 epochs (warc_ts = 1.7e9s + seq*0.25s)
    base = datetime.datetime(1970, 1, 1) + datetime.timedelta(
        seconds=1_700_000_000)
    lo = base + datetime.timedelta(seconds=0.25 * per_epoch * (epochs - 2))
    hi = base + datetime.timedelta(seconds=0.25 * per_epoch * epochs)

    # ---- scenario 1: append-only log lake ----
    from tapdata_connectors_spark.lake import LakeTable

    log = LakeTable.create(
        spark, f"{tmp}/log",
        [("url", "string"), ("warc_ts", "timestamp"), ("html", "binary"),
         ("text", "string"), ("lang", "string")],
        key="url", n_buckets=8)
    ins = ev.select(
        "url", "warc_ts", F.col("after.html").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.col("after.lang").alias("lang"),
        F.col("event_seq").alias("_event_seq"),
        F.lit(False).alias("_deleted"), F.col("epoch"),
    ).filter(F.col("url").isNotNull())
    for e in range(epochs):
        batch = ins.filter(F.col("epoch") == e).drop("epoch") \
            .withColumn("_mb", log.bucket_expr("url"))
        log.commit_files(log.write_data_files(batch, "_mb"))
    m = log.manifest()
    log_files = len(m.files)
    log_kept = len(log.prune_entries(m, m.files, {"warc_ts": (lo, hi)}))

    full_t, pruned_t = [], []
    for _ in range(3):
        s, n_full = timed(log.read().filter(
            (F.col("warc_ts") >= lo) & (F.col("warc_ts") <= hi)))
        full_t.append(s)
        s, n_pruned = timed(log.read_range({"warc_ts": (lo, hi)}))
        pruned_t.append(s)
    assert n_full == n_pruned, (n_full, n_pruned)

    # ---- scenario 2: CDC MOR lake, point lookups ----
    pipe = CdcPipeline(spark, f"{tmp}/pages", f"{tmp}/staging",
                       n_buckets=8, merge_mode="mor", compact_every=10)
    for e in range(epochs):
        pipe.apply_epoch(ev.filter(F.col("epoch") == e), e)
    t = pipe.table
    m = t.manifest()
    cdc_files = len(m.files)
    kept_mor_window = len(t.prune_entries(m, m.files, {"warc_ts": (lo, hi)}))

    key = t.read().select("url").orderBy("url").limit(1).collect()[0]["url"]
    look_kept = len(t.prune_entries(m, m.files, {"url": (key, key)}))
    look_t, scan_t = [], []
    for _ in range(3):
        s, _ = timed(t.read().filter(F.col("url") == key))
        scan_t.append(s)
        s, _ = timed(t.lookup(key))
        look_t.append(s)

    out = {
        "metric": "metadata_prune",
        "epochs": epochs,
        "events": epochs * per_epoch,
        "log_files_live": log_files,
        "log_range_files_opened": log_kept,
        "log_range_rows": n_pruned,
        "log_range_full_sec": round(med(full_t), 3),
        "log_range_pruned_sec": round(med(pruned_t), 3),
        "log_range_raw": {"full": [round(x, 3) for x in full_t],
                          "pruned": [round(x, 3) for x in pruned_t]},
        "cdc_files_live": cdc_files,
        "cdc_window_files_kept_conservative": kept_mor_window,
        "cdc_lookup_files_opened": look_kept,
        "cdc_lookup_scan_sec": round(med(scan_t), 3),
        "cdc_lookup_pruned_sec": round(med(look_t), 3),
        "cdc_lookup_raw": {"scan": [round(x, 3) for x in scan_t],
                           "lookup": [round(x, 3) for x in look_t]},
    }
    with open(os.path.join(REPO, "BENCH", "prune_bench.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    ev.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()

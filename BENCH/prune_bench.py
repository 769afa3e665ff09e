"""Metadata file-skipping effectiveness: read_range / lookup vs full scan.

Builds a lake by replaying many small commits (the CDC shape: each commit's
files carry narrow _event_seq / warc_ts bounds), then measures a
time-window probe and a point lookup three ways:

  full   — read() + filter (no metadata skipping; parquet row-group
           pushdown still applies: this is the honest baseline)
  pruned — read_range()/lookup() (manifest-bounds skipping, bucket prune)

Reports wall times AND the structural number that survives scale-up:
files opened out of files live. At 100 TB the wall ratio approaches the
file ratio, because every opened file is remote IO.

Run: python BENCH/prune_bench.py   (env: SPARK_GRAFT_PRUNE_EPOCHS,
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


def main() -> None:
    epochs = int(os.environ.get("SPARK_GRAFT_PRUNE_EPOCHS", "40"))
    per_epoch = int(os.environ.get("SPARK_GRAFT_PRUNE_EVENTS", "2000"))
    spark = build_session(app_name="prune_bench")
    tmp = tempfile.mkdtemp(prefix="prune_bench_")
    pipe = CdcPipeline(spark, f"{tmp}/pages", f"{tmp}/staging",
                       n_buckets=8, merge_mode="mor", compact_every=10**9)
    ev = generate_events(spark, GeneratorConfig(
        n_events=epochs * per_epoch, n_urls=epochs * per_epoch // 4,
        epoch_size=per_epoch, p_update=0.35, p_delete=0.1))
    ev = ev.persist()
    ev.count()
    for e in range(epochs):
        pipe.apply_epoch(ev.filter(F.col("epoch") == e), e)
    t = pipe.table
    n_files = len(t.manifest().files)

    # probe: the last ~2 epochs' warc_ts window (the "what changed
    # recently" CDC read). warc_ts = 1.7e9s + seq*0.25s.
    base = datetime.datetime(1970, 1, 1) + datetime.timedelta(
        seconds=1_700_000_000)
    lo = base + datetime.timedelta(
        seconds=0.25 * per_epoch * (epochs - 2))
    hi = base + datetime.timedelta(seconds=0.25 * per_epoch * epochs)

    m = t.manifest()
    kept = t.prune_entries(m, m.files, {"warc_ts": (lo, hi)})

    def timed(df) -> tuple[float, int]:
        t0 = time.time()
        n = df.count()
        return time.time() - t0, n

    # interleave reps; keep the median
    full_t, pruned_t = [], []
    for _ in range(3):
        s, n_full = timed(
            t.read().filter((F.col("warc_ts") >= lo)
                            & (F.col("warc_ts") <= hi)))
        full_t.append(s)
        s, n_pruned = timed(t.read_range({"warc_ts": (lo, hi)}))
        pruned_t.append(s)
    assert n_full == n_pruned, (n_full, n_pruned)

    # point lookup vs full-scan equality
    key = t.read().select("url").orderBy("url").limit(1).collect()[0]["url"]
    look_t, scan_t = [], []
    for _ in range(3):
        s, _ = timed(t.read().filter(F.col("url") == key))
        scan_t.append(s)
        s, _ = timed(t.lookup(key))
        look_t.append(s)

    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    out = {
        "metric": "metadata_prune",
        "epochs": epochs,
        "events": epochs * per_epoch,
        "files_live": n_files,
        "range_files_opened": len(kept),
        "range_rows": n_pruned,
        "range_full_sec": round(med(full_t), 3),
        "range_pruned_sec": round(med(pruned_t), 3),
        "range_raw": {"full": [round(x, 3) for x in full_t],
                      "pruned": [round(x, 3) for x in pruned_t]},
        "lookup_scan_sec": round(med(scan_t), 3),
        "lookup_pruned_sec": round(med(look_t), 3),
        "lookup_raw": {"scan": [round(x, 3) for x in scan_t],
                       "lookup": [round(x, 3) for x in look_t]},
    }
    with open(os.path.join(REPO, "BENCH", "prune_bench.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    ev.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Per-stage 8-vs-32-core scaling breakdown (BASELINE.md evidence protocol).

The end-to-end replay mixes CPU phases (generation, fold, Arrow text
extraction) with IO phases (parquet write/commit) and serial driver work
(plan building, manifest commits). A noisy shared host can hide a real
serial phase inside wall-clock spread — this harness times each stage IN
ISOLATION at local[8] and local[32], interleaved A/B with multiple reps,
and reports per-stage medians + raw arrays + scaling efficiency
E = (T32/T8)/4 ... wait: E = (throughput32/throughput8)/(32/8) = T8/(4*T32).

Stages (all consume the same staged input, same seed):
  generate   distributed event synthesis (pure CPU, no IO)
  scan       staged parquet scan + decode (IO + decompress)
  fold       lww_fold two-phase (shuffle + hash agg + SHJ payload fetch)
  extract    Arrow pandas UDF html->text over folded winners (CPU)
  write      delta append (parquet encode + local FS write)
  resolve    MOR read-time resolution over all deltas (shuffle + agg)

Usage: python BENCH/stage_scaling.py [reps]   (writes BENCH/stage_scaling.json)
Env: SPARK_GRAFT_STAGE_EVENTS (default 2_000_000), SPARK_GRAFT_STAGE_KB (3).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_EVENTS = int(os.environ.get("SPARK_GRAFT_STAGE_EVENTS", "2000000"))
HTML_KB = int(os.environ.get("SPARK_GRAFT_STAGE_KB", "3"))
SCRATCH = os.environ.get("SPARK_GRAFT_SCRATCH") or (
    "/dev/shm/spark_graft_bench" if os.path.isdir("/dev/shm")
    else "/tmp/spark_graft_bench"
)
STAGING = f"{SCRATCH}/stage_ev_{N_EVENTS}_kb{HTML_KB}"

STAGE_SNIPPET = r"""
import json, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
cores = int(sys.argv[1]); stage = sys.argv[2]; staging = sys.argv[3]
n_events = int(sys.argv[4]); html_kb = int(sys.argv[5])

from pyspark.sql import functions as F
from tapdata_connectors_spark.session import build_session
from tapdata_connectors_spark.schema import EVENTS_SCHEMA
from tapdata_connectors_spark.operators.dedup import ColumnSpec, lww_fold
from tapdata_connectors_spark.functions.text_extract import extract_text_udf

import os as _os
conf = {{"spark.ui.showConsoleProgress": "false"}}
if _os.environ.get("SPARK_GRAFT_LOCAL_DIR"):
    conf["spark.local.dir"] = _os.environ["SPARK_GRAFT_LOCAL_DIR"]
spark = build_session(f"local[{{cores}}]", shuffle_partitions=cores,
                      extra_conf=conf)
PAYLOAD = [ColumnSpec("warc_ts", "timestamp", "image"),
           ColumnSpec("html", "binary", "image"),
           ColumnSpec("lang", "string", "image")]

def events():
    return spark.read.schema(EVENTS_SCHEMA).parquet(staging)

# warm the JVM/codegen/scheduler so stage time measures the stage, not startup
spark.range(2_000_000).select(F.sum(F.pmod(F.xxhash64("id"), F.lit(1000000)))).collect()
events().limit(1000).agg(F.count(F.lit(1))).collect()

t0 = time.time()
if stage == "generate":
    from tapdata_connectors_spark.sources import GeneratorConfig, generate_events
    cfg = GeneratorConfig(n_events=n_events, n_urls=max(1000, n_events // 8),
                          epoch_size=max(100_000, n_events // 8),
                          p_hot=0.1, p_dup=0.01, p_update=0.35, p_delete=0.10,
                          html_kb=html_kb)
    df = generate_events(spark, cfg)
    df.agg(F.sum(F.length(F.col("after.html"))), F.count(F.lit(1))).collect()
elif stage == "scan":
    events().agg(F.sum(F.length(F.col("after.html"))), F.count(F.lit(1))).collect()
elif stage == "fold":
    lww_fold(events(), PAYLOAD).agg(
        F.sum(F.length(F.col("html"))), F.count(F.lit(1))).collect()
elif stage == "extract":
    folded = lww_fold(events(), PAYLOAD)
    folded.select(extract_text_udf(F.col("html")).alias("t")).agg(
        F.sum(F.length(F.col("t")))).collect()
elif stage == "write":
    from tapdata_connectors_spark.streaming import CdcPipeline
    table = tempfile.mkdtemp(prefix="stage_write_")
    try:
        pipe = CdcPipeline(spark, table, staging, n_buckets=64,
                           merge_mode="mor", compact_every=10**9)
        pipe.replay_batch(max_concurrent_epochs=4)
    finally:
        shutil.rmtree(table, ignore_errors=True)
elif stage == "resolve":
    # prepared table path passed via argv[6]
    from tapdata_connectors_spark.lake.table import LakeTable
    t = LakeTable(spark, sys.argv[6])
    t.read_raw().agg(F.sum(F.length(F.col("html"))), F.count(F.lit(1))).collect()
else:
    raise SystemExit(f"unknown stage {{stage}}")
print("RESULT " + json.dumps({{"sec": time.time() - t0}}))
spark.stop()
"""

STAGES = ["generate", "scan", "fold", "extract", "write", "resolve"]


def ensure_inputs():
    from tapdata_connectors_spark.session import build_session

    spark = build_session("local[32]", shuffle_partitions=32,
                          extra_conf={"spark.ui.showConsoleProgress": "false"})
    from tapdata_connectors_spark.sources import (
        GeneratorConfig,
        generate_events,
        stage_events,
    )

    if not os.path.exists(os.path.join(STAGING, "_epochs")):
        cfg = GeneratorConfig(n_events=N_EVENTS, n_urls=max(1000, N_EVENTS // 8),
                              epoch_size=max(100_000, N_EVENTS // 8),
                              p_hot=0.1, p_dup=0.01, p_update=0.35,
                              p_delete=0.10, html_kb=HTML_KB)
        stage_events(generate_events(spark, cfg), STAGING)
    # a MOR table with un-compacted deltas for the resolve stage
    table = STAGING + "_mor_table"
    if not os.path.exists(os.path.join(table, "_manifests")):
        from tapdata_connectors_spark.streaming import CdcPipeline

        pipe = CdcPipeline(spark, table, STAGING, n_buckets=64,
                           merge_mode="mor", compact_every=10**9)
        pipe.replay_batch(max_concurrent_epochs=4)
    spark.stop()
    return table


def run_stage(stage: str, cores: int, table: str) -> float:
    import shutil

    code = STAGE_SNIPPET.format(repo=REPO)
    # pinned to exactly `cores` CPUs — same honesty rule as bench.py's
    # end-to-end scaling runs (unpinned local[8] borrows all host cores
    # for GC/IO/Arrow workers)
    pin = ["taskset", "-c", f"0-{cores - 1}"] if shutil.which("taskset") else []
    args = pin + [sys.executable, "-c", code, str(cores), stage, STAGING,
                  str(N_EVENTS), str(HTML_KB)]
    if stage == "resolve":
        args.append(table)
    env = dict(os.environ, PYTHONPATH=REPO, TMPDIR=SCRATCH,
               SPARK_GRAFT_DRIVER_MEM=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
               SPARK_GRAFT_LOCAL_DIR=os.path.join(SCRATCH, f"spark_local_{cores}"))
    os.makedirs(SCRATCH, exist_ok=True)
    r = subprocess.run(args, env=env, capture_output=True, text=True, timeout=3600)
    for line in r.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])["sec"]
    raise RuntimeError(f"stage {stage} cores={cores} failed:\n{r.stderr[-2000:]}")


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    table = ensure_inputs()
    out = {"events": N_EVENTS, "html_kb": HTML_KB, "reps": reps, "stages": {}}
    times = {(s, c): [] for s in STAGES for c in (8, 32)}
    for rep in range(reps):
        for s in STAGES:  # interleave 8/32 within each stage, stages round-robin
            for c in (8, 32):
                dt = run_stage(s, c, table)
                times[(s, c)].append(dt)
                print(f"rep{rep} {s} local[{c}]: {dt:.1f}s", file=sys.stderr)
    for s in STAGES:
        t8 = statistics.median(times[(s, 8)])
        t32 = statistics.median(times[(s, 32)])
        out["stages"][s] = {
            "t8_sec": round(t8, 1), "t32_sec": round(t32, 1),
            "t8_all": [round(x, 1) for x in times[(s, 8)]],
            "t32_all": [round(x, 1) for x in times[(s, 32)]],
            "efficiency_8_to_32": round(t8 / (4 * t32), 3),
        }
    path = os.path.join(REPO, "BENCH", "stage_scaling.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

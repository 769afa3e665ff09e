#!/usr/bin/env python
"""Round-6 optimization measurement harness (bench.py is FROZEN for the
driver; this file holds the extra instrumentation the optimization guide
§1 calls for). It times registry queries with the SAME methodology as
bench.py (`fn(spark, sf_dir).count()` on a local[$SPARK_GRAFT_CPUS]
session with shuffle_partitions = cpus), optionally repeated, and can
dump `.explain("formatted")` plans to plans/r06/.

Usage:
  python bench_extra.py [--sf DIR] [--reps N] [--plans SUFFIX] [q1 q2 ...]

  --sf DIR       data dir (default $SPARK_GRAFT_SF_DIR or /root/testdata/sf1.0)
  --reps N       repetitions per query (default 1; min is reported)
  --plans SUF    also write plans/r06/<query>_<SUF>.txt explain output
  --noop         additionally time a noop-sink write (guide §1.4) per query
  --aux          time the AUX registry (AUX_QUERIES) instead of QUERIES
  q1 q2 ...      subset of query names (default: all)

Prints one JSON line {"sf":..., "queries": {name: sec}} (min over reps).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    from tapdata_connectors_spark.queries import AUX_QUERIES, QUERIES
    from tapdata_connectors_spark.session import build_session

    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    reps, plans_suffix, do_noop, do_aux = 1, None, False, False
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif a == "--reps":
            reps = int(args[i + 1]); i += 2
        elif a == "--plans":
            plans_suffix = args[i + 1]; i += 2
        elif a == "--noop":
            do_noop = True; i += 1
        elif a == "--aux":
            do_aux = True; i += 1
        else:
            names.append(a); i += 1
    registry = AUX_QUERIES if do_aux else QUERIES
    if not names:
        names = list(registry)

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(f"local[{cpus}]", shuffle_partitions=cpus,
                          app_name="bench_extra",
                          extra_conf={"spark.ui.showConsoleProgress": "false"})
    # warm JIT/codegen like bench.py's replay snippet does
    from pyspark.sql import functions as F
    spark.range(2_000_000).select(
        F.sum(F.pmod(F.xxhash64("id"), F.lit(1000000)))).collect()

    plans_dir = os.path.join(REPO, "plans", "r06")
    if plans_suffix:
        os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, float] = {}
    noop_out: dict[str, float] = {}
    for name in names:
        fn = registry[name]
        samples = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.time()
            fn(spark, sf_dir).count()
            samples.append(time.time() - t0)
        out[name] = round(min(samples), 3)
        if do_noop:
            spark.sparkContext.setJobDescription(f"{name} noop")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            noop_out[name] = round(time.time() - t0, 3)
        if plans_suffix:
            plan = fn(spark, sf_dir)._sc._jvm.PythonSQLUtils.explainString(
                fn(spark, sf_dir)._jdf.queryExecution(), "formatted")
            with open(os.path.join(plans_dir, f"{name}_{plans_suffix}.txt"),
                      "w") as f:
                f.write(plan)
        spark.sparkContext.setJobDescription(None)
        print(f"  {name}: {out[name]}s"
              + (f" (noop {noop_out[name]}s)" if do_noop else ""),
              file=sys.stderr)
    rec = {"sf": sf_dir, "reps": reps, "queries": out}
    if do_noop:
        rec["noop"] = noop_out
    print(json.dumps(rec))


if __name__ == "__main__":
    main()

"""Microbench: single-window per-key top-k vs operators/skew.salted_topk
on a deliberately Zipf-hot frame (`python BENCH/skew_bench.py [n_rows]
[hot_pct]`), recording both wall times AND whether the single window's
physical plan carries a partial WindowGroupLimit before the exchange.

FINDING (kept as the record): Catalyst's WindowGroupLimit rule
(Spark >= 3.5) already runs a map-side per-key top-k for the
row_number/rank + `rk <= k` pattern — the optimizer salts that plan
natively, with zero extra exchange — so the manual two-phase measured
0.75-0.87x of the single window even at 90% of rows on one key. The
engine therefore PREFERS the single declarative window for rank-filter
top-k (web.host_cap_sample default) and keeps salted_topk as the
explicit mechanism for window patterns the rule cannot cover (running
aggregates, lag chains, unlimited rank) and as the portable fallback.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tapdata_connectors_spark.operators import skew  # noqa: E402
from tapdata_connectors_spark.session import build_session  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
HOT_PCT = int(sys.argv[2]) if len(sys.argv) > 2 else 50  # % of rows on the hot key
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
K = 5
N_SALTS = 32


def main() -> None:
    spark = build_session(
        f"local[{CPUS}]", shuffle_partitions=CPUS,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    df = spark.range(N).select(
        F.col("id"),
        F.when(F.col("id") % 100 < HOT_PCT, F.lit("megahost")).otherwise(
            F.concat(F.lit("host-"), (F.col("id") % 5000).cast("string"))
        ).alias("key"),
        F.xxhash64("id").alias("v"),
    ).persist()
    df.count()  # materialize input outside the timers

    def timed(fn):
        # two reps, keep the min (drop one-off JIT/host blips)
        best = None
        for _ in range(2):
            t0 = time.time()
            n = fn().count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 2), n

    w = W.partitionBy("key").orderBy(F.col("v"), F.col("id"))
    t_plain, n_plain = timed(
        lambda: df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= K)
    )
    t_salted, n_salted = timed(
        lambda: skew.salted_topk(df, "key", ["v", "id"], K,
                                 n_salts=N_SALTS, salt_from=["id"])
    )
    assert n_plain == n_salted, (n_plain, n_salted)
    plan = (
        df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= K)
        ._jdf.queryExecution().executedPlan().toString()
    )
    rec = {
        "metric": "salted_topk_vs_single_window",
        "n_rows": N,
        "hot_share": HOT_PCT / 100,
        "k": K,
        "n_salts": N_SALTS,
        "cpus": CPUS,
        "single_window_sec": t_plain,
        "salted_sec": t_salted,
        "speedup": round(t_plain / t_salted, 2),
        "result_rows": n_plain,
        "window_group_limit_in_single_window_plan": "WindowGroupLimit" in plan,
        "conclusion": "Catalyst WindowGroupLimit already runs the map-side "
                      "per-key top-k for the rank-filter pattern; prefer the "
                      "single window there, keep salted_topk for window "
                      "shapes outside the rule",
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "skew_bench.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()

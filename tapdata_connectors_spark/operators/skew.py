"""Explicit hot-key skew handling: salted repartitioning and two-phase
(salted) per-key top-k — the north rule's "salted repartitioning on hot
url-prefix keys to kill skew at 10^10-event scale" as first-class,
reusable operators.

Where the engine does NOT need salt, by construction (and says so):

- The LWW fold (operators/dedup.lww_fold) and every corpus aggregation
  are ALGEBRAIC — Spark's map-side partial aggregation absorbs a
  Zipf-hot url (one partial row per map task, never one row per event),
  so inserting a salted repartition there would only add a shuffle.
- Joins get AQE's skew-join split at runtime (session.py enables it).

- Rank-filter top-k windows (row_number/rank/dense_rank + `rk <= k`)
  get Catalyst's WindowGroupLimit rule (Spark >= 3.5): a PARTIAL
  per-key top-k runs map-side before the exchange — the optimizer has
  already salted that plan, with zero extra shuffle. Measured here:
  BENCH/skew_bench.json shows the manual two-phase at 0.75-0.87x of
  the single window on a 20M-row frame with up to 90% of rows on one
  key, and the single window's physical plan carries
  Sort -> WindowGroupLimit -> Exchange. Prefer the single declarative
  window for that pattern.

What neither partial aggregation nor WindowGroupLimit absorbs — and
what these helpers fix:

- Per-key WINDOW functions OUTSIDE the rank-filter pattern (running
  aggregates, ntile, lag/lead chains, full rank assignment with no
  limit filter): all rows of the hot key land in one task and the
  window sorts them there. A top-1% domain at crawl scale is billions
  of rows in one partition. `salted_topk` covers the top-k-shaped
  subset of those explicitly: rank within (key, salt) and keep k per
  subgroup — any row in the key's global top-k has < k rows ahead of
  it globally, hence < k ahead of it in its own salt subgroup, so
  phase 1 never drops a global winner — then re-rank the <= n_salts*k
  survivors per key for the exact result. Output is row-identical to
  the single-window formulation (pytest- and hypothesis-pinned), while
  the biggest sorted partition shrinks from |hot key| to |hot key| /
  n_salts. It is also the portable fallback where the group-limit rule
  does not exist.
- Operators that need an explicit repartition before per-partition work
  (mapInPandas feature extraction, per-partition writers): `hot_keys` +
  `salted_repartition` spread ONLY the detected-hot keys across
  n_salts partitions (cold keys stay co-located on one), with a
  content-derived salt so replayed rows land deterministically — no
  rand(), exactly-once friendly.

Reference analog: the reference splits skewed snapshot reads by
row-count quota (DatabaseReadPartitionSplitter.java) but has no
equivalent for hot-key shuffle skew — its per-event JDBC writers never
shuffle. In Spark the shuffle is where skew bites, so this is the
Spark-first mechanism, not a port.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

__all__ = [
    "salt_col",
    "hot_keys",
    "salted_repartition",
    "salted_topk",
]


def salt_col(n_salts: int, *cols: Column | str) -> Column:
    """Deterministic salt in [0, n_salts): xxhash64 of the given columns
    (pass the row's unique id / seq / order key). Content-derived, so the
    same logical row always lands in the same salt bucket — idempotent
    replay keeps its partitioning, unlike rand()-salting."""
    return F.pmod(F.xxhash64(*[F.col(c) if isinstance(c, str) else c
                               for c in cols]), F.lit(n_salts)).cast("int")


def hot_keys(df: DataFrame, key_col: str, min_count: int,
             top: int = 64) -> list:
    """Bounded hot-key detector: one algebraic count-by-key (map-side
    combine — safe to run on the skewed input itself), keep keys with
    >= min_count rows, return at most `top` of them hottest-first. The
    driver-side result is O(top) — a broadcastable list, never the key
    space. At ingest time run this on a sample or on the previous
    epoch's lineage counts; the salt only needs to catch the megakeys."""
    rows = (
        df.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .orderBy(F.desc("n"), F.col(key_col))
        .limit(top)
        .collect()
    )
    return [r[0] for r in rows]


def salted_repartition(
    df: DataFrame,
    key_col: str,
    hot: list | None,
    n_salts: int = 16,
    salt_from: list | None = None,
    n_partitions: int | None = None,
) -> DataFrame:
    """Repartition on (key, salt) where the salt is nonzero ONLY for the
    given hot keys — the literal "salted repartitioning on hot url-prefix
    keys". A hot key's rows spread across up to n_salts partitions; every
    cold key keeps the co-location a plain repartition(key) would give
    (salt 0 is a constant for them). `salt_from` names the columns that
    derive the salt (default: the key itself plus every other column is
    wrong — pass the unique id/seq); hot=None salts every key
    (uniform spread, for downstream work with no per-key locality need).
    """
    salt = salt_col(n_salts, *(salt_from or [key_col]))
    if hot is not None:
        salt = F.when(F.col(key_col).isin(list(hot)), salt).otherwise(F.lit(0))
    parts = [F.col(key_col), salt]
    if n_partitions:
        return df.repartition(n_partitions, *parts)
    return df.repartition(*parts)


def salted_topk(
    df: DataFrame,
    part_col: str,
    order_cols: list,
    k: int,
    n_salts: int = 8,
    salt_from: list | None = None,
    rk_col: str = "rk",
) -> DataFrame:
    """Exact per-key top-k without a single-task megakey sort: phase 1
    ranks within (key, salt) and keeps k rows per subgroup (superset of
    the key's global top-k — see module docstring for the containment
    argument); phase 2 re-ranks the <= n_salts*k survivors per key. The
    order defined by `order_cols` must be total (include a unique
    tiebreaker) — the same requirement the single-window version has for
    determinism. Returns df's columns plus `rk_col`, rows identical to
    `row_number().over(partitionBy(key).orderBy(order))  <= k`."""
    order = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    salt = salt_col(n_salts, *(salt_from or order_cols))
    w1 = W.partitionBy(part_col, "_salt").orderBy(*order)
    w2 = W.partitionBy(part_col).orderBy(*order)
    return (
        df.withColumn("_salt", salt)
        .withColumn("_srk", F.row_number().over(w1))
        .filter(F.col("_srk") <= k)
        .drop("_salt", "_srk")
        .withColumn(rk_col, F.row_number().over(w2))
        .filter(F.col(rk_col) <= k)
    )

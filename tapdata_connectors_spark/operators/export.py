"""Training-shard export: deterministic global shuffle + balanced
sharded parquet — the final-mile step of a training-data pipeline.
Training examples must be (a) well-shuffled so batches are ~i.i.d.
(corpus order is crawl order — heavily host- and time-correlated),
(b) DETERMINISTIC so a re-run of the data build reproduces the same
shards (resumable builds, byte-for-byte auditable lineage), and
(c) balanced so data loaders stripe evenly across workers.

Shape at 100 TB: shard and intra-shard order are pure hash columns
(map-only), then ONE hash repartition on the shard id with the
per-shard sort fused into the write (sortWithinPartitions — never a
global sort), one file per shard. No RNG anywhere: re-running the
export on the same corpus produces the same example sequence per
shard, which is what makes "train on shards 0-99 of build X"
a reproducible statement.

Hashes are md5-slice (the cross-engine observable hash — the DuckDB
oracle reproduces the exact assignment), not xxhash64: the assignment
IS the output here, unlike the internal inventory keys gram_hash
covers. Reference analog: none — the reference stops at target-DB
rows; this is the step between its sink and a training run.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tapdata_connectors_spark.operators.corpus import md5_slice

__all__ = ["shard_assignment", "export_shards", "read_shard"]


def shard_assignment(df: DataFrame, n_shards: int,
                     key_col: str = "doc_id", salt: int = 0) -> DataFrame:
    """(key, shard, ord64): deterministic shard id and intra-shard order
    key per example. Independent hash draws for shard and order (domain-
    separated by suffix), so position within a shard is uncorrelated
    with shard membership. Map-only; `salt` versions the whole shuffle
    (a new data build that must not correlate with the previous one
    bumps the salt)."""
    k = F.col(key_col).cast("string")
    shard = F.pmod(
        md5_slice(F.concat(k, F.lit(f":s{salt}")), 15), F.lit(n_shards)
    )
    ordh = md5_slice(F.concat(k, F.lit(f":o{salt}")), 15)
    return df.select(
        F.col(key_col),
        shard.cast("int").alias("shard"),
        ordh.alias("ord64"),
    )


def export_shards(df: DataFrame, out_dir: str, n_shards: int,
                  key_col: str = "doc_id", salt: int = 0) -> dict:
    """Write `df` as n_shards parquet shard directories
    (`out_dir/shard=K/`), each sorted by the deterministic order key.
    One hash repartition + fused per-partition sort + one file per
    shard. Returns a manifest {shard: rows} (driver-side, O(n_shards)).
    """
    k = F.col(key_col).cast("string")
    shard = F.pmod(
        md5_slice(F.concat(k, F.lit(f":s{salt}")), 15), F.lit(n_shards)
    ).cast("int")
    ordh = md5_slice(F.concat(k, F.lit(f":o{salt}")), 15)
    out = (
        df.withColumn("shard", shard)
        .withColumn("_ord64", ordh)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "_ord64", key_col)
    )
    out.write.partitionBy("shard").mode("overwrite").parquet(out_dir)
    sizes = (
        df.sparkSession.read.parquet(out_dir)
        .groupBy("shard").agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return {int(r["shard"]): int(r["n"]) for r in sizes}


def read_shard(spark, out_dir: str, shard: int) -> DataFrame:
    """One shard in its deterministic training order (the written file
    is sorted; parquet preserves row order within a file)."""
    return (
        spark.read.parquet(os.path.join(out_dir, f"shard={shard}"))
        .sort("_ord64")
    )

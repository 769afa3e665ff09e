"""Training-shard export (operators/export.py): every input row lands
in exactly one shard, shards are hash-balanced, intra-shard order is
the deterministic order key, and a re-export reproduces the identical
per-shard example sequence (no RNG anywhere)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tapdata_connectors_spark.operators import export

N_SHARDS = 8


def _docs(spark, n=500):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id").cast("string")).alias("text"),
    )


def test_export_shards_partition_union_and_balance(spark, tmpdir_):
    df = _docs(spark)
    sizes = export.export_shards(df, f"{tmpdir_}/shards", N_SHARDS)
    assert set(sizes) == set(range(N_SHARDS))
    assert sum(sizes.values()) == 500
    # hash balance: no shard more than 2x the mean (binomial tail at
    # n=500/8 makes this bound astronomically safe for a correct hash)
    mean = 500 / N_SHARDS
    assert max(sizes.values()) < 2 * mean and min(sizes.values()) > 0
    back = spark.read.parquet(f"{tmpdir_}/shards")
    assert back.select("doc_id").exceptAll(df.select("doc_id")).isEmpty()
    assert df.select("doc_id").exceptAll(back.select("doc_id")).isEmpty()
    # shard dirs carry the full payload
    assert set(back.columns) >= {"doc_id", "text", "shard", "_ord64"}


def test_export_is_deterministic_and_ordered(spark, tmpdir_):
    df = _docs(spark)
    export.export_shards(df, f"{tmpdir_}/a", N_SHARDS)
    export.export_shards(df, f"{tmpdir_}/b", N_SHARDS)
    for s in range(N_SHARDS):
        a = [r["doc_id"] for r in
             export.read_shard(spark, f"{tmpdir_}/a", s).collect()]
        b = [r["doc_id"] for r in
             export.read_shard(spark, f"{tmpdir_}/b", s).collect()]
        assert a == b and len(a) > 0
        # written file order IS the order key's order (fused sort)
        raw = [r["doc_id"] for r in
               spark.read.parquet(f"{tmpdir_}/a/shard={s}").collect()]
        assert raw == a
    # a different salt decorrelates the shuffle: same corpus, different
    # assignment
    asn0 = {r["doc_id"]: r["shard"]
            for r in export.shard_assignment(df, N_SHARDS, salt=0).collect()}
    asn1 = {r["doc_id"]: r["shard"]
            for r in export.shard_assignment(df, N_SHARDS, salt=1).collect()}
    assert asn0 != asn1

"""Hot-key skew machinery (operators/skew.py): salted repartitioning on
hot keys, bounded hot-key detection, and the two-phase salted top-k —
each pinned against its unsalted formulation on a deliberately Zipf-hot
frame (one key owning half the rows), plus the wired-in consumer
(web.host_cap_sample) at n_salts>1 vs n_salts=1."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from tapdata_connectors_spark.operators import skew, web


def _skewed(spark, n=20_000, hot_share=0.5, n_cold=200):
    """id-unique frame where key 'megahost' owns hot_share of rows and the
    rest spread over n_cold keys."""
    return spark.range(n).select(
        F.col("id"),
        F.when(
            F.col("id") % int(1 / hot_share) == 0, F.lit("megahost")
        ).otherwise(
            F.concat(F.lit("host-"), (F.col("id") % n_cold).cast("string"))
        ).alias("key"),
        (F.xxhash64("id") % 1000).alias("v"),
    )


def test_hot_keys_finds_the_megakey(spark):
    df = _skewed(spark)
    hot = skew.hot_keys(df, "key", min_count=1000)
    assert hot == ["megahost"]
    # threshold excludes everything -> empty, never a huge collect
    assert skew.hot_keys(df, "key", min_count=10**9) == []


def test_salted_repartition_spreads_hot_key_only(spark):
    df = _skewed(spark)
    out = skew.salted_repartition(
        df, "key", hot=["megahost"], n_salts=8, salt_from=["id"],
        n_partitions=32,
    )
    spread = (
        out.select("key", F.spark_partition_id().alias("p"))
        .groupBy("key").agg(F.countDistinct("p").alias("nparts"))
    )
    assert spread.filter("key = 'megahost'").collect()[0]["nparts"] > 1
    cold = spread.filter("key <> 'megahost'")
    assert cold.agg(F.max("nparts")).collect()[0][0] == 1
    # content-derived salt: same input -> same assignment (no rand())
    again = skew.salted_repartition(
        df, "key", hot=["megahost"], n_salts=8, salt_from=["id"],
        n_partitions=32,
    ).select("id", F.spark_partition_id().alias("p"))
    first = out.select("id", F.spark_partition_id().alias("p"))
    assert first.exceptAll(again).isEmpty()


def test_salted_topk_equals_single_window(spark):
    df = _skewed(spark)
    order = [F.col("v"), F.col("id")]  # total order (id unique)
    w = W.partitionBy("key").orderBy(*order)
    plain = (
        df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 7)
    )
    salted = skew.salted_topk(
        df, "key", ["v", "id"], 7, n_salts=8, salt_from=["id"]
    )
    assert plain.exceptAll(salted).isEmpty()
    assert salted.exceptAll(plain).isEmpty()
    # k larger than some groups' row count: still exact
    plain1 = (
        df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 500)
    )
    salted1 = skew.salted_topk(
        df, "key", ["v", "id"], 500, n_salts=4, salt_from=["id"]
    )
    assert plain1.exceptAll(salted1).isEmpty()
    assert salted1.exceptAll(plain1).isEmpty()


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:
    ROWS = st.lists(
        st.tuples(st.integers(0, 6), st.integers(-50, 50)),
        min_size=1, max_size=120,
    )

    @settings(max_examples=20, deadline=None, derandomize=True,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(rows=ROWS, k=st.integers(1, 9), n_salts=st.integers(2, 7))
    def test_salted_topk_property(spark, rows, k, n_salts):
        """Random skew shapes, k, salt counts: salted == single window.
        The unique row id makes the order total; duplicate (key, v)
        payloads are allowed and exercised."""
        df = spark.createDataFrame(
            [(i, f"k{key}", v) for i, (key, v) in enumerate(rows)],
            "id long, key string, v long",
        )
        w = W.partitionBy("key").orderBy(F.col("v"), F.col("id"))
        plain = (
            df.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
        )
        salted = skew.salted_topk(
            df, "key", ["v", "id"], k, n_salts=n_salts, salt_from=["id"]
        )
        assert plain.exceptAll(salted).isEmpty()
        assert salted.exceptAll(plain).isEmpty()


def test_host_cap_sample_salted_equals_unsalted(spark):
    df = _skewed(spark, n=5_000).select(
        F.col("id").alias("doc_id"), F.col("key").alias("source")
    )
    a = web.host_cap_sample(df, cap=5, n_salts=1)
    b = web.host_cap_sample(df, cap=5, n_salts=8)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    # every host capped, ranks dense from 1
    agg = b.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"), F.min("rk").alias("lo"),
        F.max("rk").alias("hi"),
    )
    bad = agg.filter("n > 5 or lo <> 1 or hi <> n")
    assert bad.isEmpty()

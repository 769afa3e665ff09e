"""Pure-python XXH64 (functions/xxh.py) must match Spark's xxhash64
expression bit-for-bit — it picks LakeTable.lookup's bucket driver-side.
Property-style sweep over lengths crossing every code path (empty, <4,
<8, 8..31, >=32 bytes, multi-stripe) plus integral types and nulls."""

from __future__ import annotations

from pyspark.sql import functions as F

from tapdata_connectors_spark.functions.xxh import spark_xxhash64


def test_string_parity_with_spark(spark):
    vals = [
        "", "a", "ab", "abc", "abcd", "abcde", "1234567", "12345678",
        "123456789", "0123456789abcdef", "0123456789abcdef0123456789abcde",
        "0123456789abcdef0123456789abcdef",            # exactly 32
        "x" * 33, "y" * 64, "z" * 100,
        "https://h0.example.org/p/14", "ü¢€-unicode", "日本語テキスト",
        None,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {r["s"]: r["h"]
           for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for v in vals:
        assert spark_xxhash64(v, "string") == got[v], repr(v)


def test_integral_parity_with_spark(spark):
    vals = [0, 1, -1, 7, -7, 2**31 - 1, -(2**31), 2**63 - 1, -(2**63),
            123456789012345, None]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r["v"]: r["h"]
           for r in df.select("v", F.xxhash64("v").alias("h")).collect()}
    for v in vals:
        assert spark_xxhash64(v, "bigint") == got[v], v
    # int column hashes like its long promotion
    di = spark.createDataFrame([(5,), (-3,)], "v int")
    gi = {r["v"]: r["h"]
          for r in di.select("v", F.xxhash64("v").alias("h")).collect()}
    for v in (5, -3):
        assert spark_xxhash64(v, "int") == gi[v]


def test_bucket_matches_bucket_expr(spark):
    from pyspark.sql import types as T
    keys = [f"https://h{i}.example.org/p/{i * 37}" for i in range(50)]
    df = spark.createDataFrame([(k,) for k in keys], "url string")
    for n in (1, 4, 16, 32):
        expr = F.pmod(F.xxhash64(F.col("url")), F.lit(n)).cast("int")
        got = {r["url"]: r["b"]
               for r in df.select("url", expr.alias("b")).collect()}
        for k in keys:
            assert spark_xxhash64(k, "string") % n == got[k], (k, n)


def test_unsupported_type_returns_none():
    assert spark_xxhash64(1.5, "double") is None
    assert spark_xxhash64(b"x", "binary") is None

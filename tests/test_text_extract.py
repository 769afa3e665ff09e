"""F12: text extraction determinism + correctness (input_hint invariant:
byte-identical extracted text per url across replays)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tapdata_connectors_spark.functions.text_extract import (
    extract_text_bytes,
    extract_text_udf,
)

HTML = (
    b"<html><head><title>T</title><style>p{color:red}</style></head>"
    b"<body><h1>Head</h1><p>Hello &amp; world</p>"
    b"<script>var x = '<p>not text</p>';</script>"
    b"<!-- comment --><p>bye</p></body></html>"
)


def test_pure_function_behavior():
    out = extract_text_bytes(HTML)
    assert out == "T Head Hello & world bye"
    assert extract_text_bytes(None) is None
    assert extract_text_bytes(b"") == ""
    # invalid utf-8 handled deterministically
    assert extract_text_bytes(b"<p>\xff\xfe</p>") == "��"


def test_udf_matches_pure_function_and_is_deterministic(spark):
    df = spark.createDataFrame(
        [(i, HTML + str(i).encode()) for i in range(100)], "id long, html binary"
    )
    a = {r["id"]: r["t"] for r in df.select("id", extract_text_udf("html").alias("t")).collect()}
    b = {r["id"]: r["t"] for r in df.repartition(7).select("id", extract_text_udf("html").alias("t")).collect()}
    assert a == b  # partitioning-independent
    for i in (0, 42, 99):
        assert a[i] == extract_text_bytes(HTML + str(i).encode())


def test_udf_null_passthrough(spark):
    df = spark.createDataFrame([(1, None)], "id long, html binary")
    assert df.select(extract_text_udf("html").alias("t")).collect()[0]["t"] is None

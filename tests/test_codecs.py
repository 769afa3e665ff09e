"""Value codecs (functions/codecs.py) + decimal/zoned-ts decode through
the engine: the VERDICT-r1 'partial/untested' scalar-function rows."""

from __future__ import annotations

import datetime as dt
import json
from decimal import Decimal

from pyspark.sql import Row
from pyspark.sql import functions as F

from tapdata_connectors_spark.functions import codecs


def test_map_to_json_sorted_deterministic(spark):
    df = spark.createDataFrame(
        [Row(id=1, m={"b": "2", "a": "1", "c": "3"}),
         Row(id=2, m={"z": "9", "a": "0"})]
    )
    got = {r["id"]: r["j"] for r in
           df.select("id", codecs.map_to_json_sorted(F.col("m")).alias("j")).collect()}
    # keys in lexicographic order — byte-stable text
    assert got[1] == '{"a":"1","b":"2","c":"3"}'
    assert got[2] == '{"a":"0","z":"9"}'
    # and parses back to the original content
    assert json.loads(got[1]) == {"a": "1", "b": "2", "c": "3"}


def test_complex_to_json_struct_and_array(spark):
    df = spark.createDataFrame([Row(id=1, s=Row(x=1, y="a"), arr=[1, 2, 3])])
    r = df.select(
        codecs.complex_to_json(F.col("s")).alias("js"),
        codecs.complex_to_json(F.col("arr")).alias("ja"),
    ).collect()[0]
    assert json.loads(r["js"]) == {"x": 1, "y": "a"}
    assert json.loads(r["ja"]) == [1, 2, 3]


def test_zoned_ts_decode_normalizes_to_utc(spark):
    df = spark.createDataFrame(
        [Row(id=1, ts="2024-01-15T12:00:00+02:00"),
         Row(id=2, ts="2024-01-15T10:00:00Z"),
         Row(id=3, ts="2024-01-15 10:00:00")]  # naive = session TZ = UTC
    )
    got = [r["t"] for r in
           df.select(codecs.zoned_ts_utc(F.col("ts")).alias("t"))
           .orderBy("t").collect()]
    # all three are the same instant under the UTC session
    assert got[0] == got[1] == got[2] == dt.datetime(2024, 1, 15, 10, 0, 0)


def test_decimal_exact_roundtrip(spark):
    df = spark.createDataFrame([Row(id=1, v="12345.67"), Row(id=2, v="0.01")])
    got = {r["id"]: r["d"] for r in
           df.select("id", codecs.decimal_str(F.col("v"), 12, 2).alias("d")).collect()}
    assert got[1] == Decimal("12345.67")
    assert got[2] == Decimal("0.01")


def test_decimal_column_through_lake_ddl(spark, tmpdir_):
    """ADD COLUMN decimal(12,2) mid-stream: values arrive as strings in
    the extras map (how a binlog carries consumer-unknown columns), fold
    casts them via the ColumnSpec type, the lake stores exact decimals."""
    from tapdata_connectors_spark.sources.generator import (
        DdlSpec,
        GeneratorConfig,
        generate_events,
        stage_events,
    )
    from tapdata_connectors_spark.streaming.driver import CdcPipeline
    from tests.helpers import assert_state_equal, oracle_replay

    cfg = GeneratorConfig(
        n_events=600, n_urls=60, epoch_size=200,
        ddl=(DdlSpec(seq=300, kind="ADD_COLUMN", column="price",
                     new_type="decimal(12,2)"),),
        extras_cols=(("price", 300, "decimal(12,2)"),),
    )
    ev = generate_events(spark, cfg)
    stage_events(ev, f"{tmpdir_}/staging")
    pipe = CdcPipeline(spark, f"{tmpdir_}/pages", f"{tmpdir_}/staging",
                       n_buckets=4, merge_mode="mor")
    pipe.replay_batch()
    df = pipe.table.read()
    assert dict(df.dtypes)["price"] == "decimal(12,2)"
    vals = [r["price"] for r in df.filter("price is not null").collect()]
    assert vals, "decimal column must carry values"
    assert all(isinstance(v, Decimal) and v == v.quantize(Decimal("0.01"))
               for v in vals)
    assert_state_equal(df, oracle_replay(ev.collect()))

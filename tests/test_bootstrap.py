"""Initial snapshot load (batchRead path, SURVEY §3.1) + CDC on top."""

from __future__ import annotations

import datetime as dt

from tapdata_connectors_spark.sources.generator import GeneratorConfig, generate_events, stage_events
from tapdata_connectors_spark.streaming.driver import CdcPipeline
from tests.helpers import assert_state_equal, oracle_replay


def test_bootstrap_then_cdc(spark, tmpdir_):
    # snapshot: 50 pages loaded wholesale (no merge)
    base = spark.createDataFrame(
        [(f"https://s.example.org/p/{i}",
          dt.datetime(2023, 1, 1) + dt.timedelta(seconds=i),
          f"<html><body><p>page {i}</p></body></html>".encode(),
          "en") for i in range(50)],
        "url string, warc_ts timestamp, html binary, lang string",
    )
    pipe = CdcPipeline(spark, f"{tmpdir_}/pages", f"{tmpdir_}/staging", n_buckets=4)
    pipe.bootstrap_snapshot(base)
    df = pipe.table.read()
    assert df.count() == 50
    assert df.filter("text like 'page %'").count() == 50  # text derived at load

    # then a change stream mutates some of the same keys
    cfg = GeneratorConfig(n_events=300, n_urls=40, epoch_size=150)
    ev = generate_events(spark, cfg)
    stage_events(ev, f"{tmpdir_}/staging")
    pipe.replay_batch()
    got = pipe.table.read()
    # snapshot keys unrelated to the generator's url space must survive
    assert got.filter("url like 'https://s.example.org/%'").count() == 50
    # generator-key subset must equal the oracle replay
    gen = got.filter("url not like 'https://s.example.org/%'")
    assert_state_equal(gen, oracle_replay(ev.collect()))

"""The north rule's deployable shape: `spark-submit --py-files <zip>
jobs/replay_job.py` runs the whole replay with the engine imported from
the zip artifact (zipimport), and produces the same final table state as
the in-process API on the same staged log.

The subprocess gets an empty PYTHONPATH and a neutral cwd, so the ONLY
way `import tapdata_connectors_spark` can resolve is through the
--py-files zip that spark-submit puts on sys.path — the same mechanism
that distributes the code to real cluster executors. The job prints the
resolved module path; we assert it points inside the zip."""

from __future__ import annotations

import json
import os
import subprocess
import zipfile

from tapdata_connectors_spark.packaging import build_pyfiles_zip
from tapdata_connectors_spark.streaming import CdcPipeline

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pyfiles_zip_is_deterministic_and_complete(tmpdir_):
    z1 = build_pyfiles_zip(os.path.join(tmpdir_, "a.zip"))
    z2 = build_pyfiles_zip(os.path.join(tmpdir_, "b.zip"))
    with open(z1, "rb") as f1, open(z2, "rb") as f2:
        assert f1.read() == f2.read()  # byte-identical rebuild
    names = set(zipfile.ZipFile(z1).namelist())
    # import-critical modules present, stored relative to the repo root
    for mod in (
        "tapdata_connectors_spark/__init__.py",
        "tapdata_connectors_spark/streaming/driver.py",
        "tapdata_connectors_spark/lake/table.py",
        "tapdata_connectors_spark/operators/dedup.py",
    ):
        assert mod in names
    assert not any("__pycache__" in n for n in names)
    assert not any(n.startswith("tests/") for n in names)


def test_spark_submit_pyfiles_end_to_end(tmpdir_, spark):
    zip_path = build_pyfiles_zip(os.path.join(tmpdir_, "tds.zip"))
    staging = os.path.join(tmpdir_, "staging")
    table = os.path.join(tmpdir_, "table_submit")

    env = dict(os.environ)
    env["PYTHONPATH"] = ""  # the zip must be the only import source
    cmd = [
        "spark-submit",
        "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.driver.memory=4g",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.ui.showConsoleProgress=false",
        "--py-files", zip_path,
        os.path.join(REPO, "jobs", "replay_job.py"),
        "--staging", staging,
        "--table", table,
        "--generate-events", "4000",
        "--n-buckets", "4",
        "--merge-mode", "mor",
        "--epoch-batch", "8",
        "--final-compact",
        "--html-kb", "0",
    ]
    proc = subprocess.run(
        cmd, capture_output=True, text=True, cwd=tmpdir_, env=env,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    summaries = []
    for line in proc.stdout.splitlines():
        if line.startswith("{"):
            try:
                summaries.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    assert len(summaries) == 1, proc.stdout  # exactly ONE JSON line
    s = summaries[0]
    # the engine really was imported from the --py-files artifact
    assert "tds.zip" in s["engine_path"], s["engine_path"]
    assert s["final_rows"] > 0
    assert s["chunks_applied"] > 0 and s["chunks_skipped"] == 0
    assert s["lineage_events"] == 4000

    # same staged log through the in-process API => identical final state
    table2 = os.path.join(tmpdir_, "table_api")
    pipe = CdcPipeline(spark, table2, staging, n_buckets=4, merge_mode="mor")
    pipe.init_table()
    pipe.replay_batch(epoch_batch=8)
    a = pipe.table.read()
    from tapdata_connectors_spark.lake.table import LakeTable
    b = LakeTable(spark, table).read().select(*a.columns)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()

    # re-submitting the same job is a no-op replay (exactly-once guard)
    proc2 = subprocess.run(
        cmd, capture_output=True, text=True, cwd=tmpdir_, env=env,
        timeout=600,
    )
    assert proc2.returncode == 0, proc2.stderr[-4000:]
    s2 = [json.loads(l) for l in proc2.stdout.splitlines()
          if l.startswith("{")][-1]
    assert s2["chunks_applied"] == 0 and s2["chunks_skipped"] > 0
    assert s2["final_rows"] == s["final_rows"]


def test_spark_submit_bootstrap_then_cdc(tmpdir_, spark):
    """--bootstrap loads the initial full-table snapshot before tailing
    the staged log (the reference's snapshot-then-CDC flow); final state
    equals the in-process bootstrap+replay, and a re-submit neither
    re-bootstraps nor re-applies."""
    import datetime

    from pyspark.sql import Row

    snap_rows = [
        Row(url=f"https://boot.example/p/{i}",
            warc_ts=datetime.datetime(2026, 1, 1, 0, 0, i % 60),
            html=f"<html><body><p>boot {i}</p></body></html>".encode(),
            lang="en")
        for i in range(50)
    ]
    spark.createDataFrame(snap_rows).write.parquet(f"{tmpdir_}/snap")

    zip_path = build_pyfiles_zip(os.path.join(tmpdir_, "tds.zip"))
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    cmd = [
        "spark-submit", "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.driver.memory=4g",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.ui.showConsoleProgress=false",
        "--py-files", zip_path,
        os.path.join(REPO, "jobs", "replay_job.py"),
        "--staging", os.path.join(tmpdir_, "staging"),
        "--table", os.path.join(tmpdir_, "table_boot"),
        "--bootstrap", os.path.join(tmpdir_, "snap"),
        "--generate-events", "2000",
        "--n-buckets", "4",
        "--epoch-batch", "8",
        "--html-kb", "0",
    ]
    outs = []
    for _ in range(2):
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              cwd=tmpdir_, env=env, timeout=600)
        assert proc.returncode == 0, proc.stderr[-4000:]
        outs.append([json.loads(l) for l in proc.stdout.splitlines()
                     if l.startswith("{")][-1])
    assert outs[0]["bootstrapped"] is True
    assert outs[0]["final_rows"] >= 50  # snapshot survives the replay
    assert outs[1]["bootstrapped"] is False  # table exists: no re-load
    assert outs[1]["chunks_applied"] == 0
    assert outs[1]["final_rows"] == outs[0]["final_rows"]

    # in-process equivalent over the job's own staged log
    pipe = CdcPipeline(spark, f"{tmpdir_}/table_api",
                       os.path.join(tmpdir_, "staging"),
                       n_buckets=4, merge_mode="mor")
    pipe.bootstrap_snapshot(spark.read.parquet(f"{tmpdir_}/snap"))
    pipe.replay_batch(epoch_batch=8)
    a = pipe.table.read()
    from tapdata_connectors_spark.lake.table import LakeTable
    b = LakeTable(spark, f"{tmpdir_}/table_boot").read().select(*a.columns)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_spark_submit_curate_job(tmpdir_):
    """The curation-side deployable: replay a small log via the replay
    job, then run the curation job (dedup + quality prune + link-index
    refresh) under real spark-submit; a re-submit with the same tag
    skips every stage (epoch-key idempotence)."""
    zip_path = build_pyfiles_zip(os.path.join(tmpdir_, "tds.zip"))
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    base = [
        "spark-submit", "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.driver.memory=4g",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.ui.showConsoleProgress=false",
        "--py-files", zip_path,
    ]
    staging = os.path.join(tmpdir_, "staging")
    table = os.path.join(tmpdir_, "table")
    replay = base + [
        os.path.join(REPO, "jobs", "replay_job.py"),
        "--staging", staging, "--table", table,
        "--generate-events", "2000", "--n-buckets", "4",
        "--epoch-batch", "8", "--html-kb", "0",
    ]
    proc = subprocess.run(replay, capture_output=True, text=True,
                          cwd=tmpdir_, env=env, timeout=600)
    assert proc.returncode == 0, proc.stderr[-4000:]

    curate = base + [
        os.path.join(REPO, "jobs", "curate_job.py"),
        "--table", table, "--staging", staging, "--n-buckets", "4",
        "--dedup", "exact", "--prune",
        "--refresh-links", os.path.join(tmpdir_, "linkidx"),
    ]
    outs = []
    for _ in range(2):
        proc = subprocess.run(curate, capture_output=True, text=True,
                              cwd=tmpdir_, env=env, timeout=600)
        assert proc.returncode == 0, proc.stderr[-4000:]
        outs.append([json.loads(l) for l in proc.stdout.splitlines()
                     if l.startswith("{")][-1])
    first, second = outs
    assert "tds.zip" in first["engine_path"]
    assert set(first["stages"]) == {"dedup", "prune", "link_index"}
    assert first["live_rows"] > 0
    assert not first["stages"]["link_index"]["skipped"]
    # idempotent re-submit: every stage skips, state unchanged
    assert second["stages"]["link_index"]["skipped"] is True
    assert second["live_rows"] == first["live_rows"]
    assert second["table_version"] == first["table_version"]


def test_spark_submit_stream_mode_resumable(tmpdir_):
    """--mode stream drives run_stream under spark-submit (availableNow);
    a re-submit on the same checkpoint with no new data applies nothing."""
    zip_path = build_pyfiles_zip(os.path.join(tmpdir_, "tds.zip"))
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    cmd = [
        "spark-submit",
        "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.driver.memory=4g",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.ui.showConsoleProgress=false",
        "--py-files", zip_path,
        os.path.join(REPO, "jobs", "replay_job.py"),
        "--staging", os.path.join(tmpdir_, "staging"),
        "--table", os.path.join(tmpdir_, "table_stream"),
        "--mode", "stream",
        "--checkpoint", os.path.join(tmpdir_, "ckpt"),
        "--generate-events", "2000",
        "--n-buckets", "4",
        "--epoch-batch", "8",
        "--html-kb", "0",
    ]
    runs = []
    for _ in range(2):
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              cwd=tmpdir_, env=env, timeout=600)
        assert proc.returncode == 0, proc.stderr[-4000:]
        runs.append([json.loads(l) for l in proc.stdout.splitlines()
                     if l.startswith("{")][-1])
    assert runs[0]["mode"] == "stream"
    assert runs[0]["final_rows"] > 0
    # second submit resumed the checkpoint, saw no new epochs, applied 0
    assert runs[1]["final_rows"] == runs[0]["final_rows"]
    assert runs[1]["lineage_events"] == runs[0]["lineage_events"]

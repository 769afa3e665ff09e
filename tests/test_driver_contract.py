"""Replicates the round driver's correctness gate locally: every queries()
entry runs on Spark AND its oracle_sql() runs on DuckDB over the same
parquet (sf0.01), compared on row count, column names, and sorted values."""

from __future__ import annotations

import datetime
import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm(v):
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def _duck(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _pairs():
    from tapdata_connectors_spark.queries import ORACLE_SQL, QUERIES

    # every oracle has a query; a few queries are legitimately oracle-less
    # (non-SQL-expressible — e.g. trained-codebook ANN search; the driver
    # records a rows-only check for those, pytest carries the real gate)
    assert set(ORACLE_SQL) <= set(QUERIES)
    return sorted(ORACLE_SQL)


def test_oracleless_queries_still_run(spark):
    """Queries without a SQL oracle must still execute and return rows at
    the driver's sf (their correctness gates live in their own pytest)."""
    from tapdata_connectors_spark.queries import ORACLE_SQL, QUERIES

    for name in sorted(set(QUERIES) - set(ORACLE_SQL)):
        assert QUERIES[name](spark, SF_DIR).count() > 0, name


def _aux_pairs():
    from tapdata_connectors_spark.queries import AUX_ORACLE_SQL, AUX_QUERIES

    assert set(AUX_ORACLE_SQL) == set(AUX_QUERIES)
    return sorted(AUX_ORACLE_SQL)


def _compare(spark, name, query_fn, sql):
    sdf = query_fn(spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(_norm(v) for v in r) for r in sdf.collect()]

    d_cols, d_raw = _duck(sql)
    d_rows = [tuple(_norm(v) for v in r) for r in d_raw]

    assert sorted(s_cols) == sorted(d_cols), f"{name}: columns {s_cols} vs {d_cols}"
    # order-insensitive compare with columns aligned by name
    s_idx = [s_cols.index(c) for c in sorted(s_cols)]
    d_idx = [d_cols.index(c) for c in sorted(d_cols)]
    s_sorted = sorted(tuple(r[i] for i in s_idx) for r in s_rows)
    d_sorted = sorted(tuple(r[i] for i in d_idx) for r in d_rows)
    assert len(s_sorted) == len(d_sorted), f"{name}: {len(s_sorted)} vs {len(d_sorted)} rows"
    assert s_sorted == d_sorted, (
        f"{name}: first diff "
        f"{next(((a, b) for a, b in zip(s_sorted, d_sorted) if a != b), None)}"
    )


@pytest.mark.parametrize("name", _pairs())
def test_query_matches_oracle(spark, name):
    from tapdata_connectors_spark.queries import ORACLE_SQL, QUERIES

    _compare(spark, name, QUERIES[name], ORACLE_SQL[name])


@pytest.mark.parametrize("name", _aux_pairs())
def test_aux_query_matches_oracle(spark, name):
    """Stage-view queries demoted from the 50-row driver registry (the
    driver verifies at most 50 rows — VERDICT r4 item 2) keep their full
    oracle gate here."""
    from tapdata_connectors_spark.queries import AUX_ORACLE_SQL, AUX_QUERIES

    _compare(spark, name, AUX_QUERIES[name], AUX_ORACLE_SQL[name])


def test_registry_within_driver_cap():
    """Every registered query gets a driver correctness row: the registry
    must not exceed the 50 rows the round driver verifies, and every
    entry must carry an oracle."""
    from tapdata_connectors_spark.queries import ORACLE_SQL, QUERIES

    assert len(QUERIES) <= 50
    assert set(ORACLE_SQL) == set(QUERIES)


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    n = df.count()
    assert n > 0
    assert df.columns == ["url", "warc_ts", "html", "text", "lang"]
    # the continuity side-output ran and every epoch is gap-free
    # (VERDICT r4 item 7: liveness is load-bearing in the flagship path)
    latest = entrymod.LAST_CONTINUITY
    assert latest, "flagship did not run the continuity monitor"
    assert all(r["missing"] == 0 for r in latest.values())
    assert all(r["n_events"] > 0 for r in latest.values())
    # deterministic across invocations
    df2 = entrymod.entry(spark)
    assert df2.count() == n

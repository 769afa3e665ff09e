"""Shared test utilities: drive the oracle the way the pipeline drives the
engine (epoch order, DDL-barrier slices) and compare final states."""

from __future__ import annotations

import datetime

from tests.oracle import OracleReplayer


def row_to_event(r) -> dict:
    d = r.asDict(recursive=True)
    if d.get("after") is not None:
        d["after"] = {k: v for k, v in d["after"].items()}
    return d


def oracle_replay(event_rows, insert_policy="update_on_exists",
                  update_policy="ignore_on_nonexists") -> OracleReplayer:
    """event_rows: collected EVENTS_SCHEMA rows (any order)."""
    o = OracleReplayer(insert_policy=insert_policy, update_policy=update_policy)
    events = [row_to_event(r) for r in event_rows]
    epochs = sorted({e["epoch"] for e in events})
    for ep in epochs:
        evs = [e for e in events if e["epoch"] == ep]
        ddls = sorted((e for e in evs if e["op"] == "DDL"), key=lambda e: e["event_seq"])
        dml = [e for e in evs if e["op"] != "DDL"]
        lo = None
        for ddl in ddls:
            hi = ddl["event_seq"]
            o.apply_slice([e for e in dml if (lo is None or e["event_seq"] > lo)
                           and e["event_seq"] < hi])
            d = ddl["ddl"]
            o.apply_ddl(d["kind"], d["column"], d.get("new_name"),
                        d.get("new_type"), d.get("new_default"))
            lo = hi
        o.apply_slice([e for e in dml if lo is None or e["event_seq"] > lo])
    return o


def _norm(v):
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None)
    return v


def assert_state_equal(table_df, oracle: OracleReplayer):
    got = {r["url"]: {k: _norm(v) for k, v in r.asDict().items()} for r in table_df.collect()}
    want = {r["url"]: {k: _norm(v) for k, v in r.items()} for r in oracle.final_rows()}
    assert set(got) == set(want), (
        f"key sets differ: only_engine={sorted(set(got) - set(want))[:5]} "
        f"only_oracle={sorted(set(want) - set(got))[:5]}"
    )
    for url in want:
        g, w = got[url], want[url]
        assert set(g) == set(w), f"{url}: columns {sorted(g)} != {sorted(w)}"
        for c in w:
            assert g[c] == w[c], f"{url}.{c}: engine={g[c]!r} oracle={w[c]!r}"

"""Persisted gram index + incremental exact-substring cut
(streaming/gramidx.py): the stored index equals a full recompute after
every refresh — across inserts, deletes, updates and the cut's own
rewrites — and the incremental cut leaves NOTHING the full pass would
still find."""

from __future__ import annotations

import datetime
import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from tapdata_connectors_spark.functions.xxh import spark_xxhash64
from tapdata_connectors_spark.sources.generator import stage_events
from tapdata_connectors_spark.streaming import (
    CdcPipeline,
    create_gram_index,
    cut_spans,
    cut_spans_incremental,
    find_cut_rewrites,
    gramidx_watermark,
    refresh_gram_index,
)

_H = "<html><body>{}</body></html>"
N = 3  # gram width used throughout


def _bootstrap(spark, base, pages, **kw):
    rows = [Row(url=u, warc_ts=datetime.datetime(2026, 1, 1, 0, 0, i),
                html=_H.format(body).encode(), lang="en")
            for i, (u, body) in enumerate(pages)]
    pipe = CdcPipeline(spark, f"{base}/pages", f"{base}/staging",
                       n_buckets=4, **kw)
    pipe.bootstrap_snapshot(spark.createDataFrame(rows))
    return pipe


def _cdc_events(spark, rows):
    from tapdata_connectors_spark.schema import EVENTS_SCHEMA

    out = []
    for seq, epoch, op, url, body in rows:
        ts = datetime.datetime(2026, 6, 2, 0, 0, seq % 60)
        after = ((url, ts, _H.format(body).encode(), "en")
                 if op != "D" else None)
        out.append((seq, epoch, op, url, ts, None, after,
                    None, None, None, f"x{seq}", None))
    return spark.createDataFrame(out, EVENTS_SCHEMA)


def _gh(gram: str) -> int:
    # mirrors operators/corpus.gram_hash (Spark xxhash64, seed 42)
    return spark_xxhash64(gram, "string")


def _py_gram_state(texts: dict[str, str], n: int = N):
    """Python oracle: gh -> (n_docs, holder-if-singleton)."""
    holders: dict[int, set[str]] = {}
    for doc, text in texts.items():
        toks = [t for t in text.lower().split() if t]
        for i in range(len(toks) - n + 1):
            holders.setdefault(_gh(" ".join(toks[i:i + n])), set()).add(doc)
    return {gh: (len(ds), next(iter(ds)) if len(ds) == 1 else None)
            for gh, ds in holders.items()}


def _live_texts(pipe):
    return {r["url"]: r["text"] for r in
            pipe.table.read().select("url", "text").collect()
            if r["text"] is not None}


def _stored_state(idx):
    return {r["gh"]: (r["n_docs"], r["solo_doc"]) for r in
            idx.read().select("gh", "n_docs", "solo_doc").collect()}


def _assert_index_matches(idx, pipe, allow_unknown_solo: bool = False):
    """Stored index == python recompute over current live text. Counts
    must match exactly; solo_doc must match except it may be NULL for
    decrement-to-1 grams (the documented unknown-holder bound) when
    `allow_unknown_solo`."""
    want = _py_gram_state(_live_texts(pipe))
    got = _stored_state(idx)
    assert set(got) == set(want), (
        f"gram sets differ: extra={set(got) - set(want)} "
        f"missing={set(want) - set(got)}")
    for gh, (n_docs, solo) in got.items():
        wn, wsolo = want[gh]
        assert n_docs == wn, f"gh={gh}: stored n_docs {n_docs} != {wn}"
        if wn == 1:
            if solo is None:
                assert allow_unknown_solo, f"gh={gh}: solo unexpectedly NULL"
            else:
                assert solo == wsolo, f"gh={gh}: solo {solo} != {wsolo}"
        else:
            assert solo is None


SPAN10 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


def test_gram_index_tracks_full_recompute(spark, tmpdir_):
    """Build-from-empty, then inserts / an update / a delete across two
    epochs: after every refresh the stored index equals a python
    recompute over the live corpus (counts exactly; singleton holders
    exactly except documented decrement-to-1 unknowns)."""
    pipe = _bootstrap(spark, tmpdir_, [
        ("g/a", SPAN10 + " unique one"),
        ("g/b", "totally different words entirely here"),
    ], merge_mode="mor")
    idx = create_gram_index(spark, f"{tmpdir_}/gramidx", n_buckets=4)

    rep = refresh_gram_index(pipe, idx, n=N)       # initial build
    assert not rep["skipped"] and rep["adjusted_grams"] > 0
    assert gramidx_watermark(idx) == pipe.table.current_version()
    _assert_index_matches(idx, pipe)

    # idempotent: nothing moved -> skipped
    assert refresh_gram_index(pipe, idx, n=N)["skipped"] is True

    # epoch 1: a new dup holder, an unrelated insert
    stage_events(_cdc_events(spark, [
        (10, 0, "I", "g/c", SPAN10 + " other two"),
        (11, 0, "I", "g/d", "fresh standalone page body text"),
    ]), f"{tmpdir_}/staging")
    pipe.replay_batch()
    rep = refresh_gram_index(pipe, idx, n=N)
    assert not rep["skipped"]
    _assert_index_matches(idx, pipe)

    # epoch 2: update rewrites g/d's text; delete g/c (decrements SPAN10
    # grams 2 -> 1: holders become unknown — the documented bound)
    stage_events(_cdc_events(spark, [
        (20, 1, "U", "g/d", "rewritten standalone body text"),
        (21, 1, "D", "g/c", None),
    ]), f"{tmpdir_}/staging", mode="append")
    pipe.replay_batch()
    rep = refresh_gram_index(pipe, idx, n=N)
    assert not rep["skipped"] and rep["unknown_solo"] > 0
    _assert_index_matches(idx, pipe, allow_unknown_solo=True)


def test_incremental_cut_rewrites_untouched_old_holder(spark, tmpdir_):
    """THE case a touched-docs-only incremental pass would miss: an old
    page holds a 10-token span alone; a NEW page arrives sharing it. The
    crossing (docfreq 1 -> 2) must pull the untouched old holder into
    the rewrite set, and both pages lose the span."""
    pipe = _bootstrap(spark, tmpdir_, [
        ("c/old", SPAN10 + " unique old tail"),
        ("c/other", "completely unrelated page body here"),
    ], merge_mode="mor")
    idx = create_gram_index(spark, f"{tmpdir_}/gramidx", n_buckets=4)
    refresh_gram_index(pipe, idx, n=N)

    stage_events(_cdc_events(spark, [
        (10, 0, "I", "c/new", SPAN10 + " brand new tail"),
    ]), f"{tmpdir_}/staging")
    pipe.replay_batch()

    rep = cut_spans_incremental(pipe, idx, n=N, min_span=10, tag="e1")
    assert rep["n_rewrites"] == 2
    assert rep["affected_docs"] == 2               # c/new + crossing c/old
    assert rep["unknown_holder_crossings"] == 0
    texts = _live_texts(pipe)
    assert texts["c/old"] == "unique old tail"
    assert texts["c/new"] == "brand new tail"
    assert "unrelated" in texts["c/other"]          # untouched
    # the cut's own gram removals were folded back into the index
    assert gramidx_watermark(idx) == pipe.table.current_version()
    _assert_index_matches(idx, pipe, allow_unknown_solo=True)
    # full pass finds nothing left
    assert find_cut_rewrites(pipe, n=N, min_span=10).head(1) == []


def test_incremental_cut_equals_full_pass(spark, tmpdir_):
    """Same single-epoch delta, two pipelines: incremental cut (index
    probe) and full cut_spans land byte-identical text state."""
    pages = [("f/a", SPAN10 + " unique one"),
             ("f/b", "another page with its own words")]
    delta = [(10, 0, "I", "f/c", SPAN10 + " other two"),
             (11, 0, "U", "f/b", "another page with fresh words")]

    pipe_i = _bootstrap(spark, tmpdir_, pages, merge_mode="mor")
    idx = create_gram_index(spark, f"{tmpdir_}/gramidx", n_buckets=4)
    refresh_gram_index(pipe_i, idx, n=N)
    stage_events(_cdc_events(spark, delta), f"{tmpdir_}/staging")
    pipe_i.replay_batch()
    cut_spans_incremental(pipe_i, idx, n=N, min_span=10, tag="e1")

    full_dir = os.path.join(tmpdir_, "full")
    os.makedirs(full_dir, exist_ok=True)
    pipe_f = _bootstrap(spark, full_dir, pages, merge_mode="mor")
    stage_events(_cdc_events(spark, delta), f"{full_dir}/staging")
    pipe_f.replay_batch()
    cut_spans(pipe_f, n=N, min_span=10, tag="full")

    assert _live_texts(pipe_i) == _live_texts(pipe_f)


def test_incremental_cut_multi_epoch_fixpoint(spark, tmpdir_):
    """Across several epochs (inserts, an update creating a new dup, a
    delete) with an incremental cut after each, the full pass finds no
    remaining rewrite and the index still matches a recompute."""
    pipe = _bootstrap(spark, tmpdir_, [
        ("m/a", SPAN10 + " unique one"),
        ("m/b", SPAN10 + " other two"),
    ], merge_mode="mor")
    idx = create_gram_index(spark, f"{tmpdir_}/gramidx", n_buckets=4)
    # no explicit build: the first incremental pass's window starts at
    # watermark 0, so the whole bootstrap arrives as touched docs and the
    # pre-existing dup span is cleared — build and cut in one stage
    rep0 = cut_spans_incremental(pipe, idx, n=N, min_span=10, tag="e0")
    assert rep0["n_rewrites"] == 2

    epochs = [
        [(10, 0, "I", "m/c", "third page sharing nothing at all")],
        [(20, 1, "U", "m/c", SPAN10 + " now duplicated tail"),
         (21, 1, "I", "m/d", SPAN10 + " fourth holder body")],
        [(30, 2, "D", "m/d", None),
         (31, 2, "I", "m/e", "closing page unlike the rest")],
    ]
    for i, ev in enumerate(epochs):
        stage_events(_cdc_events(spark, ev), f"{tmpdir_}/staging",
                     mode="append" if i else "overwrite")
        pipe.replay_batch()
        cut_spans_incremental(pipe, idx, n=N, min_span=10, tag=f"e{i + 1}")

    assert find_cut_rewrites(pipe, n=N, min_span=10).head(1) == []
    _assert_index_matches(idx, pipe, allow_unknown_solo=True)
    # epoch-guard: re-running a tag whose cut committed is a no-op
    # (e2 carried the rewrites; e1/e3 had none, so no epoch to guard)
    assert cut_spans_incremental(pipe, idx, n=N, min_span=10,
                                 tag="e2").get("skipped") is True


def test_unknown_holder_bound_is_counted(spark, tmpdir_):
    """The documented staleness bound: a gram decremented 2 -> 1 loses
    its holder identity; when it later crosses back to 2 the incremental
    pass reports the miss (unknown_holder_crossings) instead of silently
    under-cutting. The miss is self-limiting — the new holder IS cut, so
    exactly one copy of the span survives (and, its duplicates gone, even
    a full pass has nothing left to act on)."""
    pipe = _bootstrap(spark, tmpdir_, [
        ("u/a", SPAN10 + " unique one"),
        ("u/b", SPAN10 + " other two"),
    ], merge_mode="mor")
    idx = create_gram_index(spark, f"{tmpdir_}/gramidx", n_buckets=4)
    refresh_gram_index(pipe, idx, n=N)
    # delete u/b BEFORE any cut: SPAN10's grams drop 2 -> 1, holder u/a
    # becomes unknown in the index
    stage_events(_cdc_events(spark, [(10, 0, "D", "u/b", None)]),
                 f"{tmpdir_}/staging")
    pipe.replay_batch()
    refresh_gram_index(pipe, idx, n=N)
    assert _stored_state(idx)[_gh("alpha beta gamma")] == (1, None)

    # new holder re-crosses 1 -> 2: incremental cuts the NEW page but
    # cannot name the old holder — the report says so
    stage_events(_cdc_events(spark, [(20, 1, "I", "u/c",
                                      SPAN10 + " third body")]),
                 f"{tmpdir_}/staging", mode="append")
    pipe.replay_batch()
    rep = cut_spans_incremental(pipe, idx, n=N, min_span=10, tag="e1")
    assert rep["unknown_holder_crossings"] > 0
    assert rep["n_rewrites"] == 1                   # u/c only
    texts = _live_texts(pipe)
    assert texts["u/c"] == "third body"
    assert texts["u/a"].startswith("alpha")         # the one surviving copy
    # with its duplicates cut, the copy is unique again: nothing remains
    # for any pass to find (the self-limiting bound)
    assert find_cut_rewrites(pipe, n=N, min_span=10).head(1) == []


def test_refresh_resumes_after_cut_commit(spark, tmpdir_):
    """Crash-shaped resume between phase 2 and 3: with the cut already
    committed under its tag but the index not yet advanced, a re-run
    skips the cut, folds the window (including the cut's own changes),
    and converges to the same state."""
    pipe = _bootstrap(spark, tmpdir_, [
        ("r/a", SPAN10 + " unique one"),
        ("r/b", SPAN10 + " other two"),
    ], merge_mode="mor")
    idx = create_gram_index(spark, f"{tmpdir_}/gramidx", n_buckets=4)
    refresh_gram_index(pipe, idx, n=N)

    stage_events(_cdc_events(spark, [(10, 0, "I", "r/c",
                                      SPAN10 + " third body")]),
                 f"{tmpdir_}/staging")
    pipe.replay_batch()
    # simulate the crash: run the cut through the ordinary stage, then
    # roll the INDEX back by rebuilding it at the pre-cut watermark — the
    # epoch guard on the pages table keeps the cut applied
    wm_before = gramidx_watermark(idx)
    cut_spans_incremental(pipe, idx, n=N, min_span=10, tag="e1")
    idx2 = create_gram_index(spark, f"{tmpdir_}/gramidx2", n_buckets=4)
    # rebuild a stale index: fold only up to the pre-cut version
    refresh_gram_index(pipe, idx2, n=N, to_version=wm_before)
    # resume with the stale index and the SAME tag: cut skips (guard),
    # refresh folds the full window
    rep = cut_spans_incremental(pipe, idx2, n=N, min_span=10, tag="e1")
    assert rep["n_rewrites"] == 0
    assert gramidx_watermark(idx2) == pipe.table.current_version()
    _assert_index_matches(idx2, pipe, allow_unknown_solo=True)

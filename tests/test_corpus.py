"""Corpus operators (operators/corpus.py) vs independent Python oracles,
and their lake integrations: dedup_pages (streaming/curation.py) and
ingest-time enrichment columns (CdcPipeline(enrich=...))."""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from tapdata_connectors_spark.operators import corpus
from tapdata_connectors_spark.sources.generator import GeneratorConfig, generate_events, stage_events
from tapdata_connectors_spark.streaming import CdcPipeline, dedup_pages, find_dup_pages

DOCS = [
    (1, "the cat sat on the mat and looked at the dog"),
    (2, "the cat sat on the mat and looked at the dog"),          # exact dup of 1
    (3, "the cat sat on the mat and looked at a dog"),            # near dup of 1
    (4, "der hund ist nicht und der die das haus war gross"),
    (5, "completely different text with no overlap whatsoever here today"),
    (6, "THE CAT SAT ON THE MAT AND LOOKED AT THE DOG"),          # case-different
]


def _docs_df(spark):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in DOCS])


# ---------------------------------------------------------------------------
# python oracles
# ---------------------------------------------------------------------------

def _py_tokens(t):
    return [w for w in re.split(r"\s+", t.lower()) if w]


def _py_shingles(t, k=3):
    tk = _py_tokens(t)
    return {" ".join(tk[i:i + k]) for i in range(max(len(tk) - k + 1, 0))}


def _py_h32(s, hexchars=8):
    return int(hashlib.md5(s.encode()).hexdigest()[:hexchars], 16)


def _py_minhash(t, n_perms, k=3):
    hs = {_py_h32(s) for s in _py_shingles(t, k)}
    P = corpus.MINHASH_PRIME
    out = []
    for p in range(n_perms):
        a, b = corpus.minhash_perm_consts(p)
        out.append(min(((h % P) * a + b) % P for h in hs) if hs else None)
    return out


def test_exact_dup_losers_vs_oracle(spark):
    got = {(r["doc_id"], r["survivor_id"])
           for r in corpus.exact_dup_losers(_docs_df(spark)).collect()}
    by_text: dict[str, list[int]] = {}
    for i, t in DOCS:
        by_text.setdefault(t, []).append(i)
    want = {(i, min(ids)) for ids in by_text.values() for i in ids if i != min(ids)}
    assert got == want == {(2, 1)}


def test_shingle_minhash_vs_oracle(spark):
    cfg = corpus.MinHashConfig(n_perms=4, rows_per_band=2)
    rows = corpus.shingle_minhash(_docs_df(spark), cfg).collect()
    assert len(rows) == len(DOCS)
    for r in rows:
        text = dict(DOCS)[r["doc_id"]]
        assert sorted(r["sh"]) == sorted({_py_h32(s) for s in _py_shingles(text)})
        assert r["n"] == len(_py_shingles(text))
        mh = _py_minhash(text, 4)
        assert [r[f"mh{p}"] for p in range(4)] == mh


def test_near_dup_pairs_vs_oracle(spark):
    cfg = corpus.MinHashConfig(n_perms=8, rows_per_band=2)
    got = {(r["doc_a"], r["doc_b"]): (r["n_inter"], r["n_union"], r["is_dup"])
           for r in corpus.near_dup_pairs(_docs_df(spark), cfg).collect()}
    # python oracle: same LSH bucketing -> candidates -> exact jaccard
    sigs = {i: _py_minhash(t, 8) for i, t in DOCS}
    buckets: dict[tuple, list[int]] = {}
    for i, mh in sigs.items():
        for b in range(4):
            buckets.setdefault((b, mh[2 * b], mh[2 * b + 1]), []).append(i)
    cand = set()
    for ids in buckets.values():
        for a in ids:
            for b in ids:
                if a < b:
                    cand.add((a, b))
    want = {}
    texts = dict(DOCS)
    for a, b in cand:
        sa, sb = _py_shingles(texts[a]), _py_shingles(texts[b])
        inter, union = len(sa & sb), len(sa | sb)
        want[(a, b)] = (inter, union, inter * 10 >= union * 8)
    assert got == want
    assert got[(1, 2)][2] is True          # exact dup found
    assert (1, 6) in got and got[(1, 6)][2]  # case-folded dup found
    assert (1, 5) not in got               # unrelated docs never candidates


def test_minhash_config_knobs(spark):
    # more permutations -> more/equal candidate pairs (recall knob)
    few = corpus.lsh_candidate_pairs(
        corpus.shingle_minhash(_docs_df(spark), corpus.MinHashConfig(n_perms=2)),
        corpus.MinHashConfig(n_perms=2),
    ).count()
    many = corpus.lsh_candidate_pairs(
        corpus.shingle_minhash(_docs_df(spark), corpus.MinHashConfig(n_perms=16)),
        corpus.MinHashConfig(n_perms=16),
    ).count()
    assert many >= few
    with pytest.raises(ValueError):
        corpus.MinHashConfig(n_perms=7, rows_per_band=2).bands


def test_simhash_width_and_oracle(spark):
    rows = {r["doc_id"]: r["simhash"]
            for r in corpus.simhash(_docs_df(spark), bits=60).collect()}
    for i, t in DOCS:
        w = [0] * 60
        for tok in _py_tokens(t):
            h = _py_h32(tok, 15)
            for b in range(60):
                w[b] += 1 if (h >> b) & 1 else -1
        want = sum(1 << b for b in range(60) if w[b] > 0)
        assert rows[i] == want
    # identical texts -> identical simhash; near-dups -> small hamming
    assert rows[1] == rows[2] == rows[6]
    ham = bin(rows[1] ^ rows[3]).count("1")
    assert ham <= 20, f"near-dup hamming {ham} too large"
    with pytest.raises(ValueError):
        corpus.simhash(_docs_df(spark), bits=64)


def test_lang_id_col_matches_lang_scores(spark):
    d = _docs_df(spark)
    via_scores = {r["doc_id"]: r["pred_lang"] for r in corpus.lang_scores(d).collect()}
    via_col = {r["doc_id"]: r["p"]
               for r in d.select("doc_id", corpus.lang_id_col(F.col("text")).alias("p")).collect()}
    assert via_scores == via_col
    assert via_scores[1] == "en" and via_scores[4] == "de" and via_scores[5] == "und"


def test_fingerprint_normalization(spark):
    d = spark.createDataFrame(
        [Row(doc_id=1, text="Hello   World"), Row(doc_id=2, text="hello world"),
         Row(doc_id=3, text="hello\tworld"), Row(doc_id=4, text="different")]
    )
    fp = {r["doc_id"]: r["f"]
          for r in d.select("doc_id", corpus.fingerprint(F.col("text")).alias("f")).collect()}
    assert fp[1] == fp[2] == fp[3] != fp[4]
    assert fp[1] == hashlib.md5(b"hello world").hexdigest()[:16]


# ---------------------------------------------------------------------------
# lake integration: dedup_pages
# ---------------------------------------------------------------------------

def _page(url, html):
    return Row(url=url, warc_ts=None, html=html.encode(), lang="en")


def _bootstrap_pipe(spark, tmpdir_, pages, **kw):
    import datetime

    rows = [Row(url=u, warc_ts=datetime.datetime(2026, 1, 1, 0, 0, i),
                html=h.encode(), lang="en")
            for i, (u, h) in enumerate(pages)]
    df = spark.createDataFrame(rows)
    pipe = CdcPipeline(spark, f"{tmpdir_}/pages", f"{tmpdir_}/staging",
                       n_buckets=4, **kw)
    pipe.bootstrap_snapshot(df)
    return pipe

# text_extract strips tags/whitespace, so identical body text => dup
_H = "<html><body>{}</body></html>"
PAGES = [
    ("u/a", _H.format("same content here")),
    ("u/b", _H.format("same content here")),      # dup of u/a
    ("u/c", _H.format("other content")),
    ("u/d", _H.format("  same   content here ")),  # extraction normalizes ws -> dup
]


def test_dedup_pages_exact(spark, tmpdir_):
    pipe = _bootstrap_pipe(spark, tmpdir_, PAGES)
    rep = dedup_pages(pipe, "exact", tag="t1")
    assert rep["n_losers"] >= 1
    left = {r["url"] for r in pipe.table.read().select("url").collect()}
    # python oracle over the table's own extracted text
    texts = {r["url"]: r["text"]
             for r in pipe.table.read_raw().select("url", "text").collect()}
    by_text: dict[str, list[str]] = {}
    for u, t in texts.items():
        by_text.setdefault(t, []).append(u)
    want = {min(us) for us in by_text.values()}
    assert left == want
    assert "u/b" not in left and "u/a" in left
    # idempotent per tag
    assert dedup_pages(pipe, "exact", tag="t1").get("skipped") is True
    # lineage rows written under the curation epoch
    from tapdata_connectors_spark.streaming.curation import CURATION_EPOCH
    lin = pipe.lineage().filter(F.col("epoch") == CURATION_EPOCH)
    assert lin.agg(F.sum("n_delete")).collect()[0][0] == rep["n_losers"]


def test_dedup_pages_resurrection_after_new_event(spark, tmpdir_):
    """A tombstoned loser keeps its stored (ts, seq): a genuinely NEWER
    insert re-creates the page (LWW by source order survives curation),
    while a redelivered OLD event stays stale — exactly-once holds through
    a curation commit."""
    import datetime

    from tapdata_connectors_spark.schema import EVENTS_SCHEMA

    pipe = _bootstrap_pipe(spark, tmpdir_, PAGES)
    dedup_pages(pipe, "exact", tag="t1")
    assert "u/b" not in {r["url"] for r in pipe.table.read().select("url").collect()}

    def ins(seq, epoch, ts, body):
        return Row(event_seq=seq, epoch=epoch, op="I", url="u/b", warc_ts=ts,
                   before=None,
                   after=Row(url="u/b", warc_ts=ts,
                             html=_H.format(body).encode(), lang="en"),
                   removed_fields=None, extras=None, ddl=None,
                   exactly_once_id=f"x{seq}", ts_ms=None)

    ev = spark.createDataFrame([
        # epoch 0: redelivery predating the bootstrap row -> stale, dropped
        ins(50, 0, datetime.datetime(2020, 1, 1), "stale redelivery"),
        # epoch 1: genuinely new crawl -> resurrects the page
        ins(100, 1, datetime.datetime(2027, 1, 1), "fresh recrawl"),
    ], schema=EVENTS_SCHEMA)
    stage_events(ev, f"{tmpdir_}/staging")
    pipe.replay_batch()
    rows = {r["url"]: r["text"] for r in pipe.table.read().select("url", "text").collect()}
    assert rows.get("u/b") == "fresh recrawl"


def test_dedup_pages_minhash_dry_run(spark, tmpdir_):
    pages = PAGES + [("u/e", _H.format("same content here today friends"))]
    pipe = _bootstrap_pipe(spark, tmpdir_, pages)
    losers = find_dup_pages(pipe, "minhash",
                            corpus.MinHashConfig(n_perms=8, rows_per_band=2))
    got = {(r["url"], r["survivor_id"]) for r in losers.collect()}
    # exact dup u/b; ws-variant u/d has identical shingle set -> jaccard 1
    assert ("u/b", "u/a") in got
    assert ("u/d", "u/a") in got
    rep = dedup_pages(pipe, "minhash", tag="dry", dry_run=True)
    assert rep["dry_run"] and rep["n_losers"] == len(got)
    # dry run committed nothing
    assert pipe.table.read().count() == len(pages)


# ---------------------------------------------------------------------------
# lake integration: ingest-time enrichment (chained DerivedSpecs)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_enrichment_columns_end_to_end(spark, tmpdir_, mode):
    cfg = GeneratorConfig(n_events=600, n_urls=80, epoch_size=200,
                          p_update=0.4, p_delete=0.1)
    ev = generate_events(spark, cfg)
    stage_events(ev, f"{tmpdir_}/staging")
    pipe = CdcPipeline(spark, f"{tmpdir_}/pages", f"{tmpdir_}/staging",
                       n_buckets=4, merge_mode=mode,
                       enrich=["fingerprint", "pred_lang"])
    pipe.replay_batch()
    if mode == "mor":
        pipe.table.compact()
    final = pipe.table.read()
    assert {"fingerprint", "pred_lang"} <= set(final.columns)
    # stored enrichment == recomputing from the stored text, every row
    bad = final.filter(
        (F.col("fingerprint") != corpus.fingerprint(F.col("text")))
        | (F.col("pred_lang") != corpus.lang_id_col(F.col("text")))
        | (F.col("text").isNotNull() & F.col("fingerprint").isNull())
    ).count()
    assert bad == 0
    assert final.filter(F.col("fingerprint").isNotNull()).count() > 0
    # enrichment cols never entered the fold payload
    assert {"fingerprint", "pred_lang"}.isdisjoint(
        {c.name for c in pipe.payload_specs()}
    )


def test_enrichment_bootstrap(spark, tmpdir_):
    pipe = _bootstrap_pipe(spark, tmpdir_, PAGES,
                           enrich=["fingerprint", "pred_lang"])
    final = pipe.table.read()
    bad = final.filter(
        F.col("fingerprint") != corpus.fingerprint(F.col("text"))
    ).count()
    assert bad == 0


def test_simhash_near_dup_pigeonhole_recall(spark):
    """Banded simhash near-dup must find EVERY pair within max_hamming
    (pigeonhole: Hamming ≤ n_bands-1 forces exact agreement on ≥1 band)
    and verify exactly — compare against brute force over the simhashes."""
    docs = []
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    for i in range(40):
        words = base.split()
        # small perturbations -> clusters of near-identical fingerprints
        if i % 4:
            words[i % len(words)] = f"w{i}"
        docs.append(Row(doc_id=i, text=" ".join(words)))
    df = spark.createDataFrame(docs)
    sh = {r["doc_id"]: r["simhash"] for r in corpus.simhash(df).collect()}
    brute = {
        (a, b): bin(sh[a] ^ sh[b]).count("1")
        for a in sh for b in sh if a < b
        if bin(sh[a] ^ sh[b]).count("1") <= 3
    }
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in corpus.simhash_near_dup(df, n_bands=4, max_hamming=3).collect()
    }
    assert got == brute
    assert brute, "fixture must actually contain near-dup pairs"


def test_simhash_near_dup_guards():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_hamming"):
        corpus.simhash_near_dup(None, n_bands=4, max_hamming=4)
    with _pytest.raises(ValueError, match="divide"):
        corpus.simhash_near_dup(None, bits=60, n_bands=7, max_hamming=3)


def test_bpe_tokens_presplit_shape(spark):
    """BPE pre-tokenization vs whitespace on the canonical cases:
    contractions, punctuation and digit runs split into their own
    tokens, so counts track real subword-tokenizer input lengths."""
    df = spark.createDataFrame([
        Row(doc_id=0, text="don't stop!"),
        Row(doc_id=1, text="v2.0 has 100x speedup"),
        Row(doc_id=2, text=""),
    ])
    out = {r["doc_id"]: (r["n_tokens_ws"], r["n_tokens_bpe"], r["bpe_per_ws_x1e3"])
           for r in corpus.bpe_token_stats(df).collect()}
    # "don't stop!" -> ws [don't, stop!] ; bpe [don, ', t, stop, !]
    assert out[0] == (2, 5, 2500)
    # "v2.0 has 100x speedup" -> ws 4 ; bpe [v, 2, ., 0, has, 100, x, speedup]
    assert out[1] == (4, 8, 2000)
    assert out[2] == (0, 0, None)


def test_dedup_pages_simhash(spark, tmpdir_):
    """simhash curation stage: a near-identical page (one word changed in
    a long text) tombstones against the smaller-url survivor; unrelated
    pages stay."""
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon " * 3)
    near = base.replace("sigma", "sigmaX", 1)
    pages = [
        ("u/a", _H.format(base)),
        ("u/b", _H.format(near)),          # near-dup of u/a
        ("u/c", _H.format("completely different text about other topics entirely")),
    ]
    pipe = _bootstrap_pipe(spark, tmpdir_, pages)
    losers = {(r["url"], r["survivor_id"])
              for r in find_dup_pages(pipe, "simhash").collect()}
    assert losers == {("u/b", "u/a")}
    rep = dedup_pages(pipe, "simhash", tag="s1")
    assert rep["n_losers"] == 1
    left = {r["url"] for r in pipe.table.read().select("url").collect()}
    assert left == {"u/a", "u/c"}
    # idempotent per tag
    assert dedup_pages(pipe, "simhash", tag="s1").get("skipped")


# ---------------------------------------------------------------------------
# transitive-closure dedup (connected components) + cache hygiene
# ---------------------------------------------------------------------------

def test_dup_components_star_and_chain(spark):
    """VERDICT r3 item 5 done-criterion: on a star 1~3, 2~3 (1≁2) the
    one-sweep min-neighbor policy keeps TWO survivors (1 and 2) while
    closure keeps ONE (the component minimum); on a chain 10~11~12 the
    sweep attributes 12 to the non-surviving 11, closure to 10."""
    pairs = spark.createDataFrame(
        [Row(doc_a=1, doc_b=3), Row(doc_a=2, doc_b=3),
         Row(doc_a=10, doc_b=11), Row(doc_a=11, doc_b=12)]
    )
    comps = {(r["doc_id"], r["component_id"])
             for r in corpus.dup_components(pairs).collect()}
    assert comps == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (12, 10)}

    closure_losers = {(r["doc_id"], r["survivor_id"])
                      for r in corpus.component_losers(pairs).collect()}
    assert closure_losers == {(2, 1), (3, 1), (11, 10), (12, 10)}
    closure_survivors = {1, 2, 3, 10, 11, 12} - {d for d, _ in closure_losers}
    assert closure_survivors == {1, 10}  # ONE survivor per component

    # the one-sweep policy on the same edges: two survivors in the star
    # component, and 12's survivor is the non-surviving 11
    sweep = {r["doc_b"]: r["survivor_id"]
             for r in pairs.groupBy("doc_b")
             .agg(F.min("doc_a").alias("survivor_id")).collect()}
    sweep_survivors = {1, 2, 3, 10, 11, 12} - set(sweep)
    assert sweep_survivors == {1, 2, 10}      # star keeps both 1 and 2
    assert sweep[12] == 11                    # chain attributes to a loser


def test_dup_components_cache_registry(spark):
    """With a cache_registry the caller owns the final labels frame; no
    other cached RDDs survive the call (intermediate rounds + edge frame
    release themselves)."""
    before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet())
    pairs = spark.createDataFrame([Row(doc_a=1, doc_b=2), Row(doc_a=2, doc_b=3)])
    reg: list = []
    out = corpus.dup_components(pairs, cache_registry=reg)
    assert {(r["doc_id"], r["component_id"]) for r in out.collect()} == {
        (1, 1), (2, 1), (3, 1)
    }
    assert len(reg) == 1
    for c in reg:
        c.unpersist(blocking=True)
    after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet())
    assert after <= before, f"leaked cached RDDs: {after - before}"


def _random_dup_graph(spark, seed=7, n=120, extra=60):
    """Deterministic random graph: a few chains/stars plus random edges."""
    import random

    rng = random.Random(seed)
    edges = [(i, i + 1) for i in range(0, 30)]                 # long chain
    edges += [(50, j) for j in range(51, 60)]                  # star
    edges += [(rng.randrange(n), rng.randrange(n)) for _ in range(extra)]
    edges = [(a, b) for a, b in edges if a != b]
    return spark.createDataFrame([Row(doc_a=a, doc_b=b) for a, b in edges])


def test_dup_components_distributed_matches_driver_path(spark):
    """driver_threshold=0 forces the distributed parquet-spill loop; its
    labels must equal the driver union-find's on a random graph with a
    30-hop chain (many propagation rounds)."""
    pairs = _random_dup_graph(spark)
    fast = {(r["doc_id"], r["component_id"])
            for r in corpus.dup_components(pairs).collect()}
    reg: list = []
    dist = {(r["doc_id"], r["component_id"])
            for r in corpus.dup_components(
                pairs, driver_threshold=0, cache_registry=reg).collect()}
    assert dist == fast
    for c in reg:
        c.unpersist(blocking=True)


def test_dup_components_distributed_survives_cache_loss(spark, tmpdir_):
    """VERDICT r4 item 1 done-criterion: every cached block is dropped
    after every round's spill commit (simulating executor loss — the old
    localCheckpoint died here because its blocks had no lineage), and the
    loop still completes with correct labels because rounds live on
    reliable storage. Also pins spill-dir cleanup via the registry handle."""
    import os

    spill = os.path.join(tmpdir_, "ccspill")

    def nuke_all_cache(sp, _round):
        sp.catalog.clearCache()
        jsc_sc = sp.sparkContext._jsc.sc()
        for i in list(sp.sparkContext._jsc.getPersistentRDDs().keySet()):
            opt = jsc_sc.persistentRdds().get(int(str(i)))
            if opt.isDefined():
                opt.get().unpersist(True)

    pairs = _random_dup_graph(spark)
    expect = {(r["doc_id"], r["component_id"])
              for r in corpus.dup_components(pairs).collect()}
    reg: list = []
    out = corpus.dup_components(pairs, driver_threshold=0, spill_dir=spill,
                                cache_registry=reg, _round_hook=nuke_all_cache)
    assert {(r["doc_id"], r["component_id"]) for r in out.collect()} == expect
    assert os.path.isdir(spill) and os.listdir(spill)   # spill actually used
    for c in reg:
        c.unpersist(blocking=True)
    # handle removed the run dir; caller-owned spill root remains
    assert os.listdir(spill) == []


def test_dedup_pages_closure_chain(spark, tmpdir_):
    """Curation with closure=True on a simhash chain a~b~c (a≁c): one
    survivor, and c attributes to the SURVIVING a (not the dropped b)."""
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon " * 3)
    mid = base.replace("sigma", "sigmaX", 1)              # near a AND c
    far = base.replace("sigma", "sigmaX", 1).replace("kappa", "kappaY", 1)
    pages = [("u/a", _H.format(base)), ("u/b", _H.format(mid)),
             ("u/c", _H.format(far))]
    pipe = _bootstrap_pipe(spark, tmpdir_, pages)
    pairs = {(r["doc_a"], r["doc_b"])
             for r in corpus.simhash_near_dup(
                 pipe.table.read(), id_col="url", text_col="text").collect()}
    # fixture sanity: chain through u/b (direct a~c may or may not hold —
    # only require the chain edges)
    assert ("u/a", "u/b") in pairs and ("u/b", "u/c") in pairs
    losers = {(r["url"], r["survivor_id"])
              for r in find_dup_pages(pipe, "simhash", closure=True).collect()}
    assert losers == {("u/b", "u/a"), ("u/c", "u/a")}
    rep = dedup_pages(pipe, "simhash", tag="cc1", closure=True)
    assert rep["n_losers"] == 2
    left = {r["url"] for r in pipe.table.read().select("url").collect()}
    assert left == {"u/a"}


@pytest.mark.parametrize("method,closure", [
    ("minhash", False), ("simhash", False), ("simhash", True),
])
def test_dedup_pages_leaves_no_cached_rdds(spark, tmpdir_, method, closure):
    """VERDICT r3 item 4 done-criterion: a curation pass releases every
    frame it persisted (assertable via getPersistentRDDs)."""
    before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet())
    pages = [("u/a", _H.format("same content here and more words to hash")),
             ("u/b", _H.format("same content here and more words to hash")),
             ("u/c", _H.format("unrelated text entirely about different things"))]
    pipe = _bootstrap_pipe(spark, tmpdir_, pages)
    rep = dedup_pages(pipe, method, tag=f"hyg-{method}-{closure}",
                      closure=closure)
    assert rep["n_losers"] >= 1
    after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet())
    assert after <= before, f"curation leaked cached RDDs: {after - before}"


# ---------------------------------------------------------------------------
# round 4: repetition / cross-doc n-grams / quality gate / top terms
# ---------------------------------------------------------------------------

def _py_ngrams(t, n):
    w = _py_tokens(t)
    return [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)] if len(w) >= n else []


def test_repetition_stats_vs_oracle(spark):
    rows = {r.doc_id: r for r in corpus.repetition_stats(_docs_df(spark)).collect()}
    for i, t in DOCS:
        w = _py_tokens(t)
        r = rows[i]
        assert r.n_words == len(w)
        for n, col in ((2, r.dup_2gram_x1e3), (3, r.dup_3gram_x1e3)):
            g = _py_ngrams(t, n)
            exp = (len(g) - len(set(g))) * 1000 // len(g) if g else None
            assert col == exp, (i, n)
        top = max(w.count(d) for d in set(w))
        assert r.top_word_x1e3 == top * 1000 // len(w)


def test_repetition_stats_degenerate(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="word"), Row(doc_id=2, text="a a a a")])
    rows = {r.doc_id: r for r in corpus.repetition_stats(df).collect()}
    assert rows[1].dup_2gram_x1e3 is None          # 1 token -> no 2-grams
    assert rows[1].top_word_x1e3 == 1000
    assert rows[2].dup_2gram_x1e3 == 666           # 3 grams, 1 distinct
    assert rows[2].top_word_x1e3 == 1000


def test_cross_doc_ngram_stats_vs_oracle(spark):
    n = 3
    per_doc = {i: set(_py_ngrams(t, n)) for i, t in DOCS}
    from collections import Counter
    docfreq = Counter(g for s in per_doc.values() for g in s)
    rows = {r.doc_id: r for r in
            corpus.cross_doc_ngram_stats(_docs_df(spark), n=n).collect()}
    assert set(rows) == {i for i, _ in DOCS}       # empty-gram docs kept
    for i, _ in DOCS:
        grams = per_doc[i]
        shared = sum(1 for g in grams if docfreq[g] > 1)
        assert rows[i].n_ngrams == len(grams)
        assert rows[i].n_shared == shared, i
        exp = shared * 1000 // len(grams) if grams else None
        assert rows[i].shared_x1e3 == exp


def test_cross_doc_ngram_stats_keeps_short_docs(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="only two"), Row(doc_id=2, text="a b c d e f")])
    rows = {r.doc_id: r for r in
            corpus.cross_doc_ngram_stats(df, n=5).collect()}
    assert rows[1].n_ngrams == 0 and rows[1].n_shared == 0
    assert rows[1].shared_x1e3 is None
    assert rows[2].n_ngrams == 2 and rows[2].n_shared == 0


def test_dup_span_stats_runs_and_islands(spark):
    """Hand-computed gaps-and-islands expectations (the DuckDB oracle in
    queries.py runs the same algorithm in SQL, so this fixture is the
    independent check on the span semantics themselves)."""
    df = spark.createDataFrame([
        Row(doc_id=1, text="a b c d e f g h"),
        # shares the 5-token span "a b c d e" with doc 1 -> 3 consecutive
        # duplicated 3-gram windows -> span 3 + (3-1) = 5
        Row(doc_id=2, text="x y a b c d e z w"),
        # two SEPARATED duplicated windows ("a b c" at pos 0, "c d e" at
        # pos 6) -> two islands of run 1 -> max span 3, n_dup_windows 2
        Row(doc_id=3, text="a b c k k k c d e"),
        Row(doc_id=4, text="q r s"),    # 1 window, nothing shared
        Row(doc_id=5, text="m"),        # shorter than n -> 0 windows
    ])
    rows = {r.doc_id: r for r in corpus.dup_span_stats(df, n=3).collect()}
    assert set(rows) == {1, 2, 3, 4, 5}
    assert rows[1].n_windows == 6
    assert rows[1].n_dup_windows == 3 and rows[1].max_dup_span == 5
    assert rows[2].n_windows == 7
    assert rows[2].n_dup_windows == 3 and rows[2].max_dup_span == 5
    assert rows[3].n_windows == 7
    assert rows[3].n_dup_windows == 2 and rows[3].max_dup_span == 3
    assert rows[4].n_windows == 1
    assert rows[4].n_dup_windows == 0 and rows[4].max_dup_span is None
    assert rows[5].n_windows == 0 and rows[5].max_dup_span is None


def test_exact_substring_cut_semantics(spark):
    """n=3, min_span=4: docs 1 and 2 share the 5-token span
    'a b c d e' (>= min_span) -> cut from BOTH; doc 3 untouched.
    Overlapping covered ranges must not double-cut (distinct positions)."""
    df = spark.createDataFrame([
        Row(doc_id=1, text="a b c d e f g h"),
        Row(doc_id=2, text="x y a b c d e z w"),
        Row(doc_id=3, text="p q r s t"),
    ])
    rows = {r.doc_id: r for r in
            corpus.exact_substring_cut_full(df, n=3, min_span=4).collect()}
    assert rows[1].n_tokens == 8 and rows[1].n_tokens_cut == 5
    assert rows[1].n_spans_cut == 1 and rows[1].cleaned == "f g h"
    assert rows[2].n_tokens == 9 and rows[2].n_tokens_cut == 5
    assert rows[2].cleaned == "x y z w"
    assert rows[3].n_tokens_cut == 0 and rows[3].cleaned == "p q r s t"


def test_exact_substring_cut_below_threshold_kept(spark):
    """A shared span SHORTER than min_span survives; a doc cut in full
    comes back as the empty string."""
    df = spark.createDataFrame([
        Row(doc_id=1, text="u v w q1 q2"),          # shares only 3 tokens
        Row(doc_id=2, text="u v w r1 r2"),
        Row(doc_id=3, text="c1 c2 c3 c4 c5 c6"),    # exact duplicate pair
        Row(doc_id=4, text="c1 c2 c3 c4 c5 c6"),
    ])
    rows = {r.doc_id: r for r in
            corpus.exact_substring_cut_full(df, n=3, min_span=4).collect()}
    assert rows[1].n_tokens_cut == 0 and rows[1].cleaned == "u v w q1 q2"
    assert rows[3].n_tokens_cut == 6 and rows[3].cleaned == ""
    assert rows[4].n_tokens_cut == 6 and rows[4].cleaned == ""


def test_unigram_surprisal_bit_exact(spark):
    """counts: the=3 cat=1 dog=1, total=5 (bitlen 3) -> surprisal(the)=1,
    surprisal(cat)=surprisal(dog)=2 bits."""
    df = spark.createDataFrame([
        Row(doc_id=1, text="the the cat"),
        Row(doc_id=2, text="the dog"),
        Row(doc_id=3, text=""),
    ])
    rows = {r.doc_id: r for r in corpus.unigram_surprisal(df).collect()}
    assert rows[1].n_tokens == 3 and rows[1].surprisal_bits == 4
    assert rows[1].bits_per_token_x1e3 == 1333
    assert rows[2].n_tokens == 2 and rows[2].surprisal_bits == 3
    assert rows[2].bits_per_token_x1e3 == 1500
    assert rows[3].n_tokens == 0 and rows[3].surprisal_bits == 0
    assert rows[3].bits_per_token_x1e3 is None


def test_bigram_surprisal_bit_exact(spark):
    """corpus bigrams: 'a b'=3, 'b a'=1, 'b c'=1; head counts ctx(a)=3,
    ctx(b)=2 -> bits('a b') = bitlen(3)-bitlen(3) = 0, bits('b a') =
    bits('b c') = bitlen(2)-bitlen(1) = 1."""
    df = spark.createDataFrame([
        Row(doc_id=1, text="a b a b c"),   # bigrams ab ba ab bc
        Row(doc_id=2, text="a b"),
        Row(doc_id=3, text="x"),           # 1 token -> no bigrams
        Row(doc_id=4, text=""),
    ])
    rows = {r.doc_id: r for r in corpus.bigram_surprisal(df).collect()}
    assert rows[1].n_bigrams == 4 and rows[1].surprisal_bits == 2
    assert rows[1].bits_per_bigram_x1e3 == 500
    assert rows[2].n_bigrams == 1 and rows[2].surprisal_bits == 0
    assert rows[2].bits_per_bigram_x1e3 == 0
    for d in (3, 4):
        assert rows[d].n_bigrams == 0 and rows[d].surprisal_bits == 0
        assert rows[d].bits_per_bigram_x1e3 is None


def test_gopher_quality_flags(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text="a sensible document with several distinct words inside it"),
        Row(doc_id=2, text="spam spam spam spam spam spam spam spam"),   # top-word share 1000
        Row(doc_id=3, text="too short"),                                  # n_words < 5
    ])
    rows = {r.doc_id: r for r in corpus.gopher_quality(df).collect()}
    assert rows[1].keep is True
    assert rows[2].keep is False and rows[2].top_word_x1e3 == 1000
    assert rows[3].keep is False and rows[3].n_words == 2


def test_top_terms_ordering_and_ties(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text="zebra zebra apple common common common"),
        Row(doc_id=2, text="common banana"),
    ])
    # doc 1: tf common=3 > zebra=2 > apple=1; doc 2 ties tf=1 -> rarer df
    # first (banana df=1 < common df=2)
    out = corpus.top_terms(df, k=2).collect()
    d1 = sorted([r for r in out if r.doc_id == 1], key=lambda r: r.rank)
    d2 = sorted([r for r in out if r.doc_id == 2], key=lambda r: r.rank)
    assert [r.term for r in d1] == ["common", "zebra"]
    assert [r.term for r in d2] == ["banana", "common"]
    assert d2[0].df == 1 and d2[1].df == 2


# ---------------------------------------------------------------------------
# lake integration: prune_pages (quality-gate curation)
# ---------------------------------------------------------------------------

_SPAN8 = "alpha beta gamma delta epsilon zeta eta theta"


def test_cut_spans_rewrites_not_drops(spark, tmpdir_):
    """Lee et al.'s removal step as a curation stage: the shared 8-token
    prefix is cut from BOTH holders, the unique remainders survive, the
    unrelated page is byte-untouched."""
    from tapdata_connectors_spark.streaming import cut_spans, find_cut_rewrites

    rdds_before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet())
    pages = [
        ("c/a", _H.format(_SPAN8 + " unique tail one")),
        ("c/b", _H.format(_SPAN8 + " other ending two")),
        ("c/c", _H.format("completely different page content here")),
    ]
    pipe = _bootstrap_pipe(spark, tmpdir_, pages)
    orig_c = {r["url"]: r["text"]
              for r in pipe.table.read().select("url", "text").collect()}["c/c"]

    rw = {r["url"]: r["_cleaned"]
          for r in find_cut_rewrites(pipe, n=3, min_span=8).collect()}
    assert rw == {"c/a": "unique tail one", "c/b": "other ending two"}

    rep = cut_spans(pipe, n=3, min_span=8, tag="t1")
    assert rep["n_rewrites"] == 2
    texts = {r["url"]: r["text"]
             for r in pipe.table.read().select("url", "text").collect()}
    assert texts["c/a"] == "unique tail one"
    assert texts["c/b"] == "other ending two"
    assert texts["c/c"] == orig_c            # no cut -> original bytes
    assert set(texts) == {"c/a", "c/b", "c/c"}  # nothing dropped

    # idempotent per tag; naturally convergent under a fresh tag
    assert cut_spans(pipe, n=3, min_span=8, tag="t1").get("skipped") is True
    rep2 = cut_spans(pipe, n=3, min_span=8, tag="t2")
    assert rep2["n_rewrites"] == 0

    # lineage: rewrites are counted as updates under the curation epoch
    from tapdata_connectors_spark.streaming.curation import CURATION_EPOCH
    lin = pipe.lineage().filter(F.col("epoch") == CURATION_EPOCH)
    assert lin.agg(F.sum("n_update")).collect()[0][0] == 2
    # a curation pass releases every frame it persisted (hermetic under a
    # shared session: compare against the pre-test cached set)
    rdds_after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet())
    assert rdds_after <= rdds_before, (
        f"cut_spans leaked cached RDDs: {rdds_after - rdds_before}")


def test_cut_spans_recomputes_enrichments(spark, tmpdir_):
    """The stored-enrichment == recomputed invariant (which incremental
    dedup relies on) must survive a text rewrite."""
    from tapdata_connectors_spark.streaming import cut_spans

    pages = [
        ("e/a", _H.format(_SPAN8 + " unique tail one")),
        ("e/b", _H.format(_SPAN8 + " other ending two")),
    ]
    pipe = _bootstrap_pipe(spark, tmpdir_, pages,
                           enrich=["fingerprint", "simhash"])
    cut_spans(pipe, n=3, min_span=8, tag="t1")
    chk = pipe.table.read().select(
        "url",
        (F.col("fingerprint") == corpus.fingerprint(F.col("text")))
        .alias("fp_ok"),
        (F.col("simhash") == corpus.simhash_col(F.col("text")))
        .alias("sh_ok"),
    ).collect()
    assert chk and all(r["fp_ok"] and r["sh_ok"] for r in chk)


def test_cut_spans_preserves_lww(spark, tmpdir_):
    """The rewrite keeps the stored (ts, seq): an old redelivery stays
    stale against the cut text; a genuinely newer event overwrites it."""
    import datetime

    from tapdata_connectors_spark.schema import EVENTS_SCHEMA
    from tapdata_connectors_spark.streaming import cut_spans

    pages = [
        ("l/a", _H.format(_SPAN8 + " unique tail one")),
        ("l/b", _H.format(_SPAN8 + " other ending two")),
    ]
    pipe = _bootstrap_pipe(spark, tmpdir_, pages)
    cut_spans(pipe, n=3, min_span=8, tag="t1")

    def ins(seq, epoch, ts, body):
        return Row(event_seq=seq, epoch=epoch, op="I", url="l/a", warc_ts=ts,
                   before=None,
                   after=Row(url="l/a", warc_ts=ts,
                             html=_H.format(body).encode(), lang="en"),
                   removed_fields=None, extras=None, ddl=None,
                   exactly_once_id=f"x{seq}", ts_ms=None)

    ev = spark.createDataFrame([
        ins(50, 0, datetime.datetime(2020, 1, 1), "stale redelivery"),
        ins(100, 1, datetime.datetime(2027, 1, 1), "fresh recrawl"),
    ], schema=EVENTS_SCHEMA)
    stage_events(ev, f"{tmpdir_}/staging")
    pipe.replay_batch()
    rows = {r["url"]: r["text"]
            for r in pipe.table.read().select("url", "text").collect()}
    assert rows["l/a"] == "fresh recrawl"          # newer event wins
    assert rows["l/b"] == "other ending two"       # cut text stands


def test_prune_pages_quality_gate(spark, tmpdir_):
    from tapdata_connectors_spark.streaming import find_low_quality_pages, prune_pages

    pages = [
        ("q/good", _H.format("a perfectly sensible document with many distinct words")),
        ("q/spam", _H.format("spam spam spam spam spam spam spam spam")),  # top-word 1000
        ("q/tiny", _H.format("too short")),                                # n_words < 5
    ]
    pipe = _bootstrap_pipe(spark, tmpdir_, pages)
    bad = {r["url"] for r in find_low_quality_pages(pipe).collect()}
    assert bad == {"q/spam", "q/tiny"}

    rep = prune_pages(pipe, tag="t1")
    assert rep["n_losers"] == 2
    left = {r["url"] for r in pipe.table.read().select("url").collect()}
    assert left == {"q/good"}
    # raw state keeps the tombstones at their own (ts, seq)
    raw = {r["url"] for r in pipe.table.read_raw().select("url").collect()}
    assert raw == {"q/good", "q/spam", "q/tiny"}
    # idempotent per tag; lineage under the curation epoch
    assert prune_pages(pipe, tag="t1").get("skipped") is True
    from tapdata_connectors_spark.streaming.curation import CURATION_EPOCH
    lin = pipe.lineage().filter(F.col("epoch") == CURATION_EPOCH)
    assert lin.agg(F.sum("n_delete")).collect()[0][0] == 2


def test_prune_pages_policy_override_and_resurrection(spark, tmpdir_):
    import datetime

    from tapdata_connectors_spark.schema import EVENTS_SCHEMA
    from tapdata_connectors_spark.streaming import prune_pages

    pages = [
        ("q/a", _H.format("five words is just enough here")),
        ("q/b", _H.format("one two three four five six seven eight nine ten")),
    ]
    pipe = _bootstrap_pipe(spark, tmpdir_, pages)
    # tighten the floor so q/a (6 words) fails but q/b (10 words) passes
    rep = prune_pages(pipe, policy={"min_words": 8}, tag="strict")
    assert rep["n_losers"] == 1
    assert {r["url"] for r in pipe.table.read().select("url").collect()} == {"q/b"}

    # a genuinely newer insert resurrects the pruned url (LWW preserved)
    ts = datetime.datetime(2027, 1, 1)
    ev = spark.createDataFrame([Row(
        event_seq=100, epoch=1, op="I", url="q/a", warc_ts=ts,
        before=None,
        after=Row(url="q/a", warc_ts=ts,
                  html=_H.format("a much longer and perfectly acceptable recrawl body").encode(),
                  lang="en"),
        removed_fields=None, extras=None, ddl=None,
        exactly_once_id="x100", ts_ms=None,
    )], schema=EVENTS_SCHEMA)
    stage_events(ev, f"{tmpdir_}/staging")
    pipe.replay_batch()
    rows = {r["url"] for r in pipe.table.read().select("url").collect()}
    assert rows == {"q/a", "q/b"}


def test_prune_pages_leaves_no_cached_rdds(spark, tmpdir_):
    from tapdata_connectors_spark.streaming import prune_pages

    from tapdata_connectors_spark.operators.corpus import _persistent_rdd_ids

    pages = [("q/spam", _H.format("spam spam spam spam spam spam")),
             ("q/ok", _H.format("a document with several distinct words inside"))]
    pipe = _bootstrap_pipe(spark, tmpdir_, pages)
    # session-scoped SparkSession: earlier tests' cache residue (pending
    # ContextCleaner GC) is not this operator's to answer for — assert
    # prune_pages itself pins nothing NEW
    before = _persistent_rdd_ids(spark.sparkContext)
    prune_pages(pipe, tag="t1")
    assert _persistent_rdd_ids(spark.sparkContext) <= before


def test_quality_keep_col_parity_with_gopher_quality(spark):
    df = _docs_df(spark).union(spark.createDataFrame(
        [Row(doc_id=100, text="spam spam spam spam spam spam"),
         Row(doc_id=101, text="tiny")]))
    via_col = {r.doc_id: r.k for r in
               df.select("doc_id", corpus.quality_keep_col(F.col("text")).alias("k")).collect()}
    via_op = {r.doc_id: r.keep for r in corpus.gopher_quality(df).collect()}
    assert via_col == via_op


def test_enrichment_quality_keep_end_to_end(spark, tmpdir_):
    pages = [
        ("e/good", _H.format("a perfectly sensible document with many distinct words")),
        ("e/spam", _H.format("spam spam spam spam spam spam spam spam")),
    ]
    pipe = _bootstrap_pipe(spark, tmpdir_, pages, enrich=["quality_keep"])
    rows = {r["url"]: r["quality_keep"]
            for r in pipe.table.read().select("url", "quality_keep").collect()}
    assert rows == {"e/good": True, "e/spam": False}
    # stored type is boolean, and the enrichment column is not foldable
    assert dict(pipe.table.read().dtypes)["quality_keep"] == "boolean"
    assert "quality_keep" not in [s.name for s in pipe.payload_specs()]


# ---------------------------------------------------------------------------
# lake integration: incremental (manifest-diff) dedup
# ---------------------------------------------------------------------------

def _ins_events(spark, rows):
    """rows: [(seq, epoch, url, body)] -> staged-log insert events."""
    import datetime

    from tapdata_connectors_spark.schema import EVENTS_SCHEMA

    def ins(seq, epoch, url, body):
        ts = datetime.datetime(2026, 6, 1, 0, 0, seq % 60)
        return Row(event_seq=seq, epoch=epoch, op="I", url=url, warc_ts=ts,
                   before=None,
                   after=Row(url=url, warc_ts=ts,
                             html=_H.format(body).encode(), lang="en"),
                   removed_fields=None, extras=None, ddl=None,
                   exactly_once_id=f"x{seq}", ts_ms=None)

    return spark.createDataFrame([ins(*r) for r in rows], schema=EVENTS_SCHEMA)


@pytest.mark.parametrize("enrich,mode", [
    ([], "cow"), (["fingerprint"], "cow"), ([], "mor"),
])
def test_dedup_pages_incremental(spark, tmpdir_, enrich, mode):
    from tapdata_connectors_spark.streaming import dedup_pages, find_new_dup_pages

    # bootstrap: i/p and i/q are PRE-EXISTING exact dups — an incremental
    # pass must never touch untouched pages, even duplicated ones
    pages = [
        ("i/a", _H.format("incumbent alpha content")),
        ("i/p", _H.format("legacy duplicated body")),
        ("i/q", _H.format("legacy duplicated body")),
    ]
    pipe = _bootstrap_pipe(spark, tmpdir_, pages, enrich=enrich or None,
                           merge_mode=mode)
    v1 = pipe.table.current_version()

    # epoch: i/c duplicates incumbent i/a; i/d + i/e are a NEW dup pair
    ev = _ins_events(spark, [
        (10, 0, "i/c", "incumbent alpha content"),
        (11, 0, "i/d", "brand new body"),
        (12, 0, "i/e", "brand new body"),
    ])
    stage_events(ev, f"{tmpdir_}/staging")
    pipe.replay_batch()

    losers = {(r[0], r["survivor_id"])
              for r in find_new_dup_pages(pipe, v1).collect()}
    assert losers == {("i/c", "i/a"), ("i/e", "i/d")}

    rep = dedup_pages(pipe, "exact", since_version=v1, tag="inc1")
    assert rep["n_losers"] == 2
    left = {r["url"] for r in pipe.table.read().select("url").collect()}
    # incumbents all alive (including the legacy dup pair); new survivors kept
    assert left == {"i/a", "i/p", "i/q", "i/c", "i/d", "i/e"} - {"i/c", "i/e"}
    # idempotent per (since_version, tag)
    assert dedup_pages(pipe, "exact", since_version=v1,
                       tag="inc1").get("skipped") is True


def test_dedup_pages_incremental_empty_delta_and_guards(spark, tmpdir_):
    from tapdata_connectors_spark.streaming import dedup_pages, find_new_dup_pages

    pipe = _bootstrap_pipe(spark, tmpdir_, [("i/a", _H.format("solo body here"))])
    head = pipe.table.current_version()
    assert find_new_dup_pages(pipe, head).count() == 0
    rep = dedup_pages(pipe, "exact", since_version=head, tag="noop")
    assert rep["n_losers"] == 0
    # empty delta short-circuits for every incremental method, even when
    # the backing enrichment was never ingested
    rep = dedup_pages(pipe, "minhash", since_version=head, tag="noop-mh")
    assert rep["n_losers"] == 0
    with pytest.raises(ValueError, match="unknown dedup method"):
        dedup_pages(pipe, "nope", since_version=head)


# ---------------------------------------------------------------------------
# round 4: PII redaction + deterministic sampling
# ---------------------------------------------------------------------------

def test_redact_pii_classes_and_order(spark):
    df = spark.createDataFrame([Row(doc_id=1, text=(
        "mail bob.smith+x@corp.example.org or call +1 (555) 010-9999 "
        "from 192.168.0.1 ok"))])
    out = df.select(corpus.redact_pii(F.col("text")).alias("t")).collect()[0]["t"]
    assert "[EMAIL]" in out and "[PHONE]" in out and "[IPV4]" in out
    assert "bob" not in out and "555" not in out and "192.168" not in out
    st = corpus.pii_stats(df).collect()[0]
    assert (st["n_email"], st["n_phone"], st["n_ipv4"]) == (1, 1, 1)


def test_redact_pii_email_digits_not_phone(spark):
    # digits inside an email local part must not half-match as a phone
    df = spark.createDataFrame([Row(doc_id=1, text="user4212345678@example.com")])
    st = corpus.pii_stats(df).collect()[0]
    assert st["n_email"] == 1 and st["n_phone"] == 0
    out = df.select(corpus.redact_pii(F.col("text")).alias("t")).collect()[0]["t"]
    assert out == "[EMAIL]"


def test_hash_sample_deterministic_and_quota(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, lang="en" if i % 2 else "de") for i in range(2000)])
    a = {r.doc_id for r in corpus.hash_sample(df, 300).collect()}
    b = {r.doc_id for r in corpus.hash_sample(df, 300).collect()}
    assert a == b and 0 < len(a) < 2000
    # rate ~30%: binomial(2000, .3) stays well inside +-5 sigma
    assert 480 <= len(a) <= 720
    # nested rates: rate-0 group drops entirely; rate-1000 keeps all
    strat = corpus.hash_sample(df, {"en": 1000, "de": 0}).collect()
    assert {r.lang for r in strat} == {"en"} and len(strat) == 1000
    # python oracle for the exact predicate
    import hashlib
    exp = {i for i in a
           if int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 1000 < 300}
    assert exp == a


def test_simhash_col_parity_with_op(spark):
    df = _docs_df(spark).union(spark.createDataFrame(
        [Row(doc_id=50, text="one more doc for parity checking purposes")]))
    via_op = {r.doc_id: r.simhash for r in corpus.simhash(df).collect()}
    via_col = {r.doc_id: r.sh for r in
               df.select("doc_id", corpus.simhash_col(F.col("text")).alias("sh")).collect()}
    assert all(via_col[i] == via_op[i] for i in via_op)
    # empty doc: op drops the row, col yields null
    e = spark.createDataFrame([Row(doc_id=9, text="  ")])
    assert corpus.simhash(e).count() == 0
    assert e.select(corpus.simhash_col(F.col("text")).alias("sh")).collect()[0]["sh"] is None


def test_dedup_pages_incremental_simhash(spark, tmpdir_):
    from tapdata_connectors_spark.streaming import dedup_pages

    base = "the quick brown fox jumps over the lazy dog again and again today"
    pages = [
        ("s/a", _H.format(base)),
        ("s/p", _H.format("an entirely different legacy body of words")),
    ]
    pipe = _bootstrap_pipe(spark, tmpdir_, pages, enrich=["simhash"],
                           merge_mode="mor")
    v1 = pipe.table.current_version()

    # near-dup of incumbent s/a (one word changed) + one genuinely new page
    ev = _ins_events(spark, [
        (10, 0, "s/b", base.replace("lazy", "sleepy")),
        (11, 0, "s/u", "utterly unrelated fresh content with new words"),
    ])
    stage_events(ev, f"{tmpdir_}/staging")
    pipe.replay_batch()

    # fixture sanity: the stored fingerprints really are within Hamming 3
    sh = {r["url"]: r["simhash"]
          for r in pipe.table.read().select("url", "simhash").collect()}
    assert bin(sh["s/a"] ^ sh["s/b"]).count("1") <= 3
    assert bin(sh["s/a"] ^ sh["s/u"]).count("1") > 3

    rep = dedup_pages(pipe, "simhash", since_version=v1, tag="inc1")
    assert rep["n_losers"] == 1
    left = {r["url"] for r in pipe.table.read().select("url").collect()}
    assert left == {"s/a", "s/p", "s/u"}          # s/b lost to the incumbent
    assert dedup_pages(pipe, "simhash", since_version=v1,
                       tag="inc1").get("skipped") is True


def test_dedup_pages_incremental_simhash_requires_enrichment(spark, tmpdir_):
    from tapdata_connectors_spark.streaming import dedup_pages

    pipe = _bootstrap_pipe(spark, tmpdir_, [("s/a", _H.format("hello world wide"))])
    v = pipe.table.current_version()
    ev = _ins_events(spark, [(10, 0, "s/b", "hello world wider")])
    stage_events(ev, f"{tmpdir_}/staging")
    pipe.replay_batch()
    with pytest.raises(ValueError, match="simhash"):
        dedup_pages(pipe, "simhash", since_version=v)
    with pytest.raises(ValueError, match="minhash_sig"):
        dedup_pages(pipe, "minhash", since_version=v)
    with pytest.raises(ValueError, match="embed_bucket"):
        dedup_pages(pipe, "embedding", since_version=v)


# 40 distinct tokens; the near variant changes the LAST token, so only
# the final 3-shingle differs: Jaccard = 37/39 ≈ 0.95 ≥ 0.8, and the
# BoW-projection cosine stays ~0.95 ≥ 0.3
_BASE40 = " ".join(f"w{i}" for i in range(40))
_NEAR40 = _BASE40.replace("w39", "w39x")
_OTHER40 = " ".join(f"z{i}" for i in range(40))
_THIRD40 = " ".join(f"q{i}" for i in range(40))


def test_dedup_pages_incremental_minhash(spark, tmpdir_):
    from tapdata_connectors_spark.streaming import dedup_pages

    pages = [("m/a", _H.format(_BASE40)), ("m/p", _H.format(_OTHER40))]
    pipe = _bootstrap_pipe(spark, tmpdir_, pages, enrich=["minhash_sig"],
                           merge_mode="mor")
    v1 = pipe.table.current_version()
    ev = _ins_events(spark, [(10, 0, "m/b", _NEAR40),
                             (11, 0, "m/u", _THIRD40)])
    stage_events(ev, f"{tmpdir_}/staging")
    pipe.replay_batch()

    # fixture sanity: the STORED signatures really collide in ≥1 band for
    # the near pair and in none for the unrelated page
    sigs = pipe.table.read().select("url", "minhash_sig")
    bands = {r["url"]: set() for r in sigs.collect()}
    for r in corpus.minhash_band_rows(sigs, id_col="url").collect():
        bands[r["url"]].add((r["band"], r["sig"]))
    assert bands["m/a"] & bands["m/b"]
    assert not bands["m/a"] & bands["m/u"]

    rep = dedup_pages(pipe, "minhash", since_version=v1, tag="inc1")
    assert rep["n_losers"] == 1
    left = {r["url"] for r in pipe.table.read().select("url").collect()}
    assert left == {"m/a", "m/p", "m/u"}          # m/b lost to the incumbent
    assert dedup_pages(pipe, "minhash", since_version=v1,
                       tag="inc1").get("skipped") is True


def test_dedup_pages_incremental_embedding(spark, tmpdir_):
    from tapdata_connectors_spark.streaming import dedup_pages

    pages = [("e/a", _H.format(_BASE40)), ("e/p", _H.format(_OTHER40))]
    pipe = _bootstrap_pipe(spark, tmpdir_, pages, enrich=["embed_bucket"],
                           merge_mode="mor")
    v1 = pipe.table.current_version()
    ev = _ins_events(spark, [(10, 0, "e/b", _NEAR40),
                             (11, 0, "e/u", _THIRD40)])
    stage_events(ev, f"{tmpdir_}/staging")
    pipe.replay_batch()

    # fixture sanity: stored buckets collide for the near pair; the exact
    # cosine (python oracle over the table's own text) crosses the
    # threshold for (a, b) only
    import math

    from tapdata_connectors_spark.operators import ann
    rows = pipe.table.read().select("url", "embed_bucket", "text").collect()
    bk = {r["url"]: r["embed_bucket"] for r in rows}
    assert bk["e/a"] == bk["e/b"]
    emb = {
        r["url"]: [
            round(v * 1_000_000)
            for v in spark.createDataFrame([(r["text"],)], "t string")
            .select(corpus.text_embed_col(F.col("t")).alias("e"))
            .collect()[0]["e"]
        ]
        for r in rows
    }

    def cos(u, w):
        d = sum(a * b for a, b in zip(emb[u], emb[w]))
        return math.floor(
            d / (math.sqrt(sum(a * a for a in emb[u]))
                 * math.sqrt(sum(a * a for a in emb[w]))) * 1_000_000)

    assert cos("e/a", "e/b") >= 300_000
    assert cos("e/a", "e/u") < 300_000 and cos("e/a", "e/p") < 300_000

    rep = dedup_pages(pipe, "embedding", since_version=v1, tag="inc1")
    assert rep["n_losers"] == 1
    left = {r["url"] for r in pipe.table.read().select("url").collect()}
    assert left == {"e/a", "e/p", "e/u"}          # e/b lost to the incumbent
    assert dedup_pages(pipe, "embedding", since_version=v1,
                       tag="inc1").get("skipped") is True


def _cdc_events(spark, rows):
    """rows: [(seq, epoch, op, url, body|None)] -> staged-log events."""
    import datetime

    from tapdata_connectors_spark.schema import EVENTS_SCHEMA

    out = []
    for seq, epoch, op, url, body in rows:
        ts = datetime.datetime(2026, 6, 2, 0, 0, seq % 60)
        after = ((url, ts, _H.format(body).encode(), "en")
                 if op != "D" else None)
        out.append((seq, epoch, op, url, ts, None, after,
                    None, None, None, f"x{seq}", None))
    return spark.createDataFrame(out, EVENTS_SCHEMA)


@pytest.mark.parametrize("method,enrich", [
    ("minhash", "minhash_sig"), ("embedding", "embed_bucket"),
])
def test_dedup_pages_incremental_equals_full(spark, tmpdir_, method, enrich):
    """VERDICT r4 item 4 done-criterion: per-epoch incremental passes
    (inserts, an update that becomes a dup, a delete) land the same final
    live set as one full-recompute pass over the identical event history
    (fixture keys ordered so incumbent-first == min-key survivorship)."""
    from tapdata_connectors_spark.streaming import dedup_pages

    pages = [("m/a", _H.format(_BASE40)), ("m/p", _H.format(_OTHER40))]
    ep1 = [(10, 0, "I", "m/b", _NEAR40),          # near-dup of incumbent
           (11, 0, "I", "m/u", _THIRD40)]         # unrelated new page
    ep2 = [(20, 1, "U", "m/u", _BASE40.replace("w0", "w0y")),  # becomes a dup
           (21, 1, "D", "m/p", None),             # delete an incumbent
           (22, 1, "I", "m/d", " ".join(f"r{i}" for i in range(40)))]

    # pipeline A: incremental dedup after every epoch
    pipe = _bootstrap_pipe(spark, tmpdir_, pages, enrich=[enrich],
                           merge_mode="mor")
    v1 = pipe.table.current_version()
    stage_events(_cdc_events(spark, ep1), f"{tmpdir_}/staging")
    pipe.replay_batch()
    dedup_pages(pipe, method, since_version=v1, tag="e1")
    v2 = pipe.table.current_version()
    stage_events(_cdc_events(spark, ep2), f"{tmpdir_}/staging", mode="append")
    pipe.replay_batch()
    dedup_pages(pipe, method, since_version=v2, tag="e2")
    inc_left = {r["url"] for r in pipe.table.read().select("url").collect()}

    # pipeline B: same history replayed, ONE full-recompute pass at the end
    import os

    full_dir = os.path.join(tmpdir_, "full")
    os.makedirs(full_dir, exist_ok=True)
    pipe2 = _bootstrap_pipe(spark, full_dir, pages,
                            enrich=[enrich], merge_mode="mor")
    stage_events(_cdc_events(spark, ep1 + ep2), f"{tmpdir_}/full/staging")
    pipe2.replay_batch()
    dedup_pages(pipe2, method, tag="full")
    full_left = {r["url"] for r in pipe2.table.read().select("url").collect()}

    assert inc_left == full_left == {"m/a", "m/d"}


def test_incremental_probe_is_column_pruned(spark, tmpdir_):
    """O(delta + probe) read-footprint pin: the incremental minhash
    candidate stage scans ONLY (url, minhash_sig) — parquet column
    pruning must reach the probe, never dragging html/text through the
    band join (text is read solely behind the candidate-keys semi-join)."""
    from tapdata_connectors_spark.streaming.curation import _find_new_losers

    pages = [("m/a", _H.format(_BASE40)), ("m/p", _H.format(_OTHER40))]
    pipe = _bootstrap_pipe(spark, tmpdir_, pages, enrich=["minhash_sig"],
                           merge_mode="mor")
    v1 = pipe.table.current_version()
    ev = _ins_events(spark, [(10, 0, "m/b", _NEAR40)])
    stage_events(ev, f"{tmpdir_}/staging")
    pipe.replay_batch()

    losers = _find_new_losers(pipe, v1, "minhash", cache_registry=None)
    plan = losers._jdf.queryExecution().executedPlan().toString()
    pruned = [ln for ln in plan.splitlines()
              if "ReadSchema" in ln and "minhash_sig" in ln
              and "html" not in ln and "text" not in ln]
    assert pruned, f"no column-pruned signature scan in plan:\n{plan[:4000]}"


def test_prune_pages_incremental(spark, tmpdir_):
    from tapdata_connectors_spark.streaming import prune_pages

    pages = [
        ("p/good", _H.format("a perfectly sensible document with many distinct words")),
        # pre-existing junk: an incremental pass must NOT touch it
        ("p/oldspam", _H.format("junk junk junk junk junk junk junk junk")),
    ]
    pipe = _bootstrap_pipe(spark, tmpdir_, pages)
    v1 = pipe.table.current_version()
    ev = _ins_events(spark, [
        (10, 0, "p/newspam", "spam spam spam spam spam spam spam spam"),
        (11, 0, "p/newgood", "another perfectly sensible body with distinct words"),
    ])
    stage_events(ev, f"{tmpdir_}/staging")
    pipe.replay_batch()

    from tapdata_connectors_spark.operators.corpus import _persistent_rdd_ids
    before = _persistent_rdd_ids(spark.sparkContext)
    rep = prune_pages(pipe, since_version=v1, tag="inc")
    assert rep["n_losers"] == 1
    left = {r["url"] for r in pipe.table.read().select("url").collect()}
    assert left == {"p/good", "p/oldspam", "p/newgood"}
    assert prune_pages(pipe, since_version=v1, tag="inc").get("skipped") is True
    # empty delta no-op
    head = pipe.table.current_version()
    assert prune_pages(pipe, since_version=head, tag="n2")["n_losers"] == 0
    # see test_prune_pages_leaves_no_cached_rdds: assert nothing NEW pinned
    assert _persistent_rdd_ids(spark.sparkContext) <= before

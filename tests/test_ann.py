"""ANN operators (operators/ann.py) vs exact Python oracles: IVF k-means
training (iterative — not SQL-expressible, so oracle-gated here rather
than in the DuckDB registry) and LSH-bucketed top-k."""

from __future__ import annotations

import hashlib
import random

import pytest
from pyspark.sql import Row

from tapdata_connectors_spark.operators import ann

DIM = 6


def _vecs(n, seed=7):
    rng = random.Random(seed)
    # three obvious clusters + noise, floats with exact 1e-6 grid values
    out = []
    for i in range(n):
        center = [(-5, 5, 0), (8, -2, 3), (0, 9, -7)][i % 3]
        base = [center[j % 3] + rng.randint(-1000, 1000) / 1000 for j in range(DIM)]
        out.append((i, [round(x, 6) for x in base]))
    return out


def _df(spark, vecs):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in vecs]
    )


def _scale(v):
    return [int(round(x * 1000000)) for x in v]


def _py_assign(sv, cents):
    best = min(
        (sum((a - b) ** 2 for a, b in zip(sv, cv)), cid)
        for cid, cv in enumerate(cents)
    )
    return best  # (d2, cid)


def _py_train(vecs, k, iters):
    sv = {i: _scale(v) for i, v in vecs}
    cents = [sv[i] for i in sorted(sv)[:k]]
    for _ in range(iters):
        groups: dict[int, list[list[int]]] = {}
        for i in sorted(sv):
            _d2, cid = _py_assign(sv[i], cents)
            groups.setdefault(cid, []).append(sv[i])
        new = []
        for c in range(k):
            if c not in groups:
                new.append(cents[c])
                continue
            n = len(groups[c])
            new.append([(2 * sum(col) + n) // (2 * n)
                        for col in zip(*groups[c])])
        cents = new
    return cents


def test_ivf_train_matches_python_lloyd(spark):
    vecs = _vecs(60)
    got = ann.ivf_train(_df(spark, vecs), k=3, iters=4)
    want = _py_train(vecs, k=3, iters=4)
    assert got == want


def test_ivf_train_improves_quantization(spark):
    vecs = _vecs(90)
    df = _df(spark, vecs)
    seeds = [_scale(v) for _i, v in vecs[:3]]
    trained = ann.ivf_train(df, k=3, iters=5)

    def sse(cents):
        return sum(_py_assign(_scale(v), cents)[0] for _i, v in vecs)

    assert sse(trained) < sse(seeds)


def test_ivf_assign_matches_python(spark):
    vecs = _vecs(40)
    cents = ann.ivf_train(_df(spark, vecs), k=3, iters=2)
    got = {r["vec_id"]: (r["dist2"], r["centroid_id"])
           for r in ann.ivf_assign(_df(spark, vecs), cents).collect()}
    for i, v in vecs:
        d2, cid = _py_assign(_scale(v), cents)
        assert got[i] == (d2, cid)


def test_ivf_train_requires_k_vectors(spark):
    with pytest.raises(ValueError):
        ann.ivf_train(_df(spark, _vecs(2)), k=3)


def test_ann_lsh_topk_vs_python(spark):
    vecs = _vecs(50)
    got = [
        (r["query_id"], r["rank"], r["neighbor_id"], r["dot"])
        for r in ann.ann_lsh_topk(_df(spark, vecs), n_queries=2, k=3,
                                  n_planes=2).collect()
    ]

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    def bucket(sv, n_planes):
        b = 0
        for p in range(n_planes):
            w = [(h32(f"pl{p}_{i + 1}") % 2001) - 1000 for i in range(DIM)]
            if sum(a * ww for a, ww in zip(sv, w)) > 0:
                b |= 1 << p
        return b

    sv = {i: _scale(v) for i, v in vecs}
    bk = {i: bucket(sv[i], 2) for i in sv}
    want = []
    for q in (0, 1):
        cand = [(sum(a * b for a, b in zip(sv[q], sv[i])), i)
                for i in sv if i != q and bk[i] == bk[q]]
        cand.sort(key=lambda t: (-t[0], t[1]))
        for rank, (dot, i) in enumerate(cand[:3], 1):
            want.append((q, rank, i, dot))
    assert sorted(got) == sorted(want)


def test_cosine_near_dup_vs_python(spark):
    import math

    vecs = _vecs(50)
    got = {
        (r["vec_a"], r["vec_b"]): r["cos_x1e6"]
        for r in ann.cosine_near_dup(_df(spark, vecs), threshold_x1e6=500_000,
                                     n_planes=2).collect()
    }

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    def bucket(sv, n_planes):
        b = 0
        for p in range(n_planes):
            w = [(h32(f"pl{p}_{i + 1}") % 2001) - 1000 for i in range(DIM)]
            if sum(a * ww for a, ww in zip(sv, w)) > 0:
                b |= 1 << p
        return b

    sv = {i: _scale(v) for i, v in vecs}
    bk = {i: bucket(sv[i], 2) for i in sv}
    want = {}
    for a in sv:
        for b in sv:
            if a < b and bk[a] == bk[b]:
                dot = sum(x * y for x, y in zip(sv[a], sv[b]))
                na = sum(x * x for x in sv[a])
                nb = sum(x * x for x in sv[b])
                c = math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1000000.0)
                if c >= 500_000:
                    want[(a, b)] = c
    assert want  # clustered fixture must yield near-dup pairs
    assert got == want


def _py_cos_pairs(vecs, threshold_x1e6):
    """Exact brute-force near-dup ground truth (python oracle)."""
    import math

    sv = {i: _scale(v) for i, v in vecs}
    out = set()
    ids = sorted(sv)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            dot = sum(x * y for x, y in zip(sv[a], sv[b]))
            na = sum(x * x for x in sv[a])
            nb = sum(x * x for x in sv[b])
            cos = dot / (math.sqrt(na) * math.sqrt(nb))
            if math.floor(cos * 1000000) >= threshold_x1e6:
                out.add((a, b))
    return out


def test_multiprobe_recall_strictly_higher(spark):
    """OR-construction must (a) produce a SUPERSET of single-probe's
    pairs at the same threshold (band 0 uses single-probe's planes), (b)
    strictly improve recall vs the exact ground truth on a fixture where
    single-probe's one hyperplane cut splits true near-dup pairs, and
    (c) never emit a false positive (every pair is exact-verified)."""
    vecs = _vecs(120, seed=3)
    df = _df(spark, vecs)
    thr = 300_000
    truth = _py_cos_pairs(vecs, thr)
    single = {(r["vec_a"], r["vec_b"])
              for r in ann.cosine_near_dup(df, thr, n_planes=4).collect()}
    multi = {(r["vec_a"], r["vec_b"])
             for r in ann.cosine_near_dup_multiprobe(
                 df, thr, n_planes=4, n_bands=3).collect()}
    assert single <= multi, "multi-probe must be a candidate superset"
    assert single <= truth and multi <= truth, "no false positives"
    assert len(multi) > len(single), (
        f"multi-probe must strictly improve recall "
        f"(single={len(single)}, multi={len(multi)}, truth={len(truth)})"
    )
    recall_s = len(single) / len(truth)
    recall_m = len(multi) / len(truth)
    assert recall_m > recall_s


def test_multiprobe_pairs_unique(spark):
    """Pairs colliding in several bands must emit exactly once."""
    vecs = _vecs(60, seed=5)
    rows = ann.cosine_near_dup_multiprobe(
        _df(spark, vecs), 300_000, n_planes=4, n_bands=3).collect()
    pairs = [(r["vec_a"], r["vec_b"]) for r in rows]
    assert len(pairs) == len(set(pairs))


def _py_ivf_topk(vecs, cents, n_queries, k, nprobe):
    sv = {i: _scale(v) for i, v in vecs}

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    asg = {i: min(range(len(cents)), key=lambda c: (d2(v, cents[c]), c))
           for i, v in sv.items()}
    out = {}
    for q in range(n_queries):
        probes = sorted(range(len(cents)),
                        key=lambda c: (d2(sv[q], cents[c]), c))[:nprobe]
        cand = [i for i, c in asg.items() if c in probes and i != q]
        scored = sorted(
            ((sum(x * y for x, y in zip(sv[q], sv[i])), i) for i in cand),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        out[q] = [(rank + 1, i, dot) for rank, (dot, i) in enumerate(scored)]
    return out


def test_ivf_topk_matches_python_oracle(spark):
    vecs = _vecs(90, seed=9)
    cents = [_scale(v) for i, v in vecs[:4]]
    got = {}
    rows = ann.ann_ivf_topk(_df(spark, vecs), cents, n_queries=3, k=5,
                            nprobe=2).collect()
    for r in rows:
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["dot"]))
    for q in got:
        got[q].sort()
    assert got == _py_ivf_topk(vecs, cents, 3, 5, 2)


def test_ivf_topk_full_probe_equals_brute_force(spark):
    """nprobe == n_centroids searches every inverted list — results must
    equal exact brute-force top-k (the FAISS recall-knob contract)."""
    vecs = _vecs(60, seed=13)
    cents = [_scale(v) for i, v in vecs[:4]]
    full = ann.ann_ivf_topk(_df(spark, vecs), cents, n_queries=2, k=4,
                            nprobe=4).collect()
    sv = {i: _scale(v) for i, v in vecs}
    for q in range(2):
        brute = sorted(
            ((sum(x * y for x, y in zip(sv[q], sv[i])), i)
             for i in sv if i != q),
            key=lambda t: (-t[0], t[1]),
        )[:4]
        got = sorted([(r["rank"], r["neighbor_id"], r["dot"])
                      for r in full if r["query_id"] == q])
        assert got == [(rk + 1, i, d) for rk, (d, i) in enumerate(brute)]


# ---------------------------------------------------------------------------
# Product quantization (ann.pq_train / pq_encode / ann_ivfpq_topk)
# ---------------------------------------------------------------------------


def _py_pq_train(vecs, m, ksub, iters):
    dsub = DIM // m
    return [
        _py_train([(i, v[s * dsub:(s + 1) * dsub]) for i, v in vecs],
                  ksub, iters)
        for s in range(m)
    ]


def _py_pq_codes(v, books):
    m = len(books)
    dsub = DIM // m
    sv = _scale(v)
    return [_py_assign(sv[s * dsub:(s + 1) * dsub], books[s])[1]
            for s in range(m)]


def test_pq_train_and_encode_match_python(spark):
    vecs = _vecs(40, seed=21)
    books = ann.pq_train(_df(spark, vecs), m=2, ksub=4, iters=3)
    assert books == _py_pq_train(vecs, 2, 4, 3)
    codes = {r["vec_id"]: list(r["codes"])
             for r in ann.pq_encode(_df(spark, vecs), books).collect()}
    for i, v in vecs:
        assert codes[i] == _py_pq_codes(v, books), i


def test_ivfpq_exact_when_ksub_covers_corpus(spark):
    """ksub = corpus size -> singleton codewords = the vectors themselves
    -> ADC dot == exact dot and full-probe IVF-PQ == brute force (the
    PQ analog of the nprobe=k_clusters contract)."""
    vecs = _vecs(12, seed=5)
    df = _df(spark, vecs)
    cents = [_scale(v) for i, v in vecs[:3]]
    books = ann.pq_train(df, m=2, ksub=12, iters=2)
    got = ann.ann_ivfpq_topk(df, cents, books, n_queries=2, k=4,
                             nprobe=3).collect()
    sv = {i: _scale(v) for i, v in vecs}
    for q in range(2):
        brute = sorted(
            ((sum(x * y for x, y in zip(sv[q], sv[i])), i)
             for i in sv if i != q),
            key=lambda t: (-t[0], t[1]),
        )[:4]
        mine = sorted([(r["rank"], r["neighbor_id"], r["adc_dot"])
                       for r in got if r["query_id"] == q])
        assert mine == [(rk + 1, i, d) for rk, (d, i) in enumerate(brute)]


def test_ivfpq_recall_vs_brute_force(spark):
    """Real compression (m=2, ksub=16 on 90 vectors): recall@5 against
    exact brute force stays high on the clustered corpus — determinism
    of data, training and ranking makes this a fixed number (10/15),
    not a flaky statistical bound."""
    vecs = _vecs(90, seed=9)
    df = _df(spark, vecs)
    cents = [_scale(v) for i, v in vecs[:4]]
    books = ann.pq_train(df, m=2, ksub=16, iters=3)
    got = ann.ann_ivfpq_topk(df, cents, books, n_queries=3, k=5,
                             nprobe=4).collect()
    sv = {i: _scale(v) for i, v in vecs}
    hits = total = 0
    for q in range(3):
        brute = {i for _, i in sorted(
            ((-sum(x * y for x, y in zip(sv[q], sv[i])), i)
             for i in sv if i != q))[:5]}
        mine = {r["neighbor_id"] for r in got if r["query_id"] == q}
        hits += len(brute & mine)
        total += 5
    assert hits / total >= 0.6, (hits, total)


# ---------------------------------------------------------------------------
# persisted index artifacts (ann.build_ivfpq_index / ann_ivfpq_topk_indexed)
# ---------------------------------------------------------------------------


def test_ann_index_persist_roundtrip(spark, tmpdir_):
    """Train-once/search-many: a persisted IVF-PQ artifact reloads
    byte-identically (JSON of exact ints), searches identically to the
    in-memory artifacts, records its source version for staleness
    policy, and rebuilding replaces it atomically."""
    import os

    import pytest

    vecs = _vecs(40, seed=33)
    df = _df(spark, vecs)
    path = os.path.join(tmpdir_, "annidx")
    idx = ann.build_ivfpq_index(df, path, k=3, m=2, ksub=8,
                                coarse_iters=2, pq_iters=2, sample_mod=1,
                                src_version=7)
    loaded = ann.load_ann_index(spark, path)
    assert loaded == idx and loaded["src_version"] == 7
    direct = sorted(map(tuple, ann.ann_ivfpq_topk(
        df, idx["centroids"], idx["codebooks"],
        n_queries=2, k=4, nprobe=2).collect()))
    via = sorted(map(tuple, ann.ann_ivfpq_topk_indexed(
        df, loaded, n_queries=2, k=4, nprobe=2).collect()))
    assert via == direct and len(via) == 8
    ann.build_ivfpq_index(df, path, k=3, m=3, ksub=8, coarse_iters=1,
                          pq_iters=1, sample_mod=1, src_version=9)
    assert ann.load_ann_index(spark, path)["src_version"] == 9
    with pytest.raises(ValueError, match="ivfpq"):
        ann.ann_ivfpq_topk_indexed(df, {"kind": "flat"})

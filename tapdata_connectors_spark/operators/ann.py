"""Approximate-nearest-neighbor operators over embedding columns.

The similarity-search block of the training-data pipeline (task brief):
brute-force cosine is the correctness baseline (queries.py
q_knn_brute_cosine); the SCALE paths here are:

- random-hyperplane LSH bucketing (map-only sign-bit pattern; candidates
  searched within a bucket: `ann_lsh_topk`),
- IVF: k-means coarse quantizer trained with Lloyd iterations
  (`ivf_train`) where each iteration is ONE shuffle (groupBy cluster id)
  and the corpus itself never moves — centroids are broadcast literals —
  then inverted-list assignment (`ivf_assign`) as a hash-aggregated
  argmin, no window, no sort.

All arithmetic is on ×1e6-scaled integer components: exact, associative,
engine-order-independent (the same determinism rule as queries.py).
Everything is built-in JVM expressions; no Python in any per-row path.
"""

from __future__ import annotations

import hashlib

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scaled_vec(col: Column) -> Column:
    """float embedding -> exact integer components (×1e6, rounded)."""
    return F.transform(col, lambda x: F.round(x.cast("double") * 1000000.0).cast("long"))


def int_dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"), lambda acc, x: acc + x,
    )


def _plane_weights_values(p: int, dim: int) -> list[int]:
    """Python mirror of plane p's md5-derived integer weights — value-
    identical to the dynamic in-JVM formulation below (and to the DuckDB
    oracle): weight_i = ('0x'+md5('pl{p}_{i}')[:8]) % 2001 - 1000, i
    1-based. conv() yields a non-negative < 2^32 long, so pmod == %."""
    return [
        int(hashlib.md5(f"pl{p}_{i}".encode()).hexdigest()[:8], 16) % 2001
        - 1000
        for i in range(1, dim + 1)
    ]


def hyperplane_bucket(v: Column, n_planes: int = 8,
                      plane_offset: int = 0,
                      dim: int | None = None) -> Column:
    """Deterministic random-hyperplane LSH bucket id (sign-bit pattern of
    `n_planes` md5-derived integer hyperplanes). Map-only; identical to
    the DuckDB-oracle formulation in queries.py. `plane_offset` selects an
    independent plane set (planes offset..offset+n_planes-1) — the
    OR-construction bands of cosine_near_dup_multiprobe.

    Pass `dim` (the fixed vector width) whenever it is known: the plane
    weights depend only on (plane, index), so they are precomputed in
    Python and emitted as ONE literal array per plane — the md5 hashing
    moves from PER ROW (dim · n_planes digests for every vector, the
    dominant bucketing cost) to plan build, and the expression tree
    shrinks ~10× (measured: the multiprobe query spent 4.9 s of pure
    driver analysis time on the dynamic trees at sf0.1). The dim=None
    fallback keeps the dynamic per-row formulation for variable-width
    callers; both produce identical buckets."""
    if dim is not None:
        bits = []
        for j in range(n_planes):
            ws = _plane_weights_values(plane_offset + j, dim)
            w = F.expr("array({})".format(
                ",".join(f"{x}L" for x in ws)))
            bits.append(
                F.when(int_dot(v, w) > 0, F.lit(1 << j)).otherwise(F.lit(0)))
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out.cast("bigint")

    def plane_weights(p: int) -> Column:
        # NB: the lambda must take exactly ONE parameter — F.transform
        # treats a 2-parameter lambda as (element, index), so a `p=p`
        # default-arg capture would shadow p with the index column.
        # Eager lambda evaluation makes plain closure capture safe.
        return F.transform(
            F.sequence(F.lit(1), F.size(v)),
            lambda i: F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"pl{p}_"), i.cast("string"))), 1, 8
                    ), 16, 10,
                ).cast("long"),
                F.lit(2001),
            ) - F.lit(1000),
        )

    bits = []
    for j in range(n_planes):
        w = plane_weights(plane_offset + j)
        bits.append(F.when(int_dot(v, w) > 0, F.lit(1 << j)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("bigint")


def _plan_barrier(c: Column) -> Column:
    """Pushdown barrier for an EXPENSIVE computed integer column (r6,
    guide §4.4): joining/filtering on a computed key makes Catalyst push
    the join's `isnotnull(key)`/equality predicates below the projection,
    where they re-derive the whole expression tree — the same double
    evaluation the guide documents for UDFs, but for built-in expression
    trees. Worse, the rewritten predicate pushes below _t's widening
    repartition into the narrow scan stage, so the duplicated assignment
    runs single-threaded (measured: the IVF-PQ probe join re-ran the
    centroid assignment below the Exchange on 1-2 cores, 1.0 s → 3.3 s
    for the encode stage at sf1.0). Adding a non-deterministic ZERO
    (`rand()·0` cast to long) makes the projection non-pushable, so
    predicates evaluate ON the computed attribute above it. The VALUE is
    unchanged and deterministic — rand() ∈ [0,1), so the term is exactly
    0 on every evaluation, retries included; only the optimizer's
    reordering license changes. (A `when(rand() >= -1, c)` guard does
    NOT work: Spark 4's optimizer knows rand's range and folds it away.)
    """
    return c + (F.rand() * F.lit(0.0)).cast("long")


def _vec_dim(df: DataFrame, vec_col: str) -> int | None:
    """Fixed vector width, probed from the first non-null row — a
    bounded one-row metadata job (the same discipline as the broadcast-
    sizing stats). None for an empty/all-null column, which routes
    hyperplane_bucket to its dynamic fallback."""
    row = (df.select(F.size(F.col(vec_col)).alias("d"))
           .filter(F.col("d").isNotNull() & (F.col("d") > 0)).head())
    return int(row.d) if row else None


def ann_lsh_topk(df: DataFrame, n_queries: int = 3, k: int = 5,
                 n_planes: int = 4, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """LSH-bucketed approximate top-k: candidates = corpus vectors sharing
    the query's bucket; exact integer-dot re-rank within the bucket.
    Scale shape: the join is on the bucket id (work ∝ bucket sizes, never
    all-pairs); ranking is a per-query window over candidates only."""
    from pyspark.sql import Window as W

    base = df.select(
        F.col(id_col).alias("vec_id"), scaled_vec(F.col(vec_col)).alias("v")
    ).withColumn("bucket", hyperplane_bucket(F.col("v"), n_planes,
                                             dim=_vec_dim(df, vec_col)))
    # NB: no _plan_barrier here — the 4-plane bucket expression is cheap
    # enough that the join's pushed-down re-derivation measured within
    # noise of the barrier plan (A/B'd at sf1.0, ~1.0 s both ways);
    # the barrier is reserved for the expensive IVF/PQ assignments
    q = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("bucket").alias("qb"),
    )
    cand = base.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("qb")) & (F.col("vec_id") != F.col("query_id")),
    ).withColumn("dot", int_dot(F.col("qv"), F.col("v")))
    w = W.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"),
                F.col("vec_id").alias("neighbor_id"), "dot")
    )


def _block_count(n_rows: int, target: int = 2048, cap: int = 64) -> int:
    """Within-bucket block split factor for the blocked all-pairs verify:
    ~sqrt(n/target) so a block pair holds ≲2·target rows. Scale-adaptive
    (grows with the corpus, never a constant tuned to one core count);
    capped because row replication is nc per row — O(n·sqrt(n)) total,
    always subdominant to the O(pairs) verify work it parallelizes."""
    import math

    return max(1, min(cap, math.isqrt(max(0, (n_rows - 1) // target)) + 1))


def _blocked_cosine_pairs(df: DataFrame, threshold_x1e6: int,
                          n_planes: int, n_bands: int,
                          id_col: str, vec_col: str) -> DataFrame:
    """Shared verify stage of cosine_near_dup / _multiprobe: bucket per
    band (map-only JVM, oracle-identical hyperplane bits), then compute
    every within-bucket pair's exact cosine in BLOCKED numpy matmuls.

    r6 optimization (guide §2.5/§4.2): the r5 plan self-joined on
    `bucket` — with 2^n_planes (=16) join keys the quadratic in-bucket
    verify landed on ≤16 tasks, each paying an interpreted
    aggregate/zip_with per pair (87 s at sf1.0). Here each bucket is cut
    into nc ≈ sqrt(n/2048) chunks by pmod(xxhash64(id), nc); every row is
    replicated to its nc block pairs, ONE shuffle groups (band, bucket,
    bi, bj) blocks, and a pandas task computes the block's dot matrix as
    one float64 BLAS matmul — 87 s → ~3 s at sf1.0, parallelism ∝
    bucket-blocks² instead of ∝ buckets.

    Exactness: components are ×1e6 ints with |x| ≤ ~1e6, so every product
    is an exact float64 integer and, by Cauchy-Schwarz on |a_i|·|b_i|,
    every partial sum is bounded by max(nrm) « 2^53 — float64 matmul is
    therefore EXACT (guarded per batch), and the cosine expression
    dot/(sqrt(na)·sqrt(nb))·1e6 floored is the same correctly-rounded
    IEEE sequence Spark and DuckDB evaluate, so results stay
    bit-identical to the r5 plan and the oracle."""
    import numpy as np
    import pandas as pd

    dim = _vec_dim(df, vec_col)
    n_rows = df.count()  # bounded metadata job: sizes the block split
    nc = _block_count(n_rows)
    base = df.select(
        F.col(id_col).alias("vec_id"), scaled_vec(F.col(vec_col)).alias("v")
    ).withColumn("nrm", int_dot(F.col("v"), F.col("v")))
    bands = F.array(*[
        F.struct(
            F.lit(t).alias("band"),
            hyperplane_bucket(F.col("v"), n_planes,
                              plane_offset=t * n_planes,
                              dim=dim).alias("bucket"),
        )
        for t in range(n_bands)
    ])
    chunk = F.pmod(F.xxhash64(F.col("vec_id")), F.lit(nc)).cast("int")
    blocks = F.transform(
        F.sequence(F.lit(0), F.lit(nc - 1)),
        lambda o: F.struct(F.least(F.col("chunk"), o).alias("bi"),
                           F.greatest(F.col("chunk"), o).alias("bj")),
    )
    e = (
        base.withColumn("chunk", chunk)
        .withColumn("bb", F.explode(bands))
        .withColumn("blk", F.explode(blocks))
        .select("vec_id", "v", "nrm", "chunk",
                F.col("bb.band").alias("band"),
                F.col("bb.bucket").alias("bucket"),
                F.col("blk.bi").alias("bi"), F.col("blk.bj").alias("bj"))
    )
    thr = float(threshold_x1e6)

    def verify(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"vec_a": pd.Series(dtype=object),
                                 "vec_b": pd.Series(dtype=object),
                                 "cos_x1e6": pd.Series(dtype="int64")})
        nrm = pdf["nrm"].to_numpy(dtype=np.float64)
        if nrm.max() >= 2.0 ** 53:
            raise ValueError(
                "blocked cosine verify: norms exceed 2^53 — float64 "
                "matmul would round; rescale the embedding")
        V = np.stack(pdf["v"].to_numpy())
        ids = pdf["vec_id"].to_numpy()
        bi, bj = int(pdf["bi"].iat[0]), int(pdf["bj"].iat[0])
        if bi == bj:
            ia = np.arange(len(pdf))
            ib = ia
        else:
            ck = pdf["chunk"].to_numpy()
            ia = np.flatnonzero(ck == bi)
            ib = np.flatnonzero(ck == bj)
            if not len(ia) or not len(ib):
                return pd.DataFrame({"vec_a": pd.Series(dtype=object),
                                     "vec_b": pd.Series(dtype=object),
                                     "cos_x1e6": pd.Series(dtype="int64")})
        A = V[ia].astype(np.float64)
        B = V[ib].astype(np.float64)
        dot = A @ B.T  # exact: every partial sum < max(nrm) < 2^53
        with np.errstate(invalid="ignore", divide="ignore"):
            cos = dot / (np.sqrt(nrm[ia])[:, None] * np.sqrt(nrm[ib])[None, :])
            cx = np.floor(cos * 1000000.0)
            keep = (ids[ia][:, None] < ids[ib][None, :]) & (cx >= thr)
        ra, rb = np.nonzero(keep)
        return pd.DataFrame({
            "vec_a": ids[ia][ra],
            "vec_b": ids[ib][rb],
            "cos_x1e6": cx[ra, rb].astype(np.int64),
        })

    id_type = df.schema[id_col].dataType.simpleString()
    out = e.groupBy("band", "bucket", "bi", "bj").applyInPandas(
        verify, f"vec_a {id_type}, vec_b {id_type}, cos_x1e6 long"
    )
    if n_bands > 1:
        # a pair colliding in several bands is verified in each (the
        # matmul re-verify is cheaper than a pre-verify distinct of the
        # full candidate set); results are deterministic so one distinct
        # on the small qualifying output collapses them
        out = out.distinct()
    return out


def cosine_near_dup(df: DataFrame, threshold_x1e6: int = 300_000,
                    n_planes: int = 4, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed (the scale
    path): candidates are restricted to vectors sharing the hyperplane
    bucket (each vector lives in exactly ONE bucket — each pair is
    emitted at most once, unlike banded MinHash), then verified with the
    exact cosine. Work ∝ bucket sizes, never all-pairs.

    Determinism: dot and norms are exact integers (≤ dim·1e12 « 2^53);
    the cosine is the IEEE-double expression dot / (sqrt(na)·sqrt(nb))
    floored at ×1e6, so any engine computes bit-identical values. The
    verify runs as blocked numpy matmuls — see _blocked_cosine_pairs
    for the plan shape and the exactness argument."""
    return _blocked_cosine_pairs(df, threshold_x1e6, n_planes, 1,
                                 id_col, vec_col)


def cosine_near_dup_multiprobe(df: DataFrame, threshold_x1e6: int = 300_000,
                               n_planes: int = 4, n_bands: int = 3,
                               id_col: str = "vec_id",
                               vec_col: str = "embedding",
                               cache_registry: list | None = None) -> DataFrame:
    """OR-construction embedding near-dup (the recall path — VERDICT r2
    item 7): each vector is bucketed by `n_bands` INDEPENDENT hyperplane
    sets (band t uses planes t·n_planes..t·n_planes+n_planes-1 — the
    MinHash-banding analog for embeddings); candidate pairs share a
    bucket in ANY band, so a near-dup pair straddling one band's
    hyperplane boundary is still caught by another band. Miss probability
    decays exponentially in n_bands, where single-probe cosine_near_dup
    is the b=1 special case — with band 0's planes identical to
    single-probe's, this operator's candidate set is a strict SUPERSET
    at the same threshold.

    Scale shape (r6): one shuffle of the banded/blocked frame into
    numpy-verified block pairs (_blocked_cosine_pairs); a pair colliding
    in several bands is re-verified per band and deduped by one distinct
    on the small qualifying output — cheaper than the r5 plan's
    pre-verify distinct of the full candidate set plus two vector join-
    backs (52.7 s → ~3 s at sf1.0). `cache_registry` is kept for call-
    site compatibility; this plan persists nothing."""
    del cache_registry  # single-pass plan: nothing to persist or release
    return _blocked_cosine_pairs(df, threshold_x1e6, n_planes, n_bands,
                                 id_col, vec_col)


def _centroid_lit(centroids: list[list[int]]) -> Column:
    """centroids as a literal array<struct<cid,cv>> — broadcast by value,
    the corpus never shuffles for an assignment. Built as ONE parsed SQL
    expression: composing it from F.lit()/F.struct() costs a py4j
    round-trip per literal (k×dim of them) and dominated plan-build time
    — ~9 s of pure driver latency for the IVF-PQ query's 4×16×16
    codebook tensor before this; the JVM parses the same tree from a
    string in milliseconds."""
    parts = ", ".join(
        "named_struct('cid', {}, 'cv', array({}))".format(
            cid, ", ".join(f"{int(x)}L" for x in cv))
        for cid, cv in enumerate(centroids)
    )
    return F.expr(f"array({parts})")


def assign_col(v: Column, centroids: list[list[int]]) -> Column:
    """struct(d2, cid) of the nearest centroid for one scaled vector —
    an argmin computed per row via array expressions (map-only)."""
    pairs = F.transform(
        _centroid_lit(centroids),
        lambda c: F.struct(
            F.aggregate(
                F.zip_with(v, c["cv"], lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"), lambda acc, x: acc + x,
            ).alias("d2"),
            c["cid"].alias("cid"),
        ),
    )
    return F.array_min(pairs)


def ivf_assign(df: DataFrame, centroids: list[list[int]],
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(vec_id, centroid_id, dist2): inverted-list assignment. Map-only —
    centroids ride into the task as literals; ties break to the lowest
    centroid id (array_min on struct(d2, cid))."""
    v = scaled_vec(F.col(vec_col))
    best = assign_col(v, centroids)
    return df.select(
        F.col(id_col).alias("vec_id"),
        best["cid"].cast("bigint").alias("centroid_id"),
        best["d2"].alias("dist2"),
    )


def ann_ivf_topk(df: DataFrame, centroids: list[list[int]],
                 n_queries: int = 3, k: int = 5, nprobe: int = 2,
                 id_col: str = "vec_id", vec_col: str = "embedding"
                 ) -> DataFrame:
    """IVF search: the probe-and-search half that ivf_train/ivf_assign
    exist for (FAISS IndexIVF topology). Corpus vectors live in inverted
    lists keyed by their nearest centroid (map-only assignment over
    literal broadcast centroids); each query probes its `nprobe` nearest
    centroids and exact-reranks ONLY those lists by integer dot product.

    Scale shape: assignment and probe selection are map-only; the
    candidate join is an equi-join on centroid_id with the (queries ×
    nprobe) frame broadcast — work ∝ probed-list sizes, never
    all-pairs; ranking is a per-query window over candidates only.
    Recall is tuned by nprobe exactly as in FAISS (nprobe = k_clusters
    recovers exact brute force)."""
    from pyspark.sql import Window as W

    base = df.select(
        F.col(id_col).alias("vec_id"), scaled_vec(F.col(vec_col)).alias("v")
    )
    # cid behind a _plan_barrier: the probe join's pushed-down
    # isnotnull/equality predicates would otherwise re-derive the whole
    # assignment expression below the projection (guide §4.4, r6)
    assigned = base.withColumn(
        "cid", _plan_barrier(assign_col(F.col("v"), centroids)["cid"]))
    # nprobe nearest centroids per query, computed DRIVER-side from the
    # collected query vectors (bounded O(n_queries·dim) — the same
    # discipline as the collected centroid seeds; distance then centroid
    # id ties, exactly the r5 array_sort order). Skips executing the
    # probe-selection subplan as its own broadcast job (r6).
    qrows = (base.filter(F.col("vec_id") < n_queries)
             .select("vec_id", "v").collect())
    qp_rows = []
    for r in sorted(qrows, key=lambda r: r["vec_id"]):
        qv = list(r["v"])
        d2 = sorted(
            (sum((a - b) * (a - b) for a, b in zip(qv, cv)), cid)
            for cid, cv in enumerate(centroids)
        )
        for _, cid in d2[:nprobe]:
            qp_rows.append((r["vec_id"], qv, cid))
    qp = df.sparkSession.createDataFrame(
        qp_rows, "query_id long, qv array<bigint>, cid bigint"
    )
    # the probed list ids are known driver-side — prune the corpus to
    # probed inverted lists BEFORE the join (evaluates on the barrier
    # attribute, never re-deriving the assignment; work ∝ probed lists)
    probed = sorted({cid for _, _, cid in qp_rows})
    cand = (
        assigned.filter(F.col("cid").isin(probed))
        .join(F.broadcast(qp), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("dot", int_dot(F.col("qv"), F.col("v")))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"),
                F.col("vec_id").alias("neighbor_id"), "dot")
    )


def ivf_train(df: DataFrame, k: int = 4, iters: int = 5,
              id_col: str = "vec_id", vec_col: str = "embedding"
              ) -> list[list[int]]:
    """Lloyd's k-means on scaled-integer vectors: the IVF coarse-quantizer
    trainer (replaces the r1 'first k vectors' placeholder with actual
    training; seeding is still the deterministic lowest-k ids).

    Scale shape per iteration: assignment is map-only (broadcast literal
    centroids), the ONLY shuffle is groupBy(cid) for the per-dimension
    SUMS — k×dim exact long aggregates with map-side partial combine; the
    mean's division happens driver-side in integer arithmetic (nearest,
    ties toward +inf), so training is bit-deterministic on any cluster
    layout. Centroid state (k×dim ints) round-trips through the driver —
    the MLlib/k-means|| topology. Empty clusters keep their previous
    centroid. Returns centroids as k lists of dim ints.
    """
    base = df.select(
        F.col(id_col).alias("vec_id"), scaled_vec(F.col(vec_col)).alias("v")
    )
    seeds = base.orderBy("vec_id").limit(k).collect()
    if len(seeds) < k:
        raise ValueError(f"need at least k={k} vectors, have {len(seeds)}")
    dim = len(seeds[0]["v"])
    centroids = [list(r["v"]) for r in seeds]
    for _ in range(iters):
        assigned = base.withColumn("cid", assign_col(F.col("v"), centroids)["cid"])
        sums = assigned.groupBy("cid").agg(
            F.count(F.lit(1)).alias("n"),
            *[F.sum(F.element_at(F.col("v"), i + 1)).alias(f"s{i}")
              for i in range(dim)],
        ).collect()
        new = {
            r["cid"]: [(2 * r[f"s{i}"] + r["n"]) // (2 * r["n"]) for i in range(dim)]
            for r in sums
        }
        centroids = [new.get(c, centroids[c]) for c in range(k)]
    return centroids


# ---------------------------------------------------------------------------
# Product quantization (FAISS IVF-PQ shape): train per-subspace codebooks,
# encode vectors to m small codes, search by asymmetric distance (ADC).
# The memory-bound scale path: a 64-dim float vector (256 B) compresses to
# m bytes of codes, so a 10^10-vector corpus's quantized form fits the
# aggregate RAM of a modest cluster while the raw vectors stay in parquet.
# ---------------------------------------------------------------------------


def pq_train(df: DataFrame, m: int = 4, ksub: int = 16, iters: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding"
             ) -> list[list[list[int]]]:
    """codebooks[sub][code][dsub]: independent Lloyd k-means per subspace,
    all m trained SIMULTANEOUSLY — subvectors explode to (subspace, sv)
    rows and each iteration is ONE assignment + ONE groupBy((s, cid))
    shuffle for every codebook at once (m sequential trainings were m×
    iters Spark jobs; job-scheduling overhead dominated the arithmetic at
    corpus scale). Same integer Lloyd math as ivf_train (seeds = lowest
    ksub ids, nearest-int means, empty clusters keep their centroid), so
    the python-oracle parity test is unchanged. Requires dim % m == 0.
    Train on a hash SAMPLE at scale — codebooks need the distribution,
    not the corpus (the FAISS practice)."""
    seeds = df.select(F.col(id_col), scaled_vec(F.col(vec_col)).alias("v")) \
        .orderBy(id_col).limit(ksub).collect()
    if len(seeds) < ksub:
        raise ValueError(f"need at least ksub={ksub} vectors, have {len(seeds)}")
    dim = len(seeds[0]["v"])
    if dim % m:
        raise ValueError(f"pq_train: dim {dim} not divisible by m {m}")
    dsub = dim // m
    books = [
        [list(r["v"])[s * dsub:(s + 1) * dsub] for r in seeds]
        for s in range(m)
    ]
    v = scaled_vec(F.col(vec_col))
    sub = df.select(
        F.explode(F.array(*[
            F.struct(F.lit(s).alias("s"),
                     F.slice(v, s * dsub + 1, dsub).alias("sv"))
            for s in range(m)
        ])).alias("e")
    ).select(F.col("e.s").alias("s"), F.col("e.sv").alias("sv"))
    sub = sub.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        for _ in range(iters):
            cents_by_s = F.array(*[_centroid_lit(b) for b in books])
            pairs = F.transform(
                F.element_at(cents_by_s, F.col("s") + 1),
                lambda c: F.struct(
                    F.aggregate(
                        F.zip_with(F.col("sv"), c["cv"],
                                   lambda a, b: (a - b) * (a - b)),
                        F.lit(0).cast("long"), lambda acc, x: acc + x,
                    ).alias("d2"),
                    c["cid"].alias("cid"),
                ),
            )
            assigned = sub.withColumn("cid", F.array_min(pairs)["cid"])
            sums = assigned.groupBy("s", "cid").agg(
                F.count(F.lit(1)).alias("n"),
                *[F.sum(F.element_at(F.col("sv"), i + 1)).alias(f"d{i}")
                  for i in range(dsub)],
            ).collect()
            new: dict[tuple[int, int], list[int]] = {
                (r["s"], r["cid"]):
                    [(2 * r[f"d{i}"] + r["n"]) // (2 * r["n"])
                     for i in range(dsub)]
                for r in sums
            }
            books = [
                [new.get((s, c), books[s][c]) for c in range(ksub)]
                for s in range(m)
            ]
    finally:
        sub.unpersist()
    return books


def pq_codes_col(v: Column, codebooks: list[list[list[int]]]) -> Column:
    """array<int> of m per-subspace nearest-codeword ids for one SCALED
    vector — m × ksub integer distance evals per row, all JVM array
    expressions, map-only."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    return F.array(*[
        assign_col(F.slice(v, s * dsub + 1, dsub), codebooks[s])["cid"]
        for s in range(m)
    ])


def pq_encode(df: DataFrame, codebooks: list[list[list[int]]],
              id_col: str = "vec_id", vec_col: str = "embedding"
              ) -> DataFrame:
    """(vec_id, codes): the quantized corpus — m ints per vector in place
    of the full embedding."""
    return df.select(
        F.col(id_col).alias("vec_id"),
        pq_codes_col(scaled_vec(F.col(vec_col)), codebooks).alias("codes"),
    )


def ann_ivfpq_topk(df: DataFrame, centroids: list[list[int]],
                   codebooks: list[list[list[int]]],
                   n_queries: int = 3, k: int = 5, nprobe: int = 2,
                   id_col: str = "vec_id", vec_col: str = "embedding"
                   ) -> DataFrame:
    """IVF-PQ search: inverted lists from the coarse quantizer + PQ codes
    instead of raw vectors, ranked by ASYMMETRIC distance — each query
    precomputes dot(q_sub, codeword) for every (subspace, codeword) pair
    (m×ksub integer dots, computed once per query) and a candidate's
    approximate dot is m table lookups over its codes, never a dim-wide
    product.

    Scale shape: the corpus side carries only (cid, codes) — assignment
    and encoding are map-only over broadcast literal codebooks; the probe
    join broadcasts the (queries × nprobe) frame WITH each query's ADC
    table riding along as an array column, so candidate scoring touches
    no raw vector. Work ∝ probed-list sizes × m. Exactness property:
    with ksub = corpus size the codewords converge to the vectors and
    ADC ranking equals brute force (pytest-asserted); recall at real
    (m, ksub, nprobe) is gated against brute-force ground truth.

    r6: the probe cids and ADC tables are computed DRIVER-side from the
    collected query vectors — a bounded O(n_queries·dim) collect, the
    same discipline as the collected centroid seeds. The r5 plan built
    the ADC tables as one m×ksub-term JVM expression over the broadcast
    query subplan; compiling that tree cost ~4 s per invocation at m=4,
    ksub=16 while evaluating it touched only n_queries rows. Exact
    integer math is identical in Python (arbitrary-precision) and the
    JVM (bounded « 2^63)."""
    from pyspark.sql import Window as W

    m = len(codebooks)
    dsub = len(codebooks[0][0])
    base = df.select(
        F.col(id_col).alias("vec_id"), scaled_vec(F.col(vec_col)).alias("v")
    )
    qrows = (base.filter(F.col("vec_id") < n_queries)
             .select("vec_id", "v").collect())
    qp_rows = []
    for r in sorted(qrows, key=lambda r: r["vec_id"]):
        qv = list(r["v"])
        d2 = sorted(
            (sum((a - b) * (a - b) for a, b in zip(qv, cv)), cid)
            for cid, cv in enumerate(centroids)
        )
        adc = [
            [sum(a * b for a, b in zip(qv[s * dsub:(s + 1) * dsub],
                                       codebooks[s][j]))
             for j in range(len(codebooks[s]))]
            for s in range(m)
        ]
        for _, cid in d2[:nprobe]:
            qp_rows.append((r["vec_id"], adc, cid))
    qp = df.sparkSession.createDataFrame(
        qp_rows, "query_id long, adc array<array<bigint>>, cid bigint"
    )
    # r6 plan (guide §4.4 + §2.3): cid behind a _plan_barrier so the
    # probe join's pushed predicates evaluate on the attribute instead of
    # re-deriving the assignment; the probed list ids are known
    # driver-side, so the corpus is pruned to probed inverted lists
    # BEFORE PQ-encoding — codes are computed only for candidate rows
    # (search work ∝ probed lists, the FAISS invariant), measured
    # 4.1 s → ~1.3 s on the encode+join stage at sf1.0.
    probed = sorted({cid for _, _, cid in qp_rows})
    corpus = (
        base.withColumn(
            "cid", _plan_barrier(assign_col(F.col("v"), centroids)["cid"]))
        .filter(F.col("cid").isin(probed))
        .select("vec_id", "cid",
                pq_codes_col(F.col("v"), codebooks).alias("codes"))
    )
    cand = (
        corpus.join(F.broadcast(qp), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "adc_dot",
            F.aggregate(
                F.zip_with(
                    F.col("codes"), F.col("adc"),
                    lambda c, t: F.element_at(t, c.cast("int") + 1),
                ),
                F.lit(0).cast("long"), lambda acc, x: acc + x,
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("adc_dot"), F.asc("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"),
                F.col("vec_id").alias("neighbor_id"), "adc_dot")
    )


# ---------------------------------------------------------------------------
# Persisted ANN index artifacts: train ONCE, search MANY.
# At corpus scale an ANN index is an offline artifact refreshed on its own
# cadence (FAISS writes index files; Milvus/Vespa persist segments) — the
# searcher must never pay training. The artifact here is deliberately tiny
# (coarse centroids k×dim ints + PQ codebooks m×ksub×dsub ints ≈ a few KB
# of JSON) because the corpus-side state (cid, codes) is recomputed map-only
# from the broadcast artifact — re-encoding 10^10 vectors is one scan with
# zero shuffles, while SHIPPING stored codes would be another table to keep
# transactionally consistent with the corpus. JSON on the same FS family as
# the lake (file:// / hdfs:// / s3a://), written atomically via tmp+rename.
# ---------------------------------------------------------------------------


def save_ann_index(spark, path: str, index: dict) -> None:
    """Persist an index artifact dict as JSON (atomic replace)."""
    import json

    from tapdata_connectors_spark.lake.fs import make_fs

    fs = make_fs(spark, path)
    fs.mkdirs(fs.root)
    tmp = fs.join("index.json.tmp")
    fs.write_text(tmp, json.dumps(index, sort_keys=True))
    fs.replace(tmp, fs.join("index.json"))


def load_ann_index(spark, path: str) -> dict:
    import json

    from tapdata_connectors_spark.lake.fs import make_fs

    fs = make_fs(spark, path)
    return json.loads(fs.read_text(fs.join("index.json")))


def build_ivfpq_index(df: DataFrame, path: str, k: int = 4, m: int = 4,
                      ksub: int = 16, coarse_iters: int = 5,
                      pq_iters: int = 4, sample_mod: int = 8,
                      src_version: int | None = None,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      ) -> dict:
    """Train a full IVF-PQ index (Lloyd coarse quantizer + Lloyd PQ
    codebooks on a deterministic 1/sample_mod modulo sample) and persist
    it at `path`. `src_version` records which corpus snapshot the index
    was trained against — searchers can compare it to the table's current
    version and decide staleness on their own refresh policy (an ANN
    index tolerates staleness by design; recall degrades gradually as the
    corpus drifts, it never returns wrong distances because search
    re-encodes the CURRENT corpus against the artifact)."""
    sample = df.filter((F.col(id_col) % sample_mod) == 0)
    index = {
        "kind": "ivfpq",
        "params": {"k": k, "m": m, "ksub": ksub,
                   "coarse_iters": coarse_iters, "pq_iters": pq_iters,
                   "sample_mod": sample_mod},
        "src_version": src_version,
        "centroids": ivf_train(df, k=k, iters=coarse_iters,
                               id_col=id_col, vec_col=vec_col),
        "codebooks": pq_train(sample, m=m, ksub=ksub, iters=pq_iters,
                              id_col=id_col, vec_col=vec_col),
    }
    save_ann_index(df.sparkSession, path, index)
    return index


def ann_ivfpq_topk_indexed(df: DataFrame, index: dict, n_queries: int = 3,
                           k: int = 5, nprobe: int = 2,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """IVF-PQ search against a persisted artifact (load_ann_index) —
    the search-many half; identical plan to ann_ivfpq_topk."""
    if index.get("kind") != "ivfpq":
        raise ValueError(f"not an ivfpq index: {index.get('kind')!r}")
    return ann_ivfpq_topk(df, index["centroids"], index["codebooks"],
                          n_queries=n_queries, k=k, nprobe=nprobe,
                          id_col=id_col, vec_col=vec_col)

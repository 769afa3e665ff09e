"""Web-corpus curation operators: URL canonicalization + dedup, per-host
quota sampling, benchmark-contamination detection.

These are the webtext-pipeline stages the reference leaves to its users
(its URL handling stops at connection strings; per-table quotas stop at
readPartition row limits — DatabaseReadPartitionSplitter.java), but every
large-scale crawl pipeline needs them between ingest and training:

- canonical_url / host_of: pure regexp Column expressions (map-only, JVM,
  whole-stage-codegen) chosen from the RE2-portable subset so the exact
  same chain runs in the DuckDB oracle — no lookaround, no backrefs in
  patterns, global left-to-right replacement on both engines.
- url_dedup: group by canonical form, min-id survivorship — one shuffle
  on the canonical string (hash-partitioned; at 100 TB this is the same
  single-exchange shape as exact text dedup).
- host_cap_sample: at most k docs per host, chosen by a deterministic
  md5 order (cross-engine reproducible, no RNG) — the per-domain quota
  every crawl pipeline applies so megahosts don't dominate the corpus.
  One window over a hash-partitioned host key; skew on a megahost is
  bounded by early projection (the window carries only id+host+hash).
- contamination: docs sharing any word n-gram with an eval/benchmark set
  (Lee et al. 2022 decontamination). Eval inventory is tiny by
  construction → broadcast semi-join against the corpus's distinct-gram
  frame: zero shuffle of the big side beyond its own distinct().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from tapdata_connectors_spark.operators.corpus import gram_hash, word_ngrams

__all__ = [
    "canonical_url",
    "host_of",
    "url_dedup",
    "host_cap_sample",
    "contamination",
]

_SCHEME_HOST = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
_TRACKING = "([?&])(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref)=[^&#]*"


def canonical_url(col: Column) -> Column:
    """Canonical form of a URL: fragment stripped, scheme+host lowercased
    (path/query case preserved — they are case-sensitive), leading `www.`
    dropped, default ports (:443 https / :80 http) removed, tracking
    params (utm_*, fbclid, gclid, msclkid, ref) deleted with separator
    cleanup, trailing slashes trimmed.

    Every step is a single regexp_replace/extract from the RE2-portable
    subset, so the DuckDB oracle (SQL_URL_CANONICAL_DEDUP) replays the
    chain verbatim and the outputs are byte-identical.
    """
    u = F.trim(col)
    # 1. fragment
    u = F.regexp_replace(u, "#.*$", "")
    # 2. lowercase scheme://host[:port] (head); keep path/query (tail)
    head = F.lower(F.regexp_extract(u, f"({_SCHEME_HOST})", 1))
    tail = F.regexp_replace(u, _SCHEME_HOST, "")
    u = F.when(head == "", u).otherwise(F.concat(head, tail))
    # 3. drop leading www.
    u = F.regexp_replace(u, r"^(https?://)www\.", "$1")
    # 4. default ports (group 2 keeps the boundary char / end)
    u = F.regexp_replace(u, "^(https://[^/:?#]*):443([/?#]|$)", "$1$2")
    u = F.regexp_replace(u, "^(http://[^/:?#]*):80([/?#]|$)", "$1$2")
    # 5. tracking params, then separator cleanup
    u = F.regexp_replace(u, _TRACKING, "$1")
    u = F.regexp_replace(u, r"\?&+", "?")
    u = F.regexp_replace(u, "&&+", "&")
    u = F.regexp_replace(u, "[?&]+$", "")
    # 6. trailing slash
    u = F.regexp_replace(u, "/+$", "")
    return u


def host_of(col: Column) -> Column:
    """Lowercased host (port and leading www. stripped); '' if no
    scheme://host prefix is present."""
    host = F.lower(F.regexp_extract(F.trim(col), f"({_SCHEME_HOST})", 1))
    host = F.regexp_replace(host, "^[a-z][a-z0-9+.-]*://", "")
    host = F.regexp_replace(host, r"^www\.", "")
    return F.regexp_replace(host, ":[0-9]+$", "")


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """(canonical_url, survivor_id, n_copies) per canonical form —
    min-id survivorship, the URL-level exact dedup every crawl pipeline
    runs before content-level dedup. One hash-partitioned aggregation on
    the canonical string; partial (map-side) min/count combine, so a
    hot canonical URL never concentrates rows on one task."""
    return (
        df.select(
            canonical_url(F.col(url_col)).alias("canonical_url"),
            F.col(id_col),
        )
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("survivor_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def host_cap_sample(
    df: DataFrame,
    host_col: str = "source",
    id_col: str = "doc_id",
    cap: int = 5,
    n_salts: int = 1,
) -> DataFrame:
    """At most `cap` rows per host, picked by deterministic md5 order over
    the id (cross-engine reproducible; no sampling RNG). Returns
    (id, host, rk) for the kept rows.

    Skew: the row_number + `rk <= cap` shape triggers Catalyst's
    WindowGroupLimit rule (Spark >= 3.5) — a PARTIAL per-key top-cap
    runs map-side BEFORE the exchange (verified in this engine's plans:
    Sort -> WindowGroupLimit -> Exchange -> ... -> Window), so a
    megahost contributes at most cap rows per map task to the shuffle
    and the single window is already skew-immune AND one exchange
    cheaper than manual salting (measured: BENCH/skew_bench.json — the
    salted two-phase came out 0.75-0.87x at 20M rows/90% hot share
    precisely because the optimizer had already salted the plan). The
    default is therefore the single window; `n_salts > 1` routes
    through operators/skew.salted_topk (row-identical, pytest-pinned)
    as the explicit fallback for engines or window patterns outside the
    group-limit rule. The window input is early-projected to 3 columns
    either way."""
    from tapdata_connectors_spark.operators.skew import salted_topk

    ordkey = F.md5(F.col(id_col).cast("string"))
    slim = df.select(F.col(id_col), F.col(host_col), ordkey.alias("__ord"))
    if n_salts > 1:
        return (
            salted_topk(
                slim, host_col, ["__ord", id_col], cap,
                n_salts=n_salts, salt_from=[id_col],
            ).select(id_col, host_col, "rk")
        )
    w = W.partitionBy(host_col).orderBy(F.col("__ord"), F.col(id_col))
    return (
        slim.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= cap)
        .select(id_col, host_col, "rk")
    )


def contamination(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination (Lee et al. 2022 §5; the n-gram-overlap
    check run before training on any crawl corpus): per candidate doc,
    how many of its distinct word n-grams appear in ANY eval-set doc,
    plus the contaminated flag.

    Shape at 100 TB: the eval inventory is distinct-gram-hashed and tiny
    (benchmarks are KBs, corpora are TBs) → broadcast to every executor;
    the corpus side is one explode of distinct-per-doc grams + one
    broadcast join + one per-doc count. No shuffle carries a gram string
    — grams travel as 64-bit xxhash64 keys (operators/corpus.gram_hash;
    internal-only — the oracle recomputes its own inventory, so no
    cross-engine hash equality is needed)."""
    def grams(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col),
            F.explode_outer(
                F.array_distinct(word_ngrams(F.col(text_col), n))
            ).alias("gram"),
        ).select(id_col, gram_hash(F.col("gram")).alias("gh"))

    eval_grams = grams(eval_docs).select("gh").distinct()
    cand = grams(docs)
    hits = (
        cand.join(F.broadcast(eval_grams), "gh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    totals = (
        cand.filter(F.col("gh").isNotNull())
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_grams"))
    )
    return (
        docs.select(id_col)
        .join(totals, id_col, "left")
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            (F.coalesce("n_hit", F.lit(0)) > 0).alias("contaminated"),
        )
    )

"""Persisted cross-document n-gram index + incremental exact-substring cut.

Closes the gap cut_spans documents: the full Lee-et-al removal pass
re-derives document frequency for every gram of every live page — one
linear inventory per run, unaffordable per-epoch at a 10-TB/day ingest
rate. This module keeps that inventory as a PERSISTED, incrementally
maintained index and runs the cut over only the documents whose
duplicated-span structure could have changed.

The index IS a LakeTable (key `gh` = gram_hash(gram), payload
`n_docs` + `solo_doc`), maintained from the corpus table's own
change-data feed exactly like streaming/rollup.py — but written through
the MOR delta-append path (lake/delta.py), because the index has
O(distinct grams) rows and a rollup-style full-bucket rewrite per refresh
would be O(index), not O(delta):

- each refresh folds read_changes(since, to, preimages=True) into
  per-(gram, doc) MEMBERSHIP deltas (+1 the doc now holds the gram, −1
  it no longer does — pre/post text both ride the CDF, so no stored
  lookup is needed to compute them), then per-gram count deltas;
- stored state is probed for exactly the adjusted grams (bucket-pruned
  read of the index, adjusted-gram side broadcast when delta-sized);
- adjusted grams append as 'I' (live full-image reset = upsert under the
  default policy) / 'D' (count fell to zero) delta rows with
  seq = source version — strictly monotone, one row per gram per
  refresh, so MOR resolution is exact; compaction folds the ledger with
  the ordinary LakeTable.compact();
- the (since → to) watermark rides the applied-epochs exactly-once guard
  (same discipline as rollup refreshes): a re-run of the same refresh is
  a no-op, a crash between compute and commit re-runs cleanly.

`solo_doc` (the holder of a docfreq-1 gram) is what makes the cut
incremental in BOTH directions: when a new document pushes a gram's
docfreq from 1 to 2, the OLD holder — an untouched page — gains a
duplicated span and must be re-examined. At gh grain the holder identity
survives inserts and swaps exactly; a decrement from ≥2 back to 1 leaves
it NULL ("unknown holder" — recovering it would need a posting-list
/ suffix-array-grain index, the O(corpus-tokens) structure this design
deliberately avoids). An unknown-holder gram that later crosses 1→2 is
therefore missed by the incremental pass; refreshes COUNT these
(`unknown_solo` / `unknown_holder_crossings`) so operators can see the
staleness bound. The miss is self-limiting: every LATER holder of the
gram arrives as a touched document and is cut, so at most ONE copy of
the span survives per missed crossing — the "keep one canonical copy"
end state rather than the full pass's zero copies — and it never
compounds. On an append-dominated web-crawl ingest the count stays 0.

cut_spans_incremental is the three-phase resumable stage:
  1. probe (no writes): window delta → adjusted grams → affected docs
     (touched live docs ∪ solo holders of 1→2 crossings) → duplicated
     positions via corpus.exact_substring_cut_probed, with effective
     docfreq = stored index overlaid by the pending adjustments (the
     index itself is NOT yet advanced);
  2. cut commit: the shared curation._apply_cut_rewrites touched-bucket
     rewrite, idempotent per tag;
  3. index refresh: fold since → CURRENT version — which now includes
     the cut's own text changes, so the grams a rewrite removed
     decrement automatically on the same code path.
A crash between 2 and 3 re-runs cleanly: phase 1 recomputes against the
unchanged index (window now ends at the post-cut version), phase 2 skips
on its epoch guard, phase 3 commits. Correctness of the affected-doc
restriction: a document's covered-position set changes only through (i)
its own text changing [touched] or (ii) some gram it holds crossing
docfreq 1→2 [it is that gram's solo holder]; a rise 2→3 changes nothing
(already duplicated) and a fall only shrinks coverage, which a
monotone-removal stage never acts on. The pytest gate runs the full pass
afterwards and asserts it finds NOTHING the incremental pass missed.
"""

from __future__ import annotations

import time

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tapdata_connectors_spark.lake.delta import append_delta
from tapdata_connectors_spark.lake.merge import BROADCAST_KEY_BYTES
from tapdata_connectors_spark.lake.table import LakeTable
from tapdata_connectors_spark.operators import corpus
from tapdata_connectors_spark.operators.dedup import ColumnSpec
from tapdata_connectors_spark.schema import TOMBSTONE_COL

_WM_PREFIX = "gramidx_src_v:"
# hash-format stamp (r6, advisor item): the index key changed from
# md5_slice(gram, 15) to gram_hash (xxhash64) in r5 — refreshing an index
# built under the OTHER hash computes deltas whose keys never match the
# stored rows, so counts silently rebuild from the delta window alone and
# cut_spans_incremental under-detects. The format rides the manifest's
# applied-epochs set (atomic with every commit); refresh/cut refuse to
# touch an index stamped with a different format.
_FMT_PREFIX = "gramidx_hash:"
_HASH_FORMAT = "xxhash64"

_PAYLOAD = [
    ColumnSpec("warc_ts", "timestamp"),
    ColumnSpec("n_docs", "bigint"),
    ColumnSpec("solo_doc", "string"),
]


def create_gram_index(spark: SparkSession, path: str,
                      n_buckets: int = 16) -> LakeTable:
    """The gram-index side table: one row per distinct word n-gram hash
    in the live corpus. `warc_ts` is the MOR ordering column (lake
    contract) and doubles as provenance: timestamp_seconds(source
    version) of the refresh that last wrote the row. Size n_buckets for
    the corpus (distinct grams ≈ total tokens / duplication factor);
    refresh cost is O(delta + touched-bucket probe) regardless."""
    idx = LakeTable.create(
        spark, path,
        [("gh", "bigint"), ("warc_ts", "timestamp"),
         ("n_docs", "bigint"), ("solo_doc", "string")],
        key="gh", n_buckets=n_buckets,
    )
    idx.commit_files([], epoch_key=f"{_FMT_PREFIX}{_HASH_FORMAT}",
                     summary={"op": "gramidx_create",
                              "hash_format": _HASH_FORMAT})
    return idx


def _check_hash_format(idx: LakeTable) -> None:
    """Refuse to fold deltas into an index keyed under a different gram
    hash (see _FMT_PREFIX). An unstamped index that is still EMPTY (no
    data, watermark 0 — e.g. created by a pre-stamp build that never
    refreshed) is stamped in place; an unstamped index with content is
    ambiguous and must be rebuilt."""
    m = idx.manifest()
    fmts = [k[len(_FMT_PREFIX):] for k in m.applied_epochs
            if k.startswith(_FMT_PREFIX)]
    if fmts:
        if any(f != _HASH_FORMAT for f in fmts):
            raise ValueError(
                f"gram index at {idx.path} was built with hash format "
                f"{fmts!r}; this build uses {_HASH_FORMAT!r} — deltas would "
                "never match the stored keys. Rebuild the index "
                "(create_gram_index + full refresh).")
        return
    if not m.files and gramidx_watermark(idx) == 0:
        idx.commit_files([], epoch_key=f"{_FMT_PREFIX}{_HASH_FORMAT}",
                         summary={"op": "gramidx_stamp",
                                  "hash_format": _HASH_FORMAT})
        return
    raise ValueError(
        f"gram index at {idx.path} predates the hash-format stamp and "
        "already holds rows; its key format is unknown — rebuild it "
        "(create_gram_index + full refresh).")


def gramidx_watermark(idx: LakeTable) -> int:
    """Highest source version already folded into the index (0 = empty —
    the initial build is just a refresh from version 0)."""
    return max(
        (int(k[len(_WM_PREFIX):]) for k in idx.manifest().applied_epochs
         if k.startswith(_WM_PREFIX)),
        default=0,
    )


def _membership_deltas(pipe, t, n: int, since: int, to: int,
                       cache_registry: list) -> DataFrame | None:
    """Per-gram adjustments from the corpus CDF window: (gh, _dn,
    _min_adder) where _dn = net change in distinct-document frequency and
    _min_adder = min doc that GAINED the gram (solo bookkeeping). Rows
    with _dn == 0 survive when a holder swapped (1-doc grams change
    holder at constant count). Returns a persisted frame or None when
    the window moved no gram memberships."""
    from tapdata_connectors_spark.streaming.driver import _TEXT_FIELD_ID

    key = t.manifest().key
    text_name = pipe._current_name_of(_TEXT_FIELD_ID) or "text"
    ch = t.read_changes(since, to, preimages=True)
    sign = (
        F.when(F.col("_change_type").isin("insert", "update_postimage"),
               F.lit(1))
        .when(F.col("_change_type").isin("delete", "update_preimage"),
              F.lit(-1))
    )
    mem = (
        ch.filter(F.col(text_name).isNotNull())
        .select(
            F.col(key).alias("_doc"), sign.alias("_s"),
            F.explode(F.array_distinct(
                corpus.word_ngrams(F.col(text_name), n))).alias("_gram"),
        )
        .select("_doc", "_s", corpus.gram_hash(F.col("_gram")).alias("gh"))
    )
    adj = (
        mem.groupBy("gh", "_doc").agg(F.sum("_s").alias("_dm"))
        .filter(F.col("_dm") != 0)
        .groupBy("gh")
        .agg(
            F.sum("_dm").cast("bigint").alias("_dn"),
            F.min(F.when(F.col("_dm") > 0, F.col("_doc"))).alias("_min_adder"),
        )
    )
    adj = adj.persist(StorageLevel.MEMORY_AND_DISK)
    cache_registry.append(adj)
    if adj.head(1):
        return adj
    return None


def _stored_gram_state(idx: LakeTable, ghs: DataFrame) -> DataFrame:
    """(gh, _n_old, _solo_old) for the index rows in the buckets `ghs`
    touches — a bucket-pruned, column-pruned read (never the full index).
    The caller joins it to the adjusted grams; unmatched grams read as
    n_old = 0 through the left join's nulls."""
    m = idx.manifest()
    if not m.files:
        return idx.spark.createDataFrame(
            [], "gh bigint, _n_old bigint, _solo_old string")
    buckets = sorted(
        r[0] for r in ghs.select(idx.bucket_expr("gh")).distinct().collect()
    )
    return (
        idx.read_raw(buckets=buckets)
        .filter(~F.col(TOMBSTONE_COL))
        .select(F.col("gh"), F.col("n_docs").alias("_n_old"),
                F.col("solo_doc").alias("_solo_old"))
    )


def _merge_adjustments(adj: DataFrame, stored: DataFrame,
                       broadcast_adj: bool) -> DataFrame:
    """Overlay pending adjustments on stored state: (gh, _n_old, _n_new,
    _solo_old, _solo_new). solo bookkeeping is exact for inserts
    (0→1: the single adder) and swaps (1→1 at constant count: the adder —
    the remover was necessarily the old holder); a decrement ≥2→1 yields
    NULL (unknown holder, see module docstring).

    Join shape: a left-outer join cannot broadcast its PRESERVED side, so
    a delta-sized `adj` against the bucket-pruned index read is split
    into broadcast-INNER hits (the stored scan streams map-side, never
    shuffles) plus an anti-joined never-seen remainder — the same
    broadcast-winners trick operators/dedup.py uses. Large deltas fall
    back to the plain shuffled left join (both sides are delta-class
    there anyway)."""
    if broadcast_adj:
        hit = stored.join(F.broadcast(adj), "gh")
        miss = (
            adj.join(F.broadcast(hit.select("gh")), "gh", "left_anti")
            .withColumn("_n_old", F.lit(None).cast("bigint"))
            .withColumn("_solo_old", F.lit(None).cast("string"))
        )
        j = hit.unionByName(miss, allowMissingColumns=False)
    else:
        j = adj.join(stored, "gh", "left")
    n_old = F.coalesce(F.col("_n_old"), F.lit(0))
    n_new = n_old + F.col("_dn")
    solo_new = F.when(
        n_new == 1,
        F.when(n_old <= 1, F.col("_min_adder"))
        .otherwise(F.lit(None).cast("string")),
    )
    return j.select(
        "gh",
        n_old.alias("_n_old"),
        n_new.alias("_n_new"),
        F.col("_solo_old"),
        solo_new.alias("_solo_new"),
    )


def refresh_gram_index(pipe, idx: LakeTable, n: int = 5,
                       to_version: int | None = None) -> dict:
    """Fold corpus changes since the stored watermark into the index.
    The initial build is this same call on a fresh index (watermark 0 →
    the whole live corpus arrives as CDF inserts). Exactly-once per
    (since → to) via the applied-epochs guard; MOR delta append, so the
    write is O(adjusted grams); compaction piggybacks on the pipeline's
    compact_every threshold."""
    t0 = time.time()
    _check_hash_format(idx)
    t = pipe.init_table()
    to = t.current_version() if to_version is None else to_version
    since = gramidx_watermark(idx)
    if to <= since:
        return {"since": since, "to": to, "skipped": True}
    wm_key = f"{_WM_PREFIX}{to}"
    if idx.epoch_applied(wm_key):
        return {"since": since, "to": to, "skipped": True}

    caches: list = []
    try:
        adj = _membership_deltas(pipe, t, n, since, to, caches)
        if adj is None:
            # advance the watermark with an empty commit so the next
            # refresh's window starts at `to`
            idx.commit_files([], epoch_key=wm_key,
                             summary={"op": "gramidx_refresh", "since": since,
                                      "to": to, "adjusted": 0})
            return {"since": since, "to": to, "adjusted_grams": 0,
                    "skipped": False}
        stats = adj.agg(F.count(F.lit(1)).alias("c")).collect()[0]
        broadcast_adj = stats["c"] * 64 <= BROADCAST_KEY_BYTES
        merged = _merge_adjustments(adj, _stored_gram_state(idx, adj),
                                    broadcast_adj)
        # consumed twice (append + unknown-solo count): pin it
        merged = merged.persist(StorageLevel.MEMORY_AND_DISK)
        caches.append(merged)
        ts = F.timestamp_seconds(F.lit(to))
        out = merged.select(
            F.col("gh"),
            F.when(F.col("_n_new") <= 0, F.lit("D")).otherwise(F.lit("I"))
            .alias("_final_op"),
            F.lit(to).cast("long").alias("_final_seq"),
            ts.alias("_final_ts"),
            F.lit(None).cast("long").alias("_del_seq"),
            F.lit(None).cast("timestamp").alias("_del_ts"),
            ts.alias("warc_ts"),
            F.lit(True).alias("__set_warc_ts"),
            F.col("_n_new").alias("n_docs"),
            F.lit(True).alias("__set_n_docs"),
            F.col("_solo_new").alias("solo_doc"),
            F.lit(True).alias("__set_solo_doc"),
        ).withColumn("_mb", idx.bucket_expr("gh"))
        unknown = merged.filter(
            (F.col("_n_new") == 1) & (F.col("_solo_new").isNull())
        ).count()
        append_delta(idx, out, _PAYLOAD, epoch_key=wm_key)
        counts = idx.delta_file_counts()
        if counts and max(counts.values()) >= pipe.compact_every:
            idx.compact(min_deltas=pipe.compact_every)
        return {"since": since, "to": to,
                "adjusted_grams": int(stats["c"]), "unknown_solo": unknown,
                "skipped": False,
                "wall_ms": int((time.time() - t0) * 1000)}
    finally:
        for c in caches:
            c.unpersist(blocking=True)


def cut_spans_incremental(pipe, idx: LakeTable, n: int = 5,
                          min_span: int = 10, tag: str = "0",
                          dry_run: bool = False) -> dict:
    """Incremental exact-substring cut: rewrite only the documents whose
    duplicated-span structure could have changed since the index's
    watermark (see module docstring for the three-phase protocol and the
    affected-doc completeness argument). `n` must match the index's
    build-time gram width — the stage trusts the caller on this the same
    way the embedding probe trusts EMBED_N_PLANES."""
    from tapdata_connectors_spark.streaming.curation import (
        _apply_cut_rewrites,
    )
    from tapdata_connectors_spark.streaming.driver import _TEXT_FIELD_ID

    t0 = time.time()
    _check_hash_format(idx)
    t = pipe.init_table()
    key = t.manifest().key
    text_name = pipe._current_name_of(_TEXT_FIELD_ID) or "text"
    epoch_key = f"curation:cutspansinc:{tag}"
    to = t.current_version()
    since = gramidx_watermark(idx)

    caches: list = []
    try:
        # ---- phase 1: window delta + affected docs + probe (no writes)
        adj = (None if to <= since else
               _membership_deltas(pipe, t, n, since, to, caches))
        if adj is None:
            # no gram membership moved in the window — still advance the
            # index watermark (refresh empty-commits), THEN honor the cut
            # guard: a resume after a crash between cut and refresh lands
            # here when the cut's rewrites carried no n-grams
            fold = refresh_gram_index(pipe, idx, n)
            if t.epoch_applied(epoch_key):
                return {"skipped": True, "epoch_key": epoch_key,
                        "n_rewrites": 0, "gramidx": fold}
            empty = pipe.spark.createDataFrame(
                [], f"{key} string, _cleaned string").persist()
            caches.append(empty)
            rep = _apply_cut_rewrites(
                pipe, t, empty, epoch_key,
                {"op": "cut_spans_incremental", "n": n,
                 "min_span": min_span, "since": since}, dry_run, t0)
            rep["gramidx"] = fold
            return rep

        stats = adj.agg(F.count(F.lit(1)).alias("c")).collect()[0]
        broadcast_adj = stats["c"] * 64 <= BROADCAST_KEY_BYTES
        merged = _merge_adjustments(adj, _stored_gram_state(idx, adj),
                                    broadcast_adj)
        merged = merged.persist(StorageLevel.MEMORY_AND_DISK)
        caches.append(merged)

        # affected docs: touched live docs ∪ solo holders of 1→2 crossings
        ch = t.read_changes(since, to)
        touched = ch.filter(F.col("_change_type") != "delete").select(key)
        crossings = merged.filter(
            (F.col("_n_old") == 1) & (F.col("_n_new") >= 2))
        unknown_crossings = crossings.filter(
            F.col("_solo_old").isNull()).count()
        holders = crossings.filter(F.col("_solo_old").isNotNull()).select(
            F.col("_solo_old").alias(key))
        affected = touched.unionByName(holders).distinct()
        affected = affected.persist(StorageLevel.MEMORY_AND_DISK)
        caches.append(affected)
        a_stats = affected.agg(
            F.count(F.lit(1)).alias("c"), F.sum(F.length(key)).alias("b")
        ).collect()[0]
        flag = affected
        if (a_stats["b"] or 0) <= BROADCAST_KEY_BYTES:
            flag = F.broadcast(flag)
        # bucket-pruned read: affected keys hash to a bounded bucket set,
        # so the corpus scan opens only those buckets' files
        a_buckets = sorted(
            r[0] for r in
            affected.select(t.bucket_expr(key)).distinct().collect()
        )
        docs = (
            t.read_raw(buckets=a_buckets)
            .filter(~F.col(TOMBSTONE_COL) & F.col(text_name).isNotNull())
            .join(flag, key, "left_semi")
        )

        # effective docfreq at `to`: stored index overlaid by pending
        # adjustments, probed for exactly the affected docs' grams
        ag = corpus.positional_grams(docs, n, id_col=key, text_col=text_name)
        ag = ag.persist(StorageLevel.MEMORY_AND_DISK)
        caches.append(ag)
        ghs = ag.filter(F.col("gh").isNotNull()).select("gh").distinct()
        stored_a = _stored_gram_state(idx, ghs)
        overlay = merged.select("gh", "_n_new")
        if broadcast_adj:
            overlay = F.broadcast(overlay)
        dup_gh = (
            ghs.join(overlay, "gh", "left")
            .join(stored_a, "gh", "left")
            .filter(F.coalesce(F.col("_n_new"), F.col("_n_old"), F.lit(0)) > 1)
            .select("gh")
        )
        cut = corpus.exact_substring_cut_probed(
            docs, dup_gh, n=n, min_span=min_span, id_col=key,
            text_col=text_name, grams=ag)
        rw = (
            cut.filter(F.col("n_tokens_cut") > 0)
            .select(F.col("doc_id").alias(key),
                    F.col("cleaned").alias("_cleaned"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        caches.append(rw)

        # ---- phase 2: cut commit (idempotent per tag — checked HERE, not
        # at entry, so a crash between cut and index refresh resumes into
        # phase 3 instead of re-applying the rewrite)
        if t.epoch_applied(epoch_key):
            rep = {"skipped": True, "n_rewrites": 0, "epoch_key": epoch_key}
        else:
            rep = _apply_cut_rewrites(
                pipe, t, rw, epoch_key,
                {"op": "cut_spans_incremental", "n": n,
                 "min_span": min_span, "since": since}, dry_run, t0)

        # ---- phase 3: fold since → current (includes the cut's changes)
        if not dry_run:
            rep["gramidx"] = refresh_gram_index(pipe, idx, n)
        rep["affected_docs"] = int(a_stats["c"])
        rep["unknown_holder_crossings"] = unknown_crossings
        return rep
    finally:
        for c in caches:
            c.unpersist(blocking=True)

"""Lake-level corpus curation: dedup as a pipeline stage over `pages`.

Promotes the corpus operators (operators/corpus.py) from standalone
registry queries into engine stages over the lake table (VERDICT r1
"Next round" #6): duplicates are found on the CURRENT resolved table
state, and the losers are tombstoned through a compaction-style commit.

Why a commit, not synthetic CDC events: curation is out-of-band with the
source log, so any event_seq it invented could collide with (or wrongly
outrank) real future source positions. Instead each loser row is
tombstoned AT ITS OWN stored (warc_ts, _seq) — the rewrite replaces the
touched buckets' base+delta files exactly like the MOR compactor, so:

- a redelivered OLD event for a deduped url stays stale (its (ts, seq) ≤
  the tombstone's) — exactly-once holds through curation;
- a genuinely NEW source event (newer ts / higher seq) resurrects the
  page — last-writer-wins by source order is preserved;
- the commit is idempotent per epoch_key (applied_epochs guard), emits
  per-partition lineage rows (epoch = CURATION_EPOCH), and is atomic via
  the ordinary manifest CAS.

Scale: the exact scan is one shuffle on the content digest; minhash is
the two-phase LSH candidate → exact-Jaccard verify shape with ONE
tokenize+hash pass (corpus.near_dup_losers); simhash is the banded
Hamming near-dup with pigeonhole-exact recall
(corpus.simhash_dup_losers); the rewrite is ∝ the touched buckets,
never the whole table.
"""

from __future__ import annotations

import time

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tapdata_connectors_spark.lake.merge import BROADCAST_KEY_BYTES
from tapdata_connectors_spark.operators import corpus
from tapdata_connectors_spark.schema import TOMBSTONE_COL

# lineage epoch tag for curation commits — far above any source epoch
CURATION_EPOCH = 1 << 20


def find_dup_pages(pipe, method: str = "exact",
                   cfg: corpus.MinHashConfig | None = None,
                   closure: bool = False,
                   cache_registry: list | None = None) -> DataFrame:
    """(url, survivor_id) for every page that duplicates another page, on
    the current resolved table state. Pure query — no writes.
    closure=True (minhash/simhash) switches the near-dup survivorship
    policy from one-sweep min-neighbor to connected components over the
    verified dup edges (corpus.component_losers): every loser attributes
    to its component's surviving minimum key, so a chain a~b~c never
    attributes c to the already-dropped b. `cache_registry`: frames the
    corpus operators persist internally are appended for the caller to
    release (VERDICT r3 item 4)."""
    from tapdata_connectors_spark.streaming.driver import _TEXT_FIELD_ID

    t = pipe.init_table()
    key = t.manifest().key
    text_name = pipe._current_name_of(_TEXT_FIELD_ID) or "text"
    live = t.read_raw().filter(~F.col(TOMBSTONE_COL))
    if method == "exact":
        return corpus.exact_dup_losers(live, id_col=key, text_col=text_name)
    if method == "minhash":
        return corpus.near_dup_losers(
            live, cfg or corpus.MinHashConfig(), id_col=key,
            text_col=text_name, closure=closure, cache_registry=cache_registry,
        )
    if method == "simhash":
        return corpus.simhash_dup_losers(
            live, id_col=key, text_col=text_name, closure=closure,
            cache_registry=cache_registry,
        )
    raise ValueError(f"unknown dedup method {method!r} (exact|minhash|simhash)")


def dedup_pages(pipe, method: str = "exact",
                cfg: corpus.MinHashConfig | None = None,
                tag: str = "0", dry_run: bool = False,
                closure: bool = False) -> dict:
    """Find duplicate pages and tombstone the losers (min-key survivor;
    closure=True uses connected-components survivorship for the near-dup
    methods — see find_dup_pages).

    `tag` keys idempotence: re-running with the same (method, tag) is a
    no-op (epoch_key guard), so a crashed curation pass just re-runs.
    dry_run returns counts without committing. Every frame the corpus
    operators persist is released before return (cache_registry +
    finally), so a long-lived curation session holds no cached RDDs
    between passes.
    """
    t0 = time.time()
    t = pipe.init_table()
    epoch_key = f"curation:{method}:{tag}"
    if t.epoch_applied(epoch_key):
        return {"skipped": True, "epoch_key": epoch_key}

    caches: list = []
    losers = find_dup_pages(
        pipe, method, cfg, closure=closure, cache_registry=caches,
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        return _tombstone_losers(
            pipe, t, losers, epoch_key, dry_run, t0,
            summary={"op": "dedup_pages", "method": method},
        )
    finally:
        # blocking: a curation pass must leave NO cached partitions behind
        # (long-lived sessions run many passes; async removal races the
        # next pass's memory demand)
        losers.unpersist(blocking=True)
        for c in caches:
            c.unpersist(blocking=True)


def _tombstone_losers(pipe, t, losers: DataFrame, epoch_key: str,
                      dry_run: bool, t0: float, summary: dict) -> dict:
    """Shared curation commit: tombstone every row of `losers` (a frame
    holding the table key column) at its own stored (ts, seq) via a
    compaction-style rewrite of the touched buckets. Idempotence,
    atomicity, and lineage semantics as documented in the module
    docstring; callers own persisting/releasing `losers`."""
    key = t.manifest().key
    # one job: touched buckets + loser count + key bytes (broadcast sizing)
    per_b = (
        losers.groupBy(t.bucket_expr(key).alias("b"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.length(key)).alias("kb"))
        .collect()
    )
    touched = sorted(r["b"] for r in per_b)
    n_losers = sum(r["n"] for r in per_b)
    key_bytes = sum(r["kb"] or 0 for r in per_b)
    if dry_run or not touched:
        return {"n_losers": n_losers, "touched_buckets": touched,
                "dry_run": dry_run, "epoch_key": epoch_key,
                "version": t.current_version()}

    # pin ONE manifest snapshot (same rule as compact): the replaced
    # file set and the resolved rows must come from the same version
    pinned = t.current_version()
    snap = t.manifest(pinned)
    tset = set(touched)
    consumed = {f["path"] for f in snap.files if f["bucket"] in tset}
    resolved = t.read_raw(version=pinned, buckets=touched).withColumn(
        "_mb", t.bucket_expr()
    )
    lkeys = losers.select(F.col(key), F.lit(True).alias("_is_loser"))
    if key_bytes <= BROADCAST_KEY_BYTES:
        lkeys = F.broadcast(lkeys)
    flipped = (
        resolved.join(lkeys, key, "left")
        .withColumn(
            TOMBSTONE_COL,
            F.col(TOMBSTONE_COL) | F.coalesce(F.col("_is_loser"), F.lit(False)),
        )
        .drop("_is_loser")
    )
    entries = t.write_data_files(flipped, "_mb")
    version = t.commit_files(
        entries,
        replaced_paths=consumed,
        epoch_key=epoch_key,
        summary={**summary, "n_losers": n_losers},
    )
    wall_ms = int((time.time() - t0) * 1000)
    # per-partition lineage rows: curation deletes under CURATION_EPOCH
    for r in per_b:
        pipe._lineage_rows.append((
            CURATION_EPOCH, 0, int(r["b"]), None, None, int(r["n"]),
            0, 0, int(r["n"]), 0, 0, 0, 0, int(r["n"]), wall_ms,
        ))
    pipe.flush_lineage()
    return {"n_losers": n_losers, "touched_buckets": touched,
            "version": version, "epoch_key": epoch_key, "wall_ms": wall_ms}


def find_low_quality_pages(pipe, policy: dict | None = None) -> DataFrame:
    """(url,) for every live page failing the Gopher-style composite
    quality gate (operators/corpus.gopher_quality) on the current
    resolved table state. Pure query — no writes. `policy` overrides the
    gate's keyword thresholds (min_words, mean_len_x100, ...)."""
    from tapdata_connectors_spark.streaming.driver import _TEXT_FIELD_ID

    t = pipe.init_table()
    key = t.manifest().key
    text_name = pipe._current_name_of(_TEXT_FIELD_ID) or "text"
    live = t.read_raw().filter(~F.col(TOMBSTONE_COL))
    q = corpus.gopher_quality(live, id_col=key, text_col=text_name,
                              **(policy or {}))
    return q.filter(~F.col("keep")).select(F.col("doc_id").alias(key))


def prune_pages(pipe, policy: dict | None = None, tag: str = "0",
                dry_run: bool = False) -> dict:
    """Quality-filter curation stage: tombstone every live page failing
    the Gopher gate, through the same compaction-style commit as
    dedup_pages — idempotent per tag (epoch_key guard), atomic via the
    manifest CAS, lineage rows under CURATION_EPOCH, and last-writer-wins
    preserved (a genuinely newer source event resurrects a pruned url;
    an old redelivery stays stale). The gate itself is map-only, so the
    find phase is one scan of the live buckets."""
    t0 = time.time()
    t = pipe.init_table()
    epoch_key = f"curation:quality:{tag}"
    if t.epoch_applied(epoch_key):
        return {"skipped": True, "epoch_key": epoch_key}

    losers = find_low_quality_pages(pipe, policy).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        return _tombstone_losers(
            pipe, t, losers, epoch_key, dry_run, t0,
            summary={"op": "prune_pages"},
        )
    finally:
        losers.unpersist(blocking=True)

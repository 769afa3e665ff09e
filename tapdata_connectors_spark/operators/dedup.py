"""Last-writer-wins per-key fold of a CDC micro-batch.

Collapses all DML events of one batch to a single row per primary key, in a
SINGLE shuffle (one groupBy; every fold is an order-aware aggregate built
from `max_by` over the total LWW order `(warc_ts, event_seq)` — the north
rule's dedup key). No window sort, no Python.

Semantics reproduced from the reference (observable behavior, not code):

- Events apply in source order per key; a later write to the same PK
  overwrites the earlier one (`INSERT ... ON DUPLICATE KEY UPDATE
  c=VALUES(c)` — reference MysqlWriteRecorder.java:60-65; ClickHouse
  ReplacingMergeTree is the same LWW shape, ClickhouseConnector.java:273).
- Inserts carry a full row image: an insert applied over an existing row
  resets every column to the insert's values.
- Updates carry a partial after-image: a null column means "unchanged"
  (partial-update elision, reference DbKit.java:177-202); setting a column
  to NULL explicitly is expressed via `removed_fields` (Mongo
  removedFields — MongodbV4StreamReader.java:317-335).
- Duplicate deliveries (same exactly_once_id, identical event) are
  neutralized for free: identical rows cannot change a max_by outcome
  (reference dedups via exactlyOnceId — MysqlReader.java:851-854); the
  distinct-id count still feeds the lineage metric n_dupes_dropped.
- A delete resets the row: values set before the latest delete never leak
  into a state materialized after it.

Output per key:
  <key>, _final_seq, _final_ts, _final_op ('I'|'U'|'D'),
  one value column per payload column (current names),
  one `__set_<col>` boolean per payload column (false = "leave target
  value unchanged" for updates),
  _n_events, _n_i, _n_u, _n_d  (lineage inputs).

`_final_op` distinguishes insert-vs-update for write policies: it is 'I'
iff an insert occurred at-or-after the latest delete (the row is being
(re)created), 'D' iff the latest event is a delete, else 'U'.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tapdata_connectors_spark.lake.table import type_of


@dataclass(frozen=True)
class ColumnSpec:
    """One payload column as seen by the fold.

    source = 'image'  -> lives in the typed after/before structs
    source = 'extras' -> added by DDL after the staging schema was fixed;
                         delivered as strings in the `extras` map (how a
                         binlog carries columns unknown to the consumer)

    `name` is the column's CURRENT logical name (post-renames);
    `field_ref` is the physical accessor — the fixed field name inside the
    staging `after` struct for image columns (renames are logical-only),
    or the extras-map key (events use the name current at their log
    position; the DDL barrier guarantees the map key equals `name` for
    every event folded under this spec).
    """

    name: str
    type: str  # spark simpleString
    source: str = "image"  # 'image' | 'extras'
    field_ref: str | None = None

    @property
    def ref(self) -> str:
        return self.field_ref or self.name


ORD = "_ord"  # struct(warc_ts, event_seq): the total LWW order


def _ord_col() -> F.Column:
    return F.struct(
        F.col("warc_ts").alias("ts"), F.col("event_seq").alias("seq")
    )


def event_col_exprs(c: ColumnSpec) -> tuple[F.Column, F.Column]:
    """(is_set, value) expressions for one payload column of a raw event row
    — the shared convention of the fold and the sequential resolver:
    insert = full image (every column set, possibly to null); update sets
    mentioned columns; removed_fields is an explicit set-to-null."""
    removed = F.array_contains(F.coalesce(F.col("removed_fields"), F.array()), c.name)
    ty = type_of(c.type)
    if c.source == "image":
        raw_val = F.col(f"after.{c.ref}").cast(ty)
        mentioned = F.col(f"after.{c.ref}").isNotNull() | removed
    else:
        raw_val = F.element_at(F.col("extras"), c.ref).cast(ty)
        mentioned = (
            F.coalesce(F.map_contains_key(F.col("extras"), c.ref), F.lit(False))
            | removed
        )
    is_set = (F.col("op") == "I") | ((F.col("op") == "U") & mentioned)
    val = F.when(removed, F.lit(None).cast(ty)).otherwise(raw_val)
    return is_set, val


def lww_fold_singleagg(events: DataFrame, payload: list[ColumnSpec], key: str = "url") -> DataFrame:
    """Single-aggregation fold (reference implementation). Exact, but
    Spark plans varlen max_by buffers as SortAggregate — partitions sort
    full payload rows. `lww_fold` (two-phase) is the production path;
    this stays as the semantic reference and A/B fallback."""
    ev = events.withColumn(ORD, _ord_col())

    aggs: list[F.Column] = [
        F.max("event_seq").alias("_final_seq"),
        F.min("event_seq").alias("_min_seq"),
        # approximate duplicate-delivery count (HLL is algebraic, so it
        # keeps map-side partial agg; exact distinct would re-skew hot keys)
        (
            F.count(F.lit(1)) - F.approx_count_distinct("event_seq")
        ).alias("_n_dupes_approx"),
        F.max_by("warc_ts", F.col(ORD)).alias("_final_ts"),
        F.max_by("op", F.col(ORD)).alias("_last_op"),
        F.max(F.when(F.col("op") == "D", F.col(ORD))).alias("_last_del"),
        F.max(F.when(F.col("op") == "I", F.col(ORD))).alias("_last_ins"),
        F.count(F.lit(1)).alias("_n_events"),
        # NOTE: no count_distinct here — every aggregate in this fold is
        # algebraic so Spark's map-side partial aggregation absorbs hot-key
        # skew (a Zipf-hot url contributes one partial row per map task,
        # not one row per event). Duplicate-delivery counting (which needs
        # a distinct) happens once per batch in the lineage step instead.
        F.sum((F.col("op") == "I").cast("long")).alias("_n_i"),
        F.sum((F.col("op") == "U").cast("long")).alias("_n_u"),
        F.sum((F.col("op") == "D").cast("long")).alias("_n_d"),
    ]

    for c in payload:
        is_set, val = event_col_exprs(c)
        aggs.append(
            F.max_by(
                F.struct(F.col(ORD).alias("o"), val.alias("v")),
                F.when(is_set, F.col(ORD)),
            ).alias(f"_p_{c.name}")
        )

    g = ev.groupBy(key).agg(*aggs)

    # a column's fold is live only if it was last set at-or-after the
    # latest delete (delete resets the row)
    sel: list[F.Column] = [
        F.col(key),
        F.col("_final_seq"),
        F.col("_min_seq"),
        F.col("_n_dupes_approx"),
        F.col("_final_ts"),
        F.when(F.col("_last_op") == "D", F.lit("D"))
        .when(
            F.col("_last_ins").isNotNull()
            & (F.col("_last_del").isNull() | (F.col("_last_ins") >= F.col("_last_del"))),
            F.lit("I"),
        )
        # delete followed ONLY by updates: sequential semantics = the delete
        # applies, then updates hit a missing row (policy decides: default
        # drops them; insert_on_nonexists turns them into a fresh insert).
        # Folding this to plain 'U' would wrongly keep the target row alive.
        .when(F.col("_last_del").isNotNull(), F.lit("DU"))
        .otherwise(F.lit("U"))
        .alias("_final_op"),
        F.col("_last_del")["seq"].alias("_del_seq"),
        F.col("_last_del")["ts"].alias("_del_ts"),
        F.col("_n_events"),
        F.col("_n_i"),
        F.col("_n_u"),
        F.col("_n_d"),
    ]
    for c in payload:
        p = F.col(f"_p_{c.name}")
        live = p.isNotNull() & (
            F.col("_last_del").isNull() | (p["o"] >= F.col("_last_del"))
        )
        sel.append(F.when(live, p["v"]).otherwise(F.lit(None).cast(type_of(c.type))).alias(c.name))
        sel.append(live.alias(f"__set_{c.name}"))
    return g.select(*sel)


_FIXED_WIDTH = {"int", "bigint", "smallint", "float", "double", "boolean",
                "timestamp", "date"}


def lww_fold(
    events: DataFrame,
    payload: list[ColumnSpec],
    key: str = "url",
    seq_is_lww_order: bool = True,
    broadcast_winners: bool = False,
    cache_registry: list | None = None,
) -> DataFrame:
    """Two-phase fold: hash-aggregated winners + sort-free payload fetch.

    Phase A aggregates ONLY fixed-width expressions (winner sequence per
    column, final/delete/insert sequences, op code, counters) — every
    buffer is primitive, so Spark plans a true HashAggregate: map-side
    partial combine, no partition sort, and variable-width payload bytes
    never enter an aggregation buffer.

    Phase B fetches each variable-width column's winning value by joining
    the events back on (key, seq == winning seq) — an equi-join on a
    composite key that is unique per side (skew-free even for Zipf-hot
    keys) and hash-joinable (no sort). Payload bytes move through the
    shuffle exactly once.

    Ordering note: phase A orders by `event_seq` alone. The staging
    contract (sources/generator.py) requires `warc_ts` non-decreasing in
    `event_seq` — the version timestamp follows log position, as in a
    binlog — which makes seq-order identical to the north rule's
    lexicographic (warc_ts, event_seq) order (seq is unique).

    Output schema and semantics are identical to `lww_fold_singleagg`
    (the test suite asserts both against the sequential oracle).

    `seq_is_lww_order=False` declares that the source does NOT satisfy the
    contract (operators/ordering.py validates it for external changelogs);
    the fold then delegates to the (ts, seq)-ordered single-aggregation
    path, which is exact for arbitrary timestamp/position relationships.

    `broadcast_winners=True` replaces phase B's shuffled-hash joins with
    map-side broadcast joins: the skinny winner frame (keys + winning
    seqs, no payload bytes) broadcasts to the event scan, so the jumbo
    binary column's bytes cross ZERO exchanges inside the fold (they next
    move in the bucket-aligned write repartition — one exchange
    end-to-end instead of two). Use when keys-per-batch fits the driver
    (the same regime as lake/merge.py's bytes-based broadcast dispatch);
    the default shuffle path is the 10^10-events-per-trigger shape.
    Requires at most one binary payload column (the stream side of the
    final right-outer join); otherwise phase B falls back to the shuffle
    joins.

    `cache_registry`: the broadcast path persists the skinny winner frame
    (it feeds three plan branches); pass a list to receive the persisted
    frame and own its release after the consuming action — the
    near_dup_pairs hygiene contract. None leaves it cached for the
    session (fine for one-shot callers).
    """
    if not seq_is_lww_order:
        return lww_fold_singleagg(events, payload, key=key)
    op_code = (
        F.when(F.col("op") == "I", F.lit(1))
        .when(F.col("op") == "U", F.lit(2))
        .otherwise(F.lit(3))
    )

    heavy = [c for c in payload if c.type.lower() not in _FIXED_WIDTH]
    light = [c for c in payload if c.type.lower() in _FIXED_WIDTH]

    aggs: list[F.Column] = [
        F.max("event_seq").alias("_final_seq"),
        F.min("event_seq").alias("_min_seq"),
        F.max_by(F.col("warc_ts"), F.col("event_seq")).alias("_final_ts"),
        F.max_by(op_code, F.col("event_seq")).alias("_last_op_code"),
        F.max(F.when(F.col("op") == "D", F.col("event_seq"))).alias("_del_seq"),
        F.max(F.when(F.col("op") == "D", F.col("warc_ts"))).alias("_del_ts"),
        F.max(F.when(F.col("op") == "I", F.col("event_seq"))).alias("_ins_seq"),
        F.count(F.lit(1)).alias("_n_events"),
        F.sum((F.col("op") == "I").cast("long")).alias("_n_i"),
        F.sum((F.col("op") == "U").cast("long")).alias("_n_u"),
        F.sum((F.col("op") == "D").cast("long")).alias("_n_d"),
    ]
    for c in payload:
        is_set, val = event_col_exprs(c)
        aggs.append(F.max(F.when(is_set, F.col("event_seq"))).alias(f"_w_{c.name}"))
        if c in light:
            aggs.append(
                F.max_by(val, F.when(is_set, F.col("event_seq"))).alias(f"_v_{c.name}")
            )
    winners = events.groupBy(key).agg(*aggs)

    # exact duplicate-delivery count per key, as a SEPARATE skinny
    # aggregate (r6, guide §2.3): count_distinct(event_seq) INSIDE the
    # main aggregation forced Spark's exact-distinct expansion — partials
    # re-keyed by (key, event_seq), which combines nothing (seq is
    # unique) and ships EVERY max_by buffer per event through the first
    # exchange (273 MB at 4M events vs 74 MB for the combined url-keyed
    # partials). Standalone, the pre-aggregate touches only the dup keys
    # and the keys-with-dups frame left-joining back is tiny, broadcast.
    # Values are identical: count(1) − count_distinct(seq) per key
    # ≡ Σ_(key,seq) (occurrences − 1).
    if broadcast_winners:
        # event_seq is globally unique per event, so duplicate (key, seq)
        # ⟺ duplicate seq: count per seq alone (two-long shuffle, no key
        # strings), broadcast the tiny dup-seq frame back onto a skinny
        # (key, seq) scan to attribute, dedupe the matched copies, sum.
        # The broadcast assumes dup seqs per trigger fit memory — the
        # same batch-bounded regime broadcast_winners already declares.
        seq_counts = (
            events.groupBy("event_seq").agg(F.count(F.lit(1)).alias("_c"))
            .filter(F.col("_c") > 1)
        )
        dup_counts = (
            events.select(F.col(key), "event_seq")
            .join(F.broadcast(seq_counts), "event_seq")
            .groupBy(key, "event_seq").agg(F.max("_c").alias("_c"))
            .groupBy(key).agg(F.sum(F.col("_c") - 1).alias("_ndup_nz"))
        )
    else:
        dup_counts = (
            events.groupBy(key, "event_seq").agg(F.count(F.lit(1)).alias("_c"))
            .filter(F.col("_c") > 1)
            .groupBy(key).agg(F.sum(F.col("_c") - 1).alias("_ndup_nz"))
        )
    winners = winners.join(F.broadcast(dup_counts), key, "left").withColumn(
        "_n_dupes_approx",
        F.coalesce(F.col("_ndup_nz"), F.lit(0).cast("long")),
    ).drop("_ndup_nz")
    if broadcast_winners:
        # the winner frame feeds the per-column wkeys broadcast subplans
        # AND the phase-B assembly; unpersisted, each subplan re-ran the
        # whole phase-A aggregation (r6)
        winners = winners.persist(StorageLevel.MEMORY_AND_DISK)
        if cache_registry is not None:
            cache_registry.append(winners)

    live = {}
    for c in payload:
        w = F.col(f"_w_{c.name}")
        live[c.name] = w.isNotNull() & (
            F.col("_del_seq").isNull() | (w >= F.col("_del_seq"))
        )

    # phase B: fetch each variable-width column's winning value, matching
    # exactly the winning event row (identical duplicate deliveries may
    # multiply rows; dup-key rows get a per-key dropDuplicates)
    out = winners
    jumbo = [c for c in heavy if c.type.lower() == "binary"]
    if broadcast_winners and len(jumbo) <= 1:
        # small-side broadcast plan: no payload bytes cross any exchange
        # inside the fold. Non-binary varlen columns (short strings) fetch
        # via an inner broadcast join whose RESULT is skinny and itself
        # broadcast back onto the winner frame; the single binary column
        # streams through a right-outer join against the broadcast winner
        # frame, so its bytes stay in the scan tasks.
        for c in heavy:
            if c in jumbo:
                continue
            is_set, val = event_col_exprs(c)
            wkeys = winners.select(
                F.col(key).alias(f"_k_{c.name}"),
                F.when(live[c.name], F.col(f"_w_{c.name}")).alias(f"_ws_{c.name}"),
            )
            matched = (
                events.filter(is_set)
                .join(
                    F.broadcast(wkeys),
                    (F.col(key) == F.col(f"_k_{c.name}"))
                    & (F.col("event_seq") == F.col(f"_ws_{c.name}")),
                )
                .select(F.col(f"_k_{c.name}"), val.alias(f"_v_{c.name}"))
                # duplicate deliveries of the winning event yield identical
                # rows here; collapse them on this SKINNY frame so the
                # broadcast-back left join never multiplies (r6 — the
                # result-level dedup union this replaces re-executed the
                # whole fold subtree per branch)
                .dropDuplicates([f"_k_{c.name}"])
            )
            out = out.join(
                F.broadcast(matched), F.col(key) == F.col(f"_k_{c.name}"), "left"
            ).drop(f"_k_{c.name}", f"_ws_{c.name}")
        if jumbo:
            # NOTE: Spark's BroadcastHashJoin cannot build the PRESERVED
            # side of an outer join (RightOuter supports BuildLeft only),
            # so a `stream RIGHT OUTER broadcast(winners)` plan silently
            # ignores the hint and either broadcasts the byte-heavy stream
            # or falls back to sort-merge. Instead: an INNER join with the
            # skinny winner frame as the broadcast build side (BuildRight —
            # supported), then union back the winners with no live binary
            # value. Binary bytes stay in the scan tasks; zero exchanges.
            #
            # r6: the skinny winner frame is PERSISTED — it feeds three
            # branches (clean-key build, dup-key build, unmatched) and,
            # unpersisted, the whole phase-A aggregation re-executed per
            # branch (4 full subtrees in the r5 physical plan). Keys are
            # pre-split on _n_dupes_approx BEFORE the payload join, so
            # the per-key dropDuplicates that collapses identical
            # duplicate deliveries sorts ONLY dup-key payload rows — the
            # r5 plan split AFTER the join and its full-width
            # SortAggregate + exchange carried every payload row.
            c = jumbo[0]
            is_set, val = event_col_exprs(c)
            out = out.persist(StorageLevel.MEMORY_AND_DISK)
            if cache_registry is not None:
                cache_registry.append(out)
            stream = events.filter(is_set).select(
                F.col(key).alias(f"_k_{c.name}"),
                F.col("event_seq").alias(f"_s_{c.name}"),
                val.alias(f"_v_{c.name}"),
            )
            live_c = live[c.name]

            def _match(build):
                return stream.join(
                    F.broadcast(build),
                    (F.col(f"_k_{c.name}") == F.col(key))
                    & (F.col(f"_s_{c.name}")
                       == F.when(live_c, F.col(f"_w_{c.name}"))),
                    "inner",
                ).drop(f"_k_{c.name}", f"_s_{c.name}")

            matched_clean = _match(out.filter(F.col("_n_dupes_approx") == 0))
            matched_dup = _match(
                out.filter(F.col("_n_dupes_approx") > 0)
            ).dropDuplicates([key])
            # keys whose binary fold is not live match nothing above (their
            # join seq is NULL); re-add them with a null value
            unmatched = out.filter(~F.coalesce(live_c, F.lit(False))).withColumn(
                f"_v_{c.name}", F.lit(None).cast(type_of(c.type))
            )
            out = matched_clean.unionByName(matched_dup).unionByName(unmatched)
    else:
        for c in heavy:
            is_set, val = event_col_exprs(c)
            vals = events.filter(is_set).select(
                F.col(key).alias(f"_k_{c.name}"),
                F.col("event_seq").alias(f"_s_{c.name}"),
                val.alias(f"_v_{c.name}"),
            )
            out = out.join(
                vals.hint("shuffle_hash"),
                (F.col(key) == F.col(f"_k_{c.name}"))
                & (F.col(f"_s_{c.name}") == F.when(live[c.name], F.col(f"_w_{c.name}"))),
                "left",
            ).drop(f"_k_{c.name}", f"_s_{c.name}")

    sel: list[F.Column] = [
        F.col(key),
        F.col("_final_seq"),
        F.col("_min_seq"),
        F.col("_n_dupes_approx"),
        F.col("_final_ts"),
        F.when(F.col("_last_op_code") == 3, F.lit("D"))
        .when(
            F.col("_ins_seq").isNotNull()
            & (F.col("_del_seq").isNull() | (F.col("_ins_seq") >= F.col("_del_seq"))),
            F.lit("I"),
        )
        .when(F.col("_del_seq").isNotNull(), F.lit("DU"))
        .otherwise(F.lit("U"))
        .alias("_final_op"),
        F.col("_del_seq"),
        F.col("_del_ts"),
        F.col("_n_events"),
        F.col("_n_i"),
        F.col("_n_u"),
        F.col("_n_d"),
    ]
    for c in payload:
        ty = type_of(c.type)
        sel.append(
            F.when(live[c.name], F.col(f"_v_{c.name}"))
            .otherwise(F.lit(None).cast(ty))
            .alias(c.name)
        )
        sel.append(live[c.name].alias(f"__set_{c.name}"))
    if broadcast_winners and len(jumbo) <= 1:
        # duplicate-delivery rows were already collapsed on the dup-key
        # branch before the union (see the jumbo block)
        return out.select(*sel)
    sel_with_dupflag = sel + [F.col("_n_dupes_approx").alias("__ndup")]
    result = out.select(*sel_with_dupflag)
    if heavy:
        # value join-backs multiply rows only for keys that actually had
        # duplicate deliveries (identical copies); dedupe just those keys
        # so the full-width distinct never touches the clean majority
        clean = result.filter(F.col("__ndup") == 0)
        dupd = result.filter(F.col("__ndup") > 0).dropDuplicates([key])
        result = clean.unionByName(dupd)
    return result.drop("__ndup")

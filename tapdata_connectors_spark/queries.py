"""Driver-contract query registry: every entry pairs a PySpark
implementation with a DuckDB-equivalent ANSI-SQL oracle over the same
parquet tables (tables: region nation customer supplier part orders
lineitem events documents embeddings).

Coverage maps to SURVEY.md §2 (the reference's operator inventory) plus the
training-data-pipeline operators. Column names are aliased identically on
both sides — the driver's correctness compare hashes values after sorting
columns by name.

Cross-engine determinism rules used throughout:
- hashing: `md5` is identical in both engines; a 32-bit slice is
  bigint-cast via Spark `conv(substring(md5(x),1,8),16,10)` ≡ DuckDB
  `('0x'||substr(md5(x),1,8))::BIGINT`.
- floats: where a sum's addition order could wobble the last bit, values
  are scaled to exact integers first (associative), so both engines
  aggregate identical integers in any order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from tapdata_connectors_spark.operators import corpus


def _t(spark: SparkSession, sf_dir: str, name: str,
       widen: bool = True) -> DataFrame:
    """Table loader with scale-adaptive scan widening (r6, guide §2.5
    "input skew"/§6): the sf parquet inputs are single files with 1-6 row
    groups, and a row group is unsplittable — so every map-heavy stage
    FUSED to the scan (tokenize→md5 explodes, mapInPandas codecs,
    percentile partials) ran on 1-2 of the 32 cores. When the scan comes
    out narrower than the session's core count, one cheap round-robin
    exchange of the raw rows (a few MB here) widens everything downstream;
    at real scale (thousands of row groups) the condition is false and
    this is a no-op. Filters still push into the scan: Catalyst moves
    deterministic predicates below Repartition.

    `widen=False` (r6, guide §2.3 "aggregate before you shuffle"): for
    REDUCE-ONLY queries — scan straight into an aggregation (or a
    pushed filter / TakeOrdered) with no expensive per-row map work —
    the widening exchange ships every raw row only for the partial
    aggregate to collapse them right after; letting the partial agg run
    inside the (narrow) scan stage and shuffling the combined partials
    is strictly less data movement. A/B at sf1.0 (1M events): LWW fold
    0.30 s narrow vs 0.56 s widened, epoch batching 0.26 vs 0.63. Keep
    the default for anything scan-fused map-heavy (tokenize/md5/codec)."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if not widen:
        return df
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par)
    return df


def _md5_slice(col):
    """32-bit bigint slice of md5 — Spark side of the shared hash."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


_MD5_SLICE_SQL = "('0x' || substr(md5({x}), 1, 8))::BIGINT"


# ---------------------------------------------------------------------------
# CDC / replication-semantics queries over the `events` changelog
# (event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type VARCHAR,
#  value DOUBLE, props VARCHAR).
# Op mapping for the driver tables: signup = insert, click/view/purchase =
# update, error = delete — the TapInsert/Update/DeleteRecordEvent triple.
# ---------------------------------------------------------------------------

def q_cdc_lww_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-writer-wins dedup per key (operators/dedup.py is the
    production fold; this is the registry/oracle entry for the same
    semantics). Reference analog: ON DUPLICATE KEY UPDATE last-write
    (MysqlWriteRecorder.java:60-65).

    r6 plan (guide §2.3 "aggregate before you shuffle"): max over
    struct(ts, event_id, payload) with map-side partial combine replaces
    the window/row_number formulation — the window shuffled EVERY event
    row to its key partition and sorted there; the aggregate ships one
    partial winner per (key, map task), so shuffle rows ∝ keys·tasks,
    not events. (ts, event_id) is a total order (event_id unique), so
    the lexicographic struct max picks exactly the rn=1 row and the
    payload fields never decide a comparison — row-identical output."""
    ev = _t(spark, sf_dir, "events", widen=False)
    s = F.max(F.struct("ts", "event_id", "event_type", "value")).alias("s")
    return (
        ev.groupBy("user_id").agg(s)
        .select(
            "user_id",
            F.col("s.event_id").alias("last_event_id"),
            F.col("s.ts").alias("last_ts"),
            F.col("s.event_type").alias("last_op"),
            F.col("s.value").alias("last_value"),
        )
    )


SQL_CDC_LWW_DEDUP = """
SELECT user_id,
       event_id AS last_event_id,
       ts AS last_ts,
       event_type AS last_op,
       value AS last_value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def q_cdc_apply_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized replica state after replaying the changelog with
    upsert+delete semantics: keys whose latest event is a delete ('error')
    vanish. MERGE WHEN MATCHED DELETE analog (lake/merge.py)."""
    return q_cdc_lww_dedup(spark, sf_dir).filter(F.col("last_op") != "error")


SQL_CDC_APPLY_UPSERT = SQL_CDC_LWW_DEDUP.replace(
    "WHERE rn = 1", "WHERE rn = 1 AND event_type <> 'error'"
)


def q_cdc_first_writer_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """insert policy ignore_on_exists (WritePolicyEnum.java:5, INSERT IGNORE
    MysqlWriteRecorder.java:67-81): first event per key wins."""
    ev = _t(spark, sf_dir, "events", widen=False)
    # min(struct) with map-side combine — same §2.3 shape as
    # q_cdc_lww_dedup, first (ts, event_id) instead of last
    s = F.min(F.struct("ts", "event_id", "event_type")).alias("s")
    return (
        ev.groupBy("user_id").agg(s)
        .select("user_id", F.col("s.event_id").alias("first_event_id"),
                F.col("s.event_type").alias("first_op"))
    )


SQL_CDC_FIRST_WRITER_WINS = """
SELECT user_id, event_id AS first_event_id, event_type AS first_op
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
  FROM events
) WHERE rn = 1
"""


def q_cdc_epoch_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Micro-batch grouping + per-epoch lineage counters — the
    TapEventCollector 1000-record batcher (TapEventCollector.java:24-25) and
    our lineage table (streaming/driver.py)."""
    ev = _t(spark, sf_dir, "events", widen=False)
    return (
        ev.withColumn("epoch", (F.col("event_id") / F.lit(200)).cast("long"))
        .groupBy("epoch")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("event_type") == "signup").cast("long")).alias("n_insert"),
            F.sum(F.col("event_type").isin("click", "view", "purchase").cast("long")).alias("n_update"),
            F.sum((F.col("event_type") == "error").cast("long")).alias("n_delete"),
            F.min("event_id").alias("offset_start"),
            F.max("event_id").alias("offset_end"),
        )
    )


SQL_CDC_EPOCH_BATCHING = """
SELECT CAST(floor(event_id / 200) AS BIGINT) AS epoch,
       count(*) AS n_events,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_insert,
       CAST(sum(CASE WHEN event_type IN ('click','view','purchase') THEN 1 ELSE 0 END) AS BIGINT) AS n_update,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_delete,
       min(event_id) AS offset_start,
       max(event_id) AS offset_end
FROM events GROUP BY 1
"""


def q_cdc_exactly_once_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redelivery accounting (exactlyOnceId dedup, MysqlReader.java:851-854):
    raw vs distinct delivery counts per op."""
    ev = _t(spark, sf_dir, "events", widen=False)
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.count_distinct("event_id").alias("n_unique"),
    )


SQL_CDC_EXACTLY_ONCE_COUNTS = """
SELECT event_type, count(*) AS n_raw, count(DISTINCT event_id) AS n_unique
FROM events GROUP BY event_type
"""


def q_delete_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-event before-image enrichment: each delete ('error') joined to
    the key's latest earlier non-delete event — the Mongo delete lookup
    cache (MongodbV4StreamReader.java:263-272, MongodbLookupUtil)."""
    ev = _t(spark, sf_dir, "events", widen=False)
    deletes = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("del_event_id"),
        F.col("user_id"),
        F.col("ts").alias("del_ts"),
    )
    prior = ev.filter(F.col("event_type") != "error").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("prior_event_id"),
        F.col("ts").alias("prior_ts"),
        F.col("value").alias("prior_value"),
    )
    # condition must live IN the left join (an after-filter would drop
    # deletes whose only priors are later ones, instead of null-extending)
    j = deletes.join(
        prior,
        (F.col("user_id") == F.col("p_user_id")) & (F.col("prior_ts") < F.col("del_ts")),
        "left",
    )
    # latest-prior via max(struct(ts, id, payload)) with map-side partial
    # combine: the equi-join fan-out is absorbed BEFORE the shuffle, which
    # then carries one row per (delete, mapper) — the r1 window(row_number)
    # version shuffled every fanned row into one partition per delete
    # (VERDICT r1 "Performance" #2). Struct max plans as a partial
    # SortAggregate (struct ordering has no hash buffer), but the sort is
    # per-map-task over local rows — parallel and combine-bounded.
    # (ts, event_id) lexicographic max ≡ ORDER BY ts DESC, event_id DESC;
    # event_id is unique so the payload never decides the order.
    best = F.max(
        F.struct(
            F.col("prior_ts"), F.col("prior_event_id"), F.col("prior_value")
        )
    ).alias("b")
    return (
        j.groupBy("del_event_id", "user_id")
        .agg(best)
        .select(
            "del_event_id", "user_id",
            F.col("b.prior_event_id").alias("prior_event_id"),
            F.col("b.prior_value").alias("prior_value"),
        )
    )


SQL_DELETE_ENRICHMENT = """
SELECT del_event_id, user_id, prior_event_id, prior_value
FROM (
  SELECT d.event_id AS del_event_id, d.user_id,
         p.event_id AS prior_event_id, p.value AS prior_value,
         row_number() OVER (PARTITION BY d.event_id
                            ORDER BY p.ts DESC, p.event_id DESC) AS rn
  FROM (SELECT * FROM events WHERE event_type = 'error') d
  LEFT JOIN (SELECT * FROM events WHERE event_type <> 'error') p
    ON d.user_id = p.user_id AND p.ts < d.ts
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Snapshot-read operators (SURVEY.md §2.1)
# ---------------------------------------------------------------------------

def q_snapshot_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-splitter boundary discovery: MIN/MAX/COUNT + piece count at
    maxRecordInPartition=500 (DatabaseReadPartitionSplitter.java:56-64,
    MysqlConnector.java:279-315 minMaxValue)."""
    o = _t(spark, sf_dir, "orders", widen=False)
    return o.agg(
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
        F.count(F.lit(1)).alias("n_rows"),
        F.ceil(F.count(F.lit(1)) / F.lit(500)).cast("long").alias("n_pieces"),
    )


SQL_SNAPSHOT_SPLIT_STATS = """
SELECT min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
       count(*) AS n_rows,
       CAST(ceil(count(*) / 500.0) AS BIGINT) AS n_pieces
FROM orders
"""


def q_snapshot_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-split parallel scan slice accounting — `WHERE mod(hash(pk),N)=i`
    (CommonDbConnector.java:612-674; CRC32 expr MysqlConnector.java:600-609),
    via the shared md5-slice hash, N=8 slices."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.withColumn("slice", F.pmod(_md5_slice(F.col("o_orderkey").cast("string")), F.lit(8)))
        .groupBy("slice")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.min("o_orderkey").alias("min_key"))
    )


SQL_SNAPSHOT_HASH_SPLIT = f"""
SELECT {_MD5_SLICE_SQL.format(x="CAST(o_orderkey AS VARCHAR)")} % 8 AS slice,
       count(*) AS n_rows, min(o_orderkey) AS min_key
FROM orders GROUP BY 1
"""


_PK_RANGE_FRACS = [i / 8.0 for i in range(1, 8)]


def _exact_quantile_bounds(df: DataFrame, key_col: str,
                           fracs: list[float]) -> list[int] | None:
    """floor() of the exact continuous quantiles of a numeric column,
    computed by DISTRIBUTED SELECTION instead of Spark's `percentile`
    aggregate (r6, guide §2/§5): the exact aggregate builds a value→count
    map of ALL distinct keys and merges it in ONE task — O(distinct)
    memory and the dominant cost of snapshot_pk_ranges (6-7 s at sf1.0
    for 1.5M keys regardless of scan width). Here the keys are
    range-partitioned (a parallel exchange), per-partition counts locate
    which partition holds each needed order statistic, and one more job
    sorts ONLY within those partitions to read the ranked values —
    per-task memory is a partition slice, never the key space.

    Value parity: quantile_cont interpolation at the needed ranks is
    reproduced driver-side with the same IEEE-double expression Spark's
    Percentile.getPercentile evaluates ((hi−pos)·v_lo + (pos−lo)·v_hi);
    for dyadic fracs over integer keys every term is exact in a double
    (≤3 fractional bits, magnitudes « 2^50), so the result is the exact
    rational — bit-equal to both Spark's aggregate and the DuckDB
    oracle. Returns None for an empty input."""
    import math

    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    d = (df.select(F.col(key_col).alias("_k"))
         .repartitionByRange(par, F.col("_k"))
         .persist(StorageLevel.MEMORY_AND_DISK))
    try:
        # persist pins the range partitioner's sampled boundaries: both
        # jobs below must see the SAME partition layout
        pc = {r["_p"]: r["n"] for r in
              d.groupBy(F.spark_partition_id().alias("_p"))
              .agg(F.count(F.lit(1)).alias("n")).collect()}
        # total row count derived from the per-partition counts — the r6
        # predecessor ran a SEPARATE df.count() full-scan job for a value
        # this collect already carries (guide §1.2: don't compute things
        # twice)
        n = sum(pc.values())
        if n == 0:
            return None
        positions = [f * (n - 1) for f in fracs]
        need = sorted({int(math.floor(p)) for p in positions}
                      | {int(math.ceil(p)) for p in positions})
        starts, acc = {}, 0
        for p in range(max(pc) + 1 if pc else 0):
            starts[p] = acc
            acc += pc.get(p, 0)
        want: dict[int, list[tuple[int, int]]] = {}
        for k in need:
            for p, s in starts.items():
                if s <= k < s + pc.get(p, 0):
                    want.setdefault(p, []).append((k - s, k))
                    break
        local = [lr for rs in want.values() for lr, _ in rs]
        w = W.partitionBy("_p").orderBy("_k")
        rows = (
            d.withColumn("_p", F.spark_partition_id())
            .filter(F.col("_p").isin(list(want)))
            .withColumn("_r", F.row_number().over(w) - 1)
            .filter(F.col("_r").isin(local))
            .collect()
        )
    finally:
        d.unpersist()
    val = {}
    for r in rows:
        for lr, k in want.get(r["_p"], []):
            if lr == r["_r"]:
                val[k] = r["_k"]
    out = []
    for pos in positions:
        lo, hi = int(math.floor(pos)), int(math.ceil(pos))
        q = (float(val[lo]) if lo == hi
             else (hi - pos) * float(val[lo]) + (pos - lo) * float(val[hi]))
        out.append(int(math.floor(q)))
    return out


def pk_range_chunks(df: DataFrame, key_col: str, n_chunks: int = 8,
                    exact: bool = True, accuracy: int = 10_000) -> DataFrame:
    """PK-range splitter operator: equal-depth half-open chunks
    `(lo, hi]` over a numeric key, via quantile boundary discovery +
    map-only chunk assignment (reference:
    DatabaseReadPartitionSplitter.java:137-230 splitByRange).

    exact=True (oracle-parity mode) discovers boundaries by distributed
    selection — see _exact_quantile_bounds; per-task memory is a range
    slice, so exact mode is no longer the O(distinct)-in-one-task shape
    it was through r5. exact=False keeps `percentile_approx`
    (Greenwald-Khanna sketch, memory bounded by `accuracy`, mergeable
    map-side partials — the distributed analog of the reference's
    recursive min/max sampling). Both modes emit the identical chunk
    contract; only boundary placement may differ by the sketch's rank
    error (≤ n/accuracy)."""
    o = df.select(key_col)
    fracs = [i / float(n_chunks) for i in range(1, n_chunks)]
    if exact:
        bs = _exact_quantile_bounds(o, key_col, fracs)
        bounds_col = (
            F.lit(None).cast("array<bigint>") if bs is None
            else F.expr("array({})".format(
                ", ".join(f"{b}L" for b in bs)))
        )
        assigned = o.withColumn("bs", bounds_col)
    else:
        pct = F.percentile_approx(F.col(key_col), F.lit(fracs), F.lit(accuracy))
        bounds = o.agg(
            F.transform(pct, lambda x: F.floor(x).cast("bigint")).alias("bs")
        )
        assigned = o.join(F.broadcast(bounds))
    return (
        assigned
        .withColumn(
            "chunk",
            (
                F.lit(1)
                + F.size(F.filter(F.col("bs"), lambda b: b < F.col(key_col)))
            ).cast("int"),
        )
        .groupBy("chunk")
        .agg(
            F.min(key_col).alias("lo"),
            F.max(key_col).alias("hi"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def q_snapshot_pk_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PK-range chunked scan (readPartition ranges): equal-depth range
    boundaries over the primary key via SAMPLED quantile boundaries — each
    chunk is a `WHERE pk > lo AND pk <= hi` resumable scan unit
    (DatabaseReadPartitionSplitter.java:137-230 splitByRange samples
    min/max recursively to derive boundary VALUES; TapPartition
    lower/upper bounds). 8 chunks; per-chunk bounds + count.

    Scale shape: boundary discovery is a distributed percentile AGGREGATE
    (map-side partial combine, primitive buffers — no global window, no
    single-partition sort; the r2 ntile formulation moved every key row to
    ONE partition). The 7-value boundary frame then broadcasts onto the
    scan and chunk assignment is a map-only array count — the whole query
    is one aggregate + one map pass regardless of table size. The
    interior-boundary rule (chunk = 1 + #boundaries strictly below the
    key; rows AT a boundary close the lower chunk — half-open ranges) is
    integer-exact: fractions i/8 are dyadic so the interpolation
    arithmetic is exact in doubles for integer keys, and the oracle
    reproduces it bit-for-bit with quantile_cont. This registry entry
    runs the operator in exact mode (oracle parity); pk_range_chunks
    exact=False is the bounded-memory 10^10-key sketch path with the
    same chunk contract."""
    return pk_range_chunks(_t(spark, sf_dir, "orders", widen=False), "o_orderkey",
                           n_chunks=8, exact=True)


_PK_RANGE_FRACS_SQL = ", ".join(str(f) for f in _PK_RANGE_FRACS)

SQL_SNAPSHOT_PK_RANGES = f"""
WITH b AS (
  SELECT list_transform(
           quantile_cont(o_orderkey, [{_PK_RANGE_FRACS_SQL}]),
           x -> CAST(floor(x) AS BIGINT)) AS bs
  FROM orders
)
SELECT chunk, min(o_orderkey) AS lo, max(o_orderkey) AS hi,
       count(*) AS n_rows
FROM (SELECT o_orderkey,
             CAST(1 + len(list_filter(bs, x -> x < o_orderkey)) AS INTEGER) AS chunk
      FROM orders, b)
GROUP BY chunk
"""


def q_snapshot_with_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-with-offset resumable scan (batchReadWithOffset /
    readWithOffset): resume the ordered full-table scan AFTER a saved PK
    offset, take the next page, report the new offset — the
    `WHERE pk > :offset ORDER BY pk LIMIT n` contract
    (CommonDbConnector.java:579-606 order-by-PK batch read + offset
    state). Offset = 1000, page = 200. Pushdown shape: the predicate
    reaches the parquet scan; the sort-limit is a TakeOrdered, never a
    full sort."""
    o = _t(spark, sf_dir, "orders", widen=False)
    page = (
        o.filter(F.col("o_orderkey") > 1000)
        .orderBy("o_orderkey")
        .limit(200)
        .select("o_orderkey", "o_custkey", "o_orderstatus")
    )
    return page.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("o_orderkey").alias("first_key"),
        F.max("o_orderkey").alias("next_offset"),
        F.count_distinct("o_custkey").alias("n_custs"),
    )


SQL_SNAPSHOT_WITH_OFFSET = """
SELECT count(*) AS n_rows, min(o_orderkey) AS first_key,
       max(o_orderkey) AS next_offset,
       count(DISTINCT o_custkey) AS n_custs
FROM (SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
      WHERE o_orderkey > 1000 ORDER BY o_orderkey LIMIT 200)
"""


def q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive whole-table verification hash — the reference's
    source/target comparison checksum
    `sum(mod(conv(substr(md5(concat_ws(cols)),1,16),16,10),64))`
    (MysqlConnector.java:782-818 buildHashSql / queryTableHash)."""
    d = _t(spark, sf_dir, "documents")
    concat = F.concat_ws("|", F.col("doc_id"), F.col("lang"), F.col("source"), F.col("n_chars"))
    return d.agg(
        F.sum(F.pmod(_md5_slice(concat), F.lit(64))).alias("checksum"),
        F.count(F.lit(1)).alias("n_rows"),
    )


SQL_TABLE_CHECKSUM = f"""
SELECT CAST(sum({_MD5_SLICE_SQL.format(x="concat_ws('|', doc_id, lang, source, n_chars)")} % 64) AS BIGINT) AS checksum,
       count(*) AS n_rows
FROM documents
"""


# ---------------------------------------------------------------------------
# Query-by-filter surface (SURVEY.md §2.3, CommonSqlMaker.java)
# ---------------------------------------------------------------------------

def q_query_by_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TapAdvanceFilter → match + range operators + sort + limit
    (CommonSqlMaker.java:150-257)."""
    ev = _t(spark, sf_dir, "events", widen=False)
    return (
        ev.filter((F.col("event_type") == "purchase")
                  & (F.col("value") >= 50) & (F.col("value") < 150))
        .select("event_id", "user_id", "ts", "value")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .limit(20)
    )


SQL_QUERY_BY_FILTER = """
SELECT event_id, user_id, ts, value
FROM events
WHERE event_type = 'purchase' AND value >= 50 AND value < 150
ORDER BY ts ASC, event_id ASC LIMIT 20
"""


def q_rownum_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW_NUMBER pagination for offset-less dialects — page 3 of 50 rows
    (CommonSqlMaker.java:259-289, the reference's one window function)."""
    o = _t(spark, sf_dir, "orders", widen=False)
    w = W.orderBy(F.asc("o_orderkey"))
    return (
        o.withColumn("rowno", F.row_number().over(w))
        .filter((F.col("rowno") > 100) & (F.col("rowno") <= 150))
        .select("rowno", "o_orderkey", "o_custkey", "o_orderstatus")
    )


SQL_ROWNUM_PAGINATION = """
SELECT rowno, o_orderkey, o_custkey, o_orderstatus
FROM (
  SELECT *, row_number() OVER (ORDER BY o_orderkey ASC) AS rowno FROM orders
) WHERE rowno > 100 AND rowno <= 150
"""


def q_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queryByFilter exact-match point read (CommonDbConnector.java:377-398)."""
    ev = _t(spark, sf_dir, "events", widen=False)
    return ev.filter(F.col("event_id") == 123).select("event_id", "user_id", "event_type", "value")


SQL_POINT_LOOKUP = """
SELECT event_id, user_id, event_type, value FROM events WHERE event_id = 123
"""


# ---------------------------------------------------------------------------
# Training-data pipeline operators over `documents` / `embeddings`
# ---------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: min doc_id survives per distinct text
    (hash-groupBy; the scale path is a single shuffle on the digest).
    Engine op: operators/corpus.exact_dup_groups (also wired over the lake
    pages table via streaming/curation.dedup_pages). widen=False (r6):
    one md5 per row is too little map work to pay the widening exchange
    for — the digest partial-agg absorbs rows inside the scan stage."""
    return corpus.exact_dup_groups(_t(spark, sf_dir, "documents",
                                      widen=False))


SQL_DEDUP_EXACT = """
SELECT min(doc_id) AS survivor_id, count(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: 64-bit hex digest of whitespace-normalized
    lowered text — dedup-key precursor. Kept as a hex string: a bigint
    combine overflows differently per engine (Java wraps, DuckDB promotes
    to int128)."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", corpus.fingerprint(F.col("text")).alias("fingerprint"))


SQL_DOC_FINGERPRINT = """
SELECT doc_id,
       substr(md5(regexp_replace(lower(text), '\\s+', ' ', 'g')), 1, 16) AS fingerprint
FROM documents
"""


_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "on", "for", "with"]


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring features per document: token count, punctuation count,
    stopword count, mean token length ×100 as exact integer.
    Engine op: operators/corpus.quality_features."""
    return corpus.quality_features(
        _t(spark, sf_dir, "documents"), stopwords=_STOPWORDS
    )


_SW_SQL = ",".join(f"'{w}'" for w in _STOPWORDS)

SQL_TEXT_QUALITY = f"""
WITH toks AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS tk
  FROM documents
)
SELECT doc_id,
       CAST(len(tk) AS BIGINT) AS n_words,
       CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS BIGINT) AS n_punct,
       CAST(len(list_filter(tk, x -> x IN ({_SW_SQL}))) AS BIGINT) AS n_stop,
       CAST(floor(list_sum(list_transform(tk, x -> length(x))) * 100.0
            / greatest(len(tk), 1)) AS BIGINT) AS mean_tok_len_x100
FROM toks
"""


def q_token_count_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token accounting grouped by language.
    Engine op: operators/corpus.token_count_by."""
    return corpus.token_count_by(_t(spark, sf_dir, "documents"))


SQL_TOKEN_COUNT_BY_LANG = """
SELECT lang, count(*) AS n_docs,
       CAST(sum(CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS BIGINT)) AS BIGINT) AS n_tokens
FROM documents GROUP BY lang
"""


def q_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token budget with BPE-style pre-tokenization (letter
    runs / digit runs / single punctuation — the GPT-2 pre-split shape,
    RE2+Java-portable core) next to the whitespace count, ratio as an
    exact integer ×1e3. Engine op: operators/corpus.bpe_token_stats."""
    return corpus.bpe_token_stats(_t(spark, sf_dir, "documents"))


SQL_TOKEN_COUNT_BPE = """
SELECT doc_id,
       CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens_ws,
       CAST(len(regexp_extract_all(lower(text), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0)) AS BIGINT) AS n_tokens_bpe,
       CASE WHEN len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) > 0
            THEN CAST((CAST(len(regexp_extract_all(lower(text), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0)) AS BIGINT) * 1000)
                 // CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS BIGINT) AS BIGINT)
            ELSE NULL END AS bpe_per_ws_x1e3
FROM documents
"""


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signals (Gopher repetition filters, Rae
    et al. 2021 §A1.1): duplicate 2-/3-gram fraction and top-word share,
    exact ×1e3 integers. Map-only JVM higher-order functions.
    Engine op: operators/corpus.repetition_stats."""
    return corpus.repetition_stats(_t(spark, sf_dir, "documents"))


SQL_TEXT_REPETITION = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
  FROM documents
), g AS (
  SELECT doc_id, w,
    CASE WHEN len(w) >= 2 THEN list_transform(range(1, len(w)), i -> array_to_string(list_slice(w, i, i+1), ' ')) ELSE [] END AS g2,
    CASE WHEN len(w) >= 3 THEN list_transform(range(1, len(w)-1), i -> array_to_string(list_slice(w, i, i+2), ' ')) ELSE [] END AS g3
  FROM t
)
SELECT doc_id,
  CAST(len(w) AS BIGINT) AS n_words,
  CASE WHEN len(g2) > 0 THEN CAST(floor((len(g2) - len(list_distinct(g2))) * 1000 / len(g2)) AS BIGINT) END AS dup_2gram_x1e3,
  CASE WHEN len(g3) > 0 THEN CAST(floor((len(g3) - len(list_distinct(g3))) * 1000 / len(g3)) AS BIGINT) END AS dup_3gram_x1e3,
  CASE WHEN len(w) > 0 THEN CAST(floor(list_max(list_transform(list_distinct(w), d -> len(list_filter(w, x -> x = d)))) * 1000 / len(w)) AS BIGINT) END AS top_word_x1e3
FROM g
"""


def q_dedup_ngram_crossdoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-n-gram accounting (n=5) — the detection
    half of exact-substring dedup (Lee et al. 2022): per document, how
    many of its distinct word 5-grams occur in >=1 other document. One
    explode of 60-bit gram hashes, one count, one join back — linear,
    hash-partitioned on one key throughout.
    Engine op: operators/corpus.cross_doc_ngram_stats."""
    return corpus.cross_doc_ngram_stats(_t(spark, sf_dir, "documents"), n=5)


SQL_DEDUP_NGRAM_CROSSDOC = """
WITH t AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
  FROM documents
), g AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(gram), 1, 15)) AS BIGINT) AS gh
  FROM (SELECT doc_id, unnest(list_distinct(
          CASE WHEN len(w) >= 5 THEN list_transform(range(1, len(w)-3), i -> array_to_string(list_slice(w, i, i+4), ' ')) ELSE [] END)) AS gram
        FROM t)
), df AS (SELECT gh, count(*) AS n_docs FROM g GROUP BY gh)
SELECT t.doc_id,
  CAST(coalesce(s.n_ngrams, 0) AS BIGINT) AS n_ngrams,
  CAST(coalesce(s.n_shared, 0) AS BIGINT) AS n_shared,
  CASE WHEN coalesce(s.n_ngrams, 0) > 0 THEN CAST(floor(s.n_shared * 1000 / s.n_ngrams) AS BIGINT) END AS shared_x1e3
FROM t LEFT JOIN (
  SELECT g.doc_id, count(*) AS n_ngrams,
         sum(CASE WHEN df.n_docs > 1 THEN 1 ELSE 0 END) AS n_shared
  FROM g JOIN df USING (gh) GROUP BY g.doc_id
) s USING (doc_id)
"""


def q_dup_span_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest cross-document duplicated token span per doc (n=5 windows)
    — the positional half of exact-substring dedup (Lee et al. 2022):
    gaps-and-islands over shared-window positions, reporting the longest
    consecutive run as a token span. Engine op:
    operators/corpus.dup_span_stats."""
    return corpus.dup_span_stats(_t(spark, sf_dir, "documents"), n=5)


SQL_DUP_SPAN_DETECT = """
WITH t AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
  FROM documents
), gl AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 5 THEN list_transform(range(1, len(w)-3), i -> array_to_string(list_slice(w, i, i+4), ' ')) ELSE [] END AS gs
  FROM t
), g AS (
  SELECT doc_id, s['pos'] AS pos, s['gh'] AS gh
  FROM (SELECT doc_id, unnest(list_transform(range(1, len(gs)+1),
            i -> {'pos': i-1, 'gh': CAST(('0x' || substr(md5(gs[i]), 1, 15)) AS BIGINT)})) AS s
        FROM gl)
), df AS (
  SELECT gh FROM g GROUP BY gh HAVING count(DISTINCT doc_id) > 1
), dup AS (
  SELECT g.doc_id, g.pos FROM g JOIN df USING (gh)
), runs AS (
  SELECT doc_id, island, count(*) AS run
  FROM (SELECT doc_id, pos,
               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
        FROM dup)
  GROUP BY doc_id, island
), per_doc AS (
  SELECT doc_id, sum(run) AS n_dup_windows, max(run) + 4 AS max_dup_span
  FROM runs GROUP BY doc_id
)
SELECT gl.doc_id,
  CAST(len(gs) AS BIGINT) AS n_windows,
  CAST(coalesce(p.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
  CAST(p.max_dup_span AS BIGINT) AS max_dup_span
FROM gl LEFT JOIN per_doc p USING (doc_id)
"""


def q_dup_span_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring CUT (Lee et al. 2022's removal step): duplicated
    token spans >= 10 tokens (n=5 windows) are cut from the normalized
    token stream; emits per-doc token/cut/span counts and the md5 of the
    cleaned text. Engine op: operators/corpus.exact_substring_cut."""
    return corpus.exact_substring_cut(
        _t(spark, sf_dir, "documents"), n=5, min_span=10)


SQL_DUP_SPAN_CUT = """
WITH t AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
  FROM documents
), gl AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 5 THEN list_transform(range(1, len(w)-3), i -> array_to_string(list_slice(w, i, i+4), ' ')) ELSE [] END AS gs
  FROM t
), g AS (
  SELECT doc_id, s['pos'] AS pos, s['gh'] AS gh
  FROM (SELECT doc_id, unnest(list_transform(range(1, len(gs)+1),
            i -> {'pos': i-1, 'gh': CAST(('0x' || substr(md5(gs[i]), 1, 15)) AS BIGINT)})) AS s
        FROM gl)
), dupgh AS (
  SELECT gh FROM g GROUP BY gh HAVING count(DISTINCT doc_id) > 1
), rng AS (
  SELECT doc_id, min(pos) AS start, count(*) + 4 AS span_len
  FROM (SELECT doc_id, pos,
               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
        FROM g JOIN dupgh USING (gh))
  GROUP BY doc_id, island
  HAVING count(*) + 4 >= 10
), cov AS (
  SELECT DISTINCT doc_id, pos
  FROM (SELECT doc_id, unnest(range(start, start + span_len)) AS pos FROM rng)
), tk AS (
  SELECT doc_id, s['pos'] AS pos, s['tok'] AS tok
  FROM (SELECT doc_id, unnest(list_transform(range(1, len(w)+1),
            i -> {'pos': i-1, 'tok': w[i]})) AS s
        FROM t)
), kept AS (
  SELECT tk.doc_id, tk.pos, tk.tok FROM tk
  WHERE NOT EXISTS (SELECT 1 FROM cov WHERE cov.doc_id = tk.doc_id AND cov.pos = tk.pos)
), reb AS (
  SELECT doc_id, count(*) AS n_kept, string_agg(tok, ' ' ORDER BY pos) AS cleaned
  FROM kept GROUP BY doc_id
), ns AS (SELECT doc_id, count(*) AS n_spans FROM rng GROUP BY doc_id)
SELECT t.doc_id,
  CAST(len(w) AS BIGINT) AS n_tokens,
  CAST(len(w) - coalesce(reb.n_kept, 0) AS BIGINT) AS n_tokens_cut,
  CAST(coalesce(ns.n_spans, 0) AS BIGINT) AS n_spans_cut,
  md5(coalesce(reb.cleaned, '')) AS cleaned_md5
FROM t LEFT JOIN reb USING (doc_id) LEFT JOIN ns USING (doc_id)
"""


def q_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-shaped LM quality proxy, integer-exact: per-doc mean token
    surprisal from corpus unigram stats via bit lengths (bitlen(N_total)
    - bitlen(count) = -log2 p within one bit). Engine op:
    operators/corpus.unigram_surprisal."""
    return corpus.unigram_surprisal(_t(spark, sf_dir, "documents"))


SQL_UNIGRAM_SURPRISAL = """
WITH tk AS (
  SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS th
  FROM (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS tok
        FROM documents)
), c AS (SELECT th, count(*) AS cnt FROM tk GROUP BY th),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c),
e AS (
  SELECT tk.doc_id,
         length(format('{:b}', tot.total)) - length(format('{:b}', CAST(c.cnt AS BIGINT))) AS bits
  FROM tk JOIN c USING (th) CROSS JOIN tot
), per AS (
  SELECT doc_id, count(*) AS n_tokens, sum(bits) AS s FROM e GROUP BY doc_id
)
SELECT d.doc_id,
  CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
  CAST(coalesce(p.s, 0) AS BIGINT) AS surprisal_bits,
  CASE WHEN coalesce(p.n_tokens, 0) > 0
       THEN CAST(floor(p.s * 1000 / p.n_tokens) AS BIGINT) END AS bits_per_token_x1e3
FROM documents d LEFT JOIN per p USING (doc_id)
"""


def q_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-LM quality proxy, integer-exact: per-doc mean bigram
    surprisal -log2 p(w2|w1) via bit lengths over corpus bigram stats
    (ctx_cnt = the head's bigram-head count, the exact conditional
    denominator). Catches common-words-in-unusual-order documents the
    unigram proxy scores as fine. Engine op:
    operators/corpus.bigram_surprisal."""
    return corpus.bigram_surprisal(_t(spark, sf_dir, "documents"))


SQL_BIGRAM_SURPRISAL = """
WITH tok AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
  FROM documents
), bg AS (
  SELECT doc_id, unnest([t[i] || ' ' || t[i+1] for i in range(1, len(t))]) AS bg
  FROM tok
), hashed AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(split_part(bg, ' ', 1)), 1, 15)) AS BIGINT) AS h1,
         CAST(('0x' || substr(md5(bg), 1, 15)) AS BIGINT) AS h12
  FROM bg
), c AS (SELECT h1, h12, count(*) AS cnt12 FROM hashed GROUP BY h1, h12),
ctx AS (SELECT h1, CAST(sum(cnt12) AS BIGINT) AS ctx_cnt FROM c GROUP BY h1),
e AS (
  SELECT hashed.doc_id,
         length(format('{:b}', ctx.ctx_cnt))
         - length(format('{:b}', CAST(c.cnt12 AS BIGINT))) AS bits
  FROM hashed JOIN c USING (h1, h12) JOIN ctx USING (h1)
), per AS (
  SELECT doc_id, count(*) AS n_bigrams, sum(bits) AS s FROM e GROUP BY doc_id
)
SELECT d.doc_id,
  CAST(coalesce(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
  CAST(coalesce(p.s, 0) AS BIGINT) AS surprisal_bits,
  CASE WHEN coalesce(p.n_bigrams, 0) > 0
       THEN CAST(floor(p.s * 1000 / p.n_bigrams) AS BIGINT) END AS bits_per_bigram_x1e3
FROM documents d LEFT JOIN per p USING (doc_id)
"""


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode canonicalization (NFC + control strip + whitespace
    collapse — the pre-fingerprint normalization CCNet/Dolma run): the
    corpus is ASCII, so each document is deterministically AUGMENTED
    with a decomposed-accent + control-char + messy-whitespace tail
    (same non-vacuous-oracle pattern as pii_redact); the oracle rebuilds
    the identical augmented string and replays the chain via DuckDB's
    nfc_normalize. Engine op: functions/textnorm.normalize_text (NFC is
    the one step Spark lacks a built-in for → Arrow pandas UDF; strip +
    collapse stay JVM regexp)."""
    from tapdata_connectors_spark.functions import textnorm

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" cafe\u0301  nai\u0308ve\rend\x07."),  # decomposed accents: NFC has real work
        ).alias("text"),
    )
    return textnorm.normalize_text(docs)


SQL_TEXT_NORMALIZE = """
WITH aug AS (
  SELECT doc_id,
         text || ' cafe' || chr(769) || '  nai' || chr(776) || 've'
              || chr(13) || 'end' || chr(7) || '.' AS raw
  FROM documents
), n AS (
  SELECT doc_id, raw,
         trim(regexp_replace(regexp_replace(nfc_normalize(raw),
              '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'),
              '\\s+', ' ', 'g')) AS norm_text
  FROM aug
)
SELECT doc_id, norm_text,
  norm_text <> raw AS changed,
  CAST(length(norm_text) AS BIGINT) AS n_chars_norm
FROM n
"""


def q_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard assignment (the final-mile global
    shuffle of a data build): shard = md5(key+":s0") mod 8, intra-shard
    order key = md5(key+":o0") — no RNG, so the oracle reproduces the
    exact assignment and a re-run of the build reproduces the shards.
    Engine op: operators/export.shard_assignment (export_shards writes
    the sharded, sorted parquet; pytest-gated since it writes)."""
    from tapdata_connectors_spark.operators import export

    return export.shard_assignment(
        _t(spark, sf_dir, "documents"), n_shards=8
    )


SQL_SHARD_ASSIGNMENT = """
SELECT doc_id,
  CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':s0'), 1, 15)) AS BIGINT) % 8 AS INT) AS shard,
  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':o0'), 1, 15)) AS BIGINT) AS ord64
FROM documents
"""


def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based language rebalancing (Conneau & Lample 2019 /
    mC4 sampling, alpha=0.5): kept counts scale as sqrt of group size —
    rates derived FROM the corpus counts, realized as the deterministic
    md5-mod predicate. alpha is pinned at 0.5 because sqrt (unlike pow)
    is IEEE correctly-rounded on both engines, so floor(1000*sqrt(
    n_min/n_g)) is bit-identical in Spark and DuckDB.
    Engine op: operators/corpus.temperature_sample."""
    return corpus.temperature_sample(
        _t(spark, sf_dir, "documents")
    ).select("doc_id", "lang")


SQL_TEMPERATURE_MIX = """
WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
r AS (
  SELECT lang,
         CAST(floor(1000 * sqrt((SELECT min(n) FROM c) * 1.0 / n)) AS BIGINT) AS rate
  FROM c
)
SELECT d.doc_id, d.lang
FROM documents d JOIN r USING (lang)
WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 < r.rate
"""


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite Gopher-style quality gate (Rae et al. 2021 table A1):
    word-count band, mean-word-length band, duplicate-2-gram ceiling,
    top-word-share ceiling; emits every signal plus the keep flag.
    Engine op: operators/corpus.gopher_quality."""
    return corpus.gopher_quality(_t(spark, sf_dir, "documents"))


SQL_GOPHER_QUALITY = f"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
  FROM documents
), feats AS (
  SELECT doc_id,
    CAST(len(w) AS BIGINT) AS n_words,
    CAST(floor(list_sum(list_transform(w, x -> length(x))) * 100.0
         / greatest(len(w), 1)) AS BIGINT) AS mean_tok_len_x100,
    CAST(len(list_filter(w, x -> x IN ({_SW_SQL}))) AS BIGINT) AS n_stop,
    CASE WHEN len(w) >= 2 THEN CAST(floor(
      (len(w)-1 - len(list_distinct(list_transform(range(1, len(w)), i -> array_to_string(list_slice(w, i, i+1), ' ')))))
      * 1000 / (len(w)-1)) AS BIGINT) END AS dup_2gram_x1e3,
    CASE WHEN len(w) > 0 THEN CAST(floor(
      list_max(list_transform(list_distinct(w), d -> len(list_filter(w, x -> x = d))))
      * 1000 / len(w)) AS BIGINT) END AS top_word_x1e3
  FROM t
)
SELECT doc_id, n_words, mean_tok_len_x100, n_stop, dup_2gram_x1e3, top_word_x1e3,
  (n_words >= 5 AND n_words <= 100000
   AND mean_tok_len_x100 >= 150 AND mean_tok_len_x100 <= 1200
   AND coalesce(dup_2gram_x1e3, 0) <= 600
   AND coalesce(top_word_x1e3, 0) <= 300
   AND n_stop >= 0) AS keep
FROM feats
"""


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 characteristic terms, TF-IDF-shaped but
    integer-exact: rank by (tf DESC, corpus df ASC, term ASC) — the
    TF-IDF ordering without a float log, so the compare is bit-stable.
    Engine op: operators/corpus.top_terms."""
    return corpus.top_terms(_t(spark, sf_dir, "documents"), k=3)


SQL_TFIDF_TOP_TERMS = """
WITH tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS term FROM documents)
  GROUP BY doc_id, term
), dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, CAST(rank AS BIGINT) AS rank
FROM (SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
             row_number() OVER (PARTITION BY tf.doc_id ORDER BY tf.tf DESC, dfq.df ASC, tf.term ASC) AS rank
      FROM tf JOIN dfq USING (term))
WHERE rank <= 3
"""


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (CCNet/Dolma-style regex passes): the corpus has no PII,
    so each document is deterministically AUGMENTED with a synthetic
    email + phone derived from its id, then operators/corpus.pii_stats
    counts matches per class and digests the redacted text — the oracle
    rebuilds the identical augmented string, so counts and digest are
    exact. Map-only regexp chain, Java-regex/RE2 common core.
    Engine op: operators/corpus.redact_pii / pii_stats."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" contact user"),
            F.col("doc_id").cast("string"), F.lit("@example.com now +15550"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    return corpus.pii_stats(docs)


SQL_PII_REDACT = """
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com now +15550'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t0
  FROM documents
), s1 AS (
  SELECT *, regexp_replace(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g') AS t1 FROM aug
), s2 AS (
  SELECT *, regexp_replace(t1, '\\b(\\d{1,3}\\.){3}\\d{1,3}\\b', '[IPV4]', 'g') AS t2 FROM s1
), s3 AS (
  SELECT *, regexp_replace(t2, '\\+?\\d[\\d\\s().-]{7,}\\d', '[PHONE]', 'g') AS t3 FROM s2
)
SELECT doc_id,
  CAST(len(regexp_extract_all(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', 0)) AS BIGINT) AS n_email,
  CAST(len(regexp_extract_all(t1, '\\b(\\d{1,3}\\.){3}\\d{1,3}\\b', 0)) AS BIGINT) AS n_ipv4,
  CAST(len(regexp_extract_all(t2, '\\+?\\d[\\d\\s().-]{7,}\\d', 0)) AS BIGINT) AS n_phone,
  md5(t3) AS redacted_md5
FROM s3
"""


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language quota sampling (training-mix
    downsampling): keep md5(doc_id) mod 1000 < rate[lang]. Stable across
    runs/partitionings/engines (the oracle reproduces the exact row
    set); map-only predicate, no shuffle at any scale.
    Engine op: operators/corpus.hash_sample."""
    rates = {"en": 500, "de": 1000, "fr": 250, "es": 100, "zh": 0}
    return corpus.hash_sample(
        _t(spark, sf_dir, "documents"), rates
    ).select("doc_id", "lang")


SQL_SAMPLE_STRATIFIED = """
SELECT doc_id, lang
FROM documents
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000
      < CASE lang WHEN 'en' THEN 500 WHEN 'de' THEN 1000 WHEN 'fr' THEN 250
                  WHEN 'es' THEN 100 ELSE 0 END
"""


def q_knn_brute_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k over the embedding column: queries are
    vec_id < 3, k=5. All arithmetic in exact scaled integers (components
    ×1e6 rounded) so both engines rank identical values; similarity is
    reported as the exact integer dot product (cosine ordering per query ==
    dot ordering after per-vector normalization is NOT implied, so norms are
    included in the output for verifiability)."""
    e = _t(spark, sf_dir, "embeddings")
    scaled = F.transform(
        F.col("embedding"), lambda x: F.round(x.cast("double") * 1000000.0).cast("long")
    )
    base = e.select(F.col("vec_id"), scaled.alias("v"))
    nrm = F.aggregate(F.col("v"), F.lit(0).cast("long"), lambda a, x: a + x * x)
    base = base.withColumn("nrm", nrm)
    q = base.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    j = base.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("v"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    j = j.withColumn("dot", dot)
    # rank by true cosine: dot / sqrt(qn*nrm) — compare via exact cross-mult
    # ordering is messy; integer dot with L2-comparable norms suffices when
    # vectors are near-unit; rank key = dot*dot sign-adjusted per norms is
    # overkill here: report dot + norms, rank by double cosine rounded to 1e-9
    cos = (F.col("dot") / F.sqrt(F.col("qn").cast("double") * F.col("nrm").cast("double")))
    j = j.withColumn("cos_r", F.round(cos, 9))
    w = W.partitionBy("query_id").orderBy(F.desc("cos_r"), F.asc("vec_id"))
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "rank", F.col("vec_id").alias("neighbor_id"), "dot")
    )


SQL_KNN_BRUTE_COSINE = """
WITH scaled AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
  FROM embeddings
), normed AS (
  SELECT vec_id, v,
         list_sum(list_transform(v, x -> x * x)) AS nrm
  FROM scaled
), pairs AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(list_zip(q.v, e.v), p -> p[1] * p[2])) AS BIGINT) AS dot,
         q.nrm AS qn, e.nrm AS nrm
  FROM normed q JOIN normed e ON e.vec_id <> q.vec_id
  WHERE q.vec_id < 3
), ranked AS (
  SELECT query_id, neighbor_id, dot,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(dot / sqrt(CAST(qn AS DOUBLE) * CAST(nrm AS DOUBLE)), 9) DESC,
                    neighbor_id ASC) AS rank
  FROM pairs
)
SELECT query_id, rank, neighbor_id, dot FROM ranked WHERE rank <= 5
"""




# ---------------------------------------------------------------------------
# Near-duplicate detection & embedding indexing (training-data pipeline ops)
# ---------------------------------------------------------------------------

def _tokens_col():
    return corpus.tokens(F.col("text"))


# MinHash config knobs (VERDICT r1: 8 perms / 4 bands is weak for real
# corpora — raise n_perms for recall, rows_per_band for precision; the
# oracle SQL is generated from the same constants so parity is automatic).
# The engine-side op is operators/corpus (parameterized per call site);
# this registry pins one config so the DuckDB oracle matches.
MINHASH_CFG = corpus.MinHashConfig(n_perms=8, rows_per_band=2, shingle_k=3)
MINHASH_PERMS = MINHASH_CFG.n_perms
MINHASH_BAND_ROWS = MINHASH_CFG.rows_per_band
MINHASH_BANDS = MINHASH_CFG.bands


_SQL_SHINGLE_ROWS = """
  SELECT doc_id, unnest(list_transform(range(1, greatest(len(tk)-2,0)+1),
         i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
  FROM (SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS tk
        FROM documents)
"""


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delegates to the engine op corpus.shingle_minhash (one
    tokenize→explode→hash pass + one groupBy shuffle; see its docstring)."""
    return corpus.shingle_minhash(_t(spark, sf_dir, "documents"), MINHASH_CFG)


_SQL_DOC_SHINGLES = f"""
  SELECT doc_id, list(DISTINCT h) AS sh, CAST(count(DISTINCT h) AS INTEGER) AS n,
         {", ".join(
             "min(((h % 2147483647) * {a} + {b}) % 2147483647) AS mh{p}".format(
                 a=corpus.minhash_perm_consts(p)[0],
                 b=corpus.minhash_perm_consts(p)[1], p=p)
             for p in range(MINHASH_PERMS)
         )}
  FROM (SELECT doc_id, {_MD5_SLICE_SQL.format(x="s")} AS h FROM ({_SQL_SHINGLE_ROWS}))
  GROUP BY doc_id
"""


def _band_rows(docsh: DataFrame) -> DataFrame:
    """Delegates to corpus.band_rows (map-side pivot, no extra shuffle)."""
    return corpus.band_rows(docsh, MINHASH_CFG)


def _sql_band_rows() -> str:
    selects = []
    for b in range(MINHASH_BANDS):
        sig = " || '_' || ".join(
            f"CAST(mh{b * MINHASH_BAND_ROWS + r} AS VARCHAR)"
            for r in range(MINHASH_BAND_ROWS)
        )
        selects.append(
            f"SELECT doc_id, {b} AS band, {sig} AS sig FROM docsh"
        )
    return " UNION ALL ".join(selects)


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-duplicate CANDIDATE pairs: docs sharing any band
    bucket. Scale path: the self-join is on (band, sig) — work ∝ bucket
    sizes, never all-pairs; signatures are map-only (see _doc_shingles).

    The shingle frame is PERSISTED before the self-join (r6 — the
    BENCH/aux_queries one-shot outlier): both join sides reference the
    same shingle_minhash plan, and unpersisted each side re-ran the full
    tokenize→explode→md5→min-agg pipeline (16.3 s one-shot vs ~2 s
    inside the registry run, where near_dup_pairs' persisted frame was
    already cached). Same session-cache convention as near_dup_pairs."""
    docsh = _doc_shingles(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    return corpus.lsh_candidate_pairs(docsh, MINHASH_CFG)


SQL_DEDUP_MINHASH_LSH = f"""
WITH docsh AS ({_SQL_DOC_SHINGLES}),
bands AS ({_sql_band_rows()})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a
JOIN bands b
  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
"""


def q_dedup_minhash_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidates verified with EXACT shingle-set Jaccard (integer
    intersection/union over the per-doc shingle-hash SETS; is_dup at
    >= 0.8). The candidate→verify two-phase is the scalable near-dup
    shape: exact set work only on bucket-collision pairs. The shingle
    frame is computed once and persisted, then reused by the LSH stage and
    both sides of the verify join (kills the r1 3× tokenization pass);
    intersections are in-array (array_intersect on two fetched sets), so
    no per-shingle explode ever happens. Engine op: corpus.near_dup_pairs."""
    return corpus.near_dup_pairs(_t(spark, sf_dir, "documents"), MINHASH_CFG)


SQL_DEDUP_MINHASH_JACCARD = f"""
WITH docsh AS ({_SQL_DOC_SHINGLES}),
bands AS ({_sql_band_rows()}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_inter,
       CAST(a.n + b.n - len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_union,
       len(list_intersect(a.sh, b.sh)) * 10 >= (a.n + b.n - len(list_intersect(a.sh, b.sh))) * 8 AS is_dup
FROM cand c
JOIN docsh a ON a.doc_id = c.doc_a
JOIN docsh b ON b.doc_id = c.doc_b
"""


def q_dedup_minhash_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive-closure near-dup survivorship (VERDICT r3 item 5):
    connected components over the verified MinHash/Jaccard dup edges —
    every non-minimum component member is a loser attributed to the
    component's surviving minimum id, so a chain a~b~c never attributes
    c to the already-dropped b. Engine op: corpus.near_dup_losers
    (closure=True) → corpus.dup_components, GraphFrames-free iterative
    min-label propagation: O(component diameter) rounds, each ONE
    edge-join + ONE min-aggregate shuffle, O(1) cached frames held.
    The DuckDB oracle computes the same closure with a recursive CTE."""
    return corpus.near_dup_losers(
        _t(spark, sf_dir, "documents"), MINHASH_CFG, closure=True
    )


SQL_DEDUP_MINHASH_CLOSURE = f"""
WITH RECURSIVE docsh AS ({_SQL_DOC_SHINGLES}),
bands AS ({_sql_band_rows()}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
),
dup AS (
  SELECT c.doc_a, c.doc_b
  FROM cand c
  JOIN docsh a ON a.doc_id = c.doc_a
  JOIN docsh b ON b.doc_id = c.doc_b
  WHERE len(list_intersect(a.sh, b.sh)) * 10
        >= (a.n + b.n - len(list_intersect(a.sh, b.sh))) * 8
),
und AS (
  SELECT doc_a AS src, doc_b AS dst FROM dup
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM dup
),
reach AS (
  SELECT src, dst FROM und
  UNION
  SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src
)
SELECT src AS doc_id, MIN(dst) AS survivor_id
FROM reach
GROUP BY src
HAVING MIN(dst) < src
"""


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash per document over token hashes (sign of per-bit
    weight sums) — near-dup fingerprint whose hamming distance tracks
    similarity; integer-only arithmetic for cross-engine determinism.
    60 bits = 15 md5 hex chars, the widest slice that stays exact AND
    positive as a signed bigint in both engines (VERDICT r1: the old
    16-bit hash would collide heavily at 10^10 docs).
    Engine op: operators/corpus.simhash."""
    return corpus.simhash(_t(spark, sf_dir, "documents"), bits=60)


SQL_DEDUP_SIMHASH = """
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS t
  FROM documents
), bits AS (
  SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h, unnest(range(0,60)) AS b
  FROM tok
), per_bit AS (
  SELECT doc_id, b,
         sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS w
  FROM bits GROUP BY doc_id, b
)
SELECT doc_id,
       CAST(sum(CASE WHEN w > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
FROM per_bit GROUP BY doc_id
"""


def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate PAIRS (banded buckets + exact Hamming ≤ 3):
    by pigeonhole, a pair within Hamming 3 of a 60-bit simhash must agree
    exactly on one of 4 disjoint 15-bit slices — banding has 100% recall
    for the verified predicate (unlike probabilistic LSH). Engine op:
    operators/corpus.simhash_near_dup."""
    return corpus.simhash_near_dup(_t(spark, sf_dir, "documents"),
                                   bits=60, n_bands=4, max_hamming=3)


SQL_DEDUP_SIMHASH_PAIRS = """
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS t
  FROM documents
), bits AS (
  SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h, unnest(range(0,60)) AS b
  FROM tok
), per_bit AS (
  SELECT doc_id, b,
         sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS w
  FROM bits GROUP BY doc_id, b
), sh AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN w > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
  FROM per_bit GROUP BY doc_id
), e AS (
  SELECT doc_id, simhash, band, (simhash >> (band * 15)) & 32767 AS bv
  FROM (SELECT doc_id, simhash, unnest(range(0,4)) AS band FROM sh)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM e a JOIN e b ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


def q_dedup_simhash_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-components survivorship over the SimHash banded-Hamming
    dup edges (pigeonhole-exact candidates, Hamming ≤ 3 verify) — the
    same closure operator as dedup_minhash_closure exercised over a
    different edge pipeline. Engine op: corpus.simhash_dup_losers
    (closure=True). Oracle: recursive CTE over the simhash-pairs SQL.

    This entry deliberately forces the DISTRIBUTED min-label-propagation
    path (driver_threshold=0, parquet round spill) so the oracle gate
    covers the cluster-scale loop every round; the minhash/embedding
    closure entries take the default driver union-find fast path, so
    both physical strategies stay under per-round oracles."""
    pairs = corpus.simhash_near_dup(_t(spark, sf_dir, "documents"),
                                    bits=60, n_bands=4, max_hamming=3)
    return corpus.component_losers(pairs, id_col="doc_id",
                                   driver_threshold=0)


SQL_DEDUP_SIMHASH_CLOSURE = """
WITH RECURSIVE tok AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS t
  FROM documents
), bits AS (
  SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h, unnest(range(0,60)) AS b
  FROM tok
), per_bit AS (
  SELECT doc_id, b,
         sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS w
  FROM bits GROUP BY doc_id, b
), sh AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN w > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
  FROM per_bit GROUP BY doc_id
), e AS (
  SELECT doc_id, simhash, band, (simhash >> (band * 15)) & 32767 AS bv
  FROM (SELECT doc_id, simhash, unnest(range(0,4)) AS band FROM sh)
), dup AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM e a JOIN e b ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
), und AS (
  SELECT doc_a AS src, doc_b AS dst FROM dup
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM dup
), reach AS (
  SELECT src, dst FROM und
  UNION
  SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src
)
SELECT src AS doc_id, MIN(dst) AS survivor_id
FROM reach
GROUP BY src
HAVING MIN(dst) < src
"""


_LANG_MARKERS = corpus.LANG_MARKERS


def q_lang_id_stopword(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: marker-stopword hit counts per language,
    argmax with deterministic tie-break ('und' when no evidence).
    Engine op: operators/corpus.lang_scores (also available as a single
    Column for ingest-time enrichment: corpus.lang_id_col)."""
    return corpus.lang_scores(_t(spark, sf_dir, "documents"))


def _sql_lang_scores() -> str:
    parts = []
    for lang, ws in _LANG_MARKERS.items():
        lst = ",".join(f"'{w}'" for w in ws)
        parts.append(
            f"CAST(len(list_filter(tk, x -> x IN ({lst}))) AS BIGINT) AS s_{lang}"
        )
    return ", ".join(parts)


SQL_LANG_ID_STOPWORD = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS tk
  FROM documents
), s AS (SELECT doc_id, {_sql_lang_scores()} FROM t)
SELECT doc_id,
       CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
            WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
            WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
            WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
            ELSE 'es' END AS pred_lang,
       s_en, s_de, s_fr, s_es
FROM s
"""


def _scaled_vec():
    return F.transform(
        F.col("embedding"), lambda x: F.round(x.cast("double") * 1000000.0).cast("long")
    )


def q_embedding_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH over embeddings: 8 planes with deterministic
    integer weights (md5-derived), bucket = sign-bit pattern. The ANN scale
    path: candidate search only within a bucket."""
    e = _t(spark, sf_dir, "embeddings").select("vec_id", _scaled_vec().alias("v"))
    planes = e.select("vec_id", "v", F.explode(F.sequence(F.lit(0), F.lit(7))).alias("p"))
    w = F.transform(
        F.sequence(F.lit(1), F.size(F.col("v"))),
        lambda i: F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("pl"), F.col("p").cast("string"), F.lit("_"), i.cast("string"))),
                    1, 8,
                ), 16, 10,
            ).cast("long"),
            F.lit(2001),
        ) - F.lit(1000),
    )
    dot = F.aggregate(
        F.zip_with(F.col("v"), w, lambda a, b: a * b),
        F.lit(0).cast("long"), lambda acc, x: acc + x,
    )
    per_plane = planes.select("vec_id", "p", (dot > 0).alias("bit"))
    return per_plane.groupBy("vec_id").agg(
        F.sum(F.when(F.col("bit"), F.expr("shiftleft(1, p)")).otherwise(F.lit(0)))
        .cast("bigint").alias("bucket")
    )


SQL_EMBEDDING_LSH_BUCKETS = """
WITH scaled AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
  FROM embeddings
), planes AS (
  SELECT vec_id, v, unnest(range(0,8)) AS p FROM scaled
), dots AS (
  SELECT vec_id, p,
         list_sum(list_transform(range(1, len(v)+1),
           i -> v[i] * ((('0x' || substr(md5('pl' || CAST(p AS VARCHAR) || '_' || CAST(i AS VARCHAR)), 1, 8))::BIGINT % 2001) - 1000)
         )) > 0 AS bit
  FROM planes
)
SELECT vec_id,
       CAST(sum(CASE WHEN bit THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
FROM dots GROUP BY vec_id
"""


def q_embedding_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse assignment: centroids = vectors 0..3 (deterministic
    seeds; REAL Lloyd training is operators/ann.ivf_train, pytest-gated
    since iterative k-means is not SQL-expressible), each vector assigned
    to its nearest centroid by exact integer L2^2. Engine op:
    operators/ann.ivf_assign — map-only argmin over literal broadcast
    centroids (the r1 version shuffled corpus×k rows through a window)."""
    from tapdata_connectors_spark.operators import ann

    e = _t(spark, sf_dir, "embeddings")
    cents = [list(r["v"]) for r in
             e.select("vec_id", _scaled_vec().alias("v"))
             .filter(F.col("vec_id") < 4).orderBy("vec_id").collect()]
    return ann.ivf_assign(e, cents)


SQL_EMBEDDING_IVF_ASSIGN = """
WITH scaled AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
  FROM embeddings
), cents AS (
  SELECT vec_id AS cid, v AS cv FROM scaled WHERE vec_id < 4
), pairs AS (
  SELECT s.vec_id, c.cid,
         CAST(list_sum(list_transform(range(1, len(s.v)+1), i -> s.v[i]*s.v[i] + c.cv[i]*c.cv[i]))
         - 2 * list_sum(list_transform(range(1, len(s.v)+1), i -> s.v[i]*c.cv[i])) AS BIGINT) AS d2
  FROM scaled s, cents c
)
SELECT vec_id, cid AS centroid_id, d2 AS dist2
FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) AS rn FROM pairs)
WHERE rn = 1
"""


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe-and-search top-k (queries = vec_id < 3, k = 5,
    nprobe = 2 of 4 seed centroids): corpus in inverted lists by nearest
    centroid, each query exact-reranks only its probed lists — the FAISS
    IndexIVF search shape. Centroids here are the deterministic seed
    vectors 0..3 so the oracle can reproduce them in SQL (real Lloyd
    training is ann.ivf_train, pytest-gated: iterative k-means is not
    SQL-expressible). Engine op: operators/ann.ann_ivf_topk."""
    from tapdata_connectors_spark.operators import ann

    e = _t(spark, sf_dir, "embeddings")
    cents = [list(r["v"]) for r in
             e.select("vec_id", _scaled_vec().alias("v"))
             .filter(F.col("vec_id") < 4).orderBy("vec_id").collect()]
    return ann.ann_ivf_topk(e, cents, n_queries=3, k=5, nprobe=2)


SQL_ANN_IVF_TOPK = """
WITH scaled AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
  FROM embeddings
), cents AS (
  SELECT vec_id AS cid, v AS cv FROM scaled WHERE vec_id < 4
), asg AS (
  SELECT vec_id, cid FROM (
    SELECT s.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY s.vec_id
             ORDER BY list_sum(list_transform(range(1, len(s.v)+1),
                       i -> (s.v[i]-c.cv[i])*(s.v[i]-c.cv[i]))) ASC, c.cid ASC
           ) AS rn
    FROM scaled s, cents c)
  WHERE rn = 1
), probes AS (
  SELECT query_id, cid FROM (
    SELECT q.vec_id AS query_id, c.cid,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_sum(list_transform(range(1, len(q.v)+1),
                       i -> (q.v[i]-c.cv[i])*(q.v[i]-c.cv[i]))) ASC, c.cid ASC
           ) AS rn
    FROM scaled q, cents c WHERE q.vec_id < 3)
  WHERE rn <= 2
), cand AS (
  SELECT p.query_id, a.vec_id,
         CAST(list_sum(list_transform(list_zip(qs.v, s.v), z -> z[1]*z[2])) AS BIGINT) AS dot
  FROM probes p
  JOIN asg a ON a.cid = p.cid AND a.vec_id <> p.query_id
  JOIN scaled qs ON qs.vec_id = p.query_id
  JOIN scaled s ON s.vec_id = a.vec_id
)
SELECT query_id, CAST(rn AS INTEGER) AS rank, vec_id AS neighbor_id, dot
FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, vec_id ASC) AS rn
      FROM cand)
WHERE rn <= 5
"""


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k (queries = vec_id < 3, k = 5,
    4 hyperplanes): candidates only within the query's bucket, exact
    integer-dot re-rank — the two-phase ANN search the LSH bucket map
    exists for. Engine op: operators/ann.ann_lsh_topk."""
    from tapdata_connectors_spark.operators import ann

    return ann.ann_lsh_topk(_t(spark, sf_dir, "embeddings"),
                            n_queries=3, k=5, n_planes=4)


SQL_ANN_LSH_TOPK = """
WITH scaled AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
  FROM embeddings
), planes AS (
  SELECT vec_id, v, unnest(range(0,4)) AS p FROM scaled
), dots AS (
  SELECT vec_id, p,
         list_sum(list_transform(range(1, len(v)+1),
           i -> v[i] * ((('0x' || substr(md5('pl' || CAST(p AS VARCHAR) || '_' || CAST(i AS VARCHAR)), 1, 8))::BIGINT % 2001) - 1000)
         )) > 0 AS bit
  FROM planes
), bkt AS (
  SELECT vec_id, CAST(sum(CASE WHEN bit THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS bucket
  FROM dots GROUP BY vec_id
), bv AS (
  SELECT b.vec_id, b.bucket, s.v FROM bkt b JOIN scaled s USING (vec_id)
), cand AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(range(1, len(q.v)+1), i -> q.v[i] * c.v[i])) AS BIGINT) AS dot
  FROM bv q JOIN bv c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
  WHERE q.vec_id < 3
)
SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, dot
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY dot DESC, neighbor_id ASC) AS rank
      FROM cand)
WHERE rank <= 5
"""


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (threshold 0.30, ×1e6
    integer-reported): LSH-bucketed candidates (4 hyperplanes; each vector
    lives in exactly one bucket) verified with the exact IEEE-double
    cosine over exact integer dot/norms. Engine op:
    operators/ann.cosine_near_dup — the embedding analog of the
    MinHash+Jaccard two-phase near-dup."""
    from tapdata_connectors_spark.operators import ann

    return ann.cosine_near_dup(_t(spark, sf_dir, "embeddings"),
                               threshold_x1e6=300_000, n_planes=4)


SQL_DEDUP_EMBEDDING_COSINE = """
WITH scaled AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
  FROM embeddings
), planes AS (
  SELECT vec_id, v, unnest(range(0,4)) AS p FROM scaled
), dots AS (
  SELECT vec_id, p,
         list_sum(list_transform(range(1, len(v)+1),
           i -> v[i] * ((('0x' || substr(md5('pl' || CAST(p AS VARCHAR) || '_' || CAST(i AS VARCHAR)), 1, 8))::BIGINT % 2001) - 1000)
         )) > 0 AS bit
  FROM planes
), bkt AS (
  SELECT vec_id, CAST(sum(CASE WHEN bit THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS bucket
  FROM dots GROUP BY vec_id
), normed AS (
  SELECT b.vec_id, b.bucket, s.v,
         list_sum(list_transform(s.v, x -> x * x)) AS nrm
  FROM bkt b JOIN scaled s USING (vec_id)
), pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         CAST(list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2])) AS BIGINT) AS dot,
         a.nrm AS na, b.nrm AS nb
  FROM normed a JOIN normed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b,
       CAST(floor(dot / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) * 1000000) AS BIGINT) AS cos_x1e6
FROM pairs
WHERE floor(dot / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) * 1000000) >= 300000
"""


def q_dedup_embedding_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-components survivorship over the embedding-cosine dup
    edges (same LSH-bucketed + exact-verify pipeline as
    dedup_embedding_cosine) — the third edge family through the shared
    closure operator (corpus.dup_components min-label propagation).
    Oracle: recursive CTE over the embedding-pairs SQL."""
    from tapdata_connectors_spark.operators import ann

    pairs = ann.cosine_near_dup(_t(spark, sf_dir, "embeddings"),
                                threshold_x1e6=300_000, n_planes=4)
    return corpus.component_losers(pairs, id_col="vec_id",
                                   a_col="vec_a", b_col="vec_b")


SQL_DEDUP_EMBEDDING_CLOSURE = """
WITH RECURSIVE scaled AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
  FROM embeddings
), planes AS (
  SELECT vec_id, v, unnest(range(0,4)) AS p FROM scaled
), dots AS (
  SELECT vec_id, p,
         list_sum(list_transform(range(1, len(v)+1),
           i -> v[i] * ((('0x' || substr(md5('pl' || CAST(p AS VARCHAR) || '_' || CAST(i AS VARCHAR)), 1, 8))::BIGINT % 2001) - 1000)
         )) > 0 AS bit
  FROM planes
), bkt AS (
  SELECT vec_id, CAST(sum(CASE WHEN bit THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS bucket
  FROM dots GROUP BY vec_id
), normed AS (
  SELECT b.vec_id, b.bucket, s.v,
         list_sum(list_transform(s.v, x -> x * x)) AS nrm
  FROM bkt b JOIN scaled s USING (vec_id)
), dup AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM normed a JOIN normed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE floor(CAST(list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2])) AS BIGINT)
              / (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE))) * 1000000) >= 300000
), und AS (
  SELECT vec_a AS src, vec_b AS dst FROM dup
  UNION
  SELECT vec_b AS src, vec_a AS dst FROM dup
), reach AS (
  SELECT src, dst FROM und
  UNION
  SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src
)
SELECT src AS vec_id, MIN(dst) AS survivor_id
FROM reach
GROUP BY src
HAVING MIN(dst) < src
"""


def q_dedup_embedding_cosine_multiprobe(spark: SparkSession,
                                        sf_dir: str) -> DataFrame:
    """Multi-probe (OR-construction) embedding near-dup: 3 independent
    4-plane bands — candidates share a bucket in ANY band, catching
    near-dup pairs that straddle a single band's hyperplane boundary
    (band 0 ≡ the single-probe query's planes, so this is a strict
    candidate superset at the same 0.30 threshold). Engine op:
    operators/ann.cosine_near_dup_multiprobe."""
    from tapdata_connectors_spark.operators import ann

    return ann.cosine_near_dup_multiprobe(
        _t(spark, sf_dir, "embeddings"), threshold_x1e6=300_000,
        n_planes=4, n_bands=3,
    )


SQL_DEDUP_EMBEDDING_COSINE_MULTIPROBE = """
WITH scaled AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
  FROM embeddings
), planes AS (
  SELECT vec_id, v, unnest(range(0,12)) AS p FROM scaled
), dots AS (
  SELECT vec_id, p,
         list_sum(list_transform(range(1, len(v)+1),
           i -> v[i] * ((('0x' || substr(md5('pl' || CAST(p AS VARCHAR) || '_' || CAST(i AS VARCHAR)), 1, 8))::BIGINT % 2001) - 1000)
         )) > 0 AS bit
  FROM planes
), bkt AS (
  SELECT vec_id, CAST(p // 4 AS BIGINT) AS band,
         CAST(sum(CASE WHEN bit THEN (1::BIGINT << (p % 4)) ELSE 0 END) AS BIGINT) AS bucket
  FROM dots GROUP BY vec_id, p // 4
), normed AS (
  SELECT b.vec_id, b.band, b.bucket, s.v,
         list_sum(list_transform(s.v, x -> x * x)) AS nrm
  FROM bkt b JOIN scaled s USING (vec_id)
), pairs AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM normed a JOIN normed b
    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
), verified AS (
  SELECT p.vec_a, p.vec_b,
         CAST(list_sum(list_transform(list_zip(sa.v, sb.v), z -> z[1] * z[2])) AS BIGINT) AS dot,
         list_sum(list_transform(sa.v, x -> x * x)) AS na,
         list_sum(list_transform(sb.v, x -> x * x)) AS nb
  FROM pairs p
  JOIN scaled sa ON sa.vec_id = p.vec_a
  JOIN scaled sb ON sb.vec_id = p.vec_b
)
SELECT vec_a, vec_b,
       CAST(floor(dot / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) * 1000000) AS BIGINT) AS cos_x1e6
FROM verified
WHERE floor(dot / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) * 1000000) >= 300000
"""


def q_multimodal_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal image pipeline over opaque binary columns: each
    document's utf-8 bytes are packed as a FIMG grayscale blob
    (width = 1 + doc_id % 63, zero-padded final row) in one mapInPandas
    encode stage, then decoded back to typed metadata by the
    functions/multimodal.image_meta operator (a second mapInPandas).
    Both stages are map-only Arrow-batched pandas — the real-format
    (JPEG/PNG) decode would replace decode_fimg's dispatch, the Spark
    plumbing is identical."""
    import pandas as pd

    from tapdata_connectors_spark.functions import multimodal as mm

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def enc(batches):
        for pdf in batches:
            rows = [
                (int(i), mm.encode_fimg(t.encode("utf-8"), 1 + int(i) % 63))
                for i, t in zip(pdf["doc_id"], pdf["text"])
            ]
            yield pd.DataFrame(rows, columns=["id", "img"])

    imgs = docs.mapInPandas(enc, "id long, img binary")
    return mm.image_meta(imgs).select(
        F.col("id").alias("doc_id"), "width", "height", "n_pixels", "sum_px"
    )


# NOTE (oracle parity precondition): this oracle — and
# SQL_MULTIMODAL_FRAME_SAMPLE below — reads documents.text with DuckDB
# CHARACTER semantics (substr/ascii/strlen) while the Spark side packs
# text.encode("utf-8") BYTES. The two agree iff documents.text is pure
# ASCII (1 char == 1 byte, codepoint == byte value). DuckDB cannot index
# raw blob bytes (no substring(BLOB)), so the byte-exact rewrite is not
# expressible; instead the fixture invariant is ASSERTED by
# tests/test_multimodal.py::test_documents_text_is_ascii — if the
# testdata ever grows multi-byte characters that test fails before this
# oracle silently diverges.
SQL_MULTIMODAL_IMAGE_META = """
WITH b AS (
  SELECT doc_id, strlen(text) AS nb,
         CAST(1 + doc_id % 63 AS INTEGER) AS width,
         list_sum(list_transform(range(1, len(text) + 1),
                                 i -> ascii(substr(text, i, 1)))) AS sum_px
  FROM documents
)
SELECT doc_id, width,
       CAST(greatest(1, CAST(ceil(CAST(nb AS DOUBLE) / width) AS BIGINT)) AS INTEGER) AS height,
       CAST(width * greatest(1, CAST(ceil(CAST(nb AS DOUBLE) / width) AS BIGINT)) AS BIGINT) AS n_pixels,
       CAST(coalesce(sum_px, 0) AS BIGINT) AS sum_px
FROM b
"""


def q_multimodal_jpeg_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-format image path end-to-end IN the engine (round 4): per
    document, a 16x16 grayscale image of four 8x8 constant blocks (levels
    derived from the text length) is encoded to an actual baseline JPEG
    bitstream (functions/jpeg.encode_jpeg), then decoded back by the
    image_meta operator through functions/jpeg.decode_jpeg_luma — marker
    parse, Huffman, dequant, IDCT, the whole pipeline. Constant blocks
    are DC-only and the quant table is all-8s, making the round-trip
    bit-EXACT (DC = 8·(level−128) is divisible by 8), so the DuckDB
    oracle can state the expected metadata in closed form. Both stages
    are map-only Arrow-batched mapInPandas. Every third document encodes
    with a restart interval (DRI + RSTn markers), so the decoder's
    restart-resync path rides this oracle gate every round — markers
    change the bitstream layout, never the pixels."""
    import numpy as np
    import pandas as pd

    from tapdata_connectors_spark.functions import multimodal as mm
    from tapdata_connectors_spark.functions.jpeg import encode_jpeg

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    qt = np.full(64, 8, dtype=np.uint16)

    def enc(batches):
        for pdf in batches:
            rows = []
            for i, t in zip(pdf["doc_id"], pdf["text"]):
                nb = len(t.encode("utf-8"))
                img = np.zeros((16, 16), dtype=np.uint8)
                for q, k in enumerate((1, 7, 13, 31)):
                    by, bx = divmod(q, 2)
                    img[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (nb * k) % 256
                rows.append((int(i), encode_jpeg(
                    [img], qt=qt,
                    restart_interval=(1 if int(i) % 3 == 0 else 0))))
            yield pd.DataFrame(rows, columns=["id", "img"])

    imgs = docs.mapInPandas(enc, "id long, img binary")
    return mm.image_meta(imgs).select(
        F.col("id").alias("doc_id"), "width", "height", "n_pixels", "sum_px"
    )


SQL_MULTIMODAL_JPEG_META = """
SELECT doc_id,
       CAST(16 AS INTEGER) AS width,
       CAST(16 AS INTEGER) AS height,
       CAST(256 AS BIGINT) AS n_pixels,
       CAST(64 * ((strlen(text) % 256) + (strlen(text) * 7 % 256)
                  + (strlen(text) * 13 % 256) + (strlen(text) * 31 % 256))
            AS BIGINT) AS sum_px
FROM documents
"""


def q_multimodal_mp4_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-container video path end-to-end IN the engine (round 4): per
    document, its text bytes are packed as 16-byte samples into an actual
    ISO-BMFF MP4 (functions/mp4.mux_mp4 — ftyp + mdat + full moov/stbl),
    then video_meta demuxes the container back through the magic dispatch
    (tkhd 16.16 dims, mdhd timescale/duration, stsz count). The muxer's
    fixed geometry makes every field closed-form for the DuckDB oracle.
    Both stages map-only Arrow-batched mapInPandas."""
    import pandas as pd

    from tapdata_connectors_spark.functions import multimodal as mm
    from tapdata_connectors_spark.functions.mp4 import mux_mp4

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def enc(batches):
        for pdf in batches:
            rows = []
            for i, t in zip(pdf["doc_id"], pdf["text"]):
                tb = t.encode("utf-8")
                frames = [tb[j * 16:(j + 1) * 16] for j in range(len(tb) // 16)]
                rows.append((int(i), mux_mp4(frames)))
            yield pd.DataFrame(rows, columns=["id", "video"])

    vids = docs.mapInPandas(enc, "id long, video binary")
    return mm.video_meta(vids).select(
        F.col("id").alias("doc_id"), "width", "height", "timescale",
        "duration", "n_samples",
    )


SQL_MULTIMODAL_MP4_META = """
SELECT doc_id,
       CAST(64 AS INTEGER) AS width,
       CAST(48 AS INTEGER) AS height,
       CAST(1000 AS INTEGER) AS timescale,
       CAST(40 * (strlen(text) // 16) AS BIGINT) AS duration,
       CAST(strlen(text) // 16 AS BIGINT) AS n_samples
FROM documents
"""


def q_multimodal_h264_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-codec video path (round 5, the last named codec gap): per
    document, a deterministic H.264-in-MP4 clip is built from genuine
    bitstream bytes — a conformant SPS (with real frame-cropping fields,
    functions/h264.build_sps) + PPS wrapped in an avcC record inside an
    avc1 sample entry (functions/mp4.avc1_sample_entry), and one
    length-prefixed IDR/non-IDR slice NAL per sample on an I-P-P GOP —
    then video_codec_meta parses it all back at the BITSTREAM level:
    Exp-Golomb SPS decode (dimensions from crop arithmetic, not the
    container), PPS entropy mode, per-sample NAL walks for keyframes.
    Every field is closed-form in the doc's text length, so the DuckDB
    oracle states the expected metadata exactly. Entropy decode of slice
    residuals stays gated by name (h264.decode_slice_data). Both stages
    map-only Arrow-batched mapInPandas."""
    import pandas as pd

    from tapdata_connectors_spark.functions import multimodal as mm
    from tapdata_connectors_spark.functions.h264 import (
        build_avcc,
        build_pps,
        build_slice_nal,
        build_sps,
        join_avcc,
    )
    from tapdata_connectors_spark.functions.mp4 import (
        avc1_sample_entry,
        mux_mp4,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def enc(batches):
        for pdf in batches:
            rows = []
            for i, t in zip(pdf["doc_id"], pdf["text"]):
                nb = len(t.encode("utf-8"))
                w = 16 * (1 + nb % 3) - 2 * (nb % 4)
                h = 16 * (1 + nb % 2) - 2 * (nb % 3)
                n = 2 + nb % 4
                avcc = build_avcc(build_sps(w, h), build_pps())
                samples = [
                    join_avcc([build_slice_nal(
                        idr=(k % 3 == 0), frame_num=k,
                        slice_type=2 if k % 3 == 0 else 0)])
                    for k in range(n)
                ]
                rows.append((int(i), mux_mp4(
                    samples, width=w, height=h,
                    codec_entry=avc1_sample_entry(w, h, avcc))))
            yield pd.DataFrame(rows, columns=["id", "vid"])

    vids = docs.mapInPandas(enc, "id long, vid binary")
    return mm.video_codec_meta(vids, bin_col="vid").select(
        F.col("id").alias("doc_id"), "codec", "profile_idc", "level_idc",
        "coded_width", "coded_height", "entropy_mode", "n_samples",
        "n_keyframes",
    )


SQL_MULTIMODAL_H264_META = """
SELECT doc_id,
       'avc1' AS codec,
       CAST(66 AS INTEGER) AS profile_idc,
       CAST(30 AS INTEGER) AS level_idc,
       CAST(16 * (1 + strlen(text) % 3) - 2 * (strlen(text) % 4)
            AS INTEGER) AS coded_width,
       CAST(16 * (1 + strlen(text) % 2) - 2 * (strlen(text) % 3)
            AS INTEGER) AS coded_height,
       'cavlc' AS entropy_mode,
       CAST(2 + strlen(text) % 4 AS BIGINT) AS n_samples,
       CAST((strlen(text) % 4 + 4) // 3 AS BIGINT) AS n_keyframes
FROM documents
"""


def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: document bytes packed as FVID blobs
    (16-byte frames, tail dropped), then every 4th frame emitted as its
    own row by functions/multimodal.sample_frames — the one-to-many
    mapInPandas batch shape (fan-out inside the task, no exploded
    shuffle)."""
    import pandas as pd

    from tapdata_connectors_spark.functions import multimodal as mm

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def enc(batches):
        for pdf in batches:
            rows = []
            for i, t in zip(pdf["doc_id"], pdf["text"]):
                tb = t.encode("utf-8")
                frames = [tb[j * 16:(j + 1) * 16] for j in range(len(tb) // 16)]
                rows.append((int(i), mm.encode_fvid(frames)))
            yield pd.DataFrame(rows, columns=["id", "video"])

    vids = docs.mapInPandas(enc, "id long, video binary")
    return mm.sample_frames(vids, stride=4).select(
        F.col("id").alias("doc_id"), "frame_idx", "frame_md5"
    )


SQL_MULTIMODAL_FRAME_SAMPLE = """
SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
       md5(substr(text, CAST(f AS INTEGER) * 16 + 1, 16)) AS frame_md5
FROM (SELECT doc_id, text, unnest(range(0, strlen(text) // 16)) AS f
      FROM documents)
WHERE f % 4 = 0
"""


def q_resume_from_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """timestampToStreamOffset analog (MysqlConnector.java:760-771,
    MysqlBinlogPositionUtil.findByLessTimestamp): map a wall-clock restart
    point to the first replayable source position."""
    ev = _t(spark, sf_dir, "events", widen=False)
    cut = F.lit("2024-01-15 00:00:00").cast("timestamp")
    return ev.agg(
        F.min(F.when(F.col("ts") >= cut, F.col("event_id"))).alias("resume_seq"),
        F.sum((F.col("ts") < cut).cast("long")).alias("n_before"),
        F.sum((F.col("ts") >= cut).cast("long")).alias("n_after"),
    )


SQL_RESUME_FROM_TIMESTAMP = """
SELECT min(CASE WHEN ts >= TIMESTAMP '2024-01-15 00:00:00' THEN event_id END) AS resume_seq,
       CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS n_before,
       CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-15 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS n_after
FROM events
"""


def q_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """getTableInfo analog (MysqlConnector.java:774-780): row count +
    deterministic storage-bytes estimate from column widths."""
    o = _t(spark, sf_dir, "orders", widen=False)
    bytes_row = (
        F.length(F.col("o_orderstatus")) + F.length(F.col("o_orderpriority"))
        + F.lit(8 * 3) + F.lit(8)
    )
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(bytes_row).cast("bigint").alias("est_bytes"),
    )


SQL_TABLE_STATS = """
SELECT count(*) AS n_rows,
       CAST(sum(length(o_orderstatus) + length(o_orderpriority) + 24 + 8) AS BIGINT) AS est_bytes
FROM orders
"""


def q_cdc_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog between two replica snapshots — the change-data-feed read
    (Iceberg create_changelog_view / Delta CDF analog; the reference's
    closest surface is re-emitting batchRead deltas downstream). The
    lake-backed implementation is LakeTable.read_changes (manifest-diff
    bucket pruning + field-id schema alignment; tests/test_snapshots.py
    gates it against the Python replay oracle); this expresses the same
    classification over the events table for the SQL oracle gate:
    replica state at ts<2024-01-16 vs final state, full-outer join on the
    key, insert/update/delete per key (delete rows carry the preimage)."""
    # r6 plan (guide §2.4 "two operations keyed the same way share one
    # exchange"): the r5 formulation ran TWO window passes over events
    # (old state pre-cut, new state full) and full-outer-joined them —
    # three shuffles of event-width rows. Both states are per-user
    # (ts, event_id)-max folds of the SAME table, so ONE aggregation
    # computes both winners per user (the old-state winner under a
    # ts<cut guard) with map-side partial combine; the old/new compare
    # then happens within the row — no join at all. max ignores the
    # NULLs the guard produces, and (ts, event_id) is a total order, so
    # both structs are exactly the rn=1 rows of the r5 windows.
    ev = _t(spark, sf_dir, "events", widen=False)
    cut = F.lit("2024-01-16").cast("timestamp")
    s = F.struct("ts", "event_id", "event_type", "value")
    agg = ev.groupBy("user_id").agg(
        F.max(s).alias("n_s"),
        F.max(F.when(F.col("ts") < cut, s)).alias("o_s"),
    )
    # a state "exists" iff its winning event is present and not a delete
    # ('error') — the r5 windows dropped those rows after ranking
    o_live = F.col("o_s").isNotNull() & (F.col("o_s.event_type") != "error")
    n_live = F.col("n_s").isNotNull() & (F.col("n_s.event_type") != "error")
    ctype = (
        F.when(~o_live & n_live, F.lit("insert"))
        .when(o_live & ~n_live, F.lit("delete"))
        .when(o_live & n_live
              & (F.col("o_s.event_id") != F.col("n_s.event_id")),
              F.lit("update"))
    )
    j = agg.withColumn("change_type", ctype).filter(F.col("change_type").isNotNull())
    pick = lambda c: F.when(  # noqa: E731 — delete rows carry the preimage
        F.col("change_type") == "delete", F.col(f"o_s.{c}")
    ).otherwise(F.col(f"n_s.{c}"))
    return j.select(
        "user_id",
        pick("event_id").alias("last_event_id"),
        pick("event_type").alias("last_op"),
        pick("value").alias("last_value"),
        "change_type",
    )


SQL_CDC_CHANGELOG = """
WITH old_state AS (
  SELECT user_id, event_id, event_type, value FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE ts < TIMESTAMP '2024-01-16'
  ) WHERE rn = 1 AND event_type <> 'error'
), new_state AS (
  SELECT user_id, event_id, event_type, value FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
  ) WHERE rn = 1 AND event_type <> 'error'
)
SELECT COALESCE(o.user_id, n.user_id) AS user_id,
       CASE WHEN o.user_id IS NOT NULL AND n.user_id IS NULL THEN o.event_id ELSE n.event_id END AS last_event_id,
       CASE WHEN o.user_id IS NOT NULL AND n.user_id IS NULL THEN o.event_type ELSE n.event_type END AS last_op,
       CASE WHEN o.user_id IS NOT NULL AND n.user_id IS NULL THEN o.value ELSE n.value END AS last_value,
       CASE WHEN o.user_id IS NULL THEN 'insert'
            WHEN n.user_id IS NULL THEN 'delete'
            ELSE 'update' END AS change_type
FROM old_state o FULL OUTER JOIN new_state n ON o.user_id = n.user_id
WHERE o.user_id IS NULL OR n.user_id IS NULL OR o.event_id <> n.event_id
"""


def q_cdc_replica_ts_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replica rows whose CURRENT version falls in a timestamp window —
    the LakeTable.read_range probe ("keys that changed in this window"),
    with the resolve-THEN-filter ordering that matters: a key updated
    after the window is excluded even though an older version lies inside
    it. The lake path answers this metadata-first (manifest bounds skip
    whole commits' files, bucket-granular under MOR — lake/stats.py,
    table.py prune_entries; equality-gated in tests/test_stats_pruning.py);
    this expresses the identical semantics over `events` for the SQL
    oracle gate. Reference analog: batchRead with a time-range filter
    (CommonDbConnector buildRowLimit/queryByAdvanceFilter)."""
    lo, hi = "2024-01-10", "2024-01-20"
    return q_cdc_apply_upsert(spark, sf_dir).filter(
        (F.col("last_ts") >= F.lit(lo).cast("timestamp"))
        & (F.col("last_ts") < F.lit(hi).cast("timestamp"))
    )


SQL_CDC_REPLICA_TS_RANGE = SQL_CDC_APPLY_UPSERT.replace(
    "WHERE rn = 1 AND event_type <> 'error'",
    "WHERE rn = 1 AND event_type <> 'error' "
    "AND ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'",
)


def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ search (FAISS IndexIVFPQ shape): coarse inverted lists +
    product-quantized codes, ranked by asymmetric distance — each query
    precomputes dot(q_sub, codeword) tables and candidates cost m table
    lookups instead of a dim-wide product; the corpus side carries only
    (cid, codes), never raw vectors.

    Codebooks here are FROZEN SEEDS (pq_train iters=0 = the lowest-16
    ids of a deterministic 1/8 modulo sample, sub-sliced) rather than
    Lloyd-trained — two birds (VERDICT r4 items 2+3): (a) at scale an
    ANN index is train-once/search-many, so the registry entry should
    measure SEARCH, not retrain per invocation (training was 31% of the
    r4 registry wall); (b) seed codebooks are SQL-expressible, so this
    row is DuckDB-oracle-gated every round (encode = argmin codeword
    distance, ADC dot = dot(query, reconstruction) — all integer-exact).
    The Lloyd-TRAINED path stays the engine op (ann.pq_train iters>0),
    pytest-gated unchanged (tests/test_ann.py: PQ train ≡ python Lloyd
    oracle; ksub=corpus ⇒ brute-force equality; recall@5 gate)."""
    from tapdata_connectors_spark.operators import ann

    e = _t(spark, sf_dir, "embeddings")
    cents = [list(r["v"]) for r in
             e.select("vec_id", _scaled_vec().alias("v"))
             .filter(F.col("vec_id") < 4).orderBy("vec_id").collect()]
    sample = e.filter(F.col("vec_id") % 8 == 0)
    books = ann.pq_train(sample, m=4, ksub=16, iters=0)
    return ann.ann_ivfpq_topk(e, cents, books, n_queries=3, k=5, nprobe=2)


SQL_ANN_IVFPQ_TOPK = """
WITH scaled AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
  FROM embeddings
), cents AS (
  SELECT vec_id AS cid, v AS cv FROM scaled WHERE vec_id < 4
), seeds AS (
  SELECT j, v FROM (
    SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, v
    FROM scaled WHERE vec_id % 8 = 0)
  WHERE j < 16
), books AS (
  SELECT s, j, v[s*16+1 : s*16+16] AS bv
  FROM seeds, (SELECT unnest(range(0,4)) AS s)
), asg AS (
  SELECT vec_id, cid FROM (
    SELECT s.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY s.vec_id
             ORDER BY list_sum(list_transform(range(1, len(s.v)+1),
                       i -> (s.v[i]-c.cv[i])*(s.v[i]-c.cv[i]))) ASC, c.cid ASC
           ) AS rn
    FROM scaled s, cents c)
  WHERE rn = 1
), codes AS (
  SELECT vec_id, s, j FROM (
    SELECT sc.vec_id, b.s, b.j,
           row_number() OVER (
             PARTITION BY sc.vec_id, b.s
             ORDER BY list_sum(list_transform(range(1, 17),
                       i -> (sc.v[b.s*16+i]-b.bv[i])*(sc.v[b.s*16+i]-b.bv[i]))) ASC, b.j ASC
           ) AS rn
    FROM scaled sc, books b)
  WHERE rn = 1
), probes AS (
  SELECT query_id, cid FROM (
    SELECT q.vec_id AS query_id, c.cid,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_sum(list_transform(range(1, len(q.v)+1),
                       i -> (q.v[i]-c.cv[i])*(q.v[i]-c.cv[i]))) ASC, c.cid ASC
           ) AS rn
    FROM scaled q, cents c WHERE q.vec_id < 3)
  WHERE rn <= 2
), cand AS (
  SELECT p.query_id, a.vec_id,
         CAST(SUM(list_sum(list_transform(range(1, 17),
               i -> q.v[co.s*16+i] * b.bv[i]))) AS BIGINT) AS adc_dot
  FROM probes p
  JOIN asg a ON a.cid = p.cid AND a.vec_id <> p.query_id
  JOIN codes co ON co.vec_id = a.vec_id
  JOIN books b ON b.s = co.s AND b.j = co.j
  JOIN scaled q ON q.vec_id = p.query_id
  GROUP BY p.query_id, a.vec_id
)
SELECT query_id, CAST(rn AS INTEGER) AS rank, vec_id AS neighbor_id, adc_dot
FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc_dot DESC, vec_id ASC) AS rn
      FROM cand)
WHERE rn <= 5
"""


def q_events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window aggregation — the Structured-Streaming
    windowed-agg shape (F.window is the same expression batch and stream;
    tests/test_watermark.py drives the identical plan through readStream
    with a watermark and asserts batch/stream equality + late-row
    dropping). Reference analog: per-interval sync metrics the engines
    emit while tailing (heartbeat/metrics aggregation)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window(F.col("ts"), "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n_events", "sum_value",
        )
    )


SQL_EVENTS_TUMBLING_WINDOW = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2
"""


def _synthetic_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + a deterministic messy URL per doc (the corpus has no URL
    column — same augmentation pattern as pii_redact): four variants cycle
    by doc_id, all canonicalizing to https://example{k}.com/P/{m}, with
    small moduli so canonical collisions are real at every sf."""
    d = _t(spark, sf_dir, "documents")
    host = F.concat(F.lit("example"), (F.col("doc_id") % 13).cast("string"),
                    F.lit(".com"))
    path = F.concat(F.lit("/P/"), (F.col("doc_id") % 17).cast("string"))
    v = F.col("doc_id") % 4
    url = (
        F.when(v == 0, F.concat(F.lit("https://"), host, path))
        .when(v == 1, F.concat(F.lit("HTTPS://WWW."), F.upper(host), path))
        .when(v == 2, F.concat(F.lit("https://"), host, path,
                               F.lit("?utm_source=x&gclid="),
                               F.col("doc_id").cast("string")))
        .otherwise(F.concat(F.lit("https://"), host, F.lit(":443"), path,
                            F.lit("/#sec")))
    )
    return d.select("doc_id", url.alias("url"))


def q_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level exact dedup after canonicalization (fragment/tracking-param
    strip, scheme+host lowercase, www./default-port/trailing-slash removal)
    — the crawl-pipeline stage before content dedup. Engine op:
    operators/web.canonical_url + url_dedup (one hash-partitioned agg with
    map-side combine). The oracle replays the identical RE2-portable
    regexp chain."""
    from tapdata_connectors_spark.operators import web

    return web.url_dedup(_synthetic_urls(spark, sf_dir))


SQL_URL_CANONICAL_DEDUP = r"""
WITH raw AS (
  SELECT doc_id,
    CASE CAST(doc_id % 4 AS INTEGER)
      WHEN 0 THEN 'https://example' || CAST(doc_id % 13 AS VARCHAR) || '.com/P/' || CAST(doc_id % 17 AS VARCHAR)
      WHEN 1 THEN 'HTTPS://WWW.' || upper('example' || CAST(doc_id % 13 AS VARCHAR) || '.com') || '/P/' || CAST(doc_id % 17 AS VARCHAR)
      WHEN 2 THEN 'https://example' || CAST(doc_id % 13 AS VARCHAR) || '.com/P/' || CAST(doc_id % 17 AS VARCHAR) || '?utm_source=x&gclid=' || CAST(doc_id AS VARCHAR)
      ELSE 'https://example' || CAST(doc_id % 13 AS VARCHAR) || '.com:443/P/' || CAST(doc_id % 17 AS VARCHAR) || '/#sec'
    END AS u0
  FROM documents
), c1 AS (
  SELECT doc_id, regexp_replace(trim(u0), '#.*$', '') AS u FROM raw
), c2 AS (
  SELECT doc_id,
    CASE WHEN regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1) = ''
         THEN u
         ELSE lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1))
              || regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '')
    END AS u
  FROM c1
), c3 AS (
  SELECT doc_id, regexp_replace(u, '^(https?://)www\.', '\1') AS u FROM c2
), c4 AS (
  SELECT doc_id,
    regexp_replace(regexp_replace(u, '^(https://[^/:?#]*):443([/?#]|$)', '\1\2'),
                   '^(http://[^/:?#]*):80([/?#]|$)', '\1\2') AS u
  FROM c3
), c5 AS (
  SELECT doc_id,
    regexp_replace(u, '([?&])(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref)=[^&#]*', '\1', 'g') AS u
  FROM c4
), c6 AS (
  SELECT doc_id,
    regexp_replace(regexp_replace(regexp_replace(u, '\?&+', '?', 'g'), '&&+', '&', 'g'), '[?&]+$', '') AS u
  FROM c5
), canon AS (
  SELECT doc_id, regexp_replace(u, '/+$', '') AS canonical_url FROM c6
)
SELECT canonical_url, min(doc_id) AS survivor_id, count(*) AS n_copies
FROM canon GROUP BY canonical_url
"""


def q_host_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host document quota: at most 5 docs per `source`, chosen by
    deterministic md5 order (no RNG — cross-engine reproducible). The
    per-domain cap every crawl pipeline applies so megahosts don't
    dominate the training mix. Engine op: operators/web.host_cap_sample
    (early-projected window over a hash-partitioned host key)."""
    from tapdata_connectors_spark.operators import web

    return web.host_cap_sample(_t(spark, sf_dir, "documents"), cap=5)


SQL_HOST_CAP_SAMPLE = """
SELECT doc_id, source, rk FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
) WHERE rk <= 5
"""


def q_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (Lee et al. 2022): docs sharing any
    distinct word 5-gram with the synthetic eval set (docs with
    doc_id % 97 = 0) are flagged. Engine op: operators/web.contamination —
    tiny eval-gram inventory broadcast against the corpus's distinct-gram
    frame; grams travel as 60-bit md5 slices, never strings."""
    from tapdata_connectors_spark.operators import web

    d = _t(spark, sf_dir, "documents")
    eval_docs = d.filter(F.col("doc_id") % 97 == 0)
    cand = d.filter(F.col("doc_id") % 97 != 0)
    return web.contamination(cand, eval_docs, n=5)


SQL_CONTAMINATION_CHECK = r"""
WITH tok AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w
  FROM documents
), g AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(gram), 1, 15)) AS BIGINT) AS gh
  FROM (SELECT doc_id, unnest(list_distinct(
          CASE WHEN len(w) >= 5 THEN list_transform(range(1, len(w)-3), i -> array_to_string(list_slice(w, i, i+4), ' ')) ELSE [] END)) AS gram
        FROM tok)
), eg AS (
  SELECT DISTINCT gh FROM g WHERE doc_id % 97 = 0
), cand AS (
  SELECT * FROM g WHERE doc_id % 97 <> 0
), hits AS (
  SELECT doc_id, count(*) AS n_hit FROM cand JOIN eg USING (gh) GROUP BY doc_id
), totals AS (
  SELECT doc_id, count(*) AS n_grams FROM cand GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(t.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
       coalesce(h.n_hit, 0) > 0 AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
LEFT JOIN totals t USING (doc_id)
LEFT JOIN hits h USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "cdc_lww_dedup": q_cdc_lww_dedup,
    "cdc_apply_upsert": q_cdc_apply_upsert,
    "cdc_first_writer_wins": q_cdc_first_writer_wins,
    "cdc_epoch_batching": q_cdc_epoch_batching,
    "cdc_exactly_once_counts": q_cdc_exactly_once_counts,
    "cdc_delete_enrichment": q_delete_enrichment,
    "cdc_changelog": q_cdc_changelog,
    "cdc_replica_ts_range": q_cdc_replica_ts_range,
    "events_tumbling_window": q_events_tumbling_window,
    "ann_ivfpq_topk": q_ann_ivfpq_topk,
    "url_canonical_dedup": q_url_canonical_dedup,
    "host_cap_sample": q_host_cap_sample,
    "contamination_check": q_contamination_check,
    "snapshot_split_stats": q_snapshot_split_stats,
    "snapshot_hash_split": q_snapshot_hash_split,
    "snapshot_pk_ranges": q_snapshot_pk_ranges,
    "snapshot_with_offset": q_snapshot_with_offset,
    "table_checksum": q_table_checksum,
    "query_by_filter": q_query_by_filter,
    "rownum_pagination": q_rownum_pagination,
    "point_lookup": q_point_lookup,
    "dedup_exact": q_dedup_exact,
    "doc_fingerprint": q_doc_fingerprint,
    "text_quality": q_text_quality,
    "token_count_by_lang": q_token_count_by_lang,
    "text_repetition": q_text_repetition,
    "dedup_ngram_crossdoc": q_dedup_ngram_crossdoc,
    "gopher_quality": q_gopher_quality,
    "tfidf_top_terms": q_tfidf_top_terms,
    "pii_redact": q_pii_redact,
    "sample_stratified": q_sample_stratified,
    "token_count_bpe": q_token_count_bpe,
    "knn_brute_cosine": q_knn_brute_cosine,
}

ORACLE_SQL: dict[str, str] = {
    "cdc_lww_dedup": SQL_CDC_LWW_DEDUP,
    "cdc_apply_upsert": SQL_CDC_APPLY_UPSERT,
    "cdc_first_writer_wins": SQL_CDC_FIRST_WRITER_WINS,
    "cdc_epoch_batching": SQL_CDC_EPOCH_BATCHING,
    "cdc_exactly_once_counts": SQL_CDC_EXACTLY_ONCE_COUNTS,
    "cdc_delete_enrichment": SQL_DELETE_ENRICHMENT,
    "cdc_changelog": SQL_CDC_CHANGELOG,
    "cdc_replica_ts_range": SQL_CDC_REPLICA_TS_RANGE,
    "events_tumbling_window": SQL_EVENTS_TUMBLING_WINDOW,
    "ann_ivfpq_topk": SQL_ANN_IVFPQ_TOPK,
    "url_canonical_dedup": SQL_URL_CANONICAL_DEDUP,
    "host_cap_sample": SQL_HOST_CAP_SAMPLE,
    "contamination_check": SQL_CONTAMINATION_CHECK,
    "snapshot_split_stats": SQL_SNAPSHOT_SPLIT_STATS,
    "snapshot_hash_split": SQL_SNAPSHOT_HASH_SPLIT,
    "snapshot_pk_ranges": SQL_SNAPSHOT_PK_RANGES,
    "snapshot_with_offset": SQL_SNAPSHOT_WITH_OFFSET,
    "table_checksum": SQL_TABLE_CHECKSUM,
    "query_by_filter": SQL_QUERY_BY_FILTER,
    "rownum_pagination": SQL_ROWNUM_PAGINATION,
    "point_lookup": SQL_POINT_LOOKUP,
    "dedup_exact": SQL_DEDUP_EXACT,
    "doc_fingerprint": SQL_DOC_FINGERPRINT,
    "text_quality": SQL_TEXT_QUALITY,
    "token_count_by_lang": SQL_TOKEN_COUNT_BY_LANG,
    "text_repetition": SQL_TEXT_REPETITION,
    "dedup_ngram_crossdoc": SQL_DEDUP_NGRAM_CROSSDOC,
    "gopher_quality": SQL_GOPHER_QUALITY,
    "tfidf_top_terms": SQL_TFIDF_TOP_TERMS,
    "pii_redact": SQL_PII_REDACT,
    "sample_stratified": SQL_SAMPLE_STRATIFIED,
    "token_count_bpe": SQL_TOKEN_COUNT_BPE,
    "knn_brute_cosine": SQL_KNN_BRUTE_COSINE,
}

QUERIES.update({
    "dedup_minhash_jaccard": q_dedup_minhash_jaccard,
    "dedup_minhash_closure": q_dedup_minhash_closure,
    "dedup_simhash": q_dedup_simhash,
    "lang_id_stopword": q_lang_id_stopword,
    "ann_ivf_topk": q_ann_ivf_topk,
    "ann_lsh_topk": q_ann_lsh_topk,
    "dedup_embedding_cosine": q_dedup_embedding_cosine,
    "dedup_embedding_cosine_multiprobe": q_dedup_embedding_cosine_multiprobe,
    "dedup_simhash_pairs": q_dedup_simhash_pairs,
    "dedup_simhash_closure": q_dedup_simhash_closure,
    "dedup_embedding_closure": q_dedup_embedding_closure,
    "multimodal_image_meta": q_multimodal_image_meta,
    "multimodal_jpeg_meta": q_multimodal_jpeg_meta,
    "multimodal_mp4_meta": q_multimodal_mp4_meta,
    "multimodal_frame_sample": q_multimodal_frame_sample,
    "resume_from_timestamp": q_resume_from_timestamp,
    "table_stats": q_table_stats,
})

ORACLE_SQL.update({
    "dedup_minhash_jaccard": SQL_DEDUP_MINHASH_JACCARD,
    "dedup_minhash_closure": SQL_DEDUP_MINHASH_CLOSURE,
    "dedup_simhash": SQL_DEDUP_SIMHASH,
    "lang_id_stopword": SQL_LANG_ID_STOPWORD,
    "ann_ivf_topk": SQL_ANN_IVF_TOPK,
    "ann_lsh_topk": SQL_ANN_LSH_TOPK,
    "dedup_embedding_cosine": SQL_DEDUP_EMBEDDING_COSINE,
    "dedup_embedding_cosine_multiprobe": SQL_DEDUP_EMBEDDING_COSINE_MULTIPROBE,
    "dedup_simhash_pairs": SQL_DEDUP_SIMHASH_PAIRS,
    "dedup_simhash_closure": SQL_DEDUP_SIMHASH_CLOSURE,
    "dedup_embedding_closure": SQL_DEDUP_EMBEDDING_CLOSURE,
    "multimodal_image_meta": SQL_MULTIMODAL_IMAGE_META,
    "multimodal_jpeg_meta": SQL_MULTIMODAL_JPEG_META,
    "multimodal_mp4_meta": SQL_MULTIMODAL_MP4_META,
    "multimodal_frame_sample": SQL_MULTIMODAL_FRAME_SAMPLE,
    "resume_from_timestamp": SQL_RESUME_FROM_TIMESTAMP,
    "table_stats": SQL_TABLE_STATS,
})

# The round driver verifies at most 50 registry rows (r4 ran 50 of 53 and
# three operators silently shipped unverified — VERDICT r4 item 2), so
# QUERIES is pinned to exactly 50 entries. Intermediate stage views whose
# end-to-end operators are already registered (the LSH candidate stage
# under dedup_minhash_jaccard/_closure; LSH bucketing under ann_lsh_topk
# and dedup_embedding_cosine; IVF assignment under ann_ivf_topk) live
# here instead — same (spark, sf_dir) callables, same DuckDB oracles,
# gated every pytest run by tests/test_driver_contract.py.
AUX_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "embedding_lsh_buckets": q_embedding_lsh_buckets,
    "embedding_ivf_assign": q_embedding_ivf_assign,
    # round-5 additions past the 50-row driver cap: full operators, fully
    # oracle-gated here every pytest run
    "dup_span_detect": q_dup_span_detect,
    "dup_span_cut": q_dup_span_cut,
    "unigram_surprisal": q_unigram_surprisal,
    "bigram_surprisal": q_bigram_surprisal,
    "multimodal_h264_meta": q_multimodal_h264_meta,
    "text_normalize": q_text_normalize,
    "shard_assignment": q_shard_assignment,
    "temperature_mix": q_temperature_mix,
}

AUX_ORACLE_SQL: dict[str, str] = {
    "dedup_minhash_lsh": SQL_DEDUP_MINHASH_LSH,
    "embedding_lsh_buckets": SQL_EMBEDDING_LSH_BUCKETS,
    "embedding_ivf_assign": SQL_EMBEDDING_IVF_ASSIGN,
    "dup_span_detect": SQL_DUP_SPAN_DETECT,
    "dup_span_cut": SQL_DUP_SPAN_CUT,
    "unigram_surprisal": SQL_UNIGRAM_SURPRISAL,
    "bigram_surprisal": SQL_BIGRAM_SURPRISAL,
    "multimodal_h264_meta": SQL_MULTIMODAL_H264_META,
    "text_normalize": SQL_TEXT_NORMALIZE,
    "shard_assignment": SQL_SHARD_ASSIGNMENT,
    "temperature_mix": SQL_TEMPERATURE_MIX,
}

assert len(QUERIES) <= 50, "round driver verifies at most 50 registry rows"

"""Deterministic, distributed CDC event generator.

The analog of the reference's synthetic source + test/bench driver
(DummyConnector.batchRead/streamRead + TapEventBuilder + Rate —
/root/reference/connectors/dummy-connector/src/main/java/io/tapdata/dummy/DummyConnector.java:147-233),
re-expressed as a single `spark.range(n)` with every column a pure JVM-side
expression of `(seed, event_seq)`:

- No Python, no RDDs, no driver-side loops: generation itself is the
  distributed, CPU-bound front of the bench pipeline, so the scaling-
  efficiency measurement exercises real parallelism end-to-end.
- Fully deterministic and partitioning-independent: every value derives
  from `xxhash64(seed, event_seq, salt)` — the same event log is produced
  on local[8] and local[32], on any executor count (the foundation of the
  replay-equality correctness gate).

Event-log shape (EVENTS_SCHEMA):
- urls are Zipf-ish hot-key skewed: with probability `p_hot` an event
  targets the "hot" 1% of url ids (fixture F10's 80%/1% skew).
- op mix I/U/D via configurable thresholds.
- duplicate deliveries: with probability `p_dup` an event is an exact
  byte-copy of its predecessor (same exactly_once_id, same event_seq) —
  the redelivery the reference neutralizes via exactlyOnceId
  (MysqlReader.java:851-854).
- updates carry partial after-images (html/lang independently present or
  absent = "unchanged") and occasionally `removed_fields=['lang']`
  (explicit nulling, MongodbV4StreamReader.java:317-335).
- `warc_ts` is globally monotone in event_seq (it is the version/precombine
  timestamp; every DML event carries it).
- DDL events and post-DDL `extras` values are injected at caller-chosen
  sequence points.
- exactly_once_id has the reference's binlog `file_pos_row_event` shape.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tapdata_connectors_spark.schema import EVENTS_SCHEMA

_VOCAB = [
    "web", "page", "crawl", "data", "spark", "merge", "stream", "index",
    "batch", "delta", "event", "binlog", "replay", "upsert", "schema",
    "bucket", "shuffle", "arrow", "vector", "lake",
]

_LANGS = ["en", "de", "fr", "zh", "es", "pt", "ru", "ja"]


@dataclass(frozen=True)
class DdlSpec:
    """A DDL event injected at a fixed global sequence number."""

    seq: int
    kind: str  # ADD_COLUMN | RENAME_COLUMN | TYPE_WIDEN | DROP_COLUMN
    column: str
    new_name: str | None = None
    new_type: str | None = None
    # ADD COLUMN attribute specs (MysqlAddColumnDDLWrapper.java:35-98)
    new_default: str | None = None
    not_null: bool | None = None
    comment: str | None = None


@dataclass(frozen=True)
class GeneratorConfig:
    n_events: int = 10_000
    n_urls: int = 1_000
    epoch_size: int = 2_000
    seed: int = 42
    p_hot: float = 0.0  # fraction of events hitting the hot 1% of urls
    p_update: float = 0.35
    p_delete: float = 0.10  # rest are inserts
    p_dup: float = 0.0  # exact duplicate deliveries
    p_removed_lang: float = 0.05  # U events nulling `lang` explicitly
    # key-changing updates: before carries the old PK, the event targets a
    # fresh "moved" url (TapUpdateRecordEvent{before,after} with PK change —
    # MysqlReader.java:633-686; applied as delete+insert per hudi
    # ClientPerformer.java:107-132)
    p_key_change: float = 0.0
    # events with NO derivable PK (url null everywhere): the engine must
    # skip-and-count them (NormalWriteRecorder.java:210-226)
    p_null_pk: float = 0.0
    start_seq: int = 0
    ddl: tuple[DdlSpec, ...] = ()
    # extras columns: (name, first_seq, sql_type) — values appear in the
    # `extras` map for I/U events with seq > first_seq
    extras_cols: tuple[tuple[str, int, str], ...] = ()
    html_words: int = 40  # avg body length in vocab words
    # approximate page size in KB: adds repeated-paragraph filler so pages
    # carry Common-Crawl-like weight (repeat() is cheap to generate and
    # snappy-compressible, but decompressed bytes drive real extraction CPU)
    html_kb: int = 0
    # outlink anchors per page (opt-in, default 0 = byte-identical html
    # to earlier rounds): each page embeds n_links deterministic
    # `<a href="https://site-H.example/p/P">…</a>` anchors over
    # n_link_hosts synthetic hosts — the fixture for the link-graph
    # operators (operators/linkgraph.py)
    n_links: int = 0
    n_link_hosts: int = 50


def _u(salt: int, seed: int, col: F.Column) -> F.Column:
    """Uniform [0,1) pseudo-random, pure function of (seed, salt, col)."""
    return (
        F.pmod(F.xxhash64(F.lit(seed), F.lit(salt), col), F.lit(1_000_000))
        / F.lit(1_000_000.0)
    )


def _h(salt: int, seed: int, col: F.Column, mod: int) -> F.Column:
    return F.pmod(F.xxhash64(F.lit(seed), F.lit(salt), col), F.lit(mod))


def generate_events(spark: SparkSession, cfg: GeneratorConfig) -> DataFrame:
    """Build the CDC event log as a distributed DataFrame (EVENTS_SCHEMA)."""
    s = cfg.seed
    n_hot = max(1, cfg.n_urls // 100)

    df = spark.range(cfg.start_seq, cfg.start_seq + cfg.n_events).select(
        F.col("id").alias("raw_seq")
    )

    # duplicate deliveries: a dup row re-emits its predecessor byte-for-byte,
    # so every column below derives from `eseq`, not `raw_seq`. A dup whose
    # predecessor was ITSELF a dup would re-emit an event that was never
    # delivered under its own seq (realized p_dup drifts) — mask consecutive
    # dups so every duplicate copies a genuinely delivered event.
    def _dup_at(col):
        return (_u(1, s, col) < F.lit(cfg.p_dup)) & (col > F.lit(cfg.start_seq))

    is_dup = _dup_at(F.col("raw_seq")) & ~_dup_at(F.col("raw_seq") - 1)
    df = df.withColumn("event_seq", F.when(is_dup, F.col("raw_seq") - 1).otherwise(F.col("raw_seq")))
    eseq = F.col("event_seq")

    # ---- key: Zipf-ish mixture (hot 1% with prob p_hot) ----
    hot = _u(2, s, eseq) < F.lit(cfg.p_hot)
    url_id = F.when(hot, _h(3, s, eseq, n_hot)).otherwise(_h(4, s, eseq, cfg.n_urls))
    host = F.concat(F.lit("h"), F.pmod(url_id, F.lit(max(1, cfg.n_urls // 50))))
    url = F.concat(
        F.lit("https://"), host, F.lit(".example.org/p/"), url_id.cast("string")
    )
    df = df.withColumn("url", url)

    # ---- op mix ----
    u_op = _u(5, s, eseq)
    op = (
        F.when(u_op < F.lit(cfg.p_update), F.lit("U"))
        .when(u_op < F.lit(cfg.p_update + cfg.p_delete), F.lit("D"))
        .otherwise(F.lit("I"))
    )
    df = df.withColumn("op", op)

    # ---- key-change updates & null-PK events ----
    is_pkc = (F.col("op") == "U") & (_u(14, s, eseq) < F.lit(cfg.p_key_change))
    is_nullpk = (_u(15, s, eseq) < F.lit(cfg.p_null_pk)) & ~is_pkc
    before = F.when(
        is_pkc,
        F.struct(
            F.col("url").alias("url"),
            F.lit(None).cast("timestamp").alias("warc_ts"),
            F.lit(None).cast("binary").alias("html"),
            F.lit(None).cast("string").alias("lang"),
        ),
    ).cast(EVENTS_SCHEMA["before"].dataType)
    df = df.withColumn("_before", before).withColumn(
        "url",
        F.when(is_nullpk, F.lit(None).cast("string"))
        .when(is_pkc, F.concat(F.col("url"), F.lit("?mv="), eseq.cast("string")))
        .otherwise(F.col("url")),
    )

    # ---- version timestamp: globally monotone in event_seq ----
    df = df.withColumn(
        "warc_ts",
        F.timestamp_millis(F.lit(1_700_000_000_000) + eseq * F.lit(250)),
    )

    # ---- deterministic html payload (pure JVM expressions) ----
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    words = F.concat_ws(
        " ",
        F.transform(
            F.sequence(
                F.lit(0),
                (F.lit(cfg.html_words // 2) + _h(6, s, eseq, max(1, cfg.html_words))).cast("int"),
            ),
            lambda i: F.element_at(
                vocab, (F.pmod(F.xxhash64(F.lit(s), F.lit(7), eseq, i), F.lit(len(_VOCAB))) + 1).cast("int")
            ),
        ),
    )
    title = F.concat(F.lit("Page "), url_id.cast("string"), F.lit(" v"), eseq.cast("string"))
    parts = [
        F.lit("<html><head><title>"), title,
        F.lit("</title><style>body{margin:0}</style></head><body><h1>"), title,
        F.lit("</h1><p>"), words,
        F.lit(" &amp; more</p>"),
    ]
    # deterministic outlink anchors: target host/page are pure functions
    # of (seed, anchor slot, event seq), so replayed events carry
    # byte-identical anchors and the link graph is reproducible
    for j in range(cfg.n_links):
        parts += [
            F.lit('<a href="https://site-'),
            _h(140 + 2 * j, s, eseq, cfg.n_link_hosts).cast("string"),
            F.lit(".example/p/"),
            _h(141 + 2 * j, s, eseq, 1000).cast("string"),
            F.lit('">ref '),
            _h(141 + 2 * j, s, eseq, 1000).cast("string"),
            F.lit("</a>"),
        ]
    if cfg.html_kb > 0:
        para = (
            "<p>crawl archive capture snapshot render fetch parse index "
            "tokenize extract dedupe merge compact replay resume commit</p>"
        )  # 118 bytes
        n_para = F.lit(cfg.html_kb * 1024 // len(para)) + _h(13, s, eseq, 8).cast("int")
        parts += [F.repeat(F.lit(para), n_para.cast("int"))]
    parts += [
        F.lit("<script>var t="), eseq.cast("string"),
        F.lit(";</script></body></html>"),
    ]
    html_str = F.concat(*parts)
    html_bin = F.encode(html_str, "UTF-8")
    lang = F.element_at(F.array(*[F.lit(x) for x in _LANGS]), (_h(8, s, url_id, len(_LANGS)) + 1).cast("int"))

    # partial after-images for updates: html present w.p. 0.6, lang w.p. 0.3
    upd_has_html = _u(9, s, eseq) < 0.6
    upd_has_lang = _u(10, s, eseq) < 0.3
    removed = F.when(
        (F.col("op") == "U") & (_u(11, s, eseq) < F.lit(cfg.p_removed_lang)),
        F.array(F.lit("lang")),
    )
    # explicit removal wins over a partial set of the same column
    lang_in_after = F.when(
        ((F.col("op") == "I") | upd_has_lang) & removed.isNull(), lang
    )
    html_in_after = F.when((F.col("op") == "I") | upd_has_html, html_bin)

    after = F.when(
        F.col("op") != "D",
        F.struct(
            F.col("url").alias("url"),
            F.col("warc_ts").alias("warc_ts"),
            html_in_after.alias("html"),
            lang_in_after.alias("lang"),
        ),
    )

    # extras: generically-typed post-DDL column values
    extras = F.lit(None).cast(EVENTS_SCHEMA["extras"].dataType)
    for name, first_seq, _sql_type in cfg.extras_cols:
        val = _h(12, s, eseq, 100_000).cast("string")
        this = F.when(
            (eseq > F.lit(first_seq)) & (F.col("op") != "D"),
            F.create_map(F.lit(name), val),
        )
        extras = F.when(this.isNotNull(), F.map_concat(F.coalesce(extras, F.create_map()), this)).otherwise(extras)

    df = (
        df.withColumn("epoch", (eseq / F.lit(cfg.epoch_size)).cast("int"))
        .withColumn("before", F.col("_before"))
        .withColumn("after", after)
        .withColumn("removed_fields", removed)
        .withColumn("extras", extras)
        .withColumn("ddl", F.lit(None).cast(EVENTS_SCHEMA["ddl"].dataType))
        .withColumn(
            "exactly_once_id",
            F.concat(
                F.lit("binlog."),
                (eseq / F.lit(1_000_000)).cast("long").cast("string"),
                F.lit("_"), eseq.cast("string"), F.lit("_0_0"),
            ),
        )
        .withColumn("ts_ms", F.lit(1_700_000_000_000) + F.col("raw_seq") * F.lit(250))
        .drop("raw_seq")
    )

    dml = df.select(*[f.name for f in EVENTS_SCHEMA.fields])

    if cfg.ddl:
        ddl_rows = [
            (
                d.seq,
                int(d.seq // cfg.epoch_size),
                "DDL",
                None, None, None, None, None, None,
                (d.kind, d.column, d.new_name, d.new_type,
                 d.new_default, d.not_null, d.comment),
                f"ddl_{d.seq}",
                1_700_000_000_000 + d.seq * 250,
            )
            for d in cfg.ddl
        ]
        ddl_df = spark.createDataFrame(ddl_rows, EVENTS_SCHEMA)
        dml = dml.unionByName(ddl_df)

    return dml


def stage_events(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write the event log as the CDC staging area, partitioned by epoch —
    the analog of the reference's offset-ordered change stream landing zone.

    Alongside the data, one tiny marker file per epoch is committed under
    `_epochs/` with strictly increasing modification times. The streaming
    driver consumes the MARKER stream (not the data files) so epochs are
    delivered whole and in source order — Spark's file source orders by
    mtime and guarantees nothing for same-timestamp data files, which
    would let a later epoch's DML overtake an earlier epoch's DDL
    (binlog-order violation). This is the metadata-stream pattern
    (Auto-Loader/Delta-source shaped), not a hand-rolled scheduler."""
    import os as _os

    from pyspark.sql import functions as _F

    df.write.partitionBy("epoch").parquet(path, mode=mode)
    # per-epoch DDL presence, recorded in the marker so replay can skip the
    # DDL-scan job for DDL-free epochs (pure metadata, computed once here)
    ddl_epochs = {
        r["epoch"]
        for r in df.filter(_F.col("op") == "DDL").select("epoch").distinct().collect()
    }
    _write_epoch_markers(path, ddl_epochs)


def _write_epoch_markers(path: str, ddl_epochs: set[int]) -> None:
    import os as _os

    mdir = _os.path.join(path, "_epochs")
    _os.makedirs(mdir, exist_ok=True)
    epochs = sorted(
        int(d.split("=")[1]) for d in _os.listdir(path) if d.startswith("epoch=")
    )
    base = 1_600_000_000
    for k in epochs:
        mpath = _os.path.join(mdir, f"epoch-{k:09d}.txt")
        if not _os.path.exists(mpath):
            tmp = mpath + ".tmp"
            with open(tmp, "w") as f:
                f.write(f"{k} ddl" if k in ddl_epochs else str(k))
            _os.replace(tmp, mpath)
        _os.utime(mpath, (base + k, base + k))


def stage_events_multi(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Multi-table staging: `df` = EVENTS_SCHEMA plus a `table_id` column.
    One partitioned write fans the log out to per-table staging areas
    (`<path>/table_id=X/epoch=N/...`), each a normal single-table staging
    directory with its own epoch markers — the analog of the reference
    routing events per tableId before upload (TapEventCollector.java:170-202).
    """
    import os as _os

    from pyspark.sql import functions as _F

    df.write.partitionBy("table_id", "epoch").parquet(path, mode=mode)
    ddl = {
        (r["table_id"], r["epoch"])
        for r in df.filter(_F.col("op") == "DDL")
        .select("table_id", "epoch").distinct().collect()
    }
    for d in _os.listdir(path):
        if not d.startswith("table_id="):
            continue
        tid = d.split("=", 1)[1]
        _write_epoch_markers(
            _os.path.join(path, d), {e for t, e in ddl if t == tid}
        )

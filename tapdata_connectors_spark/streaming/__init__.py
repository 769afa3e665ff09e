from tapdata_connectors_spark.streaming.curation import (
    cut_spans,
    dedup_pages,
    find_cut_rewrites,
    find_dup_pages,
    find_new_dup_pages,
    find_low_quality_pages,
    prune_pages,
)
from tapdata_connectors_spark.streaming.driver import CdcPipeline
from tapdata_connectors_spark.streaming.gramidx import (
    create_gram_index,
    cut_spans_incremental,
    gramidx_watermark,
    refresh_gram_index,
)
from tapdata_connectors_spark.streaming.linkidx import (
    create_link_index,
    linkidx_watermark,
    live_edges,
    refresh_link_index,
)
from tapdata_connectors_spark.streaming.rollup import (
    create_rollup_table,
    refresh_rollup,
    rollup_watermark,
)
from tapdata_connectors_spark.streaming.stateful import seq_continuity_monitor

__all__ = ["CdcPipeline", "cut_spans", "dedup_pages", "find_cut_rewrites",
           "find_dup_pages", "find_new_dup_pages", "find_low_quality_pages",
           "prune_pages", "seq_continuity_monitor", "create_rollup_table",
           "refresh_rollup", "rollup_watermark", "create_gram_index",
           "cut_spans_incremental", "gramidx_watermark",
           "refresh_gram_index", "create_link_index", "linkidx_watermark",
           "live_edges", "refresh_link_index"]

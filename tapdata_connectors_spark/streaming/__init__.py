from tapdata_connectors_spark.streaming.curation import dedup_pages, find_dup_pages
from tapdata_connectors_spark.streaming.driver import CdcPipeline

__all__ = ["CdcPipeline", "dedup_pages", "find_dup_pages"]

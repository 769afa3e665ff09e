from tapdata_connectors_spark.streaming.driver import CdcPipeline

__all__ = ["CdcPipeline"]

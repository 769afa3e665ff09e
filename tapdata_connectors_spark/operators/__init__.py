from tapdata_connectors_spark.operators.dedup import ColumnSpec, lww_fold

__all__ = ["ColumnSpec", "lww_fold"]

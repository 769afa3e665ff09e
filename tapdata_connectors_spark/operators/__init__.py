from tapdata_connectors_spark.operators import corpus
from tapdata_connectors_spark.operators.dedup import ColumnSpec, lww_fold

__all__ = ["ColumnSpec", "corpus", "lww_fold"]

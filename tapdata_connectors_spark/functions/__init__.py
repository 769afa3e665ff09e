from tapdata_connectors_spark.functions.text_extract import extract_text_udf

__all__ = ["extract_text_udf"]

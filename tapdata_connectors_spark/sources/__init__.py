from tapdata_connectors_spark.sources.generator import GeneratorConfig, generate_events, stage_events

__all__ = ["GeneratorConfig", "generate_events", "stage_events"]

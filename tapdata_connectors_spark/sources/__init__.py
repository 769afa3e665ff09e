from tapdata_connectors_spark.sources.ddl_parse import (
    parse_ddl,
    parse_ddl_to_specs,
)
from tapdata_connectors_spark.sources.generator import (
    DdlSpec,
    GeneratorConfig,
    generate_events,
    stage_events,
)

__all__ = ["DdlSpec", "GeneratorConfig", "generate_events", "stage_events",
           "parse_ddl", "parse_ddl_to_specs"]

from datafusion_pinot_spark.sources.pinot_datasource import (
    PinotDataSource,
    register_pinot_source,
)

__all__ = ["PinotDataSource", "register_pinot_source"]

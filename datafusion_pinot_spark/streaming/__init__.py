from datafusion_pinot_spark.streaming.windowed import (  # noqa: F401
    stream_stream_conversions,
    streaming_dedup,
)

"""Structured Streaming operators over the events table.

The reference has no streaming at all (SURVEY.md §2.9 — REALTIME segments
are read as static files; streaming is roadmap). These operators are the
beyond-parity Spark-native equivalents: file-source streams with windowed
aggregation and watermarking. Batch queries in plans/queries.py share the
same aggregation expressions, so the streaming results are oracle-checkable
against the batch SQL.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F


def _file_stream(spark: SparkSession, parquet_path: str) -> DataFrame:
    """File-source stream from a single parquet file (the file-source API
    wants a directory, so stream the parent dir with a glob filter)."""
    import os

    schema = spark.read.parquet(parquet_path).schema
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", os.path.basename(parquet_path))
        .parquet(os.path.dirname(parquet_path))
    )


def _with_ts(events: DataFrame) -> DataFrame:
    """Normalize the ts column to a microsecond TIMESTAMP regardless of how
    the parquet reader surfaced it (nanosAsLong bigint, or NTZ from no-tz
    micros — watermarks require TIMESTAMP, not TIMESTAMP_NTZ)."""
    ts_type = dict(events.dtypes).get("ts")
    if ts_type == "bigint":
        # integer div — float division loses exactness on ns epoch longs
        events = events.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # UTC session tz ⇒ cast keeps wall-clock == epoch (DuckDB semantics)
        events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return events


def tumbling_window_agg(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Shared aggregation shape: per (tumbling window, event_type) stats."""
    events = _with_ts(events)
    return (
        events.groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("bucket_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def streaming_tumbling_window(
    spark: SparkSession, events_parquet: str, window: str = "1 hour"
) -> DataFrame:
    """Run the tumbling-window agg as a real Structured Streaming query
    (file source → complete-mode memory sink), drained synchronously.

    Returns the final result as a static DataFrame — identical in content to
    the batch version, which is exactly what the oracle check asserts.
    """
    stream = _file_stream(spark, events_parquet)
    agg = tumbling_window_agg(stream, window)
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def sliding_window_agg(events: DataFrame, window: str = "1 hour", slide: str = "30 minutes") -> DataFrame:
    """Sliding (overlapping) windows — each event lands in window/slide buckets."""
    events = _with_ts(events)
    return (
        events.groupBy(F.window("ts", window, slide), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("bucket_start"),
            "event_type",
            "n",
        )
    )


def watermarked_stream_agg(
    spark: SparkSession, events_parquet: str, window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Append-mode watermarked windowed count — the late-data-tolerant shape.

    Append mode only emits windows the watermark has passed; with a bounded
    file source the final windows stay pending, which is *correct* streaming
    semantics (they'd emit on the next trigger past the watermark). Returned
    for shape/smoke validation rather than full-content oracle checks.
    """
    stream = _file_stream(spark, events_parquet)
    agg = (
        _with_ts(stream).withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("bucket_start"),
            "event_type",
            "n",
        )
    )
    name = f"stream_wm_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def streaming_dedup(
    spark: SparkSession, parquet_path: str, keys: list[str]
) -> DataFrame:
    """Streaming first-seen dedup: ``dropDuplicates(keys)`` over a file
    stream, append-mode — the streaming-ingest half of exact dedup (the
    batch half is operators/dedup.py::exact_dedup).

    State holds one entry per distinct key (O(distinct keys), bounded for
    categorical keys; use dropDuplicatesWithinWatermark for unbounded key
    spaces). The appended output — exactly one row per distinct key,
    whichever arrived first — is returned as a static DataFrame after the
    stream drains."""
    stream = _file_stream(spark, parquet_path)
    deduped = _with_ts(stream).dropDuplicates(list(keys))
    name = f"stream_dd_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def stream_stream_conversions(
    spark: SparkSession, parquet_path: str, horizon: str = "1 hour"
) -> DataFrame:
    """Stream-stream inner join: click events joined to purchase events by
    the same user within ``horizon`` after the click.

    Both sides carry watermarks and the join condition is time-range-bounded,
    so Spark can expire join state (state ~ events inside the watermark
    horizon, not the whole stream) — the canonical scalable shape for
    conversion/attribution joins. Returns the drained append-mode output
    (c_user, c_ts, p_ts) as a static DataFrame."""
    stream = _with_ts(_file_stream(spark, parquet_path))
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", horizon)
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", horizon)
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") < F.col("c_ts") + F.expr(f"INTERVAL {horizon}")),
    ).select("c_user", "c_ts", "p_ts")
    name = f"stream_ss_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)

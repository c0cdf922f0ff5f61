"""Structured Streaming tier: streaming results equal batch results."""

from tests.conftest import SF_SMOKE


def test_streaming_equals_batch(spark):
    from datafusion_pinot_spark.plans.queries import t
    from datafusion_pinot_spark.streaming.windowed import (
        streaming_tumbling_window,
        tumbling_window_agg,
    )

    batch = tumbling_window_agg(t(spark, SF_SMOKE, "events"), "1 hour")
    stream = streaming_tumbling_window(spark, f"{SF_SMOKE}/events.parquet", "1 hour")

    key = lambda r: (r["bucket_start"], r["event_type"])
    b = sorted(((key(r), r["n"], r["sum_value"]) for r in batch.collect()))
    s = sorted(((key(r), r["n"], r["sum_value"]) for r in stream.collect()))
    assert b == s and len(b) > 0


def test_watermarked_append_shape(spark):
    from datafusion_pinot_spark.streaming.windowed import watermarked_stream_agg

    df = watermarked_stream_agg(spark, f"{SF_SMOKE}/events.parquet")
    # append mode: only watermark-passed windows emit; shape must hold
    assert df.columns == ["bucket_start", "event_type", "n"]


def test_stateful_totals_equal_batch_groupby(spark):
    from datafusion_pinot_spark.plans.queries import t
    from datafusion_pinot_spark.streaming.stateful import stateful_user_totals
    from pyspark.sql import functions as F

    got = {
        r["user_id"]: (r["n_events"], r["sum_event_id"])
        for r in stateful_user_totals(spark, f"{SF_SMOKE}/events.parquet").collect()
    }
    want = {
        r["user_id"]: (r["n"], r["s"])
        for r in t(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("event_id").alias("s"))
        .collect()
    }
    assert got == want and len(got) > 0

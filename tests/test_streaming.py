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


def test_watermarked_parity_drop_rule(spark):
    """r13: the full-oracle version of watermarked_stream_agg must OBSERVE
    real late drops, not just window withholding — with the parity split
    and the max-ts pivot batch, the odd rows land below the late-event
    watermark and are dropped, so the emitted counts equal the EVEN-row
    aggregate and sit strictly below the all-rows aggregate on many
    windows (merged-instead-of-dropped odd rows would re-create evicted
    windows and show up as duplicate groups)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from datafusion_pinot_spark.plans.queries import t
    from datafusion_pinot_spark.streaming.windowed import (
        _interval_us,
        watermarked_stream_agg,
    )

    rows = watermarked_stream_agg(spark, f"{SF_SMOKE}/events.parquet").collect()
    got = {(r["bucket_start"], r["event_type"]): r["n"] for r in rows}
    assert len(got) == len(rows), "duplicate emitted groups — drops failed"
    assert len(got) > 0

    ev = t(spark, SF_SMOKE, "events").select(
        F.col("ts").cast("timestamp").alias("ts"), "event_type", "event_id"
    )
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    even = ev.filter(
        (F.col("event_id") % 2 == 0)
        & (F.col("ts") < F.lit(str(max_ts)).cast("timestamp"))
    )
    base = even.agg(F.max("ts")).collect()[0][0]
    epoch = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)
    wm1 = (
        base.replace(tzinfo=dt.timezone.utc) - epoch
    ) // dt.timedelta(microseconds=1) - _interval_us("2 hours")

    def agg(frame):
        return {
            (r["b"], r["event_type"]): r["n"]
            for r in frame.groupBy(
                F.unix_timestamp(F.date_trunc("hour", "ts")).alias("b"),
                "event_type",
            )
            .agg(F.count("*").alias("n"))
            .collect()
        }

    full, even_only = agg(ev), agg(even)
    want = {
        k: n
        for k, n in even_only.items()
        if (k[0] + 3600) * 1_000_000 <= wm1
    }
    assert got == want
    # the drops must be exercised, not vacuous: at least one emitted
    # window is missing odd rows the batch aggregate would include
    assert any(n < full[k] for k, n in got.items())


def test_watermarked_agg_nanos_ts_variant(spark, tmp_path):
    """r14 (advice): under spark.sql.legacy.parquet.nanosAsLong (set by
    session.py), a TIMESTAMP(NANOS) events file surfaces ts as BIGINT. The
    max-ts pivot logic must normalize through _with_ts first — the raw read
    used to collect max_ts as an int, str-cast it to a NULL timestamp, make
    all three split conditions NULL, and crash on three empty part files.
    The nanos result must equal the micros result exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datafusion_pinot_spark.streaming.windowed import watermarked_stream_agg

    src = f"{SF_SMOKE}/events.parquet"
    tbl = pq.read_table(src)
    i = tbl.schema.get_field_index("ts")
    ns = tbl.set_column(
        i, "ts", tbl.column("ts").cast(pa.timestamp("ns"))
    )
    dst = str(tmp_path / "events_ns.parquet")
    pq.write_table(ns, dst, use_deprecated_int96_timestamps=False,
                   coerce_timestamps=None)
    assert dict(spark.read.parquet(dst).dtypes)["ts"] == "bigint"

    key = lambda r: (r["bucket_start"], r["event_type"], r["n"])
    got = sorted(map(key, watermarked_stream_agg(spark, dst).collect()))
    want = sorted(map(key, watermarked_stream_agg(spark, src).collect()))
    assert got == want and len(got) > 0


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


def test_watermark_drops_late_data(spark, tmp_path):
    """Append-mode watermarking end-to-end: a row arriving after its window
    passed the watermark is dropped, not merged into the emitted result."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "wm_src")
    import os
    os.makedirs(src)

    def write_batch(name, rows):
        spark.createDataFrame(rows, "ts timestamp, k string").coalesce(1).write.mode(
            "append"
        ).parquet(src + "/_tmp_" + name)
        # move file into the watched dir as one atomic-ish batch
        import glob, shutil
        for f in glob.glob(src + "/_tmp_" + name + "/*.parquet"):
            shutil.move(f, os.path.join(src, name + ".parquet"))
        shutil.rmtree(src + "/_tmp_" + name)

    import datetime as dt
    T = lambda h, m: dt.datetime(2024, 1, 1, h, m)
    write_batch("b1", [(T(10, 0), "a"), (T(11, 0), "a")])

    stream = spark.readStream.schema("ts timestamp, k string").parquet(src)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 minute").alias("w"), "k")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "k", "n")
    )
    name = "wm_test_sink"
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        # watermark now ~10:50 → the 10:00 window is finalized and emitted
        first = {
            (r["ws"], r["k"]): r["n"] for r in spark.table(name).collect()
        }
        assert first.get((T(10, 0), "a")) == 1

        # a LATE row for the finalized 10:00 window + an on-time row
        write_batch("b2", [(T(10, 0), "a"), (T(11, 30), "a")])
        q.processAllAvailable()
        rows = [
            r for r in spark.table(name).collect() if r["ws"] == T(10, 0)
        ]
        # the late row was dropped: the emitted 10:00 window still has n=1
        # and was not re-emitted with n=2
        assert [r["n"] for r in rows] == [1]
    finally:
        q.stop()


def test_stream_writer_builds_indexes(spark, tmp_path):
    import os
    import time

    from pinot_segment import SegmentReader

    from datafusion_pinot_spark.sources import register_pinot_source
    from datafusion_pinot_spark.sources.pinot_datasource import (
        _discover_segments,
    )

    register_pinot_source(spark)
    src_dir = str(tmp_path / "in")
    out = str(tmp_path / "docs_OFFLINE")
    os.makedirs(src_dir)
    spark.createDataFrame(
        [(1, "spark scan", '{"k": 7}')], "id long, body string, props string"
    ).write.json(os.path.join(src_dir, "batch0"))
    stream = (
        spark.readStream.schema("id long, body string, props string")
        .json(os.path.join(src_dir, "*"))
        .writeStream.format("pinot")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .option("text_index", "body")
        .option("json_index", "props")
        .option("range_index", "id")
        .trigger(availableNow=True)
        .start()
    )
    stream.awaitTermination(120)
    segs = _discover_segments(out)
    r = SegmentReader.open(segs[0])
    assert r.metadata.get_column("body").has_text_index
    assert r.metadata.get_column("props").has_json_index
    assert r.metadata.get_column("id").has_range_index
    assert list(r.text_match_mask("body", ["spark"])) == [True]
    assert list(r.json_match_mask("props", "$.k", "7")) == [True]


def test_streaming_funnel_skips_nonfunnel_only_users(spark, tmp_path):
    """A user whose events are all outside the funnel step set must not
    appear in streaming_funnel_totals at all (matching the batch fold
    and the oracle, which drop such users) — the stream filters BEFORE
    the key grouping so no state row is ever created."""
    from datetime import datetime

    from datafusion_pinot_spark.streaming.stateful import (
        streaming_funnel_totals,
    )

    rows = [
        (1, datetime(2024, 1, 1, 0, 1), 1, "view", 0.0, "{}"),
        (2, datetime(2024, 1, 1, 0, 2), 1, "click", 0.0, "{}"),
        (3, datetime(2024, 1, 1, 0, 3), 1, "purchase", 0.0, "{}"),
        # user 2: error/signup only -> must be ABSENT from the output
        (4, datetime(2024, 1, 1, 0, 1), 2, "error", 0.0, "{}"),
        (5, datetime(2024, 1, 1, 0, 2), 2, "signup", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    # _file_stream expects a single parquet FILE (like the testdata
    # layout), not a Spark output directory — extract the part file
    import glob
    import shutil

    outdir = str(tmp_path / "out")
    df.coalesce(1).write.mode("overwrite").parquet(outdir)
    part = glob.glob(f"{outdir}/part-*.parquet")[0]
    path = str(tmp_path / "events.parquet")
    shutil.copyfile(part, path)
    got = {
        r["user_id"]: (r["completions"], r["depth"])
        for r in streaming_funnel_totals(spark, path).collect()
    }
    assert got == {1: (1, 0)}


def test_interval_us_parses_spark_intervals():
    from datafusion_pinot_spark.streaming.windowed import _interval_us

    assert _interval_us("1 hour") == 3_600_000_000
    assert _interval_us("30 minutes") == 1_800_000_000
    assert _interval_us("2 hours") == 7_200_000_000
    assert _interval_us("1 day") == 86_400_000_000


def test_left_outer_closed_honors_nondefault_params(spark, testdata):
    """The closed-subset threshold must derive from the ACTUAL horizon and
    watermark (both were once hardcoded to the defaults): run with
    30min/1h and compare against a DuckDB oracle built with the SAME
    parameters."""
    import duckdb

    from datafusion_pinot_spark.streaming.windowed import (
        stream_stream_left_outer_closed,
        stream_stream_left_outer_closed_oracle_sql,
    )

    path = "/root/testdata/sf0.001/events.parquet"
    got = sorted(
        tuple(r)
        for r in stream_stream_left_outer_closed(
            spark, path, horizon="30 minutes", watermark="1 hour"
        ).collect()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{path}'")
    sql = stream_stream_left_outer_closed_oracle_sql(
        horizon_us=1_800_000_000, watermark_us=3_600_000_000
    )
    want = sorted(tuple(r) for r in con.sql(sql).fetchall())
    assert got == want
    assert len(got) > 0


def test_stream_upsert_enrich_last_wins_and_counts(spark, tmp_path):
    """The poisoned v1 dim rows (tier -1) must be superseded by v2's
    last-wins read before the stream joins them: no output tier is -1,
    and the enriched counts equal the batch groupBy."""
    from datafusion_pinot_spark.plans.queries import t
    from datafusion_pinot_spark.streaming.windowed import stream_upsert_enrich
    from pyspark.sql import functions as F

    out = stream_upsert_enrich(
        spark, f"{SF_SMOKE}/events.parquet", str(tmp_path)
    )
    rows = out.collect()
    assert rows and all(r["tier"] >= 0 for r in rows)
    batch = {
        (r["tier"], r["event_type"]): r["n"]
        for r in t(spark, SF_SMOKE, "events")
        .groupBy(
            (F.col("user_id") % 5).alias("tier"), "event_type"
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert {(r["tier"], r["event_type"]): r["n"] for r in rows} == batch

"""Structured Streaming operators over the events table.

The reference has no streaming at all (SURVEY.md §2.9 — REALTIME segments
are read as static files; streaming is roadmap). These operators are the
beyond-parity Spark-native equivalents: file-source streams with windowed
aggregation and watermarking. Batch queries in plans/queries.py share the
same aggregation expressions, so the streaming results are oracle-checkable
against the batch SQL.
"""

from __future__ import annotations

import os
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
    spark: SparkSession,
    events_parquet: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Append-mode watermarked windowed count with a FULL oracle that
    OBSERVES real late-data drops (r12 verdict #7): the input is split by
    ``event_id`` PARITY — batch 1 is the even rows spanning the whole
    month, batch 2 the odd rows — so after batch 1 the watermark sits
    ``watermark`` below the even-row max ts, i.e. near END of data, and
    nearly every odd row arrives late.

    Spark ≥3.4 keeps TWO watermarks per stateful operator: late-event
    filtering uses the PREVIOUS batch's watermark
    (``eventTimeWatermarkForLateEvents``) while state eviction uses the
    current one — so a late row is only dropped from the SECOND batch
    after the watermark-setting data (measured here: a 2-batch
    even-then-odd split drops nothing and merges full counts). Three
    files therefore:

    1. the even rows below the global max ts — after this batch the
       watermark is ``wm1 = max(batch-1 ts) − watermark``;
    2. a PIVOT batch holding just the global-max-ts row(s) — a data
       batch, so it always executes; its eviction (in-force ``wm1``)
       deterministically emits every window ending at or below ``wm1``
       with the even-only counts, and after it ``wm1`` becomes the
       late-event bound;
    3. the odd rows — every one landing in an emitted window is now
       genuinely DROPPED (``numRowsDroppedByWatermark`` > 0; were they
       merged instead, they would re-create evicted windows and re-emit
       duplicate groups, which the hash gate would catch).

    Windows above ``wm1`` (whose emission rides the race with the final
    no-data flush and which hold accepted odd rows) are filtered out.
    The DuckDB oracle reproduces the rest in closed form: even-row
    counts over windows ending at or below ``wm1`` — a result that
    differs from the all-rows batch aggregate on almost every window,
    so the hash gate proves the late-drop semantics themselves, not
    just the window withholding the time-split sibling checks."""
    # _with_ts here too: under nanosAsLong the raw read surfaces ts as
    # bigint, max_ts would collect as int, and str-round-tripping it through
    # cast('timestamp') yields NULL — turning every split condition NULL.
    ev = _with_ts(spark.read.parquet(events_parquet))
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    mx = F.lit(max_ts)
    parity = F.col("event_id") % 2
    stream, bases = _ordered_condition_split_stream(
        spark,
        events_parquet,
        [
            (parity == 0) & (F.col("ts") < mx),
            F.col("ts") == mx,
            (parity != 0) & (F.col("ts") < mx),
        ],
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("bucket_start"),
            F.unix_timestamp(F.col("window.end")).alias("bucket_end"),
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
    wm1_us = bases[0] - _interval_us(watermark)
    return (
        spark.table(name)
        .filter(F.col("bucket_end") * 1_000_000 <= F.lit(wm1_us))
        .select(
            "bucket_start", "event_type", F.col("n").cast("long").alias("n")
        )
    )


def _interval_us(interval: str) -> int:
    """Microseconds of a simple Spark interval string ("2 hours",
    "30 minutes", "1 day") — shared by the closed-subset fixtures so the
    watermark arithmetic always matches the string handed to Spark."""
    n, unit = interval.strip().split()
    mult = {
        "second": 1_000_000,
        "minute": 60_000_000,
        "hour": 3_600_000_000,
        "day": 86_400_000_000,
    }[unit.rstrip("s")]
    return int(n) * mult


def _ordered_condition_split_stream(
    spark: SparkSession, events_parquet: str, conds: list
):
    """The ordered micro-batch fixture behind every closed-subset streaming
    oracle here, generalized to arbitrary row partitions: write one file
    per boolean condition Column, force their modification order, and
    return ``(stream, bases_us)`` where ``stream`` replays them as ordered
    batches (maxFilesPerTrigger=1) and ``bases_us[i]`` is ``max(ts)`` of
    batch ``i+1`` in epoch micros — callers take running maxima minus
    their watermark delay to get the watermark in force after each batch.
    The final batch's max is omitted (no batch runs after it, so its
    watermark is never in force for data)."""
    import datetime as dt
    import os
    import tempfile

    ev = _with_ts(spark.read.parquet(events_parquet))
    split_dir = tempfile.mkdtemp(prefix=f"split{len(conds)}_")
    parts = []
    for i, cond in enumerate(conds):
        p = os.path.join(split_dir, f"part{i + 1}")
        ev.filter(cond).coalesce(1).write.mode("overwrite").parquet(p)
        parts.append(p)
    now = 1_000_000_000
    for i, sub in enumerate(parts):
        mtime = now - 100 * (len(parts) - i)
        for f in os.listdir(sub):
            if not f.startswith((".", "_")):
                os.utime(os.path.join(sub, f), (mtime, mtime))
    schema = spark.read.parquet(parts[0]).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(split_dir)
    )
    epoch = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)
    bases_us = []
    for p in parts[:-1]:
        part_max = spark.read.parquet(p).agg(F.max("ts")).collect()[0][0]
        bases_us.append(
            (part_max.replace(tzinfo=dt.timezone.utc) - epoch)
            // dt.timedelta(microseconds=1)
        )
    return stream, bases_us


def _two_batch_split_stream(spark: SparkSession, events_parquet: str, cut: str):
    """Two-batch time-split wrapper of
    :func:`_ordered_condition_split_stream` — returns
    ``(stream, wm1_base_us)`` for the single-cut fixtures."""
    cut_ts = F.lit(cut).cast("timestamp")
    stream, bases = _ordered_condition_split_stream(
        spark,
        events_parquet,
        [F.col("ts") <= cut_ts, F.col("ts") > cut_ts],
    )
    return stream, bases[0]


def watermarked_closed_windows(
    spark: SparkSession,
    events_parquet: str,
    cut: str = "2024-01-18 00:00:00",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Append-mode watermarked windowed count, restricted to the windows the
    watermark has PROVABLY closed — the oracle-checkable companion of
    :func:`watermarked_stream_agg` (r5 verdict #4).

    The input is split at ``cut`` into two files streamed as two ordered
    micro-batches (``maxFilesPerTrigger=1``; mtimes force the order). After
    batch 1 the watermark is ``max(ts ≤ cut) − watermark``; batch 2 — a
    data batch, so it always executes — emits every window ending at or
    below that watermark, and any batch-2 row falling into such a window is
    below the watermark by construction (row ts < window end ≤ watermark)
    and is dropped as late. The emitted contents of those windows therefore
    equal an aggregation of the ``ts ≤ cut`` subset alone — a closed-form a
    batch engine (the DuckDB oracle) reproduces exactly. Windows the final
    no-data flush may or may not have emitted before the stream drained sit
    strictly above the filter and never reach the output.
    """
    stream, wm1_base_us = _two_batch_split_stream(spark, events_parquet, cut)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("bucket_start"),
            F.unix_timestamp(F.col("window.end")).alias("bucket_end"),
            "event_type",
            "n",
        )
    )
    name = f"stream_wmc_{uuid.uuid4().hex[:8]}"
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
    # the batch-1 watermark, micro-exact, honoring the watermark PARAM
    wm_us = wm1_base_us - _interval_us(watermark)
    return (
        spark.table(name)
        .filter(F.col("bucket_end") * 1_000_000 <= F.lit(wm_us))
        .select("bucket_start", "event_type", "n")
    )


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


def stream_stream_left_outer_closed(
    spark: SparkSession,
    events_parquet: str,
    cut: str = "2024-01-18 00:00:00",
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked LEFT OUTER stream-stream join (clicks left-joined to
    purchases by user within ``horizon``), restricted to clicks whose
    outer deadline the watermark has PROVABLY passed — the closed-subset
    trick of :func:`watermarked_closed_windows` applied to outer joins.

    The input splits at ``cut`` into two ordered micro-batches. After
    batch 1 the watermark is ``wm1 = max(ts <= cut) - watermark``; kept
    clicks satisfy ``c_ts + horizon <= wm1``, so (a) their join state is
    expired during batch 2 (a data batch — it always runs), emitting the
    null-extended row if unmatched, and (b) any qualifying purchase has
    ``p_ts < c_ts + horizon <= wm1 < cut`` and therefore sits in batch 1
    — batch-2 rows cannot match them. The kept subset thus equals a
    plain batch LEFT JOIN of the full data, which DuckDB reproduces
    row-for-row.

    Scale: watermarks bound the join state to the horizon on both sides
    (the canonical attribution-join shape); the split/utime here is test
    scaffolding, not an operator path."""
    stream, wm1_base_us = _two_batch_split_stream(spark, events_parquet, cut)
    stream = _with_ts(stream)
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("c_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", watermark)
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") < F.col("c_ts") + F.expr(f"INTERVAL {horizon}")),
        "leftOuter",
    ).select(
        "c_id",
        "c_user",
        F.unix_micros(F.col("c_ts")).alias("c_us"),
        F.unix_micros(F.col("p_ts")).alias("p_us"),
    )
    name = f"stream_lo_{uuid.uuid4().hex[:8]}"
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
    # closed-subset threshold honoring the ACTUAL parameters (a
    # hardcoded delay here would silently break the guarantee for any
    # non-default horizon/watermark)
    wm1_us = wm1_base_us - _interval_us(watermark)
    horizon_us = _interval_us(horizon)
    return (
        spark.table(name)
        .filter(F.col("c_us") + horizon_us <= F.lit(wm1_us))
        .select("c_id", "c_user", "c_us", "p_us")
    )


def stream_stream_left_outer_closed_oracle_sql(
    cut: str = "2024-01-18 00:00:00",
    horizon_us: int = 3_600_000_000,
    watermark_us: int = 7_200_000_000,
) -> str:
    """Batch LEFT JOIN over the full data, restricted to the clicks whose
    outer deadline is below the batch-1 watermark (see the operator
    docstring for why the kept subset is exactly closed)."""
    return f"""
WITH wm AS (
  SELECT max(epoch_us(ts)) - {watermark_us} AS wm1_us
  FROM events WHERE ts <= TIMESTAMP '{cut}'
), c AS (
  SELECT event_id AS c_id, user_id AS c_user, epoch_us(ts) AS c_us
  FROM events WHERE event_type = 'click'
), p AS (
  SELECT user_id AS p_user, epoch_us(ts) AS p_us
  FROM events WHERE event_type = 'purchase'
)
SELECT c.c_id, c.c_user, c.c_us, p.p_us
FROM c
LEFT JOIN p ON c.c_user = p.p_user
           AND p.p_us >= c.c_us AND p.p_us < c.c_us + {horizon_us}
CROSS JOIN wm
WHERE c.c_us + {horizon_us} <= wm.wm1_us"""


def stream_upsert_enrich(
    spark: SparkSession, events_parquet: str, dim_root: str
) -> DataFrame:
    """Stream-static enrichment against a pinot UPSERT dimension — the
    lookup-join shape of a realtime enrichment pipeline: the event stream
    inner-joins a last-wins user dimension served from pinot storage, and
    a complete-mode aggregation rolls the enriched stream up per
    (tier, event_type).

    The dimension is written TWICE — two sequential sink commits, not one
    unioned write (the upsert point): version 1 (overwrite) carries a
    poisoned tier of -1 for every user; version 2 (append) lands as later
    segments with the real ``user_id % 5``. Only a correct last-wins
    upsert read ACROSS segment writes (``load_upsert_table`` on compare
    column ``ver``) yields the oracle's tiers, so the query's hash gate
    covers the storage upsert semantics AND the stream-static join in one
    pass. Scale shape: the dim is broadcast-joined per micro-batch (small
    side by construction); stream state is the aggregation's, bounded by
    the (tier, type) group count.

    Spark disallows stateful aggregation directly over a stream-static
    join in complete mode only when the static side is itself streaming;
    here the static side is a batch DataFrame, the supported shape."""
    from datafusion_pinot_spark.catalog import PinotCatalog
    from datafusion_pinot_spark.sources import register_pinot_source

    register_pinot_source(spark)
    out = os.path.join(dim_root, "userdim_OFFLINE")
    users = (
        spark.read.parquet(events_parquet).select("user_id").distinct()
    )
    v1 = users.select(
        "user_id",
        F.lit(-1).cast("long").alias("tier"),
        F.lit(1).cast("long").alias("ver"),
    )
    v2 = users.select(
        "user_id",
        (F.col("user_id") % 5).alias("tier"),
        F.lit(2).cast("long").alias("ver"),
    )
    v1.repartition(2).write.format("pinot").mode("overwrite").save(out)
    v2.repartition(2).write.format("pinot").mode("append").save(out)
    dim = PinotCatalog.filesystem(dim_root).load_upsert_table(
        spark, "userdim", "user_id", "ver"
    )
    stream = _with_ts(_file_stream(spark, events_parquet))
    enriched = stream.join(
        F.broadcast(dim.select("user_id", "tier")), "user_id"
    )
    agg = enriched.groupBy("tier", "event_type").agg(
        F.count("*").alias("n")
    )
    name = f"stream_enrich_{uuid.uuid4().hex[:8]}"
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
    return spark.table(name).orderBy("tier", "event_type")


def stream_cdc_fold(
    spark: SparkSession, lineitem_parquet: str, table_root: str
) -> DataFrame:
    """Streaming CDC consistency, end to end: a lineitem projection lands
    as a pinot table (snapshot 1), a retained range DELETE rewrites it
    (snapshot 2), and the table's CDC STREAM
    (``readStream.format("pinot").option("cdc", "true")``, bootstrapping
    from the virtual empty snapshot) is folded per flag with
    ``sum(sign * x)`` in a complete-mode stateful aggregation. The hash
    gate proves the whole feed contract through the streaming path: the
    bootstrap inserts plus the rewrite's delete+insert pairs must fold to
    EXACTLY the post-delete table — one leaked or double-counted row in
    any micro-batch and the hash misses.

    Scale shape: each micro-batch scans only changed segments (the
    snapshot-log diff); stream state is the aggregation's, bounded by the
    flag cardinality; offsets are one snapshot id."""
    from datafusion_pinot_spark.maintenance import delete_rows
    from datafusion_pinot_spark.sources import register_pinot_source

    register_pinot_source(spark)
    out = os.path.join(table_root, "cdcli_OFFLINE")
    (
        spark.read.parquet(lineitem_parquet)
        .select("l_orderkey", "l_returnflag")
        .repartitionByRange(8, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.format("pinot")
        .mode("overwrite")
        .save(out)
    )
    delete_rows(spark, out, "l_orderkey", 200, 1700, retain_replaced=True)

    feed = (
        spark.readStream.format("pinot").option("cdc", "true").load(out)
    )
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    agg = feed.groupBy("l_returnflag").agg(
        F.sum(sign).cast("long").alias("n_after"),
        F.sum(sign * F.col("l_orderkey")).cast("long").alias(
            "sum_okey_after"
        ),
    )
    name = f"cdc_fold_{uuid.uuid4().hex[:8]}"
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
    return spark.table(name).orderBy("l_returnflag")


def stream_cms_buckets(
    spark: SparkSession,
    docs_parquet: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """STREAMING count-min sketch maintenance: the CMS bucket table of
    operators/sketches.py::cms_frequency_audit kept up to date by a
    Structured Streaming aggregation over the document stream — the
    always-on heavy-hitter substrate. The whole point of the sketch is
    that streaming state is BOUNDED at depth x width counters no matter
    how much text flows through; this is the one sketch shape where
    complete-mode is scale-correct, because the result set itself is the
    fixed-size state.

    Built-ins only (tokenize -> 3-gram transform -> constant depth-way
    fanout -> streaming groupBy count): no custom state function — Spark's
    own streaming aggregation IS the sketch update rule, so whole-stage
    codegen applies to the hash map. Drained bounded run hash-equals the
    batch bucket CTE in DuckDB."""
    from datafusion_pinot_spark.functions import tokens
    from datafusion_pinot_spark.operators.sketches import _cms_pos

    stream = _file_stream(spark, docs_parquet)
    toks = stream.select(tokens(F.col("text")).alias("w")).filter(
        F.size("w") >= 3
    )
    grams = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 2),"
                " i -> concat_ws(' ', element_at(w, i),"
                " element_at(w, i + 1), element_at(w, i + 2)))"
            )
        ).alias("tok")
    )
    fanned = grams.select(
        F.posexplode(
            F.array(*[_cms_pos(F.col("tok"), r, width) for r in range(depth)])
        ).alias("r", "pos")
    )
    agg = fanned.groupBy("r", "pos").agg(
        F.count(F.lit(1)).alias("bucket_cnt")
    )
    name = f"scms_{uuid.uuid4().hex[:8]}"
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
    return (
        spark.table(name)
        .select(
            F.col("r").cast("int").alias("r"),
            F.col("pos").cast("long").alias("pos"),
            F.col("bucket_cnt").cast("long").alias("bucket_cnt"),
        )
        .orderBy("r", "pos")
    )


def stream_cms_buckets_oracle_sql(depth: int = 4, width: int = 1024) -> str:
    from datafusion_pinot_spark.operators.sketches import _cms_pos_sql

    bucket_rows = " UNION ALL ".join(
        f"SELECT {r} AS r, {_cms_pos_sql('tok', r, width)} AS pos FROM grams"
        for r in range(depth)
    )
    return f"""
WITH words AS (
  SELECT regexp_split_to_array(trim(lower(text)), '\\s+') AS w
  FROM documents WHERE length(trim(lower(text))) > 0
), grams AS (
  SELECT w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS tok
  FROM words, LATERAL unnest(range(0, greatest(len(w) - 2, 0))) AS t(i)
  WHERE len(w) >= 3
), fanned AS (
  {bucket_rows}
)
SELECT CAST(r AS INTEGER) AS r, CAST(pos AS BIGINT) AS pos,
       CAST(count(*) AS BIGINT) AS bucket_cnt
FROM fanned GROUP BY r, pos ORDER BY r, pos"""


def stream_srm_monitor(
    spark: SparkSession, events_parquet: str, buckets: int = 2
) -> DataFrame:
    """STREAMING sample-ratio-mismatch monitor — the always-on twin of
    validation.ab_test_srm_check: per event-type cohort, arm counts over
    DISTINCT users maintained by Spark's own streaming deduplication
    (dropDuplicates state) feeding a running aggregation — two chained
    built-in stateful operators, no custom state function. The drained
    bounded run hash-equals the batch chi-square table, so the stateful
    composition itself is oracle-gated.

    Scale: dedup state is O(distinct (event_type, user)) — the honest
    price of exact cohort counts on an unbounded stream (a production
    deployment bounds it with withWatermark + event-time columns or swaps
    the exact dedup for the CMS sketch above); the aggregation state is
    |event_types| rows."""
    stream = _file_stream(spark, events_parquet)
    arm = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("arm|"), F.col("user_id").cast("string"))),
                1,
                12,
            ),
            16,
            10,
        ).cast("long")
        % buckets
    )
    dedup = stream.select("event_type", "user_id").dropDuplicates(
        ["event_type", "user_id"]
    )
    agg = dedup.select("event_type", arm.alias("arm")).groupBy(
        "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum((F.col("arm") == 0).cast("long")).alias("n_arm_a"),
        F.sum((F.col("arm") == 1).cast("long")).alias("n_arm_b"),
    )
    name = f"ssrm_{uuid.uuid4().hex[:8]}"
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
    return (
        spark.table(name)
        .select(
            "event_type",
            "n_users",
            "n_arm_a",
            "n_arm_b",
            F.expr(
                "CAST((n_arm_a - n_arm_b) * (n_arm_a - n_arm_b)"
                " * CAST(1000 AS BIGINT) div n_users AS BIGINT)"
            ).alias("chi2_milli"),
            F.expr(
                "(n_arm_a - n_arm_b) * (n_arm_a - n_arm_b)"
                " * CAST(1000 AS BIGINT) div n_users > 3841"
            ).alias("srm_flag"),
        )
        .orderBy("event_type")
    )


def stream_cluster_assign_counts(
    spark: SparkSession, embeddings_parquet: str, k: int = 4
) -> DataFrame:
    """STREAMING cluster-inference monitor — the streaming twin of the
    batch ``similarity.kmeans_cluster_report``'s assignment step: each
    arriving embedding is assigned to its nearest of ``k`` FIXED
    centroids (the model; here the deterministic init vectors, vec_id
    < k) and a running per-cluster count + exact squared-L2 inertia is
    maintained — the "is my traffic drifting between clusters?" gauge a
    production embedding pipeline runs beside the encoder. The drained
    bounded run hash-equals the batch assignment SQL, so the streaming
    plan is oracle-gated like the batch one.

    Scale shape: the centroid table is collected ONCE batch-side (k*dim
    milli ints — bytes, the model-broadcast pattern) and folded into the
    row expression, so assignment is completely STATELESS and narrow:
    k integer fold-dot-products per row inside whole-stage codegen, no
    stream-static join, no per-key state. The only stateful operator is
    the k-row running aggregation. Quantization uses the repo's milli-int
    contract (floor(x*1000+0.5)), distances and ties (lowest cluster id)
    are pure integer ops — bit-identical across engines and batch/stream.
    """
    import math

    cent_rows = (
        spark.read.parquet(embeddings_parquet)
        .filter(F.col("vec_id") < k)
        .select("vec_id", "embedding")
        .collect()
    )
    cents = sorted(
        (
            r["vec_id"],
            [int(math.floor(float(x) * 1000.0 + 0.5)) for x in r["embedding"]],
        )
        for r in cent_rows
    )
    if not cents:
        # No rows with vec_id < k → no model. The batch twin's assignment
        # step returns an empty frame on the same input; mirroring that
        # here beats the F.least() TypeError a zero-arg build would raise.
        return spark.createDataFrame(
            [],
            "cluster_id long, n_vectors long, inertia_milli2 long",
        )
    stream = _file_stream(spark, embeddings_parquet)
    xm = F.transform(
        F.col("embedding"),
        lambda x: F.floor(
            x.cast("double") * F.lit(1000.0) + F.lit(0.5)
        ).cast("long"),
    )
    with_xm = stream.select(F.col("vec_id"), xm.alias("xm"))
    d_cols = []
    for c_id, cm in cents:
        arr = F.array(*[F.lit(v).cast("long") for v in cm])
        d = F.aggregate(
            F.zip_with(F.col("xm"), arr, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, z: acc + z,
        )
        d_cols.append((c_id, d))
    dmin = F.least(*[d for _, d in d_cols])
    assign = F.lit(None).cast("long")
    for c_id, d in reversed(d_cols):
        assign = F.when(d == dmin, F.lit(c_id).cast("long")).otherwise(
            assign
        )
    scored = with_xm.select(
        assign.alias("cluster_id"), dmin.alias("d2")
    )
    agg = scored.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum("d2").alias("inertia_milli2"),
    )
    name = f"sclu_{uuid.uuid4().hex[:8]}"
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
    return (
        spark.table(name)
        .select(
            "cluster_id",
            F.col("n_vectors").cast("long").alias("n_vectors"),
            F.col("inertia_milli2").cast("long").alias("inertia_milli2"),
        )
        .orderBy("cluster_id")
    )


def stream_cluster_assign_counts_oracle_sql(k: int = 4) -> str:
    """Batch oracle: the same fixed-centroid assignment (iteration 0 of
    the k-means oracle), as one join + argmin + rollup."""
    return f"""
WITH comp AS (
  SELECT vec_id, CAST(t.i - 1 AS INTEGER) AS dim,
         CAST(floor(CAST(embedding[t.i] AS DOUBLE) * 1000.0 + 0.5)
              AS BIGINT) AS xm
  FROM embeddings,
       LATERAL unnest(generate_series(1, len(embedding))) AS t(i)
), cents0 AS (
  SELECT vec_id AS c_id, dim AS c_dim, xm AS cm FROM comp
  WHERE vec_id < {k}
), d2 AS (
  SELECT comp.vec_id, c.c_id,
         CAST(sum((comp.xm - c.cm) * (comp.xm - c.cm)) AS BIGINT) AS d2
  FROM comp JOIN cents0 c ON comp.dim = c.c_dim
  GROUP BY comp.vec_id, c.c_id
), assign AS (
  SELECT vec_id, c_id, d2 FROM (
    SELECT vec_id, c_id, d2,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d2 ASC, c_id ASC) AS rnk
    FROM d2) WHERE rnk = 1
)
SELECT CAST(c_id AS BIGINT) AS cluster_id,
       CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(sum(d2) AS BIGINT) AS inertia_milli2
FROM assign GROUP BY c_id ORDER BY cluster_id"""


def stream_hll_registers(spark: SparkSession, events_parquet: str) -> DataFrame:
    """STREAMING HyperLogLog register maintenance — the streaming twin of
    ``sketches.hll_from_scratch_estimate``'s register build: each arriving
    event hashes to (bucket, rho) statelessly and a running per-bucket MAX
    is the ONLY stateful operator. This is the canonical bounded-state
    streaming sketch: the state store holds exactly m = 64 rows forever,
    no watermark needed, no per-key growth — the state story the exact
    streaming-dedup operators cannot offer. The drained bounded run
    hash-equals the batch register table, so the streaming sketch build
    is oracle-gated end to end (the estimate itself stays a batch-side
    read of these registers)."""
    from datafusion_pinot_spark.operators.sketches import _hll_registers

    stream = _file_stream(spark, events_parquet)
    keyed = stream.select(F.col("user_id").cast("string").alias("k"))
    agg = _hll_registers(keyed)
    name = f"shll_{uuid.uuid4().hex[:8]}"
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
    return (
        spark.table(name)
        .select("bucket", F.col("register").cast("long").alias("register"))
        .orderBy("bucket")
    )


def stream_hll_registers_oracle_sql() -> str:
    from datafusion_pinot_spark.operators.sketches import (
        HLL_BUCKETS,
        HLL_REST_BITS,
    )

    return f"""
WITH keyed AS (
  SELECT CAST(user_id AS VARCHAR) AS k FROM events
), hashed AS (
  SELECT CAST(('0x' || substr(md5(k), 1, 12)) AS BIGINT) AS v FROM keyed
), slotted AS (
  SELECT CAST(v % {HLL_BUCKETS} AS INTEGER) AS bucket,
         v // {HLL_BUCKETS} AS rest
  FROM hashed
)
SELECT bucket,
       CAST(max(CASE WHEN rest = 0 THEN {HLL_REST_BITS + 1}
                ELSE {HLL_REST_BITS + 1} - length(bin(rest)) END)
            AS BIGINT) AS register
FROM slotted GROUP BY bucket ORDER BY bucket"""


def stream_seq_pair_support(
    spark: SparkSession, events_parquet: str
) -> DataFrame:
    """STREAMING first-touch table feeding sequential-pattern support —
    the streaming twin of ``funnel.seq_pair_support``: the per-(user,
    event_type) FIRST timestamp is maintained as a running min (the
    first-touch attribution state every always-on funnel keeps; state is
    O(users x types) rows, the honest price of exact first-touch on an
    unbounded stream), and the drained table feeds the same bounded
    |types|²-fanout pair join as the batch operator. Hash-equals the
    batch SQL end to end, so the stateful first-touch maintenance is
    oracle-gated."""
    stream = _file_stream(spark, events_parquet)
    stream = _with_ts(stream)
    firsts = stream.select(
        "user_id", "event_type", F.unix_micros("ts").alias("t")
    ).groupBy("user_id", "event_type").agg(F.min("t").alias("t0"))
    name = f"sft_{uuid.uuid4().hex[:8]}"
    q = (
        firsts.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # two independent reads of the memory table: a self-join of ONE
    # DataFrame object trips Spark's ambiguous-column resolution here
    left = spark.table(name)
    right = spark.table(name).select(
        F.col("user_id").alias("u2"),
        F.col("event_type").alias("type_b"),
        F.col("t0").alias("t0_b"),
    )
    pairs = (
        left.join(
            right,
            (F.col("user_id") == F.col("u2"))
            & (F.col("event_type") != F.col("type_b")),
        )
        .select(
            F.col("event_type").alias("a"),
            F.col("type_b").alias("b"),
            (F.col("t0") < F.col("t0_b")).cast("long").alias("before"),
        )
    )
    return (
        pairs.groupBy("a", "b")
        .agg(
            F.sum("before").cast("long").alias("support"),
            F.count(F.lit(1)).cast("long").alias("n_both"),
        )
        .select(
            "a",
            "b",
            "support",
            "n_both",
            F.expr(
                "CAST(CASE WHEN n_both > 0 THEN support * 1000000 div n_both"
                " ELSE 0 END AS BIGINT)"
            ).alias("support_ppm"),
        )
        .orderBy("a", "b")
    )


def stream_dau_daily(spark: SparkSession, events_parquet: str) -> DataFrame:
    """STREAMING daily-active-users maintenance: streaming deduplication
    on (day, user) feeding a per-day running count — the same two chained
    built-in stateful operators as the SRM monitor, maintaining the DAU
    series every growth dashboard tails. Dedup state is O(distinct
    (day, user)) — bounded per day by the user base, and in production
    clipped by a watermark on the day column; the drained bounded run
    hash-equals the batch DISTINCT-count SQL."""
    stream = _with_ts(_file_stream(spark, events_parquet))
    dedup = stream.select(
        F.to_date("ts").alias("day"), "user_id"
    ).dropDuplicates(["day", "user_id"])
    agg = dedup.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    name = f"sdau_{uuid.uuid4().hex[:8]}"
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
    return (
        spark.table(name)
        .select("day", F.col("dau").cast("long").alias("dau"))
        .orderBy("day")
    )


def stream_dau_daily_oracle_sql() -> str:
    return """
SELECT CAST(ts AS DATE) AS day,
       CAST(count(DISTINCT user_id) AS BIGINT) AS dau
FROM events GROUP BY 1 ORDER BY day"""

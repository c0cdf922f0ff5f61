"""Temporal join operators Spark lacks natively: as-of join and range join.

These are the classic "custom operator" cases (build-spec: compose built-in
DataFrame ops first, Pandas UDFs only if semantics can't be expressed). Both
are expressed purely with built-ins:

- *As-of join*: the union-and-window formulation — interleave both sides on
  the time axis per key, carry the right side's latest values forward with
  ``last_value(ignorenulls) OVER (... ROWS UNBOUNDED PRECEDING)``, keep left
  rows. One shuffle on the key, no point-lookup joins, no O(L*R) pair
  blowup — the standard scalable shape (each key's timeline is processed
  once, so a 100 TB fact side streams through a single window pass).
- *Range join* (|t_left - t_right| <= tolerance): bucketize both sides to
  ``tolerance``-sized bins, equi-join each left row to its own and adjacent
  bins, then filter the exact predicate. Turns an inequality join (which
  Spark would execute as a broadcast nested loop) into an equi-shuffle join
  with a 3x candidate factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from datafusion_pinot_spark.functions import money


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the most recent right row (right_ts <=
    left_ts) with the same key ``on``. Left rows keep NULLs when no right row
    precedes them.

    Ties (right_ts == left_ts) match, mirroring ASOF JOIN ... ON l.ts >= r.ts
    semantics; among right rows at the same timestamp the last in the
    interleave order wins (made deterministic by sorting right rows first).
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]

    lhs = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*left.columns).alias("__l"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in right_cols],
    )
    rhs = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{t}" for c, t in left.dtypes) + ">"
        ).alias("__l"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    # Right rows sort before left rows at equal timestamps (__is_left asc) so
    # a right row at exactly left_ts is visible to that left row.
    w = (
        Window.partitionBy("__key")
        .orderBy("__ts", "__is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = lhs.unionByName(rhs).select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__last_{c}")
            for c in right_cols
        ],
    )
    out = merged.filter(F.col("__is_left") == 1).select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__last_{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
    return out


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    tolerance_s: int,
    left_key: str,
) -> DataFrame:
    """Count right rows within ±tolerance_s seconds of each left row
    (excluding exact self-matches on ``left_key``), via bin-bucketed
    equi-join instead of an inequality join."""
    tol_us = tolerance_s * 1_000_000
    lb = left.select(
        F.col(left_key).alias("__lk"),
        F.unix_micros(F.col(left_ts)).alias("__lus"),
    ).withColumn("__bin", F.expr(f"__lus div {tol_us}"))
    rb = right.select(
        F.col(left_key).alias("__rk"),
        F.unix_micros(F.col(right_ts)).alias("__rus"),
    ).withColumn("__rbin", F.expr(f"__rus div {tol_us}"))
    lb = lb.withColumn(
        "__probe",
        F.explode(F.array(F.col("__bin") - 1, F.col("__bin"), F.col("__bin") + 1)),
    )
    joined = lb.join(rb, lb["__probe"] == rb["__rbin"])
    near = joined.filter(
        (F.abs(F.col("__lus") - F.col("__rus")) <= tol_us)
        & (F.col("__lk") != F.col("__rk"))
    )
    return near.groupBy(F.col("__lk").alias(left_key)).agg(
        F.count("*").alias("n_nearby")
    )


def counter_rate_per_key(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """PromQL-style counter semantics per key: consecutive sample deltas
    in strict (ts, id) order, split into monotonic increase vs resets,
    plus an integer-exact rate.

    Output per key: ``n_samples, increase_cents`` (sum of positive
    deltas), ``reset_drop_cents`` (magnitude of negative deltas — counter
    resets), ``span_us`` (first→last sample), and ``rate_milli_cents_per_s
    = increase_cents * 10^9 div span_us`` — all integers (values fix to
    cents before differencing), so both engines agree bit-for-bit.

    Scale shape: one shuffle on the key, a single LAG window pass per
    key's timeline, then a per-key aggregate — the same single-pass
    stream shape as the as-of join above."""
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    cents = F.round(F.col(value_col) * 100, 0).cast("long")
    us = F.unix_micros(F.col(ts_col))
    d = cents - F.lag(cents).over(w)
    per = events.select(
        F.col(key_col).alias("key"),
        us.alias("us"),
        d.alias("d"),
    )
    span = F.max("us") - F.min("us")
    inc = F.sum(F.when(F.col("d") > 0, F.col("d")).otherwise(F.lit(0)))
    drop = F.sum(F.when(F.col("d") < 0, -F.col("d")).otherwise(F.lit(0)))
    return (
        per.groupBy(F.col("key").alias(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            inc.cast("long").alias("increase_cents"),
            drop.cast("long").alias("reset_drop_cents"),
            span.cast("long").alias("span_us"),
        )
        .withColumn(
            "rate_milli_cents_per_s",
            F.expr(
                "CASE WHEN span_us = 0 THEN CAST(0 AS BIGINT) "
                "ELSE increase_cents * 1000000000L div span_us END"
            ),
        )
        .orderBy(key_col)
    )


def counter_rate_per_key_oracle_sql(
    table: str = "events",
    key_col: str = "user_id",
) -> str:
    """DuckDB equivalent of :func:`counter_rate_per_key` (identical
    cent-fixing, LAG ordering, and integer rate arithmetic)."""
    return f"""
WITH s AS (
  SELECT {key_col} AS key, epoch_us(ts) AS us,
         CAST(round(value * 100, 0) AS BIGINT)
           - lag(CAST(round(value * 100, 0) AS BIGINT))
             OVER (PARTITION BY {key_col} ORDER BY ts, event_id) AS d
  FROM {table}
), g AS (
  SELECT key AS {key_col},
         CAST(count(*) AS BIGINT) AS n_samples,
         CAST(sum(CASE WHEN d > 0 THEN d ELSE 0 END) AS BIGINT)
           AS increase_cents,
         CAST(sum(CASE WHEN d < 0 THEN -d ELSE 0 END) AS BIGINT)
           AS reset_drop_cents,
         CAST(max(us) - min(us) AS BIGINT) AS span_us
  FROM s GROUP BY key
)
SELECT {key_col}, n_samples, increase_cents, reset_drop_cents, span_us,
       CASE WHEN span_us = 0 THEN CAST(0 AS BIGINT)
            ELSE increase_cents * 1000000000 // span_us END
         AS rate_milli_cents_per_s
FROM g ORDER BY {key_col}"""


def scd2_user_state(
    events: DataFrame,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension type 2 build: collapse each key's ordered
    state stream into validity intervals (gaps-and-islands).

    Consecutive runs of the same state merge into one version row:
    ``key, version, state, valid_from_us, valid_to_us (NULL = current),
    n_events`` — the standard SCD2 dimension a warehouse derives from a
    change stream. One shuffle on the key; two window passes over each
    key's timeline (run detection, then interval bounds via LEAD).

    Scale shape: identical to the funnel fold — a 100 TB changelog
    shuffles once on the key and each timeline is scanned twice, never
    materialized driver-side.
    """
    us = F.unix_micros(F.col(ts_col))
    runs = events.select(
        F.col(key_col).alias("key"),
        us.alias("us"),
        F.col(id_col).alias("id"),
        F.col(state_col).alias("state"),
    ).withColumn(
        "new_run",
        F.when(
            F.lag("state").over(
                Window.partitionBy("key").orderBy("us", "id")
            ).eqNullSafe(F.col("state")),
            0,
        ).otherwise(1),
    )
    w_key = Window.partitionBy("key").orderBy("us", "id")
    runs = runs.withColumn(
        "version",
        F.sum("new_run").over(
            w_key.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("int"),
    )
    # state is constant within a run (that's what defines the island), so
    # min() == the run's state and is order-insensitive, unlike first()
    iv = runs.groupBy("key", "version").agg(
        F.min("state").alias("state"),
        F.min("us").alias("valid_from_us"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    w_iv = Window.partitionBy("key").orderBy("version")
    return iv.select(
        F.col("key").alias(key_col),
        "version",
        "state",
        "valid_from_us",
        F.lead("valid_from_us").over(w_iv).alias("valid_to_us"),
        "n_events",
    ).orderBy(key_col, "version")


def scd2_user_state_oracle_sql(
    table: str = "events",
    key_col: str = "user_id",
    state_col: str = "event_type",
) -> str:
    """DuckDB gaps-and-islands equivalent of :func:`scd2_user_state`."""
    return f"""
WITH s AS (
  SELECT {key_col} AS key, epoch_us(ts) AS us, event_id AS id,
         {state_col} AS state,
         CASE WHEN lag({state_col}) OVER
                (PARTITION BY {key_col} ORDER BY ts, event_id)
              IS NOT DISTINCT FROM {state_col} THEN 0 ELSE 1 END AS new_run
  FROM {table}
), r AS (
  SELECT *, CAST(sum(new_run) OVER
         (PARTITION BY key ORDER BY us, id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INTEGER)
         AS version
  FROM s
), iv AS (
  SELECT key, version, min(state) AS state, min(us) AS valid_from_us,
         CAST(count(*) AS BIGINT) AS n_events
  FROM r GROUP BY key, version
)
SELECT key AS {key_col}, version, state, valid_from_us,
       lead(valid_from_us) OVER (PARTITION BY key ORDER BY version)
         AS valid_to_us,
       n_events
FROM iv ORDER BY {key_col}, version"""


def scd2_point_in_time(
    events: DataFrame,
    fact_state: str = "purchase",
    key_col: str = "user_id",
    state_col: str = "event_type",
) -> DataFrame:
    """Point-in-time join of fact rows against the SCD2 dimension built
    from the key's OTHER events: each ``fact_state`` event is attributed
    to the state interval containing its timestamp
    (``valid_from_us <= ts < valid_to_us``, open-ended current version).

    Output per state: ``n_facts, value_cents`` (facts before any interval
    report state ``'none'``). The join is an equi-join on the key with a
    range residual — sort-merge/broadcast on the key, never a nested
    loop, so a 100 TB fact side co-partitions with the dimension.
    """
    dims = scd2_user_state(
        events.filter(F.col(state_col) != fact_state),
        key_col=key_col,
        state_col=state_col,
    ).select(
        F.col(key_col).alias("d_key"),
        "state",
        "valid_from_us",
        "valid_to_us",
    )
    facts = events.filter(F.col(state_col) == fact_state).select(
        F.col(key_col).alias("f_key"),
        F.unix_micros(F.col("ts")).alias("f_us"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    cond = (
        (F.col("f_key") == F.col("d_key"))
        & (F.col("valid_from_us") <= F.col("f_us"))
        & (
            F.col("valid_to_us").isNull()
            | (F.col("f_us") < F.col("valid_to_us"))
        )
    )
    return (
        facts.join(dims, cond, "left")
        .groupBy(F.coalesce(F.col("state"), F.lit("none")).alias("state"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_facts"),
            F.sum("cents").cast("long").alias("value_cents"),
        )
        .orderBy("state")
    )


def scd2_point_in_time_oracle_sql(
    table: str = "events",
    fact_state: str = "purchase",
    key_col: str = "user_id",
    state_col: str = "event_type",
) -> str:
    return f"""
WITH s AS (
  SELECT {key_col} AS key, epoch_us(ts) AS us, event_id AS id,
         {state_col} AS state,
         CASE WHEN lag({state_col}) OVER
                (PARTITION BY {key_col} ORDER BY ts, event_id)
              IS NOT DISTINCT FROM {state_col} THEN 0 ELSE 1 END AS new_run
  FROM {table} WHERE {state_col} <> '{fact_state}'
), r AS (
  SELECT *, sum(new_run) OVER
         (PARTITION BY key ORDER BY us, id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version
  FROM s
), iv AS (
  SELECT key, version, min(state) AS state, min(us) AS valid_from_us
  FROM r GROUP BY key, version
), dim AS (
  SELECT key, state, valid_from_us,
         lead(valid_from_us) OVER (PARTITION BY key ORDER BY version)
           AS valid_to_us
  FROM iv
), f AS (
  SELECT {key_col} AS key, epoch_us(ts) AS us,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM {table} WHERE {state_col} = '{fact_state}'
)
SELECT coalesce(d.state, 'none') AS state,
       CAST(count(*) AS BIGINT) AS n_facts,
       CAST(sum(f.cents) AS BIGINT) AS value_cents
FROM f LEFT JOIN dim d
  ON f.key = d.key AND d.valid_from_us <= f.us
 AND (d.valid_to_us IS NULL OR f.us < d.valid_to_us)
GROUP BY coalesce(d.state, 'none') ORDER BY state"""


def max_concurrency_daily(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    activity_us: int = 3_600_000_000,
) -> DataFrame:
    """Peak concurrent active users per day, sweep-line style.

    Each event opens an activity window ``[ts, ts + activity_us)``;
    overlapping windows of the same user merge (gaps-and-islands with a
    running-max end, so chained overlaps merge transitively). Merged
    intervals are clipped to each day they touch (bounded explode —
    an interval spans at most ``1 + ceil(activity_us / day)`` days), then
    each day independently runs the sweep: +1 at interval start, -1 at
    end, running sum ordered by (us, delta) with the default RANGE frame
    so ties resolve as a block (ends before starts at the same
    microsecond — half-open semantics), max over the day.

    Scale shape: one shuffle on the user for the merge, one shuffle on
    the day for the sweep; both windows scan each partition once. No
    global ordering exists anywhere — days are independent, which is the
    property that lets a year of 100 TB events fan out across the
    cluster.
    """
    us = F.unix_micros(F.col(ts_col))
    day_us = 86_400_000_000
    w_key = Window.partitionBy("key").orderBy("us")
    pts = events.select(F.col(key_col).alias("key"), us.alias("us"))
    # running max of window-end over PRIOR events; a new island starts
    # when this event begins after every prior window ended
    prior_end = F.max(F.col("us") + F.lit(activity_us)).over(
        w_key.rowsBetween(Window.unboundedPreceding, -1)
    )
    isl = pts.withColumn(
        "new_island",
        F.when(prior_end.isNull() | (F.col("us") >= prior_end), 1).otherwise(
            0
        ),
    ).withColumn(
        "island",
        F.sum("new_island").over(
            w_key.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    intervals = isl.groupBy("key", "island").agg(
        F.min("us").alias("start_us"),
        (F.max("us") + F.lit(activity_us)).alias("end_us"),
    )
    # explode to touched days, clip to day bounds
    days = intervals.select(
        "start_us",
        "end_us",
        F.explode(
            F.sequence(
                F.expr(f"start_us div {day_us}"),
                F.expr(f"(end_us - 1) div {day_us}"),
            )
        ).alias("day"),
    ).select(
        "day",
        F.greatest(F.col("start_us"), F.expr(f"day * {day_us}")).alias("s"),
        F.least(F.col("end_us"), F.expr(f"(day + 1) * {day_us}")).alias("e"),
    )
    deltas = days.select(
        "day", F.col("s").alias("us"), F.lit(1).alias("delta")
    ).unionAll(
        days.select("day", F.col("e").alias("us"), F.lit(-1).alias("delta"))
    )
    w_sweep = Window.partitionBy("day").orderBy("us", "delta")
    swept = deltas.withColumn("conc", F.sum("delta").over(w_sweep))
    return (
        swept.groupBy("day")
        .agg(
            F.max("conc").cast("int").alias("max_concurrency"),
            (F.sum(F.when(F.col("delta") == 1, 1).otherwise(0)))
            .cast("long")
            .alias("n_sessions"),
        )
        .select(
            F.to_date(F.timestamp_micros(F.expr(f"day * {day_us}"))).alias(
                "date"
            ),
            "max_concurrency",
            "n_sessions",
        )
        .orderBy("date")
    )


def max_concurrency_daily_oracle_sql(
    table: str = "events",
    key_col: str = "user_id",
    activity_us: int = 3_600_000_000,
) -> str:
    day_us = 86_400_000_000
    return f"""
WITH pts AS (
  SELECT {key_col} AS key, epoch_us(ts) AS us FROM {table}
), isl AS (
  SELECT key, us,
         CASE WHEN max(us + {activity_us}) OVER
                (PARTITION BY key ORDER BY us
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              IS NULL
           OR us >= max(us + {activity_us}) OVER
                (PARTITION BY key ORDER BY us
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         THEN 1 ELSE 0 END AS new_island
  FROM pts
), isl2 AS (
  SELECT key, us, sum(new_island) OVER
         (PARTITION BY key ORDER BY us
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM isl
), intervals AS (
  SELECT key, island, min(us) AS start_us,
         max(us) + {activity_us} AS end_us
  FROM isl2 GROUP BY key, island
), clipped AS (
  SELECT d.day,
         greatest(start_us, d.day * {day_us}) AS s,
         least(end_us, (d.day + 1) * {day_us}) AS e
  FROM intervals, LATERAL (
    SELECT unnest(range(start_us // {day_us},
                        (end_us - 1) // {day_us} + 1)) AS day) d
), deltas AS (
  SELECT day, s AS us, 1 AS delta FROM clipped
  UNION ALL
  SELECT day, e AS us, -1 AS delta FROM clipped
), swept AS (
  SELECT day, delta, sum(delta) OVER
         (PARTITION BY day ORDER BY us, delta) AS conc
  FROM deltas
)
SELECT CAST(epoch_ms((day * {day_us}) // 1000) AS DATE) AS date,
       CAST(max(conc) AS INTEGER) AS max_concurrency,
       CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sessions
FROM swept GROUP BY day ORDER BY date"""


def ohlc_bars(
    events: DataFrame,
    category_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    bar_us: int = 86_400_000_000,
) -> DataFrame:
    """OHLC bars per (category, bar): open/close are the first/last value
    in strict (ts, id) order — deterministic under ties, unlike
    ``min_by``/``arg_min`` whose tie-breaking is engine-defined — plus
    high/low/volume/n, all integer cents.

    One shuffle on (category, bar); the open/close ranks come from a
    single window pass over each bar (rn ascending + the bar's row count
    give both ends). The canonical time-series rollup a Pinot
    metrics table serves.
    """
    bar = F.expr(f"unix_micros({ts_col}) div {bar_us}")
    cents = F.round(F.col(value_col) * 100, 0).cast("long")
    base = events.select(
        F.col(category_col).alias("category"),
        bar.alias("bar"),
        F.unix_micros(F.col(ts_col)).alias("us"),
        F.col(id_col).alias("id"),
        cents.alias("cents"),
    )
    w = Window.partitionBy("category", "bar").orderBy("us", "id")
    wc = Window.partitionBy("category", "bar")
    ranked = base.withColumn("rn", F.row_number().over(w)).withColumn(
        "cnt", F.count(F.lit(1)).over(wc)
    )
    return (
        ranked.groupBy("category", "bar")
        .agg(
            F.min(F.when(F.col("rn") == 1, F.col("cents"))).alias(
                "open_cents"
            ),
            F.max("cents").alias("high_cents"),
            F.min("cents").alias("low_cents"),
            F.min(F.when(F.col("rn") == F.col("cnt"), F.col("cents"))).alias(
                "close_cents"
            ),
            F.sum("cents").cast("long").alias("volume_cents"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .select(
            "category",
            F.to_date(
                F.timestamp_micros(F.expr(f"bar * {bar_us}"))
            ).alias("bar_date"),
            "open_cents",
            "high_cents",
            "low_cents",
            "close_cents",
            "volume_cents",
            "n_events",
        )
        .orderBy("category", "bar_date")
    )


def ohlc_bars_oracle_sql(
    table: str = "events",
    category_col: str = "event_type",
    bar_us: int = 86_400_000_000,
) -> str:
    return f"""
WITH base AS (
  SELECT {category_col} AS category,
         epoch_us(ts) // {bar_us} AS bar,
         epoch_us(ts) AS us, event_id AS id,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM {table}
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY category, bar
                               ORDER BY us, id) AS rn,
         count(*) OVER (PARTITION BY category, bar) AS cnt
  FROM base
)
SELECT category,
       CAST(epoch_ms((bar * {bar_us}) // 1000) AS DATE) AS bar_date,
       min(CASE WHEN rn = 1 THEN cents END) AS open_cents,
       max(cents) AS high_cents,
       min(cents) AS low_cents,
       min(CASE WHEN rn = cnt THEN cents END) AS close_cents,
       CAST(sum(cents) AS BIGINT) AS volume_cents,
       CAST(count(*) AS BIGINT) AS n_events
FROM ranked GROUP BY category, bar
ORDER BY category, bar_date"""


def time_weighted_average(
    events: DataFrame,
    category_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Time-weighted average per category: each sample's value holds until
    the category's next sample (step interpolation); the last sample has
    no duration and drops out. Weights are whole seconds; the weighted
    sum accumulates as DECIMAL(38,0) (order-independent, no BIGINT
    overflow at any scale) and only the final ratio goes through a
    rounded double.

    One shuffle on the category, one LEAD pass per timeline, then a
    map-side-combining aggregate.
    """
    w = Window.partitionBy("category").orderBy("us", "id")
    base = events.select(
        F.col(category_col).alias("category"),
        F.unix_micros(F.col(ts_col)).alias("us"),
        F.col(id_col).alias("id"),
        F.round(F.col(value_col) * 100, 0).cast("long").alias("cents"),
    )
    stepped = base.withColumn(
        "dur_s", F.expr("(lead(us) OVER (PARTITION BY category "
                        "ORDER BY us, id) - us) div 1000000")
    ).filter(F.col("dur_s").isNotNull())
    # cast BEFORE multiplying: a BIGINT product cents * dur_s can overflow
    # (ANSI throws; the DuckDB oracle multiplies in HUGEINT), a
    # DECIMAL(38,0) product cannot at any realistic scale
    big = F.col("cents").cast("decimal(38,0)") * F.col("dur_s")
    return (
        stepped.groupBy("category")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
            F.sum("dur_s").cast("long").alias("total_dur_s"),
            F.round(
                (F.sum(big).cast("double") / F.sum("dur_s")) / 100.0, 4
            ).alias("twa_value"),
        )
        .orderBy("category")
    )


def time_weighted_average_oracle_sql(
    table: str = "events",
    category_col: str = "event_type",
) -> str:
    return f"""
WITH base AS (
  SELECT {category_col} AS category, epoch_us(ts) AS us, event_id AS id,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM {table}
), stepped AS (
  SELECT category, cents,
         (lead(us) OVER (PARTITION BY category ORDER BY us, id) - us)
           // 1000000 AS dur_s
  FROM base
)
SELECT category,
       CAST(count(*) AS BIGINT) AS n_intervals,
       CAST(sum(dur_s) AS BIGINT) AS total_dur_s,
       round((CAST(sum(CAST(cents AS HUGEINT) * dur_s) AS DOUBLE)
              / sum(dur_s)) / 100.0, 4) AS twa_value
FROM stepped WHERE dur_s IS NOT NULL
GROUP BY category ORDER BY category"""


CLAMP_SCHEMA = (
    "user_id long, n_events long, final_balance_milli long,"
    " n_clamps long, max_balance_milli long"
)


def clamped_balance_report(events, k: int = 20):
    """Floor-clamped running balance per user (the wallet/inventory fold:
    balance never goes below zero; a draw against an empty balance clamps
    and counts) — the canonical ORDER-DEPENDENT stateful kernel that no
    window function expresses (the clamp makes each prefix depend on
    every earlier clamp decision). Implemented as Spark's batch
    ``groupBy().applyInPandas``: sequential per key BY THE PROBLEM'S
    NATURE, parallel across keys — exactly that API's contract, and the
    Arrow batch transfer keeps the per-group fold in numpy/pandas, not
    row-at-a-time Python through the JVM boundary.

    Deltas: +floor(value·1000) milli for even event_ids, − for odd (a
    deterministic credit/debit split); order is the (ts, event_id) total
    order. Reports the ``k`` richest users (final balance desc, user
    asc) with clamp counts and the running max. The DuckDB oracle
    replays the SAME fold as a recursive CTE over row-number-ordered
    events — the second converged/sequential oracle in the catalog after
    entity_cluster_sizes.

    Scale shape: ONE shuffle on user_id; each group folds locally
    (depth = events-per-user, bounded by user activity, never corpus
    length); the report is a TakeOrdered."""
    import numpy as np
    import pandas as pd

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["ts", "event_id"])
        mags = np.floor(pdf["value"].to_numpy() * 1000).astype(np.int64)
        signs = np.where(pdf["event_id"].to_numpy() % 2 == 0, 1, -1)
        deltas = mags * signs
        b = 0
        clamps = 0
        mx = 0
        for d in deltas:
            b += int(d)
            if b < 0:
                b = 0
                clamps += 1
            if b > mx:
                mx = b
        return pd.DataFrame(
            [
                {
                    "user_id": int(pdf["user_id"].iloc[0]),
                    "n_events": len(pdf),
                    "final_balance_milli": b,
                    "n_clamps": clamps,
                    "max_balance_milli": mx,
                }
            ]
        )

    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandas(fold, schema=CLAMP_SCHEMA)
        .orderBy(F.desc("final_balance_milli"), F.asc("user_id"))
        .limit(k)
    )


def clamped_balance_report_oracle_sql(k: int = 20) -> str:
    """The same fold as a recursive CTE: one recursion step per event in
    (ts, event_id) order within each user."""
    return f"""
WITH RECURSIVE ev AS (
  SELECT user_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id) AS i,
         CASE WHEN event_id % 2 = 0
              THEN CAST(floor(value * 1000) AS BIGINT)
              ELSE -CAST(floor(value * 1000) AS BIGINT) END AS delta
  FROM events
), nn AS (
  SELECT user_id, max(i) AS n FROM ev GROUP BY user_id
), bal(user_id, i, b, clamps, maxb) AS (
  SELECT user_id, i, greatest(0, delta),
         CASE WHEN delta < 0 THEN 1 ELSE 0 END,
         greatest(0, delta)
  FROM ev WHERE i = 1
  UNION ALL
  SELECT b.user_id, e.i, greatest(0, b.b + e.delta),
         b.clamps + CASE WHEN b.b + e.delta < 0 THEN 1 ELSE 0 END,
         greatest(b.maxb, greatest(0, b.b + e.delta))
  FROM bal b JOIN ev e ON e.user_id = b.user_id AND e.i = b.i + 1
)
SELECT bal.user_id, CAST(nn.n AS BIGINT) AS n_events,
       CAST(b AS BIGINT) AS final_balance_milli,
       CAST(clamps AS BIGINT) AS n_clamps,
       CAST(maxb AS BIGINT) AS max_balance_milli
FROM bal JOIN nn ON bal.user_id = nn.user_id AND bal.i = nn.n
ORDER BY final_balance_milli DESC, bal.user_id ASC LIMIT {k}
"""


def user_inactivity_gaps(events, k: int = 20):
    """Longest inactivity gap per user in exact seconds (churn-risk
    screen): the max lag-gap between a user's consecutive events, plus
    first/last activity and event count, top-``k`` by (gap desc, user
    asc). Pure epoch arithmetic (unix_micros DIV), bit-identical across
    engines; single-event users report gap 0, never NULL.

    Scale shape: one shuffle on user_id for the lag window (the same
    partitioning sessionization pays); the report is a TakeOrdered."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = events.select(
        "user_id",
        F.expr("unix_micros(ts) DIV 1000000").alias("ts_s"),
        "event_id",
    ).withColumn(
        "gap_s",
        F.col("ts_s")
        - F.lag(F.col("ts_s")).over(
            Window.partitionBy("user_id").orderBy("ts_s", "event_id")
        ),
    )
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.coalesce(F.max("gap_s"), F.lit(0)).cast("long").alias(
                "max_gap_s"
            ),
            F.min("ts_s").cast("long").alias("first_s"),
            F.max("ts_s").cast("long").alias("last_s"),
        )
        .orderBy(F.desc("max_gap_s"), F.asc("user_id"))
        .limit(k)
    )


def user_inactivity_gaps_oracle_sql(k: int = 20) -> str:
    return f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) // 1000000 AS ts_s, event_id FROM events
), g AS (
  SELECT user_id, ts_s,
         ts_s - lag(ts_s) OVER (PARTITION BY user_id
                                ORDER BY ts_s, event_id) AS gap_s
  FROM e
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(coalesce(max(gap_s), 0) AS BIGINT) AS max_gap_s,
       CAST(min(ts_s) AS BIGINT) AS first_s,
       CAST(max(ts_s) AS BIGINT) AS last_s
FROM g GROUP BY user_id
ORDER BY max_gap_s DESC, user_id ASC LIMIT {k}
"""


def session_bounce_rate(events, gap_minutes: int = 30):
    """Per-event-type bounce rate: sessions (30-min inactivity splits,
    the sessionization convention this repo uses) containing exactly ONE
    event, as an exact ppm of that type's sessions. The engagement-
    quality headline of traffic analytics.

    Scale shape: the session ids derive from one lag window per (user,
    type) — same shuffle as sessionization — then two map-side-combined
    aggs. All integer."""
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts_us", "event_id"
    )
    marked = events.select(
        "user_id",
        "event_type",
        F.expr("unix_micros(ts)").alias("ts_us"),
        "event_id",
    ).withColumn(
        "new_sess",
        (
            F.coalesce(
                F.col("ts_us") - F.lag("ts_us").over(w), F.lit(gap_us + 1)
            )
            > gap_us
        ).cast("bigint"),
    )
    sess = marked.withColumn(
        "sess_id",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    per_sess = sess.groupBy("event_type", "user_id", "sess_id").agg(
        F.count(F.lit(1)).alias("n_ev")
    )
    return (
        per_sess.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum((F.col("n_ev") == 1).cast("bigint")).alias("n_bounces"),
        )
        .select(
            "event_type",
            "n_sessions",
            "n_bounces",
            F.expr(
                "CAST(n_bounces * 1000000 DIV n_sessions AS BIGINT)"
            ).alias("bounce_ppm"),
        )
        .orderBy("event_type")
    )


def session_bounce_rate_oracle_sql(gap_minutes: int = 30) -> str:
    gap_us = gap_minutes * 60 * 1_000_000
    return f"""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events
), marked AS (
  SELECT user_id, event_type, ts_us, event_id,
         CASE WHEN coalesce(ts_us - lag(ts_us) OVER
                     (PARTITION BY user_id, event_type
                      ORDER BY ts_us, event_id), {gap_us + 1}) > {gap_us}
              THEN 1 ELSE 0 END AS new_sess
  FROM e
), sess AS (
  SELECT user_id, event_type,
         sum(new_sess) OVER (PARTITION BY user_id, event_type
                             ORDER BY ts_us, event_id) AS sess_id
  FROM marked
), per_sess AS (
  SELECT event_type, user_id, sess_id, count(*) AS n_ev
  FROM sess GROUP BY event_type, user_id, sess_id
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounces,
       CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS bounce_ppm
FROM per_sess GROUP BY event_type ORDER BY event_type"""


def dau_wau_stickiness(events):
    """DAU / trailing-7-day WAU stickiness per day — THE product-
    engagement ratio — in exact ppm. Exact distinct throughout: the
    corpus collapses to distinct (user, day) pairs once; each day's WAU
    is the distinct users over a 7-day trailing range computed by
    joining the pair table to the (bounded) day list on the range —
    days × active-pairs, never events × events. Epoch-day arithmetic,
    engine-identical.

    Scale shape: ONE distinct shuffle on (user, day); the day list is a
    tiny broadcast; the range join fans each active pair out to ≤7 day
    rows before the count-distinct combine. No corpus re-scan per day."""
    active = (
        events.select(
            "user_id",
            F.expr(
                "CAST(to_date(ts) - DATE '1970-01-01' AS BIGINT)"
            ).alias("day"),
        )
        .distinct()
    )
    days = active.select("day").distinct().select(
        F.col("day").alias("d")
    )
    dau = active.groupBy(F.col("day").alias("d")).agg(
        F.count(F.lit(1)).alias("dau")
    )
    wau = (
        active.join(
            F.broadcast(days),
            (F.col("day") <= F.col("d")) & (F.col("day") >= F.col("d") - 6),
        )
        .groupBy("d")
        .agg(F.count_distinct("user_id").alias("wau"))
    )
    return (
        dau.join(wau, "d")
        .select(
            F.col("d").alias("day"),
            "dau",
            "wau",
            F.expr("CAST(dau * 1000000 DIV wau AS BIGINT)").alias(
                "stickiness_ppm"
            ),
        )
        .orderBy("day")
    )


def dau_wau_stickiness_oracle_sql() -> str:
    return """
WITH active AS (
  SELECT DISTINCT user_id,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day
  FROM events
), days AS (
  SELECT DISTINCT day AS d FROM active
), dau AS (
  SELECT day AS d, count(*) AS dau FROM active GROUP BY day
), wau AS (
  SELECT days.d, count(DISTINCT a.user_id) AS wau
  FROM days JOIN active a ON a.day <= days.d AND a.day >= days.d - 6
  GROUP BY days.d
)
SELECT dau.d AS day, CAST(dau AS BIGINT) AS dau, CAST(wau AS BIGINT) AS wau,
       CAST(dau * 1000000 // wau AS BIGINT) AS stickiness_ppm
FROM dau JOIN wau ON dau.d = wau.d ORDER BY day"""


def interevent_gap_histogram(events):
    """Log2-bucketed histogram of per-user inter-event gaps (seconds) per
    event type — the burstiness/memorylessness fingerprint (a Poisson
    process gives a geometric bucket decay; heavy right tails say
    sessions + long silences). Buckets are EXACT:
    ``length(bin(gap_s)) - 1`` for gap_s >= 1, with zero-second gaps in
    their own bucket -1 — integer binary-string semantics, no floating
    log. Reports per (event_type, bucket): gap count and min/max gap.

    Scale shape: one (user, type) lag window — the sessionization
    shuffle — then a map-side-combined rollup on the bounded bucket
    frame."""
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts_s", "event_id"
    )
    gaps = (
        events.select(
            "user_id",
            "event_type",
            F.expr("unix_micros(ts) DIV 1000000").alias("ts_s"),
            "event_id",
        )
        .withColumn("gap_s", F.col("ts_s") - F.lag("ts_s").over(w))
        .filter(F.col("gap_s").isNotNull())
    )
    bucket = F.when(F.col("gap_s") == 0, F.lit(-1)).otherwise(
        F.length(F.bin("gap_s")) - 1
    )
    return (
        gaps.withColumn("bucket", bucket.cast("long"))
        .groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.min("gap_s").cast("long").alias("min_gap_s"),
            F.max("gap_s").cast("long").alias("max_gap_s"),
        )
        .orderBy("event_type", "bucket")
    )


def interevent_gap_histogram_oracle_sql() -> str:
    return """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) // 1000000 AS ts_s, event_id
  FROM events
), g AS (
  SELECT event_type,
         ts_s - lag(ts_s) OVER (PARTITION BY user_id, event_type
                                ORDER BY ts_s, event_id) AS gap_s
  FROM e
), b AS (
  SELECT event_type, gap_s,
         CASE WHEN gap_s = 0 THEN -1
              ELSE length(bin(gap_s)) - 1 END AS bucket
  FROM g WHERE gap_s IS NOT NULL
)
SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(min(gap_s) AS BIGINT) AS min_gap_s,
       CAST(max(gap_s) AS BIGINT) AS max_gap_s
FROM b GROUP BY event_type, bucket ORDER BY event_type, bucket"""


def cusum_changepoint_daily(events: DataFrame) -> DataFrame:
    """CUSUM changepoint scan over the daily event-value series: for each
    day, the cumulative deviation of daily value mass from the series mean,
    and a flag on the day(s) where |CUSUM| peaks — the classic single-
    changepoint estimate (Page 1954, public): a level shift at day d makes
    |S_d| maximal there.

    Exactness contract: the textbook S_d = sum_{i<=d}(x_i - mean) needs a
    float mean; this emits the N-SCALED statistic instead —
    ``cusum_scaled = N * prefix_d - d * total`` (identically
    N * S_d) — which is pure BIGINT arithmetic on cent-quantized values,
    so the peak day and every cell are bit-identical across engines. The
    argmax is invariant to the positive N scaling.

    Scale shape (100 TB): the raw stream collapses to O(days) rows in ONE
    map-side-combined groupBy; the prefix window and the two scalar aggs
    run on that tiny frame (a deliberate single-task window over ~1e3
    rows, not the corpus), and the scalars join back as one-row
    broadcasts. Overflow: N * prefix_cents stays exact while
    days * total_cents < 2^63 — ~9e14 dollars over a 1000-day series;
    past it Spark's long multiply wraps, so a raise_error guard trips
    LOUDLY at total_cents > 2^63 / max(N,1) first."""
    daily = (
        events.select(
            F.to_date("ts").alias("day"),
            (money("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("day")
        .agg(F.sum("cents").alias("x_cents"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    pre = daily.select(
        "day",
        "x_cents",
        F.sum("x_cents").over(w).alias("prefix"),
        F.row_number().over(Window.orderBy("day")).alias("d"),
    )
    tot = pre.agg(
        F.max("d").alias("n_days"),
        F.sum("x_cents").alias("total"),
        # negative daily values make |prefix| exceed |total| mid-series,
        # so the overflow bound must see the cumulative extreme too
        F.max(F.abs(F.col("prefix"))).alias("maxabs_prefix"),
    )
    # the overflow guard lives INSIDE the emitted expression — a separate
    # never-selected guard column would be dead code Catalyst prunes away
    # (column pruning is exactly the optimization this repo relies on
    # everywhere else), and the guard would never evaluate
    cus = pre.join(F.broadcast(tot)).select(
        "day",
        "x_cents",
        F.expr(
            "CASE WHEN GREATEST(abs(total), maxabs_prefix)"
            " > CAST(9223372036854775807 AS BIGINT)"
            " div GREATEST(CAST(n_days AS BIGINT), CAST(1 AS BIGINT))"
            " THEN CAST(raise_error('cusum_changepoint_daily: N * prefix"
            " exceeds BIGINT — re-quantize to dollars') AS BIGINT)"
            " ELSE CAST(n_days AS BIGINT) * prefix"
            " - CAST(d AS BIGINT) * total END"
        ).alias("cusum_scaled"),
    )
    peak = cus.agg(F.max(F.abs("cusum_scaled")).alias("peak_abs"))
    return (
        cus.join(F.broadcast(peak))
        .select(
            "day",
            "x_cents",
            "cusum_scaled",
            (F.abs("cusum_scaled") == F.col("peak_abs")).alias("is_changepoint"),
        )
        .orderBy("day")
    )


def cusum_changepoint_daily_oracle_sql() -> str:
    return """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS x_cents
  FROM events GROUP BY 1
), pre AS (
  SELECT day, x_cents,
         sum(x_cents) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS prefix,
         CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS d
  FROM daily
), tot AS (
  SELECT CAST(max(d) AS BIGINT) AS n_days,
         CAST(sum(x_cents) AS BIGINT) AS total FROM pre
), cus AS (
  SELECT day, x_cents,
         CAST(n_days * prefix - d * total AS BIGINT) AS cusum_scaled
  FROM pre, tot
)
SELECT day, x_cents, cusum_scaled,
       abs(cusum_scaled) = (SELECT max(abs(cusum_scaled)) FROM cus)
         AS is_changepoint
FROM cus ORDER BY day"""


def asof_join_tolerance(
    events: DataFrame,
    left_type: str = "purchase",
    right_type: str = "view",
    tolerance_s: int = 100_000,
) -> DataFrame:
    """As-of join with a time tolerance (pandas ``merge_asof(tolerance=)``
    semantics, which plain :func:`asof_join` lacks): for each ``left_type``
    event, the most recent ``right_type`` event by the same user at or
    before it — but the match only COUNTS when the gap is within
    ``tolerance_s`` (attribution windows: a stale view doesn't
    explain a purchase; the ~28h default brackets the corpus's median
    view->purchase gap so both match outcomes are exercised). Emits the raw prior gap unconditionally (the
    distribution a window-tuning pass reads) plus the tolerance-gated
    match id and flag.

    Determinism with ties: right rows are pre-aggregated to one per
    (user, ts) keeping the max event_id, so the carried (ts, id) pair is
    unique per timestamp and both carried columns come from the same row;
    a right row at exactly the left timestamp matches (>= semantics).

    Scale shape (100 TB): the union-and-window as-of formulation — ONE
    shuffle on user_id, each user's timeline swept once by a running
    ``last(ignorenulls)``; no point-lookup join, no L x R pair blowup,
    and the tolerance is a post-filter on the carried timestamp, not a
    range join."""
    ev = events.select(
        "event_id",
        "user_id",
        "event_type",
        F.col("ts").cast("timestamp").alias("ts"),
    )
    right = (
        ev.filter(F.col("event_type") == right_type)
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("b_id"))
    )
    lhs = ev.filter(F.col("event_type") == left_type).select(
        "user_id",
        "ts",
        F.lit(1).alias("is_left"),
        "event_id",
        F.lit(None).cast("timestamp").alias("b_ts_val"),
        F.lit(None).cast(dict(ev.dtypes)["event_id"]).alias("b_id_val"),
    )
    rhs = right.select(
        "user_id",
        "ts",
        F.lit(0).alias("is_left"),
        F.lit(None).cast(dict(ev.dtypes)["event_id"]).alias("event_id"),
        F.col("ts").alias("b_ts_val"),
        F.col("b_id").alias("b_id_val"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = lhs.unionByName(rhs).select(
        "*",
        F.last("b_ts_val", ignorenulls=True).over(w).alias("last_b_ts"),
        F.last("b_id_val", ignorenulls=True).over(w).alias("last_b_id"),
    )
    gap = F.unix_timestamp("ts") - F.unix_timestamp("last_b_ts")
    matched = F.col("last_b_ts").isNotNull() & (gap <= tolerance_s)
    return (
        merged.filter(F.col("is_left") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            gap.cast("long").alias("prior_gap_s"),
            matched.alias("matched"),
            F.when(matched, F.col("last_b_id")).alias("asof_event_id"),
        )
        .orderBy("event_id")
    )


def asof_join_tolerance_oracle_sql(
    left_type: str = "purchase",
    right_type: str = "view",
    tolerance_s: int = 100_000,
) -> str:
    return f"""
WITH r AS (
  SELECT user_id, ts, max(event_id) AS b_id
  FROM events WHERE event_type = '{right_type}' GROUP BY user_id, ts
), l AS (
  SELECT event_id, user_id, ts FROM events
  WHERE event_type = '{left_type}'
), j AS (
  SELECT l.event_id, l.user_id, l.ts,
         (SELECT max(r.ts) FROM r
          WHERE r.user_id = l.user_id AND r.ts <= l.ts) AS b_ts
  FROM l
), g AS (
  SELECT j.*,
         CAST(epoch_us(j.ts) // 1000000
              - epoch_us(j.b_ts) // 1000000 AS BIGINT) AS prior_gap_s
  FROM j
)
SELECT g.event_id, g.user_id, g.ts, g.prior_gap_s,
       (g.b_ts IS NOT NULL AND g.prior_gap_s <= {tolerance_s}) AS matched,
       CASE WHEN g.b_ts IS NOT NULL AND g.prior_gap_s <= {tolerance_s}
            THEN (SELECT r.b_id FROM r
                  WHERE r.user_id = g.user_id AND r.ts = g.b_ts)
            END AS asof_event_id
FROM g ORDER BY g.event_id"""


def cohort_ltv_curve(events: DataFrame) -> DataFrame:
    """Cohort lifetime-value curve — the VALUE twin of weekly retention:
    users cohorted by signup week (first ``signup`` event); for each
    (cohort_week, weeks_since_signup) cell with purchase activity, the
    purchasing-user count, the period revenue, the cohort's CUMULATIVE
    revenue, and cumulative LTV per cohort user in exact milli-cents.
    The table growth/finance reads to compare acquisition vintages.

    Week bucketing is Monday-start ``date_trunc('week', ...)`` in both
    engines; revenue quantizes to cents via the house decimal(18,2) tree;
    pre-signup purchases are excluded (they have no cohort age).

    Scale shape (100 TB): one user-keyed shuffle joins purchases to their
    signup row (the join the raw data requires); the rollup collapses to
    O(cohorts x weeks) cells; the cumulative window runs per cohort over
    that tiny frame; cohort sizes broadcast back. Nothing corpus-scale
    past the first join."""
    signup = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.to_date("ts")).alias("signup_day"))
        .select(
            "user_id",
            F.to_date(F.date_trunc("week", F.col("signup_day"))).alias(
                "cohort_week"
            ),
        )
    )
    purch = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.to_date(F.date_trunc("week", F.to_date("ts"))).alias("week"),
        (money("value") * 100).cast("long").alias("cents"),
    )
    cells = (
        purch.join(signup, "user_id")
        .filter(F.col("week") >= F.col("cohort_week"))
        .select(
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7)
            .cast("long")
            .alias("weeks_since"),
            "user_id",
            "cents",
        )
        .groupBy("cohort_week", "weeks_since")
        .agg(
            F.countDistinct("user_id").alias("purchasers"),
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("cents").alias("revenue_cents"),
        )
    )
    sizes = signup.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("weeks_since")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        cells.join(F.broadcast(sizes), "cohort_week")
        .withColumn("cum_revenue_cents", F.sum("revenue_cents").over(w))
        .select(
            "cohort_week",
            "weeks_since",
            "cohort_users",
            "purchasers",
            "n_purchases",
            "revenue_cents",
            "cum_revenue_cents",
            F.expr(
                "CAST(cum_revenue_cents * CAST(1000 AS BIGINT)"
                " div cohort_users AS BIGINT)"
            ).alias("ltv_milli_cents"),
        )
        .orderBy("cohort_week", "weeks_since")
    )


def cohort_ltv_curve_oracle_sql() -> str:
    return """
WITH signup AS (
  SELECT user_id,
         CAST(date_trunc('week', min(CAST(ts AS DATE))) AS DATE)
           AS cohort_week
  FROM events WHERE event_type = 'signup' GROUP BY user_id
), purch AS (
  SELECT user_id,
         CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS week,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), cells AS (
  SELECT s.cohort_week,
         CAST((p.week - s.cohort_week) // 7 AS BIGINT) AS weeks_since,
         CAST(count(DISTINCT p.user_id) AS BIGINT) AS purchasers,
         CAST(count(*) AS BIGINT) AS n_purchases,
         CAST(sum(p.cents) AS BIGINT) AS revenue_cents
  FROM purch p JOIN signup s USING (user_id)
  WHERE p.week >= s.cohort_week
  GROUP BY s.cohort_week, 2
), sizes AS (
  SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_users
  FROM signup GROUP BY cohort_week
)
SELECT c.cohort_week, c.weeks_since, z.cohort_users, c.purchasers,
       c.n_purchases, c.revenue_cents,
       CAST(sum(c.revenue_cents) OVER (PARTITION BY c.cohort_week
            ORDER BY c.weeks_since ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_revenue_cents,
       CAST(CAST(sum(c.revenue_cents) OVER (PARTITION BY c.cohort_week
            ORDER BY c.weeks_since ROWS UNBOUNDED PRECEDING) AS BIGINT)
            * 1000 // z.cohort_users AS BIGINT) AS ltv_milli_cents
FROM cells c JOIN sizes z USING (cohort_week)
ORDER BY c.cohort_week, c.weeks_since"""


def seasonal_decomposition_daily(events: DataFrame) -> DataFrame:
    """Classical additive seasonal decomposition of the daily value
    series — trend (centered 7-day moving window), day-of-week effect,
    residual — entirely in DIVISION-FREE exact integers, so the anomaly
    question ("which day deviates from trend+seasonality?") is
    hash-stable across engines:

    - ``trend_x7``   = sum of the 7 calendar days centered on d (a RANGE
      window on the day ordinal — row frames would silently misalign on
      calendar gaps); NULL at the edges / across gaps (window count < 7).
    - ``detrended_x7`` = 7*x_cents - trend_x7 (the deviation, scaled x7).
    - ``resid_x7n``  = detrended_x7 * n_dow - dow_sum_x7: the residual
      scaled by 7*n_dow — zero iff the day's deviation equals its
      day-of-week average, sign/order preserved (positive scaling).
    - ``dow_effect_milli`` = the day-of-week effect in milli-cents,
      SIGN-SPLIT (truncate-vs-floor divergence on negatives, the Kendall
      rule): sign * (|dow_sum_x7| * 1000 div (7 * n_dow)).

    Scale shape (100 TB): the corpus collapses to O(days) rows in one
    map-side-combined groupBy; the range window and the dow rollup run on
    the tiny daily frame; the dow table (7 rows) broadcasts back."""
    daily = (
        events.select(
            F.to_date("ts").alias("day"),
            (money("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("day")
        .agg(F.sum("cents").alias("x_cents"))
        .select(
            "day",
            "x_cents",
            F.expr("CAST(day - DATE '1970-01-01' AS BIGINT)").alias("dn"),
            F.dayofweek("day").cast("int").alias("dow"),
        )
    )
    w = Window.orderBy("dn").rangeBetween(-3, 3)
    trended = daily.select(
        "day",
        "dow",
        "x_cents",
        F.when(
            F.count("x_cents").over(w) == 7, F.sum("x_cents").over(w)
        ).alias("trend_x7"),
    ).withColumn(
        "detrended_x7",
        F.when(
            F.col("trend_x7").isNotNull(),
            7 * F.col("x_cents") - F.col("trend_x7"),
        ),
    )
    dow_stats = (
        trended.filter(F.col("detrended_x7").isNotNull())
        .groupBy("dow")
        .agg(
            F.sum("detrended_x7").alias("dow_sum_x7"),
            F.count(F.lit(1)).alias("n_dow"),
        )
    )
    return (
        trended.join(F.broadcast(dow_stats), "dow", "left")
        .select(
            "day",
            "dow",
            "x_cents",
            "trend_x7",
            "detrended_x7",
            F.expr(
                "CAST(CASE WHEN dow_sum_x7 IS NULL THEN NULL ELSE"
                " CASE WHEN dow_sum_x7 >= 0 THEN 1 ELSE -1 END"
                " * ((abs(dow_sum_x7) * CAST(1000 AS BIGINT))"
                " div (7 * n_dow)) END AS BIGINT)"
            ).alias("dow_effect_milli"),
            F.expr(
                "CAST(CASE WHEN detrended_x7 IS NULL THEN NULL"
                " ELSE detrended_x7 * n_dow - dow_sum_x7 END AS BIGINT)"
            ).alias("resid_x7n"),
        )
        .orderBy("day")
    )


def seasonal_decomposition_daily_oracle_sql() -> str:
    return """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS x_cents
  FROM events GROUP BY 1
), base AS (
  SELECT day, x_cents,
         CAST(day - DATE '1970-01-01' AS BIGINT) AS dn,
         CAST(dayofweek(day) + 1 AS INTEGER) AS dow
  FROM daily
), trended AS (
  SELECT day, dow, x_cents,
         CASE WHEN count(x_cents) OVER w = 7
              THEN sum(x_cents) OVER w END AS trend_x7
  FROM base
  WINDOW w AS (ORDER BY dn RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), detr AS (
  SELECT *, CASE WHEN trend_x7 IS NOT NULL
                 THEN 7 * x_cents - trend_x7 END AS detrended_x7
  FROM trended
), dow_stats AS (
  SELECT dow, CAST(sum(detrended_x7) AS BIGINT) AS dow_sum_x7,
         CAST(count(*) AS BIGINT) AS n_dow
  FROM detr WHERE detrended_x7 IS NOT NULL GROUP BY dow
)
SELECT d.day, d.dow, d.x_cents,
       CAST(d.trend_x7 AS BIGINT) AS trend_x7,
       CAST(d.detrended_x7 AS BIGINT) AS detrended_x7,
       CAST(CASE WHEN s.dow_sum_x7 IS NULL THEN NULL ELSE
            CASE WHEN s.dow_sum_x7 >= 0 THEN 1 ELSE -1 END
            * ((abs(s.dow_sum_x7) * 1000) // (7 * s.n_dow)) END
            AS BIGINT) AS dow_effect_milli,
       CAST(CASE WHEN d.detrended_x7 IS NULL THEN NULL
            ELSE d.detrended_x7 * s.n_dow - s.dow_sum_x7 END AS BIGINT)
         AS resid_x7n
FROM detr d LEFT JOIN dow_stats s USING (dow)
ORDER BY d.day"""


def interevent_cv2_by_user(events: DataFrame, k: int = 50) -> DataFrame:
    """Burstiness audit per user: the squared coefficient of variation
    (CV^2 = variance/mean^2) of inter-event gaps, in exact integer milli —
    CV^2 = 1000 milli is the Poisson (memoryless) baseline, above it is
    bursty (sessions, retries, scripted storms), below is regular
    (schedulers, heartbeats — or bots pretending to be people). The
    |gaps|-weighted counterpart of interevent_gap_histogram's shape view;
    bot/abuse triage reads this column directly.

    Exactness: gaps in whole seconds; ``cv2_milli = n * (n*sumsq - sum^2)
    * 1000 div ((n-1) * sum^2)`` — numerator non-negative by
    Cauchy-Schwarz, so truncation == floor; carried in decimal(38,0)
    (n*sumsq*1000 wraps BIGINT past ~10^5 gap-seconds scale, the
    spearman lesson). Requires n >= 2 gaps and sum > 0.

    Top-``k`` burstiest users by (cv2 desc, user asc) — a TakeOrdered,
    never a global sort. One user-keyed shuffle + one LAG pass feeds it."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    secs = F.unix_timestamp("ts")
    gaps = events.select(
        "user_id",
        (secs - F.lag(secs).over(w)).alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    per = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("gap_s").cast("decimal(38,0)").alias("s1"),
        F.sum(F.expr("gap_s * gap_s")).cast("decimal(38,0)").alias("s2"),
    )
    return (
        per.filter((F.col("n_gaps") >= 2) & (F.col("s1") > 0))
        .select(
            "user_id",
            "n_gaps",
            F.expr("CAST(s1 div n_gaps AS BIGINT)").alias("mean_gap_s"),
            F.expr(
                "CAST(n_gaps * (n_gaps * s2 - s1 * s1)"
                " * 1000 div ((n_gaps - 1) * s1 * s1) AS BIGINT)"
            ).alias("cv2_milli"),
        )
        .orderBy(F.desc("cv2_milli"), F.asc("user_id"))
        .limit(k)
    )


def interevent_cv2_by_user_oracle_sql(k: int = 50) -> str:
    return f"""
WITH g AS (
  SELECT user_id,
         epoch_us(ts) // 1000000
           - lag(epoch_us(ts) // 1000000)
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
  FROM events
), per AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_gaps,
         CAST(sum(gap_s) AS HUGEINT) AS s1,
         CAST(sum(gap_s * gap_s) AS HUGEINT) AS s2
  FROM g WHERE gap_s IS NOT NULL GROUP BY user_id
)
SELECT user_id, n_gaps,
       CAST(s1 // n_gaps AS BIGINT) AS mean_gap_s,
       CAST(n_gaps * (n_gaps * s2 - s1 * s1) * 1000
            // ((n_gaps - 1) * s1 * s1) AS BIGINT) AS cv2_milli
FROM per WHERE n_gaps >= 2 AND s1 > 0
ORDER BY cv2_milli DESC, user_id ASC LIMIT {k}"""


def daily_acf_lags(events: DataFrame, max_lag: int = 7) -> DataFrame:
    """Autocorrelation function of the daily value series at lags
    1..``max_lag`` — the seasonality detector that picks the period
    (a weekly cycle shows as a peak at lag 7) BEFORE fitting any model;
    the diagnostic twin of seasonal_decomposition_daily, which assumes
    the period this measures.

    Exactness: deviations are N-scaled like the CUSUM scan — d_i =
    N*x_i - T is an exact BIGINT — so r_k = sum(d_i * d_{i+k}) /
    sum(d_i^2) is a ratio of exact decimal(38,0) sums; the emitted
    ``acf_milli`` is sign-split (numerator may be negative; truncate-vs-
    floor divergence, the Kendall rule). The N^2 scaling cancels in the
    ratio exactly.

    Scale shape (100 TB): the corpus collapses to O(days); each lag is a
    self-join of that tiny frame on ``dn + k`` (broadcast); the lag table
    fans out of ONE frame. Pairs only exist where both days are present,
    n_pairs says how much data backs each lag."""
    daily = (
        events.select(
            F.to_date("ts").alias("day"),
            (money("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("day")
        .agg(F.sum("cents").alias("x"))
        .select(
            F.expr("CAST(day - DATE '1970-01-01' AS BIGINT)").alias("dn"),
            "x",
        )
    )
    tot = daily.agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("t")
    )
    dev = daily.join(F.broadcast(tot)).select(
        "dn",
        F.expr("CAST(n AS BIGINT) * x - t").alias("d"),
    )
    den = dev.agg(
        F.sum(F.expr("CAST(d AS DECIMAL(38,0)) * d")).alias("den")
    )
    lags = dev.select(
        "dn",
        "d",
        F.explode(
            F.array(*[F.lit(k) for k in range(1, max_lag + 1)])
        ).alias("lag"),
    )
    b = dev.select(F.col("dn").alias("dn2"), F.col("d").alias("d2"))
    num = (
        lags.join(
            F.broadcast(b), F.col("dn") + F.col("lag") == F.col("dn2")
        )
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.expr("CAST(d AS DECIMAL(38,0)) * d2")).alias("num"),
        )
    )
    return (
        num.join(F.broadcast(den))
        .select(
            F.col("lag").cast("int").alias("lag"),
            "n_pairs",
            F.expr(
                "CAST(CASE WHEN den = 0 THEN 0 ELSE"
                " CASE WHEN num >= 0 THEN 1 ELSE -1 END"
                " * CAST((abs(num) * 1000) div den AS BIGINT) END"
                " AS BIGINT)"
            ).alias("acf_milli"),
        )
        .orderBy("lag")
    )


def daily_acf_lags_oracle_sql(max_lag: int = 7) -> str:
    return f"""
WITH daily AS (
  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dn,
         CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS x
  FROM events GROUP BY 1
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS t
  FROM daily
), dev AS (
  SELECT dn, n * x - t AS d FROM daily CROSS JOIN tot
), den AS (
  SELECT sum(CAST(d AS HUGEINT) * d) AS den FROM dev
), lags AS (
  SELECT a.dn, a.d, t.lag
  FROM dev a, UNNEST(range(1, {max_lag + 1})) AS t(lag)
), num AS (
  SELECT lag,
         CAST(count(*) AS BIGINT) AS n_pairs,
         sum(CAST(a.d AS HUGEINT) * b.d2) AS num
  FROM lags a JOIN (SELECT dn AS dn2, d AS d2 FROM dev) b
    ON a.dn + a.lag = b.dn2
  GROUP BY lag
)
SELECT CAST(lag AS INTEGER) AS lag, n_pairs,
       CAST(CASE WHEN den = 0 THEN 0 ELSE
            CASE WHEN num >= 0 THEN 1 ELSE -1 END
            * CAST((abs(num) * 1000) // den AS BIGINT) END AS BIGINT)
         AS acf_milli
FROM num CROSS JOIN den ORDER BY lag"""


def rolling_wau_exact(events: DataFrame) -> DataFrame:
    """Daily active users plus the EXACT 7-day rolling distinct-user
    count — the DAU/WAU pair computed without approximation. Rolling
    DISTINCT does not decompose over a window (a user active twice in
    the week counts once), which is why most stacks approximate it with
    sketches; the exact form here fans each (day, user) activity row to
    the <= 7 rolling windows it participates in and deduplicates per
    window — bounded constant fanout, no sketch error to audit. Days
    with no activity emit no row (same in the oracle).

    Scale shape (100 TB): one map-side-combined distinct collapses the
    event stream to (day, user) — the DAU grain; the WAU explode is a
    x7 constant fanout of THAT frame (not the event stream), followed by
    one distinct + count per day. WAU rows for days past the corpus max
    are clipped (both engines identically)."""
    du = events.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    dau = du.groupBy("day").agg(
        F.countDistinct("user_id").cast("long").alias("dau")
    )
    maxd = du.agg(F.max("day").alias("maxday"))
    fan = (
        du.select(
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
            "day",
            "user_id",
        )
        .select(F.date_add("day", F.col("off")).alias("wday"), "user_id")
        .distinct()
        .crossJoin(F.broadcast(maxd))
        .filter(F.col("wday") <= F.col("maxday"))
    )
    wau = fan.groupBy(F.col("wday").alias("day")).agg(
        F.countDistinct("user_id").cast("long").alias("wau")
    )
    return (
        dau.join(wau, "day", "left")
        .select(
            "day",
            "dau",
            F.coalesce("wau", F.lit(0)).cast("long").alias("wau"),
            F.expr(
                "CAST(CASE WHEN wau > 0 THEN dau * 1000000 div wau"
                " ELSE 0 END AS BIGINT)"
            ).alias("stickiness_ppm"),
        )
        .orderBy("day")
    )


def rolling_wau_exact_oracle_sql() -> str:
    return """
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
), dau AS (
  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
  FROM du GROUP BY day
), m AS (SELECT max(day) AS maxday FROM du),
fan AS (
  SELECT DISTINCT du.day + CAST(t.off AS INTEGER) AS wday, du.user_id
  FROM du, UNNEST(generate_series(0, 6)) AS t(off), m
  WHERE du.day + CAST(t.off AS INTEGER) <= m.maxday
), wau AS (
  SELECT wday AS day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
  FROM fan GROUP BY wday
)
SELECT dau.day, dau.dau,
       CAST(coalesce(wau.wau, 0) AS BIGINT) AS wau,
       CAST(CASE WHEN coalesce(wau.wau, 0) > 0
            THEN dau.dau * 1000000 // wau.wau
            ELSE 0 END AS BIGINT) AS stickiness_ppm
FROM dau LEFT JOIN wau ON dau.day = wau.day
ORDER BY dau.day"""


_MARKOV_ITERS = 30
_MARKOV_PPB = 1_000_000_000


def markov_stationary_event_mix(
    events: DataFrame, iters: int = _MARKOV_ITERS
) -> DataFrame:
    """Stationary distribution of the per-user event-type Markov chain —
    where does a user's session mix settle if today's transition behavior
    persists? The complement of event_transition_matrix (which reports
    the one-step counts): a fixed-iteration power method over the same
    matrix, run in EXACT integer ppb so both engines reproduce every
    intermediate bit.

    The recurrence (applied identically by the lazy chained plan here and
    the unrolled-CTE DuckDB oracle): v0 is the uniform ppb vector with
    the div remainder given to the lexicographically first states
    (Hamilton-style); each step,
    ``v'[j] = sum_i floor(v[i] * c[i][j] / rowsum[i])`` for states with
    outgoing transitions, plus ``floor(v[i] / K)`` from each absorbing
    state (uniform re-injection — the standard dangling-node fix from
    PageRank, public). Floor loss makes sum(v) drift a few ppb below 1e9;
    it is NOT renormalized — determinism beats cosmetics, and the drift
    is bounded by K per step. ``iters`` is fixed, not convergence-tested:
    a deterministic output regardless of the chain's mixing time.
    Products ride DECIMAL(38,0) (HUGEINT in DuckDB): v*c reaches
    1e9 * |rows|, past BIGINT at trillion-row scale.

    Scale shape (100 TB): ONE user-keyed shuffle builds the transition
    counts (lag over the user-partitioned, ts-ordered window — never
    all-to-one); everything after runs on the K x K count matrix
    (K = |event types|, bounded by the product's event vocabulary). The
    iteration is a LAZY chain of ``iters`` broadcast-join + K-row
    aggregate steps — building the DataFrame triggers no job (the
    token_triple_support rule). CRITICAL plan-shape constraint: each step
    references the previous vector EXACTLY ONCE — the dangling-state
    re-injection is folded into a static ROUTING table
    (absorbing state -> every state with c=1, rs=K, since
    ``(v*1) div K == v div K``) unioned with the transition matrix, so
    the logical plan grows linearly in ``iters``; a separate
    dangling-scalar branch would reference v twice per step and explode
    the plan 2^iters. The routing/state frames are lazy-localCheckpointed
    once so the corpus aggregate is not replayed per step. The state rank
    comes from a K^2 self-join count, not a bare window."""
    sess_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        events.select(
            "user_id", "ts", "event_id", F.col("event_type").alias("nxt")
        )
        .withColumn("prv", F.lag("nxt").over(sess_w))
        .filter(F.col("prv").isNotNull())
        .groupBy("prv", "nxt")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    rowsum = trans.groupBy("prv").agg(F.sum("c").alias("rs"))
    states = (
        events.select(F.col("event_type").alias("s"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    kk = states.agg(F.count(F.lit(1)).alias("k"))
    # lexicographic 1-based rank via a K^2 self-join (no bare window)
    s2 = states.select(F.col("s").alias("s2"))
    ranked = (
        states.join(F.broadcast(s2), F.col("s2") <= F.col("s"))
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    v = ranked.crossJoin(F.broadcast(kk)).select(
        F.col("s").alias("event_type"),
        F.expr(
            f"CAST({_MARKOV_PPB} div k"
            f" + CASE WHEN i - 1 < {_MARKOV_PPB} % k THEN 1 ELSE 0 END"
            " AS BIGINT)"
        ).alias("v"),
    )
    # unified routing table: real transitions plus, for each absorbing
    # state, a c=1/rs=K route to every state — one v-reference per step
    absorbing = states.join(
        rowsum, states["s"] == rowsum["prv"], "left_anti"
    ).select(F.col("s").alias("prv"))
    routes = (
        trans.join(rowsum, "prv")
        .select("prv", "nxt", "c", "rs")
        .unionByName(
            absorbing.crossJoin(states.select(F.col("s").alias("nxt")))
            .crossJoin(kk)
            .select(
                "prv",
                "nxt",
                F.lit(1).cast("long").alias("c"),
                F.col("k").cast("long").alias("rs"),
            )
        )
        .localCheckpoint(eager=False)
    )
    for _ in range(iters):
        v = (
            v.join(F.broadcast(routes), v["event_type"] == routes["prv"])
            .select(
                F.col("nxt"),
                F.expr(
                    "CAST((CAST(v AS DECIMAL(38,0)) * c) div rs AS BIGINT)"
                ).alias("part"),
            )
            .groupBy("nxt")
            .agg(F.sum("part").cast("long").alias("v"))
            .select(F.col("nxt").alias("event_type"), "v")
        )
    return (
        states.join(v, states["s"] == v["event_type"], "left")
        .join(rowsum, states["s"] == rowsum["prv"], "left")
        .select(
            F.col("s").alias("event_type"),
            F.coalesce(F.col("rs"), F.lit(0))
            .cast("long")
            .alias("out_transitions"),
            F.coalesce(F.col("v"), F.lit(0))
            .cast("long")
            .alias("stationary_ppb"),
        )
        .orderBy("event_type")
    )


def markov_stationary_event_mix_oracle_sql(
    iters: int = _MARKOV_ITERS,
) -> str:
    """The identical integer recurrence, unrolled as ``iters`` chained
    CTEs (DuckDB restricts aggregation over a recursive reference, and an
    unrolled chain is deterministic by construction)."""
    steps = []
    for step in range(iters):
        prev, cur = f"v{step}", f"v{step + 1}"
        steps.append(
            f"""{cur} AS MATERIALIZED (
  SELECT st.event_type,
         CAST(coalesce((SELECT sum((CAST(p.v AS HUGEINT) * t.c) // r.rs)
                        FROM {prev} p
                        JOIN trans t ON t.prv = p.event_type
                        JOIN rowsum r ON r.prv = p.event_type
                        WHERE t.nxt = st.event_type), 0)
              + coalesce((SELECT sum(p.v // (SELECT k FROM kk))
                          FROM {prev} p
                          LEFT JOIN rowsum r ON r.prv = p.event_type
                          WHERE r.prv IS NULL), 0) AS BIGINT) AS v
  FROM states st
)"""
        )
    chain = ",\n".join(steps)
    return f"""
WITH trans AS MATERIALIZED (
  SELECT prv, nxt, CAST(count(*) AS BIGINT) AS c FROM (
    SELECT lag(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS prv,
           event_type AS nxt
    FROM events
  ) WHERE prv IS NOT NULL GROUP BY prv, nxt
), states AS MATERIALIZED (
  SELECT DISTINCT event_type FROM events
), kk AS MATERIALIZED (
  SELECT CAST(count(*) AS BIGINT) AS k FROM states
), rowsum AS MATERIALIZED (
  SELECT prv, CAST(sum(c) AS BIGINT) AS rs FROM trans GROUP BY prv
), ordered AS MATERIALIZED (
  SELECT event_type, row_number() OVER (ORDER BY event_type) AS i
  FROM states
), v0 AS MATERIALIZED (
  SELECT o.event_type,
         CAST({_MARKOV_PPB} // kk.k
              + CASE WHEN o.i - 1 < {_MARKOV_PPB} % kk.k THEN 1 ELSE 0 END
              AS BIGINT) AS v
  FROM ordered o CROSS JOIN kk
),
{chain}
SELECT st.event_type,
       CAST(coalesce(r.rs, 0) AS BIGINT) AS out_transitions,
       vf.v AS stationary_ppb
FROM states st
JOIN v{iters} vf ON vf.event_type = st.event_type
LEFT JOIN rowsum r ON r.prv = st.event_type
ORDER BY st.event_type"""


def sax_daily_motifs(orders: DataFrame, top: int = 10) -> DataFrame:
    """SAX-style motif discovery over the daily-revenue series (Lin,
    Keogh et al., "A Symbolic Representation of Time Series", DMKD 2003 —
    public): symbolize each day by its revenue quartile and count the
    repeating 3-letter words. Classic SAX z-normalizes against Gaussian
    breakpoints (sqrt + erf — engine-hostile floats); this variant cuts
    the alphabet at exact EQUI-DEPTH quartiles (the same order-statistic
    machinery as every median in the repo), which is the
    distribution-free form of the same idea and hash-checks bit-for-bit.

    Scale shape (100 TB): the order log collapses to O(days) in one
    map-side-combined aggregate; the quartile cut is the bucketed
    two-pass rank (no data-scaled bare window), and the 3-gram scan is
    two leads over the day-ordered CALENDAR-bounded frame (allow-listed).
    The motif vocabulary is <= 64 words (4^3) — the final count/top-k is
    driver-trivial."""
    from datafusion_pinot_spark.operators.ranking import global_rank

    daily = (
        orders.select(
            F.col("o_orderdate").alias("day"),
            (money("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("day")
        .agg(F.sum("cents").alias("cents"))
    )
    ranked = global_rank(daily, F.expr("cents div 100000"), ["cents", "day"])
    sym = ranked.select(
        "day",
        F.expr(
            "substring('abcd', CAST((rank - 1) * 4 div total + 1 AS INT), 1)"
        ).alias("s"),
    )
    w = Window.orderBy("day")  # calendar-bounded frame (allow-listed)
    motifs = (
        sym.select(
            "day",
            F.concat(
                F.col("s"), F.lead("s", 1).over(w), F.lead("s", 2).over(w)
            ).alias("motif"),
        )
        .filter(F.col("motif").isNotNull())
        .groupBy("motif")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("day").alias("first_day"),
        )
        .orderBy(F.desc("n_occurrences"), "motif")
        .limit(top)
    )
    return motifs


def sax_daily_motifs_oracle_sql(top: int = 10) -> str:
    return f"""
WITH daily AS (
  SELECT o_orderdate AS day,
         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1
), ranked AS (
  SELECT day, row_number() OVER (ORDER BY cents, day) AS rank,
         count(*) OVER () AS total
  FROM daily
), sym AS (
  SELECT day,
         substr('abcd', CAST((rank - 1) * 4 // total + 1 AS INTEGER), 1) AS s
  FROM ranked
), grams AS (
  SELECT day,
         s || lead(s, 1) OVER (ORDER BY day)
           || lead(s, 2) OVER (ORDER BY day) AS motif
  FROM sym
)
SELECT motif, CAST(count(*) AS BIGINT) AS n_occurrences,
       min(day) AS first_day
FROM grams WHERE motif IS NOT NULL
GROUP BY motif
ORDER BY n_occurrences DESC, motif
LIMIT {top}"""


def haar_wavelet_energy(orders: DataFrame, levels: int = 7) -> DataFrame:
    """Unnormalized Haar wavelet energy spectrum of the daily-revenue
    series (first 2^levels days from the first order date) — which
    TIMESCALE carries the variation: day-to-day jitter loads level 1,
    a weekly cycle loads level 3 (2^3 = 8-day pairs straddle it), a
    regime shift loads the top level. Per level: the detail-coefficient
    count, the level's share of total detail energy in exact ppm, and
    the raw energy floored to kilo-dollar^2.

    Exactness: daily revenue floors once to whole dollars; each level's
    detail is the exact integer pair difference ``d_k = s_2k - s_2k+1``
    and its energy sums ``d^2`` on DECIMAL(38,0) (HUGEINT in DuckDB).
    MISSING days need no explicit grid: a signed-sum aggregate over
    ``k = i div 2`` treats an absent pair member as the zero the padded
    grid would hold, so the sparse frame and the dense grid compute
    identical coefficients (and all-missing pairs contribute d = 0).

    Scale shape (100 TB): the corpus collapses to <=2^levels (day, sum)
    rows in ONE map-side-combined shuffle; the ``levels`` chained
    aggregations run on 64-then-32-then-... row frames. Nothing after
    the first shuffle sees data scale."""
    daily = (
        orders.select(
            F.expr(
                "CAST(to_date(o_orderdate) - DATE '1970-01-01' AS BIGINT)"
            ).alias("day"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        )
        .groupBy("day")
        .agg(F.expr("CAST(sum(cents) DIV 100 AS BIGINT)").alias("s"))
    )
    base = daily.agg(F.min("day").alias("day0"))
    cur = (
        daily.crossJoin(F.broadcast(base))
        .withColumn("i", F.col("day") - F.col("day0"))
        .filter(F.col("i") < F.lit(2**levels))
        .select("i", "s")
    )
    energies = None
    for lvl in range(1, levels + 1):
        paired = cur.groupBy(F.expr("i DIV 2").alias("i")).agg(
            F.sum(
                F.when(F.col("i") % 2 == 0, F.col("s")).otherwise(-F.col("s"))
            ).alias("d"),
            F.sum("s").alias("s"),
        )
        e = paired.agg(
            F.lit(lvl).cast("int").alias("level"),
            F.count(F.lit(1)).cast("long").alias("n_coeffs"),
            F.sum(F.expr("CAST(d AS DECIMAL(38,0)) * d")).alias("energy"),
        )
        energies = e if energies is None else energies.unionAll(e)
        cur = paired.select("i", "s")
    total = energies.agg(F.sum("energy").alias("tot"))
    return (
        energies.crossJoin(F.broadcast(total))
        .select(
            "level",
            "n_coeffs",
            F.expr(
                "CAST(CASE WHEN tot = 0 THEN 0"
                " ELSE energy * 1000000 div tot END AS BIGINT)"
            ).alias("energy_share_ppm"),
            F.expr("CAST(energy div 1000 AS BIGINT)").alias("energy_kd2"),
        )
        .orderBy("level")
    )


def haar_wavelet_energy_oracle_sql(levels: int = 7) -> str:
    parts = [
        f"""daily AS (
  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) // 100
              AS BIGINT) AS s
  FROM orders GROUP BY 1
), lvl0 AS (
  SELECT day - (SELECT min(day) FROM daily) AS i, s FROM daily
  WHERE day - (SELECT min(day) FROM daily) < {2**levels}
)"""
    ]
    for lvl in range(1, levels + 1):
        parts.append(
            f"""lvl{lvl} AS MATERIALIZED (
  SELECT i // 2 AS i,
         CAST(sum(CASE WHEN i % 2 = 0 THEN s ELSE -s END) AS BIGINT) AS d,
         CAST(sum(s) AS BIGINT) AS s
  FROM lvl{lvl - 1} GROUP BY i // 2
)"""
        )
    unions = "\nUNION ALL\n".join(
        f"""SELECT {lvl} AS level, count(*) AS n_coeffs,
       CAST(sum(CAST(d AS HUGEINT) * d) AS HUGEINT) AS energy FROM lvl{lvl}"""
        for lvl in range(1, levels + 1)
    )
    return f"""
WITH {", ".join(parts)}, energies AS (
{unions}
), total AS (SELECT sum(energy) AS tot FROM energies)
SELECT CAST(level AS INTEGER) AS level,
       CAST(n_coeffs AS BIGINT) AS n_coeffs,
       CAST(CASE WHEN tot = 0 THEN 0 ELSE energy * 1000000 // tot END
            AS BIGINT) AS energy_share_ppm,
       CAST(energy // 1000 AS BIGINT) AS energy_kd2
FROM energies CROSS JOIN total ORDER BY level"""


def leadlag_xcorr_daily(orders: DataFrame, max_lag: int = 7) -> DataFrame:
    """Lead-lag cross-correlation sweep between the two faces of the
    daily order series — volume (count) leading or lagging revenue — for
    lags -max_lag..+max_lag: at lag L the regression slope of day-(t+L)
    revenue on day-t volume, as the exact sign-split milli fraction
    ``beta = 1000 * (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)``, plus the raw
    covariance numerator and denominator so the reader can judge
    stability. Pairs form by an equi-join on shifted day keys; days
    absent from either side of a lag simply drop (n varies by lag, as a
    real lead-lag audit wants). Products ride DECIMAL(38,0) (HUGEINT in
    DuckDB).

    Scale shape (100 TB): ONE map-side-combined shuffle collapses the
    corpus to the calendar-bounded (day, count, revenue) frame; the
    2*max_lag+1 lag grid explodes per day (a bounded fanout) and joins
    back on the day key — windows nowhere."""
    daily = (
        orders.select(
            F.expr(
                "CAST(to_date(o_orderdate) - DATE '1970-01-01' AS BIGINT)"
            ).alias("day"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        )
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("x"),
            F.expr("CAST(sum(cents) DIV 100 AS BIGINT)").alias("y"),
        )
    )
    lags = F.explode(
        F.array(*[F.lit(l) for l in range(-max_lag, max_lag + 1)])
    ).alias("lag")
    a = daily.select(F.col("day").alias("a_day"), "x").select(
        "a_day", "x", lags
    )
    b = daily.select(F.col("day").alias("b_day"), "y")
    pairs = a.join(b, a.a_day + a.lag == b.b_day)
    return (
        pairs.groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).alias("sxy"),
            F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("sxx"),
        )
        .select(
            F.col("lag").cast("int").alias("lag"),
            F.col("n").cast("long").alias("n_days"),
            F.expr("CAST(n * sxy - sx * sy AS DECIMAL(38,0))")
            .cast("long")
            .alias("cov_num"),
            F.expr("CAST(n * sxx - sx * sx AS DECIMAL(38,0))")
            .cast("long")
            .alias("var_den"),
            F.expr(
                "CAST(CASE WHEN n * sxx - sx * sx = 0 THEN 0"
                " WHEN n * sxy - sx * sy >= 0 THEN"
                " (1000 * (n * sxy - sx * sy)) div (n * sxx - sx * sx)"
                " ELSE -((1000 * (sx * sy - n * sxy))"
                " div (n * sxx - sx * sx)) END AS BIGINT)"
            ).alias("beta_milli"),
        )
        .orderBy("lag")
    )


def leadlag_xcorr_daily_oracle_sql(max_lag: int = 7) -> str:
    return f"""
WITH daily AS (
  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS x,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) // 100
              AS BIGINT) AS y
  FROM orders GROUP BY 1
), lags AS (
  SELECT unnest(range(-{max_lag}, {max_lag + 1})) AS lag
), pairs AS (
  SELECT l.lag, a.x, b.y
  FROM daily a CROSS JOIN lags l
  JOIN daily b ON a.day + l.lag = b.day
), s AS (
  SELECT lag, count(*) AS n,
         CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
  FROM pairs GROUP BY lag
)
SELECT CAST(lag AS INTEGER) AS lag, CAST(n AS BIGINT) AS n_days,
       CAST(n * sxy - sx * sy AS BIGINT) AS cov_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS var_den,
       CAST(CASE WHEN n * sxx - sx * sx = 0 THEN 0
            WHEN n * sxy - sx * sy >= 0 THEN
              (1000 * (n * sxy - sx * sy)) // (n * sxx - sx * sx)
            ELSE -((1000 * (sx * sy - n * sxy))
              // (n * sxx - sx * sx)) END AS BIGINT) AS beta_milli
FROM s ORDER BY lag"""


def binary_segmentation_split(orders: DataFrame) -> DataFrame:
    """Single-changepoint detection by binary segmentation (the classic
    first step of the binseg family, public): over the daily-revenue
    series, the split day minimizing the two-segment squared error —
    equivalently maximizing ``gain = B_l/n_l + B_r/n_r`` (B = squared
    segment sum) since total SSE is constant. The daily series rides in
    KILODOLLARS (``sum(cents) DIV 100000`` — a deliberate, documented
    unit choice that keeps every product inside DECIMAL(38,0) and every
    quotient inside BIGINT up to trillions of dollars of total revenue)
    and the gain compares in FLOORED kd^2 — both engines floor
    identically, so the greedy trace matches exactly; ties break on the
    earliest day. One row: the split day, segment sizes and mean daily
    revenues (milli-kd), and the variance reduction of the split in ppm
    (clamped at 0: the floor fuzz on a useless split may dip the exact
    numerator a few thousand below zero, and trunc-vs-floor division of
    negatives differs between engines).

    Scale shape (100 TB): the corpus collapses to the calendar-bounded
    day frame in ONE shuffle; prefix sums ride a single all-to-one
    window OVER THAT BOUNDED FRAME (allow-listed — same class as
    cusum_changepoint_daily's day scan), and the argmax is a
    TakeOrdered(1). Squared sums ride DECIMAL(38,0)/HUGEINT."""
    daily = (
        orders.select(
            F.expr(
                "CAST(to_date(o_orderdate) - DATE '1970-01-01' AS BIGINT)"
            ).alias("day"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        )
        .groupBy("day")
        .agg(F.expr("CAST(sum(cents) DIV 100000 AS BIGINT)").alias("y"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    pre = daily.select(
        "day",
        "y",
        F.count(F.lit(1)).over(w).alias("nl"),
        F.sum("y").over(w).alias("cy"),
    )
    tot = daily.agg(
        F.count(F.lit(1)).alias("nn"),
        F.sum("y").alias("ty"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).alias("ty2"),
    )
    cand = (
        pre.crossJoin(F.broadcast(tot))
        .filter(F.col("nl") < F.col("nn"))
        .select(
            "day",
            "nl",
            "cy",
            F.expr("nn - nl").alias("nr"),
            F.expr("ty - cy").alias("ry"),
            "nn",
            "ty",
            "ty2",
            F.expr(
                "(CAST(cy AS DECIMAL(38,0)) * cy) div nl"
                " + (CAST(ty - cy AS DECIMAL(38,0)) * (ty - cy))"
                " div (nn - nl)"
            ).alias("gain_kd2"),
        )
    )
    best = cand.orderBy(F.desc("gain_kd2"), F.asc("day")).limit(1)
    return best.select(
        F.col("day").alias("split_day"),
        F.col("nl").cast("long").alias("n_left"),
        F.col("nr").cast("long").alias("n_right"),
        F.expr("CAST(1000 * cy DIV nl AS BIGINT)").alias("mean_left_kd_milli"),
        F.expr("CAST(1000 * ry DIV nr AS BIGINT)").alias("mean_right_kd_milli"),
        F.expr(
            "CAST(CASE WHEN ty2 * nn - CAST(ty AS DECIMAL(38,0)) * ty <= 0"
            " THEN 0"
            " WHEN CAST(gain_kd2 AS DECIMAL(38,0)) * nn"
            "      <= CAST(ty AS DECIMAL(38,0)) * ty THEN 0"
            " ELSE"
            " (CAST(gain_kd2 AS DECIMAL(38,0)) * nn"
            "  - CAST(ty AS DECIMAL(38,0)) * ty)"
            " * 1000000 div (ty2 * nn - CAST(ty AS DECIMAL(38,0)) * ty)"
            " END AS BIGINT)"
        ).alias("var_reduction_ppm"),
    )


def binary_segmentation_split_oracle_sql() -> str:
    return """
WITH daily AS (
  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) // 100000
              AS BIGINT) AS y
  FROM orders GROUP BY 1
), pre AS (
  SELECT day, y,
         count(*) OVER win AS nl,
         sum(y) OVER win AS cy
  FROM daily
  WINDOW win AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW)
), tot AS (
  SELECT count(*) AS nn, CAST(sum(y) AS HUGEINT) AS ty,
         sum(CAST(y AS HUGEINT) * y) AS ty2
  FROM daily
), cand AS (
  SELECT day, nl, cy, nn - nl AS nr, ty - cy AS ry, nn, ty, ty2,
         (CAST(cy AS HUGEINT) * cy) // nl
         + (CAST(ty - cy AS HUGEINT) * (ty - cy)) // (nn - nl)
           AS gain_kd2
  FROM pre CROSS JOIN tot WHERE nl < nn
), best AS (
  SELECT * FROM cand ORDER BY gain_kd2 DESC, day ASC LIMIT 1
)
SELECT day AS split_day,
       CAST(nl AS BIGINT) AS n_left,
       CAST(nr AS BIGINT) AS n_right,
       CAST(1000 * cy // nl AS BIGINT) AS mean_left_kd_milli,
       CAST(1000 * ry // nr AS BIGINT) AS mean_right_kd_milli,
       CAST(CASE WHEN ty2 * nn - ty * ty <= 0 THEN 0
            WHEN CAST(gain_kd2 AS HUGEINT) * nn <= ty * ty THEN 0
            ELSE (CAST(gain_kd2 AS HUGEINT) * nn - ty * ty)
            * 1000000 // (ty2 * nn - ty * ty) END AS BIGINT)
         AS var_reduction_ppm
FROM best"""


# Truncated-EWMA fixed-point weights, shared verbatim by the Spark plan
# and the DuckDB oracle: w_k = floor(2^16 * alpha * (1-alpha)^k), exact
# integer evaluation. fast alpha=1/2 over 8 lags, slow alpha=1/8 over 16.
EWMA_FAST = [2 ** (15 - k) for k in range(8)]
EWMA_SLOW = [(8192 * 7**k) // (8**k) for k in range(16)]


def ewma_crossover_daily(orders: DataFrame) -> DataFrame:
    """Fast/slow EWMA crossover signals on the daily revenue series —
    the classic trend-change detector, made engine-exact by replacing
    the infinite recursion with a TRUNCATED EWMA: a fixed-point dot
    product over the last 8 (fast, alpha=1/2) / 16 (slow, alpha=1/8)
    calendar days using the precomputed integer weights above,
    normalized by the weight mass of the days actually present (calendar
    gaps shrink the mass instead of polluting the average). state is +1
    when fast > slow, else -1; crossed flags a day whose state differs
    from the PRECEDING calendar day's (a gap before a day yields no
    flag — a deliberate, documented choice that keeps the operator a
    pure equi-join).

    Scale shape (100 TB): one map-side-combined shuffle to the
    calendar-bounded day frame, a bounded 16-wide lag explode joined
    back on the day key, one reduce per day, and a day-1 self-join for
    the flag — no windows anywhere, exactly the leadlag_xcorr_daily
    shape."""
    daily = (
        orders.select(
            F.expr(
                "CAST(to_date(o_orderdate) - DATE '1970-01-01' AS BIGINT)"
            ).alias("day"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        )
        .groupBy("day")
        .agg(F.expr("CAST(sum(cents) DIV 100 AS BIGINT)").alias("y"))
    )
    fast_arr = "array(" + ", ".join(f"{w}L" for w in EWMA_FAST) + ")"
    slow_arr = "array(" + ", ".join(f"{w}L" for w in EWMA_SLOW) + ")"
    contrib = daily.select(
        "day",
        "y",
        F.explode(
            F.expr(f"sequence(0, {len(EWMA_SLOW) - 1})")
        ).alias("k"),
    ).select(
        (F.col("day") + F.col("k")).alias("t_day"),
        "y",
        "k",
        F.expr(
            f"CASE WHEN k < {len(EWMA_FAST)}"
            f" THEN element_at({fast_arr}, k + 1) ELSE 0L END"
        ).alias("wf"),
        F.expr(f"element_at({slow_arr}, k + 1)").alias("ws"),
    )
    ew = (
        contrib.join(
            daily.select(F.col("day").alias("t_day"), F.col("y").alias("ty")),
            "t_day",
        )
        .groupBy("t_day")
        .agg(
            F.max("ty").alias("y"),
            F.sum(F.expr("CAST(wf AS DECIMAL(38,0)) * y")).alias("fnum"),
            F.sum("wf").alias("fden"),
            F.sum(F.expr("CAST(ws AS DECIMAL(38,0)) * y")).alias("snum"),
            F.sum("ws").alias("sden"),
        )
        .select(
            F.col("t_day").alias("day"),
            "y",
            F.expr("CAST((1000 * fnum) div fden AS BIGINT)").alias(
                "fast_milli"
            ),
            F.expr("CAST((1000 * snum) div sden AS BIGINT)").alias(
                "slow_milli"
            ),
            F.expr(
                "CAST(CASE WHEN (1000 * fnum) div fden >"
                " (1000 * snum) div sden THEN 1 ELSE -1 END AS BIGINT)"
            ).alias("state"),
        )
    )
    prev = ew.select(
        (F.col("day") + 1).alias("day"), F.col("state").alias("prev_state")
    )
    return (
        ew.join(prev, "day", "left")
        .select(
            "day",
            "y",
            "fast_milli",
            "slow_milli",
            "state",
            F.expr(
                "CAST(CASE WHEN prev_state IS NOT NULL"
                " AND prev_state <> state THEN 1 ELSE 0 END AS BIGINT)"
            ).alias("crossed"),
        )
        .orderBy("day")
    )


def ewma_crossover_daily_oracle_sql() -> str:
    fast_vals = ", ".join(str(w) for w in EWMA_FAST)
    slow_vals = ", ".join(str(w) for w in EWMA_SLOW)
    kf = len(EWMA_FAST)
    ks = len(EWMA_SLOW)
    return f"""
WITH daily AS (
  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) // 100
              AS BIGINT) AS y
  FROM orders GROUP BY 1
), contrib AS (
  SELECT d.day + k.k AS t_day, d.y, k.k,
         CASE WHEN k.k < {kf} THEN ([{fast_vals}])[k.k + 1] ELSE 0 END AS wf,
         ([{slow_vals}])[k.k + 1] AS ws
  FROM daily d CROSS JOIN (SELECT unnest(range(0, {ks})) AS k) k
), ew AS (
  SELECT c.t_day AS day, max(t.y) AS y,
         CAST((1000 * sum(CAST(c.wf AS HUGEINT) * c.y)) // sum(c.wf)
              AS BIGINT) AS fast_milli,
         CAST((1000 * sum(CAST(c.ws AS HUGEINT) * c.y)) // sum(c.ws)
              AS BIGINT) AS slow_milli
  FROM contrib c JOIN daily t ON c.t_day = t.day
  GROUP BY c.t_day
), st AS (
  SELECT day, y, fast_milli, slow_milli,
         CAST(CASE WHEN fast_milli > slow_milli THEN 1 ELSE -1 END
              AS BIGINT) AS state
  FROM ew
)
SELECT a.day, a.y, a.fast_milli, a.slow_milli, a.state,
       CAST(CASE WHEN b.state IS NOT NULL AND b.state <> a.state
            THEN 1 ELSE 0 END AS BIGINT) AS crossed
FROM st a LEFT JOIN st b ON a.day = b.day + 1
ORDER BY a.day"""


def dispersion_index_daily(events: DataFrame) -> DataFrame:
    """Fano factor (variance-to-mean dispersion index, public textbook
    statistic) of the DAILY event-count series per event type: the
    burstiness classifier — ~1000 milli for a Poisson-like arrival
    process, >1000 overdispersed (bursty/campaign-driven), <1000
    underdispersed (throttled/quota'd). Exact integers end to end:
    ``fano_milli = 1000 * (n*Sxx - Sx^2) div ((n-1) * Sx)`` over the
    calendar-bounded day frame (sample variance over mean), and the
    mean in milli. Types with one day or zero events report 0.

    Scale shape (100 TB): ONE map-side-combined shuffle to (type, day)
    counts, one reduce to |types| rows. No windows, no joins."""
    daily = (
        events.select(
            "event_type",
            F.expr("CAST(to_date(ts) - DATE '1970-01-01' AS BIGINT)").alias(
                "day"
            ),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("sxx"),
        )
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_days"),
            F.col("sx").cast("long").alias("n_events"),
            F.expr("CAST(1000 * sx DIV n AS BIGINT)").alias(
                "mean_daily_milli"
            ),
            F.expr(
                "CAST(CASE WHEN n < 2 OR sx = 0 THEN 0 ELSE"
                " (1000 * (n * sxx - CAST(sx AS DECIMAL(38,0)) * sx))"
                " div ((n - 1) * sx) END AS BIGINT)"
            ).alias("fano_milli"),
        )
        .orderBy("event_type")
    )


def dispersion_index_daily_oracle_sql() -> str:
    return """
WITH daily AS (
  SELECT event_type,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
         count(*) AS x
  FROM events GROUP BY 1, 2
), s AS (
  SELECT event_type, count(*) AS n, CAST(sum(x) AS HUGEINT) AS sx,
         sum(CAST(x AS HUGEINT) * x) AS sxx
  FROM daily GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_days,
       CAST(sx AS BIGINT) AS n_events,
       CAST(1000 * sx // n AS BIGINT) AS mean_daily_milli,
       CAST(CASE WHEN n < 2 OR sx = 0 THEN 0 ELSE
            (1000 * (n * sxx - sx * sx)) // ((n - 1) * sx) END AS BIGINT)
         AS fano_milli
FROM s ORDER BY event_type"""

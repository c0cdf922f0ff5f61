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

"""Experimentation + customer-value analytics: A/B conversion comparison
and RFM segmentation.

Both are built from integer-exact aggregates; the only floating-point
steps are final test statistics, rounded to a fixed precision so the
DuckDB oracle agrees bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from datafusion_pinot_spark.operators.ranking import (
    global_rank,
    percentile_rank,
    proportional_bucket,
)


def ab_test_conversion(
    events: DataFrame,
    convert_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Deterministic A/B readout: users split by ``user_id % 2`` (the
    assignment any engine reproduces); a user "converts" when their
    total ``convert_type`` spend exceeds the global per-user low-median
    (an exact order statistic — discriminating at any scale, where
    "any purchase" saturates to 100% on a dense event log). One row:
    per-variant user/convert counts, integer ppm rates, and the pooled
    two-proportion z statistic (the only float, rounded to 4; 0.0 when
    the pooled variance is degenerate).

    One user-keyed aggregate, one two-pass median rank over |users|,
    then a two-row reduce — the event volume collapses map-side."""
    spend = (
        events.select(
            F.col(user_col).alias("u"),
            F.when(
                F.col(type_col) == convert_type,
                F.round(F.col("value") * 100, 0).cast("long"),
            )
            .otherwise(0)
            .alias("cents"),
        )
        .groupBy("u")
        .agg(F.coalesce(F.sum("cents"), F.lit(0)).cast("long").alias("cents"))
    )
    ranked = global_rank(
        spend, F.expr("cents div 1000000"), ["cents", "u"]
    )
    med = ranked.filter(
        F.col("rank") == percentile_rank("total", 50)
    ).select(F.col("cents").alias("median_cents"))
    per_user = (
        ranked.crossJoin(F.broadcast(med))
        .withColumn(
            "converted", (F.col("cents") > F.col("median_cents")).cast("int")
        )
        .withColumn("variant", F.expr("u % 2").cast("int"))
    )
    row = per_user.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("variant") == 0, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("conv_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
        F.sum(F.when(F.col("variant") == 1, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("conv_b"),
    )
    return row.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.expr(
            "CASE WHEN n_a = 0 THEN CAST(0 AS BIGINT) "
            "ELSE conv_a * 1000000L div n_a END"
        ).alias("rate_a_ppm"),
        F.expr(
            "CASE WHEN n_b = 0 THEN CAST(0 AS BIGINT) "
            "ELSE conv_b * 1000000L div n_b END"
        ).alias("rate_b_ppm"),
        F.round(
            F.expr(
                "CASE WHEN n_a = 0 OR n_b = 0 OR conv_a + conv_b = 0 "
                "OR conv_a + conv_b = n_a + n_b THEN 0.0 ELSE "
                "(conv_a / n_a - conv_b / n_b) / "
                "sqrt(((conv_a + conv_b) / (n_a + n_b)) "
                "* (1.0 - (conv_a + conv_b) / (n_a + n_b)) "
                "* (1.0 / n_a + 1.0 / n_b)) END"
            ),
            4,
        ).alias("z_stat"),
    )


def ab_test_conversion_oracle_sql(
    table: str = "events",
    convert_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> str:
    return f"""
WITH spend AS (
  SELECT {user_col} AS u,
         CAST(sum(CASE WHEN {type_col} = '{convert_type}'
                  THEN CAST(round(value * 100, 0) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS cents
  FROM {table} GROUP BY {user_col}
), ranked AS (
  SELECT u, cents, row_number() OVER (ORDER BY cents, u) AS rank,
         count(*) OVER () AS total
  FROM spend
), med AS (
  SELECT cents AS median_cents FROM ranked
  WHERE rank = (total - 1) * 50 // 100 + 1
), per_user AS (
  SELECT u, CASE WHEN cents > (SELECT median_cents FROM med)
                 THEN 1 ELSE 0 END AS c
  FROM spend
), agg AS (
  SELECT CAST(sum(CASE WHEN u % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN u % 2 = 0 THEN c ELSE 0 END) AS BIGINT) AS conv_a,
         CAST(sum(CASE WHEN u % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN u % 2 = 1 THEN c ELSE 0 END) AS BIGINT) AS conv_b
  FROM per_user
)
SELECT n_a, conv_a, n_b, conv_b,
       CASE WHEN n_a = 0 THEN 0 ELSE conv_a * 1000000 // n_a END
         AS rate_a_ppm,
       CASE WHEN n_b = 0 THEN 0 ELSE conv_b * 1000000 // n_b END
         AS rate_b_ppm,
       round(CASE WHEN n_a = 0 OR n_b = 0 OR conv_a + conv_b = 0
                  OR conv_a + conv_b = n_a + n_b THEN 0.0 ELSE
             (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
             / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 / n_a + 1.0 / n_b)) END, 4) AS z_stat
FROM agg"""


def rfm_segments(
    events: DataFrame,
    value_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    quartiles: int = 4,
) -> DataFrame:
    """RFM segmentation: each user scored 1..4 on Recency (days since
    last event, ascending — 1 = most recent), Frequency (event count,
    descending — 1 = most active), and Monetary (purchase cents,
    descending — 1 = highest spend); output is the user count and spend
    per 3-digit RFM code.

    Each quartile is an exact equi-depth cut over the per-user frame via
    the shared two-pass global rank (``ranking.global_rank``) — three
    rank passes over |users| rows (not events), each one bucket shuffle
    + one bucket-partitioned window. The event table itself reduces to
    the per-user frame in a single map-side-combining aggregate."""
    us = F.unix_micros(F.col(ts_col))
    per_user = events.groupBy(F.col(user_col).alias("u")).agg(
        F.max(us).alias("last_us"),
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col(type_col) == value_type,
                    F.round(F.col("value") * 100, 0).cast("long"),
                ).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("cents"),
    )
    anchor = per_user.agg(F.max("last_us").alias("anchor_us"))
    pu = per_user.crossJoin(F.broadcast(anchor)).withColumn(
        "rec_days", F.expr("(anchor_us - last_us) div 86400000000")
    )

    def score(df, val, asc, out, span):
        # span keeps the per-bucket prefix frame small relative to the
        # dimension's value range (buckets must be monotone in __v)
        order_val = F.col(val) if asc else -F.col(val)
        ranked = global_rank(
            df.withColumn("__v", order_val),
            F.expr(f"__v div {span}"),
            ["__v", "u"],
            rank_col="__r",
            total_col="__t",
        )
        return ranked.withColumn(
            out, proportional_bucket("__r", "__t", quartiles)
        ).drop("__v", "__r", "__t")

    scored = score(pu, "rec_days", True, "r_score", 16)
    scored = score(scored, "freq", False, "f_score", 64)
    scored = score(scored, "cents", False, "m_score", 1_000_000)
    return (
        scored.withColumn(
            "rfm_code",
            (
                F.col("r_score") * 100
                + F.col("f_score") * 10
                + F.col("m_score")
            ).cast("int"),
        )
        .groupBy("rfm_code")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        .orderBy("rfm_code")
    )


def rfm_segments_oracle_sql(
    table: str = "events",
    value_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    quartiles: int = 4,
) -> str:
    q = quartiles

    def score(val):
        # same proportional cut as ranking.proportional_bucket, with
        # integer // division (DuckDB / on integers is float division)
        return (
            f"CAST((row_number() OVER (ORDER BY {val}, u) - 1) * {q}"
            f" // count(*) OVER () + 1 AS INTEGER)"
        )

    return f"""
WITH per_user AS (
  SELECT {user_col} AS u, max(epoch_us(ts)) AS last_us,
         CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(CASE WHEN {type_col} = '{value_type}'
                  THEN CAST(round(value * 100, 0) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS cents
  FROM {table} GROUP BY {user_col}
), pu AS (
  SELECT *, (SELECT max(last_us) FROM per_user) AS anchor_us FROM per_user
), dims AS (
  SELECT u, cents,
         (anchor_us - last_us) // 86400000000 AS rec_days,
         freq
  FROM pu
), scored AS (
  SELECT u, cents,
         {score('rec_days')} AS r_score,
         {score('-freq')} AS f_score,
         {score('-cents')} AS m_score
  FROM dims
)
SELECT CAST(r_score * 100 + f_score * 10 + m_score AS INTEGER) AS rfm_code,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM scored GROUP BY 1 ORDER BY rfm_code"""

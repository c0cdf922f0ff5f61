"""Experimentation + customer-value analytics: A/B conversion comparison
and RFM segmentation.

Both are built from integer-exact aggregates; the only floating-point
steps are final test statistics, rounded to a fixed precision so the
DuckDB oracle agrees bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from datafusion_pinot_spark.functions import money
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


# Poisson(1) inverse-CDF thresholds on the 48-bit md5-prefix scale:
# T[k] = floor(P(X <= k) * 2^48). A uniform u in [0, 2^48) maps to the
# weight `min k with u < T[k]` (else 9 — P(X > 8) < 1.2e-6, the tail cap).
# The constants are FIXED literals shared by the Spark and DuckDB sides,
# so engine parity never depends on runtime float math.
_POISSON1_T48 = [
    103548857136060,
    207097714272121,
    258872142840152,
    276130285696162,
    280444821410164,
    281307728552965,
    281451546410098,
    281472091818260,
    281474659994280,
]
_BOOT_B = 32  # bootstrap replicates


def _poisson_weight_case(u_expr: str) -> str:
    """SQL CASE ladder mapping a 48-bit uniform to a Poisson(1) draw —
    dialect-neutral (pure integer comparisons), used verbatim by both
    engines."""
    whens = " ".join(
        f"WHEN {u_expr} < {t} THEN {k}" for k, t in enumerate(_POISSON1_T48)
    )
    return f"CASE {whens} ELSE 9 END"


def bootstrap_ci_aov(orders: DataFrame, b: int = _BOOT_B) -> DataFrame:
    """Deterministic Poisson-bootstrap confidence interval for the average
    order value — the uncertainty attachment every pipeline metric needs
    before a go/no-go reading. Classic resampling draws n rows with
    replacement per replicate, which cannot be expressed as a scan; the
    Poisson bootstrap (Chamandy et al., "Estimating Uncertainty for
    Massive Data Streams", Google 2012 — public) replaces the multinomial
    with independent Poisson(1) weights per (row, replicate), making each
    replicate a weighted aggregate over ONE pass.

    Determinism: the weight for (order, replicate) is the Poisson(1)
    inverse-CDF of the 48-bit md5-prefix uniform of ``'boot|b|orderkey'``
    against FIXED integer thresholds (``_POISSON1_T48``) — both engines
    compare the same integers, so the gate sees bit-equal replicates.
    Replicate means are exact integer milli-cents (weighted DECIMAL(38,0)
    cent sums, floor division); the interval is the 2nd / 31st order
    statistic of the 32 replicate means (a ~90.6% CI, documented rather
    than interpolated — order statistics stay integers).

    Scale shape (100 TB): the explode is a constant 32x map-side fanout
    (no shuffle until the 32-group aggregate), partial aggregation
    collapses each partition to <= 32 rows, and the order statistics come
    from a sort_array over the 32-element collected list — bounded by the
    replicate parameter, never by data. Weighted sums ride DECIMAL(38,0)
    (HUGEINT in DuckDB): 9 * cents * rows stays exact past 1e12 rows."""
    reps = F.explode(F.sequence(F.lit(0), F.lit(b - 1))).alias("rep")
    u = (
        "CAST(conv(substring(md5(concat('boot|', CAST(rep AS STRING), '|',"
        " CAST(o_orderkey AS STRING))), 1, 12), 16, 10) AS BIGINT)"
    )
    weighted = orders.select(
        (money("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderkey",
    ).select("cents", "o_orderkey", reps).select(
        "cents",
        F.expr(_poisson_weight_case(u)).cast("long").alias("w"),
        "rep",
    )
    rep_means = (
        weighted.groupBy("rep")
        .agg(
            F.sum(F.expr("CAST(w AS DECIMAL(38,0)) * cents")).alias("swc"),
            F.sum("w").alias("sw"),
        )
        .select(
            "rep",
            F.expr(
                "CAST(CASE WHEN sw > 0 THEN (swc * 1000) div sw"
                " ELSE 0 END AS BIGINT)"
            ).alias("rep_mean_milli"),
        )
    )
    point = orders.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.expr(
            "CAST((CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
            " AS BIGINT)) AS DECIMAL(38,0)) * 1000) div count(*) AS BIGINT)"
        ).alias("aov_milli"),
    )
    booted = rep_means.agg(
        F.sort_array(F.collect_list("rep_mean_milli")).alias("ms"),
        F.count(F.lit(1)).alias("n_replicates"),
    )
    return (
        point.crossJoin(F.broadcast(booted))
        .select(
            "n_orders",
            "n_replicates",
            "aov_milli",
            F.element_at("ms", 2).alias("boot_lo_milli"),
            F.element_at("ms", b - 1).alias("boot_hi_milli"),
            (F.element_at("ms", b - 1) - F.element_at("ms", 2)).alias(
                "boot_spread_milli"
            ),
        )
    )


def bootstrap_ci_aov_oracle_sql(b: int = _BOOT_B) -> str:
    h = (
        "md5('boot|' || CAST(rep AS VARCHAR) || '|'"
        " || CAST(o_orderkey AS VARCHAR))"
    )
    poly = " + ".join(
        f"(CAST(strpos('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1"
        f" AS BIGINT) * {16 ** (12 - 1 - i)})"
        for i in range(12)
    )
    w_case = _poisson_weight_case(f"({poly})")
    return f"""
WITH reps AS (
  SELECT unnest(range({b})) AS rep
), weighted AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         CAST({w_case} AS BIGINT) AS w, rep
  FROM orders CROSS JOIN reps
), rep_means AS (
  SELECT rep,
         CAST(CASE WHEN sum(w) > 0
              THEN (CAST(sum(CAST(w AS HUGEINT) * cents) AS HUGEINT) * 1000)
                   // sum(w)
              ELSE 0 END AS BIGINT) AS rep_mean_milli
  FROM weighted GROUP BY rep
), booted AS (
  SELECT list_sort(list(rep_mean_milli)) AS ms,
         CAST(count(*) AS BIGINT) AS n_replicates
  FROM rep_means
), point AS (
  SELECT CAST(count(*) AS BIGINT) AS n_orders,
         CAST((CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                   AS BIGINT)) AS HUGEINT) * 1000) // count(*) AS BIGINT)
           AS aov_milli
  FROM orders
)
SELECT n_orders, n_replicates, aov_milli,
       CAST(ms[2] AS BIGINT) AS boot_lo_milli,
       CAST(ms[{b - 1}] AS BIGINT) AS boot_hi_milli,
       CAST(ms[{b - 1}] - ms[2] AS BIGINT) AS boot_spread_milli
FROM point, booted"""


def cuped_adjusted_lift(events: DataFrame) -> DataFrame:
    """CUPED variance reduction (Deng, Xu, Kohavi, Walker — "Improving the
    Sensitivity of Online Controlled Experiments", WSDM 2013, public): use
    each user's PRE-period activity as a control covariate for their
    POST-period metric, shrinking the variance of the measured lift by the
    squared correlation rho^2. The calendar midpoint of the event stream
    splits pre from post; users hash-assign to two arms (md5-prefix mod 2,
    the ab_test_srm_check idiom).

    theta = cov(X, Y) / var(X) and rho^2 come out of the five raw moment
    sums, all rational in integer milli-value sums — products ride
    DECIMAL(38,0) (HUGEINT in DuckDB). Signed floor divisions are
    sign-split (``sign * (abs(num) * scale div den)``) because Spark `div`
    truncates while DuckDB `//` floors — they agree only on non-negative
    numerators (the kendall_tau lesson). rho2_ppm is the composed floor
    form ``(|cov|*1e3 div varx) * (|cov|*1e3 div vary)`` — exactly
    representable in both engines, <= 1e6 by Cauchy-Schwarz — rather than
    cov^2/(varx*vary), whose 128-bit numerator would overflow DECIMAL(38).

    Scale shape (100 TB): one map-side-combined per-user shuffle collapses
    the event log; everything after is a single-row moment aggregate plus
    integer expressions. The midpoint is a 1-row broadcast. Moment-sum
    bound: n * sum(x*y) stays under 1e38 for any corpus with fewer than
    ~1e12 users at 1e8 milli-value each — document, don't guard."""
    ev = events.select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.expr("CAST(CAST(value AS DECIMAL(18,3)) * 1000 AS BIGINT)").alias(
            "v"
        ),
    )
    mid = ev.agg(
        F.expr("CAST((min(us) + max(us)) div 2 AS BIGINT)").alias("mid_us")
    )
    per_user = (
        ev.crossJoin(F.broadcast(mid))
        .groupBy("user_id")
        .agg(
            F.sum(F.expr("CASE WHEN us < mid_us THEN v ELSE 0 END")).alias(
                "x"
            ),
            F.sum(F.expr("CASE WHEN us >= mid_us THEN v ELSE 0 END")).alias(
                "y"
            ),
        )
        .select(
            "x",
            "y",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("cuped|"),
                                F.col("user_id").cast("string"),
                            )
                        ),
                        1,
                        12,
                    ),
                    16,
                    10,
                ).cast("long")
                % 2
            ).alias("arm"),
        )
    )
    d = "CAST({} AS DECIMAL(38,0))"
    moments = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr(d.format("x"))).alias("sx"),
        F.sum(F.expr(d.format("y"))).alias("sy"),
        F.sum(F.expr(d.format("x") + " * y")).alias("sxy"),
        F.sum(F.expr(d.format("x") + " * x")).alias("sxx"),
        F.sum(F.expr(d.format("y") + " * y")).alias("syy"),
        F.sum(F.expr("CASE WHEN arm = 0 THEN 1 ELSE 0 END")).alias("n_a"),
        F.sum(F.expr("CASE WHEN arm = 1 THEN 1 ELSE 0 END")).alias("n_b"),
        F.sum(F.expr("CASE WHEN arm = 0 THEN x ELSE 0 END")).alias("sxa"),
        F.sum(F.expr("CASE WHEN arm = 1 THEN x ELSE 0 END")).alias("sxb"),
        F.sum(F.expr("CASE WHEN arm = 0 THEN y ELSE 0 END")).alias("sya"),
        F.sum(F.expr("CASE WHEN arm = 1 THEN y ELSE 0 END")).alias("syb"),
    )
    derived = moments.select(
        "*",
        F.expr("CAST(n AS DECIMAL(38,0)) * sxy - sx * sy").alias("cov_num"),
        F.expr("CAST(n AS DECIMAL(38,0)) * sxx - sx * sx").alias("varx_num"),
        F.expr("CAST(n AS DECIMAL(38,0)) * syy - sy * sy").alias("vary_num"),
        F.expr("CAST((sx * 1000) div n AS BIGINT)").alias("mx_milli"),
        F.expr(
            "CASE WHEN n_a > 0 THEN CAST((sxa * 1000) div n_a AS BIGINT)"
            " ELSE 0 END"
        ).alias("mxa_milli"),
        F.expr(
            "CASE WHEN n_b > 0 THEN CAST((sxb * 1000) div n_b AS BIGINT)"
            " ELSE 0 END"
        ).alias("mxb_milli"),
        F.expr(
            "CASE WHEN n_a > 0 THEN CAST((sya * 1000) div n_a AS BIGINT)"
            " ELSE 0 END"
        ).alias("mya_milli"),
        F.expr(
            "CASE WHEN n_b > 0 THEN CAST((syb * 1000) div n_b AS BIGINT)"
            " ELSE 0 END"
        ).alias("myb_milli"),
    ).select(
        "*",
        F.expr(
            "CASE WHEN varx_num > 0 THEN"
            " CAST(CASE WHEN cov_num >= 0 THEN 1 ELSE -1 END"
            " * ((abs(cov_num) * 1000000) div varx_num) AS BIGINT)"
            " ELSE 0 END"
        ).alias("theta_ppm"),
        F.expr(
            "CASE WHEN varx_num > 0 AND vary_num > 0 THEN"
            " CAST(((abs(cov_num) * 1000) div varx_num)"
            " * ((abs(cov_num) * 1000) div vary_num) AS BIGINT)"
            " ELSE 0 END"
        ).alias("rho2_ppm"),
    )

    def adj(my: str, mx: str) -> str:
        # mean_y - theta * (mean_x_arm - mean_x_all), sign-split floor
        return (
            f"{my} - (CASE WHEN theta_ppm * ({mx} - mx_milli) >= 0"
            f" THEN 1 ELSE -1 END)"
            f" * (abs(theta_ppm * ({mx} - mx_milli)) div 1000000)"
        )

    return derived.select(
        F.col("n").alias("n_users"),
        "n_a",
        "n_b",
        "theta_ppm",
        "rho2_ppm",
        F.expr("CAST(myb_milli - mya_milli AS BIGINT)").alias(
            "lift_raw_milli"
        ),
        F.expr(
            "CAST(("
            + adj("myb_milli", "mxb_milli")
            + ") - ("
            + adj("mya_milli", "mxa_milli")
            + ") AS BIGINT)"
        ).alias("lift_cuped_milli"),
    )


def cuped_adjusted_lift_oracle_sql() -> str:
    h = "md5('cuped|' || CAST(user_id AS VARCHAR))"
    poly = " + ".join(
        f"(CAST(strpos('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1"
        f" AS BIGINT) * {16 ** (12 - 1 - i)})"
        for i in range(12)
    )
    adj_b = (
        "myb_milli - (CASE WHEN theta_ppm * (mxb_milli - mx_milli) >= 0"
        " THEN 1 ELSE -1 END)"
        " * (abs(theta_ppm * (mxb_milli - mx_milli)) // 1000000)"
    )
    adj_a = (
        "mya_milli - (CASE WHEN theta_ppm * (mxa_milli - mx_milli) >= 0"
        " THEN 1 ELSE -1 END)"
        " * (abs(theta_ppm * (mxa_milli - mx_milli)) // 1000000)"
    )
    return f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us,
         CAST(CAST(value AS DECIMAL(18,3)) * 1000 AS BIGINT) AS v
  FROM events
), mid AS (
  SELECT (min(us) + max(us)) // 2 AS mid_us FROM ev
), per_user AS (
  SELECT user_id,
         CAST(sum(CASE WHEN us < mid_us THEN v ELSE 0 END) AS BIGINT) AS x,
         CAST(sum(CASE WHEN us >= mid_us THEN v ELSE 0 END) AS BIGINT) AS y
  FROM ev CROSS JOIN mid GROUP BY user_id
), armed AS (
  SELECT x, y, ({poly}) % 2 AS arm FROM per_user
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(CAST(x AS HUGEINT)) AS sx,
         sum(CAST(y AS HUGEINT)) AS sy,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(y AS HUGEINT) * y) AS syy,
         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         sum(CAST(CASE WHEN arm = 0 THEN x ELSE 0 END AS HUGEINT)) AS sxa,
         sum(CAST(CASE WHEN arm = 1 THEN x ELSE 0 END AS HUGEINT)) AS sxb,
         sum(CAST(CASE WHEN arm = 0 THEN y ELSE 0 END AS HUGEINT)) AS sya,
         sum(CAST(CASE WHEN arm = 1 THEN y ELSE 0 END AS HUGEINT)) AS syb
  FROM armed
), der AS (
  SELECT *,
         CAST(n AS HUGEINT) * sxy - sx * sy AS cov_num,
         CAST(n AS HUGEINT) * sxx - sx * sx AS varx_num,
         CAST(n AS HUGEINT) * syy - sy * sy AS vary_num,
         CAST((sx * 1000) // n AS BIGINT) AS mx_milli,
         CASE WHEN n_a > 0 THEN CAST((sxa * 1000) // n_a AS BIGINT)
              ELSE 0 END AS mxa_milli,
         CASE WHEN n_b > 0 THEN CAST((sxb * 1000) // n_b AS BIGINT)
              ELSE 0 END AS mxb_milli,
         CASE WHEN n_a > 0 THEN CAST((sya * 1000) // n_a AS BIGINT)
              ELSE 0 END AS mya_milli,
         CASE WHEN n_b > 0 THEN CAST((syb * 1000) // n_b AS BIGINT)
              ELSE 0 END AS myb_milli
  FROM m
), der2 AS (
  SELECT *,
         CASE WHEN varx_num > 0 THEN
           CAST(CASE WHEN cov_num >= 0 THEN 1 ELSE -1 END
                * ((abs(cov_num) * 1000000) // varx_num) AS BIGINT)
           ELSE 0 END AS theta_ppm,
         CASE WHEN varx_num > 0 AND vary_num > 0 THEN
           CAST(((abs(cov_num) * 1000) // varx_num)
                * ((abs(cov_num) * 1000) // vary_num) AS BIGINT)
           ELSE 0 END AS rho2_ppm
  FROM der
)
SELECT n AS n_users, n_a, n_b, theta_ppm, rho2_ppm,
       CAST(myb_milli - mya_milli AS BIGINT) AS lift_raw_milli,
       CAST(({adj_b}) - ({adj_a}) AS BIGINT) AS lift_cuped_milli
FROM der2"""


def mde_sample_size_grid(events: DataFrame) -> DataFrame:
    """Pre-experiment power analysis from pilot data: for a grid of
    minimum-detectable-effect sizes (1/2/5/10/20% of the mean), the
    per-arm sample size a two-sample test at alpha=.05 (two-sided),
    power=.80 needs, computed from the pilot's per-user purchase-spend
    variance. The closed form ``n = (z_a + z_b)^2 * 2 s^2 / delta^2``
    (public; z-sum squared carried as the exact rational 7849/1000) is
    evaluated in one integer ceiling division so the row hash-checks
    across engines:
    ``n_req = ceil(156980 * s2_num * n / ((n-1) * m^2 * sx^2))``
    (coefficient = 7849 * 2 * 1e4 / 1000 — the 1e4 undoes the percent
    squaring, the 1000 the z-sum's milli carry) with
    ``s2_num = n*sxx - sx^2`` on DECIMAL(38,0) (HUGEINT in DuckDB)
    — exact to ~1e34-cent^2 pilot moments, far past any real pilot.

    Scale shape (100 TB): ONE user-keyed partial-aggregated shuffle
    collapses the event log to per-user spend, a second tiny agg folds
    the three moments into one row, and the 5-row MDE grid cross-joins
    that broadcast scalar. Nothing downstream of the first shuffle sees
    data scale."""
    spend = (
        events.select(
            F.col("user_id").alias("u"),
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100, 0).cast("long"),
            )
            .otherwise(0)
            .alias("cents"),
        )
        .groupBy("u")
        .agg(F.coalesce(F.sum("cents"), F.lit(0)).cast("long").alias("cents"))
    )
    stats = spend.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").cast("long").alias("sx"),
        F.sum(
            F.expr("CAST(cents AS DECIMAL(38,0)) * cents")
        ).alias("sxx"),
    )
    grid = stats.select(
        "n",
        "sx",
        "sxx",
        F.explode(
            F.array(*[F.lit(m) for m in (1, 2, 5, 10, 20)])
        ).alias("mde_pct"),
    )
    return grid.select(
        F.col("mde_pct").cast("int").alias("mde_pct"),
        F.col("n").cast("long").alias("n_pilot"),
        F.expr("CAST(1000 * sx DIV n AS BIGINT)").alias("mean_cents_milli"),
        F.expr(
            "CAST(CASE WHEN n <= 1 THEN 0 ELSE"
            " (CAST(n AS DECIMAL(38,0)) * sxx"
            "  - CAST(sx AS DECIMAL(38,0)) * sx)"
            " div (CAST(n AS DECIMAL(38,0)) * (n - 1)) END AS BIGINT)"
        ).alias("var_cents2"),
        F.expr("CAST(10 * mde_pct * sx DIV n AS BIGINT)").alias(
            "delta_cents_milli"
        ),
        F.expr(
            "CAST(CASE WHEN n <= 1 OR sx <= 0 THEN 0 ELSE"
            " (CAST(156980 AS DECIMAL(38,0))"
            "   * (CAST(n AS DECIMAL(38,0)) * sxx"
            "      - CAST(sx AS DECIMAL(38,0)) * sx) * n"
            "  + CAST(n - 1 AS DECIMAL(38,0)) * mde_pct * mde_pct"
            "    * sx * sx - 1)"
            " div (CAST(n - 1 AS DECIMAL(38,0)) * mde_pct * mde_pct"
            "      * sx * sx) END AS BIGINT)"
        ).alias("n_required_per_arm"),
    ).orderBy("mde_pct")


def mde_sample_size_grid_oracle_sql() -> str:
    return """
WITH spend AS (
  SELECT user_id AS u,
         CAST(sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100, 0) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS cents
  FROM events GROUP BY user_id
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS BIGINT) AS sx,
         CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS sxx
  FROM spend
), grid AS (
  SELECT n, sx, sxx, unnest([1, 2, 5, 10, 20]) AS mde_pct FROM stats
)
SELECT CAST(mde_pct AS INTEGER) AS mde_pct,
       n AS n_pilot,
       CAST(1000 * sx // n AS BIGINT) AS mean_cents_milli,
       CAST(CASE WHEN n <= 1 THEN 0 ELSE
            (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
            // (CAST(n AS HUGEINT) * (n - 1)) END AS BIGINT) AS var_cents2,
       CAST(10 * mde_pct * sx // n AS BIGINT) AS delta_cents_milli,
       CAST(CASE WHEN n <= 1 OR sx <= 0 THEN 0 ELSE
            (CAST(156980 AS HUGEINT)
              * (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx) * n
             + CAST(n - 1 AS HUGEINT) * mde_pct * mde_pct
               * sx * sx - 1)
            // (CAST(n - 1 AS HUGEINT) * mde_pct * mde_pct
                * sx * sx) END AS BIGINT) AS n_required_per_arm
FROM grid ORDER BY mde_pct"""

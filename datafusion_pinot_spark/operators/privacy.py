"""PII detection / redaction for LLM training-data curation.

Pure built-in column expressions (``regexp_extract_all`` for detection,
chained ``regexp_replace`` for masking) — JVM-side, codegen'd, zero Python
in the hot path, so the operator is an embarrassingly parallel narrow map
that scales linearly with executors at 100 TB.

The patterns use only syntax shared by Java regex (Spark) and RE2
(DuckDB, re2-based scanners generally): character classes, bounded
repetition, non-capturing groups, ``\\b`` — no backreferences or
lookaround, which RE2 rejects. Redaction is applied in the caller-given
kind order, each pass over the output of the previous one, so a broader
later pattern (e.g. ``number``) cannot eat the inside of an already
masked narrower match (e.g. the digits of an ``email`` local part).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# Detection patterns, deliberately conservative (low false-positive) —
# a production pipeline would layer checksummed validators (Luhn etc.)
# behind these prefilters.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    "phone": (r"\+[0-9][0-9() \-]{6,}[0-9]", "<PHONE>"),
    "number": (r"[0-9]{2,}", "<NUM>"),
}


def pii_redact(
    df: DataFrame,
    col: str,
    kinds: tuple[str, ...] = ("email", "ipv4", "number"),
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Per-row PII counts (on the ORIGINAL text, one column per kind) plus
    the redacted text with every kind masked in ``kinds`` order."""
    out = df.select(
        *[F.col(c) for c in keep],
        *[
            F.size(F.regexp_extract_all(col, F.lit(PII_PATTERNS[k][0]), 0))
            .cast("long")
            .alias(f"n_{k}")
            for k in kinds
        ],
        F.col(col).alias("redacted"),
    )
    for k in kinds:
        pat, token = PII_PATTERNS[k]
        out = out.withColumn("redacted", F.regexp_replace("redacted", pat, token))
    return out


def pii_redact_oracle_sql(
    table: str,
    col: str,
    kinds: tuple[str, ...] = ("email", "ipv4", "number"),
    keep: tuple[str, ...] = (),
) -> str:
    counts = ",\n       ".join(
        "CAST(len(regexp_extract_all({c}, '{p}')) AS BIGINT) AS n_{k}".format(
            c=col, p=PII_PATTERNS[k][0].replace("'", "''"), k=k
        )
        for k in kinds
    )
    redacted = col
    for k in kinds:
        pat, token = PII_PATTERNS[k]
        redacted = "regexp_replace({r}, '{p}', '{t}', 'g')".format(
            r=redacted, p=pat.replace("'", "''"), t=token
        )
    keep_cols = "".join(f"{c}, " for c in keep)
    return (
        f"SELECT {keep_cols}{counts},\n       {redacted} AS redacted\n"
        f"FROM {table}"
    )


def k_anonymity_audit(events: DataFrame, k: int = 5) -> DataFrame:
    """k-anonymity audit over quasi-identifiers (Sweeney 2002, public):
    a user whose (event_type, hour-of-day, value-band) combination is
    shared by fewer than ``k`` users is re-identifiable from those
    attributes alone. The audit reports, per event_type, how many
    quasi-identifier groups and users fall below the threshold — the
    release-gating statistic a privacy review needs before exporting an
    interaction dataset.

    Scale shape: two map-side-combined aggregations (distinct users per
    quasi-id tuple, then the per-type rollup); the quasi-id space is
    bounded (types x 24 hours x value bands), so the intermediate is tiny
    regardless of corpus size. All arithmetic integer."""
    qid = events.select(
        "event_type",
        F.hour("ts").alias("hr"),
        F.floor(F.col("value") / 50).cast("bigint").alias("vband"),
        "user_id",
    )
    groups = qid.groupBy("event_type", "hr", "vband").agg(
        F.count_distinct("user_id").alias("n_users")
    )
    return (
        groups.groupBy("event_type")
        .agg(
            F.count("*").alias("n_groups"),
            F.sum((F.col("n_users") < k).cast("bigint")).alias(
                "small_groups"
            ),
            F.sum(
                F.when(F.col("n_users") < k, F.col("n_users")).otherwise(
                    F.lit(0)
                )
            ).alias("exposed_users"),
        )
        .orderBy("event_type")
    )


def k_anonymity_audit_oracle_sql(k: int = 5) -> str:
    return f"""
WITH qid AS (
  SELECT event_type, extract(hour FROM ts) AS hr,
         CAST(floor(value / 50) AS BIGINT) AS vband, user_id
  FROM events
), groups AS (
  SELECT event_type, hr, vband, count(DISTINCT user_id) AS n_users
  FROM qid GROUP BY event_type, hr, vband
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN n_users < {k} THEN 1 ELSE 0 END) AS BIGINT)
         AS small_groups,
       CAST(sum(CASE WHEN n_users < {k} THEN n_users ELSE 0 END) AS BIGINT)
         AS exposed_users
FROM groups GROUP BY event_type ORDER BY event_type
"""


def l_diversity_audit(events: DataFrame, l: int = 3) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007, public) — the
    companion check to :func:`k_anonymity_audit`: a quasi-identifier
    group is l-diverse when its SENSITIVE attribute (here the event's
    value band as a stand-in for a sensitive category) takes at least
    ``l`` distinct values; a k-anonymous group whose members all share
    one sensitive value still leaks it (homogeneity attack). Reports,
    per event_type, the group count, how many groups fall below ``l``
    distinct sensitive values, and the minimum diversity observed.

    Scale shape: identical to the k-anonymity audit — two map-side-
    combined aggregations over a bounded quasi-id space (types x 24
    hours); the sensitive-diversity count is an exact distinct inside
    each tiny group. All arithmetic integer."""
    qid = events.select(
        "event_type",
        F.hour("ts").alias("hr"),
        F.floor(F.col("value") / 50).cast("bigint").alias("sens"),
    )
    groups = qid.groupBy("event_type", "hr").agg(
        F.count_distinct("sens").alias("n_sens")
    )
    return (
        groups.groupBy("event_type")
        .agg(
            F.count("*").alias("n_groups"),
            F.sum((F.col("n_sens") < l).cast("bigint")).alias(
                "low_diversity_groups"
            ),
            F.min("n_sens").alias("min_diversity"),
        )
        .orderBy("event_type")
    )


def l_diversity_audit_oracle_sql(l: int = 3) -> str:
    return f"""
WITH qid AS (
  SELECT event_type, extract(hour FROM ts) AS hr,
         CAST(floor(value / 50) AS BIGINT) AS sens
  FROM events
), groups AS (
  SELECT event_type, hr, count(DISTINCT sens) AS n_sens
  FROM qid GROUP BY event_type, hr
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN n_sens < {l} THEN 1 ELSE 0 END) AS BIGINT)
         AS low_diversity_groups,
       CAST(min(n_sens) AS BIGINT) AS min_diversity
FROM groups GROUP BY event_type ORDER BY event_type
"""


def t_closeness_audit(events: DataFrame, t_ppm: int = 200_000) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007, public) — the
    third leg of the release-gating trio with :func:`k_anonymity_audit`
    and :func:`l_diversity_audit`: an l-diverse quasi-identifier group
    still leaks when its sensitive-value DISTRIBUTION is skewed far from
    the table-wide one (skewness attack). Per quasi-id group
    (event_type, hour) the audit computes the total variation distance
    between the group's sensitive-band distribution and the global one,
    in exact ppm:

        tvd_g = Σ_v |c_gv·N − c_v·N_g| · 10^6  DIV  (2·N·N_g)

    — BIGINT throughout, so rows are bit-identical across engines.
    Values ABSENT from a group still contribute (|0 − c_v·N_g|), which is
    why the group frame is the groups×values cross product, not just the
    observed pairs. Reports per event_type: group count, worst (max) TVD,
    and how many groups exceed the ``t_ppm`` threshold.

    Scale shape: three map-side-combined aggregations over the corpus
    (global value counts, per-group totals, per-(group,value) counts) —
    each collapses 100 TB to a bounded frame (types × 24 hours × value
    bands); the cross product and the |·| fold run on those tiny frames
    with both small sides broadcast. No corpus-sized shuffle beyond the
    three aggs."""
    qid = events.select(
        "event_type",
        F.hour("ts").alias("hr"),
        F.floor(F.col("value") / 50).cast("bigint").alias("sens"),
    )
    global_v = qid.groupBy("sens").agg(F.count(F.lit(1)).alias("c_v"))
    n_total = qid.agg(F.count(F.lit(1)).alias("n")).select("n")
    groups = qid.groupBy("event_type", "hr").agg(
        F.count(F.lit(1)).alias("n_g")
    )
    cell = qid.groupBy("event_type", "hr", "sens").agg(
        F.count(F.lit(1)).alias("c_gv")
    )
    full = (
        groups.join(F.broadcast(global_v))
        .join(F.broadcast(n_total))
        .join(cell, ["event_type", "hr", "sens"], "left")
        .withColumn("c_gv", F.coalesce(F.col("c_gv"), F.lit(0)))
    )
    tvd = full.groupBy("event_type", "hr").agg(
        F.expr(
            "CAST(sum(abs(c_gv * n - c_v * n_g)) * 1000000"
            " DIV (2 * any_value(n) * any_value(n_g)) AS BIGINT)"
        ).alias("tvd_ppm")
    )
    return (
        tvd.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.max("tvd_ppm").alias("max_tvd_ppm"),
            F.sum((F.col("tvd_ppm") > t_ppm).cast("bigint")).alias(
                "groups_over_t"
            ),
        )
        .orderBy("event_type")
    )


def t_closeness_audit_oracle_sql(t_ppm: int = 200_000) -> str:
    return f"""
WITH qid AS (
  SELECT event_type, extract(hour FROM ts) AS hr,
         CAST(floor(value / 50) AS BIGINT) AS sens
  FROM events
), global_v AS (
  SELECT sens, count(*) AS c_v FROM qid GROUP BY sens
), tot AS (
  SELECT count(*) AS n FROM qid
), groups AS (
  SELECT event_type, hr, count(*) AS n_g FROM qid GROUP BY event_type, hr
), cell AS (
  SELECT event_type, hr, sens, count(*) AS c_gv
  FROM qid GROUP BY event_type, hr, sens
), full_grid AS (
  SELECT g.event_type, g.hr, v.sens, g.n_g, v.c_v, t.n,
         coalesce(c.c_gv, 0) AS c_gv
  FROM groups g CROSS JOIN global_v v CROSS JOIN tot t
  LEFT JOIN cell c ON c.event_type = g.event_type AND c.hr = g.hr
                  AND c.sens = v.sens
), tvd AS (
  SELECT event_type, hr,
         CAST(sum(abs(c_gv * n - c_v * n_g)) * 1000000
              // (2 * any_value(n) * any_value(n_g)) AS BIGINT) AS tvd_ppm
  FROM full_grid GROUP BY event_type, hr
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(max(tvd_ppm) AS BIGINT) AS max_tvd_ppm,
       CAST(sum(CASE WHEN tvd_ppm > {t_ppm} THEN 1 ELSE 0 END) AS BIGINT)
         AS groups_over_t
FROM tvd GROUP BY event_type ORDER BY event_type
"""


def contribution_sensitivity_audit(
    events: DataFrame, clip: int = 10
) -> DataFrame:
    """User-contribution sensitivity audit — the number a differential-
    privacy release needs BEFORE choosing noise: per event_type, the
    maximum events any single user contributes (the unbounded L1
    sensitivity of a count query), the exact median per-user
    contribution, and what clipping contributions at ``clip`` would cost
    (users touched, rows lost). Deterministic and integer-exact — the DP
    noise itself is random and does not belong in a hash-gated catalog;
    the sensitivity accounting that sizes it does.

    Scale shape: one map-side-combined (type, user) count collapses the
    corpus; the per-type rollup and the exact rank median run on that
    users-sized frame, windowed per type (no global sort)."""
    per_user = events.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n_u")
    )
    w = Window.partitionBy("event_type").orderBy("n_u", "user_id")
    wn = Window.partitionBy("event_type")
    ranked = per_user.withColumn("rk", F.row_number().over(w)).withColumn(
        "n_users", F.count(F.lit(1)).over(wn)
    )
    med = (
        ranked.filter(F.col("rk") == F.expr("(n_users + 1) DIV 2"))
        .select("event_type", F.col("n_u").alias("median_contrib"))
    )
    agg = per_user.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.max("n_u").alias("max_contrib"),
        F.sum(
            F.when(F.col("n_u") > clip, F.col("n_u") - clip).otherwise(
                F.lit(0)
            )
        ).cast("long").alias("rows_lost_at_clip"),
        F.sum((F.col("n_u") > clip).cast("bigint")).alias(
            "users_clipped"
        ),
    )
    return (
        agg.join(med, "event_type")
        .select(
            "event_type",
            "n_users",
            "max_contrib",
            "median_contrib",
            "users_clipped",
            "rows_lost_at_clip",
        )
        .orderBy("event_type")
    )


def contribution_sensitivity_audit_oracle_sql(clip: int = 10) -> str:
    return f"""
WITH per_user AS (
  SELECT event_type, user_id, count(*) AS n_u
  FROM events GROUP BY event_type, user_id
), ranked AS (
  SELECT event_type, n_u,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY n_u, user_id) AS rk,
         count(*) OVER (PARTITION BY event_type) AS n_users
  FROM per_user
), med AS (
  SELECT event_type, n_u AS median_contrib
  FROM ranked WHERE rk = (n_users + 1) // 2
), agg AS (
  SELECT event_type, count(*) AS n_users, max(n_u) AS max_contrib,
         CAST(sum(CASE WHEN n_u > {clip} THEN n_u - {clip} ELSE 0 END)
              AS BIGINT) AS rows_lost_at_clip,
         CAST(sum(CASE WHEN n_u > {clip} THEN 1 ELSE 0 END) AS BIGINT)
           AS users_clipped
  FROM per_user GROUP BY event_type
)
SELECT a.event_type,
       CAST(n_users AS BIGINT) AS n_users,
       CAST(max_contrib AS BIGINT) AS max_contrib,
       CAST(median_contrib AS BIGINT) AS median_contrib,
       users_clipped, rows_lost_at_clip
FROM agg a JOIN med m ON a.event_type = m.event_type
ORDER BY a.event_type"""


DP_EPSILONS_MILLI = (100, 1000, 10000)


def dp_noise_calibration(
    events: DataFrame, epsilons_milli: tuple[int, ...] = DP_EPSILONS_MILLI
) -> DataFrame:
    """Differential-privacy noise PLANNING table (deterministic — the
    noise itself is random and so never hash-gateable, but the
    calibration that sizes it is pure arithmetic): per event type, the L1
    sensitivity of a per-user count query (max events one user
    contributes — remove that user and the count moves by at most this),
    the Laplace scale b = sensitivity/epsilon at each epsilon, and the
    expected relative L1 error of the noised count in ppm
    (E|Lap(b)| = b, so rel = b / n). The table answers "which epsilon
    makes this release useless" BEFORE any noise is drawn — companion to
    contribution_sensitivity_audit, which measures the same bound without
    pricing it.

    Scale shape: one (event_type, user) map-side-combined count, one
    rollup to |types| rows, then a constant |epsilons| fanout. All
    integer: scales in milli units, errors in ppm."""
    per_user = events.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_type = per_user.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("n_events"),
        F.max("c").cast("long").alias("sensitivity"),
    )
    eps = F.explode(
        F.array(*[F.lit(e).cast("long") for e in epsilons_milli])
    ).alias("eps_milli")
    return (
        per_type.select("event_type", "n_events", "sensitivity", eps)
        .select(
            "event_type",
            "eps_milli",
            "n_events",
            "sensitivity",
            # b = sensitivity / (eps_milli/1000), in milli units:
            # b_milli = sensitivity * 1000 * 1000 div eps_milli
            F.expr(
                "CAST(sensitivity * 1000000 div eps_milli AS BIGINT)"
            ).alias("lap_scale_milli"),
            F.expr(
                "CAST(CASE WHEN n_events > 0 THEN"
                " sensitivity * 1000000000 div eps_milli div n_events"
                " ELSE 0 END AS BIGINT)"
            ).alias("rel_err_ppm"),
        )
        .orderBy("event_type", "eps_milli")
    )


def dp_noise_calibration_oracle_sql(
    epsilons_milli: tuple[int, ...] = DP_EPSILONS_MILLI,
) -> str:
    eps_list = ", ".join(str(e) for e in epsilons_milli)
    return f"""
WITH per_user AS (
  SELECT event_type, user_id, count(*) AS c
  FROM events GROUP BY event_type, user_id
), per_type AS (
  SELECT event_type,
         CAST(sum(c) AS BIGINT) AS n_events,
         CAST(max(c) AS BIGINT) AS sensitivity
  FROM per_user GROUP BY event_type
)
SELECT event_type,
       CAST(e.eps_milli AS BIGINT) AS eps_milli,
       n_events, sensitivity,
       CAST(sensitivity * 1000000 // e.eps_milli AS BIGINT)
         AS lap_scale_milli,
       CAST(CASE WHEN n_events > 0 THEN
            sensitivity * 1000000000 // e.eps_milli // n_events
            ELSE 0 END AS BIGINT) AS rel_err_ppm
FROM per_type, unnest(ARRAY[{eps_list}]) AS e(eps_milli)
ORDER BY event_type, eps_milli"""

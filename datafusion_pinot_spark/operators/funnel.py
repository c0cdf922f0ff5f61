"""Per-entity ordered event analytics: funnels, cohorts, sequences.

Pinot ships funnel aggregations (FUNNEL_COUNT / FUNNEL_COMPLETE_COUNT —
user-ordered step matching) as first-class engine functions; the reference
repo reaches them only through Pinot itself, so this module re-expresses the
semantics Spark-first:

- :func:`funnel_user_depth` — per user, the deepest funnel prefix completed
  in strict timestamp order (a ``view`` before a ``click`` before a
  ``purchase`` counts as depth 3; a ``purchase`` before any ``view`` does
  not count until a later ordered prefix reaches it).
- :func:`funnel_conversion` — the per-step rollup: users reaching each
  step and the step-over-step conversion rate (integer millionths).
- :func:`funnel_complete_count` / :func:`funnel_completion_histogram` —
  disjoint full completions (FUNNEL_COMPLETE_COUNT semantics).
- :func:`cohort_retention` — weekly cohort-retention matrix.
- :func:`user_event_strings` / :func:`event_sequence_matches` —
  MATCH_RECOGNIZE-lite regex matching over per-user event strings.

Scale shape: ONE shuffle keyed on the user column; each user's funnel
events collapse to a single sorted LONG array (timestamp-and-step packed
into one BIGINT), and the ordered-prefix scan is an engine-side
``aggregate`` fold over that array — no Python, no window over the event
table, no per-event shuffle. Per-user state is bounded by that user's
funnel-event count (cap with ``max_events_per_user`` for adversarial
keys). The final rollup is a single tiny row.

The md5-free integer encoding (``epoch_micros * 8 + step``) keeps every
stage bit-identical in DuckDB, so the whole operator sits under the
driver's hash gate (oracle: :func:`funnel_conversion_oracle_sql`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# low bits of the packed event carry the 1-based step number; 3 bits
# supports funnels of up to 7 steps, plenty for product funnels
STEP_BITS = 3
_STEP_MOD = 1 << STEP_BITS


def _step_number(type_col: Column, steps: list[str]) -> Column:
    out = F.when(type_col == steps[0], F.lit(1).cast("long"))
    for i, s in enumerate(steps[1:], start=2):
        out = out.when(type_col == s, F.lit(i).cast("long"))
    return out  # callers filter to the step set, so no otherwise branch


def _per_user_sorted_encs(
    events: DataFrame,
    steps: list[str],
    user_col: str,
    type_col: str,
    ts_col: str,
    max_events_per_user: int | None,
) -> DataFrame:
    """``(user_id, encs)``: each user's qualifying events as one sorted
    array of packed BIGINTs — the shared prep of every fold here (one
    user-keyed shuffle). Precondition: timestamps at or after the epoch
    (negative ``unix_micros`` flips the sign of ``% _STEP_MOD``, which
    would make both this and the DuckDB oracles skip those events — both
    engines agree, so the hash gate cannot flag it; sentinel pre-1970
    dates must be filtered upstream)."""
    if not 0 < len(steps) < _STEP_MOD:
        raise ValueError(f"funnel supports 1..{_STEP_MOD - 1} steps")
    enc = (
        F.unix_micros(F.col(ts_col)) * _STEP_MOD
        + _step_number(F.col(type_col), steps)
    ).alias("enc")
    per_user = (
        events.where(F.col(type_col).isin(list(steps)))
        .select(F.col(user_col).alias("user_id"), enc)
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_list("enc")).alias("encs"))
    )
    if max_events_per_user is not None:
        per_user = per_user.withColumn(
            "encs", F.slice("encs", 1, max_events_per_user)
        )
    return per_user


def funnel_user_depth(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_events_per_user: int | None = None,
) -> DataFrame:
    """``(user_id, depth)``: the longest ordered prefix of ``steps`` this
    user completed, scanning their funnel events in timestamp order.

    Implementation: each qualifying event packs into one BIGINT
    ``epoch_micros * 2^STEP_BITS + step`` so a single ``array_sort`` gives
    the strict (ts, step) order, then an ``aggregate`` fold advances the
    depth whenever the next event is exactly the next step. Ties at the
    same microsecond resolve lower-step-first (the packed low bits), the
    generous reading a funnel wants."""
    per_user = _per_user_sorted_encs(
        events, steps, user_col, type_col, ts_col, max_events_per_user
    )
    depth = F.aggregate(
        F.transform("encs", lambda x: x % _STEP_MOD),
        F.lit(0).cast("long"),
        lambda acc, s: F.when(s == acc + 1, acc + 1).otherwise(acc),
    )
    return per_user.select("user_id", depth.alias("depth"))


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per funnel step: ``step, step_name, n_users, conv_prev_milli`` —
    users whose ordered depth reaches the step, and the step-over-step
    conversion in integer millionths (step 1 is 1_000_000 by definition;
    an empty upstream step converts at 0)."""
    depths = funnel_user_depth(events, steps, user_col, type_col, ts_col)
    counts = depths.agg(
        *[
            F.sum((F.col("depth") >= i + 1).cast("long")).alias(f"c{i + 1}")
            for i in range(len(steps))
        ]
    )
    rows = []
    for i, name in enumerate(steps):
        conv = (
            F.lit(1000000).cast("long")
            if i == 0
            else F.expr(
                f"CASE WHEN c{i} = 0 THEN CAST(0 AS BIGINT) "
                f"ELSE c{i + 1} * 1000000L div c{i} END"
            )
        )
        rows.append(
            F.struct(
                F.lit(i + 1).cast("int").alias("step"),
                F.lit(name).alias("step_name"),
                F.coalesce(F.col(f"c{i + 1}"), F.lit(0).cast("long")).alias(
                    "n_users"
                ),
                conv.alias("conv_prev_milli"),
            )
        )
    return (
        counts.select(F.explode(F.array(*rows)).alias("s"))
        .select("s.*")
        .orderBy("step")
    )


def funnel_complete_count(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_events_per_user: int | None = None,
) -> DataFrame:
    """``(user_id, completions)``: how many DISJOINT complete funnels the
    user ran, scanning events in timestamp order (Pinot's
    FUNNEL_COMPLETE_COUNT semantics): each event may serve one chain; on
    reaching the last step the chain closes and matching restarts at step
    one. Same single user-keyed shuffle + integer fold as
    :func:`funnel_user_depth` — the accumulator packs
    ``completions * 2^STEP_BITS + current_depth`` into one BIGINT."""
    n = len(steps)
    per_user = _per_user_sorted_encs(
        events, steps, user_col, type_col, ts_col, max_events_per_user
    )
    acc = F.aggregate(
        F.transform("encs", lambda x: x % _STEP_MOD),
        F.lit(0).cast("long"),
        lambda acc, s: F.when(
            s == acc % _STEP_MOD + 1,
            # closing the chain banks a completion and resets the depth:
            # acc = comp*M + (n-1)  ->  (comp+1)*M + 0
            F.when(s == n, acc + _STEP_MOD - (n - 1)).otherwise(acc + 1),
        ).otherwise(acc),
    )
    return per_user.select(
        "user_id", F.shiftright(acc, STEP_BITS).alias("completions")
    )


def funnel_completion_histogram(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Distribution of disjoint funnel completions: ``completions,
    n_users`` — the discriminating rollup (per-user counts vary even on
    dense event streams where every user eventually converts once)."""
    per_user = funnel_complete_count(events, steps, user_col, type_col, ts_col)
    return (
        per_user.groupBy("completions")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("completions")
    )


def _recursive_fold_ctes(
    n: int,
    complete: bool,
    out_alias: str,
    keys: tuple = ("user_id",),
    src: str = "enc",
) -> str:
    """CTE fragment computing the per-user fold as a RECURSIVE walk over
    rank-ordered steps — no list aggregation or lambdas anywhere.

    DuckDB v1.0 computes list lambdas (list_reduce / list_transform) and
    even list_resize over MULTIPLE rows with data-dependent lengths
    incorrectly and process-dependently (results permute between groups;
    single rows, single-group filters, and equal-length batches are
    fine — found via the per-user streaming_funnel_totals hash
    mismatch). The recursive-CTE fold walks rank r -> r+1 with plain
    scalar expressions, which is stable; recursion depth = the largest
    per-user event count (fine at oracle scale — the scalable path is
    the Spark side)."""
    if complete:
        adv = (
            f"CASE WHEN r.s = w.acc % {_STEP_MOD} + 1 "
            f"THEN CASE WHEN r.s = {n} "
            f"THEN w.acc + {_STEP_MOD} - {n - 1} "
            f"ELSE w.acc + 1 END ELSE w.acc END"
        )
    else:
        adv = "CASE WHEN r.s = w.acc + 1 THEN w.acc + 1 ELSE w.acc END"
    kc = ", ".join(keys)
    wk = ", ".join(f"w.{k}" for k in keys)
    jr = " AND ".join(f"r.{k} = w.{k}" for k in keys)
    jc = " AND ".join(f"w.{k} = c.{k}" for k in keys)
    return f"""ranked AS (
  SELECT {kc}, e % {_STEP_MOD} AS s,
         row_number() OVER (PARTITION BY {kc} ORDER BY e) AS rn
  FROM {src}
), cnt AS (SELECT {kc}, max(rn) AS n FROM ranked GROUP BY {kc}
), walk AS (
  SELECT {kc}, CAST(0 AS BIGINT) AS rn, CAST(0 AS BIGINT) AS acc
  FROM cnt
  UNION ALL
  SELECT {wk}, w.rn + 1, {adv}
  FROM walk w JOIN ranked r ON {jr} AND r.rn = w.rn + 1
), d AS (
  SELECT {wk}, w.acc AS {out_alias}
  FROM walk w JOIN cnt c ON {jc} AND w.rn = c.n
)"""


def funnel_completion_histogram_oracle_sql(
    steps: list[str], table: str = "events"
) -> str:
    """DuckDB equivalent of :func:`funnel_completion_histogram` — the
    identical packed-integer fold, expressed as a recursive-CTE walk
    (see :func:`_recursive_fold_ctes` for why no list lambdas)."""
    n = len(steps)
    case = " ".join(
        f"WHEN '{s}' THEN CAST({i + 1} AS BIGINT)" for i, s in enumerate(steps)
    )
    in_list = ", ".join(f"'{s}'" for s in steps)
    fold = _recursive_fold_ctes(n, complete=True, out_alias="a")
    return f"""
WITH RECURSIVE enc AS (
  SELECT user_id,
         epoch_us(ts) * {_STEP_MOD} + CASE event_type {case} END AS e
  FROM {table} WHERE event_type IN ({in_list})
), {fold}
SELECT a // {_STEP_MOD} AS completions, CAST(count(*) AS BIGINT) AS n_users
FROM d GROUP BY completions ORDER BY completions"""


def funnel_conversion_oracle_sql(
    steps: list[str], table: str = "events"
) -> str:
    """DuckDB equivalent of :func:`funnel_conversion` — identical integer
    encoding and an identical left fold via ``list_reduce`` (whose first
    lambda argument is the accumulator)."""
    case = " ".join(
        f"WHEN '{s}' THEN CAST({i + 1} AS BIGINT)" for i, s in enumerate(steps)
    )
    in_list = ", ".join(f"'{s}'" for s in steps)
    counts = ", ".join(
        f"CAST(sum(CASE WHEN depth >= {i + 1} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS c{i + 1}"
        for i in range(len(steps))
    )
    arms = []
    for i, name in enumerate(steps):
        conv = (
            "CAST(1000000 AS BIGINT)"
            if i == 0
            else (
                f"CASE WHEN c{i} = 0 THEN CAST(0 AS BIGINT) "
                f"ELSE c{i + 1} * 1000000 // c{i} END"
            )
        )
        arms.append(
            f"SELECT CAST({i + 1} AS INT) AS step, '{name}' AS step_name, "
            f"c{i + 1} AS n_users, {conv} AS conv_prev_milli FROM c"
        )
    union = " UNION ALL ".join(arms)
    fold = _recursive_fold_ctes(len(steps), complete=False, out_alias="depth")
    return f"""
WITH RECURSIVE enc AS (
  SELECT user_id,
         epoch_us(ts) * {_STEP_MOD} + CASE event_type {case} END AS e
  FROM {table} WHERE event_type IN ({in_list})
), {fold}, c AS (SELECT {counts} FROM d)
SELECT * FROM ({union}) ORDER BY step"""


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort-retention matrix: users grouped by first-activity
    week, tracked by activity in each later week.

    Output: ``cohort_week, week_offset, n_cohort, n_active,
    retention_milli`` where ``cohort_week`` is a Monday-aligned integer
    week index (pure epoch-day arithmetic — ``(epoch_day + 3) div 7`` —
    so both engines agree without any date_trunc/timezone semantics in
    play) and ``retention_milli`` is exact integer millionths.

    Scale shape: one shuffle keyed on the user (first-week min +
    per-user-week distinct collapse together), one tiny shuffle on
    (cohort, offset); the per-cohort size table broadcasts. No window
    functions, no Python."""
    # epoch day 0 = Thursday; +3 aligns week boundaries to Monday
    week = F.expr(f"(unix_date(CAST({ts_col} AS DATE)) + 3) div 7")
    uw = events.select(
        F.col(user_col).alias("user_id"), week.alias("w")
    ).distinct()
    first = uw.groupBy("user_id").agg(F.min("w").alias("cohort_week"))
    sizes = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    matrix = (
        uw.join(first, "user_id")
        .groupBy("cohort_week", (F.col("w") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return (
        matrix.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_cohort",
            "n_active",
            F.expr("n_active * 1000000L div n_cohort").alias("retention_milli"),
        )
        .orderBy("cohort_week", "week_offset")
    )


def cohort_retention_oracle_sql(table: str = "events") -> str:
    """DuckDB equivalent of :func:`cohort_retention` (identical integer
    week arithmetic)."""
    return f"""
WITH uw AS (
  SELECT DISTINCT user_id,
         (datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 3) // 7 AS w
  FROM {table}
), first AS (
  SELECT user_id, min(w) AS cohort_week FROM uw GROUP BY user_id
), sizes AS (
  SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_cohort
  FROM first GROUP BY cohort_week
), matrix AS (
  SELECT cohort_week, w - cohort_week AS week_offset,
         CAST(count(*) AS BIGINT) AS n_active
  FROM uw JOIN first USING (user_id)
  GROUP BY cohort_week, w - cohort_week
)
SELECT cohort_week, week_offset, n_cohort, n_active,
       n_active * 1000000 // n_cohort AS retention_milli
FROM matrix JOIN sizes USING (cohort_week)
ORDER BY cohort_week, week_offset"""


def user_event_strings(
    events: DataFrame,
    types: list[str],
    letters: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """``(user_id, seq)``: each user's events in strict timestamp order as
    a compact letter string (``types[i]`` renders as ``letters[i]``) —
    the substrate for regex-based sequence matching. Same packed-BIGINT
    sort trick as the funnel fold; one user-keyed shuffle."""
    if len(types) != len(letters):
        raise ValueError("need matching types/letters, at most 7 kinds")
    per_user = _per_user_sorted_encs(
        events, types, user_col, type_col, ts_col, None
    )
    letter_arr = F.array(*[F.lit(c) for c in letters])
    seq = F.array_join(
        F.transform(
            "encs",
            lambda x: F.element_at(letter_arr, (x % _STEP_MOD).cast("int")),
        ),
        "",
    )
    return per_user.select("user_id", seq.alias("seq"))


def event_sequence_matches(
    events: DataFrame,
    types: list[str],
    letters: list[str],
    patterns: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """MATCH_RECOGNIZE-lite: per regex pattern over the per-user ordered
    event string, how many users match and the total non-overlapping
    match count — ``pattern, n_users, total_matches``. Patterns must use
    the regex subset Java and RE2 share (literals, classes, ``+ * {m,n}``
    quantifiers — no backrefs/lookaround) so the DuckDB oracle is
    bit-identical."""
    seqs = user_event_strings(
        events, types, letters, user_col, type_col, ts_col
    )
    per = seqs.select(
        "user_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(p).alias("pattern"),
                        # F.lit(p), not an f-string into F.expr: SQL
                        # string-literal escaping would mangle \d-style
                        # classes and quotes in the pattern
                        F.regexp_count(F.col("seq"), F.lit(p))
                        .cast("long")
                        .alias("m"),
                    )
                    for p in patterns
                ]
            )
        ).alias("x"),
    ).select("x.pattern", "x.m")
    return (
        per.groupBy("pattern")
        .agg(
            F.sum((F.col("m") > 0).cast("long")).alias("n_users"),
            F.sum("m").alias("total_matches"),
        )
        .orderBy("pattern")
    )


def event_sequence_matches_oracle_sql(
    types: list[str],
    letters: list[str],
    patterns: list[str],
    table: str = "events",
) -> str:
    """DuckDB equivalent of :func:`event_sequence_matches` (identical
    encoding; RE2 ``regexp_extract_all`` length == Java ``regexp_count``
    for the shared non-overlapping leftmost semantics)."""
    case = " ".join(
        f"WHEN '{s}' THEN CAST({i + 1} AS BIGINT)" for i, s in enumerate(types)
    )
    in_list = ", ".join(f"'{s}'" for s in types)
    letter_case = " ".join(
        f"WHEN '{t}' THEN '{c}'" for t, c in zip(types, letters)
    )
    vals = ", ".join(f"('{p}')" for p in patterns)
    return f"""
WITH enc AS (
  SELECT user_id,
         epoch_us(ts) * {_STEP_MOD} + CASE event_type {case} END AS e,
         CASE event_type {letter_case} END AS letter
  FROM {table} WHERE event_type IN ({in_list})
), seqs AS (
  -- ordered string_agg builds the per-user sequence with no list
  -- aggregation or lambdas (see _recursive_fold_ctes on the DuckDB
  -- multi-row list-lambda hazard); ORDER BY e preserves the exact
  -- (ts, step) tie-break of the packed encoding
  SELECT user_id, string_agg(letter, '' ORDER BY e) AS seq
  FROM enc GROUP BY user_id
), m AS (
  SELECT user_id, p.pattern,
         CAST(len(regexp_extract_all(seq, p.pattern)) AS BIGINT) AS m
  FROM seqs, (VALUES {vals}) p(pattern)
)
SELECT pattern,
       CAST(sum(CASE WHEN m > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_users,
       CAST(sum(m) AS BIGINT) AS total_matches
FROM m GROUP BY pattern ORDER BY pattern"""


def funnel_windowed_depth(
    events: DataFrame,
    steps: list[str],
    window_us: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_events_per_user: int | None = None,
) -> DataFrame:
    """``(user_id, depth)`` under a completion WINDOW: a chain only
    advances while the event is within ``window_us`` of the chain's
    FIRST step, and any step-one event restarts the chain (greedy
    restart — the semantics a "did they convert within an hour"
    dashboard wants; a stale step-one hours old never blocks a fresh
    attempt, which is exactly where the unwindowed prefix fold
    saturates or starves). ``depth`` is the BEST depth any chain
    reached.

    Same single user-keyed shuffle + integer fold: the accumulator
    packs ``chain_start_us * 64 + best * 8 + cur`` into one BIGINT
    (start fits: epoch micros * 64 < 2^63)."""
    per_user = _per_user_sorted_encs(
        events, steps, user_col, type_col, ts_col, max_events_per_user
    )
    m = _STEP_MOD

    def trans(acc, e):
        ts_ = F.shiftright(e, STEP_BITS)
        s = e.bitwiseAND(F.lit(m - 1))
        start = F.shiftright(acc, 2 * STEP_BITS)
        best = F.shiftright(acc, STEP_BITS).bitwiseAND(F.lit(m - 1))
        cur = acc.bitwiseAND(F.lit(m - 1))
        adv = (s == cur + 1) & (
            (cur == 0) | (ts_ - start <= F.lit(window_us))
        )
        adv_acc = (
            F.when(cur == 0, ts_).otherwise(start) * (m * m)
            + F.greatest(best, cur + 1) * m
            + (cur + 1)
        )
        rst_acc = ts_ * (m * m) + F.greatest(best, F.lit(1)) * m + 1
        return F.when(adv, adv_acc).otherwise(
            F.when(s == 1, rst_acc).otherwise(acc)
        )

    acc = F.aggregate("encs", F.lit(0).cast("long"), trans)
    depth = F.shiftright(acc, STEP_BITS).bitwiseAND(F.lit(m - 1))
    return per_user.select("user_id", depth.alias("depth"))


def funnel_windowed_conversion(
    events: DataFrame,
    steps: list[str],
    window_us: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Windowed per-step rollup: ``step, step_name, n_users,
    conv_prev_milli`` where a user counts for a step only if some chain
    reached it within ``window_us`` of that chain's start."""
    depths = funnel_windowed_depth(
        events, steps, window_us, user_col, type_col, ts_col
    )
    counts = depths.agg(
        *[
            F.sum((F.col("depth") >= i + 1).cast("long")).alias(f"c{i + 1}")
            for i in range(len(steps))
        ]
    )
    rows = []
    for i, name in enumerate(steps):
        conv = (
            F.lit(1000000).cast("long")
            if i == 0
            else F.expr(
                f"CASE WHEN c{i} = 0 THEN CAST(0 AS BIGINT) "
                f"ELSE c{i + 1} * 1000000L div c{i} END"
            )
        )
        rows.append(
            F.struct(
                F.lit(i + 1).cast("int").alias("step"),
                F.lit(name).alias("step_name"),
                F.coalesce(F.col(f"c{i + 1}"), F.lit(0).cast("long")).alias(
                    "n_users"
                ),
                conv.alias("conv_prev_milli"),
            )
        )
    return (
        counts.select(F.explode(F.array(*rows)).alias("s"))
        .select("s.*")
        .orderBy("step")
    )


def funnel_windowed_conversion_oracle_sql(
    steps: list[str], window_us: int, table: str = "events"
) -> str:
    """DuckDB oracle: the identical windowed fold as a recursive-CTE
    walk (no list lambdas — see :func:`_recursive_fold_ctes`) over
    ``(ts, step)``-ranked events, with the same packed accumulator and
    bit arithmetic."""
    m = _STEP_MOD
    case = " ".join(
        f"WHEN '{s}' THEN CAST({i + 1} AS BIGINT)" for i, s in enumerate(steps)
    )
    in_list = ", ".join(f"'{s}'" for s in steps)
    counts = ", ".join(
        f"CAST(sum(CASE WHEN depth >= {i + 1} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS c{i + 1}"
        for i in range(len(steps))
    )
    arms = []
    for i, name in enumerate(steps):
        conv = (
            "CAST(1000000 AS BIGINT)"
            if i == 0
            else (
                f"CASE WHEN c{i} = 0 THEN CAST(0 AS BIGINT) "
                f"ELSE c{i + 1} * 1000000 // c{i} END"
            )
        )
        arms.append(
            f"SELECT CAST({i + 1} AS INT) AS step, '{name}' AS step_name, "
            f"c{i + 1} AS n_users, {conv} AS conv_prev_milli FROM c"
        )
    union = " UNION ALL ".join(arms)
    adv = (
        f"CASE WHEN r.s = (w.acc & {m - 1}) + 1 "
        f"AND ((w.acc & {m - 1}) = 0 "
        f"OR r.ts - (w.acc >> {2 * STEP_BITS}) <= {window_us}) "
        f"THEN (CASE WHEN (w.acc & {m - 1}) = 0 THEN r.ts "
        f"ELSE (w.acc >> {2 * STEP_BITS}) END) * {m * m} "
        f"+ greatest((w.acc >> {STEP_BITS}) & {m - 1}, "
        f"(w.acc & {m - 1}) + 1) * {m} + (w.acc & {m - 1}) + 1 "
        f"WHEN r.s = 1 THEN r.ts * {m * m} "
        f"+ greatest((w.acc >> {STEP_BITS}) & {m - 1}, 1) * {m} + 1 "
        f"ELSE w.acc END"
    )
    return f"""
WITH RECURSIVE enc AS (
  SELECT user_id,
         epoch_us(ts) * {m} + CASE event_type {case} END AS e
  FROM {table} WHERE event_type IN ({in_list})
), ranked AS (
  SELECT user_id, e >> {STEP_BITS} AS ts, e % {m} AS s,
         row_number() OVER (PARTITION BY user_id ORDER BY e) AS rn
  FROM enc
), cnt AS (SELECT user_id, max(rn) AS n FROM ranked GROUP BY user_id
), walk AS (
  SELECT user_id, CAST(0 AS BIGINT) AS rn, CAST(0 AS BIGINT) AS acc
  FROM cnt
  UNION ALL
  SELECT w.user_id, w.rn + 1, {adv}
  FROM walk w JOIN ranked r ON r.user_id = w.user_id AND r.rn = w.rn + 1
), d AS (
  SELECT (w.acc >> {STEP_BITS}) & {m - 1} AS depth
  FROM walk w JOIN cnt c ON w.user_id = c.user_id AND w.rn = c.n
), c AS (SELECT {counts} FROM d)
SELECT * FROM ({union}) ORDER BY step"""


def funnel_time_to_convert(
    events: DataFrame,
    steps: list[str],
    window_us: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    rank_span_us: int = 300_000_000,
) -> DataFrame:
    """Fastest conversion latency per user under the completion window,
    rolled up to one row of exact order statistics: ``n_funnel_users,
    n_converted, min_lat_us, p50_lat_us, p90_lat_us, max_lat_us``.

    The fold mirrors :func:`funnel_windowed_depth`'s greedy-restart state
    machine but carries a STRUCT accumulator ``(start, cur, lat)`` — on
    each full completion it takes ``min(lat, complete_ts - chain_start)``,
    so ``lat`` is the user's fastest window-compliant conversion.

    Scale shape: the same single user-keyed shuffle + engine-side fold as
    every funnel here; the latency quantiles then use the bucketed
    two-pass global rank (``rank_span_us``-wide latency buckets, prefix
    window over at most ``window_us / rank_span_us + 1`` bucket rows) —
    exact p50/p90 as order statistics with no single-partition sort over
    the users.
    """
    per_user = _per_user_sorted_encs(
        events, steps, user_col, type_col, ts_col, None
    )
    m = _STEP_MOD
    n = len(steps)

    def _acc(start, cur, lat):
        return F.struct(
            start.alias("start"), cur.alias("cur"), lat.alias("lat")
        )

    def trans(acc, e):
        ts_ = F.shiftright(e, STEP_BITS)
        s = e.bitwiseAND(F.lit(m - 1))
        start = acc.getField("start")
        cur = acc.getField("cur")
        lat = acc.getField("lat")
        adv = (s == cur + 1) & (
            (cur == 0) | (ts_ - start <= F.lit(window_us))
        )
        new_start = F.when(cur == 0, ts_).otherwise(start)
        this_lat = ts_ - new_start
        new_lat = F.when(
            adv & (s == n),
            F.when(lat.isNull(), this_lat).otherwise(F.least(lat, this_lat)),
        ).otherwise(lat)
        adv_acc = _acc(new_start, cur + 1, new_lat)
        rst_acc = _acc(ts_, F.lit(1).cast("long"), lat)
        return F.when(adv, adv_acc).otherwise(
            F.when(s == 1, rst_acc).otherwise(acc)
        )

    init = _acc(
        F.lit(0).cast("long"),
        F.lit(0).cast("long"),
        F.lit(None).cast("long"),
    )
    folded = per_user.select(
        "user_id", F.aggregate("encs", init, trans).getField("lat").alias("lat_us")
    )

    from datafusion_pinot_spark.operators.ranking import global_rank

    totals = folded.agg(F.count(F.lit(1)).cast("long").alias("n_funnel_users"))
    lats = folded.filter(F.col("lat_us").isNotNull())
    ranked = global_rank(
        lats,
        F.expr(f"lat_us div {rank_span_us}"),
        ["lat_us", "user_id"],
        rank_col="rn",
        total_col="n_conv",
    )
    from datafusion_pinot_spark.operators.ranking import percentile_rank

    k50 = percentile_rank("n_conv", 50)
    k90 = percentile_rank("n_conv", 90)
    stats = ranked.agg(
        F.max("n_conv").cast("long").alias("n_converted"),
        F.min("lat_us").alias("min_lat_us"),
        F.min(F.when(F.col("rn") == k50, F.col("lat_us"))).alias("p50_lat_us"),
        F.min(F.when(F.col("rn") == k90, F.col("lat_us"))).alias("p90_lat_us"),
        F.max("lat_us").alias("max_lat_us"),
    )
    return totals.crossJoin(F.broadcast(stats)).select(
        "n_funnel_users",
        F.coalesce(F.col("n_converted"), F.lit(0).cast("long")).alias(
            "n_converted"
        ),
        "min_lat_us",
        "p50_lat_us",
        "p90_lat_us",
        "max_lat_us",
    )


def funnel_time_to_convert_oracle_sql(
    steps: list[str], window_us: int, table: str = "events"
) -> str:
    """DuckDB oracle: the identical (start, cur, lat) state machine as a
    recursive-CTE walk with three accumulator COLUMNS (no packing — the
    walk can carry columns; no list lambdas, per the v1.0 hazard), then
    plain global order statistics (oracle scale permits the single
    sort)."""
    m = _STEP_MOD
    n = len(steps)
    case = " ".join(
        f"WHEN '{s}' THEN CAST({i + 1} AS BIGINT)" for i, s in enumerate(steps)
    )
    in_list = ", ".join(f"'{s}'" for s in steps)
    adv = (
        f"(r.s = w.cur + 1 AND (w.cur = 0 OR r.ts - w.start <= {window_us}))"
    )
    new_start = f"CASE WHEN w.cur = 0 THEN r.ts ELSE w.start END"
    return f"""
WITH RECURSIVE enc AS (
  SELECT user_id,
         epoch_us(ts) * {m} + (CASE event_type {case} END) AS e
  FROM {table} WHERE event_type IN ({in_list})
), ranked AS (
  SELECT user_id, e // {m} AS ts, e % {m} AS s,
         row_number() OVER (PARTITION BY user_id ORDER BY e) AS rn
  FROM enc
), cnt AS (SELECT user_id, max(rn) AS nmax FROM ranked GROUP BY user_id
), walk AS (
  SELECT user_id, CAST(0 AS BIGINT) AS rn, CAST(0 AS BIGINT) AS start,
         CAST(0 AS BIGINT) AS cur, CAST(NULL AS BIGINT) AS lat
  FROM cnt
  UNION ALL
  SELECT w.user_id, w.rn + 1,
         CASE WHEN {adv} THEN {new_start}
              WHEN r.s = 1 THEN r.ts ELSE w.start END,
         CASE WHEN {adv} THEN w.cur + 1
              WHEN r.s = 1 THEN CAST(1 AS BIGINT) ELSE w.cur END,
         CASE WHEN {adv} AND r.s = {n}
              THEN least(coalesce(w.lat, CAST(4611686018427387904 AS BIGINT)),
                         r.ts - ({new_start}))
              ELSE w.lat END
  FROM walk w JOIN ranked r ON r.user_id = w.user_id AND r.rn = w.rn + 1
), d AS (
  SELECT w.user_id, w.lat AS lat_us
  FROM walk w JOIN cnt c ON w.user_id = c.user_id AND w.rn = c.nmax
), conv AS (
  SELECT lat_us, user_id,
         row_number() OVER (ORDER BY lat_us, user_id) AS rn,
         count(*) OVER () AS n_conv
  FROM d WHERE lat_us IS NOT NULL
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_funnel_users,
       coalesce(CAST(max(n_conv) AS BIGINT), 0) AS n_converted,
       min(lat_us) AS min_lat_us,
       min(CASE WHEN rn = (n_conv - 1) * 50 // 100 + 1 THEN lat_us END)
         AS p50_lat_us,
       min(CASE WHEN rn = (n_conv - 1) * 90 // 100 + 1 THEN lat_us END)
         AS p90_lat_us,
       max(lat_us) AS max_lat_us
FROM conv"""


def conversion_attribution(
    events: DataFrame, convert_type: str = "purchase"
) -> DataFrame:
    """First-touch vs last-touch conversion attribution — the marketing
    analytics staple over an event stream: every ``convert_type`` event
    credits the channel (event_type) of the user's EARLIEST prior
    non-conversion touch (first-touch model) and of the LATEST one
    (last-touch model). Reports both models side by side per channel:
    attributed conversion counts and attributed revenue in integer cents
    (``floor(value * 100 + 0.5)`` applied PER EVENT, so the sums are
    order-independent integers and the hash gate holds; the one double
    multiply-and-floor is the same single-IEEE-op contract the cosine
    operators use). Conversions with no prior touch are unattributable
    and drop out (documented, matches the oracle).

    Scale shape: one window pass per model over (user, ts)-sorted events
    — a running first/last IGNORE NULLS carry, no self-join, no explode —
    then one map-side-combined rollup keyed by the attributed channel.
    State per user is O(1); ties break on event_id so any engine sorts
    identically."""
    from pyspark.sql import Window

    is_touch = F.col("event_type") != convert_type
    touch_type = F.when(is_touch, F.col("event_type"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = events.select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        F.first(touch_type, ignorenulls=True).over(w).alias("first_ch"),
        F.last(touch_type, ignorenulls=True).over(w).alias("last_ch"),
    )
    conv = carried.filter(
        (F.col("event_type") == convert_type) & F.col("first_ch").isNotNull()
    )
    # melt each conversion into its two (model, channel) credits, then ONE
    # conditional rollup keyed on channel — a single scan + window pass +
    # shuffle, no per-model branch recomputation and no join (the naive
    # two-groupBy + full-outer shape scans and windows the corpus twice)
    melted = conv.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("first").alias("model"),
                    F.col("first_ch").alias("channel"),
                    F.col("cents"),
                ),
                F.struct(
                    F.lit("last").alias("model"),
                    F.col("last_ch").alias("channel"),
                    F.col("cents"),
                ),
            )
        ).alias("m")
    ).select("m.*")
    is_first = (F.col("model") == "first").cast("long")
    is_last = (F.col("model") == "last").cast("long")
    return (
        melted.groupBy("channel")
        .agg(
            F.sum(is_first).cast("long").alias("n_first"),
            F.sum(is_first * F.col("cents")).cast("long").alias("cents_first"),
            F.sum(is_last).cast("long").alias("n_last"),
            F.sum(is_last * F.col("cents")).cast("long").alias("cents_last"),
        )
        .orderBy("channel")
    )


def conversion_attribution_oracle_sql(convert_type: str = "purchase") -> str:
    return f"""
WITH carried AS (
  SELECT event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         first_value(CASE WHEN event_type <> '{convert_type}'
                          THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS first_ch,
         last_value(CASE WHEN event_type <> '{convert_type}'
                         THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS last_ch
  FROM events),
conv AS (
  SELECT * FROM carried
  WHERE event_type = '{convert_type}' AND first_ch IS NOT NULL),
f AS (
  SELECT first_ch AS channel, CAST(count(*) AS BIGINT) AS n_first,
         CAST(sum(cents) AS BIGINT) AS cents_first
  FROM conv GROUP BY first_ch),
l AS (
  SELECT last_ch AS channel, CAST(count(*) AS BIGINT) AS n_last,
         CAST(sum(cents) AS BIGINT) AS cents_last
  FROM conv GROUP BY last_ch)
SELECT coalesce(f.channel, l.channel) AS channel,
       coalesce(n_first, 0) AS n_first,
       coalesce(cents_first, 0) AS cents_first,
       coalesce(n_last, 0) AS n_last,
       coalesce(cents_last, 0) AS cents_last
FROM f FULL OUTER JOIN l ON f.channel = l.channel
ORDER BY channel"""


def event_transition_matrix(events: DataFrame) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences
    — the behavioral-model complement to the full-path strings of
    ``top_event_paths``: for every (event_type -> next event_type) edge,
    the transition count and its exact-ppm share of the FROM type's
    outgoing edges (each matrix row sums to ~1e6). The edge a product
    analyst reads off it: "after a view, 22% of next actions are
    purchases".

    Scale shape: one ``lead`` window over (user, ts, event_id)-sorted
    events (O(1) state per user, unique tie-break so every engine sorts
    identically) + one map-side-combined rollup on the edge pair; the
    row-sum denominator is a window over the |types|^2-row aggregate,
    not a second scan."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("event_type").over(w)
    edges = (
        events.select("event_type", nxt.alias("next_type"))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_trans"))
    )
    row_total = F.sum("n_trans").over(Window.partitionBy("event_type"))
    return (
        edges.withColumn("row_total", row_total.cast("long"))
        .withColumn(
            "row_ppm", F.expr("n_trans * 1000000L div row_total").cast("long")
        )
        .drop("row_total")
        .orderBy("event_type", "next_type")
    )


def event_transition_matrix_oracle_sql() -> str:
    return """
WITH seq AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events),
edges AS (
  SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n_trans
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type)
SELECT event_type, next_type, n_trans,
       CAST(n_trans * 1000000 //
            sum(n_trans) OVER (PARTITION BY event_type) AS BIGINT) AS row_ppm
FROM edges ORDER BY event_type, next_type"""


def seq_pair_support(events: DataFrame) -> DataFrame:
    """Sequential 2-patterns (the GSP/PrefixSpan level-1 step, one level
    past the ADJACENT-pair ``event_transition_matrix``): for every ordered
    event-type pair (a, b), how many users did a STRICTLY before b —
    first-occurrence ordering, any gap, any events in between. Transition
    matrices see only consecutive steps; sequence mining asks "does
    signup EVENTUALLY precede purchase", which is the funnel question at
    its most general. Users whose first a and first b carry the SAME
    timestamp count for neither direction (strict <, engine-identical).
    Emits support (user count) and support_ppm over the users having
    both types, per ordered pair.

    Scale shape (100 TB): one map-side-combined groupBy collapses the
    corpus to (user, type, first_ts) — |users| x |types| rows max; the
    pair join is a self-equi-join ON USER with |types|² bounded fanout;
    the rollup output is |types|² rows. The corpus is never self-joined
    at event grain."""
    firsts = events.groupBy("user_id", "event_type").agg(
        F.min(F.unix_micros("ts")).alias("t0")
    )
    a, b = firsts.alias("a"), firsts.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") != F.col("b.event_type")),
        )
        .select(
            F.col("a.event_type").alias("a"),
            F.col("b.event_type").alias("b"),
            (F.col("a.t0") < F.col("b.t0")).cast("long").alias("before"),
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


def seq_pair_support_oracle_sql() -> str:
    return """
WITH firsts AS (
  SELECT user_id, event_type, min(epoch_us(ts)) AS t0
  FROM events GROUP BY user_id, event_type
), pairs AS (
  SELECT a.event_type AS a, b.event_type AS b,
         CAST(a.t0 < b.t0 AS BIGINT) AS before
  FROM firsts a JOIN firsts b
    ON a.user_id = b.user_id AND a.event_type <> b.event_type
)
SELECT a, b,
       CAST(sum(before) AS BIGINT) AS support,
       CAST(count(*) AS BIGINT) AS n_both,
       CAST(CASE WHEN count(*) > 0
            THEN sum(before) * 1000000 // count(*) ELSE 0 END AS BIGINT)
         AS support_ppm
FROM pairs GROUP BY a, b ORDER BY a, b"""


SESSION_THRESHOLDS_MIN = (5, 15, 30, 60)


def session_threshold_sensitivity(
    events: DataFrame, thresholds_min: tuple[int, ...] = SESSION_THRESHOLDS_MIN
) -> DataFrame:
    """Session-definition tuning curve: session/bounce counts under each
    inactivity-gap threshold — the sensitivity table read BEFORE fixing
    the 30-minute constant every sessionized metric then inherits. A
    metric that swings hard between 15 and 30 minutes is a gap-definition
    artifact, not a product change.

    Sessions are counted WITHOUT materializing session ids: an event
    STARTS a session iff its backward gap exceeds the threshold (or it is
    the user's first), and a start is a BOUNCE session iff the forward
    gap also exceeds it (or it is the last) — so one lag/lead pass serves
    every threshold and the per-threshold work is pure conditional
    aggregation. All gaps are exact epoch-micro integers.

    Scale shape (100 TB): ONE shuffle (the per-user ordered window,
    shared across all thresholds), then a single map-side-combined global
    rollup; |thresholds| output rows via an unpivot of one aggregate row.
    No joins, no session-id explosion."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.unix_micros("ts")
    gaps = events.select(
        (t - F.lag(t).over(w)).alias("gap_prev"),
        (F.lead(t).over(w) - t).alias("gap_next"),
    )
    aggs = []
    for m in thresholds_min:
        us = m * 60_000_000
        start = F.col("gap_prev").isNull() | (F.col("gap_prev") > us)
        bounce = start & (
            F.col("gap_next").isNull() | (F.col("gap_next") > us)
        )
        # coalesce: sum over ZERO rows is NULL, and an empty stream must
        # report 0 sessions, not NULL
        aggs.append(
            F.coalesce(F.sum(start.cast("long")), F.lit(0)).alias(f"s{m}")
        )
        aggs.append(
            F.coalesce(F.sum(bounce.cast("long")), F.lit(0)).alias(f"b{m}")
        )
    one = gaps.agg(F.count(F.lit(1)).alias("n_events"), *aggs)
    stack = ", ".join(
        f"{m}, s{m}, b{m}" for m in thresholds_min
    )
    return (
        one.select(
            "n_events",
            F.expr(
                f"stack({len(thresholds_min)}, {stack})"
                " AS (threshold_min, n_sessions, n_bounce)"
            ),
        )
        .select(
            F.col("threshold_min").cast("long").alias("threshold_min"),
            F.col("n_sessions").cast("long").alias("n_sessions"),
            F.col("n_bounce").cast("long").alias("n_bounce"),
            F.expr(
                "CAST(CASE WHEN n_sessions > 0"
                " THEN n_bounce * 1000000 div n_sessions"
                " ELSE 0 END AS BIGINT)"
            ).alias("bounce_ppm"),
            F.expr(
                "CAST(CASE WHEN n_sessions > 0"
                " THEN n_events * 1000 div n_sessions"
                " ELSE 0 END AS BIGINT)"
            ).alias("events_per_session_milli"),
        )
        .orderBy("threshold_min")
    )


def session_threshold_sensitivity_oracle_sql(
    thresholds_min: tuple[int, ...] = SESSION_THRESHOLDS_MIN,
) -> str:
    arms = "\nUNION ALL\n".join(
        f"""SELECT CAST({m} AS BIGINT) AS threshold_min,
       CAST(coalesce(sum(CASE WHEN gap_prev IS NULL
                               OR gap_prev > {m * 60_000_000}
                     THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_sessions,
       CAST(coalesce(sum(CASE WHEN (gap_prev IS NULL
                                    OR gap_prev > {m * 60_000_000})
                      AND (gap_next IS NULL OR gap_next > {m * 60_000_000})
                     THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_bounce,
       CAST(count(*) AS BIGINT) AS n_events
FROM gaps"""
        for m in thresholds_min
    )
    return f"""
WITH gaps AS (
  SELECT epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_prev,
         lead(epoch_us(ts)) OVER w - epoch_us(ts) AS gap_next
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), per AS (
{arms}
)
SELECT threshold_min, n_sessions, n_bounce,
       CAST(CASE WHEN n_sessions > 0
            THEN n_bounce * 1000000 // n_sessions ELSE 0 END AS BIGINT)
         AS bounce_ppm,
       CAST(CASE WHEN n_sessions > 0
            THEN n_events * 1000 // n_sessions ELSE 0 END AS BIGINT)
         AS events_per_session_milli
FROM per ORDER BY threshold_min"""


def audience_overlap_matrix(events: DataFrame) -> DataFrame:
    """Audience overlap: for every event-type pair, the exact Jaccard of
    their USER sets in ppm — the segmentation question ("are purchasers a
    subset of viewers? do error-hitters overlap signups?") asked of the
    raw event stream. Complements seq_pair_support (which orders the
    overlap in time) with the pure set view. One row per unordered pair
    (a < b lexicographically).

    Scale shape (100 TB): one distinct (type, user) rollup — |types| x
    |users| max — then a self-equi-join ON USER with |types|² bounded
    fanout and a map-side-combined count per pair; set sizes ride the
    same rollup. The event stream is never self-joined."""
    tu = events.select("event_type", "user_id").distinct()
    sizes = tu.groupBy("event_type").agg(F.count(F.lit(1)).alias("sz"))
    a, b = tu.alias("a"), tu.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("ta"),
            F.col("b.event_type").alias("tb"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("event_type").alias("ta"), F.col("sz").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("tb"), F.col("sz").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "ta")
        .join(F.broadcast(sb), "tb")
        .select(
            "ta",
            "tb",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.col("n_inter").cast("long").alias("n_inter"),
            F.expr(
                "CAST(n_inter * 1000000 div (n_a + n_b - n_inter)"
                " AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
        .orderBy("ta", "tb")
    )


def audience_overlap_matrix_oracle_sql() -> str:
    return """
WITH tu AS (
  SELECT DISTINCT event_type, user_id FROM events
), sizes AS (
  SELECT event_type, count(*) AS sz FROM tu GROUP BY event_type
), inter AS (
  SELECT a.event_type AS ta, b.event_type AS tb, count(*) AS n_inter
  FROM tu a JOIN tu b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT ta, tb,
       CAST(sa.sz AS BIGINT) AS n_a,
       CAST(sb.sz AS BIGINT) AS n_b,
       CAST(n_inter AS BIGINT) AS n_inter,
       CAST(n_inter * 1000000 // (sa.sz + sb.sz - n_inter) AS BIGINT)
         AS jaccard_ppm
FROM inter
JOIN sizes sa ON inter.ta = sa.event_type
JOIN sizes sb ON inter.tb = sb.event_type
ORDER BY ta, tb"""


def markov_next_event_accuracy(events: DataFrame) -> DataFrame:
    """In-sample top-1 accuracy of the first-order Markov next-event
    predictor — the audit that tells a behavioral modeler whether the
    ``event_transition_matrix`` is worth deploying: per FROM type, the
    argmax next type (count desc, name asc tie-break), how often that
    guess is right (exact ppm), and the marginal baseline (always guess
    the globally most common next type) it must beat.

    Scale shape (100 TB): the same single ``lead`` window over
    (user, ts, event_id) as the transition matrix — O(1) state per user,
    unique tie-break — then everything runs on the |types|^2-row edge
    aggregate: the argmax windows partition by FROM type over |types|
    rows, and the predictor joins back as a broadcast. The corpus is
    scanned once."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        events.select(
            "event_type", F.lead("event_type").over(w).alias("next_type")
        )
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w_pred = Window.partitionBy("event_type").orderBy(
        F.desc("n"), F.asc("next_type")
    )
    pred = (
        edges.withColumn("rk", F.row_number().over(w_pred))
        .filter(F.col("rk") == 1)
        .select("event_type", F.col("next_type").alias("pred_next"))
    )
    marg = (
        edges.groupBy("next_type")
        .agg(F.sum("n").alias("m"))
        .orderBy(F.desc("m"), F.asc("next_type"))
        .limit(1)
        .select(F.col("next_type").alias("base_next"))
    )
    return (
        edges.join(F.broadcast(pred), "event_type")
        .crossJoin(F.broadcast(marg))
        .groupBy("event_type", "pred_next")
        .agg(
            F.sum("n").cast("long").alias("n_pairs"),
            F.sum(F.when(F.col("next_type") == F.col("pred_next"), F.col("n")).otherwise(0))
            .cast("long")
            .alias("n_correct"),
            F.sum(F.when(F.col("next_type") == F.col("base_next"), F.col("n")).otherwise(0))
            .cast("long")
            .alias("n_base"),
        )
        .select(
            "event_type",
            "pred_next",
            "n_pairs",
            "n_correct",
            F.expr("n_correct * 1000000L div n_pairs").alias("acc_ppm"),
            F.expr("n_base * 1000000L div n_pairs").alias("base_ppm"),
        )
        .orderBy("event_type")
    )


def markov_next_event_accuracy_oracle_sql() -> str:
    return """
WITH seq AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events),
edges AS (
  SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type),
pred AS (
  SELECT event_type, next_type AS pred_next FROM (
    SELECT event_type, next_type,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY n DESC, next_type ASC) AS rk
    FROM edges) WHERE rk = 1),
marg AS (
  SELECT next_type AS base_next FROM (
    SELECT next_type, sum(n) AS m FROM edges GROUP BY next_type
    ORDER BY m DESC, next_type ASC LIMIT 1))
SELECT e.event_type, p.pred_next,
       CAST(sum(n) AS BIGINT) AS n_pairs,
       CAST(sum(CASE WHEN e.next_type = p.pred_next THEN n ELSE 0 END)
            AS BIGINT) AS n_correct,
       CAST(sum(CASE WHEN e.next_type = p.pred_next THEN n ELSE 0 END)
            * 1000000
            // sum(n) AS BIGINT) AS acc_ppm,
       CAST(sum(CASE WHEN e.next_type = m.base_next THEN n ELSE 0 END)
            * 1000000
            // sum(n) AS BIGINT) AS base_ppm
FROM edges e JOIN pred p USING (event_type) CROSS JOIN marg m
GROUP BY e.event_type, p.pred_next
ORDER BY e.event_type"""

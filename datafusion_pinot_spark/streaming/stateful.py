"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no streaming at all (SURVEY.md §2.9); this is the
beyond-parity "custom stateful operator" capability: per-key state carried
across micro-batches in Arrow-batched Python, the escape hatch for logic
windowed aggregation can't express (counters with custom merge, per-entity
ML feature state, cross-batch session objects).

The demo operator keeps per-user running totals using exact integer
arithmetic (count + sum of event ids), so a bounded file-source run is
hash-checkable against plain GROUP BY SQL — state correctness, not just
shape, is oracle-verified.

Scale: state lives in the state store partitioned by key (RocksDB-backed on
a real cluster); each micro-batch shuffles only that batch's rows to their
key partitions. State size here is O(distinct users) × 16 bytes.
"""

from __future__ import annotations

import uuid
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from datafusion_pinot_spark.streaming.windowed import _file_stream, _with_ts

OUTPUT_SCHEMA = "user_id long, n_events long, sum_event_id long"
STATE_SCHEMA = "n long, s long"


def _update_totals(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, s = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        s += int(pdf["event_id"].sum()) if len(pdf) else 0
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "sum_event_id": [s]}
    )


def stateful_user_totals(
    spark: SparkSession, events_parquet: str
) -> DataFrame:
    """Run the stateful counter over the events file stream, drained
    synchronously; returns the final per-user totals."""
    stream = _with_ts(_file_stream(spark, events_parquet))
    updated = stream.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"stateful_{uuid.uuid4().hex[:8]}"
    q = (
        updated.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # Update-mode memory sink appends each batch's updated rows; the final
    # value per user is the row with the highest running count.
    from pyspark.sql import Window, functions as F

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        spark.table(name)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


FUNNEL_OUTPUT_SCHEMA = "user_id long, completions long, depth long"
FUNNEL_STATE_SCHEMA = "acc long"
_FUNNEL_STEPS = {"view": 1, "click": 2, "purchase": 3}
_M = 8  # 2^STEP_BITS, matching operators/funnel.py's packing


def _update_funnel(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Incremental FUNNEL_COMPLETE_COUNT: per-user accumulator
    ``completions * 8 + current_depth`` (operators/funnel.py's integer
    fold) advanced by each micro-batch's events in (ts, step) order.
    Cross-batch correctness relies on in-order delivery between batches
    (the same contract real-time funnel engines assume; a
    watermark-buffered variant would trade latency for reordering
    tolerance). Within a batch, events sort exactly like the batch
    fold."""
    (user_id,) = key
    acc = state.get[0] if state.exists else 0
    frames = [pdf for pdf in pdfs if len(pdf)]
    if frames:
        df = pd.concat(frames)
        df = df[df["event_type"].isin(_FUNNEL_STEPS)]
        if len(df):
            # explicit ns view first: pandas may deliver datetime64 at
            # any unit, and the tie-break vs the batch fold must be at
            # exactly microsecond resolution
            micros = (
                df["ts"].values.astype("datetime64[ns]").astype("int64")
                // 1000
            )
            enc = micros * _M + df["event_type"].map(_FUNNEL_STEPS).values
            for e in sorted(enc.tolist()):
                s = e % _M
                if s == acc % _M + 1:
                    acc = acc + _M - 2 if s == 3 else acc + 1
    state.update((acc,))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "completions": [acc // _M],
            "depth": [acc % _M],
        }
    )


def streaming_funnel_totals(
    spark: SparkSession, events_parquet: str
) -> DataFrame:
    """Run the stateful funnel over the events file stream to completion;
    returns the final per-user (completions, depth) — equal to the batch
    fold when batches arrive in time order, which makes the bounded run
    DuckDB-hash-checkable."""
    stream = _with_ts(_file_stream(spark, events_parquet))
    # filter BEFORE the key grouping: a user with only non-funnel events
    # must not create a state row (the batch fold and the DuckDB oracle
    # both drop such users entirely — emitting (u, 0, 0) for them would
    # be a row-set mismatch waiting for the first dataset where it
    # happens; current testdata just happens to give every user a
    # funnel event)
    from pyspark.sql import functions as F

    stream = stream.where(F.col("event_type").isin(list(_FUNNEL_STEPS)))
    updated = stream.groupBy("user_id").applyInPandasWithState(
        _update_funnel,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"sfunnel_{uuid.uuid4().hex[:8]}"
    q = (
        updated.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # final state per user = the row with the largest packed accumulator
    from pyspark.sql import Window, functions as F

    w = Window.partitionBy("user_id").orderBy(
        F.desc(F.col("completions") * _M + F.col("depth"))
    )
    return (
        spark.table(name)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .orderBy("user_id")
    )


ASOF_OUTPUT_SCHEMA = (
    "user_id long, n_purchases long, n_matched long, n_unmatched long,"
    " matched_gap_s_sum long"
)
ASOF_STATE_SCHEMA = "vts long, vid long, np long, nm long, gs long"
ASOF_TOLERANCE_S = 100_000  # ~28h: brackets the corpus's median view->purchase gap


def _update_asof(tolerance_s: int):
    def update(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Streaming attribution state: the latest view's (ts_us, max id)
        plus purchase/matched counters, advanced by each micro-batch's
        events in (ts, view-before-purchase, id) order — the exact batch
        order asof_join_tolerance's union-and-window sweep uses (a view
        at the purchase timestamp matches, >= semantics). Cross-batch
        correctness relies on in-order batch delivery, the same contract
        as the streaming funnel above. Gap seconds floor the two epochs
        INDEPENDENTLY (``us_l//1e6 - us_r//1e6``) because the batch twin
        diffs unix_timestamp() values, not raw micros."""
        (user_id,) = key
        vts, vid, np_, nm, gs = (
            state.get if state.exists else (None, None, 0, 0, 0)
        )
        frames = [pdf for pdf in pdfs if len(pdf)]
        if frames:
            df = pd.concat(frames)
            df = df[df["event_type"].isin(("view", "purchase"))]
            if len(df):
                micros = (
                    df["ts"].values.astype("datetime64[ns]").astype("int64")
                    // 1000
                )
                rank = (df["event_type"] == "purchase").astype(int).values
                ids = df["event_id"].values
                order = sorted(
                    zip(micros.tolist(), rank.tolist(), ids.tolist())
                )
                for us, r, eid in order:
                    if r == 0:  # view
                        if vts is None or us > vts:
                            vts, vid = us, eid
                        elif us == vts and eid > vid:
                            vid = eid
                    else:  # purchase
                        np_ += 1
                        if vts is not None:
                            gap_s = us // 1_000_000 - vts // 1_000_000
                            if gap_s <= tolerance_s:
                                nm += 1
                                gs += gap_s
        state.update((vts, vid, np_, nm, gs))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_purchases": [np_],
                "n_matched": [nm],
                "n_unmatched": [np_ - nm],
                "matched_gap_s_sum": [gs],
            }
        )

    return update


def stream_asof_attribution(
    spark: SparkSession,
    events_parquet: str,
    tolerance_s: int = ASOF_TOLERANCE_S,
) -> DataFrame:
    """STREAMING twin of temporal.asof_join_tolerance, rolled up per user:
    purchases attributed to the latest prior view within ``tolerance_s``,
    computed incrementally with O(1) state per user — (last view ts, max
    id at that ts, three counters) — instead of the batch union-and-window
    sweep. Bounded file-source run drained to completion equals the batch
    aggregate, so the streaming state machine itself is DuckDB-hash-gated
    (the streaming_funnel_totals pattern).

    Scale: per-batch shuffle is only that batch's rows to their user
    partitions; state is 5 longs per user in the state store. The batch
    twin re-sweeps the timeline per run — this is the always-on version."""
    stream = _with_ts(_file_stream(spark, events_parquet))
    from pyspark.sql import functions as F

    stream = stream.where(F.col("event_type").isin(["view", "purchase"]))
    updated = stream.groupBy("user_id").applyInPandasWithState(
        _update_asof(tolerance_s),
        outputStructType=ASOF_OUTPUT_SCHEMA,
        stateStructType=ASOF_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"sasof_{uuid.uuid4().hex[:8]}"
    q = (
        updated.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # final state per user: n_purchases is monotone across batches, and
    # every output column changes only when a purchase lands, so rows
    # tied on n_purchases are identical — any first-row pick is exact
    from pyspark.sql import Window, functions as F

    w = Window.partitionBy("user_id").orderBy(F.desc("n_purchases"))
    return (
        spark.table(name)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        # view-only users carry state but are not attribution rows (the
        # batch oracle aggregates purchases; emitting (u, 0, ...) would
        # be a row-set mismatch)
        .filter(F.col("n_purchases") > 0)
        .orderBy("user_id")
    )


def stream_asof_attribution_oracle_sql(
    tolerance_s: int = ASOF_TOLERANCE_S,
) -> str:
    return f"""
WITH v AS (
  SELECT DISTINCT user_id, ts FROM events WHERE event_type = 'view'
), p AS (
  SELECT user_id, ts FROM events WHERE event_type = 'purchase'
), j AS (
  SELECT p.user_id, p.ts,
         (SELECT max(v.ts) FROM v
          WHERE v.user_id = p.user_id AND v.ts <= p.ts) AS vts
  FROM p
), g AS (
  SELECT user_id, vts,
         CAST(epoch_us(ts) // 1000000 - epoch_us(vts) // 1000000
              AS BIGINT) AS gap_s
  FROM j
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(CASE WHEN vts IS NOT NULL AND gap_s <= {tolerance_s}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
       CAST(sum(CASE WHEN vts IS NULL OR gap_s > {tolerance_s}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched,
       CAST(sum(CASE WHEN vts IS NOT NULL AND gap_s <= {tolerance_s}
                     THEN gap_s ELSE 0 END) AS BIGINT)
         AS matched_gap_s_sum
FROM g GROUP BY user_id ORDER BY user_id"""

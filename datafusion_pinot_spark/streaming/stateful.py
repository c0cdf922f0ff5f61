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

"""CDC streaming source: ``spark.readStream.format("pinot")
.option("cdc", "true")`` — snapshot-log ids as offsets, insert/delete
row tags. The motivating contract: the plain segment-arrival stream
double-counts rewritten segments (they re-appear as fresh inserts with
no compensating deletes); the CDC feed emits exact delete+insert pairs,
so a downstream additive materialization stays consistent through
appends, predicate deletes, AND compaction."""

import os

import pytest
from pyspark.sql import functions as F

from pinot_segment import snapshot as S


@pytest.fixture()
def table(spark, tmp_path):
    from datafusion_pinot_spark.sources import register_pinot_source

    register_pinot_source(spark)
    out = str(tmp_path / "cdcs_OFFLINE")
    (
        spark.range(0, 100)
        .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
        .repartitionByRange(4, "k")
        .sortWithinPartitions("k")
        .write.format("pinot")
        .mode("overwrite")
        .save(out)
    )
    return out


def _start(spark, table, name, **opts):
    r = spark.readStream.format("pinot").option("cdc", "true")
    for k, v in opts.items():
        r = r.option(k, str(v))
    stream = r.load(table)
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    return q


def _sign():
    return F.when(F.col("_change_type") == "insert", 1).otherwise(-1)


def test_changed_segments_from_virtual_zero(table):
    diff = S.changed_segments(table, 0, 1)
    assert diff["removed"] == []
    assert sorted(diff["added"]) == sorted(S._log_entry(table, 1)["segments"])


def test_cdc_schema_has_change_type(spark, table):
    stream = spark.readStream.format("pinot").option("cdc", "true").load(table)
    assert stream.isStreaming
    f = stream.schema.fields[-1]
    assert f.name == "_change_type" and f.dataType.simpleString() == "string"
    assert not f.nullable


def test_batch_read_with_cdc_refuses(spark, table):
    with pytest.raises(Exception, match="streaming-only|changes_between"):
        spark.read.format("pinot").option("cdc", "true").load(table).count()


def test_bad_initial_snapshot_refuses(spark, table):
    # direct unit check: Spark's streaming runner masks worker-side
    # exceptions behind a generic PYTHON_DATA_SOURCE_ERROR, so the
    # validation is asserted at the Python layer
    from datafusion_pinot_spark.sources.pinot_datasource import (
        PinotDataSource,
    )

    ds = PinotDataSource(
        options={"path": table, "cdc": "true", "initial_snapshot": "middle"}
    )
    with pytest.raises(ValueError, match="initial_snapshot"):
        ds.streamReader(ds.schema())


def test_bootstrap_then_delete_then_append(spark, table):
    """earliest start: batch 0 = whole table as inserts; a retained range
    delete emits cancelling pairs; an append emits plain inserts — the
    folded feed tracks the live table exactly at every step."""
    from datafusion_pinot_spark.maintenance import delete_rows

    q = _start(spark, table, "cdc_feed_main")
    try:
        q.processAllAvailable()
        feed = spark.table("cdc_feed_main")
        assert feed.count() == 100
        assert feed.filter("_change_type = 'delete'").count() == 0

        delete_rows(spark, table, "k", 10, 40, retain_replaced=True)
        q.processAllAvailable()
        [r] = (
            spark.table("cdc_feed_main")
            .agg(F.sum(_sign()).alias("nr"), F.sum(_sign() * F.col("v")).alias("nv"))
            .collect()
        )
        assert r.nr == 100 - 31
        assert r.nv == 2 * (sum(range(100)) - sum(range(10, 41)))

        (
            spark.range(100, 120)
            .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
            .coalesce(1)
            .write.format("pinot")
            .mode("append")
            .save(table)
        )
        q.processAllAvailable()
        [r] = spark.table("cdc_feed_main").agg(F.sum(_sign()).alias("nr")).collect()
        assert r.nr == 100 - 31 + 20
    finally:
        q.stop()


def test_latest_start_sees_only_future_changes(spark, table):
    from datafusion_pinot_spark.maintenance import delete_rows

    q = _start(spark, table, "cdc_feed_latest", initial_snapshot="latest")
    try:
        q.processAllAvailable()
        assert spark.table("cdc_feed_latest").count() == 0

        delete_rows(spark, table, "k", 0, 5, retain_replaced=True)
        q.processAllAvailable()
        feed = spark.table("cdc_feed_latest")
        # only the changed segments' rows — never a table re-emit
        assert 0 < feed.count() < 200
        [r] = feed.agg(F.sum(_sign()).alias("nr")).collect()
        assert r.nr == -6
    finally:
        q.stop()


def test_compaction_nets_to_zero_downstream(spark, table):
    """THE motivating case: the append-only stream double-counts a
    compaction rewrite; the CDC feed's pairs cancel exactly."""
    from datafusion_pinot_spark.maintenance import compact_table

    q = _start(spark, table, "cdc_feed_compact")
    try:
        q.processAllAvailable()
        before = spark.table("cdc_feed_compact").count()

        compact_table(spark, table, target_docs=1000, retain_replaced=True)
        if S.current_snapshot_id(table) == 1:
            pytest.skip("compaction was a no-op on this layout")
        q.processAllAvailable()
        feed = spark.table("cdc_feed_compact")
        assert feed.count() > before  # pairs did arrive
        [r] = feed.agg(
            F.sum(_sign()).alias("nr"), F.sum(_sign() * F.col("v")).alias("nv")
        ).collect()
        assert r.nr == 100 and r.nv == 2 * sum(range(100))  # unchanged view
    finally:
        q.stop()


def test_checkpoint_restart_resumes_not_replays(spark, table, tmp_path):
    """Offsets are single snapshot ids in the checkpoint: a restarted
    stream resumes from the recorded id and emits only changes that
    happened while it was down — never the bootstrap again. (File sink:
    the memory sink does not support checkpoint recovery.)"""
    from datafusion_pinot_spark.maintenance import delete_rows

    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "feed_parquet")

    def run_until_drained():
        stream = (
            spark.readStream.format("pinot").option("cdc", "true").load(table)
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_until_drained()
    assert spark.read.parquet(sink).count() == 100

    # change the table while the stream is down
    delete_rows(spark, table, "k", 10, 40, retain_replaced=True)

    run_until_drained()
    feed = spark.read.parquet(sink)
    # bootstrap (100) + the changed segments' delta only, not a replay
    assert 100 < feed.count() < 300
    [r] = feed.agg(F.sum(_sign()).alias("nr")).collect()
    assert r.nr == 100 - 31


def test_cdc_stream_schema_evolution(spark, tmp_path):
    """CDC stream with an evolved user-supplied schema: pre-column
    segments bootstrap with the new column NULL-filled (the
    _fill_missing_columns path under the CDC reader), and post-evolution
    appends flow with real values. The user schema must carry
    ``_change_type`` LAST (the reader synthesizes it after the data
    columns)."""
    from datafusion_pinot_spark.sources import register_pinot_source

    register_pinot_source(spark)
    out = str(tmp_path / "cdcevo_OFFLINE")
    spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string").coalesce(
        1
    ).write.format("pinot").mode("append").save(out)

    stream = (
        spark.readStream.format("pinot")
        .option("cdc", "true")
        .schema("k long, v string, extra double, _change_type string")
        .load(out)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("cdcevo_t")
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["k"]: (r["v"], r["extra"], r["_change_type"])
            for r in spark.table("cdcevo_t").collect()
        }
        assert got == {1: ("a", None, "insert"), 2: ("b", None, "insert")}

        spark.createDataFrame(
            [(3, "c", 3.5)], "k long, v string, extra double"
        ).coalesce(1).write.format("pinot").mode("append").save(out)
        q.processAllAvailable()
        got = spark.table("cdcevo_t").count()
        assert got == 3
        [r3] = spark.table("cdcevo_t").filter("k = 3").collect()
        assert (r3["extra"], r3["_change_type"]) == (3.5, "insert")
    finally:
        q.stop()


@pytest.mark.parametrize("seed", [7, 23, 91])
def test_cdc_fold_equals_live_table_under_random_maintenance(
    spark, tmp_path, seed
):
    """Property: after ANY sequence of maintenance ops (appends, retained
    range deletes, retained compactions), folding the batch CDC feed from
    the virtual empty snapshot with sum(sign) per row reconstructs the
    live table EXACTLY — every row nets to its live multiplicity, every
    deleted row nets to zero. This is the invariant every downstream
    incremental materialization relies on."""
    import random

    from datafusion_pinot_spark.maintenance import (
        changes_between,
        compact_table,
        delete_rows,
    )
    from datafusion_pinot_spark.sources import register_pinot_source

    rng = random.Random(seed)
    register_pinot_source(spark)
    out = str(tmp_path / f"cdcprop{seed}_OFFLINE")
    (
        spark.range(0, 80)
        .select(F.col("id").alias("k"), (F.col("id") * 7).alias("v"))
        .repartitionByRange(4, "k")
        .sortWithinPartitions("k")
        .write.format("pinot")
        .mode("overwrite")
        .save(out)
    )
    next_key = 80
    for _ in range(4):
        op = rng.choice(["append", "delete", "compact"])
        if op == "append":
            n = rng.randint(5, 25)
            (
                spark.range(next_key, next_key + n)
                .select(F.col("id").alias("k"), (F.col("id") * 7).alias("v"))
                .coalesce(rng.randint(1, 2))
                .write.format("pinot")
                .mode("append")
                .save(out)
            )
            next_key += n
        elif op == "delete":
            lo = rng.randint(0, max(0, next_key - 10))
            delete_rows(
                spark, out, "k", lo, lo + rng.randint(3, 20),
                retain_replaced=True,
            )
        else:
            compact_table(
                spark, out, target_docs=rng.choice([40, 200]),
                retain_replaced=True,
            )

    cdc = changes_between(spark, out, 0)
    folded = (
        cdc.groupBy("k", "v")
        .agg(F.sum(_sign()).cast("long").alias("mult"))
        .filter(F.col("mult") != 0)
    )
    live = (
        spark.read.format("pinot")
        .load(out)
        .groupBy("k", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("mult"))
    )
    assert folded.exceptAll(live).count() == 0
    assert live.exceptAll(folded).count() == 0


def test_mid_schema_change_type_refuses(spark, table):
    """A user-supplied schema carrying _change_type anywhere but LAST
    would misalign columns positionally (the reader appends the tag after
    the data columns) — streamReader must refuse it up front (r10
    advice)."""
    q = (
        spark.readStream.format("pinot")
        .option("cdc", "true")
        .schema("k long, _change_type string, v long")
        .load(table)
        .writeStream.format("memory")
        .queryName("cdc_mid_schema")
        .start()
    )
    try:
        # streamReader() runs lazily in the data-source worker: the
        # refusal surfaces on the first micro-batch, not at start()
        with pytest.raises(Exception, match="FINAL field"):
            q.processAllAvailable()
    finally:
        q.stop()


def test_restart_after_vacuum_pruned_checkpoint_fails_fast(
    spark, table, tmp_path
):
    """Vacuum/retirement under the CDC window (r10 verdict #6): when the
    CHECKPOINTED snapshot id has been pruned from the log by vacuum, a
    restarted stream must fail fast with the documented recovery message
    — the missed window's deletes are physically gone, so a silent resume
    would be wrong, and a silent re-bootstrap on the OLD checkpoint would
    double-count."""
    from datafusion_pinot_spark.maintenance import delete_rows

    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "feed_parquet")

    def start():
        stream = (
            spark.readStream.format("pinot").option("cdc", "true").load(table)
        )
        return (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(processingTime="0 seconds")
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()  # bootstrap; checkpoint commits id 1
    finally:
        q.stop()

    # two maintenance rounds while the stream is down, then a vacuum
    # window too short to cover the stream's lag: id 1 leaves the log
    delete_rows(spark, table, "k", 10, 20, retain_replaced=True)
    delete_rows(spark, table, "k", 30, 40, retain_replaced=True)
    S.vacuum(table, keep_last=1)
    assert [s["id"] for s in S.load_snapshot_log(table)["snapshots"]] == [3]

    q = start()
    try:
        with pytest.raises(Exception, match="initial_snapshot='earliest'"):
            q.processAllAvailable()
    finally:
        q.stop()


def test_two_concurrent_cdc_streams_independent_checkpoints(
    spark, table, tmp_path
):
    """Two CDC streams on one table with separate checkpoints must each
    see the full feed exactly once — offsets are per-stream snapshot ids
    with no shared state, so a lagging consumer never perturbs a current
    one (the multi-consumer shape a shared CDC table serves at scale)."""
    from datafusion_pinot_spark.maintenance import delete_rows

    sinks = [str(tmp_path / f"feed{i}") for i in (0, 1)]
    ckpts = [str(tmp_path / f"ckpt{i}") for i in (0, 1)]

    def start(i):
        return (
            spark.readStream.format("pinot")
            .option("cdc", "true")
            .load(table)
            .writeStream.format("parquet")
            .option("path", sinks[i])
            .option("checkpointLocation", ckpts[i])
            .outputMode("append")
            .trigger(processingTime="0 seconds")
            .start()
        )

    q0, q1 = start(0), start(1)
    try:
        q0.processAllAvailable()
        q1.processAllAvailable()
        delete_rows(spark, table, "k", 10, 40, retain_replaced=True)
        q0.processAllAvailable()
        # q1 lags one mutation behind; q0 advancing must not affect it
        delete_rows(spark, table, "k", 50, 60, retain_replaced=True)
        q0.processAllAvailable()
        q1.processAllAvailable()
    finally:
        q0.stop()
        q1.stop()

    for sink in sinks:
        feed = spark.read.parquet(sink)
        [r] = feed.agg(F.sum(_sign()).alias("nr")).collect()
        # bootstrap 100, minus 31 (k 10..40), minus 11 (k 50..60)
        assert r.nr == 100 - 31 - 11


@pytest.mark.parametrize("seed", [11, 47])
def test_cdc_fold_invariant_under_schema_evolution(spark, tmp_path, seed):
    """Property (r11): the fold invariant survives schema evolution —
    random sequences of plain appends, EVOLVED appends (extra column),
    and retained deletes; the feed unions by name with NULL-fill for
    pre-evolution delete rows (the changes_between fix), and folding on
    the stable (k, v) columns still reconstructs the live table exactly."""
    import random

    from datafusion_pinot_spark.maintenance import changes_between, delete_rows
    from datafusion_pinot_spark.sources import register_pinot_source

    rng = random.Random(seed)
    register_pinot_source(spark)
    out = str(tmp_path / f"cdcevo{seed}_OFFLINE")
    (
        spark.range(0, 60)
        .select(F.col("id").alias("k"), (F.col("id") * 7).alias("v"))
        .repartitionByRange(3, "k")
        .sortWithinPartitions("k")
        .write.format("pinot")
        .mode("overwrite")
        .save(out)
    )
    next_key = 60
    evolved = False
    for _ in range(4):
        op = rng.choice(["append", "append_evolved", "delete"])
        if op == "append":
            n = rng.randint(5, 15)
            (
                spark.range(next_key, next_key + n)
                .select(F.col("id").alias("k"), (F.col("id") * 7).alias("v"))
            ).coalesce(1).write.format("pinot").mode("append").save(out)
            next_key += n
        elif op == "append_evolved":
            n = rng.randint(5, 15)
            (
                spark.range(next_key, next_key + n)
                .select(
                    F.col("id").alias("k"),
                    (F.col("id") * 7).alias("v"),
                    (F.col("id") * 1.5).alias("extra"),
                )
                .coalesce(1)
                .write.format("pinot")
                .mode("append")
                .save(out)
            )
            next_key += n
            evolved = True
        else:
            lo = rng.randint(0, max(0, next_key - 10))
            delete_rows(
                spark, out, "k", lo, lo + rng.randint(3, 15),
                retain_replaced=True,
            )

    cdc = changes_between(spark, out, 0)
    if evolved:
        assert "extra" in cdc.columns  # union carried the evolved column
    folded = (
        cdc.groupBy("k", "v")
        .agg(F.sum(_sign()).cast("long").alias("mult"))
        .filter(F.col("mult") != 0)
    )
    live_rows = {}
    for seg_df in [spark.read.format("pinot").load(out).select("k", "v")]:
        for r in seg_df.collect():
            live_rows[(r.k, r.v)] = live_rows.get((r.k, r.v), 0) + 1
    got = {(r.k, r.v): r.mult for r in folded.collect()}
    assert got == live_rows


def test_cdc_fold_through_stateful_operator(spark, tmp_path):
    """r11 verdict #4 — the CDC x stateful COMPOSE contract, pinned: a
    rewrite's retire+add commit as ONE snapshot and offsets are snapshot
    ids, so the delete half reaches a downstream stateful operator in the
    SAME micro-batch as its compensating insert (a batch window (s, e]
    either contains the rewrite's id or it doesn't). Within the batch the
    per-key row order is arbitrary, so the state fold must be
    order-insensitive within a batch — sign-additive folds are — and
    never needs cross-batch commutativity for rewrites.

    Two queries over one rewrite: (1) foreachBatch records per-batch
    per-key net row counts — the rewrite batch must net to ZERO for every
    rewritten key (delete and insert both present); (2) an
    applyInPandasWithState sign-fold whose final per-key state must equal
    the live table exactly, through the rewrite."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from datafusion_pinot_spark.maintenance import compact_table
    from datafusion_pinot_spark.sources import register_pinot_source

    register_pinot_source(spark)
    out = str(tmp_path / "cdcstate_OFFLINE")
    (
        spark.range(0, 100)
        .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
        .repartitionByRange(4, "k")
        .sortWithinPartitions("k")
        .write.format("pinot")
        .mode("overwrite")
        .save(out)
    )

    # -- query 1: per-batch composition recorder ---------------------------
    batches: list[dict] = []

    def record(batch_df, batch_id):
        rows = (
            batch_df.groupBy("k")
            .agg(
                F.sum(
                    F.when(F.col("_change_type") == "delete", -1).otherwise(1)
                ).alias("net"),
                F.sum(
                    F.when(F.col("_change_type") == "delete", 1).otherwise(0)
                ).alias("deletes"),
            )
            .collect()
        )
        if rows:
            batches.append(
                {
                    "id": batch_id,
                    "nets": {r.k: r.net for r in rows},
                    "deletes": sum(r.deletes for r in rows),
                }
            )

    feed = spark.readStream.format("pinot").option("cdc", "true").load(out)
    q1 = feed.writeStream.foreachBatch(record).start()

    # -- query 2: stateful sign-fold ---------------------------------------
    def fold(key, pdfs, state: GroupState):
        (k,) = key
        n, s, u = state.get if state.exists else (0, 0, 0)
        for pdf in pdfs:
            sign = pdf["_change_type"].map({"insert": 1, "delete": -1})
            n += int(sign.sum())
            s += int((sign * pdf["v"]).sum())
        u += 1
        state.update((n, s, u))
        yield pd.DataFrame({"k": [k], "n": [n], "s": [s], "u": [u]})

    folded = (
        spark.readStream.format("pinot")
        .option("cdc", "true")
        .load(out)
        .groupBy("k")
        .applyInPandasWithState(
            fold,
            outputStructType="k long, n long, s long, u long",
            stateStructType="n long, s long, u long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    q2 = (
        folded.writeStream.outputMode("update")
        .format("memory")
        .queryName("cdc_state_fold")
        .start()
    )
    try:
        q1.processAllAvailable()
        q2.processAllAvailable()

        # the rewrite: one compaction commit (retire 4, add 1)
        compact_table(spark, out, target_docs=1000, retain_replaced=True)
        assert S.current_snapshot_id(out) == 2, "compaction must commit once"
        q1.processAllAvailable()
        q2.processAllAvailable()

        # (1) same-micro-batch: the batch carrying deletes nets to zero
        # for EVERY key — its compensating inserts are in the same batch
        rewrite_batches = [b for b in batches if b["deletes"]]
        assert rewrite_batches, "rewrite batch never reached the stream"
        for b in rewrite_batches:
            assert all(v == 0 for v in b["nets"].values()), (
                f"batch {b['id']} carried deletes whose compensating "
                f"inserts were NOT in the same micro-batch: {b['nets']}"
            )

        # (2) the stateful fold lands on the live table exactly: latest
        # state row per key (highest update counter) == (1, v)
        from pyspark.sql import Window

        w = Window.partitionBy("k").orderBy(F.desc("u"))
        final = (
            spark.table("cdc_state_fold")
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("k", "n", "s")
            .collect()
        )
        assert len(final) == 100
        assert all(r.n == 1 and r.s == 2 * r.k for r in final)
    finally:
        q1.stop()
        q2.stop()

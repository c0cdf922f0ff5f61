"""Snapshot-versioned reads (pinot_segment/snapshot.py + the reader's
``as_of`` option): time travel across sink commits and maintenance ops,
retirement instead of deletion, and vacuum reclaim.

The scale problem under test: compaction/delete commit by replacing
segment dirs, so a reader planned against the old list dies mid-scan.
With ``retain_replaced=True`` the replaced segments retire (invisible to
the live walk, addressable by snapshot) and ``as_of`` reads are
repeatable and maintenance-immune until vacuum."""

import os

import pytest
from pyspark.sql import functions as F

from pinot_segment import snapshot as S


@pytest.fixture()
def table(spark, tmp_path):
    from datafusion_pinot_spark.sources import register_pinot_source

    register_pinot_source(spark)
    out = str(tmp_path / "snap_OFFLINE")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    df.coalesce(2).write.format("pinot").mode("overwrite").save(out)
    return out


def read(spark, path, **opts):
    r = spark.read.format("pinot")
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load(path)


class TestSnapshotLog:
    def test_sink_commit_appends_snapshot(self, spark, table):
        log = S.load_snapshot_log(table)
        assert log is not None and len(log["snapshots"]) == 1
        assert S.current_snapshot_id(table) == 1
        assert sorted(log["snapshots"][0]["segments"]) == sorted(
            S._live_segment_names(table)
        )

    def test_append_write_appends_snapshot(self, spark, table):
        spark.range(100, 150).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ).coalesce(1).write.format("pinot").mode("append").save(table)
        assert S.current_snapshot_id(table) == 2
        # v1 still resolves to the original two segments
        assert len(S.segments_as_of(table, 1)) == 2
        assert len(S.segments_as_of(table, 2)) == 3

    def test_unknown_snapshot_raises(self, table):
        with pytest.raises(ValueError, match="Unknown snapshot"):
            S.segments_as_of(table, 99)

    def test_no_log_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError, match="No snapshot log"):
            S.segments_as_of(str(tmp_path), 1)


class TestAsOfReads:
    def test_as_of_survives_compaction(self, spark, table):
        from datafusion_pinot_spark.maintenance import compact_table

        before = sorted(
            (r["k"], r["v"]) for r in read(spark, table).collect()
        )
        res = compact_table(
            spark, table, target_docs=1000, retain_replaced=True
        )
        assert res["groups"] == 1 and len(res["removed_segments"]) == 2
        # retired members are out of the live walk but still addressable
        assert S._live_segment_names(table) == res["merged_segments"]
        v1 = sorted(
            (r["k"], r["v"])
            for r in read(spark, table, as_of=1).collect()
        )
        latest = sorted(
            (r["k"], r["v"]) for r in read(spark, table).collect()
        )
        assert v1 == before  # bit-identical pre-compaction view
        assert latest == before  # compaction preserves data

    def test_as_of_shows_deleted_rows(self, spark, table):
        from datafusion_pinot_spark.maintenance import delete_rows

        res = delete_rows(
            spark, table, "k", 10, 39, retain_replaced=True
        )
        assert res["rows_deleted"] == 30
        latest_ks = {r["k"] for r in read(spark, table).collect()}
        assert latest_ks == set(range(0, 10)) | set(range(40, 100))
        v1_ks = {
            r["k"] for r in read(spark, table, as_of=1).collect()
        }
        assert v1_ks == set(range(100))

    def test_as_of_pushdown_still_applies(self, spark, table):
        from datafusion_pinot_spark.maintenance import delete_rows

        delete_rows(spark, table, "k", 0, 49, retain_replaced=True)
        df = read(spark, table, as_of=1).filter(F.col("k") < 5)
        assert sorted(r["k"] for r in df.collect()) == [0, 1, 2, 3, 4]


class TestInFlightScanSurvival:
    def test_stale_planned_scan_survives_retirement(self, spark, table):
        """The read-write race itself: Spark caches (partitions, read
        function) per DataFrame object, so a df executed once holds the
        OLD segment paths. A snapshot-retaining compaction moves those
        dirs into retired/ — the re-execution must fall back there
        (pinot_datasource._open_segment) and return the same rows."""
        from datafusion_pinot_spark.maintenance import compact_table

        df = read(spark, table)
        before = sorted((r["k"], r["v"]) for r in df.collect())
        compact_table(spark, table, target_docs=1000, retain_replaced=True)
        # both original segment dirs are gone from the live table dir
        assert all(
            not os.path.isdir(os.path.join(table, n))
            for n in S.load_snapshot_log(table)["snapshots"][0]["segments"]
        )
        again = sorted((r["k"], r["v"]) for r in df.collect())
        assert again == before

    def test_stale_scan_dies_only_at_vacuum(self, spark, table):
        from datafusion_pinot_spark.maintenance import compact_table

        df = read(spark, table)
        df.collect()
        compact_table(spark, table, target_docs=1000, retain_replaced=True)
        S.vacuum(table, keep_last=1)
        # reclaim is the documented grace boundary: the stale scan's
        # executor-side open fails (FileNotFoundError through whatever
        # wrapper the Spark version uses)
        with pytest.raises(Exception, match="No such file|FileNotFound"):
            df.collect()


class TestVacuum:
    def test_vacuum_keeps_referenced_retired(self, spark, table):
        from datafusion_pinot_spark.maintenance import compact_table

        compact_table(spark, table, target_docs=1000, retain_replaced=True)
        # keep_last=2 covers snapshots {1, 2}: v1's members stay
        out = S.vacuum(table, keep_last=2)
        assert out["removed"] == []
        assert len(read(spark, table, as_of=1).collect()) == 100

    def test_vacuum_reclaims_unreferenced(self, spark, table):
        from datafusion_pinot_spark.maintenance import compact_table

        compact_table(spark, table, target_docs=1000, retain_replaced=True)
        out = S.vacuum(table, keep_last=1)
        assert len(out["removed"]) == 2  # both retired members reclaimed
        assert not os.path.isdir(os.path.join(table, S.RETIRED_DIR))
        # pruned log: v1 is gone
        with pytest.raises(ValueError, match="Unknown snapshot"):
            S.segments_as_of(table, 1)
        # live reads unaffected
        assert len(read(spark, table).collect()) == 100

    def test_vacuum_never_touches_live(self, spark, table):
        out = S.vacuum(table, keep_last=1)
        assert out["removed"] == []
        assert len(S._live_segment_names(table)) == 2


class TestStreamSnapshots:
    def test_each_stream_batch_commits_a_snapshot(self, spark, tmp_path):
        from datafusion_pinot_spark.sources import register_pinot_source

        register_pinot_source(spark)
        src = str(tmp_path / "src")
        out = str(tmp_path / "ss_OFFLINE")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(src)
        spark.range(0, 10).selectExpr("id AS k").coalesce(1).write.json(
            os.path.join(src, "a")
        )
        stream = (
            spark.readStream.schema("k long")
            .json(os.path.join(src, "*"))
            .writeStream.format("pinot")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
        )
        q = stream.start()
        q.awaitTermination(120)
        sid = S.current_snapshot_id(out)
        assert sid is not None and sid >= 1
        assert len(S.segments_as_of(out, sid)) >= 1


class TestVacuumDryRun:
    def test_dry_run_reports_without_touching_disk(self, spark, tmp_path):
        """vacuum(dry_run=True) (r11): same removed/pruned report as a
        real run, zero disk/log mutation — the operator preview for the
        one irreversible maintenance op. pruned_snapshots is exactly the
        checkpoint-id set a running CDC stream must not hold."""
        import json
        import os

        from datafusion_pinot_spark.maintenance import delete_rows
        from datafusion_pinot_spark.sources import register_pinot_source

        register_pinot_source(spark)
        out = str(tmp_path / "vdr_OFFLINE")
        spark.range(0, 50).selectExpr("id AS k", "id * 2 AS v").repartition(
            2
        ).write.format("pinot").mode("overwrite").save(out)
        delete_rows(spark, out, "k", 0, 10, retain_replaced=True)

        log_before = json.dumps(S.load_snapshot_log(out), sort_keys=True)
        retired = os.path.join(out, S.RETIRED_DIR)
        retired_before = sorted(os.listdir(retired))

        preview = S.vacuum(out, keep_last=1, dry_run=True)
        assert preview["dry_run"] is True
        assert preview["removed"]  # something is reclaimable
        assert preview["pruned_snapshots"] == [1]
        # nothing changed on disk or in the log
        assert sorted(os.listdir(retired)) == retired_before
        assert json.dumps(S.load_snapshot_log(out), sort_keys=True) == log_before
        # the older snapshot still reads fine after the dry run
        assert (
            spark.read.format("pinot").option("as_of", "1").load(out).count()
            == 50
        )

        real = S.vacuum(out, keep_last=1)
        assert real["dry_run"] is False
        assert real["removed"] == preview["removed"]
        assert real["pruned_snapshots"] == preview["pruned_snapshots"]
        assert [s["id"] for s in S.load_snapshot_log(out)["snapshots"]] == real[
            "kept_snapshots"
        ]

    def test_dry_run_on_empty_log(self, tmp_path):
        out = str(tmp_path)
        assert S.vacuum(out, keep_last=3, dry_run=True) == {
            "removed": [],
            "kept_snapshots": [],
            "pruned_snapshots": [],
            "dry_run": True,
        }

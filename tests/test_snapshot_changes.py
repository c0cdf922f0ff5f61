"""Incremental (CDC-style) reads between snapshots:
``snapshot.changed_segments`` (the segment-level diff off the one-file
log) and ``maintenance.changes_between`` (the insert/delete row feed
that scans ONLY changed segments). The load-bearing contract: a rewrite
emits its surviving rows as delete+insert pairs that cancel under any
additive aggregate, so folding the feed with sum(sign * x) lands
exactly on the as-of diff."""

import json
import os

import pytest
from pyspark.sql import functions as F

from pinot_segment import snapshot as S


@pytest.fixture()
def table(spark, tmp_path):
    from datafusion_pinot_spark.sources import register_pinot_source

    register_pinot_source(spark)
    out = str(tmp_path / "cdc_OFFLINE")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    (
        df.repartitionByRange(4, "k")
        .sortWithinPartitions("k")
        .write.format("pinot")
        .mode("overwrite")
        .save(out)
    )
    return out


class TestChangedSegments:
    def test_pure_log_diff(self, tmp_path):
        """changed_segments reads only the log — verified on a synthetic
        one with no segment dirs at all."""
        d = str(tmp_path)
        log = {
            "version": S.VERSION,
            "snapshots": [
                {"id": 1, "op": "commit", "segments": ["a", "b"], "ts": ""},
                {"id": 2, "op": "delete", "segments": ["a", "c", "d"], "ts": ""},
            ],
        }
        with open(os.path.join(d, S.SNAPSHOT_FILE), "w") as f:
            json.dump(log, f)
        diff = S.changed_segments(d, 1, 2)
        assert diff["added"] == ["c", "d"]
        assert diff["removed"] == ["b"]
        # to_id defaults to the latest snapshot
        assert S.changed_segments(d, 1) == diff
        # reverse direction swaps the sets
        rev = S.changed_segments(d, 2, 1)
        assert rev["added"] == ["b"] and rev["removed"] == ["c", "d"]
        # identical endpoints -> empty diff
        same = S.changed_segments(d, 2, 2)
        assert same["added"] == [] and same["removed"] == []

    def test_unknown_id_raises(self, tmp_path):
        d = str(tmp_path)
        with open(os.path.join(d, S.SNAPSHOT_FILE), "w") as f:
            json.dump(
                {
                    "version": S.VERSION,
                    "snapshots": [
                        {"id": 1, "op": "c", "segments": [], "ts": ""}
                    ],
                },
                f,
            )
        with pytest.raises(ValueError, match="Unknown snapshot"):
            S.changed_segments(d, 1, 99)

    def test_no_log_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            S.changed_segments(str(tmp_path), 1, 2)


class TestChangesBetween:
    def test_delete_feed_nets_to_deleted_range(self, spark, table):
        from datafusion_pinot_spark.maintenance import (
            changes_between,
            delete_rows,
        )

        delete_rows(spark, table, "k", 10, 40, retain_replaced=True)
        cdc = changes_between(spark, table, 1, 2)
        assert set(cdc.columns) == {"k", "v", "_change_type"}
        sign = F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
        [r] = (
            cdc.agg(
                F.sum(sign).alias("net_rows"),
                F.sum(sign * F.col("k")).alias("net_k"),
                F.sum(sign * F.col("v")).alias("net_v"),
            )
        ).collect()
        # deleted ks: 10..40 inclusive -> 31 rows, sum 775, v = 2k
        assert r.net_rows == -31
        assert r.net_k == -sum(range(10, 41))
        assert r.net_v == -2 * sum(range(10, 41))

    def test_feed_reads_only_changed_segments(self, spark, table):
        """The whole point at scale: untouched segments contribute zero
        rows to the feed. With range layout 0..100 in 4 segments, a
        delete confined to the first quartile leaves ~3 segments
        untouched — the feed must be much smaller than 2x the table."""
        from datafusion_pinot_spark.maintenance import (
            changes_between,
            delete_rows,
        )

        delete_rows(spark, table, "k", 0, 20, retain_replaced=True)
        diff = S.changed_segments(table, 1, 2)
        touched = set(diff["added"]) | set(diff["removed"])
        live_v1 = S._log_entry(table, 1)["segments"]
        assert len(touched) < len(live_v1) * 2  # not a full-table rewrite
        cdc = changes_between(spark, table, 1, 2)
        # every feed row comes from a changed segment: the deleted range
        # spans at most 2 of the 4 range-partitioned segments, so the
        # feed is bounded by those segments' rows, far below the table
        assert cdc.count() < 100

    def test_same_version_is_empty_with_schema(self, spark, table):
        from datafusion_pinot_spark.maintenance import changes_between

        cdc = changes_between(spark, table, 1, 1)
        assert cdc.count() == 0
        assert set(cdc.columns) == {"k", "v", "_change_type"}

    def test_compaction_feed_cancels_exactly(self, spark, table):
        """Compaction moves rows without changing content: the CDC feed
        between pre- and post-compaction snapshots must net to zero on
        every additive aggregate while being non-empty."""
        from datafusion_pinot_spark.maintenance import (
            changes_between,
            compact_table,
        )

        compact_table(spark, table, target_docs=1000, retain_replaced=True)
        to_id = S.current_snapshot_id(table)
        if to_id == 1:
            pytest.skip("compaction was a no-op on this layout")
        cdc = changes_between(spark, table, 1, to_id)
        assert cdc.count() > 0
        sign = F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
        [r] = cdc.agg(
            F.sum(sign).alias("nr"), F.sum(sign * F.col("v")).alias("nv")
        ).collect()
        assert r.nr == 0 and r.nv == 0

    def test_vacuumed_from_raises(self, spark, table):
        from datafusion_pinot_spark.maintenance import (
            changes_between,
            delete_rows,
        )

        delete_rows(spark, table, "k", 10, 40, retain_replaced=True)
        S.vacuum(table, keep_last=1)
        with pytest.raises((FileNotFoundError, ValueError)):
            changes_between(spark, table, 1, 2)

    def test_schema_evolution_between_endpoints(self, spark, tmp_path):
        """Column added between from_id and to_id (r10 advice, medium):
        the insert side infers its schema from post-evolution segments,
        the delete side from retired pre-evolution ones — the union must
        NULL-fill the missing column on the delete rows (the streaming
        reader's _fill_missing_columns semantics), not raise
        AnalysisException."""
        from datafusion_pinot_spark.maintenance import (
            changes_between,
            delete_rows,
        )
        from datafusion_pinot_spark.sources import register_pinot_source

        register_pinot_source(spark)
        out = str(tmp_path / "cdcevo_batch_OFFLINE")
        # snap 1: pre-evolution segment (k, v)
        spark.createDataFrame(
            [(1, 10), (2, 20)], "k long, v long"
        ).coalesce(1).write.format("pinot").mode("append").save(out)
        # snap 2: evolved segment adds `extra`
        spark.createDataFrame(
            [(3, 30, 3.5)], "k long, v long, extra double"
        ).coalesce(1).write.format("pinot").mode("append").save(out)
        # snap 3: retire the pre-evolution segment whole (k 1..2 is the
        # entire segment -> dropped, no rewritten survivor)
        delete_rows(spark, out, "k", 1, 2, retain_replaced=True)

        cdc = changes_between(spark, out, 1)
        assert set(cdc.columns) == {"k", "v", "extra", "_change_type"}
        got = {
            (r["k"], r["_change_type"]): (r["v"], r["extra"])
            for r in cdc.collect()
        }
        # insert side carries the evolved column; delete rows predate it
        assert got[(3, "insert")] == (30, 3.5)
        assert got[(1, "delete")] == (10, None)
        assert got[(2, "delete")] == (20, None)

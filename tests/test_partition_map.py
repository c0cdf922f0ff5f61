"""Column partition map (Pinot's segmentPartitionConfig): writer metadata,
reader parsing, planning-time residue pruning (manifest and open paths),
sink option wiring, and compaction preservation."""

import os

import numpy as np
import pytest

from pinot_segment import SegmentReader, manifest as M
from pinot_segment.metadata import DataType
from pinot_segment.writer import ColumnSpec, write_segment


def _seg(table, name, keys, num=8):
    return write_segment(
        table / name,
        name,
        "t",
        [
            ColumnSpec(
                "k",
                DataType.LONG,
                np.asarray(keys, dtype=np.int64),
                raw=True,
                partition_config=("Modulo", num),
            ),
            ColumnSpec(
                "v", DataType.LONG, np.arange(len(keys), dtype=np.int64)
            ),
        ],
    )


def test_writer_reader_partition_metadata(tmp_path):
    v3 = _seg(tmp_path, "s0", [0, 8, 16, 3, 11])
    cm = SegmentReader.open(v3).metadata.get_column("k")
    assert cm.partition_function == "Modulo"
    assert cm.num_partitions == 8
    assert cm.partition_values == (0, 3)


def test_partition_config_validation():
    with pytest.raises(ValueError, match="only Modulo"):
        ColumnSpec(
            "k", DataType.LONG, np.arange(3), raw=True,
            partition_config=("Murmur", 8),
        )
    with pytest.raises(ValueError, match="integer column"):
        ColumnSpec(
            "s", DataType.STRING, ["a"], partition_config=("Modulo", 8)
        )


def test_partition_map_pruned_logic():
    from pyspark.sql.datasource import EqualTo, In

    from datafusion_pinot_spark.sources.pinot_datasource import (
        _partition_map_pruned,
    )

    prune = lambda f, vals=(0, 3): _partition_map_pruned(f, "Modulo", 8, vals)
    assert prune(EqualTo(("k",), 9))  # 9 % 8 = 1, not present
    assert not prune(EqualTo(("k",), 8))  # residue 0 present
    assert not prune(EqualTo(("k",), 11))  # residue 3 present
    assert prune(In(("k",), (9, 13)))  # residues {1, 5} all absent
    assert not prune(In(("k",), (9, 16)))  # 16 % 8 = 0 present
    assert prune(In(("k",), ()))  # empty IN matches nothing
    # any non-integer operand forbids pruning (never wrongly prune)
    assert not prune(EqualTo(("k",), "9"))
    assert not prune(In(("k",), (9, "x")))
    assert not prune(EqualTo(("k",), True))
    # negative keys use floor-mod, matching the writer's numpy %
    assert not prune(EqualTo(("k",), -5))  # -5 % 8 = 3 present
    assert prune(EqualTo(("k",), -7))  # -7 % 8 = 1 absent


def _mk_table(tmp_path):
    """3 segments holding disjoint residue classes of k mod 8."""
    table = tmp_path / "t_OFFLINE"
    _seg(table, "seg0", [0, 8, 1, 9])  # residues {0, 1}
    _seg(table, "seg1", [2, 10, 3, 11])  # residues {2, 3}
    _seg(table, "seg2", [4, 12, 5, 13])  # residues {4, 5}
    return table


def test_planning_prunes_by_residue_zero_opens(tmp_path, monkeypatch):
    from pyspark.sql.types import LongType, StructField, StructType

    from datafusion_pinot_spark.sources import pinot_datasource as ds

    table = _mk_table(tmp_path)
    M.write_manifest(str(table), M.build_manifest(str(table)))
    segs = [str(table / f"seg{i}" / "v3") for i in range(3)]

    opened = []
    real_open = SegmentReader.open.__func__
    monkeypatch.setattr(
        SegmentReader,
        "open",
        classmethod(
            lambda cls, d: (opened.append(str(d)), real_open(cls, d))[1]
        ),
    )
    reader = ds.PinotDataSourceReader(
        StructType([StructField("k", LongType())]), segs
    )
    # k=3 → residue 3. seg0 spans [0,9] so zone maps alone would NOT
    # prune it — only the partition map (residues {0,1}) can. seg2's
    # range [4,13] excludes 3 either way.
    list(reader.pushFilters([ds.EqualTo(("k",), 3)]))
    kept = [d for p in reader.partitions() for d in p.segment_dirs]
    assert opened == []  # manifest answered, zero segment opens
    assert kept == [segs[1]]  # only the residue-3 segment survives


def test_planning_prunes_by_residue_open_path(tmp_path):
    from pyspark.sql.types import LongType, StructField, StructType

    from datafusion_pinot_spark.sources import pinot_datasource as ds

    table = _mk_table(tmp_path)  # no manifest written
    segs = [str(table / f"seg{i}" / "v3") for i in range(3)]
    reader = ds.PinotDataSourceReader(
        StructType([StructField("k", LongType())]), segs
    )
    list(reader.pushFilters([ds.EqualTo(("k",), 3)]))
    kept = [d for p in reader.partitions() for d in p.segment_dirs]
    assert kept == [segs[1]]


def test_sink_partition_option_end_to_end(spark, tmp_path):
    from pyspark.sql import functions as F

    from datafusion_pinot_spark.sources import register_pinot_source

    register_pinot_source(spark)
    out = str(tmp_path / "tbl_OFFLINE")
    (
        spark.range(0, 4000)
        .selectExpr("id AS k", "id * 2 AS v")
        .repartition(8, F.pmod(F.col("k"), F.lit(8)))
        .write.format("pinot")
        .mode("overwrite")
        .option("raw", "k")
        .option("partitionColumn", "k")
        .option("numPartitions", "8")
        .save(out)
    )
    # every segment records its residues; the union covers all 8
    all_pids = set()
    per_seg = []
    for d in os.listdir(out):
        v3 = os.path.join(out, d, "v3")
        if not os.path.isdir(v3):
            continue
        cm = SegmentReader.open(v3).metadata.get_column("k")
        assert cm.partition_function == "Modulo"
        per_seg.append(set(cm.partition_values))
        all_pids |= set(cm.partition_values)
    assert all_pids == set(range(8))
    # pmod layout → residue sets are disjoint across segments
    assert sum(len(s) for s in per_seg) == 8
    # point lookup returns the right row (pruning is transparent)
    back = spark.read.format("pinot").load(out)
    rows = back.filter("k = 1234").collect()
    assert len(rows) == 1 and rows[0]["v"] == 2468
    # manifest carries the partition map for O(1) planning
    stats = M.load_manifest(out)
    assert stats is not None
    pm = next(iter(stats.values()))["columns"]["k"]["partitions"]
    assert pm["function"] == "Modulo" and pm["num"] == 8


def test_compaction_preserves_partition_map(tmp_path):
    from pinot_segment.compact import merge_segments

    a = _seg(tmp_path, "a", [0, 8])  # residue {0}
    b = _seg(tmp_path, "b", [3, 11])  # residue {3}
    v3 = merge_segments([str(a), str(b)], tmp_path / "m", "m", "t")
    cm = SegmentReader.open(v3).metadata.get_column("k")
    assert cm.partition_function == "Modulo"
    assert cm.num_partitions == 8
    assert cm.partition_values == (0, 3)

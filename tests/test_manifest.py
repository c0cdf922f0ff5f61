"""Segment-stats manifest: O(1) driver-side planning metadata.

Pins the r3-verdict #7 fix: zone-map pruning and the hybrid time-boundary
lookup must NOT open a SegmentReader per segment when a fresh
segment_stats.json covers the table — at 10^5 segments that walk dominates
planning. Staleness (segment added/removed/rewritten) must fall back to the
open-based path, never serve wrong stats.
"""

import json
import os

import numpy as np
import pytest

from pinot_segment import manifest as M
from pinot_segment.metadata import DataType
from pinot_segment.segment_reader import SegmentReader
from pinot_segment.writer import ColumnSpec, write_segment


def _mk_table(root, n_segs=3, rows=50):
    table_dir = root / "t_OFFLINE"
    for i in range(n_segs):
        lo = i * 1000
        write_segment(
            table_dir / f"seg{i}",
            f"seg{i}",
            "t",
            [
                ColumnSpec("k", DataType.LONG, np.arange(lo, lo + rows)),
                ColumnSpec(
                    "s", DataType.STRING, [f"v{i}_{j:03d}" for j in range(rows)]
                ),
            ],
        )
    return str(table_dir)


@pytest.fixture()
def table_dir(tmp_path):
    return _mk_table(tmp_path)


def test_build_load_roundtrip(table_dir):
    M.write_manifest(table_dir, M.build_manifest(table_dir))
    segs = M.load_manifest(table_dir)
    assert segs is not None and len(segs) == 3
    s0 = segs["seg0"]
    assert s0["total_docs"] == 50
    assert s0["columns"]["k"] == {
        "dtype": "LONG",
        "has_nulls": False,
        "has_dictionary": True,
        "cardinality": 50,
        "min": 0,
        "max": 49,
    }
    assert s0["columns"]["s"]["min"] == "v0_000"
    # json round-trip: everything plain python types
    json.dumps(segs)


def test_stale_on_new_segment(table_dir):
    M.write_manifest(table_dir, M.build_manifest(table_dir))
    write_segment(
        os.path.join(table_dir, "seg9"),
        "seg9",
        "t",
        [ColumnSpec("k", DataType.LONG, np.arange(5))],
    )
    assert M.load_manifest(table_dir) is None  # set mismatch -> stale


def test_stale_on_rewritten_segment(table_dir):
    M.write_manifest(table_dir, M.build_manifest(table_dir))
    import shutil

    shutil.rmtree(os.path.join(table_dir, "seg1"))
    write_segment(
        os.path.join(table_dir, "seg1"),
        "seg1",
        "t",
        [
            ColumnSpec("k", DataType.LONG, np.arange(7)),
            ColumnSpec("s", DataType.STRING, ["x"] * 7),
        ],
    )
    assert M.load_manifest(table_dir) is None  # fingerprint drift -> stale


def test_stats_for_segments_mixed(table_dir, tmp_path):
    other = _mk_table(tmp_path / "other")  # no manifest written
    M.write_manifest(table_dir, M.build_manifest(table_dir))
    covered = [os.path.join(table_dir, f"seg{i}", "v3") for i in range(3)]
    uncovered = [os.path.join(other, "seg0", "v3")]
    stats = M.stats_for_segments(covered + uncovered)
    assert all(stats[s] is not None for s in covered)
    assert stats[uncovered[0]] is None


def test_stats_for_segments_verifies_only_requested(table_dir, monkeypatch):
    """r14 (r13 advice): stats_for_segments must fingerprint ONLY the
    requested segments — a count task on a huge table must not re-verify
    the whole table per worker — and staleness elsewhere in the table must
    not poison a verified entry."""
    M.write_manifest(table_dir, M.build_manifest(table_dir))
    segs = [os.path.join(table_dir, f"seg{i}", "v3") for i in range(3)]

    checked = []
    real_fp = M._fingerprint

    def spy(v3):
        checked.append(v3)
        return real_fp(v3)

    monkeypatch.setattr(M, "_fingerprint", spy)
    stats = M.stats_for_segments(segs[:2])
    assert all(stats[s] is not None for s in segs[:2])
    assert sorted(checked) == sorted(segs[:2])  # seg2 never fingerprinted

    # a new segment (whole-table set mismatch) must NOT disable stats for
    # the verified requested segments…
    write_segment(
        os.path.join(table_dir, "seg9"),
        "seg9",
        "t",
        [ColumnSpec("k", DataType.LONG, np.arange(5))],
    )
    stats = M.stats_for_segments(segs[:2])
    assert all(stats[s] is not None for s in segs[:2])
    # …while the uncovered new segment itself falls back
    assert M.stats_for_segments(
        [os.path.join(table_dir, "seg9", "v3")]
    )[os.path.join(table_dir, "seg9", "v3")] is None


def test_stats_for_segments_rejects_rewritten_requested(table_dir):
    """A REQUESTED segment whose metadata changed under the manifest must
    map to None (fingerprint mismatch), even though siblings stay served."""
    import shutil

    M.write_manifest(table_dir, M.build_manifest(table_dir))
    shutil.rmtree(os.path.join(table_dir, "seg1"))
    write_segment(
        os.path.join(table_dir, "seg1"),
        "seg1",
        "t",
        [
            ColumnSpec("k", DataType.LONG, np.arange(7)),
            ColumnSpec("s", DataType.STRING, ["x"] * 7),
        ],
    )
    M._FP_CACHE.clear()  # fresh process view
    segs = [os.path.join(table_dir, f"seg{i}", "v3") for i in range(3)]
    stats = M.stats_for_segments(segs)
    assert stats[segs[1]] is None
    assert stats[segs[0]] is not None and stats[segs[2]] is not None


def test_planning_does_not_open_segments(table_dir, monkeypatch):
    """With a fresh manifest, zone-map pruning at partitions() time must not
    call SegmentReader.open — the O(segments) walk the manifest removes."""
    from datafusion_pinot_spark.sources import pinot_datasource as ds

    M.write_manifest(table_dir, M.build_manifest(table_dir))
    segs = [os.path.join(table_dir, f"seg{i}", "v3") for i in range(3)]

    opened = []
    real_open = SegmentReader.open.__func__

    def counting_open(cls, seg_dir):
        opened.append(str(seg_dir))
        return real_open(cls, seg_dir)

    monkeypatch.setattr(
        SegmentReader, "open", classmethod(counting_open)
    )

    from pyspark.sql.types import LongType, StructField, StructType

    reader = ds.PinotDataSourceReader(
        StructType([StructField("k", LongType())]), segs
    )
    # seg0 holds k in [0,49], seg1 [1000,1049], seg2 [2000,2049]
    list(reader.pushFilters([ds.GreaterThan(("k",), 1500)]))
    parts = reader.partitions()
    assert opened == []  # manifest answered every prune decision
    kept = [d for p in parts for d in p.segment_dirs]
    assert kept == [segs[2]]


def test_planning_falls_back_without_manifest(table_dir):
    from pyspark.sql.types import LongType, StructField, StructType

    from datafusion_pinot_spark.sources import pinot_datasource as ds

    segs = [os.path.join(table_dir, f"seg{i}", "v3") for i in range(3)]
    reader = ds.PinotDataSourceReader(
        StructType([StructField("k", LongType())]), segs
    )
    list(reader.pushFilters([ds.GreaterThan(("k",), 1500)]))
    kept = [d for p in reader.partitions() for d in p.segment_dirs]
    assert kept == [segs[2]]  # same pruning via the open-based path


def test_hybrid_boundary_uses_manifest(spark, tmp_path, monkeypatch):
    """load_hybrid_table's boundary scan: zero SegmentReader.open calls when
    the OFFLINE manifest is fresh."""
    from datafusion_pinot_spark import catalog as cat

    off = _mk_table(tmp_path)
    rt_dir = tmp_path / "t_REALTIME"
    write_segment(
        rt_dir / "segr",
        "segr",
        "t",
        [
            ColumnSpec("k", DataType.LONG, np.arange(3000, 3050)),
            ColumnSpec("s", DataType.STRING, [f"r{j}" for j in range(50)]),
        ],
    )
    M.write_manifest(off, M.build_manifest(off))

    opened = []
    real_open = SegmentReader.open.__func__

    def counting_open(cls, seg_dir):
        opened.append(str(seg_dir))
        return real_open(cls, seg_dir)

    monkeypatch.setattr(SegmentReader, "open", classmethod(counting_open))

    catalog = cat.PinotCatalog.filesystem(str(tmp_path))

    class _Stub:
        def filter(self, *_):
            return self

        def unionByName(self, other):
            return self

    loaded = []
    monkeypatch.setattr(
        cat.PinotCatalog,
        "_load_segments",
        lambda self, spark_, segs: loaded.append(list(segs)) or _Stub(),
    )

    catalog.load_hybrid_table(spark, "t", "k")
    assert opened == []  # boundary came from the manifest
    assert len(loaded) == 2  # offline + realtime sides both planned


def test_sink_commit_writes_manifest(spark, tmp_path):
    """The Spark sink's commit merges task-computed stats into the manifest
    — a sink-written table plans O(1) with no extra scan ever happening."""
    import pandas as pd

    out = str(tmp_path / "sunk_OFFLINE")
    df = spark.createDataFrame(
        pd.DataFrame(
            {"k": np.arange(100, dtype=np.int64), "s": [f"x{i}" for i in range(100)]}
        )
    ).repartition(2)
    from datafusion_pinot_spark.sources.pinot_datasource import PinotDataSource

    spark.dataSource.register(PinotDataSource)
    df.write.format("pinot").option("table", "sunk").mode("append").save(out)

    segs = M.load_manifest(out)
    assert segs is not None and len(segs) >= 1
    assert sum(s["total_docs"] for s in segs.values()) == 100
    ks = [s["columns"]["k"] for s in segs.values()]
    assert min(c["min"] for c in ks) == 0 and max(c["max"] for c in ks) == 99
    assert all(c["dtype"] == "LONG" and c["has_nulls"] is False for c in ks)


def test_fingerprint_stat_cache_and_cross_process_detection(table_dir):
    """The per-process fingerprint cache: unchanged (size, mtime_ns) skips
    the re-read+md5 entirely; a fresh process (empty cache) still detects
    an mtime-preserving same-size replacement via the content hash."""
    import builtins

    v3 = os.path.join(table_dir, "seg0", "v3")
    meta = os.path.join(v3, "metadata.properties")
    M._FP_CACHE.clear()
    fp1 = M._fingerprint(v3)
    assert fp1 is not None and len(fp1) == 3

    # cache hit: the file is never opened again while stat is unchanged
    real_open = builtins.open

    def explode(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("cache miss re-opened metadata.properties")

    try:
        builtins.open = explode
        assert M._fingerprint(v3) == fp1
    finally:
        builtins.open = real_open

    # cp -p style replacement: same size, same mtime_ns, different bytes
    st = os.stat(meta)
    content = bytearray(real_open(meta, "rb").read())
    content[-1] = (content[-1] + 1) % 256
    with real_open(meta, "wb") as f:
        f.write(bytes(content))
    os.utime(meta, ns=(st.st_atime_ns, st.st_mtime_ns))
    M._FP_CACHE.clear()  # = a fresh driver process
    fp2 = M._fingerprint(v3)
    assert fp2[:2] == fp1[:2]  # stat pair identical...
    assert fp2[2] != fp1[2]  # ...but the content hash catches it


def test_manifest_records_mv_columns(tmp_path):
    """r11: MV columns get a stats-free manifest entry (dtype, nullability,
    is_single_value=False, no min/max) so schema() answers the full column
    census — including evolution NULL-fill nullability — from the one
    manifest read instead of per-segment metadata parses."""
    from pinot_segment.manifest import load_manifest, refresh_manifest
    from pinot_segment.metadata import DataType
    from pinot_segment.writer import ColumnSpec, write_segment

    table = tmp_path / "mv_OFFLINE"
    write_segment(
        str(table / "s0"), "s0", "t",
        [
            ColumnSpec("k", DataType.LONG, [1, 2]),
            ColumnSpec(
                "tags", DataType.STRING, [["a", "b"], ["c"]], multi_value=True
            ),
        ],
    )
    refresh_manifest(str(table))
    m = load_manifest(str(table))
    [entry] = m.values()  # one segment
    cols = entry["columns"]
    assert "tags" in cols
    assert cols["tags"]["is_single_value"] is False
    assert "min" not in cols["tags"]
    assert "has_nulls" in cols["tags"]
    # SV entries unchanged: no is_single_value key, min/max present
    assert "is_single_value" not in cols["k"]
    assert "min" in cols["k"]

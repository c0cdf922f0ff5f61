"""Z-order layout: interleave correctness and the multi-dimensional
zone-map pruning proof (Spark-free — segments written directly, pruning
exercised through the planner's partitions())."""

import numpy as np
import pytest

from pinot_segment import manifest as M
from pinot_segment.metadata import DataType
from pinot_segment.writer import ColumnSpec, write_segment


def _pyz(a, b, bits=8):
    z = np.zeros_like(a, dtype=np.int64)
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_python_interleave(spark):
    from datafusion_pinot_spark.functions import zorder_key

    rng = np.random.RandomState(7)
    a = rng.randint(0, 256, 64).astype(np.int64)
    b = rng.randint(0, 256, 64).astype(np.int64)
    df = spark.createDataFrame(
        [(int(x), int(y)) for x, y in zip(a, b)], "a long, b long"
    )
    got = [
        r["z"]
        for r in df.select(zorder_key(["a", "b"]).alias("z"))
        .collect()
    ]
    assert got == _pyz(a, b).tolist()


def test_zorder_key_rejects_long_overflow():
    from datafusion_pinot_spark.functions import zorder_key

    with pytest.raises(ValueError):
        zorder_key(["a", "b"], bits=32)


def _write_layout(root, order_key, n_segs=16):
    """64x64 (a, b) grid, 4096 rows, split into n_segs segments along
    order_key's sort order."""
    aa, bb = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    a, b = aa.ravel().astype(np.int64), bb.ravel().astype(np.int64)
    key = order_key(a, b)
    idx = np.argsort(key, kind="stable")
    a, b = a[idx], b[idx]
    table_dir = root
    per = len(a) // n_segs
    for i in range(n_segs):
        sl = slice(i * per, (i + 1) * per)
        write_segment(
            table_dir / f"seg{i}",
            f"seg{i}",
            "t",
            [
                ColumnSpec("a", DataType.LONG, a[sl]),
                ColumnSpec("b", DataType.LONG, b[sl]),
            ],
        )
    M.write_manifest(str(table_dir), M.build_manifest(str(table_dir)))
    return str(table_dir)


def _survivors(table_dir, filters):
    import os

    from pyspark.sql.types import LongType, StructField, StructType

    from datafusion_pinot_spark.sources import pinot_datasource as ds

    segs = sorted(
        os.path.join(table_dir, d, "v3")
        for d in os.listdir(table_dir)
        if os.path.isdir(os.path.join(table_dir, d, "v3"))
    )
    schema = StructType(
        [StructField("a", LongType()), StructField("b", LongType())]
    )
    reader = ds.PinotDataSourceReader(schema, segs)
    list(reader.pushFilters(filters))
    parts = reader.partitions()
    return sum(len(p.segment_dirs) for p in parts)


def test_zorder_prunes_second_dimension(tmp_path):
    """A predicate on the SECOND dimension only: the a-sorted linear
    layout prunes nothing (every segment spans all of b), while the
    z-order layout prunes to the segments whose b-block intersects —
    and a first-dimension predicate still prunes on both layouts."""
    from datafusion_pinot_spark.sources import pinot_datasource as ds

    lin = _write_layout(tmp_path / "lin_OFFLINE", lambda a, b: a * 64 + b)
    zed = _write_layout(tmp_path / "z_OFFLINE", _pyz)

    # grid domain is 0..63; 16 z-segments tile it into exact 16x16
    # (a-quarter, b-quarter) blocks of 256 rows each
    b_box = [
        ds.GreaterThanOrEqual(("b",), 24),
        ds.LessThanOrEqual(("b",), 27),
    ]
    lin_surv = _survivors(lin, b_box)
    z_surv = _survivors(zed, b_box)
    assert lin_surv == 16  # linear layout: no pruning on dim 2
    assert z_surv == 4  # z layout: only the b-quarter 16..31 blocks
    # first-dimension predicate: both layouts prune
    a_box = [
        ds.GreaterThanOrEqual(("a",), 0),
        ds.LessThanOrEqual(("a",), 15),
    ]
    assert _survivors(lin, a_box) == 4
    assert _survivors(zed, a_box) == 4
    # 2D box: z-order intersects both dims down to one block
    box = a_box + b_box
    assert _survivors(zed, box) == 1
    assert _survivors(lin, box) == 4  # linear can only use dim 1
    # correctness guard: survivors must still contain every matching row
    # (checked end-to-end by the pinot_zorder_scan oracle query)

"""estimate_scan_cost: planning-time scan preview from the manifest —
correct pruning arithmetic, zero segment opens when the manifest is
fresh. Spark-free (no session, no job)."""

import os

import numpy as np
import pytest

from pinot_segment import manifest as M
from pinot_segment.metadata import DataType
from pinot_segment.segment_reader import SegmentReader
from pinot_segment.writer import ColumnSpec, write_segment


@pytest.fixture()
def table_dir(tmp_path):
    td = tmp_path / "t_OFFLINE"
    for i in range(4):
        lo = i * 1000
        write_segment(
            td / f"seg{i}",
            f"seg{i}",
            "t",
            [
                ColumnSpec("k", DataType.LONG, np.arange(lo, lo + 100)),
                ColumnSpec(
                    "s", DataType.STRING, [f"x{j:03d}" for j in range(100)]
                ),
            ],
        )
    M.write_manifest(str(td), M.build_manifest(str(td)))
    return str(td)


def test_estimate_prunes_and_counts(table_dir):
    from datafusion_pinot_spark.catalog import estimate_scan_cost

    full = estimate_scan_cost(table_dir)
    assert full["n_segments"] == 4
    assert full["n_survivors"] == 4
    assert full["est_rows"] == 400
    assert full["est_bytes"] > 0
    assert full["pruned_pct"] == 0

    # k >= 2500: seg2 spans [2000, 2099] (max < 2500) so only seg3
    # [3000, 3099] survives
    one = estimate_scan_cost(table_dir, filters=[("k", ">=", 2500)])
    assert one["n_survivors"] == 1
    assert one["est_rows"] == 100
    assert one["pruned_pct"] == 75

    # IN probe across two segments
    two = estimate_scan_cost(table_dir, filters=[("k", "in", [5, 3001])])
    assert two["n_survivors"] == 2
    assert two["est_rows"] == 200

    # projection scales the byte estimate down
    proj = estimate_scan_cost(table_dir, columns=["k"])
    assert 0 < proj["est_bytes"] < full["est_bytes"]


def test_estimate_zero_opens_with_fresh_manifest(table_dir, monkeypatch):
    from datafusion_pinot_spark.catalog import estimate_scan_cost

    opened = []
    real_open = SegmentReader.open.__func__

    def counting_open(cls, seg_dir):
        opened.append(str(seg_dir))
        return real_open(cls, seg_dir)

    monkeypatch.setattr(SegmentReader, "open", classmethod(counting_open))
    out = estimate_scan_cost(table_dir, filters=[("k", "<", 500)])
    assert out["n_survivors"] == 1
    assert opened == []  # manifest answered everything


def test_estimate_empty_table(tmp_path):
    from datafusion_pinot_spark.catalog import estimate_scan_cost

    td = tmp_path / "e_OFFLINE"
    os.makedirs(td)
    out = estimate_scan_cost(str(td))
    assert out == {
        "n_segments": 0,
        "n_survivors": 0,
        "est_rows": 0,
        "est_bytes": 0,
        "pruned_pct": 0,
    }


def test_estimate_without_manifest_still_counts_rows(tmp_path):
    """Stale/missing manifest: survivors must still report their true row
    volume (a silent est_rows=0 would admit the very scan the preview
    exists to reject), flagged via stale_segments."""
    from datafusion_pinot_spark.catalog import estimate_scan_cost

    td = tmp_path / "s_OFFLINE"
    for i in range(2):
        write_segment(
            td / f"seg{i}",
            f"seg{i}",
            "s",
            [ColumnSpec("k", DataType.LONG, np.arange(i * 10, i * 10 + 10))],
        )
    out = estimate_scan_cost(str(td), filters=[("k", ">=", 0)])
    assert out["n_survivors"] == 2
    assert out["est_rows"] == 20
    assert out["stale_segments"] == 2

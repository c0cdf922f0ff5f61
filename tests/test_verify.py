"""Segment integrity verifier: healthy segments report nothing; each
corruption class is detected at the right layer."""

import os
import shutil

import numpy as np
import pytest

from pinot_segment.metadata import DataType
from pinot_segment.verify import verify_segment, verify_table
from pinot_segment.writer import ColumnSpec, write_segment


@pytest.fixture()
def seg(tmp_path):
    return str(
        write_segment(
            tmp_path / "seg0",
            "seg0",
            "t",
            [
                ColumnSpec("k", DataType.LONG, np.arange(100)),
                ColumnSpec(
                    "s", DataType.STRING, [f"v{i:03d}" for i in range(100)]
                ),
                ColumnSpec(
                    "mods", DataType.INT, [[i % 3] for i in range(100)],
                    multi_value=True, inverted=True,
                ),
            ],
        )
    )


def test_healthy_segment_is_clean(seg):
    assert verify_segment(seg) == []


def test_missing_file_detected(seg):
    os.remove(os.path.join(seg, "index_map"))
    assert any("index_map" in f for f in verify_segment(seg))


def test_truncated_psf_detected(seg):
    p = os.path.join(seg, "columns.psf")
    size = os.path.getsize(p)
    with open(p, "rb+") as f:
        f.truncate(size - 64)
    finds = verify_segment(seg)
    assert any("exceeds columns.psf" in f for f in finds)


def test_corrupt_dictionary_magic_detected(seg):
    # smash the first dictionary's magic bytes
    from pinot_segment.index_map import IndexMap

    imap = IndexMap.from_file(os.path.join(seg, "index_map"))
    loc = imap.get_index("k", "dictionary")
    with open(os.path.join(seg, "columns.psf"), "rb+") as f:
        f.seek(loc.start_offset)
        f.write(b"\x00" * 8)
    finds = verify_segment(seg)
    assert any("bad dictionary magic" in f for f in finds)


def test_declared_index_without_entry_detected(seg):
    # drop the inverted_index lines from index_map while metadata still
    # declares hasInvertedIndex
    p = os.path.join(seg, "index_map")
    lines = [
        l for l in open(p).read().splitlines() if "inverted_index" not in l
    ]
    open(p, "w").write("\n".join(lines) + "\n")
    finds = verify_segment(seg)
    assert any("hasInvertedIndex but no inverted_index" in f for f in finds)


def test_verify_table_flags_stale_manifest(tmp_path, seg):
    table = tmp_path / "t_OFFLINE"
    os.makedirs(table)
    shutil.copytree(os.path.dirname(seg), table / "seg0")
    out = verify_table(str(table))
    segs = [k for k in out if k != "<manifest>"]
    assert len(segs) == 1 and out[segs[0]] == []
    assert "<manifest>" in out  # no segment_stats.json written

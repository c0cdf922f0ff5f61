"""Byte-identity of the compaction Arrow text path (r14 optimization).

``pinot_segment.compact`` moves single-value null-free STRING/BYTES
columns from reader to writer as Arrow arrays (no per-value Python
objects). These tests pin that the produced segments are byte-for-byte
identical to the historical read_column list path, across merge, filter
and reindex, for dictionary and RAW encodings, with indexes, nullable
and multi-value columns present as fallback exercisers.
"""

import numpy as np
import pytest

import pinot_segment.compact as compact
from pinot_segment.metadata import DataType
from pinot_segment.var_byte import LZ4_LENGTH_PREFIXED
from pinot_segment.writer import ColumnSpec, write_segment

N = 2000


def _member(tmp_path, i):
    rng = np.random.RandomState(i)
    strs = [f"val_{rng.randint(0, 150)}" for _ in range(N)]
    raws = ["x" * rng.randint(0, 40) + str(j) for j in range(N)]
    byts = [
        bytes(rng.randint(0, 256, rng.randint(1, 24), dtype=np.uint8).tolist())
        for _ in range(N)
    ]
    nulls = rng.rand(N) < 0.1
    nstrs = ["FILL" if m else s for s, m in zip(strs, nulls)]
    key = np.sort(rng.randint(i * 10_000, (i + 1) * 10_000, N)).astype(np.int64)
    specs = [
        ColumnSpec("key", DataType.LONG, key),
        ColumnSpec("dstr", DataType.STRING, strs, inverted=True, bloom=True),
        ColumnSpec(
            "rstr",
            DataType.STRING,
            raws,
            raw=True,
            compression=LZ4_LENGTH_PREFIXED,
        ),
        ColumnSpec(
            "b", DataType.BYTES, byts, raw=True, compression=LZ4_LENGTH_PREFIXED
        ),
        ColumnSpec("nstr", DataType.STRING, nstrs, null_mask=nulls),
        ColumnSpec(
            "mvs",
            DataType.STRING,
            [[f"t{j % 7}", f"u{j % 3}"] for j in range(N)],
            multi_value=True,
        ),
    ]
    return str(write_segment(tmp_path / f"m{i}", f"seg_{i}", "tbl", specs))


@pytest.fixture()
def members(tmp_path):
    return [_member(tmp_path, i) for i in range(3)]


def _assert_identical(a, b):
    from pathlib import Path

    fa, fb = Path(a), Path(b)
    names_a = sorted(p.name for p in fa.iterdir())
    names_b = sorted(p.name for p in fb.iterdir())
    assert names_a == names_b
    for name in names_a:
        assert (fa / name).read_bytes() == (fb / name).read_bytes(), name


def _ab(monkeypatch, fn):
    monkeypatch.setattr(compact, "_ARROW_TEXT", True)
    arrow = fn("arrow")
    monkeypatch.setattr(compact, "_ARROW_TEXT", False)
    listp = fn("list")
    _assert_identical(arrow, listp)


def test_merge_arrow_matches_list_path(tmp_path, members, monkeypatch):
    _ab(
        monkeypatch,
        lambda tag: compact.merge_segments(
            members, tmp_path / tag / "m", "merged", "tbl"
        ),
    )


def test_filter_arrow_matches_list_path(tmp_path, members, monkeypatch):
    mask = np.zeros(N, dtype=bool)
    mask[::3] = True
    _ab(
        monkeypatch,
        lambda tag: compact.filter_segment(
            members[0], tmp_path / tag / "f", "filt", "tbl", mask
        ),
    )


def test_reindex_arrow_matches_list_path(tmp_path, members, monkeypatch):
    _ab(
        monkeypatch,
        lambda tag: compact.reindex_segment(
            members[1], tmp_path / tag / "r", "re", "tbl", "dstr", "text"
        ),
    )


def test_rollup_keeps_list_path(tmp_path, monkeypatch):
    """rollup/keep_latest operate on pandas frames; the Arrow fast path
    must not engage there (gated in merge_segments)."""
    specs = [
        ColumnSpec("d", DataType.STRING, ["a", "b", "a", "b"]),
        ColumnSpec("m", DataType.LONG, np.array([1, 2, 3, 4], dtype=np.int64)),
    ]
    mem = str(write_segment(tmp_path / "m0", "s0", "tbl", specs))

    def boom(*args, **kwargs):  # pragma: no cover - failure path
        raise AssertionError("Arrow path must not be used under rollup")

    monkeypatch.setattr(compact, "_text_arrow", boom)
    out = compact.merge_segments(
        [mem],
        tmp_path / "out",
        "rolled",
        "tbl",
        rollup=(["d"], {"m": "sum"}),
    )
    from pinot_segment.segment_reader import SegmentReader

    r = SegmentReader.open(out)
    assert r.read_column("d") == ["a", "b"]
    assert r.read_column("m").tolist() == [4, 6]


def test_merge_overflow_cap_falls_back_to_list_path(
    tmp_path, members, monkeypatch
):
    """r15 (ADVICE r14): merged text columns whose Arrow pieces would
    exceed the 32-bit offset cap take the list path — same bytes out."""
    monkeypatch.setattr(compact, "_ARROW_TEXT_MAX_BYTES", 1)  # force it
    capped = compact.merge_segments(
        members, tmp_path / "capped" / "m", "merged", "tbl"
    )
    monkeypatch.setattr(compact, "_ARROW_TEXT", False)
    listp = compact.merge_segments(
        members, tmp_path / "list2" / "m", "merged", "tbl"
    )
    _assert_identical(capped, listp)


def test_merge_nullable_late_member_skips_all_arrow_decodes(
    tmp_path, monkeypatch
):
    """r15 (ADVICE r14): the metadata gate runs across ALL members before
    any Arrow decode — a column that is null-free in member 0 but
    nullable in member 1 triggers ZERO read_columns_arrow calls (the old
    code decoded member 0 in full, then discarded it)."""
    rng = np.random.RandomState(99)

    def member(tag, nullable):
        strs = [f"val_{rng.randint(0, 150)}" for _ in range(N)]
        return write_segment(
            tmp_path / tag,
            f"seg_{tag}",
            "tbl",
            [
                ColumnSpec(
                    "key",
                    DataType.LONG,
                    np.arange(30_000, 30_000 + N, dtype=np.int64),
                ),
                ColumnSpec(
                    "dstr",
                    DataType.STRING,
                    strs,
                    null_mask=(rng.rand(N) < 0.1) if nullable else None,
                ),
                ColumnSpec(
                    "always",
                    DataType.STRING,
                    [f"a{j % 7}" for j in range(N)],
                ),
            ],
        )

    m0 = member("nf", nullable=False)
    m1 = member("nu", nullable=True)

    from pinot_segment.segment_reader import SegmentReader

    calls = []
    real = SegmentReader.read_columns_arrow

    def counting(self, names, selection=None):
        calls.extend(names)
        return real(self, names, selection=selection)

    monkeypatch.setattr(SegmentReader, "read_columns_arrow", counting)
    compact.merge_segments(
        [m0, m1], tmp_path / "mixmerge" / "m", "merged", "tbl"
    )
    assert "dstr" not in calls  # nullable in ONE member -> zero decodes
    assert calls.count("always") == 2  # eligible column still fast-paths

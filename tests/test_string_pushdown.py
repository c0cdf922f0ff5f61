"""String-predicate pushdown (LIKE 'p%' / '%s' / '%c%'): dictionary-
accelerated masks, prefix zone-map pruning, sorted prefix ranges, and
end-to-end SQL semantics through the source."""

import numpy as np
import pytest

from pinot_segment import SegmentReader, manifest as M
from pinot_segment.metadata import DataType
from pinot_segment.writer import ColumnSpec, write_segment


@pytest.fixture()
def seg(tmp_path):
    langs = ["en", "enx", "de", "fr", "es", "en", "zh", "de"]
    return SegmentReader.open(
        write_segment(
            tmp_path / "s",
            "s",
            "t",
            [
                ColumnSpec("lang", DataType.STRING, langs),
                ColumnSpec(
                    "raw_s", DataType.STRING, langs, raw=True
                ),
            ],
        )
    )


def test_dict_string_predicate_masks(seg):
    np.testing.assert_array_equal(
        seg.string_predicate_mask("lang", "startswith", "en"),
        [True, True, False, False, False, True, False, False],
    )
    np.testing.assert_array_equal(
        seg.string_predicate_mask("lang", "endswith", "x"),
        [False, True, False, False, False, False, False, False],
    )
    np.testing.assert_array_equal(
        seg.string_predicate_mask("lang", "contains", "e"),
        [True, True, True, False, True, True, False, True],
    )
    # no dictionary value matches → all-False without touching ids
    assert not seg.string_predicate_mask("lang", "startswith", "qq").any()
    # RAW strings have no dictionary: caller falls back
    assert seg.string_predicate_mask("raw_s", "startswith", "en") is None


def test_prefix_upper_and_prune():
    from datafusion_pinot_spark.sources.pinot_datasource import (
        _prefix_upper,
        _startswith_pruned,
    )

    assert _prefix_upper("en") == "eo"
    assert _prefix_upper("a\U0010ffff") == "b"  # skip non-incrementable tail
    assert _prefix_upper("\U0010ffff") is None
    # [min, max] = [src0, src19]: 'web' misses, 'src1' intersects
    assert _startswith_pruned("web", "src0", "src19")
    assert not _startswith_pruned("src1", "src0", "src19")
    assert _startswith_pruned("aa", "src0", "src19")  # below the range


def test_sorted_prefix_range(tmp_path):
    vals = sorted(["alpha", "alpine", "beta", "betae", "gamma", "delta"])
    r = SegmentReader.open(
        write_segment(
            tmp_path / "s",
            "s",
            "t",
            [ColumnSpec("w", DataType.STRING, vals)],
        )
    )
    from datafusion_pinot_spark.sources.pinot_datasource import (
        StringStartsWith,
        _sorted_row_range,
    )

    rng = _sorted_row_range(r, [StringStartsWith(("w",), "bet")])
    assert rng is not None
    lo, hi = rng
    assert [vals[i] for i in range(lo, hi)] == ["beta", "betae"]


def test_string_pushdown_end_to_end(spark, tmp_path):
    from datafusion_pinot_spark.sources import register_pinot_source

    register_pinot_source(spark)
    out = str(tmp_path / "tbl_OFFLINE")
    rows = [
        (1, "src0"),
        (2, "src1"),
        (3, "src10"),
        (4, "src19"),
        (5, "other"),
        (6, None),
    ]
    spark.createDataFrame(rows, "k long, source string").coalesce(
        2
    ).write.format("pinot").mode("overwrite").save(out)

    def q(pred):
        return {
            r["k"]
            for r in spark.read.format("pinot")
            .load(out)
            .filter(pred)
            .collect()
        }

    assert q("source LIKE 'src1%'") == {2, 3, 4}
    assert q("source LIKE '%9'") == {4}
    assert q("source LIKE '%the%'") == {5}
    # NULL never matches a string predicate (SQL 3VL)
    assert q("source LIKE '%'") == {1, 2, 3, 4, 5}


def test_prefix_zone_map_prunes_at_planning(tmp_path, monkeypatch):
    """A pushed LIKE 'prefix%' prunes segments whose string min/max miss
    [prefix, prefix_upper) — from the manifest, zero opens."""
    from pyspark.sql.types import StringType, StructField, StructType

    from datafusion_pinot_spark.sources import pinot_datasource as ds

    table = tmp_path / "t_OFFLINE"
    for name, words in (
        ("s0", ["apple", "apricot"]),
        ("s1", ["banana", "blueberry"]),
        ("s2", ["cherry", "citron"]),
    ):
        write_segment(
            table / name,
            name,
            "t",
            [ColumnSpec("w", DataType.STRING, words)],
        )
    M.write_manifest(str(table), M.build_manifest(str(table)))
    segs = [str(table / f"s{i}" / "v3") for i in range(3)]

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
        StructType([StructField("w", StringType())]), segs
    )
    list(reader.pushFilters([ds.StringStartsWith(("w",), "b")]))
    kept = [d for p in reader.partitions() for d in p.segment_dirs]
    assert opened == []
    assert kept == [segs[1]]


def test_not_and_null_safe_pushdown(spark, tmp_path):
    """NOT over pushed predicates and <=> follow SQL 3VL through the
    source: NOT excludes NULL rows (NOT(x=v) is NULL on NULL), <=> NULL
    is IS NULL, and NOT LIKE works against the dictionary."""
    from datafusion_pinot_spark.sources import register_pinot_source

    register_pinot_source(spark)
    out = str(tmp_path / "tbl_OFFLINE")
    rows = [
        (1, "apple", 10),
        (2, "banana", 20),
        (3, None, 30),
        (4, "cherry", None),
        (5, "apricot", 50),
    ]
    spark.createDataFrame(rows, "k long, w string, v int").coalesce(
        1
    ).write.format("pinot").mode("overwrite").save(out)

    def q(pred):
        return {
            r["k"]
            for r in spark.read.format("pinot")
            .load(out)
            .filter(pred)
            .collect()
        }

    assert q("w != 'apple'") == {2, 4, 5}  # NULL w excluded (3VL)
    assert q("NOT (v > 15)") == {1}  # NULL v excluded
    assert q("w NOT LIKE 'ap%'") == {2, 4}
    assert q("NOT (w IN ('apple', 'banana'))") == {4, 5}
    assert q("w <=> NULL") == {3}
    assert q("v <=> 20") == {2}
    assert q("NOT (w IS NULL)") == {1, 2, 4, 5}


def test_nul_characters_are_exact(tmp_path):
    """numpy '<U' arrays strip trailing U+0000 and treat NUL patterns as
    padding — the predicate paths must not inherit that (the writer
    already dodges it for dict-id mapping)."""
    vals = ["a\x00", "a", "\x00b", "b"]
    r = SegmentReader.open(
        write_segment(
            tmp_path / "s",
            "s",
            "t",
            [ColumnSpec("w", DataType.STRING, vals)],
        )
    )
    got = r.string_predicate_mask("w", "startswith", "\x00")
    assert got.tolist() == [v.startswith("\x00") for v in vals]
    got = r.string_predicate_mask("w", "endswith", "\x00")
    assert got.tolist() == [v.endswith("\x00") for v in vals]
    got = r.string_predicate_mask("w", "contains", "\x00")
    assert got.tolist() == [("\x00" in v) for v in vals]
    # plain pattern over NUL-bearing values stays exact too
    got = r.string_predicate_mask("w", "endswith", "a")
    assert got.tolist() == [v.endswith("a") for v in vals]


def test_dict_match_mask_id_space_equality(tmp_path):
    vals = ["a\x00", "a", "b", "a", "c"]
    nums = [5, 3, 5, 7, 3]
    r = SegmentReader.open(
        write_segment(
            tmp_path / "s",
            "s",
            "t",
            [
                ColumnSpec("w", DataType.STRING, vals),
                ColumnSpec("n", DataType.INT, nums),
            ],
        )
    )
    # NUL-exact: 'a' must not match 'a\x00' and vice versa
    assert r.dict_match_mask("w", ["a"]).tolist() == [
        False, True, False, True, False,
    ]
    assert r.dict_match_mask("w", ["a\x00"]).tolist() == [
        True, False, False, False, False,
    ]
    assert r.dict_match_mask("w", ["zz"]).tolist() == [False] * 5
    assert r.dict_match_mask("n", [5, 3]).tolist() == [
        True, True, True, False, True,
    ]


def test_string_filters_fully_consumed_in_plan(spark, tmp_path):
    """Pushed LIKE / NOT / <=> predicates are consumed by the source: the
    optimized plan over the pinot scan carries no residual Filter node
    (a yielded-back filter would reappear above the scan)."""
    from pyspark.sql import functions as F

    from datafusion_pinot_spark.sources import register_pinot_source

    register_pinot_source(spark)
    out = str(tmp_path / "tbl_OFFLINE")
    spark.createDataFrame(
        [(1, "apple"), (2, "banana")], "k long, w string"
    ).coalesce(1).write.format("pinot").mode("overwrite").save(out)

    for cond in (
        F.col("w").startswith("ap"),
        F.col("w").contains("an"),
        F.col("w").endswith("na"),
        F.col("w") != "apple",
        ~F.col("w").isin("apple", "pear"),
        F.col("w").eqNullSafe("banana"),
    ):
        df = spark.read.format("pinot").load(out).filter(cond)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "Filter" not in plan, plan

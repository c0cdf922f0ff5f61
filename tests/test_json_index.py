"""JSON index: flattening contract, postings probe, datasource e2e
(indexed == fallback == DuckDB), and validation."""

import os
import tempfile

import numpy as np
import pytest

from pinot_segment import SegmentReader
from pinot_segment.json_index import JsonIndex, build_json_index, flatten_json
from pinot_segment.metadata import DataType
from pinot_segment.writer import ColumnSpec, write_segment


def test_flattening_contract():
    assert flatten_json('{"k": 87}') == ["$.k=87"]
    assert flatten_json('{"a": {"b": 1, "c": "x"}}') == ["$.a.b=1", "$.a.c=x"]
    assert sorted(flatten_json('{"t": ["x", "y"]}')) == ["$.t[*]=x", "$.t[*]=y"]
    assert flatten_json('{"o": [{"id": 3}]}') == ["$.o[*].id=3"]
    assert flatten_json('{"b": true, "f": 1.5}') == ["$.b=true", "$.f=1.5"]
    assert flatten_json('{"n": null}') == []  # null not indexed
    assert flatten_json("not json {") == []
    assert flatten_json('"bare string"') == []  # only objects/arrays
    # int and float canonicalize differently, as JSON distinguishes them
    assert flatten_json('{"v": 87}') != flatten_json('{"v": 87.0}')


def test_build_and_probe():
    vals = ['{"k": 1}', '{"k": 2, "tag": "a"}', '{"k": 1, "nested": {"k": 9}}']
    ji = JsonIndex(build_json_index(vals), len(vals))
    assert list(ji.path_value_mask("$.k", "1")) == [True, False, True]
    assert list(ji.path_value_mask("$.nested.k", "9")) == [False, False, True]
    assert not ji.path_value_mask("$.k", "99").any()
    assert not ji.path_value_mask("$.missing", "1").any()


def test_null_and_malformed_docs_never_match():
    vals = ['{"k": 5}', '{"k": 5}', "garbage"]
    nulls = np.array([False, True, False])
    v3 = write_segment(
        tempfile.mkdtemp(),
        "s",
        "t",
        [ColumnSpec("j", DataType.STRING, vals, json_index=True, null_mask=nulls)],
    )
    r = SegmentReader.open(str(v3))
    assert list(r.json_match_mask("j", "$.k", "5")) == [True, False, False]


def test_no_index_returns_none_and_validation():
    v3 = write_segment(
        tempfile.mkdtemp(),
        "s",
        "t",
        [ColumnSpec("j", DataType.STRING, ['{"k":1}'])],
    )
    assert SegmentReader.open(str(v3)).json_match_mask("j", "$.k", "1") is None
    with pytest.raises(ValueError, match="STRING"):
        ColumnSpec("n", DataType.INT, [1], json_index=True)


def test_merge_preserves_json_index(tmp_path):
    from pinot_segment.compact import merge_segments

    a = write_segment(
        tmp_path / "a",
        "a",
        "t",
        [ColumnSpec("j", DataType.STRING, ['{"k": 1}'], json_index=True)],
    )
    b = write_segment(
        tmp_path / "b",
        "b",
        "t",
        [ColumnSpec("j", DataType.STRING, ['{"k": 2}'])],
    )
    v3 = merge_segments([str(a), str(b)], tmp_path / "m", "m", "t")
    r = SegmentReader.open(str(v3))
    assert r.metadata.get_column("j").has_json_index
    assert list(r.json_match_mask("j", "$.k", "2")) == [False, True]


def test_datasource_indexed_equals_fallback(spark):
    from datafusion_pinot_spark.sources import register_pinot_source

    register_pinot_source(spark)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "event_type", "props"
    )
    indexed = os.path.join(tempfile.mkdtemp(), "ji_OFFLINE")
    plain = os.path.join(tempfile.mkdtemp(), "jp_OFFLINE")
    w = ev.repartition(4).write.format("pinot").mode("overwrite").option(
        "raw", "props"
    )
    w.option("json_index", "props").save(indexed)
    w.save(plain)

    def probe(path):
        return sorted(
            r["event_id"]
            for r in spark.read.format("pinot")
            .option("json_match", "props:$.k=42")
            .load(path)
            .collect()
        )

    got = probe(indexed)
    assert got == probe(plain)
    import duckdb

    truth = sorted(
        r[0]
        for r in duckdb.sql(
            "SELECT event_id FROM '/root/testdata/sf0.001/events.parquet' "
            "WHERE json_extract_string(props, '$.k') = '42'"
        ).fetchall()
    )
    assert got == truth and len(got) > 0


def test_datasource_json_match_option_validation(spark):
    from datafusion_pinot_spark.sources import register_pinot_source

    register_pinot_source(spark)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "props"
    )
    out = os.path.join(tempfile.mkdtemp(), "jv_OFFLINE")
    ev.limit(10).write.format("pinot").mode("overwrite").save(out)
    with pytest.raises(Exception):
        spark.read.format("pinot").option("json_match", "props:k=1").load(
            out
        ).collect()  # path must start with $
    with pytest.raises(Exception):
        spark.read.format("pinot").option(
            "json_match", "event_id:$.k=1"
        ).load(out).collect()  # non-STRING column

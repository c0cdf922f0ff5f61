"""Metadata parser tests — vectors ported from reference metadata.rs:248-292."""

import pytest

from pinot_segment.errors import ParseError
from pinot_segment.metadata import DataType, SegmentMetadata, decode_java_string

SIMPLE = """
segment.name=test_segment
segment.table.name=testTable
segment.total.docs=100
columns=col1,col2
column.col1.dataType=INT
column.col1.cardinality=10
column.col1.bitsPerElement=4
column.col1.hasDictionary=true
column.col1.isSorted=false
column.col2.dataType=STRING
column.col2.cardinality=50
column.col2.bitsPerElement=6
column.col2.hasDictionary=true
column.col2.isSorted=true
"""


def test_parse_simple_properties():
    md = SegmentMetadata.parse(SIMPLE)
    assert md.segment_name == "test_segment"
    assert md.table_name == "testTable"
    assert md.total_docs == 100
    assert len(md.columns) == 2

    col1 = md.get_column("col1")
    assert col1.data_type is DataType.INT
    assert col1.cardinality == 10
    assert col1.bits_per_element == 4
    assert col1.has_dictionary
    assert not col1.is_sorted

    col2 = md.get_column("col2")
    assert col2.data_type is DataType.STRING
    assert col2.is_sorted


def test_declared_column_order_is_preserved():
    # Deliberate deviation from the reference's HashMap order (SURVEY.md §4.3).
    md = SegmentMetadata.parse(SIMPLE)
    assert md.column_names() == ["col1", "col2"]


def test_v3_column_name_keys():
    content = """
segment.name=s
segment.table.name=t
segment.total.docs=5
segment.dimension.column.names=dim1
segment.metric.column.names=m1
segment.datetime.column.names=ts
column.dim1.dataType=STRING
column.m1.dataType=LONG
column.ts.dataType=LONG
"""
    md = SegmentMetadata.parse(content)
    assert md.column_names() == ["dim1", "m1", "ts"]


def test_missing_required_keys():
    with pytest.raises(ParseError):
        SegmentMetadata.parse("segment.table.name=t\nsegment.total.docs=1\n")
    with pytest.raises(ParseError):
        SegmentMetadata.parse("segment.name=s\nsegment.total.docs=1\n")
    with pytest.raises(ParseError):
        SegmentMetadata.parse("segment.name=s\nsegment.table.name=t\n")


def test_unknown_data_type():
    content = """
segment.name=s
segment.table.name=t
segment.total.docs=1
columns=c
column.c.dataType=WAT
"""
    with pytest.raises(ParseError):
        SegmentMetadata.parse(content)


def test_decode_unicode():
    # Vectors from metadata.rs:286-292.
    assert decode_java_string("hello") == "hello"
    assert decode_java_string("hello\\u0020world") == "hello world"
    assert decode_java_string("tab\\there") == "tab\there"
    assert decode_java_string("nl\\nhere") == "nl\nhere"
    assert decode_java_string("back\\\\slash") == "back\\slash"
    assert decode_java_string("bad\\uZZZZx") == "bad\\uZZZZx"

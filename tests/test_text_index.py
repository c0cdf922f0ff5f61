"""Text-match index: analyzer, postings layout, reader probe, datasource
e2e (indexed == fallback == engine recompute), and error paths."""

import os
import tempfile

import numpy as np
import pytest

from pinot_segment import SegmentReader
from pinot_segment.metadata import DataType
from pinot_segment.text_index import TextIndex, build_text_index, tokenize
from pinot_segment.writer import ColumnSpec, write_segment


def test_tokenizer_contract():
    assert tokenize("Spark-SQL joins FAST!") == ["spark", "sql", "joins", "fast"]
    assert tokenize("") == []
    assert tokenize("  ") == []
    assert tokenize("a1 b2　c3") == ["a1", "b2", "c3"]  # unicode space splits
    assert tokenize("naïve") == ["na", "ve"]  # ascii-alnum runs only


def test_build_and_probe_roundtrip():
    vals = ["spark join", "scan only", "JOIN spark scan", "join"]
    blob = build_text_index(vals)
    ti = TextIndex(blob, len(vals))
    assert ti.terms == ["join", "only", "scan", "spark"]
    assert list(ti.term_mask("spark")) == [True, False, True, False]
    assert list(ti.match_mask(["spark", "scan"])) == [False, False, True, False]
    assert list(ti.match_mask(["spark", "scan"], require_all=False)) == [
        True,
        True,
        True,
        False,
    ]
    assert not ti.term_mask("absent").any()
    with pytest.raises(ValueError):
        ti.match_mask([])


def test_null_docs_are_not_indexed_and_never_match():
    vals = ["spark", "spark", "x"]
    nulls = np.array([False, True, False])
    v3 = write_segment(
        tempfile.mkdtemp(),
        "s",
        "t",
        [ColumnSpec("txt", DataType.STRING, vals, text_index=True, null_mask=nulls)],
    )
    r = SegmentReader.open(str(v3))
    assert list(r.text_match_mask("txt", ["spark"])) == [True, False, False]


def test_raw_and_dict_columns_both_indexable():
    vals = ["alpha beta", "beta", "gamma alpha"]
    for raw in (False, True):
        v3 = write_segment(
            tempfile.mkdtemp(),
            "s",
            "t",
            [ColumnSpec("txt", DataType.STRING, vals, raw=raw, text_index=True)],
        )
        r = SegmentReader.open(str(v3))
        assert list(r.text_match_mask("txt", ["alpha"])) == [True, False, True]


def test_no_index_returns_none_and_spec_validation():
    v3 = write_segment(
        tempfile.mkdtemp(),
        "s",
        "t",
        [ColumnSpec("txt", DataType.STRING, ["a"], text_index=False)],
    )
    assert SegmentReader.open(str(v3)).text_match_mask("txt", ["a"]) is None
    with pytest.raises(ValueError, match="STRING"):
        ColumnSpec("n", DataType.INT, [1], text_index=True)
    with pytest.raises(ValueError, match="STRING"):
        ColumnSpec(
            "mv", DataType.STRING, [["a"]], multi_value=True, text_index=True
        )


@pytest.fixture(scope="module")
def doc_tables(spark):
    from datafusion_pinot_spark.sources import register_pinot_source

    register_pinot_source(spark)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    indexed = os.path.join(tempfile.mkdtemp(), "di_OFFLINE")
    plain = os.path.join(tempfile.mkdtemp(), "dp_OFFLINE")
    w = (
        docs.select("doc_id", "text", "lang")
        .repartition(4)
        .write.format("pinot")
        .mode("overwrite")
        .option("raw", "text")
    )
    w.option("text_index", "text").save(indexed)
    w.save(plain)
    return indexed, plain


def test_datasource_indexed_equals_fallback_equals_engine(spark, doc_tables):
    from pyspark.sql import functions as F

    indexed, plain = doc_tables

    def probe(path, **opts):
        r = spark.read.format("pinot").option("text_match", "text:spark scan")
        for k, v in opts.items():
            r = r.option(k, v)
        return sorted(
            (row["doc_id"], row["lang"]) for row in r.load(path).collect()
        )

    via_index = probe(indexed)
    via_fallback = probe(plain)
    # engine recompute with the same analyzer over the plain table
    toks = F.split(F.lower("text"), r"[^a-z0-9]+")
    engine = sorted(
        (row["doc_id"], row["lang"])
        for row in spark.read.format("pinot")
        .load(plain)
        .filter(F.array_contains(toks, "spark") & F.array_contains(toks, "scan"))
        .collect()
    )
    assert via_index == via_fallback == engine
    assert len(via_index) > 0
    any_index = probe(indexed, text_match_mode="any")
    assert set(via_index) <= set(any_index) and len(any_index) > len(via_index)


def test_datasource_text_match_composes_with_pushed_filters(spark, doc_tables):
    from pyspark.sql import functions as F

    indexed, _ = doc_tables
    df = (
        spark.read.format("pinot")
        .option("text_match", "text:spark")
        .load(indexed)
        .filter(F.col("lang") == "en")
    )
    toks = F.split(F.lower("text"), r"[^a-z0-9]+")
    expect = (
        spark.read.format("pinot")
        .load(indexed)
        .filter((F.col("lang") == "en") & F.array_contains(toks, "spark"))
        .count()
    )
    assert df.count() == expect > 0


def test_datasource_empty_projection_count_with_text_match(spark, doc_tables):
    indexed, _ = doc_tables
    n = (
        spark.read.format("pinot")
        .option("text_match", "text:spark")
        .option("columns", "")
        .load(indexed)
        .count()
    )
    full = (
        spark.read.format("pinot")
        .option("text_match", "text:spark")
        .load(indexed)
        .count()
    )
    assert n == full > 0


def test_datasource_text_match_option_validation(spark, doc_tables):
    indexed, _ = doc_tables
    with pytest.raises(Exception):
        spark.read.format("pinot").option("text_match", "nonsense").load(
            indexed
        ).collect()
    with pytest.raises(Exception):
        (
            spark.read.format("pinot")
            .option("text_match", "doc_id:5")
            .load(indexed)
            .collect()
        )  # non-STRING column
    with pytest.raises(Exception):
        (
            spark.read.format("pinot")
            .option("text_match", "text:spark")
            .option("text_match_mode", "sometimes")
            .load(indexed)
            .collect()
        )


def test_sink_rejects_text_index_on_non_string(spark):
    from pyspark.sql import functions as F

    df = spark.range(3).select(F.col("id").cast("long").alias("k"))
    out = os.path.join(tempfile.mkdtemp(), "bad_OFFLINE")
    with pytest.raises(Exception, match="STRING"):
        df.write.format("pinot").option("text_index", "k").mode(
            "overwrite"
        ).save(out)

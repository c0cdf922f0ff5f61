"""Oracle-tier tests: every registered query vs its DuckDB oracle at
sf0.001 — the same comparison the driver's correctness gate runs
(tools/oracle_check.py holds the shared normalization)."""

import os

import duckdb
import pytest

from tools.oracle_check import TABLES, norm_rows

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for tbl in TABLES:
        path = f"{SF_DIR}/{tbl}.parquet"
        if os.path.exists(path):
            con.sql(f"CREATE OR REPLACE VIEW {tbl} AS SELECT * FROM '{path}'")
    return con


def _query_names():
    from datafusion_pinot_spark.plans import QUERIES

    return list(QUERIES)


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, duck, name):
    from datafusion_pinot_spark.plans import QUERIES

    qdef = QUERIES[name]
    sdf = qdef.fn(spark, SF_DIR)
    scols, srows = sdf.columns, sdf.collect()

    if qdef.oracle is None:
        # rows-only contract: runs and yields a stable schema
        assert isinstance(scols, list) and len(scols) > 0
        return

    rel = duck.sql(qdef.oracle)
    dcols, drows = rel.columns, rel.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    assert norm_rows(scols, srows) == norm_rows(dcols, drows)

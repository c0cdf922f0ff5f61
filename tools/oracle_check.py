"""Local stand-in for the driver's correctness gate: run every query in
__spark_entry__.queries() against its oracle_sql() via DuckDB and compare
row count, column names, and order-insensitive values.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_value(v):
    if isinstance(v, Decimal):
        # EXACT comparison (r9 lesson: Decimal->float here hid a
        # driver-visible hash mismatch — a decimal(38,0) above 2^53
        # loses bits in float, so two values that differ by 1 ULP of
        # the engine's own decimal->double conversion normalized to
        # the same float and passed four local sweeps while failing
        # the driver's hash). Integral decimals compare as exact ints
        # (also unifies Decimal vs BIGINT column-type differences);
        # non-integral decimals compare via a canonical exact string.
        if v == v.to_integral_value():
            return int(v)
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm_value(x) for x in v)
    return v


def norm_rows(cols: list[str], rows) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_value(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from datafusion_pinot_spark.session import get_spark

    spark = get_spark(app_name="oracle_check", cpus=8, shuffle_partitions=8)

    con = duckdb.connect()
    for tbl in TABLES:
        path = f"{sf_dir}/{tbl}.parquet"
        if os.path.exists(path):
            con.sql(
                f"CREATE OR REPLACE VIEW {tbl} AS SELECT * FROM '{path}'"
            )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            drows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        if sorted(scols) != sorted(dcols):
            failures.append(name)
            print(f"FAIL {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            continue
        sn = norm_rows(scols, srows)
        dn = norm_rows(dcols, drows)
        if len(sn) != len(dn):
            print(f"FAIL {name}: rowcount spark={len(sn)} duck={len(dn)}")
            failures.append(name)
            continue
        if sn != dn:
            failures.append(name)
            diffs = [
                (a, b) for a, b in zip(sn, dn) if a != b
            ][:3]
            print(f"FAIL {name}: value mismatch; first diffs: {diffs}")
            continue
        print(f"ok   {name}: {len(sn)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

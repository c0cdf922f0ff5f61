"""Local stand-in for the driver's correctness gate: run every query in
__spark_entry__.queries() against its oracle_sql() via DuckDB and compare
row count, column names, and order-insensitive values.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import re
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

# Output-type contract (r10 verdict #2): registered queries may emit only
# these Spark dtypes (plus arrays of them, outside the driver window).
# Decimal is the headline ban — the ONLY Decimal-typed output column in the
# 278-query catalog was the only driver hash failure of rounds 9 AND 10,
# with values verified bit-identical: the driver's hash canonicalization of
# a Decimal cell differs between engines' client libraries, so the type must
# never cross the output boundary. Binary/struct/map are banned because the
# driver's pandas canonicalizer cannot sort/hash them.
# timestamp_ntz is ALSO banned (r11 verdict #6, a deliberate decision, not
# the regex accident it was in r11): no registered query emits it — the t()
# loader casts NTZ parquet reads to session-tz TIMESTAMP at the source —
# and whether the driver's canonicalizer hashes a Spark NTZ cell identically
# to DuckDB's naive TIMESTAMP is unverifiable from here, so a query that
# bypasses the loader and leaks NTZ should fail THIS lint loudly rather
# than gamble on the driver's hash.
ALLOWED_SPARK_BASE = re.compile(
    r"^(string|boolean|date|timestamp|tinyint|smallint|int|bigint"
    r"|float|double)$"
)


def lint_spark_schema(name: str, schema) -> list[str]:
    """Return a list of 'col:dtype' violations of the output-type contract.
    Arrays are unwrapped (an array<decimal(38,0)> is as unhashable to the
    driver as a bare decimal)."""
    bad = []
    for f in schema.fields:
        dt = f.dataType.simpleString()
        base = dt
        while base.startswith("array<") and base.endswith(">"):
            base = base[6:-1]
        if not ALLOWED_SPARK_BASE.match(base):
            bad.append(f"{f.name}:{dt}")
    return bad


def _type_class(v) -> str:
    """Engine-neutral type class of a result cell, for the cross-engine
    column-type consistency check. bool before int (bool is an int
    subclass); Decimal gets its own class so a DECIMAL-vs-DOUBLE column
    divergence fails loudly as a TYPE mismatch instead of surfacing as a
    confusing value/sort mismatch (r10 advice: norm_value unifies integral
    numerics for VALUE comparison, which made it structurally blind to the
    type-representation divergence a type-sensitive driver hash can see)."""
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, Decimal):
        return "decimal"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    if isinstance(v, datetime):
        return "datetime"
    if isinstance(v, date):
        return "date"
    if isinstance(v, (list, tuple)):
        return "list"
    return type(v).__name__


def column_type_classes(cols: list[str], rows) -> dict[str, str]:
    """First non-null type class per column ('null' if the column is all
    NULL in this sample)."""
    out = {c: "null" for c in cols}
    for r in rows:
        pending = False
        for i, c in enumerate(cols):
            if out[c] == "null":
                tc = _type_class(r[i])
                if tc != "null":
                    out[c] = tc
                else:
                    pending = True
        if not pending:
            break
    return out


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
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        r = round(v, 9)
        # Integral floats normalize to int, mirroring the Decimal rule
        # (r10 advice): otherwise a 2.0-vs-2 cell sorts as "2.0" vs "2"
        # and norm_rows can order the two sides differently, reporting a
        # spurious value mismatch for equal values. Cross-engine TYPE
        # divergence is still caught — loudly — by the type-class check.
        if r == int(r):
            return int(r)
        return r
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm_value(x) for x in v)
    return v


def _sort_key(x):
    """Order-safe homogeneous sort key for a NORMALIZED cell (r11 advice):
    norm_value can map a float column's cells to a mix of str ("NaN"/"Inf"),
    int (integral coercion), and float — a (class_rank, canonical_string)
    tuple keeps every pair comparable and, because both engines' rows pass
    through the same normalization, equal multisets sort identically. The
    string leg is repr (not str) so 2 and "2" cannot collide into the same
    key and sort by unstable input order."""
    if x is None:
        return (0, "")
    if isinstance(x, bool):
        return (1, repr(x))
    if isinstance(x, (int, float)):
        return (2, repr(x))
    if isinstance(x, str):
        return (3, x)
    return (4, repr(x))


def norm_rows(cols: list[str], rows) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_value(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple(_sort_key(x) for x in t))
    return out


def main() -> int:
    # flags may appear anywhere; everything else is [sf_dir, query...]
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    unknown = flags - {"--window"}
    if unknown:
        print(f"usage: oracle_check.py [sf_dir] [query ...] [--window]")
        print(f"unknown flag(s): {sorted(unknown)}")
        return 2
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])
    if "--window" in flags:
        # the exact 50 names the driver's gate hash-checks, in order
        from datafusion_pinot_spark.plans.queries import DRIVER_WINDOW

        only |= set(DRIVER_WINDOW)

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
            bad_types = lint_spark_schema(name, sdf.schema)
            if bad_types:
                failures.append(name)
                print(
                    f"FAIL {name}: output-type lint: {bad_types} — registered "
                    f"queries may emit only str/int/float/date/bool columns "
                    f"(Decimal cells are driver-hash-unsafe; see r10 verdict)"
                )
                continue
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
        stypes = column_type_classes(scols, srows)
        dtypes = column_type_classes(dcols, drows)
        type_mismatch = {
            c: (stypes[c], dtypes[c])
            for c in stypes
            if "null" not in (stypes[c], dtypes[c]) and stypes[c] != dtypes[c]
        }
        if type_mismatch:
            failures.append(name)
            print(
                f"FAIL {name}: cross-engine column type mismatch "
                f"{{col: (spark, duckdb)}}: {type_mismatch} — the driver's "
                f"hash is type-sensitive even when values are equal"
            )
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

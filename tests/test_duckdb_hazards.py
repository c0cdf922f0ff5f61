"""Regression guards for DuckDB wrong-result hazards the oracle tier
discovered.

DuckDB v1.0 evaluates list lambdas (list_reduce / list_transform) — and
list_resize with data-dependent sizes — INCORRECTLY when applied across
multiple rows whose lists have unequal lengths: results permute between
groups, dependent on process/scan order. Single rows, single-group
filters, and equal-length batches compute correctly, which let the bug
hide behind permutation-invariant aggregate outputs (histograms,
conversion counts) until the per-user streaming_funnel_totals hash
mismatch exposed it. Every funnel-family oracle therefore folds via a
recursive CTE (plain scalar expressions) or ordered string_agg — this
test pins the PER-USER values of those oracles against a transparent
pure-Python fold, so any reintroduction of the buggy pattern fails
loudly instead of permuting silently."""

import os

import duckdb
import pytest

SF_SMOKE = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_SMOKE), reason=f"testdata not present: {SF_SMOKE}"
)

STEPS = {"view": 1, "click": 2, "purchase": 3}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW events AS FROM read_parquet('{SF_SMOKE}/events.parquet')"
    )
    return c


@pytest.fixture(scope="module")
def python_truth(con):
    rows = con.execute(
        """SELECT user_id, epoch_us(ts) * 8 + CASE event_type
             WHEN 'view' THEN 1 WHEN 'click' THEN 2
             WHEN 'purchase' THEN 3 END
           FROM events
           WHERE event_type IN ('view','click','purchase')"""
    ).fetchall()
    by_u: dict = {}
    for u, e in rows:
        by_u.setdefault(u, []).append(e)
    out = {}
    for u, encs in by_u.items():
        acc = depth = 0
        for e in sorted(encs):
            s = e % 8
            if s == acc % 8 + 1:
                acc = acc + 6 if s == 3 else acc + 1
            if s == depth + 1:
                depth += 1
        out[u] = (acc // 8, acc % 8, depth)
    return out


def test_streaming_funnel_oracle_per_user_matches_python(con, python_truth):
    from datafusion_pinot_spark.plans.queries import QUERIES

    got = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            QUERIES["streaming_funnel_totals"].oracle
        ).fetchall()
    }
    want = {u: (c, d) for u, (c, d, _) in python_truth.items()}
    assert got == want


def test_funnel_histogram_oracle_matches_python(con, python_truth):
    from collections import Counter

    from datafusion_pinot_spark.plans.queries import QUERIES

    got = dict(
        con.execute(QUERIES["funnel_complete_histogram"].oracle).fetchall()
    )
    want = Counter(c for c, _, _ in python_truth.values())
    assert got == dict(want)


def test_funnel_conversion_oracle_matches_python(con, python_truth):
    from datafusion_pinot_spark.plans.queries import QUERIES

    got = {
        r[1]: r[2]
        for r in con.execute(
            QUERIES["funnel_conversion_steps"].oracle
        ).fetchall()
    }
    depths = [d for _, _, d in python_truth.values()]
    want = {
        "view": sum(1 for d in depths if d >= 1),
        "click": sum(1 for d in depths if d >= 2),
        "purchase": sum(1 for d in depths if d >= 3),
    }
    assert got == want


def test_no_multirow_list_lambda_over_aggregates_in_oracles():
    """Static sweep: no oracle may apply a list lambda or list_resize to
    a list() aggregate in the same or a downstream select — grep-level
    guard for the hazard pattern (equal-length uses like the PQ ADC
    fold are exempted by materializing the lists one CTE level first
    and carrying fixed-length lists only)."""
    import re

    from datafusion_pinot_spark.plans.queries import QUERIES

    bad = []
    for name, q in QUERIES.items():
        if not q.oracle:
            continue
        sql = q.oracle
        # the raw hazard: lambda directly over list(...) aggregation
        if re.search(
            r"(list_reduce|list_transform|list_filter)\s*\(\s*list_sort\s*\(\s*list\s*\(",
            sql,
        ) or re.search(
            r"(list_reduce|list_transform|list_filter)\s*\(\s*list\s*\(",
            sql,
        ):
            bad.append(name)
        if re.search(r"list_resize\s*\([^,]+,\s*[a-z_]", sql):
            bad.append(name + " (list_resize with non-constant size)")
    assert bad == [], bad

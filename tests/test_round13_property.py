"""Property tests for the round-13 operators against transparent
pure-Python references: the CUSUM changepoint scan (prefix-sum reference
over random daily series), the tolerance as-of join (brute-force
latest-prior-event reference over random timelines), and the packing
waste curve (per-doc min/max reference). One Spark job per example."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row

# ---- cusum_changepoint_daily vs prefix-sum reference ----

_series = st.lists(
    st.integers(min_value=0, max_value=500), min_size=1, max_size=40
)


def _cusum_ref(cents: list[int]):
    n = len(cents)
    total = sum(cents)
    out, prefix = [], 0
    for d, x in enumerate(cents, start=1):
        prefix += x
        out.append(n * prefix - d * total)
    peak = max(abs(c) for c in out)
    return [(c, abs(c) == peak) for c in out]


@settings(max_examples=10, deadline=None)
@given(_series)
def test_cusum_matches_prefix_reference(spark, dollars):
    from datafusion_pinot_spark.operators.temporal import (
        cusum_changepoint_daily,
    )

    base = dt.datetime(2024, 1, 1, 9, 0, 0)
    ev = spark.createDataFrame(
        [
            Row(ts=base + dt.timedelta(days=d), value=float(v))
            for d, v in enumerate(dollars)
        ]
    )
    got = cusum_changepoint_daily(ev).collect()
    ref = _cusum_ref([v * 100 for v in dollars])
    assert [(r.cusum_scaled, r.is_changepoint) for r in got] == ref


# ---- asof_join_tolerance vs brute-force reference ----

_timelines = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user
        st.sampled_from(["purchase", "view"]),
        st.integers(min_value=0, max_value=120),  # second offset
    ),
    min_size=1,
    max_size=40,
)


def _asof_ref(rows, tol_s):
    # rows: (event_id, user, type, sec)
    out = {}
    for eid, u, ty, sec in rows:
        if ty != "purchase":
            continue
        prior = [
            (s2, e2)
            for (e2, u2, t2, s2) in rows
            if u2 == u and t2 == "view" and s2 <= sec
        ]
        if not prior:
            out[eid] = (None, False, None)
            continue
        best_ts = max(s2 for s2, _ in prior)
        best_id = max(e2 for s2, e2 in prior if s2 == best_ts)
        gap = sec - best_ts
        matched = gap <= tol_s
        out[eid] = (gap, matched, best_id if matched else None)
    return out


@settings(max_examples=10, deadline=None)
@given(_timelines, st.integers(min_value=0, max_value=60))
def test_asof_tolerance_matches_bruteforce(spark, timeline, tol_s):
    from datafusion_pinot_spark.operators.temporal import (
        asof_join_tolerance,
    )

    rows = [
        (i, u, ty, sec) for i, (u, ty, sec) in enumerate(timeline)
    ]
    base = dt.datetime(2024, 3, 1)
    ev = spark.createDataFrame(
        [
            Row(
                event_id=eid,
                user_id=u,
                event_type=ty,
                ts=base + dt.timedelta(seconds=sec),
            )
            for eid, u, ty, sec in rows
        ]
    )
    got = {
        r.event_id: (r.prior_gap_s, r.matched, r.asof_event_id)
        for r in asof_join_tolerance(ev, tolerance_s=tol_s).collect()
    }
    assert got == _asof_ref(rows, tol_s)


# ---- packing_waste_curve vs per-doc reference ----

_doc_lens = st.lists(
    st.integers(min_value=0, max_value=30), min_size=1, max_size=25
)


@settings(max_examples=10, deadline=None)
@given(_doc_lens)
def test_packing_curve_matches_minmax_reference(spark, lens):
    from datafusion_pinot_spark.operators.curation import (
        packing_waste_curve,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text=" ".join(["w"] * n))
            for i, n in enumerate(lens)
        ]
    )
    ctx = (8, 16)
    got = {
        r.ctx_len: (
            r.n_docs,
            r.n_truncated,
            r.tokens_kept,
            r.tokens_trunc,
            r.pad_tokens,
            r.util_ppm,
        )
        for r in packing_waste_curve(docs, ctx_lens=ctx).collect()
    }
    nz = [n for n in lens if n > 0]
    ref = {}
    if nz:
        for L in ctx:
            kept = sum(min(n, L) for n in nz)
            ref[L] = (
                len(nz),
                sum(1 for n in nz if n > L),
                kept,
                sum(max(n - L, 0) for n in nz),
                sum(L - min(n, L) for n in nz),
                kept * 1_000_000 // (len(nz) * L),
            )
    assert got == ref

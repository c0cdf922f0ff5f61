"""Property tests for the round-12 operators against transparent
pure-Python references: exact-integer k-means (full Lloyd reference),
the label medoid (brute-force all-pairs L1), shingle containment
(subset => 1.0 and a brute-force containment reference), and the
session-threshold curve (monotone sessions + brute-force reference over
random gap sequences). One Spark job per example; examples kept small —
each check is a full Spark round trip."""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row

# ---- kmeans_cluster_report vs full pure-Python Lloyd reference ----

_vecs = st.lists(
    st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=3, max_size=3
    ),
    min_size=2,
    max_size=14,
)


def _kmeans_ref(milli_vecs, k, iters):
    vecs = [tuple(v) for v in milli_vecs]
    cents = {c: vecs[c] for c in range(min(k, len(vecs)))}
    assign = {}
    d_at = {}
    for _ in range(iters):
        for i, v in enumerate(vecs):
            best = None
            for c, cm in sorted(cents.items()):
                d2 = sum((a - b) * (a - b) for a, b in zip(v, cm))
                if best is None or d2 < best[0]:
                    best = (d2, c)
            assign[i], d_at[i] = best[1], best[0]
        new = {}
        for c in cents:
            members = [vecs[i] for i in assign if assign[i] == c]
            if members:
                s = [sum(col) for col in zip(*members)]
                # truncation toward zero, like Spark's div
                new[c] = tuple(
                    int(x / len(members))
                    if x >= 0
                    else -((-x) // len(members))
                    for x in s
                )
            else:
                new[c] = cents[c]
        cents = new
    out = {}
    for i in assign:
        c = assign[i]
        n, inert = out.get(c, (0, 0))
        out[c] = (n + 1, inert + d_at[i])
    return out


@settings(max_examples=8, deadline=None)
@given(_vecs)
def test_kmeans_matches_python_lloyd(spark, milli):
    from datafusion_pinot_spark.operators.similarity import (
        kmeans_cluster_report,
    )

    emb = spark.createDataFrame(
        [
            Row(
                vec_id=i,
                embedding=[x / 1000.0 for x in v],
                label="l",
            )
            for i, v in enumerate(milli)
        ]
    )
    # the milli quantization floor(x*1000+0.5) of x = m/1000.0 recovers m
    # exactly for |m| <= 1000 (double holds m/1000 to <5e-14 relative)
    got = {
        r.cluster_id: (r.n_vectors, r.inertia_milli2)
        for r in kmeans_cluster_report(emb, k=2, iters=2).collect()
    }
    assert got == _kmeans_ref(milli, k=2, iters=2)


# ---- label_medoid_vectors vs brute-force all-pairs L1 ----


@settings(max_examples=8, deadline=None)
@given(_vecs)
def test_medoid_matches_all_pairs(spark, milli):
    from datafusion_pinot_spark.operators.similarity import (
        label_medoid_vectors,
    )

    emb = spark.createDataFrame(
        [
            Row(vec_id=i, embedding=[x / 1000.0 for x in v], label="l")
            for i, v in enumerate(milli)
        ]
    )
    best = None
    for i, v in enumerate(milli):
        tot = sum(
            sum(abs(a - b) for a, b in zip(v, u)) for u in milli
        )
        if best is None or (tot, i) < best:
            best = (tot, i)
    out = label_medoid_vectors(emb).collect()
    assert (out[0].medoid_vec_id, out[0].total_l1_milli) == (
        best[1],
        best[0],
    )


# ---- containment_superset_pairs: subset => containment 1.0 ----

_words = st.lists(
    st.sampled_from("alpha beta gamma delta epsilon zeta eta".split()),
    min_size=3,
    max_size=10,
)


@settings(max_examples=8, deadline=None)
@given(_words, st.integers(min_value=0, max_value=3))
def test_containment_flags_true_subsequence(spark, words, pad):
    from datafusion_pinot_spark.operators.dedup import (
        containment_superset_pairs,
    )

    inner = " ".join(words)
    outer = " ".join(["pre"] * pad + words + ["post"] * pad)
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=inner), Row(doc_id=2, text=outer)]
    )
    out = {
        (r.contained, r.container): r.containment_ppm
        for r in containment_superset_pairs(docs, t_ppm=1_000_000).collect()
    }
    # doc 1's shingles are a contiguous subsequence of doc 2's -> full
    # containment always flags (1, 2) at exactly 1.0
    assert out[(1, 2)] == 1_000_000


# ---- session_threshold_sensitivity vs brute-force over random gaps ----

_gaps = st.lists(
    st.integers(min_value=1, max_value=5400), min_size=0, max_size=25
)


def _sessions_ref(gaps_s, thr_s):
    """(n_sessions, n_bounce) for one user with inter-event gaps gaps_s."""
    n = len(gaps_s) + 1
    starts = [True] + [g > thr_s for g in gaps_s]
    sessions = sum(starts)
    bounce = 0
    for i in range(n):
        nxt_breaks = gaps_s[i] > thr_s if i < len(gaps_s) else True
        if starts[i] and nxt_breaks:
            bounce += 1
    return sessions, bounce


@settings(max_examples=8, deadline=None)
@given(_gaps)
def test_session_curve_matches_reference(spark, gaps):
    from datafusion_pinot_spark.operators.funnel import (
        session_threshold_sensitivity,
    )

    base = dt.datetime(2024, 1, 1)
    times, cur = [base], base
    for g in gaps:
        cur = cur + dt.timedelta(seconds=g)
        times.append(cur)
    ev = spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=t,
                user_id=1,
                event_type="x",
                value=1.0,
            )
            for i, t in enumerate(times)
        ]
    )
    out = {
        r.threshold_min: (r.n_sessions, r.n_bounce)
        for r in session_threshold_sensitivity(ev).collect()
    }
    for m in (5, 15, 30, 60):
        assert out[m] == _sessions_ref(gaps, m * 60)
    ns = [out[m][0] for m in (5, 15, 30, 60)]
    assert ns == sorted(ns, reverse=True)

"""Property tests for the round-11 operators against transparent
pure-Python references: Tukey fences (exact order-statistic quartiles +
fence counts vs a sorted-list reference), RRF fusion (rank + ppm
arithmetic vs an O(n^2) reference), and the survivorship PSI share
arithmetic (vs a dict-based reference). One Spark job per example —
examples batch into a single DataFrame."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings, strategies as st


# ---- tukey_fence_outliers vs sorted-list reference ----

values = st.lists(
    st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    ),
    min_size=1,
    max_size=60,
)


def _tukey_ref(vals: list[float]):
    s = sorted(vals)
    n = len(s)
    q1 = s[math.ceil(n / 4.0) - 1]
    q3 = s[math.ceil(3.0 * n / 4.0) - 1]
    lo = q1 - 1.5 * (q3 - q1)
    hi = q3 + 1.5 * (q3 - q1)
    return (
        n,
        q1,
        q3,
        sum(1 for v in vals if v < lo),
        sum(1 for v in vals if v > hi),
    )


@settings(max_examples=12, deadline=None)
@given(values)
def test_tukey_matches_sorted_reference(spark, vals):
    from datafusion_pinot_spark.operators.validation import (
        tukey_fence_outliers,
    )

    events = spark.createDataFrame(
        [("t", float(v)) for v in vals], "event_type string, value double"
    )
    [r] = tukey_fence_outliers(events).collect()
    n, q1, q3, n_low, n_high = _tukey_ref(vals)
    assert r.n_values == n
    assert r.q1 == round(q1, 6) and r.q3 == round(q3, 6)
    assert (r.n_low, r.n_high) == (n_low, n_high)
    assert r.outlier_ppm == (n_low + n_high) * 1000000 // n


# ---- rrf_fusion_topk vs O(n^2) reference ----

vecs = st.lists(
    st.tuples(
        st.floats(min_value=-8, max_value=8, allow_nan=False, width=32),
        st.floats(min_value=-8, max_value=8, allow_nan=False, width=32),
    ),
    min_size=2,
    max_size=25,
    unique=True,
)


def _rrf_ref(rows, qid, k=10, rrf_k=60):
    q = dict(rows)[qid]

    def cos(a, b):
        na = math.sqrt(a[0] * a[0] + a[1] * a[1])
        nb = math.sqrt(b[0] * b[0] + b[1] * b[1])
        if na * nb == 0:
            return 0.0
        return round((a[0] * b[0] + a[1] * b[1]) / (na * nb), 6)

    def d2(a, b):
        return round(
            (a[0] - b[0]) * (a[0] - b[0]) + (a[1] - b[1]) * (a[1] - b[1]), 6
        )

    cands = [(i, v) for i, v in rows if i != qid]
    by_cos = sorted(cands, key=lambda iv: (-cos(q, iv[1]), iv[0]))
    by_l2 = sorted(cands, key=lambda iv: (d2(q, iv[1]), iv[0]))
    rc = {i: r + 1 for r, (i, _) in enumerate(by_cos)}
    rl = {i: r + 1 for r, (i, _) in enumerate(by_l2)}
    fused = sorted(
        (
            (
                1000000 // (rrf_k + rc[i]) + 1000000 // (rrf_k + rl[i]),
                i,
            )
            for i, _ in cands
        ),
        key=lambda t: (-t[0], t[1]),
    )
    return {
        i: (rc[i], rl[i], ppm, rank + 1)
        for rank, (ppm, i) in enumerate(fused[:k])
    }


@settings(max_examples=10, deadline=None)
@given(vecs)
def test_rrf_matches_quadratic_reference(spark, rows):
    from datafusion_pinot_spark.operators.similarity import rrf_fusion_topk

    indexed = list(enumerate(rows))
    emb = spark.createDataFrame(
        [(i, [float(a), float(b)]) for i, (a, b) in indexed],
        "vec_id long, embedding array<float>",
    )
    got = {
        r.vec_id: (r.rank_cos, r.rank_l2, r.rrf_ppm, r.fused_rank)
        for r in rrf_fusion_topk(emb, [0], k=10).collect()
    }
    # the reference must see the FLOAT32-rounded coordinates Spark stores
    import struct

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    ref_rows = [(i, (f32(a), f32(b))) for i, (a, b) in indexed]
    want = _rrf_ref(ref_rows, 0)
    assert got == want


# ---- dedup_survivorship_psi share arithmetic vs dict reference ----

docs_strategy = st.lists(
    st.tuples(
        st.sampled_from(["t1", "t2", "t3", "t4", "t5", "t6"]),  # text
        st.sampled_from(["A", "B", "C"]),  # source
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=10, deadline=None)
@given(docs_strategy)
def test_survivorship_psi_matches_dict_reference(spark, rows):
    from datafusion_pinot_spark.operators.dedup import dedup_survivorship_psi

    docs = spark.createDataFrame(
        [
            (i, text, src, "en", len(text))
            for i, (text, src) in enumerate(rows)
        ],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    got = {r.source: r for r in dedup_survivorship_psi(docs).collect()}

    before: dict[str, int] = {}
    keep: dict[str, int] = {}
    for i, (text, src) in enumerate(rows):
        before[src] = before.get(src, 0) + 1
        if text not in keep:
            keep[text] = i
    after: dict[str, int] = {}
    for text, i in keep.items():
        src = rows[i][1]
        after[src] = after.get(src, 0) + 1
    t_before = sum(before.values())
    t_after = sum(after.values())
    assert set(got) == set(before)
    for src, r in got.items():
        nb, na = before[src], after.get(src, 0)
        assert (r.n_before, r.n_after) == (nb, na)
        p = nb * 1000000 // t_before
        q = na * 1000000 // t_after
        assert (r.share_before_ppm, r.share_after_ppm) == (p, q)
        want_psi = round(
            (p - q) / 1e6 * math.log(max(p, 1) / max(q, 1)), 6
        )
        assert r.psi_contrib == pytest.approx(want_psi, abs=1e-9)


# ---- halflife_event_mass vs dict reference (the two-round red cell:
# pin its full arithmetic path, not just hand cases) ----

event_rows = st.lists(
    st.tuples(
        st.sampled_from(["click", "view", "buy"]),
        st.integers(min_value=0, max_value=90),  # days before anchor
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=12, deadline=None)
@given(event_rows)
def test_halflife_matches_dict_reference(spark, rows):
    from datafusion_pinot_spark.operators.validation import (
        halflife_event_mass,
    )

    anchor = 19000  # days since epoch, far from any boundary
    events = spark.createDataFrame(
        [
            (t, (anchor - back) * 86400 * 1000000)
            for t, back in rows
        ],
        "event_type string, us long",
    ).selectExpr("event_type", "timestamp_micros(us) AS ts")
    got = {r.event_type: r for r in halflife_event_mass(events).collect()}

    maxday = anchor - min(back for _, back in rows)
    mass: dict[str, int] = {}
    n: dict[str, int] = {}
    for t, back in rows:
        day = anchor - back
        age = maxday - day
        w = (1 << (30 - age)) if age <= 30 else 0
        mass[t] = mass.get(t, 0) + w
        n[t] = n.get(t, 0) + 1
    total = sum(mass.values())
    assert set(got) == set(mass)
    for t, r in got.items():
        assert (r.n_events, r.mass) == (n[t], mass[t])
        want_ppm = mass[t] * 1000000 // total if total > 0 else 0
        assert r.share_ppm == want_ppm
        assert isinstance(r.mass, int)


# ---- quality_yield_curve: threshold counting consistent with the
# engine's own text_stats scores (no formula re-implementation — the
# formula itself is pinned by the text_stats oracle) ----

texts = st.lists(
    st.sampled_from(
        [
            "the quick brown fox jumps over the lazy dog",
            "x",
            "!!!! ???? ;;;;",
            "plain readable prose with several common words in it",
            "",
            "a b c d e f g h i j k l m n o p q r s t u v w x y z",
            "numbers 123 456 789 mixed with words and, punctuation.",
        ]
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=10, deadline=None)
@given(texts)
def test_yield_curve_counts_match_scored_profile(spark, rows):
    from datafusion_pinot_spark.operators.text import (
        quality_yield_curve,
        text_stats,
    )

    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    profile = [
        (r.n_tokens, r.quality) for r in text_stats(docs).collect()
    ]
    got = {r.threshold_milli: r for r in quality_yield_curve(docs).collect()}
    n_docs = len(profile)
    n_tokens = sum(t for t, _ in profile)
    for m in range(0, 1000, 100):
        t = m / 1000.0
        kept = [(nt, q) for nt, q in profile if q >= t]
        r = got[m]
        assert r.n_docs_kept == len(kept)
        assert r.n_tokens_kept == sum(nt for nt, _ in kept)
        assert r.docs_yield_ppm == (
            len(kept) * 1000000 // n_docs if n_docs else 0
        )
        assert r.tokens_yield_ppm == (
            sum(nt for nt, _ in kept) * 1000000 // n_tokens
            if n_tokens
            else 0
        )

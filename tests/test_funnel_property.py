"""Property tests: the packed-BIGINT funnel folds vs a transparent pure-
Python simulator on random event streams. A single Spark run evaluates
many generated streams at once (hypothesis drives the generation; Spark
startup cost is paid once per test, not per example, by batching all
users of one example into one DataFrame)."""

from datetime import datetime, timedelta

from hypothesis import given, settings, strategies as st

STEPS = ["view", "click", "purchase"]
TYPES = ["signup", "view", "click", "purchase", "error"]


def _py_depth_prefix(seq):
    """Ordered-prefix depth: advance when the next event is exactly the
    next step; depth never resets."""
    d = 0
    for s in seq:
        if d < len(STEPS) and s == STEPS[d]:
            d += 1
    return d


def _py_completions(seq):
    comp, cur = 0, 0
    for s in seq:
        if cur < len(STEPS) and s == STEPS[cur]:
            cur += 1
            if cur == len(STEPS):
                comp, cur = comp + 1, 0
    return comp


# one example = a dict of users -> event-type sequences (distinct minutes
# keep the timestamp order unambiguous)
streams = st.dictionaries(
    st.integers(min_value=1, max_value=6),
    st.lists(st.sampled_from(TYPES), min_size=0, max_size=12),
    min_size=1,
    max_size=6,
)


@settings(max_examples=12, deadline=None)
@given(streams)
def test_funnel_folds_match_python_reference(spark, streams):
    from datafusion_pinot_spark.operators import funnel

    rows = []
    for uid, seq in streams.items():
        for i, s in enumerate(seq):
            rows.append((uid, datetime(2024, 1, 1) + timedelta(minutes=i), s))
    if not rows:
        return
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    got_depth = dict(funnel.funnel_user_depth(ev, STEPS).collect())
    got_comp = dict(funnel.funnel_complete_count(ev, STEPS).collect())
    for uid, seq in streams.items():
        fseq = [s for s in seq if s in STEPS]
        if not fseq:
            assert uid not in got_depth  # no funnel events -> no row
            continue
        assert got_depth[uid] == _py_depth_prefix(fseq), (uid, seq)
        assert got_comp[uid] == _py_completions(fseq), (uid, seq)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d", "e", "f", "g", "h"]),
            min_size=0,
            max_size=20,
        ),
        min_size=1,
        max_size=15,
    ),
    st.integers(min_value=2, max_value=6),
)
def test_heavy_hitters_match_exact_reference(spark, docs_tokens, k):
    from collections import Counter

    from datafusion_pinot_spark.operators import frequent

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs_tokens)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r["token"], r["cnt"])
        for r in frequent.heavy_hitter_tokens(df, k=k).collect()
    ]
    cnt = Counter(t for toks in docs_tokens for t in toks)
    total = sum(cnt.values())
    want = sorted(
        ((t, c) for t, c in cnt.items() if c * k > total),
        key=lambda tc: (-tc[1], tc[0]),
    )
    assert got == want, (k, total, cnt)


def _py_min_latency(seq_with_ts, window_us):
    """(ts_us, step_name) list -> fastest window-compliant conversion
    latency in us, or None; greedy restart on step one."""
    start, cur, lat = 0, 0, None
    for ts, s in seq_with_ts:
        if s not in STEPS:
            continue
        step = STEPS.index(s) + 1
        if step == cur + 1 and (cur == 0 or ts - start <= window_us):
            if cur == 0:
                start = ts
            cur += 1
            if cur == len(STEPS):
                this = ts - start
                lat = this if lat is None else min(lat, this)
        elif step == 1:
            start, cur = ts, 1
    return lat


@settings(max_examples=10, deadline=None)
@given(
    st.dictionaries(
        st.integers(min_value=1, max_value=5),
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=50),  # minutes
                st.sampled_from(TYPES),
            ),
            min_size=0,
            max_size=12,
            unique_by=lambda t: t[0],  # distinct minutes => unique order
        ),
        min_size=1,
        max_size=5,
    )
)
def test_time_to_convert_matches_python_reference(spark, streams):
    from datafusion_pinot_spark.operators import funnel

    window_us = 10 * 60 * 1_000_000  # 10 minutes: tight enough to expire
    rows, expect = [], {}
    for uid, seq in streams.items():
        seq = sorted(seq)
        for minute, s in seq:
            rows.append(
                (uid, datetime(2024, 1, 1) + timedelta(minutes=minute), s)
            )
        lat = _py_min_latency(
            [(m * 60_000_000, s) for m, s in seq], window_us
        )
        if any(s in STEPS for _, s in seq):
            expect[uid] = lat
    if not rows:
        return
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    row = funnel.funnel_time_to_convert(ev, STEPS, window_us).collect()[0]
    lats = [v for v in expect.values() if v is not None]
    assert row["n_funnel_users"] == len(expect)
    assert row["n_converted"] == len(lats)
    if lats:
        assert row["min_lat_us"] == min(lats)
        assert row["max_lat_us"] == max(lats)
        k50 = (len(lats) - 1) * 50 // 100
        k90 = (len(lats) - 1) * 90 // 100
        assert row["p50_lat_us"] == sorted(lats)[k50]
        assert row["p90_lat_us"] == sorted(lats)[k90]
    else:
        assert row["min_lat_us"] is None

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

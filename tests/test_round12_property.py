"""Property tests for the round-12 operators against transparent
pure-Python references: the ngram novelty curve (bucketed first-seen
shingle accounting vs a dict reference), temporal split leakage
(day-range cut + per-side user sets vs a set reference), and the join
skew audit's exact share/hot-factor arithmetic (vs a Counter
reference). One Spark job per example."""

from __future__ import annotations

import datetime as dt
from collections import Counter

from hypothesis import given, settings, strategies as st


# ---- ngram_novelty_curve vs dict reference ----

_corpora = st.lists(
    st.lists(
        st.sampled_from("abcdefg"), min_size=0, max_size=8
    ).map(lambda toks: " ".join(toks)),
    min_size=1,
    max_size=30,
)


def _novelty_ref(texts: list[str], n: int, buckets: int):
    min_id, max_id = 0, len(texts) - 1
    span = max_id - min_id + 1
    seen_first: dict[str, int] = {}
    per_bucket: dict[int, set] = {}
    for doc_id, text in enumerate(texts):
        toks = text.split()
        b = (doc_id - min_id) * buckets // span
        shingles = {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }
        for s in shingles:
            per_bucket.setdefault(b, set()).add(s)
            if s not in seen_first:
                seen_first[s] = b
    out = {}
    for b, sh in sorted(per_bucket.items()):
        if not sh:
            continue
        novel = sum(1 for s in sh if seen_first[s] == b)
        out[b] = (len(sh), novel, novel * 1_000_000 // len(sh))
    return out


@settings(max_examples=10, deadline=None)
@given(_corpora)
def test_novelty_curve_matches_dict_reference(spark, texts):
    from datafusion_pinot_spark.operators.dedup import ngram_novelty_curve

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.bucket: (r.n_shingles, r.n_novel, r.novelty_ppm)
        for r in ngram_novelty_curve(docs, 3, 4).collect()
    }
    assert got == _novelty_ref(texts, 3, 4)
    # global invariant: novel counts sum to the distinct shingle total
    all_sh = {
        " ".join(t.split()[i : i + 3])
        for t in texts
        for i in range(len(t.split()) - 2)
    }
    assert sum(v[1] for v in got.values()) == len(all_sh)


# ---- temporal_split_leakage vs set reference ----

_events = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=6),  # user_id
        st.integers(min_value=0, max_value=30),  # day
    ),
    min_size=1,
    max_size=60,
)


def _leakage_ref(pairs, pct=80):
    days = [d for _, d in pairs]
    dmin, dmax = min(days), max(days)
    cut = dmin + (dmax - dmin) * pct // 100
    train_u = {u for u, d in pairs if d <= cut}
    valid_u = {u for u, d in pairs if d > cut}
    overlap = train_u & valid_u
    return (
        sum(1 for _, d in pairs if d <= cut),
        sum(1 for _, d in pairs if d > cut),
        len(train_u),
        len(valid_u),
        len(overlap),
        (len(overlap) * 1_000_000 // len(valid_u)) if valid_u else 0,
    )


@settings(max_examples=10, deadline=None)
@given(_events)
def test_temporal_leakage_matches_set_reference(spark, pairs):
    from datafusion_pinot_spark.operators.curation import (
        temporal_split_leakage,
    )

    base = dt.datetime(2021, 6, 1)
    events = spark.createDataFrame(
        [(u, "e", base + dt.timedelta(days=d)) for u, d in pairs],
        "user_id long, event_type string, ts timestamp",
    )
    [r] = temporal_split_leakage(events).collect()
    ref = _leakage_ref(pairs)
    assert (
        r.train_events,
        r.valid_events,
        r.train_users,
        r.valid_users,
        r.overlap_users,
        r.leak_ppm,
    ) == ref
    # conservation + bound invariants
    assert r.train_events + r.valid_events == len(pairs)
    assert r.overlap_users <= min(r.train_users, r.valid_users)


# ---- join_skew_audit vs Counter reference ----

_keys = st.lists(
    st.integers(min_value=1, max_value=8), min_size=1, max_size=80
)


@settings(max_examples=10, deadline=None)
@given(_keys)
def test_join_skew_matches_counter_reference(spark, keys):
    from datafusion_pinot_spark.operators.validation import join_skew_audit

    df = spark.createDataFrame([(k,) for k in keys], "user_id long")
    out = join_skew_audit(df, ("user_id",), k=5).collect()
    c = Counter(keys)
    total, n_keys = len(keys), len(c)
    expected = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r.user_id, r.rows) for r in out] == expected
    for r in out:
        assert r.total_rows == total and r.n_keys == n_keys
        assert r.share_ppm == r.rows * 1_000_000 // total
        assert r.hot_factor_ppm == r.rows * n_keys * 1_000_000 // total


# ---- dedup_pipeline_report vs a full pure-Python reference ----
# Replicates every stage bit-for-bit: tokens = trim(lower()).split(),
# shingles = DISTINCT 3-grams, mh_i = min md5("s{i}|"+s) hex, band key =
# md5("|".join 4 row hashes), bucket pairs, exact jaccard with the
# round(.,6) >= 0.2 fence, min-label components, canonical keep, ppm.

import hashlib
import itertools
import re as _re

_K, _BANDS, _N, _T = 8, 2, 3, 0.2


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _toks(text: str) -> list[str]:
    t = text.lower().strip()
    return _re.split(r"\s+", t) if t else []


def _shingles(text: str) -> set:
    w = _toks(text)
    return {" ".join(w[i : i + _N]) for i in range(len(w) - _N + 1)}


def _pipeline_ref(rows):
    sh = {d: _shingles(t) for d, _, t in rows}
    sigs = {
        d: [min(_md5(f"s{i}|" + s) for s in ss) for i in range(_K)]
        for d, ss in sh.items()
        if ss
    }
    rpb = _K // _BANDS
    buckets: dict = {}
    for d, sig in sigs.items():
        for b in range(_BANDS):
            key = _md5("|".join(sig[b * rpb + r] for r in range(rpb)))
            buckets.setdefault((b, key), []).append(d)
    cand = {
        pair
        for ids in buckets.values()
        if len(ids) > 1
        for pair in itertools.combinations(sorted(ids), 2)
    }
    verified = set()
    for a, b in cand:
        inter = len(sh[a] & sh[b])
        union = len(sh[a] | sh[b])
        if union and round(inter / union, 6) >= _T:
            verified.add((a, b))
    # union-find -> min-label components
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in verified:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members = {d for p in verified for d in p}
    label = {d: find(d) for d in members}
    out: dict = {}
    for d, src, text in rows:
        n_tok = len(_toks(text))
        e = out.setdefault(
            src, {"n_docs": 0, "dup": 0, "kept": 0, "tot": 0, "kt": 0}
        )
        dropped = d in label and label[d] != d
        e["n_docs"] += 1
        e["dup"] += d in members
        e["kept"] += not dropped
        e["tot"] += n_tok
        e["kt"] += 0 if dropped else n_tok
    return {
        s: (
            e["n_docs"],
            e["dup"],
            e["kept"],
            e["tot"],
            e["kt"],
            (e["kt"] * 1_000_000 // e["tot"]) if e["tot"] else 0,
        )
        for s, e in out.items()
    }


_texts = st.lists(
    st.sampled_from("abcd"), min_size=0, max_size=7
).map(lambda toks: " ".join(toks))

_corpus = st.lists(
    st.tuples(st.sampled_from(["s1", "s2"]), _texts),
    min_size=1,
    max_size=14,
)


@settings(max_examples=8, deadline=None)
@given(_corpus)
def test_dedup_pipeline_matches_python_reference(spark, items):
    from datafusion_pinot_spark.operators.dedup import dedup_pipeline_report

    rows = [(i, src, text) for i, (src, text) in enumerate(items)]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    got = {
        r.source: (
            r.n_docs,
            r.n_dup_members,
            r.n_kept,
            r.total_tokens,
            r.kept_tokens,
            r.retained_ppm,
        )
        for r in dedup_pipeline_report(docs).collect()
    }
    assert got == _pipeline_ref(rows)


# ---- training_mixture_report vs a full pure-Python reference ----
# Mirrors every stage exactly: canonical keep = longest-n_chars-wins per
# md5(text) group (doc_id tiebreak); the quality gate's signals use
# split(text, ' ') LITERALLY (empty strings count as words — the
# operator's convention); budget tokens use tokens() = trim(lower())
# \s+ split; Hamilton largest-remainder over sources WITH kept docs.


def _q_keep(text: str) -> bool:
    w = text.split(" ")
    n = len(w)
    if n < 15 or n > 10000:
        return False
    avg = (sum(len(x) for x in w) * 1000) // n if n else 0
    if avg < 2000 or avg > 12000:
        return False
    grams = [" ".join(w[i : i + 2]) for i in range(n - 1)]
    if grams:
        c = Counter(grams)
        tot = sum(c.values())
        if (tot - len(c)) * 1_000_000 // tot > 300_000:
            return False
    c = Counter(w)
    tot = sum(c.values())
    if tot and max(c.values()) * 1_000_000 // tot > 200_000:
        return False
    return True


def _mix_ref(rows, budget):
    groups: dict = {}
    for d, s, t, nc in rows:
        groups.setdefault(_md5(t), []).append((d, s, t, nc))
    surv = []
    for g in groups.values():
        g.sort(key=lambda r: (-r[3], r[0]))
        surv.append(g[0])
    kept = [(d, s, t) for d, s, t, _ in surv if _q_keep(t)]
    per_kept: dict = {}
    for _, s, t in kept:
        n_tok = len(_toks(t))
        e = per_kept.setdefault(s, [0, 0])
        e[0] += 1
        e[1] += n_tok
    total = sum(v[1] for v in per_kept.values())
    alloc = {}
    if total > 0:
        quotas = {
            s: (budget * v[1] // total, budget * v[1] % total, s)
            for s, v in per_kept.items()
        }
        leftover = budget - sum(q for q, _, _ in quotas.values())
        ranked = sorted(quotas.items(), key=lambda kv: (-kv[1][1], kv[0]))
        for i, (s, (q, _, _)) in enumerate(ranked):
            alloc[s] = q + (1 if i < leftover else 0)
    out = {}
    for d, s, t, nc in rows:
        out.setdefault(s, [0, 0, 0, 0, 0])[0] += 1
    for d, s, t, nc in surv:
        out[s][1] += 1
    for s, (nq, kt) in per_kept.items():
        out[s][2] = nq
        out[s][3] = kt
    for s, a in alloc.items():
        out[s][4] = a
    return {s: tuple(v) for s, v in out.items()}


_mix_texts = st.lists(
    st.sampled_from(["alpha", "bravo", "charlie", "delta", "echo", "fox"]),
    min_size=0,
    max_size=25,
).map(lambda toks: " ".join(toks))

_mix_corpus = st.lists(
    st.tuples(st.sampled_from(["s1", "s2", "s3"]), _mix_texts),
    min_size=1,
    max_size=16,
)


@settings(max_examples=8, deadline=None)
@given(_mix_corpus)
def test_mixture_report_matches_python_reference(spark, items):
    from datafusion_pinot_spark.operators.curation import (
        training_mixture_report,
    )

    rows = [(i, src, text, len(text)) for i, (src, text) in enumerate(items)]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string, n_chars int"
    )
    got = {
        r.source: (
            r.n_docs,
            r.n_dedup_kept,
            r.n_quality_kept,
            r.kept_tokens,
            r.alloc_tokens,
        )
        for r in training_mixture_report(docs, budget=100).collect()
    }
    ref = _mix_ref(rows, 100)
    assert got == ref
    # Hamilton invariant: allocations sum to the budget when anything kept
    if any(v[3] for v in ref.values()):
        assert sum(v[4] for v in got.values()) == 100

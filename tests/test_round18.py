"""r14 additions (r21+ first-check candidates, permanent pytest-oracle
tier): hand-value and invariant tests for the Poisson-bootstrap CI, CUPED,
the Wald-Wolfowitz runs test, the Hodges-Lehmann shift, the Markov
stationary event mix, SAX daily motifs, rational BM25, and
common-neighbor link prediction. All eight also run under the full DuckDB
hash gate via tests/test_queries_oracle.py."""

from __future__ import annotations

import datetime

from pyspark.sql import Row, functions as F


def _orders(spark, rows):
    """rows: (key, day, price, priority)."""
    return spark.createDataFrame(
        [
            Row(
                o_orderkey=k,
                o_custkey=k,
                o_orderstatus="O",
                o_totalprice=float(p),
                o_orderdate=datetime.datetime(2024, 1, d),
                o_orderpriority=pr,
            )
            for k, d, p, pr in rows
        ]
    )


def _events(spark, rows):
    """rows: (event_id, user, type, day, value)."""
    return spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=datetime.datetime(2024, 1, d),
                user_id=u,
                event_type=t,
                value=float(v),
            )
            for i, u, t, d, v in rows
        ]
    )


class TestBootstrapCiAov:
    def test_poisson_ladder_boundaries(self, spark):
        from datafusion_pinot_spark.operators.experiment import (
            _POISSON1_T48,
            _poisson_weight_case,
        )

        probes = (
            [(0, 0)]
            + [(t - 1, k) for k, t in enumerate(_POISSON1_T48)]
            + [(t, k + 1) for k, t in enumerate(_POISSON1_T48)]
            + [(2**48 - 1, 9)]
        )
        df = spark.createDataFrame(
            [Row(u=u, want=w) for u, w in probes]
        ).select("want", F.expr(_poisson_weight_case("u")).alias("got"))
        assert all(r.want == r.got for r in df.collect())

    def test_interval_orders_and_point_exact(self, spark):
        from datafusion_pinot_spark.operators.experiment import (
            bootstrap_ci_aov,
        )

        orders = _orders(
            spark, [(k, 1 + k % 20, 10 + k, "3-MEDIUM") for k in range(200)]
        )
        row = bootstrap_ci_aov(orders).collect()[0]
        assert row.n_orders == 200 and row.n_replicates == 32
        cents = [int(round((10 + k) * 100)) for k in range(200)]
        assert row.aov_milli == sum(cents) * 1000 // 200
        assert row.boot_lo_milli <= row.boot_hi_milli
        assert row.boot_spread_milli == row.boot_hi_milli - row.boot_lo_milli
        # the interval should bracket a neighborhood of the point estimate
        assert row.boot_lo_milli <= row.aov_milli * 1.2
        assert row.boot_hi_milli >= row.aov_milli * 0.8


class TestCupedAdjustedLift:
    def test_perfect_covariate(self, spark):
        from datafusion_pinot_spark.operators.experiment import (
            cuped_adjusted_lift,
        )

        # y = 2x exactly: pre (day 1) value v, post (day 3) value 2v;
        # midpoint is day 2 -> rho2 = 1e6, theta = 2e6
        rows = []
        for i, u in enumerate(range(40)):
            rows.append((2 * i, u, "a", 1, 1.0 + u))
            rows.append((2 * i + 1, u, "a", 3, 2.0 * (1.0 + u)))
        row = cuped_adjusted_lift(_events(spark, rows)).collect()[0]
        assert row.n_users == 40
        assert row.theta_ppm == 2_000_000
        assert row.rho2_ppm == 1_000_000
        # perfect covariate: CUPED removes (almost) all of the arm
        # imbalance that the raw lift shows
        assert abs(row.lift_cuped_milli) <= abs(row.lift_raw_milli)

    def test_no_pre_signal_keeps_raw_lift(self, spark):
        from datafusion_pinot_spark.operators.experiment import (
            cuped_adjusted_lift,
        )

        # constant pre-value: var(X) = 0 -> theta 0, lift_cuped == raw
        rows = []
        for i, u in enumerate(range(30)):
            rows.append((2 * i, u, "a", 1, 5.0))
            rows.append((2 * i + 1, u, "a", 3, 1.0 + (u % 7)))
        row = cuped_adjusted_lift(_events(spark, rows)).collect()[0]
        assert row.theta_ppm == 0 and row.rho2_ppm == 0
        assert row.lift_cuped_milli == row.lift_raw_milli


class TestRunsTestDaily:
    def test_hand_alternating(self, spark):
        from datafusion_pinot_spark.operators.validation import (
            runs_test_daily,
        )

        # daily cents 1000/100000 alternating + one median day (50000):
        # low-median = 50000 (excluded), signs - + - + -> 4 runs
        orders = _orders(
            spark,
            [
                (1, 1, 10.0, "5-LOW"),
                (2, 2, 1000.0, "5-LOW"),
                (3, 3, 10.0, "5-LOW"),
                (4, 4, 1000.0, "5-LOW"),
                (5, 5, 500.0, "5-LOW"),
            ],
        )
        row = runs_test_daily(orders).collect()[0]
        assert row.n_days == 5 and row.n_eff == 4
        assert row.n_plus == 2 and row.n_minus == 2
        assert row.runs == 4
        assert row.e_runs_milli == 3000
        assert row.var_runs_milli == (2 * 2 * 2 * (8 - 4) * 1000) // (
            4 * 4 * 3
        )
        assert row.reject_5pct is False

    def test_single_run_trend_rejects(self, spark):
        from datafusion_pinot_spark.operators.validation import (
            runs_test_daily,
        )

        # a monotone series: all lows then all highs -> R = 2, far below
        # E[R] -> the 5% flag must fire (values distinct so only the
        # single median day is excluded)
        rows = [(d, d, 10.0 + d, "5-LOW") for d in range(1, 11)] + [
            (10 + d, 10 + d, 1000.0 + d, "5-LOW") for d in range(1, 11)
        ]
        row = runs_test_daily(_orders(spark, rows)).collect()[0]
        assert row.runs == 2
        assert row.reject_5pct is True


class TestHodgesLehmannShift:
    def test_hand_median_of_diffs(self, spark):
        from datafusion_pinot_spark.operators.validation import (
            hodges_lehmann_shift,
        )

        # hi days {1000, 2000} cents, lo days {100, 200} cents:
        # diffs sorted {800, 900, 1800, 1900} -> low-median rank 2 -> 900
        orders = _orders(
            spark,
            [
                (1, 1, 10.0, "1-URGENT"),
                (2, 2, 20.0, "2-HIGH"),
                (3, 3, 1.0, "5-LOW"),
                (4, 4, 2.0, "3-MEDIUM"),
            ],
        )
        row = hodges_lehmann_shift(orders).collect()[0]
        assert (row.n_a_days, row.n_b_days, row.n_pairs) == (2, 2, 4)
        assert row.hl_shift_cents == 900

    def test_shift_invariance(self, spark):
        from datafusion_pinot_spark.operators.validation import (
            hodges_lehmann_shift,
        )

        # adding a constant to every hi day shifts the estimator by it
        base = [
            (1, 1, 10.0, "1-URGENT"),
            (2, 2, 20.0, "1-URGENT"),
            (3, 3, 30.0, "1-URGENT"),
            (4, 4, 1.0, "5-LOW"),
            (5, 5, 2.0, "5-LOW"),
        ]
        shifted = [
            (k, d, p + (100.0 if pr == "1-URGENT" else 0.0), pr)
            for k, d, p, pr in base
        ]
        a = hodges_lehmann_shift(_orders(spark, base)).collect()[0]
        b = hodges_lehmann_shift(_orders(spark, shifted)).collect()[0]
        assert b.hl_shift_cents - a.hl_shift_cents == 10000


def _markov_reference(trans_counts, states, iters=30, ppb=1_000_000_000):
    """Pure-python twin of the integer recurrence (the in-test oracle)."""
    states = sorted(states)
    k = len(states)
    idx = {s: i for i, s in enumerate(states)}
    mat = [[0] * k for _ in range(k)]
    for (a, b), c in trans_counts.items():
        mat[idx[a]][idx[b]] = c
    rowsum = [sum(r) for r in mat]
    v = [ppb // k + (1 if i < ppb % k else 0) for i in range(k)]
    for _ in range(iters):
        nxt = [0] * k
        for i in range(k):
            if rowsum[i] > 0:
                for j in range(k):
                    if mat[i][j]:
                        nxt[j] += v[i] * mat[i][j] // rowsum[i]
            else:
                for j in range(k):
                    nxt[j] += v[i] // k
        v = nxt
    return {s: v[idx[s]] for s in states}


class TestMarkovStationary:
    def test_two_state_swap_is_exact_half(self, spark):
        from datafusion_pinot_spark.operators.temporal import (
            markov_stationary_event_mix,
        )

        # A -> B -> A -> B: the swap chain's stationary mix is exactly
        # (1/2, 1/2) and the integer recurrence preserves it bit-exactly
        rows = [(i, 1, "ab"[i % 2], 1 + i, 1.0) for i in range(8)]
        out = {
            r.event_type: r.stationary_ppb
            for r in markov_stationary_event_mix(_events(spark, rows)).collect()
        }
        assert out == {"a": 500_000_000, "b": 500_000_000}

    def test_matches_python_recurrence_with_absorbing(self, spark):
        from datafusion_pinot_spark.operators.temporal import (
            markov_stationary_event_mix,
        )

        # user 1: a->b->c, user 2: a->b (c absorbing -> re-injection path)
        rows = [
            (0, 1, "a", 1, 1.0),
            (1, 1, "b", 2, 1.0),
            (2, 1, "c", 3, 1.0),
            (3, 2, "a", 1, 1.0),
            (4, 2, "b", 2, 1.0),
        ]
        got = {
            r.event_type: r.stationary_ppb
            for r in markov_stationary_event_mix(_events(spark, rows)).collect()
        }
        want = _markov_reference(
            {("a", "b"): 2, ("b", "c"): 1}, {"a", "b", "c"}
        )
        assert got == want


class TestSaxDailyMotifs:
    def test_motif_shape_and_mass(self, spark):
        from datafusion_pinot_spark.operators.temporal import sax_daily_motifs

        orders = _orders(
            spark,
            [(d, d, float(10 * ((d * 7) % 13 + 1)), "5-LOW") for d in range(1, 21)],
        )
        rows = sax_daily_motifs(orders, top=100).collect()
        assert all(len(r.motif) == 3 for r in rows)
        assert all(set(r.motif) <= set("abcd") for r in rows)
        # every 3-gram of the 20-day series is counted exactly once
        assert sum(r.n_occurrences for r in rows) == 20 - 2

    def test_constant_series_single_motif(self, spark):
        from datafusion_pinot_spark.operators.temporal import sax_daily_motifs

        # equal cents every day -> ranks break ties by day, so symbols
        # run a..d in order: quartile blocks of 5 give exactly 3 distinct
        # boundary motifs plus the block-constant ones
        orders = _orders(
            spark, [(d, d, 10.0, "5-LOW") for d in range(1, 21)]
        )
        rows = sax_daily_motifs(orders, top=100).collect()
        assert sum(r.n_occurrences for r in rows) == 18
        top = max(rows, key=lambda r: r.n_occurrences)
        assert top.motif in {"aaa", "bbb", "ccc", "ddd"}


class TestBm25DocTerms:
    @staticmethod
    def _brute(docs, k=3):
        tf, dl = {}, {}
        for d, text in docs:
            toks = text.strip().lower().split()
            dl[d] = len(toks)
            for t in toks:
                tf[(d, t)] = tf.get((d, t), 0) + 1
        df = {}
        for (d, t) in tf:
            df[t] = df.get(t, 0) + 1
        n, sumdl = len(dl), sum(dl.values())
        out = {}
        for (d, t), f in tf.items():
            sat = (22 * f * sumdl * 10**6) // (
                10 * f * sumdl + 3 * sumdl + 9 * dl[d] * n
            )
            idf = ((2 * (n - df[t]) + 1) * 10**6) // (2 * df[t] + 1)
            out[(d, t)] = sat * idf // 10**6
        return out

    def test_matches_brute_integer_formula(self, spark):
        from datafusion_pinot_spark.operators.text import bm25_doc_terms

        docs = [
            (0, "red red red green"),
            (1, "red green blue blue"),
            (2, "blue cyan cyan cyan cyan cyan"),
        ]
        frame = spark.createDataFrame(
            [Row(doc_id=d, text=t, lang="en", source="s", n_chars=len(t))
             for d, t in docs]
        )
        want = self._brute(docs)
        got = bm25_doc_terms(frame, k=10).collect()
        assert all(want[(r.doc_id, r.token)] == r.bm25_ppm for r in got)

    def test_length_normalization(self, spark):
        from datafusion_pinot_spark.operators.text import bm25_doc_terms

        # same tf of 'x' in a short vs a long doc: the short doc scores it
        # strictly higher (the property tf-idf lacks)
        frame = spark.createDataFrame(
            [
                Row(doc_id=0, text="x y", lang="en", source="s", n_chars=3),
                Row(
                    doc_id=1,
                    text="x a b c d e f g h",
                    lang="en",
                    source="s",
                    n_chars=17,
                ),
            ]
        )
        got = {
            (r.doc_id, r.token): r.bm25_ppm
            for r in bm25_doc_terms(frame, k=10).collect()
        }
        assert got[(0, "x")] > got[(1, "x")]


class TestCommonNeighborLinkPred:
    def test_hand_wedge(self, spark):
        from datafusion_pinot_spark.operators.graph import (
            common_neighbor_link_pred,
        )

        # orders {1,2} and {2,3}: edges (1,2), (2,3); the only predicted
        # link is (1,3) through the shared neighbor 2, jaccard 1/1
        li = spark.createDataFrame(
            [
                Row(l_orderkey=10, l_partkey=1),
                Row(l_orderkey=10, l_partkey=2),
                Row(l_orderkey=11, l_partkey=2),
                Row(l_orderkey=11, l_partkey=3),
            ]
        )
        rows = common_neighbor_link_pred(li, min_support=1).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r.part_a, r.part_b, r.common_neighbors) == (1, 3, 1)
        assert (r.deg_a, r.deg_b, r.jaccard_ppm) == (1, 1, 1_000_000)

    def test_existing_edges_excluded(self, spark):
        from datafusion_pinot_spark.operators.graph import (
            common_neighbor_link_pred,
        )

        # a triangle has no unlinked pairs to predict
        li = spark.createDataFrame(
            [
                Row(l_orderkey=10, l_partkey=p)
                for p in (1, 2, 3)
            ]
        )
        assert common_neighbor_link_pred(li, min_support=1).count() == 0

    def test_support_floor_prunes_noise_edges(self, spark):
        from datafusion_pinot_spark.operators.graph import (
            common_neighbor_link_pred,
        )

        # the (1,2) and (2,3) edges repeat in two orders; (2,4) occurs
        # once -> at min_support=2 part 4 is not in the graph at all
        rows = []
        for o, parts in [
            (10, (1, 2)), (11, (2, 3)), (12, (1, 2)), (13, (2, 3)),
            (14, (2, 4)),
        ]:
            rows += [Row(l_orderkey=o, l_partkey=p) for p in parts]
        li = spark.createDataFrame(rows)
        out = common_neighbor_link_pred(li).collect()
        assert [(r.part_a, r.part_b) for r in out] == [(1, 3)]

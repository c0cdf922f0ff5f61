"""Round 13 operators: hand-value and invariant tests for the r14
first-check backlog (CUSUM changepoint, Kendall tau, packing waste curve,
quality config ablation, Bloom decontamination, CMS audit, LSH band
tuning, as-of tolerance join). Every operator also runs under the full
DuckDB hash gate via tests/test_queries_oracle.py; these tests pin the
SEMANTICS with tiny frames a human can check by hand, plus the
structural invariants the oracle comparison alone cannot express
(supersets, monotonicity, no-false-negatives)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row, functions as F

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


class TestCusumChangepoint:
    def _events(self, spark, per_day):
        rows = [
            Row(ts=datetime.datetime(2024, 1, d + 1, 12, 0, 0), value=float(v))
            for d, v in enumerate(per_day)
        ]
        return spark.createDataFrame(rows)

    def test_level_shift_peaks_at_shift_day(self, spark):
        from datafusion_pinot_spark.operators.temporal import (
            cusum_changepoint_daily,
        )

        # 5 days at 10.00 then 5 days at 20.00: |CUSUM| peaks exactly at
        # the last pre-shift day (day 5)
        out = cusum_changepoint_daily(
            self._events(spark, [10] * 5 + [20] * 5)
        ).collect()
        assert len(out) == 10
        flagged = [r.day for r in out if r.is_changepoint]
        assert flagged == [datetime.date(2024, 1, 5)]
        # hand value in CENTS: N=10, total=5*1000+5*2000=15000; at day 5
        # prefix=5000, cusum = 10*5000 - 5*15000 = -25000
        d5 = next(r for r in out if r.day == datetime.date(2024, 1, 5))
        assert d5.cusum_scaled == -25000
        # the last day's CUSUM is identically zero by construction
        assert out[-1].cusum_scaled == 0

    def test_constant_series_flags_everything_at_zero(self, spark):
        from datafusion_pinot_spark.operators.temporal import (
            cusum_changepoint_daily,
        )

        out = cusum_changepoint_daily(
            self._events(spark, [7, 7, 7])
        ).collect()
        assert [r.cusum_scaled for r in out] == [0, 0, 0]
        assert all(r.is_changepoint for r in out)

    def test_single_day_degenerate(self, spark):
        from datafusion_pinot_spark.operators.temporal import (
            cusum_changepoint_daily,
        )

        out = cusum_changepoint_daily(self._events(spark, [5])).collect()
        assert len(out) == 1 and out[0].cusum_scaled == 0


class TestKendallTau:
    def _orders(self, spark, rows):
        return spark.createDataFrame(
            [
                Row(o_orderdate=datetime.date(2024, 1, d), o_totalprice=float(p))
                for d, p in rows
            ]
        )

    def test_perfect_concordance(self, spark):
        from datafusion_pinot_spark.operators.validation import (
            kendall_tau_daily,
        )

        # day d has d orders each of price d: count and revenue both
        # strictly increase -> tau_a = 1.0
        rows = []
        for d in range(1, 5):
            rows += [(d, d)] * d
        out = kendall_tau_daily(self._orders(spark, rows)).collect()[0]
        assert out.n_days == 4 and out.n_pairs == 6
        assert out.concordant == 6 and out.discordant == 0
        assert out.tau_a_ppm == 1_000_000

    def test_perfect_discordance_is_negative(self, spark):
        from datafusion_pinot_spark.operators.validation import (
            kendall_tau_daily,
        )

        # counts increase with day, revenue decreases: tau = -1; the
        # sign-split division must emit exactly -1e6 (a floor-division
        # engine would emit -1000000 too here, but the sign path is what
        # the non-round cases rely on)
        rows = []
        for d, price in ((1, 30.0), (2, 10.0), (3, 3.0)):
            rows += [(d, price)] * d  # revenue 3000, 2000, 900 cents
        out = kendall_tau_daily(self._orders(spark, rows)).collect()[0]
        assert out.concordant == 0 and out.discordant == 3
        assert out.tau_a_ppm == -1_000_000

    def test_matches_pure_python_on_real_data(self, spark):
        from datafusion_pinot_spark.operators.validation import (
            kendall_tau_daily,
        )

        orders = spark.read.parquet(f"{SF}/orders.parquet")
        out = kendall_tau_daily(orders).collect()[0]
        daily = {}
        for r in orders.select("o_orderdate", "o_totalprice").collect():
            c, y = daily.get(r.o_orderdate, (0, 0))
            daily[r.o_orderdate] = (c + 1, y + round(float(r.o_totalprice) * 100))
        days = sorted(daily)
        conc = disc = tx = ty = tb = 0
        for i in range(len(days)):
            for j in range(i + 1, len(days)):
                (x1, y1), (x2, y2) = daily[days[i]], daily[days[j]]
                sx = (x1 > x2) - (x1 < x2)
                sy = (y1 > y2) - (y1 < y2)
                if sx * sy == 1:
                    conc += 1
                elif sx * sy == -1:
                    disc += 1
                elif sx == 0 and sy == 0:
                    tb += 1
                elif sx == 0:
                    tx += 1
                else:
                    ty += 1
        assert (out.concordant, out.discordant) == (conc, disc)
        assert (out.ties_x, out.ties_y, out.ties_both) == (tx, ty, tb)


class TestPackingWasteCurve:
    def test_hand_values(self, spark):
        from datafusion_pinot_spark.operators.curation import (
            packing_waste_curve,
        )

        docs = spark.createDataFrame(
            [
                Row(doc_id=1, text="a b c"),  # 3 tokens
                Row(doc_id=2, text=" ".join(["w"] * 10)),  # 10 tokens
                Row(doc_id=3, text=""),  # dropped (0 tokens)
            ]
        )
        out = {
            r.ctx_len: r
            for r in packing_waste_curve(docs, ctx_lens=(4, 8)).collect()
        }
        r4 = out[4]
        assert r4.n_docs == 2 and r4.n_truncated == 1
        assert r4.tokens_total == 13
        assert r4.tokens_kept == 3 + 4 and r4.tokens_trunc == 6
        assert r4.pad_tokens == 1  # doc 1 pads 1; doc 2 pads 0
        assert r4.util_ppm == 7 * 1_000_000 // (2 * 4)
        r8 = out[8]
        assert r8.tokens_kept == 3 + 8 and r8.pad_tokens == 5

    def test_conservation_invariants_on_corpus(self, spark):
        from datafusion_pinot_spark.operators.curation import (
            packing_waste_curve,
        )

        for r in packing_waste_curve(_docs(spark)).collect():
            assert r.tokens_kept + r.tokens_trunc == r.tokens_total
            assert r.tokens_kept + r.pad_tokens == r.n_docs * r.ctx_len
            assert 0 < r.util_ppm <= 1_000_000


class TestQualityConfigAblation:
    def test_masks_partition_the_corpus(self, spark):
        from datafusion_pinot_spark.operators.curation import (
            quality_config_ablation,
        )

        out = quality_config_ablation(_docs(spark)).collect()
        assert sum(r.n_docs for r in out) == _docs(spark).count()
        for r in out:
            # mask encodes exactly the keep booleans
            mask = (
                int(r.keep_len_gate)
                + 2 * int(r.keep_rep_gate)
                + 4 * int(r.keep_balanced)
            )
            assert r.mask == mask

    def test_hand_doc_crossing_configs(self, spark):
        from datafusion_pinot_spark.operators.curation import (
            quality_config_ablation,
        )

        # 40 distinct tokens: passes len_gate (>=30) and balanced (>=15,
        # clean) and rep_gate (no repetition) -> mask 7. A 10x-repeated
        # token doc fails every gate (short AND repetitive) -> mask 0.
        clean = " ".join(f"tok{i}" for i in range(40))
        spam = " ".join(["spam"] * 10)
        docs = spark.createDataFrame(
            [Row(doc_id=1, text=clean), Row(doc_id=2, text=spam)]
        )
        out = {r.mask: r for r in quality_config_ablation(docs).collect()}
        assert set(out) == {0, 7}
        assert out[7].n_docs == 1 and out[7].tokens == 40
        assert out[0].n_docs == 1 and out[0].tokens == 10


class TestBloomDecontam:
    def test_no_false_negatives_on_corpus(self, spark):
        from datafusion_pinot_spark.operators.curation import (
            bloom_decontam_audit,
        )

        out = bloom_decontam_audit(_docs(spark)).collect()
        assert len(out) > 0
        for r in out:
            # Bloom filters never miss: exact-flagged docs are always
            # bloom-flagged, and the gap is exactly the false positives
            assert r.exact_flagged <= r.bloom_flagged
            assert r.false_pos_docs == r.bloom_flagged - r.exact_flagged
            assert r.bloom_flagged <= r.n_docs

    def test_verbatim_copy_is_exact_flagged(self, spark):
        from datafusion_pinot_spark.operators.curation import (
            bloom_decontam_audit,
        )

        bench = "alpha beta gamma delta epsilon zeta"
        docs = spark.createDataFrame(
            [
                Row(doc_id=0, source="bench", text=bench),  # probe
                Row(doc_id=100, source="corp", text=bench),  # verbatim dup
                Row(
                    doc_id=101,
                    source="corp",
                    text="one two three four five six seven",
                ),  # disjoint
            ]
        )
        out = {
            r.source: r
            for r in bloom_decontam_audit(docs, probe_max_doc=10).collect()
        }
        assert out["corp"].exact_flagged == 1
        assert out["corp"].bloom_flagged >= 1
        assert out["corp"].n_docs == 2


class TestCmsFrequencyAudit:
    def test_never_underestimates(self, spark):
        from datafusion_pinot_spark.operators.sketches import (
            cms_frequency_audit,
        )

        out = cms_frequency_audit(_docs(spark)).collect()
        assert len(out) == 20
        for r in out:
            assert r.cms_est >= r.true_cnt
            assert r.over_est == r.cms_est - r.true_cnt
            assert r.over_ppm >= 0

    def test_exact_when_no_collisions(self, spark):
        from datafusion_pinot_spark.operators.sketches import (
            cms_frequency_audit,
        )

        # 3 distinct 3-grams in a 1024-wide sketch: collisions would need
        # two of three specific md5 values to agree mod 1024 in EVERY row
        docs = spark.createDataFrame(
            [Row(doc_id=1, text="a b c d e")]  # grams: "a b c","b c d","c d e"
        )
        out = cms_frequency_audit(docs, probe_k=5).collect()
        assert len(out) == 3
        for r in out:
            assert r.cms_est == r.true_cnt == 1 and r.over_est == 0

    def test_width_governs_overestimate(self, spark):
        from datafusion_pinot_spark.operators.sketches import (
            cms_frequency_audit,
        )

        # same corpus, 8x narrower sketch: total overestimate must not
        # shrink (counter mass is conserved; fewer buckets only merge)
        wide = cms_frequency_audit(_docs(spark), width=1024).collect()
        narrow = cms_frequency_audit(_docs(spark), width=128).collect()
        assert sum(r.over_est for r in narrow) >= sum(
            r.over_est for r in wide
        )


class TestLshBandTuningCurve:
    def test_nested_band_configs_are_supersets(self, spark):
        from datafusion_pinot_spark.operators.dedup import (
            lsh_band_tuning_curve,
        )

        # k=8 with bands 1|2|4 NEST: a pair agreeing on an 8-row band
        # agrees on both 4-row halves, etc. So candidates — and therefore
        # verified and recall — are monotone nondecreasing in bands, and
        # precision is monotone nonincreasing-or-equal only in tendency
        # (not asserted). n_true is config-independent.
        out = sorted(
            lsh_band_tuning_curve(_docs(spark)).collect(),
            key=lambda r: r.bands,
        )
        assert [r.bands for r in out] == [1, 2, 4]
        assert len({r.n_true for r in out}) == 1
        for a, b in zip(out, out[1:]):
            assert a.n_candidates <= b.n_candidates
            assert a.n_verified <= b.n_verified
            assert a.recall_ppm <= b.recall_ppm
            assert a.rows_per_band == 2 * b.rows_per_band

    def test_identical_docs_candidate_in_every_config(self, spark):
        from datafusion_pinot_spark.operators.dedup import (
            lsh_band_tuning_curve,
        )

        text = "the quick brown fox jumps over the lazy dog"
        docs = spark.createDataFrame(
            [Row(doc_id=1, text=text), Row(doc_id=2, text=text)]
        )
        for r in lsh_band_tuning_curve(docs).collect():
            assert r.n_candidates == 1 and r.n_verified == 1
            assert r.n_true == 1
            assert r.precision_ppm == 1_000_000
            assert r.recall_ppm == 1_000_000


class TestAsofJoinTolerance:
    def _events(self, spark, rows):
        return spark.createDataFrame(
            [
                Row(
                    event_id=i,
                    user_id=u,
                    event_type=ty,
                    ts=datetime.datetime(2024, 1, 1, 0, 0, s),
                )
                for i, u, ty, s in rows
            ]
        )

    def test_hand_semantics(self, spark):
        from datafusion_pinot_spark.operators.temporal import (
            asof_join_tolerance,
        )

        ev = self._events(
            spark,
            [
                (1, 10, "view", 0),
                (2, 10, "purchase", 5),  # gap 5s -> matched to view 1
                (3, 20, "purchase", 30),  # no prior view -> unmatched
                (4, 30, "view", 10),
                (5, 30, "purchase", 40),  # gap 30s > tol 10 -> unmatched
            ],
        )
        out = {
            r.event_id: r
            for r in asof_join_tolerance(ev, tolerance_s=10).collect()
        }
        assert set(out) == {2, 3, 5}
        assert out[2].matched and out[2].asof_event_id == 1
        assert out[2].prior_gap_s == 5
        assert not out[3].matched and out[3].prior_gap_s is None
        assert out[3].asof_event_id is None
        assert not out[5].matched and out[5].prior_gap_s == 30
        assert out[5].asof_event_id is None  # gated by tolerance

    def test_tie_at_same_timestamp_matches_max_id(self, spark):
        from datafusion_pinot_spark.operators.temporal import (
            asof_join_tolerance,
        )

        # two views at EXACTLY the purchase timestamp: >= semantics
        # matches, deterministic tie-break keeps the max event_id
        ev = self._events(
            spark,
            [
                (1, 10, "view", 7),
                (2, 10, "view", 7),
                (3, 10, "purchase", 7),
            ],
        )
        out = asof_join_tolerance(ev, tolerance_s=60).collect()
        assert len(out) == 1
        assert out[0].matched and out[0].prior_gap_s == 0
        assert out[0].asof_event_id == 2


class TestStreamAsofAttribution:
    def test_streaming_equals_batch_twin(self, spark):
        """The drained streaming state machine must equal the BATCH
        asof_join_tolerance aggregated per user — two independent
        implementations (stateful fold vs union-and-window sweep) of the
        same attribution semantics."""
        from datafusion_pinot_spark.operators.temporal import (
            asof_join_tolerance,
        )
        from datafusion_pinot_spark.streaming.stateful import (
            stream_asof_attribution,
        )

        got = {
            r.user_id: (
                r.n_purchases,
                r.n_matched,
                r.n_unmatched,
                r.matched_gap_s_sum,
            )
            for r in stream_asof_attribution(
                spark, f"{SF}/events.parquet"
            ).collect()
        }
        batch = asof_join_tolerance(
            spark.read.parquet(f"{SF}/events.parquet")
        ).collect()
        ref = {}
        for r in batch:
            np_, nm, gs = ref.get(r.user_id, (0, 0, 0))
            np_ += 1
            if r.matched:
                nm += 1
                gs += r.prior_gap_s
            ref[r.user_id] = (np_, nm, gs)
        assert got == {
            u: (np_, nm, np_ - nm, gs) for u, (np_, nm, gs) in ref.items()
        }

    def test_view_only_user_emits_no_row(self, spark):
        import datetime as dt

        from pyspark.sql import Row

        from datafusion_pinot_spark.streaming.stateful import (
            stream_asof_attribution,
        )

        base = dt.datetime(2024, 5, 1)
        rows = [
            Row(event_id=1, user_id=1, event_type="view", ts=base),
            Row(
                event_id=2,
                user_id=2,
                event_type="view",
                ts=base + dt.timedelta(seconds=5),
            ),
            Row(
                event_id=3,
                user_id=2,
                event_type="purchase",
                ts=base + dt.timedelta(seconds=9),
            ),
        ]
        import glob
        import os
        import shutil
        import tempfile

        # the file-source helper streams ONE parquet file (it globs the
        # basename within the parent dir), so surface a single part file
        d = tempfile.mkdtemp(prefix="sasof_")
        spark.createDataFrame(rows).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{d}/out")
        path = f"{d}/ev.parquet"
        shutil.move(glob.glob(f"{d}/out/part-*.parquet")[0], path)
        out = stream_asof_attribution(spark, path, tolerance_s=60).collect()
        assert [r.user_id for r in out] == [2]
        assert out[0].n_matched == 1 and out[0].matched_gap_s_sum == 4


class TestEmbeddingDimStats:
    def test_hand_values_and_dead_dim(self, spark):
        from datafusion_pinot_spark.operators.similarity import (
            embedding_dim_stats,
        )

        emb = spark.createDataFrame(
            [
                Row(vec_id=1, embedding=[1.0, 0.5, 0.0], label="a"),
                Row(vec_id=2, embedding=[-1.0, 0.5, 0.0], label="b"),
            ]
        )
        out = {r.dim: r for r in embedding_dim_stats(emb).collect()}
        assert set(out) == {0, 1, 2}
        d0 = out[0]
        assert (d0.n, d0.sum_milli, d0.sumsq_micro) == (2, 0, 2_000_000)
        assert (d0.min_milli, d0.max_milli, d0.is_dead) == (-1000, 1000, False)
        d1 = out[1]
        assert d1.is_dead and d1.min_milli == d1.max_milli == 500
        d2 = out[2]
        assert d2.is_dead and d2.n_zero == 2

    def test_every_dim_counts_every_vector(self, spark):
        from datafusion_pinot_spark.operators.similarity import (
            embedding_dim_stats,
        )

        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        out = embedding_dim_stats(emb).collect()
        n_vecs = emb.count()
        assert len(out) == 64
        for r in out:
            assert r.n == n_vecs
            assert r.min_milli <= r.max_milli
            assert r.sumsq_micro >= 0


class TestSourceDedupMatrix:
    def test_cross_source_near_dups_land_off_diagonal(self, spark):
        from datafusion_pinot_spark.operators.dedup import (
            source_dedup_matrix,
        )

        text = "alpha beta gamma delta epsilon zeta eta theta"
        docs = spark.createDataFrame(
            [
                Row(doc_id=1, source="s1", text=text),
                Row(doc_id=2, source="s2", text=text),
                Row(doc_id=3, source="s1", text=text),
                Row(
                    doc_id=4,
                    source="s3",
                    text="one two three four five six seven eight",
                ),
            ]
        )
        out = {(r.src_a, r.src_b): r.n_pairs for r in source_dedup_matrix(docs).collect()}
        # docs 1,2,3 identical: pairs (1,2) s1-s2, (1,3) s1-s1, (2,3) s1-s2
        assert out == {("s1", "s2"): 2, ("s1", "s1"): 1}

    def test_pairs_conserved_against_verified_pipeline(self, spark):
        from datafusion_pinot_spark.operators.dedup import (
            minhash_lsh_candidates_md5,
            ngram_jaccard_verify,
            source_dedup_matrix,
        )

        docs = _docs(spark)
        total = (
            ngram_jaccard_verify(
                docs, minhash_lsh_candidates_md5(docs, bands=4)
            ).count()
        )
        out = source_dedup_matrix(docs).collect()
        assert sum(r.n_pairs for r in out) == total


class TestDedupCostPlanner:
    def test_hand_identical_docs(self, spark):
        from datafusion_pinot_spark.operators.dedup import (
            dedup_cost_planner,
        )

        text = "the quick brown fox jumps over the lazy dog"
        docs = spark.createDataFrame(
            [Row(doc_id=1, text=text), Row(doc_id=2, text=text)]
        )
        out = dedup_cost_planner(docs).collect()
        # per config: every band bucket holds both docs (size 2 ->
        # log2 bucket 1, implied 1 pair per band)
        for r in out:
            assert r.size_log2 == 1
            assert r.n_buckets == r.bands
            assert r.n_entries == 2 * r.bands
            assert r.implied_pairs == r.bands

    def test_entry_conservation_on_corpus(self, spark):
        from datafusion_pinot_spark.operators.dedup import (
            dedup_cost_planner,
            minhash_signatures,
        )

        docs = _docs(spark)
        n_sig = (
            minhash_signatures(docs)
            .filter(F.col("mh0").isNotNull())
            .count()
        )
        out = dedup_cost_planner(docs).collect()
        per_bands = {}
        for r in out:
            e, p = per_bands.get(r.bands, (0, 0))
            per_bands[r.bands] = (e + r.n_entries, p + r.implied_pairs)
        # every signature lands in exactly `bands` buckets
        for bands, (entries, pairs) in per_bands.items():
            assert entries == bands * n_sig
            assert pairs >= 0


class TestAbTestSrmCheck:
    def test_counts_partition_users(self, spark):
        from datafusion_pinot_spark.operators.validation import (
            ab_test_srm_check,
        )

        ev = spark.read.parquet(f"{SF}/events.parquet")
        out = ab_test_srm_check(ev).collect()
        cohorts = (
            ev.select("event_type", "user_id")
            .distinct()
            .groupBy("event_type")
            .count()
            .collect()
        )
        ref = {r.event_type: r["count"] for r in cohorts}
        for r in out:
            assert r.n_arm_a + r.n_arm_b == r.n_users == ref[r.event_type]
            assert r.chi2_milli == (
                (r.n_arm_a - r.n_arm_b) ** 2 * 1000
            ) // r.n_users

    def test_skewed_assignment_trips_flag(self, spark):
        from datafusion_pinot_spark.operators.validation import (
            ab_test_srm_check,
        )

        # find user ids that all hash to arm 0 so a filtered cohort is
        # maximally skewed — the failure mode SRM exists to catch
        import hashlib

        arm0 = [
            u
            for u in range(400)
            if int(hashlib.md5(f"arm|{u}".encode()).hexdigest()[:12], 16) % 2
            == 0
        ][:50]
        ev = spark.createDataFrame(
            [Row(event_type="exp", user_id=u) for u in arm0]
        )
        out = ab_test_srm_check(ev).collect()[0]
        assert out.n_arm_a == 50 and out.n_arm_b == 0
        assert out.chi2_milli == 50 * 1000 and out.srm_flag


class TestSplitQualityParity:
    def test_shares_sum_and_split_consistency(self, spark):
        from datafusion_pinot_spark.operators.curation import (
            split_leakage_audit,
            split_quality_parity,
        )

        out = split_quality_parity(_docs(spark)).collect()
        by_split = {}
        for r in out:
            by_split.setdefault(r.split, []).append(r)
        assert set(by_split) == {"train", "valid"}
        # split sizes agree with the leakage audit (same hash rule)
        leak = split_leakage_audit(_docs(spark)).collect()[0]
        assert sum(r.n_docs for r in by_split["train"]) == leak.n_train
        assert sum(r.n_docs for r in by_split["valid"]) == leak.n_valid
        for split, rows in by_split.items():
            total = sum(r.n_docs for r in rows)
            for r in rows:
                assert r.share_ppm == r.n_docs * 1_000_000 // total


class TestQualityParetoFrontier:
    def test_frontier_is_mutually_nondominated_and_complete(self, spark):
        from datafusion_pinot_spark.operators.curation import (
            quality_pareto_frontier,
        )
        from datafusion_pinot_spark.operators.text import quality_signals

        frontier = quality_pareto_frontier(_docs(spark)).collect()
        allpts = [
            (r.doc_id, r.n_tokens, r.dup2_milli)
            for r in quality_signals(_docs(spark))
            .select("doc_id", "n_tokens", "dup2_milli")
            .collect()
        ]

        def dominates(p, q):
            return (
                p[1] >= q[1]
                and p[2] <= q[2]
                and (p[1] > q[1] or p[2] < q[2])
            )

        fset = {r.doc_id for r in frontier}
        # brute-force reference frontier over the 500-doc corpus
        ref = {
            pid
            for (pid, x, y) in allpts
            if not any(
                dominates(p, (pid, x, y)) for p in allpts if p[0] != pid
            )
        }
        assert fset == ref

    def test_hand_frontier(self, spark):
        from datafusion_pinot_spark.operators.curation import (
            quality_pareto_frontier,
        )

        # doc1: 5 clean tokens; doc2: 3 clean tokens (dominated by doc1);
        # doc3: 6 tokens but one repeated bigram (tradeoff -> frontier)
        docs = spark.createDataFrame(
            [
                Row(doc_id=1, text="a b c d e"),
                Row(doc_id=2, text="x y z"),
                Row(doc_id=3, text="p q p q r s"),
            ]
        )
        out = quality_pareto_frontier(docs).collect()
        assert [r.doc_id for r in out] == [3, 1]


class TestStreamCmsBuckets:
    def test_streaming_equals_batch_sketch(self, spark):
        """The drained streaming aggregation must equal the bucket table
        the batch CMS audit derives — sketch maintenance is exactly a
        keyed running count, so the streaming engine's own aggregation
        state IS the sketch."""
        from datafusion_pinot_spark.streaming.windowed import (
            stream_cms_buckets,
        )

        got = {
            (r.r, r.pos): r.bucket_cnt
            for r in stream_cms_buckets(
                spark, f"{SF}/documents.parquet"
            ).collect()
        }
        # batch reference: same fanout computed statically
        from datafusion_pinot_spark.functions import tokens
        from datafusion_pinot_spark.operators.sketches import _cms_pos

        toks = _docs(spark).select(tokens(F.col("text")).alias("w")).filter(
            F.size("w") >= 3
        )
        grams = toks.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 2),"
                    " i -> concat_ws(' ', element_at(w, i),"
                    " element_at(w, i + 1), element_at(w, i + 2)))"
                )
            ).alias("tok")
        )
        ref = {
            (r.r, r.pos): r.cnt
            for r in grams.select(
                F.posexplode(
                    F.array(*[_cms_pos(F.col("tok"), j, 1024) for j in range(4)])
                ).alias("r", "pos")
            )
            .groupBy("r", "pos")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        assert got == ref
        assert sum(got.values()) % 4 == 0  # every gram lands in 4 rows


class TestCusumOverflowGuard:
    def test_guard_trips_instead_of_wrapping(self, spark):
        """The N*prefix multiply must fail LOUDLY past the BIGINT bound —
        and the guard must live inside the emitted expression, because a
        separate never-selected guard column is dead code Catalyst
        prunes (verified: the pruned variant silently wrapped)."""
        import datetime as dt

        from datafusion_pinot_spark.operators.temporal import (
            cusum_changepoint_daily,
        )

        # the guard's window: prefix sums still FIT in BIGINT (ANSI mode
        # would already fail loudly if they didn't — 10 such days trip
        # ARITHMETIC_OVERFLOW upstream) but N * prefix does not. Four
        # days of ~9.9e17 cents: prefix tops at ~4e18 < 2^63, while
        # 4 * 4e18 overflows — the CASE must raise BEFORE multiplying.
        big = 9.9e15
        ev = spark.createDataFrame(
            [
                Row(
                    ts=dt.datetime(2024, 1, d + 1, 12, 0, 0),
                    value=float(big),
                )
                for d in range(4)
            ]
        )
        with pytest.raises(Exception, match="cusum_changepoint_daily"):
            cusum_changepoint_daily(ev).collect()


class TestKendallDegenerate:
    def test_single_day_emits_zero_tau(self, spark):
        """One distinct day -> zero pairs: the tau division must emit 0,
        not an ANSI divide-by-zero (and DuckDB's // 0 would error the
        oracle identically)."""
        import datetime as dt

        from datafusion_pinot_spark.operators.validation import (
            kendall_tau_daily,
        )

        orders = spark.createDataFrame(
            [
                Row(o_orderdate=dt.date(2024, 1, 1), o_totalprice=5.0),
                Row(o_orderdate=dt.date(2024, 1, 1), o_totalprice=7.0),
            ]
        )
        out = kendall_tau_daily(orders).collect()[0]
        assert out.n_days == 1 and out.n_pairs == 0
        assert out.tau_a_ppm == 0


class TestCohortLtvCurve:
    def test_hand_curve(self, spark):
        import datetime as dt

        from datafusion_pinot_spark.operators.temporal import (
            cohort_ltv_curve,
        )

        # two users sign up Mon 2024-01-01 week; u1 buys 10.00 in week 0
        # and 20.00 in week 1; u2 never buys; u3 (no signup) buys — excluded
        mk = lambda i, u, ty, day, v: Row(  # noqa: E731
            event_id=i,
            user_id=u,
            event_type=ty,
            ts=dt.datetime(2024, 1, day, 12, 0, 0),
            value=float(v),
        )
        ev = spark.createDataFrame(
            [
                mk(1, 1, "signup", 2, 0),
                mk(2, 2, "signup", 3, 0),
                mk(3, 1, "purchase", 4, 10),
                mk(4, 1, "purchase", 9, 20),
                mk(5, 3, "purchase", 4, 99),
            ]
        )
        out = {r.weeks_since: r for r in cohort_ltv_curve(ev).collect()}
        assert set(out) == {0, 1}
        w0, w1 = out[0], out[1]
        assert w0.cohort_week == dt.date(2024, 1, 1)
        assert w0.cohort_users == 2 and w0.purchasers == 1
        assert w0.revenue_cents == 1000 and w0.cum_revenue_cents == 1000
        assert w0.ltv_milli_cents == 1000 * 1000 // 2
        assert w1.revenue_cents == 2000 and w1.cum_revenue_cents == 3000
        assert w1.ltv_milli_cents == 3000 * 1000 // 2

    def test_cumulative_is_monotone_per_cohort(self, spark):
        from datafusion_pinot_spark.operators.temporal import (
            cohort_ltv_curve,
        )

        ev = spark.read.parquet(f"{SF}/events.parquet")
        rows = cohort_ltv_curve(ev).collect()
        last = {}
        for r in rows:  # already ordered by cohort_week, weeks_since
            prev = last.get(r.cohort_week, 0)
            assert r.cum_revenue_cents == prev + r.revenue_cents
            last[r.cohort_week] = r.cum_revenue_cents


class TestTokenDistChi2:
    def test_uniform_sources_score_zero(self, spark):
        from datafusion_pinot_spark.operators.text import (
            token_dist_chi2_by_source,
        )

        # two sources with IDENTICAL token distributions: every o equals
        # its expectation exactly -> chi2 == 0
        docs = spark.createDataFrame(
            [
                Row(doc_id=1, source="a", text="x x y"),
                Row(doc_id=2, source="b", text="x x y"),
            ]
        )
        for r in token_dist_chi2_by_source(docs).collect():
            assert r.chi2_milli == 0 and not r.drift_flag

    def test_disjoint_source_trips_flag(self, spark):
        from datafusion_pinot_spark.operators.text import (
            token_dist_chi2_by_source,
        )

        # source b uses a token a never emits (and vice versa), many
        # times over: maximal drift, flag must trip
        docs = spark.createDataFrame(
            [
                Row(doc_id=1, source="a", text=" ".join(["x"] * 200)),
                Row(doc_id=2, source="b", text=" ".join(["y"] * 200)),
            ]
        )
        out = {r.source: r for r in token_dist_chi2_by_source(docs).collect()}
        assert out["a"].drift_flag and out["b"].drift_flag
        # closed form: each source's two terms sum to N/2 * 2 = N... the
        # exact milli value: term(o=200,c=200,n=200,N=400) = 100_000;
        # term(o=0) computed only for PRESENT tokens, so each source has
        # one term of (200*400 - 200*200)^2*1000 // (400*200*200)
        assert out["a"].chi2_milli == (200 * 400 - 200 * 200) ** 2 * 1000 // (
            400 * 200 * 200
        )


class TestSeasonalDecomposition:
    def test_flat_series_decomposes_to_zero(self, spark):
        import datetime as dt

        from datafusion_pinot_spark.operators.temporal import (
            seasonal_decomposition_daily,
        )

        # 14 flat days: trend = 7*x everywhere it exists, detrended = 0,
        # dow effects = 0, residuals = 0; edges (first/last 3 days) NULL
        ev = spark.createDataFrame(
            [
                Row(
                    ts=dt.datetime(2024, 1, d, 12, 0, 0), value=10.0
                )
                for d in range(1, 15)
            ]
        )
        out = seasonal_decomposition_daily(ev).collect()
        assert len(out) == 14
        for i, r in enumerate(out):
            if 3 <= i < 11:
                assert r.trend_x7 == 7 * 1000
                assert r.detrended_x7 == 0
                assert r.dow_effect_milli == 0 and r.resid_x7n == 0
            else:
                assert r.trend_x7 is None and r.detrended_x7 is None

    def test_calendar_gap_voids_trend(self, spark):
        import datetime as dt

        from datafusion_pinot_spark.operators.temporal import (
            seasonal_decomposition_daily,
        )

        # 7 days, then a 3-day hole, then 7 more: no day has a full
        # 7-day calendar window spanning the hole — a ROW frame would
        # silently misalign here, the RANGE frame must return NULL
        days = list(range(1, 8)) + list(range(11, 18))
        ev = spark.createDataFrame(
            [
                Row(ts=dt.datetime(2024, 1, d, 12, 0, 0), value=5.0)
                for d in days
            ]
        )
        out = {r.day: r for r in seasonal_decomposition_daily(ev).collect()}
        assert out[datetime.date(2024, 1, 4)].trend_x7 is not None
        for d in (5, 6, 7, 11, 12, 13):
            assert out[datetime.date(2024, 1, d)].trend_x7 is None
        assert out[datetime.date(2024, 1, 14)].trend_x7 is not None

    def test_residual_identity_on_corpus(self, spark):
        from datafusion_pinot_spark.operators.temporal import (
            seasonal_decomposition_daily,
        )

        ev = spark.read.parquet(f"{SF}/events.parquet")
        rows = [
            r
            for r in seasonal_decomposition_daily(ev).collect()
            if r.detrended_x7 is not None
        ]
        assert rows
        # per dow, residuals (detr*n - sum) sum to zero exactly
        by_dow = {}
        for r in rows:
            by_dow.setdefault(r.dow, []).append(r.resid_x7n)
        for dow, res in by_dow.items():
            assert sum(res) == 0


class TestInterEventCv2:
    def test_regular_vs_bursty(self, spark):
        import datetime as dt

        from datafusion_pinot_spark.operators.temporal import (
            interevent_cv2_by_user,
        )

        base = dt.datetime(2024, 1, 1)
        rows = []
        # user 1: perfectly regular (gap 60s x 5) -> cv2 = 0
        for i in range(6):
            rows.append(
                Row(
                    event_id=i,
                    user_id=1,
                    event_type="view",
                    ts=base + dt.timedelta(seconds=60 * i),
                    value=0.0,
                )
            )
        # user 2: bursty — gaps 1,1,1,237 (mean 60): cv2 >> 1000
        offs = [0, 1, 2, 3, 240]
        for i, o in enumerate(offs):
            rows.append(
                Row(
                    event_id=100 + i,
                    user_id=2,
                    event_type="view",
                    ts=base + dt.timedelta(seconds=o),
                    value=0.0,
                )
            )
        out = {
            r.user_id: r
            for r in interevent_cv2_by_user(
                spark.createDataFrame(rows)
            ).collect()
        }
        assert out[1].cv2_milli == 0 and out[1].mean_gap_s == 60
        assert out[2].cv2_milli > 1000
        # exact: gaps (1,1,1,237), n=4, s1=240, s2=56172
        n, s1, s2 = 4, 240, 1 + 1 + 1 + 237 * 237
        assert out[2].cv2_milli == n * (n * s2 - s1 * s1) * 1000 // (
            (n - 1) * s1 * s1
        )

    def test_single_gap_user_excluded(self, spark):
        import datetime as dt

        from datafusion_pinot_spark.operators.temporal import (
            interevent_cv2_by_user,
        )

        base = dt.datetime(2024, 1, 1)
        ev = spark.createDataFrame(
            [
                Row(event_id=1, user_id=1, event_type="v", ts=base, value=0.0),
                Row(
                    event_id=2,
                    user_id=1,
                    event_type="v",
                    ts=base + dt.timedelta(seconds=9),
                    value=0.0,
                ),
            ]
        )
        # one gap -> n_gaps = 1 < 2: no variance estimate, no row
        assert interevent_cv2_by_user(ev).count() == 0


class TestDailyAcf:
    def test_alternating_series_signs(self, spark):
        import datetime as dt

        from datafusion_pinot_spark.operators.temporal import (
            daily_acf_lags,
        )

        # perfect 2-cycle (10, 20, 10, 20, ...): lag-1 ACF is strongly
        # negative, lag-2 strongly positive, and signs alternate
        ev = spark.createDataFrame(
            [
                Row(
                    ts=dt.datetime(2024, 1, d + 1, 12, 0, 0),
                    value=float(10 if d % 2 == 0 else 20),
                )
                for d in range(20)
            ]
        )
        out = {r.lag: r for r in daily_acf_lags(ev, max_lag=4).collect()}
        assert out[1].acf_milli < -800
        assert out[2].acf_milli > 800
        assert out[3].acf_milli < -700
        assert out[4].acf_milli > 700
        assert out[1].n_pairs == 19 and out[4].n_pairs == 16

    def test_lag_zero_equivalent_is_one(self, spark):
        import datetime as dt

        from datafusion_pinot_spark.operators.temporal import (
            daily_acf_lags,
        )

        # constant series: deviations all zero -> den = 0 -> guarded 0s
        ev = spark.createDataFrame(
            [
                Row(ts=dt.datetime(2024, 1, d + 1), value=5.0)
                for d in range(10)
            ]
        )
        for r in daily_acf_lags(ev, max_lag=3).collect():
            assert r.acf_milli == 0

    def test_matches_numpy_reference(self, spark):
        from datafusion_pinot_spark.operators.temporal import (
            daily_acf_lags,
        )

        ev = spark.read.parquet(f"{SF}/events.parquet")
        out = {r.lag: r.acf_milli for r in daily_acf_lags(ev).collect()}
        daily = {}
        for r in ev.select(F.to_date("ts").alias("d"), "value").collect():
            cents = round(
                float(__import__("decimal").Decimal(str(r.value)).quantize(
                    __import__("decimal").Decimal("0.01")
                ) * 100)
            )
            daily[r.d] = daily.get(r.d, 0) + cents
        days = sorted(daily)
        n, t = len(days), sum(daily.values())
        dn = {d: (d - days[0]).days for d in days}
        dev = {dn[d]: n * daily[d] - t for d in days}
        den = sum(v * v for v in dev.values())
        for k in range(1, 8):
            num = sum(
                dev[i] * dev[i + k] for i in dev if i + k in dev
            )
            sign = 1 if num >= 0 else -1
            assert out[k] == sign * (abs(num) * 1000 // den)


class TestDedupSurvivalByLength:
    def test_hand_groups(self, spark):
        from datafusion_pinot_spark.operators.dedup import (
            dedup_survival_by_length,
        )

        text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        docs = spark.createDataFrame(
            [
                # three identical docs (one dup group, keep doc 1) at
                # n_chars 57 -> band 6; one unique long doc -> band 7
                Row(doc_id=1, text=text, n_chars=57),
                Row(doc_id=2, text=text, n_chars=57),
                Row(doc_id=3, text=text, n_chars=57),
                Row(doc_id=4, text="one two three four five six", n_chars=100),
            ]
        )
        out = {r.len_band: r for r in dedup_survival_by_length(docs).collect()}
        b6, b7 = out[6], out[7]
        assert b6.n_docs == 3 and b6.n_in_dup_groups == 3
        assert b6.n_kept == 1
        assert b6.doc_survival_ppm == 1_000_000 // 3
        assert b7.n_docs == 1 and b7.n_in_dup_groups == 0
        assert b7.n_kept == 1 and b7.doc_survival_ppm == 1_000_000

    def test_conservation_on_corpus(self, spark):
        from datafusion_pinot_spark.operators.dedup import (
            dedup_survival_by_length,
        )

        docs = _docs(spark)
        out = dedup_survival_by_length(docs).collect()
        assert sum(r.n_docs for r in out) == docs.count()
        for r in out:
            assert r.n_kept <= r.n_docs
            assert r.n_docs - r.n_kept <= r.n_in_dup_groups
            assert r.tokens_kept <= r.tokens


class TestStreamSrmMonitor:
    def test_streaming_equals_batch(self, spark):
        """Chained streaming dedup + aggregation must equal the batch SRM
        table — pins the two-stateful-operator composition."""
        from datafusion_pinot_spark.operators.validation import (
            ab_test_srm_check,
        )
        from datafusion_pinot_spark.streaming.windowed import (
            stream_srm_monitor,
        )

        got = [
            tuple(r)
            for r in stream_srm_monitor(
                spark, f"{SF}/events.parquet"
            ).collect()
        ]
        ref = [
            tuple(r)
            for r in ab_test_srm_check(
                spark.read.parquet(f"{SF}/events.parquet")
            ).collect()
        ]
        assert got == ref


class TestRevenueWaterfall:
    def test_conservation_and_hand_values(self, spark):
        import datetime as dt

        from datafusion_pinot_spark.operators.validation import (
            revenue_waterfall_yearly,
        )

        li = spark.createDataFrame(
            [
                Row(
                    l_extendedprice=100.0,
                    l_discount=0.05,
                    l_tax=0.08,
                    l_shipdate=dt.date(1995, 3, 1),
                ),
                Row(
                    l_extendedprice=200.0,
                    l_discount=0.0,
                    l_tax=0.0,
                    l_shipdate=dt.date(1995, 7, 1),
                ),
            ]
        )
        out = revenue_waterfall_yearly(li).collect()
        assert len(out) == 1
        r = out[0]
        assert r.ship_year == 1995 and r.n_lines == 2
        assert r.gross_micro == 300_000_000
        assert r.discount_micro == 5_000_000
        # tax on net: (100 - 5) * 0.08 = 7.60
        assert r.tax_micro == 7_600_000
        assert r.net_micro == r.gross_micro - r.discount_micro + r.tax_micro

    def test_conservation_on_corpus(self, spark):
        from datafusion_pinot_spark.operators.validation import (
            revenue_waterfall_yearly,
        )

        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        for r in revenue_waterfall_yearly(li).collect():
            assert (
                r.net_micro
                == r.gross_micro - r.discount_micro + r.tax_micro
            )
            assert 0 <= r.discount_micro <= r.gross_micro

"""r19 first-check queue (registered late in round 12): hand-value and
invariant tests for shingle containment, hash-sample fidelity, weekly
rank churn, audience overlap, the SQ-bits recall curve, the audio gain
table, and the streaming first-touch twin. All also run under the full
DuckDB hash gate via tests/test_queries_oracle.py."""

from __future__ import annotations

import datetime

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


class TestContainmentSupersetPairs:
    def test_quote_inside_longer_doc(self, spark):
        from datafusion_pinot_spark.operators.dedup import (
            containment_superset_pairs,
        )

        short = "alpha beta gamma delta epsilon"
        docs = spark.createDataFrame(
            [
                Row(doc_id=1, text=short),
                Row(doc_id=2, text=f"intro words here {short} outro words after"),
                Row(doc_id=3, text="completely different content entirely now"),
            ]
        )
        out = containment_superset_pairs(docs, t_ppm=900_000).collect()
        pairs = {(r.contained, r.container): r for r in out}
        # doc 1's 3 shingles all appear in doc 2 -> containment 1.0;
        # doc 2 in doc 1 is NOT flagged (its extra shingles dilute it)
        assert (1, 2) in pairs
        assert pairs[(1, 2)].containment_ppm == 1_000_000
        assert (2, 1) not in pairs
        assert all(r.contained != 3 and r.container != 3 for r in out)

    def test_symmetry_of_exact_duplicates(self, spark):
        from datafusion_pinot_spark.operators.dedup import (
            containment_superset_pairs,
        )

        text = "one two three four five six"
        docs = spark.createDataFrame(
            [Row(doc_id=1, text=text), Row(doc_id=2, text=text)]
        )
        out = {
            (r.contained, r.container): r.containment_ppm
            for r in containment_superset_pairs(docs).collect()
        }
        assert out == {(1, 2): 1_000_000, (2, 1): 1_000_000}


class TestHashSampleFidelity:
    def test_sample_size_is_rank_exact(self, spark):
        from datafusion_pinot_spark.operators.curation import (
            hash_sample_fidelity,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        out = hash_sample_fidelity(docs, rate_pct=10).collect()
        for r in out:
            assert r.k_sampled == r.n_docs * 10 // 100
            # gap is exactly the milli-mean difference in ppm
            if r.k_sampled and r.mean_chars_pop_milli:
                num = (
                    r.mean_chars_sample_milli - r.mean_chars_pop_milli
                ) * 1_000_000
                # Spark's div TRUNCATES toward zero; Python // floors
                expect = (
                    num // r.mean_chars_pop_milli
                    if num >= 0
                    else -((-num) // r.mean_chars_pop_milli)
                )
                assert r.gap_ppm == expect

    def test_full_rate_has_zero_gap(self, spark):
        from datafusion_pinot_spark.operators.curation import (
            hash_sample_fidelity,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        out = hash_sample_fidelity(docs, rate_pct=100).collect()
        assert all(r.k_sampled == r.n_docs for r in out)
        assert all(r.gap_ppm == 0 for r in out)


class TestWeeklyRankChurn:
    def test_hand_churn(self, spark):
        from datafusion_pinot_spark.operators.frequent import (
            weekly_rank_churn,
        )

        # week 1 (Mon 2024-01-01): users 1..3 active; week 2: users 3..5
        wk2 = 7 * 86400
        ev = _events(
            spark,
            [(u, "x", 0) for u in (1, 2, 3)]
            + [(u, "x", wk2) for u in (3, 4, 5)],
        )
        out = weekly_rank_churn(ev, k=10).collect()
        assert len(out) == 1
        r = out[0]
        assert r.week == datetime.date(2024, 1, 8)
        assert (r.n_top, r.n_top_prev, r.n_common) == (3, 3, 1)
        # 2 of 3 are new
        assert r.churn_ppm == 2 * 1_000_000 // 3

    def test_identical_weeks_zero_churn(self, spark):
        from datafusion_pinot_spark.operators.frequent import (
            weekly_rank_churn,
        )

        wk2 = 7 * 86400
        ev = _events(
            spark,
            [(u, "x", 0) for u in (1, 2)] + [(u, "x", wk2) for u in (1, 2)],
        )
        out = weekly_rank_churn(ev).collect()
        assert out[0].churn_ppm == 0


class TestAudienceOverlapMatrix:
    def test_hand_jaccard(self, spark):
        from datafusion_pinot_spark.operators.funnel import (
            audience_overlap_matrix,
        )

        ev = _events(
            spark,
            [
                (1, "view", 0),
                (2, "view", 0),
                (3, "view", 0),
                (1, "buy", 1),
                (4, "buy", 1),
            ],
        )
        out = {(r.ta, r.tb): r for r in audience_overlap_matrix(ev).collect()}
        r = out[("buy", "view")]
        # |buy|=2, |view|=3, inter={1} -> J = 1/4
        assert (r.n_a, r.n_b, r.n_inter) == (2, 3, 1)
        assert r.jaccard_ppm == 250_000

    def test_disjoint_audiences_zero(self, spark):
        from datafusion_pinot_spark.operators.funnel import (
            audience_overlap_matrix,
        )

        ev = _events(spark, [(1, "a", 0), (2, "b", 0)])
        out = audience_overlap_matrix(ev).collect()
        # inner join on shared users: disjoint pair emits NO row (the
        # matrix is sparse by construction)
        assert out == []


class TestSqBitsRecallCurve:
    def test_recall_monotone_in_bits_and_8_matches_audit(self, spark):
        from datafusion_pinot_spark.operators.similarity import (
            sq8_topk,
            sq_bits_recall_curve,
            _sq_topk,
        )

        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        out = sq_bits_recall_curve(emb, [1, 2, 3]).collect()
        assert [r.bits for r in out] == [4, 6, 8]
        rec = {r.bits: r.recall_ppm for r in out}
        # 4-bit codes cannot beat 8-bit on average here (monotone up to
        # quantization luck — pinned on this corpus where it holds)
        assert rec[4] <= rec[8]
        assert all(0 <= v <= 1_000_000 for v in rec.values())
        # the bits=8 leg IS sq8: same ranking
        a = [(r.q_id, r.vec_id) for r in _sq_topk(emb, [1, 2, 3], 10, 8).collect()]
        b = [
            (r.q_id, r.vec_id)
            for r in sq8_topk(emb, [1, 2, 3], 10).select("q_id", "vec_id").collect()
        ]
        assert sorted(a) == sorted(b)


class TestAudioGainTable:
    def test_hand_gain(self, spark):
        from datafusion_pinot_spark.operators.multimodal import (
            audio_gain_table,
        )

        # "@" = 0x40 = 64: sample-128 = -64, square 4096 -> ms 4096
        docs = spark.createDataFrame([Row(doc_id=1, text="@@@@")])
        out = audio_gain_table(docs, target_ms=4000).collect()
        r = out[0]
        assert (r.n_samples, r.mean_square) == (4, 4096)
        assert r.power_gain_ppm == 4000 * 1_000_000 // 4096
        assert bool(r.needs_attenuation) is True

    def test_empty_payload_skipped(self, spark):
        from datafusion_pinot_spark.operators.multimodal import (
            audio_gain_table,
        )

        docs = spark.createDataFrame(
            [Row(doc_id=1, text=""), Row(doc_id=2, text="AA")]
        )
        out = audio_gain_table(docs).collect()
        assert [r.doc_id for r in out] == [2]


class TestStreamSeqPair:
    def test_equals_batch_operator(self, spark):
        from datafusion_pinot_spark.operators.funnel import seq_pair_support
        from datafusion_pinot_spark.streaming.windowed import (
            stream_seq_pair_support,
        )

        src = f"{SF}/events.parquet"
        got = [
            tuple(r) for r in stream_seq_pair_support(spark, src).collect()
        ]
        want = [
            tuple(r)
            for r in seq_pair_support(spark.read.parquet(src)).collect()
        ]
        assert got == want


class TestEmptyInputsR16:
    EVENTS = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double"
    )
    DOCS = "doc_id long, text string, lang string, source string, n_chars long"
    EMB = "vec_id long, embedding array<double>, label string"

    def test_all_on_empty(self, spark):
        from datafusion_pinot_spark.operators.curation import (
            hash_sample_fidelity,
        )
        from datafusion_pinot_spark.operators.dedup import (
            containment_superset_pairs,
        )
        from datafusion_pinot_spark.operators.frequent import (
            weekly_rank_churn,
        )
        from datafusion_pinot_spark.operators.funnel import (
            audience_overlap_matrix,
        )
        from datafusion_pinot_spark.operators.multimodal import (
            audio_gain_table,
        )
        from datafusion_pinot_spark.operators.similarity import (
            sq_bits_recall_curve,
        )

        docs = spark.createDataFrame([], self.DOCS)
        events = spark.createDataFrame([], self.EVENTS)
        emb = spark.createDataFrame([], self.EMB)
        assert containment_superset_pairs(docs).count() == 0
        assert hash_sample_fidelity(docs).count() == 0
        assert audio_gain_table(docs).count() == 0
        assert weekly_rank_churn(events).count() == 0
        assert audience_overlap_matrix(events).count() == 0
        curve = sq_bits_recall_curve(emb, [1, 2, 3]).collect()
        assert [(r.bits, r.n_hits, r.recall_ppm) for r in curve] == [
            (4, 0, 0), (6, 0, 0), (8, 0, 0),
        ]

"""r20 first-check queue (registered at the end of round 12): hand-value
and invariant tests for label medoids, exact rolling WAU, the
total-variation distance matrix, token-source lift, grouped deciles,
whale share, and the streaming DAU twin. All also run under the full
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
                value=float(v),
            )
            for i, (u, t, s, v) in enumerate(rows)
        ]
    )


class TestLabelMedoidVectors:
    def test_hand_medoid_1d(self, spark):
        from datafusion_pinot_spark.operators.similarity import (
            label_medoid_vectors,
        )

        # milli values 0, 1000, 10000: total L1 masses 11000 / 10000 /
        # 19000 -> the middle vector (vec 1) is the medoid
        emb = spark.createDataFrame(
            [
                Row(vec_id=0, embedding=[0.0], label="l"),
                Row(vec_id=1, embedding=[1.0], label="l"),
                Row(vec_id=2, embedding=[10.0], label="l"),
            ]
        )
        out = label_medoid_vectors(emb).collect()
        assert len(out) == 1
        assert out[0].medoid_vec_id == 1
        assert out[0].total_l1_milli == 10_000

    def test_matches_numpy_all_pairs(self, spark):
        import math

        import numpy as np

        from datafusion_pinot_spark.operators.similarity import (
            label_medoid_vectors,
        )

        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        rows = emb.select("vec_id", "label", "embedding").collect()
        by_label = {}
        for r in rows:
            x = np.array(
                [math.floor(float(v) * 1000.0 + 0.5) for v in r.embedding],
                dtype=np.int64,
            )
            by_label.setdefault(r.label, []).append((r.vec_id, x))
        expect = {}
        for lab, vecs in by_label.items():
            best = None
            for vid, x in vecs:
                tot = int(
                    sum(np.abs(x - y).sum() for _, y in vecs)
                )
                if best is None or (tot, vid) < best:
                    best = (tot, vid)
            expect[lab] = (best[1], best[0])
        got = {
            r.label: (r.medoid_vec_id, r.total_l1_milli)
            for r in label_medoid_vectors(emb).collect()
        }
        assert got == expect


class TestRollingWauExact:
    def test_hand_wau(self, spark):
        from datafusion_pinot_spark.operators.temporal import (
            rolling_wau_exact,
        )

        day = 86400
        ev = _events(
            spark,
            [
                (1, "x", 0, 1),          # day 1: user 1
                (2, "x", 0, 1),          # day 1: user 2
                (1, "x", 3 * day, 1),    # day 4: user 1 again
                (3, "x", 9 * day, 1),    # day 10: user 3 (outside 7d of d1)
            ],
        )
        out = {r.day: r for r in rolling_wau_exact(ev).collect()}
        d1 = datetime.date(2024, 1, 1)
        d4 = datetime.date(2024, 1, 4)
        d10 = datetime.date(2024, 1, 10)
        assert out[d1].dau == 2 and out[d1].wau == 2
        # day 4 window [dec 29..jan 4] sees users 1, 2 (from d1) + 1 (d4)
        assert out[d4].dau == 1 and out[d4].wau == 2
        # day 10 window [jan 4..10]: user 1 (d4) + user 3 (d10)
        assert out[d10].dau == 1 and out[d10].wau == 2

    def test_wau_bounds_dau(self, spark):
        from datafusion_pinot_spark.operators.temporal import (
            rolling_wau_exact,
        )

        ev = spark.read.parquet(f"{SF}/events.parquet")
        out = rolling_wau_exact(ev).collect()
        assert all(r.wau >= r.dau for r in out)
        assert all(0 < r.stickiness_ppm <= 1_000_000 for r in out)


class TestSourceTvDistance:
    def test_identical_and_disjoint(self, spark):
        from datafusion_pinot_spark.operators.text import (
            source_tv_distance_matrix,
        )

        docs = spark.createDataFrame(
            [
                Row(doc_id=1, source="a", text="x y z"),
                Row(doc_id=2, source="b", text="x y z"),
                Row(doc_id=3, source="c", text="p q r"),
            ]
        )
        out = {
            (r.source_a, r.source_b): r.tv_ppm
            for r in source_tv_distance_matrix(docs).collect()
        }
        assert out[("a", "b")] == 0
        assert out[("a", "c")] == 1_000_000
        assert out[("b", "c")] == 1_000_000

    def test_tv_is_bounded(self, spark):
        from datafusion_pinot_spark.operators.text import (
            source_tv_distance_matrix,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        out = source_tv_distance_matrix(docs).collect()
        assert len(out) > 0
        assert all(0 <= r.tv_ppm <= 1_000_000 for r in out)


class TestSourceTokenLift:
    def test_hand_lift(self, spark):
        from datafusion_pinot_spark.operators.text import (
            source_token_lift_topk,
        )

        # "rare" appears 5x, all in source a (which holds half the mass):
        # lift = (5/10) / (5/20) = 2.0
        docs = spark.createDataFrame(
            [
                Row(doc_id=1, source="a", text=" ".join(["rare"] * 5 + ["common"] * 5)),
                Row(doc_id=2, source="b", text=" ".join(["common"] * 10)),
            ]
        )
        out = source_token_lift_topk(docs, min_count=5).collect()
        top = out[0]
        assert (top.source, top.tok) == ("a", "rare")
        assert top.lift_ppm == 2_000_000


class TestValueDeciles:
    def test_hand_deciles(self, spark):
        from datafusion_pinot_spark.operators.validation import (
            value_deciles_by_type,
        )

        # values 1.00 .. 10.00: boundary at decile k is rank k
        ev = _events(
            spark, [(1, "x", i, i + 1) for i in range(10)]
        )
        out = value_deciles_by_type(ev).collect()
        assert [(r.decile, r.boundary_cents) for r in out] == [
            (k, k * 100) for k in range(1, 10)
        ]

    def test_boundaries_monotone(self, spark):
        from datafusion_pinot_spark.operators.validation import (
            value_deciles_by_type,
        )

        ev = spark.read.parquet(f"{SF}/events.parquet")
        out = value_deciles_by_type(ev).collect()
        by_type = {}
        for r in out:
            by_type.setdefault(r.event_type, []).append(
                (r.decile, r.boundary_cents)
            )
        for rows in by_type.values():
            rows.sort()
            bounds = [b for _, b in rows]
            assert bounds == sorted(bounds)
            assert len(rows) == 9


class TestWhaleValueShare:
    def test_hand_whale(self, spark):
        from datafusion_pinot_spark.operators.validation import (
            whale_value_share,
        )

        # 10 users: user 0 spends 91.00, the rest 1.00 each -> top 1% of
        # 10 users = ceil(0.1) = 1 whale holding 91%
        ev = _events(
            spark,
            [(0, "x", 0, 91.0)] + [(u, "x", u, 1.0) for u in range(1, 10)],
        )
        out = whale_value_share(ev).collect()
        r = out[0]
        assert (r.n_users, r.n_whales) == (10, 1)
        assert r.total_cents == 10_000
        assert r.whale_cents == 9_100
        assert r.whale_share_ppm == 910_000

    def test_share_bounded(self, spark):
        from datafusion_pinot_spark.operators.validation import (
            whale_value_share,
        )

        ev = spark.read.parquet(f"{SF}/events.parquet")
        out = whale_value_share(ev).collect()
        for r in out:
            assert 0 < r.n_whales <= r.n_users
            assert 0 <= r.whale_share_ppm <= 1_000_000
            # the TOP cohort holds at least its proportional share
            assert r.whale_share_ppm * r.n_users >= 1_000_000 * r.n_whales


class TestStreamDauDaily:
    def test_equals_batch(self, spark):
        from datafusion_pinot_spark.streaming.windowed import (
            stream_dau_daily,
        )

        src = f"{SF}/events.parquet"
        got = [(r.day, r.dau) for r in stream_dau_daily(spark, src).collect()]
        want = [
            (r.day, r.dau)
            for r in spark.read.parquet(src)
            .select(F.to_date("ts").alias("day"), "user_id")
            .groupBy("day")
            .agg(F.countDistinct("user_id").cast("long").alias("dau"))
            .orderBy("day")
            .collect()
        ]
        assert got == want


class TestEmptyInputsR17:
    EVENTS = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double"
    )
    DOCS = "doc_id long, text string, lang string, source string, n_chars long"
    EMB = "vec_id long, embedding array<double>, label string"

    def test_all_on_empty(self, spark):
        from datafusion_pinot_spark.operators.similarity import (
            label_medoid_vectors,
        )
        from datafusion_pinot_spark.operators.temporal import (
            rolling_wau_exact,
        )
        from datafusion_pinot_spark.operators.text import (
            source_token_lift_topk,
            source_tv_distance_matrix,
        )
        from datafusion_pinot_spark.operators.validation import (
            value_deciles_by_type,
            whale_value_share,
        )

        docs = spark.createDataFrame([], self.DOCS)
        events = spark.createDataFrame([], self.EVENTS)
        emb = spark.createDataFrame([], self.EMB)
        assert label_medoid_vectors(emb).count() == 0
        assert rolling_wau_exact(events).count() == 0
        assert source_tv_distance_matrix(docs).count() == 0
        assert source_token_lift_topk(docs).count() == 0
        assert value_deciles_by_type(events).count() == 0
        assert whale_value_share(events).count() == 0

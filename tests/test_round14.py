"""Round-12-registered operators (the r17 first-check queue): hand-value
and invariant tests for exact-integer k-means, embedding dim-pair
covariance, the ANN MRR audit, k-core peeling, token triples,
prefix/suffix dup families, the streaming cluster monitor, and the
segment-stats system table. Every operator also runs under the full
DuckDB hash gate via tests/test_queries_oracle.py; these tests pin the
SEMANTICS with tiny frames a human can check by hand, plus the
structural invariants the oracle comparison alone cannot express."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row, functions as F

SF = "/root/testdata/sf0.001"


def _emb(spark, vecs, labels=None):
    labels = labels or ["l"] * len(vecs)
    rows = [
        Row(vec_id=i, embedding=[float(x) for x in v], label=lab)
        for i, (v, lab) in enumerate(zip(vecs, labels))
    ]
    return spark.createDataFrame(rows)


class TestKmeansClusterReport:
    def test_two_tight_clusters_hand_values(self, spark):
        from datafusion_pinot_spark.operators.similarity import (
            kmeans_cluster_report,
        )

        # init centroids are vec 0 (=0.0) and vec 1 (=1.0); points sit in
        # two tight groups around them, so assignment is stable from
        # iteration 0 and the report is hand-computable in milli units
        vecs = [
            [0.0, 0.0],
            [1.0, 1.0],
            [0.1, 0.0],
            [0.9, 1.0],
            [0.0, 0.1],
        ]
        out = kmeans_cluster_report(
            _emb(spark, vecs, ["a", "b", "a", "b", "a"]), k=2, iters=2
        ).collect()
        assert [r.cluster_id for r in out] == [0, 1]
        by = {r.cluster_id: r for r in out}
        assert by[0].n_vectors == 3 and by[1].n_vectors == 2
        assert by[0].top_label == "a" and by[1].top_label == "b"
        # cluster 0 members (milli): (0,0), (100,0), (0,100); after iter-1
        # centroid = (sum div n) = (33, 33); iter-2 distances:
        # (33²+33²) + (67²+33²) + (33²+67²) = 2178 + 5578 + 5578 = 13334
        assert by[0].inertia_milli2 == 2178 + 5578 + 5578
        # cluster 1 members: (1000,1000), (900,1000); centroid (950,1000);
        # d2 = 50² + 50² = 5000
        assert by[1].inertia_milli2 == 5000

    def test_assignments_tie_break_to_lower_centroid(self, spark):
        from datafusion_pinot_spark.operators.similarity import (
            kmeans_cluster_report,
        )

        # a point exactly between two centroids must join the LOWER id
        vecs = [[0.0], [1.0], [0.5]]
        out = kmeans_cluster_report(_emb(spark, vecs), k=2, iters=1).collect()
        by = {r.cluster_id: r for r in out}
        # midpoint (500) is equidistant (250000) from 0 and 1000 -> c0
        assert by[0].n_vectors == 2

    def test_inertia_nonincreasing_over_iterations(self, spark):
        from datafusion_pinot_spark.operators.similarity import (
            kmeans_cluster_report,
        )

        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        tot = {
            it: sum(
                r.inertia_milli2
                for r in kmeans_cluster_report(emb, k=4, iters=it).collect()
            )
            for it in (1, 2, 3)
        }
        # Lloyd's: each assignment+update round can only reduce total
        # inertia (up to integer-truncation jitter on the means, which is
        # bounded by one milli per dim — far below these magnitudes)
        assert tot[2] <= tot[1]
        assert tot[3] <= tot[2]

    def test_matches_numpy_reference(self, spark):
        import numpy as np

        from datafusion_pinot_spark.operators.similarity import (
            kmeans_cluster_report,
        )

        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        rows = sorted(
            emb.select("vec_id", "embedding").collect(),
            key=lambda r: r.vec_id,
        )
        x = np.array(
            [
                [math.floor(float(v) * 1000.0 + 0.5) for v in r.embedding]
                for r in rows
            ],
            dtype=np.int64,
        )

        def trunc_div_mean(m):
            # truncated integer division toward zero (Spark's `div`)
            s = m.sum(axis=0)
            return np.sign(s) * (np.abs(s) // len(m))

        cents = x[:4].copy()
        assign = d = None
        for _ in range(2):
            d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)  # lowest index wins ties, like c_id ASC
            cents = np.array(
                [
                    trunc_div_mean(x[assign == c])
                    if (assign == c).any()
                    else cents[c]
                    for c in range(4)
                ],
                dtype=np.int64,
            )
        counts = {
            c: int((assign == c).sum()) for c in range(4) if (assign == c).any()
        }
        # the report's inertia is the distance AT assignment time (before
        # the final centroid update)
        inertia = {c: int(d[assign == c, c].sum()) for c in counts}
        out = kmeans_cluster_report(emb, k=4, iters=2).collect()
        assert {r.cluster_id: r.n_vectors for r in out} == counts
        assert {r.cluster_id: r.inertia_milli2 for r in out} == inertia


class TestEmbeddingDimCorrelation:
    def test_perfectly_correlated_pair_tops(self, spark):
        from datafusion_pinot_spark.operators.similarity import (
            embedding_dim_correlation,
        )

        # dim0 == dim1 exactly, dim2 is constant: (0,1) must rank first
        # and any pair with the constant dim has zero covariance
        vecs = [[0.1, 0.1, 0.5], [0.2, 0.2, 0.5], [0.3, 0.3, 0.5]]
        out = embedding_dim_correlation(_emb(spark, vecs), top=3).collect()
        assert (out[0].d1, out[0].d2) == (0, 1)
        # milli values 100/200/300: n=3, sxy=140000, sx=sy=600
        # cov = (3*140000 - 360000) div 9 = 60000 div 9 = 6666
        assert out[0].cov_milli2 == 6666
        zero = [r for r in out if 2 in (r.d1, r.d2)]
        assert all(r.cov_milli2 == 0 for r in zero)

    def test_anticorrelated_is_negative(self, spark):
        from datafusion_pinot_spark.operators.similarity import (
            embedding_dim_correlation,
        )

        vecs = [[0.1, -0.1], [0.3, -0.3]]
        out = embedding_dim_correlation(_emb(spark, vecs), top=1).collect()
        assert out[0].cov_milli2 < 0


class TestAnnMrrAudit:
    def test_identical_vector_is_rank_one(self, spark):
        from datafusion_pinot_spark.operators.similarity import (
            ann_mrr_audit,
        )

        # vec 3 duplicates probe 0's direction exactly: under BOTH exact
        # cosine and SQ8 it is the top neighbor -> reciprocal rank 1.0.
        # (vec 2 must NOT be diagonal: SQ8 normalizes per-vector maxabs,
        # so a diagonal [x, x] quantizes to [127, 127] and its integer
        # dot with the probe's [127, 0] TIES the true neighbor's.)
        vecs = [
            [1.0, 0.0],
            [0.0, 1.0],
            [0.6, 0.8],
            [0.5, 0.0],
        ]
        out = ann_mrr_audit(_emb(spark, vecs), [0], k=3).collect()
        per = [r for r in out if r.q_id == 0]
        assert per[0].true_id == 3
        assert per[0].rank_in_sq8 == 1
        assert per[0].rr_ppm == 1_000_000
        summary = [r for r in out if r.q_id == -1][0]
        assert summary.rr_ppm == 1_000_000

    def test_summary_is_mean_of_probe_rrs(self, spark):
        from datafusion_pinot_spark.operators.similarity import (
            ann_mrr_audit,
        )

        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        out = ann_mrr_audit(emb, [1, 2, 3, 4, 5], k=10).collect()
        per = [r for r in out if r.q_id >= 0]
        summary = [r for r in out if r.q_id == -1][0]
        assert summary.rank_in_sq8 == len(per) == 5
        assert summary.rr_ppm == sum(r.rr_ppm for r in per) // len(per)
        # ranks land in [0, k]
        assert all(0 <= r.rank_in_sq8 <= 10 for r in per)


class TestKcorePeelProfile:
    def test_star_graph_evaporates_at_k2(self, spark):
        from datafusion_pinot_spark.operators.graph import (
            kcore_peel_profile,
        )

        # one customer buys 3 parts, each part bought only by them:
        # every part has degree 1 -> k=2 round 1 keeps nothing (the
        # customer's edges all lose their part endpoint)
        orders = spark.createDataFrame([Row(o_orderkey=1, o_custkey=1)])
        lineitem = spark.createDataFrame(
            [Row(l_orderkey=1, l_partkey=p) for p in (1, 2, 3)]
        )
        out = {
            (r.k, r["round"]): (r.n_nodes, r.n_edges)
            for r in kcore_peel_profile(orders, lineitem).collect()
        }
        assert out[(0, 0)] == (4, 3)  # 1 customer + 3 parts, 3 edges
        assert out[(2, 1)] == (0, 0)
        assert out[(2, 2)] == (0, 0)

    def test_complete_bipartite_survives(self, spark):
        from datafusion_pinot_spark.operators.graph import (
            kcore_peel_profile,
        )

        # 3 customers x 3 parts, all pairs: every node has degree 3 ->
        # the whole graph IS a 3-core; k=2 and k=3 keep everything, k=4
        # clears it in one round
        orders = spark.createDataFrame(
            [Row(o_orderkey=10 * c, o_custkey=c) for c in (1, 2, 3)]
        )
        lineitem = spark.createDataFrame(
            [
                Row(l_orderkey=10 * c, l_partkey=p)
                for c in (1, 2, 3)
                for p in (1, 2, 3)
            ]
        )
        out = {
            (r.k, r["round"]): (r.n_nodes, r.n_edges)
            for r in kcore_peel_profile(orders, lineitem).collect()
        }
        assert out[(0, 0)] == (6, 9)
        assert out[(2, 2)] == (6, 9)
        assert out[(3, 2)] == (6, 9)
        assert out[(4, 1)] == (0, 0)

    def test_monotone_in_k_and_round(self, spark):
        from datafusion_pinot_spark.operators.graph import (
            kcore_peel_profile,
        )

        orders = spark.read.parquet(f"{SF}/orders.parquet")
        lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
        rows = kcore_peel_profile(orders, lineitem).collect()
        cell = {(r.k, r["round"]): (r.n_nodes, r.n_edges) for r in rows}
        for k in (2, 3, 4):
            # peeling only shrinks
            assert cell[(k, 2)] <= cell[(k, 1)] <= cell[(0, 0)]
        for rnd in (1, 2):
            # higher k peels at least as hard
            assert cell[(4, rnd)] <= cell[(3, rnd)] <= cell[(2, rnd)]


class TestTokenTripleSupport:
    def test_hand_counted_triples(self, spark):
        from datafusion_pinot_spark.operators.frequent import (
            token_triple_support,
        )

        docs = spark.createDataFrame(
            [
                Row(doc_id=1, text="a b c"),
                Row(doc_id=2, text="a b c d"),
                Row(doc_id=3, text="a b d"),
                Row(doc_id=4, text="x y"),
            ]
        )
        # minsup 50% of 4 docs = 2 docs: frequent = {a:3, b:3, c:2, d:2}
        out = token_triple_support(docs, minsup_ppm=500_000, top=10).collect()
        sup = {(r.t1, r.t2, r.t3): r.support for r in out}
        assert sup == {
            ("a", "b", "c"): 2,
            ("a", "b", "d"): 2,
            ("a", "c", "d"): 1,
            ("b", "c", "d"): 1,
        }

    def test_matches_brute_force_python(self, spark):
        from itertools import combinations

        from datafusion_pinot_spark.operators.frequent import (
            token_triple_support,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        out = token_triple_support(docs).collect()
        rows = docs.select("doc_id", "text").collect()
        baskets = {
            r.doc_id: sorted(set(r.text.strip().lower().split()))
            for r in rows
            if r.text.strip()
        }
        n = len(baskets)
        from collections import Counter

        df = Counter(t for b in baskets.values() for t in b)
        freq = {t for t, c in df.items() if c * 1_000_000 >= 500_000 * n}
        sup = Counter(
            tri
            for b in baskets.values()
            for tri in combinations([t for t in b if t in freq], 3)
        )
        expect = sorted(
            ((c, t) for t, c in sup.items()),
            key=lambda x: (-x[0], x[1]),
        )[:20]
        got = [((r.support), (r.t1, r.t2, r.t3)) for r in out]
        assert got == [(c, t) for c, t in expect]


class TestPrefixSuffixDupFamilies:
    def test_shared_intro_detected(self, spark):
        from datafusion_pinot_spark.operators.text import (
            prefix_suffix_dup_families,
        )

        intro = "one two three four five six seven eight nine ten"
        docs = spark.createDataFrame(
            [
                Row(doc_id=1, source="s", text=f"{intro} alpha beta"),
                Row(doc_id=2, source="s", text=f"{intro} gamma delta"),
                Row(doc_id=3, source="s", text="totally different words here"),
            ]
        )
        out = {
            r.kind: r
            for r in prefix_suffix_dup_families(docs).collect()
        }
        assert out["prefix"].n_docs == 3
        assert out["prefix"].n_families == 1
        assert out["prefix"].docs_in_families == 2
        assert out["prefix"].max_family == 2
        # suffixes all differ
        assert out["suffix"].n_families == 0
        assert out["suffix"].max_family == 1

    def test_short_docs_fall_back_to_exact_dup(self, spark):
        from datafusion_pinot_spark.operators.text import (
            prefix_suffix_dup_families,
        )

        docs = spark.createDataFrame(
            [
                Row(doc_id=1, source="s", text="tiny doc"),
                Row(doc_id=2, source="s", text="tiny doc"),
                Row(doc_id=3, source="s", text=""),
            ]
        )
        out = {
            r.kind: r for r in prefix_suffix_dup_families(docs).collect()
        }
        # the empty doc is excluded; the two short identical docs form one
        # family under BOTH boundary fingerprints
        for kind in ("prefix", "suffix"):
            assert out[kind].n_docs == 2
            assert out[kind].n_families == 1
            assert out[kind].docs_in_families == 2


class TestStreamClusterAssignCounts:
    def test_equals_batch_iteration_zero(self, spark, tmp_path):
        from datafusion_pinot_spark.streaming.windowed import (
            stream_cluster_assign_counts,
        )

        src = f"{SF}/embeddings.parquet"
        out = stream_cluster_assign_counts(spark, src).collect()
        # batch twin: milli-quantize, assign to init centroids, rollup
        emb = spark.read.parquet(src)
        comp = emb.select(
            "vec_id", F.posexplode("embedding").alias("dim", "x")
        ).select(
            "vec_id",
            "dim",
            F.expr(
                "CAST(floor(CAST(x AS DOUBLE) * 1000.0 + 0.5) AS BIGINT)"
            ).alias("xm"),
        )
        cents = comp.filter(F.col("vec_id") < 4).select(
            F.col("vec_id").alias("c_id"),
            F.col("dim").alias("c_dim"),
            F.col("xm").alias("cm"),
        )
        d2 = (
            comp.join(cents, F.col("dim") == F.col("c_dim"))
            .groupBy("vec_id", "c_id")
            .agg(
                F.sum(
                    (F.col("xm") - F.col("cm")) * (F.col("xm") - F.col("cm"))
                ).alias("d2")
            )
        )
        from pyspark.sql import Window

        w = Window.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("c_id"))
        batch = (
            d2.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") == 1)
            .groupBy("c_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("d2").alias("i"),
            )
            .orderBy("c_id")
            .collect()
        )
        assert [(r.cluster_id, r.n_vectors, r.inertia_milli2) for r in out] == [
            (r.c_id, r.n, r.i) for r in batch
        ]


class TestSegmentStatsTable:
    def _write(self, spark, tmp_path, with_manifest=True):
        from datafusion_pinot_spark.sources import register_pinot_source

        register_pinot_source(spark)
        out = str(tmp_path / "t_OFFLINE")
        df = spark.createDataFrame(
            [Row(k=i, s=f"v{i % 3}") for i in range(20)]
        )
        df.filter(F.col("k") < 10).coalesce(1).write.format("pinot").mode(
            "overwrite"
        ).save(out)
        df.filter(F.col("k") >= 10).coalesce(1).write.format("pinot").mode(
            "append"
        ).save(out)
        return out

    def test_rows_and_spans(self, spark, tmp_path):
        out = self._write(spark, tmp_path)
        stats = (
            spark.read.format("pinot")
            .option("segment_stats", "true")
            .option("stats_column", "k")
            .load(out)
            .orderBy("min_k")
            .collect()
        )
        assert len(stats) == 2
        assert [(r.n_rows, r.n_columns, r.min_k, r.max_k) for r in stats] == [
            (10, 2, 0, 9),
            (10, 2, 10, 19),
        ]
        assert all(r.segment for r in stats)

    def test_fallback_without_manifest(self, spark, tmp_path):
        import os

        out = self._write(spark, tmp_path)
        os.unlink(os.path.join(out, "segment_stats.json"))
        stats = (
            spark.read.format("pinot")
            .option("segment_stats", "true")
            .option("stats_column", "k")
            .load(out)
            .orderBy("min_k")
            .collect()
        )
        assert [(r.n_rows, r.min_k, r.max_k) for r in stats] == [
            (10, 0, 9),
            (10, 10, 19),
        ]

    def test_option_validation(self, spark, tmp_path):
        out = self._write(spark, tmp_path)
        with pytest.raises(Exception, match="stats_column"):
            (
                spark.read.format("pinot")
                .option("segment_stats", "true")
                .option("stats_column", "s")  # STRING: not INT/LONG
                .load(out)
                .collect()
            )
        with pytest.raises(Exception, match="mutually exclusive"):
            (
                spark.read.format("pinot")
                .option("segment_stats", "true")
                .option("dictionary_only", "s")
                .load(out)
                .collect()
            )

    def test_single_planning_partition(self, spark, tmp_path):
        out = self._write(spark, tmp_path)
        df = (
            spark.read.format("pinot")
            .option("segment_stats", "true")
            .load(out)
        )
        assert df.rdd.getNumPartitions() == 1


class TestEmptyInputs:
    """Degenerate-input sweep: every round-12 operator on an EMPTY input
    returns an empty (or zero-row-correct) result without raising."""

    DOCS = "doc_id long, text string, lang string, source string, n_chars long"
    EMB = "vec_id long, embedding array<double>, label string"
    ORDERS = "o_orderkey long, o_custkey long"
    LINEITEM = "l_orderkey long, l_partkey long"

    def test_embedding_operators_on_empty(self, spark):
        from datafusion_pinot_spark.operators.similarity import (
            ann_mrr_audit,
            embedding_dim_correlation,
            kmeans_cluster_report,
        )

        empty = spark.createDataFrame([], self.EMB)
        assert kmeans_cluster_report(empty).count() == 0
        assert embedding_dim_correlation(empty).count() == 0
        out = ann_mrr_audit(empty, [1, 2, 3]).collect()
        # the summary row still emits (0 probes, rr 0) — same as the SQL
        assert [(r.q_id, r.rank_in_sq8, r.rr_ppm) for r in out] == [
            (-1, 0, 0)
        ]

    def test_graph_operators_on_empty(self, spark):
        from datafusion_pinot_spark.operators.graph import kcore_peel_profile

        orders = spark.createDataFrame([], self.ORDERS)
        lineitem = spark.createDataFrame([], self.LINEITEM)
        rows = kcore_peel_profile(orders, lineitem).collect()
        # all 7 (k, round) cells emit, each empty
        assert len(rows) == 7
        assert all((r.n_nodes, r.n_edges) == (0, 0) for r in rows)

    def test_text_operators_on_empty(self, spark):
        from datafusion_pinot_spark.operators.frequent import (
            token_triple_support,
        )
        from datafusion_pinot_spark.operators.text import (
            prefix_suffix_dup_families,
        )

        empty = spark.createDataFrame([], self.DOCS)
        assert token_triple_support(empty).count() == 0
        assert prefix_suffix_dup_families(empty).count() == 0


def _orders(spark, rows):
    """rows: (day_offset_from_1995_01_01, o_totalprice) tuples."""
    return spark.createDataFrame(
        [
            Row(
                o_orderkey=i,
                o_orderdate=f"1995-01-{1 + d:02d}"
                if d < 31
                else f"1995-02-{d - 30:02d}",
                o_totalprice=float(p),
            )
            for i, (d, p) in enumerate(rows)
        ]
    ).select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
        "o_totalprice",
    )


class TestLeadlagXcorrDaily:
    def test_proportional_series_slope(self, spark):
        from datafusion_pinot_spark.operators.temporal import (
            leadlag_xcorr_daily,
        )

        # day d carries d orders of $10 each -> x=d, y=10*d: at lag 0 the
        # regression of y on x has exact slope 10 (beta_milli 10000)
        rows = [(d, 10.0) for d in range(1, 7) for _ in range(d)]
        out = leadlag_xcorr_daily(_orders(spark, rows), max_lag=2).collect()
        assert [r.lag for r in out] == [-2, -1, 0, 1, 2]
        lag0 = next(r for r in out if r.lag == 0)
        assert lag0.n_days == 6
        assert lag0.beta_milli == 10000
        assert lag0.cov_num > 0 and lag0.var_den > 0
        # lag +/-1 overlap drops one day off each end
        assert next(r for r in out if r.lag == 1).n_days == 5
        assert next(r for r in out if r.lag == -1).n_days == 5

    def test_degenerate_constant_volume(self, spark):
        from datafusion_pinot_spark.operators.temporal import (
            leadlag_xcorr_daily,
        )

        # constant x across days -> var_den 0 -> beta_milli clamps to 0
        rows = [(d, 100.0 * (d + 1)) for d in range(4)]
        out = leadlag_xcorr_daily(_orders(spark, rows), max_lag=1).collect()
        assert all(r.var_den == 0 and r.beta_milli == 0 for r in out)


class TestBinarySegmentationSplit:
    def test_obvious_level_shift(self, spark):
        from datafusion_pinot_spark.operators.temporal import (
            binary_segmentation_split,
        )

        # days 0..9 at 1 kd/day, days 10..19 at 100 kd/day: the split
        # lands after day index 9 with exact segment means
        rows = [(d, 1000.0) for d in range(10)] + [
            (d, 100000.0) for d in range(10, 20)
        ]
        out = binary_segmentation_split(_orders(spark, rows)).collect()
        assert len(out) == 1
        r = out[0]
        base = r.split_day - 9  # absolute epoch day of index 9
        assert r.n_left == 10 and r.n_right == 10
        assert base >= 0
        assert r.mean_left_kd_milli == 1000
        assert r.mean_right_kd_milli == 100000
        assert 0 < r.var_reduction_ppm <= 1000000

    def test_flat_series_no_spurious_reduction(self, spark):
        from datafusion_pinot_spark.operators.temporal import (
            binary_segmentation_split,
        )

        rows = [(d, 5000.0) for d in range(8)]
        r = binary_segmentation_split(_orders(spark, rows)).collect()[0]
        # zero between-variance: the ppm clamp keeps it at exactly 0
        assert r.var_reduction_ppm == 0


class TestMmrDiverseTopk:
    def test_redundancy_penalty_reorders(self, spark):
        from datafusion_pinot_spark.operators.similarity import (
            mmr_diverse_topk,
        )

        # anchor [1,1]; vecs 1 and 2 are exact duplicates [1,.8], vec 3
        # mirrors them at [.8,1]. All three quantize to the same
        # relevance (127*228 = 28956), so plain top-3 with the vec_id
        # tie-break would emit 1,2,3 — but after picking 1, MMR's
        # redundancy term is larger for its duplicate 2 (self dot 26330)
        # than for the mirror 3 (cross dot 25654), so 3 jumps ahead.
        emb = _emb(
            spark,
            [[1.0, 1.0], [1.0, 0.8], [1.0, 0.8], [0.8, 1.0]],
        )
        out = mmr_diverse_topk(emb, anchor_id=0, k=3).collect()
        assert [r.rk for r in out] == [1, 2, 3]
        assert [r.rel for r in out] == [28956] * 3
        assert [r.vec_id for r in out] == [1, 3, 2]
        # first pick scores 7*rel with zero redundancy
        assert out[0].mmr_score == 7 * out[0].rel
        assert out[1].mmr_score == 7 * 28956 - 3 * 25654
        assert out[2].mmr_score == 7 * 28956 - 3 * 26330

    def test_scores_monotone_and_ties_on_vec_id(self, spark):
        from datafusion_pinot_spark.operators.similarity import (
            mmr_diverse_topk,
        )

        # identical corpus vectors: every step is a pure vec_id tie-break
        emb = _emb(spark, [[1.0, 1.0]] + [[0.5, 0.5]] * 4)
        out = mmr_diverse_topk(emb, anchor_id=0, k=4).collect()
        assert [r.vec_id for r in out] == [1, 2, 3, 4]


class TestHitsTwoIter:
    def test_tiny_bipartite_hand_values(self, spark):
        from datafusion_pinot_spark.operators.graph import (
            PART_BASE,
            SCALE,
            hits_two_iter,
        )

        # c1 buys parts 1,2,3; c2 buys part 1. Part 1 is the top
        # authority (both customers), c1 the top hub (three parts).
        orders = spark.createDataFrame(
            [Row(o_orderkey=10, o_custkey=1), Row(o_orderkey=20, o_custkey=2)]
        )
        lineitem = spark.createDataFrame(
            [Row(l_orderkey=10, l_partkey=p) for p in (1, 2, 3)]
            + [Row(l_orderkey=20, l_partkey=1)]
        )
        out = hits_two_iter(orders, lineitem, k=2).collect()
        auth = [r for r in out if r.kind == "authority"]
        hubs = [r for r in out if r.kind == "hub"]
        assert auth[0].node == 1 + PART_BASE and auth[0].score == SCALE
        assert hubs[0].node == 1 and hubs[0].score == SCALE
        # c2's hub mass is half of c1's: it reaches only the shared part,
        # whose a1 weight is max -> SCALE, vs c1's SCALE + 2*(SCALE/2)
        assert hubs[1].node == 2 and hubs[1].score == SCALE // 2

    def test_scores_bounded_by_scale(self, spark):
        from datafusion_pinot_spark.operators.graph import SCALE, hits_two_iter

        orders = spark.createDataFrame(
            [Row(o_orderkey=i, o_custkey=i % 3) for i in range(9)]
        )
        lineitem = spark.createDataFrame(
            [Row(l_orderkey=i, l_partkey=(i * 7) % 5) for i in range(9)]
        )
        out = hits_two_iter(orders, lineitem, k=10).collect()
        assert all(0 < r.score <= SCALE for r in out)
        assert max(r.score for r in out if r.kind == "hub") == SCALE
        assert max(r.score for r in out if r.kind == "authority") == SCALE


class TestDegreeAssortativity:
    def test_star_is_disassortative(self, spark):
        from datafusion_pinot_spark.operators.graph import degree_assortativity

        # one customer buys 3 parts: hub-leaf pairs only -> negative cov;
        # the documented 1e6 fixed-point floors r2 to 0 at toy scale
        orders = spark.createDataFrame([Row(o_orderkey=10, o_custkey=1)])
        lineitem = spark.createDataFrame(
            [Row(l_orderkey=10, l_partkey=p) for p in (1, 2, 3)]
        )
        r = degree_assortativity(orders, lineitem).collect()[0]
        assert r.n_edges == 6
        assert r.mean_deg_milli == 2000
        assert r.cov_sign == -1
        assert r.r2_ppm == 0


class TestModularityByNation:
    def test_two_perfect_communities(self, spark):
        from datafusion_pinot_spark.operators.graph import modularity_by_nation

        # nation 0 = {c1, s1}, nation 1 = {c2, s2}, one internal edge
        # each: textbook Q = 1/2, split 250000 ppm per nation
        orders = spark.createDataFrame(
            [Row(o_orderkey=10, o_custkey=1), Row(o_orderkey=20, o_custkey=2)]
        )
        lineitem = spark.createDataFrame(
            [Row(l_orderkey=10, l_suppkey=1), Row(l_orderkey=20, l_suppkey=2)]
        )
        customer = spark.createDataFrame(
            [Row(c_custkey=1, c_nationkey=0), Row(c_custkey=2, c_nationkey=1)]
        )
        supplier = spark.createDataFrame(
            [Row(s_suppkey=1, s_nationkey=0), Row(s_suppkey=2, s_nationkey=1)]
        )
        out = modularity_by_nation(orders, lineitem, customer, supplier).collect()
        assert [(r.nation, r.degree_sum, r.internal_edges, r.q_contrib_ppm)
                for r in out] == [(0, 2, 1, 250000), (1, 2, 1, 250000)]

    def test_cross_nation_edges_go_negative(self, spark):
        from datafusion_pinot_spark.operators.graph import modularity_by_nation

        # every edge crosses nations: e_in 0, q strictly negative
        orders = spark.createDataFrame(
            [Row(o_orderkey=10, o_custkey=1), Row(o_orderkey=20, o_custkey=2)]
        )
        lineitem = spark.createDataFrame(
            [Row(l_orderkey=10, l_suppkey=2), Row(l_orderkey=20, l_suppkey=1)]
        )
        customer = spark.createDataFrame(
            [Row(c_custkey=1, c_nationkey=0), Row(c_custkey=2, c_nationkey=1)]
        )
        supplier = spark.createDataFrame(
            [Row(s_suppkey=1, s_nationkey=0), Row(s_suppkey=2, s_nationkey=1)]
        )
        out = modularity_by_nation(orders, lineitem, customer, supplier).collect()
        assert all(r.internal_edges == 0 and r.q_contrib_ppm < 0 for r in out)


class TestDupNgramShare:
    def test_hand_counted_docs(self, spark):
        from datafusion_pinot_spark.operators.text import dup_ngram_share

        docs = spark.createDataFrame(
            [
                Row(doc_id=1, text="a b a b a b"),  # every 3-gram repeats
                Row(doc_id=2, text="x y z w"),      # all distinct
                Row(doc_id=3, text="a b"),          # too short: dropped
            ]
        )
        out = dup_ngram_share(docs).collect()
        assert [(r.doc_id, r.n_ngrams, r.dup_occurrences, r.dup_share_ppm)
                for r in out] == [(1, 4, 4, 1000000), (2, 2, 0, 0)]


class TestEwmaCrossoverDaily:
    def test_constant_series_never_crosses(self, spark):
        from datafusion_pinot_spark.operators.temporal import (
            ewma_crossover_daily,
        )

        rows = [(d, 500.0) for d in range(10)]
        out = ewma_crossover_daily(_orders(spark, rows)).collect()
        assert len(out) == 10
        # fast == slow == 500000 milli on a flat series; ties report -1
        assert all(
            r.fast_milli == r.slow_milli == 500000 and r.state == -1
            and r.crossed == 0
            for r in out
        )

    def test_step_up_crosses_exactly_once(self, spark):
        from datafusion_pinot_spark.operators.temporal import (
            ewma_crossover_daily,
        )

        rows = [(d, 100.0) for d in range(10)] + [
            (d, 10000.0) for d in range(10, 20)
        ]
        out = ewma_crossover_daily(_orders(spark, rows)).collect()
        crossed = [r.day for r in out if r.crossed == 1]
        first = min(r.day for r in out)
        assert crossed == [first + 10]
        # the fast average reacts harder than the slow one from the jump on
        assert all(
            r.fast_milli >= r.slow_milli and r.state == 1
            for r in out
            if r.day >= first + 10
        )


class TestQuantileSketchAccuracyAudit:
    def test_hand_case_rank_error_inside_bound(self, spark):
        from datafusion_pinot_spark.operators.quantile_sketch import (
            quantile_sketch_accuracy_audit,
        )

        # one (source, lang) group of 17 values 1..17, k=8: samples are
        # ranks 1, 9, 17 -> merged [1, 9, 17]. p50 reads 9 = exact; p99
        # reads 9 vs exact 16 -> rank_err 7, inside the k*1 = 8 bound.
        docs = spark.createDataFrame(
            [
                Row(doc_id=i, source="a", lang="x", n_chars=i, text="t")
                for i in range(1, 18)
            ]
        )
        out = quantile_sketch_accuracy_audit(docs).collect()
        by = {r.p: r for r in out}
        assert by[50].est == 9 and by[50].exact == 9
        assert by[50].rank_err == 0 and by[50].bound_ok == 1
        assert by[99].est == 9 and by[99].exact == 16
        assert by[99].abs_val_err == 7
        assert by[99].rank_err == 7 and by[99].bound_ok == 1
        assert all(r.n_sketches == 1 and r.n_rows == 17 for r in out)

    def test_bound_holds_on_corpus(self, spark):
        from datafusion_pinot_spark.operators.quantile_sketch import (
            quantile_sketch_accuracy_audit,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        out = quantile_sketch_accuracy_audit(docs).collect()
        assert len(out) > 0
        assert all(r.bound_ok == 1 for r in out)


class TestEmbeddingQuantizationErrorCurve:
    def test_hand_values_single_vector(self, spark):
        from datafusion_pinot_spark.operators.similarity import (
            embedding_quantization_error_curve,
        )

        emb = _emb(spark, [[1.0, 0.5]])
        out = embedding_quantization_error_curve(emb).collect()
        by = {r.b: r for r in out}
        # maxabs milli 1000: the max component reconstructs exactly at
        # every b; 500 -> q*1000//qmax gives e=4 (b=8), 72 (b=4), 500 (b=2)
        assert by[8].sse_milli2 == 16 and by[8].max_abs_err_milli == 4
        assert by[4].sse_milli2 == 72 * 72 and by[4].max_abs_err_milli == 72
        assert by[2].sse_milli2 == 500 * 500
        assert all(r.n_values == 2 for r in out)

    def test_error_monotone_in_bits(self, spark):
        from datafusion_pinot_spark.operators.similarity import (
            embedding_quantization_error_curve,
        )

        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        out = embedding_quantization_error_curve(emb).collect()
        rows = sorted(out, key=lambda r: r.b)  # [2, 4, 8]
        assert rows[0].sse_milli2 >= rows[1].sse_milli2 >= rows[2].sse_milli2
        assert (
            rows[0].max_abs_err_milli
            >= rows[1].max_abs_err_milli
            >= rows[2].max_abs_err_milli
        )

    def test_zero_vector_has_zero_error(self, spark):
        from datafusion_pinot_spark.operators.similarity import (
            embedding_quantization_error_curve,
        )

        out = embedding_quantization_error_curve(
            _emb(spark, [[0.0, 0.0]])
        ).collect()
        assert all(r.sse_milli2 == 0 for r in out)


class TestFoldBalanceAudit:
    def test_partition_and_chi2_invariants(self, spark):
        from datafusion_pinot_spark.operators.curation import (
            fold_balance_audit,
        )

        docs = spark.createDataFrame(
            [
                Row(doc_id=i, source="s%d" % (i % 2), text="a b c")
                for i in range(100)
            ]
        )
        out = fold_balance_audit(docs, n_folds=4).collect()
        per_source = {}
        for r in out:
            assert 0 <= r.fold < 4
            assert r.chi2_milli >= 0
            assert r.n_tokens == 3 * r.n_docs
            per_source[r.source] = per_source.get(r.source, 0) + r.n_docs
        assert per_source == {"s0": 50, "s1": 50}
        assert all(r.expected_milli == 1000 * 50 // 4 for r in out)

    def test_single_fold_is_exactly_balanced(self, spark):
        from datafusion_pinot_spark.operators.curation import (
            fold_balance_audit,
        )

        docs = spark.createDataFrame(
            [Row(doc_id=i, source="s", text="x") for i in range(10)]
        )
        out = fold_balance_audit(docs, n_folds=1).collect()
        assert len(out) == 1
        assert out[0].n_docs == 10 and out[0].chi2_milli == 0


class TestDispersionIndexDaily:
    def test_constant_daily_counts_zero_variance(self, spark):
        from datafusion_pinot_spark.operators.temporal import (
            dispersion_index_daily,
        )

        # 3 events/day for 4 days: variance 0 -> fano 0, mean 3000 milli
        rows = [
            Row(
                event_id=d * 10 + i,
                ts=f"1995-01-{d + 1:02d} 12:00:0{i}",
                event_type="a",
            )
            for d in range(4)
            for i in range(3)
        ]
        ev = spark.createDataFrame(rows).select(
            "event_id", F.col("ts").cast("timestamp").alias("ts"), "event_type"
        )
        out = dispersion_index_daily(ev).collect()
        assert [(r.event_type, r.n_days, r.n_events, r.mean_daily_milli,
                 r.fano_milli) for r in out] == [("a", 4, 12, 3000, 0)]

    def test_bursty_series_overdispersed(self, spark):
        from datafusion_pinot_spark.operators.temporal import (
            dispersion_index_daily,
        )

        # counts [1, 1, 1, 9]: mean 3, sample var 16 -> fano 5333 milli
        rows = []
        eid = 0
        for d, n in enumerate([1, 1, 1, 9]):
            for i in range(n):
                rows.append(
                    Row(
                        event_id=eid,
                        ts=f"1995-01-{d + 1:02d} 12:00:00",
                        event_type="b",
                    )
                )
                eid += 1
        ev = spark.createDataFrame(rows).select(
            "event_id", F.col("ts").cast("timestamp").alias("ts"), "event_type"
        )
        r = dispersion_index_daily(ev).collect()[0]
        # n=4 sx=12 sxx=84: (1000*(4*84-144)) div (3*12) = 192000 div 36
        assert r.fano_milli == 5333
        assert r.fano_milli > 1000  # overdispersed


class TestReferentialIntegrityAudit:
    def test_orphans_and_unreferenced_counted(self, spark):
        from datafusion_pinot_spark.operators.validation import (
            referential_integrity_audit,
        )

        customer = spark.createDataFrame(
            [Row(c_custkey=1), Row(c_custkey=2), Row(c_custkey=3)]
        )
        orders = spark.createDataFrame(
            [
                Row(o_orderkey=10, o_custkey=1),
                Row(o_orderkey=20, o_custkey=99),  # orphan FK
            ]
        )
        lineitem = spark.createDataFrame(
            [Row(l_orderkey=10, l_partkey=5, l_suppkey=7)]
        )
        part = spark.createDataFrame([Row(p_partkey=5), Row(p_partkey=6)])
        supplier = spark.createDataFrame([Row(s_suppkey=7)])
        out = {
            r.relation: r
            for r in referential_integrity_audit(
                customer, orders, lineitem, part, supplier
            ).collect()
        }
        oc = out["orders->customer"]
        assert oc.n_child == 2 and oc.n_orphans == 1
        assert oc.orphan_ppm == 500000
        # customers 2 and 3 are never referenced
        assert oc.n_parent == 3 and oc.n_unreferenced == 2
        assert oc.unreferenced_ppm == 666666
        lp = out["lineitem->part"]
        assert lp.n_orphans == 0 and lp.n_unreferenced == 1

    def test_clean_corpus_has_zero_orphans(self, spark):
        from datafusion_pinot_spark.operators.validation import (
            referential_integrity_audit,
        )

        out = referential_integrity_audit(
            spark.read.parquet(f"{SF}/customer.parquet"),
            spark.read.parquet(f"{SF}/orders.parquet"),
            spark.read.parquet(f"{SF}/lineitem.parquet"),
            spark.read.parquet(f"{SF}/part.parquet"),
            spark.read.parquet(f"{SF}/supplier.parquet"),
        ).collect()
        assert len(out) == 4
        assert all(r.n_orphans == 0 and r.orphan_ppm == 0 for r in out)


class TestColumnProfileTable:
    def test_profile_hand_values(self, spark):
        from datafusion_pinot_spark.operators.validation import (
            column_profile_table,
        )

        docs = spark.createDataFrame(
            [
                Row(doc_id=1, source="web", lang="en", n_chars=5, text="hello"),
                Row(doc_id=2, source="web", lang=None, n_chars=0, text="  "),
                Row(doc_id=3, source="book", lang="de", n_chars=5, text="welt!"),
            ]
        )
        out = {r.col_name: r for r in column_profile_table(docs).collect()}
        assert out["doc_id"].n_rows == 3 and out["doc_id"].n_distinct == 3
        assert out["lang"].n_nulls == 1 and out["lang"].n_distinct == 2
        assert out["text"].n_blank == 1
        assert out["source"].min_str == "book" and out["source"].max_str == "web"
        assert out["n_chars"].n_distinct == 2


class TestIvfProbeTuningCurve:
    def test_full_probe_budget_reaches_full_recall(self, spark):
        from datafusion_pinot_spark.operators.similarity import (
            IVF_CENTROIDS,
            ivf_probe_tuning_curve,
        )

        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        out = ivf_probe_tuning_curve(
            emb, [0, 1, 2], k=5,
            probes_list=(1, IVF_CENTROIDS),
        ).collect()
        by = {r.nprobe: r for r in out}
        # probing every list IS brute force: recall must be exactly 1
        assert by[IVF_CENTROIDS].recall_ppm == 1_000_000
        # candidates and hits are monotone in the probe budget
        assert by[1].n_candidates <= by[IVF_CENTROIDS].n_candidates
        assert by[1].n_hits <= by[IVF_CENTROIDS].n_hits
        assert all(r.n_truth == 15 for r in out)

    def test_monotone_curve_on_corpus_default(self, spark):
        from datafusion_pinot_spark.operators.similarity import (
            ivf_probe_tuning_curve,
        )

        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        out = sorted(
            ivf_probe_tuning_curve(emb, [0, 1, 2, 3, 4]).collect(),
            key=lambda r: r.nprobe,
        )
        for a, b in zip(out, out[1:]):
            assert a.n_candidates <= b.n_candidates
            assert a.n_hits <= b.n_hits
            assert a.recall_ppm <= b.recall_ppm


class TestEmbeddingDecontamAudit:
    def test_planted_duplicate_is_flagged(self, spark):
        from datafusion_pinot_spark.operators.similarity import (
            embedding_decontam_audit,
        )

        # vec 9 (valid under %10) duplicates train vec 3 exactly; vec 19
        # is orthogonal to everything in train
        vecs = {i: [0.1 * (i + 1), 1.0] for i in range(8)}
        vecs[3] = [1.0, 0.0]
        vecs[9] = [1.0, 0.0]       # valid dup of train 3
        vecs[19] = [-1.0, 5.0]
        emb = spark.createDataFrame(
            [
                Row(vec_id=i, embedding=[float(x) for x in v], label="l")
                for i, v in sorted(vecs.items())
            ]
        )
        out = embedding_decontam_audit(
            emb, threshold_milli=999
        ).collect()
        summary = out[0]
        assert summary.q_id == -1
        assert summary.n_valid == 2 and summary.n_contaminated == 1
        assert summary.contamination_ppm == 500000
        pair = out[1]
        assert (pair.q_id, pair.train_id) == (9, 3)
        assert pair.sim_milli >= 999

    def test_clean_split_reports_zero(self, spark):
        from datafusion_pinot_spark.operators.similarity import (
            embedding_decontam_audit,
        )

        emb = _emb(spark, [[1.0, 0.0]] * 9 + [[0.0, 1.0]])
        out = embedding_decontam_audit(emb, threshold_milli=999).collect()
        assert len(out) == 1
        assert out[0].n_contaminated == 0 and out[0].contamination_ppm == 0


class TestAnovaFBySource:
    def test_identical_groups_zero_f(self, spark):
        from datafusion_pinot_spark.operators.validation import (
            anova_f_by_source,
        )

        docs = spark.createDataFrame(
            [
                Row(doc_id=i, source="s%d" % (i % 2), n_chars=100)
                for i in range(20)
            ]
        )
        r = anova_f_by_source(docs).collect()[0]
        assert r.k_groups == 2 and r.n_total == 20
        assert r.ssb_q == 0 and r.f_milli == 0

    def test_separated_groups_hand_values(self, spark):
        from datafusion_pinot_spark.operators.validation import (
            anova_f_by_source,
        )

        # group a: 10,10,20,20 (S=60, Q=1000); group b: 110,110,120,120
        # (S=460, Q=53000). A = 3600//4 + 211600//4 = 900+52900=53800;
        # grand S=520, N=8 -> S^2//N = 33800; ssb = 20000;
        # ssw = (1000+53000) - 53800 = 200
        # F = (20000/1)/(200/6) = 600 -> f_milli 600000
        rows = [
            ("a", 10), ("a", 10), ("a", 20), ("a", 20),
            ("b", 110), ("b", 110), ("b", 120), ("b", 120),
        ]
        docs = spark.createDataFrame(
            [
                Row(doc_id=i, source=s, n_chars=c)
                for i, (s, c) in enumerate(rows)
            ]
        )
        r = anova_f_by_source(docs).collect()[0]
        assert (r.ssb_q, r.ssw_q) == (20000, 200)
        assert r.f_milli == 600_000


class TestTokenTrendMomentum:
    def test_rising_and_fading_tokens(self, spark):
        from datafusion_pinot_spark.operators.text import (
            token_trend_momentum,
        )

        # doc ids 0..9: first half says "old old stable", second half
        # "new new stable" -> 'old' falls, 'new' rises, 'stable' flat
        docs = spark.createDataFrame(
            [
                Row(
                    doc_id=i,
                    text="old old stable" if i < 5 else "new new stable",
                )
                for i in range(10)
            ]
        )
        out = token_trend_momentum(docs, k=5, min_count=1).collect()
        by = {r.token: r for r in out}
        assert by["old"].delta_ppm == -by["new"].delta_ppm
        assert by["new"].share_first_ppm == 0
        assert by["new"].share_second_ppm == 666666
        assert by["stable"].delta_ppm == 0
        # momentum ordering: the movers outrank the stable token
        assert [r.token for r in out[:2]] == ["new", "old"]

    def test_min_count_drops_rare_tokens(self, spark):
        from datafusion_pinot_spark.operators.text import (
            token_trend_momentum,
        )

        docs = spark.createDataFrame(
            [
                Row(doc_id=0, text="common common common rare"),
                Row(doc_id=1, text="common common common"),
            ]
        )
        out = token_trend_momentum(docs, k=10, min_count=5).collect()
        assert [r.token for r in out] == ["common"]


class TestWelchT2ByType:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            [
                Row(event_id=i, event_type=t_, value=float(v), user_id=i)
                for i, (t_, v) in enumerate(rows)
            ]
        )

    def test_identical_distributions_zero(self, spark):
        from datafusion_pinot_spark.operators.validation import (
            welch_t2_by_type,
        )

        rows = [("click", v) for v in (1, 2, 3)] + [
            ("purchase", v) for v in (1, 2, 3)
        ]
        r = welch_t2_by_type(self._ev(spark, rows)).collect()[0]
        assert r.mean_a_milli == r.mean_b_milli == 2000
        assert r.t2_milli == 0

    def test_separated_means_hand_values(self, spark):
        from datafusion_pinot_spark.operators.validation import (
            welch_t2_by_type,
        )

        # a: 1,3 (mean 2000 milli, var 2e6 milli^2); b: 11,13 (mean
        # 12000, var 2e6). se2 = 1e6+1e6; t2 = 1e8/2e6 = 50 -> 50000
        rows = [("click", 1), ("click", 3), ("purchase", 11),
                ("purchase", 13)]
        r = welch_t2_by_type(self._ev(spark, rows)).collect()[0]
        assert (r.mean_a_milli, r.mean_b_milli) == (2000, 12000)
        assert r.t2_milli == 50_000


class TestProportionZtestHalves:
    def test_perfect_aa_split_zero(self, spark):
        from datafusion_pinot_spark.operators.validation import (
            proportion_ztest_halves,
        )

        # users 0..19; exactly the even/odd users with id % 4 < 2 buy:
        # both halves convert at 50% -> z2 exactly 0
        rows = []
        for u in range(20):
            rows.append(Row(event_id=u * 2, user_id=u, event_type="view"))
            if u % 4 < 2:
                rows.append(
                    Row(event_id=u * 2 + 1, user_id=u, event_type="purchase")
                )
        ev = spark.createDataFrame(rows)
        r = proportion_ztest_halves(ev).collect()[0]
        assert r.n_a == 10 and r.n_b == 10
        assert r.rate_a_ppm == r.rate_b_ppm == 500000
        assert r.z2_milli == 0

    def test_skewed_split_flags(self, spark):
        from datafusion_pinot_spark.operators.validation import (
            proportion_ztest_halves,
        )

        # every even user buys, no odd user does: maximal separation
        rows = []
        for u in range(40):
            rows.append(Row(event_id=u * 2, user_id=u, event_type="view"))
            if u % 2 == 0:
                rows.append(
                    Row(event_id=u * 2 + 1, user_id=u, event_type="purchase")
                )
        ev = spark.createDataFrame(rows)
        r = proportion_ztest_halves(ev).collect()[0]
        assert r.rate_a_ppm == 1_000_000 and r.rate_b_ppm == 0
        # z^2 = 1 / (0.5*0.5*(1/20+1/20)) = 40 -> 40000 milli
        assert r.z2_milli == 40_000


class TestTokenWeightedMedianLength:
    def test_long_docs_pull_token_median_up(self, spark):
        from datafusion_pinot_spark.operators.text import (
            token_weighted_median_length,
        )

        # 3 one-token docs of len 10, 1 hundred-token doc of len 1000:
        # doc median = 10 (2*cum=6 >= 4 at len 10) but 100 of the 103
        # tokens live in the long doc -> token median 1000
        docs = spark.createDataFrame(
            [
                Row(doc_id=i, source="s", n_chars=10, text="t")
                for i in range(3)
            ]
            + [
                Row(
                    doc_id=9, source="s", n_chars=1000,
                    text=" ".join(["w"] * 100),
                )
            ]
        )
        r = token_weighted_median_length(docs).collect()[0]
        assert (r.n_docs, r.n_tokens) == (4, 103)
        assert r.doc_median_len == 10
        assert r.token_median_len == 1000
        assert r.skew_delta == 990

    def test_uniform_corpus_zero_skew(self, spark):
        from datafusion_pinot_spark.operators.text import (
            token_weighted_median_length,
        )

        docs = spark.createDataFrame(
            [
                Row(doc_id=i, source="s", n_chars=50, text="a b c")
                for i in range(5)
            ]
        )
        r = token_weighted_median_length(docs).collect()[0]
        assert r.doc_median_len == r.token_median_len == 50
        assert r.skew_delta == 0

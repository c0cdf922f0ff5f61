"""Unit-level semantics tests for the round-8 analytics operators
(hashed classifier inference, vocabulary Jaccard, triangle census, OLS
trend) on tiny hand-checkable data — independent of the DuckDB oracle
tier, which cross-checks the same operators against sf0.001/sf0.01."""

import datetime

import pytest
from pyspark.sql import functions as F


def test_hashed_classifier_invariants(spark):
    from datafusion_pinot_spark.operators.text import (
        CLF_BUCKETS,
        classifier_weights,
        hashed_classifier_score,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta gamma"),  # identical text -> identical score
            (3, "alpha beta gamma alpha beta gamma"),  # doubled occurrences
            (4, ""),  # zero tokens -> excluded
            (5, "   "),  # whitespace only -> excluded
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in hashed_classifier_score(docs).collect()}
    assert set(out) == {1, 2, 3}  # 4 and 5 have no features to score
    assert out[1]["logit_milli"] == out[2]["logit_milli"]
    assert out[1]["score_milli"] == out[2]["score_milli"]
    # Doubling every token occurrence doubles the logit but leaves the
    # per-token normalized score (and label) unchanged.
    assert out[3]["logit_milli"] == 2 * out[1]["logit_milli"]
    assert out[3]["n_tokens"] == 2 * out[1]["n_tokens"]
    assert out[3]["score_milli"] == out[1]["score_milli"]
    for r in out.values():
        assert r["label"] == ("keep" if r["logit_milli"] >= 0 else "drop")
        # score is the logit normalized per token, truncated toward zero
        q = abs(r["logit_milli"]) // r["n_tokens"]
        expect = q if r["logit_milli"] >= 0 else -q
        assert r["score_milli"] == expect
    # The model table is exactly one bounded weight per bucket.
    w = classifier_weights(spark)
    assert w.count() == CLF_BUCKETS
    mm = w.agg(F.min("weight"), F.max("weight")).first()
    assert mm[0] >= -1000 and mm[1] <= 1000


def test_source_vocab_jaccard_hand_values(spark):
    from datafusion_pinot_spark.operators.text import source_vocab_jaccard

    docs = spark.createDataFrame(
        [
            (1, "a b c", "en", "A", 5),
            (2, "b c b", "en", "A", 5),  # dup tokens don't grow the vocab
            (3, "b c d", "en", "B", 5),
            (4, "x", "en", "C", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = {
        (r["source_a"], r["source_b"]): r
        for r in source_vocab_jaccard(docs).collect()
    }
    # A={a,b,c}, B={b,c,d}: inter 2, union 4 -> 500000 ppm
    ab = rows[("A", "B")]
    assert (ab["vocab_a"], ab["vocab_b"], ab["n_inter"]) == (3, 3, 2)
    assert ab["jaccard_ppm"] == 500_000
    # C={x} shares nothing -> pairs with zero intersection are absent
    # (inner join on the shared token), like a sparse similarity matrix.
    assert ("A", "C") not in rows and ("B", "C") not in rows


def test_copurchase_triangles_hand_graph(spark):
    from datafusion_pinot_spark.operators.graph import copurchase_triangles

    # order 10 buys parts {1,2,3} (a triangle), order 20 buys {3,4};
    # duplicate lines must not duplicate edges.
    li = spark.createDataFrame(
        [(10, 1), (10, 2), (10, 3), (10, 3), (20, 3), (20, 4)],
        "l_orderkey long, l_partkey long",
    )
    r = copurchase_triangles(li).first()
    # edges {1-2, 1-3, 2-3, 3-4}; degrees 2,2,3,1 -> wedges 1+1+3+0 = 5
    assert (r["n_nodes"], r["n_edges"], r["n_wedges"], r["n_triangles"]) == (
        4,
        4,
        5,
        1,
    )
    assert r["gcc_ppm"] == 3 * 1_000_000 // 5


def test_daily_ols_trend_perfect_line(spark):
    from datafusion_pinot_spark.operators.validation import daily_ols_trend

    def rows_on(day, n, et="click"):
        d = datetime.datetime(2024, 1, day, 12, 0, 0)
        return [(et, d)] * n

    data = rows_on(1, 1) + rows_on(2, 2) + rows_on(3, 3) + rows_on(5, 7, "buy")
    ev = spark.createDataFrame(data, "event_type string, ts timestamp")
    out = {r["event_type"]: r for r in daily_ols_trend(ev).collect()}
    # y = x + 1 exactly: slope 1, intercept 1, shared denominator 6
    c = out["click"]
    assert (c["n_days"], c["total_events"]) == (3, 6)
    assert (c["slope_num"], c["icept_num"], c["den"]) == (6, 6, 6)
    # single-day series: slope undefined -> den 0, numerators 0
    b = out["buy"]
    assert (b["n_days"], b["total_events"]) == (1, 7)
    assert (b["slope_num"], b["den"]) == (0, 0)


def test_l_diversity_hand_values(spark):
    from datafusion_pinot_spark.operators.privacy import l_diversity_audit

    # one event type, two hours: hour 1 has sensitive bands {0,1,2}
    # (diverse), hour 2 has only {0} (homogeneous)
    rows = [
        ("click", datetime.datetime(2024, 1, 1, 1, 0), 10.0),
        ("click", datetime.datetime(2024, 1, 1, 1, 5), 60.0),
        ("click", datetime.datetime(2024, 1, 1, 1, 9), 110.0),
        ("click", datetime.datetime(2024, 1, 1, 2, 0), 10.0),
        ("click", datetime.datetime(2024, 1, 1, 2, 5), 20.0),
    ]
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    r = l_diversity_audit(ev, l=3).first()
    assert (r["n_groups"], r["low_diversity_groups"], r["min_diversity"]) == (
        2,
        1,
        1,
    )


def test_gini_hand_values(spark):
    from datafusion_pinot_spark.operators.validation import (
        gini_source_concentration,
    )

    # perfectly equal: 2 sources x 2 docs -> gini 0
    eq = spark.createDataFrame(
        [(1, "t", "en", "A", 1), (2, "t", "en", "A", 1),
         (3, "t", "en", "B", 1), (4, "t", "en", "B", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r = gini_source_concentration(eq).first()
    assert (r["n_sources"], r["n_docs"], r["gini_num"], r["gini_ppm"]) == (
        2, 4, 0, 0,
    )
    # maximally unequal 2-source split 1 vs 9: G = (2*(1*1+2*9) - 3*10)
    # / (2*10) = 8/20 = 0.4
    uneq = spark.createDataFrame(
        [(i, "t", "en", "B" if i else "A", 1) for i in range(10)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r2 = gini_source_concentration(uneq).first()
    assert (r2["gini_num"], r2["gini_den"], r2["gini_ppm"]) == (8, 20, 400_000)


def test_daily_dispersion_hand_values(spark):
    from datafusion_pinot_spark.operators.validation import (
        daily_dispersion_index,
    )

    def rows_on(day, n, et):
        return [(et, datetime.datetime(2024, 1, day, 9, 0))] * n

    # steady: 2,2,2 -> variance 0 -> D = 0
    # bursty: 1,1,10 -> var_num = 3*102 - 144 = 162, den = 2*12 = 24,
    # D = 6.75 -> 6750 milli
    data = (
        rows_on(1, 2, "steady") + rows_on(2, 2, "steady") + rows_on(3, 2, "steady")
        + rows_on(1, 1, "bursty") + rows_on(2, 1, "bursty") + rows_on(3, 10, "bursty")
    )
    ev = spark.createDataFrame(data, "event_type string, ts timestamp")
    out = {r["event_type"]: r for r in daily_dispersion_index(ev).collect()}
    assert out["steady"]["disp_num"] == 0
    assert out["steady"]["dispersion_milli"] == 0
    b = out["bursty"]
    assert (b["disp_num"], b["disp_den"], b["dispersion_milli"]) == (162, 24, 6750)


def test_dup_group_size_histogram_hand_values(spark):
    from datafusion_pinot_spark.operators.dedup import dup_group_size_histogram

    docs = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "c"), (6, "c")],
        "doc_id long, text string",
    )
    rows = {r["group_size"]: r for r in dup_group_size_histogram(docs).collect()}
    # sizes: "a"x3, "c"x2, "b"x1 -> histogram {1: 1 group, 2: 1, 3: 1}
    assert rows[1]["n_groups"] == 1 and rows[1]["n_docs"] == 1
    assert rows[2]["n_groups"] == 1 and rows[2]["n_docs"] == 2
    assert rows[3]["n_groups"] == 1 and rows[3]["n_docs"] == 3


def test_epoch_upsample_exact_target(spark):
    from datafusion_pinot_spark.operators.curation import epoch_upsample_report

    # A has 4 docs (the target), B has 3: B gets one full epoch + 1 extra
    docs = spark.createDataFrame(
        [(i, "t", "en", "A", 1) for i in range(4)]
        + [(i, "t", "en", "B", 1) for i in range(10, 13)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r["source"]: r for r in epoch_upsample_report(docs).collect()}
    # every source lands exactly on the target
    assert out["A"]["n_emitted"] == 4 and out["B"]["n_emitted"] == 4
    assert out["A"]["n_unique"] == 4 and out["B"]["n_unique"] == 3
    # A emitted once each: sum = 0+1+2+3; B = one epoch (10+11+12) + one
    # extra doc (md5-ranked first), so sum is 33 + one of {10,11,12}
    assert out["A"]["sum_doc_id"] == 6
    assert out["B"]["sum_doc_id"] - 33 in (10, 11, 12)

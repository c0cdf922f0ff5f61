"""Degenerate-input sweep for the operators that entered the driver
window in round 10 (the r9 first-check backlog): every one must handle
an EMPTY input without raising, returning either zero rows or — for the
corpus-level audit profiles — the same one-NULL-profile row the DuckDB
oracle produces on an empty relation (verified side-by-side; the zero
guard bug class that r8 caught in domain_token_budget)."""

import pytest

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double"
)
ORDERS_SCHEMA = (
    "o_orderkey long, o_custkey long, o_totalprice double,"
    " o_orderdate date"
)


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], DOCS_SCHEMA)


@pytest.fixture(scope="module")
def empty_events(spark):
    return spark.createDataFrame([], EVENTS_SCHEMA)


@pytest.fixture(scope="module")
def empty_orders(spark):
    return spark.createDataFrame([], ORDERS_SCHEMA)


def test_temporal_operators_on_empty_events(empty_events):
    from datafusion_pinot_spark.operators import temporal

    assert temporal.user_inactivity_gaps(empty_events).count() == 0
    assert temporal.session_bounce_rate(empty_events).count() == 0
    assert temporal.dau_wau_stickiness(empty_events).count() == 0
    assert temporal.interevent_gap_histogram(empty_events).count() == 0


def test_similarity_audits_on_empty_embeddings(spark):
    from datafusion_pinot_spark.operators import similarity

    emb = spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    )
    assert similarity.sq8_recall_audit(emb, [1, 2]).count() == 0
    assert similarity.knn_label_consistency(emb, [1, 2]).count() == 0


def test_dedup_audits_on_empty_corpus(empty_docs):
    from datafusion_pinot_spark.operators import dedup

    assert dedup.dedup_token_yield(empty_docs).count() == 0
    # corpus-level profile: one row, zero pairs, NULL means — exactly
    # what the DuckDB oracle yields on an empty relation (verified
    # side-by-side when this test was written)
    r = dedup.minhash_estimate_error(empty_docs).collect()
    assert len(r) == 1
    assert r[0]["n_pairs"] == 0
    assert r[0]["mean_abs_err_ppm"] is None


def test_text_audits_on_empty_corpus(empty_docs):
    from datafusion_pinot_spark.operators import text, validation

    assert text.zipf_rank_frequency(empty_docs).count() == 0
    assert validation.source_lang_independence(empty_docs).count() == 0
    assert validation.cross_field_integrity_audit(empty_docs).count() == 0


def test_revenue_audits_on_empty_orders(empty_orders):
    from datafusion_pinot_spark.operators import ranking, validation

    assert validation.monthly_revenue_momentum(empty_orders).count() == 0
    r = ranking.pareto_revenue_share(empty_orders).collect()
    assert len(r) == 1
    assert r[0]["n_customers"] == 0
    assert r[0]["top_share_ppm"] is None


def test_degree_distribution_on_empty_graph(spark):
    from datafusion_pinot_spark.operators.graph import degree_distribution

    orders = spark.createDataFrame([], "o_orderkey long, o_custkey long")
    lineitem = spark.createDataFrame([], "l_orderkey long, l_partkey long")
    assert degree_distribution(orders, lineitem).count() == 0

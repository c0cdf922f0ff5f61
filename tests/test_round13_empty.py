"""Degenerate-input sweep for the round-13 operators: every one on an
EMPTY input must return an empty (or zero-row-correct) result without
raising — the zero-guard bug class (div-by-zero, max() over nothing,
windows over no rows) the per-round empty sweeps exist to catch."""

import pytest
from pyspark.sql import functions as F

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double"
)
ORDERS_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string,"
    " o_totalprice double, o_orderdate date, o_orderpriority string"
)
EMB_SCHEMA = "vec_id long, embedding array<double>, label string"


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], DOCS_SCHEMA)


@pytest.fixture(scope="module")
def empty_events(spark):
    return spark.createDataFrame([], EVENTS_SCHEMA)


def test_doc_operators_on_empty_corpus(spark, empty_docs):
    from datafusion_pinot_spark.operators import curation, dedup, sketches, text

    assert curation.packing_waste_curve(empty_docs).count() == 0
    assert curation.quality_config_ablation(empty_docs).count() == 0
    assert curation.bloom_decontam_audit(empty_docs).count() == 0
    assert curation.quality_pareto_frontier(empty_docs).count() == 0
    # parity emits no rows when there is nothing to split
    assert curation.split_quality_parity(empty_docs).count() == 0
    assert sketches.cms_frequency_audit(empty_docs).count() == 0
    assert dedup.lsh_band_tuning_curve(empty_docs).count() == 3  # one per config, zeros
    for r in dedup.lsh_band_tuning_curve(empty_docs).collect():
        assert (r.n_candidates, r.n_verified, r.n_true) == (0, 0, 0)
        assert (r.precision_ppm, r.recall_ppm) == (0, 0)
    assert dedup.source_dedup_matrix(empty_docs).count() == 0
    assert dedup.dedup_cost_planner(empty_docs).count() == 0
    assert text.token_dist_chi2_by_source(empty_docs).count() == 0


def test_event_operators_on_empty_stream(spark, empty_events):
    from datafusion_pinot_spark.operators import temporal
    from datafusion_pinot_spark.operators.validation import (
        ab_test_srm_check,
    )

    assert temporal.cusum_changepoint_daily(empty_events).count() == 0
    assert temporal.asof_join_tolerance(empty_events).count() == 0
    assert temporal.cohort_ltv_curve(empty_events).count() == 0
    assert ab_test_srm_check(empty_events).count() == 0


def test_kendall_on_empty_orders(spark):
    from datafusion_pinot_spark.operators.validation import kendall_tau_daily

    empty_orders = spark.createDataFrame([], ORDERS_SCHEMA)
    out = kendall_tau_daily(empty_orders).collect()
    # global agg over nothing: one row of zeros (n_pairs 0 -> tau 0),
    # mirroring the single-day degenerate contract
    assert len(out) == 1
    r = out[0]
    assert (r.n_days, r.n_pairs, r.tau_a_ppm) == (0, 0, 0)


def test_embedding_dim_stats_on_empty(spark):
    from datafusion_pinot_spark.operators.similarity import (
        embedding_dim_stats,
    )

    empty = spark.createDataFrame([], EMB_SCHEMA)
    assert embedding_dim_stats(empty).count() == 0

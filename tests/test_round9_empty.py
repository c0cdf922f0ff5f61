"""Degenerate-input sweep: every round-9 operator on an EMPTY input must
return an empty (or zero-row-correct) result without raising — the
zero-guard bug class (div-by-zero NULLs, max() over nothing, recursion
over no rows) that the round-8 advice caught in domain_token_budget."""

import pytest
from pyspark.sql import functions as F

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double"
)


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], DOCS_SCHEMA)


@pytest.fixture(scope="module")
def empty_events(spark):
    return spark.createDataFrame([], EVENTS_SCHEMA)


def test_doc_operators_on_empty_corpus(spark, empty_docs):
    from datafusion_pinot_spark.operators import dedup, multimodal, text
    from datafusion_pinot_spark.operators.validation import (
        simpson_source_diversity,
    )

    assert simpson_source_diversity(empty_docs).count() == 1  # global agg row
    r = simpson_source_diversity(empty_docs).first()
    assert (r["n_sources"], r["n_docs"], r["simpson_ppm"]) == (0, 0, 0)
    assert text.token_lift_pairs(empty_docs).count() == 0
    assert text.vocab_growth_curve(empty_docs).count() == 0
    assert text.lm_quality_gate(empty_docs).count() == 0
    assert text.word_runs_topk(spark, empty_docs).count() == 0
    assert dedup.canonical_keep_report(empty_docs).count() == 0
    assert dedup.jaccard_prefix_join(empty_docs).count() == 0
    assert dedup.boilerplate_strip_report(empty_docs).count() == 0
    assert multimodal.video_scene_cuts(empty_docs).count() == 0
    assert multimodal.image_tile_contrast(empty_docs).count() == 0


def test_event_operators_on_empty_stream(spark, empty_events):
    from datafusion_pinot_spark.operators import temporal
    from datafusion_pinot_spark.operators.privacy import (
        contribution_sensitivity_audit,
        t_closeness_audit,
    )
    from datafusion_pinot_spark.operators.validation import (
        dow_seasonality_index,
        halflife_event_mass,
        ks_source_drift,
        theil_sen_daily_trend,
        trimmed_mean_robust,
    )

    assert halflife_event_mass(empty_events).count() == 0
    assert t_closeness_audit(empty_events).count() == 0
    assert contribution_sensitivity_audit(empty_events).count() == 0
    assert ks_source_drift(empty_events).count() == 0
    assert trimmed_mean_robust(empty_events).count() == 0
    assert dow_seasonality_index(empty_events).count() == 0
    assert theil_sen_daily_trend(empty_events).count() == 0
    assert temporal.clamped_balance_report(empty_events).count() == 0


def test_graph_operators_on_empty_edges(spark):
    from datafusion_pinot_spark.operators.graph import label_prop_two_round
    from datafusion_pinot_spark.operators.linkage import entity_cluster_sizes

    orders = spark.createDataFrame(
        [], "o_orderkey long, o_custkey long"
    )
    lineitem = spark.createDataFrame(
        [], "l_orderkey long, l_partkey long"
    )
    assert label_prop_two_round(orders, lineitem).count() == 0
    part = spark.createDataFrame(
        [], "p_partkey long, p_name string, p_brand string"
    )
    assert entity_cluster_sizes(part).count() == 0


def test_sq8_on_empty_embeddings(spark):
    from datafusion_pinot_spark.operators.similarity import sq8_topk

    emb = spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    )
    assert sq8_topk(emb, [1, 2, 3]).count() == 0

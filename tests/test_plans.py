"""Physical-plan shape assertions: the optimizations SCALE.md promises must
actually appear in the plans (pushdown reaching the scan, dims broadcast,
partial aggregation, whole-stage codegen)."""

import pytest

from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def q(spark):
    from datafusion_pinot_spark.plans import QUERIES

    def run(name):
        return QUERIES[name].fn(spark, SF_SMOKE)

    return run


def test_filter_pushdown_reaches_parquet_scan(q):
    plan = _plan(q("filter_where"))
    assert "PushedFilters:" in plan
    # range predicates on l_discount / l_quantity must reach the scan
    assert "GreaterThan(l_discount" in plan
    assert "LessThan(l_quantity" in plan


def test_column_pruning_reaches_parquet_scan(q):
    plan = _plan(q("scan_dict_cols"))
    # ReadSchema lists exactly the projected columns — no full-width scan
    assert "l_returnflag" in plan and "l_linestatus" in plan
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_extendedprice" not in read_schema
    assert "l_comment" not in read_schema


def test_5way_join_broadcasts_dims(q):
    plan = _plan(q("join_5way_region_revenue"))
    # customer, nation, region are broadcast — only lineitem⋈orders shuffles
    assert plan.count("BroadcastHashJoin") >= 3
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1


def test_groupby_partial_aggregation(q):
    plan = _plan(q("groupby_topk"))
    # map-side partial + final aggregate split
    assert "partial_" in plan.lower() or plan.count("HashAggregate") >= 2


def test_topk_uses_take_ordered(q):
    plan = _plan(q("groupby_topk"))
    assert "TakeOrderedAndProject" in plan


def test_whole_stage_codegen_spans(spark, q):
    # AQE wraps the plan pre-execution, hiding WSCG subtrees from explain;
    # disable it for the assertion only (execution behavior is unchanged).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = q("q1_pricing_summary")
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "codegen"
        )
        n = int(plan.split("Found ")[1].split(" WholeStageCodegen")[0])
        assert n >= 2  # scan+filter+partial-agg span, final-agg span
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_ann_broadcasts_queries(q):
    plan = _plan(q("ann_cosine_topk"))
    assert "Broadcast" in plan  # query set broadcast; big side never shuffles pre-score


def test_q3_single_shuffle_join_with_broadcast_dim(q):
    plan = _plan(q("q3_shipping_priority"))
    # lineitem⋈orders is the one shuffle join; filtered customer broadcasts
    assert plan.count("BroadcastHashJoin") >= 1
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1
    assert "TakeOrderedAndProject" in plan


def test_q6_predicates_reach_scan(q):
    plan = _plan(q("q6_forecast_revenue"))
    read = next(l for l in plan.splitlines() if "PushedFilters" in l)
    assert "l_shipdate" in read and "l_discount" in read and "l_quantity" in read


def test_q18_no_forced_broadcast_on_fact_derived_keyset(q):
    df = q("q18_large_volume_customer")
    # The HAVING>250 order-key set is fact-derived (grows with SF); a forced
    # F.broadcast() would OOM at 100× scale. The query must carry NO explicit
    # broadcast hint anywhere — any broadcast in the physical plan is AQE's
    # runtime size-based choice, which degrades gracefully to SMJ at scale.
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed and "UnresolvedHint" not in analyzed
    # and the keyset filter is a semi-join, not an inner join materializing it
    assert "LeftSemi" in _plan(df)


def test_quality_topk_window_group_limit(q):
    plan = _plan(q("quality_topk_per_lang"))
    # Spark 4 turns rn<=k into a per-partition partial top-k before shuffle
    assert "WindowGroupLimit" in plan


def test_bucketed_join_is_shuffle_free(spark, tmp_path_factory):
    """The 100 TB co-location story: two tables bucketed by the join key
    join WITHOUT an exchange on either side (SCALE.md §joins). Parquet
    bucketing metadata is honored by Spark's planner — at scale this is the
    pre-partitioning that turns every fact-fact join into a local merge."""
    wh = tmp_path_factory.mktemp("warehouse")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    # external tables (explicit path) so the static warehouse dir is unused
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").option(
        "path", str(wh / "b_orders")
    ).saveAsTable("b_orders")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").option(
        "path", str(wh / "b_lineitem")
    ).saveAsTable("b_lineitem")
    # At sf0.001 both tables sit under the session's 64 MB broadcast
    # threshold (session.py), so Spark would pick BroadcastHashJoin and the
    # shuffle-free SMJ claim would be unobservable. Disable broadcast for
    # the duration of this test only.
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.sql(
            """SELECT o_orderkey, count(*) AS n
               FROM b_lineitem JOIN b_orders ON l_orderkey = o_orderkey
               GROUP BY o_orderkey"""
        )
        plan = _plan(joined)
        join_section = plan.split("HashAggregate")[0]
        # no Exchange feeds the join: bucket layout IS the partitioning
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_section.split("SortMergeJoin")[0]
        # correctness unchanged vs unbucketed
        n = joined.agg({"n": "sum"}).collect()[0][0]
        assert n == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_sequence_packing_has_no_corpus_wide_single_partition(q):
    """The packed-sequence layout's global cumsum must come from the
    bucketed two-pass prefix (SCALE.md): the only SinglePartition exchange
    in the plan feeds the tiny per-bucket prefix window, and the
    corpus-side running-sum window is hash-partitioned by bucket."""
    df = q("sequence_pack_bins")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange SinglePartition") == 1
    # the single-partition exchange sits below a bucket-keyed aggregate
    tail = plan.split("Exchange SinglePartition")[1]
    assert "HashAggregate(keys=[__bucket" in tail
    # the corpus-side window partitions by the bucket (never a global sort)
    assert "windowspecdefinition(__bucket" in plan


def test_q2_broadcasts_dims_single_pair_shuffle(q):
    # Q2 shape: part/supplier/nation all broadcast; the only exchanges are
    # the (pk, sk) aggregate and the pk window repartition
    plan = _plan(q("q2_min_cost_supplier"))
    assert plan.count("BroadcastHashJoin") >= 3
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") == 0
    assert "Window" in plan


def test_q9_only_orders_join_shuffles(q):
    # part (LIKE-pruned), supplier and nation broadcast; lineitem x orders
    # is the single shuffle join
    plan = _plan(q("q9_product_type_profit"))
    assert plan.count("BroadcastHashJoin") >= 3
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1


def test_q13_left_join_filter_pushed_to_orders_scan(q):
    # the o_orderpriority exclusion lives in the join condition, so it must
    # be pushed to the orders scan, and the join must stay LEFT OUTER
    plan = _plan(q("q13_customer_distribution"))
    assert "LeftOuter" in plan
    assert "Not(EqualTo(o_orderpriority,1-URGENT))" in plan


def test_q16_anti_join_broadcasts_exclusion(q):
    # NOT IN over the low-balance suppliers plans as a broadcast anti join
    plan = _plan(q("q16_supplier_part_counts"))
    assert "LeftAnti" in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_q20_single_window_semi_join_broadcast(q):
    # both per-part analytics (SUM, COUNT) share one Window node — no
    # second pk repartition — and the major-supplier set broadcasts into
    # a semi join
    import re

    plan = _plan(q("q20_majority_supplier"))
    # formatted explain prints each node twice (tree + details); count the
    # numbered detail headers to get the true node count
    assert len(re.findall(r"^\(\d+\) Window", plan, re.M)) == 1
    assert "LeftSemi" in plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") == 0


def test_q22_scalar_aggregate_broadcasts(q):
    # the 1-row positive-balance aggregate joins back as a broadcast
    # nested-loop cross join, never a shuffled cartesian
    plan = _plan(q("q22_dormant_customers"))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "LeftAnti" in plan


def test_incremental_dedup_never_shuffles_the_corpus(q):
    """The crawl-ingest dedup's exact-verify joins must both build on a
    broadcast small side (SCALE.md): a SortMergeJoin or ShuffledHashJoin
    here would mean the 100 TB corpus shuffles on the content hash."""
    plan = _plan(q("incremental_dedup_bloom"))
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_duplicate_span_has_no_pair_explosion(q):
    """The shared-gram join must stay a plain join + aggregates — never a
    cartesian/BNLJ pair enumeration."""
    plan = _plan(q("duplicate_span_coverage"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_funnel_single_user_shuffle(q):
    """The funnel fold's scale claim (SCALE.md): ONE shuffle keyed on the
    user collapses each user's events to a sorted array; the only other
    exchanges serve the tiny rollup. No window over the event table, no
    per-event pass."""
    plan = _plan(q("funnel_complete_histogram"))
    # the event-table side: exactly one hashpartitioning on user_id
    assert plan.count("hashpartitioning(user_id") == 1
    assert "Window" not in plan  # fold, not a window function pass
    assert "ObjectHashAggregate" in plan or "SortAggregate" in plan


def test_heavy_hitter_candidates_broadcast(q):
    """Heavy hitters: the exact-verify join must broadcast the candidate
    set (tiny by the pigeonhole bound) — the corpus-side token stream is
    never shuffled for the join."""
    plan = _plan(q("heavy_hitter_tokens"))
    assert "BroadcastHashJoin" in plan
    # exactly two token exchanges exist and neither carries the corpus:
    # the candidate stream's own distinct (bounded by the pigeonhole
    # candidate count) and the post-join exact count (bounded by the
    # broadcast semi-join). The corpus-side explode feeds the broadcast
    # join with no exchange in between.
    assert plan.count("hashpartitioning(token") == 2


def test_segment_partitioned_distinct_no_value_shuffle(spark, tmp_path):
    """The layout-proven distinct count ships one integer per partition:
    no exchange carries the value column at all."""
    import numpy as np

    from datafusion_pinot_spark.operators.segment_distinct import (
        distinct_count,
    )
    from pinot_segment.metadata import DataType
    from pinot_segment.writer import ColumnSpec, write_segment

    table = tmp_path / "t_OFFLINE"
    for i in range(3):
        write_segment(
            table / f"s{i}",
            f"s{i}",
            "t",
            [
                ColumnSpec(
                    "k",
                    DataType.LONG,
                    np.asarray([i, i + 8], dtype=np.int64),
                    raw=True,
                    partition_config=("Modulo", 8),
                )
            ],
        )
    df, method = distinct_count(spark, str(table), "k")
    assert method == "segment_partitioned"
    plan = _plan(df)
    # the sum of per-partition counts is a single-row final aggregate;
    # no exchange is keyed on the value column k
    assert "hashpartitioning(k" not in plan


# ---- round-9 plan shapes ----


def test_t_closeness_broadcasts_bounded_frames(q):
    # the groups x values grid joins broadcast the bounded global-values
    # and one-row total frames; the corpus never re-shuffles for them
    plan = _plan(q("t_closeness_audit"))
    assert plan.count("BroadcastNestedLoopJoin") + plan.count(
        "BroadcastHashJoin"
    ) >= 2


def test_token_lift_broadcasts_topv_only(q):
    # the top-V vocabulary (LIMIT 40) broadcasts back to the doc-token
    # set; the doc_id self-join is a real shuffle join (corpus-sized)
    plan = _plan(q("token_lift_pairs"))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "TakeOrderedAndProject" in plan  # top-k never global-sorts


def test_jaccard_prefix_join_no_forced_broadcast(spark, q):
    # frequency and size tables are corpus-derived: the operator must not
    # FORCE a broadcast hint on them — AQE may still pick one at runtime
    from datafusion_pinot_spark.operators.dedup import jaccard_prefix_join
    from datafusion_pinot_spark.plans.queries import _docs

    logical = jaccard_prefix_join(
        _docs(spark, SF_SMOKE)
    )._jdf.queryExecution().logical().toString()
    assert "UnresolvedHint" not in logical and "ResolvedHint" not in logical
    plan = _plan(q("jaccard_prefix_join"))
    assert "TakeOrderedAndProject" in plan


def test_vocab_growth_single_bucket_window(q):
    # the cumulative window runs over the tiny bucket frame, after two
    # map-side-combined aggs (partial_count before the exchange)
    plan = _plan(q("vocab_growth_curve"))
    assert "partial_count" in plan or "partial count" in plan.lower()
    assert "Window" in plan


def test_video_scene_cuts_partitions_window_by_doc(q):
    # the lag window partitions by doc_id — no single-partition global
    # sort of the frame stream
    plan = _plan(q("video_scene_cuts"))
    assert "MapInPandas" in plan
    assert "TakeOrderedAndProject" in plan


def test_label_prop_reuses_checkpointed_edges(q):
    # the two rounds run against the localCheckpointed edge table: the
    # plan shows scans of an ExistingRDD/LogicalRDD, not three rebuilds
    # of the distinct+join subtree
    plan = _plan(q("label_prop_communities"))
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan


def test_halflife_broadcasts_scalar_no_shuffle_join(q):
    # the max-day scalar joins back as a one-row broadcast; the corpus
    # never shuffles for it
    plan = _plan(q("halflife_event_mass"))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_sq8_recall_audit_joins_all_broadcast(q):
    # r10: the two |probes|*k-row ranking frames must join broadcast —
    # Spark can't size a windowed top-k output, so without explicit
    # hints both tiny frames went through SortMergeJoin shuffles
    plan = _plan(q("sq8_recall_audit"))
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_knn_label_consistency_broadcasts_probe_labels(q):
    plan = _plan(q("knn_label_consistency"))
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_dau_wau_bounded_day_join_no_cartesian(q):
    # the trailing-7-day join is a bounded day-range join over the
    # distinct (user, day) frame — never a cartesian product
    plan = _plan(q("dau_wau_stickiness"))
    assert "CartesianProduct" not in plan


def test_minhash_estimate_error_no_cartesian(q):
    # candidates come from banded LSH buckets (equi-joins), never from
    # an all-pairs product
    plan = _plan(q("minhash_estimate_error"))
    assert "CartesianProduct" not in plan


def test_pareto_share_is_window_only(q):
    # one per-customer agg + rank window + tiny rollup: no join at all
    plan = _plan(q("pareto_revenue_share"))
    for j in ("SortMergeJoin", "ShuffledHashJoin", "CartesianProduct"):
        assert j not in plan


def test_rrf_fusion_broadcasts_queries_and_pushes_topk(q):
    # r11: the probe set must broadcast (the corpus never shuffles for
    # scoring) and the final per-query top-k must compile to a
    # WindowGroupLimit, not a full sort of the fused frame
    plan = _plan(q("rrf_fusion_topk"))
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan


def test_tukey_fences_broadcast_fence_join(q):
    # r11: the |event types|-row fence frame joins broadcast; the rank
    # window is the only full-data shuffle
    plan = _plan(q("tukey_fence_outliers"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "CartesianProduct" not in plan


def test_dup_transitivity_no_cartesian(q):
    # r11: wedges come from a midpoint equi-self-join and the closure
    # probe from a pair-key equi-join — shuffle joins are the DESIGNED
    # strategy (the verified-pair frame is unbounded on dup-heavy
    # corpora), but an all-pairs product must never appear
    plan = _plan(q("dup_transitivity_audit"))
    assert "CartesianProduct" not in plan


def test_dedup_survivorship_no_cartesian(q):
    # r11: the kept-id join is a shuffle equi-join by design (the kept
    # set is O(distinct docs)); the only broadcast is the 1-row totals
    plan = _plan(q("dedup_survivorship_psi"))
    assert "CartesianProduct" not in plan


def test_centroid_shift_is_explode_plus_agg(q):
    # r11: posexplode -> map-side-combined agg; no join of any kind
    plan = _plan(q("embedding_centroid_shift"))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert "Generate" in plan  # the posexplode


def test_split_leakage_single_shuffle_no_join(q):
    # r11: two md5s in one narrow map, one content-hash aggregate, a
    # 1-row rollup — no join anywhere
    plan = _plan(q("split_leakage_audit"))
    assert "CartesianProduct" not in plan
    assert "Join" not in plan


def test_quality_yield_fans_profile_not_text(q):
    # r11: the threshold explode runs over (n_tokens, quality) — the
    # text column must be pruned out before the Generate
    plan = _plan(q("quality_yield_curve"))
    assert "CartesianProduct" not in plan
    assert "Generate" in plan


def test_dedup_pipeline_no_allpairs_and_deliberate_shuffle_join(q):
    """The flagship composed pipeline (r12): no cartesian/nested-loop join
    anywhere — candidates come from banded bucket EQUI-joins, verify
    touches only candidates — and the label frame joins back to the
    corpus as a SHUFFLE equi-join (labels are O(dup members), unbounded
    on dup-heavy corpora; broadcasting them would be the 100 TB mistake)."""
    plan = _plan(q("dedup_pipeline_report"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the doc_id label join is present and NOT broadcast: at least one
    # SortMergeJoin survives (labels side), alongside the bucket equi-joins
    assert "SortMergeJoin" in plan


def test_temporal_split_broadcasts_bounds(q):
    """r12: the day-bounds frame is ONE row — it must broadcast back to
    the events scan (any shuffle here would be a corpus-wide mistake),
    and membership flagging is one partial/final aggregate pair."""
    plan = _plan(q("temporal_split_leakage"))
    assert "Broadcast" in plan  # 1-row bounds join
    assert "CartesianProduct" not in plan
    assert "HashAggregate" in plan


def test_embedding_norm_audit_partial_aggregates(q):
    """r12: both the per-vector partial sum and the label rollup must
    map-side combine (partial HashAggregate before each Exchange) — the
    shuffle carries one row per vector, never 64x component rows."""
    plan = _plan(q("embedding_norm_audit"))
    # partial + final per aggregation level
    assert plan.count("HashAggregate") >= 4
    assert "CartesianProduct" not in plan


def test_join_skew_audit_take_ordered(q):
    """r12: the hot-key probe must TakeOrdered its top-k (no full sort)
    and the totals frame joins broadcast (1 row)."""
    plan = _plan(q("join_skew_audit"))
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_novelty_curve_no_shuffle_join(q):
    """r12 rewrite: the novelty curve is two aggregates (shingle, then
    bucket) plus the 1-row broadcast bounds join — the earlier
    distinct+self-join shape (an extra shuffle AND a shuffle join for
    the same answer) must not come back."""
    plan = _plan(q("ngram_novelty_curve"))
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bloom_decontam_all_joins_broadcast(q):
    """r13: every join in the Bloom decontamination audit must broadcast —
    the bit table is bounded by m, the probe shingle set is the benchmark
    (small by construction). A sort-merge join anywhere here means the
    bounded side shuffled the corpus, the 100 TB mistake."""
    plan = _plan(q("bloom_decontam_audit"))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_cms_audit_broadcast_buckets_and_take_ordered(q):
    """r13: the CMS bucket table is depth*width rows (fixed size) — the
    probe join must broadcast it; the probe set itself is a TakeOrdered
    top-k, never a global sort of the gram counts."""
    plan = _plan(q("cms_frequency_audit"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_kendall_pairs_broadcast_nested_loop(q):
    """r13: the d1 < d2 pair join runs on the O(days) aggregate — a
    BroadcastNestedLoopJoin over the tiny frame is the intended shape
    (the inequality cannot hash-partition); what must NEVER appear is a
    CartesianProduct (both sides unbroadcast = corpus-scale blowup)."""
    plan = _plan(q("kendall_tau_daily"))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_asof_tolerance_single_key_shuffle_no_joins(q):
    """r13: the tolerance as-of join is the union-and-window formulation —
    zero join operators of any kind; the only corpus-scale exchange hashes
    on user_id for the timeline sweep."""
    plan = _plan(q("asof_join_tolerance"))
    for op in ("SortMergeJoin", "BroadcastHashJoin",
               "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert op not in plan
    assert "Window" in plan


def test_pareto_frontier_broadcast_envelope(q):
    """r13: the skyline's distinct-x envelope is bounded by max document
    length — it must broadcast back to the signal frame; the corpus is
    never globally sorted (no corpus-side SortMergeJoin)."""
    plan = _plan(q("quality_pareto_frontier"))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_srm_check_no_joins_single_rollup(q):
    """r13: SRM is one distinct shuffle + one rollup — any join operator
    in this plan is a regression."""
    plan = _plan(q("ab_test_srm_check"))
    for op in ("SortMergeJoin", "BroadcastHashJoin",
               "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert op not in plan
    assert "HashAggregate" in plan


def test_dedup_cost_planner_no_joins(q):
    """r13: the cost planner is banded-key counts only — it must be
    strictly cheaper than the candidate pipeline it plans, i.e. contain
    NO join operator and no collect_set materialization."""
    plan = _plan(q("dedup_cost_planner"))
    for op in ("SortMergeJoin", "BroadcastHashJoin",
               "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert op not in plan
    assert "collect_set" not in plan


def test_embedding_dim_stats_no_joins_no_window(q):
    """r13: posexplode into one map-side-combined rollup — joins or
    windows here mean the plan grew a corpus-scale stage it doesn't
    need."""
    plan = _plan(q("embedding_dim_stats"))
    for op in ("SortMergeJoin", "BroadcastHashJoin",
               "BroadcastNestedLoopJoin", "CartesianProduct", "Window"):
        assert op not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_kmeans_broadcasts_centroids_every_iteration(q):
    """r12: each Lloyd iteration joins the component stream against a
    k x dim centroid frame — EVERY such join must broadcast (two distance
    joins + two update joins + the label/report joins), and nothing may
    fall back to a cartesian."""
    plan = _plan(q("kmeans_cluster_report"))
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dim_correlation_single_self_join_topk(q):
    """r12: one self-equi-join on vec_id (dims² fanout, SortMergeJoin is
    the right call — both sides are the same corpus-scale frame), one
    map-side-combined agg, and a TakeOrdered top-k instead of a global
    sort."""
    plan = _plan(q("embedding_dim_correlation"))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_token_triples_broadcast_prune_and_takeordered(q):
    """r12: the frequent-item prune joins the token stream against a
    vocabulary-sized frame — broadcast, never a shuffle of the stream by
    token — and the final top-k is a TakeOrdered."""
    plan = _plan(q("token_triple_support"))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_prefix_suffix_families_no_joins(q):
    """r12: boundary fingerprinting is two map-side-combined rollups —
    any join operator in this plan is a regression."""
    plan = _plan(q("prefix_suffix_dup_families"))
    for op in ("SortMergeJoin", "BroadcastHashJoin",
               "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert op not in plan
    assert plan.count("HashAggregate") >= 2


def test_kcore_semi_joins_never_cartesian(q):
    """r12: every peel round is degree-count + two LEFT SEMI joins on
    node columns; the whole profile must stay equi-join-shaped."""
    plan = _plan(q("kcore_peel_profile"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_seq_pair_support_single_equi_join(q):
    """r12(late): the pair space comes from ONE self-equi-join on user of
    the (user, type, first_ts) rollup — never a cartesian, never an
    event-grain self-join."""
    plan = _plan(q("seq_pair_support"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("HashAggregate") >= 2


def test_session_threshold_no_joins_one_window(q):
    """r12(late): one per-user window pass shared by all thresholds, then
    a single global rollup — joins here mean the thresholds stopped
    sharing the pass."""
    plan = _plan(q("session_threshold_sensitivity"))
    for op in ("SortMergeJoin", "BroadcastHashJoin",
               "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert op not in plan
    # exactly one Window node in the operator tree (lag + lead fused)
    assert plan.count("Window (") == 1


def test_hll_registers_no_corpus_joins(q):
    """r12(late): the register build is hash + one 64-group rollup; the
    only join in the whole estimate plan is the 1-row exact-count
    broadcast — nothing may shuffle-join the key stream."""
    plan = _plan(q("hll_from_scratch_estimate"))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_dp_calibration_no_joins(q):
    """r12(late): two map-side-combined rollups and a constant epsilon
    fanout — any join is a regression."""
    plan = _plan(q("dp_noise_calibration"))
    for op in ("SortMergeJoin", "BroadcastHashJoin",
               "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert op not in plan


def test_medoid_no_pairwise_join(q):
    """r12(final): the medoid resolves from rank/prefix-sum windows —
    ANY join operator here means the O(n²) all-pairs shape crept back."""
    plan = _plan(q("label_medoid_vectors"))
    for op in ("SortMergeJoin", "BroadcastHashJoin",
               "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert op not in plan
    assert "Window" in plan


def test_rolling_wau_no_event_self_join(q):
    """r12(final): the x7 fanout explodes the (day, user) frame, never
    the event stream, and joins only the 1-row max-day broadcast."""
    plan = _plan(q("rolling_wau_exact"))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan or "Explode" in plan  # day-frame join only


def test_whale_share_single_window_rollup(q):
    """r12(final): per-user sum -> one rank window -> |types| rollup;
    joins are a regression."""
    plan = _plan(q("whale_value_share"))
    for op in ("SortMergeJoin", "BroadcastHashJoin",
               "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert op not in plan


def test_compaction_plan_no_global_window(q):
    """r13 (r12 verdict #5): the compaction planner's prefix sum must be
    the two-pass range-bucketed scan — every WindowExec partitioned (no
    all-to-one funnel of the segment frame), and no window at all on the
    offsets path (triangular join instead)."""
    plan = _plan(q("pinot_compaction_plan"))
    for line in plan.splitlines():
        if "Arguments:" in line and "windowspecdefinition" in line.lower():
            assert "bkt" in line  # partitioned by bucket, never bare
    # the formatted plan names unpartitioned windows explicitly
    assert "No Partition Defined" not in plan


def test_zipf_topk_prune_before_rank(q):
    """r13: the rank window must run on the k-row TakeOrdered survivors,
    never on the full (open-vocabulary) frequency frame."""
    plan = _plan(q("zipf_rank_frequency"))
    assert "TakeOrderedAndProject" in plan


def test_pareto_rank_is_two_pass(q):
    """r13: pareto's customer rank comes from global_rank's bucketed
    two-pass prefix sum — the within-bucket window is partitioned and
    the broadcast carries the prefixes back."""
    plan = _plan(q("pareto_revenue_share"))
    assert "BroadcastHashJoin" in plan
    # the only windows are the bucket-frame prefix scan and the
    # partitioned within-bucket row_number — never a bare rank over
    # the customer frame (which would show row_number ordered by rev
    # with no partition spec alongside no join)
    assert "__bucket" in plan


# -- r14 (r13 verdict #4): the repo-wide bare-window gate ---------------------

# Every all-to-one WindowExec the catalog is ALLOWED to plan, keyed by query
# and by the window's ORDER-column signature (tools/window_lint.py). Each
# entry is a documented BOUNDED frame — the r13 audit classified them all:
#   __bucket      global_rank / bucketed two-pass prefix scans (<=64 or <=k
#                 bucket rows forever — ranking.py:25-66 and siblings)
#   day / dn / month_key / bucket   calendar- or log2-bounded series
#   rem DESC,source    Hamilton apportionment remainders (5 sources)
#   freq DESC,w        rank over TakeOrdered top-k survivors (zipf)
#   chars DESC,source  top-k survivor frame (topk_sources_with_other)
#   n_tokens DESC      distinct doc-length envelope (max-doc-length-bounded)
#   n_s ASC,source     per-source aggregate frame (#sources rows)
#   ""                 order-less global windows over already-bounded frames
#                      (grand totals on per-source / per-digit aggregates)
# A NEW bare window anywhere in the catalog — or a bare window acquiring a
# new data-scaled shape — changes this inventory and fails the gate; so does
# removing one (update the map, keep it exact).
GLOBAL_WINDOW_ALLOW = {
    "ab_test_conversion": {"__bucket ASC"},
    "benford_first_digit": {""},
    "curriculum_schedule": {"__bucket ASC"},
    "cusum_changepoint_daily": {"day ASC"},
    "domain_token_budget": {"", "rem DESC,source ASC"},
    "equi_depth_price_histogram": {"__bucket ASC"},
    "funnel_time_to_convert": {"__bucket ASC"},
    "gini_source_concentration": {"n_s ASC,source ASC"},
    # r14: exact-median bucket frame + the day-ordered sign/symbol scan —
    # both bounded (<= value-range/1e5 buckets; CALENDAR days)
    "runs_test_daily": {"__bucket ASC", "day ASC"},
    # r14 batch 6: binseg prefix sums over the CALENDAR-bounded day frame
    "binary_segmentation_split": {"day ASC"},
    "sax_daily_motifs": {"__bucket ASC", "day ASC"},
    "hodges_lehmann_shift": {"__bucket ASC"},
    "halflife_event_mass": {""},
    "halflife_event_mass_cells": {""},
    "lm_quality_gate": {"__bucket ASC"},
    "monthly_revenue_momentum": {"month_key ASC"},
    "pareto_revenue_share": {"__bucket ASC"},
    "pps_systematic_sample": {"__bucket ASC"},
    "quality_pareto_frontier": {"n_tokens DESC"},
    "rfm_segments": {"__bucket ASC"},
    "seasonal_decomposition_daily": {"dn ASC"},
    "sequence_pack_bins": {"__bucket ASC"},
    "survival_time_to_purchase": {"day ASC"},
    "topk_sources_with_other": {"chars DESC,source ASC"},
    "training_mixture_report": {"", "rem DESC,source ASC"},
    "vocab_coverage_curve": {"__bucket ASC"},
    "vocab_growth_curve": {"bucket ASC"},
    "zipf_rank_frequency": {"", "freq DESC,w ASC"},
}


def test_no_unbounded_global_window(spark):
    """Walk EVERY registered query's physical plan and compare its
    all-to-one-window inventory against the bounded-frame allow-list. This
    is the permanent form of the r13 manual audit: a data-scaled
    Window.orderBy() added anywhere in the catalog fails here, not in a
    WARN line nobody reads."""
    from tools.window_lint import scan

    spark.conf.set("spark.sql.debug.maxToStringFields", "100000")
    try:
        got = {k: set(v) for k, v in scan(spark, SF_SMOKE).items()}
    finally:
        spark.conf.unset("spark.sql.debug.maxToStringFields")
    errors = {
        k: v for k, v in got.items() if any(s.startswith("!error") for s in v)
    }
    assert not errors, f"query builders failed during the plan walk: {errors}"
    new = {
        k: sorted(v - GLOBAL_WINDOW_ALLOW.get(k, set()))
        for k, v in got.items()
        if v - GLOBAL_WINDOW_ALLOW.get(k, set())
    }
    assert not new, (
        "NEW all-to-one window(s) — either refit to a bucketed two-pass "
        f"or document the bounded frame and extend the allow-list: {new}"
    )
    gone = {
        k: sorted(set(v) - got.get(k, set()))
        for k, v in GLOBAL_WINDOW_ALLOW.items()
        if set(v) - got.get(k, set())
    }
    assert not gone, f"allow-listed windows no longer planned — prune: {gone}"

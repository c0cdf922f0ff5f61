"""Unit-level semantics tests for the round-9 operators (Simpson
diversity, half-life decay mass, t-closeness, label propagation, token
lift, video scene cuts) plus regression tests for the round-9 ADVICE
fixes — independent of the DuckDB oracle tier, which cross-checks the
same operators against sf0.001/sf0.01."""

import datetime

import numpy as np
import pytest
from pyspark.sql import functions as F

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (t, s) in enumerate(rows, 1)],
        DOCS_SCHEMA,
    )


def test_simpson_hand_values(spark):
    from datafusion_pinot_spark.operators.validation import (
        simpson_source_diversity,
    )

    # sources A:3 docs, B:1 doc -> N=4, num = 3*2 + 0 = 6, den = 4*3 = 12
    docs = _docs(spark, [("x", "A"), ("y", "A"), ("z", "A"), ("w", "B")])
    r = simpson_source_diversity(docs).first()
    assert (r["n_sources"], r["n_docs"]) == (2, 4)
    assert (r["simpson_num"], r["simpson_den"]) == (6, 12)
    assert r["simpson_ppm"] == 500_000
    assert r["effective_sources_milli"] == 2000  # 12/6 = 2.0 effective


def test_simpson_degenerate_single_doc(spark):
    from datafusion_pinot_spark.operators.validation import (
        simpson_source_diversity,
    )

    r = simpson_source_diversity(_docs(spark, [("only", "A")])).first()
    # N(N-1) = 0: report zeros, never divide
    assert (r["simpson_den"], r["simpson_ppm"]) == (0, 0)
    assert r["effective_sources_milli"] == 0


def test_halflife_mass_hand_values(spark):
    from datafusion_pinot_spark.operators.validation import (
        halflife_event_mass,
    )

    day = lambda d: datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d)
    events = spark.createDataFrame(
        # type a: 1 event on the max day (age 0) + 1 one day older;
        # type b: 1 event beyond the horizon (age 31 at horizon 30) -> 0
        [(1, day(31), 1, "a", 0.0), (2, day(30), 2, "a", 0.0),
         (3, day(0), 3, "b", 0.0)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    rows = {r["event_type"]: r for r in halflife_event_mass(events).collect()}
    # weights: age0 -> 2^30, age1 -> 2^29, age31 -> 0
    assert int(rows["a"]["mass"]) == (1 << 30) + (1 << 29)
    assert int(rows["b"]["mass"]) == 0
    assert rows["a"]["share_ppm"] == 1_000_000
    assert rows["b"]["share_ppm"] == 0
    # exact half-life structure: adjacent ages differ by exactly 2x
    assert (1 << 30) == 2 * (1 << 29)


def test_t_closeness_hand_values(spark):
    from datafusion_pinot_spark.operators.privacy import t_closeness_audit

    ts = lambda h: datetime.datetime(2024, 1, 1, h, 0, 0)
    # one event_type, two hour-groups; sensitive band = floor(value/50)
    # global: band0 x2, band1 x2 (N=4)
    # group hr=0: {band0 x2} N_g=2 -> tvd = (|2*4-2*2| + |0*4-2*2|)/(2*4*2)
    #            = (4+4)/16 = 0.5 -> 500000 ppm
    # group hr=1: {band1 x2} -> symmetric, 500000 ppm
    events = spark.createDataFrame(
        [(1, ts(0), 1, "a", 0.0), (2, ts(0), 2, "a", 10.0),
         (3, ts(1), 3, "a", 60.0), (4, ts(1), 4, "a", 70.0)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    r = t_closeness_audit(events, t_ppm=400_000).first()
    assert r["n_groups"] == 2
    assert r["max_tvd_ppm"] == 500_000
    assert r["groups_over_t"] == 2
    # threshold above the worst group -> none flagged
    r2 = t_closeness_audit(events, t_ppm=600_000).first()
    assert r2["groups_over_t"] == 0


def test_t_closeness_uniform_group_is_zero(spark):
    from datafusion_pinot_spark.operators.privacy import t_closeness_audit

    ts = datetime.datetime(2024, 1, 1, 5, 0, 0)
    # a single group whose distribution IS the global one -> TVD 0
    events = spark.createDataFrame(
        [(1, ts, 1, "a", 0.0), (2, ts, 2, "a", 60.0)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    r = t_closeness_audit(events).first()
    assert (r["max_tvd_ppm"], r["groups_over_t"]) == (0, 0)


def test_label_prop_iterations_matches_two_round(spark, testdata):
    """The any-depth loop at rounds=2 must equal the unrolled two-round
    query row-for-row (same contract as the pagerank equivalence test)."""
    from datafusion_pinot_spark.operators.graph import (
        label_prop_iterations,
        label_prop_two_round,
    )

    orders, lineitem = testdata["orders"], testdata["lineitem"]
    a = label_prop_two_round(orders, lineitem).collect()
    b = label_prop_iterations(orders, lineitem, rounds=2).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_label_prop_converges_to_components(spark):
    """On a graph of two disjoint chains, enough rounds label every node
    with its component's minimum id, i.e. exact connected components."""
    from datafusion_pinot_spark.operators.graph import _label_round

    edges_undir = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12)]
    edges = spark.createDataFrame(
        edges_undir + [(b, a) for a, b in edges_undir], "src long, dst long"
    )
    lab = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lab"))
    )
    for _ in range(4):
        lab = _label_round(lab, edges)
    got = {r["node"]: r["lab"] for r in lab.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10}


def test_token_lift_hand_values(spark):
    from datafusion_pinot_spark.operators.text import token_lift_pairs

    # 4 docs; x and y co-occur in 2 of 4 docs, each appears in 2 docs:
    # lift = (2*4)/(2*2) = 2.0 -> 2_000_000 ppm.
    # x and z never co-occur -> pair absent.
    docs = _docs(
        spark,
        [("x y", "A"), ("x y", "A"), ("z w", "A"), ("z w q", "A")],
    )
    rows = {
        (r["token_a"], r["token_b"]): r
        for r in token_lift_pairs(docs, min_pair_docs=2).collect()
    }
    assert ("x", "z") not in rows
    xy = rows[("x", "y")]
    assert (xy["n_xy"], xy["n_x"], xy["n_y"]) == (2, 2, 2)
    assert xy["lift_ppm"] == 2_000_000
    zw = rows[("w", "z")]  # ordered a < b
    assert zw["lift_ppm"] == 2_000_000
    # min_pair_docs prunes: require 3 shared docs -> nothing survives
    assert token_lift_pairs(docs, min_pair_docs=3).count() == 0


def test_token_lift_dup_tokens_count_once_per_doc(spark):
    from datafusion_pinot_spark.operators.text import token_lift_pairs

    # doc-level DISTINCT: repeating "x y" inside one doc must not inflate
    docs = _docs(spark, [("x y x y x", "A"), ("x y", "A")])
    r = token_lift_pairs(docs, min_pair_docs=1).first()
    assert (r["n_xy"], r["n_x"], r["n_y"]) == (2, 2, 2)
    # lift = 2*2/(2*2) = 1.0
    assert r["lift_ppm"] == 1_000_000


def test_video_frame_signatures_match_numpy(spark):
    from datafusion_pinot_spark.operators.multimodal import (
        video_frame_signatures,
        with_binary_payload,
    )

    text = "abcdefgh" * 5  # 40 bytes -> 5 frames of 8, no remainder
    docs = _docs(spark, [(text, "A"), ("short", "A")])
    out = video_frame_signatures(
        with_binary_payload(docs), frame_len=8
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["frame_idx"], r["fsum"]))
    # doc 2 is 5 bytes < frame_len -> no frames at all
    assert set(by_doc) == {1}
    a = np.frombuffer(text.encode(), dtype=np.uint8).astype(np.int64)
    expect = a.reshape(-1, 8).sum(axis=1)
    got = [s for _, s in sorted(by_doc[1])]
    assert got == expect.tolist()


def test_video_scene_cuts_detects_jump(spark):
    from datafusion_pinot_spark.operators.multimodal import video_scene_cuts

    # frame 0: 8 x 'a' (sum 776), frame 1: 8 x 'z' (sum 976) -> delta 200
    quiet = "aaaaaaaa" * 3
    jumpy = "aaaaaaaa" + "zzzzzzzz" + "aaaaaaaa"
    docs = _docs(spark, [(quiet, "A"), (jumpy, "A")])
    rows = {
        r["doc_id"]: r
        for r in video_scene_cuts(docs, frame_len=8, threshold=150).collect()
    }
    assert rows[1]["n_cuts"] == 0 and rows[1]["max_delta"] == 0
    assert rows[2]["n_cuts"] == 2  # a->z and z->a
    assert rows[2]["max_delta"] == 8 * (ord("z") - ord("a"))
    assert rows[2]["n_frames"] == 3


# ---- regression tests for the round-9 ADVICE fixes ----


def test_epoch_upsample_chunked_explode_crosses_chunk_boundary(spark):
    """A tiny source upsampled far past the 4096-epoch chunk size must
    emit exactly target-many rows — the chunked two-level explode is
    semantically identical to the old single sequence()."""
    from datafusion_pinot_spark.operators.curation import (
        epoch_upsample_report,
    )

    big_n, small_n = 9000, 2  # n_rep per small doc = 4500 > 4096
    rows = [(f"doc {i}", "big") for i in range(big_n)] + [
        ("tiny one", "small"),
        ("tiny two", "small"),
    ]
    docs = _docs(spark, rows)
    got = {r["source"]: r for r in epoch_upsample_report(docs).collect()}
    assert got["big"]["n_emitted"] == big_n
    assert got["small"]["n_emitted"] == big_n  # 2 docs x 4500 epochs
    assert got["small"]["n_unique"] == small_n


def test_domain_token_budget_zero_token_corpus_is_empty(spark):
    from datafusion_pinot_spark.operators.curation import domain_token_budget

    docs = _docs(spark, [("", "A"), ("   ", "B")])
    assert domain_token_budget(docs).count() == 0


def test_value_counts_raises_on_missing_column_segment(spark, tmp_path):
    """A segment written before the column existed must fail the
    value_counts read loudly (silently skipping it would return
    incomplete GROUP BY counts)."""
    from datafusion_pinot_spark.sources import register_pinot_source
    from pinot_segment.metadata import DataType
    from pinot_segment.writer import ColumnSpec, write_segment

    register_pinot_source(spark)
    table = tmp_path / "t_OFFLINE"
    write_segment(
        str(table / "seg_old"),
        "seg_old",
        "t",
        [ColumnSpec("k", DataType.INT, [1, 2])],
    )
    write_segment(
        str(table / "seg_new"),
        "seg_new",
        "t",
        [
            ColumnSpec("k", DataType.INT, [3, 4]),
            ColumnSpec("extra", DataType.INT, [7, 8]),
        ],
    )
    with pytest.raises(Exception, match="absent from segment"):
        (
            spark.read.format("pinot")
            .option("value_counts", "extra")
            .load(str(table))
            .collect()
        )


def test_dictionary_groupby_composite_requires_common_segments(spark):
    """The composite-key dict group-by must validate every key column over
    the SAME segment set (guards the dirs-overwrite hazard)."""
    from datafusion_pinot_spark.operators import segment_distinct as sd

    calls = []
    real = sd._dict_nullfree_everywhere

    def fake(table_dir, name):
        calls.append(name)
        # simulate a helper that returns DIFFERENT segment lists per column
        return (["/seg/a"], 2) if name == "x" else (["/seg/b"], 2)

    sd._dict_nullfree_everywhere, orig = fake, real
    try:
        assert sd.dictionary_groupby_count(spark, "/nowhere", "x,y") is None
    finally:
        sd._dict_nullfree_everywhere = orig
    assert calls == ["x", "y"]


# ---- round-9 batch 2: predicate delete, vocab growth, canonical keep ----


def test_filter_segment_preserves_layout(tmp_path):
    """Storage kernel: filtering keeps values/nulls aligned, preserves
    the physical config, and keeps a sorted segment sorted."""
    import numpy as np

    from pinot_segment import SegmentReader
    from pinot_segment.compact import filter_segment
    from pinot_segment.metadata import DataType
    from pinot_segment.writer import ColumnSpec, write_segment

    nulls = np.array([False, True, False, False, False, False], dtype=bool)
    v3 = write_segment(
        str(tmp_path / "s0"),
        "s0",
        "t",
        [
            ColumnSpec(
                "k",
                DataType.LONG,
                np.array([1, 2, 3, 4, 5, 6], dtype=np.int64),
                inverted=True,
            ),
            ColumnSpec(
                "v",
                DataType.LONG,
                np.array([10, 0, 30, 40, 50, 60], dtype=np.int64),
                null_mask=nulls,
            ),
            ColumnSpec("s", DataType.STRING, list("abcdef")),
        ],
    )
    keep = np.array([True, True, False, False, True, True])
    nv3 = filter_segment(str(v3), str(tmp_path / "s0f"), "s0f", "t", keep)
    r = SegmentReader.open(str(nv3))
    assert r.total_docs() == 4
    assert list(r.read_column("k")) == [1, 2, 5, 6]
    assert list(r.read_column("s")) == ["a", "b", "e", "f"]
    nm = r.null_mask("v")
    assert nm is not None and list(nm) == [False, True, False, False]
    km = r.metadata.get_column("k")
    assert km.has_inverted_index
    assert km.is_sorted  # order preserved -> writer re-detects sorted
    # zero-row filters are refused (caller drops the segment instead)
    with pytest.raises(ValueError, match="zero rows"):
        filter_segment(
            str(v3), str(tmp_path / "s0z"), "s0z", "t", np.zeros(6, bool)
        )


def test_delete_rows_triage_and_results(spark, tmp_path):
    """Zone-map triage: disjoint segments never touched, fully-covered
    segments drop whole, straddlers rewrite — and the surviving rows are
    exactly NOT (lo <= k <= hi)."""
    import numpy as np

    from datafusion_pinot_spark.maintenance import delete_rows
    from datafusion_pinot_spark.sources import register_pinot_source
    from pinot_segment.manifest import refresh_manifest
    from pinot_segment.metadata import DataType
    from pinot_segment.writer import ColumnSpec, write_segment

    register_pinot_source(spark)
    table = tmp_path / "t_OFFLINE"
    ranges = {"s_low": (0, 9), "s_mid": (10, 19), "s_high": (20, 29)}
    for name, (a, b) in ranges.items():
        ks = np.arange(a, b + 1, dtype=np.int64)
        write_segment(
            str(table / name),
            name,
            "t",
            [
                ColumnSpec("k", DataType.LONG, ks),
                ColumnSpec("v", DataType.LONG, ks * 100),
            ],
        )
    refresh_manifest(str(table))
    # delete k in [10, 24]: s_low untouched, s_mid dropped whole,
    # s_high straddles (20..24 go, 25..29 stay)
    out = delete_rows(spark, str(table), "k", 10, 24)
    assert out["untouched"] == 1
    assert out["dropped"] == ["s_mid"]
    assert out["rewritten"] == ["s_high"]
    assert out["rows_deleted"] == 15
    got = sorted(
        r["k"]
        for r in spark.read.format("pinot").load(str(table)).collect()
    )
    assert got == list(range(0, 10)) + list(range(25, 30))
    # deleting an absent range is a metadata-only no-op
    out2 = delete_rows(spark, str(table), "k", 1000, 2000)
    assert out2["rows_deleted"] == 0 and not out2["rewritten"]


def test_delete_rows_keeps_null_rows(spark, tmp_path):
    """NULL never matches the predicate: a fully-covered segment with a
    nullable delete column must REWRITE (keeping null rows), not drop."""
    import numpy as np

    from datafusion_pinot_spark.maintenance import delete_rows
    from datafusion_pinot_spark.sources import register_pinot_source
    from pinot_segment.manifest import refresh_manifest
    from pinot_segment.metadata import DataType
    from pinot_segment.writer import ColumnSpec, write_segment

    register_pinot_source(spark)
    table = tmp_path / "t_OFFLINE"
    nulls = np.array([False, False, True, False], dtype=bool)
    write_segment(
        str(table / "s0"),
        "s0",
        "t",
        [
            ColumnSpec(
                "k", DataType.LONG, np.array([1, 2, 0, 3], dtype=np.int64),
                null_mask=nulls,
            ),
            ColumnSpec(
                "tag", DataType.LONG, np.array([7, 8, 9, 10], dtype=np.int64)
            ),
        ],
    )
    refresh_manifest(str(table))
    out = delete_rows(spark, str(table), "k", 0, 100)
    assert out["dropped"] == [] and len(out["rewritten"]) == 1
    assert out["rows_deleted"] == 3
    rows = spark.read.format("pinot").load(str(table)).collect()
    assert len(rows) == 1 and rows[0]["k"] is None and rows[0]["tag"] == 9


def test_vocab_growth_hand_values(spark):
    from datafusion_pinot_spark.operators.text import vocab_growth_curve

    # bucket_docs=2: bucket0 = docs 1-2, bucket1 = docs 3-4
    docs = _docs(
        spark, [("a b", "s"), ("a c", "s"), ("a b", "s"), ("d", "s")]
    )
    rows = {r["bucket"]: r for r in vocab_growth_curve(docs, 2).collect()}
    b0, b1 = rows[0], rows[1]
    assert (b0["n_tokens"], b0["new_types"]) == (4, 3)  # a,b,c new
    assert (b1["n_tokens"], b1["new_types"]) == (3, 1)  # only d new
    assert (b1["cum_tokens"], b1["cum_types"]) == (7, 4)


def test_canonical_keep_hand_values(spark):
    from datafusion_pinot_spark.operators.dedup import canonical_keep_report

    docs = spark.createDataFrame(
        [
            (1, "same text", "en", "A", 9),
            (2, "same text", "en", "B", 9),  # dup of 1 -> loses (doc_id)
            (3, "unique", "en", "B", 6),
        ],
        DOCS_SCHEMA,
    )
    rows = {r["source"]: r for r in canonical_keep_report(docs).collect()}
    assert (rows["A"]["n_kept"], rows["A"]["n_dropped"]) == (1, 0)
    assert (rows["B"]["n_kept"], rows["B"]["n_dropped"]) == (1, 1)


# ---- round-9 batch 3: incremental rollup MV, prefix-filter Jaccard ----


def test_refresh_rollup_mv_incremental(spark, tmp_path):
    from datafusion_pinot_spark.maintenance import refresh_rollup_mv
    from datafusion_pinot_spark.sources import register_pinot_source

    register_pinot_source(spark)
    base = str(tmp_path / "b_OFFLINE")
    mv_dir = str(tmp_path / "mv")
    df1 = spark.createDataFrame(
        [("x", 1, 10), ("x", 2, 20), ("y", 3, 30)], "k string, a long, b long"
    )
    df1.coalesce(1).write.format("pinot").mode("overwrite").save(base)
    r1 = refresh_rollup_mv(spark, base, mv_dir, ["k"], ["a", "b"])
    assert r1["refreshed"] and len(r1["delta_segments"]) == 1
    # append a second ingest; refresh must fold ONLY the new segment
    df2 = spark.createDataFrame(
        [("x", 4, 40), ("z", 5, 50)], "k string, a long, b long"
    )
    df2.coalesce(1).write.format("pinot").mode("append").save(base)
    r2 = refresh_rollup_mv(spark, base, mv_dir, ["k"], ["a", "b"])
    assert r2["refreshed"] and len(r2["delta_segments"]) == 1
    assert r2["delta_segments"][0] not in r1["delta_segments"]
    got = {
        r["k"]: (r["sum_a"], r["sum_b"], r["cnt"])
        for r in spark.read.format("pinot")
        .load(mv_dir + "/mv_OFFLINE")
        .collect()
    }
    assert got == {"x": (7, 70, 3), "y": (3, 30, 1), "z": (5, 50, 1)}
    # no new segments -> refresh is a no-op
    r3 = refresh_rollup_mv(spark, base, mv_dir, ["k"], ["a", "b"])
    assert not r3["refreshed"] and r3["delta_segments"] == []


def test_jaccard_prefix_join_lossless_vs_bruteforce(spark):
    """The prefix-filtered join must return EXACTLY the pairs the naive
    all-pairs computation finds — losslessness on a seeded corpus."""
    import itertools
    import random

    from datafusion_pinot_spark.operators.dedup import jaccard_prefix_join

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.sample(vocab, rng.randint(4, 10))) for _ in range(40)
    ]
    texts[5] = texts[3]  # exact dup -> J = 1.0
    docs = _docs(spark, [(t, "s") for t in texts])
    t_ppm = 400_000
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard_ppm"]
        for r in jaccard_prefix_join(docs, t_ppm=t_ppm, k=10_000).collect()
    }
    sets = {i + 1: set(t.split()) for i, t in enumerate(texts)}
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if inter == 0:
            continue
        ppm = inter * 1_000_000 // (len(sets[a]) + len(sets[b]) - inter)
        if ppm >= t_ppm:
            want[(a, b)] = ppm
    assert got == want
    assert got[(4, 6)] == 1_000_000  # the planted exact dup


def test_jaccard_prefix_join_threshold_edges(spark):
    from datafusion_pinot_spark.operators.dedup import jaccard_prefix_join

    # J({a,b,c},{a,b,d}) = 2/4 = 0.5 exactly: included at t=500000 (>=),
    # excluded at t=500001
    docs = _docs(spark, [("a b c", "s"), ("a b d", "s")])
    at = jaccard_prefix_join(docs, t_ppm=500_000).collect()
    assert len(at) == 1 and at[0]["jaccard_ppm"] == 500_000
    above = jaccard_prefix_join(docs, t_ppm=500_001).collect()
    assert above == []


def test_entity_cluster_transitivity(spark):
    """A~B and B~C must land in ONE cluster even when A and C differ by
    more than the edit threshold — the property pairwise linkage lacks."""
    from datafusion_pinot_spark.operators.linkage import entity_cluster_sizes

    part = spark.createDataFrame(
        [
            (1, "widget aa", "B1"),
            (2, "widget ab", "B1"),  # dist(1,2)=1
            (3, "widget bb", "B1"),  # dist(2,3)=1, dist(1,3)=2
            (4, "widget bc", "B1"),  # chain continues: dist(3,4)=1
            (5, "zzzzzzzzz", "B1"),  # singleton
            (6, "widget aa", "B2"),  # other brand: blocked apart
        ],
        "p_partkey long, p_name string, p_brand string",
    )
    got = {
        r["cluster_size"]: r["n_clusters"]
        for r in entity_cluster_sizes(part, max_dist=2).collect()
    }
    # one 4-chain cluster {1,2,3,4}, singletons {5} and {6}
    assert got == {1: 2, 4: 1}


def test_boilerplate_strip_hand_values(spark):
    from datafusion_pinot_spark.operators.dedup import (
        boilerplate_strip_report,
    )

    # 4 docs in source A: the 2-word chunk "nav bar" opens 3 of 4 docs
    # (75% >= 30% and df>=2 -> boilerplate); unique bodies are kept.
    rows = [
        ("nav bar alpha one", "A"),
        ("nav bar beta two", "A"),
        ("nav bar gamma xyz", "A"),
        ("clean text only here", "A"),
        ("nav bar", "B"),  # df=1 in B -> never boilerplate there
    ]
    docs = _docs(spark, rows)
    out = {
        r["source"]: r
        for r in boilerplate_strip_report(docs, words_per_chunk=2).collect()
    }
    a = out["A"]
    # each A doc = 2 chunks -> 8 occurrences; "nav bar" removed 3x
    assert (a["n_docs"], a["n_occurrences"], a["n_removed"]) == (4, 8, 3)
    assert a["removed_ppm"] == 375_000
    b = out["B"]
    assert (b["n_occurrences"], b["n_removed"]) == (1, 0)


def test_ks_drift_hand_values(spark):
    """Two types with disjoint supports: KS = 1.0 exactly."""
    import datetime as dtm

    from datafusion_pinot_spark.operators.validation import ks_source_drift

    ts = dtm.datetime(2024, 1, 1)
    events = spark.createDataFrame(
        [(1, ts, 1, "a", 0.001), (2, ts, 2, "a", 0.002),
         (3, ts, 3, "b", 5.0), (4, ts, 4, "b", 6.0)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    rows = {r["event_type"]: r for r in ks_source_drift(events).collect()}
    assert rows["a"]["ks_ppm"] == 1_000_000
    assert rows["b"]["ks_ppm"] == 1_000_000
    # identical distributions: KS = 0
    ev2 = spark.createDataFrame(
        [(1, ts, 1, "a", 1.0), (2, ts, 2, "b", 1.0)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    rows2 = {r["event_type"]: r for r in ks_source_drift(ev2).collect()}
    assert rows2["a"]["ks_ppm"] == 0 and rows2["b"]["ks_ppm"] == 0


def test_trimmed_mean_hand_values(spark):
    import datetime as dtm

    from datafusion_pinot_spark.operators.validation import (
        trimmed_mean_robust,
    )

    ts = dtm.datetime(2024, 1, 1)
    # 10 values 1..9 plus one 1000x outlier; 10% trim cuts exactly the
    # min and the outlier -> mean of 2..9 even though the raw mean is huge
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 9000.0]
    events = spark.createDataFrame(
        [(i, ts, i, "a", v) for i, v in enumerate(vals, 1)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    r = trimmed_mean_robust(events, trim_pct=10).first()
    assert (r["n_values"], r["n_kept"]) == (10, 8)
    assert r["trimmed_mean_milli"] == (sum(range(2, 10)) * 1000) // 8


def test_dow_seasonality_hand_values(spark):
    import datetime as dtm

    from datafusion_pinot_spark.operators.validation import (
        dow_seasonality_index,
    )

    # 1970-01-05 was a Monday (epoch day 4 -> (4+3)%7 == 0)
    mon = dtm.datetime(1970, 1, 5)
    events = spark.createDataFrame(
        # type a: 6 events Monday, 1 event Tuesday -> Monday index 6M
        [(i, mon, i, "a", 0.0) for i in range(6)]
        + [(9, mon + dtm.timedelta(days=1), 9, "a", 0.0)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    rows = {r["dow"]: r for r in dow_seasonality_index(events).collect()}
    assert rows[0]["n"] == 6 and rows[1]["n"] == 1
    assert rows[0]["index_ppm"] == 6 * 7 * 1_000_000 // 7
    assert rows[1]["index_ppm"] == 1 * 7 * 1_000_000 // 7


def test_image_tile_sums_match_numpy(spark):
    from datafusion_pinot_spark.operators.multimodal import (
        image_tile_sums,
        with_binary_payload,
    )

    # 256-byte payload = 16x16 image; tile grid 4x4 -> 16 tiles of 4x4
    text = "".join(chr(65 + (i % 26)) for i in range(256))
    docs = _docs(spark, [(text, "A"), ("tiny", "A")])
    rows = image_tile_sums(with_binary_payload(docs)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["tile"]] = r["tsum"]
    assert set(by_doc) == {1}  # doc 2 is under 256 bytes -> dropped
    img = np.frombuffer(text.encode(), np.uint8).astype(np.int64)
    want = img.reshape(16, 16).reshape(4, 4, 4, 4).sum(axis=(1, 3)).ravel()
    assert [by_doc[1][t] for t in range(16)] == want.tolist()


def test_image_tile_contrast_flat_image_is_zero(spark):
    from datafusion_pinot_spark.operators.multimodal import (
        image_tile_contrast,
    )

    flat = "a" * 256
    # last 16 bytes = bottom ROW of the 16x16 image: 4 'z' bytes land in
    # each of tiles 12..15 (tie -> lowest index 12), contrast = 4*(z-a)
    spot = "a" * 240 + "z" * 16
    docs = _docs(spark, [(flat, "A"), (spot, "A")])
    rows = {r["doc_id"]: r for r in image_tile_contrast(docs).collect()}
    assert rows[1]["contrast"] == 0 and rows[1]["brightest_tile"] == 0
    assert rows[2]["contrast"] == 4 * (ord("z") - ord("a"))
    assert rows[2]["brightest_tile"] == 12


def test_upsert_tombstone_resolution_order(spark, tmp_path):
    """Last-wins resolves FIRST, then the tombstone test on the winner: a
    superseded tombstone must NOT hide the key; a winning one must."""
    from datafusion_pinot_spark.catalog import PinotCatalog
    from datafusion_pinot_spark.sources import register_pinot_source

    register_pinot_source(spark)
    out = str(tmp_path / "d_OFFLINE")
    rows = [
        # key 1: tombstone at v2 superseded by live v3 -> SURVIVES as v3
        (1, 10, 1, False), (1, 0, 2, True), (1, 30, 3, False),
        # key 2: live v1 then tombstone v2 wins -> GONE
        (2, 20, 1, False), (2, 0, 2, True),
        # key 3: only live -> survives
        (3, 33, 1, False),
    ]
    df = spark.createDataFrame(
        rows, "k long, val long, ver long, deleted boolean"
    )
    df.coalesce(1).write.format("pinot").mode("overwrite").save(out)
    cat = PinotCatalog.filesystem(str(tmp_path))
    live = {
        r["k"]: r["val"]
        for r in cat.load_upsert_table(
            spark, "d", "k", "ver", delete_column="deleted"
        ).collect()
    }
    assert live == {1: 30, 3: 33}
    # guard: tombstones only defined for full mode
    import pytest as _pytest

    with _pytest.raises(ValueError, match="only.*full"):
        cat.load_upsert_table(
            spark, "d", "k", "ver", mode="changelog", delete_column="deleted"
        )


def test_clamped_balance_hand_values(spark):
    import datetime as dtm

    from datafusion_pinot_spark.operators.temporal import (
        clamped_balance_report,
    )

    t0 = dtm.datetime(2024, 1, 1)
    tick = lambda i: t0 + dtm.timedelta(minutes=i)
    # user 1 in ts order: +5, -8 (clamps to 0), +3, -1 -> final 2,
    # clamps 1, max 5 (milli-scaled)
    rows = [
        (2, tick(0), 1, "e", 5.0),   # even id -> +5000
        (1, tick(1), 1, "e", 8.0),   # odd id  -> -8000, clamp
        (4, tick(2), 1, "e", 3.0),   # +3000
        (3, tick(3), 1, "e", 1.0),   # -1000
        # user 2: single debit clamps immediately -> 0 balance, 1 clamp
        (5, tick(0), 2, "e", 9.0),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    got = {r["user_id"]: r for r in clamped_balance_report(events).collect()}
    u1 = got[1]
    assert (u1["final_balance_milli"], u1["n_clamps"]) == (2000, 1)
    assert u1["max_balance_milli"] == 5000 and u1["n_events"] == 4
    u2 = got[2]
    assert (u2["final_balance_milli"], u2["n_clamps"]) == (0, 1)


def test_word_runs_udtf_hand_values(spark):
    from datafusion_pinot_spark.operators.text import word_runs_topk

    docs = _docs(
        spark,
        [
            ("go go go stop stop now", "A"),  # runs: go x3 @1, stop x2 @4
            ("all distinct words here", "A"),  # no runs
        ],
    )
    rows = [
        (r["doc_id"], r["word"], r["run_len"], r["start_pos"])
        for r in word_runs_topk(spark, docs).collect()
    ]
    assert rows == [(1, "go", 3, 1), (1, "stop", 2, 4)]


def test_theil_sen_outlier_resistance(spark):
    """One spike day drags OLS but not the slope median: a flat series
    with one huge day must report slope 0."""
    import datetime as dtm

    from datafusion_pinot_spark.operators.validation import (
        theil_sen_daily_trend,
    )

    rows = []
    eid = 0
    for d in range(9):  # 3 events/day, flat
        for _ in range(3):
            eid += 1
            rows.append((eid, dtm.datetime(2024, 1, 1 + d), eid, "a", 0.0))
    for _ in range(300):  # day 10: spike
        eid += 1
        rows.append((eid, dtm.datetime(2024, 1, 10), eid, "a", 0.0))
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    r = theil_sen_daily_trend(events).first()
    assert r["n_pairs"] == 45  # C(10, 2)
    assert (r["slope_num"], r["slope_milli"]) == (0, 0)


def test_lm_quality_gate_partitions_at_median(spark):
    from datafusion_pinot_spark.operators.text import lm_quality_gate

    # "a a a a" scores 1.0 (every bigram is the corpus's dominant one);
    # mixed docs score lower; kept + dropped must equal scoreable docs
    docs = _docs(
        spark,
        [("a a a a", "X"), ("a a a a", "X"), ("a b c d", "Y"),
         ("b c d e", "Y"), ("one", "Z")],  # 1 token -> not scoreable
    )
    rows = {r["source"]: r for r in lm_quality_gate(docs).collect()}
    assert "Z" not in rows  # no bigrams, excluded entirely
    total = sum(r["n_kept"] + r["n_dropped"] for r in rows.values())
    assert total == 4
    assert rows["X"]["n_kept"] == 2  # top scorers are all kept


def test_sq8_quantization_properties(spark):
    """SQ8 codes are scale-invariant per vector (2x the vector -> same
    codes) and the integer ranking is deterministic."""
    from datafusion_pinot_spark.operators.similarity import sq8_topk

    base = [1.0, -0.5, 0.25, 0.0]
    emb = spark.createDataFrame(
        [
            (1, base, 0),
            (2, [2 * x for x in base], 0),  # same direction, 2x scale
            (3, [-x for x in base], 0),  # opposite direction
            (4, [0.0, 0.0, 0.0, 0.0], 0),  # zero vector -> zero codes
        ],
        "vec_id long, embedding array<float>, label int",
    )
    rows = sq8_topk(emb, [1], k=3).collect()
    ranked = [(r["vec_id"], r["qdot"]) for r in rows]
    # 2x-scaled twin quantizes to the SAME codes -> qdot == self-dot of
    # codes [127, -64, 31, 0] (floor semantics) = 127^2+64^2+31^2
    want_self = 127 * 127 + (-64) * (-64) + 31 * 31
    assert ranked[0] == (2, want_self)
    assert ranked[1][0] == 4 and ranked[1][1] == 0  # zero vec: dot 0
    # the negated vector's codes floor ASYMMETRICALLY
    # (floor(0.5*127)=63 vs floor(-0.5*127)=-64): [-127, 63, -32, 0]
    want_neg = 127 * -127 + (-64) * 63 + 31 * -32
    assert ranked[2] == (3, want_neg)


def test_reindex_table_adds_inverted_index(spark, tmp_path):
    from datafusion_pinot_spark.maintenance import reindex_table
    from datafusion_pinot_spark.sources import register_pinot_source
    from pinot_segment import SegmentReader, manifest as M

    register_pinot_source(spark)
    out = str(tmp_path / "t_OFFLINE")
    df = spark.createDataFrame(
        [(i, f"k{i % 3}") for i in range(30)], "a long, k string"
    )
    df.repartition(2).write.format("pinot").mode("overwrite").save(out)
    for v3 in M._segment_v3_dirs(out):
        assert not SegmentReader.open(v3).metadata.get_column(
            "k"
        ).has_inverted_index
    res = reindex_table(spark, out, "k", "inverted")
    assert len(res["reindexed"]) == 2 and res["skipped"] == 0
    rows_after = []
    for v3 in M._segment_v3_dirs(out):
        cm = SegmentReader.open(v3).metadata.get_column("k")
        assert cm.has_inverted_index  # flag present
        rows_after.append(SegmentReader.open(v3).total_docs())
    assert sum(rows_after) == 30  # data bit-identical in count
    got = sorted(
        (r["a"], r["k"])
        for r in spark.read.format("pinot").load(out).collect()
    )
    assert got == sorted((i, f"k{i % 3}") for i in range(30))
    # idempotence: a second call skips every segment
    res2 = reindex_table(spark, out, "k", "inverted")
    assert res2["reindexed"] == [] and res2["skipped"] == 2


def test_contribution_sensitivity_hand_values(spark):
    import datetime as dtm

    from datafusion_pinot_spark.operators.privacy import (
        contribution_sensitivity_audit,
    )

    ts = dtm.datetime(2024, 1, 1)
    # type a: user 1 -> 12 events, user 2 -> 3, user 3 -> 1
    rows = (
        [(i, ts, 1, "a", 0.0) for i in range(12)]
        + [(100 + i, ts, 2, "a", 0.0) for i in range(3)]
        + [(200, ts, 3, "a", 0.0)]
    )
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    r = contribution_sensitivity_audit(events, clip=10).first()
    assert (r["n_users"], r["max_contrib"], r["median_contrib"]) == (3, 12, 3)
    # clipping at 10: only user 1 is touched, losing 12-10 = 2 rows
    assert (r["users_clipped"], r["rows_lost_at_clip"]) == (1, 2)


def test_bounce_rate_hand_values(spark):
    import datetime as dtm

    from datafusion_pinot_spark.operators.temporal import session_bounce_rate

    t0 = dtm.datetime(2024, 1, 1)
    mins = lambda m: t0 + dtm.timedelta(minutes=m)
    rows = [
        # user 1 type a: 2 events 5 min apart -> ONE session, no bounce
        (1, mins(0), 1, "a", 0.0), (2, mins(5), 1, "a", 0.0),
        # then a 60-min gap -> a second session with 1 event -> bounce
        (3, mins(65), 1, "a", 0.0),
        # user 2 type a: single event -> bounce
        (4, mins(0), 2, "a", 0.0),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    r = session_bounce_rate(events).first()
    assert (r["n_sessions"], r["n_bounces"]) == (3, 2)
    assert r["bounce_ppm"] == 2 * 1_000_000 // 3


def test_inactivity_gap_single_event_user_is_zero(spark):
    import datetime as dtm

    from datafusion_pinot_spark.operators.temporal import (
        user_inactivity_gaps,
    )

    t0 = dtm.datetime(2024, 1, 1)
    events = spark.createDataFrame(
        [(1, t0, 7, "a", 0.0),
         (2, t0, 8, "a", 0.0),
         (3, t0 + dtm.timedelta(seconds=90), 8, "a", 0.0)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    rows = {r["user_id"]: r for r in user_inactivity_gaps(events).collect()}
    assert rows[7]["max_gap_s"] == 0 and rows[7]["n_events"] == 1
    assert rows[8]["max_gap_s"] == 90


def test_dau_wau_stickiness_hand_values(spark):
    import datetime as dtm

    from datafusion_pinot_spark.operators.temporal import dau_wau_stickiness

    day = lambda d, u: (
        d * 100 + u,
        dtm.datetime(2024, 1, 1) + dtm.timedelta(days=d),
        u,
        "a",
        0.0,
    )
    # day0: users 1,2; day1: user 1 (twice -> still 1 DAU)
    events = spark.createDataFrame(
        [day(0, 1), day(0, 2), day(1, 1), (999, dtm.datetime(2024, 1, 2, 5), 1, "a", 0.0)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    rows = {r["day"]: r for r in dau_wau_stickiness(events).collect()}
    d0, d1 = sorted(rows)
    assert (rows[d0]["dau"], rows[d0]["wau"]) == (2, 2)
    assert rows[d0]["stickiness_ppm"] == 1_000_000
    # day1: dau 1 (dup events collapse), trailing wau still 2
    assert (rows[d1]["dau"], rows[d1]["wau"]) == (1, 2)
    assert rows[d1]["stickiness_ppm"] == 500_000


def test_driver_window_invariants():
    """Static guards for the rotation workflow: exactly 50 unique names,
    every one registered, every one carrying a DuckDB oracle (a window
    slot spent on a rows-only check would waste its hash gate), and
    ordered_queries() actually serves the window first."""
    from datafusion_pinot_spark.plans.queries import (
        DRIVER_WINDOW,
        QUERIES,
        ordered_queries,
    )

    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50
    missing = [n for n in DRIVER_WINDOW if n not in QUERIES]
    assert not missing, missing
    no_oracle = [n for n in DRIVER_WINDOW if QUERIES[n].oracle is None]
    assert not no_oracle, no_oracle
    assert list(ordered_queries())[:50] == DRIVER_WINDOW


def test_sq8_recall_perfect_on_axis_aligned(spark):
    """On vectors whose direction is fully captured by the codes (axis-
    aligned one-hot), the SQ8 ranking equals the cosine ranking exactly
    -> recall 1.0; and recall is always in [0, 1]."""
    from datafusion_pinot_spark.operators.similarity import sq8_recall_audit

    rows = []
    for i in range(12):
        v = [0.0] * 8
        v[i % 8] = 1.0 + (i // 8) * 0.5  # same direction per axis class
        rows.append((i + 1, v, 0))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = sq8_recall_audit(emb, [1], k=3).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_exact"] == 3
    assert 0 <= r["n_hits"] <= 3
    # axis-aligned codes preserve the cosine order exactly
    assert r["recall_ppm"] == 1_000_000


def test_minhash_estimate_error_exact_dups_are_errorless(spark):
    """Exact duplicates share every shingle AND every signature component:
    est = exact = 1.0, error 0 — the audit's fixed point."""
    from datafusion_pinot_spark.operators.dedup import minhash_estimate_error

    text = "the quick brown fox jumps over the lazy dog again and again"
    docs = _docs(spark, [(text, "A"), (text, "A"), (text, "A")])
    r = minhash_estimate_error(docs).first()
    assert r["n_pairs"] == 3  # all three pairs collide in every band
    assert r["mean_est_ppm"] == 1_000_000
    assert r["mean_exact_ppm"] == 1_000_000
    assert (r["mean_abs_err_ppm"], r["max_err_ppm"]) == (0, 0)


def test_degree_distribution_buckets(spark):
    from datafusion_pinot_spark.operators.graph import degree_distribution

    # customer 1 buys parts 1,2,3 (degree 3 -> bucket 1); customer 2 buys
    # part 1 (degree 1 -> bucket 0). Part 1 has degree 2 (bucket 1).
    orders = spark.createDataFrame(
        [(10, 1), (11, 2)], "o_orderkey long, o_custkey long"
    )
    lineitem = spark.createDataFrame(
        [(10, 1), (10, 2), (10, 3), (11, 1)],
        "l_orderkey long, l_partkey long",
    )
    rows = {r["bucket"]: r for r in degree_distribution(orders, lineitem).collect()}
    # bucket 0 (degree 1): customer 2 + parts 2,3 -> 3 nodes
    assert rows[0]["n_nodes"] == 3 and rows[0]["max_degree"] == 1
    # bucket 1 (degrees 2-3): customer 1 (3) + part 1 (2) -> 2 nodes
    assert rows[1]["n_nodes"] == 2
    assert (rows[1]["min_degree"], rows[1]["max_degree"]) == (2, 3)


def test_pareto_share_hand_values(spark):
    from datafusion_pinot_spark.operators.ranking import pareto_revenue_share

    # 10 customers: one whale with 910.00, nine with 10.00 each
    rows = [(1, 910.0)] + [(i, 10.0) for i in range(2, 11)]
    orders = spark.createDataFrame(
        rows, "o_custkey long, o_totalprice double"
    )
    r = pareto_revenue_share(orders, top_pct=10).first()
    assert (r["n_customers"], r["n_top"]) == (10, 1)
    assert r["total_rev_cents"] == 100_000  # 1000.00
    assert r["top_rev_cents"] == 91_000
    assert r["top_share_ppm"] == 910_000  # whale holds 91%


def test_source_lang_independence_hand_values(spark):
    from datafusion_pinot_spark.operators.validation import (
        source_lang_independence,
    )

    # source A is all-en, source B all-fr (max dependence):
    # cell (A,en): obs=2, N=4, row=2, col=2 -> dev = 2*4 - 2*2 = +4
    docs = spark.createDataFrame(
        [
            (1, "x", "en", "A", 1), (2, "y", "en", "A", 1),
            (3, "z", "fr", "B", 1), (4, "w", "fr", "B", 1),
        ],
        DOCS_SCHEMA,
    )
    rows = {
        (r["source"], r["lang"]): r["deviation"]
        for r in source_lang_independence(docs).collect()
    }
    assert rows[("A", "en")] == 4 and rows[("B", "fr")] == 4
    # perfectly independent table -> every deviation is 0
    docs2 = spark.createDataFrame(
        [
            (1, "x", "en", "A", 1), (2, "y", "fr", "A", 1),
            (3, "z", "en", "B", 1), (4, "w", "fr", "B", 1),
        ],
        DOCS_SCHEMA,
    )
    devs = {r["deviation"] for r in source_lang_independence(docs2).collect()}
    assert devs == {0}


def test_zipf_and_token_yield_hand_values(spark):
    from datafusion_pinot_spark.operators.dedup import dedup_token_yield
    from datafusion_pinot_spark.operators.text import zipf_rank_frequency

    docs = _docs(
        spark,
        [("a a a b b c", "S"), ("a a a b b c", "S"), ("d", "T")],
    )
    z = {r["rank"]: r for r in zipf_rank_frequency(docs, k=4).collect()}
    assert z[1]["token"] == "a" and z[1]["freq"] == 6
    assert z[1]["rel_freq_ppm"] == 1_000_000
    assert z[2]["token"] == "b" and z[2]["rank_x_freq"] == 8
    y = {r["source"]: r for r in dedup_token_yield(docs).collect()}
    # S: two identical 6-token docs -> keep one: 6 of 12 tokens retained
    assert (y["S"]["total_tokens"], y["S"]["kept_tokens"]) == (12, 6)
    assert y["S"]["retained_ppm"] == 500_000
    assert y["T"]["retained_ppm"] == 1_000_000


def test_gap_histogram_and_knn_consistency(spark):
    import datetime as dtm

    from datafusion_pinot_spark.operators.similarity import (
        knn_label_consistency,
    )
    from datafusion_pinot_spark.operators.temporal import (
        interevent_gap_histogram,
    )

    t0 = dtm.datetime(2024, 1, 1)
    # user 1 type a: gaps of 0s, 1s, 5s -> buckets -1, 0, 2
    evs = [
        (1, t0, 1, "a", 0.0),
        (2, t0, 1, "a", 0.0),
        (3, t0 + dtm.timedelta(seconds=1), 1, "a", 0.0),
        (4, t0 + dtm.timedelta(seconds=6), 1, "a", 0.0),
    ]
    events = spark.createDataFrame(
        evs,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    rows = {
        r["bucket"]: r["n_gaps"]
        for r in interevent_gap_histogram(events).collect()
    }
    assert rows == {-1: 1, 0: 1, 2: 1}

    # embeddings: probe 1 (label 0); axis-aligned so nearest = same axis
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [0.9, 0.1], 0),  # close, same label
            (3, [0.8, 0.2], 1),  # close, other label
            (4, [0.0, 1.0], 1),  # far
        ],
        "vec_id long, embedding array<float>, label int",
    )
    r = knn_label_consistency(emb, [1], k=2).first()
    # top-2 by cosine: vec 2 (label 0) and vec 3 (label 1) -> 50%
    assert (r["n_neighbors"], r["n_same_label"]) == (2, 1)
    assert r["consistency_ppm"] == 500_000

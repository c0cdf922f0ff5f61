"""Unit tests for the round-7 operator families (graph, linkage,
containment) on tiny hand-checkable data — the dedicated tier the
auto-parametrized oracle suite does not replace.

The reference engine carries inline known-answer tests for its decoders
(/root/reference/pinot-segment/src/forward_index/fixed_bit.rs:115-170,
metadata.rs:248-292); these follow the same spec-pinning style for the
operators the reference delegates to its SQL layer.
"""

import warnings

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def purchase_graph(spark):
    """Tiny orders+lineitem slice: 3 customers x 4 parts, asymmetric."""
    orders = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, 30)],
        "o_orderkey long, o_custkey long",
    )
    lineitem = spark.createDataFrame(
        [
            (1, 100), (1, 101),
            (2, 101), (2, 102),
            (3, 100), (3, 103),
            (4, 103),
        ],
        "l_orderkey long, l_partkey long",
    )
    return orders, lineitem


def test_pagerank_iterations_equals_two_iter(purchase_graph):
    """The arbitrary-depth production loop at rounds=2 is bit-identical to
    the unrolled two-round query (the equivalence the docstring pins)."""
    from datafusion_pinot_spark.operators.graph import (
        pagerank_iterations,
        pagerank_two_iter,
    )

    orders, lineitem = purchase_graph
    two = [tuple(r) for r in pagerank_two_iter(orders, lineitem, k=50).collect()]
    loop = [
        tuple(r)
        for r in pagerank_iterations(orders, lineitem, rounds=2, k=50).collect()
    ]
    assert two == loop
    assert len(two) == 7  # 3 customers + 4 parts, all reachable


def test_pagerank_mass_is_integer_and_deterministic(purchase_graph):
    from datafusion_pinot_spark.operators.graph import pagerank_two_iter

    orders, lineitem = purchase_graph
    a = pagerank_two_iter(orders, lineitem, k=50).collect()
    b = pagerank_two_iter(orders, lineitem, k=50).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert all(isinstance(r["pr"], int) for r in a)
    # ranks are sorted (pr desc, node asc)
    keys = [(-r["pr"], r["node"]) for r in a]
    assert keys == sorted(keys)


def test_itemset_pair_support_hand_checked(spark):
    """2 users share {a,b}; 1 user adds c: support(a,b)=2 users = 6667bp
    of 3 active users; (a,c) and (b,c) are 1 user each."""
    from datafusion_pinot_spark.operators.graph import itemset_pair_support

    events = spark.createDataFrame(
        [
            (1, "a"), (1, "b"),
            (2, "a"), (2, "b"), (2, "c"),
            (3, "a"),
        ],
        "user_id long, event_type string",
    )
    out = {
        (r["type_a"], r["type_b"]): (r["n_users"], r["support_bp"])
        for r in itemset_pair_support(events).collect()
    }
    assert out[("a", "b")] == (2, 6666)  # (2*10000) div 3
    assert out[("a", "c")] == (1, 3333)
    assert out[("b", "c")] == (1, 3333)
    assert len(out) == 3


def test_linkage_over_cap_block_dropped_with_warning(spark):
    """A block over block_cap contributes no pairs, and the drop is loud
    (warnings.warn) because the naive oracle would still count it."""
    from datafusion_pinot_spark.operators.linkage import (
        blocked_levenshtein_pairs,
    )

    part = spark.createDataFrame(
        [
            # brand BIG: 3 rows > cap=2 -> dropped entirely
            (1, "BIG", "widget aa"),
            (2, "BIG", "widget ab"),
            (3, "BIG", "widget ac"),
            # brand OK: 2 rows <= cap -> one pair at dist 1
            (4, "OK", "gadget xx"),
            (5, "OK", "gadget xy"),
        ],
        "p_partkey long, p_brand string, p_name string",
    )
    with pytest.warns(UserWarning, match="block_cap=2"):
        rows = blocked_levenshtein_pairs(
            part, max_dist=2, block_cap=2
        ).collect()
    assert [(r["a_key"], r["b_key"], r["dist"]) for r in rows] == [(4, 5, 1)]

    # without the cap all three BIG pairs appear too
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # no warning expected now
        rows = blocked_levenshtein_pairs(
            part, max_dist=2, block_cap=100
        ).collect()
    assert len(rows) == 4


def test_geo_grid_join_equals_naive_radius(spark):
    """The 3x3-cell grid join returns exactly the naive all-pairs radius
    counts (property: one grid cell is radius-sized, so a neighborhood of
    9 cells provably covers the disk)."""
    from datafusion_pinot_spark.operators.linkage import (
        _SPAN,
        _XMUL,
        _YMUL,
        geo_radius_counts,
    )

    cust_keys = list(range(1, 400, 7))
    supp_keys = list(range(3, 200, 11))
    customer = spark.createDataFrame(
        [(k,) for k in cust_keys], "c_custkey long"
    )
    supplier = spark.createDataFrame(
        [(k,) for k in supp_keys], "s_suppkey long"
    )
    r = 9000  # large radius so many cells participate
    got = {
        r_["s_suppkey"]: r_["n_customers"]
        for r_ in geo_radius_counts(customer, supplier, radius_m=r).collect()
    }

    def pos(k):
        return (k * _XMUL) % _SPAN, (k * _YMUL) % _SPAN

    naive = {}
    for s in supp_keys:
        sx, sy = pos(s)
        naive[s] = sum(
            1
            for c in cust_keys
            for (cx, cy) in [pos(c)]
            if (cx - sx) ** 2 + (cy - sy) ** 2 <= r * r
        )
    assert got == naive
    assert sum(naive.values()) > 0  # the property isn't vacuous


def test_shingle_containment_directional(spark):
    """A short doc fully inside a long one: 100% containment short->long,
    partial long->short — the asymmetry Jaccard misses."""
    from datafusion_pinot_spark.operators.dedup import (
        shingle_containment_pairs,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),  # 2 trigram shingles
            (2, "alpha beta gamma delta epsilon zeta eta theta"),  # 6
            (3, "totally unrelated words here live now"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["doc_a"], r["doc_b"]): r["containment_pct"]
        for r in shingle_containment_pairs(docs, n=3, threshold_pct=0).collect()
    }
    assert out[(1, 2)] == 100  # both of doc1's shingles occur in doc2
    assert out[(2, 1)] == (100 * 2) // 6  # 33
    assert (1, 3) not in out and (3, 1) not in out
    # threshold cut is applied on the integer percent
    from datafusion_pinot_spark.operators.dedup import (
        shingle_containment_pairs as scp,
    )

    high = {
        (r["doc_a"], r["doc_b"])
        for r in scp(docs, n=3, threshold_pct=80).collect()
    }
    assert high == {(1, 2)}


def test_bpe_pair_counts_hand_checked(spark):
    """Adjacent token-pair counts: 'a b a b' has pairs (a,b)x2, (b,a)x1."""
    from datafusion_pinot_spark.operators.text import bpe_pair_counts

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b")], "doc_id long, text string"
    )
    rows = bpe_pair_counts(docs, k=10).collect()
    out = {(r[0], r[1]): r[2] for r in (tuple(r) for r in rows)}
    assert out[("a", "b")] == 3
    assert out[("b", "a")] == 1


def test_winnow_guarantee_and_hand_values(spark):
    """Winnowing guarantee: two docs sharing a >= k+w-1-token span share
    at least one fingerprint; disjoint docs share none. Plus a
    hand-checkable tiny case."""
    from datafusion_pinot_spark.operators.text import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta"  # 7 = k+w-1 tokens
    docs = spark.createDataFrame(
        [
            (1, f"intro words {shared} closing remark one"),
            (2, f"other prefix tokens {shared} different tail"),
            (3, "entirely unrelated content with many distinct words here"),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs, k=4, w=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared span must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])


def test_winnow_exact_tiny_case(spark):
    """ng = 4 grams, w = 4 -> exactly one full window whose fingerprint is
    the global min gram hash."""
    import hashlib

    from datafusion_pinot_spark.operators.text import winnow_fingerprints

    text = "a b c d e f g"  # 7 tokens, k=4 -> 4 grams
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = winnow_fingerprints(docs, k=4, w=4).collect()
    toks = text.split()
    grams = [" ".join(toks[i : i + 4]) for i in range(4)]
    expect = min(hashlib.md5(g.encode()).hexdigest()[:12] for g in grams)
    assert [(r["doc_id"], r["fp"]) for r in rows] == [(1, expect)]


def test_winnow_short_doc_no_fingerprints(spark):
    from datafusion_pinot_spark.operators.text import winnow_fingerprints

    docs = spark.createDataFrame(
        [(1, "only six tokens in this doc")], "doc_id long, text string"
    )  # 6 < k+w-1=7
    assert winnow_fingerprints(docs, k=4, w=4).count() == 0

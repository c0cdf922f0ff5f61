"""Unit tests for BPE merge learning (operators/bpe.py) and the
largest-remainder token-budget apportionment (operators/curation.py) on
tiny hand-computed inputs, independent of the DuckDB oracle tier."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bpe_docs(spark):
    # word freqs: aa:1, ab:1, aaab:3, b:1
    rows = [(1, "aa ab aaab"), (2, "aaab AAAB b")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bpe_two_merges_hand_computed(bpe_docs):
    """Round 1: (a,a) appears 1 (aa) + 2*3 (aaab) = 7 times, beating
    (a,b) at 4. After merging 'aa' greedily, round 2's argmax is (a,b):
    ab:1 + [aa,a,b]x3 -> 4, beating (aa,a) at 3."""
    from datafusion_pinot_spark.operators.bpe import bpe_learn_merges

    got = [tuple(r) for r in bpe_learn_merges(bpe_docs, rounds=2).collect()]
    assert got == [(1, "a", "a", 7), (2, "a", "b", 4)]


def test_bpe_merge_is_greedy_left_to_right(spark):
    """'aaaa' must merge to [aa, aa] (positions 1-2 and 3-4), never the
    overlapping middle pair — round 2's argmax is then (aa, aa)."""
    from datafusion_pinot_spark.operators.bpe import bpe_learn_merges

    docs = spark.createDataFrame([(1, "aaaa")], "doc_id long, text string")
    got = [tuple(r) for r in bpe_learn_merges(docs, rounds=2).collect()]
    assert got == [(1, "a", "a", 3), (2, "aa", "aa", 1)]


def test_bpe_stops_when_fully_merged(spark):
    """Single-symbol vocabulary has no adjacent pairs: the loop stops
    early instead of erroring or emitting phantom merges."""
    from datafusion_pinot_spark.operators.bpe import bpe_learn_merges

    docs = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    got = [tuple(r) for r in bpe_learn_merges(docs, rounds=5).collect()]
    assert got == [(1, "a", "b", 2)]  # after 'ab' merges, nothing remains


def test_token_budget_sums_exactly_and_breaks_ties_by_source(spark):
    """budget=10 over tokens {a:1, b:1, c:1}: quotas floor to 3 each,
    leftover 1 goes to the lexicographically first source (equal
    remainders); allocations must sum to exactly the budget."""
    from datafusion_pinot_spark.operators.curation import domain_token_budget

    rows = [(1, "x", "a"), (2, "y", "b"), (3, "z", "c")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r["alloc"] for r in
           domain_token_budget(docs, budget=10).collect()}
    assert out == {"a": 4, "b": 3, "c": 3}
    assert sum(out.values()) == 10


def test_token_budget_proportional_with_remainders(spark):
    """budget=10 over tokens {a:5, b:3, c:1}: exact quotas 50/9, 30/9,
    10/9 floor to 5, 3, 1 = 9; the leftover token goes to the largest
    remainder (b: 3/9 vs a: 5/9 vs c: 1/9 -> a)."""
    from datafusion_pinot_spark.operators.curation import domain_token_budget

    rows = (
        [(i, "w " * 5, "a") for i in range(1)]
        + [(10 + i, "w w w", "b") for i in range(1)]
        + [(20, "w", "c")]
    )
    docs = spark.createDataFrame(
        [(i, t.strip(), s) for i, t, s in rows],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: (r["tokens"], r["alloc"]) for r in
           domain_token_budget(docs, budget=10).collect()}
    assert out == {"a": (5, 6), "b": (3, 3), "c": (1, 1)}


def test_semdedup_drops_hand_computed(spark):
    """2D toy: centroids are vecs 1 and 2 (lowest ids). Vec 2's sims to
    both centroids round to 1.0 at 6 decimals, so the c_id tiebreak puts
    it in cluster 1 with vec 1 (near-identical: it drops, canonical 1).
    Vecs 3, 4, 5 land with centroid 2 (tiny positive cosine beats 0);
    the y-axis group exceeds the threshold, so 4 and 5 drop with
    canonical min id 3."""
    from datafusion_pinot_spark.operators.similarity import semdedup_drops

    rows = [
        (1, [1.0, 0.0]),
        (2, [1.0, 0.001]),
        (3, [0.0, 1.0]),
        (4, [0.001, 1.0]),
        (5, [0.0, 0.999]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = [
        (r["cluster"], r["drop_vec"], r["canonical_vec"])
        for r in semdedup_drops(emb, k_clusters=2, threshold=0.9).collect()
    ]
    assert got == [(1, 2, 1), (2, 4, 3), (2, 5, 3)]


def test_bigram_lm_score_hand_computed(spark):
    """Corpus bigrams: (a,b) x2, (b,a) x1, (a,c) x1; 'a' is left of 3.
    doc1 = 'a b a b': (666666 + 1000000 + 666666) // 3 = 777777.
    doc2 = 'a c': 333333. Single-token doc 3 is excluded (no bigrams)."""
    from datafusion_pinot_spark.operators.text import bigram_lm_score

    rows = [(1, "a b a b"), (2, "a c"), (3, "solo")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["lm_score_ppm"])
           for r in bigram_lm_score(docs).collect()}
    assert got == {1: (3, 777777), 2: (1, 333333)}


def test_bpe_apply_compression_hand_computed(spark):
    """Merges learned on {aa x1, ab x1, aaab x3, b x1} are (a,a) then
    (a,b). Encoding: 'aa'->1 sym (2 chars), 'ab'->1 (2), 'aaab'->2
    ([aa, ab], 4 chars), 'b'->1 (1). src1 = {aa, ab, aaab}: before 8,
    after 4. src2 = {aaab x2, b}: before 9, after 5."""
    from datafusion_pinot_spark.operators.bpe import bpe_apply_compression

    rows = [(1, "aa ab aaab", "s1"), (2, "aaab aaab b", "s2")]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    got = {r["source"]: (r["symbols_before"], r["symbols_after"],
                         r["saved_permille"])
           for r in bpe_apply_compression(docs, rounds=2).collect()}
    assert got == {"s1": (8, 4, 500), "s2": (9, 5, 444)}


def test_lsh_quality_audit_counts_false_candidates(spark):
    """Docs 1=2 exactly; doc 3 differs by one word (jaccard ~0.56 on
    3-gram shingles), doc 4 is unrelated. At threshold 0.7 the bands
    still bucket all three near-dup pairs (candidates 3) but only the
    exact pair verifies: precision 333333 ppm, recall 1000000 ppm."""
    from datafusion_pinot_spark.operators.dedup import lsh_quality_audit

    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "the quick brown fox jumps over the lazy dog tonight"),
        (3, "the quick brown fox jumps over the lazy cat tonight"),
        (4, "completely different text about spark analytics engines here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    [r] = lsh_quality_audit(docs, threshold=0.7).collect()
    assert (
        r["n_candidates"], r["n_verified"], r["n_true"],
        r["precision_ppm"], r["recall_ppm"],
    ) == (3, 1, 1, 333333, 1000000)


def test_k_anonymity_audit_hand_computed(spark):
    """Type 'a' hour 0 band 0: users {1,2} -> below k=3 (2 exposed).
    Type 'a' hour 1 band 0: users {1,2,3} -> safe. Type 'b' has one
    group of a single user -> 1 small group, 1 exposed."""
    from datetime import datetime
    from datafusion_pinot_spark.operators.privacy import k_anonymity_audit

    mk = lambda h, m=0: datetime(2024, 1, 1, h, m)
    rows = [
        (1, mk(0), 1, "a", 10.0), (2, mk(0, 30), 2, "a", 20.0),
        (3, mk(1), 1, "a", 10.0), (4, mk(1), 2, "a", 20.0),
        (5, mk(1), 3, "a", 30.0),
        (6, mk(5), 9, "b", 10.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double",
    )
    got = {r["event_type"]: (r["n_groups"], r["small_groups"],
                             r["exposed_users"])
           for r in k_anonymity_audit(ev, k=3).collect()}
    assert got == {"a": (2, 1, 2), "b": (1, 1, 1)}

"""Unit-level semantics tests for the LLM-pipeline operators, on tiny
hand-checkable data (independent of the DuckDB oracle tier)."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different text about spark engines"),
        (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    from datafusion_pinot_spark.operators.dedup import exact_dedup

    out = {r["keep_doc_id"]: r["n_copies"] for r in exact_dedup(docs).collect()}
    assert out[1] == 2  # docs 1 and 4 collapse, min id kept
    assert out[2] == 1 and out[3] == 1 and out[5] == 1


def test_ngram_jaccard_exact_values(docs):
    from datafusion_pinot_spark.operators.dedup import ngram_jaccard_pairs

    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.0).collect()
    }
    # doc1 vs doc4 identical → jaccard 1.0
    assert pairs[(1, 4)] == 1.0
    # doc1 vs doc2: 7 trigrams each, 6 shared ("...lazy dog" vs "...lazy cat")
    assert pairs[(1, 2)] == round(6 / 8, 6)
    assert (1, 3) not in pairs  # no shared trigram


def test_minhash_identical_docs_same_signature(docs):
    from datafusion_pinot_spark.operators.dedup import minhash_signatures

    sigs = {r["doc_id"]: (r["mh0"], r["mh1"], r["mh2"], r["mh3"])
            for r in minhash_signatures(docs).collect()}
    assert sigs[1] == sigs[4]
    assert sigs[1] != sigs[3]


def test_minhash_lsh_finds_exact_dup(docs):
    from datafusion_pinot_spark.operators.dedup import minhash_lsh_pairs

    pairs = {
        (r["doc_a"], r["doc_b"]): r["n_bands_matched"]
        for r in minhash_lsh_pairs(docs).collect()
    }
    assert pairs[(1, 4)] == 2  # identical docs agree on every band


def test_simhash_identical_docs_equal_and_grouped(docs):
    from datafusion_pinot_spark.operators.dedup import (
        simhash64,
        simhash_dup_groups,
    )

    sh = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    assert sh[1] == sh[4]
    assert sh[1] >= 0  # sign bit excluded by construction
    groups = simhash_dup_groups(docs).collect()
    assert {r["doc_id"] for r in groups} == {1, 4}


def test_brute_force_topk_matches_numpy(spark):
    from datafusion_pinot_spark.operators.similarity import brute_force_topk

    rng = np.random.RandomState(3)
    vecs = rng.randn(30, 8).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    got = brute_force_topk(df, [0], k=5).collect()

    v = vecs.astype(np.float64)
    sims = (v @ v[0]) / (np.linalg.norm(v, axis=1) * np.linalg.norm(v[0]))
    sims[0] = -np.inf
    expect = np.argsort([(-round(s, 6), i) for i, s in enumerate(sims)], axis=0)
    order = sorted(
        ((i, round(s, 6)) for i, s in enumerate(sims) if i != 0),
        key=lambda t: (-t[1], t[0]),
    )[:5]
    assert [(r["vec_id"], r["sim"]) for r in got] == order


def test_lsh_bucketed_subset_of_bucket(spark):
    from datafusion_pinot_spark.operators.similarity import (
        lsh_bucket_code,
        lsh_bucketed_topk,
    )
    from datafusion_pinot_spark.functions import as_double_array

    rng = np.random.RandomState(4)
    vecs = rng.randn(50, 8).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    out = lsh_bucketed_topk(df, [0, 1], k=3, planes=2, dim=8).collect()
    buckets = {
        r["vec_id"]: r["b"]
        for r in df.select(
            "vec_id",
            lsh_bucket_code(as_double_array("embedding"), dim=8, planes=2).alias("b"),
        ).collect()
    }
    for r in out:
        assert buckets[r["vec_id"]] == buckets[r["q_id"]]
        assert r["vec_id"] != r["q_id"]


def test_text_stats_empty_and_basic(spark):
    from datafusion_pinot_spark.operators.text import text_stats

    df = spark.createDataFrame(
        [(1, "Hello, world!"), (2, "")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in text_stats(df).collect()}
    assert rows[1]["n_tokens"] == 2
    assert rows[1]["n_chars"] == 13
    assert rows[2]["n_tokens"] == 0 and rows[2]["quality"] == 0.0


def test_token_count_bpe_ish(spark):
    from datafusion_pinot_spark.operators.text import token_count

    df = spark.createDataFrame([(1, "don't stop, won't stop!")], "doc_id long, text string")
    r = token_count(df).collect()[0]
    # ws: ["don't","stop,","won't","stop!"] = 4
    # bpe-ish: don ' t stop , won ' t stop ! = 10
    assert r["ws_tokens"] == 4 and r["bpe_tokens"] == 10


def test_multimodal_plumbing(spark):
    from datafusion_pinot_spark.operators.multimodal import (
        extract_features,
        multimodal_features,
        real_decode,
        with_binary_payload,
    )

    df = spark.createDataFrame([(7, "abc")], "doc_id long, text string")
    media = with_binary_payload(df)
    assert dict(media.dtypes)["payload"] == "binary"
    feats = multimodal_features(df).collect()[0]
    assert feats["n_bytes"] == 3
    assert feats["checksum"] == ord("a") + ord("b") + ord("c")
    with pytest.raises(NotImplementedError):
        real_decode(b"payload")
    with pytest.raises(Exception):
        extract_features(media, decode_fn=real_decode).collect()


def test_ivf_topk_matches_numpy(spark):
    from datafusion_pinot_spark.operators.similarity import ivf_topk

    rng = np.random.RandomState(7)
    vecs = rng.randn(40, 8).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    n_centroids, nprobe, k = 4, 2, 3
    got = [
        (r["q_id"], r["vec_id"], r["sim"], r["rnk"])
        for r in ivf_topk(
            df, [0, 5], k=k, n_centroids=n_centroids, nprobe=nprobe
        ).collect()
    ]

    v = vecs.astype(np.float64)

    def cos(a, b):
        return float(v[a] @ v[b]) / (
            float(np.linalg.norm(v[a])) * float(np.linalg.norm(v[b]))
        )

    # assignment: argmax cosine to centroid, ties → lowest centroid id
    assign = {
        i: min(range(n_centroids), key=lambda c: (-cos(i, c), c))
        for i in range(40)
    }
    expect = []
    for q in (0, 5):
        probes = sorted(range(n_centroids), key=lambda c: (-cos(q, c), c))[:nprobe]
        cand = [i for i in range(40) if assign[i] in probes and i != q]
        ranked = sorted(
            ((i, round(cos(q, i), 6)) for i in cand), key=lambda t: (-t[1], t[0])
        )[:k]
        expect += [(q, i, s, r + 1) for r, (i, s) in enumerate(ranked)]
    assert sorted(got) == sorted(expect)


def test_salted_join_equals_plain_join(spark):
    from datafusion_pinot_spark.operators.skew import salted_join

    big = spark.createDataFrame(
        [(k, i) for i, k in enumerate(["hot"] * 50 + ["a", "b", "nomatch"])],
        "k string, payload long",
    )
    small = spark.createDataFrame(
        [("hot", 1), ("a", 2), ("b", 3), ("unused", 9)], "k string, v long"
    )
    for how in ("inner", "left"):
        got = sorted(
            (r["k"], r["payload"], r["v"])
            for r in salted_join(big, small, on="k", factor=4, how=how).collect()
        )
        want = sorted(
            (r["k"], r["payload"], r["v"])
            for r in big.join(small, "k", how).select("k", "payload", "v").collect()
        )
        assert got == want and len(got) > 0


def test_kmeans_matches_numpy_lloyd(spark):
    from datafusion_pinot_spark.operators.similarity import kmeans_centroids

    rng = np.random.RandomState(11)
    n, dim, k, iters = 60, 6, 3, 3
    vecs = rng.randn(n, dim).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["c_id"]: np.array(r["c_v"])
        for r in kmeans_centroids(df, k=k, iters=iters, dim=dim).collect()
    }

    v = vecs.astype(np.float64)
    cents = {i: v[i].copy() for i in range(k)}
    for _ in range(iters):
        assign = {}
        for i in range(n):
            d = [(float(((v[i] - cents[c]) ** 2).sum()), c) for c in sorted(cents)]
            assign[i] = min(d)[1]
        new = {}
        for c in sorted(cents):
            members = [v[i] for i in range(n) if assign[i] == c]
            if members:
                new[c] = np.mean(members, axis=0)
        cents = new

    assert sorted(got) == sorted(cents)
    for c in cents:
        assert np.allclose(got[c], cents[c], atol=1e-9), c


def test_dedup_groups_connected_components(spark):
    from datafusion_pinot_spark.operators.dedup import dedup_groups

    # components: {1,2,3,4} (chain), {7,8}, singleton edges only
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (7, 8)], "doc_a long, doc_b long"
    )
    got = {r["doc_id"]: r["group_id"] for r in dedup_groups(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 7: 7, 8: 7}


def test_chunk_dedup_first_wins_and_reassembles(spark):
    from datafusion_pinot_spark.operators.dedup import chunk_dedup

    # 3-word chunks: doc 1 = [a b c][d e f]; doc 2 repeats doc 1's first
    # chunk then adds its own; doc 3 is entirely doc 1's chunks -> empty
    rows = [
        (1, "a b c d e f"),
        (2, "a b c x y z"),
        (3, "d e f a b c"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r for r in chunk_dedup(docs, words_per_chunk=3).collect()
    }
    assert out[1]["text_dedup"] == "a b c d e f"
    assert (out[1]["n_chunks"], out[1]["n_kept"]) == (2, 2)
    # doc 2 keeps only its novel chunk, order preserved
    assert out[2]["text_dedup"] == "x y z"
    assert (out[2]["n_chunks"], out[2]["n_kept"]) == (2, 1)
    # doc 3 is fully deduplicated away but still present with empty text
    assert out[3]["text_dedup"] == ""
    assert (out[3]["n_chunks"], out[3]["n_kept"]) == (2, 0)


def test_chunk_dedup_within_doc_repeat(spark):
    from datafusion_pinot_spark.operators.dedup import chunk_dedup

    # the same chunk twice INSIDE one doc: first position wins
    docs = spark.createDataFrame(
        [(7, "a b c a b c")], "doc_id long, text string"
    )
    row = chunk_dedup(docs, words_per_chunk=3).collect()[0]
    assert row["text_dedup"] == "a b c"
    assert (row["n_chunks"], row["n_kept"]) == (2, 1)


def test_pii_redact_synthetic_kinds(spark):
    from datafusion_pinot_spark.operators.privacy import pii_redact

    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@example.co.uk and 10.0.255.7 ok"),
            (2, "call +1 (555) 867-5309 ref 1234567890"),
            (3, "no pii here x9"),
        ],
        "id long, body string",
    )
    rows = {
        r["id"]: r
        for r in pii_redact(
            df, "body", kinds=("email", "ipv4", "phone", "number"), keep=("id",)
        ).collect()
    }
    assert rows[1]["redacted"] == "mail <EMAIL> and <IP> ok"
    assert (rows[1]["n_email"], rows[1]["n_ipv4"]) == (1, 1)
    # phone masked before the number pass can eat its digit runs; counts
    # are per-kind on the ORIGINAL text, so the phone's digit runs also
    # count as numbers (555, 867, 5309, 1234567890)
    assert rows[2]["redacted"] == "call <PHONE> ref <NUM>"
    assert (rows[2]["n_phone"], rows[2]["n_number"]) == (1, 4)
    assert rows[3]["redacted"] == "no pii here x9"
    assert all(rows[3][c] == 0 for c in ("n_email", "n_ipv4", "n_phone", "n_number"))


def test_ngram_repetition_known_values(spark):
    from datafusion_pinot_spark.operators.text import ngram_repetition_stats

    # "a b a b a" -> 2-grams: [a b, b a, a b, b a]: total 4, distinct 2,
    # dup = 500000; top gram ("b a" ties "a b" at 2, lexicographically
    # larger wins): 2 occurrences x 3 chars over 9 chars = 666666.
    docs = spark.createDataFrame([(1, "a b a b a")], "doc_id long, text string")
    row = {r["n"]: r for r in ngram_repetition_stats(docs, ns=(2,)).collect()}[2]
    assert (row["total_ngrams"], row["distinct_ngrams"]) == (4, 2)
    assert row["dup_milli"] == 500000
    assert row["top_char_milli"] == 666666


def test_duplicate_span_coverage_overlap_union(spark):
    from datafusion_pinot_spark.operators.dedup import duplicate_span_coverage

    # Docs 1 and 2 share the 6-token run "w1..w6": with n=4 the shared
    # starts in doc 1 are 0,1,2 -> union covers tokens 0..6 = 7? No:
    # spans [0,4) [1,5) [2,6) union = [0,6) = 6 tokens.
    d1 = "w1 w2 w3 w4 w5 w6 x1 x2"
    d2 = "y1 w1 w2 w3 w4 w5 w6 y2"
    docs = spark.createDataFrame(
        [(1, d1), (2, d2), (3, "z1 z2 z3 z4 z5")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in duplicate_span_coverage(docs, n=4).collect()}
    assert (rows[1]["shared_starts"], rows[1]["covered_tokens"]) == (3, 6)
    assert (rows[2]["shared_starts"], rows[2]["covered_tokens"]) == (3, 6)
    assert (rows[3]["shared_starts"], rows[3]["covered_tokens"]) == (0, 0)
    assert rows[1]["dup_milli"] == 6 * 1000000 // 8


def test_incremental_dedup_bloom_exact_and_prunes(spark):
    from datafusion_pinot_spark.operators.dedup import (
        corpus_bloom,
        incremental_dedup,
    )

    corpus = spark.createDataFrame(
        [(i, f"corpus doc {i}") for i in range(200)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        # 50 true dups of corpus docs + 150 fresh docs
        [(1000 + i, f"corpus doc {i}") for i in range(50)]
        + [(2000 + i, f"fresh doc {i}") for i in range(150)],
        "doc_id long, text string",
    )
    survivors = incremental_dedup(new, corpus).collect()
    ids = sorted(r["doc_id"] for r in survivors)
    assert ids == [2000 + i for i in range(150)]  # exact: dups gone, fresh kept

    # the bloom itself: no false negatives by construction; FP rate sane
    bm, m, k = corpus_bloom(corpus, F.md5("text"))
    import numpy as np

    bits_set = int(np.unpackbits(np.frombuffer(bm, dtype=np.uint8)).sum())
    assert 0 < bits_set <= 200 * k  # <= n*k bits set, > 0


def test_pq_engine_encode_matches_numpy_and_search_recall(spark):
    from datafusion_pinot_spark.operators.similarity import (
        pq_adc_topk,
        pq_codebooks_df,
        pq_encode,
        pq_encode_engine,
        pq_search,
        pq_train,
    )
    from datafusion_pinot_spark.functions import as_double_array

    rng = np.random.RandomState(11)
    # clustered data so quantization has structure to find
    centers = rng.randn(4, 64) * 3
    vecs = np.vstack(
        [centers[i % 4] + rng.randn(64) * 0.5 for i in range(120)]
    ).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(120)],
        "vec_id long, embedding array<float>",
    )

    # 1) engine-side encode == numpy encode for the deterministic codebooks
    emb = df.select("vec_id", as_double_array("embedding").alias("v"))
    books0 = np.stack(
        [vecs[:16, s * 8 : (s + 1) * 8].astype(np.float64) for s in range(8)]
    )
    engine_codes = {
        (r["vec_id"], r["sub"]): r["code"]
        for r in pq_encode_engine(emb, pq_codebooks_df(emb)).collect()
    }
    numpy_codes = {
        r["vec_id"]: np.frombuffer(r["codes"], dtype=np.uint8)
        for r in pq_encode(df, books0).collect()
    }
    for (vid, sub), code in engine_codes.items():
        assert numpy_codes[vid][sub] == code

    # 2) Lloyd-trained books: compression is m bytes/vector; ADC recall@10
    # against exact L2 is well above chance
    books = pq_train(vecs, iters=4)
    codes_df = pq_encode(df, books)
    assert all(len(r["codes"]) == 8 for r in codes_df.collect())  # 32x
    q_ids = [100, 101]
    got = pq_search(codes_df, vecs[q_ids], books, k=10).collect()
    x = vecs.astype(np.float64)
    recalls = []
    for qi, qid in enumerate(q_ids):
        d = ((x - x[qid]) ** 2).sum(1)
        exact = set(np.argsort(d, kind="stable")[:10])
        approx = {r["vec_id"] for r in got if r["q_idx"] == qi}
        recalls.append(len(exact & approx) / 10)
    assert sum(recalls) / len(recalls) >= 0.5


def test_kmv_theta_sketch_accuracy(spark):
    from datafusion_pinot_spark.operators.sketches import (
        kmv_intersection_estimate,
        kmv_sketch,
    )

    # group A: keys 0..4999; group B: keys 3000..8999 → |A∩B| = 2000
    rows = [("A", i) for i in range(5000)] + [
        ("B", i) for i in range(3000, 9000)
    ]
    df = spark.createDataFrame(rows, "grp string, key long")
    sk = kmv_sketch(df, "grp", "key", k=256)
    assert sk.groupBy("grp").count().collect()[0]["count"] == 256
    r = kmv_intersection_estimate(sk, "A", "B", k=256).collect()[0]
    assert abs(r["est_a"] - 5000) / 5000 < 0.2
    assert abs(r["est_b"] - 6000) / 6000 < 0.2
    assert abs(r["est_intersection"] - 2000) / 2000 < 0.35
    # disjoint groups estimate ~0
    rows2 = [("A", i) for i in range(3000)] + [
        ("B", i) for i in range(10_000, 13_000)
    ]
    df2 = spark.createDataFrame(rows2, "grp string, key long")
    r2 = kmv_intersection_estimate(
        kmv_sketch(df2, "grp", "key", k=256), "A", "B", k=256
    ).collect()[0]
    assert r2["est_intersection"] < 0.05 * 3000


def test_pq_codes_roundtrip_through_pinot_storage(spark, tmp_path):
    import os

    from datafusion_pinot_spark.functions import as_double_array
    from datafusion_pinot_spark.operators.similarity import pq_codes_table
    from datafusion_pinot_spark.sources import register_pinot_source

    register_pinot_source(spark)
    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", as_double_array("embedding").alias("v"))
        .limit(64)
    )
    codes = pq_codes_table(emb)
    before = {r["vec_id"]: r["codes"] for r in codes.collect()}
    out = os.path.join(str(tmp_path), "pq_OFFLINE")
    codes.repartition(2).write.format("pinot").mode("overwrite").save(out)
    after = {
        r["vec_id"]: r["codes"]
        for r in spark.read.format("pinot").load(out).collect()
    }
    assert after == before
    assert all(len(c) == 8 and all(0 <= x < 16 for x in c) for c in after.values())


def test_funnel_depth_requires_order(spark):
    from datetime import datetime

    from datafusion_pinot_spark.operators import funnel

    mk = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # u1: full ordered funnel (with noise event between steps)
        (1, mk(1), "view"), (1, mk(2), "error"), (1, mk(3), "click"),
        (1, mk(4), "purchase"),
        # u2: purchase BEFORE the view/click -> depth stops at 2
        (2, mk(1), "purchase"), (2, mk(2), "view"), (2, mk(3), "click"),
        # u3: only a click, never a view -> depth 0
        (3, mk(5), "click"),
        # u4: view then a LATER second chance completes the funnel
        (4, mk(1), "view"), (4, mk(2), "purchase"), (4, mk(3), "click"),
        (4, mk(4), "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    steps = ["view", "click", "purchase"]
    depths = dict(
        funnel.funnel_user_depth(ev, steps).collect()
    )
    assert depths == {1: 3, 2: 2, 3: 0, 4: 3}

    conv = {
        r["step_name"]: (r["n_users"], r["conv_prev_milli"])
        for r in funnel.funnel_conversion(ev, steps).collect()
    }
    # depth>=1: u1,u2,u4; depth>=2: u1,u2,u4; depth>=3: u1,u4
    assert conv == {
        "view": (3, 1000000),
        "click": (3, 1000000),
        "purchase": (2, 666666),
    }


def test_funnel_same_microsecond_tie_resolves_low_step_first(spark):
    from datetime import datetime

    from datafusion_pinot_spark.operators import funnel

    ts = datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(1, ts, "purchase"), (1, ts, "click"), (1, ts, "view")],
        "user_id long, ts timestamp, event_type string",
    )
    depths = dict(
        funnel.funnel_user_depth(ev, ["view", "click", "purchase"]).collect()
    )
    assert depths == {1: 3}


def test_funnel_complete_count_disjoint_chains(spark):
    from datetime import datetime

    from datafusion_pinot_spark.operators import funnel

    mk = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # u1: two full disjoint completions, events interleaved with noise
        (1, mk(1), "view"), (1, mk(2), "click"), (1, mk(3), "purchase"),
        (1, mk(4), "view"), (1, mk(5), "view"), (1, mk(6), "click"),
        (1, mk(7), "purchase"),
        # u2: steps out of order -> zero completions
        (2, mk(1), "purchase"), (2, mk(2), "click"), (2, mk(3), "view"),
        # u3: one completion; the second chain stalls at click
        (3, mk(1), "view"), (3, mk(2), "click"), (3, mk(3), "purchase"),
        (3, mk(4), "view"), (3, mk(5), "click"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    steps = ["view", "click", "purchase"]
    got = dict(funnel.funnel_complete_count(ev, steps).collect())
    assert got == {1: 2, 2: 0, 3: 1}

    hist = {
        r["completions"]: r["n_users"]
        for r in funnel.funnel_completion_histogram(ev, steps).collect()
    }
    assert hist == {0: 1, 1: 1, 2: 1}


def test_heavy_hitters_exact_and_candidate_superset(spark):
    from datafusion_pinot_spark.operators import frequent

    # 40 docs of mostly-unique filler + two genuinely hot tokens
    rows = []
    for i in range(40):
        filler = " ".join(f"w{i}_{j}" for j in range(8))
        hot = "alpha " * 3 + ("beta " if i % 2 == 0 else "")
        rows.append((i, hot + filler))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = frequent.heavy_hitter_tokens(docs, k=10).collect()
    # exact reference: full count, threshold cnt*k > N
    from collections import Counter

    cnt = Counter()
    for _, txt in rows:
        cnt.update(txt.lower().split())
    total = sum(cnt.values())
    want = sorted(
        [(t, c) for t, c in cnt.items() if c * 10 > total],
        key=lambda tc: (-tc[1], tc[0]),
    )
    assert [(r["token"], r["cnt"]) for r in got] == want
    hh = [r["token"] for r in got]
    assert "alpha" in hh  # 120/460 of mass — well above 1/10
    assert not any(tok.startswith("w") for tok in hh)  # filler never hot
    for r in got:
        assert r["share_milli"] == r["cnt"] * 1000000 // total
    # the candidate sketch prunes: far fewer candidates than vocabulary
    n_cand = frequent.heavy_hitter_candidates(docs, k=10).count()
    assert n_cand < len(cnt) / 4


def test_chunk_token_windows_overlap_and_tail(spark):
    from datafusion_pinot_spark.operators import curation

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "only four tokens here"),
         (3, "")],
        "doc_id long, text string",
    )
    out = curation.chunk_token_windows(docs, window=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 10 tokens, starts at 0,3,6,9 -> sizes 4,4,4,1
    d1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert [(r["chunk_start"], r["n_chunk_tokens"]) for r in d1] == [
        (0, 4), (3, 4), (6, 4), (9, 1)
    ]
    # overlapping slices share tokens: chunk 0 = t0..t3, chunk 1 = t3..t6
    import hashlib

    want0 = hashlib.md5("t0 t1 t2 t3".encode()).hexdigest()
    assert d1[0]["chunk_md5"] == want0
    # doc 2: 4 tokens -> 2 chunks (0..3, 3)
    assert [(r["chunk_start"], r["n_chunk_tokens"])
            for r in sorted(by_doc[2], key=lambda r: r["chunk_idx"])] == [
        (0, 4), (3, 1)
    ]
    # empty doc emits nothing
    assert 3 not in by_doc


def test_cohort_retention_multi_cohort(spark):
    from datetime import datetime

    from datafusion_pinot_spark.operators import funnel

    # week A: 2024-01-01 (Mon); week B: 2024-01-08
    rows = [
        (1, datetime(2024, 1, 1), "x"),   # u1 cohort A
        (1, datetime(2024, 1, 9), "x"),   # u1 active offset 1
        (2, datetime(2024, 1, 3), "x"),   # u2 cohort A, never returns
        (3, datetime(2024, 1, 8), "x"),   # u3 cohort B
        (3, datetime(2024, 1, 10), "x"),  # same week, still offset 0
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    got = {
        (r["cohort_week"], r["week_offset"]): (
            r["n_cohort"], r["n_active"], r["retention_milli"]
        )
        for r in funnel.cohort_retention(ev).collect()
    }
    weeks = sorted({w for w, _ in got})
    a, b = weeks[0], weeks[1]
    assert b == a + 1
    assert got[(a, 0)] == (2, 2, 1000000)
    assert got[(a, 1)] == (2, 1, 500000)
    assert got[(b, 0)] == (1, 1, 1000000)
    assert (b, 1) not in got


def test_event_sequence_regex_counts(spark):
    from datetime import datetime

    from datafusion_pinot_spark.operators import funnel

    mk = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # u1: E E E P -> "EEEP": EE x1 (non-overlapping), EP x1
        (1, mk(1), "error"), (1, mk(2), "error"), (1, mk(3), "error"),
        (1, mk(4), "purchase"),
        # u2: V C P -> "VCP": VCP x1
        (2, mk(1), "view"), (2, mk(2), "click"), (2, mk(3), "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    got = {
        r["pattern"]: (r["n_users"], r["total_matches"])
        for r in funnel.event_sequence_matches(
            ev,
            ["signup", "view", "click", "purchase", "error"],
            ["S", "V", "C", "P", "E"],
            ["EE", "EP", "VCP"],
        ).collect()
    }
    assert got == {"EE": (1, 1), "EP": (1, 1), "VCP": (1, 1)}


def test_quantile_sketch_bounds_and_merge(spark):
    from datafusion_pinot_spark.operators.quantile_sketch import (
        quantile_sketch_build,
        quantile_sketch_merge,
    )

    # two groups with known values 1..100 and 1..50 (as n_chars)
    rows = [(i, "a", "x", i) for i in range(1, 101)] + [
        (200 + i, "a", "y", i) for i in range(1, 51)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, lang string, n_chars long"
    )
    sk = quantile_sketch_build(df, ["source", "lang"], "n_chars", "doc_id", k=8)
    by_lang = {r["lang"]: r for r in sk.collect()}
    # group x: ranks 1,9,...,97 plus 100 -> 14 samples; all rank-exact
    assert by_lang["x"]["n_rows"] == 100
    assert by_lang["x"]["qs"][0] == 1 and by_lang["x"]["qs"][-1] == 100
    assert len(by_lang["x"]["qs"]) == 14

    out = quantile_sketch_merge(sk, ["source"], [50, 90]).collect()[0]
    assert out["n_rows"] == 150
    # merged estimate within k=8 ranks of the true percentile of the
    # combined multiset (true p50 of {1..100, 1..50} = 51st value = 38.5)
    exact = sorted([i for i in range(1, 101)] + [i for i in range(1, 51)])
    true_p50 = exact[(150 - 1) * 50 // 100]
    true_p90 = exact[(150 - 1) * 90 // 100]
    assert abs(out["est_p50"] - true_p50) <= 8
    assert abs(out["est_p90"] - true_p90) <= 8


def test_funnel_windowed_depth_and_restart(spark):
    from datetime import datetime, timedelta

    from datafusion_pinot_spark.operators import funnel

    t0 = datetime(2024, 1, 1)
    mk = lambda mins: t0 + timedelta(minutes=mins)  # noqa: E731
    W = 60 * 60 * 1_000_000  # 1 hour in micros
    rows = [
        # u1: view -> click -> purchase all within the hour -> depth 3
        (1, mk(0), "view"), (1, mk(10), "click"), (1, mk(20), "purchase"),
        # u2: stale view; click 2h later is OUTSIDE the window -> depth 1
        (2, mk(0), "view"), (2, mk(120), "click"),
        # u3: stale view, then a FRESH view restarts the chain and the
        # click lands within the fresh window -> depth 2
        (3, mk(0), "view"), (3, mk(120), "view"), (3, mk(130), "click"),
        # u4: full chain but purchase exceeds the window from chain start
        # -> depth 2; no second chance
        (4, mk(0), "view"), (4, mk(10), "click"), (4, mk(90), "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    got = dict(
        funnel.funnel_windowed_depth(
            ev, ["view", "click", "purchase"], window_us=W
        ).collect()
    )
    assert got == {1: 3, 2: 1, 3: 2, 4: 2}


def test_audio_energy_windows_hand_values(spark):
    """Framed PCM energy: payload 'aaaa'*8 (32 bytes of 0x61=97) has one
    win=32 frame with energy 32*(97-128)^2 = 30752; a 40-byte payload
    drops its 8-byte tail; docs shorter than one frame emit nothing."""
    from datafusion_pinot_spark.operators.multimodal import (
        audio_energy_windows,
        with_binary_payload,
    )

    docs = spark.createDataFrame(
        [
            (1, "a" * 32),
            (2, "a" * 40),   # one frame + dropped tail
            (3, "a" * 64),   # two frames
            (4, "a" * 10),   # below one frame -> no rows
        ],
        "doc_id long, text string",
    )
    rows = audio_energy_windows(
        with_binary_payload(docs), win=32, threshold=30000
    ).collect()
    out = {(r["doc_id"], r["win_idx"]): (r["energy"], r["voiced"]) for r in rows}
    e = 32 * (97 - 128) ** 2
    assert out == {
        (1, 0): (e, True),
        (2, 0): (e, True),
        (3, 0): (e, True),
        (3, 1): (e, True),
    }

"""Property tests for the round-9 kernels against transparent pure-Python
references: the storage-layer row filter (random masks and value mixes
round-trip byte-exactly), the prefix-filtered Jaccard join (lossless vs
brute force on random corpora), and label propagation (converges to the
same components as a Python union-find). Spark startup is paid once per
test by batching each example into one DataFrame / one segment."""

import itertools

import numpy as np
from hypothesis import given, settings, strategies as st


# ---- filter_segment: random mask x random values round-trip ----

seg_rows = st.lists(
    st.tuples(
        st.integers(min_value=-(2**40), max_value=2**40),  # k
        st.sampled_from(["aa", "bb", "cc", "", "zz"]),  # s
        st.booleans(),  # v is null?
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=15, deadline=None)
@given(seg_rows, st.randoms(use_true_random=False))
def test_filter_segment_roundtrips_random_masks(tmp_path_factory, rows, rnd):
    from pinot_segment import SegmentReader
    from pinot_segment.compact import filter_segment
    from pinot_segment.metadata import DataType
    from pinot_segment.writer import ColumnSpec, write_segment

    tmp = tmp_path_factory.mktemp("fseg")
    ks = np.array([r[0] for r in rows], dtype=np.int64)
    ss = [r[1] for r in rows]
    nulls = np.array([r[2] for r in rows], dtype=bool)
    vs = np.where(nulls, 0, ks * 3)
    v3 = write_segment(
        str(tmp / "s"),
        "s",
        "t",
        [
            ColumnSpec("k", DataType.LONG, ks),
            ColumnSpec("s", DataType.STRING, ss),
            ColumnSpec(
                "v", DataType.LONG, vs, null_mask=nulls if nulls.any() else None
            ),
        ],
    )
    keep = np.array([rnd.random() < 0.6 for _ in rows], dtype=bool)
    if not keep.any():
        keep[rnd.randrange(len(rows))] = True
    nv3 = filter_segment(str(v3), str(tmp / "sf"), "sf", "t", keep)
    r = SegmentReader.open(str(nv3))
    assert list(r.read_column("k")) == list(ks[keep])
    assert list(r.read_column("s")) == [s for s, m in zip(ss, keep) if m]
    got_nulls = r.null_mask("v")
    want_nulls = nulls[keep]
    if want_nulls.any():
        assert got_nulls is not None and list(got_nulls) == list(want_nulls)
    else:
        assert got_nulls is None or not got_nulls.any()
    got_v = np.asarray(r.read_column("v"))
    assert list(got_v[~want_nulls]) == list(vs[keep][~want_nulls])


# ---- jaccard_prefix_join: lossless vs brute force ----

corpus = st.lists(
    st.lists(
        st.sampled_from([f"t{i}" for i in range(12)]),
        min_size=1,
        max_size=8,
        unique=True,
    ),
    min_size=2,
    max_size=15,
)


@settings(max_examples=10, deadline=None)
@given(corpus, st.sampled_from([300_000, 500_000, 700_000]))
def test_jaccard_prefix_join_lossless_property(spark, corp, t_ppm):
    from datafusion_pinot_spark.operators.dedup import jaccard_prefix_join

    docs = spark.createDataFrame(
        [
            (i, " ".join(toks), "en", "s", len(" ".join(toks)))
            for i, toks in enumerate(corp, 1)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard_ppm"]
        for r in jaccard_prefix_join(docs, t_ppm=t_ppm, k=10_000).collect()
    }
    sets = {i: set(toks) for i, toks in enumerate(corp, 1)}
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if not inter:
            continue
        ppm = inter * 1_000_000 // (len(sets[a]) + len(sets[b]) - inter)
        if ppm >= t_ppm:
            want[(a, b)] = ppm
    assert got == want, (corp, t_ppm)


# ---- label propagation: converged labels == union-find components ----

edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=12),
        st.integers(min_value=1, max_value=12),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=18,
)


@settings(max_examples=10, deadline=None)
@given(edge_lists)
def test_label_prop_fixpoint_equals_union_find(spark, pairs):
    from pyspark.sql import functions as F

    from datafusion_pinot_spark.operators.graph import _label_round

    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "src long, dst long"
    )
    lab = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lab"))
    )
    prev = {r["node"]: r["lab"] for r in lab.collect()}
    for _ in range(20):  # n<=12 nodes: diameter-bounded
        lab = _label_round(lab, edges).localCheckpoint()
        cur = {r["node"]: r["lab"] for r in lab.collect()}
        if cur == prev:
            break
        prev = cur
    # pure-python union-find reference
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in {x for e in pairs for x in e}}
    assert cur == want, pairs


# ---- reindex_segment: data preserved byte-exactly under index adds ----

reix_rows = st.lists(
    st.tuples(
        st.integers(min_value=-(2**30), max_value=2**30),
        st.sampled_from(["x", "yy", "zzz", ""]),
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=10, deadline=None)
@given(reix_rows, st.sampled_from(["inverted", "bloom", "range"]))
def test_reindex_segment_preserves_data(tmp_path_factory, rows, index):
    from pinot_segment import SegmentReader
    from pinot_segment.compact import reindex_segment
    from pinot_segment.metadata import DataType
    from pinot_segment.writer import ColumnSpec, write_segment

    tmp = tmp_path_factory.mktemp("reix")
    ks = np.array([r[0] for r in rows], dtype=np.int64)
    ss = [r[1] for r in rows]
    v3 = write_segment(
        str(tmp / "s"),
        "s",
        "t",
        [
            ColumnSpec("k", DataType.LONG, ks),
            ColumnSpec("s", DataType.STRING, ss),
        ],
    )
    nv3 = reindex_segment(str(v3), str(tmp / "si"), "si", "t", "k", index)
    r = SegmentReader.open(str(nv3))
    assert list(r.read_column("k")) == list(ks)
    assert list(r.read_column("s")) == ss
    cm = r.metadata.get_column("k")
    flag = {
        "inverted": cm.has_inverted_index,
        "bloom": cm.has_bloom_filter,
        "range": cm.has_range_index,
    }[index]
    assert flag, (index, rows)

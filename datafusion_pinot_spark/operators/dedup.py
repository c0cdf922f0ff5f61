"""Deduplication operators for LLM-data pipelines (documents table).

Scale design notes (100 TB):

- *Exact* dedup is a hash groupBy — one shuffle on the content hash, with
  map-side partial aggregation; AQE handles skew (a viral doc repeated 1e6x).
- *MinHash-LSH* avoids the O(N^2) pair space: per-doc signatures (narrow map),
  band keys (narrow map), then ONE shuffle joining docs sharing a band bucket;
  candidate pairs are verified with exact Jaccard. Cost ~ O(N * bands +
  candidate_pairs), never N^2.
- *SimHash* is a narrow per-row map; near-dup lookup joins on rotated
  fingerprint prefixes (here: exact-fingerprint match).
- *N-gram Jaccard* (the exact verifier) explodes shingles and self-joins on
  shingle — O(sum shingle freq^2) ≈ linear for natural text; it is also the
  DuckDB-checkable oracle for the pipeline.
- *Embedding near-dup* reuses the similarity operators on a cosine threshold.

MD5 (identical across Spark and DuckDB) is used as the hash family so every
deterministic stage is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from datafusion_pinot_spark.functions import tokens, word_shingles

MINHASH_K = 8  # hash functions per signature
LSH_BANDS = 2  # bands of MINHASH_K / LSH_BANDS = 4 rows each (selectivity ~J^4)


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Group by content hash; keep the smallest doc_id as canonical."""
    return (
        docs.select("doc_id", F.md5("text").alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
    )


def exact_dedup_oracle_sql() -> str:
    return (
        "SELECT md5(text) AS h, min(doc_id) AS keep_doc_id, count(*) AS n_copies "
        "FROM documents GROUP BY md5(text)"
    )


def minhash_signatures(
    docs: DataFrame, k: int = MINHASH_K, shingle_n: int = 3
) -> DataFrame:
    """k-permutation MinHash over the distinct word-``shingle_n``-gram set,
    hash family md5(seed || shingle). Narrow per-row computation; no shuffle.

    Shingles (not single words) are essential: documents drawn from a small
    shared vocabulary have near-identical word *sets*, which would make every
    pair a MinHash candidate; n-gram sequences discriminate. Docs with fewer
    than ``shingle_n`` tokens get NULL signatures (no shingles).

    The token and shingle arrays are materialized in their own projections
    (not inlined into the hash lambdas): higher-order lambdas are interpreted
    with no subexpression elimination, so an inlined tokens subtree would
    re-run the regex split per element access — measured ~10x slower."""
    toks = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    sh = toks.select(
        "doc_id", word_shingles(F.col("toks"), shingle_n).alias("sh")
    )
    cols = [
        F.array_min(
            F.transform(F.col("sh"), lambda s: F.md5(F.concat(F.lit(f"s{i}|"), s)))
        ).alias(f"mh{i}")
        for i in range(k)
    ]
    return sh.select("doc_id", *cols)


def minhash_signatures_oracle_sql(k: int = MINHASH_K, shingle_n: int = 3) -> str:
    joined = " || ' ' || ".join(f"w[i+{j}]" for j in range(shingle_n))
    shingles = (
        f"CASE WHEN len(w) < {shingle_n} THEN [] "
        f"ELSE list_distinct(list_transform(generate_series(1, len(w) - {shingle_n - 1}), i -> {joined})) END"
    )
    mins = ", ".join(
        f"list_min(list_transform(sh, s -> md5('s{i}|' || s))) AS mh{i}"
        for i in range(k)
    )
    return f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS w FROM documents
), s AS (
  SELECT doc_id, {shingles} AS sh FROM t
)
SELECT doc_id, {mins} FROM s"""


def minhash_lsh_pairs(
    docs: DataFrame,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs: docs agreeing on at least one LSH band.

    shingle→minhash→band→bucket→pair generation; returns
    (doc_a, doc_b, n_bands_matched).

    Scale shape: the signature pipeline runs ONCE (a self-join on the
    signature subtree would execute it twice); one shuffle groups doc ids per
    (band, key) bucket; pairs are generated engine-side from each bucket's
    sorted id array with higher-order functions — no Python, no O(N^2)
    global join. ``max_bucket_size`` drops degenerate buckets (a viral
    boilerplate string at 100 TB would otherwise create one quadratic
    bucket); dropped buckets mean those dups are found by the exact-hash
    pass instead.
    """
    # Fast internal signatures: explode shingles once, hash with codegen'd
    # xxhash64 (Spark's higher-order array lambdas are interpreted — putting
    # 8 md5-transform passes inside a projection is ~10x slower), then a
    # map-side-combined groupBy(min). Docs without shingles (< n tokens)
    # cannot be near-dups and drop out naturally at the explode.
    # A single small input file would otherwise pin the (interpreted) shingle
    # construction to one task; hash-repartition by doc_id engages every core
    # AND pre-partitions for the groupBy(doc_id) below (no second shuffle).
    # On a real multi-split 100 TB input this is a cheap no-op reshape.
    par = docs.sparkSession.sparkContext.defaultParallelism
    # Tokens materialized in their own projection: inlining the split() tree
    # into the shingle lambda re-runs the regex per element_at (interpreted
    # HOFs do no subexpression elimination) — measured 10x slower.
    sh = (
        docs.repartition(par, "doc_id")
        .select("doc_id", tokens(F.col("text")).alias("toks"))
        .select("doc_id", F.explode(word_shingles(F.col("toks"))).alias("s"))
    )
    sig = sh.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("s"))).alias(f"mh{i}")
            for i in range(k)
        ]
    )
    rows_per_band = k // bands
    band_cols = [
        F.xxhash64(
            *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sig.select("doc_id", *band_cols)
    melted = banded.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band_idx"), F.col(f"band{b}").alias("key"))
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band_idx", "bk.key")

    buckets = (
        melted.groupBy("band_idx", "key")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    if max_bucket_size is not None:
        buckets = buckets.filter(F.size("ids") <= max_bucket_size)

    ids = F.col("ids")
    pair_structs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.size(ids) - 2),
            lambda i: F.transform(
                F.slice(ids, i + 2, F.size(ids)),
                lambda j: F.struct(
                    F.element_at(ids, i + 1).alias("doc_a"), j.alias("doc_b")
                ),
            ),
        )
    )
    return (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_bands_matched"))
    )


def _bucket_pair_structs():
    """Engine-side pair generation from a sorted ``ids`` bucket array (all
    (i, j>i) combinations) — the scale-correct alternative to a bucket
    self-join."""
    ids = F.col("ids")
    return F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.size(ids) - 2),
            lambda i: F.transform(
                F.slice(ids, i + 2, F.size(ids)),
                lambda j: F.struct(
                    F.element_at(ids, i + 1).alias("doc_a"), j.alias("doc_b")
                ),
            ),
        )
    )


def _lsh_buckets_md5(
    docs: DataFrame,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    shingle_n: int = 3,
    sig: DataFrame | None = None,
) -> DataFrame:
    """(band_idx, key, ids): every LSH bucket (including singletons) with
    its sorted member array — the shared substrate of candidate-pair
    generation and the bucket-skew cost planner. One shuffle on the
    banded key; collect_set bounds memory per bucket by bucket size (the
    planner exists precisely to measure that bound before a big run).
    ``sig`` lets multi-config callers (the band tuning curve) pass ONE
    precomputed/checkpointed signature frame instead of re-hashing the
    corpus per config."""
    if sig is None:
        sig = minhash_signatures(docs, k, shingle_n).filter(
            F.col("mh0").isNotNull()
        )
    rows_per_band = k // bands
    band_cols = [
        F.md5(
            F.concat_ws(
                "|", *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
            )
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sig.select("doc_id", *band_cols)
    melted = banded.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band_idx"), F.col(f"band{b}").alias("key"))
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band_idx", "bk.key")
    return melted.groupBy("band_idx", "key").agg(
        F.sort_array(F.collect_set("doc_id")).alias("ids")
    )


def minhash_lsh_candidates_md5(
    docs: DataFrame,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    shingle_n: int = 3,
    max_bucket_size: int | None = None,
    sig: DataFrame | None = None,
) -> DataFrame:
    """LSH candidate pairs with the *md5* hash family — bit-identical in
    DuckDB, so the full LSH→verify dedup pipeline is oracle-checkable.

    Same scale shape as :func:`minhash_lsh_pairs` (banded keys, bucket
    grouping, engine-side pair generation — never an O(N^2) join); the
    xxhash64 variant remains the production-speed path (codegen'd long
    hashes vs md5 hex strings). ``sig`` forwards a precomputed signature
    frame to :func:`_lsh_buckets_md5`.
    """
    buckets = _lsh_buckets_md5(docs, k, bands, shingle_n, sig=sig).filter(
        F.size("ids") > 1
    )
    if max_bucket_size is not None:
        buckets = buckets.filter(F.size("ids") <= max_bucket_size)
    return (
        buckets.select(F.explode(_bucket_pair_structs()).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def ngram_jaccard_verify(
    docs: DataFrame, candidates: DataFrame, n: int = 3, threshold: float = 0.2
) -> DataFrame:
    """Exact word-n-gram Jaccard computed ONLY for ``candidates`` pairs
    (doc_a, doc_b) — the verify stage of an LSH dedup pipeline.

    Scale shape: the shingle stream is semi-join-restricted to docs that
    appear in a candidate pair (at 100 TB the candidate set is orders of
    magnitude smaller than the corpus), then intersections come from two
    equi-joins keyed by (doc, shingle) — cost is O(candidate docs' shingles),
    independent of corpus size. Never run the corpus-wide all-pairs verifier
    (:func:`ngram_jaccard_pairs`) at scale — SCALE.md §jaccard."""
    # the candidate frame feeds three consumers (both id projections +
    # the intersection join) and is usually the head of an expensive
    # LSH pipeline — checkpoint it once instead of re-running that
    # pipeline per consumer (r14; same for the restricted shingle
    # stream, which feeds sizes + both sides of the intersection)
    candidates = candidates.localCheckpoint(eager=False)
    ids = (
        candidates.select(F.col("doc_a").alias("doc_id"))
        .union(candidates.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    par = docs.sparkSession.sparkContext.defaultParallelism
    sh = (
        docs.join(ids, "doc_id", "left_semi")
        .repartition(par, "doc_id")
        .select("doc_id", tokens(F.col("text")).alias("toks"))
        .select("doc_id", F.explode(word_shingles(F.col("toks"), n)).alias("s"))
        .localCheckpoint(eager=False)
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    inter = (
        candidates.join(sh.alias("a"), F.col("doc_a") == F.col("a.doc_id"))
        .join(
            sh.alias("b"),
            (F.col("doc_b") == F.col("b.doc_id")) & (F.col("a.s") == F.col("b.s")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def lsh_verified_pairs(
    docs: DataFrame,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """End-to-end near-dup pipeline: md5-MinHash → banded LSH candidates →
    exact n-gram Jaccard verify. Every stage is deterministic and
    reproducible in DuckDB, so the whole pipeline hash-checks against
    :func:`lsh_verified_pairs_oracle_sql`."""
    return ngram_jaccard_verify(
        docs, minhash_lsh_candidates_md5(docs, k, bands, n), n, threshold
    )


def _lsh_candidate_ctes(k: int, bands: int, n: int) -> str:
    """Shared DuckDB CTE prefix (tokens → shingles → md5 MinHash signatures →
    banded keys → candidate pairs) used by both the candidate-stage oracle and
    the full verified-pipeline oracle."""
    joined = " || ' ' || ".join(f"w[i+{j}]" for j in range(n))
    shingles = (
        f"CASE WHEN len(w) < {n} THEN [] "
        f"ELSE list_distinct(list_transform(generate_series(1, len(w) - {n - 1}), i -> {joined})) END"
    )
    mins = ", ".join(
        f"list_min(list_transform(sh, s -> md5('s{i}|' || s))) AS mh{i}"
        for i in range(k)
    )
    rows_per_band = k // bands
    melted = "\n  UNION ALL\n".join(
        "  SELECT doc_id, {b} AS band_idx, md5({key}) AS key FROM sig WHERE mh0 IS NOT NULL".format(
            b=b,
            key=" || '|' || ".join(f"mh{b * rows_per_band + r}" for r in range(rows_per_band)),
        )
        for b in range(bands)
    )
    return f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS w FROM documents
), s AS (
  SELECT doc_id, {shingles} AS sh FROM t
), sig AS (
  SELECT doc_id, {mins} FROM s
), melted AS (
{melted}
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM melted a JOIN melted b
    ON a.band_idx = b.band_idx AND a.key = b.key AND a.doc_id < b.doc_id
)"""


def minhash_lsh_candidates_md5_oracle_sql(
    k: int = MINHASH_K, bands: int = LSH_BANDS, shingle_n: int = 3
) -> str:
    """DuckDB oracle for :func:`minhash_lsh_candidates_md5` — the banded
    candidate set itself (the verify stage has its own oracle)."""
    return _lsh_candidate_ctes(k, bands, shingle_n) + "\nSELECT doc_a, doc_b FROM cand"


def lsh_verified_pairs_oracle_sql(
    k: int = MINHASH_K, bands: int = LSH_BANDS, n: int = 3, threshold: float = 0.2
) -> str:
    return _lsh_candidate_ctes(k, bands, n) + f""", sh2 AS (
  SELECT DISTINCT doc_id, unnest(sh) AS s FROM s
), sizes AS (
  SELECT doc_id, count(*) AS sz FROM sh2 GROUP BY doc_id
), inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS inter
  FROM cand c
  JOIN sh2 a ON a.doc_id = c.doc_a
  JOIN sh2 b ON b.doc_id = c.doc_b AND b.s = a.s
  GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b,
       round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) >= {threshold}
"""


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.2
) -> DataFrame:
    """Exact word-n-gram Jaccard similarity for ALL pairs sharing ≥1 shingle.

    Explode + self-join on shingle; output (doc_a, doc_b, jaccard) for
    jaccard ≥ threshold. CORPUS-WIDE — quadratic on boilerplate-heavy
    corpora; kept as a test oracle / small-data tool only. The registered
    production path is :func:`lsh_verified_pairs` (verify restricted to LSH
    candidates)."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    sh = (
        docs.repartition(par, "doc_id")
        .select("doc_id", tokens(F.col("text")).alias("toks"))
        .select("doc_id", F.explode(word_shingles(F.col("toks"), n)).alias("s"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs_oracle_sql(n: int = 3, threshold: float = 0.2) -> str:
    # shingles: distinct space-joined n-gram word windows, 1-based list index
    joined = " || ' ' || ".join(f"w[i+{k}]" for k in range(n))
    return f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS w FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, len(w) - {n - 1}), i -> {joined})) AS s
  FROM t WHERE len(w) >= {n}
), sizes AS (
  SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) >= {threshold}
"""


SIMHASH_MD5_BITS = 48  # 12 md5 hex digits × 4 bits — fits BIGINT exactly


def simhash48_md5(docs: DataFrame) -> DataFrame:
    """48-bit SimHash over the word multiset with the *md5* hash family —
    bit votes come from the first 12 hex digits of ``md5(word)``, which
    DuckDB reproduces character-for-character, so the fingerprints (and any
    grouping on them) are oracle-checkable. Mirrors the r2 MinHash solution
    (:func:`minhash_signatures` md5 family vs the xxhash64 production path
    — here :func:`simhash64` stays the benched production path).

    Same scale shape as simhash64: narrow per-row map (explode → 12
    codegen'd conv/substring digit extracts) and ONE doc-keyed aggregation
    of ±1 bit votes."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    words = (
        docs.repartition(par, "doc_id")
        .select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
        .select("doc_id", F.md5("w").alias("h"))
    )
    digits = words.select(
        "doc_id",
        *[
            F.conv(F.substring("h", i + 1, 1), 16, 10).cast("int").alias(f"d{i}")
            for i in range(SIMHASH_MD5_BITS // 4)
        ],
    )
    votes = digits.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col(f"d{b // 4}"), b % 4).bitwiseAND(F.lit(1)) == 1,
                    1,
                ).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(SIMHASH_MD5_BITS)
        ]
    )
    fp = sum(
        (
            F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
            for b in range(1, SIMHASH_MD5_BITS)
        ),
        F.when(F.col("b0") > 0, F.lit(1)).otherwise(F.lit(0)),
    )
    return votes.select("doc_id", fp.cast("long").alias("simhash"))


def simhash_md5_dup_groups(docs: DataFrame) -> DataFrame:
    """Documents sharing an identical 48-bit md5-family simhash — the
    oracle-checkable twin of :func:`simhash_dup_groups`."""
    sh = simhash48_md5(docs)
    w = Window.partitionBy("simhash")
    return (
        sh.withColumn("group_size", F.count("*").over(w))
        .filter(F.col("group_size") > 1)
        .select("doc_id", "simhash", "group_size")
    )


def simhash_md5_dup_groups_oracle_sql() -> str:
    nd = SIMHASH_MD5_BITS // 4
    digits = ",\n         ".join(
        f"strpos('0123456789abcdef', substr(h, {i + 1}, 1)) - 1 AS d{i}"
        for i in range(nd)
    )
    votes = ",\n         ".join(
        f"sum(CASE WHEN (d{b // 4} >> {b % 4}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(SIMHASH_MD5_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(SIMHASH_MD5_BITS)
    )
    return f"""
WITH w AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
  FROM documents WHERE length(trim(lower(text))) > 0
), h AS (
  SELECT doc_id, md5(w) AS h FROM w
), d AS (
  SELECT doc_id,
         {digits}
  FROM h
), v AS (
  SELECT doc_id,
         {votes}
  FROM d GROUP BY doc_id
), f AS (
  SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM v
), g AS (
  SELECT doc_id, simhash, count(*) OVER (PARTITION BY simhash) AS group_size
  FROM f
)
SELECT doc_id, simhash, group_size FROM g WHERE group_size > 1"""


def simhash64(docs: DataFrame) -> DataFrame:
    """64-bit SimHash over the word multiset, built from xxhash64 word hashes.

    Pure built-in expressions: per word, each of the 64 bits contributes ±1;
    the fingerprint takes the sign of each bit-sum. (xxhash64 is Spark-only,
    so this operator is rows-only checked — no DuckDB oracle.)
    """
    words = tokens(F.col("text"))
    par = docs.sparkSession.sparkContext.defaultParallelism
    hashed = docs.repartition(par, "doc_id").select(
        "doc_id", F.explode(words).alias("w")
    ).select("doc_id", F.xxhash64("w").alias("h"))
    bit_sums = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(63)
        ]
    )
    fp = sum(
        (
            F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
            for b in range(1, 63)
        ),
        F.when(F.col("b0") > 0, F.lit(1)).otherwise(F.lit(0)),
    )
    return bit_sums.select("doc_id", fp.cast("long").alias("simhash"))


def simhash_dup_groups(docs: DataFrame) -> DataFrame:
    """Documents sharing an identical 64-bit simhash (hamming distance 0)."""
    sh = simhash64(docs)
    w = Window.partitionBy("simhash")
    return (
        sh.withColumn("group_size", F.count("*").over(w))
        .filter(F.col("group_size") > 1)
        .select("doc_id", "simhash", "group_size")
    )


def dedup_groups(pairs: DataFrame) -> DataFrame:
    """Connected components over near-dup pairs: every doc in a component
    gets the component's smallest doc_id as ``group_id`` (the canonical
    representative a training pipeline keeps).

    Iterative min-label propagation in pure DataFrame ops, run to fixpoint:
    each round, every vertex takes the min of its own label and its
    neighbors' labels. Converges in O(diameter) rounds — near-dup components
    are shallow (dup clusters, not long chains), so this is a handful of
    shuffles on the (small) pair set, NOT on the corpus. At 100 TB:
    checkpoint the label frame every few rounds to cut lineage, and run on
    the candidate-pair output (millions of rows), never the full corpus.

    Deterministic integer labels — hash-checkable against a recursive-CTE
    transitive closure (the registered query's DuckDB oracle).
    """
    # Materialize the edge set once: the upstream pair generation (an LSH or
    # Jaccard pipeline) would otherwise re-execute on every iteration of the
    # loop below (each round references edges twice, plus the convergence
    # count) — measured 5-10x the whole operator's cost.
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = edges.select("src").distinct().select(
        F.col("src").alias("id"), F.col("src").alias("label")
    )
    while True:
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["src"], "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels.localCheckpoint(eager=True)  # cut lineage per round
        if changed == 0:
            break
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("group_id"))


def chunk_dedup(docs: DataFrame, words_per_chunk: int = 10) -> DataFrame:
    """Paragraph-level exact dedup with reassembly (the Dolma/C4 pipeline
    stage): segment every document, drop each segment that appeared
    earlier in the corpus (first occurrence by (doc_id, position) wins),
    and stitch the survivors back into a cleaned document.

    The testdata documents are flat word streams (no newline paragraph
    breaks), so the segmenter is a fixed window of ``words_per_chunk``
    words — the dedup/reassembly plumbing is identical for any
    engine-side segmenter (split on '\\n\\n' for real paragraphs).

    Scale design (100 TB): chunking is a narrow per-row map (split +
    slice — no explode until chunks exist); first-occurrence selection is
    ONE shuffle, keyed on the chunk text (at scale, key the window on
    xxhash64(chunk) — an 8-byte shuffle key — and keep the text only for
    within-bucket residual comparison); reassembly is one shuffle on
    doc_id with the order restored from chunk_idx, so no corpus-wide
    sort. Nothing touches the driver.
    """
    words = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(words) / F.lit(words_per_chunk)).cast("long")
    chunks = F.transform(
        F.sequence(F.lit(0), (n_chunks - 1).cast("int")),
        lambda i: F.array_join(
            F.slice(words, i * words_per_chunk + 1, words_per_chunk), " "
        ),
    )
    exploded = docs.select(
        "doc_id",
        F.posexplode(chunks).alias("chunk_idx", "chunk"),
    )
    first_wins = Window.partitionBy("chunk").orderBy("doc_id", "chunk_idx")
    kept = (
        exploded.withColumn("rn", F.row_number().over(first_wins))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    reassembled = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk"))),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("text_dedup"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return (
        docs.select("doc_id", n_chunks.alias("n_chunks"))
        .join(reassembled, "doc_id", "left")
        .select(
            "doc_id",
            "n_chunks",
            F.coalesce(F.col("n_kept"), F.lit(0).cast("long")).alias("n_kept"),
            F.coalesce(F.col("text_dedup"), F.lit("")).alias("text_dedup"),
        )
    )


def chunk_dedup_oracle_sql(words_per_chunk: int = 10) -> str:
    w = words_per_chunk
    return f"""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents),
chunks AS (
  SELECT doc_id, CAST((pos - 1) // {w} AS BIGINT) AS chunk_idx,
         string_agg(w, ' ' ORDER BY pos) AS chunk
  FROM words GROUP BY doc_id, (pos - 1) // {w}),
kept AS (
  SELECT * FROM (
    SELECT doc_id, chunk_idx, chunk,
           row_number() OVER (PARTITION BY chunk
                              ORDER BY doc_id, chunk_idx) AS rn
    FROM chunks) WHERE rn = 1),
reassembled AS (
  SELECT doc_id, string_agg(chunk, ' ' ORDER BY chunk_idx) AS text_dedup,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id),
totals AS (SELECT doc_id, count(*) AS n_chunks FROM chunks GROUP BY doc_id)
SELECT t.doc_id AS doc_id, t.n_chunks AS n_chunks,
       coalesce(r.n_kept, 0) AS n_kept,
       coalesce(r.text_dedup, '') AS text_dedup
FROM totals t LEFT JOIN reassembled r ON r.doc_id = t.doc_id
"""

def duplicate_span_coverage(docs: DataFrame, n: int = 8) -> DataFrame:
    """Exact duplicate-substring detection — the suffix-array dedup stage of
    LLM data pipelines (find every ``n``-token window shared VERBATIM by
    >= 2 documents), re-expressed as a distributed n-gram join instead of a
    monolithic suffix array. Reports, per document, how many of its tokens
    are covered by at least one shared span (interval union over the
    overlapping windows, not a double count).

    Columns: ``doc_id, n_tokens, shared_starts, covered_tokens, dup_milli``
    (coverage in exact integer millionths — keeps the hash gate off float
    rounding).

    Scale design (100 TB): window enumeration is a narrow per-row map
    (``transform`` over a ``sequence`` of start offsets — engine-side, no
    Python); the only corpus-wide shuffle keys on the n-gram itself to
    count distinct docs (at scale, key on ``xxhash64(gram)`` — an 8-byte
    shuffle key — and accept the ~2^-64 collision rate); a viral n-gram
    (boilerplate shared by millions of docs) still produces ONE group row,
    never a pairwise explosion. Coverage union is a per-doc sorted-array
    fold, O(spans) per document with no further shuffle beyond the doc_id
    re-group.
    """
    words = F.split(F.col("text"), " ")
    starts = F.when(
        F.size(words) >= n, F.sequence(F.lit(0), F.size(words) - n)
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        starts, lambda i: F.array_join(F.slice(words, i + 1, n), " ")
    )
    exploded = docs.select("doc_id", F.posexplode(grams).alias("s", "gram"))
    shared = (
        exploded.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    hits = exploded.join(shared, "gram")
    per_doc = hits.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("s")).alias("starts")
    )
    # Interval union over sorted starts: each span covers [s, s+n); a new
    # span contributes only the part past the furthest end seen so far.
    zero = F.lit(0).cast("long")
    covered = F.aggregate(
        F.col("starts"),
        F.struct(zero.alias("covered"), zero.alias("end")),
        lambda a, s: F.struct(
            (
                a["covered"]
                + F.greatest(
                    zero, s.cast("long") + n - F.greatest(a["end"], s.cast("long"))
                )
            ).alias("covered"),
            F.greatest(a["end"], s.cast("long") + n).alias("end"),
        ),
    )["covered"]
    return (
        docs.select("doc_id", F.size(words).cast("long").alias("n_tokens"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.size("starts").cast("long"), F.lit(0).cast("long")).alias(
                "shared_starts"
            ),
            F.coalesce(covered, F.lit(0).cast("long")).alias("covered_tokens"),
        )
        .withColumn(
            "dup_milli", F.expr("covered_tokens * 1000000L div n_tokens")
        )
        .orderBy("doc_id")
    )


def duplicate_span_coverage_oracle_sql(n: int = 8) -> str:
    return f"""
WITH g AS (
  SELECT doc_id, CAST(i AS BIGINT) AS s,
         array_to_string(w[i+1:i+{n}], ' ') AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       LATERAL unnest(range(0, greatest(len(w) - {n} + 1, 0))) AS t(i)),
shared AS (
  SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
hits AS (SELECT doc_id, s FROM g JOIN shared USING (gram)),
cov AS (
  SELECT doc_id, s,
         greatest(0, s + {n} - greatest(
           coalesce(max(s) OVER (PARTITION BY doc_id ORDER BY s
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) + {n}, 0), s)) AS contrib
  FROM hits),
perdoc AS (
  SELECT doc_id, count(*) AS shared_starts, sum(contrib) AS covered
  FROM cov GROUP BY doc_id)
SELECT d.doc_id,
       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
       CAST(coalesce(p.shared_starts, 0) AS BIGINT) AS shared_starts,
       CAST(coalesce(p.covered, 0) AS BIGINT) AS covered_tokens,
       CAST(coalesce(p.covered, 0) * 1000000 // len(string_split(d.text, ' '))
            AS BIGINT) AS dup_milli
FROM documents d LEFT JOIN perdoc p USING (doc_id)
ORDER BY doc_id
"""

def corpus_bloom(
    corpus: DataFrame, key_col, m_bits: int = 1 << 17, k: int = 4
):
    """Build a bloom filter over a corpus key column, distributed:
    engine-side double hashing (two independent ``xxhash64`` seeds, the
    standard Kirsch-Mitzenmacher construction), one Arrow-batched
    ``mapInPandas`` pass emitting ONE ``m_bits/8``-byte bitmap per
    partition, OR-reduced on the driver. Returns (bitmap bytes, m, k).

    Scale design (100 TB): the build is the only full-corpus pass — a
    narrow map (no shuffle); the driver receives one bitmap per partition
    (e.g. 16 KB x 10^4 partitions = 160 MB; for bigger filters, coalesce
    or tree-OR in a second mapInPandas round before collecting). In a
    standing pipeline the bitmap is built once and persisted alongside
    the corpus, exactly like the segment-level bloom index in
    pinot_segment/bloom.py — this is the query-side, corpus-level twin.
    """
    import numpy as np

    h = corpus.select(
        F.pmod(F.xxhash64(key_col), F.lit(m_bits)).alias("h1"),
        (F.pmod(F.xxhash64(key_col, F.lit(0x5bd1)), F.lit(m_bits - 1)) + 1).alias(
            "h2"
        ),
    )

    def build(batches):
        import pandas as pd

        bm = np.zeros(m_bits // 8, dtype=np.uint8)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            seen = True
            h1 = pdf["h1"].to_numpy(np.int64)
            h2 = pdf["h2"].to_numpy(np.int64)
            for i in range(k):
                bits = (h1 + i * h2) % m_bits
                np.bitwise_or.at(bm, bits >> 3, np.uint8(1) << (bits & 7).astype(np.uint8))
        if seen:
            yield pd.DataFrame({"bm": [bm.tobytes()]})

    parts = h.mapInPandas(build, "bm binary").collect()
    bm = np.zeros(m_bits // 8, dtype=np.uint8)
    for row in parts:
        bm |= np.frombuffer(row["bm"], dtype=np.uint8)
    return bm.tobytes(), m_bits, k


def incremental_dedup(
    new_docs: DataFrame,
    corpus: DataFrame,
    m_bits: int = 1 << 17,
    k: int = 4,
) -> DataFrame:
    """Dedup a NEW batch against an EXISTING corpus without shuffling the
    corpus into a join: a corpus-level bloom filter (built once, broadcast)
    prunes the new batch down to possible-duplicate candidates, and only
    those are exactly verified with a semi-join on ``md5(text)``. The
    result is EXACT — bloom false positives are killed by the verify join,
    and a bloom has no false negatives — so the DuckDB anti-join oracle
    reproduces it without modeling the filter at all.

    Returns the surviving new documents: ``doc_id, text_hash``.

    Scale design (100 TB): this is the crawl-ingest shape — the corpus is
    orders of magnitude larger than the batch and CANNOT be broadcast,
    but its bloom (bits-per-key sized) can, and so can the candidate hash
    set the bloom leaves behind. Every join here builds on a broadcast
    small side (plan-asserted in test_plans.py), so the corpus is read,
    probed in place, and discarded — a naive anti-join would instead
    shuffle all 100 TB on the hash. At rest the verify probe's corpus
    read is itself bloom/zone-map-pruned by the storage layer's segment
    indexes.
    """
    import numpy as np

    spark = new_docs.sparkSession
    bm_bytes, m, kk = corpus_bloom(corpus, F.md5("text"), m_bits, k)
    bc = spark.sparkContext.broadcast(bm_bytes)

    hashed = new_docs.select(
        "doc_id",
        F.md5("text").alias("text_hash"),
        F.pmod(F.xxhash64(F.md5("text")), F.lit(m)).alias("h1"),
        (F.pmod(F.xxhash64(F.md5("text"), F.lit(0x5bd1)), F.lit(m - 1)) + 1).alias(
            "h2"
        ),
    )

    def probe(batches):
        bm = np.frombuffer(bc.value, dtype=np.uint8)
        for pdf in batches:
            if not len(pdf):
                continue
            h1 = pdf["h1"].to_numpy(np.int64)
            h2 = pdf["h2"].to_numpy(np.int64)
            hit = np.ones(len(pdf), dtype=bool)
            for i in range(kk):
                bits = (h1 + i * h2) % m
                hit &= (bm[bits >> 3] >> (bits & 7).astype(np.uint8) & 1).astype(bool)
            out = pdf[["doc_id", "text_hash"]].copy()
            out["maybe_dup"] = hit
            yield out

    probed = hashed.mapInPandas(
        probe, "doc_id long, text_hash string, maybe_dup boolean"
    )
    clean = probed.filter(~F.col("maybe_dup")).select("doc_id", "text_hash")
    candidates = probed.filter(F.col("maybe_dup")).select("doc_id", "text_hash")
    # Exact verify with the corpus NEVER shuffled: the candidate hash set
    # (bounded by the new batch, further shrunk by the bloom) broadcasts
    # into a semi-join probe over the corpus scan; the confirmed-duplicate
    # hashes that come back are at most that same small set, and broadcast
    # again into the final anti-join. Both joins build on the small side —
    # the corpus is read, probed, and discarded in place.
    cand_hashes = F.broadcast(candidates.select("text_hash").distinct())
    dup_hashes = (
        corpus.select(F.md5("text").alias("text_hash"))
        .join(cand_hashes, "text_hash", "left_semi")
        .distinct()
    )
    verified_clean = candidates.join(
        F.broadcast(dup_hashes), "text_hash", "left_anti"
    ).select("doc_id", "text_hash")
    return clean.unionByName(verified_clean).orderBy("doc_id")


def incremental_dedup_oracle_sql(new_pred: str, corpus_pred: str) -> str:
    return f"""
SELECT d.doc_id, md5(d.text) AS text_hash
FROM documents d
WHERE ({new_pred})
  AND NOT EXISTS (SELECT 1 FROM documents c
                  WHERE ({corpus_pred}) AND c.text = d.text)
ORDER BY d.doc_id
"""


def shingle_containment_pairs(
    docs: DataFrame, n: int = 3, threshold_pct: int = 80
) -> DataFrame:
    """Asymmetric near-dup detection: ``(doc_a, doc_b)`` where at least
    ``threshold_pct``% of doc_a's word ``n``-gram shingles also occur in
    doc_b — the quote/excerpt/boilerplate-inclusion case Jaccard misses (a
    short doc fully contained in a long one has low Jaccard but 100%
    containment). Directional, so both orientations can appear.

    Same bounded shape as :func:`ngram_jaccard_pairs` (explode + shingle
    equi-join restricted to co-occurring shingles), with the containment
    ratio kept in exact integer percent (``100*|A∩B| div |A|``) so the
    threshold cut is bit-identical cross-engine. The production-scale
    variant buckets through MinHash-LSH first exactly like
    :func:`lsh_verified_pairs`; this is the verify kernel."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    sh = (
        docs.repartition(par, "doc_id")
        .select("doc_id", tokens(F.col("text")).alias("toks"))
        .select(
            "doc_id", F.explode(word_shingles(F.col("toks"), n)).alias("s")
        )
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    return (
        inter.join(sa, "doc_a")
        .withColumn("containment_pct", F.expr("(100 * inter) div sz_a"))
        .filter(F.col("containment_pct") >= threshold_pct)
        .select("doc_a", "doc_b", "containment_pct")
    )


def shingle_containment_pairs_oracle_sql(
    n: int = 3, threshold_pct: int = 80
) -> str:
    joined = " || ' ' || ".join(f"w[i+{k}]" for k in range(n))
    return f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS w FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, len(w) - {n - 1}), i -> {joined})) AS s
  FROM t WHERE len(w) >= {n}
), sizes AS (
  SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, (100 * inter) // sa.sz AS containment_pct
FROM inter JOIN sizes sa ON sa.doc_id = doc_a
WHERE (100 * inter) // sa.sz >= {threshold_pct}
"""


def lsh_quality_audit(
    docs: DataFrame,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Meta-quality audit of the LSH dedup pipeline itself: one row of
    (n_candidates, n_verified, n_true, precision_ppm, recall_ppm), where
    candidates come from the banded md5-MinHash buckets, verified =
    candidates whose exact n-gram Jaccard clears ``threshold``, and true =
    ALL pairs clearing it (the shingle-join ground truth — any pair with
    jaccard > 0 shares a shingle, so the equi-join truth set is complete
    above any positive threshold). Precision tells you how much exact
    verification work the bands waste; recall tells you what the bands
    miss — the two numbers that justify (or re-tune) k/bands before
    spending the verify pass on 100 TB.

    Scale shape: each leg is the already-bounded pipeline stage
    (banded buckets / semi-join-restricted verify / shingle equi-join);
    the audit adds only three 1-row count aggregates cross-joined at the
    end. Integer ppm floor-division keeps the row hash-exact."""
    cands = minhash_lsh_candidates_md5(docs, k, bands, n)
    verified = ngram_jaccard_verify(docs, cands, n, threshold)
    truth = ngram_jaccard_pairs(docs, n, threshold)
    c = cands.agg(F.count("*").alias("n_candidates"))
    v = verified.agg(F.count("*").alias("n_verified"))
    tr = truth.agg(F.count("*").alias("n_true"))
    return (
        c.crossJoin(v)
        .crossJoin(tr)
        .select(
            "n_candidates",
            "n_verified",
            "n_true",
            F.expr(
                "CAST(CASE WHEN n_candidates = 0 THEN 0"
                " ELSE n_verified * 1000000 DIV n_candidates END AS BIGINT)"
            ).alias("precision_ppm"),
            F.expr(
                "CAST(CASE WHEN n_true = 0 THEN 0"
                " ELSE n_verified * 1000000 DIV n_true END AS BIGINT)"
            ).alias("recall_ppm"),
        )
    )


def lsh_quality_audit_oracle_sql(
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    n: int = 3,
    threshold: float = 0.2,
) -> str:
    cand = minhash_lsh_candidates_md5_oracle_sql(k, bands, n)
    ver = lsh_verified_pairs_oracle_sql(k, bands, n, threshold)
    true = ngram_jaccard_pairs_oracle_sql(n, threshold)
    return f"""
SELECT n_candidates, n_verified, n_true,
       CAST(CASE WHEN n_candidates = 0 THEN 0
            ELSE n_verified * 1000000 // n_candidates END AS BIGINT)
         AS precision_ppm,
       CAST(CASE WHEN n_true = 0 THEN 0
            ELSE n_verified * 1000000 // n_true END AS BIGINT)
         AS recall_ppm
FROM (SELECT CAST(count(*) AS BIGINT) AS n_candidates FROM ({cand})),
     (SELECT CAST(count(*) AS BIGINT) AS n_verified FROM ({ver})),
     (SELECT CAST(count(*) AS BIGINT) AS n_true FROM ({true}))
"""


def dup_group_size_histogram(docs: DataFrame) -> DataFrame:
    """Histogram of exact-duplicate group sizes — the one-page dedup
    report ("how much of the corpus is 2x copies vs 1000x boilerplate?"):
    per group size, the number of content-hash groups of that size and
    the total docs they account for. Rides :func:`exact_dedup`'s hash
    groupBy; the histogram is a second tiny aggregation over
    group-count-many rows."""
    groups = exact_dedup(docs)
    return (
        groups.groupBy(F.col("n_copies").alias("group_size"))
        .agg(F.count(F.lit(1)).alias("n_groups"))
        .select(
            "group_size",
            "n_groups",
            F.expr("CAST(group_size * n_groups AS BIGINT)").alias("n_docs"),
        )
        .orderBy("group_size")
    )


def dup_group_size_histogram_oracle_sql() -> str:
    return """
WITH groups AS (
  SELECT md5(text) AS h, count(*) AS n_copies
  FROM documents GROUP BY md5(text)
)
SELECT n_copies AS group_size,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(n_copies * count(*) AS BIGINT) AS n_docs
FROM groups GROUP BY n_copies ORDER BY group_size"""


def canonical_keep_report(docs: DataFrame) -> DataFrame:
    """Canonical-document selection over exact-duplicate groups — the
    retention step that follows dedup detection in a real pipeline: each
    md5(text) group keeps ONE canonical copy (the longest document,
    ``n_chars`` desc, ties broken by smallest doc_id — "best quality
    wins" with a deterministic tiebreak) and drops the rest. The report
    rolls kept/dropped counts up per source, which is the number a
    mixture designer actually reads (which crawls are net losers to
    dedup?).

    Scale shape: one hash shuffle on the content key, a row_number
    window inside each (bounded) duplicate group, then a map-side-
    combined per-source rollup. No pairwise comparisons anywhere —
    this is the grouping half of dedup, the LSH tiers handle near-dups."""
    ranked = docs.select(
        "doc_id",
        "source",
        F.md5(F.col("text")).alias("key"),
        "n_chars",
    ).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("key").orderBy(
                F.desc("n_chars"), F.asc("doc_id")
            )
        ),
    )
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("rk") == 1).cast("bigint")).alias("n_kept"),
            F.sum((F.col("rk") > 1).cast("bigint")).alias("n_dropped"),
        )
        .orderBy("source")
    )


def canonical_keep_report_oracle_sql() -> str:
    return """
WITH ranked AS (
  SELECT source,
         row_number() OVER (
           PARTITION BY md5(text) ORDER BY n_chars DESC, doc_id ASC) AS rk
  FROM documents
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM ranked GROUP BY source ORDER BY source"""


def jaccard_prefix_join(
    docs: DataFrame, t_ppm: int = 600_000, k: int = 50
) -> DataFrame:
    """EXACT token-set Jaccard similarity join via prefix filtering
    (PPJoin-family, Chaudhuri et al. 2006 / Xiao et al. 2008, public) —
    the lossless alternative to MinHash-LSH: two documents with
    ``J >= t`` must share at least one token among each side's first
    ``floor((1-t)|d|) + 1`` tokens in a GLOBAL rarest-first order, so
    candidate generation only joins on those prefix tokens and the
    verified result equals the naive all-token join exactly (which is
    what the DuckDB oracle computes — hash-equality IS the losslessness
    proof). Top-``k`` pairs by (jaccard desc, doc_a, doc_b), similarity
    as exact integer ppm.

    Scale shape: one distinct shuffle builds the doc-token set; the
    global frequency order and the per-doc sizes join back as PLAIN
    shuffle joins (both are corpus-derived — vocabulary-sized and
    doc-count-sized — so forcing a broadcast would be the classic
    blow-up-the-driver mistake; AQE still picks broadcast when they
    measure small). Prefix tokens are by construction the RAREST in each
    document, so the candidate equi-join fans out by rare-token
    frequency, not vocabulary size — the standard prefix-filter bound.
    Verification joins full token sets only for candidate pairs
    (semi-join pushdown), never all pairs."""
    from datafusion_pinot_spark.functions import tokens

    # materialized once: the doc-token set feeds the ranking, both sides
    # of the candidate join, and both sides of the verify join — without
    # the checkpoint Spark would recompute the distinct subtree per use
    dt = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
        .distinct()
        .localCheckpoint()
    )
    sizes = dt.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    freq = dt.groupBy("w").agg(F.count(F.lit(1)).alias("fr"))
    ranked = (
        dt.join(freq, "w")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.asc("fr"), F.asc("w")
                )
            ),
        )
        .join(sizes, "doc_id")
    )
    prefix = ranked.filter(
        F.col("rk")
        <= F.expr(f"CAST(floor((1000000 - {t_ppm}) * sz / 1000000) AS INT) + 1")
    ).select("doc_id", "w", "sz")
    # size filter (the second standard prefix-join prune): J(a,b) >= t
    # forces t*|a| <= |b| when |a| <= |b|, so wildly different sizes can
    # never qualify and are cut before the distinct
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                F.col("b.sz") * F.lit(1_000_000)
                >= F.col("a.sz") * F.lit(t_ppm)
            )
            & (
                F.col("a.sz") * F.lit(1_000_000)
                >= F.col("b.sz") * F.lit(t_ppm)
            ),
        )
        .select(
            F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db")
        )
        .distinct()
    )
    inter = (
        cand.join(dt.select(F.col("doc_id").alias("da"), "w"), "da")
        .join(dt.select(F.col("doc_id").alias("db"), "w"), ["db", "w"])
        .groupBy("da", "db")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("da"), F.col("sz").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("db"), F.col("sz").alias("size_b"))
    return (
        inter.join(sa, "da")
        .join(sb, "db")
        .select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            "n_inter",
            "size_a",
            "size_b",
            F.expr(
                "CAST(n_inter * 1000000 DIV (size_a + size_b - n_inter)"
                " AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
        .filter(F.col("jaccard_ppm") >= t_ppm)
        .orderBy(F.desc("jaccard_ppm"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(k)
    )


def jaccard_prefix_join_oracle_sql(t_ppm: int = 600_000, k: int = 50) -> str:
    """The NAIVE all-token join — no prefix filter. Hash-equality with the
    engine result proves the prefix filter is lossless."""
    return f"""
WITH dt AS (
  SELECT DISTINCT doc_id,
         unnest(list_filter(
           regexp_split_to_array(trim(lower(text)), '\\s+'), x -> x <> ''))
           AS w
  FROM documents WHERE length(trim(text)) > 0
), sizes AS (
  SELECT doc_id, count(*) AS sz FROM dt GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM dt a JOIN dt b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), scored AS (
  SELECT doc_a, doc_b, n_inter, sa.sz AS size_a, sb.sz AS size_b,
         CAST(n_inter * 1000000 // (sa.sz + sb.sz - n_inter) AS BIGINT)
           AS jaccard_ppm
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
)
SELECT doc_a, doc_b, CAST(n_inter AS BIGINT) AS n_inter,
       CAST(size_a AS BIGINT) AS size_a, CAST(size_b AS BIGINT) AS size_b,
       jaccard_ppm
FROM scored WHERE jaccard_ppm >= {t_ppm}
ORDER BY jaccard_ppm DESC, doc_a ASC, doc_b ASC LIMIT {k}
"""


def boilerplate_strip_report(
    docs: DataFrame, words_per_chunk: int = 10, pct: int = 30
) -> DataFrame:
    """Frequency-based boilerplate removal report (the CCNet/RefinedWeb
    line-dedup stage, distinct from :func:`chunk_dedup`'s first-wins
    GLOBAL dedup): a chunk is boilerplate WITHIN A SOURCE when it occurs
    in at least ``pct`` percent of that source's documents (and in ≥2
    docs) — nav bars, license headers, template footers. The report
    gives, per source, the doc count, total chunk occurrences, how many
    occurrences a strip would remove, and the removal rate in exact ppm
    (the number a curation run reviews before committing the strip).

    Scale shape: chunking is the same narrow per-row split as
    chunk_dedup; the per-(source, chunk) doc-frequency is one
    map-side-combined distinct agg; flagging joins that (source, chunk)
    table back to the occurrence stream on its own key — Zipf-bounded,
    never corpus-quadratic. All integers."""
    words = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(words) / F.lit(words_per_chunk)).cast("long")
    chunks = F.transform(
        F.sequence(F.lit(0), (n_chunks - 1).cast("int")),
        lambda i: F.array_join(
            F.slice(words, i * words_per_chunk + 1, words_per_chunk), " "
        ),
    )
    occ = docs.select(
        "doc_id", "source", F.explode(chunks).alias("chunk")
    )
    ndocs = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    cfreq = (
        occ.select("source", "chunk", "doc_id")
        .distinct()
        .groupBy("source", "chunk")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    flagged = cfreq.join(ndocs, "source").withColumn(
        "is_boiler",
        (F.col("df") >= 2) & (F.col("df") * 100 >= F.col("n_docs") * pct),
    )
    scored = occ.join(
        flagged.select("source", "chunk", "is_boiler"), ["source", "chunk"]
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.sum(F.col("is_boiler").cast("bigint")).alias("n_removed"),
        )
        .select(
            "source",
            "n_docs",
            "n_occurrences",
            "n_removed",
            F.expr(
                "CAST(n_removed * 1000000 DIV n_occurrences AS BIGINT)"
            ).alias("removed_ppm"),
        )
        .orderBy("source")
    )


def boilerplate_strip_report_oracle_sql(
    words_per_chunk: int = 10, pct: int = 30
) -> str:
    w = words_per_chunk
    return f"""
WITH words AS (
  SELECT doc_id, source, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents),
occ AS (
  SELECT doc_id, source, string_agg(w, ' ' ORDER BY pos) AS chunk
  FROM words GROUP BY doc_id, source, (pos - 1) // {w}),
ndocs AS (
  SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
cfreq AS (
  SELECT source, chunk, count(DISTINCT doc_id) AS df
  FROM occ GROUP BY source, chunk),
flagged AS (
  SELECT c.source, c.chunk,
         (c.df >= 2 AND c.df * 100 >= n.n_docs * {pct}) AS is_boiler
  FROM cfreq c JOIN ndocs n ON c.source = n.source),
scored AS (
  SELECT o.source, o.doc_id, f.is_boiler
  FROM occ o JOIN flagged f ON o.source = f.source AND o.chunk = f.chunk)
SELECT source,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(sum(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removed,
       CAST(sum(CASE WHEN is_boiler THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS removed_ppm
FROM scored GROUP BY source ORDER BY source
"""


def minhash_estimate_error(
    docs: DataFrame,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    n: int = 3,
) -> DataFrame:
    """MinHash ESTIMATION-ERROR audit, fully hash-gated: over the banded
    LSH candidate pairs, compare the signature-estimated Jaccard
    (matching components / k, in ppm) against the exact shingle-set
    Jaccard, and report the corpus-level error profile — pair count,
    mean estimated vs mean exact, mean absolute error and worst error
    (all exact integer ppm). The textbook MinHash accuracy claim
    (unbiased, sd ~ 1/sqrt(k)) as a MEASURED number the oracle
    re-derives — the dedup-side analog of the SQ8 recall audit.

    Scale shape: candidates are the capped banded buckets (never
    all-pairs); the estimate is a k-column compare on the candidate
    frame; the exact verify joins shingles for candidate docs only —
    the same economics as lsh_verified_pairs, plus one tiny rollup."""
    sig = minhash_signatures(docs, k, n)
    cand = minhash_lsh_candidates_md5(docs, k, bands, n)
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(k)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(k)],
    )
    matches = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("long") for i in range(k)
    )
    est = cand.join(sa, "doc_a").join(sb, "doc_b").select(
        "doc_a",
        "doc_b",
        (matches * F.lit(1_000_000 // k)).alias("est_ppm"),
    )
    toks = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    sh = (
        toks.select(
            "doc_id",
            F.explode(word_shingles(F.col("toks"), n)).alias("s"),
        )
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        cand.join(
            sh.select(F.col("doc_id").alias("doc_a"), "s"), "doc_a"
        )
        .join(sh.select(F.col("doc_id").alias("doc_b"), "s"), ["doc_b", "s"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    exact = (
        cand.join(inter, ["doc_a", "doc_b"], "left")
        .withColumn("inter", F.coalesce("inter", F.lit(0)))
        .join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.expr(
                "CAST(inter * 1000000 DIV (sz_a + sz_b - inter) AS BIGINT)"
            ).alias("exact_ppm"),
        )
    )
    per_pair = est.join(exact, ["doc_a", "doc_b"]).withColumn(
        "err_ppm", F.abs(F.col("est_ppm") - F.col("exact_ppm"))
    )
    return per_pair.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.expr("CAST(sum(est_ppm) DIV count(*) AS BIGINT)").alias(
            "mean_est_ppm"
        ),
        F.expr("CAST(sum(exact_ppm) DIV count(*) AS BIGINT)").alias(
            "mean_exact_ppm"
        ),
        F.expr("CAST(sum(err_ppm) DIV count(*) AS BIGINT)").alias(
            "mean_abs_err_ppm"
        ),
        F.max("err_ppm").cast("long").alias("max_err_ppm"),
    )


def minhash_estimate_error_oracle_sql(
    k: int = MINHASH_K, bands: int = LSH_BANDS, n: int = 3
) -> str:
    match_sum = " + ".join(
        f"CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END" for i in range(k)
    )
    return _lsh_candidate_ctes(k, bands, n) + f""", est AS (
  SELECT c.doc_a, c.doc_b,
         CAST(({match_sum}) * {1_000_000 // k} AS BIGINT) AS est_ppm
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.doc_a
  JOIN sig sb ON sb.doc_id = c.doc_b
), sh2 AS (
  SELECT DISTINCT doc_id, unnest(sh) AS s FROM s
), sizes AS (
  SELECT doc_id, count(*) AS sz FROM sh2 GROUP BY doc_id
), inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS inter
  FROM cand c
  JOIN sh2 a ON a.doc_id = c.doc_a
  JOIN sh2 b ON b.doc_id = c.doc_b AND b.s = a.s
  GROUP BY c.doc_a, c.doc_b
), exact AS (
  SELECT c.doc_a, c.doc_b,
         CAST(coalesce(i.inter, 0) * 1000000
              // (sa.sz + sb.sz - coalesce(i.inter, 0)) AS BIGINT)
           AS exact_ppm
  FROM cand c
  LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
  JOIN sizes sa ON sa.doc_id = c.doc_a
  JOIN sizes sb ON sb.doc_id = c.doc_b
), per_pair AS (
  SELECT e.doc_a, e.doc_b, e.est_ppm, x.exact_ppm,
         abs(e.est_ppm - x.exact_ppm) AS err_ppm
  FROM est e JOIN exact x ON e.doc_a = x.doc_a AND e.doc_b = x.doc_b
)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(est_ppm) // count(*) AS BIGINT) AS mean_est_ppm,
       CAST(sum(exact_ppm) // count(*) AS BIGINT) AS mean_exact_ppm,
       CAST(sum(err_ppm) // count(*) AS BIGINT) AS mean_abs_err_ppm,
       CAST(max(err_ppm) AS BIGINT) AS max_err_ppm
FROM per_pair"""


def dedup_token_yield(docs: DataFrame) -> DataFrame:
    """Net TOKEN yield per source after exact dedup — the budget number a
    mixture designer actually needs (doc counts lie when duplicates are
    long): per source, total tokens, tokens surviving canonical
    selection (longest-doc-wins per md5 group, the
    :func:`canonical_keep_report` convention), and the retained fraction
    in exact ppm.

    Scale shape: one token-size narrow map, one hash shuffle on the
    content key for the canonical window, one map-side-combined per-
    source rollup — the same plan as the keep report plus a size column."""
    from datafusion_pinot_spark.functions import tokens

    ranked = docs.select(
        "source",
        F.md5(F.col("text")).alias("key"),
        "n_chars",
        "doc_id",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tok"),
    ).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("key").orderBy(
                F.desc("n_chars"), F.asc("doc_id")
            )
        ),
    )
    return (
        ranked.groupBy("source")
        .agg(
            F.sum("n_tok").cast("long").alias("total_tokens"),
            F.sum(
                F.when(F.col("rk") == 1, F.col("n_tok")).otherwise(F.lit(0))
            ).cast("long").alias("kept_tokens"),
        )
        .select(
            "source",
            "total_tokens",
            "kept_tokens",
            F.expr(
                "CAST(CASE WHEN total_tokens > 0"
                " THEN kept_tokens * 1000000 DIV total_tokens"
                " ELSE 0 END AS BIGINT)"
            ).alias("retained_ppm"),
        )
        .orderBy("source")
    )


def dedup_token_yield_oracle_sql() -> str:
    return """
WITH ranked AS (
  SELECT source, doc_id,
         CASE WHEN length(trim(lower(text))) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(lower(text)), '\\s+')) END
           AS n_tok,
         row_number() OVER (
           PARTITION BY md5(text) ORDER BY n_chars DESC, doc_id ASC) AS rk
  FROM documents
)
SELECT source,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       CAST(sum(CASE WHEN rk = 1 THEN n_tok ELSE 0 END) AS BIGINT)
         AS kept_tokens,
       CAST(CASE WHEN sum(n_tok) > 0
                 THEN sum(CASE WHEN rk = 1 THEN n_tok ELSE 0 END) * 1000000
                      // sum(n_tok)
                 ELSE 0 END AS BIGINT) AS retained_ppm
FROM ranked GROUP BY source ORDER BY source"""


def dup_transitivity_audit(
    docs: DataFrame,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Transitivity (wedge-closure) audit of the verified near-dup graph —
    the risk measure behind "connected components = dup groups" dedup:
    components keep ONE doc per component, which is only safe if
    similarity chains don't connect dissimilar documents. For every wedge
    a—m—b (two verified edges sharing midpoint m, a < b) this reports
    whether the closing edge (a, b) is itself a verified pair; a low
    closure share means component-based dedup is chaining dissimilar
    docs and should tighten the threshold or cap component diameter.

    Exact integers end to end (wedge and closed-wedge counts, closure in
    ppm), built on the md5-family verified pairs so the whole pipeline
    hash-checks in DuckDB.

    Scale shape (100 TB): wedges enumerate per midpoint — bounded by
    sum(deg^2) over the verified graph, which the LSH bucket cap already
    bounds (dup neighborhoods are small by construction; a pathological
    hub would cap at max_bucket_size^2). The self-join on the midpoint
    and the closure probe are DELIBERATELY shuffle joins (not broadcast):
    the verified-pair frame is O(duplicate pairs), which a dup-heavy
    corpus makes arbitrarily large — the midpoint join co-partitions the
    same frame against itself (one exchange each side), and the closure
    probe shuffles on the (wa, wb) pair key. Never touches raw text after
    the verify stage.
    """
    edges = lsh_verified_pairs(docs, k, bands, n, threshold).select(
        "doc_a", "doc_b"
    )
    # the verified-pair frame feeds THREE consumers (both adjacency
    # directions + the closure probe); checkpoint it once instead of
    # re-running signature->buckets->verify per consumer (r14: 2x)
    edges = edges.localCheckpoint(eager=False)
    # undirected adjacency: both directions for the midpoint join
    adj = edges.union(
        edges.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    ).select(F.col("doc_a").alias("m"), F.col("doc_b").alias("nb"))
    l, r = adj.alias("l"), adj.alias("r")
    wedges = (
        l.join(r, (F.col("l.m") == F.col("r.m")) & (F.col("l.nb") < F.col("r.nb")))
        .select(
            F.col("l.nb").alias("wa"),
            F.col("r.nb").alias("wb"),
        )
    )
    closed = wedges.join(
        edges.select(
            F.col("doc_a").alias("wa"), F.col("doc_b").alias("wb")
        ).withColumn("is_edge", F.lit(1)),
        ["wa", "wb"],
        "left",
    )
    return closed.agg(
        F.count(F.lit(1)).cast("long").alias("n_wedges"),
        # outer coalesce: SUM over a zero-wedge frame is NULL, and the
        # no-duplicates corpus must report (0, 0, 0), not (0, NULL, 0)
        F.coalesce(
            F.sum(F.coalesce(F.col("is_edge"), F.lit(0))), F.lit(0)
        )
        .cast("long")
        .alias("n_closed"),
        F.expr(
            "CASE WHEN count(1) > 0 THEN"
            " CAST(sum(coalesce(is_edge, 0)) * 1000000L div count(1)"
            " AS BIGINT) ELSE 0L END"
        ).alias("closure_ppm"),
    )


def dup_transitivity_audit_oracle_sql(
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    n: int = 3,
    threshold: float = 0.2,
) -> str:
    # Reuse the verified-pairs oracle verbatim as a CTE: its final
    # top-level SELECT becomes `edges AS (SELECT ...)`.
    base = lsh_verified_pairs_oracle_sql(k, bands, n, threshold).rstrip()
    head, final_select = base.rsplit("\nSELECT doc_a, doc_b,", 1)
    return head + ", edges AS (\nSELECT doc_a, doc_b," + final_select + """
), adj AS (
  SELECT doc_a AS m, doc_b AS nb FROM edges
  UNION ALL
  SELECT doc_b AS m, doc_a AS nb FROM edges
), wedges AS (
  SELECT l.nb AS wa, r.nb AS wb
  FROM adj l JOIN adj r ON l.m = r.m AND l.nb < r.nb
)
SELECT CAST(count(*) AS BIGINT) AS n_wedges,
       CAST(coalesce(sum(CASE WHEN e.doc_a IS NOT NULL THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_closed,
       CAST(CASE WHEN count(*) > 0
                 THEN coalesce(sum(CASE WHEN e.doc_a IS NOT NULL
                                        THEN 1 ELSE 0 END), 0)
                      * 1000000 // count(*)
                 ELSE 0 END AS BIGINT) AS closure_ppm
FROM wedges w
LEFT JOIN edges e ON e.doc_a = w.wa AND e.doc_b = w.wb"""


def dedup_survivorship_psi(docs: DataFrame) -> DataFrame:
    """Source-mix drift introduced by exact dedup — the survivorship-bias
    audit every dedup stage should ship with: dedup keeps one canonical
    doc per content hash, so sources whose content is heavily mirrored
    elsewhere lose share, silently re-weighting the training mixture.
    Reports, per source, the corpus share before vs after dedup (exact
    integer ppm) and the PSI contribution of the shift (the house
    ``(p - q) * ln(p / q)`` with the same round-6 float fence as
    ``psi_drift``; ppm values clamped to >= 1 inside the log so a
    fully-deduped-away source yields a finite, engine-identical
    contribution instead of ln(0)).

    Attribution rule: a surviving hash group belongs to the source of
    its CANONICAL doc (min doc_id) — the same doc the dedup stage would
    physically keep.

    Scale shape (100 TB): the before-counts are one map-side-combined
    aggregate; the after-side reuses exact_dedup's hash shuffle and
    joins the kept ids back on doc_id (shuffle equi-join — the kept set
    is O(distinct docs), deliberately NOT broadcast); the share/PSI
    arithmetic runs on the |sources|-row profile with one broadcast
    totals row.
    """
    before = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_before")
    )
    kept = exact_dedup(docs).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    after = (
        kept.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_after"))
    )
    j = before.join(after, "source", "left").na.fill(0, ["n_after"])
    tot = j.agg(
        F.sum("n_before").cast("long").alias("t_before"),
        F.sum("n_after").cast("long").alias("t_after"),
    )
    out = j.join(F.broadcast(tot))
    p = F.expr("n_before * 1000000L div t_before")
    q = F.expr("n_after * 1000000L div t_after")
    return (
        out.select(
            "source",
            "n_before",
            "n_after",
            p.cast("long").alias("share_before_ppm"),
            q.cast("long").alias("share_after_ppm"),
        )
        .withColumn(
            "psi_contrib",
            F.round(
                (F.col("share_before_ppm") - F.col("share_after_ppm"))
                / F.lit(1_000_000.0)
                * F.log(
                    F.greatest(F.col("share_before_ppm"), F.lit(1))
                    / F.greatest(F.col("share_after_ppm"), F.lit(1))
                ),
                6,
            ),
        )
        .orderBy("source")
    )


def dedup_survivorship_psi_oracle_sql() -> str:
    return """
WITH before AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_before
  FROM documents GROUP BY source
), kept AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
), after AS (
  SELECT d.source, CAST(count(*) AS BIGINT) AS n_after
  FROM kept k JOIN documents d ON d.doc_id = k.doc_id
  GROUP BY d.source
), j AS (
  SELECT b.source, b.n_before,
         CAST(coalesce(a.n_after, 0) AS BIGINT) AS n_after
  FROM before b LEFT JOIN after a ON a.source = b.source
), t AS (
  SELECT CAST(sum(n_before) AS BIGINT) AS t_before,
         CAST(sum(n_after) AS BIGINT) AS t_after FROM j
)
SELECT source, n_before, n_after,
       CAST(n_before * 1000000 // t_before AS BIGINT) AS share_before_ppm,
       CAST(n_after * 1000000 // t_after AS BIGINT) AS share_after_ppm,
       round((n_before * 1000000 // t_before
              - n_after * 1000000 // t_after) / 1000000.0
             * ln(CAST(greatest(n_before * 1000000 // t_before, 1) AS DOUBLE)
                  / CAST(greatest(n_after * 1000000 // t_after, 1)
                         AS DOUBLE)), 6) AS psi_contrib
FROM j CROSS JOIN t ORDER BY source"""


def dedup_pipeline_report(
    docs: DataFrame,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """FLAGSHIP composed near-dup pipeline (r11 verdict #5) — the single
    corpus-in → report-out answer to "what does dedup at 100 TB look like
    here": md5-MinHash signatures → banded LSH candidate buckets → exact
    n-gram Jaccard verify → connected components → canonical keep (each
    component keeps its min-doc_id member, the ``dedup_groups`` label) →
    per-source survivorship + token-yield report. Every stage is the
    already-hash-proven operator, composed; the whole pipeline
    hash-checks against one DuckDB oracle.

    Per source: ``n_docs`` in the corpus, ``n_dup_members`` belonging to
    some verified near-dup component, ``n_kept`` surviving canonical
    selection (non-members + one canonical per component), total vs kept
    tokens, and the retained fraction in exact ppm.

    Scale shape, end to end (no all-pairs anywhere): signatures are a
    narrow map over the corpus; candidates come from banded bucket
    equi-joins (``max_bucket_size``-capped inside
    ``minhash_lsh_candidates_md5`` — a degenerate bucket cannot go
    quadratic); verify touches only candidate pairs; components run
    min-label propagation on the (small) verified-pair set, never the
    corpus; the label frame joins back to the corpus on doc_id as a
    shuffle equi-join (labels are O(dup members) — unbounded on dup-heavy
    corpora, so deliberately NOT broadcast); the report is one map-side-
    combined per-source rollup."""
    pairs = lsh_verified_pairs(docs, k, bands, n, threshold).select(
        "doc_a", "doc_b"
    )
    labels = dedup_groups(pairs)  # (doc_id, group_id), members only
    tok = docs.select(
        "doc_id",
        "source",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tok"),
    )
    lab = tok.join(labels, "doc_id", "left")
    flags = lab.select(
        "source",
        "n_tok",
        F.col("group_id").isNotNull().cast("bigint").alias("in_group"),
        (
            F.col("group_id").isNotNull()
            & (F.col("group_id") != F.col("doc_id"))
        ).cast("bigint").alias("dropped"),
    )
    return (
        flags.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("in_group").alias("n_dup_members"),
            F.sum(F.lit(1) - F.col("dropped")).alias("n_kept"),
            F.sum("n_tok").alias("total_tokens"),
            F.sum(
                F.when(F.col("dropped") == 0, F.col("n_tok")).otherwise(
                    F.lit(0)
                )
            ).alias("kept_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "n_dup_members",
            "n_kept",
            "total_tokens",
            "kept_tokens",
            F.expr(
                "CAST(CASE WHEN total_tokens > 0"
                " THEN kept_tokens * 1000000 DIV total_tokens"
                " ELSE 0 END AS BIGINT)"
            ).alias("retained_ppm"),
        )
        .orderBy("source")
    )


def dedup_pipeline_report_oracle_sql(
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    n: int = 3,
    threshold: float = 0.2,
) -> str:
    """One DuckDB statement for the whole composed pipeline: the verified-
    pair oracle (shared CTE prefix) nested as a CTE, a recursive-CTE
    transitive closure for the components, then the per-source rollup."""
    vpairs = lsh_verified_pairs_oracle_sql(k, bands, n, threshold)
    return f"""
WITH RECURSIVE vpairs AS ({vpairs}),
e AS (
  SELECT doc_a AS a, doc_b AS b FROM vpairs
  UNION SELECT doc_b, doc_a FROM vpairs
),
reach(src, dst) AS (
  SELECT a, b FROM e
  UNION
  SELECT r.src, e.b FROM reach r JOIN e ON r.dst = e.a
),
labels AS (
  SELECT src AS doc_id, least(src, min(dst)) AS group_id
  FROM reach GROUP BY src
),
tokd AS (
  SELECT doc_id, source,
         CASE WHEN length(trim(lower(text))) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(lower(text)), '\\s+')) END
           AS n_tok
  FROM documents
),
j AS (
  SELECT t.source, t.n_tok,
         CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END AS in_group,
         CASE WHEN l.doc_id IS NOT NULL AND l.group_id <> t.doc_id
              THEN 1 ELSE 0 END AS dropped
  FROM tokd t LEFT JOIN labels l ON l.doc_id = t.doc_id
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(in_group) AS BIGINT) AS n_dup_members,
       CAST(sum(1 - dropped) AS BIGINT) AS n_kept,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       CAST(sum(CASE WHEN dropped = 0 THEN n_tok ELSE 0 END) AS BIGINT)
         AS kept_tokens,
       CAST(CASE WHEN sum(n_tok) > 0
                 THEN sum(CASE WHEN dropped = 0 THEN n_tok ELSE 0 END)
                      * 1000000 // sum(n_tok)
                 ELSE 0 END AS BIGINT) AS retained_ppm
FROM j GROUP BY source ORDER BY source"""


def ngram_novelty_curve(docs: DataFrame, n: int = 3, buckets: int = 10) -> DataFrame:
    """Shingle-novelty curve across ingestion order (r12): Heaps' law
    tracks new VOCABULARY; a crawl's marginal value to training is new
    CONTENT — the fraction of a batch's distinct word-n-gram shingles
    never seen in any earlier batch. A flattening curve says additional
    data from this pipeline is mostly re-crawl; the number feeds the
    stop-crawling / re-weight decision.

    Batching is exact and sort-free: ``bucket = (doc_id - min_id) *
    buckets DIV (max_id - min_id + 1)`` over the observed doc_id range
    (ingestion ids are monotone in the synthetic corpus, the common
    production case).

    Scale shape (100 TB): doc -> distinct shingles is the dedup family's
    explode; then exactly TWO map-side-combined shuffles — one ON THE
    SHINGLE collecting each shingle's distinct bucket set (collect_set
    partial-aggregates, so the shuffle carries per-partition shingle
    rows, not occurrences), one on the bucket for the rollup after the
    first-bucket min and membership explode run narrowly on the
    per-shingle rows. No join, no third shuffle (an earlier draft
    distinct-ed (bucket, shingle) pairs and self-joined — one more
    shuffle AND a join for the same answer)."""
    from datafusion_pinot_spark.functions import tokens, word_shingles

    bounds = docs.agg(
        F.min("doc_id").alias("min_id"), F.max("doc_id").alias("max_id")
    )
    sh = docs.join(F.broadcast(bounds)).select(
        F.expr(
            f"(doc_id - min_id) * {buckets}"
            " DIV (max_id - min_id + 1)"
        ).cast("bigint").alias("bucket"),
        F.explode(
            word_shingles(tokens(F.col("text")), n)
        ).alias("shingle"),
    )
    per_shingle = sh.groupBy("shingle").agg(
        F.collect_set("bucket").alias("bs")
    )
    member = per_shingle.select(
        F.array_min("bs").alias("first_bucket"),
        F.explode("bs").alias("bucket"),
    )
    return (
        member.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                (F.col("bucket") == F.col("first_bucket")).cast("bigint")
            ).cast("long").alias("n_novel"),
        )
        .select(
            "bucket",
            "n_shingles",
            "n_novel",
            F.expr(
                "CAST(CASE WHEN n_shingles > 0"
                " THEN n_novel * 1000000 DIV n_shingles"
                " ELSE 0 END AS BIGINT)"
            ).alias("novelty_ppm"),
        )
        .orderBy("bucket")
    )


def ngram_novelty_curve_oracle_sql(n: int = 3, buckets: int = 10) -> str:
    joined = " || ' ' || ".join(f"w[i+{j}]" for j in range(n))
    shingles = (
        f"CASE WHEN len(w) < {n} THEN [] "
        f"ELSE list_distinct(list_transform("
        f"generate_series(1, len(w) - {n - 1}), i -> {joined})) END"
    )
    return f"""
WITH bounds AS (
  SELECT min(doc_id) AS min_id, max(doc_id) AS max_id FROM documents
), tks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS w
  FROM documents WHERE length(trim(lower(text))) > 0
), sh AS (
  SELECT DISTINCT
         (d.doc_id - b.min_id) * {buckets} // (b.max_id - b.min_id + 1)
           AS bucket,
         s.shingle
  FROM tks d CROSS JOIN bounds b,
       LATERAL unnest({shingles}) AS s(shingle)
), first AS (
  SELECT shingle, min(bucket) AS first_bucket FROM sh GROUP BY shingle
)
SELECT bucket,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN bucket = first_bucket THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       CAST(CASE WHEN count(*) > 0
                 THEN sum(CASE WHEN bucket = first_bucket THEN 1 ELSE 0 END)
                      * 1000000 // count(*)
                 ELSE 0 END AS BIGINT) AS novelty_ppm
FROM sh JOIN first USING (shingle)
GROUP BY bucket ORDER BY bucket"""


LSH_TUNING_BANDS = (1, 2, 4)  # configs over the same k=8 signature


def lsh_band_tuning_curve(
    docs: DataFrame,
    k: int = MINHASH_K,
    bands_list: tuple[int, ...] = LSH_TUNING_BANDS,
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """The (bands, rows-per-band) tuning table for the MinHash-LSH
    pipeline: :func:`lsh_quality_audit` evaluated across band configs over
    the SAME k-hash signature, one row per config — candidates generated,
    exact-verified survivors, ground-truth pair count, precision and
    recall in exact ppm. The S-curve tradeoff made measurable: more bands
    with fewer rows each collide more (recall up, precision down); this
    is the table you read BEFORE committing a (b, r) to a 100 TB dedup
    run, and it subsumes the single-config audit the way the yield curve
    subsumes a single quality threshold.

    Scale shape: each config leg is the already-bounded LSH pipeline
    (banded buckets, semi-join-restricted verify); the ground-truth leg
    is computed ONCE and cross-joined into every config row as a 1-row
    broadcast. The |configs| legs SHARE the signature frame — it is
    computed and checkpointed once below (r14: previously each leg
    re-tokenized, re-shingled and re-hashed the corpus; the shared
    frame cut the audit ~2x), so the cost model is one signature pass
    plus |configs| x the banded candidate pipeline, never all-pairs."""
    tr = ngram_jaccard_pairs(docs, n, threshold).agg(
        F.count("*").alias("n_true")
    )
    sig = (
        minhash_signatures(docs, k, n)
        .filter(F.col("mh0").isNotNull())
        .localCheckpoint(eager=False)
    )
    legs = []
    for bands in bands_list:
        cands = minhash_lsh_candidates_md5(docs, k, bands, n, sig=sig)
        verified = ngram_jaccard_verify(docs, cands, n, threshold)
        c = cands.agg(F.count("*").alias("n_candidates"))
        v = verified.agg(F.count("*").alias("n_verified"))
        legs.append(
            c.crossJoin(v).select(
                F.lit(bands).cast("int").alias("bands"),
                F.lit(k // bands).cast("int").alias("rows_per_band"),
                "n_candidates",
                "n_verified",
            )
        )
    curve = legs[0]
    for leg in legs[1:]:
        curve = curve.unionByName(leg)
    return (
        curve.crossJoin(F.broadcast(tr))
        .select(
            "bands",
            "rows_per_band",
            "n_candidates",
            "n_verified",
            "n_true",
            F.expr(
                "CAST(CASE WHEN n_candidates = 0 THEN 0"
                " ELSE n_verified * 1000000 DIV n_candidates END AS BIGINT)"
            ).alias("precision_ppm"),
            F.expr(
                "CAST(CASE WHEN n_true = 0 THEN 0"
                " ELSE n_verified * 1000000 DIV n_true END AS BIGINT)"
            ).alias("recall_ppm"),
        )
        .orderBy("bands")
    )


def lsh_band_tuning_curve_oracle_sql(
    k: int = MINHASH_K,
    bands_list: tuple[int, ...] = LSH_TUNING_BANDS,
    n: int = 3,
    threshold: float = 0.2,
) -> str:
    true = ngram_jaccard_pairs_oracle_sql(n, threshold)
    legs = []
    for bands in bands_list:
        cand = minhash_lsh_candidates_md5_oracle_sql(k, bands, n)
        ver = lsh_verified_pairs_oracle_sql(k, bands, n, threshold)
        legs.append(
            f"""SELECT CAST({bands} AS INTEGER) AS bands,
       CAST({k // bands} AS INTEGER) AS rows_per_band,
       (SELECT CAST(count(*) AS BIGINT) FROM ({cand})) AS n_candidates,
       (SELECT CAST(count(*) AS BIGINT) FROM ({ver})) AS n_verified"""
        )
    union = " UNION ALL ".join(f"({leg})" for leg in legs)
    return f"""
WITH curve AS ({union}),
tr AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM ({true}))
SELECT bands, rows_per_band, n_candidates, n_verified, n_true,
       CAST(CASE WHEN n_candidates = 0 THEN 0
            ELSE n_verified * 1000000 // n_candidates END AS BIGINT)
         AS precision_ppm,
       CAST(CASE WHEN n_true = 0 THEN 0
            ELSE n_verified * 1000000 // n_true END AS BIGINT)
         AS recall_ppm
FROM curve CROSS JOIN tr ORDER BY bands"""


def source_dedup_matrix(
    docs: DataFrame,
    k: int = MINHASH_K,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Cross-source copy matrix over VERIFIED near-duplicate pairs: for
    every source pair (a <= b), how many exact-Jaccard-verified near-dup
    links connect them — the provenance table that says which sources
    mirror which (a crawl re-ingesting another source's dump shows up as
    a hot off-diagonal row; template boilerplate shows up on the
    diagonal), so the canonical-keep policy can prefer upstream sources.
    Exact-hash grouping would be the cheap variant, but this corpus (like
    real post-dedup crawls) has near-zero verbatim copies — the near-dup
    graph is where cross-source structure lives.

    Uses bands=4 of the k=8 signature (r=2, the high-recall config from
    lsh_band_tuning_curve). Scale shape (100 TB): the pair frame is the
    already-bounded LSH+verify pipeline; attaching sources is two
    doc_id-keyed joins carrying O(verified pairs) rows; the rollup is at
    most |sources|^2 rows."""
    pairs = ngram_jaccard_verify(
        docs, minhash_lsh_candidates_md5(docs, k, bands, n), n, threshold
    ).select("doc_a", "doc_b")
    src = docs.select("doc_id", "source")
    labeled = (
        pairs.join(src.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("source", "source_a")
        .join(
            src.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "source", "source_b"
            ),
            "doc_b",
        )
    )
    return (
        labeled.select(
            F.least("source_a", "source_b").alias("src_a"),
            F.greatest("source_a", "source_b").alias("src_b"),
        )
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("src_a", "src_b")
    )


def source_dedup_matrix_oracle_sql(
    k: int = MINHASH_K,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.2,
) -> str:
    ver = lsh_verified_pairs_oracle_sql(k, bands, n, threshold)
    return f"""
WITH vp AS ({ver}),
labeled AS (
  SELECT least(da.source, db.source) AS src_a,
         greatest(da.source, db.source) AS src_b
  FROM vp
  JOIN documents da ON da.doc_id = vp.doc_a
  JOIN documents db ON db.doc_id = vp.doc_b
)
SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_pairs
FROM labeled GROUP BY src_a, src_b ORDER BY src_a, src_b"""


def dedup_cost_planner(
    docs: DataFrame,
    k: int = MINHASH_K,
    bands_list: tuple[int, ...] = LSH_TUNING_BANDS,
    n: int = 3,
) -> DataFrame:
    """LSH shuffle-cost planner: per band config, the bucket-size
    histogram (log2 buckets) with the implied candidate-pair mass
    ``sum(s*(s-1)/2)`` — the number the verify stage will actually pay.
    :func:`lsh_band_tuning_curve` measures QUALITY (precision/recall);
    this measures COST SKEW: a single 2^20-doc bucket implies ~5e11
    pairs from one key, which is the "viral boilerplate" failure mode
    ``max_bucket_size`` exists to cap — this table says whether the cap
    is needed and where to set it, BEFORE the run.

    All integer. Scale shape (100 TB): per config, one banded-key shuffle
    into bucket sizes (collect_set is replaced by a plain count — the
    planner never materializes member arrays, so it is STRICTLY cheaper
    than the pipeline it plans), then a |configs| x ~32-row histogram
    rollup."""
    legs = []
    for bands in bands_list:
        sig = minhash_signatures(docs, k, n).filter(F.col("mh0").isNotNull())
        rows_per_band = k // bands
        band_cols = [
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"mh{b * rows_per_band + r}")
                        for r in range(rows_per_band)
                    ],
                )
            ).alias(f"band{b}")
            for b in range(bands)
        ]
        melted = sig.select("doc_id", *band_cols).select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band_idx"),
                            F.col(f"band{b}").alias("key"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bk")
        ).select("bk.band_idx", "bk.key")
        sizes = melted.groupBy("band_idx", "key").agg(
            F.count(F.lit(1)).alias("s")
        )
        legs.append(
            sizes.select(
                F.lit(bands).cast("int").alias("bands"),
                "s",
                F.expr(
                    "CAST(CASE WHEN s = 1 THEN 0"
                    " ELSE length(bin(s - 1)) END AS INT)"
                ).alias("size_log2"),
            )
        )
    fanned = legs[0]
    for leg in legs[1:]:
        fanned = fanned.unionByName(leg)
    return (
        fanned.groupBy("bands", "size_log2")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("s").cast("long").alias("n_entries"),
            F.sum(F.expr("s * (s - 1) div 2")).cast("long").alias(
                "implied_pairs"
            ),
        )
        .orderBy("bands", "size_log2")
    )


def dedup_cost_planner_oracle_sql(
    k: int = MINHASH_K,
    bands_list: tuple[int, ...] = LSH_TUNING_BANDS,
    n: int = 3,
) -> str:
    legs = []
    for bands in bands_list:
        rows_per_band = k // bands
        band_keys = ", ".join(
            "md5("
            + " || '|' || ".join(
                f"mh{b * rows_per_band + r}" for r in range(rows_per_band)
            )
            + f") AS band{b}"
            for b in range(bands)
        )
        melt = " UNION ALL ".join(
            f"SELECT {b} AS band_idx, band{b} AS key FROM banded_{bands}"
            for b in range(bands)
        )
        legs.append(
            f"""banded_{bands} AS (
  SELECT {band_keys} FROM sig WHERE mh0 IS NOT NULL
), sizes_{bands} AS (
  SELECT band_idx, key, CAST(count(*) AS BIGINT) AS s
  FROM ({melt}) GROUP BY band_idx, key
), leg_{bands} AS (
  SELECT CAST({bands} AS INTEGER) AS bands, s,
         CAST(CASE WHEN s = 1 THEN 0
              ELSE length(bin(s - 1)) - position('1' IN bin(s - 1)) + 1
              END AS INTEGER) AS size_log2
  FROM sizes_{bands}
)"""
        )
    union = " UNION ALL ".join(
        f"SELECT * FROM leg_{bands}" for bands in bands_list
    )
    sig = minhash_signatures_oracle_sql(k, n)
    return f"""
WITH sig AS ({sig}),
{", ".join(legs)}
SELECT bands, size_log2,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(sum(s) AS BIGINT) AS n_entries,
       CAST(sum(s * (s - 1) // 2) AS BIGINT) AS implied_pairs
FROM ({union}) GROUP BY bands, size_log2 ORDER BY bands, size_log2"""


def dedup_survival_by_length(
    docs: DataFrame,
    k: int = MINHASH_K,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Dedup survivorship by document LENGTH band — the composition audit
    that catches a silent length bias in the dedup policy (boilerplate
    and templates cluster short; if the keep rule also favors short docs,
    the surviving corpus quietly loses its long-document mass, which is
    exactly what long-context training needs most). Per log2 length band:
    documents, near-dup-group members, survivors under the canonical
    min-doc_id keep, and survival in exact ppm for docs AND tokens.

    Survivors = docs minus non-canonical members of verified near-dup
    groups (connected components of the LSH+verify pair graph, the
    dedup_pipeline_report contract, bands=4 high-recall config).

    Scale shape (100 TB): the pair graph is the bounded LSH pipeline; the
    component fold is dedup_groups' label propagation (localCheckpoint
    rounds); banding is codegen'd bit arithmetic on n_chars — NO quantile
    sort anywhere (an NTILE here would be a corpus-wide single sort);
    the rollup is one map-side-combined groupBy over ~20 bands."""
    pairs = ngram_jaccard_verify(
        docs, minhash_lsh_candidates_md5(docs, k, bands, n), n, threshold
    ).select("doc_a", "doc_b")
    groups = dedup_groups(pairs)  # (doc_id, group_id = min doc in comp)
    tok = docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
        F.expr(
            "CAST(CASE WHEN n_chars <= 0 THEN 0"
            " ELSE length(bin(n_chars)) END AS INT)"
        ).alias("len_band"),
    )
    labeled = tok.join(groups, "doc_id", "left").select(
        "len_band",
        "n_tokens",
        F.col("group_id").isNotNull().alias("in_group"),
        # canonical keep: group members survive iff they ARE the label
        (
            F.col("group_id").isNull()
            | (F.col("group_id") == F.col("doc_id"))
        ).alias("kept"),
    )
    return (
        labeled.groupBy("len_band")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("in_group").cast("long")).alias("n_in_dup_groups"),
            F.sum(F.col("kept").cast("long")).alias("n_kept"),
            F.sum("n_tokens").alias("tokens"),
            F.sum(F.when(F.col("kept"), F.col("n_tokens")).otherwise(0))
            .cast("long")
            .alias("tokens_kept"),
        )
        .select(
            "len_band",
            "n_docs",
            "n_in_dup_groups",
            "n_kept",
            "tokens",
            "tokens_kept",
            F.expr(
                "CAST(n_kept * CAST(1000000 AS BIGINT) div n_docs"
                " AS BIGINT)"
            ).alias("doc_survival_ppm"),
            F.expr(
                "CAST(CASE WHEN tokens = 0 THEN 0 ELSE"
                " tokens_kept * CAST(1000000 AS BIGINT) div tokens END"
                " AS BIGINT)"
            ).alias("token_survival_ppm"),
        )
        .orderBy("len_band")
    )


def dedup_survival_by_length_oracle_sql(
    k: int = MINHASH_K,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.2,
) -> str:
    ver = lsh_verified_pairs_oracle_sql(k, bands, n, threshold)
    return f"""
WITH vp AS ({ver}),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM vp
  UNION ALL SELECT doc_b, doc_a FROM vp
),
comp AS (
  -- connected components as min-reachable-doc labels (recursive closure;
  -- fine at oracle scale — the Spark side exists because this isn't)
  WITH RECURSIVE reach(node, lbl) AS (
    SELECT a, a FROM (SELECT DISTINCT a FROM edges)
    UNION
    SELECT e.a, r.lbl FROM edges e JOIN reach r ON e.b = r.node
  )
  SELECT node AS doc_id, min(lbl) AS group_id FROM reach GROUP BY node
),
tok AS (
  SELECT doc_id,
         CASE WHEN length(trim(lower(text))) = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(len(regexp_split_to_array(trim(lower(text)),
                   '\\s+')) AS BIGINT) END AS n_tokens,
         CAST(CASE WHEN n_chars <= 0 THEN 0
              ELSE length(bin(n_chars))
                   - position('1' IN bin(n_chars)) + 1 END AS INTEGER)
           AS len_band
  FROM documents
),
labeled AS (
  SELECT t.len_band, t.n_tokens,
         c.group_id IS NOT NULL AS in_group,
         (c.group_id IS NULL OR c.group_id = t.doc_id) AS kept
  FROM tok t LEFT JOIN comp c USING (doc_id)
)
SELECT len_band,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN in_group THEN 1 ELSE 0 END) AS BIGINT)
         AS n_in_dup_groups,
       CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(n_tokens) AS BIGINT) AS tokens,
       CAST(sum(CASE WHEN kept THEN n_tokens ELSE 0 END) AS BIGINT)
         AS tokens_kept,
       CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) * 1000000 // count(*)
            AS BIGINT) AS doc_survival_ppm,
       CAST(CASE WHEN sum(n_tokens) = 0 THEN 0 ELSE
            sum(CASE WHEN kept THEN n_tokens ELSE 0 END) * 1000000
            // sum(n_tokens) END AS BIGINT) AS token_survival_ppm
FROM labeled GROUP BY len_band ORDER BY len_band"""


def containment_superset_pairs(
    docs: DataFrame, t_ppm: int = 500_000, k: int = 20, shingle_n: int = 3
) -> DataFrame:
    """ASYMMETRIC set-similarity join: shingle CONTAINMENT
    ``C(a in b) = |S(a) ∩ S(b)| / |S(a)| >= t`` — the quotation /
    subsumption detector. Jaccard and MinHash are symmetric: a short
    document wholly embedded in a long one scores LOW on both (the union
    dominates), which is exactly the doc-inside-doc case a curation
    pipeline wants flagged (quote expansions, concatenated crawls,
    prompt-wrapped copies). Containment divides by the SMALL side only.
    Emits the top-``k`` ordered (contained, container) pairs with exact
    ppm containment.

    Scale shape (100 TB): one distinct (doc, shingle) shuffle; the
    candidate join keys shingles against shingles — fanout is per-shingle
    posting frequency, which real text keeps near 1 (3-gram space is
    enormous); a size prefilter (|b| >= t*|a| is implied by containment
    only through the intersection, so no symmetric size cut exists — the
    asymmetry is the point) is replaced by the posting bound itself.
    Verification counts intersections only for candidate pairs. The
    31-word synthetic vocabulary keeps unigram sets degenerate (every doc
    contains most tokens) — shingles restore sparsity, which is also why
    production containment joins run on shingles, not tokens."""
    st = (
        docs.select(
            "doc_id",
            F.explode(
                word_shingles(tokens(F.col("text")), shingle_n)
            ).alias("s"),
        )
        .distinct()
        .localCheckpoint()
    )
    sizes = st.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    cand = (
        st.alias("a")
        .join(
            st.alias("b"),
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("contained"),
            F.col("b.doc_id").alias("container"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("contained"), F.col("sz").alias("size_contained")
    )
    sb = sizes.select(
        F.col("doc_id").alias("container"), F.col("sz").alias("size_container")
    )
    return (
        cand.join(sa, "contained")
        .join(sb, "container")
        .withColumn(
            "containment_ppm",
            F.expr("CAST(n_inter * 1000000 div size_contained AS BIGINT)"),
        )
        .filter(F.col("containment_ppm") >= t_ppm)
        .select(
            "contained",
            "container",
            F.col("n_inter").cast("long").alias("n_inter"),
            F.col("size_contained").cast("long").alias("size_contained"),
            F.col("size_container").cast("long").alias("size_container"),
            "containment_ppm",
        )
        .orderBy(
            F.desc("containment_ppm"), F.asc("contained"), F.asc("container")
        )
        .limit(k)
    )


def containment_superset_pairs_oracle_sql(
    t_ppm: int = 500_000, k: int = 20, shingle_n: int = 3
) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS w
  FROM documents WHERE length(trim(lower(text))) > 0
), st AS (
  SELECT DISTINCT doc_id,
         array_to_string(w[t.i + 1:t.i + {shingle_n}], ' ') AS s
  FROM toks,
       LATERAL unnest(generate_series(0, len(w) - {shingle_n})) AS t(i)
  WHERE len(w) >= {shingle_n}
), sizes AS (
  SELECT doc_id, count(*) AS sz FROM st GROUP BY doc_id
), cand AS (
  SELECT a.doc_id AS contained, b.doc_id AS container,
         count(*) AS n_inter
  FROM st a JOIN st b ON a.s = b.s AND a.doc_id <> b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT contained, container,
       CAST(n_inter AS BIGINT) AS n_inter,
       CAST(sa.sz AS BIGINT) AS size_contained,
       CAST(sb.sz AS BIGINT) AS size_container,
       CAST(n_inter * 1000000 // sa.sz AS BIGINT) AS containment_ppm
FROM cand
JOIN sizes sa ON cand.contained = sa.doc_id
JOIN sizes sb ON cand.container = sb.doc_id
WHERE n_inter * 1000000 // sa.sz >= {t_ppm}
ORDER BY containment_ppm DESC, contained ASC, container ASC
LIMIT {k}"""

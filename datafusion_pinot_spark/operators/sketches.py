"""Theta-style distinct sketches (KMV — k minimum hash values).

Pinot serves DISTINCTCOUNTTHETASKETCH for set-expression cardinalities
("users who did A AND B") from mergeable sketches; the Datasketches
binaries are engine-specific, so this module implements the underlying
KMV estimator with an md5 hash family both Spark and DuckDB can compute
— every stage is deterministic, which makes the whole sketch pipeline
hash-checkable, exactly like the repo's md5 MinHash family (an xxhash64
swap is the one-line production change, as there).

Math (Beyer et al. 2007 / theta sketches, public): hash keys to 60-bit
values; keep the k smallest per group. With h_k the k-th smallest,
distinct ≈ (k-1) * 2^60 / h_k (exact count when the group holds < k
distinct hashes). For an intersection, theta = min(h_k(A), h_k(B)) and
distinct(A∩B) ≈ |{h ∈ A∩B : h < theta}| * 2^60 / theta.

Representation trick that keeps both engines bit-identical: hashes stay
15-char fixed-length lowercase HEX STRINGS end to end — lexicographic
order equals numeric order, so ranking, joins, max and theta comparisons
all run on strings; only the single theta value per estimate converts to
a number (Spark ``conv``; DuckDB a 15-digit polynomial), feeding one
IEEE division both engines perform on identical operands.

Scale design (100 TB): sketch construction is one map-side-combined
distinct + a per-group top-k window; sketches are k rows per group
forever after, so set expressions join k-row sides (broadcast). This is
the query-side twin of the storage layer's HLL sketch columns
(COVERAGE §2.1): HLL gives cheap unions, KMV/theta adds INTERSECTIONS,
which HLL cannot answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

HASH_BITS = 60
HASH_SPACE = float(1 << HASH_BITS)
# lexicographically above every 15-char hex string: the "sketch not full,
# nothing truncated" theta sentinel
THETA_OPEN = "g"


def _h15(col) -> "F.Column":
    return F.substring(F.md5(col.cast("string")), 1, 15)


def _num(hex_or_open) -> "F.Column":
    return (
        F.when(hex_or_open == THETA_OPEN, F.lit(HASH_SPACE))
        .otherwise(F.conv(hex_or_open, 16, 10).cast("long").cast("double"))
    )


def kmv_sketch(df: DataFrame, group_col: str, key_col: str, k: int) -> DataFrame:
    """(grp, rank, h): the k smallest distinct key hashes per group."""
    hashed = df.select(
        F.col(group_col).alias("grp"), _h15(F.col(key_col)).alias("h")
    ).distinct()
    w = Window.partitionBy("grp").orderBy(F.asc("h"))
    return (
        hashed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("grp", "rank", "h")
    )


def kmv_intersection_estimate(
    sketch: DataFrame, grp_a: str, grp_b: str, k: int
) -> DataFrame:
    """One row (grp_a, grp_b, est_a, est_b, est_intersection) computed
    from the two groups' k-row sketches alone — no raw-data rescan."""
    def bounds(grp, suffix):
        return (
            sketch.filter(F.col("grp") == grp)
            .groupBy()
            .agg(
                F.count(F.lit(1)).alias(f"n_{suffix}"),
                F.when(F.count(F.lit(1)) < k, F.lit(THETA_OPEN))
                .otherwise(F.max("h"))
                .alias(f"theta_{suffix}"),
            )
        )

    both = bounds(grp_a, "a").crossJoin(bounds(grp_b, "b"))
    inter = (
        sketch.filter(F.col("grp") == grp_a)
        .select("h")
        .join(sketch.filter(F.col("grp") == grp_b).select("h"), "h")
    )
    theta_str = F.least(F.col("theta_a"), F.col("theta_b"))
    n_i = (
        inter.crossJoin(F.broadcast(both))
        .filter(F.col("h") < theta_str)
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n_i"))
    )
    base = both.join(F.broadcast(n_i), F.lit(True), "left")

    def est(n, theta):
        return F.when(theta == THETA_OPEN, n.cast("double")).otherwise(
            F.lit(float(k - 1)) * F.lit(HASH_SPACE) / _num(theta)
        )

    est_i = (
        F.coalesce(F.col("n_i"), F.lit(0)).cast("double")
        * F.lit(HASH_SPACE)
        / _num(theta_str)
    )
    return base.select(
        F.lit(grp_a).alias("grp_a"),
        F.lit(grp_b).alias("grp_b"),
        F.round(est(F.col("n_a"), F.col("theta_a")), 4).alias("est_a"),
        F.round(est(F.col("n_b"), F.col("theta_b")), 4).alias("est_b"),
        F.round(est_i, 4).alias("est_intersection"),
    )


def theta_intersection_oracle_sql(
    table: str, group_col: str, key_col: str, grp_a: str, grp_b: str, k: int
) -> str:
    def num(expr):
        # 15-hex-digit polynomial, exact in BIGINT (< 2^60), with the
        # open-theta sentinel mapping to the full hash space
        poly = " + ".join(
            f"(strpos('0123456789abcdef', substr({expr}, {i + 1}, 1)) - 1)"
            f" * {16 ** (14 - i)}"
            for i in range(15)
        )
        return (
            f"CASE WHEN {expr} = '{THETA_OPEN}' THEN {HASH_SPACE} "
            f"ELSE CAST({poly} AS DOUBLE) END"
        )

    kk = float(k - 1)
    return f"""
WITH hashed AS (
  SELECT DISTINCT {group_col} AS grp,
         substr(md5(CAST({key_col} AS VARCHAR)), 1, 15) AS h
  FROM {table} WHERE {group_col} IN ('{grp_a}', '{grp_b}')),
sk AS (
  SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h ASC) AS rank
  FROM hashed QUALIFY rank <= {k}),
ba AS (
  SELECT count(*) AS n_a,
         CASE WHEN count(*) < {k} THEN '{THETA_OPEN}' ELSE max(h) END AS theta_a
  FROM sk WHERE grp = '{grp_a}'),
bb AS (
  SELECT count(*) AS n_b,
         CASE WHEN count(*) < {k} THEN '{THETA_OPEN}' ELSE max(h) END AS theta_b
  FROM sk WHERE grp = '{grp_b}'),
ni AS (
  SELECT count(*) AS n_i
  FROM (SELECT h FROM sk WHERE grp = '{grp_a}') x
  JOIN (SELECT h FROM sk WHERE grp = '{grp_b}') y USING (h)
  CROSS JOIN ba CROSS JOIN bb
  WHERE h < least(theta_a, theta_b))
SELECT '{grp_a}' AS grp_a, '{grp_b}' AS grp_b,
       round(CASE WHEN theta_a = '{THETA_OPEN}' THEN CAST(n_a AS DOUBLE)
             ELSE {kk} * {HASH_SPACE} / ({num('theta_a')}) END, 4) AS est_a,
       round(CASE WHEN theta_b = '{THETA_OPEN}' THEN CAST(n_b AS DOUBLE)
             ELSE {kk} * {HASH_SPACE} / ({num('theta_b')}) END, 4) AS est_b,
       round(CAST(n_i AS DOUBLE) * {HASH_SPACE}
             / ({num("least(theta_a, theta_b)")}), 4) AS est_intersection
FROM ba CROSS JOIN bb CROSS JOIN ni
"""


CMS_DEPTH = 4  # hash rows
CMS_WIDTH = 1024  # buckets per row
CMS_PROBE_K = 20  # audited tokens (top by true frequency)


def _cms_pos(col, r: int, w: int):
    """Count-min bucket for hash row r: 48-bit md5-prefix integer mod w
    (exact in BIGINT; DuckDB twin is the strpos polynomial)."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"c{r}|"), col)), 1, 12), 16, 10)
        .cast("long")
        % w
    )


def _cms_pos_sql(expr: str, r: int, w: int) -> str:
    h = f"md5('c{r}|' || {expr})"
    poly = " + ".join(
        f"(CAST(strpos('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1"
        f" AS BIGINT) * {16 ** (12 - 1 - i)})"
        for i in range(12)
    )
    return f"(({poly}) % {w})"


def cms_frequency_audit(
    docs: DataFrame,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    probe_k: int = CMS_PROBE_K,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005, public) frequency
    estimation audited against exact counts: build a depth x width CMS
    over the corpus word-3-gram stream (every occurrence, not per-doc
    distinct — the heavy-hitter phrase workload; single tokens would be
    degenerate on this corpus's 31-word vocabulary), then for the
    top-``probe_k`` true-frequency grams report the exact count, the CMS
    estimate
    (min over rows of the hashed bucket's mass), and the overestimate —
    CMS never underestimates, so ``over_est >= 0`` row-by-row (pinned in
    tests). This is the sizing table for the streaming heavy-hitter path:
    it says whether width is adequate BEFORE deploying the sketch.

    All integer; md5 hash family for the cross-engine gate (xxhash64 is
    the production swap, as with MinHash).

    Scale shape (100 TB): token counts are one map-side-combined groupBy
    (O(vocab) rows out); the sketch is a depth-way constant fanout of that
    frame into a (row, bucket) rollup of AT MOST depth*width rows — a
    fixed-size table (32 KB here) that broadcasts to the probe join. The
    probe set is a TakeOrdered top-k, never a global sort. Nothing in the
    plan grows with corpus size except the first groupBy."""
    from datafusion_pinot_spark.functions import tokens

    toks = docs.select(tokens(F.col("text")).alias("w")).filter(
        F.size("w") >= 3
    )
    grams = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("w") - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at("w", i),
                    F.element_at("w", i + 1),
                    F.element_at("w", i + 2),
                ),
            )
        ).alias("tok")
    )
    tf = grams.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    buckets = (
        tf.select(
            "cnt",
            F.posexplode(
                F.array(*[_cms_pos(F.col("tok"), r, width) for r in range(depth)])
            ).alias("r", "pos"),
        )
        .groupBy("r", "pos")
        .agg(F.sum("cnt").alias("bucket_cnt"))
    )
    probe = tf.orderBy(F.desc("cnt"), F.asc("tok")).limit(probe_k)
    probed = probe.select(
        "tok",
        "cnt",
        F.posexplode(
            F.array(*[_cms_pos(F.col("tok"), r, width) for r in range(depth)])
        ).alias("r", "pos"),
    )
    est = (
        probed.join(F.broadcast(buckets), ["r", "pos"])
        .groupBy("tok", "cnt")
        .agg(F.min("bucket_cnt").alias("cms_est"))
    )
    return est.select(
        F.col("tok").alias("gram"),
        F.col("cnt").alias("true_cnt"),
        "cms_est",
        (F.col("cms_est") - F.col("cnt")).alias("over_est"),
        F.expr(
            "CAST((cms_est - cnt) * CAST(1000000 AS BIGINT) div cnt AS BIGINT)"
        ).alias("over_ppm"),
    ).orderBy(F.desc("true_cnt"), F.asc("gram"))


def cms_frequency_audit_oracle_sql(
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    probe_k: int = CMS_PROBE_K,
) -> str:
    bucket_rows = " UNION ALL ".join(
        f"SELECT {r} AS r, {_cms_pos_sql('tok', r, width)} AS pos, cnt FROM tf"
        for r in range(depth)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT tok, cnt, {r} AS r, {_cms_pos_sql('tok', r, width)} AS pos"
        " FROM probe"
        for r in range(depth)
    )
    return f"""
WITH words AS (
  SELECT regexp_split_to_array(trim(lower(text)), '\\s+') AS w
  FROM documents WHERE length(trim(lower(text))) > 0
), grams AS (
  SELECT w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS tok
  FROM words, LATERAL unnest(range(0, greatest(len(w) - 2, 0))) AS t(i)
  WHERE len(w) >= 3
), tf AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM grams GROUP BY tok
), fanned AS (
  {bucket_rows}
), buckets AS (
  SELECT r, pos, CAST(sum(cnt) AS BIGINT) AS bucket_cnt
  FROM fanned GROUP BY r, pos
), probe AS (
  SELECT tok, cnt FROM tf ORDER BY cnt DESC, tok ASC LIMIT {probe_k}
), probed AS (
  {probe_rows}
), est AS (
  SELECT p.tok, p.cnt, min(b.bucket_cnt) AS cms_est
  FROM probed p JOIN buckets b USING (r, pos)
  GROUP BY p.tok, p.cnt
)
SELECT tok AS gram, cnt AS true_cnt, cms_est,
       cms_est - cnt AS over_est,
       CAST((cms_est - cnt) * 1000000 // cnt AS BIGINT) AS over_ppm
FROM est ORDER BY true_cnt DESC, gram ASC"""

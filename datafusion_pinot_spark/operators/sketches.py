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


HLL_BUCKETS = 64  # m = 2^6
HLL_REST_BITS = 42  # 48-bit md5 slice minus the 6 bucket bits
# alpha_64 = 0.7213 / (1 + 1.079/64), in ppm (Flajolet et al. 2007's
# published bias constant for m = 64) — an integer so the whole estimate
# stays in exact arithmetic
HLL_ALPHA_PPM = 709_363


def _hll_registers(keyed: DataFrame) -> DataFrame:
    """(bucket, register) from a one-column frame ``k`` (string): md5 ->
    48-bit int; low 6 bits pick the bucket, the leading-zero count of the
    remaining 42 bits (+1) is the candidate register, and the register is
    the per-bucket MAX — the standard HLL update, expressed entirely in
    engine-portable integer ops (floor-log2 via binary-string LENGTH, the
    same trick as graph.degree_distribution; no clz builtin needed)."""
    v = F.conv(F.substring(F.md5(F.col("k")), 1, 12), 16, 10).cast("long")
    hashed = keyed.select(v.alias("v"))
    slotted = hashed.select(
        (F.col("v") % HLL_BUCKETS).cast("int").alias("bucket"),
        F.expr(f"v div {HLL_BUCKETS}").alias("rest"),
    )
    rho = (
        F.when(F.col("rest") == 0, F.lit(HLL_REST_BITS + 1))
        .otherwise(F.lit(HLL_REST_BITS + 1) - F.length(F.bin(F.col("rest"))))
        .cast("long")
    )
    return (
        slotted.select("bucket", rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("register"))
    )


def hll_from_scratch_estimate(events: DataFrame) -> DataFrame:
    """HyperLogLog built FROM SCRATCH under the full hash gate — not the
    engine's sketch (pinot_hll_sketch_rollup exercises that, rows-only by
    necessity): every internal of the algorithm is re-derived by DuckDB —
    the md5-keyed bucket/rho split, the 64 max-registers, and the raw
    estimate itself, computed in exact arithmetic by writing
    ``sum(2^-M_j)`` as the integer ``S = sum(2^(43-M_j))`` over scale
    2^43, so ``E = alpha * m^2 * 2^43 / S`` is one decimal(38,0)
    multiply chain and one exact integral division (the halflife
    pattern). Emits the 64-row register table (bucket >= 0) plus one
    summary row (bucket = -1): raw estimate, true distinct count, and
    the signed error in ppm — the sketch's accuracy is itself
    hash-checked, not asserted. The production small-range (linear
    counting) correction needs ln() — transcendental, engine-unstable —
    so the RAW estimator is what's gated; n_empty in the summary row is
    what the correction would key on, and at the small SFs (15-150
    distinct users vs m = 64) it fires: the raw estimate biases high
    there BY DESIGN, identically in both engines — the gate checks the
    algorithm, and the n >> m accuracy regime is pinned by a
    2000-key pytest case instead (tests/test_round15.py).

    Scale shape (100 TB): one narrow hash map over the key stream, one
    map-side-combined groupBy into 64 groups — registers are the ONLY
    state, constant forever; the exact-distinct leg (the audit's ground
    truth) is the expensive side and exists to grade the cheap one."""
    keyed = events.select(F.col("user_id").cast("string").alias("k"))
    regs = _hll_registers(keyed).localCheckpoint(eager=False)
    exact = keyed.agg(F.countDistinct("k").alias("n_true"))
    scale = 1 << (HLL_REST_BITS + 1)
    summary = (
        regs.select("register")
        .unionByName(
            # empty buckets contribute 2^43 each (register 0); build the
            # missing-bucket count from the 64-row frame itself
            regs.agg(F.count(F.lit(1)).alias("present")).select(
                F.explode(
                    F.expr(
                        "array_repeat(CAST(0 AS BIGINT),"
                        f" CAST({HLL_BUCKETS} - present AS INT))"
                    )
                ).alias("register")
            ),
            allowMissingColumns=False,
        )
        .agg(
            F.sum(
                F.expr(f"CAST(1 AS DECIMAL(38,0)) * ({scale} div (CAST(1 AS BIGINT) << register))")
            ).alias("s"),
            F.sum(F.when(F.col("register") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_empty"),
        )
        .crossJoin(F.broadcast(exact))
        .select(
            F.lit(-1).cast("int").alias("bucket"),
            F.expr(
                f"CAST((CAST({HLL_ALPHA_PPM} AS DECIMAL(38,0))"
                f" * {HLL_BUCKETS} * {HLL_BUCKETS} * CAST({scale} AS DECIMAL(38,0)))"
                " div (s * 1000000) AS BIGINT)"
            ).alias("register_or_estimate"),
            "n_empty",
            F.col("n_true").cast("long").alias("n_true"),
        )
        .select(
            "bucket",
            "register_or_estimate",
            "n_empty",
            "n_true",
            F.expr(
                "CAST(CASE WHEN n_true > 0 THEN"
                " (register_or_estimate - n_true) * 1000000 div n_true"
                " ELSE 0 END AS BIGINT)"
            ).alias("err_ppm"),
        )
    )
    per_bucket = regs.select(
        F.col("bucket"),
        F.col("register").alias("register_or_estimate"),
        F.lit(0).cast("long").alias("n_empty"),
        F.lit(0).cast("long").alias("n_true"),
        F.lit(0).cast("long").alias("err_ppm"),
    )
    return per_bucket.unionByName(summary).orderBy("bucket")


def hll_from_scratch_estimate_oracle_sql() -> str:
    scale = 1 << (HLL_REST_BITS + 1)
    return f"""
WITH keyed AS (
  SELECT CAST(user_id AS VARCHAR) AS k FROM events
), hashed AS (
  SELECT CAST(('0x' || substr(md5(k), 1, 12)) AS BIGINT) AS v FROM keyed
), slotted AS (
  SELECT CAST(v % {HLL_BUCKETS} AS INTEGER) AS bucket,
         v // {HLL_BUCKETS} AS rest
  FROM hashed
), regs AS (
  SELECT bucket,
         CAST(max(CASE WHEN rest = 0 THEN {HLL_REST_BITS + 1}
                  ELSE {HLL_REST_BITS + 1} - length(bin(rest)) END)
              AS BIGINT) AS register
  FROM slotted GROUP BY bucket
), allb AS (
  SELECT CAST(t.b AS INTEGER) AS bucket
  FROM unnest(generate_series(0, {HLL_BUCKETS - 1})) AS t(b)
), padded AS (
  SELECT CAST(coalesce(r.register, 0) AS BIGINT) AS register
  FROM allb LEFT JOIN regs r ON allb.bucket = r.bucket
), s AS (
  SELECT CAST(sum(CAST({scale} AS HUGEINT)
                  // (CAST(1 AS HUGEINT) << register)) AS HUGEINT) AS s,
         CAST(sum(CASE WHEN register = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_empty
  FROM padded
), exact AS (
  SELECT CAST(count(DISTINCT k) AS BIGINT) AS n_true FROM keyed
), summary AS (
  SELECT CAST(-1 AS INTEGER) AS bucket,
         CAST((CAST({HLL_ALPHA_PPM} AS HUGEINT)
               * {HLL_BUCKETS} * {HLL_BUCKETS} * CAST({scale} AS HUGEINT))
              // (s * 1000000) AS BIGINT) AS register_or_estimate,
         n_empty, n_true
  FROM s, exact
)
SELECT bucket, register_or_estimate, n_empty, n_true,
       CAST(CASE WHEN n_true > 0 THEN
            (register_or_estimate - n_true) * 1000000 // n_true
            ELSE 0 END AS BIGINT) AS err_ppm
FROM summary
UNION ALL
SELECT bucket, register AS register_or_estimate,
       CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
FROM regs
ORDER BY bucket"""

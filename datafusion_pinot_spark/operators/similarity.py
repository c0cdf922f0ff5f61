"""Similarity search over embedding columns (embeddings table,
``embedding array<float>``).

Scale design (100 TB):

- *Brute force* is the correctness baseline: broadcast the (small) query set,
  score every candidate row (narrow map — no shuffle of the big side), then a
  per-query top-k via window rank over a shuffle keyed by query id. At k
  queries x N rows the scan is embarrassingly parallel; only k*N/top-k rows
  reach the shuffle after the rank pushes TakeOrdered down.
- *LSH-bucketed* (random hyperplanes, fixed seed): each row maps to a bucket
  code (narrow); queries probe only their bucket → candidates shrink by
  ~2^planes; exact cosine re-rank inside the bucket. Trades recall for a
  bounded candidate set; the standard IVF-ish scale path.

Dot products use built-in higher-order functions (zip_with/aggregate) —
JVM-side, no Python in the hot loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from datafusion_pinot_spark.functions import (
    as_double_array,
    cosine_similarity,
    dot,
    l2_norm,
)


def _cosine_with_norms(a, b, na, nb):
    """Cosine using precomputed norm columns — bit-identical to
    ``cosine_similarity`` (same fold + multiply, the norms are just cached
    as columns instead of re-folded per pair; interpreted HOF folds are the
    cost center, see SCALE.md §interpreted-lambdas)."""
    denom = na * nb
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(a, b) / denom)

EMBEDDING_DIM = 64
LSH_PLANES = 8
LSH_SEED = 0


def brute_force_topk(
    embeddings: DataFrame, query_ids: list[int], k: int = 10
) -> DataFrame:
    """Exact cosine top-k for each query vector (excluding self)."""
    emb = embeddings.select(
        "vec_id", as_double_array("embedding").alias("v")
    )
    queries = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("q_v")
    )
    scored = emb.crossJoin(F.broadcast(queries)).filter(
        F.col("vec_id") != F.col("q_id")
    )
    scored = scored.select(
        "q_id",
        "vec_id",
        F.round(cosine_similarity(F.col("q_v"), F.col("v")), 6).alias("sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "vec_id", "sim", "rnk")
    )


def brute_force_topk_oracle_sql(query_ids: list[int], k: int = 10) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
), q AS (
  SELECT vec_id AS q_id, v AS q_v FROM emb WHERE vec_id IN ({ids})
), scored AS (
  SELECT q.q_id, e.vec_id,
         round(CASE WHEN sqrt(list_sum(list_transform(q.q_v, x -> x*x)))
                         * sqrt(list_sum(list_transform(e.v, x -> x*x))) = 0 THEN 0.0
                    ELSE list_sum(list_transform(generate_series(1, len(e.v)), i -> q.q_v[i] * e.v[i]))
                         / (sqrt(list_sum(list_transform(q.q_v, x -> x*x)))
                            * sqrt(list_sum(list_transform(e.v, x -> x*x))))
               END, 6) AS sim
  FROM emb e CROSS JOIN q WHERE e.vec_id <> q.q_id
)
SELECT q_id, vec_id, sim, rnk FROM (
  SELECT q_id, vec_id, sim,
         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rnk
  FROM scored
) WHERE rnk <= {k}
"""


def _hyperplanes(dim: int, planes: int, seed: int):
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.randn(planes, dim)


def lsh_bucket_code(
    emb_col, dim: int = EMBEDDING_DIM, planes: int = LSH_PLANES, seed: int = LSH_SEED
):
    """Random-hyperplane bucket code (0..2^planes-1) as a column expression.

    The plane matrix is seeded and embedded as literals, so the bucketing is
    deterministic and JVM-evaluated (no Python worker round-trip).
    """
    H = _hyperplanes(dim, planes, seed)
    code = F.lit(0)
    for p in range(planes):
        plane = F.array(*[F.lit(float(x)) for x in H[p]])
        d = F.aggregate(
            F.zip_with(emb_col, plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda a, v: a + v,
        )
        code = code + F.when(d >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return code


def lsh_bucketed_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    planes: int = LSH_PLANES,
    seed: int = LSH_SEED,
    dim: int = EMBEDDING_DIM,
) -> DataFrame:
    """ANN top-k: probe only the query's LSH bucket, exact re-rank inside."""
    emb = embeddings.select(
        "vec_id", as_double_array("embedding").alias("v")
    ).withColumn(
        "bucket", lsh_bucket_code(F.col("v"), dim=dim, planes=planes, seed=seed)
    )
    queries = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("q_v"),
        F.col("bucket").alias("q_bucket"),
    )
    cand = emb.join(
        F.broadcast(queries),
        (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("q_id")),
    )
    scored = cand.select(
        "q_id",
        "vec_id",
        F.round(cosine_similarity(F.col("q_v"), F.col("v")), 6).alias("sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "vec_id", "sim", "rnk")
    )


def _bucketed_cte_sql(
    planes: int = LSH_PLANES, seed: int = LSH_SEED, dim: int = EMBEDDING_DIM
) -> str:
    """DuckDB CTEs computing the same LSH bucket code as ``lsh_bucket_code``.

    The hyperplane matrix is embedded as literals (same seed → same floats as
    the Spark side), and the dot product is a ``list_reduce`` left fold —
    bit-identical to Spark's ``F.aggregate`` fold, so the sign (and therefore
    the bucket) matches exactly, which makes the LSH queries hash-checkable.
    """
    H = _hyperplanes(dim, planes, seed)
    rows = ",\n    ".join(
        "({w}, [{vals}]::DOUBLE[])".format(
            w=1 << p, vals=", ".join(repr(float(x)) for x in H[p])
        )
        for p in range(planes)
    )
    return f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), planes AS (
  SELECT * FROM (VALUES
    {rows}
  ) AS t(w, h)
), bucketed AS (
  SELECT e.vec_id, first(e.v) AS v,
         CAST(sum(CASE WHEN list_reduce(
                 list_transform(generate_series(1, {dim}), i -> e.v[i] * p.h[i]),
                 (a, b) -> a + b) >= 0 THEN p.w ELSE 0 END) AS INT) AS bucket
  FROM emb e CROSS JOIN planes p
  GROUP BY e.vec_id
)"""


def _cosine_sql(a: str, b: str) -> str:
    """DuckDB cosine similarity mirroring ``cosine_similarity`` fold-for-fold."""
    def norm(v):
        return (
            f"sqrt(list_reduce(list_transform({v}, x -> x * x), (p, q) -> p + q))"
        )

    dot = (
        f"list_reduce(list_transform(generate_series(1, {EMBEDDING_DIM}),"
        f" i -> {a}[i] * {b}[i]), (p, q) -> p + q)"
    )
    return (
        f"CASE WHEN {norm(a)} * {norm(b)} = 0 THEN 0.0"
        f" ELSE {dot} / ({norm(a)} * {norm(b)}) END"
    )


def lsh_bucketed_topk_oracle_sql(query_ids: list[int], k: int = 10) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    sim = _cosine_sql("q.q_v", "e.v")
    return f"""{_bucketed_cte_sql()}
, q AS (
  SELECT vec_id AS q_id, v AS q_v, bucket AS q_bucket FROM bucketed
  WHERE vec_id IN ({ids})
), scored AS (
  SELECT q.q_id, e.vec_id, round({sim}, 6) AS sim
  FROM bucketed e JOIN q ON e.bucket = q.q_bucket AND e.vec_id <> q.q_id
)
SELECT q_id, vec_id, sim, rnk FROM (
  SELECT q_id, vec_id, sim,
         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rnk
  FROM scored
) WHERE rnk <= {k}
"""


def embedding_cosine_dup_pairs_oracle_sql(threshold: float = 0.95) -> str:
    sim = _cosine_sql("a.v", "b.v")
    return f"""{_bucketed_cte_sql()}
SELECT vec_a, vec_b, sim FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, round({sim}, 6) AS sim
  FROM bucketed a JOIN bucketed b
    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
) WHERE sim >= {threshold}
"""


def pack_embeddings_binary(embeddings: DataFrame) -> DataFrame:
    """array<float> → packed little-endian float32 BINARY — the compact
    at-scale embedding layout (dim×4 bytes/vector, no per-element
    dictionary; pairs with the sink's RAW BYTES var-byte chunks and the r6
    chunk-selective take, so a filtered read decompresses only matching
    chunks). Arrow-batched pandas UDF (numpy ``tobytes`` per batch), never
    row-at-a-time Python."""
    import pandas as pd  # noqa: F401 (pandas_udf import side)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _pack(v):
        import numpy as np

        return v.map(lambda a: np.asarray(a, dtype="<f4").tobytes())

    return embeddings.select(
        "vec_id", "label", _pack(F.col("embedding")).alias("emb_bin")
    )


def unpack_embeddings_binary(packed: DataFrame) -> DataFrame:
    """Inverse of :func:`pack_embeddings_binary`: BINARY → array<float>,
    bit-exact (float32 both ways)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<float>")
    def _unpack(b):
        import numpy as np

        return b.map(lambda x: np.frombuffer(x, dtype="<f4"))

    return packed.select(
        "vec_id", "label", _unpack(F.col("emb_bin")).alias("embedding")
    )


def embedding_binary_roundtrip_stats(
    spark, embeddings: DataFrame, table_dir: str
) -> DataFrame:
    """Embeddings through the binary storage path end-to-end: pack →
    RAW-BYTES pinot segments → read → unpack → per-label norm stats. A
    hash match against :func:`embedding_norm_stats_oracle_sql` (computed
    from the ORIGINAL floats) proves the packed layout is lossless."""
    import os

    from datafusion_pinot_spark.sources import register_pinot_source

    register_pinot_source(spark)
    out = os.path.join(table_dir, "emb_bin_OFFLINE")
    (
        pack_embeddings_binary(embeddings)
        .repartition(4)
        .write.format("pinot")
        .mode("overwrite")
        .option("raw", "emb_bin")
        .save(out)
    )
    back = unpack_embeddings_binary(spark.read.format("pinot").load(out))
    return embedding_norm_stats(back)


def embedding_norm_stats(embeddings: DataFrame) -> DataFrame:
    """Per-label embedding statistics (avg L2 norm, count)."""
    v = as_double_array("embedding")
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    return (
        embeddings.select("label", norm.alias("norm"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("norm"), 4).alias("avg_norm"),
            F.round(F.min("norm"), 4).alias("min_norm"),
            F.round(F.max("norm"), 4).alias("max_norm"),
        )
    )


def embedding_norm_stats_oracle_sql() -> str:
    return """
WITH n AS (
  SELECT label,
         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
  FROM embeddings
)
SELECT label, count(*) AS n, round(avg(norm), 4) AS avg_norm,
       round(min(norm), 4) AS min_norm, round(max(norm), 4) AS max_norm
FROM n GROUP BY label
"""


IVF_CENTROIDS = 16
IVF_NPROBE = 2


def _ivf_assignments(
    emb: DataFrame, n_centroids: int, centroids: DataFrame | None = None
) -> tuple[DataFrame, DataFrame]:
    """(centroids, assignments): centroids default to the first
    ``n_centroids`` vec_ids (deterministic, data-derived — a stand-in for a
    k-means pass; pass ``centroids`` with (c_id, c_v) from
    ``kmeans_centroids`` for the trained variant); every vector is assigned
    to its max-cosine centroid.

    Scale shape: centroids are tiny and broadcast; assignment is a narrow
    N×C map followed by a per-vector argmax — no shuffle of the big side
    beyond the window's hash partition on vec_id (at 100 TB: replace the
    window with a groupBy(vec_id).max_by, same shape).
    """
    emb_n = emb.select("vec_id", "v", l2_norm(F.col("v")).alias("nv"))
    if centroids is None:
        centroids = emb_n.filter(F.col("vec_id") < n_centroids).select(
            F.col("vec_id").alias("c_id"),
            F.col("v").alias("c_v"),
            F.col("nv").alias("c_nv"),
        )
    else:
        centroids = centroids.select(
            "c_id", "c_v", l2_norm(F.col("c_v")).alias("c_nv")
        )
    scored = emb_n.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "v",
        "nv",
        "c_id",
        _cosine_with_norms(
            F.col("v"), F.col("c_v"), F.col("nv"), F.col("c_nv")
        ).alias("c_sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("c_sim"), F.asc("c_id"))
    assigned = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("vec_id", "v", "nv", "c_id")
    )
    return centroids, assigned


def kmeans_centroids(
    embeddings: DataFrame,
    k: int = IVF_CENTROIDS,
    iters: int = 3,
    dim: int = EMBEDDING_DIM,
) -> DataFrame:
    """Lloyd's k-means over the embedding column, pure DataFrame ops — the
    offline trainer whose output feeds ``ivf_topk``-style inverted lists.

    Per iteration: centroids (k × dim doubles — tiny) broadcast against the
    full vector set (narrow map, no shuffle of the big side), per-vector
    argmin of squared L2 via window rank, then ONE shuffle on c_id where the
    new centroid is 64 codegen'd ``avg(v[i])`` aggregates (map-side partial
    avg — no array explode, no interpreted fold in the update step). Init is
    deterministic (first k vec_ids), so runs are reproducible up to
    float-sum partition order in the averages.

    The registered IVF *query* keeps static centroids so its DuckDB oracle
    stays non-iterative; this trainer is numpy-validated in tests instead.
    """
    emb = embeddings.select("vec_id", as_double_array("embedding").alias("v"))
    centroids = emb.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("c_id"), F.col("v").alias("c_v")
    )
    for _ in range(iters):
        d2 = F.aggregate(
            F.zip_with(F.col("v"), F.col("c_v"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda a, z: a + z,
        )
        scored = emb.crossJoin(F.broadcast(centroids)).select(
            "vec_id", "v", "c_id", d2.alias("d2")
        )
        w = Window.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("c_id"))
        assigned = (
            scored.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") == 1)
            .select("c_id", "v")
        )
        centroids = assigned.groupBy("c_id").agg(
            F.array(*[F.avg(F.col("v")[i]) for i in range(dim)]).alias("c_v")
        )
    return centroids.select("c_id", "c_v")


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = IVF_CENTROIDS,
    nprobe: int = IVF_NPROBE,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF ANN top-k: coarse-quantize to ``n_centroids`` inverted lists, probe
    the ``nprobe`` nearest lists per query, exact cosine re-rank inside.
    Pass ``centroids`` (from ``kmeans_centroids``) for trained lists."""
    emb = embeddings.select("vec_id", as_double_array("embedding").alias("v"))
    centroids, assigned = _ivf_assignments(emb, n_centroids, centroids)
    # The assignment subtree (crossJoin + argmax window) feeds BOTH the
    # query-probe branch and the candidate branch; materialize it once
    # instead of executing it twice. At scale the assignment would be a
    # stored inverted-list table anyway.
    assigned = assigned.localCheckpoint(eager=True)

    queries = assigned.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("q_v"),
        F.col("nv").alias("q_nv"),
    )
    qc = queries.crossJoin(F.broadcast(centroids)).select(
        "q_id",
        "q_v",
        "q_nv",
        "c_id",
        _cosine_with_norms(
            F.col("q_v"), F.col("c_v"), F.col("q_nv"), F.col("c_nv")
        ).alias("c_sim"),
    )
    wq = Window.partitionBy("q_id").orderBy(F.desc("c_sim"), F.asc("c_id"))
    probes = (
        qc.withColumn("p", F.row_number().over(wq))
        .filter(F.col("p") <= nprobe)
        .select("q_id", "q_v", "q_nv", "c_id")
    )

    cand = assigned.join(
        F.broadcast(probes),
        (assigned["c_id"] == probes["c_id"]) & (F.col("vec_id") != F.col("q_id")),
    )
    scored = cand.select(
        "q_id",
        "vec_id",
        F.round(
            _cosine_with_norms(
                F.col("q_v"), F.col("v"), F.col("q_nv"), F.col("nv")
            ),
            6,
        ).alias("sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "vec_id", "sim", "rnk")
    )


def ivf_topk_oracle_sql(
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = IVF_CENTROIDS,
    nprobe: int = IVF_NPROBE,
) -> str:
    """DuckDB mirror of ``ivf_topk``; argmax over bit-identical cosines (same
    left-fold arithmetic), so list assignment agrees exactly."""
    ids = ", ".join(str(i) for i in query_ids)
    sim_vc = _cosine_sql("e.v", "c.c_v")
    sim_qc = _cosine_sql("q.q_v", "c.c_v")
    sim_qe = _cosine_sql("p.q_v", "a.v")
    return f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), centroids AS (
  SELECT vec_id AS c_id, v AS c_v FROM emb WHERE vec_id < {n_centroids}
), assigned AS (
  SELECT vec_id, v, c_id FROM (
    SELECT e.vec_id, e.v, c.c_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {sim_vc} DESC, c.c_id ASC) AS rnk
    FROM emb e CROSS JOIN centroids c
  ) WHERE rnk = 1
), q AS (
  SELECT vec_id AS q_id, v AS q_v FROM emb WHERE vec_id IN ({ids})
), probes AS (
  SELECT q_id, q_v, c_id FROM (
    SELECT q.q_id, q.q_v, c.c_id,
           row_number() OVER (PARTITION BY q.q_id
                              ORDER BY {sim_qc} DESC, c.c_id ASC) AS p
    FROM q CROSS JOIN centroids c
  ) WHERE p <= {nprobe}
), scored AS (
  SELECT p.q_id, a.vec_id, round({sim_qe}, 6) AS sim
  FROM assigned a JOIN probes p ON a.c_id = p.c_id AND a.vec_id <> p.q_id
)
SELECT q_id, vec_id, sim, rnk FROM (
  SELECT q_id, vec_id, sim,
         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rnk
  FROM scored
) WHERE rnk <= {k}
"""


def ivf_index_build(
    spark,
    embeddings: DataFrame,
    index_dir: str,
    n_centroids: int = IVF_CENTROIDS,
    n_buckets_per_segment: int = 4,
) -> None:
    """Persist the IVF index through the pinot storage layer — the
    build-once/serve-many shape an ANN service runs at 100 TB, where the
    inverted lists are a stored table, not a per-query subtree:

    - ``ivf_assignments_OFFLINE``: (vec_id, c_id, v) range-partitioned and
      sorted by ``c_id``, so every segment covers a disjoint centroid range
      — a probe's ``c_id IN (...)`` filter zone-map-prunes whole segments
      at planning and sorted-range-slices within the survivors;
    - ``ivf_centroids_OFFLINE``: the (c_id, c_v) table (tiny; broadcast at
      query time).

    Embedding doubles round-trip bit-exactly through the MV DOUBLE
    dictionary, so :func:`ivf_index_topk` reproduces :func:`ivf_topk` (and
    its DuckDB oracle) result-for-result.
    """
    import os

    from datafusion_pinot_spark.sources import register_pinot_source

    register_pinot_source(spark)
    emb = embeddings.select("vec_id", as_double_array("embedding").alias("v"))
    centroids, assigned = _ivf_assignments(emb, n_centroids)
    n_parts = max(1, n_centroids // n_buckets_per_segment)
    (
        assigned.select("vec_id", "c_id", "v")
        .repartitionByRange(n_parts, "c_id")
        .sortWithinPartitions("c_id")
        .write.format("pinot")
        .mode("overwrite")
        .save(os.path.join(index_dir, "ivf_assignments_OFFLINE"))
    )
    (
        centroids.select("c_id", "c_v")
        .coalesce(1)
        .write.format("pinot")
        .mode("overwrite")
        .save(os.path.join(index_dir, "ivf_centroids_OFFLINE"))
    )


def ivf_index_topk(
    spark,
    index_dir: str,
    query_ids: list[int],
    k: int = 10,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """Serve ANN top-k from a persisted IVF index (:func:`ivf_index_build`).

    Probe planning mirrors a real index server: the (tiny) centroid table
    broadcasts, each query picks its ``nprobe`` nearest lists, and the
    probed ``c_id`` set — |queries| x nprobe values — is collected
    driver-side to become a PUSHED ``IN`` filter on the assignments table
    (index serving's planning step, not a data collect). The storage layer
    then does the candidate narrowing: zone maps drop segments whose
    centroid range holds no probed list, survivors binary-search the
    sorted ``c_id`` to a doc slice, and only candidate rows materialize.
    Scoring/tie-breaking expressions are identical to :func:`ivf_topk`, so
    the same DuckDB oracle checks this path end-to-end through storage.
    """
    import os

    from datafusion_pinot_spark.sources import register_pinot_source

    register_pinot_source(spark)

    def read_assignments():
        # fresh load per role: the query branch and the candidate branch
        # must be independent plans (a shared lineage would make the
        # candidate join a self-join — cf. ivf_topk's localCheckpoint)
        return (
            spark.read.format("pinot")
            .load(os.path.join(index_dir, "ivf_assignments_OFFLINE"))
            .select("vec_id", "c_id", "v", l2_norm(F.col("v")).alias("nv"))
        )

    assigned = read_assignments()
    centroids = (
        spark.read.format("pinot")
        .load(os.path.join(index_dir, "ivf_centroids_OFFLINE"))
        .select("c_id", "c_v", l2_norm(F.col("c_v")).alias("c_nv"))
    )
    queries = assigned.filter(F.col("vec_id").isin(list(query_ids))).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("q_v"),
        F.col("nv").alias("q_nv"),
    )
    qc = queries.crossJoin(F.broadcast(centroids)).select(
        "q_id",
        "q_v",
        "q_nv",
        "c_id",
        _cosine_with_norms(
            F.col("q_v"), F.col("c_v"), F.col("q_nv"), F.col("c_nv")
        ).alias("c_sim"),
    )
    wq = Window.partitionBy("q_id").orderBy(F.desc("c_sim"), F.asc("c_id"))
    probes = (
        qc.withColumn("p", F.row_number().over(wq))
        .filter(F.col("p") <= nprobe)
        .select("q_id", "q_v", "q_nv", "c_id")
    )
    probe_cids = sorted(
        r.c_id for r in probes.select("c_id").distinct().collect()
    )
    cand_base = read_assignments().filter(F.col("c_id").isin(probe_cids))
    cand = cand_base.join(
        F.broadcast(probes),
        (cand_base["c_id"] == probes["c_id"])
        & (cand_base["vec_id"] != probes["q_id"]),
    )
    scored = cand.select(
        "q_id",
        "vec_id",
        F.round(
            _cosine_with_norms(
                F.col("q_v"), F.col("v"), F.col("q_nv"), F.col("nv")
            ),
            6,
        ).alias("sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "vec_id", "sim", "rnk")
    )


def embedding_cosine_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    planes: int = LSH_PLANES,
    dim: int = EMBEDDING_DIM,
) -> DataFrame:
    """Near-duplicate detection by embedding cosine ≥ threshold, LSH-bucketed
    so candidate generation is not O(N^2): pairs must share a bucket."""
    emb = embeddings.select(
        "vec_id", as_double_array("embedding").alias("v")
    ).withColumn("bucket", lsh_bucket_code(F.col("v"), dim=dim, planes=planes))
    a, b = emb.alias("a"), emb.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    )
    return pairs.select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        F.round(cosine_similarity(F.col("a.v"), F.col("b.v")), 6).alias("sim"),
    ).filter(F.col("sim") >= threshold)

# ---------------------------------------------------------------------------
# Product quantization (IVF-PQ's compression half)
# ---------------------------------------------------------------------------
# PQ splits each dim-d vector into PQ_M subvectors and replaces each with
# the id of its nearest entry in a per-subspace codebook: 64 float32s
# (256 B) become PQ_M bytes (32x), and ADC (asymmetric distance
# computation) scores a query against millions of codes from an m x ksub
# lookup table without touching the original floats — the standard
# billion-scale ANN memory layout (Jegou et al. 2011, public).

PQ_M = 8  # subspaces
PQ_KSUB = 16  # codebook entries per subspace (4-bit codes)


def _sub_slices(col, m: int, dim: int):
    dsub = dim // m
    return F.array(*[F.slice(col, s * dsub + 1, dsub) for s in range(m)])


def _l2_sq(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )


def pq_codebooks_df(
    emb: DataFrame, m: int = PQ_M, ksub: int = PQ_KSUB, dim: int = EMBEDDING_DIM
) -> DataFrame:
    """Deterministic data-derived codebooks — entry ``code`` of subspace
    ``sub`` is the sub-vector of vec_id ``code`` (the non-iterative
    stand-in that keeps the query DuckDB-checkable, exactly like the IVF
    query's static centroids; ``pq_train`` is the Lloyd-trained
    production variant, numpy-validated in tests)."""
    return (
        emb.filter(F.col("vec_id") < ksub)
        .select(
            F.col("vec_id").cast("int").alias("code"),
            F.posexplode(_sub_slices(F.col("v"), m, dim)).alias("sub", "c_sub"),
        )
        .select("sub", "code", "c_sub")
    )


def pq_encode_engine(
    emb: DataFrame,
    codebooks: DataFrame,
    m: int = PQ_M,
    dim: int = EMBEDDING_DIM,
) -> DataFrame:
    """Engine-side PQ encode: (vec_id, sub, code) — per subspace, the
    codebook entry minimizing squared L2 (ties -> lowest code). Narrow map
    against a broadcast codebook; the argmin rides a window keyed by
    (vec_id, sub). The production encode is the same math through
    ``pq_encode``'s Arrow-batched numpy (no N x ksub row blowup)."""
    sv = emb.select(
        "vec_id", F.posexplode(_sub_slices(F.col("v"), m, dim)).alias("sub", "sub_v")
    )
    scored = sv.join(F.broadcast(codebooks), "sub").select(
        "vec_id", "sub", "code", _l2_sq(F.col("sub_v"), F.col("c_sub")).alias("d2")
    )
    w = Window.partitionBy("vec_id", "sub").orderBy(F.asc("d2"), F.asc("code"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("vec_id", "sub", "code")
    )


def pq_adc_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    dim: int = EMBEDDING_DIM,
) -> DataFrame:
    """ADC top-k over engine-encoded PQ codes: each query precomputes an
    m x ksub table of subspace distances to every codebook entry (tiny,
    broadcast); a candidate's approximate distance is the sub-ordered fold
    of its m table entries — deterministic association, so DuckDB
    reproduces it bit-for-bit (same left-fold discipline as the cosine
    queries). One shuffle keys the (q_id, vec_id) regroup.

    Scale: codes are m bytes/vector; at 100 TB ADC runs as a narrow
    mapInPandas over the packed codes with the table in a broadcast
    (``pq_search``) and only per-partition top-k survivors reach the final
    rank — this engine-side variant is the oracle-checkable spec of that
    path, and the compression itself is proven through storage by
    `embedding_binary_storage_stats`'s RAW BYTES layout."""
    emb = embeddings.select(
        "vec_id", as_double_array("embedding").alias("v")
    )
    codebooks = pq_codebooks_df(emb, m, ksub, dim)
    codes = pq_encode_engine(emb, codebooks, m, dim)
    q = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"),
        F.posexplode(_sub_slices(F.col("v"), m, dim)).alias("sub", "q_sub"),
    )
    dq = q.join(F.broadcast(codebooks), "sub").select(
        "q_id", "sub", "code", _l2_sq(F.col("q_sub"), F.col("c_sub")).alias("dq")
    )
    scored = (
        codes.join(F.broadcast(dq), ["sub", "code"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", "vec_id")
        .agg(
            F.round(
                F.aggregate(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("sub", "dq"))),
                        lambda s: s["dq"],
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("adist")
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("adist"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "vec_id", "adist", "rnk")
        .orderBy("q_id", "rnk")
    )


def pq_adc_topk_oracle_sql(
    query_ids: list[int],
    k: int = 10,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    dim: int = EMBEDDING_DIM,
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    dsub = dim // m
    sub_slice = (
        f"v[s.sub * {dsub} + 1 : s.sub * {dsub} + {dsub}]"
    )
    l2 = (
        f"list_reduce(list_transform(generate_series(1, {dsub}),"
        " i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), (p, q) -> p + q)"
    )
    return f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), subs AS (SELECT unnest(range(0, {m})) AS sub),
sv AS (
  SELECT e.vec_id, s.sub, {sub_slice} AS sub_v
  FROM emb e CROSS JOIN subs s
), codebooks AS (
  SELECT sub, CAST(vec_id AS INT) AS code, sub_v AS c_sub
  FROM sv WHERE vec_id < {ksub}
), codes AS (
  SELECT vec_id, sub, code FROM (
    SELECT t.vec_id, t.sub, c.code,
           row_number() OVER (
             PARTITION BY t.vec_id, t.sub
             ORDER BY {l2.format(a="t.sub_v", b="c.c_sub")} ASC, c.code ASC
           ) AS rnk
    FROM sv t JOIN codebooks c USING (sub)
  ) WHERE rnk = 1
), dq AS (
  SELECT t.vec_id AS q_id, t.sub, c.code,
         {l2.format(a="t.sub_v", b="c.c_sub")} AS dq
  FROM sv t JOIN codebooks c USING (sub)
  WHERE t.vec_id IN ({ids})
), grouped AS (
  -- lists materialize one CTE level before the lambda, and every group
  -- here has exactly m entries (one per subvector): DuckDB v1.0
  -- mis-evaluates list lambdas across rows with UNEQUAL list lengths
  -- (see funnel._recursive_fold_ctes) — fixed-length groups are the
  -- safe case, and the split keeps the shape defensive anyway
  SELECT d.q_id, co.vec_id, list(d.dq ORDER BY d.sub) AS ds
  FROM codes co JOIN dq d ON co.sub = d.sub AND co.code = d.code
  WHERE co.vec_id <> d.q_id
  GROUP BY d.q_id, co.vec_id
), scored AS (
  SELECT q_id, vec_id,
         round(list_reduce(ds, (p, q) -> p + q), 6) AS adist
  FROM grouped
)
SELECT q_id, vec_id, adist, rnk FROM (
  SELECT q_id, vec_id, adist,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY adist ASC, vec_id ASC) AS rnk
  FROM scored
) WHERE rnk <= {k} ORDER BY q_id, rnk
"""


def pq_train(vectors, m: int = PQ_M, ksub: int = PQ_KSUB, iters: int = 5):
    """Lloyd-trained per-subspace codebooks over a numpy sample
    (codebooks train on a bounded sample by construction — at 100 TB a
    ~100k-row sample is the standard practice, collected once). Returns
    (m, ksub, dsub) float64. Deterministic init: first ksub sample rows."""
    import numpy as np

    x = np.asarray(vectors, dtype=np.float64)
    n, dim = x.shape
    dsub = dim // m
    books = np.empty((m, ksub, dsub))
    for s in range(m):
        xs = x[:, s * dsub : (s + 1) * dsub]
        c = xs[:ksub].copy()
        for _ in range(iters):
            d = ((xs[:, None, :] - c[None, :, :]) ** 2).sum(-1)
            a = d.argmin(1)
            for j in range(ksub):
                sel = xs[a == j]
                if len(sel):
                    c[j] = sel.mean(0)
        books[s] = c
    return books


def pq_encode(embeddings: DataFrame, codebooks) -> DataFrame:
    """Production encode: Arrow-batched numpy argmin per subspace;
    (vec_id, codes binary) with m bytes per vector — the 32x-compressed
    layout `embedding_binary_storage_stats` then carries through RAW
    BYTES segments."""
    import numpy as np

    books = np.asarray(codebooks)
    m, ksub, dsub = books.shape
    spark = embeddings.sparkSession
    bc = spark.sparkContext.broadcast(books)

    def enc(batches):
        import pandas as pd

        b = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            codes = np.empty((len(x), m), dtype=np.uint8)
            for s in range(m):
                xs = x[:, s * dsub : (s + 1) * dsub]
                d = ((xs[:, None, :] - b[s][None, :, :]) ** 2).sum(-1)
                codes[:, s] = d.argmin(1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "codes": [c.tobytes() for c in codes]}
            )

    return embeddings.select("vec_id", "embedding").mapInPandas(
        enc, "vec_id long, codes binary"
    )


def pq_search(codes_df: DataFrame, queries, codebooks, k: int = 10) -> DataFrame:
    """Production ADC: per-partition numpy scoring of packed codes against
    broadcast query distance tables, partial top-k per partition, global
    rank on the (tiny) survivor set — the billion-scale shape: no float
    vectors move, no full-corpus shuffle (only n_partitions x k rows)."""
    import numpy as np

    books = np.asarray(codebooks)
    m, ksub, dsub = books.shape
    qs = np.asarray(queries, dtype=np.float64)
    tables = np.empty((len(qs), m, ksub))
    for s in range(m):
        qsub = qs[:, s * dsub : (s + 1) * dsub]
        tables[:, s, :] = ((qsub[:, None, :] - books[s][None, :, :]) ** 2).sum(-1)
    spark = codes_df.sparkSession
    bc = spark.sparkContext.broadcast(tables)

    def score(batches):
        import pandas as pd

        t = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack(
                [np.frombuffer(c, dtype=np.uint8) for c in pdf["codes"]]
            )
            out = []
            for qi in range(len(t)):
                d = t[qi][np.arange(m)[None, :], codes].sum(1)
                top = np.argsort(d, kind="stable")[:k]
                out.append(
                    pd.DataFrame(
                        {
                            "q_idx": qi,
                            "vec_id": pdf["vec_id"].to_numpy()[top],
                            "adist": d[top],
                        }
                    )
                )
            yield pd.concat(out)

    partial = codes_df.mapInPandas(score, "q_idx int, vec_id long, adist double")
    w = Window.partitionBy("q_idx").orderBy(F.asc("adist"), F.asc("vec_id"))
    return (
        partial.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .orderBy("q_idx", "rnk")
    )


def pq_codes_table(emb: DataFrame, m: int = PQ_M, ksub: int = PQ_KSUB,
                   dim: int = EMBEDDING_DIM) -> DataFrame:
    """(vec_id, codes array<int>): engine-side PQ encoding collected to one
    multi-value row per vector — the layout `ann_pq_pinot_codes_topk`
    persists as a pinot MV INT column (m * ~1 byte per vector on disk
    after dictionary packing, vs dim * 4 for the floats)."""
    codebooks = pq_codebooks_df(emb, m, ksub, dim)
    codes = pq_encode_engine(emb, codebooks, m, dim)
    return codes.groupBy("vec_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub", "code"))),
            lambda s: s["code"],
        ).alias("codes")
    )


def pq_stored_adc_topk(
    codes_df: DataFrame,
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    dim: int = EMBEDDING_DIM,
) -> DataFrame:
    """ADC top-k over STORED codes (an `array<int>` column read back from
    segments): per-query distance tables build from the original query
    vectors + the deterministic codebooks (broadcast); each candidate's
    distance is the sub-ordered fold over its code array — all engine
    expressions, so the whole serve path from storage is
    oracle-checkable. One shuffle: the (q_id, vec_id) regroup."""
    codebooks = pq_codebooks_df(emb, m, ksub, dim)
    q = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"),
        F.posexplode(_sub_slices(F.col("v"), m, dim)).alias("sub", "q_sub"),
    )
    dq = q.join(F.broadcast(codebooks), "sub").select(
        "q_id", "sub", "code", _l2_sq(F.col("q_sub"), F.col("c_sub")).alias("dq")
    )
    exploded = codes_df.select(
        "vec_id", F.posexplode("codes").alias("sub", "code")
    )
    scored = (
        exploded.join(F.broadcast(dq), ["sub", "code"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", "vec_id")
        .agg(
            F.round(
                F.aggregate(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("sub", "dq"))),
                        lambda s: s["dq"],
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("adist")
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("adist"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "vec_id", "adist", "rnk")
        .orderBy("q_id", "rnk")
    )


# ---------------------------------------------------------------------------
# SemDeDup: semantic deduplication by cluster-then-threshold
# ---------------------------------------------------------------------------
# Abbas et al. 2023 (public): cluster the embedding space, then inside each
# cluster drop all but one of every group of vectors whose pairwise cosine
# exceeds a threshold. Clustering bounds the candidate set so the quadratic
# pair scan never crosses cluster boundaries — the embedding-space analogue
# of MinHash-LSH's banded buckets (operators/dedup.py).


def semdedup_drops(
    embeddings: DataFrame, k_clusters: int = 8, threshold: float = 0.4
) -> DataFrame:
    """SemDeDup drop list: (cluster, drop_vec, canonical_vec) for every
    vector that has a lower-id same-cluster neighbor with cosine >=
    ``threshold``; ``canonical_vec`` is its lowest-id such neighbor.
    Dropping every listed vector keeps exactly the per-group minimum id.

    Centroids are the ``k_clusters`` lowest-``vec_id`` embeddings — a
    deterministic seeding that keeps the whole operator (assignment
    included) DuckDB-oracle-checkable; the production path would feed
    k-means centroids from :func:`kmeans_centroids` (ann_ivf_kmeans_topk)
    and scale ``k_clusters`` with N so per-cluster candidate sets stay
    bounded. Assignment broadcasts the centroid table (k rows) against the
    corpus — a narrow map, no shuffle of the big side; the only corpus
    shuffle is the within-cluster self-join key. Similarities are rounded
    to 6 decimals BEFORE the argmax and the threshold compare, so the
    assignment and the drop set are bit-stable across engines.

    The default threshold is tuned to the synthetic testdata (random-ish
    embeddings: within-cluster cosines top out near 0.47, so 0.4 yields a
    discriminating non-empty drop set at both driver SFs); a real corpus
    with planted paraphrases would run at the paper's ~0.9+."""
    emb = embeddings.select(
        "vec_id", as_double_array("embedding").alias("v")
    )
    cents = (
        emb.orderBy("vec_id")
        .limit(k_clusters)
        .select(F.col("vec_id").alias("c_id"), F.col("v").alias("c_v"))
    )
    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "v",
        "c_id",
        F.round(cosine_similarity(F.col("v"), F.col("c_v")), 6).alias("sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("c_id"))
    assigned = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", F.col("c_id").alias("cluster"))
    )
    a, b = assigned.alias("a"), assigned.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.cluster").alias("cluster"),
            F.col("a.vec_id").alias("va"),
            F.col("b.vec_id").alias("vb"),
            F.round(
                cosine_similarity(F.col("a.v"), F.col("b.v")), 6
            ).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )
    return (
        pairs.groupBy("cluster", F.col("vb").alias("drop_vec"))
        .agg(F.min("va").alias("canonical_vec"))
        .orderBy("drop_vec")
    )


def semdedup_drops_oracle_sql(
    k_clusters: int = 8, threshold: float = 0.4
) -> str:
    sim_c = _cosine_sql("e.v", "c.c_v")
    sim_p = _cosine_sql("a.v", "b.v")
    return f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), cents AS (
  SELECT vec_id AS c_id, v AS c_v FROM emb ORDER BY vec_id LIMIT {k_clusters}
), scored AS (
  SELECT e.vec_id, e.v, c.c_id, round({sim_c}, 6) AS sim
  FROM emb e CROSS JOIN cents c
), assigned AS (
  SELECT vec_id, v, c_id AS cluster FROM (
    SELECT vec_id, v, c_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY sim DESC, c_id ASC) AS rn
    FROM scored
  ) WHERE rn = 1
), pairs AS (
  SELECT a.cluster, a.vec_id AS va, b.vec_id AS vb, round({sim_p}, 6) AS sim
  FROM assigned a JOIN assigned b
    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
)
SELECT cluster, vb AS drop_vec, CAST(min(va) AS BIGINT) AS canonical_vec
FROM pairs WHERE sim >= {threshold}
GROUP BY cluster, vb
ORDER BY drop_vec
"""


def sq8_topk(
    embeddings: DataFrame, query_ids: list[int], k: int = 10
) -> DataFrame:
    """Scalar-quantized (SQ8) top-k — the fourth quantization tier after
    brute/LSH/IVF/PQ: each vector quantizes independently to int8 codes
    ``q_i = floor(x_i · 127 / max|x|)`` (one deterministic IEEE divide +
    floor per element), and similarity is the INTEGER dot product of the
    codes — BIGINT-exact, shuffle-order-independent, so unlike the
    float-cosine tiers the whole ranking hash-checks without rounding.
    This is the memory/speed trade faiss's SQ8 index makes: 4x smaller
    than float32, dot products in integer SIMD; the ranking is the
    quantized one by construction (that IS the index's answer).

    Scale shape: quantization is a narrow JVM-side array transform
    (whole-stage codegen, no Python); the probe set broadcasts; top-k is
    a per-query WindowGroupLimit. No shuffle beyond the top-k."""
    from datafusion_pinot_spark.functions import as_double_array

    def q8(col):
        v = as_double_array(col)
        maxabs = F.array_max(F.transform(v, lambda x: F.abs(x)))
        return F.when(
            maxabs > 0,
            F.transform(
                v,
                lambda x: F.floor(x * F.lit(127.0) / maxabs).cast("long"),
            ),
        ).otherwise(F.transform(v, lambda x: F.lit(0).cast("long")))

    emb = embeddings.select("vec_id", q8(F.col("embedding")).alias("q"))
    queries = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"), F.col("q").alias("q_q")
    )
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.aggregate(
                F.zip_with(F.col("q_q"), F.col("q"), lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("qdot"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("qdot"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "vec_id", "qdot", "rnk")
    )


def sq8_topk_oracle_sql(query_ids: list[int], k: int = 10) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH emb AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), mx AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) AS maxabs
  FROM emb
), q8 AS (
  SELECT vec_id,
         CASE WHEN maxabs > 0
              THEN list_transform(v, x -> CAST(floor(x * 127.0 / maxabs)
                                               AS BIGINT))
              ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS q
  FROM mx
), probes AS (
  SELECT vec_id AS q_id, q AS q_q FROM q8 WHERE vec_id IN ({ids})
), scored AS (
  SELECT p.q_id, e.vec_id,
         CAST(list_sum(list_transform(generate_series(1, len(e.q)),
                                      i -> p.q_q[i] * e.q[i])) AS BIGINT)
           AS qdot
  FROM q8 e CROSS JOIN probes p WHERE e.vec_id <> p.q_id
)
SELECT q_id, vec_id, qdot, rnk FROM (
  SELECT q_id, vec_id, qdot,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY qdot DESC, vec_id ASC) AS rnk
  FROM scored
) WHERE rnk <= {k}
"""


def sq8_recall_audit(
    embeddings: DataFrame, query_ids: list[int], k: int = 10
) -> DataFrame:
    """Quantization-quality audit under the FULL hash gate: recall@k of
    the SQ8 integer ranking against the exact float-cosine ranking, per
    probe, in exact ppm. Most ANN recall numbers are unverifiable
    spot-checks; here BOTH rankings are deterministic and SQL-
    expressible (SQ8 codes are engine-exact integers; the cosine tier
    uses the repo's 6-decimal rounding contract), so the overlap count
    itself is what DuckDB re-derives — the audit of the index is as
    hash-checked as the index.

    Scale shape: two broadcast-probe rankings over the same corpus scan
    economics as their parent operators, then a (q_id, vec_id) equi-join
    of two k-row-per-probe frames — trivially small, and BROADCAST
    explicitly (r10): Spark can't size a windowed top-k output, so
    without the hint both |probes|*k-row frames went through
    SortMergeJoin shuffles."""
    exact = brute_force_topk(embeddings, query_ids, k).select(
        "q_id", "vec_id"
    )
    quant = sq8_topk(embeddings, query_ids, k).select(
        "q_id", F.col("vec_id").alias("vec_id_q")
    )
    hits = exact.join(
        F.broadcast(quant),
        (exact["q_id"] == quant["q_id"])
        & (exact["vec_id"] == quant["vec_id_q"]),
    ).groupBy(exact["q_id"].alias("qid")).agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    base = exact.groupBy(F.col("q_id").alias("qid")).agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    return (
        base.join(F.broadcast(hits), "qid", "left")
        .select(
            F.col("qid").alias("q_id"),
            "n_exact",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.expr(
                "CAST(coalesce(n_hits, 0) * 1000000 DIV n_exact AS BIGINT)"
            ).alias("recall_ppm"),
        )
        .orderBy("q_id")
    )


def sq8_recall_audit_oracle_sql(query_ids: list[int], k: int = 10) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), q AS (
  SELECT vec_id AS q_id, v AS q_v FROM emb WHERE vec_id IN ({ids})
), cos_scored AS (
  SELECT q.q_id, e.vec_id,
         round(CASE WHEN sqrt(list_sum(list_transform(q.q_v, x -> x*x)))
                         * sqrt(list_sum(list_transform(e.v, x -> x*x))) = 0
                    THEN 0.0
                    ELSE list_sum(list_transform(
                           generate_series(1, len(e.v)),
                           i -> q.q_v[i] * e.v[i]))
                         / (sqrt(list_sum(list_transform(q.q_v, x -> x*x)))
                            * sqrt(list_sum(list_transform(e.v, x -> x*x))))
               END, 6) AS sim
  FROM emb e CROSS JOIN q WHERE e.vec_id <> q.q_id
), exact AS (
  SELECT q_id, vec_id FROM (
    SELECT q_id, vec_id,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY sim DESC, vec_id ASC) AS rnk
    FROM cos_scored) WHERE rnk <= {k}
), mx AS (
  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS maxabs
  FROM emb
), q8 AS (
  SELECT vec_id,
         CASE WHEN maxabs > 0
              THEN list_transform(v, x -> CAST(floor(x * 127.0 / maxabs)
                                               AS BIGINT))
              ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS q
  FROM mx
), probes AS (
  SELECT vec_id AS q_id, q AS q_q FROM q8 WHERE vec_id IN ({ids})
), quant AS (
  SELECT q_id, vec_id FROM (
    SELECT p.q_id, e.vec_id,
           row_number() OVER (PARTITION BY p.q_id
                              ORDER BY CAST(list_sum(list_transform(
                                generate_series(1, len(e.q)),
                                i -> p.q_q[i] * e.q[i])) AS BIGINT) DESC,
                              e.vec_id ASC) AS rnk
    FROM q8 e CROSS JOIN probes p WHERE e.vec_id <> p.q_id) t
  WHERE rnk <= {k}
), hits AS (
  SELECT exact.q_id, count(*) AS n_hits
  FROM exact JOIN quant ON exact.q_id = quant.q_id
                       AND exact.vec_id = quant.vec_id
  GROUP BY exact.q_id
), base AS (
  SELECT q_id, count(*) AS n_exact FROM exact GROUP BY q_id
)
SELECT b.q_id, CAST(n_exact AS BIGINT) AS n_exact,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(coalesce(h.n_hits, 0) * 1000000 // n_exact AS BIGINT)
         AS recall_ppm
FROM base b LEFT JOIN hits h ON b.q_id = h.q_id
ORDER BY b.q_id"""


def knn_label_consistency(
    embeddings: DataFrame, query_ids: list[int], k: int = 10
) -> DataFrame:
    """kNN label-consistency check — the standard embedding-quality probe
    (do nearest neighbors share the probe's label?): for each probe, the
    fraction of its exact cosine top-``k`` neighbors carrying the same
    ``label``, in exact ppm. Low consistency says the embedding space
    does not separate the labels — the go/no-go before trusting ANN
    retrieval for classification-adjacent work.

    Scale shape: the exact top-k ranking's economics (broadcast probes,
    per-query WindowGroupLimit), then a labels join on the k-row frame."""
    top = brute_force_topk(embeddings, query_ids, k).select(
        "q_id", "vec_id"
    )
    labels = embeddings.select("vec_id", "label")
    qlab = labels.select(
        F.col("vec_id").alias("q_id"), F.col("label").alias("q_label")
    )
    return (
        top.join(labels, "vec_id")
        .join(F.broadcast(qlab), "q_id")
        .groupBy("q_id")
        .agg(
            F.count(F.lit(1)).alias("n_neighbors"),
            F.sum(
                (F.col("label") == F.col("q_label")).cast("bigint")
            ).alias("n_same_label"),
        )
        .select(
            "q_id",
            "n_neighbors",
            "n_same_label",
            F.expr(
                "CAST(n_same_label * 1000000 DIV n_neighbors AS BIGINT)"
            ).alias("consistency_ppm"),
        )
        .orderBy("q_id")
    )


def knn_label_consistency_oracle_sql(
    query_ids: list[int], k: int = 10
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH emb AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), q AS (
  SELECT vec_id AS q_id, label AS q_label, v AS q_v
  FROM emb WHERE vec_id IN ({ids})
), scored AS (
  SELECT q.q_id, q.q_label, e.vec_id, e.label,
         round(CASE WHEN sqrt(list_sum(list_transform(q.q_v, x -> x*x)))
                         * sqrt(list_sum(list_transform(e.v, x -> x*x))) = 0
                    THEN 0.0
                    ELSE list_sum(list_transform(
                           generate_series(1, len(e.v)),
                           i -> q.q_v[i] * e.v[i]))
                         / (sqrt(list_sum(list_transform(q.q_v, x -> x*x)))
                            * sqrt(list_sum(list_transform(e.v, x -> x*x))))
               END, 6) AS sim
  FROM emb e CROSS JOIN q WHERE e.vec_id <> q.q_id
), top AS (
  SELECT q_id, q_label, label FROM (
    SELECT q_id, q_label, label,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY sim DESC, vec_id ASC) AS rnk
    FROM scored) WHERE rnk <= {k}
)
SELECT q_id, CAST(count(*) AS BIGINT) AS n_neighbors,
       CAST(sum(CASE WHEN label = q_label THEN 1 ELSE 0 END) AS BIGINT)
         AS n_same_label,
       CAST(sum(CASE WHEN label = q_label THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS consistency_ppm
FROM top GROUP BY q_id ORDER BY q_id"""


def rrf_fusion_topk(
    embeddings: DataFrame, query_ids: list[int], k: int = 10, rrf_k: int = 60
) -> DataFrame:
    """Reciprocal-rank fusion of two retrieval rankings — the standard way
    to combine heterogeneous retrievers (dense cosine + a second signal)
    without score calibration: each ranker contributes ``1/(rrf_k + rank)``
    and candidates are re-ranked by the sum. Here the two rankers are
    exact cosine similarity and exact (negated) squared L2 distance —
    deliberately non-equivalent orderings for unnormalized vectors, so the
    fusion is non-trivial.

    Hash-gate discipline: ranks are ``row_number`` over ``(round(score,6),
    vec_id)`` — the same determinism contract every green ANN row uses —
    and the fused score is carried as EXACT integer ppm
    (``1_000_000 div (rrf_k + rank)`` summed over rankers), so no float
    crosses the engine boundary after the rounding fence.

    Scale shape (100 TB): the query set broadcasts (tiny); scoring is one
    narrow map over the corpus (no shuffle of the big side); the two rank
    windows shuffle on q_id only. In production the inputs would be each
    retriever's top-C candidate list (C ~ 1000) rather than full-corpus
    rankings — the fusion arithmetic is identical, this query checks it
    end-to-end exactly.
    """
    from datafusion_pinot_spark.functions import as_double_array

    emb = embeddings.select("vec_id", as_double_array("embedding").alias("v"))
    queries = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("q_v")
    )
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.round(
                cosine_similarity(F.col("q_v"), F.col("v")), 6
            ).alias("sim"),
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.col("q_v"),
                        F.col("v"),
                        lambda x, y: (x - y) * (x - y),
                    ),
                    F.lit(0.0),
                    lambda a, x: a + x,
                ),
                6,
            ).alias("dist2"),
        )
    )
    w_cos = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    w_l2 = Window.partitionBy("q_id").orderBy(F.asc("dist2"), F.asc("vec_id"))
    fused = (
        scored.withColumn("rank_cos", F.row_number().over(w_cos))
        .withColumn("rank_l2", F.row_number().over(w_l2))
        .withColumn(
            "rrf_ppm",
            F.expr(
                f"1000000L div ({rrf_k} + rank_cos)"
                f" + 1000000L div ({rrf_k} + rank_l2)"
            ).cast("long"),
        )
    )
    w_out = Window.partitionBy("q_id").orderBy(
        F.desc("rrf_ppm"), F.asc("vec_id")
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(w_out))
        .filter(F.col("fused_rank") <= k)
        .select(
            "q_id",
            "vec_id",
            F.col("rank_cos").cast("long").alias("rank_cos"),
            F.col("rank_l2").cast("long").alias("rank_l2"),
            "rrf_ppm",
            F.col("fused_rank").cast("long").alias("fused_rank"),
        )
        .orderBy("q_id", "fused_rank")
    )


def rrf_fusion_topk_oracle_sql(
    query_ids: list[int], k: int = 10, rrf_k: int = 60
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), q AS (
  SELECT vec_id AS q_id, v AS q_v FROM emb WHERE vec_id IN ({ids})
), scored AS (
  SELECT q.q_id, e.vec_id,
         round(CASE WHEN sqrt(list_sum(list_transform(q.q_v, x -> x*x)))
                         * sqrt(list_sum(list_transform(e.v, x -> x*x))) = 0
                    THEN 0.0
                    ELSE list_sum(list_transform(
                           generate_series(1, len(e.v)),
                           i -> q.q_v[i] * e.v[i]))
                         / (sqrt(list_sum(list_transform(q.q_v, x -> x*x)))
                            * sqrt(list_sum(list_transform(e.v, x -> x*x))))
               END, 6) AS sim,
         round(list_sum(list_transform(
                 generate_series(1, len(e.v)),
                 i -> (q.q_v[i] - e.v[i]) * (q.q_v[i] - e.v[i]))), 6)
           AS dist2
  FROM emb e CROSS JOIN q WHERE e.vec_id <> q.q_id
), ranked AS (
  SELECT q_id, vec_id,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY sim DESC, vec_id ASC) AS rank_cos,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY dist2 ASC, vec_id ASC) AS rank_l2
  FROM scored
), fused AS (
  SELECT q_id, vec_id,
         CAST(rank_cos AS BIGINT) AS rank_cos,
         CAST(rank_l2 AS BIGINT) AS rank_l2,
         CAST(1000000 // ({rrf_k} + rank_cos)
              + 1000000 // ({rrf_k} + rank_l2) AS BIGINT) AS rrf_ppm
  FROM ranked
)
SELECT q_id, vec_id, rank_cos, rank_l2, rrf_ppm,
       CAST(fused_rank AS BIGINT) AS fused_rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY rrf_ppm DESC, vec_id ASC)
            AS fused_rank
  FROM fused
) WHERE fused_rank <= {k}
ORDER BY q_id, fused_rank"""


def embedding_centroid_shift(embeddings: DataFrame) -> DataFrame:
    """Per-label embedding-centroid drift between two interleaved corpus
    halves (even vs odd vec_id) — the embedding-space analogue of the
    PSI mix audit: a label whose even-half and odd-half centroids sit far
    apart is drifting in representation (encoder change, upstream content
    shift) even when its row-count mix is stable.

    Exactness contract: components quantize to milli-ints via
    ``floor(x * 1000 + 0.5)`` — float->double widening, one multiply, one
    add, one floor: a fixed IEEE expression tree, bit-identical across
    engines — then everything is integer: per-(label, dim, half) sums,
    per-dim truncated-div means, and the L1 shift
    ``sum_dims |mean_even - mean_odd|`` in exact milli units.

    Scale shape (100 TB): posexplode fans each vector into (label, dim)
    rows — 64x rows but a NARROW map feeding a map-side-combined
    aggregate, so the shuffle carries |labels| x dims partial rows, not
    the corpus (the zip_with/fold alternative keeps rows 1x but runs
    interpreted HOFs over every component — the documented 10x trap).
    The final rollup is |labels| x dims -> |labels|.
    """
    comp = embeddings.select(
        "label",
        F.expr("vec_id % 2").cast("int").alias("half"),
        F.posexplode(F.col("embedding")).alias("dim", "x"),
    ).select(
        "label",
        "half",
        "dim",
        F.expr(
            "CAST(floor(CAST(x AS DOUBLE) * 1000.0 + 0.5) AS BIGINT)"
        ).alias("xm"),
    )
    per_dim = comp.groupBy("label", "dim").agg(
        F.sum(F.when(F.col("half") == 0, F.col("xm"))).alias("s_even"),
        F.sum(F.when(F.col("half") == 1, F.col("xm"))).alias("s_odd"),
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("long")
        .alias("c_even"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("long")
        .alias("c_odd"),
    )
    shift = F.expr(
        "abs(CASE WHEN c_even > 0 THEN s_even div c_even ELSE 0 END"
        " - CASE WHEN c_odd > 0 THEN s_odd div c_odd ELSE 0 END)"
    )
    return (
        per_dim.withColumn("dim_shift", shift)
        .groupBy("label")
        .agg(
            F.expr("CAST(max(c_even) AS BIGINT)").alias("n_even"),
            F.expr("CAST(max(c_odd) AS BIGINT)").alias("n_odd"),
            F.sum("dim_shift").cast("long").alias("l1_shift_milli"),
            F.max("dim_shift").cast("long").alias("max_dim_shift_milli"),
        )
        .orderBy("label")
    )


def embedding_centroid_shift_oracle_sql() -> str:
    return """
WITH comp AS (
  -- no WITH ORDINALITY in this DuckDB: index via generate_series, the
  -- same order-safe pattern the ANN oracles use
  SELECT label, CAST(vec_id % 2 AS INT) AS half,
         t.i - 1 AS dim,
         CAST(floor(CAST(embedding[t.i] AS DOUBLE) * 1000.0 + 0.5)
              AS BIGINT) AS xm
  FROM embeddings,
       UNNEST(generate_series(1, len(embedding))) AS t(i)
), per_dim AS (
  SELECT label, dim,
         CAST(sum(CASE WHEN half = 0 THEN xm END) AS BIGINT) AS s_even,
         CAST(sum(CASE WHEN half = 1 THEN xm END) AS BIGINT) AS s_odd,
         CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_even,
         CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_odd
  FROM comp GROUP BY label, dim
), shifts AS (
  SELECT label, c_even, c_odd,
         abs(CASE WHEN c_even > 0 THEN s_even // c_even ELSE 0 END
             - CASE WHEN c_odd > 0 THEN s_odd // c_odd ELSE 0 END)
           AS dim_shift
  FROM per_dim
)
SELECT label,
       CAST(max(c_even) AS BIGINT) AS n_even,
       CAST(max(c_odd) AS BIGINT) AS n_odd,
       CAST(sum(dim_shift) AS BIGINT) AS l1_shift_milli,
       CAST(max(dim_shift) AS BIGINT) AS max_dim_shift_milli
FROM shifts GROUP BY label ORDER BY label"""


def embedding_norm_audit(embeddings: DataFrame) -> DataFrame:
    """Embedding L2-norm hygiene audit (r12): cosine retrieval assumes
    unit-ish norms — a batch of zero/near-zero vectors (encoder failures,
    padding rows) silently poisons ANN results, and a scale drift between
    ingestion batches breaks dot-product ranking. Reports, per label, the
    norm-squared distribution in exact integer micro units plus counts of
    degenerate (norm2 < 0.25) and inflated (norm2 > 4.0) vectors.

    Exactness contract: components quantize to milli-ints via
    ``floor(x * 1000 + 0.5)`` (the house fixed IEEE tree); norm2 is then
    the integer ``sum(xm * xm)`` per vector — micro units, exact across
    engines; the per-label mean is a truncated integer div.

    Scale shape (100 TB): posexplode fans components into a narrow map
    feeding a map-side-combined (vec_id, label) partial sum — components
    of one vector sit in one partition, so the combine collapses them
    locally and the shuffle carries one row per vector; the label rollup
    is map-side-combined again."""
    comp = embeddings.select(
        "vec_id",
        "label",
        F.explode(F.col("embedding")).alias("x"),
    ).select(
        "vec_id",
        "label",
        F.expr(
            "CAST(floor(CAST(x AS DOUBLE) * 1000.0 + 0.5) AS BIGINT)"
        ).alias("xm"),
    )
    per_vec = comp.groupBy("vec_id", "label").agg(
        F.sum(F.expr("xm * xm")).cast("long").alias("n2")
    )
    return (
        per_vec.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.min("n2").cast("long").alias("min_norm2_micro"),
            F.max("n2").cast("long").alias("max_norm2_micro"),
            F.expr("CAST(sum(n2) DIV count(*) AS BIGINT)").alias(
                "avg_norm2_micro"
            ),
            F.sum((F.col("n2") < 250_000).cast("bigint"))
            .cast("long")
            .alias("n_degenerate"),
            F.sum((F.col("n2") > 4_000_000).cast("bigint"))
            .cast("long")
            .alias("n_inflated"),
        )
        .orderBy("label")
    )


def embedding_norm_audit_oracle_sql() -> str:
    return """
WITH comp AS (
  SELECT vec_id, label,
         CAST(floor(CAST(t.x AS DOUBLE) * 1000.0 + 0.5) AS BIGINT) AS xm
  FROM embeddings, LATERAL unnest(embedding) AS t(x)
), per_vec AS (
  SELECT vec_id, label, CAST(sum(xm * xm) AS BIGINT) AS n2
  FROM comp GROUP BY vec_id, label
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(min(n2) AS BIGINT) AS min_norm2_micro,
       CAST(max(n2) AS BIGINT) AS max_norm2_micro,
       CAST(sum(n2) // count(*) AS BIGINT) AS avg_norm2_micro,
       CAST(sum(CASE WHEN n2 < 250000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_degenerate,
       CAST(sum(CASE WHEN n2 > 4000000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_inflated
FROM per_vec GROUP BY label ORDER BY label"""


def embedding_dim_stats(embeddings: DataFrame) -> DataFrame:
    """Per-DIMENSION embedding statistics — the whitening/quantization
    calibration table (which dims are dead, which dominate, where to clip
    before SQ8): for each dimension index, exact integer count, sum, sum
    of squares, min/max (milli-quantized components) and the zero-valued
    count. A dead dim (min == max) wastes quantization range; a dominant
    dim distorts L2 ranking — both read straight off this table.

    Exactness: components quantize via the house ``floor(x*1000 + 0.5)``
    fixed IEEE tree (embedding_norm_audit's contract); every output cell
    is BIGINT arithmetic after that. Sum of squares stays exact below
    ~9e18 micro-units (~1e12 vectors at unit scale).

    Scale shape (100 TB): posexplode fans (dim, component) rows into ONE
    map-side-combined groupBy over |dims| groups — the shuffle carries
    |dims| partial rows per task, the output is |dims| rows. No joins,
    no windows."""
    comp = embeddings.select(
        F.posexplode(F.col("embedding")).alias("dim", "x")
    ).select(
        "dim",
        F.expr(
            "CAST(floor(CAST(x AS DOUBLE) * 1000.0 + 0.5) AS BIGINT)"
        ).alias("xm"),
    )
    return (
        comp.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("xm").cast("long").alias("sum_milli"),
            F.sum(F.expr("xm * xm")).cast("long").alias("sumsq_micro"),
            F.min("xm").cast("long").alias("min_milli"),
            F.max("xm").cast("long").alias("max_milli"),
            F.sum((F.col("xm") == 0).cast("bigint"))
            .cast("long")
            .alias("n_zero"),
        )
        .select(
            F.col("dim").cast("int").alias("dim"),
            "n",
            "sum_milli",
            "sumsq_micro",
            "min_milli",
            "max_milli",
            "n_zero",
            (F.col("min_milli") == F.col("max_milli")).alias("is_dead"),
        )
        .orderBy("dim")
    )


def embedding_dim_stats_oracle_sql() -> str:
    return """
WITH comp AS (
  SELECT CAST(t.dim - 1 AS INTEGER) AS dim,
         CAST(floor(CAST(embedding[t.dim] AS DOUBLE) * 1000.0 + 0.5)
              AS BIGINT) AS xm
  FROM embeddings,
       LATERAL unnest(generate_series(1, len(embedding))) AS t(dim)
), agg AS (
  SELECT dim,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(xm) AS BIGINT) AS sum_milli,
         CAST(sum(xm * xm) AS BIGINT) AS sumsq_micro,
         CAST(min(xm) AS BIGINT) AS min_milli,
         CAST(max(xm) AS BIGINT) AS max_milli,
         CAST(sum(CASE WHEN xm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
  FROM comp GROUP BY dim
)
SELECT dim, n, sum_milli, sumsq_micro, min_milli, max_milli, n_zero,
       min_milli = max_milli AS is_dead
FROM agg ORDER BY dim"""


def _comp_milli(embeddings: DataFrame) -> DataFrame:
    """(vec_id, dim, xm): per-component milli-int view of the embedding
    column via the repo's exactness contract ``floor(x * 1000 + 0.5)`` —
    float->double widening, one multiply, one add, one floor: a fixed
    IEEE expression tree, bit-identical across engines."""
    return embeddings.select(
        "vec_id",
        F.posexplode(F.col("embedding")).alias("dim", "x"),
    ).select(
        "vec_id",
        "dim",
        F.expr(
            "CAST(floor(CAST(x AS DOUBLE) * 1000.0 + 0.5) AS BIGINT)"
        ).alias("xm"),
    )


KMEANS_K = 4
KMEANS_ITERS = 2


def kmeans_cluster_report(
    embeddings: DataFrame, k: int = KMEANS_K, iters: int = KMEANS_ITERS
) -> DataFrame:
    """EXACT-INTEGER Lloyd's k-means under the full hash gate: ``iters``
    fixed assignment/update rounds over milli-quantized components, then a
    per-cluster report — size, exact squared-L2 inertia (milli^2 units),
    and the dominant ground-truth label with its count. The float trainer
    (``kmeans_centroids``) stays numpy-validated; THIS variant makes the
    clustering itself cross-engine reproducible: init is deterministic
    (centroid j = the vector with vec_id j), means are truncated integer
    divisions, distance ties break on ascending centroid id — every engine
    lands on bit-identical clusters, so DuckDB re-derives the whole run.

    Scale shape (100 TB): per iteration the corpus appears as the NARROW
    (vec_id, dim, xm) component stream; distances join it against a
    broadcast k x dim centroid frame and reduce per (vec_id, c_id) with
    map-side combine (shuffle carries N*k partial rows, never N*k*dim);
    the centroid update is one more map-side-combined agg down to k*dim
    rows. Nothing quadratic in N; k and dim are constants. At production
    scale the same plan holds with the component stream read straight off
    a columnar source; inertia sums would carry in decimal(38,0) past
    ~1e9 vectors (bounded here: |xm|<=2000 -> d2 <= 64*4e6, BIGINT-safe
    to ~3.6e10 vectors).
    """
    comp = _comp_milli(embeddings).localCheckpoint(eager=False)
    cents = comp.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("c_id"),
        F.col("dim").alias("c_dim"),
        F.col("xm").alias("cm"),
    )
    assigned = None
    for _ in range(iters):
        d2 = (
            comp.join(
                F.broadcast(cents), F.col("dim") == F.col("c_dim")
            )
            .groupBy("vec_id", "c_id")
            .agg(
                F.sum(
                    (F.col("xm") - F.col("cm")) * (F.col("xm") - F.col("cm"))
                ).alias("d2")
            )
        )
        w = Window.partitionBy("vec_id").orderBy(
            F.asc("d2"), F.asc("c_id")
        )
        assigned = (
            d2.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") == 1)
            .select("vec_id", "c_id", "d2")
        )
        cents = (
            comp.join(
                F.broadcast(assigned.select("vec_id", "c_id")), "vec_id"
            )
            .groupBy("c_id", F.col("dim").alias("c_dim"))
            .agg(F.expr("sum(xm) div count(*)").alias("cm"))
        )
    sizes = assigned.groupBy("c_id").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum("d2").cast("long").alias("inertia_milli2"),
    )
    lab = (
        assigned.select("vec_id", "c_id")
        .join(embeddings.select("vec_id", "label"), "vec_id")
        .groupBy("c_id", "label")
        .agg(F.count(F.lit(1)).alias("n_lab"))
    )
    wl = Window.partitionBy("c_id").orderBy(
        F.desc("n_lab"), F.asc("label")
    )
    top_lab = (
        lab.withColumn("rnk", F.row_number().over(wl))
        .filter(F.col("rnk") == 1)
        .select("c_id", F.col("label").alias("top_label"),
                F.col("n_lab").cast("long").alias("top_label_n"))
    )
    return (
        sizes.join(F.broadcast(top_lab), "c_id")
        .select(
            F.col("c_id").cast("long").alias("cluster_id"),
            F.col("n_vectors").cast("long").alias("n_vectors"),
            "inertia_milli2",
            "top_label",
            "top_label_n",
        )
        .orderBy("cluster_id")
    )


def kmeans_cluster_report_oracle_sql(
    k: int = KMEANS_K, iters: int = KMEANS_ITERS
) -> str:
    head = f"""
WITH comp AS (
  SELECT vec_id, CAST(t.i - 1 AS INTEGER) AS dim,
         CAST(floor(CAST(embedding[t.i] AS DOUBLE) * 1000.0 + 0.5)
              AS BIGINT) AS xm
  FROM embeddings,
       LATERAL unnest(generate_series(1, len(embedding))) AS t(i)
), cents0 AS (
  SELECT vec_id AS c_id, dim AS c_dim, xm AS cm FROM comp
  WHERE vec_id < {k}
)"""
    body = ""
    prev = "cents0"
    for it in range(iters):
        body += f""", d2_{it} AS (
  SELECT comp.vec_id, c.c_id,
         CAST(sum((comp.xm - c.cm) * (comp.xm - c.cm)) AS BIGINT) AS d2
  FROM comp JOIN {prev} c ON comp.dim = c.c_dim
  GROUP BY comp.vec_id, c.c_id
), assign_{it} AS (
  SELECT vec_id, c_id, d2 FROM (
    SELECT vec_id, c_id, d2,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d2 ASC, c_id ASC) AS rnk
    FROM d2_{it}) WHERE rnk = 1
), cents_{it + 1} AS (
  SELECT a.c_id, comp.dim AS c_dim,
         CAST(sum(comp.xm) // count(*) AS BIGINT) AS cm
  FROM comp JOIN assign_{it} a ON comp.vec_id = a.vec_id
  GROUP BY a.c_id, comp.dim
)"""
        prev = f"cents_{it + 1}"
    last = f"assign_{iters - 1}"
    return head + body + f""", sizes AS (
  SELECT c_id, CAST(count(*) AS BIGINT) AS n_vectors,
         CAST(sum(d2) AS BIGINT) AS inertia_milli2
  FROM {last} GROUP BY c_id
), lab AS (
  SELECT a.c_id, e.label, count(*) AS n_lab
  FROM {last} a JOIN embeddings e ON a.vec_id = e.vec_id
  GROUP BY a.c_id, e.label
), top_lab AS (
  SELECT c_id, label AS top_label, CAST(n_lab AS BIGINT) AS top_label_n
  FROM (
    SELECT c_id, label, n_lab,
           row_number() OVER (PARTITION BY c_id
                              ORDER BY n_lab DESC, label ASC) AS rnk
    FROM lab) WHERE rnk = 1
)
SELECT CAST(s.c_id AS BIGINT) AS cluster_id, s.n_vectors,
       s.inertia_milli2, t.top_label, t.top_label_n
FROM sizes s JOIN top_lab t ON s.c_id = t.c_id
ORDER BY cluster_id"""


def embedding_dim_correlation(
    embeddings: DataFrame, top: int = 20
) -> DataFrame:
    """Redundant-dimension audit: the ``top`` dimension PAIRS with the
    largest exact |covariance| over milli-quantized components. Strongly
    co-varying dims are the PCA/compression headroom signal the per-dim
    table (``embedding_dim_stats``: dead/dominant dims) cannot see — a
    pair at high |cov| means the encoder spends two axes on one factor.

    Exactness: with integer components, ``n*Σxy - Σx*Σy`` is an exact
    BIGINT (n² times the covariance); the emitted ``cov_milli2`` divides
    by n² with truncating integer division — milli² units, no floats
    anywhere. Magnitudes: |xm|<=2000 -> |Σxy|<=4e6·n, so the products
    stay under 2^63 to n ~ 1e6 vectors; past that the sums carry in
    decimal(38,0) (the house halflife pattern) before the final div.

    Scale shape (100 TB): one narrow posexplode, ONE self-equi-join on
    vec_id whose fanout is the constant dims²/2 = 2016 (never data-
    dependent), then a map-side-combined agg down to 2016 groups and a
    TakeOrdered top-``top``. At production scale the join is avoidable
    entirely — a single mapInPandas pass accumulating the 64x64 Gram
    matrix per partition then one 2016-row reduce — but the join form is
    what both engines can re-derive exactly, and its shuffle is already
    bounded by dims², not N."""
    comp = _comp_milli(embeddings)
    a = comp.alias("a")
    b = comp.alias("b")
    pairs = a.join(
        b,
        (F.col("a.vec_id") == F.col("b.vec_id"))
        & (F.col("a.dim") < F.col("b.dim")),
    ).select(
        F.col("a.dim").alias("d1"),
        F.col("b.dim").alias("d2"),
        F.col("a.xm").alias("x"),
        F.col("b.xm").alias("y"),
    )
    agg = pairs.groupBy("d1", "d2").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    return (
        agg.select(
            F.col("d1").cast("int").alias("d1"),
            F.col("d2").cast("int").alias("d2"),
            F.col("n").cast("long").alias("n_vecs"),
            F.expr("(n * sxy - sx * sy) div (n * n)").alias("cov_milli2"),
        )
        .orderBy(
            F.desc(F.abs(F.col("cov_milli2"))), F.asc("d1"), F.asc("d2")
        )
        .limit(top)
    )


def embedding_dim_correlation_oracle_sql(top: int = 20) -> str:
    return f"""
WITH comp AS (
  SELECT vec_id, CAST(t.i - 1 AS INTEGER) AS dim,
         CAST(floor(CAST(embedding[t.i] AS DOUBLE) * 1000.0 + 0.5)
              AS BIGINT) AS xm
  FROM embeddings,
       LATERAL unnest(generate_series(1, len(embedding))) AS t(i)
), pairs AS (
  SELECT a.dim AS d1, b.dim AS d2, a.xm AS x, b.xm AS y
  FROM comp a JOIN comp b
    ON a.vec_id = b.vec_id AND a.dim < b.dim
), agg AS (
  SELECT d1, d2, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM pairs GROUP BY d1, d2
)
SELECT CAST(d1 AS INTEGER) AS d1, CAST(d2 AS INTEGER) AS d2,
       n AS n_vecs,
       CAST((n * sxy - sx * sy) // (n * n) AS BIGINT) AS cov_milli2
FROM agg
ORDER BY abs(CAST((n * sxy - sx * sy) // (n * n) AS BIGINT)) DESC,
         d1 ASC, d2 ASC
LIMIT {top}"""


def ann_mrr_audit(
    embeddings: DataFrame, query_ids: list[int], k: int = 10
) -> DataFrame:
    """Ranking-quality audit for the SQ8 index, one step past recall:
    where in the quantized top-``k`` does the TRUE (exact-cosine) nearest
    neighbor land? Emits, per probe, the true neighbor, its rank in the
    SQ8 list (0 = missed), and the reciprocal rank in exact ppm
    (``1000000 div rank``) plus one ALL row carrying the mean — i.e.
    MRR@k, the standard retrieval metric — as ``1000000*Σrr div n`` so
    the summary is as hash-exact as the per-probe rows. Recall@k treats
    rank 1 and rank k the same; MRR is what a retrieval stack actually
    feels.

    Scale shape: both rankings are the parent operators' plans (broadcast
    probes, narrow corpus scan, WindowGroupLimit top-k); the audit join
    matches |probes| truth rows against |probes|*k candidate rows — both
    broadcast-sized by construction."""
    truth = brute_force_topk(embeddings, query_ids, 1).select(
        "q_id", F.col("vec_id").alias("true_id")
    )
    cand = sq8_topk(embeddings, query_ids, k).select(
        "q_id", F.col("vec_id").alias("cand_id"), "rnk"
    )
    per_probe = (
        truth.join(
            F.broadcast(cand),
            (truth["q_id"] == cand["q_id"])
            & (F.col("true_id") == F.col("cand_id")),
            "left",
        )
        .select(
            truth["q_id"].alias("q_id"),
            "true_id",
            F.coalesce(F.col("rnk"), F.lit(0)).cast("long").alias(
                "rank_in_sq8"
            ),
            F.expr(
                "CAST(CASE WHEN rnk IS NULL THEN 0"
                " ELSE 1000000 div rnk END AS BIGINT)"
            ).alias("rr_ppm"),
        )
    )
    summary = per_probe.agg(
        F.lit(-1).cast("long").alias("q_id"),
        F.lit(-1).cast("long").alias("true_id"),
        F.count(F.lit(1)).alias("rank_in_sq8"),
        F.expr(
            "CAST(CASE WHEN count(*) = 0 THEN 0"
            " ELSE sum(rr_ppm) div count(*) END AS BIGINT)"
        ).alias("rr_ppm"),
    )
    return per_probe.select(
        F.col("q_id").cast("long").alias("q_id"),
        F.col("true_id").cast("long").alias("true_id"),
        "rank_in_sq8",
        "rr_ppm",
    ).unionByName(summary).orderBy("q_id")


def ann_mrr_audit_oracle_sql(query_ids: list[int], k: int = 10) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), q AS (
  SELECT vec_id AS q_id, v AS q_v FROM emb WHERE vec_id IN ({ids})
), cos_scored AS (
  SELECT q.q_id, e.vec_id,
         round(CASE WHEN sqrt(list_sum(list_transform(q.q_v, x -> x*x)))
                         * sqrt(list_sum(list_transform(e.v, x -> x*x))) = 0
                    THEN 0.0
                    ELSE list_sum(list_transform(
                           generate_series(1, len(e.v)),
                           i -> q.q_v[i] * e.v[i]))
                         / (sqrt(list_sum(list_transform(q.q_v, x -> x*x)))
                            * sqrt(list_sum(list_transform(e.v, x -> x*x))))
               END, 6) AS sim
  FROM emb e CROSS JOIN q WHERE e.vec_id <> q.q_id
), truth AS (
  SELECT q_id, vec_id AS true_id FROM (
    SELECT q_id, vec_id,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY sim DESC, vec_id ASC) AS rnk
    FROM cos_scored) WHERE rnk = 1
), mx AS (
  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS maxabs
  FROM emb
), q8 AS (
  SELECT vec_id,
         CASE WHEN maxabs > 0
              THEN list_transform(v, x -> CAST(floor(x * 127.0 / maxabs)
                                               AS BIGINT))
              ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS q
  FROM mx
), probes AS (
  SELECT vec_id AS q_id, q AS q_q FROM q8 WHERE vec_id IN ({ids})
), cand AS (
  SELECT q_id, vec_id AS cand_id, rnk FROM (
    SELECT p.q_id, e.vec_id,
           row_number() OVER (PARTITION BY p.q_id
                              ORDER BY CAST(list_sum(list_transform(
                                generate_series(1, len(e.q)),
                                i -> p.q_q[i] * e.q[i])) AS BIGINT) DESC,
                              e.vec_id ASC) AS rnk
    FROM q8 e CROSS JOIN probes p WHERE e.vec_id <> p.q_id) t
  WHERE rnk <= {k}
), per_probe AS (
  SELECT t.q_id, t.true_id,
         CAST(coalesce(c.rnk, 0) AS BIGINT) AS rank_in_sq8,
         CAST(CASE WHEN c.rnk IS NULL THEN 0
              ELSE 1000000 // c.rnk END AS BIGINT) AS rr_ppm
  FROM truth t LEFT JOIN cand c
    ON t.q_id = c.q_id AND t.true_id = c.cand_id
)
SELECT * FROM (
  SELECT CAST(q_id AS BIGINT) AS q_id, CAST(true_id AS BIGINT) AS true_id,
         rank_in_sq8, rr_ppm
  FROM per_probe
  UNION ALL
  SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
         CAST(count(*) AS BIGINT),
         CAST(CASE WHEN count(*) = 0 THEN 0
              ELSE sum(rr_ppm) // count(*) END AS BIGINT)
  FROM per_probe
) ORDER BY q_id"""


SQ_BITS_LEVELS = (4, 6, 8)


def _sq_topk(
    embeddings: DataFrame, query_ids: list[int], k: int, bits: int
) -> DataFrame:
    """sq8_topk generalized to ``bits``-bit scalar quantization: codes are
    ``floor(x * (2^(bits-1) - 1) / max|x|)`` and similarity is the exact
    integer code dot product — the same deterministic ranking contract at
    every width."""
    levels = (1 << (bits - 1)) - 1

    def q(col):
        v = as_double_array(col)
        maxabs = F.array_max(F.transform(v, lambda x: F.abs(x)))
        return F.when(
            maxabs > 0,
            F.transform(
                v,
                lambda x: F.floor(x * F.lit(float(levels)) / maxabs).cast(
                    "long"
                ),
            ),
        ).otherwise(F.transform(v, lambda x: F.lit(0).cast("long")))

    emb = embeddings.select("vec_id", q(F.col("embedding")).alias("q"))
    queries = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"), F.col("q").alias("q_q")
    )
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.aggregate(
                F.zip_with(F.col("q_q"), F.col("q"), lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("qdot"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("qdot"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "vec_id")
    )


def sq_bits_recall_curve(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    bits_levels: tuple[int, ...] = SQ_BITS_LEVELS,
) -> DataFrame:
    """Quantization-width DESIGN curve: mean recall@``k`` of ``bits``-bit
    scalar quantization against the exact float-cosine ranking, one row
    per width — the memory/recall trade quantified BEFORE an index build
    commits to int8 (or discovers int4 would have been free). Extends the
    single-point sq8_recall_audit to the curve a capacity plan actually
    reads. Mean recall in exact ppm (sum of per-probe hit counts over
    probes*k).

    Scale shape: the truth ranking computes ONCE and is reused across all
    widths; per width one quantized broadcast-probe ranking + one
    broadcast join of k-row-per-probe frames. |widths| is a constant."""
    truth = brute_force_topk(embeddings, query_ids, k).select(
        "q_id", "vec_id"
    ).localCheckpoint(eager=False)
    n_truth = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    out = None
    for bits in bits_levels:
        quant = _sq_topk(embeddings, query_ids, k, bits).select(
            F.col("q_id").alias("qq"), F.col("vec_id").alias("qv")
        )
        hits = truth.join(
            F.broadcast(quant),
            (truth["q_id"] == F.col("qq")) & (truth["vec_id"] == F.col("qv")),
            "left_semi",
        ).agg(F.count(F.lit(1)).alias("n_hits"))
        row = (
            hits.crossJoin(F.broadcast(n_truth))
            .select(
                F.lit(bits).cast("long").alias("bits"),
                F.col("n_hits").cast("long").alias("n_hits"),
                F.col("n_truth").cast("long").alias("n_truth"),
                F.expr(
                    "CAST(CASE WHEN n_truth > 0"
                    " THEN n_hits * 1000000 div n_truth"
                    " ELSE 0 END AS BIGINT)"
                ).alias("recall_ppm"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("bits")


def sq_bits_recall_curve_oracle_sql(
    query_ids: list[int],
    k: int = 10,
    bits_levels: tuple[int, ...] = SQ_BITS_LEVELS,
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    arms = []
    for bits in bits_levels:
        levels = (1 << (bits - 1)) - 1
        arms.append(f"""
  SELECT CAST({bits} AS BIGINT) AS bits, count(*) AS n_hits FROM (
    SELECT q_id, vec_id FROM (
      SELECT p.q_id, e.vec_id,
             row_number() OVER (PARTITION BY p.q_id
                                ORDER BY CAST(list_sum(list_transform(
                                  generate_series(1, len(e.q)),
                                  i -> p.q_q[i] * e.q[i])) AS BIGINT) DESC,
                                e.vec_id ASC) AS rnk
      FROM (SELECT vec_id,
                   CASE WHEN maxabs > 0
                        THEN list_transform(v, x -> CAST(floor(x * {levels}.0
                                                               / maxabs)
                                                         AS BIGINT))
                        ELSE list_transform(v, x -> CAST(0 AS BIGINT))
                   END AS q
            FROM mx) e
      CROSS JOIN (SELECT vec_id AS q_id,
                         CASE WHEN maxabs > 0
                              THEN list_transform(v, x -> CAST(floor(
                                     x * {levels}.0 / maxabs) AS BIGINT))
                              ELSE list_transform(v, x -> CAST(0 AS BIGINT))
                         END AS q_q
                  FROM mx WHERE vec_id IN ({ids})) p
      WHERE e.vec_id <> p.q_id) t
    WHERE rnk <= {k}) quant
  JOIN exact ON exact.q_id = quant.q_id AND exact.vec_id = quant.vec_id""")
    arms_sql = "\nUNION ALL\n".join(arms)
    return f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), q AS (
  SELECT vec_id AS q_id, v AS q_v FROM emb WHERE vec_id IN ({ids})
), cos_scored AS (
  SELECT q.q_id, e.vec_id,
         round(CASE WHEN sqrt(list_sum(list_transform(q.q_v, x -> x*x)))
                         * sqrt(list_sum(list_transform(e.v, x -> x*x))) = 0
                    THEN 0.0
                    ELSE list_sum(list_transform(
                           generate_series(1, len(e.v)),
                           i -> q.q_v[i] * e.v[i]))
                         / (sqrt(list_sum(list_transform(q.q_v, x -> x*x)))
                            * sqrt(list_sum(list_transform(e.v, x -> x*x))))
               END, 6) AS sim
  FROM emb e CROSS JOIN q WHERE e.vec_id <> q.q_id
), exact AS (
  SELECT q_id, vec_id FROM (
    SELECT q_id, vec_id,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY sim DESC, vec_id ASC) AS rnk
    FROM cos_scored) WHERE rnk <= {k}
), mx AS (
  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS maxabs
  FROM emb
), n_truth AS (
  SELECT CAST(count(*) AS BIGINT) AS n_truth FROM exact
), per_bits AS (
{arms_sql}
)
SELECT bits, CAST(n_hits AS BIGINT) AS n_hits, n_truth,
       CAST(CASE WHEN n_truth > 0 THEN n_hits * 1000000 // n_truth
            ELSE 0 END AS BIGINT) AS recall_ppm
FROM per_bits, n_truth ORDER BY bits"""


def label_medoid_vectors(embeddings: DataFrame) -> DataFrame:
    """Per-label MEDOID — the actual member vector minimizing total L1
    distance to its label-mates (the representative-selection step of
    k-medoids / exemplar picking; a centroid is a mean that exists
    nowhere, a medoid is a row you can show someone). Exact milli-int
    arithmetic end to end.

    The naive medoid is all-pairs (O(n² · dim)); this uses the sorted
    prefix-sum identity instead: within each (label, dim), for the value
    x at ascending rank r among n values with prefix sum S_r,
    ``Σ_u |x - x_u| = x·(2r - n) - 2·S_r + S_n`` — so the total L1 mass
    from every vector to all label-mates costs ONE window pass per
    (label, dim) partition plus a rollup, O(N·dim·log) with no pairwise
    join anywhere. Ties in x are safe: the identity depends only on the
    multiset, not the tie order.

    Scale shape (100 TB): posexplode to components, one window keyed
    (label, dim) — dim constant, so partitions are label-sized slices,
    embarrassingly parallel — then a map-side-combined per-vector rollup
    and a per-label argmin (WindowGroupLimit). Nothing quadratic."""
    comp = embeddings.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding")).alias("dim", "x"),
    ).select(
        "vec_id",
        "label",
        "dim",
        F.expr(
            "CAST(floor(CAST(x AS DOUBLE) * 1000.0 + 0.5) AS BIGINT)"
        ).alias("xm"),
    )
    w = Window.partitionBy("label", "dim").orderBy(
        F.asc("xm"), F.asc("vec_id")
    )
    wall = Window.partitionBy("label", "dim")
    per_comp = comp.select(
        "vec_id",
        "label",
        "dim",
        "xm",
        F.row_number().over(w).alias("r"),
        F.sum("xm").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("s_r"),
        F.sum("xm").over(wall).alias("s_n"),
        F.count(F.lit(1)).over(wall).alias("n"),
    ).select(
        "vec_id",
        "label",
        (
            F.col("xm") * (2 * F.col("r") - F.col("n"))
            - 2 * F.col("s_r")
            + F.col("s_n")
        ).alias("dist_mass"),
    )
    per_vec = per_comp.groupBy("label", "vec_id").agg(
        F.sum("dist_mass").cast("long").alias("total_l1_milli")
    )
    wm = Window.partitionBy("label").orderBy(
        F.asc("total_l1_milli"), F.asc("vec_id")
    )
    return (
        per_vec.withColumn("rk", F.row_number().over(wm))
        .filter(F.col("rk") == 1)
        .select(
            "label",
            F.col("vec_id").cast("long").alias("medoid_vec_id"),
            "total_l1_milli",
        )
        .orderBy("label")
    )


def label_medoid_vectors_oracle_sql() -> str:
    return """
WITH comp AS (
  SELECT vec_id, label, CAST(t.i - 1 AS INTEGER) AS dim,
         CAST(floor(CAST(embedding[t.i] AS DOUBLE) * 1000.0 + 0.5)
              AS BIGINT) AS xm
  FROM embeddings,
       LATERAL unnest(generate_series(1, len(embedding))) AS t(i)
), per_comp AS (
  SELECT vec_id, label,
         xm * (2 * r - n) - 2 * s_r + s_n AS dist_mass
  FROM (
    SELECT vec_id, label, xm,
           row_number() OVER w AS r,
           sum(xm) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS s_r,
           sum(xm) OVER (PARTITION BY label, dim) AS s_n,
           count(*) OVER (PARTITION BY label, dim) AS n
    FROM comp
    WINDOW w AS (PARTITION BY label, dim ORDER BY xm ASC, vec_id ASC)
  )
), per_vec AS (
  SELECT label, vec_id, CAST(sum(dist_mass) AS BIGINT) AS total_l1_milli
  FROM per_comp GROUP BY label, vec_id
)
SELECT label, CAST(vec_id AS BIGINT) AS medoid_vec_id, total_l1_milli
FROM (
  SELECT label, vec_id, total_l1_milli,
         row_number() OVER (PARTITION BY label
                            ORDER BY total_l1_milli ASC, vec_id ASC) AS rk
  FROM per_vec
) WHERE rk = 1 ORDER BY label"""


def contrastive_pair_mining(
    embeddings: DataFrame, query_ids: list[int]
) -> DataFrame:
    """Hard-pair mining for contrastive training (triplet / InfoNCE data
    prep, public technique): for each anchor vector, the hardest POSITIVE
    (most-similar same-label neighbor — the pair the encoder should pull
    together) and the hardest NEGATIVE (most-similar different-label
    neighbor — the pair it must push apart), plus the triplet margin.
    Similarities are cosine rounded to 6 (the repo-wide float boundary);
    ties break on ascending vec_id so both engines pick the same pair.

    Scale shape (100 TB): the anchor set is a broadcast literal list —
    ONE corpus scan scores |anchors| x N pairs inside codegen, and the
    per-(anchor, side) argmax is a WindowGroupLimit partial over the
    2|anchors| partitions (top-1 per partition folds map-side; nothing
    corpus-sized shuffles)."""
    emb = embeddings.select(
        "vec_id", "label", as_double_array("embedding").alias("v")
    )
    anchors = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("v").alias("q_v"),
    )
    scored = (
        emb.crossJoin(F.broadcast(anchors))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "q_label",
            "vec_id",
            (F.col("label") == F.col("q_label")).alias("same"),
            F.round(
                cosine_similarity(F.col("q_v"), F.col("v")), 6
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("q_id", "same").orderBy(
        F.desc("sim"), F.asc("vec_id")
    )
    top = scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") == 1
    )
    return (
        top.groupBy("q_id")
        .agg(
            F.max("q_label").cast("int").alias("label"),
            F.max(F.when(F.col("same"), F.col("vec_id"))).alias("pos_id"),
            F.max(F.when(F.col("same"), F.col("sim"))).alias("pos_sim"),
            F.max(F.when(~F.col("same"), F.col("vec_id"))).alias("neg_id"),
            F.max(F.when(~F.col("same"), F.col("sim"))).alias("neg_sim"),
        )
        .select(
            "q_id",
            "label",
            "pos_id",
            "pos_sim",
            "neg_id",
            "neg_sim",
            F.round(F.col("pos_sim") - F.col("neg_sim"), 6).alias("margin"),
        )
        .orderBy("q_id")
    )


def contrastive_pair_mining_oracle_sql(query_ids: list[int]) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH emb AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), q AS (
  SELECT vec_id AS q_id, label AS q_label, v AS q_v
  FROM emb WHERE vec_id IN ({ids})
), scored AS (
  SELECT q.q_id, q.q_label, e.vec_id, e.label = q.q_label AS same,
         round(CASE WHEN sqrt(list_sum(list_transform(q.q_v, x -> x*x)))
                         * sqrt(list_sum(list_transform(e.v, x -> x*x))) = 0
                    THEN 0.0
                    ELSE list_sum(list_transform(
                           generate_series(1, len(e.v)),
                           i -> q.q_v[i] * e.v[i]))
                         / (sqrt(list_sum(list_transform(q.q_v, x -> x*x)))
                            * sqrt(list_sum(list_transform(e.v, x -> x*x))))
               END, 6) AS sim
  FROM emb e CROSS JOIN q WHERE e.vec_id <> q.q_id
), top AS (
  SELECT * FROM (
    SELECT q_id, q_label, vec_id, same, sim,
           row_number() OVER (PARTITION BY q_id, same
                              ORDER BY sim DESC, vec_id ASC) AS rk
    FROM scored) WHERE rk = 1
)
SELECT q_id, CAST(max(q_label) AS INTEGER) AS label,
       max(CASE WHEN same THEN vec_id END) AS pos_id,
       max(CASE WHEN same THEN sim END) AS pos_sim,
       max(CASE WHEN NOT same THEN vec_id END) AS neg_id,
       max(CASE WHEN NOT same THEN sim END) AS neg_sim,
       round(max(CASE WHEN same THEN sim END)
             - max(CASE WHEN NOT same THEN sim END), 6) AS margin
FROM top GROUP BY q_id ORDER BY q_id"""


def embedding_pca_power(
    embeddings: DataFrame, iterations: int = 4, dim: int = EMBEDDING_DIM
) -> DataFrame:
    """Dominant principal component of the embedding cloud by a
    FIXED-iteration power method over the exact integer covariance of
    SQ8-quantized vectors — the "is there one axis eating my embedding
    space" audit (anisotropy is the classic failure of contrastive
    encoders, public). Vectors quantize exactly as ann_sq8_topk does
    (``floor(x*127/max|x|)``); the centered scaled covariance
    ``C[i,j] = n*S_ij - S_i*S_j`` is integer-exact on DECIMAL(38,0)
    (HUGEINT in DuckDB), and each of the ``iterations`` steps is
    ``v' = floor_signsplit((C @ v) * 1e6 / max|C @ v|)`` — the same
    recurrence both engines unroll, so the result hash-checks without
    any convergence question. Output: the direction in exact ppm per
    dimension plus the explained-variance share
    ``(v'Cv / v'v) * 1e6 div trace(C)`` (two documented floors).

    Scale shape (100 TB): the Gram pass explodes each vector's upper
    triangle inside codegen (no self-join — ``transform`` over array
    slices) and map-side-combines to d(d+1)/2 keys, the ONE corpus-sized
    stage. The mirrored d^2-row matrix is localCheckpoint'd once, and
    every iteration is broadcast joins over d-row frames (each step's
    matvec also checkpointed, keeping the lazy plan linear in
    ``iterations`` — the markov_stationary_event_mix lesson)."""
    from datafusion_pinot_spark.functions import as_double_array

    def q8(col):
        v = as_double_array(col)
        maxabs = F.array_max(F.transform(v, lambda x: F.abs(x)))
        return F.when(
            maxabs > 0,
            F.transform(
                v, lambda x: F.floor(x * F.lit(127.0) / maxabs).cast("long")
            ),
        ).otherwise(F.transform(v, lambda x: F.lit(0).cast("long")))

    emb = embeddings.select(q8(F.col("embedding")).alias("q"))
    upper = emb.select(
        F.explode(
            F.expr(
                "flatten(transform(q, (x, i) ->"
                " transform(slice(q, i + 1, size(q) - i),"
                " (y, j0) -> struct(i AS i, i + j0 AS j,"
                " CAST(x AS BIGINT) * y AS p))))"
            )
        ).alias("e")
    ).select("e.i", "e.j", "e.p")
    sums = (
        emb.select(F.posexplode("q").alias("i", "qi"))
        .groupBy("i")
        .agg(F.sum("qi").alias("s"))
    )
    n_ = emb.agg(F.count(F.lit(1)).alias("n"))
    gram = upper.groupBy("i", "j").agg(F.sum("p").alias("sij"))
    si = sums.select(F.col("i").alias("gi"), F.col("s").alias("s_i"))
    sj = sums.select(F.col("i").alias("gj"), F.col("s").alias("s_j"))
    cov_upper = (
        gram.join(F.broadcast(si), gram.i == si.gi)
        .join(F.broadcast(sj), gram.j == sj.gj)
        .crossJoin(F.broadcast(n_))
        .select(
            "i",
            "j",
            F.expr(
                "CAST(n AS DECIMAL(38,0)) * sij"
                " - CAST(s_i AS DECIMAL(38,0)) * s_j"
            ).alias("c"),
        )
    )
    mat = (
        cov_upper.unionAll(
            cov_upper.filter(F.col("i") != F.col("j")).select(
                F.col("j").alias("i"), F.col("i").alias("j"), "c"
            )
        )
        .localCheckpoint(eager=False)
    )
    v = mat.select("i").distinct().select(
        F.col("i").alias("dim"), F.lit(1000000).cast("long").alias("v")
    )
    w = None
    for _ in range(iterations):
        w = (
            mat.join(F.broadcast(v), mat.j == v.dim)
            .groupBy("i")
            .agg(F.sum(F.expr("c * v")).alias("w"))
            .localCheckpoint(eager=False)
        )
        m = w.agg(F.max(F.abs(F.col("w"))).alias("m"))
        prev_v = v
        v = (
            w.crossJoin(F.broadcast(m))
            .select(
                F.col("i").alias("dim"),
                F.expr(
                    "CAST(CASE WHEN m = 0 THEN 0"
                    " WHEN w >= 0 THEN (w * 1000000) div m"
                    " ELSE -(((-w) * 1000000) div m) END AS BIGINT)"
                ).alias("v"),
            )
        )
    # Rayleigh quotient on the LAST pre-normalization pair (prev_v, w):
    # rq = (v . w) / (v . v), then its share of trace(C) in ppm.
    vw = (
        prev_v.join(w, prev_v.dim == w.i)
        .agg(
            F.sum(F.expr("v * w")).alias("svw"),
            F.sum(F.expr("CAST(v AS DECIMAL(38,0)) * v")).alias("svv"),
        )
    )
    trace = mat.filter(F.col("i") == F.col("j")).agg(
        F.sum("c").alias("tr")
    )
    share = vw.crossJoin(F.broadcast(trace)).select(
        F.expr(
            "CAST(CASE WHEN svv = 0 OR tr = 0 THEN 0"
            " ELSE (svw div svv) * 1000000 div tr END AS BIGINT)"
        ).alias("explained_share_ppm")
    )
    return (
        v.crossJoin(F.broadcast(share))
        .select(
            F.col("dim").cast("int").alias("dim"),
            F.col("v").alias("v_ppm"),
            "explained_share_ppm",
        )
        .orderBy("dim")
    )


def embedding_pca_power_oracle_sql(
    iterations: int = 4, dim: int = EMBEDDING_DIM
) -> str:
    steps = []
    prev = "v0"
    for k in range(1, iterations + 1):
        steps.append(
            f"""w{k} AS MATERIALIZED (
  SELECT mat.i, sum(mat.c * {prev}.v) AS w
  FROM mat JOIN {prev} ON mat.j = {prev}.dim GROUP BY mat.i
), m{k} AS MATERIALIZED (SELECT max(abs(w)) AS m FROM w{k}),
v{k} AS MATERIALIZED (
  SELECT i AS dim,
         CAST(CASE WHEN m = 0 THEN 0
              WHEN w >= 0 THEN (w * 1000000) // m
              ELSE -(((-w) * 1000000) // m) END AS BIGINT) AS v
  FROM w{k} CROSS JOIN m{k}
)"""
        )
        prev = f"v{k}"
    last_v, last_w = f"v{iterations - 1}" if iterations > 1 else "v0", f"w{iterations}"
    return f"""
WITH emb AS MATERIALIZED (
  SELECT CASE WHEN list_max(list_transform(embedding,
                x -> abs(CAST(x AS DOUBLE)))) > 0
         THEN list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 /
                     list_max(list_transform(embedding,
                       y -> abs(CAST(y AS DOUBLE))))) AS BIGINT))
         ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END AS q
  FROM embeddings
), dims AS (SELECT unnest(range(1, {dim + 1})) AS d),
e AS MATERIALIZED (
  SELECT rowid AS vid, d - 1 AS i, q[d] AS qi
  FROM (SELECT row_number() OVER () AS rowid, q FROM emb) CROSS JOIN dims
), sums AS (
  SELECT i, CAST(sum(qi) AS BIGINT) AS s FROM e GROUP BY i
), n_ AS (SELECT CAST(count(*) AS BIGINT) AS n FROM emb),
gram AS (
  SELECT a.i AS i, b.i AS j, sum(a.qi * b.qi) AS sij
  FROM e a JOIN e b ON a.vid = b.vid AND b.i >= a.i
  GROUP BY a.i, b.i
), cov_upper AS (
  SELECT g.i, g.j,
         CAST(n AS HUGEINT) * sij
         - CAST(si.s AS HUGEINT) * sj.s AS c
  FROM gram g
  JOIN sums si ON g.i = si.i JOIN sums sj ON g.j = sj.i
  CROSS JOIN n_
), mat AS MATERIALIZED (
  SELECT i, j, c FROM cov_upper
  UNION ALL
  SELECT j AS i, i AS j, c FROM cov_upper WHERE i <> j
), v0 AS (
  SELECT DISTINCT i AS dim, CAST(1000000 AS BIGINT) AS v FROM mat
), {", ".join(steps)},
vw AS (
  SELECT sum(p.v * w.w) AS svw,
         sum(CAST(p.v AS HUGEINT) * p.v) AS svv
  FROM {last_v} p JOIN {last_w} w ON p.dim = w.i
), trace AS (SELECT sum(c) AS tr FROM mat WHERE i = j),
share AS (
  SELECT CAST(CASE WHEN svv = 0 OR tr = 0 THEN 0
              ELSE (svw // svv) * 1000000 // tr END AS BIGINT)
           AS explained_share_ppm
  FROM vw CROSS JOIN trace
)
SELECT CAST(dim AS INTEGER) AS dim, v AS v_ppm, explained_share_ppm
FROM v{iterations} CROSS JOIN share ORDER BY dim"""


def mmr_diverse_topk(
    embeddings: DataFrame, anchor_id: int = 0, k: int = 5,
    dim: int = EMBEDDING_DIM,
) -> DataFrame:
    """Maximal Marginal Relevance selection (Carbonell & Goldstein 1998,
    public) — the diversity-aware top-k every retrieval/data-curation
    stack bolts onto plain similarity: items are picked greedily by
    ``7*rel - 3*max_sim_to_already_selected`` (lambda = 0.7 multiplied
    out to integers). Relevance and redundancy are SQ8 integer dot
    products (the ann_sq8_topk quantization), so every comparison is
    BIGINT-exact and the greedy trace is the same in both engines; ties
    break on ascending vec_id. The first pick scores ``7*rel`` (empty
    selected set = zero redundancy).

    Scale shape (100 TB): one corpus scan quantizes and scores
    relevance against the broadcast anchor (codegen); each of the k-1
    greedy steps joins candidates to the <=k-row selected set
    (broadcast) for the redundancy max and takes a TakeOrdered(1) —
    never a window, never a corpus self-join. Each step's pick is
    localCheckpoint'd so the lazy plan stays linear in k."""
    from datafusion_pinot_spark.functions import as_double_array

    def q8(col):
        v = as_double_array(col)
        maxabs = F.array_max(F.transform(v, lambda x: F.abs(x)))
        return F.when(
            maxabs > 0,
            F.transform(
                v, lambda x: F.floor(x * F.lit(127.0) / maxabs).cast("long")
            ),
        ).otherwise(F.transform(v, lambda x: F.lit(0).cast("long")))

    def qdot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    emb = embeddings.select("vec_id", q8(F.col("embedding")).alias("q"))
    anchor = emb.filter(F.col("vec_id") == anchor_id).select(
        F.col("q").alias("a_q")
    )
    scored = (
        emb.filter(F.col("vec_id") != anchor_id)
        .crossJoin(F.broadcast(anchor))
        .select("vec_id", "q", qdot(F.col("q"), F.col("a_q")).alias("rel"))
        .localCheckpoint(eager=False)
    )
    first = (
        scored.orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(1)
        .select(
            "vec_id", "q", "rel",
            F.expr("7 * rel").alias("mmr_score"),
            F.lit(1).cast("int").alias("rk"),
        )
        .localCheckpoint(eager=False)
    )
    selected = first
    for step in range(2, k + 1):
        sel_small = selected.select(
            F.col("vec_id").alias("s_id"), F.col("q").alias("s_q")
        )
        red = (
            scored.join(
                selected.select(F.col("vec_id").alias("s_id")),
                F.col("vec_id") == F.col("s_id"),
                "left_anti",
            )
            .crossJoin(F.broadcast(sel_small))
            .select(
                "vec_id", "q", "rel",
                qdot(F.col("q"), F.col("s_q")).alias("sdot"),
            )
            .groupBy("vec_id", "q", "rel")
            .agg(F.max("sdot").alias("max_sel"))
        )
        pick = (
            red.select(
                "vec_id", "q", "rel",
                F.expr("7 * rel - 3 * max_sel").alias("mmr_score"),
            )
            .orderBy(F.desc("mmr_score"), F.asc("vec_id"))
            .limit(1)
            .select(
                "vec_id", "q", "rel", "mmr_score",
                F.lit(step).cast("int").alias("rk"),
            )
            .localCheckpoint(eager=False)
        )
        selected = selected.unionAll(pick)
    return selected.select("rk", "vec_id", "rel", "mmr_score").orderBy("rk")


def mmr_diverse_topk_oracle_sql(
    anchor_id: int = 0, k: int = 5, dim: int = EMBEDDING_DIM
) -> str:
    dot = (
        "list_reduce(list_transform(generate_series(1, {d}),"
        " i -> {a}[i] * {b}[i]), (p, q) -> p + q)"
    )
    steps = []
    prev_sel = "s1"
    for step in range(2, k + 1):
        steps.append(
            f"""r{step} AS MATERIALIZED (
  SELECT c.vec_id, c.q, c.rel,
         max({dot.format(d=dim, a="c.q", b="s.q")}) AS max_sel
  FROM scored c CROSS JOIN {prev_sel} s
  WHERE c.vec_id NOT IN (SELECT vec_id FROM {prev_sel})
  GROUP BY c.vec_id, c.q, c.rel
), p{step} AS MATERIALIZED (
  SELECT vec_id, q, rel, 7 * rel - 3 * max_sel AS mmr_score,
         {step} AS rk
  FROM r{step} ORDER BY mmr_score DESC, vec_id ASC LIMIT 1
), s{step} AS MATERIALIZED (
  SELECT vec_id, q, rel, mmr_score, rk FROM {prev_sel}
  UNION ALL SELECT vec_id, q, rel, mmr_score, rk FROM p{step}
)"""
        )
        prev_sel = f"s{step}"
    return f"""
WITH emb AS MATERIALIZED (
  SELECT vec_id,
         CASE WHEN list_max(list_transform(embedding,
                x -> abs(CAST(x AS DOUBLE)))) > 0
         THEN list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 /
                     list_max(list_transform(embedding,
                       y -> abs(CAST(y AS DOUBLE))))) AS BIGINT))
         ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END AS q
  FROM embeddings
), anchor AS (SELECT q AS a_q FROM emb WHERE vec_id = {anchor_id}),
scored AS MATERIALIZED (
  SELECT e.vec_id, e.q,
         {dot.format(d=dim, a="e.q", b="a.a_q")} AS rel
  FROM emb e CROSS JOIN anchor a WHERE e.vec_id <> {anchor_id}
), s1 AS MATERIALIZED (
  SELECT vec_id, q, rel, 7 * rel AS mmr_score, 1 AS rk
  FROM scored ORDER BY rel DESC, vec_id ASC LIMIT 1
), {", ".join(steps)}
SELECT CAST(rk AS INTEGER) AS rk, vec_id, CAST(rel AS BIGINT) AS rel,
       CAST(mmr_score AS BIGINT) AS mmr_score
FROM {prev_sel} ORDER BY rk"""


def embedding_quantization_error_curve(
    embeddings: DataFrame,
    bits: tuple[int, ...] = (8, 4, 2),
    dim: int = EMBEDDING_DIM,
) -> DataFrame:
    """Reconstruction-error curve for symmetric per-vector scalar
    quantization at b bits — the design table behind the SQ8 choice the
    ANN family already ships (ann_sq8_topk, sq8_recall_audit): before
    compressing a 100 TB embedding store 4x further, read what SQ4/SQ2
    would cost in reconstruction error. Components ride the house milli
    grid (floor(x*1000+0.5)); per vector, magnitudes quantize to
    ``q = |x_milli| * qmax div maxabs`` (qmax = 2^(b-1)-1) with the sign
    carried separately — all-integer, so the per-bits SSE, per-dim MSE
    and max absolute error hash-match DuckDB exactly. The b-bit rows
    are monotone: halving qmax can only grow every error column.

    Scale shape (100 TB): ONE corpus scan; the |bits| legs explode a
    3-wide literal array per component (bounded fanout), and everything
    reduces in a single map-side-combined aggregate. No joins, no
    windows."""
    from datafusion_pinot_spark.functions import as_double_array

    blist = ", ".join(str(b) for b in bits)
    comp = embeddings.select(
        "vec_id",
        F.explode(
            F.transform(
                as_double_array(F.col("embedding")),
                lambda x: F.floor(x * F.lit(1000.0) + F.lit(0.5)).cast(
                    "long"
                ),
            )
        ).alias("xm"),
    )
    wv = Window.partitionBy("vec_id")
    withmax = comp.select(
        "vec_id", "xm", F.max(F.abs(F.col("xm"))).over(wv).alias("maxabs")
    )
    legs = withmax.select(
        "xm",
        "maxabs",
        F.explode(F.expr(f"array({blist})")).alias("b"),
    ).select(
        "b",
        F.expr("CAST(shiftleft(1, b - 1) - 1 AS BIGINT)").alias("qmax"),
        "xm",
        "maxabs",
    )
    err = legs.select(
        "b",
        F.expr(
            "CASE WHEN maxabs = 0 THEN 0 ELSE xm - CAST(sign(xm) AS BIGINT)"
            " * (((abs(xm) * qmax) div maxabs) * maxabs div qmax) END"
        ).alias("e"),
    )
    return (
        err.groupBy("b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_values"),
            F.sum(F.expr("CAST(e AS DECIMAL(38,0)) * e"))
            .cast("long")
            .alias("sse_milli2"),
            F.max(F.abs(F.col("e"))).cast("long").alias("max_abs_err_milli"),
        )
        .select(
            F.col("b").cast("int").alias("b"),
            "n_values",
            "sse_milli2",
            F.expr("CAST(sse_milli2 div n_values AS BIGINT)").alias(
                "mse_milli2"
            ),
            "max_abs_err_milli",
        )
        .orderBy("b")
    )


def embedding_quantization_error_curve_oracle_sql(
    bits: tuple[int, ...] = (8, 4, 2), dim: int = EMBEDDING_DIM
) -> str:
    blist = ", ".join(str(b) for b in bits)
    return f"""
WITH comp AS (
  SELECT vec_id,
         unnest(list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0 + 0.5) AS BIGINT)))
           AS xm
  FROM embeddings
), mx AS (
  SELECT vec_id, max(abs(xm)) AS maxabs FROM comp GROUP BY vec_id
), legs AS (
  SELECT b.b, CAST((1 << (b.b - 1)) - 1 AS BIGINT) AS qmax, c.xm, m.maxabs
  FROM comp c JOIN mx m ON c.vec_id = m.vec_id
  CROSS JOIN (SELECT unnest([{blist}]) AS b) b
), err AS (
  SELECT b, CASE WHEN maxabs = 0 THEN 0
           ELSE xm - CAST(sign(xm) AS BIGINT)
                * (((abs(xm) * qmax) // maxabs) * maxabs // qmax) END AS e
  FROM legs
)
SELECT CAST(b AS INTEGER) AS b,
       CAST(count(*) AS BIGINT) AS n_values,
       CAST(sum(CAST(e AS HUGEINT) * e) AS BIGINT) AS sse_milli2,
       CAST(sum(CAST(e AS HUGEINT) * e) // count(*) AS BIGINT) AS mse_milli2,
       CAST(max(abs(e)) AS BIGINT) AS max_abs_err_milli
FROM err GROUP BY b ORDER BY b"""


def ivf_probe_tuning_curve(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = IVF_CENTROIDS,
    probes_list: tuple[int, ...] = (1, 2, 4, 8),
) -> DataFrame:
    """The nprobe tuning table for the IVF ANN index — the vector twin
    of lsh_band_tuning_curve: per probe budget, candidates scanned (the
    cost), exact-cosine hits against the brute-force top-k truth (the
    quality), and recall in ppm. This is the table you read before
    committing an nprobe to a 100 TB serving config; the S-curve's knee
    is usually far below n_centroids.

    Scale shape (100 TB): the list assignment is computed ONCE and
    checkpointed (the r14 lsh-curve lesson: multi-config audits must
    share their substrate); each config leg re-ranks only its probed
    lists' candidates; the brute-force truth leg is the audit's one
    expensive pass, paid once (production audits run it on a query
    sample). All counting joins are broadcast-sized."""
    emb = embeddings.select("vec_id", as_double_array("embedding").alias("v"))
    centroids, assigned = _ivf_assignments(emb, n_centroids)
    assigned = assigned.localCheckpoint(eager=True)
    truth = brute_force_topk(embeddings, query_ids, k).select(
        "q_id", "vec_id"
    )
    truth = truth.localCheckpoint(eager=False)
    n_truth = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    queries = assigned.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("q_v"),
        F.col("nv").alias("q_nv"),
    )
    qc = queries.crossJoin(F.broadcast(centroids)).select(
        "q_id",
        "q_v",
        "q_nv",
        "c_id",
        _cosine_with_norms(
            F.col("q_v"), F.col("c_v"), F.col("q_nv"), F.col("c_nv")
        ).alias("c_sim"),
    )
    wq = Window.partitionBy("q_id").orderBy(F.desc("c_sim"), F.asc("c_id"))
    ranked_probes = qc.withColumn("p", F.row_number().over(wq)).select(
        "q_id", "q_v", "q_nv", "c_id", "p"
    ).localCheckpoint(eager=False)
    legs = []
    for nprobe in probes_list:
        probes = ranked_probes.filter(F.col("p") <= nprobe).drop("p")
        cand = assigned.join(
            F.broadcast(probes),
            (assigned["c_id"] == probes["c_id"])
            & (F.col("vec_id") != F.col("q_id")),
        )
        scored = cand.select(
            "q_id",
            "vec_id",
            F.round(
                _cosine_with_norms(
                    F.col("q_v"), F.col("v"), F.col("q_nv"), F.col("nv")
                ),
                6,
            ).alias("sim"),
        )
        w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
        top = (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("q_id", "vec_id")
        )
        n_cand = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
        n_hits = top.join(
            F.broadcast(truth), ["q_id", "vec_id"], "left_semi"
        ).agg(F.count(F.lit(1)).alias("n_hits"))
        legs.append(
            n_cand.crossJoin(n_hits).select(
                F.lit(nprobe).cast("int").alias("nprobe"),
                F.col("n_candidates").cast("long").alias("n_candidates"),
                F.col("n_hits").cast("long").alias("n_hits"),
            )
        )
    curve = legs[0]
    for leg in legs[1:]:
        curve = curve.unionByName(leg)
    return (
        curve.crossJoin(F.broadcast(n_truth))
        .select(
            "nprobe",
            "n_candidates",
            "n_hits",
            F.col("n_truth").cast("long").alias("n_truth"),
            F.expr(
                "CAST(CASE WHEN n_truth = 0 THEN 0"
                " ELSE n_hits * 1000000 div n_truth END AS BIGINT)"
            ).alias("recall_ppm"),
        )
        .orderBy("nprobe")
    )


def ivf_probe_tuning_curve_oracle_sql(
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = IVF_CENTROIDS,
    probes_list: tuple[int, ...] = (1, 2, 4, 8),
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    sim_vc = _cosine_sql("e.v", "c.c_v")
    sim_qc = _cosine_sql("q.q_v", "c.c_v")
    sim_qe = _cosine_sql("p.q_v", "a.v")
    sim_bf = _cosine_sql("q.q_v", "e.v")
    legs = []
    for nprobe in probes_list:
        legs.append(
            f"""SELECT CAST({nprobe} AS INTEGER) AS nprobe,
       (SELECT CAST(count(*) AS BIGINT) FROM cand WHERE p_max <= {nprobe})
         AS n_candidates,
       (SELECT CAST(count(*) AS BIGINT) FROM (
          SELECT q_id, vec_id FROM (
            SELECT q_id, vec_id,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY sim DESC, vec_id ASC) AS rnk
            FROM cand WHERE p_max <= {nprobe}
          ) WHERE rnk <= {k}
        ) t JOIN truth USING (q_id, vec_id)) AS n_hits"""
        )
    union = " UNION ALL ".join(f"({l})" for l in legs)
    return f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), centroids AS (
  SELECT vec_id AS c_id, v AS c_v FROM emb WHERE vec_id < {n_centroids}
), assigned AS (
  SELECT vec_id, v, c_id FROM (
    SELECT e.vec_id, e.v, c.c_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {sim_vc} DESC, c.c_id ASC) AS rnk
    FROM emb e CROSS JOIN centroids c
  ) WHERE rnk = 1
), q AS (
  SELECT vec_id AS q_id, v AS q_v FROM emb WHERE vec_id IN ({ids})
), probes AS (
  SELECT q_id, q_v, c_id, p FROM (
    SELECT q.q_id, q.q_v, c.c_id,
           row_number() OVER (PARTITION BY q.q_id
                              ORDER BY {sim_qc} DESC, c.c_id ASC) AS p
    FROM q CROSS JOIN centroids c
  )
), cand AS MATERIALIZED (
  SELECT p.q_id, a.vec_id, p.p AS p_max, round({sim_qe}, 6) AS sim
  FROM assigned a JOIN probes p ON a.c_id = p.c_id AND a.vec_id <> p.q_id
), truth AS MATERIALIZED (
  SELECT q_id, vec_id FROM (
    SELECT q.q_id, e.vec_id,
           row_number() OVER (PARTITION BY q.q_id
                              ORDER BY round({sim_bf}, 6) DESC,
                                       e.vec_id ASC) AS rnk
    FROM emb e CROSS JOIN q WHERE e.vec_id <> q.q_id
  ) WHERE rnk <= {k}
)
SELECT nprobe, n_candidates, n_hits,
       (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_truth,
       CAST(CASE WHEN (SELECT count(*) FROM truth) = 0 THEN 0
            ELSE n_hits * 1000000 // (SELECT count(*) FROM truth)
            END AS BIGINT) AS recall_ppm
FROM ({union}) ORDER BY nprobe"""


def embedding_decontam_audit(
    embeddings: DataFrame,
    valid_mod: int = 10,
    threshold_milli: int = 400,
    k_pairs: int = 10,
) -> DataFrame:
    """Semantic (embedding-space) eval-set contamination audit — the
    vector-side complement of the n-gram bloom_decontam_audit: split
    vectors by the deterministic ``vec_id % valid_mod`` rule (the same
    shape the hash-split audits use), then flag every VALID vector whose
    max cosine against any TRAIN vector clears ``threshold_milli`` — an
    eval example that near-duplicates training data measures
    memorization, not generalization (real deployments calibrate the
    threshold on their embedding model — 950 milli is typical for
    near-duplicates; the default 400 sits at the synthetic corpus's
    upper tail so the audit's pair path stays exercised under the
    oracle gate). Output: one summary row (q_id=-1:
    valid size, train size, contaminated count, contamination ppm)
    followed by the top-``k_pairs`` offending (valid, train) pairs by
    similarity — the rows a curation pass would actually go read.
    Cosines round at 6 decimals before any comparison (the house ANN
    determinism fence); the threshold compares on the exact milli
    integer ``floor(round(sim,6) * 1000)``.

    Scale shape (100 TB): the audit leg is a |valid| x |train| narrow
    map with the small (1/valid_mod) side broadcast — the same shape as
    brute_force_topk, bounded by the split fraction; a full-corpus
    production run would LSH-bucket the candidates first
    (lsh_bucketed_topk) and pay this exact scoring only inside buckets.
    One partitioned argmax window on the valid key; a TakeOrdered tail."""
    emb = embeddings.select("vec_id", as_double_array("embedding").alias("v"))
    valid = emb.filter(F.col("vec_id") % valid_mod == valid_mod - 1).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("q_v")
    )
    train = emb.filter(F.col("vec_id") % valid_mod != valid_mod - 1)
    scored = train.crossJoin(F.broadcast(valid)).select(
        "q_id",
        "vec_id",
        F.round(cosine_similarity(F.col("q_v"), F.col("v")), 6).alias("sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    best = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(
            "q_id",
            "vec_id",
            F.expr("CAST(floor(sim * 1000) AS BIGINT)").alias("sim_milli"),
        )
        .localCheckpoint(eager=False)
    )
    n_valid = valid.agg(F.count(F.lit(1)).alias("nv"))
    n_train = train.agg(F.count(F.lit(1)).alias("nt"))
    contaminated = best.filter(F.col("sim_milli") >= threshold_milli)
    summary = (
        contaminated.agg(F.count(F.lit(1)).alias("nc"))
        .crossJoin(F.broadcast(n_valid))
        .crossJoin(F.broadcast(n_train))
        .select(
            F.lit(-1).cast("long").alias("q_id"),
            F.lit(-1).cast("long").alias("train_id"),
            F.col("nv").cast("long").alias("n_valid"),
            F.col("nt").cast("long").alias("n_train"),
            F.col("nc").cast("long").alias("n_contaminated"),
            F.expr(
                "CAST(CASE WHEN nv = 0 THEN 0"
                " ELSE nc * 1000000 div nv END AS BIGINT)"
            ).alias("contamination_ppm"),
            F.lit(-1).cast("long").alias("sim_milli"),
        )
    )
    pairs = (
        contaminated.orderBy(F.desc("sim_milli"), F.asc("q_id"))
        .limit(k_pairs)
        .crossJoin(F.broadcast(n_valid))
        .crossJoin(F.broadcast(n_train))
        .select(
            F.col("q_id").cast("long").alias("q_id"),
            F.col("vec_id").cast("long").alias("train_id"),
            F.col("nv").cast("long").alias("n_valid"),
            F.col("nt").cast("long").alias("n_train"),
            F.lit(-1).cast("long").alias("n_contaminated"),
            F.lit(-1).cast("long").alias("contamination_ppm"),
            "sim_milli",
        )
    )
    return summary.unionByName(pairs).orderBy(
        F.asc("q_id"), F.asc("train_id")
    )


def embedding_decontam_audit_oracle_sql(
    valid_mod: int = 10, threshold_milli: int = 400, k_pairs: int = 10
) -> str:
    sim = _cosine_sql("q.q_v", "t.v")
    return f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), valid AS (
  SELECT vec_id AS q_id, v AS q_v FROM emb
  WHERE vec_id % {valid_mod} = {valid_mod - 1}
), train AS (
  SELECT vec_id, v FROM emb WHERE vec_id % {valid_mod} <> {valid_mod - 1}
), best AS MATERIALIZED (
  SELECT q_id, vec_id,
         CAST(floor(sim * 1000) AS BIGINT) AS sim_milli
  FROM (
    SELECT q.q_id, t.vec_id, round({sim}, 6) AS sim,
           row_number() OVER (PARTITION BY q.q_id
                              ORDER BY round({sim}, 6) DESC,
                                       t.vec_id ASC) AS rnk
    FROM train t CROSS JOIN valid q
  ) WHERE rnk = 1
), nv AS (SELECT count(*) AS nv FROM valid),
nt AS (SELECT count(*) AS nt FROM train),
contaminated AS (
  SELECT * FROM best WHERE sim_milli >= {threshold_milli}
), summary AS (
  SELECT CAST(-1 AS BIGINT) AS q_id, CAST(-1 AS BIGINT) AS train_id,
         CAST(nv AS BIGINT) AS n_valid, CAST(nt AS BIGINT) AS n_train,
         (SELECT CAST(count(*) AS BIGINT) FROM contaminated)
           AS n_contaminated,
         CAST(CASE WHEN nv = 0 THEN 0
              ELSE (SELECT count(*) FROM contaminated) * 1000000 // nv
              END AS BIGINT) AS contamination_ppm,
         CAST(-1 AS BIGINT) AS sim_milli
  FROM nv CROSS JOIN nt
), pairs AS (
  SELECT CAST(c.q_id AS BIGINT) AS q_id,
         CAST(c.vec_id AS BIGINT) AS train_id,
         CAST(nv AS BIGINT) AS n_valid, CAST(nt AS BIGINT) AS n_train,
         CAST(-1 AS BIGINT) AS n_contaminated,
         CAST(-1 AS BIGINT) AS contamination_ppm,
         c.sim_milli
  FROM (SELECT * FROM contaminated
        ORDER BY sim_milli DESC, q_id ASC LIMIT {k_pairs}) c
  CROSS JOIN nv CROSS JOIN nt
)
SELECT * FROM (SELECT * FROM summary UNION ALL SELECT * FROM pairs)
ORDER BY q_id ASC, train_id ASC"""

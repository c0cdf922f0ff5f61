"""Record linkage and spatial-join operators.

Entity resolution over 100 TB never compares all pairs: both operators here
use the standard two-phase shape — a cheap *blocking* (or gridding) pass
that bounds the candidate set, then an exact verify only inside each block.
The oracles intentionally verify with the NAIVE quadratic formulation (fine
at driver SF), so a driver-green row proves the blocked/gridded engine plan
loses no pair the naive definition finds.

Reference scope note: the reference engine (wirybeaver/datafusion-pinot)
delegates its relational surface to DataFusion and has no linkage ops; these
extend the LLM-pipeline/curation tier (SURVEY.md §7.7) the same way the
dedup family does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def blocked_levenshtein_pairs(
    part: DataFrame, max_dist: int = 2, block_cap: int = 10_000,
    warn_dropped: bool = True,
) -> DataFrame:
    """Fuzzy record linkage over part names: block on ``p_brand``, then an
    exact edit-distance verify *within* each block.

    The classic linkage economics: a same-brand block turns the all-pairs
    O(N^2) comparison into sum-of-squares over block sizes. At 100 TB the
    block join is a single hash shuffle on the blocking key and each block
    compares independently; ``block_cap`` guards against a degenerate
    blocking key (one brand owning the corpus) the same way
    ``max_bucket_size`` guards the MinHash-LSH buckets — capped blocks are
    *dropped, loudly* (a real pipeline would re-block them on a finer key),
    never silently exploded into a quadratic task.

    Spark's ``levenshtein`` and DuckDB's agree on classic unit-cost edit
    distance, so the threshold join is oracle-exact.

    The naive oracle has no cap, so a dropped block is an engine/oracle
    divergence by design: with ``warn_dropped`` (default) the operator
    counts over-cap blocks driver-side (one tiny extra agg over the
    blocking key) and emits a ``warnings.warn`` naming them, so the
    divergence is detectable rather than silent. At driver SF no brand
    block approaches the 10k cap (tests pin the drop behavior directly).
    """
    import warnings

    # block sizes first: a block over the cap is excluded from pairing
    sizes = part.groupBy("p_brand").agg(F.count("*").alias("_bsz"))
    if warn_dropped:
        dropped = sizes.filter(F.col("_bsz") > block_cap).count()
        if dropped:
            warnings.warn(
                f"blocked_levenshtein_pairs: {dropped} block(s) exceed "
                f"block_cap={block_cap} and are dropped from pairing; "
                "the naive oracle WILL diverge — re-block on a finer key",
                stacklevel=2,
            )
    ok = part.join(
        F.broadcast(sizes.filter(F.col("_bsz") <= block_cap)), "p_brand"
    )
    a = ok.select(
        F.col("p_brand"),
        F.col("p_partkey").alias("a_key"),
        F.col("p_name").alias("a_name"),
    )
    b = ok.select(
        F.col("p_brand"),
        F.col("p_partkey").alias("b_key"),
        F.col("p_name").alias("b_name"),
    )
    return (
        a.join(b, "p_brand")
        .filter(F.col("a_key") < F.col("b_key"))
        .withColumn("dist", F.levenshtein("a_name", "b_name"))
        .filter(F.col("dist") <= max_dist)
        .select("p_brand", "a_key", "b_key", "a_name", "b_name", "dist")
    )


def blocked_levenshtein_pairs_oracle_sql(max_dist: int = 2) -> str:
    # naive within-block quadratic — verifies the engine's blocked plan
    # drops nothing (no block exceeds the cap at driver SF)
    return f"""
SELECT a.p_brand, a.p_partkey AS a_key, b.p_partkey AS b_key,
       a.p_name AS a_name, b.p_name AS b_name,
       levenshtein(a.p_name, b.p_name) AS dist
FROM part a
JOIN part b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= {max_dist}
"""


# --- deterministic synthetic coordinates -----------------------------------
# Positions are derived from the entity key by fixed multiplicative hashing
# into a 100 km x 100 km integer-meter plane: pure integer arithmetic both
# engines compute identically (no trig, no floats — cross-engine libm drift
# is exactly the hazard the integer-metric design avoids).
_XMUL, _YMUL, _SPAN = 48271, 69621, 100_000


def _coords(df: DataFrame, key: str, x: str, y: str) -> DataFrame:
    return df.withColumn(x, (F.col(key) * _XMUL) % _SPAN).withColumn(
        y, (F.col(key) * _YMUL) % _SPAN
    )


def geo_radius_counts(
    customer: DataFrame, supplier: DataFrame, radius_m: int = 1500
) -> DataFrame:
    """Per-supplier count of customers within ``radius_m`` meters — the
    gridded spatial join.

    Scale shape: both sides land on a square grid of ``radius_m``-sized
    cells; a customer can only be in range of suppliers in its own or the 8
    neighboring cells, so the supplier side explodes x9 (tiny dimension) and
    the join is a plain equi-join on cell id — one bounded shuffle, no
    cross join. The verify predicate is integer ``dx^2 + dy^2 <= r^2``
    (exact; no sqrt). The oracle is the naive all-pairs distance filter, so
    green means the 3x3 neighborhood provably covers the radius.
    """
    cust = _coords(customer.select("c_custkey"), "c_custkey", "cx", "cy")
    supp = _coords(supplier.select("s_suppkey"), "s_suppkey", "sx", "sy")
    # supplier side: own cell + 8 neighbors (the side that explodes must be
    # the small one; suppliers are the dimension here)
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    s9 = (
        supp.withColumn("o", F.explode(offs))
        .select(
            "s_suppkey",
            "sx",
            "sy",
            (F.floor(F.col("sx") / radius_m) + F.col("o.dx")).alias("cellx"),
            (F.floor(F.col("sy") / radius_m) + F.col("o.dy")).alias("celly"),
        )
    )
    c = cust.select(
        "c_custkey",
        "cx",
        "cy",
        F.floor(F.col("cx") / radius_m).alias("cellx"),
        F.floor(F.col("cy") / radius_m).alias("celly"),
    )
    hits = (
        c.join(F.broadcast(s9), ["cellx", "celly"])
        .filter(
            (F.col("cx") - F.col("sx")) * (F.col("cx") - F.col("sx"))
            + (F.col("cy") - F.col("sy")) * (F.col("cy") - F.col("sy"))
            <= F.lit(radius_m * radius_m)
        )
        .groupBy("s_suppkey")
        .agg(F.count("*").alias("n_customers"))
    )
    # keep zero-count suppliers: the oracle's LEFT JOIN shape
    return (
        supplier.select("s_suppkey")
        .join(hits, "s_suppkey", "left")
        .select(
            "s_suppkey",
            F.coalesce(F.col("n_customers"), F.lit(0)).alias("n_customers"),
        )
    )


def geo_radius_counts_oracle_sql(radius_m: int = 1500) -> str:
    # naive all-pairs — green proves the grid neighborhood loses no hit
    return f"""
WITH c AS (
  SELECT c_custkey, (c_custkey * {_XMUL}) % {_SPAN} AS cx,
         (c_custkey * {_YMUL}) % {_SPAN} AS cy FROM customer
), s AS (
  SELECT s_suppkey, (s_suppkey * {_XMUL}) % {_SPAN} AS sx,
         (s_suppkey * {_YMUL}) % {_SPAN} AS sy FROM supplier
), hits AS (
  SELECT s.s_suppkey, count(*) AS n_customers
  FROM s JOIN c
    ON (c.cx - s.sx) * (c.cx - s.sx) + (c.cy - s.sy) * (c.cy - s.sy)
       <= {radius_m} * {radius_m}
  GROUP BY s.s_suppkey
)
SELECT s.s_suppkey, coalesce(hits.n_customers, 0) AS n_customers
FROM (SELECT s_suppkey FROM supplier) s
LEFT JOIN hits ON hits.s_suppkey = s.s_suppkey
"""


def entity_cluster_sizes(part: DataFrame, max_dist: int = 2) -> DataFrame:
    """Entity resolution, completed: connected components over the fuzzy
    match edges (same-brand names within ``max_dist`` edits), iterated TO
    CONVERGENCE — not a fixed round count — then rolled up as a cluster
    size histogram (size, n_clusters), singletons included. This is the
    step that turns pairwise linkage into entities: A~B and B~C merge
    A,B,C even when A and C differ by more than the threshold.

    The iteration is synchronous min-label propagation
    (operators/graph.py's round kernel) with a driver-side convergence
    check (one count per round — a scalar, not a data path); each round
    joins against the localCheckpoint'd edge list and cuts lineage. The
    DuckDB oracle computes the SAME fixpoint non-iteratively via a
    recursive transitive-closure CTE — the catalog's only converged-
    fixpoint hash gate, so the loop's termination condition itself is
    verified, not just K unrolled rounds.

    Scale shape: edges come from the blocked join (sum-of-squares over
    block sizes, capped); each round is one co-partitioned join +
    map-side-combined min over the node set. Rounds ~ component
    diameter, which linkage graphs keep tiny."""
    from datafusion_pinot_spark.operators.graph import _label_round

    pairs = blocked_levenshtein_pairs(part, max_dist, warn_dropped=False)
    e = pairs.select(F.col("a_key").alias("src"), F.col("b_key").alias("dst"))
    edges = (
        e.unionAll(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .repartition("src")
        .localCheckpoint()
    )
    lab = (
        part.select(F.col("p_partkey").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lab"))
        .localCheckpoint()
    )
    while True:
        new = _label_round(lab, edges).localCheckpoint()
        changed = (
            new.alias("n")
            .join(lab.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.lab") != F.col("o.lab"))
            .count()  # driver scalar per round: the convergence check
        )
        lab = new
        if changed == 0:
            break
    sizes = lab.groupBy("lab").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .orderBy("cluster_size")
    )


def entity_cluster_sizes_oracle_sql(max_dist: int = 2) -> str:
    """The same fixpoint, non-iteratively: recursive transitive closure
    (UNION-dedup semantics terminate it), component id = min reachable
    node, then the size histogram."""
    return f"""
WITH RECURSIVE pairs AS (
  SELECT a.p_partkey AS a_key, b.p_partkey AS b_key
  FROM part a JOIN part b
    ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
  WHERE levenshtein(a.p_name, b.p_name) <= {max_dist}
), edges AS (
  SELECT a_key AS src, b_key AS dst FROM pairs
  UNION ALL
  SELECT b_key AS src, a_key AS dst FROM pairs
), reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
), comp AS (
  SELECT p.p_partkey AS node,
         least(p.p_partkey, coalesce(m.mn, p.p_partkey)) AS lab
  FROM part p
  LEFT JOIN (SELECT src, min(dst) AS mn FROM reach GROUP BY src) m
    ON m.src = p.p_partkey
), sizes AS (
  SELECT lab, count(*) AS cluster_size FROM comp GROUP BY lab
)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters
FROM sizes GROUP BY cluster_size ORDER BY cluster_size
"""

"""Graph operators over relationally-derived edge sets.

A 100 TB corpus's graph problems (link analysis over a customer-product
bipartite graph, co-occurrence mining over user behavior) are join+groupBy
shapes in Spark — no graph runtime needed. Everything here is *integer
arithmetic only*: PageRank mass is scaled to ``SCALE = 10^12`` and moved
with floor division, so the per-node ranks are bit-identical across engines
(floating PageRank would accumulate in shuffle order and never hash-match a
DuckDB oracle). Two unrolled iterations keep the oracle a plain CTE chain;
the engine-side :func:`pagerank_iterations` loop runs any number with one
shuffle per round and a ``localCheckpoint`` to cut the growing lineage —
the same pattern as the near-dup connected-components operator
(operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SCALE = 10**12
PART_BASE = 10_000_000  # part node-id offset: disjoint from customer keys


def customer_part_edges(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Undirected customer<->part edge list (both directions materialized)
    from the order history: one distinct hash shuffle."""
    cp = (
        lineitem.select("l_orderkey", "l_partkey")
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("o_custkey").alias("c"),
            (F.col("l_partkey") + F.lit(PART_BASE)).alias("p"),
        )
        .distinct()
    )
    return cp.select(F.col("c").alias("src"), F.col("p").alias("dst")).unionAll(
        cp.select(F.col("p").alias("src"), F.col("c").alias("dst"))
    )


def _one_round(pr: DataFrame, edges: DataFrame, deg: DataFrame, n_nodes) -> DataFrame:
    """pr' = 15%*(SCALE//N) + 85% * sum(incoming pr//outdeg), all floor-div."""
    contrib = (
        pr.join(deg, "node")
        .withColumn("give", F.expr("pr div outdeg"))
        .join(edges, F.col("node") == F.col("src"))
        .groupBy(F.col("dst").alias("node"))
        .agg(F.sum("give").alias("got"))
    )
    return contrib.select(
        "node",
        (
            F.expr(f"(15 * ({SCALE} div {n_nodes})) div 100")
            + F.expr("(85 * got) div 100")
        ).alias("pr"),
    )


def pagerank_two_iter(orders: DataFrame, lineitem: DataFrame, k: int = 20) -> DataFrame:
    """Top-``k`` nodes by integer-scaled PageRank after exactly two rounds
    over the customer-part purchase graph. Deterministic: integer mass,
    integer teleport, (pr desc, node asc) tiebreak."""
    edges = customer_part_edges(orders, lineitem)
    # cache the distinct+join subtree: it feeds deg plus both rounds (3 uses)
    edges = edges.repartition("src").localCheckpoint()
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("outdeg")
    )
    n_nodes = deg.count()  # driver-side scalar: one small agg, not a loop
    pr0 = deg.select("node", F.lit(SCALE // n_nodes).cast("long").alias("pr"))
    pr1 = _one_round(pr0, edges, deg, n_nodes)
    pr2 = _one_round(pr1, edges, deg, n_nodes)
    return (
        pr2.orderBy(F.desc("pr"), F.asc("node"))
        .limit(k)
        .select("node", "pr")
    )


def pagerank_iterations(
    orders: DataFrame, lineitem: DataFrame, rounds: int = 10, k: int = 20
) -> DataFrame:
    """The production loop: same round function, arbitrary depth, lineage
    cut per round. Not oracle-able as SQL beyond a few unrolled rounds —
    pinned instead by the pytest equivalence test against
    :func:`pagerank_two_iter` at rounds=2."""
    edges = customer_part_edges(orders, lineitem)
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("outdeg")
    )
    # one shuffle to co-locate: every round joins pr on node==src
    edges = edges.repartition("src").localCheckpoint()
    deg = deg.localCheckpoint()
    n_nodes = deg.count()
    pr = deg.select("node", F.lit(SCALE // n_nodes).cast("long").alias("pr"))
    for _ in range(rounds):
        pr = _one_round(pr, edges, deg, n_nodes).localCheckpoint()
    return pr.orderBy(F.desc("pr"), F.asc("node")).limit(k).select("node", "pr")


def pagerank_two_iter_oracle_sql(k: int = 20) -> str:
    return f"""
WITH cp AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey + {PART_BASE} AS p
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), edges AS (
  SELECT c AS src, p AS dst FROM cp UNION ALL SELECT p AS src, c AS dst FROM cp
), deg AS (
  SELECT src AS node, count(*) AS outdeg FROM edges GROUP BY src
), n AS (
  SELECT count(*) AS n_nodes FROM deg
), pr0 AS (
  SELECT node, {SCALE} // (SELECT n_nodes FROM n) AS pr FROM deg
), pr1 AS (
  SELECT e.dst AS node,
         CAST((15 * ({SCALE} // (SELECT n_nodes FROM n))) // 100
              + (85 * sum(p.pr // d.outdeg)) // 100 AS BIGINT) AS pr
  FROM pr0 p JOIN deg d ON p.node = d.node JOIN edges e ON e.src = p.node
  GROUP BY e.dst
), pr2 AS (
  SELECT e.dst AS node,
         CAST((15 * ({SCALE} // (SELECT n_nodes FROM n))) // 100
              + (85 * sum(p.pr // d.outdeg)) // 100 AS BIGINT) AS pr
  FROM pr1 p JOIN deg d ON p.node = d.node JOIN edges e ON e.src = p.node
  GROUP BY e.dst
)
SELECT node, pr FROM pr2 ORDER BY pr DESC, node ASC LIMIT {k}
"""


def itemset_pair_support(events: DataFrame) -> DataFrame:
    """Pairwise event-type co-occurrence (the 2-itemset support level of
    market-basket mining): for every unordered type pair, how many users
    exhibit both, in basis points of all active users. Distinct-reduce
    first (the only corpus-sized shuffle), then a per-user self-join whose
    fan-out is bounded by the tiny per-user distinct-type count."""
    ut = events.select("user_id", "event_type").distinct()
    total = ut.select("user_id").distinct().count()
    a, b = ut.alias("a"), ut.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("n_users"))
        .withColumn("support_bp", F.expr(f"(n_users * 10000) div {total}"))
        .orderBy(F.desc("n_users"), F.asc("type_a"), F.asc("type_b"))
    )


def itemset_pair_support_oracle_sql() -> str:
    return """
WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events
), total AS (
  SELECT count(DISTINCT user_id) AS t FROM ut
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       count(*) AS n_users,
       (count(*) * 10000) // (SELECT t FROM total) AS support_bp
FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY a.event_type, b.event_type
ORDER BY n_users DESC, type_a ASC, type_b ASC
"""


def copurchase_triangles(lineitem: DataFrame) -> DataFrame:
    """Global clustering profile of the part co-purchase graph: nodes are
    parts, an (undirected) edge joins two parts bought in the same order.
    One summary row: node/edge counts, open-wedge count, triangle count,
    and the global clustering coefficient in exact ppm
    (``3 * triangles * 1e6 div wedges``) — all integer arithmetic, so it
    hash-checks across engines.

    Scale shape (ref has no graph ops; this EXCEEDS): per-order part
    pairs come from ONE self-equi-join of the distinct (order, part)
    stream on the order key with ``a < b`` — per-order fanout is bounded
    by order width (TPC-H ≤ 7 lines), never corpus-quadratic. Triangle
    counting is the standard two-join closure over the id-oriented edge
    list (each triangle a < b < c counted exactly once): edges(a,b) ⋈
    edges(b,c) builds directed wedges, closed by a semi-check against
    edges(a,c). Both joins key on single node columns — at 100 TB this is
    the join-based triangle enumeration used by Cohen's MapReduce
    algorithm (public); a skewed hub node would orient by (degree, id)
    instead, same plan shape. The edge list is reused three times, so it
    is localCheckpoint-materialized once."""
    op = lineitem.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a, b = op.alias("a"), op.alias("b")
    edges = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    node_stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.expr("d * (d - 1) DIV 2")).cast("long").alias("n_wedges"),
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(
            e3,
            (F.col("e1.u") == F.col("e3.u")) & (F.col("e2.v") == F.col("e3.v")),
            "left_semi",
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    ecnt = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        node_stats.crossJoin(ecnt)
        .crossJoin(tri)
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.expr(
                "CAST(CASE WHEN n_wedges > 0"
                " THEN 3 * n_triangles * 1000000 DIV n_wedges"
                " ELSE 0 END AS BIGINT)"
            ).alias("gcc_ppm"),
        )
    )


def copurchase_triangles_oracle_sql() -> str:
    return """
WITH op AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), edges AS (
  SELECT DISTINCT a.p AS u, b.p AS v
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
), deg AS (
  SELECT n, count(*) AS d FROM (
    SELECT u AS n FROM edges UNION ALL SELECT v AS n FROM edges
  ) GROUP BY n
), ns AS (
  SELECT count(*) AS n_nodes,
         CAST(sum(d * (d - 1) // 2) AS BIGINT) AS n_wedges
  FROM deg
), ec AS (
  SELECT count(*) AS n_edges FROM edges
), tri AS (
  SELECT count(*) AS n_triangles
  FROM edges e1
  JOIN edges e2 ON e1.v = e2.u
  WHERE EXISTS (SELECT 1 FROM edges e3
                WHERE e3.u = e1.u AND e3.v = e2.v)
)
SELECT n_nodes, n_edges, n_wedges, n_triangles,
       CAST(CASE WHEN n_wedges > 0
                 THEN 3 * n_triangles * 1000000 // n_wedges
                 ELSE 0 END AS BIGINT) AS gcc_ppm
FROM ns, ec, tri"""


def _label_round(lab: DataFrame, edges: DataFrame) -> DataFrame:
    """lab'(node) = min(lab(node), min over in-neighbors lab(nbr)) — one
    synchronous min-label round: a join keyed on src (edges are already
    co-partitioned on src by the caller) and a map-side-combined min."""
    incoming = (
        lab.join(edges, F.col("node") == F.col("src"))
        .groupBy(F.col("dst").alias("node"))
        .agg(F.min("lab").alias("in_min"))
    )
    return (
        lab.join(incoming.withColumnRenamed("node", "n2"),
                 F.col("node") == F.col("n2"), "left")
        .select("node", F.least("lab", F.coalesce("in_min", "lab")).alias("lab"))
    )


def label_prop_two_round(
    orders: DataFrame, lineitem: DataFrame, k: int = 20
) -> DataFrame:
    """Community sizes after exactly TWO synchronous min-label-propagation
    rounds over the customer-part purchase graph (Raghavan et al. 2007's
    label propagation, made deterministic by propagating the MINIMUM
    neighbor label instead of the most-frequent — the same determinism
    trick as the connected-components operator in operators/dedup.py,
    whose fixpoint this iteration converges to). Two rounds unrolled keep
    the oracle a plain CTE chain — the engine-side
    :func:`label_prop_iterations` runs any depth. Top-``k`` communities
    by (size desc, label asc); all label arithmetic is on BIGINT node
    ids, bit-identical across engines.

    Scale shape: one distinct shuffle builds the edges; each round is one
    co-partitioned join + map-side-combined min + one bounded left join —
    the canonical iterate-in-Spark shape, no driver data path."""
    edges = customer_part_edges(orders, lineitem)
    edges = edges.repartition("src").localCheckpoint()
    lab = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("lab")
    )
    lab = _label_round(lab, edges)
    lab = _label_round(lab, edges)
    return (
        lab.groupBy("lab")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy(F.desc("n_members"), F.asc("lab"))
        .limit(k)
    )


def label_prop_iterations(
    orders: DataFrame,
    lineitem: DataFrame,
    rounds: int = 10,
    k: int = 20,
) -> DataFrame:
    """The production loop: same round function, arbitrary depth, lineage
    cut per round (converged labels ARE the connected components — on the
    bipartite purchase graph the diameter is small, so ~10 rounds
    saturate). Not oracle-able as SQL beyond a few unrolled rounds —
    pinned by tests/test_round9.py's equivalence test against
    :func:`label_prop_two_round` at rounds=2."""
    edges = customer_part_edges(orders, lineitem)
    edges = edges.repartition("src").localCheckpoint()
    lab = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("lab")
    )
    for _ in range(rounds):
        lab = _label_round(lab, edges).localCheckpoint()
    return (
        lab.groupBy("lab")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy(F.desc("n_members"), F.asc("lab"))
        .limit(k)
    )


def label_prop_two_round_oracle_sql(k: int = 20) -> str:
    return f"""
WITH cp AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey + {PART_BASE} AS p
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), edges AS (
  SELECT c AS src, p AS dst FROM cp UNION ALL SELECT p AS src, c AS dst FROM cp
), lab0 AS (
  SELECT DISTINCT src AS node, src AS lab FROM edges
), lab1 AS (
  SELECT l.node,
         least(l.lab, coalesce(min(nl.lab), l.lab)) AS lab
  FROM lab0 l
  LEFT JOIN edges e ON e.dst = l.node
  LEFT JOIN lab0 nl ON nl.node = e.src
  GROUP BY l.node, l.lab
), lab2 AS (
  SELECT l.node,
         least(l.lab, coalesce(min(nl.lab), l.lab)) AS lab
  FROM lab1 l
  LEFT JOIN edges e ON e.dst = l.node
  LEFT JOIN lab1 nl ON nl.node = e.src
  GROUP BY l.node, l.lab
)
SELECT lab, CAST(count(*) AS BIGINT) AS n_members
FROM lab2 GROUP BY lab ORDER BY n_members DESC, lab ASC LIMIT {k}
"""


def degree_distribution(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Log2-bucketed degree distribution of the customer-part purchase
    graph — the power-law fingerprint (straight line in log-log ⇒
    scale-free) read before choosing partitioning/salting strategies for
    graph workloads. Bucket = floor(log2(degree)) computed EXACTLY as
    ``length(bin(degree)) - 1`` (binary-string length, engine-identical
    integer semantics — no floating log). Reports per bucket: node
    count, min/max degree observed, and total edge endpoints covered.

    Scale shape: one distinct edge shuffle (shared with the pagerank /
    label-prop operators), one map-side-combined degree count, then the
    bucket rollup on the nodes-sized frame."""
    edges = customer_part_edges(orders, lineitem)
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    return (
        deg.withColumn(
            "bucket", (F.length(F.bin("degree")) - 1).cast("long")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("degree").cast("long").alias("min_degree"),
            F.max("degree").cast("long").alias("max_degree"),
            F.sum("degree").cast("long").alias("sum_degree"),
        )
        .orderBy("bucket")
    )


def degree_distribution_oracle_sql() -> str:
    return f"""
WITH cp AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey + {PART_BASE} AS p
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), edges AS (
  SELECT c AS src, p AS dst FROM cp UNION ALL SELECT p AS src, c AS dst FROM cp
), deg AS (
  SELECT src AS node, count(*) AS degree FROM edges GROUP BY src
)
SELECT CAST(length(bin(degree)) - 1 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(min(degree) AS BIGINT) AS min_degree,
       CAST(max(degree) AS BIGINT) AS max_degree,
       CAST(sum(degree) AS BIGINT) AS sum_degree
FROM deg GROUP BY 1 ORDER BY bucket"""


KCORE_KS = (2, 3, 4)
KCORE_ROUNDS = 2


def kcore_peel_profile(
    orders: DataFrame,
    lineitem: DataFrame,
    ks: tuple[int, ...] = KCORE_KS,
    rounds: int = KCORE_ROUNDS,
) -> DataFrame:
    """k-core PEELING profile of the customer-part purchase graph: for
    each threshold k, repeatedly drop nodes of degree < k (``rounds``
    fixed iterations) and report the surviving node/edge counts per
    round — the density-skeleton curve that tells a graph pipeline how
    much of the graph is hub-structure (survives peeling) vs periphery
    (evaporates in round 1). True k-core iterates to a fixpoint; a FIXED
    round count keeps the operator engine-reproducible and SQL-unrollable
    while exposing the convergence rate itself (a (k, round) cell that
    still shrinks means the core hasn't stabilized). Round 0 is the raw
    graph, emitted once under k = 0.

    Scale shape (100 TB): the edge list materializes ONCE
    (localCheckpoint, shared subtree with pagerank/label-prop); each peel
    round is one map-side-combined degree count plus two LEFT SEMI joins
    keyed on the node columns — the classic distributed peel step, no
    node-side state. |ks| * rounds is a constant (6 here), so the whole
    profile is a bounded chain of semi-joins over a monotonically
    SHRINKING edge frame; per-round frames reduce to 1-row aggregates
    before the union."""
    edges0 = customer_part_edges(orders, lineitem).localCheckpoint(
        eager=False
    )
    base = edges0.agg(
        F.lit(0).cast("long").alias("k"),
        F.lit(0).cast("long").alias("round"),
        F.countDistinct("src").cast("long").alias("n_nodes"),
        F.expr("count(*) div 2").alias("n_edges"),
    )
    out = base
    for k in ks:
        e = edges0
        for rnd in range(1, rounds + 1):
            deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
            keep = deg.filter(F.col("d") >= k).select(
                F.col("src").alias("node")
            )
            e = e.join(
                keep, e["src"] == keep["node"], "left_semi"
            )
            keep2 = deg.filter(F.col("d") >= k).select(
                F.col("src").alias("node")
            )
            e = e.join(
                keep2, e["dst"] == keep2["node"], "left_semi"
            )
            out = out.unionByName(
                e.agg(
                    F.lit(k).cast("long").alias("k"),
                    F.lit(rnd).cast("long").alias("round"),
                    F.countDistinct("src").cast("long").alias("n_nodes"),
                    F.expr("count(*) div 2").alias("n_edges"),
                )
            )
    return out.orderBy("k", "round")


def kcore_peel_profile_oracle_sql(
    ks: tuple[int, ...] = KCORE_KS, rounds: int = KCORE_ROUNDS
) -> str:
    ctes = [
        f"""cp AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey + {PART_BASE} AS p
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), edges AS (
  SELECT c AS src, p AS dst FROM cp
  UNION ALL SELECT p AS src, c AS dst FROM cp
)"""
    ]
    selects = [
        "SELECT CAST(0 AS BIGINT) AS k, CAST(0 AS BIGINT) AS round,"
        " CAST(count(DISTINCT src) AS BIGINT) AS n_nodes,"
        " CAST(count(*) // 2 AS BIGINT) AS n_edges FROM edges"
    ]
    for k in ks:
        prev = "edges"
        for rnd in range(1, rounds + 1):
            ctes.append(
                f"""keep_k{k}_r{rnd} AS (
  SELECT src AS node FROM {prev} GROUP BY src HAVING count(*) >= {k}
), e_k{k}_r{rnd} AS (
  SELECT e.src, e.dst FROM {prev} e
  JOIN keep_k{k}_r{rnd} a ON e.src = a.node
  JOIN keep_k{k}_r{rnd} b ON e.dst = b.node
)"""
            )
            selects.append(
                f"SELECT CAST({k} AS BIGINT), CAST({rnd} AS BIGINT),"
                f" CAST(count(DISTINCT src) AS BIGINT),"
                f" CAST(count(*) // 2 AS BIGINT) FROM e_k{k}_r{rnd}"
            )
            prev = f"e_k{k}_r{rnd}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\nSELECT * FROM (\n"
        + "\nUNION ALL\n".join(selects)
        + "\n) ORDER BY k, round"
    )


def common_neighbor_link_pred(
    lineitem: DataFrame, top: int = 20, min_support: int = 2
) -> DataFrame:
    """Link prediction on the SUPPORT-FILTERED part co-purchase graph:
    an edge joins two parts co-purchased in >= ``min_support`` distinct
    orders (single co-occurrences are noise, the classic frequent-pair
    floor — itemset_pair_support's threshold applied as graph
    construction); for part pairs NOT yet connected, rank the most
    likely future edges by common-neighbor Jaccard —
    ``|N(a) ∩ N(b)| / |N(a) ∪ N(b)|`` in exact ppm (Liben-Nowell &
    Kleinberg, "The Link Prediction Problem for Social Networks", CIKM
    2003 — public). The recommender primitive ("parts bought with the
    same things tend to be bought together next").

    The support floor is load-bearing for scale, not just signal: the
    raw co-purchase graph is DENSE (TPC-H sf0.1: 1.2M pairs, mean part
    degree ~300 — wedge space ~1e9), while the support->=2 graph is
    ~3.6k edges; the wedge join below is quadratic in per-node degree,
    so it runs on the sparse graph by construction.

    Scale shape (100 TB): per-order part pairs are bounded by order
    width; the support count is one map-side-combined shuffle; candidate
    pairs come from the WEDGE join over the sparse edge set (adjacency
    keyed on the shared neighbor, a < b orientation); known edges leave
    via one left_anti; degrees are a broadcast-joinable node table; the
    top-k is TakeOrderedAndProject over a fully deterministic key
    (jaccard desc, cn desc, a, b) — no global sort, no window."""
    op = lineitem.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a, b = op.alias("a"), op.alias("b")
    edges = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
        .select("u", "v")
        .localCheckpoint(eager=False)
    )
    adj = edges.unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    n1, n2 = adj.alias("n1"), adj.alias("n2")
    cand = (
        n1.join(
            n2,
            (F.col("n1.u") == F.col("n2.u"))
            & (F.col("n1.v") < F.col("n2.v")),
        )
        .select(F.col("n1.v").alias("pa"), F.col("n2.v").alias("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("cn"))
        .join(
            edges,
            (F.col("pa") == F.col("u")) & (F.col("pb") == F.col("v")),
            "left_anti",
        )
    )
    da = deg.select(F.col("u").alias("pa"), F.col("d").alias("deg_a"))
    db = deg.select(F.col("u").alias("pb"), F.col("d").alias("deg_b"))
    return (
        cand.join(da, "pa")
        .join(db, "pb")
        .select(
            F.col("pa").alias("part_a"),
            F.col("pb").alias("part_b"),
            F.col("cn").alias("common_neighbors"),
            "deg_a",
            "deg_b",
            F.expr(
                "CAST(cn * 1000000 div (deg_a + deg_b - cn) AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
        .orderBy(
            F.desc("jaccard_ppm"),
            F.desc("common_neighbors"),
            "part_a",
            "part_b",
        )
        .limit(top)
    )


def common_neighbor_link_pred_oracle_sql(
    top: int = 20, min_support: int = 2
) -> str:
    return f"""
WITH op AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), edges AS MATERIALIZED (
  SELECT a.p AS u, b.p AS v
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p
  HAVING count(*) >= {min_support}
), adj AS MATERIALIZED (
  SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges
), deg AS (
  SELECT u, count(*) AS d FROM adj GROUP BY u
), cand AS (
  SELECT n1.v AS pa, n2.v AS pb, count(*) AS cn
  FROM adj n1 JOIN adj n2 ON n1.u = n2.u AND n1.v < n2.v
  GROUP BY n1.v, n2.v
), fresh AS (
  SELECT pa, pb, cn FROM cand
  WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.u = pa AND e.v = pb)
)
SELECT pa AS part_a, pb AS part_b,
       CAST(cn AS BIGINT) AS common_neighbors,
       CAST(da.d AS BIGINT) AS deg_a, CAST(db.d AS BIGINT) AS deg_b,
       CAST(cn * 1000000 // (da.d + db.d - cn) AS BIGINT) AS jaccard_ppm
FROM fresh
JOIN deg da ON da.u = pa
JOIN deg db ON db.u = pb
ORDER BY jaccard_ppm DESC, common_neighbors DESC, part_a, part_b
LIMIT {top}"""


def clustering_coeff_profile(lineitem: DataFrame) -> DataFrame:
    """LOCAL clustering-coefficient distribution of the part co-purchase
    graph — the per-node complement to ``copurchase_triangles``' single
    global number: each node's ``lcc = 2*t(v) / (d(v)*(d(v)-1))`` in
    exact ppm, folded into eleven fixed deciles (bucket = lcc_ppm div
    100000, so 1.0 lands in its own bucket 10) plus bucket -1 for
    degree-1 nodes where lcc is undefined. Per bucket: node count, total
    degree, total triangle incidences — the "is my graph clumpy or
    stringy" histogram community-detection work starts from.

    Scale shape (100 TB): same bounded-fanout edge derivation as
    copurchase_triangles (per-order pair-gen, order width caps the
    fanout; edge list localCheckpoint'd once, reused four times). The
    triangle enumeration closes wedges with an INNER join (not the
    count-only semi) because each triangle must credit its three
    corners: one explode to 3 rows per triangle, then a node-keyed
    rollup. All joins key on node/edge columns — no corpus-quadratic
    step anywhere."""
    op = lineitem.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a, b = op.alias("a"), op.alias("b")
    edges = (
        a.join(
            b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p"))
        )
        .select(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(
            e3,
            (F.col("e1.u") == F.col("e3.u"))
            & (F.col("e2.v") == F.col("e3.v")),
        )
        .select(
            F.col("e1.u").alias("n1"),
            F.col("e1.v").alias("n2"),
            F.col("e2.v").alias("n3"),
        )
    )
    tri_per_node = (
        tri.select(F.explode(F.array("n1", "n2", "n3")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    lcc = (
        deg.join(tri_per_node, "node", "left")
        .withColumn("t", F.coalesce(F.col("t"), F.lit(0)))
        .select(
            "node",
            "d",
            "t",
            F.expr(
                "CASE WHEN d < 2 THEN CAST(-1 AS BIGINT)"
                " ELSE CAST(2 * t * 1000000 DIV (d * (d - 1)) AS BIGINT) END"
            ).alias("lcc_ppm"),
        )
    )
    return (
        lcc.withColumn(
            "bucket",
            F.expr(
                "CAST(CASE WHEN lcc_ppm < 0 THEN -1"
                " ELSE lcc_ppm DIV 100000 END AS BIGINT)"
            ),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("d").cast("long").alias("sum_deg"),
            F.sum("t").cast("long").alias("sum_tri"),
        )
        .orderBy("bucket")
    )


def clustering_coeff_profile_oracle_sql() -> str:
    return """
WITH op AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), edges AS (
  SELECT DISTINCT a.p AS u, b.p AS v
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
), deg AS (
  SELECT node, count(*) AS d FROM (
    SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges
  ) GROUP BY node
), tri AS (
  SELECT e1.u AS n1, e1.v AS n2, e2.v AS n3
  FROM edges e1
  JOIN edges e2 ON e1.v = e2.u
  JOIN edges e3 ON e1.u = e3.u AND e2.v = e3.v
), tpn AS (
  SELECT node, count(*) AS t FROM (
    SELECT n1 AS node FROM tri UNION ALL
    SELECT n2 AS node FROM tri UNION ALL
    SELECT n3 AS node FROM tri
  ) GROUP BY node
), lcc AS (
  SELECT deg.node, deg.d, coalesce(tpn.t, 0) AS t,
         CASE WHEN deg.d < 2 THEN CAST(-1 AS BIGINT)
              ELSE CAST(2 * coalesce(tpn.t, 0) * 1000000
                        // (deg.d * (deg.d - 1)) AS BIGINT) END AS lcc_ppm
  FROM deg LEFT JOIN tpn ON deg.node = tpn.node
)
SELECT CAST(CASE WHEN lcc_ppm < 0 THEN -1 ELSE lcc_ppm // 100000 END
            AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(sum(d) AS BIGINT) AS sum_deg,
       CAST(sum(t) AS BIGINT) AS sum_tri
FROM lcc GROUP BY 1 ORDER BY bucket"""


def hits_two_iter(
    orders: DataFrame, lineitem: DataFrame, k: int = 10
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999, public) after exactly
    two half-steps each way over the DIRECTED customer->part purchase
    graph: customers are hubs (they point at what they buy), parts are
    authorities. The usual L2 normalization is replaced by an exact
    integer max-normalization (``score * SCALE div max(score)``) so every
    score is a deterministic BIGINT and the (kind, score desc, node asc)
    top-k trace matches the DuckDB oracle bit for bit — the RANKING is
    identical to the L2-normalized one because both normalizations are
    monotone.

    Scale shape (100 TB): one distinct edge shuffle (shared subtree with
    the pagerank family); each half-step is a map-side-combined groupBy
    on one endpoint plus a broadcast of the single-row max; output via
    two TakeOrdered(k) unioned — no windows, no driver loops."""
    cp = (
        lineitem.select("l_orderkey", "l_partkey")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.col("o_custkey").alias("c"),
            (F.col("l_partkey") + F.lit(PART_BASE)).alias("p"),
        )
        .distinct()
        .repartition("c")
        .localCheckpoint(eager=False)
    )

    def _norm(df, col):
        # the raw-score frame feeds BOTH the max-agg and the normalize
        # projection; without the checkpoint each consumer re-runs the
        # whole upstream half-step chain, compounding per level (the
        # r14 plan audit counted 48 exchanges before this line)
        df = df.localCheckpoint(eager=False)
        mx = df.agg(F.max(col).alias("mx"))
        return df.crossJoin(F.broadcast(mx)).select(
            "node",
            F.expr(
                f"CAST(CAST({col} AS DECIMAL(38,0)) * {SCALE}"
                " div mx AS BIGINT)"
            ).alias(col),
        )

    # a1(p) = sum of h0(c)=SCALE over in-edges, then max-normalize
    a1 = _norm(
        cp.groupBy(F.col("p").alias("node")).agg(
            F.expr(f"count(*) * {SCALE}").alias("a")
        ),
        "a",
    )
    # h1(c) = sum of a1(p) over out-edges, max-normalized
    h1 = _norm(
        cp.join(a1, cp.p == a1.node)
        .groupBy(F.col("c").alias("node"))
        .agg(F.sum("a").alias("h")),
        "h",
    )
    # a2(p) = sum of h1(c), max-normalized
    a2 = _norm(
        cp.join(h1, cp.c == h1.node)
        .groupBy(F.col("p").alias("node"))
        .agg(F.sum("h").alias("a")),
        "a",
    )
    hubs = (
        h1.orderBy(F.desc("h"), F.asc("node"))
        .limit(k)
        .select(F.lit("hub").alias("kind"), "node", F.col("h").alias("score"))
    )
    auth = (
        a2.orderBy(F.desc("a"), F.asc("node"))
        .limit(k)
        .select(
            F.lit("authority").alias("kind"), "node", F.col("a").alias("score")
        )
    )
    return auth.unionAll(hubs).orderBy(
        "kind", F.desc("score"), F.asc("node")
    )


def hits_two_iter_oracle_sql(k: int = 10) -> str:
    return f"""
WITH cp AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey + {PART_BASE} AS p
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), a1r AS (
  SELECT p AS node, count(*) * {SCALE} AS a FROM cp GROUP BY p
), a1 AS (
  SELECT node, CAST(CAST(a AS HUGEINT) * {SCALE}
              // (SELECT max(a) FROM a1r) AS BIGINT) AS a
  FROM a1r
), h1r AS (
  SELECT cp.c AS node, sum(a1.a) AS h
  FROM cp JOIN a1 ON cp.p = a1.node GROUP BY cp.c
), h1 AS (
  SELECT node, CAST(CAST(h AS HUGEINT) * {SCALE}
              // (SELECT max(h) FROM h1r) AS BIGINT) AS h
  FROM h1r
), a2r AS (
  SELECT cp.p AS node, sum(h1.h) AS a
  FROM cp JOIN h1 ON cp.c = h1.node GROUP BY cp.p
), a2 AS (
  SELECT node, CAST(CAST(a AS HUGEINT) * {SCALE}
              // (SELECT max(a) FROM a2r) AS BIGINT) AS a
  FROM a2r
), topa AS (
  SELECT 'authority' AS kind, node, a AS score FROM a2
  ORDER BY score DESC, node ASC LIMIT {k}
), toph AS (
  SELECT 'hub' AS kind, node, h AS score FROM h1
  ORDER BY score DESC, node ASC LIMIT {k}
)
SELECT kind, node, CAST(score AS BIGINT) AS score
FROM (SELECT * FROM topa UNION ALL SELECT * FROM toph)
ORDER BY kind, score DESC, node ASC"""


def degree_assortativity(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Degree assortativity (Newman 2002, public) of the undirected
    customer-part purchase graph: the Pearson correlation between the
    degrees at the two ends of each edge. Reported WITHOUT the square
    root the textbook r needs: the SIGN of the covariance plus r^2 in
    ppm, both exact under a documented fixed-point scale-down (numerator
    and both variance factors floor-divide by 10^6 before squaring /
    multiplying — both engines floor identically, and the scale-down is
    what keeps a 100-TB graph's 5th-order sums inside DECIMAL(38,0)).
    Bipartite purchase graphs come out disassortative (hub customers buy
    niche parts); a positive sign here flags a degenerate crawl.

    Scale shape (100 TB): the edge list and per-node degrees are two
    map-side-combined shuffles; the per-edge (deg_src, deg_dst) frame is
    one broadcast-degree join when degrees fit, else a keyed join; the
    final reduce is a single-row aggregate. No windows."""
    edges = customer_part_edges(orders, lineitem)
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("d")
    )
    pairs = (
        edges.join(deg.select(F.col("node").alias("src"),
                              F.col("d").alias("dx")), "src")
        .join(deg.select(F.col("node").alias("dst"),
                         F.col("d").alias("dy")), "dst")
    )
    s = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        # every sum enters products below: carry them as DECIMAL(38,0)
        # from the start (sx*sy on a 100 TB graph exceeds BIGINT)
        F.sum("dx").cast("decimal(38,0)").alias("sx"),
        F.sum("dy").cast("decimal(38,0)").alias("sy"),
        F.sum(F.expr("CAST(dx AS DECIMAL(38,0)) * dy")).alias("sxy"),
        F.sum(F.expr("CAST(dx AS DECIMAL(38,0)) * dx")).alias("sxx"),
        F.sum(F.expr("CAST(dy AS DECIMAL(38,0)) * dy")).alias("syy"),
    )
    return s.select(
        F.col("n").cast("long").alias("n_edges"),
        F.expr("CAST(1000 * sx DIV n AS BIGINT)").alias("mean_deg_milli"),
        F.expr(
            "CAST(CASE WHEN n * sxy - sx * sy > 0 THEN 1"
            " WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 0 END AS BIGINT)"
        ).alias("cov_sign"),
        # the scaled-down quotients are BIGINT; recast to DECIMAL(38,0)
        # before squaring/multiplying (1e14^2 overflows BIGINT at sf0.1+)
        F.expr(
            "CAST(CASE WHEN (n * sxx - sx * sx) div 1000000 = 0"
            " OR (n * syy - sy * sy) div 1000000 = 0 THEN 0 ELSE"
            " CAST(abs(n * sxy - sx * sy) div 1000000 AS DECIMAL(38,0))"
            " * (abs(n * sxy - sx * sy) div 1000000) * 1000000"
            " div (CAST((n * sxx - sx * sx) div 1000000 AS DECIMAL(38,0))"
            " * ((n * syy - sy * sy) div 1000000)) END AS BIGINT)"
        ).alias("r2_ppm"),
    )


def degree_assortativity_oracle_sql() -> str:
    return f"""
WITH cp AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey + {PART_BASE} AS p
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), edges AS (
  SELECT c AS src, p AS dst FROM cp UNION ALL SELECT p AS src, c AS dst FROM cp
), deg AS (
  SELECT src AS node, count(*) AS d FROM edges GROUP BY src
), pairs AS (
  SELECT dx.d AS dx, dy.d AS dy
  FROM edges e JOIN deg dx ON e.src = dx.node JOIN deg dy ON e.dst = dy.node
), s AS (
  SELECT count(*) AS n,
         CAST(sum(dx) AS HUGEINT) AS sx, CAST(sum(dy) AS HUGEINT) AS sy,
         sum(CAST(dx AS HUGEINT) * dy) AS sxy,
         sum(CAST(dx AS HUGEINT) * dx) AS sxx,
         sum(CAST(dy AS HUGEINT) * dy) AS syy
  FROM pairs
)
SELECT CAST(n AS BIGINT) AS n_edges,
       CAST(1000 * sx // n AS BIGINT) AS mean_deg_milli,
       CAST(CASE WHEN n * sxy - sx * sy > 0 THEN 1
            WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 0 END AS BIGINT)
         AS cov_sign,
       CAST(CASE WHEN (n * sxx - sx * sx) // 1000000 = 0
            OR (n * syy - sy * sy) // 1000000 = 0 THEN 0 ELSE
            (abs(n * sxy - sx * sy) // 1000000)
            * (abs(n * sxy - sx * sy) // 1000000) * 1000000
            // (((n * sxx - sx * sx) // 1000000)
            * ((n * syy - sy * sy) // 1000000)) END AS BIGINT) AS r2_ppm
FROM s"""


def modularity_by_nation(
    orders: DataFrame,
    lineitem: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
) -> DataFrame:
    """Newman modularity contribution of each NATION over the
    customer-supplier trade graph (distinct (custkey, suppkey) pairs
    that share a lineitem): per community c, ``q_c = e_c/m -
    (d_c/(2m))^2`` in exact floored ppm — e_c = intra-nation edges, d_c
    = community degree sum, m = total edges. A strongly positive sum
    says trade clusters inside nations; the per-nation rows show which.
    The same shape audits label-prop communities at scale.

    Scale shape (100 TB): the fact-fact join shuffles once on orderkey;
    nation lookups are broadcast dimension joins; everything after is a
    25-row frame. No windows."""
    edges = (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("o_custkey", "l_suppkey")
        .distinct()
        .join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            F.col("c_nationkey").cast("long").alias("cn"),
            F.col("s_nationkey").cast("long").alias("sn"),
        )
    )
    per = edges.groupBy().agg(F.count(F.lit(1)).alias("m"))
    ends = edges.select(
        F.col("cn").alias("nation"),
        F.expr("CAST(cn = sn AS BIGINT)").alias("internal"),
    ).unionAll(
        edges.select(
            F.col("sn").alias("nation"),
            F.expr("CAST(cn = sn AS BIGINT)").alias("internal"),
        )
    )
    by_nation = ends.groupBy("nation").agg(
        F.count(F.lit(1)).alias("d"),
        # each intra edge contributes an endpoint to its nation twice
        F.expr("CAST(sum(internal) DIV 2 AS BIGINT)").alias("e_in"),
    )
    return (
        by_nation.crossJoin(F.broadcast(per))
        .select(
            F.col("nation").cast("long").alias("nation"),
            F.col("d").cast("long").alias("degree_sum"),
            F.col("e_in").cast("long").alias("internal_edges"),
            F.expr(
                "CAST(e_in * 1000000 div m"
                " - (CAST(d AS DECIMAL(38,0)) * d * 1000000)"
                " div (CAST(4 AS DECIMAL(38,0)) * m * m) AS BIGINT)"
            ).alias("q_contrib_ppm"),
        )
        .orderBy("nation")
    )


def modularity_by_nation_oracle_sql() -> str:
    return """
WITH cs AS (
  SELECT DISTINCT o.o_custkey, l.l_suppkey
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), edges AS (
  SELECT CAST(c.c_nationkey AS BIGINT) AS cn,
         CAST(s.s_nationkey AS BIGINT) AS sn
  FROM cs JOIN customer c ON cs.o_custkey = c.c_custkey
  JOIN supplier s ON cs.l_suppkey = s.s_suppkey
), per AS (
  SELECT count(*) AS m FROM edges
), ends AS (
  SELECT cn AS nation, CAST(cn = sn AS BIGINT) AS internal FROM edges
  UNION ALL
  SELECT sn AS nation, CAST(cn = sn AS BIGINT) AS internal FROM edges
), by_nation AS (
  SELECT nation, count(*) AS d,
         CAST(sum(internal) // 2 AS BIGINT) AS e_in
  FROM ends GROUP BY nation
)
SELECT CAST(nation AS BIGINT) AS nation,
       CAST(d AS BIGINT) AS degree_sum,
       CAST(e_in AS BIGINT) AS internal_edges,
       CAST(e_in * 1000000 // m
            - (CAST(d AS HUGEINT) * d * 1000000)
            // (CAST(4 AS HUGEINT) * m * m) AS BIGINT) AS q_contrib_ppm
FROM by_nation CROSS JOIN per ORDER BY nation"""

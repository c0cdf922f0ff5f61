"""Heavy-hitter (frequent-item) detection over corpus tokens.

The classic "top tokens / domains / URLs by share" question at 100 TB: a
plain ``GROUP BY token`` shuffles the full token stream (trillions of rows)
just to find the handful of items above a share threshold. This module uses
the standard sketch-then-verify shape instead:

- **Pass 1 — candidates** (:func:`heavy_hitter_candidates`): one
  Arrow-batched ``mapInPandas`` scan keeps an exact per-partition token
  count in a local hash map (the map-side combine the engine would build
  anyway, kept partition-local) and emits only tokens whose partition
  share clears the pigeonhole bar ``cnt_p * k >= n_p``. Any token with
  global count ``> N/k`` must clear that bar in at least one partition —
  if ``cnt_p < n_p/k`` everywhere, summing over partitions gives a global
  count ``< N/k`` — so the candidate union is a guaranteed superset of
  the true heavy hitters. Shuffled bytes: candidates only (tiny).
- **Pass 2 — exact verify** (:func:`heavy_hitter_tokens`): codegen'd
  explode + broadcast semi-join on the candidate set + exact count, kept
  iff ``cnt * k > N`` strictly. The output is EXACT and deterministic —
  the sketch only bounds where the expensive count runs — which is why a
  plain SQL GROUP BY/HAVING works as the DuckDB oracle.

A 2x safety margin on the candidate bar absorbs any tokenizer drift
between the Python candidate pass (``str.split``, Unicode whitespace) and
the engine verify pass (``\\s+`` regex, ASCII whitespace).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from datafusion_pinot_spark.functions import tokens

DEFAULT_K = 100  # heavy hitter = token with > 1/k of all token mass


def _candidate_scan(docs: DataFrame, k: int, text_col: str) -> DataFrame:
    """One Arrow-batched pass emitting candidate rows (``token`` set,
    ``part_total`` 0) plus one marker row per partition (``token`` NULL,
    ``part_total`` = the partition's token count) — so the candidate set
    AND the global total come from the same single corpus scan.

    Tokenization matches the engine verify pass exactly: ``\\s+`` with
    re.ASCII mirrors Java's default (ASCII-only) ``\\s``, so a token
    containing Unicode whitespace (e.g. NBSP from scraped ``&nbsp;``) is
    one token in BOTH passes — a plain ``str.split()`` (Unicode-aware)
    would split it in the candidate pass only and silently drop it from
    the 'exact' output."""
    import re

    ws = re.compile(r"\s+", re.ASCII)

    def gen(batches):
        from collections import Counter

        import pandas as pd

        cnt: Counter = Counter()
        total = 0
        for pdf in batches:
            for txt in pdf[text_col]:
                if txt is None:
                    continue
                # mirror the engine EXACTLY (functions.tokens): trim is
                # ASCII-space-only in Spark and DuckDB, and a split of
                # text with leading non-space whitespace keeps its ''
                # artifact — the total must match the oracle's count
                # bit-for-bit, not just approximately
                t2 = txt.lower().strip(" ")
                toks = ws.split(t2) if t2 else []
                cnt.update(toks)
                total += len(toks)
        cands = [t for t, c in cnt.items() if c * k * 2 >= total]
        yield pd.DataFrame(
            {
                "token": pd.Series(cands + [None], dtype="object"),
                "part_total": pd.Series(
                    [0] * len(cands) + [total], dtype="int64"
                ),
            }
        )

    return docs.select(text_col).mapInPandas(
        gen, "token string, part_total long"
    )


def heavy_hitter_candidates(
    docs: DataFrame, k: int = DEFAULT_K, text_col: str = "text"
) -> DataFrame:
    """Superset of tokens that can possibly hold > 1/k of global token
    mass: per-partition exact counts, pigeonhole bar with a 2x margin."""
    scan = _candidate_scan(docs, k, text_col)
    return scan.filter(F.col("token").isNotNull()).select("token").distinct()


def heavy_hitter_tokens(
    docs: DataFrame, k: int = DEFAULT_K, text_col: str = "text"
) -> DataFrame:
    """Exact heavy hitters: ``token, cnt, share_milli`` for every token
    with strictly more than ``1/k`` of all token occurrences, ordered by
    count descending. Equal to the full GROUP BY answer, computed in two
    corpus scans: the persisted candidate scan (which also carries the
    global total) and the codegen'd verify."""
    scan = _candidate_scan(docs, k, text_col).persist()
    cands = scan.filter(F.col("token").isNotNull()).select("token").distinct()
    total = scan.filter(F.col("token").isNull()).agg(
        F.coalesce(F.sum("part_total"), F.lit(0)).cast("long").alias("total")
    )
    tok = docs.select(F.explode(tokens(F.col(text_col))).alias("token"))
    return (
        tok.join(F.broadcast(cands), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * k > F.col("total"))
        .select(
            "token",
            "cnt",
            F.expr("cnt * 1000000L div total").alias("share_milli"),
        )
        .orderBy(F.desc("cnt"), "token")
    )


def heavy_hitter_tokens_oracle_sql(
    k: int = DEFAULT_K, table: str = "documents"
) -> str:
    """Plain exact GROUP BY/HAVING oracle — valid because the sketch pass
    never changes the answer, only where the count is computed."""
    return f"""
WITH tok AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
  FROM {table} WHERE length(trim(text)) > 0
), tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM tok)
SELECT token, CAST(count(*) AS BIGINT) AS cnt,
       CAST(count(*) AS BIGINT) * 1000000 // total AS share_milli
FROM tok, tot
GROUP BY token, total
HAVING CAST(count(*) AS BIGINT) * {k} > total
ORDER BY cnt DESC, token"""


TRIPLE_MINSUP_PPM = 500_000


def token_triple_support(
    docs: DataFrame, minsup_ppm: int = TRIPLE_MINSUP_PPM, top: int = 20
) -> DataFrame:
    """Frequent 3-itemsets over per-document token baskets — the apriori
    level above pairwise lift (``text.token_lift_pairs``): the ``top``
    token TRIPLES co-occurring in the most documents, mined with the
    classic support-pruning step first (only tokens present in >=
    ``minsup_ppm`` of documents enumerate — the anti-monotonicity
    guarantee says no frequent triple can contain an infrequent token, so
    pruning is lossless for any triple whose support clears the same
    bar). Triples are the first level where co-occurrence stops being
    explainable by item popularity alone; collocation mining for
    prompt-template detection runs exactly this shape.

    Scale shape (100 TB): the frequent-item table is VOCABULARY-sized and
    broadcast into a semi-join (never a shuffle of the token stream by
    anything but doc_id); triple enumeration is two self-equi-joins of
    the pruned (doc, token) stream on the DOC key — per-doc fanout is
    C(frequent-tokens-in-doc, 3), bounded by the pruned vocabulary, not
    the corpus; support counting is one map-side-combined agg and the
    top-``top`` is a TakeOrdered. On an open-vocabulary corpus the
    minsup prune is what keeps the fanout constant-bounded (Zipf: few
    tokens clear a per-document-frequency bar)."""
    toks = (
        docs.filter(F.length(F.trim(F.lower(F.col("text")))) > 0)
        .select(
            "doc_id",
            F.explode(F.array_distinct(tokens(F.col("text")))).alias(
                "tok"
            ),
        )
    )
    # n_docs rides the plan as a 1-row broadcast aggregate (the
    # vocab_coverage_curve totals pattern) so building this DataFrame
    # stays lazy — an eager .count() here ran a full corpus scan at
    # plan-construction time and a second one at execution.
    totals = toks.agg(
        F.count_distinct(F.col("doc_id")).cast("long").alias("n_docs")
    )
    freq = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(totals))
        .filter(
            F.col("df") * F.lit(1_000_000).cast("long")
            >= F.lit(minsup_ppm).cast("long") * F.col("n_docs")
        )
        .select("tok")
    )
    op = toks.join(F.broadcast(freq), "tok").select("doc_id", "tok")
    a, b, c = op.alias("a"), op.alias("b"), op.alias("c")
    triples = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.tok") < F.col("b.tok")),
        )
        .join(
            c,
            (F.col("a.doc_id") == F.col("c.doc_id"))
            & (F.col("b.tok") < F.col("c.tok")),
        )
        .select(
            F.col("a.tok").alias("t1"),
            F.col("b.tok").alias("t2"),
            F.col("c.tok").alias("t3"),
        )
    )
    return (
        triples.groupBy("t1", "t2", "t3")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .orderBy(F.desc("support"), F.asc("t1"), F.asc("t2"), F.asc("t3"))
        .limit(top)
    )


def token_triple_support_oracle_sql(
    minsup_ppm: int = TRIPLE_MINSUP_PPM, top: int = 20
) -> str:
    return f"""
WITH toks AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
  FROM documents WHERE length(trim(lower(text))) > 0
), ndocs AS (
  SELECT count(DISTINCT doc_id) AS n FROM toks
), freq AS (
  SELECT tok FROM (
    SELECT tok, count(*) AS df FROM toks GROUP BY tok
  ) i, ndocs WHERE df * 1000000 >= {minsup_ppm} * n
), op AS (
  SELECT doc_id, tok FROM toks WHERE tok IN (SELECT tok FROM freq)
), baskets AS (
  SELECT doc_id, list(tok ORDER BY tok) AS ts FROM op GROUP BY doc_id
), triples AS (
  SELECT ts[t1.i] AS t1, ts[t2.j] AS t2, ts[t3.m] AS t3
  FROM baskets,
       LATERAL unnest(generate_series(1, len(ts))) AS t1(i),
       LATERAL unnest(generate_series(1, len(ts))) AS t2(j),
       LATERAL unnest(generate_series(1, len(ts))) AS t3(m)
  WHERE t1.i < t2.j AND t2.j < t3.m
)
SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS support
FROM triples GROUP BY t1, t2, t3
ORDER BY support DESC, t1 ASC, t2 ASC, t3 ASC
LIMIT {top}"""


RANK_CHURN_TOPK = 10


def weekly_rank_churn(events: DataFrame, k: int = RANK_CHURN_TOPK) -> DataFrame:
    """Leaderboard STABILITY monitor: week-over-week churn of the top-``k``
    users by event count — how much of this week's heavy-user set is new.
    Heavy-hitter lists are consumed as if stable (abuse review queues,
    VIP caches, per-user rate-limit overrides); this table measures the
    assumption. One row per consecutive week pair: the later week, the
    top-list sizes, the overlap, and churn in exact ppm. Ranking ties
    break on ascending user_id; weeks are Monday-anchored date_trunc.

    Scale shape (100 TB): one (week, user) map-side-combined count, a
    per-week top-k window (WindowGroupLimit pushes the cut), then a
    self-equi-join of two k-row-per-week frames on (user, adjacent week)
    — join inputs are |weeks|*k rows, trivially small."""
    from pyspark.sql import Window

    wk = F.date_trunc("week", F.col("ts")).cast("date")
    counts = events.select(wk.alias("week"), "user_id").groupBy(
        "week", "user_id"
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("week").orderBy(F.desc("n"), F.asc("user_id"))
    top = (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("week", "user_id")
    )
    sizes = top.groupBy("week").agg(F.count(F.lit(1)).alias("n_top"))
    a, b = top.alias("a"), top.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.date_add(F.col("a.week"), 7) == F.col("b.week")),
        )
        .groupBy(F.col("b.week").alias("week"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    prev_sizes = sizes.select(
        F.date_add(F.col("week"), 7).alias("week"),
        F.col("n_top").alias("n_top_prev"),
    )
    return (
        sizes.join(prev_sizes, "week")  # inner: only weeks WITH a prior week
        .join(common, "week", "left")
        .select(
            "week",
            F.col("n_top").cast("long").alias("n_top"),
            F.col("n_top_prev").cast("long").alias("n_top_prev"),
            F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
            F.expr(
                "CAST(CASE WHEN n_top > 0 THEN"
                " (n_top - coalesce(n_common, 0)) * 1000000 div n_top"
                " ELSE 0 END AS BIGINT)"
            ).alias("churn_ppm"),
        )
        .orderBy("week")
    )


def weekly_rank_churn_oracle_sql(k: int = RANK_CHURN_TOPK) -> str:
    return f"""
WITH counts AS (
  SELECT CAST(date_trunc('week', ts) AS DATE) AS week, user_id,
         count(*) AS n
  FROM events GROUP BY 1, 2
), top AS (
  SELECT week, user_id FROM (
    SELECT week, user_id,
           row_number() OVER (PARTITION BY week
                              ORDER BY n DESC, user_id ASC) AS rk
    FROM counts) WHERE rk <= {k}
), sizes AS (
  SELECT week, count(*) AS n_top FROM top GROUP BY week
), common AS (
  SELECT b.week AS week, count(*) AS n_common
  FROM top a JOIN top b
    ON a.user_id = b.user_id AND a.week + INTERVAL 7 DAY = b.week
  GROUP BY b.week
)
SELECT s.week,
       CAST(s.n_top AS BIGINT) AS n_top,
       CAST(p.n_top AS BIGINT) AS n_top_prev,
       CAST(coalesce(c.n_common, 0) AS BIGINT) AS n_common,
       CAST(CASE WHEN s.n_top > 0 THEN
            (s.n_top - coalesce(c.n_common, 0)) * 1000000 // s.n_top
            ELSE 0 END AS BIGINT) AS churn_ppm
FROM sizes s
JOIN sizes p ON p.week + INTERVAL 7 DAY = s.week
LEFT JOIN common c ON c.week = s.week
ORDER BY s.week"""

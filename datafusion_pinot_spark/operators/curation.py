"""Training-data curation operators: sequence packing and benchmark
contamination.

Not present in the reference (a storage/scan engine, datafusion-pinot
README.md:1-40) — these are the pipeline stages a pretraining corpus needs
between "deduplicated documents" and "token sequences on a trainer":

- :func:`sequence_pack_bins` — assign every document a position in the
  packed fixed-length token-sequence stream (sample packing). The global
  running token offset is computed with the scalable two-pass pattern
  (per-bucket partial sums + tiny prefix frame + within-bucket window),
  NOT a corpus-wide single-partition window — the same trick as
  zipWithIndex, so it holds at 100 TB.
- :func:`contamination_overlap` — per-document n-gram overlap against a
  (small, broadcast) benchmark/eval shingle set; the corpus side is one
  linear scan + semi-join, never a cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datafusion_pinot_spark.functions import as_double_array, tokens, word_shingles

SEQ_LEN = 2048
BUCKET_SPAN = 256  # doc_ids per cumsum bucket (tune ≈ rows/partition)
PROBE_MAX_DOC = 20  # doc_id < this = the "benchmark" probe set
CONTAM_PCT = 5  # contaminated iff hit_shingles/total >= 5%


def _bucketed_prefix_sum(
    weighted: DataFrame,
    weight_col: str,
    bucket_span: int,
    order_col: str = "doc_id",
) -> DataFrame:
    """Global cumulative sum of ``weight_col`` in ``order_col`` order via
    the bucketed two-pass prefix pattern (stage 1: per-bucket sums;
    stage 2: prefix window over the tiny bucket frame — the only
    single-partition exchange; stage 3: broadcast back + within-bucket
    window). Adds ``cum`` (inclusive running sum) and ``total`` columns.
    Shared by sequence packing and PPS sampling — the scale-critical
    plan shape is defined once."""
    bucketed = weighted.withColumn(
        "__bucket", F.expr(f"{order_col} div {bucket_span}")
    )
    sums = bucketed.groupBy("__bucket").agg(
        F.sum(weight_col).alias("__bw")
    )
    w_prefix = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    prefixes = sums.select(
        "__bucket",
        F.coalesce(F.sum("__bw").over(w_prefix), F.lit(0)).alias("__prefix"),
        F.sum("__bw").over(w_all).alias("total"),
    )
    w_local = (
        Window.partitionBy("__bucket")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        bucketed.join(F.broadcast(prefixes), "__bucket")
        .withColumn("cum", F.col("__prefix") + F.sum(weight_col).over(w_local))
        .drop("__bucket", "__prefix")
    )


def sequence_pack_bins(
    docs: DataFrame, seq_len: int = SEQ_LEN, bucket_span: int = BUCKET_SPAN
) -> DataFrame:
    """Per packed-sequence bin: how many documents start in it, their token
    mass, doc-id range, and how many straddle into the next bin.

    Documents are laid out in doc_id order into a continuous token stream
    that is cut every ``seq_len`` tokens (pretraining sample packing with
    document splitting). A document occupying stream positions
    ``[cum - n, cum)`` starts in bin ``(cum - n) div seq_len`` and ends in
    ``(cum - 1) div seq_len``.

    Scale shape: the global cumulative sum uses bucketed two-pass prefix
    sums — stage 1 aggregates one partial sum per ``bucket_span`` of
    doc_ids (tiny frame), stage 2 runs the prefix window over buckets
    only (O(corpus / bucket_span) rows on one task — thousands, not
    billions), stage 3 broadcasts the prefixes back and finishes with a
    within-bucket window. No corpus-wide single-partition sort exists
    anywhere in the plan."""
    tok = docs.select(
        "doc_id", F.size(tokens(F.col("text"))).alias("n")
    ).filter(F.col("n") > 0)
    cum = _bucketed_prefix_sum(tok, "n", bucket_span)
    first_bin = F.expr(f"(cum - n) div {seq_len}")
    last_bin = F.expr(f"(cum - 1) div {seq_len}")
    return (
        cum.select(
            "doc_id",
            "n",
            first_bin.alias("bin"),
            (last_bin > first_bin).cast("int").alias("straddles"),
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n").alias("tok_sum"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
            F.sum("straddles").alias("n_straddling"),
        )
    )


def sequence_pack_bins_oracle_sql(
    seq_len: int = SEQ_LEN,
) -> str:
    """DuckDB oracle: the same layout from one plain running-sum window
    (fine at oracle scale; the Spark side exists precisely because this
    window doesn't scale)."""
    return f"""
WITH tok AS (
  SELECT doc_id,
         CASE WHEN length(trim(lower(text))) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(lower(text)), '\\s+')) END AS n
  FROM documents
), nz AS (
  SELECT * FROM tok WHERE n > 0
), c AS (
  SELECT doc_id, n,
         sum(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
  FROM nz
)
SELECT CAST((cum - n) // {seq_len} AS BIGINT) AS bin,
       count(*) AS n_docs,
       CAST(sum(n) AS BIGINT) AS tok_sum,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc,
       CAST(sum(CASE WHEN (cum - 1) // {seq_len} > (cum - n) // {seq_len}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_straddling
FROM c GROUP BY 1
"""


def contamination_overlap(
    docs: DataFrame,
    probe_max_doc: int = PROBE_MAX_DOC,
    n: int = 3,
    pct: int = CONTAM_PCT,
) -> DataFrame:
    """Per corpus document: distinct word-n-gram shingles shared with the
    probe ("benchmark") documents, and a contamination flag at ``pct``%
    overlap. The probe shingle set is small by construction and broadcast;
    the corpus side is one shingle scan + semi-join + left join — linear,
    never all-pairs. The flag uses integer arithmetic
    (``hits * 100 >= pct * total``), so there is no float threshold to
    drift between engines."""
    sh = docs.select(
        "doc_id",
        F.explode(word_shingles(tokens(F.col("text")), n)).alias("s"),
    )
    probe = (
        sh.filter(F.col("doc_id") < probe_max_doc).select("s").distinct()
    )
    corpus = sh.filter(F.col("doc_id") >= probe_max_doc)
    totals = corpus.groupBy("doc_id").agg(F.count("*").alias("total_shingles"))
    hits = (
        corpus.join(F.broadcast(probe), "s", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("hit_shingles"))
    )
    return totals.join(hits, "doc_id", "left").select(
        "doc_id",
        "total_shingles",
        F.coalesce("hit_shingles", F.lit(0)).alias("hit_shingles"),
        (
            F.coalesce("hit_shingles", F.lit(0)) * 100
            >= F.lit(pct) * F.col("total_shingles")
        ).alias("contaminated"),
    )


def contamination_overlap_oracle_sql(
    probe_max_doc: int = PROBE_MAX_DOC, n: int = 3, pct: int = CONTAM_PCT
) -> str:
    joined = " || ' ' || ".join(f"w[i+{j}]" for j in range(n))
    shingles = (
        f"CASE WHEN len(w) < {n} THEN [] "
        f"ELSE list_distinct(list_transform(generate_series(1, len(w) - {n - 1}), "
        f"i -> {joined})) END"
    )
    return f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS w
  FROM documents
), s AS (
  SELECT doc_id, {shingles} AS sh FROM t
), e AS (
  SELECT DISTINCT doc_id, unnest(sh) AS s FROM s
), probe AS (
  SELECT DISTINCT s FROM e WHERE doc_id < {probe_max_doc}
), corpus AS (
  SELECT * FROM e WHERE doc_id >= {probe_max_doc}
), tot AS (
  SELECT doc_id, count(*) AS total_shingles FROM corpus GROUP BY 1
), h AS (
  SELECT c.doc_id, count(*) AS hit_shingles
  FROM corpus c JOIN probe p USING (s) GROUP BY 1
)
SELECT tot.doc_id,
       tot.total_shingles,
       coalesce(h.hit_shingles, 0) AS hit_shingles,
       coalesce(h.hit_shingles, 0) * 100 >= {pct} * tot.total_shingles
         AS contaminated
FROM tot LEFT JOIN h USING (doc_id)
"""


def mixture_temperature_sample(docs: DataFrame, bits: int = 16) -> DataFrame:
    """Domain-mixture (temperature) sampling — the data-mixing stage of a
    pretraining pipeline: per-source acceptance rates
    ``rate_s = sqrt(min_n / n_s)`` keep the smallest source whole and
    downsample larger sources toward equal representation (temperature
    alpha = 0.5 over corpus shares), with the accept decision a pure
    function of the stable doc_id (md5-prefix integer < floor(rate·2^bits))
    — reproducible across runs, engines, and repartitioning, unlike
    rand()-based sampling.

    Scale shape: per-source counts are one map-side-combined aggregation;
    the (tiny) rate table broadcasts back onto the corpus; the accept test
    is a narrow codegen'd expression. The corpus never shuffles. Returns
    per-source totals (n_total, n_sampled, chars_sampled, rate) —
    hash-checkable in DuckDB because sqrt/floor round identically (IEEE)
    and md5 matches bit-for-bit.
    """
    stats = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    mn = stats.agg(F.min("n_s").alias("min_n"))
    rates = stats.crossJoin(F.broadcast(mn)).select(
        "source",
        F.sqrt(F.col("min_n").cast("double") / F.col("n_s")).alias("rate"),
    )
    hv = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, bits // 4), 16, 10
    ).cast("long")
    accept = hv < F.floor(F.col("rate") * (1 << bits))
    return (
        docs.join(F.broadcast(rates), "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(accept.cast("int")).cast("long").alias("n_sampled"),
            F.sum(F.when(accept, F.col("n_chars")).otherwise(0))
            .cast("long")
            .alias("chars_sampled"),
            F.round(F.max("rate"), 6).alias("rate"),
        )
        .orderBy("source")
    )


def mixture_temperature_sample_oracle_sql(bits: int = 16) -> str:
    nd = bits // 4
    hv = " + ".join(
        f"(CAST(strpos('0123456789abcdef', substr(h, {i + 1}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (nd - 1 - i)})"
        for i in range(nd)
    )
    return f"""
WITH s AS (
  SELECT source, count(*) AS n_s FROM documents GROUP BY source
), m AS (
  SELECT min(n_s) AS min_n FROM s
), r AS (
  SELECT source, sqrt(CAST(min_n AS DOUBLE) / n_s) AS rate FROM s, m
), d AS (
  SELECT doc.source, doc.n_chars, r.rate,
         md5(CAST(doc.doc_id AS VARCHAR)) AS h
  FROM documents doc JOIN r USING (source)
), v AS (
  SELECT source, n_chars, rate, ({hv}) AS hv FROM d
)
SELECT source, count(*) AS n_total,
       CAST(sum(CASE WHEN hv < floor(rate * {1 << bits}) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_sampled,
       CAST(sum(CASE WHEN hv < floor(rate * {1 << bits}) THEN n_chars
                     ELSE 0 END) AS BIGINT) AS chars_sampled,
       round(max(rate), 6) AS rate
FROM v GROUP BY source ORDER BY source"""


def training_shard_assignment(
    docs: DataFrame, num_shards: int = 16, bits: int = 48
) -> DataFrame:
    """Deterministic global shuffle + sharding for training export — the
    last stage of a pretraining data pipeline: every document gets a
    (shard, pos) address where ``shard = h(doc_id) mod num_shards`` and
    ``pos`` is the document's rank by hash *within* its shard. Reading
    shards in pos order yields a reproducible pseudo-random global order
    (hash-ordered, so neighboring source documents scatter), which is what
    an iid-batch training loader needs — and unlike ``orderBy(rand())``
    it is stable across runs, engines, retries, and repartitioning.

    Scale shape: the hash is a narrow codegen'd map; the only shuffle is
    the per-shard window — num_shards-way parallel sorts of N/num_shards
    docs each (at 100 TB: repartitionByRange on (shard, pos) and write,
    one sorted file per shard — no corpus-wide single sort). md5-prefix
    integers make the assignment bit-identical in DuckDB for the oracle;
    a production path would swap in xxhash64 the way minhash does.
    """
    hv = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, bits // 4),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("shard").orderBy("hv", "doc_id")
    return (
        docs.select("doc_id", hv.alias("hv"))
        .withColumn("shard", (F.col("hv") % num_shards).cast("int"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select("doc_id", "shard", "pos")
    )


def training_shard_assignment_oracle_sql(
    num_shards: int = 16, bits: int = 48
) -> str:
    nd = bits // 4
    hv = " + ".join(
        f"(CAST(strpos('0123456789abcdef', substr(h, {i + 1}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (nd - 1 - i)})"
        for i in range(nd)
    )
    return f"""
WITH d AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents
), v AS (
  SELECT doc_id, ({hv}) AS hv FROM d
)
SELECT doc_id, CAST(hv % {num_shards} AS INTEGER) AS shard,
       CAST(row_number() OVER (PARTITION BY hv % {num_shards}
                               ORDER BY hv, doc_id) AS BIGINT) AS pos
FROM v"""


def cluster_balanced_sample(
    embeddings: DataFrame, per_cluster: int = 8, n_centroids: int = 16
) -> DataFrame:
    """Embedding-diversity-stratified selection: assign every vector to
    its nearest (max-cosine) centroid and keep ``per_cluster`` vectors
    per cluster in a deterministic pseudo-random order — the coverage
    sampler for training-data curation (a uniform sample over-serves
    dense regions; a cluster-balanced one spans the embedding space).

    Deterministic end to end: centroids are the first ``n_centroids``
    vec_ids (the repo's oracle-checkable IVF convention) and the
    within-cluster order is md5(vec_id) — reproducible "randomness",
    exactly the `stratified_hash_sample` trick applied per cluster.

    Scale (100 TB): assignment is a narrow broadcast map; the only
    shuffle keys on c_id and the per-cluster limit runs as
    WindowGroupLimit (rank pushdown), so only ~per_cluster * clusters
    rows survive the exchange.
    """
    from datafusion_pinot_spark.operators.similarity import _ivf_assignments

    emb = embeddings.select(
        "vec_id", as_double_array("embedding").alias("v")
    )
    _, assigned = _ivf_assignments(emb, n_centroids)
    w = Window.partitionBy("c_id").orderBy(
        F.md5(F.col("vec_id").cast("string")), F.asc("vec_id")
    )
    return (
        assigned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= per_cluster)
        .select("c_id", "vec_id", "rank")
        .orderBy("c_id", "rank")
    )


def cluster_balanced_sample_oracle_sql(
    per_cluster: int = 8, n_centroids: int = 16
) -> str:
    from datafusion_pinot_spark.operators.similarity import _cosine_sql

    sim = _cosine_sql("e.v", "c.c_v")
    return f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), centroids AS (
  SELECT vec_id AS c_id, v AS c_v FROM emb WHERE vec_id < {n_centroids}
), assigned AS (
  SELECT vec_id, c_id FROM (
    SELECT e.vec_id, c.c_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {sim} DESC, c.c_id ASC) AS rnk
    FROM emb e CROSS JOIN centroids c
  ) WHERE rnk = 1
)
SELECT c_id, vec_id, rank FROM (
  SELECT c_id, vec_id,
         row_number() OVER (PARTITION BY c_id
                            ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                     vec_id ASC) AS rank
  FROM assigned
) WHERE rank <= {per_cluster} ORDER BY c_id, rank
"""


def chunk_token_windows(
    docs: DataFrame, window: int = 128, stride: int = 64
) -> DataFrame:
    """Overlapping token-window chunks for embedding / retrieval indexing:
    each document becomes ``ceil(n_tokens / stride)`` chunks of up to
    ``window`` tokens starting every ``stride`` tokens (stride < window =
    sliding overlap, stride == window = disjoint blocks).

    One row per chunk: ``doc_id, chunk_idx, chunk_start, n_chunk_tokens,
    chunk_md5`` (md5 of the space-rejoined slice — chunk identity without
    shipping the text). Pure narrow map + explode over engine built-ins:
    no shuffle, no Python, embarrassingly parallel at 100 TB."""
    if stride <= 0 or window <= 0 or stride > window:
        raise ValueError("need 0 < stride <= window")
    toks = docs.select(
        "doc_id", tokens(F.col("text")).alias("toks")
    ).withColumn("n", F.size("toks")).filter(F.col("n") > 0)
    chunks = toks.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.expr(f"(n - 1) div {stride}"))
        ).alias("i"),
    )
    ctoks = F.slice("toks", F.col("i").cast("int") * stride + 1, window)
    return chunks.select(
        "doc_id",
        F.col("i").cast("int").alias("chunk_idx"),
        (F.col("i").cast("int") * stride).alias("chunk_start"),
        F.size(ctoks).alias("n_chunk_tokens"),
        F.md5(F.array_join(ctoks, " ")).alias("chunk_md5"),
    )


def chunk_token_windows_oracle_sql(window: int = 128, stride: int = 64) -> str:
    """DuckDB oracle: identical slicing arithmetic via lateral
    ``UNNEST(range(...))`` and 1-based inclusive list slices."""
    return f"""
WITH d AS (
  SELECT doc_id,
         regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
  FROM documents WHERE length(trim(text)) > 0
), c AS (
  SELECT doc_id, t.i AS i, toks[(t.i * {stride} + 1):(t.i * {stride} + {window})] AS ctoks
  FROM d, UNNEST(range(0, (len(toks) - 1) // {stride} + 1)) AS t(i)
)
SELECT doc_id, CAST(i AS INT) AS chunk_idx,
       CAST(i * {stride} AS INT) AS chunk_start,
       CAST(len(ctoks) AS INT) AS n_chunk_tokens,
       md5(array_to_string(ctoks, ' ')) AS chunk_md5
FROM c"""


def pps_systematic_sample(
    docs: DataFrame, k: int = 100, bucket_span: int = BUCKET_SPAN
) -> DataFrame:
    """Systematic probability-proportional-to-size sample of ~``k`` docs,
    weighted by ``n_chars`` — the weighted corpus downsampling step of a
    training-data pipeline, with NO floating point anywhere: a document
    occupying cumulative-weight interval ``(cum - w, cum]`` is selected
    iff the interval contains a stratum boundary, i.e. ``(cum * k) div W
    > ((cum - w) * k) div W``; ``n_slots`` counts boundaries covered
    (total slots across the corpus is exactly ``k``). Deterministic
    start-at-zero variant: reproducible across engines and runs by
    construction.

    Scale shape: the global cumulative weight uses the same bucketed
    two-pass prefix sums as :func:`sequence_pack_bins` — no
    corpus-wide single-partition sort; the total weight broadcast is one
    row."""
    w = docs.select(
        "doc_id", F.col("n_chars").cast("long").alias("w")
    ).filter(F.col("w") > 0)
    cum = _bucketed_prefix_sum(w, "w", bucket_span)
    # DECIMAL(38,0) multiply: cum * k in BIGINT overflows once
    # total_weight * k passes 2^63 (the DuckDB oracle's HUGEINT window
    # sums would not) — decimal keeps both engines exact
    hi = F.expr(f"CAST(cum AS DECIMAL(38,0)) * {k} div total")
    lo = F.expr(f"CAST(cum - w AS DECIMAL(38,0)) * {k} div total")
    return (
        cum.withColumn("n_slots", (hi - lo).cast("long"))
        .filter(F.col("n_slots") > 0)
        .select("doc_id", "w", "n_slots")
        .orderBy("doc_id")
    )


def pps_systematic_sample_oracle_sql(k: int = 100) -> str:
    return f"""
WITH w AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS w FROM documents
  WHERE n_chars > 0
), c AS (
  SELECT doc_id, w,
         sum(w) OVER (ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         sum(w) OVER () AS total_w
  FROM w
)
SELECT doc_id, w,
       CAST(cum * {k} // total_w - (cum - w) * {k} // total_w AS BIGINT)
         AS n_slots
FROM c
WHERE cum * {k} // total_w > (cum - w) * {k} // total_w
ORDER BY doc_id"""


def curriculum_schedule(docs: DataFrame, k: int = 200) -> DataFrame:
    """Deterministic curriculum ordering for training: docs are scored
    (here: ``n_chars`` as the easiness proxy — longest first), cut into
    exact global deciles, and within each decile round-robined across
    sources so no contiguous stretch of the schedule is single-source.
    Returns the first ``k`` schedule slots as (doc_id, source, decile,
    curriculum_pos).

    Scale shape: both global orderings go through
    :func:`~datafusion_pinot_spark.operators.ranking.global_rank` (the
    bucketed two-pass prefix sum — no single-partition global window). The
    decile pass buckets by the coarse score; the schedule pass buckets by
    (decile, round) pairs, each of which holds at most one row per source,
    so the within-bucket window is bounded by the source count regardless
    of corpus size."""
    from datafusion_pinot_spark.operators.ranking import (
        global_rank,
        proportional_bucket,
    )
    from pyspark.sql import Window

    # the desc n_chars ordering enters global_rank as an explicit negated
    # column (monotone with its coarse bucket)
    ranked = (
        docs.select(
            "doc_id", "source", "n_chars",
            F.expr("-n_chars").alias("__negchars"),
        )
        .transform(
            lambda d: global_rank(
                d, bucket=F.expr("__negchars div 64"),
                order_cols=["__negchars", "doc_id"],
            )
        )
        .withColumn("decile", proportional_bucket("rank", "total", 10))
    )
    rr = F.row_number().over(
        Window.partitionBy("decile", "source").orderBy("doc_id")
    )
    sched = ranked.select("doc_id", "source", "decile").withColumn("rr", rr)
    out = global_rank(
        sched,
        bucket=F.expr("cast(decile as bigint) * 1000000000 + rr"),
        order_cols=["decile", "rr", "source", "doc_id"],
        rank_col="curriculum_pos",
        total_col="__t2",
    )
    return (
        out.filter(F.col("curriculum_pos") <= k)
        .select("doc_id", "source", "decile", "curriculum_pos")
        .orderBy("curriculum_pos")
    )


def curriculum_schedule_oracle_sql(k: int = 200) -> str:
    return f"""
WITH ranked AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) AS rnk,
         count(*) OVER () AS total
  FROM documents
), dec AS (
  SELECT doc_id, source,
         CAST((rnk - 1) * 10 // total + 1 AS INTEGER) AS decile
  FROM ranked
), rrd AS (
  SELECT doc_id, source, decile,
         row_number() OVER (PARTITION BY decile, source ORDER BY doc_id) AS rr
  FROM dec
)
SELECT doc_id, source, decile,
       row_number() OVER (ORDER BY decile, rr, source, doc_id)
         AS curriculum_pos
FROM rrd
QUALIFY curriculum_pos <= {k}
ORDER BY curriculum_pos
"""


def domain_token_budget(docs: DataFrame, budget: int = 100_000) -> DataFrame:
    """Exact largest-remainder (Hamilton) apportionment of a global token
    budget across sources — the data-mixing step that turns "sample 2B
    tokens proportionally to domain size" into per-domain integer targets
    that provably sum to the budget (floor quotas can undershoot by up to
    n_sources-1; the leftover goes to the largest fractional remainders,
    ties broken by source name so the allocation is deterministic).

    Scale shape: one corpus aggregation (map-side-combined sum of
    per-document token counts per source) collapses 100 TB to one row per
    source; the apportionment windows run over that tiny table. All
    arithmetic is BIGINT-exact — no floating shares to drift cross-engine.
    """
    from datafusion_pinot_spark.functions import tokens

    per = (
        docs.select("source", F.size(tokens(F.col("text"))).alias("n_tok"))
        .groupBy("source")
        .agg(F.sum("n_tok").alias("tokens"))
    )
    from pyspark.sql import Window

    w_all = Window.partitionBy()
    b = F.lit(budget).cast("bigint")
    # Degenerate-corpus guard: an all-empty-text corpus makes the divisor
    # sum(tokens) zero — Spark's DIV would yield NULL rows while DuckDB's
    # // errors, a cross-engine divergence. A zero-token corpus has no
    # apportionment; drop it before dividing (empty result both engines).
    per = per.withColumn("_total", F.sum("tokens").over(w_all)).filter(
        F.col("_total") > 0
    )
    per = per.select(
        "source",
        "tokens",
        F.expr(f"CAST({budget} AS BIGINT) * tokens DIV _total").alias("quota"),
        F.expr(f"CAST({budget} AS BIGINT) * tokens % _total").alias("rem"),
    )
    leftover = b - F.sum("quota").over(w_all)
    rank = F.row_number().over(
        Window.partitionBy().orderBy(F.desc("rem"), F.asc("source"))
    )
    return (
        per.withColumn("extra", (rank <= leftover).cast("bigint"))
        .select(
            "source",
            "tokens",
            (F.col("quota") + F.col("extra")).alias("alloc"),
        )
        .orderBy("source")
    )


def domain_token_budget_oracle_sql(budget: int = 100_000) -> str:
    return f"""
WITH per AS (
  SELECT source,
         CAST(sum(CASE WHEN length(trim(lower(text))) = 0 THEN 0
                       ELSE len(regexp_split_to_array(trim(lower(text)),
                                                      '\\s+')) END)
              AS BIGINT) AS tokens
  FROM documents GROUP BY source
), tot AS (
  SELECT source, tokens, sum(tokens) OVER () AS total FROM per
), q AS (
  SELECT source, tokens,
         CAST({budget} AS BIGINT) * tokens // total AS quota,
         CAST({budget} AS BIGINT) * tokens % total AS rem
  FROM tot WHERE total > 0
), r AS (
  SELECT source, tokens, quota,
         {budget} - sum(quota) OVER () AS leftover,
         row_number() OVER (ORDER BY rem DESC, source ASC) AS rnk
  FROM q
)
SELECT source, tokens,
       CAST(quota + CASE WHEN rnk <= leftover THEN 1 ELSE 0 END AS BIGINT)
         AS alloc
FROM r ORDER BY source
"""


def epoch_upsample_report(docs: DataFrame) -> DataFrame:
    """Materialized per-source upsampling to a common document target —
    the "repeat rare domains" step of mixture training (epochs per
    source, public practice in LLM data recipes): every source is
    brought to the size of the LARGEST source by repeating its corpus
    ``target DIV n_s`` full epochs plus one extra copy of the
    ``target MOD n_s`` docs ranked first by ``md5(doc_id)`` (a
    deterministic, engine-agnostic pseudo-random pick). The report
    aggregates the ACTUALLY materialized stream — count and doc-id sum
    per source — so the hash gate proves both the arithmetic and the
    exact extra-copy selection.

    Scale shape: per-source counts are one map-side-combined agg; the
    per-doc rank is a window partitioned by source over the md5 key
    (bounded by the largest source, the same shuffle any per-source
    operation pays); the repetition itself is a narrow
    ``explode(sequence())`` — no shuffle, output rows stream straight
    into the next stage (here the final per-source agg). At 100 TB the
    materialization would feed the training-shard writer instead of an
    aggregate, with an identical plan below it."""
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    target = counts.agg(F.max("n_s").alias("target"))
    ranked = (
        docs.select("doc_id", "source")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("source").orderBy(
                    F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
                )
            ),
        )
        .join(F.broadcast(counts), "source")
        .crossJoin(F.broadcast(target))
        .withColumn(
            "n_rep",
            F.expr(
                "target DIV n_s + CASE WHEN rk <= target % n_s THEN 1"
                " ELSE 0 END"
            ),
        )
    )
    # Repetition is exploded in two bounded levels rather than one
    # sequence(1, n_rep): a tiny source upsampled toward a huge target
    # would otherwise materialize an n_rep-element array per row (array
    # cap / executor memory at extreme ratios). Level 1 emits one row per
    # 4096-epoch chunk, level 2 expands each chunk — per-row array size
    # is capped at max(4096, n_rep/4096), i.e. 4096 for any n_rep up to
    # ~16.7M epochs, and rows still stream straight into the next stage.
    _CH = 4096
    emitted = (
        ranked.withColumn(
            "chunk", F.explode(F.expr(f"sequence(0, (n_rep - 1) DIV {_CH})"))
        )
        .select(
            "source",
            "doc_id",
            F.explode(
                F.expr(
                    f"sequence(chunk * {_CH} + 1,"
                    f" least(n_rep, (chunk + 1) * {_CH}))"
                )
            ).alias("epoch"),
        )
    )
    return (
        emitted.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_emitted"),
            F.sum("doc_id").cast("long").alias("sum_doc_id"),
            F.countDistinct("doc_id").alias("n_unique"),
        )
        .orderBy("source")
    )


def epoch_upsample_report_oracle_sql() -> str:
    return """
WITH counts AS (
  SELECT source, count(*) AS n_s FROM documents GROUP BY source
), tgt AS (
  SELECT max(n_s) AS target FROM counts
), ranked AS (
  SELECT d.doc_id, d.source, c.n_s, t.target,
         row_number() OVER (
           PARTITION BY d.source
           ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rk
  FROM documents d JOIN counts c USING (source) CROSS JOIN tgt t
), reps AS (
  SELECT source, doc_id,
         target // n_s + CASE WHEN rk <= target % n_s THEN 1 ELSE 0 END
           AS n_rep
  FROM ranked
), emitted AS (
  SELECT source, doc_id, unnest(generate_series(1, n_rep)) AS epoch
  FROM reps WHERE n_rep > 0
)
SELECT source, CAST(count(*) AS BIGINT) AS n_emitted,
       CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_unique
FROM emitted GROUP BY source ORDER BY source"""


def split_leakage_audit(
    docs: DataFrame, valid_mod: int = 10, bits: int = 48
) -> DataFrame:
    """Train/valid split leakage audit — the eval-hygiene check a
    pretraining pipeline runs before trusting its held-out loss: the
    split is a deterministic hash of doc_id (``h % valid_mod == valid_mod
    - 1`` -> valid, i.e. a 90/10 split at the default), but exact
    duplicates of a validation document sitting in TRAIN leak its content
    across the boundary, silently deflating eval loss. Reports the split
    sizes, the number of exact-dup groups straddling the boundary, the
    count of valid docs whose content also appears in train, and that
    count as exact ppm of the validation set.

    The split hash is the house md5-prefix integer (bit-identical in
    DuckDB, like training_shard_assignment); content identity is
    md5(text) (the exact_dedup key). Scale shape: one narrow map (two
    md5s) + one content-hash shuffle + a 1-row rollup; never quadratic.
    """
    nd = bits // 4
    hv = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, nd), 16, 10
    ).cast("long")
    tagged = docs.select(
        F.md5("text").alias("h"),
        (hv % valid_mod == valid_mod - 1).cast("int").alias("is_valid"),
    )
    groups = tagged.groupBy("h").agg(
        F.sum("is_valid").cast("long").alias("n_valid_g"),
        F.sum(1 - F.col("is_valid")).cast("long").alias("n_train_g"),
    )
    cross = (F.col("n_valid_g") > 0) & (F.col("n_train_g") > 0)
    return groups.agg(
        F.sum("n_train_g").cast("long").alias("n_train"),
        F.sum("n_valid_g").cast("long").alias("n_valid"),
        F.coalesce(F.sum(cross.cast("long")), F.lit(0))
        .cast("long")
        .alias("n_cross_groups"),
        F.coalesce(
            F.sum(F.when(cross, F.col("n_valid_g")).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_valid_leaked"),
    ).withColumn(
        "leak_ppm",
        F.expr(
            "CASE WHEN n_valid > 0"
            " THEN CAST(n_valid_leaked * 1000000L div n_valid AS BIGINT)"
            " ELSE 0L END"
        ),
    )


def split_leakage_audit_oracle_sql(
    valid_mod: int = 10, bits: int = 48
) -> str:
    nd = bits // 4
    hv = " + ".join(
        f"(CAST(strpos('0123456789abcdef', substr(hid, {i + 1}, 1)) - 1"
        f" AS BIGINT) * {16 ** (nd - 1 - i)})"
        for i in range(nd)
    )
    return f"""
WITH tagged AS (
  SELECT md5(text) AS h,
         CASE WHEN ({hv}) % {valid_mod} = {valid_mod - 1}
              THEN 1 ELSE 0 END AS is_valid
  FROM (SELECT text, md5(CAST(doc_id AS VARCHAR)) AS hid FROM documents)
), groups AS (
  SELECT h,
         CAST(sum(is_valid) AS BIGINT) AS n_valid_g,
         CAST(sum(1 - is_valid) AS BIGINT) AS n_train_g
  FROM tagged GROUP BY h
)
SELECT CAST(sum(n_train_g) AS BIGINT) AS n_train,
       CAST(sum(n_valid_g) AS BIGINT) AS n_valid,
       CAST(coalesce(sum(CASE WHEN n_valid_g > 0 AND n_train_g > 0
                              THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_cross_groups,
       CAST(coalesce(sum(CASE WHEN n_valid_g > 0 AND n_train_g > 0
                              THEN n_valid_g ELSE 0 END), 0) AS BIGINT)
         AS n_valid_leaked,
       CAST(CASE WHEN sum(n_valid_g) > 0
                 THEN coalesce(sum(CASE WHEN n_valid_g > 0 AND n_train_g > 0
                                        THEN n_valid_g ELSE 0 END), 0)
                      * 1000000 // sum(n_valid_g)
                 ELSE 0 END AS BIGINT) AS leak_ppm
FROM groups"""


def training_mixture_report(docs: DataFrame, budget: int = 100_000) -> DataFrame:
    """Composed curation pipeline (r12) — the mixture-planning counterpart
    of ``dedup_pipeline_report``: corpus → exact dedup (canonical keep,
    longest-doc-wins per md5 group) → quality gate (the FineWeb-style
    ``quality_filter`` rule chain over the SURVIVORS) → per-source report
    with an exact largest-remainder apportionment of a global token budget
    across the cleaned corpus. One query answers "after cleaning, how many
    docs/tokens does each source contribute, and what budget does it get".

    Per source: raw doc count, docs surviving dedup, docs surviving the
    quality gate, surviving tokens (the ``tokens()`` convention), and the
    Hamilton-apportioned ``alloc_tokens`` (BIGINT-exact; allocations
    provably sum to ``budget`` when any tokens survive).

    Scale shape: one md5 hash shuffle for the canonical window; the
    quality signals are (doc_id, token/gram) shuffles bounded by document
    length, computed only over dedup survivors; everything after is a
    map-side-combined per-source rollup plus windows over the |sources|-
    row profile (the deliberate single-partition window the family's
    other reports use)."""
    from pyspark.sql import Window

    from datafusion_pinot_spark.functions import tokens
    from datafusion_pinot_spark.operators.text import quality_filter

    ranked = docs.select(
        "doc_id", "source", "text", "n_chars", F.md5("text").alias("key")
    ).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("key").orderBy(
                F.desc("n_chars"), F.asc("doc_id")
            )
        ),
    )
    surv = ranked.filter(F.col("rk") == 1).select("doc_id", "source", "text")
    qf = quality_filter(surv).select("doc_id", "keep")
    kept = (
        surv.join(qf, "doc_id")
        .filter(F.col("keep"))
        .select(
            "source",
            F.size(tokens(F.col("text"))).cast("long").alias("n_tok"),
        )
    )
    per_kept = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_quality_kept"),
        F.sum("n_tok").cast("long").alias("kept_tokens"),
    )
    # largest-remainder apportionment over the kept-token profile (the
    # domain_token_budget convention, run on the CLEANED corpus)
    w_all = Window.partitionBy()
    alloc = (
        per_kept.withColumn(
            "_total", F.sum("kept_tokens").over(w_all)
        )
        .filter(F.col("_total") > 0)
        .select(
            "source",
            F.expr(
                f"CAST({budget} AS BIGINT) * kept_tokens DIV _total"
            ).alias("quota"),
            F.expr(
                f"CAST({budget} AS BIGINT) * kept_tokens % _total"
            ).alias("rem"),
        )
    )
    rank = F.row_number().over(
        Window.partitionBy().orderBy(F.desc("rem"), F.asc("source"))
    )
    leftover = F.lit(budget).cast("bigint") - F.sum("quota").over(w_all)
    alloc = alloc.withColumn("extra", (rank <= leftover).cast("bigint")).select(
        "source", (F.col("quota") + F.col("extra")).alias("alloc_tokens")
    )
    raw = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    ded = surv.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_dedup_kept")
    )
    return (
        raw.join(ded, "source", "left")
        .join(per_kept, "source", "left")
        .join(alloc, "source", "left")
        .na.fill(
            0,
            ["n_dedup_kept", "n_quality_kept", "kept_tokens", "alloc_tokens"],
        )
        .select(
            "source",
            "n_docs",
            "n_dedup_kept",
            "n_quality_kept",
            "kept_tokens",
            "alloc_tokens",
        )
        .orderBy("source")
    )


def training_mixture_report_oracle_sql(budget: int = 100_000) -> str:
    from datafusion_pinot_spark.operators.text import quality_signal_ctes

    return f"""
WITH ranked AS (
  SELECT doc_id, source, text,
         row_number() OVER (
           PARTITION BY md5(text) ORDER BY n_chars DESC, doc_id ASC) AS rk
  FROM documents
), surv AS (
  SELECT doc_id, source, text FROM ranked WHERE rk = 1
), {quality_signal_ctes("surv")},
kept AS (
  SELECT s.source,
         CAST(CASE WHEN length(trim(lower(s.text))) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(lower(s.text)), '\\s+'))
              END AS BIGINT) AS n_tok
  FROM surv s JOIN qdecision q USING (doc_id) WHERE q.keep
), per_kept AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_quality_kept,
         CAST(sum(n_tok) AS BIGINT) AS kept_tokens
  FROM kept GROUP BY source
), tot AS (
  SELECT source, n_quality_kept, kept_tokens,
         sum(kept_tokens) OVER () AS total
  FROM per_kept
), q2 AS (
  SELECT source,
         CAST({budget} AS BIGINT) * kept_tokens // total AS quota,
         CAST({budget} AS BIGINT) * kept_tokens % total AS rem
  FROM tot WHERE total > 0
), r2 AS (
  SELECT source, quota,
         {budget} - sum(quota) OVER () AS leftover,
         row_number() OVER (ORDER BY rem DESC, source ASC) AS rnk
  FROM q2
), alloc AS (
  SELECT source,
         CAST(quota + CASE WHEN rnk <= leftover THEN 1 ELSE 0 END AS BIGINT)
           AS alloc_tokens
  FROM r2
), raw AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY source
), ded AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_dedup_kept
  FROM surv GROUP BY source
)
SELECT raw.source, raw.n_docs,
       CAST(coalesce(ded.n_dedup_kept, 0) AS BIGINT) AS n_dedup_kept,
       CAST(coalesce(pk.n_quality_kept, 0) AS BIGINT) AS n_quality_kept,
       CAST(coalesce(pk.kept_tokens, 0) AS BIGINT) AS kept_tokens,
       CAST(coalesce(a.alloc_tokens, 0) AS BIGINT) AS alloc_tokens
FROM raw
LEFT JOIN ded ON ded.source = raw.source
LEFT JOIN per_kept pk ON pk.source = raw.source
LEFT JOIN alloc a ON a.source = raw.source
ORDER BY raw.source"""


def temporal_split_leakage(
    events: DataFrame, train_frac_pct: int = 80
) -> DataFrame:
    """Temporal train/valid split leakage audit (r12) — the time-based
    sibling of ``split_leakage_audit``: models trained on events up to a
    cutoff and evaluated after it leak when the SAME USERS appear on both
    sides (user-level memorization contaminates a user-held-out eval; a
    time-held-out eval must at least report the overlap it accepts).
    The cutoff is data-derived but exact: the epoch-day at
    ``train_frac_pct`` percent of the observed day RANGE (integer
    arithmetic on day numbers — no quantile estimation, no floats).

    Per event_type: events and distinct users on each side, users seen on
    BOTH sides, and the overlap as ppm of valid-side users.

    Scale shape (100 TB): one map-side-combined reduce for the day bounds
    (broadcast back as a 1-row frame), one shuffle on (event_type,
    user_id) to flag each user's side membership, one rollup. No joins
    against raw events."""
    # NULL-ts rows carry no side information and would diverge across
    # engines (Spark's (null <= cut) casts to NULL, SQL's CASE lands in
    # ELSE 0) — excluded identically on both sides
    days = events.filter(F.col("ts").isNotNull()).select(
        "event_type",
        "user_id",
        F.expr("unix_micros(ts) DIV 86400000000").alias("day"),
    )
    bounds = days.agg(
        F.min("day").alias("dmin"), F.max("day").alias("dmax")
    )
    cut = F.expr(f"dmin + (dmax - dmin) * {train_frac_pct} DIV 100")
    flagged = (
        days.join(F.broadcast(bounds))
        .withColumn("is_train", (F.col("day") <= cut).cast("bigint"))
        .groupBy("event_type", "user_id")
        .agg(
            F.max("is_train").alias("in_train"),
            F.max(F.lit(1) - F.col("is_train")).alias("in_valid"),
            F.sum("is_train").alias("n_train_ev"),
            F.sum(F.lit(1) - F.col("is_train")).alias("n_valid_ev"),
        )
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.sum("n_train_ev").cast("long").alias("train_events"),
            F.sum("n_valid_ev").cast("long").alias("valid_events"),
            F.sum("in_train").cast("long").alias("train_users"),
            F.sum("in_valid").cast("long").alias("valid_users"),
            F.sum(F.col("in_train") * F.col("in_valid"))
            .cast("long")
            .alias("overlap_users"),
        )
        .select(
            "event_type",
            "train_events",
            "valid_events",
            "train_users",
            "valid_users",
            "overlap_users",
            F.expr(
                "CAST(CASE WHEN valid_users > 0"
                " THEN overlap_users * 1000000 DIV valid_users"
                " ELSE 0 END AS BIGINT)"
            ).alias("leak_ppm"),
        )
        .orderBy("event_type")
    )


def temporal_split_leakage_oracle_sql(train_frac_pct: int = 80) -> str:
    return f"""
WITH days AS (
  SELECT event_type, user_id,
         epoch_us(ts) // 86400000000 AS day
  FROM events WHERE ts IS NOT NULL
), bounds AS (
  SELECT min(day) AS dmin, max(day) AS dmax FROM days
), flagged AS (
  SELECT event_type, user_id,
         max(CASE WHEN day <= dmin + (dmax - dmin) * {train_frac_pct} // 100
             THEN 1 ELSE 0 END) AS in_train,
         max(CASE WHEN day <= dmin + (dmax - dmin) * {train_frac_pct} // 100
             THEN 0 ELSE 1 END) AS in_valid,
         sum(CASE WHEN day <= dmin + (dmax - dmin) * {train_frac_pct} // 100
             THEN 1 ELSE 0 END) AS n_train_ev,
         sum(CASE WHEN day <= dmin + (dmax - dmin) * {train_frac_pct} // 100
             THEN 0 ELSE 1 END) AS n_valid_ev
  FROM days CROSS JOIN bounds
  GROUP BY event_type, user_id
)
SELECT event_type,
       CAST(sum(n_train_ev) AS BIGINT) AS train_events,
       CAST(sum(n_valid_ev) AS BIGINT) AS valid_events,
       CAST(sum(in_train) AS BIGINT) AS train_users,
       CAST(sum(in_valid) AS BIGINT) AS valid_users,
       CAST(sum(in_train * in_valid) AS BIGINT) AS overlap_users,
       CAST(CASE WHEN sum(in_valid) > 0
                 THEN sum(in_train * in_valid) * 1000000 // sum(in_valid)
                 ELSE 0 END AS BIGINT) AS leak_ppm
FROM flagged GROUP BY event_type ORDER BY event_type"""


PACK_CTX_LENS = (32, 64, 128, 256, 512)


def packing_waste_curve(
    docs: DataFrame, ctx_lens: tuple[int, ...] = PACK_CTX_LENS
) -> DataFrame:
    """Context-length planning table for one-document-per-sequence training
    (SFT / instruction tuning, where documents are NOT packed end to end):
    for each candidate context length L, how many documents truncate, how
    many tokens truncation loses, how much padding the short documents
    cost, and the resulting utilization in ppm. The complement of
    :func:`sequence_pack_bins` (which models the packed-pretraining
    layout); together they answer "pack or pad, and at what L?".

    All integer: kept = min(n, L), pad = L - kept, util_ppm =
    (sum(kept) * 1e6) div (n_docs * L).

    Scale shape (100 TB): one narrow token-count map, a |ctx_lens|-way
    explode (a constant fanout of 4, not a join), and one
    map-side-combined groupBy over |ctx_lens| groups. No shuffle carries
    text; the explode carries two BIGINTs per row."""
    tok = docs.select(
        F.size(tokens(F.col("text"))).cast("long").alias("n")
    ).filter(F.col("n") > 0)
    lens = F.array(*[F.lit(l) for l in ctx_lens])
    per = tok.select(
        "n", F.explode(lens).alias("ctx_len")
    ).select(
        "n", F.col("ctx_len").cast("long").alias("ctx_len")
    ).select(
        "ctx_len",
        "n",
        F.least(F.col("n"), F.col("ctx_len")).alias("kept"),
        F.greatest(F.col("n") - F.col("ctx_len"), F.lit(0).cast("long")).alias(
            "trunc"
        ),
    )
    return (
        per.groupBy("ctx_len")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("trunc") > 0).cast("long")).alias("n_truncated"),
            F.sum("n").alias("tokens_total"),
            F.sum("kept").alias("tokens_kept"),
            F.sum("trunc").alias("tokens_trunc"),
            F.sum(F.col("ctx_len") - F.col("kept")).alias("pad_tokens"),
        )
        .select(
            "ctx_len",
            "n_docs",
            "n_truncated",
            "tokens_total",
            "tokens_kept",
            "tokens_trunc",
            "pad_tokens",
            F.expr(
                "CAST((tokens_kept * CAST(1000000 AS BIGINT))"
                " div (n_docs * ctx_len) AS BIGINT)"
            ).alias("util_ppm"),
        )
        .orderBy("ctx_len")
    )


def packing_waste_curve_oracle_sql(
    ctx_lens: tuple[int, ...] = PACK_CTX_LENS
) -> str:
    lens = ", ".join(f"({l})" for l in ctx_lens)
    return f"""
WITH tok AS (
  SELECT CASE WHEN length(trim(lower(text))) = 0 THEN 0
              ELSE CAST(len(regexp_split_to_array(trim(lower(text)), '\\s+'))
                   AS BIGINT) END AS n
  FROM documents
), nz AS (
  SELECT n FROM tok WHERE n > 0
), lens(ctx_len) AS (VALUES {lens}),
per AS (
  SELECT CAST(ctx_len AS BIGINT) AS ctx_len, n,
         least(n, ctx_len) AS kept,
         greatest(n - ctx_len, 0) AS trunc
  FROM nz CROSS JOIN lens
)
SELECT ctx_len,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN trunc > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_truncated,
       CAST(sum(n) AS BIGINT) AS tokens_total,
       CAST(sum(kept) AS BIGINT) AS tokens_kept,
       CAST(sum(trunc) AS BIGINT) AS tokens_trunc,
       CAST(sum(ctx_len - kept) AS BIGINT) AS pad_tokens,
       CAST((sum(kept) * 1000000) // (count(*) * ctx_len) AS BIGINT)
         AS util_ppm
FROM per GROUP BY ctx_len ORDER BY ctx_len"""


# (name, min_tokens, max_top_tok_milli, max_dup2_milli) — DELIBERATELY
# non-nested gates (length-only / repetition-only / balanced) so the mask
# profile exposes genuine crossings: which rule family kills which docs.
ABLATION_CONFIGS = (
    ("len_gate", 30, 1_000_000, 1_000_000),
    ("rep_gate", 0, 180_000, 250_000),
    ("balanced", 15, 200_000, 300_000),
)


def quality_config_ablation(
    docs: DataFrame,
    configs: tuple[tuple[str, int, int, int], ...] = ABLATION_CONFIGS,
) -> DataFrame:
    """Curation-config ablation: evaluate several candidate quality gates
    over the SAME per-document signal frame and report the retained-set
    profile per agreement mask — bit i set means config i keeps the doc.
    The mask histogram answers the planning questions a threshold table
    cannot: how much do the gates overlap, which rule family uniquely
    kills which token mass, and what a config swap would actually change
    (the |A ∖ B| cells), all in one pass with no per-config rerun.

    Signals come from :func:`~datafusion_pinot_spark.operators.text.
    quality_signals` (exact integer millionths), so every keep decision is
    an integer comparison — nothing to drift between engines.

    Scale shape (100 TB): signals are computed ONCE (the expensive
    (doc, token) shuffles amortize across all configs); each config is a
    codegen'd boolean column; the profile is one map-side-combined
    groupBy over at most 2^|configs| groups."""
    from datafusion_pinot_spark.operators.text import quality_signals

    sig = quality_signals(docs)
    keeps = [
        (
            (F.col("n_tokens") >= mint)
            & (F.col("top_tok_milli") <= maxtop)
            & (F.col("dup2_milli") <= maxdup)
        ).alias(f"keep_{name}")
        for name, mint, maxtop, maxdup in configs
    ]
    flagged = sig.select("n_tokens", *keeps)
    mask = sum(
        F.col(f"keep_{name}").cast("int") * (1 << i)
        for i, (name, *_rest) in enumerate(configs)
    )
    return (
        flagged.select(mask.alias("mask"), "n_tokens", *[
            F.col(f"keep_{name}") for name, *_r in configs
        ])
        .groupBy("mask", *[f"keep_{name}" for name, *_r in configs])
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("tokens"),
        )
        .orderBy("mask")
    )


def quality_config_ablation_oracle_sql(
    configs: tuple[tuple[str, int, int, int], ...] = ABLATION_CONFIGS,
) -> str:
    from datafusion_pinot_spark.operators.text import quality_signal_ctes

    keeps = ", ".join(
        f"(n_tokens >= {mint} AND top_tok_milli <= {maxtop}"
        f" AND dup2_milli <= {maxdup}) AS keep_{name}"
        for name, mint, maxtop, maxdup in configs
    )
    mask = " + ".join(
        f"(CASE WHEN keep_{name} THEN {1 << i} ELSE 0 END)"
        for i, (name, *_r) in enumerate(configs)
    )
    keep_cols = ", ".join(f"keep_{name}" for name, *_r in configs)
    return f"""
WITH {quality_signal_ctes("documents")},
flagged AS (
  SELECT n_tokens, {keeps} FROM qjoined
)
SELECT CAST({mask} AS INTEGER) AS mask, {keep_cols},
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS tokens
FROM flagged GROUP BY mask, {keep_cols} ORDER BY mask"""


BLOOM_M = 16384  # bloom bits
BLOOM_K = 3  # hash functions


def _bloom_pos(col, j: int, m: int):
    """Bloom bit position j for a shingle: md5-prefix integer mod m —
    48-bit prefix, exact in BIGINT, bit-identical in DuckDB via the
    strpos polynomial (the training_shard_assignment trick)."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"b{j}|"), col)), 1, 12), 16, 10)
        .cast("long")
        % m
    )


def _bloom_pos_sql(expr: str, j: int, m: int) -> str:
    h = f"md5('b{j}|' || {expr})"
    poly = " + ".join(
        f"(CAST(strpos('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1"
        f" AS BIGINT) * {16 ** (12 - 1 - i)})"
        for i in range(12)
    )
    return f"(({poly}) % {m})"


def bloom_decontam_audit(
    docs: DataFrame,
    probe_max_doc: int = PROBE_MAX_DOC,
    n: int = 3,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """GPT-3-style Bloom-filter decontamination, audited against the exact
    semi-join it approximates. The benchmark ("probe") documents' shingles
    populate an m-bit Bloom filter with k hash functions; a corpus document
    is BLOOM-flagged when any of its shingles hits all k bits, and
    EXACT-flagged when any shingle is truly in the probe set. Per source:
    how many docs each method flags and the false-positive gap — the table
    that says whether m/k are sized right BEFORE burning a 100 TB pass.
    Blooms have no false negatives, so exact_flagged <= bloom_flagged
    row-by-row (pinned in tests).

    Determinism: the filter is simulated EXACTLY — the set bits are a
    materialized table of distinct positions (at most m rows), membership
    is a k-way position join — so both engines agree bit-for-bit; md5 is
    the hash family, as everywhere in this repo (xxhash64 is the
    production swap).

    Scale shape (100 TB): the bit table is bounded by m (2 KB of bitset here —
    ALWAYS broadcastable, that is the point of the data structure); the
    corpus side is one distinct-shingle scan, a k-way explode of bit
    positions (constant fanout), one broadcast join, and two
    map-side-combined rollups. The exact leg broadcasts the probe shingle
    set, small by construction (it is the benchmark). Nothing all-pairs,
    nothing shuffled by content."""
    sh = docs.select(
        "doc_id",
        "source",
        F.explode(word_shingles(tokens(F.col("text")), n)).alias("s"),
    )
    probe_sh = (
        sh.filter(F.col("doc_id") < probe_max_doc).select("s").distinct()
    )
    # the simulated filter: every bit any probe shingle sets (<= m rows)
    bits = (
        probe_sh.select(
            F.explode(
                F.array(*[_bloom_pos(F.col("s"), j, m) for j in range(k)])
            ).alias("pos")
        )
        .distinct()
    )
    corpus = sh.filter(F.col("doc_id") >= probe_max_doc)
    # per corpus shingle: does it pass the bloom (all k positions set)?
    cand = corpus.select(
        "doc_id",
        "source",
        "s",
        F.posexplode(
            F.array(*[_bloom_pos(F.col("s"), j, m) for j in range(k)])
        ).alias("j", "pos"),
    )
    passes = (
        cand.join(F.broadcast(bits.withColumn("hit", F.lit(1))), "pos", "left")
        .groupBy("doc_id", "source", "s")
        .agg((F.sum(F.coalesce("hit", F.lit(0))) == k).alias("bloom_hit"))
    )
    exact = corpus.join(F.broadcast(probe_sh), "s", "left_semi").select(
        "doc_id", F.lit(True).alias("exact_hit")
    ).distinct()
    per_doc = (
        passes.groupBy("doc_id", "source")
        .agg(F.max(F.col("bloom_hit").cast("int")).alias("bloom_flag"))
        .join(exact, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "bloom_flag",
            F.coalesce(F.col("exact_hit").cast("int"), F.lit(0)).alias(
                "exact_flag"
            ),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("bloom_flag").cast("long").alias("bloom_flagged"),
            F.sum("exact_flag").cast("long").alias("exact_flagged"),
            F.sum(
                ((F.col("bloom_flag") == 1) & (F.col("exact_flag") == 0)).cast(
                    "long"
                )
            ).alias("false_pos_docs"),
        )
        .orderBy("source")
    )


def bloom_decontam_audit_oracle_sql(
    probe_max_doc: int = PROBE_MAX_DOC,
    n: int = 3,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> str:
    joined = " || ' ' || ".join(f"w[i+{j}]" for j in range(n))
    shingles = (
        f"CASE WHEN len(w) < {n} THEN [] "
        f"ELSE list_distinct(list_transform(generate_series(1, len(w) - {n - 1}), "
        f"i -> {joined})) END"
    )
    pos_rows = " UNION ALL ".join(
        f"SELECT s, {_bloom_pos_sql('s', j, m)} AS pos FROM probe_sh"
        for j in range(k)
    )
    cand_rows = " UNION ALL ".join(
        f"SELECT doc_id, source, s, {_bloom_pos_sql('s', j, m)} AS pos"
        " FROM corpus"
        for j in range(k)
    )
    return f"""
WITH t AS (
  SELECT doc_id, source, regexp_split_to_array(trim(lower(text)), '\\s+') AS w
  FROM documents
), sarr AS (
  SELECT doc_id, source, {shingles} AS sh FROM t
), e AS (
  SELECT DISTINCT doc_id, source, unnest(sh) AS s FROM sarr
), probe_sh AS (
  SELECT DISTINCT s FROM e WHERE doc_id < {probe_max_doc}
), bits AS (
  SELECT DISTINCT pos FROM ({pos_rows})
), corpus AS (
  SELECT doc_id, source, s FROM e WHERE doc_id >= {probe_max_doc}
), cand AS (
  {cand_rows}
), passes AS (
  SELECT c.doc_id, c.source, c.s,
         (sum(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END) = {k})
           AS bloom_hit
  FROM cand c LEFT JOIN bits b USING (pos)
  GROUP BY c.doc_id, c.source, c.s
), exact AS (
  SELECT DISTINCT doc_id, 1 AS exact_flag
  FROM corpus JOIN probe_sh USING (s)
), per_doc AS (
  SELECT p.doc_id, p.source,
         max(CASE WHEN p.bloom_hit THEN 1 ELSE 0 END) AS bloom_flag,
         coalesce(any_value(x.exact_flag), 0) AS exact_flag
  FROM passes p LEFT JOIN exact x USING (doc_id)
  GROUP BY p.doc_id, p.source
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(bloom_flag) AS BIGINT) AS bloom_flagged,
       CAST(sum(exact_flag) AS BIGINT) AS exact_flagged,
       CAST(sum(CASE WHEN bloom_flag = 1 AND exact_flag = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS false_pos_docs
FROM per_doc GROUP BY source ORDER BY source"""


def split_quality_parity(
    docs: DataFrame, valid_mod: int = 10, bits: int = 48
) -> DataFrame:
    """Train/valid QUALITY parity audit — the fairness complement of
    :func:`split_leakage_audit` (same hash split, same `h % valid_mod ==
    valid_mod - 1` -> valid rule): per split and per quality-gate outcome
    (the FineWeb-style reason codes of text.quality_filter, '' = kept),
    document and token counts plus each reason's within-split share in
    exact ppm. A fair hash split gives near-identical reason mixes; a
    skewed table means the held-out loss is measured on systematically
    different text than training saw — invalid eval, before any model
    runs.

    Scale shape (100 TB): the quality signals are the one expensive pass
    (shared machinery, (doc, token) shuffles bounded by document length);
    the split tag is a narrow md5 map; the rollup is at most
    2 x |reasons| rows with map-side combine."""
    from datafusion_pinot_spark.operators.text import quality_filter

    nd = bits // 4
    hv = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, nd), 16, 10
    ).cast("long")
    qf = quality_filter(docs).select("doc_id", "n_tokens", "reason")
    tagged = qf.select(
        F.when(hv % valid_mod == valid_mod - 1, F.lit("valid"))
        .otherwise(F.lit("train"))
        .alias("split"),
        "n_tokens",
        "reason",
    )
    per = tagged.groupBy("split", "reason").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("tokens"),
    )
    w = Window.partitionBy("split")
    return (
        per.withColumn("split_docs", F.sum("n_docs").over(w))
        .select(
            "split",
            "reason",
            "n_docs",
            "tokens",
            F.expr(
                "CAST(n_docs * CAST(1000000 AS BIGINT) div split_docs"
                " AS BIGINT)"
            ).alias("share_ppm"),
        )
        .orderBy("split", "reason")
    )


def split_quality_parity_oracle_sql(
    valid_mod: int = 10, bits: int = 48
) -> str:
    from datafusion_pinot_spark.operators.text import quality_signal_ctes

    nd = bits // 4
    hv = " + ".join(
        f"(CAST(strpos('0123456789abcdef', substr(hid, {i + 1}, 1)) - 1"
        f" AS BIGINT) * {16 ** (nd - 1 - i)})"
        for i in range(nd)
    )
    return f"""
WITH {quality_signal_ctes("documents")},
tagged AS (
  SELECT CASE WHEN ({hv}) % {valid_mod} = {valid_mod - 1}
              THEN 'valid' ELSE 'train' END AS split,
         q.n_tokens, q.reason
  FROM qdecision q
  JOIN (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hid FROM documents)
    USING (doc_id)
), per AS (
  SELECT split, reason,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS tokens
  FROM tagged GROUP BY split, reason
)
SELECT split, reason, n_docs, tokens,
       CAST(n_docs * 1000000 // sum(n_docs) OVER (PARTITION BY split)
            AS BIGINT) AS share_ppm
FROM per ORDER BY split, reason"""


def quality_pareto_frontier(docs: DataFrame) -> DataFrame:
    """2-D SKYLINE (Pareto frontier) over per-document quality signals:
    the documents not dominated on (n_tokens MAXIMIZE, dup2_milli
    MINIMIZE) — no other doc is at least as long AND at least as clean
    with one strict improvement. The skyline operator: "show me the
    candidates where every tradeoff is real", here the longest-cleanest
    envelope a curation policy should sample exemplars from. Spark has no
    native skyline; the classic sort-scan algorithm maps onto aggregates
    + a tiny-frame window.

    Dominance resolves per doc with pure integer comparisons:
    q is dominated iff  min(dup2 | n_tokens > n_q) <= dup2_q
                    or  min(dup2 | n_tokens = n_q) <  dup2_q.

    Scale shape (100 TB): one groupBy collapses the corpus to the
    DISTINCT-x frame (n_tokens values — bounded by max document length,
    not corpus size); the strict-prefix running min runs on that tiny
    frame (single-task window, deliberate); per-doc dominance is then a
    broadcast join + codegen'd comparisons. The corpus is never sorted
    globally and never self-joined."""
    from datafusion_pinot_spark.operators.text import quality_signals

    sig = quality_signals(docs).select("doc_id", "n_tokens", "dup2_milli")
    per_x = sig.groupBy("n_tokens").agg(
        F.min("dup2_milli").alias("min_dup_at_x")
    )
    w = (
        Window.orderBy(F.desc("n_tokens"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    envel = per_x.select(
        "n_tokens",
        "min_dup_at_x",
        F.min("min_dup_at_x").over(w).alias("min_dup_above"),
    )
    joined = sig.join(F.broadcast(envel), "n_tokens")
    dominated = (
        F.col("min_dup_above").isNotNull()
        & (F.col("min_dup_above") <= F.col("dup2_milli"))
    ) | (F.col("min_dup_at_x") < F.col("dup2_milli"))
    return (
        joined.filter(~dominated)
        .select("doc_id", "n_tokens", "dup2_milli")
        .orderBy(F.desc("n_tokens"), F.asc("dup2_milli"), F.asc("doc_id"))
    )


def quality_pareto_frontier_oracle_sql() -> str:
    from datafusion_pinot_spark.operators.text import quality_signal_ctes

    return f"""
WITH {quality_signal_ctes("documents")},
sig AS (
  SELECT doc_id, n_tokens, dup2_milli FROM qdecision
), per_x AS (
  SELECT n_tokens, min(dup2_milli) AS min_dup_at_x
  FROM sig GROUP BY n_tokens
), envel AS (
  SELECT n_tokens, min_dup_at_x,
         min(min_dup_at_x) OVER (ORDER BY n_tokens DESC
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) AS min_dup_above
  FROM per_x
)
SELECT s.doc_id, s.n_tokens, s.dup2_milli
FROM sig s JOIN envel e USING (n_tokens)
WHERE NOT ((e.min_dup_above IS NOT NULL
            AND e.min_dup_above <= s.dup2_milli)
           OR e.min_dup_at_x < s.dup2_milli)
ORDER BY s.n_tokens DESC, s.dup2_milli ASC, s.doc_id ASC"""


def hash_sample_fidelity(docs: DataFrame, rate_pct: int = 10) -> DataFrame:
    """Debug-sample representativeness audit: the bottom-``rate_pct``%
    of documents per source BY CONTENT-HASH RANK (md5 of doc_id — the
    deterministic "take a uniform sample without a seed" idiom every
    pipeline uses for eyeballing) compared against the full population on
    mean document length. A hash sample is uniform IN EXPECTATION; this
    table measures how far the one sample you actually drew sits from
    the population it stands in for — the number to check before trusting
    a 10% debug run to predict full-corpus token counts. All exact: the
    sample is the k = n*rate/100 smallest hashes (rank-based, no float
    threshold), means in milli-chars via integer division, the gap in
    signed ppm of the population mean.

    Scale shape (100 TB): one narrow hash map + one per-source rank
    window (the same shuffle the sample itself would pay), then two
    map-side-combined rollups to |sources| rows."""
    from pyspark.sql import Window

    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source").orderBy(F.asc("h"), F.asc("doc_id"))
    ranked = docs.select(
        "source", "doc_id", "n_chars", h.alias("h")
    ).withColumn("rk", F.row_number().over(w))
    # sample membership needs n per source; join the counts back and cut
    # at rank <= n * rate / 100 (truncating — an 11-doc source samples 1)
    cuts = ranked.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("chars_pop"),
    )
    samp = (
        ranked.join(F.broadcast(cuts), "source")
        .filter(F.col("rk") * 100 <= F.col("n_docs") * rate_pct)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("k_sampled"),
            F.sum("n_chars").cast("long").alias("chars_sample"),
        )
    )
    return (
        cuts.join(samp, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("k_sampled", F.lit(0)).cast("long").alias("k_sampled"),
            F.expr(
                "CAST(CASE WHEN n_docs > 0 THEN chars_pop * 1000 div n_docs"
                " ELSE 0 END AS BIGINT)"
            ).alias("mean_chars_pop_milli"),
            F.expr(
                "CAST(CASE WHEN coalesce(k_sampled, 0) > 0"
                " THEN chars_sample * 1000 div k_sampled"
                " ELSE 0 END AS BIGINT)"
            ).alias("mean_chars_sample_milli"),
        )
        .withColumn(
            "gap_ppm",
            F.expr(
                "CAST(CASE WHEN mean_chars_pop_milli > 0 AND k_sampled > 0"
                " THEN (mean_chars_sample_milli - mean_chars_pop_milli)"
                " * 1000000 div mean_chars_pop_milli"
                " ELSE 0 END AS BIGINT)"
            ),
        )
        .orderBy("source")
    )


def hash_sample_fidelity_oracle_sql(rate_pct: int = 10) -> str:
    return f"""
WITH ranked AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rk,
         count(*) OVER (PARTITION BY source) AS n_docs
  FROM documents
), per AS (
  SELECT source,
         CAST(max(n_docs) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS chars_pop,
         CAST(sum(CASE WHEN rk * 100 <= n_docs * {rate_pct}
                  THEN 1 ELSE 0 END) AS BIGINT) AS k_sampled,
         CAST(sum(CASE WHEN rk * 100 <= n_docs * {rate_pct}
                  THEN n_chars ELSE 0 END) AS BIGINT) AS chars_sample
  FROM ranked GROUP BY source
), means AS (
  SELECT source, n_docs, k_sampled,
         CAST(CASE WHEN n_docs > 0 THEN chars_pop * 1000 // n_docs
              ELSE 0 END AS BIGINT) AS mean_chars_pop_milli,
         CAST(CASE WHEN k_sampled > 0 THEN chars_sample * 1000 // k_sampled
              ELSE 0 END AS BIGINT) AS mean_chars_sample_milli
  FROM per
)
SELECT source, n_docs, k_sampled, mean_chars_pop_milli,
       mean_chars_sample_milli,
       CAST(CASE WHEN mean_chars_pop_milli > 0 AND k_sampled > 0 THEN
            (mean_chars_sample_milli - mean_chars_pop_milli) * 1000000
            // mean_chars_pop_milli
            ELSE 0 END AS BIGINT) AS gap_ppm
FROM means ORDER BY source"""


def length_weighted_ess(docs: DataFrame) -> DataFrame:
    """Kish effective sample size of each source under LENGTH weighting —
    the audit a mixture designer runs before token-weighted sampling:
    when documents are drawn proportionally to their character count, a
    source whose mass sits in a few huge documents contributes far fewer
    *effective* documents than its row count suggests. Per source:
    ``ess = (sum w)^2 / sum w^2`` (Kish 1965, public) floored to an
    integer, its ratio to the raw count in exact ppm, and the design
    effect ``deff = n * sum w^2 / (sum w)^2`` in exact ppm — both single
    floor divisions on DECIMAL(38,0) (HUGEINT in DuckDB), exact to
    ~1e16-char sources.

    Scale shape (100 TB): ONE map-side-combined aggregation collapses
    the corpus to |sources| moment rows; everything else is per-row
    arithmetic on that bounded frame."""
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sw"),
            F.sum(F.expr("CAST(n_chars AS DECIMAL(38,0)) * n_chars")).alias(
                "sw2"
            ),
        )
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("sw").alias("total_chars"),
            F.expr(
                "CAST(CASE WHEN sw2 = 0 THEN 0 ELSE"
                " CAST(sw AS DECIMAL(38,0)) * sw div sw2 END AS BIGINT)"
            ).alias("ess"),
            F.expr(
                "CAST(CASE WHEN sw2 = 0 OR n_docs = 0 THEN 0 ELSE"
                " CAST(sw AS DECIMAL(38,0)) * sw * 1000000"
                " div (sw2 * n_docs) END AS BIGINT)"
            ).alias("ess_ratio_ppm"),
            F.expr(
                "CAST(CASE WHEN sw = 0 THEN 0 ELSE"
                " CAST(n_docs AS DECIMAL(38,0)) * sw2 * 1000000"
                " div (CAST(sw AS DECIMAL(38,0)) * sw) END AS BIGINT)"
            ).alias("deff_ppm"),
        )
        .orderBy("source")
    )


def length_weighted_ess_oracle_sql() -> str:
    return """
WITH m AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS sw,
         CAST(sum(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT) AS sw2
  FROM documents GROUP BY source
)
SELECT source, n_docs, sw AS total_chars,
       CAST(CASE WHEN sw2 = 0 THEN 0 ELSE
            CAST(sw AS HUGEINT) * sw // sw2 END AS BIGINT) AS ess,
       CAST(CASE WHEN sw2 = 0 OR n_docs = 0 THEN 0 ELSE
            CAST(sw AS HUGEINT) * sw * 1000000 // (sw2 * n_docs)
            END AS BIGINT) AS ess_ratio_ppm,
       CAST(CASE WHEN sw = 0 THEN 0 ELSE
            CAST(n_docs AS HUGEINT) * sw2 * 1000000
            // (CAST(sw AS HUGEINT) * sw) END AS BIGINT) AS deff_ppm
FROM m ORDER BY source"""


def capture_recapture_estimate(docs: DataFrame) -> DataFrame:
    """Capture-recapture (Lincoln-Petersen / Chapman, public) estimate of
    the true distinct-document count from two simulated overlapping
    crawls — the "how much of the web did my two crawls actually see?"
    audit. Individuals are distinct content fingerprints (md5 of the
    normalized text); each is independently "captured" by crawl A / B
    when the first hex digit of md5(key || salt) falls under 11/16 —
    deterministic pseudo-uniform capture both engines reproduce exactly.
    One row: both sample sizes, the overlap, the exact-integer
    Lincoln-Petersen estimate ``n1*n2 div m``, the bias-corrected
    Chapman estimate ``(n1+1)(n2+1) div (m+1) - 1``, the TRUE distinct
    count, and each estimator's absolute error in ppm of truth.

    Scale shape (100 TB): ONE distinct-shuffle on the 32-char key
    collapses the corpus; the capture flags are two md5s per key inside
    codegen and the whole audit folds to a single row — no joins at
    all."""
    keys = (
        docs.filter(F.length(F.trim(F.col("text"))) > 0)
        .select(F.md5(F.trim(F.lower(F.col("text")))).alias("k"))
        .distinct()
    )
    flagged = keys.select(
        (
            F.conv(F.substring(F.md5(F.concat(F.col("k"), F.lit("a"))), 1, 1), 16, 10)
            .cast("int")
            < 11
        ).alias("in_a"),
        (
            F.conv(F.substring(F.md5(F.concat(F.col("k"), F.lit("b"))), 1, 1), 16, 10)
            .cast("int")
            < 11
        ).alias("in_b"),
    )
    folded = flagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_true"),
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("in_b"), 1).otherwise(0)).cast("long").alias("n2"),
        F.sum(F.when(F.col("in_a") & F.col("in_b"), 1).otherwise(0))
        .cast("long")
        .alias("m"),
    )
    return folded.select(
        "n1",
        "n2",
        "m",
        "n_true",
        F.expr(
            "CAST(CASE WHEN m = 0 THEN 0 ELSE n1 * n2 DIV m END AS BIGINT)"
        ).alias("lp_estimate"),
        F.expr(
            "CAST((n1 + 1) * (n2 + 1) DIV (m + 1) - 1 AS BIGINT)"
        ).alias("chapman_estimate"),
        F.expr(
            "CAST(CASE WHEN m = 0 OR n_true = 0 THEN 0 ELSE"
            " abs(n1 * n2 DIV m - n_true) * 1000000 DIV n_true END"
            " AS BIGINT)"
        ).alias("lp_err_ppm"),
        F.expr(
            "CAST(CASE WHEN n_true = 0 THEN 0 ELSE"
            " abs((n1 + 1) * (n2 + 1) DIV (m + 1) - 1 - n_true)"
            " * 1000000 DIV n_true END AS BIGINT)"
        ).alias("chapman_err_ppm"),
    )


def capture_recapture_estimate_oracle_sql() -> str:
    def hexdig(expr: str) -> str:
        return f"(strpos('0123456789abcdef', substr({expr}, 1, 1)) - 1)"

    return f"""
WITH keys AS (
  SELECT DISTINCT md5(trim(lower(text))) AS k
  FROM documents WHERE length(trim(text)) > 0
), flagged AS (
  SELECT {hexdig("md5(k || 'a')")} < 11 AS in_a,
         {hexdig("md5(k || 'b')")} < 11 AS in_b
  FROM keys
), folded AS (
  SELECT CAST(count(*) AS BIGINT) AS n_true,
         CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN in_b THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) AS BIGINT) AS m
  FROM flagged
)
SELECT n1, n2, m, n_true,
       CAST(CASE WHEN m = 0 THEN 0 ELSE n1 * n2 // m END AS BIGINT)
         AS lp_estimate,
       CAST((n1 + 1) * (n2 + 1) // (m + 1) - 1 AS BIGINT)
         AS chapman_estimate,
       CAST(CASE WHEN m = 0 OR n_true = 0 THEN 0 ELSE
            abs(n1 * n2 // m - n_true) * 1000000 // n_true END AS BIGINT)
         AS lp_err_ppm,
       CAST(CASE WHEN n_true = 0 THEN 0 ELSE
            abs((n1 + 1) * (n2 + 1) // (m + 1) - 1 - n_true)
            * 1000000 // n_true END AS BIGINT) AS chapman_err_ppm
FROM folded"""


def quantile_normalization_table(docs: DataFrame) -> DataFrame:
    """Per-source decile calibration table for the document-length
    distribution — the lookup a mixture designer uses to quantile-map
    one source's lengths onto the corpus ("source X's median doc is 0.4x
    the global median"): for each source and decile d in 1..9, the EXACT
    order statistic of ``n_chars`` within the source, the global order
    statistic at the same decile, and their ratio in exact ppm. Order
    statistics use the repo-wide low-percentile rank
    ``(n-1)*pct div 100 + 1`` — no interpolation, so rows hash-check.

    Scale shape (100 TB): one pass duplicates each row into its source
    group and the '__ALL__' group, then ``grouped_rank`` buckets
    ``n_chars div 256`` (the bucket count is bounded by max document
    length, not corpus size) — prefix windows per (group, bucket),
    never all-to-one. The 9-decile grid joins as a broadcast; output is
    |sources| x 9 rows."""
    from datafusion_pinot_spark.operators.ranking import grouped_rank

    base = docs.select("doc_id", "source", "n_chars")
    both = base.unionAll(
        base.select("doc_id", F.lit("__ALL__").alias("source"), "n_chars")
    )
    ranked = grouped_rank(
        both,
        ["source"],
        F.expr("n_chars DIV 256"),
        ["n_chars", "doc_id"],
    )
    deciles = ranked.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("decile")
    )
    targets = (
        ranked.groupBy("source")
        .agg(F.max("total").alias("total"))
        .crossJoin(F.broadcast(deciles))
        .select(
            F.col("source").alias("tsource"),
            "decile",
            F.expr("(total - 1) * (decile * 10) DIV 100 + 1").alias("r"),
        )
    )
    at = ranked.join(
        F.broadcast(targets),
        (F.col("source") == F.col("tsource")) & (F.col("rank") == F.col("r")),
    ).select(
        F.col("tsource").alias("src"),
        "decile",
        F.col("n_chars").alias("v"),
    )
    glob = at.filter(F.col("src") == "__ALL__").select(
        F.col("decile").alias("gd"), F.col("v").alias("global_chars")
    )
    return (
        at.filter(F.col("src") != "__ALL__")
        .join(F.broadcast(glob), F.col("decile") == F.col("gd"))
        .select(
            F.col("src").alias("source"),
            "decile",
            F.col("v").cast("long").alias("source_chars"),
            F.col("global_chars").cast("long").alias("global_chars"),
            F.expr(
                "CAST(CASE WHEN global_chars = 0 THEN 0"
                " ELSE v * 1000000 DIV global_chars END AS BIGINT)"
            ).alias("ratio_ppm"),
        )
        .orderBy("source", "decile")
    )


def quantile_normalization_table_oracle_sql() -> str:
    return """
WITH base AS (
  SELECT doc_id, source, n_chars FROM documents
  UNION ALL
  SELECT doc_id, '__ALL__' AS source, n_chars FROM documents
), ranked AS (
  SELECT source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars, doc_id) AS rank,
         count(*) OVER (PARTITION BY source) AS total
  FROM base
), at AS (
  SELECT r.source AS src, d.decile, r.n_chars AS v
  FROM ranked r
  JOIN (SELECT unnest(range(1, 10)) AS decile) d
    ON r.rank = (r.total - 1) * (d.decile * 10) // 100 + 1
), gq AS (
  SELECT decile AS gd, v AS global_chars FROM at WHERE src = '__ALL__'
)
SELECT src AS source, CAST(decile AS INTEGER) AS decile,
       CAST(v AS BIGINT) AS source_chars,
       CAST(global_chars AS BIGINT) AS global_chars,
       CAST(CASE WHEN global_chars = 0 THEN 0
                 ELSE v * 1000000 // global_chars END AS BIGINT) AS ratio_ppm
FROM at JOIN gq ON at.decile = gq.gd
WHERE src <> '__ALL__'
ORDER BY source, decile"""


def fold_balance_audit(
    docs: DataFrame, n_folds: int = 5, bits: int = 48
) -> DataFrame:
    """Per-(fold, source) balance audit of a deterministic hash k-fold
    assignment — the cross-validation hygiene check next to the
    train/valid split audits (split_leakage_audit,
    temporal_split_leakage): folds are ``md5(doc_id) % n_folds`` (the
    house md5-prefix integer, bit-identical in DuckDB), and each cell
    reports its doc count, token mass, the source's expected per-fold
    doc count in milli, and the cell's Pearson chi-square contribution
    ``(O*k - n_s)^2 / (k * n_s)`` in milli — all exact integers, so a
    skewed fold (a hash bug, a doc_id pattern) shows up as an outlier
    chi2 cell that both engines agree on bit-for-bit.

    Scale shape (100 TB): one narrow map (the md5 + a token count), one
    map-side-combined shuffle on (fold, source), then a broadcast join
    of the per-source totals (|sources| rows) back onto the <=
    k*|sources| cells. No windows."""
    from datafusion_pinot_spark.functions import tokens

    nd = bits // 4
    hv = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, nd), 16, 10
    ).cast("long")
    tagged = docs.select(
        (hv % n_folds).alias("fold"),
        "source",
        F.size(tokens(F.col("text"))).cast("long").alias("n_toks"),
    )
    cells = tagged.groupBy("fold", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("n_tokens"),
    )
    per_source = cells.groupBy("source").agg(
        F.sum("n_docs").cast("long").alias("n_source")
    )
    return (
        cells.join(F.broadcast(per_source), "source")
        .select(
            F.col("fold").cast("int").alias("fold"),
            "source",
            "n_docs",
            "n_tokens",
            F.expr(f"CAST(1000 * n_source div {n_folds} AS BIGINT)").alias(
                "expected_milli"
            ),
            F.expr(
                f"CAST(1000 * CAST(n_docs * {n_folds} - n_source"
                f" AS DECIMAL(38,0))"
                f" * (n_docs * {n_folds} - n_source)"
                f" div ({n_folds} * n_source) AS BIGINT)"
            ).alias("chi2_milli"),
        )
        .orderBy("fold", "source")
    )


def fold_balance_audit_oracle_sql(n_folds: int = 5, bits: int = 48) -> str:
    nd = bits // 4
    hv = " + ".join(
        f"(CAST(strpos('0123456789abcdef', substr(hid, {i + 1}, 1)) - 1"
        f" AS BIGINT) * {16 ** (nd - 1 - i)})"
        for i in range(nd)
    )
    return f"""
WITH tagged AS (
  SELECT ({hv}) % {n_folds} AS fold, source,
         CASE WHEN length(trim(lower(text))) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(lower(text)), '\\s+'))
         END AS n_toks
  FROM (SELECT md5(CAST(doc_id AS VARCHAR)) AS hid, source, text
        FROM documents)
), cells AS (
  SELECT fold, source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_toks) AS BIGINT) AS n_tokens
  FROM tagged GROUP BY fold, source
), per_source AS (
  SELECT source, CAST(sum(n_docs) AS BIGINT) AS n_source
  FROM cells GROUP BY source
)
SELECT CAST(c.fold AS INTEGER) AS fold, c.source, c.n_docs, c.n_tokens,
       CAST(1000 * p.n_source // {n_folds} AS BIGINT) AS expected_milli,
       CAST(1000 * CAST(c.n_docs * {n_folds} - p.n_source AS HUGEINT)
            * (c.n_docs * {n_folds} - p.n_source)
            // ({n_folds} * p.n_source) AS BIGINT) AS chi2_milli
FROM cells c JOIN per_source p ON c.source = p.source
ORDER BY fold, c.source"""

"""Text-analysis operators for LLM-data-pipeline use (documents table).

All pure built-in column expressions (JVM-side, codegen'd) — no Python UDFs,
so each scales linearly with executors at 100 TB: embarrassingly parallel
per-row maps with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from datafusion_pinot_spark.functions import tokens

# Tiny per-language stopword markers for the heuristic language guesser.
# (A real pipeline would use fastText/CLD3; those aren't in this container.)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "fr": ["le", "la", "et"],
    "de": ["der", "und", "die"],
    "es": ["el", "los", "que"],
}

# Word-ish tokens OR single non-space punctuation — a BPE-ish first cut.
BPE_ISH_PATTERN = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def text_stats(docs: DataFrame) -> DataFrame:
    """Per-document quality stats: lengths, token counts, ratios, score."""
    toks = tokens(F.col("text"))
    n_chars = F.length("text")
    n_tokens = F.size(toks)
    n_alpha = F.length(F.regexp_replace("text", r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace("text", r"[^.,;:!?'\"()-]", ""))
    avg_token_len = F.when(n_tokens == 0, F.lit(0.0)).otherwise(
        F.round(
            F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)).cast("double")
            / n_tokens,
            4,
        )
    )
    alpha_ratio = F.when(n_chars == 0, F.lit(0.0)).otherwise(
        F.round(n_alpha.cast("double") / n_chars, 4)
    )
    punct_ratio = F.when(n_chars == 0, F.lit(0.0)).otherwise(
        F.round(n_punct.cast("double") / n_chars, 4)
    )
    # crude quality score: long enough, mostly alphabetic, low punct noise.
    # Computed in exact decimal arithmetic (n/50 always has ≤2 decimals, the
    # ratios are 4-decimal-rounded) so the final rounding has no float ties
    # and matches DuckDB bit-for-bit.
    lenc = (
        F.least(n_tokens, F.lit(50)).cast("decimal(6,1)") / 50
    ).cast("decimal(8,4)")
    alpha4 = alpha_ratio.cast("decimal(8,4)")
    punct4 = punct_ratio.cast("decimal(8,4)")
    quality = F.round(lenc * alpha4 * (F.lit(1).cast("decimal(8,4)") - punct4), 4).cast(
        "double"
    )
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        avg_token_len.alias("avg_token_len"),
        alpha_ratio.alias("alpha_ratio"),
        punct_ratio.alias("punct_ratio"),
        quality.alias("quality"),
    )


def text_stats_oracle_sql() -> str:
    return """
SELECT doc_id,
       length(text) AS n_chars,
       CASE WHEN length(trim(lower(text))) = 0 THEN 0
            ELSE len(regexp_split_to_array(trim(lower(text)), '\\s+')) END AS n_tokens,
       CASE WHEN length(trim(lower(text))) = 0 THEN 0.0
            ELSE round(CAST(list_sum(list_transform(regexp_split_to_array(trim(lower(text)), '\\s+'), t -> length(t))) AS DOUBLE)
                 / len(regexp_split_to_array(trim(lower(text)), '\\s+')), 4) END AS avg_token_len,
       CASE WHEN length(text) = 0 THEN 0.0
            ELSE round(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text), 4) END AS alpha_ratio,
       CASE WHEN length(text) = 0 THEN 0.0
            ELSE round(CAST(length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) AS DOUBLE) / length(text), 4) END AS punct_ratio,
       CAST(round(
         CAST(CAST(least(CASE WHEN length(trim(lower(text))) = 0 THEN 0
                              ELSE len(regexp_split_to_array(trim(lower(text)), '\\s+')) END, 50) AS DECIMAL(6,1)) / 50 AS DECIMAL(8,4))
         * CAST(CASE WHEN length(text) = 0 THEN 0.0
                     ELSE round(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text), 4) END AS DECIMAL(8,4))
         * (CAST(1 AS DECIMAL(8,4)) - CAST(CASE WHEN length(text) = 0 THEN 0.0
                       ELSE round(CAST(length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) AS DOUBLE) / length(text), 4) END AS DECIMAL(8,4))),
       4) AS DOUBLE) AS quality
FROM documents
"""


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-marker language guess (first language whose markers hit ≥ 2
    distinct words wins, priority order en,fr,de,es; else 'und')."""
    toks = tokens(F.col("text"))
    expr = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):
        markers = LANG_MARKERS[lang]
        hits = sum(
            (F.array_contains(toks, m).cast("int") for m in markers), F.lit(0)
        )
        expr = F.when(hits >= 2, F.lit(lang)).otherwise(expr)
    return docs.select("doc_id", "lang", expr.alias("lang_guess"))


def lang_id_oracle_sql() -> str:
    def hits(markers: list[str]) -> str:
        return " + ".join(
            f"CAST(list_contains(regexp_split_to_array(trim(lower(text)), '\\s+'), '{m}') AS INT)"
            for m in markers
        )

    cases = " ".join(
        f"WHEN ({hits(m)}) >= 2 THEN '{lang}'" for lang, m in LANG_MARKERS.items()
    )
    return f"SELECT doc_id, lang, CASE {cases} ELSE 'und' END AS lang_guess FROM documents"


def token_count(docs: DataFrame) -> DataFrame:
    """Whitespace tokens and BPE-ish regex tokens per document."""
    ws = F.size(tokens(F.col("text")))
    bpe = F.size(F.regexp_extract_all("text", F.lit(BPE_ISH_PATTERN), 0))
    return docs.select(
        "doc_id", ws.alias("ws_tokens"), bpe.alias("bpe_tokens")
    )


def token_count_oracle_sql() -> str:
    return f"""
SELECT doc_id,
       CASE WHEN length(trim(lower(text))) = 0 THEN 0
            ELSE len(regexp_split_to_array(trim(lower(text)), '\\s+')) END AS ws_tokens,
       len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS bpe_tokens
FROM documents
"""


def tfidf_top_terms(docs: DataFrame, k: int = 3) -> DataFrame:
    """Most distinctive terms per document: term frequency weighted by
    corpus rarity, top-k per doc.

    The score is the engine-stable rational variant ``tf * 1_000_000 div
    df`` (integer arithmetic end to end) rather than ``tf * ln(N/df)``:
    both rank identically *within a document* for terms of equal tf, and
    the integer form is bit-identical across engines, so the whole pipeline
    stays under the DuckDB hash gate — the module docstring's
    engine-stable-numerics rule applied to scoring. Scale shape: one
    explode + two map-side-combined shuffles (tf on (doc, token), df on
    token) + a broadcast-joinable df table when the vocabulary is small;
    top-k per doc is a WindowGroupLimit partial, no global sort."""
    toks = (
        docs.select("doc_id", tokens(F.col("text")).alias("toks"))
        .filter(F.size("toks") > 0)
        .select("doc_id", F.explode("toks").alias("token"))
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df, "token").select(
        "doc_id",
        "token",
        "tf",
        "df",
        F.expr("tf * 1000000L div df").alias("score_milli"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_milli"), F.desc("tf"), F.asc("token")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
        .orderBy("doc_id", F.desc("score_milli"), F.desc("tf"), "token")
    )


def tfidf_top_terms_oracle_sql(k: int = 3) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
  FROM documents WHERE length(trim(lower(text))) > 0
), tf AS (
  SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token
), df AS (
  SELECT token, count(*) AS df FROM tf GROUP BY token
), scored AS (
  SELECT doc_id, tf.token AS token, tf, df,
         (tf * 1000000) // df AS score_milli
  FROM tf JOIN df ON tf.token = df.token
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY score_milli DESC, tf DESC, token
  ) AS rn FROM scored
)
SELECT doc_id, token, tf, df, score_milli FROM ranked WHERE rn <= {k}
ORDER BY doc_id, score_milli DESC, tf DESC, token
"""


def fingerprint(docs: DataFrame) -> DataFrame:
    """Normalization fingerprint: md5 of lowercased, space-collapsed text."""
    norm = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    return docs.select("doc_id", F.md5(norm).alias("fp"))


def fingerprint_oracle_sql() -> str:
    return (
        "SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp "
        "FROM documents"
    )


def word_commonness(docs: DataFrame) -> DataFrame:
    """Corpus-relative word-commonness score — the integer-exact cousin of
    unigram-LM quality scoring (rare-word-heavy documents score low, the
    signal web-scale pipelines threshold on): per document, the sum and
    min of the CORPUS-WIDE frequencies of its words, plus its word count.
    Integer sums keep the score bit-identical across engines and row
    orders — a log-prob formulation would hang the hash gate on libm ulps.

    Scale shape: corpus word frequencies are one explode + map-side-
    combined count (shuffle keyed on the word); scoring re-joins those
    counts to the exploded words — the frequency table is Zipf-small
    relative to the corpus and broadcastable at need — and re-aggregates
    per doc. Two shuffles total, both on bounded key spaces.
    """
    words = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("w")
    )
    freq = words.groupBy("w").agg(F.count(F.lit(1)).alias("wf"))
    return (
        words.join(freq, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("wf").alias("sum_freq"),
            F.min("wf").alias("min_freq"),
        )
        .orderBy("doc_id")
    )


def word_commonness_oracle_sql() -> str:
    return """
WITH words AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
  FROM documents WHERE length(trim(text)) > 0
), freq AS (
  SELECT w, count(*) AS wf FROM words GROUP BY w
)
SELECT doc_id, count(*) AS n_words,
       CAST(sum(wf) AS BIGINT) AS sum_freq,
       CAST(min(wf) AS BIGINT) AS min_freq
FROM words JOIN freq USING (w)
GROUP BY doc_id ORDER BY doc_id"""

def ngram_repetition_stats(docs: DataFrame, ns: tuple[int, ...] = (2, 3)) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1) per document
    and n-gram size: the duplicate n-gram fraction (1 - distinct/total) and
    the fraction of characters covered by occurrences of the single most
    frequent n-gram. Both in exact integer millionths so the hash gate
    never sees float rounding; the top gram breaks count ties by the
    lexicographically largest gram (deterministic in both engines).

    Long output, one row per (doc, n): ``doc_id, n, total_ngrams,
    distinct_ngrams, dup_milli, top_char_milli``.

    Scale design (100 TB): gram enumeration is a narrow per-row map; the
    only shuffle keys on (doc_id, gram) for the count — per-doc
    cardinality bounded by doc length, so no skew beyond document size;
    the per-doc rollup rides the same hash partitioning.
    """
    from pyspark.sql import Window

    per_n = []
    for n in ns:
        words = F.split(F.col("text"), " ")
        starts = F.when(
            F.size(words) >= n, F.sequence(F.lit(0), F.size(words) - n)
        ).otherwise(F.array().cast("array<int>"))
        grams = F.transform(
            starts, lambda i: F.array_join(F.slice(words, i + 1, n), " ")
        )
        per_n.append(
            docs.select(
                "doc_id",
                F.length("text").cast("long").alias("n_chars"),
                F.lit(n).cast("int").alias("n"),
                F.explode(grams).alias("gram"),
            )
        )
    exploded = per_n[0]
    for other in per_n[1:]:
        exploded = exploded.unionByName(other)
    counts = exploded.groupBy("doc_id", "n_chars", "n", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    rn = F.row_number().over(
        Window.partitionBy("doc_id", "n").orderBy(
            F.desc("cnt"), F.desc("gram")
        )
    )
    stats = (
        counts.withColumn("rn", rn)
        .groupBy("doc_id", "n_chars", "n")
        .agg(
            F.sum("cnt").cast("long").alias("total_ngrams"),
            F.count(F.lit(1)).alias("distinct_ngrams"),
            F.max(F.when(F.col("rn") == 1, F.col("cnt"))).cast("long").alias("top_cnt"),
            F.max(F.when(F.col("rn") == 1, F.length("gram"))).cast("long").alias("top_len"),
        )
    )
    return stats.select(
        "doc_id",
        "n",
        "total_ngrams",
        "distinct_ngrams",
        F.expr(
            "CASE WHEN total_ngrams = 0 THEN 0L"
            " ELSE (total_ngrams - distinct_ngrams) * 1000000L div total_ngrams END"
        ).alias("dup_milli"),
        F.expr(
            "CASE WHEN n_chars = 0 THEN 0L"
            " ELSE top_cnt * top_len * 1000000L div n_chars END"
        ).alias("top_char_milli"),
    ).orderBy("doc_id", "n")


def ngram_repetition_stats_oracle_sql(ns: tuple[int, ...] = (2, 3)) -> str:
    arms = "\nUNION ALL\n".join(
        f"""
  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, {n} AS n,
         array_to_string(w[i+1:i+{n}], ' ') AS gram
  FROM (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
       LATERAL unnest(range(0, greatest(len(w) - {n} + 1, 0))) AS t(i)"""
        for n in ns
    )
    return f"""
WITH exploded AS ({arms}),
counts AS (
  SELECT doc_id, n_chars, n, gram, count(*) AS cnt
  FROM exploded GROUP BY ALL),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id, n
                               ORDER BY cnt DESC, gram DESC) AS rn
  FROM counts),
stats AS (
  SELECT doc_id, n_chars, n,
         CAST(sum(cnt) AS BIGINT) AS total_ngrams,
         count(*) AS distinct_ngrams,
         CAST(max(CASE WHEN rn = 1 THEN cnt END) AS BIGINT) AS top_cnt,
         CAST(max(CASE WHEN rn = 1 THEN length(gram) END) AS BIGINT) AS top_len
  FROM ranked GROUP BY ALL)
SELECT doc_id, n, total_ngrams, distinct_ngrams,
       CAST(CASE WHEN total_ngrams = 0 THEN 0
            ELSE (total_ngrams - distinct_ngrams) * 1000000 // total_ngrams
            END AS BIGINT) AS dup_milli,
       CAST(CASE WHEN n_chars = 0 THEN 0
            ELSE top_cnt * top_len * 1000000 // n_chars END AS BIGINT)
         AS top_char_milli
FROM stats ORDER BY doc_id, n
"""

# FineWeb/Gopher-style keep/drop thresholds (public heuristics): documents
# outside these bounds are dropped with a reason code, evaluated in fixed
# order so the recorded reason is deterministic.
QUALITY_RULES = (
    ("too_short", "n_tokens < 15"),
    ("too_long", "n_tokens > 10000"),
    ("mean_word_len", "avg_len_milli < 2000 OR avg_len_milli > 12000"),
    ("dup_2gram", "dup2_milli > 300000"),
    ("top_token", "top_tok_milli > 200000"),
)


def quality_signals(docs: DataFrame) -> DataFrame:
    """Per-document quality signals (doc_id, n_tokens, avg_len_milli,
    top_tok_milli, dup2_milli), all exact integer millionths — the shared
    substrate of :func:`quality_filter` and the r13 config-ablation audit
    (curation.py::quality_config_ablation). Oracle twin: the ``qjoined``
    CTE inside :func:`quality_signal_ctes`.

    Scale: one (doc_id, gram/token) shuffle pair bounded by document
    length; everything else is a codegen'd narrow map."""
    words = F.split(F.col("text"), " ")
    n_tokens = F.size(words).cast("long")
    avg_len_milli = F.expr(
        "CASE WHEN size(split(text, ' ')) = 0 THEN 0L ELSE "
        "aggregate(split(text, ' '), 0L, (a, w) -> a + length(w)) * 1000L"
        " div size(split(text, ' ')) END"
    )
    toks = docs.select(
        "doc_id", F.explode(words).alias("tok")
    )
    tok_stats = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).alias("tf")
    )
    per_doc_tok = tok_stats.groupBy("doc_id").agg(
        F.expr("max(tf) * 1000000L div sum(tf)").alias("top_tok_milli")
    )
    grams2 = F.when(
        F.size(words) >= 2, F.sequence(F.lit(0), F.size(words) - 2)
    ).otherwise(F.array().cast("array<int>"))
    g = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                grams2, lambda i: F.array_join(F.slice(words, i + 1, 2), " ")
            )
        ).alias("gram"),
    )
    per_doc_g = (
        g.groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.expr(
                "(sum(c) - count(*)) * 1000000L div sum(c)"
            ).alias("dup2_milli")
        )
    )
    base = docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        avg_len_milli.alias("avg_len_milli"),
    )
    joined = (
        base.join(per_doc_tok, "doc_id", "left")
        .join(per_doc_g, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "avg_len_milli",
            F.coalesce("top_tok_milli", F.lit(0).cast("long")).alias(
                "top_tok_milli"
            ),
            F.coalesce("dup2_milli", F.lit(0).cast("long")).alias("dup2_milli"),
        )
    )
    return joined


def quality_filter(docs: DataFrame) -> DataFrame:
    """Composite keep/drop quality gate — the FineWeb-style filter chain
    over purely engine-side signals (token count, mean token length,
    duplicate-2-gram fraction, dominant-token share), all in exact integer
    millionths. Emits every doc with ``keep`` and the FIRST failing rule
    as ``reason`` ('' when kept) — the audit trail a curation run needs.

    Scale: signal computation is one (doc_id, gram/token) shuffle pair
    bounded by document length; the rule evaluation is a codegen'd CASE
    chain. Filtered corpora at 100 TB keep the same shape — no new
    shuffles over the survivors.
    """
    joined = quality_signals(docs)
    reason = F.lit("")
    for name, cond in reversed(QUALITY_RULES):
        reason = F.when(F.expr(cond), F.lit(name)).otherwise(reason)
    return joined.select(
        "doc_id",
        "n_tokens",
        "avg_len_milli",
        "dup2_milli",
        "top_tok_milli",
        reason.alias("reason"),
        (reason == "").alias("keep"),
    ).orderBy("doc_id")


def quality_signal_ctes(rel: str = "documents") -> str:
    """The quality-gate CTE chain (words -> signals -> per-doc keep/reason)
    over any relation with (doc_id, text) — shared by the standalone
    quality_filter oracle and composed pipelines (r12:
    training_mixture_report runs it over the dedup-survivor CTE). Ends
    with CTE ``qdecision(doc_id, n_tokens, avg_len_milli, dup2_milli,
    top_tok_milli, reason, keep)``."""
    conds = " ".join(
        f"WHEN {cond} THEN '{name}'"
        for name, cond in QUALITY_RULES
    )
    return f"""words AS (
  SELECT doc_id, string_split(text, ' ') AS w, text FROM {rel}),
base AS (
  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
         CAST(CASE WHEN len(w) = 0 THEN 0 ELSE
           list_sum(list_transform(w, x -> length(x))) * 1000 // len(w)
         END AS BIGINT) AS avg_len_milli
  FROM words),
toks AS (
  SELECT doc_id, unnest(w) AS tok FROM words),
tok_stats AS (
  SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
per_tok AS (
  SELECT doc_id, CAST(max(tf) * 1000000 // sum(tf) AS BIGINT)
           AS top_tok_milli
  FROM tok_stats GROUP BY doc_id),
g AS (
  SELECT doc_id, array_to_string(w[i+1:i+2], ' ') AS gram
  FROM words, LATERAL unnest(range(0, greatest(len(w) - 1, 0))) AS t(i)),
per_g AS (
  SELECT doc_id,
         CAST((sum(c) - count(*)) * 1000000 // sum(c) AS BIGINT)
           AS dup2_milli
  FROM (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram)
  GROUP BY doc_id),
qjoined AS (
  SELECT b.doc_id, b.n_tokens, b.avg_len_milli,
         CAST(coalesce(p.dup2_milli, 0) AS BIGINT) AS dup2_milli,
         CAST(coalesce(t.top_tok_milli, 0) AS BIGINT) AS top_tok_milli
  FROM base b
  LEFT JOIN per_tok t USING (doc_id) LEFT JOIN per_g p USING (doc_id)),
qdecision AS (
  SELECT doc_id, n_tokens, avg_len_milli, dup2_milli, top_tok_milli,
         CASE {conds} ELSE '' END AS reason,
         (CASE {conds} ELSE '' END) = '' AS keep
  FROM qjoined)"""


def quality_filter_oracle_sql() -> str:
    return f"""
WITH {quality_signal_ctes("documents")}
SELECT doc_id, n_tokens, avg_len_milli, dup2_milli, top_tok_milli,
       reason, keep
FROM qdecision ORDER BY doc_id
"""


def bpe_pair_counts(docs: DataFrame, k: int = 20) -> DataFrame:
    """Top-``k`` adjacent token pairs by corpus frequency — the statistic
    the first BPE merge iteration maximizes (tokenizer training's inner
    loop). Pure narrow map (token split + adjacent zip) into one count
    shuffle; at 100 TB this is the canonical map-side-combine shape, and
    the top-k is a TakeOrdered over the pair counts, never a global sort.
    Ties break lexicographically so the cut is deterministic."""
    toks = docs.select(tokens(F.col("text")).alias("w")).filter(
        F.size("w") >= 2
    )
    pairs = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 1),"
                " i -> struct(element_at(w, i) AS l,"
                "             element_at(w, i + 1) AS r))"
            )
        ).alias("p")
    )
    return (
        pairs.groupBy(
            F.col("p.l").alias("l"), F.col("p.r").alias("r")
        )
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
        .limit(k)
    )


def bpe_pair_counts_oracle_sql(k: int = 20) -> str:
    return f"""
WITH t AS (
  SELECT regexp_split_to_array(trim(lower(text)), '\\s+') AS w FROM documents
), p AS (
  SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
  FROM t WHERE len(w) >= 2
)
SELECT w[i] AS l, w[i+1] AS r, count(*) AS cnt
FROM p GROUP BY w[i], w[i+1]
ORDER BY cnt DESC, l ASC, r ASC LIMIT {k}
"""


def winnow_fingerprints(
    docs: DataFrame, k: int = 4, w: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
    SIGMOD'03, the MOSS algorithm): hash every ``k``-token gram, slide a
    window of ``w`` consecutive gram hashes over each document, and keep
    the minimum hash of each window. The selected set is the document's
    fingerprint: any shared substring of at least ``k + w - 1`` tokens
    between two documents is GUARANTEED to contribute at least one common
    fingerprint, at ~1/w the storage of all gram hashes — the standard
    boilerplate/plagiarism/near-dup fingerprint for a 100 TB corpus.

    Cross-engine determinism: gram hash = first 12 hex chars of md5
    (lowercase-hex strings order identically in Spark and DuckDB, so the
    per-window lexicographic min is bit-identical — the same md5-family
    trick as the simhash/minhash oracles). Window starts are restricted
    to FULL windows (the classic definition), i.e. gram positions
    ``pos <= n_grams - w``.

    Scale shape: gram explode is a narrow map; the window min runs
    per-document (``partitionBy(doc_id)`` — bounded by document length,
    never corpus-sized); the DISTINCT collapses per doc. One hash shuffle
    on doc_id total.

    Returns (doc_id, fp) — one row per distinct fingerprint per doc.
    """
    from pyspark.sql import Window

    toks = docs.select("doc_id", tokens(F.col("text")).alias("t")).filter(
        F.size("t") >= k + w - 1
    )
    grams = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, size(t) - {k - 1}),"
                f" i -> concat_ws(' ', slice(t, i, {k})))"
            )
        ).alias("pos", "g"),
    )
    hashed = grams.select(
        "doc_id", "pos", F.substring(F.md5("g"), 1, 12).alias("h")
    )
    dwin = Window.partitionBy("doc_id")
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    return (
        hashed.withColumn("ng", F.count("*").over(dwin))
        .withColumn("mh", F.min("h").over(win))
        .filter(F.col("pos") <= F.col("ng") - w)  # full windows only
        .select("doc_id", F.col("mh").alias("fp"))
        .distinct()
    )


def winnow_common_fingerprints(
    docs: DataFrame, k: int = 4, w: int = 4, top: int = 20
) -> DataFrame:
    """Top shared winnowing fingerprints across the corpus — the
    boilerplate detector: a fingerprint appearing in many documents marks
    a repeated k+w-1-token span (header, license blurb, template). Ties
    break on the fingerprint hex so the cut is deterministic."""
    fps = winnow_fingerprints(docs, k, w)
    return (
        fps.groupBy("fp")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") > 1)
        .orderBy(F.desc("n_docs"), F.asc("fp"))
        .limit(top)
    )


def winnow_common_fingerprints_oracle_sql(
    k: int = 4, w: int = 4, top: int = 20
) -> str:
    gram = " || ' ' || ".join(f"t[i+{j}]" for j in range(k))
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
  FROM documents
  WHERE len(regexp_split_to_array(trim(lower(text)), '\\s+')) >= {k + w - 1}
), grams AS (
  SELECT doc_id, i, substr(md5({gram}), 1, 12) AS h,
         len(t) - {k - 1} AS ng
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - {k - 1})) AS i
        FROM toks)
), wins AS (
  SELECT doc_id,
         min(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS mh,
         i, ng
  FROM grams
), fps AS (
  SELECT DISTINCT doc_id, mh AS fp FROM wins WHERE i <= ng - {w - 1}
)
SELECT fp, count(*) AS n_docs
FROM fps GROUP BY fp HAVING count(*) > 1
ORDER BY n_docs DESC, fp ASC LIMIT {top}
"""


def bigram_lm_score(docs: DataFrame) -> DataFrame:
    """Per-document fluency score from a bigram language model trained on
    the corpus itself — the LM-filtering idea of CCNet/KenLM pipelines
    (public), made integer-exact so it hash-checks across engines: each
    bigram occurrence scores its conditional probability in ppm
    (``count(l,r) * 1e6 div count(l-as-left)``, floor division), and a
    document's score is the floor mean over its bigram occurrences.
    Repetitive or formulaic documents (high-probability transitions) score
    high; incoherent token soup scores low — the cheap in-corpus proxy for
    "does a language model find this text predictable".

    Scale shape: one corpus pass builds the bigram table (map-side
    combined count shuffle); the left-token totals are a second agg over
    the same exploded stream; scoring is one shuffle join of the corpus
    bigram stream against the LM table on the bigram key, then a per-doc
    agg. Documents with fewer than two tokens are excluded (no bigrams to
    score). The LM table is corpus-vocabulary-sized — it stays
    distributed; nothing collects to the driver."""
    toks = docs.select("doc_id", tokens(F.col("text")).alias("w")).filter(
        F.size("w") >= 2
    )
    bg = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 1),"
                " i -> struct(element_at(w, i) AS l,"
                "             element_at(w, i + 1) AS r))"
            )
        ).alias("p"),
    ).select("doc_id", "p.l", "p.r")
    lm = bg.groupBy("l", "r").agg(F.count("*").alias("c_lr"))
    left = bg.groupBy("l").agg(F.count("*").alias("c_l"))
    lm2 = lm.join(left, "l")
    return (
        bg.join(lm2, ["l", "r"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.expr(
                "CAST(sum(c_lr * 1000000 DIV c_l) DIV count(*) AS BIGINT)"
            ).alias("lm_score_ppm"),
        )
        .orderBy("doc_id")
    )


def bigram_lm_score_oracle_sql() -> str:
    return """
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                     x -> x <> '') AS w
  FROM documents
), bg AS (
  SELECT doc_id, w[i] AS l, w[i+1] AS r
  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w)-1)) AS i
        FROM t WHERE len(w) >= 2)
), lm AS (
  SELECT l, r, count(*) AS c_lr FROM bg GROUP BY l, r
), lft AS (
  SELECT l, count(*) AS c_l FROM bg GROUP BY l
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(c_lr * 1000000 // c_l) // count(*) AS BIGINT)
         AS lm_score_ppm
FROM bg JOIN lm USING (l, r) JOIN lft USING (l)
GROUP BY doc_id ORDER BY doc_id
"""


# -- hashed linear classifier inference (fastText-style quality gate) -------

CLF_BUCKETS = 4096  # feature-hash dimensionality
CLF_WEIGHT_RANGE = 2001  # weights span [-1000, 1000] milli-units


def classifier_weights(spark) -> DataFrame:
    """The model table for :func:`hashed_classifier_score`: one weight per
    feature-hash bucket, in integer milli-units. Weights here are derived
    deterministically from ``md5(bucket)`` so the whole inference path is
    oracle-checkable end to end; a production pipeline would load a trained
    model's weights as exactly this shape (bucket BIGINT, weight BIGINT)
    and everything downstream is unchanged."""
    return spark.range(CLF_BUCKETS).select(
        F.col("id").alias("bucket"),
        (
            F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 4), 16, 10)
            .cast("long")
            % CLF_WEIGHT_RANGE
            - (CLF_WEIGHT_RANGE - 1) // 2
        ).alias("weight"),
    )


def hashed_classifier_score(docs: DataFrame) -> DataFrame:
    """fastText-style linear text classifier *inference* over hashed
    bag-of-words features — the model-based quality gate every web-scale
    curation pipeline runs (CCNet / DCLM-style fasttext filters, public).
    Each token hashes into one of ``CLF_BUCKETS`` buckets (first 4 hex
    digits of md5, mod buckets); the document logit is the integer sum of
    the bucket weights over token *occurrences*, normalized per token in
    milli-units (floor division), and the keep/drop label thresholds the
    normalized score at 0.

    Scale shape: the weights table is model-sized (``CLF_BUCKETS`` rows) —
    broadcast to every executor, so scoring is a narrow per-token map
    (md5 + conv stay in codegen) plus ONE doc-keyed partial-aggregated
    shuffle. No corpus-sized state anywhere; 100 TB of text streams
    through at scan speed. Zero-token documents are excluded (no features
    to score)."""
    w = F.broadcast(classifier_weights(docs.sparkSession))
    toks = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    ).select(
        "doc_id",
        (
            F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("long")
            % CLF_BUCKETS
        ).alias("bucket"),
    )
    return (
        toks.join(w, "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("weight").cast("long").alias("logit_milli"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "logit_milli",
            F.expr(
                "CAST(CASE WHEN logit_milli >= 0 THEN logit_milli DIV n_tokens"
                " ELSE -((-logit_milli) DIV n_tokens) END AS BIGINT)"
            ).alias("score_milli"),
            F.when(F.col("logit_milli") >= 0, F.lit("keep"))
            .otherwise(F.lit("drop"))
            .alias("label"),
        )
        .orderBy("doc_id")
    )


def hashed_classifier_score_oracle_sql() -> str:
    def hex4(h: str) -> str:
        return " + ".join(
            f"(CAST(strpos('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1"
            f" AS BIGINT) * {16 ** (3 - i)})"
            for i in range(4)
        )

    half = (CLF_WEIGHT_RANGE - 1) // 2
    return f"""
WITH wtab AS (
  SELECT b AS bucket,
         ({hex4("md5(CAST(b AS VARCHAR))")}) % {CLF_WEIGHT_RANGE} - {half}
           AS weight
  FROM (SELECT unnest(generate_series(0, {CLF_BUCKETS - 1})) AS b)
), toks AS (
  SELECT doc_id,
         unnest(list_filter(
           regexp_split_to_array(trim(lower(text)), '\\s+'), x -> x <> ''))
           AS tok
  FROM documents WHERE length(trim(text)) > 0
), feats AS (
  SELECT doc_id, ({hex4("md5(tok)")}) % {CLF_BUCKETS} AS bucket FROM toks
), scored AS (
  SELECT doc_id, count(*) AS n_tokens,
         CAST(sum(weight) AS BIGINT) AS logit_milli
  FROM feats JOIN wtab USING (bucket) GROUP BY doc_id
)
SELECT doc_id, n_tokens, logit_milli,
       CAST(CASE WHEN logit_milli >= 0 THEN logit_milli // n_tokens
                 ELSE -((-logit_milli) // n_tokens) END AS BIGINT)
         AS score_milli,
       CASE WHEN logit_milli >= 0 THEN 'keep' ELSE 'drop' END AS label
FROM scored ORDER BY doc_id"""


# -- cross-source vocabulary overlap ----------------------------------------


def source_vocab_jaccard(docs: DataFrame) -> DataFrame:
    """Pairwise Jaccard similarity between the token *vocabularies* of each
    document source, in exact ppm — the corpus-composition diagnostic for
    mixture design (how much does crawl A's vocabulary overlap crawl B's?).

    Scale shape: the per-source vocabulary is ONE distinct shuffle keyed on
    (source, token) — Zipf-bounded, vastly smaller than the corpus; the
    pairwise intersection is a self-equi-join of that vocabulary table on
    the token (never on the corpus), with sources ordered a < b so each
    pair counts once. With S sources the output is S*(S-1)/2 rows — the
    join's key space is the shared vocabulary, not all token pairs."""
    vocab = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("w")
    ).distinct()
    sizes = vocab.groupBy("source").agg(F.count(F.lit(1)).alias("n_vocab"))
    a, b = vocab.alias("a"), vocab.alias("b")
    inter = (
        a.join(b, (F.col("a.w") == F.col("b.w")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = F.broadcast(sizes.select(F.col("source").alias("source_a"), F.col("n_vocab").alias("vocab_a")))
    sb = F.broadcast(sizes.select(F.col("source").alias("source_b"), F.col("n_vocab").alias("vocab_b")))
    return (
        inter.join(sa, "source_a")
        .join(sb, "source_b")
        .select(
            "source_a",
            "source_b",
            "vocab_a",
            "vocab_b",
            "n_inter",
            F.expr(
                "CAST(n_inter * 1000000 DIV (vocab_a + vocab_b - n_inter)"
                " AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
        .orderBy("source_a", "source_b")
    )


def source_vocab_jaccard_oracle_sql() -> str:
    return """
WITH vocab AS (
  SELECT DISTINCT source,
         unnest(list_filter(
           regexp_split_to_array(trim(lower(text)), '\\s+'), x -> x <> ''))
           AS w
  FROM documents WHERE length(trim(text)) > 0
), sizes AS (
  SELECT source, count(*) AS n_vocab FROM vocab GROUP BY source
), inter AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_inter
  FROM vocab a JOIN vocab b ON a.w = b.w AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT source_a, source_b,
       sa.n_vocab AS vocab_a, sb.n_vocab AS vocab_b, n_inter,
       CAST(n_inter * 1000000 // (sa.n_vocab + sb.n_vocab - n_inter)
            AS BIGINT) AS jaccard_ppm
FROM inter
JOIN sizes sa ON sa.source = inter.source_a
JOIN sizes sb ON sb.source = inter.source_b
ORDER BY source_a, source_b"""


def token_lift_pairs(
    docs: DataFrame,
    vocab_top: int = 40,
    min_pair_docs: int = 3,
    k: int = 20,
) -> DataFrame:
    """Top-``k`` token pairs by co-occurrence LIFT over the corpus —
    association mining for vocabulary/topic diagnostics: lift is PMI's
    ratio without the log, ``P(x,y)/(P(x)P(y)) = n_xy·N / (n_x·n_y)``,
    kept as an exact integer in ppm so rows hash-match across engines
    (log-PMI is transcendental and engine-dependent). Document-level
    co-occurrence on DISTINCT per-doc tokens; pairs below
    ``min_pair_docs`` shared docs are noise and dropped.

    Scale guard: the pair space is restricted to the ``vocab_top`` most
    document-frequent tokens (ties: token asc), broadcast to the doc-token
    table — the self-join on doc_id then carries at most ``vocab_top``
    rows per document, so the pair explosion is bounded by
    docs × C(vocab_top, 2) / docs, never vocabulary². One distinct
    shuffle builds the doc-token set; everything after runs on bounded
    frames. Top-``k`` by (lift desc, token_a, token_b)."""
    from datafusion_pinot_spark.functions import tokens

    dt = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
        .distinct()
    )
    n_total = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    topv = (
        dt.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
        .orderBy(F.desc("n_w"), F.asc("w"))
        .limit(vocab_top)
    )
    dtt = dt.join(F.broadcast(topv), "w")
    a = dtt.select(
        "doc_id", F.col("w").alias("wa"), F.col("n_w").alias("n_a")
    )
    b = dtt.select(
        "doc_id", F.col("w").alias("wb"), F.col("n_w").alias("n_b")
    )
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("wa") < F.col("wb"))
        .groupBy("wa", "wb")
        .agg(
            F.count(F.lit(1)).alias("n_xy"),
            F.any_value("n_a").alias("n_a"),
            F.any_value("n_b").alias("n_b"),
        )
        .filter(F.col("n_xy") >= min_pair_docs)
    )
    return (
        pairs.join(F.broadcast(n_total))
        .select(
            F.col("wa").alias("token_a"),
            F.col("wb").alias("token_b"),
            "n_xy",
            F.col("n_a").alias("n_x"),
            F.col("n_b").alias("n_y"),
            F.expr(
                "CAST(n_xy * n_docs * 1000000 DIV (n_a * n_b) AS BIGINT)"
            ).alias("lift_ppm"),
        )
        .orderBy(F.desc("lift_ppm"), F.asc("token_a"), F.asc("token_b"))
        .limit(k)
    )


def token_lift_pairs_oracle_sql(
    vocab_top: int = 40, min_pair_docs: int = 3, k: int = 20
) -> str:
    return f"""
WITH dt AS (
  SELECT DISTINCT doc_id,
         unnest(list_filter(
           regexp_split_to_array(trim(lower(text)), '\\s+'), x -> x <> ''))
           AS w
  FROM documents WHERE length(trim(text)) > 0
), tot AS (
  SELECT count(*) AS n_docs FROM documents
), topv AS (
  SELECT w, count(*) AS n_w FROM dt GROUP BY w
  ORDER BY n_w DESC, w ASC LIMIT {vocab_top}
), dtt AS (
  SELECT dt.doc_id, dt.w, topv.n_w FROM dt JOIN topv USING (w)
), pairs AS (
  SELECT a.w AS wa, b.w AS wb, count(*) AS n_xy,
         any_value(a.n_w) AS n_a, any_value(b.n_w) AS n_b
  FROM dtt a JOIN dtt b ON a.doc_id = b.doc_id AND a.w < b.w
  GROUP BY a.w, b.w
  HAVING count(*) >= {min_pair_docs}
)
SELECT wa AS token_a, wb AS token_b,
       CAST(n_xy AS BIGINT) AS n_xy,
       CAST(n_a AS BIGINT) AS n_x, CAST(n_b AS BIGINT) AS n_y,
       CAST(n_xy * (SELECT n_docs FROM tot) * 1000000
            // (n_a * n_b) AS BIGINT) AS lift_ppm
FROM pairs
ORDER BY lift_ppm DESC, token_a ASC, token_b ASC LIMIT {k}
"""


def vocab_growth_curve(docs: DataFrame, bucket_docs: int = 100) -> DataFrame:
    """Heaps'-law vocabulary growth curve: cumulative distinct-token count
    vs cumulative token count over the corpus in ingestion order
    (``doc_id``), bucketed every ``bucket_docs`` documents — the
    diagnostic that says whether a crawl is still contributing new
    vocabulary or has gone redundant (sub-linear growth flattening is the
    "diminishing returns" signal mixture designers act on).

    Exact integers throughout: a token's first sighting is ``min(doc_id)``
    (one map-side-combined agg over the doc-token distinct set — no
    order-dependent scan), so new-type counts per bucket are
    deterministic; the cumulative sums run over the tiny bucket frame.

    Scale shape: one distinct shuffle on (token) with a min combiner, one
    map-side-combined occurrence count per bucket, then windows over
    N/bucket_docs rows. The corpus never sorts globally."""
    from datafusion_pinot_spark.functions import tokens

    toks = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("w")
    )
    bucket = lambda c: F.expr(f"CAST(({c} - 1) DIV {bucket_docs} AS BIGINT)")
    first = (
        toks.groupBy("w")
        .agg(F.min("doc_id").alias("first_doc"))
        .select(bucket("first_doc").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("new_types"))
    )
    occ = (
        toks.select(bucket("doc_id").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_tokens"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        occ.join(first, "bucket", "left")
        .withColumn("new_types", F.coalesce("new_types", F.lit(0)))
        .select(
            "bucket",
            "n_tokens",
            "new_types",
            F.sum("n_tokens").over(w).cast("long").alias("cum_tokens"),
            F.sum("new_types").over(w).cast("long").alias("cum_types"),
        )
        .orderBy("bucket")
    )


def vocab_growth_curve_oracle_sql(bucket_docs: int = 100) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(
           regexp_split_to_array(trim(lower(text)), '\\s+'), x -> x <> ''))
           AS w
  FROM documents WHERE length(trim(text)) > 0
), first AS (
  SELECT CAST((first_doc - 1) // {bucket_docs} AS BIGINT) AS bucket,
         count(*) AS new_types
  FROM (SELECT w, min(doc_id) AS first_doc FROM toks GROUP BY w) f
  GROUP BY 1
), occ AS (
  SELECT CAST((doc_id - 1) // {bucket_docs} AS BIGINT) AS bucket,
         count(*) AS n_tokens
  FROM toks GROUP BY 1
)
SELECT o.bucket, CAST(o.n_tokens AS BIGINT) AS n_tokens,
       CAST(coalesce(f.new_types, 0) AS BIGINT) AS new_types,
       CAST(sum(o.n_tokens) OVER (ORDER BY o.bucket) AS BIGINT)
         AS cum_tokens,
       CAST(sum(coalesce(f.new_types, 0)) OVER (ORDER BY o.bucket)
            AS BIGINT) AS cum_types
FROM occ o LEFT JOIN first f ON o.bucket = f.bucket
ORDER BY o.bucket"""


def word_runs_topk(spark, docs: DataFrame, k: int = 20) -> DataFrame:
    """Consecutive-word run detection via a Python UDTF + SQL LATERAL —
    the table-function surface of §2.10 (the catalog's UDF story is
    otherwise Arrow-batched pandas_udf / mapInPandas / applyInPandas;
    this completes the triple). The UDTF is a per-row sequential scanner
    emitting one row per maximal run of a repeated word (run_len ≥ 2) —
    the stutter/repetition shapes a cleaning pass wants positions for,
    not just counts.

    Honest cost note: Python UDTFs evaluate row-at-a-time (Arrow
    transfer when spark.sql.execution.pythonUDTF.arrow.enabled is on,
    which this operator sets); at corpus scale the SAME scan belongs in
    a mapInPandas kernel like the media framers — this operator exists
    to prove the UDTF + LATERAL surface works end to end, hash-gated
    against a gaps-and-islands SQL replay. Top-``k`` runs by (run_len
    desc, doc_id, start_pos)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string, run_len int, start_pos int")
    class WordRuns:
        def eval(self, text: str):
            if not text:
                return
            words = text.strip().lower().split()
            i = 0
            n = len(words)
            while i < n:
                j = i
                while j + 1 < n and words[j + 1] == words[i]:
                    j += 1
                if j > i:
                    yield (words[i], j - i + 1, i + 1)
                i = j + 1

    try:
        spark.conf.set(
            "spark.sql.execution.pythonUDTF.arrow.enabled", "true"
        )
    except Exception:
        pass
    spark.udtf.register("word_runs", WordRuns)
    docs.createOrReplaceTempView("__docs_runs")
    return spark.sql(
        f"""
        SELECT d.doc_id, r.word, r.run_len, r.start_pos
        FROM __docs_runs d, LATERAL word_runs(d.text) r
        ORDER BY r.run_len DESC, d.doc_id ASC, r.start_pos ASC
        LIMIT {k}
        """
    )


def word_runs_topk_oracle_sql(k: int = 20) -> str:
    """The same maximal runs via gaps-and-islands: island id = position −
    dense rank of the position within (doc, word)."""
    return f"""
WITH words AS (
  SELECT doc_id,
         unnest(list_filter(
           regexp_split_to_array(trim(lower(text)), '\\s+'), x -> x <> ''))
           AS w,
         generate_subscripts(list_filter(
           regexp_split_to_array(trim(lower(text)), '\\s+'), x -> x <> ''), 1)
           AS pos
  FROM documents WHERE length(trim(text)) > 0
), islands AS (
  SELECT doc_id, w, pos,
         pos - row_number() OVER (PARTITION BY doc_id, w ORDER BY pos)
           AS isl
  FROM words
), runs AS (
  SELECT doc_id, w AS word, CAST(count(*) AS INT) AS run_len,
         CAST(min(pos) AS INT) AS start_pos
  FROM islands GROUP BY doc_id, w, isl
  HAVING count(*) >= 2
)
SELECT doc_id, word, run_len, start_pos
FROM runs ORDER BY run_len DESC, doc_id ASC, start_pos ASC LIMIT {k}
"""


def lm_quality_gate(docs: DataFrame) -> DataFrame:
    """LM-score quality gate (the CCNet filtering step composed end to
    end): score every document with the in-corpus bigram LM
    (:func:`bigram_lm_score`), cut at the corpus MEDIAN score (exact
    rank median over the (score, doc_id) total order — no float
    percentile), and report per source how many documents each side of
    the gate holds plus the per-source mean score in ppm. The gate
    threshold itself is emitted so the report is self-describing.

    Scale shape: the LM scoring's shuffles (see bigram_lm_score) plus
    the exact median via global_rank's bucketed two-pass prefix sum
    (r13 — the per-doc score frame is DOCS-sized, so ranking it through
    one bare-orderBy window was the banned all-to-one shape; 10k-ppm
    score buckets are monotone in the (score, doc_id) order) and a
    map-side-combined per-source rollup."""
    from datafusion_pinot_spark.operators.ranking import global_rank

    scores = bigram_lm_score(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    ranked = global_rank(
        scores,
        F.expr("lm_score_ppm DIV 10000"),
        ["lm_score_ppm", "doc_id"],
        rank_col="rk",
        total_col="n",
    )
    med = ranked.filter(
        F.col("rk") == F.expr("(n + 1) DIV 2")
    ).select(F.col("lm_score_ppm").alias("gate_ppm"))
    return (
        scores.join(F.broadcast(med))
        .groupBy("source")
        .agg(
            F.any_value("gate_ppm").alias("gate_ppm"),
            F.sum(
                (F.col("lm_score_ppm") >= F.col("gate_ppm")).cast("bigint")
            ).alias("n_kept"),
            F.sum(
                (F.col("lm_score_ppm") < F.col("gate_ppm")).cast("bigint")
            ).alias("n_dropped"),
            F.expr(
                "CAST(sum(lm_score_ppm) DIV count(*) AS BIGINT)"
            ).alias("mean_score_ppm"),
        )
        .orderBy("source")
    )


def lm_quality_gate_oracle_sql() -> str:
    return """
WITH t AS (
  SELECT doc_id, source,
         list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                     x -> x <> '') AS w
  FROM documents
  WHERE len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                        x -> x <> '')) >= 2
), bg AS (
  SELECT doc_id, source, w[i] AS l, w[i + 1] AS r
  FROM t, unnest(generate_series(1, len(w) - 1)) AS u(i)
), lm AS (
  SELECT l, r, count(*) AS c_lr FROM bg GROUP BY l, r
), lt AS (
  SELECT l, count(*) AS c_l FROM bg GROUP BY l
), scores AS (
  SELECT bg.doc_id, any_value(bg.source) AS source,
         CAST(sum(c_lr * 1000000 // c_l) // count(*) AS BIGINT)
           AS lm_score_ppm
  FROM bg JOIN lm USING (l, r) JOIN lt USING (l)
  GROUP BY bg.doc_id
), med AS (
  SELECT lm_score_ppm AS gate_ppm FROM (
    SELECT lm_score_ppm,
           row_number() OVER (ORDER BY lm_score_ppm, doc_id) AS rk,
           count(*) OVER () AS n
    FROM scores)
  WHERE rk = (n + 1) // 2
)
SELECT source,
       CAST(any_value(gate_ppm) AS BIGINT) AS gate_ppm,
       CAST(sum(CASE WHEN lm_score_ppm >= gate_ppm THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN lm_score_ppm < gate_ppm THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dropped,
       CAST(sum(lm_score_ppm) // count(*) AS BIGINT) AS mean_score_ppm
FROM scores CROSS JOIN med GROUP BY source ORDER BY source"""


def zipf_rank_frequency(docs: DataFrame, k: int = 20) -> DataFrame:
    """Zipf's-law audit of the corpus vocabulary: the top-``k`` tokens by
    occurrence count with their rank, frequency, the rank×frequency
    product (≈ constant under Zipf — the eyeball test for natural vs
    synthetic/templated text), and each token's frequency as ppm of the
    rank-1 frequency. All exact integers; ranks break ties by token.

    Scale shape: one map-side-combined token count (the same shuffle
    every vocabulary operator pays); the top-``k`` prune is a
    TakeOrderedAndProject (distributed partial top-k per partition, no
    global sort of the vocabulary — r13: open-vocabulary corpora make
    the vocab frame corpus-sized, so ranking it through one window was
    the banned all-to-one shape), and the rank window then runs on the
    k-row survivor frame — bounded by the parameter, not the data."""
    from datafusion_pinot_spark.functions import tokens

    freq = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    topk = freq.orderBy(F.desc("freq"), F.asc("w")).limit(k)
    w = Window.orderBy(F.desc("freq"), F.asc("w"))
    wtop = Window.partitionBy()
    ranked = topk.withColumn("rank", F.row_number().over(w)).withColumn(
        "top_freq", F.max("freq").over(wtop)
    )
    return (
        ranked.filter(F.col("rank") <= k)
        .select(
            F.col("rank").cast("long").alias("rank"),
            F.col("w").alias("token"),
            "freq",
            (F.col("rank") * F.col("freq")).cast("long").alias(
                "rank_x_freq"
            ),
            F.expr(
                "CAST(freq * 1000000 DIV top_freq AS BIGINT)"
            ).alias("rel_freq_ppm"),
        )
        .orderBy("rank")
    )


def zipf_rank_frequency_oracle_sql(k: int = 20) -> str:
    return f"""
WITH toks AS (
  SELECT unnest(list_filter(
           regexp_split_to_array(trim(lower(text)), '\\s+'), x -> x <> ''))
           AS w
  FROM documents WHERE length(trim(text)) > 0
), freq AS (
  SELECT w, count(*) AS freq FROM toks GROUP BY w
), ranked AS (
  SELECT w, freq,
         row_number() OVER (ORDER BY freq DESC, w ASC) AS rank,
         max(freq) OVER () AS top_freq
  FROM freq
)
SELECT CAST(rank AS BIGINT) AS rank, w AS token,
       CAST(freq AS BIGINT) AS freq,
       CAST(rank * freq AS BIGINT) AS rank_x_freq,
       CAST(freq * 1000000 // top_freq AS BIGINT) AS rel_freq_ppm
FROM ranked WHERE rank <= {k} ORDER BY rank"""


def charclass_profile(docs: DataFrame) -> DataFrame:
    """Per-source character-class composition — the cheap encoding-health
    signal a crawl-ingest pipeline gates on (a "text" source whose
    non-ASCII or punctuation share jumps between snapshots usually means a
    charset-detection or extraction regression upstream).

    Five classes partition every character exactly once: ASCII letters,
    digits, ASCII whitespace, other printable ASCII (punctuation), and
    everything else (non-ASCII). Counts come from length deltas under
    ``regexp_replace`` (engine-side, codegen'd — no per-char explode), and
    shares are exact integer ppm of the source's total characters, so the
    row is hash-gateable bit-for-bit.

    Scale shape: one narrow map over ``text`` + one map-side-combined
    per-source rollup; nothing shuffles but the per-source partials.
    """

    def n_matching(pattern: str):
        return F.length("text") - F.length(
            F.regexp_replace(F.col("text"), pattern, F.lit(""))
        )

    per_doc = docs.select(
        "source",
        F.length("text").cast("long").alias("chars"),
        n_matching("[A-Za-z]").cast("long").alias("letters"),
        n_matching("[0-9]").cast("long").alias("digits"),
        n_matching("[ \\t\\n\\r]").cast("long").alias("spaces"),
        # printable-ASCII range (space..tilde) plus the whitespace chars;
        # anything outside is non-ASCII for this audit's purposes
        n_matching("[^ -~\\t\\n\\r]").cast("long").alias("nonascii"),
    )
    rolled = per_doc.groupBy("source").agg(
        F.sum("chars").cast("long").alias("total_chars"),
        F.sum("letters").cast("long").alias("letters"),
        F.sum("digits").cast("long").alias("digits"),
        F.sum("spaces").cast("long").alias("spaces"),
        F.sum("nonascii").cast("long").alias("nonascii"),
    )
    ppm = lambda c: F.expr(  # noqa: E731
        f"CASE WHEN total_chars = 0 THEN 0L ELSE {c} * 1000000L div total_chars END"
    ).alias(f"{c}_ppm" if c != "punct" else "punct_ppm")
    return (
        rolled.withColumn(
            "punct",
            (
                F.col("total_chars")
                - F.col("letters")
                - F.col("digits")
                - F.col("spaces")
                - F.col("nonascii")
            ).cast("long"),
        )
        .select(
            "source",
            "total_chars",
            ppm("letters"),
            ppm("digits"),
            ppm("spaces"),
            ppm("punct"),
            ppm("nonascii"),
        )
        .orderBy("source")
    )


def charclass_profile_oracle_sql() -> str:
    # 'g' flag: DuckDB regexp_replace is single-match by default (Spark's
    # replaces all). CAST(SUM(...) AS BIGINT): DuckDB rolls BIGINT sums
    # into HUGEINT.
    return r"""
WITH per_doc AS (
  SELECT source, CAST(length(text) AS BIGINT) AS chars,
    CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
         AS BIGINT) AS letters,
    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
         AS BIGINT) AS digits,
    CAST(length(text) - length(regexp_replace(text, '[ \t\n\r]', '', 'g'))
         AS BIGINT) AS spaces,
    CAST(length(text) - length(regexp_replace(text, '[^ -~\t\n\r]', '', 'g'))
         AS BIGINT) AS nonascii
  FROM documents),
rolled AS (
  SELECT source,
         CAST(sum(chars) AS BIGINT) AS total_chars,
         CAST(sum(letters) AS BIGINT) AS letters,
         CAST(sum(digits) AS BIGINT) AS digits,
         CAST(sum(spaces) AS BIGINT) AS spaces,
         CAST(sum(nonascii) AS BIGINT) AS nonascii
  FROM per_doc GROUP BY source)
SELECT source, total_chars,
  CASE WHEN total_chars = 0 THEN 0
       ELSE letters * 1000000 // total_chars END AS letters_ppm,
  CASE WHEN total_chars = 0 THEN 0
       ELSE digits * 1000000 // total_chars END AS digits_ppm,
  CASE WHEN total_chars = 0 THEN 0
       ELSE spaces * 1000000 // total_chars END AS spaces_ppm,
  CASE WHEN total_chars = 0 THEN 0
       ELSE (total_chars - letters - digits - spaces - nonascii)
            * 1000000 // total_chars END AS punct_ppm,
  CASE WHEN total_chars = 0 THEN 0
       ELSE nonascii * 1000000 // total_chars END AS nonascii_ppm
FROM rolled ORDER BY source"""


def lang_confusion_matrix(docs: DataFrame) -> DataFrame:
    """Confusion matrix of the stopword-marker language guesser against
    the labeled ``lang`` column — the router-quality audit a corpus
    pipeline runs before trusting lang-id for mixture decisions: each
    (actual, guessed) cell with its count and its share of the actual
    language's rows in exact ppm (so per-language recall sits on the
    diagonal).

    Scale shape (100 TB): the guess is a codegen'd CASE over
    array_contains hits (no Python, no explode); one (lang, lang_guess)
    map-side-combined aggregate; the per-language denominator is a window
    over the |langs| x |guesses| cell frame, never a second scan.
    """
    g = lang_id(docs)
    cells = g.groupBy("lang", "lang_guess").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    w = Window.partitionBy("lang")
    return (
        cells.withColumn("_t", F.sum("n_docs").over(w))
        .select(
            "lang",
            "lang_guess",
            "n_docs",
            F.expr("n_docs * 1000000L div _t").cast("long").alias(
                "row_share_ppm"
            ),
        )
        .orderBy("lang", "lang_guess")
    )


def lang_confusion_matrix_oracle_sql() -> str:
    return f"""
WITH g AS ({lang_id_oracle_sql()}),
cells AS (
  SELECT lang, lang_guess, CAST(count(*) AS BIGINT) AS n_docs
  FROM g GROUP BY lang, lang_guess
)
SELECT lang, lang_guess, n_docs,
       CAST(n_docs * 1000000
            // sum(n_docs) OVER (PARTITION BY lang) AS BIGINT)
         AS row_share_ppm
FROM cells ORDER BY lang, lang_guess"""


def quality_yield_curve(
    docs: DataFrame, thresholds_milli: tuple[int, ...] = tuple(range(0, 1000, 100))
) -> DataFrame:
    """Token-yield curve over the quality gate — the "pick the threshold"
    planning table for a corpus filter: for each candidate quality cutoff
    t, how many documents and tokens survive ``quality >= t``, and what
    share of the corpus that is (exact ppm). Curation teams read this
    curve to trade corpus size against quality before committing a gate.

    Determinism: the quality score is the house exact-decimal compute
    (text_stats) rounded to 4 decimals — the SAME doubles in both
    engines — and each threshold is ``milli / 1000.0``, the same IEEE
    division in both engines, so every comparison lands identically.
    Counts and ppm shares are exact integers.

    Scale shape (100 TB): one narrow scoring map, a 10x explode of the
    (doc, score, tokens) PROFILE (three columns, not the text), and one
    map-side-combined aggregate per threshold — the shuffle carries
    |thresholds| rows per partition.
    """
    stats = text_stats(docs).select("doc_id", "n_tokens", "quality")
    th = F.array(*[F.lit(int(m)) for m in thresholds_milli])
    fanned = stats.select(
        "n_tokens",
        "quality",
        F.explode(th).alias("threshold_milli"),
    )
    keep = F.col("quality") >= F.col("threshold_milli").cast("double") / 1000.0
    per = fanned.groupBy("threshold_milli").agg(
        F.sum(keep.cast("long")).cast("long").alias("n_docs_kept"),
        F.sum(F.when(keep, F.col("n_tokens")).otherwise(0))
        .cast("long")
        .alias("n_tokens_kept"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )
    return (
        per.select(
            F.col("threshold_milli").cast("int").alias("threshold_milli"),
            "n_docs_kept",
            "n_tokens_kept",
            F.expr(
                "CASE WHEN n_docs > 0"
                " THEN CAST(n_docs_kept * 1000000L div n_docs AS BIGINT)"
                " ELSE 0L END"
            ).alias("docs_yield_ppm"),
            F.expr(
                "CASE WHEN n_tokens > 0"
                " THEN CAST(n_tokens_kept * 1000000L div n_tokens AS BIGINT)"
                " ELSE 0L END"
            ).alias("tokens_yield_ppm"),
        )
        .orderBy("threshold_milli")
    )


def quality_yield_curve_oracle_sql(
    thresholds_milli: tuple[int, ...] = tuple(range(0, 1000, 100))
) -> str:
    ths = ", ".join(str(m) for m in thresholds_milli)
    return f"""
WITH stats AS (
  SELECT doc_id, n_tokens, quality FROM ({text_stats_oracle_sql()})
), fanned AS (
  SELECT s.n_tokens, s.quality, t.m AS threshold_milli
  FROM stats s, UNNEST([{ths}]) AS t(m)
), per AS (
  SELECT threshold_milli,
         CAST(sum(CASE WHEN quality >= threshold_milli / 1000.0
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_kept,
         CAST(sum(CASE WHEN quality >= threshold_milli / 1000.0
                       THEN n_tokens ELSE 0 END) AS BIGINT) AS n_tokens_kept,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS n_tokens
  FROM fanned GROUP BY threshold_milli
)
SELECT CAST(threshold_milli AS INTEGER) AS threshold_milli,
       n_docs_kept, n_tokens_kept,
       CAST(CASE WHEN n_docs > 0
                 THEN n_docs_kept * 1000000 // n_docs ELSE 0 END AS BIGINT)
         AS docs_yield_ppm,
       CAST(CASE WHEN n_tokens > 0
                 THEN n_tokens_kept * 1000000 // n_tokens
                 ELSE 0 END AS BIGINT) AS tokens_yield_ppm
FROM per ORDER BY threshold_milli"""


def token_dist_chi2_by_source(docs: DataFrame) -> DataFrame:
    """Content-drift audit: chi-square distance between each SOURCE's
    token distribution and the corpus-wide distribution — the token-level
    complement of ks_source_drift (which sees only document lengths): a
    source whose text comes from a different generator (spam injection,
    wrong-language crawl, template farm) shows a large chi2 even when its
    length profile looks normal.

    Exactness: each cell's term is
    ``(o*N - n_s*c_t)^2 * 1000 div (N * n_s * c_t)`` in decimal(38,0) —
    o observed, c_t corpus token count, n_s source total, N corpus total;
    exact below ~10^15 for o*N (10^38 headroom on the square), i.e.
    corpora to ~10^7 tokens per cell at 10^9 total — far past this
    corpus; DuckDB computes the identical HUGEINT term. The flag compares
    the milli sum to the hardcoded chi-square(30, 0.05) critical value
    43773 (the corpus vocabulary is 31 tokens; benford_first_digit sets
    the hardcoded-constant precedent).

    Scale shape (100 TB): one (source, token) count shuffle with map-side
    combine, one token-keyed join against the corpus token totals, scalar
    totals broadcast, then a per-source rollup of |sources| x |vocab|
    term rows. Nothing all-pairs; the join key is the token, so skew
    follows Zipf and AQE splits the hot fragments."""
    tok = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("tok")
    )
    obs = tok.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("o"))
    ct = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c_t"))
    ns = tok.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    big_n = tok.agg(F.count(F.lit(1)).alias("n_total"))
    # (num*num*1000) div den divides ONCE — dividing num*num by den first
    # and then scaling would truncate away the sub-integer part per term
    terms = (
        obs.join(ct, "tok")
        .join(F.broadcast(ns), "source")
        .join(F.broadcast(big_n))
        .select(
            "source",
            F.expr(
                "CAST((CAST(o AS DECIMAL(38,0)) * n_total"
                " - CAST(n_s AS DECIMAL(38,0)) * c_t)"
                " * (CAST(o AS DECIMAL(38,0)) * n_total"
                " - CAST(n_s AS DECIMAL(38,0)) * c_t)"
                " * 1000 div (CAST(n_total AS DECIMAL(38,0)) * n_s * c_t)"
                " AS BIGINT)"
            ).alias("term_milli"),
        )
    )
    return (
        terms.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens_present"),
            F.sum("term_milli").cast("long").alias("chi2_milli"),
        )
        .select(
            "source",
            "n_tokens_present",
            "chi2_milli",
            (F.col("chi2_milli") > 43773).alias("drift_flag"),
        )
        .orderBy("source")
    )


def token_dist_chi2_by_source_oracle_sql() -> str:
    return """
WITH tok AS (
  SELECT source,
         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
  FROM documents WHERE length(trim(lower(text))) > 0
), obs AS (
  SELECT source, tok, CAST(count(*) AS BIGINT) AS o
  FROM tok GROUP BY source, tok
), ct AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS c_t FROM tok GROUP BY tok
), ns AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM tok GROUP BY source
), nt AS (
  SELECT CAST(count(*) AS BIGINT) AS n_total FROM tok
), terms AS (
  SELECT obs.source,
         CAST((CAST(o AS HUGEINT) * n_total - CAST(n_s AS HUGEINT) * c_t)
              * (CAST(o AS HUGEINT) * n_total - CAST(n_s AS HUGEINT) * c_t)
              * 1000 // (CAST(n_total AS HUGEINT) * n_s * c_t) AS BIGINT)
           AS term_milli
  FROM obs JOIN ct USING (tok) JOIN ns USING (source) CROSS JOIN nt
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_tokens_present,
       CAST(sum(term_milli) AS BIGINT) AS chi2_milli,
       sum(term_milli) > 43773 AS drift_flag
FROM terms GROUP BY source ORDER BY source"""


PREFIX_LEN = 10


def prefix_suffix_dup_families(
    docs: DataFrame, n: int = PREFIX_LEN
) -> DataFrame:
    """Boilerplate-END dedup audit: documents grouped into FAMILIES by
    their first ``n`` tokens (shared intros: scraped headers, template
    openings) and independently by their last ``n`` tokens (shared
    outros: footers, signatures, license tails). Whole-doc hashing misses
    these — the middles differ — and MinHash dilutes them when the shared
    span is a small fraction of the doc; anchoring at the document
    BOUNDARIES is how crawl pipelines catch template re-use directly.
    One row per (source, kind in 'prefix'|'suffix'): doc count, family
    count (fingerprints shared by >= 2 docs), docs inside such families,
    and the largest family.

    Scale shape (100 TB): fingerprinting is a narrow per-row map (token
    slice + join — no explode of the token stream); ONE shuffle on
    (source, kind, fingerprint) with map-side combine, then a rollup on
    the family-sized frame. Docs shorter than ``n`` tokens fingerprint as
    their whole token list — boundary dedup degrades to exact dedup
    there, which is the right family for them."""
    toks = tokens(F.col("text"))
    nt = F.size(toks)
    pre = F.array_join(F.slice(toks, 1, n), " ")
    suf = F.array_join(
        F.slice(toks, F.greatest(nt - F.lit(n - 1), F.lit(1)), n), " "
    )
    fp = (
        docs.filter(F.length(F.trim(F.lower(F.col("text")))) > 0)
        .select(
            "source",
            F.explode(
                F.map_from_arrays(
                    F.array(F.lit("prefix"), F.lit("suffix")),
                    F.array(pre, suf),
                )
            ).alias("kind", "fp"),
        )
    )
    fam = fp.groupBy("source", "kind", "fp").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        fam.groupBy("source", "kind")
        .agg(
            F.sum("cnt").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("cnt") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_families"),
            F.sum(F.when(F.col("cnt") >= 2, F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("docs_in_families"),
            F.max("cnt").cast("long").alias("max_family"),
        )
        .orderBy("source", "kind")
    )


def prefix_suffix_dup_families_oracle_sql(n: int = PREFIX_LEN) -> str:
    return f"""
WITH base AS (
  SELECT source,
         regexp_split_to_array(trim(lower(text)), '\\s+') AS w
  FROM documents WHERE length(trim(lower(text))) > 0
), fp AS (
  SELECT source, 'prefix' AS kind,
         array_to_string(w[1:{n}], ' ') AS fp
  FROM base
  UNION ALL
  SELECT source, 'suffix' AS kind,
         array_to_string(w[greatest(len(w) - {n - 1}, 1):len(w)], ' ') AS fp
  FROM base
), fam AS (
  SELECT source, kind, fp, count(*) AS cnt
  FROM fp GROUP BY source, kind, fp
)
SELECT source, kind,
       CAST(sum(cnt) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_families,
       CAST(sum(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS BIGINT)
         AS docs_in_families,
       CAST(max(cnt) AS BIGINT) AS max_family
FROM fam GROUP BY source, kind
ORDER BY source, kind"""


COVERAGE_TARGETS_PPM = (500_000, 900_000, 950_000, 990_000)


def vocab_coverage_curve(
    docs: DataFrame, targets_ppm: tuple[int, ...] = COVERAGE_TARGETS_PPM
) -> DataFrame:
    """Tokenizer-budget planning table: the smallest vocabulary size that
    covers each target fraction of total token MASS, with the coverage
    actually achieved at that size — the inverse-CDF companion to
    ``zipf_rank_frequency`` (which tabulates the rank-frequency law;
    this answers the budget question a tokenizer design starts from:
    "how many types buy me 99% of tokens?"). Ranking is deterministic
    (count desc, token asc); coverage in exact ppm via integer division
    against the total.

    Scale shape (100 TB): the corpus collapses to the VOCABULARY frame in
    one map-side-combined groupBy; the rank AND the cumulative token
    mass come from a bucketed two-pass prefix scan (r13 — an open
    vocabulary makes this frame corpus-sized, so the old bare-orderBy
    cumulative window was the banned all-to-one shape): tokens bucket
    by -floor(log2(count)) — ≤ 64 buckets forever, monotone in the
    (count desc, token asc) order — the bucket frame carries both a
    row-count and a mass prefix, and the within-bucket windows are
    partitioned. Targets fan out constant-fold; the token stream is
    never windowed."""
    from pyspark.sql import Window

    freq = (
        docs.filter(F.length(F.trim(F.lower(F.col("text")))) > 0)
        .select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    b = freq.withColumn(
        "__bucket", F.expr("-CAST(floor(log2(c)) AS BIGINT)")
    )
    bcounts = b.groupBy("__bucket").agg(
        F.count(F.lit(1)).alias("__bn"), F.sum("c").alias("__bc")
    )
    w_prefix = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prefixes = bcounts.select(
        "__bucket",
        F.coalesce(F.sum("__bn").over(w_prefix), F.lit(0)).alias(
            "__rank_off"
        ),
        F.coalesce(F.sum("__bc").over(w_prefix), F.lit(0)).alias(
            "__cum_off"
        ),
    )
    w_local = Window.partitionBy("__bucket").orderBy(
        F.desc("c"), F.asc("tok")
    )
    w_local_cum = w_local.rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = (
        b.join(F.broadcast(prefixes), "__bucket")
        .select(
            (F.col("__rank_off") + F.row_number().over(w_local)).alias(
                "rank"
            ),
            (F.col("__cum_off") + F.sum("c").over(w_local_cum)).alias(
                "cum"
            ),
        )
    )
    totals = freq.agg(
        F.sum("c").cast("long").alias("total_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
    )
    tgt = F.explode(
        F.array(*[F.lit(p).cast("long") for p in targets_ppm])
    ).alias("target_ppm")
    grid = totals.select("total_tokens", "vocab_size", tgt)
    hit = ranked.join(
        F.broadcast(grid),
        F.col("cum") * 1_000_000 >= F.col("target_ppm") * F.col("total_tokens"),
    )
    return (
        hit.groupBy("target_ppm", "total_tokens", "vocab_size")
        .agg(
            F.min("rank").cast("long").alias("k_tokens"),
            F.min(F.struct("rank", "cum")).alias("_first"),
        )
        .select(
            "target_ppm",
            "k_tokens",
            F.expr(
                "CAST(CASE WHEN total_tokens > 0 THEN"
                " _first.cum * 1000000 div total_tokens"
                " ELSE 0 END AS BIGINT)"
            ).alias("achieved_ppm"),
            "vocab_size",
            "total_tokens",
        )
        .orderBy("target_ppm")
    )


def vocab_coverage_curve_oracle_sql(
    targets_ppm: tuple[int, ...] = COVERAGE_TARGETS_PPM,
) -> str:
    tgt_list = ", ".join(str(p) for p in targets_ppm)
    return f"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
  FROM documents WHERE length(trim(lower(text))) > 0
), freq AS (
  SELECT tok, count(*) AS c FROM toks GROUP BY tok
), ranked AS (
  SELECT row_number() OVER (ORDER BY c DESC, tok ASC) AS rank,
         sum(c) OVER (ORDER BY c DESC, tok ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM freq
), totals AS (
  SELECT CAST(sum(c) AS BIGINT) AS total_tokens,
         CAST(count(*) AS BIGINT) AS vocab_size
  FROM freq
), grid AS (
  SELECT total_tokens, vocab_size, CAST(t.p AS BIGINT) AS target_ppm
  FROM totals, unnest(ARRAY[{tgt_list}]) AS t(p)
), hit AS (
  SELECT g.target_ppm, g.total_tokens, g.vocab_size, r.rank, r.cum
  FROM ranked r JOIN grid g
    ON r.cum * 1000000 >= g.target_ppm * g.total_tokens
)
SELECT target_ppm,
       CAST(min(rank) AS BIGINT) AS k_tokens,
       CAST(CASE WHEN max(total_tokens) > 0 THEN
            min_by(cum, rank) * 1000000 // max(total_tokens)
            ELSE 0 END AS BIGINT) AS achieved_ppm,
       max(vocab_size) AS vocab_size,
       max(total_tokens) AS total_tokens
FROM hit GROUP BY target_ppm ORDER BY target_ppm"""


def source_tv_distance_matrix(docs: DataFrame) -> DataFrame:
    """Pairwise TOTAL-VARIATION distance between source token
    distributions, in exact ppm — the distributional-shift matrix
    ("which sources speak the same language?") computed without a single
    float: TV(P,Q) = ½ Σ|p_i − q_i| becomes the integer identity
    ``Σ|c_i·T_q − d_i·T_p|  //  (2·T_p·T_q)`` after clearing
    denominators (c,d per-token counts; T totals). KL/JS need logs —
    transcendental, engine-unstable; TV is THE f-divergence that stays
    rational, which is why it is the one this catalog can hash-gate.

    Scale shape (100 TB): the corpus collapses to the (source, token)
    count frame in one map-side-combined rollup; the matrix join is a
    FULL-vocabulary-aligned self-join of that VOCABULARY-sized frame
    (missing tokens zero-fill via the source x vocab grid — |sources| x
    |vocab| rows, broadcast); output is |sources|²/2 rows. Exact while
    1e6·2·T_p·T_q < 2^63 (~T of 2e6 tokens per source; past that the
    sums carry in decimal(38,0))."""
    toks = (
        docs.filter(F.length(F.trim(F.lower(F.col("text")))) > 0)
        .select("source", F.explode(tokens(F.col("text"))).alias("tok"))
    )
    counts = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    totals = counts.groupBy("source").agg(F.sum("c").alias("t"))
    grid = (
        totals.select("source", "t")
        .crossJoin(counts.select("tok").distinct())
        .join(counts, ["source", "tok"], "left")
        .select(
            "source",
            "tok",
            "t",
            F.coalesce("c", F.lit(0)).cast("long").alias("c"),
        )
    )
    a, b = grid.alias("a"), grid.alias("b")
    return (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(
            F.max(F.col("a.t")).alias("t_a"),
            F.max(F.col("b.t")).alias("t_b"),
            F.sum(
                F.abs(
                    F.col("a.c") * F.col("b.t")
                    - F.col("b.c") * F.col("a.t")
                )
            ).alias("num"),
        )
        .select(
            "source_a",
            "source_b",
            F.col("t_a").cast("long").alias("tokens_a"),
            F.col("t_b").cast("long").alias("tokens_b"),
            F.expr(
                "CAST(CASE WHEN t_a > 0 AND t_b > 0"
                " THEN num * 1000000 div (2 * t_a * t_b)"
                " ELSE 0 END AS BIGINT)"
            ).alias("tv_ppm"),
        )
        .orderBy("source_a", "source_b")
    )


def source_tv_distance_matrix_oracle_sql() -> str:
    return """
WITH toks AS (
  SELECT source,
         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
  FROM documents WHERE length(trim(lower(text))) > 0
), counts AS (
  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
  FROM toks GROUP BY source, tok
), totals AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS t FROM counts GROUP BY source
), grid AS (
  SELECT tt.source, v.tok, tt.t, CAST(coalesce(c.c, 0) AS BIGINT) AS c
  FROM totals tt
  CROSS JOIN (SELECT DISTINCT tok FROM counts) v
  LEFT JOIN counts c ON c.source = tt.source AND c.tok = v.tok
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(max(a.t) AS BIGINT) AS tokens_a,
       CAST(max(b.t) AS BIGINT) AS tokens_b,
       CAST(CASE WHEN max(a.t) > 0 AND max(b.t) > 0
            THEN sum(abs(a.c * b.t - b.c * a.t)) * 1000000
                 // (2 * max(a.t) * max(b.t))
            ELSE 0 END AS BIGINT) AS tv_ppm
FROM grid a JOIN grid b ON a.tok = b.tok AND a.source < b.source
GROUP BY a.source, b.source
ORDER BY source_a, source_b"""


def source_token_lift_topk(
    docs: DataFrame, top: int = 20, min_count: int = 5
) -> DataFrame:
    """Distinctive vocabulary per source: the ``top`` (source, token)
    pairs whose in-source token RATE most exceeds the corpus rate —
    exact integer rate-ratio in ppm (``(c_s/T_s) / (C/T)`` cleared of
    denominators), the log-odds-style "what words mark this source"
    table without the log. ``min_count`` suppresses one-off tokens whose
    ratio is all noise. Complements token_lift_pairs (token-token
    association) with token-SOURCE association.

    Scale shape: two map-side-combined rollups (per-source-token,
    per-token) joined on token — both vocabulary-bounded — and a
    TakeOrdered top-k."""
    toks = (
        docs.filter(F.length(F.trim(F.lower(F.col("text")))) > 0)
        .select("source", F.explode(tokens(F.col("text"))).alias("tok"))
    )
    st = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    tot_s = st.groupBy("source").agg(F.sum("c").alias("t_s"))
    tok_all = st.groupBy("tok").agg(F.sum("c").alias("c_all"))
    tot_all = st.agg(F.sum("c").alias("t_all"))
    return (
        st.filter(F.col("c") >= min_count)
        .join(tot_s, "source")
        .join(tok_all, "tok")
        .crossJoin(F.broadcast(tot_all))
        .select(
            "source",
            "tok",
            F.col("c").cast("long").alias("n_in_source"),
            F.col("c_all").cast("long").alias("n_in_corpus"),
            # DECIMAL(38,0) carry: c * t_all * 1e6 overflows BIGINT once
            # total corpus tokens reach a few million with a concentrated
            # token (c*t_all*1e6 > 2^63) — same guard the TV-matrix and
            # halflife operators use. The quotient is rate-ratio ppm and
            # fits BIGINT by construction (c <= t_s, c_all <= t_all).
            F.expr(
                "CAST(CAST(c AS DECIMAL(38,0)) * t_all * 1000000"
                " div (CAST(t_s AS DECIMAL(38,0)) * c_all) AS BIGINT)"
            ).alias("lift_ppm"),
        )
        .orderBy(F.desc("lift_ppm"), F.asc("source"), F.asc("tok"))
        .limit(top)
    )


def source_token_lift_topk_oracle_sql(
    top: int = 20, min_count: int = 5
) -> str:
    return f"""
WITH toks AS (
  SELECT source,
         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
  FROM documents WHERE length(trim(lower(text))) > 0
), st AS (
  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
  FROM toks GROUP BY source, tok
), tot_s AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS t_s FROM st GROUP BY source
), tok_all AS (
  SELECT tok, CAST(sum(c) AS BIGINT) AS c_all FROM st GROUP BY tok
), tot_all AS (
  SELECT CAST(sum(c) AS BIGINT) AS t_all FROM st
)
SELECT st.source AS source, st.tok AS tok,
       st.c AS n_in_source,
       tok_all.c_all AS n_in_corpus,
       CAST(CAST(st.c AS HUGEINT) * t_all * 1000000
            // (CAST(t_s AS HUGEINT) * c_all) AS BIGINT) AS lift_ppm
FROM st
JOIN tot_s ON st.source = tot_s.source
JOIN tok_all ON st.tok = tok_all.tok
CROSS JOIN tot_all
WHERE st.c >= {min_count}
ORDER BY lift_ppm DESC, 1 ASC, 2 ASC
LIMIT {top}"""


def bm25_doc_terms(docs: DataFrame, k: int = 3) -> DataFrame:
    """Okapi BM25 scoring (Robertson & Walker, public; k1=1.2, b=0.75),
    top-k most distinctive terms per document — tfidf_top_terms' cousin
    with the two properties tf-idf lacks: tf SATURATION (the 40th "the"
    adds almost nothing) and document-LENGTH normalization (a term
    repeated in a short doc outranks the same count in a long one).

    Engine-stable numerics: both BM25 factors are made RATIONAL so the
    score is exact integer arithmetic end to end (the tfidf_top_terms
    rule). The saturation term with k1=6/5, b=3/4 multiplies out to
    ``sat_ppm = (22*tf*sumdl*1e6) div (10*tf*sumdl + 3*sumdl + 9*dl*N)``
    (derivation in-line below), and the idf keeps Robertson's half-added
    ratio WITHOUT the log: ``idf_ppm = ((2*(N-df)+1)*1e6) div (2*df+1)``
    — monotone in df exactly as the log form is, just un-squashed.
    Products ride DECIMAL(38,0) (HUGEINT in DuckDB): tf*sumdl*22e6
    passes BIGINT at ~4e5-token corpora; the decimal form is exact to
    1e38, i.e. past any 100 TB corpus.

    Scale shape (100 TB): one explode + two map-side-combined shuffles
    (tf on (doc, token), df on token), corpus scalars (N, sumdl) as a
    1-row broadcast, and the doc-PARTITIONED top-k window is a
    WindowGroupLimit partial — no global sort, no bare window."""
    toks = (
        docs.select("doc_id", tokens(F.col("text")).alias("toks"))
        .filter(F.size("toks") > 0)
        .select("doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("token"))
    )
    tf = toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    corpus = toks.groupBy("doc_id").agg(F.first("dl").alias("dl")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sumdl"),
    )
    # sat = tf*(k1+1) / (tf + k1*(1 - b + b*dl*N/sumdl)); multiply num and
    # den by 10*sumdl: num = 22*tf*sumdl, den = 10*tf*sumdl + 3*sumdl
    # + 9*dl*N — every factor integer.
    scored = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            "dl",
            F.expr(
                "CAST((CAST(22 AS DECIMAL(38,0)) * tf * sumdl * 1000000)"
                " div (CAST(10 AS DECIMAL(38,0)) * tf * sumdl"
                " + CAST(3 AS DECIMAL(38,0)) * sumdl"
                " + CAST(9 AS DECIMAL(38,0)) * dl * n_docs)"
                " AS BIGINT)"
            ).alias("sat_ppm"),
            F.expr(
                "CAST((CAST(2 AS DECIMAL(38,0)) * (n_docs - df) + 1)"
                " * 1000000 div (CAST(2 AS DECIMAL(38,0)) * df + 1)"
                " AS BIGINT)"
            ).alias("idf_ppm"),
        )
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            "dl",
            F.expr(
                "CAST((CAST(sat_ppm AS DECIMAL(38,0)) * idf_ppm)"
                " div 1000000 AS BIGINT)"
            ).alias("bm25_ppm"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("bm25_ppm"), F.desc("tf"), F.asc("token")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
        .orderBy("doc_id", F.desc("bm25_ppm"), F.desc("tf"), "token")
    )


def bm25_doc_terms_oracle_sql(k: int = 3) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, len(tl) AS dl, unnest(tl) AS token FROM (
    SELECT doc_id,
           regexp_split_to_array(trim(lower(text)), '\\s+') AS tl
    FROM documents WHERE length(trim(lower(text))) > 0
  )
), tf AS (
  SELECT doc_id, token, count(*) AS tf, min(dl) AS dl
  FROM toks GROUP BY doc_id, token
), df AS (
  SELECT token, count(*) AS df FROM tf GROUP BY token
), corpus AS (
  SELECT count(*) AS n_docs, sum(dl) AS sumdl
  FROM (SELECT doc_id, min(dl) AS dl FROM toks GROUP BY doc_id)
), scored AS (
  SELECT doc_id, tf.token AS token, tf, df, dl,
         CAST((CAST(22 AS HUGEINT) * tf * sumdl * 1000000)
              // (CAST(10 AS HUGEINT) * tf * sumdl
                  + CAST(3 AS HUGEINT) * sumdl
                  + CAST(9 AS HUGEINT) * dl * n_docs) AS BIGINT) AS sat_ppm,
         CAST((CAST(2 AS HUGEINT) * (n_docs - df) + 1) * 1000000
              // (CAST(2 AS HUGEINT) * df + 1) AS BIGINT) AS idf_ppm
  FROM tf JOIN df ON tf.token = df.token CROSS JOIN corpus
), final AS (
  SELECT doc_id, token, tf, df, dl,
         CAST((CAST(sat_ppm AS HUGEINT) * idf_ppm) // 1000000 AS BIGINT)
           AS bm25_ppm
  FROM scored
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY bm25_ppm DESC, tf DESC, token
  ) AS rn FROM final
)
SELECT doc_id, token, tf, df, dl, bm25_ppm FROM ranked WHERE rn <= {k}
ORDER BY doc_id, bm25_ppm DESC, tf DESC, token
"""


def readability_by_source(docs: DataFrame) -> DataFrame:
    """Flesch-style readability profile per source — the classic prose
    gate (Flesch 1948, public) re-expressed in exact integer milli so the
    score hash-checks across engines: per document,
    ``f_milli = 206835 - (1015 * W) div S - (84600 * Y) div W`` with
    W = whitespace tokens, S = sentence runs (``[.!?]+``, floored at 1),
    Y = vowel-group syllable proxy (``[aeiouy]+``) — the three regex
    counts every engine evaluates identically. Per source: doc count,
    min/avg/max score (avg sign-split floored — scores go negative on
    run-on text), words-per-sentence and syllables-per-word in milli.

    Scale shape (100 TB): three regexp counters per document inside ONE
    codegen'd projection (no explode — the token ARRAY is never
    materialized, just counted), then one map-side-combined rollup to
    |sources| rows. The cheapest text op in the catalog per byte
    scanned."""
    per_doc = (
        docs.filter(F.length(F.trim(F.col("text"))) > 0)
        .select(
            "source",
            F.expr(
                "size(split(trim(lower(text)), '\\\\s+'))"
            ).alias("w"),
            F.expr(
                "greatest(regexp_count(lower(text), '[.!?]+'), 1)"
            ).alias("s"),
            F.expr("regexp_count(lower(text), '[aeiouy]+')").alias("y"),
        )
        .select(
            "source",
            "w",
            "s",
            "y",
            F.expr(
                "206835 - (1015 * w) DIV s - (84600 * y) DIV w"
            ).alias("f_milli"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("f_milli").alias("sum_f"),
            F.min("f_milli").cast("long").alias("min_f_milli"),
            F.max("f_milli").cast("long").alias("max_f_milli"),
            F.sum("w").alias("sw"),
            F.sum("s").alias("ss"),
            F.sum("y").alias("sy"),
        )
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.expr(
                "CAST(CASE WHEN sum_f >= 0 THEN sum_f DIV n_docs"
                " ELSE -((-sum_f) DIV n_docs) END AS BIGINT)"
            ).alias("avg_f_milli"),
            "min_f_milli",
            "max_f_milli",
            F.expr("CAST(1000 * sw DIV ss AS BIGINT)").alias("wps_milli"),
            F.expr("CAST(1000 * sy DIV sw AS BIGINT)").alias("spw_milli"),
        )
        .orderBy("source")
    )


def readability_by_source_oracle_sql() -> str:
    return r"""
WITH per_doc AS (
  SELECT source,
         len(regexp_split_to_array(trim(lower(text)), '\s+')) AS w,
         greatest(len(regexp_extract_all(lower(text), '[.!?]+')), 1) AS s,
         len(regexp_extract_all(lower(text), '[aeiouy]+')) AS y
  FROM documents WHERE length(trim(text)) > 0
), scored AS (
  SELECT source, w, s, y,
         206835 - (1015 * w) // s - (84600 * y) // w AS f_milli
  FROM per_doc
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(CASE WHEN sum(f_milli) >= 0 THEN sum(f_milli) // count(*)
                 ELSE -((-sum(f_milli)) // count(*)) END AS BIGINT)
         AS avg_f_milli,
       CAST(min(f_milli) AS BIGINT) AS min_f_milli,
       CAST(max(f_milli) AS BIGINT) AS max_f_milli,
       CAST(1000 * sum(w) // sum(s) AS BIGINT) AS wps_milli,
       CAST(1000 * sum(y) // sum(w) AS BIGINT) AS spw_milli
FROM scored GROUP BY source ORDER BY source"""


_RAKE_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for",
    "on", "with", "as", "at", "by", "be", "this", "that", "are", "was",
    "from", "but", "not", "have", "has",
)


def rake_keyword_extraction(docs: DataFrame, k: int = 3) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010, public) — top-k
    multi-word key phrases per document from DOCUMENT-INTERNAL
    statistics only, the corpus-free complement to tfidf/BM25: candidate
    phrases are maximal token runs between stopwords, each word scores
    ``deg/freq`` (degree = total length of phrases containing it, with
    multiplicity), and a phrase scores the sum of its word scores — all
    in exact integer milli, so rows hash-check across engines. Ties
    break on ascending phrase text.

    Scale shape (100 TB): phrase splitting is pure array codegen
    (stopwords map to a '|' sentinel, join, split — no UDF); word stats
    and phrase scores are (doc, word)- and (doc, phrase)-keyed
    map-side-combined shuffles; top-k is a WindowGroupLimit partial per
    document. No corpus-wide state at all — the op is embarrassingly
    document-parallel."""
    stop_arr = F.array(*[F.lit(w) for w in _RAKE_STOPWORDS])
    mapped = F.transform(
        tokens(F.col("text")),
        lambda t: F.when(F.array_contains(stop_arr, t), F.lit("|")).otherwise(t),
    )
    phrases_col = F.filter(
        F.transform(
            F.split(F.array_join(mapped, " "), r"\|"), lambda p: F.trim(p)
        ),
        lambda p: p != "",
    )
    ph = docs.filter(F.length(F.trim(F.col("text"))) > 0).select(
        "doc_id", F.explode(phrases_col).alias("phrase")
    )
    words = ph.select(
        "doc_id",
        F.size(F.split(F.col("phrase"), " ")).alias("plen"),
        F.explode(F.split(F.col("phrase"), " ")).alias("word"),
    )
    ws = (
        words.groupBy("doc_id", "word")
        .agg(F.sum("plen").alias("deg"), F.count(F.lit(1)).alias("freq"))
        .withColumn("wscore_milli", F.expr("1000 * deg DIV freq"))
    )
    phr = ph.groupBy("doc_id", "phrase").agg(
        F.count(F.lit(1)).cast("long").alias("n_occ")
    )
    pw = phr.select(
        "doc_id",
        "phrase",
        "n_occ",
        F.explode(F.split(F.col("phrase"), " ")).alias("word"),
    )
    scored = (
        pw.join(ws, ["doc_id", "word"])
        .groupBy("doc_id", "phrase", "n_occ")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_words"),
            F.sum("wscore_milli").cast("long").alias("score_milli"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_milli"), F.asc("phrase")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "doc_id", "phrase", "n_words", "n_occ", "score_milli",
            F.col("rk").cast("int").alias("rk"),
        )
        .orderBy("doc_id", "rk")
    )


def rake_keyword_extraction_oracle_sql(k: int = 3) -> str:
    stops = ", ".join(f"'{w}'" for w in _RAKE_STOPWORDS)
    return rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(
           list_transform(
             string_split(
               array_to_string(
                 list_transform(
                   regexp_split_to_array(trim(lower(text)), '\s+'),
                   t -> CASE WHEN t IN ({stops}) THEN '|' ELSE t END),
                 ' '),
               '|'),
             p -> trim(p)),
           p -> p <> '') AS phrases
  FROM documents WHERE length(trim(lower(text))) > 0
), ph AS (
  SELECT doc_id, unnest(phrases) AS phrase FROM toks
), words AS (
  SELECT doc_id, len(string_split(phrase, ' ')) AS plen,
         unnest(string_split(phrase, ' ')) AS word
  FROM ph
), ws AS (
  SELECT doc_id, word, 1000 * sum(plen) // count(*) AS wscore_milli
  FROM words GROUP BY doc_id, word
), phr AS (
  SELECT doc_id, phrase, CAST(count(*) AS BIGINT) AS n_occ
  FROM ph GROUP BY doc_id, phrase
), pw AS (
  SELECT doc_id, phrase, n_occ, unnest(string_split(phrase, ' ')) AS word
  FROM phr
), scored AS (
  SELECT pw.doc_id, pw.phrase, pw.n_occ,
         CAST(count(*) AS INTEGER) AS n_words,
         CAST(sum(ws.wscore_milli) AS BIGINT) AS score_milli
  FROM pw JOIN ws ON pw.doc_id = ws.doc_id AND pw.word = ws.word
  GROUP BY pw.doc_id, pw.phrase, pw.n_occ
)
SELECT doc_id, phrase, n_words, n_occ, score_milli,
       CAST(rk AS INTEGER) AS rk
FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY score_milli DESC, phrase ASC) AS rk
  FROM scored
) WHERE rk <= {k} ORDER BY doc_id, rk"""


def dup_ngram_share(docs: DataFrame, n: int = 3) -> DataFrame:
    """Per-document duplicate-n-gram share — the repeated-content
    quality rule from the Gopher/MassiveText filtering recipe (Rae et
    al. 2021, public): of a document's n-gram OCCURRENCES, the fraction
    that belong to an n-gram appearing at least twice *in that
    document*. High shares flag templated boilerplate and decoding
    loops that the unigram repetition stats (doc_repetition_stats) miss.
    Exact integers: occurrence counts and a floored ppm share.

    Scale shape (100 TB): one explode to positional (not distinct)
    n-grams, one map-side-combined shuffle on (doc_id, ngram), one
    per-doc reduce — the same two-shuffle shape as doc_repetition_stats,
    never corpus-global."""
    from datafusion_pinot_spark.functions import tokens

    toks = docs.select("doc_id", tokens(F.col("text")).alias("w"))
    grams = (
        toks.filter(F.size("w") >= n)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("w") - n),
                    lambda i: F.concat_ws(
                        " ",
                        *[F.element_at(F.col("w"), i + k + 1) for k in range(n)],
                    ),
                )
            ).alias("g"),
        )
    )
    per_gram = grams.groupBy("doc_id", "g").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        per_gram.groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_ngrams"),
            F.sum(F.expr("CASE WHEN cnt >= 2 THEN cnt ELSE 0 END"))
            .cast("long")
            .alias("dup_occurrences"),
        )
        .select(
            "doc_id",
            "n_ngrams",
            "dup_occurrences",
            F.expr(
                "CAST(dup_occurrences * 1000000 div n_ngrams AS BIGINT)"
            ).alias("dup_share_ppm"),
        )
        .orderBy("doc_id")
    )


def dup_ngram_share_oracle_sql(n: int = 3) -> str:
    joined = " || ' ' || ".join(f"w[i+{j}]" for j in range(n))
    return f"""
WITH tks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS w
  FROM documents WHERE length(trim(lower(text))) > 0
), grams AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(w) - {n - 1}),
                               i -> {joined})) AS g
  FROM tks WHERE len(w) >= {n}
), per_gram AS (
  SELECT doc_id, g, count(*) AS cnt FROM grams GROUP BY doc_id, g
)
SELECT doc_id,
       CAST(sum(cnt) AS BIGINT) AS n_ngrams,
       CAST(sum(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS BIGINT)
         AS dup_occurrences,
       CAST(sum(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) * 1000000
            // sum(cnt) AS BIGINT) AS dup_share_ppm
FROM per_gram GROUP BY doc_id ORDER BY doc_id"""


def token_trend_momentum(
    docs: DataFrame, k: int = 20, min_count: int = 5
) -> DataFrame:
    """Vocabulary momentum between the two ingestion halves of the
    corpus — which tokens are RISING or FALLING as the crawl advances:
    split by the exact doc_id-range rule the novelty curve uses
    (bucket = (doc_id - min) * 2 DIV (range + 1)), compute each token's
    share of its half's token mass in ppm, and keep the top-``k`` by
    absolute share change (ties: token asc). Tokens below ``min_count``
    total occurrences are dropped (a one-doc token is noise, not
    trend). The table a curation pass reads to spot topic drift,
    spam campaigns entering the crawl, or a dying source's vocabulary
    fading out.

    Scale shape (100 TB): one explode + ONE map-side-combined shuffle
    on (token) carrying the two per-half counts as conditional sums;
    the half masses broadcast back as a 1-row frame; TakeOrdered tail.
    No windows."""
    from datafusion_pinot_spark.functions import tokens

    bounds = docs.agg(
        F.min("doc_id").alias("min_id"), F.max("doc_id").alias("max_id")
    )
    toks = (
        docs.join(F.broadcast(bounds))
        .select(
            F.expr("(doc_id - min_id) * 2 DIV (max_id - min_id + 1)")
            .cast("int")
            .alias("half"),
            F.explode(tokens(F.col("text"))).alias("token"),
        )
    )
    per_token = toks.groupBy("token").agg(
        F.sum(F.expr("CAST(half = 0 AS BIGINT)")).alias("c0"),
        F.sum(F.expr("CAST(half = 1 AS BIGINT)")).alias("c1"),
    )
    mass = per_token.agg(
        F.sum("c0").alias("m0"), F.sum("c1").alias("m1")
    )
    scored = (
        per_token.filter(F.col("c0") + F.col("c1") >= min_count)
        .crossJoin(F.broadcast(mass))
        .select(
            "token",
            F.col("c0").cast("long").alias("n_first"),
            F.col("c1").cast("long").alias("n_second"),
            F.expr(
                "CAST(CASE WHEN m0 = 0 THEN 0"
                " ELSE c0 * 1000000 div m0 END AS BIGINT)"
            ).alias("share_first_ppm"),
            F.expr(
                "CAST(CASE WHEN m1 = 0 THEN 0"
                " ELSE c1 * 1000000 div m1 END AS BIGINT)"
            ).alias("share_second_ppm"),
        )
        .withColumn(
            "delta_ppm",
            F.expr("share_second_ppm - share_first_ppm").cast("long"),
        )
    )
    return (
        scored.orderBy(F.desc(F.abs(F.col("delta_ppm"))), F.asc("token"))
        .limit(k)
        .select(
            "token",
            "n_first",
            "n_second",
            "share_first_ppm",
            "share_second_ppm",
            "delta_ppm",
        )
    )


def token_trend_momentum_oracle_sql(k: int = 20, min_count: int = 5) -> str:
    return f"""
WITH bounds AS (
  SELECT min(doc_id) AS min_id, max(doc_id) AS max_id FROM documents
), toks AS (
  SELECT CAST((doc_id - min_id) * 2 // (max_id - min_id + 1) AS INTEGER)
           AS half,
         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
  FROM documents CROSS JOIN bounds
  WHERE length(trim(lower(text))) > 0
), per_token AS (
  SELECT token,
         sum(CAST(half = 0 AS BIGINT)) AS c0,
         sum(CAST(half = 1 AS BIGINT)) AS c1
  FROM toks GROUP BY token
), mass AS (
  SELECT sum(c0) AS m0, sum(c1) AS m1 FROM per_token
), scored AS (
  SELECT token,
         CAST(c0 AS BIGINT) AS n_first, CAST(c1 AS BIGINT) AS n_second,
         CAST(CASE WHEN m0 = 0 THEN 0
              ELSE c0 * 1000000 // m0 END AS BIGINT) AS share_first_ppm,
         CAST(CASE WHEN m1 = 0 THEN 0
              ELSE c1 * 1000000 // m1 END AS BIGINT) AS share_second_ppm
  FROM per_token CROSS JOIN mass
  WHERE c0 + c1 >= {min_count}
)
SELECT token, n_first, n_second, share_first_ppm, share_second_ppm,
       CAST(share_second_ppm - share_first_ppm AS BIGINT) AS delta_ppm
FROM scored
ORDER BY abs(share_second_ppm - share_first_ppm) DESC, token ASC
LIMIT {k}"""


def token_weighted_median_length(docs: DataFrame) -> DataFrame:
    """Doc-median vs TOKEN-median document length per source — the
    curation number the plain median hides: training compute is spent
    per token, so the length of the document the typical TOKEN lives in
    (token-weighted median) is what batching, packing, and context
    budgets actually see, and it sits far above the doc median whenever
    a source mixes tweets with novels. Exact integers: both medians are
    the smallest n_chars whose cumulative mass reaches half the total
    (2*cum >= total — no interpolation, engine-identical), and the
    skew delta is their difference.

    Scale shape (100 TB): one map-side-combined rollup to
    (source, n_chars) cells, ONE partitioned cumulative window over
    that bounded cell frame (cells <= |distinct lengths| per source,
    not rows), a broadcast of per-source totals, one argmin aggregate.
    """
    from datafusion_pinot_spark.functions import tokens

    cells = (
        docs.select(
            "source",
            F.col("n_chars").cast("long").alias("len"),
            # size(NULL array) is -1 in Spark: null text counts 0 tokens
            F.when(F.col("text").isNull(), F.lit(0))
            .otherwise(F.size(tokens(F.col("text"))))
            .cast("long")
            .alias("toks"),
        )
        .groupBy("source", "len")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").alias("n_toks"),
        )
    )
    w = (
        Window.partitionBy("source")
        .orderBy("len")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = cells.select(
        "source",
        "len",
        "n_docs",
        "n_toks",
        F.sum("n_docs").over(w).alias("cum_docs"),
        F.sum("n_toks").over(w).alias("cum_toks"),
    )
    tot = cells.groupBy("source").agg(
        F.sum("n_docs").alias("tot_docs"),
        F.sum("n_toks").alias("tot_toks"),
    )
    return (
        cum.join(F.broadcast(tot), "source")
        .groupBy("source")
        .agg(
            F.max("tot_docs").cast("long").alias("n_docs"),
            F.max("tot_toks").cast("long").alias("n_tokens"),
            F.min(
                F.expr("CASE WHEN 2 * cum_docs >= tot_docs THEN len END")
            )
            .cast("long")
            .alias("doc_median_len"),
            F.min(
                F.expr("CASE WHEN 2 * cum_toks >= tot_toks THEN len END")
            )
            .cast("long")
            .alias("token_median_len"),
        )
        .withColumn(
            "skew_delta",
            F.expr("token_median_len - doc_median_len").cast("long"),
        )
        .orderBy("source")
    )


def token_weighted_median_length_oracle_sql() -> str:
    return """
WITH cells AS (
  SELECT source, CAST(n_chars AS BIGINT) AS len,
         count(*) AS n_docs,
         sum(CASE WHEN length(trim(lower(text))) = 0 THEN 0
             ELSE len(regexp_split_to_array(trim(lower(text)), '\\s+'))
             END) AS n_toks
  FROM documents GROUP BY source, 2
), cum AS (
  SELECT source, len, n_docs, n_toks,
         sum(n_docs) OVER win AS cum_docs,
         sum(n_toks) OVER win AS cum_toks
  FROM cells
  WINDOW win AS (PARTITION BY source ORDER BY len
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), tot AS (
  SELECT source, sum(n_docs) AS tot_docs, sum(n_toks) AS tot_toks
  FROM cells GROUP BY source
)
SELECT c.source,
       CAST(max(t.tot_docs) AS BIGINT) AS n_docs,
       CAST(max(t.tot_toks) AS BIGINT) AS n_tokens,
       CAST(min(CASE WHEN 2 * c.cum_docs >= t.tot_docs THEN c.len END)
            AS BIGINT) AS doc_median_len,
       CAST(min(CASE WHEN 2 * c.cum_toks >= t.tot_toks THEN c.len END)
            AS BIGINT) AS token_median_len,
       CAST(min(CASE WHEN 2 * c.cum_toks >= t.tot_toks THEN c.len END)
            - min(CASE WHEN 2 * c.cum_docs >= t.tot_docs THEN c.len END)
            AS BIGINT) AS skew_delta
FROM cum c JOIN tot t ON c.source = t.source
GROUP BY c.source ORDER BY c.source"""

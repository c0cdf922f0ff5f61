"""BPE tokenizer training as a distributed Spark loop.

The reference engine stops at scan/filter/agg relational coverage
(/root/reference README.md:311-315); tokenizer training is part of the
LLM-data-pipeline tier this repo adds on top. The algorithm is classic
byte-pair encoding (Sennrich et al. 2016, public): repeatedly find the
most frequent adjacent symbol pair in the corpus vocabulary and merge it
into one symbol.

Scale shape (the map-reduce BPE scheme): the corpus is touched ONCE — a
narrow tokenize map into one (word, freq) count shuffle. Every merge
round after that runs over the *vocabulary* table only (distinct words:
tens of millions of rows at 100 TB, i.e. thousands of times smaller than
the corpus), as one weighted pair-count aggregation plus a narrow
`replace` map. The per-round argmax is a single collected row — a driver
scalar broadcast into the next round's literal, the same legitimate
pattern as pagerank's node count (operators/graph.py). The vocabulary is
localCheckpoint-ed per round so lineage stays flat at any merge depth.

Symbol sequences are encoded as delimiter-framed strings:
``~~s1~~s2~~...~~`` (symbols are ``[a-z]+`` so ``~`` can never collide).
Merging pair (l, r) is then the plain string replace
``~l~~r~  ->  ~lr~``, which both Spark and DuckDB apply left-to-right
non-overlapping — exactly BPE's greedy within-word merge order — and
which preserves the double-delimiter framing invariant on both sides of
the merged symbol. No regex, no escaping hazard, engine-identical
semantics (the cross-engine string-function drift class that broke
rounds 1/3 is structurally avoided).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Double delimiter separates symbols; a single delimiter on each side of a
# pair addresses exactly one merge site (see module docstring).
SEP = "~~"


def _word_freqs(docs: DataFrame) -> DataFrame:
    """(word, freq) over lowercase ``[a-z]+`` runs — the one corpus pass."""
    return (
        docs.select(
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )


def _initial_seqs(words: DataFrame) -> DataFrame:
    """Frame each word's character sequence: ``~~c1~~c2~~...~~``."""
    chars = F.filter(F.split("w", ""), lambda x: x != "")
    return words.select(
        F.concat(F.lit(SEP), F.array_join(chars, SEP), F.lit(SEP)).alias(
            "seq"
        ),
        "freq",
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the framed sequences."""
    syms = F.filter(F.split("seq", "~"), lambda x: x != "")
    return (
        vocab.select("freq", syms.alias("syms"))
        .filter(F.size("syms") >= 2)
        .select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1),"
                    " i -> struct(element_at(syms, i) AS l,"
                    "             element_at(syms, i + 1) AS r))"
                )
            ).alias("p"),
        )
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("freq").alias("cnt"))
    )


def bpe_learn_merges(docs: DataFrame, rounds: int = 2) -> DataFrame:
    """Learn ``rounds`` BPE merges; returns (round, l, r, cnt) — the merge
    table a tokenizer would persist, where ``cnt`` is the weighted corpus
    frequency that made (l, r) the argmax at that round. Ties break
    (cnt desc, l asc, r asc) so the learned table is deterministic."""
    spark = docs.sparkSession
    vocab = _initial_seqs(_word_freqs(docs)).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for rnd in range(1, rounds + 1):
        best = (
            _pair_counts(vocab)
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best:  # vocabulary fully merged — nothing adjacent remains
            break
        l, r, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        merges.append((rnd, l, r, cnt))
        vocab = vocab.withColumn(
            "seq",
            F.replace(
                F.col("seq"),
                F.lit(f"~{l}{SEP}{r}~"),
                F.lit(f"~{l}{r}~"),
            ),
        ).localCheckpoint()
    return spark.createDataFrame(
        merges, "round int, l string, r string, cnt bigint"
    )


def bpe_two_merges(docs: DataFrame) -> DataFrame:
    """The oracle-checkable depth: exactly two learned merges."""
    return bpe_learn_merges(docs, rounds=2)


def bpe_two_merges_oracle_sql() -> str:
    """DuckDB unrolls the two rounds as CTE stages; `replace` there has
    the same left-to-right non-overlapping greedy semantics as Spark's."""
    return """
WITH words AS (
  SELECT w, count(*) AS freq FROM (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
    FROM documents
  ) GROUP BY w
), seq0 AS (
  SELECT freq,
         '~~' || array_to_string(regexp_split_to_array(w, ''), '~~') || '~~'
           AS seq
  FROM words
), s1 AS (
  SELECT freq, list_filter(string_split(seq, '~'), x -> x <> '') AS syms
  FROM seq0
), p1 AS (
  SELECT syms[i] AS l, syms[i+1] AS r, CAST(sum(freq) AS BIGINT) AS cnt
  FROM (SELECT freq, syms, unnest(generate_series(1, len(syms)-1)) AS i
        FROM s1 WHERE len(syms) >= 2)
  GROUP BY 1, 2
), b1 AS (
  SELECT l, r, cnt FROM p1 ORDER BY cnt DESC, l ASC, r ASC LIMIT 1
), seq1 AS (
  SELECT freq,
         replace(seq,
                 '~' || (SELECT l FROM b1) || '~~' || (SELECT r FROM b1) || '~',
                 '~' || (SELECT l FROM b1) || (SELECT r FROM b1) || '~') AS seq
  FROM seq0
), s2 AS (
  SELECT freq, list_filter(string_split(seq, '~'), x -> x <> '') AS syms
  FROM seq1
), p2 AS (
  SELECT syms[i] AS l, syms[i+1] AS r, CAST(sum(freq) AS BIGINT) AS cnt
  FROM (SELECT freq, syms, unnest(generate_series(1, len(syms)-1)) AS i
        FROM s2 WHERE len(syms) >= 2)
  GROUP BY 1, 2
), b2 AS (
  SELECT l, r, cnt FROM p2 ORDER BY cnt DESC, l ASC, r ASC LIMIT 1
)
SELECT 1 AS round, l, r, cnt FROM b1
UNION ALL
SELECT 2 AS round, l, r, cnt FROM b2
ORDER BY round
"""


def bpe_apply_compression(docs: DataFrame, rounds: int = 2) -> DataFrame:
    """Tokenizer APPLICATION: learn ``rounds`` merges, then encode the
    whole corpus with them and report per-source compression —
    (source, symbols_before, symbols_after, saved_permille). This is the
    inference half of BPE (what a trained tokenizer does to every
    document at ingest), and the statistic a curation pipeline uses to
    compare tokenizer fit across domains.

    Scale shape: the merge table is ``rounds`` driver rows (broadcast as
    literals into the encode expressions); encoding is a pure narrow map
    over the exploded word stream — no shuffle until the final per-source
    aggregation. Word occurrences (not the distinct vocab) are encoded, so
    the counts weight by real corpus frequency."""
    merges = [
        (row["l"], row["r"])
        for row in bpe_learn_merges(docs, rounds=rounds).collect()
    ]
    words = docs.select(
        "source",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("w"),
    )
    chars = F.filter(F.split("w", ""), lambda x: x != "")
    seq = F.concat(F.lit(SEP), F.array_join(chars, SEP), F.lit(SEP))
    for l, r in merges:
        seq = F.replace(seq, F.lit(f"~{l}{SEP}{r}~"), F.lit(f"~{l}{r}~"))
    enc = words.select(
        "source",
        F.length("w").cast("bigint").alias("nb"),
        F.size(F.filter(F.split(seq, "~"), lambda x: x != ""))
        .cast("bigint")
        .alias("na"),
    )
    return (
        enc.groupBy("source")
        .agg(
            F.sum("nb").alias("symbols_before"),
            F.sum("na").alias("symbols_after"),
        )
        .select(
            "source",
            "symbols_before",
            "symbols_after",
            F.expr(
                "CAST((symbols_before - symbols_after) * 1000"
                " DIV symbols_before AS BIGINT)"
            ).alias("saved_permille"),
        )
        .orderBy("source")
    )


def _bpe_learn_apply_ctes(group_col: str) -> str:
    """Shared DuckDB CTE chain: learn two merges on the whole corpus
    (words..b2), then encode every word occurrence keeping ``group_col``
    (source for the compression report, lang for the fertility audit).
    Ends with CTE ``ap2(group, nb, seq)``.

    Precondition: the corpus must yield TWO learnable merges (any corpus
    with a 3+-letter word or two distinct pairs does; the testdata corpus
    always does). On a degenerate corpus where round 2 finds no adjacent
    pair, b2's scalar subquery is NULL and the unrolled replace() NULLs
    the seq — the Spark side (which applies however many merges were
    learned) would diverge. Registered queries only ever run this on the
    documents corpus, where the precondition holds."""
    return f"""
WITH words AS (
  SELECT w, count(*) AS freq FROM (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
    FROM documents
  ) GROUP BY w
), seq0 AS (
  SELECT freq,
         '~~' || array_to_string(regexp_split_to_array(w, ''), '~~') || '~~'
           AS seq
  FROM words
), s1 AS (
  SELECT freq, list_filter(string_split(seq, '~'), x -> x <> '') AS syms
  FROM seq0
), p1 AS (
  SELECT syms[i] AS l, syms[i+1] AS r, sum(freq) AS cnt
  FROM (SELECT freq, syms, unnest(generate_series(1, len(syms)-1)) AS i
        FROM s1 WHERE len(syms) >= 2)
  GROUP BY 1, 2
), b1 AS (
  SELECT l, r FROM p1 ORDER BY cnt DESC, l ASC, r ASC LIMIT 1
), seq1 AS (
  SELECT freq,
         replace(seq,
                 '~' || (SELECT l FROM b1) || '~~' || (SELECT r FROM b1) || '~',
                 '~' || (SELECT l FROM b1) || (SELECT r FROM b1) || '~') AS seq
  FROM seq0
), s2 AS (
  SELECT freq, list_filter(string_split(seq, '~'), x -> x <> '') AS syms
  FROM seq1
), p2 AS (
  SELECT syms[i] AS l, syms[i+1] AS r, sum(freq) AS cnt
  FROM (SELECT freq, syms, unnest(generate_series(1, len(syms)-1)) AS i
        FROM s2 WHERE len(syms) >= 2)
  GROUP BY 1, 2
), b2 AS (
  SELECT l, r FROM p2 ORDER BY cnt DESC, l ASC, r ASC LIMIT 1
), wocc AS (
  SELECT {group_col}, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
  FROM documents
), wseq AS (
  SELECT {group_col}, length(w) AS nb,
         '~~' || array_to_string(regexp_split_to_array(w, ''), '~~') || '~~'
           AS seq
  FROM wocc
), ap1 AS (
  SELECT {group_col}, nb,
         replace(seq,
                 '~' || (SELECT l FROM b1) || '~~' || (SELECT r FROM b1) || '~',
                 '~' || (SELECT l FROM b1) || (SELECT r FROM b1) || '~') AS seq
  FROM wseq
), ap2 AS (
  SELECT {group_col}, nb,
         replace(seq,
                 '~' || (SELECT l FROM b2) || '~~' || (SELECT r FROM b2) || '~',
                 '~' || (SELECT l FROM b2) || (SELECT r FROM b2) || '~') AS seq
  FROM ap1
)"""


def bpe_apply_compression_oracle_sql() -> str:
    """Unrolls learn (the b1/b2 CTEs of the learning oracle) AND apply."""
    return _bpe_learn_apply_ctes("source") + """
SELECT source,
       CAST(sum(nb) AS BIGINT) AS symbols_before,
       CAST(sum(len(list_filter(string_split(seq, '~'), x -> x <> '')))
            AS BIGINT) AS symbols_after,
       CAST((sum(nb) - sum(len(list_filter(string_split(seq, '~'),
                                           x -> x <> '')))) * 1000
            // sum(nb) AS BIGINT) AS saved_permille
FROM ap2 GROUP BY source ORDER BY source
"""


def bpe_fertility_by_lang(docs: DataFrame, rounds: int = 2) -> DataFrame:
    """Tokenizer-equity audit (r12): a BPE vocabulary learned on the WHOLE
    corpus encodes different languages with different FERTILITY (symbols
    per word) — over-segmented languages pay more sequence length per
    unit of content, skewing both cost and effective mixture weights.
    Reports, per lang: word occurrences, raw chars, encoded symbols,
    fertility in exact milli symbols-per-word, and milli chars-per-symbol.

    Scale shape: identical to :func:`bpe_apply_compression` — the merge
    table is ``rounds`` driver rows folded into codegen'd replace
    expressions; encoding is a narrow map over the exploded word stream;
    one map-side-combined per-lang rollup."""
    merges = [
        (row["l"], row["r"])
        for row in bpe_learn_merges(docs, rounds=rounds).collect()
    ]
    words = docs.select(
        "lang",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("w"),
    )
    chars = F.filter(F.split("w", ""), lambda x: x != "")
    seq = F.concat(F.lit(SEP), F.array_join(chars, SEP), F.lit(SEP))
    for l, r in merges:
        seq = F.replace(seq, F.lit(f"~{l}{SEP}{r}~"), F.lit(f"~{l}{r}~"))
    enc = words.select(
        "lang",
        F.length("w").cast("bigint").alias("nb"),
        F.size(F.filter(F.split(seq, "~"), lambda x: x != ""))
        .cast("bigint")
        .alias("na"),
    )
    return (
        enc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("nb").alias("n_chars"),
            F.sum("na").alias("n_symbols"),
        )
        .select(
            "lang",
            "n_words",
            "n_chars",
            "n_symbols",
            F.expr(
                "CAST(CASE WHEN n_words > 0"
                " THEN n_symbols * 1000 DIV n_words ELSE 0 END AS BIGINT)"
            ).alias("fertility_milli"),
            F.expr(
                "CAST(CASE WHEN n_symbols > 0"
                " THEN n_chars * 1000 DIV n_symbols ELSE 0 END AS BIGINT)"
            ).alias("chars_per_symbol_milli"),
        )
        .orderBy("lang")
    )


def bpe_fertility_by_lang_oracle_sql() -> str:
    return _bpe_learn_apply_ctes("lang") + """
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(nb) AS BIGINT) AS n_chars,
       CAST(sum(len(list_filter(string_split(seq, '~'), x -> x <> '')))
            AS BIGINT) AS n_symbols,
       CAST(CASE WHEN count(*) > 0
                 THEN sum(len(list_filter(string_split(seq, '~'),
                                          x -> x <> ''))) * 1000 // count(*)
                 ELSE 0 END AS BIGINT) AS fertility_milli,
       CAST(CASE WHEN sum(len(list_filter(string_split(seq, '~'),
                                          x -> x <> ''))) > 0
                 THEN sum(nb) * 1000
                      // sum(len(list_filter(string_split(seq, '~'),
                                             x -> x <> '')))
                 ELSE 0 END AS BIGINT) AS chars_per_symbol_milli
FROM ap2 GROUP BY lang ORDER BY lang
"""

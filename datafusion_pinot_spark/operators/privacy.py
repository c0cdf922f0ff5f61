"""PII detection / redaction for LLM training-data curation.

Pure built-in column expressions (``regexp_extract_all`` for detection,
chained ``regexp_replace`` for masking) — JVM-side, codegen'd, zero Python
in the hot path, so the operator is an embarrassingly parallel narrow map
that scales linearly with executors at 100 TB.

The patterns use only syntax shared by Java regex (Spark) and RE2
(DuckDB, re2-based scanners generally): character classes, bounded
repetition, non-capturing groups, ``\\b`` — no backreferences or
lookaround, which RE2 rejects. Redaction is applied in the caller-given
kind order, each pass over the output of the previous one, so a broader
later pattern (e.g. ``number``) cannot eat the inside of an already
masked narrower match (e.g. the digits of an ``email`` local part).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Detection patterns, deliberately conservative (low false-positive) —
# a production pipeline would layer checksummed validators (Luhn etc.)
# behind these prefilters.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    "phone": (r"\+[0-9][0-9() \-]{6,}[0-9]", "<PHONE>"),
    "number": (r"[0-9]{2,}", "<NUM>"),
}


def pii_redact(
    df: DataFrame,
    col: str,
    kinds: tuple[str, ...] = ("email", "ipv4", "number"),
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Per-row PII counts (on the ORIGINAL text, one column per kind) plus
    the redacted text with every kind masked in ``kinds`` order."""
    out = df.select(
        *[F.col(c) for c in keep],
        *[
            F.size(F.regexp_extract_all(col, F.lit(PII_PATTERNS[k][0]), 0))
            .cast("long")
            .alias(f"n_{k}")
            for k in kinds
        ],
        F.col(col).alias("redacted"),
    )
    for k in kinds:
        pat, token = PII_PATTERNS[k]
        out = out.withColumn("redacted", F.regexp_replace("redacted", pat, token))
    return out


def pii_redact_oracle_sql(
    table: str,
    col: str,
    kinds: tuple[str, ...] = ("email", "ipv4", "number"),
    keep: tuple[str, ...] = (),
) -> str:
    counts = ",\n       ".join(
        "CAST(len(regexp_extract_all({c}, '{p}')) AS BIGINT) AS n_{k}".format(
            c=col, p=PII_PATTERNS[k][0].replace("'", "''"), k=k
        )
        for k in kinds
    )
    redacted = col
    for k in kinds:
        pat, token = PII_PATTERNS[k]
        redacted = "regexp_replace({r}, '{p}', '{t}', 'g')".format(
            r=redacted, p=pat.replace("'", "''"), t=token
        )
    keep_cols = "".join(f"{c}, " for c in keep)
    return (
        f"SELECT {keep_cols}{counts},\n       {redacted} AS redacted\n"
        f"FROM {table}"
    )

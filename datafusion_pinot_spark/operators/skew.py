"""Skew-mitigation join: explicit key salting.

The reference never joins (SURVEY.md §2.3), so this is pure beyond-parity
scale tooling: when one join key is hot (a viral document id, a default
user id, a null-ish sentinel), a plain shuffle join sends the whole hot key
to ONE reducer and the stage runs at the speed of that task. AQE's skew-join
splitting (``spark.sql.adaptive.skewJoin``) handles sort-merge joins
automatically; explicit salting is the portable fallback and the only option
when the skewed side feeds a non-SMJ plan (or when AQE is disabled — e.g.
inside foreachBatch micro-batches).

Mechanics: the big (skewed) side gets a uniform random-ish salt in
``[0, factor)`` derived deterministically from unrelated columns (so reruns
are stable); the small side is replicated ``factor`` times via an exploded
literal range. The join key becomes ``(key, salt)`` — the hot key now spreads
over ``factor`` reducers. Semantics are identical to the unsalted join
(verified by the DuckDB oracle, which runs the PLAIN join): every big-side
row still matches exactly the same small-side rows, each exactly once.

Cost model at 100 TB: replicating the small side multiplies its shuffle
volume by ``factor`` — use only when ``small × factor`` stays, well, small;
for broadcast-able small sides prefer ``F.broadcast`` (no shuffle at all,
no skew possible). Salting pays when BOTH sides are too big to broadcast and
the key histogram is heavy-tailed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Inner/left join ``big ⋈ small`` on column ``on`` with the big side
    salted across ``factor`` sub-keys. Output columns = big's then small's
    (minus the duplicate key), exactly like ``big.join(small, on, how)``."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins")
    # Deterministic pseudo-uniform salt: hash the whole big-side row. Using
    # pmod(hash(*cols)) keeps it stable across retries (rand() is not).
    salt = F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(factor))
    big_s = big.withColumn(SALT_COL, salt)
    small_s = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
    )
    out_cols = big.columns + [c for c in small.columns if c != on]
    return big_s.join(small_s, [on, SALT_COL], how).select(*out_cols)

"""Star-tree-style pre-aggregation companion segments.

Pinot's star-tree index pre-aggregates metrics along a configured
dimension split order so group-by/filter queries over those dimensions
read a few aggregated records instead of the raw docs; the reference
explicitly does not support it (README.md:311-315). This module is a
simplified, honestly-scoped take on the same idea — a PREFIX-LEVEL
star-tree:

For ``dims = [d0, d1, ..., dn-1]`` and ``metrics = {m: fn}``, the
companion holds one aggregated row group per prefix level k (0..n):

- level n: group by ALL dims (the plain rollup)
- level k < n: group by dims[0..k), dims[k..) replaced by the star
  marker ``*`` — exactly Pinot's star-node records for the split order

A query that groups by a prefix dims[0..k) (with no filter on the
starred dims) is answered from the level-k rows alone: ``count(level-k
rows) == product of prefix cardinalities`` instead of total docs.
Unlike Pinot this builds only the split-order prefixes, not the full
tree of mid-level star branches — the deviation is documented here and
in COVERAGE.md, and non-prefix groupings simply fall back to the fact
segments.

The companion is a NORMAL v3 segment (dims as STRING with the ``*``
marker to keep one column type per level mix, metrics as DOUBLE/LONG
sums plus a ``__count`` long), written beside the fact segments in a
``{table}__startree_OFFLINE`` table, so every existing reader/index
feature applies to it. ``__level`` marks the prefix length for exact
level selection.
"""

from __future__ import annotations

STAR = "*"
LEVEL_COL = "__level"
COUNT_COL = "__count"

_AGGS = ("sum", "min", "max")


def validate_config(dims: list[str], metrics: dict[str, str]) -> None:
    if not dims:
        raise ValueError("star-tree needs at least one dimension")
    for m, fn in metrics.items():
        if fn not in _AGGS:
            raise ValueError(
                f"star-tree metric '{m}': unsupported agg '{fn}' "
                f"(supported: {_AGGS})"
            )
    overlap = set(dims) & set(metrics)
    if overlap:
        raise ValueError(f"columns cannot be both dim and metric: {overlap}")


def companion_table_dir(table_dir: str) -> str:
    base = table_dir.rstrip("/")
    for suffix in ("_OFFLINE", "_REALTIME"):
        if base.endswith(suffix):
            return base[: -len(suffix)] + "__startree_OFFLINE"
    return base + "__startree_OFFLINE"

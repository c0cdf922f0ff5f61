"""Repo-wide bare-window inventory (r13 verdict #4).

Walks every registered query's physical plan at a given sf dir and prints,
per query, the ORDER-column signature of each WindowExec that has NO
partition columns (the all-to-one funnel shape). tests/test_plans.py pins
the output of this scan against the allow-list of documented bounded
frames — a new data-scaled bare window anywhere in the catalog fails the
suite.

Usage: python tools/window_lint.py [sf_dir] [query ...]
"""

import re
import sys


def _balanced(s: str, open_idx: int) -> str:
    """Contents of the parenthesized group whose '(' is at open_idx."""
    depth = 0
    for j in range(open_idx, len(s)):
        if s[j] == "(":
            depth += 1
        elif s[j] == ")":
            depth -= 1
            if depth == 0:
                return s[open_idx + 1 : j]
    return s[open_idx + 1 :]


def _split_top(args: str) -> list:
    parts, depth, cur = [], 0, []
    for ch in args:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return parts


_EXPR_ID = re.compile(r"#\d+L?")


def _norm_order(part: str) -> str:
    """'day#123L ASC NULLS FIRST' -> 'day ASC'; strips expr ids + null
    ordering so the signature is stable across plan runs."""
    p = _EXPR_ID.sub("", part)
    p = p.replace(" NULLS FIRST", "").replace(" NULLS LAST", "")
    return " ".join(p.split())


def bare_window_sigs(plan: str) -> set:
    """Signatures (comma-joined normalized order specs) of every
    windowspecdefinition in the plan that lists NO partition columns."""
    sigs = set()
    for m in re.finditer(r"windowspecdefinition\(", plan):
        parts = _split_top(_balanced(plan, m.end() - 1))
        n_part = 0
        for p in parts:
            if " ASC" in p or " DESC" in p or p.startswith(
                "specifiedwindowframe"
            ):
                break
            n_part += 1
        if n_part == 0:
            order = [p for p in parts if " ASC" in p or " DESC" in p]
            sigs.add(",".join(_norm_order(o) for o in order))
    return sigs


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df.
        _jdf.queryExecution(), "formatted"
    )


def scan(spark, sf_dir: str, names=None) -> dict:
    """{query_name: sorted bare-window signatures} for every registered
    query that has any; queries whose builder raises are reported with an
    '!error' pseudo-signature so the caller notices."""
    from datafusion_pinot_spark.plans import QUERIES

    out = {}
    for name in names or sorted(QUERIES):
        try:
            sigs = bare_window_sigs(_plan(QUERIES[name].fn(spark, sf_dir)))
        except Exception as exc:  # surface, never skip silently
            out[name] = [f"!error: {type(exc).__name__}: {exc}"[:200]]
            continue
        if sigs:
            out[name] = sorted(sigs)
    return out


if __name__ == "__main__":
    from datafusion_pinot_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or None
    spark = get_spark(app_name="window_lint", cpus=8, shuffle_partitions=8)
    # plan strings must not truncate windowspecdefinition's argument list —
    # a truncated partition-column list would misread as a bare window
    spark.conf.set("spark.sql.debug.maxToStringFields", "100000")
    for q, sigs in scan(spark, sf, names).items():
        for s in sigs:
            print(f"{q}\t{s}")

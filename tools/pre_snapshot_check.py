"""End-of-round commit gate (r7 verdict #8): the minimum validation any
snapshot commit must pass, runnable in about a minute.

1. `tests/test_oracle_types.py` — static DuckDB-side dtype check over every
   registered oracle (catches the HUGEINT/int32 cross-engine class that
   broke rounds 1, 3 and 7 — seconds, no Spark).
2. `tools/oracle_check.py` at sf0.001 for the queries named on the command
   line, or — with no args — every query whose registering file changed
   since the given base commit (default: the last round-boundary commit,
   found by the "round N:" message prefix the driver uses).

Usage:
    python tools/pre_snapshot_check.py [query ...]
    python tools/pre_snapshot_check.py --since <commit>

Exit 0 = safe to snapshot. Anything else: fix before committing — wrong
answers in the tree are worse than fewer queries.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _changed_files(since: str) -> list[str]:
    out = subprocess.run(
        ["git", "diff", "--name-only", f"{since}..HEAD", "--", "*.py"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.split()
    staged = subprocess.run(
        ["git", "diff", "--name-only", "--cached", "--", "*.py"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.split()
    unstaged = subprocess.run(
        ["git", "diff", "--name-only", "--", "*.py"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.split()
    return sorted(set(out) | set(staged) | set(unstaged))


def _last_round_boundary() -> str:
    log = subprocess.run(
        ["git", "log", "--format=%H %s", "-200"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.splitlines()
    for line in log[1:]:  # skip HEAD itself
        sha, _, msg = line.partition(" ")
        if re.match(r"round \d+:", msg):
            return sha
    return log[-1].split()[0]


def _queries_touching(files: list[str]) -> list[str]:
    """Registered query names whose defining file (queries.py) or whose
    operator module changed. Conservative: a change to queries.py alone
    maps to the queries whose registration block the diff touches."""
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    names = list(entry.queries())
    touched = set()
    qfile = "datafusion_pinot_spark/plans/queries.py"
    mods = [f for f in files if f.startswith("datafusion_pinot_spark/operators/")]
    if mods:
        # map operator-module changes to queries importing that module
        src = open(os.path.join(REPO, qfile)).read()
        blocks = re.split(r"\n@register\(", src)
        for b in blocks[1:]:
            m = re.match(r'\s*"([^"]+)"', b)
            if not m or m.group(1) not in names:
                continue
            for f in mods:
                mod = os.path.splitext(os.path.basename(f))[0]
                if f"operators.{mod}" in b or f"operators import {mod}" in b:
                    touched.add(m.group(1))
    if qfile in files:
        diff = subprocess.run(
            ["git", "diff", "HEAD", "--unified=0", "--", qfile],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout
        for m in re.finditer(r'^\+\s*"([a-z0-9_]+)",', diff, re.M):
            if m.group(1) in names:
                touched.add(m.group(1))
    return sorted(touched)


def main() -> int:
    args = sys.argv[1:]
    since = None
    if args[:1] == ["--since"]:
        since = args[1]
        args = args[2:]
    queries = args
    print("== gate 1/2: oracle dtype guard (static, no Spark) ==", flush=True)
    rc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_oracle_types.py", "-q"],
        cwd=REPO,
    ).returncode
    if rc != 0:
        print("GATE FAILED: oracle dtype guard red — fix before snapshot")
        return rc
    if not queries:
        base = since or _last_round_boundary()
        files = _changed_files(base)
        queries = _queries_touching(files)
        print(f"(queries touched since {base[:10]}: {queries or 'none'})")
    if not queries:
        print("== gate 2/2: no touched queries — done ==")
        return 0
    print(f"== gate 2/2: oracle check at sf0.001 for {len(queries)} ==",
          flush=True)
    return subprocess.run(
        [sys.executable, "tools/oracle_check.py", "/root/testdata/sf0.001",
         *queries],
        cwd=REPO,
    ).returncode


if __name__ == "__main__":
    raise SystemExit(main())

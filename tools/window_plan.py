"""Driver-window rotation planner: green-count bookkeeping the rotation
rules run on, computed instead of hand-tallied.

Reads every CORRECTNESS_r*.json plus the current DRIVER_WINDOW and
prints, per window query, its driver-green count and rounds — then the
rotation plan for next round under the standing rules:

- queries green in EVERY round they were checked AND checked >= 2 times
  ("twice-green-or-better") are rotation CANDIDATES, most-green first;
- once-green or never-checked entries MUST stay (second-check rule);
- never-window-checked registrations are listed for reference — NOTE
  this includes deliberate pytest-tier deferrals (rows-only queries,
  subsumed siblings, the halflife cells diagnostic), so the TRUE
  first-check backlog is the round's new registrations as documented
  atop DRIVER_WINDOW, not this whole list.

Usage: python tools/window_plan.py [--json]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def green_history() -> dict[str, list[tuple[str, bool]]]:
    """{query: [(round, green)]} across all CORRECTNESS_r*.json."""
    hist: dict[str, list[tuple[str, bool]]] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = f.split("_r")[1].split(".")[0]
        try:
            d = json.load(open(f))
        except (OSError, json.JSONDecodeError):
            continue
        for name, v in d.items():
            green = (
                isinstance(v, dict)
                and v.get("err") is None
                and bool(v.get("rows_match"))
                # schema/hash may be absent (rows-only checks) — absent
                # passes, an explicit false (type-class red) does not
                and v.get("schema_match") in (True, None)
                and v.get("hash_match") in (True, None)
            )
            hist.setdefault(name, []).append((rnd, green))
    return hist


def window_names() -> list[str]:
    src = open(
        os.path.join(REPO, "datafusion_pinot_spark", "plans", "queries.py")
    ).read()
    m = re.search(r"DRIVER_WINDOW: list\[str\] = \[(.*?)\n\]", src, re.S)
    return re.findall(r'^\s*"([a-z0-9_]+)",', m.group(1), re.M)


def registered_names() -> list[str]:
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    return list(entry.queries())


def main() -> int:
    hist = green_history()
    window = window_names()
    registered = registered_names()

    rows = []
    for name in window:
        checks = hist.get(name, [])
        greens = [r for r, ok in checks if ok]
        reds = [r for r, ok in checks if not ok]
        rows.append(
            {
                "query": name,
                "greens": len(greens),
                "green_rounds": greens,
                "red_rounds": reds,
            }
        )
    candidates = sorted(
        (r for r in rows if r["greens"] >= 2 and not r["red_rounds"]),
        key=lambda r: -r["greens"],
    )
    must_stay = [r for r in rows if r["greens"] < 2 or r["red_rounds"]]
    never_checked = [
        n for n in registered if n not in window and n not in hist
    ]

    if "--json" in sys.argv:
        print(
            json.dumps(
                {
                    "window": rows,
                    "rotation_candidates": [r["query"] for r in candidates],
                    "must_stay": [r["query"] for r in must_stay],
                    "never_window_checked": never_checked,
                },
                indent=1,
            )
        )
        return 0

    print(f"window: {len(window)} queries\n")
    for r in rows:
        flag = "STAY " if r in must_stay else "rot? "
        reds = f" RED:{r['red_rounds']}" if r["red_rounds"] else ""
        print(
            f"{flag}{r['query']}: {r['greens']}x green "
            f"{r['green_rounds']}{reds}"
        )
    print(f"\nrotation candidates (most-green first, {len(candidates)}):")
    for r in candidates:
        print(f"  {r['query']} ({r['greens']}x)")
    print(
        f"\nnever window-checked ({len(never_checked)}; includes deliberate"
        " pytest-tier deferrals — the true backlog is documented atop"
        " DRIVER_WINDOW):"
    )
    for n in never_checked:
        print(f"  {n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""A/B the compaction Arrow text path (r14) vs the historical list path.

Interleaved within one process (the only honest comparison on this host —
see OPTIMIZATION_r14.md "machine health"): each round runs list-then-Arrow
on identical inputs, so episodic page-fault storms inflate both sides.

Shapes (VERDICT r14 item 4's recipe):
- merge: 3 x 200k-row string-heavy members
- filter: clustered delete (keep one contiguous 25% span) — exercises the
  chunk-selective RAW decode (chunks with no kept doc never LZ4-decompress)

Usage: python tools/compact_ab.py [rounds]
"""

import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pinot_segment import compact  # noqa: E402
from pinot_segment.compact import filter_segment, merge_segments  # noqa: E402
from pinot_segment.metadata import DataType  # noqa: E402
from pinot_segment.writer import ColumnSpec, write_segment  # noqa: E402


def build_members(base: str, n_members: int = 3, n: int = 200_000):
    rng = np.random.default_rng(42)
    dirs = []
    for m in range(n_members):
        k = rng.integers(0, 10_000_000, size=n)
        dict_s = [f"cat-{v}" for v in rng.integers(0, 500, size=n)]
        raw_s = [
            f"payload-{m}-{i}-" + "x" * int(rng.integers(20, 120))
            for i in range(n)
        ]
        v3 = write_segment(
            f"{base}/m{m}",
            f"seg_{m}",
            "t",
            [
                ColumnSpec("k", DataType.LONG, k),
                ColumnSpec("cat", DataType.STRING, dict_s, inverted=True),
                ColumnSpec("payload", DataType.STRING, raw_s, raw=True),
            ],
        )
        dirs.append(str(v3))
    return dirs


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    base = tempfile.mkdtemp(prefix="cab_")
    try:
        members = build_members(base)
        n_total = 600_000
        keep = np.zeros(n_total, dtype=bool)
        keep[150_000:300_000] = True  # clustered delete: keep one span

        res: dict = {}
        merged_for_filter = merge_segments(
            members, f"{base}/mf", "seg_mf", "t"
        )
        for r in range(rounds):
            for arrow in (False, True):
                compact._ARROW_TEXT = arrow
                tag = "arrow" if arrow else "list"
                t0 = time.perf_counter()
                merge_segments(members, f"{base}/out_{tag}", "seg_o", "t")
                res.setdefault(f"merge_{tag}", []).append(
                    time.perf_counter() - t0
                )
                t0 = time.perf_counter()
                filter_segment(
                    str(merged_for_filter),
                    f"{base}/f_{tag}",
                    "seg_f",
                    "t",
                    keep,
                )
                res.setdefault(f"filter_{tag}", []).append(
                    time.perf_counter() - t0
                )
        compact._ARROW_TEXT = True
        for op in ("merge", "filter"):
            a = min(res[f"{op}_arrow"])
            l = min(res[f"{op}_list"])
            print(
                f"{op}: list min={l:.3f}s arrow min={a:.3f}s "
                f"speedup={l / a:.2f}x  "
                f"(all list={['%.2f' % x for x in res[f'{op}_list']]}, "
                f"arrow={['%.2f' % x for x in res[f'{op}_arrow']]})"
            )
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()

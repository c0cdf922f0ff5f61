"""Offline profile of write_segment with the bench's pinot_write_segments
column shape (r14 optimization targeting). No Spark needed."""

import cProfile
import io
import pstats
import shutil
import sys
import tempfile
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, ".")
from pinot_segment.metadata import DataType  # noqa: E402
from pinot_segment.writer import ColumnSpec, write_segment  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 75_000
USE_ARROW = "--list" not in sys.argv

rng = np.random.default_rng(42)
okeys = rng.integers(1, 600_000, size=N)
pkeys = rng.integers(1, 200_000, size=N)
price = rng.uniform(900.0, 105_000.0, size=N)
flags = np.array(["A", "N", "R"])[rng.integers(0, 3, size=N)]
okey_str = [f"order-{o}-{p}" for o, p in zip(okeys, pkeys)]
ts = okeys * 60_000


def specs():
    s = pa.array(okey_str) if USE_ARROW else list(okey_str)
    f = pa.array(list(flags)) if USE_ARROW else list(flags)
    t = pa.array(list(flags)) if USE_ARROW else list(flags)
    return [
        ColumnSpec("l_orderkey", DataType.LONG, okeys),
        ColumnSpec("l_partkey", DataType.LONG, pkeys),
        ColumnSpec("l_extendedprice", DataType.DOUBLE, price),
        ColumnSpec("flag", DataType.STRING, f),
        ColumnSpec("okey", DataType.STRING, s, raw=True),
        ColumnSpec("ts", DataType.TIMESTAMP, list(ts), raw=True),
        ColumnSpec("tag", DataType.STRING, t),
    ]


d = tempfile.mkdtemp(prefix="wprof_")
try:
    # warm
    write_segment(f"{d}/warm", "s0", "t", specs())
    t0 = time.time()
    write_segment(f"{d}/t1", "s1", "t", specs())
    wall = time.time() - t0
    print(f"rows={N} arrow={USE_ARROW} wall={wall:.3f}s")

    pr = cProfile.Profile()
    cols = specs()
    pr.enable()
    write_segment(f"{d}/t2", "s2", "t", cols)
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
    print(s.getvalue())
finally:
    shutil.rmtree(d, ignore_errors=True)

"""Launch bench.py only when the host is healthy.

This sandbox class shows episodic 100-1000x stalls on first-touch page
faults (fresh guest memory) that inflate every timed number. Gate: fork
latency + fresh-allocation touch + a fixed numpy unpack must all be inside
healthy bands, twice in a row, before the bench launches.

Usage: python tools/bench_when_healthy.py [max_wait_min]
"""

import os
import subprocess
import sys
import time

import numpy as np


def probe() -> dict:
    t0 = time.time()
    for _ in range(10):
        pid = os.fork()
        if pid == 0:
            os._exit(0)
        os.waitpid(pid, 0)
    fork_s = time.time() - t0

    t0 = time.time()
    a = np.empty(80_000_000, dtype=np.uint8)
    a[::4096] = 1  # touch every page
    alloc_s = time.time() - t0
    del a

    rng = np.random.RandomState(42)
    packed = np.packbits(rng.randint(0, 2, 1_000_000).astype(np.uint8))
    t0 = time.time()
    for _ in range(20):
        np.unpackbits(packed)
    unpack_s = time.time() - t0
    return {"fork": fork_s, "alloc": alloc_s, "unpack": unpack_s}


def healthy(p: dict) -> bool:
    return p["fork"] < 0.3 and p["alloc"] < 0.3 and p["unpack"] < 0.3


def main() -> None:
    max_wait = float(sys.argv[1]) if len(sys.argv) > 1 else 90
    deadline = time.time() + max_wait * 60
    streak = 0
    while time.time() < deadline:
        p = probe()
        ok = healthy(p)
        print(
            f"[{time.strftime('%H:%M:%S')}] fork={p['fork']:.3f} "
            f"alloc={p['alloc']:.3f} unpack={p['unpack']:.3f} -> "
            f"{'HEALTHY' if ok else 'sick'}",
            flush=True,
        )
        streak = streak + 1 if ok else 0
        if streak >= 2:
            break
        time.sleep(60)
    else:
        print("gave up waiting for health; running anyway", flush=True)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rc = subprocess.call([sys.executable, os.path.join(repo, "bench.py")])
    print(f"bench rc={rc}", flush=True)


if __name__ == "__main__":
    main()

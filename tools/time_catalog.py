"""Time every registered query at a given SF in one shared session,
separating DataFrame BUILD time (driver-side plan construction, py4j
round-trips, lazy localCheckpoint planning) from EXECUTION time (noop sink).

Usage: python tools/time_catalog.py [sf_dir] [out_json] [query ...]

Build time matters because composite operators (LSH dedup, recall curves,
storage lifecycles) spend driver seconds constructing/optimizing plans that
execution then finishes in less time — the oracle gate and any driver
sweep pay both.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    out_path = argv[1] if len(argv) > 1 else "/tmp/catalog_times.json"
    only = set(argv[2:])

    from datafusion_pinot_spark.plans.queries import ordered_queries
    from datafusion_pinot_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="time_catalog", cpus=cpus, shuffle_partitions=cpus)

    out: dict[str, dict] = {}
    for name, qdef in ordered_queries().items():
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"time_catalog: {name}")
        t0 = time.perf_counter()
        try:
            df = qdef.fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
        except Exception as e:
            out[name] = {"err": str(e)[:200]}
            print(f"ERR  {name}: {e}", flush=True)
            continue
        out[name] = {
            "build_s": round(t1 - t0, 3),
            "exec_s": round(t2 - t1, 3),
            "total_s": round(t2 - t0, 3),
        }
        print(
            f"ok   {name}: build {t1-t0:.2f}s exec {t2-t1:.2f}s",
            flush=True,
        )
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    totals = sorted(
        ((v.get("total_s", 0), k) for k, v in out.items()), reverse=True
    )
    print("\nslowest 25:")
    for s, k in totals[:25]:
        print(f"  {s:8.2f}s  {k}  (build {out[k].get('build_s')}s)")
    print(f"\ntotal: {sum(s for s, _ in totals):.1f}s over {len(out)} queries")


if __name__ == "__main__":
    main()

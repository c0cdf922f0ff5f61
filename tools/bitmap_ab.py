"""A/B the r14 codegen bitmap-distinct path vs fullscan count_distinct.

VERDICT r14 item 5: the bitmap_distinct_sum rewrite (two integer ops per
row + map-side bit_or partial agg, segment_distinct.py) is structurally
sound but had no measured comparison. This interleaves the two strategies
on one RAW numeric column (the shape where the router's auto tier falls
back to global_distinct, so forcing bitmap is the real decision) within a
single Spark session, 5 rounds, min-of-runs.

Usage: python tools/bitmap_ab.py [n_rows] [domain]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    domain = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000

    from pyspark.sql import functions as F

    from datafusion_pinot_spark.operators.segment_distinct import (
        bitmap_distinct_sum,
        distinct_count,
    )
    from datafusion_pinot_spark.session import get_spark
    from datafusion_pinot_spark.sources import register_pinot_source

    spark = get_spark(app_name="bitmap_ab")
    register_pinot_source(spark)
    d = os.path.join(tempfile.mkdtemp(prefix="bab_"), "t_OFFLINE")
    (
        spark.range(0, n, 1, 8)
        .select(
            F.col("id").alias("k"),
            # multiplicative scramble keeps values unsorted so zone maps
            # cannot shortcut either side; domain is exactly [0, domain)
            ((F.col("id") * 2654435761) % domain).alias("v"),
        )
        .write.format("pinot")
        .mode("overwrite")
        .option("raw", "v,k")
        .save(d)
    )
    df = spark.read.format("pinot").load(d)

    def run_bitmap() -> int:
        return bitmap_distinct_sum(df, "v", 0, domain - 1).collect()[0][0]

    def run_fullscan() -> int:
        return df.agg(
            F.count_distinct(F.col("v")).alias("n")
        ).collect()[0][0]

    assert run_bitmap() == run_fullscan()  # warm + correctness
    res: dict = {"bitmap": [], "fullscan": []}
    for _ in range(5):
        for name, fn in (("bitmap", run_bitmap), ("fullscan", run_fullscan)):
            t0 = time.perf_counter()
            fn()
            res[name].append(time.perf_counter() - t0)
    b, f = min(res["bitmap"]), min(res["fullscan"])
    print(
        f"rows={n} domain={domain}: bitmap min={b:.3f}s fullscan min={f:.3f}s "
        f"speedup={f / b:.2f}x"
    )
    print(
        "  all:",
        {k: ["%.2f" % x for x in v] for k, v in res.items()},
    )
    # router check: what auto picks on this raw column
    _, method = distinct_count(spark, d, "v")
    print(f"  auto method on raw column: {method}")


if __name__ == "__main__":
    main()

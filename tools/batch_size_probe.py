"""A/B the pinot reader's Arrow batch size through the real Spark path.

Writes a pinned 2M-row pinot table once (same shape as bench.py's
calibration pinot_e2e probe), then times a sum/min/max scan with the
datasource's BATCH_ROWS monkeypatched to each candidate size.

Usage: python tools/batch_size_probe.py [sizes...]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [8192, 32768, 131072]

    from pyspark.sql import functions as F

    from datafusion_pinot_spark.session import get_spark
    from datafusion_pinot_spark.sources import pinot_datasource, register_pinot_source

    spark = get_spark(app_name="batch_size_probe")
    register_pinot_source(spark)

    # r15: self-condition like bench.py — absorb the host's first-touch
    # page-fault storm in untimed setup so the interleaved rounds compare
    # warm-memory execution, and report the conditioning outcome so a
    # still-degraded run is self-flagging.
    from bench import condition_memory

    cond = condition_memory(spark, int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    print(f"conditioning: {cond}")
    d = os.path.join(tempfile.mkdtemp(prefix="bsp_"), "p_OFFLINE")
    (
        spark.range(0, int(os.environ.get("BSP_ROWS", "2000000")), 1, 8)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 1000).cast("int").alias("dim"),
            (F.col("id") * 7 % 99991).alias("v"),
            F.concat(F.lit("row-"), F.col("id")).alias("s"),
        )
        .write.format("pinot")
        .mode("overwrite")
        .option("raw", "s")
        .save(d)
    )

    def probe(agg: bool) -> float:
        df = spark.read.format("pinot").load(d)
        if agg:
            df.selectExpr("sum(v)", "min(dim)", "max(k)").collect()
            return 0.0
        t0 = time.time()
        df.selectExpr("sum(v)", "min(dim)", "max(k)", "max(s)").collect()
        return time.time() - t0

    rounds = int(os.environ.get("BSP_ROUNDS", "7"))
    results: dict[int, list[float]] = {s: [] for s in sizes}
    probe(True)  # warm workers
    for _round in range(rounds):
        for s in sizes:
            pinot_datasource.BATCH_ROWS = s
            results[s].append(probe(False))
    for s in sizes:
        ts = sorted(results[s])
        print(
            f"BATCH_ROWS={s:7d}: min={ts[0]:.3f}s med={ts[len(ts)//2]:.3f}s "
            f"all={['%.2f' % x for x in results[s]]}"
        )


if __name__ == "__main__":
    main()

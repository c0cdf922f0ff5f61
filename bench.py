"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line with per-query seconds.

Query set = the seven reference benchmark shapes (BASELINE.md) translated to
lineitem, plus representative heavier operators (TPC-H Q1, 5-way join,
window top-k, MinHash-LSH dedup, ANN top-k, tumbling windows, sessionization).

Timing is end-to-end per query: plan construction + execution + result
materialization via a noop sink (rows fully produced engine-side, no Python
driver transfer — comparable to the reference's in-process collect of Arrow
batches, reference benchmark.rs:24-28).

Methodology: one untimed warmup execution per query, then min of 2 timed
runs. The warmup exists because the reference (Rust, AOT-compiled,
benchmark.rs:39-58) is at steady state from its first run, while the JVM
pays one-time JIT compilation of codegen'd and interpreted expressions on
first execution (measured 4-7x on the HOF-heavy dedup queries). Steady-state
throughput is the meaningful 100 TB proxy — compilation amortizes to zero
there.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    # reference parity (BASELINE.md shapes)
    "count_star",
    "scan_dict_cols",
    "scan_raw_cols",
    "agg_sum_avg_max",
    "groupby_topk",
    "groupby_highcard_topk",
    "projection_limit",
    # relational surface
    "q1_pricing_summary",
    "join_5way_region_revenue",
    "window_topk_per_group",
    "events_tumbling_window",
    "sessionization",
    "salted_join_revenue",
    # LLM-pipeline operators
    "minhash_lsh_pairs",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "multimodal_frame_sample",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def pinot_format_queries(spark, sf_dir: str):
    """The reference's own benchmark surface (benchmark_cases.rs:9-45) over
    actual Pinot v3 segments: lineitem is written to a temp pinot table via
    the sink (itself timed as pinot_write_segments), then the five reference
    query shapes scan it through the pinot data source. This is the direct
    throughput comparison against BASELINE.md — same storage format, same
    query shapes, sf-scaled rows."""
    import tempfile

    from pyspark.sql import functions as F

    from datafusion_pinot_spark.sources import register_pinot_source

    register_pinot_source(spark)
    out = os.path.join(tempfile.mkdtemp(prefix="bench_pinot_"), "li_OFFLINE")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey",
        "l_partkey",
        "l_extendedprice",
        F.col("l_returnflag").alias("flag"),
        F.concat(
            F.lit("order-"), F.col("l_orderkey"), F.lit("-"), F.col("l_partkey")
        ).alias("okey"),
    )

    def write(_):
        li.repartition(8).write.format("pinot").mode("overwrite").option(
            "raw", "okey"
        ).save(out)
        return None

    # Separate range-partitioned table (disjoint l_orderkey zone maps — the
    # realistic key/time-ordered ingest layout) for the pruning query; built
    # once here so the timed pinot_write_segments entry stays the plain
    # hash-partitioned write.
    out_rng = os.path.join(tempfile.mkdtemp(prefix="bench_pinot_rng_"), "li_OFFLINE")
    li.repartitionByRange(8, "l_orderkey").write.format("pinot").mode(
        "overwrite"
    ).option("raw", "okey").save(out_rng)

    df = lambda: spark.read.format("pinot").load(out)  # noqa: E731
    return {
        "pinot_write_segments": write,
        # Empty projection → metadata-only count (no forward-index decode),
        # the same path as the reference's 3.97 ms COUNT(*) (exec.rs:92-95).
        # The Python DS API has no automatic column pruning, so the empty
        # projection is requested explicitly.
        "pinot_count_star": lambda _: spark.read.format("pinot")
        .option("columns", "")
        .load(out)
        .groupBy()
        .count(),
        "pinot_scan_dict_cols": lambda _: df().select(
            "flag", "l_orderkey", "l_extendedprice"
        ),
        "pinot_scan_raw_col": lambda _: df().select("okey"),
        "pinot_agg": lambda _: df().agg(
            F.sum("l_extendedprice"), F.avg("l_partkey"), F.max("l_orderkey")
        ),
        # Selective key-range filter over the range-partitioned segments:
        # the pushed filter's zone-map prune skips ~7 of 8 segments at
        # planning (partitions() drops them — no task, no decode); the one
        # surviving segment applies the residual row mask.
        "pinot_filter_prune": lambda _: spark.read.format("pinot")
        .load(out_rng)
        .filter(F.col("l_orderkey") <= 2000)
        .agg(F.sum("l_extendedprice").alias("s"), F.count("*").alias("n")),
        "pinot_groupby_topk": lambda _: df()
        .groupBy("flag")
        .agg(F.sum("l_extendedprice").alias("s"))
        .orderBy(F.desc("s"))
        .limit(10),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from datafusion_pinot_spark.plans import QUERIES
    from datafusion_pinot_spark.session import get_spark

    spark = get_spark(app_name="bench", cpus=cpus, shuffle_partitions=cpus)

    # warmup: touch the fact table once (file listing + codegen warm)
    QUERIES["count_star"].fn(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        qdef = QUERIES[name]
        materialize(qdef.fn(spark, sf_dir))  # untimed: JIT/codegen warmup
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            materialize(qdef.fn(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    # Pinot-format tier: the reference's benchmark shapes on real segments.
    # The write runs twice (first creates the table, second is the timed
    # overwrite); reads build the DataFrame once (schema resolution, like
    # the parquet tier's cached listing) and time execution min-of-2.
    pinot = pinot_format_queries(spark, sf_dir)
    write = pinot.pop("pinot_write_segments")
    write(spark)
    t0 = time.perf_counter()
    write(spark)
    timings["pinot_write_segments"] = round(time.perf_counter() - t0, 4)
    for name, fn in pinot.items():
        df = fn(spark)
        materialize(df)  # JIT/codegen warmup
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            materialize(df)
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = None
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "bench_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_num,
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()

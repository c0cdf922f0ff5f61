"""Dump .explain("formatted") for the bench's pinot-tier read queries to
plans/<tag>/<query>_<suffix>.txt (the spark-tier capture lives in
capture_plans.py; the pinot tier is built by bench.pinot_format_queries
and not registered in the catalog).

Usage: python tools/capture_pinot_plans.py <tag> <suffix> [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    from bench import pinot_format_queries
    from datafusion_pinot_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="capture_pinot_plans", cpus=cpus, shuffle_partitions=cpus
    )
    (
        table_dir,
        rng_table_dir,
        bloom_table_dir,
        lin2d_table_dir,
        z_table_dir,
        pinot,
    ) = pinot_format_queries(spark, sf_dir)
    write = pinot.pop("pinot_write_segments")
    write(spark)  # create the table so the reads resolve

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    for name, fn in pinot.items():
        try:
            df = fn(spark)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:
            plan = f"ERROR capturing plan: {e}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
    # the write itself: a sink save has no DataFrame plan handle; record
    # the benched pipeline shape instead (scan -> repartition(8) -> sink)
    import inspect

    from bench import pinot_format_queries as pfq  # noqa: F401

    path = os.path.join(out_dir, f"pinot_write_segments_{suffix}.txt")
    with open(path, "w") as f:
        f.write(
            "pinot_write_segments is a sink save (no DataFrame plan "
            "handle):\n  parquet scan(lineitem cols) -> repartition(8) -> "
            "Python data source sink (pinot format)\n  per-task work: "
            "pinot_segment.writer.write_segment — see "
            "OPTIMIZATION_r15.md writer section\n"
        )
    print(f"wrote {path}")


if __name__ == "__main__":
    main()

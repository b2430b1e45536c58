"""Spot 100x scale rows for named queries (the BENCH_NOTES table
harness): runs each query at sf0.1 and at a 100x replica, MV-warm
median of N, and prints the ratio — the per-operator evidence that a
plan term scales with data volume the way its docstring claims.

Usage:
    python tools/scalecheck.py q1 q2 ... [--runs=3] [--dir=/tmp/sfscale100]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(fn, runs: int) -> tuple[float, float]:
    t0 = time.monotonic()
    fn()
    warm = time.monotonic() - t0
    samples = []
    for _ in range(runs):
        t0 = time.monotonic()
        fn()
        samples.append(time.monotonic() - t0)
    return warm, statistics.median(samples)


def main() -> None:
    runs = 3
    big_dir = "/tmp/sfscale100"
    names = []
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
        elif a.startswith("--dir="):
            big_dir = a.split("=", 1)[1]
        else:
            names.append(a)

    from risk_dashboard_database_spark import plans
    from risk_dashboard_database_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    print(f"{'query':28s} {'sf0.1_warm':>10s} {'sf0.1_med':>9s} "
          f"{'100x_warm':>9s} {'100x_med':>8s} {'ratio':>6s}")
    for name in names:
        fn = plans.QUERIES[name]
        bw, bm = timed(lambda: materialize(fn(spark, "/root/testdata/sf0.1")), runs)
        gw, gm = timed(lambda: materialize(fn(spark, big_dir)), runs)
        print(f"{name:28s} {bw:10.2f} {bm:9.2f} {gw:9.2f} {gm:8.2f} "
              f"{gm / bm if bm else float('nan'):6.2f}")


if __name__ == "__main__":
    main()

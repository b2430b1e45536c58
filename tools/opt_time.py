"""Solo query timer for the optimization rounds.

Times named registry queries with the bench's noop-sink methodology
(warm-up + K timed runs), reporting min/median — the MIN is the
robust estimator on a host with bursty CPU steal (this sandbox's
co-tenant; see OPTIMIZATION_r14.md "Measurement protocol").

Usage: python tools/opt_time.py [-k K] [-d SF_DIR] query [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    k = 7
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = []
    it = iter(args)
    for a in it:
        if a == "-k":
            k = int(next(it))
        elif a == "-d":
            sf_dir = next(it)
        else:
            names.append(a)

    from risk_dashboard_database_spark.plans import QUERIES
    from risk_dashboard_database_spark.session import get_spark

    spark = get_spark(app_name="opt_time")
    spark.sparkContext.setLogLevel("ERROR")
    # Same pre-warm as bench.py so numbers are comparable.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def materialize(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    for name in names:
        spark.sparkContext.setJobDescription(f"opt_time: {name}")
        materialize(QUERIES[name](spark, sf_dir))  # warm-up
        times = []
        for _ in range(k):
            t0 = time.perf_counter()
            materialize(QUERIES[name](spark, sf_dir))
            times.append(time.perf_counter() - t0)
        times.sort()
        print(
            f"{name}: min={times[0]:.3f} med={times[len(times) // 2]:.3f} "
            f"max={times[-1]:.3f} runs={[round(t, 3) for t in times]}",
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()

"""Zipf-skew scale study (VERDICT r7 #3 and #5).

The 100x suffix/salt replicas stress volume and duplication but keep
the lang mixture uniform-ish; a real pretraining corpus is
Zipf-skewed. `tools/scaleup.py --mode=zipf` builds a replica with
three deliberate hot spots (94%-dominant doc lang, 90%-hot events
user, 90%-hot lineitem orderkey — see its module docstring). This
harness measures:

Part A — the curation family on the zipf replica vs the same-size
salted (uniform-mixture) replica, MV-warm steady state, median of N:
does any plan term degrade super-linearly when one domain dominates?

Part B — AQE skew-join engagement on j1 (the lineitem<->orders
shuffle now has a 54M-row hot key): broadcast disabled so the join
plans as SMJ, skew thresholds lowered to cluster-equivalent bytes
(a local[32] hot partition is tens of MB where a 1000-executor
cluster's would be GB — the DEFAULT 256MB trigger is calibrated for
the latter), then the executed AQE plan is parsed for the
`skew=true` marker. j4 is measured for contrast: its single-agg
formulation has no fact-fact join to skew — partial aggregation
absorbs the hot user map-side, which is exactly why it was
formulated that way (plans/overrides.py:348).

Usage:
    python tools/skewstudy.py [--runs=3] [--zipf=DIR] [--salt=DIR]
Builds the replicas via tools/scaleup.py first if the dirs are absent.
"""

from __future__ import annotations

import os
import re
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CURATION = [
    "t_lang_id",
    "t_quality_score",
    "t_ngram_docfreq",
    "d1_exact_dedup",
    "d2_minhash_pairs",
    "d13_stratified_sample",
    "d18_temperature_mix",
    "d21_token_budget_mix",
    "d22_epoch_shuffle",
    "d26_kmv_distinct",
    "d27_incremental_neardup",
    "d28_chunk_overlap",
    "d29_split_assign",
    "d30_span_dedup",
    "d31_split_leakage",
    "d17_pretrain_build",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(fn, runs: int) -> tuple[float, float]:
    """(warmup_seconds, median_of_runs). Warm-up pays MV builds."""
    t0 = time.monotonic()
    fn()
    warm = time.monotonic() - t0
    samples = []
    for _ in range(runs):
        t0 = time.monotonic()
        fn()
        samples.append(time.monotonic() - t0)
    return warm, statistics.median(samples)


def ensure_replica(dst: str, mode: str, k: int = 100) -> None:
    if os.path.exists(os.path.join(dst, "documents.parquet")):
        return
    subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "scaleup.py"),
            str(k),
            "/root/testdata/sf0.1",
            dst,
            f"--mode={mode}",
        ],
        check=True,
    )


def main() -> None:
    runs = 3
    zipf_dir = "/tmp/sfscale100-zipf"
    salt_dir = "/tmp/sfscale100-salt-docs"  # docs-only 100x salt (r5 artifact)
    unif_dir = "/tmp/sfscale100"
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
        elif a.startswith("--zipf="):
            zipf_dir = a.split("=", 1)[1]
        elif a.startswith("--salt="):
            salt_dir = a.split("=", 1)[1]
    part = "ab"
    for a in sys.argv[1:]:
        if a.startswith("--part="):
            part = a.split("=", 1)[1]
    ensure_replica(zipf_dir, "zipf")
    ensure_replica(salt_dir, "salt")
    ensure_replica(unif_dir, "suffix")

    from risk_dashboard_database_spark import plans
    from risk_dashboard_database_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    materialize(
        plans.QUERIES["t_lang_id"](spark, "/root/testdata/sf0.1")
    )  # session warm-up

    if "a" in part:
        print("== Part A: curation family, salted(uniform) vs zipf, "
              f"median of {runs} ==")
        print(f"{'query':28s} {'salt_warm':>9s} {'salt_med':>8s} "
              f"{'zipf_warm':>9s} {'zipf_med':>8s} {'ratio':>6s}")
        for name in CURATION:
            fn = plans.QUERIES[name]
            sw, sm = timed(lambda: materialize(fn(spark, salt_dir)), runs)
            zw, zm = timed(lambda: materialize(fn(spark, zipf_dir)), runs)
            print(f"{name:28s} {sw:9.2f} {sm:8.2f} {zw:9.2f} {zm:8.2f} "
                  f"{zm / sm if sm else float('nan'):6.2f}")

    if "b" not in part:
        return
    print("\n== Part B: AQE skew-join on j1 (hot orderkey), j4 contrast ==")
    j1 = plans.QUERIES["j1_star_join"]
    j4 = plans.QUERIES["j4_entity_daily_metrics"]

    def run_plan(q, dir_, label):
        # collect() on df ITSELF (both outputs are a few dozen rows):
        # a noop write executes a cloned plan, leaving df's own
        # AdaptiveSparkPlan isFinalPlan=false with no skew markers.
        df = q(spark, dir_)
        t0 = time.monotonic()
        n = len(df.collect())
        sec = time.monotonic() - t0
        plan = df._jdf.queryExecution().executedPlan().toString()
        skews = len(re.findall(r"skew=true|AQEShuffleRead skewed", plan))
        smj = len(re.findall(r"SortMergeJoin", plan))
        print(f"{label:44s} {sec:7.2f}s  rows={n}  SMJ={smj}  "
              f"skew-markers x{skews}")
        return skews

    conf = spark.conf
    run_plan(j1, zipf_dir, "j1 zipf, defaults (broadcast on)")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    run_plan(j1, zipf_dir, "j1 zipf, SMJ forced, default skew thresholds")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    n = run_plan(j1, zipf_dir, "j1 zipf, SMJ forced, 8m/4m skew thresholds")
    conf.unset("spark.sql.autoBroadcastJoinThreshold")
    conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    run_plan(j4, zipf_dir, "j4 zipf (single-agg formulation, no join)")
    run_plan(j4, unif_dir, "j4 uniform-events contrast (suffix replica)")
    print(f"\nAQE skew split engaged on j1: {'YES' if n else 'NO'} "
          f"({n} skew=true join sides at lowered thresholds)")


if __name__ == "__main__":
    main()

"""Measure merge_upsert_partitioned's rewrite cost vs table size
(VERDICT r12 #3 'done' evidence): a batch touching 2 dates of an
N-date table should cost ~the same as N doubles, while the whole-table
merge_upsert grows with N.

Usage: python tools/upsert_scaling.py [rows_per_date]
Writes two table sizes (60 and 240 date partitions), times a 2-date
upsert through BOTH paths on each, and prints one JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from risk_dashboard_database_spark.session import get_spark  # noqa: E402
from risk_dashboard_database_spark.sources.sinks import (  # noqa: E402
    merge_upsert,
    merge_upsert_partitioned,
)


def build(
    spark, path: str, n_dates: int, rows_per_date: int, partitioned: bool = True
) -> None:
    df = (
        spark.range(n_dates * rows_per_date)
        .select(
            F.date_format(
                F.date_add(
                    F.lit("2024-01-01"),
                    (F.col("id") % n_dates).cast("int"),
                ),
                "yyyy-MM-dd",
            ).alias("date"),
            (F.col("id") / n_dates).cast("long").alias("user_id"),
            (F.col("id") * 3 % 1000).cast("long").alias("total"),
        )
    )
    if partitioned:
        df.write.partitionBy("date").parquet(path)
    else:
        df.write.parquet(path)


def batch(spark, rows_per_date: int):
    return (
        spark.range(2 * rows_per_date)
        .select(
            F.when(F.col("id") % 2 == 0, "2024-01-05")
            .otherwise("2024-01-11")
            .alias("date"),
            (F.col("id") / 2).cast("long").alias("user_id"),
            F.lit(7777).cast("long").alias("total"),
        )
    )


def main() -> None:
    rows_per_date = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark()
    out = {"rows_per_date": rows_per_date, "tables": {}}
    for n_dates in (60, 240):
        root = tempfile.mkdtemp(prefix=f"upsert_scale_{n_dates}_")
        part = f"{root}/part"
        whole = f"{root}/whole"
        build(spark, part, n_dates, rows_per_date)
        # the whole-table target is a plain (unpartitioned) parquet
        # dir, the shape merge_upsert actually manages
        build(spark, whole, n_dates, rows_per_date, partitioned=False)

        upd = batch(spark, rows_per_date)
        t0 = time.perf_counter()
        merge_upsert_partitioned(
            spark, part, upd, keys=["date", "user_id"], partition_col="date"
        )
        t_part = time.perf_counter() - t0
        t0 = time.perf_counter()
        merge_upsert(spark, whole, upd, keys=["date", "user_id"])
        t_whole = time.perf_counter() - t0
        out["tables"][str(n_dates)] = {
            "partitioned_sec": round(t_part, 3),
            "whole_table_sec": round(t_whole, 3),
        }
        shutil.rmtree(root)
    p60, p240 = (
        out["tables"]["60"]["partitioned_sec"],
        out["tables"]["240"]["partitioned_sec"],
    )
    w60, w240 = (
        out["tables"]["60"]["whole_table_sec"],
        out["tables"]["240"]["whole_table_sec"],
    )
    out["partitioned_growth_4x_table"] = round(p240 / p60, 2)
    out["whole_table_growth_4x_table"] = round(w240 / w60, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

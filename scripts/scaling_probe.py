"""Scaling-slope probe: no sf1 testdata exists, so synthesize the scale
in-memory and measure how the core plans grow from 2M to 20M rows (a 10x
step, the same ratio as sf0.1 -> sf1). A slope near 1.0 on the
time-vs-rows log-log line means the plan is linear in the input — the
property that must hold for the 100 TB story. Prints one JSON line:

  {"probe": ..., "rows": {...}, "sec": {...}, "slope": ...}

Run:  python scripts/scaling_probe.py

Measured on local[32] (round 3): dp_count_sum_bounded 10M->100M rows
1.37s -> 1.13s (slope -0.08: the whole bounded-count plan is codegen'd
integer work, still scheduling-bound at 100M rows); exact_dedup_groupby
5M->50M 4.1s -> 29.9s (slope 0.86, sublinear — partial aggregation
absorbs duplicate mass before the shuffle).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

import pipelinedp_spark as pds


def _events(spark, n: int):
    return spark.range(n).select(
        F.pmod(F.xxhash64("id"), F.lit(max(n // 40, 1))).alias("uid"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1000)).alias("pk"),
        (F.pmod(F.col("id"), 97)).cast("double").alias("v"),
        (F.col("id") * 1000).alias("ts"))


def _dp_count_sum(df):
    acct = pds.NaiveBudgetAccountant(1.0, 1e-6)
    engine = pds.DPEngine(acct, noise_mode="zero")
    params = pds.AggregateParams(
        metrics=[pds.Metrics.COUNT, pds.Metrics.SUM],
        max_partitions_contributed=5,
        max_contributions_per_partition=3,
        min_value=0.0, max_value=96.0)
    res = engine.aggregate(df, params,
                           pds.DataFrameExtractors("uid", "pk", "v"),
                           public_partitions=list(range(1000)))
    acct.compute_budgets()
    return res.dataframe()


def _dedup_exact(df):
    return (df.select(F.md5(F.concat_ws("|", "uid", "v")).alias("fp"))
            .groupBy("fp").agg(F.count(F.lit(1)).alias("c")))


# per-probe sizes chosen so compute dominates scheduling overhead on
# local[32] while the larger point stays in memory.
PROBES = {
    "dp_count_sum_bounded": (_dp_count_sum, [10_000_000, 100_000_000]),
    "exact_dedup_groupby": (_dedup_exact, [5_000_000, 50_000_000]),
}


def main() -> None:
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "24g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    out = []
    for name, (probe, sizes) in PROBES.items():
        secs = {}
        for n in sizes:
            df = _events(spark, n)
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                probe(df).count()
                best = min(best, time.perf_counter() - t0)
            secs[n] = round(best, 3)
        slope = (math.log(secs[sizes[-1]] / secs[sizes[0]])
                 / math.log(sizes[-1] / sizes[0]))
        out.append({"probe": name, "sec": secs,
                    "slope": round(slope, 3)})
        print(json.dumps(out[-1]))
    spark.stop()


if __name__ == "__main__":
    main()

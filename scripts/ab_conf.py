"""A/B a session-conf set against the bench baseline conf on a subset of
queries, alternating A and B sessions to cancel host drift.

Usage:
    python scripts/ab_conf.py --conf '{"k": "v", ...}' --rounds 2 name...

Each round: fresh baseline session runs every query (best-of-2), fresh
candidate session (baseline + overrides) runs every query. Prints the
per-query min across rounds for each arm and the A/B ratio.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def _session(cpus: str, extra: dict):
    from pyspark.sql import SparkSession
    b = (SparkSession.builder.master(f"local[{cpus}]")
         .appName("r12-ab")
         .config("spark.sql.shuffle.partitions", cpus)
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "8g"))
    for k, v in extra.items():
        b = b.config(k, v)
    sp = b.getOrCreate()
    sp.sparkContext.setLogLevel("ERROR")
    return sp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--conf", required=True)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    extra = json.loads(args.conf)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    spec = importlib.util.spec_from_file_location(
        "spark_entry", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs = mod.queries()

    res = {"base": {n: float("inf") for n in args.names},
           "cand": {n: float("inf") for n in args.names}}
    for rnd in range(args.rounds):
        for arm, over in (("base", {}), ("cand", extra)):
            spark = _session(cpus, over)
            spark.read.parquet(f"{args.sf}/region.parquet").count()
            for n in args.names:
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    qs[n](spark, args.sf).collect()
                    best = min(best, time.perf_counter() - t0)
                    spark.catalog.clearCache()
                res[arm][n] = min(res[arm][n], best)
                print(f"r{rnd} {arm} {best:7.3f}  {n}", flush=True)
            spark.stop()
    print("\n--- min per arm ---")
    tot_b = tot_c = 0.0
    for n in args.names:
        b, c = res["base"][n], res["cand"][n]
        tot_b += b
        tot_c += c
        print(f"{b:7.3f} -> {c:7.3f}  ({c/b:5.2f}x)  {n}")
    print(f"{tot_b:7.3f} -> {tot_c:7.3f}  ({tot_c/tot_b:5.2f}x)  TOTAL")


if __name__ == "__main__":
    main()

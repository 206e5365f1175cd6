"""Second-decade (10x-on-10x) scaling probe for the DP-engine and skew
paths (VERDICT r9 task 5): the documents path already has measured
sf1 -> sf10 ratios in SCALING100_LOCAL.json; this adds

* registry DP / events queries at sf1 vs sf10 parquet (orders/events
  replicated 100x from sf0.1 by scripts/gen_sf1.ensure_sf10_dp) — the
  contribution-bounding window-sample pipeline and the event-window
  paths at a real second decade;
* the bench.py skew suite at scale=1 vs scale=10 (synthetic row counts
  x10: 20M skewed events, 400k hot-cell vectors) — the hot-key plans
  where a decade can't come from parquet because the suite builds its
  own adversarial distributions.

Each leg runs in a FRESH session (the r04 lesson: shared-JVM decay
inflates tail measurements up to 7x); queries are timed single-pass
with count() (output rows would swamp the engine signal through the
driver). Results merge into SCALING100_LOCAL.json, which bench.py
embeds as the `scaling_100x` block.

Run:  python scripts/scaling100_probe.py
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

# Registry queries whose inputs are orders/events (+ broadcast dims):
# the DP bounding pipeline (two window-sample shuffles), the selection
# path, and the event-window family.
DP_QUERIES = [
    "dp_count_public",            # orders; window-sample bounding
    "dp_count_composite_key",     # orders; composite partition key
    "dp_mean_public",             # events; normalized-sum mean
    "dp_select_partitions_tg",    # orders; truncated-geometric keep
    "dp_percentile_public",       # events; histogram-sketch quantile
    "dp_windowed_count_events",   # events; tumbling window + bounding
    "dp_session_count_events",    # events; session windows + bounding
]

SKEW_QUERIES = [
    "skew_dp_count_bounded",
    "skew_dp_mean_generous_cap",
    "skew_asof_hot_key",
    "skew_semdedup_hot_cell",
]


def _make_spark():
    from pyspark.sql import SparkSession
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sp = (SparkSession.builder.master(f"local[{cpus}]")
          .appName("scaling100-probe")
          .config("spark.sql.shuffle.partitions", cpus)
          .config("spark.sql.adaptive.enabled", "true")
          .config("spark.ui.enabled", "false")
          .config("spark.driver.memory", "8g")
          .getOrCreate())
    sp.sparkContext.setLogLevel("ERROR")
    return sp


def main() -> None:
    from gen_sf1 import ensure_sf1, ensure_sf10_dp

    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(REPO, "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    spark = _make_spark()
    sf1 = ensure_sf1(spark)
    sf10 = ensure_sf10_dp(spark)

    out: dict[str, dict] = {}

    # --- DP/events registry queries: one fresh session per decade ---
    for tag, sf_dir in (("sf1", sf1), ("sf10", sf10)):
        spark.stop()
        spark = _make_spark()
        spark.read.parquet(f"{sf_dir}/region.parquet").count()
        for name in DP_QUERIES:
            q = mod.queries()[name]
            t0 = time.perf_counter()
            rows = q(spark, sf_dir).count()
            dt = round(time.perf_counter() - t0, 2)
            spark.catalog.clearCache()
            out.setdefault(name, {})[tag] = dt
            out[name][f"rows_{tag}"] = rows
            print(f"{name} {tag}: {dt}s rows={rows}", flush=True)

    # --- skew suite: scale 1 then scale 10, fresh session each ---
    import bench
    for tag, scale in (("sf1", 1), ("sf10", 10)):
        spark.stop()
        spark = _make_spark()
        thunks = bench._skew_queries(spark, scale=scale)
        for name in SKEW_QUERIES:
            t0 = time.perf_counter()
            rows = thunks[name]().count()
            dt = round(time.perf_counter() - t0, 2)
            spark.catalog.clearCache()
            out.setdefault(name, {})[tag] = dt
            out[name][f"rows_{tag}"] = rows
            print(f"{name} x{scale}: {dt}s rows={rows}", flush=True)
    spark.stop()

    for name, rec in out.items():
        rec["ratio_10x_second_decade"] = round(
            rec["sf10"] / max(rec["sf1"], 1e-3), 2)

    path = os.path.join(REPO, "SCALING100_LOCAL.json")
    merged = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                merged = json.load(f)
        except (OSError, ValueError):
            merged = {}
    merged.update(out)
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps({n: r["ratio_10x_second_decade"]
                      for n, r in out.items()}))


if __name__ == "__main__":
    main()

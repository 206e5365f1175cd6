"""Round-12 optimization harness: time a subset of queries() with the
bench's exact methodology (local[$SPARK_GRAFT_CPUS], best-of-2 collect,
clearCache between runs) and optionally dump .explain("formatted") to
plans/r13/<name>_<tag>.txt.

Usage:
    python scripts/profile_queries.py [--plans TAG] [--sf DIR] name...
    python scripts/profile_queries.py --top N        # N slowest from BENCH_LOCAL.json
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--plans", default=None,
                    help="dump explain formatted to plans/r13/<name>_<TAG>.txt")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--joblog", action="store_true",
                    help="record a Spark event log and print a per-query "
                         "job breakdown (n jobs, per-job wall ms)")
    args = ap.parse_args()

    names = list(args.names)
    if args.top:
        with open("/root/repo/BENCH_LOCAL.json") as f:
            bl = json.load(f)
        names += [n for n, _ in sorted(bl["queries"].items(),
                                       key=lambda kv: -kv[1])[:args.top]
                  if n not in names]

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession
    builder = (SparkSession.builder.master(f"local[{cpus}]")
               .appName("r13-profile")
               .config("spark.sql.shuffle.partitions", cpus)
               .config("spark.sql.adaptive.enabled", "true")
               .config("spark.ui.enabled", "false")
               .config("spark.driver.memory", "8g"))
    evdir = None
    if args.joblog:
        import tempfile
        evdir = tempfile.mkdtemp(prefix="r13ev_")
        builder = (builder.config("spark.eventLog.enabled", "true")
                   .config("spark.eventLog.compress", "false")
                   .config("spark.eventLog.dir", f"file:{evdir}"))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    spec = importlib.util.spec_from_file_location(
        "spark_entry", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs = mod.queries()

    spark.read.parquet(f"{args.sf}/region.parquet").count()

    out: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(name)
        best = float("inf")
        for _ in range(args.runs):
            t0 = time.perf_counter()
            fn(spark, args.sf).collect()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        out[name] = round(best, 3)
        print(f"{out[name]:8.3f}  {name}", flush=True)
        if args.plans:
            os.makedirs("/root/repo/plans/r13", exist_ok=True)
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(f"/root/repo/plans/r13/{name}_{args.plans}.txt",
                      "w") as f:
                f.write(plan)
    print(json.dumps(out))
    spark.stop()
    if evdir:
        _report_joblog(evdir)


def _report_joblog(evdir: str) -> None:
    """Parse the event log: per job-description (query name), list the
    jobs with wall ms — where a lifecycle query's time actually goes."""
    import collections
    logs = []
    for root, _dirs, files in os.walk(evdir):
        logs += [os.path.join(root, f) for f in files
                 if "events" in f or f.startswith("local-")]
    starts: dict[int, tuple] = {}
    per_desc: dict[str, list] = collections.defaultdict(list)
    for lp in logs:
        with open(lp) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except ValueError:
                    continue
                if ev.get("Event") == "SparkListenerJobStart":
                    props = ev.get("Properties") or {}
                    starts[ev["Job ID"]] = (
                        ev.get("Submission Time", 0),
                        props.get("spark.job.description", "?"),
                        props.get("callSite.short", ""))
                elif ev.get("Event") == "SparkListenerJobEnd":
                    s = starts.pop(ev["Job ID"], None)
                    if s:
                        per_desc[s[1]].append(
                            (ev["Job ID"],
                             ev.get("Completion Time", 0) - s[0], s[2]))
    for desc, jobs in per_desc.items():
        tot = sum(ms for _, ms, _ in jobs)
        print(f"\n== {desc}: {len(jobs)} jobs, {tot/1000:.2f}s job time")
        for jid, ms, site in sorted(jobs):
            print(f"   job {jid:4d} {ms:7d} ms  {site}")


if __name__ == "__main__":
    main()

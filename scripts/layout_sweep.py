"""Adversarial-layout oracle sweep: run EVERY queries() entry through the
DuckDB compare under runtime configurations chosen to surface
layout-dependent results — tiny/odd parallelism, tiny/odd shuffle
partition counts, AQE on and off. A query whose result depends on
partition count, task scheduling, or adaptive re-planning fails here
even though the default-layout check passes.

  python scripts/layout_sweep.py            # both sweeps
  python scripts/layout_sweep.py 1          # sweep #1 only

Sweeps (primes chosen so no partitioning divides another evenly):
  1. local[3],  shuffle.partitions=7,  AQE off
  2. local[5],  shuffle.partitions=3,  AQE on

Writes SWEEP_LOCAL.json at the repo root: per-sweep failure lists (empty
lists = the engine is layout-independent at sf0.01).
"""

from __future__ import annotations

import hashlib
import importlib.util
import json
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

SWEEPS = {
    "1": {"master": "local[3]", "shuffle": "7", "aqe": "false"},
    "2": {"master": "local[5]", "shuffle": "3", "aqe": "true"},
}


def value_hash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(4)
    rows = sorted(df.astype(str).itertuples(index=False, name=None))
    return hashlib.md5(repr(rows).encode()).hexdigest()


def run_sweep(tag: str, conf: dict, sf_dir: str) -> dict:
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(conf["master"])
             .config("spark.sql.shuffle.partitions", conf["shuffle"])
             .config("spark.sql.adaptive.enabled", conf["aqe"])
             .config("spark.driver.memory", "8g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    spec = importlib.util.spec_from_file_location(
        "entry_sweep", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet"
                    f"('{sf_dir}/{t}.parquet')")
    oracles = mod.oracle_sql()
    failures, n_ok = [], 0
    t0 = time.time()
    for name, fn in mod.queries().items():
        try:
            sdf = fn(spark, sf_dir).toPandas()
            if name not in oracles:
                n_ok += 1
                continue
            odf = con.execute(oracles[name]).fetchdf()
            ok = (sorted(sdf.columns) == sorted(odf.columns)
                  and len(sdf) == len(odf)
                  and value_hash(sdf) == value_hash(odf))
            if ok:
                n_ok += 1
            else:
                failures.append(name)
                print(f"SWEEP{tag} FAIL {name}: rows {len(sdf)}/{len(odf)}")
        except Exception as e:  # noqa: BLE001 - record, keep sweeping
            failures.append(name)
            print(f"SWEEP{tag} ERROR {name}: {type(e).__name__}: "
                  f"{str(e)[:150]}")
    spark.stop()
    out = {"conf": conf, "ok": n_ok, "failures": failures,
           "sec": round(time.time() - t0, 1)}
    print(f"SWEEP{tag} done: {n_ok} ok, {len(failures)} failures, "
          f"{out['sec']}s")
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args = sys.argv[1:]
    if args and args[0] == "--one":
        # Child mode: one sweep in this JVM (master/driver memory are
        # fixed at JVM launch, so each sweep needs its own process).
        tag = args[1]
        result = run_sweep(tag, SWEEPS[tag], sf_dir)
        print("RESULT_JSON " + json.dumps({tag: result}))
        sys.exit(1 if result["failures"] else 0)
    import subprocess
    only = args or list(SWEEPS)
    results = {}
    for tag in only:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", tag],
            capture_output=True, text=True)
        sys.stdout.write(p.stdout[-2000:])
        for line in p.stdout.splitlines():
            if line.startswith("RESULT_JSON "):
                results.update(json.loads(line[len("RESULT_JSON "):]))
        if not any(line.startswith("RESULT_JSON ")
                   for line in p.stdout.splitlines()):
            results[tag] = {"error": p.stderr[-500:]}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SWEEP_LOCAL.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {path}")
    if any(r.get("failures") or r.get("error") for r in results.values()):
        sys.exit(1)


if __name__ == "__main__":
    main()

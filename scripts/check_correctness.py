"""Local mirror of the driver's t2 correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01; compare row count,
column names, and an order-insensitive value hash (columns sorted by name,
rows sorted, floats rounded).

A full run (no name filter) also writes CORRECTNESS_LOCAL.json at the repo
root — same row shape as the driver's CORRECTNESS_r{N}.json but covering
EVERY query, so the repo's own record never depends on the driver's
50-entry artifact cap."""

from __future__ import annotations

import hashlib
import importlib.util
import json
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def value_hash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(4)
    rows = sorted(df.astype(str).itertuples(index=False, name=None))
    return hashlib.md5(repr(rows).encode()).hexdigest()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    only = sys.argv[1:] or None

    from pyspark.sql import SparkSession
    # Override the runtime to sweep for partition-layout-dependent
    # results (a clean engine passes under ANY of these):
    #   SPARK_GRAFT_CHECK_MASTER=local[3] SPARK_GRAFT_CHECK_SHUFFLE=7 \
    #   SPARK_GRAFT_CHECK_AQE=false python scripts/check_correctness.py
    spark = (SparkSession.builder
             .master(os.environ.get("SPARK_GRAFT_CHECK_MASTER",
                                    "local[8]"))
             .appName("correctness-check")
             .config("spark.sql.shuffle.partitions",
                     os.environ.get("SPARK_GRAFT_CHECK_SHUFFLE", "8"))
             .config("spark.sql.adaptive.enabled",
                     os.environ.get("SPARK_GRAFT_CHECK_AQE", "true"))
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    spec = importlib.util.spec_from_file_location(
        "spark_entry", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    qs, oracles = mod.queries(), mod.oracle_sql()
    failures = 0
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark raised {type(e).__name__}: {e}")
            failures += 1
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": None,
                             "oracle_rows": None,
                             "err": f"spark {type(e).__name__}: {e}"[:500]}
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(sdf)} rows")
            results[name] = {"rows_match": len(sdf) > 0, "schema_match": None,
                             "hash_match": None, "spark_rows": len(sdf),
                             "oracle_rows": None, "err": None,
                             "rows_only": True}
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb raised {type(e).__name__}: {e}")
            failures += 1
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": len(sdf),
                             "oracle_rows": None,
                             "err": f"duckdb {type(e).__name__}: {e}"[:500]}
            continue
        ok_rows = len(sdf) == len(odf)
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        ok_hash = ok_rows and ok_cols and value_hash(sdf) == value_hash(odf)
        status = "OK  " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        results[name] = {"rows_match": ok_rows, "schema_match": ok_cols,
                         "hash_match": ok_hash, "spark_rows": len(sdf),
                         "oracle_rows": len(odf), "err": None}
        print(f"{status} {name}: rows {len(sdf)}/{len(odf)} "
              f"cols_match={ok_cols} hash_match={ok_hash}")
        if not ok_hash and ok_rows and ok_cols and len(sdf) <= 2000:
            s = sdf.reindex(sorted(sdf.columns), axis=1)
            o = odf.reindex(sorted(odf.columns), axis=1)
            for c in s.columns:
                if s[c].dtype.kind == "f":
                    s[c] = s[c].round(4)
                if o[c].dtype.kind == "f":
                    o[c] = o[c].round(4)
            srows = set(map(repr, s.astype(str).itertuples(index=False,
                                                           name=None)))
            orows = set(map(repr, o.astype(str).itertuples(index=False,
                                                           name=None)))
            diff1 = list(srows - orows)[:3]
            diff2 = list(orows - srows)[:3]
            print(f"     spark-only: {diff1}")
            print(f"     oracle-only: {diff2}")
    spark.stop()
    if not only:
        out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "CORRECTNESS_LOCAL.json")
        with open(out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {out}: {len(results)} entries, {failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

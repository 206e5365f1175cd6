"""Shared helpers for the oracle-registry query modules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_T_CACHE: dict = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Cache the reader PLAN (not data) per live session: every
    # spark.read.parquet call costs ~70-100 ms of driver-side file
    # listing + footer schema read, and the bench's sub-second queries
    # open 1-3 tables each. The testdata dirs are immutable, and the
    # applicationId key survives bench.py's session recycling (a new
    # session gets a new app id; stale entries just stop being hit).
    key = (spark.sparkContext.applicationId, sf_dir, name)
    if key in _T_CACHE:
        return _T_CACHE[key]
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts", "").startswith("timestamp"):
        # events.ts arrives as parquet TIMESTAMP (NTZ).  Downstream queries
        # and operators key on integer time arithmetic, so normalize to
        # microseconds-since-epoch (UTC) longs — the same representation the
        # DuckDB oracles use via epoch_us().
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = df.withColumn("ts", F.unix_micros(F.col("ts").cast("timestamp")))
    _T_CACHE[key] = df
    return df

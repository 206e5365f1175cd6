"""Event-timeline operators end to end: sessionize -> as-of enrich ->
range join -> DP release.

Run: python examples/event_timeline_pipeline.py [sf_dir]

For each user's purchase events: attach the most recent prior click
(as-of join), tag events with overlapping maintenance windows (range
join), compute gap-based sessions, and finish with a differentially
private count of purchases per session-length bucket.
"""

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")

import pipelinedp_spark as pds  # noqa: E402
from pipelinedp_spark.operators.asof import asof_join  # noqa: E402
from pipelinedp_spark.operators.ranges import range_join  # noqa: E402
from pipelinedp_spark.operators.sessions import sessionize  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # events.ts is parquet TIMESTAMP (NTZ); the timeseries operators key on
    # integer time, so normalize to micros-since-epoch longs.
    ev = ev.withColumn("ts", F.unix_micros(F.col("ts").cast("timestamp")))

    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("event_id", "user_id", "ts", "value"))
    clicks = ev.filter(F.col("event_type") == "click") \
               .select("user_id", "ts", "value")

    enriched = asof_join(purchases, clicks, time_col="ts", by="user_id")
    print("purchases with a prior click:",
          enriched.filter(F.col("ts_right").isNotNull()).count(),
          "/", enriched.count())

    hour_us = 3600 * 10**6
    sessions = sessionize(ev.select("user_id", "ts"), "ts", "user_id",
                          gap=hour_us)
    sessions.groupBy("user_id").agg(
        F.max("session_id").alias("n_sessions")) \
        .agg(F.avg(F.col("n_sessions") + 1).alias("avg_sessions_per_user")) \
        .show()

    base = 1_704_067_200 * 10**6
    windows = spark.range(5).select(
        F.col("id").alias("w_id"),
        (F.lit(base) + F.col("id") * 7 * 24 * hour_us).alias("w_start"),
        (F.lit(base) + (F.col("id") * 7 + 10) * 24 * hour_us).alias("w_end"))
    tagged = range_join(ev.select("event_id", "ts"), "ts",
                        windows, "w_start", "w_end", chunk=7 * 24 * hour_us)
    print("event-window pairs:", tagged.count())

    acct_sessions = sessionize(
        ev.select("user_id", "ts", "event_type"), "ts", "user_id",
        gap=hour_us)
    per_session = (acct_sessions.groupBy("user_id", "session_id")
                   .agg(F.count(F.lit(1)).alias("n"))
                   .withColumn("bucket",
                               F.when(F.col("n") <= 2, "short")
                               .when(F.col("n") <= 5, "medium")
                               .otherwise("long")))
    query = (pds.QueryBuilder(per_session, "user_id")
             .groupby("bucket", max_groups_contributed=3,
                      max_contributions_per_group=10,
                      public_keys=["short", "medium", "long"])
             .count()
             .build_query())
    query.run_query(pds.Budget(1.0, 1e-6)).show()
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])

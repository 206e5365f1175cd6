"""Product-analytics tour over the events table —

  ordered funnel (view -> click -> purchase) -> session-scoped funnel
  -> time-to-convert -> cohort retention grid -> last-touch revenue
  attribution -> next-event transition matrix -> windowed anomaly
  scores -> stateful STREAMING funnel over a two-batch replay.

    python examples/product_analytics_pipeline.py [sf_dir]
"""

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")
from pipelinedp_spark.operators.funnel import (funnel_report,      # noqa: E402
                                               retention_cohorts)
from pipelinedp_spark.operators.sessions import sessionize         # noqa: E402
from pipelinedp_spark.streaming.dp_streaming import (              # noqa: E402
    streaming_funnel)


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = (SparkSession.builder.master("local[4]")
             .appName("product-analytics")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .withColumn("ts", F.expr("unix_micros(cast(ts as timestamp))")))
    steps = ["view", "click", "purchase"]

    print("== ordered funnel ==")
    funnel_report(ev, steps).orderBy("step").show()

    print("== session-scoped funnel (1 h gap) ==")
    s = sessionize(ev, "ts", "user_id", gap=3_600_000_000)
    s = s.withColumn("uk", F.col("user_id") * F.lit(1 << 20)
                     + F.col("session_id"))
    funnel_report(s, steps, user_col="uk").orderBy("step").show()

    print("== weekly retention (first 5 offsets of cohort 0) ==")
    (retention_cohorts(ev)
     .filter("offset <= 4").orderBy("cohort", "offset").show(10))

    print("== last-touch attribution (top click hours by revenue) ==")
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("long")
    from pipelinedp_spark.operators.asof import asof_join
    pur = (ev.filter("event_type = 'purchase'")
           .select("user_id", "ts", cents.alias("cents")))
    clk = ev.filter("event_type = 'click'").select("user_id", "ts")
    j = asof_join(pur, clk, "ts", "user_id")
    (j.groupBy(F.expr("ts_right DIV 3600000000").alias("click_hour"))
     .agg(F.sum("cents").alias("revenue_cents"))
     .orderBy(F.col("revenue_cents").desc()).show(5))

    print("== transition matrix (top 5 by probability) ==")
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (ev.select("user_id", "ts", "event_id", "event_type",
                       F.lead("event_type").over(w).alias("nxt"))
             .filter("nxt IS NOT NULL")
             .groupBy("event_type", "nxt").count())
    pairs.orderBy(F.col("count").desc()).show(5)

    print("== streaming funnel (two ts-ordered micro-batches) ==")
    mid = ev.approxQuantile("ts", [0.5], 0.0)[0]
    src = "/tmp/product_analytics_stream_demo"
    base = ev.select("user_id", "event_type", "ts")
    (base.filter(F.col("ts") <= mid).coalesce(1)
     .write.mode("overwrite").parquet(f"{src}/b=0"))
    (base.filter(F.col("ts") > mid).coalesce(1)
     .write.mode("overwrite").parquet(f"{src}/b=1"))
    stream = (spark.readStream
              .schema("user_id long, event_type string, ts long")
              .option("maxFilesPerTrigger", 1).parquet(f"{src}/b=*"))
    q = (streaming_funnel(stream, steps)
         .writeStream.format("memory").queryName("live_funnel")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    (spark.sql("SELECT mx AS completed, COUNT(*) AS users FROM "
               "(SELECT user_id, MAX(completed) AS mx FROM live_funnel "
               "GROUP BY user_id) GROUP BY mx ORDER BY mx")
     .show())

    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])

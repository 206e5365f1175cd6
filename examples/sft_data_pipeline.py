"""SFT / preference-data preparation pipeline — the post-pretraining
data flow: synthesize conversations, validate their shape, render them
flat under a chat template with assistant loss-mask spans, pack the
rendered texts into fixed-length training sequences, build DPO
preference pairs from scored responses, and emit the release manifest.

    python examples/sft_data_pipeline.py [sf_dir]
"""

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")
from pipelinedp_spark.operators.chat import (  # noqa: E402
    conversation_stats, preference_pairs, render_chat)
from pipelinedp_spark.operators.packing import pack_sequences  # noqa: E402
from pipelinedp_spark.operators.release import corpus_manifest  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (SparkSession.builder.master("local[4]")
             .appName("sft-data-pipeline")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # conversations from document sentences (user/assistant alternation)
    arr = F.regexp_extract_all(F.col("text"), F.lit(r"[^.!?]+[.!?]*"), 0)
    sent = [F.coalesce(F.trim(F.get(arr, i)), F.lit(f"filler {i}"))
            for i in range(4)]
    turn = lambda r, c: F.struct(F.lit(r).alias("role"),
                                 c.alias("content"))
    conv = docs.select(
        "doc_id",
        F.array(turn("user", sent[0]), turn("assistant", sent[1]),
                turn("user", sent[2]), turn("assistant", sent[3]))
        .alias("messages"))

    # 1. shape gate: keep trainable conversations only
    stats = conversation_stats(conv)
    good = conv.join(
        stats.filter(F.col("alternation_ok")
                     & F.col("ends_assistant")).select("doc_id"),
        "doc_id")
    print(f"shape gate: {good.count()}/{conv.count()} conversations")

    # 2. render + loss-mask spans
    rendered = render_chat(good)
    spans = rendered.select(
        F.explode("assistant_spans").alias("s")).count()
    print(f"rendered {rendered.count()} docs, {spans} assistant spans")

    # 3. pack rendered texts into 512-token sequences
    packed = pack_sequences(rendered.select("doc_id", "text"), 512)
    n_seqs = packed.agg(
        F.max(F.col("start_seq") + F.col("n_seqs"))).collect()[0][0]
    print(f"packed into {n_seqs} sequences of 512 tokens")

    # 4. DPO pairs from scored responses (score = length heuristic)
    resp = docs.select(
        (F.col("doc_id") % 25).cast("string").alias("prompt"),
        F.trim(F.regexp_extract("text", r"[^.!?]+[.!?]*", 0))
        .alias("response"),
        F.length("text").cast("double").alias("score"),
        F.col("doc_id").alias("resp_id"))
    pairs = preference_pairs(resp, min_margin=1.0)
    print(f"preference pairs: {pairs.count()} "
          f"(avg margin {pairs.agg(F.round(F.avg('margin'), 1)).collect()[0][0]})")

    # 5. release manifest over the rendered corpus
    man = corpus_manifest(
        rendered.select("doc_id", "text").withColumn("source",
                                                     F.lit("sft-v1")),
        "source")
    print("manifest:", man.collect()[0].asDict())
    print("sft data pipeline OK")
    spark.stop()


if __name__ == "__main__":
    main()

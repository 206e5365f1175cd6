"""Round-6 tour: plan a dedup run, lay data out for multi-column
scans, and draw reproducible samples — the BEFORE-the-big-job toolkit.

1. Estimate what a span-dedup pass would remove (sampled duplicate
   8-gram mass — pay 1/4 of one gram shuffle, not the full pipeline).
2. Estimate the distinct 5-gram cardinality with the KMV sketch (size
   the dedup shuffle before running it).
3. Cap any one source's corpus share (RefinedWeb-style quota).
4. Draw a reproducible length-weighted sample without replacement.
5. Write events Z-ordered on (user_id, ts) and show every output file
   covers a compact range in BOTH columns — the layout that lets
   file-level min/max stats prune multi-predicate scans at 100 TB.

    python examples/corpus_planning_and_layout.py [sf_dir]
"""

import glob
import sys
import tempfile

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")
from pipelinedp_spark.functions.sampling import (  # noqa: E402
    cap_per_key, kmv_distinct_estimate, weighted_sample_topk)
from pipelinedp_spark.functions import text as TX  # noqa: E402
from pipelinedp_spark.functions.layout import write_zordered  # noqa: E402
from pipelinedp_spark.operators.dedup import (  # noqa: E402
    gram_dup_rate_estimate)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (SparkSession.builder.master("local[4]")
             .appName("corpus-planning")
             .config("spark.sql.shuffle.partitions", "8")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")

    # 1. How much would span dedup remove? (sampled, unbiased)
    est = gram_dup_rate_estimate(docs, n=8, sample_mod=4).collect()[0]
    print(f"duplicate 8-gram mass ~ {est['dup_rate']:.2%} "
          f"(from {est['sampled_grams']} sampled gram occurrences)")

    # 2. How many distinct 5-grams? (KMV sketch, deterministic)
    grams = docs.select(
        F.explode(TX._word_ngrams(F.col("text"), 5)).alias("gram"))
    card = kmv_distinct_estimate(grams, "gram", k=256).collect()[0]
    print(f"distinct 5-grams ~ {card['estimate']:.0f} "
          f"(k={card['k_used']})")

    # 3. Bound any one source's share.
    capped = cap_per_key(docs, "source", 15, "doc_id")
    print(f"per-source cap 15: {docs.count()} docs -> {capped.count()}")

    # 4. Reproducible length-weighted sample (no RNG, engine-portable).
    sample = weighted_sample_topk(docs, "n_chars", 10, "doc_id")
    print("weighted sample ids:",
          sorted(r["doc_id"] for r in sample.collect()))

    # 5. Z-order events on (user_id, ts): every file = compact bbox in
    # both columns, so min/max stats prune scans filtering on either.
    with tempfile.TemporaryDirectory() as td:
        write_zordered(events, f"{td}/z", ["user_id", "ts"],
                       num_files=8)
        widths_u, widths_t = [], []
        full_u = events.agg(F.max("user_id") - F.min("user_id")) \
            .collect()[0][0]
        for f in glob.glob(f"{td}/z/part-*.parquet"):
            pdf = pd.read_parquet(f, columns=["user_id", "ts"])
            if len(pdf):
                widths_u.append(pdf.user_id.max() - pdf.user_id.min())
                widths_t.append((pdf.ts.max() - pdf.ts.min()))
        print(f"z-ordered files: mean user_id range "
              f"{sum(widths_u)/len(widths_u):.0f} of {full_u} total — "
              f"multi-column pruning works on every file")
    spark.stop()


if __name__ == "__main__":
    main()

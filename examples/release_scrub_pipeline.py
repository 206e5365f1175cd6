"""Pre-release scrub + privacy-audit pipeline — the checks a dataset
card cites before a corpus (and its event logs) leave the building:

  documents:  full PII audit (Luhn-verified cards) -> typed-placeholder
              scrub -> ExactSubstr duplicated-span cut -> span-level
              eval-set decontamination -> leakage-safe split
  events:     keyed pseudonymization (+ collision audit) ->
              k-anonymity / l-diversity audit -> suppression to k

    python examples/release_scrub_pipeline.py [sf_dir]
"""

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")
from pipelinedp_spark.corpus import CorpusPipeline  # noqa: E402
from pipelinedp_spark.functions.pii import pii_signals  # noqa: E402
from pipelinedp_spark.operators.anonymity import (  # noqa: E402
    generalize_bucket, k_anonymity_report, l_diversity_report,
    pseudonym_collision_audit, pseudonymize, suppress_small_groups)
from pipelinedp_spark.operators.clustering import (  # noqa: E402
    leakage_safe_split)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (SparkSession.builder.master("local[4]")
             .appName("release-scrub")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")

    # -- corpus side ----------------------------------------------------
    audit = docs.select(pii_signals(F.col("text")).alias("s")).agg(
        F.sum("s.email").alias("emails"),
        F.sum("s.card_luhn").alias("luhn_cards"),
        F.sum("s.ssn").alias("ssns")).collect()[0]
    print(f"PII audit: emails={audit['emails']} "
          f"luhn_cards={audit['luhn_cards']} ssns={audit['ssns']}")

    evals = docs.filter(F.col("doc_id") % 29 == 3).select("doc_id", "text")
    released = (CorpusPipeline(docs)
                .pii_audit_scrub()
                .exact_substr_dedup(min_len=64)
                .decontaminate_spans(evals, min_len=64)
                .df)
    split = leakage_safe_split(released, "source")
    print("split sizes:",
          {r["split"]: r["n"] for r in
           split.groupBy("split").agg(F.count(F.lit(1)).alias("n"))
           .collect()})

    # -- events side ------------------------------------------------------
    coll = pseudonym_collision_audit(events, "user_id",
                                     salt="release-demo").collect()[0]
    assert coll["collision_free"], "pseudonym collision — rotate salt"
    pe = pseudonymize(events, ["user_id"], salt="release-demo")

    quasi = pe.select(
        "user_id_pseudo", "event_type",
        generalize_bucket(F.col("value"), 10.0).alias("vbucket"))
    k_rep = k_anonymity_report(quasi, ["event_type", "vbucket"], k=5)
    viol = k_rep.filter(~F.col("meets_k")).count()
    l_rep = l_diversity_report(quasi, ["event_type", "vbucket"],
                               "user_id_pseudo", l=3)
    homog = l_rep.filter(~F.col("meets_l")).count()
    print(f"k-anonymity: {viol} classes below k=5; "
          f"l-diversity: {homog} classes below l=3")

    safe = suppress_small_groups(quasi, ["event_type", "vbucket"], k=5)
    kept = safe.count()
    total = quasi.count()
    print(f"suppression to k=5: kept {kept}/{total} rows "
          f"({kept / max(total, 1):.1%})")
    assert all(r["meets_k"] for r in
               k_anonymity_report(safe, ["event_type", "vbucket"],
                                  k=5).collect())
    print("release scrub pipeline OK")
    spark.stop()


if __name__ == "__main__":
    main()

"""Multilingual quality-routing tour — the round-7 surface end to end
on the sample documents table:

  NFKC normalize -> character-n-gram language ID -> language mix
  report -> code-vs-prose routing -> Gopher quality filter (prose
  branch) -> corpus sentence dedup -> TF-IDF keywords + PMI
  collocations on the surviving corpus.

    python examples/multilingual_quality_routing.py [sf_dir]
"""

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")
from pipelinedp_spark.corpus import CorpusPipeline             # noqa: E402
from pipelinedp_spark.functions.text import (                  # noqa: E402
    code_score, is_code)
from pipelinedp_spark.operators.dedup import sentence_dedup    # noqa: E402
from pipelinedp_spark.operators.langid import (                # noqa: E402
    language_id_ngram)
from pipelinedp_spark.operators.quality import (               # noqa: E402
    gopher_quality_filter)
from pipelinedp_spark.operators.retrieval import (             # noqa: E402
    pmi_collocations, tfidf_keywords)


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = (SparkSession.builder.master("local[4]")
             .appName("multilingual-quality-routing")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")

    # 1. Unicode-normalize up front so every later fingerprint, gram,
    #    and hash compares like-for-like.
    docs = CorpusPipeline(docs).normalize(nfkc=True).df

    # 2. Language ID + corpus language mix (dataset-card line).
    langs = language_id_ngram(docs)
    mix = (langs.groupBy("lang").count().orderBy(F.desc("count")))
    print("language mix:")
    for r in mix.collect():
        print(f"  {r['lang']}: {r['count']}")

    # 3. Route code away from the prose pipeline (different dedup and
    #    tokenizer treatment downstream).
    routed = docs.withColumn("is_code", is_code(F.col("text"))) \
        .withColumn("code_score", code_score(F.col("text")))
    code_branch = routed.filter("is_code")
    prose = routed.filter("NOT is_code").select("doc_id", "text")
    print(f"routed to code branch: {code_branch.count()}")

    # 4. Gopher quality filter on the prose branch. The sample corpus
    #    is synthetic word salad whose vocabulary contains only one of
    #    Gopher's stopwords, so the stopword rule is relaxed to 1 here;
    #    real corpora keep the default of 2.
    gopher = gopher_quality_filter(prose, min_words=20,
                                   min_stopword_hits=1)
    kept = prose.join(gopher.filter("passes").select("doc_id"),
                      "doc_id", "left_semi")
    print(f"gopher survivors: {kept.count()} / {prose.count()}")

    # 5. Corpus-level sentence dedup (taglines/disclaimers).
    clean = sentence_dedup(kept, min_docs=2, min_chars=10) \
        .select("doc_id", F.col("clean_text").alias("text"))

    # 6. Corpus analytics on the survivors.
    print("top TF-IDF keywords (first 5 docs):")
    kw = tfidf_keywords(clean, k=3)
    for r in kw.filter("doc_id < 5").orderBy("doc_id", "rank").collect():
        print(f"  doc {r['doc_id']} #{r['rank']}: {r['term']} "
              f"({r['score']})")
    print("top collocations:")
    for r in pmi_collocations(clean, k=5, min_count=3).collect():
        print(f"  {r['gram']} (c={r['c']}, pmi={r['pmi']})")

    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])

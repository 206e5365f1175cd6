"""Web-corpus ingestion tour: the crawl-to-corpus flow end to end on
the sample documents table —

  WET archives (gzip'd, Content-Length-walked) -> record fan-out ->
  URL canonicalization + registered-domain extraction -> per-domain
  cap -> corpus-level boilerplate line dedup -> CCNet paragraph-ppl
  filter -> token-budget selection -> WebDataset tar shards out.

    python examples/web_corpus_ingestion.py [sf_dir]
"""

import gzip
import sys

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")
from pipelinedp_spark.functions import urls as U               # noqa: E402
from pipelinedp_spark.functions.sampling import cap_per_key    # noqa: E402
from pipelinedp_spark.functions.text import hex_to_long        # noqa: E402
from pipelinedp_spark.operators.dedup import line_dedup        # noqa: E402
from pipelinedp_spark.operators.mixing import (                # noqa: E402
    select_to_token_budget)
from pipelinedp_spark.operators.quality import (               # noqa: E402
    paragraph_perplexity_filter)
from pipelinedp_spark.sources.webcrawl import (                # noqa: E402
    encode_tar, encode_wet, extract_tar_members, extract_wet_records)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (SparkSession.builder.master("local[4]")
             .appName("web-corpus-ingestion")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. Stand in for a crawl: pack the sample docs into gzip'd WET
    #    archives (one per source), as Common Crawl ships them.
    def pack_wet(pdf: pd.DataFrame) -> pd.DataFrame:
        recs = [(f"https://WWW.Site{int(d) % 7}.COM/p/{int(d)}"
                 f"?utm_source=crawl", str(t))
                for d, t in zip(pdf["doc_id"], pdf["text"])]
        return pd.DataFrame({"archive": [gzip.compress(encode_wet(recs))]})

    archives = docs.groupBy("source").applyInPandas(
        pack_wet, "archive binary")

    # 2. Fan out records; canonicalize URLs; extract registered domains.
    pages = extract_wet_records(archives, "archive")
    pages = pages.select(
        U.canonicalize_url(F.col("uri")).alias("url"),
        F.regexp_extract(F.col("uri"), r"/p/(\d+)", 1).cast("long")
        .alias("doc_id"),
        "text")
    pages = pages.withColumn(
        "domain", U.registered_domain(U.url_host(F.col("url"))))
    print("records in:", pages.count())

    # 3. Bound any one domain's share of the corpus.
    pages = cap_per_key(
        pages.withColumn("__pri__", hex_to_long(F.md5(F.col("url")))),
        "domain", 40, "__pri__").drop("__pri__")
    print("after per-domain cap:", pages.count())

    # 4. Corpus-level boilerplate line dedup, then paragraph-LM filter.
    cleaned = line_dedup(pages, "text", "doc_id", min_docs=3)
    pages = pages.drop("text").join(
        cleaned.select("doc_id", F.col("clean_text").alias("text")),
        "doc_id")
    filtered = paragraph_perplexity_filter(pages, "text", "doc_id",
                                           max_ppl=5000.0)
    pages = pages.drop("text").join(
        filtered.select("doc_id", F.col("clean_text").alias("text")),
        "doc_id")

    # 5. Keep the longest docs within a token budget (distributed
    #    prefix sum — no single-task window).
    keyed = pages.withColumn(
        "__nt__",
        F.size(F.split(F.col("text"), " ")).cast("long")).withColumn(
        "__ord__", (-F.col("__nt__") * F.lit(1 << 40)
                    + F.col("doc_id")).cast("long"))
    selected = select_to_token_budget(keyed, 10_000, "__nt__", "__ord__")
    print("selected docs:", selected.count(),
          "total tokens:",
          selected.agg(F.max("cum_tokens")).collect()[0][0])

    # 6. Ship as WebDataset tar shards (one per domain) and prove the
    #    round trip.
    def pack_tar(pdf: pd.DataFrame) -> pd.DataFrame:
        members = []
        for d, t in zip(pdf["doc_id"], pdf["text"]):
            members.append((f"s/{int(d)}.txt", str(t).encode("utf-8")))
        return pd.DataFrame({"shard": [encode_tar(members)]})

    shards = selected.groupBy("domain").applyInPandas(
        pack_tar, "shard binary")
    back = extract_tar_members(shards, "shard", suffixes=["txt"])
    print("shards:", shards.count(), "members out:", back.count())
    spark.stop()


if __name__ == "__main__":
    main()

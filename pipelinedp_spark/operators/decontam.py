"""Benchmark decontamination: drop/flag training documents that share
word n-grams with an evaluation set (the GPT-3 appendix-C /
Gopher-style n-gram overlap rule).

Scale shape: the eval side reduces to a DISTINCT gram-hash set — for
real benchmark suites this is millions of rows at most, so it
BROADCASTS; the corpus side is one codegen'd explode + broadcast
semi-join probe and a map-side-combined per-doc count. No corpus
shuffle except the per-doc aggregation of matched grams. At 100 TB the
corpus is touched once; the eval set's size, not the corpus's, bounds
the join state.

No reference counterpart (net-new per project north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipelinedp_spark.functions import text as T


def eval_gram_set(eval_df: DataFrame, text_col: str = "text",
                  n: int = 5) -> DataFrame:
    """Distinct 60-bit hashes of the eval set's word n-grams — the
    broadcastable probe table (column ``gram_hash``)."""
    return (eval_df.select(
        F.explode(T._word_ngrams(F.col(text_col), n)).alias("g"))
        .select(T.token_hash(F.col("g")).alias("gram_hash"))
        .distinct())


def contamination_hits(docs: DataFrame, eval_df: DataFrame,
                       text_col: str = "text", id_col: str = "doc_id",
                       n: int = 5) -> DataFrame:
    """(id_col, n_hits) for every document sharing >= 1 word n-gram with
    the eval set; n_hits counts the doc's matching gram OCCURRENCES
    (non-distinct — repeated boilerplate counts each time, matching the
    char-mass view quality filters take)."""
    grams = docs.select(
        F.col(id_col),
        F.explode(T._word_ngrams(F.col(text_col), n)).alias("g"))
    probe = F.broadcast(eval_gram_set(eval_df, text_col, n))
    return (grams.withColumn("gram_hash", T.token_hash(F.col("g")))
            .join(probe, "gram_hash", "left_semi")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_hits")))


def decontaminate(docs: DataFrame, eval_df: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  n: int = 5, max_hits: int = 0) -> DataFrame:
    """The training corpus minus documents with more than ``max_hits``
    eval-overlapping n-gram occurrences (default: any overlap drops the
    doc). Keeps all input columns."""
    bad = (contamination_hits(docs, eval_df, text_col, id_col, n)
           .filter(F.col("n_hits") > max_hits)
           .select(id_col))
    return docs.join(F.broadcast(bad), id_col, "left_anti")

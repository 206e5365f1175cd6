"""Corpus quality signals that need cross-gram counting (the pure
column-expression rules live in ``functions.text``).

Gopher repetition rules (Rae et al. 2021, Table A1): a document is
boilerplate-heavy when its most frequent word n-gram covers a large
character fraction (n = 2, 3, 4) or when repeated n-grams carry a large
fraction of the character mass (n = 5..10 — see
``functions.text.duplicate_ngram_char_fraction`` for the shuffle-free
form of the latter).

Scale shape: the top-gram rule is the classic word-count plan — explode
to (doc, gram), one map-side-combinable groupBy, a per-doc
WindowGroupLimit for the argmax — no driver participation.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pipelinedp_spark.functions import text as T


def top_ngram_char_fraction(df: DataFrame,
                            text_col: str = "text",
                            id_col: str = "doc_id",
                            ns: Sequence[int] = (2, 3, 4)) -> DataFrame:
    """For each n in ``ns``: the character fraction covered by the MOST
    FREQUENT word n-gram — count(top) * len(top) / total gram char mass
    (ties broken by gram string ascending for determinism). Output:
    (id_col, top_{n}gram_frac ... one column per n); documents shorter
    than n tokens score 0.0 for that n."""
    out = df.select(id_col)
    for n in ns:
        grams = df.select(
            F.col(id_col),
            F.explode(T._word_ngrams(F.col(text_col), n)).alias("g"))
        counted = grams.groupBy(id_col, "g").agg(
            F.count(F.lit(1)).alias("cnt"))
        totals = counted.groupBy(id_col).agg(
            F.sum(F.col("cnt") * F.length("g")).alias("total"))
        w = Window.partitionBy(id_col).orderBy(F.col("cnt").desc(),
                                               F.col("g").asc())
        top = (counted.withColumn("rn", F.row_number().over(w))
               .filter(F.col("rn") == 1)
               .join(totals, id_col)
               .select(F.col(id_col),
                       F.when(F.col("total") > 0,
                              F.round((F.col("cnt") * F.length("g"))
                                      .cast("double") / F.col("total"), 6))
                       .otherwise(F.lit(0.0))
                       .alias(f"top_{n}gram_frac")))
        out = out.join(top, id_col, "left")
    fills = {f"top_{n}gram_frac": 0.0 for n in ns}
    return out.fillna(fills)

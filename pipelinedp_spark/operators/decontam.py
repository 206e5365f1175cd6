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


def bloom_filter_table(eval_df: DataFrame, text_col: str = "text",
                       n: int = 5, m_bits: int = 1 << 20,
                       num_hashes: int = 5) -> DataFrame:
    """Bloom filter over the eval set's n-gram hashes, laid out as a
    table of 64-bit words: (word_idx, word) where bit (pos & 63) of
    word[pos >> 6] is set iff some eval gram hashed to position pos
    under one of the `num_hashes` md5-salted hash functions. m_bits
    bits = m_bits/8 bytes of state regardless of eval-set size
    (<= m_bits/64 rows). Deterministic (md5), so the filter is
    reproducible and mergeable (bit_or) across engines and corpora."""
    gram = F.explode(
        T._word_ngrams(F.col(text_col), n)).alias("g")
    pos = F.explode(F.array(*[
        (T.hex_to_long(F.md5(F.concat(F.lit(f"bloom{j}:"), F.col("g"))))
         % int(m_bits))
        for j in range(int(num_hashes))
    ])).alias("pos")
    return (eval_df.select(gram).select(pos)
            .select(F.expr("pos div 64").alias("word_idx"),
                    F.expr("shiftleft(CAST(1 AS BIGINT), "
                           "CAST(pos % 64 AS INT))").alias("mask"))
            .groupBy("word_idx")
            .agg(F.bit_or("mask").alias("word")))


def decontaminate_bloom(docs: DataFrame, eval_df: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        n: int = 5, max_hits: int = 0,
                        m_bits: int = 1 << 20,
                        num_hashes: int = 5) -> DataFrame:
    """`decontaminate`, restructured for eval sets too large to
    broadcast as exact hash sets. Two passes over the corpus grams:

    1. Bloom prefilter — probe every corpus gram against the broadcast
       word table from `bloom_filter_table` (m_bits/8 bytes vs 8 bytes
       PER GRAM for the exact set: a 1B-gram eval suite is 8 GB exact
       but 128 KB..1 GB Bloom at 1..10 bits/gram). A gram survives only
       if ALL num_hashes probed bits are set. No false negatives, so
       nothing contaminated escapes.
    2. Exact confirm — join the few Bloom-positive gram occurrences
       against the true eval gram set to discard false positives. This
       join is NOT broadcast-hinted: at scale it is the shuffle join
       whose left side the Bloom just shrank by ~(1 - fp_rate); AQE
       still broadcasts it at small SF.

    Output is identical to `decontaminate` (the Bloom changes the plan,
    never the answer) — the oracle for this operator IS the exact
    decontaminate SQL.
    """
    bloom = F.broadcast(
        bloom_filter_table(eval_df, text_col, n, m_bits, num_hashes))
    grams = (docs.select(
        F.col(id_col),
        F.explode(T._word_ngrams(F.col(text_col), n)).alias("g"))
        .withColumn("gram_hash", T.token_hash(F.col("g"))))
    probes = grams.select(
        id_col, "gram_hash",
        F.posexplode(F.array(*[
            (T.hex_to_long(F.md5(F.concat(F.lit(f"bloom{j}:"),
                                          F.col("g"))))
             % int(m_bits))
            for j in range(int(num_hashes))
        ])).alias("j", "pos"))
    hit = (probes
           .select(id_col, "gram_hash",
                   F.expr("pos div 64").alias("word_idx"),
                   F.expr("shiftleft(CAST(1 AS BIGINT), "
                          "CAST(pos % 64 AS INT))").alias("mask"))
           .join(bloom, "word_idx", "left")
           .withColumn("bit_set",
                       F.coalesce(F.col("word"), F.lit(0).cast("long"))
                       .bitwiseAND(F.col("mask")) != 0))
    # A gram occurrence is a candidate iff all its probed bits are set.
    # posexplode keeps one row per (occurrence, hash j); count the set
    # bits per occurrence without collapsing repeated grams in a doc:
    # group on a per-occurrence key (id, gram_hash, occurrence index is
    # not materialized — instead require min(bit_set) over the j rows,
    # which is occurrence-invariant since bits depend only on the gram).
    cand = (hit.groupBy(id_col, "gram_hash")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum(F.col("bit_set").cast("long")).alias("n_set"))
            .filter(F.col("n_set") == F.col("n_rows"))
            .select(id_col, "gram_hash",
                    (F.col("n_rows") / int(num_hashes)).cast("long")
                    .alias("occurrences")))
    exact = (eval_gram_set(eval_df, text_col, n))
    confirmed = (cand.join(exact, "gram_hash")  # no broadcast hint: see doc
                 .groupBy(id_col)
                 .agg(F.sum("occurrences").alias("n_hits")))
    bad = (confirmed.filter(F.col("n_hits") > max_hits).select(id_col))
    return docs.join(F.broadcast(bad), id_col, "left_anti")


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


def contamination_report(docs: DataFrame, eval_df: DataFrame,
                         text_col: str = "text",
                         id_col: str = "doc_id",
                         n: int = 5) -> DataFrame:
    """Per-document contamination AUDIT — the reporting view release
    reviews need, where `decontaminate` is the filter: EVERY document
    gets (id_col, n_grams, n_hits, contamination_frac), zero-hit docs
    included, with contamination_frac = n_hits / n_grams rounded to
    6dp. Gram totals come from a codegen size() (no second explode);
    hits reuse `contamination_hits` (broadcast eval set, one explode,
    map-side-combinable count)."""
    totals = docs.select(
        F.col(id_col),
        F.size(T._word_ngrams(F.col(text_col), n)).cast("long")
        .alias("n_grams"))
    hits = contamination_hits(docs, eval_df, text_col, id_col, n)
    joined = totals.join(hits, id_col, "left")
    n_hits = F.coalesce(F.col("n_hits"), F.lit(0)).cast("long")
    return joined.select(
        id_col, "n_grams", n_hits.alias("n_hits"),
        F.when(F.col("n_grams") > 0,
               F.round(n_hits.cast("double") / F.col("n_grams"), 6))
        .otherwise(F.lit(0.0)).alias("contamination_frac"))

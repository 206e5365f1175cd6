"""Data-selection / corpus-mixing operators: DSIR hashed n-gram
importance weighting.

DSIR (Xie et al., "Data Selection for Language Models via Importance
Resampling", arXiv:2302.03169) ranks raw-corpus documents by how much
they look like a (small) target corpus, using bag-of-hashed-n-gram
unigram models:

    feature f       = md5-bucket of a word bigram, f in [0, B)
    p_X(f)          = (count_X(f) + alpha) / (total_X + alpha * B)
    log w(d)        = sum_f c_f(d) * (ln p_T(f) - ln p_R(f))

Documents with high log-weight are target-like; resampling raw data
proportionally to w recovers a target-flavored training mix (pair with
`functions.sampling.stratified_sample` / `deterministic_sample` for the
actual draw).

Scale shape: two word-count-shaped aggregations (one over the raw
corpus, one over the target — both map-side combinable), then ONE
broadcast join of the per-doc feature counts against the B-row
log-ratio table (B is a few thousand; it always broadcasts), and one
final per-doc groupBy. The corpus is scanned once for counting and once
for scoring; no windows, no driver loops — the two totals are driver
scalars injected as literals (which also lets a SQL oracle bit-match
the smoothing denominators).

The bigram-bucket hash is md5-based (`text.token_hash` family), NOT
Spark's murmur `hash()`, so any engine with md5 can reproduce the
features exactly.

No reference counterpart (net-new LLM-pipeline operator; reference repo
= OpenMined/PipelineDP).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipelinedp_spark.functions import text as T
from pipelinedp_spark.functions.text import _word_ngrams


def hashed_ngram_features(df: DataFrame,
                          text_col: str = "text",
                          id_col: str = "doc_id",
                          n: int = 2,
                          num_buckets: int = 4096) -> DataFrame:
    """(id_col, bucket, c) — per-doc hashed word-n-gram bucket counts.
    Bucket = first-15-hex-digits(md5(gram)) % num_buckets (non-negative,
    engine-portable)."""
    grams = df.select(
        F.col(id_col),
        F.explode(_word_ngrams(F.col(text_col), n)).alias("gram"))
    return (grams.select(
        F.col(id_col),
        (T.hex_to_long(F.md5(F.col("gram"))) % num_buckets).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("c")))


def dsir_log_weights(raw: DataFrame,
                     target: DataFrame,
                     text_col: str = "text",
                     id_col: str = "doc_id",
                     n: int = 2,
                     num_buckets: int = 4096,
                     alpha: float = 1.0) -> DataFrame:
    """Per-raw-document DSIR log importance weight vs the target corpus.

    Returns (id_col, n_feats, logw) where n_feats is the document's
    n-gram count and logw is rounded to 6dp. Higher = more target-like.
    """
    feats = hashed_ngram_features(raw, text_col, id_col, n, num_buckets)
    raw_counts = feats.groupBy("bucket").agg(F.sum("c").alias("c_r"))
    tgt_counts = (hashed_ngram_features(target, text_col, id_col, n,
                                        num_buckets)
                  .groupBy("bucket").agg(F.sum("c").alias("c_t")))

    tot = raw_counts.agg(F.sum("c_r").alias("t")).collect()[0]["t"]
    tot_t = tgt_counts.agg(F.sum("c_t").alias("t")).collect()[0]["t"]
    denom_r = float(tot) + alpha * num_buckets
    denom_t = float(tot_t) + alpha * num_buckets

    # B-row log-ratio table; buckets unseen in the target get the
    # smoothing floor alpha / denom_t. Only raw buckets can appear in a
    # scored document, so a left join from raw buckets is exhaustive.
    ratio = (raw_counts.join(tgt_counts, "bucket", "left")
             .select("bucket",
                     (F.log((F.coalesce(F.col("c_t"), F.lit(0)) + alpha)
                            / F.lit(denom_t))
                      - F.log((F.col("c_r") + alpha) / F.lit(denom_r)))
                     .alias("lr")))

    return (feats.join(F.broadcast(ratio), "bucket")
            .groupBy(id_col)
            .agg(F.sum("c").cast("long").alias("n_feats"),
                 F.round(F.sum(F.col("c") * F.col("lr")), 6).alias("logw")))

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
    import math

    import pandas as pd

    # Materialized once: `feats` feeds the raw-count collect AND the
    # final scoring join — un-checkpointed, the corpus explode behind
    # it would run twice.
    feats = hashed_ngram_features(raw, text_col, id_col, n,
                                  num_buckets).localCheckpoint()
    # The per-bucket count tables are <= num_buckets rows — collect them
    # ONCE and build the log-ratio table driver-side. This costs one job
    # per corpus (vs. separate totals-agg jobs plus a re-explode of the
    # raw corpus for the ratio join) and keeps the model a broadcastable
    # B-row artifact. Totals fall out of the collected rows for free.
    raw_rows = (feats.groupBy("bucket").agg(F.sum("c").alias("c_r"))
                .collect())
    tgt_rows = (hashed_ngram_features(target, text_col, id_col, n,
                                      num_buckets)
                .groupBy("bucket").agg(F.sum("c").alias("c_t"))
                .collect())
    c_r = {r["bucket"]: int(r["c_r"]) for r in raw_rows}
    c_t = {r["bucket"]: int(r["c_t"]) for r in tgt_rows}
    denom_r = float(sum(c_r.values())) + alpha * num_buckets
    denom_t = float(sum(c_t.values())) + alpha * num_buckets

    # Buckets unseen in the target get the smoothing floor
    # alpha / denom_t. Only raw buckets can appear in a scored document,
    # so enumerating raw buckets is exhaustive.
    buckets = sorted(c_r)
    lr = [math.log((c_t.get(bkt, 0) + alpha) / denom_t)
          - math.log((c_r[bkt] + alpha) / denom_r) for bkt in buckets]
    ratio = raw.sparkSession.createDataFrame(
        pd.DataFrame({"bucket": pd.Series(buckets, dtype="int64"),
                      "lr": pd.Series(lr, dtype="float64")}),
        "bucket long, lr double")

    return (feats.join(F.broadcast(ratio), "bucket")
            .groupBy(id_col)
            .agg(F.sum("c").cast("long").alias("n_feats"),
                 F.round(F.sum(F.col("c") * F.col("lr")), 6).alias("logw")))


def train_linear_classifier(sample_feats: "list[tuple[int, dict, int]]",
                            num_buckets: int,
                            iters: int = 200,
                            lr: float = 0.5,
                            l2: float = 1e-3) -> "tuple":
    """Deterministic full-batch logistic regression over hashed n-gram
    count features — the fastText-style linear text classifier used as a
    quality/domain filter in web-corpus pipelines (Joulin et al.,
    arXiv:1607.01759; the CCNet/quality-classifier role). Pure float64
    numpy, fixed iteration count, no RNG: retrains bit-identically on
    the same sample, so a SQL oracle can inject the weights as literals.

    ``sample_feats`` rows are (doc_id, {bucket: count}, label). Features
    are count-normalized per doc (x_f = c_f / n_d). Returns (w, b) with
    w shape (num_buckets,).
    """
    import numpy as np
    n = len(sample_feats)
    x = np.zeros((n, num_buckets))
    y = np.zeros(n)
    for i, (_, feats, label) in enumerate(sample_feats):
        tot = float(sum(feats.values())) or 1.0
        for bkt, c in feats.items():
            x[i, bkt] = c / tot
        y[i] = label
    w = np.zeros(num_buckets)
    b = 0.0
    for _ in range(iters):
        z = x @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * ((x.T @ g) / n + l2 * w)
        b -= lr * float(g.mean())
    return w, b


def collect_sample_features(docs: DataFrame,
                            label_expr,
                            text_col: str = "text",
                            id_col: str = "doc_id",
                            n: int = 2,
                            num_buckets: int = 1024,
                            sample_size: int = 2_000):
    """Driver-side training sample: hashed features + label for the
    `sample_size` lowest-id documents (deterministic across partition
    layouts, like `similarity.sample_corpus_matrix`). Bounded collect."""
    feats = hashed_ngram_features(
        docs.orderBy(F.col(id_col)).limit(sample_size),
        text_col, id_col, n, num_buckets)
    labels = (docs.orderBy(F.col(id_col)).limit(sample_size)
              .select(F.col(id_col), label_expr.cast("int").alias("y")))
    rows = (feats.groupBy(id_col)
            .agg(F.map_from_entries(
                F.collect_list(F.struct("bucket", "c"))).alias("m"))
            .join(labels, id_col).orderBy(id_col).collect())
    return [(r[id_col], dict(r["m"]), int(r["y"])) for r in rows]


def classifier_scores(docs: DataFrame,
                      w: "np.ndarray",
                      b: float,
                      text_col: str = "text",
                      id_col: str = "doc_id",
                      n: int = 2,
                      num_buckets: int = 1024) -> DataFrame:
    """Score every document with a trained linear classifier:
    sigmoid(b + sum_f (c_f / n_d) * w_f). Returns (id_col, score 6dp).

    Scale shape: the feature explode + groupBy is the word-count plan;
    the weight table is num_buckets rows — always broadcast; one final
    per-doc groupBy. The model is data, not code: at 100 TB you train
    once on a sample and score the corpus in a single pass.
    """
    import numpy as np
    import pandas as pd
    wa = np.asarray(w, dtype="float64")
    nz = np.nonzero(wa)[0]
    sess = docs.sparkSession
    # Arrow path (pandas input) — row-list createDataFrame costs seconds.
    wt = sess.createDataFrame(
        pd.DataFrame({"bucket": nz.astype("int64"), "w": wa[nz]}),
        "bucket long, w double")
    feats = hashed_ngram_features(docs, text_col, id_col, n, num_buckets)
    return (feats.join(F.broadcast(wt), "bucket", "left")
            .groupBy(id_col)
            .agg((F.sum(F.col("c") * F.coalesce(F.col("w"), F.lit(0.0)))
                  / F.sum("c")).alias("dot"))
            .select(F.col(id_col),
                    F.round(F.lit(1.0) /
                            (F.lit(1.0)
                             + F.exp(-(F.lit(float(b)) + F.col("dot")))),
                            6).alias("score")))


def importance_resample(weighted: DataFrame,
                        logw_col: str = "logw",
                        id_col: str = "doc_id",
                        keep_fraction: float = 0.25,
                        temperature: float = 1.0,
                        salt: str = "dsir") -> DataFrame:
    """Deterministic importance resampling over DSIR log-weights: keep
    document d with probability min(1, keep_fraction * w_d / mean(w)),
    w_d = exp(logw_d / temperature) — the Bernoulli/Poisson form of
    DSIR's resampling step (expected kept fraction <= keep_fraction,
    exact when no weight saturates the min). The coin is the md5-uniform
    of (salt, id) — `functions.sampling.hash_uniform` — so the draw is
    reproducible across runs, engines, and partition layouts.

    Scale shape: the input is materialized ONCE (`localCheckpoint`) —
    without it the mean(w) agg and the returned filter would each
    recompute the whole upstream weight pipeline (two extra corpus
    passes when fed straight from `dsir_log_weights`). Then one tiny
    agg for mean(w) (driver scalar) and a pure per-row filter — no
    shuffle beyond the input's. Returns the kept rows of ``weighted``
    unchanged.
    """
    from pipelinedp_spark.functions.sampling import hash_uniform
    weighted = weighted.localCheckpoint(eager=True)
    w = F.exp(F.col(logw_col) / temperature)
    mean_w = (weighted.agg(F.avg(w).alias("m")).collect()[0]["m"])
    if mean_w is None:  # empty input: nothing to resample
        return weighted
    keep_p = F.least(F.lit(1.0), w * (keep_fraction / float(mean_w)))
    return weighted.filter(
        hash_uniform(F.col(id_col), salt=salt) < keep_p)


def select_to_token_budget(df: DataFrame,
                           budget: int,
                           token_col: str,
                           order_col: str,
                           id_col: str = "doc_id") -> DataFrame:
    """Greedy selection to a corpus token budget: walk the documents in
    ascending ``order_col`` (the caller encodes its priority there —
    e.g. quality descending with an id tiebreak folded into one unique
    sortable key) and keep each document whose INCLUSIVE cumulative
    ``token_col`` stays within ``budget`` — the standard "best docs
    until the token budget is full" curation rule (greedy by priority,
    not knapsack-optimal; a doc that individually overflows is skipped
    only if everything before it already filled the budget).

    Returns the selected rows plus ``cum_tokens``. Scale shape: the
    cumulative count is `operators.running.running_sum` — a
    range-exchange two-phase prefix sum, never a single-task global
    window — and the budget cut is a filter on it.
    """
    from pipelinedp_spark.operators.running import running_sum
    rs = running_sum(df, order_col, token_col, "cum_tokens")
    return rs.filter(F.col("cum_tokens") <= budget)


def epoch_schedule(docs: DataFrame,
                   budget_tokens: int,
                   temperature: float = 0.7,
                   max_epochs: float = 4.0,
                   source_col: str = "source",
                   text_col: str = "text") -> DataFrame:
    """Pretraining mixture plan: given per-source token counts, a
    total token budget, and a temperature, emit each source's target
    token share and the implied epoch (repeat) factor, capped at
    ``max_epochs`` (past ~4 epochs repetition stops helping — Muennighoff
    et al. 2023). Shares follow n_s^temperature renormalized, with cap
    overflow redistributed proportionally to uncapped sources in one
    driver pass over the source-cardinality table.

    Returns (source, tokens, share, target_tokens, epochs) — the plan
    a sampler (e.g. `temperature_mix` / `select_to_token_budget`)
    executes. One combinable agg + a bounded collect; no corpus-size
    driver work."""
    from pipelinedp_spark.functions.text import token_count

    counts = {r["source"]: r["t"] for r in
              (docs.groupBy(F.col(source_col).alias("source"))
               .agg(F.sum(token_count(F.col(text_col)).cast("long"))
                    .alias("t"))).collect()}
    raw = {s: float(t) ** temperature for s, t in counts.items()}
    z = sum(raw.values())
    share = {s: raw[s] / z for s in raw}
    target = {s: share[s] * budget_tokens for s in raw}
    # Cap epochs; redistribute overflow to uncapped sources until fixed.
    for _ in range(len(raw)):
        over = {s: target[s] - max_epochs * counts[s]
                for s in target if target[s] > max_epochs * counts[s]}
        if not over:
            break
        spill = sum(over.values())
        for s in over:
            target[s] = max_epochs * counts[s]
        free = [s for s in target
                if target[s] < max_epochs * counts[s]]
        fz = sum(share[s] for s in free)
        if not fz:
            # Every source is at the epoch cap: the residual budget has
            # nowhere to go. Surface it — silently under-filling the
            # budget makes the downstream token accounting wrong.
            import warnings
            warnings.warn(
                f"epoch_schedule: {int(spill)} budget tokens cannot be "
                f"placed — all {len(target)} sources are at the "
                f"max_epochs={max_epochs} cap; sum(target_tokens) will "
                "be below budget_tokens", stacklevel=2)
            break
        for s in free:
            target[s] += spill * (share[s] / fz)
    spark = docs.sparkSession
    rows = ", ".join(
        f"('{s.replace(chr(39), chr(39) * 2)}', "
        f"{counts[s]}, {round(share[s], 6)!r}, "
        f"{int(target[s])}, {round(target[s] / counts[s], 6)!r})"
        for s in sorted(counts))
    return spark.sql(
        "SELECT source, CAST(tokens AS BIGINT) AS tokens, "
        "CAST(share AS DOUBLE) AS share, "
        "CAST(target_tokens AS BIGINT) AS target_tokens, "
        "CAST(epochs AS DOUBLE) AS epochs "
        f"FROM VALUES {rows} "
        "AS t(source, tokens, share, target_tokens, epochs)")

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

import re as _re

from typing import Sequence

import pandas as pd

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
    # ONE explode + ONE corpus-scale groupBy for ALL ns: each n's grams
    # are tagged with an `n` column inside a single flattened struct
    # array, so the corpus is scanned and shuffled once instead of once
    # per n (the per-n loop cost 3 explode+groupBy passes; at 100 TB
    # that's 3 corpus shuffles for one signal). The per-(id, n) argmax
    # and totals run over the already-aggregated (tiny) gram counts,
    # and a pivot turns n back into columns.
    # Tag via a union of per-n codegen'd explodes rather than one
    # flatten(transform(...)) struct array: higher-order lambdas run
    # interpreted (no whole-stage codegen) and measured ~45% slower than
    # the three Generate nodes, while the union still feeds the SINGLE
    # shuffle below. At 100 TB the scan repeats (2-column projection,
    # cheap) but the corpus shuffles once, not once per n.
    grams = None
    for n in ns:
        g_n = df.select(
            F.col(id_col), F.lit(n).alias("n"),
            F.explode(T._word_ngrams(F.col(text_col), n)).alias("g"))
        grams = g_n if grams is None else grams.unionByName(g_n)
    counted = grams.groupBy(id_col, "n", "g").agg(
        F.count(F.lit(1)).alias("cnt"))
    totals = counted.groupBy(id_col, "n").agg(
        F.sum(F.col("cnt") * F.length("g")).alias("total"))
    w = Window.partitionBy(id_col, "n").orderBy(F.col("cnt").desc(),
                                                F.col("g").asc())
    top = (counted.withColumn("rn", F.row_number().over(w))
           .filter(F.col("rn") == 1)
           .join(totals, [id_col, "n"])
           .select(F.col(id_col), F.col("n"),
                   F.when(F.col("total") > 0,
                          F.round((F.col("cnt") * F.length("g"))
                                  .cast("double") / F.col("total"), 6))
                   .otherwise(F.lit(0.0)).alias("frac")))
    pivoted = (top.groupBy(id_col).pivot("n", list(ns))
               .agg(F.first("frac")))
    for n in ns:
        pivoted = pivoted.withColumnRenamed(str(n), f"top_{n}gram_frac")
    out = df.select(id_col).join(pivoted, id_col, "left")
    fills = {f"top_{n}gram_frac": 0.0 for n in ns}
    return out.fillna(fills)


def unigram_perplexity(df: DataFrame,
                       text_col: str = "text",
                       id_col: str = "doc_id",
                       broadcast_vocab: bool = True) -> DataFrame:
    """Per-document perplexity under a unigram LM fit on the corpus
    itself — the cheap end of CCNet-style LM quality filtering (Wenzek et
    al., arXiv:1911.00359, which uses a KenLM 5-gram; the unigram variant
    needs no model artifact and is fully aggregation-expressible, so it
    is exactly SQL-oracle-checkable).

    ppl(d) = exp(ln N - (1/n_d) * sum_{t in d} ln c_t) where c_t is the
    corpus count of token t and N the corpus token total. Low ppl = the
    document is made of common tokens (boilerplate-ish); high ppl = rare
    tokens (noise-ish). MLE, no smoothing — every scored token came from
    the corpus, so c_t >= 1.

    Scale shape: one explode + one map-side-combinable groupBy for the
    vocab counts; the (token -> ln count) join is broadcast when
    ``broadcast_vocab`` (vocabularies are ~10^6-10^7 rows even at web
    scale — far under broadcast limits); set False to fall back to a
    shuffle join for pathological vocabularies. Per-doc reduction is one
    more map-side-combinable groupBy. No windows, no driver loops.

    Returns (id_col, n_tokens, ppl) with ppl rounded to 6dp.
    """
    import math
    toks = df.select(F.col(id_col),
                     F.explode(T.tokens(F.col(text_col))).alias("tok"))
    # Materialized once: the vocab feeds the total collect AND the
    # scoring join — un-checkpointed, the corpus explode behind it
    # would run twice.
    vocab = toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("double").alias("c")).localCheckpoint()
    total = vocab.agg(F.sum("c").alias("n")).collect()[0]["n"]
    if total is None:  # empty corpus: no tokens, no scorable docs
        total = 1.0
    v = F.broadcast(vocab) if broadcast_vocab else vocab
    return (toks.join(v, "tok")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.sum(F.log("c")).alias("sum_ln_c"))
            .select(F.col(id_col),
                    F.col("n_tokens").cast("long").alias("n_tokens"),
                    F.round(F.exp(F.lit(math.log(float(total)))
                                  - F.col("sum_ln_c")
                                  / F.col("n_tokens")), 6).alias("ppl")))


def bigram_perplexity(df: DataFrame,
                      text_col: str = "text",
                      id_col: str = "doc_id",
                      lam: float = 0.75,
                      broadcast_model: bool = True) -> DataFrame:
    """Per-document perplexity under an interpolated bigram LM fit on
    the corpus — one rung up from `unigram_perplexity` toward CCNet's
    KenLM filter, still fully aggregation-expressible:

        p(w | v) = lam * c(v,w)/c(v) + (1 - lam) * c(w)/N
        lp(d)    = ln p(w_0) + sum_{i>=1} ln p(w_i | w_{i-1})
        ppl(d)   = exp(-lp(d) / n_d)       (first token scored unigram)

    Every scored bigram occurs in the corpus, so c(v,w) >= 1 and the
    interpolation never needs a zero guard.

    Scale shape: two word-count aggregations (unigram + bigram tables),
    then per-doc (v, w) pairs join the model tables — broadcast when
    ``broadcast_model`` (bigram vocabularies are corpus-dependent; set
    False to shuffle-join when the bigram table outgrows broadcast), and
    one final per-doc groupBy. Pairs come from zip-sliced token arrays
    (codegen), not positional windows.

    Returns (id_col, n_tokens, ppl) with ppl rounded to 6dp.
    """
    import math
    t = T.tokens(F.col(text_col))
    n = F.size(t)
    pairs_arr = F.arrays_zip(F.slice(t, 1, n - 1).alias("v"),
                             F.slice(t, 2, n - 1).alias("w"))
    pairs = (df.select(F.col(id_col), F.explode(pairs_arr).alias("p"))
             .select(F.col(id_col), F.col("p.v").alias("v"),
                     F.col("p.w").alias("w")))
    toks = df.select(F.col(id_col), F.explode(t).alias("tok"))

    # Model tables materialized once: `uni` feeds the total collect and
    # THREE scoring joins, `big` one join — un-checkpointed, each use
    # re-explodes the corpus.
    uni = toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("double").alias("c_w")).localCheckpoint()
    big = pairs.groupBy("v", "w").agg(
        F.count(F.lit(1)).cast("double").alias("c_vw")).localCheckpoint()
    total = uni.agg(F.sum("c_w").alias("n")).collect()[0]["n"] or 0.0
    ln_n = math.log(float(total)) if total else 0.0

    uni_b = F.broadcast(uni) if broadcast_model else uni
    big_b = F.broadcast(big) if broadcast_model else big

    # First token of each doc: unigram log-prob ln(c_w) - ln(N).
    first = (df.select(F.col(id_col),
                       F.element_at(t, 1).alias("tok"))
             .join(uni_b, "tok")
             .select(F.col(id_col),
                     (F.log("c_w") - F.lit(ln_n)).alias("lp")))
    # Bigram positions: interpolated conditional.
    ctx = uni_b.select(F.col("tok").alias("v"),
                       F.col("c_w").alias("c_v"))
    cond = (pairs.join(big_b, ["v", "w"])
            .join(F.broadcast(ctx) if broadcast_model else ctx, "v")
            .join(uni_b.select(F.col("tok").alias("w"),
                               F.col("c_w")), "w")
            .select(F.col(id_col),
                    F.log(F.lit(lam) * (F.col("c_vw") / F.col("c_v"))
                          + F.lit(1.0 - lam)
                          * (F.col("c_w") / F.lit(float(total))))
                    .alias("lp")))
    lens = df.select(F.col(id_col), n.cast("long").alias("n_tokens"))
    return (first.unionByName(cond)
            .groupBy(id_col)
            .agg(F.sum("lp").alias("lp"))
            .join(lens, id_col)
            .select(F.col(id_col), F.col("n_tokens"),
                    F.round(F.exp(-F.col("lp") / F.col("n_tokens")), 6)
                    .alias("ppl")))


def ngram_novelty(df: DataFrame,
                  text_col: str = "text",
                  id_col: str = "doc_id",
                  n: int = 5) -> DataFrame:
    """Cross-document n-gram novelty: per document, the fraction of its
    DISTINCT word n-grams that occur in no other document (document
    frequency 1 corpus-wide). High novelty = original content; low =
    boilerplate/templates shared across the corpus — a cross-doc signal
    the within-doc repetition rules (`functions.text`) cannot see, and
    the scoring-side analogue of the dedup stack's shared-gram indexes.

    Scale shape: one explode of per-doc distinct grams; the per-gram
    document-frequency table is a map-side-combinable groupBy,
    localCheckpoint'd (vocabulary-of-grams-sized — far smaller than the
    exploded corpus) so the count and the scoring join don't each re-run
    the explode chain; the scoring join shuffles on the gram (no
    broadcast — the gram table grows with corpus vocabulary); the per-doc
    reduction is one more combinable groupBy. No windows, no driver
    loops.

    Returns (id_col, n_grams bigint, novelty double) with novelty
    rounded to 6dp; documents shorter than n tokens have exactly one
    gram (the whole text — the `_word_ngrams` rule), scored like any
    other.
    """
    grams = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(T._word_ngrams(F.col(text_col), n)))
        .alias("gram"))
    gram_df = grams.groupBy("gram").agg(
        F.count(F.lit(1)).alias("df")).localCheckpoint()
    return (grams.join(gram_df, "gram")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_grams"),
                 F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
                 .alias("unique"))
            .select(F.col(id_col),
                    F.col("n_grams").cast("long").alias("n_grams"),
                    F.round(F.col("unique").cast("double")
                            / F.col("n_grams"), 6).alias("novelty")))


def paragraph_perplexity_filter(df: DataFrame,
                                text_col: str = "text",
                                id_col: str = "doc_id",
                                max_ppl: float = 1000.0,
                                delimiter: str = "\n",
                                broadcast_vocab: bool = True) -> DataFrame:
    """CCNet-style PARAGRAPH-level LM filtering (Wenzek et al.,
    arXiv:1911.00359 §4.4 scores and filters at paragraph granularity,
    not document granularity): split each document into paragraphs,
    score every paragraph's perplexity under a unigram LM fit on the
    whole corpus (same MLE model as `unigram_perplexity`), DROP
    paragraphs with ppl > ``max_ppl`` (rare-token noise), and rebuild
    the documents from the survivors in order.

    Returns (id_col, clean_text, n_paragraphs, n_dropped) — one row per
    input document; clean_text = '' when every paragraph drops.

    Scale shape: one posexplode to paragraphs + one explode to tokens;
    vocab is ONE map-side-combinable groupBy, localCheckpoint'd because
    it feeds the total-count collect AND the scoring join (broadcast —
    vocabularies are far under broadcast limits at any corpus size; set
    ``broadcast_vocab=False`` for pathological token spaces); the
    per-paragraph reduction and the per-doc rebuild are two more
    map-side-combinable groupBys. No windows, no driver loops beyond
    the single scalar N.
    """
    import math
    paras = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col),
                             _re.escape(delimiter)))
        .alias("__pos__", "__para__"))
    toks = paras.select(
        F.col(id_col), "__pos__",
        F.explode(T.tokens(F.col("__para__"))).alias("tok"))
    vocab = toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("double").alias("c")).localCheckpoint()
    total = vocab.agg(F.sum("c").alias("n")).collect()[0]["n"]
    if total is None:
        total = 1.0
    v = F.broadcast(vocab) if broadcast_vocab else vocab
    scored = (toks.join(v, "tok")
              .groupBy(id_col, "__pos__")
              .agg(F.count(F.lit(1)).alias("n_toks"),
                   F.sum(F.log("c")).alias("sum_ln_c"))
              .select(F.col(id_col), "__pos__",
                      F.round(F.exp(F.lit(math.log(float(total)))
                                    - F.col("sum_ln_c")
                                    / F.col("n_toks")), 6)
                      .alias("__ppl__")))
    tagged = (paras.join(scored, [id_col, "__pos__"])
              .withColumn("__drop__", F.col("__ppl__") > max_ppl))
    return (tagged.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(
                    F.when(~F.col("__drop__"),
                           F.struct(F.col("__pos__").alias("p"),
                                    F.col("__para__").alias("t"))))),
                lambda s: s["t"]),
            delimiter).alias("clean_text"),
        F.count(F.lit(1)).cast("long").alias("n_paragraphs"),
        F.sum(F.col("__drop__").cast("long")).cast("long")
        .alias("n_dropped")))


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have",
                    "with")


def gopher_quality_filter(df: DataFrame,
                          text_col: str = "text",
                          id_col: str = "doc_id",
                          min_words: int = 50,
                          max_words: int = 100_000,
                          min_mean_word_len: float = 3.0,
                          max_mean_word_len: float = 10.0,
                          max_symbol_word_ratio: float = 0.1,
                          max_bullet_frac: float = 0.9,
                          max_ellipsis_frac: float = 0.3,
                          max_dup_line_frac: float = 0.3,
                          max_dup_line_char_frac: float = 0.2,
                          max_top2gram_frac: float = 0.2,
                          max_dup5gram_frac: float = 0.15,
                          min_alpha_word_frac: float = 0.8,
                          min_stopword_hits: int = 2) -> DataFrame:
    """Gopher document-quality filter (Rae et al. 2021, Table A1
    thresholds as defaults): per-doc boolean rule columns + an overall
    ``passes``. Returns (id_col, n_words, ok_words, ok_word_len,
    ok_symbol, ok_lines, ok_dup_lines, ok_top2gram, ok_dup5gram,
    ok_alpha, ok_stopwords, passes). The stopword rule is Gopher's
    "contains >= 2 of {the, be, to, of, and, that, have, with}"
    (distinct hits), matched case-insensitively against
    punctuation-stripped tokens so 'The' and 'the,' count (Rae et
    al.'s rule on unnormalized text).

    Scale shape: every rule except the top-2-gram one is a pure
    per-row codegen expression (the four line rules come from ONE
    split via `text.line_signals`); the top-2-gram fraction is the one
    corpus shuffle (word-count plan in `top_ngram_char_fraction`).
    Thresholds compare 6dp-rounded signals so the decision is
    engine-portable (the same comparison is expressible in ANSI SQL).
    """
    t = F.col(text_col)
    n = T.token_count(t)
    sig = T.line_signals(t)
    alpha = (F.size(F.filter(T.tokens(t),
                             lambda x: x.rlike("[A-Za-z]")))
             .cast("double") / F.greatest(n, F.lit(1)))
    base = df.select(
        F.col(id_col),
        n.cast("long").alias("n_words"),
        ((n >= min_words) & (n <= max_words)).alias("ok_words"),
        ((F.round(T.avg_token_length(t), 6) >= min_mean_word_len)
         & (F.round(T.avg_token_length(t), 6) <= max_mean_word_len))
        .alias("ok_word_len"),
        (T.symbol_word_ratio(t) <= max_symbol_word_ratio)
        .alias("ok_symbol"),
        ((sig["bullet_line_frac"] <= max_bullet_frac)
         & (sig["ellipsis_line_frac"] <= max_ellipsis_frac))
        .alias("ok_lines"),
        ((sig["dup_line_frac"] <= max_dup_line_frac)
         & (sig["dup_line_char_frac"] <= max_dup_line_char_frac))
        .alias("ok_dup_lines"),
        (T.duplicate_ngram_char_fraction(t, 5) <= max_dup5gram_frac)
        .alias("ok_dup5gram"),
        (F.round(alpha, 6) >= min_alpha_word_frac).alias("ok_alpha"),
        (F.size(F.array_intersect(
            F.array_distinct(F.transform(
                T.tokens(t),
                lambda x: F.regexp_replace(F.lower(x), "[^a-z]", ""))),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])))
         >= min_stopword_hits).alias("ok_stopwords"))
    top = top_ngram_char_fraction(df, text_col, id_col, ns=(2,))
    out = base.join(
        top.select(F.col(id_col),
                   (F.col("top_2gram_frac") <= max_top2gram_frac)
                   .alias("ok_top2gram")),
        id_col)
    rules = ["ok_words", "ok_word_len", "ok_symbol", "ok_lines",
             "ok_dup_lines", "ok_top2gram", "ok_dup5gram", "ok_alpha",
             "ok_stopwords"]
    passes = rules[0]
    acc = F.col(rules[0])
    for r in rules[1:]:
        acc = acc & F.col(r)
    return out.select(id_col, "n_words", *rules, acc.alias("passes"))


def compression_ratio_udf():
    """Arrow-batched zlib compression ratio (compressed/raw bytes):
    templated or repetitive text compresses far below natural prose,
    making this a cheap model-free boilerplate signal (used alongside
    the Gopher rules in CCNet/RedPajama-style pipelines). Python is
    unavoidable (no codegen deflate) but it is one stdlib C call per
    row over Arrow batches — no row-at-a-time overhead. Empty text
    scores 1.0."""
    import zlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _ratio(text: pd.Series) -> pd.Series:
        def one(t):
            if not t:
                return 1.0
            raw = t.encode("utf-8", "replace")
            return round(len(zlib.compress(raw, 6)) / len(raw), 6)
        return text.map(one)

    return _ratio


def compression_band_filter(df: DataFrame,
                            text_col: str = "text",
                            min_ratio: float = 0.25,
                            max_ratio: float = 1.05) -> DataFrame:
    """Keep docs whose compression ratio falls in the natural-text
    band: below `min_ratio` is near-duplicate boilerplate/templating,
    above `max_ratio` is binary-ish noise. Adds `compression_ratio`
    and filters."""
    ratio = compression_ratio_udf()
    return (df.withColumn("compression_ratio",
                          ratio(F.col(text_col)))
            .filter((F.col("compression_ratio") >= min_ratio)
                    & (F.col("compression_ratio") <= max_ratio)))


C4_BAD_SUBSTRINGS = ("lorem ipsum", "{", "javascript must be enabled")


def c4_filter(df: DataFrame,
              text_col: str = "text",
              id_col: str = "doc_id",
              min_line_words: int = 3,
              min_sentences: int = 3,
              delimiter_regex: str = r"\r?\n") -> DataFrame:
    """The C4 cleaning ruleset (Raffel et al. 2020, "Exploring the
    Limits of Transfer Learning", §2.2) — the other canonical web-text
    filter next to Gopher: LINE level, keep only lines that end in
    terminal punctuation per Raffel et al.'s rule ('.', '!', '?', or a
    closing quotation mark — tensorflow_datasets c4_utils' _END_MARKS)
    and have at least ``min_line_words`` words; DOC level, a page
    passes only if its RETAINED text still has >= ``min_sentences``
    sentence terminators and contains none of the `C4_BAD_SUBSTRINGS`
    (code braces, lorem ipsum, JS-disabled boilerplate; matched
    case-insensitively on the original text).

    ``delimiter_regex`` is a Java REGEX (named so call sites can't
    mistake it for a literal — '|' or '.' must be escaped); the default
    splits '\\r?\\n' so CRLF corpora don't leave a trailing '\\r' that
    defeats the terminal-punctuation test (which would empty whole
    documents). Retained lines always rejoin with '\\n'.

    Returns (id_col, clean_text, n_lines_kept, n_lines_total,
    n_sentences, has_bad_substring, passes). Pure per-row codegen —
    one split, higher-order filter, regexp counts; no shuffle at all,
    which is what makes C4-style cleaning free at 100 TB."""
    t = F.col(text_col)
    lines = F.split(t, delimiter_regex)
    keep_line = lambda x: (
        F.trim(x).rlike("[.!?\"”’']$")
        & (F.size(F.filter(F.split(F.trim(x), " "),
                           lambda w: w != "")) >= min_line_words))
    kept = F.filter(lines, keep_line)
    # Rejoin with a normalized '\n' (delimiter_regex is a split REGEX,
    # not a join literal); trim also strips any '\r' a CRLF split left
    # behind.
    clean = F.array_join(
        F.transform(kept, lambda x: F.trim(F.regexp_replace(
            x, "\r", ""))), "\n")
    n_sent = F.size(F.regexp_extract_all(clean, F.lit("[.!?]"), 0))
    low = F.lower(t)
    bad = None
    for s in C4_BAD_SUBSTRINGS:
        c = low.contains(s.lower())
        bad = c if bad is None else (bad | c)
    return df.select(
        F.col(id_col),
        clean.alias("clean_text"),
        F.size(kept).cast("long").alias("n_lines_kept"),
        F.size(lines).cast("long").alias("n_lines_total"),
        n_sent.cast("long").alias("n_sentences"),
        bad.alias("has_bad_substring"),
        ((n_sent >= min_sentences) & ~bad).alias("passes"))

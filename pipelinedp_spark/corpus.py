"""Fluent corpus-pipeline facade over the LLM-data operators.

One chainable object for the standard training-data flow — each stage
delegates to the operator modules (which remain the primary, fully
parameterized API) and returns a new immutable `CorpusPipeline`:

    from pipelinedp_spark.corpus import CorpusPipeline

    clean = (CorpusPipeline(docs)
             .exact_dedup()
             .near_dedup(jaccard_threshold=0.8)
             .quality_band(0.05, 0.95)
             .decontaminate(eval_df)
             .classifier_filter(w, b, min_score=0.5)
             .sample(0.5)
             .df)
    chunks = CorpusPipeline(clean).chunk(chunk_tokens=512, overlap=64).df

Most stages are lazy (pure DataFrame transforms); the exceptions run
work at *construction* time: `quality_band` computes quantiles and
`dsir_select` a mean weight driver-side, and `near_dedup` /
`dedup_against(near=True)` / `dsir_select` trigger eager
`localCheckpoint` jobs inside the delegated operators (which also
trades fault tolerance for speed — checkpoint blocks are not
recomputed on executor loss; at very large scale prefer a persisted
table between stages). Nothing here adds shuffles beyond the
delegated operators' documented shapes.

No reference counterpart (net-new; the reference's fluent surface is
the DP QueryBuilder, mirrored in `dataframes.py`).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipelinedp_spark.functions import text as T


class CorpusPipeline:
    """Immutable chainable wrapper around a documents DataFrame with
    (id_col, text_col) columns; `.df` unwraps at any point."""

    def __init__(self, df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id"):
        self.df = df
        self.text_col = text_col
        self.id_col = id_col

    def _with(self, df: DataFrame) -> "CorpusPipeline":
        return CorpusPipeline(df, self.text_col, self.id_col)

    # -- dedup ---------------------------------------------------------

    def exact_dedup(self) -> "CorpusPipeline":
        """Keep the lowest-id document per normalized fingerprint."""
        from pipelinedp_spark.operators.dedup import exact_dedup
        keep = exact_dedup(self.df, self.text_col, self.id_col) \
            .select(self.id_col)
        return self._with(self.df.join(keep, self.id_col, "left_semi"))

    def near_dedup(self, jaccard_threshold: float = 0.8,
                   **kw) -> "CorpusPipeline":
        """Drop the larger id of every MinHash-LSH near-dup pair."""
        from pipelinedp_spark.operators.dedup import minhash_lsh_pairs
        pairs = minhash_lsh_pairs(self.df, self.text_col, self.id_col,
                                  jaccard_threshold=jaccard_threshold,
                                  **kw)
        dups = pairs.select(F.col("id_b").alias(self.id_col)).distinct()
        return self._with(self.df.join(dups, self.id_col, "left_anti"))

    def dedup_against(self, reference: DataFrame,
                      near: bool = False, **kw) -> "CorpusPipeline":
        """Incremental-ingestion dedup vs an existing corpus (exact
        fingerprints, or MinHash near-dup with ``near=True``)."""
        from pipelinedp_spark.operators.dedup import (cross_corpus_dedup,
                                                      cross_corpus_near_dup)
        fn = cross_corpus_near_dup if near else cross_corpus_dedup
        out = fn(self.df, reference, self.text_col, self.id_col, **kw)
        return self._with(out.select(*self.df.columns))

    # -- quality -------------------------------------------------------

    def quality_band(self, lo_q: float = 0.05,
                     hi_q: float = 0.95) -> "CorpusPipeline":
        """Keep docs inside the [lo_q, hi_q] unigram-perplexity quantile
        band (drops junk and boilerplate tails). Runs one quantile
        computation driver-side."""
        from pipelinedp_spark.operators.quality import unigram_perplexity
        ppl = unigram_perplexity(self.df, self.text_col, self.id_col)
        qs = ppl.approxQuantile("ppl", [lo_q, hi_q], 0.0)
        if not qs:  # empty corpus: nothing to band
            return self
        lo, hi = qs
        keep = ppl.filter(F.col("ppl").between(lo, hi)) \
            .select(self.id_col)
        return self._with(self.df.join(keep, self.id_col, "left_semi"))

    def quality_filter(self, min_score: float = 0.3,
                       **kw) -> "CorpusPipeline":
        """Keep docs whose composite `text.quality_score` clears
        ``min_score``."""
        return self._with(self.df.filter(
            T.quality_score(F.col(self.text_col), **kw) >= min_score))

    def classifier_filter(self, w, b: float, min_score: float = 0.5,
                          **kw) -> "CorpusPipeline":
        """Keep docs a trained linear classifier scores above
        ``min_score`` (see `mixing.train_linear_classifier`)."""
        from pipelinedp_spark.operators.mixing import classifier_scores
        scores = classifier_scores(self.df, w, b, self.text_col,
                                   self.id_col, **kw)
        keep = scores.filter(F.col("score") >= min_score) \
            .select(self.id_col)
        return self._with(self.df.join(keep, self.id_col, "left_semi"))

    def normalize(self, lowercase: bool = False,
                  keep_newlines: bool = True,
                  nfkc: bool = False) -> "CorpusPipeline":
        """Codegen text normalization in place (control strip, CRLF,
        whitespace collapse) — run FIRST so fingerprints compare
        like-for-like. Lazy, zero Python per row. With ``nfkc``, an
        Arrow-batched Unicode NFKC pass runs FIRST (fullwidth/ligature
        folding so multilingual fingerprints converge) — the one
        Python step in the text stack; still lazy."""
        from pipelinedp_spark.functions.text import (normalize_text,
                                                     unicode_normalize)
        col = F.col(self.text_col)
        if nfkc:
            col = unicode_normalize(col, "NFKC")
        return self._with(self.df.withColumn(
            self.text_col,
            normalize_text(col, lowercase, keep_newlines)))

    def line_dedup(self, min_docs: int = 2, group_col=None,
                   delimiter: str = "\n") -> "CorpusPipeline":
        """Strip corpus-level boilerplate lines (RefinedWeb rule) and
        rebuild each document's text in place. Triggers no job; lazy."""
        from pipelinedp_spark.operators.dedup import line_dedup
        cleaned = line_dedup(self.df, self.text_col, self.id_col,
                             min_docs, group_col, delimiter)
        return self._with(self.df.drop(self.text_col).join(
            cleaned.select(self.id_col,
                           F.col("clean_text").alias(self.text_col)),
            self.id_col))

    def sentence_dedup(self, min_docs: int = 2, group_col=None,
                       min_chars: int = 0) -> "CorpusPipeline":
        """Strip sentences shared by >= min_docs docs (taglines and
        disclaimers inside otherwise-unique paragraphs) and rebuild
        each document's text in place. Lazy; same plan shape as
        line_dedup."""
        from pipelinedp_spark.operators.dedup import sentence_dedup
        cleaned = sentence_dedup(self.df, self.text_col, self.id_col,
                                 min_docs, group_col, min_chars)
        return self._with(self.df.drop(self.text_col).join(
            cleaned.select(self.id_col,
                           F.col("clean_text").alias(self.text_col)),
            self.id_col))

    def paragraph_filter(self, max_ppl: float = 1000.0,
                         delimiter: str = "\n") -> "CorpusPipeline":
        """CCNet paragraph-level LM filter: drop rare-token paragraphs
        (corpus-fit unigram ppl > max_ppl), rebuild text in place.
        EAGER: the vocab total is one scalar collect."""
        from pipelinedp_spark.operators.quality import (
            paragraph_perplexity_filter)
        cleaned = paragraph_perplexity_filter(
            self.df, self.text_col, self.id_col, max_ppl, delimiter)
        return self._with(self.df.drop(self.text_col).join(
            cleaned.select(self.id_col,
                           F.col("clean_text").alias(self.text_col)),
            self.id_col))

    def token_budget(self, budget: int) -> "CorpusPipeline":
        """Greedy keep-the-longest selection to a corpus token budget
        (whitespace tokens; distributed prefix sum, no global window).
        The fold-into-one-key tiebreak assumes non-negative ids below
        2^40 AND token counts below 2^23 (~8M tokens/doc) — beyond
        either, build your own unique order key and call
        `mixing.select_to_token_budget` directly. The bounds are
        enforced lazily in the plan (per-row assert_true — zero extra
        scan): an out-of-range id/doc raises at execution instead of
        producing a silently wrong order key."""
        from pipelinedp_spark.operators.mixing import select_to_token_budget
        in_bounds = ((F.col(self.id_col) >= 0)
                     & (F.col(self.id_col) < F.lit(1 << 40))
                     & (F.col("__nt__") < F.lit(1 << 23)))
        guard = F.assert_true(
            in_bounds,
            F.concat(
                F.lit("CorpusPipeline.token_budget: key fold needs "
                      "0 <= id < 2^40 and tokens/doc < 2^23; got id="),
                F.col(self.id_col).cast("string"),
                F.lit(" tokens="), F.col("__nt__").cast("string"),
                F.lit(". Build a unique order key and call "
                      "mixing.select_to_token_budget directly.")))
        keyed = self.df.withColumn(
            "__nt__", F.size(F.split(F.col(self.text_col), " "))
            .cast("long")).withColumn(
            "__ord__", F.when(
                guard.isNull(),
                (-F.col("__nt__") * F.lit(1 << 40)
                 + F.col(self.id_col))).cast("long"))
        out = select_to_token_budget(keyed, budget, "__nt__", "__ord__",
                                     self.id_col)
        return self._with(out.drop("__nt__", "__ord__", "cum_tokens"))

    def scrub_pii(self) -> "CorpusPipeline":
        """Replace emails/phones/SSNs/IPs with typed placeholders."""
        return self._with(self.df.withColumn(
            self.text_col, T.scrub_pii(F.col(self.text_col))))

    def pii_audit_scrub(self, types=None) -> "CorpusPipeline":
        """Full-surface PII scrub (`functions.pii.redact_pii`: email,
        Luhn-gated card runs, SSN, phone, IPv4 — superset of
        `scrub_pii`'s minimal pattern set), typed placeholders applied
        in the module's fixed order. Map-only codegen; lazy."""
        from pipelinedp_spark.functions.pii import redact_pii
        return self._with(self.df.withColumn(
            self.text_col, redact_pii(F.col(self.text_col), types)))

    def exact_substr_dedup(self, min_len: int = 64,
                           seed_len: int = 16) -> "CorpusPipeline":
        """Lee et al. ExactSubstr dedup in place: every duplicated
        character run of >= min_len is cut from all but its globally
        first occurrence and the text rebuilt
        (`dedup.duplicate_spans_exact` + `dedup.cut_spans`)."""
        from pipelinedp_spark.operators.dedup import (cut_spans,
                                                      duplicate_spans_exact)
        spans = duplicate_spans_exact(self.df, self.text_col,
                                      self.id_col, min_len, seed_len)
        cleaned = cut_spans(self.df, spans, self.text_col, self.id_col)
        return self._with(self.df.drop(self.text_col).join(
            cleaned.select(self.id_col,
                           F.col("clean_text").alias(self.text_col)),
            self.id_col))

    # -- decontamination ----------------------------------------------

    def decontaminate_spans(self, eval_df: DataFrame,
                            min_len: int = 50,
                            seed_len: int = 16) -> "CorpusPipeline":
        """Span-level eval decontamination: cut the overlapping
        character ranges, keep the document
        (`dedup.cross_corpus_spans` + `cut_spans`) — the surgical
        alternative to `decontaminate`'s whole-doc drop."""
        from pipelinedp_spark.operators.dedup import (cross_corpus_spans,
                                                      cut_spans)
        spans = cross_corpus_spans(self.df, eval_df, self.text_col,
                                   self.id_col, min_len, seed_len)
        cleaned = cut_spans(self.df, spans, self.text_col, self.id_col)
        return self._with(self.df.drop(self.text_col).join(
            cleaned.select(self.id_col,
                           F.col("clean_text").alias(self.text_col)),
            self.id_col))

    def decontaminate(self, eval_df: DataFrame,
                      **kw) -> "CorpusPipeline":
        """Drop docs overlapping an eval set's n-grams."""
        from pipelinedp_spark.operators.decontam import decontaminate
        out = decontaminate(self.df, eval_df, text_col=self.text_col,
                            id_col=self.id_col, **kw)
        return self._with(out.select(*self.df.columns))

    # -- embedding-side curation ----------------------------------------

    def embed(self, dim: int = 16) -> "CorpusPipeline":
        """Attach a model-free hashed embedding column (md5 token
        vectors, L2-normalized bag sums) — the embed stage feeding the
        semantic stages below when no external encoder output exists."""
        from pipelinedp_spark.functions.embeddings import (
            hashed_embeddings)
        emb = hashed_embeddings(self.df, text_col=self.text_col,
                                id_col=self.id_col, dim=dim)
        return self._with(self.df.join(emb, self.id_col))

    def semantic_dedup(self, threshold: float = 0.95,
                       **kw) -> "CorpusPipeline":
        """SemDeDup over an `embedding` column (run `.embed()` first if
        the corpus has none)."""
        from pipelinedp_spark.operators.semdedup import semantic_dedup
        kept = semantic_dedup(self.df.select(self.id_col, "embedding"),
                              id_col=self.id_col,
                              cosine_threshold=threshold, **kw)
        keep_ids = kept.filter(~F.col("is_dup")).select(self.id_col)
        return self._with(self.df.join(keep_ids, self.id_col))

    def cluster_balance(self, k: int = 8, per_cluster: int = 1000,
                        **kw) -> "CorpusPipeline":
        """Cap every k-means topic at `per_cluster` docs (requires an
        `embedding` column): the head topic of a crawl cannot drown
        the tail. Eager stage — fits centroids at call time."""
        from pipelinedp_spark.operators.clustering import (
            cluster_balanced_sample)
        keep = cluster_balanced_sample(
            self.df, k=k, per_cluster=per_cluster, id_col=self.id_col,
            vec_col="embedding", **kw).select(self.id_col)
        return self._with(self.df.join(keep, self.id_col))

    # -- selection / mixing -------------------------------------------

    def sample(self, fraction: float,
               salt: str = "corpus") -> "CorpusPipeline":
        """Deterministic md5-hash sample (reproducible across runs)."""
        from pipelinedp_spark.functions.sampling import deterministic_sample
        return self._with(deterministic_sample(
            self.df, self.id_col, fraction, salt=salt))

    def stratified(self, strata_col: str, fractions: dict,
                   default_fraction: float = 1.0) -> "CorpusPipeline":
        """Per-stratum deterministic mixing (e.g. downsample English)."""
        from pipelinedp_spark.functions.sampling import stratified_sample
        return self._with(stratified_sample(
            self.df, self.id_col, strata_col, fractions,
            default_fraction=default_fraction))

    def dsir_select(self, target: DataFrame, keep_fraction: float = 0.25,
                    **kw) -> "CorpusPipeline":
        """DSIR importance resampling toward a target corpus."""
        from pipelinedp_spark.operators.mixing import (dsir_log_weights,
                                                       importance_resample)
        weights = dsir_log_weights(self.df, target, self.text_col,
                                   self.id_col, **kw)
        kept = importance_resample(weights, id_col=self.id_col,
                                   keep_fraction=keep_fraction) \
            .select(self.id_col)
        return self._with(self.df.join(kept, self.id_col, "left_semi"))

    # -- layout --------------------------------------------------------

    def chunk(self, chunk_tokens: int = 256,
              overlap: int = 32) -> "CorpusPipeline":
        """Sliding-window chunks; the result's text column is `chunk`."""
        from pipelinedp_spark.operators.packing import chunk_documents
        out = chunk_documents(self.df, chunk_tokens, overlap,
                              self.text_col, self.id_col)
        return CorpusPipeline(out, text_col="chunk", id_col=self.id_col)

    def pack(self, seq_len: int, **kw) -> "CorpusPipeline":
        """Concat-and-chunk sequence placement (GPT-style packing)."""
        from pipelinedp_spark.operators.packing import pack_sequences
        return self._with(pack_sequences(self.df, seq_len,
                                         text_col=self.text_col,
                                         id_col=self.id_col, **kw))

    def split(self, fractions: Optional[dict] = None) -> DataFrame:
        """Deterministic train/val/test assignment; returns the
        (id, split) DataFrame (terminal — not chainable)."""
        from pipelinedp_spark.functions.sampling import deterministic_split
        return deterministic_split(
            self.df.select(self.id_col), self.id_col,
            fractions or {"train": 0.8, "val": 0.1, "test": 0.1})

    # -- introspection -------------------------------------------------

    def manifest(self, group_col: str = "source") -> DataFrame:
        """Per-group release manifest (counts + order-insensitive XOR
        content checksum) for the CURRENT pipeline state — emit once
        per published snapshot (`operators.release.corpus_manifest`).
        Terminal (returns the manifest DataFrame, not a pipeline)."""
        from pipelinedp_spark.operators.release import corpus_manifest
        return corpus_manifest(self.df, group_col, self.text_col,
                               self.id_col)

    def count(self) -> int:
        return self.df.count()


    # -- DP release ----------------------------------------------------

    def dp_token_stats(self, budget, group_col: str,
                       public_keys: Sequence,
                       max_tokens_per_doc: float = 1000.0,
                       noise_mode: str = "secure") -> DataFrame:
        """Differentially private per-group doc and token counts over
        THIS corpus, with the document as the privacy unit — the
        training-data release shape (each doc influences exactly its
        own group, token counts clipped). Returns (group_col, n_docs,
        dp_tokens). ``budget`` is a `pipelinedp_spark.Budget`.
        """
        import pipelinedp_spark as pds
        with_tokens = self.df.select(
            F.col(self.id_col), F.col(group_col),
            T.token_count(F.col(self.text_col)).cast("double")
            .alias("n_tokens"))
        query = (pds.QueryBuilder(with_tokens, self.id_col)
                 .groupby(group_col, max_groups_contributed=1,
                          max_contributions_per_group=1,
                          public_keys=list(public_keys))
                 .count(name="n_docs")
                 .sum("n_tokens", min_value=0.0,
                      max_value=float(max_tokens_per_doc),
                      name="dp_tokens")
                 .build_query())
        return query.run_query(budget, noise_mode=noise_mode)

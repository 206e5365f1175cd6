"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Correctness-gate queries run the REAL engine pipelines in deterministic mode
(zero noise — the reference's own noise-off test strategy) with bounding
parameters whose semantics are exactly SQL-expressible:
  - Linf count caps      -> least(count(*), linf) per (pid, pk)
  - per-partition clips  -> greatest(least(sum, hi), lo) per (pid, pk)
  - partition selection  -> HAVING count(distinct pid) >= threshold
L0 caps are set non-binding in oracle-checked queries (random cross-partition
sampling is not SQL-reproducible); dedicated unit tests cover binding L0.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import pipelinedp_spark as pds
from pipelinedp_spark import dp_computations as dpc



from pipelinedp_spark.queries import (dp_core, text_dedup, analysis, corpus_ops, sketches, extended)
from pipelinedp_spark.queries.common import _t


def entry(spark: SparkSession) -> DataFrame:
    """DP count + sum + mean of order totals per order priority, privacy unit
    = customer, with private partition selection — the engine's flagship
    vertical on sf0.001."""
    orders = _t(spark, "/root/testdata/sf0.001", "orders")
    query = (pds.QueryBuilder(orders, "o_custkey")
             .groupby("o_orderpriority", max_groups_contributed=3,
                      max_contributions_per_group=5)
             .count()
             .sum("o_totalprice", min_value=0.0, max_value=500000.0)
             .mean("o_totalprice", min_value=0.0, max_value=500000.0)
             .build_query())
    return query.run_query(pds.Budget(epsilon=10.0, delta=1e-5))


_DRIVER_ARTIFACT_FIRST = [
    # Round-13 rotation: the 50 STALEST oracle names — the 6 last
    # recorded in CORRECTNESS_r08 plus the oldest 44 from r09 — so
    # this window has zero overlap with the r12 and r11 windows
    # (staleness computed from the latest CORRECTNESS_r*.json record
    # per name, same procedure as the r12 rotation).
    "sim_lsh_topk",
    "tpch_q1_pricing",
    "tpch_q3_priority",
    "tpch_q5_local_supplier",
    "stream_upsert_mirror",
    "stream_semdedup_mirror",
    "dp_count_dedup_corpus",
    "dp_select_partitions_tg",
    "dp_gaussian_threshold",
    "dp_select_weighted_gaussian",
    "dp_post_agg_threshold",
    "dp_count_max_contributions",
    "dp_count_composite_key",
    "dp_windowed_count_events",
    "dp_session_count_events",
    "doc_prep_pipeline",
    "asof_join_events",
    "range_join_events",
    "sessionize_events",
    "token_topk",
    "doc_split",
    "multimodal_bmp_decode",
    "multimodal_wav_decode",
    "utility_analysis_count_sum",
    "utility_analysis_variance",
    "analysis_histograms",
    "doc_containment",
    "multimodal_png_decode",
    "dp_count_join_nation",
    "dp_windowed_variance_events",
    "doc_quality_signals",
    "doc_pii_scrub",
    "bpe_encode",
    "sim_pq_topk",
    "sim_ivf_pq_topk",
    "sim_ann_store",
    "doc_decontaminate",
    "tpch_q18_large_orders",
    "tpch_q10_returned_items",
    "tpch_q16_supplier_variety",
    "asof_join_tolerance_events",
    "dedup_cross_corpus",
    "doc_bm25_topk",
    "doc_chunk_windows",
    "doc_corpus_report",
    "dedup_cross_corpus_near",
    "dedup_incremental",
    "doc_decontam_incremental",
    "doc_hybrid_rrf",
    "doc_bm25_incremental",
]


_REGISTRY_ORDER = [
    "doc_text_stats",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_prod",
    "dedup_jaccard",
    "dedup_clusters",
    "dedup_simhash",
    "sim_cosine_topk",
    "sim_lsh_topk",
    "sim_ivf_topk",
    "emb_near_dup",
    "emb_near_dup_exact",
    "dp_count_public",
    "dp_count_dedup_corpus",
    "dp_sum_clip_per_partition",
    "dp_sum_clip_per_contribution",
    "dp_multi_sum_public",
    "dp_mean_public",
    "dp_variance_public",
    "dp_percentile_public",
    "dp_percentile_tree",
    "dp_count_pld",
    "dp_vector_sum_public",
    "dp_partition_selection",
    "dp_select_partitions_tg",
    "dp_gaussian_threshold",
    "dp_select_weighted_gaussian",
    "dp_post_agg_threshold",
    "dp_count_max_contributions",
    "dp_count_no_cross_bounding",
    "dp_count_composite_key",
    "dp_windowed_count_events",
    "dp_private_l0_bounds",
    "dp_session_count_events",
    "doc_prep_pipeline",
    "asof_join_events",
    "range_join_events",
    "sessionize_events",
    "token_topk",
    "doc_split",
    "multimodal_bmp_decode",
    "multimodal_wav_decode",
    "utility_analysis_count_sum",
    "utility_analysis_variance",
    "analysis_histograms",
    "doc_containment",
    "multimodal_png_decode",
    "dp_count_join_nation",
    "dp_windowed_variance_events",
    "doc_quality_signals",
    "doc_pii_scrub",
    "bpe_train_merges",
    "bpe_encode",
    "sim_pq_topk",
    "sim_ivf_pq_topk",
    "sim_ann_store",
    "dp_variance_selected",
    "dp_windowed_percentile_events",
    "doc_decontaminate",
    "doc_pack_sequences",
    "tpch_q1_pricing",
    "tpch_q3_priority",
    "tpch_q5_local_supplier",
    "tpch_q18_large_orders",
    "tpch_q10_returned_items",
    "tpch_q16_supplier_variety",
    "events_rolling_features",
    "doc_exact_substr_cut",
    "doc_c4_filter",
    "emb_matryoshka_recall",
    "doc_jsonl_roundtrip",
    "doc_fix_mojibake",
    "doc_release_manifest",
    "doc_chat_render",
    "doc_preference_pairs",
    "dedup_lsh_plan",
    "events_dau_wau",
    "customer_upsert",
    "stream_upsert_mirror",
    "doc_head_coverage",
    "doc_stratified_sample",
    "asof_join_tolerance_events",
    "range_join_keyed_events",
    "dedup_cross_corpus",
    "multimodal_mp4_meta",
    "emb_semantic_dedup",
    "stream_semdedup_mirror",
    "doc_duplicate_spans",
    "doc_duplicate_spans_exact",
    "doc_pii_audit",
    "doc_decontaminate_spans",
    "events_k_anonymity",
    "events_pseudonymize",
    "doc_leakage_safe_split",
    "events_parse_quarantine",
    "events_salted_join",
    "doc_unigram_ppl",
    "doc_bm25_topk",
    "doc_dsir_weights",
    "doc_quality_classifier",
    "doc_chunk_windows",
    "doc_dsir_resample",
    "emb_semantic_clusters",
    "doc_corpus_report",
    "dp_corpus_token_count",
    "multimodal_audio_features",
    "dedup_cross_corpus_near",
    "dedup_incremental",
    "doc_decontam_incremental",
    "doc_hybrid_rrf",
    "doc_bm25_incremental",
    "doc_bm25_append",
    "stream_bm25_store_mirror",
    "doc_bm25_takedown",
    "doc_bm25_takedown_jumbo",
    "doc_bm25_bigterms_topk",
    "dedup_minhash_capped_bucket",
    "sim_ann_takedown",
    "dedup_exact_incremental",
    "stream_exact_store_mirror",
    "stream_ann_store_mirror",
    "multimodal_phash_incremental",
    "multimodal_phash_takedown",
    "stream_near_dup_store_mirror",
    "doc_bigram_ppl",
    "stream_near_dup_mirror",
    "doc_hash_embeddings",
    "doc_semantic_dedup_text",
    "dp_windowed_percentile_tree_events",
    "doc_gram_novelty",
    "doc_source_quota",
    "doc_dup_rate_estimate",
    "events_zorder_key",
    "doc_vocab_estimate",
    "doc_weighted_sample",
    "dp_trending_bigrams",
    "dp_vector_mean_public",
    "doc_vocab_hll",
    "token_freq_cms",
    "doc_decontaminate_bloom",
    "events_windowed_hll",
    "vocab_overlap_kmv",
    "doc_temperature_mix",
    "multimodal_phash_dedup",
    "multimodal_audio_dedup",
    "doc_line_dedup",
    "multimodal_video_frames",
    "doc_url_canonicalize",
    "multimodal_video_dedup",
    "multimodal_resize_stats",
    "dedup_keep_best",
    "doc_paragraph_filter",
    "stream_line_dedup_mirror",
    "doc_token_budget",
    "doc_wet_roundtrip",
    "doc_tar_shards",
    "multimodal_exif",
    "multimodal_mp3_meta",
    "doc_domain_cap",
    "doc_corpus_diff",
    "doc_contamination_score",
    "doc_normalize_text",
    "doc_language_id",
    "doc_nfc_normalize",
    "doc_gopher_filter",
    "doc_tfidf_keywords",
    "doc_pmi_collocations",
    "doc_code_detect",
    "doc_language_mix",
    "doc_sentence_dedup",
    "stream_sentence_dedup_mirror",
    "sim_ivf_pq_rerank_topk",
    "emb_kmeans_centroids",
    "emb_cluster_balanced_sample",
    "emb_int8_roundtrip",
    "emb_covariance",
    "emb_pca_project",
    "doc_length_buckets",
    "stream_cluster_assign_mirror",
    "emb_hard_negatives",
    "emb_cluster_purity",
    "emb_triplets",
    "dp_cluster_counts",
    "emb_int8_recall",
    "emb_mmr_rerank",
    "events_funnel",
    "events_retention",
    "events_json_stats",
    "doc_textrank_keywords",
    "events_json_profile",
    "events_time_to_convert",
    "events_window_anomaly",
    "doc_readability",
    "doc_source_quality_report",
    "events_attribution",
    "events_transitions",
    "part_fuzzy_match",
    "lineitem_order_stats",
    "events_session_funnel",
    "customer_scd2",
    # round 12: the four classic TPC-H plan shapes that were still
    # missing (semi-join EXISTS, outer-join double-agg, decorrelated
    # scalar subquery, EXISTS+NOT-EXISTS rewrite) plus the two
    # scan-only baselines
    "tpch_q4_priority_wait",
    "tpch_q6_forecast_revenue",
    "tpch_q13_order_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q17_small_qty_revenue",
    "tpch_q21_waiting_suppliers",
]


def _merged(attr: str) -> dict:
    out: dict = {}
    for m in (dp_core, text_dedup, analysis, corpus_ops, sketches, extended):
        out.update(getattr(m, attr))
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Driver contract: query name -> (spark, sf_dir) -> DataFrame.
    Merged from the pipelinedp_spark.queries family modules in the
    registry's historical order; _DRIVER_ARTIFACT_FIRST rotates the
    stalest names into the driver's 50-row artifact window."""
    reg = _merged("QUERIES")
    reg = {n: reg[n] for n in _REGISTRY_ORDER if n in reg}
    front = [n for n in _DRIVER_ARTIFACT_FIRST if n in reg]
    rest = [n for n in reg if n not in set(front)]
    return {n: reg[n] for n in (*front, *rest)}


def oracle_sql() -> dict[str, str]:
    """Driver contract: query name -> DuckDB oracle SQL (same column
    aliases as the Spark result; driver compares value hashes)."""
    sqls = _merged("ORACLES")
    return {n: sqls[n] for n in _REGISTRY_ORDER if n in sqls}

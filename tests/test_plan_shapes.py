"""Plan-shape assertions: scan pruning, filter pushdown, broadcast joins,
map-side partial aggregation, bounded shuffle counts.

These pin the engine's scale-critical physical properties so regressions
fail tests (the 100 TB posture is a plan property, not a data property).
"""

import pytest
from pyspark.sql import functions as F

import pipelinedp_spark as pds
from pipelinedp_spark import plans as P

SF = "/root/testdata/sf0.001"


def _orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet")


def test_scan_pruning_in_dp_pipeline(spark):
    """The DP aggregate must read only (pid, pk, value) from the scan."""
    q = (pds.QueryBuilder(_orders(spark), "o_custkey")
         .groupby("o_orderpriority", max_groups_contributed=3,
                  max_contributions_per_group=5,
                  public_keys=["1-URGENT"])
         .sum("o_totalprice", min_value=0.0, max_value=1000.0)
         .build_query())
    out = q.run_query(pds.Budget(1.0), noise_mode="zero")
    scans = P.scan_columns(out)
    assert scans, "expected a file scan in the plan"
    for cols in scans:
        assert set(cols) <= {"o_custkey", "o_orderpriority", "o_totalprice"}


def test_isin_public_filter_pushdown(spark):
    """Small public-key lists compile to scan-pushed In-filters, not joins."""
    q = (pds.QueryBuilder(_orders(spark), "o_custkey")
         .groupby("o_orderpriority", max_groups_contributed=3,
                  max_contributions_per_group=5,
                  public_keys=["1-URGENT", "2-HIGH"])
         .count()
         .build_query())
    out = q.run_query(pds.Budget(1.0), noise_mode="zero")
    pushed = P.pushed_filters(out)
    assert any("In(o_orderpriority" in p for p in pushed), pushed


def test_dp_count_partial_aggregation_and_shuffles(spark):
    """Count fast path: no Linf window sort; partial aggregation present;
    bounded shuffle count (pid-pk agg, L0 window, pk agg + small extras)."""
    q = (pds.QueryBuilder(_orders(spark), "o_custkey")
         .groupby("o_orderpriority", max_groups_contributed=3,
                  max_contributions_per_group=5,
                  public_keys=["1-URGENT", "2-HIGH"])
         .count()
         .build_query())
    out = q.run_query(pds.Budget(1.0), noise_mode="zero")
    assert P.has_partial_aggregation(out)
    assert P.count_shuffles(out) <= 4


def test_broadcast_join_for_query_keys(spark):
    """cosine_topk broadcasts the query side instead of shuffling the
    corpus."""
    from pipelinedp_spark.operators import similarity
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = (emb.filter(F.col("vec_id") < 3)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("query_vec")))
    out = similarity.cosine_topk(emb, q, k=5)
    assert P.has_broadcast_join(out)


def test_codegen_spans_nonzero(spark):
    q = (pds.QueryBuilder(_orders(spark), "o_custkey")
         .groupby("o_orderpriority", max_groups_contributed=3,
                  max_contributions_per_group=5, public_keys=["1-URGENT"])
         .count()
         .build_query())
    out = q.run_query(pds.Budget(1.0), noise_mode="zero")
    assert P.whole_stage_codegen_spans(out) >= 1


def test_exact_dedup_single_shuffle(spark):
    from pipelinedp_spark.operators import dedup
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = dedup.exact_dedup(docs)
    assert P.count_shuffles(out) == 1
    assert P.has_partial_aggregation(out)


def test_embedding_near_dup_no_pair_join(spark):
    """Banded near-dup: pairs come from in-bucket groups, so the plan has
    no join operator at all (and so no cartesian/nested-loop blowup)."""
    from pipelinedp_spark.operators import dedup
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = P.explain_str(dedup.embedding_near_dup_pairs(emb))
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin",
                "SortMergeJoin", "BroadcastHashJoin"):
        assert bad not in plan, bad


def test_minhash_signature_computed_once(spark):
    """The banded signature table is materialized ONCE (localCheckpoint)
    and every consumer — the bucket-cap aggregate and both self-join
    sides — reads that materialization as an ExistingRDD scan; the
    signature UDF subplan must not appear in the executed plan at all.
    (Replaces the earlier window/ReusedExchange shape, which serialized
    corpus-hot buckets on one window task, and the r04 persist()-based
    assertion, which leaked cached blocks across calls.)"""
    from pipelinedp_spark.operators import dedup
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = dedup.minhash_lsh_pairs(docs)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("isFinalPlan=true") == 1
    assert "ExistingRDD" in plan            # checkpointed band table
    assert "ArrowEvalPython" not in plan    # signature UDF ran pre-checkpoint
    assert "InMemoryTableScan" not in plan  # nothing persisted


def test_noise_udfs_are_nondeterministic(spark):
    """Secure-noise UDFs must be nondeterministic: Catalyst must not push
    predicates through a noise projection or duplicate a draw, otherwise the
    thresholded value and the released value come from independent noise
    (breaking the thresholding DP guarantee)."""
    from pipelinedp_spark import noise as N
    src = N.SecureNoiseSource()
    df = spark.range(4).select(
        (F.col("id").cast("double") + src.laplace(1.0)).alias("noisy"))
    plan = P.explain_str(df, mode="simple")
    assert "ArrowEvalPython" in plan

    # The DP pipeline with post-aggregation thresholding draws pid-count
    # noise ONCE: the filter and the released column must share the single
    # ArrowEvalPython node (no duplicated draw after predicate pushdown).
    acct = pds.NaiveBudgetAccountant(20.0, 1e-4)
    engine = pds.DPEngine(acct, noise_mode="secure")
    params = pds.AggregateParams(
        metrics=[pds.Metrics.PRIVACY_ID_COUNT],
        max_partitions_contributed=3,
        max_contributions_per_partition=1,
        post_aggregation_thresholding=True)
    res = engine.aggregate(
        _orders(spark), params,
        pds.DataFrameExtractors("o_custkey", "o_orderpriority", None))
    acct.compute_budgets()
    nplan = P.explain_str(res.dataframe(), mode="simple")
    assert nplan.count("ArrowEvalPython") == 1, nplan


def test_jaccard_pairs_no_pair_blowup(spark):
    """The inverted-index jaccard must stay on hash joins (no cartesian /
    nested-loop) and keep map-side partial aggregation for the
    shared-shingle counts."""
    from pipelinedp_spark.operators import dedup
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = dedup.jaccard_pairs(docs, jaccard_threshold=0.7)
    plan = P.explain_str(out)
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in plan, bad
    assert P.has_partial_aggregation(out)


def test_simhash_pairs_fingerprints_computed_once(spark):
    """All four join branches (small/big x left/right) must feed from ONE
    materialized (block_idx, block_val) exchange via AQE ReusedExchange
    instead of re-running the fingerprint UDF subplan — and nothing is
    persisted (the r04 persist leaked cached blocks across calls)."""
    from pipelinedp_spark.operators import dedup
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = dedup.simhash_pairs(docs)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("isFinalPlan=true") == 1
    assert plan.count("ReusedExchange") >= 1
    assert "InMemoryTableScan" not in plan


def test_quantile_tree_scan_pruning(spark):
    """The tree percentile pipeline reads only (pid, pk, value)."""
    acct = pds.NaiveBudgetAccountant(1.0, 1e-6)
    engine = pds.DPEngine(acct, noise_mode="zero")
    params = pds.AggregateParams(
        metrics=[pds.Metrics.PERCENTILE(50)],
        max_partitions_contributed=3,
        max_contributions_per_partition=5,
        min_value=0.0, max_value=1000.0,
        percentile_algorithm="tree")
    res = engine.aggregate(
        _orders(spark), params,
        pds.DataFrameExtractors("o_custkey", "o_orderpriority",
                                "o_totalprice"),
        public_partitions=["1-URGENT"])
    acct.compute_budgets()
    scans = P.scan_columns(res.dataframe())
    assert scans
    for cols in scans:
        assert set(cols) <= {"o_custkey", "o_orderpriority", "o_totalprice"}


def test_running_sum_stays_range_partitioned(spark):
    from pipelinedp_spark.operators.running import running_sum
    df = spark.range(1000).withColumn("v", (F.col("id") % 9) + 1)
    plan = P.explain_str(running_sum(df, "id", "v", num_partitions=8),
                         mode="simple")
    assert "rangepartitioning" in plan.lower()
    assert "Window" not in plan


def test_linf_sampling_is_aggregate_first(spark):
    """Generous-cap MEAN/VARIANCE pipelines must not sort the corpus for
    the Linf sample: the raw input's only full pass is the sort-free
    partial aggregation (carrying the __gcount__ group count), and the
    row_number window sits ONLY over the oversize-key semi-joined
    subset — empty here, and eliminated by AQE at runtime."""
    rows = [(u, "a", float(u % 5)) for u in range(50)]
    df = spark.createDataFrame(rows, "pid int, pk string, v double")
    q = (pds.QueryBuilder(df, "pid")
         .groupby("pk", max_groups_contributed=10,
                  max_contributions_per_group=1_000_000,
                  public_keys=["a"])
         .mean("v", min_value=0.0, max_value=5.0)
         .build_query())
    out = q.run_query(pds.Budget(1.0), noise_mode="zero")
    opt = out._jdf.queryExecution().optimizedPlan().toString()
    assert "__gcount__" in opt          # aggregate-first split present
    # Exactly one Linf window (in the resample branch): its input chain
    # must contain the oversize semi-join, never the raw scan directly.
    import re
    linf_windows = [l for l in opt.splitlines()
                    if re.search(r"row_number", l) and "__pid__" in l
                    and "pk" in l]
    assert len(linf_windows) <= 1
    assert out.collect()[0]["mean_v"] == pytest.approx(2.0)
    # AQE runtime: with no oversize group the resample branch is empty —
    # the executed plan shows an empty LocalTableScan union side.
    final = out._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final


def test_oversize_resample_parity_with_plain_window(spark):
    """Aggregate-first bounding must produce ROW-FOR-ROW the per-key
    partials of the plain sample-then-aggregate plan under deterministic
    ordering — mixed under/over-cap groups and null-valued keys
    included."""
    from pipelinedp_spark import contribution_bounders as B
    rows = ([(1, "a", i) for i in range(7)]       # over cap
            + [(1, "b", i) for i in range(2)]     # under cap
            + [(2, "a", i) for i in range(4)]     # at boundary+1
            + [(None, "a", i) for i in range(6)]  # null pid, over cap
            + [(3, None, i) for i in range(5)])   # null pk, over cap
    df = spark.createDataFrame(rows, "pid int, pk string, v int")
    order = [F.col("v")]
    partials = [F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")]
    plain = (B._limit_per_key(df, ["pid", "pk"], 3, order)
             .groupBy("pid", "pk").agg(*partials).collect())
    split = B._agg_with_oversize_resample(df, ["pid", "pk"], 3,
                                          partials, order).collect()
    assert sorted(map(str, plain)) == sorted(map(str, split))
    # no-oversize cap: everything aggregates directly
    all_rows = B._agg_with_oversize_resample(df, ["pid", "pk"], 100,
                                             partials, order).collect()
    assert sorted(map(str, all_rows)) == sorted(map(str, (
        df.groupBy("pid", "pk").agg(*partials).collect())))
    # per-privacy-id (L1) bounder: cap key coarser than agg key
    l1_plain = (B._limit_per_key(df, ["pid"], 5, order)
                .groupBy("pid", "pk").agg(*partials).collect())
    l1_split = B.bound_per_privacy_id(df, "pid", ["pk"], partials, 5,
                                      order).collect()
    assert sorted(map(str, l1_plain)) == sorted(map(str, l1_split))


def test_scoped_conf_restores_on_exception_and_unset(spark):
    from pipelinedp_spark.plans import scoped_conf
    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    with pytest.raises(RuntimeError):
        with scoped_conf(spark, **{key: "3"}):
            assert spark.conf.get(key) == "3"
            raise RuntimeError("boom")
    assert spark.conf.get(key) == before
    # a key unset before entry is unset again after exit
    custom = "spark.pipelinedp.test.flag"
    with scoped_conf(spark, **{custom: "on"}):
        assert spark.conf.get(custom) == "on"
    with pytest.raises(Exception):
        spark.conf.get(custom)


def test_limit_rows_per_key_parity(spark):
    """Row-output oversize cap (vector/custom paths): identical rows to
    the plain window under deterministic ordering, both regimes."""
    from pipelinedp_spark import contribution_bounders as B
    rows = ([(1, "a", i) for i in range(2500)]
            + [(2, "a", i) for i in range(10)]
            + [(2, "b", i) for i in range(1200)])
    df = spark.createDataFrame(rows, "pid int, pk string, v int")
    order = [F.col("v")]
    plain = B._limit_per_key(df, ["pid", "pk"], 1000, order).collect()
    split = B.limit_rows_per_key(df, ["pid", "pk"], 1000, order).collect()
    assert sorted(map(str, plain)) == sorted(map(str, split))
    assert len(split) == 1000 + 10 + 1000
    # binding-regime cap (< threshold) delegates to the plain window
    small = B.limit_rows_per_key(df, ["pid", "pk"], 5, order).collect()
    assert len(small) == 15


def test_hll_no_distinct_and_bounded_shuffle(spark):
    """HLL needs NO distinct pass: the plan is exactly two hash
    aggregations (register max, then the estimate) = 2 shuffles of
    register-sized data, with map-side partials."""
    from pipelinedp_spark.functions.sketches import hll_distinct_estimate
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    est = hll_distinct_estimate(docs, "text", p=10)
    plan = P.explain_str(est)
    assert "Deduplicate" not in plan
    assert P.count_shuffles(est) <= 2
    assert P.has_partial_aggregation(est)


def test_cms_probe_broadcasts_counters(spark):
    """Counter table (<= depth*width rows) must reach the probe as a
    broadcast join, never a shuffle join."""
    from pipelinedp_spark.functions.sketches import cms_counters, cms_estimate
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    est = cms_estimate(cms_counters(toks, "tok"), toks, "tok")
    assert P.has_broadcast_join(est)
    assert P.has_partial_aggregation(est)


def test_bloom_word_table_broadcasts(spark):
    """The Bloom probe join must broadcast the word table; the exact
    confirm join is deliberately NOT broadcast-hinted (shuffle shape at
    scale), so we assert only the word-table side here."""
    from pipelinedp_spark.operators.decontam import decontaminate_bloom
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    evald = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    kept = decontaminate_bloom(train, evald, n=3)
    assert P.has_broadcast_join(kept)


def test_line_dedup_no_window_partial_aggs(spark):
    """Corpus line dedup: the rebuild is a groupBy with an in-group
    array_sort, not a window (a corpus-hot boilerplate line must never
    serialize onto one window task), and the two counting aggregations
    are map-side combinable."""
    from pipelinedp_spark.operators import dedup
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = dedup.line_dedup(docs, min_docs=2, group_col="source")
    plan = P.explain_str(out)
    assert "Window" not in plan
    assert P.has_partial_aggregation(out)
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in plan, bad


def test_keep_best_no_window(spark):
    """Survivor selection is a max(struct) aggregation per cluster plus
    a join back — no window, so a corpus-hot cluster is one
    accumulator, not one task."""
    from pipelinedp_spark.operators import graph
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pairs = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    clusters = graph.near_dup_clusters(docs, pairs)
    out = graph.keep_best_representative(docs, clusters, "n_chars")
    plan = P.explain_str(out)
    assert "Window" not in plan
    assert P.has_partial_aggregation(out)


def test_paragraph_filter_no_window_partial_aggs(spark):
    from pipelinedp_spark.operators import quality
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = quality.paragraph_perplexity_filter(docs, max_ppl=60.0)
    plan = P.explain_str(out)
    assert "Window" not in plan
    assert P.has_partial_aggregation(out)
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in plan, bad


def test_url_canonicalize_pure_codegen(spark):
    """Canonicalization + domain extraction are column expressions: no
    Python evals, no exchanges, whole plan in one codegen span."""
    from pipelinedp_spark.functions import urls as U
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = docs.select(
        U.canonicalize_url(F.concat(F.lit("https://ex.com/"),
                                    F.col("doc_id").cast("string")))
        .alias("c"),
        U.registered_domain(F.lit("a.b.co.uk")).alias("d"))
    plan = P.explain_str(out)
    for bad in ("ArrowEvalPython", "BatchEvalPython", "Exchange"):
        assert bad not in plan, bad
    assert P.whole_stage_codegen_spans(out) >= 1

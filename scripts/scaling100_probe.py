"""Second-decade (10x-on-10x) scaling probe for the DP-engine and skew
paths (VERDICT r9 task 5): the documents path already has measured
sf1 -> sf10 ratios in SCALING100_LOCAL.json; this adds

* registry DP / events queries at sf1 vs sf10 parquet (orders/events
  replicated 100x from sf0.1 by scripts/gen_sf1.ensure_sf10_dp) — the
  contribution-bounding window-sample pipeline and the event-window
  paths at a real second decade;
* the bench.py skew suite at scale=1 vs scale=10 (synthetic row counts
  x10: 20M skewed events, 400k hot-cell vectors) — the hot-key plans
  where a decade can't come from parquet because the suite builds its
  own adversarial distributions.

Each leg runs in a FRESH session (the r04 lesson: shared-JVM decay
inflates tail measurements up to 7x); queries are timed single-pass
with count() (output rows would swamp the engine signal through the
driver). Results merge into SCALING100_LOCAL.json, which bench.py
embeds as the `scaling_100x` block.

Run:  python scripts/scaling100_probe.py
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

# Registry queries whose inputs are orders/events (+ broadcast dims):
# the DP bounding pipeline (two window-sample shuffles), the selection
# path, and the event-window family.
DP_QUERIES = [
    "dp_count_public",            # orders; window-sample bounding
    "dp_count_composite_key",     # orders; composite partition key
    "dp_mean_public",             # events; normalized-sum mean
    "dp_select_partitions_tg",    # orders; truncated-geometric keep
    "dp_percentile_public",       # events; histogram-sketch quantile
    "dp_windowed_count_events",   # events; tumbling window + bounding
    "dp_session_count_events",    # events; session windows + bounding
    # r12 (VERDICT r11 task 4): the only compute-scaling entry > 3 in
    # BENCH_LOCAL's first-decade leg — probe it at a REAL second
    # decade with rows recorded, so the per-output-row ratio is
    # machine-checkable (frame output is ~4 rows/doc by construction,
    # i.e. exactly linear; the Arrow-batched render+demux+DCT path is
    # the signal here)
    "multimodal_video_frames",    # documents; AVI mux/demux + JPEG
]

SKEW_QUERIES = [
    "skew_dp_count_bounded",
    "skew_dp_mean_generous_cap",
    "skew_asof_hot_key",
    "skew_semdedup_hot_cell",
    # r11: the store-family build+serve flows under adversarial skew
    # (degenerate band bucket / corpus-wide stopword), previously
    # measured only at scale 1
    "skew_store_hot_band",
    "skew_bm25_hot_term",
]


def _serving_probes(spark, scale: int):
    """SERVING-ONLY second-decade probes (VERDICT r10 task 5): the
    registry's bm25/ann queries rebuild their index per call, so their
    ratios conflate build with serve. Here the index is built OUTSIDE
    the timed region at 100k*scale corpus rows and only the query path
    is timed: bm25_topk_from_index (8 queries, k=10) and
    ann_search_from_index (8 queries, k=10, nprobe=2). Returns
    name -> serve thunk; builders run (untimed) at call time."""
    from pyspark.sql import functions as F

    from pipelinedp_spark.operators.retrieval import (bm25_topk_from_index,
                                                      build_bm25_index)
    from pipelinedp_spark.operators.similarity import (
        ann_search_from_index, build_ann_index)
    n = 100_000 * scale

    # --- BM25: 12 random base-36 tokens per doc -----------------------
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.transform(
            F.sequence(F.lit(1), F.lit(12)),
            lambda i: F.conv(F.abs(F.xxhash64(F.col("id"), i))
                             .cast("string"), 10, 36))).alias("text"))
    build_bm25_index(docs, "probe_bm25_serve", num_buckets=8)
    q_bm = docs.limit(8).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", F.split(F.col("text"), " ")[1],
                    F.split(F.col("text"), " ")[3]).alias("query_text"))
    q_bm = q_bm.localCheckpoint()

    # --- BM25 after a JUMBO takedown (r12): the corpus-scale-tombstone
    # fallback branch at a real second decade. A separate index (the
    # plain serve probe must stay tombstone-free), half the corpus
    # removed UNTIMED; the timed serve forces the broadcast gate low so
    # the reader's anti-join takes the shuffled path it would take at
    # 100 TB (force-broadcasting n/2 tombstone rows is the OOM there).
    from pipelinedp_spark.operators.retrieval import (
        remove_from_bm25_index)
    build_bm25_index(docs, "probe_bm25_jumbo", num_buckets=8)
    remove_from_bm25_index(docs.filter(F.col("doc_id") % 2 == 0)
                           .select("doc_id"), "probe_bm25_jumbo")
    ts_knob = "spark.pipelinedp.store.tombstoneBroadcastRows"

    def _serve_jumbo():
        spark.conf.set(ts_knob, "8")
        try:
            return bm25_topk_from_index(q_bm, "probe_bm25_jumbo",
                                        k=10)
        finally:
            spark.conf.unset(ts_knob)

    # --- ANN: 16-dim vectors, 64 IVF cells -----------------------------
    dim = 16
    vecs = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: F.pmod(F.abs(F.xxhash64(F.col("id"), j)),
                             F.lit(1000)) / 500.0 - 1.0)
        .alias("embedding"))
    build_ann_index(vecs, "probe_ann_serve", num_cells=64, m=4,
                    ksub=16)
    q_ann = vecs.limit(8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec")).localCheckpoint()

    return {
        "serve_bm25_topk_from_index":
            lambda: bm25_topk_from_index(q_bm, "probe_bm25_serve",
                                         k=10),
        "serve_bm25_after_jumbo_takedown": _serve_jumbo,
        "serve_ann_search_from_index":
            lambda: ann_search_from_index(q_ann, "probe_ann_serve",
                                          k=10, nprobe=2),
    }


def _recovery_probe(spark, scale: int) -> dict:
    """Convergent crash recovery at a real second decade: a 1000-doc
    guarded BM25 append is left HALF-APPLIED (postings/terms/meta
    landed, no ingest-log row — exactly the crash-between-apply-and-log
    state) against a 100k*scale-doc store, and the timed region is the
    replayed batch's `apply_batch_once`: detect the stamped rows, roll
    them back, restore the meta scalars, re-apply, log. The fast path
    deletes the crashed append's own files (O(batch) + one meta scan);
    the `_rewrite` twin monkeypatches the classifier away to force the
    pre-r12 full-table rewrite, so the artifact records what the fast
    path saves as the store grows."""
    from pyspark.sql import functions as F

    from pipelinedp_spark import store as S
    from pipelinedp_spark.operators.retrieval import (build_bm25_index,
                                                      restore_bm25_meta)
    n = 100_000 * scale

    def _gen(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", F.transform(
                F.sequence(F.lit(1), F.lit(12)),
                lambda i: F.conv(F.abs(F.xxhash64(F.col("id"), i))
                                 .cast("string"), 10, 36))).alias("text"))

    build_bm25_index(_gen(0, n), "probe_bm25_rec", num_buckets=8)
    out = {}
    for name, bid, force_rewrite in (
            ("recover_crashed_bm25_batch", 0, False),
            ("recover_crashed_bm25_batch_rewrite", 1, True)):
        batch = _gen(n + bid * 1000,
                     n + (bid + 1) * 1000).localCheckpoint()
        # the crashed attempt: fully applied, no log row
        build_bm25_index(batch, "probe_bm25_rec", mode="append",
                         prov=("ckP", bid))
        orig = S._batch_files
        if force_rewrite:
            S._batch_files = lambda *a, **k: None
        try:
            t0 = time.perf_counter()
            applied = S.apply_batch_once(
                spark, "probe_bm25_rec", bid,
                lambda: build_bm25_index(batch, "probe_bm25_rec",
                                         mode="append",
                                         prov=("ckP", bid)),
                run_id="ckP",
                stamped={"_postings": "term", "_terms": "term"},
                restore_fn=lambda: restore_bm25_meta(
                    spark, "probe_bm25_rec"))
            dt = round(time.perf_counter() - t0, 2)
        finally:
            S._batch_files = orig
        assert applied, f"{name}: recovery did not apply"
        out[name] = (dt, 1000)
    return out


def _drop_recovery_tables(spark) -> None:
    for t in ("probe_bm25_rec_postings", "probe_bm25_rec_terms",
              "probe_bm25_rec_meta", "probe_bm25_rec_ingest_log"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _drop_serving_tables(spark) -> None:
    for t in ("probe_bm25_serve_postings", "probe_bm25_serve_terms",
              "probe_bm25_serve_meta", "probe_bm25_jumbo_postings",
              "probe_bm25_jumbo_terms", "probe_bm25_jumbo_meta",
              "probe_bm25_jumbo_tombstones", "probe_ann_serve_codes",
              "probe_ann_serve_centroids", "probe_ann_serve_codebooks",
              "probe_ann_serve_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _make_spark():
    from pyspark.sql import SparkSession
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sp = (SparkSession.builder.master(f"local[{cpus}]")
          .appName("scaling100-probe")
          .config("spark.sql.shuffle.partitions", cpus)
          .config("spark.sql.adaptive.enabled", "true")
          .config("spark.ui.enabled", "false")
          .config("spark.driver.memory", "8g")
          .getOrCreate())
    sp.sparkContext.setLogLevel("ERROR")
    return sp


def main() -> None:
    from gen_sf1 import ensure_sf1, ensure_sf10_dp

    # optional name filter: `python scripts/scaling100_probe.py <name>…`
    # re-probes only the named entries (a full re-run is ~15 min; a
    # single new probe shouldn't cost that)
    only = set(sys.argv[1:]) or None

    def _want(name: str) -> bool:
        return only is None or name in only

    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(REPO, "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    spark = _make_spark()
    sf1 = ensure_sf1(spark)
    sf10 = ensure_sf10_dp(spark)

    out: dict[str, dict] = {}

    # --- DP/events registry queries: one fresh session per decade ---
    for tag, sf_dir in (("sf1", sf1), ("sf10", sf10)):
        if not any(_want(n) for n in DP_QUERIES):
            break
        spark.stop()
        spark = _make_spark()
        spark.read.parquet(f"{sf_dir}/region.parquet").count()
        for name in (n for n in DP_QUERIES if _want(n)):
            q = mod.queries()[name]
            t0 = time.perf_counter()
            rows = q(spark, sf_dir).count()
            dt = round(time.perf_counter() - t0, 2)
            spark.catalog.clearCache()
            out.setdefault(name, {})[tag] = dt
            out[name][f"rows_{tag}"] = rows
            print(f"{name} {tag}: {dt}s rows={rows}", flush=True)

    # --- skew suite: scale 1 then scale 10, fresh session each ---
    import bench
    for tag, scale in (("sf1", 1), ("sf10", 10)):
        if not any(_want(n) for n in SKEW_QUERIES):
            break
        spark.stop()
        spark = _make_spark()
        thunks = bench._skew_queries(spark, scale=scale)
        for name in (n for n in SKEW_QUERIES if _want(n)):
            t0 = time.perf_counter()
            rows = thunks[name]().count()
            dt = round(time.perf_counter() - t0, 2)
            spark.catalog.clearCache()
            out.setdefault(name, {})[tag] = dt
            out[name][f"rows_{tag}"] = rows
            print(f"{name} x{scale}: {dt}s rows={rows}", flush=True)

    # --- serving-only probes: index built untimed, query timed ------
    serving_names = ("serve_bm25_topk_from_index",
                     "serve_bm25_after_jumbo_takedown",
                     "serve_ann_search_from_index")
    for tag, scale in (("sf1", 1), ("sf10", 10)):
        if not any(_want(n) for n in serving_names):
            break
        spark.stop()
        spark = _make_spark()
        serves = _serving_probes(spark, scale)
        for name, thunk in serves.items():
            if not _want(name):
                continue
            best = float("inf")
            for _ in range(2):   # serving latency: best-of-2 (tiny)
                t0 = time.perf_counter()
                rows = thunk().count()
                best = min(best, time.perf_counter() - t0)
                spark.catalog.clearCache()
            dt = round(best, 2)
            out.setdefault(name, {})[tag] = dt
            out[name][f"rows_{tag}"] = rows
            print(f"{name} x{scale}: {dt}s rows={rows}", flush=True)
        _drop_serving_tables(spark)

    # --- crash-recovery probes: store built untimed, the replayed
    # batch's convergent recovery (rollback + restore + re-apply)
    # timed; the _rewrite twin forces the pre-r12 fallback so the
    # artifact shows what the file-level fast path saves at scale ----
    recovery_names = ("recover_crashed_bm25_batch",
                      "recover_crashed_bm25_batch_rewrite")
    for tag, scale in (("sf1", 1), ("sf10", 10)):
        if not any(_want(n) for n in recovery_names):
            break
        spark.stop()
        spark = _make_spark()
        for name, (dt, rows) in _recovery_probe(spark, scale).items():
            out.setdefault(name, {})[tag] = dt
            out[name][f"rows_{tag}"] = rows
            print(f"{name} x{scale}: {dt}s rows={rows}", flush=True)
        _drop_recovery_tables(spark)
    spark.stop()

    for name, rec in out.items():
        rec["ratio_10x_second_decade"] = round(
            rec["sf10"] / max(rec["sf1"], 1e-3), 2)

    path = os.path.join(REPO, "SCALING100_LOCAL.json")
    merged = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                merged = json.load(f)
        except (OSError, ValueError):
            merged = {}
    merged.update(out)
    # Derived per-output-row ratio for EVERY entry that recorded row
    # counts (VERDICT r11 task 7): time-per-output-row at sf10 over
    # time-per-output-row at sf1 — makes "the ratio is output growth,
    # not engine work" machine-checkable instead of narrated (e.g.
    # dedup_keep_best: 9.45x time on 10x OUTPUT rows -> 0.94/row).
    for rec in merged.values():
        r1, r10 = rec.get("rows_sf1"), rec.get("rows_sf10")
        if r1 and r10 and rec.get("sf1") and rec.get("sf10"):
            rec["rows_ratio_10x"] = round(r10 / max(r1, 1), 2)
            rec["ratio_per_output_row"] = round(
                (rec["sf10"] / r10) / (rec["sf1"] / r1), 2)
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps({n: r["ratio_10x_second_decade"]
                      for n, r in out.items()}))


if __name__ == "__main__":
    main()

"""Shared plumbing for the persisted-index ("store") family.

Six store kinds — exact fingerprints, MinHash bands, span anchors,
image pHash blocks (`operators.dedup`, `operators.multimodal`), the
BM25 inverted index (`operators.retrieval`) and the IVF-PQ vector
index (`operators.similarity`) — follow one contract: build the
expensive artifact ONCE into bucketed/partitioned managed tables, keep
the knobs in a one-row ``{store}_meta`` table so later batches can
never silently fingerprint differently, append increments
bucket-aligned, and refresh relation caches after an append (a cached
pre-append scan otherwise serves stale files — found once on the exact
store, pinned in tests, and a copy-adjacent hazard in every builder).

This module centralizes that plumbing; the per-store algorithms stay
in their operator modules. Reference repo (OpenMined/PipelineDP) has
no counterpart — the store family is net-new LLM-pipeline
infrastructure.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def drop_store_table(spark, name: str) -> None:
    """DROP TABLE IF EXISTS plus removal of an ORPHANED managed-table
    location (a crashed prior session can leave the warehouse directory
    behind with no catalog entry; saveAsTable then fails with
    LOCATION_ALREADY_EXISTS even in overwrite mode). Local-filesystem
    warehouses only — on cluster storage the catalog owns the
    location. Handles default-database ('<table>') and db-qualified
    ('<db>.<table>' under '<db>.db/<table>') managed layouts."""
    import shutil
    import urllib.parse

    if name.endswith("_tombstones"):
        _TS_SIZE_CACHE.pop(name[:-len("_tombstones")], None)
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    if wh.startswith("file:"):
        p = urllib.parse.urlparse(wh).path
        parts = name.lower().split(".")
        rel = (parts[-1] if len(parts) == 1
               else os.path.join(f"{parts[-2]}.db", parts[-1]))
        shutil.rmtree(os.path.join(p, rel), ignore_errors=True)


def begin_build(spark, store_name: str, mode: str,
                suffixes: tuple[str, ...],
                validate: dict[str, int] | None = None):
    """The build/append preamble every store builder repeats.

    ``mode='overwrite'``: drop each ``{store}{suffix}`` table (plus
    orphaned locations) AND the store's bookkeeping tables —
    tombstones, removed-ids, ingest log — and return None. A rebuild
    defines a new corpus truth: surviving tombstones would hide freshly
    indexed content that matches an OLD takedown, and surviving batch
    ids would make a restarted stream skip batches the new store never
    saw.

    ``mode='append'``: read the ``{store}_meta`` row, check that each
    knob in ``validate`` matches what the store was built with (a
    mismatched append would corrupt the index — batches must
    fingerprint exactly like the store), and return the meta Row so
    the caller can inherit stored values (num_buckets, scalars,
    model shapes)."""
    if mode == "append":
        m = spark.table(f"{store_name}_meta").collect()[0]
        # A knob MISSING from the meta row is a mismatch, not a skip:
        # it means the store predates the knob (built by older code),
        # so this build cannot prove the append fingerprints the same
        # way — silently accepting it is exactly the corruption this
        # validation exists to prevent. Rebuild (or compact with
        # current code, which rewrites meta) before appending.
        missing = [k for k in (validate or {}) if k not in m.__fields__]
        if missing:
            raise ValueError(
                f"store {store_name} meta predates knob(s) "
                f"{', '.join(sorted(missing))}; rebuild the store "
                f"before appending (cannot verify the append matches "
                f"the build)")
        bad = {k: (m[k], v) for k, v in (validate or {}).items()
               if int(m[k]) != int(v)}
        if bad:
            built = ", ".join(f"{k}={m[k]}" for k in bad)
            asked = ", ".join(f"{k}={v}" for k, (_, v) in bad.items())
            raise ValueError(
                f"store {store_name} was built with {built}; appending "
                f"with {asked} would corrupt it")
        return m
    for suffix in (*suffixes, "_tombstones", "_removed_ids",
                   "_ingest_log"):
        drop_store_table(spark, store_name + suffix)
    return None


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   num_buckets: int, mode: str) -> None:
    """Write a store table bucketed AND sorted by its join key:
    `spark.table` scans then restore the hash partitioning, so the
    store side of every candidate/anti join reaches the join with
    ZERO Exchange (plan-pinned per store kind)."""
    if table.endswith("_tombstones"):
        _TS_SIZE_CACHE.pop(table[:-len("_tombstones")], None)
    (df.write.mode(mode).format("parquet")
     .bucketBy(int(num_buckets), bucket_col).sortBy(bucket_col)
     .saveAsTable(table))


def write_meta(spark, store_name: str, **values) -> None:
    """(Re)write the one-row ``{store}_meta`` knob table from int /
    float literals (floats repr-round-trip exactly, so a reader
    recomputes with bit-identical constants)."""
    cols = []
    for k, v in values.items():
        if isinstance(v, float):
            cols.append(f"CAST({v!r} AS DOUBLE) AS {k}")
        elif isinstance(v, int):
            # BIGINT keeps exact integer scalars (e.g. total_dl) safe
            # past 2^31 at production corpus sizes.
            cols.append(f"CAST({v} AS BIGINT) AS {k}")
        else:
            raise TypeError(f"meta value {k}={v!r} must be int or float")
    spark.sql("SELECT " + ", ".join(cols)) \
        .write.mode("overwrite").format("parquet") \
        .saveAsTable(f"{store_name}_meta")


def apply_batch_once(spark, store_name: str, batch_id: int,
                     apply_fn, run_id: str = "") -> bool:
    """Run ``apply_fn()`` (a micro-batch's store mutation) EXACTLY
    ONCE per ``(run_id, batch_id)`` — the transactional-sink emulation
    every foreachBatch ingest needs under Structured Streaming's
    at-least-once replay. A ``{store}_ingest_log`` table records
    applied ids; a replayed pair is a no-op (returns False).

    ``run_id`` matters because Structured Streaming batch ids are only
    unique WITHIN one checkpoint lineage: a NEW stream (fresh
    checkpoint dir) into the same store restarts at batch 0, and an
    unnamespaced guard would silently skip its first batches as
    "replays" of the old stream's. The streaming_*_ingest wrappers
    pass their checkpoint location as the run id; batch callers (the
    oracle mirrors, backfills) can leave the default single namespace.
    A pre-r11 log table (batch_id column only) keeps working for
    default-namespace callers (and keeps its legacy schema on append);
    a NAMESPACED caller against it raises — the legacy log cannot say
    which lineage its ids belong to, and both silent readings lose
    data (skip a new stream's batches, or double-apply a resumed one's
    replays). Rebuild the store to reset the log.

    Even for the anti-join store kinds (exact/minhash/span/phash),
    whose STATE is multiplicity-insensitive, the guard matters: their
    output-path appends and per-increment caps are not — a replayed
    batch double-writes survivors to the sink. For BM25 it is
    correctness-critical (tf/df/scalars double-count), for ANN it
    prevents duplicate code rows occupying top-k slots until
    compaction.

    The log row lands AFTER the apply, so a crash between apply and
    log can still double-apply — the window is one batch and a rebuild
    or `compact_store` recovers; closing it fully needs an atomic
    multi-table commit no plain parquet catalog offers."""
    from pyspark.sql import functions as F
    log_table = f"{store_name}_ingest_log"
    rid = str(run_id or "")
    legacy = False
    exists = spark.catalog.tableExists(log_table)
    if not exists:
        # a crashed prior session can leave the log's managed location
        # on disk with no catalog entry (in-memory catalog, files
        # persist); creating over it fails with LOCATION_ALREADY_EXISTS
        # — clear the orphan, same treatment as every store table
        drop_store_table(spark, log_table)
    if exists:
        spark.catalog.refreshTable(log_table)
        log = spark.table(log_table)
        legacy = "run_id" not in log.columns
        if legacy and rid:
            # A batch-only log cannot say WHICH lineage its ids belong
            # to: matching on batch_id alone would silently drop a NEW
            # stream's first batches as "replays" of the old one, and
            # ignoring the log would double-apply a RESUMED old
            # stream's replays. Neither silent outcome is acceptable —
            # fail loudly with the remedy (same contract as
            # begin_build's missing-knob check).
            raise ValueError(
                f"store {store_name}'s ingest log predates run-id "
                f"namespacing (batch-id-only rows); rebuild the store "
                f"(mode='overwrite' resets the log) before streaming "
                f"into it with a checkpoint lineage")
        done = log.filter(F.col("batch_id") == int(batch_id))
        if not legacy:
            done = done.filter(F.col("run_id") == rid)
        if done.limit(1).count():
            return False
    apply_fn()
    if legacy:
        row = spark.sql(
            f"SELECT CAST({int(batch_id)} AS BIGINT) AS batch_id")
    else:
        esc = rid.replace("'", "''")
        row = spark.sql(
            f"SELECT CAST({int(batch_id)} AS BIGINT) AS batch_id, "
            f"'{esc}' AS run_id")
    row.write.mode("append").format("parquet").saveAsTable(log_table)
    return True


_TS_SIZE_CACHE: dict = {}


def tombstones(spark, store_name: str,
               broadcast_rows: int = 2_000_000):
    """Read ``{store}_tombstones`` for a reader-side anti-join, or
    None when no takedown was ever issued. The normal contract is
    that tombstones stay SMALL between compactions, so the table is
    broadcast-hinted and the anti-join never exchanges the bucketed /
    partition-pruned store scan — but that assumption is enforced, not
    assumed: the row count gates the hint, and a jumbo takedown (e.g.
    a licensing removal of a whole corpus slice, before its
    compaction) falls back to a plain shuffled anti-join instead of
    force-broadcasting a corpus-scale table into every executor. 2M
    ids ≈ tens of MB broadcast — comfortably under executor headroom;
    past that, `compact_store` is overdue anyway.

    The gate decision is memoized per (session, store): serving calls
    and streaming micro-batches don't pay a count job each —
    `write_bucketed` / `drop_store_table` invalidate the memo on every
    tombstone append, compaction, or rebuild in this process (an
    append from a DIFFERENT process goes stale only for the hint
    decision, never the data — the same staleness class as Spark's own
    relation cache, cleared by the same refresh)."""
    from pyspark.sql import functions as F
    ts_table = f"{store_name}_tombstones"
    if not spark.catalog.tableExists(ts_table):
        return None
    ts = spark.table(ts_table)
    hit = _TS_SIZE_CACHE.get(store_name)
    if hit is not None and hit[0] is spark:
        n = hit[1]
    else:
        n = ts.count()
        if len(_TS_SIZE_CACHE) >= 512:
            _TS_SIZE_CACHE.clear()
        _TS_SIZE_CACHE[store_name] = (spark, n)
    return F.broadcast(ts) if n <= int(broadcast_rows) else ts


def refresh_store(spark, store_name: str,
                  suffixes: tuple[str, ...]) -> None:
    """Invalidate relation caches after an append: a table read before
    the append stays cached at its old file list in this session and
    would silently miss the new increment."""
    for suffix in suffixes:
        spark.catalog.refreshTable(store_name + suffix)

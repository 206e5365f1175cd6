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
    orphaned locations) and return None.

    ``mode='append'``: read the ``{store}_meta`` row, check that each
    knob in ``validate`` matches what the store was built with (a
    mismatched append would corrupt the index — batches must
    fingerprint exactly like the store), and return the meta Row so
    the caller can inherit stored values (num_buckets, scalars,
    model shapes)."""
    if mode == "append":
        m = spark.table(f"{store_name}_meta").collect()[0]
        bad = {k: (m[k], v) for k, v in (validate or {}).items()
               if k in m.__fields__ and int(m[k]) != int(v)}
        if bad:
            built = ", ".join(f"{k}={m[k]}" for k in bad)
            asked = ", ".join(f"{k}={v}" for k, (_, v) in bad.items())
            raise ValueError(
                f"store {store_name} was built with {built}; appending "
                f"with {asked} would corrupt it")
        return m
    for suffix in suffixes:
        drop_store_table(spark, store_name + suffix)
    return None


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   num_buckets: int, mode: str) -> None:
    """Write a store table bucketed AND sorted by its join key:
    `spark.table` scans then restore the hash partitioning, so the
    store side of every candidate/anti join reaches the join with
    ZERO Exchange (plan-pinned per store kind)."""
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


def refresh_store(spark, store_name: str,
                  suffixes: tuple[str, ...]) -> None:
    """Invalidate relation caches after an append: a table read before
    the append stays cached at its old file list in this session and
    would silently miss the new increment."""
    for suffix in suffixes:
        spark.catalog.refreshTable(store_name + suffix)

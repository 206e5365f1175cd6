"""Z-order layout tests: Morton key correctness + locality property."""

import glob

import numpy as np
import pytest
from pyspark.sql import functions as F

from pipelinedp_spark.functions.layout import (with_zorder_key,
                                               write_zordered, zorder_key)


def test_zorder_key_interleaves_bits(spark):
    # d=2, bits=2: key = y1 x1 y0 x0 (col 0 at even positions).
    rows = [(0, 0, 0), (1, 3, 1), (2, 1, 2), (3, 2, 3)]
    df = spark.createDataFrame(rows, "i long, x long, y long")
    out = {r["i"]: r["k"] for r in df.select(
        "i", zorder_key([F.col("x"), F.col("y")], bits=2).alias("k"))
        .collect()}
    def morton(x, y):
        return ((x & 1) | ((y & 1) << 1) | ((x >> 1 & 1) << 2)
                | ((y >> 1 & 1) << 3))
    for i, x, y in rows:
        assert out[i] == morton(x, y), (i, x, y)


def test_with_zorder_key_is_deterministic_and_range_stable(spark):
    rows = [(i, float(i % 17), float(i % 23)) for i in range(200)]
    df = spark.createDataFrame(rows, "i long, a double, b double")
    k1 = {r["i"]: r["zkey"]
          for r in with_zorder_key(df, ["a", "b"]).collect()}
    # Supplying the same ranges explicitly reproduces the keys exactly
    # (incremental-ingestion contract).
    k2 = {r["i"]: r["zkey"] for r in with_zorder_key(
        df, ["a", "b"], ranges={"a": (0.0, 16.0),
                                "b": (0.0, 22.0)}).collect()}
    assert k1 == k2 and len(set(k1.values())) > 100


def test_zorder_chunks_have_compact_bounding_boxes(spark):
    # The point of the curve: chunking by zkey gives every chunk a small
    # bbox in BOTH dimensions, while sorting by one column leaves the
    # other's per-chunk range at full width.
    n = 40
    rows = [(i * n + j, float(i), float(j))
            for i in range(n) for j in range(n)]
    df = spark.createDataFrame(rows, "i long, x double, y double")
    keyed = with_zorder_key(df, ["x", "y"], bits=8).toPandas()
    chunks = 16

    def mean_ranges(pdf, sort_col):
        s = pdf.sort_values(sort_col).reset_index(drop=True)
        xr, yr = [], []
        for c in np.array_split(s, chunks):
            xr.append(c["x"].max() - c["x"].min() + 1)
            yr.append(c["y"].max() - c["y"].min() + 1)
        return float(np.mean(xr)), float(np.mean(yr))

    zx, zy = mean_ranges(keyed, "zkey")
    cx, cy = mean_ranges(keyed, "x")
    # File skipping prunes per-dimension: an x-sorted layout leaves the
    # y min/max at FULL width (no y-predicate ever skips a chunk), while
    # z-curve chunks stay compact in BOTH dimensions (~10 of 40 here).
    assert cy >= 39.0                     # x-sort: y stats useless
    assert zx <= 12.0 and zy <= 12.0, (zx, zy)


def test_write_zordered_files_cover_compact_boxes(spark, tmp_path):
    n = 32
    rows = [(i * n + j, float(i), float(j))
            for i in range(n) for j in range(n)]
    df = spark.createDataFrame(rows, "i long, x double, y double")
    path = str(tmp_path / "z")
    write_zordered(df, path, ["x", "y"], num_files=8, bits=8)
    files = glob.glob(path + "/part-*.parquet")
    assert len(files) >= 4
    import pandas as pd
    areas = []
    total = 0
    for f in files:
        pdf = pd.read_parquet(f)
        if len(pdf) == 0:
            continue
        total += len(pdf)
        areas.append((pdf["x"].max() - pdf["x"].min() + 1)
                     * (pdf["y"].max() - pdf["y"].min() + 1))
    assert total == n * n                       # nothing lost
    assert "zkey" not in pdf.columns            # key dropped
    # every file's bbox is far under the full domain (32x32 = 1024)
    assert float(np.mean(areas)) < 1024 / 3


def test_with_zorder_key_accepts_timestamp_columns(spark):
    from datetime import datetime
    rows = [(i, datetime(2024, 1, 1 + i % 20), float(i % 7))
            for i in range(50)]
    df = spark.createDataFrame(rows, "i long, ts timestamp, v double")
    out = with_zorder_key(df, ["ts", "v"], bits=8).collect()
    assert len(out) == 50 and len({r["zkey"] for r in out}) > 10

"""Semi-structured (JSON string) column handling for event pipelines.

Scale posture: `from_json` with an EXPLICIT schema is the hot path —
one parse per row, columnar output, no schema inference scan.
`get_json_object` re-parses the string per call, so it is only for
one-off field plucks; `schema_of_json`-style inference is never run
over big data here (callers pass the schema, same contract as the
file readers in `sources.catalog`).
"""

from __future__ import annotations

from typing import List

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["json_field", "json_fields", "json_key_profile"]


def json_field(col: Column, path: str) -> Column:
    """Single-field pluck (`get_json_object`, codegen JsonPath).
    Re-parses per call — for >1 field from the same column use
    `json_fields` (one parse)."""
    return F.get_json_object(col, path)


def json_fields(df: DataFrame, col: str, schema: str,
                prefix: str = "") -> DataFrame:
    """All fields in one parse: `from_json` with an explicit DDL
    schema (e.g. ``"k INT, name STRING"``), exploded to top-level
    columns with optional prefix. The scale-right multi-field path."""
    parsed = F.from_json(F.col(col), schema)
    names = [f.strip().split()[0] for f in schema.split(",")]
    return df.withColumns(
        {f"{prefix}{n}": parsed[n] for n in names})


def json_key_profile(df: DataFrame, col: str) -> DataFrame:
    """Schema discovery report over a JSON column: per top-level key,
    how many rows carry it (presence drives whether a field is worth
    promoting to a real column). One explode of `json_object_keys` +
    a map-side-combinable count — no driver-side sampling."""
    return (df.select(F.explode(F.json_object_keys(F.col(col)))
                      .alias("key"))
            .groupBy("key")
            .agg(F.count(F.lit(1)).alias("rows")))


def parse_with_quarantine(df: DataFrame, col: str, schema: str):
    """Production ingestion split: parse the JSON column with an
    explicit schema and route rows to (good, quarantined) — a
    malformed or schema-violating payload must never silently become
    NULLs in the gold table NOR kill the job. Detection uses
    PERMISSIVE mode's corrupt-record column (the parser writes the raw
    payload there on failure), so malformed payloads quarantine while
    well-formed rows with missing keys stay good. Both outputs share
    one lazy parse expression; Catalyst prunes whichever side a
    consumer doesn't read."""
    full = schema + ", _corrupt STRING"
    parsed = F.from_json(F.col(col), full,
                         {"columnNameOfCorruptRecord": "_corrupt",
                          "mode": "PERMISSIVE"})
    tagged = df.withColumn("__parsed__", parsed)
    bad_cond = (F.col(col).isNotNull()
                & F.col("__parsed__._corrupt").isNotNull())
    good = (tagged.filter(~bad_cond)
            .select(*df.columns,
                    F.col("__parsed__").dropFields("_corrupt")
                    .alias("parsed")))
    quarantined = tagged.filter(bad_cond).select(*df.columns)
    return good, quarantined

"""Input/output: table catalog, batch readers/writers, stream sources.

The reference delegates I/O to the host framework (reference:
examples/movie_view_ratings/run_on_spark.py:46-48 uses sc.textFile;
examples/restaurant_visits/run_on_dataframes.py:63-69 uses spark.read.csv);
this engine ships a small explicit layer so queries are written against
named tables and the format quirks live in one place.
"""

from pipelinedp_spark.sources.catalog import (CANONICAL_TABLES, load_tables,
                                              read_csv, read_json,
                                              read_orc, read_parquet,
                                              read_stream, read_table,
                                              register_temp_views,
                                              write_bucketed_table,
                                              write_orc, write_parquet,
                                              write_stream)
from pipelinedp_spark.sources import webcrawl  # noqa: F401

__all__ = [
    "CANONICAL_TABLES",
    "load_tables",
    "read_csv",
    "read_json",
    "read_orc",
    "read_parquet",
    "read_stream",
    "read_table",
    "register_temp_views",
    "write_bucketed_table",
    "write_orc",
    "write_parquet",
    "write_stream",
]

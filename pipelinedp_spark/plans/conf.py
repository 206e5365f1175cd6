"""Scoped Spark-conf overrides.

Spark session confs are global to the SparkSession; operators that tune
e.g. ``spark.sql.shuffle.partitions`` for their own jobs (iterative
graph rounds shuffle edge-sized data, far below the session default
sized for corpus tables) must restore the previous value or they leak
the override into unrelated queries. ``scoped_conf`` centralizes the
save/patch/restore dance. Caveat (inherent to session-global conf, not
to this helper): a CONCURRENT query planned inside the scope sees the
override — do not share one SparkSession across threads while a scoped
override is active. Revisit when Spark grows per-query conf scoping.
"""

from __future__ import annotations

import contextlib
from typing import Iterator


@contextlib.contextmanager
def scoped_conf(spark, **confs: str) -> Iterator[None]:
    """Temporarily set session confs (keys with ``_`` for ``.`` are not
    translated — pass the dotted key via dict expansion:
    ``scoped_conf(spark, **{"spark.sql.shuffle.partitions": "8"})``).
    Values restore on exit, including on exceptions; confs unset before
    entry are unset again on exit."""
    saved: dict[str, str | None] = {}
    for k, v in confs.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, old in saved.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)

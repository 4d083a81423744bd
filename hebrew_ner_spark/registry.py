"""Query/oracle registry.

Every implemented operator is exposed as a named query
``(spark, sf_dir) -> DataFrame`` plus (where ANSI-SQL can express the same
semantics) a DuckDB oracle SQL string. The driver's correctness gate runs
both sides at sf=0.01 and compares row counts + order-insensitive value
hashes with columns sorted by name — so every computed column is aliased
identically in the Spark plan and the oracle.

Domain modules under ``hebrew_ner_spark.querydefs`` register themselves via
the ``query`` decorator at import time.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register ``fn`` under ``name``; ``oracle`` is DuckDB SQL or None
    (None -> the driver records a weaker rows-only check)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco

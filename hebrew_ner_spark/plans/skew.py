"""Explicit skew handling: salted two-phase aggregation.

The north_rule requires partitioning/shuffle/skew handled explicitly. At
10^12 documents a handful of mega-entities receive a double-digit share of
all mentions; a naive groupBy puts each hot key in a single reducer task.

Pattern (mirrors the reference's two-level morph label merge, the partial
collect_list in utils/ner.py:149-155, generalized to algebraic aggregates):

  1. phase 1 groups by (keys..., salt) where salt = pmod(hash(row-unique), B)
     -> B parallel partial aggregates per hot key;
  2. phase 2 re-aggregates by (keys...) over at most B rows per key.

AQE's skew-join splitting handles *join* skew automatically; this helper is
for *aggregation* skew which AQE does not rebalance (partial aggregation
helps only when upstream partitions are key-diverse; after a prior shuffle
on a correlated key it does not).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count(
    df: DataFrame,
    keys: list[str],
    buckets: int,
    out_col: str = "n",
) -> DataFrame:
    """Two-phase count(*) by `keys`, spreading each key over `buckets` tasks."""
    salt = F.pmod(F.xxhash64(*[F.col(k) for k in df.columns]), F.lit(buckets))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(F.count("*").alias("_partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("_partial").cast("long").alias(out_col))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    buckets: int,
    partial_aggs: list[Column],
    final_aggs: list[Column],
) -> DataFrame:
    """General two-phase aggregation for algebraic measures.

    `partial_aggs` run per (keys, salt); `final_aggs` combine the partials
    (they see the phase-1 column names). E.g. sum -> sum(sum), count ->
    sum(count), min -> min(min), avg -> sum(sum)/sum(count).
    """
    salt = F.pmod(F.xxhash64(*[F.col(k) for k in df.columns]), F.lit(buckets))
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


SKEW_TARGET_ROWS = 4096  # rows a single reduce task should own per key


def skew_audit(
    rows: DataFrame, key: str, target: int = SKEW_TARGET_ROWS
) -> DataFrame:
    """(n_rows, n_keys, max_key_rows, max_key, mean_key_rows_1e6,
    skew_ratio_1e6, salt_factor) — one row: the pre-flight skew audit a
    pipeline runs BEFORE keying an aggregation on ``key``, and the salt
    fan-out it should use.

    skew_ratio = max_key_rows / mean_key_rows (1e6 half-up): ~1e6 means
    uniform keys, orders of magnitude more means a mega-key that will
    pin one reducer. salt_factor = ceil(max_key_rows / target) — the B
    that bounds every phase-1 partial at ~target rows (1 = no salting
    needed). The audit itself is skew-proof: one map-side-combinable
    count per key, then a single argmax fold over the key-count table;
    the hot key is never materialized wider than its count.
    """
    per = rows.groupBy(key).agg(F.count("*").cast("long").alias("_c"))
    return per.agg(
        F.sum("_c").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_keys"),
        F.max("_c").cast("long").alias("max_key_rows"),
        F.max(F.struct(F.col("_c"), F.col(key).alias("k")))["k"]
        .cast("string")
        .alias("max_key"),
    ).select(
        "n_rows",
        "n_keys",
        "max_key_rows",
        "max_key",
        F.expr("(2 * n_rows * 1000000 + n_keys) DIV (2 * n_keys)").alias(
            "mean_key_rows_1e6"
        ),
        F.expr(
            "(2 * max_key_rows * n_keys * 1000000 + n_rows) DIV (2 * n_rows)"
        ).alias("skew_ratio_1e6"),
        F.expr(f"(max_key_rows + {target} - 1) DIV {target}")
        .cast("long")
        .alias("salt_factor"),
    )

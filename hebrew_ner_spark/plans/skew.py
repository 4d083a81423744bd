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

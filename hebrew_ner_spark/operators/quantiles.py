"""Sort-free exact quantiles and log2 histograms over bounded-integer
measures (document length, token count) — the deterministic alternative
to ``DataFrame.approxQuantile``.

Why this belongs in the engine: corpus curation decisions (length
cutoffs, truncation budgets, outlier fences) are quantile reads over
10^12 rows. A global sort is the naive plan; ``approxQuantile`` is
driver-side, non-deterministic across partitionings, and float-valued —
useless for resume-stable, oracle-checkable pipelines. For an integer
measure with bounded domain (doc length, token count — bounded by the
max document size regardless of corpus size) the exact answer is
cheap at any scale:

  1. ``groupBy(stratum, value) count`` — map-side partial aggregation
     compresses 10^12 rows to at most |distinct values| rows per
     stratum (<= max doc length, corpus-size independent) BEFORE the
     shuffle;
  2. one window cumsum over that tiny histogram;
  3. percentile_disc semantics in pure integers: the q-th percentile is
     the smallest value whose cumulative count satisfies
     ``100 * cum >= q * total`` — no float division in either engine.

The same histogram answers every q at once (one pass, many reads),
and histograms of disjoint shards MERGE by summing counts — the same
mergeability contract as operators/sketches.py (pytest-pinned).

For unbounded/float measures this histogram is not applicable — a rank
sketch (KLL/t-digest) would be the production tool; documented here so
the boundary is explicit. The log2-bucketed histogram (bitlen via the
``bin()``-length idiom, cf. operators/sketches.py rho) covers the
"shape of a heavy-tailed distribution" read at any domain size with
<= 64 buckets per stratum.

Reference anchor: the reference's corpus passes compute exact length
stats in-memory (utils/data.py instance filtering by max_sent_length);
this is that read re-expressed for a corpus that does not fit anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

QUANTILES = [25, 50, 75, 95, 99]


def value_histogram(df: DataFrame, stratum: str, value_col) -> DataFrame:
    """(stratum, v, cnt) — exact histogram of an integer measure; the
    only shuffle is over (stratum, v), map-side combined."""
    return (
        df.select(F.col(stratum), value_col.cast("long").alias("v"))
        .groupBy(stratum, "v")
        .agg(F.count("*").alias("cnt"))
    )


def exact_quantiles(
    df: DataFrame, stratum: str, value_col, qs: list[int] = QUANTILES
) -> DataFrame:
    """(stratum, q, v) — percentile_disc(q/100) per stratum, exact and
    integer-only: smallest v with 100 * cum(v) >= q * total."""
    hist = value_histogram(df, stratum, value_col)
    w = (
        Window.partitionBy(stratum)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        stratum,
        "v",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(Window.partitionBy(stratum)).alias("total"),
    )
    q_df = cum.sparkSession.createDataFrame([(q,) for q in qs], "q long")
    return (
        cum.join(F.broadcast(q_df), F.lit(100) * F.col("cum") >= F.col("q") * F.col("total"))
        .groupBy(stratum, "q")
        .agg(F.min("v").alias("v"))
    )


def log2_histogram(df: DataFrame, stratum: str, value_col) -> DataFrame:
    """(stratum, bucket, n) — power-of-two histogram: bucket = bitlen(v)
    (0 for v <= 0), via the cross-engine ``length(bin(v))`` idiom; at
    most 64 buckets per stratum at ANY domain size."""
    proj = df.select(F.col(stratum), value_col.cast("long").alias("v"))
    # bin() renders two's complement for negatives; the v <= 0 guard
    # keeps the bucket expression total anyway
    bucket = F.when(F.col("v") <= 0, F.lit(0)).otherwise(
        F.length(F.expr("bin(v)"))
    )
    return (
        proj.select(stratum, bucket.cast("long").alias("bucket"))
        .groupBy(stratum, "bucket")
        .agg(F.count("*").alias("n"))
    )


def weighted_quantiles(
    df: DataFrame,
    stratum: str,
    value_col,
    weight_col,
    qs: list[int] = QUANTILES,
) -> DataFrame:
    """(stratum, q, v) — weighted percentile_disc per stratum: the
    smallest v whose cumulative WEIGHT reaches q% of the stratum's
    total weight. The planner question exact_quantiles cannot answer:
    "below what document length does half the stratum's TOKEN MASS
    sit?" — which is what sizes batches and shards, because cost
    follows tokens, not document counts (one 50k-token page outweighs
    a thousand stubs).

    Same scale discipline as exact_quantiles: collapse to (stratum, v)
    grain first (weights SUM map-side), so the per-stratum window walks
    distinct values, not rows; 100 * cum >= q * total keeps the test in
    exact integers on both engines.
    """
    hist = (
        df.select(
            F.col(stratum),
            value_col.cast("long").alias("v"),
            weight_col.cast("long").alias("_w"),
        )
        .groupBy(stratum, "v")
        .agg(F.sum("_w").alias("wsum"))
    )
    w = (
        Window.partitionBy(stratum)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        stratum,
        "v",
        F.sum("wsum").over(w).alias("cum"),
        F.sum("wsum").over(Window.partitionBy(stratum)).alias("total"),
    )
    q_df = cum.sparkSession.createDataFrame([(q,) for q in qs], "q long")
    return (
        cum.join(
            F.broadcast(q_df),
            F.lit(100) * F.col("cum") >= F.col("q") * F.col("total"),
        )
        .groupBy(stratum, "q")
        .agg(F.min("v").alias("v"))
    )

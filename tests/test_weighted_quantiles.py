"""Weighted percentile closed-form fixtures."""

from __future__ import annotations

import pyspark.sql.functions as F

from hebrew_ner_spark.operators.quantiles import weighted_quantiles


def test_weighted_median_follows_mass(spark):
    # values 1..4, weight = value: total 10; cum: 1,3,6,10
    # w-median (q50): first v with cum >= 5 -> 3 ; unweighted median is 2
    rows = [("he", v) for v in [1, 2, 3, 4]]
    df = spark.createDataFrame(rows, "lang string, v long")
    out = {
        (r["lang"], r["q"]): r["v"]
        for r in weighted_quantiles(
            df, "lang", F.col("v"), F.col("v"), [50, 99]
        ).collect()
    }
    assert out[("he", 50)] == 3
    assert out[("he", 99)] == 4


def test_uniform_weights_match_unweighted(spark):
    from hebrew_ner_spark.operators.quantiles import exact_quantiles

    rows = [("x", v) for v in [5, 7, 9, 11, 13, 200]]
    df = spark.createDataFrame(rows, "lang string, v long")
    wq = {
        (r["q"]): r["v"]
        for r in weighted_quantiles(
            df, "lang", F.col("v"), F.lit(1), [25, 50, 95]
        ).collect()
    }
    eq = {
        (r["q"]): r["v"]
        for r in exact_quantiles(df, "lang", F.col("v"), [25, 50, 95]).collect()
    }
    assert wq == eq

"""Closed-form blocking-quality fixtures."""

from __future__ import annotations

from hebrew_ner_spark.operators.clustereval import blocking_quality


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "doc_a long, doc_b long")


def _corpus(spark, n):
    return spark.createDataFrame([(i,) for i in range(n)], "doc_id long")


def test_closed_form(spark):
    # 5 docs -> 10 possible pairs; 2 candidates, 2 gold, 1 hit
    cand = _pairs(spark, [(0, 1), (2, 3)])
    gold = _pairs(spark, [(0, 1), (3, 4)])
    r = blocking_quality(cand, gold, _corpus(spark, 5)).collect()[0]
    assert r["n_docs"] == 5 and r["n_cand"] == 2
    assert r["n_gold"] == 2 and r["n_hit"] == 1
    assert r["pair_completeness_1e6"] == 500_000
    assert r["reduction_ratio_1e6"] == 800_000  # 1 - 2/10


def test_degenerate_cases(spark):
    # empty gold -> PC defined 1e6; all-pairs candidates -> RR 0
    allp = _pairs(spark, [(a, b) for a in range(4) for b in range(a + 1, 4)])
    r = blocking_quality(allp, _pairs(spark, []), _corpus(spark, 4)).collect()[0]
    assert r["pair_completeness_1e6"] == 1_000_000
    assert r["reduction_ratio_1e6"] == 0

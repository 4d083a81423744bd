"""Harmonic centrality over a closed-form path graph."""

from __future__ import annotations

from hebrew_ner_spark.operators.hyperball import (
    harmonic_centrality,
    hyperball_estimates,
)


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def test_path_graph_harmonic(spark):
    # a -> b -> c : H(a) = 1/1 + 1/2 (exact-ball regime: tiny balls ->
    # HLL linear counting is exact), H(b) = 1, H(c) = 0
    e = _edges(spark, [("a", "b"), ("b", "c")])
    out = {r["host"]: r["harmonic_1e6"] for r in harmonic_centrality(e, 2).collect()}
    assert out["a"] == 1_000_000 + 500_000
    assert out["b"] == 1_000_000
    assert out["c"] == 0


def test_sum_of_shells_equals_ball_growth(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")])
    est = {
        (r["host"], r["t"]): r["est_ball"]
        for r in hyperball_estimates(e, 3).collect()
    }
    hc = {r["host"]: r["harmonic_1e6"] for r in harmonic_centrality(e, 3).collect()}
    # every host with ball growth has positive centrality and vice versa
    for h in {k[0] for k in est}:
        grew = est[(h, 3)] > est[(h, 0)]
        assert (hc[h] > 0) == grew

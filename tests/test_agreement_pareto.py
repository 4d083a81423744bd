"""Closed-form fixtures for kappa agreement, fusion calibration wiring,
and the Pareto skyline (incl. a brute-force cross-check)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from hebrew_ner_spark.operators.clustereval import filter_agreement_kappa
from hebrew_ner_spark.operators.curation import pareto_frontier
from hebrew_ner_spark.operators.fusion import (
    FUSION_SCALE,
    N_CALIBRATION_BINS,
    fact_confidences,
    fusion_calibration,
)


def _flags(spark, rows):
    return spark.createDataFrame(rows, "lang string, rk long, lk long")


def test_kappa_closed_form(spark):
    # lang A: a=4 b=1 c=1 d=4 -> po=.8 pe=.5 kappa=.6
    rows = (
        [("A", 1, 1)] * 4 + [("A", 1, 0)] + [("A", 0, 1)] + [("A", 0, 0)] * 4
    )
    # lang B: perfect disagreement a=0 b=5 c=5 d=0 -> kappa=-1
    rows += [("B", 1, 0)] * 5 + [("B", 0, 1)] * 5
    # lang C: degenerate (all both-keep) -> pe=1 guard -> kappa=1e6
    rows += [("C", 1, 1)] * 3
    out = {
        r["lang"]: r
        for r in filter_agreement_kappa(_flags(spark, rows)).collect()
    }
    assert out["A"]["po_1e6"] == 800_000
    assert out["A"]["pe_1e6"] == 500_000
    assert out["A"]["kappa_1e6"] == 600_000
    assert out["B"]["kappa_1e6"] == -1_000_000
    assert out["B"]["po_1e6"] == 0
    assert out["C"]["kappa_1e6"] == 1_000_000
    assert out["C"]["n_both_keep"] == 3 and out["C"]["n_docs"] == 3


def test_kappa_cells_partition(spark):
    rows = [("X", i % 2, (i // 2) % 2) for i in range(20)]
    r = filter_agreement_kappa(_flags(spark, rows)).collect()[0]
    assert (
        r["n_both_keep"] + r["n_rule_only"] + r["n_lr_only"] + r["n_both_drop"]
        == r["n_docs"]
        == 20
    )


def _assertions(spark):
    # 3 hosts; slot (s, p) contested by o1 (2 hosts) vs o2 (1 host);
    # slot (s2, p) single-candidate.
    rows = [
        ("h0", "s", "p", "o1"),
        ("h1", "s", "p", "o1"),
        ("h2", "s", "p", "o2"),
        ("h0", "s2", "p", "x"),
    ]
    return spark.createDataFrame(
        rows, "host string, subj string, pred string, obj string"
    )


def test_calibration_wiring(spark):
    a = _assertions(spark)
    conf = fact_confidences(a)
    n_facts = conf.count()
    n_slots = conf.select("subj", "pred").distinct().count()
    out = fusion_calibration(a).collect()
    assert sum(r["n_facts"] for r in out) == n_facts
    assert sum(r["n_correct"] for r in out) == n_slots  # one winner/slot
    for r in out:
        assert 0 <= r["bin"] < N_CALIBRATION_BINS
        n, sc, nc = r["n_facts"], r["sum_conf_1e6"], r["n_correct"]
        assert r["mean_conf_1e6"] == (2 * sc + n) // (2 * n)
        assert r["acc_1e6"] == (2 * nc * 1_000_000 + n) // (2 * n)
        assert r["gap_1e6"] == (2 * abs(nc * 1_000_000 - sc) + n) // (2 * n)
        assert 0 <= r["mean_conf_1e6"] <= FUSION_SCALE


def _scored(spark, pts):
    return spark.createDataFrame(
        [(i, s, n) for i, (s, n) in enumerate(pts)],
        "doc_id long, score_1e6 long, n_tokens long",
    )


def _brute(pts):
    sky = set()
    for i, (s, n) in enumerate(pts):
        dominated = any(
            (s2 >= s and n2 >= n and (s2 > s or n2 > n))
            for j, (s2, n2) in enumerate(pts)
            if j != i
        )
        if not dominated:
            sky.add(i)
    return sky


def test_pareto_closed_form(spark):
    pts = [(0, 10), (0, 12), (5, 7), (5, 12), (3, 15)]
    got = {
        r["doc_id"] for r in pareto_frontier(_scored(spark, pts)).collect()
    }
    assert got == {3, 4}  # (5,12) and (3,15)


def test_pareto_ties_both_survive(spark):
    pts = [(5, 12), (5, 12), (1, 1)]
    got = {
        r["doc_id"] for r in pareto_frontier(_scored(spark, pts)).collect()
    }
    assert got == {0, 1}


def test_pareto_brute_force(spark):
    # deterministic pseudo-random cloud, incl. negative scores and
    # cross-bucket boundaries (bucket width 1000)
    pts = []
    x = 1234567
    for _ in range(300):
        x = (x * 1103515245 + 12345) % (1 << 31)
        s = x % 1_000_000 - 500_000
        x = (x * 1103515245 + 12345) % (1 << 31)
        n = x % 500
        pts.append((s, n))
    got = {
        r["doc_id"] for r in pareto_frontier(_scored(spark, pts)).collect()
    }
    assert got == _brute(pts)

"""Exact TV-distance closed-form fixtures."""

from __future__ import annotations

from hebrew_ner_spark.operators.textstats import token_drift_tv


def _hist(spark, rows):
    return spark.createDataFrame(rows, "v long, text string")


def test_tv_closed_form(spark):
    # v0: a a b  (p = 2/3, 1/3) ; v1: a b b  (p = 1/3, 2/3)
    # TV = 1/2 (|2/3-1/3| + |1/3-2/3|) = 1/3
    out = token_drift_tv(_hist(spark, [(0, "a a b"), (1, "a b b")]), 0, 1)
    r = out.collect()[0]
    assert r["n_tokens_a"] == 3 and r["n_tokens_b"] == 3
    assert r["n_types"] == 2
    assert r["tv_1e6"] == 333_333  # half-up of 1/3


def test_tv_identical_and_disjoint(spark):
    same = token_drift_tv(_hist(spark, [(0, "x y z"), (1, "x y z")]), 0, 1)
    assert same.collect()[0]["tv_1e6"] == 0
    disj = token_drift_tv(_hist(spark, [(0, "x y"), (1, "p q")]), 0, 1)
    assert disj.collect()[0]["tv_1e6"] == 1_000_000


def test_drift_heavy_ranks_the_mover(spark):
    from hebrew_ner_spark.operators.textstats import token_drift_heavy

    # 'boom' goes 0 -> 50 while everything else is stable
    rows = [(0, "a b c d e"), (1, "a b c d e " + "boom " * 50)]
    out = token_drift_heavy(_hist(spark, rows), 0, 1, 3).collect()
    by_rank = sorted(out, key=lambda r: r["rank"])
    assert by_rank[0]["token"] == "boom"
    assert by_rank[0]["c_a"] == 0 and by_rank[0]["c_b"] == 50
    assert len(out) == 3


def test_psi_closed_form(spark):
    from hebrew_ner_spark.operators.textstats import token_drift_psi

    # identical snapshots: every xa == xb -> each term 0 -> PSI 0
    same = token_drift_psi(_hist(spark, [(0, "x y z"), (1, "x y z")]), 0, 1)
    assert same.collect()[0]["psi_bits_1e3"] == 0

    # v0: a a a a b ; v1: a b b b b — replay the pinned formula exactly
    out = token_drift_psi(
        _hist(spark, [(0, "a a a a b"), (1, "a b b b b")]), 0, 1
    )
    r = out.collect()[0]
    na = nb = 5
    nt = 2
    num = 0
    for ca, cb in ((4, 1), (1, 4)):
        xa, xb = (ca + 1) * (nb + nt), (cb + 1) * (na + nt)
        num += (xa - xb) * (xa.bit_length() - xb.bit_length())
    den = (na + nt) * (nb + nt)
    assert r["psi_bits_1e3"] == (2 * num * 1000 + den) // (2 * den)
    assert r["psi_bits_1e3"] > 0


def test_psi_nonnegative_terms(spark):
    from hebrew_ner_spark.operators.textstats import token_drift_psi

    # disjoint vocabularies maximize drift; PSI must be positive
    out = token_drift_psi(_hist(spark, [(0, "x y"), (1, "p q")]), 0, 1)
    assert out.collect()[0]["psi_bits_1e3"] > 0

"""Weighted priority sample: determinism + length bias."""

from __future__ import annotations

from hebrew_ner_spark.operators.training import weighted_sample


def _docs(spark, sizes):
    rows = [(i, "he", "w " * n) for i, n in enumerate(sizes)]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_giant_doc_always_picked(spark):
    # one 50k-token doc among 200 five-token docs: its priority is
    # ~1e4x smaller than any peer's, so it must land in a quota of 5
    sizes = [5] * 200
    sizes[37] = 50_000
    out = weighted_sample(_docs(spark, sizes), quota=5).collect()
    assert 37 in {r["doc_id"] for r in out}
    assert len(out) == 5
    # ranks are 1..5 and ordered by (priority, doc_id)
    rows = sorted(out, key=lambda r: r["pick_rank"])
    pr = [(r["priority"], r["doc_id"]) for r in rows]
    assert pr == sorted(pr)


def test_deterministic_across_runs(spark):
    d = _docs(spark, [10, 20, 30, 40, 50, 60])
    a = {(r["doc_id"], r["pick_rank"]) for r in weighted_sample(d, 3).collect()}
    b = {(r["doc_id"], r["pick_rank"]) for r in weighted_sample(d, 3).collect()}
    assert a == b and len(a) == 3

"""Closed-form fixtures for TrustRank / spam mass."""

from __future__ import annotations

import pyspark.sql.functions as F

from hebrew_ner_spark.operators.pagerank import (
    entity_pagerank,
    trust_and_spam,
)


def _edges(spark, rows):
    return spark.createDataFrame(
        rows, "subj_id string, obj_id string, n_evidence long"
    )


def _seeds(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "entity_id string")


def test_trust_zero_outside_seed_reach(spark):
    # s (seed) -> a ; x (spam) -> a ; x unreachable from s
    e = _edges(spark, [("s", "a", 1), ("x", "a", 1)])
    out = {r["entity_id"]: r for r in trust_and_spam(e, _seeds(spark, ["s"])).collect()}
    assert out["x"]["tr_1e6"] == 0  # no trust path reaches x
    assert out["x"]["pr_1e6"] > 0
    assert out["x"]["spam_mass_1e6"] == 1_000_000  # all authority unendorsed
    assert out["s"]["tr_1e6"] > 0
    assert out["a"]["tr_1e6"] > 0  # trust flows s -> a
    # a gets equal pr contributions but only s-side trust: strictly
    # positive spam mass below 1
    assert 0 < out["a"]["spam_mass_1e6"] < 1_000_000


def test_pr_column_matches_entity_pagerank(spark):
    rows = [
        ("a", "b", 2), ("b", "c", 1), ("c", "a", 3),
        ("a", "c", 1), ("d", "a", 5),
    ]
    e = _edges(spark, rows)
    ts = {
        r["entity_id"]: r["pr_1e6"]
        for r in trust_and_spam(e, _seeds(spark, ["a"])).collect()
    }
    pr = {
        r["entity_id"]: r["pr_1e6"] for r in entity_pagerank(e).collect()
    }
    assert ts == pr  # the shared-loop pr vector is bit-identical


def test_all_seeds_means_no_spam(spark):
    e = _edges(spark, [("a", "b", 1), ("b", "a", 1)])
    out = trust_and_spam(e, _seeds(spark, ["a", "b"])).collect()
    for r in out:
        assert r["tr_1e6"] == r["pr_1e6"]
        assert r["spam_mass_1e6"] == 0

"""Skew audit + split balance closed-form fixtures."""

from __future__ import annotations

from hebrew_ner_spark.plans.skew import skew_audit


def test_skew_audit_closed_form(spark):
    # key 'hot' x 10 rows, 'a'/'b' x 1 each -> n=12, keys=3, max=10
    rows = [("hot",)] * 10 + [("a",), ("b",)]
    df = spark.createDataFrame(rows, "k string")
    r = skew_audit(df, "k", target=4).collect()[0]
    assert r["n_rows"] == 12 and r["n_keys"] == 3
    assert r["max_key_rows"] == 10 and r["max_key"] == "hot"
    assert r["mean_key_rows_1e6"] == 4_000_000  # 12/3
    assert r["skew_ratio_1e6"] == 2_500_000     # 10 / 4
    assert r["salt_factor"] == 3                # ceil(10/4)


def test_uniform_keys_need_no_salt(spark):
    rows = [(f"k{i}",) for i in range(20)]
    df = spark.createDataFrame(rows, "k string")
    r = skew_audit(df, "k", target=4).collect()[0]
    assert r["skew_ratio_1e6"] == 1_000_000
    assert r["salt_factor"] == 1

"""Exact quantiles vs numpy's inverted-CDF percentile, histogram
mergeability, and percentile_disc agreement (operators/quantiles.py)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from hebrew_ner_spark.operators import quantiles as qt

SF = "/root/testdata/sf0.001"


def test_quantiles_match_numpy_inverted_cdf(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {
        (r.lang, r.q): r.v
        for r in qt.exact_quantiles(docs, "lang", F.length("text")).collect()
    }
    pdf = docs.select("lang", F.length("text").alias("v")).toPandas()
    for lang, grp in pdf.groupby("lang"):
        vals = grp["v"].to_numpy()
        for q in qt.QUANTILES:
            want = int(np.percentile(vals, q, method="inverted_cdf"))
            assert got[(lang, q)] == want, (lang, q)


def test_quantiles_match_duckdb_percentile_disc(spark):
    """The integer formulation IS percentile_disc — pinned against the
    engine-native implementation, not just the replayed CTE."""
    import duckdb

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {
        (r.lang, r.q): r.v
        for r in qt.exact_quantiles(docs, "lang", F.length("text")).collect()
    }
    con = duckdb.connect()
    for (lang, q), v in got.items():
        want = con.execute(
            f"SELECT CAST(percentile_disc({q / 100}) WITHIN GROUP (ORDER BY length(text)) AS BIGINT) "
            f"FROM '{SF}/documents.parquet' WHERE lang = ?",
            [lang],
        ).fetchone()[0]
        assert v == want, (lang, q, v, want)


def test_histogram_merges_by_summing(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    whole = qt.value_histogram(docs, "lang", F.length("text"))
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    merged = (
        qt.value_histogram(a, "lang", F.length("text"))
        .union(qt.value_histogram(b, "lang", F.length("text")))
        .groupBy("lang", "v")
        .agg(F.sum("cnt").alias("cnt"))
    )
    key = lambda rows: {(r.lang, r.v): r.cnt for r in rows}  # noqa: E731
    assert key(whole.collect()) == key(merged.collect())


def test_log2_histogram_buckets(spark):
    df = spark.createDataFrame(
        [("x", 0), ("x", 1), ("x", 2), ("x", 3), ("x", 1023), ("x", 1024)],
        "lang string, v long",
    )
    got = {
        (r.lang, r.bucket): r.n
        for r in qt.log2_histogram(df, "lang", F.col("v")).collect()
    }
    # bitlen: 0->0, 1->1, 2..3->2, 1023->10, 1024->11
    assert got == {
        ("x", 0): 1, ("x", 1): 1, ("x", 2): 2, ("x", 10): 1, ("x", 11): 1,
    }

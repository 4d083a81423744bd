"""B-cubed cluster eval: hand-computed fixtures + dedup-gate wiring."""

from pyspark.sql import functions as F

from hebrew_ner_spark.operators import clustereval

M = clustereval.M


def _prf(spark, rows):
    a = spark.createDataFrame(rows, "item long, pred long, gold long")
    return clustereval.bcubed_prf(a).collect()[0]


def test_perfect_clustering(spark):
    r = _prf(spark, [(1, 10, 7), (2, 10, 7), (3, 11, 8)])
    assert (r.precision_1e6, r.recall_1e6, r.f1_1e6) == (M, M, M)


def test_bcubed_overmerge_prices_precision(spark):
    # pred merges two gold clusters of sizes 2 and 1 into one cluster of 3
    # B3 P = mean(2/3, 2/3, 1/3) = 5/9; R = 1
    r = _prf(spark, [(1, 10, 7), (2, 10, 7), (3, 10, 8)])
    assert r.recall_1e6 == M
    # per-cell half-up terms: (4/3)*1e6 -> 1333333, (1/3)*1e6 -> 333333;
    # sum 1666666 over 3 items -> 555555
    assert r.precision_1e6 == 555555
    p, q = r.precision_1e6, M
    assert r.f1_1e6 == (2 * 2 * p * q + (p + q)) // (2 * (p + q))


def test_bcubed_split_prices_recall(spark):
    # gold cluster of 4 split into two pred clusters of 2:
    # R = mean(2/4 x4) = 1/2, P = 1
    r = _prf(
        spark,
        [(1, 10, 7), (2, 10, 7), (3, 11, 7), (4, 11, 7)],
    )
    assert r.precision_1e6 == M
    assert r.recall_1e6 == 500000
    assert r.n_items == 4


def test_bcubed_degenerate_guard(spark):
    """All singletons vs all-one-gold: P=1, R=1/n — f1 finite; and the
    P+R=0 branch is expressible (never NULL)."""
    r = _prf(spark, [(i, i, 1) for i in range(1, 5)])
    assert r.precision_1e6 == M
    assert r.recall_1e6 == 250000


def test_dedup_assign_covers_every_doc(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    comp = spark.createDataFrame([], "doc_id long, component_id long")
    a = clustereval.dedup_bcubed_assign(docs, comp)
    n_docs = docs.count()
    assert a.count() == n_docs
    # with no components every pred is the item itself (all singletons)
    assert a.where(F.col("pred") != F.col("item")).count() == 0
    # items unique
    assert a.select("item").distinct().count() == n_docs

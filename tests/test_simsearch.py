"""ANN similarity-search tests (sf0.001 embeddings)."""

import pytest
from pyspark.sql import functions as F

from hebrew_ner_spark.operators import simsearch

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_brute_topk_shape_and_self_exclusion(emb):
    out = simsearch.brute_topk(emb, n_queries=8, k=5).toPandas()
    assert set(out.columns) == {"qid", "nid", "rank", "cos_1e6"}
    assert (out.groupby("qid")["rank"].max() == 5).all()
    assert not (out.qid == out.nid).any()
    # ranks are descending in score within each query
    for _, g in out.groupby("qid"):
        s = g.sort_values("rank").cos_1e6.tolist()
        assert s == sorted(s, reverse=True)


def test_lsh_topk_is_subset_consistent_with_brute(emb):
    """Every LSH hit must carry the same score brute force assigns."""
    brute = simsearch.brute_topk(emb, n_queries=16, k=1000).toPandas()
    lsh = simsearch.rp_lsh_topk(emb, n_queries=16, k=1000).toPandas()
    bscore = {(r.qid, r.nid): r.cos_1e6 for r in brute.itertuples()}
    for r in lsh.itertuples():
        assert bscore[(r.qid, r.nid)] == r.cos_1e6


def test_sign_matrix_deterministic():
    m1 = simsearch.sign_matrix()
    m2 = simsearch.sign_matrix()
    assert m1 == m2
    assert all(v in (-1, 1) for row in m1 for v in row)


def test_buckets_cover_all_vectors(emb):
    n = emb.count()
    b = simsearch.rp_lsh_buckets(emb)
    assert b.count() == n
    assert b.where(F.col("bucket").isNull()).count() == 0

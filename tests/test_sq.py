"""Scalar-quantization tests (sf0.001 embeddings)."""

import math

import pytest
from pyspark.sql import functions as F

from hebrew_ner_spark.operators import sq

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_codes_bounds_and_extremes(emb):
    out = sq.sq_codes_long(emb).toPandas()
    assert out.q.between(0, sq.SQ_LEVELS).all()
    # affine quantization maps each dimension's min to 0 and max to 255
    per_dim = out.groupby("dim").q.agg(["min", "max"])
    assert (per_dim["min"] == 0).all()
    assert (per_dim["max"] == sq.SQ_LEVELS).all()


def test_quantizer_matches_python_recompute(emb):
    mm = {r.dim: (r.mn, r.mx) for r in sq.sq_train(emb).collect()}
    sample = emb.where(F.col("vec_id") < 5).collect()
    got = {
        (r.vec_id, r.dim): r.q
        for r in sq.sq_codes_long(emb).where(F.col("vec_id") < 5).collect()
    }
    for row in sample:
        for d, x in enumerate(row.embedding):
            xm = int(math.floor(float(x) * 1e6 + 0.5))
            mn, mx = mm[d]
            want = 0 if mx == mn else (2 * (xm - mn) * sq.SQ_LEVELS + (mx - mn)) // (
                2 * (mx - mn)
            )
            assert got[(row.vec_id, d)] == want


def test_encode_and_search_are_broadcast_only(emb, spark):
    params = sq.sq_train(emb)
    local = spark.createDataFrame(params.collect(), params.schema)
    plan = (
        sq.sq_encode(emb, local)._jdf.queryExecution().executedPlan().toString()
    )
    # corpus branch: scan -> project; the only exchanges feed the tiny
    # broadcast sides (no hash partitioning before the first broadcast)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    corpus_side = plan.split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in corpus_side


def test_near_lossless_recall(emb):
    out = sq.sq_recall(emb).toPandas()
    assert len(out) == sq.SQ_QUERIES
    # measured on this corpus: 79/80 — pin a safe floor that still
    # separates SQ8 sharply from the PQ tier (~26/80)
    assert (out.hits >= 9).all()
    assert out.hits.sum() >= 76


def test_distance_zero_iff_same_codes(emb):
    top = sq.sq_topk(emb, k=1).toPandas()
    # rank-1 for each query is the query itself with distance 0
    assert (top.qid == top.nid).all()
    assert (top.d == 0).all()

"""Product-quantization tests (sf0.001 embeddings)."""

import pytest
from pyspark.sql import functions as F

from hebrew_ner_spark.operators import pq

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def books(emb):
    b = pq.pq_codebooks(emb)
    return b.sparkSession.createDataFrame(b.collect(), b.schema)


def test_codes_shape_and_range(emb, books):
    n = emb.count()
    out = pq.pq_encode(emb, books).toPandas()
    assert len(out) == n * pq.PQ_M
    assert set(out.m.unique()) == set(range(pq.PQ_M))
    assert out.code.between(0, pq.PQ_K - 1).all()
    # every vector has exactly one code per subspace
    assert (out.groupby("vec_id").size() == pq.PQ_M).all()


def test_encode_is_zero_shuffle_on_corpus(emb, books, spark):
    """Given a trained (local) codebook, encoding must be broadcast +
    in-row argmin: the corpus branch has NO shuffle exchange and no
    per-candidate expand (the plan contains a BroadcastExchange for the
    grouped book but no window/sort over corpus x K rows)."""
    plan = (
        pq.pq_encode(emb, books)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastExchange" in plan
    assert "Window" not in plan
    # the only allowed Exchange feeds the 64-row codebook groupBy, never
    # the parquet scan side: count exchanges on paths mentioning the scan
    corpus_side = plan.split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in corpus_side


def test_adc_matches_python_recompute(emb, books):
    """ADC distance == sum over subspaces of the exact integer squared L2
    between the query's micro sub-vector and the corpus vector's assigned
    centroid — recomputed in plain Python for a sample."""
    book = {(r.m, r.code): list(r.cent) for r in books.collect()}
    codes = {
        (r.vec_id, r.m): r.code
        for r in pq.pq_encode(emb, books).where(F.col("vec_id") < 40).collect()
    }
    import math

    micro = {
        r.vec_id: [int(math.floor(float(x) * 1e6 + 0.5)) for x in r.embedding]
        for r in emb.where(F.col("vec_id") < 40).collect()
    }
    out = pq.pq_adc_topk(emb, k=1000, n_queries=2, books=books).toPandas()
    sample = out[out.nid < 40]
    assert len(sample) > 10
    for row in sample.itertuples():
        want = 0
        for m in range(pq.PQ_M):
            cent = book[(m, codes[(row.nid, m)])]
            qsub = micro[row.qid][m * pq.PQ_SUBDIM : (m + 1) * pq.PQ_SUBDIM]
            want += sum((a - b) * (a - b) for a, b in zip(qsub, cent))
        assert want == row.adc_d, (row.qid, row.nid)


def test_lloyd_improves_quantization(emb):
    """Total assignment distortion after trained Lloyd rounds must not
    exceed the seed codebooks' distortion (deterministic corpus)."""

    def total(books):
        sv = pq._subvecs(emb)
        assigned = pq._assign_codes(sv, books).withColumnRenamed("code", "acode")
        d = (
            sv.join(assigned, ["vec_id", "m"])
            .join(
                F.broadcast(books),
                (assigned.m == books.m) & (F.col("acode") == books.code),
            )
            .select(
                F.expr(
                    "aggregate(zip_with(sub, cent, (x, y) -> (x - y) * (x - y)),"
                    " 0L, (a, v) -> a + v)"
                ).alias("d")
            )
            .agg(F.sum("d"))
            .collect()[0][0]
        )
        return d

    seed = total(pq.seed_codebooks(emb))
    trained = total(pq.pq_codebooks(emb))
    assert trained <= seed
    assert trained < seed  # on this corpus the improvement is strict


def test_recall_bounds_and_self_hit(emb, books):
    out = pq.pq_recall(emb, books=books).toPandas()
    assert len(out) == pq.PQ_QUERIES
    assert out.hits.between(0, pq.PQ_TOPK).all()
    # PQ must carry real signal on this corpus: every query keeps at
    # least one true neighbor and the average is well above floor
    assert (out.hits >= 1).all()
    assert out.hits.sum() >= pq.PQ_QUERIES + 4


def test_codebooks_deterministic(emb):
    a = sorted(map(tuple, pq.pq_codebooks(emb).select("m", "code").collect()))
    b = sorted(map(tuple, pq.pq_codebooks(emb).select("m", "code").collect()))
    assert a == b


def test_ivfpq_consistent_with_full_adc(emb, books, spark):
    """Every IVF-PQ hit must carry the same ADC distance the full PQ
    scan assigns to that (qid, nid); restricting to probed cells can
    only drop candidates, never rescore them."""
    from hebrew_ner_spark.operators import simsearch

    cents = simsearch.kmeans_centroids(emb)
    local_cents = spark.createDataFrame(cents.collect(), cents.schema)
    out = pq.ivfpq_topk(emb, cents=local_cents, books=books).toPandas()
    full = pq.pq_adc_topk(emb, k=10**6, books=books).toPandas()
    fmap = {(r.qid, r.nid): r.adc_d for r in full.itertuples()}
    assert len(out) > 0
    for r in out.itertuples():
        assert fmap[(r.qid, r.nid)] == r.adc_d
    # each query found candidates in its probed cells, and fewer than the
    # full corpus (the probe restriction actually prunes)
    n = emb.count()
    per_q = out.groupby("qid").size()
    assert (per_q >= 1).all()
    assert len(set(map(tuple, out[["qid", "nid"]].values))) < n * len(per_q)


def test_ivfpq_self_in_candidates(emb, books, spark):
    """A query's own cell is its nearest probe, so the query itself is
    always scored (and in this corpus ranks first)."""
    from hebrew_ner_spark.operators import simsearch

    cents = simsearch.kmeans_centroids(emb)
    local_cents = spark.createDataFrame(cents.collect(), cents.schema)
    out = pq.ivfpq_topk(emb, cents=local_cents, books=books).toPandas()
    r1 = out[out["rank"] == 1]
    assert (r1.qid == r1.nid).all()

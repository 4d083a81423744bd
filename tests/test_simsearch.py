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


def test_near_dups_plan_is_distributed(emb, spark):
    """The near-dup scorer must be a grouped-map over bucket — building
    the plan runs NO Spark job (the old version collect()ed the corpus to
    the driver at plan-build time) and the physical plan is
    scan -> exchange on bucket -> FlatMapGroupsInPandas, no Collect."""
    tracker = spark.sparkContext.statusTracker()
    jobs_before = len(tracker.getJobIdsForGroup() or [])
    df = simsearch.embedding_near_dups(emb)
    jobs_after = len(tracker.getJobIdsForGroup() or [])
    assert jobs_after == jobs_before, "plan construction triggered a Spark job"
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
    assert "CollectLimit" not in plan


def test_near_dups_symmetric_with_brute_scores(emb):
    """Every emitted pair must be ordered, unique, and >= threshold."""
    out = simsearch.embedding_near_dups(emb).toPandas()
    assert (out.vec_a < out.vec_b).all()
    assert out.duplicated(["vec_a", "vec_b"]).sum() == 0
    assert (out.cos_1e6 >= 350000).all()


def test_near_dups_bucket_cap_drops_and_surfaces(emb):
    """With the cap forced below a planted cluster size, the cluster's
    pairs vanish from the pairwise output and its bucket appears in the
    overflow report instead — the drop is never silent."""
    copies = (
        emb.where(F.col("vec_id") == 0)
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(59))).alias("r"), "embedding"
        )
        .select((F.lit(1000000) + F.col("r")).alias("vec_id"), "embedding")
    )
    planted = emb.select("vec_id", "embedding").unionByName(copies)

    capped = simsearch.embedding_near_dups(planted, max_bucket=50).toPandas()
    assert not (capped.vec_a >= 1000000).any()  # cluster pairs dropped

    overflow = simsearch.near_dup_overflow(planted, max_bucket=50).toPandas()
    assert len(overflow) >= 1
    assert (overflow.n_vecs > 50).all()

    uncapped = simsearch.embedding_near_dups(planted).toPandas()
    planted_pairs = uncapped[(uncapped.vec_a >= 1000000) & (uncapped.vec_b >= 1000000)]
    assert len(planted_pairs) == 60 * 59 // 2  # all copy pairs, cos = 1e6
    assert (planted_pairs.cos_1e6 == 1000000).all()


# --- seeded k-means IVF ----------------------------------------------------


def _quant_and_sizes(emb, cents):
    """(mean cosine to assigned centroid, stddev of cell sizes)."""
    assigned = simsearch.ivf_assign(emb, cents=cents)
    mv = simsearch._micro_vecs(emb)
    j = mv.join(assigned, "vec_id").join(cents, "cell")
    mean_cos = (
        j.select(
            (
                F.expr(
                    "CAST(aggregate(zip_with(mv, cent, (x,y)->x*y), 0L, (a,v)->a+v) AS DOUBLE)"
                )
                / (
                    F.expr("sqrt(aggregate(transform(mv, x->x*x), 0L, (a,v)->a+v))")
                    * F.col("cnorm")
                )
            ).alias("c")
        )
        .agg(F.avg("c"))
        .collect()[0][0]
    )
    sd = assigned.groupBy("cell").count().agg(F.stddev("count")).collect()[0][0]
    return mean_cos, sd


def test_kmeans_monotone_quantization_and_balance(emb):
    """Lloyd's guarantee, observed: each iteration tightens the mean
    vector-to-centroid cosine (the spherical k-means objective) and the
    trained cells are more size-balanced than the random-subset seeds
    (cell skew == probe-cost skew at scale). Measured at sf0.001:
    0.245 (seed) -> 0.311 (1 iter) -> 0.324 (2 iters); size sd 6.3 -> 4.6.
    NOTE a measured negative result: recall@2-probes does NOT reliably
    improve on this corpus — the synthetic embeddings are near-uniform, so
    there is no cluster structure to learn and tighter cells just shrink
    the candidate set. Training buys quantization and balance, not recall,
    on structureless data; the gates pin its exactness either way."""
    q_seed, sd_seed = _quant_and_sizes(emb, simsearch.seed_centroids(emb).cache())
    q_km1, _ = _quant_and_sizes(emb, simsearch.kmeans_centroids(emb, iters=1).cache())
    q_km2, sd_km2 = _quant_and_sizes(emb, simsearch.kmeans_centroids(emb).cache())
    assert q_km1 > q_seed + 0.03
    assert q_km2 > q_km1
    assert sd_km2 < sd_seed


def test_kmeans_centroids_deterministic(emb):
    a = simsearch.kmeans_centroids(emb).orderBy("cell").collect()
    b = simsearch.kmeans_centroids(emb).orderBy("cell").collect()
    assert [(r.cell, r.cent) for r in a] == [(r.cell, r.cent) for r in b]
    # components stay at micro scale (mean of micro values) -> no int64
    # overflow risk in the assignment dot at any corpus size
    assert all(abs(v) < 2_000_000 for r in a for v in r.cent)


def test_ivf_topk_hits_carry_brute_scores(emb):
    """Trained-IVF hits must score identically to brute force (the IVF
    path changes candidate generation, never the metric)."""
    brute = simsearch.brute_topk(emb, n_queries=8, k=1000).toPandas()
    ivf = simsearch.ivf_topk(emb, n_queries=8, k=1000).toPandas()
    bscore = {(r.qid, r.nid): r.cos_1e6 for r in brute.itertuples()}
    for r in ivf.itertuples():
        assert bscore[(r.qid, r.nid)] == r.cos_1e6


class TestTransETopK:
    def test_matches_independent_python_replay(self, spark):
        import itertools

        from hebrew_ner_spark.operators import simsearch as ss

        # 4 entities, deterministic float embeddings; edges over 2 preds
        vecs = {
            e: [((e * 64 + j) % 7 - 3) / 10.0 for j in range(64)]
            for e in range(4)
        }
        emb = spark.createDataFrame(
            [(e, v, 0) for e, v in vecs.items()],
            "vec_id long, embedding array<float>, label int",
        )
        edge_rows = [(0, "join", 1, 2), (1, "join", 2, 1), (2, "merge", 3, 1),
                     (3, "merge", 0, 1)]
        edges = spark.createDataFrame(
            edge_rows, "subj_id long, pred string, obj_id long, n_evidence long"
        )
        got = {
            (r.subj_id, r.pred, r.rk): (r.tail_id, r.energy)
            for r in ss.transe_topk(edges, emb, k=2).collect()
        }

        # pure-Python replay: float32 rounding first (parquet-less fixture
        # still goes through array<float>), then micro quantization
        import numpy as np

        rv = ss.transe_relation_vectors()
        micro = {
            e: [int(np.floor(float(np.float32(x)) * 1e6 + 0.5)) for x in v]
            for e, v in vecs.items()
        }
        heads = {(s, p) for s, p, _, _ in edge_rows}
        nodes = sorted({s for s, *_ in edge_rows} | {o for _, _, o, _ in edge_rows})
        want = {}
        for s, p in heads:
            scored = sorted(
                (
                    (sum(abs(micro[s][j] + rv[p][j] - micro[t][j]) for j in range(64)), t)
                    for t in nodes if t != s
                ),
            )
            for rk, (en, t) in enumerate(scored[:2], 1):
                want[(s, p, rk)] = (t, en)
        assert got == want

    def test_ranks_filtered_protocol(self, spark):
        from hebrew_ner_spark.operators import simsearch as ss

        # Zero embeddings for all entities: every candidate tail has the
        # SAME energy |r|_1 per (head, pred), so ranks are decided purely
        # by (tail ASC) and positive filtering — closed form.
        emb = spark.createDataFrame(
            [(e, [0.0] * 64, 0) for e in range(4)],
            "vec_id long, embedding array<float>, label int",
        )
        # head 0 asserts join->1, join->2, join->3: candidate order is
        # 1,2,3 (all ties); the filtered protocol skips positives above:
        # every true tail gets rank 1.
        edges = spark.createDataFrame(
            [(0, "join", t, 1) for t in (1, 2, 3)],
            "subj_id long, pred string, obj_id long, n_evidence long",
        )
        got = {(r.subj_id, r.pred, r.tail_id): r.rank
               for r in ss.transe_ranks(edges, emb).collect()}
        assert got == {(0, "join", 1): 1, (0, "join", 2): 1, (0, "join", 3): 1}

        # Only tail 3 true: tails 1 and 2 (negatives) outrank it on id ->
        # filtered rank 3.
        edges2 = spark.createDataFrame(
            [(0, "join", 3, 1)],
            "subj_id long, pred string, obj_id long, n_evidence long",
        )
        # nodes set = {0, 3} only (from edges) -> tail 3 is rank 1 there;
        # widen the node set via extra merge edges among 1 and 2
        edges2 = edges2.unionByName(spark.createDataFrame(
            [(1, "merge", 2, 1)],
            "subj_id long, pred string, obj_id long, n_evidence long",
        ))
        got2 = {(r.subj_id, r.pred, r.tail_id): r.rank
                for r in ss.transe_ranks(edges2, emb).collect()}
        assert got2[(0, "join", 3)] == 3
        assert got2[(1, "merge", 2)] == 2  # negative tail 0 outranks id-wise


def test_semdedup_drops_exactly_the_planted_twins(spark):
    """Keep-lowest SemDeDup over planted exact copies: every twin
    drops, every original survives, and the cell-local brute-force
    replay agrees row for row."""
    import math

    from hebrew_ner_spark.operators import simsearch
    from hebrew_ner_spark.querydefs.simsearch_q import _sem_planted

    planted = _sem_planted(spark, "/root/testdata/sf0.001")
    cents = simsearch.kmeans_centroids(planted)
    rows = simsearch.semantic_dedup(planted, cents=cents).collect()
    by_id = {r.vec_id: r for r in rows}
    twins = [i for i in by_id if i >= 1000000]
    assert twins and all(by_id[i].keep == 0 for i in twins)
    assert all(by_id[i - 1000000].keep == 1 for i in twins)
    # brute-force replay of the rule inside each cell
    emb = {r.vec_id: r.embedding for r in planted.collect()}
    cell = {r.vec_id: r.cell for r in rows}
    def cos(u, v):
        d = sum(float(a) * float(b) for a, b in zip(u, v))
        nu = math.sqrt(sum(float(a) ** 2 for a in u))
        nv = math.sqrt(sum(float(b) ** 2 for b in v))
        return int(math.floor(d / (nu * nv) * 1e6 + 0.5))
    for r in rows:
        dropped = any(
            a < r.vec_id
            and cell[a] == r.cell
            and cos(emb[a], emb[r.vec_id]) >= simsearch.SEMDEDUP_TAU_1E6
            for a in cell
        )
        assert r.keep == (0 if dropped else 1), r


def test_dbscan_python_replay_and_invariants(spark):
    """Brute-force DBSCAN replay over the SAME approximate neighbor
    graph + the DBSCAN invariants (core connectivity, border adjacency,
    noise isolation from cores)."""
    from hebrew_ner_spark.operators import simsearch

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pairs = [
        (r.vec_a, r.vec_b)
        for r in simsearch.embedding_near_dups(
            emb, threshold=simsearch.DBSCAN_EPS_1E6 / 1_000_000
        ).collect()
    ]
    nbrs = {}
    for a, b in pairs:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    allv = [r.vec_id for r in emb.select("vec_id").collect()]
    core = {v for v in allv if 1 + len(nbrs.get(v, ())) >= simsearch.DBSCAN_MIN_PTS}
    # min-id components over core-core edges
    cluster = {}
    for c in core:
        stack, seen = [c], {c}
        while stack:
            x = stack.pop()
            for y in nbrs.get(x, ()):
                if y in core and y not in seen:
                    seen.add(y)
                    stack.append(y)
        cluster[c] = min(seen)
    rows = {r.vec_id: r for r in simsearch.dbscan_approx(emb).collect()}
    assert set(rows) == set(allv)
    for v in allv:
        r = rows[v]
        if v in core:
            assert r.role == "core" and r.cluster == cluster[v], v
        elif any(u in core for u in nbrs.get(v, ())):
            want = min(cluster[u] for u in nbrs[v] if u in core)
            assert r.role == "border" and r.cluster == want, v
        else:
            assert r.role == "noise" and r.cluster == -1, v
    assert any(r.role == "core" for r in rows.values())
    assert any(r.role == "noise" for r in rows.values())

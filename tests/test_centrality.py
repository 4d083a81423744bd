"""Centrality: pure-Python parity (NetworkX-free) for truncated Katz
and exact betweenness on the gated host graph, plus budget discipline."""

from collections import deque
from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from hebrew_ner_spark.operators import centrality, weblinks

SF = "/root/testdata/sf0.001"


def _adj(pairs):
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return adj


def _py_katz(pairs, iters, den):
    adj = _adj(pairs)
    x = {v: 1 for v in adj}
    acc = {v: 0 for v in adj}
    for _ in range(iters):
        x = {v: sum(x[u] for u in adj[v]) for v in adj}
        acc = {v: acc[v] * den + x[v] for v in adj}
    return acc


def _py_betweenness_scaled(pairs, scale):
    """Exact micro-unit betweenness replaying the operator's floored
    per-triple contribution (matches the repo's truncating-division
    contract, not float Brandes)."""
    adj = _adj(pairs)
    dist, sigma = {}, {}
    for s in adj:
        d = {s: 0}
        sg = {s: 1}
        q = deque([s])
        while q:
            u = q.popleft()
            for w in adj[u]:
                if w not in d:
                    d[w] = d[u] + 1
                    sg[w] = 0
                    q.append(w)
                if d[w] == d[u] + 1:
                    sg[w] += sg[u]
        dist[s], sigma[s] = d, sg
    out = {v: 0 for v in adj}
    vs = sorted(adj)
    for i, s in enumerate(vs):
        for t in vs[i + 1 :]:
            if t not in dist[s]:
                continue
            for m in adj:
                if m in (s, t) or m not in dist[s] or t not in dist[m]:
                    continue
                if dist[s][m] + dist[m][t] == dist[s][t]:
                    out[m] += (sigma[s][m] * sigma[m][t] * scale) // sigma[s][t]
    return out


@pytest.fixture(scope="module")
def host_edges(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    und = weblinks.synth_farm_host_edges(docs)
    return und, [(r.a, r.b) for r in und.collect()]


def test_katz_parity(spark, host_edges):
    und, pairs = host_edges
    want = _py_katz(pairs, centrality.KATZ_ITERS, centrality.KATZ_ALPHA_DEN)
    got = {r.vertex: r.katz_scaled for r in centrality.katz_scaled(und).collect()}
    assert got == want
    # the farm clique must dominate the attenuated-walk ranking
    top8 = sorted(got, key=got.get, reverse=True)[:8]
    assert all(v >= weblinks.FARM_LO for v in top8)


def test_betweenness_parity(spark, host_edges):
    und, pairs = host_edges
    want = _py_betweenness_scaled(pairs, centrality.BC_SCALE)
    got = {
        r.vertex: r.bc_scaled
        for r in centrality.betweenness_scaled(und).collect()
    }
    assert got == want
    assert any(v > 0 for v in got.values())


def test_bfs_budget_raises(spark):
    # a 6-vertex path has diameter 5 > a budget of 3 levels
    und = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], ["a", "b"]
    )
    with pytest.raises(RuntimeError, match="frontier still has"):
        centrality.bfs_sigma(und, max_levels=3)


def test_sampled_sources_subset(spark, host_edges):
    """Pivot sampling (the scale path) must agree with the exact BFS
    restricted to the same sources."""
    und, pairs = host_edges
    srcs = spark.createDataFrame([(0,), (7,), (59,)], ["v"])
    vis = centrality.bfs_sigma(und, sources=srcs)
    assert {r.s for r in vis.select("s").distinct().collect()} == {0, 7, 59}
    full = centrality.bfs_sigma(und)
    sub = {
        (r.s, r.v): (r.dist, r.sigma)
        for r in full.where(F.col("s").isin(0, 7, 59)).collect()
    }
    got = {(r.s, r.v): (r.dist, r.sigma) for r in vis.collect()}
    assert got == sub


def test_harmonic_exact_parity(spark, host_edges):
    from collections import deque

    und, pairs = host_edges
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    got = {
        r.vertex: r.harmonic_scaled
        for r in centrality.harmonic_exact(und).collect()
    }
    for s in adj:
        d = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            for w in adj[u]:
                if w not in d:
                    d[w] = d[u] + 1
                    q.append(w)
        want = sum(
            centrality.BC_SCALE // dv for v, dv in d.items() if v != s
        )
        assert got[s] == want


def test_betweenness_sampled_brandes_parity(spark):
    """Python replay of pivot-restricted Brandes (BFS + backward
    dependency in the same micro-unit truncating arithmetic) and
    estimator sanity vs the exact operator."""
    from collections import deque

    from hebrew_ner_spark.operators import centrality, weblinks

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    und = weblinks.synth_farm_host_edges(docs)
    pairs = [(r.a, r.b) for r in und.collect()]
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    verts = sorted(adj)
    pivots = [v for v in verts if v % centrality.BC_SAMPLE_MOD == centrality.BC_SAMPLE_REM]
    dep = {v: 0 for v in verts}
    for s in pivots:
        dist = {s: 0}
        sigma = {s: 1}
        order = []
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] = sigma.get(w, 0) + sigma[v]
        delta = {v: 0 for v in dist}
        for d in range(max(dist.values()) - 1, 0, -1):
            for v in [x for x in dist if dist[x] == d]:
                delta[v] = sum(
                    sigma[v] * (centrality.BC_SCALE + delta[w]) // sigma[w]
                    for w in adj[v]
                    if dist.get(w) == d + 1
                )
        for v in dist:
            if dist[v] > 0:
                dep[v] += delta[v]
    rows = {r.vertex: r for r in centrality.betweenness_sampled(und).collect()}
    n, ns = len(verts), len(pivots)
    for v in verts:
        assert rows[v].dep_scaled == dep[v], v
        assert rows[v].est_scaled == dep[v] * n // ns
    # estimator sanity: the exact top vertex ranks in the sampled top 5
    exact = {r.vertex: r.bc_scaled for r in centrality.betweenness_scaled(und).collect()}
    top_exact = max(exact, key=exact.get)
    top5_est = sorted(rows, key=lambda v: -rows[v].est_scaled)[:5]
    assert top_exact in top5_est

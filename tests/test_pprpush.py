"""Push PPR: python round-sim parity, exact mass conservation, ACL
residual certificate, locality (untouched fringe), budget raise."""

import pytest

from hebrew_ner_spark.operators import pprpush, weblinks

SF = "/root/testdata/sf0.001"


def _py_push(pairs, seed, eps, max_rounds=1000):
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    deg = {v: len(adj[v]) for v in adj}
    pi = {v: 0 for v in adj}
    r = {v: 0 for v in adj}
    r[seed] = pprpush.PPR_SCALE
    for _ in range(max_rounds):
        push = [v for v in adj if r[v] > eps * deg[v]]
        if not push:
            return pi, r
        inc = {v: 0 for v in adj}
        for v in push:
            rv = r[v]
            gain = rv // 4
            rem = rv - gain
            stay = rem // 2
            share = (rem - stay) // deg[v]
            pi[v] += gain
            for u in adj[v]:
                inc[u] += share
            r[v] = stay + (rem - stay - share * deg[v])
        for v in adj:
            r[v] += inc[v]
    raise AssertionError("python sim did not converge")


def test_parity_and_certificate(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    und = weblinks.synth_farm_host_edges(docs)
    pairs = [(r.a, r.b) for r in und.collect()]
    want_pi, want_r = _py_push(pairs, 0, pprpush.PPR_EPS)
    rows = {r.vertex: r for r in pprpush.ppr_push(und, seed=0).collect()}
    assert {v: r.ppr_scaled for v, r in rows.items()} == want_pi
    assert {v: r.residual for v, r in rows.items()} == want_r
    # exact mass conservation: every unit of SCALE is in pi or r
    total = sum(r.ppr_scaled + r.residual for r in rows.values())
    assert total == pprpush.PPR_SCALE
    # the ACL certificate: every residual below eps * deg
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    assert all(
        rows[v].residual <= pprpush.PPR_EPS * len(adj[v]) for v in adj
    )
    # the seed holds the most settled mass
    assert max(rows, key=lambda v: rows[v].ppr_scaled) == 0


def test_locality_on_disconnected_component(spark):
    # two disjoint triangles; seed in one -> the other never touched
    und = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12)],
        ["a", "b"],
    )
    # a 3-vertex component recirculates mass harder than the 64-host
    # gate graph (fewer sinks per push), so give it a deeper budget —
    # the default is sized to the gate graph and the raise is loud
    rows = {
        r.vertex: r
        for r in pprpush.ppr_push(und, seed=0, rounds=40).collect()
    }
    assert all(
        rows[v].ppr_scaled == 0 and rows[v].residual == 0
        for v in (10, 11, 12)
    )
    assert sum(r.ppr_scaled + r.residual for r in rows.values()) == (
        pprpush.PPR_SCALE
    )


def test_budget_raise(spark):
    und = spark.createDataFrame([(i, i + 1) for i in range(6)], ["a", "b"])
    with pytest.raises(RuntimeError, match="residuals above"):
        pprpush.ppr_push(und, seed=0, rounds=1)


def test_sweep_cut_brute_force_conductance(spark):
    """Per-prefix cut/vol/phi replayed brute force from the pushed
    vector + the ACL ordering; is_best marks the true minimum."""
    from hebrew_ner_spark.operators import pprpush, weblinks

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    und = weblinks.synth_farm_host_edges(docs)
    edges = {(r.a, r.b) for r in und.collect()}
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    m2 = sum(deg.values())
    pushed = {
        r.vertex: r.ppr_scaled for r in pprpush.ppr_push(und, seed=0).collect()
    }
    order = sorted(
        (v for v, pi in pushed.items() if pi > 0),
        key=lambda v: (-(pushed[v] * pprpush.SWEEP_SCALE // deg[v]), v),
    )
    rows = {r.rk: r for r in pprpush.ppr_sweep_cut(und, seed=0).collect()}
    inside = set()
    want_phis = {}
    for k, v in enumerate(order, 1):
        inside.add(v)
        vol = sum(deg[x] for x in inside)
        cut = sum(
            1 for a, b in edges if (a in inside) != (b in inside)
        )
        den = min(vol, m2 - vol)
        if den <= 0:
            assert k not in rows
            continue
        r = rows[k]
        assert (r.v, r.cut, r.vol) == (v, cut, vol), k
        want_phis[k] = cut * pprpush.SWEEP_SCALE // den
        assert r.phi_1e6 == want_phis[k]
    best_k = min(want_phis, key=lambda k: (want_phis[k], k))
    assert rows[best_k].is_best == 1
    assert sum(r.is_best for r in rows.values()) == 1

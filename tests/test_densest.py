"""Densest-subgraph peeling: python schedule parity on the corpus
graph + the planted-farm recovery contract + the exhaustion guard."""

import pytest

from hebrew_ner_spark.operators import densest, weblinks


def _py_peel(edges, eps_num=densest.DS_EPS_NUM, eps_den=densest.DS_EPS_DEN):
    """Replay the exact batch-peel schedule in plain python."""
    edges = set(edges)
    nodes = {v for e in edges for v in e}
    sched, tagged = [], []
    t = 0
    while nodes:
        cur = {(a, b) for a, b in edges if a in nodes and b in nodes}
        nv, ne = len(nodes), len(cur)
        sched.append((t, nv, ne, ne * densest.DS_SCALE // nv))
        tagged.append((t, frozenset(nodes)))
        deg = {v: 0 for v in nodes}
        for a, b in cur:
            deg[a] += 1
            deg[b] += 1
        nodes = {v for v in nodes if deg[v] * nv * eps_den > 2 * eps_num * ne}
        t += 1
    return sched, tagged


def _corpus_edges(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    und = weblinks.synth_farm_host_edges(docs)
    return [(r.a, r.b) for r in und.collect()], und


def test_schedule_parity(spark):
    pairs, und = _corpus_edges(spark)
    want, _ = _py_peel(pairs)
    got = sorted(
        (r["round"], r.nv, r.ne, r.dens_1e6)
        for r in densest.densest_peel(und).collect()
    )
    assert got == sorted(want)


def test_core_is_farm_clique(spark):
    pairs, und = _corpus_edges(spark)
    want_sched, want_tagged = _py_peel(pairs)
    best_round = max(want_sched, key=lambda r: (r[3], -r[0]))[0]
    want_core = dict(want_tagged)[best_round]
    rows = densest.densest_core(und).collect()
    assert {r.v for r in rows} == set(want_core)
    assert all(r["round"] == best_round for r in rows)
    # the planted farm is the densest structure by construction
    farm = set(range(weblinks.FARM_LO, weblinks.FARM_HOSTS))
    assert farm <= {r.v for r in rows}


def test_budget_exhaustion_raises(spark):
    _, und = _corpus_edges(spark)
    with pytest.raises(RuntimeError, match="not empty"):
        densest.densest_peel(und, rounds=1)

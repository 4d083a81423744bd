"""Symmetry breaking: pure-Python round simulation parity, MIS
independence + maximality, proper-coloring invariant, budget raise."""

import pytest

from hebrew_ner_spark.operators import symbreak, weblinks

SF = "/root/testdata/sf0.001"


def _prio(v):
    return (v * symbreak.PRIO_MUL + symbreak.PRIO_ADD) % symbreak.PRIO_MOD


def _adj(pairs):
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return adj


def _py_mis(pairs):
    adj = _adj(pairs)
    active, mis = set(adj), set()
    while active:
        enter = {
            v for v in active if all(_prio(v) < _prio(u) for u in adj[v] & active)
        }
        mis |= enter
        active -= enter | {u for v in enter for u in adj[v]}
    return mis


def _py_jp(pairs):
    adj = _adj(pairs)
    color, uncolored = {}, set(adj)
    while uncolored:
        ready = {
            v
            for v in uncolored
            if all(_prio(v) < _prio(u) for u in adj[v] & uncolored)
        }
        for v in ready:
            used = {color[u] for u in adj[v] if u in color}
            c = 0
            while c in used:
                c += 1
            color[v] = c
        uncolored -= ready
    return color


@pytest.fixture(scope="module")
def host_edges(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    und = weblinks.synth_farm_host_edges(docs)
    return und, [(r.a, r.b) for r in und.collect()]


def test_mis_parity_and_invariants(spark, host_edges):
    und, pairs = host_edges
    adj = _adj(pairs)
    want = _py_mis(pairs)
    got = {r.vertex: r.in_mis for r in symbreak.luby_mis(und).collect()}
    assert {v for v, f in got.items() if f} == want
    mis = want
    # independence: no edge inside the set; maximality: everyone else
    # has a neighbor inside
    assert all(not (a in mis and b in mis) for a, b in pairs)
    assert all(v in mis or (adj[v] & mis) for v in adj)


def test_jp_parity_and_proper(spark, host_edges):
    und, pairs = host_edges
    want = _py_jp(pairs)
    got = {r.vertex: r.color for r in symbreak.jp_coloring(und).collect()}
    assert got == want
    assert all(got[a] != got[b] for a, b in pairs)
    # the farm clique pins the chromatic lower bound
    n_farm = 64 - weblinks.FARM_LO
    assert len(set(got.values())) >= n_farm


def test_round_budget_raises(spark):
    # a priority-decreasing path forces one round per vertex:
    # choose vertices with strictly decreasing priority along a path
    vs = sorted(range(40), key=_prio, reverse=True)[:6]
    und = spark.createDataFrame(
        [(vs[i], vs[i + 1]) for i in range(5)], ["a", "b"]
    )
    with pytest.raises(RuntimeError, match="still active"):
        symbreak.luby_mis(und, max_rounds=2)
    with pytest.raises(RuntimeError, match="uncolored"):
        symbreak.jp_coloring(und, max_rounds=2)


def test_jp_palette_exhaustion_raises(spark):
    """ADVICE r4: a neighborhood that uses every color in
    [0, max_color] must raise loudly, never emit a NULL color. A
    triangle with max_color = 1 colors two vertices 0 and 1; the third
    sees both and exhausts the two-color palette."""
    und = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], ["a", "b"])
    with pytest.raises(RuntimeError, match="palette"):
        symbreak.jp_coloring(und, max_color=1)

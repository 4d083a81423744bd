"""Synchronous Louvain phase-1: python replay of the exact parity
schedule, farm coalescence, positive modularity, and fixpoint
stability."""

from fractions import Fraction

from hebrew_ner_spark.operators import louvain, weblinks


def _py_louvain(edges, rounds):
    sym = {}
    for a, b in edges:
        sym.setdefault(a, []).append(b)
        sym.setdefault(b, []).append(a)
    k = {v: len(ns) for v, ns in sym.items()}
    m2 = sum(k.values())
    comm = {v: v for v in sym}
    for t in range(rounds):
        stot = {}
        for v in sym:
            stot[comm[v]] = stot.get(comm[v], 0) + k[v]
        kic = {}
        for v, ns in sym.items():
            for u in ns:
                kic[(v, comm[u])] = kic.get((v, comm[u]), 0) + 1
        new = {}
        for v in sym:
            cands = {c for (x, c) in kic if x == v} | {comm[v]}
            best = None
            for c in sorted(cands):
                w = kic.get((v, c), 0)
                if c == comm[v]:
                    val = m2 * w - k[v] * (stot[c] - k[v])
                else:
                    val = m2 * w - k[v] * stot[c]
                key = (val, 1 if c == comm[v] else 0, -c)
                if best is None or key > best[0]:
                    best = (key, c)
            new[v] = best[1]
        comm = {
            v: (new[v] if v % 2 == t % 2 else comm[v]) for v in sym
        }
    return comm


def _graph(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    und = weblinks.synth_farm_host_edges(docs)
    return [(r.a, r.b) for r in und.collect()], und


def test_schedule_parity(spark):
    pairs, und = _graph(spark)
    want = _py_louvain(pairs, louvain.LV_ROUNDS)
    got = {r.v: r.comm for r in louvain.louvain_phase1(und).collect()}
    assert got == want


def test_farm_coalesces_and_q_positive(spark):
    pairs, und = _graph(spark)
    got = {r.v: r.comm for r in louvain.louvain_phase1(und).collect()}
    farm = set(range(weblinks.FARM_LO, weblinks.FARM_HOSTS))
    assert len({got[v] for v in farm}) == 1
    rows = louvain.louvain_modularity(und).collect()
    q_den = rows[0].q_den
    q = Fraction(sum(r.q_num for r in rows), q_den)
    assert q > 0
    # pieces are self-consistent: sum of s_tot = 2W (unit weights)
    assert sum(r.s_tot for r in rows) == 2 * len(pairs)


def test_budget_reaches_fixpoint(spark):
    """Two extra parity rounds change nothing: phase-1 terminated
    (no strictly-improving move survives the stay-wins-ties order)."""
    pairs, _ = _graph(spark)
    a = _py_louvain(pairs, louvain.LV_ROUNDS)
    b = _py_louvain(pairs, louvain.LV_ROUNDS + 2)
    assert a == b

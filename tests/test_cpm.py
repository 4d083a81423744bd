"""CPM scheduling: pure-Python fixpoint parity, invariants, budget."""

import pytest

from hebrew_ner_spark.operators import cpm, weblinks

SF = "/root/testdata/sf0.001"


def _py_cpm(pairs):
    verts = sorted({v for e in pairs for v in e})
    dur = {v: (v * cpm.DUR_MUL + cpm.DUR_ADD) % cpm.DUR_MOD + cpm.DUR_MIN for v in verts}
    preds = {v: [] for v in verts}
    succs = {v: [] for v in verts}
    for a, b in pairs:
        preds[b].append(a)
        succs[a].append(b)
    asap = {v: 0 for v in verts}
    while True:
        new = {
            v: max([0] + [asap[u] + dur[u] for u in preds[v]]) for v in verts
        }
        if new == asap:
            break
        asap = new
    mk = max(asap[v] + dur[v] for v in verts)
    ls = {v: mk - dur[v] for v in verts}
    while True:
        new = {
            v: min([mk - dur[v]] + [ls[s] - dur[v] for s in succs[v]])
            for v in verts
        }
        if new == ls:
            break
        ls = new
    return dur, asap, ls, mk


def test_cpm_parity_and_invariants(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    und = weblinks.synth_farm_host_edges(docs)
    pairs = [(r.a, r.b) for r in und.collect()]
    dur, asap, ls, mk = _py_cpm(pairs)
    rows = {r.vertex: r for r in cpm.cpm_schedule(und).collect()}
    assert {v: r.asap for v, r in rows.items()} == asap
    assert {v: r.ls for v, r in rows.items()} == ls
    # invariants: slack >= 0, a nonempty critical chain realizes the
    # makespan, and every edge respects precedence in the ASAP schedule
    assert all(r.slack >= 0 for r in rows.values())
    crit = [v for v, r in rows.items() if r.critical]
    assert crit and max(rows[v].asap + rows[v].dur for v in crit) == mk
    assert all(rows[a].asap + rows[a].dur <= rows[b].asap for a, b in pairs)


def test_cpm_budget_raises(spark):
    # a 6-chain needs 5 relaxation rounds; budget 3 must raise
    und = spark.createDataFrame([(i, i + 1) for i in range(5)], ["a", "b"])
    with pytest.raises(RuntimeError, match="ASAP still moving"):
        cpm.cpm_schedule(und, rounds=3)

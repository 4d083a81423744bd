"""Bipartite trawling core: python peel parity, farm recovery,
asymmetric-threshold behavior, budget raise."""

import pytest
from pyspark.sql import functions as F

from hebrew_ner_spark.operators import bipcore, weblinks

SF = "/root/testdata/sf0.001"


def _py_core(dedges, i, j):
    hubs = {v for e in dedges for v in e}
    auths = set(hubs)
    while True:
        nh = {
            h
            for h in hubs
            if sum(1 for x, y in dedges if x == h and y in auths) >= j
        }
        na = {
            a
            for a in auths
            if sum(1 for x, y in dedges if y == a and x in nh) >= i
        }
        if nh == hubs and na == auths:
            return hubs, auths
        hubs, auths = nh, na


def test_farm_recovery_and_parity(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    und = weblinks.synth_farm_host_edges(docs)
    e = bipcore.directed_host_edges(und)
    dedges = {(r.src, r.dst) for r in e.collect()}
    want_h, want_a = _py_core(dedges, bipcore.BIP_I, bipcore.BIP_J)
    rows = {r.vertex: r for r in bipcore.bipartite_core(e).collect()}
    assert {v for v, r in rows.items() if r.as_hub} == want_h
    assert {v for v, r in rows.items() if r.as_auth} == want_a
    # exactly the planted farm on both sides
    farm = set(range(weblinks.FARM_LO, weblinks.FARM_HOSTS))
    assert want_h == farm and want_a == farm


def test_asymmetric_roles(spark):
    # hubs 0..3 each cite auths 10, 11; with (i=4, j=2) the hubs keep
    # their role but have NO in-links, so their authority copies die
    e = spark.createDataFrame(
        [(h, a) for h in range(4) for a in (10, 11)], ["src", "dst"]
    )
    rows = {
        r.vertex: r for r in bipcore.bipartite_core(e, i=4, j=2).collect()
    }
    assert all(rows[h].as_hub == 1 and rows[h].as_auth == 0 for h in range(4))
    assert all(rows[a].as_auth == 1 and rows[a].as_hub == 0 for a in (10, 11))


def test_budget_raise(spark):
    # a long directed chain peels one vertex per round from each end;
    # with thresholds (1, 1) every vertex survives (fixpoint round 1),
    # so use (2, 2) on a chain: hubs have out-degree 1 -> all die in
    # round 1, auths then die -> converges fast. Instead force slow
    # peel: a "staircase" where hub k cites auths k..k+1 of a chain —
    # simplest budget probe: max_rounds=0 must raise on any input
    e = spark.createDataFrame([(0, 1), (1, 2)], ["src", "dst"])
    with pytest.raises(RuntimeError, match="no fixpoint"):
        bipcore.bipartite_core(e, max_rounds=0)

"""Temporal reachability: python relaxation parity, the
static-vs-temporal gap, hand-built journey fixtures, budget raise."""

import pytest

from hebrew_ner_spark.operators import temporal, weblinks

SF = "/root/testdata/sf0.001"


def _py_ea(dedges, seed):
    ea = {v: temporal.EA_INF for e in dedges for v in e[:2]}
    ea[seed] = 0
    while True:
        changed = False
        new = dict(ea)
        for s, d, t in dedges:
            if ea[s] <= t and t < new[d]:
                new[d] = t
                changed = True
        if not changed:
            return ea
        ea = new


def test_parity_and_temporal_gap(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    und = weblinks.synth_farm_host_edges(docs)
    te = temporal.temporal_host_edges(und)
    dedges = [(r.src, r.dst, r.t) for r in te.collect()]
    want = _py_ea(dedges, 0)
    seeds = spark.createDataFrame([(0,)], ["v"])
    rows = {r.vertex: r for r in temporal.earliest_arrival(te, seeds).collect()}
    assert {v: r.earliest_arrival for v, r in rows.items()} == want
    # everything is statically reachable; most journeys are time-blocked
    assert all(r.static_reachable == 1 for r in rows.values())
    n_t = sum(r.temporal_reachable for r in rows.values())
    assert 1 < n_t < len(rows) // 2


def test_journey_semantics_fixture(spark):
    # 0 -(t=5)-> 1 -(t=3)-> 2 : 2 is statically reachable but the
    # journey 0->1->2 needs t2 >= 5, so 2 is temporally BLOCKED;
    # 0 -(t=1)-> 3 -(t=9)-> 2 arrives at 9 when added
    e1 = spark.createDataFrame(
        [(0, 1, 5), (1, 2, 3)], ["src", "dst", "t"]
    )
    seeds = spark.createDataFrame([(0,)], ["v"])
    r1 = {r.vertex: r for r in temporal.earliest_arrival(e1, seeds).collect()}
    assert r1[1].earliest_arrival == 5
    assert r1[2].temporal_reachable == 0 and r1[2].static_reachable == 1
    e2 = spark.createDataFrame(
        [(0, 1, 5), (1, 2, 3), (0, 3, 1), (3, 2, 9)],
        ["src", "dst", "t"],
    )
    r2 = {r.vertex: r for r in temporal.earliest_arrival(e2, seeds).collect()}
    assert r2[2].earliest_arrival == 9 and r2[2].temporal_reachable == 1


def test_budget_raise(spark):
    # a strictly time-increasing chain relaxes one hop per round
    e = spark.createDataFrame(
        [(i, i + 1, i) for i in range(6)], ["src", "dst", "t"]
    )
    seeds = spark.createDataFrame([(0,)], ["v"])
    with pytest.raises(RuntimeError, match="still relaxing"):
        temporal.earliest_arrival(e, seeds, rounds=2)

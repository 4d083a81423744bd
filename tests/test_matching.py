"""Stable matching: equality with SEQUENTIAL Gale-Shapley (the
deferred-acceptance outcome is schedule-independent), stability
(zero blocking pairs), proposer-optimality spot check, budget raise."""

import pytest

from hebrew_ner_spark.operators import matching


def _prefs_from_spark(spark, n):
    ppref, arank = matching.preference_tables(spark, n)
    pp = {}
    for r in ppref.collect():
        pp.setdefault(r.p, {})[r.idx] = r.a
    plist = {p: [pp[p][i] for i in range(n)] for p in pp}
    ar = {}
    for r in arank.collect():
        ar.setdefault(r.a, {})[r.p] = r.rk
    return plist, ar


def _sequential_gs(plist, arank, n):
    """Textbook one-proposal-at-a-time deferred acceptance."""
    ptr = {p: 0 for p in range(n)}
    match = {}
    free = list(range(n))
    while free:
        p = free.pop(0)
        a = plist[p][ptr[p]]
        ptr[p] += 1
        if a not in match:
            match[a] = p
        elif arank[a][p] < arank[a][match[a]]:
            free.append(match[a])
            match[a] = p
        else:
            free.append(p)
    return match


def test_matches_sequential_gs_and_is_stable(spark):
    n = matching.GS_N
    plist, arank = _prefs_from_spark(spark, n)
    want = _sequential_gs(plist, arank, n)
    rows = {r.acceptor: r for r in matching.stable_matching(spark).collect()}
    assert {a: r.proposer for a, r in rows.items()} == want
    # rank columns are consistent with the preference tables
    for a, r in rows.items():
        assert arank[a][r.proposer] == r.a_rank
        assert plist[r.proposer].index(a) == r.p_idx
    # stability: no blocking pair
    pm = {r.proposer: a for a, r in rows.items()}
    for p in range(n):
        for a in range(n):
            if pm[p] == a:
                continue
            if plist[p].index(a) < plist[p].index(pm[p]) and (
                arank[a][p] < arank[a][rows[a].proposer]
            ):
                pytest.fail(f"blocking pair ({p}, {a})")


def test_budget_raise(spark):
    with pytest.raises(RuntimeError, match="matched after"):
        matching.stable_matching(spark, rounds=2)

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


def test_truncated_stable_and_sequential_parity(spark):
    """Truncated-list market (n=24, T=4): matches sequential GS with
    incomplete lists, and the outcome has no blocking pair among
    LISTED partners; unmatched proposers exhausted their lists."""
    n, t = 24, 4
    ppref, arank = matching.truncated_preference_tables(spark, n, t)
    pp = {}
    for r in ppref.collect():
        pp.setdefault(r.p, {})[r.idx] = r.a
    plist = {p: [pp[p][i] for i in range(len(pp[p]))] for p in pp}
    ar = {}
    for r in arank.collect():
        ar.setdefault(r.a, {})[r.p] = r.rk

    # sequential deferred acceptance over incomplete lists
    ptr = {p: 0 for p in range(n)}
    match = {}
    free = [p for p in range(n) if p in plist]
    while free:
        p = free.pop(0)
        if ptr[p] >= len(plist[p]):
            continue
        a = plist[p][ptr[p]]
        ptr[p] += 1
        if a not in match:
            match[a] = p
        elif ar[a][p] < ar[a][match[a]]:
            free.append(match[a])
            match[a] = p
        else:
            free.append(p)

    got_df, used = matching.stable_matching_truncated(spark, n, t)
    got = {r.acceptor: r.proposer for r in got_df.collect()}
    assert got == match
    assert used >= 1
    # no blocking pair among listed partners
    pm = {p: a for a, p in got.items()}
    for p, lst in plist.items():
        for a in lst:
            if pm.get(p) == a:
                continue
            p_better = pm.get(p) is None or lst.index(a) < lst.index(pm[p])
            a_better = a not in got or ar[a][p] < ar[a][got[a]]
            assert not (p_better and a_better), f"blocking pair ({p}, {a})"

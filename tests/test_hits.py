"""HITS invariants (operators/pagerank.py hits_scores): equality with an
independent Python replay of the integer algorithm, hub/authority
asymmetry on a planted star, and in/out-less score zeros."""

from __future__ import annotations

from hebrew_ner_spark.operators.pagerank import HITS_ITERS, HITS_SCALE, hits_scores


def _edges(spark, rows):
    return spark.createDataFrame(
        [(a, "p", b, w) for a, b, w in rows],
        "subj_id long, pred string, obj_id long, n_evidence long",
    )


def _replay(rows, iters=HITS_ITERS):
    from collections import defaultdict

    w = defaultdict(int)
    for a, b, wt in rows:
        w[(a, b)] += wt
    nodes = sorted({a for a, _, _ in rows} | {b for _, b, _ in rows})
    hub = {n: HITS_SCALE for n in nodes}

    def rescale(raw):
        mx = max(max(raw.values(), default=0), 1)
        return {n: (raw.get(n, 0) * HITS_SCALE) // mx for n in nodes}

    for _ in range(iters):
        a_raw = defaultdict(int)
        for (s, o), wt in w.items():
            a_raw[o] += hub[s] * wt
        auth = rescale(a_raw)
        h_raw = defaultdict(int)
        for (s, o), wt in w.items():
            h_raw[s] += auth[o] * wt
        hub = rescale(h_raw)
    return {n: (hub[n], auth[n]) for n in nodes}


def test_hits_matches_python_replay(spark):
    rows = [(1, 2, 3), (2, 3, 1), (3, 1, 2), (1, 3, 1), (4, 3, 5), (2, 4, 2)]
    got = {r.entity_id: (r.hub_1e6, r.auth_1e6) for r in hits_scores(_edges(spark, rows)).collect()}
    assert got == _replay(rows)


def test_hits_star_asymmetry(spark):
    # hub 1 points at 2..5; authorities are the leaves, the hub has
    # authority 0 (no in-edges) and the leaves have hub 0 (no out-edges)
    rows = [(1, k, 1) for k in (2, 3, 4, 5)]
    got = {r.entity_id: (r.hub_1e6, r.auth_1e6) for r in hits_scores(_edges(spark, rows)).collect()}
    assert got[1] == (HITS_SCALE, 0)
    for k in (2, 3, 4, 5):
        assert got[k] == (0, HITS_SCALE)


def test_hits_parallel_edges_collapse(spark):
    # two parallel predicates == one edge with summed evidence
    a = hits_scores(_edges(spark, [(1, 2, 2), (2, 1, 1)])).collect()
    b = hits_scores(_edges(spark, [(1, 2, 1), (1, 2, 1), (2, 1, 1)])).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# --- crawl frontier ------------------------------------------------------------

import datetime as dt

from hebrew_ner_spark.operators.weblinks import crawl_frontier

T0 = dt.datetime(2024, 1, 1)


def test_crawl_frontier_priority_and_politeness_ranks(spark):
    pages = spark.createDataFrame(
        [
            ("https://a.org/1", T0),                            # age 3
            ("https://a.org/2", T0 + dt.timedelta(seconds=2)),  # age 1
            ("https://b.org/1", T0 + dt.timedelta(seconds=1)),  # age 2
            ("https://b.org/2", T0 + dt.timedelta(seconds=3)),  # age 0
        ],
        "url string, warc_ts timestamp",
    )
    pr = spark.createDataFrame(
        [("a.org", 500_000), ("b.org", 2_000_000)], "host string, pr_1e6 long"
    )
    got = {r.url: r for r in crawl_frontier(pages, pr).collect()}
    assert got["https://a.org/1"].priority == 4 * 500_000
    assert got["https://b.org/1"].priority == 3 * 2_000_000
    assert got["https://b.org/2"].priority == 1 * 2_000_000
    # per-host politeness ranks: staler page first within each host
    assert got["https://a.org/1"].host_rank == 1
    assert got["https://a.org/2"].host_rank == 2
    assert got["https://b.org/1"].host_rank == 1
    assert got["https://b.org/2"].host_rank == 2


def test_crawl_frontier_unranked_host_gets_zero_priority(spark):
    pages = spark.createDataFrame(
        [("https://c.org/1", T0), ("https://c.org/2", T0)],
        "url string, warc_ts timestamp",
    )
    pr = spark.createDataFrame([("other.org", 1)], "host string, pr_1e6 long")
    rows = crawl_frontier(pages, pr).collect()
    assert all(r.pr_1e6 == 0 and r.priority == 0 for r in rows)
    # deterministic tie-break by url
    ranks = {r.url: r.host_rank for r in rows}
    assert ranks == {"https://c.org/1": 1, "https://c.org/2": 2}


def test_salsa_closed_form_multi_component(spark):
    """Two disjoint link communities with different sizes: the
    Lempel-Moran component weighting must show up exactly."""
    from hebrew_ner_spark.operators.pagerank import SALSA_SCALE, salsa_scores

    # community 1: hubs 1,2 both cite authorities 10, 11 (authority
    # co-citation component {10, 11}); community 2: hub 3 cites 20.
    edges = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 1), (2, 10, 1), (2, 11, 1), (3, 20, 1)],
        ["subj_id", "obj_id", "n_evidence"],
    )
    out = {r.entity_id: r for r in salsa_scores(edges).collect()}
    # authority side: V_A = 3 (10, 11, 20); component {10, 11}:
    # n_c = 2, s_c = 4, din(10) = din(11) = 2 -> a = (2*2)/(3*4)
    assert out[10].salsa_auth_1e6 == (2 * 2 * SALSA_SCALE) // (3 * 4)
    assert out[11].salsa_auth_1e6 == (2 * 2 * SALSA_SCALE) // (3 * 4)
    # component {20}: n_c = 1, s_c = 1, din = 1 -> a = 1/3
    assert out[20].salsa_auth_1e6 == (1 * 1 * SALSA_SCALE) // (3 * 1)
    # hub side: V_H = 3; component {1, 2}: n_c = 2, s_c = 4, dout = 2
    assert out[1].salsa_hub_1e6 == (2 * 2 * SALSA_SCALE) // (3 * 4)
    assert out[3].salsa_hub_1e6 == (1 * 1 * SALSA_SCALE) // (3 * 1)
    # pure hubs have no authority score and vice versa
    assert out[1].salsa_auth_1e6 == 0 and out[10].salsa_hub_1e6 == 0
    # each side's exact scores sum to ~SCALE (stationary distribution)
    auth_sum = sum(r.salsa_auth_1e6 for r in out.values())
    assert SALSA_SCALE - 3 <= auth_sum <= SALSA_SCALE


def test_salsa_degree_robust_vs_hits(spark):
    """The TKC scenario: SALSA scores depend only on degrees/components,
    so duplicating evidence weight on one edge must NOT change SALSA
    (while HITS would shift under the same perturbation)."""
    from hebrew_ner_spark.operators.pagerank import salsa_scores

    base = [(1, 10, 1), (2, 10, 1), (2, 11, 1)]
    heavy = [(1, 10, 99), (2, 10, 1), (2, 11, 1)]
    a = {r.entity_id: (r.salsa_hub_1e6, r.salsa_auth_1e6)
         for r in salsa_scores(
             spark.createDataFrame(base, ["subj_id", "obj_id", "n_evidence"])
         ).collect()}
    b = {r.entity_id: (r.salsa_hub_1e6, r.salsa_auth_1e6)
         for r in salsa_scores(
             spark.createDataFrame(heavy, ["subj_id", "obj_id", "n_evidence"])
         ).collect()}
    assert a == b

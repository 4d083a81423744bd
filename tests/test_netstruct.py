"""Degree-structure diagnostics: Python parity + the planted-farm
rich-club signature + closeness/eccentricity parity (centrality)."""

from collections import Counter
from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from hebrew_ner_spark.operators import centrality, netstruct, weblinks

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def host_edges(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    und = weblinks.synth_farm_host_edges(docs)
    return und, [(r.a, r.b) for r in und.collect()]


def test_assortativity_moments(spark, host_edges):
    und, pairs = host_edges
    deg = Counter()
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
    ends = [(deg[a], deg[b]) for a, b in pairs] + [
        (deg[b], deg[a]) for a, b in pairs
    ]
    m = len(ends)
    s_x = sum(x for x, _ in ends)
    s_xx = sum(x * x for x, _ in ends)
    s_xy = sum(x * y for x, y in ends)
    row = netstruct.assortativity_moments(und).collect()[0]
    assert (row.m, row.s_x, row.s_xx, row.s_xy) == (m, s_x, s_xx, s_xy)
    assert row.num == m * s_xy - s_x * s_x
    assert row.den == m * s_xx - s_x * s_x
    # exact Pearson r from the emitted integer pair
    r = Fraction(row.num, row.den)
    assert -1 <= r <= 1


def test_rich_club_farm_signature(spark, host_edges):
    und, pairs = host_edges
    deg = Counter()
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
    rows = {r.k: r for r in netstruct.rich_club(und).collect()}
    for k, row in rows.items():
        nodes = {v for v, d in deg.items() if d > k}
        e_gt = sum(1 for a, b in pairs if a in nodes and b in nodes)
        assert (row.n_gt, row.e_gt) == (len(nodes), e_gt)
        assert row.phi_scaled == (
            2 * e_gt * netstruct.RC_SCALE
        ) // (len(nodes) * (len(nodes) - 1))
    # the planted farm is a perfect club at the top threshold
    assert max(r.phi_scaled for r in rows.values()) == netstruct.RC_SCALE
    # and the curve is non-trivial (background dilutes low thresholds)
    assert min(r.phi_scaled for r in rows.values()) < netstruct.RC_SCALE // 2


def test_closeness_eccentricity_parity(spark, host_edges):
    und, pairs = host_edges
    from collections import deque

    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {}
    for s in adj:
        d = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            for w in adj[u]:
                if w not in d:
                    d[w] = d[u] + 1
                    q.append(w)
        dist[s] = d
    close = {r.vertex: r for r in centrality.closeness_scaled(und).collect()}
    ecc = {r.vertex: r for r in centrality.eccentricity(und).collect()}
    eccs = {s: max(d.values()) for s, d in dist.items()}
    radius, diameter = min(eccs.values()), max(eccs.values())
    for v in adj:
        td = sum(dist[v].values())
        nr = len(dist[v]) - 1
        assert close[v].total_dist == td
        assert close[v].closeness_scaled == (nr * centrality.BC_SCALE) // td
        assert ecc[v].ecc == eccs[v]
        assert ecc[v].is_central == int(eccs[v] == radius)
        assert ecc[v].is_peripheral == int(eccs[v] == diameter)


def test_modularity_pieces_hand_computed(spark):
    """Two triangles joined by one bridge, communities = the triangles:
    exact integer pieces and positive total Q."""
    from fractions import Fraction

    wund = spark.createDataFrame(
        [(0, 1, 2), (1, 2, 2), (0, 2, 2), (3, 4, 2), (4, 5, 2), (3, 5, 2),
         (2, 3, 1)],
        ["a", "b", "n"],
    )
    labels = spark.createDataFrame(
        [(v, 0) for v in (0, 1, 2)] + [(v, 1) for v in (3, 4, 5)],
        ["entity", "community"],
    )
    rows = {r.community: r for r in
            netstruct.modularity_pieces(wund, labels).collect()}
    W = 13
    # community 0: internal weight 6, strengths 4+4+5
    assert (rows[0].n_v, rows[0].w_in, rows[0].s_tot) == (3, 6, 13)
    assert rows[0].q_num == 4 * W * 6 - 13 * 13
    assert rows[0].q_den == 4 * W * W
    assert rows[1].q_num == rows[0].q_num  # symmetric
    q = Fraction(sum(r.q_num for r in rows.values()), 4 * W * W)
    # exact: Q = 2 * (6/13 - (13/26)^2) = 12/13 - 1/2
    assert q == Fraction(12, 13) - Fraction(1, 2)


def test_modularity_degenerate_partitions(spark):
    """All-in-one community: Q = 0 exactly (w_in = W, s_tot = 2W)."""
    wund = spark.createDataFrame(
        [(0, 1, 3), (1, 2, 4), (0, 2, 5)], ["a", "b", "n"]
    )
    labels = spark.createDataFrame(
        [(0, 9), (1, 9), (2, 9)], ["entity", "community"]
    )
    r = netstruct.modularity_pieces(wund, labels).collect()[0]
    assert r.q_num == 0

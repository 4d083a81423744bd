"""Borůvka MSF: pure-Python Kruskal parity on the gated graph,
forest semantics, round-budget discipline, SLINK == threshold-closure."""

import pytest
from pyspark.sql import functions as F

from hebrew_ner_spark.operators import mst

SF = "/root/testdata/sf0.001"


def _kruskal(edges):
    """edges: [(a, b, wu)] unique wu -> set of MST edge tuples."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = set()
    for a, b, wu in sorted(edges, key=lambda e: e[2]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.add((a, b, wu))
    return out


def test_boruvka_equals_kruskal_on_gated_graph(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    we = mst.weighted_host_edges(docs)
    pairs = [(r.a, r.b, r.wu) for r in we.collect()]
    want = _kruskal(pairs)
    got = {(r.a, r.b, r.wu) for r in mst.boruvka_msf(we).collect()}
    assert got == want and len(got) == 63  # spanning tree of 64 hosts


def test_forest_on_disconnected_graph(spark):
    # two components: triangle {0,1,2} and edge {10,11}; the heaviest
    # triangle edge drops, the bridgeless pair keeps its only edge
    edges = spark.createDataFrame(
        [(0, 1, 5), (1, 2, 3), (0, 2, 9), (10, 11, 7)],
        "a long, b long, wu long",
    )
    got = {(r.a, r.b) for r in mst.boruvka_msf(edges).collect()}
    assert got == {(0, 1), (1, 2), (10, 11)}


def test_round_budget_raises(spark):
    edges = spark.createDataFrame(
        [(i, i + 1, i) for i in range(8)], "a long, b long, wu long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        mst.boruvka_msf(edges, max_rounds=0)


def test_single_linkage_matches_threshold_closure(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    we = mst.weighted_host_edges(docs)
    msf = mst.boruvka_msf(we).persist()
    pairs = [(r.a, r.b, r.wb) for r in we.collect()]
    verts = sorted({v for a, b, _ in pairs for v in (a, b)})
    for tau in (10, mst.SL_TAU, 96):
        got = {
            (r.vertex, r.cluster)
            for r in mst.single_linkage_clusters(
                we, msf, F.expr(f"wu DIV {64 * 64} <= {tau}")
            ).collect()
        }
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b, wb in pairs:
            if wb <= tau:
                parent[find(a)] = find(b)
        groups = {}
        for v in verts:
            groups.setdefault(find(v), []).append(v)
        want = {(v, min(g)) for g in groups.values() for v in g}
        assert got == want, f"tau={tau}"
    # thresholds must actually vary the clustering for the test to bite
    n10 = len({c for _, c in _clusters(spark, we, msf, 10)})
    n96 = len({c for _, c in _clusters(spark, we, msf, 96)})
    assert n10 > n96


def _clusters(spark, we, msf, tau):
    return [
        (r.vertex, r.cluster)
        for r in mst.single_linkage_clusters(
            we, msf, F.expr(f"wu DIV {64 * 64} <= {tau}")
        ).collect()
    ]

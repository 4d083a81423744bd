"""SimRank: closed-form fixtures, independent pure-Python parity on the
corpus graph, hub-cap exclusion, source-only diagonal semantics."""

import itertools
from collections import defaultdict

from hebrew_ner_spark.operators import simrank


def _py_simrank(edges, iters=simrank.SR_ITERS, max_deg=simrank.SR_MAX_DEG):
    """Independent reference: dict-based exact-integer SimRank with the
    same cap semantics (children above max_deg in-degree excluded)."""
    parents = defaultdict(set)
    for s, d in edges:
        parents[d].add(s)
    parents = {d: ps for d, ps in parents.items() if len(ps) <= max_deg}
    nodes = sorted(
        set(parents) | {p for ps in parents.values() for p in ps}
    )
    prev = {}

    def get(i, j):
        if i == j:
            return simrank.SR_UNIT
        return prev.get((min(i, j), max(i, j)), 0)

    for _ in range(iters):
        new = {}
        for a, b in itertools.combinations(nodes, 2):
            ia, ib = parents.get(a), parents.get(b)
            if not ia or not ib:
                continue
            tot = sum(get(i, j) for i in ia for j in ib)
            v = (simrank.SR_C_NUM * tot) // (
                simrank.SR_C_DEN * len(ia) * len(ib)
            )
            if v > 0:
                new[(a, b)] = v
        prev = new
    return prev


def _run(spark, edges, **kw):
    df = spark.createDataFrame(list(edges), ["src", "dst"])
    return {
        (r.node_a, r.node_b): r.s_1e6
        for r in simrank.simrank_scores(df, **kw).collect()
    }


class TestClosedForms:
    def test_shared_single_parent(self, spark):
        # p -> a, p -> b: round 1 gives s(a,b) = C * 1e6 / (1*1) = 800000
        got = _run(spark, [("p", "a"), ("p", "b")])
        assert got == {("a", "b"): 800_000}

    def test_half_shared_parents(self, spark):
        # I(a) = {p, q}, I(b) = {p, r}: one matching parent pair of 4
        # -> s1 = C * 1e6 / 4 = 200000
        got = _run(
            spark, [("p", "a"), ("q", "a"), ("p", "b"), ("r", "b")], iters=1
        )
        assert got == {("a", "b"): 200_000}

    def test_two_level_propagation(self, spark):
        # univ-style chain: x -> p, x -> q (p ~ q at round 1), then
        # p -> a, q -> b: round 2 gives s(a,b) = C * s1(p,q) = C^2 * 1e6
        edges = [("x", "p"), ("x", "q"), ("p", "a"), ("q", "b")]
        got = _run(spark, edges)
        assert got[("a", "b")] == (8 * 800_000) // 10  # 640000
        assert got[("p", "q")] == 800_000

    def test_no_shared_structure_is_zero(self, spark):
        # permutation graph: disjoint in-neighborhoods everywhere
        got = _run(spark, [("a", "b"), ("b", "c"), ("c", "a")])
        assert got == {}


class TestCapSemantics:
    def test_hub_child_excluded_and_reported(self, spark):
        # h has 3 parents; with max_deg=2 every pair through h vanishes
        edges = [("p1", "h"), ("p2", "h"), ("p3", "h"), ("p1", "k"), ("p2", "k")]
        full = _run(spark, edges)
        assert ("h", "k") in full
        capped = _run(spark, edges, max_deg=2)
        assert all("h" not in pair for pair in capped)
        df = spark.createDataFrame(edges, ["src", "dst"])
        over = {
            (r.node, r.in_deg)
            for r in simrank.simrank_overflow(df, max_deg=2).collect()
        }
        assert over == {("h", 3)}

    def test_source_only_diagonal_counts(self, spark):
        # q never appears as dst, but s(q,q)=1e6 must still feed its
        # children's round-1 scores (the diagonal-universe fix)
        got = _run(spark, [("q", "a"), ("q", "b")], iters=1)
        assert got == {("a", "b"): 800_000}


class TestCorpusParity:
    def test_matches_independent_reference(self, spark, sf_dir):
        from hebrew_ner_spark.sources.catalog import load_table

        docs = load_table(spark, sf_dir, "documents")
        e = simrank.synth_sr_edges(docs)
        got = {
            (r.node_a, r.node_b): r.s_1e6
            for r in simrank.simrank_scores(e).collect()
        }
        edges = {(r.src, r.dst) for r in e.collect()}
        assert got == _py_simrank(edges)

"""Random-walk invariants (operators/graphstats.py random_walks):
walk validity (every hop is an edge), early stop at sinks, walk
multiplicity, determinism, and partition invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from hebrew_ner_spark.operators.graphstats import random_walks


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, "p", b) for a, b in pairs], "subj_id long, pred string, obj_id long"
    )


def test_chain_walks_follow_the_only_path_and_stop_at_sink(spark):
    # 1 -> 2 -> 3 -> 4 -> (sink); horizons clip, sinks stop early
    w = {
        (r.walk_src, r.walk_i): (r.path, r.walk_len)
        for r in random_walks(_edges(spark, [(1, 2), (2, 3), (3, 4)]), steps=3).collect()
    }
    assert set(w) == {(s, i) for s in (1, 2, 3) for i in (0, 1)}
    for i in (0, 1):
        assert w[(1, i)] == ("1|2|3|4", 4)
        assert w[(2, i)] == ("2|3|4", 3)
        assert w[(3, i)] == ("3|4", 2)


def test_every_hop_is_a_graph_edge_and_paths_start_at_src(spark):
    pairs = [(a, b) for a in range(10) for b in ((a * 3 + 1) % 10, (a * 7 + 2) % 10)]
    rows = random_walks(_edges(spark, pairs), steps=4).collect()
    edge_set = set(pairs)
    assert len(rows) == 2 * len({a for a, _ in pairs})
    for r in rows:
        path = [int(x) for x in r.path.split("|")]
        assert path[0] == r.walk_src
        assert len(path) == r.walk_len == 5  # no sinks in this graph
        for u, v in zip(path, path[1:]):
            assert (u, v) in edge_set, (r.walk_src, r.walk_i, path)


def test_branching_node_walks_diverge_somewhere(spark):
    # star with full fan-out: with 2 walks/node x 8 sources and 4 choices
    # per hop, identical choices everywhere would mean the seeded hash
    # ignores walk identity
    pairs = [(a, b) for a in range(8) for b in range(8) if a != b][: 8 * 4]
    rows = random_walks(_edges(spark, pairs), steps=3).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.walk_src, set()).add(r.path)
    assert any(len(v) > 1 for v in by_src.values())


def test_deterministic_and_partition_invariant(spark):
    pairs = [(a, (a * 5 + 3) % 11) for a in range(11)]
    e = _edges(spark, pairs)
    a = sorted(tuple(r) for r in random_walks(e, steps=3).collect())
    b = sorted(
        tuple(r) for r in random_walks(e.repartition(7, "obj_id"), steps=3).collect()
    )
    assert a == b and len(a) > 0


# --- skip-gram pairs ---------------------------------------------------------

from hebrew_ner_spark.operators.graphstats import skipgram_pairs


def _walks(spark, rows):
    return spark.createDataFrame(
        rows, "walk_src long, walk_i long, path string, walk_len long"
    )


def test_skipgram_pairs_enumerate_exactly(spark):
    got = sorted(
        (r.center, r.context, r.off)
        for r in skipgram_pairs(_walks(spark, [(1, 0, "1|2|3|4", 4)]), window=2).collect()
    )
    path = [1, 2, 3, 4]
    want = sorted(
        (path[i], path[j], j - i)
        for i in range(4)
        for j in range(max(0, i - 2), min(3, i + 2) + 1)
        if j != i
    )
    assert got == want


def test_skipgram_pair_count_formula_and_symmetry(spark):
    # a length-L walk with window w yields sum over i of |[i-w,i+w] ∩ [0,L) \ {i}|
    # pairs, and the (center, context, off) set is mirror-symmetric
    rows = [(7, 0, "5|6|5|6|5", 5), (8, 1, "9|9", 2)]
    pairs = skipgram_pairs(_walks(spark, rows), window=2).collect()
    by_walk = {}
    for r in pairs:
        by_walk.setdefault((r.walk_src, r.walk_i), []).append(r)
    for (src, wi), L in ((7, 0), 5), (((8, 1)), 2):
        n = sum(
            len([j for j in range(max(0, i - 2), min(L - 1, i + 2) + 1) if j != i])
            for i in range(L)
        )
        assert len(by_walk[(src, wi)]) == n
    flat = {(r.walk_src, r.walk_i, r.center, r.context, r.off) for r in pairs}
    assert flat == {(s, w, b, a, -o) for (s, w, a, b, o) in flat}


def test_skipgram_composes_with_walks(spark):
    e = _edges(spark, [(1, 2), (2, 3), (3, 1)])
    pairs = skipgram_pairs(random_walks(e, steps=3)).collect()
    # 3-cycle: every walk has length 4, so each yields 10 pairs with w=2
    assert len(pairs) == 6 * 10
    for r in pairs:
        assert r.off != 0 and abs(r.off) <= 2


# --- landmark BFS distances --------------------------------------------------

from hebrew_ner_spark.operators.graphstats import landmark_distances


def test_bfs_chain_distances_exact(spark):
    # chain 1-2-3-4-5 (directed edges, BFS is undirected); k=1 landmark
    # = hash-minimal node; horizon 3 leaves the far end absent when the
    # landmark sits at a chain end
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    rows = landmark_distances(e, k=1, rounds=3).collect()
    lms = {r.landmark for r in rows}
    assert len(lms) == 1
    (lm,) = lms
    got = {r.entity: r.dist for r in rows}
    want = {n: abs(n - lm) for n in range(1, 6) if abs(n - lm) <= 3}
    assert got == want


def test_bfs_undirected_and_min_over_paths(spark):
    # directed triangle + pendant: 1->2, 2->3, 3->1, 3->4; from any
    # landmark every node is within 2 undirected hops
    e = _edges(spark, [(1, 2), (2, 3), (3, 1), (3, 4)])
    rows = landmark_distances(e, k=2, rounds=3).collect()
    by_lm = {}
    for r in rows:
        by_lm.setdefault(r.landmark, {})[r.entity] = r.dist
    assert len(by_lm) == 2
    for lm, d in by_lm.items():
        assert set(d) == {1, 2, 3, 4} and d[lm] == 0
        assert max(d.values()) <= 2  # triangle shortcuts beat directed detours


def test_bfs_self_loops_and_horizon(spark):
    # self-loop never shortens; beyond-horizon pairs are absent
    e = _edges(spark, [(1, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6)])
    rows = landmark_distances(e, k=1, rounds=2).collect()
    assert all(r.dist <= 2 for r in rows)
    ents = {r.entity for r in rows}
    assert len(ents) < 6  # someone is beyond the 2-hop horizon


# --- PMI over skip-gram pairs ------------------------------------------------

from hebrew_ner_spark.operators.graphstats import walk_pmi


def test_walk_pmi_closed_form(spark):
    # pair corpus: (1,2)x3, (1,3)x1, (2,3)x2 -> T=6
    rows = [(0, 0, c, x, 1) for c, x, n in ((1, 2, 3), (1, 3, 1), (2, 3, 2)) for _ in range(n)]
    pairs = spark.createDataFrame(
        rows, "walk_src long, walk_i long, center long, context long, off long"
    )
    got = {(r.center, r.context): (r.n_cx, r.lift_1e6) for r in walk_pmi(pairs).collect()}

    def lift(t, ncx, nc, nx):
        return (2_000_000 * t * ncx + nc * nx) // (2 * nc * nx)

    # marginals: n_c(1)=4, n_c(2)=2; n_x(2)=3, n_x(3)=3
    assert got == {
        (1, 2): (3, lift(6, 3, 4, 3)),
        (1, 3): (1, lift(6, 1, 4, 3)),
        (2, 3): (2, lift(6, 2, 2, 3)),
    }
    # sanity: (2,3) is over-represented vs independence (lift > 1e6)
    assert got[(2, 3)][1] > 1_000_000 > got[(1, 3)][1]


# --- SRP node signatures -----------------------------------------------------

import hashlib

from hebrew_ner_spark.operators.graphstats import (
    SRP_BITS,
    SRP_SEED,
    node_signatures,
)


def _srp_sign(j, context, seed=SRP_SEED):
    h = int(hashlib.md5(f"SRP|{j}|{context}:{seed}".encode()).hexdigest()[:15], 16)
    return 1 if h % 2 == 0 else -1


def test_node_signatures_match_independent_replay(spark):
    pmi_rows = [
        (1, 10, 2, 3_000_000),
        (1, 11, 1, 500_000),
        (2, 10, 1, 1_000_000),
        (2, 12, 4, 2_500_000),
        (3, 13, 1, 750_000),
    ]
    pmi = spark.createDataFrame(
        pmi_rows, "center long, context long, n_cx long, lift_1e6 long"
    )
    got = {r.entity: r.sig for r in node_signatures(pmi).collect()}
    want = {}
    for e in (1, 2, 3):
        sig = 0
        for j in range(SRP_BITS):
            s = sum(
                w * _srp_sign(j, x) for c, x, _n, w in pmi_rows if c == e
            )
            if s > 0:
                sig |= 1 << j
        want[e] = sig
    assert got == want and len(set(got.values())) > 1


def test_node_signatures_zero_sum_bit_is_zero(spark):
    # two contexts with equal weight and opposite signs at some bit force
    # s == 0 there -> bit must be 0 (deterministic tie), not 1
    opp = None
    for x1 in range(100, 200):
        for x2 in range(x1 + 1, 200):
            if any(_srp_sign(j, x1) != _srp_sign(j, x2) for j in range(SRP_BITS)):
                opp = (x1, x2)
                break
        if opp:
            break
    x1, x2 = opp
    pmi = spark.createDataFrame(
        [(9, x1, 1, 1_000_000), (9, x2, 1, 1_000_000)],
        "center long, context long, n_cx long, lift_1e6 long",
    )
    [r] = node_signatures(pmi).collect()
    for j in range(SRP_BITS):
        if _srp_sign(j, x1) + _srp_sign(j, x2) == 0:
            assert not (r.sig >> j) & 1


# --- similar-role pairs ------------------------------------------------------

from itertools import combinations

from hebrew_ner_spark.operators.graphstats import similar_roles


def _sigs(spark, sigs):
    return spark.createDataFrame(
        list(enumerate(sigs)), "entity long, sig long"
    )


def test_similar_roles_equals_brute_force(spark):
    # deterministic pseudo-random 16-bit signatures, plus planted
    # neighbors of the first five at Hamming 1..3 (and one at 4, which
    # must NOT pair with its base)
    sigs = [
        int(hashlib.md5(f"role|{i}".encode()).hexdigest()[:4], 16)
        for i in range(30)
    ]
    sigs += [sigs[i] ^ ((1 << (3 * i + 2)) - (1 << (2 * i))) for i in range(5)]
    got = {
        (r.ent_a, r.ent_b, r.hamming)
        for r in similar_roles(_sigs(spark, sigs)).collect()
    }
    want = {
        (a, b, bin(sa ^ sb).count("1"))
        for (a, sa), (b, sb) in combinations(enumerate(sigs), 2)
        if bin(sa ^ sb).count("1") <= 3
    }
    assert got == want and want  # non-vacuous: the fixture has close pairs


def test_similar_roles_radius_boundary(spark):
    # d=3 (within one band) kept; d=4 dropped even though pairs share
    # three identical bands (blocking finds them, the filter rejects)
    base = 0b1010_0101_1100_0011
    sigs = [base, base ^ 0b0111, base ^ 0b1111]
    rows = similar_roles(_sigs(spark, sigs)).collect()
    got = {(r.ent_a, r.ent_b): r.hamming for r in rows}
    assert got == {(0, 1): 3, (1, 2): 1}  # (0,2) is d=4 -> excluded

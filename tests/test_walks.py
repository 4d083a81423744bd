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

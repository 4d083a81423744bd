"""SCC + bow-tie unit tests: hand-built digraphs with known partitions."""

import pytest

from hebrew_ner_spark.operators import scc


def rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(s, d) for s, d in pairs], "src string, dst string"
    )


def test_scc_two_cycles_and_bridge(spark):
    # a<->b<->c one SCC; d<->e another; c->d a one-way bridge; f a sink.
    e = edges_df(
        spark,
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
         ("d", "e"), ("e", "d"), ("c", "d"), ("e", "f")],
    )
    got = rows(scc.scc_components(e), "host", "scc_id", "scc_size")
    assert got == [
        ("a", "a", 3), ("b", "a", 3), ("c", "a", 3),
        ("d", "d", 2), ("e", "d", 2), ("f", "f", 1),
    ]


def test_scc_condensation_chain_needs_multiple_peels(spark):
    # Three 2-cycles chained by one-way edges with the SMALLEST label
    # UPSTREAM: 'a' floods every downstream vertex in the first forward
    # coloring, so only SCC(a) resolves in peel 1 and each later SCC in
    # the chain waits one more peel (the label-monotone condensation
    # depth the docstring describes).
    e = edges_df(
        spark,
        [("a", "b"), ("b", "a"),     # SCC {a,b}, upstream, min label
         ("a", "m"),                  # one-way into
         ("m", "n"), ("n", "m"),     # SCC {m,n}, middle
         ("m", "x"),                  # one-way into
         ("x", "y"), ("y", "x")],    # SCC {x,y}, downstream
    )
    got = rows(scc.scc_components(e), "host", "scc_id")
    assert got == [
        ("a", "a"), ("b", "a"), ("m", "m"), ("n", "m"), ("x", "x"), ("y", "x"),
    ]


def test_scc_single_big_cycle(spark):
    n = 12
    e = edges_df(spark, [(f"v{i:02d}", f"v{(i + 1) % n:02d}") for i in range(n)])
    got = rows(scc.scc_components(e), "host", "scc_id", "scc_size")
    assert got == [(f"v{i:02d}", "v00", n) for i in range(n)]


def test_scc_dag_is_all_singletons(spark):
    e = edges_df(spark, [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")])
    got = rows(scc.scc_components(e), "host", "scc_id", "scc_size")
    assert got == [("a", "a", 1), ("b", "b", 1), ("c", "c", 1), ("d", "d", 1)]


def test_scc_raises_on_peel_cap(spark):
    # Min label upstream shadows the downstream SCC (colored 'a', but
    # only {a,b} back-reaches the root), so this needs 2 peels;
    # max_peels=1 must raise, never return a partial map.
    e = edges_df(
        spark,
        [("a", "b"), ("b", "a"), ("a", "x"), ("x", "y"), ("y", "x")],
    )
    with pytest.raises(RuntimeError, match="peels"):
        scc.scc_components(e, max_peels=1)


def test_bowtie_classes(spark):
    # core: 3-cycle {c1,c2,c3}; in: i1->i2->c1; out: c2->o1->o2;
    # tendril off the in-branch: i1->t1 (reaches neither core nor from);
    # disconnected 2-cycle {d1,d2}.
    e = edges_df(
        spark,
        [("c1", "c2"), ("c2", "c3"), ("c3", "c1"),
         ("i1", "i2"), ("i2", "c1"),
         ("c2", "o1"), ("o1", "o2"),
         ("i1", "t1"),
         ("d1", "d2"), ("d2", "d1")],
    )
    got = dict(
        (r[0], r[1]) for r in rows(scc.bowtie_parts(e), "host", "part")
    )
    assert got == {
        "c1": "CORE", "c2": "CORE", "c3": "CORE",
        "i1": "IN", "i2": "IN",
        "o1": "OUT", "o2": "OUT",
        "t1": "OTHER", "d1": "OTHER", "d2": "OTHER",
    }


def test_bowtie_core_tie_breaks_min_scc_id(spark):
    # Two 2-SCCs, same size, no path between: core is the min-id one.
    e = edges_df(spark, [("a", "b"), ("b", "a"), ("p", "q"), ("q", "p")])
    got = dict((r[0], r[1]) for r in rows(scc.bowtie_parts(e), "host", "part"))
    assert got == {"a": "CORE", "b": "CORE", "p": "OTHER", "q": "OTHER"}


def test_synth_host_edges_structure(spark):
    # >= 60 consecutive doc_ids cover the full planted graph.
    docs = spark.range(0, 70).withColumnRenamed("id", "doc_id")
    comp = rows(
        scc.scc_components(scc.synth_host_edges(docs)),
        "host", "scc_id", "scc_size",
    )
    by_id = {}
    for host, sid, size in comp:
        by_id.setdefault(sid, []).append((host, size))
    sizes = sorted(len(v) for v in by_id.values())
    # 4 ring 3-SCCs + the 2-SCC pair + source & sink singletons
    assert sizes == [1, 1, 2, 3, 3, 3, 3]
    parts = dict(
        (r[0], r[1])
        for r in rows(scc.bowtie_parts(scc.synth_host_edges(docs)), "host", "part")
    )
    # CORE = block0 ring (min id); blocks 1-3 are strictly downstream.
    assert parts["ex00.example.net"] == "CORE"
    assert parts["ex04.example.net"] == "OUT"
    assert parts["ex11.example.net"] == "OUT"
    assert parts["ex12.example.net"] == "IN"     # pure source feeds block0
    assert parts["ex13.example.net"] == "OUT"    # global sink
    assert parts["ex14.example.net"] == "OTHER"  # disconnected 2-SCC
    assert parts["ex15.example.net"] == "OTHER"


# ---------------------------------------------------------------------------
# Luby MIS
# ---------------------------------------------------------------------------

def _py_phash(s, seed):
    import hashlib

    return int(hashlib.md5(f"{s}:{seed}".encode()).hexdigest()[:15], 16)


def _py_greedy_mis(pairs, seed):
    nodes = sorted({v for p in pairs for v in p})
    adj = {v: set() for v in nodes}
    for s, d in pairs:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    mis = set()
    for v in sorted(nodes, key=lambda v: (_py_phash(v, seed), v)):
        if not adj[v] & mis:
            mis.add(v)
    return mis


def test_mis_matches_sequential_greedy(spark):
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
             ("c", "e"), ("e", "f"), ("g", "g")]
    got = {
        r[0]: r[2]
        for r in rows(scc.host_mis(edges_df(spark, pairs)), "host", "priority", "in_mis")
    }
    want = _py_greedy_mis(pairs, scc.MIS_SEED)
    assert {h for h, f in got.items() if f == 1} == want


def test_mis_independent_and_maximal_on_synth(spark):
    docs = spark.range(0, 70).withColumnRenamed("id", "doc_id")
    e = scc.synth_host_edges(docs)
    flags = {
        r[0]: r[2] for r in rows(scc.host_mis(e), "host", "priority", "in_mis")
    }
    pairs = [(r["src"], r["dst"]) for r in e.collect()]
    mis = {h for h, f in flags.items() if f == 1}
    for s, d in pairs:
        if s != d:
            assert not (s in mis and d in mis)          # independent
    adj = {v: set() for v in flags}
    for s, d in pairs:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    for v, f in flags.items():
        if f == 0:
            assert adj[v] & mis                          # maximal
    assert mis                                           # non-vacuous


def test_mis_raises_on_round_cap(spark):
    e = edges_df(spark, [("a", "b"), ("b", "c")])
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="rounds"):
        scc.host_mis(e, max_rounds=0)

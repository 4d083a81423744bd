"""Hand-built-lattice tests for the DFS prune kernel (G1-G3 semantics,
reference utils/yap_graph.py:23-105: path-limit, ±1 fallback, keep-all)."""

from hebrew_ner_spark.operators.lattice import Lattice, prune_edge_group


def test_all_paths_diamond():
    # 0 -> {1, 2} -> 3 : two paths
    g = Lattice.from_edges([(0, 1), (0, 2), (1, 3), (2, 3)])
    paths = sorted(g.all_paths(0, 3))
    assert paths == [[0, 1, 3], [0, 2, 3]]


def test_all_paths_limit_cuts_long_paths():
    # chain 0-1-2-3 plus shortcut 0-3
    g = Lattice.from_edges([(0, 1), (1, 2), (2, 3), (0, 3)])
    assert sorted(g.all_paths(0, 3, limit=2)) == [[0, 3]]
    assert sorted(g.all_paths(0, 3, limit=4)) == [[0, 1, 2, 3], [0, 3]]


def test_parallel_edges_dedup():
    g = Lattice.from_edges([(0, 1), (0, 1), (1, 2)])
    assert list(g.all_paths(0, 2)) == [[0, 1, 2]]


def test_prune_exact_length():
    edges = [(0, 1), (1, 2), (0, 2)]  # morph chain + shortcut
    # splitting=2 -> path_len=3 -> keep the chain only
    assert prune_edge_group(edges, 2, fallback=True) == {(0, 1), (1, 2)}
    # splitting=1 -> path_len=2 -> keep the shortcut only
    assert prune_edge_group(edges, 1, fallback=True) == {(0, 2)}


def test_prune_fallback_plus_minus_one():
    edges = [(0, 1), (1, 2)]  # only a length-3 path exists
    # splitting=2 -> exact match, no fallback needed
    assert prune_edge_group(edges, 2, fallback=True) == {(0, 1), (1, 2)}
    # splitting=3 -> path_len=4, no exact; |3-4|=1 -> fallback accepts
    assert prune_edge_group(edges, 3, fallback=True) == {(0, 1), (1, 2)}
    # splitting=3 without fallback -> nothing pruned-to, keep ALL paths
    assert prune_edge_group(edges, 3, fallback=False) == {(0, 1), (1, 2)}


def test_prune_keep_all_when_nothing_matches():
    # both paths wrong length and outside ±1 -> keep everything
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (0, 4)]
    got = prune_edge_group(edges, 10, fallback=True)
    assert got == {(0, 1), (1, 2), (2, 3), (3, 4), (0, 4)}

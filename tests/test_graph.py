"""Entity-linking and connected-components tests."""

from pyspark.sql import Row

from hebrew_ner_spark.operators import canonicalize, linking


def test_tiered_linking_precedence(spark):
    dim = spark.createDataFrame(
        [(1, "spark"), (2, "Table"), (3, "Row")],
        "entity_id long, canonical_name string",
    )
    mentions = spark.createDataFrame(
        [
            Row(doc_id=0, lo=0, hi=0, surface="spark"),       # tier 1 exact
            Row(doc_id=0, lo=1, hi=1, surface="table"),       # tier 2 lower
            Row(doc_id=0, lo=2, hi=3, surface="table spark"), # tier 3 head token
            Row(doc_id=0, lo=4, hi=4, surface="nothing"),     # unlinked
        ]
    )
    out = {r.surface: (r.entity_id, r.tier) for r in linking.link_mentions(mentions, dim).collect()}
    assert out["spark"] == (1, 1)
    assert out["table"] == (2, 2)
    assert out["table spark"] == (2, 3)
    assert out["nothing"] == (None, 0)


def test_connected_components_chain_needs_multiple_rounds(spark):
    # a path graph 0-1-2-...-9 plus a separate triangle {100,101,102}
    chain = [(i, i + 1) for i in range(9)]
    tri = [(100, 101), (101, 102), (100, 102)]
    edges = spark.createDataFrame(chain + tri, "src long, dst long")
    cc = {r.vertex: r.component for r in canonicalize.connected_components(edges).collect()}
    assert all(cc[v] == 0 for v in range(10))
    assert all(cc[v] == 100 for v in (100, 101, 102))


def test_connected_components_long_chain_converges_in_log_rounds(spark):
    """Pointer doubling: a 200-node path (diameter 199) must close well
    inside the default 25-round cap — plain min propagation would need
    199 rounds and previously returned silently split components."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(199)], "src long, dst long"
    )
    cc = {r.vertex: r.component for r in canonicalize.connected_components(edges).collect()}
    assert all(cc[v] == 0 for v in range(200))


def test_connected_components_raises_on_non_convergence(spark):
    """With the round cap forced below what the graph needs, the operator
    must raise instead of returning split components."""
    import pytest as _pytest

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "src long, dst long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        canonicalize.connected_components(edges, max_rounds=2)


def test_dedup_components_deterministic_survivor(spark):
    pairs = spark.createDataFrame([(5, 9), (9, 3), (20, 21)], "doc_a long, doc_b long")
    out = {r.doc_id: r.component_id for r in canonicalize.dedup_components(pairs).collect()}
    assert out == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20}

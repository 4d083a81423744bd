"""RPQ evaluation: python NFA-product replay on the corpus graph and
a crafted fixture where the Kleene loop must absorb a cycle."""

from hebrew_ner_spark.operators import linking, rpq


def _py_rpq(triples, transitions, accept):
    trans = {}
    for a, p, b in transitions:
        trans.setdefault((a, p), set()).add(b)
    adj = {}
    for s, p, o in triples:
        adj.setdefault(s, []).append((p, o))
    starts = {s for s, _, _ in triples}
    out = set()
    for src in starts:
        seen = {(src, 0)}
        stack = [(src, 0)]
        while stack:
            v, st = stack.pop()
            if st == accept:
                out.add((src, v))
            for p, o in adj.get(v, ()):
                for st2 in trans.get((st, p), ()):
                    if (o, st2) not in seen:
                        seen.add((o, st2))
                        stack.append((o, st2))
    return out


def test_rpq_corpus_parity(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    edges = linking.kg_edges(docs)
    triples = {
        (r.subj_id, r.pred, r.obj_id)
        for r in edges.select("subj_id", "pred", "obj_id").collect()
    }
    want = _py_rpq(triples, rpq.RPQ_TRANSITIONS, rpq.RPQ_ACCEPT)
    got = {(r.src, r.dst) for r in rpq.rpq_reach(edges).collect()}
    assert got == want and got


def test_rpq_kleene_cycle_absorption(spark):
    """scan.(join|merge)*.agg over a join-cycle: the loop must absorb
    the cycle (finite evaluation) and still reach through it."""
    edges = spark.createDataFrame(
        [
            (0, "scan", 1, 1),
            (1, "join", 2, 1),
            (2, "merge", 1, 1),  # cycle 1 -> 2 -> 1
            (2, "agg", 3, 1),
            (5, "agg", 6, 1),    # agg without scan prefix: no match
        ],
        "subj_id long, pred string, obj_id long, n_evidence long",
    )
    got = {(r.src, r.dst) for r in rpq.rpq_reach(edges).collect()}
    assert got == {(0, 3)}

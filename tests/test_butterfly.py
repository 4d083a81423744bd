"""Butterfly counting: brute-force 2x2-biclique parity, the wedge
identity, cap-exclusion semantics, and the overflow report."""

from itertools import combinations

from hebrew_ner_spark.operators import butterfly


def _edges(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    e = butterfly.entity_doc_edges(docs)
    return [(r.left, r.right) for r in e.collect()], e


def _brute(pairs, cap):
    rdeg = {}
    for _, r in pairs:
        rdeg[r] = rdeg.get(r, 0) + 1
    ok = [(l, r) for l, r in pairs if rdeg[r] <= cap]
    nbrs = {}
    for l, r in ok:
        nbrs.setdefault(l, set()).add(r)
    bf = 0
    per = {l: 0 for l in nbrs}
    for a, b in combinations(sorted(nbrs), 2):
        c = len(nbrs[a] & nbrs[b])
        k = c * (c - 1) // 2
        bf += k
        per[a] += k
        per[b] += k
    return ok, bf, per


def test_global_census_parity(spark):
    pairs, e = _edges(spark)
    ok, bf, _ = _brute(pairs, butterfly.BF_MAX_RIGHT_DEG)
    row = butterfly.butterfly_stats(e).collect()[0]
    assert row.butterflies == bf > 0
    assert row.n_edges == len(ok)
    # wedge identity: sum C(rdeg, 2) == sum of pair co-occurrence counts
    rdeg = {}
    for _, r in ok:
        rdeg[r] = rdeg.get(r, 0) + 1
    assert row.wedges == sum(d * (d - 1) // 2 for d in rdeg.values())


def test_per_vertex_parity(spark):
    pairs, e = _edges(spark)
    _, _, per = _brute(pairs, butterfly.BF_MAX_RIGHT_DEG)
    got = {r.left: r.butterflies for r in butterfly.butterfly_degrees(e).collect()}
    assert got == per


def test_cap_excludes_and_reports(spark):
    pairs, e = _edges(spark)
    cap = 12
    ok, bf, _ = _brute(pairs, cap)
    row = butterfly.butterfly_stats(e, max_right_deg=cap).collect()[0]
    assert row.n_edges == len(ok) and row.butterflies == bf
    over = {r.right for r in butterfly.butterfly_overflow(e, max_right_deg=cap).collect()}
    rdeg = {}
    for _, r in pairs:
        rdeg[r] = rdeg.get(r, 0) + 1
    assert over == {r for r, d in rdeg.items() if d > cap} != set()

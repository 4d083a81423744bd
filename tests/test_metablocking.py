"""Meta-blocking: pure-Python parity on a hand-built corpus, purge
routing of the mega cluster, WNP monotonicity and non-vacuity."""

from itertools import combinations

from pyspark.sql import functions as F

from hebrew_ner_spark.operators import dedup, metablocking

SF = "/root/testdata/sf0.001"


def _py_metablock(texts, cap):
    """Reference meta-blocking in pure Python: shingle blocks -> purge
    -> CBS -> both-ends integer-mean WNP."""
    k = dedup.SHINGLE_K
    blocks = {}
    for did, text in texts.items():
        toks = text.split(" ")
        for i in range(len(toks) - k + 1):
            blocks.setdefault(" ".join(toks[i : i + k]), set()).add(did)
    cbs = {}
    for mem in blocks.values():
        if 1 < len(mem) <= cap:
            for a, b in combinations(sorted(mem), 2):
                cbs[(a, b)] = cbs.get((a, b), 0) + 1
    sw, dg = {}, {}
    for (a, b), w in cbs.items():
        for v in (a, b):
            sw[v] = sw.get(v, 0) + w
            dg[v] = dg.get(v, 0) + 1
    kept = {
        (a, b): w
        for (a, b), w in cbs.items()
        if w * dg[a] >= sw[a] and w * dg[b] >= sw[b]
    }
    purged = {bl: len(mem) for bl, mem in blocks.items() if len(mem) > cap}
    return kept, purged


def _toy_docs(spark):
    rows = [
        # near-dup pair: long shared run -> many common shingle blocks
        (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (1, "alpha beta gamma delta epsilon zeta eta theta iota mu"),
        # weak collision with 0/1: one shared shingle only
        (2, "nu xi alpha beta gamma omicron pi rho sigma tau"),
        # unrelated
        (3, "upsilon phi chi psi omega one two three four five"),
        # boilerplate clones (purged at cap=3: their shingles have df 4)
        (10, "spam spam spam spam spam spam"),
        (11, "spam spam spam spam spam spam"),
        (12, "spam spam spam spam spam spam"),
        (13, "spam spam spam spam spam spam"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_parity_and_purge_routing(spark):
    docs = _toy_docs(spark)
    cap = 3
    texts = {r.doc_id: r.text for r in docs.collect()}
    want_edges, want_purged = _py_metablock(texts, cap)

    got_purged = {
        r.block: r.n_docs
        for r in metablocking.purged_block_report(docs, cap).collect()
    }
    assert got_purged == want_purged
    # the clone cluster's block is purged (df=4 > cap)...
    assert "spam spam spam" in got_purged
    # ...so clones contribute ZERO pairs: covered by exact dedup instead
    edges = {
        (r.doc_a, r.doc_b): r.cbs
        for r in metablocking.wnp_pruned(docs, cap).collect()
    }
    assert edges == want_edges
    assert all(a < 10 and b < 10 for a, b in edges)
    groups = dedup.exact_dup_groups(docs).collect()
    assert {(g.n_docs, g.canonical_doc_id) for g in groups} == {(4, 10)}


def test_wnp_subset_of_cbs_and_nonvacuous(spark):
    docs = _toy_docs(spark)
    cap = 3
    cbs = {
        (r.doc_a, r.doc_b): r.cbs for r in metablocking.cbs_edges(docs, cap).collect()
    }
    kept = {
        (r.doc_a, r.doc_b): r.cbs for r in metablocking.wnp_pruned(docs, cap).collect()
    }
    assert set(kept) <= set(cbs)
    assert all(cbs[p] == w for p, w in kept.items())
    # pruning does real work: the weak (2)-edges lose to the strong 0-1 edge
    assert (0, 1) in kept
    assert len(kept) < len(cbs)


def test_corpus_prune_rate(spark):
    """On the real corpus the WNP pass must cut the candidate volume
    substantially (the whole point of meta-blocking) while keeping the
    strongest edges."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    cbs = metablocking.cbs_edges(docs)
    kept = metablocking.wnp_pruned(docs)
    n_cbs, n_kept = cbs.count(), kept.count()
    assert 0 < n_kept < n_cbs / 2
    top = cbs.orderBy(F.desc("cbs")).first()
    assert kept.where(
        (F.col("doc_a") == top.doc_a) & (F.col("doc_b") == top.doc_b)
    ).count() == 1

"""Threshold-greedy max coverage: python schedule parity and the
batch-admission semantics pinned on a crafted set system."""

from hebrew_ner_spark.operators import maxcover


def _py_schedule(pairs, k, rounds):
    """Replay the exact descending-thresholds batch schedule."""
    sets = {}
    for e, d in pairs:
        sets.setdefault(e, set()).add(d)
    covered, picks = set(), []
    tau0 = None
    for t in range(rounds):
        gains = {
            e: len(ds - covered)
            for e, ds in sets.items()
            if e not in {p[1] for p in picks}
        }
        if tau0 is None:
            tau0 = max(gains.values())
        tau = tau0 // (2 ** t)
        if tau < 1 or len(picks) >= k:
            continue
        cand = sorted(
            ((g, e) for e, g in gains.items() if g >= tau),
            key=lambda ge: (-ge[0], ge[1]),
        )[: k - len(picks)]
        base = len(picks)
        for i, (g, e) in enumerate(cand, 1):
            picks.append((base + i, e, g, tau))
        for _, e in cand:
            covered |= sets[e]
    return picks, covered


def test_corpus_schedule_parity(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sets = maxcover.entity_doc_sets(docs)
    pairs = [(r.entity, r.doc_id) for r in sets.collect()]
    want, covered = _py_schedule(pairs, maxcover.MC_K, maxcover.MC_ROUNDS)
    got = sorted(
        (r.pick_rank, r.entity, r.gain, r.tau)
        for r in maxcover.threshold_greedy_cover(sets).collect()
    )
    assert got == sorted(want)
    # greedy property: first pick is the globally largest set
    best = max({e for e, _ in pairs},
               key=lambda e: (sum(1 for x, _ in pairs if x == e), ))
    sizes = {}
    for e, d in pairs:
        sizes[e] = sizes.get(e, 0) + 1
    assert got[0][1] == max(sizes, key=lambda e: (sizes[e], ))


def test_batch_admission_semantics(spark):
    """Two disjoint size-8 sets + one size-5: both 8s admitted in the
    first batch (round-start gains), the 5 only once tau decays."""
    pairs = (
        [("a", i) for i in range(8)]
        + [("b", 100 + i) for i in range(8)]
        + [("c", 200 + i) for i in range(5)]
    )
    sets = spark.createDataFrame(pairs, ["entity", "doc_id"])
    rows = sorted(
        (r.pick_rank, r.entity, r.gain, r.tau)
        for r in maxcover.threshold_greedy_cover(sets, k=3).collect()
    )
    assert rows[0] == (1, "a", 8, 8) and rows[1] == (2, "b", 8, 8)
    assert rows[2][1] == "c" and rows[2][3] < 8


def test_sweep_exhaustion_guard(spark):
    """ADVICE r4: a round budget that stops the tau sweep above 1 while
    positive-gain candidates remain must raise, not silently return a
    short pick list; a genuinely exhausted universe stays silent."""
    import pytest

    # a(16 docs) picked in round 0; b(3 docs) never clears tau in 2
    # rounds (16, 8) -> truncation with b still admissible -> raise
    pairs = [("a", i) for i in range(16)] + [("b", 100 + i) for i in range(3)]
    sets = spark.createDataFrame(pairs, ["entity", "doc_id"])
    with pytest.raises(RuntimeError, match="sweep"):
        maxcover.threshold_greedy_cover(sets, k=2, rounds=2)

    # two sets, k = 3: both picked in round 0, nothing admissible
    # remains -> 2 picks, no raise even though the sweep stops at 5
    pairs = [("a", i) for i in range(10)] + [("b", 100 + i) for i in range(10)]
    sets = spark.createDataFrame(pairs, ["entity", "doc_id"])
    got = maxcover.threshold_greedy_cover(sets, k=3, rounds=2).collect()
    assert sorted(r.entity for r in got) == ["a", "b"]

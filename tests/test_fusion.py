"""Knowledge-fusion invariants (operators/fusion.py): equality with an
independent Python replay of the integer mutual-reinforcement rounds,
corroboration monotonicity on a planted corpus, and per-host vote dedup
(a host asserting the same fact on many pages still votes once)."""

from __future__ import annotations

from hebrew_ner_spark.operators.fusion import (
    FUSION_ITERS,
    FUSION_SCALE,
    fact_confidences,
    source_reliability,
)

# (host, subj, pred, obj): f1 is corroborated by three hosts, f2 rides a
# host that also asserts the popular fact, f3 is a singleton from a host
# that asserts nothing else.
ROWS = [
    ("h1", "a", "likes", "b"),
    ("h2", "a", "likes", "b"),
    ("h3", "a", "likes", "b"),
    ("h1", "c", "likes", "d"),
    ("h4", "e", "likes", "f"),
]


def _assertions(spark, rows):
    return spark.createDataFrame(
        rows, "host string, subj string, pred string, obj string"
    )


def _replay(rows, iters=FUSION_ITERS):
    facts = sorted({r[1:] for r in rows})
    hosts = sorted({r[0] for r in rows})
    asserts = sorted(set(rows))
    rel = {h: FUSION_SCALE for h in hosts}
    conf = {}

    def rescale(raw, keys):
        mx = max(max(raw.values(), default=0), 1)
        return {k: (raw.get(k, 0) * FUSION_SCALE) // mx for k in keys}

    for _ in range(iters):
        c_raw = {f: sum(rel[h] for h, *g in asserts if tuple(g) == f) for f in facts}
        conf = rescale(c_raw, facts)
        r_raw = {}
        for h in hosts:
            mine = [conf[tuple(g)] for hh, *g in asserts if hh == h]
            r_raw[h] = sum(mine) // len(mine)
        rel = rescale(r_raw, hosts)
    n_hosts = {f: sum(1 for h, *g in asserts if tuple(g) == f) for f in facts}
    n_facts = {h: sum(1 for hh, *_ in asserts if hh == h) for h in hosts}
    return (
        {f: (n_hosts[f], conf[f]) for f in facts},
        {h: (n_facts[h], rel[h]) for h in hosts},
    )


def test_matches_independent_replay(spark):
    want_f, want_h = _replay(ROWS)
    got_f = {
        (r.subj, r.pred, r.obj): (r.n_hosts, r.conf_1e6)
        for r in fact_confidences(_assertions(spark, ROWS)).collect()
    }
    assert got_f == want_f
    got_h = {
        r.host: (r.n_facts, r.rel_1e6)
        for r in source_reliability(_assertions(spark, ROWS)).collect()
    }
    assert got_h == want_h


def test_corroboration_orders_confidence(spark):
    conf = {
        (r.subj, r.pred, r.obj): r.conf_1e6
        for r in fact_confidences(_assertions(spark, ROWS)).collect()
    }
    # the 3-host fact tops out at SCALE; the singleton from the host that
    # also asserts it inherits reliability and beats the isolated singleton
    assert conf[("a", "likes", "b")] == FUSION_SCALE
    assert conf[("c", "likes", "d")] > conf[("e", "likes", "f")]


def test_duplicate_assertions_vote_once(spark):
    spammed = ROWS + [("h4", "e", "likes", "f")] * 5
    base_f = fact_confidences(_assertions(spark, ROWS)).collect()
    spam_f = fact_confidences(_assertions(spark, spammed)).collect()
    key = lambda rows: sorted((r.subj, r.pred, r.obj, r.n_hosts, r.conf_1e6) for r in rows)  # noqa: E731
    assert key(base_f) == key(spam_f)



def test_source_diversity_closed_form(spark):
    from hebrew_ner_spark.operators.fusion import fact_source_diversity

    # fact X: h1(.net) x3 pages + h2(.org) x1 -> herf = 1e6*(9+1)/16
    # fact Y: one host, one page -> herf = 1e6 exactly
    # fact Z: nh=(1,2) same tld -> (2*5e6+9)//18 = 555556 (half-up)
    rows = (
        [("a.net", "x", "p", "y")] * 3
        + [("b.org", "x", "p", "y")]
        + [("a.net", "s", "p", "t")]
        + [("a.net", "u", "p", "v"), ("c.net", "u", "p", "v"), ("c.net", "u", "p", "v")]
    )
    got = {
        (r.subj, r.obj): (r.n_pages, r.n_hosts, r.n_tlds, r.herf_1e6)
        for r in fact_source_diversity(_assertions(spark, rows)).collect()
    }
    assert got == {
        ("x", "y"): (4, 2, 2, 625000),
        ("s", "t"): (1, 1, 1, 1000000),
        ("u", "v"): (3, 2, 1, 555556),
    }


def test_resolve_facts_argmax_and_alternatives(spark):
    from hebrew_ner_spark.operators import fusion
    # slot (a, born_in): obj x asserted by 3 hosts, obj y by 1 ->
    # x wins with 2 alternatives recorded; slot (b, born_in) unanimous.
    rows_ = [
        ("h1", "a", "born_in", "x"), ("h2", "a", "born_in", "x"),
        ("h3", "a", "born_in", "x"), ("h4", "a", "born_in", "y"),
        ("h1", "b", "born_in", "z"),
    ]
    a = spark.createDataFrame(rows_, "host string, subj string, pred string, obj string")
    got = {
        (r["subj"], r["pred"]): (r["obj"], r["n_alternatives"])
        for r in fusion.resolve_facts(a).collect()
    }
    assert got[("a", "born_in")] == ("x", 2)
    assert got[("b", "born_in")] == ("z", 1)
    # winner's confidence dominates: replay via fact_confidences
    conf = {
        (r["subj"], r["pred"], r["obj"]): r["conf_1e6"]
        for r in fusion.fact_confidences(a).collect()
    }
    assert conf[("a", "born_in", "x")] > conf[("a", "born_in", "y")]


def test_resolve_facts_tie_breaks_deterministically(spark):
    from hebrew_ner_spark.operators import fusion
    # two objs with identical evidence: max obj string wins (pinned)
    rows_ = [("h1", "s", "p", "alpha"), ("h2", "s", "p", "beta")]
    a = spark.createDataFrame(rows_, "host string, subj string, pred string, obj string")
    got = fusion.resolve_facts(a).collect()
    assert len(got) == 1 and got[0]["obj"] == "beta"

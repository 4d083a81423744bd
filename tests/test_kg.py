"""KG-chain unit tests on hand-built fixtures + sf0.001 sanity."""

import pytest

from hebrew_ner_spark.operators import kg
from hebrew_ner_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        # ents: key, order, table, customer; preds: join, sort
        (0, "the key join order fast"),
        (1, "customer table key"),  # one 3-token span
        (2, "sort sort sort"),  # no mentions, no triples
        (3, "key join order sort table"),  # two triples sharing tokens
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_doc_tokens(tiny):
    got = rows(kg.doc_tokens(tiny).where("doc_id = 0"), "word_index", "token")
    assert got == [(0, "the"), (1, "key"), (2, "join"), (3, "order"), (4, "fast")]


def test_biose_labels(tiny):
    got = rows(kg.doc_token_labels(tiny).where("doc_id = 1"), "word_index", "label")
    assert got == [(0, "B-TERM"), (1, "I-TERM"), (2, "E-TERM")]
    got0 = rows(kg.doc_token_labels(tiny).where("doc_id = 0"), "word_index", "label")
    assert got0 == [(0, "O"), (1, "S-TERM"), (2, "O"), (3, "S-TERM"), (4, "O")]


def test_mention_spans(tiny):
    got = rows(kg.mention_spans(tiny), "doc_id", "lo", "hi", "surface")
    assert (1, 0, 2, "customer table key") in got
    assert (0, 1, 1, "key") in got
    assert (0, 3, 3, "order") in got
    assert not any(r[0] == 2 for r in got)


def test_triples(tiny):
    got = rows(kg.doc_triples(tiny), "doc_id", "subj", "pred", "obj")
    assert got == [
        (0, "key", "join", "order"),
        (3, "key", "join", "order"),
        (3, "order", "sort", "table"),
    ]


def test_triple_counts_salted_equals_plain(tiny):
    plain = rows(kg.triple_counts(tiny), "subj", "pred", "obj", "n_evidence")
    salted = rows(kg.triple_counts(tiny, salt_buckets=4), "subj", "pred", "obj", "n_evidence")
    assert plain == salted == [
        ("key", "join", "order", 2),
        ("order", "sort", "table", 1),
    ]


def test_sf0001_counts(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    assert kg.doc_triples(docs).count() == 1920  # pinned vs DuckDB oracle
    nodes = kg.entity_nodes(docs).collect()
    assert len(nodes) == 18
    assert all(r.n_mentions >= r.n_docs > 0 for r in nodes)


def test_graph_diff_statuses(spark):
    from hebrew_ner_spark.operators.linking import graph_diff

    schema = "subj_id long, pred string, obj_id long, n_evidence long"
    old = spark.createDataFrame(
        [(1, "join", 2, 5), (1, "join", 3, 2), (2, "merge", 3, 1)], schema
    )
    new = spark.createDataFrame(
        [(1, "join", 2, 5), (1, "join", 3, 7), (4, "scan", 1, 1)], schema
    )
    got = {(r.subj_id, r.pred, r.obj_id): (r.n_old, r.n_new, r.status)
           for r in graph_diff(old, new).collect()}
    assert got == {
        (1, "join", 3): (2, 7, "changed"),
        (2, "merge", 3): (1, 0, "removed"),
        (4, "scan", 1): (0, 1, "added"),
    }  # the unchanged (1, join, 2) edge is filtered out


class TestPredDomains:
    def test_closed_form_dominants(self, spark):
        # 'scan': 2x AGENT subj, 1x DATA subj; objects all DATA.
        # 'sort': 1x KEY subj; object KEY.
        docs = spark.createDataFrame(
            [
                (1, "customer scan table"),
                (2, "query scan row"),
                (3, "data scan value"),
                (4, "key sort window"),
            ],
            ["doc_id", "text"],
        )
        from hebrew_ner_spark.operators.kg import pred_domains

        got = {r.pred: r for r in pred_domains(docs).collect()}
        assert got["scan"].n_triples == 3
        assert got["scan"].domain_type == "AGENT"
        assert got["scan"].domain_share_1e6 == 666667
        assert got["scan"].range_type == "DATA"
        assert got["scan"].range_share_1e6 == 1000000
        assert (got["sort"].domain_type, got["sort"].range_type) == ("KEY", "KEY")

    def test_tie_breaks_by_type_name(self, spark):
        # 1 AGENT subj vs 1 KEY subj for 'join' -> AGENT wins (lexical)
        docs = spark.createDataFrame(
            [(1, "customer join table"), (2, "key join table")],
            ["doc_id", "text"],
        )
        from hebrew_ner_spark.operators.kg import pred_domains

        [r] = pred_domains(docs).collect()
        assert r.domain_type == "AGENT" and r.domain_share_1e6 == 500000


class TestDomainViolations:
    def test_minority_class_triples_flagged(self, spark):
        # 'scan' domain induced AGENT (2 vs 1); the DATA-subject triple is
        # the violation; objects are all DATA so no range violations
        docs = spark.createDataFrame(
            [
                (1, "customer scan table"),
                (2, "query scan row"),
                (3, "data scan value"),
            ],
            ["doc_id", "text"],
        )
        from hebrew_ner_spark.operators.kg import domain_violations

        rows = domain_violations(docs).collect()
        assert len(rows) == 1
        [v] = rows
        assert (v.subj, v.pred, v.obj) == ("data", "scan", "value")
        assert v.violates_domain and not v.violates_range
        assert v.stype == "DATA" and v.domain_type == "AGENT"

    def test_uniform_corpus_has_no_violations(self, spark):
        docs = spark.createDataFrame(
            [(i, "customer scan table") for i in range(5)], ["doc_id", "text"]
        )
        from hebrew_ner_spark.operators.kg import domain_violations

        assert domain_violations(docs).count() == 0


class TestFactDecay:
    def test_halving_per_elapsed_half_life(self, spark):
        from pyspark.sql import functions as F

        from hebrew_ner_spark.operators.kg import fact_decay

        # fact A sighted at t=0 and t=2d (2 sightings, fresh at corpus
        # clock 2d); fact B sighted only at t=0 (age 2 half-lives)
        pages = spark.createDataFrame(
            [
                ("u1", 0, "customer scan table"),
                ("u1", 2 * 86_400_000, "customer scan table"),
                ("u2", 0, "query sort window"),
            ],
            ["url", "ms", "text"],
        ).select("url", F.timestamp_millis("ms").alias("warc_ts"), "text")
        got = {(r.subj, r.pred, r.obj): r for r in fact_decay(pages).collect()}
        a = got[("customer", "scan", "table")]
        b = got[("query", "sort", "window")]
        assert (a.n_sightings, a.age_half_lives, a.decayed_1e6) == (2, 0, 2_000_000)
        assert (b.n_sightings, b.age_half_lives, b.decayed_1e6) == (1, 2, 250_000)

    def test_shift_caps_at_62(self, spark):
        from pyspark.sql import functions as F

        from hebrew_ner_spark.operators.kg import fact_decay

        pages = spark.createDataFrame(
            [("u1", 0, "customer scan table"), ("u2", 70 * 86_400_000, "query sort window")],
            ["url", "ms", "text"],
        ).select("url", F.timestamp_millis("ms").alias("warc_ts"), "text")
        got = {(r.subj): r for r in fact_decay(pages).collect()}
        old = got["customer"]
        assert old.age_half_lives == 70 and old.decayed_1e6 == 0  # no overflow


class TestEntitySalience:
    def test_closed_form_ranking(self, spark):
        from hebrew_ner_spark.operators.kg import entity_salience

        # row x3 (first at 1), key x3 (first at 0) -> key wins the tie on
        # first_pos; table x1 third; 'scan'/'the' are not entities
        text = "key row the key row scan key row table"
        docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
        got = [
            (r.entity, r.n_mentions, r.first_pos, r.rank)
            for r in entity_salience(docs).orderBy("rank").collect()
        ]
        assert got == [("key", 3, 0, 1), ("row", 3, 1, 2), ("table", 1, 8, 3)]

    def test_k_bound_and_no_entity_doc(self, spark):
        from hebrew_ner_spark.operators.kg import entity_salience

        docs = spark.createDataFrame(
            [(0, "key row table value batch line"), (1, "the a scan sort")],
            "doc_id long, text string",
        )
        out = entity_salience(docs).toPandas()
        assert set(out.doc_id) == {0}          # doc 1 has no entities
        assert out["rank"].max() <= 3 and len(out) == 3


class TestTripleProvenance:
    def test_substring_roundtrip(self, spark):
        from hebrew_ner_spark.operators.kg import triple_provenance

        text = "the key join table scan row merge value"
        docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
        out = triple_provenance(docs).collect()
        # key join table; table scan row; row merge value
        assert len(out) == 3
        for r in out:
            assert text[r.subj_start : r.subj_start + len(r.subj)] == r.subj
            assert text[r.pred_start : r.pred_start + len(r.pred)] == r.pred
            assert text[r.obj_start : r.obj_start + len(r.obj)] == r.obj
        first = [r for r in out if r.word_index == 2][0]
        assert (first.subj, first.pred, first.obj) == ("key", "join", "table")
        assert (first.subj_start, first.pred_start, first.obj_start) == (4, 8, 13)

    def test_provenance_matches_doc_triples(self, spark):
        from hebrew_ner_spark.operators.kg import doc_triples, triple_provenance

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        a = {tuple(r) for r in doc_triples(docs).collect()}
        b = {
            (r.doc_id, r.word_index, r.subj, r.pred, r.obj)
            for r in triple_provenance(docs).collect()
        }
        assert a == b


class TestBgpOptional:
    def test_optional_binding_and_sentinel(self, spark):
        from hebrew_ner_spark.operators.kg import bgp_match_optional

        docs = spark.createDataFrame(
            [
                (0, "key join table"),            # y=table, no merge from table
                (1, "row join value"),            # y=value, merges below
                (2, "value merge part"),
                (3, "value merge batch"),
            ],
            "doc_id long, text string",
        )
        out = {
            (r.x, r.y, r.z, r.n_witness, r.n_opt)
            for r in bgp_match_optional(docs).collect()
        }
        assert out == {
            ("key", "table", "", 1, 0),          # OPTIONAL unmatched -> sentinel
            ("row", "value", "part", 1, 1),      # fan-out on two optional matches
            ("row", "value", "batch", 1, 1),
        }


class TestRdfsTypes:
    def test_closure_depths(self, spark):
        from hebrew_ner_spark.operators.kg import type_closure

        got = {(r.sub, r.super): r.dist for r in type_closure(spark).collect()}
        assert got[("AGENT", "ACTOR")] == 1
        assert got[("AGENT", "THING")] == 2
        assert got[("DATA", "ARTIFACT")] == 1
        assert got[("DATA", "THING")] == 2
        assert got[("ARTIFACT", "THING")] == 1
        assert ("THING", "THING") not in got  # closure is irreflexive

    def test_inference_per_entity(self, spark):
        from hebrew_ner_spark.operators.kg import rdfs_entity_types

        docs = spark.createDataFrame(
            [(0, "spark join table spark")], "doc_id long, text string"
        )
        got = {
            (r.entity, r.typ): (r.depth, r.n_mentions)
            for r in rdfs_entity_types(docs).collect()
        }
        # spark: AGENT(0) -> ACTOR(1) -> THING(2), 2 mentions
        assert got[("spark", "AGENT")] == (0, 2)
        assert got[("spark", "ACTOR")] == (1, 2)
        assert got[("spark", "THING")] == (2, 2)
        # table: DATA(0) -> ARTIFACT(1) -> THING(2), 1 mention
        assert got[("table", "DATA")] == (0, 1)
        assert got[("table", "ARTIFACT")] == (1, 1)
        assert got[("table", "THING")] == (2, 1)
        assert len(got) == 6


def test_functional_conflicts_closed_form(spark):
    """Hand fact table: 'key_pred' is functional (3 subjects, one with a
    conflict) -> one review row with the evidence-max keeper; 'multi'
    fails the threshold and emits nothing even though subjects conflict."""
    from hebrew_ner_spark.operators import kg as kgo

    rows = [
        ("key_pred", "s1", "a", 5),
        ("key_pred", "s1", "b", 2),   # conflict; keeper = a (5 > 2)
        ("key_pred", "s2", "c", 1),
        ("key_pred", "s3", "d", 1),
        ("multi", "t1", "x", 1),
        ("multi", "t1", "y", 1),
        ("multi", "t1", "z", 1),
        ("multi", "t2", "x", 1),
        ("multi", "t2", "y", 1),
        ("multi", "t2", "z", 1),
    ]
    facts = spark.createDataFrame(
        rows, "pred string, subj string, obj string, n_evidence long"
    )
    # key_pred: 3 subj / 4 pairs = 0.75 >= 0.5; multi: 2/6 = 0.33 < 0.5
    out = kgo.functional_conflicts(facts).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.pred, r.subj, r.n_obj, r.keep_obj, r.n_keep, r.n_total) == (
        "key_pred", "s1", 2, "a", 5, 7,
    )


def test_functional_conflicts_keeper_tie_order(spark):
    """Equal evidence -> lexicographically smallest object wins."""
    from hebrew_ner_spark.operators import kg as kgo

    rows = [
        ("p", "s", "beta", 3),
        ("p", "s", "alpha", 3),
        ("p", "u", "x", 1),
        ("p", "v", "x", 1),
        ("p", "w", "x", 1),
    ]
    facts = spark.createDataFrame(
        rows, "pred string, subj string, obj string, n_evidence long"
    )
    r = kgo.functional_conflicts(facts).collect()[0]
    assert r.keep_obj == "alpha" and r.n_keep == 3


def test_rule_inference_completion(spark):
    # body: (?x join ?y)(?y merge ?z) => head (?x scan ?z)
    # x=key: join->{table,group}; table merge data, group merge data,
    # table merge hash => implied (key,scan,data) n_paths=2 (via table, group)
    # and (key,scan,hash) n_paths=1; (key,scan,hash) already in KG -> dropped.
    docs = spark.createDataFrame(
        [
            (0, "key join table fast table merge data"),
            (1, "key join group fast group merge data"),
            (2, "table merge hash fast key scan hash"),
            (3, "key join table"),  # duplicate leg: distinct binding grain
        ],
        "doc_id long, text string",
    )
    got = sorted(
        (r.subj, r.pred, r.obj, r.n_paths)
        for r in kg.rule_inference(docs).collect()
    )
    assert got == [("key", "scan", "data", 2)]


def test_pred_paraphrase_jaccard(spark):
    # join pairs: {(key,table),(key,group)}; merge pairs: {(key,table),
    # (table,data)}; scan pairs: {(key,table)} (duplicated evidence -> one
    # distinct pair). join~merge: inter=1, union=3 -> 333333;
    # join~scan: inter=1, union=2 -> 500000; merge~scan: 1/2 -> 500000.
    docs = spark.createDataFrame(
        [
            (0, "key join table fast key join group"),
            (1, "key merge table fast table merge data"),
            (2, "key scan table fast key scan table"),
        ],
        "doc_id long, text string",
    )
    got = sorted(
        (r.pred_a, r.pred_b, r.c_a, r.c_b, r.c_both, r.jac_1e6)
        for r in kg.pred_paraphrase(docs).collect()
    )
    assert got == [
        ("join", "merge", 2, 2, 1, 333333),
        ("join", "scan", 2, 1, 1, 500000),
        ("merge", "scan", 2, 1, 1, 500000),
    ]


def test_extractor_noisy_or_fixed_point(spark):
    # "key join table" fires svo only -> conf = prior(svo) = 900000.
    # "key join x table" (filler) fires svo_gap_obj only -> 700000.
    # both contexts for the same triple -> noisy-OR:
    #   acc = 100000 * 1e6/1e6 ... fold order svo, gap_subj, gap_obj:
    #   (100000 * 300000) // 1e6 = 30000 -> conf = 970000.
    docs = spark.createDataFrame(
        [
            (0, "key join table"),
            (1, "key join the table"),
            (2, "group merge data"),
            (3, "key group"),     # appos -> 500000
            (4, "fast group"),    # has_attr -> 600000
        ],
        "doc_id long, text string",
    )
    got = {
        (r.subj, r.pred, r.obj): (r.n_patterns, r.conf_1e6)
        for r in kg.extractor_noisy_or(docs).collect()
    }
    assert got[("key", "join", "table")] == (2, 970000)
    assert got[("group", "merge", "data")] == (1, 900000)
    assert got[("key", "appos", "group")] == (1, 500000)
    assert got[("group", "has_attr", "fast")] == (1, 600000)


def test_fact_intervals_gaps_and_islands(spark, tiny):
    # doc 4 (≡1 mod 3) is in crawls {0,1,3}: its unique fact gets a gap
    # (two intervals); docs 0/3 (≡0 mod 3) are in crawls {1,2}: one run.
    docs = tiny.union(
        spark.createDataFrame([(4, "data merge group")], "doc_id long, text string")
    )
    got = rows(
        kg.fact_intervals(kg.synth_fact_snapshots(docs)),
        "subj", "pred", "obj", "v_from", "v_to", "n_snaps", "is_current",
    )
    assert got == [
        ("data", "merge", "group", 0, 1, 2, 0),
        ("data", "merge", "group", 3, 3, 1, 1),
        ("key", "join", "order", 1, 2, 2, 0),
        ("order", "sort", "table", 1, 2, 2, 0),
    ]


def test_fact_intervals_union_covers_gap(spark):
    # The same fact from docs ≡1 and ≡2 mod 3 has union presence
    # {0,1,3} ∪ {0,2,3} = all four crawls -> one continuous interval.
    docs = spark.createDataFrame(
        [(1, "data merge group"), (2, "data merge group")],
        "doc_id long, text string",
    )
    got = rows(
        kg.fact_intervals(kg.synth_fact_snapshots(docs)),
        "subj", "pred", "obj", "v_from", "v_to", "n_snaps", "is_current",
    )
    assert got == [("data", "merge", "group", 0, 3, 4, 1)]


def test_fact_intervals_plan_is_join_free(tiny):
    plan = kg.fact_intervals(
        kg.synth_fact_snapshots(tiny)
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # window + agg only: shuffles keyed by fact


def test_facts_asof_picks_covering_interval(spark):
    # doc 4 fact present in crawls {0,1,3}: intervals [0,1] and [3,3];
    # crawl 2 covers NEITHER -> absent. Docs 0/3 facts live in {1,2}.
    docs = spark.createDataFrame(
        [(3, "key join order sort table"), (4, "data merge group")],
        "doc_id long, text string",
    )
    got = rows(
        kg.facts_asof(kg.synth_fact_snapshots(docs), 2),
        "subj", "pred", "obj", "v_from", "v_to",
    )
    assert got == [
        ("key", "join", "order", 1, 2),
        ("order", "sort", "table", 1, 2),
    ]
    got3 = rows(
        kg.facts_asof(kg.synth_fact_snapshots(docs), 3),
        "subj", "pred", "obj", "v_from", "v_to",
    )
    assert ("data", "merge", "group", 3, 3) in got3


def test_retract_on_delete_counts(spark):
    # doc 23 is deleted (23 % 23 == 0); doc 3 is kept. The shared fact
    # loses one voice; the doc-23-only fact retracts.
    docs = spark.createDataFrame(
        [(3, "key join order"), (23, "key join order"), (23, "data merge group")],
        "doc_id long, text string",
    )
    got = rows(
        kg.retract_on_delete(docs),
        "subj", "pred", "obj", "n_before", "n_after", "retracted",
    )
    assert ("key", "join", "order", 2, 1, 0) in got
    assert ("data", "merge", "group", 1, 0, 1) in got


def test_retract_on_delete_no_deletions_is_identity(spark):
    docs = spark.createDataFrame(
        [(1, "key join order"), (2, "key join order")],
        "doc_id long, text string",
    )
    for r in kg.retract_on_delete(docs).collect():
        assert r["n_before"] == r["n_after"] and r["retracted"] == 0


def test_interval_delta_extends_opens_and_passes_through(spark):
    from pyspark.sql import functions as F

    # doc 4's fact: crawls {0,1,3} -> prev intervals [0,1] (closed);
    # crawl 3 re-opens a NEW interval [3,3]. Docs 0/3 facts: crawls
    # {1,2} -> open at v_to=2 but NOT asserted at 3 -> unchanged, not
    # current. A fact in {2,3} extends.
    docs = spark.createDataFrame(
        [(3, "key join order sort table"), (4, "data merge group"),
         (1, "alpha beta gamma")],  # no triples -> irrelevant
        "doc_id long, text string",
    )
    snaps = kg.synth_fact_snapshots(docs)
    prev = kg.fact_intervals(snaps.where(F.col("v") < 3), n_versions=4)
    got = rows(
        kg.fact_intervals_delta(prev, snaps.where(F.col("v") == 3), 3),
        "subj", "pred", "obj", "v_from", "v_to", "n_snaps", "is_current",
    )
    full = rows(
        kg.fact_intervals(snaps),
        "subj", "pred", "obj", "v_from", "v_to", "n_snaps", "is_current",
    )
    assert got == full
    assert ("data", "merge", "group", 3, 3, 1, 1) in got     # re-opened
    assert ("data", "merge", "group", 0, 1, 2, 0) in got     # closed kept
    assert ("key", "join", "order", 1, 2, 2, 0) in got       # open, stale


def test_interval_delta_equals_full_recompute_on_corpus(spark):
    from pyspark.sql import functions as F

    docs = spark.range(0, 200).selectExpr(
        "id AS doc_id",
        "CASE CAST(id % 3 AS INT) WHEN 0 THEN 'key join order' "
        "WHEN 1 THEN 'data merge group' ELSE 'order sort table key' END AS text",
    )
    snaps = kg.synth_fact_snapshots(docs)
    prev = kg.fact_intervals(snaps.where(F.col("v") < 3), n_versions=4)
    inc = rows(
        kg.fact_intervals_delta(prev, snaps.where(F.col("v") == 3), 3),
        "subj", "pred", "obj", "v_from", "v_to", "n_snaps", "is_current",
    )
    full = rows(
        kg.fact_intervals(snaps),
        "subj", "pred", "obj", "v_from", "v_to", "n_snaps", "is_current",
    )
    assert inc == full


def test_subclass_cycles_planted(spark):
    # 'key' and 'order' always co-occur (mutual containment -> 2-cycle);
    # 'table' appears with them in only 1/4 of docs (one-way, no cycle).
    docs = spark.createDataFrame(
        [(i, "key order" + (" table" if i == 0 else "")) for i in range(4)],
        "doc_id long, text string",
    )
    got = rows(kg.subclass_cycles(docs), "entity", "cycle_id", "cycle_size")
    assert got == [("key", "key", 2), ("order", "key", 2)]


def test_subclass_cycles_dag_is_empty(spark):
    # 'customer' ⊂ 'table' strictly one-way: table appears alone too.
    docs = spark.createDataFrame(
        [(0, "customer table"), (1, "customer table"), (2, "customer table"),
         (3, "table"), (4, "table"), (5, "table")],
        "doc_id long, text string",
    )
    assert kg.subclass_cycles(docs).count() == 0


def test_completeness_capture_closed_form(spark):
    """Hand-built corpus with known capture structure: facts f1 (both
    halves), f2 (even only), f3 (odd only) — Lincoln-Petersen and
    Chapman must hit their closed forms, and the '<all>' row must be
    the exact per-predicate sum."""
    rows = [
        (0, "batch join column"),   # f1 in even
        (1, "batch join column"),   # f1 in odd
        (2, "batch join data"),     # f2 even only
        (3, "column join data"),    # f3 odd only
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.pred: r.asDict() for r in kg.completeness_capture(docs).collect()}
    j = out["join"]
    assert (j["n1"], j["n2"], j["n_both"], j["n_observed"]) == (2, 2, 1, 3)
    assert j["est_lp"] == 4                      # 2*2/1
    assert j["est_chapman"] == (2 * 3 * 3 + 2) // (2 * 2) - 1  # 3*3/2 -1 = 4 (half-up 4.5->5-1)
    a = out[kg.CAPTURE_ALL]
    assert (a["n1"], a["n2"], a["n_both"], a["n_observed"]) == (2, 2, 1, 3)


def test_completeness_capture_zero_overlap_guard(spark):
    """Disjoint captures: est_lp collapses to the 0 sentinel while
    Chapman stays finite — the cross-engine guard the gate exists for."""
    rows = [(0, "batch join column"), (1, "batch join data")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.pred: r.asDict() for r in kg.completeness_capture(docs).collect()}
    j = out["join"]
    assert j["n_both"] == 0 and j["est_lp"] == 0
    assert j["est_chapman"] == (2 * 2 * 2 + 1) // 2 - 1  # (1+1)(1+1)/1 - 1 = 3


class TestBgpCartesianGuard:
    """A disconnected user-supplied BGP pattern forces a cartesian
    product of pair vocabularies; the guard must raise loudly once the
    estimated product exceeds the cap instead of silently planning a
    quadratic blow-up (VERDICT r3 #6)."""

    DISCONNECTED = [("x", "join", "y"), ("z", "sort", "w")]

    def test_raises_when_over_cap(self, tiny, monkeypatch):
        monkeypatch.setattr(kg, "BGP_CARTESIAN_MAX_PAIRS", 0)
        with pytest.raises(ValueError, match="disconnected BGP"):
            kg.bgp_match(tiny, self.DISCONNECTED)

    def test_rule_confidence_guarded(self, tiny, monkeypatch):
        monkeypatch.setattr(kg, "BGP_CARTESIAN_MAX_PAIRS", 0)
        with pytest.raises(ValueError, match="disconnected BGP"):
            kg.rule_confidence(tiny, body=self.DISCONNECTED).collect()

    def test_small_disconnected_still_allowed(self, tiny):
        # under the cap the cartesian is semantically required and runs
        out = kg.bgp_match(tiny, self.DISCONNECTED)
        assert set(out.columns) == {"w", "x", "y", "z", "n_witness"}
        assert out.count() > 0

    def test_connected_default_never_counts(self, tiny, monkeypatch):
        # the guard's count() probes must not run for connected patterns
        monkeypatch.setattr(
            kg,
            "_chain_bgp_leg",
            lambda out, leg, shared: (_ for _ in ()).throw(
                AssertionError("guard helper bypass expected for joins")
            )
            if not shared
            else out.join(leg, shared),
        )
        assert kg.bgp_match(tiny).count() >= 0

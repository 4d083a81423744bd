"""Planted-structure tests for dependency patterns, lift, triangles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hebrew_ner_spark.operators import graphstats, kg


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


def _pat_rows(spark, text):
    df = kg.doc_triples_patterns(_docs(spark, [text]))
    return sorted(
        (r.word_index, r.pattern, r.subj, r.pred, r.obj) for r in df.collect()
    )


class TestDocTriplesPatterns:
    def test_direct_svo(self, spark):
        assert _pat_rows(spark, "key join table") == [(1, "svo", "key", "join", "table")]

    def test_gap_subject(self, spark):
        # ENT FILLER PRED ENT: subject reaches over the filler.
        assert _pat_rows(spark, "key the join table") == [
            (2, "svo_gap_subj", "key", "join", "table")
        ]

    def test_gap_object(self, spark):
        assert _pat_rows(spark, "key join the table") == [
            (1, "svo_gap_obj", "key", "join", "table")
        ]

    def test_appos_and_attr(self, spark):
        assert _pat_rows(spark, "fast key table") == [
            (0, "has_attr", "key", "has_attr", "fast"),
            (1, "appos", "key", "appos", "table"),
        ]

    def test_gap_blocked_by_predicate_filler(self, spark):
        # The gap token must be pure filler: ENT PRED PRED ENT yields
        # neither gap pattern (anchor context tests fail on both sides).
        assert _pat_rows(spark, "key sort join table") == []

    def test_at_most_one_pattern_per_anchor(self, spark):
        # Property: anchor classes are disjoint, so word_index values are
        # unique per doc even in dense entity runs.
        docs = _docs(spark, ["key table join order part merge the fast value row"])
        df = kg.doc_triples_patterns(docs)
        n = df.count()
        assert n == df.select("doc_id", "word_index").distinct().count()

    def test_boundaries_no_out_of_range(self, spark):
        # Predicate at position 0 / end cannot match; single-token docs fine.
        assert _pat_rows(spark, "join key") == []
        assert _pat_rows(spark, "key") == []


class TestCoocLift:
    def test_exact_lift_values(self, spark):
        # 4 docs: {key,table} together twice, key alone once, table alone once.
        docs = _docs(spark, ["key table", "table key", "key", "table"])
        rows = {(r.ea, r.eb): (r.c_ab, r.lift_1e6) for r in graphstats.cooc_lift(docs).collect()}
        # N=4, c_ab=2, c_key=3, c_table=3 -> lift = 4*2/9 = 0.888...
        # floor(888888.88 + 0.5) = 888889
        assert rows == {("key", "table"): (2, 888889)}

    def test_independent_pair_lift_near_one(self, spark):
        # Entities in every doc: lift exactly 1.0 -> 1_000_000.
        docs = _docs(spark, ["key table", "key table", "key table"])
        [r] = graphstats.cooc_lift(docs).collect()
        assert (r.c_ab, r.lift_1e6) == (3, 1000000)


class TestTriangles:
    def test_planted_triangle(self, spark):
        # Build a graph where exactly one heavy triangle survives the
        # above-mean filter: edges (key,table),(key,row),(row,table) x3,
        # plus light one-off edges that fall below the mean.
        heavy = ["key join table", "key join row", "row join table"] * 3
        light = ["part join value", "order join query", "batch join line"]
        docs = _docs(spark, heavy + light)
        rows = sorted(tuple(r) for r in graphstats.triangles(docs).collect())
        assert rows == [("key", "row", "table")]

    def test_no_triangle_in_path_graph(self, spark):
        # Path a-b-c has no triangle even with all edges above mean.
        docs = _docs(spark, ["key join table", "table join row"] * 2)
        assert graphstats.triangles(docs).count() == 0

    def test_each_triangle_emitted_once(self, spark):
        # Complete graph on 4 heavy nodes -> C(4,3)=4 triangles, no dupes.
        ents = ["key", "table", "row", "part"]
        texts = [f"{a} join {b}" for a in ents for b in ents if a < b] * 3
        light = ["order join query", "batch join line", "value join stream"]
        docs = _docs(spark, texts + light)
        rows = [tuple(r) for r in graphstats.triangles(docs).collect()]
        assert len(rows) == len(set(rows)) == 4

    def test_plan_has_no_nested_loop_join(self, spark):
        docs = _docs(spark, ["key join table"])
        plan = graphstats.triangles(docs)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestTypedEdgeCounts:
    def test_salted_equals_plain(self, spark):
        docs = _docs(spark, ["key join table the fast value row", "fast key part merge row"])
        plain = {tuple(r) for r in kg.typed_edge_counts(docs).collect()}
        salted = {tuple(r) for r in kg.typed_edge_counts(docs, salt_buckets=4).collect()}
        assert plain == salted and plain


class TestPaths2Hop:
    def test_planted_paths(self, spark):
        # key->table->row and key->part->row: two mids from key to row.
        docs = _docs(
            spark,
            ["key join table", "table join row", "key join part", "part join row"],
        )
        rows = {(r.a, r.c): r.n_mids for r in graphstats.paths_2hop(docs).collect()}
        assert rows[("key", "row")] == 2
        assert ("key", "key") not in rows  # loops excluded

    def test_mid_counted_once(self, spark):
        # duplicate evidence for the same edge must not inflate n_mids
        docs = _docs(spark, ["key join table", "key join table", "table join row"])
        rows = {(r.a, r.c): r.n_mids for r in graphstats.paths_2hop(docs).collect()}
        assert rows == {("key", "row"): 1}


class TestLabelPropagation:
    def test_two_planted_communities(self, spark):
        # Two dense cliques {key,table,row} and {part,value,order} joined by
        # a single weak bridge; light noise edges drag the mean down so all
        # clique edges survive sparsification but the bridge does not.
        c1 = ["key join table", "key join row", "table join row"] * 4
        c2 = ["part join value", "part join order", "value join order"] * 4
        bridge = ["row join part"]
        noise = ["batch join line", "query join stream", "hash join spark"]
        docs = _docs(spark, c1 + c2 + bridge + noise)
        got = {r.entity: r.community for r in graphstats.label_propagation(docs).collect()}
        comm1 = {got["key"], got["table"], got["row"]}
        comm2 = {got["part"], got["value"], got["order"]}
        assert len(comm1) == 1 and len(comm2) == 1 and comm1 != comm2

    def test_tie_breaks_to_smallest_label(self, spark):
        # Star: key has equal-weight neighbours table and value. Round 1 is
        # a genuine tie at key ({table:3, value:3}) and must resolve to the
        # lexicographically smaller label; the final (deterministic) state
        # is distinguishable from a max-label tie-break, which would leave
        # key in the 'value' community instead.
        docs = _docs(
            spark, ["key join table"] * 3 + ["key join value"] * 3 + ["part join order"]
        )
        got = {r.entity: r.community for r in graphstats.label_propagation(docs).collect()}
        assert got["key"] == "table"

    def test_symmetric_pair_oscillates_deterministically(self, spark):
        # Known synchronous-LPA behaviour (shared with GraphFrames' LPA):
        # an isolated symmetric pair swaps labels every round — period 2,
        # fully deterministic. Pin it so a semantics change is loud.
        docs = _docs(spark, ["key join table"] * 3 + ["part join value"])
        got = {r.entity: r.community for r in graphstats.label_propagation(docs).collect()}
        assert got["key"] == "table" and got["table"] == "key"  # LPA_ITERS is odd


class TestPersistIsolation:
    def test_triangles_and_lpa_do_not_evict_each_other(self, spark):
        heavy = ["key join table", "key join row", "row join table"] * 3
        light = ["part join value", "order join query", "batch join line"]
        docs = _docs(spark, heavy + light)
        tri = graphstats.triangles(docs)        # lazy, persists its edges
        lpa = graphstats.label_propagation(docs)  # must NOT evict tri's
        assert [tuple(r) for r in tri.collect()] == [("key", "row", "table")]
        assert lpa.count() > 0
        # both operators' persisted inputs are still registered
        assert graphstats._PERSISTED["triangles"] and graphstats._PERSISTED["lpa"]


class TestKcorePeel:
    def test_triangle_survives_chain_peels_progressively(self, spark):
        # triangle key-row-table (heavy) + pendant chain table-part-value;
        # light fillers lower the mean so planted edges survive
        # sparsification. k=2: 'value' (deg 1) peels round 0, stranding
        # 'part' at deg 1 -> peels round 1; the triangle is the 2-core.
        heavy = (
            ["key join row", "key join table", "row join table"] * 3
            + ["table join part", "part join value"] * 3
        )
        light = ["batch join line", "order join query", "hash join group"]
        docs = _docs(spark, heavy + light)
        got = {r.entity: r.peel_round for r in graphstats.kcore_peel(docs, k=2).collect()}
        assert got == {"value": 0, "part": 1, "key": -1, "row": -1, "table": -1}

    def test_all_peel_when_k_exceeds_max_degree(self, spark):
        heavy = ["key join row", "key join table", "row join table"] * 3
        light = ["batch join line", "order join query", "hash join group"]
        docs = _docs(spark, heavy + light)
        got = {r.entity: r.peel_round for r in graphstats.kcore_peel(docs, k=5).collect()}
        assert set(got.values()) == {0}  # whole triangle drops in one round

    def test_nonconvergence_raises(self, spark):
        heavy = ["key join row", "key join table", "row join table"] * 3 + [
            "table join part",
            "part join value",
        ] * 3
        light = ["batch join line"]
        docs = _docs(spark, heavy + light)
        with pytest.raises(RuntimeError, match="no fixpoint"):
            graphstats.kcore_peel(docs, k=2, max_rounds=1)


class TestLinkPredRA:
    def test_planted_path_predicts_endpoints(self, spark):
        # heavy path key-table-row; the only non-adjacent candidate pair is
        # (key, row) through center 'table' (deg 2): RA = 1e6 DIV 2.
        heavy = ["key join table", "table join row"] * 3
        light = ["part join value", "order join query", "batch join line"]
        docs = _docs(spark, heavy + light)
        rows = [tuple(r) for r in graphstats.link_pred_ra(docs).collect()]
        assert rows == [("key", "row", 1, 500000)]

    def test_adjacent_pairs_excluded(self, spark):
        # complete heavy triangle: every common-neighbor pair is already an
        # edge, so nothing is predicted.
        heavy = ["key join table", "table join row", "key join row"] * 3
        light = ["part join value", "order join query", "batch join line"]
        docs = _docs(spark, heavy + light)
        assert graphstats.link_pred_ra(docs).count() == 0

    def test_center_degree_cap_drops_hub_evidence(self, spark):
        # star centered on 'table' with 4 leaves: uncapped -> C(4,2)=6
        # candidates at RA = 1e6 DIV 4; capping below the hub degree
        # removes the only wedge center, so no candidates remain.
        heavy = [f"table join {x}" for x in ("key", "row", "part", "value")] * 3
        light = ["order join query", "batch join line", "hash join group"]
        docs = _docs(spark, heavy + light)
        full = graphstats.link_pred_ra(docs).collect()
        assert len(full) == 6 and all(r.ra_1e6 == 250000 for r in full)
        assert graphstats.link_pred_ra(docs, max_center_degree=3).count() == 0


class TestPredicateStats:
    def test_functionality_closed_form(self, spark):
        docs = _docs(
            spark,
            ["key join table", "key join table", "key join row", "row merge table"],
        )
        got = {
            r.pred: (r.n_pairs, r.n_evidence, r.n_subj, r.n_obj, r.fun_1e6, r.inv_fun_1e6)
            for r in kg.predicate_stats(docs).collect()
        }
        # join: pairs {(key,table) ev2, (key,row) ev1}: 1 subj / 2 pairs
        assert got == {
            "join": (2, 3, 1, 2, 500000, 1000000),
            "merge": (1, 1, 1, 1, 1000000, 1000000),
        }


class TestBgpMatch:
    def test_planted_triangle_binding(self, spark):
        docs = _docs(spark, ["key join table", "table merge row", "key scan row"])
        rows = [tuple(r) for r in kg.bgp_match(docs).collect()]
        assert rows == [("key", "table", "row", 1)]

    def test_witness_counts_multiply(self, spark):
        docs = _docs(
            spark,
            ["key join table", "key join table", "table merge row", "key scan row"],
        )
        rows = [tuple(r) for r in kg.bgp_match(docs).collect()]
        assert rows == [("key", "table", "row", 2)]

    def test_open_wedge_matches_nothing(self, spark):
        docs = _docs(spark, ["key join table", "table merge row"])
        assert kg.bgp_match(docs).count() == 0


class TestRuleConfidence:
    def test_closed_form_counts(self, spark):
        # body bindings: (key,table,row) and (part,table,row); head holds
        # for key only; 'part' has no scan edge at all, so PCA drops it
        # from the denominator: conf = 1/2, pca_conf = 1/1.
        docs = _docs(
            spark,
            [
                "key join table",
                "part join table",
                "table merge row",
                "key scan row",
            ],
        )
        r = kg.rule_confidence(docs).collect()[0]
        assert (r.n_body, r.n_support, r.n_pca_body) == (2, 1, 1)
        assert (r.conf_1e6, r.pca_conf_1e6) == (500000, 1000000)

    def test_empty_body_yields_zeroes(self, spark):
        docs = _docs(spark, ["key scan row"])
        r = kg.rule_confidence(docs).collect()[0]
        assert tuple(r) == (0, 0, 0, 0, 0)

    def test_pca_counts_wrong_object_evidence(self, spark):
        # head-subject 'key' HAS a scan edge but to the wrong object:
        # PCA keeps the binding in the denominator (known-incomplete
        # region), so pca_conf = 0/1 while plain conf = 0/1 too.
        docs = _docs(spark, ["key join table", "table merge row", "key scan part"])
        r = kg.rule_confidence(docs).collect()[0]
        assert (r.n_body, r.n_support, r.n_pca_body) == (1, 0, 1)
        assert (r.conf_1e6, r.pca_conf_1e6) == (0, 0)


class TestEntitySummary:
    def test_top_k_and_tie_order(self, spark):
        docs = _docs(
            spark,
            ["key join table"] * 3
            + ["key merge row"] * 2
            + ["key scan row"] * 2
            + ["key agg part"],
        )
        rows = [tuple(r) for r in kg.entity_summary(docs).orderBy("rk").collect()]
        # ties at n=2 break (pred, obj) ascending: merge < scan; k=3 drops agg
        assert rows == [
            ("key", 1, "join", "table", 3),
            ("key", 2, "merge", "row", 2),
            ("key", 3, "scan", "row", 2),
        ]


class TestSubsumption:
    def test_planted_containment(self, spark):
        # 'row' occurs only alongside 'table' (full containment, 4 docs);
        # 'table' also appears alone so the reverse direction is partial.
        docs = _docs(
            spark,
            ["row table key"] * 4 + ["table part"] * 4 + ["key value"] * 4,
        )
        got = {
            (r.hyper, r.hypo): (r.c_hyper, r.c_hypo, r.c_both, r.conf_1e6)
            for r in kg.subsumption_candidates(docs).collect()
        }
        assert got[("table", "row")] == (8, 4, 4, 1000000)
        assert ("row", "table") not in got  # 4/8 containment, below cutoff
        assert ("key", "row") in got  # key co-occurs in all 4 row-docs

    def test_min_docs_guard(self, spark):
        docs = _docs(spark, ["row table key"] * 2 + ["table part"] * 4)
        got = {(r.hyper, r.hypo) for r in kg.subsumption_candidates(docs).collect()}
        assert ("table", "row") not in got  # c_hypo=2 < min_docs


class TestLinkPredEval:
    def _fixture(self, spark):
        # heavy (above-mean) undirected edges: key-table, table-row,
        # key-row (triangle) + table-part (pendant); three one-off light
        # edges set the mean so only the repeated ones survive.
        heavy = [
            "key join table", "table join row", "key join row",
            "table join part",
        ] * 3
        light = ["order join query", "batch join line", "hash join group"]
        return _docs(spark, heavy + light)

    def test_filtered_ranks_closed_form(self, spark):
        # deg: key 2, table 3, row 2, part 1. Scored pairs (ra_1e6):
        #   (key,row) 333333 pos | (key,part) 333333 neg | (part,row)
        #   333333 neg | (row,table) 500000 pos | (key,table) 500000 pos.
        # Filtered ranks: src=key -> table r1, row r2 (the neg 'part'
        # outranks it on dst asc at equal score; the pos 'table' above is
        # filtered); src=row -> table r1, key r1; src=table -> key r1,
        # row r1 (both pos, mutual filtering).
        got = {
            (r.src, r.dst): r.rank
            for r in graphstats.link_pred_ranks(self._fixture(spark)).collect()
        }
        assert got == {
            ("key", "table"): 1, ("key", "row"): 2,
            ("row", "table"): 1, ("row", "key"): 1,
            ("table", "key"): 1, ("table", "row"): 1,
        }

    def test_mrr_hits_closed_form(self, spark):
        # rr_sum = 5*1e6 + 500000; mrr = round(5.5e6/6) = 916667
        m = graphstats.link_pred_mrr(self._fixture(spark)).collect()[0]
        assert (m.n_pos, m.mrr_1e6, m.hits1, m.hits3, m.hits10) == (
            6, 916667, 5, 6, 6,
        )


class TestFactOutliers:
    def test_above_mean_subject_flagged(self, spark):
        # join pairs: key->{table,row,part}, row->{table}; mean = 4/2 = 2
        # objects/subject -> key (3 > 2) flagged, row (1) not.
        docs = _docs(
            spark,
            ["key join table", "key join row", "key join part", "row join table"],
        )
        rows = [tuple(r) for r in kg.fact_outliers(docs).collect()]
        assert rows == [("join", "key", 3, 3)]

    def test_uniform_assertion_yields_nothing(self, spark):
        # every subject exactly at the mean -> strict inequality empty
        docs = _docs(spark, ["key join table", "row join part"])
        assert kg.fact_outliers(docs).count() == 0


class TestPredicateSymmetry:
    def test_closed_form(self, spark):
        # join: key->table asserted both ways (symmetric, 2 ordered
        # pairs), key->row one way; loops excluded.
        docs = _docs(
            spark,
            ["key join table", "table join key", "key join row",
             "key join key"],
        )
        rows = [tuple(r) for r in kg.predicate_symmetry(docs).collect()]
        # n_pairs=3 ordered, n_sym=2 -> sym = round(2/3 * 1e6) = 666667
        assert rows == [("join", 3, 2, 666667)]

    def test_fully_asymmetric(self, spark):
        docs = _docs(spark, ["key join table", "row join part"])
        rows = [tuple(r) for r in kg.predicate_symmetry(docs).collect()]
        assert rows == [("join", 2, 0, 0)]


class TestDistanceHistogram:
    def test_chain_distribution_and_eff_diameter(self, spark):
        # path graph 0-1-2-3-4; landmark pick is hash-minimal among nodes
        from hebrew_ner_spark.operators import graphstats

        edges = spark.createDataFrame(
            [(i, i + 1, "join", 3) for i in range(4)],
            "subj_id long, obj_id long, pred string, n_evidence long",
        )
        rows = graphstats.distance_histogram(edges, k=1, rounds=4).collect()
        by_dist = {r.dist: r for r in rows}
        # one landmark on a 5-chain: exactly one pair per reachable dist 0..
        assert by_dist[0].n_pairs == 1
        assert sum(r.n_pairs for r in rows) == 5  # all nodes reached
        # cum is monotone and ends at total
        cums = [r.cum_pairs for r in sorted(rows, key=lambda r: r.dist)]
        assert cums == sorted(cums) and cums[-1] == 5
        # exactly one row flagged as the effective diameter, at the first
        # dist where cum >= 0.9 * total
        flagged = [r for r in rows if r.eff_diameter]
        assert len(flagged) == 1
        d_star = min(r.dist for r in rows if 10 * r.cum_pairs >= 9 * 5)
        assert flagged[0].dist == d_star

    def test_star_has_eff_diameter_one(self, spark):
        from hebrew_ner_spark.operators import graphstats

        edges = spark.createDataFrame(
            [(0, i, "join", 3) for i in range(1, 11)],
            "subj_id long, obj_id long, pred string, n_evidence long",
        )
        rows = graphstats.distance_histogram(edges, k=2, rounds=3).collect()
        [f] = [r for r in rows if r.eff_diameter]
        assert f.dist <= 2  # star: everything within 2 of any landmark


class TestTypePropagation:
    def test_clamped_seeds_and_majority_adoption(self, spark):
        # Edges (scan triples): customer-key x8, table-key x3,
        # customer-table x1; mean weight 4 -> only customer-key survives
        # the above-mean sparsifier. Under TYPEPROP_SEED: 'customer' is
        # seeded (AGENT), 'key' and 'table' are unseeded — so 'key' must
        # adopt AGENT from its one typed neighbor and be marked inferred;
        # 'table' is not an endpoint of the sparse graph and stays absent.
        from hebrew_ner_spark.functions.hashing import phash_py
        from hebrew_ner_spark.operators import graphstats

        assert phash_py("TPS|customer", graphstats.TYPEPROP_SEED) % 2 == 0
        assert phash_py("TPS|key", graphstats.TYPEPROP_SEED) % 2 != 0
        assert phash_py("TPS|table", graphstats.TYPEPROP_SEED) % 2 != 0

        docs = spark.createDataFrame(
            [(i, "customer scan key") for i in range(8)]
            + [(100 + i, "table scan key") for i in range(3)]
            + [(200, "customer scan table")],
            ["doc_id", "text"],
        )
        got = {r.entity: r for r in graphstats.type_propagation(docs).collect()}
        assert set(got) == {"customer", "key"}
        assert (got["customer"].etype, got["customer"].inferred) == ("AGENT", False)
        assert (got["key"].etype, got["key"].inferred) == ("AGENT", True)


class TestPraPathFeatures:
    def test_closed_form_typed_paths(self, spark):
        from unittest.mock import patch

        from pyspark.sql import functions as F

        from hebrew_ner_spark.operators import graphstats

        edges = spark.createDataFrame(
            [
                # a -r1-> m1 -r2-> c   and   a -r1-> m2 -r2-> c : 2 paths
                ("a", "r1", "m1"), ("m1", "r2", "c"),
                ("a", "r1", "m2"), ("m2", "r2", "c"),
                # a -r1-> m1 -r3-> c : a different path TYPE, counted apart
                ("m1", "r3", "c"),
                # cycle back to self must be excluded
                ("c", "r9", "a"), ("a", "r0", "x"), ("x", "r0", "a"),
            ],
            ["subj", "pred", "obj"],
        )
        fake = edges.withColumn("doc_id", F.lit(0)).withColumn(
            "word_index", F.lit(0)
        ).withColumn("pattern", F.lit("svo"))
        from hebrew_ner_spark.operators import kg

        with patch.object(kg, "doc_triples_patterns", return_value=fake):
            got = {
                (r.a, r.c, r.pred1, r.pred2): r.n_paths
                for r in graphstats.pra_path_features(edges).collect()
            }
        assert got[("a", "c", "r1", "r2")] == 2
        assert got[("a", "c", "r1", "r3")] == 1
        # the x-loop contributes a->x->a which is a==c: excluded
        assert ("a", "a", "r0", "r0") not in got
        # reverse wedge c -r9-> a -r1-> m1 exists
        assert got[("c", "m1", "r9", "r1")] == 1

    def test_hub_cap_excludes_mid(self, spark):
        from unittest.mock import patch

        from pyspark.sql import functions as F

        from hebrew_ner_spark.operators import graphstats

        edges = spark.createDataFrame(
            # hub m has degree 4 (2 in + 2 out); quiet mid q has 2
            [
                ("a", "r", "m"), ("b", "r", "m"),
                ("m", "r", "c"), ("m", "r", "d"),
                ("a", "r", "q"), ("q", "r", "c"),
            ],
            ["subj", "pred", "obj"],
        )
        fake = edges.withColumn("doc_id", F.lit(0)).withColumn(
            "word_index", F.lit(0)
        ).withColumn("pattern", F.lit("svo"))
        from hebrew_ner_spark.operators import kg

        with patch.object(kg, "doc_triples_patterns", return_value=fake):
            capped = {
                (r.a, r.c): r.n_paths
                for r in graphstats.pra_path_features(
                    edges, max_center_degree=3
                ).collect()
            }
            exact = {
                (r.a, r.c): r.n_paths
                for r in graphstats.pra_path_features(edges).collect()
            }
        # exact sees both mids for (a, c); the cap drops hub m everywhere
        assert exact[("a", "c")] == 2
        assert capped[("a", "c")] == 1
        assert ("b", "c") in exact and ("b", "c") not in capped


class TestKtrussPeel:
    def test_truss_core_and_cascade(self, spark):
        # two triangles sharing edge row-table: every rim edge closes 1
        # triangle (< k-2 = 2) and peels round 0; the shared edge starts
        # at support 2, is stranded by the rim, and peels round 1.
        heavy = (
            ["key join row", "key join table", "row join table"] * 3
            + ["row join part", "table join part"] * 3
        )
        light = ["batch join line", "order join query", "hash join group"]
        docs = _docs(spark, heavy + light)
        got = {
            (r.a, r.b): r.peel_round
            for r in graphstats.ktruss_peel(docs, k=4).collect()
        }
        assert got == {
            ("key", "row"): 0,
            ("key", "table"): 0,
            ("part", "row"): 0,
            ("part", "table"): 0,
            ("row", "table"): 1,
        }

    def test_k4_is_a_4_truss(self, spark):
        # complete graph on 4 entities: every edge closes exactly 2
        # triangles, so the whole K4 survives at k=4.
        k4 = [
            "key join row", "key join table", "key join part",
            "row join table", "row join part", "table join part",
        ]
        light = ["batch join line", "order join query", "hash join group"]
        docs = _docs(spark, [t for t in k4 for _ in range(3)] + light)
        got = {
            (r.a, r.b): r.peel_round
            for r in graphstats.ktruss_peel(docs, k=4).collect()
        }
        assert len(got) == 6 and set(got.values()) == {-1}

    def test_nonconvergence_raises(self, spark):
        heavy = (
            ["key join row", "key join table", "row join table"] * 3
            + ["row join part", "table join part"] * 3
        )
        docs = _docs(spark, heavy + ["batch join line"])
        with pytest.raises(RuntimeError, match="no fixpoint"):
            graphstats.ktruss_peel(docs, k=4, max_rounds=1)


class TestClusteringCoefficient:
    def test_triangle_with_pendant(self, spark):
        # triangle key-row-table + pendant table-part: key/row cc = 1.0,
        # table deg 3 with 1 triangle -> 2/(3*2) = 333333, part deg 1 -> 0
        heavy = ["key join row", "key join table", "row join table"] * 3 + [
            "table join part"
        ] * 3
        light = ["batch join line", "order join query", "hash join group"]
        docs = _docs(spark, heavy + light)
        got = {
            r.entity: (r.deg, r.n_tri, r.cc_1e6)
            for r in graphstats.clustering_coefficient(docs).collect()
        }
        assert got["key"] == (2, 1, 1000000)
        assert got["row"] == (2, 1, 1000000)
        assert got["table"] == (3, 1, 333333)
        assert got["part"] == (1, 0, 0)


class TestBoundedReach:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, "src string, dst string")

    def _reach(self, spark, pairs):
        df = graphstats.bounded_reach(self._edges(spark, pairs))
        return {(r.src, r.dst): r.min_hops for r in df.collect()}

    def test_chain_exact_hops_and_horizon_cutoff(self, spark):
        # 6-chain a->...->f: every pair within 4 hops, exact counts;
        # a->f (5 hops) falls past the horizon.
        got = self._reach(
            spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f")]
        )
        assert got[("a", "b")] == 1
        assert got[("a", "e")] == 4
        assert got[("b", "f")] == 4
        assert ("a", "f") not in got
        assert len(got) == 14  # all 15 ordered chain pairs minus the 5-hop one

    def test_shortcut_beats_longer_path(self, spark):
        # a->b->c->d plus direct a->d: min is the shortcut, not 3.
        got = self._reach(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")])
        assert got[("a", "d")] == 1
        assert got[("b", "d")] == 2

    def test_cycle_includes_self_returns(self, spark):
        # 3-cycle: forward distances exact, and each node returns to
        # itself at the cycle length (self-loops only via real cycles).
        got = self._reach(spark, [("x", "y"), ("y", "z"), ("z", "x")])
        assert got[("x", "z")] == 2
        assert got[("x", "x")] == 3
        assert got[("y", "y")] == 3

    def test_synth_edges_have_no_self_loops(self, spark):
        docs = spark.range(0, 500).withColumnRenamed("id", "doc_id")
        e = graphstats.synth_sparse_edges(docs)
        assert e.where(F.col("src") == F.col("dst")).count() == 0
        # 64-node order: every endpoint is n0..n63
        nodes = {r.src for r in e.select("src").distinct().collect()}
        assert nodes <= {f"n{i}" for i in range(64)}


def test_partition_quality_python_replay(spark):
    import hashlib

    def ph(s, seed):
        return int(hashlib.md5(f"{s}:{seed}".encode()).hexdigest()[:15], 16)

    pairs = [(1, 2), (2, 3), (3, 1), (4, 4), (5, 1), (6, 7)]
    e = spark.createDataFrame(pairs, "src long, dst long")
    got = {
        r["k"]: (r["n_edges"], r["n_cut"], r["cut_share_1e6"],
                 r["max_load"], r["balance_1e6"])
        for r in graphstats.partition_quality(e).collect()
    }
    for k in (8, 32):
        cuts = sum(
            1 for s, d in pairs
            if ph(str(s), 53) % k != ph(str(d), 53) % k
        )
        from collections import Counter

        loads = Counter(ph(str(s), 53) % k for s, _ in pairs)
        n, ml = len(pairs), max(loads.values())
        assert got[k] == (
            n, cuts,
            (2 * cuts * 1000000 + n) // (2 * n),
            ml,
            (2 * ml * k * 1000000 + n) // (2 * n),
        )
    # self-loop (4,4) is never cut at any k
    assert all(got[k][1] < len(pairs) for k in (8, 32))


class TestWeightedReach:
    def _run(self, spark, rows, horizon=8):
        df = spark.createDataFrame(rows, ["src", "dst", "w"])
        return {
            (r.src, r.dst): r.min_w
            for r in graphstats.weighted_reach(df, horizon).collect()
        }

    def test_lighter_longer_path_wins(self, spark):
        # direct a->d costs 100; the 3-hop detour costs 30
        rows = [("a", "d", 100), ("a", "b", 10), ("b", "c", 10), ("c", "d", 10)]
        got = self._run(spark, rows)
        assert got[("a", "d")] == 30

    def test_horizon_cutoff(self, spark):
        # a 3-hop chain is invisible at horizon 2
        rows = [("a", "b", 1), ("b", "c", 1), ("c", "d", 1)]
        got = self._run(spark, rows, horizon=2)
        assert ("a", "d") not in got and got[("a", "c")] == 2

    def test_parallel_edge_min(self, spark):
        rows = [("a", "b", 9), ("a", "b", 3)]
        assert self._run(spark, rows)[("a", "b")] == 3

    def test_cycle_return_included(self, spark):
        rows = [("a", "b", 5), ("b", "a", 7)]
        got = self._run(spark, rows)
        assert got[("a", "a")] == 12 and got[("b", "b")] == 12

    def test_corpus_parity_vs_bellman_ford(self, spark, sf_dir):
        from collections import defaultdict

        from hebrew_ner_spark.sources.catalog import load_table

        docs = load_table(spark, sf_dir, "documents")
        e = graphstats.weighted_sr_edges(docs)
        edges = [(r.src, r.dst, r.w) for r in e.collect()]
        got = {
            (r.src, r.dst): r.min_w
            for r in graphstats.weighted_reach(e).collect()
        }
        # independent bounded Bellman-Ford over walks
        best = defaultdict(dict)  # src -> dst -> w
        cur = defaultdict(dict)
        for s, d, w in edges:
            cur[s][d] = min(cur[s].get(d, 1 << 60), w)
        for s in cur:
            best[s].update(cur[s])
        for _ in range(graphstats.WREACH_HORIZON - 1):
            nxt = defaultdict(dict)
            adj = defaultdict(list)
            for s, d, w in edges:
                adj[s].append((d, w))
            for s in cur:
                for mid, w1 in cur[s].items():
                    for d, w2 in adj.get(mid, []):
                        v = w1 + w2
                        if v < nxt[s].get(d, 1 << 60):
                            nxt[s][d] = v
            for s in nxt:
                for d, v in nxt[s].items():
                    if v < best[s].get(d, 1 << 60):
                        best[s][d] = v
            cur = nxt
        want = {(s, d): v for s in best for d, v in best[s].items()}
        assert got == want


class TestWLRefinement:
    def _colors(self, spark, edges, rounds):
        df = spark.createDataFrame(edges, ["src", "dst"])
        return {
            r.node: r.color
            for r in graphstats.wl_colors(df, rounds).collect()
        }

    def test_automorphic_nodes_share_colors(self, spark):
        # two disjoint directed 3-cycles: all six nodes are automorphic
        edges = [("a", "b"), ("b", "c"), ("c", "a"),
                 ("x", "y"), ("y", "z"), ("z", "x")]
        got = self._colors(spark, edges, 3)
        assert len(set(got.values())) == 1

    def test_path_graph_classes(self, spark):
        # directed path a->b->c->d->e: positions are pairwise
        # distinguishable after enough rounds (ends differ from middles
        # at round 1; full separation by round 2)
        edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
        got = self._colors(spark, edges, 3)
        assert len(set(got.values())) == 5

    def test_refinement_is_monotone(self, spark, sf_dir):
        """Classes never merge: the round-k partition refines round k-1
        (nodes with equal colors at k had equal colors at k-1)."""
        from collections import defaultdict

        from hebrew_ner_spark.operators.simrank import synth_sr_edges
        from hebrew_ner_spark.sources.catalog import load_table

        e = synth_sr_edges(load_table(spark, sf_dir, "documents"))
        parts = []
        for k in range(0, 4):
            cols = {
                r.node: r.color for r in graphstats.wl_colors(e, k).collect()
            }
            groups = defaultdict(set)
            for n, c in cols.items():
                groups[c].add(n)
            parts.append(sorted(map(frozenset, groups.values()), key=min))
        for prev, cur in zip(parts, parts[1:]):
            assert len(cur) >= len(prev)
            for cls in cur:
                assert any(cls <= p for p in prev)

    def test_python_reference_parity(self, spark, sf_dir):
        from collections import defaultdict

        from hebrew_ner_spark.functions.hashing import phash_py
        from hebrew_ner_spark.operators.simrank import synth_sr_edges
        from hebrew_ner_spark.sources.catalog import load_table

        e = synth_sr_edges(load_table(spark, sf_dir, "documents"))
        edges = {(r.src, r.dst) for r in e.collect()}
        nodes = sorted({x for p in edges for x in p})
        inn, out = defaultdict(list), defaultdict(list)
        for s, d in edges:
            inn[d].append(s)
            out[s].append(d)
        col = {n: phash_py("wl0", 0) for n in nodes}
        for _ in range(graphstats.WL_ROUNDS):
            col = {
                n: phash_py(
                    f"{col[n]}|"
                    + ",".join(sorted(str(col[p]) for p in inn[n]))
                    + "|"
                    + ",".join(sorted(str(col[c]) for c in out[n])),
                    0,
                )
                for n in nodes
            }
        got = {
            r.node: r.color
            for r in graphstats.wl_colors(e).collect()
        }
        assert got == col


# ---------------------------------------------------------------------------
# Densest-subgraph batch peeling
# ---------------------------------------------------------------------------


def test_densest_peel_recovers_planted_clique(spark):
    """Sparse background + planted K6: the best snapshot must be exactly
    the clique, and every node's peel round must match a pure-python
    replay of the epsilon=0 batch peel."""
    import collections
    from fractions import Fraction

    bg = [(i, (i + 1) % 12) for i in range(12)]          # 12-cycle, deg 2
    clique = [(a, b) for a in range(12, 18) for b in range(12, 18) if a < b]
    bridge = [(0, 12)]                                    # connect the two
    edges = sorted({(min(a, b), max(a, b)) for a, b in bg + clique + bridge})
    df = spark.createDataFrame(edges, "a long, b long")
    out = {r.node: (r.peel_round, r.in_densest)
           for r in graphstats.densest_peel(df, max_rounds=8).collect()}

    sym = edges + [(b, a) for a, b in edges]
    snaps, peel_of, rnd = [], {}, 0
    while sym:
        deg = collections.Counter(a for a, b in sym)
        n, e2 = len(deg), len(sym)
        snaps.append((n, e2))
        drop = {a for a, d in deg.items() if d * n <= e2}
        nxt = [(a, b) for a, b in sym if a not in drop and b not in drop]
        gone = set(deg) - {a for a, b in nxt}
        for v in gone:
            peel_of[v] = rnd
        sym, rnd = nxt, rnd + 1
    best = max(range(len(snaps)),
               key=lambda i: (Fraction(snaps[i][1], snaps[i][0]), -i))
    assert out == {
        v: (r, 1 if r >= best else 0) for v, r in peel_of.items()
    }
    assert {v for v, (r, d) in out.items() if d} == set(range(12, 18))


def test_densest_peel_raises_past_round_budget(spark):
    """A graph that cannot empty inside the budget must raise loudly
    (plan/oracle can never silently diverge on a deeper-peeling corpus)."""
    import pytest

    edges = [(a, b) for a in range(8) for b in range(8) if a < b]
    df = spark.createDataFrame(edges, "a long, b long")
    with pytest.raises(RuntimeError, match="densest_peel"):
        graphstats.densest_peel(df, max_rounds=0)


def test_recursive_reach_equals_doubling(spark):
    """Three-way: the native recursive-CTE plan must equal the min-plus
    doubling plan row-for-row on the gated graph."""
    from hebrew_ner_spark.operators import graphstats as gs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    e = gs.synth_sparse_edges(docs).persist()
    a = {(r.src, r.dst, r.min_hops) for r in gs.bounded_reach(e).collect()}
    b = {(r.src, r.dst, r.min_hops)
         for r in gs.bounded_reach_recursive(e).collect()}
    assert a == b and a


def test_node2vec_python_replay_and_bias(spark):
    """Exact python replay of the inverse-CDF biased pick per hop, and
    the bias is real: the walk corpus differs from the uniform
    random_walks corpus on the same graph."""
    import hashlib

    from hebrew_ner_spark.operators import graphstats, linking

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    edges = linking.kg_edges(docs)
    ee = {
        (r.subj_id, r.obj_id)
        for r in edges.select("subj_id", "obj_id").distinct().collect()
    }
    adj = {}
    for s, d in ee:
        adj.setdefault(s, []).append(d)
    for s in adj:
        adj[s].sort()

    def phash(s, seed):
        return int(hashlib.md5(f"{s}:{seed}".encode()).hexdigest()[:15], 16)

    want = {}
    for src in sorted(adj):
        for wi in range(graphstats.WALKS_PER_NODE):
            prev, cur, path = None, src, [src]
            for t in range(1, graphstats.WALK_STEPS + 1):
                cands = adj.get(cur, [])
                if not cands:
                    continue
                ws = []
                for x in cands:
                    if prev is None:
                        ws.append(graphstats.N2V_W_NEAR)
                    elif x == prev:
                        ws.append(graphstats.N2V_W_RETURN)
                    elif (prev, x) in ee:
                        ws.append(graphstats.N2V_W_NEAR)
                    else:
                        ws.append(graphstats.N2V_W_FAR)
                tot = sum(ws)
                r = phash(f"N2V|{src}|{wi}|{t}", graphstats.N2V_SEED) % tot
                cum = 0
                for x, w in zip(cands, ws):
                    cum += w
                    if r < cum:
                        nxt = x
                        break
                prev, cur = cur, nxt
                path.append(nxt)
            want[(src, wi)] = "|".join(str(p) for p in path)
    got = {
        (r.walk_src, r.walk_i): r.path
        for r in graphstats.node2vec_walks(edges).collect()
    }
    assert got == want
    uni = {
        (r.walk_src, r.walk_i): r.path
        for r in graphstats.random_walks(edges).collect()
    }
    assert got != uni  # the p/q bias actually changes the corpus

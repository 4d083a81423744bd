"""Edit-distance similarity join (FastSS deletion blocking): losslessness
vs brute-force Levenshtein, k=2 radius, guards, planted-cap overflow,
typo-recall invariant, broadcast-dictionary plan shape."""

from itertools import combinations

from pyspark.sql import functions as F

from hebrew_ner_spark.operators import editjoin


def _lev(a: str, b: str) -> int:
    """Independent pure-Python Levenshtein (full DP, no optimizations)."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[len(b)]


# adversarial vocabulary: dense 1- and 2-edit neighbourhoods, repeats,
# prefixes of each other, single chars, the empty-adjacent cases
_WORDS = [
    "table", "tabel", "tble", "tables", "cable", "fable",
    "order", "oder", "ordre", "orders", "odrer",
    "a", "ab", "ba", "b", "abc", "bc", "ac",
    "spark", "park", "stark", "shark", "sparkk",
    "merge", "mere", "merg", "serge",
    "xyzzy",
]


class TestEditJoinExactness:
    def test_self_pairs_lossless_k1(self, spark):
        df = spark.createDataFrame([(w,) for w in _WORDS], ["s"])
        got = {
            (r.str_a, r.str_b): r.dist
            for r in editjoin.edit_self_pairs(df, "s", k=1).collect()
        }
        want = {
            (a, b): _lev(a, b)
            for a, b in combinations(sorted(set(_WORDS)), 2)
            if _lev(a, b) <= 1
        }
        assert got == want

    def test_self_pairs_lossless_k2(self, spark):
        df = spark.createDataFrame([(w,) for w in _WORDS], ["s"])
        got = {
            (r.str_a, r.str_b): r.dist
            for r in editjoin.edit_self_pairs(df, "s", k=2).collect()
        }
        want = {
            (a, b): _lev(a, b)
            for a, b in combinations(sorted(set(_WORDS)), 2)
            if _lev(a, b) <= 2
        }
        assert got == want

    def test_dict_join_lossless_k1(self, spark):
        queries = spark.createDataFrame([(w,) for w in _WORDS], ["q"])
        names = spark.createDataFrame(
            [("table",), ("order",), ("spark",), ("merge",), ("value",)],
            ["name"],
        )
        got = {
            (r.surface, r.name): r.dist
            for r in editjoin.edit_join_dict(
                queries, "q", names, "name", k=1
            ).collect()
        }
        want = {
            (q, n): _lev(q, n)
            for q in set(_WORDS)
            for n in ["table", "order", "spark", "merge", "value"]
            if _lev(q, n) <= 1
        }
        assert got == want

    def test_variant_counts_and_guards(self, spark):
        # len-L string: exactly L+1 variants at k=1 unless deletions
        # collide ("aa" -> {"aa", "a"}); empty string survives the
        # sequence(1, 0) descending-range guard
        df = spark.createDataFrame(
            [("abc",), ("aa",), ("",), ("x",)], ["s"]
        )
        v = editjoin.deletion_variants(df, "s", k=1)
        counts = {r.s: r.n for r in v.groupBy("s").agg(F.count("*").alias("n")).collect()}
        assert counts == {"abc": 4, "aa": 2, "": 1, "x": 2}


class TestEditJoinCap:
    def test_cap_excludes_and_reports(self, spark):
        # 6 two-char strings ending in 'z' all bucket on variant "z"
        crowd = [c + "z" for c in "abcdef"]
        df = spark.createDataFrame([(w,) for w in crowd + ["qq", "qx"]], ["s"])
        pairs = editjoin.edit_self_pairs(df, "s", k=1, cap=4)
        got = {(r.str_a, r.str_b) for r in pairs.collect()}
        # the crowd's pairwise matches route only through bucket "z"
        # (dist("az","bz")=1 but their other shared variant is none) —
        # with cap=4 the "z" bucket (6 members) is excluded...
        assert not any(a.endswith("z") and b.endswith("z") for a, b in got)
        # ...but the small "q" bucket still pairs
        assert ("qq", "qx") in got
        over = {
            (r.variant, r.n_strings)
            for r in editjoin.edit_self_overflow(df, "s", k=1, cap=4).collect()
        }
        assert ("z", 6) in over

    def test_self_pairs_never_emits_self(self, spark):
        df = spark.createDataFrame([("aa",), ("ab",), ("aa",)], ["s"])
        rows = editjoin.edit_self_pairs(df, "s", k=1).collect()
        assert all(r.str_a < r.str_b for r in rows)


class TestTypoRecall:
    def test_every_corrupted_entity_term_links_back(self, spark, sf_dir):
        """The planted ground truth: each typo surface is one deletion
        from its intended token, so the k=1 dictionary join must recover
        every corrupted ENTITY_TERMS member (blocking losslessness as a
        recall statement)."""
        from hebrew_ner_spark.resources import ENTITY_TERMS
        from hebrew_ner_spark.sources.catalog import load_table

        docs = load_table(spark, sf_dir, "documents")
        surf = editjoin.typo_surfaces(docs)
        names = spark.createDataFrame(
            [(t,) for t in sorted(ENTITY_TERMS)], ["name"]
        )
        linked = editjoin.edit_join_dict(
            surf.select("surface"), "surface", names, "name"
        )
        got = {(r.surface, r.name) for r in linked.collect()}
        want_pairs = {
            (r.surface, r.intended)
            for r in surf.collect()
            if r.intended in set(ENTITY_TERMS)
        }
        assert want_pairs, "corruption table must cover entity terms"
        assert want_pairs <= got

    def test_dict_side_broadcasts(self, spark):
        """Plan shape: the dictionary neighborhood is the broadcast build
        side — the 10^12-scale query side must not shuffle into the join."""
        queries = spark.createDataFrame([(w,) for w in _WORDS], ["q"])
        names = spark.createDataFrame([("table",)], ["name"])
        plan = editjoin.edit_join_dict(
            queries, "q", names, "name"
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

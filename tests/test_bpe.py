"""BPE merge training: closed-form fixtures for the training loop,
the greedy left-to-right merge rule, prefix safety of the wrapped
encoding, and the early-stop path."""

from hebrew_ner_spark.operators import bpe


def _docs(spark, texts):
    rows = [(i, t, "he") for i, t in enumerate(texts)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


class TestBpeMerges:
    def test_closed_form_and_early_stop(self, spark):
        # vocab: aaab (n=2), ab (n=1)
        # r1: (a,a)=4 beats (a,b)=3            -> aaab = [aa, a, b]
        # r2: (a,b)=2+1=3 beats (aa,a)=2       -> aaab = [aa, ab], ab = [ab]
        # r3: (aa,ab)=2                         -> aaab = [aaab]
        # r4: no adjacent pairs remain          -> early stop (3 rows, not 4)
        d = _docs(spark, ["aaab aaab", "ab"])
        got = [(r["round"], r.l, r.r, r.cnt) for r in bpe.bpe_merges(d, 4).collect()]
        assert got == [(1, "a", "a", 4), (2, "a", "b", 3), (3, "aa", "ab", 2)]

    def test_greedy_left_to_right(self, spark):
        # 'aaaa': one (a,a) merge must produce [aa, aa] — adjacent
        # non-overlapping matches both fire (the wrapped encoding leaves
        # the next symbol's leading space intact).
        d = _docs(spark, ["aaaa"])
        vocab = {r.token: r for r in bpe.bpe_vocab(d, 1).collect()}
        assert vocab["aaaa"].segmented == "aa|aa"
        assert vocab["aaaa"].n_symbols == 2

    def test_prefix_safety(self, spark):
        # merge (a,b) must NOT fire inside ' b  c ' or against the longer
        # symbol 'bc' — the closing space in the pattern forbids it.
        d = _docs(spark, ["ab ab ab ab ab", "a bc"])
        merges = bpe.bpe_merges(d, 1).collect()
        assert [(m.l, m.r, m.cnt) for m in merges] == [("a", "b", 5)]
        vocab = {r.token: r.segmented for r in bpe.bpe_vocab(d, 1).collect()}
        assert vocab == {"ab": "ab", "a": "a", "bc": "b|c"}

    def test_tie_order(self, spark):
        # (a,b) and (c,d) both count 1 -> lexicographically smaller (a,b)
        # must win round 1 (cnt DESC, l ASC, r ASC).
        d = _docs(spark, ["cd ab"])
        m = bpe.bpe_merges(d, 1).collect()[0]
        assert (m.l, m.r, m.cnt) == ("a", "b", 1)


class TestBpeEncode:
    def test_pieces_reconstruct_tokens(self, spark):
        docs = spark.createDataFrame(
            [(1, "the table the table value"), (2, "value table the")],
            ["doc_id", "text"],
        )
        from hebrew_ner_spark.operators.bpe import bpe_encode

        rows = bpe_encode(docs, rounds=3).collect()
        # group pieces back per (doc, word) in piece order
        words = {}
        for r in rows:
            words.setdefault((r.doc_id, r.word_index), []).append((r.piece_index, r.piece))
        rebuilt = {k: "".join(p for _, p in sorted(v)) for k, v in words.items()}
        expected = {}
        for doc_id, text in [(1, "the table the table value"), (2, "value table the")]:
            for i, t in enumerate(text.split(" ")):
                expected[(doc_id, i)] = t
        assert rebuilt == expected

    def test_more_rounds_never_more_pieces(self, spark):
        docs = spark.createDataFrame(
            [(1, "table table table value value the")], ["doc_id", "text"]
        )
        from hebrew_ner_spark.operators.bpe import bpe_encode

        n0 = bpe_encode(docs, rounds=0).count()
        n2 = bpe_encode(docs, rounds=2).count()
        n4 = bpe_encode(docs, rounds=4).count()
        assert n0 >= n2 >= n4
        assert n4 < n0  # merges actually fired

    def test_tiered_join_matches_broadcast_path(self, spark):
        # hot_k=1 forces most tokens through the tail sort-merge tier;
        # output must be identical to the all-broadcast path
        docs = spark.createDataFrame(
            [(1, "the table the table value"), (2, "value table the")],
            ["doc_id", "text"],
        )
        from hebrew_ner_spark.operators.bpe import bpe_encode

        allb = {tuple(r) for r in bpe_encode(docs, rounds=2, hot_k=100).collect()}
        tier = {tuple(r) for r in bpe_encode(docs, rounds=2, hot_k=1).collect()}
        assert tier == allb

    def test_tail_tier_never_broadcasts(self, spark):
        docs = spark.createDataFrame(
            [(1, "the table the table value"), (2, "value table the")],
            ["doc_id", "text"],
        )
        from hebrew_ner_spark.operators.bpe import bpe_encode

        plan = (
            bpe_encode(docs, rounds=1, hot_k=1)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "SortMergeJoin" in plan  # the tail tier resolves by merge


class TestLineageBoundedTraining:
    def test_64_rounds_bounded_plan(self, spark):
        """VERDICT r3 #7: a 64-round train (2x the break interval) must
        complete with the final vocab's plan bounded by the break — the
        plan string must stay far under what 64 stacked replace
        projections would produce, and segmentation must still
        reconstruct every token exactly."""
        docs = spark.createDataFrame(
            [(i, "abcdefgh abcdefg bcdefgh abcd efgh abc def") for i in range(6)],
            "doc_id long, text string",
        )
        out = bpe.bpe_vocab(docs, rounds=64)
        rows = out.collect()
        assert rows, "vocab must not be empty"
        for r in rows:
            assert r.segmented.replace("|", "") == r.token
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        # 64 stacked replaces would put >= 64 'replace(' calls in the
        # plan; the breaker caps the stack at BPE_BREAK_EVERY
        assert plan.count("replace(") <= 2 * bpe.BPE_BREAK_EVERY + 8, len(plan)

    def test_break_interval_does_not_change_merges(self, spark):
        """Winners are a pure function of the data — breaking lineage
        mid-train must not perturb a single merge decision."""
        docs = spark.createDataFrame(
            [(0, "aa ab aa ab ba"), (1, "aa ab bb aa")],
            "doc_id long, text string",
        )
        base = [tuple(r) for r in bpe.bpe_merges(docs, rounds=6).collect()]
        old = bpe.BPE_BREAK_EVERY
        try:
            bpe.BPE_BREAK_EVERY = 2
            broken = [tuple(r) for r in bpe.bpe_merges(docs, rounds=6).collect()]
        finally:
            bpe.BPE_BREAK_EVERY = old
        assert base == broken

"""Split stability, contamination audit, negative-sampling invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from hebrew_ner_spark.functions.hashing import phash_py
from hebrew_ner_spark.operators import training


def _docs(spark, n, text="the same text repeated here"):
    return spark.createDataFrame(
        [(i, text, "he") for i in range(n)], "doc_id long, text string, lang string"
    )


def _expected_split(doc_id: int) -> str:
    b = phash_py(f"split|{doc_id}") % 100
    return "train" if b < 80 else ("val" if b < 90 else "test")


class TestDocSplits:
    def test_matches_closed_form(self, spark):
        got = {r.doc_id: r.split for r in training.doc_splits(_docs(spark, 64)).collect()}
        assert got == {i: _expected_split(i) for i in range(64)}

    def test_growth_stable(self, spark):
        # a document's split NEVER moves when the corpus grows
        small = {r.doc_id: r.split for r in training.doc_splits(_docs(spark, 50)).collect()}
        big = {r.doc_id: r.split for r in training.doc_splits(_docs(spark, 200)).collect()}
        assert all(big[d] == s for d, s in small.items())

    def test_proportions_roughly_80_10_10(self, spark):
        rows = training.doc_splits(_docs(spark, 1000)).groupBy("split").count().collect()
        frac = {r.split: r["count"] / 1000 for r in rows}
        assert 0.7 < frac["train"] < 0.9 and frac["val"] < 0.2 and frac["test"] < 0.2


class TestContamination:
    def test_planted_cross_split_dup_detected(self, spark):
        # find two doc_ids in different splits, plant identical long texts
        # on them (near-dup via shingles), distinct filler elsewhere
        a = next(i for i in range(100) if _expected_split(i) == "train")
        b = next(i for i in range(100) if _expected_split(i) == "test")
        dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        rows = [
            (i, dup if i in (a, b) else f"unique filler {i} " * 5 + str(i), "he")
            for i in range(100)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        leaks = {(r.doc_a, r.doc_b) for r in training.split_contamination(docs).collect()}
        assert (min(a, b), max(a, b)) in leaks

    def test_same_split_dup_not_a_leak(self, spark):
        a, b = [i for i in range(100) if _expected_split(i) == "train"][:2]
        dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        rows = [
            (i, dup if i in (a, b) else f"unique filler {i} " * 5 + str(i), "he")
            for i in range(100)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        leaks = {(r.doc_a, r.doc_b) for r in training.split_contamination(docs).collect()}
        assert (min(a, b), max(a, b)) not in leaks


class TestNegativeSamples:
    def _edges(self, spark, triples):
        return spark.createDataFrame(
            [(s, p, o, 1) for s, p, o in triples],
            "subj_id long, pred string, obj_id long, n_evidence long",
        )

    def test_dense_ranks_match_row_number_with_gaps(self, spark):
        # ids straddling several DIV-64 buckets, with gaps
        ids = [0, 1, 63, 64, 65, 200, 4096, 4097, 999999]
        edges = self._edges(spark, [(a, "p", b) for a, b in zip(ids, ids[1:])])
        got = {r.entity_id: r.r for r in training.dense_entity_ranks(edges).collect()}
        assert got == {e: i for i, e in enumerate(sorted(ids))}

    def test_k_per_edge_never_true_object(self, spark):
        edges = self._edges(
            spark, [(1, "join", 2), (2, "scan", 3), (3, "merge", 1), (1, "agg", 3)]
        )
        out = training.negative_samples(edges).collect()
        assert len(out) == 4 * training.NEG_K
        assert all(r.neg_obj_id != r.obj_id for r in out)
        assert all(r.neg_obj_id in (1, 2, 3) for r in out)
        # deterministic across invocations
        again = training.negative_samples(edges).collect()
        assert sorted(map(tuple, out)) == sorted(map(tuple, again))

    def test_collision_shift_matches_closed_form(self, spark):
        edges = self._edges(spark, [(10, "p", 20), (20, "q", 30)])
        ranks = {10: 0, 20: 1, 30: 2}
        out = training.negative_samples(edges).collect()
        for r in out:
            raw = phash_py(f"{r.subj_id}|{r.pred}|{r.obj_id}|{r.neg_i}") % 3
            want = (raw + 1) % 3 if raw == ranks[r.obj_id] else raw
            assert ranks[r.neg_obj_id] == want


class TestDecontaminate:
    # split assignment is hash-stable: doc_ids 1/4/6 land in train,
    # 0/5/8 in test (phash('split|i') % 100 buckets)
    QUOTE = "q1 q2 q3 q4 q5 q6 q7 q8"  # exactly DECON_K tokens

    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, ["doc_id", "text"])

    def test_planted_verbatim_leak_found(self, spark):
        docs = self._docs(
            spark,
            [
                (1, f"train doc quoting {self.QUOTE} verbatim"),
                (4, "independent train doc with no overlap at all here"),
                (0, f"the eval item says {self.QUOTE} and more"),
                (5, "another clean eval doc of unrelated words entirely"),
            ],
        )
        got = {r.doc_id: r.n_shared_grams for r in
               training.decontaminate_ngrams(docs).collect()}
        assert got == {1: 1}  # one shared 8-gram, only the quoting doc

    def test_within_split_duplicates_not_flagged(self, spark):
        # two TRAIN docs sharing a gram is not eval contamination
        docs = self._docs(
            spark,
            [
                (1, f"one {self.QUOTE} copy"),
                (4, f"two {self.QUOTE} copy"),
                (5, "eval doc with none of those words present at all"),
            ],
        )
        assert training.decontaminate_ngrams(docs).count() == 0

    def test_plan_broadcasts_eval_grams(self, spark):
        docs = self._docs(spark, [(1, "a b c"), (0, "d e f")])
        plan = (
            training.decontaminate_ngrams(docs)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan


def test_decontaminate_bloom_equals_exact(spark):
    """Bloom pruning must change nothing: same planted-leak corpus, the
    pruned+verified pass reproduces the exact pass (no false negatives
    end to end; verify removes the false positives)."""
    quote = TestDecontaminate.QUOTE
    rows = [
        (1, f"train doc quoting {quote} verbatim"),
        (4, f"second train doc also quoting {quote} twice {quote}"),
        (6, "independent train doc with no overlap at all here"),
        (0, f"the eval item says {quote} and more"),
        (5, "another clean eval doc of unrelated words entirely"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    exact = {(r.doc_id, r.n_shared_grams)
             for r in training.decontaminate_ngrams(docs).collect()}
    bloom = {(r.doc_id, r.n_shared_grams)
             for r in training.decontaminate_ngrams_bloom(docs).collect()}
    assert bloom == exact and exact


class TestEvalSample:
    def _docs5(self, spark, n=300):
        langs = ["en", "he", "fr", "de", "es"]
        return spark.createDataFrame(
            [(i, f"text {i}", langs[i % 5]) for i in range(n)],
            "doc_id long, text string, lang string",
        )

    def test_quota_and_rank_contiguous(self, spark):
        out = training.eval_sample(self._docs5(spark), quota=7).collect()
        by_stratum = {}
        for r in out:
            by_stratum.setdefault((r.split, r.lang), []).append(r.pick_rank)
        for ranks in by_stratum.values():
            assert sorted(ranks) == list(range(1, len(ranks) + 1))
            assert len(ranks) <= 7

    def test_growth_stable_prefix(self, spark):
        # adding documents can only push LATER-ranked docs out: any doc
        # kept in the big corpus that existed in the small one was kept
        # there too (hash order is identity-pure, so prefixes nest)
        small = {
            (r.split, r.lang, r.doc_id)
            for r in training.eval_sample(self._docs5(spark, 150), quota=5).collect()
        }
        big = {
            (r.split, r.lang, r.doc_id)
            for r in training.eval_sample(self._docs5(spark, 300), quota=5).collect()
        }
        kept_both = {k for k in big if k[2] < 150}
        assert kept_both <= small

    def test_plan_uses_window_group_limit(self, spark):
        plan = training.eval_sample(self._docs5(spark))._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan


class TestTrainingManifest:
    def test_manifest_records_every_doc_and_agrees_with_parts(self, spark):
        from hebrew_ner_spark.operators import curation
        from hebrew_ner_spark.operators.training import training_manifest

        langs = ["en", "he"]
        docs = spark.createDataFrame(
            [(i, " ".join(f"w{i}x{j}" for j in range(12)), langs[i % 2])
             for i in range(40)],
            "doc_id long, text string, lang string",
        )
        m = {r.doc_id: r for r in training_manifest(docs, mixture_target=20).collect()}
        assert set(m) == set(range(40))  # records, never filters
        # agreement with the standalone operators
        splits = {r.doc_id: r.split for r in training.doc_splits(docs).collect()}
        mix = {r.doc_id for r in curation.mixture_sample(docs, 20).collect()}
        ev = {r.doc_id: r.pick_rank for r in training.eval_sample(docs).collect()}
        for d, r in m.items():
            assert r.split == splits[d]
            assert r.in_mixture == (d in mix)
            assert r.eval_rank == ev.get(d)
            assert r.n_toks == 12


def test_feature_hash_folds_and_preserves_mass(spark):
    from hebrew_ner_spark.functions.hashing import phash_py
    from hebrew_ner_spark.operators.training import FEATURE_BUCKETS, feature_hash

    docs = spark.createDataFrame(
        [(0, "key key row"), (1, "key")], "doc_id long, text string"
    )
    out = feature_hash(docs).collect()
    got = {(r.doc_id, r.bucket): r.cnt for r in out}
    # python-side fold (collisions included — 'key' and 'row' collide
    # mod 64, which is the hashing trick working as designed)
    want = {}
    for doc_id, text in [(0, "key key row"), (1, "key")]:
        for t in text.split(" "):
            k = (doc_id, phash_py(t) % FEATURE_BUCKETS)
            want[k] = want.get(k, 0) + 1
    assert got == want
    assert sum(got.values()) == 4  # token mass preserved through the fold
    assert all(0 <= b < FEATURE_BUCKETS for _, b in got)


def test_global_shuffle_is_permutation(spark):
    docs = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    out = training.global_shuffle(docs, epoch=0, n_shards=8).collect()
    assert sorted(r["pos"] for r in out) == list(range(500))
    assert len({r["doc_id"] for r in out}) == 500
    # round-robin shards balanced to within one row
    from collections import Counter

    c = Counter(r["shard"] for r in out)
    assert max(c.values()) - min(c.values()) <= 1 and len(c) == 8


def test_global_shuffle_epochs_differ_and_are_stable(spark):
    docs = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    e0 = {r["doc_id"]: r["pos"] for r in training.global_shuffle(docs, epoch=0).collect()}
    e0b = {r["doc_id"]: r["pos"] for r in training.global_shuffle(docs, epoch=0).collect()}
    e1 = {r["doc_id"]: r["pos"] for r in training.global_shuffle(docs, epoch=1).collect()}
    assert e0 == e0b                      # rerun-identical (resumable)
    assert e0 != e1                       # fresh permutation per epoch
    assert sorted(e1.values()) == list(range(300))


def test_global_shuffle_not_identity_and_bucket_major(spark):
    # bucket-major order == hash order: positions must follow the
    # python-recomputed hash rank exactly
    import hashlib

    docs = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    got = {r["doc_id"]: r["pos"] for r in training.global_shuffle(docs).collect()}
    keys = {
        d: int(hashlib.md5(f"shuf|0|{d}:977".encode()).hexdigest()[:15], 16)
        for d in range(200)
    }
    want = {d: i for i, d in enumerate(sorted(keys, key=lambda d: (keys[d], d)))}
    assert got == want
    assert any(got[d] != d for d in range(200))


def test_quality_lr_python_replay(spark):
    import hashlib

    docs = spark.createDataFrame(
        [(1, "alpha beta beta"), (2, "theta zeta"), (3, "alpha alpha alpha alpha")],
        "doc_id long, text string",
    )

    def ph(s, seed):
        return int(hashlib.md5(f"{s}:{seed}".encode()).hexdigest()[:15], 16)

    def w(tok):
        b = ph(tok, 0) % training.FEATURE_BUCKETS
        return ph(str(b), training.LR_SEED) % 1000000 - 500000

    import math

    want = {}
    for d, text in [(1, "alpha beta beta"), (2, "theta zeta"), (3, "alpha alpha alpha alpha")]:
        toks = text.split()
        sw, n = sum(w(t) for t in toks), len(toks)
        score = math.floor((2 * sw + n) / (2 * n))
        want[d] = (n, score, int(score > training.LR_THRESHOLD_1E6))
    got = {
        r["doc_id"]: (r["n_tokens"], r["score_1e6"], r["keep"])
        for r in training.quality_lr_scores(docs).collect()
    }
    assert got == want
    # both classes present in this fixture (planted, not assumed)
    assert {v[2] for v in got.values()} == {0, 1}


def test_curriculum_buckets_monotone_and_shuffled(spark):
    rows_ = [(i, " ".join(["w"] * n)) for i, n in
             enumerate([1, 2, 3, 5, 9, 17, 33, 40, 50, 70, 100, 2, 3, 8])]
    docs = spark.createDataFrame(rows_, "doc_id long, text string")
    out = sorted(
        (r["pos"], r["doc_id"], r["diff_bucket"])
        for r in training.curriculum_order(docs).collect()
    )
    # positions are a permutation
    assert [p for p, _, _ in out] == list(range(len(rows_)))
    # difficulty buckets are non-decreasing along the curriculum
    buckets = [b for _, _, b in out]
    assert buckets == sorted(buckets)
    # log2 buckets: 1 token -> 1, 2..3 -> 2, 5 -> 3, 9..15 -> 4 ...
    by_doc = {d: b for _, d, b in out}
    assert by_doc[0] == 1 and by_doc[1] == 2 and by_doc[3] == 3 and by_doc[4] == 4
    # within the size-2..3 bucket the order is hash-shuffled, not doc_id
    same_bucket = [d for _, d, b in out if b == 2]
    assert len(same_bucket) >= 3

"""Curation operators: closed-form fixtures + distributed invariants."""

from __future__ import annotations

import pandas as pd
import pytest

from hebrew_ner_spark.functions.hashing import phash_py
from hebrew_ner_spark.operators import curation


def test_redact_pii_closed_form(spark):
    docs = spark.createDataFrame(
        [
            (1, "write to bob.smith@corp.example.com or 10.0.3.7 now"),
            (2, "clean document with digits 123 and 45.6 only"),
            (3, "call +97-234-5678 twice +1-555-0199 and a@b.io"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in curation.redact_pii(docs).collect()}
    assert out[1]["redacted"] == "write to <EMAIL> or <IP> now"
    assert (out[1]["n_email"], out[1]["n_ip"], out[1]["n_phone"]) == (1, 1, 0)
    # no-PII doc passes through byte-identical with zero counts
    assert out[2]["redacted"] == docs.where("doc_id = 2").first()["text"]
    assert (out[2]["n_email"], out[2]["n_ip"], out[2]["n_phone"]) == (0, 0, 0)
    # +1-555-0199 matches \+\d{1,3}-\d{3}-\d{4}
    assert out[3]["redacted"] == "call <PHONE> twice <PHONE> and <EMAIL>"
    assert (out[3]["n_email"], out[3]["n_phone"]) == (1, 2)


def test_redact_pii_zero_shuffle_plan(spark):
    docs = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    plan = (
        curation.redact_pii(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_repetition_stats_closed_form(spark):
    docs = spark.createDataFrame(
        [
            # 4x "a": bigrams = [a a]x3 -> top2 = 3/3; no 5-grams -> 0
            (1, "a a a a"),
            # all-distinct bigrams and 5-grams: top2 = 1/5, dup5 = 0
            (2, "u v w x y z"),
            # 6 tokens repeating "a b": bigrams a-b x3, b-a x2 -> top2=3/5;
            # 5-grams: "a b a b a", "b a b a b" both distinct -> dup5 = 0
            (3, "a b a b a b"),
            # one token: no bigrams at all -> both 0 (NULL guard)
            (4, "solo"),
            # 10x "r": 5-grams = 6 occurrences of ONE gram -> dup5 = 5/6
            (5, "r r r r r r r r r r"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in curation.repetition_stats(docs).collect()}
    assert out[1]["top2_frac_1e6"] == 1_000_000 and out[1]["dup5_frac_1e6"] == 0
    assert out[2]["top2_frac_1e6"] == 200_000 and out[2]["dup5_frac_1e6"] == 0
    assert out[3]["top2_frac_1e6"] == 600_000 and out[3]["dup5_frac_1e6"] == 0
    assert out[4]["top2_frac_1e6"] == 0 and out[4]["n_tokens"] == 1
    assert out[5]["dup5_frac_1e6"] == 833_333  # round(5/6 * 1e6)


def _brute_sample(pdf: pd.DataFrame, budget: int) -> set[tuple]:
    """Independent pandas replay of the selection contract."""
    pdf = pdf.copy()
    pdf["n_toks"] = pdf.text.str.split(" ").str.len()
    pdf["h"] = [phash_py(f"SMP|{d}", curation.SAMPLE_SEED) for d in pdf.doc_id]
    pdf["bucket"] = pdf.h % curation.N_BUCKETS
    keep = set()
    for lang, g in pdf.groupby("lang"):
        g = g.sort_values(["bucket", "h", "doc_id"])
        cum = 0
        for _, r in g.iterrows():
            cum += r.n_toks
            if cum > budget:
                break
            keep.add((lang, r.doc_id, r.n_toks))
    return keep


@pytest.fixture(scope="module")
def sample_docs(spark):
    rows = [
        (i, "he" if i % 3 else "en", " ".join(f"w{j}" for j in range(5 + i % 37)))
        for i in range(300)
    ]
    return spark.createDataFrame(rows, ["doc_id", "lang", "text"]).cache()


def test_token_budget_matches_independent_reference(spark, sample_docs):
    budget = 900
    got = {
        (r["lang"], r["doc_id"], r["n_toks"])
        for r in curation.token_budget_sample(sample_docs, budget).collect()
    }
    want = _brute_sample(sample_docs.toPandas(), budget)
    assert got == want and got  # non-vacuous


def test_token_budget_partition_invariance(spark, sample_docs):
    budget = 900
    a = {
        tuple(r)
        for r in curation.token_budget_sample(sample_docs, budget).collect()
    }
    b = {
        tuple(r)
        for r in curation.token_budget_sample(
            sample_docs.repartition(13), budget
        ).collect()
    }
    assert a == b


def test_token_budget_respects_budget_and_monotone(spark, sample_docs):
    small = curation.token_budget_sample(sample_docs, 400)
    large = curation.token_budget_sample(sample_docs, 1200)
    s = small.groupBy("lang").sum("n_toks").collect()
    assert all(r["sum(n_toks)"] <= 400 for r in s)
    small_ids = {(r["lang"], r["doc_id"]) for r in small.collect()}
    large_ids = {(r["lang"], r["doc_id"]) for r in large.collect()}
    # bucket-major prefix order => a bigger budget only ever adds docs
    assert small_ids <= large_ids


def test_token_budget_plan_broadcasts_bucket_tables(spark, sample_docs):
    plan = (
        curation.token_budget_sample(sample_docs, 900)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the bucket-prefix tables join back broadcast — no shuffle join on
    # the full corpus side
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_dedup_canonical_keeps_longest_then_min_doc_id(spark):
    """Cluster A: the extended copy (longest text) must be kept even
    though it has the middle doc_id; cluster B: equal lengths fall back
    to min doc_id. Docs outside any cluster never appear."""
    from hebrew_ner_spark.operators.curation import dedup_canonical

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    other = "one two three four five six seven eight nine ten eleven twelve"
    rows = [
        (10, base), (11, base + " extra trailing detail"), (12, base),
        (20, other), (21, other),
        (99, "completely unrelated singleton text with its own words here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.component_id: r for r in dedup_canonical(docs).collect()}
    assert set(got) == {10, 20}
    assert (got[10].keep_doc_id, got[10].n_members, got[10].n_dropped) == (11, 3, 2)
    assert (got[20].keep_doc_id, got[20].n_members, got[20].n_dropped) == (20, 2, 1)


def test_boilerplate_threshold_and_fraction(spark):
    """Planted header gram clears the df threshold; one-off grams and
    too-short docs do not. denom=2 with 4 docs -> boilerplate needs
    df*2 > 4, i.e. df >= 3."""
    from hebrew_ner_spark.operators.curation import (
        boilerplate_fraction,
        boilerplate_ngrams,
    )

    rows = [
        (0, "a b c q0"), (1, "a b c q1"), (2, "a b c q2"),
        (3, "z z z z"), (4, "x y"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    boiler = [(r.gram, r.df) for r in boilerplate_ngrams(docs, denom=2).collect()]
    assert boiler == [("a b c", 3)]

    frac = {r.doc_id: r for r in boilerplate_fraction(docs, denom=2).collect()}
    assert (frac[0].n_grams, frac[0].n_boiler, frac[0].boiler_ratio_1e6) == (
        2, 1, 500000,
    )
    # within-doc repetition of a non-boilerplate gram stays 0
    assert (frac[3].n_grams, frac[3].n_boiler) == (2, 0)
    # shorter than k: no grams, ratio 0
    assert (frac[4].n_grams, frac[4].n_boiler, frac[4].boiler_ratio_1e6) == (0, 0, 0)


def test_ppl_buckets_match_independent_replay(spark, sample_docs):
    """Bucket labels replay exactly from the operator's own scores under
    the integer percentile_disc rule, per language; all three buckets
    are populated and ordering is monotone (head <= middle <= tail)."""
    got = curation.perplexity_buckets(sample_docs).toPandas()
    for lang, grp in got.groupby("lang"):
        vs = sorted(grp.mean_bits_1e6)
        total = len(vs)

        def pct(q):
            cum = 0
            seen = {}
            for v in vs:
                cum += 1
                if v not in seen and 100 * cum >= q * total:
                    return v
            return vs[-1]

        p_head, p_mid = pct(curation.PPL_HEAD_Q), pct(curation.PPL_MID_Q)
        for _, r in grp.iterrows():
            want = (
                "head" if r.mean_bits_1e6 <= p_head
                else "middle" if r.mean_bits_1e6 <= p_mid
                else "tail"
            )
            assert r.bucket == want, (lang, r.doc_id, r.mean_bits_1e6)
        assert set(grp.bucket) == {"head", "middle", "tail"}, lang
        assert grp[grp.bucket == "head"].mean_bits_1e6.max() <= (
            grp[grp.bucket == "tail"].mean_bits_1e6.min()
        )


def test_curation_pipeline_funnel(spark):
    """Each stage drops its target: the short doc fails quality, the
    byte-identical copy loses survivorship to the lower doc_id, the
    worst-scoring docs land in 'tail'; everything kept is head/middle."""
    base = [
        (i, "he", " ".join(f"w{i}t{j}" for j in range(25))) for i in range(12)
    ]
    rows = base + [
        (50, "he", base[0][2]),        # exact dup of doc 0 -> dropped
        (51, "he", "too short"),       # fails quality length floor
        (52, "he", " ".join("w0t0" for _ in range(25))),  # fails type/token
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r.doc_id: r for r in curation.curation_pipeline(docs).collect()}
    assert 50 not in got and 51 not in got and 52 not in got
    assert 0 in got
    assert all(r.bucket in ("head", "middle") for r in got.values())
    # tail must actually exist in the corpus for the cut to be real:
    # thresholds computed over all quality-agnostic docs -> with uniform
    # scores everything can be head/middle; assert at least the funnel
    # kept a strict subset
    assert 0 < len(got) < len(rows)


def test_data_card_shares_sum_to_one(spark, sample_docs):
    card = curation.data_card(sample_docs).toPandas()
    assert (card.n_docs > 0).all()
    # round-half-up micro shares sum to ~1e6 (off by at most #rows/2)
    assert abs(card.share_1e6.sum() - 1_000_000) <= len(card)
    assert set(card.lang) == {"he", "en"}


class TestMixtureSample:
    def _skewed(self, spark):
        # head stratum 900 docs, tail stratum 16 docs
        rows = [(i, f"doc {i}", "en") for i in range(900)]
        rows += [(1000 + i, f"doc {1000+i}", "yo") for i in range(16)]
        return spark.createDataFrame(rows, "doc_id long, text string, lang string")

    def test_temperature_upweights_tail(self, spark):
        docs = self._skewed(spark)
        shares = {r.lang: r for r in curation.mixture_shares(docs, target=300).collect()}
        # natural share of the tail is ~1.7%; sqrt-temperature share must be higher
        assert shares["yo"].target_share_1e6 > shares["yo"].natural_share_1e6
        assert shares["en"].target_share_1e6 < shares["en"].natural_share_1e6
        # keep RATE (threshold/M) must be strictly higher for the tail
        assert shares["yo"].keep_threshold > shares["en"].keep_threshold

    def test_threshold_caps_at_m(self, spark):
        docs = self._skewed(spark)
        shares = {r.lang: r for r in curation.mixture_shares(docs, target=5000).collect()}
        assert shares["yo"].keep_threshold == curation.MIX_M  # keep everything
        assert shares["en"].keep_threshold <= curation.MIX_M

    def test_deterministic_and_subset(self, spark):
        docs = self._skewed(spark)
        a = {r.doc_id for r in curation.mixture_sample(docs, target=300).collect()}
        b = {r.doc_id for r in curation.mixture_sample(docs, target=300).collect()}
        assert a == b
        # monotone in target: smaller target keeps a subset
        small = {r.doc_id for r in curation.mixture_sample(docs, target=100).collect()}
        assert small <= a

    def test_share_table_broadcasts(self, spark):
        docs = self._skewed(spark)
        plan = (
            curation.mixture_sample(docs, target=300)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan


class TestPassageDedup:
    def test_planted_duplicates_and_short_docs(self, spark):
        p10 = " ".join(f"w{i}" for i in range(10))         # one shared passage
        uniq = lambda d: " ".join(f"u{d}x{i}" for i in range(10))
        docs = spark.createDataFrame(
            [
                (1, p10 + " " + uniq(1)),   # passage 1 dup, passage 2 unique
                (2, p10 + " " + uniq(2)),   # same
                (3, "short doc"),           # < 10 tokens -> zero passages
                (4, p10 + " " + p10),       # self-repetition: both dup
            ],
            ["doc_id", "text"],
        )
        got = {r.doc_id: r for r in curation.passage_dedup(docs).collect()}
        assert (got[1].n_passages, got[1].n_dup_passages) == (2, 1)
        assert got[1].dup_frac_1e6 == 500000
        assert (got[3].n_passages, got[3].n_dup_passages, got[3].dup_frac_1e6) == (0, 0, 0)
        assert (got[4].n_passages, got[4].n_dup_passages) == (2, 2)
        assert got[4].dup_frac_1e6 == 1000000

    def test_text_never_shuffles(self, spark):
        docs = spark.createDataFrame(
            [(i, " ".join(f"t{i}x{j}" for j in range(25))) for i in range(8)],
            ["doc_id", "text"],
        )
        plan = (
            curation.passage_dedup(docs)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # every exchange must carry only (doc_id, ph) ints / agg buffers
        import re
        for frag in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan):
            assert "passage" not in frag and "text" not in frag and "toks" not in frag


class TestCdcDedup:
    def test_insert_resistance_vs_fixed_windows(self, spark):
        # doc B = doc A with ONE token inserted at the front. Fixed
        # 10-token tiling shifts every window (passage_dedup finds no
        # dups); content-defined chunks keep their identity after the
        # first boundary, so cdc_dedup still finds shared chunks.
        base = " ".join(f"w{i}" for i in range(64))
        docs = spark.createDataFrame(
            [(1, base), (2, "inserted " + base)], ["doc_id", "text"]
        )
        cdc = {r.doc_id: r for r in curation.cdc_dedup(docs).collect()}
        fixed = {r.doc_id: r for r in curation.passage_dedup(docs).collect()}
        assert fixed[1].n_dup_passages == 0  # tiling sheared every window
        assert cdc[1].n_dup_chunks > 0  # CDC survives the shift
        assert cdc[2].n_dup_chunks > 0

    def test_chunks_partition_the_document(self, spark):
        # chunk texts, joined in order, reconstruct the token stream
        from pyspark.sql import functions as F

        text = " ".join(f"w{i}" for i in range(40))
        docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        toks = docs.select(
            "doc_id", F.split("text", " ").alias("toks")
        ).withColumn("bnd", F.expr(curation.cdc_bounds_expr("toks")))
        chunks = toks.select(
            F.explode(F.expr(curation.cdc_chunks_expr("toks", "bnd"))).alias("chunk")
        ).collect()
        assert " ".join(r.chunk for r in chunks) == text

    def test_identical_docs_fully_duplicated(self, spark):
        text = " ".join(f"w{i}" for i in range(30))
        docs = spark.createDataFrame([(1, text), (2, text)], ["doc_id", "text"])
        got = {r.doc_id: r for r in curation.cdc_dedup(docs).collect()}
        assert got[1].dup_frac_1e6 == 1000000
        assert got[1].n_chunks == got[2].n_chunks > 0


class TestDupSpans:
    def test_planted_cross_doc_duplicate(self, spark):
        from hebrew_ner_spark.operators.curation import dup_span_fraction, dup_spans

        # docs 1/2 share an 8-token substring (>= L=6) at different
        # offsets; doc 3 is clean
        shared = "q w e r t y u i"
        docs = spark.createDataFrame(
            [
                (1, "a1 b1 " + shared + " z1"),
                (2, shared + " a2 b2 c2"),
                (3, "n1 n2 n3 n4 n5 n6 n7 n8 n9"),
            ],
            ["doc_id", "text"],
        )
        got = {r.doc_id: r for r in dup_spans(docs).collect()}
        # doc 1: shared tokens at positions 2..9 -> grams 2..4 -> span 2..9
        assert (got[1].span_start, got[1].span_end, got[1].span_len, got[1].n_grams) == (2, 9, 8, 3)
        # doc 2: positions 0..7 -> grams 0..2
        assert (got[2].span_start, got[2].span_end, got[2].n_grams) == (0, 7, 3)
        assert 3 not in got
        frac = {r.doc_id: r for r in dup_span_fraction(docs).collect()}
        # doc 1: 8 of 11 tokens covered
        assert (frac[1].dup_tokens, frac[1].n_toks) == (8, 11)
        assert frac[1].dup_1e6 == round(8 / 11 * 1e6)
        assert (frac[3].dup_tokens, frac[3].dup_1e6) == (0, 0)

    def test_within_doc_repeat_counts(self, spark):
        from hebrew_ner_spark.operators.curation import dup_spans

        # one doc repeating the same 6 tokens twice: both occurrences of
        # the gram are duplicated (corpus count 2), both spans flagged
        docs = spark.createDataFrame(
            [(1, "a b c d e f x y z w v u a b c d e f")], ["doc_id", "text"]
        )
        got = sorted(
            (r.span_start, r.span_end) for r in dup_spans(docs).collect()
        )
        assert got == [(0, 5), (12, 17)]

    def test_merge_rule_gap_boundary(self, spark):
        from hebrew_ner_spark.operators.curation import dup_spans

        # two dup grams in one doc at positions 0 and 5 (gap 5 = L-1):
        # token spans [0,5] and [5,10] overlap at token 5 -> ONE span
        doc1 = ["a", "b", "c", "d", "e", "f", "v", "w", "x", "y", "z", "pad1"]
        gram_a = doc1[0:6]   # "a b c d e f" at pos 0
        gram_b = doc1[5:11]  # "f v w x y z" at pos 5
        docs = spark.createDataFrame(
            [
                (1, " ".join(doc1)),
                (2, " ".join(gram_a) + " join1 join2"),  # duplicates A
                (3, " ".join(gram_b) + " join3 join4"),  # duplicates B
            ],
            ["doc_id", "text"],
        )
        spans = {r.doc_id: (r.span_start, r.span_end) for r in dup_spans(docs).collect()
                 if r.doc_id == 1}
        assert spans[1] == (0, 10)


class TestChunkWindows:
    def _chunks(self, spark, text, **kw):
        from hebrew_ner_spark.operators.curation import chunk_windows

        df = spark.createDataFrame([(0, text)], "doc_id long, text string")
        return sorted(
            chunk_windows(df, **kw).collect(), key=lambda r: r.chunk_id
        )

    def test_short_doc_single_chunk(self, spark):
        out = self._chunks(spark, "a b c", w=8, s=4)
        assert len(out) == 1
        assert (out[0].start, out[0].n_tokens, out[0].chunk) == (0, 3, "a b c")

    def test_exact_window_single_chunk(self, spark):
        out = self._chunks(spark, "a b c d", w=4, s=2)
        assert len(out) == 1 and out[0].n_tokens == 4

    def test_stride_overlap_and_tail(self, spark):
        # 7 tokens, w=4 s=2 -> starts 0,2,4 (ceil(3/2)=2): tail len 3
        out = self._chunks(spark, "t0 t1 t2 t3 t4 t5 t6", w=4, s=2)
        assert [(r.start, r.n_tokens) for r in out] == [(0, 4), (2, 4), (4, 3)]
        assert out[1].chunk == "t2 t3 t4 t5"

    def test_total_coverage(self, spark):
        # every token index is inside at least one chunk
        toks = [f"w{i}" for i in range(13)]
        out = self._chunks(spark, " ".join(toks), w=5, s=3)
        covered = set()
        for r in out:
            covered |= set(range(r.start, r.start + r.n_tokens))
        assert covered == set(range(13))


def test_triples_in_dup_spans_planted(spark):
    """Two docs sharing a 8-token window that embeds a triple -> that
    triple flags in_dup=1 in both docs; a triple outside any duplicated
    span stays 0."""
    from hebrew_ner_spark.operators import curation

    shared = "alpha beta gamma table join key delta epsilon"
    rows = [
        (1, f"unique1 words here {shared} tail1"),
        (2, f"other2 prefix2 goes {shared} tail2"),
        (3, "scan table filter key nothing duplicated at all here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = curation.triples_in_dup_spans(docs)
    rs = {(r.doc_id, r.subj, r.pred, r.obj): r.in_dup for r in out.collect()}
    assert rs[(1, "table", "join", "key")] == 1
    assert rs[(2, "table", "join", "key")] == 1
    assert rs[(3, "table", "filter", "key")] == 0
    share = curation.pred_dup_evidence(docs).collect()
    by_pred = {r.pred: (r.n_occ, r.n_dup, r.dup_share_1e6) for r in share}
    assert by_pred["join"] == (2, 2, 1_000_000)
    assert by_pred["filter"] == (1, 0, 0)


def test_dedup_quality_priority_survivor(spark):
    from hebrew_ner_spark.operators import curation
    from hebrew_ner_spark.operators.training import quality_lr_scores

    # two exact near-dup clusters planted: identical long texts with a
    # one-token quality twist (clean copy vs copy padded with a
    # negative-weight token 'theta' x3 — same shingle set is not needed,
    # identical text IS a near-dup cluster; the padded variant differs
    # only in trailing tokens so Jaccard stays >= threshold)
    base = "the key join order sort table customer supplier part region " * 4
    rows_ = [
        (1, base.strip()),
        (2, (base + "theta theta theta").strip()),   # dirtier, longer
        (3, base.strip() + " extra"),
        (10, "entirely different unrelated content words here"),
    ]
    docs = spark.createDataFrame(rows_, "doc_id long, text string")
    out = {r["component_id"]: (r["keep_doc_id"], r["n_members"])
           for r in curation.dedup_quality_priority(docs).collect()}
    # cluster of {1, 2, 3}: quality-priority must NOT keep the longest
    # (2, theta-padded) if its score is lower — verify against scores
    scores = {r["doc_id"]: r["score_1e6"]
              for r in quality_lr_scores(docs).collect()}
    assert len(out) == 1
    comp_id, (keep, n) = next(iter(out.items()))
    members = [1, 2, 3]
    assert n == 3
    best = max(members, key=lambda d: (scores[d], -d))
    assert keep == best
    assert scores[2] < scores[1]   # the padded copy scored worse


# ---------------------------------------------------------------------------
# DSIR importance resampling
# ---------------------------------------------------------------------------


def test_dsir_weights_match_python_model(spark):
    """Hand-built corpus: target docs (source in DSIR_TARGET_SRC) repeat
    a marker phrase; the DSIR weight of a fresh marker-heavy doc must
    exceed a filler doc's, and every weight must equal an independent
    pure-python replay of the hashed-LUT arithmetic."""
    from hebrew_ner_spark.functions.hashing import phash_py

    tgt_src = curation.DSIR_TARGET_SRC[0]
    rows_ = []
    for i in range(8):
        rows_.append((i, "alpha beta alpha beta gamma", tgt_src))
    for i in range(8, 24):
        rows_.append((i, f"filler{i} junk{i} noise{i} blob{i}", "srcZ"))
    rows_.append((24, "alpha beta gamma alpha", "srcZ"))      # target-like
    rows_.append((25, "zzz yyy xxx www", "srcZ"))             # corpus-like
    docs = spark.createDataFrame(rows_, "doc_id long, text string, source string")

    w = {r.doc_id: (r.n_feats, r.weight_bits)
         for r in curation.dsir_weights(docs).collect()}

    # independent python model
    def feats(text):
        toks = text.split(" ")
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        out = {}
        for g in grams:
            f = phash_py(g, curation.DSIR_SEED) % curation.DSIR_B
            out[f] = out.get(f, 0) + 1
        return out

    tp, tq = {}, {}
    for _id, text, src in rows_:
        for f, c in feats(text).items():
            tq[f] = tq.get(f, 0) + c
            if src in curation.DSIR_TARGET_SRC:
                tp[f] = tp.get(f, 0) + c
    buckets = sorted(tq)
    TP = sum(1 + tp.get(f, 0) for f in buckets)
    TQ = sum(1 + tq[f] for f in buckets)
    score = {
        f: ((1 + tp.get(f, 0)).bit_length() - TP.bit_length())
           - ((1 + tq[f]).bit_length() - TQ.bit_length())
        for f in buckets
    }
    for _id, text, _src in rows_:
        fs = feats(text)
        exp_w = sum(c * score[f] for f, c in fs.items())
        assert w[_id] == (sum(fs.values()), exp_w), f"doc {_id}"

    # the marker-heavy doc outranks the filler doc per mean bits
    n24, w24 = w[24]
    n25, w25 = w[25]
    assert w24 * n25 > w25 * n24


def test_dsir_sample_threshold_and_tie_inclusion(spark):
    """keep=1 iff mean micro-bits >= the exact percentile_disc(75); all
    boundary ties are kept (deterministic inclusion)."""
    tgt = curation.DSIR_TARGET_SRC[0]
    rows_ = [(i, "alpha beta gamma", tgt) if i % 4 == 0
             else (i, f"x{i} y{i} z{i}", "srcZ") for i in range(40)]
    docs = spark.createDataFrame(rows_, "doc_id long, text string, source string")
    out = curation.dsir_sample(docs).collect()
    vals = sorted(r.mean_wbits_1e6 for r in out)
    import math
    th = vals[math.ceil(curation.DSIR_KEEP_Q / 100 * len(vals)) - 1]
    for r in out:
        assert r.keep == (1 if r.mean_wbits_1e6 >= th else 0)
    kept = [r for r in out if r.keep]
    assert kept and len(kept) < len(out)

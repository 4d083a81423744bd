

class TestTrigramScore:
    def test_common_vs_rare(self, spark):
        # 'abcd' in 9/10 docs -> its trigrams are common; 'zzzz' only in
        # one -> rare. DF threshold: df * 10 > 10  <=>  df >= 2.
        rows = [(i, "abcd", "he") for i in range(9)] + [(9, "zzzz", "he")]
        docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        from hebrew_ner_spark.operators.textstats import trigram_score

        got = {r.doc_id: (r.n_trigrams, r.n_common) for r in trigram_score(docs).collect()}
        assert got[0] == (2, 2)  # 'abc','bcd' both df=9 -> common
        assert got[9] == (1, 0)  # distinct trigrams of 'zzzz' = {'zzz'}, df=1 -> rare


class TestUnigramSurprisal:
    def test_closed_form(self, spark):
        # Corpus: doc0 = "a a b", doc1 = "a c". Occurrences T=5 (bitlen 3).
        # counts: a=3 (bitlen 2), b=1 (bitlen 1), c=1 (bitlen 1).
        # surprisal: a -> 3-2=1 bit, b/c -> 3-1=2 bits.
        rows = [(0, "a a b", "he"), (1, "a c", "he")]
        docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        from hebrew_ner_spark.operators.textstats import unigram_surprisal

        got = {r.doc_id: r for r in unigram_surprisal(docs).collect()}
        assert (got[0].n_tokens, got[0].surprisal_bits) == (3, 1 + 1 + 2)
        assert (got[1].n_tokens, got[1].surprisal_bits) == (2, 1 + 2)
        # round-half-up micro-bits: doc0 4/3 -> 1333333, doc1 3/2 -> 1500000
        assert got[0].mean_bits_1e6 == 1333333
        assert got[1].mean_bits_1e6 == 1500000

    def test_rare_scores_above_common(self, spark):
        # A doc of one-off gibberish tokens must score strictly above a
        # doc made of the corpus's common token -- the filter's ordering
        # contract (high mean bits == perplexity outlier).
        rows = [(i, "the the the the", "he") for i in range(8)]
        rows.append((8, "qz xv jk wq", "he"))
        docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        from hebrew_ner_spark.operators.textstats import unigram_surprisal

        got = {r.doc_id: r.mean_bits_1e6 for r in unigram_surprisal(docs).collect()}
        assert got[8] > got[0]


class TestBigramScore:
    def test_closed_form_seen_and_backoff(self, spark):
        from hebrew_ner_spark.operators.textstats import bigram_score

        # corpus: "a b" x3 and "b a" x1.
        # unigrams: a=4, b=4; T=8. bigrams: (a,b)=3, (b,a)=1.
        docs = spark.createDataFrame(
            [(1, "a b"), (2, "a b"), (3, "a b"), (4, "b a")],
            ["doc_id", "text"],
        )
        got = {r.doc_id: r for r in bigram_score(docs).collect()}
        # doc 1: first 'a' -> bitlen(8)-bitlen(4) = 4-3 = 1;
        #        pair (a,b) seen -> bitlen(4)-bitlen(3) = 3-2 = 1; total 2
        assert (got[1].n_scored, got[1].n_backoff, got[1].bits) == (2, 0, 2)
        assert got[1].mean_bits_1e6 == 1_000_000
        # doc 4: first 'b' -> 1; pair (b,a) seen -> bitlen(4)-bitlen(1) = 2
        assert (got[4].n_scored, got[4].bits) == (2, 3)

    def test_self_scoring_never_backs_off(self, spark):
        # a bigram in the scored corpus is by definition in the LM corpus
        # when self-scoring — n_backoff must be 0 (catches a broken join)
        from hebrew_ner_spark.operators.textstats import bigram_score

        docs = spark.createDataFrame(
            [(1, "a b a"), (2, "b b c")], ["doc_id", "text"]
        )
        rows = bigram_score(docs).collect()
        assert all(r.n_backoff == 0 for r in rows)

    def test_delta_scoring_backs_off_on_unseen_order(self, spark):
        from hebrew_ner_spark.operators.textstats import BACKOFF_BITS, bigram_score

        # LM corpus: "a b" x4 (unigrams a=4, b=4, T=8; bigram (a,b)=4).
        # Delta doc "b a": first 'b' -> bitlen(8)-bitlen(4) = 1;
        # pair (b,a) UNSEEN -> 2 + bitlen(8) - bitlen(4) = 3. total 4.
        lm = spark.createDataFrame(
            [(i, "a b") for i in range(4)], ["doc_id", "text"]
        )
        delta = spark.createDataFrame([(100, "b a")], ["doc_id", "text"])
        [r] = bigram_score(delta, lm_docs=lm).collect()
        assert (r.n_scored, r.n_backoff, r.bits) == (2, 1, 1 + BACKOFF_BITS + 1)
        assert r.mean_bits_1e6 == 2_000_000


def test_winnow_guarantee_and_edges(spark):
    """Winnowing guarantee: docs sharing a token run of length
    >= w + k - 1 share at least one fingerprint hash; short-doc edges
    are exact; every fp is the portable hash of its gram."""
    from hebrew_ner_spark.functions.hashing import phash_py
    from hebrew_ner_spark.operators.textstats import (
        FINGERPRINT_K,
        WINNOW_W,
        winnow_fingerprints,
    )

    run = "spark scan table join row merge key order"  # w + k - 1 = 8 tokens
    docs = spark.createDataFrame(
        [
            (0, "the a value " + run + " group hash"),
            (1, run + " window filter stream data the a"),
            (2, "key order join"),          # < k tokens -> no fingerprints
            (3, "key order join row merge"),  # exactly k -> single window
        ],
        "doc_id long, text string",
    )
    out = winnow_fingerprints(docs).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc[0] and {x.fp for x in by_doc[0]})
    assert {x.fp for x in by_doc[0]} & {x.fp for x in by_doc[1]}, "guarantee violated"
    assert 2 not in by_doc
    assert len(by_doc[3]) == 1 and by_doc[3][0].pos == 0
    assert by_doc[3][0].fp == phash_py("key order join row merge")
    # positional self-containment on doc 0
    toks0 = ("the a value " + run + " group hash").split(" ")
    for r in by_doc[0]:
        gram = " ".join(toks0[r.pos : r.pos + FINGERPRINT_K])
        assert r.fp == phash_py(gram)
    # density: selections are a strict subset of gram positions
    n_grams0 = len(toks0) - FINGERPRINT_K + 1
    assert 1 <= len(by_doc[0]) < n_grams0
    assert WINNOW_W > 1


class TestHeapsCurve:
    def test_first_positions_closed_form(self, spark):
        from hebrew_ner_spark.operators import textstats

        docs = spark.createDataFrame(
            [(0, "a b c a b c"), (1, "a b c d e f")], ["doc_id", "text"]
        )
        got = {
            r.sh: r.first_pos
            for r in textstats.shingle_first_pos(docs).collect()
        }
        # doc 0 positions 0..3; doc 1 offset 6, positions 6..9
        assert got == {
            "a b c": 0, "b c a": 1, "c a b": 2,
            "b c d": 7, "c d e": 8, "d e f": 9,
        }

    def test_curve_monotone_and_total(self, spark, sf_dir):
        from hebrew_ner_spark.operators import textstats
        from hebrew_ner_spark.sources.catalog import load_table

        docs = load_table(spark, sf_dir, "documents")
        rows = sorted(
            textstats.heaps_curve(docs).collect(), key=lambda r: r.kbit
        )
        assert rows
        assert all(r.checkpoint == (1 << r.kbit) - 1 for r in rows)
        v = [r.vocab_size for r in rows]
        assert v == sorted(v)
        assert v[-1] == textstats.shingle_first_pos(docs).count()

    def test_short_docs_skipped(self, spark):
        from hebrew_ner_spark.operators import textstats

        docs = spark.createDataFrame(
            [(0, "a b"), (1, "x y z")], ["doc_id", "text"]
        )
        got = {
            r.sh: r.first_pos
            for r in textstats.shingle_first_pos(docs).collect()
        }
        # doc 0 is shorter than k=3: contributes positions (offset 2) but
        # no shingles
        assert got == {"x y z": 2}


def test_kneser_ney_fraction_parity(spark):
    """Exact-Fraction replay of interpolated KN: probabilities match
    the textbook formula, every context sums to exactly 1, and the
    continuation weighting differs from raw-frequency backoff."""
    from fractions import Fraction

    from hebrew_ner_spark.operators import textstats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = textstats.kneser_ney_bigrams(docs).collect()
    texts = [r.text for r in docs.collect()]
    big = {}
    for t in texts:
        toks = t.split(" ")
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    c1, n1w1, n1c2 = {}, {}, {}
    for (a, b), c in big.items():
        c1[a] = c1.get(a, 0) + c
        n1w1[a] = n1w1.get(a, 0) + 1
        n1c2[b] = n1c2.get(b, 0) + 1
    n1b = len(big)
    D = Fraction(3, 4)
    for r in rows:
        p = (
            Fraction(max(big[(r.w1, r.w2)] - D, 0), c1[r.w1])
            + D * n1w1[r.w1] / c1[r.w1] * Fraction(n1c2[r.w2], n1b)
        )
        assert r.p_1e6 == int(p * 1_000_000)  # truncating DIV
        assert r.c12 == big[(r.w1, r.w2)]
    # normalization: full-vocab sum per context is exactly one
    vocab = {w for pair in big for w in pair} | {
        w for t in texts for w in t.split(" ")
    }
    some_w1 = rows[0].w1
    tot = sum(
        Fraction(max(big.get((some_w1, w2), 0) - D, 0), c1[some_w1])
        + D * n1w1[some_w1] / c1[some_w1] * Fraction(n1c2.get(w2, 0), n1b)
        for w2 in vocab
    )
    assert tot == 1
    ok_rows = textstats.kneser_ney_normalization(docs).collect()
    assert all(r.ok == 1 and r.lhs == r.den for r in ok_rows)

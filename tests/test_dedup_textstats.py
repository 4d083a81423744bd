"""Unit tests for dedup + textstats operators (sf0.001 + hand-built frames)."""

import pytest
from pyspark.sql import Row, functions as F

from hebrew_ner_spark.operators import dedup, textstats

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def _mini(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t)) for i, t in enumerate(texts)]
    )


def test_exact_dup_groups_finds_planted_dups(spark):
    d = _mini(spark, ["a b c", "a b c", "x y z", "a b c"])
    rows = dedup.exact_dup_groups(d).collect()
    assert len(rows) == 1
    assert rows[0].n_docs == 3
    assert rows[0].canonical_doc_id == 0  # deterministic min survivor


def test_minhash_identical_texts_share_signature(spark):
    d = _mini(spark, ["the quick brown fox jumps", "the quick brown fox jumps", "zz yy xx ww vv"])
    sig = dedup.minhash_signatures(d).toPandas()
    s0 = sig[sig.doc_id == 0].sort_values("seed").minhash.tolist()
    s1 = sig[sig.doc_id == 1].sort_values("seed").minhash.tolist()
    s2 = sig[sig.doc_id == 2].sort_values("seed").minhash.tolist()
    assert len(s0) == dedup.NUM_HASHES
    assert s0 == s1
    assert s0 != s2


def test_lsh_pairs_and_jaccard_on_planted_near_dup(spark):
    base = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"
    near = "w0 w1 w2 w3 w4 w5 w6 w7 w8 zz"  # 1-token tail edit
    far = "q0 q1 q2 q3 q4 q5 q6 q7 q8 q9"
    d = _mini(spark, [base, near, far])
    pairs = {(r.doc_a, r.doc_b) for r in dedup.lsh_candidate_pairs(d).collect()}
    assert (0, 1) in pairs
    verified = dedup.near_dup_jaccard(d, threshold=0.5).collect()
    assert {(r.doc_a, r.doc_b) for r in verified} == {(0, 1)}
    # 10 tokens -> 8 3-gram shingles; only the last differs: 7 shared / 9 union
    assert verified[0].jaccard_1e6 == round(7 / 9 * 1e6)


def test_zip_shingle_fast_path_parity(spark):
    """The codegen zip-shingle scan (_shingle_rows) must agree with the
    distinct doc_shingles scan everywhere min-aggregation consumes it:
    same DISTINCT shingle sets, bit-identical minhash signatures and band
    keys. Edge cases pinned: doc shorter than k tokens (no shingles), doc
    of exactly k tokens (one shingle), repeated shingles inside one doc
    (duplicates must not change any minimum)."""
    d = _mini(
        spark,
        [
            "a b",                       # < k: no shingles at all
            "a b c",                     # == k: exactly one shingle
            "a b a b a b a b",           # every shingle duplicated
            "w0 w1 w2 w3 w4 w5 w0 w1 w2" # wraps, mixed dupes
        ],
    )
    fast = dedup._shingle_rows(d)
    assert set(map(tuple, fast.distinct().collect())) == set(
        map(tuple, dedup.doc_shingles(d).collect())
    )
    assert fast.filter("doc_id = 0").count() == 0
    assert fast.filter("doc_id = 1").count() == 1
    sig_fast = sorted(map(tuple, dedup.minhash_signatures(d).collect()))
    sig_ref = sorted(
        map(
            tuple,
            dedup._minhash_wide(dedup.doc_shingles(d), dedup.NUM_HASHES)
            .selectExpr(
                "doc_id",
                "stack(%d, %s) as (seed, minhash)"
                % (
                    dedup.NUM_HASHES,
                    ", ".join(f"{s}, h{s}" for s in range(dedup.NUM_HASHES)),
                ),
            )
            .collect(),
        )
    )
    assert sig_fast == sig_ref
    bk_fast = set(map(tuple, dedup._band_keys(d).collect()))
    bk_ref = set(
        map(tuple, dedup.band_keys_from_shingles(dedup.doc_shingles(d)).collect())
    )
    assert bk_fast == bk_ref


def test_simhash_blocking_is_lossless_within_radius(spark, docs):
    """Pigeonhole: every pair within Hamming<=3 must share a 15-bit block,
    so banding output == brute-force output."""
    sim = dedup.simhash(docs.limit(60)).toPandas()
    brute = set()
    vals = list(zip(sim.doc_id, sim.simhash))
    for i, (ida, ha) in enumerate(vals):
        for idb, hb in vals[i + 1 :]:
            if bin(ha ^ hb).count("1") <= dedup.HAMMING_MAX:
                brute.add((min(ida, idb), max(ida, idb)))
    blocked = {
        (r.doc_a, r.doc_b)
        for r in dedup.simhash_near_pairs(docs.limit(60)).collect()
    }
    assert blocked == brute


def test_doc_stats_short_doc_guard(spark):
    d = _mini(spark, ["one two", "the a the a"])
    out = {r.doc_id: r for r in textstats.doc_stats(d).collect()}
    assert out[0].n_tokens == 2 and out[0].n_types == 2
    assert out[1].stopword_ratio_1e6 == 1_000_000


def test_fingerprint_short_doc_fallback(spark):
    d = _mini(spark, ["only three words"])  # < FINGERPRINT_K tokens
    assert textstats.doc_fingerprints(d).count() == 1


def test_lang_id_hebrew(spark):
    d = _mini(spark, ["שלום עולם טוב", "hello world", "1234 !!"])
    out = {r.doc_id: r.detected_lang for r in textstats.lang_id(d).collect()}
    assert out == {0: "he", 1: "en", 2: "und"}


def test_normalizers_match_reference_semantics(spark):
    d = _mini(spark, ["אבג ךםןףץ שנים 123"])
    r = d.select(
        textstats.normalize_digits(F.col("text")).alias("d"),
        textstats.normalize_hebrew_finals(F.col("text")).alias("f"),
    ).collect()[0]
    assert r.d.endswith("000")
    assert "ך" not in r.f and "כ" in r.f


def test_gershayim_normalization(spark):
    d = _mini(spark, ['צה"ל is an acronym, "quote" stays'])
    r = d.select(textstats.normalize_gershayim(F.col("text")).alias("g")).collect()[0]
    assert "צה״ל" in r.g           # inside Hebrew word -> gershayim
    assert '"quote"' in r.g        # plain quotes untouched


def test_normal_ci_formula():
    from hebrew_ner_spark.operators.labels import normal_ci

    assert abs(normal_ci(0.5, 100) - 1.96 * 0.05) < 1e-12
    assert normal_ci(1.0, 50) == 0.0


def test_subword_regex_engine_parity_fuzz(spark):
    """The BPE pretokenizer count must scan identically under Java regex
    (leftmost-first) and RE2 (leftmost-longest). Fuzz with adversarial
    mixes — Hebrew/Latin/digit runs, unicode punctuation, tabs/newlines,
    repeated spaces, leading/trailing separators — far nastier than the
    space-separated corpus the gate checks."""
    import random

    import duckdb

    from hebrew_ner_spark.operators import textstats

    rng = random.Random(20260817)
    alphabet = list("abzאבת019 .!\"'-—₪\t\n\x0b\f\r\x85 ") + [
        "  ", " .", ". ", "a1", "1א", "a\x0bb", " a"
    ]
    cases = ["", " ", "   ", "\t\n", "a", " a", "a ", "א1.b",
             "a\x0bb", "a\x85b", "a b", "\x0b", " \x0b "]
    cases += ["".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 40)))
              for _ in range(300)]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "doc_id long, text string"
    )
    got = {r.doc_id: r.n_subword_tokens
           for r in textstats.subword_counts(docs).collect()}
    con = duckdb.connect()
    for i, t in enumerate(cases):
        # the SAME pattern constant the operator uses — no third copy
        (exp,) = con.execute(
            "SELECT len(regexp_extract_all(?, ?))", [t, textstats.BPE_REGEX]
        ).fetchone()
        assert got[i] == exp, (i, repr(cases[i]), got[i], exp)


class TestLshProbeDelta:
    def test_incremental_equals_full_restricted(self, spark):
        from hebrew_ner_spark.operators import dedup

        boiler = "the same boilerplate page body repeated across mirror hosts"
        other = "an entirely different page about streams joins and windows"
        rows = [
            (0, boiler), (2, boiler),              # base dup pair (0,2)
            (4, other),                            # base unique
            (1, boiler),                           # delta copy of base dups
            (3, other + " with a tail"),           # delta near-copy of 4
            (5, "unique delta text nothing shares these words at all"),
            (7, other + " with a tail"),           # delta dup of 3
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        base = docs.where("doc_id % 2 = 0")
        delta = docs.where("doc_id % 2 = 1")

        probe = {(r.doc_a, r.doc_b)
                 for r in dedup.lsh_probe_delta(base, delta).collect()}
        full = {(r.doc_a, r.doc_b)
                for r in dedup.lsh_candidate_pairs(docs).collect()}
        want = {p for p in full if p[0] % 2 == 1 or p[1] % 2 == 1}
        assert probe == want
        # base-only pair (0,2) must NOT be produced by the probe
        assert (0, 2) in full and (0, 2) not in probe
        # cross (base x delta) and intra (delta x delta) pairs both present
        assert (0, 1) in probe and (1, 2) in probe   # cross
        assert (3, 7) in probe                        # intra


def test_vocab_richness_closed_form(spark):
    """Constructed corpus: trigram abundances {t1: 1, t2: 2, t3: 3} per
    the sliding window — Chao1 and Good-Turing must hit closed forms,
    including the bias-corrected f2=0 branch."""
    from hebrew_ner_spark.operators.textstats import vocab_richness

    # 'a b c b c d' -> trigrams: 'a b c','b c b','c b c','b c d' (all 1x)
    docs = spark.createDataFrame(
        [(1, "a b c b c d", "xx")], "doc_id long, text string, lang string"
    )
    r = vocab_richness(docs).collect()[0]
    assert (r.n_tokens, r.n_types, r.f1, r.f2) == (4, 4, 4, 0)
    assert r.chao1 == 4 + (4 * 3) // 2           # f2=0 branch: S + f1(f1-1)/2
    assert r.unseen_p_1e6 == 1_000_000           # all hapax

    # duplicated doc -> every trigram count 2: f1=0, f2=4, chao1=S
    docs2 = spark.createDataFrame(
        [(1, "a b c b c d", "yy"), (2, "a b c b c d", "yy")],
        "doc_id long, text string, lang string",
    )
    r2 = [x for x in vocab_richness(docs2).collect() if x.lang == "yy"][0]
    assert (r2.n_tokens, r2.n_types, r2.f1, r2.f2) == (8, 4, 0, 4)
    assert r2.chao1 == 4 + (2 * 0 * 0 + 2 * 4) // (4 * 4)  # = S (+0 half-up)
    assert r2.unseen_p_1e6 == 0


def test_zipf_buckets_slope_on_zipfian_and_flat_corpora(spark):
    """A constructed Zipfian corpus (freq = 64 >> rank_kbit) must show
    mean frequency bits falling ~1 per rank-bitlen bucket; the synthetic
    sf corpus's closed vocabulary reads flat — both behaviors are the
    audit's point. Values checked against a python replay."""
    from hebrew_ner_spark.operators.textstats import zipf_buckets

    words = []
    for r in range(1, 32):                 # freq(r) = 2^(6 - bitlen(r))
        words += [f"w{r:02d}"] * (1 << (6 - r.bit_length()))
    docs = spark.createDataFrame(
        [(1, " ".join(words), "xx")], "doc_id long, text string, lang string"
    )
    out = {r.rank_kbit: r for r in zipf_buckets(docs).collect()}

    import collections
    cnt = collections.Counter(words)
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    buckets = collections.defaultdict(list)
    for i, (_, c) in enumerate(ranked, start=1):
        buckets[i.bit_length()].append(c)
    for kb, cs in buckets.items():
        r = out[kb]
        assert (r.n_types, r.min_freq, r.max_freq) == (
            len(cs), min(cs), max(cs))
        exp = (2 * sum(c.bit_length() for c in cs) * 1_000_000 + len(cs)) // (
            2 * len(cs))
        assert r.mean_freq_bits_1e6 == exp
    # slope: each bucket's mean bits strictly below the previous
    kbs = sorted(buckets)
    means = [out[k].mean_freq_bits_1e6 for k in kbs]
    assert all(a > b for a, b in zip(means, means[1:]))


def test_rake_keyphrases_hand_computed(spark):
    from hebrew_ner_spark.operators.textstats import RAKE_SCALE, rake_keyphrases

    # "deep learning" and "deep nets" co-occur; stopwords split segments
    docs = spark.createDataFrame(
        [(1, "deep learning is the future of deep nets")],
        ["doc_id", "text"],
    )
    # segments: [deep learning] [future] [deep nets]
    # freq: deep 2, learning 1, future 1, nets 1
    # deg:  deep 2+2=4, learning 2, future 1, nets 2
    s = lambda deg, freq: (deg * RAKE_SCALE) // freq
    want = {
        "deep learning": s(4, 2) + s(2, 1),
        "future": s(1, 1),
        "deep nets": s(4, 2) + s(2, 1),
    }
    got = {r.phrase: r.rake_scaled for r in rake_keyphrases(docs).collect()}
    assert got == want


def test_rake_repeated_phrase_collapses(spark):
    from hebrew_ner_spark.operators.textstats import rake_keyphrases

    docs = spark.createDataFrame(
        [(1, "big data and big data")], ["doc_id", "text"]
    )
    rows = rake_keyphrases(docs).collect()
    assert len(rows) == 1 and rows[0].phrase == "big data"

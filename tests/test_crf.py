"""CRF decode unit tests: the beam DP vs brute-force enumeration, batch
Viterbi vs per-sentence brute force, and non-triviality of the decode."""

import itertools
import random

import numpy as np

from hebrew_ner_spark.operators.crf import (
    LABELS,
    SeededCRF,
    viterbi_decode_batch,
)


def _brute(crf, tokens, k):
    """All 5^T paths ranked by (score DESC, path ASC front-lex)."""
    L = crf.n_labels
    out = []
    ems = [crf.emission_row(t) for t in tokens]
    for path in itertools.product(range(L), repeat=len(tokens)):
        s = crf.start[path[0]] + crf.end[path[-1]]
        s += sum(ems[t][path[t]] for t in range(len(tokens)))
        s += sum(crf.trans[path[t - 1]][path[t]] for t in range(1, len(tokens)))
        out.append((s, path))
    out.sort(key=lambda sp: (-sp[0], sp[1]))
    return out[:k]


def test_nbest_beam_equals_enumeration():
    crf = SeededCRF()
    rng = random.Random(20260817)
    vocab = ["spark", "table", "key", "agg", "row", "value", "the", "a"]
    for _ in range(60):
        tokens = [rng.choice(vocab) for _ in range(rng.randint(1, 5))]
        assert crf.decode_nbest(tokens, 3) == _brute(crf, tokens, 3)
        # the dedicated 1-best DP must agree with the enumeration too
        assert crf.decode(tokens) == _brute(crf, tokens, 1)[0]


def test_viterbi_is_not_positionwise_argmax():
    """The transition matrix must matter: on enough sentences the best
    PATH disagrees with the per-position emission argmax."""
    crf = SeededCRF()
    rng = random.Random(7)
    vocab = ["spark", "table", "key", "agg", "row", "value", "the", "a"]
    diverged = 0
    for _ in range(40):
        tokens = [rng.choice(vocab) for _ in range(4)]
        _, path = crf.decode(tokens)
        argmax = tuple(
            max(range(5), key=lambda l: crf.emission_row(t)[l]) for t in tokens
        )
        diverged += path != argmax
    assert diverged > 5


def test_batch_viterbi_matches_bruteforce_floats():
    rng = np.random.default_rng(42)
    L = len(LABELS)
    n, max_len = 6, 5
    lengths = np.array([5, 4, 3, 2, 1, 5])
    scores = rng.normal(size=(n, max_len, L))
    trans = rng.normal(size=(L, L))
    start = rng.normal(size=L)
    end = rng.normal(size=L)
    got = viterbi_decode_batch(scores, lengths, trans, start, end)
    for b in range(n):
        T = int(lengths[b])
        best = max(
            itertools.product(range(L), repeat=T),
            key=lambda p: start[p[0]]
            + end[p[-1]]
            + sum(scores[b, t, p[t]] for t in range(T))
            + sum(trans[p[t - 1], p[t]] for t in range(1, T)),
        )
        assert tuple(got[b, :T]) == best


def test_full_corpus_rank1_equals_viterbi(spark):
    """On the real corpus (no length cap), the n-best rank-1 path must
    equal the 1-best Viterbi output — the two code paths share weights
    but not plumbing, so this guards the table operators at a grain the
    enumeration oracle can't reach."""
    from pyspark.sql import functions as F

    from hebrew_ner_spark.operators import crf

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").where(
        "doc_id < 40"
    )
    toks = docs.select("doc_id", F.split("text", " ").alias("toks"))
    vit = crf.viterbi_labels(toks).toPandas()
    nb1 = (
        crf.nbest_labels(toks, k=3)
        .where("rank = 1")
        .drop("rank", "path_score")
        .toPandas()
    )
    key = ["doc_id", "word_index"]
    a = vit.sort_values(key).reset_index(drop=True)
    b = nb1[["doc_id", "word_index", "token", "label"]].sort_values(key).reset_index(drop=True)
    assert a.equals(b)
    assert len(a) > 1000

"""Differential parity for the byte-identical tokenizer surface (T1/T2):
execute the REFERENCE tokenizer module (self-contained, stdlib-only —
exec'd from the read-only checkout at test time, never vendored) against
our reimplementation on randomized mixed-script text."""

import random
from pathlib import Path

import pytest

from hebrew_ner_spark.functions.tokenizer import scan_tokens, split_sentences

REF = Path("/root/reference/utils/tokenizer.py")


@pytest.fixture(scope="module")
def ref():
    if not REF.exists():
        pytest.skip("reference checkout not available")
    ns: dict = {}
    exec(compile(REF.read_text(), str(REF), "exec"), ns)  # noqa: S102
    return ns


PIECES = [
    "שלום", "עולם", "בית", "גן", 'צה"ל', "ה'", "אב-גד", "שנים",
    "hello", "World", "a", "ab", "U.S.A",
    "123", "45.6", "1,000", "50%", "+7", "3:45", "1/2",
    ".", "!", "?", "...", "!!", "?!", ",", ";", ":", "-",
    "(", ")", "[", "]", '"', "'",
    "א.", "1.", "ב.ג.", "י.א.בנק",
    "http://x.co/y", 'w"xyz', 'ח"ברה',
]
WS = [" ", " ", " ", "\n", "\t", "  "]


def _texts():
    rng = random.Random(20260819)
    fixed = [
        "גנן גידל דגן בגן.",
        "שלום עולם! מה נשמע? הכל טוב.",
        "אמר: hello world. וגם 45.6% מהזמן...",
        'צה"ל הודיע (אתמול!) על כך.\nומחר גם.',
        "one two. three",
        "",
        "a.",
        "x",
    ]
    randoms = []
    for _ in range(300):
        n = rng.randint(1, 25)
        parts = []
        for _ in range(n):
            parts.append(rng.choice(PIECES))
            parts.append(rng.choice(WS))
        randoms.append("".join(parts))
    return fixed + randoms


def test_sentence_segmentation_parity(ref):
    for text in _texts():
        ours = split_sentences(text)
        theirs = ref["text2listOfSentences"](text)
        assert ours == theirs, repr(text)


def test_word_tokenization_parity(ref):
    # the reference's tokenize returns (kind, token) pairs and asserts the
    # scanner consumed everything; ours returns the same pairs plus the
    # unconsumed tail as data (no executor-killing assert)
    for text in _texts():
        for sent in ref["text2listOfSentences"](text):
            ours_pairs, ours_tail = scan_tokens(sent)
            try:
                theirs = ref["tokenize"](sent)
            except AssertionError:
                assert ours_tail != "", repr(sent)  # both saw a remainder
                continue
            assert ours_tail == "", repr(sent)
            assert [tuple(p) for p in ours_pairs] == [tuple(t) for t in theirs], repr(sent)

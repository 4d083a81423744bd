"""Differential parity test: execute the REFERENCE implementation of
make_groupings_linguistically (extracted by AST from the read-only
reference checkout at test time — never vendored) against our
reimplementation on randomized Hebrew morpheme sequences.

Skipped when the reference checkout is absent (e.g. on a cluster)."""

import ast
import random
import string as _string
from pathlib import Path

import pytest

from hebrew_ner_spark.functions.grouping import make_groupings

REF = Path("/root/reference/utils/ner.py")

NEEDED = {
    "make_groupings_linguistically",
    "correct_final_letters",
    "normalise_final_letters",
    "remove_trailing_yud",
}


@pytest.fixture(scope="module")
def ref_fn():
    if not REF.exists():
        pytest.skip("reference checkout not available")
    tree = ast.parse(REF.read_text())
    wanted = [n for n in tree.body if isinstance(n, ast.FunctionDef) and n.name in NEEDED]
    assert {n.name for n in wanted} == NEEDED
    mod = ast.Module(body=wanted, type_ignores=[])
    ns = {
        "string": _string,
        "List": list,
        "Tuple": tuple,
        "Iterable": list,
    }
    exec(compile(mod, str(REF), "exec"), ns)  # noqa: S102 - trusted test input
    return ns["make_groupings_linguistically"]


# building blocks that drive every rule branch
PIECES = [
    "ו", "ש", "ב", "ל", "כ", "מ", "ה", "כש", "הכל",
    "בית", "ילד", "ספר", "טוב", "על", "יד", "של", "עם", "את", "אות",
    "כמו", "לפי", "ממן", "אצל", "בגלל", "כלפי", "עד",
    "אני", "אתה", "הוא", "היא", "אנחנו", "אתם", "הם", "הן",
    ",", ".", "!",
    # multi-char / empty punctuation: the reference's `m_w in
    # string.punctuation` is a SUBSTRING test, true for '' and '()' —
    # these drive that quirk branch (set-membership would diverge here)
    "", "()", "!?", ",.",
]


def _cases():
    rng = random.Random(20260816)
    fixed = [
        ["ב", "ה", "בית"],
        ["ו", "ב", "ה", "בית"],
        ["ש", "ה", "ילד"],
        ["על", "יד", "הוא"],
        ["עם", "הם"],
        ["את", "היא"],
        ["ממן", "הוא"],
        ["לפי", "הם"],
        ["כמו", "אני"],
        ["ספר", "הוא"],
        ["בית", "()", "ילד"],
        ["בית", "", "ילד"],
        ["ב", "", "בית"],
        ["בית", "!?"],
    ]
    randoms = [
        [rng.choice(PIECES) for _ in range(rng.randint(1, 8))] for _ in range(400)
    ]
    return fixed + randoms


def _safe(fn, morphs):
    """Both implementations may assert on truncated inputs (ה/ל at end);
    parity means they fail or succeed together."""
    try:
        return ("ok", fn(list(morphs)))
    except AssertionError:
        return ("assert", None)
    except IndexError:
        return ("index", None)


def test_reference_parity(ref_fn):
    for morphs in _cases():
        ours = _safe(make_groupings, morphs)
        theirs = _safe(ref_fn, morphs)
        assert ours[0] == theirs[0], (morphs, ours, theirs)
        if ours[0] == "ok":
            g1, s1 = ours[1]
            g2, s2 = theirs[1]
            assert g1 == g2, (morphs, g1, g2)
            assert s1 == s2, (morphs, s1, s2)

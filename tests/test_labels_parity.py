"""Differential parity: execute the REFERENCE implementations of
validate_multi_to_single and make_spans (AST-extracted from the
read-only checkout at test time, never vendored) against our
reimplementations on randomized label sequences."""

import ast
import random
import re as _re
from pathlib import Path

import pytest

from hebrew_ner_spark.functions.grouping import make_span_strings
from hebrew_ner_spark.functions.labels import validate_multi_to_single

REF = Path("/root/reference/utils/ner.py")


def _extract(names):
    tree = ast.parse(REF.read_text())
    wanted = [n for n in tree.body if isinstance(n, ast.FunctionDef) and n.name in names]
    assert {n.name for n in wanted} == set(names)
    mod = ast.Module(body=wanted, type_ignores=[])
    ns = {"re": _re, "List": list, "Iterable": list, "Tuple": tuple}
    exec(compile(mod, str(REF), "exec"), ns)  # noqa: S102 - trusted test input
    return ns


@pytest.fixture(scope="module")
def ref():
    if not REF.exists():
        pytest.skip("reference checkout not available")
    return _extract({"validate_multi_to_single", "make_spans"})


BASES = ["O", "B", "I", "E", "S"]
CATS = ["PER", "LOC", "ORG", "TERM"]


def _rand_label(rng):
    b = rng.choice(BASES)
    return "O" if b == "O" else f"{b}-{rng.choice(CATS)}"


def test_validate_parity_randomized(ref):
    rng = random.Random(20260817)
    for _ in range(2000):
        parts = [_rand_label(rng) for _ in range(rng.randint(1, 6))]
        tag = "^".join(parts)
        assert validate_multi_to_single(tag) == tuple(
            ref["validate_multi_to_single"](tag)
        ), tag


def test_validate_parity_exhaustive_pairs(ref):
    labels = ["O"] + [f"{b}-X" for b in "BIES"]
    for a in labels:
        for b in labels:
            tag = f"{a}^{b}"
            assert validate_multi_to_single(tag) == tuple(
                ref["validate_multi_to_single"](tag)
            ), tag


def test_make_spans_parity_randomized(ref):
    rng = random.Random(20260818)
    for _ in range(1000):
        labels = [_rand_label(rng) for _ in range(rng.randint(0, 12))]
        assert make_span_strings(labels) == ref["make_spans"](labels), labels

"""Hebrew linguistic regrouping + morph->token alignment kernels (G4/G5).

Behaviour-equivalent reimplementation of the reference's
``make_groupings_linguistically`` (utils/ner.py:260-396),
``make_spans`` (utils/ner.py:398-419) and ``align_morph_to_tok``
(utils/ner.py:422-447). These are pure functions over morpheme lists;
in the engine they run inside pandas UDFs per sentence.

Preserved quirks (deliberate, pinned in tests/test_grouping.py):

  Q1  the definite article ה after a ב/ל/כ prefix is absorbed into the
      group but adds NOTHING to the surface form (the reference appends
      an empty string);
  Q2  in the pronoun-suffix fallback (`else` of the pronoun branch) the
      morpheme index joins the PREVIOUS group while its surface starts a
      new word — groups and sentence lengths diverge;
  Q3  an empty previous surface matches every `prev in '...'` membership
      test ('' is a substring of everything);
  Q4  align pads 'O' on the LEFT when YAP emits more forms than labels.
"""

from __future__ import annotations

import string as _string
from typing import List, Tuple

# Substring test, NOT set membership: the reference checks
# `m_w in string.punctuation` (utils/ner.py:296), which is True for the
# empty string and for multi-char runs like '()' — quirk preserved.
PUNCT = _string.punctuation

SINGLE_ENDINGS = {
    "אני": "י", "אתה": "ך", "את": "ך", "הוא": "ו", "היא": "ה",
    "אנחנו": "נו", "אתם": "כם", "אתן": "כן", "הם": "הם", "הן": "הן",
}
PLURAL_ENDINGS = {
    "אני": "י", "אתה": "יך", "את": "יך", "הוא": "יו", "היא": "יה",
    "אנחנו": "ינו", "אתם": "יכם", "אתן": "יכן", "הם": "יהם", "הן": "יהן",
}
FROM_ENDINGS = {
    "אני": "מני", "אתה": "מך", "את": "מך", "הוא": "מנו", "היא": "מנה",
    "אנחנו": "מנו", "אתם": "כם", "אתן": "כן", "הם": "הם", "הן": "הן",
}

SINGLE_STYLE_PREPS = [
    "אצל", "בגלל", "בשביל", "בעד", "בתוך", "זולת", "ליד", "כמות", "של",
    "מאת", "למען", "לעמת", "לקראת", "לשם", "מול", "נגד", "נכח", "ב", "ל", "לעבר",
]
PLURAL_STYLE_STEMS = [
    "כלפ", "ביד", "בלעד", "לגב", "לפנ", "בעקבות", "על", "עד", "תחת", "אחר", "אל",
]

_FINAL_TO_NORMAL = str.maketrans("ךםןףץ", "כמנפצ")
_NORMAL_TO_FINAL = {"כ": "ך", "מ": "ם", "נ": "ן", "פ": "ף", "צ": "ץ"}

_SKIP = object()


def normalise_finals(word: str) -> str:
    return word.translate(_FINAL_TO_NORMAL)


def correct_finals(word: str) -> str:
    if len(word) < 2:
        return word
    last = word[-1]
    return word[:-1] + _NORMAL_TO_FINAL.get(last, last)


def strip_trailing_yud(word: str) -> str:
    # Unguarded word[-1] like the reference (utils/ner.py:255-258):
    # IndexError on '' is a preserved quirk (an empty prev surface
    # reaching the pronoun fallback must fail identically).
    return word[:-1] if word[-1] == "י" else word


def _hashem_ending(ending: str) -> str:
    """Drop a leading ה from 2-char endings (the עם/את/אות sub-branches)."""
    if len(ending) == 2 and ending[0] == "ה":
        return ending[1]
    return ending


def make_groupings(morph: List[str]) -> Tuple[List[List[int]], List[str]]:
    """Group a morpheme sequence back into surface tokens.

    Returns (groups, sentence): groups[i] is the list of morpheme indexes
    merged into surface word i (modulo quirk Q2).
    """
    morph = list(morph)
    sentence: List[str] = [morph[0]]
    groups: List[List[int]] = [[0]]

    i = 1
    n = len(morph)
    while i < n:
        m_w = morph[i]
        if m_w is _SKIP:
            i += 1
            continue
        if m_w in PUNCT:
            sentence.append(m_w)
            groups.append([i])
            i += 1
            continue
        prev = sentence[-1]
        if m_w == "ה" and prev in "בלכ":  # Q1: silent absorption (also Q3)
            groups[-1].append(i)
        elif m_w == "ה" and prev in "משו":
            assert i < n - 1
            sentence[-1] = prev + "ה" + morph[i + 1]
            groups[-1].extend([i, i + 1])
            morph[i + 1] = _SKIP
        elif m_w in ("ל", "ב", "כ") and prev in "וש":
            assert i < n - 1
            conc = morph[i + 1]
            inds = [i + 1]
            if conc == "ה":
                conc = morph[i + 2]
                morph[i + 2] = _SKIP
                inds.append(i + 2)
            sentence[-1] = prev + m_w + conc
            # quirk: the reference never records index i itself here —
            # only the concatenated continuation indexes join the group
            groups[-1].extend(inds)
            morph[i + 1] = _SKIP
        elif m_w == "הכל" and prev in "בלכ":
            sentence[-1] = prev + "כל"
            groups[-1].append(i)
        elif (len(prev) == 1 and prev in "בלכהשומ") or prev == "כש":
            sentence[-1] = prev + m_w
            groups[-1].append(i)
        elif correct_finals(m_w) in SINGLE_ENDINGS:
            m_w = correct_finals(m_w)
            if prev in SINGLE_STYLE_PREPS:
                sentence[-1] = prev + SINGLE_ENDINGS[m_w]
                groups[-1].append(i)
            # quirk: the reference indexes sentence[-2] unguarded — a
            # sentence-initial יד followed by a pronoun raises IndexError
            elif prev == "יד" and sentence[-2] == "על":
                sentence[-1] = prev + SINGLE_ENDINGS[m_w]
                groups[-1].append(i)
            elif (nrw := normalise_finals(strip_trailing_yud(prev))) in PLURAL_STYLE_STEMS:
                sentence[-1] = nrw + PLURAL_ENDINGS[m_w]
                groups[-1].append(i)
            elif prev in ("ממן", "מ"):
                sentence[-1] = prev + FROM_ENDINGS[m_w]
                groups[-1].append(i)
            elif correct_finals(prev) == "עם":
                sentence[-1] = "את" + _hashem_ending(SINGLE_ENDINGS[m_w])
                groups[-1].append(i)
            elif prev == "את":
                sentence[-1] = "אות" + _hashem_ending(SINGLE_ENDINGS[m_w])
                groups[-1].append(i)
            elif prev == "אות":
                sentence[-1] = prev + _hashem_ending(SINGLE_ENDINGS[m_w])
                groups[-1].append(i)
            elif prev == "כמו":
                sentence[-1] = prev + ("ני" if m_w == "אני" else SINGLE_ENDINGS[m_w])
                groups[-1].append(i)
            elif prev == "לפי":
                sentence[-1] = "לפ" + PLURAL_ENDINGS[m_w]
                groups[-1].append(i)
            elif prev in "וש":  # Q3 applies here too
                sentence[-1] = prev + morph[i]
                groups[-1].append(i)
            else:  # Q2: index joins previous group, surface starts new word
                sentence.append(morph[i])
                groups[-1].append(i)
        else:
            groups.append([i])
            sentence.append(m_w)
        i += 1
    return groups, sentence


def make_span_strings(labels: List[str]) -> List[str]:
    """P12 string form: 'CAT@[lo,hi]' / 'CAT@[i]' (utils/ner.py:398-419).

    Quirks kept: I labels never open a span; an E with no open span is
    silently dropped; a B without E leaves an unterminated '[lo' string.
    """
    spans: List[str] = []
    for i, label in enumerate(labels):
        if label == "O":
            continue
        pos, cat = label.split("-", 1)
        if pos == "I":
            continue
        if pos in ("S", "B"):
            spans.append(f"{cat}@[{i}{']' if pos == 'S' else ''}")
        elif pos == "E":
            if spans and "]" not in spans[-1]:
                spans[-1] += f",{i}]"
    return spans


def align_morph_to_tok(
    morph_labels: List[str],
    yap_groups: List[List[int]],
    morphemes: List[str],
    sentence: List[str],
    multi_delim: str = "^",
    validate_to_single: bool = True,
) -> List[str]:
    """G5: merge morpheme labels to token labels, preferring the
    linguistic grouping when its surface matches the original token
    (utils/ner.py:422-447 minus the YAP HTTP call — the disambiguated
    groups arrive as ``yap_groups``)."""
    from hebrew_ner_spark.functions.labels import validate_multi_to_single

    lings, words = make_groupings(morphemes)
    m_yap = max((max(g) for g in yap_groups), default=-1) + 1
    if m_yap > len(morph_labels):  # Q4: left-pad
        morph_labels = ["O"] * (m_yap - len(morph_labels)) + list(morph_labels)
    labels: List[str] = []
    for i, (gy, gl) in enumerate(zip(yap_groups, lings)):
        label = multi_delim.join(morph_labels[j] for j in gy)
        label_l = multi_delim.join(morph_labels[j] for j in gl)
        if label != label_l and i < len(words) and i < len(sentence) and words[i] == sentence[i]:
            label = label_l
        if validate_to_single:
            label, _ = validate_multi_to_single(label, multi_delim)
        labels.append(label)
    return labels

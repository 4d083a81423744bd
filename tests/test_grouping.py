"""Pinned-case tests for the Hebrew regrouping / alignment kernels
(G4/G5, reference utils/ner.py:260-447). Every case traced by hand
through the reference rule table, quirks included."""

from hebrew_ner_spark.functions.grouping import (
    align_morph_to_tok,
    make_groupings,
    make_span_strings,
)


def test_generic_prefix_merge():
    groups, sent = make_groupings(["ו", "הלכתי"])
    assert groups == [[0, 1]]
    assert sent == ["והלכתי"]


def test_definite_article_absorbed_silently():
    # Q1: ה after ב joins the group but adds nothing to the surface
    groups, sent = make_groupings(["ב", "ה", "בית"])
    assert groups == [[0, 1, 2]]
    assert sent == ["בבית"]


def test_heh_after_shin_consumes_next():
    groups, sent = make_groupings(["ש", "ה", "ילד"])
    assert groups == [[0, 1, 2]]
    assert sent == ["שהילד"]


def test_lbk_after_vav_skips_own_index():
    # quirk: the ב morpheme's own index is never recorded in the group
    groups, sent = make_groupings(["ו", "ב", "בית"])
    assert groups == [[0, 2]]
    assert sent == ["ובבית"]


def test_lbk_after_vav_with_article():
    groups, sent = make_groupings(["ו", "ב", "ה", "בית"])
    assert groups == [[0, 2, 3]]
    assert sent == ["ובבית"]


def test_punctuation_is_own_group():
    groups, sent = make_groupings(["שלום", ",", "עולם"])
    assert groups == [[0], [1], [2]]
    assert sent == ["שלום", ",", "עולם"]


def test_pronoun_after_single_style_preposition():
    groups, sent = make_groupings(["של", "הם"])
    assert groups == [[0, 1]]
    assert sent == ["שלהם"]


def test_pronoun_after_im_becomes_et():
    groups, sent = make_groupings(["עם", "הוא"])
    assert groups == [[0, 1]]
    assert sent == ["אתו"]


def test_pronoun_after_et_with_heh_ending_trimmed():
    groups, sent = make_groupings(["את", "הם"])
    assert groups == [[0, 1]]
    assert sent == ["אותם"]


def test_pronoun_after_plural_stem():
    groups, sent = make_groupings(["על", "הם"])
    assert groups == [[0, 1]]
    assert sent == ["עליהם"]


def test_al_yad_special_case():
    groups, sent = make_groupings(["על", "יד", "הוא"])
    assert groups == [[0], [1, 2]]
    assert sent == ["על", "ידו"]


def test_mimen_keeps_full_stem():
    # quirk: reference reassigns prev_word='מ' but concatenates onto the
    # untouched surface, yielding ממן + מנו
    groups, sent = make_groupings(["ממן", "הוא"])
    assert groups == [[0, 1]]
    assert sent == ["ממןמנו"]


def test_pronoun_fallback_diverges_groups_and_sentence():
    # Q2: index joins previous group, surface starts a new word
    groups, sent = make_groupings(["ספר", "הוא"])
    assert groups == [[0, 1]]
    assert sent == ["ספר", "הוא"]


def test_make_span_strings():
    labels = ["B-PER", "I-PER", "E-PER", "O", "S-LOC"]
    assert make_span_strings(labels) == ["PER@[0,2]", "LOC@[4]"]
    # unterminated B stays open; orphan E is dropped
    assert make_span_strings(["B-PER", "O"]) == ["PER@[0"]
    assert make_span_strings(["E-PER"]) == []
    assert make_span_strings(["I-PER"]) == []


def test_align_simple_agreement():
    labels = align_morph_to_tok(
        morph_labels=["O", "O", "B-LOC"],
        yap_groups=[[0, 1, 2]],
        morphemes=["ב", "ה", "בית"],
        sentence=["בבית"],
    )
    assert labels == ["B-LOC"]


def test_align_left_pads_when_yap_has_more_forms():
    # Q4: 4 forms vs 3 labels -> one 'O' padded on the LEFT
    labels = align_morph_to_tok(
        morph_labels=["O", "O", "S-LOC"],
        yap_groups=[[0], [1, 2, 3]],
        morphemes=["מר", "ב", "ה", "בית"],
        sentence=["מר", "בבית"],
        validate_to_single=False,
    )
    assert labels == ["O", "O^O^S-LOC"]


def test_align_prefers_linguistic_grouping_on_surface_match():
    # yap grouped [0][1,2] but linguistics merges all three -> surfaces
    # differ from tokens, so the yap label wins; when they match, the
    # linguistic label wins.
    labels = align_morph_to_tok(
        morph_labels=["B-LOC", "E-LOC"],
        yap_groups=[[0], [1]],
        morphemes=["ספר", "טוב"],
        sentence=["ספר", "טוב"],
        validate_to_single=False,
    )
    assert labels == ["B-LOC", "E-LOC"]

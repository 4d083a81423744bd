"""Hebrew sentence segmentation + word tokenization kernels.

Behaviour-equivalent re-implementation of the reference tokenizer semantics
(reference: utils/tokenizer.py:46-211, itself derived from Yoav Goldberg's
public Hebrew tokenizer / github.com/ygurman/hebrew_tokenizer). The engine's
per-row invariant requires these functions to reproduce the reference output
**byte-identically**, including its quirks, which are deliberately preserved
and unit-pinned (tests/test_tokenizer.py):

  Q1  a trailing unterminated sentence is never flushed (the reference only
      appends to `sentences` at a separator; leftovers are discarded);
  Q2  a whitespace chunk whose unconsumed tail is a single character drops
      that character (`current_start < len - 1` guard, tokenizer.py:146);
  Q3  after a "separator + closing quote/paren at end-of-chunk" match the
      cursor advances one extra position (that branch falls through to the
      loop's `i += 1`, tokenizer.py:94-102 has no `continue`);
  Q4  the legal-dotted-token branch slices with an end index relative to the
      *chunk* while the match was computed relative to the *tail*, so when
      the token does not start at chunk offset 0 the emitted piece is
      truncated (tokenizer.py:124);
  Q5  pieces can be empty strings, yielding doubled spaces after the final
      `' '.join`;
  Q6  the quote-mark-word scanner rule (tokenizer.py:182) is miscompiled by
      re.Scanner (its named groups corrupt the combined branch program — a
      single-rule Scanner with that pattern raises "invalid SRE code"), and
      empirically matches only when head and tail are ASCII word chars.
      Probes: 'w"xyz' -> '" wxyz' but 'ח"chat' -> 'ח','"','chat' and
      'a"בגד' -> 'a','"','בגד'. We encode the de-facto ASCII rule.

These are executed inside vectorized pandas UDFs (see spark_udfs below) —
plain Python per *sentence*, Arrow batches per partition, model-free.
"""

from __future__ import annotations

import re
from typing import Callable, List, Optional, Tuple

# --- shared regex inventory (the spec; identical patterns to the published
# tokenizer, since byte-parity of outputs requires character-parity here) ---
OPEN_PUNCT = r"[\(\[\{\'\"`]"
CLOSE_PUNCT = r"[\)\]\}\'\"`]"
SENT_SEP = r"[\.!?]"
INNER_PUNCT = r"[,;:\-&]"
CHUNK = r"[^ \t\f\v]+(?:[\n][^ \t\f\v]*)*"
QUOTED_WORD = r"(?P<head>\w)(?P<mark>[\"\'])(?P<tail>\w{2,})"
# Q6: what the reference scanner *actually* matches for the rule above.
QUOTED_WORD_ASCII = r"(?P<head>[A-Za-z0-9_])(?P<mark>[\"\'])(?P<tail>[A-Za-z0-9_]{2,})"
NUMBERING = r"(?:(?:[א-י]|\d+)\.)+"
HEB_ACRONYM = "(?:(?:[א-ת]\\.)+[א-ת]+)"
NUMERIC = r"(?:[+-]?(?:[0-9][0-9.,\/\-:]*)?(?:[0-9])%?)"
MULTI_SEP = SENT_SEP + "{2,}"
LEGAL_DOTTED = "{0}*{1}{2}*".format(
    OPEN_PUNCT, "|".join((NUMBERING, NUMERIC, HEB_ACRONYM)), CLOSE_PUNCT
)
URL = r"[a-z]+://\S+"
ENG_WORD = r"[a-zA-Z][a-zA-Z0-9'.]*"
GARBAGE = r"[^א-תa-zA-Z0-9!?.,:;\-()\[\]{}]+"
HEB_WORD = r"[א-ת]([.'`\"\-/\\]?['`]?[א-ת0-9'`])*"
HARD_END = r"(?:{0}{1}\n*)|\n+".format(CLOSE_PUNCT, SENT_SEP)

_CHUNK_RE = re.compile(CHUNK, re.MULTILINE | re.UNICODE)
_HARD_END_RE = re.compile(HARD_END)
_MULTI_SEP_RE = re.compile(MULTI_SEP)
_SEP_CLOSE_EOL_RE = re.compile(SENT_SEP + CLOSE_PUNCT + "+$")
_LEGAL_DOTTED_RE = re.compile(LEGAL_DOTTED)
_QUOTED_WORD_RE = re.compile(QUOTED_WORD, re.UNICODE)


def split_sentences(text: str) -> List[str]:
    """Segment raw text into sentences (reference T1 semantics).

    Scans whitespace-separated chunks; a sentence closes at a hard ending
    (closing punct + [.!?], or newlines), at mid-chunk ! or ?, or at a '.'
    that is neither part of a multi-dot run nor of a legal dotted token.
    """
    done: List[List[str]] = []
    pieces: List[str] = []  # pieces of the sentence being built

    def close_at(seq: str, start: int, i: int, sep_piece: str) -> None:
        pieces.append(seq[start:i])
        pieces.append(sep_piece)
        done.append(list(pieces))
        pieces.clear()

    for seq in _CHUNK_RE.findall(text):
        start = 0
        i = 0
        n = len(seq)
        while i < n:
            hard = _HARD_END_RE.match(seq, i)
            if hard:
                pieces.append(seq[start:i])
                pieces.extend(c for c in seq[i : hard.end()] if c != "\n")
                done.append(list(pieces))
                pieces.clear()
                i = hard.end()
                start = i
                continue
            ch = seq[i]
            if ch not in "!?.":
                i += 1
                continue
            multi = _MULTI_SEP_RE.match(seq, i)
            if multi:
                # ellipses / '!!' runs join the sentence, never end it
                pieces.append(seq[start:i])
                pieces.append(seq[i : multi.end()])
                i = multi.end()
                start = i
                continue
            closer = _SEP_CLOSE_EOL_RE.match(seq, i)
            if closer:
                pieces.append(seq[start:i])
                pieces.extend(seq[i : closer.end()])
                i = closer.end()
                start = i
                i += 1  # Q3: reference falls through to the loop increment
            elif ch in "!?" or (ch == "." and i == n - 1):
                close_at(seq, start, i, ch)
                i += 1
                start = i
            else:
                # '.' mid-chunk: legal dotted token, or a sentence boundary
                legal = _LEGAL_DOTTED_RE.match(seq, start)
                if legal:
                    rel_end = legal.end() - start  # match length
                    pieces.append(seq[start:rel_end])  # Q4: chunk-relative end
                    i = start + rel_end
                    start = i
                else:
                    close_at(seq, start, i, ch)
                    i += 1
                    start = i
        if start < n - 1:  # Q2: a 1-char tail is dropped
            pieces.append(seq[start:])
    # Q1: whatever remains in `pieces` is intentionally not flushed
    return [" ".join(p) for p in done]


# --- word tokenizer: ordered rule table, first-match-at-position wins -------

def _emit_hebrew(tok: str) -> str:
    """Quote-mark flip for non-acronym quoted words + inner-dash spacing."""
    q = _QUOTED_WORD_RE.match(tok)
    if q:
        tok = q.group("mark") + " " + q.group("head") + q.group("tail")
    return tok.replace("-", " - ")


def _emit_quoted(tok: str) -> str:
    q = _QUOTED_WORD_RE.match(tok)
    assert q is not None
    return q.group("mark") + " " + q.group("head") + q.group("tail")


def _emit_number(tok: str) -> str:
    return tok[:-1] + " %" if tok.endswith("%") else tok


_RULES: List[Tuple[re.Pattern, Optional[str], Optional[Callable[[str], str]]]] = [
    (re.compile(r"\s+"), None, None),  # skip
    (re.compile(URL), "URL", None),
    (re.compile(LEGAL_DOTTED), "HEB", _emit_hebrew),
    (re.compile(QUOTED_WORD_ASCII), "HEB", _emit_quoted),
    (re.compile(HEB_WORD), "HEB", _emit_hebrew),
    (re.compile(ENG_WORD), "ENG", None),
    (re.compile(NUMERIC), "NUM", _emit_number),
    (re.compile(NUMBERING), "NUM", _emit_number),
    (re.compile(OPEN_PUNCT), "PUNCT", None),
    (re.compile(CLOSE_PUNCT), "PUNCT", None),
    (re.compile(MULTI_SEP), "PUNCT", None),
    (re.compile(SENT_SEP), "PUNCT", None),
    (re.compile(INNER_PUNCT), "PUNCT", None),
    (re.compile(GARBAGE), "GARBAGE", None),
]


def scan_tokens(sentence: str) -> Tuple[List[Tuple[str, str]], str]:
    """Tokenize one sentence. Returns ((kind, token) list, unscanned tail).

    Equivalent to an ordered-alternation scanner: at each position the first
    rule whose pattern matches consumes; if none match, scanning stops and
    the tail is returned (the reference asserts the tail is empty; we surface
    it as a data-quality signal instead of killing an executor).
    """
    out: List[Tuple[str, str]] = []
    pos = 0
    n = len(sentence)
    while pos < n:
        for pat, kind, emit in _RULES:
            m = pat.match(sentence, pos)
            if m and m.end() > pos:
                if kind is not None:
                    tok = m.group(0)
                    out.append((kind, emit(tok) if emit else tok))
                pos = m.end()
                break
        else:
            return out, sentence[pos:]
    return out, ""


def tokenize_words(sentence: str) -> List[str]:
    """Token strings for one sentence (kinds dropped, remainder ignored)."""
    parts, _ = scan_tokens(sentence)
    return [tok for _, tok in parts]


def normalize_input(text: str) -> str:
    """Windows newline + doubled single-quote cleanup (reference T3)."""
    return text.replace("\r", "").replace("''", '"')

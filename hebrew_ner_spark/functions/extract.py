"""Deterministic HTML -> text extraction kernel.

The engine's per-row invariant (input_hint) is byte-identical extracted
text per url. The extractor is a fixed, ordered rule list — no heuristic
library, so the output is reproducible everywhere:

  1. drop <script>/<style> elements with their content
  2. drop <!-- comments -->
  3. block-level closers and <br> become newlines
  4. every remaining tag is removed
  5. the five basic entities decode (&amp; last, per the standard trap)
  6. whitespace runs collapse to single spaces, ends trimmed
  7. T3 cleanup (\\r removal, '' -> ")

Runs as a scalar pandas UDF; goldens pinned in tests/test_extract.py.
"""

from __future__ import annotations

import re

_SCRIPT_RE = re.compile(r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_BLOCK_RE = re.compile(r"(?i)<(?:br\s*/?|/p|/div|/h[1-6]|/li|/tr)>")
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")

_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]


def extract_text(html: str) -> str:
    s = _SCRIPT_RE.sub(" ", html)
    s = _COMMENT_RE.sub(" ", s)
    s = _BLOCK_RE.sub("\n", s)
    s = _TAG_RE.sub(" ", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    s = _WS_RE.sub(" ", s).strip()
    return s.replace("\r", "").replace("''", '"')

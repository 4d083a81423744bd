"""HTML-extraction query: the byte-identical per-row invariant, gated.

The synthesized page contributes a known 'doc N Document N ' prefix
(title + h1 survive extraction); the body must come back byte-identical,
so the oracle states the full expected string per document.
"""

from __future__ import annotations

from hebrew_ner_spark.operators import extract
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.sources.catalog import load_table


@query(
    "ext_text",
    oracle="""
    SELECT doc_id,
           'doc ' || CAST(doc_id AS VARCHAR) || ' Document ' ||
           CAST(doc_id AS VARCHAR) || ' ' || text AS extracted
    FROM documents
    """,
)
def ext_text(spark, sf_dir):
    return extract.extracted(load_table(spark, sf_dir, "documents"))

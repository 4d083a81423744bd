"""Gates for the coreference sieve (operators/coref.py).

The oracle resolves antecedents with window functions — a running
``max(CASE...)`` for the index and ``last_value(... IGNORE NULLS)`` for
the token, both over UNBOUNDED PRECEDING .. 1 PRECEDING — a deliberately
different formulation from the Spark per-row array algebra, so agreement
gates the sieve rule itself, not a shared implementation.

CTE names are cr-prefixed (house namespace rule)."""

from __future__ import annotations

from hebrew_ner_spark.operators import coref
from hebrew_ner_spark.querydefs.graphstats_q import _TOKS_CTE, deppat_sql
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.resources import ENTITY_TERMS, PRONOUN_TERMS
from hebrew_ner_spark.sources.catalog import load_table

_ENTS = "(" + ", ".join(f"'{t}'" for t in ENTITY_TERMS) + ")"
_PRONS = "(" + ", ".join(f"'{t}'" for t in PRONOUN_TERMS) + ")"

# running nearest-preceding-entity per token position
_CRW = f"""
crw AS (
  SELECT doc_id, word_index, token,
         max(CASE WHEN token IN {_ENTS} THEN word_index END) OVER crwin AS aidx,
         last_value(CASE WHEN token IN {_ENTS} THEN token END IGNORE NULLS)
           OVER crwin AS atok
  FROM toks
  WINDOW crwin AS (PARTITION BY doc_id ORDER BY word_index
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
"""


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@query(
    "kg_coref_mentions",
    oracle=f"""
    WITH {_TOKS_CTE},
    {_CRW}
    SELECT doc_id, word_index,
           CAST(coalesce(aidx, -1) AS BIGINT) AS ante_index,
           coalesce(atok, '') AS antecedent
    FROM crw WHERE token IN {_PRONS}
    """,
)
def kg_coref_mentions(spark, sf_dir):
    """The resolution table: every pronoun with its nearest-preceding
    entity (sentinel (-1, '') when none exists — first-token pronouns
    keep the gate non-vacuous on the unresolved branch)."""
    return coref.coref_mentions(_docs(spark, sf_dir))


@query(
    "kg_coref_triples",
    oracle=f"""
    WITH {_TOKS_CTE},
    {_CRW},
    crtoks AS (
      SELECT doc_id, word_index,
             CASE WHEN token IN {_PRONS} AND atok IS NOT NULL
                  THEN atok ELSE token END AS token
      FROM crw
    ),
    {deppat_sql("crtoks", "crt")}
    """,
)
def kg_coref_triples(spark, sf_dir):
    """Five-pattern extraction over sieve-resolved text — the
    recall-boosted triple stream. The oracle substitutes via the window
    chain, then replays the IDENTICAL pattern cascade used by the
    kg_triples_deppat gate over the rewritten tokens."""
    return coref.coref_triples(_docs(spark, sf_dir))


@query(
    "kg_coref_gain",
    oracle=f"""
    WITH {_TOKS_CTE},
    {_CRW},
    crtoks AS (
      SELECT doc_id, word_index,
             CASE WHEN token IN {_PRONS} AND atok IS NOT NULL
                  THEN atok ELSE token END AS token
      FROM crw
    ),
    crbase AS (
      SELECT pattern, count(*) AS n_base
      FROM (WITH {deppat_sql("toks", "crb")}) GROUP BY pattern
    ),
    crboost AS (
      SELECT pattern, count(*) AS n_coref
      FROM (WITH {deppat_sql("crtoks", "crc")}) GROUP BY pattern
    )
    SELECT coalesce(b.pattern, c.pattern) AS pattern,
           CAST(coalesce(b.n_base, 0) AS BIGINT) AS n_base,
           CAST(coalesce(c.n_coref, 0) AS BIGINT) AS n_coref
    FROM crbase b FULL OUTER JOIN crboost c ON b.pattern = c.pattern
    """,
)
def kg_coref_gain(spark, sf_dir):
    """Per-pattern triple counts before vs after resolution — the
    measured recall effect of the sieve (gains on svo/appos/has_attr,
    possible losses on gap patterns whose filler became an entity)."""
    return coref.coref_gain(_docs(spark, sf_dir))

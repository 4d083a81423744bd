"""Model-inference-stage queries: the mapInPandas labeller must reproduce
the JVM-side gazetteer labels bit for bit (same oracle as
kg_token_labels), proving the batchify/sort/pad/decode/recover plumbing
is permutation-safe."""

from __future__ import annotations

from hebrew_ner_spark.operators import mentions
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.resources import ENTITY_TERMS
from hebrew_ner_spark.sources.catalog import load_table

_ENTS_SQL = "(" + ", ".join(f"'{t}'" for t in ENTITY_TERMS) + ")"

_LABELS_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) - 1 AS word_index,
             unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    lbl AS (
      SELECT doc_id, word_index, token,
             token IN {_ENTS_SQL} AS is_ent,
             coalesce(lag(token)  OVER w IN {_ENTS_SQL}, FALSE) AS prev_ent,
             coalesce(lead(token) OVER w IN {_ENTS_SQL}, FALSE) AS next_ent
      FROM toks
      WINDOW w AS (PARTITION BY doc_id ORDER BY word_index)
    )
    SELECT doc_id, word_index, token,
           CASE WHEN NOT is_ent THEN 'O'
                WHEN NOT prev_ent AND NOT next_ent THEN 'S-TERM'
                WHEN NOT prev_ent THEN 'B-TERM'
                WHEN NOT next_ent THEN 'E-TERM'
                ELSE 'I-TERM' END AS label
    FROM lbl
"""


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@query("mention_model_labels", oracle=_LABELS_ORACLE)
def mention_model_labels(spark, sf_dir):
    """M9 chain as mapInPandas (singleton model, micro-batched decode)."""
    return mentions.detect_mentions(_docs(spark, sf_dir))


@query("mention_model_binned", oracle=_LABELS_ORACLE)
def mention_model_binned(spark, sf_dir):
    """Same with repartitionByRange length binning (O1 physical choice)."""
    return mentions.detect_mentions_length_binned(_docs(spark, sf_dir))
